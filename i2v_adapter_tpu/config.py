"""Typed configuration tree for the I2V-Adapter TPU framework.

The reference exposes configuration through per-script argparse flag sets
(/root/reference/src/train_image_to_video.py:208-467) and diffusers
``register_to_config`` kwargs
(/root/reference/src/models/unet_motion_cross_frame_attn.py:696-730).
Here the whole surface is a small tree of frozen dataclasses: hashable (so
they can be closed over by ``jax.jit`` as static arguments), serializable to
JSON for checkpoint metadata, and validated at construction time.
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from typing import Any, Mapping, Optional, Tuple


def _asdict(obj: Any) -> Any:
    if dataclasses.is_dataclass(obj):
        return {f.name: _asdict(getattr(obj, f.name)) for f in dataclasses.fields(obj)}
    if isinstance(obj, (list, tuple)):
        return [_asdict(x) for x in obj]
    return obj


class _ConfigBase:
    """JSON round-tripping shared by every config dataclass."""

    def to_dict(self) -> dict:
        return _asdict(self)

    def to_json(self, **kwargs) -> str:
        return json.dumps(self.to_dict(), indent=2, **kwargs)

    @classmethod
    def from_dict(cls, data: Mapping[str, Any]):
        import typing

        hints = typing.get_type_hints(cls)  # resolves string annotations
        kwargs = {}
        for f in dataclasses.fields(cls):
            if f.name not in data:
                continue
            value = data[f.name]
            ftype = hints.get(f.name, f.type)
            if dataclasses.is_dataclass(ftype) and isinstance(value, Mapping):
                value = ftype.from_dict(value)
            elif isinstance(value, list):
                value = tuple(value)
            kwargs[f.name] = value
        return cls(**kwargs)

    def replace(self, **kwargs):
        return dataclasses.replace(self, **kwargs)


# ---------------------------------------------------------------------------
# Model configs
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class VideoUNetConfig(_ConfigBase):
    """Config of the motion + cross-frame-attention video UNet.

    Field semantics mirror the reference UNet's registered config
    (/root/reference/src/models/unet_motion_cross_frame_attn.py:698-730);
    defaults are the SD1.5 shape.
    """

    sample_size: int = 64
    in_channels: int = 4
    out_channels: int = 4
    # True => the block at that depth carries spatial transformers
    # (self-attn + cross-frame adapter + text/IP cross-attn).  The reference
    # encodes this as block-type strings ("CrossFrameAttnDownBlockMotion" vs
    # "DownBlockMotion", :703-714); a boolean per depth is equivalent.
    down_block_has_attention: Tuple[bool, ...] = (True, True, True, False)
    up_block_has_attention: Tuple[bool, ...] = (False, True, True, True)
    block_out_channels: Tuple[int, ...] = (320, 640, 1280, 1280)
    layers_per_block: int = 2
    act_fn: str = "silu"
    norm_num_groups: int = 32
    norm_eps: float = 1e-5
    cross_attention_dim: int = 768
    num_attention_heads: int = 8
    use_linear_projection: bool = False
    transformer_layers_per_block: int = 1
    # Temporal (AnimateDiff-style) motion modules.  False yields a plain
    # SD1.5 2D UNet applied per frame (the T2I finetune path).
    use_motion_modules: bool = True
    motion_max_seq_length: int = 32
    motion_num_attention_heads: int = 8
    use_motion_mid_block: bool = True
    # I2V-Adapter cross-frame attention.
    use_i2v_adapter: bool = True
    # IP-Adapter image-conditioning branch (extra K/V at text cross-attn
    # sites plus an image-projection head), reference :1230-1287.
    use_ip_adapter: bool = True
    # IP-Adapter projection-head variant, auto-detected from checkpoint keys
    # like the reference (:1231-1239): 'standard' = 4-token linear head fed
    # by the projected image embedding; 'plus' = perceiver resampler over the
    # penultimate vision hidden states; 'full_face' = tokenwise MLP over the
    # penultimate hidden states (257 tokens).
    ip_variant: str = "standard"
    ip_num_tokens: int = 4
    image_embed_dim: int = 1024
    # penultimate vision hidden size consumed by plus/full_face heads
    ip_hidden_dim: int = 1280
    # resampler hyperparameters (IP-Adapter Plus)
    ip_resampler_dim: int = 768
    ip_resampler_depth: int = 4
    ip_resampler_heads: int = 12
    ip_scale: float = 1.0
    # FreeU skip re-weighting (s1, s2, b1, b2); None = off (ops/freeu.py).
    freeu: Optional[Tuple[float, float, float, float]] = None
    # Rematerialization (gradient checkpointing) of heavy blocks under jit.
    remat: bool = False
    flash_attention: bool = True
    # Compile-time log2-space softmax offset in the pallas flash kernel:
    # replaces the per-row running max (one full VPU pass over the scores,
    # ~24 ms/step at 512px).  Exact for raw attention logits in ~(-48,+132);
    # out-of-range rows go NaN (never silently wrong) — training's
    # non-finite skip-guard and the pipeline's host-side finite check both
    # surface it.  0.0 restores the exact per-row max.  Recorded here (not
    # just the I2V_FLASH_STATIC_MAX env var) so checkpoints/config JSON
    # capture the numerics mode.
    flash_static_max: float = 64.0
    # tanh-approximate gelu in the GEGLU feed-forwards.  Deviation from the
    # torch reference's erf gelu is ~1e-3 relative — below bf16 resolution —
    # and the erf transcendentals dominate the FF epilogue on the VPU
    # (full 512px UNet step 459 -> 432 ms measured).  tiny_test_config pins
    # False so composite torch-parity tests check the exact reference math.
    fast_gelu: bool = True
    # int8 3x3 resnet convs (dynamic per-tensor activation scale +
    # per-channel weight scales, int32 accumulate): measured 388.6 ->
    # 367.7 ms per 512px UNet step on v5e (the conv unit itself is ~1.34x;
    # int8 MATMUL measured no gain and stays bf16).  Quantization error is
    # ~1e-2 relative per conv — a serving-mode knob like ``fast_gelu`` but
    # an order of magnitude coarser, so it defaults OFF and is excluded
    # from parity suites.  The param tree is identical either way, so
    # checkpoints interchange freely.
    int8_conv: bool = False
    # Resnet 3x3 conv lowering.  'pallas' = fused GN-apply+SiLU+conv as
    # nine shifted VMEM matmuls (ops/conv3x3.py) — correct (interpret +
    # model-level tests) but MEASURED SLOWER in-context on v5e: 512px
    # UNet step 384.5 vs 356.8 ms, convs-only ablation 72.4 vs 44.9 ms
    # (profile_unet A/B; XLA's conv emitter fuses the epilogues and
    # pipelines the scan chain better than the standalone microbench
    # predicted — see BASELINE.md dead-end ledger).  'auto' therefore
    # resolves to XLA everywhere; the kernel stays as an opt-in for
    # shape regimes XLA handles poorly.  The param tree is identical
    # either way, so checkpoints interchange freely.
    conv_impl: str = "auto"  # 'auto' (= xla) | 'pallas' | 'xla'

    def __post_init__(self):
        if len(self.down_block_has_attention) != len(self.block_out_channels):
            raise ValueError(
                "down_block_has_attention must match block_out_channels: "
                f"{self.down_block_has_attention} vs {self.block_out_channels}"
            )
        if len(self.up_block_has_attention) != len(self.block_out_channels):
            raise ValueError(
                "up_block_has_attention must match block_out_channels: "
                f"{self.up_block_has_attention} vs {self.block_out_channels}"
            )
        if self.ip_variant not in ("standard", "plus", "full_face"):
            raise ValueError(f"unknown ip_variant: {self.ip_variant}")

    @property
    def num_blocks(self) -> int:
        return len(self.block_out_channels)

    @property
    def time_embed_dim(self) -> int:
        return self.block_out_channels[0] * 4


@dataclass(frozen=True)
class VAEConfig(_ConfigBase):
    """SD AutoencoderKL shape (diffusers `AutoencoderKL` defaults for SD1.5)."""

    in_channels: int = 3
    out_channels: int = 3
    latent_channels: int = 4
    block_out_channels: Tuple[int, ...] = (128, 256, 512, 512)
    layers_per_block: int = 2
    norm_num_groups: int = 32
    act_fn: str = "silu"
    scaling_factor: float = 0.18215
    sample_size: int = 512
    # Serving-mode int8 DECODER convs (resnets + upsamples), mirroring
    # VideoUNetConfig.int8_conv.  The encoder stays exact — the condition
    # image's latent anchors the whole clip (first-frame clamp), so
    # quantizing the encode would propagate into every frame.  Param tree
    # identical either way.
    int8_decode: bool = False

    @property
    def spatial_scale_factor(self) -> int:
        # reference pipeline: 2 ** (len(block_out_channels) - 1)
        # (/root/reference/src/pipelines/pipeline_i2v_adapter.py:110)
        return 2 ** (len(self.block_out_channels) - 1)


@dataclass(frozen=True)
class CLIPTextConfig(_ConfigBase):
    """SD1.5 text encoder (openai/clip-vit-large-patch14) shape."""

    vocab_size: int = 49408
    hidden_size: int = 768
    intermediate_size: int = 3072
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    max_position_embeddings: int = 77
    hidden_act: str = "quick_gelu"
    layer_norm_eps: float = 1e-5
    # Not used by SD1.5's text path but part of the full CLIP checkpoint.
    projection_dim: int = 768


@dataclass(frozen=True)
class CLIPVisionConfig(_ConfigBase):
    """IP-Adapter image encoder (OpenCLIP ViT-H/14) shape."""

    hidden_size: int = 1280
    intermediate_size: int = 5120
    num_hidden_layers: int = 32
    num_attention_heads: int = 16
    image_size: int = 224
    patch_size: int = 14
    layer_norm_eps: float = 1e-5
    hidden_act: str = "gelu"
    projection_dim: int = 1024


# ---------------------------------------------------------------------------
# Scheduler configs
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class SchedulerConfig(_ConfigBase):
    """Shared DDPM/DDIM noise-schedule description (SD1.5 values)."""

    num_train_timesteps: int = 1000
    beta_start: float = 0.00085
    beta_end: float = 0.012
    beta_schedule: str = "scaled_linear"  # or "linear"
    prediction_type: str = "epsilon"  # or "v_prediction"
    # DDIM-only knobs; the reference constructs DDIM with clip_sample=False,
    # timestep_spacing='linspace', steps_offset=1
    # (/root/reference/src/pipelines/pipeline_i2v_adapter.py:751-757).
    clip_sample: bool = False
    clip_sample_range: float = 1.0
    set_alpha_to_one: bool = False
    steps_offset: int = 1
    timestep_spacing: str = "linspace"  # "linspace" | "leading" | "trailing"


# ---------------------------------------------------------------------------
# Pipeline / training configs
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class PipelineConfig(_ConfigBase):
    """Inference hyperparameters.

    Defaults are the reference CLI call site
    (/root/reference/src/pipelines/pipeline_i2v_adapter.py:787-796).
    """

    num_frames: int = 16
    height: int = 512
    width: int = 512
    num_inference_steps: int = 25
    guidance_scale: float = 7.5
    # PIA-style first-frame similarity prior.
    frame_similarity_sample_ratio: float = 0.9
    frame_similarity_blurred_strength: float = 0.6
    blur_kernel_size: int = 3
    # torchvision.transforms.GaussianBlur samples sigma ~ U(0.1, 2.0) per
    # call; a fixed value makes inference deterministic.  None => sample.
    blur_sigma: Optional[float] = None
    eta: float = 0.0
    dtype: str = "bfloat16"
    # Serving-mode int8 convs (UNet resnet/down/upsample 3x3s +
    # VAE-decoder convs; VideoUNetConfig.int8_conv / VAEConfig.int8_decode).
    # Measured on v5e: 512px UNet step 388.6 -> 367.7 ms and 16-frame
    # decode ~1.25x, at ~1e-2 relative quantization error per conv
    # (full-pipeline PSNR vs the exact path tested > 35 dB).  Serving-only:
    # training never reads PipelineConfig, and parity suites construct
    # their configs directly.  Set False to restore exact bf16 convs.
    int8_conv: bool = True
    # Opt-in "turbo" serving approximation ("Faster Diffusion" encoder
    # propagation, arXiv:2312.09608): 2 = the denoise scan runs step PAIRS
    # where the second step reuses the first's UNet down-path features
    # (time tower / mid / up run fresh).  1 (default) = off — unlike
    # int8_conv this changes CONTENT, not just rounding, so it never
    # defaults on.  Works with both dispatch modes (fused scan and the
    # host-driven stepwise loop — bit-identical); no temporal tiling, no
    # UNet chunking (validated at call time).
    encoder_cache: int = 1
    # Opt-in adaptive-guidance serving approximation (early CFG
    # termination, the "adaptive guidance" family): the leading
    # ``cfg_cutoff`` fraction of denoise steps run full CFG (two UNet
    # evals); the remaining late steps run the conditional branch only
    # (guidance off — one eval), where the two branches have largely
    # converged.  1.0 (default) = off.  Like encoder_cache this changes
    # CONTENT, not just rounding, so it never defaults on.  Works with
    # both dispatch modes; not composed with encoder_cache (validated at
    # call time).  cfg_cutoff=0.0 degenerates to guidance_scale=1.0
    # semantics (equivalence-tested).
    cfg_cutoff: float = 1.0
    # Temporal tiling for clips longer than the motion-module positional cap
    # (windowed denoising with overlap blending; see pipelines/tiling.py).
    temporal_window: int = 16
    temporal_stride: int = 12

    def __post_init__(self):
        if not (0.0 < self.frame_similarity_sample_ratio <= 1.0):
            raise ValueError(
                "frame_similarity_sample_ratio must be in (0, 1], got "
                f"{self.frame_similarity_sample_ratio}"
            )
        if not (0.0 <= self.cfg_cutoff <= 1.0):
            raise ValueError(
                f"cfg_cutoff must be in [0, 1], got {self.cfg_cutoff}"
            )


@dataclass(frozen=True)
class MeshConfig(_ConfigBase):
    """Device mesh layout. axis sizes of -1 mean 'all remaining devices'.

    ``seq`` is sequence (frame-axis) parallelism: video frames shard over it
    so conv/spatial-attention work stays frame-local while XLA inserts the
    collectives for the frame-coupling ops (temporal attention, cross-frame
    K/V, motion GroupNorm stats)."""

    data: int = -1
    fsdp: int = 1
    tensor: int = 1
    seq: int = 1


@dataclass(frozen=True)
class OptimizerConfig(_ConfigBase):
    learning_rate: float = 1e-4
    lr_scheduler: str = "constant"  # constant|linear|cosine|constant_with_warmup
    lr_warmup_steps: int = 500
    # 'adamw' (reference default) or 'adafactor' — the memory-cheap option
    # standing in for the reference's bitsandbytes 8-bit Adam
    # (/root/reference/src/train_image_to_video.py:706-719): factored second
    # moments cost O(rows+cols) instead of O(params).
    optimizer: str = "adamw"
    adam_beta1: float = 0.9
    adam_beta2: float = 0.999
    adam_weight_decay: float = 1e-2
    adam_epsilon: float = 1e-8
    max_grad_norm: float = 1.0
    scale_lr: bool = False

    def __post_init__(self):
        if self.optimizer not in ("adamw", "adafactor"):
            raise ValueError(f"unknown optimizer: {self.optimizer}")


@dataclass(frozen=True)
class TrainConfig(_ConfigBase):
    """Training hyperparameters.

    Defaults follow /root/reference/src/train_image_to_video.py:208-467.
    """

    # 'i2v': adapter/motion finetune on clips (train_image_to_video.py).
    # 't2i': full-UNet single-frame base finetune (train_text_to_image.py),
    #        the AnimateDiff/PIA-style domain-adaptation stage.
    train_mode: str = "i2v"
    resolution: int = 256
    num_frames: int = 16
    sample_stride: int = 4
    train_batch_size: int = 8
    gradient_accumulation_steps: int = 4
    num_train_epochs: int = 10
    max_train_steps: Optional[int] = None
    seed: int = 0
    # Freeze policy: adapter to_q/to_out always train; motion modules train
    # only when update_motion_modules is set (reference :979-1026, flag :452).
    update_motion_modules: bool = False
    # Loss shaping.
    snr_gamma: Optional[float] = None
    noise_offset: float = 0.0
    input_perturbation: float = 0.0
    prediction_type: Optional[str] = None
    # Classifier-free-guidance condition dropout, reference
    # train_i2v_adapter.py:69-92 (the main driver does not drop conditions;
    # zero probabilities reproduce it).
    uncond_prob_t: float = 0.0
    uncond_prob_i: float = 0.0
    uncond_prob_ti: float = 0.0
    # First-frame handling: 'scaled' leaves sqrt(alpha_bar)*x0 after
    # add_noise with zero first-frame noise (train_image_to_video.py:795-813);
    # 'exact' restores the clean first frame (train_i2v_adapter.py:99-103).
    first_frame_mode: str = "scaled"
    gradient_checkpointing: bool = False
    # VAE-encode the batch ``vae_encode_slice`` frames at a time inside the
    # train step (0 = full batch).  At 512px x 16 frames the full-batch
    # encoder features peak ~4.3 GB; slicing bounds it (the reference's
    # analogous pattern is the offline encoder's sliced encode,
    # tools/encode_video.py:73-88).
    vae_encode_slice: int = 0
    mixed_precision: str = "bfloat16"  # "none" | "bfloat16"
    # Storage dtype for frozen params (UNet backbone, VAE, CLIP) — the
    # reference casts frozen models to the mixed-precision dtype
    # (train_image_to_video.py:743-754).  Trainable params stay fp32.
    freeze_dtype: str = "float32"  # "float32" | "bfloat16"
    use_ema: bool = False
    ema_decay: float = 0.9999
    optimizer: OptimizerConfig = field(default_factory=OptimizerConfig)
    mesh: MeshConfig = field(default_factory=MeshConfig)
    # ZeRO placement of the NO-GRADIENT state over the fsdp axis: 'shard'
    # fsdp-shards every large leaf (frozen UNet + encoder towers included);
    # 'replicate' keeps the frozen partitions replicated and shards only the
    # gradient-bearing state (trainable/opt/EMA).  The compiled-graph audit
    # (BASELINE.md multi-chip table) shows 'shard' paying 15.2 GB/device/step
    # of frozen-param re-gathers on the 256px train case — 'replicate' trades
    # ~2 GB/device of HBM for deleting that wire.  Applies only when
    # mesh.fsdp > 1.
    fsdp_frozen: str = "shard"  # "shard" | "replicate"
    checkpoint_epoch: int = 2
    checkpoints_total_limit: Optional[int] = None

    def __post_init__(self):
        if self.train_mode not in ("i2v", "t2i"):
            raise ValueError(f"bad train_mode: {self.train_mode}")
        if self.fsdp_frozen not in ("shard", "replicate"):
            raise ValueError(f"bad fsdp_frozen: {self.fsdp_frozen}")
        if self.first_frame_mode not in ("scaled", "exact"):
            raise ValueError(f"bad first_frame_mode: {self.first_frame_mode}")
        total = self.uncond_prob_t + self.uncond_prob_i + self.uncond_prob_ti
        if total > 1.0:
            raise ValueError(f"uncond probabilities sum to {total} > 1")


# Convenience bundle for the full model zoo.
@dataclass(frozen=True)
class I2VModelConfig(_ConfigBase):
    unet: VideoUNetConfig = field(default_factory=VideoUNetConfig)
    vae: VAEConfig = field(default_factory=VAEConfig)
    text_encoder: CLIPTextConfig = field(default_factory=CLIPTextConfig)
    image_encoder: CLIPVisionConfig = field(default_factory=CLIPVisionConfig)
    scheduler: SchedulerConfig = field(default_factory=SchedulerConfig)


def tiny_test_config() -> I2VModelConfig:
    """A miniature model for unit tests (seconds, not minutes, on CPU)."""
    return I2VModelConfig(
        unet=VideoUNetConfig(
            sample_size=8,
            down_block_has_attention=(True, False),
            up_block_has_attention=(False, True),
            block_out_channels=(32, 64),
            layers_per_block=1,
            cross_attention_dim=16,
            num_attention_heads=2,
            motion_num_attention_heads=2,
            motion_max_seq_length=8,
            image_embed_dim=8,
            norm_num_groups=8,
            fast_gelu=False,  # exact erf gelu: fp32 torch-parity tests
        ),
        vae=VAEConfig(
            block_out_channels=(16, 32),
            layers_per_block=1,
            norm_num_groups=8,
            sample_size=32,
        ),
        text_encoder=CLIPTextConfig(
            vocab_size=1000,
            hidden_size=16,
            intermediate_size=32,
            num_hidden_layers=2,
            num_attention_heads=2,
            max_position_embeddings=16,
        ),
        image_encoder=CLIPVisionConfig(
            hidden_size=16,
            intermediate_size=32,
            num_hidden_layers=2,
            num_attention_heads=2,
            image_size=28,
            patch_size=14,
            projection_dim=8,
        ),
    )
