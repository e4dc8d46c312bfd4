"""Image-to-video inference pipeline.

The functional equivalent of the reference ``I2VAdapterPipeline.__call__``
(/root/reference/src/pipelines/pipeline_i2v_adapter.py:539-719):

  1. CLIP-encode prompt (+negative) and IP-Adapter image
  2. VAE-encode the condition image
  3. build the PIA-style first-frame similarity prior: Gaussian-blurred
     latents mixed with sharp ones by a per-element Bernoulli mask, noised
     to the truncated schedule's first timestep (:647-656)
  4. DDIM loop with classifier-free guidance, clamping the first-frame
     latent to the condition image every step (:665-700)
  5. VAE-decode all frames

TPU-first design: the *entire* sampler — text/image encoders, VAE encode,
prior construction, the denoise loop as ``lax.scan``, and VAE decode — is
one jit-compiled function per (batch, frames, resolution, steps) bucket.
No host round-trips inside a clip generation; CFG doubling and the
first-frame clamp are straight-line XLA ops.
"""

from __future__ import annotations

import functools
from typing import List, Optional, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np

from i2v_adapter_tpu.config import (
    I2VModelConfig,
    PipelineConfig,
)
from i2v_adapter_tpu.models import (
    AutoencoderKL,
    CLIPTextEncoder,
    CLIPVisionEncoder,
    VideoUNet,
)
from i2v_adapter_tpu.models.vae import decode_sliced
from i2v_adapter_tpu.ops.blur import gaussian_blur
from i2v_adapter_tpu.schedulers import add_noise, ddim_step, make_schedule
from i2v_adapter_tpu.schedulers.ddim import ddim_schedule_arrays
from i2v_adapter_tpu.utils import image as image_utils
from i2v_adapter_tpu.utils.tokenizer import CLIPTokenizer

_DTYPES = {"float32": jnp.float32, "bfloat16": jnp.bfloat16}


def _encoder_cache_elems_per_eval(ucfg, lh: int, lw: int) -> int:
    """Elements of one frame-eval's ``(x, skips)`` encoder cache
    (VideoUNet down path: conv_in skip, per-layer skips, downsample skips,
    final down-path output) — sizes the encoder_cache=2 persistent
    footprint before dispatch."""
    h, w = lh, lw
    n = len(ucfg.block_out_channels)
    elems = h * w * ucfg.block_out_channels[0]  # conv_in skip
    for i, ch in enumerate(ucfg.block_out_channels):
        elems += ucfg.layers_per_block * h * w * ch
        if i < n - 1:
            h, w = -(-h // 2), -(-w // 2)
            elems += h * w * ch  # downsample skip
    elems += h * w * ucfg.block_out_channels[-1]  # down-path output x
    return elems


class I2VAdapterPipeline:
    """Holds model params + tokenizer; builds cached jitted samplers.

    ``params`` is a dict with keys ``unet``, ``vae``, ``text_encoder`` and
    (when IP-Adapter is enabled) ``image_encoder`` — each a Flax param tree.
    """

    def __init__(
        self,
        model_config: I2VModelConfig,
        params: dict,
        tokenizer: CLIPTokenizer,
        pipeline_config: PipelineConfig = PipelineConfig(),
    ):
        if pipeline_config.int8_conv:
            # serving default: int8 UNet/VAE-decoder convs (identical param
            # tree; PipelineConfig.int8_conv=False restores exact convs)
            model_config = model_config.replace(
                unet=model_config.unet.replace(int8_conv=True),
                vae=model_config.vae.replace(int8_decode=True),
            )
        self.config = model_config
        self.pipe_config = pipeline_config
        self.params = params
        self.tokenizer = tokenizer
        dtype = _DTYPES[pipeline_config.dtype]
        self.dtype = dtype
        self.unet = VideoUNet(model_config.unet, dtype=dtype)
        self.vae = AutoencoderKL(model_config.vae, dtype=dtype)
        self.text_encoder = CLIPTextEncoder(model_config.text_encoder, dtype=dtype)
        self.image_encoder = (
            CLIPVisionEncoder(model_config.image_encoder, dtype=dtype)
            if model_config.unet.use_ip_adapter
            else None
        )
        self.schedule = make_schedule(model_config.scheduler)
        self.mesh = None

    # ------------------------------------------------------------------
    # multi-chip serving (beyond the reference: its inference is strictly
    # single-GPU + CPU offload).  One clip's 22-step denoise saturates a
    # single v5e at ~8 s (BASELINE.md roofline); the mesh shards the
    # CFG-doubled clip axis over ``data``, frames over ``seq``, attention
    # heads over ``tensor`` — Pallas kernels run shard-local via
    # parallel.spmd, everything else partitions under GSPMD.
    # ------------------------------------------------------------------

    def enable_mesh(self, mesh) -> None:
        """Shard the sampler over ``mesh``: params placed with tensor-
        parallel rules (attention projections over ``tensor``, rest
        replicated), activations over (data, seq).  Call with a
        ``parallel.mesh.create_mesh`` mesh; ``disable_mesh`` reverts."""
        from i2v_adapter_tpu.parallel.spmd import pipeline_param_shardings

        self.mesh = mesh
        self.params = jax.device_put(
            self.params,
            pipeline_param_shardings(
                self.params, mesh, heads=self.config.unet.num_attention_heads
            ),
        )
        self.__dict__.setdefault("_sampler_cache", {}).clear()

    def disable_mesh(self) -> None:
        self.mesh = None
        self.params = jax.device_put(
            self.params, jax.devices()[0]
        )
        self.__dict__.setdefault("_sampler_cache", {}).clear()

    # ------------------------------------------------------------------
    # memory / quality toggles (reference pipeline :123-181)
    # ------------------------------------------------------------------

    def enable_freeu(self, s1=0.9, s2=0.2, b1=1.2, b2=1.4) -> None:
        """FreeU skip re-weighting; rebuilds the UNet and drops compiled
        sampler caches."""
        self.config = self.config.replace(
            unet=self.config.unet.replace(freeu=(s1, s2, b1, b2))
        )
        self.unet = VideoUNet(self.config.unet, dtype=self.dtype)
        self.__dict__.setdefault("_sampler_cache", {}).clear()

    def disable_freeu(self) -> None:
        self.config = self.config.replace(
            unet=self.config.unet.replace(freeu=None)
        )
        self.unet = VideoUNet(self.config.unet, dtype=self.dtype)
        self.__dict__.setdefault("_sampler_cache", {}).clear()

    def enable_int8_conv(self, enabled: bool = True) -> None:
        """Serving-mode int8 convs — UNet resnet/down/upsample 3x3s
        (VideoUNetConfig.int8_conv: measured 388.6 -> 367.7 ms per 512px
        UNet step on v5e) and VAE-decoder convs (VAEConfig.int8_decode),
        at ~1e-2 relative quantization error.  ON by default
        (PipelineConfig.int8_conv); call with False for exact convs.
        Param tree is unchanged — no reload needed — but compiled
        samplers are dropped."""
        self.config = self.config.replace(
            unet=self.config.unet.replace(int8_conv=enabled),
            vae=self.config.vae.replace(int8_decode=enabled),
        )
        self.unet = VideoUNet(self.config.unet, dtype=self.dtype)
        self.vae = AutoencoderKL(self.config.vae, dtype=self.dtype)
        self.__dict__.setdefault("_sampler_cache", {}).clear()

    def load_lora_weights(self, path: str, scale: float = 1.0) -> int:
        """Merge a LoRA checkpoint into the UNet params (LoraLoaderMixin
        analogue); returns the number of patched layers."""
        from i2v_adapter_tpu.utils import convert
        from i2v_adapter_tpu.utils.lora import merge_lora

        sd = convert.load_state_dict(path)
        merged, patched = merge_lora(self.params["unet"]["params"], sd, scale)
        self.params = dict(self.params)
        self.params["unet"] = {"params": merged}
        self.__dict__.setdefault("_sampler_cache", {}).clear()
        return patched

    def load_textual_inversion(self, path: str, token: str) -> None:
        """Load a learned-embedding checkpoint and register ``token``
        (TextualInversionLoaderMixin analogue)."""
        from i2v_adapter_tpu.utils import convert
        from i2v_adapter_tpu.utils.lora import load_textual_inversion

        sd = convert.load_state_dict(path)
        if "string_to_param" in sd:  # A1111 format
            emb = list(sd["string_to_param"].values())[0]
        elif len(sd) == 1:  # diffusers format: {token: tensor}
            emb = list(sd.values())[0]
        else:
            raise ValueError(f"unrecognized textual-inversion format: {list(sd)[:4]}")
        self.params = dict(self.params)
        new_text_params = load_textual_inversion(
            self.params["text_encoder"]["params"], self.tokenizer,
            np.asarray(emb), token,
        )
        self.params["text_encoder"] = {"params": new_text_params}
        # the embedding table grew: rebuild the encoder with the new vocab
        new_vocab = new_text_params["token_embedding"]["embedding"].shape[0]
        self.config = self.config.replace(
            text_encoder=self.config.text_encoder.replace(vocab_size=new_vocab)
        )
        self.text_encoder = CLIPTextEncoder(self.config.text_encoder,
                                            dtype=self.dtype)
        self.__dict__.setdefault("_sampler_cache", {}).clear()

    # ------------------------------------------------------------------
    # loading
    # ------------------------------------------------------------------

    @classmethod
    def from_pretrained(
        cls,
        path: str,
        model_config: Optional[I2VModelConfig] = None,
        pipeline_config: PipelineConfig = PipelineConfig(),
        i2v_adapter_path: Optional[str] = None,
        motion_adapter_path: Optional[str] = None,
        ip_adapter_path: Optional[str] = None,
    ) -> "I2VAdapterPipeline":
        """Assemble from torch-layout checkpoints on disk — the equivalent
        of the reference's constructor surgery chain (UNet2D + motion
        adapter + i2v adapter + IP adapter, pipeline_i2v_adapter.py:96,780).

        ``path`` uses the diffusers directory layout: subfolders ``unet/``,
        ``vae/``, ``text_encoder/``, ``tokenizer/``, optionally
        ``image_encoder/``; adapters default to sibling subfolders.
        """
        import glob
        import os

        from i2v_adapter_tpu.utils import convert

        model_config = model_config or I2VModelConfig()

        def find_weights(sub):
            for pattern in ("*.safetensors", "*.bin"):
                hits = sorted(glob.glob(os.path.join(path, sub, pattern)))
                if hits:
                    return hits[0]
            return None

        unet_sd = convert.load_state_dict(find_weights("unet"))
        motion_path = motion_adapter_path or find_weights("motion_adapter")
        motion_sd = convert.load_state_dict(motion_path) if motion_path else None
        adapter_path = i2v_adapter_path or find_weights("i2v_adapter")
        adapter_sd = convert.load_state_dict(adapter_path) if adapter_path else None
        ip_path = ip_adapter_path or find_weights("ip_adapter")
        ip_sd = convert.load_state_dict(ip_path) if ip_path else None
        if ip_sd is not None and model_config.unet.use_ip_adapter:
            # auto-detect standard / plus / full_face by checkpoint keys
            # (reference unet_motion_cross_frame_attn.py:1231-1239)
            model_config = model_config.replace(
                unet=model_config.unet.replace(**convert.ip_config_updates(ip_sd))
            )

        params = {
            "unet": {
                "params": convert.convert_unet(
                    unet_sd, model_config.unet, motion_sd, adapter_sd, ip_sd
                )
            },
            "vae": {
                "params": convert.convert_vae(
                    convert.load_state_dict(find_weights("vae")), model_config.vae
                )
            },
            "text_encoder": {
                "params": convert.convert_clip_text(
                    convert.load_state_dict(find_weights("text_encoder")),
                    model_config.text_encoder,
                )
            },
        }
        if model_config.unet.use_ip_adapter:
            params["image_encoder"] = {
                "params": convert.convert_clip_vision(
                    convert.load_state_dict(find_weights("image_encoder")),
                    model_config.image_encoder,
                )
            }
        if pipeline_config.dtype == "bfloat16":
            # store serving weights in bf16 (halves HBM and weight reads;
            # the reference likewise casts inference models to fp16)
            import jax.numpy as jnp_

            params = jax.tree.map(
                lambda x: x.astype(jnp_.bfloat16)
                if hasattr(x, "dtype") and x.dtype == np.float32 else x,
                params,
            )
        tokenizer = CLIPTokenizer.from_pretrained(os.path.join(path, "tokenizer"))
        return cls(model_config, params, tokenizer, pipeline_config)

    # ------------------------------------------------------------------
    # the jitted sampler
    # ------------------------------------------------------------------

    def _sampler(
        self,
        batch: int,
        num_frames: int,
        height: int,
        width: int,
        num_inference_steps: int,
        strength: float,
        guidance_scale: float,
        use_cfg: bool,
        has_condition: bool,
        decode_slice: int,
        vae_tiling: bool = False,
        unet_chunk: int = 1,
        encoder_cache: int = 1,
        cfg_cutoff: float = 1.0,
    ):
        """Cached, jitted clip-generation function for one shape bucket
        (the 'bucketed jit shapes' serving strategy).  The cache is an
        explicit per-instance dict keyed on the bucket tuple — unlike an
        ``lru_cache`` on a bound method it neither pins ``self`` (and the
        full param trees) globally nor couples eviction across instances."""
        key = (
            batch, num_frames, height, width, num_inference_steps, strength,
            guidance_scale, use_cfg, has_condition, decode_slice, vae_tiling,
            unet_chunk, encoder_cache, cfg_cutoff, getattr(self, "mesh", None),
        )
        # setdefault-style lazy init so partially-constructed pipelines
        # (e.g. bench.py's __new__ path) work too
        cache = self.__dict__.setdefault("_sampler_cache", {})
        if key not in cache:
            # the mesh appears only in the cache key (identity — the build
            # reads self.mesh); keyword call so key/signature reorders can't
            # silently misbind (ADVICE r3)
            cache[key] = self._build_sampler(
                batch=batch, num_frames=num_frames, height=height,
                width=width, num_inference_steps=num_inference_steps,
                strength=strength, guidance_scale=guidance_scale,
                use_cfg=use_cfg, has_condition=has_condition,
                decode_slice=decode_slice, vae_tiling=vae_tiling,
                unet_chunk=unet_chunk, encoder_cache=encoder_cache,
                cfg_cutoff=cfg_cutoff,
            )
        return cache[key]

    def _build_parts(
        self,
        batch: int,
        num_frames: int,
        height: int,
        width: int,
        num_inference_steps: int,
        strength: float,
        guidance_scale: float,
        use_cfg: bool,
        has_condition: bool,
        decode_slice: int,
        vae_tiling: bool = False,
        unet_chunk: int = 1,
    ):
        """Build the sampler as three pure functions plus the schedule:

          ``prep_fn(params, text_ids, cond_image, clip_image, rng)
              -> (carry, consts)`` — encoders, VAE encode, similarity prior
          ``step_fn(params, consts, carry, t, t_prev) -> carry`` — one
              CFG denoise step (``carry = (latents, eta_key)``, ``consts =
              (cond_latents, text_states, image_embeds)``)
          ``decode_fn(params, consts, latents) -> video`` — final
              first-frame clamp + VAE decode

        ``_build_sampler`` fuses them into one jit + ``lax.scan`` (the
        fast path: no host round-trips inside a clip); ``_stepwise_sampler``
        jits them separately and drives the loop from the host so that no
        single device dispatch runs for minutes (the axon tunnel kills
        multi-minute dispatches — see BASELINE.md config 5)."""
        cfg = self.config
        schedule = self.schedule
        scale = cfg.vae.scaling_factor
        f = num_frames
        lh, lw = height // cfg.vae.spatial_scale_factor, width // cfg.vae.spatial_scale_factor
        ts, prev = ddim_schedule_arrays(
            cfg.scheduler, num_inference_steps, strength if has_condition else 1.0
        )
        pcfg = self.pipe_config
        # getattr: bench.py builds partially-constructed pipelines via __new__
        mesh = getattr(self, "mesh", None)

        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            from i2v_adapter_tpu.parallel.mesh import DATA_AXIS, SEQ_AXIS

            dsz = int(mesh.shape.get(DATA_AXIS, 1))
            ssz = int(mesh.shape.get(SEQ_AXIS, 1))

            def shard_evals(x):
                # (2B, F, ...) CFG-doubled clip-major batch: clips over
                # ``data``, frames over ``seq`` — the layout the spmd
                # flash/temporal wrappers expect.
                dims = [None] * x.ndim
                if dsz > 1 and x.shape[0] % dsz == 0:
                    dims[0] = DATA_AXIS
                if ssz > 1 and x.ndim > 1 and x.shape[1] % ssz == 0:
                    dims[1] = SEQ_AXIS
                return jax.lax.with_sharding_constraint(
                    x, NamedSharding(mesh, P(*dims))
                )

            def shard_frames(x):
                dims = [None] * x.ndim
                if ssz > 1 and x.ndim > 1 and x.shape[1] % ssz == 0:
                    dims[1] = SEQ_AXIS
                return jax.lax.with_sharding_constraint(
                    x, NamedSharding(mesh, P(*dims))
                )

            def shard_flat(x):
                # frame-parallel VAE decode over data x seq — decode_sharded
                # (models/vae.py) wired into the sampler
                if dsz * ssz > 1 and x.shape[0] % (dsz * ssz) == 0:
                    dims = [None] * x.ndim
                    dims[0] = (DATA_AXIS, SEQ_AXIS)
                    return jax.lax.with_sharding_constraint(
                        x, NamedSharding(mesh, P(*dims))
                    )
                return x
        else:
            shard_evals = shard_frames = shard_flat = lambda x: x

        # clips beyond the motion positional cap use windowed denoising
        use_tiling = num_frames > cfg.unet.motion_max_seq_length
        eta = pcfg.eta

        def prep_fn(params, text_ids, cond_image, clip_image, rng,
                    init_latents=None):
            # text_ids: (2B or B, L); cond_image: (B, H, W, 3) in [-1, 1];
            # clip_image: (B, 224, 224, 3) CLIP-normalized.
            # ``init_latents``: caller-supplied initial latents (reference
            # prepare_latents(latents=...), pipeline_i2v_adapter.py:290-296;
            # DDIM init_noise_sigma is 1.0 so no extra scaling).  With a
            # condition image the similarity prior overwrites them — exactly
            # the reference's behavior (:647-656) — so __call__ only routes
            # them here on the no-condition path.
            (rng_noise, rng_prior, rng_mask, rng_vae, rng_sigma,
             rng_eta) = jax.random.split(rng, 6)

            text_states = self.text_encoder.apply(params["text_encoder"], text_ids)

            if cfg.unet.use_ip_adapter:
                if cfg.unet.ip_variant == "standard":
                    image_embeds = self.image_encoder.apply(
                        params["image_encoder"], clip_image
                    )
                    uncond_embeds = jnp.zeros_like(image_embeds)
                else:
                    # plus/full_face consume penultimate hidden states; the
                    # uncond branch encodes a zero image (reference
                    # encode_image, pipeline_i2v_adapter.py:330-338)
                    _, image_embeds = self.image_encoder.apply(
                        params["image_encoder"], clip_image,
                        output_hidden_state=True,
                    )
                    _, uncond_embeds = self.image_encoder.apply(
                        params["image_encoder"], jnp.zeros_like(clip_image),
                        output_hidden_state=True,
                    )
                if use_cfg:
                    image_embeds = jnp.concatenate(
                        [uncond_embeds, image_embeds], axis=0
                    )
            else:
                image_embeds = None

            if has_condition:
                cond_latents = (
                    self.vae.apply(
                        params["vae"], cond_image.astype(self.dtype),
                        rng_vae, method=self.vae.encode,
                    )
                    * scale
                )  # (B, lh, lw, 4)

                # PIA similarity prior (:647-656): per-element Bernoulli mix
                # of blurred and sharp condition latents over all frames.
                sigma = (
                    pcfg.blur_sigma
                    if pcfg.blur_sigma is not None
                    else jax.random.uniform(rng_sigma, (), minval=0.1, maxval=2.0)
                )
                blurred = gaussian_blur(
                    cond_latents, pcfg.blur_kernel_size, sigma
                )
                prior_shape = (batch, f, lh, lw, cfg.unet.in_channels)
                mask = (
                    jax.random.uniform(rng_mask, prior_shape)
                    < pcfg.frame_similarity_blurred_strength
                ).astype(cond_latents.dtype)
                prior = mask * blurred[:, None] + (1 - mask) * cond_latents[:, None]
                noise = jax.random.normal(rng_prior, prior_shape, dtype=jnp.float32)
                latents = add_noise(
                    schedule, prior.astype(jnp.float32), noise,
                    jnp.full((batch,), ts[0]),
                )
            else:
                cond_latents = None
                if init_latents is not None:
                    latents = init_latents.astype(jnp.float32)
                else:
                    latents = jax.random.normal(
                        rng_noise,
                        (batch, f, lh, lw, cfg.unet.in_channels),
                        dtype=jnp.float32,
                    )
            latents = shard_frames(latents)
            return (latents, rng_eta), (cond_latents, text_states, image_embeds)

        def step_fn(params, consts, carry, t, tp):
            # one CFG denoise step; `t`/`tp` are traced 0-d arrays so a
            # single compile serves every schedule step in both the fused
            # lax.scan and the host-driven stepwise loop.
            cond_latents, text_states, image_embeds = consts
            latents, step_key = carry
            if has_condition:
                latents = latents.at[:, 0].set(cond_latents.astype(latents.dtype))
            model_in = (
                jnp.concatenate([latents] * 2, axis=0) if use_cfg else latents
            )
            model_in = shard_evals(model_in)

            def unet_call(x, anchored=False):
                return self.unet.apply(
                    params["unet"],
                    x.astype(self.dtype),
                    jnp.full((x.shape[0],), t),
                    text_states,
                    image_embeds,
                    enable_cross_frame_attn=has_condition,
                ).astype(jnp.float32)

            def chunked_unet_call(x):
                # UNet forward chunking (the reference's
                # enable_forward_chunking analogue, unet_motion_cross_
                # frame_attn.py:1163-1191): lax.map the UNet over clip
                # sub-batches so peak activation memory scales with the
                # chunk, not the whole serving batch.
                bsz = x.shape[0]
                if unet_chunk <= 1 or bsz % unet_chunk != 0:
                    return unet_call(x)
                per = bsz // unet_chunk

                def one(args):
                    xc, tsc, iec = args
                    return self.unet.apply(
                        params["unet"],
                        xc.astype(self.dtype),
                        jnp.full((xc.shape[0],), t),
                        tsc,
                        iec,
                        enable_cross_frame_attn=has_condition,
                    ).astype(jnp.float32)

                chunk = lambda a: (
                    None if a is None
                    else a.reshape((unet_chunk, per) + a.shape[1:])
                )
                out = jax.lax.map(
                    one,
                    (chunk(x), chunk(text_states), chunk(image_embeds)),
                )
                return out.reshape((bsz,) + out.shape[2:])

            if use_tiling:
                from i2v_adapter_tpu.pipelines.tiling import tiled_unet_call

                # anchored windows prepend the global first frame, so the
                # window must leave room under the motion positional cap.
                # Forward chunking composes: each window's CFG-doubled
                # clip batch is itself chunked (64-frame 768px windows
                # measured 13.9 GB unchunked — over the 15.75 GB chip).
                window = min(
                    pcfg.temporal_window, cfg.unet.motion_max_seq_length - 1
                )
                stride = max(1, min(pcfg.temporal_stride, window - 1))
                noise_pred = tiled_unet_call(
                    lambda x, anchored: chunked_unet_call(x),
                    model_in,
                    window=window,
                    stride=stride,
                )
            else:
                noise_pred = chunked_unet_call(model_in)
            if use_cfg:
                uncond, text = jnp.split(noise_pred, 2, axis=0)
                noise_pred = uncond + guidance_scale * (text - uncond)
            if eta > 0.0:
                step_key, nkey = jax.random.split(step_key)
                step_noise = jax.random.normal(
                    nkey, latents.shape, dtype=jnp.float32
                )
            else:
                step_noise = None
            latents = ddim_step(
                schedule, noise_pred, jnp.full((batch,), t),
                jnp.full((batch,), tp), latents, eta=eta, noise=step_noise,
            )
            return (shard_frames(latents), step_key)

        # ---- encoder-cache step pair (opt-in `encoder_cache=2` serving
        # mode; "Faster Diffusion" encoder propagation, arXiv:2312.09608).
        # step_full_fn runs a normal denoise step but also returns the
        # UNet's down-path features; step_cached_fn reuses them at the
        # NEXT timestep (time tower / mid / up run fresh) — an
        # approximation, quality-gated by the caller, never on by default.
        # Deliberately separate closures from step_fn: the exact path
        # stays byte-identical.  Composes with forward chunking (per-CHUNK
        # caches: lax.map stacks each chunk's features along a leading
        # axis, and the cached map slices them back per chunk) and with
        # temporal tiling (per-WINDOW caches: each window is an
        # independent UNet forward; the static window layout keys the
        # cache tuple) — so config-5-class tiled workloads can run turbo.
        # The cache is persistent across the step pair, so __call__ bounds
        # its size separately from the compute envelope. ----
        def _pre_step(consts, carry):
            cond_latents = consts[0]
            latents, step_key = carry
            if has_condition:
                latents = latents.at[:, 0].set(
                    cond_latents.astype(latents.dtype)
                )
            model_in = (
                jnp.concatenate([latents] * 2, axis=0) if use_cfg else latents
            )
            return latents, step_key, shard_evals(model_in)

        def _post_step(noise_pred, latents, step_key, t, tp):
            if use_cfg:
                uncond, text = jnp.split(noise_pred, 2, axis=0)
                noise_pred = uncond + guidance_scale * (text - uncond)
            if eta > 0.0:
                step_key, nkey = jax.random.split(step_key)
                step_noise = jax.random.normal(
                    nkey, latents.shape, dtype=jnp.float32
                )
            else:
                step_noise = None
            latents = ddim_step(
                schedule, noise_pred, jnp.full((batch,), t),
                jnp.full((batch,), tp), latents, eta=eta, noise=step_noise,
            )
            return (shard_frames(latents), step_key)

        def _unet_full(params, x, t, text_states, image_embeds):
            """(noise_pred, enc_cache) for one UNet eval, chunk-composed:
            with unet_chunk > 1 the lax.map stacks each chunk's features
            along a leading axis — _unet_cached re-chunks identically."""
            bsz = x.shape[0]
            if unet_chunk > 1 and bsz % unet_chunk == 0:
                per = bsz // unet_chunk

                def one(args):
                    xc, tsc, iec = args
                    return self.unet.apply(
                        params["unet"],
                        xc.astype(self.dtype),
                        jnp.full((xc.shape[0],), t),
                        tsc,
                        iec,
                        enable_cross_frame_attn=has_condition,
                        return_encoder=True,
                    )

                chunk = lambda a: (
                    None if a is None
                    else a.reshape((unet_chunk, per) + a.shape[1:])
                )
                out, enc = jax.lax.map(
                    one,
                    (chunk(x), chunk(text_states), chunk(image_embeds)),
                )
                return out.reshape((bsz,) + out.shape[2:]), enc
            return self.unet.apply(
                params["unet"],
                x.astype(self.dtype),
                jnp.full((bsz,), t),
                text_states,
                image_embeds,
                enable_cross_frame_attn=has_condition,
                return_encoder=True,
            )

        def _unet_cached(params, x, t, text_states, image_embeds, enc):
            bsz = x.shape[0]
            if unet_chunk > 1 and bsz % unet_chunk == 0:
                per = bsz // unet_chunk

                def one(args):
                    xc, tsc, iec, ec = args
                    return self.unet.apply(
                        params["unet"],
                        xc.astype(self.dtype),
                        jnp.full((xc.shape[0],), t),
                        tsc,
                        iec,
                        enable_cross_frame_attn=has_condition,
                        cached_encoder=ec,
                    )

                chunk = lambda a: (
                    None if a is None
                    else a.reshape((unet_chunk, per) + a.shape[1:])
                )
                out = jax.lax.map(
                    one,
                    (chunk(x), chunk(text_states), chunk(image_embeds), enc),
                )
                return out.reshape((bsz,) + out.shape[2:])
            return self.unet.apply(
                params["unet"],
                x.astype(self.dtype),
                jnp.full((bsz,), t),
                text_states,
                image_embeds,
                enable_cross_frame_attn=has_condition,
                cached_encoder=enc,
            )

        if use_tiling:
            _turbo_window = min(
                pcfg.temporal_window, cfg.unet.motion_max_seq_length - 1
            )
            _turbo_stride = max(
                1, min(pcfg.temporal_stride, _turbo_window - 1)
            )

        def step_full_fn(params, consts, carry, t, tp):
            _, text_states, image_embeds = consts
            latents, step_key, model_in = _pre_step(consts, carry)
            if use_tiling:
                from i2v_adapter_tpu.pipelines.tiling import tiled_unet_call

                noise_pred, enc_cache = tiled_unet_call(
                    lambda x, anchored, cache: _unet_full(
                        params, x, t, text_states, image_embeds
                    ),
                    model_in,
                    window=_turbo_window,
                    stride=_turbo_stride,
                    collect_caches=True,
                )
            else:
                noise_pred, enc_cache = _unet_full(
                    params, model_in, t, text_states, image_embeds
                )
            carry = _post_step(
                noise_pred.astype(jnp.float32), latents, step_key, t, tp
            )
            return carry, enc_cache

        def step_cached_fn(params, consts, carry, t, tp, enc_cache):
            _, text_states, image_embeds = consts
            latents, step_key, model_in = _pre_step(consts, carry)
            if use_tiling:
                from i2v_adapter_tpu.pipelines.tiling import tiled_unet_call

                noise_pred = tiled_unet_call(
                    lambda x, anchored, cache: _unet_cached(
                        params, x, t, text_states, image_embeds, cache
                    ),
                    model_in,
                    window=_turbo_window,
                    stride=_turbo_stride,
                    caches=enc_cache,
                )
            else:
                noise_pred = _unet_cached(
                    params, model_in, t, text_states, image_embeds, enc_cache
                )
            return _post_step(
                noise_pred.astype(jnp.float32), latents, step_key, t, tp
            )

        # ---- cond-only step (opt-in `cfg_cutoff` adaptive guidance:
        # late denoise steps skip the uncond branch — one UNet eval
        # instead of two — where the CFG halves have converged).  A
        # separate closure, like the turbo pair above, so the exact
        # step_fn stays byte-identical; slices the conditional halves out
        # of the SAME CFG-doubled consts prep_fn produced, so one prep
        # serves both step kinds. ----
        def step_cond_fn(params, consts, carry, t, tp):
            cond_latents, text_states, image_embeds = consts
            if use_cfg:
                # consts are [uncond; cond]-stacked along axis 0
                text_states = text_states[batch:]
                if image_embeds is not None:
                    image_embeds = image_embeds[batch:]
            latents, step_key = carry
            if has_condition:
                latents = latents.at[:, 0].set(
                    cond_latents.astype(latents.dtype)
                )
            model_in = shard_evals(latents)

            def unet_call_c(x):
                return self.unet.apply(
                    params["unet"],
                    x.astype(self.dtype),
                    jnp.full((x.shape[0],), t),
                    text_states,
                    image_embeds,
                    enable_cross_frame_attn=has_condition,
                ).astype(jnp.float32)

            def chunked_c(x):
                # per-chunk lax.map like chunked_unet_call; the cond-only
                # batch is half the CFG one, so a chunk tuned for 2B may
                # not divide B — fall back to one eval then
                bsz = x.shape[0]
                if unet_chunk <= 1 or bsz % unet_chunk != 0:
                    return unet_call_c(x)
                per = bsz // unet_chunk

                def one(args):
                    xc, tsc, iec = args
                    return self.unet.apply(
                        params["unet"],
                        xc.astype(self.dtype),
                        jnp.full((xc.shape[0],), t),
                        tsc,
                        iec,
                        enable_cross_frame_attn=has_condition,
                    ).astype(jnp.float32)

                chunk = lambda a: (
                    None if a is None
                    else a.reshape((unet_chunk, per) + a.shape[1:])
                )
                out = jax.lax.map(
                    one,
                    (chunk(x), chunk(text_states), chunk(image_embeds)),
                )
                return out.reshape((bsz,) + out.shape[2:])

            if use_tiling:
                from i2v_adapter_tpu.pipelines.tiling import tiled_unet_call

                window = min(
                    pcfg.temporal_window, cfg.unet.motion_max_seq_length - 1
                )
                stride = max(1, min(pcfg.temporal_stride, window - 1))
                noise_pred = tiled_unet_call(
                    lambda x, anchored: chunked_c(x),
                    model_in,
                    window=window,
                    stride=stride,
                )
            else:
                noise_pred = chunked_c(model_in)
            # no CFG combine: guidance is off for this step
            if eta > 0.0:
                step_key, nkey = jax.random.split(step_key)
                step_noise = jax.random.normal(
                    nkey, latents.shape, dtype=jnp.float32
                )
            else:
                step_noise = None
            latents = ddim_step(
                schedule, noise_pred, jnp.full((batch,), t),
                jnp.full((batch,), tp), latents, eta=eta, noise=step_noise,
            )
            return (shard_frames(latents), step_key)

        def decode_fn(params, consts, latents):
            cond_latents = consts[0]
            if has_condition:
                latents = latents.at[:, 0].set(cond_latents.astype(latents.dtype))

            # decode all frames; full-batch decode measured 5x faster than
            # slice-4 on v5e at 512px (decode_slice=0 = no slicing), with
            # slicing kept as the low-memory fallback.
            flat = latents.reshape(batch * f, lh, lw, cfg.unet.in_channels)
            flat = shard_flat((flat / scale).astype(self.dtype))
            if vae_tiling:
                from i2v_adapter_tpu.models.vae import decode_tiled

                video = decode_tiled(
                    lambda p, z: self.vae.apply(p, z, method=self.vae.decode),
                    params["vae"], flat,
                )
            elif decode_slice <= 0 or decode_slice >= batch * f:
                video = self.vae.apply(params["vae"], flat, method=self.vae.decode)
            else:
                video = decode_sliced(
                    lambda p, z: self.vae.apply(p, z, method=self.vae.decode),
                    params["vae"],
                    flat,
                    decode_slice,
                )
            # return (B, F, H, W*C): a trailing channel dim of 3 would get
            # lane-padded 3->128 in the output buffer copy (42.7x, 16 GB at
            # batch 8); the flattened form is contiguous so the host reshape
            # is free
            video = video.reshape(
                batch, f, height, width * cfg.vae.out_channels
            )
            return video.astype(jnp.float32)

        return prep_fn, step_fn, decode_fn, ts, prev, (
            step_full_fn, step_cached_fn, step_cond_fn,
        )

    def _build_sampler(
        self,
        batch: int,
        num_frames: int,
        height: int,
        width: int,
        num_inference_steps: int,
        strength: float,
        guidance_scale: float,
        use_cfg: bool,
        has_condition: bool,
        decode_slice: int,
        vae_tiling: bool = False,
        unet_chunk: int = 1,
        encoder_cache: int = 1,
        cfg_cutoff: float = 1.0,
    ):
        """Fused sampler: prep + denoise scan + decode as ONE jit — no host
        round-trips inside a clip generation (the fast path).

        ``encoder_cache=2`` scans over step PAIRS: a full eval that saves
        the UNet down-path features, then a second step reusing them
        (Faster Diffusion encoder propagation) — odd trailing step runs
        full.

        ``cfg_cutoff < 1.0`` splits the schedule into a leading CFG scan
        and a trailing cond-only scan (adaptive guidance — one UNet eval
        per late step); not composed with encoder_cache (call-time
        validated)."""
        prep_fn, step_fn, decode_fn, ts, prev, pair_fns = self._build_parts(
            batch, num_frames, height, width, num_inference_steps, strength,
            guidance_scale, use_cfg, has_condition, decode_slice, vae_tiling,
            unet_chunk,
        )
        mesh = getattr(self, "mesh", None)
        n_cfg = (
            len(ts) if (not use_cfg or cfg_cutoff >= 1.0)
            else int(round(cfg_cutoff * len(ts)))
        )

        def sample_fn(params, text_ids, cond_image, clip_image, rng,
                      init_latents=None):
            carry, consts = prep_fn(
                params, text_ids, cond_image, clip_image, rng, init_latents
            )

            if encoder_cache > 1:
                step_full_fn, step_cached_fn = pair_fns[0], pair_fns[1]
                n = len(ts)
                n2 = n - (n % 2)
                ts2 = jnp.asarray(ts[:n2]).reshape(-1, 2)
                prev2 = jnp.asarray(prev[:n2]).reshape(-1, 2)

                def body(c, tq):
                    t01, tp01 = tq
                    c, enc_cache = step_full_fn(
                        params, consts, c, t01[0], tp01[0]
                    )
                    c = step_cached_fn(
                        params, consts, c, t01[1], tp01[1], enc_cache
                    )
                    return c, None

                carry, _ = jax.lax.scan(body, carry, (ts2, prev2))
                if n % 2:
                    carry = step_fn(
                        params, consts, carry,
                        jnp.asarray(ts[-1]), jnp.asarray(prev[-1]),
                    )
                latents, _ = carry
            elif n_cfg < len(ts):
                # adaptive guidance: leading CFG scan, trailing cond-only
                # scan (one UNet eval per step where the branches have
                # converged); either segment may be empty
                step_cond = pair_fns[2]

                def body(c, t_pair):
                    return step_fn(params, consts, c, t_pair[0], t_pair[1]), None

                def body_cond(c, t_pair):
                    return step_cond(params, consts, c, t_pair[0], t_pair[1]), None

                if n_cfg > 0:
                    carry, _ = jax.lax.scan(
                        body, carry,
                        (jnp.asarray(ts[:n_cfg]), jnp.asarray(prev[:n_cfg])),
                    )
                carry, _ = jax.lax.scan(
                    body_cond, carry,
                    (jnp.asarray(ts[n_cfg:]), jnp.asarray(prev[n_cfg:])),
                )
                latents, _ = carry
            else:
                def body(c, t_pair):
                    return step_fn(params, consts, c, t_pair[0], t_pair[1]), None

                (latents, _), _ = jax.lax.scan(
                    body, carry, (jnp.asarray(ts), jnp.asarray(prev))
                )
            return decode_fn(params, consts, latents)

        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            from i2v_adapter_tpu.parallel.spmd import attention_spmd

            inner_fn = sample_fn

            def sample_fn(*args, **kwargs):
                # trace-time context: Pallas attention sites dispatch to
                # shard_map-wrapped shard-local kernels (parallel/spmd.py)
                with attention_spmd(mesh):
                    return inner_fn(*args, **kwargs)

            return jax.jit(
                sample_fn, out_shardings=NamedSharding(mesh, P())
            )
        return jax.jit(sample_fn)

    def _stepwise_sampler(
        self,
        batch: int,
        num_frames: int,
        height: int,
        width: int,
        num_inference_steps: int,
        strength: float,
        guidance_scale: float,
        use_cfg: bool,
        has_condition: bool,
        decode_slice: int,
        vae_tiling: bool = False,
        unet_chunk: int = 1,
        decode: bool = True,
        encoder_cache: int = 1,
        cfg_cutoff: float = 1.0,
    ):
        """Step-wise sampler: prep / one-denoise-step / decode as THREE
        jits driven by a host loop, so no single device dispatch runs for
        minutes.  Numerically identical to the fused sampler (same part
        functions, same keys); ~len(schedule) extra dispatch overheads.

        Exists for very large workloads (64-frame 768px: ~4 s of UNet work
        per denoise step — the fused sampler would be one multi-minute
        dispatch, which remote-TPU transports kill; each bounded dispatch
        also keeps serving preemptible between steps).

        ``decode=False`` returns final latents (first-frame clamped, still
        x ``vae.scaling_factor``) instead of decoded video — the
        ``output_type='latent'`` path (reference
        pipeline_i2v_adapter.py:699-703).

        ``encoder_cache=2`` drives the same full/cached step pair as the
        fused turbo scan from the host loop (same part functions in the
        same order; equivalence-tested to 2e-5 — separately-jitted parts
        may compile differently from the scan body).  The pair composes
        with temporal tiling (per-window caches) and forward chunking
        (per-chunk caches), so actual config-5 workloads — where a single
        denoise step costs seconds and halving the down path matters
        most — can run turbo."""
        key = (
            batch, num_frames, height, width, num_inference_steps, strength,
            guidance_scale, use_cfg, has_condition, decode_slice, vae_tiling,
            unet_chunk, getattr(self, "mesh", None), "stepwise", decode,
            encoder_cache, cfg_cutoff,
        )
        cache = self.__dict__.setdefault("_sampler_cache", {})
        if key in cache:
            return cache[key]
        prep_fn, step_fn, decode_fn, ts, prev, pair_fns = self._build_parts(
            batch=batch, num_frames=num_frames, height=height, width=width,
            num_inference_steps=num_inference_steps, strength=strength,
            guidance_scale=guidance_scale, use_cfg=use_cfg,
            has_condition=has_condition, decode_slice=decode_slice,
            vae_tiling=vae_tiling, unet_chunk=unet_chunk,
        )
        mesh = getattr(self, "mesh", None)
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            from i2v_adapter_tpu.parallel.spmd import attention_spmd

            def _wrap(f):
                @functools.wraps(f)
                def g(*a, **kw):
                    with attention_spmd(mesh):
                        return f(*a, **kw)

                return g

            prep_jit = jax.jit(_wrap(prep_fn))
            step_jit = jax.jit(_wrap(step_fn))
            decode_jit = jax.jit(
                _wrap(decode_fn), out_shardings=NamedSharding(mesh, P())
            )
            if encoder_cache > 1:
                step_full_jit = jax.jit(_wrap(pair_fns[0]))
                step_cached_jit = jax.jit(_wrap(pair_fns[1]))
            step_cond_jit = jax.jit(_wrap(pair_fns[2]))
        else:
            prep_jit = jax.jit(prep_fn)
            step_jit = jax.jit(step_fn)
            decode_jit = jax.jit(decode_fn)
            if encoder_cache > 1:
                step_full_jit = jax.jit(pair_fns[0])
                step_cached_jit = jax.jit(pair_fns[1])
            step_cond_jit = jax.jit(pair_fns[2])
        ts_np, prev_np = np.asarray(ts), np.asarray(prev)
        # adaptive guidance: steps >= n_cfg run the cond-only part (jitted
        # lazily — never traced when cfg_cutoff is off)
        n_cfg = (
            len(ts_np) if (not use_cfg or cfg_cutoff >= 1.0)
            else int(round(cfg_cutoff * len(ts_np)))
        )

        def run(params, text_ids, cond_image, clip_image, rng,
                init_latents=None, callback=None, callback_steps=1):
            carry, consts = prep_jit(
                params, text_ids, cond_image, clip_image, rng, init_latents
            )

            def after_step(i):
                # per-step callback (reference pipeline_i2v_adapter.py:694-697:
                # fires when i % callback_steps == 0; order-1 DDIM so the
                # progress-bar gate is always true).  Receives the device
                # latents array — np.asarray() it to force a host readback.
                if callback is not None and i % callback_steps == 0:
                    callback(i, int(ts_np[i]), carry[0])

            if encoder_cache > 1:
                # full/cached step pairs; an odd trailing step runs full
                # (exact) — mirrors the fused turbo scan's schedule split.
                n2 = len(ts_np) - (len(ts_np) % 2)
                for i in range(0, n2, 2):
                    carry, enc = step_full_jit(
                        params, consts, carry,
                        jnp.asarray(ts_np[i]), jnp.asarray(prev_np[i]),
                    )
                    jax.block_until_ready(carry)
                    after_step(i)
                    carry = step_cached_jit(
                        params, consts, carry,
                        jnp.asarray(ts_np[i + 1]), jnp.asarray(prev_np[i + 1]),
                        enc,
                    )
                    jax.block_until_ready(carry)
                    after_step(i + 1)
                for i in range(n2, len(ts_np)):
                    carry = step_jit(
                        params, consts, carry,
                        jnp.asarray(ts_np[i]), jnp.asarray(prev_np[i]),
                    )
                    jax.block_until_ready(carry)
                    after_step(i)
            else:
                for i in range(len(ts_np)):
                    fn_i = step_jit if i < n_cfg else step_cond_jit
                    carry = fn_i(
                        params, consts, carry,
                        jnp.asarray(ts_np[i]), jnp.asarray(prev_np[i]),
                    )
                    # bound every device dispatch to one denoise step
                    jax.block_until_ready(carry)
                    after_step(i)
            if not decode:
                latents, cond_latents = carry[0], consts[0]
                if has_condition:
                    latents = latents.at[:, 0].set(
                        cond_latents.astype(latents.dtype)
                    )
                return latents
            return decode_jit(params, consts, carry[0])

        cache[key] = run
        return run

    # ------------------------------------------------------------------
    # user entry point
    # ------------------------------------------------------------------

    def __call__(
        self,
        prompt: Union[str, Sequence[str]],
        condition_image=None,
        ip_adapter_image=None,
        negative_prompt: Union[str, Sequence[str], None] = None,
        num_frames: Optional[int] = None,
        height: Optional[int] = None,
        width: Optional[int] = None,
        num_inference_steps: Optional[int] = None,
        guidance_scale: Optional[float] = None,
        frame_similarity_sample_ratio: Optional[float] = None,
        num_videos_per_prompt: int = 1,
        latents=None,
        seed: int = 0,
        output_type: str = "np",
        decode_slice: int = 0,
        vae_tiling: bool = False,
        unet_chunk: int = 0,
        memory_unsafe: bool = False,
        dispatch: str = "auto",
        encoder_cache: Optional[int] = None,
        cfg_cutoff: Optional[float] = None,
        callback=None,
        callback_steps: int = 1,
    ):
        """Generate clips. Returns (B, F, H, W, 3) uint8 (output_type='np')
        or float32 in [-1, 1] ('latent' returns raw latents).

        ``memory_unsafe=True`` bypasses the single-chip HBM envelope check
        (see ``_check_memory_envelope``) — only for meshes / larger chips.

        ``dispatch``: 'scan' = the whole clip as one fused jit (fastest),
        'stepwise' = one device dispatch per denoise step (for workloads
        whose fused dispatch would run for minutes), 'auto' = stepwise
        once the estimated per-clip UNet work exceeds
        ``SCAN_DISPATCH_MAX_WORK`` eval-tokens.

        ``encoder_cache=2``: opt-in turbo approximation — every second
        denoise step reuses the previous step's UNet down-path features
        (see ``PipelineConfig.encoder_cache``; content-level deviation,
        never on by default).  Composes with temporal tiling (per-window
        caches) and forward chunking (per-chunk caches); the persistent
        cache footprint is bounded by ``MAX_ENC_CACHE_BYTES``.

        ``cfg_cutoff`` in [0, 1]: opt-in adaptive guidance — the leading
        fraction of denoise steps run full CFG, the rest run the
        conditional branch only (one UNet eval instead of two; see
        ``PipelineConfig.cfg_cutoff``).  Content-level deviation like
        encoder_cache; the two are not composed (ValueError).

        ``num_videos_per_prompt``: each prompt (and its condition / IP
        images) is repeated N times with the same interleaved order as the
        reference's encode_prompt (pipeline_i2v_adapter.py:545).

        ``latents``: caller-supplied initial latents, shape
        (B*num_videos_per_prompt, F, H/8, W/8, 4) — reference
        prepare_latents(latents=...) (:633-645).  As in the reference, a
        condition image's similarity prior REPLACES them (:647-656), so
        they only shape the output on the no-condition path.

        ``callback(i, t, latents)`` fires after every ``callback_steps``-th
        denoise step (reference :694-697) with the device latents array;
        requires (and with dispatch='auto' forces) stepwise dispatch."""
        pcfg = self.pipe_config
        num_frames = num_frames or pcfg.num_frames
        height = height or pcfg.height
        width = width or pcfg.width
        steps = num_inference_steps or pcfg.num_inference_steps
        guidance = (
            guidance_scale if guidance_scale is not None else pcfg.guidance_scale
        )
        strength = (
            frame_similarity_sample_ratio
            if frame_similarity_sample_ratio is not None
            else pcfg.frame_similarity_sample_ratio
        )

        prompts = [prompt] if isinstance(prompt, str) else list(prompt)
        batch = len(prompts)
        use_cfg = guidance > 1.0
        has_condition = condition_image is not None

        if negative_prompt is None:
            negatives = [""] * batch
        elif isinstance(negative_prompt, str):
            negatives = [negative_prompt] * batch
        else:
            negatives = list(negative_prompt)

        if num_videos_per_prompt < 1:
            raise ValueError(
                f"num_videos_per_prompt must be >= 1, got {num_videos_per_prompt}"
            )
        if num_videos_per_prompt > 1:
            # interleaved repeat ([p0,p0,p1,p1] for N=2) — the reference's
            # repeat_interleave order in encode_prompt / encode_image
            n = num_videos_per_prompt
            prompts = [p for p in prompts for _ in range(n)]
            negatives = [p for p in negatives for _ in range(n)]
            batch = len(prompts)

        text_ids = self.tokenizer(
            negatives + prompts if use_cfg else prompts, padding="max_length"
        )

        if has_condition:
            cond = image_utils.preprocess_batch(condition_image, height, width)
            if cond.shape[0] != batch and batch % cond.shape[0] == 0:
                # broadcast one image to all clips, or repeat each of B
                # images num_videos_per_prompt times (interleaved, matching
                # the prompt expansion above)
                cond = np.repeat(cond, batch // cond.shape[0], axis=0)
        else:
            lat = self.config.vae.spatial_scale_factor
            cond = np.zeros((batch, height, width, 3), dtype=np.float32)
            del lat

        ip_source = (
            ip_adapter_image if ip_adapter_image is not None else condition_image
        )
        if self.config.unet.use_ip_adapter and ip_source is not None:
            srcs = ip_source if isinstance(ip_source, (list, tuple)) else [ip_source]
            clip_img = np.stack(
                [
                    image_utils.clip_preprocess(
                        s, self.config.image_encoder.image_size
                    )
                    for s in srcs
                ]
            )
            if clip_img.shape[0] != batch and batch % clip_img.shape[0] == 0:
                clip_img = np.repeat(clip_img, batch // clip_img.shape[0], axis=0)
        else:
            s = self.config.image_encoder.image_size
            clip_img = np.zeros((batch, s, s, 3), dtype=np.float32)

        # memory auto-defaults for large serving batches (BASELINE config 3):
        # chunk the UNet forward and slice the VAE decode once the number of
        # concurrent frame evaluations exceeds one chip's comfortable HBM
        # footprint at 512px (batch 8 CFG-doubled = 256 evals OOMs 16 GB).
        evals = batch * num_frames * (2 if use_cfg else 1)
        # temporal tiling bounds the CONCURRENT working set by the window
        # (one anchored window of frames in flight at a time), so the HBM
        # envelope is checked against the windowed frame count; the chunk /
        # slice auto-defaults below still key on the full workload.
        motion_cap = self.config.unet.motion_max_seq_length
        if num_frames > motion_cap:
            window = min(self.pipe_config.temporal_window, motion_cap - 1)
            concurrent_evals = batch * (window + 1) * (2 if use_cfg else 1)
        else:
            window = None
            concurrent_evals = evals
        if not memory_unsafe:
            self._check_memory_envelope(concurrent_evals, height, width, batch)
        sf = self.config.vae.spatial_scale_factor
        tokens = (height // sf) * (width // sf)
        if unet_chunk == 0:
            # token-scaled: 256 evals at 512px (4096 tokens) and 128 evals
            # at 768px both exceed one chip unchunked
            unet_chunk = (
                2 if evals * tokens >= self.UNET_CHUNK_AUTO_EVAL_TOKENS else 1
            )
        if decode_slice == 0 and batch * num_frames > 64:
            decode_slice = 32
        if decode_slice == 0 and tokens > 4096 and batch * num_frames > 8:
            # 768px-class decode: 8 frames of decoder features ~ 5 GB
            decode_slice = 2

        if dispatch not in ("auto", "scan", "stepwise"):
            raise ValueError(f"dispatch must be auto/scan/stepwise, got {dispatch!r}")
        if callback is not None:
            if callback_steps < 1:
                raise ValueError(f"callback_steps must be >= 1, got {callback_steps}")
            if dispatch == "scan":
                raise ValueError(
                    "per-step callback requires stepwise dispatch (the fused "
                    "scan runs the whole clip as one device program); pass "
                    "dispatch='stepwise' or 'auto'"
                )
            dispatch = "stepwise"
        init_latents = None
        if latents is not None and not has_condition:
            # reference prepare_latents(latents=...); with a condition image
            # the similarity prior replaces them (:647-656), so they are
            # (faithfully) dropped on that path above
            lat_shape = (
                batch, num_frames, height // sf, width // sf,
                self.config.unet.in_channels,
            )
            latents = np.asarray(latents)
            if latents.shape != lat_shape:
                raise ValueError(
                    f"latents shape {latents.shape} != expected {lat_shape}"
                )
            init_latents = jnp.asarray(latents, dtype=jnp.float32)
        enc_cache = (
            encoder_cache
            if encoder_cache is not None
            else self.pipe_config.encoder_cache
        )
        if enc_cache not in (1, 2):
            raise ValueError(f"encoder_cache must be 1 (off) or 2, got {enc_cache}")
        cutoff = (
            cfg_cutoff if cfg_cutoff is not None
            else self.pipe_config.cfg_cutoff
        )
        if not (0.0 <= cutoff <= 1.0):
            raise ValueError(f"cfg_cutoff must be in [0, 1], got {cutoff}")
        if not use_cfg:
            cutoff = 1.0  # guidance already off — nothing to cut
        if enc_cache > 1 and cutoff < 1.0:
            raise ValueError(
                "cfg_cutoff and encoder_cache are separate content-level "
                "approximations and are not composed (the turbo step pair "
                "would need cond-only full/cached variants); pick one"
            )
        if enc_cache > 1 and not memory_unsafe:
            # content-level approximation (see PipelineConfig.encoder_cache);
            # composes with both dispatch modes, UNet chunking (per-chunk
            # caches via lax.map) and temporal tiling (per-window caches) —
            # but the cached down-path features PERSIST across the step
            # pair, so their footprint is bounded separately from the
            # compute envelope (all windows' caches are alive at once).
            if window is not None:
                from i2v_adapter_tpu.pipelines.tiling import temporal_windows

                stride = max(1, min(self.pipe_config.temporal_stride, window - 1))
                cached_evals = sum(
                    (e - s) + (1 if s > 0 else 0)
                    for s, e in temporal_windows(num_frames, window, stride)
                ) * batch * (2 if use_cfg else 1)
            else:
                cached_evals = evals
            cache_bytes = (
                cached_evals
                * _encoder_cache_elems_per_eval(
                    self.config.unet, height // sf, width // sf
                )
                * (2 if self.pipe_config.dtype == "bfloat16" else 4)
            )
            budget = self.MAX_ENC_CACHE_BYTES
            if getattr(self, "mesh", None) is not None:
                from i2v_adapter_tpu.parallel.mesh import DATA_AXIS, SEQ_AXIS

                budget *= int(self.mesh.shape.get(DATA_AXIS, 1)) * int(
                    self.mesh.shape.get(SEQ_AXIS, 1)
                )
            if cache_bytes > budget:
                raise ValueError(
                    f"encoder_cache=2 would hold ~{cache_bytes / 1e9:.1f} GB "
                    f"of down-path features across the step pair "
                    f"({cached_evals} cached frame-evals) — over the "
                    f"{budget / 1e9:.1f} GB single-chip cache budget.  Use a "
                    f"smaller batch/resolution, disable encoder_cache, or "
                    f"pass memory_unsafe=True on a mesh / larger device."
                )
        if dispatch == "auto":
            # estimated per-clip UNet work in frame-evals x latent-tokens;
            # tiling re-evaluates overlap frames (+1 anchor per interior
            # window), so count the actual windows.
            if window is not None:
                from i2v_adapter_tpu.pipelines.tiling import temporal_windows

                stride = max(1, min(self.pipe_config.temporal_stride, window - 1))
                per_step_frames = sum(
                    (e - s) + (1 if s > 0 else 0)
                    for s, e in temporal_windows(num_frames, window, stride)
                )
            else:
                per_step_frames = num_frames
            work = (
                steps * batch * per_step_frames * (2 if use_cfg else 1) * tokens
            )
            dispatch = "stepwise" if work > self.SCAN_DISPATCH_MAX_WORK else "scan"
        if output_type == "latent":
            # skip the VAE decode entirely (reference output_type='latent',
            # pipeline_i2v_adapter.py:699-703); the stepwise parts make
            # this a cache-keyed no-decode variant
            fn = self._stepwise_sampler(
                batch, num_frames, height, width, steps, float(strength),
                float(guidance), use_cfg, has_condition, decode_slice,
                vae_tiling, unet_chunk, decode=False, encoder_cache=enc_cache,
                cfg_cutoff=float(cutoff),
            )
            latents = np.asarray(fn(
                self.params,
                jnp.asarray(text_ids),
                jnp.asarray(cond),
                jnp.asarray(clip_img),
                jax.random.PRNGKey(seed),
                init_latents,
                callback=callback,
                callback_steps=callback_steps,
            ))
            if not np.isfinite(latents).all():
                raise FloatingPointError(
                    "generated latents contain non-finite values (see the "
                    "flash_static_max note in the decoded-video guard)."
                )
            return latents
        if dispatch == "stepwise":
            fn = self._stepwise_sampler(
                batch, num_frames, height, width, steps, float(strength),
                float(guidance), use_cfg, has_condition, decode_slice,
                vae_tiling, unet_chunk, encoder_cache=enc_cache,
                cfg_cutoff=float(cutoff),
            )
        else:
            fn = self._sampler(
                batch, num_frames, height, width, steps, float(strength),
                float(guidance), use_cfg, has_condition, decode_slice,
                vae_tiling, unet_chunk, enc_cache, float(cutoff),
            )
        if dispatch == "stepwise":
            video = fn(
                self.params,
                jnp.asarray(text_ids),
                jnp.asarray(cond),
                jnp.asarray(clip_img),
                jax.random.PRNGKey(seed),
                init_latents,
                callback=callback,
                callback_steps=callback_steps,
            )
        else:
            video = fn(
                self.params,
                jnp.asarray(text_ids),
                jnp.asarray(cond),
                jnp.asarray(clip_img),
                jax.random.PRNGKey(seed),
                init_latents,
            )
        video = np.asarray(video).reshape(
            batch, num_frames, height, width, self.config.vae.out_channels
        )
        # Host-side serving numerics guard (free: the array is already on
        # host).  The static-offset flash softmax turns out-of-range logits
        # into NaN by design; training's skip-guard catches that but a
        # serving user would otherwise get a silent black/garbage GIF.
        if not np.isfinite(video).all():
            raise FloatingPointError(
                "generated video contains non-finite values.  Likely causes: "
                "(a) the static-offset flash softmax hit out-of-range logits "
                "— retry with VideoUNetConfig.flash_static_max=0.0 (or "
                "I2V_FLASH_STATIC_MAX=0) to restore the exact per-row max; "
                "(b) non-finite weights in the loaded checkpoint."
            )
        if output_type == "pt" or output_type == "float":
            return video
        return image_utils.postprocess_video(video)

    # unet_chunk=0 auto-enables forward chunking once the concurrent
    # frame-evals x latent-tokens reach this (256 evals at 512px / 128 at
    # 768px both exceed one chip unchunked)
    UNET_CHUNK_AUTO_EVAL_TOKENS: int = 256 * 4096

    # measured single-chip envelope (BASELINE.md config 3, v5e 16 GB):
    # 128 CFG-doubled frame-evals at 512px (4096 latent tokens each) serve
    # fine; 256 evals crash the TPU worker outright rather than raising
    # RESOURCE_EXHAUSTED.  Unit: frame-evals x latent tokens.
    MAX_EVAL_TOKENS: int = 128 * 4096

    # dispatch='auto' switches to the stepwise sampler once the estimated
    # whole-clip UNet work (steps x frame-evals x latent-tokens) exceeds
    # this.  Calibration on the v5e: config 2 (22 x 32 x 4096 = 2.9M) runs
    # ~9 s as one fused dispatch — fine; config 5 (22 x 168 x 9216 = 34M)
    # is a multi-minute dispatch, which remote transports kill.  8M ~= 30 s.
    SCAN_DISPATCH_MAX_WORK: int = 8_000_000

    # encoder_cache=2 persistent-feature budget: the cached down-path
    # features of EVERY window/chunk stay alive across the step pair, on
    # top of params (~2.8 GB bf16) and the compute working set.  6 GB
    # leaves ~7 GB of headroom on a 16 GB v5e; config 5 turbo (168 cached
    # evals at 9216 tokens, ~30 MB each) is ~5.1 GB — inside by design.
    MAX_ENC_CACHE_BYTES: int = 6_000_000_000

    def _check_memory_envelope(
        self, evals: int, height: int, width: int, batch: int
    ) -> None:
        """Refuse serving requests whose UNet working set exceeded the
        measured 16 GB single-chip envelope, instead of crashing the TPU
        worker (the worst failure mode a serving stack can expose).
        Reference analogue: none — the reference OOMs."""
        sf = self.config.vae.spatial_scale_factor
        tokens = (height // sf) * (width // sf)
        budget = self.MAX_EVAL_TOKENS
        if getattr(self, "mesh", None) is not None:
            # eval-sharded sampler: per-device working set divides by the
            # clip/frame parallelism
            from i2v_adapter_tpu.parallel.mesh import DATA_AXIS, SEQ_AXIS

            budget *= int(self.mesh.shape.get(DATA_AXIS, 1)) * int(
                self.mesh.shape.get(SEQ_AXIS, 1)
            )
        if evals * tokens > budget:
            max_batch = max(1, budget // (tokens * (evals // batch)))
            raise ValueError(
                f"request of {evals} UNet frame-evals x {tokens} latent "
                f"tokens exceeds the measured single-chip HBM envelope "
                f"({self.MAX_EVAL_TOKENS} eval-tokens — batch 8 at 512px "
                f"crashes a 16 GB v5e outright).  Split the request into "
                f"batches of <= {max_batch} clip(s) at this resolution, "
                f"lower the resolution, or pass memory_unsafe=True on a "
                f"multi-chip mesh / larger device."
            )

    def export_gifs(self, video_uint8: np.ndarray, prefix: str, fps: int = 8) -> List[str]:
        paths = []
        for i, clip in enumerate(video_uint8):
            paths.append(image_utils.export_to_gif(clip, f"{prefix}_{i}.gif", fps))
        return paths
