"""Torch (diffusers/transformers layout) <-> Flax pytree weight conversion.

The bridge for pretrained SD1.5 / AnimateDiff / IP-Adapter / I2V-Adapter
checkpoints (SURVEY.md §5.4).  All functions take *flat* ``str -> np.ndarray``
state dicts (load with :func:`load_state_dict` from ``.safetensors`` or
torch ``.bin``) and return Flax param dicts for the models in
``i2v_adapter_tpu.models``.

Conventions:
  Linear  : torch (out, in)        -> kernel (in, out)
  Conv    : torch (O, I, kh, kw)   -> kernel (kh, kw, I, O)
  Norms   : weight -> scale
  Embed   : weight -> embedding

Adapter initialization when no adapter checkpoint is given replicates the
reference's zero-init trick — Q/K/V copied from the frozen spatial attn1,
output projection zeroed so training starts as a no-op
(/root/reference/src/modules/i2v_adapter.py:171-182).
"""

from __future__ import annotations

import os
from typing import Dict, Mapping, Optional

import numpy as np

from i2v_adapter_tpu.config import (
    CLIPTextConfig,
    CLIPVisionConfig,
    VAEConfig,
    VideoUNetConfig,
)

Flat = Dict[str, np.ndarray]


# ---------------------------------------------------------------------------
# IO
# ---------------------------------------------------------------------------


def load_state_dict(path: str) -> Flat:
    """Load a torch .bin/.pt/.ckpt or .safetensors file to numpy arrays."""
    if path.endswith(".safetensors"):
        from safetensors.numpy import load_file

        return dict(load_file(path))
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]

    def to_numpy(v):
        if isinstance(v, dict):
            return {k: to_numpy(x) for k, x in v.items()}
        return v.float().numpy() if hasattr(v, "numpy") else v

    return {k: to_numpy(v) for k, v in sd.items()}


def _unflatten(flat: Mapping[str, np.ndarray]) -> dict:
    tree: dict = {}
    for key, value in flat.items():
        parts = key.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = np.asarray(value)
    return tree


def _linear(sd: Flat, src: str, dst: str, out: Flat, bias: bool = True):
    out[f"{dst}/kernel"] = np.asarray(sd[f"{src}.weight"]).T
    if bias and f"{src}.bias" in sd:
        out[f"{dst}/bias"] = np.asarray(sd[f"{src}.bias"])


def _conv(sd: Flat, src: str, dst: str, out: Flat):
    out[f"{dst}/kernel"] = np.transpose(np.asarray(sd[f"{src}.weight"]), (2, 3, 1, 0))
    if f"{src}.bias" in sd:
        out[f"{dst}/bias"] = np.asarray(sd[f"{src}.bias"])


def _norm(sd: Flat, src: str, dst: str, out: Flat):
    out[f"{dst}/scale"] = np.asarray(sd[f"{src}.weight"])
    out[f"{dst}/bias"] = np.asarray(sd[f"{src}.bias"])


# ---------------------------------------------------------------------------
# Shared sub-structures
# ---------------------------------------------------------------------------


def _attention(sd: Flat, src: str, dst: str, out: Flat, ip: bool = False):
    """diffusers Attention: to_q/k/v (Linear no bias), to_out.0 (Linear)."""
    _linear(sd, f"{src}.to_q", f"{dst}/to_q", out)
    _linear(sd, f"{src}.to_k", f"{dst}/to_k", out)
    _linear(sd, f"{src}.to_v", f"{dst}/to_v", out)
    _linear(sd, f"{src}.to_out.0", f"{dst}/to_out", out)
    if ip:
        # IP-Adapter per-site K/V live in the torch attn *processor*
        # (to_k_ip/to_v_ip); in this framework they're part of attn2 itself.
        _linear(sd, f"{src}.processor.to_k_ip", f"{dst}/to_k_ip", out)
        _linear(sd, f"{src}.processor.to_v_ip", f"{dst}/to_v_ip", out)


def _zero_init_adapter_from_attn1(flat: Flat, block_prefix: str):
    """i2v_adapter Q/K/V <- attn1 Q/K/V; to_out <- 0 (+bias 0)."""
    for proj in ("to_q", "to_k", "to_v"):
        flat[f"{block_prefix}/i2v_adapter/{proj}/kernel"] = flat[
            f"{block_prefix}/attn1/{proj}/kernel"
        ].copy()
    out_kernel = flat[f"{block_prefix}/attn1/to_out/kernel"]
    flat[f"{block_prefix}/i2v_adapter/to_out/kernel"] = np.zeros_like(out_kernel)
    flat[f"{block_prefix}/i2v_adapter/to_out/bias"] = np.zeros(
        out_kernel.shape[1], dtype=out_kernel.dtype
    )


def _transformer_block(
    sd: Flat,
    src: str,
    dst: str,
    out: Flat,
    *,
    use_i2v_adapter: bool,
    use_ip: bool,
    adapter_sd: Optional[Flat] = None,
    adapter_src: Optional[str] = None,
):
    _norm(sd, f"{src}.norm1", f"{dst}/norm1", out)
    _norm(sd, f"{src}.norm2", f"{dst}/norm2", out)
    _norm(sd, f"{src}.norm3", f"{dst}/norm3", out)
    _attention(sd, f"{src}.attn1", f"{dst}/attn1", out)
    _attention(sd, f"{src}.attn2", f"{dst}/attn2", out, ip=use_ip)
    _linear(sd, f"{src}.ff.net.0.proj", f"{dst}/ff/proj", out)
    _linear(sd, f"{src}.ff.net.2", f"{dst}/ff/proj_out", out)
    if use_i2v_adapter:
        if adapter_sd is not None and f"{adapter_src}.to_q.weight" in adapter_sd:
            _linear(adapter_sd, f"{adapter_src}.to_q", f"{dst}/i2v_adapter/to_q", out)
            _linear(adapter_sd, f"{adapter_src}.to_k", f"{dst}/i2v_adapter/to_k", out)
            _linear(adapter_sd, f"{adapter_src}.to_v", f"{dst}/i2v_adapter/to_v", out)
            _linear(
                adapter_sd, f"{adapter_src}.to_out.0", f"{dst}/i2v_adapter/to_out", out
            )
        else:
            _zero_init_adapter_from_attn1(out, dst)


def _spatial_transformer(
    sd: Flat,
    src: str,
    dst: str,
    out: Flat,
    *,
    num_layers: int,
    use_linear_projection: bool,
    use_i2v_adapter: bool,
    use_ip: bool,
    adapter_sd: Optional[Flat] = None,
    adapter_src: Optional[str] = None,
):
    _norm(sd, f"{src}.norm", f"{dst}/norm", out)
    if use_linear_projection:
        _linear(sd, f"{src}.proj_in", f"{dst}/proj_in", out)
        _linear(sd, f"{src}.proj_out", f"{dst}/proj_out", out)
    else:
        _conv(sd, f"{src}.proj_in", f"{dst}/proj_in", out)
        _conv(sd, f"{src}.proj_out", f"{dst}/proj_out", out)
    for k in range(num_layers):
        _transformer_block(
            sd,
            f"{src}.transformer_blocks.{k}",
            f"{dst}/transformer_blocks_{k}",
            out,
            use_i2v_adapter=use_i2v_adapter,
            use_ip=use_ip,
            adapter_sd=adapter_sd,
            adapter_src=f"{adapter_src}.transformer_blocks.{k}.i2v_adapter"
            if adapter_src
            else None,
        )


def _temporal_transformer(sd: Flat, src: str, dst: str, out: Flat, num_layers: int = 1):
    """AnimateDiff motion module = TransformerTemporalModel with double
    self-attention; its positional embedding is analytic (not converted)."""
    _norm(sd, f"{src}.norm", f"{dst}/norm", out)
    _linear(sd, f"{src}.proj_in", f"{dst}/proj_in", out)
    _linear(sd, f"{src}.proj_out", f"{dst}/proj_out", out)
    for k in range(num_layers):
        bsrc, bdst = f"{src}.transformer_blocks.{k}", f"{dst}/transformer_blocks_{k}"
        _norm(sd, f"{bsrc}.norm1", f"{bdst}/norm1", out)
        _norm(sd, f"{bsrc}.norm2", f"{bdst}/norm2", out)
        _norm(sd, f"{bsrc}.norm3", f"{bdst}/norm3", out)
        _attention(sd, f"{bsrc}.attn1", f"{bdst}/attn1", out)
        _attention(sd, f"{bsrc}.attn2", f"{bdst}/attn2", out)
        _linear(sd, f"{bsrc}.ff.net.0.proj", f"{bdst}/ff/proj", out)
        _linear(sd, f"{bsrc}.ff.net.2", f"{bdst}/ff/proj_out", out)


def _resnet(sd: Flat, src: str, dst: str, out: Flat, time_emb: bool = True):
    _norm(sd, f"{src}.norm1", f"{dst}/norm1", out)
    _conv(sd, f"{src}.conv1", f"{dst}/conv1", out)
    if time_emb and f"{src}.time_emb_proj.weight" in sd:
        _linear(sd, f"{src}.time_emb_proj", f"{dst}/time_emb_proj", out)
    _norm(sd, f"{src}.norm2", f"{dst}/norm2", out)
    _conv(sd, f"{src}.conv2", f"{dst}/conv2", out)
    if f"{src}.conv_shortcut.weight" in sd:
        _conv(sd, f"{src}.conv_shortcut", f"{dst}/conv_shortcut", out)


# ---------------------------------------------------------------------------
# UNet (SD1.5 2D UNet + motion adapter + i2v adapter + IP adapter)
# ---------------------------------------------------------------------------


def _ip_site_order(config: VideoUNetConfig):
    """Our (dst prefix) list of attn2 sites in the torch attn_processors
    iteration order: down_blocks, up_blocks, mid_block (module definition
    order in /root/reference/src/models/unet_motion_cross_frame_attn.py:
    757-810 — up_blocks ModuleList is assigned *before* mid_block)."""
    sites = []
    for i, has in enumerate(config.down_block_has_attention):
        if has:
            for j in range(config.layers_per_block):
                for k in range(config.transformer_layers_per_block):
                    sites.append(f"down_blocks_{i}/attentions_{j}/transformer_blocks_{k}")
    for i, has in enumerate(config.up_block_has_attention):
        if has:
            for j in range(config.layers_per_block + 1):
                for k in range(config.transformer_layers_per_block):
                    sites.append(f"up_blocks_{i}/attentions_{j}/transformer_blocks_{k}")
    for k in range(config.transformer_layers_per_block):
        sites.append(f"mid_block/attentions_0/transformer_blocks_{k}")
    return sites


def detect_ip_adapter_variant(ip_adapter_sd: Mapping) -> tuple:
    """Detect the IP-Adapter projection-head variant from checkpoint keys —
    the reference's auto-detection logic
    (/root/reference/src/models/unet_motion_cross_frame_attn.py:1231-1239).

    Returns (variant, num_image_tokens)."""
    proj = ip_adapter_sd["image_proj"]
    if "proj.weight" in proj:
        return "standard", 4
    if "proj.3.weight" in proj:
        return "full_face", 257  # 256 CLIP patch tokens + 1 CLS
    return "plus", int(np.asarray(proj["latents"]).shape[1])


def ip_config_updates(ip_adapter_sd: Mapping) -> dict:
    """VideoUNetConfig field overrides derived from an IP-Adapter state
    dict: variant, token count and (for Plus) resampler geometry."""
    variant, num_tokens = detect_ip_adapter_variant(ip_adapter_sd)
    upd = {"ip_variant": variant, "ip_num_tokens": num_tokens}
    proj = ip_adapter_sd["image_proj"]
    if variant == "plus":
        lat = np.asarray(proj["latents"])
        upd["ip_resampler_dim"] = int(lat.shape[-1])
        upd["ip_resampler_depth"] = len(
            {k.split(".")[1] for k in proj if k.startswith("layers.")}
        )
        upd["ip_hidden_dim"] = int(np.asarray(proj["proj_in.weight"]).shape[1])
    elif variant == "full_face":
        upd["ip_hidden_dim"] = int(np.asarray(proj["proj.0.weight"]).shape[1])
    return upd


def _convert_ip_image_proj(proj: Mapping, variant: str, out: Flat) -> None:
    """Write the image-projection head params for the detected variant
    (torch key layouts are the original ip_adapter module structures the
    reference feeds through diffusers' converter, :1283-1287)."""
    pre = "encoder_hid_proj"
    if variant == "standard":
        out[f"{pre}/proj/kernel"] = np.asarray(proj["proj.weight"]).T
        out[f"{pre}/proj/bias"] = np.asarray(proj["proj.bias"])
        out[f"{pre}/norm/scale"] = np.asarray(proj["norm.weight"])
        out[f"{pre}/norm/bias"] = np.asarray(proj["norm.bias"])
        return
    if variant == "full_face":
        # nn.Sequential(Linear, GELU, Linear, LayerNorm) under 'proj.'
        out[f"{pre}/proj_0/kernel"] = np.asarray(proj["proj.0.weight"]).T
        out[f"{pre}/proj_0/bias"] = np.asarray(proj["proj.0.bias"])
        out[f"{pre}/proj_2/kernel"] = np.asarray(proj["proj.2.weight"]).T
        out[f"{pre}/proj_2/bias"] = np.asarray(proj["proj.2.bias"])
        out[f"{pre}/proj_3/scale"] = np.asarray(proj["proj.3.weight"])
        out[f"{pre}/proj_3/bias"] = np.asarray(proj["proj.3.bias"])
        return
    # plus: perceiver resampler
    out[f"{pre}/latents"] = np.asarray(proj["latents"])[0]
    out[f"{pre}/proj_in/kernel"] = np.asarray(proj["proj_in.weight"]).T
    out[f"{pre}/proj_in/bias"] = np.asarray(proj["proj_in.bias"])
    out[f"{pre}/proj_out/kernel"] = np.asarray(proj["proj_out.weight"]).T
    out[f"{pre}/proj_out/bias"] = np.asarray(proj["proj_out.bias"])
    out[f"{pre}/norm_out/scale"] = np.asarray(proj["norm_out.weight"])
    out[f"{pre}/norm_out/bias"] = np.asarray(proj["norm_out.bias"])
    depth = len({k.split(".")[1] for k in proj if k.startswith("layers.")})
    for i in range(depth):
        attn = f"{pre}/layers_{i}_attn"
        out[f"{attn}/norm1/scale"] = np.asarray(proj[f"layers.{i}.0.norm1.weight"])
        out[f"{attn}/norm1/bias"] = np.asarray(proj[f"layers.{i}.0.norm1.bias"])
        out[f"{attn}/norm2/scale"] = np.asarray(proj[f"layers.{i}.0.norm2.weight"])
        out[f"{attn}/norm2/bias"] = np.asarray(proj[f"layers.{i}.0.norm2.bias"])
        out[f"{attn}/to_q/kernel"] = np.asarray(proj[f"layers.{i}.0.to_q.weight"]).T
        out[f"{attn}/to_kv/kernel"] = np.asarray(proj[f"layers.{i}.0.to_kv.weight"]).T
        out[f"{attn}/to_out/kernel"] = np.asarray(proj[f"layers.{i}.0.to_out.weight"]).T
        out[f"{pre}/layers_{i}_ff_norm/scale"] = np.asarray(
            proj[f"layers.{i}.1.0.weight"])
        out[f"{pre}/layers_{i}_ff_norm/bias"] = np.asarray(
            proj[f"layers.{i}.1.0.bias"])
        out[f"{pre}/layers_{i}_ff_in/kernel"] = np.asarray(
            proj[f"layers.{i}.1.1.weight"]).T
        out[f"{pre}/layers_{i}_ff_out/kernel"] = np.asarray(
            proj[f"layers.{i}.1.3.weight"]).T


def convert_unet(
    unet_sd: Flat,
    config: VideoUNetConfig,
    motion_sd: Optional[Flat] = None,
    i2v_adapter_sd: Optional[Flat] = None,
    ip_adapter_sd: Optional[Mapping] = None,
) -> dict:
    """Build VideoUNet params from a diffusers UNet2DConditionModel state
    dict plus optional MotionAdapter / I2VAdapterModule / IP-Adapter weights.

    This is the functional equivalent of the reference's ``from_unet2d``
    surgery (/root/reference/src/models/unet_motion_cross_frame_attn.py:
    883-977): 2D weights grafted per block, motion modules loaded, adapter
    zero-initialized from attn1 when absent, IP K/V installed at attn2 sites.
    """
    out: Flat = {}
    L = config.layers_per_block

    _conv(unet_sd, "conv_in", "conv_in", out)
    _linear(unet_sd, "time_embedding.linear_1", "time_embedding/linear_1", out)
    _linear(unet_sd, "time_embedding.linear_2", "time_embedding/linear_2", out)
    _norm(unet_sd, "conv_norm_out", "conv_norm_out", out)
    _conv(unet_sd, "conv_out", "conv_out", out)

    n = config.num_blocks
    use_ip = config.use_ip_adapter

    st_kwargs = dict(
        num_layers=config.transformer_layers_per_block,
        use_linear_projection=config.use_linear_projection,
        use_i2v_adapter=config.use_i2v_adapter,
        use_ip=False,  # IP K/V filled separately below (processor weights)
        adapter_sd=i2v_adapter_sd,
    )
    if not config.use_motion_modules:
        motion_sd = None

    for i in range(n):
        has_attn = config.down_block_has_attention[i]
        for j in range(L):
            _resnet(unet_sd, f"down_blocks.{i}.resnets.{j}",
                    f"down_blocks_{i}/resnets_{j}", out)
            if has_attn:
                _spatial_transformer(
                    unet_sd, f"down_blocks.{i}.attentions.{j}",
                    f"down_blocks_{i}/attentions_{j}", out,
                    **{**st_kwargs,
                       "adapter_src": f"down_blocks.{i}.attentions.{j}"},
                )
            if motion_sd is not None:
                _temporal_transformer(
                    motion_sd,
                    f"down_blocks.{i}.motion_modules.{j}.temporal_transformer",
                    f"down_blocks_{i}/motion_modules_{j}", out,
                )
        if i < n - 1:
            _conv(unet_sd, f"down_blocks.{i}.downsamplers.0.conv",
                  f"down_blocks_{i}/downsamplers_0/conv", out)

    # mid
    _resnet(unet_sd, "mid_block.resnets.0", "mid_block/resnets_0", out)
    _resnet(unet_sd, "mid_block.resnets.1", "mid_block/resnets_1", out)
    _spatial_transformer(
        unet_sd, "mid_block.attentions.0", "mid_block/attentions_0", out,
        **{**st_kwargs, "adapter_src": "mid_block.attentions.0"},
    )
    if motion_sd is not None and config.use_motion_mid_block:
        _temporal_transformer(
            motion_sd, "mid_block.motion_modules.0.temporal_transformer",
            "mid_block/motion_modules_0", out,
        )

    for i in range(n):
        has_attn = config.up_block_has_attention[i]
        for j in range(L + 1):
            _resnet(unet_sd, f"up_blocks.{i}.resnets.{j}",
                    f"up_blocks_{i}/resnets_{j}", out)
            if has_attn:
                _spatial_transformer(
                    unet_sd, f"up_blocks.{i}.attentions.{j}",
                    f"up_blocks_{i}/attentions_{j}", out,
                    **{**st_kwargs,
                       "adapter_src": f"up_blocks.{i}.attentions.{j}"},
                )
            if motion_sd is not None:
                _temporal_transformer(
                    motion_sd,
                    f"up_blocks.{i}.motion_modules.{j}.temporal_transformer",
                    f"up_blocks_{i}/motion_modules_{j}", out,
                )
        if i < n - 1:
            _conv(unet_sd, f"up_blocks.{i}.upsamplers.0.conv",
                  f"up_blocks_{i}/upsamplers_0/conv", out)

    # IP-Adapter: image projection head + per-attn2-site K/V.
    if use_ip and ip_adapter_sd is not None:
        _convert_ip_image_proj(
            ip_adapter_sd["image_proj"], config.ip_variant, out
        )
        ip_sd = ip_adapter_sd["ip_adapter"]
        key_id = 1
        for site in _ip_site_order(config):
            out[f"{site}/attn2/to_k_ip/kernel"] = np.asarray(
                ip_sd[f"{key_id}.to_k_ip.weight"]
            ).T
            out[f"{site}/attn2/to_v_ip/kernel"] = np.asarray(
                ip_sd[f"{key_id}.to_v_ip.weight"]
            ).T
            key_id += 2
    elif use_ip:
        raise ValueError("config.use_ip_adapter=True but no ip_adapter_sd given")

    return _unflatten(out)


# ---------------------------------------------------------------------------
# Adapter-only interchange (the reference's save/load_i2v_adapter layout)
# ---------------------------------------------------------------------------


def _strip_params_wrapper(tree: dict) -> dict:
    """Accept either the inner param tree or the {'params': ...} wrapper."""
    if set(tree.keys()) == {"params"}:
        return tree["params"]
    return tree


def extract_i2v_adapter(unet_params: dict, config: VideoUNetConfig) -> Flat:
    """Extract adapter weights from VideoUNet params into the torch
    I2VAdapterModule key layout (reference ``obtain_i2v_adapter_modules``,
    /root/reference/src/models/unet_motion_cross_frame_attn.py:1043-1058)."""
    from flax.traverse_util import flatten_dict

    flat = flatten_dict(_strip_params_wrapper(unet_params), sep="/")
    out: Flat = {}
    for key, val in flat.items():
        if "i2v_adapter" not in key:
            continue
        # down_blocks_0/attentions_1/transformer_blocks_0/i2v_adapter/to_q/kernel
        parts = key.split("/")
        torch_parts = []
        for p in parts[:-2]:
            if "_" in p and p.rsplit("_", 1)[-1].isdigit():
                name, idx = p.rsplit("_", 1)
                if name in ("down_blocks", "up_blocks", "attentions",
                            "transformer_blocks", "resnets", "motion_modules"):
                    torch_parts.extend([name, idx])
                    continue
            torch_parts.append(p)
        proj, leaf = parts[-2], parts[-1]
        tname = ".".join(torch_parts)
        arr = np.asarray(val)
        if proj == "to_out":
            tkey = f"{tname}.to_out.0.{'weight' if leaf == 'kernel' else 'bias'}"
        else:
            tkey = f"{tname}.{proj}.weight"
        out[tkey] = arr.T if leaf == "kernel" else arr
    return out


def extract_motion_modules(unet_params: dict) -> Flat:
    """Extract motion-module weights in the MotionAdapter torch layout
    (reference ``obtain_motion_modules``, :1060-1078)."""
    from flax.traverse_util import flatten_dict

    flat = flatten_dict(_strip_params_wrapper(unet_params), sep="/")
    out: Flat = {}
    for key, val in flat.items():
        if "motion_modules" not in key:
            continue
        parts = key.split("/")
        torch_parts = []
        for p in parts[:-1]:
            if "_" in p and p.rsplit("_", 1)[-1].isdigit():
                name, idx = p.rsplit("_", 1)
                if name in ("down_blocks", "up_blocks", "motion_modules",
                            "transformer_blocks"):
                    torch_parts.extend([name, idx])
                    if name == "motion_modules":
                        torch_parts.append("temporal_transformer")
                    continue
            torch_parts.append(p)
        leaf = parts[-1]
        prefix = ".".join(torch_parts)
        arr = np.asarray(val)
        # reverse the flax renames
        if parts[-2] == "to_out":
            tkey = f"{'.'.join(torch_parts[:-1])}.to_out.0." + (
                "weight" if leaf == "kernel" else "bias"
            )
        elif parts[-2] == "proj" and parts[-3] == "ff":
            tkey = f"{'.'.join(torch_parts[:-1])}.net.0.proj." + (
                "weight" if leaf == "kernel" else "bias"
            )
        elif parts[-2] == "proj_out" and parts[-3] == "ff":
            tkey = f"{'.'.join(torch_parts[:-1])}.net.2." + (
                "weight" if leaf == "kernel" else "bias"
            )
        else:
            if leaf == "kernel":
                tkey = f"{prefix}.weight"
            elif leaf == "scale":
                tkey = f"{prefix}.weight"
            else:
                tkey = f"{prefix}.{leaf}"
        out[tkey] = arr.T if leaf == "kernel" else arr
    return out


def merge_motion_modules(
    unet_params: dict, motion_sd: Flat, config: VideoUNetConfig
) -> dict:
    """Load a MotionAdapter torch state dict into existing VideoUNet params
    (reference ``load_motion_modules``, :1028-1036)."""
    from flax.traverse_util import flatten_dict, unflatten_dict

    out: Flat = {}
    n = config.num_blocks
    for i in range(n):
        for j in range(config.layers_per_block):
            _temporal_transformer(
                motion_sd,
                f"down_blocks.{i}.motion_modules.{j}.temporal_transformer",
                f"down_blocks_{i}/motion_modules_{j}", out,
            )
        for j in range(config.layers_per_block + 1):
            _temporal_transformer(
                motion_sd,
                f"up_blocks.{i}.motion_modules.{j}.temporal_transformer",
                f"up_blocks_{i}/motion_modules_{j}", out,
            )
    if config.use_motion_mid_block:
        _temporal_transformer(
            motion_sd, "mid_block.motion_modules.0.temporal_transformer",
            "mid_block/motion_modules_0", out,
        )
    flat = dict(flatten_dict(_strip_params_wrapper(unet_params), sep="/"))
    for k, v in out.items():
        if k not in flat:
            raise KeyError(f"motion key {k} not found in UNet params")
        flat[k] = np.asarray(v, dtype=np.asarray(flat[k]).dtype)
    return unflatten_dict(flat, sep="/")


def merge_i2v_adapter(unet_params: dict, adapter_sd: Flat,
                      config: VideoUNetConfig) -> dict:
    """Load a torch-layout adapter state dict into existing VideoUNet params
    (reference ``load_i2v_adapter``, non-strict)."""
    import jax

    from flax.traverse_util import flatten_dict, unflatten_dict

    flat = dict(flatten_dict(_strip_params_wrapper(unet_params), sep="/"))
    updated = 0
    for tkey, arr in adapter_sd.items():
        if "i2v_adapter" not in tkey:
            continue
        parts = tkey.split(".")
        # rebuild flax path: down_blocks.0 -> down_blocks_0, to_out.0 -> to_out
        fparts = []
        i = 0
        while i < len(parts):
            p = parts[i]
            if i + 1 < len(parts) and parts[i + 1].isdigit() and p != "to_out":
                fparts.append(f"{p}_{parts[i + 1]}")
                i += 2
            elif p == "to_out":
                fparts.append("to_out")
                i += 2  # skip the '.0'
            else:
                fparts.append(p)
                i += 1
        leaf = fparts.pop()
        leaf = {"weight": "kernel", "bias": "bias"}[leaf]
        fkey = "/".join(fparts) + f"/{leaf}"
        if fkey not in flat:
            raise KeyError(f"adapter key {tkey} -> {fkey} not found in UNet params")
        arr = np.asarray(arr)
        flat[fkey] = (arr.T if leaf == "kernel" else arr).astype(
            np.asarray(flat[fkey]).dtype
        )
        updated += 1
    if updated == 0:
        raise ValueError("no i2v_adapter keys found in state dict")
    del jax
    return unflatten_dict(flat, sep="/")


# ---------------------------------------------------------------------------
# VAE
# ---------------------------------------------------------------------------


def _vae_attention(sd: Flat, src: str, dst: str, out: Flat):
    # New-style diffusers keys (to_q/to_k/to_v/to_out.0) or legacy
    # (query/key/value/proj_attn); both appear in the wild for SD1.5.
    legacy = f"{src}.query.weight" in sd
    names = (
        {"q": "query", "k": "key", "v": "value", "o": "proj_attn"}
        if legacy
        else {"q": "to_q", "k": "to_k", "v": "to_v", "o": "to_out.0"}
    )
    _norm(sd, f"{src}.group_norm", f"{dst}/group_norm", out)
    for ours, theirs in (("to_q", names["q"]), ("to_k", names["k"]),
                         ("to_v", names["v"]), ("to_out", names["o"])):
        w = np.asarray(sd[f"{src}.{theirs}.weight"])
        if w.ndim == 4:  # legacy 1x1 conv
            w = w[:, :, 0, 0]
        out[f"{dst}/{ours}/kernel"] = w.T
        out[f"{dst}/{ours}/bias"] = np.asarray(sd[f"{src}.{theirs}.bias"])


def convert_vae(vae_sd: Flat, config: VAEConfig) -> dict:
    out: Flat = {}
    n = len(config.block_out_channels)
    L = config.layers_per_block

    _conv(vae_sd, "encoder.conv_in", "encoder/conv_in", out)
    for i in range(n):
        for j in range(L):
            _resnet(vae_sd, f"encoder.down_blocks.{i}.resnets.{j}",
                    f"encoder/down_{i}_resnets_{j}", out, time_emb=False)
        if i < n - 1:
            _conv(vae_sd, f"encoder.down_blocks.{i}.downsamplers.0.conv",
                  f"encoder/down_{i}_downsample/conv", out)
    _resnet(vae_sd, "encoder.mid_block.resnets.0", "encoder/mid_resnets_0", out,
            time_emb=False)
    _vae_attention(vae_sd, "encoder.mid_block.attentions.0", "encoder/mid_attn", out)
    _resnet(vae_sd, "encoder.mid_block.resnets.1", "encoder/mid_resnets_1", out,
            time_emb=False)
    _norm(vae_sd, "encoder.conv_norm_out", "encoder/conv_norm_out", out)
    _conv(vae_sd, "encoder.conv_out", "encoder/conv_out", out)

    _conv(vae_sd, "decoder.conv_in", "decoder/conv_in", out)
    _resnet(vae_sd, "decoder.mid_block.resnets.0", "decoder/mid_resnets_0", out,
            time_emb=False)
    _vae_attention(vae_sd, "decoder.mid_block.attentions.0", "decoder/mid_attn", out)
    _resnet(vae_sd, "decoder.mid_block.resnets.1", "decoder/mid_resnets_1", out,
            time_emb=False)
    for i in range(n):
        for j in range(L + 1):
            _resnet(vae_sd, f"decoder.up_blocks.{i}.resnets.{j}",
                    f"decoder/up_{i}_resnets_{j}", out, time_emb=False)
        if i < n - 1:
            _conv(vae_sd, f"decoder.up_blocks.{i}.upsamplers.0.conv",
                  f"decoder/up_{i}_upsample/conv", out)
    _norm(vae_sd, "decoder.conv_norm_out", "decoder/conv_norm_out", out)
    _conv(vae_sd, "decoder.conv_out", "decoder/conv_out", out)

    _conv(vae_sd, "quant_conv", "quant_conv", out)
    _conv(vae_sd, "post_quant_conv", "post_quant_conv", out)
    return _unflatten(out)


# ---------------------------------------------------------------------------
# CLIP
# ---------------------------------------------------------------------------


def _clip_layers(sd: Flat, src: str, dst: str, out: Flat, num_layers: int):
    for i in range(num_layers):
        s, d = f"{src}.layers.{i}", f"{dst}layers_{i}"
        for proj in ("q_proj", "k_proj", "v_proj", "out_proj"):
            _linear(sd, f"{s}.self_attn.{proj}", f"{d}/self_attn/{proj}", out)
        _norm(sd, f"{s}.layer_norm1", f"{d}/layer_norm1", out)
        _norm(sd, f"{s}.layer_norm2", f"{d}/layer_norm2", out)
        _linear(sd, f"{s}.mlp.fc1", f"{d}/mlp/fc1", out)
        _linear(sd, f"{s}.mlp.fc2", f"{d}/mlp/fc2", out)


def convert_clip_text(sd: Flat, config: CLIPTextConfig) -> dict:
    out: Flat = {}
    p = "text_model." if any(k.startswith("text_model.") for k in sd) else ""
    out["token_embedding/embedding"] = np.asarray(
        sd[f"{p}embeddings.token_embedding.weight"]
    )
    out["position_embedding"] = np.asarray(
        sd[f"{p}embeddings.position_embedding.weight"]
    )
    _clip_layers(sd, f"{p}encoder", "", out, config.num_hidden_layers)
    _norm(sd, f"{p}final_layer_norm", "final_layer_norm", out)
    return _unflatten(out)


def convert_clip_vision(sd: Flat, config: CLIPVisionConfig) -> dict:
    out: Flat = {}
    p = "vision_model." if any(k.startswith("vision_model.") for k in sd) else ""
    out["patch_embedding/kernel"] = np.transpose(
        np.asarray(sd[f"{p}embeddings.patch_embedding.weight"]), (2, 3, 1, 0)
    )
    out["class_embedding"] = np.asarray(sd[f"{p}embeddings.class_embedding"])
    out["position_embedding"] = np.asarray(
        sd[f"{p}embeddings.position_embedding.weight"]
    )
    _norm(sd, f"{p}pre_layrnorm", "pre_layrnorm", out)
    _clip_layers(sd, f"{p}encoder", "", out, config.num_hidden_layers)
    _norm(sd, f"{p}post_layernorm", "post_layernorm", out)
    _linear(sd, "visual_projection", "visual_projection", out, bias=False)
    return _unflatten(out)
