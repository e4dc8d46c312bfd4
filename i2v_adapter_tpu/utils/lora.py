"""LoRA checkpoint loading (merge-based).

The reference pipeline inherits diffusers ``LoraLoaderMixin``
(/root/reference/src/pipelines/pipeline_i2v_adapter.py:71) so SD1.5 LoRA
checkpoints can be applied at inference.  Here LoRA weights are *merged*
into the Flax param pytree (W += scale * up @ down) — the right call for a
jit-compiled serving stack: zero runtime overhead, and un-merging is just
reloading base params.

Supports the diffusers peft-style key layout
(``unet.<module path>.lora_A.weight`` / ``lora_B``) and the legacy
``<path>.lora_down.weight`` / ``lora_up`` (kohya) layout for UNet weights.
"""

from __future__ import annotations

import logging
import re
from typing import Dict, Mapping, Tuple

import numpy as np
from flax.traverse_util import flatten_dict, unflatten_dict

logger = logging.getLogger(__name__)


def _torch_path_to_flax(path: str) -> str:
    """unet torch module path -> our flax param path for Dense kernels."""
    parts = path.split(".")
    out = []
    i = 0
    while i < len(parts):
        p = parts[i]
        if i + 1 < len(parts) and parts[i + 1].isdigit():
            if p == "to_out":
                out.append("to_out")
                i += 2
                continue
            if p == "net":
                # ff.net.0.proj -> ff/proj ; ff.net.2 -> ff/proj_out
                idx = parts[i + 1]
                if idx == "0":
                    out.append("proj")
                    i += 3  # skip net, 0, proj
                else:
                    out.append("proj_out")
                    i += 2
                continue
            out.append(f"{p}_{parts[i + 1]}")
            i += 2
        else:
            out.append(p)
            i += 1
    return "/".join(out)


# kohya flattens module paths with underscores; these multi-word module
# names must survive the underscore->dot recovery.
_KOHYA_TOKENS = (
    "down_blocks", "up_blocks", "mid_block", "transformer_blocks",
    "motion_modules", "to_q", "to_k", "to_v", "to_out", "proj_in",
    "proj_out", "time_emb_proj", "conv_shortcut", "i2v_adapter",
    "ff_net", "conv_in", "conv_out",
)


def _repair_kohya_name(name: str) -> str:
    """'down_blocks_0_attentions_0_..._to_q' -> 'down_blocks.0.attentions...'"""
    guarded = name
    for tok in _KOHYA_TOKENS:
        guarded = guarded.replace(tok, tok.replace("_", "\0"))
    guarded = guarded.replace("_", ".").replace("\0", "_")
    return guarded.replace("ff_net", "ff.net")


def parse_lora_state_dict(sd: Mapping[str, np.ndarray]):
    """Collect {flax_param_path: (down, up, alpha)} for UNet LoRA weights."""
    pairs: Dict[str, dict] = {}
    patterns = [
        # diffusers/peft: unet.<dotted path>.lora_A/lora_B.weight
        (re.compile(r"^(?:unet\.)?(.+)\.lora_A\.weight$"), "down"),
        (re.compile(r"^(?:unet\.)?(.+)\.lora_B\.weight$"), "up"),
        # kohya: lora_unet_<underscored path>.lora_down/lora_up.weight
        (re.compile(r"^(?:lora_unet_)?(.+)\.lora_down\.weight$"), "down"),
        (re.compile(r"^(?:lora_unet_)?(.+)\.lora_up\.weight$"), "up"),
        (re.compile(r"^(?:lora_unet_)?(.+)\.alpha$"), "alpha"),
    ]
    for key, val in sd.items():
        if key.startswith(("text_encoder.", "lora_te_")):
            continue  # text-encoder LoRA handled separately if present
        for pat, role in patterns:
            m = pat.match(key)
            if m:
                name = m.group(1)
                if key.startswith("lora_unet_"):
                    name = _repair_kohya_name(name)
                pairs.setdefault(name, {})[role] = np.asarray(val)
                break
    return pairs


def merge_lora(
    unet_params: dict, lora_sd: Mapping[str, np.ndarray], scale: float = 1.0
) -> Tuple[dict, int]:
    """Return (params with LoRA merged, number of layers patched)."""
    flat = dict(flatten_dict(unet_params, sep="/"))
    pairs = parse_lora_state_dict(lora_sd)
    patched = 0
    for name, parts in pairs.items():
        if "down" not in parts or "up" not in parts:
            continue
        down, up = parts["down"], parts["up"]
        rank = down.shape[0]
        alpha = float(parts.get("alpha", rank))
        fpath = _torch_path_to_flax(name) + "/kernel"
        if fpath not in flat:
            logger.debug("lora target not found: %s -> %s", name, fpath)
            continue
        delta = (up @ down).T * (alpha / rank) * scale  # (in, out)
        base = np.asarray(flat[fpath])
        if delta.shape != base.shape:
            logger.warning(
                "lora shape mismatch at %s: %s vs %s", fpath, delta.shape,
                base.shape,
            )
            continue
        flat[fpath] = (base + delta.astype(base.dtype))
        patched += 1
    if patched == 0:
        raise ValueError("no LoRA layers matched the UNet parameter tree")
    return unflatten_dict(flat, sep="/"), patched


def load_textual_inversion(
    text_params: dict,
    tokenizer,
    embedding: np.ndarray,
    token: str,
) -> dict:
    """Append learned-token embedding rows to the CLIP embedding table and
    register placeholder tokens with the tokenizer (``TextualInversionLoaderMixin``
    analogue).  ``embedding`` is (n_vectors, hidden) or (hidden,)."""
    embedding = np.atleast_2d(np.asarray(embedding, np.float32))
    flat = dict(flatten_dict(text_params, sep="/"))
    table_key = next(k for k in flat if k.endswith("token_embedding/embedding"))
    table = np.asarray(flat[table_key])
    tokens = [token] + [f"{token}_{i}" for i in range(1, len(embedding))]
    new_ids = tokenizer.add_tokens(tokens)
    new_table = np.concatenate([table, embedding.astype(table.dtype)])
    if new_ids[0] != len(table):
        raise ValueError("tokenizer/table id mismatch")
    flat[table_key] = new_table
    return unflatten_dict(flat, sep="/")
