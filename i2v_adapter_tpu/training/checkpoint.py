"""Checkpointing: Orbax train-state checkpoints + adapter-only interchange.

Mirrors the reference's three mechanisms (SURVEY.md §5.4):

1. **Adapter-only epoch checkpoints** — the primary interchange format:
   ``checkpoint/<task>/epoch_N/{i2v_adapter,motion_modules}/`` holding
   torch-layout state dicts (reference
   unet_motion_cross_frame_attn.py:1043-1116).  Saved as ``.safetensors``
   so both this framework and torch/diffusers stacks can read them.
2. **Full train-state checkpoints** (params + opt state + step) for exact
   resume — Orbax, the reference's ``accelerator.save_state`` analogue
   (train_text_to_image.py:833-860), with a retention limit.
3. **Whole-pipeline export** of all model params at end of training.
"""

from __future__ import annotations

import json
import os
import re
from typing import Optional

import jax
import numpy as np

from i2v_adapter_tpu.config import TrainConfig, VideoUNetConfig
from i2v_adapter_tpu.utils import convert


# ---------------------------------------------------------------------------
# 1. adapter-only interchange checkpoints
# ---------------------------------------------------------------------------


def save_adapter_checkpoint(
    unet_params: dict,
    config: VideoUNetConfig,
    directory: str,
    save_motion: bool = False,
) -> None:
    """Write epoch-style adapter checkpoint (torch-layout safetensors)."""
    from safetensors.numpy import save_file

    os.makedirs(os.path.join(directory, "i2v_adapter"), exist_ok=True)
    adapter_sd = convert.extract_i2v_adapter(unet_params, config)
    adapter_sd = {
        k: np.ascontiguousarray(v, dtype=np.float32)
        for k, v in adapter_sd.items()
    }
    save_file(
        adapter_sd,
        os.path.join(directory, "i2v_adapter", "diffusion_pytorch_model.safetensors"),
    )
    with open(os.path.join(directory, "i2v_adapter", "config.json"), "w") as f:
        json.dump({"_class_name": "I2VAdapterModule", **config.to_dict()}, f)
    if save_motion:
        motion_sd = convert.extract_motion_modules(unet_params)
        motion_sd = {
            k: np.ascontiguousarray(v, dtype=np.float32)
            for k, v in motion_sd.items()
        }
        os.makedirs(os.path.join(directory, "motion_modules"), exist_ok=True)
        save_file(
            motion_sd,
            os.path.join(
                directory, "motion_modules", "diffusion_pytorch_model.safetensors"
            ),
        )


def load_adapter_checkpoint(
    unet_params: dict, config: VideoUNetConfig, directory: str
) -> dict:
    """Merge an adapter checkpoint back into UNet params (non-strict load,
    reference :1038-1041)."""
    path = os.path.join(
        directory, "i2v_adapter", "diffusion_pytorch_model.safetensors"
    )
    adapter_sd = convert.load_state_dict(path)
    params = convert.merge_i2v_adapter(unet_params, adapter_sd, config)
    motion_path = os.path.join(
        directory, "motion_modules", "diffusion_pytorch_model.safetensors"
    )
    if os.path.exists(motion_path):
        motion_sd = convert.load_state_dict(motion_path)
        params = convert.merge_motion_modules(params, motion_sd, config)
    return params


def find_latest_epoch(task_dir: str) -> Optional[int]:
    """Find the highest epoch_N subdirectory (resume discovery, reference
    train_image_to_video.py:622-656)."""
    if not os.path.isdir(task_dir):
        return None
    best = None
    for name in os.listdir(task_dir):
        m = re.fullmatch(r"epoch_(\d+)", name)
        if m:
            n = int(m.group(1))
            best = n if best is None or n > best else best
    return best


# ---------------------------------------------------------------------------
# 2. full train-state checkpoints (Orbax)
# ---------------------------------------------------------------------------


class TrainCheckpointer:
    """Orbax-backed save/restore of the full TrainState with retention.

    ``async_save=True`` overlaps the disk write with training: ``save``
    returns once Orbax has snapshotted the arrays (device->host copy) and
    the serialization runs on a background thread — the standard
    large-scale-TPU pattern, where a multi-GB optimizer-state write would
    otherwise stall the step loop.  Orbax serializes concurrent saves
    internally (a second ``save`` waits for the in-flight one); call
    ``wait()`` before reading the directory or exiting."""

    def __init__(self, directory: str, max_to_keep: Optional[int] = None,
                 async_save: bool = False):
        import orbax.checkpoint as ocp

        self.directory = os.path.abspath(directory)
        self.async_save = async_save
        os.makedirs(self.directory, exist_ok=True)
        self.manager = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True,
                enable_async_checkpointing=async_save,
            ),
        )

    def save(self, step: int, state) -> None:
        import orbax.checkpoint as ocp

        self.manager.save(step, args=ocp.args.StandardSave(state))
        if not self.async_save:
            self.manager.wait_until_finished()

    def wait(self) -> None:
        """Block until any in-flight async save has committed."""
        self.manager.wait_until_finished()

    def restore(self, state_template, step: Optional[int] = None):
        import orbax.checkpoint as ocp

        step = step if step is not None else self.manager.latest_step()
        if step is None:
            return None, None
        restored = self.manager.restore(
            step, args=ocp.args.StandardRestore(state_template)
        )
        return restored, step

    def latest_step(self) -> Optional[int]:
        return self.manager.latest_step()


# ---------------------------------------------------------------------------
# 3. whole-pipeline export
# ---------------------------------------------------------------------------


def export_pipeline(
    params: dict, model_config, directory: str, train_config: Optional[TrainConfig] = None
) -> None:
    """Save every model's params (flax-layout safetensors) + configs —
    the ``pipeline.save_pretrained`` analogue."""
    from flax.traverse_util import flatten_dict
    from safetensors.numpy import save_file

    os.makedirs(directory, exist_ok=True)
    for name, tree in params.items():
        sub = os.path.join(directory, name)
        os.makedirs(sub, exist_ok=True)
        flat = {
            k: np.ascontiguousarray(v)
            for k, v in flatten_dict(tree, sep="/").items()
        }
        save_file(flat, os.path.join(sub, "flax_model.safetensors"))
    with open(os.path.join(directory, "model_config.json"), "w") as f:
        f.write(model_config.to_json())
    if train_config is not None:
        with open(os.path.join(directory, "train_config.json"), "w") as f:
            f.write(train_config.to_json())


def load_pipeline_params(directory: str) -> dict:
    from flax.traverse_util import unflatten_dict
    from safetensors.numpy import load_file

    params = {}
    for name in os.listdir(directory):
        path = os.path.join(directory, name, "flax_model.safetensors")
        if os.path.exists(path):
            params[name] = unflatten_dict(load_file(path), sep="/")
    return params
