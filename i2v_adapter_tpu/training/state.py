"""Train state: trainable/frozen param partition, optimizer, EMA.

The reference freezes the whole UNet and unfreezes only each adapter's
``to_q``/``to_out`` projections (K/V stay tied to the frozen spatial attn1
weights — the paper's trainable set), plus the motion modules when
``--update_motion_modules`` is given
(/root/reference/src/models/unet_motion_cross_frame_attn.py:979-1026).

TPU-first: instead of requires_grad flags, the param pytree is *partitioned*
into trainable/frozen sub-trees; grads are taken only w.r.t. the trainable
tree, so frozen params cost no backward FLOPs or optimizer memory — the
functional equivalent of the reference's freeze policy with a better
memory/computation profile than DDP-wrapping the whole model.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import flax.struct
import jax
import jax.numpy as jnp
import optax
from flax.traverse_util import flatten_dict, unflatten_dict

from i2v_adapter_tpu.config import OptimizerConfig, TrainConfig


def trainable_predicate(config: TrainConfig) -> Callable[[str], bool]:
    """Path predicate implementing the reference freeze policy.

    't2i' mode trains the whole UNet (base single-frame finetune,
    reference train_text_to_image.py); 'i2v' mode trains only the adapter's
    to_q/to_out (+ motion modules when flagged)."""
    if config.train_mode == "t2i":
        return lambda path: True

    def pred(path: str) -> bool:
        if "i2v_adapter" in path and ("to_q" in path or "to_out" in path):
            return True
        if config.update_motion_modules and "motion_modules" in path:
            return True
        return False

    return pred


def partition_params(params: dict, pred: Callable[[str], bool]):
    """Split a param tree into (trainable, frozen) by path predicate."""
    flat = flatten_dict(params, sep="/")
    trainable = {k: v for k, v in flat.items() if pred(k)}
    frozen = {k: v for k, v in flat.items() if not pred(k)}
    return (
        unflatten_dict(trainable, sep="/"),
        unflatten_dict(frozen, sep="/"),
    )


def merge_params(trainable: dict, frozen: dict) -> dict:
    flat = dict(flatten_dict(frozen, sep="/"))
    flat.update(flatten_dict(trainable, sep="/"))
    return unflatten_dict(flat, sep="/")


def make_lr_schedule(config: OptimizerConfig, total_steps: int):
    base = config.learning_rate
    warmup = config.lr_warmup_steps
    if config.lr_scheduler == "constant":
        return optax.constant_schedule(base)
    if config.lr_scheduler == "constant_with_warmup":
        return optax.join_schedules(
            [optax.linear_schedule(0.0, base, warmup), optax.constant_schedule(base)],
            [warmup],
        )
    if config.lr_scheduler == "linear":
        return optax.join_schedules(
            [
                optax.linear_schedule(0.0, base, warmup),
                optax.linear_schedule(base, 0.0, max(total_steps - warmup, 1)),
            ],
            [warmup],
        )
    if config.lr_scheduler == "cosine":
        return optax.warmup_cosine_decay_schedule(
            0.0, base, warmup, max(total_steps, warmup + 1)
        )
    raise ValueError(f"unknown lr_scheduler: {config.lr_scheduler}")


def make_optimizer(config: TrainConfig, total_steps: int) -> optax.GradientTransformation:
    """AdamW + global-norm clipping + grad accumulation (the reference's
    AdamW / clip_grad_norm / accelerator.accumulate stack,
    /root/reference/src/train_image_to_video.py:706-731,785,880).

    ``optimizer='adafactor'`` selects factored second moments — the
    memory-cheap analogue of the reference's optional bitsandbytes 8-bit
    Adam (:706-719): optimizer state is O(rows+cols) per matrix instead of
    two full param-sized moments."""
    oc = config.optimizer
    schedule = make_lr_schedule(oc, total_steps)
    if oc.optimizer == "adafactor":
        # Surface the dynamics difference loudly: unlike the 8-bit Adam it
        # stands in for, classic Adafactor has NO momentum and NO weight
        # decay, so adam_* flags are silently inert.  Warn when any of them
        # was set away from its default (docs/PARITY.md records the
        # rationale).
        defaults = OptimizerConfig()
        ignored = [
            name
            for name in ("adam_beta1", "adam_beta2", "adam_weight_decay",
                         "adam_epsilon")
            if getattr(oc, name) != getattr(defaults, name)
        ]
        if ignored:
            import warnings

            warnings.warn(
                f"optimizer='adafactor' ignores {', '.join(ignored)}: "
                "classic Adafactor keeps no momentum and applies no weight "
                "decay (see make_optimizer docstring); ported AdamW recipes "
                "lose both.  Use optimizer='adamw' to honor these flags.",
                stacklevel=2,
            )
        # Classic memory-cheap Adafactor: momentum=None (momentum would
        # re-add a param-sized buffer and defeat the point) and NO weight
        # decay — optax.adafactor's weight_decay_rate is applied per step
        # UNSCALED by the learning rate (p -= rate*p each step), so passing
        # adam_weight_decay (1e-2) would shrink weights ~1%/step, ~1e4x
        # stronger than AdamW's lr*wd.  Adam's epsilon is also the wrong
        # unit here (Adafactor adds eps to the raw second moment, default
        # 1e-30, not to its sqrt), so the optax default is kept.
        inner = optax.adafactor(
            schedule,
            multiply_by_parameter_scale=False,
            clipping_threshold=None,
            momentum=None,
            weight_decay_rate=None,
        )
    else:
        inner = optax.adamw(
            schedule,
            b1=oc.adam_beta1,
            b2=oc.adam_beta2,
            eps=oc.adam_epsilon,
            weight_decay=oc.adam_weight_decay,
        )
    tx = optax.chain(optax.clip_by_global_norm(oc.max_grad_norm), inner)
    if config.gradient_accumulation_steps > 1:
        tx = optax.MultiSteps(tx, config.gradient_accumulation_steps)
    return tx


class TrainState(flax.struct.PyTreeNode):
    """All device-resident training state (a single pytree for pjit)."""

    step: jax.Array
    trainable: Any  # trainable UNet sub-tree
    frozen: Any  # frozen UNet sub-tree
    opt_state: Any
    ema: Optional[Any] = None
    # frozen auxiliary models
    vae: Any = None
    text_encoder: Any = None
    image_encoder: Any = None

    @property
    def unet_params(self) -> dict:
        return {"params": merge_params(self.trainable, self.frozen)}

    @property
    def ema_unet_params(self) -> dict:
        """EMA-averaged UNet params (falls back to the live weights when EMA
        is disabled) — what validation sampling and final export consume,
        matching the reference's ema_unet.store/copy_to swap
        (/root/reference/src/train_text_to_image.py:566-596,887-889)."""
        src = self.ema if self.ema is not None else self.trainable
        return {"params": merge_params(src, self.frozen)}


def create_train_state(
    unet_params: dict,
    config: TrainConfig,
    total_steps: int,
    vae_params: Optional[dict] = None,
    text_params: Optional[dict] = None,
    image_params: Optional[dict] = None,
) -> tuple[TrainState, optax.GradientTransformation]:
    """unet_params is the {'params': ...} tree from init/convert."""
    import jax.numpy as jnp

    pred = trainable_predicate(config)
    trainable, frozen = partition_params(unet_params["params"], pred)
    n_train = sum(x.size for x in jax.tree.leaves(trainable))
    if n_train == 0:
        raise ValueError("freeze policy produced no trainable parameters")
    if config.freeze_dtype == "bfloat16":
        # frozen weights stored half-precision (reference casts frozen
        # models to the mixed-precision dtype); trainable stay fp32
        cast = lambda t: jax.tree.map(
            lambda x: x.astype(jnp.bfloat16)
            if hasattr(x, "astype") and x.dtype == jnp.float32 else x, t
        )
        frozen = cast(frozen)
        vae_params = cast(vae_params) if vae_params is not None else None
        text_params = cast(text_params) if text_params is not None else None
        image_params = cast(image_params) if image_params is not None else None
    tx = make_optimizer(config, total_steps)
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        trainable=trainable,
        frozen=frozen,
        opt_state=tx.init(trainable),
        ema=jax.tree.map(lambda x: x, trainable) if config.use_ema else None,
        vae=vae_params,
        text_encoder=text_params,
        image_encoder=image_params,
    )
    return state, tx


def ema_update(ema, new_params, decay: float):
    return jax.tree.map(lambda e, p: decay * e + (1.0 - decay) * p, ema, new_params)
