"""Metrics logging + step timing + profiling hooks.

The reference logs train_loss via ``accelerator.log`` to TensorBoard and
tracks wall clock with bare ``time.time()`` deltas (SURVEY.md §5.1/§5.5).
Here: JSONL metrics (always), optional TensorBoard events when TF is
importable, a step timer with warmup-aware averages, and thin wrappers over
``jax.profiler`` for trace capture.
"""

from __future__ import annotations

import json
import os
import time
from typing import Optional


class MetricsLogger:
    """Append-only JSONL + optional TensorBoard / Weights & Biases.

    Mirrors the reference's ``--report_to {tensorboard,wandb}`` surface
    (/root/reference/src/train_image_to_video.py:406-414,892): JSONL is
    always written; each tracker activates only if its package imports
    (neither is a hard dependency of this framework).
    """

    def __init__(
        self,
        log_dir: str,
        use_tensorboard: bool = True,
        use_wandb: bool = False,
        wandb_project: str = "i2v_adapter_tpu",
        run_config: Optional[dict] = None,
    ):
        os.makedirs(log_dir, exist_ok=True)
        self.path = os.path.join(log_dir, "metrics.jsonl")
        self._tb = None
        self._wandb = None
        if use_tensorboard:
            try:
                import tensorflow as tf

                self._tb = tf.summary.create_file_writer(log_dir)
            except Exception:  # noqa: BLE001 — TF optional
                self._tb = None
        if use_wandb:
            try:
                import wandb

                self._wandb = wandb.init(
                    project=wandb_project, dir=log_dir, config=run_config,
                    resume="allow",
                )
            except Exception:  # noqa: BLE001 — wandb optional
                self._wandb = None

    def log(self, step: int, metrics: dict) -> None:
        record = {"step": step, "time": time.time(), **metrics}
        with open(self.path, "a") as f:
            f.write(json.dumps(record) + "\n")
        if self._tb is not None:
            import tensorflow as tf

            with self._tb.as_default():
                for k, v in metrics.items():
                    tf.summary.scalar(k, v, step=step)
        if self._wandb is not None:
            self._wandb.log(metrics, step=step)

    def finish(self) -> None:
        if self._wandb is not None:
            self._wandb.finish()
            self._wandb = None

    def read(self) -> list:
        if not os.path.exists(self.path):
            return []
        with open(self.path) as f:
            return [json.loads(line) for line in f]


class StepTimer:
    """Context manager measuring step wall time; first call treated as
    compile and excluded from the running mean."""

    def __init__(self):
        self.last: float = 0.0
        self._total = 0.0
        self._count = 0
        self._t0: Optional[float] = None
        self.compile_time: Optional[float] = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.last = time.perf_counter() - self._t0
        if self.compile_time is None:
            self.compile_time = self.last
        else:
            self._total += self.last
            self._count += 1
        return False

    @property
    def mean(self) -> float:
        return self._total / self._count if self._count else self.last

    @property
    def rate(self) -> float:
        m = self.mean
        return 1.0 / m if m > 0 else 0.0


class Profiler:
    """jax.profiler trace capture scoped to N steps."""

    def __init__(self, log_dir: str, start_step: int, num_steps: int):
        self.log_dir = log_dir
        self.start_step = start_step
        self.stop_step = start_step + num_steps
        self._active = False

    def step(self, step: int) -> None:
        import jax

        if step == self.start_step and not self._active:
            jax.profiler.start_trace(self.log_dir)
            self._active = True
        elif step >= self.stop_step and self._active:
            jax.profiler.stop_trace()
            self._active = False
