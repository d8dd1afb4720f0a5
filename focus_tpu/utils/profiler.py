"""jax.profiler trace capture around training steps.

The reference has only wall-clock meters (SURVEY.md §5 "Tracing"); the
TPU rebuild adds device traces: set ``TPU.PROFILER: True`` and a trace
of steps [PROFILER_START_STEP, PROFILER_START_STEP + PROFILER_NUM_STEPS)
of the first epoch is written to ``OUTPUT_DIR/profiler`` (viewable in
TensorBoard's profile plugin / Perfetto).
"""

from __future__ import annotations

import os

from focus_tpu.utils import logging

logger = logging.get_logger(__name__)


class StepProfiler:
    """Start/stop a jax.profiler trace over a step window.

    Call ``step(global_step)`` once per training step; the trace brackets
    the configured window. Inactive (zero overhead) unless enabled.
    """

    def __init__(self, cfg):
        tpu = cfg.TPU
        self.enabled = bool(getattr(tpu, "PROFILER", False))
        self.start_step = int(getattr(tpu, "PROFILER_START_STEP", 10))
        self.num_steps = int(getattr(tpu, "PROFILER_NUM_STEPS", 5))
        self.log_dir = os.path.join(cfg.OUTPUT_DIR, "profiler")
        self._tracing = False

    def step(self, global_step: int) -> None:
        if not self.enabled:
            return
        import jax

        if not self._tracing and global_step == self.start_step:
            os.makedirs(self.log_dir, exist_ok=True)
            logger.info(f"profiler: starting trace -> {self.log_dir}")
            jax.profiler.start_trace(self.log_dir)
            self._tracing = True
        elif self._tracing and global_step >= self.start_step + self.num_steps:
            self.stop()

    def stop(self) -> None:
        if self._tracing:
            import jax

            jax.profiler.stop_trace()
            self._tracing = False
            logger.info(f"profiler: trace written to {self.log_dir}")
