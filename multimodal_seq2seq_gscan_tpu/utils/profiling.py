"""Profiling hooks: capture a jax.profiler trace over a training window.

The reference has no profiling story (SURVEY.md §5.1); here a trace of steps
[start, stop) can be captured to a TensorBoard-compatible directory with
``--profile_dir`` on the train CLI.
"""

import logging
from typing import Optional

import jax

logger = logging.getLogger(__name__)


class StepProfiler:
    """Starts a device trace at ``start_step`` and stops it at ``stop_step``."""

    def __init__(self, profile_dir: Optional[str], start_step: int = 10,
                 num_steps: int = 10):
        self.profile_dir = profile_dir
        self.start_step = start_step
        self.stop_step = start_step + num_steps
        self._active = False

    def maybe_start(self, step: int):
        if self.profile_dir and not self._active and step == self.start_step:
            logger.info("Starting jax.profiler trace at step %d -> %s",
                        step, self.profile_dir)
            jax.profiler.start_trace(self.profile_dir)
            self._active = True

    def maybe_stop(self, step: int):
        if self._active and step >= self.stop_step:
            jax.profiler.stop_trace()
            self._active = False
            logger.info("Stopped jax.profiler trace at step %d", step)

    def close(self):
        if self._active:
            jax.profiler.stop_trace()
            self._active = False
