"""Tracing / profiling (SURVEY.md section 6.1).

The reference had nothing beyond optional tensorboard scalars; here a
`jax.profiler` trace window is first-class: set `train.profile_dir` and a
window of `profile_steps` steps starting at `profile_start` is captured,
viewable with tensorboard-plugin-profile. `TraceWindow` is the step-driven
state machine the train loop calls once per step.
"""

from __future__ import annotations

import jax


def start_profiler_server(port: int = 9999) -> None:
    """Live-capture endpoint (tensorboard 'capture profile' against
    localhost:port); optional, SURVEY.md section 6.1."""
    jax.profiler.start_server(port)


class TraceWindow:
    """Start/stop a jax.profiler trace over a step interval."""

    def __init__(self, trace_dir: str, start_step: int, num_steps: int):
        self.trace_dir = trace_dir
        self.start_step = start_step
        self.stop_step = start_step + num_steps
        self._active = False
        self._done = False

    def on_step(self, step: int, sync=None) -> None:
        """Call once per step (1-based, after the step is dispatched).
        `sync`: optional array to block on before stopping the trace so the
        captured window contains whole steps."""
        if not self.trace_dir or self._done:
            return
        if not self._active and step >= self.start_step:
            jax.profiler.start_trace(self.trace_dir)
            self._active = True
        elif self._active and step >= self.stop_step:
            if sync is not None:
                jax.block_until_ready(sync)
            jax.profiler.stop_trace()
            self._active = False
            self._done = True

    def close(self, sync=None) -> None:
        if self._active:
            if sync is not None:
                jax.block_until_ready(sync)
            jax.profiler.stop_trace()
            self._active = False
            self._done = True
