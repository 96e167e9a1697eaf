"""Per-epoch device profiling hook (SURVEY §5.1 tracing/profiling).

The reference relies on TF1 session tracing; here one steady-state epoch is
captured with ``jax.profiler`` (XPlane format, viewable in TensorBoard /
xprof) when the config sets ``PROFILE_DIR``. The FIRST epoch after
``FROM_EPOCH`` is skipped — it contains the jit compiles — and the second
is traced, so the capture shows steady-state device time.
"""

from __future__ import annotations


class EpochProfiler:
    def __init__(self, config):
        self.dir = getattr(config, "PROFILE_DIR", None) or None
        self.target = int(getattr(config, "FROM_EPOCH", 0)) + 1
        self.active = False

    def maybe_start(self, epoch: int):
        if self.dir and epoch == self.target and not self.active:
            import jax

            jax.profiler.start_trace(self.dir)
            self.active = True

    def maybe_stop(self, epoch: int):
        if self.active and epoch == self.target:
            import jax

            jax.profiler.stop_trace()
            self.active = False
            print(f"[EpochProfiler] epoch {epoch} trace -> {self.dir}")
