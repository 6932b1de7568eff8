"""Nested named wall-clock timers (reference: pyro/util/profile_pyro.py).

On top of the wall-clock report the collection can emit a JAX profiler trace
(`start_trace`/`stop_trace`) for per-kernel TPU analysis -- the TPU analog of
the reference's evolve/limiting/riemann region instrumentation.

Note: timings around jitted calls measure dispatch unless the caller
synchronizes; `Timer.end(sync=...)` can block on a jax array to get honest
device timings.
"""

import time

__all__ = ["TimerCollection", "Timer"]


class Timer:
    """A single named accumulating timer."""

    def __init__(self, name, stack_count=0):
        self.name = name
        self.stack_count = stack_count
        self.is_running = False
        self.start_time = 0.0
        self.elapsed = 0.0

    def begin(self):
        self.start_time = time.perf_counter()
        self.is_running = True

    def end(self, sync=None):
        """Stop the timer; optionally block on a jax value first."""
        if sync is not None:
            try:
                import jax
                jax.block_until_ready(sync)
            except Exception:
                pass
        self.elapsed += time.perf_counter() - self.start_time
        self.is_running = False


class TimerCollection:
    """A collection of timers, nested by the order they were started."""

    def __init__(self):
        self.timers = {}
        self.order = []
        self._stack = 0

    def timer(self, name):
        """Get (or create) the timer named `name`."""
        if name in self.timers:
            return self.timers[name]
        t = Timer(name, stack_count=self._stack_depth())
        self.timers[name] = t
        self.order.append(name)
        return t

    def _stack_depth(self):
        return sum(1 for t in self.timers.values() if t.is_running)

    def report(self):
        """Print all timers, indented by nesting depth."""
        for name in self.order:
            t = self.timers[name]
            print(f"{'  ' * t.stack_count}{name:20s}: {t.elapsed:10.6f} s")

    # -- TPU profiler hooks -------------------------------------------------
    def start_trace(self, logdir):
        import jax
        jax.profiler.start_trace(logdir)

    def stop_trace(self):
        import jax
        jax.profiler.stop_trace()
