"""Profiling helpers — the reference has only a print Timer (SURVEY.md §5);
here the JAX profiler is first-class: capture device traces viewable in
TensorBoard/Perfetto, plus a substeps/sec micro-benchmark."""
from __future__ import annotations

import contextlib
import time
from typing import Callable, Iterable

import jax


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/plb_trace"):
    """Capture a device trace: `with profiling.trace('...'): run_step()`.
    Open with TensorBoard's profile plugin or ui.perfetto.dev."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def benchmark(fn: Callable, *args, iters: int = 20, warmup: int = 2,
              label: str = "fn"):
    """Steady-state wall time of a jitted callable. Returns seconds/call."""
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"[bench] {label}: {dt * 1e3:.3f} ms/call")
    return dt


def substeps_per_sec(env, horizon: int = 5, iters: int = 3) -> float:
    """Headline forward metric on a built PhysicsEnv."""
    import numpy as np

    action = np.zeros(env.scene.action_dim, env.dtype)
    env.step(action)  # compile
    t0 = time.perf_counter()
    for _ in range(horizon * iters):
        env.step(action)
    jax.block_until_ready(env.state.x)
    dt = time.perf_counter() - t0
    return horizon * iters * env.scene.simulator.substeps / dt
