"""Tracing / profiling helpers (SURVEY.md §5: the reference has no timing
code at all; Unity's profiler was the only recourse).

- `trace(logdir)`: context manager around `jax.profiler` producing
  Perfetto/XProf traces of the jitted pipeline.
- `stage_times`: wall-clock per pipeline stage (preprocess/FFT, phase,
  IFFT/postprocess) measured with forced synchronization — the structured
  analog of eyeballing Unity's GPU profiler lanes.
- Named scopes for the stages are embedded in the pipeline via
  `jax.named_scope` so traces group by stage.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Dict

import jax
import numpy as np


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a profiler trace of the enclosed block into `logdir`."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def _sync(x):
    """Force completion robustly (block_until_ready can return early on
    tunneled dev runtimes); fetches one element.  Complex leaves are
    real-cast first — complex64 host transfers are unimplemented on some
    TPU runtimes."""
    import jax.numpy as jnp

    leaf = jax.tree_util.tree_leaves(x)[0]
    v = leaf.ravel()[0]
    if jnp.iscomplexobj(v):
        v = jnp.real(v)
    np.asarray(v)


def timeit(fn: Callable, *args, reps: int = 3, warmup: int = 1) -> float:
    """Median wall-clock seconds of fn(*args) with forced sync."""
    for _ in range(warmup):
        _sync(fn(*args))
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        _sync(fn(*args))
        times.append(time.perf_counter() - t0)
    return float(np.median(times))


def stage_times(frames, cfg, reps: int = 3) -> Dict[str, float]:
    """Per-stage median seconds for one frame batch (T, H, W, 3)."""
    import jax.numpy as jnp

    from pbmm_tpu.engine.pipeline import (
        amplify_spectrum,
        postprocess,
        preprocess,
    )

    frames = jnp.asarray(frames)
    pre = jax.jit(lambda f: preprocess(f, cfg))
    specs, windowed = pre(frames)
    prev = jnp.concatenate([specs[:1], specs[:-1]], axis=0)
    amp = jax.jit(lambda c, p: amplify_spectrum(c, p, cfg)[0])
    mod = amp(specs, prev)
    post = jax.jit(lambda m, w: postprocess(m, w, cfg))

    return {
        "preprocess_fft": timeit(pre, frames, reps=reps),
        "phase_amplify": timeit(amp, specs, prev, reps=reps),
        "ifft_postprocess": timeit(post, mod, windowed, reps=reps),
    }
