"""Per-stage wall-clock breakdown of the tuned 1080p pipeline on one chip.

Times each pipeline stage (preprocess / FFT / band+phase / IFFT /
postprocess) as an independently jitted function over an 8-frame batch, so
we can see where the 2.8 ms/frame goes.  Diagnostics only — not a headline
bench.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, ".")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/pbmm_jax_cache")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/pbmm_jax_cache")

from pbmm_tpu.config import MagnifyConfig
from pbmm_tpu.engine import pipeline as P

cfg = MagnifyConfig().tuned_for_tpu()
h, w, t = 1080, 1920, 8
rng = np.random.default_rng(0)
base = rng.random((h, w, 3)).astype(np.float32)
frames = np.stack([np.roll(base, i, axis=1) for i in range(t)])
fd = jax.device_put(frames)


def sync(x):
    leaf = jax.tree.leaves(x)[0]
    # device-side f32 scalar, then tiny fetch (complex fetch over the
    # tunneled runtime is unimplemented)
    scalar = jnp.real(leaf.reshape(-1)[0]).astype(jnp.float32)
    np.asarray(scalar)


def timeit(name, fn, *args, reps=8):
    f = jax.jit(fn)
    out = f(*args)
    sync(out)
    out = f(*args)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(*args)
    sync(out)
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:28s} {dt * 1e3 / t:7.3f} ms/frame", flush=True)
    return out


pre = timeit("preprocess (pad+hann+yiq)", lambda x: jax.vmap(
    lambda f: P.preprocess(f, cfg))(x), fd)
spec, yiq = pre
prev_spec = jnp.roll(spec, 1, axis=0)

amp = timeit("amplify (bands+phase)", lambda c, p: jax.vmap(
    lambda cc, pp: P.amplify_spectrum(cc, pp, cfg)[0])(c, p), spec, prev_spec)

timeit("postprocess (ifft+blur+crop)", lambda m, y: jax.vmap(
    lambda mm, yy: P.postprocess(mm, yy, cfg))(m, y), amp, yiq)

timeit("full pair (fused jit)", lambda c, p: jax.vmap(
    lambda cc, pp: P.magnify_frame_pair(pp, cc, cfg))(c, p), fd,
    jnp.roll(fd, 1, axis=0))

# ---- sub-op decomposition --------------------------------------------------
from pbmm_tpu.spectral.pallas_fft import fft2_bitrev, ifft2_bitrev
from pbmm_tpu.core.window import gaussian_blur5, crop_center, geometry_for

re = jnp.real(spec).reshape(-1, *spec.shape[-2:])
im = jnp.imag(spec).reshape(-1, *spec.shape[-2:])
timeit("ifft2_bitrev alone", lambda r, i: ifft2_bitrev(r, i)[0], re, im)
timeit("fft2_bitrev alone", lambda r: fft2_bitrev(r)[0], re)
geom = geometry_for(h, w, cfg.pad_mode)
pad = jnp.abs(spec.reshape(-1, 1, *spec.shape[-2:]))
timeit("blur full-pad + crop", lambda x: crop_center(
    gaussian_blur5(x, cfg.blur_size), geom), pad)
timeit("abs(ifft) only", lambda r, i: jnp.abs(
    jax.lax.complex(*ifft2_bitrev(r, i))), re, im)
