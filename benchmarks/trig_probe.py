"""Hardware probe for the polynomial trig helpers used by the fused
standard-mode kernel: runs each primitive inside a trivial Pallas kernel
on the real chip and diffs against numpy fp64.  Debugging aid for the
standard-mode hardware parity gap."""

import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, ".")

from pbmm_tpu.config import MagnifyConfig
from pbmm_tpu.spectral.fused import (
    _atan2_poly,
    _cos_pi,
    _phase_block_standard,
    _sin_pi,
    _sincos_any,
    _standard_weight_block,
)


def run_kernel(fn, *arrays):
    """Run fn elementwise on (8, 128)-shaped operands in a Pallas kernel."""
    def kernel(*refs):
        ins = [r[...] for r in refs[:-1]]
        refs[-1][...] = fn(*ins)

    return pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * len(arrays),
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(arrays[0].shape, jnp.float32),
        interpret=jax.default_backend() == "cpu",
    )(*arrays)


def report(name, got, want, tol=1e-5):
    got = np.asarray(got, np.float64)
    err = np.abs(got - want)
    i = int(err.argmax())
    print(f"{name:24s} max_err={err.max():.3e} at x[{i}] "
          f"(got {got.ravel()[i]:.6f} want {np.ravel(want)[i]:.6f})"
          f"{'  <-- BAD' if err.max() > tol else ''}")


def main():
    print(f"devices: {jax.devices()}", file=sys.stderr)
    rng = np.random.default_rng(0)
    n = 8 * 128

    # atan2 over all quadrants
    y = rng.standard_normal(n).astype(np.float32).reshape(8, 128)
    x = rng.standard_normal(n).astype(np.float32).reshape(8, 128)
    got = run_kernel(_atan2_poly, jnp.asarray(y), jnp.asarray(x))
    report("atan2_poly", got, np.arctan2(y.astype(np.float64), x))

    # sin/cos on [-pi, pi]
    u = (rng.random(n).astype(np.float32) * 2 * np.pi - np.pi).reshape(8, 128)
    report("cos_pi", run_kernel(_cos_pi, jnp.asarray(u)), np.cos(u.astype(np.float64)))
    report("sin_pi", run_kernel(_sin_pi, jnp.asarray(u)), np.sin(u.astype(np.float64)))

    # range-reduced sincos at standard-mode magnitudes (|theta| <= 90)
    th = (rng.standard_normal(n).astype(np.float32) * 30).reshape(8, 128)
    got_c = run_kernel(lambda t: _sincos_any(t)[0], jnp.asarray(th))
    got_s = run_kernel(lambda t: _sincos_any(t)[1], jnp.asarray(th))
    report("sincos_any.cos", got_c, np.cos(th.astype(np.float64)), tol=3e-5)
    report("sincos_any.sin", got_s, np.sin(th.astype(np.float64)), tol=3e-5)

    # the standard weight map vs the numpy oracle weight
    cfg = MagnifyConfig(mode="standard")
    f = (rng.random(n).astype(np.float32) * 0.75).reshape(8, 128)
    got_w = run_kernel(lambda a: _standard_weight_block(a, cfg),
                       jnp.asarray(f))
    from pbmm_tpu.oracle.reference import standard_weight

    # reuse the oracle formula pointwise
    ff = np.minimum(f.astype(np.float64) / 0.707, 1.0)
    w = np.ones_like(ff)
    w = np.where(ff < cfg.low_freq_cutoff,
                 (ff / max(cfg.low_freq_cutoff, 1e-3))
                 ** cfg.filter_steepness, w)
    w = np.where(ff > cfg.high_freq_cutoff,
                 ((1 - ff) / max(1 - cfg.high_freq_cutoff, 1e-3))
                 ** cfg.filter_steepness, w)
    w *= cfg.motion_sensitivity
    mid = (ff > cfg.low_freq_cutoff) & (ff < cfg.high_freq_cutoff)
    w = np.where(mid, w * (1 + cfg.edge_enhancement * np.sin(
        np.pi * (ff - cfg.low_freq_cutoff)
        / (cfg.high_freq_cutoff - cfg.low_freq_cutoff))), w)
    w = np.maximum(w, 0.0)
    report("standard_weight", got_w, w, tol=1e-4)

    # whole standard phase block vs fp64 recomputation
    cr = rng.standard_normal(n).astype(np.float32).reshape(8, 128)
    ci = rng.standard_normal(n).astype(np.float32).reshape(8, 128)
    pr = (cr + 0.05 * rng.standard_normal(n).reshape(8, 128)).astype(np.float32)
    pi_ = (ci + 0.05 * rng.standard_normal(n).reshape(8, 128)).astype(np.float32)
    fy = (rng.random(8).astype(np.float32) - 0.5).reshape(8, 1)
    fx = (rng.random(128).astype(np.float32) - 0.5).reshape(1, 128)
    fy_b = np.broadcast_to(fy, (8, 128)).astype(np.float32).copy()
    fx_b = np.broadcast_to(fx, (8, 128)).astype(np.float32).copy()
    got_re = run_kernel(
        lambda a, b, c, d, e, f: _phase_block_standard(
            a, b, c, d, e, f, cfg)[0],
        jnp.asarray(cr), jnp.asarray(ci), jnp.asarray(pr), jnp.asarray(pi_),
        jnp.asarray(fy_b), jnp.asarray(fx_b))
    # fp64 reference
    C = cr.astype(np.float64) + 1j * ci
    P = pr.astype(np.float64) + 1j * pi_
    freq = np.hypot(fy.astype(np.float64), fx)
    ffn = np.minimum(freq / 0.707, 1.0)
    wv = np.ones_like(ffn)
    wv = np.where(ffn < cfg.low_freq_cutoff,
                  (ffn / 0.05) ** 3.0, wv)
    wv = np.where(ffn > cfg.high_freq_cutoff,
                  ((1 - ffn) / 0.6) ** 3.0, wv)
    wv *= 1.5
    midm = (ffn > 0.05) & (ffn < 0.4)
    wv = np.where(midm, wv * (1 + 0.8 * np.sin(
        np.pi * (ffn - 0.05) / 0.35)), wv)
    wv = np.maximum(wv, 0.0)
    gate = (np.abs(C) < 0.01) | (np.abs(P) < 0.01)
    delta = np.angle(P * np.conj(C))
    out = np.where(gate, C, C * np.exp(1j * delta * wv * cfg.phase_scale))
    report("phase_block_std.re", got_re, out.real, tol=1e-3)


if __name__ == "__main__":
    main()
