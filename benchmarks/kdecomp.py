"""Decompose the phase+col-IFFT kernel's device time into its pieces:
pure stream (copy), + inverse intra-group matmul, + inter-group roll
stages, + the pyramid phase chain — each variant is the same grid/block
structure with pieces toggled, so consecutive differences isolate the
cost of one piece.  (r4 kernel-efficiency work; results drive which
piece to attack.)

Usage: python benchmarks/kdecomp.py
"""

import functools
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/pbmm_jax_cache")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])

sys.path.insert(0, ".")

from benchmarks.kexp import timed
from pbmm_tpu.config import MagnifyConfig
from pbmm_tpu.spectral.fused import _phase_block
from pbmm_tpu.spectral.hermitian import hermitian_kept_width, kept_lane_indices
from pbmm_tpu.spectral.pallas_fft import (
    _apply_intra_group,
    _dif_twiddles,
    _fft_stages,
    _intra_group_matrix,
    bitrev_freq_axis,
)


def make_variant(h, wk, rows, cfg, pieces):
    """pieces: subset of {"phase", "gm", "rolls"}."""
    twr_np, twi_np = _dif_twiddles(h, True)
    twr, twi = jnp.asarray(twr_np), jnp.asarray(twi_np)
    gr_np, gi_np = _intra_group_matrix(h, True)
    gr, gi = jnp.asarray(gr_np), jnp.asarray(gi_np)
    stages = twr_np.shape[0]
    fy = jnp.asarray(bitrev_freq_axis(h))[:, None]
    fx_np = bitrev_freq_axis(2048)[kept_lane_indices(2048)]
    fx = jnp.asarray(fx_np)[None, :]
    r0, r1 = rows
    block_w = 128
    grid_b = wk // block_w

    spec = pl.BlockSpec((1, h, block_w), lambda i, j: (i, 0, j),
                        memory_space=pltpu.VMEM)
    fy_spec = pl.BlockSpec((h, 1), lambda i, j: (0, 0),
                           memory_space=pltpu.VMEM)
    fx_spec = pl.BlockSpec((1, block_w), lambda i, j: (0, j),
                           memory_space=pltpu.VMEM)
    tw_spec = pl.BlockSpec((stages, h), lambda i, j: (0, 0),
                           memory_space=pltpu.VMEM)
    gm_spec = pl.BlockSpec((128, 128), lambda i, j: (0, 0),
                           memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((1, r1 - r0, block_w), lambda i, j: (i, 0, j),
                            memory_space=pltpu.VMEM)

    def kernel(cr_ref, ci_ref, pr_ref, pi_ref, fy_ref, fx_ref,
               twr_ref, twi_ref, gr_ref, gi_ref, ore, oim):
        if "phase" in pieces:
            mr, mi = _phase_block(cr_ref[0], ci_ref[0], pr_ref[0], pi_ref[0],
                                  fy_ref[:], fx_ref[:], cfg)
        else:
            mr = cr_ref[0] + pr_ref[0]
            mi = ci_ref[0] + pi_ref[0]
        if "gm" in pieces:
            mr, mi = _apply_intra_group(mr, mi, gr_ref[...], gi_ref[...], 0)
        if "rolls" in pieces:
            # inter-group DIT stages only (d >= 128): feed gm=None and a
            # table whose first 7 rows are skipped via row offset... we
            # instead run the full _fft_stages minus matmul by passing
            # gm=None and slicing to the last 4 stage rows.
            mr, mi = _run_roll_stages(mr, mi, twr_ref, twi_ref)
        ore[0] = mr[r0:r1]
        oim[0] = mi[r0:r1]

    def _run_roll_stages(re, im, twr_ref, twi_ref):
        import jax.lax as lax
        n = h
        nstages = n.bit_length() - 1
        pos = lax.broadcasted_iota(jnp.int32, re.shape, 0)
        ds = [n >> (s + 1) for s in range(nstages)][::-1]
        row_offset = 0
        ds4 = [d for d in ds if d >= 128]
        row_offset = nstages - len(ds4)
        for idx, d in enumerate(ds4):
            row = idx + row_offset
            top = (pos & d) == 0
            tw_r = twr_ref[row][:, None]
            tw_i = twi_ref[row][:, None]
            v_re = pltpu.roll(re, d % n, 0)
            v_im = pltpu.roll(im, d % n, 0)
            z_re = re * tw_r - im * tw_i
            z_im = re * tw_i + im * tw_r
            uz_re = pltpu.roll(z_re, (-d) % n, 0)
            uz_im = pltpu.roll(z_im, (-d) % n, 0)
            re, im = (jnp.where(top, re + uz_re, v_re - z_re),
                      jnp.where(top, im + uz_im, v_im - z_im))
        return re, im

    def run(cr, ci, pr, pi_):
        return pl.pallas_call(
            kernel,
            grid=(1, grid_b),
            in_specs=[spec, spec, spec, spec, fy_spec, fx_spec,
                      tw_spec, tw_spec, gm_spec, gm_spec],
            out_specs=(out_spec, out_spec),
            out_shape=(
                jax.ShapeDtypeStruct((1, r1 - r0, wk), jnp.float32),
                jax.ShapeDtypeStruct((1, r1 - r0, wk), jnp.float32),
            ),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024
            ),
        )(cr, ci, pr, pi_, fy, fx, twr, twi, gr, gi)

    return run


def main():
    h = 2048
    wk = hermitian_kept_width(2048)
    rows = (384, 1600)  # ~ the crop+halo cover
    cfg = MagnifyConfig().tuned_for_tpu()
    rng = np.random.default_rng(0)
    arrs = [jax.device_put(rng.random((1, h, wk), np.float32).astype(
        np.float32)) for _ in range(4)]

    variants = [
        ("stream only", frozenset()),
        ("+gm matmul", frozenset({"gm"})),
        ("+rolls", frozenset({"rolls"})),
        ("+gm+rolls", frozenset({"gm", "rolls"})),
        ("+phase", frozenset({"phase"})),
        ("+phase+gm+rolls (full)", frozenset({"phase", "gm", "rolls"})),
    ]
    for name, pieces in variants:
        fn = make_variant(h, wk, rows, cfg, pieces)
        sec = timed(fn, arrs)
        print(f"{name:24s} {sec*1e3:7.3f} ms", flush=True)


if __name__ == "__main__":
    main()
