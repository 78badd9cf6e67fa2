"""Diagnose the batched chunk engine: time each sub-stage of
the batched chunk engine at T=16 1080p on hardware, vs the same work
issued per-frame.  Usage: python benchmarks/bdiag.py [names...]
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/pbmm_jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])

sys.path.insert(0, ".")

from pbmm_tpu.config import MagnifyConfig
from pbmm_tpu.core.window import geometry_for
from pbmm_tpu.engine.pipeline import blur_row_window, posttail, preprocess
from pbmm_tpu.spectral.fused import phase_col_ifft, row_ifft_magnitude


def _sync(x):
    np.asarray(jax.tree_util.tree_leaves(x)[0]).ravel()[:1]


def timed(fn, args, ks=(4, 24)):
    """Per-iteration device seconds via the fori_loop slope."""
    def make(k):
        @jax.jit
        def run(*a):
            def body(_, carry):
                out = fn(a[0] + carry * 1e-30, *a[1:])
                leaves = jax.tree_util.tree_leaves(out)
                return carry + sum(l.ravel().astype(jnp.float32)[0]
                                   for l in leaves)
            return jax.lax.fori_loop(0, k, body, jnp.float32(0.0))
        return run

    walls = []
    for k in ks:
        run = make(k)
        _sync(run(*args))
        best = float("inf")
        for _ in range(4):
            t0 = time.perf_counter()
            _sync(run(*args))
            best = min(best, time.perf_counter() - t0)
        walls.append(best)
    return float(np.polyfit(ks, walls, 1)[0])


def main():
    which = set(sys.argv[1:])
    t, h, w = 16, 1080, 1920
    cfg = MagnifyConfig().tuned_for_tpu()
    geom = geometry_for(h, w, cfg.pad_mode)
    rows = blur_row_window(geom, cfg)
    rng = np.random.default_rng(0)
    frames = jax.device_put(rng.random((t, h, w, 3)).astype(np.float32))

    pre = jax.jit(lambda f: preprocess(f, cfg))
    specs, yiqs = pre(frames)
    sre = jax.device_put(np.asarray(jnp.real(specs)))
    sim = jax.device_put(np.asarray(jnp.imag(specs)))
    c = specs.shape[1]

    full_re = jax.device_put(np.concatenate(
        [np.asarray(sre[:1]), np.asarray(sre)], axis=0
    ).reshape(-1, *sre.shape[-2:]))
    full_im = jax.device_put(np.asarray(jnp.concatenate(
        [sim[:1], sim], axis=0)).reshape(-1, *sim.shape[-2:]))

    def phase_paired(a, b):
        return phase_col_ifft(a, b, None, None, cfg, out_rows=rows,
                              full_w=geom.pad_w, pair_offset=c)

    rre, rim = phase_paired(full_re, full_im)

    def phase_sep(a, b, pa, pb):
        return phase_col_ifft(a, b, pa, pb, cfg, out_rows=rows,
                              full_w=geom.pad_w)

    flat_re = jax.device_put(np.asarray(sre).reshape(-1, *sre.shape[-2:]))
    flat_im = jax.device_put(np.asarray(sim).reshape(-1, *sim.shape[-2:]))

    def rowifft(a, b):
        return row_ifft_magnitude(a, b, magnitude=True, pad_h=geom.pad_h,
                                  full_w=geom.pad_w)

    rec = rowifft(rre, rim)
    chans = jax.device_put(np.asarray(rec).reshape(
        t, c, rows[1] - rows[0], geom.pad_w))

    def post(ch, yq):
        return posttail(ch, yq, cfg, row0=rows[0])

    def concat_split(s):
        fr = jnp.concatenate([jnp.real(s[:1]), jnp.real(s)], axis=0)
        fi = jnp.concatenate([jnp.imag(s[:1]), jnp.imag(s)], axis=0)
        return fr.reshape(-1, *fr.shape[-2:]), fi.reshape(-1, *fi.shape[-2:])

    # --- channels-last pre/post candidates (no big transposes) ---
    from pbmm_tpu.core.color import RGB_TO_YIQ, YIQ_TO_RGB
    from pbmm_tpu.core.window import blur_then_crop, hann2d_region
    from pbmm_tpu.core.window import Geometry
    from pbmm_tpu.spectral.fused import aligned_row_window

    r0, r1 = aligned_row_window(geom.y0, geom.y0 + geom.in_h, geom.pad_h)

    def pre_cl(fr):
        m = RGB_TO_YIQ
        y = (fr[..., 0] * float(m[0, 0]) + fr[..., 1] * float(m[0, 1])
             + fr[..., 2] * float(m[0, 2]))
        iq = jnp.stack(
            [fr[..., 0] * float(m[d, 0]) + fr[..., 1] * float(m[d, 1])
             + fr[..., 2] * float(m[d, 2]) for d in (1, 2)], axis=-1)
        slab = jnp.pad(y, [(0, 0),
                           (geom.y0 - r0, r1 - geom.y0 - geom.in_h),
                           (geom.x0, geom.pad_w - geom.in_w - geom.x0)])
        return slab, iq

    slab_cl, iq_cl = jax.jit(pre_cl)(frames)

    def post_cl(ch, iq):
        geom_rows = Geometry(geom.in_h, geom.in_w, ch.shape[-2],
                             geom.pad_w, geom.y0 - rows[0], geom.x0)
        y = blur_then_crop(ch, geom_rows, cfg.blur_size)
        win = hann2d_region(geom)
        m = YIQ_TO_RGB
        i_w = iq[..., 0] * win
        q_w = iq[..., 1] * win
        rgb = jnp.stack(
            [y * float(m[d, 0]) + i_w * float(m[d, 1]) + q_w * float(m[d, 2])
             for d in range(3)], axis=-1)
        return jnp.clip(rgb, 0.0, 1.0)

    chans_cl = jax.device_put(np.asarray(rec).reshape(
        t, rows[1] - rows[0], geom.pad_w))

    from pbmm_tpu.core.window import blur_taps

    taps = np.asarray(blur_taps(cfg.blur_size), np.float32)
    radius = (len(taps) - 1) // 2

    def blur_taps_xla(ch):
        geom_rows = Geometry(geom.in_h, geom.in_w, ch.shape[-2],
                             geom.pad_w, geom.y0 - rows[0], geom.x0)
        return blur_then_crop(ch, geom_rows, cfg.blur_size)

    def blur_conv(ch):
        # Separable 9-tap via the TPU conv emitter (reuse-aware), then crop.
        x = ch[:, None]  # NCHW
        kv = jnp.asarray(taps).reshape(1, 1, -1, 1)
        kh = jnp.asarray(taps).reshape(1, 1, 1, -1)
        dn = jax.lax.conv_dimension_numbers(x.shape, kv.shape,
                                            ("NCHW", "OIHW", "NCHW"))
        y = jax.lax.conv_general_dilated(x, kv, (1, 1),
                                         [(radius, radius), (0, 0)], (1, 1),
                                         (1, 1), dn)
        y = jax.lax.conv_general_dilated(y, kh, (1, 1),
                                         [(0, 0), (radius, radius)], (1, 1),
                                         (1, 1), dn)
        y0r = geom.y0 - rows[0]
        return y[:, 0, y0r:y0r + geom.in_h, geom.x0:geom.x0 + geom.in_w]

    def stack3(y):
        return jnp.stack([y, y + 1.0, y + 2.0], axis=-1)

    y_cl = jax.device_put(rng.random((t, h, w)).astype(np.float32))

    # Each entry carries its frame count EXPLICITLY (advisor r3: inferring
    # it from the name suffix mis-scaled the whole-chunk experiments).
    exps = {
        "pre_cl16": (jax.jit(pre_cl), (frames,), t),
        "post_cl16": (jax.jit(post_cl), (chans_cl, iq_cl), t),
        "blur16_taps": (jax.jit(blur_taps_xla), (chans_cl,), t),
        "blur16_conv": (jax.jit(blur_conv), (chans_cl,), t),
        "stack3": (jax.jit(stack3), (y_cl,), t),
        # batched stages (whole 16-frame chunk per call)
        "pre16": (pre, (frames,), t),
        "phase_paired17": (phase_paired, (full_re, full_im), t),
        "phase_sep16": (phase_sep, (flat_re, flat_im,
                                    full_re[:-c], full_im[:-c]), t),
        "rowifft16": (rowifft, (rre, rim), t),
        "post16": (jax.jit(post), (chans, yiqs), t),
        "concat_split": (jax.jit(concat_split), (specs,), t),
        # single-frame versions for comparison (x16 to compare)
        "pre1": (pre, (frames[:1],), 1),
        "post1": (jax.jit(post), (chans[:1], yiqs[:1]), 1),
    }

    for name, (fn, args, nframes) in exps.items():
        if which and name not in which:
            continue
        sec = timed(fn, args)
        per_frame = sec / nframes
        print(f"{name:16s} {sec*1e3:8.3f} ms total  {per_frame*1e3:7.3f} "
              f"ms/frame", flush=True)


if __name__ == "__main__":
    main()
