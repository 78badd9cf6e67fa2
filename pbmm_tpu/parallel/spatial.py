"""Spatially-sharded magnification: one frame's ROWS sharded across chips.

The tensor-parallel analog for frames too large (or too latency-critical)
for one chip: the 2D FFT becomes

    local row-FFT  ->  all-to-all (transpose the shard axis: rows -> cols)
    ->  local col-FFT

so each chip always transforms full contiguous lines; the only
communication is one all-to-all per transform over ICI (the classic
distributed-FFT decomposition — SURVEY.md §7.3 called this out as the
TPU-shaped analog of ButterflyByRow/Col).  The phase pass is elementwise
on natural-layout spectrum shards (masks evaluated procedurally at each
shard's global frequencies); the inverse mirrors the forward; the 5-tap
blur needs a 2-row halo exchange with ppermute at shard boundaries.

Implemented with `shard_map` over a 1D ("rows",) mesh; tested against the
unsharded pipeline on the virtual CPU mesh.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from pbmm_tpu.config import MagnifyConfig
from pbmm_tpu.core.color import rgb_to_yiq, yiq_to_rgb
from pbmm_tpu.core.window import blur_taps, geometry_for

AXIS = "rows"


def _axis_size():
    return jax.lax.axis_size(AXIS)


def _axis_index():
    return jax.lax.axis_index(AXIS)


def _fft2_local(y_local: jnp.ndarray):
    """(Hl, W) real rows-shard -> (H, Wc) natural-layout cols-shard."""
    p = _axis_size()
    s = jnp.fft.fft(y_local.astype(jnp.complex64), axis=-1)  # full rows
    hl, w = s.shape
    s = s.reshape(hl, p, w // p)
    s = jax.lax.all_to_all(s, AXIS, split_axis=1, concat_axis=0,
                           tiled=False)
    s = s.reshape(hl * p, w // p)  # (H, Wc)
    return jnp.fft.fft(s, axis=0)  # full columns


def _ifft2_local(spec: jnp.ndarray):
    """(H, Wc) cols-shard spectrum -> (Hl, W) rows-shard complex result."""
    p = _axis_size()
    s = jnp.fft.ifft(spec, axis=0)
    h, wc = s.shape
    s = s.reshape(p, h // p, wc)
    s = jax.lax.all_to_all(s, AXIS, split_axis=0, concat_axis=1,
                           tiled=False)
    s = s.reshape(h // p, wc * p)
    return jnp.fft.ifft(s, axis=-1)


def _freqs_local(pad_h: int, pad_w: int):
    """Global natural-layout frequency axes for this shard's block:
    fy full (H, 1); fx for the local column slice (1, Wc)."""
    p = _axis_size()
    wc = pad_w // p
    ky = jnp.arange(pad_h, dtype=jnp.float32) / pad_h
    fy = jnp.where(ky < 0.5, ky, ky - 1.0)[:, None]
    kx_local = (_axis_index() * wc + jnp.arange(wc)).astype(jnp.float32) / pad_w
    fx = jnp.where(kx_local < 0.5, kx_local, kx_local - 1.0)[None, :]
    return fy, fx


def _amplify_local(cur, prev, cfg: MagnifyConfig, pad_h: int, pad_w: int):
    """Fused pyramid amplification on a cols-shard with global freqs."""
    from pbmm_tpu.phase.amplify import rotation_term
    from pbmm_tpu.pyramid.filters import radial_profile_jnp

    fy, fx = _freqs_local(pad_h, pad_w)
    freq = jnp.sqrt(fy * fy + fx * fx)
    cur_mag = jnp.abs(cur)
    prev_mag = jnp.abs(prev)
    tau = cfg.magnitude_threshold
    levels = cfg.pyramid_levels
    total = jnp.zeros_like(freq)
    amped = jnp.zeros_like(cur_mag)
    for i in range(levels):
        m = radial_profile_jnp(freq, i, levels, cfg.min_frequency,
                               cfg.max_frequency)
        total = total + m
        if 0 < i < levels - 1:
            gate = (cur_mag * m >= tau) & (prev_mag * m >= tau)
            amped = amped + jnp.where(gate, m, 0.0)
    rot = rotation_term(cur, prev, cfg.phase_scale)
    return cur * ((total - amped) + amped * rot)


def _blur_rowsharded(y: jnp.ndarray, blur_size: float):
    """Separable 5-tap blur on a rows-shard with a 2-row halo exchange.

    Horizontal pass is local (full rows).  Vertical pass gathers 2 rows
    from each neighbor via ppermute; global edges replicate (texture clamp).
    """
    taps = blur_taps(blur_size)
    radius = (len(taps) - 1) // 2
    hl, w = y.shape
    p = _axis_size()
    idx = _axis_index()

    # Horizontal (local, edge clamp).
    yh = jnp.pad(y, ((0, 0), (radius, radius)), mode="edge")
    out = sum(taps[k] * yh[:, k : k + w] for k in range(len(taps)))

    # Vertical halo: bottom rows travel to the next shard, top rows to the
    # previous one (ring ppermute; wrap values are masked off below).
    down = [(i, (i + 1) % p) for i in range(p)]
    up = [(i, (i - 1) % p) for i in range(p)]
    from_above = jax.lax.ppermute(out[-radius:, :], AXIS, down)
    from_below = jax.lax.ppermute(out[:radius, :], AXIS, up)
    # Global edge clamp: first shard's top halo and last shard's bottom
    # halo replicate their own edge rows instead of the wrapped values.
    top_edge = jnp.broadcast_to(out[0:1, :], (radius, w))
    bot_edge = jnp.broadcast_to(out[-1:, :], (radius, w))
    above = jnp.where(idx == 0, top_edge, from_above)
    below = jnp.where(idx == p - 1, bot_edge, from_below)

    stacked = jnp.concatenate([above, out, below], axis=0)
    return sum(taps[k] * stacked[k : k + hl, :] for k in range(len(taps)))


def _pair_kernel(prev_rgb, cur_rgb, cfg: MagnifyConfig, geom):
    """shard_map body: (Hl, W, 3) rows-shards -> magnified rows-shard."""
    pad_h, pad_w = geom.pad_h, geom.pad_w
    p = _axis_size()
    idx = _axis_index()
    hl = pad_h // p

    # Frames arrive already padded to (Hp, Wp) and rows-sharded; window
    # rows use this shard's global row offset.
    prev_yiq = rgb_to_yiq(prev_rgb)
    cur_yiq = rgb_to_yiq(cur_rgb)
    gy = (idx * hl + jnp.arange(hl)).astype(jnp.float32)
    wy = 0.5 * (1.0 - jnp.cos(2.0 * jnp.pi * (gy + 0.5) / pad_h))[:, None]
    ix = (jnp.arange(pad_w, dtype=jnp.float32) + 0.5) / pad_w
    wx = (0.5 * (1.0 - jnp.cos(2.0 * jnp.pi * ix)))[None, :]
    win = wy * wx

    cur_y = cur_yiq[..., 0] * win
    prev_y = prev_yiq[..., 0] * win
    cur_spec = _fft2_local(cur_y)
    prev_spec = _fft2_local(prev_y)
    mod = _amplify_local(cur_spec, prev_spec, cfg, pad_h, pad_w)
    rec = _ifft2_local(mod)
    y_out = jnp.abs(rec) if cfg.reconstruct == "magnitude" else jnp.real(rec)
    y_out = _blur_rowsharded(y_out, cfg.blur_size)

    out_yiq = jnp.stack(
        [y_out, cur_yiq[..., 1] * win, cur_yiq[..., 2] * win], axis=-1
    )
    return yiq_to_rgb(out_yiq, saturate=True)


@functools.lru_cache(maxsize=8)
def _spatial_fn(cfg: MagnifyConfig, mesh: Mesh, in_h: int, in_w: int):
    geom = geometry_for(in_h, in_w, cfg.pad_mode)
    if geom.pad_h % mesh.devices.size or geom.pad_w % mesh.devices.size:
        raise ValueError("padded dims must divide the rows-mesh size")

    spec_sharded = P(AXIS, None, None)

    def fn(prev_padded, cur_padded):
        body = shard_map(
            lambda a, b: _pair_kernel(a, b, cfg, geom),
            mesh=mesh,
            in_specs=(spec_sharded, spec_sharded),
            out_specs=spec_sharded,
        )
        return body(prev_padded, cur_padded)

    return jax.jit(fn), geom


def magnify_frame_pair_spatial(
    prev_rgb, cur_rgb, cfg: MagnifyConfig, mesh: Mesh
):
    """Two-frame magnification of ONE frame pair with rows sharded over a
    1D ("rows",) mesh.  (H, W, 3) f32 in/out.

    Restrictions: pyramid mode, two-frame temporal, y_only chroma,
    XLA FFT backend semantics (natural layout).
    """
    if cfg.mode != "pyramid" or cfg.temporal.mode != "two_frame":
        raise ValueError("spatial path supports pyramid two-frame mode")
    if cfg.chroma != "y_only":
        raise ValueError("spatial path supports chroma='y_only'")
    import numpy as np

    h, w = cur_rgb.shape[:2]
    fn, geom = _spatial_fn(cfg, mesh, h, w)

    def pad(f):
        out = np.zeros((geom.pad_h, geom.pad_w, 3), np.float32)
        out[geom.y0 : geom.y0 + h, geom.x0 : geom.x0 + w] = f
        return out

    sh = NamedSharding(mesh, P(AXIS, None, None))
    prev_p = jax.device_put(pad(np.asarray(prev_rgb, np.float32)), sh)
    cur_p = jax.device_put(pad(np.asarray(cur_rgb, np.float32)), sh)
    out = fn(prev_p, cur_p)
    return out[geom.y0 : geom.y0 + h, geom.x0 : geom.x0 + w]
