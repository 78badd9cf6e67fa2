"""Unit tests for core color / window / pad / crop / blur ops against
independent numpy formulations (SURVEY.md §4a)."""

import numpy as np
import jax.numpy as jnp
import pytest

from pbmm_tpu.core.color import rgb_to_yiq, yiq_to_rgb, RGB_TO_YIQ, YIQ_TO_RGB
from pbmm_tpu.core.window import (
    blur_taps,
    blur_then_crop,
    crop_center,
    gaussian_blur5,
    geometry_for,
    hann2d,
    pad_center,
)
from pbmm_tpu.core.complexop import wrap_phase


class TestColor:
    def test_rgb_to_yiq_matches_matrix(self, rng):
        rgb = rng.random((5, 7, 3)).astype(np.float32)
        got = np.asarray(rgb_to_yiq(jnp.asarray(rgb)))
        want = rgb @ RGB_TO_YIQ.T
        np.testing.assert_allclose(got, want, atol=1e-6)

    def test_yiq_to_rgb_saturates(self, rng):
        yiq = (rng.random((4, 4, 3)) * 4 - 2).astype(np.float32)
        got = np.asarray(yiq_to_rgb(jnp.asarray(yiq)))
        want = np.clip(yiq @ YIQ_TO_RGB.T, 0, 1)
        np.testing.assert_allclose(got, want, atol=1e-6)
        assert got.min() >= 0 and got.max() <= 1

    def test_roundtrip_close(self, rng):
        # The reference's two matrices are not exact inverses; roundtrip
        # should still be close to identity for in-gamut colors.
        rgb = rng.random((8, 8, 3)).astype(np.float32) * 0.8 + 0.1
        back = np.asarray(yiq_to_rgb(rgb_to_yiq(jnp.asarray(rgb))))
        assert np.abs(back - rgb).max() < 0.01


class TestGeometry:
    def test_square_pow2(self):
        g = geometry_for(1080, 1920, "square_pow2")
        assert (g.pad_h, g.pad_w) == (2048, 2048)  # the reference's 1080p case
        assert (g.y0, g.x0) == (484, 64)

    def test_rect_pow2(self):
        g = geometry_for(1080, 1920, "rect_pow2")
        assert (g.pad_h, g.pad_w) == (1024 * 2, 2048)

    def test_pad_crop_roundtrip(self, rng):
        # Channels-first internally: spatial dims are the last two.
        img = rng.random((3, 30, 50)).astype(np.float32)
        g = geometry_for(30, 50)
        padded = pad_center(jnp.asarray(img), g)
        assert padded.shape == (3, 64, 64)
        # border is black
        assert float(jnp.abs(padded[:, 0]).max()) == 0.0
        back = np.asarray(crop_center(padded, g))
        np.testing.assert_array_equal(back, img)


class TestWindow:
    def test_hann_pixel_center_formula(self):
        w = np.asarray(hann2d(8, 16))
        iy = (np.arange(8) + 0.5) / 8
        ix = (np.arange(16) + 0.5) / 16
        want = (
            0.5 * (1 - np.cos(2 * np.pi * iy))[:, None]
            * (0.5 * (1 - np.cos(2 * np.pi * ix)))[None, :]
        )
        np.testing.assert_allclose(w, want, atol=1e-6)

    def test_window_is_separable_product_max_lt_1(self):
        w = np.asarray(hann2d(64, 64))
        assert 0.99 < w.max() <= 1.0
        assert w[0, 0] < 1e-3


class TestBlur:
    def test_blur_then_crop_equals_full_blur(self, rng):
        # Interior crop (full halo) and edge-touching crop (clipped halo)
        # are both bit-identical to blur-at-padded-res + crop.
        for in_h, in_w in [(30, 50), (64, 64), (61, 33)]:
            g = geometry_for(in_h, in_w)
            img = jnp.asarray(rng.random((2, g.pad_h, g.pad_w)), jnp.float32)
            ref = np.asarray(crop_center(gaussian_blur5(img, 0.5), g))
            fast = np.asarray(blur_then_crop(img, g, 0.5))
            np.testing.assert_array_equal(ref, fast)


    def test_taps_sum_to_one(self):
        taps = np.array(blur_taps(0.5))
        assert len(taps) == 5
        np.testing.assert_allclose(taps.sum(), 1.0, atol=1e-9)
        # symmetric
        np.testing.assert_allclose(taps, taps[::-1])

    def test_blur_constant_invariant(self):
        img = jnp.full((16, 16), 3.5)
        out = np.asarray(gaussian_blur5(img))
        np.testing.assert_allclose(out, 3.5, atol=1e-5)

    def test_blur_matches_bilinear_sampling_semantics(self, rng):
        # Explicitly simulate the shader: samples at fractional offsets with
        # bilinear interpolation and clamp addressing, H then V.
        img = rng.random((12, 12)).astype(np.float64)
        C, S1, S2 = 0.2270270270, 0.3162162162, 0.0702702703
        o1, o2 = 1.3846153846 * 0.5, 3.2307692308 * 0.5

        def sample(a, axis, off):
            n = a.shape[axis]
            idx = np.arange(n) + off
            lo_raw = np.floor(idx).astype(int)
            lo = np.clip(lo_raw, 0, n - 1)
            hi = np.clip(lo_raw + 1, 0, n - 1)
            fr = idx - lo_raw
            a_m = np.moveaxis(a, axis, 0)
            out = a_m[lo] * (1 - fr)[:, None] + a_m[hi] * fr[:, None]
            return np.moveaxis(out, 0, axis)

        def blur_axis(a, axis):
            return (
                C * a
                + S1 * (sample(a, axis, o1) + sample(a, axis, -o1))
                + S2 * (sample(a, axis, o2) + sample(a, axis, -o2))
            )

        want = blur_axis(blur_axis(img, 1), 0)
        got = np.asarray(gaussian_blur5(jnp.asarray(img)))
        np.testing.assert_allclose(got, want, atol=1e-5)


class TestWrap:
    @pytest.mark.parametrize(
        "x,want",
        [
            (0.0, 0.0),
            (np.pi, np.pi),
            (-np.pi, -np.pi),
            (1.5 * np.pi, -0.5 * np.pi),
            (-1.5 * np.pi, 0.5 * np.pi),
            (1.9 * np.pi, -0.1 * np.pi),
        ],
    )
    def test_wrap_values(self, x, want):
        got = float(wrap_phase(jnp.float32(x)))
        np.testing.assert_allclose(got, want, atol=1e-6)

    def test_wrap_equals_hlsl_loop(self, rng):
        x = (rng.random(1000) * 4 - 2) * np.pi  # (-2pi, 2pi)

        def hlsl(p):
            while p > np.pi:
                p -= 2 * np.pi
            while p < -np.pi:
                p += 2 * np.pi
            return p

        want = np.array([hlsl(v) for v in x])
        # The closed form in float64 equals the loop exactly.
        got64 = x - 2 * np.pi * np.round(x / (2 * np.pi))
        np.testing.assert_allclose(got64, want, atol=1e-12)
        # The jnp (fp32) implementation matches to fp32 tolerance away from
        # the ±pi knife edge, where fp32 rounding may legitimately pick the
        # other (equivalent mod 2pi) representative.
        interior = np.abs(np.abs(x) - np.pi) > 1e-4
        got32 = np.asarray(wrap_phase(jnp.asarray(x, jnp.float32)))
        np.testing.assert_allclose(got32[interior], want[interior], atol=1e-5)
