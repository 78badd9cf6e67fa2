"""Phase-amplification cores: the fused formulation must equal the literal
per-band loop, and both must match the numpy oracle."""

import numpy as np
import jax.numpy as jnp

from pbmm_tpu.config import MagnifyConfig, TemporalConfig
from pbmm_tpu.oracle.reference import _amplify as oracle_amplify
from pbmm_tpu.phase.amplify import (
    pyramid_phase_amplify,
    pyramid_phase_amplify_naive,
)
from pbmm_tpu.phase.standard import bandpass_weight_map, standard_phase_amplify
from pbmm_tpu.phase.temporal import temporal_apply, temporal_init
from pbmm_tpu.pyramid.filters import amplified_level_flags, radial_filter_bank


def _random_spectrum_pair(rng, n=64):
    # Spectra of two slightly-shifted random images — realistic phase deltas.
    img = rng.random((n, n))
    img2 = np.roll(img, 1, axis=1) * 0.98 + 0.02 * rng.random((n, n))
    s1 = np.fft.fftshift(np.fft.fft2(img)).astype(np.complex64)
    s2 = np.fft.fftshift(np.fft.fft2(img2)).astype(np.complex64)
    return jnp.asarray(s2), jnp.asarray(s1)  # (cur, prev)


class TestPyramidFusion:
    def test_fused_equals_naive(self, rng):
        cfg = MagnifyConfig()
        cur, prev = _random_spectrum_pair(rng)
        masks = radial_filter_bank(64, 64, cfg.pyramid_levels,
                                   cfg.min_frequency, cfg.max_frequency)
        flags = amplified_level_flags(cfg)
        fused = np.asarray(pyramid_phase_amplify(
            cur, prev, masks, flags, cfg.phase_scale, cfg.magnitude_threshold))
        naive = np.asarray(pyramid_phase_amplify_naive(
            cur, prev, masks, flags, cfg.phase_scale, cfg.magnitude_threshold))
        scale = np.abs(naive).max()
        assert np.abs(fused - naive).max() / scale < 1e-5

    def test_fused_matches_oracle(self, rng):
        cfg = MagnifyConfig(phase_scale=7.5)
        cur, prev = _random_spectrum_pair(rng)
        masks = radial_filter_bank(64, 64, cfg.pyramid_levels,
                                   cfg.min_frequency, cfg.max_frequency)
        flags = amplified_level_flags(cfg)
        got = np.asarray(pyramid_phase_amplify(
            cur, prev, masks, flags, cfg.phase_scale, cfg.magnitude_threshold))
        want = oracle_amplify(np.asarray(cur, np.complex128),
                              np.asarray(prev, np.complex128), cfg, 64, 64)
        scale = np.abs(want).max()
        assert np.abs(got - want).max() / scale < 1e-4

    def test_zero_phase_scale_passthrough_of_band_sum(self, rng):
        # scale=0 -> rotation = identity -> output = cur * sum(masks)
        cfg = MagnifyConfig(phase_scale=0.0)
        cur, prev = _random_spectrum_pair(rng)
        masks = radial_filter_bank(64, 64, 5, 0.05, 0.45)
        flags = amplified_level_flags(cfg)
        got = np.asarray(pyramid_phase_amplify(cur, prev, masks, flags, 0.0,
                                               cfg.magnitude_threshold))
        want = np.asarray(cur) * np.asarray(masks).sum(0)
        assert np.abs(got - want).max() / np.abs(want).max() < 1e-5

    def test_batched_channels(self, rng):
        cfg = MagnifyConfig()
        cur, prev = _random_spectrum_pair(rng)
        cur3 = jnp.stack([cur, cur * 0.5, cur * 2.0])
        prev3 = jnp.stack([prev, prev * 0.5, prev * 2.0])
        masks = radial_filter_bank(64, 64, 5, 0.05, 0.45)
        flags = amplified_level_flags(cfg)
        out3 = np.asarray(pyramid_phase_amplify(
            cur3, prev3, masks, flags, cfg.phase_scale, cfg.magnitude_threshold))
        out0 = np.asarray(pyramid_phase_amplify(
            cur, prev, masks, flags, cfg.phase_scale, cfg.magnitude_threshold))
        np.testing.assert_allclose(out3[0], out0, rtol=1e-5, atol=1e-3)


class TestStandard:
    def test_matches_oracle(self, rng):
        cfg = MagnifyConfig(mode="standard", phase_scale=5.0)
        cur, prev = _random_spectrum_pair(rng)
        weight = bandpass_weight_map(64, 64, cfg)
        got = np.asarray(standard_phase_amplify(
            cur, prev, weight, cfg.phase_scale, cfg.magnitude_threshold))
        want = oracle_amplify(np.asarray(cur, np.complex128),
                              np.asarray(prev, np.complex128), cfg, 64, 64)
        assert np.abs(got - want).max() / np.abs(want).max() < 1e-4

    def test_gate_passthrough(self):
        # Tiny magnitudes everywhere -> output == cur exactly.
        cur = jnp.full((8, 8), 1e-4 + 1e-4j, jnp.complex64)
        prev = jnp.full((8, 8), 1e-4 - 1e-4j, jnp.complex64)
        w = jnp.ones((8, 8), jnp.float32)
        out = np.asarray(standard_phase_amplify(cur, prev, w, 10.0, 0.01))
        np.testing.assert_array_equal(out, np.asarray(cur))

    def test_magnitude_scale_quirk(self, rng):
        # Reference computes but never applies magnitude_scale
        # (`PhaseDifferenceComputeShader.compute:169-178`).
        cur, prev = _random_spectrum_pair(rng, 16)
        w = jnp.ones((16, 16), jnp.float32)
        base = np.asarray(standard_phase_amplify(cur, prev, w, 2.0, 0.01,
                                                 magnitude_scale=3.0,
                                                 apply_magnitude_scale=False))
        scaled = np.asarray(standard_phase_amplify(cur, prev, w, 2.0, 0.01,
                                                   magnitude_scale=3.0,
                                                   apply_magnitude_scale=True))
        gate = (np.abs(np.asarray(cur)) < 0.01) | (np.abs(np.asarray(prev)) < 0.01)
        np.testing.assert_allclose(scaled[~gate], 3.0 * base[~gate], rtol=1e-5)


class TestTemporal:
    def test_two_frame_identity(self):
        tc = TemporalConfig()
        st = temporal_init((4, 4), tc)
        d = jnp.ones((4, 4))
        out, st2 = temporal_apply(d, st, tc)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(d))

    def test_iir_bandpass_rejects_dc_passes_band(self):
        tc = TemporalConfig(mode="iir_bandpass", low_hz=0.5, high_hz=4.0, fps=30.0)
        st = temporal_init((1, 1), tc)
        # Constant (DC) input decays toward zero output.
        out = None
        for _ in range(300):
            out, st = temporal_apply(jnp.ones((1, 1)), st, tc)
        assert abs(float(out[0, 0])) < 0.02
        # An in-band 2 Hz sinusoid keeps significant amplitude.
        st = temporal_init((1, 1), tc)
        peak = 0.0
        for t in range(300):
            x = np.sin(2 * np.pi * 2.0 * t / 30.0)
            out, st = temporal_apply(jnp.full((1, 1), x), st, tc)
            if t > 60:
                peak = max(peak, abs(float(out[0, 0])))
        assert peak > 0.5


class TestProcedural:
    def test_procedural_equals_precomputed(self, rng):
        from pbmm_tpu.phase.amplify import pyramid_phase_amplify_procedural

        cfg = MagnifyConfig()
        cur, prev = _random_spectrum_pair(rng)
        masks = radial_filter_bank(64, 64, cfg.pyramid_levels,
                                   cfg.min_frequency, cfg.max_frequency)
        flags = amplified_level_flags(cfg)
        want = np.asarray(pyramid_phase_amplify(
            cur, prev, masks, flags, cfg.phase_scale, cfg.magnitude_threshold))
        got = np.asarray(pyramid_phase_amplify_procedural(cur, prev, cfg))
        assert np.abs(got - want).max() / np.abs(want).max() < 1e-5

    def test_procedural_steerable_equals_precomputed(self, rng):
        from pbmm_tpu.phase.amplify import pyramid_phase_amplify_procedural
        from pbmm_tpu.pyramid.filters import steerable_filter_bank

        cfg = MagnifyConfig(orientations=4)
        cur, prev = _random_spectrum_pair(rng)
        masks = steerable_filter_bank(64, 64, cfg.pyramid_levels,
                                      cfg.min_frequency, cfg.max_frequency, 4)
        flags = amplified_level_flags(cfg)
        want = np.asarray(pyramid_phase_amplify(
            cur, prev, masks, flags, cfg.phase_scale, cfg.magnitude_threshold))
        got = np.asarray(pyramid_phase_amplify_procedural(cur, prev, cfg))
        assert np.abs(got - want).max() / np.abs(want).max() < 1e-4

    def test_procedural_weight_map_equals_np(self):
        from pbmm_tpu.phase.standard import (
            bandpass_weight_map,
            bandpass_weight_map_jnp,
        )

        cfg = MagnifyConfig(mode="standard")
        a = np.asarray(bandpass_weight_map(64, 64, cfg))
        b = np.asarray(bandpass_weight_map_jnp(64, 64, cfg))
        np.testing.assert_allclose(a, b, atol=1e-5)


class TestRotationTerm:
    def test_integer_power_equals_trig(self, rng):
        from pbmm_tpu.phase.amplify import phase_delta, rotation_term

        cur, prev = _random_spectrum_pair(rng)
        # integer path
        fast = np.asarray(rotation_term(cur, prev, 10.0))
        # explicit trig path
        delta = phase_delta(cur, prev)
        slow = np.asarray(jnp.exp(1j * (10.0 * delta).astype(jnp.complex64)))
        assert np.abs(fast - slow).max() < 1e-4

    def test_non_integer_uses_trig(self, rng):
        from pbmm_tpu.phase.amplify import phase_delta, rotation_term

        cur, prev = _random_spectrum_pair(rng)
        got = np.asarray(rotation_term(cur, prev, 2.5))
        delta = np.asarray(phase_delta(cur, prev))
        want = np.exp(1j * 2.5 * delta)
        assert np.abs(got - want).max() < 1e-5

    def test_zero_modulus_bins_no_nan(self):
        from pbmm_tpu.phase.amplify import rotation_term

        z = jnp.zeros((4, 4), jnp.complex64)
        out = np.asarray(rotation_term(z, z, 10.0))
        assert np.isfinite(out).all()

    def test_scale_one_is_unit_rotation(self, rng):
        from pbmm_tpu.phase.amplify import rotation_term

        cur, prev = _random_spectrum_pair(rng)
        rot = np.asarray(rotation_term(cur, prev, 1.0))
        np.testing.assert_allclose(np.abs(rot), 1.0, atol=1e-5)
