"""Filter-bank construction vs the oracle transcription of
`PyramidOperations.compute:25-87` and structural properties."""

import numpy as np

from pbmm_tpu.config import MagnifyConfig
from pbmm_tpu.oracle.reference import pyramid_masks, standard_weight
from pbmm_tpu.phase.standard import bandpass_weight_map
from pbmm_tpu.pyramid.filters import (
    amplified_level_flags,
    filter_bank,
    radial_filter_bank,
    steerable_filter_bank,
)


def test_radial_bank_matches_oracle():
    got = np.asarray(radial_filter_bank(64, 64, 5, 0.05, 0.45))
    want = pyramid_masks(64, 64, 5, 0.05, 0.45)
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_bank_value_ranges():
    m = np.asarray(radial_filter_bank(128, 128, 5, 0.05, 0.45))
    assert m.min() >= 0.0 and m.max() <= 1.0
    # DC bin (center) belongs to the low-pass level only.
    assert m[-1, 64, 64] == 1.0
    assert m[0, 64, 64] == 0.0
    # Far corner (freq ~0.707) belongs to the high-pass.
    assert m[0, 0, 0] == 1.0


def test_geometric_band_centers():
    # Mid-band peaks should sit at geometrically spaced radii
    # (`PyramidOperations.compute:68-84`): center_i = minF*(maxF/minF)^(1-r).
    n, L, lo, hi = 256, 5, 0.05, 0.45
    m = np.asarray(radial_filter_bank(n, n, L, lo, hi))
    fy = np.arange(n)[:, None] / n - 0.5
    fx = np.arange(n)[None, :] / n - 0.5
    freq = np.hypot(fx, fy)
    for i in range(1, L - 1):
        r = (i - 1) / (L - 3)
        c = lo * (hi / lo) ** (1 - r)
        peak_region = np.abs(freq - c) < 0.01
        assert m[i][peak_region].max() > 0.9


def test_levels3_midband_zero_quirk():
    # L=3 -> (levels-3)=0 denominator -> NaN in HLSL -> all-zero mid band.
    m = np.asarray(radial_filter_bank(32, 32, 3, 0.05, 0.45))
    assert np.all(m[1] == 0.0)


def test_levels1_single_highpass():
    m = np.asarray(radial_filter_bank(32, 32, 1, 0.05, 0.45))
    assert m.shape[0] == 1
    assert m[0, 0, 0] == 1.0  # corner = high frequencies


def test_steerable_sectors_sum_to_radial():
    L, K = 5, 4
    rad = np.asarray(radial_filter_bank(64, 64, L, 0.05, 0.45))
    steer = np.asarray(steerable_filter_bank(64, 64, L, 0.05, 0.45, K))
    assert steer.shape[0] == 2 + (L - 2) * K
    # high/low pass unchanged
    np.testing.assert_allclose(steer[0], rad[0], atol=1e-6)
    np.testing.assert_allclose(steer[-1], rad[-1], atol=1e-6)
    # each mid band's K sectors sum back to the radial band
    for i in range(1, L - 1):
        s = steer[1 + (i - 1) * K : 1 + i * K].sum(axis=0)
        np.testing.assert_allclose(s, rad[i], atol=1e-5)


def test_amplified_flags():
    cfg = MagnifyConfig(pyramid_levels=5)
    flags = amplified_level_flags(cfg)
    assert list(flags) == [False, True, True, True, False]
    cfg_s = cfg.replace(orientations=4)
    flags_s = amplified_level_flags(cfg_s)
    assert flags_s.shape[0] == 2 + 3 * 4
    assert not flags_s[0] and not flags_s[-1] and flags_s[1:-1].all()
    assert filter_bank(32, 32, cfg_s).shape[0] == flags_s.shape[0]


def test_standard_weight_map_matches_oracle():
    cfg = MagnifyConfig(mode="standard")
    got = np.asarray(bandpass_weight_map(64, 64, cfg))
    want = standard_weight(64, 64, cfg)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_standard_weight_edges_disabled():
    cfg = MagnifyConfig(mode="standard", enhance_edges=False)
    w = np.asarray(bandpass_weight_map(64, 64, cfg))
    # With edges off, the in-band weight is exactly motion_sensitivity.
    assert np.isclose(w.max(), cfg.motion_sensitivity, atol=1e-5)


def test_standard_weight_no_bandpass():
    cfg = MagnifyConfig(mode="standard", apply_bandpass=False)
    w = np.asarray(bandpass_weight_map(32, 32, cfg))
    np.testing.assert_allclose(w, 1.0)
