"""Metrics: PSNR + windowed SSIM (Wang et al. 2004 construction).

The reference has no metrics at all (SURVEY.md §5 — `Debug.Log` only);
these back the parity gates and the CLI `--stats` observability surface.
"""

import numpy as np

from pbmm_tpu.utils.metrics import psnr, ssim, ssim_global


def _rng():
    return np.random.default_rng(7)


def test_psnr_identity_is_inf_like():
    a = _rng().random((16, 16))
    assert psnr(a, a) > 99.0


def test_ssim_identity_is_one():
    a = _rng().random((32, 32)).astype(np.float32)
    assert abs(ssim(a, a) - 1.0) < 1e-9


def test_ssim_decreases_with_noise():
    rng = _rng()
    a = rng.random((48, 48))
    small = ssim(a, np.clip(a + 0.01 * rng.standard_normal(a.shape), 0, 1))
    big = ssim(a, np.clip(a + 0.2 * rng.standard_normal(a.shape), 0, 1))
    assert 1.0 > small > big > 0.0


def test_ssim_windowed_vs_naive_direct_computation():
    """Pin the implementation against a literal O(N^2 k^2) double loop of
    the Wang et al. definition (11x11 Gaussian local stats, valid mode)."""
    rng = _rng()
    a = rng.random((20, 24))
    b = np.clip(a + 0.05 * rng.standard_normal(a.shape), 0, 1)

    k, sigma = 11, 1.5
    r = np.arange(k) - (k - 1) / 2.0
    g1 = np.exp(-(r * r) / (2 * sigma * sigma))
    g1 /= g1.sum()
    w = np.outer(g1, g1)
    c1, c2 = 0.01**2, 0.03**2
    vals = []
    for y in range(a.shape[0] - k + 1):
        for x in range(a.shape[1] - k + 1):
            pa = a[y:y + k, x:x + k]
            pb = b[y:y + k, x:x + k]
            mu_a = (w * pa).sum()
            mu_b = (w * pb).sum()
            va = (w * pa * pa).sum() - mu_a**2
            vb = (w * pb * pb).sum() - mu_b**2
            cov = (w * pa * pb).sum() - mu_a * mu_b
            vals.append(
                ((2 * mu_a * mu_b + c1) * (2 * cov + c2))
                / ((mu_a**2 + mu_b**2 + c1) * (va + vb + c2))
            )
    np.testing.assert_allclose(ssim(a, b), np.mean(vals), atol=1e-12)


def test_ssim_channel_axis_moved_out_of_window():
    rng = _rng()
    a = rng.random((24, 24, 3))
    b = np.clip(a + 0.03 * rng.standard_normal(a.shape), 0, 1)
    per_channel = np.mean([ssim(a[..., c], b[..., c]) for c in range(3)])
    np.testing.assert_allclose(ssim(a, b), per_channel, atol=1e-12)


def test_ssim_small_image_falls_back_to_global():
    rng = _rng()
    a = rng.random((8, 8))
    b = np.clip(a + 0.05 * rng.standard_normal(a.shape), 0, 1)
    assert ssim(a, b) == ssim_global(a, b)


def test_ssim_global_identity():
    a = _rng().random((8, 8))
    assert abs(ssim_global(a, a) - 1.0) < 1e-9
