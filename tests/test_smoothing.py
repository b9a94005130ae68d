"""Gaussian smoothing parity vs a brute-force port of the reference's kernel
formula (reference utils/gaussian_smoothing.py:28-49 — note its
exp(-((x-m)/(2*sigma))**2) form) and reflect-pad conv (pipeline:251-254)."""
import numpy as np

from guided_attention_tpu.guidance.smoothing import gaussian_kernel, smooth_maps


def reference_kernel(kernel_size=3, sigma=0.5):
    grid = np.arange(kernel_size, dtype=np.float64)
    mean = (kernel_size - 1) / 2
    k1 = 1 / (sigma * np.sqrt(2 * np.pi)) * np.exp(-(((grid - mean) / (2 * sigma)) ** 2))
    k = np.outer(k1, k1)
    return k / k.sum()


def brute_force_smooth(img, k):
    pad = (k.shape[0] - 1) // 2
    p = np.pad(img, pad, mode="reflect")
    out = np.zeros_like(img)
    for i in range(img.shape[0]):
        for j in range(img.shape[1]):
            out[i, j] = (p[i : i + k.shape[0], j : j + k.shape[1]] * k).sum()
    return out


def test_kernel_matches_reference_formula():
    np.testing.assert_allclose(gaussian_kernel(3, 0.5), reference_kernel(3, 0.5), rtol=1e-6)
    np.testing.assert_allclose(gaussian_kernel(5, 1.5), reference_kernel(5, 1.5), rtol=1e-6)


def test_kernel_normalized():
    assert abs(gaussian_kernel(3, 0.5).sum() - 1.0) < 1e-6


def test_smooth_maps_matches_brute_force():
    rng = np.random.default_rng(0)
    imgs = rng.random((4, 16, 16)).astype(np.float32)
    k = reference_kernel(3, 0.5)
    got = np.asarray(smooth_maps(imgs, 3, 0.5))
    for c in range(4):
        want = brute_force_smooth(imgs[c], k)
        np.testing.assert_allclose(got[c], want, rtol=1e-4, atol=1e-6)


def test_smooth_preserves_shape_and_batch_axes():
    x = np.ones((2, 3, 16, 16), np.float32)
    y = np.asarray(smooth_maps(x))
    assert y.shape == x.shape
    np.testing.assert_allclose(y, x, rtol=1e-5)  # blur of constant is constant


def test_average_smoothing_matches_torch():
    """Box filter parity with the reference's (unused) AverageSmoothing
    module (reference utils/gaussian_smoothing.py:74-119, VALID padding)."""
    import pytest

    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    from guided_attention_tpu.guidance.smoothing import average_smooth_maps

    rng = np.random.default_rng(3)
    imgs = rng.random((2, 16, 16)).astype(np.float32)
    got = np.asarray(average_smooth_maps(imgs, 3))
    assert got.shape == (2, 14, 14)
    w = torch.ones(1, 1, 3, 3) / 9.0
    want = F.conv2d(torch.from_numpy(imgs)[:, None], w, groups=1)[:, 0].numpy()
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_dynamic_thresholding_matches_reference_loops():
    """Port parity for the reference's (unused) dynamic_thresholding
    (reference utils/helpers.py:352-371)."""
    from guided_attention_tpu.runtime.artifacts import dynamic_thresholding

    rng = np.random.default_rng(4)
    lat = (rng.standard_normal((1, 8, 8, 4)) * 3.0).astype(np.float32)

    # whole-tensor variant
    got = dynamic_thresholding(lat)
    p = np.quantile(np.abs(lat), 0.99)
    want = lat * (2.5 / p) if p > 2.5 else lat
    np.testing.assert_allclose(got, want, rtol=1e-6)

    # per-channel + center_means variant (reference loops channels of NCHW;
    # ours is NHWC)
    got = dynamic_thresholding(lat, per_channel=True, center_means=True)
    want = lat.copy()
    for c in range(4):
        pc = np.quantile(np.abs(want[..., c]), 0.99)
        if pc > 2.5:
            want[..., c] *= 2.5 / pc
    for c in range(4):
        want[..., c] -= want[..., c].mean()
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)

    # below the clamp: identity
    small = (lat * 0.1).astype(np.float32)
    np.testing.assert_allclose(dynamic_thresholding(small), small)
