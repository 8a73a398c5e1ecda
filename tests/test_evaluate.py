"""PSNR/SSIM evaluator fidelity.

scikit-image is not in this container, so the gaussian-window SSIM
(tools/evaluate.py) is pinned against an independent direct-convolution
oracle that re-derives scipy.ndimage.gaussian_filter from first principles
(discrete gaussian kernel, symmetric ('reflect') padding), plus the
analytic properties any faithful SSIM must satisfy.
"""

import importlib.util
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

_spec = importlib.util.spec_from_file_location(
    "evaluate", os.path.join(os.path.dirname(__file__), "..", "tools", "evaluate.py")
)
evaluate = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(evaluate)


def _gauss_kernel(sigma=1.5, truncate=3.5):
    r = int(truncate * sigma + 0.5)
    x = np.arange(-r, r + 1, dtype=np.float64)
    k = np.exp(-0.5 * (x / sigma) ** 2)
    return k / k.sum(), r


def _gauss_filter_oracle(img, sigma=1.5, truncate=3.5):
    """Separable direct convolution with symmetric padding — independent of
    scipy internals."""
    k, r = _gauss_kernel(sigma, truncate)
    out = img.astype(np.float64)
    for axis in (0, 1):
        out = np.moveaxis(out, axis, 0)
        padded = np.pad(out, [(r, r)] + [(0, 0)] * (out.ndim - 1), mode="symmetric")
        res = np.zeros_like(out)
        for i, w in enumerate(k):
            res += w * padded[i : i + out.shape[0]]
        out = np.moveaxis(res, 0, axis)
    return out


def _ssim_oracle(x, y, data_range=1.0, sigma=1.5, use_sample_covariance=True):
    x = x.astype(np.float64)
    y = y.astype(np.float64)
    k, r = _gauss_kernel(sigma)
    win = 2 * r + 1
    NP = win * win
    cov_norm = NP / (NP - 1.0) if use_sample_covariance else 1.0
    f = _gauss_filter_oracle
    ux, uy = f(x, sigma), f(y, sigma)
    vx = cov_norm * (f(x * x, sigma) - ux**2)
    vy = cov_norm * (f(y * y, sigma) - uy**2)
    vxy = cov_norm * (f(x * y, sigma) - ux * uy)
    c1, c2 = (0.01 * data_range) ** 2, (0.03 * data_range) ** 2
    s = ((2 * ux * uy + c1) * (2 * vxy + c2)) / ((ux**2 + uy**2 + c1) * (vx + vy + c2))
    return float(s[r:-r, r:-r].mean())


def test_ssim_matches_independent_oracle():
    rng = np.random.default_rng(0)
    for trial in range(5):
        x = rng.uniform(0, 1, (48, 48)).astype(np.float32)
        y = np.clip(x + rng.normal(0, 0.1, x.shape), 0, 1).astype(np.float32)
        got = evaluate._ssim_single(x, y)
        want = _ssim_oracle(x, y)
        np.testing.assert_allclose(got, want, rtol=1e-9, atol=1e-10)
        # MATLAB ssim_index.m variant (no sample-covariance correction)
        got_m = evaluate._ssim_single(x, y, use_sample_covariance=False)
        want_m = _ssim_oracle(x, y, use_sample_covariance=False)
        np.testing.assert_allclose(got_m, want_m, rtol=1e-9, atol=1e-10)


def test_ssim_identity_and_monotonicity():
    rng = np.random.default_rng(1)
    x = rng.uniform(0, 1, (40, 40, 3)).astype(np.float32)
    assert abs(evaluate.ssim(x, x) - 1.0) < 1e-9
    prev = 1.0
    for noise in (0.02, 0.08, 0.3):
        y = np.clip(x + rng.normal(0, noise, x.shape), 0, 1).astype(np.float32)
        s = evaluate.ssim(x, y)
        assert s < prev
        prev = s
    assert abs(evaluate.ssim(x, y) - evaluate.ssim(y, x)) < 1e-9


def test_psnr():
    x = np.zeros((8, 8, 3), np.float32)
    y = np.full((8, 8, 3), 0.1, np.float32)
    np.testing.assert_allclose(evaluate.psnr(x, y), 20.0, atol=1e-5)
    assert evaluate.psnr(x, x) == float("inf")
