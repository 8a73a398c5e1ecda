"""Native C++ host ops vs the pure-Python fallbacks (exact-math parity)."""

import os

import numpy as np
import pytest
from PIL import Image

from osmosis_tpu.utils import native

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library not built"
)


def test_preprocess_matches_numpy_fallback():
    from osmosis_tpu.data.transforms import (
        _small_side_dims, bilinear_resize_u8, center_crop,
    )

    rng = np.random.default_rng(0)
    for h, w in [(300, 400), (256, 256), (500, 280)]:
        img = rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
        nat = native.preprocess_rgb_u8(img, 256)
        new_h, new_w = _small_side_dims(h, w, 256)
        ref = center_crop(bilinear_resize_u8(img, new_h, new_w), 256)
        ref = (ref / 255.0 * 2.0 - 1.0).astype(np.float32)
        np.testing.assert_allclose(nat, ref, atol=2e-5)


def test_percentile_norm_matches_numpy():
    rng = np.random.default_rng(1)
    x = rng.standard_normal(5000).astype(np.float32)
    nat = native.percentile_minmax_norm(x, 0.05, 0.99)
    lo, hi = np.quantile(x, 0.05), np.quantile(x, 0.99)
    clipped = np.clip(x, lo, hi)
    ref = (clipped - clipped.min()) / (clipped.max() - clipped.min())
    np.testing.assert_allclose(nat, ref, atol=1e-5)


def test_colormap_matches_matplotlib():
    import matplotlib

    cm = matplotlib.colormaps["viridis"]
    g = np.linspace(0, 1, 257).astype(np.float32)
    nat = native.depth_to_color(g)
    ref = cm(g)[..., :3].astype(np.float32)
    np.testing.assert_allclose(nat, ref, atol=1e-6)


def test_png_roundtrip(tmp_path):
    rng = np.random.default_rng(2)
    img = rng.integers(0, 255, (64, 96, 3), dtype=np.uint8)
    path = str(tmp_path / "x.png")
    assert native.png_write_rgb8(path, img)
    back = np.asarray(Image.open(path).convert("RGB"))
    np.testing.assert_array_equal(back, img)


def test_save_png_uses_native(tmp_path):
    from osmosis_tpu.data.postprocess import save_png

    img01 = np.random.default_rng(3).uniform(0, 1, (32, 32, 3)).astype(np.float32)
    p = str(tmp_path / "y.png")
    save_png(img01, p)
    back = np.asarray(Image.open(p).convert("RGB"))
    np.testing.assert_array_equal(back, (img01 * 255).round().astype(np.uint8))


def test_nan_inputs_are_safe():
    """NaN depth maps (divergent random-init chains) must not crash or
    propagate NaN through the native postprocessing path."""
    g = np.array([0.1, np.nan, 2.0, -1.0, 0.9], np.float32)
    c = native.depth_to_color(g)
    assert np.isfinite(c).all()
    x = np.array([1.0, np.nan, 3.0, 2.0] * 50, np.float32)
    pn = native.percentile_minmax_norm(x, 0.05, 0.99)
    assert np.isfinite(pn).all()
