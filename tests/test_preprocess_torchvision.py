"""Input preprocessing must match the reference's torchvision pipeline
bit-for-bit in STRUCTURE (resize dims, crop offsets) and to float tolerance
in VALUES (interpolation weights; atol 2.5e-4 on the [-1,1] scale — torch
computes indices in fp32, the rebuild in fp64; the u8 input quantum is
7.8e-3).

The reference builds `ToTensor → Resize(256) → CenterCrop(256²) →
Normalize(0.5,0.5)` (osmosis_sampling.py:46-49) with torchvision==0.14.1
(environment.yml). torchvision is not installed here, so the oracle vendors
its ~15 relevant lines — `_compute_resized_output_size` (long side
TRUNCATES) and `center_crop` (`int(round(diff/2.0))`, banker's) — around
torch's own `F.interpolate(mode='bilinear', antialias=False,
align_corners=False)`, which is the exact kernel torchvision 0.14.1 calls
on tensor inputs. Both the numpy fallback and the native C++ kernel
(native/host_ops.cc) are asserted against this oracle.
"""

import numpy as np
import pytest

from osmosis_tpu.data import transforms as TR
from osmosis_tpu.utils import native


def torchvision_oracle(arr_u8: np.ndarray, size: int = 256) -> np.ndarray:
    import torch
    import torch.nn.functional as F

    # ToTensor: u8 HWC -> f32 CHW in [0,1]
    t = torch.from_numpy((arr_u8.astype(np.float32) / 255.0)).permute(2, 0, 1)[None]
    h, w = int(t.shape[-2]), int(t.shape[-1])
    # torchvision 0.14.1 transforms/functional.py _compute_resized_output_size
    short, long = (w, h) if w <= h else (h, w)
    new_short, new_long = size, int(size * long / short)
    new_h, new_w = (new_long, new_short) if w <= h else (new_short, new_long)
    t = F.interpolate(
        t, size=[new_h, new_w], mode="bilinear",
        align_corners=False, antialias=False,
    )
    # torchvision 0.14.1 F.center_crop
    top = int(round((new_h - size) / 2.0))
    left = int(round((new_w - size) / 2.0))
    t = t[..., top : top + size, left : left + size]
    t = (t - 0.5) / 0.5  # Normalize(0.5, 0.5)
    return t[0].permute(1, 2, 0).numpy()


# odd dims, extreme aspect ratios, the truncation case (256*999/500 =
# 511.488 -> 511, NOT 512), a crop-offset banker's-rounding case
# (diff = 255 ≡ 3 mod 4: floor gives 127, round gives 128), exact-size,
# and the upscale case
CASES = [
    (999, 500),   # truncation + odd crop offset (new_h=511)
    (500, 333),
    (333, 500),
    (1000, 667),  # int(256*1000/667)=383 (round would give 384)
    (257, 123),
    (123, 517),   # extreme aspect ratio
    (256, 256),   # identity
    (100, 80),    # upscale (negative source indices at the edge)
    (299, 256),
]


def _image(h, w):
    rng = np.random.default_rng(h * 1000 + w)
    return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)


@pytest.mark.parametrize("h,w", CASES)
def test_numpy_fallback_matches_torchvision(h, w, monkeypatch):
    monkeypatch.setattr(TR.native, "preprocess_rgb_u8", lambda a, s: None)
    arr = _image(h, w)
    got = TR.preprocess_image(arr, size=256)
    want = torchvision_oracle(arr, size=256)
    assert got.shape == want.shape == (256, 256, 3)
    np.testing.assert_allclose(got, want, atol=2.5e-4, rtol=0)


@pytest.mark.parametrize("h,w", CASES)
def test_native_kernel_matches_torchvision(h, w):
    if not native.available():
        pytest.skip("native host library not built")
    arr = _image(h, w)
    got = native.preprocess_rgb_u8(arr, 256)
    want = torchvision_oracle(arr, size=256)
    np.testing.assert_allclose(got, want, atol=2.5e-4, rtol=0)


def test_resize_dims_truncate_like_torchvision():
    # 256 * 999 / 500 = 511.488 -> torchvision truncates to 511
    assert TR._small_side_dims(999, 500, 256) == (511, 256)
    # 256 * 1000 / 667 = 383.808 -> 383, not 384
    assert TR._small_side_dims(1000, 667, 256) == (383, 256)
    assert TR._small_side_dims(667, 1000, 256) == (256, 383)
    assert TR._small_side_dims(256, 256, 256) == (256, 256)


def test_center_crop_offset_bankers_rounding():
    # diff = 255: torchvision takes top = round(127.5) = 128 (banker's)
    arr = np.arange(511 * 256 * 3, dtype=np.float32).reshape(511, 256, 3)
    out = TR.center_crop(arr, 256)
    np.testing.assert_array_equal(out, arr[128 : 128 + 256])
    # diff = 253: round(126.5) = 126 (banker's rounds to even)
    arr2 = np.arange(509 * 256 * 3, dtype=np.float32).reshape(509, 256, 3)
    out2 = TR.center_crop(arr2, 256)
    np.testing.assert_array_equal(out2, arr2[126 : 126 + 256])
