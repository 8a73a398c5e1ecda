"""Preprocessing: resize small side → center crop → normalize to [-1,1].

Reference builds `ToTensor → Resize(256) → CenterCrop(256²) → Normalize(.5,.5)`
(osmosis_sampling.py:46-49). Here decode+resize run on the host via PIL
(bilinear, the torchvision default interpolation) and the normalized NHWC
float32 array is what gets shipped to the device.
"""

from __future__ import annotations

from typing import Union

import numpy as np
from PIL import Image


def resize_small_side(img: Image.Image, size: int) -> Image.Image:
    """torchvision Resize(size=int): scale so the SMALL side == size."""
    w, h = img.size
    if w <= h:
        new_w, new_h = size, max(size, int(round(h * size / w)))
    else:
        new_w, new_h = max(size, int(round(w * size / h))), size
    return img.resize((new_w, new_h), Image.BILINEAR)


def center_crop(arr: np.ndarray, size: int) -> np.ndarray:
    """[H,W,C] center crop to size×size (pads with zeros if smaller)."""
    h, w = arr.shape[:2]
    if h < size or w < size:
        pad_h, pad_w = max(0, size - h), max(0, size - w)
        arr = np.pad(
            arr,
            ((pad_h // 2, pad_h - pad_h // 2), (pad_w // 2, pad_w - pad_w // 2), (0, 0)),
        )
        h, w = arr.shape[:2]
    top = (h - size) // 2
    left = (w - size) // 2
    return arr[top : top + size, left : left + size]


def preprocess_image(img: Union[Image.Image, np.ndarray], size: int = 256) -> np.ndarray:
    """PIL image → float32 NHW C in [-1,1], resized + center-cropped."""
    if isinstance(img, np.ndarray):
        img = Image.fromarray(img)
    if img.mode != "RGB":
        img = img.convert("RGB")
    img = resize_small_side(img, size)
    arr = np.asarray(img, dtype=np.float32) / 255.0
    arr = center_crop(arr, size)
    return arr * 2.0 - 1.0  # Normalize((0.5,)*3, (0.5,)*3)


def degamma(y: np.ndarray, gamma: float = 2.2) -> np.ndarray:
    """Optional input linearization for haze images
    (osmosis_sampling.py:173-175): y ← 2·((y+1)/2)^2.2 − 1."""
    y01 = 0.5 * (y + 1.0)
    return 2.0 * np.power(y01, gamma) - 1.0
