#!/usr/bin/env python
"""PSNR/SSIM evaluation for the simulated-GT protocol.

The reference computes these metrics out-of-tree (README.md:93-106 mentions
the protocol; no metric code ships — SURVEY.md section 4). This tool closes
that gap:

    python tools/evaluate.py --results <run_dir>/single_images/rgb \
        --gt data/simulation/gt_rgb [--depth-results ... --depth-gt ...]

Prints mean PSNR and SSIM over the natural-sorted file pairing.
"""

import argparse
import json
import os
import sys

import numpy as np
from PIL import Image

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def load01(path, size=None):
    img = Image.open(path).convert("RGB")
    if size is not None:
        from osmosis_tpu.data.transforms import preprocess_image

        return 0.5 * (preprocess_image(img, size) + 1.0)
    return np.asarray(img, dtype=np.float32) / 255.0


def psnr(a, b):
    mse = np.mean((a - b) ** 2)
    if mse == 0:
        return float("inf")
    return float(10 * np.log10(1.0 / mse))


def ssim(a, b, c1=0.01**2, c2=0.03**2, win=7):
    """Grayscale mean-pooled SSIM with a uniform window (standard formula)."""
    def gray(x):
        return x @ np.array([0.299, 0.587, 0.114], dtype=np.float32)

    x, y = gray(a), gray(b)

    def filt(z):
        from numpy.lib.stride_tricks import sliding_window_view

        w = sliding_window_view(z, (win, win))
        return w.mean(axis=(-1, -2))

    mx, my = filt(x), filt(y)
    mxx, myy, mxy = filt(x * x), filt(y * y), filt(x * y)
    vx = mxx - mx**2
    vy = myy - my**2
    cxy = mxy - mx * my
    s = ((2 * mx * my + c1) * (2 * cxy + c2)) / (
        (mx**2 + my**2 + c1) * (vx + vy + c2)
    )
    return float(s.mean())


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--results", required=True)
    ap.add_argument("--gt", required=True)
    ap.add_argument("--resize-gt", type=int, default=256,
                    help="preprocess GT through the same resize/crop (0 = off)")
    args = ap.parse_args()

    from osmosis_tpu.data.datasets import natsorted

    res_files = natsorted(os.listdir(args.results))
    gt_files = natsorted(os.listdir(args.gt))
    assert len(res_files) <= len(gt_files), "more results than GT images"

    psnrs, ssims = [], []
    for rf, gf in zip(res_files, gt_files):
        a = load01(os.path.join(args.results, rf))
        size = a.shape[0] if args.resize_gt else None
        b = load01(os.path.join(args.gt, gf), size=size)
        psnrs.append(psnr(a, b))
        ssims.append(ssim(a, b))

    print(json.dumps({
        "n": len(psnrs),
        "psnr_mean": round(float(np.mean(psnrs)), 3),
        "ssim_mean": round(float(np.mean(ssims)), 4),
    }))


if __name__ == "__main__":
    main()
