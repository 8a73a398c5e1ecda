#!/usr/bin/env python
"""One-time torch → native checkpoint conversion.

    python tools/convert_checkpoint.py models/osmosis_outdoor.pt \
        [-o models/osmosis_outdoor.msgpack] [--image-size 256]

Reads the reference's PyTorch pickle state_dict (~2.2 GB fp32,
guided_diffusion/unet.py:94-98) and writes the native msgpack parameter tree
used by osmosis_tpu (loads ~3x faster and needs no torch at runtime).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("input", help=".pt state_dict path")
    ap.add_argument("-o", "--output", default=None, help="output .msgpack path")
    ap.add_argument("--image-size", type=int, default=256)
    ap.add_argument("--model-channels", type=int, default=256)
    args = ap.parse_args()

    from osmosis_tpu.models import UNetConfig
    from osmosis_tpu.models.convert import (
        convert_state_dict,
        load_torch_state_dict,
        save_params_msgpack,
    )

    cfg = UNetConfig(
        image_size=args.image_size,
        model_channels=args.model_channels,
    )
    out = args.output or os.path.splitext(args.input)[0] + ".msgpack"
    print(f"reading {args.input} ...")
    sd = load_torch_state_dict(args.input)
    print(f"{len(sd)} tensors; converting ...")
    params = convert_state_dict(sd, cfg)
    save_params_msgpack(params, out)
    print(f"wrote {out} ({os.path.getsize(out) / 1e9:.2f} GB)")


if __name__ == "__main__":
    main()
