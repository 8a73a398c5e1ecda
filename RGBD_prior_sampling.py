#!/usr/bin/env python
"""Unconditional RGBD prior sampling CLI — same interface as the reference
RGBD_prior_sampling.py: ``python RGBD_prior_sampling.py -c <config.yaml> -d <dev>``."""

import os
import sys
from argparse import ArgumentParser


def main():
    parser = ArgumentParser()
    parser.add_argument(
        "-c", "--config_file", default="./configs/RGBD_sample_config.yaml",
        help="Configurations file",
    )
    parser.add_argument("-d", "--device", default=0, help="Device index", type=int)
    parser.add_argument(
        "--bf16", action="store_true",
        help="Run the UNet torso in bfloat16 (fp32 GroupNorm islands kept)",
    )
    parser.add_argument(
        "--multihost", action="store_true",
        help="initialize jax.distributed; sample indices stride across hosts",
    )
    parser.add_argument("--coordinator", default=None, metavar="HOST:PORT")
    parser.add_argument("--num-processes", type=int, default=None)
    parser.add_argument("--process-id", type=int, default=None)
    args = parser.parse_args()
    config_file = os.path.abspath(args.config_file)
    print(f"\nConfiguration file:\n{config_file}\n")

    if args.multihost or args.coordinator is not None:
        from osmosis_tpu.parallel import multihost as MH

        MH.initialize(args.coordinator, args.num_processes, args.process_id)

    import jax.numpy as jnp

    from osmosis_tpu.pipelines import run_prior_sampling

    run_prior_sampling(
        config_file,
        device_index=args.device,
        model_dtype=jnp.bfloat16 if args.bf16 else jnp.float32,
    )
    print("\nFINISH!")


if __name__ == "__main__":
    main()
    sys.exit()
