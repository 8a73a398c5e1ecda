#!/usr/bin/env python
"""Guided restoration CLI — same interface as the reference osmosis_sampling.py:
``python osmosis_sampling.py -c <config.yaml> -d <device-index>``."""

import os
import sys
from argparse import ArgumentParser


def main():
    parser = ArgumentParser()
    parser.add_argument(
        "-c", "--config_file", default="./configs/osmosis_sample_config.yaml",
        help="Configurations file",
    )
    parser.add_argument("-d", "--device", default=0, help="Device index", type=int)
    parser.add_argument(
        "--bf16", action="store_true",
        help="Run the UNet torso in bfloat16 (fp32 GroupNorm islands kept)",
    )
    parser.add_argument(
        "--progress", type=int, default=None, metavar="N",
        help="print loss/phi every N diffusion steps (async host callback)",
    )
    parser.add_argument(
        "--multihost", action="store_true",
        help="initialize jax.distributed (TPU pod: auto-discovers topology; "
             "otherwise pass --coordinator/--num-processes/--process-id or "
             "set JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID)",
    )
    parser.add_argument("--coordinator", default=None, metavar="HOST:PORT")
    parser.add_argument("--num-processes", type=int, default=None)
    parser.add_argument("--process-id", type=int, default=None)
    args = parser.parse_args()

    if args.multihost or args.coordinator is not None:
        from osmosis_tpu.parallel import multihost as MH

        MH.initialize(args.coordinator, args.num_processes, args.process_id)
    config_file = os.path.abspath(args.config_file)
    print(f"\nConfiguration file:\n{config_file}\n")

    import jax.numpy as jnp

    from osmosis_tpu.pipelines import run_restoration

    run_restoration(
        config_file,
        device_index=args.device,
        model_dtype=jnp.bfloat16 if args.bf16 else jnp.float32,
        progress_every=args.progress,
    )
    print("\nFINISH!")


if __name__ == "__main__":
    main()
    sys.exit()
