"""Unconditional RGBD prior sampling — RGBD_prior_sampling.py:22-126
equivalent, built on the unified sampler (model_var_type='fixed_small',
+1 timestep offset, last-N-steps window — SURVEY.md section 3.2)."""

from __future__ import annotations

import datetime
import os
from os.path import join as pjoin
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .. import config as C
from ..data import postprocess as P
from ..diffusion.sampler import SamplerConfig, sample_loop
from ..diffusion.schedules import make_schedule
from ..models.convert import load_unet_params
from ..models.unet import UNetModel, unet_config_from_yaml
from ..utils import logging as L
from ..utils.rundir import make_output_dirs, update_save_dir_date


def run_prior_sampling(
    config_file: str,
    device_index: int = 0,
    model_dtype=jnp.float32,
    save_dir_override: Optional[str] = None,
) -> str:
    from ..utils.compilation_cache import enable as _enable_cache

    _enable_cache()
    args = C.arguments_from_file(config_file)
    from .. import perf as PF

    PF.configure_from_dict(getattr(args, "perf", None))
    args.image_size = args.unet_model["image_size"]
    image_size = args.image_size
    devices = jax.local_devices()
    device = devices[min(device_index, len(devices) - 1)]

    # multi-host: sample indices stride across processes into a shared
    # run dir (same topology as restore.py — see parallel/multihost.py)
    from ..parallel import multihost as MH

    multihost = MH.is_multihost()

    out_path = os.path.abspath(
        pjoin(save_dir_override or args.save_dir, "RGBD_prior")
    )
    if multihost:
        if jax.process_index() == 0:
            out_path = update_save_dir_date(out_path)
        MH.barrier("prior_rundir")
        if jax.process_index() != 0:
            out_path = update_save_dir_date(out_path, resume=True)
    else:
        out_path = update_save_dir_date(out_path)
    C.config_snapshot(config_file, pjoin(out_path, "configurations.txt"))
    with open(pjoin(out_path, "configurations.txt"), "a") as _f:
        _f.write(PF.snapshot_text())
    paths = make_output_dirs(
        out_path, args.save_singles, args.save_grids,
        singles_subdirs=("rgb", "depth_color"),
    )
    logger = L.configure(out_path, rank_suffix=MH.rank_suffix() if multihost else "")
    logger.log(f"pretrained model file: {args.unet_model['model_path']}")

    if args.unet_model.get("use_fp16"):
        model_dtype = jnp.bfloat16  # TPU-native half precision
    ucfg = unet_config_from_yaml(args.unet_model, dtype=model_dtype)
    model = UNetModel(ucfg)
    params = load_unet_params(args.unet_model.get("model_path", ""), ucfg)
    params = jax.device_put(params, device)

    T = args.diffusion["steps"]
    num_steps = int(args.diffusion.get("timestep_respacing", T) or T)
    # the minimal prior sampler runs the LAST `steps` steps with the model
    # fed 1-indexed timesteps (osmosis_utils/diffusion.py:74-96)
    schedule = make_schedule(
        noise_schedule=args.diffusion["noise_schedule"], steps=T
    )
    scfg = SamplerConfig(sampler="ddpm", model_var_type="fixed_small")

    record_every = args.record_every if args.record_process else None
    if record_every is not None:
        # reference records when (1-indexed t) % record_every == 0 or t == 1
        rec = [t for t in range(T) if (t + 1) % record_every == 0] + [0]
        record_steps = tuple(sorted(set(rec), reverse=True))
    else:
        record_steps = None

    def _run(params_, x_init, key):
        def model_fn(x, t):
            return model.apply(params_, x, t)

        return sample_loop(
            model_fn, schedule, x_init, key, scfg,
            timestep_offset=1.0, start_t=T, num_steps=num_steps,
            record_steps=record_steps,
        )

    run_fn = jax.jit(_run)
    base_key = jax.random.key(args.manual_seed)

    for im_idx in range(args.number_of_images):
        if multihost and (im_idx % jax.process_count()) != jax.process_index():
            continue  # another host samples this index
        start_time = datetime.datetime.now()
        logger.log(f"\nInference image {im_idx}/{args.number_of_images}\n")
        k = jax.random.fold_in(base_key, im_idx)
        x_init = jax.random.normal(
            jax.random.fold_in(k, 0), (1, image_size, image_size, 4)
        )
        x, snaps = run_fn(params, x_init, jax.random.fold_in(k, 1))

        x = np.asarray(x)[0]
        x_rgb = P.clip01(0.5 * (1 + x[..., 0:3]))
        x_d = x[..., 3]
        x_d_pmm = P.min_max_norm_range_percentile(
            x_d, percent_low=0.05, percent_high=0.99
        )
        x_d_color = P.depth_to_color(x_d_pmm)

        # final recorded x0-hat (diffusion.py:130 returns the last recording)
        if snaps is not None:
            x0_last = np.asarray(snaps["x0_hat"])[-1, 0]
            x0_rgb = P.clip01(P.to_01(x0_last[..., 0:3]))
            x0_d = P.depth_to_color(
                P.min_max_norm_range_percentile(
                    P.to_01(x0_last[..., 3]), percent_low=0.05, percent_high=0.99
                )
            )
        else:
            x0_rgb, x0_d = x_rgb, x_d_color

        if args.save_singles:
            P.save_png(x0_rgb, pjoin(paths["rgb"], f"image_{im_idx}.png"))
            P.save_png(x0_d, pjoin(paths["depth_color"], f"image_{im_idx}.png"))
        if args.save_grids:
            grid = P.make_grid([x_rgb, x_d_color], nrow=2, pad_value=1.0)
            P.save_png(grid, pjoin(paths["grids"], f"image_{im_idx}.png"))
            if snaps is not None:
                _save_prior_process_grid(
                    snaps, pjoin(paths["grids"], f"image_{im_idx}_process.png")
                )
        logger.log(f"Run time: {datetime.datetime.now() - start_time}")

    if multihost:
        MH.barrier("prior_done")
    logger.close()
    return out_path


def _save_prior_process_grid(snaps, path):
    """x_t row + x0-rgb row + depth row (diffusion.py:98-128)."""
    xts = np.asarray(snaps["x_t"])[:, 0]
    x0s = np.asarray(snaps["x0_hat"])[:, 0]
    xt_row = [P.clip01(P.to_01(x[..., 0:3])) for x in xts]
    rgb_row = [P.clip01(P.to_01(x[..., 0:3])) for x in x0s]
    d_row = [
        P.depth_to_color(
            P.min_max_norm_range_percentile(
                P.to_01(x[..., 3]), percent_low=0.05, percent_high=0.99
            )
        )
        for x in x0s
    ]
    grid = P.make_grid(xt_row + rgb_row + d_row, nrow=len(xt_row), pad_value=1.0)
    P.save_png(grid, path)
