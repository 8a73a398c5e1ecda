#!/usr/bin/env python
"""Guided-fleet throughput: images/sec at batch N on one chip (PERF.md row).

Measures the vmapped fleet runner (exact per-image batch-1 semantics) over a
respaced guided chain and reports per-image step rate + images/hour for a
1000-step production image.

    python tools/bench_fleet.py --batch 4 --steps 20
"""

import argparse
import json
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--image-size", type=int, default=256)
    ap.add_argument("--remat", action="store_true",
                    help="enable remat (needed for large batches)")
    args = ap.parse_args()

    from osmosis_tpu.utils.compilation_cache import enable as _enable_cache

    _enable_cache()

    from osmosis_tpu.diffusion.guided import GuidanceConfig
    from osmosis_tpu.diffusion.sampler import SamplerConfig
    from osmosis_tpu.diffusion.schedules import make_schedule
    from osmosis_tpu.guidance.operators import get_operator
    from osmosis_tpu.models import UNetConfig, UNetModel
    from osmosis_tpu.parallel.runner import make_batched_guided_runner

    n, hw, T = args.batch, args.image_size, args.steps
    cfg = UNetConfig(
        image_size=hw, in_channels=4, out_channels=8, model_channels=256,
        num_res_blocks=2, attention_resolutions=(8, 16, 32),
        channel_mult=(1, 1, 2, 2, 4, 4), num_head_channels=64,
        use_scale_shift_norm=True, resblock_updown=True,
        dtype=jnp.bfloat16, remat=args.remat,
    )
    model = UNetModel(cfg)
    params = jax.jit(model.init)(
        jax.random.key(0), jnp.zeros((1, hw, hw, 4)), jnp.zeros((1,))
    )
    from osmosis_tpu.models.convert import cast_params_half

    params = cast_params_half(params)

    schedule = make_schedule("linear", 1000, timestep_respacing=T)
    operator = get_operator(
        "underwater_physical_revised", batch_size=1, optimizer="sgd",
        depth_type="gamma", value="1.4,1.4,1",
        phi_a="1.1,0.95,0.95", phi_b="0.95,0.8,0.8", phi_inf="0.14,0.29,0.49",
    )
    pattern = dict(
        pattern="pcgs", update_start=0.7, update_end=0, global_N=1, local_M=1,
        s_start=1, s_end=0, n_iter=20, start_guidance=1, stop_guidance=0,
    )
    gcfg = GuidanceConfig.from_config(
        "osmosis",
        dict(loss_function="norm", loss_weight="depth",
             weight_function="gamma,1.4,1.4,1", scale="7,7,7,0.9",
             gradient_x_prev=True, gradient_clip="True,0.005"),
        pattern, {"aux_loss": {"avrg_loss": 0.5, "val_loss": 20.0}},
    )
    run = make_batched_guided_runner(
        model.apply, schedule, operator, gcfg,
        SamplerConfig(clip_denoised=True), sample_pattern=pattern,
    )

    import numpy as np

    xs = jax.random.normal(jax.random.key(1), (n, hw, hw, 4))
    ys = jax.random.uniform(jax.random.key(2), (n, hw, hw, 3), minval=-1.0)
    keys = jax.random.split(jax.random.key(3), n)

    t0 = time.perf_counter()
    res = run(params, xs, ys, keys)
    np.asarray(res.sample)
    log(f"compile+first: {time.perf_counter() - t0:.1f}s")

    times = []
    for i in range(3):
        t0 = time.perf_counter()
        res = run(params, xs, ys, jax.random.split(jax.random.fold_in(jax.random.key(3), i), n))
        np.asarray(res.sample)
        times.append(time.perf_counter() - t0)
    best = min(times)
    img_steps_per_s = n * T / best
    s_per_1000step_img = 1000.0 * best / (n * T)
    log(f"batch {n}: {best:.3f}s / {T} steps -> {img_steps_per_s:.2f} "
        f"image-steps/s -> {s_per_1000step_img:.1f} s per 1000-step image "
        f"-> {3600 / s_per_1000step_img:.1f} images/hour/chip")
    print(json.dumps({
        "metric": f"fleet_image_steps_per_sec_batch{n}",
        "value": round(img_steps_per_s, 2),
        "unit": "image-steps/sec",
        "sec_per_1000step_image": round(s_per_1000step_img, 2),
        "remat": bool(args.remat),
    }))


if __name__ == "__main__":
    main()
