#!/usr/bin/env python
"""Quick prior-health probe: unconditional samples vs training statistics.

Samples N images from a toy prior checkpoint and compares luminance-depth
correlation, per-channel std and total variation against a fresh batch of
the procedural training scenes (tools/train_toy_prior.synth_scene_batch).
Used to separate "the prior is weak" from "the guidance recipe is wrong"
when a validation scale fails (VALIDATION.md 3b ladder).

    python tools/check_prior_stats.py --checkpoint checkpoints/toy_prior128_prod.msgpack \
        --size 128 --channels 64 --arch production
"""

from __future__ import annotations

import argparse
import json
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def stats(x):
    """x: [B,H,W,4] in [-1,1] -> summary stats dict."""
    rgb, depth = x[..., :3], x[..., 3]
    lum = rgb.mean(axis=-1)
    corrs = []
    for b in range(x.shape[0]):
        l, d = lum[b].ravel(), depth[b].ravel()
        ls, ds = l.std(), d.std()
        corrs.append(float(np.corrcoef(l, d)[0, 1]) if ls > 1e-6 and ds > 1e-6 else 0.0)
    tv = np.mean(np.abs(np.diff(x, axis=1))) + np.mean(np.abs(np.diff(x, axis=2)))
    return {
        "lum_depth_corr": round(float(np.mean(corrs)), 3),
        "rgb_std": round(float(rgb.std()), 3),
        "depth_std": round(float(depth.std()), 3),
        "tv": round(float(tv), 4),
        "rgb_range": [round(float(rgb.min()), 2), round(float(rgb.max()), 2)],
    }


def prior_health(params, cfg, size: int, n: int = 4, steps: int = 1000,
                 seed: int = 7, init_mode: str = "noise") -> dict:
    """Sample n unconditional images from `params` (UNetConfig `cfg`) and
    return {'prior_samples': stats, 'train_scenes': stats} for comparison.
    Called by train_toy_prior.py at the end of every run (--health-check).

    init_mode='q_sample' is a DIAGNOSTIC: start the chain from
    q(x_T | x0) of held-out training scenes instead of pure N(0,1). The two
    inits differ only by the leaked signal term sqrt(alphas_cumprod_T)*x0
    (~0.0066*x0 for the linear-1000 schedule) — if q_sample calibrates the
    amplitude stats while 'noise' does not, the prior's miscalibration is
    the classic non-zero-terminal-SNR mean leak (the model learned to read
    the per-image global mean out of x_T during training; pure noise has
    none), not a capacity/data problem. See VALIDATION.md 3b-iv."""
    from tools.train_toy_prior import synth_scene_batch

    from osmosis_tpu.diffusion.sampler import SamplerConfig, sample_loop
    from osmosis_tpu.diffusion.schedules import make_schedule
    from osmosis_tpu.models import UNetModel

    model = UNetModel(cfg)
    schedule = make_schedule("linear", 1000)

    def run(params_, x, key):
        def model_fn(xx, tt):
            return model.apply(params_, xx, tt)

        out, _ = sample_loop(
            model_fn, schedule, x, key,
            SamplerConfig(model_var_type="fixed_small"),
            start_t=1000, num_steps=steps,
        )
        return out

    key = jax.random.key(seed)
    eps_T = jax.random.normal(jax.random.fold_in(key, 0), (n, size, size, 4))
    if init_mode == "q_sample":
        consts = schedule.device_constants()
        x0_scenes = synth_scene_batch(jax.random.fold_in(key, 3), n, size)
        x_init = (jnp.asarray(consts["sqrt_alphas_cumprod"])[-1] * x0_scenes
                  + jnp.asarray(consts["sqrt_one_minus_alphas_cumprod"])[-1]
                  * eps_T)
    else:
        x_init = eps_T
    samples = np.asarray(jax.jit(run)(params, x_init, jax.random.fold_in(key, 1)))
    train = np.asarray(synth_scene_batch(jax.random.fold_in(key, 2), n, size))
    return {
        "prior_samples": stats(np.clip(samples, -1, 1)),
        "train_scenes": stats(train),
    }


def eps_bias_table(params, cfg, size: int, batch: int = 8,
                   ts=(25, 100, 300, 500, 700, 850, 950, 999),
                   seed: int = 42) -> list:
    """Per-t eps-prediction accuracy ON the training distribution.

    For each t: xt = q_sample(x0, t, eps) on held-out scenes, eps_hat =
    model(xt, t). Reports proj = <eps_hat,eps>/||eps||^2 (energy along the
    true noise), rel = ||eps_hat-eps||/||eps||, the std of the implied
    x0_hat (vs the data's ~0.25 rgb / ~0.14 depth), and per-channel-group
    mean bias. Separates pointwise training failure (bad proj/bias at some
    t) from trajectory compounding (all rows healthy yet unconditional
    samples miscalibrate — the VALIDATION.md 3b-iv 128px signature)."""
    from tools.train_toy_prior import synth_scene_batch

    from osmosis_tpu.diffusion.schedules import make_schedule
    from osmosis_tpu.models import UNetModel

    model = UNetModel(cfg)
    consts = make_schedule("linear", 1000).device_constants()
    sab = jnp.asarray(consts["sqrt_alphas_cumprod"])
    s1m = jnp.asarray(consts["sqrt_one_minus_alphas_cumprod"])

    def probe(params_, x0, eps, t):
        xt = sab[t] * x0 + s1m[t] * eps
        out = model.apply(params_, xt, jnp.full((x0.shape[0],), t, jnp.float32))
        eps_hat = out[..., :4]
        proj = jnp.sum(eps_hat * eps) / jnp.sum(eps * eps)
        rel = jnp.sqrt(jnp.sum((eps_hat - eps) ** 2) / jnp.sum(eps * eps))
        x0_hat = (xt - s1m[t] * eps_hat) / sab[t]
        return (proj, rel, jnp.std(x0_hat[..., :3]), jnp.std(x0_hat[..., 3]),
                jnp.mean(eps_hat[..., :3] - eps[..., :3]),
                jnp.mean(eps_hat[..., 3] - eps[..., 3]))

    jp = jax.jit(probe, static_argnums=3)
    key = jax.random.key(seed)
    x0 = synth_scene_batch(jax.random.fold_in(key, 0), batch, size)
    eps = jax.random.normal(jax.random.fold_in(key, 1), x0.shape)
    rows = []
    for t in ts:
        r = [float(v) for v in jax.device_get(jp(params, x0, eps, int(t)))]
        rows.append({
            "t": int(t), "proj": round(r[0], 4), "rel": round(r[1], 4),
            "x0hat_rgb_std": round(r[2], 3), "x0hat_depth_std": round(r[3], 3),
            "eps_mean_bias_rgb": round(r[4], 5),
            "eps_mean_bias_depth": round(r[5], 5),
        })
    return rows


def trajectory_table(params, cfg, size: int, n: int = 4,
                     ts=(999, 950, 850, 700, 500, 300, 100, 25, 0),
                     seed: int = 7) -> list:
    """Amplitude statistics ALONG the sampled chain (vs on-distribution).

    Runs real unconditional sampling and records x_t / implied x0_hat at
    the given timesteps. Comparing std(x0_hat) here against
    eps_bias_table's on-distribution values shows WHERE the trajectory
    departs: rows where the on-trajectory x0_hat energy exceeds the
    on-distribution one mark the compounding region (VALIDATION.md
    3b-iv)."""
    from osmosis_tpu.diffusion.sampler import SamplerConfig, sample_loop
    from osmosis_tpu.diffusion.schedules import make_schedule
    from osmosis_tpu.models import UNetModel

    model = UNetModel(cfg)
    schedule = make_schedule("linear", 1000)

    def run(params_, x, key):
        def model_fn(xx, tt):
            return model.apply(params_, xx, tt)

        return sample_loop(
            model_fn, schedule, x, key,
            SamplerConfig(model_var_type="fixed_small"),
            record_steps=ts,
        )

    key = jax.random.key(seed)
    x_init = jax.random.normal(jax.random.fold_in(key, 0), (n, size, size, 4))
    _, snaps = jax.jit(run)(params, x_init, jax.random.fold_in(key, 1))
    xt = np.asarray(snaps["x_t"])
    x0h = np.asarray(snaps["x0_hat"])
    rows = []
    for i, t in enumerate(snaps["steps"]):
        rows.append({
            "t": int(t),
            "xt_std": round(float(xt[i].std()), 3),
            "x0hat_rgb_std": round(float(x0h[i, ..., :3].std()), 3),
            "x0hat_depth_std": round(float(x0h[i, ..., 3].std()), 3),
            "x0hat_rgb_mean": round(float(x0h[i, ..., :3].mean()), 3),
        })
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--size", type=int, default=128)
    ap.add_argument("--channels", type=int, default=64)
    ap.add_argument("--arch", default="production", choices=["toy", "production"])
    ap.add_argument("--n", type=int, default=4)
    ap.add_argument("--steps", type=int, default=1000)
    ap.add_argument("--seed", type=int, default=7)
    ap.add_argument("--init-mode", default="noise", choices=["noise", "q_sample"],
                    help="'q_sample' starts the chain from q(x_T|x0) of "
                         "held-out scenes — isolates the terminal-SNR mean "
                         "leak (see prior_health docstring)")
    ap.add_argument("--eps-bias", action="store_true",
                    help="instead of sampling, print the per-t eps-accuracy "
                         "table on held-out scenes (see eps_bias_table)")
    ap.add_argument("--trajectory", action="store_true",
                    help="print amplitude stats recorded ALONG a real "
                         "sampling chain (see trajectory_table)")
    args = ap.parse_args()

    from tools.train_toy_prior import toy_unet_config

    from osmosis_tpu.models.convert import load_params_msgpack
    from osmosis_tpu.utils.compilation_cache import enable as _enable

    _enable()
    cfg = toy_unet_config(args.size, args.channels, args.arch)
    params = load_params_msgpack(args.checkpoint)
    if args.eps_bias:
        for row in eps_bias_table(params, cfg, size=args.size, seed=args.seed):
            print(json.dumps(row), flush=True)
        return
    if args.trajectory:
        for row in trajectory_table(params, cfg, size=args.size, n=args.n,
                                    seed=args.seed):
            print(json.dumps(row), flush=True)
        return
    print(json.dumps(prior_health(
        params, cfg, size=args.size, n=args.n, steps=args.steps,
        seed=args.seed, init_mode=args.init_mode,
    ), indent=1))


if __name__ == "__main__":
    main()
