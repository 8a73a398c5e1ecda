#!/usr/bin/env python
"""Train a toy RGBD diffusion prior on synthetic scenes, on-device.

The reference ships a pretrained 550M checkpoint that is NOT in this
container, so restoration quality has never been measurable here. This tool
closes the loop at small scale: it trains a small RGBD UNet prior on
procedurally generated scenes (smooth color fields + correlated smooth
depth), entirely on-device (data synthesis inside the jit — no host input
pipeline), producing a checkpoint that tools/validate_toy_e2e.py uses to
demonstrate the FULL guided-restoration stack quantitatively
(degrade with known water parameters -> restore -> PSNR/depth metrics).

Training is epsilon-prediction DDPM (Ho et al.; the reference model's
learned-variance head is left untrained and sampling uses fixed_small,
which the unified sampler supports). The train loop runs in scan-chunks of
--chunk steps per device call to amortize the relay dispatch overhead, with
an EMA of parameters saved alongside the raw ones.

    python tools/train_toy_prior.py --steps 6000 --out checkpoints/toy_prior.msgpack
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def synth_scene_batch(key, batch, size):
    """Procedural RGBD scenes in [-1, 1], NHWC [B, size, size, 4].

    RGB: sum of two random low-frequency fields (4x4 and 8x8 lattices,
    bilinearly upsampled) with random per-channel gains/offsets.
    Depth: an independent smooth field, plus a contribution from RGB
    luminance so the joint RGB-depth statistics are learnable.
    """
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)

    def field(k, lattice, ch):
        small = jax.random.uniform(k, (batch, lattice, lattice, ch),
                                   minval=-1.0, maxval=1.0)
        return jax.image.resize(small, (batch, size, size, ch), "bilinear")

    rgb = 0.7 * field(k1, 4, 3) + 0.3 * field(k2, 8, 3)
    gain = jax.random.uniform(k3, (batch, 1, 1, 3), minval=0.6, maxval=1.0)
    rgb = jnp.clip(rgb * gain, -1.0, 1.0)

    depth = 0.8 * field(k4, 4, 1) + 0.2 * field(k5, 8, 1)
    lum = jnp.mean(rgb, axis=-1, keepdims=True)
    # strong RGB-depth coupling: natural scenes make depth largely
    # predictable from appearance, which is what lets the real prior
    # hallucinate depth during guided restoration
    depth = jnp.clip(0.35 * depth + 0.65 * lum, -1.0, 1.0)
    return jnp.concatenate([rgb, depth], axis=-1)


def toy_unet_config(size: int, channels: int, arch: str):
    """UNetConfig for the toy priors. arch='production' replays the full
    6-level production plan (configs/osmosis_sample_config.yaml:47-63 /
    unet.py:506-695 geometry: mult (1,1,2,2,4,4), attention at downsample
    rates 8/16/32, resblock_updown, 64 head channels) at reduced width."""
    from osmosis_tpu.models import UNetConfig

    if arch == "production":
        return UNetConfig(
            image_size=size, in_channels=4, out_channels=8,
            model_channels=channels, num_res_blocks=2,
            attention_resolutions=(8, 16, 32),
            channel_mult=(1, 1, 2, 2, 4, 4),
            num_head_channels=64, use_scale_shift_norm=True,
            resblock_updown=True,
        )
    return UNetConfig(
        image_size=size, in_channels=4, out_channels=8,
        model_channels=channels, num_res_blocks=2,
        attention_resolutions=(4,), channel_mult=(1, 2),
        num_head_channels=32, use_scale_shift_norm=True,
        resblock_updown=True,
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=6000)
    ap.add_argument("--chunk", type=int, default=100,
                    help="train steps per device call (amortizes dispatch)")
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--size", type=int, default=32)
    ap.add_argument("--channels", type=int, default=64)
    ap.add_argument("--lr", type=float, default=2e-4)
    ap.add_argument("--ema", type=float, default=0.999)
    ap.add_argument("--T", type=int, default=1000)
    ap.add_argument("--offset-noise", type=float, default=0.0,
                    help="sigma of a per-(image,channel) CONSTANT noise "
                         "component added to eps (model predicts the sum). "
                         "Antidote to the non-zero-terminal-SNR mean leak: "
                         "the linear schedule leaves sqrt(alphas_cumprod_T)"
                         "~0.0066 of the signal in x_T, and the per-channel "
                         "global mean survives pixel averaging (leak SNR "
                         "grows ~sqrt(npixels), up to ~2 near t=900 at "
                         "128px), so the model learns to READ the scene "
                         "mean/amplitude out of x_t instead of generating "
                         "it — pure-noise sampling then miscalibrates "
                         "(VALIDATION.md 3b-iv). Offset noise drowns that "
                         "channel-mean signal so the marginal amplitude "
                         "must be learned. 0.0 = off (exact old behavior)")
    ap.add_argument("--input-perturb", type=float, default=0.0,
                    help="gamma of training-time input perturbation "
                         "(arXiv 2301.11706): x_t is built with "
                         "eps + gamma*xi (xi fresh N(0,1)) while the "
                         "target stays eps. Simulates sampling-time "
                         "prediction-error drift during training — the "
                         "exposure-bias remedy for chains whose "
                         "unconditional samples miscalibrate even though "
                         "per-t on-distribution accuracy is fine "
                         "(VALIDATION.md 3b-iv). 0.0 = off (exact old "
                         "behavior incl. RNG stream)")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--arch", default="toy", choices=["toy", "production"],
                    help="'toy' = 2-level (1,2) mult, attention at one "
                         "scale; 'production' = the FULL 6-level plan of "
                         "/root/reference/guided_diffusion/unet.py:506-695 "
                         "(channel_mult (1,1,2,2,4,4), attention at 3 "
                         "scales, resblock_updown, 64 head channels) at "
                         "reduced model_channels — exercises res_up/"
                         "res_down, multi-level virtual skips and all "
                         "attention sites with LEARNED weights")
    ap.add_argument("--out", default="checkpoints/toy_prior.msgpack")
    ap.add_argument("--init-from", default=None,
                    help="warm-start parameters from an existing msgpack "
                         "checkpoint (use the _raw file — the EMA weights "
                         "lag the training trajectory). Continues training "
                         "with fresh optimizer moments and EMA seeded at "
                         "the loaded params; --steps counts the NEW steps. "
                         "Pass a DIFFERENT --seed than the original run or "
                         "the continuation replays the same data stream. "
                         "Resume-after-crash and train-longer support for "
                         "the multi-hour 128/256px runs")
    ap.add_argument("--save-every", type=int, default=0,
                    help="also save ema+raw checkpoints every N steps "
                         "(atomic overwrite of --out; crash protection for "
                         "multi-hour runs and mid-run health probes; "
                         "0 = final save only)")
    ap.add_argument("--health-check", type=int, default=1,
                    help="after training, sample N unconditional images and "
                         "report amplitude/corr stats vs the training "
                         "distribution (0 = off). A miscalibrated prior "
                         "(e.g. rgb_std far above the train value) predicts "
                         "guided-restoration failure before any validation "
                         "run is spent on it")
    args = ap.parse_args()

    import os

    import optax

    from osmosis_tpu import perf as _perf
    from osmosis_tpu.diffusion.schedules import make_schedule
    from osmosis_tpu.models import UNetConfig, UNetModel
    from osmosis_tpu.models.convert import save_params_msgpack
    from osmosis_tpu.utils.compilation_cache import enable as _enable

    _enable()
    # Strip-batched convs are an inference-latency layout. In the TRAINING
    # backward (wgrad + optimizer state alive) the strip tensors at small
    # levels tile-pad catastrophically ([.., strips, 2, 32, C] against the
    # (8,128) TPU tile = up to 64-128x HBM expansion per remat copy) and
    # OOM 64px+ toy configs. Training is MXU-bound at these shapes anyway,
    # and the trained parameters are layout-independent (strip==flat
    # exactness is pinned by tests/test_strip_conv.py) — so train FLAT
    # unless the env explicitly overrides.
    if "OSMOSIS_TPU_STRIP_CONV" not in os.environ:
        _perf.set_perf(strip_conv=False)

    cfg = toy_unet_config(args.size, args.channels, args.arch)
    model = UNetModel(cfg)
    if args.init_from:
        from osmosis_tpu.models.convert import load_params_msgpack

        params = load_params_msgpack(args.init_from)
        print(f"warm-start from {args.init_from}", file=sys.stderr)
    else:
        params = jax.jit(model.init)(
            jax.random.key(args.seed),
            jnp.zeros((1, args.size, args.size, 4)), jnp.zeros((1,)),
        )
    n_params = sum(p.size for p in jax.tree_util.tree_leaves(params))
    print(f"toy prior: {n_params / 1e6:.2f}M params", file=sys.stderr)

    schedule = make_schedule("linear", args.T)
    consts = schedule.device_constants()
    sqrt_ab = jnp.asarray(consts["sqrt_alphas_cumprod"])
    sqrt_1mab = jnp.asarray(consts["sqrt_one_minus_alphas_cumprod"])

    tx = optax.adam(args.lr)
    opt_state = tx.init(params)
    ema = jax.tree_util.tree_map(lambda p: p, params)

    def loss_fn(p, key):
        n_extra = (args.offset_noise > 0.0) + (args.input_perturb > 0.0)
        if n_extra:
            kb, kt, ke, *kx = jax.random.split(key, 3 + n_extra)
        else:
            # keep the historical 3-way split so the default flags
            # reproduce the documented training runs' RNG stream exactly
            kb, kt, ke = jax.random.split(key, 3)
            kx = []
        x0 = synth_scene_batch(kb, args.batch, args.size)
        t = jax.random.randint(kt, (args.batch,), 0, args.T)
        eps = jax.random.normal(ke, x0.shape)
        if args.offset_noise > 0.0:
            eps = eps + args.offset_noise * jax.random.normal(
                kx.pop(0), (args.batch, 1, 1, x0.shape[-1])
            )
        # the TARGET is eps as corrupted so far; input perturbation below
        # is deliberately NOT part of the target (arXiv 2301.11706)
        eps_input = eps
        if args.input_perturb > 0.0:
            eps_input = eps + args.input_perturb * jax.random.normal(
                kx.pop(0), x0.shape
            )
        xt = sqrt_ab[t][:, None, None, None] * x0 + \
            sqrt_1mab[t][:, None, None, None] * eps_input
        out = model.apply(p, xt, t.astype(jnp.float32))
        pred_eps = out[..., :4]
        return jnp.mean((pred_eps - eps.astype(pred_eps.dtype)) ** 2)

    def train_chunk(carry, _):
        p, s, e, key = carry
        key, sub = jax.random.split(key)
        loss, grads = jax.value_and_grad(loss_fn)(p, sub)
        updates, s = tx.update(grads, s, p)
        p = optax.apply_updates(p, updates)
        e = jax.tree_util.tree_map(
            lambda a, b: args.ema * a + (1 - args.ema) * b, e, p
        )
        return (p, s, e, key), loss

    @jax.jit
    def run_chunk(p, s, e, key):
        (p, s, e, key), losses = jax.lax.scan(
            train_chunk, (p, s, e, key), None, length=args.chunk
        )
        return p, s, e, key, losses.mean(), losses[-1]

    raw_out = args.out.replace(".msgpack", "_raw.msgpack")
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)

    def _save(e, p):
        # atomic overwrite: a crash mid-write must not corrupt the only copy
        for tree, path in ((e, args.out), (p, raw_out)):
            tmp = path + ".tmp"
            save_params_msgpack(jax.device_get(tree), tmp)
            os.replace(tmp, path)

    key = jax.random.key(args.seed + 1)
    t0 = time.perf_counter()
    done = 0
    while done < args.steps:
        params, opt_state, ema, key, mean_l, last_l = run_chunk(
            params, opt_state, ema, key
        )
        done += args.chunk
        if done % (args.chunk * 5) == 0 or done >= args.steps:
            el = time.perf_counter() - t0
            print(f"step {done:6d}  loss {float(mean_l):.4f} "
                  f"(last {float(last_l):.4f})  {done / el:.1f} steps/s",
                  file=sys.stderr, flush=True)
        # fire on every --save-every boundary CROSSED this chunk (the exact
        # done % save_every == 0 form only fires at lcm(chunk, save_every),
        # halving or worse the promised crash-protection frequency)
        if (args.save_every and done < args.steps
                and done // args.save_every > (done - args.chunk) // args.save_every):
            _save(ema, params)
            print(f"checkpointed at step {done}", file=sys.stderr, flush=True)

    _save(ema, params)
    report = {
        "steps": args.steps, "params_m": round(n_params / 1e6, 2),
        "final_loss": round(float(mean_l), 4),
        "ema": args.out, "raw": raw_out,
        "train_steps_per_sec": round(args.steps / (time.perf_counter() - t0), 1),
    }
    if args.health_check:
        from tools.check_prior_stats import prior_health

        report["health"] = prior_health(
            ema, cfg, size=args.size, n=4, steps=1000, seed=args.seed + 2,
        )
    print(json.dumps(report))


if __name__ == "__main__":
    main()
