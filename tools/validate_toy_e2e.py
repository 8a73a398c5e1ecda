#!/usr/bin/env python
"""End-to-end QUANTITATIVE validation of guided restoration with a real
learned prior (the toy RGBD prior from tools/train_toy_prior.py).

Without the reference's released checkpoint, restoration quality was
unmeasurable (VERDICT r1 #1). This closes the loop at toy scale with a
ground-truth protocol the reference itself cannot offer:

  1. sample held-out synthetic scenes (J_true, z_true) from the training
     distribution;
  2. degrade through the underwater physical model with KNOWN phi
     (I = J e^{-phi_a z} + phi_inf (1 - e^{-phi_b z}), measurements.py:262);
  3. run the REAL guided sampling loop (osmosis conditioning, pcgs masks,
     in-scan phi SGD) from pure noise;
  4. report PSNR(restored vs J_true) against PSNR(degraded vs J_true),
     depth correlation, and recovered-phi error.

PASS = restoration beats the degraded input by >2 dB, depth correlates on
average, and >=2/3 of scenes have positive depth correlation.

    python tools/validate_toy_e2e.py --checkpoint checkpoints/toy_prior.msgpack
"""

from __future__ import annotations

import argparse
import json
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def psnr(a, b):
    mse = float(np.mean((np.asarray(a) - np.asarray(b)) ** 2))
    return float("inf") if mse == 0 else 10 * np.log10(1.0 / mse)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", default="checkpoints/toy_prior.msgpack")
    ap.add_argument("--scenes", type=int, default=4)
    ap.add_argument("--size", type=int, default=32)
    ap.add_argument("--channels", type=int, default=64)
    ap.add_argument("--T", type=int, default=1000)
    ap.add_argument("--respacing", default="200")
    ap.add_argument("--n-iter", type=int, default=10)
    ap.add_argument("--update-start", type=float, default=0.7,
                    help="pcgs update_start: phi is frozen above "
                         "update_start*T; 1.0 lets phi descend from the "
                         "first step (probes the wrong-basin mode, "
                         "VALIDATION.md 3b)")
    ap.add_argument("--scale", default="2,2,2,1",
                    help="guidance scale; norm-loss gradients shrink ~1/size "
                         "per pixel, so larger images need a larger scale "
                         "(32px: 2,2,2,1; 64px: ~4,4,4,2)")
    ap.add_argument("--phi-eta", type=str, default="2e-4",
                    help="phi SGD lr; phi gradients GROW ~size under the "
                         "norm loss, so halve per 2x image size. A comma "
                         "list gives PER-CHANNEL rates (extension)")
    ap.add_argument("--phi-warmup", type=int, default=0,
                    help="phi_warmup_iters: extra phi-only descent "
                         "iterations at the unfreeze boundary (extension "
                         "beyond the reference; probes the wrong-basin "
                         "mode, VALIDATION.md 3b)")
    ap.add_argument("--best-of", type=int, default=1,
                    help="run K chains from different noise seeds and keep "
                         "the one with the lowest final measurement loss — "
                         "the wrong-basin mode announces itself with a "
                         "~1.7x higher final loss, so loss-based selection "
                         "needs no ground truth (extension)")
    ap.add_argument("--phi-jitter", type=float, default=0.0,
                    help="with --best-of: restarts >0 also jitter the phi "
                         "INIT by N(0, sigma) — diversifies the basin of "
                         "attraction when every noise seed lands in the "
                         "same wrong (J, phi) mode")
    ap.add_argument("--only-scene", type=int, default=None,
                    help="run a single scene index (basin-mode probing)")
    ap.add_argument("--accept-loss", type=float, default=None,
                    help="with --best-of: stop restarting once a trial's "
                         "final loss is <= this (adaptive escalation — "
                         "healthy chains accept on trial 0)")
    ap.add_argument("--optimizer", default="sgd",
                    choices=["sgd", "gd", "adam", "rmsprop"],
                    help="phi optimizer (the operator config surface); adam's "
                         "adaptive steps escape the wrong-basin phi/J "
                         "trade-off that plain SGD shows at 64px")
    ap.add_argument("--seed", type=int, default=123)
    ap.add_argument("--sample-seed", type=int, default=None,
                    help="vary ONLY the sampling randomness (chain init "
                         "noise + in-chain noise), keeping the held-out "
                         "scenes and degradations bitwise identical — the "
                         "seed-replication axis for quantifying draw-to-"
                         "draw spread of a grid cell (VERDICT r4 #2). "
                         "None = the original draw (bitwise the round-4 "
                         "grid rows)")
    ap.add_argument("--row-name", default=None,
                    help="stamp a row identifier into the output JSON "
                         "(grid bookkeeping)")
    ap.add_argument("--sampler", default="ddpm", choices=["ddpm", "ltsp"],
                    help="ltsp = Lie-Trotter splitting with PLMS4 diffusion "
                         "substep (arXiv 2301.11558) — fewer steps, same quality")
    ap.add_argument("--arch", default="toy", choices=["toy", "production"],
                    help="must match the trained checkpoint's "
                         "train_toy_prior.py --arch")
    ap.add_argument("--x0-grad", action="store_true",
                    help="gradient_x_prev=False (the reference's config knob, "
                         "condition_methods.py:75): guidance gradient taken "
                         "w.r.t. x0-hat instead of x_prev — skips the UNet "
                         "backward entirely (~2x step rate); gradient never "
                         "clipped on this path (condition_methods.py:227-229)")
    ap.add_argument("--x-prev-every", type=int, default=1,
                    help="hybrid gradient schedule: full x_prev gradient "
                         "every k-th chain step, x0 gradient between — "
                         "interpolates the full mode's quality and the x0 "
                         "mode's step rate (PERF.md round 8); must divide "
                         "--steps evenly for a pure block scan")
    ap.add_argument("--oracle-phi", action="store_true",
                    help="subsystem isolation: initialize phi at the TRUE "
                         "water parameters and freeze it (learn flags off) "
                         "— separates prior/guidance health from the joint "
                         "phi descent (VALIDATION.md round 3)")
    ap.add_argument("--save-png", default=None,
                    help="save a GT / degraded / restored / depth strip here")
    args = ap.parse_args()

    from osmosis_tpu.diffusion.guided import GuidanceConfig, guided_sample_loop
    from osmosis_tpu.diffusion.sampler import SamplerConfig
    from osmosis_tpu.diffusion.schedules import make_schedule
    from osmosis_tpu.guidance.operators import get_operator
    from osmosis_tpu.models import UNetModel
    from osmosis_tpu.models.convert import load_params_msgpack
    from osmosis_tpu.utils.compilation_cache import enable as _enable

    _enable()

    from tools.train_toy_prior import synth_scene_batch, toy_unet_config

    cfg = toy_unet_config(args.size, args.channels, args.arch)
    model = UNetModel(cfg)
    params = load_params_msgpack(args.checkpoint)

    # known water parameters (within the shipped configs' regime)
    phi_true = {
        "phi_a": jnp.array([[0.55, 0.45, 0.35]]),
        "phi_b": jnp.array([[0.5, 0.4, 0.35]]),
        "phi_inf": jnp.array([[0.18, 0.32, 0.45]]),
    }  # within the regime of the shipped presets' inits
    # production depth conversion (gamma: z = ((d+1.4)*1.4)^1 in [0.56, 3.36],
    # positive and monotone — the shipped configs' mapping) makes depth
    # physically observable through both attenuation and backscatter
    if args.oracle_phi:
        op_kw = dict(
            optimizer=args.optimizer, depth_type="gamma", value="1.4,1.4,1",
            phi_a="0.55,0.45,0.35", phi_a_eta=0.0, phi_a_learn_flag=False,
            phi_b="0.5,0.4,0.35", phi_b_eta=0.0, phi_b_learn_flag=False,
            phi_inf="0.18,0.32,0.45", phi_inf_eta=0.0, phi_inf_learn_flag=False,
        )
    else:
        op_kw = dict(
            optimizer=args.optimizer, depth_type="gamma", value="1.4,1.4,1",
            phi_a="0.7,0.6,0.5", phi_a_eta=args.phi_eta, phi_a_learn_flag=True,
            phi_b="0.6,0.5,0.45", phi_b_eta=args.phi_eta, phi_b_learn_flag=True,
            phi_inf="0.14,0.29,0.49", phi_inf_eta=args.phi_eta, phi_inf_learn_flag=True,
        )
    operator = get_operator("underwater_physical_revised", batch_size=1, **op_kw)

    schedule = make_schedule("linear", args.T, timestep_respacing=args.respacing)
    pattern = dict(
        pattern="pcgs", update_start=args.update_start, update_end=0,
        global_N=1, local_M=1,
        s_start=1, s_end=0, n_iter=args.n_iter, start_guidance=1, stop_guidance=0,
        phi_warmup_iters=args.phi_warmup,
    )
    # full production guidance recipe: depth-weighted loss + the aux
    # exposure losses the shipped presets use (they stabilize the
    # mode selection of the jointly-sampled depth)
    gcfg = GuidanceConfig.from_config(
        "osmosis",
        dict(loss_function="norm", loss_weight="depth",
             weight_function="gamma,1.4,1.4,1", scale=args.scale,
             gradient_x_prev=not args.x0_grad, gradient_clip="True,0.01",
             x_prev_every=args.x_prev_every),
        pattern, {"aux_loss": {"avrg_loss": 0.5, "val_loss": 20.0}},
    )
    scfg = SamplerConfig(sampler=args.sampler, model_var_type="fixed_small",
                         clip_denoised=True)

    def run_one(params_, x_init, y, key, phi0):
        def model_fn(x, t):
            return model.apply(params_, x, t)

        return guided_sample_loop(
            model_fn, schedule, x_init, y, key, operator, gcfg, scfg,
            sample_pattern=pattern, phi_init=phi0,
        )

    run = jax.jit(run_one)
    phi_cold = {k: jnp.asarray(v) for k, v in operator.phi_init().items()}

    rows = []
    strips = []
    key = jax.random.key(args.seed)
    for i in range(args.scenes):
        if args.only_scene is not None and i != args.only_scene:
            continue
        kk = jax.random.fold_in(key, i)
        scene = synth_scene_batch(jax.random.fold_in(kk, 0), 1, args.size)
        # the sampling-key root: by default identical to kk (bitwise the
        # original grid draw); --sample-seed re-roots ONLY the chain
        # randomness below, never the scene/degradation above
        ks = kk if args.sample_seed is None else jax.random.fold_in(
            kk, 50_000 + args.sample_seed)
        J_true01 = 0.5 * (np.asarray(scene[..., :3])[0] + 1.0)
        z_true = np.asarray(scene[..., 3])[0]

        y01 = operator.forward(phi_true, scene)  # degraded, [0,1]
        y = 2.0 * y01 - 1.0
        best_loss, res, chosen = None, None, 0
        for k_try in range(max(args.best_of, 1)):
            k_base = jax.random.fold_in(ks, 1000 * k_try) if k_try else ks
            x_init = jax.random.normal(jax.random.fold_in(k_base, 1), scene.shape)
            phi0 = phi_cold
            if k_try and args.phi_jitter > 0:
                jkey = jax.random.fold_in(k_base, 3)
                phi0 = {
                    k: v + args.phi_jitter * jax.random.normal(
                        jax.random.fold_in(jkey, n), v.shape)
                    for n, (k, v) in enumerate(sorted(phi_cold.items()))
                }
            r = run(params, x_init, y, jax.random.fold_in(k_base, 2), phi0)
            fl = float(np.asarray(r.sep_loss)[-1].mean())
            if args.best_of > 1:
                print(f"scene {i}: try {k_try} final loss {fl:.3f}",
                      file=sys.stderr)
            if best_loss is None or fl < best_loss:
                best_loss, res, chosen = fl, r, k_try
            if args.accept_loss is not None and best_loss <= args.accept_loss:
                break
        if args.best_of > 1:
            print(f"scene {i}: best-of-{args.best_of} kept try {chosen} "
                  f"(final loss {best_loss:.3f})", file=sys.stderr)

        x0 = np.asarray(res.pred_xstart)[0]
        J_rest01 = np.clip(0.5 * (x0[..., :3] + 1.0), 0, 1)
        z_rest = x0[..., 3]

        p_in = psnr(np.asarray(y01)[0], J_true01)
        p_out = psnr(J_rest01, J_true01)
        corr = float(np.corrcoef(z_rest.ravel(), z_true.ravel())[0, 1])
        phi = {k: np.asarray(v)[0] for k, v in res.phi.items()}
        phi_err = float(np.mean([
            np.abs(phi[k] - np.asarray(phi_true[k])[0]).mean()
            for k in phi_true
        ]))
        final_loss = float(np.asarray(res.sep_loss)[-1].mean())
        rows.append(dict(scene=i, psnr_degraded=round(p_in, 2),
                         psnr_restored=round(p_out, 2),
                         depth_corr=round(corr, 3),
                         phi_mae=round(phi_err, 4),
                         final_loss=round(final_loss, 3)))
        print(f"scene {i}: degraded {p_in:.2f} dB -> restored {p_out:.2f} dB, "
              f"depth corr {corr:.3f}, phi MAE {phi_err:.4f}, "
              f"final loss {final_loss:.3f}", file=sys.stderr)
        if args.save_png:
            strips.append((J_true01, np.clip(np.asarray(y01)[0], 0, 1), J_rest01,
                           z_true, z_rest))

    mean_in = float(np.mean([r["psnr_degraded"] for r in rows]))
    mean_out = float(np.mean([r["psnr_restored"] for r in rows]))
    mean_corr = float(np.mean([r["depth_corr"] for r in rows]))
    n_pos = sum(1 for r in rows if r["depth_corr"] > 0)
    # PASS: restoration clearly beats the degraded input, depth correlates
    # on average and in >=2/3 of scenes (joint RGBD posterior sampling is
    # multi-modal — an occasional depth-inverted mode at toy scale is
    # expected and documented in VALIDATION.md)
    ok = (
        (mean_out - mean_in) > 2.0
        and mean_corr > 0.0
        and n_pos * 3 >= len(rows) * 2
    )

    if args.save_png and strips:
        from osmosis_tpu.data import postprocess as P

        panels = []
        for J, y01, R, zt, zr in strips:
            panels += [
                J, y01, R,
                P.depth_to_color(P.min_max_norm_range(zt)),
                P.depth_to_color(P.min_max_norm_range(zr)),
            ]
        P.save_png(P.make_grid(panels, nrow=5, pad_value=1.0), args.save_png)
        print(f"strip saved: {args.save_png}", file=sys.stderr)

    out = {
        "sampler": args.sampler, "respacing": args.respacing,
        "scenes": rows,
        "psnr_degraded_mean": round(mean_in, 2),
        "psnr_restored_mean": round(mean_out, 2),
        "psnr_gain_db": round(mean_out - mean_in, 2),
        "depth_corr_mean": round(mean_corr, 3),
        "pass": bool(ok),
    }
    if args.row_name is not None:
        out = {"row": args.row_name, **out}
    if args.sample_seed is not None:
        out["seed"] = args.sample_seed
    print(json.dumps(out))
    if not ok:
        # triage order established by the 128px investigation
        # (VALIDATION.md 3b-iv): first separate "the prior is weak" from
        # "the recipe is wrong" — a miscalibrated prior fails EVERY recipe
        print(
            "FAIL triage: (1) check prior calibration first:\n"
            f"    python tools/check_prior_stats.py --checkpoint {args.checkpoint} "
            f"--size {args.size} --channels {args.channels} --arch {args.arch}\n"
            "    (rgb_std/depth_std far above the train stats => the prior "
            "learned to read amplitude cues sampling cannot provide; the "
            "MEASURED fix is retraining with --offset-noise 0.1 — more "
            "data/steps does NOT fix it. Probe ladder: --trajectory for "
            "on-chain contraction, --eps-bias for per-t accuracy — "
            "VALIDATION.md 3b-iv)\n"
            "(2) isolate guidance with --oracle-phi; (3) wrong-basin phi "
            "(high final_loss outliers) => --best-of/--phi-jitter; (4) scale "
            "law: double --scale per size doubling (VALIDATION.md 3b)",
            file=sys.stderr,
        )
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
