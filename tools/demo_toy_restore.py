#!/usr/bin/env python
"""One-command PRODUCT-PATH quality demo with the learned toy prior.

tools/validate_toy_e2e.py measures restoration through the library API;
this script proves the SHIPPED pipeline does it end to end: it synthesizes
held-out RGBD scenes, degrades them through a physical formation model
with known parameters (tools/simulate_degraded.py — the in-tree simulation
protocol), writes real PNG datasets (input + gt_rgb + uint16 gt_depth —
the simulation-preset layout, data.py:73-109 semantics), writes a config
using only the public YAML surface (msgpack checkpoint, adam phi
optimizer, fixed_small variance for the untrained variance head), runs
`run_restoration` — the same entry `osmosis_sampling.py` calls — and
scores the run-dir outputs with tools/evaluate.py's PSNR/SSIM plus the
depth correlation of the recovered depth channel.

`--operator` selects the guidance surface, covering every shipped preset
family (VALIDATION.md 3c/3d):
  underwater_physical_revised  the primary preset (3-phi model)
  underwater_physical          the simulation preset's shared-phi model
  haze_physical                the haze preset (scalar phi_ab)
  rgb_guidance                 the 'ps' DPS path: clean-RGB guidance,
                               depth comes free from the prior

    python tools/train_toy_prior.py --size 64 --channels 96 \
        --out checkpoints/toy_prior64.msgpack          # once, ~20 min
    python tools/demo_toy_restore.py --checkpoint checkpoints/toy_prior64.msgpack
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

# TRUE degradation parameters and (offset) preset-style inits per operator.
# True values come from tools/simulate_degraded.DEFAULT_PHI; inits are
# offset by the same margins the revised-underwater toy protocol uses
# (VALIDATION.md §3) so the recovered-phi task is comparable across models.
OP_SETUPS = {
    "underwater_physical_revised": dict(
        init={"phi_a": "0.7,0.6,0.5", "phi_b": "0.6,0.5,0.45",
              "phi_inf": "0.14,0.29,0.49"},
    ),
    "underwater_physical": dict(
        init={"phi_ab": "0.65,0.55,0.5", "phi_inf": "0.14,0.29,0.49"},
    ),
    "haze_physical": dict(
        init={"phi_ab": "1.0", "phi_inf": "0.5,0.55,0.6"},
    ),
}


def depth_corr_dirs(depth_dir: str, gt_depth_dir: str, size: int):
    """Mean Pearson correlation between run-dir depth_raw PNGs and GT
    depth PNGs (min-max normalization is monotonic, so the correlation
    sign/magnitude is meaningful)."""
    from PIL import Image

    from osmosis_tpu.data.datasets import natsorted

    names = natsorted(os.listdir(depth_dir))
    gts = natsorted(os.listdir(gt_depth_dir))
    corrs = []
    for n, g in zip(names, gts):
        d = np.asarray(Image.open(os.path.join(depth_dir, n)), np.float32)
        if d.ndim == 3:
            d = d[..., 0]
        t = np.asarray(
            Image.open(os.path.join(gt_depth_dir, g)).resize((size, size)),
            np.float32,
        )
        if t.ndim == 3:
            t = t[..., 0]
        corrs.append(float(np.corrcoef(d.ravel(), t.ravel())[0, 1]))
    return float(np.mean(corrs)), sum(1 for c in corrs if c > 0), corrs


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", default="checkpoints/toy_prior64.msgpack")
    ap.add_argument("--operator", default="underwater_physical_revised",
                    choices=sorted(OP_SETUPS) + ["rgb_guidance"])
    ap.add_argument("--scenes", type=int, default=4)
    ap.add_argument("--size", type=int, default=64)
    ap.add_argument("--channels", type=int, default=96)
    ap.add_argument("--workdir", default="/tmp/osmosis_toy_demo")
    ap.add_argument("--seed", type=int, default=123)
    ap.add_argument("--scale", default=None,
                    help="guidance scale override (default 4,4,4,2 physics / "
                         "3,3,3,0.1 rgb_guidance)")
    ap.add_argument("--global-N", type=int, default=1,
                    help="GibbsDDRM full-chain restarts with phi warm-start")
    ap.add_argument("--global-opt-reset", action="store_true",
                    help="reset phi optimizer moments between global chains "
                         "(extension; phi itself still warm-starts)")
    ap.add_argument("--phi-eta", type=float, default=1e-3,
                    help="phi optimizer learning rate (halve per size "
                         "doubling from the 64px value 1e-3 — "
                         "VALIDATION.md 3b scale law)")
    ap.add_argument("--global-eta-scale", type=float, default=1.0,
                    help="geometric phi-eta decay across global chains: "
                         "chain ii runs with etas * scale**ii (extension)")
    ap.add_argument("--phi-warmup", type=int, default=0,
                    help="phi_warmup_iters: extra phi-only iterations at "
                         "the unfreeze boundary (extension)")
    ap.add_argument("--best-of", type=int, default=1,
                    help="loss-selected noise-seed restarts (VALIDATION 3b-iii)")
    ap.add_argument("--phi-jitter", type=float, default=0.0,
                    help="phi-init jitter sigma for restart trials > 0")
    ap.add_argument("--accept-loss", type=float, default=None,
                    help="stop restarting once a trial's final loss is <= X")
    ap.add_argument("--x0-grad", action="store_true",
                    help="gradient_x_prev=False: guidance gradient w.r.t. "
                         "x0-hat — skips the UNet backward (~2.1x step "
                         "rate); needs a smaller scale (VALIDATION.md)")
    ap.add_argument("--x-prev-every", type=int, default=1,
                    help="hybrid gradient schedule: full x_prev gradient "
                         "every k-th chain step, x0 gradient between "
                         "(PERF.md round 8)")
    ap.add_argument("--oracle-phi", action="store_true",
                    help="diagnostic: init phi at the TRUE water parameters "
                         "and freeze it (learn flags off) — the oracle ceiling")
    ap.add_argument("--oracle-learn", action="store_true",
                    help="with --oracle-phi: keep the learn flags ON (descent "
                         "FROM the true phi — the good-basin warm-start control)")
    ap.add_argument("--arch", default="toy", choices=["toy", "production"],
                    help="must match the checkpoint's train_toy_prior.py "
                         "--arch; 'production' = full 6-level plan, "
                         "attention at 3 scales (expressed through the "
                         "public YAML surface)")
    args = ap.parse_args()

    import yaml

    from tools.simulate_degraded import (
        DEFAULT_PHI, simulate_dataset, synth_scenes,
    )

    wd = args.workdir
    rgb_guidance = args.operator == "rgb_guidance"
    scenes = synth_scenes(args.scenes, args.size, args.seed)

    if rgb_guidance:
        # guidance measurement IS the clean RGB; depth comes from the prior
        from PIL import Image

        for sub in ("input", "gt_rgb", "gt_depth"):
            os.makedirs(os.path.join(wd, sub), exist_ok=True)
        for name, rgbd in scenes:
            rgb01 = np.clip(0.5 * (rgbd[0, ..., :3] + 1.0), 0, 1)
            depth01 = np.clip(0.5 * (rgbd[0, ..., 3] + 1.0), 0, 1)
            img = Image.fromarray((rgb01 * 255).round().astype(np.uint8))
            img.save(os.path.join(wd, "input", f"{name}.png"))
            img.save(os.path.join(wd, "gt_rgb", f"{name}.png"))
            Image.fromarray((depth01 * 65535).round().astype(np.uint16)).save(
                os.path.join(wd, "gt_depth", f"{name}.png"))
    else:
        simulate_dataset(wd, scenes, operator_name=args.operator)

    if rgb_guidance:
        measurement = dict(
            operator=dict(name="rgb_guidance"),
            noise=dict(name="gaussian", sigma=0),
        )
        conditioning = dict(method="ps", params=dict(
            loss_function="norm", loss_weight="depth",
            weight_function="gamma,1.4,1.4,1",
            scale=args.scale or "3,3,3,0.1",
            gradient_x_prev=True, gradient_clip="True,0.01",
        ))
    else:
        phi_true = DEFAULT_PHI[args.operator]
        # --oracle-phi: init at the exact degradation parameters, frozen
        if args.oracle_phi:
            init, learn = dict(phi_true), bool(args.oracle_learn)
        else:
            init, learn = OP_SETUPS[args.operator]["init"], True
        op_cfg = dict(
            name=args.operator, optimizer="adam",
            depth_type="gamma", value="1.4,1.4,1",
        )
        for pname, pinit in init.items():
            op_cfg[pname] = pinit
            op_cfg[f"{pname}_eta"] = args.phi_eta
            op_cfg[f"{pname}_learn_flag"] = learn
        measurement = dict(operator=op_cfg, noise=dict(name="clean"))
        conditioning = dict(method="osmosis", params=dict(
            loss_function="norm", loss_weight="depth",
            weight_function="gamma,1.4,1.4,1",
            # x0-grad default from the VALIDATION.md sweep: half the x_prev
            # scale (the unclipped x0 gradient is stronger per unit scale;
            # uniform RGB:depth ratio preserved — raising the depth
            # component alone measured worse on both metrics)
            scale=args.scale or ("2,2,2,1" if args.x0_grad else "4,4,4,2"),
            gradient_x_prev=not args.x0_grad, gradient_clip="True,0.01",
            x_prev_every=args.x_prev_every,
        ))

    cfg = dict(
        save_dir=os.path.join(wd, "results"),
        best_of=args.best_of, phi_jitter=args.phi_jitter,
        accept_loss=args.accept_loss,
        degamma_input=False, manual_seed=args.seed,
        rgb_guidance=rgb_guidance,
        save_singles=True, save_grids=True,
        record_process=False, record_every=200,
        change_input_output_channels=True, input_channels=4, output_channels=8,
        sample_pattern=dict(
            pattern="pcgs", update_start=0.7, update_end=0,
            global_N=args.global_N,
            global_opt_reset=bool(args.global_opt_reset),
            global_eta_scale=args.global_eta_scale,
            local_M=1, s_start=1, s_end=0, n_iter=10,
            start_guidance=1, stop_guidance=0,
            phi_warmup_iters=args.phi_warmup,
        ),
        unet_model=dict(
            image_size=args.size, num_channels=args.channels,
            num_res_blocks=2,
            channel_mult=(
                "1,1,2,2,4,4" if args.arch == "production" else "1,2"
            ),
            learn_sigma=True, class_cond=False, use_checkpoint=False,
            # reference semantics: ds = image_size // res. toy arch:
            # attention at ds 4 (res size//4). production arch: attention
            # at ds 8/16/32 (train_toy_prior.toy_unet_config), expressed
            # as resolutions size//8, size//16, size//32
            attention_resolutions=(
                f"{args.size // 8},{args.size // 16},{args.size // 32}"
                if args.arch == "production" else str(args.size // 4)
            ),
            num_heads=4,
            num_head_channels=64 if args.arch == "production" else 32,
            num_heads_upsample=-1,
            use_scale_shift_norm=True, dropout=0.0, resblock_updown=True,
            use_fp16=False, use_new_attention_order=False,
            model_path=args.checkpoint, pretrain_model="osmosis",
        ),
        diffusion=dict(
            sampler="ddpm", steps=1000, noise_schedule="linear",
            model_mean_type="epsilon",
            # the toy prior's variance head is untrained → fixed_small
            model_var_type="fixed_small",
            dynamic_threshold=False, clip_denoised=True,
            min_max_denoised=False, rescale_timesteps=False,
            timestep_respacing=200,
        ),
        conditioning=conditioning,
        aux_loss=dict(aux_loss=dict(avrg_loss=0.5, val_loss=20)),
        data=dict(batch_size=1, name="toy_demo",
                  root=os.path.join(wd, "input"), stop_after=-1,
                  ground_truth=True,
                  gt_rgb=os.path.join(wd, "gt_rgb"),
                  gt_depth=os.path.join(wd, "gt_depth")),
        measurement=measurement,
    )
    cfg_path = os.path.join(wd, "toy_demo_config.yaml")
    with open(cfg_path, "w") as f:
        yaml.dump(cfg, f)

    from osmosis_tpu.pipelines import run_restoration

    out = run_restoration(cfg_path)
    print(f"run dir: {out}", file=sys.stderr)

    # score with the shipped evaluator (PSNR + gaussian-window SSIM)
    from tools.evaluate import evaluate_dirs

    scores = evaluate_dirs(
        os.path.join(out, "single_images", "rgb"),
        os.path.join(wd, "gt_rgb"), resize_gt=args.size,
    )
    corr, n_pos, corrs = depth_corr_dirs(
        os.path.join(out, "single_images", "depth_raw"),
        os.path.join(wd, "gt_depth"), args.size,
    )
    report = {
        "operator": args.operator,
        "scenes": args.scenes,
        "global_N": args.global_N,
        "psnr_restored": round(scores["psnr"], 2),
        "ssim_restored": round(scores["ssim"], 4),
        "depth_corr": round(corr, 3),
        "depth_corr_positive": f"{n_pos}/{args.scenes}",
        "run_dir": out,
    }
    if not rgb_guidance:
        # in rgb_guidance mode the input IS the GT (PSNR would be inf and
        # "gain" meaningless); the metrics of interest are measurement
        # fidelity (psnr_restored vs the clean input) + depth-for-free corr
        degraded = evaluate_dirs(
            os.path.join(wd, "input"),
            os.path.join(wd, "gt_rgb"), resize_gt=args.size,
        )
        report.update({
            "psnr_degraded": round(degraded["psnr"], 2),
            "psnr_gain_db": round(scores["psnr"] - degraded["psnr"], 2),
            "ssim_degraded": round(degraded["ssim"], 4),
        })
    print(json.dumps(report))


if __name__ == "__main__":
    main()
