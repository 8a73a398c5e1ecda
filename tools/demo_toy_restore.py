#!/usr/bin/env python
"""One-command PRODUCT-PATH quality demo with the learned toy prior.

tools/validate_toy_e2e.py measures restoration through the library API;
this script proves the SHIPPED pipeline does it end to end: it synthesizes
held-out RGBD scenes, degrades them through the underwater physical model
with known water parameters, writes real PNG datasets (input + gt_rgb +
uint16 gt_depth — the simulation-preset layout, data.py:73-109 semantics),
writes a config using only the public YAML surface (msgpack checkpoint,
adam phi optimizer, fixed_small variance for the untrained variance head),
runs `run_restoration` — the same entry `osmosis_sampling.py` calls — and
scores the run-dir outputs with tools/evaluate.py's PSNR/SSIM.

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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", default="checkpoints/toy_prior64.msgpack")
    ap.add_argument("--scenes", type=int, default=4)
    ap.add_argument("--size", type=int, default=64)
    ap.add_argument("--channels", type=int, default=96)
    ap.add_argument("--workdir", default="/tmp/osmosis_toy_demo")
    ap.add_argument("--seed", type=int, default=123)
    ap.add_argument("--global-N", type=int, default=1,
                    help="GibbsDDRM full-chain restarts with phi warm-start")
    ap.add_argument("--global-opt-reset", action="store_true",
                    help="reset phi optimizer moments between global chains "
                         "(extension; phi itself still warm-starts)")
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

    import jax
    import jax.numpy as jnp
    import yaml
    from PIL import Image

    from osmosis_tpu.guidance.operators import get_operator
    from tools.train_toy_prior import synth_scene_batch

    wd = args.workdir
    for sub in ("input", "gt_rgb", "gt_depth"):
        os.makedirs(os.path.join(wd, sub), exist_ok=True)

    # known water parameters (same regime as validate_toy_e2e)
    phi_true = {
        "phi_a": jnp.array([[0.55, 0.45, 0.35]]),
        "phi_b": jnp.array([[0.5, 0.4, 0.35]]),
        "phi_inf": jnp.array([[0.18, 0.32, 0.45]]),
    }
    op = get_operator(
        "underwater_physical_revised", batch_size=1, optimizer="sgd",
        depth_type="gamma", value="1.4,1.4,1",
        phi_a="0.7,0.6,0.5", phi_b="0.6,0.5,0.45", phi_inf="0.14,0.29,0.49",
    )

    key = jax.random.key(args.seed)
    for i in range(args.scenes):
        kk = jax.random.fold_in(key, i)
        scene = synth_scene_batch(jax.random.fold_in(kk, 0), 1, args.size)
        rgb01 = np.clip(0.5 * (np.asarray(scene[..., :3])[0] + 1.0), 0, 1)
        depth01 = np.clip(0.5 * (np.asarray(scene[..., 3])[0] + 1.0), 0, 1)
        y01 = np.clip(np.asarray(op.forward(phi_true, scene))[0], 0, 1)
        Image.fromarray((y01 * 255).astype(np.uint8)).save(
            os.path.join(wd, "input", f"scene_{i}.png"))
        Image.fromarray((rgb01 * 255).astype(np.uint8)).save(
            os.path.join(wd, "gt_rgb", f"scene_{i}.png"))
        Image.fromarray((depth01 * 65535).astype(np.uint16)).save(
            os.path.join(wd, "gt_depth", f"scene_{i}.png"))

    # --oracle-phi: init at the exact degradation parameters, frozen
    if args.oracle_phi:
        op_init = dict(
            phi_a="0.55,0.45,0.35", phi_b="0.5,0.4,0.35",
            phi_inf="0.18,0.32,0.45", learn=bool(args.oracle_learn),
        )
    else:
        op_init = dict(
            phi_a="0.7,0.6,0.5", phi_b="0.6,0.5,0.45",
            phi_inf="0.14,0.29,0.49", learn=True,
        )

    cfg = dict(
        save_dir=os.path.join(wd, "results"),
        best_of=args.best_of, phi_jitter=args.phi_jitter,
        accept_loss=args.accept_loss,
        degamma_input=False, manual_seed=args.seed, rgb_guidance=False,
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
        conditioning=dict(method="osmosis", params=dict(
            loss_function="norm", loss_weight="depth",
            weight_function="gamma,1.4,1.4,1", scale="4,4,4,2",
            gradient_x_prev=True, gradient_clip="True,0.01",
        )),
        aux_loss=dict(aux_loss=dict(avrg_loss=0.5, val_loss=20)),
        data=dict(batch_size=1, name="toy_demo",
                  root=os.path.join(wd, "input"), stop_after=-1,
                  ground_truth=True,
                  gt_rgb=os.path.join(wd, "gt_rgb"),
                  gt_depth=os.path.join(wd, "gt_depth")),
        measurement=dict(
            operator=dict(
                name="underwater_physical_revised", optimizer="adam",
                depth_type="gamma", value="1.4,1.4,1",
                phi_a=op_init["phi_a"], phi_a_eta=1e-3,
                phi_a_learn_flag=op_init["learn"],
                phi_b=op_init["phi_b"], phi_b_eta=1e-3,
                phi_b_learn_flag=op_init["learn"],
                phi_inf=op_init["phi_inf"], phi_inf_eta=1e-3,
                phi_inf_learn_flag=op_init["learn"],
            ),
            noise=dict(name="clean"),
        ),
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
    degraded = evaluate_dirs(
        os.path.join(wd, "input"),
        os.path.join(wd, "gt_rgb"), resize_gt=args.size,
    )
    print(json.dumps({
        "scenes": args.scenes,
        "global_N": args.global_N,
        "psnr_degraded": round(degraded["psnr"], 2),
        "psnr_restored": round(scores["psnr"], 2),
        "psnr_gain_db": round(scores["psnr"] - degraded["psnr"], 2),
        "ssim_degraded": round(degraded["ssim"], 4),
        "ssim_restored": round(scores["ssim"], 4),
        "run_dir": out,
    }))


if __name__ == "__main__":
    main()
