"""Fast-sampling preset (configs/osmosis_sample_fast_config.yaml):
structural validation of the <10 s/image recipe.

Quality parity needs the real checkpoint (tools/validate_checkpoint.py);
what CAN be pinned today: the preset parses through the production config
path, the ddim200 respacing yields the documented chain, and the full
guided machinery still recovers known water parameters on a RESPACED chain
with the preset's compensated (5x) phi learning rates.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np

from osmosis_tpu import config as C
from osmosis_tpu.diffusion import make_schedule
from osmosis_tpu.diffusion.guided import GuidanceConfig, guided_sample_loop
from osmosis_tpu.diffusion.sampler import SamplerConfig
from osmosis_tpu.guidance.operators import get_operator

CFG = os.path.join(os.path.dirname(__file__), "..", "configs",
                   "osmosis_sample_fast_config.yaml")
HW = 16


def test_fast_preset_parses_and_respaces():
    args = C.arguments_from_file(CFG)
    d = args.diffusion
    assert d["timestep_respacing"] == "ddim200"
    sch = make_schedule(
        noise_schedule=d["noise_schedule"], steps=d["steps"],
        timestep_respacing=d["timestep_respacing"],
        rescale_timesteps=d["rescale_timesteps"],
    )
    assert sch.num_timesteps == 200  # 5x fewer UNet passes
    mt = np.asarray(sch.device_constants()["model_timesteps"])
    assert mt.shape == (200,) and mt[0] == 0 and mt[-1] <= 999
    assert np.all(np.diff(mt) > 0)
    # compensated phi learning rates: 5x the 1000-step preset's 1e-5
    op = args.measurement["operator"]
    assert float(op["phi_a_eta"]) == 5.0e-5
    assert args.unet_model["use_fp16"] is True  # bf16 torso on TPU


def test_bench_e2e_uses_shared_protocol_and_is_cwd_independent(tmp_path,
                                                              monkeypatch):
    """bench.py's north-star line and tools/bench_presets.py must share ONE
    measurement protocol (review r4): bench_fast_preset_e2e delegates to
    measure_preset_e2e with a repo-root-anchored config path, so the second
    JSON line survives running bench.py from any cwd."""
    import bench
    from tools import bench_presets

    seen = {}

    def fake_measure(config_path, respacing=None, n_images=3, tag=""):
        seen.update(config_path=config_path, respacing=respacing,
                    n_images=n_images)
        return 1.23, [9.9, 1.23], 11.1, True

    monkeypatch.setattr(bench_presets, "measure_preset_e2e", fake_measure)
    monkeypatch.chdir(tmp_path)  # not the repo root
    steady, secs, chain_finite = bench.bench_fast_preset_e2e(n_images=2)
    assert steady == 1.23 and secs == [9.9, 1.23] and chain_finite is True
    assert os.path.isabs(seen["config_path"]) and os.path.exists(
        seen["config_path"])
    assert seen["config_path"].endswith("osmosis_sample_fast_config.yaml")
    assert seen["respacing"] is None and seen["n_images"] == 2


def test_phi_recovery_on_respaced_chain():
    """The oracle-denoiser phi-recovery experiment of test_phi_recovery.py,
    on a 5x-respaced chain with 5x etas — the fast preset's structure."""
    T_orig, T_kept = 240, 60

    def smooth(key, shape):
        small = jax.random.uniform(key, (4, 4, shape[-1]), minval=-0.8, maxval=0.8)
        return jax.image.resize(small, shape, method="bilinear")

    x0_true = smooth(jax.random.key(0), (HW, HW, 4))[None]
    phi_true = {
        "phi_a": jnp.array([[0.9, 0.7, 0.6]]),
        "phi_b": jnp.array([[0.7, 0.6, 0.5]]),
        "phi_inf": jnp.array([[0.2, 0.35, 0.5]]),
    }
    operator = get_operator(
        "underwater_physical_revised", batch_size=1,
        optimizer="sgd", depth_type="original", value="1.4,1.4,1",
        phi_a="1.1,0.95,0.95", phi_b="0.95,0.8,0.8", phi_inf="0.14,0.29,0.49",
        phi_a_eta=8e-4, phi_b_eta=8e-4, phi_inf_eta=8e-4,  # 4x the dense-chain rate
    )
    y = 2.0 * operator.forward(phi_true, x0_true) - 1.0

    sch = make_schedule("linear", T_orig, timestep_respacing=f"ddim{T_kept}")
    assert sch.num_timesteps == T_kept
    consts = sch.device_constants()
    sa = jnp.asarray(consts["sqrt_alphas_cumprod"])
    s1m = jnp.asarray(consts["sqrt_one_minus_alphas_cumprod"])
    tmap = jnp.asarray(consts["model_timesteps"])

    def oracle_model(x, t_float):
        # model timestep (original scale) -> respaced index
        idx = jnp.clip(jnp.searchsorted(tmap, t_float[0]), 0, T_kept - 1)
        eps = (x - sa[idx] * x0_true) / s1m[idx]
        return jnp.concatenate([eps, jnp.zeros_like(eps)], axis=-1)

    pattern = dict(
        pattern="pcgs", update_start=1.0, update_end=0, global_N=1, local_M=1,
        s_start=1, s_end=0, n_iter=10, start_guidance=1, stop_guidance=0,
    )
    gcfg = GuidanceConfig.from_config(
        "osmosis",
        dict(loss_function="norm", loss_weight="none",
             weight_function="gamma,1.4,1.4,1", scale="0.5,0.5,0.5,0.5",
             gradient_x_prev=True, gradient_clip="True,0.005"),
        pattern, None,
    )
    res = guided_sample_loop(
        oracle_model, sch, jax.random.normal(jax.random.key(1), (1, HW, HW, 4)),
        y, jax.random.key(2), operator, gcfg,
        SamplerConfig(clip_denoised=True), sample_pattern=pattern,
        deterministic=True,
    )

    assert np.isfinite(np.asarray(res.sample)).all()
    init_phi = {k: jnp.asarray(v) for k, v in operator.phi_init().items()}
    d_init = np.abs(np.asarray(init_phi["phi_a"]) - np.asarray(phi_true["phi_a"])).mean()
    d_final = np.abs(np.asarray(res.phi["phi_a"]) - np.asarray(phi_true["phi_a"])).mean()
    assert d_final < d_init * 0.9, f"phi_a: {d_init:.4f} -> {d_final:.4f}"

    def forward_err(phi):
        pred = 2.0 * operator.forward(phi, x0_true) - 1.0
        return float(jnp.sqrt(jnp.sum((y - pred) ** 2)))

    assert forward_err(res.phi) < 0.35 * forward_err(init_phi)
    sep = np.asarray(res.sep_loss)[:, 0]
    assert sep[-1] < 0.35 * sep.max()
    np.testing.assert_allclose(
        np.asarray(res.pred_xstart), np.asarray(x0_true), atol=1e-2
    )


def test_turbo_preset_parses_and_respaces():
    """configs/osmosis_sample_turbo_config.yaml: the ddim100 latency preset
    (e2e s/image: docs/data/preset_e2e.jsonl point turbo_100) with 10x-compensated phi etas."""
    cfg = os.path.join(os.path.dirname(__file__), "..", "configs",
                       "osmosis_sample_turbo_config.yaml")
    args = C.arguments_from_file(cfg)
    d = args.diffusion
    assert d["timestep_respacing"] == "ddim100"
    sch = make_schedule(
        noise_schedule=d["noise_schedule"], steps=d["steps"],
        timestep_respacing=d["timestep_respacing"],
        rescale_timesteps=d["rescale_timesteps"],
    )
    assert sch.num_timesteps == 100
    mt = np.asarray(sch.device_constants()["model_timesteps"])
    assert mt.shape == (100,) and mt[0] == 0 and np.all(np.diff(mt) > 0)
    op = args.measurement["operator"]
    for k in ("phi_a_eta", "phi_b_eta", "phi_inf_eta"):
        assert float(op[k]) == 1.0e-4  # 10x the 1000-step preset
    assert args.unet_model["use_fp16"] is True
    # every run-level key the pipeline reads unconditionally must be present
    # (a dropped save_dir crashes the CLI before sampling)
    for k in ("save_dir", "manual_seed", "rgb_guidance", "save_singles",
              "save_grids", "record_process", "record_every"):
        assert hasattr(args, k), f"turbo preset missing run key {k}"


def test_x0_preset_parses():
    """configs/osmosis_sample_x0_config.yaml: the x0-gradient preset (66.1
    steps/s measured, PERF.md round 7) — halved guidance scale per the
    VALIDATION.md 3e law, gradient_x_prev False, ddim200."""
    cfg = os.path.join(os.path.dirname(__file__), "..", "configs",
                       "osmosis_sample_x0_config.yaml")
    args = C.arguments_from_file(cfg)
    assert args.diffusion["timestep_respacing"] == "ddim200"
    p = args.conditioning["params"]
    assert p["gradient_x_prev"] is False
    assert p["scale"] == "3.5,3.5,3.5,0.45"  # halved fast-preset scale
    gcfg = GuidanceConfig.from_config(
        args.conditioning["method"], p, args.sample_pattern, args.aux_loss)
    assert gcfg.gradient_x_prev is False and gcfg.x_prev_every == 1
    op = args.measurement["operator"]
    assert float(op["phi_a_eta"]) == 5.0e-5  # 5x-compensated, as fast
    for k in ("save_dir", "manual_seed", "rgb_guidance", "save_singles",
              "save_grids", "record_process", "record_every"):
        assert hasattr(args, k), f"x0 preset missing run key {k}"


def test_hybrid_preset_parses():
    """configs/osmosis_sample_hybrid_config.yaml: the k=4 hybrid gradient
    schedule preset (52.1 steps/s, PERF.md) — FULL fast-preset guidance
    scale, x_prev_every 4, ddim200 (respacing divisible by k so no
    epilogue block)."""
    cfg = os.path.join(os.path.dirname(__file__), "..", "configs",
                       "osmosis_sample_hybrid_config.yaml")
    args = C.arguments_from_file(cfg)
    assert args.diffusion["timestep_respacing"] == "ddim200"
    p = args.conditioning["params"]
    assert p["gradient_x_prev"] is True
    assert int(p["x_prev_every"]) == 4
    assert p["scale"] == "7,7,7,0.9"  # full fast-preset scale (not halved)
    gcfg = GuidanceConfig.from_config(
        args.conditioning["method"], p, args.sample_pattern, args.aux_loss)
    assert gcfg.x_prev_every == 4 and gcfg.gradient_x_prev is True
    assert 200 % gcfg.x_prev_every == 0
    op = args.measurement["operator"]
    for k in ("phi_a_eta", "phi_b_eta", "phi_inf_eta"):
        assert float(op[k]) == 5.0e-5
    for k in ("save_dir", "manual_seed", "rgb_guidance", "save_singles",
              "save_grids", "record_process", "record_every"):
        assert hasattr(args, k), f"hybrid preset missing run key {k}"


def test_hybrid_turbo_preset_parses():
    """configs/osmosis_sample_hybrid_turbo_config.yaml: hybrid k=4 at
    ddim25 — the grid's measured-safest 25-step operating point (3a-ii:
    +6.36 dB where full-grad collapses to +1.42 and x0 fails the depth
    gate; VERDICT r4 #3). 25 % 4 = 1 exercises the hybrid schedule's
    epilogue block, so the schedule must build (not merely parse)."""
    cfg = os.path.join(os.path.dirname(__file__), "..", "configs",
                       "osmosis_sample_hybrid_turbo_config.yaml")
    args = C.arguments_from_file(cfg)
    assert args.diffusion["timestep_respacing"] == "ddim25"
    p = args.conditioning["params"]
    assert p["gradient_x_prev"] is True
    assert int(p["x_prev_every"]) == 4
    assert p["scale"] == "7,7,7,0.9"  # full scale — the hybrid recipe
    gcfg = GuidanceConfig.from_config(
        args.conditioning["method"], p, args.sample_pattern, args.aux_loss)
    assert gcfg.x_prev_every == 4 and gcfg.gradient_x_prev is True
    sch = make_schedule(
        noise_schedule=args.diffusion["noise_schedule"],
        steps=args.diffusion["steps"],
        timestep_respacing=args.diffusion["timestep_respacing"],
        rescale_timesteps=args.diffusion["rescale_timesteps"],
    )
    assert sch.num_timesteps == 25
    assert sch.num_timesteps % gcfg.x_prev_every == 1  # epilogue block path
    op = args.measurement["operator"]
    for k in ("phi_a_eta", "phi_b_eta", "phi_inf_eta"):
        assert float(op[k]) == 5.0e-5  # ddim200-tuned, no extrapolation
    # 25-step chain: the shipped record_every must not exceed the chain
    assert args.record_every <= 25
    for k in ("save_dir", "manual_seed", "rgb_guidance", "save_singles",
              "save_grids", "record_process", "record_every"):
        assert hasattr(args, k), f"hybrid-turbo preset missing run key {k}"


def test_x0_turbo_preset_parses():
    """configs/osmosis_sample_x0_turbo_config.yaml: the x0 mode at ddim100
    (e2e s/image: docs/data/preset_e2e.jsonl point x0_100) — the x0
    preset's knobs (halved scale, gradient_x_prev False, UN-doubled phi
    etas per the 3a-ii no-compensation finding) at the turbo step count."""
    cfg = os.path.join(os.path.dirname(__file__), "..", "configs",
                       "osmosis_sample_x0_turbo_config.yaml")
    args = C.arguments_from_file(cfg)
    assert args.diffusion["timestep_respacing"] == "ddim100"
    p = args.conditioning["params"]
    assert p["gradient_x_prev"] is False
    assert p["scale"] == "3.5,3.5,3.5,0.45"  # halved, same as the x0 preset
    gcfg = GuidanceConfig.from_config(
        args.conditioning["method"], p, args.sample_pattern, args.aux_loss)
    assert gcfg.gradient_x_prev is False and gcfg.x_prev_every == 1
    sch = make_schedule(
        noise_schedule=args.diffusion["noise_schedule"],
        steps=args.diffusion["steps"],
        timestep_respacing=args.diffusion["timestep_respacing"],
        rescale_timesteps=args.diffusion["rescale_timesteps"],
    )
    assert sch.num_timesteps == 100
    op = args.measurement["operator"]
    for k in ("phi_a_eta", "phi_b_eta", "phi_inf_eta"):
        assert float(op[k]) == 5.0e-5  # kept at the ddim200 value (3a-ii)
    for k in ("save_dir", "manual_seed", "rgb_guidance", "save_singles",
              "save_grids", "record_process", "record_every"):
        assert hasattr(args, k), f"x0-turbo preset missing run key {k}"
