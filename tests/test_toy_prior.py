"""Toy-prior training machinery: scene generator statistics and a short
CPU training run whose loss must drop (the full on-device training +
end-to-end quality validation lives in tools/train_toy_prior.py +
tools/validate_toy_e2e.py and runs on the chip — see VALIDATION.md)."""

import importlib.util
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

_spec = importlib.util.spec_from_file_location(
    "train_toy_prior",
    os.path.join(os.path.dirname(__file__), "..", "tools", "train_toy_prior.py"),
)
ttp = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(ttp)


def test_scene_generator_stats():
    x = ttp.synth_scene_batch(jax.random.key(0), 8, 32)
    assert x.shape == (8, 32, 32, 4)
    a = np.asarray(x)
    assert a.min() >= -1.0 and a.max() <= 1.0
    # smooth fields: neighboring pixels correlate strongly
    d = np.abs(a[:, 1:, :, :] - a[:, :-1, :, :]).mean()
    assert d < 0.1, f"scenes not smooth (mean |grad| {d})"
    # scenes differ across batch and keys
    assert np.abs(a[0] - a[1]).mean() > 0.05
    y = np.asarray(ttp.synth_scene_batch(jax.random.key(1), 8, 32))
    assert np.abs(a - y).mean() > 0.05
    # depth correlates with luminance by construction
    lum = a[..., :3].mean(-1).ravel()
    corr = np.corrcoef(lum, a[..., 3].ravel())[0, 1]
    assert corr > 0.03  # weak by design: depth has a dominant independent component


def test_short_training_reduces_loss():
    import optax

    from osmosis_tpu.diffusion.schedules import make_schedule
    from osmosis_tpu.models import UNetConfig, UNetModel

    size, T = 16, 100
    cfg = UNetConfig(
        image_size=size, in_channels=4, out_channels=8, model_channels=32,
        num_res_blocks=1, attention_resolutions=(4,), channel_mult=(1, 2),
        num_head_channels=16, use_scale_shift_norm=True, resblock_updown=True,
    )
    model = UNetModel(cfg)
    params = model.init(jax.random.key(0), jnp.zeros((1, size, size, 4)),
                        jnp.zeros((1,)))
    consts = make_schedule("linear", T).device_constants()
    sab = jnp.asarray(consts["sqrt_alphas_cumprod"])
    s1m = jnp.asarray(consts["sqrt_one_minus_alphas_cumprod"])
    tx = optax.adam(1e-3)
    st = tx.init(params)

    def loss_fn(p, key):
        kb, kt, ke = jax.random.split(key, 3)
        x0 = ttp.synth_scene_batch(kb, 16, size)
        t = jax.random.randint(kt, (16,), 0, T)
        eps = jax.random.normal(ke, x0.shape)
        xt = sab[t][:, None, None, None] * x0 + s1m[t][:, None, None, None] * eps
        return jnp.mean((model.apply(p, xt, t.astype(jnp.float32))[..., :4] - eps) ** 2)

    @jax.jit
    def step(p, s, key):
        l, g = jax.value_and_grad(loss_fn)(p, key)
        u, s = tx.update(g, s, p)
        return optax.apply_updates(p, u), s, l

    key = jax.random.key(1)
    losses = []
    for i in range(30):
        key, sub = jax.random.split(key)
        params, st, l = step(params, st, sub)
        losses.append(float(l))
    first = np.mean(losses[:5])
    last = np.mean(losses[-5:])
    assert last < 0.8 * first, f"no learning: {first:.3f} -> {last:.3f}"
    assert np.isfinite(losses).all()


def test_prior_health_stats():
    """tools/check_prior_stats.stats: correlation/amplitude summaries used
    by the trainer's end-of-run health check."""
    _s = importlib.util.spec_from_file_location(
        "check_prior_stats",
        os.path.join(os.path.dirname(__file__), "..", "tools",
                     "check_prior_stats.py"),
    )
    cps = importlib.util.module_from_spec(_s)
    _s.loader.exec_module(cps)

    rng = np.random.default_rng(0)
    rgb = rng.uniform(-0.5, 0.5, (2, 16, 16, 3)).astype(np.float32)
    lum = rgb.mean(axis=-1, keepdims=True)
    # depth == luminance -> corr 1
    x = np.concatenate([rgb, lum], axis=-1)
    s = cps.stats(x)
    assert s["lum_depth_corr"] == 1.0
    assert 0 < s["rgb_std"] < 0.5 and s["tv"] > 0
    # anti-correlated depth -> corr -1
    s2 = cps.stats(np.concatenate([rgb, -lum], axis=-1))
    assert s2["lum_depth_corr"] == -1.0
    # constant image -> zero-variance guard, no NaN
    s3 = cps.stats(np.zeros((1, 8, 8, 4), np.float32))
    assert s3["lum_depth_corr"] == 0.0 and s3["tv"] == 0.0


def test_eps_bias_table_tiny():
    """tools/check_prior_stats.eps_bias_table: per-t accuracy probe runs on
    a tiny random-init prior (CPU) and reports sane, finite diagnostics."""
    _s = importlib.util.spec_from_file_location(
        "check_prior_stats",
        os.path.join(os.path.dirname(__file__), "..", "tools",
                     "check_prior_stats.py"),
    )
    cps = importlib.util.module_from_spec(_s)
    _s.loader.exec_module(cps)

    from osmosis_tpu.models import UNetModel

    cfg = ttp.toy_unet_config(16, 32, "toy")
    model = UNetModel(cfg)
    params = jax.jit(model.init)(
        jax.random.key(0), jnp.zeros((1, 16, 16, 4)), jnp.zeros((1,))
    )
    rows = cps.eps_bias_table(params, cfg, size=16, batch=2, ts=(100, 900))
    assert [r["t"] for r in rows] == [100, 900]
    for r in rows:
        for k in ("proj", "rel", "x0hat_rgb_std", "x0hat_depth_std",
                  "eps_mean_bias_rgb", "eps_mean_bias_depth"):
            assert np.isfinite(r[k]), (k, r)
    # random weights: eps_hat is ~uncorrelated with eps -> proj near 0,
    # rel near 1 (both within generous slack)
    assert abs(rows[0]["proj"]) < 0.5
    assert 0.5 < rows[0]["rel"] < 2.0


def test_trajectory_table_tiny():
    """tools/check_prior_stats.trajectory_table: on-chain amplitude stats
    run on a tiny random-init prior (CPU), rows in recording order."""
    _s = importlib.util.spec_from_file_location(
        "check_prior_stats",
        os.path.join(os.path.dirname(__file__), "..", "tools",
                     "check_prior_stats.py"),
    )
    cps = importlib.util.module_from_spec(_s)
    _s.loader.exec_module(cps)

    from osmosis_tpu.models import UNetModel

    cfg = ttp.toy_unet_config(16, 32, "toy")
    model = UNetModel(cfg)
    params = jax.jit(model.init)(
        jax.random.key(0), jnp.zeros((1, 16, 16, 4)), jnp.zeros((1,))
    )
    rows = cps.trajectory_table(params, cfg, size=16, n=1, ts=(999, 500, 0))
    assert [r["t"] for r in rows] == [999, 500, 0]
    for r in rows:
        for k in ("xt_std", "x0hat_rgb_std", "x0hat_depth_std", "x0hat_rgb_mean"):
            assert np.isfinite(r[k]), (k, r)
    # chain starts at pure noise: x_999 must be ~N(0,1)
    assert 0.8 < rows[0]["xt_std"] < 1.2


def test_trainer_warm_start(tmp_path, monkeypatch):
    """train_toy_prior --init-from: a short CPU run saves a checkpoint and a
    continuation run loads it (resume-after-crash path)."""
    out = str(tmp_path / "p.msgpack")
    base = ["train_toy_prior.py", "--steps", "2", "--chunk", "1",
            "--size", "16", "--channels", "32", "--batch", "2", "--T", "100",
            "--health-check", "0", "--out", out]
    monkeypatch.setattr(sys, "argv", base)
    ttp.main()
    assert os.path.exists(out)
    raw = out.replace(".msgpack", "_raw.msgpack")
    assert os.path.exists(raw)
    monkeypatch.setattr(sys, "argv", base + ["--init-from", raw, "--seed", "9"])
    ttp.main()  # must load, train one more chunk, and re-save
    assert os.path.exists(out)
