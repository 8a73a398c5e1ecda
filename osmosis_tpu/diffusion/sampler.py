"""Unified diffusion sampler: one jit-compiled ``lax.scan`` over timesteps.

Replaces BOTH reference samplers with a single engine (SURVEY.md section 1):
  * the full-featured SpacedDiffusion/DDPM/DDIM stack
    (guided_diffusion/gaussian_diffusion.py:65-535,
    guided_diffusion/posterior_mean_variance.py)
  * the minimal RGBD-prior DDPM (osmosis_utils/diffusion.py:19-130), which is
    exactly this engine with model_var_type='fixed_small', no guidance, and a
    +1 model-timestep offset (diffusion.py:95 feeds t in 1..T where the guided
    loop feeds idx in T-1..0).

TPU design: the reverse loop is a ``lax.scan`` whose carry is (x, key); all
per-timestep coefficients are fp32 device constants gathered by index inside
the scan; process snapshots land in a statically-sized buffer via masked
dynamic_update_slice (no host sync in the hot loop).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..registry import SAMPLERS
from .schedules import DiffusionSchedule

ModelFn = Callable[[jax.Array, jax.Array], jax.Array]  # (x_nhwc, t[B]) -> out


@dataclasses.dataclass(frozen=True)
class SamplerConfig:
    """create_sampler surface (gaussian_diffusion.py:38-62)."""

    sampler: str = "ddpm"  # 'ddpm' | 'ddim'
    model_mean_type: str = "epsilon"  # 'epsilon' | 'start_x' | 'previous_x'
    model_var_type: str = "learned_range"
    # 'learned_range' | 'learned' | 'fixed_small' | 'fixed_large'
    dynamic_threshold: bool = False
    clip_denoised: bool = False
    ddim_eta: float = 0.0


SAMPLERS.register("ddpm")("ddpm")
SAMPLERS.register("ddim")("ddim")
# 'ltsp': Lie-Trotter splitting with a PLMS4 diffusion substep for GUIDED
# sampling (arXiv 2301.11558) — handled by diffusion/guided.py; beyond the
# reference's surface (its samplers are ddpm/ddim only)
SAMPLERS.register("ltsp")("ltsp")


# ---------------------------------------------------------------------------
# x0-hat / mean / variance processors (posterior_mean_variance.py)
# ---------------------------------------------------------------------------

def dynamic_thresholding(x: jax.Array, s: float = 0.95) -> jax.Array:
    """util/img_utils.py:9-15 (global quantile scaling then clip)."""
    scaling = jnp.quantile(jnp.abs(x), s)
    return jnp.clip(x * scaling, -1.0, 1.0)


def process_xstart(x: jax.Array, cfg: SamplerConfig) -> jax.Array:
    """posterior_mean_variance.py:43-50."""
    if cfg.dynamic_threshold:
        x = dynamic_thresholding(x, s=0.98)
    if cfg.clip_denoised:
        x = jnp.clip(x, -1.0, 1.0)
    return x


def _g(consts: Dict[str, jax.Array], name: str, t: jax.Array) -> jax.Array:
    """Gather a per-timestep scalar and shape it for NHWC broadcast
    (extract_and_expand, gaussian_diffusion.py:593-597)."""
    return consts[name][t].reshape(-1, 1, 1, 1)


def predict_xstart(
    x: jax.Array, t: jax.Array, model_output: jax.Array,
    consts: Dict[str, jax.Array], cfg: SamplerConfig,
) -> jax.Array:
    """Mean-processor x0 prediction (posterior_mean_variance.py:53-136)."""
    if cfg.model_mean_type == "epsilon":
        return (
            _g(consts, "sqrt_recip_alphas_cumprod", t) * x
            - _g(consts, "sqrt_recipm1_alphas_cumprod", t) * model_output
        )
    if cfg.model_mean_type == "start_x":
        return model_output
    if cfg.model_mean_type == "previous_x":
        c1 = _g(consts, "posterior_mean_coef1", t)
        c2 = _g(consts, "posterior_mean_coef2", t)
        return model_output / c1 - (c2 / c1) * x
    raise NotImplementedError(cfg.model_mean_type)


def posterior_mean(
    x0: jax.Array, x: jax.Array, t: jax.Array, consts: Dict[str, jax.Array]
) -> jax.Array:
    """q(x_{t-1} | x_t, x_0) mean (gaussian_diffusion.py:157-167)."""
    return (
        _g(consts, "posterior_mean_coef1", t) * x0
        + _g(consts, "posterior_mean_coef2", t) * x
    )


def model_log_variance(
    var_values: jax.Array, t: jax.Array, consts: Dict[str, jax.Array], cfg: SamplerConfig
) -> jax.Array:
    """Variance processors (posterior_mean_variance.py:172-258), fp32."""
    v = var_values.astype(jnp.float32)
    if cfg.model_var_type == "learned_range":
        min_log = _g(consts, "posterior_log_variance_clipped", t)
        max_log = _g(consts, "log_betas", t)
        frac = (v + 1.0) / 2.0
        return frac * max_log + (1 - frac) * min_log
    if cfg.model_var_type == "learned":
        return v
    if cfg.model_var_type == "fixed_small":
        # NOTE: fixed_small uses the UNCLIPPED log variance
        # (posterior_mean_variance.py:183-190); -inf at t=0 is harmless
        # because no noise is added at t=0.
        return jnp.broadcast_to(
            jnp.log(consts["posterior_variance"][t]).reshape(-1, 1, 1, 1), v.shape
        )
    if cfg.model_var_type == "fixed_large":
        return jnp.broadcast_to(
            _g(consts, "fixed_large_log_variance", t), v.shape
        )
    raise NotImplementedError(cfg.model_var_type)


def split_model_output(model_output: jax.Array, x_channels: int):
    """Split eps / learned-variance channels (gaussian_diffusion.py:348-355)."""
    if model_output.shape[-1] == 2 * x_channels:
        return model_output[..., :x_channels], model_output[..., x_channels:]
    return model_output, model_output


def p_mean_variance(
    model_fn: ModelFn,
    x: jax.Array,
    t: jax.Array,
    consts: Dict[str, jax.Array],
    cfg: SamplerConfig,
    timestep_offset: float = 0.0,
) -> Dict[str, jax.Array]:
    """gaussian_diffusion.py:345-365. ``t`` is the respaced index [B]."""
    model_t = consts["model_timesteps"][t] + timestep_offset
    model_output = model_fn(x, model_t)
    eps, var_values = split_model_output(model_output, x.shape[-1])
    x0 = process_xstart(predict_xstart(x, t, eps, consts, cfg), cfg)
    mean = posterior_mean(x0, x, t, consts)
    log_variance = model_log_variance(var_values, t, consts, cfg)
    return {"mean": mean, "log_variance": log_variance, "pred_xstart": x0}


# ---------------------------------------------------------------------------
# single sampling steps
# ---------------------------------------------------------------------------

def ddpm_noise_step(
    out: Dict[str, jax.Array], t: jax.Array, key: jax.Array
) -> jax.Array:
    """mean + exp(0.5 logvar) z, no noise at t==0 (gaussian_diffusion.py:494-502)."""
    z = jax.random.normal(key, out["mean"].shape, dtype=out["mean"].dtype)
    nonzero = (t > 0).astype(out["mean"].dtype).reshape(-1, 1, 1, 1)
    return out["mean"] + nonzero * jnp.exp(0.5 * out["log_variance"]) * z


def ddim_step(
    x: jax.Array,
    out: Dict[str, jax.Array],
    t: jax.Array,
    key: jax.Array,
    consts: Dict[str, jax.Array],
    eta: float,
) -> jax.Array:
    """DDIM eq. 12 (gaussian_diffusion.py:505-535)."""
    x0 = out["pred_xstart"]
    eps = (
        _g(consts, "sqrt_recip_alphas_cumprod", t) * x - x0
    ) / _g(consts, "sqrt_recipm1_alphas_cumprod", t)
    ab = _g(consts, "alphas_cumprod", t)
    ab_prev = _g(consts, "alphas_cumprod_prev", t)
    sigma = (
        eta * jnp.sqrt((1 - ab_prev) / (1 - ab)) * jnp.sqrt(1 - ab / ab_prev)
    )
    mean_pred = x0 * jnp.sqrt(ab_prev) + jnp.sqrt(1 - ab_prev - sigma**2) * eps
    z = jax.random.normal(key, x.shape, dtype=x.dtype)
    nonzero = (t > 0).astype(x.dtype).reshape(-1, 1, 1, 1)
    return mean_pred + nonzero * sigma * z


# ---------------------------------------------------------------------------
# process recording inside scan
# ---------------------------------------------------------------------------

def record_steps_for(
    num_timesteps: int, record_every: int, extra: Sequence[int] = ()
) -> Tuple[int, ...]:
    """Timesteps whose x0-hat snapshot is kept, matching the reference's
    `(idx % record_every == 0) or idx == 0 or idx == 999`
    (gaussian_diffusion.py:309-310). Sorted descending = recording order."""
    steps = {t for t in range(num_timesteps) if t % record_every == 0}
    steps.add(0)
    steps.update(e for e in extra if 0 <= e < num_timesteps)
    return tuple(sorted(steps, reverse=True))


def make_slot_map(num_timesteps: int, record_steps: Sequence[int]) -> np.ndarray:
    slot = np.full((num_timesteps,), -1, dtype=np.int32)
    for i, t in enumerate(record_steps):
        slot[t] = i
    return slot


def record_update(buf: jax.Array, value: jax.Array, slot: jax.Array) -> jax.Array:
    """Masked write of `value` into snapshot slot `slot` (-1 = skip)."""
    do = slot >= 0
    idx = (jnp.maximum(slot, 0),) + (0,) * value.ndim
    new = jax.lax.dynamic_update_slice(buf, value[None], idx)
    return jnp.where(do, new, buf)


# ---------------------------------------------------------------------------
# unconditional sampling loop (prior path / no-guidance path)
# ---------------------------------------------------------------------------

def sample_loop(
    model_fn: ModelFn,
    schedule: DiffusionSchedule,
    x_init: jax.Array,
    key: jax.Array,
    cfg: SamplerConfig = SamplerConfig(),
    timestep_offset: float = 0.0,
    start_t: Optional[int] = None,
    num_steps: Optional[int] = None,
    record_every: Optional[int] = None,
    record_steps: Optional[Sequence[int]] = None,
):
    """Reverse diffusion without guidance.

    With defaults this is DDPM ancestral sampling over the full (respaced)
    chain. ``start_t``/``num_steps`` reproduce the minimal prior sampler's
    "last-N-steps" semantics (osmosis_utils/diffusion.py:74-80). Returns
    (x, snapshots dict or None). Snapshots hold x_t and x0-hat at the
    recording steps (gaussian_diffusion.py:309-326; diffusion.py:98-120).
    """
    T = schedule.num_timesteps
    start_t = T if start_t is None else start_t
    num_steps = start_t if num_steps is None else num_steps
    ts = np.arange(start_t - 1, start_t - num_steps - 1, -1, dtype=np.int32)

    consts = {k: jnp.asarray(v) for k, v in schedule.device_constants().items()}

    if record_steps is not None or record_every is not None:
        if record_steps is not None:
            rec_steps = tuple(sorted(set(record_steps), reverse=True))
        else:
            rec_steps = record_steps_for(T, record_every, extra=(T - 1,))
        slot_map = jnp.asarray(make_slot_map(T, rec_steps))
        n_slots = len(rec_steps)
        buf_xt = jnp.zeros((n_slots,) + x_init.shape, x_init.dtype)
        buf_x0 = jnp.zeros((n_slots,) + x_init.shape, x_init.dtype)
    else:
        rec_steps, slot_map, buf_xt, buf_x0 = (), None, None, None

    def step(carry, t):
        x, b_xt, b_x0 = carry
        tb = jnp.full((x.shape[0],), t, dtype=jnp.int32)
        out = p_mean_variance(model_fn, x, tb, consts, cfg, timestep_offset)
        k = jax.random.fold_in(key, t)
        if cfg.sampler == "ddim":
            x_next = ddim_step(x, out, tb, k, consts, cfg.ddim_eta)
        else:
            x_next = ddpm_noise_step(out, tb, k)
        if slot_map is not None:
            slot = slot_map[t]
            b_xt = record_update(b_xt, x, slot)
            b_x0 = record_update(b_x0, out["pred_xstart"], slot)
        return (x_next, b_xt, b_x0), None

    (x, buf_xt, buf_x0), _ = jax.lax.scan(
        step, (x_init, buf_xt, buf_x0), jnp.asarray(ts)
    )
    snapshots = None
    if slot_map is not None:
        snapshots = {"steps": rec_steps, "x_t": buf_xt, "x0_hat": buf_x0}
    return x, snapshots
