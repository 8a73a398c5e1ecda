"""Guided (DPS / osmosis) sampling: the WHOLE guided step in one XLA program.

The reference threads torch autograd through a Python loop
(gaussian_diffusion.py:179-340 + condition_methods.py:109-231): per timestep
1 UNet forward, an n_iter inner loop of phi-only backwards through the
closed-form physics operator, one joint backward through the UNet wrt
(x_prev, phi), a phi optimizer step, a clipped guidance update, then noise.

TPU-native design: the step compiles into a single ``lax.scan`` body —
``jax.vjp`` captures the UNet pullback once, the inner phi loop is a
``fori_loop`` of tiny fused physics gradients against a stop-gradient x0-hat
(the reference's graph-reuse trick, condition_methods.py:193-194), the pcgs
freeze/alternate/guidance windows are precomputed branch-free mask arrays
(osmosis_tpu.guidance.schedule_masks), and telemetry (per-step loss, phi
trajectories) rides out as scan outputs instead of host syncs.

Both conditioning methods are provided:
  * 'osmosis' — PosteriorSamplingOsmosis (condition_methods.py:61-231):
    posterior-mean update, guidance BEFORE noise injection
    (gaussian_diffusion.py:237-268)
  * 'ps' — vanilla DPS (condition_methods.py:234-251): p_sample (noise
    first), then guidance (gaussian_diffusion.py:232-233,299-306)
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import parse_gradient_clip, parse_scale, parse_weight_function
from ..guidance.losses import make_aux_loss_fn
from ..guidance.operators import Operator, convert_depth
from ..guidance.phi_optim import PhiOptimizer, make_phi_optimizer
from ..guidance.schedule_masks import pattern_masks
from .sampler import (
    ModelFn,
    SamplerConfig,
    ddim_step,
    ddpm_noise_step,
    make_slot_map,
    model_log_variance,
    p_mean_variance,
    posterior_mean,
    predict_xstart,
    process_xstart,
    record_steps_for,
    record_update,
    split_model_output,
)
from .schedules import DiffusionSchedule


from ..registry import CONDITIONERS

# conditioning-method registry — the same string surface as
# condition_methods.py:8-24; entries map method name → whether the sampler
# runs the osmosis-style (guidance before noise) or DPS-style (noise first)
# step. New methods register here.
CONDITIONERS.register("osmosis")("osmosis")
CONDITIONERS.register("ps")("ps")


@dataclasses.dataclass(frozen=True)
class GuidanceConfig:
    """conditioning.params + sample_pattern surface
    (condition_methods.py:63-107, configs/*.yaml)."""

    method: str = "osmosis"  # CONDITIONERS registry key: 'osmosis' | 'ps'
    scale: Tuple[float, ...] = (1.0,)
    # default False matches from_config and the reference
    # (condition_methods.py:75 — params.get('gradient_x_prev', False))
    gradient_x_prev: bool = False
    # hybrid gradient schedule (framework extension, no reference analog):
    # take the full x_prev gradient (UNet vjp) only every k-th chain step and
    # the cheap x0-hat gradient on the rest — applies to the 'osmosis'
    # ddpm/ddim/ltsp paths (requires gradient_x_prev: True) and the 'ps'
    # DPS path (no flag needed: ps always differentiates wrt x_prev in the
    # reference) —
    # interpolates between the full mode's quality and the x0 mode's ~2.1x
    # step rate (measured per-k numbers: PERF.md "hybrid gradient
    # schedule" section). 1 = every step full (exact reference
    # semantics). Keep small (2-8): the scan body statically unrolls k
    # substeps, so compile time grows with k.
    x_prev_every: int = 1
    # noise-model name the 'ps' conditioner branches on
    # (condition_methods.py:36-48: 'gaussian' | 'poisson', else NotImplemented)
    noiser_name: str = "gaussian"
    gradient_clip: bool = False
    gradient_clip_value: float = 0.0
    loss_function: str = "norm"  # 'norm' | 'mse'
    loss_weight: Optional[str] = None  # 'depth' | 'none'
    weight_function: Optional[str] = None  # e.g. "gamma,1.4,1.4,1"
    n_iter: int = 1
    aux_loss: Tuple[Tuple[str, float], ...] = ()

    @classmethod
    def from_config(cls, method: str, params: dict, sample_pattern: dict,
                    aux_loss_cfg: Optional[dict],
                    noiser_name: str = "gaussian") -> "GuidanceConfig":
        clip_on, clip_val = parse_gradient_clip(params.get("gradient_clip", "False"))
        aux = ()
        if aux_loss_cfg:
            inner = aux_loss_cfg.get("aux_loss") if "aux_loss" in aux_loss_cfg else aux_loss_cfg
            if inner:
                aux = tuple((k, float(v)) for k, v in inner.items())
        CONDITIONERS.get(method)  # unknown names fail fast, like the reference
        return cls(
            method=method,
            scale=tuple(float(s) for s in parse_scale(params.get("scale", 1.0))),
            gradient_x_prev=bool(params.get("gradient_x_prev", False)),
            x_prev_every=int(params.get("x_prev_every", 1)),
            gradient_clip=clip_on,
            gradient_clip_value=clip_val,
            loss_function=params.get("loss_function", "norm"),
            loss_weight=params.get("loss_weight"),
            weight_function=params.get("weight_function"),
            n_iter=int((sample_pattern or {}).get("n_iter", 1)),
            aux_loss=aux,
            noiser_name=noiser_name,
        )


@dataclasses.dataclass
class GuidedResult:
    sample: jax.Array          # final x (post-noise chain output)
    pred_xstart: jax.Array     # x0-hat at the final step — what gets saved
    phi: Dict[str, jax.Array]  # final water parameters
    sep_loss: jax.Array        # [T, B] per-image guidance loss trace
    phi_trace: Dict[str, jax.Array]  # [T, B, C]
    aux_trace: Dict[str, jax.Array]  # [T]
    x0_std_trace: Optional[jax.Array] = None  # [T, B] x0-hat amplitude
    # final phi-optimizer state — thread back in as opt_state_init for
    # global_N>1 warm starts (the operator outlives the global loop in the
    # reference, osmosis_sampling.py:146-163 vs :191)
    opt_state: Optional[dict] = None
    x0_snapshots: Optional[jax.Array] = None  # [K, B, H, W, 4]
    # ltsp only: final PLMS eps history (most-recent first) — thread back in
    # as eps_hist_init to chain segmented ltsp runs bitwise
    eps_hist: Optional[Tuple[jax.Array, ...]] = None
    snapshot_steps: Tuple[int, ...] = ()      # static: timestep of each slot

    @property
    def snapshots(self) -> Optional[dict]:
        if self.x0_snapshots is None:
            return None
        return {"steps": self.snapshot_steps, "x0_hat": self.x0_snapshots}


jax.tree_util.register_dataclass(
    GuidedResult,
    data_fields=[
        "sample", "pred_xstart", "phi", "sep_loss", "phi_trace", "aux_trace",
        "x0_std_trace", "opt_state", "x0_snapshots", "eps_hist",
    ],
    meta_fields=["snapshot_steps"],
)


def _make_weight_fn(gcfg: GuidanceConfig):
    """set_loss_weight (utils.py:674-700): depth-derived weights on the
    guidance difference, always from a stop-gradient x0-hat."""
    if gcfg.loss_weight in (None, "none"):
        return lambda x0: 1.0
    if gcfg.loss_weight == "depth":
        fn_str, value = parse_weight_function(gcfg.weight_function)

        def weight(x0):
            depth = jax.lax.stop_gradient(x0[..., 3:4])
            return convert_depth(depth, fn_str, value)

        return weight
    raise NotImplementedError(gcfg.loss_weight)


def _tree_select(pred, on_true, on_false):
    return jax.tree_util.tree_map(
        lambda a, b: jnp.where(pred, a, b), on_true, on_false
    )


def guided_sample_loop(
    model_fn: ModelFn,
    schedule: DiffusionSchedule,
    x_init: jax.Array,
    measurement: jax.Array,
    key: jax.Array,
    operator: Operator,
    gcfg: GuidanceConfig,
    scfg: SamplerConfig = SamplerConfig(),
    sample_pattern: Optional[dict] = None,
    record_every: Optional[int] = None,
    deterministic: bool = False,
    progress_every: Optional[int] = None,
    phi_init: Optional[Dict[str, jax.Array]] = None,
    opt_state_init: Optional[dict] = None,
    eta_scale: Optional[jax.Array] = None,
    ts: Optional[jax.Array] = None,
    x0_buf_init: Optional[jax.Array] = None,
    eps_hist_init: Optional[Tuple[jax.Array, ...]] = None,
) -> GuidedResult:
    """Run the full guided reverse process. All arrays NHWC.

    ``deterministic=True`` zeroes every injected noise draw — a debugging /
    exact-parity mode (the chain then follows posterior means only).

    ``phi_init``/``opt_state_init`` warm-start the water parameters and their
    optimizer state — used by global_N>1 pcgs restarts, where the reference
    keeps the operator (and thus its optimized phi) alive across global
    iterations (osmosis_sampling.py:146-163 outside the :191 loop). When
    omitted, phi starts from the operator's configured inits.

    ``eta_scale`` (extension, default None == exact reference semantics):
    runtime scalar multiplied into every phi optimizer step — the
    ``global_eta_scale`` knob for damping phi drift in warm-started
    global_N>1 chains.

    ``ts``/``x0_buf_init`` (extension; both default to the full chain): run
    only the given descending slice of chain timesteps, starting from
    ``x_init`` as the segment's incoming x_t and ``x0_buf_init`` as the
    incoming snapshot buffer. Per-step randomness is keyed on the timestep
    VALUE (``fold_in(key, t)``), so chaining segments with the same base key
    reproduces the unsegmented chain bitwise — this is the relay-safe
    mid-chain progress mechanism (``progress_segments`` in restore.py): N
    jitted segment calls with a tiny host fetch between them, instead of the
    host callbacks the axon relay cannot run. For the ltsp sampler also pass
    ``eps_hist_init`` (the previous segment's ``GuidedResult.eps_hist``) so
    the PLMS history chains across the boundary.
    """
    if progress_every:
        # the axon PJRT relay has no host send/recv support — degrade to
        # silent sampling rather than failing the whole chain
        try:
            version = getattr(jax.local_devices()[0].client, "platform_version", "")
            if "axon" in str(version):
                print(
                    "[osmosis_tpu] live progress callbacks unsupported on "
                    "this platform; the pipeline prints a per-chain trace "
                    "summary after each image instead"
                )
                progress_every = None
        except Exception:
            pass

    if (
        gcfg.x_prev_every > 1
        and not gcfg.gradient_x_prev
        and gcfg.method != "ps"
    ):
        # 'ps' needs no flag: the reference DPS conditioner ALWAYS takes the
        # x_prev gradient (condition_methods.py:40), so x_prev_every alone
        # defines its hybrid cadence
        raise ValueError(
            "x_prev_every > 1 requires gradient_x_prev: True — with "
            "gradient_x_prev: False every step already uses the x0 gradient"
        )

    T = schedule.num_timesteps
    B = x_init.shape[0]
    consts = {k: jnp.asarray(v) for k, v in schedule.device_constants().items()}
    masks_np = pattern_masks(sample_pattern, T)
    masks = {k: jnp.asarray(v) for k, v in masks_np.items()}
    # static fast-paths: skip compiling dead branches when the pattern
    # guides every step / never alternates (true for all shipped configs)
    always_guided = bool(masks_np["guidance"].all())
    never_alternates = bool((masks_np["alternate_len"] == 1).all())
    # phi warm phase is off in all reference presets; when off the extra
    # fori_loop never enters the graph (zero compile/runtime delta)
    any_phi_warmup = bool(masks_np["phi_warmup"].any())

    aux_fn = make_aux_loss_fn(dict(gcfg.aux_loss))
    aux_names = [k for k, _ in gcfg.aux_loss]
    weight_fn = _make_weight_fn(gcfg)
    scale = np.asarray(gcfg.scale, dtype=np.float32)
    if scale.shape[0] == 1:
        scale_bc = jnp.asarray(scale[0])
    else:
        scale_bc = jnp.asarray(scale).reshape(1, 1, 1, -1)

    if phi_init is not None:
        phi0 = {k: jnp.asarray(v) for k, v in phi_init.items()}
    else:
        phi0 = {k: jnp.asarray(v) for k, v in operator.phi_init().items()}
    opt = make_phi_optimizer(operator.optimizer, operator.etas())
    if eta_scale is not None:
        # global_eta_scale (extension; see restore.py): scale every phi step
        # by a RUNTIME scalar — exactly equivalent to multiplying each eta by
        # it, for all three optimizer families (eta enters the phi step
        # linearly and the state evolution (m/v/sq/count) is eta-independent,
        # phi_optim.py). A traced argument, so global_N>1 chains with
        # different scales share one compiled executable.
        _s = jnp.asarray(eta_scale, jnp.float32)
        _base_update = opt.update

        def _scaled_update(phi_, g_, st_):
            new_, st2_ = _base_update(phi_, g_, st_)
            return (
                jax.tree_util.tree_map(lambda p, n: p + _s * (n - p), phi_, new_),
                st2_,
            )

        opt = PhiOptimizer(opt.init, _scaled_update)
    if opt_state_init is not None:
        opt_state0 = jax.tree_util.tree_map(jnp.asarray, opt_state_init)
    else:
        opt_state0 = opt.init(phi0)
    y = measurement

    # ---- loss on x0-hat (condition_methods.py:109-144) -------------------
    def loss_terms(x0, phi):
        degraded01 = operator.forward(phi, x0)
        degraded = 2.0 * degraded01 - 1.0
        diff = (y - degraded) * weight_fn(x0)
        if gcfg.loss_function == "norm":
            loss = jnp.sqrt(jnp.sum(diff.astype(jnp.float32) ** 2))
            sep = jnp.sqrt(jnp.sum(diff.astype(jnp.float32) ** 2, axis=(1, 2, 3)))
        elif gcfg.loss_function == "mse":
            mse = jnp.mean(diff.astype(jnp.float32) ** 2, axis=(1, 2, 3))
            loss, sep = jnp.sum(mse), mse
        else:
            raise NotImplementedError(gcfg.loss_function)
        if aux_fn is not None:
            aux_total, aux_per = aux_fn(x0)
            total = loss + aux_total
        else:
            aux_per = {}
            total = loss
        aux_vec = {k: aux_per[k] for k in aux_names}
        return total, (sep, aux_vec)

    zero_aux = {k: jnp.zeros(()) for k in aux_names}

    # ---- LTSP splitting mode (arXiv 2301.11558) ---------------------------
    # Lie-Trotter split of the guided reverse process: the DIFFUSION substep
    # uses a 4th-order PLMS (Adams-Bashforth on eps, warmup AB1..AB3) over a
    # deterministic DDIM(eta=0) update, while the GUIDANCE substep (DPS
    # gradient + in-scan phi SGD) stays first-order — the paper's key
    # observation is that high-order solvers only help the diffusion term.
    # Enabled with SamplerConfig(sampler='ltsp'); cuts the steps needed for
    # a given quality by ~4x (validated on the toy-prior protocol,
    # VALIDATION.md).
    ltsp = scfg.sampler == "ltsp"
    if ltsp:
        if gcfg.method != "osmosis":
            raise NotImplementedError("ltsp splitting implements the 'osmosis' path")
        if not never_alternates:
            raise NotImplementedError("ltsp requires local_M == 1 patterns")
        _ab = np.zeros((T, 4), np.float32)
        for t_host in range(T):
            j = T - 1 - t_host  # step index along the reverse chain
            if j == 0:
                _ab[t_host] = [1.0, 0.0, 0.0, 0.0]
            elif j == 1:
                _ab[t_host] = [1.5, -0.5, 0.0, 0.0]
            elif j == 2:
                _ab[t_host] = [23 / 12, -16 / 12, 5 / 12, 0.0]
            else:
                _ab[t_host] = [55 / 24, -59 / 24, 37 / 24, -9 / 24]
        plms_coeffs = jnp.asarray(_ab)

    def _gather(namek, tb):
        return consts[namek][tb].reshape(-1, *([1] * (x_init.ndim - 1)))

    # ---- one guided osmosis update (condition_methods.py:146-231) --------
    # ``use_x_prev`` is STATIC (python bool): it selects whether this step's
    # guidance gradient runs the UNet pullback (x_prev mode) or stops at
    # x0-hat (x0 mode) — the hybrid schedule traces different substeps with
    # different values, so the x0 substeps compile with no backward at all.
    def osmosis_guided(x, phi, opt_state, t, tb, use_x_prev):
        def x0_and_v(xp):
            mo = model_fn(xp, consts["model_timesteps"][tb])
            eps, v = split_model_output(mo, xp.shape[-1])
            x0 = process_xstart(predict_xstart(xp, tb, eps, consts, scfg), scfg)
            return x0, v

        if use_x_prev:
            (x0, v), vjp_fn = jax.vjp(x0_and_v, x)
        else:
            x0, v = x0_and_v(x)
            vjp_fn = None
        logvar = model_log_variance(v, tb, consts, scfg)
        mean = posterior_mean(x0, x, tb, consts)

        freeze = masks["freeze_phi"][t]
        x0_c = jax.lax.stop_gradient(x0)

        # inner phi-only iterations (n_iter-1 of them; masked out when
        # frozen) — physics-only gradients, UNet untouched
        # (condition_methods.py:193-194). Statically UNROLLED: each physics
        # gradient is a handful of tiny fused kernels and a fori_loop would
        # pay while-loop sync overhead per iteration; unrolling lets XLA
        # schedule all of them back to back and hoist the loop-invariant
        # depth conversion.
        def phi_body(carry):
            phi_, st_ = carry
            g = jax.grad(lambda p: loss_terms(x0_c, p)[0])(phi_)
            return opt.update(phi_, g, st_)

        if any_phi_warmup:
            # phi warm phase (schedule_masks.pattern_masks): a one-off burst
            # of physics-only descent at the unfreeze boundary. Dynamic trip
            # count (nonzero at exactly one t), so a fori_loop — the body is
            # a handful of tiny fused kernels, and it runs once per chain.
            phi, opt_state = jax.lax.fori_loop(
                0, masks["phi_warmup"][t], lambda _, c: phi_body(c),
                (phi, opt_state),
            )

        if gcfg.n_iter <= 32:
            def unrolled(carry):
                for _ in range(gcfg.n_iter - 1):
                    carry = phi_body(carry)
                return carry

            phi, opt_state = jax.lax.cond(
                freeze, lambda c: c, unrolled, (phi, opt_state)
            )
        else:
            n_inner = jnp.where(freeze, 0, gcfg.n_iter - 1)
            phi, opt_state = jax.lax.fori_loop(
                0, n_inner, lambda _, c: phi_body(c), (phi, opt_state)
            )

        # joint gradient wrt (x0-hat, phi) with the UNet pullback applied once
        (_, (sep, aux_vec)), (g_x0, g_phi) = jax.value_and_grad(
            loss_terms, argnums=(0, 1), has_aux=True
        )(x0, phi)

        phi_new, st_new = opt.update(phi, g_phi, opt_state)
        phi = _tree_select(freeze, phi, phi_new)
        opt_state = _tree_select(freeze, opt_state, st_new)

        if use_x_prev:
            g_x = vjp_fn((g_x0, jnp.zeros_like(v)))[0]
            if gcfg.gradient_clip:
                g_used = jnp.clip(
                    g_x, -gcfg.gradient_clip_value, gcfg.gradient_clip_value
                )
            else:
                g_used = g_x
        else:
            # gradient wrt x0-hat; never clipped (condition_methods.py:227-229)
            g_used = g_x0
        guidance = scale_bc * g_used
        return mean - guidance, logvar, x0, guidance, phi, opt_state, sep, aux_vec

    def plain_update(x, phi, opt_state, t, tb):
        out = p_mean_variance(model_fn, x, tb, consts, scfg)
        return (
            out["mean"], out["log_variance"], out["pred_xstart"],
            jnp.zeros_like(x), phi, opt_state, jnp.zeros((B,)), zero_aux,
        )

    # ---- 'ps' (vanilla DPS rgb_guidance) step -----------------------------
    # ``use_x_prev`` mirrors the osmosis step: True runs the reference
    # semantics (grad wrt x_prev through the UNet, condition_methods.py:40);
    # False is the cheap x0-hat gradient substep the hybrid schedule traces
    # for chain steps s % k != 0 (the reference itself carries this variant
    # as a commented-out line, condition_methods.py:41).
    def ps_step(x, phi, opt_state, t, tb, k, use_x_prev=True):
        def x0_and_v(xp):
            mo = model_fn(xp, consts["model_timesteps"][tb])
            eps, v = split_model_output(mo, xp.shape[-1])
            x0 = process_xstart(predict_xstart(xp, tb, eps, consts, scfg), scfg)
            return x0, v

        if use_x_prev:
            (x0, v), vjp_fn = jax.vjp(x0_and_v, x)
        else:
            x0, v = x0_and_v(x)
            vjp_fn = None
        logvar = model_log_variance(v, tb, consts, scfg)
        mean = posterior_mean(x0, x, tb, consts)
        out = {"mean": mean, "log_variance": logvar, "pred_xstart": x0}
        # noise FIRST (p_sample, gaussian_diffusion.py:232-233,494-502)
        if deterministic:
            sample = mean
        elif scfg.sampler == "ddim":
            sample = ddim_step(x, out, tb, k, consts, scfg.ddim_eta)
        else:
            sample = ddpm_noise_step(out, tb, k)

        # base-class grad_and_value (condition_methods.py:35-53) — branch on
        # the noise model exactly like the reference:
        if gcfg.noiser_name == "gaussian":
            # ‖y − A(x0[...,:3])‖ with identity A (condition_methods.py:38-40)
            def loss_fn(x0_):
                diff = y - operator.forward({}, x0_[..., 0:3])
                return jnp.sqrt(jnp.sum(diff.astype(jnp.float32) ** 2))
        elif gcfg.noiser_name == "poisson":
            # mean(‖y − A(x0)‖ / |y|) over the FULL x0 (condition_methods.py:
            # 43-48 — note: no RGB slice in the reference's poisson branch)
            def loss_fn(x0_):
                diff = y - operator.forward({}, x0_)
                norm = jnp.sqrt(jnp.sum(diff.astype(jnp.float32) ** 2))
                return jnp.mean(norm / jnp.abs(y.astype(jnp.float32)))
        else:
            # 'clean' etc. raise in the reference too (condition_methods.py:50)
            raise NotImplementedError(
                f"'ps' conditioning does not support noiser '{gcfg.noiser_name}'"
            )

        loss, g_x0 = jax.value_and_grad(loss_fn)(x0)
        if use_x_prev:
            g_used = vjp_fn((g_x0, jnp.zeros_like(v)))[0]
        else:
            g_used = g_x0
        x_t = sample - scale_bc * g_used
        return x_t, x0, phi, opt_state, jnp.full((B,), loss), zero_aux

    # ---- recording buffers -------------------------------------------------
    if record_every is not None:
        rec_steps = record_steps_for(T, record_every, extra=(T - 1, 999))
        slot_map = jnp.asarray(make_slot_map(T, rec_steps))
        if x0_buf_init is not None:
            # segment chaining: earlier segments' snapshots carry through
            buf_x0 = jnp.asarray(x0_buf_init)
        else:
            buf_x0 = jnp.zeros((len(rec_steps),) + x_init.shape, x_init.dtype)
    else:
        rec_steps, slot_map, buf_x0 = (), None, None

    # ---- scan body ---------------------------------------------------------
    # ``use_x_prev`` is static per traced substep: the plain (k=1) scan body
    # passes gcfg.gradient_x_prev; the hybrid schedule's block body traces
    # substep 0 with True and substeps 1..k-1 with False.
    def _single_step(carry, t, use_x_prev):
        if ltsp:
            x, phi, opt_state, x0_last, b_x0, eps_hist = carry
        else:
            x, phi, opt_state, x0_last, b_x0 = carry
            eps_hist = None
        tb = jnp.full((B,), t, dtype=jnp.int32)

        def one_iteration(i, c):
            x_, phi_, st_, _, _, _ = c
            k = jax.random.fold_in(jax.random.fold_in(key, t), i)
            if gcfg.method == "ps":
                x_t, x0, phi2, st2, sep, aux_vec = ps_step(
                    x_, phi_, st_, t, tb, k, use_x_prev
                )
                return (x_t, phi2, st2, x0, sep, aux_vec)
            if always_guided:
                upd = osmosis_guided(x_, phi_, st_, t, tb, use_x_prev)
            else:
                upd = jax.lax.cond(
                    masks["guidance"][t],
                    lambda op: osmosis_guided(*op, t, tb, use_x_prev),
                    lambda op: plain_update(*op, t, tb),
                    (x_, phi_, st_),
                )
            x_t, logvar, x0, guidance, phi2, st2, sep, aux_vec = upd
            if ltsp:
                # Lie-Trotter split: (a) PLMS/DDIM(eta=0) diffusion substep
                # on eps, (b) first-order guidance substep
                eps_t = (
                    _gather("sqrt_recip_alphas_cumprod", tb) * x_ - x0
                ) / _gather("sqrt_recipm1_alphas_cumprod", tb)
                eps_all = jnp.stack([eps_t] + list(eps_hist))  # [4, B, ...]
                c4 = plms_coeffs[t]
                eps_eff = jnp.tensordot(c4, eps_all, axes=1)
                x0_eff = (
                    _gather("sqrt_recip_alphas_cumprod", tb) * x_
                    - _gather("sqrt_recipm1_alphas_cumprod", tb) * eps_eff
                )
                ab_prev = _gather("alphas_cumprod_prev", tb)
                x_diff = (
                    jnp.sqrt(ab_prev) * x0_eff
                    + jnp.sqrt(1.0 - ab_prev) * eps_eff
                )
                x_next = x_diff - guidance
                return (x_next, phi2, st2, x0, sep, aux_vec, eps_t)
            # noise AFTER guidance (gaussian_diffusion.py:266-268)
            if deterministic:
                x_next = x_t
            else:
                z = jax.random.normal(k, x_t.shape, x_t.dtype)
                nonzero = (t > 0).astype(x_t.dtype)
                x_next = x_t + nonzero * jnp.exp(0.5 * logvar) * z
            return (x_next, phi2, st2, x0, sep, aux_vec)

        init = (x, phi, opt_state, x0_last, jnp.zeros((B,)), zero_aux)
        if ltsp:
            x, phi, opt_state, x0, sep, aux_vec, eps_t = one_iteration(0, init)
            eps_hist = (eps_t, eps_hist[0], eps_hist[1])
        elif never_alternates:
            x, phi, opt_state, x0, sep, aux_vec = one_iteration(0, init)
        else:
            x, phi, opt_state, x0, sep, aux_vec = jax.lax.fori_loop(
                0, masks["alternate_len"][t], one_iteration, init
            )

        if slot_map is not None:
            b_x0 = record_update(b_x0, x0, slot_map[t])

        if progress_every:
            # tqdm-postfix equivalent (gaussian_diffusion.py:276-296) as an
            # async host callback — fires every progress_every steps without
            # blocking the device
            def _report(t_, loss_, phi_):
                vals = {k: np.round(np.asarray(v)[0], 3).tolist() for k, v in phi_.items()}
                print(f"  t={int(t_):4d} loss={np.asarray(loss_)[0]:.3f} {vals}")

            jax.lax.cond(
                t % progress_every == 0,
                lambda: jax.debug.callback(_report, t, sep, phi),
                lambda: None,
            )

        # per-image x0-hat std: amplitude telemetry for trajectory-health
        # triage (a chain whose x0_std fails to contract toward the prior's
        # scale by mid-chain is sampling off-manifold — VALIDATION.md 3b-iv).
        # Rides the trace outputs; x0 is read by the loss anyway, so XLA
        # fuses the reduction into existing passes.
        x0_std = jnp.std(
            x0.astype(jnp.float32).reshape(B, -1), axis=1
        )
        ys = {"sep_loss": sep, "phi": phi, "aux": aux_vec, "x0_std": x0_std}
        if ltsp:
            return (x, phi, opt_state, x0, b_x0, eps_hist), ys
        return (x, phi, opt_state, x0, b_x0), ys

    def step(carry, t):
        # 'ps' ignores gradient_x_prev — the reference DPS path always
        # differentiates wrt x_prev (condition_methods.py:40)
        use = True if gcfg.method == "ps" else gcfg.gradient_x_prev
        return _single_step(carry, t, use)

    if ts is None:
        ts = jnp.arange(T - 1, -1, -1, dtype=jnp.int32)
    else:
        ts = jnp.asarray(ts, jnp.int32)
    seg_len = int(ts.shape[0])  # == T for the full (unsegmented) chain
    carry0 = (x_init, phi0, opt_state0, jnp.zeros_like(x_init), buf_x0)
    if ltsp:
        if eps_hist_init is not None:
            hist0 = tuple(jnp.asarray(e) for e in eps_hist_init)
        else:
            hist0 = tuple(jnp.zeros_like(x_init) for _ in range(3))
        carry0 = carry0 + (hist0,)
    # perf knob scan_unroll>1 unrolls scan bodies so XLA can schedule one
    # step's boundary layout copies behind the previous step's convs
    # (perf experiment knob; requires seg_len % unroll == 0)
    from .. import perf as _perf

    unroll = int(_perf.get("scan_unroll"))
    if seg_len % max(unroll, 1) != 0:
        unroll = 1

    # ---- hybrid gradient schedule (x_prev_every=k > 1) ---------------------
    # Framework extension: full x_prev gradient (UNet vjp) on chain steps
    # s % k == 0, the cheap x0-hat gradient on the rest. TPU-native design:
    # NO lax.cond in the body — the chain is statically regrouped into
    # [T//k, k] blocks and the scan body unrolls k substeps, substep 0 traced
    # with the vjp and substeps 1..k-1 traced backward-free, so XLA compiles
    # exactly one executable with a 1:(k-1) full:cheap step mix. A remainder
    # of T % k steps runs as one python-unrolled epilogue block (same
    # full-first structure); all shipped respacings with k in {2,4,5,8} have
    # no remainder.
    hybrid = gcfg.x_prev_every > 1 and (
        gcfg.gradient_x_prev or gcfg.method == "ps"
    )
    if hybrid:
        kk = gcfg.x_prev_every
        if kk >= T:
            raise ValueError(
                f"x_prev_every={kk} must be < the chain length ({T} steps)"
            )
        # block grouping runs over THIS segment's steps; segmented callers
        # keep non-final segment lengths divisible by kk so the global
        # full:cheap step placement matches the unsegmented chain exactly
        nblk, rem = seg_len // kk, seg_len % kk

        def block_step(carry, t_vec, size):
            ys_list = []
            for j in range(size):
                carry, ys_j = _single_step(carry, t_vec[j], use_x_prev=(j == 0))
                ys_list.append(ys_j)
            ys = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *ys_list)
            return carry, ys

        # the block body is already kk-wide, so the outer unroll default is
        # 1 (scan_unroll on top would multiply compile size); the
        # hybrid_scan_unroll perf knob exposes the A/B
        h_unroll = int(_perf.get("hybrid_scan_unroll"))
        if nblk % max(h_unroll, 1) != 0:
            h_unroll = 1
        carry, ys = jax.lax.scan(
            lambda c, tv: block_step(c, tv, kk),
            carry0, ts[: nblk * kk].reshape(nblk, kk),
            unroll=max(h_unroll, 1),
        )
        ys = jax.tree_util.tree_map(
            lambda a: a.reshape((nblk * kk,) + a.shape[2:]), ys
        )
        if rem:
            carry, ys_ep = block_step(carry, ts[nblk * kk:], rem)
            ys = jax.tree_util.tree_map(
                lambda a, b: jnp.concatenate([a, b], axis=0), ys, ys_ep
            )
        if ltsp:
            x, phi, opt_state, x0_final, buf_x0, eps_hist_f = carry
        else:
            x, phi, opt_state, x0_final, buf_x0 = carry
    elif ltsp:
        (x, phi, opt_state, x0_final, buf_x0, eps_hist_f), ys = jax.lax.scan(
            step, carry0, ts, unroll=unroll
        )
    else:
        (x, phi, opt_state, x0_final, buf_x0), ys = jax.lax.scan(
            step, carry0, ts, unroll=unroll
        )

    return GuidedResult(
        sample=x,
        pred_xstart=x0_final,
        phi=phi,
        sep_loss=ys["sep_loss"],
        phi_trace=ys["phi"],
        aux_trace=ys["aux"],
        x0_std_trace=ys["x0_std"],
        opt_state=opt_state,
        x0_snapshots=buf_x0,
        eps_hist=eps_hist_f if ltsp else None,
        snapshot_steps=tuple(rec_steps),
    )
