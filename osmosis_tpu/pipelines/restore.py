"""Guided restoration pipeline — the osmosis_sampling.py:33-409 equivalent.

Per-image flow: preprocess on host → one jit-compiled guided scan on device
(compiled ONCE, reused for every image and global iteration) → host
post-processing (physical recomposition, depth colormaps, grids) → run-dir
outputs. Output layout, log contents and config snapshot match the reference
contract (README.md:434-448).
"""

from __future__ import annotations

import datetime
import os
from functools import partial
from os.path import join as pjoin
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .. import config as C
from ..data import datasets as D
from ..data import postprocess as P
from ..data import transforms as TR
from ..diffusion.guided import GuidanceConfig, GuidedResult, guided_sample_loop
from ..diffusion.sampler import SamplerConfig
from ..diffusion.schedules import make_schedule
from ..guidance.noise import get_noiser
from ..guidance.operators import convert_depth, get_operator
from ..models.convert import cast_params_half, load_unet_params
from ..models.unet import UNetModel, unet_config_from_yaml
from ..utils import logging as L
from ..utils import profiling as prof
from ..utils.chainjournal import ChainJournal
from ..utils.rundir import make_output_dirs, update_save_dir_date
from types import SimpleNamespace as _SNS

# process-wide count of chain-checkpoint boundary saves, read by the
# OSMOSIS_TPU_CRASH_AFTER_SEGMENTS fault-injection hook (chainjournal.py)
_CRASH_SAVES = {"n": 0}


def _better_loss(new_fl, best_fl) -> bool:
    """best_of lane selection: does a trial with final loss ``new_fl``
    displace the current best ``best_fl``? Plain ``<`` plus an explicit NaN
    arm — if a diverged trial 0 seeded best with NaN, `new < nan` is always
    False and no finite later trial could ever win (ADVICE r3)."""
    if best_fl is None:
        return True
    return bool(new_fl < best_fl
                or (np.isnan(best_fl) and np.isfinite(new_fl)))


def _grad_mode_str(cp):
    """Human-readable guidance-gradient mode for the run-config snapshot:
    x_prev / x0 (reference surface) or the hybrid schedule extension."""
    if not cp["gradient_x_prev"]:
        return "x0"
    k = int(cp.get("x_prev_every", 1))
    return f"x_prev every {k} steps, x0 between" if k > 1 else "x_prev"


def _log_run_header(logger, args):
    """utils.py:635-669 log_text equivalent."""
    cp = args.conditioning["params"]
    op = args.measurement["operator"]
    txt = (
        f"\n\nGuidance Scale: {cp['scale']}"
        f"\nLoss Function: {cp['loss_function']}"
        f"\nweight: {cp['loss_weight']}, weight_function: {cp['weight_function']}"
        f"\nAuxiliary Loss: {args.aux_loss['aux_loss']}"
        f"\nUnderwater model: {op['name']}"
        f"\nOptimize w.r.t: "
        f"{_grad_mode_str(cp)}"
        f"\nOptimizer model: {op.get('optimizer', 'none')}, "
        f"\nManual seed: {args.manual_seed}"
        f"\nDepth type: {op['depth_type']}, value: {op['value']}"
        f"\nNoise: {args.measurement['noise']['name']}"
    )
    if "sigma" in args.measurement["noise"]:
        txt += f", sigma: {args.measurement['noise']['sigma']}"
    clip_on, clip_val = C.parse_gradient_clip(cp["gradient_clip"])
    txt += f"\nGradient Clipping: {clip_on}"
    if clip_on:
        txt += f", min value: -{clip_val}, max value: {clip_val}"
    sp = args.sample_pattern
    if sp["pattern"] == "original":
        txt += "\nSample Pattern: original"
    else:
        txt += (
            f"\nSample Pattern: {sp['pattern']}, "
            f"\n     Guidance start: {sp['start_guidance']} ,end: {sp['stop_guidance']}"
            f"\n     Optimizations iters: {sp['n_iter']}, "
            f"\n     Update start from: {sp['update_start']}, end: {sp['update_end']}"
            f"\n     M: {sp['local_M']}, start: {sp['s_start']}, end: {sp['s_end']}"
        )
    logger.log(txt)


def _log_trace_summary(logger, res, max_rows=10):
    """Post-chain per-step telemetry — the reference's tqdm postfix
    (gaussian_diffusion.py:276-296: time/loss/aux/live phi) reconstructed
    from the scan's trace outputs after the chain completes. Zero hot-loop
    cost, and it works on the axon relay where live host callbacks are
    unsupported (guided.py silently disables progress_every there)."""
    sep = np.asarray(res.sep_loss)  # [T, B]
    T = sep.shape[0]
    if T == 0:
        return
    x0_std = res.x0_std_trace
    x0_std = np.asarray(x0_std) if x0_std is not None else None  # one fetch
    idx = np.unique(np.linspace(0, T - 1, max_rows).round().astype(int))
    lines = ["chain telemetry (scan trace; step runs t=T-1..0):"]
    for i in idx:
        phi_vals = {
            k: np.round(np.asarray(v)[i, 0].astype(np.float64), 3).tolist()
            for k, v in res.phi_trace.items()
        }
        row = f"  t={T - 1 - i:4d} loss={float(sep[i].mean()):9.3f}"
        if x0_std is not None:
            # amplitude telemetry: healthy chains contract x0-hat std toward
            # the prior's scene scale by mid-chain (VALIDATION.md 3b-iv)
            row += f" x0_std={float(x0_std[i].mean()):.3f}"
        aux = {
            k: round(float(np.asarray(v)[i]), 3)
            for k, v in res.aux_trace.items()
        }
        if aux:
            row += f" aux={aux}"
        if phi_vals:
            row += f" {phi_vals}"
        lines.append(row)
    logger.log("\n".join(lines))


def _save_process_grid(snapshots, path):
    """Recorded x0-hat snapshots → rgb row + depth row grid
    (gaussian_diffusion.py:309-333)."""
    x0s = np.asarray(snapshots["x0_hat"])  # [K, B, H, W, 4]
    rgb_row, depth_row = [], []
    for k in range(x0s.shape[0]):
        x0 = x0s[k, 0]
        rgb_row.append(P.clip01(P.to_01(x0[..., 0:3])))
        d = P.min_max_norm_range_percentile(x0[..., 3], percent_low=0.05, percent_high=0.99)
        depth_row.append(P.depth_to_color(d))
    grid = P.make_grid(rgb_row + depth_row, nrow=len(rgb_row))
    P.save_png(grid, path)


def run_restoration(
    config_file: str,
    device_index: int = 0,
    model_dtype=jnp.float32,
    save_dir_override: Optional[str] = None,
    progress_every: Optional[int] = None,
) -> str:
    """Run the full guided restoration over the configured dataset.

    Returns the run output directory.
    """
    from ..utils.compilation_cache import enable as _enable_cache

    _enable_cache()
    args = C.arguments_from_file(config_file)
    # optional perf: section — every trace-time perf knob is config surface
    # (osmosis_tpu/perf.py); env vars remain a debugging override
    from .. import perf as PF

    PF.configure_from_dict(getattr(args, "perf", None))
    args.image_size = args.unet_model["image_size"]
    image_size = args.image_size
    # local devices: under multi-host each process only addresses its own
    # chips (jax.devices() would include non-addressable remote devices)
    devices = jax.local_devices()
    device = devices[min(device_index, len(devices) - 1)]

    data_config = args.data
    gt_flag = bool(data_config.get("ground_truth", False)) if isinstance(
        data_config, dict
    ) else False

    transform = partial(TR.preprocess_image, size=image_size)
    if gt_flag:
        dataset = D.ImagesFolderGT(
            data_config["root"], data_config["gt_rgb"], data_config["gt_depth"],
            transform=transform,
        )
    else:
        dataset = D.ImagesFolder(data_config["root"], transform=transform)

    # model + checkpoint
    if args.unet_model.get("use_fp16"):
        model_dtype = jnp.bfloat16  # TPU-native half precision
    # remat off: batch-1 256px guided activations fit v5e HBM and the
    # backward runs ~13% faster (PERF.md); use_checkpoint: True re-enables it
    ucfg = unet_config_from_yaml(
        args.unet_model, dtype=model_dtype,
        remat=bool(args.unet_model.get("use_checkpoint", False)),
    )
    model = UNetModel(ucfg)
    params = load_unet_params(args.unet_model.get("model_path", ""), ucfg)
    if ucfg.dtype == jnp.bfloat16:
        # bf16 weight storage halves per-step HBM weight reads; GroupNorm
        # affine params stay fp32 (fp32 islands)
        params = cast_params_half(params)
    params = jax.device_put(params, device)

    measure_config = args.measurement
    cond_config = args.conditioning
    sample_pattern = args.sample_pattern
    rgb_guidance = bool(getattr(args, "rgb_guidance", False))

    resume = bool(getattr(args, "resume", False))

    # multi-host: every process runs this same function; images stride
    # across hosts (embarrassingly parallel — no cross-host collectives in
    # the hot loop), each rank logs to its own files (SURVEY.md section 2.7)
    from ..parallel import multihost as MH

    multihost = MH.is_multihost()

    # output directory contract (osmosis_sampling.py:76-105); resume re-enters
    # the latest run dir so finished images are found and skipped. Under
    # multi-host, rank 0 allocates runN and the other ranks join it after a
    # barrier (shared-filesystem pods; separate-fs hosts each get their own).
    operator_name = measure_config["operator"]["name"]
    base = save_dir_override or args.save_dir
    out_path = os.path.abspath(pjoin(base, operator_name, data_config["name"]))
    if multihost:
        if jax.process_index() == 0:
            out_path = update_save_dir_date(out_path, resume=resume)
        MH.barrier("rundir_allocated")
        if jax.process_index() != 0:
            out_path = update_save_dir_date(out_path, resume=True)
    else:
        out_path = update_save_dir_date(out_path, resume=resume)
    C.config_snapshot(config_file, pjoin(out_path, "configurations.txt"))
    # append the EFFECTIVE perf knobs so the run's numerical/perf
    # configuration is fully reproducible from its run dir
    with open(pjoin(out_path, "configurations.txt"), "a") as _f:
        _f.write(PF.snapshot_text())
    paths = make_output_dirs(out_path, args.save_singles, args.save_grids)

    logger = L.configure(out_path, rank_suffix=MH.rank_suffix() if multihost else "")
    if multihost:
        logger.log(
            f"multi-host run: process {jax.process_index()}/{jax.process_count()}, "
            f"{jax.local_device_count()} local / {jax.device_count()} global devices"
        )
    logger.log(f"pretrained model file: {args.unet_model['model_path']}")
    if not rgb_guidance:
        _log_run_header(logger, args)

    # schedule + sampler config (diffusion section)
    dcfg = args.diffusion
    schedule = make_schedule(
        noise_schedule=dcfg["noise_schedule"], steps=dcfg["steps"],
        timestep_respacing=dcfg.get("timestep_respacing", ""),
        rescale_timesteps=dcfg.get("rescale_timesteps", False),
    )
    scfg = SamplerConfig(
        sampler=dcfg["sampler"],
        model_mean_type=dcfg["model_mean_type"],
        model_var_type=dcfg["model_var_type"],
        dynamic_threshold=dcfg.get("dynamic_threshold", False),
        clip_denoised=dcfg.get("clip_denoised", False),
    )

    batch_size = data_config.get("batch_size", 1)
    op_kwargs = {k: v for k, v in measure_config["operator"].items() if k != "name"}
    operator = get_operator(operator_name, batch_size=batch_size, **op_kwargs)
    noiser = get_noiser(**measure_config["noise"])
    method = cond_config["method"]
    gcfg = GuidanceConfig.from_config(
        method if not rgb_guidance else "ps",
        cond_config["params"], sample_pattern, args.aux_loss,
        noiser_name=measure_config["noise"]["name"],
    )

    record_every = args.record_every if args.record_process else None

    def _run(params_, x_init, y, key, phi0, opt0, eta_s):
        def model_fn(x, t):
            return model.apply(params_, x, t)

        return guided_sample_loop(
            model_fn, schedule, x_init, y, key, operator, gcfg, scfg,
            sample_pattern=sample_pattern, record_every=record_every,
            progress_every=progress_every,
            phi_init=phi0, opt_state_init=opt0, eta_scale=eta_s,
        )

    run_fn = jax.jit(_run)

    # progress_segments: N (extension, default off == one scan per chain):
    # split the chain into N jitted segment calls with a tiny host fetch
    # between them — live mid-chain progress on platforms where host
    # callbacks don't run (the axon relay disables progress_every,
    # guided.py). Numerics are EXACT: per-step noise is keyed on the
    # timestep value, phi/optimizer/snapshot state chains through segment
    # boundaries (tests/test_guided_loop.py pins bitwise equality). Cost is
    # one dispatch + scalar fetch per boundary (~0.1 s each through the
    # relay — keep N modest, e.g. 4-10 on a 30 s chain).
    # On the fleet (batch_size > 1) path the same mechanism runs through a
    # vmapped segment runner (parallel/runner.py) with one progress row per
    # boundary (lane-mean loss/x0_std/phi).
    progress_segments = int(getattr(args, "progress_segments", 0) or 0)

    # chain_checkpoint: True (extension, default off): persist completed
    # chains and the in-flight chain's scan-carry state at every
    # progress_segments boundary under <run_dir>/.chain_state/, so a
    # preempted run re-entered with resume: True continues the interrupted
    # image mid-chain with BITWISE-identical results (per-step noise is
    # keyed on the timestep value) — see utils/chainjournal.py and
    # tests/test_chain_checkpoint.py. Without progress_segments the
    # granularity is whole chains (still worth it for best_of/global_N>1).
    # On the fleet path the durable unit is the CHUNK: the journal carries
    # the whole batched scan state, and its fingerprint includes the chunk's
    # image composition (a resume whose membership shifted — e.g. a crash
    # mid-save left partial outputs — safely ignores the stale state and
    # reruns the chunk).
    chain_checkpoint = bool(getattr(args, "chain_checkpoint", False))
    chain_fp = ""
    if chain_checkpoint:
        import hashlib
        import json as _json

        # fingerprint everything that determines chain numerics; run-dir
        # placement, resume mode and segmentation (numerics-neutral by the
        # bitwise segment tests) stay out so resumes survive changing them
        _fp_cfg = {
            k: v for k, v in vars(args).items()
            if k not in ("save_dir", "resume", "progress_segments",
                         "chain_checkpoint")
        }
        chain_fp = hashlib.sha256(
            _json.dumps(_fp_cfg, sort_keys=True, default=str).encode()
        ).hexdigest()[:16]

    def _run_seg(params_, x_init, y, key, phi0, opt0, eta_s, ts_seg, buf0,
                 eps0):
        def model_fn(x, t):
            return model.apply(params_, x, t)

        return guided_sample_loop(
            model_fn, schedule, x_init, y, key, operator, gcfg, scfg,
            sample_pattern=sample_pattern, record_every=record_every,
            phi_init=phi0, opt_state_init=opt0, eta_scale=eta_s,
            ts=ts_seg, x0_buf_init=buf0, eps_hist_init=eps0,
        )

    run_seg_fn = jax.jit(_run_seg)

    def _segment_base(T):
        """Non-final segments stay divisible by the hybrid block width so the
        full-gradient step placement matches the unsegmented chain."""
        k_align = (
            gcfg.x_prev_every
            if (gcfg.x_prev_every > 1
                and (gcfg.gradient_x_prev or gcfg.method == "ps")) else 1
        )
        return max(k_align, (T // progress_segments) // k_align * k_align)

    def _np_tree(t):
        return jax.tree_util.tree_map(np.asarray, t)

    def _make_chain_fn(single_fn, seg_fn, cat_axis=0, recarry=lambda s: s):
        """Build a chain runner for one batch shape: a single compiled scan by
        default, or chained segment calls when progress_segments > 1
        (identical results). With a journal (chain_checkpoint: True) the carry
        state persists at every boundary and an interrupted chain resumes from
        the last one. ``cat_axis`` is the trace-step axis of the result pytree
        (0 on the serial path, 1 on the vmapped fleet path, whose leaves carry
        a leading lane axis); ``recarry`` maps a segment's output sample back
        into the next segment's x input (the fleet runner's per-lane batch-1
        dim is squeezed)."""

        def chain(x_start, y, key, phi0, opt0, eta_s, logger=None,
                  journal=None, tag=(0, 0)):
            if progress_segments <= 1:
                return single_fn(x_start, y, key, phi0, opt0, eta_s)
            T = schedule.num_timesteps
            full_ts = np.arange(T - 1, -1, -1, dtype=np.int32)
            x_carry, phi_c, opt_c, buf_c, eps_c = x_start, phi0, opt0, None, None
            pieces, done, res = [], 0, None
            if journal is not None:
                part = journal.load_partial(tag)
                if part is not None:
                    done = int(part["done"])
                    x_carry, phi_c, opt_c = part["x"], part["phi"], part["opt"]
                    buf_c, eps_c = part["buf"], part["eps"]
                    # prefix telemetry re-enters the cat below as a pseudo-piece
                    pieces.append(_SNS(**part["traces"]))
                    if logger is not None:
                        logger.log(
                            f"  resuming chain at step {done}/{T} from the chain"
                            " checkpoint (bitwise-identical continuation)"
                        )
            # greedy segmentation: reproduces the aligned boundary layout from
            # 0 and continues cleanly from any saved (k-aligned) `done`
            base = _segment_base(T)
            while done < T:
                L = base if T - done >= 2 * base else T - done
                ts_seg = jnp.asarray(full_ts[done:done + L])
                res = seg_fn(
                    x_carry, y, key, phi_c, opt_c, eta_s, ts_seg, buf_c, eps_c,
                )
                x_carry, phi_c, opt_c = recarry(res.sample), res.phi, res.opt_state
                buf_c, eps_c = res.x0_snapshots, res.eps_hist
                pieces.append(res)
                done += L
                if journal is not None and done < T:
                    _tr = lambda get: jax.tree_util.tree_map(
                        lambda *xs: np.concatenate(
                            [np.asarray(x) for x in xs], cat_axis),
                        *[get(p) for p in pieces]
                    )
                    journal.save_partial(tag, {
                        "done": done,
                        "x": np.asarray(x_carry),
                        "phi": _np_tree(phi_c),
                        "opt": _np_tree(opt_c),
                        "buf": None if buf_c is None else np.asarray(buf_c),
                        "eps": (None if eps_c is None
                                else tuple(np.asarray(e) for e in eps_c)),
                        "traces": {
                            "sep_loss": _tr(lambda p: p.sep_loss),
                            "phi_trace": _tr(lambda p: p.phi_trace),
                            "aux_trace": _tr(lambda p: p.aux_trace),
                            "x0_std_trace": (
                                None if res.x0_std_trace is None
                                else _tr(lambda p: p.x0_std_trace)
                            ),
                        },
                    })
                    # fault injection (tests/test_chain_checkpoint.py): die
                    # after the N-th boundary save, process-wide
                    _CRASH_SAVES["n"] += 1
                    _after = int(os.environ.get(
                        "OSMOSIS_TPU_CRASH_AFTER_SEGMENTS", 0) or 0)
                    if _after and _CRASH_SAVES["n"] >= _after:
                        raise RuntimeError(
                            "injected crash: OSMOSIS_TPU_CRASH_AFTER_SEGMENTS="
                            f"{_after} reached"
                        )
                if logger is not None:
                    # tiny fetches (last trace row) — this sync point IS the
                    # progress mechanism. Lane-mean values on the fleet path.
                    _last = lambda a: np.take(np.asarray(a), -1, axis=cat_axis)
                    row = (
                        f"  progress {done:4d}/{T} steps"
                        f" (t={int(full_ts[done - 1])})"
                        f" loss={float(_last(res.sep_loss).mean()):9.3f}"
                    )
                    if res.x0_std_trace is not None:
                        row += f" x0_std={float(_last(res.x0_std_trace).mean()):.3f}"
                    phi_vals = {}
                    for k, v in res.phi_trace.items():
                        pv = _last(v).astype(np.float64)
                        phi_vals[k] = np.round(
                            pv.reshape(-1, pv.shape[-1]).mean(0), 3
                        ).tolist()
                    if phi_vals:
                        row += f" {phi_vals}"
                    logger.log(row)
            cat = lambda get: jax.tree_util.tree_map(
                lambda *xs: jnp.concatenate(xs, axis=cat_axis),
                *[get(p) for p in pieces]
            )
            return GuidedResult(
                sample=res.sample, pred_xstart=res.pred_xstart, phi=res.phi,
                sep_loss=cat(lambda p: p.sep_loss),
                phi_trace=cat(lambda p: p.phi_trace),
                aux_trace=cat(lambda p: p.aux_trace),
                x0_std_trace=(
                    cat(lambda p: p.x0_std_trace)
                    if res.x0_std_trace is not None else None
                ),
                opt_state=res.opt_state, x0_snapshots=res.x0_snapshots,
                eps_hist=res.eps_hist, snapshot_steps=res.snapshot_steps,
            )

        return chain

    # the serial (batch_size 1) chain runner
    _run_chain = _make_chain_fn(
        lambda *a: run_fn(params, *a),
        lambda *a: run_seg_fn(params, *a),
        cat_axis=0,
    )

    # cold-start phi / optimizer state (re-used as the warm-start carrier for
    # global_N>1 — the reference keeps the operator alive across global
    # iterations, osmosis_sampling.py:146-163 vs :191)
    from ..guidance.phi_optim import make_phi_optimizer

    phi_cold = {k: jnp.asarray(v) for k, v in operator.phi_init().items()}
    opt_cold = make_phi_optimizer(operator.optimizer, operator.etas()).init(phi_cold)

    # fleet mode: batch_size > 1 vmaps the batch-1 guided loop over image
    # stacks — exact per-image semantics (independent phi/losses), one MXU
    # batch dimension, dp-shardable on multi-chip meshes
    fleet_size = batch_size if batch_size and batch_size > 1 else 1
    if fleet_size > 1:
        from ..guidance.operators import get_operator as _get_op
        from ..parallel.runner import (
            make_batched_guided_runner,
            make_batched_segment_runner,
        )

        fleet_operator = _get_op(operator_name, batch_size=1, **op_kwargs)
        fleet_run = make_batched_guided_runner(
            model.apply, schedule, fleet_operator, gcfg, scfg,
            sample_pattern=sample_pattern, record_every=record_every,
        )
        fleet_seg_run = None
        if progress_segments > 1:
            fleet_seg_run = make_batched_segment_runner(
                model.apply, schedule, fleet_operator, gcfg, scfg,
                sample_pattern=sample_pattern, record_every=record_every,
            )
        # same segmentation/journal machinery as the serial path; the trace
        # axis shifts by the leading lane dim and the per-lane batch-1 sample
        # squeezes back into the next segment's [N,H,W,C] input
        fleet_chain = _make_chain_fn(
            lambda *a: fleet_run(params, *a),
            (None if fleet_seg_run is None
             else lambda *a: fleet_seg_run(params, *a)),
            cat_axis=1,
            recarry=lambda s: s[:, 0],
        )

        def make_chunk_journal(chunk):
            """Per-chunk durable state: the fingerprint binds the chunk's
            image composition so a resume with shifted membership ignores
            the stale state instead of mis-assigning lanes."""
            if not chain_checkpoint:
                return None
            import hashlib as _hl

            comp = ",".join(f"{idx}:{name}" for idx, _, name, _ in chunk)
            fp = chain_fp + "-" + _hl.sha256(comp.encode()).hexdigest()[:8]
            return ChainJournal(out_path, f"chunk_{chunk[0][0]:05d}", fp)

    global_N = 1
    if sample_pattern["pattern"] == "pcgs":
        global_N = sample_pattern.get("global_N", 1)
    elif sample_pattern["pattern"] != "original":
        raise ValueError(f"Unrecognized sample pattern: {sample_pattern['pattern']}")
    # extension (default False == reference parity): reset the phi
    # OPTIMIZER state between global chains while phi itself warm-starts.
    # Adam/RMSprop moments integrated over chain k over-step when chain k+1
    # replays the schedule from pure noise (VALIDATION.md 3c measured the
    # carried-moments variant worse at toy scale).
    global_opt_reset = bool(sample_pattern.get("global_opt_reset", False))
    # extension (default 1.0 == reference parity): geometric phi-eta decay
    # across global chains — chain ii runs with etas * scale**ii. A
    # warm-started phi only needs small corrections; full-strength updates
    # against the early chain's noisy x0-hats drag it off its converged
    # value (VALIDATION.md 3c). Passed as a TRACED scalar so all chains
    # share one executable.
    _ges = sample_pattern.get("global_eta_scale")  # 0.0 is legal (freeze)
    global_eta_scale = 1.0 if _ges is None else float(_ges)

    stop_after = data_config.get("stop_after", -1)

    if fleet_size > 1:
        _run_fleet(
            args, dataset, paths, fleet_chain, operator, measure_config,
            logger, gt_flag, image_size, fleet_size, stop_after, noiser,
            record_every, rgb_guidance, resume=resume, global_N=global_N,
            multihost=multihost, make_chunk_journal=make_chunk_journal,
        )
        if multihost:
            MH.barrier("fleet_done")
        logger.log(prof.TIMERS.summary())
        logger.close()
        return out_path

    # OPTIONAL async postprocessing (perf knob async_save): the device
    # fetch happens on the MAIN thread (device idle at that point); only
    # the host-CPU postprocess/PNG work runs in the worker while the device
    # executes the next chain. The original worker-side fetch variant
    # measured NEGATIVE through the axon relay (fetch-during-execute
    # contention, 8-20 s/image erratic vs 7 s synchronous — PERF.md round
    # 11), which is why the split is fetch-sync / save-async.
    import concurrent.futures as _cf

    async_save = bool(PF.get("async_save"))
    saver = _cf.ThreadPoolExecutor(max_workers=1) if async_save else None
    pending = []

    def _await_saves():
        for f in pending:
            f.result()  # re-raises worker exceptions
        pending.clear()

    def _finish_image(res, ref_np, ref_img_name, orig_name, global_ii,
                      gt, start_time):
        res = jax.tree_util.tree_map(np.asarray, res)
        with prof.phase("postprocess+save"):
            if rgb_guidance:
                _save_rgb_guidance_outputs(
                    args, paths, orig_name, ref_np[0],
                    np.asarray(res.sample)[0], logger,
                )
            else:
                _save_osmosis_outputs(
                    args, paths, orig_name, global_ii, ref_np[0], res, operator,
                    measure_config, logger, gt=gt,
                )
            if record_every is not None and paths["grids"] is not None:
                _save_process_grid(
                    res.snapshots, pjoin(paths["grids"], f"{orig_name}_process.png")
                )
        if not rgb_guidance:
            _log_trace_summary(logger, res)
        dt = datetime.datetime.now() - start_time
        logger.log(f"Run time: {dt}")
        logger.logkv("image", ref_img_name)
        logger.logkv("global_iter", global_ii)
        logger.logkv("seconds", dt.total_seconds())
        logger.logkv("final_loss", float(np.asarray(res.sep_loss)[-1].mean()))
        # chain health stamp (VERDICT r4 weak #4): lets perf artifacts
        # (bench.py / tools/bench_presets.py) distinguish a timed-but-
        # diverged chain (random-init weights) from a real restoration
        x0_final = getattr(res, "pred_xstart", None)
        if x0_final is None:
            x0_final = res.sample
        logger.logkv("chain_finite",
                     bool(np.isfinite(np.asarray(x0_final)).all()))
        # final phi per channel as scalar KVs (CSV-safe, tfevents-visible);
        # tools/evaluate.py --manifest consumes these for recovered-phi error
        for pname, pval in getattr(res, "phi", {}).items():
            for ci, v in enumerate(np.asarray(pval)[0].tolist()):
                logger.logkv(f"{pname}_{ci}", round(float(v), 6))
        logger.dumpkvs()

    for i, (ref_img, ref_img_name) in enumerate(dataset):
        if i == stop_after:
            break
        if multihost and (i % jax.process_count()) != jax.process_index():
            continue  # another host owns this image
        if gt_flag:
            ref_img, gt_rgb, gt_depth = ref_img
        start_time = datetime.datetime.now()
        orig_name = os.path.splitext(ref_img_name)[0]
        # per-image resumability (SURVEY.md section 5): skip finished images
        if resume and paths.get("rgb") and os.path.exists(
            pjoin(paths["rgb"], f"{orig_name}.png")
        ):
            logger.log(f"skipping image {i}: {ref_img_name} (output exists)")
            continue
        logger.log(f"\nInference image {i}: {ref_img_name}\n")

        # durable chain state (chain_checkpoint: True) — completed chains
        # replay from disk, the in-flight chain resumes at its last
        # progress_segments boundary (utils/chainjournal.py)
        journal, saved_chains = None, {}
        if chain_checkpoint:
            journal = ChainJournal(out_path, orig_name, chain_fp)
            saved_chains = journal.load_chains()
            if saved_chains:
                logger.log(
                    f"chain checkpoint: {len(saved_chains)} completed "
                    "chain(s) restored from a previous run"
                )

        ref_np = ref_img[None]  # [1,H,W,3]
        y = jnp.asarray(ref_np)
        noise_key = jax.random.fold_in(jax.random.key(args.manual_seed + 1), i)
        y = noiser(y, key=noise_key)
        if getattr(args, "degamma_input", False):
            y = jnp.asarray(TR.degamma(np.asarray(y)))

        # best_of>1 (extension; default 1 == reference semantics): rerun the
        # whole chain from different noise seeds and keep the lowest final
        # measurement loss. The wrong-basin joint (J, phi) mode announces
        # itself with a much higher final loss (VALIDATION.md 3b-iii), so
        # loss-based selection needs no ground truth. Companion knobs:
        #   accept_loss: X — stop restarting once a trial's final loss is
        #     <= X (good chains accept on trial 0, so the adaptive cost is
        #     ~1 chain/image; only basin-stuck images escalate);
        #   phi_jitter: sigma — trials >0 jitter the phi INIT by N(0, s^2),
        #     diversifying the basin of attraction when every noise seed
        #     falls into the same wrong (J, phi) mode.
        best_of = int(getattr(args, "best_of", 1) or 1)
        accept_loss = getattr(args, "accept_loss", None)
        phi_jitter = float(getattr(args, "phi_jitter", 0.0) or 0.0)
        best_trial, best_fl = None, None
        for try_k in range(best_of):
            # trial 0 uses the reference's exact seed derivation; later
            # trials offset the seed (7919 = a prime far from small seeds)
            trial_seed = args.manual_seed + 7919 * try_k
            phi_try = phi_cold
            if try_k and phi_jitter > 0:
                jkey = jax.random.fold_in(jax.random.key(trial_seed), 2)
                phi_try = {
                    k: v + phi_jitter * jax.random.normal(
                        jax.random.fold_in(jkey, n), v.shape)
                    for n, (k, v) in enumerate(sorted(phi_cold.items()))
                }
            # phi and its optimizer state reset at image boundaries, persist
            # across global iterations (warm start — the point of GibbsDDRM's
            # outer loop; osmosis_sampling.py:146-163 creates the operator
            # outside the :191 global loop)
            phi_carry, opt_carry = phi_try, opt_cold
            trial = []
            for global_ii in range(global_N):
                logger.log(f"global iteration: {global_ii}\n")
                # seed reset per global iteration (osmosis_sampling.py:194)
                key = jax.random.key(trial_seed)
                x_start = jax.random.normal(
                    jax.random.fold_in(key, 0), (1, image_size, image_size, 4)
                )
                eta_s = (
                    None if global_eta_scale == 1.0
                    else jnp.float32(global_eta_scale ** global_ii)
                )
                if (try_k, global_ii) in saved_chains:
                    res = saved_chains[(try_k, global_ii)]
                    logger.log(
                        f"chain (restart {try_k}, global {global_ii}): "
                        "replayed from the chain checkpoint"
                    )
                else:
                    with prof.phase("sample"):
                        res = _run_chain(
                            x_start, y, jax.random.fold_in(key, 1),
                            phi_carry, opt_carry, eta_s, logger=logger,
                            journal=journal, tag=(try_k, global_ii),
                        )
                    if journal is not None:
                        journal.save_chain(
                            try_k, global_ii,
                            jax.tree_util.tree_map(np.asarray, res),
                        )
                        journal.clear_partial()
                # device arrays thread into the next global iteration without
                # a host round-trip; the save path fetches its own copy
                phi_carry = res.phi
                opt_carry = opt_cold if global_opt_reset else res.opt_state
                trial.append(res)
            fl = float(np.asarray(trial[-1].sep_loss)[-1].mean())
            if best_of > 1:
                logger.log(f"restart {try_k}: final loss {fl:.4f}")
            if _better_loss(fl, best_fl):
                best_trial, best_fl = trial, fl
            if accept_loss is not None and best_fl <= float(accept_loss):
                break
        if best_of > 1:
            logger.log(f"kept restart with final loss {best_fl:.4f}")

        gt = (gt_rgb, gt_depth) if gt_flag else None
        for global_ii, res in enumerate(best_trial):
            if async_save:
                res_np = jax.tree_util.tree_map(np.asarray, res)
                pending.append(saver.submit(
                    _finish_image, res_np, ref_np, ref_img_name, orig_name,
                    global_ii, gt, start_time,
                ))
            else:
                _finish_image(res, ref_np, ref_img_name, orig_name,
                              global_ii, gt, start_time)
        # surface worker failures promptly (at most one image behind)
        if async_save and len(pending) > 2 * max(global_N, 1):
            _await_saves()
        if journal is not None:
            # outputs exist (or are queued) — the durable state has served
            # its purpose; a crash inside the async window re-runs at image
            # granularity, which the resume skip-check already handles
            journal.clear()

    _await_saves()
    if saver is not None:
        saver.shutdown(wait=True)

    if multihost:
        # all hosts finish their slices before rank 0's summary is complete
        MH.barrier("serial_done")
        logger.log(
            "multi-host: all processes finished "
            f"(this rank: {jax.process_index()})"
        )
    logger.log(prof.TIMERS.summary())
    logger.close()
    return out_path


def _save_osmosis_outputs(
    args, paths, orig_name, global_ii, ref_img, res, operator, measure_config, logger,
    gt=None,
):
    """osmosis_sampling.py:204-358: split rgb/depth, physical recomposition,
    phi logging, singles + grid saving."""
    x0 = np.asarray(res.pred_xstart)[0]  # [H,W,4]
    if not np.isfinite(x0).all():
        logger.log(
            "WARNING: non-finite outputs — the chain diverged. This is "
            "expected when sampling with randomly initialized weights "
            "(no checkpoint at unet_model.model_path)."
        )
    sample_rgb = x0[..., 0:3]
    sample_depth = x0[..., 3]

    ref01 = P.to_01(ref_img)
    rgb01 = P.to_01(sample_rgb)
    rgb01_clip = P.clip01(rgb01)
    depth_mm = P.min_max_norm_range(sample_depth)
    depth_pmm = P.min_max_norm_range_percentile(
        sample_depth, percent_low=0.03, percent_high=0.99
    )
    depth_color = P.depth_to_color(depth_pmm)

    op_cfg = measure_config["operator"]
    depth_calc = np.asarray(
        convert_depth(
            jnp.asarray(sample_depth[..., None]),
            operator.depth_type, operator.depth_value,
        )
    )

    phi = {k: np.asarray(v)[0] for k, v in res.phi.items()}  # [C]
    phi_inf = phi["phi_inf"].reshape(1, 1, -1)
    final_loss = np.asarray(res.sep_loss)[-1]

    if "underwater_physical_revised" in operator.name:
        phi_a = phi["phi_a"].reshape(1, 1, -1)
        phi_b = phi["phi_b"].reshape(1, 1, -1)
        backscatter = phi_inf * (1 - np.exp(-phi_b * depth_calc))
        attenuation = np.exp(-phi_a * depth_calc)
        forward_pred = rgb01 * attenuation + backscatter
        degraded = 2 * forward_pred - 1
        norm_loss = np.round([np.linalg.norm(degraded - ref_img)], decimals=3)
        recon = np.exp(phi_a * depth_calc) * (ref01 - backscatter)
        logger.log(
            f"\nInitialized values: "
            f"\nphi_a: [{op_cfg['phi_a']}], lr: {op_cfg['phi_a_eta']}"
            f"\nphi_b: [{op_cfg['phi_b']}], lr: {op_cfg['phi_b_eta']}"
            f"\nphi_inf: [{op_cfg['phi_inf']}], lr: {op_cfg['phi_inf_eta']}"
            f"\n\nResults values: "
            f"\nphi_a: {np.round(phi['phi_a'], 3).tolist()}"
            f"\nphi_b: {np.round(phi['phi_b'], 3).tolist()}"
            f"\nphi_inf: {np.round(phi['phi_inf'], 3).tolist()}"
            f"\n\nNorm loss: {norm_loss}"
            f"\nFinal loss: {np.round(final_loss, 3)}"
        )
    elif ("haze" in operator.name) or ("underwater_physical" in operator.name):
        phi_ab = phi["phi_ab"].reshape(1, 1, -1)
        backscatter = phi_inf * (1 - np.exp(-phi_ab * depth_calc))
        attenuation = np.exp(-phi_ab * depth_calc)
        forward_pred = rgb01 * attenuation + backscatter
        degraded = 2 * forward_pred - 1
        norm_loss = np.round([np.linalg.norm(degraded - ref_img)], decimals=3)
        recon = np.exp(phi_ab * depth_calc) * (ref01 - backscatter)
        logger.log(
            f"\nInitialized values: "
            f"\nphi_ab: [{op_cfg['phi_ab']}], lr: {op_cfg['phi_ab_eta']}"
            f"\nphi_inf: [{op_cfg['phi_inf']}], lr: {op_cfg['phi_inf_eta']}"
            f"\n\nResults values: "
            f"\nphi_ab: {np.round(phi['phi_ab'], 3)}"
            f"\nphi_inf: {np.round(phi['phi_inf'], 3)}"
            f"\n\nNorm loss: {norm_loss}"
            f"\nFinal loss: {np.round(final_loss, 5)}"
        )
    else:
        raise NotImplementedError("Operator can be for 'underwater' or 'haze'")

    if args.save_singles:
        P.save_png(ref01, pjoin(paths["input"], f"{orig_name}.png"))
        P.save_png(rgb01_clip, pjoin(paths["rgb"], f"{orig_name}.png"))
        P.save_png(depth_color, pjoin(paths["depth_color"], f"{orig_name}.png"))
        P.save_png(depth_mm, pjoin(paths["depth_raw"], f"{orig_name}.png"))

    if args.save_grids:
        grid_list = [ref01, rgb01_clip, depth_color]
        if gt is not None:
            gt_rgb, gt_depth = gt
            grid_list += [
                np.zeros_like(rgb01),
                P.to_01(gt_rgb),
                P.depth_to_color(P.to_01(gt_depth)[..., 0]),
            ]
        grid = P.make_grid(grid_list, nrow=3, pad_value=1.0)
        P.save_png(grid, pjoin(paths["grids"], f"{orig_name}_g{global_ii}_grid.png"))

    if args.save_singles or args.save_grids:
        logger.log(f"result images was saved into: {paths['out']}")


def _save_rgb_guidance_outputs(args, paths, orig_name, ref_img, sample, logger):
    """osmosis_sampling.py:361-406: rgb-guidance output saving (from the
    final SAMPLE, not x0-hat)."""
    sample_rgb = sample[..., 0:3]
    sample_depth = sample[..., 3]
    ref01 = P.to_01(ref_img)
    rgb01_clip = P.clip01(P.to_01(sample_rgb))
    depth_mm = P.min_max_norm_range(sample_depth)
    depth_pmm = P.min_max_norm_range_percentile(
        sample_depth, percent_low=0.05, percent_high=0.99
    )
    depth_color = P.depth_to_color(depth_pmm)

    if args.save_singles:
        P.save_png(ref01, pjoin(paths["input"], f"{orig_name}.png"))
        P.save_png(rgb01_clip, pjoin(paths["rgb"], f"{orig_name}.png"))
        P.save_png(depth_color, pjoin(paths["depth_color"], f"{orig_name}.png"))
        P.save_png(depth_mm, pjoin(paths["depth_raw"], f"{orig_name}.png"))
    if args.save_grids:
        grid = P.make_grid([ref01, rgb01_clip, depth_color], nrow=3, pad_value=1.0)
        P.save_png(grid, pjoin(paths["grids"], f"{orig_name}.png"))
    if args.save_singles or args.save_grids:
        logger.log(f"result images was saved into: {paths['out']}")


def _run_fleet(
    args, dataset, paths, fleet_chain, operator, measure_config, logger,
    gt_flag, image_size, fleet_size, stop_after, noiser, record_every,
    rgb_guidance, resume=False, global_N=1, multihost=False,
    make_chunk_journal=None,
):
    """Batched fleet execution: chunks of `batch_size` images through the
    vmapped guided loop (exact batch-1 semantics per image: per-image
    measurement-noise keys identical to the serial path, per-image phi,
    GT grids, resume, global_N warm starts). The reference only nominally
    supports batch>1 (SURVEY.md section 2.7); here it is a first-class
    throughput mode. The tail chunk runs at its natural (smaller) batch —
    one extra jit trace instead of wasted duplicate compute.

    ``fleet_chain`` is a _make_chain_fn closure: segmented when
    progress_segments > 1 (per-boundary lane-mean progress rows) and, with
    ``make_chunk_journal`` (chain_checkpoint: True), durable at every
    boundary — the chunk resumes MID-CHAIN after a preemption with
    bitwise-identical results (tests/test_chain_checkpoint.py)."""
    items = []
    for i, (ref_img, ref_img_name) in enumerate(dataset):
        if i == stop_after:
            break
        if multihost and (i % jax.process_count()) != jax.process_index():
            continue  # another host owns this image
        gt = None
        if gt_flag:
            ref_img, gt_rgb, gt_depth = ref_img
            gt = (gt_rgb, gt_depth)
        orig_name = os.path.splitext(ref_img_name)[0]
        # per-image resumability, same contract as the serial path
        if resume and paths.get("rgb") and os.path.exists(
            pjoin(paths["rgb"], f"{orig_name}.png")
        ):
            logger.log(f"skipping image {i}: {ref_img_name} (output exists)")
            continue
        items.append((i, ref_img, ref_img_name, gt))

    noise_root = jax.random.key(args.manual_seed + 1)

    # loss-selected restarts (best_of / accept_loss / phi_jitter) on the
    # fleet path: every trial reruns the WHOLE chunk (same batch shape ⇒ one
    # executable, no per-trial recompiles) and the best chain is kept
    # PER LANE by final measurement loss. Restarts stop early once every
    # lane's best loss is under accept_loss — good chunks accept on trial 0,
    # so the adaptive cost matches the serial path (~1 chain/image); only
    # chunks holding a basin-stuck image escalate, at the cost of re-running
    # their already-accepted lanes (bounded by best_of, traded for zero
    # recompilation). Trial seeds/jitter match the serial path exactly:
    # trial_seed = manual_seed + 7919*k is image-independent there too.
    best_of = int(getattr(args, "best_of", 1) or 1)
    accept_loss = getattr(args, "accept_loss", None)
    phi_jitter = float(getattr(args, "phi_jitter", 0.0) or 0.0)

    for c0 in range(0, len(items), fleet_size):
        chunk = items[c0 : c0 + fleet_size]
        n_real = len(chunk)
        if n_real < fleet_size:
            logger.log(
                f"tail chunk of {n_real} images: compiling a batch-{n_real} "
                f"variant (no duplicate compute on padding)"
            )
        journal = make_chunk_journal(chunk) if make_chunk_journal else None
        saved_chains = journal.load_chains() if journal is not None else {}
        if saved_chains:
            logger.log(
                f"chain checkpoint: {len(saved_chains)} completed fleet "
                "chain(s) restored from a previous run"
            )
        start_time = datetime.datetime.now()
        ys_np = np.stack([im for _, im, _, _ in chunk])
        # per-image measurement-noise keys — identical stream to the serial
        # path's fold_in(key(manual_seed+1), dataset_index)
        ys = jnp.stack([
            noiser(jnp.asarray(ys_np[j])[None],
                   key=jax.random.fold_in(noise_root, chunk[j][0]))[0]
            for j in range(n_real)
        ])
        # noise first, THEN degamma — same order as the serial path and the
        # reference (osmosis_sampling.py:170-175); applying degamma before
        # the noiser gave fleet lanes a different measurement than serial
        if getattr(args, "degamma_input", False):
            ys = jnp.asarray(TR.degamma(np.asarray(ys)))

        _ges = args.sample_pattern.get("global_eta_scale")  # 0.0 legal
        g_eta = 1.0 if _ges is None else float(_ges)

        best_fl = np.full((n_real,), np.inf)
        # per lane: list over global_ii of that lane's result pytree, taken
        # from its best trial so far
        best_res = [None] * n_real
        for try_k in range(best_of):
            trial_seed = args.manual_seed + 7919 * try_k
            tkey = jax.random.key(trial_seed)
            x_one = jax.random.normal(
                jax.random.fold_in(tkey, 0), (image_size, image_size, 4)
            )
            run_key = jax.random.fold_in(tkey, 1)
            xs = jnp.broadcast_to(x_one, (n_real,) + x_one.shape)
            keys = jnp.broadcast_to(run_key, (n_real,) + run_key.shape)

            phi0s = opt0s = None  # cold start on the first global iteration
            if try_k and phi_jitter > 0:
                # same jitter stream as the serial path (image-independent)
                jkey = jax.random.fold_in(jax.random.key(trial_seed), 2)
                # per-lane phi is batch-1 inside the vmapped runner; this
                # operator's phi_init is [fleet_size, C] — slice to [1, C]
                phi1 = {
                    k: jnp.asarray(v)[:1] for k, v in operator.phi_init().items()
                }
                phi_try = {
                    k: v + phi_jitter * jax.random.normal(
                        jax.random.fold_in(jkey, n), v.shape)
                    for n, (k, v) in enumerate(sorted(phi1.items()))
                }
                phi0s = jax.tree_util.tree_map(
                    lambda a: jnp.broadcast_to(a, (n_real,) + a.shape), phi_try
                )

            trial = []  # over global_ii, full-batch numpy results
            for global_ii in range(global_N):
                if global_N > 1:
                    logger.log(f"global iteration: {global_ii}\n")
                eta_s = None if g_eta == 1.0 else jnp.float32(g_eta ** global_ii)
                if (try_k, global_ii) in saved_chains:
                    res = saved_chains[(try_k, global_ii)]
                    logger.log(
                        f"fleet chain (restart {try_k}, global {global_ii}): "
                        "replayed from the chain checkpoint"
                    )
                else:
                    with prof.phase("fleet_sample"):
                        res = fleet_chain(
                            xs, ys, keys, phi0s, opt0s, eta_s, logger=logger,
                            journal=journal, tag=(try_k, global_ii),
                        )
                        res = jax.tree_util.tree_map(np.asarray, res)
                    if journal is not None:
                        journal.save_chain(try_k, global_ii, res)
                        journal.clear_partial()
                phi0s = res.phi
                # global_opt_reset (see the serial path): None re-inits cold
                if args.sample_pattern.get("global_opt_reset"):
                    opt0s = None
                else:
                    opt0s = res.opt_state
                trial.append(res)

            fls = np.asarray([
                float(np.asarray(trial[-1].sep_loss)[j][-1].mean())
                for j in range(n_real)
            ])
            if best_of > 1:
                logger.log(
                    f"restart {try_k}: final losses "
                    f"{np.round(fls, 4).tolist()}"
                )
            for j in range(n_real):
                # trial 0 always seeds the per-lane best (best_res[j] None);
                # _better_loss handles the NaN-seeded-lane displacement
                if best_res[j] is None or _better_loss(fls[j], best_fl[j]):
                    best_fl[j] = fls[j]
                    best_res[j] = [
                        jax.tree_util.tree_map(lambda a: a[j], g) for g in trial
                    ]
            if accept_loss is not None and (best_fl <= float(accept_loss)).all():
                break
        if best_of > 1:
            logger.log(
                f"kept restarts with final losses "
                f"{np.round(best_fl, 4).tolist()}"
            )

        for global_ii in range(global_N):
            with prof.phase("fleet_save"):
                for j in range(n_real):
                    _, ref_img, name, gt = chunk[j]
                    orig_name = os.path.splitext(name)[0]
                    res_j = best_res[j][global_ii]
                    if rgb_guidance:
                        _save_rgb_guidance_outputs(
                            args, paths, orig_name, ref_img,
                            np.asarray(res_j.sample)[0], logger,
                        )
                    else:
                        _save_osmosis_outputs(
                            args, paths, orig_name, global_ii, ref_img, res_j,
                            operator, measure_config, logger, gt=gt,
                        )
                        _log_trace_summary(logger, res_j)
                    if record_every is not None and paths["grids"] is not None:
                        _save_process_grid(
                            res_j.snapshots,
                            pjoin(paths["grids"], f"{orig_name}_process.png"),
                        )
                    # same per-image progress row as the serial path (incl.
                    # per-channel phi for tools/evaluate.py --manifest)
                    logger.logkv("image", name)
                    logger.logkv("global_iter", global_ii)
                    logger.logkv(
                        "final_loss",
                        float(np.asarray(res_j.sep_loss)[-1].mean()),
                    )
                    for pname, pval in getattr(res_j, "phi", {}).items():
                        for ci, v in enumerate(np.asarray(pval)[0].tolist()):
                            logger.logkv(f"{pname}_{ci}", round(float(v), 6))
                    logger.dumpkvs()
        if journal is not None:
            # chunk outputs exist — the durable state has served its purpose
            journal.clear()
        logger.log(
            f"fleet chunk {c0 // fleet_size}: {n_real} images in "
            f"{datetime.datetime.now() - start_time}"
        )
