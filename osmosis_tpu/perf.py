"""Performance-knob configuration surface.

Every trace-time perf knob lives here as a field of one module-level
``PerfConfig`` instance, settable three ways (highest precedence first):

  1. ``OSMOSIS_TPU_*`` environment variables — debugging override only;
  2. the optional ``perf:`` section of a run's YAML config
     (pipelines call :func:`configure_from_dict` before tracing);
  3. the measured-best defaults below (PERF.md round-3 ladder).

The EFFECTIVE values (after env overrides) are written into every run
directory's ``configurations.txt`` so any measured number is reproducible
from its run dir — the reference's config-snapshot contract
(osmosis_utils/utils.py:365-375) extended to the perf dimension.

TRACE-TIME SEMANTICS (important): these knobs are read while JAX *traces*
a jitted function. Changing a knob after an ``apply`` has been traced (or
when the executable comes out of the persistent compilation cache) has no
effect on that executable. Tools that A/B knobs must set them BEFORE the
first call of each variant and use distinct jitted callables (see
tools/validate_checkpoint.py, tests/test_strip_conv.py).
"""

from __future__ import annotations

import dataclasses
import os
from typing import Dict


@dataclasses.dataclass
class PerfConfig:
    # strip-batched conv representation (models/nn.py strip section)
    strip_conv: bool = True       # OSMOSIS_TPU_STRIP_CONV
    strip_count: int = 16         # OSMOSIS_TPU_STRIP_COUNT
    strip_min_tokens: int = 1024  # OSMOSIS_TPU_STRIP_MIN_TOKENS
    strip_bwd: str = "rot"        # OSMOSIS_TPU_STRIP_BWD: rot|flat|raw
    # fused GroupNorm(+FiLM)+SiLU custom VJPs (models/nn.py)
    fused_norm_silu: bool = True  # OSMOSIS_TPU_FUSED_NORM_SILU
    # guided-scan body unroll factor (diffusion/guided.py). 2 measured
    # +0.8% steps/s on 200-step production scans (consistent across 6
    # runs, PERF.md round 5); the halved scan-iteration overhead beats
    # the doubled body. Cold compile ~2.8 min vs ~30 s at unroll 1
    # (once per config; the persistent cache covers warm starts).
    scan_unroll: int = 2          # OSMOSIS_TPU_SCAN_UNROLL
    # store GroupNorm scale/bias in bf16 (models/convert.py cast_params_half;
    # math stays fp32 — GroupNorm32 upcasts at the use site). Experiment for
    # the ~2.1 ms/step of async f32-affine stagings the round-3 profile
    # attributed to scoped-memory copies (PERF.md round 3 end state).
    gn_affine_bf16: bool = False  # OSMOSIS_TPU_GN_AFFINE_BF16
    # unroll factor for the hybrid (x_prev_every>1) outer block scan; the
    # block body is already k-wide, so this multiplies compile size — keep 1
    # unless measured otherwise (diffusion/guided.py)
    hybrid_scan_unroll: int = 1   # OSMOSIS_TPU_HYBRID_SCAN_UNROLL
    # overlap host postprocessing with the next chain (pipelines/restore.py)
    async_save: bool = False      # OSMOSIS_TPU_ASYNC_SAVE
    # negative-result record: Pallas nearest-2x upsample (models/nn.py)
    pallas_upsample: bool = False  # OSMOSIS_TPU_PALLAS_UPSAMPLE


# the single live instance; tools/tests mutate it via set_perf()
_CONFIG = PerfConfig()

_ENV = {
    "strip_conv": "OSMOSIS_TPU_STRIP_CONV",
    "strip_count": "OSMOSIS_TPU_STRIP_COUNT",
    "strip_min_tokens": "OSMOSIS_TPU_STRIP_MIN_TOKENS",
    "strip_bwd": "OSMOSIS_TPU_STRIP_BWD",
    "fused_norm_silu": "OSMOSIS_TPU_FUSED_NORM_SILU",
    "scan_unroll": "OSMOSIS_TPU_SCAN_UNROLL",
    "gn_affine_bf16": "OSMOSIS_TPU_GN_AFFINE_BF16",
    "hybrid_scan_unroll": "OSMOSIS_TPU_HYBRID_SCAN_UNROLL",
    "async_save": "OSMOSIS_TPU_ASYNC_SAVE",
    "pallas_upsample": "OSMOSIS_TPU_PALLAS_UPSAMPLE",
}

# legacy alias: OSMOSIS_TPU_STRIP_BWD_FLAT=1 == OSMOSIS_TPU_STRIP_BWD=flat
_BWD_FLAT_ENV = "OSMOSIS_TPU_STRIP_BWD_FLAT"


def _coerce(field_type, raw: str):
    if field_type is bool:
        return raw not in ("0", "false", "False", "")
    if field_type is int:
        return int(raw)
    return raw


def get(name: str):
    """Effective value of one knob: env override if set, else the config."""
    env = os.environ.get(_ENV[name])
    if name == "strip_bwd" and os.environ.get(_BWD_FLAT_ENV) == "1":
        return "flat"
    if env is not None and env != "":
        ftype = type(getattr(PerfConfig(), name))
        return _coerce(ftype, env)
    return getattr(_CONFIG, name)


def set_perf(**fields) -> None:
    """Explicitly set knobs (tools / tests). Unknown names raise."""
    for k, v in fields.items():
        if not hasattr(_CONFIG, k):
            raise KeyError(f"unknown perf knob: {k}")
        setattr(_CONFIG, k, v)


def configure_from_dict(d) -> None:
    """Apply a YAML config's optional ``perf:`` section."""
    if not d:
        return
    set_perf(**{k: v for k, v in dict(d).items()})


def effective() -> Dict[str, object]:
    """All knobs at their effective (env-overridden) values — what a trace
    started now would actually use; goes into the run-dir snapshot."""
    return {name: get(name) for name in _ENV}


def snapshot_text() -> str:
    lines = ["", "# effective perf knobs (osmosis_tpu.perf; env overrides applied)"]
    for k, v in effective().items():
        lines.append(f"perf.{k}: {v}")
    return "\n".join(lines) + "\n"
