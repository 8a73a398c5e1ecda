"""Device mesh + sharding layout for multi-chip execution.

The reference is strictly single-GPU (SURVEY.md section 2.7 — no
torch.distributed anywhere); the TPU-native framework makes parallelism a
first-class layer instead:

  * **dp** (data parallel): independent images shard over the batch axis —
    the natural scaling dimension for this workload (images are embarrassingly
    parallel; collectives ride ICI only for parameter broadcast).
  * **tp** (tensor parallel): UNet channels shard over the feature axis.
    Conv kernels [kh, kw, in, out], qkv/proj Dense kernels [in, out] and the
    time-embed MLP split their OUTPUT features across 'tp'; GSPMD inserts the
    matching collectives (all-gathers at layer boundaries / psums) automatically.
    Useful for large-batch throughput serving where weights dominate HBM.

Pipeline/sequence/expert parallelism are intentionally absent: attention runs
over ≤1024 spatial tokens (SURVEY.md section 5) and the model is a single
dense UNet — there is nothing to pipeline or route.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_devices: Optional[int] = None, dp: Optional[int] = None, tp: Optional[int] = None
) -> Mesh:
    """Build a (dp, tp) mesh over the first n_devices devices.

    Defaults: all devices, tp chosen as the largest power of two ≤ 4 that
    divides the device count (tp=1 ⇒ pure DP, the sweet spot for batch-1
    latency; raise tp for weight-bound serving).
    """
    devices = jax.devices()
    n = n_devices or len(devices)
    devices = np.asarray(devices[:n])
    if dp is None or tp is None:
        tp = tp or max(d for d in (4, 2, 1) if n % d == 0)
        dp = dp or n // tp
    assert dp * tp == n, f"dp({dp}) * tp({tp}) != devices({n})"
    return Mesh(devices.reshape(dp, tp), axis_names=("dp", "tp"))


def _param_spec(path: tuple, leaf) -> P:
    """Partition rule: shard the trailing (output-feature) axis over 'tp'
    when divisible; replicate otherwise."""
    del path
    if leaf.ndim >= 1 and leaf.shape[-1] % 4 == 0 and leaf.shape[-1] >= 8:
        return P(*([None] * (leaf.ndim - 1) + ["tp"]))
    return P()


def shard_params(params, mesh: Mesh):
    """Place a parameter pytree with tensor-parallel output-feature sharding."""

    def place(path, leaf):
        spec = _param_spec(path, leaf)
        # only shard if the tp axis actually divides the dim
        if "tp" in spec and leaf.shape[-1] % mesh.shape["tp"] != 0:
            spec = P()
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(place, params)


def shard_batch(x, mesh: Mesh):
    """Shard the leading batch axis over 'dp', replicate across 'tp'."""
    return jax.device_put(x, NamedSharding(mesh, P("dp")))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("dp"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
