"""torch → flax checkpoint conversion for the ADM UNet.

The reference loads a single PyTorch pickle state_dict
(``osmosis_outdoor.pt``, ~2.2 GB fp32; guided_diffusion/unet.py:94-98,
README.md:52-54) into the module tree built by UNetModel.__init__. This
converter replays the exact same construction order via
:func:`osmosis_tpu.models.unet.build_plan` and maps every tensor:

  * Linear  [out, in]         → Dense kernel [in, out] (transpose)
  * Conv2d  [O, I, kH, kW]    → Conv kernel [kH, kW, I, O]
  * Conv1d qkv [3C, C, 1]     → Dense kernel [C, 3C] with the legacy
    head-major→part-major channel permutation (unet.py:416-433 vs 449-468)
  * GroupNorm weight/bias     → scale/bias

Missing checkpoints fall back to random init with a warning, mirroring
unet.py:94-98 (required by the test fixtures).
"""

from __future__ import annotations

import os
from typing import Any, Dict

import numpy as np

from .unet import UNetConfig, build_plan


def _conv_kernel(w: np.ndarray) -> np.ndarray:
    """OIHW → HWIO."""
    return np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0)))


def _linear_kernel(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(w.T)


def _qkv_permutation(channels: int, num_heads: int, legacy: bool) -> np.ndarray:
    """perm[ours_idx] = torch_idx for the 3C qkv output channels.

    Ours is part-major: idx = part*C + head*hc + c.
    Torch legacy (use_new_attention_order=False) is head-major interleave:
    idx = head*3*hc + part*hc + c (QKVAttentionLegacy, unet.py:426).
    Torch new order equals ours (QKVAttention, unet.py:459).
    """
    hc = channels // num_heads
    if not legacy:
        return np.arange(3 * channels)
    perm = np.empty(3 * channels, dtype=np.int64)
    for part in range(3):
        for head in range(num_heads):
            for c in range(hc):
                ours = part * channels + head * hc + c
                theirs = head * 3 * hc + part * hc + c
                perm[ours] = theirs
    return perm


def _norm(sd, prefix):
    return {"scale": sd[f"{prefix}.weight"], "bias": sd[f"{prefix}.bias"]}


def _conv(sd, prefix):
    return {"kernel": _conv_kernel(sd[f"{prefix}.weight"]), "bias": sd[f"{prefix}.bias"]}


def _dense(sd, prefix):
    return {"kernel": _linear_kernel(sd[f"{prefix}.weight"]), "bias": sd[f"{prefix}.bias"]}


def _res_params(sd: Dict[str, np.ndarray], prefix: str, has_skip: bool) -> Dict[str, Any]:
    p = {
        "in_norm": _norm(sd, f"{prefix}.in_layers.0"),
        "in_conv": _conv(sd, f"{prefix}.in_layers.2"),
        "emb_proj": _dense(sd, f"{prefix}.emb_layers.1"),
        "out_norm": _norm(sd, f"{prefix}.out_layers.0"),
        "out_conv": _conv(sd, f"{prefix}.out_layers.3"),
    }
    if has_skip:
        p["skip"] = _conv(sd, f"{prefix}.skip_connection")
    return p


def _attn_params(
    sd: Dict[str, np.ndarray], prefix: str, channels: int, heads: int, legacy: bool
) -> Dict[str, Any]:
    perm = _qkv_permutation(channels, heads, legacy)
    qkv_w = sd[f"{prefix}.qkv.weight"][:, :, 0]  # [3C, C]
    qkv_b = sd[f"{prefix}.qkv.bias"]
    proj_w = sd[f"{prefix}.proj_out.weight"][:, :, 0]  # [C, C]
    proj_b = sd[f"{prefix}.proj_out.bias"]
    return {
        "norm": _norm(sd, f"{prefix}.norm"),
        "qkv": {"kernel": np.ascontiguousarray(qkv_w[perm].T), "bias": qkv_b[perm]},
        "proj": {"kernel": np.ascontiguousarray(proj_w.T), "bias": proj_b},
    }


def convert_state_dict(sd: Dict[str, np.ndarray], cfg: UNetConfig) -> Dict[str, Any]:
    """torch state_dict (name → numpy fp32) → flax params dict for UNetModel."""
    sd = {k: np.asarray(v, dtype=np.float32) for k, v in sd.items()}
    legacy = not cfg.use_new_attention_order
    input_blocks, middle_block, output_blocks = build_plan(cfg)

    params: Dict[str, Any] = {
        "time_dense0": _dense(sd, "time_embed.0"),
        "time_dense1": _dense(sd, "time_embed.2"),
        "out_norm": _norm(sd, "out.0"),
        "out_conv": _conv(sd, "out.2"),
    }

    def convert_layer(lay: dict, torch_prefix: str, name: str):
        kind = lay["kind"]
        if kind == "conv_in":
            params[name] = _conv(sd, torch_prefix)
        elif kind in ("res", "res_down", "res_up"):
            has_skip = lay["in_ch"] != lay["out_ch"]
            params[name] = _res_params(sd, torch_prefix, has_skip)
        elif kind == "attn":
            params[name] = _attn_params(sd, torch_prefix, lay["ch"], lay["heads"], legacy)
        elif kind == "down":
            params[name] = {"op": _conv(sd, f"{torch_prefix}.op")}
        elif kind == "up":
            params[name] = {"conv": _conv(sd, f"{torch_prefix}.conv")}
        else:
            raise ValueError(kind)

    for i, block in enumerate(input_blocks):
        for j, lay in enumerate(block):
            convert_layer(lay, f"input_blocks.{i}.{j}", f"in_{i}_{j}")
    for j, lay in enumerate(middle_block):
        convert_layer(lay, f"middle_block.{j}", f"mid_{j}")
    for i, block in enumerate(output_blocks):
        for j, lay in enumerate(block):
            convert_layer(lay, f"output_blocks.{i}.{j}", f"out_{i}_{j}")

    return {"params": params}


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Read a .pt state_dict into numpy without needing a GPU torch build."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    return {k: v.numpy() for k, v in sd.items()}


def save_params_msgpack(params: Dict[str, Any], path: str):
    from flax import serialization

    with open(path, "wb") as f:
        f.write(serialization.msgpack_serialize(params))


def load_params_msgpack(path: str) -> Dict[str, Any]:
    from flax import serialization

    with open(path, "rb") as f:
        return serialization.msgpack_restore(f.read())


def save_params_orbax(params: Dict[str, Any], path: str):
    """Orbax checkpoint directory (sharding-aware, async-capable)."""
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(path), params, force=True)
    ckptr.wait_until_finished()


def load_params_orbax(path: str) -> Dict[str, Any]:
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(os.path.abspath(path))


def cast_params_half(params: Dict[str, Any], dtype=None) -> Dict[str, Any]:
    """Cast weights to bfloat16 for HBM-bandwidth savings, keeping every
    GroupNorm scale/bias in fp32 (they participate in the fp32 islands).

    perf knob ``gn_affine_bf16``: store the GN affines in bf16 TOO — the
    math still runs fp32 (GroupNorm32 upcasts at the use site), this only
    halves the loop-invariant f32[C] stagings the profiler attributes to
    scan-boundary copies (PERF.md round 3 end state)."""
    import jax
    import jax.numpy as jnp

    from .. import perf

    dtype = dtype or jnp.bfloat16
    affine_bf16 = bool(perf.get("gn_affine_bf16"))

    def cast(path, leaf):
        keys = [getattr(p, "key", "") for p in path]
        if any("norm" in str(k) for k in keys) and not affine_bf16:
            return leaf
        return leaf.astype(dtype)

    return jax.tree_util.tree_map_with_path(cast, params)


def load_unet_params(model_path: str, cfg: UNetConfig, rng_seed: int = 0):
    """Checkpoint loader with the reference's random-init fallback
    (unet.py:94-98). Accepts .pt (torch pickle) or .msgpack (native)."""
    import jax
    import jax.numpy as jnp

    from .unet import UNetModel

    try:
        if model_path and model_path.endswith(".msgpack"):
            return load_params_msgpack(model_path)
        if model_path and (
            model_path.endswith(".orbax")
            or os.path.isdir(os.path.join(model_path, ""))
            and os.path.exists(os.path.join(model_path, "_CHECKPOINT_METADATA"))
        ):
            return load_params_orbax(model_path)
        if model_path and os.path.exists(model_path):
            return convert_state_dict(load_torch_state_dict(model_path), cfg)
        raise FileNotFoundError(model_path)
    except Exception as e:  # mirror the reference's broad fallback
        print(f"Got exception: {e} / Randomly initialize")
        model = UNetModel(cfg)
        x = jnp.zeros((1, cfg.image_size, cfg.image_size, cfg.in_channels))
        return model.init(jax.random.key(rng_seed), x, jnp.zeros((1,)))
