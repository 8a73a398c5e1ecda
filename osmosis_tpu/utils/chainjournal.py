"""Durable mid-chain checkpoint/resume for guided sampling chains.

The reference's only resume granularity is the per-image loop (skip images
whose outputs exist — osmosis_sampling.py has no finer unit; SURVEY.md §5).
On preemptible TPU fleets the unit of lost work is larger than an image
boundary: a 1000-step guided chain is ~32 s of device time per image, and
`best_of`/`global_N` multiply that. ``chain_checkpoint: True`` persists

* every COMPLETED restart/global chain's result, and
* the exact scan-carry state at every ``progress_segments`` boundary of the
  chain in flight (x_t, phi, phi-optimizer state, x0-snapshot buffer, PLMS
  eps history, accumulated telemetry traces),

so a killed run re-entered with ``resume: True`` continues the interrupted
image from the last boundary instead of restarting it. Results are
BITWISE-identical to an uninterrupted run: per-step noise is keyed on the
timestep value (not the loop position), so the remaining steps reproduce
the same stream — pinned by tests/test_chain_checkpoint.py.

State lives under ``<run_dir>/.chain_state/<image>/`` and is deleted when
the image finishes, so a completed run leaves no residue. Serialization is
deliberately NOT pickle (ADVICE r3: these files are written/read
automatically on preemptible fleets, so "your own run directory" is a
weaker trust boundary than a hand-placed weights file): each file is a
zip of raw numpy buffers plus a JSON manifest describing the pytree
structure, loaded with ``allow_pickle=False`` — deserialization can
construct only numpy arrays, JSON scalars/containers, and the one
whitelisted result dataclass. Every file carries a config fingerprint and
stale/corrupt state is ignored with a log line rather than loaded.

Fault injection for testing: ``OSMOSIS_TPU_CRASH_AFTER_SEGMENTS=N`` raises
after the N-th segment-boundary save process-wide (the moral equivalent of
the multihost crash-then-resume test, tests/test_multihost.py).
"""

from __future__ import annotations

import dataclasses
import json
import os
import shutil
from typing import Any, Dict, Optional, Tuple

import numpy as np

_FORMAT_VERSION = 2  # v1 was pickle; v2 is the npz+manifest format below


# --------------------------------------------------------------- serializer
#
# Encodes a pytree of {None, bool, int, float, str, list, tuple, dict,
# numpy array, GuidedResult} into (manifest, {key: raw uint8 buffer}).
# Arrays are stored as raw bytes + (dtype-name, shape) so extension dtypes
# (e.g. ml_dtypes bfloat16) round-trip without numpy's .npy dtype-descr
# machinery or pickle.

def _encode(obj: Any, arrays: Dict[str, np.ndarray]):
    if obj is None:
        return {"t": "none"}
    if isinstance(obj, bool):
        return {"t": "bool", "v": obj}
    if isinstance(obj, int):
        return {"t": "int", "v": obj}
    if isinstance(obj, float):
        return {"t": "float", "v": obj}
    if isinstance(obj, str):
        return {"t": "str", "v": obj}
    if isinstance(obj, (np.ndarray, np.generic)) or hasattr(obj, "__array__"):
        arr = np.ascontiguousarray(np.asarray(obj))
        key = f"a{len(arrays)}"
        arrays[key] = np.frombuffer(arr.tobytes(), np.uint8)
        return {"t": "arr", "k": key, "d": str(arr.dtype),
                "s": list(arr.shape)}
    if isinstance(obj, (list, tuple)):
        return {"t": "tuple" if isinstance(obj, tuple) else "list",
                "v": [_encode(x, arrays) for x in obj]}
    if isinstance(obj, dict):
        return {"t": "dict",
                "v": [[_encode(k, arrays), _encode(v, arrays)]
                      for k, v in obj.items()]}
    if type(obj).__name__ == "GuidedResult" and dataclasses.is_dataclass(obj):
        return {"t": "GuidedResult",
                "v": {f.name: _encode(getattr(obj, f.name), arrays)
                      for f in dataclasses.fields(obj)}}
    raise TypeError(f"chainjournal cannot serialize {type(obj)!r}")


def _np_dtype(name: str) -> np.dtype:
    try:
        return np.dtype(name)
    except TypeError:
        import ml_dtypes  # registers bfloat16/float8 extension dtypes

        return np.dtype(getattr(ml_dtypes, name))


def _decode(node, npz):
    t = node["t"]
    if t == "none":
        return None
    if t in ("bool", "int", "float", "str"):
        return node["v"]
    if t == "arr":
        raw = npz[node["k"]]
        # np.load hands back a freshly decompressed buffer that is already
        # writable — view it in place rather than copying twice
        # (tobytes + bytearray cost ~3x the checkpoint size in transient
        # memory on every resume load, ADVICE r4)
        try:
            arr = raw.view(_np_dtype(node["d"]))
        except ValueError:  # non-viewable layout — fall back to one copy
            arr = np.frombuffer(
                bytearray(raw.tobytes()), dtype=_np_dtype(node["d"])
            )
        if not arr.flags.writeable:  # frombuffer-over-bytes style regression
            arr = arr.copy()
        return arr.reshape(node["s"])
    if t == "list":
        return [_decode(x, npz) for x in node["v"]]
    if t == "tuple":
        return tuple(_decode(x, npz) for x in node["v"])
    if t == "dict":
        return {_decode(k, npz): _decode(v, npz) for k, v in node["v"]}
    if t == "GuidedResult":
        from ..diffusion.guided import GuidedResult  # whitelisted dataclass

        kw = {k: _decode(v, npz) for k, v in node["v"].items()}
        return GuidedResult(**kw)
    raise ValueError(f"unknown manifest node type {t!r}")


def _atomic_save(path: str, fingerprint: str, payload: Any) -> None:
    arrays: Dict[str, np.ndarray] = {}
    manifest = {
        "version": _FORMAT_VERSION,
        "fp": fingerprint,
        "payload": _encode(payload, arrays),
    }
    arrays["__manifest__"] = np.frombuffer(
        json.dumps(manifest).encode("utf-8"), np.uint8
    )
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        np.savez(f, **arrays)
    os.replace(tmp, path)  # atomic on POSIX — a crash never leaves half a file


def _load(path: str, fingerprint: str) -> Optional[Any]:
    try:
        with np.load(path, allow_pickle=False) as npz:
            manifest = json.loads(npz["__manifest__"].tobytes().decode("utf-8"))
            if (manifest.get("version") != _FORMAT_VERSION
                    or manifest.get("fp") != fingerprint):
                return None  # different config/format → stale, ignore
            return _decode(manifest["payload"], npz)
    except Exception:
        return None  # truncated/corrupt/legacy-pickle → treat as absent


class ChainJournal:
    """Per-image durable state under <run_dir>/.chain_state/<image>/.

    Files:
        chain_<tryk>_<gii>.npz   completed chain results (np GuidedResult)
        partial.npz              carry state of the chain in flight
    """

    def __init__(self, run_dir: str, image_name: str, fingerprint: str):
        self.dir = os.path.join(run_dir, ".chain_state", image_name)
        self.fp = fingerprint
        os.makedirs(self.dir, exist_ok=True)

    # -- completed chains ---------------------------------------------------
    def _chain_path(self, try_k: int, global_ii: int) -> str:
        return os.path.join(self.dir, f"chain_{try_k}_{global_ii}.npz")

    def save_chain(self, try_k: int, global_ii: int, res_np: Any) -> None:
        _atomic_save(self._chain_path(try_k, global_ii), self.fp, res_np)

    def load_chains(self) -> Dict[Tuple[int, int], Any]:
        out: Dict[Tuple[int, int], Any] = {}
        for name in sorted(os.listdir(self.dir)):
            if not (name.startswith("chain_") and name.endswith(".npz")):
                continue
            try:
                try_k, gii = (int(x) for x in name[6:-4].split("_"))
            except ValueError:
                continue
            payload = _load(os.path.join(self.dir, name), self.fp)
            if payload is not None:
                out[(try_k, gii)] = payload
        return out

    # -- in-flight chain carry ----------------------------------------------
    @property
    def _partial_path(self) -> str:
        return os.path.join(self.dir, "partial.npz")

    def save_partial(self, tag: Tuple[int, int], state: Dict[str, Any]) -> None:
        _atomic_save(
            self._partial_path, self.fp,
            {"tag": tuple(tag), "state": state},
        )

    def load_partial(self, tag: Tuple[int, int]) -> Optional[Dict[str, Any]]:
        payload = _load(self._partial_path, self.fp)
        if payload is None or tuple(payload.get("tag", ())) != tuple(tag):
            return None
        return payload["state"]

    def clear_partial(self) -> None:
        try:
            os.remove(self._partial_path)
        except FileNotFoundError:
            pass

    # -- image done ----------------------------------------------------------
    def clear(self) -> None:
        shutil.rmtree(self.dir, ignore_errors=True)
        # prune the parent when this was the last unfinished image
        parent = os.path.dirname(self.dir)
        try:
            os.rmdir(parent)
        except OSError:
            pass
