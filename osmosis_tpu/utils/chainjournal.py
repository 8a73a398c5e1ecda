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
pickle of numpy pytrees — the same trust model as the reference's torch
``.pt`` loading (your own run directory); every file carries a config
fingerprint and stale state is ignored with a log line rather than loaded.

Fault injection for testing: ``OSMOSIS_TPU_CRASH_AFTER_SEGMENTS=N`` raises
after the N-th segment-boundary save process-wide (the moral equivalent of
the multihost crash-then-resume test, tests/test_multihost.py).
"""

from __future__ import annotations

import os
import pickle
import shutil
from typing import Any, Dict, Optional, Tuple

_FORMAT_VERSION = 1


def _atomic_pickle(path: str, obj: Any) -> None:
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        pickle.dump(obj, f, protocol=pickle.HIGHEST_PROTOCOL)
    os.replace(tmp, path)  # atomic on POSIX — a crash never leaves half a file


def _load_pickle(path: str, fingerprint: str) -> Optional[Any]:
    try:
        with open(path, "rb") as f:
            blob = pickle.load(f)
    except Exception:
        return None  # truncated/corrupt → treat as absent
    if blob.get("version") != _FORMAT_VERSION or blob.get("fp") != fingerprint:
        return None  # different config (or format) → stale, ignore
    return blob["payload"]


class ChainJournal:
    """Per-image durable state under <run_dir>/.chain_state/<image>/.

    Files:
        chain_<tryk>_<gii>.pkl   completed chain results (np GuidedResult)
        partial.pkl              carry state of the chain in flight
    """

    def __init__(self, run_dir: str, image_name: str, fingerprint: str):
        self.dir = os.path.join(run_dir, ".chain_state", image_name)
        self.fp = fingerprint
        os.makedirs(self.dir, exist_ok=True)

    # -- completed chains ---------------------------------------------------
    def _chain_path(self, try_k: int, global_ii: int) -> str:
        return os.path.join(self.dir, f"chain_{try_k}_{global_ii}.pkl")

    def save_chain(self, try_k: int, global_ii: int, res_np: Any) -> None:
        _atomic_pickle(
            self._chain_path(try_k, global_ii),
            {"version": _FORMAT_VERSION, "fp": self.fp, "payload": res_np},
        )

    def load_chains(self) -> Dict[Tuple[int, int], Any]:
        out: Dict[Tuple[int, int], Any] = {}
        for name in sorted(os.listdir(self.dir)):
            if not (name.startswith("chain_") and name.endswith(".pkl")):
                continue
            try:
                try_k, gii = (int(x) for x in name[6:-4].split("_"))
            except ValueError:
                continue
            payload = _load_pickle(os.path.join(self.dir, name), self.fp)
            if payload is not None:
                out[(try_k, gii)] = payload
        return out

    # -- in-flight chain carry ----------------------------------------------
    @property
    def _partial_path(self) -> str:
        return os.path.join(self.dir, "partial.pkl")

    def save_partial(self, tag: Tuple[int, int], state: Dict[str, Any]) -> None:
        _atomic_pickle(
            self._partial_path,
            {
                "version": _FORMAT_VERSION,
                "fp": self.fp,
                "payload": {"tag": tuple(tag), "state": state},
            },
        )

    def load_partial(self, tag: Tuple[int, int]) -> Optional[Dict[str, Any]]:
        payload = _load_pickle(self._partial_path, self.fp)
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
