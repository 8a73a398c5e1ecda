"""Helpers to import the reference implementation read-only from
/root/reference for parity tests (torchvision/natsort are stubbed — they are
not installed and not needed for the compared code paths)."""

import sys
import types

REFERENCE = "/root/reference"


def import_reference():
    """Make `guided_diffusion.*` / `osmosis_utils.*` importable."""
    for name in [
        "torchvision",
        "torchvision.transforms",
        "torchvision.transforms.functional",
        "torchvision.utils",
    ]:
        if name not in sys.modules:
            mod = types.ModuleType(name)
            if name == "torchvision.utils":
                mod.make_grid = lambda *a, **k: None
            sys.modules[name] = mod
    import torch

    sys.modules["torchvision"].transforms = sys.modules["torchvision.transforms"]
    sys.modules["torchvision"].torch = torch  # measurements.py:8 does `from torchvision import torch`
    sys.modules["torchvision.transforms"].functional = sys.modules[
        "torchvision.transforms.functional"
    ]
    if "natsort" not in sys.modules:
        natsort = types.ModuleType("natsort")
        natsort.natsorted = sorted
        sys.modules["natsort"] = natsort
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
