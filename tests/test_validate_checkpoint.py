"""tools/validate_checkpoint.py harness: convert→parity→bisect machinery.

The real osmosis_outdoor.pt is not in this container; these tests prove the
harness works today (random-weight self-test path) and that the bisector
actually localizes a corrupted layer — so real-weight validation is a
one-command step when the checkpoint appears (VERDICT round-1 #1).
"""

import importlib.util
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

_spec = importlib.util.spec_from_file_location(
    "validate_checkpoint",
    os.path.join(os.path.dirname(__file__), "..", "tools", "validate_checkpoint.py"),
)
vc = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(vc)

TINY_UNET = dict(
    image_size=32, num_channels=32, num_res_blocks=1, channel_mult="1,2",
    learn_sigma=True, attention_resolutions="8", num_heads=4,
    num_head_channels=16, num_heads_upsample=-1, use_scale_shift_norm=True,
    dropout=0.0, resblock_updown=True, use_fp16=False,
    use_new_attention_order=False, pretrain_model="osmosis",
)


def test_convert_parity_selftest(tmp_path):
    tmodel, cfg, source = vc.build_torch_model(TINY_UNET, None, tiny=True)
    assert "random-init" in source
    ok, rel, first_bad = vc.stage_convert_and_parity(
        tmodel, cfg, str(tmp_path / "w.msgpack"), bisect=False, probe_size=32
    )
    assert ok and rel < 2e-3 and first_bad is None
    assert os.path.exists(tmp_path / "w.msgpack")


def test_bisect_localizes_corrupted_layer(tmp_path, capsys):
    """Corrupt ONE torch layer after conversion: the full forward must
    mismatch and the bisector must name the first block containing it."""
    import torch

    tmodel, cfg, _ = vc.build_torch_model(TINY_UNET, None, tiny=True)
    # convert the GOOD weights first
    from osmosis_tpu.models.convert import convert_state_dict

    sd = {k: v.numpy() for k, v in tmodel.state_dict().items()}
    params = convert_state_dict(sd, cfg)

    # now corrupt the torch middle block's first res conv
    with torch.no_grad():
        tmodel.middle_block[0].in_layers[2].weight.add_(0.5)

    from osmosis_tpu.models import UNetModel

    fmodel = UNetModel(cfg)
    rng = np.random.default_rng(1)
    x = rng.standard_normal((1, 4, 32, 32)).astype(np.float32)
    ts = np.array([100.0], np.float32)
    first_bad = vc.bisect_layers(tmodel, fmodel, params, cfg, x, ts)
    assert first_bad == "middle_block"
    out = capsys.readouterr().out
    # blocks before the corruption agree
    assert "input_blocks.0" in out and "DIVERGED" in out


def test_ensure_dataset_synthesizes_simulation_set():
    run_cfg = {"data": dict(batch_size=1, name="simulation",
                            root="/nonexistent/path", ground_truth=True)}
    data = vc.ensure_dataset(run_cfg, size=24, n=2)
    assert os.path.isdir(data["root"]) and len(os.listdir(data["root"])) == 2
    assert os.path.isdir(data["gt_rgb"]) and os.path.isdir(data["gt_depth"])
    # degraded input differs from GT (physics applied)
    from PIL import Image

    a = np.asarray(Image.open(os.path.join(data["root"], "sim_0.png")))
    b = np.asarray(Image.open(os.path.join(data["gt_rgb"], "sim_0.png")))
    assert np.abs(a.astype(int) - b.astype(int)).mean() > 2
