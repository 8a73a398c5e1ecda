"""Config + string mini-DSL parsers (reference cites in osmosis_tpu/config.py)."""

import numpy as np
import pytest

from osmosis_tpu import config as C


def test_parse_scale():
    np.testing.assert_allclose(C.parse_scale("7,7,7,0.9"), [7, 7, 7, 0.9])
    np.testing.assert_allclose(C.parse_scale(1.0), [1.0])
    np.testing.assert_allclose(C.parse_scale("3"), [3.0])


def test_parse_gradient_clip():
    assert C.parse_gradient_clip("True,0.005") == (True, 0.005)
    assert C.parse_gradient_clip("False,0.001") == (False, 0.0)
    assert C.parse_gradient_clip(False) == (False, 0.0)


def test_parse_weight_function():
    fn, val = C.parse_weight_function("gamma,1.4,1.4,1")
    assert fn == "gamma"
    np.testing.assert_allclose(val, [1.4, 1.4, 1.0])
    fn2, val2 = C.parse_weight_function(None)
    assert fn2 == "none" and val2 is None
    fn3, val3 = C.parse_weight_function("move,0.5")
    assert fn3 == "move" and val3 == 0.5


def test_parse_phi():
    phi = C.parse_phi("1.1,0.95,0.95", batch_size=2)
    assert phi.shape == (2, 3)
    np.testing.assert_allclose(phi[1], [1.1, 0.95, 0.95], rtol=1e-6)
    # scalar haze phi_ab (measurements.py:119-120)
    phi_ab = C.parse_phi(1.0, batch_size=1)
    assert phi_ab.shape == (1, 1)
    # "0.14, 0.29, 0.49" with spaces
    phi_inf = C.parse_phi("0.14, 0.29, 0.49")
    np.testing.assert_allclose(phi_inf[0], [0.14, 0.29, 0.49], rtol=1e-6)


def test_parse_attention_resolutions():
    assert C.parse_attention_resolutions("32, 16, 8", 256) == (8, 16, 32)
    assert C.parse_attention_resolutions(16, 256) == (16,)
    assert C.parse_attention_resolutions([32, 16, 8], 256) == (8, 16, 32)


def test_parse_channel_mult():
    assert C.parse_channel_mult("", 256) == (1, 1, 2, 2, 4, 4)
    assert C.parse_channel_mult("", 64) == (1, 2, 3, 4)
    assert C.parse_channel_mult("1,2,4", 999) == (1, 2, 4)
    with pytest.raises(ValueError):
        C.parse_channel_mult("", 48)


def test_str2bool():
    assert C.str2bool("True") and C.str2bool("yes") and C.str2bool(True)
    assert not C.str2bool("false") and not C.str2bool("0")
    with pytest.raises(ValueError):
        C.str2bool("maybe")


def test_get_depth_value():
    np.testing.assert_allclose(C.get_depth_value("1.4,1.4,1"), [1.4, 1.4, 1.0])
    assert C.get_depth_value(2) == 2.0
    assert C.get_depth_value(1.5) == 1.5


def test_yaml_roundtrip(tmp_path):
    cfg = tmp_path / "c.yaml"
    cfg.write_text(
        "save_dir: ./results\nunet_model:\n  image_size: 256\n"
        "conditioning:\n  params:\n    scale: 7,7,7,0.9\n"
    )
    args = C.arguments_from_file(str(cfg))
    assert args.save_dir == "./results"
    assert args.unet_model["image_size"] == 256
    # nested dicts stay dicts, strings stay strings (utils.py:412-414)
    assert args.conditioning["params"]["scale"] == "7,7,7,0.9"
    snap = tmp_path / "configurations.txt"
    C.config_snapshot(str(cfg), str(snap))
    assert "image_size: 256" in snap.read_text()
