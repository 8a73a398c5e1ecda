"""Checkpoint conversion + activation parity vs the reference torch UNet.

Loads the reference implementation read-only from /root/reference (with
torchvision stubbed out — it is not installed and not needed for the model),
builds a randomly-initialized torch UNetModel, converts its state_dict with
osmosis_tpu.models.convert, and asserts the Flax forward matches the torch
forward on fixed inputs. This validates layer mapping, conv layout
transposes, the legacy qkv head permutation, GroupNorm semantics and the
timestep embedding end to end.
"""

import numpy as np
import pytest

from tests.ref_utils import import_reference


def _import_reference_unet():
    import_reference()
    from guided_diffusion.unet import UNetModel as TorchUNet

    return TorchUNet



TINY_KW = dict(
    image_size=32,
    in_channels=4,
    model_channels=32,
    out_channels=8,
    num_res_blocks=1,
    attention_resolutions=(4,),
    dropout=0.0,
    channel_mult=(1, 2),
    num_heads=4,
    num_head_channels=16,
    num_heads_upsample=-1,
    use_scale_shift_norm=True,
    resblock_updown=True,
    use_new_attention_order=False,
)


def _flax_cfg(**overrides):
    from osmosis_tpu.models import UNetConfig

    kw = dict(
        image_size=TINY_KW["image_size"],
        in_channels=TINY_KW["in_channels"],
        model_channels=TINY_KW["model_channels"],
        out_channels=TINY_KW["out_channels"],
        num_res_blocks=TINY_KW["num_res_blocks"],
        attention_resolutions=TINY_KW["attention_resolutions"],
        channel_mult=TINY_KW["channel_mult"],
        num_heads=TINY_KW["num_heads"],
        num_head_channels=TINY_KW["num_head_channels"],
        use_scale_shift_norm=True,
        resblock_updown=True,
        use_new_attention_order=False,
    )
    kw.update(overrides)
    return UNetConfig(**kw)


@pytest.mark.parametrize("new_order", [False, True])
def test_forward_parity_with_reference_torch(new_order):
    import torch

    TorchUNet = _import_reference_unet()
    torch.manual_seed(0)
    tmodel = TorchUNet(**{**TINY_KW, "use_new_attention_order": new_order})
    tmodel.eval()
    # randomize the zero-initialized convs too, so parity covers them
    with torch.no_grad():
        for name, p in tmodel.named_parameters():
            if p.abs().sum() == 0:
                p.add_(torch.randn_like(p) * 0.02)

    sd = {k: v.numpy() for k, v in tmodel.state_dict().items()}

    from osmosis_tpu.models import UNetModel
    from osmosis_tpu.models.convert import convert_state_dict

    cfg = _flax_cfg(use_new_attention_order=new_order)
    params = convert_state_dict(sd, cfg)
    fmodel = UNetModel(cfg)

    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 4, 32, 32)).astype(np.float32)
    ts = np.array([17.0, 433.0], dtype=np.float32)

    with torch.no_grad():
        ty = tmodel(torch.from_numpy(x), torch.from_numpy(ts)).numpy()

    import jax.numpy as jnp

    fy = fmodel.apply(params, jnp.asarray(x.transpose(0, 2, 3, 1)), jnp.asarray(ts))
    fy = np.asarray(fy).transpose(0, 3, 1, 2)

    np.testing.assert_allclose(fy, ty, rtol=1e-3, atol=5e-4)


def test_forward_parity_downsample_conv_variant():
    """resblock_updown=False path: Downsample/Upsample conv modules."""
    import torch

    TorchUNet = _import_reference_unet()
    torch.manual_seed(2)
    kw = {**TINY_KW, "resblock_updown": False}
    tmodel = TorchUNet(**kw)
    tmodel.eval()
    with torch.no_grad():
        for p in tmodel.parameters():
            if p.abs().sum() == 0:
                p.add_(torch.randn_like(p) * 0.02)
    sd = {k: v.numpy() for k, v in tmodel.state_dict().items()}

    from osmosis_tpu.models import UNetModel
    from osmosis_tpu.models.convert import convert_state_dict

    cfg = _flax_cfg(resblock_updown=False)
    params = convert_state_dict(sd, cfg)
    fmodel = UNetModel(cfg)

    rng = np.random.default_rng(3)
    x = rng.standard_normal((1, 4, 32, 32)).astype(np.float32)
    ts = np.array([999.0], dtype=np.float32)
    with torch.no_grad():
        ty = tmodel(torch.from_numpy(x), torch.from_numpy(ts)).numpy()

    import jax.numpy as jnp

    fy = np.asarray(
        fmodel.apply(params, jnp.asarray(x.transpose(0, 2, 3, 1)), jnp.asarray(ts))
    ).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(fy, ty, rtol=1e-3, atol=5e-4)


def test_missing_checkpoint_falls_back_to_random_init(capsys):
    """unet.py:94-98 semantics: bad path → random init, no crash."""
    from osmosis_tpu.models.convert import load_unet_params

    cfg = _flax_cfg()
    params = load_unet_params("/does/not/exist.pt", cfg)
    assert "params" in params
    assert "Randomly initialize" in capsys.readouterr().out


def test_msgpack_roundtrip(tmp_path):
    import jax
    import jax.numpy as jnp

    from osmosis_tpu.models import UNetModel
    from osmosis_tpu.models.convert import (
        load_params_msgpack,
        save_params_msgpack,
    )

    cfg = _flax_cfg()
    model = UNetModel(cfg)
    params = model.init(
        jax.random.key(0), jnp.zeros((1, 32, 32, 4)), jnp.zeros((1,))
    )
    p = tmp_path / "unet.msgpack"
    save_params_msgpack(params, str(p))
    restored = load_params_msgpack(str(p))
    a = jax.tree_util.tree_leaves(params)
    b = jax.tree_util.tree_leaves(restored)
    assert len(a) == len(b)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_orbax_roundtrip(tmp_path):
    import jax
    import jax.numpy as jnp

    from osmosis_tpu.models import UNetModel
    from osmosis_tpu.models.convert import load_params_orbax, save_params_orbax

    cfg = _flax_cfg()
    model = UNetModel(cfg)
    params = model.init(
        jax.random.key(1), jnp.zeros((1, 32, 32, 4)), jnp.zeros((1,))
    )
    d = str(tmp_path / "ck.orbax")
    save_params_orbax(params, d)
    restored = load_params_orbax(d)
    a = jax.tree_util.tree_leaves(params)
    b = jax.tree_util.tree_leaves(restored)
    assert len(a) == len(b)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
