"""ConvNeXt backbone parity vs the reference's own torch code.

Loads /root/reference/projects/UNINEXT/uninext/backbone/convnext.py via the
import shims, randomizes a tiny ConvNeXt, converts its state_dict through
engine.convert.convert_convnext, and asserts our flax ConvNeXt (NHWC)
matches end-to-end on res3/res4/res5 — the D2ConvNeXt out_features
(reference convnext.py:198-264). Also pins the 4-channel template
inflation path used by the stage-2 -> stage-3 hand-off.
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from uninext_tpu.engine.convert import convert_convnext, jax_tree_to_numpy  # noqa: E402
from uninext_tpu.models.convnext import ConvNeXt  # noqa: E402

PREFIX = "detr.detr.backbone.0.backbone."
DEPTHS = (2, 2, 4, 2)
DIMS = (16, 32, 64, 128)


def _load_reference_convnext():
    from tests.torch_ref_shim import (install_detectron2_shim,
                                      install_reference_shims, _load_file)
    install_reference_shims()
    install_detectron2_shim()
    REF = "/root/reference/projects/UNINEXT/uninext/backbone"
    return _load_file("uninext.backbone.convnext", f"{REF}/convnext.py")


def _build_pair(in_chans=3):
    mod = _load_reference_convnext()
    torch.manual_seed(0)
    # D2ConvNeXt production setting (convnext.py:198-220): out_indices
    # [0,1,2,3] — forward() names outputs res{u+2} by ENUMERATION, so any
    # other out_indices misaligns the res names; d2 then selects res3-5
    ref = mod.ConvNeXt(in_chans=in_chans, depths=list(DEPTHS),
                       dims=list(DIMS), drop_path_rate=0.0,
                       out_indices=[0, 1, 2, 3]).eval()
    sd = ref.state_dict()
    g = torch.Generator().manual_seed(7)
    for k, v in sd.items():
        sd[k] = torch.randn(v.shape, generator=g) * 0.05
    ref.load_state_dict(sd)
    ours = ConvNeXt(depths=DEPTHS, dims=DIMS, drop_path_rate=0.0,
                    in_channels=in_chans)
    return ref, ours, {PREFIX + k: v for k, v in sd.items()}


def _convert(ours, sd, x_shape):
    params = ours.init(jax.random.PRNGKey(0), jnp.zeros(x_shape))
    tree = jax_tree_to_numpy(params)["params"]
    report = {"loaded": 0, "missing_target": [], "shape_mismatch": []}
    convert_convnext(sd, {"backbone": tree}, report, dst_root="backbone")
    assert not report["missing_target"], report["missing_target"]
    assert not report["shape_mismatch"], report["shape_mismatch"]
    assert report["loaded"] > 0
    return {"params": tree}


def test_convnext_matches_reference():
    ref, ours, sd = _build_pair()
    H = W = 64
    x = torch.randn(1, 3, H, W, generator=torch.Generator().manual_seed(3))
    with torch.no_grad():
        ref_outs = ref(x)            # dict res2..res5 or list by out_indices

    params = _convert(ours, sd, (1, H, W, 3))
    got = ours.apply(params, jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))

    assert set(got) == {"res3", "res4", "res5"}
    for name in ("res3", "res4", "res5"):
        r = ref_outs[name].numpy().transpose(0, 2, 3, 1)
        o = np.asarray(got[name], np.float32)
        assert o.shape == r.shape, (name, o.shape, r.shape)
        err = np.abs(o - r).max()
        assert err < 2e-4, (name, err)


def test_convnext_4ch_template_inflation():
    """The stage-3 hand-off inflates the 3-ch stem to 4 channels
    (reference conversion/convert_3c_to_4c_pth_convnext.py: extra channel
    zero-init). load_stage_weights must do the same for a convnext template
    tower, preserving the 3-ch behavior on RGB-only inputs."""
    from uninext_tpu.engine.checkpoint import load_stage_weights

    _, ours3, sd = _build_pair()
    params3 = _convert(ours3, sd, (1, 32, 32, 3))

    ours4 = ConvNeXt(depths=DEPTHS, dims=DIMS, in_channels=4)
    params4 = ours4.init(jax.random.PRNGKey(1), jnp.zeros((1, 32, 32, 4)))
    # hand-off trees are rooted like the full model: template backbone
    # params load from the image backbone with conv inflation
    src = {"template_backbone": params3["params"]}
    dst = {"template_backbone": jax_tree_to_numpy(params4)["params"]}
    new, rep = load_stage_weights(dst, src)
    assert rep["inflated"] >= 1, rep

    x = np.random.RandomState(0).randn(1, 32, 32, 3).astype(np.float32)
    x4 = np.concatenate([x, np.zeros((1, 32, 32, 1), np.float32)], -1)
    o3 = ours3.apply(params3, jnp.asarray(x))
    o4 = ours4.apply({"params": new["template_backbone"]}, jnp.asarray(x4))
    for k in o3:
        np.testing.assert_allclose(np.asarray(o4[k]), np.asarray(o3[k]),
                                   atol=1e-5)
