"""BoxInst parity: LAB color similarity, box bitmasks, projection+pairwise
losses vs the reference's own torch implementations (loaded as numerical
oracles via tests/torch_ref_shim — nothing vendored).

Reference anchors:
  * get_images_color_similarity / unfold_wo_center  uninext_img.py:616-665
  * add_bitmasks_from_boxes raster + stride sampling uninext_img.py:563-595
  * compute_project_term / compute_pairwise_term    deformable_detr.py:812-852
  * loss_masks_boxinst composition incl. warmup      deformable_detr.py:457-527
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from tests.torch_ref_shim import (import_reference,
                                  install_detectron2_shim,
                                  install_reference_shims)

from uninext_tpu.data.boxinst import (boxes_to_bitmasks,
                                      color_similarity_from_lab,
                                      downsample_to_lab, rgb_to_lab)


@pytest.fixture(scope="module")
def ref_dd():
    install_reference_shims()
    install_detectron2_shim()
    return import_reference("uninext.models.deformable_detr.deformable_detr")


@pytest.fixture(scope="module")
def ref_img():
    """get_images_color_similarity lives in uninext_img.py, whose module
    imports skimage (absent here) — reimport would fail, so pull the two
    pure functions out of the reference source by exec'ing just them."""
    import re
    src = open("/root/reference/projects/UNINEXT/uninext/uninext_img.py").read()
    ns = {"torch": torch, "F": torch.nn.functional}
    for name in ("unfold_wo_center", "get_images_color_similarity"):
        m = re.search(rf"\ndef {name}\(.*?(?=\ndef |\Z)", src, re.S)
        assert m, name
        exec(m.group(0), ns)          # shared ns: the 2nd fn calls the 1st
    return ns


def test_rgb_to_lab_constants():
    """Standard D65 sRGB->CIELAB values (what skimage.color.rgb2lab — the
    reference's converter — produces)."""
    rgb = np.array([[[255, 255, 255], [0, 0, 0], [255, 0, 0],
                     [0, 255, 0], [0, 0, 255], [128, 128, 128]]], np.uint8)
    lab = rgb_to_lab(rgb)[0]
    expect = np.array([
        [100.0, 0.0, 0.0],
        [0.0, 0.0, 0.0],
        [53.24, 80.09, 67.20],
        [87.74, -86.18, 83.18],
        [32.30, 79.19, -107.86],
        [53.59, 0.0, 0.0]])
    np.testing.assert_allclose(lab, expect, atol=0.05)


def test_color_similarity_vs_reference(ref_img):
    rng = np.random.RandomState(0)
    h, w = 24, 32
    lab = rng.randn(h, w, 3).astype(np.float32) * 20
    valid = np.ones((h, w), np.float32)
    valid[-5:] = 0.0          # bottom-removed band
    valid[:, -3:] = 0.0       # padding

    ours = color_similarity_from_lab(lab, valid)        # (8, h, w)

    lab_t = torch.from_numpy(lab).permute(2, 0, 1)[None].double()
    ref = ref_img["get_images_color_similarity"](
        lab_t, torch.from_numpy(valid).double(), 3, 2)[0].numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)


def test_bitmasks_vs_reference_raster():
    """Closed-form sampled bitmask == full-res raster (uninext_img.py:589-593:
    rows [int(y0), int(y1+1)), cols [int(x0), int(x1+1))) sampled at
    [stride//2::stride]."""
    rng = np.random.RandomState(1)
    Hb, Wb, stride = 64, 96, 4
    G = 6
    boxes = np.zeros((G, 4), np.float32)
    boxes[:, 0] = rng.uniform(0, Wb - 2, G)
    boxes[:, 1] = rng.uniform(0, Hb - 2, G)
    boxes[:, 2] = boxes[:, 0] + rng.uniform(0.5, Wb / 2, G)
    boxes[:, 3] = boxes[:, 1] + rng.uniform(0.5, Hb / 2, G)
    valid = np.array([True] * 5 + [False])

    ours = boxes_to_bitmasks(boxes, valid, Hb, Wb, stride)

    for g in range(G):
        full = np.zeros((Hb, Wb), np.float32)
        if valid[g]:
            x0, y0, x1, y1 = boxes[g]
            full[int(y0):int(y1 + 1), int(x0):int(x1 + 1)] = 1.0
        ref = full[stride // 2::stride, stride // 2::stride]
        np.testing.assert_array_equal(ours[g], ref)


def test_downsample_to_lab_matches_reference_pooling():
    """avg_pool2d(k=4,s=4) + .byte() truncation + rgb2lab."""
    rng = np.random.RandomState(2)
    img = rng.uniform(0, 255, (32, 40, 3)).astype(np.float32)
    ours = downsample_to_lab(img, 4)
    pooled = torch.nn.functional.avg_pool2d(
        torch.from_numpy(img).permute(2, 0, 1)[None], kernel_size=4,
        stride=4)[0].to(torch.uint8).permute(1, 2, 0).numpy()
    ref = rgb_to_lab(pooled)
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_boxinst_losses_vs_reference(ref_dd):
    """loss_prj / loss_pairwise == the reference's compute_project_term /
    compute_pairwise_term composition (deformable_detr.py:505-527), incl.
    the >= color threshold weighting and the warmup factor."""
    import jax.numpy as jnp

    from uninext_tpu.models.criterion import loss_masks_boxinst

    rng = np.random.RandomState(3)
    B, N, h, w = 2, 5, 16, 24
    logits = rng.randn(B, N, h, w).astype(np.float32) * 3
    bitmasks = (rng.rand(B, N, h, w) > 0.6).astype(np.float32)
    sim = rng.rand(B, 8, h, w).astype(np.float32)
    sel_valid = np.ones((B, N), bool)
    sel_valid[1, 3:] = False
    warm = 0.37

    got = loss_masks_boxinst(
        jnp.asarray(logits), jnp.asarray(bitmasks), jnp.asarray(sim),
        jnp.asarray(sel_valid), jnp.float32(warm),
        pairwise_color_thresh=0.3, pairwise_size=3, pairwise_dilation=2)

    # reference composition over the VALID instances only (its tensors are
    # ragged [num_all_inst, 1, H, W]; ours are padded + masked)
    keep = sel_valid.reshape(-1)
    lg = torch.from_numpy(logits.reshape(-1, 1, h, w)[keep]).double()
    bm = torch.from_numpy(bitmasks.reshape(-1, 1, h, w)[keep]).double()
    # per-instance color sim = the instance's image's sim (reference stacks
    # targets[b]["image_color_similarity"][i])
    sim_inst = np.repeat(sim[:, None], N, axis=1).reshape(-1, 8, h, w)[keep]
    sim_t = torch.from_numpy(sim_inst).double()

    prj = ref_dd.compute_project_term(torch.sigmoid(lg), bm)
    pw = ref_dd.compute_pairwise_term(lg, 3, 2)
    weights = (sim_t >= 0.3).double() * bm.squeeze(1)[:, None]
    pw_loss = (pw * weights).sum() / weights.sum().clamp(min=1.0) * warm

    np.testing.assert_allclose(float(got["loss_prj"]), float(prj),
                               rtol=2e-5)
    np.testing.assert_allclose(float(got["loss_pairwise"]), float(pw_loss),
                               rtol=2e-5)
