"""Scratch driver: full-model torch-mirror parity (reference oracle vs ours).

Run: python tools/mirror_parity_run.py
(Imports from tests/; formalized as tests/test_torch_mirror_full.py.)
"""
import os
import sys

sys.path.insert(0, "/root/repo")
os.environ.setdefault("HF_HUB_OFFLINE", "1")

import numpy as np


def torch_side(H=128, W=160, T=32, seed=0):
    import torch
    from tests.torch_mirror import (build_cfg, shrink_cfg,
                                    build_reference_model, make_image_list)
    cfg = shrink_cfg(build_cfg())
    model = build_reference_model(cfg, seed=seed)
    torch.manual_seed(42)
    img = torch.randn(1, 3, H, W)
    ids = torch.randint(0, 30000, (1, T))
    mask = torch.ones(1, T, dtype=torch.long)
    images = make_image_list(img, [(H, W)])
    with torch.no_grad():
        lang = model.text_encoder({"input_ids": ids, "attention_mask": mask})
        out, _ = model.detr.coco_inference(
            images, None, None, train=False, language_dict_features=lang,
            task="detection")
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    res = {k: out[k].detach().numpy() for k in
           ("pred_logits", "pred_boxes", "pred_masks", "pred_boxious")}
    return (sd, res, img.numpy(), ids.numpy(), mask.numpy())


def jax_side(sd, img, ids, mask, H=128, W=160, T=32):
    import jax
    jax.config.update("jax_platforms", "cpu")
    import dataclasses
    import jax.numpy as jnp
    from uninext_tpu.config import UninextConfig, LanguageConfig, \
        TransformerConfig, MaskHeadConfig, DataConfig, BackboneConfig
    from uninext_tpu.models.detr import UninextDETR
    from uninext_tpu.engine.convert import convert_checkpoint

    cfg = UninextConfig(
        backbone=BackboneConfig(name="resnet50",
                                out_channels=(512, 1024, 2048)),
        language=LanguageConfig(num_layers=2, max_len=T),
        transformer=TransformerConfig(enc_layers=2, dec_layers=2,
                                      num_queries=60),
        compute_dtype="float32",
    )
    model = UninextDETR(cfg)
    images = jnp.array(np.transpose(img, (0, 2, 3, 1)))
    img_mask = jnp.zeros((1, H, W), bool)
    sizes = jnp.array([[H, W]], jnp.int32)
    tids = jnp.array(ids, jnp.int32)
    tmask = jnp.array(mask, jnp.int32)

    from uninext_tpu.models.detr import init_all_paths
    params = init_all_paths(model, jax.random.PRNGKey(0))
    new_params, report = convert_checkpoint(sd, params)
    print("report: loaded", report["loaded"],
          "| missing:", len(report["missing_target"]),
          "| mismatch:", len(report["shape_mismatch"]))
    for m in report["missing_target"][:15]:
        print("  missing:", m)
    for m in report["shape_mismatch"][:15]:
        print("  mismatch:", m)
    print("unused_source:", len(report["unused_source"]))
    for m in report["unused_source"][:30]:
        print("  unused:", m)
    # which torch keys were never consumed?
    out = model.apply(new_params, images, img_mask, sizes, tids, tmask,
                      task="detection", train=False)
    masks = model.apply(new_params, out["memory"],
                        tuple(((H + 7) // 8 // (2 ** i), (W + 7) // 8 // (2 ** i)) for i in range(3))
                        + (((H // 64), (W // 64)),),
                        out["hs"], out["base_reference"], sizes,
                        method=UninextDETR.predict_masks) \
        if False else None
    return out, new_params, model, cfg


def main():
    H, W, T = 128, 160, 32
    sd, ref, img, ids, mask = torch_side(H, W, T)
    print("torch done:", {k: v.shape for k, v in ref.items()})
    out, params, model, cfg = jax_side(sd, img, ids, mask, H, W, T)
    for k_ref, k_ours in [("pred_logits", "pred_logits"),
                          ("pred_boxes", "pred_boxes"),
                          ("pred_boxious", "pred_boxious")]:
        a = ref[k_ref].squeeze()
        b = np.asarray(out[k_ours]).squeeze()
        if a.shape != b.shape:
            print(f"{k_ref}: SHAPE ref {a.shape} vs ours {b.shape}")
            continue
        d = np.abs(a - b)
        print(f"{k_ref}: max|d|={d.max():.3e} mean|d|={d.mean():.3e} "
              f"ref_scale={np.abs(a).mean():.3e}")


if __name__ == "__main__":
    main()
