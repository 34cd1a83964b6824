"""SegInW zero-shot sweep (tools/eval_seginw.py) over the registry's
seginw_<Subset>_val splits on a generated SegInW-layout fixture.

Reference protocol: the image_joint model is evaluated with NO fine-tuning
on 25 in-the-wild instance-seg datasets, each dataset's own category names
as the prompt, mean mask AP as the headline (README.md:22-23,
data/datasets/seginw.py).
"""
import os
import sys

import jax
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tools"))


@pytest.mark.heavy
def test_seginw_sweep_schema(tmp_path, monkeypatch):
    from eval_seginw import run_seginw
    from uninext_tpu.data.mini_coco import make_mini_seginw
    from uninext_tpu.data.registry import list_datasets
    from uninext_tpu.config import tiny_test_config
    from uninext_tpu.models.detr import UninextDETR, init_all_paths
    import dataclasses

    # all 25 reference subsets are registered
    assert sum(d.startswith("seginw_") for d in list_datasets()) == 25

    root = make_mini_seginw(str(tmp_path), subsets=("Chicken", "Cows"),
                            n_val=3)
    monkeypatch.setenv("UNINEXT_DATA", root)

    cfg = tiny_test_config()
    cfg = dataclasses.replace(
        cfg, data=dataclasses.replace(cfg.data, max_insts=8,
                                      max_text_len=32, min_size_test=224,
                                      max_size_test=352))
    model = UninextDETR(cfg)
    params = init_all_paths(model, jax.random.PRNGKey(0))["params"]

    res = run_seginw(model, params, cfg,
                     ["Chicken", "Cows", "Not-A-Subset"], verbose=False)
    # the unknown subset is skipped+reported; the real two are swept
    assert res["n_datasets"] == 2 and len(res["skipped"]) == 1
    for sub in ("Chicken", "Cows"):
        d = res["per_dataset"][sub]
        assert d["n_images"] == 3 and d["n_categories"] == 3
        assert set(d["bbox"]) >= {"AP", "AP50"}
        assert set(d["segm"]) >= {"AP", "AP50"}
    # random weights: APs exist (may be 0/None), mean computed over the 2
    assert res["mean_segm_ap"] is None or res["mean_segm_ap"] >= 0.0
