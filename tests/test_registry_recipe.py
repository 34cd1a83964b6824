"""Dataset registry: joint-stage recipe resolves; multi-dataset mixing."""
import numpy as np

from uninext_tpu.config import DataConfig
from uninext_tpu.data.coco import UniDatasetMapper, load_coco_json
from uninext_tpu.data.loader import MultiDatasetLoader
from uninext_tpu.data.mini_coco import make_mini_coco
from uninext_tpu.data import registry


def test_video_joint_recipe_names_are_registered():
    recipe = registry.video_joint_recipe()
    assert len(recipe) == 14                     # video_joint_r50.yaml:38-58
    known = set(registry.list_datasets())
    for name, ratio, bs, sizes, max_size, frange in recipe:
        assert name in known, name
        assert ratio > 0 and bs >= 1 and frange >= 1
        assert max(sizes) <= max_size


def test_round1_missing_splits_now_registered():
    # VERDICT round-1 gap list (builtin.py:105-300)
    for name in ("coco_2017_train_video", "rvos-refcoco-mixed",
                 "sot_coco_2017_train", "rvos-refdavis-val-0",
                 "rvos-refdavis-val-3", "sot_tnl2k_test",
                 "bdd_det_train", "bdd_inst_train", "sot_lasot_ext_test",
                 "sot_davis17_val"):
        assert name in registry.list_datasets(), name


def test_every_reference_builtin_split_is_registered():
    """Line-by-line parity with the reference's dataset registration
    (data/datasets/builtin.py): every split key the reference registers
    must resolve in our registry (round 3 closed the last 11: ytvis
    test/dev/2022, ovis subs, refcocog-google, refcoco-mixed-filter,
    bdd_det_trk_mixed_train, sot_got10k_test, flicker-train alias)."""
    import os
    import re
    builtin = "/root/reference/projects/UNINEXT/uninext/data/datasets/builtin.py"
    if not os.path.exists(builtin):
        import pytest
        pytest.skip("reference not present")
    src = open(builtin).read()
    keys = set(re.findall(r'^\s*"([a-z0-9_\-]+)":', src, re.M))
    keys |= set(re.findall(r'register_\w+\(\s*\n?\s*"([a-z0-9_\-]+)"', src))
    keys -= {"thing_classes", "thing_colors",
             "thing_dataset_id_to_contiguous_id"}  # metadata dict keys
    known = set(registry.list_datasets())
    missing = sorted(keys - known)
    assert not missing, missing


def test_loader_mixes_datasets_with_per_dataset_batch_sizes(tmp_path):
    paths = make_mini_coco(str(tmp_path), n_train=6, n_val=2, seed=3)
    recs, cats = load_coco_json(paths["train_json"], paths["train_root"])
    cfg = DataConfig(max_insts=8, max_text_len=32, min_size_train=(64,),
                     max_size_train=96)
    m_det = UniDatasetMapper(cfg, cats, is_train=True, with_masks=True)
    m_small = UniDatasetMapper(
        DataConfig(max_insts=8, max_text_len=32, min_size_train=(48,),
                   max_size_train=64), cats, is_train=True, with_masks=True)
    loader = MultiDatasetLoader(
        [(recs, m_det, 2), (recs[:3], m_small, 3)], [0.5, 0.5],
        seed=0, num_workers=2)
    sizes_seen = set()
    it = iter(loader)
    for _ in range(6):
        b = next(it)
        bsz = b["images"].shape[0]
        assert bsz in (2, 3)
        sizes_seen.add(bsz)
        assert np.isfinite(b["images"]).all()
    assert sizes_seen == {2, 3}, sizes_seen


def test_train_recipes_table():
    """TRAIN_RECIPES covers every reference training yaml: 3 stages x 3
    backbones, 5 single-task runs, 2 SegInW checkpoints (configs/*.yaml
    minus the eval-only ones)."""
    from uninext_tpu import config as config_mod
    known = set(registry.list_datasets())
    assert set(registry.TRAIN_RECIPES) == {
        "obj365_pretrain", "image_joint", "video_joint", "single_task_det",
        "single_task_rec", "single_task_vis", "single_task_sot",
        "single_task_rvos",
        "obj365_pretrain_vit_huge", "obj365_pretrain_convnext",
        "image_joint_vit_huge", "image_joint_convnext",
        "video_joint_vit_huge", "video_joint_convnext",
        "seginw", "seginw_vit_huge"}
    # schedule parity for the one variant whose yaml overrides it
    # (image_joint_vit_huge_32g.yaml: STEPS (40000,), MAX_ITER 48000)
    assert registry.TRAIN_RECIPES["image_joint_vit_huge"][2] == \
        (40000, 48000)
    for name, (base, recipe_fn, (step, max_iter), src) in \
            registry.TRAIN_RECIPES.items():
        assert hasattr(config_mod, base), base
        rows = recipe_fn()
        assert rows, name
        for row in rows:
            assert row[0] in known, (name, row[0])
        assert 0 < step < max_iter, name
    # single-task recipes subset the joint ones (single_task_vis.yaml etc.)
    assert len(registry.TRAIN_RECIPES["single_task_vis"][1]()) == 3
    assert len(registry.TRAIN_RECIPES["single_task_sot"][1]()) == 5
    assert len(registry.TRAIN_RECIPES["single_task_rvos"][1]()) == 2


def _mini_coco_layout(tmp_path, monkeypatch):
    """Arrange make_mini_coco output in the reference datasets/ layout."""
    import os
    import shutil
    paths = make_mini_coco(str(tmp_path / "src"), n_train=5, n_val=2, seed=0)
    root = tmp_path / "datasets"
    (root / "coco" / "annotations").mkdir(parents=True)
    shutil.copytree(paths["train_root"], root / "coco" / "train2017")
    shutil.copy(paths["train_json"],
                root / "coco" / "annotations" / "instances_train2017.json")
    monkeypatch.setenv("UNINEXT_DATA", str(root))
    return root


def test_build_recipe_image_smoke(tmp_path, monkeypatch):
    from uninext_tpu.config import tiny_test_config
    _mini_coco_layout(tmp_path, monkeypatch)
    cfg = tiny_test_config()
    cfg2, datasets, ratios, video = registry.build_recipe(
        "single_task_det", cfg)
    assert not video and len(datasets) == 1 and ratios == [1.0]
    assert datasets[0][3] == "detection"      # per-batch task routing tag
    assert cfg2.solver.max_iter == 177600       # single_task_det.yaml
    loader = MultiDatasetLoader(datasets, ratios, num_workers=1)
    b = next(iter(loader))
    assert b["images"].shape[0] == 2
    assert np.isfinite(b["images"]).all()


def test_coco2video_converter_and_pair_loader(tmp_path, monkeypatch):
    """coco2video pseudo-video json loads through the registry and the
    loader emits collated (key, ref) video batches."""
    import subprocess
    import sys
    root = _mini_coco_layout(tmp_path, monkeypatch)
    src = root / "coco" / "annotations" / "instances_train2017.json"
    dst = root / "coco" / "annotations" / "instances_train2017_video.json"
    subprocess.run([sys.executable, "tools/convert_datasets.py", "coco2video",
                    "--input", str(src), "--output", str(dst)], check=True)
    # sot variant: single "object" category
    dst_sot = root / "coco" / "annotations" / \
        "instances_train2017_video_sot.json"
    subprocess.run([sys.executable, "tools/convert_datasets.py", "coco2video",
                    "--sot", "--input", str(src), "--output", str(dst_sot)],
                   check=True)
    recs, cats, task = registry.get_dataset("coco_2017_train_video")
    assert len(recs) == 5 and recs[0]["length"] == 1
    recs_sot, cats_sot, _ = registry.get_dataset("sot_coco_2017_train")
    assert cats_sot == ["object"]

    from uninext_tpu.config import DataConfig
    from uninext_tpu.data.video import VideoPairMapper
    dcfg = DataConfig(max_insts=8, max_text_len=32, min_size_train=(64,),
                      max_size_train=96)
    mapper = VideoPairMapper(dcfg, cats, sampling_frame_range=1)
    loader = MultiDatasetLoader([(recs, mapper, 2)], [1.0], num_workers=1)
    b = next(iter(loader))
    assert b["images_key"].shape == b["images_ref"].shape
    assert b["images_key"].shape[0] == 2
    assert b["targets_key"]["boxes"].shape == b["targets_ref"]["boxes"].shape


def test_rfs_and_class_aware_sampling():
    """USE_RFS repeat factors + obj365 ClassAwareSampler distribution
    (reference custom_dataset_dataloader.py:228-246, build.py:265)."""
    from uninext_tpu.data.loader import (class_aware_weights,
                                         repeat_factors_from_category_frequency)
    recs = ([{"annotations": [{"category_id": 1}]}] * 90
            + [{"annotations": [{"category_id": 2}]}] * 10)
    # rare category (f=0.1) repeated sqrt(t/f) times at t=0.5; common capped 1
    w = repeat_factors_from_category_frequency(recs, repeat_thresh=0.5)
    assert w[95] > w[0]
    assert abs(w.sum() - len(recs)) < 1e-6          # mass preserved
    np.testing.assert_allclose(w[95] / w[0], np.sqrt(0.5 / 0.1), rtol=1e-6)

    # class-aware: each category gets equal total mass -> rare recs 5x up
    cw = class_aware_weights(recs)
    assert abs(cw[:90].sum() - 0.5) < 1e-9
    assert abs(cw[90:].sum() - 0.5) < 1e-9

    # through the loader: rare category appears ~half the time
    import collections
    from uninext_tpu.data.loader import MultiDatasetLoader
    tagged = [dict(r, i=i) for i, r in enumerate(recs)]
    loader = MultiDatasetLoader([(tagged, lambda r, rng=None: r, 1)], [1.0],
                                record_weights=[cw], seed=3)
    counts = collections.Counter()
    it = loader._sample_records()
    for _ in range(2000):
        _, r = next(it)
        counts[r["annotations"][0]["category_id"]] += 1
    frac = counts[2] / 2000
    assert 0.4 < frac < 0.6, frac


def test_recipe_record_weights_obj365_class_aware():
    """The obj365 stage gets the ClassAwareSampler distribution; everything
    else samples uniformly (every shipped USE_RFS flag is False)."""
    recs = ([{"annotations": [{"category_id": 5}]}] * 9
            + [{"annotations": [{"category_id": 6}]}])
    datasets = [(recs, None, 2, "detection")]
    w = registry.recipe_record_weights("obj365_pretrain", datasets)
    assert w is not None and len(w) == 1
    assert abs(w[0][9:].sum() - 0.5) < 1e-9       # rare cat = half the mass
    assert registry.recipe_record_weights("image_joint", datasets) is None
