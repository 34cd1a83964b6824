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
