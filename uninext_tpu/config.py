"""Configuration for UNINEXT-TPU.

Frozen dataclasses (hashable -> usable as jit static args). Field names and
defaults mirror the reference's yacs config (`uninext/config.py:5-210` and
`configs/image_joint_r50.yaml`) but are grouped the JAX way: a single nested,
immutable tree. Use `dataclasses.replace` to derive variants.
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple


@dataclasses.dataclass(frozen=True)
class BackboneConfig:
    # one of: "resnet50", "convnext_large", "vit_huge"
    name: str = "resnet50"
    # strides of the backbone feature maps fed to the transformer
    out_strides: Tuple[int, ...] = (8, 16, 32)
    out_channels: Tuple[int, ...] = (512, 1024, 2048)
    # freeze stem + stage1 like detectron2's FREEZE_AT=2 default
    freeze_at: int = 2
    # ViT specifics (ViTDet-style plain backbone; reference uninext/backbone/vit.py)
    vit_patch_size: int = 16
    vit_embed_dim: int = 1280
    vit_depth: int = 32
    vit_num_heads: int = 16
    vit_window_size: int = 14
    # None = the reference D2ViT ViT-huge layout (windowed blocks
    # {0,1,3,4,6,7,9,10}, all others global; backbone/vit.py:411-421).
    # Supply an explicit tuple of GLOBAL block indices to override (e.g.
    # ViTDet-H's (7, 15, 23, 31) for a cheaper from-scratch layout).
    vit_global_blocks: Optional[Tuple[int, ...]] = None
    vit_drop_path_rate: float = 0.5     # MODEL.VIT drop_path_rate (ViT-huge)
    # q-row chunk for global-block attention (lax.map over row blocks keeps
    # the (Lq, Lk) logits buffer bounded at high resolution); 0 = off
    vit_global_q_rows: int = 8
    # Pallas flash global attention with folded rel-pos bias; None = auto
    # (on for TPU backends, off for CPU/GPU — models/vit.py)
    vit_flash_attn: Optional[bool] = None
    # gradient-checkpoint each ViT block (reference MODEL.VIT.USE_CHECKPOINT,
    # True in every *vit_huge training yaml)
    vit_use_checkpoint: bool = True
    # ConvNeXt specifics
    convnext_depths: Tuple[int, ...] = (3, 3, 27, 3)
    convnext_dims: Tuple[int, ...] = (192, 384, 768, 1536)
    drop_path_rate: float = 0.0
    # 4-channel template backbone (SOT/VOS); reference uninext_vid.py:160-167
    in_channels: int = 3


@dataclasses.dataclass(frozen=True)
class LanguageConfig:
    # Text encoder; reference models/deformable_detr/bert_model.py supports
    # MODEL.LANGUAGE_BACKBONE.MODEL_TYPE in {bert-base-uncased, roberta-base}
    model_type: str = "bert-base-uncased"
    vocab_size: int = 30522
    hidden_dim: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_dim: int = 3072
    max_len: int = 256          # MODEL.LANGUAGE_BACKBONE.MAX_QUERY_LEN
    type_vocab_size: int = 2
    max_position_embeddings: int = 512
    layer_norm_eps: float = 1e-12
    pad_token_id: int = 0       # roberta: 1 (drives its position-id scheme)
    freeze: bool = False        # MODEL.FREEZE_TEXT_ENCODER
    # PARALLEL_DET builds a block-diagonal attention mask per class name
    parallel_det: bool = False


def roberta_base_language() -> "LanguageConfig":
    """roberta-base variant (bert_model.py:21-26)."""
    return LanguageConfig(model_type="roberta-base", vocab_size=50265,
                          type_vocab_size=1, max_position_embeddings=514,
                          layer_norm_eps=1e-5, pad_token_id=1)


@dataclasses.dataclass(frozen=True)
class TransformerConfig:
    # reference: MODEL.DDETRS.* (uninext/config.py:156-183, image_joint_r50.yaml)
    d_model: int = 256
    nheads: int = 8
    dim_feedforward: int = 2048
    enc_layers: int = 6
    dec_layers: int = 6
    num_vl_layers: int = 1       # early-fusion layers (first N encoder layers)
    vl_hidden_dim: int = 2048    # BiAttention embed dim
    enc_n_points: int = 4
    dec_n_points: int = 4
    num_feature_levels: int = 4
    num_queries: int = 900       # NUM_OBJECT_QUERIES == TWO_STAGE_NUM_PROPOSALS
    two_stage: bool = True
    mixed_selection: bool = True
    look_forward_twice: bool = True
    dropout: float = 0.0
    use_dino: bool = True
    # denoising (MODEL.DDETRS.DN_*)
    dn_number: int = 100
    label_noise_ratio: float = 0.5
    box_noise_scale: float = 1.0
    # decoupled target (MODEL.DECOUPLE_TGT / STILL_TGT_FOR_BOTH)
    decouple_tgt: bool = True
    still_tgt_for_both: bool = True
    use_early_fusion: bool = True
    # MODEL.USE_ADDITIONAL_BERT (reference config.py:75): one extra
    # (clamped) BERT layer on the language stream after EVERY encoder layer
    # (deformable_transformer_dino.py:69-76,326: vl -> deform -> lang).
    # Default off, matching the reference flagship configs.
    use_additional_bert: bool = False
    still_cls_for_encoder: bool = True
    use_iou_branch: bool = True
    # VL_Align (MODEL.DYHEAD.*)
    log_scale: float = 0.0
    prior_prob: float = 0.01
    clamp_dot_product: bool = True
    # sequence parallelism: shard the flattened image tokens over the mesh's
    # "model" axis inside the encoder (the TPU answer to the reference's
    # absent long-context story, SURVEY §5 — lets bs=1 serving scale over
    # chips). Requires running under a mesh with a "model" axis.
    sp_encoder: bool = False


@dataclasses.dataclass(frozen=True)
class MaskHeadConfig:
    # CondInst dynamic mask head; reference models/ddetrs.py:29-82
    enabled: bool = True
    dynamic_mask_channels: int = 8
    controller_layers: int = 3     # MODEL.DDETRS.CTRL_LAYERS
    mask_out_stride: int = 4       # MODEL.DDETRS.MASK_STRIDE
    rel_coord: bool = True         # MODEL.DDETRS.USE_REL_COORD
    new_mask_head: bool = False
    use_raft: bool = False
    max_insts: int = 100           # static bound on matched instances per image


@dataclasses.dataclass(frozen=True)
class LossConfig:
    # reference loss weights (uninext/config.py:141-150) and matcher costs
    class_weight: float = 2.0
    l1_weight: float = 5.0
    giou_weight: float = 2.0
    mask_weight: float = 2.0
    dice_weight: float = 5.0
    reid_weight: float = 2.0
    focal_alpha: float = 0.25
    focal_gamma: float = 2.0
    aux_loss: bool = True
    # matcher
    ota: bool = True               # MODEL.OTA (simOTA dynamic-k for decoder layers)
    set_cost_class: float = 2.0
    set_cost_box: float = 5.0
    set_cost_giou: float = 2.0
    # per-task loss scale for the routed SOT arm of joint video training.
    # The reference balances tasks by mixture ratio alone (DATASET_RATIO,
    # configs/video_joint_r50.yaml:38-75); this is the complementary lever
    # for the measured toy-scale joint-VIS interference (JOINTABRESULT r4):
    # keep SOT exposure but shrink its pull on the shared trunk.
    sot_loss_scale: float = 1.0
    # BoxInst (MODEL.BOXINST.*) — box-supervised segmentation for BDD MOTS
    boxinst: bool = False
    boxinst_pairwise_size: int = 3
    boxinst_pairwise_dilation: int = 2
    boxinst_pairwise_color_thresh: float = 0.3
    boxinst_warmup_iters: int = 10000
    boxinst_bottom_pixels_removed: int = 10


@dataclasses.dataclass(frozen=True)
class SotConfig:
    # reference SOT.* (uninext/config.py:58-69)
    template_size: int = 256
    search_area_factor: float = 2.0
    ref_feat_size: int = 8
    extra_backbone_for_template: bool = False
    feature_fusion: bool = False
    online_update: bool = False
    update_interval: int = 200
    update_threshold: float = 0.7
    inference_on_3f: bool = False
    inst_threshold_vos: float = 0.5


@dataclasses.dataclass(frozen=True)
class TrackConfig:
    # reference TRACK.* / MODEL.IDOL.* (uninext/config.py:53-55,124-134)
    init_score_thr: float = 0.5
    obj_score_thr: float = 0.3
    inference_select_thr: float = 0.1
    # IDOL (VIS) tracker gates (reference MODEL.IDOL.*, uninext/config.py)
    idol_init_score_thr: float = 0.2
    idol_addnew_score_thr: float = 0.5
    idol_obj_score_thr: float = 0.1
    idol_match_score_thr: float = 0.5
    apply_cls_thr: float = 0.05
    temporal_score_type: str = "mean"
    memory_len: int = 3
    frame_weight: bool = True
    temporal_weight: bool = True
    multi_cls_on: bool = True


@dataclasses.dataclass(frozen=True)
class DataConfig:
    max_insts: int = 100            # static per-image GT bound
    max_text_len: int = 256
    pixel_mean: Tuple[float, float, float] = (123.675, 116.280, 103.530)
    pixel_std: Tuple[float, float, float] = (58.395, 57.120, 57.375)
    size_divisibility: int = 32
    # multi-scale shortest-edge buckets at train; one bucket per compiled shape
    min_size_train: Tuple[int, ...] = (480, 512, 544, 576, 608, 640, 672, 704, 736, 768, 800)
    max_size_train: int = 1333
    # INPUT.CROP (image_joint_r50.yaml:50-53 / video_joint_r50.yaml:122-125):
    # 50% of train samples go through [pre-resize ->] RandomCrop -> resize.
    # Off in the base dataclass; the flagship presets below enable it.
    crop_enabled: bool = False
    crop_type: str = "absolute_range"
    crop_size: Tuple[int, int] = (384, 600)
    min_size_test: int = 800
    max_size_test: int = 1333
    sampling_frame_num: int = 2
    sampling_frame_range: int = 10


@dataclasses.dataclass(frozen=True)
class SolverConfig:
    # reference image_joint_r50.yaml SOLVER.*
    base_lr: float = 2e-4
    lang_lr: float = 1e-5
    vl_lr: float = 2e-4
    backbone_multiplier: float = 0.1
    linear_proj_multiplier: float = 0.1
    weight_decay: float = 0.05
    grad_clip: float = 0.1
    warmup_iters: int = 200
    warmup_factor: float = 1.0
    steps: Tuple[int, ...] = (76658,)
    gamma: float = 0.1
    max_iter: int = 91990
    ims_per_batch: int = 32
    checkpoint_period: int = 2500
    # single-chip path to the reference's global batch (bs=32 over 16 GPUs,
    # image_joint_r50.yaml:29): accumulate k micro-batch grads, apply one
    # AdamW update with the grad-norm clip on the AVERAGED grad. NOTE:
    # warmup_iters/steps/max_iter stay in units of optimizer UPDATES; the
    # train loop then runs k micro-steps per update.
    grad_accum_steps: int = 1
    # dtype of Adam's first moment (optax mu_dtype); None = param dtype
    # (f32). "bfloat16" halves the m buffer — the single-chip memory lever
    # for ViT-H's two-tower 1.3B-param stage 3 (docs/PERF.md ViT-H
    # feasibility); multi-chip runs shard the state instead and keep f32.
    adam_mu_dtype: Optional[str] = None
    # dispatch amortization (round 5): run k train steps per device
    # dispatch via ONE jitted lax.scan over k host-stacked same-(task,
    # shape) batches. The math is IDENTICAL to k sequential steps (same
    # optimizer updates, same rng stream per step); only host<->device
    # round-trips drop by k. The lever for high-latency links (this
    # sandbox's tunnel stalls seconds per dispatch) and a genuine
    # production win on remote-coordinator topologies. Routed multi-task
    # loaders buffer per (task, shape) and dispatch each chunk when full,
    # preserving mixture ratios while locally reordering across tasks.
    chunk_steps: int = 1


@dataclasses.dataclass(frozen=True)
class ParallelConfig:
    # mesh axes: data (batch), model (reserved for TP of ViT-H)
    data_axis: str = "data"
    model_axis: str = "model"
    model_parallel_size: int = 1


@dataclasses.dataclass(frozen=True)
class UninextConfig:
    backbone: BackboneConfig = BackboneConfig()
    language: LanguageConfig = LanguageConfig()
    transformer: TransformerConfig = TransformerConfig()
    mask_head: MaskHeadConfig = MaskHeadConfig()
    loss: LossConfig = LossConfig()
    sot: SotConfig = SotConfig()
    track: TrackConfig = TrackConfig()
    data: DataConfig = DataConfig()
    solver: SolverConfig = SolverConfig()
    parallel: ParallelConfig = ParallelConfig()
    # compute dtype for backbone/transformer matmuls; params & heads stay f32
    compute_dtype: str = "bfloat16"
    # rematerialize encoder layers in backward (the reference gradient-
    # checkpoints VL fusion/BERT/transformer; here remat also avoids storing
    # the ~1GB/layer gathered MSDA intermediate)
    remat_encoder: bool = True
    # lax.scan over encoder layers (one compiled body, stacked params) —
    # cuts compile time ~(enc_layers)x; disable for torch-checkpoint layout
    scan_encoder: bool = True
    # reid embedding head (video tasks)
    use_reid: bool = False
    reid_layers: int = 3
    # USE_DEFORMABLE_REID_HEAD / N_LAYER_DEFORMABLE_REID / DETACH_REID
    use_deformable_reid: bool = False
    n_layer_deformable_reid: int = 2
    detach_reid: bool = False
    # R-VOS temporal selection consistency (round 5, VERDICT r4 #3): blend
    # the per-frame referring score with reid-embedding cosine similarity
    # to the PREVIOUS frame's selected query:
    #   score = prob * ((1 - w) + w * (cos + 1) / 2)
    # w=0 reproduces the reference's frame-independent argmax
    # (inference_rvos, uninext_vid.py:1293-1357 — sigmoid x sqrt(IoU) only);
    # the reid machinery this rides on exists for VIS/MOT association.
    rvos_temporal_weight: float = 0.0


def image_joint_r50() -> UninextConfig:
    """Stage-2 flagship: R50, 900 queries, DINO two-stage, OTA, IoU branch.

    Mirrors reference configs/image_joint_r50.yaml (incl. INPUT.CROP
    ENABLED absolute_range (384, 600), yaml:50-53).
    """
    base = UninextConfig()
    return dataclasses.replace(
        base, data=dataclasses.replace(base.data, crop_enabled=True))


def video_joint_r50() -> UninextConfig:
    """Stage-3: reid head + template machinery (video_joint_r50.yaml:2-37:
    deformable reid head with detached inputs, 4-channel extra template
    backbone, SOT P3-P6 feature fusion, frozen text encoder)."""
    base = image_joint_r50()
    return dataclasses.replace(
        base, use_reid=True, use_deformable_reid=True,
        n_layer_deformable_reid=2, detach_reid=True,
        language=dataclasses.replace(base.language, freeze=True),
        sot=dataclasses.replace(base.sot, extra_backbone_for_template=True,
                                feature_fusion=True))


def image_joint_convnext_large() -> UninextConfig:
    """ConvNeXt-Large flagship variant (reference configs/*convnext*)."""
    return dataclasses.replace(
        image_joint_r50(),
        backbone=BackboneConfig(name="convnext_large",
                                out_channels=(384, 768, 1536),
                                drop_path_rate=0.7))


def video_joint_convnext_large() -> UninextConfig:
    """ConvNeXt-Large stage-3 variant (reference
    configs/video_joint_convnext_large.yaml: _BASE_ video_joint_r50 +
    D2ConvNeXt, init from image_joint_convnext_large model_final_4c)."""
    return dataclasses.replace(
        video_joint_r50(),
        backbone=BackboneConfig(name="convnext_large",
                                out_channels=(384, 768, 1536),
                                drop_path_rate=0.7))


def image_joint_vit_huge() -> UninextConfig:
    """ViT-Huge stage-2 variant (reference configs/image_joint_vit_huge_32g:
    D2ViT 'ViT-huge' + USE_CHECKPOINT True over the image-joint recipe)."""
    return dataclasses.replace(
        image_joint_r50(),
        backbone=BackboneConfig(name="vit_huge",
                                out_channels=(640, 1280, 1280)))


def video_joint_vit_huge() -> UninextConfig:
    """ViT-Huge stage-3 variant (reference configs/video_joint_vit_huge)."""
    return dataclasses.replace(
        video_joint_r50(),
        backbone=BackboneConfig(name="vit_huge",
                                out_channels=(640, 1280, 1280)))


def tiny_test_config() -> UninextConfig:
    """Small config for unit tests: 2 layers, 60 queries, small dims."""
    return UninextConfig(
        backbone=BackboneConfig(name="resnet50", out_channels=(512, 1024, 2048)),
        language=LanguageConfig(num_layers=2, hidden_dim=64, num_heads=4,
                                intermediate_dim=128, max_len=32),
        transformer=TransformerConfig(
            d_model=64, nheads=4, dim_feedforward=128, enc_layers=2, dec_layers=2,
            num_vl_layers=1, vl_hidden_dim=64, num_queries=60, dn_number=10),
        mask_head=MaskHeadConfig(max_insts=20),
        # crop off in the tiny config: unit tests pin deterministic geometry
        data=DataConfig(max_insts=20, max_text_len=32, crop_enabled=False),
        compute_dtype="float32",
    )


def tiny_video_test_config() -> UninextConfig:
    """tiny_test_config + the stage-3 video towers (reid embeds for
    MOT/VIS association, template machinery for SOT/VOS) — what the video
    CLI drivers need from a test-scale model."""
    base = tiny_test_config()
    return dataclasses.replace(
        base, use_reid=True,
        sot=dataclasses.replace(base.sot, extra_backbone_for_template=True,
                                feature_fusion=True))


# ---- per-task evaluation presets (reference configs/eval-vid/*.yaml) ------
# The 17 eval yamls vary only in TEST datasets + INPUT.MIN_SIZE_TEST (same
# matrix for R50 / ConvNeXt-L / ViT-H); VOTS additionally switches the
# meta-architecture to the mask-reporting SOT variant.
EVAL_PRESETS = {
    "vis": {"datasets": ("ytvis_2019_val",), "min_size_test": 480,
            "max_size_test": 1333},
    "ovis": {"datasets": ("ytvis_ovis_val",), "min_size_test": 720,
             "max_size_test": 1333},          # "720 for ovis"
    "vis21": {"datasets": ("ytvis_2021_val",), "min_size_test": 480,
              "max_size_test": 1333},
    "mot": {"datasets": ("bdd_box_track_val",), "min_size_test": 800,
            "max_size_test": 1333},
    "mots": {"datasets": ("bdd_seg_track_val",), "min_size_test": 800,
             "max_size_test": 1333},
    "rvos": {"datasets": ("rvos-refytb-val", "rvos-refdavis-val-0",
                          "rvos-refdavis-val-1", "rvos-refdavis-val-2",
                          "rvos-refdavis-val-3"),
             "min_size_test": 480, "max_size_test": 1333},
    "sot": {"datasets": ("sot_lasot_test", "sot_lasot_ext_test",
                         "sot_trackingnet_test", "sot_tnl2k_test"),
            "min_size_test": 800, "max_size_test": 1333},
    "vots": {"datasets": ("sot_lasot_test", "sot_lasot_ext_test",
                          "sot_trackingnet_test", "sot_tnl2k_test"),
             "min_size_test": 800, "max_size_test": 1333,
             "with_mask": True},              # UNINEXT_VOTS meta-arch
    "vos": {"datasets": ("sot_ytbvos18_val", "sot_davis17_val"),
            "min_size_test": 480, "max_size_test": 1333},
    "coco": {"datasets": ("coco_2017_val",), "min_size_test": 800,
             "max_size_test": 1333},
    "refcoco": {"datasets": ("refcoco-unc-val", "refcoco-unc-testA",
                             "refcoco-unc-testB"),
                "min_size_test": 800, "max_size_test": 1333},
}


def eval_config(base: UninextConfig, task: str):
    """Apply an eval preset: returns (cfg with the preset's test sizes,
    dataset names tuple, with_mask flag)."""
    p = EVAL_PRESETS[task]
    cfg = dataclasses.replace(
        base, data=dataclasses.replace(base.data,
                                       min_size_test=p["min_size_test"],
                                       max_size_test=p["max_size_test"]))
    return cfg, p["datasets"], p.get("with_mask", False)
