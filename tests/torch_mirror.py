"""Build the REFERENCE UNINEXT_IMG model (torch, CPU, random init) as a
numerical oracle for full-model parity tests.

This composes the reference's own classes exactly as
/root/reference/projects/UNINEXT/uninext/uninext_img.py:60-190 does —
detectron2 ResNet -> Joiner(+PositionEmbeddingSine) ->
DeformableTransformerVLDINO -> DeformableDETRDINO -> DDETRSegmUniDN, plus
BertEncoder — under the image_joint_r50 flagship config, bypassing only the
detectron2 meta-arch wrapper (dataloader/ImageList plumbing) and the
tokenizer (ids are fed directly).
"""
from __future__ import annotations

import sys
import types

from tests.torch_ref_shim import (install_detectron2_shim, import_reference,
                                  _load_file)


class MiniCN:
    """Attribute-dict stand-in for detectron2's CfgNode (config container
    only; the reference model classes just read attributes)."""

    def __init__(self, **kw):
        self.__dict__.update(kw)

    def __repr__(self):
        return f"MiniCN({self.__dict__})"


def build_cfg():
    """Reference defaults (their own add_uninext_config) + the
    image_joint_r50.yaml deltas + the handful of detectron2 defaults the
    model path reads (detectron2/config/defaults.py values)."""
    install_detectron2_shim()
    if "detectron2.config" not in sys.modules:
        import importlib.machinery
        m = types.ModuleType("detectron2.config")
        m.__spec__ = importlib.machinery.ModuleSpec("detectron2.config", None)
        m.CfgNode = MiniCN
        sys.modules["detectron2.config"] = m

    cfg = MiniCN()
    cfg.MODEL = MiniCN()
    cfg.MODEL.DEVICE = "cpu"
    cfg.DATASETS = MiniCN()
    cfg.DATALOADER = MiniCN()
    cfg.INPUT = MiniCN()
    cfg.SOLVER = MiniCN()
    cfg.SOLVER.AMP = MiniCN(ENABLED=False)
    cfg.TEST = MiniCN()
    # detectron2 defaults read by build_resnet_backbone (defaults.py:131-500)
    cfg.MODEL.BACKBONE = MiniCN(NAME="build_resnet_backbone", FREEZE_AT=2)
    cfg.MODEL.RESNETS = MiniCN(
        DEPTH=50, OUT_FEATURES=["res3", "res4", "res5"], NUM_GROUPS=1,
        NORM="FrozenBN", WIDTH_PER_GROUP=64, STRIDE_IN_1X1=False,
        RES5_DILATION=1, RES2_OUT_CHANNELS=256, STEM_OUT_CHANNELS=64,
        DEFORM_ON_PER_STAGE=[False] * 4, DEFORM_MODULATED=False,
        DEFORM_NUM_GROUPS=1)
    cfg.MODEL.PIXEL_MEAN = [123.675, 116.280, 103.530]
    cfg.MODEL.PIXEL_STD = [58.395, 57.120, 57.375]
    cfg.MODEL.MASK_ON = True

    ref_cfg_mod = import_reference("uninext.config")
    ref_cfg_mod.add_uninext_config(cfg)

    # image_joint_r50.yaml deltas (configs/image_joint_r50.yaml:2-26)
    cfg.MODEL.USE_IOU_BRANCH = True
    cfg.MODEL.LANG_GUIDE_DET = True
    cfg.MODEL.DECOUPLE_TGT = True
    cfg.MODEL.STILL_TGT_FOR_BOTH = True
    cfg.MODEL.OTA = True
    cfg.MODEL.STILL_CLS_FOR_ENCODER = True
    d = cfg.MODEL.DDETRS
    d.NUM_OBJECT_QUERIES = 900
    d.TWO_STAGE_NUM_PROPOSALS = 900
    d.USE_DINO = True
    d.DYNAMIC_LABEL_ENC = True
    d.DROPOUT = 0.0
    d.TWO_STAGE = True
    d.MIXED_SELECTION = True
    d.LOOK_FORWARD_TWICE = True
    # no gradient checkpointing on CPU oracle
    cfg.MODEL.VL_FUSION_USE_CHECKPOINT = False
    cfg.MODEL.LANGUAGE_BACKBONE.USE_CHECKPOINT = False
    d.USE_CHECKPOINT = False
    return cfg


def shrink_cfg(cfg, *, enc_layers=2, dec_layers=2, queries=60, bert_layers=2,
               hidden=None):
    """Optionally shrink depth for faster CPU oracle runs (keeps all widths
    and every architectural feature on)."""
    cfg.MODEL.DDETRS.ENC_LAYERS = enc_layers
    cfg.MODEL.DDETRS.DEC_LAYERS = dec_layers
    cfg.MODEL.DDETRS.NUM_OBJECT_QUERIES = queries
    cfg.MODEL.DDETRS.TWO_STAGE_NUM_PROPOSALS = queries
    cfg.BERT_NUM_LAYERS = bert_layers
    return cfg


class MaskedBackboneEquiv:
    """Functional equivalent of reference backbone/masked_backbone.py:10-29
    without detectron2's build_backbone registry plumbing."""

    def __new__(cls, cfg, channels=3):
        import torch
        import torch.nn as nn
        import torch.nn.functional as F
        rn = sys.modules["detectron2.modeling.backbone.resnet"]
        shape_spec = sys.modules["detectron2.layers.shape_spec"]
        misc = import_reference("uninext.util.misc")

        backbone = rn.build_resnet_backbone(
            cfg, shape_spec.ShapeSpec(channels=channels, height=None,
                                      width=None, stride=None))
        backbone_shape = backbone.output_shape()

        class _MB(nn.Module):
            def __init__(self):
                super().__init__()
                self.backbone = backbone
                self.feature_strides = [backbone_shape[f].stride
                                        for f in backbone_shape.keys()]
                self.num_channels = [backbone_shape[f].channels
                                     for f in backbone_shape.keys()]

            def forward(self, tensor_list):
                xs = self.backbone(tensor_list.tensors)
                out = {}
                for name, x in xs.items():
                    m = tensor_list.mask
                    mask = F.interpolate(
                        m[None].float(), size=x.shape[-2:]).to(torch.bool)[0]
                    out[name] = misc.NestedTensor(x, mask)
                return out

        return _MB()


def build_reference_model(cfg, seed=0):
    """The composed reference model, eval mode, deterministic random init."""
    import torch
    torch.manual_seed(seed)

    dt_dino = import_reference(
        "uninext.models.deformable_detr.deformable_transformer_dino")
    dd = import_reference("uninext.models.deformable_detr.deformable_detr")
    ddn = import_reference("uninext.models.ddetrs_dn")
    pe = import_reference("uninext.models.deformable_detr.position_encoding")
    bk = import_reference("uninext.models.deformable_detr.backbone")
    bm = import_reference("uninext.models.deformable_detr.bert_model")

    hidden_dim = cfg.MODEL.DDETRS.HIDDEN_DIM
    d2_backbone = MaskedBackboneEquiv(cfg)
    backbone = bk.Joiner(d2_backbone,
                         pe.PositionEmbeddingSine(hidden_dim // 2,
                                                  normalize=True))
    backbone.num_channels = d2_backbone.num_channels
    backbone.strides = d2_backbone.feature_strides

    transformer = dt_dino.DeformableTransformerVLDINO(
        d_model=hidden_dim,
        nhead=cfg.MODEL.DDETRS.NHEADS,
        num_encoder_layers=cfg.MODEL.DDETRS.ENC_LAYERS,
        num_decoder_layers=cfg.MODEL.DDETRS.DEC_LAYERS,
        dim_feedforward=cfg.MODEL.DDETRS.DIM_FEEDFORWARD,
        dropout=cfg.MODEL.DDETRS.DROPOUT,
        activation="relu",
        return_intermediate_dec=True,
        num_feature_levels=cfg.MODEL.DDETRS.NUM_FEATURE_LEVELS,
        dec_n_points=cfg.MODEL.DDETRS.DEC_N_POINTS,
        enc_n_points=cfg.MODEL.DDETRS.ENC_N_POINTS,
        two_stage=cfg.MODEL.DDETRS.TWO_STAGE,
        two_stage_num_proposals=cfg.MODEL.DDETRS.TWO_STAGE_NUM_PROPOSALS,
        use_checkpoint=cfg.MODEL.DDETRS.USE_CHECKPOINT,
        look_forward_twice=cfg.MODEL.DDETRS.LOOK_FORWARD_TWICE,
        mixed_selection=cfg.MODEL.DDETRS.MIXED_SELECTION,
        cfg=cfg)

    model = dd.DeformableDETRDINO(
        backbone, transformer,
        num_queries=cfg.MODEL.DDETRS.NUM_OBJECT_QUERIES,
        num_feature_levels=cfg.MODEL.DDETRS.NUM_FEATURE_LEVELS,
        aux_loss=cfg.MODEL.DDETRS.DEEP_SUPERVISION,
        with_box_refine=True,
        two_stage=cfg.MODEL.DDETRS.TWO_STAGE,
        mixed_selection=cfg.MODEL.DDETRS.MIXED_SELECTION,
        cfg=cfg)

    detr = ddn.DDETRSegmUniDN(
        model, rel_coord=cfg.MODEL.DDETRS.USE_REL_COORD
        if hasattr(cfg.MODEL.DDETRS, "USE_REL_COORD") else True,
        ota=cfg.MODEL.OTA,
        new_mask_head=cfg.MODEL.DDETRS.NEW_MASK_HEAD,
        use_raft=cfg.MODEL.DDETRS.USE_RAFT,
        mask_out_stride=cfg.MODEL.DDETRS.MASK_STRIDE,
        decouple_tgt=cfg.MODEL.DECOUPLE_TGT,
        cls_pool_type=cfg.MODEL.CLS_POOL_TYPE,
        use_iou_branch=cfg.MODEL.USE_IOU_BRANCH,
        cfg=cfg)

    text_encoder = _build_bert_encoder(bm, cfg, seed)

    import torch.nn as nn
    from collections import OrderedDict

    class Composed(nn.Module):
        """Mirrors uninext_img.py attribute naming so state_dict() keys match
        the real checkpoint layout (uninext_img.py:136-148)."""

        def __init__(self):
            super().__init__()
            self.detr = detr
            self.text_encoder = nn.Sequential(
                OrderedDict([("body", text_encoder)]))

    composed = Composed().eval()
    return composed


def build_vid_cfg():
    """video_joint_r50.yaml deltas on top of the image config (yaml:2-37):
    deformable reid head, detached reid, 4-channel extra template backbone,
    SOT P3-P6 feature fusion."""
    cfg = build_cfg()
    cfg.DETACH_REID = True
    cfg.USE_DEFORMABLE_REID_HEAD = True
    cfg.N_LAYER_DEFORMABLE_REID = 2
    cfg.SOT.EXTRA_BACKBONE_FOR_TEMPLATE = True
    cfg.SOT.FEAT_FUSE = True
    return cfg


def build_reference_vid_model(cfg, seed=0):
    """The composed reference VIDEO model (UNINEXT_VID composition,
    uninext_vid.py:120-185): same DETR core, wrapped by DDETRSegmUniVIDDN
    with the reid head + template machinery, plus the 4-channel
    ref_backbone attached to the inner DeformableDETRDINO."""
    import torch
    torch.manual_seed(seed)

    dt_dino = import_reference(
        "uninext.models.deformable_detr.deformable_transformer_dino")
    dd = import_reference("uninext.models.deformable_detr.deformable_detr")
    ddn_vid = import_reference("uninext.models.ddetrs_vid_dn")
    pe = import_reference("uninext.models.deformable_detr.position_encoding")
    bk = import_reference("uninext.models.deformable_detr.backbone")
    bm = import_reference("uninext.models.deformable_detr.bert_model")

    hidden_dim = cfg.MODEL.DDETRS.HIDDEN_DIM
    d2_backbone = MaskedBackboneEquiv(cfg)
    backbone = bk.Joiner(d2_backbone,
                         pe.PositionEmbeddingSine(hidden_dim // 2,
                                                  normalize=True))
    backbone.num_channels = d2_backbone.num_channels
    backbone.strides = d2_backbone.feature_strides

    transformer = dt_dino.DeformableTransformerVLDINO(
        d_model=hidden_dim,
        nhead=cfg.MODEL.DDETRS.NHEADS,
        num_encoder_layers=cfg.MODEL.DDETRS.ENC_LAYERS,
        num_decoder_layers=cfg.MODEL.DDETRS.DEC_LAYERS,
        dim_feedforward=cfg.MODEL.DDETRS.DIM_FEEDFORWARD,
        dropout=cfg.MODEL.DDETRS.DROPOUT,
        activation="relu",
        return_intermediate_dec=True,
        num_feature_levels=cfg.MODEL.DDETRS.NUM_FEATURE_LEVELS,
        dec_n_points=cfg.MODEL.DDETRS.DEC_N_POINTS,
        enc_n_points=cfg.MODEL.DDETRS.ENC_N_POINTS,
        two_stage=cfg.MODEL.DDETRS.TWO_STAGE,
        two_stage_num_proposals=cfg.MODEL.DDETRS.TWO_STAGE_NUM_PROPOSALS,
        use_checkpoint=cfg.MODEL.DDETRS.USE_CHECKPOINT,
        look_forward_twice=cfg.MODEL.DDETRS.LOOK_FORWARD_TWICE,
        mixed_selection=cfg.MODEL.DDETRS.MIXED_SELECTION,
        cfg=cfg)

    model = dd.DeformableDETRDINO(
        backbone, transformer,
        num_queries=cfg.MODEL.DDETRS.NUM_OBJECT_QUERIES,
        num_feature_levels=cfg.MODEL.DDETRS.NUM_FEATURE_LEVELS,
        aux_loss=cfg.MODEL.DDETRS.DEEP_SUPERVISION,
        with_box_refine=True,
        two_stage=cfg.MODEL.DDETRS.TWO_STAGE,
        mixed_selection=cfg.MODEL.DDETRS.MIXED_SELECTION,
        cfg=cfg)

    # 4-channel template backbone (uninext_vid.py:160-167)
    if cfg.SOT.EXTRA_BACKBONE_FOR_TEMPLATE:
        d2_ref = MaskedBackboneEquiv(cfg, channels=4)
        ref_backbone = bk.Joiner(d2_ref,
                                 pe.PositionEmbeddingSine(hidden_dim // 2,
                                                          normalize=True))
        ref_backbone.num_channels = d2_backbone.num_channels
        ref_backbone.strides = d2_backbone.feature_strides
        model.ref_backbone = ref_backbone

    detr = ddn_vid.DDETRSegmUniVIDDN(
        model, rel_coord=True, ota=cfg.MODEL.OTA,
        new_mask_head=cfg.MODEL.DDETRS.NEW_MASK_HEAD,
        use_raft=cfg.MODEL.DDETRS.USE_RAFT,
        mask_out_stride=cfg.MODEL.DDETRS.MASK_STRIDE,
        template_sz=cfg.SOT.TEMPLATE_SZ,
        extra_backbone_for_template=cfg.SOT.EXTRA_BACKBONE_FOR_TEMPLATE,
        search_area_factor=cfg.SOT.SEARCH_AREA_FACTOR,
        ref_feat_sz=cfg.SOT.REF_FEAT_SZ,
        sot_feat_fusion=cfg.SOT.FEAT_FUSE,
        use_iou_branch=cfg.MODEL.USE_IOU_BRANCH,
        decouple_tgt=cfg.MODEL.DECOUPLE_TGT,
        cfg=cfg)

    text_encoder = _build_bert_encoder(bm, cfg, seed)

    import torch.nn as nn
    from collections import OrderedDict

    class Composed(nn.Module):
        def __init__(self):
            super().__init__()
            self.detr = detr
            self.text_encoder = nn.Sequential(
                OrderedDict([("body", text_encoder)]))

    return Composed().eval()


def _build_bert_encoder(bm, cfg, seed):
    """BertEncoder with from_pretrained patched to a random-init BertModel
    (the shipped HF weights aren't available offline; parity only needs
    matched weights on both sides)."""
    import torch
    from transformers import BertConfig, BertModel

    n_layers = getattr(cfg, "BERT_NUM_LAYERS", 12)
    bert_cfg = BertConfig(vocab_size=30522, hidden_size=768,
                          num_hidden_layers=n_layers, num_attention_heads=12,
                          intermediate_size=3072, max_position_embeddings=512)

    orig_cfg_fp = BertConfig.from_pretrained
    orig_model_fp = BertModel.from_pretrained
    try:
        BertConfig.from_pretrained = classmethod(
            lambda cls, *a, **k: bert_cfg)

        def fake_model_fp(*a, **k):
            torch.manual_seed(seed + 1)
            return BertModel(bert_cfg, add_pooling_layer=False)

        BertModel.from_pretrained = staticmethod(fake_model_fp)
        return bm.BertEncoder(cfg)
    finally:
        BertConfig.from_pretrained = orig_cfg_fp
        BertModel.from_pretrained = orig_model_fp


def make_image_list(images, image_sizes):
    """Minimal stand-in for detectron2.structures.ImageList (tensor +
    per-image (h, w) sizes), as consumed by coco_inference."""

    class _IL:
        def __init__(self, tensor, sizes):
            self.tensor = tensor
            self.image_sizes = sizes

        def __len__(self):
            return len(self.image_sizes)

        def __getitem__(self, i):
            size = self.image_sizes[i]
            return self.tensor[i, ..., :size[0], :size[1]]

    return _IL(images, image_sizes)
