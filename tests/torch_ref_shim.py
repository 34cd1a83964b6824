"""Import shims that let the reference's pure-torch model code load on CPU.

The reference (/root/reference, read-only) assumes torchvision, timm, a
compiled MultiScaleDeformableAttention CUDA extension, and transformers<4.30
APIs. None of that exists in this sandbox, and we only need the reference
modules as a NUMERICAL ORACLE for parity tests, so this installs minimal
stand-ins before the reference modules are imported:

  * `MultiScaleDeformableAttention` -> routes to the reference's own
    `ms_deform_attn_core_pytorch` fallback (their ground-truth math, not ours)
  * `torchvision` -> version tag + `ops.misc.interpolate` = F.interpolate
  * `timm.models.layers.DropPath` -> identity at eval time (p=0 in configs)
  * `transformers.modeling_utils.apply_chunking_to_forward` -> re-export from
    transformers.pytorch_utils (moved there after 4.30)

Usage (tests only):
    from tests.torch_ref_shim import install_reference_shims, import_reference
    install_reference_shims()
    dt = import_reference("uninext.models.deformable_detr.deformable_transformer")
"""
from __future__ import annotations

import importlib
import sys
import types

REFERENCE_ROOT = "/root/reference/projects/UNINEXT"


def install_reference_shims():
    import torch
    import torch.nn as nn
    import torch.nn.functional as F

    if "MultiScaleDeformableAttention" not in sys.modules:
        msda = types.ModuleType("MultiScaleDeformableAttention")

        def ms_deform_attn_forward(value, spatial_shapes, level_start_index,
                                   sampling_locations, attention_weights,
                                   im2col_step):
            fn_mod = importlib.import_module(
                "uninext.models.deformable_detr.ops.functions.ms_deform_attn_func")
            return fn_mod.ms_deform_attn_core_pytorch(
                value, spatial_shapes, sampling_locations, attention_weights)

        msda.ms_deform_attn_forward = ms_deform_attn_forward
        sys.modules["MultiScaleDeformableAttention"] = msda

    if "torchvision" not in sys.modules:
        import importlib.machinery
        tv = types.ModuleType("torchvision")
        tv.__spec__ = importlib.machinery.ModuleSpec("torchvision", None)
        tv.__version__ = "0.15"
        ops = types.ModuleType("torchvision.ops")
        ops.__spec__ = importlib.machinery.ModuleSpec(
            "torchvision.ops", None, is_package=True)
        ops.__path__ = []
        ops.__spec__.submodule_search_locations = ops.__path__
        misc = types.ModuleType("torchvision.ops.misc")
        misc.interpolate = F.interpolate

        def _box_area(boxes):
            return (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])

        boxes_mod = types.ModuleType("torchvision.ops.boxes")
        boxes_mod.box_area = _box_area
        ops.misc = misc
        ops.boxes = boxes_mod
        tvm = types.ModuleType("torchvision.models")
        tvm.__spec__ = importlib.machinery.ModuleSpec(
            "torchvision.models", None, is_package=True)
        tvm.__path__ = []
        tvm.__spec__.submodule_search_locations = tvm.__path__
        tvm_utils = types.ModuleType("torchvision.models._utils")

        class IntermediateLayerGetter(nn.ModuleDict):
            """Standard torchvision helper: run a model, return named layers."""

            def __init__(self, model, return_layers):
                orig = dict(return_layers)
                layers_ = {}
                for name, module in model.named_children():
                    layers_[name] = module
                    if name in orig:
                        del orig[name]
                    if not orig:
                        break
                super().__init__(layers_)
                self.return_layers = dict(return_layers)

            def forward(self, x):
                out = {}
                for name, module in self.items():
                    x = module(x)
                    if name in self.return_layers:
                        out[self.return_layers[name]] = x
                return out

        tvm_utils.IntermediateLayerGetter = IntermediateLayerGetter
        tvm._utils = tvm_utils
        tvm.resnet50 = None  # only referenced via getattr in unused paths
        tv.models = tvm
        tv.__spec__ = importlib.machinery.ModuleSpec(
            "torchvision", None, is_package=True)
        tv.__path__ = []
        tv.__spec__.submodule_search_locations = tv.__path__
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.ops"] = ops
        sys.modules["torchvision.ops.misc"] = misc
        sys.modules["torchvision.ops.boxes"] = boxes_mod
        sys.modules["torchvision.models"] = tvm
        sys.modules["torchvision.models._utils"] = tvm_utils

    if "timm" not in sys.modules:
        import importlib.machinery
        timm = types.ModuleType("timm")
        timm.__spec__ = importlib.machinery.ModuleSpec("timm", None)
        models = types.ModuleType("timm.models")
        models.__spec__ = importlib.machinery.ModuleSpec("timm.models", None)
        layers = types.ModuleType("timm.models.layers")
        layers.__spec__ = importlib.machinery.ModuleSpec("timm.models.layers", None)

        class DropPath(nn.Module):
            """Stochastic depth; identity at eval (reference configs use 0)."""

            def __init__(self, drop_prob=0.0):
                super().__init__()
                self.drop_prob = drop_prob

            def forward(self, x):
                if self.drop_prob == 0.0 or not self.training:
                    return x
                keep = 1 - self.drop_prob
                mask = torch.bernoulli(
                    torch.full((x.shape[0],) + (1,) * (x.ndim - 1), keep,
                               device=x.device, dtype=x.dtype))
                return x / keep * mask

        layers.DropPath = DropPath
        # reference convnext.py:13 / vit.py import this init helper; tests
        # overwrite every weight afterwards, so route to torch's own
        layers.trunc_normal_ = torch.nn.init.trunc_normal_

        class Mlp(nn.Module):
            """timm Mlp (fc1 -> act -> fc2), as used by reference Block."""

            def __init__(self, in_features, hidden_features=None,
                         out_features=None, act_layer=nn.GELU, drop=0.0,
                         **kw):
                super().__init__()
                out_features = out_features or in_features
                hidden_features = hidden_features or in_features
                self.fc1 = nn.Linear(in_features, hidden_features)
                self.act = act_layer()
                self.fc2 = nn.Linear(hidden_features, out_features)
                self.drop = nn.Dropout(drop)

            def forward(self, x):
                return self.drop(self.fc2(self.drop(self.act(self.fc1(x)))))

        layers.Mlp = Mlp
        models.layers = layers
        timm.models = models
        sys.modules["timm"] = timm
        sys.modules["timm.models"] = models
        sys.modules["timm.models.layers"] = layers

    import transformers.modeling_utils as mu
    import transformers.pytorch_utils as ptu
    for name in ("apply_chunking_to_forward", "find_pruneable_heads_and_indices",
                 "prune_linear_layer"):
        if not hasattr(mu, name) and hasattr(ptu, name):
            setattr(mu, name, getattr(ptu, name))

    if REFERENCE_ROOT not in sys.path:
        # APPEND, never insert(0): the reference tree has top-level
        # demo.py/train_net.py that would otherwise shadow our tools/
        # modules for any test that runs after a mirror test in the same
        # process (round-5 finding: test_boxinst, added in round 4, broke
        # 4 test_tools_cli tests in the FULL suite this way — the quick
        # lane never sees it because both sides are marked heavy).
        # Everything the shim needs from the reference ('uninext', its
        # vendored modules) has a unique name, so tail position is safe.
        sys.path.append(REFERENCE_ROOT)

    # The real uninext/__init__.py drags in detectron2 (absent here). Register
    # a bare package object so submodule imports traverse without running it.
    if "uninext" not in sys.modules:
        import importlib.machinery
        pkg = types.ModuleType("uninext")
        pkg.__path__ = [REFERENCE_ROOT + "/uninext"]
        spec = importlib.machinery.ModuleSpec("uninext", None, is_package=True)
        spec.submodule_search_locations = pkg.__path__
        pkg.__spec__ = spec
        sys.modules["uninext"] = pkg


def _load_file(module_name: str, path: str):
    """File-load a real reference module under a canonical module name."""
    import importlib.util
    spec = importlib.util.spec_from_file_location(module_name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[module_name] = mod
    spec.loader.exec_module(mod)
    return mod


def install_detectron2_shim():
    """Minimal fvcore/detectron2 stand-ins so the reference's DDETRSegmUniDN
    and detectron2 ResNet (the numerical oracles) import on CPU.

    Pure-torch reference files (structures, layers, resnet) are file-loaded
    from /root/reference verbatim; only the glue they import (fvcore inits,
    comm, registries) is stubbed."""
    import torch
    import torch.nn as nn
    import torch.nn.functional as F
    import importlib.machinery

    install_reference_shims()
    if "detectron2" in sys.modules:
        return

    def new_mod(name, is_pkg=False):
        m = types.ModuleType(name)
        spec = importlib.machinery.ModuleSpec(name, None, is_package=is_pkg)
        if is_pkg:
            m.__path__ = []
            spec.submodule_search_locations = m.__path__
        m.__spec__ = spec
        sys.modules[name] = m
        return m

    # ---- fvcore ---------------------------------------------------------
    fvcore = new_mod("fvcore", True)
    fv_nn = new_mod("fvcore.nn", True)
    fv_wi = new_mod("fvcore.nn.weight_init")
    fv_dist = new_mod("fvcore.nn.distributed")
    fv_common = new_mod("fvcore.common", True)

    def c2_xavier_fill(module):
        nn.init.kaiming_uniform_(module.weight, a=1)
        if module.bias is not None:
            nn.init.constant_(module.bias, 0)

    def c2_msra_fill(module):
        nn.init.kaiming_normal_(module.weight, mode="fan_out",
                                nonlinearity="relu")
        if module.bias is not None:
            nn.init.constant_(module.bias, 0)

    fv_wi.c2_xavier_fill = c2_xavier_fill
    fv_wi.c2_msra_fill = c2_msra_fill
    fv_dist.differentiable_all_reduce = lambda x: x

    def smooth_l1_loss(input, target, beta, reduction="none"):
        if beta < 1e-5:
            loss = torch.abs(input - target)
        else:
            n = torch.abs(input - target)
            loss = torch.where(n < beta, 0.5 * n ** 2 / beta, n - 0.5 * beta)
        if reduction == "mean":
            return loss.mean()
        if reduction == "sum":
            return loss.sum()
        return loss

    def giou_loss(boxes1, boxes2, reduction="none", eps=1e-7):
        x1, y1, x2, y2 = boxes1.unbind(-1)
        x1g, y1g, x2g, y2g = boxes2.unbind(-1)
        xkis1 = torch.max(x1, x1g)
        ykis1 = torch.max(y1, y1g)
        xkis2 = torch.min(x2, x2g)
        ykis2 = torch.min(y2, y2g)
        intsct = ((xkis2 - xkis1).clamp(0)) * ((ykis2 - ykis1).clamp(0))
        union = ((x2 - x1) * (y2 - y1) + (x2g - x1g) * (y2g - y1g)
                 - intsct + eps)
        iou = intsct / union
        xc1 = torch.min(x1, x1g)
        yc1 = torch.min(y1, y1g)
        xc2 = torch.max(x2, x2g)
        yc2 = torch.max(y2, y2g)
        area_c = (xc2 - xc1) * (yc2 - yc1) + eps
        loss = 1 - iou + (area_c - union) / area_c
        if reduction == "mean":
            return loss.mean()
        if reduction == "sum":
            return loss.sum()
        return loss

    fv_nn.smooth_l1_loss = smooth_l1_loss
    fv_nn.giou_loss = giou_loss
    fv_nn.weight_init = fv_wi
    fv_nn.distributed = fv_dist
    fvcore.nn = fv_nn
    fvcore.common = fv_common

    class Registry:
        def __init__(self, name):
            self._name = name
            self._map = {}

        def register(self, obj=None):
            if obj is None:
                def deco(cls):
                    self._map[cls.__name__] = cls
                    return cls
                return deco
            self._map[obj.__name__] = obj
            return obj

        def get(self, name):
            return self._map[name]

    fv_registry = new_mod("fvcore.common.registry")
    fv_registry.Registry = Registry
    fv_common.registry = fv_registry

    # ---- torchvision.ops additions used by reference matchers/NMS --------
    tvops = sys.modules["torchvision.ops"]

    def box_iou(boxes1, boxes2):
        area1 = (boxes1[:, 2] - boxes1[:, 0]) * (boxes1[:, 3] - boxes1[:, 1])
        area2 = (boxes2[:, 2] - boxes2[:, 0]) * (boxes2[:, 3] - boxes2[:, 1])
        lt = torch.max(boxes1[:, None, :2], boxes2[None, :, :2])
        rb = torch.min(boxes1[:, None, 2:], boxes2[None, :, 2:])
        wh = (rb - lt).clamp(min=0)
        inter = wh[..., 0] * wh[..., 1]
        return inter / (area1[:, None] + area2[None, :] - inter)

    def nms(boxes, scores, iou_threshold):
        order = scores.argsort(descending=True)
        keep = []
        suppressed = torch.zeros(len(boxes), dtype=torch.bool)
        ious = box_iou(boxes, boxes)
        for i in order.tolist():
            if suppressed[i]:
                continue
            keep.append(i)
            suppressed |= ious[i] > iou_threshold
            suppressed[i] = True
        return torch.as_tensor(keep, dtype=torch.long)

    def batched_nms(boxes, scores, idxs, iou_threshold):
        if boxes.numel() == 0:
            return torch.empty((0,), dtype=torch.long)
        offsets = idxs.to(boxes) * (boxes.max() + 1)
        return nms(boxes + offsets[:, None], scores, iou_threshold)

    tvops.box_iou = box_iou
    tvops.nms = nms
    tvops.batched_nms = batched_nms

    # ---- detectron2 -------------------------------------------------------
    d2 = new_mod("detectron2", True)
    utils = new_mod("detectron2.utils", True)
    comm = new_mod("detectron2.utils.comm")
    env = new_mod("detectron2.utils.env")
    comm.get_world_size = lambda: 1
    comm.get_rank = lambda: 0
    env.TORCH_VERSION = tuple(int(x) for x in
                              torch.__version__.split("+")[0].split(".")[:2])
    utils.comm = comm
    utils.env = env
    d2.utils = utils

    REF = "/root/reference/detectron2"
    shape_spec = _load_file("detectron2.layers.shape_spec",
                            f"{REF}/layers/shape_spec.py")
    wrappers = _load_file("detectron2.layers.wrappers",
                          f"{REF}/layers/wrappers.py")
    batch_norm = _load_file("detectron2.layers.batch_norm",
                            f"{REF}/layers/batch_norm.py")
    blocks = _load_file("detectron2.layers.blocks", f"{REF}/layers/blocks.py")

    layers = new_mod("detectron2.layers", True)

    class _UnusedOp(nn.Module):
        def __init__(self, *a, **k):
            super().__init__()
            raise NotImplementedError("deformable conv not used on this path")

    for mod in (shape_spec, wrappers, batch_norm, blocks):
        for k, v in vars(mod).items():
            if not k.startswith("_"):
                setattr(layers, k, v)
    layers.DeformConv = _UnusedOp
    layers.ModulatedDeformConv = _UnusedOp
    layers.shape_spec = shape_spec
    layers.wrappers = wrappers
    layers.batch_norm = batch_norm
    d2.layers = layers

    structures = new_mod("detectron2.structures", True)
    boxes_mod = _load_file("detectron2.structures.boxes",
                           f"{REF}/structures/boxes.py")
    inst_mod = _load_file("detectron2.structures.instances",
                          f"{REF}/structures/instances.py")
    structures.Boxes = boxes_mod.Boxes
    structures.BoxMode = boxes_mod.BoxMode
    structures.pairwise_iou = boxes_mod.pairwise_iou
    structures.Instances = inst_mod.Instances
    d2.structures = structures

    data = new_mod("detectron2.data", True)
    datasets = new_mod("detectron2.data.datasets", True)
    builtin_meta = _load_file("detectron2.data.datasets.builtin_meta",
                              f"{REF}/data/datasets/builtin_meta.py")
    datasets.builtin_meta = builtin_meta
    data.datasets = datasets
    d2.data = data

    modeling = new_mod("detectron2.modeling", True)
    mb_pkg = new_mod("detectron2.modeling.backbone", True)
    build_mod = new_mod("detectron2.modeling.backbone.build")
    build_mod.BACKBONE_REGISTRY = Registry("BACKBONE")
    backbone_mod = _load_file("detectron2.modeling.backbone.backbone",
                              f"{REF}/modeling/backbone/backbone.py")
    mb_pkg.backbone = backbone_mod
    mb_pkg.build = build_mod
    mb_pkg.Backbone = backbone_mod.Backbone
    resnet_mod = _load_file("detectron2.modeling.backbone.resnet",
                            f"{REF}/modeling/backbone/resnet.py")
    mb_pkg.resnet = resnet_mod
    fpn_mod = new_mod("detectron2.modeling.backbone.fpn")

    def _assert_strides_are_log2_contiguous(strides):
        for i, stride in enumerate(strides[1:], 1):
            assert stride == 2 * strides[i - 1], \
                "Strides {} {} are not log2 contiguous".format(
                    stride, strides[i - 1])

    fpn_mod._assert_strides_are_log2_contiguous = \
        _assert_strides_are_log2_contiguous
    mb_pkg.fpn = fpn_mod
    modeling.backbone = mb_pkg
    modeling.BACKBONE_REGISTRY = build_mod.BACKBONE_REGISTRY
    modeling.Backbone = backbone_mod.Backbone
    modeling.ShapeSpec = shape_spec.ShapeSpec
    d2.modeling = modeling
    return d2


def import_reference(module: str):
    install_reference_shims()
    return importlib.import_module(module)
