#!/usr/bin/env python
"""VOT challenge toolkit adapter.

Parity: reference uninext_vots.py + vot_tool.py — wraps the SOT/VOS driver
as a VOT tracker: the toolkit feeds frames one at a time; we answer with a
mask (VOT2020+ protocol) or box. Gated on the `vot` package (not in this
image); the same class works with any harness that calls
initialize(frame, region) / track(frame).
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


class UninextVOTTracker:
    def __init__(self, config_name: str = "video_joint_r50",
                 checkpoint: str | None = None):
        import jax
        from uninext_tpu import config as config_mod
        from uninext_tpu.config import UninextConfig
        from uninext_tpu.models.detr import UninextDETR
        self.cfg = getattr(config_mod, config_name)()
        self.model = UninextDETR(self.cfg)
        self.params = None
        self.checkpoint = checkpoint
        self.driver = None

    def _prep(self, image: np.ndarray):
        from uninext_tpu.data.coco import resize_shortest_edge, round_up
        import jax.numpy as jnp
        h0, w0 = image.shape[:2]
        h, w = resize_shortest_edge(h0, w0, self.cfg.data.min_size_test,
                                    self.cfg.data.max_size_test)
        from PIL import Image
        arr = np.asarray(Image.fromarray(image).resize((w, h)), np.float32)
        arr = (arr - np.array(self.cfg.data.pixel_mean)) / np.array(
            self.cfg.data.pixel_std)
        Hb, Wb = round_up(h, 32), round_up(w, 32)
        padded = np.zeros((1, Hb, Wb, 3), np.float32)
        padded[0, :h, :w] = arr
        mask = np.ones((1, Hb, Wb), bool)
        mask[0, :h, :w] = False
        self.scale = (w / w0, h / h0)
        return (jnp.asarray(padded), jnp.asarray(mask),
                jnp.asarray(np.array([[h, w]], np.int32)))

    def initialize(self, image: np.ndarray, region_xywh):
        import jax
        from uninext_tpu.engine.sot_inference import (make_sot_frame_step,
                                                      make_template_encoder)
        frame, mask, sizes = self._prep(image)
        if self.params is None:
            # init_all_paths: the detection-only init misses the SOT
            # template branch (adjust_layer / 4ch template backbone)
            from uninext_tpu.models.detr import init_all_paths
            self.params = init_all_paths(
                self.model, jax.random.PRNGKey(0))["params"]
            if self.checkpoint:
                import orbax.checkpoint as ocp
                self.params = ocp.StandardCheckpointer().restore(
                    self.checkpoint, target=self.params)
        self.encode = make_template_encoder(self.model, self.cfg)
        self.step = make_sot_frame_step(self.model, self.cfg,
                                        frame.shape[1], frame.shape[2],
                                        with_mask=True)
        x, y, w, h = region_xywh
        sx, sy = self.scale
        box = np.array([x * sx, y * sy, (x + w) * sx, (y + h) * sy],
                       np.float32)
        self.lang = self.encode(self.params, frame, box[None])
        self._static = (mask, sizes)

    def track(self, image: np.ndarray):
        frame, mask, sizes = self._prep(image)
        r = self.step(self.params, frame, mask, sizes,
                      self.lang["hidden"], self.lang["masks"])
        h, w = int(sizes[0, 0]), int(sizes[0, 1])
        box = np.asarray(r["box_cxcywh"][0]) * [w, h, w, h]
        sx, sy = self.scale
        x0 = (box[0] - box[2] / 2) / sx
        y0 = (box[1] - box[3] / 2) / sy
        return [float(x0), float(y0), float(box[2] / sx),
                float(box[3] / sy)], float(r["score"][0])


def main():
    try:
        import vot
    except ImportError:
        raise SystemExit("the `vot` toolkit package is not installed in this "
                         "environment; UninextVOTTracker is importable for "
                         "use with any initialize/track harness")
    handle = vot.VOT("rectangle")
    region = handle.region()
    tracker = UninextVOTTracker()
    imagefile = handle.frame()
    import PIL.Image
    tracker.initialize(np.asarray(PIL.Image.open(imagefile)),
                       [region.x, region.y, region.width, region.height])
    while True:
        imagefile = handle.frame()
        if not imagefile:
            break
        box, conf = tracker.track(np.asarray(PIL.Image.open(imagefile)))
        handle.report(vot.Rectangle(*box), conf)


if __name__ == "__main__":
    main()
