"""GRoIE Faster R-CNN: all-level summed RoI extraction.

Behavioural mirror of configs/groie/faste-rcnn_r50_fpn_groie_1x_coco.py:
Faster R-CNN whose bbox RoI extractor is GenericRoIExtractor (RoIAlign
on every FPN level, shared 5x5 pre-conv, sum aggregation, '0100'
GeneralizedAttention post-module).
"""
from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from ..heads.generic_roi_extractor import GenericRoIExtractor
from ..layers import cast_compute_params
from .faster_rcnn import FasterRCNNDetector, FasterRCNNNet


class GRoIEFasterRCNNNet(FasterRCNNNet):
    def setup(self):
        super().setup()
        self.roi_extractor = GenericRoIExtractor()

    def extract_rois(self, feats, rois):
        return self.roi_extractor(feats, rois)

    def __call__(self, images):
        feats = self.extract_feat(images)
        rpn_out = self.rpn_head(feats)
        rois = jnp.asarray([[0.0, 0.0, 16.0, 16.0]])
        roi_feats = self.roi_extractor([f[0] for f in feats[:4]], rois)
        head_out = self.bbox_head(roi_feats)
        return rpn_out, head_out


@dataclass
class GRoIEFasterRCNNDetector(FasterRCNNDetector):
    def __post_init__(self):
        super().__post_init__()
        self.net = GRoIEFasterRCNNNet(num_classes=self.num_classes,
                                      depth=self.depth,
                                      compute_dtype=self.compute_dtype)
        self.loss_jit = jax.jit(self.loss)
        self.predict_jit = jax.jit(self.predict, static_argnames='rescale')
        self.forward_jit = jax.jit(self.forward_raw)

    def _roi_feats(self, variables, feats, rois):
        v = cast_compute_params(variables, self.compute_dtype)
        return jax.vmap(
            lambda f0, f1, f2, f3, r: self.net.apply(
                v, [f0, f1, f2, f3], r, method='extract_rois')
        )(feats[0].astype(jnp.float32), feats[1].astype(jnp.float32),
          feats[2].astype(jnp.float32), feats[3].astype(jnp.float32),
          rois)
