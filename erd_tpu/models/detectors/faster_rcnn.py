"""Faster R-CNN: two-stage detector assembly.

Behavioural mirror of /root/reference/mmdet/models/detectors/faster_rcnn.py
+ two_stage.py + roi_heads/standard_roi_head.py with the
faster-rcnn_r50_fpn_1x config: R50 + FPN(P2-P6, maxpool extra) + RPN +
RoIAlign(7, aligned) + Shared2FC bbox head. All stages fixed-shape: 1000
padded proposals, 512 sampled RoIs, masked losses. RoI sampling randomness
derives from a PRNG key folded with the batch's image ids (deterministic,
batch-varying — the functional replacement for torch's global RNG).
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..layers import cast_compute_params
from ...ops.roi_align import multilevel_roi_align
from ...structures import DetResults
from ...task.coder import DeltaXYWHBBoxCoder
from ..backbones.resnet import ResNet
from ..heads.bbox_head import (RCNNTrainConfig, Shared2FCBBoxHead,
                               rcnn_loss, rcnn_predict_single,
                               rcnn_sample_single)
from ..heads.gfl_head import AnchorContext, GFLTestConfig
from ..heads.rpn_head import (ProposalConfig, RPNHeadNet, RPNTrainConfig,
                              rpn_anchor_generator, rpn_loss, rpn_proposals)
from ..necks.fpn import FPN
from ..preprocessor import Preprocessor


class FasterRCNNNet(nn.Module):
    num_classes: int
    depth: int = 50
    compute_dtype: Any = jnp.float32
    # static backbone spec tuple + its per-level channels (probed by the
    # detector via backbone_out_channels) — swaps ResNet for any
    # SWAPPABLE_BACKBONES entry
    backbone_spec: Any = None
    backbone_channels: Tuple[int, ...] = ()
    # static neck spec tuple — swaps the default FPN for any
    # SWAPPABLE_NECKS chain (configs/pafpn, configs/fpg, configs/carafe)
    neck_spec: Any = None
    # SeesawLoss custom classifier: C + 2 cls channels + NormedLinear
    # predictor (configs/seesaw_loss cls_predictor_cfg); 0 = defaults
    cls_channels: int = 0
    normed_temp: float = 0.0
    # configs/gn + gn+ws: GN(32) through neck and heads, optional
    # weight-standardized convs, Shared4Conv1FC bbox head
    head_norm: str = ''  # '' | 'gn'
    conv_ws: bool = False
    bbox_head_convs: int = 0  # 4 -> Shared4Conv1FCBBoxHead

    def setup(self):
        if self.backbone_spec is not None:
            from ..backbones import build_swappable_backbone
            self.backbone = build_swappable_backbone(
                dict(self.backbone_spec), self.compute_dtype)
            in_ch = tuple(self.backbone_channels)
            assert in_ch, 'backbone_channels required with backbone_spec'
        else:
            self.backbone = ResNet(depth=self.depth,
                                   compute_dtype=self.compute_dtype)
            in_ch = {18: (64, 128, 256, 512),
                     34: (64, 128, 256, 512)}.get(
                self.depth, (256, 512, 1024, 2048))
        if self.neck_spec is not None:
            from ..necks import NeckChain
            self.neck = NeckChain(spec=self.neck_spec)
        else:
            self.neck = FPN(in_channels=in_ch, out_channels=256,
                            start_level=0, add_extra_convs='', num_outs=5,
                            norm=self.head_norm, conv_ws=self.conv_ws)
        self.rpn_head = RPNHeadNet()
        self.bbox_head = Shared2FCBBoxHead(
            num_classes=self.num_classes,
            cls_channels=self.cls_channels,
            normed_temp=self.normed_temp,
            num_shared_convs=self.bbox_head_convs,
            conv_norm=self.head_norm if self.bbox_head_convs else '',
            conv_ws=self.conv_ws if self.bbox_head_convs else False)

    def extract_feat(self, images):
        return self.neck(self.backbone(images))

    def rpn(self, feats):
        return self.rpn_head(feats)

    def roi_forward(self, roi_feats):
        return self.bbox_head(roi_feats)

    def __call__(self, images):
        """Init path: touch every submodule."""
        feats = self.extract_feat(images)
        rpn_out = self.rpn_head(feats)
        dummy_rois = jnp.zeros((4, 7, 7, feats[0].shape[-1]),
                               feats[0].dtype)
        head_out = self.bbox_head(dummy_rois)
        return rpn_out, head_out


@dataclass
class FasterRCNNDetector:
    num_classes: int = 80
    depth: int = 50
    compute_dtype: Any = jnp.float32
    backbone: Any = None  # dict spec, e.g. {'type': 'SwinTransformer'}
    neck: Any = None  # dict or [dict] spec, e.g. {'type': 'PAFPN', ...}
    # bbox-head classification loss: 'ce' (default) or 'seesaw'
    # (configs/seesaw_loss — MaskRCNN only; needs the cumulative
    # per-class counter threaded through loss_and_state)
    loss_cls: str = 'ce'
    seesaw_p: float = 0.8
    seesaw_q: float = 2.0
    # configs/gn + gn+ws recipes (GN necks/heads, ConvWS, 4conv1fc head)
    head_norm: str = ''
    conv_ws: bool = False
    bbox_head_convs: int = 0
    preprocessor: Preprocessor = field(default_factory=Preprocessor)
    rpn_train_cfg: RPNTrainConfig = field(default_factory=RPNTrainConfig)
    rcnn_train_cfg: RCNNTrainConfig = field(default_factory=RCNNTrainConfig)
    proposal_cfg_train: ProposalConfig = field(
        default_factory=lambda: ProposalConfig(nms_pre=2000,
                                               max_per_img=1000))
    proposal_cfg_test: ProposalConfig = field(
        default_factory=lambda: ProposalConfig(nms_pre=1000,
                                               max_per_img=1000))
    test_cfg: GFLTestConfig = field(
        default_factory=lambda: GFLTestConfig(iou_threshold=0.5))

    def _backbone_net_kwargs(self):
        kw = {}
        if self.head_norm or self.conv_ws or self.bbox_head_convs:
            kw.update(head_norm=self.head_norm, conv_ws=self.conv_ws,
                      bbox_head_convs=self.bbox_head_convs)
        if self.loss_cls == 'seesaw':
            kw.update(cls_channels=self.num_classes + 2,
                      normed_temp=20.0)
        if self.backbone:
            from ..backbones import (backbone_out_channels,
                                     backbone_spec_to_static)
            kw.update(
                backbone_spec=backbone_spec_to_static(self.backbone),
                backbone_channels=backbone_out_channels(self.backbone,
                                                        self.compute_dtype))
        if self.neck:
            from ..necks import neck_spec_to_static
            kw['neck_spec'] = neck_spec_to_static(self.neck)
        return kw

    def __post_init__(self):
        self.net = FasterRCNNNet(num_classes=self.num_classes,
                                 depth=self.depth,
                                 compute_dtype=self.compute_dtype,
                                 **self._backbone_net_kwargs())
        self.anchor_generator = rpn_anchor_generator()
        self.rpn_coder = DeltaXYWHBBoxCoder()
        self.rcnn_coder = DeltaXYWHBBoxCoder(
            target_stds=(0.1, 0.1, 0.2, 0.2))
        self._ctx_cache: Dict[Tuple[int, int], AnchorContext] = {}
        self.loss_jit = jax.jit(self.loss)
        self.predict_jit = jax.jit(self.predict, static_argnames='rescale')
        self.forward_jit = jax.jit(self.forward_raw)

    def anchor_context(self, image_shape) -> AnchorContext:
        key = tuple(int(v) for v in image_shape)
        if key not in self._ctx_cache:
            self._ctx_cache[key] = AnchorContext.build(
                key, self.anchor_generator)
        return self._ctx_cache[key]

    def init(self, rng, image_shape=(128, 128), batch_size=1):
        dummy = jnp.zeros((batch_size,) + tuple(image_shape) + (3,),
                          jnp.uint8)
        return jax.jit(self.net.init)(rng, self.preprocessor(dummy))

    def forward_raw(self, variables, images):
        """mode='tensor': (rpn outputs, dummy-roi head outputs)."""
        return self.net.apply(
            cast_compute_params(variables, self.compute_dtype), self.preprocessor(images))

    # ------------------------------------------------------------------
    def _feats_and_rpn(self, variables, images):
        feats = self.net.apply(
            cast_compute_params(variables, self.compute_dtype), self.preprocessor(images),
                               method='extract_feat')
        rpn_cls, rpn_reg = self.net.apply(
            cast_compute_params(variables, self.compute_dtype), feats,
                                          method='rpn')
        return feats, rpn_cls, rpn_reg

    def _roi_feats(self, variables, feats, rois):
        """RoI feature extraction hook (overridden by GRoIE)."""
        return jax.vmap(
            lambda f0, f1, f2, f3, r: multilevel_roi_align(
                [f0, f1, f2, f3], r)
        )(feats[0].astype(jnp.float32), feats[1].astype(jnp.float32),
          feats[2].astype(jnp.float32), feats[3].astype(jnp.float32),
          rois)

    def loss(self, variables, batch):
        images = batch['images']
        ctx = self.anchor_context(images.shape[1:3])
        feats, rpn_cls, rpn_reg = self._feats_and_rpn(variables, images)
        b = images.shape[0]
        cls_flat = jnp.concatenate(
            [m.reshape(b, -1) for m in rpn_cls], axis=1).astype(jnp.float32)
        reg_flat = jnp.concatenate(
            [m.reshape(b, -1, 4) for m in rpn_reg], axis=1)

        rng = jax.random.fold_in(jax.random.PRNGKey(0),
                                 batch['meta'].img_id.sum())
        losses = rpn_loss(ctx, cls_flat, reg_flat, batch['gt'],
                          batch['meta'].img_shape, rng, self.rpn_coder,
                          self.rpn_train_cfg)

        prop_boxes, prop_scores, prop_mask = rpn_proposals(
            ctx, [jax.lax.stop_gradient(c.astype(jnp.float32))
                  for c in rpn_cls],
            [jax.lax.stop_gradient(r) for r in rpn_reg],
            batch['meta'].img_shape, self.rpn_coder,
            self.proposal_cfg_train)

        rngs = jax.random.split(jax.random.fold_in(rng, 1), b)
        mining = None
        if self.rcnn_train_cfg.sampler == 'ohem':
            # OHEM hard mining (ohem_sampler.py hard_mining): score every
            # candidate with its CURRENT cls loss from a no-grad forward,
            # then sample the hardest. One extra RoI-head forward over the
            # full candidate set; gradients flow only through the sampled
            # subset below, like the reference.
            from ..heads.bbox_head import rcnn_assign_single
            cand_boxes, cand_mask, _, _, _, cand_labels = jax.vmap(
                lambda p, pm, gb, gl, gm: rcnn_assign_single(
                    p, pm, gb, gl, gm, self.num_classes,
                    self.rcnn_train_cfg)
            )(prop_boxes, prop_mask, batch['gt'].bboxes,
              batch['gt'].labels, batch['gt'].mask)
            pn = cand_boxes.shape[1]
            cand_feats = self._roi_feats(
                variables, feats, jax.lax.stop_gradient(cand_boxes))
            mine_cls, _ = self.net.apply(
                cast_compute_params(variables, self.compute_dtype),
                jax.lax.stop_gradient(cand_feats).reshape(b * pn, 7, 7, -1),
                method='roi_forward')
            from ...losses import cross_entropy_int
            mining = cross_entropy_int(
                jax.lax.stop_gradient(mine_cls).astype(jnp.float32),
                cand_labels.reshape(-1)).reshape(b, pn)
        samples = jax.vmap(
            lambda k, p, pm, gb, gl, gm, ml: rcnn_sample_single(
                k, p, pm, gb, gl, gm, self.num_classes, self.rcnn_coder,
                self.rcnn_train_cfg, mining_losses=ml)
        )(rngs, prop_boxes, prop_mask, batch['gt'].bboxes,
          batch['gt'].labels, batch['gt'].mask, mining) \
            if mining is not None else jax.vmap(
            lambda k, p, pm, gb, gl, gm: rcnn_sample_single(
                k, p, pm, gb, gl, gm, self.num_classes, self.rcnn_coder,
                self.rcnn_train_cfg)
        )(rngs, prop_boxes, prop_mask, batch['gt'].bboxes,
          batch['gt'].labels, batch['gt'].mask)

        roi_feats = self._roi_feats(variables, feats, samples.rois)
        s = samples.rois.shape[1]
        cls_logits, reg_preds = self.net.apply(
            cast_compute_params(variables, self.compute_dtype), roi_feats.reshape(b * s, 7, 7, -1),
            method='roi_forward')
        assert self.loss_cls == 'ce', \
            'seesaw loss ships on MaskRCNN (the reference seesaw_loss ' \
            'configs are mask-rcnn/cascade-mask-rcnn variants)'
        rcnn_losses, acc = rcnn_loss(cls_logits.astype(jnp.float32),
                                     reg_preds.astype(jnp.float32), samples,
                                     self.num_classes, self.rcnn_train_cfg)
        losses['loss_cls'] = rcnn_losses['loss_cls']
        losses['loss_bbox'] = rcnn_losses['loss_bbox']
        return losses

    def predict(self, variables, batch, rescale=True):
        images = batch['images']
        ctx = self.anchor_context(images.shape[1:3])
        feats, rpn_cls, rpn_reg = self._feats_and_rpn(variables, images)
        prop_boxes, prop_scores, prop_mask = rpn_proposals(
            ctx, [c.astype(jnp.float32) for c in rpn_cls],
            [r.astype(jnp.float32) for r in rpn_reg],
            batch['meta'].img_shape, self.rpn_coder,
            self.proposal_cfg_test)
        b, p = prop_boxes.shape[:2]
        roi_feats = self._roi_feats(variables, feats, prop_boxes)
        cls_logits, reg_preds = self.net.apply(
            cast_compute_params(variables, self.compute_dtype), roi_feats.reshape(b * p, 7, 7, -1),
            method='roi_forward')
        cls_logits = cls_logits.astype(jnp.float32).reshape(b, p, -1)
        reg_preds = reg_preds.astype(jnp.float32).reshape(b, p, -1)

        def single(cl, rg, rois, rmask, img_shape, scale_factor):
            ob, os_, ol, om = rcnn_predict_single(
                cl, rg, rois, rmask, img_shape, scale_factor,
                self.num_classes, self.rcnn_coder, self.test_cfg,
                rescale=rescale, seesaw=self.loss_cls == 'seesaw')
            return DetResults(bboxes=ob, scores=os_, labels=ol, mask=om)

        return jax.vmap(single)(cls_logits, reg_preds, prop_boxes,
                                prop_mask, batch['meta'].img_shape,
                                batch['meta'].scale_factor)
