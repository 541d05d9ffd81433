"""CenterNet (Objects as Points): heatmap keypoint detection.

Behavioural mirror of /root/reference/mmdet/models/detectors/centernet.py +
dense_heads/centernet_head.py + necks/ct_resnet_neck.py
(configs/centernet/centernet_r18-dcnv2_8xb16-crop512-140e_coco.py):
ResNet-18 -> CTResNetNeck (3x [DCNv2 conv + 4x4 transposed conv + BN],
stride 32 -> 4) -> three 3x3+1x1 branches (class heatmap / wh / center
offset). Targets render radius-masked gaussians per gt (dense fori_loop
instead of the reference's python scatter, ops/gaussian.py); losses are
GaussianFocal on the heatmap (avg = #peak pixels) and L1 on wh (x0.1) and
offset at center pixels (avg = 2 * #centers). Decode keeps 3x3 local
maxima, takes the global top-k over (H, W, C), and skips NMS
(test_cfg with_nms=False in the canonical config).
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...losses import gaussian_focal_loss
from ...ops.deform_conv import ModulatedDeformConv
from ...ops.gaussian import local_maximum, render_center_targets
from ...structures import DetResults
from ...structures.boxes import scale_boxes
from ..backbones.resnet import ResNet
from ..layers import bias_init_prob, cast_compute_params, torch_pad
from ..preprocessor import Preprocessor


class CTResNetNeck(nn.Module):
    """DCNv2 + transposed-conv upsampling chain (ct_resnet_neck.py:15-76)."""
    filters: Tuple[int, ...] = (256, 128, 64)
    use_dcn: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        for i, ch in enumerate(self.filters):
            if self.use_dcn:
                x = ModulatedDeformConv(ch, 3, name=f'dcn{i}')(x)
            else:
                x = nn.Conv(ch, (3, 3), padding=[torch_pad(3)] * 2,
                            dtype=x.dtype, name=f'conv{i}')(x)
            x = nn.BatchNorm(use_running_average=not train,
                             name=f'dcn_bn{i}')(x)
            x = nn.relu(x)
            x = nn.ConvTranspose(ch, (4, 4), strides=(2, 2),
                                 padding='SAME', use_bias=False,
                                 dtype=x.dtype, name=f'up{i}')(x)
            x = nn.BatchNorm(use_running_average=not train,
                             name=f'up_bn{i}')(x)
            x = nn.relu(x)
        return x


class CenterNetHeadNet(nn.Module):
    num_classes: int
    feat_channels: int = 64

    @nn.compact
    def __call__(self, x):
        def branch(out_ch, name, bias_init=nn.initializers.zeros,
                   std=0.001):
            y = nn.Conv(self.feat_channels, (3, 3),
                        padding=[torch_pad(3)] * 2,
                        kernel_init=nn.initializers.normal(std),
                        dtype=x.dtype, name=f'{name}_conv')(x)
            y = nn.relu(y)
            return nn.Conv(out_ch, (1, 1),
                           kernel_init=nn.initializers.normal(std),
                           bias_init=bias_init, dtype=x.dtype,
                           name=f'{name}_out')(y)

        heatmap = jax.nn.sigmoid(
            branch(self.num_classes, 'heatmap',
                   bias_init=bias_init_prob(0.1),
                   std=0.01).astype(jnp.float32))
        wh = branch(2, 'wh').astype(jnp.float32)
        offset = branch(2, 'offset').astype(jnp.float32)
        return heatmap, wh, offset


class CenterNetNet(nn.Module):
    num_classes: int
    depth: int = 18
    compute_dtype: Any = jnp.float32
    use_dcn: bool = True

    @nn.compact
    def __call__(self, images, train: bool = False):
        feats = ResNet(depth=self.depth, compute_dtype=self.compute_dtype,
                       name='backbone')(images)
        x = CTResNetNeck(use_dcn=self.use_dcn, name='neck')(feats[-1],
                                                            train)
        return CenterNetHeadNet(num_classes=self.num_classes,
                                name='bbox_head')(x)


@dataclass
class CenterNetDetector:
    num_classes: int = 80
    depth: int = 18
    compute_dtype: Any = jnp.float32
    use_dcn: bool = True
    max_per_img: int = 100
    preprocessor: Preprocessor = field(default_factory=Preprocessor)

    def __post_init__(self):
        self.net = CenterNetNet(num_classes=self.num_classes,
                                depth=self.depth,
                                compute_dtype=self.compute_dtype,
                                use_dcn=self.use_dcn)
        self.loss_jit = jax.jit(self.loss)
        self.loss_and_state_jit = jax.jit(self.loss_and_state)
        self.predict_jit = jax.jit(self.predict, static_argnames='rescale')
        self.forward_jit = jax.jit(self.forward_raw)
        self.test_cfg = type('cfg', (), {'iou_threshold': 0.5,
                                         'max_per_img':
                                         self.max_per_img})()

    def init(self, rng, image_shape=(128, 128), batch_size=1):
        dummy = jnp.zeros((batch_size,) + tuple(image_shape) + (3,),
                          jnp.uint8)
        return jax.jit(self.net.init)(rng, self.preprocessor(dummy))

    def forward_raw(self, variables, images, train=False):
        return self.net.apply(
            cast_compute_params(variables, self.compute_dtype),
            self.preprocessor(images), train=train,
            mutable=['batch_stats'] if train else False)

    def loss_and_state(self, variables, batch, teacher_variables=None):
        images = batch['images']
        (heat, wh, off), new_state = self.forward_raw(variables, images,
                                                      train=True)
        b, fh, fw, _ = heat.shape
        ih, iw = images.shape[1], images.shape[2]
        ratio = jnp.asarray([fw / iw, fh / ih], jnp.float32)
        gt = batch['gt']

        t_heat, t_wh, t_off, t_w, avg = jax.vmap(
            lambda gb, gl, gm: render_center_targets(
                gb, gl, gm, (fh, fw), self.num_classes, ratio))(
            gt.bboxes, gt.labels, gt.mask)

        avg_factor = jnp.maximum(avg.sum(), 1.0)
        l_heat = gaussian_focal_loss(heat, t_heat,
                                     reduction='sum') / avg_factor
        wh_avg = jnp.maximum(t_w.sum() * 2.0, 1.0)
        l_wh = 0.1 * (jnp.abs(wh - t_wh) * t_w).sum() / wh_avg
        l_off = (jnp.abs(off - t_off) * t_w).sum() / wh_avg
        losses = dict(loss_center_heatmap=l_heat, loss_wh=l_wh,
                      loss_offset=l_off)
        consts = {k: v for k, v in variables.items() if k != 'params'}
        consts['batch_stats'] = new_state['batch_stats']
        return losses, consts

    def loss(self, variables, batch):
        return self.loss_and_state(variables, batch)[0]

    def predict(self, variables, batch, rescale=True):
        images = batch['images']
        heat, wh, off = self.forward_raw(variables, images)
        b, fh, fw, c = heat.shape
        ih, iw = images.shape[1], images.shape[2]
        sx, sy = iw / fw, ih / fh
        k = self.max_per_img

        def single(h_i, wh_i, off_i, scale_factor):
            h_i = local_maximum(h_i)
            flat = h_i.reshape(-1)  # (H*W*C)
            scores, idx = jax.lax.top_k(flat, k)
            cls = idx % c
            pix = idx // c
            py = (pix // fw).astype(jnp.float32)
            px = (pix % fw).astype(jnp.float32)
            o = off_i.reshape(-1, 2)[pix]
            d = wh_i.reshape(-1, 2)[pix]
            cx = (px + o[:, 0]) * sx
            cy = (py + o[:, 1]) * sy
            bw = d[:, 0] * sx
            bh = d[:, 1] * sy
            boxes = jnp.stack([cx - bw / 2, cy - bh / 2,
                               cx + bw / 2, cy + bh / 2], axis=-1)
            if rescale:
                boxes = scale_boxes(boxes, 1.0 / scale_factor)
            return DetResults(bboxes=boxes, scores=scores,
                              labels=cls.astype(jnp.int32),
                              mask=scores > 0)

        return jax.vmap(single)(heat, wh, off,
                                batch['meta'].scale_factor)
