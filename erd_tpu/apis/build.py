"""Builders: Config dicts -> framework objects.

The explicit (registry-free) replacement for mmdet's MODELS/DATASETS/...
registries: each builder consumes the documented config schema under
``configs/`` and returns concrete objects. Covers the build paths of
tools/train.py and tools/test.py in the reference.
"""
from __future__ import annotations

import os
from typing import Optional, Tuple

import jax.numpy as jnp

from ..config import Config
from ..data import CocoDataset, DetDataLoader, DetPipeline, LoaderConfig
from ..engine import Trainer, TrainerConfig
from ..evaluation import CocoMetric
from ..models import (ATSSDetector, ERDConfig, ERDDetector, FCOSDetector,
                      FasterRCNNDetector, GFLDetector, LDDetector,
                      RetinaNetDetector)
from ..models.detectors.mask_rcnn import MaskRCNNDetector
from ..models.detectors.yolov3 import YOLOV3Detector
from ..models.detectors.detr import DETRDetector
from ..models.detectors.ssd import SSDDetector
from ..models.detectors.yolox import YOLOXDetector
from ..models.detectors.deformable_detr import DeformableDETRDetector
from ..models.detectors.rtmdet import RTMDetDetector
from ..models.heads.gfl_head import GFLTestConfig, GFLTrainConfig

_DTYPES = {'float32': jnp.float32, 'bfloat16': jnp.bfloat16}


def build_detector(model_cfg: Config, num_devices: int = 1):
    mtype = model_cfg.get('type', 'GFL')
    test = model_cfg.get('test_cfg', {})
    train = model_cfg.get('train_cfg', {})
    base = dict(
        num_classes=model_cfg.get('num_classes', 80),
        depth=model_cfg.get('depth', 50),
        compute_dtype=_DTYPES[model_cfg.get('compute_dtype', 'float32')],
    )
    if model_cfg.get('dcn_stages'):
        base['dcn_stages'] = tuple(model_cfg['dcn_stages'])
        # DCNv1 (reference dcn=dict(type='DCN'), configs/dcn) vs DCNv2
        # (type='DCNv2', configs/dcnv2 + the gfl dcnv2 recipes)
        if 'dcn_modulated' in model_cfg:
            base['dcn_modulated'] = bool(model_cfg['dcn_modulated'])
    if model_cfg.get('backbone'):
        # backbone swap (configs/swin, configs/regnet, ... — GFL and the
        # Faster/Mask R-CNN assemblies accept SWAPPABLE_BACKBONES specs)
        base['backbone'] = dict(model_cfg['backbone'])
    # backbone plugin passthrough (gcnet / empirical_attention configs);
    # only detectors whose backbones expose these accept them, so they
    # ride **base like dcn_stages does
    for k in ('context_block_stages', 'gen_attention_stages'):
        if model_cfg.get(k):
            base[k] = tuple(model_cfg[k])
    if model_cfg.get('neck'):
        # neck swap (configs/pafpn, dyhead, fpg, nas_fpn, carafe, ...) —
        # supported by the GFL/LD/ERD, RetinaNet, ATSS and Faster/Mask
        # R-CNN assemblies; dict or list-of-dicts (chained) spec
        assert mtype in ('GFL', 'LD', 'GFLIncrementERD', 'RetinaNet',
                         'ATSS', 'FasterRCNN', 'MaskRCNN'), \
            f'neck swap not supported for detector type {mtype}'
        spec = model_cfg['neck']
        base['neck'] = [dict(s) for s in spec] \
            if isinstance(spec, (list, tuple)) else dict(spec)
    if model_cfg.get('context_block_ratio'):
        base['context_block_ratio'] = float(
            model_cfg['context_block_ratio'])
    test_cfg = GFLTestConfig(
        score_thr=test.get('score_thr', 0.05),
        nms_pre=test.get('nms_pre', 1000),
        iou_threshold=test.get('nms_iou_threshold',
                               0.6 if mtype in ('GFL', 'GFLIncrementERD',
                                                'LD', 'ATSS') else 0.5),
        max_per_img=test.get('max_per_img', 100),
        min_bbox_size=test.get('min_bbox_size', 0.0),
        # default matches GFLTestConfig (2000; A/B-measured loss-free vs
        # uncapped NMS, docs/ROUND2.md "pre_nms_total cap")
        pre_nms_total=test.get('pre_nms_total', 2000),
        # soft-NMS (reference test_cfg nms=dict(type='soft_nms', ...))
        nms_type=test.get('nms_type', 'nms'),
        soft_nms_method=test.get('soft_nms_method', 'linear'),
        soft_nms_sigma=test.get('soft_nms_sigma', 0.5),
        soft_nms_min_score=test.get('soft_nms_min_score', 1e-3))
    gfl_common = dict(
        reg_max=model_cfg.get('reg_max', 16),
        train_cfg=GFLTrainConfig(
            assigner_topk=train.get('assigner_topk', 9)),
        test_cfg=test_cfg, **base)
    if mtype == 'GFL':
        return GFLDetector(**gfl_common)
    if mtype == 'LD':
        return LDDetector(ld_weight=model_cfg.get('ld_weight', 0.25),
                          ld_T=model_cfg.get('ld_T', 10.0), **gfl_common)
    if mtype == 'GFLIncrementERD':
        erd = model_cfg.get('erd', {})
        ori = model_cfg.get('ori_setting', {})
        if 'ers_cls_cap' in erd:
            raise ValueError(
                "erd.ers_cls_cap is not a knob: the cls-branch ERS "
                "selection is dense-exact (uncapped mu+2sigma mask, "
                "ers_cls_mask_dense) and a cap would silently do nothing. "
                "Remove it from the config.")
        return ERDDetector(
            erd=ERDConfig(
                ori_num_classes=ori.get('ori_num_classes', 40),
                dist_loss_weight=erd.get('dist_loss_weight', 1.0),
                ld_weight=erd.get('ld_weight', 0.25),
                ld_T=erd.get('ld_T', 10),
                distill_nms_iou=erd.get('distill_nms_iou', 0.005),
                ers_reg_cap=erd.get('ers_reg_cap', 0),
                num_devices=num_devices),
            **gfl_common)
    if mtype == 'RetinaNet':
        from ..models.heads.retina_head import RetinaTrainConfig
        rtc = {}
        for k in ('loss_type', 'ghm_c_bins', 'ghm_r_bins', 'ghm_mu',
                  'cls_weight', 'bbox_weight'):
            if k in train:
                rtc[k] = train[k]
        return RetinaNetDetector(
            sepbn=model_cfg.get('head', '') == 'RetinaSepBNHead',
            train_cfg=RetinaTrainConfig(**rtc),
            test_cfg=test_cfg, **base)
    if mtype == 'FCOS':
        return FCOSDetector(test_cfg=test_cfg, **base)
    if mtype == 'ATSS':
        return ATSSDetector(test_cfg=test_cfg, **base)
    if mtype in ('FasterRCNN', 'MaskRCNN'):
        # configs/gn + gn+ws: GN(32) neck/head norm, ConvWS convs,
        # Shared4Conv1FCBBoxHead
        if model_cfg.get('head_norm', '').upper() == 'GN':
            base['head_norm'] = 'gn'
        if model_cfg.get('conv_ws'):
            base['conv_ws'] = True
        if model_cfg.get('bbox_head') == 'Shared4Conv1FCBBoxHead':
            base['bbox_head_convs'] = 4
    if mtype == 'FasterRCNN':
        if train.get('rcnn_sampler'):
            # train_cfg=dict(rcnn_sampler='ohem') — the reference's
            # train_cfg.rcnn.sampler.type='OHEMSampler'
            # (configs/faster_rcnn/faster-rcnn_r50_fpn_ohem_1x_coco.py)
            from ..models.heads.bbox_head import RCNNTrainConfig
            base['rcnn_train_cfg'] = RCNNTrainConfig(
                sampler=train['rcnn_sampler'])
        return FasterRCNNDetector(test_cfg=test_cfg, **base)
    if mtype == 'MaskRCNN':
        if model_cfg.get('loss_cls') == 'seesaw':
            # configs/seesaw_loss (reference SeesawLoss + NormedLinear
            # cls predictor on the bbox head)
            base.update(loss_cls='seesaw',
                        seesaw_p=model_cfg.get('seesaw_p', 0.8),
                        seesaw_q=model_cfg.get('seesaw_q', 2.0))
        return MaskRCNNDetector(test_cfg=test_cfg, **base)
    if mtype == 'CentripetalNet':
        from ..models.detectors.centripetalnet import (
            CentripetalNetDetector)
        base.pop('depth')
        return CentripetalNetDetector(
            corner_topk=test.get('corner_topk', 100),
            score_thr=test.get('score_thr', 0.05),
            max_per_img=test.get('max_per_img', 100),
            nms_type=test.get('nms_type', 'soft_nms'),
            soft_nms_sigma=test.get('soft_nms_sigma', 0.5), **base)
    if mtype == 'DetectoRS':
        from ..models.detectors.detectors_rcnn import (
            DetectoRSFasterRCNNDetector)
        return DetectoRSFasterRCNNDetector(test_cfg=test_cfg, **base)
    if mtype == 'NASFCOS':
        from ..models.detectors.nasfcos import NASFCOSDetector
        return NASFCOSDetector(test_cfg=test_cfg, **base)
    if mtype == 'TridentFasterRCNN':
        from ..models.detectors.trident_faster_rcnn import (
            TridentFasterRCNNDetector)
        return TridentFasterRCNNDetector(test_cfg=test_cfg, **base)
    if mtype == 'SCNet':
        from ..models.detectors.scnet import SCNetDetector
        return SCNetDetector(test_cfg=test_cfg, **base)
    if mtype == 'CrowdDet':
        from ..models.detectors.crowddet import CrowdDetDetector
        return CrowdDetDetector(test_cfg=test_cfg, **base)
    if mtype == 'BoxInst':
        from ..models.detectors.boxinst import BoxInstDetector
        return BoxInstDetector(test_cfg=test_cfg, **base)
    if mtype == 'SOLO':
        from ..models.detectors.solo import SOLODetector
        return SOLODetector(
            nms_pre=test.get('nms_pre', 500),
            score_thr=test.get('score_thr', 0.1),
            max_per_img=test.get('max_per_img', 100), **base)
    if mtype == 'FastRCNN':
        from ..models.detectors.fast_rcnn import FastRCNNDetector
        return FastRCNNDetector(test_cfg=test_cfg, **base)
    if mtype == 'RPN':
        from ..models.detectors.fast_rcnn import RPNDetector
        return RPNDetector(test_cfg=test_cfg, **base)
    if mtype == 'GRoIEFasterRCNN':
        from ..models.detectors.groie_faster_rcnn import \
            GRoIEFasterRCNNDetector
        return GRoIEFasterRCNNDetector(test_cfg=test_cfg, **base)
    if mtype == 'CascadeRPN':
        from ..models.detectors.cascade_rpn import CascadeRPNDetector
        return CascadeRPNDetector(test_cfg=test_cfg, **base)
    if mtype == 'CascadeRPNFasterRCNN':
        from ..models.detectors.cascade_rpn import \
            CascadeRPNFasterRCNNDetector
        return CascadeRPNFasterRCNNDetector(test_cfg=test_cfg, **base)
    if mtype == 'DoubleHeadRCNN':
        from ..models.detectors.double_head_rcnn import \
            DoubleHeadRCNNDetector
        return DoubleHeadRCNNDetector(test_cfg=test_cfg, **base)
    if mtype == 'GAFasterRCNN':
        from ..models.detectors.ga_faster_rcnn import GAFasterRCNNDetector
        return GAFasterRCNNDetector(test_cfg=test_cfg, **base)
    if mtype == 'GARPN':
        from ..models.detectors.ga_faster_rcnn import GARPNDetector
        return GARPNDetector(test_cfg=test_cfg, **base)
    if mtype == 'SABLRetinaNet':
        from ..models.detectors.sabl_retinanet import SABLRetinaNetDetector
        return SABLRetinaNetDetector(
            num_buckets=model_cfg.get('num_buckets', 14),
            scale_factor=model_cfg.get('bucket_scale_factor', 3.0),
            use_gn=model_cfg.get('head_norm', '') == 'GN',
            test_cfg=test_cfg, **base)
    if mtype == 'GARetinaNet':
        from ..models.detectors.ga_retinanet import GARetinaNetDetector
        return GARetinaNetDetector(
            loc_filter_thr=test.get('loc_filter_thr', 0.01),
            test_cfg=test_cfg, **base)
    if mtype == 'QueryInst':
        from ..models.detectors.queryinst import QueryInstDetector
        return QueryInstDetector(
            num_proposals=model_cfg.get('num_proposals', 100),
            num_stages=model_cfg.get('num_stages', 6),
            max_per_img=test.get('max_per_img', 100), **base)
    if mtype == 'GridRCNN':
        from ..models.detectors.grid_rcnn import GridRCNNDetector
        return GridRCNNDetector(test_cfg=test_cfg, **base)
    if mtype == 'PointRend':
        from ..models.detectors.point_rend import PointRendDetector
        return PointRendDetector(test_cfg=test_cfg, **base)
    if mtype == 'LAD':
        from ..models.detectors.lad import LADDetector
        return LADDetector(topk=train.get('topk', 9),
                           test_cfg=test_cfg, **base)
    if mtype in ('Mask2Former', 'MaskFormer'):
        from ..models.detectors.mask2former import Mask2FormerDetector
        return Mask2FormerDetector(
            num_queries=model_cfg.get('num_queries', 100),
            num_decoder_layers=model_cfg.get(
                'num_decoder_layers', 9 if mtype == 'Mask2Former' else 6),
            masked_attention=(mtype == 'Mask2Former'),
            max_per_img=test.get('max_per_img', 100), **base)
    if mtype == 'YOLACT':
        from ..models.detectors.yolact import YOLACTDetector
        return YOLACTDetector(test_cfg=test_cfg, **base)
    if mtype == 'CondInst':
        from ..models.detectors.condinst import CondInstDetector
        return CondInstDetector(test_cfg=test_cfg, **base)
    if mtype == 'DynamicRCNN':
        from ..models.detectors.dynamic_rcnn import DynamicRCNNDetector
        return DynamicRCNNDetector(test_cfg=test_cfg, **base)
    if mtype == 'HTC':
        from ..models.detectors.htc import HTCDetector
        return HTCDetector(
            semantic_classes=model_cfg.get('semantic_classes', 183),
            test_cfg=test_cfg, **base)
    if mtype == 'MaskScoringRCNN':
        from ..models.detectors.mask_scoring_rcnn import (
            MaskScoringRCNNDetector)
        return MaskScoringRCNNDetector(test_cfg=test_cfg, **base)
    if mtype == 'CascadeRCNN':
        from ..models.detectors.cascade_rcnn import CascadeRCNNDetector
        return CascadeRCNNDetector(test_cfg=test_cfg, **base)
    if mtype == 'CascadeMaskRCNN':
        from ..models.detectors.cascade_mask_rcnn import (
            CascadeMaskRCNNDetector)
        return CascadeMaskRCNNDetector(test_cfg=test_cfg, **base)
    if mtype == 'YOLOV3':
        base.pop('depth')
        return YOLOV3Detector(test_cfg=test_cfg, **base)
    if mtype == 'SSD':
        base.pop('depth')
        return SSDDetector(
            input_size=model_cfg.get('input_size', 300),
            test_cfg=test_cfg, **base)
    if mtype == 'SSDLite':
        from ..models.detectors.ssd import SSDLiteDetector
        base.pop('depth')
        return SSDLiteDetector(
            input_size=model_cfg.get('input_size', 320),
            test_cfg=test_cfg, **base)
    if mtype == 'YOLOX':
        base.pop('depth')
        # size ladder (tiny/s/m/l/x) via deepen/widen factors — see
        # YOLOXNet; reference configs/yolox/*.py deepen_factor/widen_factor
        return YOLOXDetector(
            deepen=float(model_cfg.get('deepen', 0.33)),
            widen=float(model_cfg.get('widen', 0.5)),
            test_cfg=test_cfg, **base)
    if mtype == 'DETR':
        return DETRDetector(
            num_queries=model_cfg.get('num_queries', 100),
            max_per_img=test.get('max_per_img', 100), **base)
    if mtype == 'RTMDet':
        base.pop('depth')
        return RTMDetDetector(
            deepen=float(model_cfg.get('deepen', 0.33)),
            widen=float(model_cfg.get('widen', 0.5)),
            test_cfg=test_cfg, **base)
    if mtype == 'RTMDetIns':
        from ..models.detectors.rtmdet_ins import RTMDetInsDetector
        base.pop('depth')
        return RTMDetInsDetector(
            deepen=float(model_cfg.get('deepen', 0.33)),
            widen=float(model_cfg.get('widen', 0.5)),
            mask_thr_binary=test.get('mask_thr_binary', 0.5),
            test_cfg=test_cfg, **base)
    if mtype == 'DeformableDETR':
        return DeformableDETRDetector(
            num_queries=model_cfg.get('num_queries', 300),
            max_per_img=test.get('max_per_img', 100), **base)
    if mtype == 'DINO':
        from ..models.detectors.dino import DINODetector
        return DINODetector(
            num_queries=model_cfg.get('num_queries', 900),
            max_per_img=test.get('max_per_img', 300), **base)
    if mtype == 'TOOD':
        from ..models.detectors.tood import TOODDetector
        return TOODDetector(
            initial_epochs=train.get('initial_epoch', 4),
            test_cfg=test_cfg, **base)
    if mtype == 'CenterNetUpdate':
        from ..models.detectors.centernet_update import (
            CenterNetUpdateDetector)
        return CenterNetUpdateDetector(test_cfg=test_cfg, **base)
    if mtype == 'CenterNet':
        from ..models.detectors.centernet import CenterNetDetector
        return CenterNetDetector(
            use_dcn=model_cfg.get('use_dcn', True),
            max_per_img=test.get('max_per_img', 100), **base)
    if mtype == 'PAA':
        from ..models.detectors.paa import PAADetector
        return PAADetector(topk=train.get('topk', 9),
                           test_cfg=test_cfg, **base)
    if mtype == 'SoftTeacher':
        from ..models.detectors.soft_teacher import (SemiTrainConfig,
                                                     SoftTeacherDetector)
        semi = model_cfg.get('semi_train_cfg', {})
        return SoftTeacherDetector(
            semi=SemiTrainConfig(
                pseudo_label_initial_score_thr=semi.get(
                    'pseudo_label_initial_score_thr', 0.5),
                rpn_pseudo_thr=semi.get('rpn_pseudo_thr', 0.9),
                cls_pseudo_thr=semi.get('cls_pseudo_thr', 0.9),
                reg_pseudo_thr=semi.get('reg_pseudo_thr', 0.02),
                jitter_times=semi.get('jitter_times', 10),
                jitter_scale=semi.get('jitter_scale', 0.06),
                unsup_weight=semi.get('unsup_weight', 4.0)),
            test_cfg=test_cfg, **base)
    if mtype == 'SOLOv2':
        from ..models.detectors.solov2 import SOLOV2Detector
        return SOLOV2Detector(
            nms_pre=test.get('nms_pre', 500),
            score_thr=test.get('score_thr', 0.1),
            mask_thr=test.get('mask_thr', 0.5),
            filter_thr=test.get('filter_thr', 0.05),
            max_per_img=test.get('max_per_img', 100), **base)
    if mtype == 'FSAF':
        from ..models.detectors.fsaf import FSAFDetector
        from ..models.heads.fsaf_head import FSAFTrainConfig
        return FSAFDetector(
            train_cfg=FSAFTrainConfig(
                pos_scale=train.get('pos_scale', 0.2),
                neg_scale=train.get('neg_scale', 0.2),
                min_pos_iof=train.get('min_pos_iof', 0.01)),
            test_cfg=test_cfg, **base)
    if mtype == 'FOVEA':
        from ..models.detectors.fovea import FoveaDetector
        return FoveaDetector(sigma=model_cfg.get('sigma', 0.4),
                             test_cfg=test_cfg, **base)
    if mtype == 'YOLOF':
        from ..models.detectors.yolof import YOLOFDetector
        from ..models.heads.yolof_head import YOLOFTrainConfig
        return YOLOFDetector(
            train_cfg=YOLOFTrainConfig(
                match_times=train.get('match_times', 4),
                pos_ignore_thr=train.get('pos_ignore_thr', 0.15),
                neg_ignore_thr=train.get('neg_ignore_thr', 0.7)),
            test_cfg=test_cfg, **base)
    if mtype == 'RepPoints':
        from ..models.detectors.reppoints import RepPointsDetector
        return RepPointsDetector(test_cfg=test_cfg, **base)
    if mtype == 'FreeAnchor':
        from ..models.detectors.free_anchor import FreeAnchorDetector
        return FreeAnchorDetector(
            pre_anchor_topk=train.get('pre_anchor_topk', 50),
            bbox_thr=train.get('bbox_thr', 0.6),
            test_cfg=test_cfg, **base)
    if mtype == 'PISASSD':
        from ..models.detectors.pisa_ssd import PISASSDDetector
        base.pop('depth')
        isr = train.get('isr', {})
        carl = train.get('carl', {})
        return PISASSDDetector(
            input_size=model_cfg.get('input_size', 300),
            isr_k=isr.get('k', 2.0), isr_bias=isr.get('bias', 0.0),
            carl_k=carl.get('k', 1.0), carl_bias=carl.get('bias', 0.2),
            test_cfg=test_cfg, **base)
    if mtype == 'PISARetinaNet':
        from ..models.detectors.pisa_retinanet import PISARetinaNetDetector
        return PISARetinaNetDetector(test_cfg=test_cfg, **base)
    if mtype == 'AutoAssign':
        from ..models.detectors.autoassign import AutoAssignDetector
        return AutoAssignDetector(test_cfg=test_cfg, **base)
    if mtype == 'SparseRCNN':
        from ..models.detectors.sparse_rcnn import SparseRCNNDetector
        return SparseRCNNDetector(
            num_proposals=model_cfg.get('num_proposals', 100),
            num_stages=model_cfg.get('num_stages', 6),
            max_per_img=test.get('max_per_img', 100), **base)
    if mtype == 'PanopticFPN':
        from ..models.detectors.panoptic_fpn import PanopticFPNDetector
        return PanopticFPNDetector(
            num_stuff_classes=model_cfg.get('num_stuff_classes', 53),
            test_cfg=test_cfg, **base)
    if mtype == 'LibraRCNN':
        from ..models.detectors.libra_rcnn import LibraRCNNDetector
        return LibraRCNNDetector(test_cfg=test_cfg, **base)
    if mtype == 'CornerNet':
        from ..models.detectors.cornernet import CornerNetDetector
        base.pop('depth')
        return CornerNetDetector(
            corner_topk=test.get('corner_topk', 100),
            distance_threshold=test.get('distance_threshold', 0.5),
            score_thr=test.get('score_thr', 0.05),
            max_per_img=test.get('max_per_img', 100),
            nms_iou=test.get('nms_iou_threshold', 0.5),
            nms_type=test.get('nms_type', 'soft_nms'),
            soft_nms_sigma=test.get('soft_nms_sigma', 0.5), **base)
    if mtype == 'DDOD':
        from ..models.detectors.ddod import DDODDetector
        return DDODDetector(use_dcn=model_cfg.get('use_dcn', True),
                            test_cfg=test_cfg, **base)
    if mtype == 'VFNet':
        from ..models.detectors.vfnet import VFNetDetector
        return VFNetDetector(test_cfg=test_cfg, **base)
    if mtype in ('ConditionalDETR', 'DABDETR'):
        from ..models.detectors.conditional_dab_detr import (
            ConditionalDETRDetector, DABDETRDetector)
        cls = DABDETRDetector if mtype == 'DABDETR' else \
            ConditionalDETRDetector
        return cls(num_queries=model_cfg.get('num_queries', 300),
                   max_per_img=test.get('max_per_img', 100), **base)
    raise KeyError(f'unknown model type {mtype}')


def build_dataset(cfg: Config, loader_cfg: Config,
                  data_root: str = '', test_mode=False) -> CocoDataset:
    ds_cfg = loader_cfg.dataset
    dtype = ds_cfg.get('type', 'CocoDataset')
    common = dict(
        filter_empty_gt=ds_cfg.get('filter_empty_gt', True),
        min_size=ds_cfg.get('min_size', 32), test_mode=test_mode)
    if dtype == 'VOCDataset':
        from ..data import VOCDataset
        return VOCDataset(
            data_root=os.path.join(data_root,
                                   ds_cfg.get('sub_data_root', '')),
            split=ds_cfg.get('split', 'trainval'),
            year=str(ds_cfg.get('year', '2007')), **common)
    if dtype == 'WIDERFaceDataset':
        from ..data.extra_datasets import WIDERFaceDataset
        return WIDERFaceDataset(
            data_root=os.path.join(data_root,
                                   ds_cfg.get('sub_data_root', '')),
            split_file=ds_cfg.get('split_file', 'train.txt'),
            img_prefix=os.path.join(data_root, ds_cfg['img_prefix'])
            if ds_cfg.get('img_prefix') else '',
            min_size=ds_cfg.get('min_size'), test_mode=test_mode)
    coco_kwargs = dict(
        ann_file=os.path.join(data_root, ds_cfg.ann_file),
        img_prefix=os.path.join(data_root, ds_cfg.get('img_prefix', '')),
        **common)
    if dtype == 'LVISDataset':
        from ..data import LVISDataset
        return LVISDataset(**coco_kwargs)
    if dtype in ('Objects365V1Dataset', 'Objects365V2Dataset',
                 'CityscapesDataset', 'DeepFashionDataset'):
        from ..data import extra_datasets
        return getattr(extra_datasets, dtype)(**coco_kwargs)
    if dtype == 'CrowdHumanDataset':
        from ..data.extra_datasets import CrowdHumanDataset
        kw = dict(ann_file=coco_kwargs['ann_file'],
                  img_prefix=coco_kwargs['img_prefix'],
                  filter_empty_gt=common['filter_empty_gt'],
                  test_mode=test_mode)
        if ds_cfg.get('extra_ann_file'):
            kw['extra_ann_file'] = os.path.join(data_root,
                                                ds_cfg['extra_ann_file'])
        if ds_cfg.get('default_hw'):
            kw['default_hw'] = tuple(ds_cfg['default_hw'])
        return CrowdHumanDataset(**kw)
    if dtype == 'OpenImagesDataset':
        from ..data.openimages import OpenImagesDataset
        kw = dict(ann_file=coco_kwargs['ann_file'],
                  img_prefix=coco_kwargs['img_prefix'],
                  label_file=os.path.join(data_root, ds_cfg['label_file']),
                  test_mode=test_mode)
        for opt in ('hierarchy_file', 'meta_file', 'image_level_ann_file'):
            if ds_cfg.get(opt):
                kw[opt] = os.path.join(data_root, ds_cfg[opt])
        if ds_cfg.get('default_hw'):
            kw['default_hw'] = tuple(ds_cfg['default_hw'])
        return OpenImagesDataset(**kw)
    if dtype == 'CocoPanopticDataset':
        from ..data.coco_panoptic import CocoPanopticDataset
        return CocoPanopticDataset(
            seg_prefix=os.path.join(data_root,
                                    ds_cfg.get('seg_prefix', '')),
            **coco_kwargs)
    assert dtype == 'CocoDataset', f'unknown dataset type {dtype}'
    return CocoDataset(with_mask=ds_cfg.get('with_mask', False),
                       **coco_kwargs)


def build_strong_aug(spec, dataset):
    """[{'type': 'Mosaic', ...}, ...] -> tuple of transform callables."""
    from ..data import strong_aug as sa
    out = []
    for item in spec:
        item = dict(item)
        cls = getattr(sa, item.pop('type'))
        for key in ('img_scale', 'scale', 'ratio_range',
                    'center_ratio_range',
                    'scaling_ratio_range', 'border', 'crop_size',
                    'contrast_range', 'saturation_range', 'min_ious',
                    'mean', 'border_val'):
            if key in item:
                item[key] = tuple(item[key])
        out.append(cls(**item))
    return tuple(out)


def build_loader(dataset, loader_cfg: Config, training=True,
                 seed=0) -> DetDataLoader:
    from ..data.transforms import AugPipeline
    pipe_cfg = loader_cfg.get('pipeline', {})
    ms = pipe_cfg.get('ms_scales')
    kwargs = dict(
        scale=tuple(pipe_cfg.get('scale', (1333, 800))),
        flip_prob=pipe_cfg.get('flip_prob', 0.5 if training else 0.0),
        max_gt=pipe_cfg.get('max_gt', 100),
        training=training,
        ms_scales=tuple(tuple(s) for s in ms) if ms else None)
    aug_spec = pipe_cfg.get('strong_aug') if training else None
    if aug_spec:
        pipeline = AugPipeline(
            transforms=build_strong_aug(aug_spec, dataset),
            dataset=dataset, **kwargs)
    else:
        pipeline = DetPipeline(**kwargs)
    return DetDataLoader(dataset, pipeline, LoaderConfig(
        batch_size=loader_cfg.get('batch_size', 16),
        num_workers=loader_cfg.get('num_workers', 8),
        seed=loader_cfg.get('seed', seed),
        drop_last=loader_cfg.get('drop_last', training),
        shuffle=loader_cfg.get('shuffle', training),
        sampler=loader_cfg.get('sampler', 'default'),
        num_sample_class=loader_cfg.get('num_sample_class', 1)))


def build_metric(dataset, evaluator_cfg: Config) -> CocoMetric:
    return CocoMetric(dataset,
                      classwise=evaluator_cfg.get('classwise', False),
                      outfile_prefix=evaluator_cfg.get('outfile_prefix'),
                      metrics=evaluator_cfg.get('metric', ('bbox',)))


def _normalized_optim(cfg: Config) -> dict:
    """Merge the repo-native ``optim`` section with the reference-style
    ``optim_wrapper`` overlay (optimizer type/lr, clip_grad.max_norm,
    paramwise_cfg.backbone_lr_mult) into one flat dict, so configs written
    against either schema drive the same Trainer."""
    optim = dict(cfg.get('optim', {}))
    ow = cfg.get('optim_wrapper', {})
    if ow:
        inner = ow.get('optimizer', {})
        for k in ('type', 'lr', 'momentum', 'weight_decay'):
            if k in inner:
                optim[k] = inner[k]
        cg = ow.get('clip_grad')
        if cg:
            optim['grad_clip'] = cg.get('max_norm')
        pw = ow.get('paramwise_cfg', {})
        if 'backbone_lr_mult' in pw:
            optim['backbone_lr_mult'] = pw['backbone_lr_mult']
    return optim


def build_trainer(cfg: Config, detector, train_loader, num_devices=1,
                  teacher_variables=None, mesh=None,
                  val_fn=None) -> Trainer:
    optim = _normalized_optim(cfg)
    train_cfg = cfg.get('train_cfg', {})
    scale = cfg.get('auto_scale_lr', {})
    base_batch = scale.get('base_batch_size', 16) if \
        scale.get('enable', True) else train_loader.cfg.batch_size
    tc = TrainerConfig(
        epochs=train_cfg.get('epochs', 12),
        base_lr=optim.get('lr', 0.01),
        momentum=optim.get('momentum', 0.9),
        weight_decay=optim.get('weight_decay', 1e-4),
        warmup_iters=optim.get('warmup_iters', 500),
        warmup_epochs=optim.get('warmup_epochs', 0),
        warmup_factor=optim.get('warmup_factor', 0.001),
        milestones_epochs=tuple(optim.get('milestones_epochs', (8, 11))),
        gamma=optim.get('gamma', 0.1),
        frozen_stages=cfg.model.get('frozen_stages', 1),
        schedule=optim.get('schedule', 'multistep'),
        min_lr_ratio=optim.get('min_lr_ratio', 0.05),
        cosine_begin_epoch=optim.get('cosine_begin_epoch', 0),
        cosine_end_epoch=optim.get('cosine_end_epoch', 0),
        quadratic_warmup=optim.get('quadratic_warmup', False),
        optimizer=optim.get('type', 'SGD'),
        backbone_lr_mult=optim.get('backbone_lr_mult', 1.0),
        auto_scale_base_batch=base_batch,
        grad_clip=optim.get('grad_clip'),
        log_interval=cfg.get('log_interval', 50),
        loss_sampling=cfg.get('loss_sampling', 'sampled'),
        ckpt_dir=os.path.join(cfg.get('work_dir', 'work_dirs'),
                              cfg.get('experiment', 'exp')),
        ckpt_interval_epochs=cfg.get('ckpt_interval_epochs', 1),
        val_interval=train_cfg.get('val_interval', 1))
    trainer = Trainer(detector, train_loader, tc,
                      teacher_variables=teacher_variables, mesh=mesh,
                      val_fn=val_fn)
    for spec in cfg.get('custom_hooks', ()):
        trainer.hooks.append(build_hook(spec, train_loader))
    return trainer


def build_hook(spec, train_loader):
    """Config dict -> engine hook (custom_hooks analogue)."""
    from ..engine.hooks import (MemoryReportHook, NumClassCheckHook,
                                PipelineSwitchHook, SetEpochInfoHook,
                                YOLOXModeSwitchHook)

    def _weak_pipeline(pipe):
        return DetPipeline(
            scale=tuple(pipe.get('scale', train_loader.pipeline.scale)),
            flip_prob=pipe.get('flip_prob', 0.5),
            max_gt=pipe.get('max_gt', train_loader.pipeline.max_gt),
            training=True)

    spec = dict(spec)
    kind = spec.pop('type')
    if kind == 'PipelineSwitchHook':
        # e.g. YOLOX: strong augs off for the last epochs
        # (reference pipeline_switch_hook.py via num_last_epochs)
        new_pipeline = _weak_pipeline(dict(spec.pop('pipeline', {})))
        return PipelineSwitchHook(spec['switch_epoch'], new_pipeline)
    if kind == 'YOLOXModeSwitchHook':
        # strong augs off AND raw-box L1 on for the last epochs
        # (reference yolox_mode_switch_hook.py); re-jits the train step
        pipe = spec.pop('pipeline', None)
        return YOLOXModeSwitchHook(
            max_epochs=spec['max_epochs'],
            num_last_epochs=spec.get('num_last_epochs', 15),
            new_pipeline=_weak_pipeline(dict(pipe)) if pipe else None)
    if kind == 'SetEpochInfoHook':
        return SetEpochInfoHook()
    if kind == 'NumClassCheckHook':
        return NumClassCheckHook(**spec)
    if kind == 'MemoryReportHook':
        return MemoryReportHook(**spec)
    raise KeyError(f'unknown custom hook {kind}')
