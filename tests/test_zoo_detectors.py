"""Systematic per-family invariant harness.

Applies the reference's canonical dense-head test pattern
(tests/test_models/test_dense_heads/test_gfl_head.py:14-89: empty gt =>
classification loss > 0 while box-regression losses are exactly zero;
one gt => every loss term finite and the box terms engaged) uniformly to
every detector family in the zoo, plus the predict-shape contract.

Loss keys are classified by substring: *box-like* terms (bbox/giou/
centerness/dfl/xy/wh/mask and the DINO denoising terms, which see no valid
queries without gt) must vanish on an empty image; everything else (cls,
objectness/conf, rpn_cls, encoder cls) must collectively stay positive —
negatives alone keep those losses alive.
"""
import numpy as np
import jax
import pytest

from tests.test_models import make_batch

# substrings marking loss terms that MUST be zero with no gt boxes
_ZERO_ON_EMPTY = ('bbox', 'giou', 'centerness', 'dfl', '_xy', '_wh',
                  'mask', 'dn_', 'pts', 'pull', 'push', 'offset', 'positive_bag',
                  'loss_pos', 'loss_center', 'shape')


def _build(name):
    from erd_tpu.models import (ATSSDetector, FasterRCNNDetector,
                                FCOSDetector, GFLDetector, RetinaNetDetector)
    from erd_tpu.models.detectors.cascade_rcnn import CascadeRCNNDetector
    from erd_tpu.models.detectors.conditional_dab_detr import (
        ConditionalDETRDetector, DABDETRDetector)
    from erd_tpu.models.detectors.deformable_detr import (
        DeformableDETRDetector)
    from erd_tpu.models.detectors.detr import DETRDetector
    from erd_tpu.models.detectors.dino import DINODetector
    from erd_tpu.models.detectors.rtmdet import RTMDetDetector
    from erd_tpu.models.detectors.ssd import SSDDetector
    from erd_tpu.models.detectors.yolov3 import YOLOV3Detector
    from erd_tpu.models.detectors.yolox import YOLOXDetector
    factories = {
        'gfl': lambda: GFLDetector(num_classes=4, depth=18),
        'retinanet': lambda: RetinaNetDetector(num_classes=4, depth=18),
        'retina_sepbn': lambda: RetinaNetDetector(num_classes=4, depth=18,
                                                  sepbn=True),
        'tood': lambda: _imp('tood', 'TOODDetector')(num_classes=4,
                                                     depth=18),
        'vfnet': lambda: _imp('vfnet', 'VFNetDetector')(num_classes=4,
                                                        depth=18),
        'centernet': lambda: _imp('centernet', 'CenterNetDetector')(
            num_classes=4, depth=18),
        'centernet_update': lambda: _imp(
            'centernet_update', 'CenterNetUpdateDetector')(num_classes=4,
                                                           depth=18),
        'paa': lambda: _imp('paa', 'PAADetector')(num_classes=4,
                                                  depth=18),
        'fcos': lambda: FCOSDetector(num_classes=4, depth=18),
        'fsaf': lambda: _imp('fsaf', 'FSAFDetector')(num_classes=4,
                                                     depth=18),
        'fovea': lambda: _imp('fovea', 'FoveaDetector')(num_classes=4,
                                                        depth=18),
        'yolof': lambda: _imp('yolof', 'YOLOFDetector')(num_classes=4,
                                                        depth=18),
        'reppoints': lambda: _imp('reppoints', 'RepPointsDetector')(
            num_classes=4, depth=18),
        'ddod': lambda: _imp('ddod', 'DDODDetector')(num_classes=4,
                                                     depth=18),
        'cornernet': lambda: _imp('cornernet', 'CornerNetDetector')(
            num_classes=4, stage_channels=(16, 16, 24),
            stage_blocks=(1, 1, 1), downsample_times=2, corner_topk=20),
        'libra_rcnn': lambda: _imp('libra_rcnn', 'LibraRCNNDetector')(
            num_classes=4, depth=18),
        'sparse_rcnn': lambda: _imp('sparse_rcnn', 'SparseRCNNDetector')(
            num_classes=4, depth=18, num_proposals=20, num_stages=2),
        'free_anchor': lambda: _imp('free_anchor', 'FreeAnchorDetector')(
            num_classes=4, depth=18, pre_anchor_topk=12),
        'autoassign': lambda: _imp('autoassign', 'AutoAssignDetector')(
            num_classes=4, depth=18),
        'pisa_retinanet': lambda: _imp(
            'pisa_retinanet', 'PISARetinaNetDetector')(num_classes=4,
                                                       depth=18),
        'dynamic_rcnn': lambda: _imp(
            'dynamic_rcnn', 'DynamicRCNNDetector')(num_classes=4,
                                                   depth=18),
        'grid_rcnn': lambda: _imp(
            'grid_rcnn', 'GridRCNNDetector')(num_classes=4, depth=18),
        'nasfcos': lambda: _imp('nasfcos', 'NASFCOSDetector')(
            num_classes=4, depth=18),
        'crowddet': lambda: _imp('crowddet', 'CrowdDetDetector')(
            num_classes=4, depth=18),
        'groie': lambda: _imp(
            'groie_faster_rcnn', 'GRoIEFasterRCNNDetector')(num_classes=4,
                                                            depth=18),
        'cascade_rpn_faster': lambda: _imp(
            'cascade_rpn', 'CascadeRPNFasterRCNNDetector')(num_classes=4,
                                                           depth=18),
        'double_head': lambda: _imp(
            'double_head_rcnn', 'DoubleHeadRCNNDetector')(num_classes=4,
                                                          depth=18),
        'ga_faster': lambda: _imp(
            'ga_faster_rcnn', 'GAFasterRCNNDetector')(num_classes=4,
                                                      depth=18),
        'ga_retina': lambda: _imp(
            'ga_retinanet', 'GARetinaNetDetector')(num_classes=4,
                                                   depth=18),
        'sabl_retina': lambda: _imp(
            'sabl_retinanet', 'SABLRetinaNetDetector')(num_classes=4,
                                                       depth=18),
        'atss': lambda: ATSSDetector(num_classes=4, depth=18),
        'faster_rcnn': lambda: FasterRCNNDetector(num_classes=4, depth=18),
        'cascade_rcnn': lambda: CascadeRCNNDetector(num_classes=4,
                                                    depth=18),
        'yolov3': lambda: YOLOV3Detector(num_classes=4),
        'yolox': lambda: YOLOXDetector(num_classes=4),
        'rtmdet': lambda: RTMDetDetector(num_classes=4),
        'ssd': lambda: SSDDetector(num_classes=4),
        'pisa_ssd': lambda: _imp('pisa_ssd', 'PISASSDDetector')(
            num_classes=4),
        'detr': lambda: DETRDetector(num_classes=4, depth=18,
                                     num_queries=20),
        'deformable_detr': lambda: DeformableDETRDetector(
            num_classes=4, depth=18, num_queries=20),
        'conditional_detr': lambda: ConditionalDETRDetector(
            num_classes=4, depth=18, num_queries=20),
        'dab_detr': lambda: DABDETRDetector(num_classes=4, depth=18,
                                            num_queries=20),
        'dino': lambda: DINODetector(num_classes=4, depth=18,
                                     num_queries=20),
    }
    return factories[name]()


def _imp(mod, cls):
    import importlib
    m = importlib.import_module(f'erd_tpu.models.detectors.{mod}')
    return getattr(m, cls)


FAMILIES = ['gfl', 'retinanet', 'retina_sepbn', 'tood', 'vfnet',
            'centernet', 'centernet_update', 'paa',
            'fcos', 'atss', 'fsaf', 'fovea', 'yolof', 'reppoints', 'ddod',
            'cornernet', 'libra_rcnn', 'sparse_rcnn', 'free_anchor',
            'autoassign', 'pisa_retinanet', 'dynamic_rcnn', 'grid_rcnn',
            'nasfcos', 'crowddet', 'ga_faster', 'ga_retina', 'sabl_retina',
            'double_head', 'cascade_rpn_faster', 'groie',
            'faster_rcnn',
            'cascade_rcnn', 'yolov3', 'yolox', 'rtmdet', 'ssd',
            'pisa_ssd', 'detr',
            'deformable_detr', 'conditional_detr', 'dab_detr', 'dino']

# SSD300 has a fixed 300x300 canvas (anchor table is input-locked)
_SHAPES = {'ssd': (300, 300), 'pisa_ssd': (300, 300)}


@pytest.fixture(scope='module', params=FAMILIES)
def det_and_vars(request):
    det = _build(request.param)
    h, w = _SHAPES.get(request.param, (64, 96))
    variables = det.init(jax.random.PRNGKey(0), image_shape=(h, w))
    return request.param, det, variables


def _batch_for(name, gts=None):
    h, w = _SHAPES.get(name, (64, 96))
    return make_batch(h=h, w=w, gts=gts)


_NEVER_ZERO = ('loss_center_heatmap',)  # gaussian focal has a bg term


def _split(losses):
    vals = {k: float(v) for k, v in losses.items()}
    zero_keys = [k for k in vals
                 if any(s in k for s in _ZERO_ON_EMPTY)
                 and k not in _NEVER_ZERO]
    pos_keys = [k for k in vals if k not in zero_keys]
    return vals, zero_keys, pos_keys


def test_empty_gt_invariant(det_and_vars):
    name, det, variables = det_and_vars
    losses = det.loss_jit(variables, _batch_for(name))
    vals, zero_keys, pos_keys = _split(losses)
    assert zero_keys and pos_keys, sorted(vals)
    for k in zero_keys:
        assert vals[k] == pytest.approx(0.0, abs=1e-6), (k, vals)
    if name in ('ssd', 'pisa_ssd'):
        # SSD mines 3 x n_pos hard negatives (ssd_head.py loss_by_feat):
        # with no positives nothing is mined, so cls loss is 0 by design
        assert vals['loss_cls'] == pytest.approx(0.0, abs=1e-6)
    else:
        assert sum(vals[k] for k in pos_keys) > 0, vals
    for k, v in vals.items():
        assert np.isfinite(v), (k, vals)


def test_one_gt_engages_all_branches(det_and_vars):
    name, det, variables = det_and_vars
    gts = [([[10, 10, 60, 50]], [1]),
           ([[5, 5, 40, 40], [30, 10, 80, 60]], [0, 2])]
    if name in ('ssd', 'pisa_ssd'):  # boxes sized for the 300 canvas
        gts = [([[30, 30, 150, 150]], [1]),
               ([[50, 50, 180, 200], [120, 40, 260, 180]], [0, 2])]
    losses = det.loss_jit(variables, _batch_for(name, gts=gts))
    vals, zero_keys, pos_keys = _split(losses)
    for k, v in vals.items():
        assert np.isfinite(v), (k, vals)
    assert sum(vals[k] for k in pos_keys) > 0, vals
    assert sum(vals[k] for k in zero_keys) > 0, vals


def test_predict_contract(det_and_vars):
    name, det, variables = det_and_vars
    res = det.predict_jit(variables, _batch_for(name))
    if isinstance(res, tuple):
        res = res[0]
    assert res.bboxes.ndim == 3 and res.bboxes.shape[0] == 2
    assert res.bboxes.shape[-1] == 4
    assert res.scores.shape == res.bboxes.shape[:2]
    assert res.labels.shape == res.bboxes.shape[:2]
    assert res.mask.dtype == bool


def test_grads_flow():
    # gradient-flow spot check on one anchor-based + one point-based family
    from erd_tpu.models import FCOSDetector, RetinaNetDetector
    for cls in (RetinaNetDetector, FCOSDetector):
        det = cls(num_classes=4, depth=18)
        variables = det.init(jax.random.PRNGKey(0), image_shape=(64, 96))
        gts = [([[10, 10, 60, 50]], [1]), ([], [])]
        batch = make_batch(gts=gts)
        params = variables['params']
        consts = {k: v for k, v in variables.items() if k != 'params'}

        @jax.jit
        def total(p, det=det, consts=consts, batch=batch):
            return sum(det.loss({'params': p, **consts}, batch).values())

        grads = jax.grad(total)(params)
        gnorm = sum(float(np.abs(np.asarray(g)).sum())
                    for g in jax.tree.leaves(grads))
        assert np.isfinite(gnorm) and gnorm > 0
