from .coco_eval import (AREA_RANGES, IOU_THRS, CocoMAPEvaluator,
                        DetectionResult, det_gt_iou)
from .coco_metric import CocoMetric
from .dump_results import DumpDetResults
from .crowdhuman_metric import CrowdHumanMetric
from .lvis_metric import LVISMetric, LvisMAPEvaluator
from .openimages_metric import OpenImagesMetric
from .panoptic_metric import PanopticMetric
from .voc_metric import VOCMetric, average_precision

__all__ = [
    'CocoMAPEvaluator', 'DetectionResult', 'CocoMetric', 'IOU_THRS',
    'AREA_RANGES', 'det_gt_iou', 'VOCMetric', 'average_precision',
    'LvisMAPEvaluator', 'LVISMetric', 'DumpDetResults',
    'CrowdHumanMetric', 'PanopticMetric', 'OpenImagesMetric',
]
from .recall import (CocoOccludedSeparatedMetric, eval_recalls,  # noqa: F401,E402
                     occluded_separated_recall)


def get_classes(dataset: str):
    """Class-name registry (mmdet/evaluation/functional/class_names.py
    get_classes): canonical label lists by dataset alias."""
    from ..data.coco import COCO_CLASSES
    from ..data.voc import VOC_CLASSES
    aliases = {
        'coco': COCO_CLASSES, 'voc': VOC_CLASSES, 'pascal_voc': VOC_CLASSES,
    }
    from ..data.extra_datasets import CITYSCAPES_CLASSES
    aliases['cityscapes'] = CITYSCAPES_CLASSES
    if dataset not in aliases:
        raise KeyError(f'unknown dataset alias: {dataset}')
    return list(aliases[dataset])
