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
