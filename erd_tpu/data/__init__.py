from .coco import COCO_CLASSES, COCOJson, CocoDataset, ImageRecord
from .lvis import LVISDataset
from .voc import VOC_CLASSES, VOCDataset
from .loader import DetDataLoader, LoaderConfig
from .transforms import (DetPipeline, bucket_shape, imread_rgb, rescale_size,
                         resize_image)

__all__ = [
    'CocoDataset', 'COCOJson', 'COCO_CLASSES', 'ImageRecord', 'DetPipeline',
    'VOCDataset', 'VOC_CLASSES', 'LVISDataset',
    'DetDataLoader', 'LoaderConfig', 'bucket_shape', 'rescale_size',
    'resize_image', 'imread_rgb',
]
