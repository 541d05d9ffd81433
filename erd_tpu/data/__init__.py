from .coco import COCO_CLASSES, COCOJson, CocoDataset, ImageRecord
from .lvis import LVISDataset
from .voc import VOC_CLASSES, VOCDataset
from .loader import DetDataLoader, LoaderConfig
from .transforms import (DetPipeline, bucket_shape, imread_rgb, rescale_size,
                         resize_image)

from .coco_panoptic import CocoPanopticDataset, decode_panoptic_png
from .openimages import OpenImagesDataset
from .extra_datasets import (CityscapesDataset, CrowdHumanDataset,
                             DeepFashionDataset, Objects365V1Dataset,
                             Objects365V2Dataset, WIDERFaceDataset)

__all__ = [
    'CocoDataset', 'COCOJson', 'COCO_CLASSES', 'ImageRecord', 'DetPipeline',
    'VOCDataset', 'VOC_CLASSES', 'LVISDataset',
    'CocoPanopticDataset', 'decode_panoptic_png', 'CrowdHumanDataset',
    'Objects365V1Dataset', 'Objects365V2Dataset', 'CityscapesDataset',
    'WIDERFaceDataset', 'DeepFashionDataset', 'OpenImagesDataset',
    'DetDataLoader', 'LoaderConfig', 'bucket_shape', 'rescale_size',
    'resize_image', 'imread_rgb',
]
