from .boxes import (bbox2distance, bbox_area, bbox_center, bbox_overlaps,
                    distance2bbox, scale_boxes, xyxy_to_xywh)
from .det_sample import DetResults, GTInstances, ImageMeta

__all__ = [
    'distance2bbox', 'bbox2distance', 'bbox_overlaps', 'bbox_area',
    'bbox_center', 'xyxy_to_xywh', 'scale_boxes', 'GTInstances', 'ImageMeta',
    'DetResults',
]
