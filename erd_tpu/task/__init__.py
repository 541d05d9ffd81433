from .anchors import (AnchorGenerator, MlvlPointGenerator, featmap_sizes_for,
                      valid_flags_jax)
from .atss import AssignResult, atss_assign, atss_assign_batch
from .center_region import center_region_assign
from .coder import (DeltaXYWHBBoxCoder, DistancePointBBoxCoder,
                    TBLRBBoxCoder)
from .hungarian import hungarian_match
from .max_iou import max_iou_assign
from .bucketing import BucketingBBoxCoder, bucket_decode, bucket_encode
from .samplers import (SampleResult, instance_balanced_pos_sample,
                       iou_balanced_neg_sample, ohem_sample, random_sample,
                       score_hlr_sample)
from .sim_ota import sim_ota_assign
from .task_aligned import task_aligned_assign
from .uniform import uniform_assign

__all__ = [
    'AnchorGenerator', 'MlvlPointGenerator', 'featmap_sizes_for',
    'valid_flags_jax', 'AssignResult', 'atss_assign', 'atss_assign_batch',
    'DistancePointBBoxCoder', 'DeltaXYWHBBoxCoder', 'TBLRBBoxCoder',
    'center_region_assign', 'max_iou_assign',
    'sim_ota_assign', 'task_aligned_assign', 'hungarian_match',
    'random_sample', 'ohem_sample', 'uniform_assign',
    'score_hlr_sample', 'iou_balanced_neg_sample',
    'instance_balanced_pos_sample', 'BucketingBBoxCoder',
    'bucket_encode', 'bucket_decode',
    'SampleResult',
]
