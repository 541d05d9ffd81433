from .build import (build_dataset, build_detector, build_loader,
                    build_metric, build_trainer)
from .det_inferencer import DetInferencer
from .inference import inference_detector, init_detector, load_weights

__all__ = [
    'build_detector', 'build_dataset', 'build_loader', 'build_metric',
    'build_trainer', 'init_detector', 'inference_detector', 'load_weights',
    'DetInferencer',
]
