from .checkpoints import latest_checkpoint, load_checkpoint, save_checkpoint
from .ema import MeanTeacherHook, ema_update, exp_momentum
from .hooks import (CheckInvalidLossHook, DetVisualizationHook, Hook,
                    LoggerHook, MemoryReportHook, NumClassCheckHook,
                    PipelineSwitchHook, TensorboardLoggerHook,
                    YOLOXModeSwitchHook, TeacherStudentValHook, SetEpochInfoHook)
from .optim import (adamw_optimizer, layer_decay_adamw,
                    layer_wise_lr_scale, resnet_frozen_paths,
                    sgd_optimizer, swin_layer_id)
from .schedules import auto_scale_lr, warmup_multistep
from .train_loop import Trainer, TrainerConfig, run_evaluation

__all__ = [
    'Trainer', 'TrainerConfig', 'run_evaluation', 'sgd_optimizer',
    'adamw_optimizer', 'layer_decay_adamw', 'layer_wise_lr_scale', 'swin_layer_id',
    'resnet_frozen_paths', 'warmup_multistep', 'auto_scale_lr',
    'save_checkpoint', 'load_checkpoint', 'latest_checkpoint', 'Hook',
    'LoggerHook', 'CheckInvalidLossHook', 'MemoryReportHook',
    'MeanTeacherHook', 'ema_update', 'exp_momentum',
    'NumClassCheckHook', 'PipelineSwitchHook', 'TensorboardLoggerHook',
    'YOLOXModeSwitchHook', 'TeacherStudentValHook', 'SetEpochInfoHook',
    'DetVisualizationHook',
]
