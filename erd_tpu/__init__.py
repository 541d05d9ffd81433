"""erd_tpu: a TPU-native (JAX/XLA/Pallas) incremental object detection framework.

Re-implements the capability surface of Hi-FT/ERD ("Overcoming Catastrophic
Forgetting in Incremental Object Detection via Elastic Response Distillation",
CVPR 2022) with a TPU-first design: static shapes, vmapped per-image logic,
fused teacher+student train steps, and data-parallel pjit over a device mesh.

Layering (mirrors the reference's layer map, SURVEY.md section 1):
  structures/  box math and detection sample containers
  ops/         fixed-shape detection ops (NMS, integral decode, top-k filter)
  losses/      loss primitives with the weight/avg_factor protocol
  task/        anchors, assigners (ATSS), box coders
  models/      backbones / necks / dense heads / detectors
  data/        COCO dataset, host-side transform pipeline, bucketed batching
  evaluation/  pure-numpy COCO mAP evaluator + metric front-end
  engine/      optimizer schedules, train/eval loops, hooks, checkpointing
  parallel/    mesh + sharding helpers
  apis/        user-facing inference helpers
"""

__version__ = '0.1.0'
