"""Test config: force a virtual 8-device CPU platform BEFORE jax initializes.

Mirrors the multi-chip testing strategy from SURVEY.md section 2.10: sharding
logic is validated on a virtual CPU mesh; real-TPU execution is covered by
bench.py / the driver's dryrun.
"""
import os

os.environ['JAX_PLATFORMS'] = 'cpu'
_flags = os.environ.get('XLA_FLAGS', '')
if '--xla_force_host_platform_device_count' not in _flags:
    os.environ['XLA_FLAGS'] = (
        _flags + ' --xla_force_host_platform_device_count=8').strip()

# sitecustomize imports jax at interpreter startup with JAX_PLATFORMS=axon
# already frozen into jax.config, so the env var alone is ignored; force the
# config before any backend is created.
import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')

# Persistent XLA compilation cache: the suite is compile-bound (hundreds
# of model-family jits), and cached binaries cut repeat full-suite runs
# by an order of magnitude. Cross-process measured: 8.1s -> 1.3s on a
# representative conv stack.
_cache_dir = os.environ.get(
    'ERD_TPU_TEST_CACHE',
    os.path.join(os.path.expanduser('~'), '.cache', 'erd_tpu_xla_tests'))
os.makedirs(_cache_dir, exist_ok=True)
jax.config.update('jax_compilation_cache_dir', _cache_dir)
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
jax.config.update('jax_persistent_cache_min_entry_size_bytes', 0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(0)


def rand_boxes(rs, n, w=320, h=320, min_size=2.0):
    """Random well-formed xyxy boxes."""
    cx = rs.uniform(0, w, n)
    cy = rs.uniform(0, h, n)
    bw = rs.uniform(min_size, w / 3, n)
    bh = rs.uniform(min_size, h / 3, n)
    x1 = np.clip(cx - bw / 2, 0, w)
    y1 = np.clip(cy - bh / 2, 0, h)
    x2 = np.clip(cx + bw / 2, x1 + min_size, w)
    y2 = np.clip(cy + bh / 2, y1 + min_size, h)
    return np.stack([x1, y1, x2, y2], axis=-1).astype(np.float32)


# ---------------------------------------------------------------------------
# Suite tiering: modules that compile full detector assemblies are marked
# ``slow`` at collection time; ``pytest -m "not slow"`` is the <10-min CI
# fast tier (oracles, task modules, data, eval — nothing that jits a whole
# backbone+neck+head stack). One list here instead of 40 pytestmark edits.
# ---------------------------------------------------------------------------
_SLOW_MODULES = {
    'test_aux', 'test_backbone_swap', 'test_backbones_extra',
    'test_cascade_rcnn', 'test_centernet', 'test_cond_dab_detr',
    'test_config_corpus', 'test_deformable_detr', 'test_detr', 'test_dino',
    'test_e2e', 'test_e2e_map_sentinel', 'test_engine', 'test_erd',
    'test_fsaf_fovea', 'test_fsdp', 'test_ga_retina', 'test_mask_rcnn',
    'test_models', 'test_multistep_increment', 'test_neck_swap',
    'test_num_devices_detrap', 'test_paa', 'test_panoptic',
    'test_recall_eval', 'test_reppoints', 'test_retina_ghm_effnet',
    'test_retina_sepbn', 'test_rtmdet', 'test_soft_teacher', 'test_solov2',
    'test_ssd', 'test_sync_bn', 'test_tood', 'test_two_stage',
    'test_vfnet', 'test_voc_and_api', 'test_yolof', 'test_yolov3',
    'test_yolox', 'test_zoo_detectors', 'test_zoo_extra',
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        mod = item.module.__name__.rsplit('.', 1)[-1]
        if mod in _SLOW_MODULES:
            item.add_marker(pytest.mark.slow)
