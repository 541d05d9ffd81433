"""Corruption suite + robustness benchmark plumbing
(tools/analysis_tools/test_robustness.py, reference test_robustness.py +
robustness_eval.py analogue)."""
import os
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_tool():
    # import the CLI module by path: its filename (test_robustness.py)
    # would otherwise collide with pytest's own test-module namespace
    import importlib.util
    path = os.path.join(REPO, 'tools', 'analysis_tools',
                        'test_robustness.py')
    spec = importlib.util.spec_from_file_location('robustness_tool', path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope='module')
def img():
    rng = np.random.RandomState(0)
    base = rng.randint(0, 255, (60, 80, 3), np.uint8)
    # add structure so blur/contrast actually change something
    base[20:40, 30:60] = 220
    return base


def test_all_corruptions_contract(img):
    from erd_tpu.data.corruptions import CORRUPTIONS, corrupt
    for name in CORRUPTIONS:
        for sev in (1, 3, 5):
            out = corrupt(img, name, sev, seed=7)
            assert out.shape == img.shape, name
            assert out.dtype == np.uint8, name
            assert np.any(out != img), f'{name}@{sev} is identity'
        # determinism: same seed, same output
        a = corrupt(img, name, 3, seed=5)
        b = corrupt(img, name, 3, seed=5)
        np.testing.assert_array_equal(a, b)
    # severity 0 is identity
    np.testing.assert_array_equal(corrupt(img, 'fog', 0), img)


def test_severity_monotone_distortion(img):
    """Higher severity should (weakly) increase distortion for the
    deterministic photometric corruptions."""
    from erd_tpu.data.corruptions import corrupt
    for name in ('brightness', 'contrast', 'pixelate', 'gaussian_blur',
                 'jpeg_compression'):
        errs = [np.abs(corrupt(img, name, s).astype(np.float32) -
                       img.astype(np.float32)).mean() for s in (1, 5)]
        assert errs[1] >= errs[0] * 0.9, (name, errs)


def test_benchmark_list_resolves():
    tool = _load_tool()
    GROUPS, resolve_corruptions = tool.GROUPS, tool.resolve_corruptions
    from erd_tpu.data.corruptions import CORRUPTIONS
    names = resolve_corruptions(['benchmark'])
    assert len(names) == 15 and len(set(names)) == 15  # full benchmark set
    assert set(names) <= set(CORRUPTIONS)
    assert resolve_corruptions(['noise']) == list(GROUPS['noise'])
    assert resolve_corruptions(['fog', 'fog']) == ['fog']


def test_corrupt_pipeline_changes_eval_images(tmp_path):
    """CorruptPipeline decodes, corrupts, and hands the image to the base
    pipeline — the packed canvas must differ from the clean one."""
    sys.path.insert(0, os.path.join(REPO, 'tools'))
    import make_toy_dataset

    CorruptPipeline = _load_tool().CorruptPipeline
    from erd_tpu.data import CocoDataset, DetDataLoader, DetPipeline
    from erd_tpu.data.loader import LoaderConfig

    root = str(tmp_path)
    make_toy_dataset.main(root)
    ds = CocoDataset(os.path.join(root, 'annotations', 'val.json'),
                     img_prefix=os.path.join(root, 'val'))
    pipe = DetPipeline(scale=(64, 64), training=False)
    cfg = LoaderConfig(batch_size=2, num_workers=2, seed=0,
                       shuffle=False, drop_last=False)
    clean = next(iter(DetDataLoader(ds, pipe, cfg).epoch(0)))
    corrupted_loader = DetDataLoader(ds, pipe, cfg)
    corrupted_loader.pipeline = CorruptPipeline(pipe, 'gaussian_noise', 3)
    noisy = next(iter(corrupted_loader.epoch(0)))
    assert np.any(np.asarray(clean['images']) !=
                  np.asarray(noisy['images']))
    # geometry metadata untouched by the corruption
    np.testing.assert_array_equal(np.asarray(clean['meta'].img_shape),
                                  np.asarray(noisy['meta'].img_shape))
