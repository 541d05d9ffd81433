"""Config system + builder tests over the real shipped config corpus."""
import os

import pytest

from erd_tpu.config import Config, parse_cfg_options
from erd_tpu.apis import build_detector
from erd_tpu.models import ERDDetector, GFLDetector

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_base_composition(tmp_path):
    (tmp_path / 'base.py').write_text("a = 1\nd = dict(x=1, y=2)\n")
    (tmp_path / 'child.py').write_text(
        "_base_ = ['base.py']\nd = dict(y=3, z=4)\nb = 'hi'\n")
    cfg = Config.fromfile(str(tmp_path / 'child.py'))
    assert cfg.a == 1 and cfg.b == 'hi'
    assert cfg.d.x == 1 and cfg.d.y == 3 and cfg.d.z == 4


def test_delete_key(tmp_path):
    (tmp_path / 'base.py').write_text("d = dict(x=1, y=2)\n")
    (tmp_path / 'child.py').write_text(
        "_base_ = ['base.py']\nd = dict(_delete_=True, z=4)\n")
    cfg = Config.fromfile(str(tmp_path / 'child.py'))
    assert dict(cfg.d) == {'z': 4}


def test_cfg_options_override():
    cfg = Config._wrap(dict(optim=dict(lr=0.01), model=dict(depth=50)))
    cfg.merge_from_options(parse_cfg_options(
        ['optim.lr=0.02', 'model.depth=101', 'model.name=x',
         'optim.milestones=(8,11)']))
    assert cfg.optim.lr == 0.02
    assert cfg.model.depth == 101
    assert cfg.model.name == 'x'
    assert cfg.optim.milestones == (8, 11)


def test_shipped_stage1_config():
    cfg = Config.fromfile(os.path.join(
        REPO, 'configs/gfl_increment/gfl_r50_fpn_1x_coco_first_40_cats.py'))
    assert cfg.model.num_classes == 40
    assert cfg.model.test_cfg.nms_iou_threshold == 0.6
    assert cfg.train_cfg.epochs == 12
    assert cfg.optim.lr == 0.01
    assert 'first_40' in cfg.train_dataloader.dataset.ann_file
    det = build_detector(cfg.model)
    assert isinstance(det, GFLDetector)
    assert det.num_classes == 40


def test_shipped_stage2_config():
    cfg = Config.fromfile(os.path.join(
        REPO, 'configs/gfl_increment/'
              'gfl_r50_fpn_1x_coco_first_40_incre_last_40_cats.py'))
    assert cfg.model.type == 'GFLIncrementERD'
    assert cfg.model.ori_setting.ori_num_classes == 40
    assert cfg.model.erd.ld_T == 10
    det = build_detector(cfg.model, num_devices=4)
    assert isinstance(det, ERDDetector)
    assert det.erd.num_devices == 4
    assert det.teacher.num_classes == 40
    assert 'last_40' in cfg.train_dataloader.dataset.ann_file
    assert cfg.test_evaluator.classwise is True


def test_strict_options_catch_typos_and_types():
    import pytest
    cfg = Config._wrap(dict(optim=dict(lr=0.01, milestones=[8, 11]),
                            model=dict(depth=50)))
    # typo'd key fails fast, names the path, suggests the near miss
    with pytest.raises(KeyError, match=r"optim.lrr.*did you mean: lr"):
        cfg.merge_from_options(parse_cfg_options(['optim.lrr=0.1']),
                               strict=True)
    # unknown section
    with pytest.raises(KeyError, match="unknown section 'optm'"):
        cfg.merge_from_options(parse_cfg_options(['optm.lr=0.1']),
                               strict=True)
    # traversing a scalar
    with pytest.raises(TypeError, match="'optim.lr' is a float"):
        cfg.merge_from_options(parse_cfg_options(['optim.lr.x=1']),
                               strict=True)
    # incompatible value type
    with pytest.raises(TypeError, match="expects float"):
        cfg.merge_from_options(parse_cfg_options(['optim.lr=abc']),
                               strict=True)
    # compatible coercions + explicit new keys still work
    cfg.merge_from_options(parse_cfg_options(
        ['optim.lr=2', 'optim.milestones=(16,22)', '+model.new_flag=True']),
        strict=True)
    assert cfg.optim.lr == 2
    assert cfg.optim.milestones == (16, 22)
    assert cfg.model.new_flag is True
