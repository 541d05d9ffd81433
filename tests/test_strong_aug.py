"""Strong-augmentation transforms (Mosaic/MixUp/affine/crops/color).

VERDICT r1 missing #4: without these the YOLOX/RTMDet/SSD families can't
train their canonical recipes. Geometry is checked with solid-color
source images whose boxes must keep pointing at their color after the
transform.
"""
import numpy as np
import pytest

from erd_tpu.data.strong_aug import (Expand, MinIoURandomCrop, MixUp, Mosaic,
                                     PhotoMetricDistortion, RandomAffine,
                                     RandomCrop, Sample, YOLOXHSVRandomAug)


def solid(color, h=80, w=120, box=(20, 20, 60, 50), label=0):
    img = np.full((h, w, 3), color, np.uint8)
    return Sample(img=img,
                  boxes=np.asarray([box], np.float32),
                  labels=np.asarray([label], np.int32),
                  ignore=np.asarray([False]))


def test_mosaic_composites_four_images():
    rs = np.random.RandomState(0)
    colors = [40, 90, 140, 190]
    base = solid(colors[0], label=0)
    pool = [solid(c, label=i + 1) for i, c in enumerate(colors[1:])]
    it = iter(pool)
    out = Mosaic(img_scale=(64, 64))(base, rs, lambda r: next(it))
    assert out.img.shape == (128, 128, 3)
    # all four source colors appear
    present = set(np.unique(out.img))
    for c in colors:
        assert c in present, c
    # every box points at pixels of its source color
    for b, lab in zip(out.boxes, out.labels):
        cx, cy = int((b[0] + b[2]) / 2), int((b[1] + b[3]) / 2)
        assert out.img[cy, cx, 0] == colors[lab], (b, lab)
    assert (out.boxes[:, 0::2] <= 128).all() and \
        (out.boxes[:, 1::2] <= 128).all()
    assert (out.boxes >= 0).all()


def test_mosaic_prob_zero_is_identity():
    rs = np.random.RandomState(0)
    base = solid(50)
    out = Mosaic(prob=0.0)(base, rs, lambda r: solid(100))
    np.testing.assert_array_equal(out.img, base.img)


def test_mixup_blends_and_merges_boxes():
    rs = np.random.RandomState(3)
    a = solid(200, h=64, w=64, box=(8, 8, 40, 40), label=0)
    b = solid(0, h=64, w=64, box=(8, 8, 56, 56), label=1)
    out = MixUp(img_scale=(64, 64), ratio_range=(1.0, 1.0),
                flip_ratio=1.0)(a, rs, lambda r: b)
    # 0.5 blend where the second image covers: values near 100
    assert abs(int(out.img[32, 32, 0]) - 100) <= 2
    assert len(out.boxes) == 2
    assert set(out.labels.tolist()) == {0, 1}


def test_mixup_skips_empty_gt_partner():
    rs = np.random.RandomState(0)
    a = solid(10)
    empty = Sample(img=np.zeros((32, 32, 3), np.uint8),
                   boxes=np.zeros((0, 4), np.float32),
                   labels=np.zeros((0,), np.int32),
                   ignore=np.zeros((0,), bool))
    out = MixUp(max_iters=3)(a, rs, lambda r: empty)
    np.testing.assert_array_equal(out.img, a.img)


def test_cached_mosaic_warms_up_then_composites():
    """CachedMosaic passes samples through until the cache holds > 4,
    then composites from the cache (reference CachedMosaic)."""
    from erd_tpu.data.strong_aug import CachedMosaic
    rs = np.random.RandomState(0)
    t = CachedMosaic(img_scale=(64, 64), max_cached_images=10)
    outs = [t(solid(30 + 10 * i, label=i), rs) for i in range(8)]
    # first 4 calls: cache <= 4, identity
    for i in range(4):
        assert outs[i].img.shape == (80, 120, 3)
    # later calls composite onto the 2x canvas
    assert outs[7].img.shape == (128, 128, 3)
    assert len(t._cache) == 8


def test_cached_mosaic_cache_bounded():
    from erd_tpu.data.strong_aug import CachedMosaic
    rs = np.random.RandomState(1)
    t = CachedMosaic(img_scale=(64, 64), max_cached_images=5)
    for i in range(20):
        t(solid(40, label=0), rs)
    assert len(t._cache) <= 5


def test_cached_mixup_blends_from_cache():
    from erd_tpu.data.strong_aug import CachedMixUp
    rs = np.random.RandomState(2)
    t = CachedMixUp(img_scale=(64, 64), ratio_range=(1.0, 1.0),
                    flip_ratio=1.0, max_cached_images=8)
    a = solid(200, h=64, w=64, box=(8, 8, 40, 40), label=0)
    out1 = t(a, rs)
    np.testing.assert_array_equal(out1.img, a.img)  # cache <= 1
    b = solid(0, h=64, w=64, box=(8, 8, 56, 56), label=1)
    out2 = t(b, rs)
    # partner comes from the cache (a or b); blended pixels
    assert out2.img.shape == (64, 64, 3)
    assert len(t._cache) == 2


def test_random_affine_identity():
    rs = np.random.RandomState(0)
    s = solid(77)
    out = RandomAffine(max_rotate_degree=0, max_translate_ratio=0,
                       scaling_ratio_range=(1.0, 1.0),
                       max_shear_degree=0)(s, rs)
    np.testing.assert_allclose(out.boxes, s.boxes, atol=1e-3)
    np.testing.assert_array_equal(out.img, s.img)


def test_random_affine_scale_halves_boxes():
    rs = np.random.RandomState(0)
    s = solid(77, box=(20, 20, 60, 48))
    out = RandomAffine(max_rotate_degree=0, max_translate_ratio=0,
                       scaling_ratio_range=(0.5, 0.5),
                       max_shear_degree=0)(s, rs)
    np.testing.assert_allclose(out.boxes, s.boxes / 2, atol=1e-3)


def test_random_affine_negative_border_shrinks_canvas():
    """The YOLOX recipe uses border=(-s/2, -s/2) to crop the 2x mosaic."""
    rs = np.random.RandomState(0)
    s = solid(77, h=128, w=128, box=(10, 10, 50, 50))
    out = RandomAffine(max_rotate_degree=0, max_translate_ratio=0,
                       scaling_ratio_range=(1.0, 1.0), max_shear_degree=0,
                       border=(-32, -32))(s, rs)
    assert out.img.shape[:2] == (64, 64)


def test_random_crop_translates_and_clips():
    rs = np.random.RandomState(1)
    s = solid(77, h=80, w=120, box=(20, 20, 60, 50))
    out = RandomCrop(crop_size=(64, 48))(s, rs)  # (w, h)
    assert out.img.shape[:2] == (48, 64)
    assert len(out.boxes) <= 1
    if len(out.boxes):
        b = out.boxes[0]
        assert 0 <= b[0] < b[2] <= 64 and 0 <= b[1] < b[3] <= 48


def test_random_crop_keeps_sample_when_all_boxes_lost():
    rs = np.random.RandomState(0)
    s = solid(77, h=100, w=100, box=(90, 90, 99, 99))
    out = RandomCrop(crop_size=(10, 10))(s, rs)
    # either crop kept the box or the original sample was returned
    assert len(out.boxes) == 1


def test_expand_translates_boxes():
    rs = np.random.RandomState(0)
    s = solid(77, h=50, w=60, box=(10, 10, 30, 30))
    out = Expand(ratio_range=(2.0, 2.0), prob=1.0)(s, rs)
    assert out.img.shape[:2] == (100, 120)
    b = out.boxes[0]
    # box size preserved, shifted by the paste offset
    np.testing.assert_allclose([b[2] - b[0], b[3] - b[1]], [20, 20])
    cx, cy = int((b[0] + b[2]) / 2), int((b[1] + b[3]) / 2)
    assert out.img[cy, cx, 0] == 77


def test_min_iou_random_crop_centers_kept():
    rs = np.random.RandomState(0)
    s = solid(77, h=100, w=100, box=(40, 40, 60, 60))
    out = MinIoURandomCrop()(s, rs)
    # the kept boxes' centers must lie inside the new image
    for b in out.boxes:
        cx, cy = (b[0] + b[2]) / 2, (b[1] + b[3]) / 2
        assert 0 <= cx <= out.img.shape[1]
        assert 0 <= cy <= out.img.shape[0]
    assert len(out.boxes) >= 1  # single centered gt survives any mode


def test_photometric_and_hsv_keep_shape_and_boxes():
    rs = np.random.RandomState(0)
    s = solid(127)
    for t in (PhotoMetricDistortion(), YOLOXHSVRandomAug()):
        out = t(s, rs)
        assert out.img.shape == s.img.shape
        assert out.img.dtype == np.uint8
        np.testing.assert_array_equal(out.boxes, s.boxes)


def test_photometric_identity_distribution():
    """With a fixed rng the distortion is deterministic; across seeds the
    mean brightness must actually move (the aug does something)."""
    s = solid(127)
    outs = [PhotoMetricDistortion()(s, np.random.RandomState(i)).img.mean()
            for i in range(8)]
    assert len({round(float(o), 3) for o in outs}) > 3


def test_aug_pipeline_end_to_end(tmp_path):
    """AugPipeline: mosaic+affine+mixup+hsv -> static canvas + GTInstances."""
    from erd_tpu.data.transforms import AugPipeline

    class FakeDS:
        def __len__(self):
            return 4

        def __getitem__(self, i):
            class R:
                img_id = i
                path = ''
                bboxes = np.asarray([[8., 8., 40., 40.]], np.float32)
                labels = np.asarray([i % 3], np.int32)
                ignore = np.asarray([False])
                polygons = None
            return R()

    ds = FakeDS()
    pipe = AugPipeline(
        scale=(64, 64), flip_prob=0.5, max_gt=20,
        transforms=(Mosaic(img_scale=(64, 64)),
                    RandomAffine(border=(-32, -32),
                                 scaling_ratio_range=(0.5, 1.5)),
                    MixUp(img_scale=(64, 64)),
                    YOLOXHSVRandomAug()),
        dataset=ds)
    # patch image loading: FakeDS records have no file on disk
    pipe._load_sample = lambda record, image=None: __import__(
        'erd_tpu.data.strong_aug', fromlist=['Sample']).Sample(
        img=np.full((48, 48, 3), 30 * (record.img_id + 1), np.uint8),
        boxes=record.bboxes.copy(), labels=record.labels.copy(),
        ignore=record.ignore.copy())

    canvas, gt, meta = pipe(ds[0], np.random.RandomState(0))
    assert canvas.shape == (64, 64, 3)
    assert gt.bboxes.shape == (20, 4)
    assert int(np.asarray(meta.img_id)) == 0
    n = int(np.asarray(gt.mask).sum())
    assert n >= 1
    b = np.asarray(gt.bboxes)[np.asarray(gt.mask)]
    assert (b[:, 0::2] <= 64).all() and (b >= 0).all()
    # determinism
    canvas2, gt2, _ = pipe(ds[0], np.random.RandomState(0))
    np.testing.assert_array_equal(canvas, canvas2)


def test_build_loader_strong_aug_and_pipeline_switch(tmp_path):
    """Config-driven strong-aug loader (YOLOX recipe) + PipelineSwitchHook:
    batches flow with mosaic/mixup on, and the hook swaps to the weak
    pipeline at the switch epoch."""
    import sys
    sys.path.insert(0, 'tools')
    import make_toy_dataset
    root = str(tmp_path / 'toy')
    make_toy_dataset.main(root)

    from erd_tpu.apis.build import build_dataset, build_loader, build_hook
    from erd_tpu.config import Config
    from erd_tpu.data.transforms import AugPipeline, DetPipeline

    loader_cfg = Config._wrap({
        'batch_size': 2, 'num_workers': 2, 'seed': 0,
        'dataset': {'ann_file': 'annotations/train.json',
                    'img_prefix': 'train/', 'min_size': 8},
        'pipeline': {'scale': (64, 64), 'max_gt': 24, 'strong_aug': [
            {'type': 'Mosaic', 'img_scale': (64, 64)},
            {'type': 'RandomAffine', 'scaling_ratio_range': (0.5, 1.5),
             'border': (-32, -32)},
            {'type': 'MixUp', 'img_scale': (64, 64)},
            {'type': 'YOLOXHSVRandomAug'},
        ]}})
    ds = build_dataset(None, loader_cfg, data_root=root + '/')
    loader = build_loader(ds, loader_cfg, training=True)
    assert isinstance(loader.pipeline, AugPipeline)
    batches = list(loader.epoch(0))
    assert len(batches) >= 1
    for b in batches:
        assert b['images'].shape[1:] == (64, 64, 3)
        assert int(np.asarray(b['gt'].mask).sum()) > 0

    # pipeline switch: YOLOX strong->weak
    hook = build_hook({'type': 'PipelineSwitchHook', 'switch_epoch': 2,
                       'pipeline': {'scale': (64, 64)}}, loader)

    class T:
        pass

    trainer = T()
    trainer.loader = loader
    hook.before_epoch(trainer, 1)
    assert isinstance(trainer.loader.pipeline, AugPipeline)  # not yet
    hook.before_epoch(trainer, 2)  # new pipeline active FOR epoch 2
    assert type(trainer.loader.pipeline) is DetPipeline  # switched
    # weak pipeline still produces valid batches
    batches = list(loader.epoch(2))
    assert batches and batches[0]['images'].shape[1:] == (64, 64, 3)


def test_instaboost_normal_action():
    """InstaBoost 'normal' action (instaboost.py wrapping arXiv
    1908.07801): instances jittered in place, background inpainted,
    boxes/masks updated consistently; aug_ratio=0 is identity."""
    import numpy as np
    from erd_tpu.data.strong_aug import InstaBoost, Sample
    rs = np.random.RandomState(3)
    img = np.full((64, 96, 3), 120, np.uint8)
    img[20:40, 30:60] = (200, 40, 40)
    full = np.ones((56, 56), np.float32)
    s = Sample(img=img,
               boxes=np.asarray([[30, 20, 60, 40]], np.float32),
               labels=np.asarray([1], np.int32),
               ignore=np.zeros(1, bool), masks=[full])
    out = InstaBoost(aug_ratio=1.0)(s, rs)
    assert len(out.boxes) == 1 and len(out.masks) == 1
    # instance stays near its origin (shift bounded by w/15, h/15 + scale)
    assert abs(out.boxes[0][0] - 30) < 12 and abs(out.boxes[0][1] - 20) < 10
    assert out.masks[0].shape == (56, 56)
    # identity when the ratio gate does not fire
    same = InstaBoost(aug_ratio=0.0)(s, np.random.RandomState(0))
    assert same is s


def test_aug_pipeline_carries_masks_through_copypaste(tmp_path):
    """Mask-aware AugPipeline: polygons -> Sample.masks -> CopyPaste ->
    GTInstances.masks, boxes and crops aligned."""
    import cv2
    import numpy as np
    from erd_tpu.data.strong_aug import CopyPaste
    from erd_tpu.data.transforms import AugPipeline, ImageRecord

    src_path = str(tmp_path / 'src.jpg')
    cv2.imwrite(src_path, np.full((64, 96, 3), 90, np.uint8))

    class DS:
        def __init__(self):
            self.rec = ImageRecord(
                img_id=1, path=src_path, width=96, height=64,
                bboxes=np.asarray([[10., 10., 50., 40.]], np.float32),
                labels=np.asarray([0], np.int32),
                ignore=np.zeros(1, bool),
                polygons=[[np.asarray([10, 10, 50, 10, 50, 40, 10, 40],
                                      np.float32)]])

        def __len__(self):
            return 4

        def __getitem__(self, i):
            return self.rec

    ds = DS()
    pipe = AugPipeline(scale=(96, 64), max_gt=8, flip_prob=0.0,
                       transforms=(CopyPaste(),), dataset=ds)
    img = np.full((64, 96, 3), 90, np.uint8)
    canvas, gt, meta = pipe(ds.rec, np.random.RandomState(0), image=img)
    assert gt.masks is not None
    assert gt.mask.sum() >= 1  # at least one instance survives
