"""Engine tests: schedule math, SGD parity with torch, frozen masking, and an
end-to-end data-parallel training smoke on the 8-device CPU mesh."""
import os

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest
import torch

from erd_tpu.data import DetDataLoader, DetPipeline, LoaderConfig
from erd_tpu.data.coco import ImageRecord
from erd_tpu.engine import (Hook, Trainer, TrainerConfig, auto_scale_lr,
                            sgd_optimizer, warmup_multistep)
from erd_tpu.models import GFLDetector
from erd_tpu.parallel import make_mesh


def test_schedule_values():
    s = warmup_multistep(0.01, warmup_iters=500, warmup_factor=0.001,
                         milestones_steps=(1000, 2000), gamma=0.1)
    np.testing.assert_allclose(float(s(0)), 0.01 * 0.001, rtol=1e-6)
    np.testing.assert_allclose(float(s(250)), 0.01 * 0.5005, rtol=1e-5)
    np.testing.assert_allclose(float(s(500)), 0.01, rtol=1e-6)
    np.testing.assert_allclose(float(s(1500)), 0.001, rtol=1e-6)
    np.testing.assert_allclose(float(s(2500)), 0.0001, rtol=1e-6)
    assert auto_scale_lr(0.01, 8) == pytest.approx(0.005)


def test_warmup_cosine_schedule():
    """YOLOX/RTMDet recipe: (quadratic) warmup -> flat -> cosine -> floor."""
    from erd_tpu.engine.schedules import warmup_cosine
    base, floor = 0.01, 0.01 * 0.05
    s = warmup_cosine(base, warmup_iters=100, cosine_begin_step=500,
                      cosine_end_step=1500, min_lr_ratio=0.05,
                      quadratic_warmup=True)
    np.testing.assert_allclose(float(s(50)), base * 0.25, rtol=1e-6)
    np.testing.assert_allclose(float(s(100)), base, rtol=1e-6)
    np.testing.assert_allclose(float(s(300)), base, rtol=1e-6)  # flat
    np.testing.assert_allclose(float(s(1000)), (base + floor) / 2,
                               rtol=1e-6)  # cosine midpoint
    np.testing.assert_allclose(float(s(1500)), floor, rtol=1e-6)
    np.testing.assert_allclose(float(s(9999)), floor, rtol=1e-6)  # last
    # linear-warmup variant (RTMDet)
    s2 = warmup_cosine(base, warmup_iters=100, warmup_factor=1e-5,
                       cosine_begin_step=100, cosine_end_step=200)
    np.testing.assert_allclose(float(s2(0)), base * 1e-5, rtol=1e-5)
    np.testing.assert_allclose(float(s2(200)), floor, rtol=1e-6)


def test_sgd_matches_torch():
    rs = np.random.RandomState(0)
    w0 = rs.randn(4, 3).astype(np.float32)
    tx = sgd_optimizer(lambda c: 0.1, momentum=0.9, weight_decay=1e-2,
                       frozen_stages=-1)
    params = {'w': jnp.asarray(w0)}
    state = tx.init(params)

    tw = torch.nn.Parameter(torch.as_tensor(w0.copy()))
    topt = torch.optim.SGD([tw], lr=0.1, momentum=0.9, weight_decay=1e-2)

    for i in range(5):
        g = rs.randn(4, 3).astype(np.float32)
        upd, state = tx.update({'w': jnp.asarray(g)}, state, params)
        params = jax.tree.map(lambda p, u: p + u, params, upd)
        topt.zero_grad()
        tw.grad = torch.as_tensor(g.copy())
        topt.step()
    np.testing.assert_allclose(np.asarray(params['w']),
                               tw.detach().numpy(), rtol=1e-5, atol=1e-6)


def test_frozen_stage_masking():
    params = {
        'backbone': {
            'stem_conv': {'kernel': jnp.ones((3, 3))},
            'layer1_block0': {'conv1': {'kernel': jnp.ones((3, 3))}},
            'layer2_block0': {'conv1': {'kernel': jnp.ones((3, 3))}},
        },
        'bbox_head': {'gfl_cls': {'kernel': jnp.ones((3, 3))}},
    }
    tx = sgd_optimizer(lambda c: 0.1, frozen_stages=1)
    state = tx.init(params)
    grads = jax.tree.map(jnp.ones_like, params)
    upd, _ = tx.update(grads, state, params)
    assert float(jnp.abs(upd['backbone']['stem_conv']['kernel']).sum()) == 0
    assert float(jnp.abs(
        upd['backbone']['layer1_block0']['conv1']['kernel']).sum()) == 0
    assert float(jnp.abs(
        upd['backbone']['layer2_block0']['conv1']['kernel']).sum()) > 0
    assert float(jnp.abs(upd['bbox_head']['gfl_cls']['kernel']).sum()) > 0


class SyntheticDataset:
    """In-memory dataset of blank images with one box each."""

    def __init__(self, n=16, w=96, h=64):
        self.records = [
            ImageRecord(img_id=i, path='', width=w, height=h,
                        bboxes=np.asarray([[8., 8., 56., 48.]], np.float32),
                        labels=np.asarray([i % 3], np.int32),
                        ignore=np.zeros(1, bool))
            for i in range(n)
        ]

    def __len__(self):
        return len(self.records)

    def __getitem__(self, i):
        return self.records[i]


class BlankPipe(DetPipeline):

    def __call__(self, record, rng=None, image=None):
        img = np.full((record.height, record.width, 3), 100, np.uint8)
        return super().__call__(record, rng, image=img)


def test_trainer_e2e_8dev_mesh():
    assert jax.device_count() == 8
    det = GFLDetector(num_classes=3, depth=18)
    variables = det.init(jax.random.PRNGKey(0), image_shape=(64, 96))
    ds = SyntheticDataset()
    loader = DetDataLoader(ds, BlankPipe(scale=(96, 64), max_gt=8),
                           LoaderConfig(batch_size=8, seed=0))
    cfg = TrainerConfig(epochs=2, base_lr=0.02, warmup_iters=2,
                        milestones_epochs=(), log_interval=1,
                        frozen_stages=-1)
    mesh = make_mesh()
    tr = Trainer(det, loader, cfg, mesh=mesh)

    seen = []

    class Capture(Hook):
        def after_iter(self, t, step, losses):
            seen.append(sum(losses.values()))

    tr.hooks = [Capture()]
    out = tr.fit(variables)
    assert len(seen) == 2 * loader.steps_per_epoch(0)
    assert np.isfinite(seen).all()
    # same data every step; loss should drop
    assert seen[-1] < seen[0]
    assert 'params' in out


def test_adamw_matches_torch():
    rs = np.random.RandomState(1)
    w0 = rs.randn(4, 3).astype(np.float32)
    from erd_tpu.engine import adamw_optimizer
    tx = adamw_optimizer(lambda c: 0.01, weight_decay=0.05)
    params = {'w': jnp.asarray(w0)}
    state = tx.init(params)
    tw = torch.nn.Parameter(torch.as_tensor(w0.copy()))
    topt = torch.optim.AdamW([tw], lr=0.01, weight_decay=0.05)
    for i in range(5):
        g = rs.randn(4, 3).astype(np.float32)
        upd, state = tx.update({'w': jnp.asarray(g)}, state, params)
        params = jax.tree.map(lambda p, u: p + u, params, upd)
        topt.zero_grad()
        tw.grad = torch.as_tensor(g.copy())
        topt.step()
    np.testing.assert_allclose(np.asarray(params['w']),
                               tw.detach().numpy(), rtol=1e-3, atol=1e-5)


def test_grad_accumulation():
    from erd_tpu.engine import sgd_optimizer
    tx1 = sgd_optimizer(lambda c: 0.1, momentum=0.0, weight_decay=0.0,
                        frozen_stages=-1)
    tx2 = sgd_optimizer(lambda c: 0.1, momentum=0.0, weight_decay=0.0,
                        frozen_stages=-1, accumulate_steps=2)
    p = {'w': jnp.ones((3,))}
    s1 = tx1.init(p)
    s2 = tx2.init(p)
    g1 = {'w': jnp.asarray([1.0, 2.0, 3.0])}
    g2 = {'w': jnp.asarray([3.0, 2.0, 1.0])}
    # accumulated: nothing on first micro-step, mean grad applied on second
    u, s2 = tx2.update(g1, s2, p)
    assert float(jnp.abs(u['w']).sum()) == 0
    u, s2 = tx2.update(g2, s2, p)
    mean_g = {'w': (g1['w'] + g2['w']) / 2}
    want, _ = tx1.update(mean_g, s1, p)
    np.testing.assert_allclose(np.asarray(u['w']), np.asarray(want['w']),
                               rtol=1e-6)


def test_layer_decay_adamw():
    from erd_tpu.engine import layer_decay_adamw, swin_layer_id
    num_layers = 12
    tx = layer_decay_adamw(lambda c: 0.1, num_layers=num_layers,
                           decay_rate=0.5, weight_decay=0.0)
    params = {
        'backbone': {
            'patch_embed': {'kernel': jnp.ones((2, 2, 3, 4))},
            'stage0_block0': {'w': jnp.ones((4, 4))},
            'stage3_block1': {'w': jnp.ones((4, 4))},
        },
        'bbox_head': {'w': jnp.ones((4, 4))},
    }
    state = tx.init(params)
    grads = jax.tree.map(jnp.ones_like, params)
    u, _ = tx.update(grads, state, params)
    # head gets full LR; embeddings get decay^(L+1); deeper blocks decay less
    head = float(jnp.abs(u['bbox_head']['w']).mean())
    embed = float(jnp.abs(u['backbone']['patch_embed']['kernel']).mean())
    blk0 = float(jnp.abs(u['backbone']['stage0_block0']['w']).mean())
    blk_last = float(jnp.abs(u['backbone']['stage3_block1']['w']).mean())
    assert embed < blk0 < blk_last <= head
    assert embed == pytest.approx(head * 0.5 ** (num_layers + 1), rel=1e-4)
    # layer-id sanity against the swin depth table
    assert swin_layer_id(('backbone', 'patch_embed'), num_layers) == 0
    assert swin_layer_id(('backbone', 'stage0_block0', 'w'), num_layers) == 1
    assert swin_layer_id(('backbone', 'stage3_block1', 'w'),
                         num_layers) == num_layers
    assert swin_layer_id(('bbox_head', 'w'), num_layers) == num_layers + 1


def test_layer_decay_no_decay_for_1d_params():
    from erd_tpu.engine import layer_decay_adamw
    tx = layer_decay_adamw(lambda c: 1.0, num_layers=2, decay_rate=1.0,
                           weight_decay=0.5)
    params = {'w': jnp.full((3, 3), 2.0), 'bias': jnp.full((3,), 2.0)}
    state = tx.init(params)
    grads = jax.tree.map(jnp.zeros_like, params)
    u, _ = tx.update(grads, state, params)
    # zero grads kill the adam term, so only the decoupled weight-decay
    # term remains: present for the 2-D kernel, absent for the 1-D bias
    assert float(jnp.abs(u['w']).sum()) > 0
    assert float(jnp.abs(u['bias']).sum()) == 0


def test_tensorboard_logger_hook(tmp_path):
    """TensorboardLoggerHook writes TF event files with train scalars at
    ``interval`` and val metrics via after_val (the vis_backends analogue
    of the reference default_runtime's TensorboardVisBackend)."""
    from erd_tpu.engine import TensorboardLoggerHook

    class T:  # trainer stub: the hook only reads these two members
        global_batch_size = 8

        def current_lr(self, step):
            return 0.01

    hook = TensorboardLoggerHook(str(tmp_path), interval=2, window=4)
    hook.before_train(T())
    for step in range(4):
        hook.after_iter(T(), step, {'loss_cls': 1.0 - 0.1 * step,
                                    'loss_bbox': 0.5})
    hook.after_val(T(), 0, {'bbox_mAP': 0.31, 'bbox_mAP_50': 0.52,
                            'classwise': 'skip-me'})
    files = [f for f in os.listdir(tmp_path)
             if f.startswith('events.out.tfevents')]
    assert files, list(os.listdir(tmp_path))

    # round-trip the scalars through the event file
    from tensorboard.backend.event_processing.event_accumulator import \
        EventAccumulator
    acc = EventAccumulator(str(tmp_path))
    acc.Reload()
    tags = set(acc.Tags()['scalars'])
    assert {'train/loss_cls', 'train/loss_bbox', 'train/lr',
            'train/images_per_sec', 'val/bbox_mAP'} <= tags
    assert abs(acc.Scalars('val/bbox_mAP')[0].value - 0.31) < 1e-6
