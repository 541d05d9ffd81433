#!/usr/bin/env python
"""Training launcher (reference tools/train.py analogue).

Single-controller SPMD: one process drives all local TPU chips through the
data mesh — no torch.distributed.launch / dist_train.sh equivalent is needed.

Usage:
    python tools/train.py configs/gfl_increment/gfl_r50_fpn_1x_coco_first_40_cats.py \
        --work-dir work_dirs/gfl_first_40 --cfg-options optim.lr=0.005
"""
import argparse
import logging
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))


def parse_args():
    p = argparse.ArgumentParser(description='Train a detector')
    p.add_argument('config')
    p.add_argument('--work-dir', default=None)
    p.add_argument('--resume', action='store_true')
    p.add_argument('--seed', type=int, default=0)
    p.add_argument('--cfg-options', nargs='+', default=[],
                   help='dotted overrides: key.subkey=value')
    p.add_argument('--no-validate', action='store_true')
    return p.parse_args()


def main():
    args = parse_args()
    logging.basicConfig(level=logging.INFO,
                        format='%(asctime)s %(levelname)s %(message)s')
    import jax

    from erd_tpu.apis import (build_dataset, build_detector, build_loader,
                              build_metric, build_trainer)
    from erd_tpu.config import Config, parse_cfg_options
    from erd_tpu.engine import run_evaluation
    from erd_tpu.parallel import make_mesh

    cfg = Config.fromfile(args.config)
    cfg.merge_from_options(parse_cfg_options(args.cfg_options),
                           strict=True)
    if args.work_dir:
        cfg.work_dir = args.work_dir
    cfg.setdefault('experiment',
                   os.path.splitext(os.path.basename(args.config))[0])

    n_dev = jax.device_count()
    mesh = make_mesh()
    logging.info(f'devices: {jax.devices()}')

    detector = build_detector(cfg.model, num_devices=n_dev)
    data_root = cfg.get('data_root', '')
    train_ds = build_dataset(cfg, cfg.train_dataloader, data_root)
    train_loader = build_loader(train_ds, cfg.train_dataloader,
                                training=True, seed=args.seed)
    logging.info(f'train dataset: {len(train_ds)} images, '
                 f'{train_loader.steps_per_epoch(0)} steps/epoch')

    teacher_variables = None
    if cfg.model.get('type') == 'GFLIncrementERD':
        from erd_tpu.apis import init_detector, load_weights
        ori = cfg.model.ori_setting
        t_det, t_vars, _ = init_detector(
            os.path.join(os.path.dirname(args.config), '..', '..',
                         ori.ori_config_file)
            if not os.path.isabs(ori.ori_config_file) and
            not os.path.exists(ori.ori_config_file)
            else ori.ori_config_file,
            seed=args.seed)
        teacher_variables = load_weights(t_det, t_vars,
                                         ori.ori_checkpoint_file)
        variables = detector.init_student_from_teacher(
            jax.random.PRNGKey(args.seed), teacher_variables)
        logging.info(f'teacher loaded from {ori.ori_checkpoint_file}; '
                     'student widened from teacher')
    else:
        variables = detector.init(jax.random.PRNGKey(args.seed))
        pre = cfg.model.get('pretrained_backbone')
        if pre:
            import torch

            from erd_tpu.models.weight_import import load_torchvision_resnet
            sd = torch.load(pre, map_location='cpu', weights_only=False)
            sd = {k: v.numpy() for k, v in sd.items()}
            variables, n = load_torchvision_resnet(variables, sd)
            logging.info(f'loaded {n} pretrained backbone tensors from {pre}')

    val_fn = None
    if not args.no_validate:
        val_ds = build_dataset(cfg, cfg.val_dataloader, data_root,
                               test_mode=True)
        val_loader = build_loader(val_ds, cfg.val_dataloader, training=False)

        def val_fn(variables):
            metric = build_metric(val_ds, cfg.get('val_evaluator', {}))
            return run_evaluation(detector, variables, val_loader, metric)

    trainer = build_trainer(cfg, detector, train_loader, num_devices=n_dev,
                            teacher_variables=teacher_variables, mesh=mesh,
                            val_fn=val_fn)
    trainer.fit(variables, resume=args.resume or cfg.get('resume', False))


if __name__ == '__main__':
    main()
