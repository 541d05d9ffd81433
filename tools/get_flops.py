#!/usr/bin/env python
"""Report model FLOPs/params via XLA cost analysis (reference
tools/analysis_tools/get_flops.py analogue)."""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))


def main():
    p = argparse.ArgumentParser()
    p.add_argument('config')
    p.add_argument('--shape', type=int, nargs=2, default=[800, 1344])
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from erd_tpu.apis import build_detector
    from erd_tpu.config import Config

    cfg = Config.fromfile(args.config)
    det = build_detector(cfg.model)
    h, w = args.shape
    variables = det.init(jax.random.PRNGKey(0), image_shape=(h, w))
    n_params = sum(x.size for x in jax.tree.leaves(variables['params']))

    imgs = jnp.zeros((1, h, w, 3), jnp.uint8)
    lowered = jax.jit(det.forward_raw).lower(variables, imgs)
    cost = lowered.compile().cost_analysis()
    flops = cost.get('flops', float('nan')) if cost else float('nan')
    print(f'input: 1x{h}x{w}x3')
    print(f'params: {n_params / 1e6:.2f} M')
    print(f'forward flops: {flops / 1e9:.2f} GFLOPs')


if __name__ == '__main__':
    main()
