"""Prepare a checkpoint for release.

Mirror of /root/reference/tools/model_converters/publish_model.py: strip
training state (optimizer / schedules) from an orbax checkpoint, save the
pure parameter tree, and stamp the filename with the content hash.
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))
import argparse
import hashlib
import os
import pickle

import jax
import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument('in_ckpt', help='orbax checkpoint directory')
    p.add_argument('out_file', help='output .pkl (hash appended)')
    args = p.parse_args()

    from erd_tpu.engine.checkpoints import load_checkpoint_raw
    variables = load_checkpoint_raw(args.in_ckpt)
    # trainer checkpoints wrap variables under 'variables'/'params' keys
    if isinstance(variables, dict) and 'variables' in variables:
        variables = variables['variables']
    # keep only the inference collections
    keep = {k: v for k, v in variables.items()
            if k in ('params', 'batch_stats')}
    host = jax.tree.map(np.asarray, keep)
    blob = pickle.dumps(host)
    sha = hashlib.sha256(blob).hexdigest()[:8]
    root, ext = os.path.splitext(args.out_file)
    out = f'{root}-{sha}{ext or ".pkl"}'
    with open(out, 'wb') as f:
        f.write(blob)
    n_params = sum(int(np.prod(x.shape))
                   for x in jax.tree.leaves(host.get('params', {})))
    print(f'published {out} ({n_params / 1e6:.2f}M params, sha {sha})')


if __name__ == '__main__':
    main()
