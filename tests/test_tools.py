"""CLI tool smoke tests (argument wiring; heavier flows live in
tools/sanity_overfit.py and the verify recipe)."""
import json
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_tool(args, timeout=120):
    env = dict(os.environ, JAX_PLATFORMS='cpu', PYTHONPATH=REPO)
    return subprocess.run([sys.executable] + args, capture_output=True,
                          text=True, timeout=timeout, cwd=REPO, env=env)


def test_select_categories(tmp_path):
    d = {
        'images': [{'id': 1, 'file_name': 'a.jpg', 'width': 10,
                    'height': 10}],
        'annotations': [
            {'id': 1, 'image_id': 1, 'category_id': 3,
             'bbox': [0, 0, 5, 5], 'area': 25, 'iscrowd': 0},
            {'id': 2, 'image_id': 1, 'category_id': 10,
             'bbox': [1, 1, 5, 5], 'area': 25, 'iscrowd': 0}],
        'categories': [{'id': i, 'name': f'c{i}'}
                       for i in (3, 5, 10, 12)],
    }
    ann = tmp_path / 'inst.json'
    ann.write_text(json.dumps(d))
    r = run_tool(['tools/select_categories.py', str(ann), '--split-at',
                  '2', '--total', '4'])
    assert r.returncode == 0, r.stderr
    first = json.loads((tmp_path / 'inst_sel_first_2_cats.json').read_text())
    last = json.loads((tmp_path / 'inst_sel_last_2_cats.json').read_text())
    assert [c['id'] for c in first['categories']] == [3, 5]
    assert [c['id'] for c in last['categories']] == [10, 12]
    assert len(first['annotations']) == 1
    assert len(last['annotations']) == 1


def test_analyze_logs(tmp_path):
    log = tmp_path / 'train.jsonl'
    rows = [dict(step=i, lr=0.01, iter_time=0.1, images_per_sec=80.0,
                 loss_cls=1.0 / (i + 1)) for i in range(1, 5)]
    log.write_text('\n'.join(json.dumps(r) for r in rows))
    r = run_tool(['tools/analyze_logs.py', 'cal_train_time', str(log)])
    assert r.returncode == 0, r.stderr
    assert '100.0 ms/iter' in r.stdout


def test_make_toy_dataset(tmp_path):
    r = run_tool(['tools/make_toy_dataset.py', str(tmp_path / 'toy')])
    assert r.returncode == 0, r.stderr
    ann = json.loads(
        (tmp_path / 'toy' / 'annotations' / 'train.json').read_text())
    assert len(ann['images']) == 16
    assert (tmp_path / 'toy' / 'toy_gfl.py').exists()
    assert (tmp_path / 'toy' / 'train' / '1.jpg').exists()
