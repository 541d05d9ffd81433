"""Print the fully composed config.

Mirror of /root/reference/tools/misc/print_config.py: resolve _base_
inheritance and --cfg-options overrides, pretty-print the result.
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))
import argparse
import json

from erd_tpu.config import Config, parse_cfg_options


def main():
    p = argparse.ArgumentParser()
    p.add_argument('config')
    p.add_argument('--cfg-options', nargs='+', default=[])
    args = p.parse_args()
    cfg = Config.fromfile(args.config)
    if args.cfg_options:
        cfg.merge_from_options(parse_cfg_options(args.cfg_options))
    print(json.dumps(cfg, indent=2, default=str))


if __name__ == '__main__':
    main()
