#!/usr/bin/env python3
"""Standalone multi-view testing entry (reference ``tools/test_net.py``)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from focus_tpu.config.defaults import assert_and_infer_cfg
from focus_tpu.engine.tester import test
from focus_tpu.utils.parser import load_config, parse_args


def main():
    args = parse_args()
    cfg = load_config(args)
    cfg = assert_and_infer_cfg(cfg)
    cfg.EXP.NAME = args.exp_name
    cfg.EXP.PATH = os.path.join(cfg.OUTPUT_DIR, args.exp_name)
    test(cfg)


if __name__ == "__main__":
    main()
