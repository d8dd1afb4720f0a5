#!/usr/bin/env python3
"""Model visualisation entry (reference ``tools/visualization.py``)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from focus_tpu.config.defaults import assert_and_infer_cfg
from focus_tpu.engine.visualizer import visualize
from focus_tpu.utils.parser import load_config, parse_args


def main():
    args = parse_args()
    cfg = load_config(args)
    cfg = assert_and_infer_cfg(cfg)
    visualize(cfg)


if __name__ == "__main__":
    main()
