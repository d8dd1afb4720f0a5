#!/usr/bin/env python3
"""Demo entry (reference ``tools/demo_net.py``)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from focus_tpu.config.defaults import assert_and_infer_cfg
from focus_tpu.engine.demo import demo
from focus_tpu.utils.parser import load_config, parse_args


def main():
    args = parse_args()
    cfg = load_config(args)
    cfg = assert_and_infer_cfg(cfg)
    demo(cfg)


if __name__ == "__main__":
    main()
