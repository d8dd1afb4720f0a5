#!/usr/bin/env python3
"""Data-loading benchmark entry (reference ``tools/benchmark.py``)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from focus_tpu.config.defaults import assert_and_infer_cfg
from focus_tpu.utils.benchmark import benchmark_data_loading
from focus_tpu.utils.parser import load_config, parse_args


def main():
    args = parse_args()
    cfg = load_config(args)
    cfg = assert_and_infer_cfg(cfg)
    benchmark_data_loading(cfg)


if __name__ == "__main__":
    main()
