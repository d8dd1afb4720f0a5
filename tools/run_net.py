#!/usr/bin/env python3
"""Train / test / visualize dispatch CLI.

Same surface as the reference entry point (reference ``tools/run_net.py:29-73``):
``python tools/run_net.py --cfg X.yaml [--exp_name N] [--shard_id i
--num_shards n --init_method addr] KEY VAL ...``.

On TPU there is no process spawn: one python process per host drives all
local chips through a jax Mesh, so ``launch_job`` is a direct call.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from focus_tpu.config.defaults import assert_and_infer_cfg
from focus_tpu.utils.parser import load_config, parse_args


def launch_job(cfg, init_method, func):
    """Single-process-per-host execution (multi-host init happens inside
    the engine via jax.distributed)."""
    return func(cfg)


def main():
    args = parse_args()
    cfg = load_config(args)
    cfg = assert_and_infer_cfg(cfg)

    cfg.EXP.NAME = args.exp_name
    cfg.EXP.PATH = os.path.join(cfg.OUTPUT_DIR, args.exp_name)

    if cfg.TRAIN.ENABLE:
        if cfg.TRAIN.METHOD == "sup":
            from focus_tpu.engine.trainer import train

            launch_job(cfg=cfg, init_method=args.init_method, func=train)
        elif cfg.TRAIN.METHOD == "slots":
            from focus_tpu.engine.slot_trainer import slot_train

            launch_job(cfg=cfg, init_method=args.init_method, func=slot_train)

    if cfg.TEST.ENABLE:
        if cfg.TEST.EVAL_TASK == "segmentation":
            from focus_tpu.engine.slot_trainer import slot_eval

            launch_job(cfg=cfg, init_method=args.init_method, func=slot_eval)
        elif cfg.TEST.EVAL_TASK == "ar":
            from focus_tpu.engine.tester import test

            launch_job(cfg=cfg, init_method=args.init_method, func=test)

    if cfg.TENSORBOARD.ENABLE and (
        cfg.TENSORBOARD.MODEL_VIS.ENABLE or cfg.TENSORBOARD.WRONG_PRED_VIS.ENABLE
    ):
        from focus_tpu.engine.visualizer import visualize

        launch_job(cfg=cfg, init_method=args.init_method, func=visualize)

    if cfg.DEMO.ENABLE:
        from focus_tpu.engine.demo import demo

        demo(cfg)


if __name__ == "__main__":
    main()
