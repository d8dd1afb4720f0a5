"""Process-zero-gated logging and json stat lines.

Mirrors the reference surface (reference ``slowfast/utils/logging.py:19-99``):
``setup_logging(output_dir)`` installs a stdout + file handler on process 0
and silences other processes; ``log_json_stats(stats)`` emits one compact
json line per call for machine-readable training logs.
"""

from __future__ import annotations

import builtins
import decimal
import functools
import json
import logging
import os
import sys

import jax


def is_master_process() -> bool:
    return jax.process_index() == 0


@functools.lru_cache(maxsize=None)
def _suppress_print() -> None:
    def print_none(*objects, sep=" ", end="\n", file=sys.stdout, flush=False):
        pass

    builtins.print = print_none


@functools.lru_cache(maxsize=None)
def setup_logging(output_dir: str | None = None) -> None:
    """Configure the root 'focus_tpu' logger. Call once per process."""
    logger = logging.getLogger("focus_tpu")
    logger.setLevel(logging.DEBUG)
    logger.propagate = False
    logger.handlers.clear()
    fmt = logging.Formatter(
        "[%(asctime)s][%(levelname)s] %(filename)s: %(lineno)3d: %(message)s",
        datefmt="%m/%d %H:%M:%S",
    )
    if is_master_process():
        sh = logging.StreamHandler(sys.stdout)
        sh.setLevel(logging.DEBUG)
        sh.setFormatter(fmt)
        logger.addHandler(sh)
        if output_dir is not None:
            os.makedirs(output_dir, exist_ok=True)
            fh = logging.FileHandler(os.path.join(output_dir, "stdout.log"))
            fh.setLevel(logging.DEBUG)
            fh.setFormatter(fmt)
            logger.addHandler(fh)
    else:
        _suppress_print()
        logger.addHandler(logging.NullHandler())


def get_logger(name: str) -> logging.Logger:
    if not name.startswith("focus_tpu"):
        name = "focus_tpu." + name
    return logging.getLogger(name)


class _StatEncoder(json.JSONEncoder):
    def default(self, o):
        if isinstance(o, decimal.Decimal):
            return float(o)
        try:
            return float(o)
        except (TypeError, ValueError):
            return str(o)


def log_json_stats(stats: dict) -> None:
    """Log one json line of training/eval statistics."""
    stats = {
        k: decimal.Decimal(f"{v:.5f}") if isinstance(v, float) else v
        for k, v in stats.items()
    }
    logger = get_logger(__name__)
    logger.info("json_stats: {:s}".format(json.dumps(stats, cls=_StatEncoder, sort_keys=True)))
