"""Data-loading benchmark (reference ``slowfast/utils/benchmark.py:20-103``).

Times loader-only epochs: clips/sec and per-iteration latency, plus RSS.
"""

from __future__ import annotations

import resource
import time

from focus_tpu.datasets import loader as data_loader
from focus_tpu.utils import logging
from focus_tpu.utils.meters import ScalarMeter

logger = logging.get_logger(__name__)


def benchmark_data_loading(cfg):
    logging.setup_logging(cfg.OUTPUT_DIR)
    train_loader = data_loader.construct_loader(cfg, "train")
    logger.info(
        f"Benchmarking {len(train_loader)} batches x "
        f"{cfg.BENCHMARK.NUM_EPOCHS} epochs, batch {cfg.TRAIN.BATCH_SIZE}"
    )
    iter_times = ScalarMeter(cfg.BENCHMARK.LOG_PERIOD)
    total_clips = 0
    t_start = time.perf_counter()
    cpu_start = time.process_time()  # all loader threads share the process
    for epoch in range(cfg.BENCHMARK.NUM_EPOCHS):
        if cfg.BENCHMARK.SHUFFLE:
            data_loader.shuffle_dataset(train_loader, epoch)
        t0 = time.perf_counter()
        for cur_iter, batch in enumerate(train_loader):
            dt = time.perf_counter() - t0
            iter_times.add_value(dt)
            total_clips += cfg.TRAIN.BATCH_SIZE
            if (cur_iter + 1) % cfg.BENCHMARK.LOG_PERIOD == 0:
                rss_gb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6
                logging.log_json_stats(
                    {
                        "_type": "data_benchmark",
                        "epoch": epoch,
                        "iter": cur_iter + 1,
                        "iter_time_med": iter_times.get_win_median(),
                        "ram_gb": rss_gb,
                    }
                )
            t0 = time.perf_counter()
    elapsed = time.perf_counter() - t_start
    cpu_elapsed = time.process_time() - cpu_start
    # host cost model: preprocessing is CPU-bound and embarrassingly
    # parallel across clips, so clips/s scales ~linearly in vCPUs until
    # it covers the device rate (BENCH_NOTES input-pipeline section)
    cpu_sec_per_clip = cpu_elapsed / max(total_clips, 1)
    stats = {
        "_type": "data_benchmark_final",
        "clips_per_sec": total_clips / elapsed,
        "cpu_sec_per_clip": cpu_sec_per_clip,
        "projected_clips_per_sec_at_100_vcpu": 100.0 / cpu_sec_per_clip,
        "total_sec": elapsed,
    }
    logging.log_json_stats(stats)
    return stats
