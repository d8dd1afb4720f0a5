"""Headline benchmark: ORViT-Motionformer SSv2 16x224 eval throughput.

Measures clips/sec/chip for the flagship eval path (BASELINE.json metric)
on whatever device JAX gives us (the driver runs this on one real TPU
chip). Inputs are device-resident so the number is the model roofline;
the input pipeline is benchmarked separately by tools/benchmark.py.

Measurement hygiene (round-2 verdict #2):
- weights are RANDOM (plausible init scale) and passed as explicit jit
  ARGUMENTS, so XLA cannot constant-fold or simplify zero matmuls;
- the headline number runs exact-erf gelu — the numerics every parity
  test checks; the tanh-gelu recipe variant (cfg.TPU.FAST_GELU) is
  measured separately and reported as ``fast_gelu_clips_per_sec``.

``vs_baseline`` is measured against an estimated 100 clips/s for the
same model on one A100 (the reference publishes no throughput numbers —
BASELINE.md; 100 clips/s ~= 370 GFLOPs/clip at ~37 TFLOP/s sustained,
a generous torch-eager A100 estimate). Target from the driver: >=3x.
"""

import json
import os
import time

import jax

# persistent compile cache: flagship-model compiles through the axon
# remote-compile tunnel take minutes; cache them next to the repo.
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

A100_BASELINE_CLIPS_PER_SEC = 100.0

# Measurement-protocol tag carried in every bench record so numbers are
# comparable across rounds (round-3 verdict: the r2->r3 headline change
# was a protocol fix, not a regression, but the JSON said nothing).
#   fetch-forced-chain-v2 = random weights at init scale passed as jit
#   ARGUMENTS; iterations chained through a data dependence; ONE host
#   fetch at the end forces the full chain (the axon relay memoises
#   repeated identical dispatches and does not honor block_until_ready).
PROTOCOL = "fetch-forced-chain-v2"

_COMPANIONS_PATH = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "BENCH_COMPANIONS.json"
)


def record_companion(name, value, unit, script, extra=None):
    """Persist a companion metric (B=1 latency, HR-336, train clips/s,
    STEVE rollout fps, ...) into BENCH_COMPANIONS.json with provenance,
    so bench.py's headline JSON can carry the latest measured values
    without re-running every expensive companion each driver round."""
    try:
        with open(_COMPANIONS_PATH) as f:
            rec = json.load(f)
    except (OSError, ValueError):
        rec = {}
    entry = {
        "value": round(float(value), 2),
        "unit": unit,
        "script": script,
        "protocol": PROTOCOL,
        "measured_at": time.strftime("%Y-%m-%d"),
    }
    if extra:
        entry.update(extra)
    rec[name] = entry
    with open(_COMPANIONS_PATH, "w") as f:
        json.dump(rec, f, indent=2, sort_keys=True)
        f.write("\n")
    return entry


def load_companions():
    try:
        with open(_COMPANIONS_PATH) as f:
            return json.load(f)
    except (OSError, ValueError):
        return {}


def random_params_like(shapes_tree, scale=0.02):
    """Materialise random params on device with one tiny jitted program
    per UNIQUE (shape, dtype) — per-leaf host transfers are a round trip
    each through the remote tunnel, and one giant init program blows the
    relay's program-size limit (BENCH_NOTES round 1)."""
    makers = {}
    leaves, treedef = jax.tree_util.tree_flatten(shapes_tree)
    out = []
    for i, s in enumerate(leaves):
        key = (tuple(s.shape), str(s.dtype))
        if key not in makers:
            makers[key] = jax.jit(
                lambda k, shape=tuple(s.shape), dtype=s.dtype: (
                    jax.random.normal(k, shape, jnp.float32) * scale
                ).astype(dtype)
            )
        out.append(makers[key](jax.random.PRNGKey(i)))
    return jax.tree_util.tree_unflatten(treedef, out)


def measure(cfg, video, boxes, iters=10):
    from focus_tpu.models.build import build_model

    model = build_model(cfg)
    shapes = jax.eval_shape(
        lambda: model.init(
            {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
            video, {"orvit_bboxes": boxes},
        )
    )
    variables = random_params_like(shapes)

    # Timing protocol for the axon relay (round-3 diagnostics,
    # /tmp/bench_diag*): block_until_ready returns WITHOUT waiting on
    # repeat executions, and repeated identical dispatches are memoised
    # — only a host FETCH forces real execution. So: chain the
    # iterations through a data dependence (each step's input includes
    # the previous step's output; ~1e-5-relative perturbation, above
    # f32 rounding at pixel scale) and FETCH once at the end — the
    # fetch waits for the whole dependent chain, amortising the relay
    # round trip over all iterations.
    @jax.jit
    def eval_step(variables, video, boxes):
        out = model.apply(variables, video, {"orvit_bboxes": boxes})
        return out, video + out.mean().astype(video.dtype) * 1e-3

    # compile + warmup (fetch-forced)
    out, v = eval_step(variables, video, boxes)
    np.asarray(out)
    out, _ = eval_step(variables, v, boxes)
    np.asarray(out)

    v = video + 0.5e-6  # distinct chain start vs the warmup dispatches
    t0 = time.perf_counter()
    for _ in range(iters):
        out, v = eval_step(variables, v, boxes)
    out_h = np.asarray(out)  # forces the full chain
    dt = time.perf_counter() - t0
    assert np.isfinite(out_h).all(), "non-finite logits in bench run"
    return video.shape[0] * iters / dt


def _require_devices(timeout_s=900):
    """Fail fast if device init hangs: the axon relay has a failure mode
    where ``jax.devices()`` blocks forever on a stale chip claim
    (round-3 outage). A hung bench would stall the whole driver run;
    exiting nonzero records an honest failure instead."""
    import threading

    done = threading.Event()

    def watchdog():
        if not done.wait(timeout_s):
            print(
                json.dumps({
                    "error": f"device init exceeded {timeout_s}s "
                             f"(relay down?)"
                }),
                flush=True,
            )
            os._exit(1)

    threading.Thread(target=watchdog, daemon=True).start()
    devices = jax.devices()
    done.set()
    return devices


def main():
    import __graft_entry__ as ge

    _require_devices()
    B = 8
    rs = np.random.RandomState(0)
    video = jnp.asarray(rs.rand(B, 16, 224, 224, 3), jnp.float32)
    boxes = jnp.asarray(rs.rand(B, 8, 4, 4) * 0.5 + 0.25, jnp.float32)

    # headline: exact-erf gelu — the parity-tested numerics
    cfg = ge._flagship_cfg()
    cfg.TPU.COMPUTE_DTYPE = "bfloat16"
    cfg.TPU.FAST_GELU = False
    clips_per_sec = measure(cfg, video, boxes)

    # labeled recipe variant: tanh gelu (fuses into the fc2 matmul at
    # relu cost; ~1e-4 abs output delta — BENCH_NOTES round 2)
    cfg_fast = ge._flagship_cfg()
    cfg_fast.TPU.COMPUTE_DTYPE = "bfloat16"
    cfg_fast.TPU.FAST_GELU = True
    fast_clips_per_sec = measure(cfg_fast, video, boxes)

    # labeled serving variant: W8A8 dynamic int8 dense on the int8 MXU
    # (erf numerics elsewhere; logit delta pinned in
    # tests/test_int8_serving.py; full matrix in BENCH_NOTES round 3)
    cfg_int8 = ge._flagship_cfg()
    cfg_int8.TPU.COMPUTE_DTYPE = "bfloat16"
    cfg_int8.TPU.FAST_GELU = False
    cfg_int8.TPU.INT8_SERVING = True
    int8_clips_per_sec = measure(cfg_int8, video, boxes)

    print(
        json.dumps(
            {
                "metric": "orvit_mf_ssv2_16x224_eval_clips_per_sec_per_chip",
                "value": round(clips_per_sec, 2),
                "unit": "clips/s",
                "vs_baseline": round(clips_per_sec / A100_BASELINE_CLIPS_PER_SEC, 3),
                "fast_gelu_clips_per_sec": round(fast_clips_per_sec, 2),
                "int8_serving_clips_per_sec": round(int8_clips_per_sec, 2),
                "protocol": PROTOCOL,
                "baseline": "estimated 100 clips/s torch-eager A100 (BASELINE.md)",
                "variants": {
                    "value": "exact-erf gelu, bf16 compute — the parity-tested numerics",
                    "fast_gelu": "tanh gelu (TPU.FAST_GELU recipe; tests/test_hw_gelu.py delta table)",
                    "int8_serving": "W8A8 dynamic dense (TPU.INT8_SERVING; tests/test_int8_serving.py)",
                },
                "companions": load_companions(),
            }
        )
    )


if __name__ == "__main__":
    main()
