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


def measure(cfg, video, boxes, iters=10, repeats=3):
    """Returns (median clips/s over ``repeats`` timed chains, dispersion
    dict). Repeated-trial medians because same-config cross-session
    spread on the relay measured ~4% (BENCH_NOTES round 4) — a
    single-shot number near a claimed few-percent win is noise-credible
    either way; the dispersion fields make the spread explicit."""
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

    rates = []
    for r in range(repeats):
        # distinct chain start per repeat vs all prior dispatches
        v = video + (r + 1) * 0.5e-6
        t0 = time.perf_counter()
        for _ in range(iters):
            out, v = eval_step(variables, v, boxes)
        out_h = np.asarray(out)  # forces the full chain
        dt = time.perf_counter() - t0
        assert np.isfinite(out_h).all(), "non-finite logits in bench run"
        rates.append(video.shape[0] * iters / dt)
    med = float(np.median(rates))
    dispersion = {
        "repeats": repeats,
        "iters_per_repeat": iters,
        "min": round(min(rates), 2),
        "max": round(max(rates), 2),
        "spread_pct": round(100.0 * (max(rates) - min(rates)) / med, 1),
    }
    return med, dispersion


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

    # full serving matrix (erf/tanh x bf16/int8), each as a tracked row
    # with dispersion — headline = exact-erf bf16, the parity-tested
    # numerics; the rest are labeled variants (round-4 verdict #2a).
    def variant_cfg(fast_gelu, int8):
        cfg = ge._flagship_cfg()
        cfg.TPU.COMPUTE_DTYPE = "bfloat16"
        cfg.TPU.FAST_GELU = fast_gelu
        cfg.TPU.INT8_SERVING = int8
        return cfg

    clips_per_sec, disp = measure(variant_cfg(False, False), video, boxes)
    fast_clips_per_sec, fast_disp = measure(
        variant_cfg(True, False), video, boxes
    )
    int8_clips_per_sec, int8_disp = measure(
        variant_cfg(False, True), video, boxes
    )
    tanh_int8_clips_per_sec, tanh_int8_disp = measure(
        variant_cfg(True, True), video, boxes
    )

    print(
        json.dumps(
            {
                "metric": "orvit_mf_ssv2_16x224_eval_clips_per_sec_per_chip",
                "value": round(clips_per_sec, 2),
                "unit": "clips/s",
                "vs_baseline": round(clips_per_sec / A100_BASELINE_CLIPS_PER_SEC, 3),
                "dispersion": disp,
                "fast_gelu_clips_per_sec": round(fast_clips_per_sec, 2),
                "fast_gelu_dispersion": fast_disp,
                "int8_serving_clips_per_sec": round(int8_clips_per_sec, 2),
                "int8_serving_dispersion": int8_disp,
                "tanh_int8_clips_per_sec": round(tanh_int8_clips_per_sec, 2),
                "tanh_int8_dispersion": tanh_int8_disp,
                "protocol": PROTOCOL,
                "baseline": "estimated 100 clips/s torch-eager A100 (BASELINE.md)",
                "variants": {
                    "value": "exact-erf gelu, bf16 compute — the parity-tested numerics",
                    "fast_gelu": "tanh gelu (TPU.FAST_GELU recipe; tests/test_hw_gelu.py delta table)",
                    "int8_serving": "W8A8 dynamic dense (TPU.INT8_SERVING; tests/test_int8_serving.py)",
                    "tanh_int8": "fastest labeled serving config: tanh gelu + int8 W8A8 (both deltas pinned by tests)",
                },
                "companions": load_companions(),
            }
        )
    )


if __name__ == "__main__":
    main()
