"""Regression tests for the round-1 advisor findings (ADVICE.md):
EK loss composition, eval-batch padding dedupe, attention dropout,
double label smoothing, ORViT-attn-from-backbone seeding."""

import numpy as np
import jax
import jax.numpy as jnp

from focus_tpu.models import losses as losses_lib
from focus_tpu.utils.meters import TestMeter


def test_ek_loss_sums_verb_and_noun():
    # reference tools/train_net.py:97 sums verb_loss + noun_loss
    logits_v = jnp.asarray(np.random.RandomState(0).randn(4, 5).astype(np.float32))
    logits_n = jnp.asarray(np.random.RandomState(1).randn(4, 7).astype(np.float32))
    labels = {"verb": jnp.array([0, 1, 2, 3]), "noun": jnp.array([0, 1, 2, 3])}
    preds = (None, {"verb": logits_v, "noun": logits_n})
    total = float(losses_lib.ek_loss(preds, labels))
    lv = float(losses_lib.cross_entropy(logits_v, labels["verb"]))
    ln = float(losses_lib.cross_entropy(logits_n, labels["noun"]))
    assert np.isclose(total, lv + ln, rtol=1e-5)


def test_label_smoothing_passthrough_for_soft_labels():
    # already-soft (mixup-smoothed) labels must not be smoothed again
    logits = jnp.asarray(np.random.RandomState(0).randn(4, 10).astype(np.float32))
    soft = jax.nn.softmax(
        jnp.asarray(np.random.RandomState(1).randn(4, 10).astype(np.float32))
    )
    a = float(losses_lib.label_smoothing_cross_entropy(logits, soft))
    b = float(losses_lib.soft_target_cross_entropy(logits, soft))
    assert np.isclose(a, b, rtol=1e-6)


def test_test_meter_skips_padded_and_duplicate_clips():
    meter = TestMeter(num_videos=2, num_clips=2, num_cls=3, overall_iters=1)
    preds = np.eye(3)[[0, 1, 2]].astype(np.float64)
    labels = np.array([1, 1, 1])
    # clip 0 delivered twice + one padded sentinel: each counted once/never
    meter.update_stats(preds, labels, np.array([0, 0, -1]))
    assert meter.clip_count[0] == 1
    np.testing.assert_allclose(meter.video_preds[0], preds[0])
    meter.update_stats(preds[:2], labels[:2], np.array([1, 2]))
    assert meter.clip_count.tolist() == [2, 1]


def test_loader_marks_padded_indices():
    from focus_tpu.datasets.loader import DataLoader

    class Toy:
        def __len__(self):
            return 5

        def __getitem__(self, i):
            return (
                np.zeros((2, 2), np.float32),
                np.int64(i % 3),
                np.int64(i),
                {},
            )

    dl = DataLoader(Toy(), global_batch_size=4, shuffle=False,
                    drop_last=False, num_workers=1, pad_last=True)
    batches = list(dl)
    assert len(batches) == 2
    idx0 = np.asarray(batches[0][2])
    idx1 = np.asarray(batches[1][2])
    assert idx0.tolist() == [0, 1, 2, 3]
    # final batch has one real sample and three padded sentinels
    assert idx1[0] == 4 and (idx1[1:] == -1).all()


def test_orvit_attn_from_backbone_inserts_orvit_keys():
    from focus_tpu.utils.torch_import import _copy_backbone_attn_to_orvit

    sd = {
        "blocks.3.attn.qkv.weight": np.ones((6, 2), np.float32),
        "blocks.3.attn.proj.weight": np.ones((2, 2), np.float32),
    }
    out = _copy_backbone_attn_to_orvit(sd, None)
    assert "orvit_blocks.3.attn.qkv.weight" in out
    assert "orvit_blocks.3.attn.proj.weight" not in out  # reference: qkv only
    np.testing.assert_array_equal(
        out["orvit_blocks.3.attn.qkv.weight"], sd["blocks.3.attn.qkv.weight"]
    )


def test_attn_drop_is_applied_in_training():
    from focus_tpu.models.motionformer import TrajectoryAttention

    B, F, P, C = 1, 2, 4, 8
    x = jnp.asarray(
        np.random.RandomState(0).randn(B, 1 + F * P, C).astype(np.float32)
    )
    mod = TrajectoryAttention(dim=C, num_heads=2, qkv_bias=True,
                              attn_drop=0.5, use_original_code=True)
    variables = mod.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        x, (F, 2, 2), deterministic=True,
    )
    det, _ = mod.apply(variables, x, (F, 2, 2), deterministic=True)
    drop, _ = mod.apply(
        variables, x, (F, 2, 2), deterministic=False,
        rngs={"dropout": jax.random.PRNGKey(2)},
    )
    assert not np.allclose(np.asarray(det), np.asarray(drop))


def test_fast_gelu_is_per_model_not_global():
    """Round-2 advice: cfg.TPU.FAST_GELU must be a per-model field — a
    second model built with a different setting must not change the gelu
    of a previously built model on re-trace."""
    from tests.test_motionformer import make_inputs, mf_cfg
    from focus_tpu.models.build import build_model, init_model

    cfg_exact = mf_cfg()
    cfg_fast = mf_cfg()
    cfg_fast.TPU.FAST_GELU = True

    m_exact = build_model(cfg_exact)
    x, metadata = make_inputs(cfg_exact)
    var = init_model(m_exact, cfg_exact, (x, metadata))
    before = np.asarray(m_exact.apply(var, x, metadata))

    m_fast = build_model(cfg_fast)
    fast_out = np.asarray(m_fast.apply(var, x, metadata))
    # tanh gelu numerics differ from exact erf (tiny post-softmax, but
    # the bit pattern must change if the flag is honoured)...
    assert not np.array_equal(fast_out, before)
    # ...and re-tracing the first model after building the second must
    # reproduce its original (exact-erf) output bit-for-bit
    after = np.asarray(
        jax.jit(lambda v, a, md: m_exact.apply(v, a, md))(var, x, metadata)
    )
    np.testing.assert_array_equal(after, before)
