"""Fully-fused trajectory core vs the XLA composition (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def make_inputs(B=2, F=3, N=12, C=16, heads=4, seed=0):
    rs = np.random.RandomState(seed)
    S = F * N
    q = jnp.asarray(rs.randn(B, S, C) * 0.2, jnp.float32)
    kf = jnp.asarray(rs.randn(B, F, N, C) * 0.2, jnp.float32)
    vf = jnp.asarray(rs.randn(B, F, N, C) * 0.2, jnp.float32)
    wq2 = jnp.asarray(rs.randn(C, C) * 0.1, jnp.float32)
    bq2 = jnp.asarray(rs.randn(C) * 0.1, jnp.float32)
    wk2 = jnp.asarray(rs.randn(C, C) * 0.1, jnp.float32)
    bk2 = jnp.asarray(rs.randn(C) * 0.1, jnp.float32)
    return q, kf, vf, wq2, bq2, wk2, bk2


@pytest.mark.parametrize("version", [3, 4, 5, 6, 7])
def test_fused_core_matches_xla(version, monkeypatch):
    from focus_tpu.ops.pallas import trajectory_block as tb

    monkeypatch.setattr(tb, "FWD_VERSION", version)
    args = make_inputs()
    heads = 4
    scale = (16 // heads) ** -0.5
    ref = tb._xla_reference(*args, scale, heads)
    out = tb.fused_trajectory_core(*args, scale, heads, True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_fused_core_v4_prescale_q_matches_xla():
    """prescale_q A/B flag (exp2 constant folded into the MXU operand;
    measured neutral on-chip, BENCH_NOTES round 3) must stay exact."""
    from focus_tpu.ops.pallas import trajectory_block as tb

    args = make_inputs(seed=3)
    heads = 4
    scale = (16 // heads) ** -0.5
    ref = tb._xla_reference(*args, scale, heads)
    out = tb._fused_fwd_pallas_v4(*args, scale, heads, interpret=True,
                                  prescale_q=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_fused_core_grad_matches_xla():
    from focus_tpu.ops.pallas.trajectory_block import (
        _xla_reference,
        fused_trajectory_core,
    )

    args = make_inputs(seed=1)
    heads = 4
    scale = (16 // heads) ** -0.5

    def loss_ref(*a):
        return (_xla_reference(*a, scale, heads) ** 2).sum()

    def loss_fused(*a):
        return (fused_trajectory_core(*a, scale, heads, True) ** 2).sum()

    g_ref = jax.grad(loss_ref, argnums=tuple(range(7)))(*args)
    g_fused = jax.grad(loss_fused, argnums=tuple(range(7)))(*args)
    for a, b in zip(g_ref, g_fused):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=1e-4)


def _extreme_inputs(sign, mag, B=1, F=2, N=12, C=16, heads=4, seed=7):
    """Inputs whose stage-1 logits are uniformly ~sign*mag nats after the
    1/sqrt(hd) scale — the peaked / anti-aligned distributions trained
    models produce, which random-weight parity tests never exercise."""
    rs = np.random.RandomState(seed)
    S = F * N
    hd = C // heads
    scale = hd ** -0.5
    # unit-ish directions, then scale q so q.k ~ sign*mag/scale
    qdir = rs.randn(B, S, C).astype(np.float32)
    qdir /= np.linalg.norm(qdir, axis=-1, keepdims=True)
    amp = (mag / scale) ** 0.5
    q = jnp.asarray(qdir * amp * sign, jnp.float32)
    kf = jnp.asarray(
        np.broadcast_to(
            qdir.reshape(B, F, N, C)[:, :1, :1], (B, F, N, C)
        ).copy() * amp
        + rs.randn(B, F, N, C) * 0.01,
        jnp.float32,
    )
    vf = jnp.asarray(rs.randn(B, F, N, C) * 0.2, jnp.float32)
    wq2 = jnp.asarray(rs.randn(C, C) * 0.1, jnp.float32)
    bq2 = jnp.asarray(rs.randn(C) * 0.1, jnp.float32)
    wk2 = jnp.asarray(rs.randn(C, C) * 0.1, jnp.float32)
    bk2 = jnp.zeros((C,), jnp.float32)
    return (q, kf, vf, wq2, bq2, wk2, bk2), scale


@pytest.mark.parametrize("version", [4, 6, 7])
@pytest.mark.parametrize("sign,mag", [(-1.0, 25.0), (-1.0, 60.0), (1.0, 50.0)])
def test_fused_core_extreme_logits(sign, mag, version, monkeypatch):
    """Strongly negative valid logits used to cancel against the pad-count
    correction (s -> 0 -> inf/NaN); strongly positive ones stress the exp2
    clamp. Both must stay finite and match the max-subtracted XLA path."""
    from focus_tpu.ops.pallas import trajectory_block as tb

    monkeypatch.setattr(tb, "FWD_VERSION", version)
    _xla_reference = tb._xla_reference
    fused_trajectory_core = tb.fused_trajectory_core

    args, scale = _extreme_inputs(sign, mag)
    heads = 4
    ref = _xla_reference(*args, scale, heads)
    out = fused_trajectory_core(*args, scale, heads, True)
    assert np.isfinite(np.asarray(out)).all()
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=5e-4
    )


def test_fused_bwd_extreme_negative_logits():
    """Backward recompute shares the slice-sum normaliser; gradients must
    stay finite and match the XLA vjp under anti-aligned q/k."""
    from focus_tpu.ops.pallas.trajectory_block import (
        _fused_bwd_pallas,
        _xla_reference,
    )

    args, scale = _extreme_inputs(-1.0, 25.0)
    q, kf, vf, wq2, bq2, wk2, bk2 = args
    heads = 4
    dout = jnp.asarray(
        np.random.RandomState(11).randn(*q.shape), jnp.float32
    )
    _, vjp = jax.vjp(
        lambda *a: _xla_reference(*a, scale, heads),
        q, kf, vf, wq2, bq2, wk2, bk2,
    )
    gold = vjp(dout)
    outs = _fused_bwd_pallas(
        q, kf, vf, wq2, bq2, wk2, dout, scale, heads, block_q=16,
        interpret=True,
    )
    for name, ours, ref in zip(
        ["dq", "dkf", "dvf", "dwq2", "dbq2", "dwk2"], outs, gold[:6]
    ):
        assert np.isfinite(np.asarray(ours)).all(), name
        np.testing.assert_allclose(
            np.asarray(ours), np.asarray(ref), atol=2e-3, err_msg=name
        )


def test_fused_bwd_pallas_padded_shapes():
    """Backward kernel with N not 128-aligned and S needing q-padding
    (pads must self-neutralise in every gradient)."""
    from focus_tpu.ops.pallas.trajectory_block import (
        _fused_bwd_pallas,
        _xla_reference,
    )

    rs = np.random.RandomState(3)
    B, heads, F, N, C = 2, 4, 4, 18, 64
    S = F * N
    q = jnp.asarray(rs.randn(B, S, C) * 0.3, jnp.float32)
    kf = jnp.asarray(rs.randn(B, F, N, C) * 0.3, jnp.float32)
    vf = jnp.asarray(rs.randn(B, F, N, C) * 0.3, jnp.float32)
    wq2 = jnp.asarray(rs.randn(C, C) * 0.1, jnp.float32)
    wk2 = jnp.asarray(rs.randn(C, C) * 0.1, jnp.float32)
    bq2 = jnp.asarray(rs.randn(C) * 0.1, jnp.float32)
    bk2 = jnp.zeros((C,))
    scale = (C // heads) ** -0.5
    dout = jnp.asarray(rs.randn(B, S, C), jnp.float32)

    _, vjp = jax.vjp(
        lambda *a: _xla_reference(*a, scale, heads),
        q, kf, vf, wq2, bq2, wk2, bk2,
    )
    gold = vjp(dout)
    outs = _fused_bwd_pallas(
        q, kf, vf, wq2, bq2, wk2, dout, scale, heads, block_q=32,
        interpret=True,
    )
    for name, ours, ref in zip(
        ["dq", "dkf", "dvf", "dwq2", "dbq2", "dwk2"], outs, gold[:6]
    ):
        np.testing.assert_allclose(
            np.asarray(ours), np.asarray(ref), atol=5e-5, err_msg=name
        )


def test_patch_embed_matmul_matches_conv():
    """stride==kernel PatchEmbed3D computes via reshape+matmul with the
    exact nn.Conv param tree; outputs must match the conv."""
    import flax.linen as nn

    from focus_tpu.models.motionformer import PatchEmbed3D

    class SlowPE(nn.Module):
        @nn.compact
        def __call__(self, x):
            x = nn.Conv(
                24, (2, 4, 4), strides=(2, 4, 4), padding="VALID",
                kernel_init=nn.initializers.xavier_uniform(), name="proj",
            )(x)
            return x.reshape(x.shape[0], -1, 24)

    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.rand(2, 4, 16, 16, 3), jnp.float32)
    fast = PatchEmbed3D(dim=24, kernel=(2, 4, 4), stride=(2, 4, 4))
    params = fast.init(jax.random.PRNGKey(0), x)
    out_fast, shp = fast.apply(params, x)
    assert shp == (2, 4, 4)
    out_slow = SlowPE().apply(params, x)
    np.testing.assert_allclose(
        np.asarray(out_fast), np.asarray(out_slow), atol=1e-5
    )


@pytest.mark.parametrize("mode", ["mxu_sum", "bf16"])
def test_fused_core_v4_stage1_variants(mode):
    """Low-VPU stage-1 forms. In f32 inputs "mxu_sum" changes only the
    reduction order of the normaliser (MXU f32 accumulation) — near-exact;
    "bf16" rounds the softmax logits to bf16 (a labeled serving variant)
    and only needs to stay finite and close at random-weight scale."""
    from focus_tpu.ops.pallas import trajectory_block as tb

    args = make_inputs(seed=5)
    heads = 4
    scale = (16 // heads) ** -0.5
    ref = tb._xla_reference(*args, scale, heads)
    out = tb._fused_fwd_pallas_v4(*args, scale, heads, interpret=True,
                                  stage1=mode)
    assert np.isfinite(np.asarray(out)).all()
    atol = 2e-5 if mode == "mxu_sum" else 5e-2
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=atol)


@pytest.mark.parametrize("mode", ["mxu_sum", "bf16"])
@pytest.mark.parametrize("sign,mag", [(-1.0, 25.0), (-1.0, 60.0), (1.0, 50.0)])
def test_fused_core_v4_stage1_variants_extreme(mode, sign, mag):
    """The stage-1 variants must inherit the nomax robustness guarantees:
    finite outputs when every valid logit is strongly negative (normaliser
    underflow) or strongly positive (exp2 clamp)."""
    from focus_tpu.ops.pallas import trajectory_block as tb

    args, scale = _extreme_inputs(sign, mag)
    heads = 4
    ref = tb._xla_reference(*args, scale, heads)
    out = tb._fused_fwd_pallas_v4(*args, scale, heads, interpret=True,
                                  stage1=mode)
    assert np.isfinite(np.asarray(out)).all()
    atol = 5e-4 if mode == "mxu_sum" else 5e-2
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=atol)


def test_fused_bwd_stage1_bf16_variant(monkeypatch):
    """BWD_STAGE1='bf16' (labeled variant): gradients must stay finite
    and track the f32 vjp at bf16-rounding tolerance."""
    from focus_tpu.ops.pallas import trajectory_block as tb

    args = make_inputs(seed=5)
    heads = 4
    scale = (16 // heads) ** -0.5

    def loss(*a):
        return (tb.fused_trajectory_core(*a, scale, heads, True) ** 2).sum()

    g_ref = jax.grad(loss, argnums=tuple(range(7)))(*args)
    monkeypatch.setattr(tb, "BWD_STAGE1", "bf16")
    g_b16 = jax.grad(loss, argnums=tuple(range(7)))(*args)
    for a, b in zip(g_ref, g_b16):
        assert np.isfinite(np.asarray(b)).all()
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), atol=3e-2, rtol=2e-2
        )


def test_fused_core_v4_dense_kv_matches_xla():
    """dense_kv mode (k/v unpadded, VMEM-scratch padding) must be exact
    vs the padded wrapper's numerics."""
    from focus_tpu.ops.pallas import trajectory_block as tb

    args = make_inputs(seed=6)
    heads = 4
    scale = (16 // heads) ** -0.5
    ref = tb._xla_reference(*args, scale, heads)
    out = tb._fused_fwd_pallas_v4(*args, scale, heads, interpret=True,
                                  dense_kv=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


@pytest.mark.parametrize("sign,mag", [(-1.0, 25.0), (1.0, 50.0)])
def test_fused_core_v4_dense_kv_extreme(sign, mag):
    from focus_tpu.ops.pallas import trajectory_block as tb

    args, scale = _extreme_inputs(sign, mag)
    heads = 4
    ref = tb._xla_reference(*args, scale, heads)
    out = tb._fused_fwd_pallas_v4(*args, scale, heads, interpret=True,
                                  dense_kv=True)
    assert np.isfinite(np.asarray(out)).all()
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=5e-4)


def test_fused_bwd_dense_kv_matches_padded():
    """Backward dense_kv (read-side V4_DENSE_KV port): gradients must be
    exact vs the padded-wrapper backward — same kernel math, operands
    staged in VMEM instead of an HBM pad."""
    from focus_tpu.ops.pallas import trajectory_block as tb

    q, kf, vf, wq2, bq2, wk2, _ = make_inputs(seed=8)
    heads = 4
    scale = (16 // heads) ** -0.5
    dout = jnp.asarray(
        np.random.RandomState(9).randn(*q.shape) * 0.3, jnp.float32
    )
    g_pad = tb._fused_bwd_pallas(
        q, kf, vf, wq2, bq2, wk2, dout, scale, heads, interpret=True,
        dense_kv=False,
    )
    g_dense = tb._fused_bwd_pallas(
        q, kf, vf, wq2, bq2, wk2, dout, scale, heads, interpret=True,
        dense_kv=True,
    )
    for a, b in zip(g_pad, g_dense):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=1e-6)


def test_pick_bq_divisor():
    """Pad-free block picker: at the flagship shape it must choose 224
    (7 cells, zero pad) over 256 (7 cells, 224 garbage rows)."""
    from focus_tpu.ops.pallas.trajectory_block import _pick_bq

    assert _pick_bq(1568, 256) == 224
    assert _pick_bq(1568, 224) == 224
    assert _pick_bq(128, 256) == 128       # already exact
    assert _pick_bq(36, 256) == 40         # no >=64 divisor: keep pad
    assert _pick_bq(160, 96) == 80         # divisor within +1 cell
    # HR-336 (S=3528): no multiple-of-8 divisor in [128, 256] keeps the
    # grid within +1 cell -> the padded grid stays
    assert _pick_bq(3528, 256) == 256


def test_fused_core_divisor_bq_matches_xla():
    """Forward + backward parity when _pick_bq selects a pad-free
    divisor block (S=160, block_q=96 -> bq=80)."""
    from focus_tpu.ops.pallas import trajectory_block as tb

    args = make_inputs(B=1, F=5, N=32, seed=11)
    heads = 4
    scale = (16 // heads) ** -0.5
    ref = tb._xla_reference(*args, scale, heads)
    out = tb._fused_fwd_pallas_v4(*args[:7], scale, heads, block_q=96,
                                  interpret=True, dense_kv=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

    q, kf, vf, wq2, bq2, wk2, _ = args
    dout = jnp.asarray(
        np.random.RandomState(12).randn(*q.shape) * 0.3, jnp.float32
    )

    def loss_ref(*a):
        return (tb._xla_reference(*a, scale, heads) * dout).sum()

    g_ref = jax.grad(loss_ref, argnums=tuple(range(6)))(*args[:6], args[6])
    g_fused = tb._fused_bwd_pallas(
        q, kf, vf, wq2, bq2, wk2, dout, scale, heads, block_q=96,
        interpret=True, dense_kv=True,
    )
    for a, b in zip(g_ref, g_fused):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=1e-4)
