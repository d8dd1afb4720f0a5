"""Exhaustive accuracy check of ops/hw_gelu (the hardware-tanh/exp2
exact-erf gelu used for bf16 activations).

Backend-agnostic: runs on CPU under pytest (conftest) and on the real
TPU when invoked there (scripts/check_hw_gelu_tpu.py); measured counts
on both backends sit inside the asserted bounds (CPU 18+0 / TPU 34
misroundings outside the flush region, vs 213-1612 for the lax.erf
composition it replaces).
"""

import numpy as np
import jax
import jax.numpy as jnp
import ml_dtypes
from scipy.special import ndtr

from focus_tpu.ops.hw_gelu import hw_gelu, use_hw_gelu

F32_MIN_NORMAL = 1.1754944e-38


def _sweep():
    bits = np.arange(65536, dtype=np.uint16)
    xb = bits.view(ml_dtypes.bfloat16)
    finite = np.isfinite(xb.astype(np.float32))
    xb = np.asarray(xb)[finite]
    x64 = xb.astype(np.float64)
    true64 = x64 * ndtr(x64)
    true_bf = true64.astype(ml_dtypes.bfloat16)
    ours = np.asarray(jax.jit(hw_gelu)(jnp.asarray(xb)))
    erf = np.asarray(
        jax.jit(lambda v: jax.nn.gelu(v, approximate=False))(jnp.asarray(xb))
    )
    return x64, true64, true_bf, ours, erf


def _mism(out_bf, true_bf):
    return (out_bf.view(np.uint16) != true_bf.view(np.uint16)) & ~(
        (true_bf == 0) & (out_bf == 0)
    )


def test_hw_gelu_exhaustive_bf16():
    x64, true64, true_bf, ours, erf = _sweep()

    # XLA flushes f32 subnormals; where input or true output is
    # subnormal both gelu paths flush identically — require bitwise
    # agreement with the erf path there.
    flushy = (np.abs(x64) < F32_MIN_NORMAL) | (np.abs(true64) < F32_MIN_NORMAL)
    assert np.all(
        ours[flushy].view(np.uint16) == erf[flushy].view(np.uint16)
    )

    # outside the flush region: round-to-nearest of the TRUE gelu for
    # all but a handful of half-ulp ties (CPU: 18, TPU: 34)...
    m_ours = _mism(ours, true_bf) & ~flushy
    m_erf = _mism(erf, true_bf) & ~flushy
    assert m_ours.sum() <= 40, (
        f"{m_ours.sum()} bf16 misroundings vs truth at x={x64[m_ours][:10]}"
    )
    # ... each exactly 1 ulp (the adjacent representable value)
    if m_ours.any():
        t_bits = true_bf[m_ours].view(np.uint16).astype(np.int32)
        o_bits = ours[m_ours].view(np.uint16).astype(np.int32)
        assert np.abs(t_bits - o_bits).max() == 1

    # ... and several times fewer than the lax.erf composition's
    # (CPU: 18 vs 1612; TPU: 34 vs 213)
    assert m_ours.sum() * 3 <= m_erf.sum(), (m_ours.sum(), m_erf.sum())


def test_hw_gelu_f32_pipeline_rel_error():
    """The f32-evaluated pipeline itself is within 2.2e-4 relative of
    f64 truth wherever the output is f32-normal."""
    x = np.linspace(-14.0, 10.0, 200001, dtype=np.float32)
    true64 = x.astype(np.float64) * ndtr(x.astype(np.float64))
    ours = np.asarray(jax.jit(hw_gelu)(jnp.asarray(x))).astype(np.float64)
    sig = np.abs(true64) > F32_MIN_NORMAL
    rel = np.abs(ours[sig] - true64[sig]) / np.abs(true64[sig])
    assert rel.max() < 2.2e-4, rel.max()


def test_hw_gelu_gating():
    assert use_hw_gelu(jnp.bfloat16)
    assert use_hw_gelu(jnp.float16)
    assert not use_hw_gelu(jnp.float32)
    assert not use_hw_gelu(jnp.int8)


def test_hw_gelu_special_values():
    x = jnp.asarray(
        np.array([0.0, -0.0, np.inf, -np.inf, np.nan, -30.0, 30.0],
                 ml_dtypes.bfloat16)
    )
    g = np.asarray(hw_gelu(x)).astype(np.float32)
    assert g[0] == 0.0 and g[1] == 0.0
    assert g[2] == np.inf
    assert g[3] == 0.0  # gelu(-inf) = 0 (sign of zero unspecified)
    assert np.isnan(g[4])
    assert g[5] == 0.0 and g[6] == 30.0


def test_hw_gelu_grad_matches_erf_gelu():
    """XLA autodiffs through the formula; the derivative must track the
    true gelu' (= Phi(x) + x*phi(x)) closely in the training-relevant
    range."""
    x = jnp.asarray(np.linspace(-6.0, 6.0, 4001), jnp.float32)
    ours = np.asarray(jax.vmap(jax.grad(lambda v: hw_gelu(v)))(x))
    xd = np.asarray(x, np.float64)
    phi = np.exp(-xd * xd / 2) / np.sqrt(2 * np.pi)
    true = ndtr(xd) + xd * phi
    assert np.abs(ours - true).max() < 5e-4, np.abs(ours - true).max()


def test_hw_gelu_grad_saturates_to_one():
    """Beyond the center clamp the true gelu'(x) is exactly 1; the
    backward must not grow with x (the sech^2 term multiplies the
    clamped input — an activation spike up to bf16 max must see a unit
    gradient, not O(x * ulp))."""
    x = jnp.asarray(
        np.array([5.5, 8.0, 1e4, 1e20, 3.39e38], np.float32)
    )
    g = np.asarray(jax.vmap(jax.grad(lambda v: hw_gelu(v)))(x))
    np.testing.assert_allclose(g, np.ones_like(g), atol=1e-5)


def test_mlp_uses_hw_gelu_for_bf16():
    """The Mlp's exact-gelu path must route bf16 through hw_gelu (same
    output as hw_gelu on the activation) and keep lax.erf for f32."""
    from focus_tpu.models.motionformer import Mlp

    x32 = jnp.asarray(np.random.RandomState(0).randn(4, 8), jnp.float32)
    mlp16 = Mlp(hidden_features=8, dtype=jnp.bfloat16)
    mlp32 = Mlp(hidden_features=8, dtype=None)
    v = mlp32.init(jax.random.PRNGKey(0), x32)
    # f32: unchanged exact path
    out32 = mlp32.apply(v, x32)
    assert out32.dtype == jnp.float32
    # bf16: runs (numerics pinned by the exhaustive test above)
    out16 = mlp16.apply(v, x32)
    assert out16.dtype == jnp.bfloat16
