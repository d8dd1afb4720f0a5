"""Pallas kernel tests (interpret mode on CPU): numerics vs the XLA path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


@pytest.mark.parametrize("S,F", [(12, 3), (20, 4)])
def test_space_stage_pallas_matches_xla(S, F):
    from focus_tpu.ops.attention import space_stage as xla_stage
    from focus_tpu.ops.pallas.trajectory_attention import space_stage_fused

    rs = np.random.RandomState(0)
    BH, d = 4, 8
    n = S // F
    q = jnp.asarray(rs.randn(BH, S, d), jnp.float32)
    k = jnp.asarray(rs.randn(BH, S, d), jnp.float32)
    v = jnp.asarray(rs.randn(BH, S, d), jnp.float32)
    scale = d ** -0.5
    ref = xla_stage(q, k, v, F, scale)
    out = space_stage_fused(
        q, k.reshape(BH, F, n, d), v.reshape(BH, F, n, d), scale, True
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_space_stage_pallas_grad_matches_xla():
    from focus_tpu.ops.attention import space_stage as xla_stage
    from focus_tpu.ops.pallas.trajectory_attention import space_stage_fused

    rs = np.random.RandomState(1)
    BH, S, F, d = 2, 8, 2, 8
    n = S // F
    q = jnp.asarray(rs.randn(BH, S, d), jnp.float32)
    k = jnp.asarray(rs.randn(BH, S, d), jnp.float32)
    v = jnp.asarray(rs.randn(BH, S, d), jnp.float32)
    scale = d ** -0.5

    def loss_ref(q, k, v):
        return (xla_stage(q, k, v, F, scale) ** 2).sum()

    def loss_pallas(q, k, v):
        out = space_stage_fused(
            q, k.reshape(BH, F, n, d), v.reshape(BH, F, n, d), scale, True
        )
        return (out ** 2).sum()

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    g_pal = jax.grad(loss_pallas, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_ref, g_pal):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=1e-4)
