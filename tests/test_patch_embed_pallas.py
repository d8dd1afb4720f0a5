"""Parity of the fused Pallas patch embed vs the XLA reshape+matmul
path (interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from focus_tpu.ops.pallas.patch_embed import patch_embed_3d


def _xla_reference(x, w, b, kernel):
    kt, kh, kw = kernel
    B, T, H, W, C = x.shape
    t_, h_, w_ = T // kt, H // kh, W // kw
    patches = x[:, : t_ * kt, : h_ * kh, : w_ * kw].reshape(
        B, t_, kt, h_, kh, w_, kw, C
    ).transpose(0, 1, 3, 5, 2, 4, 6, 7).reshape(
        B, t_ * h_ * w_, kt * kh * kw * C
    )
    return patches @ w.reshape(-1, w.shape[-1]) + b


@pytest.mark.parametrize(
    "shape,kernel",
    [
        ((2, 4, 64, 64, 3), (2, 16, 16)),   # flagship-style 16x16, kt=2
        ((1, 3, 32, 48, 3), (1, 16, 16)),   # kt=1, T not multiple of kt*2
        ((2, 2, 32, 32, 8), (2, 16, 16)),   # C already 8
    ],
)
def test_patch_embed_matches_xla(shape, kernel):
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(*shape), jnp.float32)
    kt, kh, kw = kernel
    C, dim = shape[-1], 24
    w = jnp.asarray(rs.randn(kt, kh, kw, C, dim) * 0.05, jnp.float32)
    b = jnp.asarray(rs.randn(dim) * 0.1, jnp.float32)

    ref = _xla_reference(x, w, b, kernel)
    out, thw = patch_embed_3d(x, w, b, kernel, interpret=True)
    assert thw == (shape[1] // kt, shape[2] // kh, shape[3] // kw)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_patch_embed_grads_match_xla():
    """custom_vjp backward (XLA rearrangement) vs autodiff of the
    reference formulation."""
    rs = np.random.RandomState(1)
    shape, kernel = (2, 4, 32, 32, 3), (2, 16, 16)
    x = jnp.asarray(rs.randn(*shape), jnp.float32)
    kt, kh, kw = kernel
    w = jnp.asarray(rs.randn(kt, kh, kw, 3, 24) * 0.05, jnp.float32)
    b = jnp.asarray(rs.randn(24) * 0.1, jnp.float32)

    def loss_ref(x, w, b):
        return (_xla_reference(x, w, b, kernel) ** 2).sum()

    def loss_pl(x, w, b):
        out, _ = patch_embed_3d(x, w, b, kernel, interpret=True)
        return (out ** 2).sum()

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(x, w, b)
    g_pl = jax.grad(loss_pl, argnums=(0, 1, 2))(x, w, b)
    for a, c in zip(g_ref, g_pl):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(c), rtol=1e-4, atol=1e-4
        )


def test_model_param_tree_unchanged_with_pallas_flag():
    """PatchEmbed3D with use_pallas=True must create the identical
    param tree (proj/kernel in conv layout) as the XLA path, so
    checkpoints and importers are unaffected."""
    from focus_tpu.models.motionformer import PatchEmbed3D

    x = jnp.zeros((1, 4, 32, 32, 3), jnp.float32)
    v_xla = PatchEmbed3D(16, (2, 16, 16), (2, 16, 16)).init(
        jax.random.PRNGKey(0), x
    )
    v_pl = PatchEmbed3D(16, (2, 16, 16), (2, 16, 16), use_pallas=True).init(
        jax.random.PRNGKey(0), x
    )
    # on CPU the pallas gate falls back to the XLA path; shapes must
    # match regardless of which branch traced
    s_xla = jax.tree_util.tree_map(lambda a: (a.shape, str(a.dtype)), v_xla)
    s_pl = jax.tree_util.tree_map(lambda a: (a.shape, str(a.dtype)), v_pl)
    assert s_xla == s_pl
