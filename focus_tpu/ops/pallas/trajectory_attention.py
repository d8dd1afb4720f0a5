"""Fused Pallas kernel for trajectory-attention stage 1.

Stage 1 (reference ``slowfast/models/attention.py:524-529``) computes, for
every query token, a per-frame attention over that frame's N patch keys:

    out[b, q, f, :] = softmax(q[b, q] . k[b, f, :N] * scale) @ v[b, f, :N]

The XLA path materialises the [BH, S, S] logit tensor in HBM
(S = F*N ~ 1568 for MF-224), making the op HBM-bound. Here each grid cell
(batch*head, query block, frame) loads a [BQ, d] query tile and the
frame's full [N, d] k/v once into VMEM, computes logits+softmax+PV
entirely on-chip, and writes only the [BQ, d] result — the S x S
intermediate never touches HBM.

N (~196-441 patches+objects) fits comfortably in VMEM, so no online
softmax is needed. The backward pass recomputes through plain XLA einsums
(flash-style rematerialisation) via custom_vjp.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from focus_tpu.ops import attention as attn_ops


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _space_stage_kernel(q_ref, k_ref, v_ref, o_ref, *, scale, n_valid, f):
    """Grid cell: (bh, q_block). The frame loop lives inside the cell so
    each grid step does F x (QK^T, softmax, PV) — amortising the per-cell
    overhead that dominated the one-frame-per-cell variant.

    q_ref: [1, BQ, d]; k_ref/v_ref: [1, F, N_pad, d]; o_ref: [1, F, BQ, d].
    """
    q = q_ref[0].astype(jnp.float32)  # [BQ, d]
    n_pad = k_ref.shape[2]
    for fi in range(f):
        k = k_ref[0, fi].astype(jnp.float32)  # [N_pad, d]
        logits = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale  # [BQ, N_pad]
        if n_valid < n_pad:
            col = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
            logits = jnp.where(col < n_valid, logits, -jnp.inf)
        m = jnp.max(logits, axis=-1, keepdims=True)
        p = jnp.exp(logits - m)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        v = v_ref[0, fi]
        out = jax.lax.dot_general(
            p.astype(v.dtype), v,
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        )
        o_ref[0, fi, :, :] = out.astype(o_ref.dtype)


def _space_stage_fwd_pallas(q, kf, vf, scale: float, block_q: int = 512,
                            interpret: bool = False):
    """q: [BH, S, d]; kf/vf: [BH, F, N, d] -> out [BH, S, F, d]."""
    BH, S, d = q.shape
    F, N = kf.shape[1], kf.shape[2]
    n_pad = _round_up(N, 128)
    if n_pad != N:
        pad = [(0, 0), (0, 0), (0, n_pad - N), (0, 0)]
        kf = jnp.pad(kf, pad)
        vf = jnp.pad(vf, pad)
    bq = min(block_q, _round_up(S, 8))
    s_pad = _round_up(S, bq)
    if s_pad != S:
        q = jnp.pad(q, [(0, 0), (0, s_pad - S), (0, 0)])

    grid = (BH, s_pad // bq)
    # output laid out [BH, F, S, d] so the block's trailing dims (bq, d)
    # satisfy the TPU (8, 128)-divisible-or-equal rule; transposed after.
    out = pl.pallas_call(
        functools.partial(_space_stage_kernel, scale=scale, n_valid=N, f=F),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bq, d), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, F, n_pad, d), lambda b, i: (b, 0, 0, 0)),
            pl.BlockSpec((1, F, n_pad, d), lambda b, i: (b, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, F, bq, d), lambda b, i: (b, 0, i, 0)),
        out_shape=jax.ShapeDtypeStruct((BH, F, s_pad, d), q.dtype),
        interpret=interpret,
    )(q, kf, vf)
    return out[:, :, :S].transpose(0, 2, 1, 3)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def space_stage_fused(q, kf, vf, scale, interpret=False):
    """Fused stage-1 with XLA-recompute backward."""
    return _space_stage_fwd_pallas(q, kf, vf, scale, interpret=interpret)


def _space_stage_fwd(q, kf, vf, scale, interpret):
    out = _space_stage_fwd_pallas(q, kf, vf, scale, interpret=interpret)
    return out, (q, kf, vf)


def _space_stage_bwd(scale, interpret, res, g):
    """Recompute attention in XLA and backprop exactly (per-frame groups
    are independent)."""
    q, kf, vf = res
    logits = jnp.einsum(
        "bqd,bfnd->bqfn", q.astype(jnp.float32), kf.astype(jnp.float32),
        preferred_element_type=jnp.float32,
    ) * scale
    p = jax.nn.softmax(logits, axis=-1)
    g32 = g.astype(jnp.float32)
    dp = jnp.einsum("bqfd,bfnd->bqfn", g32, vf.astype(jnp.float32))
    dlogits = p * (dp - jnp.sum(p * dp, axis=-1, keepdims=True))
    dq = jnp.einsum("bqfn,bfnd->bqd", dlogits, kf.astype(jnp.float32)) * scale
    dk = jnp.einsum("bqfn,bqd->bfnd", dlogits, q.astype(jnp.float32)) * scale
    dv = jnp.einsum("bqfn,bqfd->bfnd", p, g32)
    return dq.astype(q.dtype), dk.astype(kf.dtype), dv.astype(vf.dtype)


space_stage_fused.defvjp(_space_stage_fwd, _space_stage_bwd)


def space_stage(q_, k_, v_, f: int, scale: float, use_pallas: bool = True,
                interpret: bool = False):
    """Drop-in for focus_tpu.ops.attention.space_stage.

    q_/k_/v_: [BH, S, d] with S = F*N. Returns [BH, S, F, d].
    """
    BH, S, d = q_.shape
    n = S // f
    on_tpu = jax.default_backend() in ("tpu", "axon")
    if not use_pallas or (not on_tpu and not interpret):
        return attn_ops.space_stage(q_, k_, v_, f, scale)
    kf = k_.reshape(BH, f, n, d)
    vf = v_.reshape(BH, f, n, d)
    return space_stage_fused(q_, kf, vf, scale, interpret)
