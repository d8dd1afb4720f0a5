"""Trajectory attention and joint space-time self-attention.

Functional cores (pure jnp on projected q/k/v) so the same math can be
swapped between the XLA path here and the fused Pallas kernel
(focus_tpu/ops/pallas/trajectory_attention.py) without touching modules.

Trajectory attention (reference ``slowfast/models/attention.py:479-557``):
  stage 1 — every query token attends *within each frame* over all F
  frames' keys, producing per-frame aggregates x[b, q, f, d];
  stage 2 — temporal attention along the trajectory, with the query taken
  from the diagonal frame (the aggregate of the query's own frame).
The reference's ``use_original_code=True`` path (a typo kept for
checkpoint parity: values = stage-1 aggregates instead of the learned v2
projection, attention.py:544-548) is the default here too.
"""

from typing import Tuple

import jax
import jax.numpy as jnp


def space_stage(q_, k_, v_, f: int, scale: float,
                attn_drop: float = 0.0, dropout_rng=None):
    """Stage 1: per-frame spatial attention for all query tokens.

    q_, k_, v_: [BH, S, d] with S = F * P (no CLS).
    attn_drop/dropout_rng: dropout on the attention weights (the reference
    applies self.attn_drop to space_attn only, attention.py:527).
    Returns x: [BH, S, F, d].
    """
    BH, S, d = q_.shape
    p = S // f
    logits = jnp.einsum("bqd,bkd->bqk", q_, k_, preferred_element_type=jnp.float32)
    logits = logits.reshape(BH, S, f, p) * scale
    attn = jax.nn.softmax(logits, axis=-1).astype(q_.dtype)
    if attn_drop > 0.0 and dropout_rng is not None:
        keep = jax.random.bernoulli(dropout_rng, 1.0 - attn_drop, attn.shape)
        attn = attn * keep.astype(attn.dtype) / (1.0 - attn_drop)
    v_f = v_.reshape(BH, f, p, d)
    return jnp.einsum(
        "bqfn,bfnd->bqfd", attn, v_f, preferred_element_type=jnp.float32
    ).astype(q_.dtype)


def take_diagonal(x, f: int):
    """x: [B, S, F, d] with S = F * P -> diagonal frame aggregate [B, S, d]
    (reference attention.py:533-535)."""
    B, S, F, d = x.shape
    p = S // f
    xg = x.reshape(B, f, p, F, d)
    diag = jnp.einsum("bgnfd,gf->bgnd", xg, jnp.eye(f, dtype=x.dtype))
    return diag.reshape(B, S, d)


def temporal_stage(q2, k2, v2, x, f: int, scale: float, h: int,
                   use_original_code: bool = True):
    """Stage 2: attention over the F per-frame aggregates.

    q2: [B, S, C] (projected diagonal), k2/v2: [B, S, F, C], x: [B, S, F, C]
    Returns [B, S, C].
    """
    B, S, C = q2.shape
    d = C // h
    q2h = q2.reshape(B, S, h, d) * scale
    k2h = k2.reshape(B, S, f, h, d)
    logits = jnp.einsum(
        "bshd,bsfhd->bhsf", q2h, k2h, preferred_element_type=jnp.float32
    )
    attn = jax.nn.softmax(logits, axis=-1).astype(q2.dtype)
    src = x if use_original_code else v2
    srch = src.reshape(B, S, f, h, d)
    out = jnp.einsum(
        "bhsf,bsfhd->bshd", attn, srch, preferred_element_type=jnp.float32
    ).astype(q2.dtype)
    return out.reshape(B, S, C)


def temporal_stage_k2w(q2, wk2, xs, f: int, scale: float, h: int):
    """Stage 2 with the k2 projection reassociated onto the query side
    (``use_original_code=True`` semantics only).

    The reference computes k2 = xs @ Wk2 + bk2 ([B,S,F,C] @ [C,C] — the
    dominant FLOPs of the whole block) and logits = q2_h . k2_h. Since
    logits[.,f] = q2_h . (xs_f @ Wk2[:,h]) = (q2_h @ Wk2[:,h]^T) . xs_f
    and the bias term is constant over f (softmax-invariant), projecting
    q2 once through Wk2^T is F x cheaper and never materialises k2.

    q2: [B, S, C]; wk2: [C, C] (k half of proj_kv); xs: [B, S, F, C].
    Returns [B, S, C].
    """
    B, S, C = q2.shape
    d = C // h
    q2h = q2.reshape(B, S, h, d)
    wk2h = wk2.reshape(C, h, d).transpose(1, 0, 2)  # [h, C, d]
    g = jnp.einsum(
        "bshd,hcd->bshc", q2h, wk2h.astype(q2.dtype),
        preferred_element_type=jnp.float32,
    ).astype(q2.dtype)
    logits = jnp.einsum(
        "bshc,bsfc->bhsf", g, xs, preferred_element_type=jnp.float32
    ) * scale
    attn = jax.nn.softmax(logits, axis=-1).astype(q2.dtype)
    srch = xs.reshape(B, S, f, h, d)
    out = jnp.einsum(
        "bhsf,bsfhd->bshd", attn, srch, preferred_element_type=jnp.float32
    ).astype(q2.dtype)
    return out.reshape(B, S, C)


def cls_attention(cls_q, k, v, scale: float):
    """CLS token attends over everything (reference attention.py:512-519).
    cls_q: [BH, 1, d], k/v: [BH, N, d] -> [BH, 1, d].

    The single query row is padded to 8 rows so both contractions take
    the MXU path: XLA lowers an M=1 dot as a VPU multiply-reduce, whose
    f32 accumulation materialises full f32 upcasts (and transposed
    copies) of k AND v — ~0.5 ms/block at MF-224 for one query row
    (round-4 trace ledger). The 8 redundant rows are identical and cost
    ~nothing on the MXU; attention weights are applied at the kv dtype,
    the same weight-rounding class as the fused kernel's PV product
    (f32 compute stays exact: astype(k.dtype) is the identity there).
    """
    BH, _, d = cls_q.shape
    qs = (cls_q * scale).astype(cls_q.dtype)
    q8 = jnp.broadcast_to(qs, (BH, 8, d))
    logits = jax.lax.dot_general(
        q8, k, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # [BH, 8, N]
    attn = jax.nn.softmax(logits[:, :1], axis=-1)
    attn8 = jnp.broadcast_to(attn.astype(k.dtype), (BH, 8, attn.shape[-1]))
    out = jax.lax.dot_general(
        attn8, v, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    return out[:, :1].astype(cls_q.dtype)


def cls_attention_dense(cls_q, k, v, scale: float, h: int):
    """CLS attention consuming NATIVE-layout k/v — no head-split.

    cls_q: [B, 1, C]; k/v: [B, N, C]; returns [B, 1, C]. Same math as
    ``cls_attention`` (reference attention.py:512-519) but the head
    structure is expressed as block-diagonal contractions so k and v
    are consumed in their [B, N, C] producer layout: the fused
    trajectory path otherwise pays two full [B, N, C] head-split
    transposed copies per layer JUST for this one query row (round-5
    trace track). Logits ride one batched MXU matmul against a
    block-diagonal query ([B, C, h]: rows of head j zero outside head
    j's slice); the context is computed for all (head, slice) pairs —
    h x the needed FLOPs, but at [h, C] output size that is ~0.2
    GFLOP/layer, noise — and the diagonal blocks are gathered at the
    end. Attention weights are applied at the kv dtype, matching
    ``cls_attention``'s weight-rounding class.
    """
    B, N, C = k.shape
    hd = C // h
    head_onehot = jnp.repeat(
        jnp.eye(h, dtype=k.dtype), hd, axis=0
    )  # [C, h]: onehot of each channel's head
    qs = (cls_q[:, 0] * scale).astype(k.dtype)  # [B, C]
    q_blk = qs[:, :, None] * head_onehot[None]  # [B, C, h]
    logits = jax.lax.dot_general(
        k, q_blk, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # [B, N, h]
    attn = jax.nn.softmax(logits, axis=1)
    ctx = jax.lax.dot_general(
        attn.astype(v.dtype), v, (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # [B, h, C]
    # diagonal blocks: out[b, j*hd:(j+1)*hd] = ctx[b, j, j*hd:(j+1)*hd]
    diag = jnp.einsum(
        "bjkd,jk->bjd", ctx.reshape(B, h, h, hd), jnp.eye(h, dtype=ctx.dtype)
    )
    return diag.reshape(B, 1, C).astype(cls_q.dtype)


def joint_attention(q, k, v, scale: float):
    """Vanilla joint space-time attention (reference attention.py:355-385).
    q/k/v: [B, H, N, d]."""
    logits = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
    ) * scale
    attn = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    return jnp.einsum(
        "bhqk,bhkd->bhqd", attn, v, preferred_element_type=jnp.float32
    ).astype(q.dtype)
