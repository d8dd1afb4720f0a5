"""Fused autoregressive decode step for the STEVE slot rollout.

The KV-cached rollout (models/steve/steve.py:_decode_ids_cached,
reference steve.py:359-381 semantics) runs ~45 XLA ops per decoded
token on M=32-row operands. The round-4 SOL decomposition showed the
step is HBM-bound — every step must re-stream ~0.94 GB of decoder
weights (8 layers x 59M params, bf16) plus the KV caches — and the
measured 2.18 ms/step sat ~1.9x above the weight-stream floor, the gap
being per-op pipeline drain/fill that XLA cannot overlap across the
sequential op chain.

This kernel runs the whole 8-layer decoder body for one token as ONE
pallas_call: grid (layer, 14 stages), each cell consuming exactly one
[D, D] weight chunk (q, k, v, o, cross-q, cross-o, 4x fc1, 4x fc2)
so Mosaic's pipeline keeps a continuous double-buffered weight stream
from HBM while the VPU/MXU work of the previous chunk executes. The
residual stream, FFN hidden, and attention state live in VMEM scratch
across cells; the KV caches stay in HBM (539 MB — far over VMEM) and
are read with explicit bounded DMA: only ceil(t/BK) key blocks are
streamed per layer instead of the full L=257 rows the XLA einsum
touches, halving average cache traffic over the rollout.

The token head + argmax + dictionary embed stay in XLA (3 small ops
per step). Numerics: bf16 operands, f32 accumulation and f32 softmax —
the same class as the XLA path; parity is pinned by
tests/test_steve_fused_ar.py (ids equal on random weights).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

STAGES = 14
BK = 32  # cache rows per DMA block
# interpret-mode escape hatch for CPU parity tests (the model path calls
# fused_ar_step without an interpret kwarg)
INTERPRET = False


def _ln(x32, gamma, beta, eps=1e-6):
    m = jnp.mean(x32, axis=-1, keepdims=True)
    v = jnp.mean((x32 - m) ** 2, axis=-1, keepdims=True)
    return (x32 - m) * jax.lax.rsqrt(v + eps) * gamma + beta


def _ar_step_kernel(t_ref, x_ref, w_ref, lnp_ref, bias_ref, ckv_ref,
                    k_hbm, v_hbm, flnp_ref,
                    y_ref, ko_hbm, vo_hbm,
                    xs_ref, xn_ref, q_ref, kst_ref, vst_ref, ctx_ref,
                    h_ref, ffa_ref, kb_ref, vb_ref, sems,
                    *, nb, heads, bk):
    """One decoded token through the full decoder stack.

    Grid (layer l, stage s); stages per layer:
      0 q | 1 k | 2 v (+ self-attention over the cache) | 3 o |
      4 cross-q (+ cross-attention) | 5 cross-o | 6-9 fc1 | 10-13 fc2.
    """
    l = pl.program_id(0)
    s = pl.program_id(1)
    t = t_ref[0]
    f32 = jnp.float32
    B, D = x_ref.shape
    hd = D // heads
    scale = hd ** -0.5
    w = w_ref[0, 0]

    @pl.when(jnp.logical_and(l == 0, s == 0))
    def _init_stream():
        # is_first quirk (reference STEVE/transformer.py:75-82): layer
        # 0's residual stream starts from the NORMED input
        xs_ref[...] = _ln(
            x_ref[...].astype(f32), lnp_ref[0, 0].astype(f32),
            lnp_ref[0, 1].astype(f32),
        )

    @pl.when(s == 0)
    def _stage_q():
        @pl.when(l == 0)
        def _first():
            xn_ref[...] = xs_ref[...].astype(xn_ref.dtype)

        @pl.when(l > 0)
        def _rest():
            xn_ref[...] = _ln(
                xs_ref[...], lnp_ref[0, 0].astype(f32),
                lnp_ref[0, 1].astype(f32),
            ).astype(xn_ref.dtype)

        q = jnp.dot(xn_ref[...], w, preferred_element_type=f32)
        q_ref[...] = (q * scale).astype(q_ref.dtype)

    @pl.when(s == 1)
    def _stage_k():
        k = jnp.dot(xn_ref[...], w, preferred_element_type=f32)
        kst_ref[0] = k.astype(kst_ref.dtype)
        dma = pl.make_async_copy(
            kst_ref, k_hbm.at[l, pl.ds(t, 1)], sems.at[0]
        )
        dma.start()
        dma.wait()

    @pl.when(s == 2)
    def _stage_v_attn():
        v = jnp.dot(xn_ref[...], w, preferred_element_type=f32)
        vst_ref[0] = v.astype(vst_ref.dtype)
        dma = pl.make_async_copy(
            vst_ref, v_hbm.at[l, pl.ds(t, 1)], sems.at[1]
        )
        dma.start()
        dma.wait()

        # streaming-softmax attention over cache rows [0, t) from HBM
        # plus the current row from VMEM. Rows beyond t in the last
        # block are masked.
        qv = q_ref[...].astype(f32)  # [B, D], already scaled

        def logits_of(blk32):
            # [R, B, D] x [B, D] -> per-head dots [R, B, H]
            prod = blk32 * qv[None]
            return jnp.sum(
                prod.reshape(blk32.shape[0], B, heads, hd), axis=-1
            )

        def body(i, carry):
            m, ssum, acc = carry
            cp_k = pl.make_async_copy(
                k_hbm.at[l, pl.ds(i * bk, bk)], kb_ref, sems.at[2]
            )
            cp_v = pl.make_async_copy(
                v_hbm.at[l, pl.ds(i * bk, bk)], vb_ref, sems.at[3]
            )
            cp_k.start()
            cp_v.start()
            cp_k.wait()
            cp_v.wait()
            kb32 = kb_ref[...].astype(f32)
            lg = logits_of(kb32)  # [bk, B, H]
            rows = i * bk + jax.lax.broadcasted_iota(
                jnp.int32, (bk, B, heads), 0
            )
            lg = jnp.where(rows < t, lg, -jnp.inf)
            bm = jnp.max(lg, axis=0)  # [B, H]
            m_new = jnp.maximum(m, bm)
            # exp(-inf - -inf) guard: m_new is finite once any row valid;
            # for i==0, m=-inf -> scale term exp(m - m_new) handled by
            # where below
            alpha = jnp.where(
                jnp.isfinite(m), jnp.exp(m - m_new), 0.0
            )
            p = jnp.exp(lg - m_new[None])  # masked rows -> exp(-inf)=0
            ssum_new = ssum * alpha + jnp.sum(p, axis=0)
            pb = jnp.repeat(p, hd, axis=2)  # [bk, B, D] broadcast/head
            pv = jnp.sum(pb * vb_ref[...].astype(f32), axis=0)  # [B, D]
            acc_new = acc * jnp.repeat(alpha, hd, axis=1) + pv
            return m_new, ssum_new, acc_new

        m0 = jnp.full((B, heads), -jnp.inf, f32)
        s0 = jnp.zeros((B, heads), f32)
        a0 = jnp.zeros((B, D), f32)
        nblk = (t + bk - 1) // bk
        m, ssum, acc = jax.lax.fori_loop(0, nblk, body, (m0, s0, a0))

        # current row (k/v just computed, still in VMEM)
        lg_t = jnp.sum(
            (kst_ref[0].astype(f32) * qv).reshape(B, heads, hd), axis=-1
        )  # [B, H]
        m_new = jnp.maximum(m, lg_t)
        alpha = jnp.where(jnp.isfinite(m), jnp.exp(m - m_new), 0.0)
        p_t = jnp.exp(lg_t - m_new)
        ssum = ssum * alpha + p_t
        acc = acc * jnp.repeat(alpha, hd, axis=1) + jnp.repeat(
            p_t, hd, axis=1
        ) * vst_ref[0].astype(f32)
        ctx_ref[...] = (acc / jnp.repeat(ssum, hd, axis=1)).astype(
            ctx_ref.dtype
        )

    @pl.when(s == 3)
    def _stage_o():
        xs_ref[...] += jnp.dot(
            ctx_ref[...], w, preferred_element_type=f32
        )

    @pl.when(s == 4)
    def _stage_cross_q():
        xn_ref[...] = _ln(
            xs_ref[...], lnp_ref[0, 2].astype(f32),
            lnp_ref[0, 3].astype(f32),
        ).astype(xn_ref.dtype)
        q2 = (
            jnp.dot(xn_ref[...], w, preferred_element_type=f32) * scale
        )  # [B, D]
        kc = ckv_ref[0, 0].astype(f32)  # [B, S, D]
        vc = ckv_ref[0, 1].astype(f32)
        S = kc.shape[1]
        lg = jnp.sum(
            (kc * q2[:, None]).reshape(B, S, heads, hd), axis=-1
        )  # [B, S, H]
        m = jnp.max(lg, axis=1, keepdims=True)
        p = jnp.exp(lg - m)
        p = p / jnp.sum(p, axis=1, keepdims=True)
        pb = jnp.repeat(p, hd, axis=2)  # [B, S, D]
        ctx_ref[...] = jnp.sum(pb * vc, axis=1).astype(ctx_ref.dtype)

    @pl.when(s == 5)
    def _stage_cross_o():
        xs_ref[...] += jnp.dot(
            ctx_ref[...], w, preferred_element_type=f32
        )

    @pl.when(jnp.logical_and(s >= 6, s <= 9))
    def _stage_fc1():
        @pl.when(s == 6)
        def _ln3():
            xn_ref[...] = _ln(
                xs_ref[...], lnp_ref[0, 4].astype(f32),
                lnp_ref[0, 5].astype(f32),
            ).astype(xn_ref.dtype)

        j = s - 6
        hpart = jnp.dot(
            xn_ref[...], w, preferred_element_type=f32
        ) + bias_ref[0, j].astype(f32)
        h_ref[j] = jnp.maximum(hpart, 0.0).astype(h_ref.dtype)

    @pl.when(jnp.logical_and(s >= 10, s <= 13))
    def _stage_fc2():
        j = s - 10
        part = jnp.dot(h_ref[j], w, preferred_element_type=f32)

        @pl.when(s == 10)
        def _set():
            ffa_ref[...] = part

        @pl.when(s > 10)
        def _acc():
            ffa_ref[...] += part

        @pl.when(s == 13)
        def _fin():
            xs_ref[...] += ffa_ref[...] + bias_ref[0, 4].astype(f32)

            @pl.when(l == nb - 1)
            def _final_ln():
                y_ref[...] = _ln(
                    xs_ref[...], flnp_ref[0].astype(f32),
                    flnp_ref[1].astype(f32),
                ).astype(y_ref.dtype)


def fused_ar_step(x, t, wstack, lnp, bias, ckv, k_cache, v_cache, flnp,
                  heads, interpret=None):
    """One fused decode step.

    x: [B, D] current token embedding (pos applied, bf16/f32)
    t: int32 scalar step index
    wstack: [nb, 14, D, D] weight chunks (see module docstring)
    lnp: [nb, 6, D] LN scale/bias x3; bias: [nb, 5, D] fc1 x4 + fc2
    ckv: [nb, 2, B, S, D] hoisted cross-attention K/V
    k_cache/v_cache: [nb, L, B, D] (donated, aliased to outputs)
    flnp: [2, D] final LN
    Returns (y [B, D], k_cache, v_cache).
    """
    from jax.experimental.pallas import tpu as pltpu

    if interpret is None:
        interpret = INTERPRET
    nb = wstack.shape[0]
    B, D = x.shape
    L = k_cache.shape[1]
    S = ckv.shape[3]
    bk = min(BK, L)
    t_arr = jnp.asarray(t, jnp.int32).reshape(1)

    grid = (nb, STAGES)
    out = pl.pallas_call(
        functools.partial(_ar_step_kernel, nb=nb, heads=heads, bk=bk),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),           # t
            pl.BlockSpec((B, D), lambda l, s: (0, 0)),       # x
            pl.BlockSpec((1, 1, D, D), lambda l, s: (l, s, 0, 0)),
            pl.BlockSpec((1, 6, D), lambda l, s: (l, 0, 0)),
            pl.BlockSpec((1, 5, D), lambda l, s: (l, 0, 0)),
            pl.BlockSpec((1, 2, B, S, D), lambda l, s: (l, 0, 0, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.ANY),            # k_cache
            pl.BlockSpec(memory_space=pltpu.ANY),            # v_cache
            pl.BlockSpec((2, D), lambda l, s: (0, 0)),       # final LN
        ],
        out_specs=(
            pl.BlockSpec((B, D), lambda l, s: (0, 0)),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, D), x.dtype),
            jax.ShapeDtypeStruct(k_cache.shape, k_cache.dtype),
            jax.ShapeDtypeStruct(v_cache.shape, v_cache.dtype),
        ),
        input_output_aliases={6: 1, 7: 2},
        scratch_shapes=[
            pltpu.VMEM((B, D), jnp.float32),        # xs (residual)
            pltpu.VMEM((B, D), x.dtype),            # xn
            pltpu.VMEM((B, D), x.dtype),            # q (scaled)
            pltpu.VMEM((1, B, D), k_cache.dtype),   # k row staging
            pltpu.VMEM((1, B, D), v_cache.dtype),   # v row staging
            pltpu.VMEM((B, D), x.dtype),            # ctx
            pltpu.VMEM((4, B, D), x.dtype),         # FFN hidden chunks
            pltpu.VMEM((B, D), jnp.float32),        # FFN accumulator
            pltpu.VMEM((bk, B, D), k_cache.dtype),  # k block buffer
            pltpu.VMEM((bk, B, D), v_cache.dtype),  # v block buffer
            pltpu.SemaphoreType.DMA((4,)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
        interpret=interpret,
    )(t_arr, x, wstack, lnp, bias, ckv, k_cache, v_cache, flnp)
    return out


def stack_decoder_params(params, nb, dtype=jnp.bfloat16):
    """Build the kernel's stacked operands from the TransformerDecoder
    param tree ({'blocks_i': {...}, 'layer_norm': {...}}).

    Chunk order per layer: q, k, v, o, cross-q, cross-o, fc1[:, jD:(j+1)D]
    for j in 0..3, fc2[jD:(j+1)D, :] for j in 0..3.
    """
    ws, lns, biases = [], [], []
    for i in range(nb):
        blk = params[f"blocks_{i}"]
        sa, ca, ffn = (
            blk["self_attn"], blk["encoder_decoder_attn"], blk["ffn"]
        )
        w1 = ffn["fc1"]["kernel"]
        w2 = ffn["fc2"]["kernel"]
        D = w1.shape[0]
        chunks = [
            sa["proj_q"]["kernel"], sa["proj_k"]["kernel"],
            sa["proj_v"]["kernel"], sa["proj_o"]["kernel"],
            ca["proj_q"]["kernel"], ca["proj_o"]["kernel"],
            *[w1[:, j * D:(j + 1) * D] for j in range(4)],
            *[w2[j * D:(j + 1) * D, :] for j in range(4)],
        ]
        ws.append(jnp.stack(chunks))
        lns.append(jnp.stack([
            blk["self_attn_layer_norm"]["scale"],
            blk["self_attn_layer_norm"]["bias"],
            blk["encoder_decoder_attn_layer_norm"]["scale"],
            blk["encoder_decoder_attn_layer_norm"]["bias"],
            blk["ffn_layer_norm"]["scale"],
            blk["ffn_layer_norm"]["bias"],
        ]))
        b1 = ffn["fc1"]["bias"]
        biases.append(jnp.stack(
            [b1[j * D:(j + 1) * D] for j in range(4)]
            + [ffn["fc2"]["bias"]]
        ))
    flnp = jnp.stack([
        params["layer_norm"]["scale"], params["layer_norm"]["bias"]
    ]).astype(jnp.float32)
    return (
        jnp.stack(ws).astype(dtype),
        jnp.stack(lns).astype(jnp.float32),
        jnp.stack(biases).astype(jnp.float32),
        flnp,
    )
