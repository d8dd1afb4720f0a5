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
from jax.experimental.pallas import tpu as pltpu

STAGES = 14
BK = 32  # cache rows per DMA block (VMEM budget note: the
# per-head f32 attention temporaries scale with BK; 32 blew the
# 128M scoped budget at the movi_e/base bench shape)
# interpret-mode escape hatch for CPU parity tests (the model path calls
# fused_ar_step without an interpret kwarg)
INTERPRET = False


def _ln(x32, gamma, beta, eps=1e-6):
    m = jnp.mean(x32, axis=-1, keepdims=True)
    v = jnp.mean((x32 - m) ** 2, axis=-1, keepdims=True)
    return (x32 - m) * jax.lax.rsqrt(v + eps) * gamma + beta


def _ar_step_kernel(t_ref, x_ref, w_ref, lnp_ref, bias_ref, ckv_ref,
                    k_hbm, v_hbm, flnp_ref, pos_ref, *rest,
                    nb, heads, bk, nh, int8=False):
    if int8:
        (wsc_ref, nx_ref, z_ref, ko_hbm, vo_hbm,
         xs_ref, xn_ref, q_ref, kst_ref, vst_ref, ctx_ref,
         h_ref, ffa_ref, kb_ref, vb_ref, lg_ref, zi_ref, sems) = rest
    else:
        (nx_ref, z_ref, ko_hbm, vo_hbm,
         xs_ref, xn_ref, q_ref, kst_ref, vst_ref, ctx_ref,
         h_ref, ffa_ref, kb_ref, vb_ref, lg_ref, zi_ref, sems) = rest

    def mm(a):
        """a @ (this cell's [D, D] weight chunk) -> f32.

        int8 mode is W8A8: the activation rows quantize dynamically
        (per-row amax/127) and the dot runs int8 x int8 -> int32 on
        the MXU, rescaled by row x column scales — weight HBM stream
        halved AND no VPU dequant sweep (the W8A16
        dequant-to-bf16 form measured 2x SLOWER than bf16: the int8 ->
        bf16 unpack is a VPU sweep over every streamed chunk,
        BENCH_NOTES round 5). Same numerics class as the eval-side
        INT8_SERVING (dynamic W8A8)."""
        f32_ = jnp.float32
        if int8:
            af = a.astype(f32_)
            amax = jnp.max(jnp.abs(af), axis=-1, keepdims=True)
            asc = jnp.maximum(amax, 1e-8) * (1.0 / 127.0)
            ai = jnp.round(af / asc).astype(jnp.int8)
            acc = jax.lax.dot_general(
                ai, w_ref[0, 0], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            return acc.astype(f32_) * asc * wsc_ref[0, 0].astype(f32_)
        return jnp.dot(a, w_ref[0, 0], preferred_element_type=f32_)
    """One decoded token through the full decoder stack AND the token
    head: grid row l < nb runs layer l's 14 stages
      0 q | 1 k | 2 v (+ self-attention over the cache) | 3 o |
      4 cross-q (+ cross-attention) | 5 cross-o | 6-9 fc1 | 10-13 fc2;
    grid row l == nb is the HEAD row: s < nh computes vocab-logit chunk
    s, s == nh takes the argmax (emitting z_ref) and s in [nh, 2nh)
    accumulates the next token's dictionary embedding as one-hot MXU
    matmuls — so the whole decode step is ONE kernel launch and the
    scan body carries (next_x, caches) with no per-step XLA ops.
    """
    l = pl.program_id(0)
    s = pl.program_id(1)
    t = t_ref[0]
    f32 = jnp.float32
    B, D = x_ref.shape
    hd = D // heads
    scale = hd ** -0.5

    @pl.when(jnp.logical_and(l == 0, s == 0))
    def _init_stream():
        # is_first quirk (reference STEVE/transformer.py:75-82): layer
        # 0's residual stream starts from the NORMED input; the learned
        # positional row t is added here (the XLA path's pos.at)
        xin = x_ref[...].astype(f32) + pos_ref[pl.ds(t, 1)].astype(f32)
        xs_ref[...] = _ln(
            xin, lnp_ref[0, 0].astype(f32), lnp_ref[0, 1].astype(f32),
        )

    @pl.when(jnp.logical_and(s == 0, l < nb))
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

        q = mm(xn_ref[...])
        q_ref[...] = (q * scale).astype(q_ref.dtype)

    @pl.when(jnp.logical_and(s == 1, l < nb))
    def _stage_k():
        k = mm(xn_ref[...])
        kst_ref[0] = k.astype(kst_ref.dtype)
        # write row t via the ALIASED OUTPUT ref (writes to the input
        # ref are not guaranteed to reach the aliased output)
        dma = pltpu.make_async_copy(
            kst_ref, ko_hbm.at[l, pl.ds(t, 1)], sems.at[0]
        )
        dma.start()
        dma.wait()

    @pl.when(jnp.logical_and(s == 2, l < nb))
    def _stage_v_attn():
        v = mm(xn_ref[...])
        vst_ref[0] = v.astype(vst_ref.dtype)
        dma = pltpu.make_async_copy(
            vst_ref, vo_hbm.at[l, pl.ds(t, 1)], sems.at[1]
        )
        dma.start()
        dma.wait()

        # streaming-softmax attention over cache rows [0, t) from HBM
        # plus the current row from VMEM. Per-head 2-D state everywhere
        # (m/ssum [H, B], acc [H*B, hd]): Mosaic rejects arrays whose
        # lane dim is the tiny head count. Head slices are taken on the
        # REFS (vector loads) — lane-slicing a materialised value
        # lowers as an unsupported gather.

        # double-buffered cache stream: block i+1's DMA is in flight
        # while block i computes (slot = i % 2)
        def start_block(i, slot):
            pltpu.make_async_copy(
                k_hbm.at[l, pl.ds(i * bk, bk)], kb_ref.at[slot],
                sems.at[2 + slot],
            ).start()
            pltpu.make_async_copy(
                v_hbm.at[l, pl.ds(i * bk, bk)], vb_ref.at[slot],
                sems.at[4 + slot],
            ).start()

        def wait_block(i, slot):
            pltpu.make_async_copy(
                k_hbm.at[l, pl.ds(i * bk, bk)], kb_ref.at[slot],
                sems.at[2 + slot],
            ).wait()
            pltpu.make_async_copy(
                v_hbm.at[l, pl.ds(i * bk, bk)], vb_ref.at[slot],
                sems.at[4 + slot],
            ).wait()

        nblk = (t + bk - 1) // bk

        @pl.when(nblk > 0)
        def _prologue():
            start_block(0, 0)

        def body(i, carry):
            m, ssum, acc = carry  # [H, B], [H, B], [H*B, hd]
            slot = jax.lax.rem(i, 2)
            wait_block(i, slot)

            @pl.when(i + 1 < nblk)
            def _prefetch_next():
                start_block(i + 1, 1 - slot)

            rows = i * bk + jax.lax.broadcasted_iota(
                jnp.int32, (bk, B), 0
            )
            m_parts, s_parts, a_parts = [], [], []
            for hh in range(heads):
                sl = slice(hh * hd, (hh + 1) * hd)
                kb_h = kb_ref[slot, :, :, sl].astype(f32)  # [bk, B, hd]
                vb_h = vb_ref[slot, :, :, sl].astype(f32)
                q_h = q_ref[:, sl].astype(f32)        # [B, hd]
                lg = jnp.sum(kb_h * q_h[None], axis=-1)  # [bk, B]
                lg = jnp.where(rows < t, lg, -jnp.inf)
                bm = jnp.max(lg, axis=0, keepdims=True)  # [1, B]
                m_h = m[hh:hh + 1]
                m_new = jnp.maximum(m_h, bm)
                alpha = jnp.where(
                    jnp.isfinite(m_h), jnp.exp(m_h - m_new), 0.0
                )  # [1, B]
                p = jnp.exp(lg - m_new)  # masked rows -> 0
                s_new = ssum[hh:hh + 1] * alpha + jnp.sum(
                    p, axis=0, keepdims=True
                )
                pv = jnp.sum(p[:, :, None] * vb_h, axis=0)  # [B, hd]
                a_h = acc[hh * B:(hh + 1) * B]
                a_new = a_h * alpha.reshape(B, 1) + pv
                m_parts.append(m_new)
                s_parts.append(s_new)
                a_parts.append(a_new)
            return (
                jnp.concatenate(m_parts, axis=0),
                jnp.concatenate(s_parts, axis=0),
                jnp.concatenate(a_parts, axis=0),
            )

        m0 = jnp.full((heads, B), -jnp.inf, f32)
        s0 = jnp.zeros((heads, B), f32)
        a0 = jnp.zeros((heads * B, hd), f32)
        m, ssum, acc = jax.lax.fori_loop(0, nblk, body, (m0, s0, a0))

        # current row (k/v just computed, still in VMEM) + normalize
        for hh in range(heads):
            sl = slice(hh * hd, (hh + 1) * hd)
            kt_h = kst_ref[0, :, sl].astype(f32)   # [B, hd]
            vt_h = vst_ref[0, :, sl].astype(f32)
            q_h = q_ref[:, sl].astype(f32)
            lg_t = jnp.sum(
                kt_h * q_h, axis=-1, keepdims=True
            ).T  # [1, B]
            m_h = m[hh:hh + 1]
            m_new = jnp.maximum(m_h, lg_t)
            alpha = jnp.where(
                jnp.isfinite(m_h), jnp.exp(m_h - m_new), 0.0
            )
            p_t = jnp.exp(lg_t - m_new)  # [1, B]
            s_h = ssum[hh:hh + 1] * alpha + p_t
            a_h = (
                acc[hh * B:(hh + 1) * B] * alpha.reshape(B, 1)
                + p_t.reshape(B, 1) * vt_h
            )
            ctx_ref[:, sl] = (a_h / s_h.reshape(B, 1)).astype(ctx_ref.dtype)

    @pl.when(jnp.logical_and(s == 3, l < nb))
    def _stage_o():
        xs_ref[...] += mm(ctx_ref[...])

    @pl.when(jnp.logical_and(s == 4, l < nb))
    def _stage_cross_q():
        xn_ref[...] = _ln(
            xs_ref[...], lnp_ref[0, 2].astype(f32),
            lnp_ref[0, 3].astype(f32),
        ).astype(xn_ref.dtype)
        q2 = mm(xn_ref[...]) * scale  # [B, D]
        # per-head 2-D softmax over the S slots (see self-attn note);
        # head slices on the refs, cross-q staged via ctx scratch so the
        # value needs no lane-dim slicing
        ctx_ref[...] = q2.astype(ctx_ref.dtype)
        for hh in range(heads):
            sl = slice(hh * hd, (hh + 1) * hd)
            kc_h = ckv_ref[0, 0, :, :, sl].astype(f32)  # [B, S, hd]
            vc_h = ckv_ref[0, 1, :, :, sl].astype(f32)
            q2_h = ctx_ref[:, sl].astype(f32)           # [B, hd]
            lg = jnp.sum(kc_h * q2_h[:, None], axis=-1)  # [B, S]
            m = jnp.max(lg, axis=1, keepdims=True)
            p = jnp.exp(lg - m)
            p = p / jnp.sum(p, axis=1, keepdims=True)
            xn_ref[:, sl] = jnp.sum(
                p[:, :, None] * vc_h, axis=1
            ).astype(xn_ref.dtype)

    @pl.when(jnp.logical_and(s == 5, l < nb))
    def _stage_cross_o():
        # the cross context was staged into xn_ref (ctx_ref holds the
        # scaled cross-q used for the per-head ref slicing above)
        xs_ref[...] += mm(xn_ref[...])

    @pl.when(jnp.logical_and(jnp.logical_and(s >= 6, s <= 9), l < nb))
    def _stage_fc1():
        @pl.when(s == 6)
        def _ln3():
            xn_ref[...] = _ln(
                xs_ref[...], lnp_ref[0, 4].astype(f32),
                lnp_ref[0, 5].astype(f32),
            ).astype(xn_ref.dtype)

        j = s - 6
        hpart = mm(xn_ref[...]) + bias_ref[0, j].astype(f32)
        h_ref[j] = jnp.maximum(hpart, 0.0).astype(h_ref.dtype)

    @pl.when(jnp.logical_and(jnp.logical_and(s >= 10, s <= 13), l < nb))
    def _stage_fc2():
        j = s - 10
        part = mm(h_ref[j])

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
                xn_ref[...] = _ln(
                    xs_ref[...], flnp_ref[0].astype(f32),
                    flnp_ref[1].astype(f32),
                ).astype(xn_ref.dtype)

    # ---- head row (l == nb): logits -> argmax -> dict embedding ----
    @pl.when(jnp.logical_and(l == nb, s < nh))
    def _head_logits():
        lg_ref[s] = mm(xn_ref[...])

    @pl.when(jnp.logical_and(l == nb, s == nh))
    def _head_argmax():
        lane = jax.lax.broadcasted_iota(jnp.int32, (B, D), 1)
        mx = jnp.max(lg_ref[0], axis=-1, keepdims=True)
        for j in range(1, nh):
            mx = jnp.maximum(
                mx, jnp.max(lg_ref[j], axis=-1, keepdims=True)
            )
        big = jnp.int32(nh * D)
        z = jnp.min(
            jnp.where(lg_ref[0] == mx, lane, big), axis=-1, keepdims=True
        )
        for j in range(1, nh):
            z = jnp.minimum(z, jnp.min(
                jnp.where(lg_ref[j] == mx, lane + j * D, big),
                axis=-1, keepdims=True,
            ))
        zi_ref[...] = z
        z_ref[...] = z

    @pl.when(jnp.logical_and(
        l == nb, jnp.logical_and(s >= nh, s < 2 * nh)
    ))
    def _head_embed():
        j = s - nh
        lane = jax.lax.broadcasted_iota(jnp.int32, (B, D), 1)
        oh = (lane + j * D == zi_ref[...]).astype(x_ref.dtype)
        part = mm(oh)

        @pl.when(s == nh)
        def _set():
            ffa_ref[...] = part

        @pl.when(s > nh)
        def _acc():
            ffa_ref[...] += part

        @pl.when(s == 2 * nh - 1)
        def _emit():
            nx_ref[...] = ffa_ref[...].astype(nx_ref.dtype)


def fused_ar_step(x, t, wstack, lnp, bias, ckv, k_cache, v_cache, flnp,
                  pos, heads, nh, wscale=None, interpret=None):
    """One fused decode step (decoder body + token head, one launch).

    x: [B, D] current token embedding (RAW — pos row t is added inside)
    t: int32 scalar step index
    wstack: [nb + 1, 14, D, D] weight chunks; rows 0..nb-1 are layer
      chunks (see module docstring), row nb holds the head kernel's nh
      [D, D] column chunks then the dictionary's nh row chunks
    lnp: [nb, 6, D] LN scale/bias x3; bias: [nb, 5, D] fc1 x4 + fc2
    ckv: [nb, 2, B, S, D] hoisted cross-attention K/V
    k_cache/v_cache: [nb, L, B, D] (donated, aliased to outputs)
    flnp: [2, D] final LN; pos: [L, D] positional table
    nh: vocab chunks (V // D)
    wscale: optional [nb + 1, 14, 1, D] per-output-column scales — when
      given, wstack is int8 and each chunk dequants in-kernel (W8A16:
      halves the per-step weight stream, the rollout's HBM floor; a
      labeled serving variant in the INT8_SERVING class)
    Returns (next_x [B, D], z [B, 1] int32, k_cache, v_cache).
    """
    if interpret is None:
        interpret = INTERPRET
    nb = wstack.shape[0] - 1
    B, D = x.shape
    L = k_cache.shape[1]
    S = ckv.shape[3]
    # cache DMA block: the double-buffered [2, bk, B, D] slots and the
    # per-head f32 attention temporaries scale with bk*B — keep that
    # product ~constant so large serving batches (B=128 at the B=32
    # video bench) stay inside the VMEM budget
    bk = min(BK, L, max(8, (BK * 32) // max(B, 1)))
    t_arr = jnp.asarray(t, jnp.int32).reshape(1)

    grid = (nb + 1, STAGES)

    def w_index(l, s):
        # head row: chunks 0..2nh-1 (clamped so the zero-padded tail is
        # never streamed)
        return (
            l, jnp.where(l == nb, jnp.minimum(s, 2 * nh - 1), s), 0, 0
        )

    clamp_l = lambda l: jnp.minimum(l, nb - 1)
    int8 = wscale is not None
    in_specs = [
            pl.BlockSpec(memory_space=pltpu.SMEM),           # t
            pl.BlockSpec((B, D), lambda l, s: (0, 0)),       # x
            pl.BlockSpec((1, 1, D, D), w_index),
            pl.BlockSpec((1, 6, D), lambda l, s: (clamp_l(l), 0, 0)),
            pl.BlockSpec((1, 5, D), lambda l, s: (clamp_l(l), 0, 0)),
            pl.BlockSpec(
                (1, 2, B, S, D), lambda l, s: (clamp_l(l), 0, 0, 0, 0)
            ),
            pl.BlockSpec(memory_space=pl.ANY),            # k_cache
            pl.BlockSpec(memory_space=pl.ANY),            # v_cache
            pl.BlockSpec((2, D), lambda l, s: (0, 0)),       # final LN
            pl.BlockSpec((L, D), lambda l, s: (0, 0)),       # pos table
    ]
    args = [t_arr, x, wstack, lnp, bias, ckv, k_cache, v_cache, flnp, pos]
    if int8:
        in_specs.append(pl.BlockSpec((1, 1, 1, D), w_index))
        args.append(wscale)
    out = pl.pallas_call(
        functools.partial(
            _ar_step_kernel, nb=nb, heads=heads, bk=bk, nh=nh, int8=int8
        ),
        grid=grid,
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((B, D), lambda l, s: (0, 0)),       # next x
            pl.BlockSpec((B, 1), lambda l, s: (0, 0)),       # z ids
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, D), x.dtype),
            jax.ShapeDtypeStruct((B, 1), jnp.int32),
            jax.ShapeDtypeStruct(k_cache.shape, k_cache.dtype),
            jax.ShapeDtypeStruct(v_cache.shape, v_cache.dtype),
        ),
        input_output_aliases={6: 2, 7: 3},
        scratch_shapes=[
            pltpu.VMEM((B, D), jnp.float32),        # xs (residual)
            pltpu.VMEM((B, D), x.dtype),            # xn
            pltpu.VMEM((B, D), x.dtype),            # q (scaled)
            pltpu.VMEM((1, B, D), k_cache.dtype),   # k row staging
            pltpu.VMEM((1, B, D), v_cache.dtype),   # v row staging
            pltpu.VMEM((B, D), x.dtype),            # ctx
            pltpu.VMEM((4, B, D), x.dtype),         # FFN hidden chunks
            pltpu.VMEM((B, D), jnp.float32),        # FFN accumulator
            pltpu.VMEM((2, bk, B, D), k_cache.dtype),  # k block slots
            pltpu.VMEM((2, bk, B, D), v_cache.dtype),  # v block slots
            pltpu.VMEM((nh, B, D), jnp.float32),    # vocab logit chunks
            pltpu.VMEM((B, 1), jnp.int32),          # argmax ids
            pltpu.SemaphoreType.DMA((6,)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=127 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*args)
    return out


def stack_decoder_params(params, nb, head_w=None, dict_emb=None,
                         dtype=jnp.bfloat16):
    """Build the kernel's stacked operands from the TransformerDecoder
    param tree ({'blocks_i': {...}, 'layer_norm': {...}}).

    Chunk order per layer: q, k, v, o, cross-q, cross-o, fc1[:, jD:(j+1)D]
    for j in 0..3, fc2[jD:(j+1)D, :] for j in 0..3. When ``head_w``
    ([D, V]) and ``dict_emb`` ([V, D]) are given, a final HEAD row is
    appended: nh = V // D head column chunks, then nh dictionary row
    chunks, zero-padded to 14 (the zero tail is never streamed — the
    wrapper's index map clamps).
    """
    ws, lns, biases = [], [], []
    kern = lambda m: m["linear"]["kernel"]  # common.Dense wraps nn.Dense
    for i in range(nb):
        blk = params[f"blocks_{i}"]
        sa, ca, ffn = (
            blk["self_attn"], blk["encoder_decoder_attn"], blk["ffn"]
        )
        w1 = kern(ffn["fc1"])
        w2 = kern(ffn["fc2"])
        D = w1.shape[0]
        chunks = [
            kern(sa["proj_q"]), kern(sa["proj_k"]),
            kern(sa["proj_v"]), kern(sa["proj_o"]),
            kern(ca["proj_q"]), kern(ca["proj_o"]),
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
        b1 = ffn["fc1"]["linear"]["bias"]
        biases.append(jnp.stack(
            [b1[j * D:(j + 1) * D] for j in range(4)]
            + [ffn["fc2"]["linear"]["bias"]]
        ))
    flnp = jnp.stack([
        params["layer_norm"]["scale"], params["layer_norm"]["bias"]
    ]).astype(jnp.float32)
    if head_w is not None:
        D = head_w.shape[0]
        nh = head_w.shape[1] // D
        row = (
            [head_w[:, j * D:(j + 1) * D] for j in range(nh)]
            + [dict_emb[j * D:(j + 1) * D, :] for j in range(nh)]
        )
        row += [jnp.zeros((D, D), row[0].dtype)] * (STAGES - len(row))
        ws.append(jnp.stack(row))
    return (
        jnp.stack(ws).astype(dtype),
        jnp.stack(lns[:nb]).astype(jnp.float32),
        jnp.stack(biases[:nb]).astype(jnp.float32),
        flnp,
    )


def quantize_wstack(wstack):
    """Per-output-column symmetric int8 quantization of the stacked
    weight chunks: returns (int8 chunks, [R, 14, 1, D] f32 scales).
    fc2/dict row-chunks quantize per chunk (finer than whole-matrix
    granularity; dequant happens before cross-chunk accumulation, so
    the partial sums compose exactly)."""
    amax = jnp.max(jnp.abs(wstack.astype(jnp.float32)), axis=2,
                   keepdims=True)
    scale = jnp.maximum(amax, 1e-8) / 127.0
    wi8 = jnp.round(wstack.astype(jnp.float32) / scale).astype(jnp.int8)
    return wi8, scale
