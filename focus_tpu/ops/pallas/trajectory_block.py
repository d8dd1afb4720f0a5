"""Fully-fused trajectory attention: stage 1 + stage 2 in one Pallas kernel.

Per grid cell (batch, query-block) the kernel computes, entirely in VMEM:

  1. per-head, per-frame spatial attention  xs[f, q, :]   (stage 1)
  2. the diagonal (own-frame) aggregate     x_diag[q, :]
  3. q2 = x_diag @ Wq2, k2_f = xs_f @ Wk2   (the stage-2 projections)
  4. temporal softmax over F and the weighted sum of xs   (stage 2,
     use_original_code=True semantics: values are the stage-1 aggregates)

Only the [BQ, C] result is written to HBM — the [B, S, F, C] aggregate
tensor of the unfused path (~154 MB at MF-224 scale, re-read several
times) never exists. Backward recomputes through the XLA composition
(custom_vjp), mirroring flash-attention's remat strategy.

Semantics follow reference slowfast/models/attention.py:499-557 for the
non-CLS tokens; the CLS row is handled outside (cheap single-query
attention).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from focus_tpu.ops import attention as attn_ops


def _pick_bq(S: int, block_q: int) -> int:
    """Largest multiple-of-8 query block <= block_q that divides S
    without inflating the grid (at most one extra cell vs the padded
    grid). A pad-free grid skips the per-layer HBM q-pad + out
    slice-back copies AND the kernel work on the up-to-bq-1 garbage pad
    rows: at MF-224 (S=1568, block_q=256) this picks bq=224 — the same
    7 grid cells as the padded 1792-row grid but 12.5% fewer query rows
    of stage-1/stage-2 work (round-5 perf track)."""
    bq = min(block_q, _round_up(S, 8))
    if S % bq == 0:
        return bq
    cells = -(-S // bq)
    for cand in range(bq - 8, 63, -8):
        if S % cand == 0 and -(-S // cand) <= cells + 1:
            return cand
    return bq


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


_LOG2E = 1.4426950408889634


def _fused_kernel_v3(q_ref, k_ref, v_ref, wq2_ref, bq2_ref, wk2_ref, bk2_ref,
                     o_ref, xs_ref, diag_ref, *, scale, n_valid, f, h, bq,
                     nomax=True, inline_diag=False, stage2_bf16=False,
                     diag_frame=False, fouter=False):
    """Fused trajectory core, VPU-oriented (feature-flagged so each
    optimisation can be measured in isolation; the shipped defaults are
    the measured-best combination):

    - ``nomax``: stage-1 softmax without the max-subtraction pass —
      ``exp2(min(logits * scale * log2e, 110))`` (post-LN logits are far
      below the 2^110 overflow guard); the normalising division moves
      from the [BQ, N] weight matrix to the [BQ, hd] PV output, and
      padded key columns need no mask pass (padded k/v rows are zero so
      pads contribute nothing to PV; the normalising sum reduces the
      valid column slice only).
    - ``inline_diag``: the diagonal (own-frame) aggregate is collected
      while frames stream (a masked select only on the frames that
      intersect the query block) instead of an F-pass selection loop in
      stage 2.
    - ``stage2_bf16``: stage-2 trajectory logits multiply in bf16 and
      accumulate in f32 — the same numerics as the XLA path's bf16
      einsum with f32 ``preferred_element_type``.

    Grid (b, q_block, frame); frame innermost. q_ref: [1, BQ, C];
    k_ref/v_ref: [1, 1, N_pad, C]; scratch xs_ref: [F, BQ, C],
    diag_ref: [BQ, C].
    """
    C = q_ref.shape[-1]
    hd = C // h
    n_pad = k_ref.shape[2]
    qi = pl.program_id(1)
    fi = pl.program_id(2)
    c = scale * _LOG2E

    tok = qi * bq + jax.lax.broadcasted_iota(jnp.int32, (bq, 1), 0)
    fq = tok // n_valid  # each query's own frame
    # frame fi covers tokens [fi*n, (fi+1)*n); skip the diag update when
    # it cannot intersect this query block
    intersects = jnp.logical_and(
        fi * n_valid < qi * bq + bq, (fi + 1) * n_valid > qi * bq
    )

    # ---- stage 1 for this frame, all heads ----
    for hi in range(h):
        sl = slice(hi * hd, (hi + 1) * hd)
        logits = jax.lax.dot_general(
            q_ref[0, :, sl], k_ref[0, 0, :, sl],
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [BQ, N_pad]
        if nomax:
            p = jnp.exp2(jnp.minimum(logits * c, 110.0))
            # normalise over the VALID columns only: summing the whole row
            # and subtracting the constant pad contribution (pads are
            # exp2(0)=1) cancels catastrophically when every valid logit is
            # strongly negative (valid mass below ulp(pad_count) -> s ~ 0
            # -> inf/NaN). A column slice needs no mask pass and has no
            # cancellation; the floor guards full underflow (all valid
            # logits*scale < -87 nats -> degrades to zeros, not NaN).
            s = jnp.maximum(
                jnp.sum(p[:, :n_valid], axis=-1, keepdims=True), 1e-30
            )
            o = jax.lax.dot_general(
                p.astype(v_ref.dtype), v_ref[0, 0, :, sl],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            ob = (o / s).astype(xs_ref.dtype)
        else:
            logits = logits * scale
            if n_valid < n_pad:
                col = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
                logits = jnp.where(col < n_valid, logits, -jnp.inf)
            m = jnp.max(logits, axis=-1, keepdims=True)
            p = jnp.exp(logits - m)
            p = p / jnp.sum(p, axis=-1, keepdims=True)
            ob = jax.lax.dot_general(
                p.astype(v_ref.dtype), v_ref[0, 0, :, sl],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(xs_ref.dtype)
        xs_ref[fi, :, sl] = ob

        if inline_diag:
            @pl.when(intersects)
            def _collect_diag(ob=ob, sl=sl):
                diag_ref[:, sl] = jnp.where(fq == fi, ob, diag_ref[:, sl])

    if diag_frame:
        # one whole-row masked write per intersecting frame (cheaper than
        # per-head selects and than the F-pass loop in stage 2)
        @pl.when(intersects)
        def _collect_diag_frame():
            diag_ref[...] = jnp.where(fq == fi, xs_ref[fi], diag_ref[...])

    # ---- stage 2 on the final frame step ----
    @pl.when(fi == f - 1)
    def _stage2():
        if inline_diag or diag_frame:
            x_diag = diag_ref[...]
        else:
            x_diag = jnp.zeros((bq, C), xs_ref.dtype)
            for f2 in range(f):
                x_diag = x_diag + jnp.where(
                    fq == f2, xs_ref[f2], jnp.zeros((), xs_ref.dtype)
                )
        q2 = jax.lax.dot_general(
            x_diag, wq2_ref[...].astype(xs_ref.dtype),
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        ) + bq2_ref[0].astype(jnp.float32)
        # fold the attention scale in once; bk2 is constant over frames
        # and cancels in the stage-2 softmax
        q2 = q2 * scale
        wk2 = wk2_ref[...]
        if fouter:
            # f2-outer ordering: convert each frame's aggregate to f32
            # once and reuse it across all heads (the h-outer ordering
            # converts it h times)
            gs = [
                jax.lax.dot_general(
                    q2[:, hi * hd:(hi + 1) * hd].astype(xs_ref.dtype),
                    wk2[:, hi * hd:(hi + 1) * hd],
                    (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                for hi in range(h)
            ]
            cols = [[None] * f for _ in range(h)]
            for f2 in range(f):
                xs_f = xs_ref[f2].astype(jnp.float32)
                for hi in range(h):
                    cols[hi][f2] = jnp.sum(
                        gs[hi] * xs_f, axis=-1, keepdims=True
                    )
            outs = []
            for hi in range(h):
                sl = slice(hi * hd, (hi + 1) * hd)
                l2 = jnp.concatenate(cols[hi], axis=-1)
                m2 = jnp.max(l2, axis=-1, keepdims=True)
                a2 = jnp.exp(l2 - m2)
                a2 = a2 / jnp.sum(a2, axis=-1, keepdims=True)
                acc = jnp.zeros((bq, hd), jnp.float32)
                for f2 in range(f):
                    acc = acc + a2[:, f2:f2 + 1] * xs_ref[f2, :, sl].astype(
                        jnp.float32
                    )
                outs.append(acc)
            o_ref[0] = jnp.concatenate(outs, axis=-1).astype(o_ref.dtype)
            return
        outs = []
        for hi in range(h):
            sl = slice(hi * hd, (hi + 1) * hd)
            # reassociated stage-2 logits (BENCH_NOTES queue #1):
            # g_h[q, :] = q2_h[q] @ Wk2[:, sl]^T
            g_h = jax.lax.dot_general(
                q2[:, sl].astype(xs_ref.dtype), wk2[:, sl],
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            if stage2_bf16:
                g_h = g_h.astype(xs_ref.dtype)
                cols = [
                    jnp.sum(
                        (g_h * xs_ref[f2]).astype(jnp.float32),
                        axis=-1, keepdims=True,
                    )
                    for f2 in range(f)
                ]
            else:
                cols = [
                    jnp.sum(
                        g_h * xs_ref[f2].astype(jnp.float32),
                        axis=-1, keepdims=True,
                    )
                    for f2 in range(f)
                ]
            l2 = jnp.concatenate(cols, axis=-1)  # [BQ, F] (scale folded)
            m2 = jnp.max(l2, axis=-1, keepdims=True)
            a2 = jnp.exp(l2 - m2)
            a2 = a2 / jnp.sum(a2, axis=-1, keepdims=True)
            acc = jnp.zeros((bq, hd), jnp.float32)
            for f2 in range(f):
                acc = acc + a2[:, f2:f2 + 1] * xs_ref[f2, :, sl].astype(
                    jnp.float32
                )
            outs.append(acc)
        o_ref[0] = jnp.concatenate(outs, axis=-1).astype(o_ref.dtype)


def _fused_kernel_v4(q_ref, k_ref, v_ref, wq2_ref, bq2_ref, wk2_ref, bk2_ref,
                     o_ref, xs_ref, diag_ref, *pads, scale, n_valid, f, h, bq,
                     skip_stage2=False, stage2_k2mm=False,
                     prescale_q=False, stage1="f32", dense_kv=False):
    """v4: stage-1 QK batched across frames.

    v3's grid is (b, q_block, frame) with one [BQ, hd] x [hd, N] matmul
    per (head, frame) — 2*h*f tiny MXU launches per query block, whose
    fixed launch/drain latency dominates the measured 9.3 us/cell
    (BENCH_NOTES round 2 kernel study). Here the grid is (b, q_block)
    and the per-head QK runs once over the frame-concatenated keys,
    [BQ, hd] x [hd, F*N] — h launches instead of h*f, each deep enough
    to stream. The PV product still runs per frame (each frame's
    aggregate must stay separate for stage 2), as does the softmax
    normalisation, slicing the wide logit matrix at lane-aligned N_pad
    boundaries. Stage 2 is v3's measured-best (fouter) form.

    k_ref/v_ref: [1, F*N_pad, C] (frame-major rows); scratch as v3.
    """
    C = q_ref.shape[-1]
    hd = C // h
    qi = pl.program_id(1)
    c = scale * _LOG2E

    if dense_kv:
        # round-4 trace finding: the wrapper-side HBM pad (196 -> 256
        # rows per frame) + its layout copies cost ~5-7 ms/step at
        # MF-224 (BENCH_NOTES round 4 trace ledger). Here k/v arrive
        # DENSE ([1, F*N, C]) and the padded layout is built once per
        # batch row in VMEM scratch — the q-block grid reuses it.
        kp_ref, vp_ref = pads
        n_pad = kp_ref.shape[0] // f

        @pl.when(qi == 0)
        def _build_padded_kv():
            kp_ref[...] = jnp.zeros_like(kp_ref)
            vp_ref[...] = jnp.zeros_like(vp_ref)
            for fi in range(f):
                rows_dst = slice(fi * n_pad, fi * n_pad + n_valid)
                rows_src = slice(fi * n_valid, (fi + 1) * n_valid)
                kp_ref[rows_dst] = k_ref[0, rows_src]
                vp_ref[rows_dst] = v_ref[0, rows_src]

        def kread(rows, cols):
            return kp_ref[rows, cols]

        def vread(rows, cols):
            return vp_ref[rows, cols]
    else:
        n_pad = k_ref.shape[1] // f

        def kread(rows, cols):
            return k_ref[0, rows, cols]

        def vread(rows, cols):
            return v_ref[0, rows, cols]

    tok = qi * bq + jax.lax.broadcasted_iota(jnp.int32, (bq, 1), 0)
    fq = tok // n_valid

    if stage1 != "f32":
        # Valid-row frame-selector matrix for MXU-side normaliser sums:
        # sum_mat[r, f2] = 1 where row r is a VALID key of frame f2, so
        # s[:, f2] = p @ sum_mat picks up every windowed sum in ONE
        # matmul (4 MFLOP/cell) instead of f VPU slice-reduction passes
        # over the [BQ, F*N_pad] weight matrix.
        rows = jax.lax.broadcasted_iota(jnp.int32, (f * n_pad, f), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (f * n_pad, f), 1)
        sum_mat = jnp.logical_and(
            rows // n_pad == cols, rows % n_pad < n_valid
        ).astype(v_ref.dtype)

    # ---- stage 1: per head, QK over all frames at once ----
    for hi in range(h):
        sl = slice(hi * hd, (hi + 1) * hd)
        if stage1 != "f32":
            # Low-VPU stage-1 forms (labeled variants; see STAGE1 notes
            # in the module docstring / BENCH_NOTES round 4):
            #  - "mxu_sum": weights rounded once to the PV dtype (the PV
            #    product already consumed them at that precision) and the
            #    per-frame normalisers computed on the MXU from the SAME
            #    rounded weights — removes the f windowed VPU reduction
            #    passes and keeps numerator/denominator self-consistent.
            #  - "bf16": additionally evaluates multiply+exp2 at bf16 —
            #    softmax logits round to ~2^-9 absolute, a numerics
            #    change beyond bf16-class (serving-variant only).
            logits = jax.lax.dot_general(
                q_ref[0, :, sl], kread(slice(None), sl),
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [BQ, F*N_pad]
            if stage1 == "bf16":
                lp = logits.astype(jnp.bfloat16) * jnp.bfloat16(c)
                pb = jnp.exp2(jnp.minimum(lp, jnp.bfloat16(110.0))).astype(
                    v_ref.dtype
                )
            else:  # mxu_sum
                pb = jnp.exp2(jnp.minimum(logits * c, 110.0)).astype(
                    v_ref.dtype
                )
            s_all = jnp.maximum(
                jax.lax.dot_general(
                    pb, sum_mat, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ),
                1e-30,
            )  # [BQ, F]
            for fi in range(f):
                o = jax.lax.dot_general(
                    pb[:, fi * n_pad:(fi + 1) * n_pad],
                    vread(slice(fi * n_pad, (fi + 1) * n_pad), sl),
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                xs_ref[fi, :, sl] = (o / s_all[:, fi:fi + 1]).astype(
                    xs_ref.dtype
                )
            continue
        if prescale_q:
            # fold the exp2 softmax constant into the [BQ, hd] MXU
            # operand (32x narrower than the [BQ, F*N_pad] logit matrix
            # the multiply otherwise sweeps); costs one extra bf16
            # rounding of q*c — the same numerics class as the bf16
            # kernel inputs themselves
            qs = q_ref[0, :, sl] * jnp.asarray(c, q_ref.dtype)
            logits = jax.lax.dot_general(
                qs, kread(slice(None), sl), (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            p = jnp.exp2(jnp.minimum(logits, 110.0))
        else:
            logits = jax.lax.dot_general(
                q_ref[0, :, sl], kread(slice(None), sl),
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [BQ, F*N_pad]
            p = jnp.exp2(jnp.minimum(logits * c, 110.0))
        for fi in range(f):
            pf = p[:, fi * n_pad:(fi + 1) * n_pad]
            # valid-column slice-sum: no pad-count cancellation (see v3)
            s = jnp.maximum(
                jnp.sum(pf[:, :n_valid], axis=-1, keepdims=True), 1e-30
            )
            o = jax.lax.dot_general(
                pf.astype(v_ref.dtype),
                vread(slice(fi * n_pad, (fi + 1) * n_pad), sl),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            xs_ref[fi, :, sl] = (o / s).astype(xs_ref.dtype)

    # ---- diagonal collect (v3 diag_frame form) ----
    for fi in range(f):
        inter = jnp.logical_and(
            fi * n_valid < qi * bq + bq, (fi + 1) * n_valid > qi * bq
        )

        @pl.when(inter)
        def _collect_diag(fi=fi):
            diag_ref[...] = jnp.where(fq == fi, xs_ref[fi], diag_ref[...])

    if skip_stage2:  # ablation timing only (output is the diagonal)
        o_ref[0] = diag_ref[...].astype(o_ref.dtype)
        return
    # ---- stage 2 (v3 fouter form) ----
    x_diag = diag_ref[...]
    q2 = jax.lax.dot_general(
        x_diag, wq2_ref[...].astype(xs_ref.dtype),
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
    ) + bq2_ref[0].astype(jnp.float32)
    q2 = q2 * scale
    wk2 = wk2_ref[...]
    cols = [[None] * f for _ in range(h)]
    if stage2_k2mm:
        # MXU-side stage-2 logits: project the frame aggregates through
        # Wk2 in ONE frame-stacked matmul per head ([F*BQ, C] x [C, hd])
        # and reduce the remaining rowwise dot over hd=64 instead of
        # C=768 — trades 2.4 GFLOP/cell of MXU for 12x fewer VPU
        # reduction elements
        xs2d = xs_ref[...].reshape(f * bq, C)
        for hi in range(h):
            sl = slice(hi * hd, (hi + 1) * hd)
            k2 = jax.lax.dot_general(
                xs2d, wk2[:, sl], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).reshape(f, bq, hd)
            q2_h = q2[:, sl]
            for f2 in range(f):
                cols[hi][f2] = jnp.sum(
                    q2_h * k2[f2], axis=-1, keepdims=True
                )
    else:
        gs = [
            jax.lax.dot_general(
                q2[:, hi * hd:(hi + 1) * hd].astype(xs_ref.dtype),
                wk2[:, hi * hd:(hi + 1) * hd],
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            for hi in range(h)
        ]
        for f2 in range(f):
            xs_f = xs_ref[f2].astype(jnp.float32)
            for hi in range(h):
                cols[hi][f2] = jnp.sum(
                    gs[hi] * xs_f, axis=-1, keepdims=True
                )
    outs = []
    for hi in range(h):
        sl = slice(hi * hd, (hi + 1) * hd)
        l2 = jnp.concatenate(cols[hi], axis=-1)
        m2 = jnp.max(l2, axis=-1, keepdims=True)
        a2 = jnp.exp(l2 - m2)
        a2 = a2 / jnp.sum(a2, axis=-1, keepdims=True)
        acc = jnp.zeros((bq, hd), jnp.float32)
        for f2 in range(f):
            acc = acc + a2[:, f2:f2 + 1] * xs_ref[f2, :, sl].astype(
                jnp.float32
            )
        outs.append(acc)
    o_ref[0] = jnp.concatenate(outs, axis=-1).astype(o_ref.dtype)


def _fused_fwd_pallas_v4(q, kf, vf, wq2, bq2, wk2, bk2, scale, heads,
                         block_q: int = 256, interpret: bool = False,
                         skip_stage2: bool = False,
                         stage2_k2mm: bool = False,
                         prescale_q: bool = False,
                         stage1: str = "f32",
                         dense_kv: bool = False):
    """v4 wrapper: grid (b, q_block); keys/values frame-concatenated.

    dense_kv: ship k/v to the kernel UNPADDED ([B, F*N, C]) and build
    the lane-aligned padded layout in VMEM scratch once per batch row —
    removes the per-layer HBM pad+copy of two [B, F*256, C] buffers
    (round-4 trace ledger: ~5-7 ms/step at MF-224).
    """
    from jax.experimental.pallas import tpu as pltpu

    B, S, C = q.shape
    F, N = kf.shape[1], kf.shape[2]
    n_pad = _round_up(N, 128)
    if not dense_kv and n_pad != N:
        pad = [(0, 0), (0, 0), (0, n_pad - N), (0, 0)]
        kf = jnp.pad(kf, pad)
        vf = jnp.pad(vf, pad)
    n_rows = N if dense_kv else n_pad
    kf2 = kf.reshape(B, F * n_rows, C)
    vf2 = vf.reshape(B, F * n_rows, C)
    bq = _pick_bq(S, block_q)
    s_pad = _round_up(S, bq)
    if s_pad != S:
        q = jnp.pad(q, [(0, 0), (0, s_pad - S), (0, 0)])
    bq2_2d = bq2.reshape(1, C)
    bk2_2d = bk2.reshape(1, C)

    scratch = [
        pltpu.VMEM((F, bq, C), q.dtype),
        pltpu.VMEM((bq, C), q.dtype),
    ]
    if dense_kv:
        scratch += [
            pltpu.VMEM((F * n_pad, C), kf.dtype),
            pltpu.VMEM((F * n_pad, C), vf.dtype),
        ]
    grid = (B, s_pad // bq)
    out = pl.pallas_call(
        functools.partial(
            _fused_kernel_v4, scale=scale, n_valid=N, f=F, h=heads, bq=bq,
            skip_stage2=skip_stage2, stage2_k2mm=stage2_k2mm,
            prescale_q=prescale_q, stage1=stage1, dense_kv=dense_kv,
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bq, C), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, F * n_rows, C), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, F * n_rows, C), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((C, C), lambda b, i: (0, 0)),
            pl.BlockSpec((1, C), lambda b, i: (0, 0)),
            pl.BlockSpec((C, C), lambda b, i: (0, 0)),
            pl.BlockSpec((1, C), lambda b, i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, bq, C), lambda b, i: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct((B, s_pad, C), q.dtype),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            # the per-b scratch build (dense_kv) relies on qi==0 running
            # first within each batch row — sequential semantics, like
            # v6's per-b k2v scratch
            dimension_semantics=(
                ("arbitrary" if dense_kv else "parallel"), "arbitrary"
            ),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(q, kf2, vf2, wq2, bq2_2d, wk2, bk2_2d)
    return out[:, :S]


def _fused_kernel_v7(q_ref, k_ref, v_ref, wq2_ref, bq2_ref, wk2_ref, bk2_ref,
                     o_ref, xs_ref, diag_ref, *, scale, n_valid, f, h, bq):
    """v7: transposed-packed stage-1 (round-4 perf track).

    v4 sweeps min+exp2 over a [BQ, F*N_pad] logit matrix with N padded
    to the 128-lane boundary (196 -> 256 at MF-224: 23% of the dominant
    VPU pass burns on pad lanes), then runs f windowed VPU slice-sums
    per head for the normalisers. Here the logits are computed
    TRANSPOSED — [F*np8, BQ] with keys on the sublane axis — so frames
    only pad to the 8-sublane boundary (196 -> 200): the min+exp2 sweep
    covers 1600 instead of 2048 rows (-22% lanes), and the per-frame
    normaliser sums become ONE masked [F, F*np8] x [F*np8, BQ] MXU
    matmul per head (precision HIGHEST so the f32 weights reduce at
    f32 precision, matching the v4 f32-mode normaliser numerics),
    removing all windowed VPU reduction passes. PV products contract
    the sublane axis directly ([np8, BQ]^T x [np8, hd]); pad rows carry
    v=0 so their p=exp2(0)=1 contributes nothing, and the sum mask
    excludes them exactly (no pad-count cancellation hazard).
    Diagonal collect and stage 2 are v4's unchanged.

    k_ref/v_ref: [1, F*np8, C] (frame-major rows, np8 = roundup(N, 8)).
    """
    C = q_ref.shape[-1]
    hd = C // h
    np8 = k_ref.shape[1] // f
    qi = pl.program_id(1)
    c = scale * _LOG2E

    tok = qi * bq + jax.lax.broadcasted_iota(jnp.int32, (bq, 1), 0)
    fq = tok // n_valid

    # [F, F*np8] valid-row selector: mask[f2, r] = 1 iff row r is a
    # valid (non-pad) key of frame f2. Built once per cell (~F*F*np8
    # lanes, negligible next to the logit sweep).
    rows = jax.lax.broadcasted_iota(jnp.int32, (f, f * np8), 1)
    frs = jax.lax.broadcasted_iota(jnp.int32, (f, f * np8), 0)
    sum_mask = jnp.logical_and(
        rows // np8 == frs, rows % np8 < n_valid
    ).astype(jnp.float32)

    # ---- stage 1: per head, transposed QK over all frames at once ----
    for hi in range(h):
        sl = slice(hi * hd, (hi + 1) * hd)
        logits_t = jax.lax.dot_general(
            k_ref[0, :, sl], q_ref[0, :, sl],
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [F*np8, BQ]
        p = jnp.exp2(jnp.minimum(logits_t * c, 110.0))
        s_all = jnp.maximum(
            jax.lax.dot_general(
                sum_mask, p, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            ),
            1e-30,
        )  # [F, BQ]
        s_t = s_all.T  # [BQ, F]
        for fi in range(f):
            o = jax.lax.dot_general(
                p[fi * np8:(fi + 1) * np8].astype(v_ref.dtype),
                v_ref[0, fi * np8:(fi + 1) * np8, sl],
                (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [BQ, hd]
            xs_ref[fi, :, sl] = (o / s_t[:, fi:fi + 1]).astype(xs_ref.dtype)

    # ---- diagonal collect (v4/diag_frame form) ----
    for fi in range(f):
        inter = jnp.logical_and(
            fi * n_valid < qi * bq + bq, (fi + 1) * n_valid > qi * bq
        )

        @pl.when(inter)
        def _collect_diag(fi=fi):
            diag_ref[...] = jnp.where(fq == fi, xs_ref[fi], diag_ref[...])

    # ---- stage 2 (v4 fouter form, unchanged) ----
    x_diag = diag_ref[...]
    q2 = jax.lax.dot_general(
        x_diag, wq2_ref[...].astype(xs_ref.dtype),
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
    ) + bq2_ref[0].astype(jnp.float32)
    q2 = q2 * scale
    wk2 = wk2_ref[...]
    cols = [[None] * f for _ in range(h)]
    gs = [
        jax.lax.dot_general(
            q2[:, hi * hd:(hi + 1) * hd].astype(xs_ref.dtype),
            wk2[:, hi * hd:(hi + 1) * hd],
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        for hi in range(h)
    ]
    for f2 in range(f):
        xs_f = xs_ref[f2].astype(jnp.float32)
        for hi in range(h):
            cols[hi][f2] = jnp.sum(gs[hi] * xs_f, axis=-1, keepdims=True)
    outs = []
    for hi in range(h):
        sl = slice(hi * hd, (hi + 1) * hd)
        l2 = jnp.concatenate(cols[hi], axis=-1)
        m2 = jnp.max(l2, axis=-1, keepdims=True)
        a2 = jnp.exp(l2 - m2)
        a2 = a2 / jnp.sum(a2, axis=-1, keepdims=True)
        acc = jnp.zeros((bq, hd), jnp.float32)
        for f2 in range(f):
            acc = acc + a2[:, f2:f2 + 1] * xs_ref[f2, :, sl].astype(
                jnp.float32
            )
        outs.append(acc)
    o_ref[0] = jnp.concatenate(outs, axis=-1).astype(o_ref.dtype)


def _fused_fwd_pallas_v7(q, kf, vf, wq2, bq2, wk2, bk2, scale, heads,
                         block_q: int = 256, interpret: bool = False):
    """v7 wrapper: keys/values frame-concatenated at 8-row packing."""
    from jax.experimental.pallas import tpu as pltpu

    B, S, C = q.shape
    F, N = kf.shape[1], kf.shape[2]
    np8 = _round_up(N, 8)
    if np8 != N:
        pad = [(0, 0), (0, 0), (0, np8 - N), (0, 0)]
        kf = jnp.pad(kf, pad)
        vf = jnp.pad(vf, pad)
    kf2 = kf.reshape(B, F * np8, C)
    vf2 = vf.reshape(B, F * np8, C)
    bq = min(block_q, _round_up(S, 8))
    s_pad = _round_up(S, bq)
    if s_pad != S:
        q = jnp.pad(q, [(0, 0), (0, s_pad - S), (0, 0)])
    bq2_2d = bq2.reshape(1, C)
    bk2_2d = bk2.reshape(1, C)

    grid = (B, s_pad // bq)
    out = pl.pallas_call(
        functools.partial(
            _fused_kernel_v7, scale=scale, n_valid=N, f=F, h=heads, bq=bq,
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bq, C), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, F * np8, C), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, F * np8, C), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((C, C), lambda b, i: (0, 0)),
            pl.BlockSpec((1, C), lambda b, i: (0, 0)),
            pl.BlockSpec((C, C), lambda b, i: (0, 0)),
            pl.BlockSpec((1, C), lambda b, i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, bq, C), lambda b, i: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct((B, s_pad, C), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((F, bq, C), q.dtype),
            pltpu.VMEM((bq, C), q.dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(q, kf2, vf2, wq2, bq2_2d, wk2, bk2_2d)
    return out[:, :S]


def _fused_kernel_v6(q_ref, k_ref, v_ref, wq2_ref, bq2_ref, wk2_ref, bk2_ref,
                     o_ref, xs_ref, diag_ref, k2v_ref, *, scale, n_valid, f,
                     h, bq):
    """v6 = v4's structure with ONLY the stage-2 logits moved to the MXU.

    v4's remaining VPU mass is the l2[q, f] = Σ_C (gs_h ⊙ xs_f) rowwise
    reductions — h·f passes over [BQ, C] f32 (~38M VPU ops/cell). The
    exact reassociation (v5's identity, isolated from v5's losing PV
    restructure): with k2v = V @ Wk2 cached per batch row,

      m_h          = q2_h · k2v_h^T        ([BQ, F·N_pad], 1 matmul/head)
      l2[q, f]     = Σ_{n∈f} (p ⊙ m_h) / s[q, f]

    because xs_f = (p_f / s_f) @ V. The final temporal mix stays v4's
    cheap Σ_f a2_f ⊙ xs_f. Pad columns self-neutralise: V pad rows are
    zero → k2v-side m is 0 where p is exp2(0)=1.

    Stage-1 weights p and normalisers s are kept per head (f32 registers)
    between stage 1 and stage 2, so this kernel fuses the two loops.
    """
    C = q_ref.shape[-1]
    hd = C // h
    n_pad = k_ref.shape[1] // f
    qi = pl.program_id(1)
    c = scale * _LOG2E
    f32 = jnp.float32

    tok = qi * bq + jax.lax.broadcasted_iota(jnp.int32, (bq, 1), 0)
    fq = tok // n_valid

    @pl.when(qi == 0)
    def _project_k2v():
        k2v_ref[...] = jax.lax.dot_general(
            v_ref[0], wk2_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=f32,
        ).astype(k2v_ref.dtype)

    # ---- stage 1 (v4 form): per head, QK over all frames at once ----
    ps, ss = [], []
    for hi in range(h):
        sl = slice(hi * hd, (hi + 1) * hd)
        logits = jax.lax.dot_general(
            q_ref[0, :, sl], k_ref[0, :, sl],
            (((1,), (1,)), ((), ())),
            preferred_element_type=f32,
        )  # [BQ, F*N_pad]
        p = jnp.exp2(jnp.minimum(logits * c, 110.0))
        s_cols = []
        for fi in range(f):
            pf = p[:, fi * n_pad:(fi + 1) * n_pad]
            s = jnp.maximum(
                jnp.sum(pf[:, :n_valid], axis=-1, keepdims=True), 1e-30
            )
            s_cols.append(s)
            o = jax.lax.dot_general(
                pf.astype(v_ref.dtype),
                v_ref[0, fi * n_pad:(fi + 1) * n_pad, sl],
                (((1,), (0,)), ((), ())),
                preferred_element_type=f32,
            )
            xs_ref[fi, :, sl] = (o / s).astype(xs_ref.dtype)
        ps.append(p)
        ss.append(jnp.concatenate(s_cols, axis=-1))  # [BQ, F]

    # ---- diagonal collect (v4 form) ----
    for fi in range(f):
        inter = jnp.logical_and(
            fi * n_valid < qi * bq + bq, (fi + 1) * n_valid > qi * bq
        )

        @pl.when(inter)
        def _collect_diag(fi=fi):
            diag_ref[...] = jnp.where(fq == fi, xs_ref[fi], diag_ref[...])

    # ---- stage 2: logits via MXU ----
    q2 = jax.lax.dot_general(
        diag_ref[...], wq2_ref[...].astype(xs_ref.dtype),
        (((1,), (0,)), ((), ())), preferred_element_type=f32,
    ) + bq2_ref[0].astype(f32)
    q2 = (q2 * scale).astype(xs_ref.dtype)
    outs = []
    for hi in range(h):
        sl = slice(hi * hd, (hi + 1) * hd)
        m = jax.lax.dot_general(
            q2[:, sl], k2v_ref[:, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=f32,
        )  # [BQ, F*N_pad]
        pm = ps[hi] * m
        l2 = jnp.concatenate(
            [
                jnp.sum(
                    pm[:, fi * n_pad:(fi + 1) * n_pad],
                    axis=-1, keepdims=True,
                )
                for fi in range(f)
            ],
            axis=-1,
        ) / ss[hi]  # [BQ, F]
        m2 = jnp.max(l2, axis=-1, keepdims=True)
        a2 = jnp.exp(l2 - m2)
        a2 = a2 / jnp.sum(a2, axis=-1, keepdims=True)
        acc = jnp.zeros((bq, hd), f32)
        for f2 in range(f):
            acc = acc + a2[:, f2:f2 + 1] * xs_ref[f2, :, sl].astype(f32)
        outs.append(acc)
    o_ref[0] = jnp.concatenate(outs, axis=-1).astype(o_ref.dtype)


def _fused_fwd_pallas_v6(q, kf, vf, wq2, bq2, wk2, bk2, scale, heads,
                         block_q: int = 256, interpret: bool = False):
    """v6 wrapper: v4's grid/specs plus the per-row k2v VMEM cache."""
    from jax.experimental.pallas import tpu as pltpu

    B, S, C = q.shape
    F, N = kf.shape[1], kf.shape[2]
    n_pad = _round_up(N, 128)
    if n_pad != N:
        pad = [(0, 0), (0, 0), (0, n_pad - N), (0, 0)]
        kf = jnp.pad(kf, pad)
        vf = jnp.pad(vf, pad)
    kf2 = kf.reshape(B, F * n_pad, C)
    vf2 = vf.reshape(B, F * n_pad, C)
    bq = min(block_q, _round_up(S, 8))
    s_pad = _round_up(S, bq)
    if s_pad != S:
        q = jnp.pad(q, [(0, 0), (0, s_pad - S), (0, 0)])
    bq2_2d = bq2.reshape(1, C)
    bk2_2d = bk2.reshape(1, C)

    grid = (B, s_pad // bq)
    out = pl.pallas_call(
        functools.partial(
            _fused_kernel_v6, scale=scale, n_valid=N, f=F, h=heads, bq=bq,
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bq, C), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, F * n_pad, C), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, F * n_pad, C), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((C, C), lambda b, i: (0, 0)),
            pl.BlockSpec((1, C), lambda b, i: (0, 0)),
            pl.BlockSpec((C, C), lambda b, i: (0, 0)),
            pl.BlockSpec((1, C), lambda b, i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, bq, C), lambda b, i: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct((B, s_pad, C), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((F, bq, C), q.dtype),
            pltpu.VMEM((bq, C), q.dtype),
            pltpu.VMEM((F * n_pad, C), q.dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            # b sequential so the qi==0 k2v fill precedes its consumers
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(q, kf2, vf2, wq2, bq2_2d, wk2, bk2_2d)
    return out[:, :S]


def _fused_kernel_v5(q_ref, k_ref, v_ref, wq2_ref, bq2_ref, wk2_ref, bk2_ref,
                     o_ref, k2v_ref, *, scale, n_valid, f, h, bq):
    """v5: the per-(head, frame) PV products are gone.

    v4's remaining cost was MXU launch latency on the 96 tiny per-frame
    PV matmuls (~37 of 58 us/cell — BENCH_NOTES round 2). v5 never
    materialises the per-frame aggregates xs_f at all; everything runs
    frames-batched over the wide [BQ, F*N_pad] weight matrix:

      p            = exp2(logits * c)          (unnormalised, pads = 1·0)
      s[q, f]      = valid-slice sums of p     (per-frame normalisers)
      x_diag_h     = (p ⊙ own-frame mask / s_diag) @ V_h      (1 matmul)
      q2           = x_diag @ Wq2 + bq2        (as before)
      M_h[q, fn]   = q2_h · (V @ Wk2)_h[fn]    (1 matmul; k2v cached in
                     scratch once per batch row — it is q-block-invariant)
      l2[q, f]     = Σ_{n∈f} p⊙M / s[q,f]      (segmented VPU reduce;
                     pad columns self-cancel: M is 0 there)
      a2           = softmax_f(l2)
      out_h        = (p ⊙ a2/s broadcast) @ V_h               (1 matmul)

    The l2 identity is the exact stage-2 logit: q2·(xs_f @ Wk2) with
    xs_f = (p_f/s_f) @ V expanded and reassociated; the final PV folds
    the temporal weights a2 into the stage-1 weights so the whole
    output is ONE frames-batched matmul per head. 4 MXU launches per
    head per cell instead of 2+2F.

    k_ref/v_ref: [1, F*N_pad, C] frame-major; scratch k2v [F*N_pad, C].
    """
    C = q_ref.shape[-1]
    hd = C // h
    n_pad = k_ref.shape[1] // f
    qi = pl.program_id(1)
    c = scale * _LOG2E
    f32 = jnp.float32

    tok = qi * bq + jax.lax.broadcasted_iota(jnp.int32, (bq, 1), 0)
    fq = tok // n_valid

    # k2v = V @ Wk2 is shared by every q-block of this batch row
    @pl.when(qi == 0)
    def _project_k2v():
        k2v_ref[...] = jax.lax.dot_general(
            v_ref[0], wk2_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=f32,
        ).astype(k2v_ref.dtype)

    # own-frame column mask (shared across heads)
    colf = jax.lax.broadcasted_iota(jnp.int32, (bq, f * n_pad), 1) // n_pad
    own = colf == fq  # [BQ, F*N_pad]

    ps, ss, sds = [], [], []
    diag_parts = []
    for hi in range(h):
        sl = slice(hi * hd, (hi + 1) * hd)
        logits = jax.lax.dot_general(
            q_ref[0, :, sl], k_ref[0, :, sl],
            (((1,), (1,)), ((), ())), preferred_element_type=f32,
        )  # [BQ, F*N_pad]
        p = jnp.exp2(jnp.minimum(logits * c, 110.0))
        # per-frame normalisers over the valid column slices
        s_cols = [
            jnp.maximum(
                jnp.sum(
                    p[:, fi * n_pad:fi * n_pad + n_valid],
                    axis=-1, keepdims=True,
                ),
                1e-30,
            )
            for fi in range(f)
        ]
        s = jnp.concatenate(s_cols, axis=-1)  # [BQ, F]
        s_diag = jnp.sum(jnp.where(
            fq == jax.lax.broadcasted_iota(jnp.int32, (bq, f), 1), s, 0.0
        ), axis=-1, keepdims=True)
        pd = jnp.where(own, p, 0.0) / s_diag
        diag_parts.append(
            jax.lax.dot_general(
                pd.astype(v_ref.dtype), v_ref[0, :, sl],
                (((1,), (0,)), ((), ())), preferred_element_type=f32,
            )
        )
        ps.append(p)
        ss.append(s)

    x_diag = jnp.concatenate(diag_parts, axis=-1).astype(q_ref.dtype)
    q2 = jax.lax.dot_general(
        x_diag, wq2_ref[...].astype(q_ref.dtype),
        (((1,), (0,)), ((), ())), preferred_element_type=f32,
    ) + bq2_ref[0].astype(f32)
    q2 = (q2 * scale).astype(q_ref.dtype)

    outs = []
    for hi in range(h):
        sl = slice(hi * hd, (hi + 1) * hd)
        p, s = ps[hi], ss[hi]
        m = jax.lax.dot_general(
            q2[:, sl], k2v_ref[:, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=f32,
        )  # [BQ, F*N_pad] stage-2 logit contributions
        pm = p * m
        l2 = jnp.concatenate(
            [
                jnp.sum(
                    pm[:, fi * n_pad:(fi + 1) * n_pad],
                    axis=-1, keepdims=True,
                )
                for fi in range(f)
            ],
            axis=-1,
        ) / s  # [BQ, F]
        m2 = jnp.max(l2, axis=-1, keepdims=True)
        a2 = jnp.exp(l2 - m2)
        a2 = a2 / jnp.sum(a2, axis=-1, keepdims=True)
        coef = a2 / s  # [BQ, F]
        w_cols = [
            p[:, fi * n_pad:(fi + 1) * n_pad] * coef[:, fi:fi + 1]
            for fi in range(f)
        ]
        w = jnp.concatenate(w_cols, axis=-1)
        outs.append(
            jax.lax.dot_general(
                w.astype(v_ref.dtype), v_ref[0, :, sl],
                (((1,), (0,)), ((), ())), preferred_element_type=f32,
            )
        )
    o_ref[0] = jnp.concatenate(outs, axis=-1).astype(o_ref.dtype)


def _fused_fwd_pallas_v5(q, kf, vf, wq2, bq2, wk2, bk2, scale, heads,
                         block_q: int = 256, interpret: bool = False):
    """v5 wrapper: grid (b, q_block); keys/values frame-concatenated;
    k2v cached in VMEM scratch per batch row."""
    from jax.experimental.pallas import tpu as pltpu

    B, S, C = q.shape
    F, N = kf.shape[1], kf.shape[2]
    n_pad = _round_up(N, 128)
    if n_pad != N:
        pad = [(0, 0), (0, 0), (0, n_pad - N), (0, 0)]
        kf = jnp.pad(kf, pad)
        vf = jnp.pad(vf, pad)
    kf2 = kf.reshape(B, F * n_pad, C)
    vf2 = vf.reshape(B, F * n_pad, C)
    bq = min(block_q, _round_up(S, 8))
    s_pad = _round_up(S, bq)
    if s_pad != S:
        q = jnp.pad(q, [(0, 0), (0, s_pad - S), (0, 0)])
    bq2_2d = bq2.reshape(1, C)
    bk2_2d = bk2.reshape(1, C)

    grid = (B, s_pad // bq)
    out = pl.pallas_call(
        functools.partial(
            _fused_kernel_v5, scale=scale, n_valid=N, f=F, h=heads, bq=bq,
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bq, C), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, F * n_pad, C), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, F * n_pad, C), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((C, C), lambda b, i: (0, 0)),
            pl.BlockSpec((1, C), lambda b, i: (0, 0)),
            pl.BlockSpec((C, C), lambda b, i: (0, 0)),
            pl.BlockSpec((1, C), lambda b, i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, bq, C), lambda b, i: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct((B, s_pad, C), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((F * n_pad, C), q.dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            # b must iterate sequentially so the qi==0 k2v fill precedes
            # its consumers within each row
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(q, kf2, vf2, wq2, bq2_2d, wk2, bk2_2d)
    return out[:, :S]


# measured-best flag combination (see BENCH_NOTES.md kernel study);
# overridable for A/B profiling via scripts/profile_kernel_variants.py
KERNEL_FLAGS = dict(nomax=True, inline_diag=False, stage2_bf16=False,
                    diag_frame=True, fouter=True)

# forward kernel version selector; measured on chip (BENCH_NOTES):
# 3 = per-frame grid, 4 = frames-batched QK, 5 = fully frames-batched
# (no per-frame PV launches). v5 measured SLOWER than v4 under the
# fetch-forced protocol (3.54 vs 2.76 ms/call, scripts/profile_v5.py)
# — the extra full-width [BQ, F*N_pad] VPU passes cost more than the
# per-frame MXU launches they remove; kept for A/B.
# 7 = transposed-packed stage-1 (8-row frame packing: -22% min/exp2
# lanes at MF-224, normaliser sums on the MXU) — see _fused_kernel_v7.
FWD_VERSION = 4

# stage-1 evaluation mode for the v4 forward (read at trace time like
# FWD_VERSION/KERNEL_FLAGS; the model plumbs cfg.TPU.STAGE1 here):
#   "f32"     — shipped default: f32 logits/exp2, VPU windowed sums.
#   "mxu_sum" — weights rounded once to the PV dtype, per-frame
#               normalisers via one MXU matmul against a frame-selector
#               matrix. In f32 this is bit-equivalent to "f32"; in bf16
#               the normaliser sees the same rounded weights the PV
#               product always consumed (self-consistent softmax of
#               bf16-rounded weights).
#   "bf16"    — additionally multiply+exp2 at bf16 (labeled serving
#               variant: logit rounding ~2^-9 absolute).
STAGE1_MODE = "f32"


# v4 dense-operand mode: k/v enter the kernel unpadded, the padded
# layout is built in VMEM scratch (kills the per-layer HBM pad+copy —
# round-4 trace ledger). Full-model A/B (scripts/bench_dense_kv.py,
# 2026-08-21): 119.90 -> 124.76 erf clips/s (+4.1%). Default ON;
# numerics are bit-identical (same kernel math, operands staged in
# VMEM instead of HBM).
V4_DENSE_KV = True


def _fwd_impl():
    base = {
        3: _fused_fwd_pallas,
        4: _fused_fwd_pallas_v4,
        5: _fused_fwd_pallas_v5,
        6: _fused_fwd_pallas_v6,
        7: _fused_fwd_pallas_v7,
    }[FWD_VERSION]
    if FWD_VERSION == 4 and (STAGE1_MODE != "f32" or V4_DENSE_KV):
        return functools.partial(
            base, stage1=STAGE1_MODE, dense_kv=V4_DENSE_KV
        )
    return base


def _fused_fwd_pallas(q, kf, vf, wq2, bq2, wk2, bk2, scale, heads,
                      block_q: int = 256, interpret: bool = False,
                      flags=None):
    """q: [B, S, C]; kf/vf: [B, F, N, C] -> out [B, S, C]."""
    from jax.experimental.pallas import tpu as pltpu

    B, S, C = q.shape
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
    bq2_2d = bq2.reshape(1, C)
    bk2_2d = bk2.reshape(1, C)

    grid = (B, s_pad // bq, F)
    out = pl.pallas_call(
        functools.partial(
            _fused_kernel_v3, scale=scale, n_valid=N, f=F, h=heads, bq=bq,
            **(flags or KERNEL_FLAGS),
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bq, C), lambda b, i, fi: (b, i, 0)),
            pl.BlockSpec((1, 1, n_pad, C), lambda b, i, fi: (b, fi, 0, 0)),
            pl.BlockSpec((1, 1, n_pad, C), lambda b, i, fi: (b, fi, 0, 0)),
            pl.BlockSpec((C, C), lambda b, i, fi: (0, 0)),
            pl.BlockSpec((1, C), lambda b, i, fi: (0, 0)),
            pl.BlockSpec((C, C), lambda b, i, fi: (0, 0)),
            pl.BlockSpec((1, C), lambda b, i, fi: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, bq, C), lambda b, i, fi: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct((B, s_pad, C), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((F, bq, C), q.dtype),
            pltpu.VMEM((bq, C), q.dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary"),
            # the standalone (eagerly-executed) call compiles with extra
            # layout buffers that exceed the default 16M scoped budget
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=interpret,
    )(q, kf, vf, wq2, bq2_2d, wk2, bk2_2d)
    return out[:, :S]


def _xla_reference(q, kf, vf, wq2, bq2, wk2, bk2, scale, heads):
    """Composition through the existing XLA ops (also the backward)."""
    B, S, C = q.shape
    F, N = kf.shape[1], kf.shape[2]
    hd = C // heads
    split = lambda t: t.reshape(B, -1, heads, hd).transpose(0, 2, 1, 3).reshape(
        B * heads, -1, hd
    )
    q_ = split(q)
    k_ = split(kf.reshape(B, F * N, C))
    v_ = split(vf.reshape(B, F * N, C))
    xs = attn_ops.space_stage(q_, k_, v_, F, scale)  # [BH, S, F, hd]
    xs = xs.reshape(B, heads, S, F, hd).transpose(0, 2, 3, 1, 4).reshape(
        B, S, F, C
    )
    x_diag = attn_ops.take_diagonal(xs, F)
    q2 = x_diag @ wq2 + bq2
    del bk2  # constant over frames -> softmax-invariant
    return attn_ops.temporal_stage_k2w(q2, wk2, xs, F, scale, heads)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9))
def fused_trajectory_core(q, kf, vf, wq2, bq2, wk2, bk2, scale, heads,
                          interpret=False):
    return _fwd_impl()(q, kf, vf, wq2, bq2, wk2, bk2, scale, heads,
                       interpret=interpret)


def _fused_fwd(q, kf, vf, wq2, bq2, wk2, bk2, scale, heads, interpret):
    # v4+'s 100M vmem budget fits bq=256 under grad too (the v3 kernel
    # needed 128 here)
    bq = 128 if FWD_VERSION == 3 else 256
    out = _fwd_impl()(q, kf, vf, wq2, bq2, wk2, bk2, scale, heads,
                      block_q=bq, interpret=interpret)
    return out, (q, kf, vf, wq2, bq2, wk2, bk2)




def _fused_bwd_kernel(q_ref, k_ref, v_ref, wq2_ref, bq2_ref, wk2_ref, do_ref,
                      dq_ref, dk_ref, dv_ref, dwq2_ref, dbq2_ref, dwk2_ref,
                      xs_ref, a_ref, dxs_ref, diag_ref, dz_ref, g_ref, *pads,
                      scale, n_valid, f, h, bq, skip_b=False, skip_c=False,
                      stage1="f32", dense_kv=False):
    """Backward of the fused trajectory core, entirely in VMEM.

    Grid (b, q_block), both sequential; frames loop inside the cell. The
    stage-1 attention weights are recomputed once per cell (nomax exp2
    form, pad columns self-neutralising: dv/dk pad rows are sliced off by
    the wrapper, and pad-column dZ terms multiply zeroed k rows in dq)
    and cached in a_ref for the stage-1 backward, so the [S, S]-sized
    weight tensor never exists in HBM — the reason the XLA-recompute
    backward was 3x slower (BENCH_NOTES round 2). The recompute QK and
    the dq contraction run frame-concatenated (kernel-v4 form) to
    amortise MXU launch latency.

    Shapes: q_ref/do_ref [1, BQ, C]; k_ref/v_ref [1, F*N_pad, C]
    (frame-major rows); dq [1, BQ, C] f32; dk/dv [1, F*N_pad, C] f32
    accumulated over q-blocks; dwq2/dwk2 [C, C] f32 and dbq2 [1, C] f32
    accumulated over every cell. Scratch: xs [F, BQ, C] bf16,
    a [F, H, BQ, N_pad] bf16, dxs [F, BQ, C] bf16, diag [BQ, C] bf16,
    dz [BQ, F*N_pad] bf16, g [H, BQ, C] bf16.
    """
    C = q_ref.shape[-1]
    hd = C // h
    # dk/dv outputs stay padded either way, so n_pad comes from them
    n_pad = dk_ref.shape[1] // f
    b = pl.program_id(0)
    qi = pl.program_id(1)
    c = scale * _LOG2E
    f32 = jnp.float32

    if dense_kv:
        # read-side port of the forward's V4_DENSE_KV (round-4 trace
        # ledger): k/v arrive DENSE ([1, F*N, C]) and the lane-aligned
        # padded layout is built once per batch row in VMEM scratch,
        # removing the wrapper-side HBM pad+copy on the train path too.
        kp_ref, vp_ref = pads

        @pl.when(qi == 0)
        def _build_padded_kv():
            kp_ref[...] = jnp.zeros_like(kp_ref)
            vp_ref[...] = jnp.zeros_like(vp_ref)
            for fi in range(f):
                rows_dst = slice(fi * n_pad, fi * n_pad + n_valid)
                rows_src = slice(fi * n_valid, (fi + 1) * n_valid)
                kp_ref[rows_dst] = k_ref[0, rows_src]
                vp_ref[rows_dst] = v_ref[0, rows_src]

        def kread(rows, cols):
            return kp_ref[rows, cols]

        def vread(rows, cols):
            return vp_ref[rows, cols]
    else:
        def kread(rows, cols):
            return k_ref[0, rows, cols]

        def vread(rows, cols):
            return v_ref[0, rows, cols]

    tok = qi * bq + jax.lax.broadcasted_iota(jnp.int32, (bq, 1), 0)
    fq = tok // n_valid

    @pl.when(qi == 0)
    def _zero_kv_grads():
        dk_ref[...] = jnp.zeros_like(dk_ref)
        dv_ref[...] = jnp.zeros_like(dv_ref)

    @pl.when(jnp.logical_and(b == 0, qi == 0))
    def _zero_w_grads():
        dwq2_ref[...] = jnp.zeros_like(dwq2_ref)
        dbq2_ref[...] = jnp.zeros_like(dbq2_ref)
        dwk2_ref[...] = jnp.zeros_like(dwk2_ref)

    # ---- pass A: recompute stage-1 attention + aggregates ----
    # padded query rows (fq >= F) are never written by the diag collect;
    # unlike the forward (rowwise outputs, pads sliced off), the backward
    # CONTRACTS over the query dim (dW/dk/dv), so garbage in those rows
    # would poison real gradients — zero the scratch first
    diag_ref[...] = jnp.zeros_like(diag_ref)
    for hi in range(h):
        sl = slice(hi * hd, (hi + 1) * hd)
        # QK batched across frames (v4 form): h launches, not h*f
        logits = jax.lax.dot_general(
            q_ref[0, :, sl], kread(slice(None), sl),
            (((1,), (1,)), ((), ())), preferred_element_type=f32,
        )  # [BQ, F*N_pad]
        if stage1 == "bf16":
            # labeled variant (round-4 verdict #8): the recompute's
            # multiply+exp2 sweep at bf16 — the backward analogue of the
            # forward's "bf16" stage-1 mode (a numerics change:
            # recomputed weights round at ~2^-9)
            lp = logits.astype(jnp.bfloat16) * jnp.bfloat16(c)
            pu = jnp.exp2(jnp.minimum(lp, jnp.bfloat16(110.0))).astype(f32)
        else:
            pu = jnp.exp2(jnp.minimum(logits * c, 110.0))
        for fi in range(f):
            puf = pu[:, fi * n_pad:(fi + 1) * n_pad]
            # valid-column slice-sum, matching the forward (see v3 kernel)
            ssum = jnp.maximum(
                jnp.sum(puf[:, :n_valid], axis=-1, keepdims=True), 1e-30
            )
            a = (puf / ssum).astype(a_ref.dtype)
            a_ref[fi, hi] = a
            xs_ref[fi, :, sl] = jax.lax.dot_general(
                a, vread(slice(fi * n_pad, (fi + 1) * n_pad), sl),
                (((1,), (0,)), ((), ())),
                preferred_element_type=f32,
            ).astype(xs_ref.dtype)
    for fi in range(f):
        inter = jnp.logical_and(
            fi * n_valid < qi * bq + bq, (fi + 1) * n_valid > qi * bq
        )

        @pl.when(inter)
        def _collect_diag(fi=fi):
            diag_ref[...] = jnp.where(fq == fi, xs_ref[fi], diag_ref[...])

    if skip_b:  # ablation timing only (outputs invalid)
        return
    # ---- pass B: stage-2 forward remainder + backward ----
    # The naive per-(head, frame) formulation re-reads and re-writes the
    # f32 [BQ, C] dxs accumulators h*f times (~115 MB of VMEM traffic per
    # cell — the measured bottleneck of the whole backward). Instead the
    # per-head stage-2 logit directions g_h are cached once in bf16
    # scratch and dxs is accumulated frame-outer in registers with a
    # single write per frame.
    q2 = jax.lax.dot_general(
        diag_ref[...], wq2_ref[...].astype(diag_ref.dtype),
        (((1,), (0,)), ((), ())), preferred_element_type=f32,
    ) + bq2_ref[0].astype(f32)
    q2b = q2.astype(diag_ref.dtype)
    wk2 = wk2_ref[...]
    for hi in range(h):
        sl = slice(hi * hd, (hi + 1) * hd)
        g_ref[hi] = jax.lax.dot_general(
            q2b[:, sl], wk2[:, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=f32,
        ).astype(g_ref.dtype)  # [BQ, C], unscaled
    do32 = do_ref[0].astype(f32)
    dq2_parts, a2s, dl2s = [], [], []
    for hi in range(h):
        sl = slice(hi * hd, (hi + 1) * hd)
        g_hb = g_ref[hi]
        do_h = do32[:, sl]
        l2_cols, da2_cols = [], []
        for f2 in range(f):
            xs_f = xs_ref[f2]
            l2_cols.append(
                scale * jnp.sum(
                    (g_hb * xs_f).astype(f32), axis=-1, keepdims=True
                )
            )
            da2_cols.append(
                jnp.sum(
                    xs_f[:, sl].astype(f32) * do_h, axis=-1, keepdims=True
                )
            )
        l2 = jnp.concatenate(l2_cols, axis=-1)
        m2 = jnp.max(l2, axis=-1, keepdims=True)
        a2 = jnp.exp(l2 - m2)
        a2 = a2 / jnp.sum(a2, axis=-1, keepdims=True)
        da2 = jnp.concatenate(da2_cols, axis=-1)
        r2 = jnp.sum(a2 * da2, axis=-1, keepdims=True)
        dl2 = scale * (a2 * (da2 - r2))  # [BQ, F], attention scale folded
        a2s.append(a2)
        dl2s.append(dl2)
        dg = jnp.zeros((bq, C), f32)
        for f2 in range(f):
            dg = dg + dl2[:, f2:f2 + 1] * xs_ref[f2].astype(f32)
        dgb = dg.astype(xs_ref.dtype)
        dq2_parts.append(
            jax.lax.dot_general(
                dgb, wk2[:, sl], (((1,), (0,)), ((), ())),
                preferred_element_type=f32,
            )
        )
        # dWk2[:, sl] += dg^T q2_sl  (contract the query dim)
        dwk2_ref[:, sl] += jax.lax.dot_general(
            dgb, q2b[:, sl], (((0,), (0,)), ((), ())),
            preferred_element_type=f32,
        )
    dq2 = jnp.concatenate(dq2_parts, axis=-1)
    dbq2_ref[0, :] += jnp.sum(dq2, axis=0)
    dq2b = dq2.astype(diag_ref.dtype)
    dwq2_ref[...] += jax.lax.dot_general(
        diag_ref[...], dq2b, (((0,), (0,)), ((), ())),
        preferred_element_type=f32,
    )
    dd = jax.lax.dot_general(
        dq2b, wq2_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=f32,
    )  # [BQ, C]
    # dxs accumulated frame-outer: logit terms from every head, the
    # own-slice value terms (disjoint per head), and the diagonal
    # (stage-2 query) gradient — one write per frame
    for f2 in range(f):
        acc = jnp.where(fq == f2, dd, 0.0)
        for hi in range(h):
            acc = acc + dl2s[hi][:, f2:f2 + 1] * g_ref[hi].astype(f32)
        aw = jnp.concatenate(
            [
                jnp.broadcast_to(a2s[hi][:, f2:f2 + 1], (bq, hd))
                for hi in range(h)
            ],
            axis=1,
        )
        # store bf16: pass C consumes dxs only after an .astype(bf16), so
        # rounding at store time is bit-identical — and it halves the
        # [F, BQ, C] scratch traffic (6.3 -> 3.1 MB/cell)
        dxs_ref[f2] = (acc + aw * do32).astype(dxs_ref.dtype)

    if skip_c:  # ablation timing only (outputs invalid)
        return
    # ---- pass C: stage-1 backward ----
    for hi in range(h):
        sl = slice(hi * hd, (hi + 1) * hd)
        for fi in range(f):
            rows = slice(fi * n_pad, (fi + 1) * n_pad)
            a = a_ref[fi, hi]
            dxs_h = dxs_ref[fi][:, sl].astype(xs_ref.dtype)
            dv_ref[0, rows, sl] += jax.lax.dot_general(
                a, dxs_h, (((0,), (0,)), ((), ())),
                preferred_element_type=f32,
            )
            da = jax.lax.dot_general(
                dxs_h, vread(rows, sl), (((1,), (1,)), ((), ())),
                preferred_element_type=f32,
            )  # [BQ, N_pad]
            a32 = a.astype(f32)
            r = jnp.sum(da * a32, axis=-1, keepdims=True)
            dz = (a32 * (da - r)).astype(xs_ref.dtype)
            dz_ref[:, rows] = dz
        # dq and dk for this head in ONE frame-concatenated matmul each
        # (v4 form): dk rows for frame f touch only dz columns of frame
        # f, so dk over all frames = dz_cat^T x q_sl
        dq_ref[0, :, sl] = scale * jax.lax.dot_general(
            dz_ref[...], kread(slice(None), sl), (((1,), (0,)), ((), ())),
            preferred_element_type=f32,
        )
        dk_ref[0, :, sl] += scale * jax.lax.dot_general(
            dz_ref[...], q_ref[0, :, sl], (((0,), (0,)), ((), ())),
            preferred_element_type=f32,
        )


def _fused_bwd_pallas(q, kf, vf, wq2, bq2, wk2, dout, scale, heads,
                      block_q: int = 256, interpret: bool = False,
                      skip_b: bool = False, skip_c: bool = False,
                      stage1: str = "f32", dense_kv: bool = False):
    """Pallas backward wrapper. Returns (dq, dkf, dvf, dwq2, dbq2, dwk2)
    in the primal dtypes.

    dense_kv: read-side port of the forward's V4_DENSE_KV — k/v ship
    dense ([B, F*N, C]) and the padded layout is built in VMEM scratch
    once per batch row; dk/dv outputs stay padded (their one HBM
    write-back per batch row is already amortised over the q-block
    accumulation).
    """
    from jax.experimental.pallas import tpu as pltpu

    B, S, C = q.shape
    F, N = kf.shape[1], kf.shape[2]
    n_pad = _round_up(N, 128)
    if not dense_kv and n_pad != N:
        pad = [(0, 0), (0, 0), (0, n_pad - N), (0, 0)]
        kf = jnp.pad(kf, pad)
        vf = jnp.pad(vf, pad)
    n_rows = N if dense_kv else n_pad
    kf2 = kf.reshape(B, F * n_rows, C)
    vf2 = vf.reshape(B, F * n_rows, C)
    bq = _pick_bq(S, block_q)
    s_pad = _round_up(S, bq)
    if s_pad != S:
        q = jnp.pad(q, [(0, 0), (0, s_pad - S), (0, 0)])
        dout = jnp.pad(dout, [(0, 0), (0, s_pad - S), (0, 0)])
    bq2_2d = bq2.reshape(1, C)

    grid = (B, s_pad // bq)
    f32 = jnp.float32
    out_shapes = (
        jax.ShapeDtypeStruct((B, s_pad, C), f32),          # dq
        jax.ShapeDtypeStruct((B, F * n_pad, C), f32),      # dk
        jax.ShapeDtypeStruct((B, F * n_pad, C), f32),      # dv
        jax.ShapeDtypeStruct((C, C), f32),                 # dwq2
        jax.ShapeDtypeStruct((1, C), f32),                 # dbq2
        jax.ShapeDtypeStruct((C, C), f32),                 # dwk2
    )
    scratch = [
        pltpu.VMEM((F, bq, C), q.dtype),
        pltpu.VMEM((F, heads, bq, n_pad), q.dtype),
        pltpu.VMEM((F, bq, C), q.dtype),  # dxs (see store comment)
        pltpu.VMEM((bq, C), q.dtype),
        pltpu.VMEM((bq, F * n_pad), q.dtype),
        pltpu.VMEM((heads, bq, C), q.dtype),
    ]
    if dense_kv:
        scratch += [
            pltpu.VMEM((F * n_pad, C), kf.dtype),
            pltpu.VMEM((F * n_pad, C), vf.dtype),
        ]
    outs = pl.pallas_call(
        functools.partial(
            _fused_bwd_kernel, scale=scale, n_valid=N, f=F, h=heads, bq=bq,
            skip_b=skip_b, skip_c=skip_c, stage1=stage1, dense_kv=dense_kv,
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bq, C), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, F * n_rows, C), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, F * n_rows, C), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((C, C), lambda b, i: (0, 0)),
            pl.BlockSpec((1, C), lambda b, i: (0, 0)),
            pl.BlockSpec((C, C), lambda b, i: (0, 0)),
            pl.BlockSpec((1, bq, C), lambda b, i: (b, i, 0)),
        ],
        out_specs=(
            pl.BlockSpec((1, bq, C), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, F * n_pad, C), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, F * n_pad, C), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((C, C), lambda b, i: (0, 0)),
            pl.BlockSpec((1, C), lambda b, i: (0, 0)),
            pl.BlockSpec((C, C), lambda b, i: (0, 0)),
        ),
        out_shape=out_shapes,
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(q, kf2, vf2, wq2, bq2_2d, wk2, dout)
    dq, dk, dv, dwq2, dbq2, dwk2 = outs
    dk = dk.reshape(B, F, n_pad, C)
    dv = dv.reshape(B, F, n_pad, C)
    return (
        dq[:, :S].astype(q.dtype),
        dk[:, :, :N].astype(kf.dtype),
        dv[:, :, :N].astype(vf.dtype),
        dwq2.astype(wq2.dtype),
        dbq2.reshape(bq2.shape).astype(bq2.dtype),
        dwk2.astype(wk2.dtype),
    )

# backward implementation selector (A/B measurable like KERNEL_FLAGS)
BWD_USE_PALLAS = True
# stage-1 recompute precision in the backward's pass A ("f32" shipped;
# "bf16" = labeled variant, round-4 verdict #8 — measured via
# scripts/profile_train.py bwd_bf16)
BWD_STAGE1 = "f32"


def _fused_bwd(scale, heads, interpret, res, g):
    q, kf, vf, wq2, bq2, wk2, bk2 = res
    if BWD_USE_PALLAS:
        dq, dk, dv, dwq2, dbq2, dwk2 = _fused_bwd_pallas(
            q, kf, vf, wq2, bq2, wk2, g, scale, heads, interpret=interpret,
            stage1=BWD_STAGE1, dense_kv=V4_DENSE_KV,
        )
        return dq, dk, dv, dwq2, dbq2, dwk2, jnp.zeros_like(bk2)
    _, vjp = jax.vjp(
        lambda *a: _xla_reference(*a, scale, heads), q, kf, vf, wq2, bq2,
        wk2, bk2,
    )
    return vjp(g)


fused_trajectory_core.defvjp(_fused_fwd, _fused_bwd)
