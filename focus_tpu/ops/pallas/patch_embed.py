"""Fused non-overlapping 3D patch embed (tokenizer) as a Pallas kernel.

The XLA reshape+transpose+matmul patch path costs ~2.7 ms/step at the
flagship shape in pure layout copies: the 8-D permute
[B,T/kt,kt,H/kh,kh,W/kw,kw,C] -> [B,T',H',W',kt,kh,kw,C] has inner
contiguous runs of only kw*C = 48 elements, and XLA assigns tiled
layouts with 9-36x physical padding to the tiny trailing dims
(device-trace round 3: reshape.934 0.54 + copy.579 1.53 + reshape.474
0.67 ms).  Here the rearrangement happens in VMEM instead: channels are
padded to 8 so one (kw=16, c=8) patch-row group is exactly one 128-lane
tile, each grid cell (b, t') reads its [kt, H, W*8] slab, regroups it to
[H'*W', kt*kh*kw*8] with in-register relayouts, and multiplies against
the VMEM-resident projection matrix.

Reference semantics: stride==kernel Conv3d tokenizer
(/root/reference/slowfast/models/stem_helper.py:290-321).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _round_up(x, m):
    return (x + m - 1) // m * m


CPAD = 8


def _patch_kernel(x_ref, w_ref, b_ref, o_ref, *, kt, kh, kw, hp, wp):
    """x_ref [1, kt, H, W*CPAD]; w_ref [kt*kh*kw*CPAD, dim];
    b_ref [1, dim]; o_ref [1, hp*wp, dim]."""
    xb = x_ref[0]  # [kt, H, W*CPAD]
    lanes = kw * CPAD  # 128 per (j) group
    # [kt, hp, kh, wp, lanes] -> [hp, wp, kt, kh, lanes] -> [hp*wp, K]
    x5 = xb.reshape(kt, hp, kh, wp, lanes)
    pat = x5.transpose(1, 3, 0, 2, 4).reshape(hp * wp, kt * kh * lanes)
    acc = jax.lax.dot_general(
        pat, w_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b_ref[0].astype(jnp.float32)
    o_ref[0] = acc.astype(o_ref.dtype)


def _fwd_pallas(x, w, b, kernel, interpret):
    kt, kh, kw = kernel
    B, T, H, W, C = x.shape
    tp, hp, wp = T // kt, H // kh, W // kw
    dim = w.shape[-1]
    assert C <= CPAD and (kw * CPAD) % 128 == 0 and H % kh == 0 and W % kw == 0

    xc = x[:, : tp * kt]
    if C != CPAD:
        xc = jnp.pad(xc, [(0, 0)] * 4 + [(0, CPAD - C)])
    x4 = xc.reshape(B * tp, kt, H, W * CPAD)

    wpad = jnp.pad(w, [(0, 0)] * 3 + [(0, CPAD - C), (0, 0)]) if C != CPAD else w
    w2 = wpad.reshape(kt * kh * kw * CPAD, dim).astype(x.dtype)
    b2 = b.reshape(1, dim).astype(x.dtype)

    out = pl.pallas_call(
        functools.partial(
            _patch_kernel, kt=kt, kh=kh, kw=kw, hp=hp, wp=wp,
        ),
        grid=(B * tp,),
        in_specs=[
            pl.BlockSpec((1, kt, H, W * CPAD), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((kt * kh * kw * CPAD, dim), lambda i: (0, 0)),
            pl.BlockSpec((1, dim), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, hp * wp, dim), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B * tp, hp * wp, dim), x.dtype),
        interpret=interpret,
    )(x4, w2, b2)
    return out.reshape(B, tp * hp * wp, dim)


def _gather_patches_xla(x, kernel):
    """Reference patch gather (the layout-copy-heavy XLA path) — used
    only by the backward, where the permute cost is train-only."""
    kt, kh, kw = kernel
    B, T, H, W, C = x.shape
    tp, hp, wp = T // kt, H // kh, W // kw
    return x[:, : tp * kt, : hp * kh, : wp * kw].reshape(
        B, tp, kt, hp, kh, wp, kw, C
    ).transpose(0, 1, 3, 5, 2, 4, 6, 7).reshape(
        B, tp * hp * wp, kt * kh * kw * C
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _tokens(x, w, b, kernel, interpret):
    return _fwd_pallas(x, w, b, kernel, interpret)


def _tokens_fwd(x, w, b, kernel, interpret):
    return _fwd_pallas(x, w, b, kernel, interpret), (x, w, b)


def _tokens_bwd(kernel, interpret, res, dout):
    x, w, b = res
    kt, kh, kw = kernel
    B, T, H, W, C = x.shape
    tp, hp, wp = T // kt, H // kh, W // kw
    dim = w.shape[-1]
    k = kt * kh * kw * C
    w2 = w.reshape(k, dim).astype(dout.dtype)
    # dpatches -> inverse rearrangement back to pixels
    dpat = jax.lax.dot_general(
        dout, w2, (((2,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # [B, S, K]
    dx = dpat.reshape(B, tp, hp, wp, kt, kh, kw, C).transpose(
        0, 1, 4, 2, 5, 3, 6, 7
    ).reshape(B, tp * kt, hp * kh, wp * kw, C)
    if tp * kt != T or hp * kh != H or wp * kw != W:
        dx = jnp.pad(dx, [(0, 0), (0, T - tp * kt), (0, H - hp * kh),
                          (0, W - wp * kw), (0, 0)])
    patches = _gather_patches_xla(x, kernel).astype(dout.dtype)
    dw = jax.lax.dot_general(
        patches.reshape(-1, k), dout.reshape(-1, dim),
        (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32,
    ).reshape(kt, kh, kw, C, dim)
    db = jnp.sum(dout.astype(jnp.float32), axis=(0, 1))
    return dx.astype(x.dtype), dw.astype(w.dtype), db.astype(b.dtype)


_tokens.defvjp(_tokens_fwd, _tokens_bwd)


def patch_embed_3d(x, w, b, kernel, *, interpret: bool = False):
    """x [B, T, H, W, C] -> (tokens [B, T'*H'*W', dim], (T', H', W')).

    ``w`` is the conv kernel [kt, kh, kw, C, dim] (checkpoint layout),
    ``b`` [dim].  Requires stride == kernel, H % kh == W % kw == 0 and
    kw * 8 % 128 == 0 (every Motionformer config: 16x16 patches).
    Differentiable: the backward runs the XLA rearrangement (train-only
    cost); the forward is the fused kernel.
    """
    kt, kh, kw = kernel
    B, T, H, W, C = x.shape
    return (
        _tokens(x, w, b, tuple(kernel), interpret),
        (T // kt, H // kh, W // kw),
    )
