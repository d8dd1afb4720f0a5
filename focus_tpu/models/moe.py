"""Mixture-of-Experts MLP with expert parallelism — a TPU scaling
extension beyond the reference (which has no MoE; the dense counterpart
is the ViT MLP at reference slowfast/models/ORViT/utils.py:79-98).

Switch-Transformer top-1 routing with GShard-style einsum dispatch:
static shapes throughout (capacity-bounded one-hot dispatch/combine
tensors), so the whole layer lowers to MXU matmuls + elementwise — no
gathers, no dynamic shapes. The expert dimension of parameters and of
expert activations shards over the mesh 'expert' axis
(parallel/mesh.py EXPERT_AXIS / state_shardings), so each device group
holds and runs num_experts/ep experts; GSPMD inserts the all-to-alls
implied by resharding [B, N, ...] token tensors (data-sharded) to
[B, E, cap, ...] expert tensors (expert-sharded) and back.

Tokens routed over an expert's capacity are dropped from the MoE output
(zero contribution — the transformer residual carries them), exactly the
Switch semantics. The load-balance auxiliary loss is sown into the
'moe' collection; the supervised trainer adds it to the objective with
weight cfg.TPU.MOE.AUX_LOSS_WEIGHT when the collection is mutable.
"""

from __future__ import annotations

import math
from typing import Any, Optional

import flax.linen as nn
import jax.numpy as jnp

trunc_normal_02 = nn.initializers.truncated_normal(
    stddev=0.02, lower=-2.0, upper=2.0
)


class _Experts(nn.Module):
    """Stacked expert FFN parameters: the expert axis sits at position
    -3 of kernels / -2 of biases regardless of scan/pipeline wrapping
    (state_shardings locates it there)."""

    num_experts: int
    in_dim: int
    hidden_dim: int
    drop: float = 0.0
    fast_gelu: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        """x: [B, E, cap, d] -> [B, E, cap, d]."""
        e, d, h = self.num_experts, self.in_dim, self.hidden_dim
        k1 = self.param("kernel1", trunc_normal_02, (e, d, h))
        b1 = self.param("bias1", nn.initializers.zeros, (e, h))
        k2 = self.param("kernel2", trunc_normal_02, (e, h, d))
        b2 = self.param("bias2", nn.initializers.zeros, (e, d))
        dt = self.dtype or x.dtype
        y = (jnp.einsum("becd,edh->bech", x, k1.astype(dt))
             + b1.astype(dt)[None, :, None, :])
        if self.fast_gelu:
            y = nn.gelu(y, approximate=True)
        else:
            from focus_tpu.ops import hw_gelu as _hg

            y = _hg.hw_gelu(y) if _hg.use_hw_gelu(y.dtype) else nn.gelu(
                y, approximate=False
            )
        if self.drop > 0.0 and not deterministic:
            y = nn.Dropout(self.drop, deterministic=False)(y)
        y = (jnp.einsum("bech,ehd->becd", y, k2.astype(dt))
             + b2.astype(dt)[None, :, None, :])
        return y


class MoEMlp(nn.Module):
    """Drop-in MoE replacement for the block MLP (same call signature as
    motionformer.Mlp). Routing groups are the leading batch dim: each
    sample's N tokens are routed independently, which keeps the dispatch
    tensors [B, N, E, cap] and makes per-sample results independent of
    the batch composition."""

    hidden_features: int
    num_experts: int
    capacity_factor: float = 1.25
    out_features: Optional[int] = None
    drop: float = 0.0
    fast_gelu: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x, deterministic: bool = True, sow_weight=1.0):
        """``sow_weight`` scales this call's contribution to the sown
        load-balance statistics — the pipeline wrapper passes 0 for
        bubble ticks (warm-up/drain work whose outputs are discarded) so
        the auxiliary loss and its router gradients come only from real
        microbatches."""
        from focus_tpu.parallel.mesh import shard_expert_acts

        b, n, d = x.shape
        e = self.num_experts
        out_dim = self.out_features or d
        assert out_dim == d, "MoE MLP requires out_features == in_features"
        cap = max(int(math.ceil(n / e * self.capacity_factor)), 1)

        # router in f32 for a stable softmax regardless of compute dtype
        logits = nn.Dense(
            e, kernel_init=trunc_normal_02, dtype=jnp.float32, name="router"
        )(x.astype(jnp.float32))
        probs = nn.softmax(logits, axis=-1)  # [B, N, E]
        gate = jnp.max(probs, axis=-1)  # [B, N]
        idx = jnp.argmax(probs, axis=-1)  # [B, N]
        mask = nn.one_hot(idx, e, dtype=jnp.float32)  # [B, N, E]

        # Switch load-balance loss: E * sum_e(token_fraction_e * prob_e).
        # Sown as a (weighted value, weight) pair so the trainer can take
        # a weighted mean across layers/stages/ticks. Overwrite reduce_fn
        # (not tuple-append): nn.scan traces its body twice, which would
        # duplicate appended values.
        aux = e * jnp.sum(
            jnp.mean(mask, axis=(0, 1)) * jnp.mean(probs, axis=(0, 1))
        )
        w = jnp.asarray(sow_weight, jnp.float32)
        self.sow("moe", "load_balance", jnp.stack([aux * w, w]),
                 init_fn=lambda: jnp.zeros(2, jnp.float32),
                 reduce_fn=lambda _, b: b)

        # position within the chosen expert; tokens over capacity drop
        pos = jnp.cumsum(mask, axis=1) * mask - 1.0  # [B, N, E], -1 unrouted
        keep = mask * (pos < cap)
        dispatch = (
            nn.one_hot(jnp.maximum(pos, 0.0).astype(jnp.int32), cap,
                       dtype=jnp.float32)
            * keep[..., None]
        )  # [B, N, E, cap]
        combine = dispatch * gate[..., None, None]

        dt = x.dtype
        expert_in = jnp.einsum(
            "bnec,bnd->becd", dispatch.astype(dt), x
        )  # [B, E, cap, d]
        expert_in = shard_expert_acts(expert_in)
        expert_out = _Experts(
            num_experts=e, in_dim=d, hidden_dim=self.hidden_features,
            drop=self.drop, fast_gelu=self.fast_gelu, dtype=self.dtype,
            name="experts",
        )(expert_in, deterministic=deterministic)
        expert_out = shard_expert_acts(expert_out)
        y = jnp.einsum("bnec,becd->bnd", combine.astype(dt), expert_out)
        if self.drop > 0.0 and not deterministic:
            y = nn.Dropout(self.drop, deterministic=False)(y)
        return y
