"""Slot attention over video (reference ``slowfast/models/STEVE/steve.py:11-105``).

TPU-first design: the per-frame recurrence is a single ``lax.scan`` over
time (weights broadcast, one compiled body regardless of clip length);
k/v projections for ALL frames are hoisted out of the scan into one large
MXU matmul; the corrector iterations (2-3, static) are unrolled inside
the scan body so XLA fuses softmax/weighted-mean/GRU into one step.
"""

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from focus_tpu.models.common import (
    Dense,
    GRUCell,
    TransformerEncoder,
    xavier_uniform,
)


def _sample_slot_noise(rng, shape):
    """Slot-init noise (reference steve.py:56 new_empty().normal_());
    module-level so parity tests can replay recorded reference noise."""
    return jax.random.normal(rng, shape, jnp.float32)


class SlotAttentionVideo(nn.Module):
    num_iterations: int
    num_slots: int
    input_size: int
    slot_size: int
    mlp_hidden_size: int
    num_predictor_blocks: int = 1
    num_predictor_heads: int = 4
    dropout: float = 0.1
    epsilon: float = 1e-8
    dtype: Any = None

    def setup(self):
        self.slot_mu = self.param("slot_mu", xavier_uniform, (1, 1, self.slot_size))
        self.slot_log_sigma = self.param(
            "slot_log_sigma", xavier_uniform, (1, 1, self.slot_size)
        )
        self.norm_inputs = nn.LayerNorm(dtype=self.dtype)
        self.norm_slots = nn.LayerNorm(dtype=self.dtype)
        self.norm_mlp = nn.LayerNorm(dtype=self.dtype)
        self.project_q = Dense(self.slot_size, use_bias=False, dtype=self.dtype)
        self.project_k = Dense(self.slot_size, use_bias=False, dtype=self.dtype)
        self.project_v = Dense(self.slot_size, use_bias=False, dtype=self.dtype)
        self.gru = GRUCell(self.slot_size, dtype=self.dtype)
        self.mlp_fc1 = Dense(self.mlp_hidden_size, weight_init="kaiming", dtype=self.dtype)
        self.mlp_fc2 = Dense(self.slot_size, dtype=self.dtype)
        self.predictor = TransformerEncoder(
            self.num_predictor_blocks,
            self.slot_size,
            self.num_predictor_heads,
            self.dropout,
            dtype=self.dtype,
        )

    def _corrector(self, slots, k_t, v_t):
        """One frame's corrector iterations. k_t/v_t: [B, N, slot_size]."""
        B = k_t.shape[0]
        attn_vis = None
        for i in range(self.num_iterations):
            slots_prev = slots
            slots_n = self.norm_slots(slots)
            q = self.project_q(slots_n)  # [B, S, D]
            attn_logits = jnp.einsum(
                "bnd,bsd->bns", k_t, q, preferred_element_type=jnp.float32
            )
            attn_vis = jax.nn.softmax(attn_logits, axis=-1)  # slots compete
            attn = attn_vis + self.epsilon
            attn = attn / jnp.sum(attn, axis=-2, keepdims=True)  # per-slot weights
            updates = jnp.einsum(
                "bns,bnd->bsd", attn.astype(v_t.dtype), v_t,
                preferred_element_type=jnp.float32,
            ).astype(v_t.dtype)
            slots = self.gru(
                updates.reshape(-1, self.slot_size),
                slots_prev.reshape(-1, self.slot_size),
            ).reshape(B, self.num_slots, self.slot_size)
            # reference quirk: the refinement MLP is skipped on the last iter
            if i < self.num_iterations - 1:
                slots = slots + self.mlp_fc2(nn.relu(self.mlp_fc1(self.norm_mlp(slots))))
        return slots, attn_vis

    def _frame_step(self, slots, kv_t):
        k_t, v_t = kv_t
        slots, attn_vis = self._corrector(slots, k_t, v_t)
        next_slots = self.predictor(slots)
        return next_slots, (slots, attn_vis)

    def __call__(self, inputs, noise=None):
        """inputs: [B, T, N, input_size] -> (slots [B,T,S,D], attns [B,T,N,S]).

        noise: optional fixed [B, S, D] slot-init noise (testing hook for
        cross-framework parity; default samples from the 'slots' rng).
        """
        B = inputs.shape[0]
        compute_dtype = self.dtype or inputs.dtype
        if noise is None:
            noise = _sample_slot_noise(
                self.make_rng("slots"),
                (B, self.num_slots, self.slot_size),
            )
        slots0 = (
            self.slot_mu + jnp.exp(self.slot_log_sigma) * noise
        ).astype(compute_dtype)

        x = self.norm_inputs(inputs)
        k = self.project_k(x) * (self.slot_size ** -0.5)  # [B, T, N, D]
        v = self.project_v(x)

        scan = nn.scan(
            type(self)._frame_step,
            variable_broadcast="params",
            split_rngs={"params": False},
            in_axes=1,
            out_axes=1,
        )
        _, (slots_seq, attns_seq) = scan(self, slots0, (k, v))
        return slots_seq, attns_seq
