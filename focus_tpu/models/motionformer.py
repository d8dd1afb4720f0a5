"""Motionformer: trajectory-attention video ViT.

Rebuild of the reference model (reference
``slowfast/models/video_model_builder.py:1103-1353`` and
``slowfast/models/attention.py:434-557``) as flax modules, NHWC/NTHWC.

Block layout, positional-embedding tiling (separate spatial+temporal,
reference :1306-1317), eval-time softmax (:1345-1352), the EK dual
verb/noun head (:1341-1348) and the ``use_original_code`` trajectory-
attention quirk are all preserved for checkpoint parity.
"""

import math
from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from focus_tpu.models.build import MODEL_REGISTRY
from focus_tpu.ops import attention as attn_ops

trunc_normal_02 = nn.initializers.truncated_normal(stddev=0.02, lower=-2.0, upper=2.0)

class Mlp(nn.Module):
    """ViT MLP (reference ORViT/utils.py:79-98).

    ``fast_gelu`` (cfg.TPU.FAST_GELU, threaded per-model through the
    block fields) selects the tanh gelu approximation: ~1e-4 absolute
    output delta for a much cheaper VPU path than the exact erf gelu
    (the reference's torch GELU).

    The default exact-erf path routes bf16 activations through
    ``ops.hw_gelu`` — same numerics (exhaustively verified to round-
    to-nearest of the true gelu, closer to truth than the ``lax.erf``
    composition) on hardware tanh/exp2 instead of XLA's software erf."""

    hidden_features: int
    out_features: Optional[int] = None
    drop: float = 0.0
    fast_gelu: bool = False
    int8_dense: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        out_dim = self.out_features or x.shape[-1]
        quant = self.int8_dense and deterministic
        x = int8_or_dense(self.hidden_features, "fc1", True, x, quant,
                          self.dtype)
        if self.fast_gelu:
            x = nn.gelu(x, approximate=True)
        else:
            from focus_tpu.ops import hw_gelu as _hg

            x = _hg.hw_gelu(x) if _hg.use_hw_gelu(x.dtype) else nn.gelu(
                x, approximate=False
            )
        if self.drop > 0.0 and not deterministic:
            x = nn.Dropout(self.drop, deterministic=False)(x)
        x = int8_or_dense(out_dim, "fc2", True, x, quant, self.dtype)
        if self.drop > 0.0 and not deterministic:
            x = nn.Dropout(self.drop, deterministic=False)(x)
        return x


def drop_path(rng, x, drop_prob: float):
    """Stochastic depth per sample (reference ORViT/orvit.py:13-26)."""
    keep = 1.0 - drop_prob
    shape = (x.shape[0],) + (1,) * (x.ndim - 1)
    mask = jnp.floor(keep + jax.random.uniform(rng, shape, x.dtype))
    return x / keep * mask


class DropPath(nn.Module):
    drop_prob: float = 0.0

    @nn.compact
    def __call__(self, x, deterministic: bool = True, rate=None):
        """rate overrides drop_prob (traced value; used by scanned layer
        stacks where the stochastic-depth rate varies per layer)."""
        if rate is None:
            if self.drop_prob == 0.0 or deterministic:
                return x
            return drop_path(self.make_rng("dropout"), x, self.drop_prob)
        if deterministic:
            return x
        keep = (1.0 - rate).astype(x.dtype)
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jnp.floor(keep + jax.random.uniform(self.make_rng("dropout"),
                                                   shape, x.dtype))
        return x / keep * mask


class SlicedDense(nn.Module):
    """A Dense layer that owns the full [in, features_full] parameter (so
    checkpoints map unchanged) but multiplies only the first
    ``features_used`` output columns — used to skip the dead v-half of
    proj_kv on the use_original_code path."""

    features_full: int
    features_used: int
    use_bias: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        kernel = self.param(
            "kernel", trunc_normal_02, (x.shape[-1], self.features_full)
        )
        bias = (
            self.param("bias", nn.initializers.zeros, (self.features_full,))
            if self.use_bias
            else None
        )
        dtype = self.dtype or x.dtype
        out = x.astype(dtype) @ kernel[:, : self.features_used].astype(dtype)
        if bias is not None:
            out = out + bias[: self.features_used].astype(dtype)
        return out


class _DenseParams(nn.Module):
    """Owns nn.Dense-shaped parameters without computing — used by fused
    kernels that consume the raw weights (param tree stays identical to
    the unfused path, so checkpoints map unchanged)."""

    in_features: int
    features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self):
        kernel = self.param(
            "kernel", trunc_normal_02, (self.in_features, self.features)
        )
        bias = (
            self.param("bias", nn.initializers.zeros, (self.features,))
            if self.use_bias
            else None
        )
        return kernel, bias


def int8_or_dense(feat, name, use_bias, inp, quant, dtype):
    """One dense layer, int8-quantized under TPU.INT8_SERVING at eval
    (``quant``) or plain nn.Dense otherwise. Must be called from inside a
    compact ``__call__`` (submodules attach to the caller's scope). The
    param tree is identical either way (kernel/bias under ``name``), so
    f32/bf16 checkpoints serve as int8 directly."""
    if not quant:
        return nn.Dense(feat, use_bias=use_bias,
                        kernel_init=trunc_normal_02, dtype=dtype,
                        name=name)(inp)
    from focus_tpu.ops.quant import quantized_dense

    w, b = _DenseParams(inp.shape[-1], feat, use_bias, name=name)()
    return quantized_dense(inp, w, b)


class TrajectoryAttention(nn.Module):
    """(reference attention.py:479-557)"""

    dim: int
    num_heads: int = 8
    qkv_bias: bool = False
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    use_original_code: bool = True
    use_pallas: bool = False
    int8_dense: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x, thw, with_cls_token: bool = True,
                 deterministic: bool = True):
        B, N, C = x.shape
        F = thw[0]
        h = self.num_heads
        hd = C // h
        scale = hd ** -0.5
        dense = lambda feat, name, bias: nn.Dense(
            feat, use_bias=bias, kernel_init=trunc_normal_02,
            dtype=self.dtype, name=name,
        )
        quant = self.int8_dense and deterministic
        qkv = int8_or_dense(3 * C, "qkv", self.qkv_bias, x, quant,
                            self.dtype)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        import jax as _jax

        # attention-weight dropout (reference attention.py:527 applies
        # attn_drop to the stage-1 weights) forces the unfused XLA path
        drop_attn = self.attn_drop > 0.0 and not deterministic
        fused_ok = (
            self.use_pallas
            and self.use_original_code
            and not drop_attn
            and _jax.default_backend() in ("tpu", "axon")
        )
        if not fused_ok:
            # 'b n (h d) -> (b h) n d' — the unfused path consumes
            # head-split operands. The fused path never builds them:
            # the kernel takes [B, S, C] directly and the CLS row uses
            # the native-layout cls_attention_dense, so two full-tensor
            # head-split transposed copies per layer disappear
            # (round-5 trace track).
            split_heads = lambda t: t.reshape(B, -1, h, hd).transpose(
                0, 2, 1, 3
            ).reshape(B * h, -1, hd)
            qh, kh, vh = map(split_heads, (q, k, v))

        if with_cls_token:
            if fused_ok:
                cls_out = attn_ops.cls_attention_dense(
                    q[:, :1], k, v, scale, h
                )
            else:
                cls_q = qh[:, :1]
                cls_out = attn_ops.cls_attention(cls_q, kh, vh, scale)
                cls_out = cls_out.reshape(B, h, 1, hd).transpose(
                    0, 2, 1, 3
                ).reshape(B, 1, C)

        if fused_ok:
            # fully-fused stage1+stage2 core: the per-frame aggregate
            # tensor never leaves VMEM (focus_tpu/ops/pallas/trajectory_block.py)
            from focus_tpu.ops.pallas.trajectory_block import (
                fused_trajectory_core,
            )

            start = 1 if with_cls_token else 0
            q_p = q[:, start:]
            S = q_p.shape[1]
            n_per_f = S // F
            kf = k[:, start:].reshape(B, F, n_per_f, C)
            vf = v[:, start:].reshape(B, F, n_per_f, C)
            wq2, bq2 = _DenseParams(C, C, self.qkv_bias, name="proj_q")()
            wkv, bkv = _DenseParams(C, 2 * C, self.qkv_bias, name="proj_kv")()
            zeros_c = jnp.zeros((C,), q_p.dtype)
            out = fused_trajectory_core(
                q_p, kf, vf,
                wq2.astype(q_p.dtype),
                (bq2 if bq2 is not None else zeros_c).astype(q_p.dtype),
                wkv[:, :C].astype(q_p.dtype),
                (bkv[:C] if bkv is not None else zeros_c).astype(q_p.dtype),
                scale, h,
            )
        else:
            if with_cls_token:
                q_, k_, v_ = qh[:, 1:], kh[:, 1:], vh[:, 1:]
            else:
                q_, k_, v_ = qh, kh, vh

            # stage 1: spatial attention within each frame, all frames
            if self.use_pallas and not drop_attn:
                from focus_tpu.ops.pallas.trajectory_attention import (
                    space_stage as pallas_space_stage,
                )

                xs = pallas_space_stage(q_, k_, v_, F, scale)
            else:
                xs = attn_ops.space_stage(
                    q_, k_, v_, F, scale,
                    attn_drop=self.attn_drop if drop_attn else 0.0,
                    dropout_rng=self.make_rng("dropout") if drop_attn else None,
                )
            S = xs.shape[1]
            # '(b h) s f d -> b s f (h d)'
            xs = xs.reshape(B, h, S, F, hd).transpose(0, 2, 3, 1, 4).reshape(
                B, S, F, C
            )

            x_diag = attn_ops.take_diagonal(xs, F)  # [B, S, C]
            q2 = dense(C, "proj_q", self.qkv_bias)(x_diag)
            if self.use_original_code:
                # values are the stage-1 aggregates (reference
                # attention.py:544-548), so the v half of proj_kv is dead
                # and the k2 projection reassociates onto the query side
                # (F x fewer FLOPs, k2 never materialised)
                wkv, _ = _DenseParams(C, 2 * C, self.qkv_bias,
                                      name="proj_kv")()
                out = attn_ops.temporal_stage_k2w(
                    q2, wkv[:, :C], xs, F, scale, h
                )
            else:
                kv2 = dense(2 * C, "proj_kv", self.qkv_bias)(xs)
                k2, v2 = jnp.split(kv2, 2, axis=-1)
                out = attn_ops.temporal_stage(
                    q2, k2, v2, xs, F, scale, h,
                    use_original_code=False,
                )

        if with_cls_token:
            out = jnp.concatenate([cls_out, out], axis=1)
        out = int8_or_dense(C, "proj", True, out, quant, self.dtype)
        if self.proj_drop > 0.0 and not deterministic:
            out = nn.Dropout(self.proj_drop, deterministic=False)(out)
        return out, thw


def _block_mlp(dim, mlp_ratio, drop, fast_gelu, dtype, moe_experts,
               moe_capacity, int8_dense=False):
    """The block MLP: dense (reference semantics) or, when
    cfg.TPU.MOE.NUM_EXPERTS > 1, the Switch-routed MoE extension
    (models/moe.py; the expert einsums stay bf16 — TPU.INT8_SERVING
    covers the dense layers only)."""
    if moe_experts > 1:
        from focus_tpu.models.moe import MoEMlp

        return MoEMlp(
            int(dim * mlp_ratio), num_experts=moe_experts,
            capacity_factor=moe_capacity, drop=drop,
            fast_gelu=fast_gelu, dtype=dtype, name="mlp",
        )
    return Mlp(
        int(dim * mlp_ratio), drop=drop, fast_gelu=fast_gelu,
        int8_dense=int8_dense, dtype=dtype, name="mlp",
    )


class TrajectoryAttentionBlock(nn.Module):
    """(reference attention.py:443-476)"""

    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    qkv_bias: bool = False
    drop: float = 0.0
    attn_drop: float = 0.0
    drop_path_rate: float = 0.0
    use_original_code: bool = True
    use_pallas: bool = False
    fast_gelu: bool = False
    int8_dense: bool = False
    moe_experts: int = 0
    moe_capacity: float = 1.25
    dtype: Any = None

    @nn.compact
    def __call__(self, x, metadata, thw, deterministic: bool = True):
        y, _ = TrajectoryAttention(
            self.dim, self.num_heads, self.qkv_bias, self.attn_drop,
            self.drop, self.use_original_code, use_pallas=self.use_pallas,
            int8_dense=self.int8_dense, dtype=self.dtype, name="attn",
        )(
            nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm1")(x),
            thw, deterministic=deterministic,
        )
        dp = DropPath(self.drop_path_rate, name="drop_path")
        x = x + dp(y, deterministic=deterministic)
        y = _block_mlp(self.dim, self.mlp_ratio, self.drop, self.fast_gelu,
                       self.dtype, self.moe_experts, self.moe_capacity,
                       int8_dense=self.int8_dense)(
            nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm2")(x),
            deterministic=deterministic,
        )
        x = x + dp(y, deterministic=deterministic)
        return x, thw


class _TrajBlockScanBody(nn.Module):
    """Scan body: one trajectory block with the per-layer stochastic-depth
    rate as a scanned input. thw/deterministic are static attributes; the
    carried value is the token tensor."""

    dim: int
    num_heads: int
    mlp_ratio: float
    qkv_bias: bool
    drop: float
    attn_drop: float
    thw: Any
    deterministic: bool
    use_original_code: bool = True
    use_pallas: bool = False
    fast_gelu: bool = False
    int8_dense: bool = False
    moe_experts: int = 0
    moe_capacity: float = 1.25
    dtype: Any = None

    @nn.compact
    def __call__(self, x, dpr_i, moe_w=1.0):
        y, _ = TrajectoryAttention(
            self.dim, self.num_heads, self.qkv_bias, self.attn_drop,
            self.drop, self.use_original_code, use_pallas=self.use_pallas,
            int8_dense=self.int8_dense, dtype=self.dtype, name="attn",
        )(
            nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm1")(x),
            tuple(self.thw), deterministic=self.deterministic,
        )
        dp = DropPath(name="drop_path")
        x = x + dp(y, deterministic=self.deterministic, rate=dpr_i)
        mlp_kwargs = (
            {"sow_weight": moe_w} if self.moe_experts > 1 else {}
        )
        y = _block_mlp(self.dim, self.mlp_ratio, self.drop, self.fast_gelu,
                       self.dtype, self.moe_experts, self.moe_capacity,
                       int8_dense=self.int8_dense)(
            nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm2")(x),
            deterministic=self.deterministic, **mlp_kwargs,
        )
        x = x + dp(y, deterministic=self.deterministic, rate=dpr_i)
        return x, None


class ScannedTrajBlocks(nn.Module):
    """A contiguous run of identical trajectory-attention blocks executed
    as one lax.scan with stacked parameters — the compiled program contains
    a single block body regardless of depth. Param leaves carry a leading
    layer axis; the torch importer stacks the corresponding per-layer
    checkpoint tensors (see focus_tpu/utils/torch_import.py)."""

    length: int
    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    qkv_bias: bool = False
    drop: float = 0.0
    attn_drop: float = 0.0
    dpr: Any = ()  # per-layer stochastic-depth rates, length == length
    use_original_code: bool = True
    use_pallas: bool = False
    fast_gelu: bool = False
    int8_dense: bool = False
    moe_experts: int = 0
    moe_capacity: float = 1.25
    remat: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x, metadata, thw, deterministic: bool = True):
        body = _TrajBlockScanBody
        if self.remat:
            # save only matmul outputs across the scan; the backward
            # recomputes the O(S^2 F) attention residuals (cfg.TPU.REMAT)
            body = nn.remat(
                body,
                policy=jax.checkpoint_policies.dots_with_no_batch_dims_saveable,
                prevent_cse=False,
            )
        scan = nn.scan(
            body,
            variable_axes={"params": 0, "moe": 0},
            split_rngs={"params": True, "dropout": True},
            in_axes=0,
            length=self.length,
        )
        dpr = jnp.asarray(list(self.dpr), jnp.float32)
        x, _ = scan(
            dim=self.dim, num_heads=self.num_heads,
            mlp_ratio=self.mlp_ratio, qkv_bias=self.qkv_bias,
            drop=self.drop, attn_drop=self.attn_drop, thw=tuple(thw),
            deterministic=deterministic,
            use_original_code=self.use_original_code,
            use_pallas=self.use_pallas, fast_gelu=self.fast_gelu,
            int8_dense=self.int8_dense,
            moe_experts=self.moe_experts, moe_capacity=self.moe_capacity,
            dtype=self.dtype, name="body",
        )(x, dpr)
        return x, thw


class _PipeStageStack(nn.Module):
    """One pipeline stage: its layers_per_stage trajectory blocks run as
    an nn.scan with stacked params ([layers, ...] leaves)."""

    layers: int
    dim: int
    num_heads: int
    mlp_ratio: float
    qkv_bias: bool
    drop: float
    attn_drop: float
    thw: Any
    deterministic: bool
    use_original_code: bool = True
    use_pallas: bool = False
    fast_gelu: bool = False
    int8_dense: bool = False
    moe_experts: int = 0
    moe_capacity: float = 1.25
    remat: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x, dpr_stage, moe_w=1.0):
        body = _TrajBlockScanBody
        if self.remat:
            body = nn.remat(
                body,
                policy=jax.checkpoint_policies.dots_with_no_batch_dims_saveable,
                prevent_cse=False,
            )
        scan = nn.scan(
            body,
            variable_axes={"params": 0, "moe": 0},
            split_rngs={"params": True, "dropout": True},
            in_axes=(0, nn.broadcast),
            length=self.layers,
        )
        x, _ = scan(
            dim=self.dim, num_heads=self.num_heads,
            mlp_ratio=self.mlp_ratio, qkv_bias=self.qkv_bias,
            drop=self.drop, attn_drop=self.attn_drop, thw=tuple(self.thw),
            deterministic=self.deterministic,
            use_original_code=self.use_original_code,
            use_pallas=self.use_pallas, fast_gelu=self.fast_gelu,
            int8_dense=self.int8_dense,
            moe_experts=self.moe_experts, moe_capacity=self.moe_capacity,
            dtype=self.dtype, name="layers",
        )(x, dpr_stage, moe_w)
        return x


class _PipeTick(nn.Module):
    """One pipeline tick: feed stage 0 with the next microbatch, run all
    stages as ONE vmapped computation (the stage axis of params and
    activations is sharded over the mesh 'pipe' axis, so each stage's
    compute stays on its own devices), emit the last stage's output and
    rotate the ring buffer (jnp.roll on a pipe-sharded axis lowers to a
    collective-permute)."""

    stages: int
    layers_per_stage: int
    dpr: Any
    dim: int
    num_heads: int
    mlp_ratio: float
    qkv_bias: bool
    drop: float
    attn_drop: float
    thw: Any
    deterministic: bool
    use_original_code: bool = True
    use_pallas: bool = False
    fast_gelu: bool = False
    int8_dense: bool = False
    moe_experts: int = 0
    moe_capacity: float = 1.25
    remat: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, state, xs):
        from focus_tpu.parallel.mesh import shard_pipeline_state

        feed, valid = xs  # valid: [stages] 1.0 where this tick's work
        # on that stage is a real microbatch (not warm-up/drain bubble)
        state = state.at[0].set(feed.astype(state.dtype))
        state = shard_pipeline_state(state)
        dpr = jnp.asarray(list(self.dpr), jnp.float32).reshape(
            self.stages, self.layers_per_stage
        )
        stages = nn.vmap(
            _PipeStageStack,
            variable_axes={"params": 0, "moe": 0},
            split_rngs={"params": True, "dropout": True},
            in_axes=(0, 0, 0),
            out_axes=0,
        )
        out = stages(
            layers=self.layers_per_stage, dim=self.dim,
            num_heads=self.num_heads, mlp_ratio=self.mlp_ratio,
            qkv_bias=self.qkv_bias, drop=self.drop,
            attn_drop=self.attn_drop, thw=tuple(self.thw),
            deterministic=self.deterministic,
            use_original_code=self.use_original_code,
            use_pallas=self.use_pallas, fast_gelu=self.fast_gelu,
            int8_dense=self.int8_dense,
            moe_experts=self.moe_experts, moe_capacity=self.moe_capacity,
            remat=self.remat, dtype=self.dtype, name="pipe_stages",
        )(state, dpr, valid)
        out = shard_pipeline_state(out)
        y = out[-1]
        return jnp.roll(out, 1, axis=0), y


class PipelinedTrajBlocks(nn.Module):
    """Pipeline-parallel execution of a homogeneous trajectory-attention
    stack over the mesh 'pipe' axis — a TPU scaling extension (the
    reference is DDP-only, slowfast/utils/distributed.py).

    GSPMD circular-pipeline formulation (no shard_map): parameters carry
    a leading [stages, layers_per_stage] axis whose stage dim is sharded
    over 'pipe' (parallel/mesh.py state_shardings); activations live in a
    [stages, microbatch, N, C] ring buffer with the same leading
    sharding. Each tick runs every stage as one vmapped computation and
    rotates the ring; microbatch m emerges from the last stage at tick
    m + stages - 1, so M microbatches finish in M + stages - 1 ticks
    (bubble fraction (stages-1)/(M+stages-1)). Composes with the data
    and model mesh axes; parameter memory per device scales 1/stages.

    Call/param layout differs from ScannedTrajBlocks ([L, ...] leaves
    under 'body'); parallel/pipeline.py converts between the two, so
    checkpoints trained either way interchange."""

    stages: int
    microbatches: int
    length: int
    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    qkv_bias: bool = False
    drop: float = 0.0
    attn_drop: float = 0.0
    dpr: Any = ()  # per-layer stochastic-depth rates, length == length
    use_original_code: bool = True
    use_pallas: bool = False
    fast_gelu: bool = False
    int8_dense: bool = False
    moe_experts: int = 0
    moe_capacity: float = 1.25
    remat: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x, metadata, thw, deterministic: bool = True):
        from focus_tpu.parallel.mesh import shard_pipeline_state

        stages, m = self.stages, self.microbatches
        if self.length % stages:
            raise ValueError(
                f"depth {self.length} not divisible by {stages} pipeline "
                f"stages (TPU.MESH.PIPE)"
            )
        b, n, c = x.shape
        if b % m:
            raise ValueError(
                f"batch {b} not divisible by {m} pipeline microbatches "
                f"(TPU.MESH.PIPE_MICROBATCHES)"
            )
        x_mb = x.reshape(m, b // m, n, c)
        if stages > 1:
            # drain-tick feeds are dummies: their outputs would emerge at
            # tick >= M + stages - 1 and are never collected
            feeds = jnp.concatenate(
                [x_mb, jnp.broadcast_to(x_mb[-1:], (stages - 1,) + x_mb.shape[1:])],
                axis=0,
            )
        else:
            feeds = x_mb
        state0 = shard_pipeline_state(
            jnp.zeros((stages, b // m, n, c), x.dtype)
        )
        # valid[t, s] = stage s runs microbatch t-s at tick t; warm-up
        # (t < s) and drain (t-s >= m) work is pipeline bubble whose
        # outputs are discarded — MoE aux statistics are masked with it
        ticks_idx = jnp.arange(m + stages - 1)[:, None]
        stage_idx = jnp.arange(stages)[None, :]
        valid = (
            (ticks_idx - stage_idx >= 0) & (ticks_idx - stage_idx < m)
        ).astype(jnp.float32)
        ticks = nn.scan(
            _PipeTick,
            variable_broadcast="params",
            variable_axes={"moe": 0},
            split_rngs={"params": False, "dropout": True},
            in_axes=0,
            out_axes=0,
            length=m + stages - 1,
        )
        _, ys = ticks(
            stages=stages, layers_per_stage=self.length // stages,
            dpr=tuple(self.dpr), dim=self.dim, num_heads=self.num_heads,
            mlp_ratio=self.mlp_ratio, qkv_bias=self.qkv_bias,
            drop=self.drop, attn_drop=self.attn_drop, thw=tuple(thw),
            deterministic=deterministic,
            use_original_code=self.use_original_code,
            use_pallas=self.use_pallas, fast_gelu=self.fast_gelu,
            int8_dense=self.int8_dense,
            moe_experts=self.moe_experts, moe_capacity=self.moe_capacity,
            remat=self.remat, dtype=self.dtype, name="ticks",
        )(state0, (feeds, valid))
        return ys[stages - 1:].reshape(b, n, c), thw


class SelfAttention(nn.Module):
    """Joint space-time MHA (reference attention.py:355-385)."""

    dim: int
    num_heads: int = 8
    qkv_bias: bool = False
    proj_drop: float = 0.0
    int8_dense: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x, thw=None, deterministic: bool = True):
        B, N, C = x.shape
        h = self.num_heads
        hd = C // h
        quant = self.int8_dense and deterministic
        qkv = int8_or_dense(3 * C, "qkv", self.qkv_bias, x, quant,
                            self.dtype)
        qkv = qkv.reshape(B, N, 3, h, hd).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        out = attn_ops.joint_attention(q, k, v, hd ** -0.5)
        out = out.transpose(0, 2, 1, 3).reshape(B, N, C)
        out = int8_or_dense(C, "proj", True, out, quant, self.dtype)
        if self.proj_drop > 0.0 and not deterministic:
            out = nn.Dropout(self.proj_drop, deterministic=False)(out)
        return out, thw


class SelfAttentionBlock(nn.Module):
    """(reference attention.py:388-432, 'SeltAttentionBlock')"""

    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    qkv_bias: bool = False
    drop_rate: float = 0.0
    drop_path_rate: float = 0.0
    fast_gelu: bool = False
    int8_dense: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x, metadata=None, thw=None, deterministic: bool = True):
        y, thw = SelfAttention(
            self.dim, self.num_heads, self.qkv_bias, self.drop_rate,
            int8_dense=self.int8_dense, dtype=self.dtype, name="attn",
        )(nn.LayerNorm(dtype=self.dtype, name="norm1")(x), thw,
          deterministic=deterministic)
        dp = DropPath(self.drop_path_rate, name="drop_path")
        x = x + dp(y, deterministic=deterministic)
        y = Mlp(int(self.dim * self.mlp_ratio), drop=self.drop_rate,
                fast_gelu=self.fast_gelu, int8_dense=self.int8_dense,
                dtype=self.dtype, name="mlp")(
            nn.LayerNorm(dtype=self.dtype, name="norm2")(x),
            deterministic=deterministic,
        )
        x = x + dp(y, deterministic=deterministic)
        return x, thw


class _ConvParams(nn.Module):
    """Parameter holder matching _ConvAsMatmul's tree ("proj/kernel" in
    conv layout) for paths that consume the raw kernel (Pallas patch
    embed)."""

    dim: int
    kshape: tuple

    @nn.compact
    def __call__(self):
        k = self.param(
            "kernel", nn.initializers.xavier_uniform(),
            (*self.kshape, self.dim),
        )
        b = self.param("bias", nn.initializers.zeros, (self.dim,))
        return k, b


class _ConvAsMatmul(nn.Module):
    """Dense layer whose parameters keep nn.Conv's kernel layout
    ([*kshape, dim]) so checkpoints/importers are unaffected."""

    dim: int
    kshape: tuple
    dtype: Any = None

    @nn.compact
    def __call__(self, patches):
        k = self.param(
            "kernel", nn.initializers.xavier_uniform(),
            (*self.kshape, self.dim),
        )
        b = self.param("bias", nn.initializers.zeros, (self.dim,))
        dtype = self.dtype or patches.dtype
        w = k.reshape(-1, self.dim).astype(dtype)
        return patches.astype(dtype) @ w + b.astype(dtype)


class PatchEmbed3D(nn.Module):
    """3D conv tokenizer (reference stem_helper.py:290-321). Input
    [B, T, H, W, C] -> tokens [B, T'·H'·W', dim].

    With stride == kernel (every Motionformer/MViT config) the conv is
    a non-overlapping patch projection — computed as reshape + matmul:
    XLA's conv emitter measured ~11 TFLOP/s on this shape in the device
    trace where the dense form runs the MXU at full rate (~10x).
    On TPU the gather+matmul runs as one Pallas kernel
    (ops/pallas/patch_embed.py) — the XLA permute costs ~2.7 ms/step in
    layout copies at the flagship shape; the param tree ("proj/kernel"
    in conv layout) is identical on every path."""

    dim: int
    kernel: tuple
    stride: tuple
    use_pallas: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        import jax as _jax

        kt, kh, kw = self.kernel
        if tuple(self.kernel) == tuple(self.stride):
            B, T, H, W, C = x.shape
            t_, h_, w_ = T // kt, H // kh, W // kw
            fused_ok = (
                self.use_pallas
                and _jax.default_backend() in ("tpu", "axon")
                and C <= 8 and (kw * 8) % 128 == 0
                and H % kh == 0 and W % kw == 0 and T >= kt
            )
            if fused_ok:
                from focus_tpu.ops.pallas.patch_embed import patch_embed_3d

                k, b = _ConvParams(
                    self.dim, (kt, kh, kw, C), name="proj"
                )()
                dtype = self.dtype or x.dtype
                tokens, thw = patch_embed_3d(
                    x.astype(dtype), k, b, (kt, kh, kw)
                )
                return tokens, thw
            patches = x[:, : t_ * kt, : h_ * kh, : w_ * kw].reshape(
                B, t_, kt, h_, kh, w_, kw, C
            ).transpose(0, 1, 3, 5, 2, 4, 6, 7).reshape(
                B, t_ * h_ * w_, kt * kh * kw * C
            )
            tokens = _ConvAsMatmul(
                self.dim, (kt, kh, kw, C), dtype=self.dtype, name="proj"
            )(patches)
            return tokens, (t_, h_, w_)
        x = nn.Conv(
            self.dim, self.kernel, strides=self.stride, padding="VALID",
            kernel_init=nn.initializers.xavier_uniform(), dtype=self.dtype,
            name="proj",
        )(x)
        B = x.shape[0]
        return x.reshape(B, -1, self.dim), x.shape[1:4]


def interpolate_pos_embed(pos_embed, npatch: int):
    """Bicubic resize of the spatial pos-embed grid for non-224 crops
    (reference video_model_builder.py:1285-1300)."""
    N = pos_embed.shape[1] - 1
    if npatch == N:
        return pos_embed
    dim = pos_embed.shape[-1]
    cls_pe = pos_embed[:, :1]
    grid = pos_embed[:, 1:].reshape(
        1, int(math.sqrt(N)), int(math.sqrt(N)), dim
    )
    side = int(math.sqrt(npatch))
    grid = jax.image.resize(grid, (1, side, side, dim), method="bicubic")
    return jnp.concatenate([cls_pe, grid.reshape(1, -1, dim)], axis=1)


@MODEL_REGISTRY.register()
class Motionformer(nn.Module):
    """(reference video_model_builder.py:1103-1353)"""

    cfg: Any
    dtype: Any = None

    def setup(self):
        c = self.cfg
        self.img_size = c.DATA.TRAIN_CROP_SIZE
        self.patch_size = c.MF.PATCH_SIZE
        if c.TRAIN.DATASET == "epickitchens":
            self.num_classes = [97, 300]
        else:
            self.num_classes = c.MODEL.NUM_CLASSES
        self.embed_dim = c.MF.EMBED_DIM
        self.depth = c.MF.DEPTH
        self.temporal_resolution = c.MF.TEMPORAL_RESOLUTION
        self.num_base_patches = (224 // self.patch_size) ** 2
        # sequence parallelism shards the token axis; the Pallas kernels
        # are single-device programs, so sp runs the XLA attention path,
        # which GSPMD partitions from the shard_tokens constraints
        self.seq_shard = int(getattr(c.TPU.MESH, "SEQ", 1)) > 1
        pipe_shard = int(getattr(c.TPU.MESH, "PIPE", 1)) > 1
        # (and pp vmaps each stage over a pipe-sharded axis — the fused
        # kernel can't be GSPMD-partitioned there either, so pp also
        # takes the XLA attention path)
        use_pallas = (
            bool(c.TPU.USE_PALLAS) and not self.seq_shard and not pipe_shard
        )

        self.patch_embed_3d = PatchEmbed3D(
            self.embed_dim,
            (c.MF.PATCH_SIZE_TEMP, self.patch_size, self.patch_size),
            (c.MF.PATCH_SIZE_TEMP, self.patch_size, self.patch_size),
            use_pallas=use_pallas,
            dtype=self.dtype,
        )
        self.cls_token = self.param(
            "cls_token", trunc_normal_02, (1, 1, self.embed_dim)
        )
        self.pos_embed = self.param(
            "pos_embed", trunc_normal_02,
            (1, self.num_base_patches + 1, self.embed_dim),
        )
        if c.MF.POS_EMBED == "joint":
            num_patches = self.num_base_patches * self.temporal_resolution
            self.st_embed = self.param(
                "st_embed", trunc_normal_02, (1, num_patches + 1, self.embed_dim)
            )
        elif c.MF.POS_EMBED == "separate":
            self.temp_embed = self.param(
                "temp_embed", nn.initializers.zeros,
                (1, self.temporal_resolution, self.embed_dim),
            )

        import numpy as _np

        dpr = [float(r) for r in _np.linspace(0, c.MF.DROP_PATH, self.depth)]
        scan_layers = bool(getattr(c.TPU, "SCAN_LAYERS", True))

        from focus_tpu.models.orvit import ORViTBlock

        def make_orvit(i):
            return ORViTBlock(
                cfg=c, dim=self.embed_dim, num_heads=c.MF.NUM_HEADS,
                mlp_ratio=c.MF.MLP_RATIO, qkv_bias=c.MF.QKV_BIAS,
                drop=c.MF.DROP, attn_drop=c.MF.ATTN_DROPOUT,
                nb_frames=self.temporal_resolution, dtype=self.dtype,
                name=f"blocks_{i}",
            )

        fast_gelu = bool(getattr(c.TPU, "FAST_GELU", False))
        int8_dense = bool(getattr(c.TPU, "INT8_SERVING", False))
        moe_cfg = getattr(c.TPU, "MOE", None)
        moe_experts = int(getattr(moe_cfg, "NUM_EXPERTS", 0) or 0)
        moe_capacity = float(getattr(moe_cfg, "CAPACITY_FACTOR", 1.25))

        def make_traj(i):
            return TrajectoryAttentionBlock(
                dim=self.embed_dim, num_heads=c.MF.NUM_HEADS,
                mlp_ratio=c.MF.MLP_RATIO, qkv_bias=c.MF.QKV_BIAS,
                drop=c.MF.DROP, attn_drop=c.MF.ATTN_DROPOUT,
                drop_path_rate=dpr[i], use_pallas=use_pallas,
                fast_gelu=fast_gelu, int8_dense=int8_dense,
                moe_experts=moe_experts,
                moe_capacity=moe_capacity,
                dtype=self.dtype, name=f"blocks_{i}",
            )

        pipe = max(int(getattr(c.TPU.MESH, "PIPE", 1)), 1)
        micro = max(
            int(getattr(c.TPU.MESH, "PIPE_MICROBATCHES", 0)), 0
        ) or pipe
        blocks = []
        i = 0
        while i < self.depth:
            if i in c.ORVIT.LAYERS:
                blocks.append(make_orvit(i))
                i += 1
                continue
            j = i
            while j < self.depth and j not in c.ORVIT.LAYERS:
                j += 1
            if pipe > 1 and j - i >= pipe and (j - i) % pipe == 0:
                # segmented pipelining (round-5, verdict #5): each
                # maximal homogeneous trajectory segment runs as its own
                # circular pipeline over the 'pipe' mesh axis; ORViT
                # blocks (and segments shorter than the stage count) run
                # replicated between segments on the data axes. For an
                # ORViT-free stack this reduces to the round-3 design
                # (one pipeline over the whole depth); for ORViT-MF it
                # gives the flagship a real pp path at the cost of one
                # fill/drain bubble per segment.
                blocks.append(
                    PipelinedTrajBlocks(
                        stages=pipe, microbatches=micro, length=j - i,
                        dim=self.embed_dim, num_heads=c.MF.NUM_HEADS,
                        mlp_ratio=c.MF.MLP_RATIO, qkv_bias=c.MF.QKV_BIAS,
                        drop=c.MF.DROP, attn_drop=c.MF.ATTN_DROPOUT,
                        dpr=tuple(dpr[i:j]), use_pallas=use_pallas,
                        fast_gelu=fast_gelu, int8_dense=int8_dense,
                        moe_experts=moe_experts,
                        moe_capacity=moe_capacity,
                        remat=bool(getattr(c.TPU, "REMAT", False)),
                        dtype=self.dtype, name=f"blocks_{i}_{j - 1}",
                    )
                )
                i = j
                continue
            if scan_layers and j - i > 1:
                # consecutive identical blocks -> one scanned stack: the
                # compiled program holds a single body (compile size/time
                # stay constant in depth)
                blocks.append(
                    ScannedTrajBlocks(
                        length=j - i, dim=self.embed_dim,
                        num_heads=c.MF.NUM_HEADS, mlp_ratio=c.MF.MLP_RATIO,
                        qkv_bias=c.MF.QKV_BIAS, drop=c.MF.DROP,
                        attn_drop=c.MF.ATTN_DROPOUT, dpr=tuple(dpr[i:j]),
                        use_pallas=use_pallas,
                        fast_gelu=fast_gelu, int8_dense=int8_dense,
                moe_experts=moe_experts,
                        moe_capacity=moe_capacity,
                        remat=bool(getattr(c.TPU, "REMAT", False)),
                        dtype=self.dtype,
                        name=f"blocks_{i}_{j - 1}",
                    )
                )
            else:
                blocks.extend(make_traj(k) for k in range(i, j))
            i = j
        self.blocks = blocks
        self.norm = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype)

        if c.MF.USE_MLP:
            self.pre_logits_fc = nn.Dense(
                self.embed_dim, kernel_init=trunc_normal_02, dtype=self.dtype
            )
            self.head_act = {"tanh": jnp.tanh, "gelu": nn.gelu}.get(
                c.MF.HEAD_ACT, nn.relu
            )
        if isinstance(self.num_classes, (list, tuple)):
            self.heads = [
                nn.Dense(n, kernel_init=trunc_normal_02, name=f"head{i}")
                for i, n in enumerate(self.num_classes)
            ]
        elif self.num_classes > 0:
            self.head = nn.Dense(self.num_classes, kernel_init=trunc_normal_02)

        self.pos_dropout = c.MF.POS_DROPOUT
        self.head_dropout = c.MF.HEAD_DROPOUT

    def tokenize(self, x, train: bool = False):
        """Patch-embed + CLS + positional embeddings -> (tokens, thw)."""
        c = self.cfg
        B = x.shape[0]
        tokens, (t_, h_, w_) = self.patch_embed_3d(x)
        npatch = h_ * w_

        cls_tokens = jnp.broadcast_to(
            self.cls_token.astype(tokens.dtype), (B, 1, self.embed_dim)
        )
        tokens = jnp.concatenate([cls_tokens, tokens], axis=1)

        pos_embed = interpolate_pos_embed(self.pos_embed, npatch)
        if c.MF.VIDEO_INPUT:
            if c.MF.POS_EMBED == "separate":
                cls_embed = self.pos_embed[:, :1]
                tile_pos = jnp.tile(pos_embed[:, 1:], (1, self.temporal_resolution, 1))
                tile_temp = jnp.repeat(self.temp_embed, npatch, axis=1)
                total = jnp.concatenate([cls_embed, tile_pos + tile_temp], axis=1)
                tokens = tokens + total.astype(tokens.dtype)
            elif c.MF.POS_EMBED == "joint":
                tokens = tokens + self.st_embed.astype(tokens.dtype)
        else:
            tokens = tokens + pos_embed.astype(tokens.dtype)

        if self.pos_dropout > 0.0 and train:
            tokens = nn.Dropout(self.pos_dropout, deterministic=False)(tokens)

        thw = (self.temporal_resolution, int(npatch ** 0.5), int(npatch ** 0.5))
        return tokens, thw

    def forward_features(self, x, metadata, train: bool = False):
        """x: [B, T, H, W, C] -> pooled feature [B, d]."""
        c = self.cfg
        tokens, thw = self.tokenize(x, train=train)
        if self.seq_shard:
            from focus_tpu.parallel.mesh import shard_tokens

            tokens = shard_tokens(tokens)
        for blk in self.blocks:
            tokens, _ = blk(tokens, metadata, thw, deterministic=not train)
            if self.seq_shard:
                tokens = shard_tokens(tokens)
        feat = self.norm(tokens)[:, 0]
        if c.MF.USE_MLP:
            feat = self.head_act(self.pre_logits_fc(feat))
        return feat

    def __call__(self, x, metadata=None, train: bool = False):
        feat = self.forward_features(x, metadata, train=train)
        if self.head_dropout > 0.0 and train:
            feat = nn.Dropout(self.head_dropout, deterministic=False)(feat)
        if isinstance(self.num_classes, (list, tuple)):
            outs = []
            for head in self.heads:
                o = head(feat)
                if not train:
                    o = jax.nn.softmax(o, axis=-1)
                outs.append(o)
            return outs[0], {"verb": outs[0], "noun": outs[1]}
        logits = self.head(feat)
        if not train:
            logits = jax.nn.softmax(logits, axis=-1)
        return logits
