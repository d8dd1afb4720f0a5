"""STEVE: slot-attention video autoencoder.

Rebuild of the reference model (reference ``slowfast/models/STEVE/steve.py:253-392``)
as a flax module, NHWC, with functional RNG. Video tensors are
``[B, T, H, W, C]`` (TPU-native layout; the reference uses NCHW).

The autoregressive rollout (``decode``) runs as a ``lax.scan`` with a
fixed-shape token buffer, so it compiles once for any clip.
"""

import math
from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from focus_tpu.models.build import MODEL_REGISTRY
from focus_tpu.models.common import (
    Dense,
    TransformerDecoder,
    conv2d,
    gumbel_softmax,
    trunc_normal,
    xavier_uniform,
    Conv2dBlock,
)
from focus_tpu.models.steve.dvae import DVAE


class CartesianPositionalEmbedding(nn.Module):
    """Add a projected 4-channel (x, y, 1-x, 1-y) coordinate grid
    (reference steve.py:125-145)."""

    channels: int
    image_size: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        side = self.image_size
        coords = jnp.linspace(0.0, 1.0, side + 1)
        coords = 0.5 * (coords[:-1] + coords[1:])
        gy, gx = jnp.meshgrid(coords, coords, indexing="ij")
        grid = jnp.stack((gx, gy, 1 - gx, 1 - gy), axis=-1)[None]  # [1,H,W,4]
        proj = conv2d(self.channels, 1, dtype=self.dtype, name="projection")
        return x + proj(grid.astype(x.dtype))


class LearnedPositionalEmbedding1D(nn.Module):
    """(reference steve.py:108-122). ``at`` adds the embedding of one
    traced position (KV-cached autoregressive decode)."""

    num_inputs: int
    input_size: int
    dropout: float = 0.1

    def setup(self):
        self.pe = self.param(
            "pe", trunc_normal, (1, self.num_inputs, self.input_size)
        )
        self._drop = nn.Dropout(self.dropout)

    def at(self, x_t, t):
        return x_t + jax.lax.dynamic_slice_in_dim(self.pe, t, 1, axis=1)

    def __call__(self, x, offset: int = 0, deterministic: bool = True):
        T = x.shape[1]
        x = x + self.pe[:, offset : offset + T]
        if self.dropout > 0.0 and not deterministic:
            x = self._drop(x, deterministic=False)
        return x


class BaseCNN(nn.Module):
    """Stack of 5x5 conv blocks (reference steve.py:162-173)."""

    img_size: int
    hid: int
    out_dim: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        stride0 = 1 if self.img_size == 64 else 2
        x = Conv2dBlock(self.hid, 5, stride0, 2, dtype=self.dtype, name="block_0")(x)
        x = Conv2dBlock(self.hid, 5, 1, 2, dtype=self.dtype, name="block_1")(x)
        x = Conv2dBlock(self.hid, 5, 1, 2, dtype=self.dtype, name="block_2")(x)
        return conv2d(self.out_dim, 5, 1, 2, dtype=self.dtype, name="head")(x)


class _BasicBlock(nn.Module):
    """ResNet-18 basic block: two 3x3 conv+BN with identity skip."""

    features: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        norm = lambda name: nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, name=name,
        )
        y = nn.Conv(self.features, (3, 3), padding=1, use_bias=False,
                    dtype=self.dtype, name="conv1")(x)
        y = nn.relu(norm("bn1")(y))
        y = nn.Conv(self.features, (3, 3), padding=1, use_bias=False,
                    dtype=self.dtype, name="conv2")(y)
        y = norm("bn2")(y)
        return nn.relu(x + y)


class Res18Stem(nn.Module):
    """ResNet-18 stem + layer1, then a stride-2 transposed conv back to
    full resolution (reference steve.py:175-202: conv1 is swapped for a
    3x3/s1, children[:-5] keeps conv1/bn1/relu/maxpool/layer1)."""

    hid: int
    out_dim: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.hid, (3, 3), padding=1, dtype=self.dtype, name="conv1")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name="bn1")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        x = _BasicBlock(self.hid, dtype=self.dtype, name="layer1_0")(x, train=train)
        x = _BasicBlock(self.hid, dtype=self.dtype, name="layer1_1")(x, train=train)
        x = nn.relu(x)
        return nn.ConvTranspose(
            self.out_dim, (3, 3), strides=(2, 2), padding="SAME",
            dtype=self.dtype, name="upconv",
        )(x)


class STEVEEncoder(nn.Module):
    """Visual CNN + cartesian pos-emb + MLP + SlotAttentionVideo
    (reference steve.py:213-234)."""

    cfg: Any
    dtype: Any = None

    def setup(self):
        from focus_tpu.models.steve.slot_attention import SlotAttentionVideo

        c = self.cfg
        d = c.SLOTS.DECODER.DIM
        if c.MODEL.CNN_NAME == "base":
            self.cnn = BaseCNN(c.SLOTS.IMG_SIZE, c.SLOTS.CNN_HID_SIZE, d, dtype=self.dtype)
        elif c.MODEL.CNN_NAME == "res18":
            self.cnn = Res18Stem(c.SLOTS.CNN_HID_SIZE, d, dtype=self.dtype)
        else:
            raise ValueError(f"Unknown CNN_NAME: {c.MODEL.CNN_NAME}")
        pos_size = c.SLOTS.IMG_SIZE if c.SLOTS.IMG_SIZE == 64 else c.SLOTS.IMG_SIZE // 2
        self.pos = CartesianPositionalEmbedding(d, pos_size, dtype=self.dtype)
        self.layer_norm = nn.LayerNorm(dtype=self.dtype)
        self.mlp_fc1 = Dense(d, weight_init="kaiming", dtype=self.dtype)
        self.mlp_fc2 = Dense(d, dtype=self.dtype)
        self.savi = SlotAttentionVideo(
            c.SLOTS.NUM_ITERS,
            c.SLOTS.NUM_SLOTS,
            c.SLOTS.DIM,
            c.SLOTS.SIZE,
            c.SLOTS.MLP_HID_SIZE,
            c.SLOTS.NUM_PREDICTOR_BLOCKS,
            c.SLOTS.NUM_PREDICTOR_HEADS,
            c.SLOTS.PREDICTOR_DROPOUT,
            dtype=self.dtype,
        )
        self.slot_proj = Dense(d, use_bias=False, dtype=self.dtype)

    def embed(self, video_flat, train: bool = False):
        """CNN features -> token set. video_flat: [B*T, H, W, C]."""
        emb = self.cnn(video_flat, train=train)
        emb = self.pos(emb)
        bt, h, w, d = emb.shape
        tokens = emb.reshape(bt, h * w, d)
        tokens = self.mlp_fc2(nn.relu(self.mlp_fc1(self.layer_norm(tokens))))
        return tokens, (h, w)


class STEVEDecoder(nn.Module):
    """Token dictionary + BOS + learned pos-emb + causal transformer + head
    (reference steve.py:237-251)."""

    cfg: Any
    dtype: Any = None

    def setup(self):
        c = self.cfg
        d = c.SLOTS.DECODER.DIM
        self.dict_emb = nn.Embed(
            c.SLOTS.VOCAB_SIZE, d, embedding_init=nn.initializers.normal(1.0),
            dtype=self.dtype, name="dict",
        )
        self.bos = self.param("bos", xavier_uniform, (1, 1, d))
        n_tok = 1 + (c.SLOTS.IMG_SIZE // 4) ** 2
        self.pos = LearnedPositionalEmbedding1D(n_tok, d)
        self.tf = TransformerDecoder(
            c.SLOTS.DECODER.NUM_BLOCKS, d, c.SLOTS.DECODER.NUM_HEADS,
            c.SLOTS.DECODER.DROPOUT, dtype=self.dtype,
        )
        self.head = Dense(c.SLOTS.VOCAB_SIZE, use_bias=False, dtype=self.dtype)


@MODEL_REGISTRY.register()
class STEVE(nn.Module):
    """STEVE video autoencoder (reference steve.py:253-392).

    __call__(video, tau, hard) -> (dvae_recon, cross_entropy, mse, attns)
      video: [B, T, H, W, C] in [0, 1]
      attns: [B, T, S, H, W, 1] slot-attention visualisation maps
    """

    cfg: Any
    dtype: Any = None

    def setup(self):
        c = self.cfg
        self.vocab_size = c.SLOTS.VOCAB_SIZE
        self.num_slots = c.SLOTS.NUM_SLOTS
        self.image_size = c.SLOTS.IMG_SIZE
        self.d_model = c.SLOTS.DECODER.DIM
        self.dvae = DVAE(c.SLOTS.VOCAB_SIZE, c.SLOTS.IMG_CHANNELS, dtype=self.dtype)
        self.steve_encoder = STEVEEncoder(c, dtype=self.dtype)
        self.steve_decoder = STEVEDecoder(c, dtype=self.dtype)

    def _slot_pipeline(self, video, train: bool = False):
        """CNN -> tokens -> slot attention. Returns slots + upsampled attns."""
        B, T, H, W, C = video.shape
        video_flat = video.reshape(B * T, H, W, C)
        tokens, (h_enc, w_enc) = self.steve_encoder.embed(video_flat, train=train)
        tokens = tokens.reshape(B, T, h_enc * w_enc, self.d_model)
        slots, attns = self.steve_encoder.savi(tokens)
        # attns: [B, T, N, S] -> spatial maps upsampled to pixels
        attns = attns.transpose(0, 1, 3, 2).reshape(
            B, T, self.num_slots, h_enc, w_enc, 1
        )
        attns = jnp.repeat(attns, H // h_enc, axis=3)
        attns = jnp.repeat(attns, W // w_enc, axis=4)  # [B,T,S,H,W,1]
        return slots, attns

    def __call__(self, video, tau, hard: bool, train: bool = False):
        B, T, H, W, C = video.shape
        video_flat = video.reshape(B * T, H, W, C)

        # -- dVAE branch --------------------------------------------------
        z_logits = jax.nn.log_softmax(self.dvae.encoder(video_flat), axis=-1)
        z_soft = gumbel_softmax(self.make_rng("gumbel"), z_logits, tau, hard)
        z_hard = jax.lax.stop_gradient(
            gumbel_softmax(self.make_rng("gumbel"), z_logits, tau, True)
        )
        h_enc, w_enc = z_logits.shape[1:3]
        z_hard_tok = z_hard.reshape(B * T, h_enc * w_enc, self.vocab_size)
        z_ids = jnp.argmax(z_hard_tok, axis=-1)
        z_emb = self.steve_decoder.dict_emb(z_ids)
        bos = jnp.broadcast_to(self.steve_decoder.bos, (B * T, 1, self.d_model))
        z_emb = jnp.concatenate([bos, z_emb], axis=1)
        z_emb = self.steve_decoder.pos(z_emb, deterministic=not train)

        dvae_recon = self.dvae.decoder(z_soft).reshape(B, T, H, W, C)
        dvae_mse = jnp.sum((video - dvae_recon) ** 2) / (B * T)

        # -- slot branch ---------------------------------------------------
        slots, attns = self._slot_pipeline(video, train=train)
        attns = video[:, :, None] * attns + (1.0 - attns)  # [B,T,S,H,W,C]

        # -- autoregressive token prediction --------------------------------
        slots_proj = self.steve_encoder.slot_proj(slots)  # [B,T,S,d]
        slots_flat = slots_proj.reshape(B * T, self.num_slots, self.d_model)
        pred = self.steve_decoder.tf(
            z_emb[:, :-1], slots_flat, deterministic=not train
        )
        pred = self.steve_decoder.head(pred)
        cross_entropy = (
            -jnp.sum(z_hard_tok * jax.nn.log_softmax(pred, axis=-1)) / (B * T)
        )

        return (
            jnp.clip(dvae_recon, 0.0, 1.0),
            cross_entropy,
            dvae_mse,
            attns,
        )

    def encode(self, video):
        """(reference steve.py:332-357): slots + attention maps."""
        slots, attns = self._slot_pipeline(video)
        attns_vis = video[:, :, None] * attns + (1.0 - attns)
        return slots, attns_vis, attns

    def decode(self, slots, use_kv_cache: bool = True):
        """Autoregressive token rollout -> pixels (reference steve.py:359-381).

        KV-cached fixed-shape scan: step t runs the decoder on ONE token,
        attending over per-layer key/value caches updated in the scan
        carry — O(L^2) total attention work instead of the full-buffer
        re-decode's O(L^3) (the reference recomputes the whole prefix
        every step too; caching is free accuracy-wise because argmax
        sampling is deterministic). ``use_kv_cache=False`` keeps the
        full-buffer path as the parity oracle.
        """
        B = slots.shape[0]
        h_enc = w_enc = self.image_size // 4
        gen_len = h_enc * w_enc

        slots = self.steve_encoder.slot_proj(slots)
        if use_kv_cache:
            import jax as _jax

            fused = (
                bool(getattr(self.cfg.TPU, "FUSED_AR_STEP", True))
                and _jax.default_backend() in ("tpu", "axon")
                # the fused step wins where the AR chain is
                # latency/weight-stream-bound (small rollout batches);
                # at large batches the XLA scan's matmuls amortise the
                # weight stream over more rows and win (measured:
                # B*T=32 fused 69.2 vs XLA 57.3 fps; B*T=128 fused
                # 75.8 vs XLA 116.1 — BENCH_NOTES round 5)
                and slots.shape[0] <= 64
            )
            if fused:
                z_ids = self._decode_ids_cached_fused(slots, gen_len)
            else:
                z_ids = self._decode_ids_cached(slots, gen_len)
        else:
            z_ids = self._decode_ids_full(slots, gen_len)
        z_one_hot = jax.nn.one_hot(z_ids.T, self.vocab_size)  # [B, gen_len, V]
        z_grid = z_one_hot.reshape(B, h_enc, w_enc, self.vocab_size)
        return jnp.clip(self.dvae.decoder(z_grid), 0.0, 1.0)

    def _decode_ids_cached(self, slots, gen_len):
        B = slots.shape[0]
        d = self.d_model
        nb = self.steve_decoder.tf.num_blocks
        h = self.steve_decoder.tf.num_heads
        hd = d // h
        L = 1 + gen_len
        bos = jnp.broadcast_to(
            self.steve_decoder.bos.astype(slots.dtype), (B, 1, d)
        )
        caches = tuple(
            (jnp.zeros((B, L, h, hd), slots.dtype),
             jnp.zeros((B, L, h, hd), slots.dtype))
            for _ in range(nb)
        )
        # slots are constant through the rollout: project each layer's
        # cross-attention K/V ONCE here instead of 2*nb matmuls per scan
        # step (~half the rollout's matmul FLOPs at the default decoder
        # width; the per-step math is unchanged)
        cross_kvs = self.steve_decoder.tf(
            bos, slots, project_kv_only=True
        )

        def step(mdl, carry, t):
            x_t, caches = carry
            x = mdl.steve_decoder.pos.at(x_t, t)
            out, caches = mdl.steve_decoder.tf(
                x, slots, caches=caches, t=t, cross_kvs=cross_kvs
            )
            logits = mdl.steve_decoder.head(out)
            z_id = jnp.argmax(logits, axis=-1)  # [B, 1]
            emb = mdl.steve_decoder.dict_emb(z_id).astype(x_t.dtype)
            return (emb, caches), z_id[:, 0]

        scan = nn.scan(
            step,
            variable_broadcast="params",
            split_rngs={"params": False},
            in_axes=0,
            out_axes=0,
        )
        _, z_ids = scan(self, (bos, caches), jnp.arange(gen_len))
        return z_ids  # [gen_len, B]

    def _decode_ids_cached_fused(self, slots, gen_len):
        """KV-cached rollout with the WHOLE per-token decoder body fused
        into one Pallas call (ops/pallas/ar_decode.py): the per-step
        weight re-stream (~0.94 GB at the default width) runs as one
        continuously double-buffered pipeline instead of ~45 XLA ops,
        and cache reads are bounded by the step index. Same math as
        ``_decode_ids_cached`` (bf16 operands, f32 accumulation);
        ids-parity pinned by tests/test_steve_fused_ar.py."""
        from focus_tpu.ops.pallas.ar_decode import (
            fused_ar_step,
            stack_decoder_params,
        )

        B = slots.shape[0]
        d = self.d_model
        nb = self.steve_decoder.tf.num_blocks
        h = self.steve_decoder.tf.num_heads
        L = 1 + gen_len
        dtype = slots.dtype
        bos = jnp.broadcast_to(
            self.steve_decoder.bos.astype(dtype), (B, 1, d)
        )
        params = self.steve_decoder.tf.variables["params"]
        head_w = self.steve_decoder.head.variables[
            "params"]["linear"]["kernel"]
        dict_w = self.steve_decoder.dict_emb.variables[
            "params"]["embedding"]
        nh = head_w.shape[1] // d
        wstack, lnp, bias, flnp = stack_decoder_params(
            params, nb, head_w=head_w, dict_emb=dict_w, dtype=dtype
        )
        wscale = None
        if bool(getattr(self.cfg.TPU, "INT8_SERVING", False)):
            # W8A16 rollout (labeled variant, INT8_SERVING class): the
            # AR step is weight-HBM-bound, so int8 weight streaming
            # halves its floor; per-output-column scales dequant
            # in-kernel before the bf16 MXU dots
            from focus_tpu.ops.pallas.ar_decode import quantize_wstack

            wstack, wscale = quantize_wstack(wstack)
        pos = self.steve_decoder.pos.pe[0, :L].astype(jnp.float32)
        cross_kvs = self.steve_decoder.tf(bos, slots, project_kv_only=True)
        ckv = jnp.stack([
            jnp.stack([k.reshape(B, -1, d), v.reshape(B, -1, d)])
            for (k, v) in cross_kvs
        ]).astype(dtype)  # [nb, 2, B, S, d]
        k_cache = jnp.zeros((nb, L, B, d), dtype)
        v_cache = jnp.zeros((nb, L, B, d), dtype)

        def step(mdl, carry, t):
            x_t, kc, vc = carry  # x_t: raw embedding (pos added in-kernel)
            nx, z, kc, vc = fused_ar_step(
                x_t[:, 0].astype(dtype), t, wstack, lnp, bias, ckv, kc,
                vc, flnp, pos, heads=h, nh=nh, wscale=wscale,
            )
            return (nx[:, None], kc, vc), z[:, 0]

        scan = nn.scan(
            step,
            variable_broadcast="params",
            split_rngs={"params": False},
            in_axes=0,
            out_axes=0,
        )
        _, z_ids = scan(self, (bos, k_cache, v_cache), jnp.arange(gen_len))
        return z_ids  # [gen_len, B]

    def _decode_ids_full(self, slots, gen_len):
        B = slots.shape[0]
        buf = jnp.zeros((B, 1 + gen_len, self.d_model), slots.dtype)
        bos = jnp.broadcast_to(
            self.steve_decoder.bos.astype(buf.dtype), (B, 1, self.d_model)
        )
        buf = buf.at[:, :1].set(bos)

        def step(mdl, buf, t):
            x = mdl.steve_decoder.pos(buf)
            out = mdl.steve_decoder.tf(x, slots, valid_len=t + 1)
            logits = mdl.steve_decoder.head(
                jax.lax.dynamic_slice_in_dim(out, t, 1, axis=1)
            )
            z_id = jnp.argmax(logits, axis=-1)  # [B, 1]
            emb = mdl.steve_decoder.dict_emb(z_id).astype(buf.dtype)
            buf = jax.lax.dynamic_update_slice_in_dim(buf, emb, t + 1, axis=1)
            return buf, z_id[:, 0]

        scan = nn.scan(
            step,
            variable_broadcast="params",
            split_rngs={"params": False},
            in_axes=0,
            out_axes=0,
        )
        _, z_ids = scan(self, buf, jnp.arange(gen_len))
        return z_ids

    def reconstruct_autoregressive(self, video, use_kv_cache: bool = True):
        """(reference steve.py:383-392)"""
        B, T, H, W, C = video.shape
        slots, _, _ = self.encode(video)
        recon = self.decode(
            slots.reshape(B * T, self.num_slots, -1),
            use_kv_cache=use_kv_cache,
        )
        return recon.reshape(B, T, H, W, C)
