"""Fused AR-decode step (ops/pallas/ar_decode.py) vs the XLA KV-cached
rollout, interpret mode on CPU."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from focus_tpu.config import get_cfg


def tiny_steve_cfg():
    cfg = get_cfg()
    cfg.MODEL.MODEL_NAME = "STEVE"
    cfg.MODEL.CNN_NAME = "base"
    cfg.SLOTS.IMG_SIZE = 16  # gen_len = (16//4)^2 = 16
    cfg.SLOTS.NUM_SLOTS = 3
    cfg.SLOTS.VOCAB_SIZE = 32
    cfg.SLOTS.DECODER.DIM = 32
    cfg.SLOTS.DECODER.NUM_BLOCKS = 2
    cfg.SLOTS.DECODER.NUM_HEADS = 2
    cfg.SLOTS.DECODER.DROPOUT = 0.0
    # f32 so the XLA path doesn't round at bf16 between ops — the fused
    # kernel's accumulation is f32 throughout, and the parity claim is
    # exactness at matched precision
    cfg.TPU.COMPUTE_DTYPE = "float32"
    return cfg


@pytest.fixture(scope="module")
def steve_model():
    from focus_tpu.models.build import build_model, init_model

    cfg = tiny_steve_cfg()
    model = build_model(cfg)
    rs = np.random.RandomState(0)
    video = jnp.asarray(rs.rand(2, 2, 16, 16, 3), jnp.float32)
    variables = init_model(model, cfg, (video, 1.0, True))
    return cfg, model, variables, video


def test_fused_ar_ids_match_xla_cached(steve_model, monkeypatch):
    """Fused-kernel rollout must produce the SAME token ids as the XLA
    KV-cached scan (argmax sampling; both paths bf16-class math run here
    in f32, so ids and pixels agree to float tolerance)."""
    from focus_tpu.models.steve import steve as steve_mod
    from focus_tpu.ops.pallas import ar_decode

    cfg, model, variables, video = steve_model
    B = 4  # B*T rollout rows
    rs = np.random.RandomState(1)
    slots = jnp.asarray(
        rs.randn(B, cfg.SLOTS.NUM_SLOTS, cfg.SLOTS.DIM) * 0.5, jnp.float32
    )

    def ids_with(fused):
        monkeypatch.setattr(ar_decode, "INTERPRET", True)
        monkeypatch.setattr(
            jax, "default_backend", (lambda: "tpu") if fused
            else (lambda: "cpu"),
        )
        def run(mdl):
            s = mdl.steve_encoder.slot_proj(slots)
            gen_len = (cfg.SLOTS.IMG_SIZE // 4) ** 2
            if fused:
                return mdl._decode_ids_cached_fused(s, gen_len)
            return mdl._decode_ids_cached(s, gen_len)

        return model.apply(variables, method=run)

    ids_ref = np.asarray(ids_with(False))
    ids_fused = np.asarray(ids_with(True))
    np.testing.assert_array_equal(ids_fused, ids_ref)


def test_fused_ar_step_matches_decoder_body(steve_model, monkeypatch):
    """Single fused step vs the Flax decoder body + head + dict embed
    at a mid-rollout position: next-x, ids and cache rows must match."""
    from focus_tpu.ops.pallas.ar_decode import (
        fused_ar_step,
        stack_decoder_params,
    )

    cfg, model, variables, video = steve_model
    d = cfg.SLOTS.DECODER.DIM
    nb = cfg.SLOTS.DECODER.NUM_BLOCKS
    h = cfg.SLOTS.DECODER.NUM_HEADS
    hd = d // h
    B, L = 3, 9
    t = 4
    rs = np.random.RandomState(2)
    x = jnp.asarray(rs.randn(B, 1, d) * 0.5, jnp.float32)
    slots = jnp.asarray(
        rs.randn(B, cfg.SLOTS.NUM_SLOTS, d) * 0.5, jnp.float32
    )
    caches = tuple(
        (jnp.asarray(rs.randn(B, L, h, hd) * 0.3, jnp.float32),
         jnp.asarray(rs.randn(B, L, h, hd) * 0.3, jnp.float32))
        for _ in range(nb)
    )

    def ref(mdl):
        xp = mdl.steve_decoder.pos.at(x, t)  # kernel adds pos in-step
        cross_kvs = mdl.steve_decoder.tf(xp, slots, project_kv_only=True)
        out, new_caches = mdl.steve_decoder.tf(
            xp, slots, caches=caches, t=t, cross_kvs=cross_kvs
        )
        logits = mdl.steve_decoder.head(out)
        z_id = jnp.argmax(logits, axis=-1)
        emb = mdl.steve_decoder.dict_emb(z_id)
        pos_tab = mdl.steve_decoder.pos.pe[0]
        return emb, z_id, new_caches, cross_kvs, pos_tab

    nx_ref, z_ref, caches_ref, cross_kvs, pos_tab = model.apply(
        variables, method=ref
    )

    params = variables["params"]["steve_decoder"]["tf"]
    head_w = variables["params"]["steve_decoder"]["head"]["linear"][
        "kernel"]
    dict_w = variables["params"]["steve_decoder"]["dict"]["embedding"]
    nh = head_w.shape[1] // d
    wstack, lnp, bias, flnp = stack_decoder_params(
        params, nb, head_w=head_w, dict_emb=dict_w, dtype=jnp.float32
    )
    ckv = jnp.stack([
        jnp.stack([k.reshape(B, -1, d), v.reshape(B, -1, d)])
        for (k, v) in cross_kvs
    ])
    # kernel cache layout [nb, L, B, d]; rows >= t must not influence y
    k_cache = jnp.stack(
        [k.reshape(B, L, d).transpose(1, 0, 2) for k, _ in caches]
    )
    v_cache = jnp.stack(
        [v.reshape(B, L, d).transpose(1, 0, 2) for _, v in caches]
    )
    nx, z, k_new, v_new = fused_ar_step(
        x[:, 0], t, wstack, lnp, bias, ckv, k_cache, v_cache, flnp,
        jnp.asarray(pos_tab[:L], jnp.float32), heads=h, nh=nh,
        interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(z)[:, 0], np.asarray(z_ref)[:, 0])
    np.testing.assert_allclose(
        np.asarray(nx), np.asarray(nx_ref[:, 0]), atol=2e-5
    )
    # cache row t must hold this step's k/v (match the flax cache)
    for i in range(nb):
        k_ref_i = caches_ref[i][0].reshape(B, L, d)
        v_ref_i = caches_ref[i][1].reshape(B, L, d)
        np.testing.assert_allclose(
            np.asarray(k_new[i, t]), np.asarray(k_ref_i[:, t]), atol=2e-5
        )
        np.testing.assert_allclose(
            np.asarray(v_new[i, t]), np.asarray(v_ref_i[:, t]), atol=2e-5
        )


def test_fused_ar_step_int8_exact_on_representable_weights(steve_model):
    """W8A8 mode mechanics: with weights snapped to their own int8
    grid, the remaining error is the dynamic activation quantization
    (~amax/254 per element). At this tiny width that noise can flip
    near-tie argmaxes, so the pin is statistical agreement + bounded
    next-x drift rather than bit-exactness (the eval-side
    INT8_SERVING class)."""
    from focus_tpu.ops.pallas.ar_decode import (
        fused_ar_step,
        quantize_wstack,
        stack_decoder_params,
    )

    cfg, model, variables, video = steve_model
    d = cfg.SLOTS.DECODER.DIM
    nb = cfg.SLOTS.DECODER.NUM_BLOCKS
    h = cfg.SLOTS.DECODER.NUM_HEADS
    hd = d // h
    B, L, t = 3, 9, 4
    rs = np.random.RandomState(4)
    x = jnp.asarray(rs.randn(B, d) * 0.5, jnp.float32)
    slots_kv = jnp.asarray(rs.randn(nb, 2, B, 2, d) * 0.5, jnp.float32)
    caches = (
        jnp.asarray(rs.randn(nb, L, B, d) * 0.3, jnp.float32),
        jnp.asarray(rs.randn(nb, L, B, d) * 0.3, jnp.float32),
    )
    params = variables["params"]["steve_decoder"]["tf"]
    head_w = variables["params"]["steve_decoder"]["head"]["linear"][
        "kernel"]
    dict_w = variables["params"]["steve_decoder"]["dict"]["embedding"]
    nh = head_w.shape[1] // d
    wstack, lnp, bias, flnp = stack_decoder_params(
        params, nb, head_w=head_w, dict_emb=dict_w, dtype=jnp.float32
    )
    # snap the weights to their own int8 grid -> quantization is lossless
    wi8, scale = quantize_wstack(wstack)
    wsnap = wi8.astype(jnp.float32) * scale
    wi8b, scale_b = quantize_wstack(wsnap)
    pos = jnp.asarray(rs.randn(L, d) * 0.1, jnp.float32)

    nx_f, z_f, _, _ = fused_ar_step(
        x, t, wsnap, lnp, bias, slots_kv, caches[0], caches[1], flnp,
        pos, heads=h, nh=nh, interpret=True,
    )
    nx_q, z_q, _, _ = fused_ar_step(
        x, t, wi8b, lnp, bias, slots_kv, caches[0], caches[1], flnp,
        pos, heads=h, nh=nh, wscale=scale_b, interpret=True,
    )
    zq, zf = np.asarray(z_q)[:, 0], np.asarray(z_f)[:, 0]
    assert np.isfinite(np.asarray(nx_q)).all()
    agree = zq == zf
    assert agree.mean() >= 0.5, (zq, zf)
    # rows whose id agrees embed the same dictionary row -> next-x is
    # the (quantized) embedding of the same token
    np.testing.assert_allclose(
        np.asarray(nx_q)[agree], np.asarray(nx_f)[agree],
        rtol=5e-2, atol=5e-2,
    )
