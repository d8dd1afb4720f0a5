"""Parity of STEVE components vs torch replicas: dVAE, SlotAttentionVideo,
TransformerDecoder — identical weights + inputs -> identical outputs."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def t2n(t):
    return t.detach().numpy()


def test_dvae_parity():
    from focus_tpu.models.steve.dvae import DVAE
    from tests.torch_reference_steve import DVAE as TorchDVAE

    tm = TorchDVAE(vocab=16, channels=3).eval()
    jm = DVAE(16, 3)
    rs = np.random.RandomState(0)
    x = rs.rand(2, 32, 32, 3).astype(np.float32)
    variables = jm.init(jax.random.PRNGKey(0), jnp.asarray(x))

    # map torch -> flax params
    p = variables["params"]

    def conv(torch_conv):
        return {
            "kernel": jnp.asarray(t2n(torch_conv.weight).transpose(2, 3, 1, 0)),
            "bias": jnp.asarray(t2n(torch_conv.bias)),
        }

    enc = tm.encoder
    p["encoder"] = {
        "stem": {"conv": conv(enc[0].m)},
        **{f"block_{i}": {"conv": conv(enc[i + 1].m)} for i in range(6)},
        "head": conv(enc[7]),
    }
    dec = tm.decoder
    p["decoder"] = {
        "in_block": {"conv": conv(dec[0].m)},
        "block_0": {"conv": conv(dec[1].m)},
        "block_1": {"conv": conv(dec[2].m)},
        "block_2": {"conv": conv(dec[3].m)},
        "up_proj_0": {"conv": conv(dec[4].m)},
        "block_3": {"conv": conv(dec[6].m)},
        "block_4": {"conv": conv(dec[7].m)},
        "block_5": {"conv": conv(dec[8].m)},
        "up_proj_1": {"conv": conv(dec[9].m)},
        "head": conv(dec[11]),
    }
    with torch.no_grad():
        ref_logits = tm.encoder(torch.from_numpy(x.transpose(0, 3, 1, 2)))
        ref_recon = tm.decoder(ref_logits)
    ours_logits = jm.apply(
        {"params": p}, jnp.asarray(x), method=lambda m, v: m.encoder(v)
    )
    ours_recon = jm.apply(
        {"params": p}, ours_logits, method=lambda m, v: m.decoder(v)
    )
    np.testing.assert_allclose(
        np.asarray(ours_logits).transpose(0, 3, 1, 2), t2n(ref_logits), atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(ours_recon).transpose(0, 3, 1, 2), t2n(ref_recon), atol=2e-4
    )


def _lin(torch_lin, bias=True):
    out = {"kernel": jnp.asarray(t2n(torch_lin.weight).T)}
    if bias and torch_lin.bias is not None:
        out["bias"] = jnp.asarray(t2n(torch_lin.bias))
    return out


def _ln(torch_ln):
    return {
        "scale": jnp.asarray(t2n(torch_ln.weight)),
        "bias": jnp.asarray(t2n(torch_ln.bias)),
    }


def _mha(torch_mha):
    return {
        "proj_q": {"linear": _lin(torch_mha.proj_q, False)},
        "proj_k": {"linear": _lin(torch_mha.proj_k, False)},
        "proj_v": {"linear": _lin(torch_mha.proj_v, False)},
        "proj_o": {"linear": _lin(torch_mha.proj_o, False)},
    }


def _ffn(torch_ffn):
    return {
        "fc1": {"linear": _lin(torch_ffn.fc1)},
        "fc2": {"linear": _lin(torch_ffn.fc2)},
    }


def _enc_params(torch_enc):
    p = {"layer_norm": _ln(torch_enc.layer_norm)}
    for i, blk in enumerate(torch_enc.blocks):
        p[f"blocks_{i}"] = {
            "attn_layer_norm": _ln(blk.attn_layer_norm),
            "attn": _mha(blk.attn),
            "ffn_layer_norm": _ln(blk.ffn_layer_norm),
            "ffn": _ffn(blk.ffn),
        }
    return p


def _dec_params(torch_dec):
    p = {"layer_norm": _ln(torch_dec.layer_norm)}
    for i, blk in enumerate(torch_dec.blocks):
        p[f"blocks_{i}"] = {
            "self_attn_layer_norm": _ln(blk.self_attn_layer_norm),
            "self_attn": _mha(blk.self_attn),
            "encoder_decoder_attn_layer_norm": _ln(
                blk.encoder_decoder_attn_layer_norm
            ),
            "encoder_decoder_attn": _mha(blk.encoder_decoder_attn),
            "ffn_layer_norm": _ln(blk.ffn_layer_norm),
            "ffn": _ffn(blk.ffn),
        }
    return p


def test_transformer_decoder_parity():
    from focus_tpu.models.common import TransformerDecoder
    from tests.torch_reference_steve import TransformerDecoder as TorchTD

    torch.manual_seed(0)
    tm = TorchTD(2, 32, 16, 4).eval()
    for prm in tm.parameters():
        with torch.no_grad():
            prm.copy_(torch.randn_like(prm) * 0.2)
    rs = np.random.RandomState(0)
    x = rs.randn(2, 9, 16).astype(np.float32)
    enc = rs.randn(2, 5, 16).astype(np.float32)
    with torch.no_grad():
        ref = t2n(tm(torch.from_numpy(x), torch.from_numpy(enc)))
    jm = TransformerDecoder(2, 16, 4)
    ours = jm.apply(
        {"params": _dec_params(tm)}, jnp.asarray(x), jnp.asarray(enc)
    )
    np.testing.assert_allclose(np.asarray(ours), ref, atol=2e-5)


def test_slot_attention_parity():
    from focus_tpu.models.steve.slot_attention import SlotAttentionVideo
    from tests.torch_reference_steve import SlotAttentionVideo as TorchSAV

    torch.manual_seed(0)
    B, T, N, D, S = 2, 3, 12, 16, 4
    tm = TorchSAV(2, S, D, D, 24, 1, 2).eval()
    for prm in tm.parameters():
        with torch.no_grad():
            prm.copy_(torch.randn_like(prm) * 0.2)
    rs = np.random.RandomState(0)
    inputs = rs.randn(B, T, N, D).astype(np.float32)
    slots0 = rs.randn(B, S, D).astype(np.float32)
    with torch.no_grad():
        ref_slots, ref_attns = tm(torch.from_numpy(inputs),
                                  torch.from_numpy(slots0))

    jm = SlotAttentionVideo(2, S, D, D, 24, 1, 2)
    p = {
        "slot_mu": jnp.asarray(t2n(tm.slot_mu)),
        "slot_log_sigma": jnp.asarray(t2n(tm.slot_log_sigma)),
        "norm_inputs": _ln(tm.norm_inputs),
        "norm_slots": _ln(tm.norm_slots),
        "norm_mlp": _ln(tm.norm_mlp),
        "project_q": {"linear": _lin(tm.project_q, False)},
        "project_k": {"linear": _lin(tm.project_k, False)},
        "project_v": {"linear": _lin(tm.project_v, False)},
        "gru": {
            "weight_ih": jnp.asarray(t2n(tm.gru.weight_ih).T),
            "weight_hh": jnp.asarray(t2n(tm.gru.weight_hh).T),
            "bias_ih": jnp.asarray(t2n(tm.gru.bias_ih)),
            "bias_hh": jnp.asarray(t2n(tm.gru.bias_hh)),
        },
        "mlp_fc1": {"linear": _lin(tm.mlp[0])},
        "mlp_fc2": {"linear": _lin(tm.mlp[2])},
        "predictor": _enc_params(tm.predictor),
    }

    # bypass the random slot init by calling the scan pieces directly
    import flax.linen as nn

    def run(mdl, inputs, slots0):
        x = mdl.norm_inputs(inputs)
        k = mdl.project_k(x) * (mdl.slot_size ** -0.5)
        v = mdl.project_v(x)
        scan = nn.scan(
            type(mdl)._frame_step,
            variable_broadcast="params",
            split_rngs={"params": False},
            in_axes=1,
            out_axes=1,
        )
        _, (slots_seq, attns_seq) = scan(mdl, slots0, (k, v))
        return slots_seq, attns_seq

    ours_slots, ours_attns = jm.apply(
        {"params": p}, jnp.asarray(inputs), jnp.asarray(slots0), method=run
    )
    np.testing.assert_allclose(np.asarray(ours_slots), t2n(ref_slots), atol=3e-5)
    np.testing.assert_allclose(np.asarray(ours_attns), t2n(ref_attns), atol=3e-5)
