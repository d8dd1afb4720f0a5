"""Parity vs golden fixtures generated from the ACTUAL reference modules.

Fixtures under tests/fixtures/*.npz are produced by
scripts/make_golden_fixtures.py running /root/reference/slowfast code
(true oracle; see that script for the stub caveats). Each test loads the
reference inputs + torch state_dict, maps the weights into the flax
module, and requires fp32-level agreement.
"""

import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

FIXDIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "fixtures")


def load(name):
    path = os.path.join(FIXDIR, f"{name}.npz")
    if not os.path.exists(path):
        pytest.skip(f"fixture {name} missing — run scripts/make_golden_fixtures.py")
    data = dict(np.load(path))
    sd = {k[3:]: v for k, v in data.items() if k.startswith("sd/")}
    rest = {k: v for k, v in data.items() if not k.startswith("sd/")}
    return rest, sd


def lin(sd, name, bias=True):
    out = {"kernel": jnp.asarray(sd[f"{name}.weight"].T)}
    if bias and f"{name}.bias" in sd:
        out["bias"] = jnp.asarray(sd[f"{name}.bias"])
    return out


def lnp(sd, name):
    return {
        "scale": jnp.asarray(sd[f"{name}.weight"]),
        "bias": jnp.asarray(sd[f"{name}.bias"]),
    }


def convp(sd, name):
    return {
        "kernel": jnp.asarray(sd[f"{name}.weight"].transpose(2, 3, 1, 0)),
        "bias": jnp.asarray(sd[f"{name}.bias"]),
    }


@pytest.mark.parametrize("variant", ["orig", "learnedv"])
def test_trajectory_attention_golden(variant):
    from focus_tpu.models.motionformer import TrajectoryAttention

    d, sd = load(f"trajectory_attention_{variant}")
    C = d["x"].shape[-1]
    mod = TrajectoryAttention(
        dim=C, num_heads=int(d["num_heads"]), qkv_bias=True,
        use_original_code=(variant == "orig"),
    )
    params = {
        "qkv": lin(sd, "qkv"),
        "proj_q": lin(sd, "proj_q"),
        "proj_kv": lin(sd, "proj_kv"),
        "proj": lin(sd, "proj"),
    }
    out, _ = mod.apply(
        {"params": params}, jnp.asarray(d["x"]), tuple(d["thw"]),
        deterministic=True,
    )
    np.testing.assert_allclose(np.asarray(out), d["out"], atol=3e-5)


def test_box_layout_golden():
    from focus_tpu.ops.layout import box2spatial_layout

    d, _ = load("box_layout")
    H, W = d["hw"]
    out = box2spatial_layout(
        jnp.asarray(d["boxes"]), jnp.asarray(d["vecs"]), int(H), int(W)
    )
    # reference returns [B, C, T, H, W]; ours is [B, T, H, W, C]
    ref = d["out"].transpose(0, 2, 3, 4, 1)
    np.testing.assert_allclose(np.asarray(out), ref, atol=3e-5)


def _mha_p(sd, name):
    return {
        "proj_q": {"linear": lin(sd, f"{name}.attn.proj_q", False)},
        "proj_k": {"linear": lin(sd, f"{name}.attn.proj_k", False)},
        "proj_v": {"linear": lin(sd, f"{name}.attn.proj_v", False)},
        "proj_o": {"linear": lin(sd, f"{name}.attn.proj_o", False)},
    }


def _enc_p(sd, prefix):
    p = {"layer_norm": lnp(sd, f"{prefix}.layer_norm")}
    i = 0
    while f"{prefix}.blocks.{i}.attn_layer_norm.weight" in sd:
        b = f"{prefix}.blocks.{i}"
        p[f"blocks_{i}"] = {
            "attn_layer_norm": lnp(sd, f"{b}.attn_layer_norm"),
            "attn": {
                "proj_q": {"linear": lin(sd, f"{b}.attn.proj_q", False)},
                "proj_k": {"linear": lin(sd, f"{b}.attn.proj_k", False)},
                "proj_v": {"linear": lin(sd, f"{b}.attn.proj_v", False)},
                "proj_o": {"linear": lin(sd, f"{b}.attn.proj_o", False)},
            },
            "ffn_layer_norm": lnp(sd, f"{b}.ffn_layer_norm"),
            "ffn": {
                "fc1": {"linear": lin(sd, f"{b}.ffn.0")},
                "fc2": {"linear": lin(sd, f"{b}.ffn.2")},
            },
        }
        i += 1
    return p


def test_slot_attention_video_golden():
    from focus_tpu.models.steve.slot_attention import SlotAttentionVideo

    d, sd = load("slot_attention_video")
    B, T, N, D_in = d["inputs"].shape
    S, D_slot = d["noise"].shape[1:]
    mod = SlotAttentionVideo(
        num_iterations=2, num_slots=S, input_size=D_in, slot_size=D_slot,
        mlp_hidden_size=24, num_predictor_blocks=1, num_predictor_heads=2,
        dropout=0.0,
    )
    params = {
        "slot_mu": jnp.asarray(sd["slot_mu"]),
        "slot_log_sigma": jnp.asarray(sd["slot_log_sigma"]),
        "norm_inputs": lnp(sd, "norm_inputs"),
        "norm_slots": lnp(sd, "norm_slots"),
        "norm_mlp": lnp(sd, "norm_mlp"),
        "project_q": {"linear": lin(sd, "project_q", False)},
        "project_k": {"linear": lin(sd, "project_k", False)},
        "project_v": {"linear": lin(sd, "project_v", False)},
        "gru": {
            "weight_ih": jnp.asarray(sd["gru.weight_ih"].T),
            "weight_hh": jnp.asarray(sd["gru.weight_hh"].T),
            "bias_ih": jnp.asarray(sd["gru.bias_ih"]),
            "bias_hh": jnp.asarray(sd["gru.bias_hh"]),
        },
        "mlp_fc1": {"linear": lin(sd, "mlp.0")},
        "mlp_fc2": {"linear": lin(sd, "mlp.2")},
        "predictor": _enc_p(sd, "predictor"),
    }
    slots, attns = mod.apply(
        {"params": params}, jnp.asarray(d["inputs"]),
        noise=jnp.asarray(d["noise"]),
    )
    np.testing.assert_allclose(np.asarray(slots), d["slots"], atol=2e-4)
    np.testing.assert_allclose(np.asarray(attns), d["attns"], atol=2e-4)


def test_dvae_golden():
    from focus_tpu.models.steve.dvae import DVAE

    d, sd = load("dvae")
    mod = DVAE(16, 3)
    params = {
        "encoder": {
            "stem": {"conv": convp(sd, "encoder.0.m")},
            **{
                f"block_{i}": {"conv": convp(sd, f"encoder.{i + 1}.m")}
                for i in range(6)
            },
            "head": convp(sd, "encoder.7"),
        },
        "decoder": {
            "in_block": {"conv": convp(sd, "decoder.0.m")},
            "block_0": {"conv": convp(sd, "decoder.1.m")},
            "block_1": {"conv": convp(sd, "decoder.2.m")},
            "block_2": {"conv": convp(sd, "decoder.3.m")},
            "up_proj_0": {"conv": convp(sd, "decoder.4.m")},
            "block_3": {"conv": convp(sd, "decoder.6.m")},
            "block_4": {"conv": convp(sd, "decoder.7.m")},
            "block_5": {"conv": convp(sd, "decoder.8.m")},
            "up_proj_1": {"conv": convp(sd, "decoder.9.m")},
            "head": convp(sd, "decoder.11"),
        },
    }
    x = jnp.asarray(d["x"].transpose(0, 2, 3, 1))  # NCHW -> NHWC
    logits = mod.apply({"params": params}, x, method=lambda m, v: m.encoder(v))
    np.testing.assert_allclose(
        np.asarray(logits).transpose(0, 3, 1, 2), d["logits"], atol=3e-5
    )
    z = jnp.asarray(d["z_hard"].transpose(0, 2, 3, 1))
    recon = mod.apply({"params": params}, z, method=lambda m, v: m.decoder(v))
    np.testing.assert_allclose(
        np.asarray(recon).transpose(0, 3, 1, 2), d["recon"], atol=3e-5
    )


def test_steve_transformer_decoder_golden():
    from focus_tpu.models.common import TransformerDecoder

    d, sd = load("steve_transformer_decoder")
    p = {"layer_norm": lnp(sd, "layer_norm")}
    i = 0
    while f"blocks.{i}.self_attn_layer_norm.weight" in sd:
        b = f"blocks.{i}"
        p[f"blocks_{i}"] = {
            "self_attn_layer_norm": lnp(sd, f"{b}.self_attn_layer_norm"),
            "self_attn": {
                "proj_q": {"linear": lin(sd, f"{b}.self_attn.proj_q", False)},
                "proj_k": {"linear": lin(sd, f"{b}.self_attn.proj_k", False)},
                "proj_v": {"linear": lin(sd, f"{b}.self_attn.proj_v", False)},
                "proj_o": {"linear": lin(sd, f"{b}.self_attn.proj_o", False)},
            },
            "encoder_decoder_attn_layer_norm": lnp(
                sd, f"{b}.encoder_decoder_attn_layer_norm"
            ),
            "encoder_decoder_attn": {
                "proj_q": {
                    "linear": lin(sd, f"{b}.encoder_decoder_attn.proj_q", False)
                },
                "proj_k": {
                    "linear": lin(sd, f"{b}.encoder_decoder_attn.proj_k", False)
                },
                "proj_v": {
                    "linear": lin(sd, f"{b}.encoder_decoder_attn.proj_v", False)
                },
                "proj_o": {
                    "linear": lin(sd, f"{b}.encoder_decoder_attn.proj_o", False)
                },
            },
            "ffn_layer_norm": lnp(sd, f"{b}.ffn_layer_norm"),
            "ffn": {
                "fc1": {"linear": lin(sd, f"{b}.ffn.0")},
                "fc2": {"linear": lin(sd, f"{b}.ffn.2")},
            },
        }
        i += 1
    mod = TransformerDecoder(i, d["inp"].shape[-1], 2)
    out = mod.apply(
        {"params": p}, jnp.asarray(d["inp"]), jnp.asarray(d["encoder_out"])
    )
    np.testing.assert_allclose(np.asarray(out), d["out"], atol=3e-5)


def test_multiscale_attention_golden():
    from focus_tpu.models.mvit import MultiScaleAttention
    from focus_tpu.utils.torch_import import import_torch_params

    d, sd = load("multiscale_attention")
    C = d["x"].shape[-1]
    mod = MultiScaleAttention(
        dim=C, num_heads=int(d["num_heads"]), qkv_bias=True,
        kernel_q=(1, 3, 3), kernel_kv=(1, 3, 3), stride_q=(1, 1, 1),
        stride_kv=(1, 2, 2), mode="conv", has_cls_embed=True,
        pool_first=False,
    )
    x = jnp.asarray(d["x"])
    variables = mod.init(jax.random.PRNGKey(0), x, tuple(d["thw"]))
    new_params, report = import_torch_params(sd, variables["params"])
    assert not report["missing"], report["missing"]
    out, out_thw = mod.apply({"params": new_params}, x, tuple(d["thw"]))
    assert list(out_thw) == list(d["out_thw"])
    np.testing.assert_allclose(np.asarray(out), d["out"], atol=3e-5)


def test_orvit_block_golden():
    from focus_tpu.config import get_cfg
    from focus_tpu.config.node import StaticCfg
    from focus_tpu.models.orvit import ORViTBlock
    from focus_tpu.utils.torch_import import import_torch_params

    d, sd = load("orvit_block")
    cfg = get_cfg()
    cfg.ORVIT.O = 3
    cfg.ORVIT.USE_MOTION_STREAM = True
    cfg.ORVIT.MOTION_STREAM_ATTN_TYPE = "joint"
    cfg.DATA.NUM_FRAMES = 4
    C = d["x"].shape[-1]
    T = int(d["thw"][0])
    mod = ORViTBlock(StaticCfg(cfg), dim=C, num_heads=4, qkv_bias=True, nb_frames=T)
    x = jnp.asarray(d["x"])
    meta = {"orvit_bboxes": jnp.asarray(d["boxes"])}
    variables = mod.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        x, meta, tuple(d["thw"]),
    )
    new_params, report = import_torch_params(sd, variables["params"])
    assert not report["missing"], report["missing"]
    out, _ = mod.apply(
        {"params": new_params}, x, meta, tuple(d["thw"]), deterministic=True
    )
    np.testing.assert_allclose(np.asarray(out), d["out"], atol=2e-4)
