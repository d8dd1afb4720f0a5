"""Name-translation tests for the torch checkpoint importer (the zoo
checkpoints' dotted names for every model family)."""

from focus_tpu.utils.torch_import import flax_path_to_torch


def t(path):
    return flax_path_to_torch(tuple(path.split("/")))


def test_motionformer_names():
    assert t("cls_token") == ("cls_token", "raw")
    assert t("patch_embed_3d/proj/kernel") == ("patch_embed_3d.proj.weight", "linear")
    assert t("blocks_3/attn/qkv/kernel") == ("blocks.3.attn.qkv.weight", "linear")
    assert t("blocks_3/norm1/scale") == ("blocks.3.norm1.weight", "ln_scale")
    assert t("pre_logits_fc/kernel") == ("pre_logits.fc.weight", "linear")
    assert t("blocks_1/patch_to_d/fc1/kernel") == (
        "blocks.1.patch_to_d.0.weight", "linear",
    )
    assert t("blocks_1/motion_stream/attn/attn/qkv/kernel") == (
        "blocks.1.motion_stream.attn.attn.qkv.weight", "linear",
    )


def test_resnet_family_names():
    # wrapper BN collapses: s1/pathway0_stem/bn/bn -> s1.pathway0_stem.bn
    assert t("s1/pathway0_stem/bn/bn/scale") == (
        "s1.pathway0_stem.bn.weight", "ln_scale",
    )
    assert t("s2/pathway0_res0/branch2/a_bn/bn/bias") == (
        "s2.pathway0_res0.branch2.a_bn.bias", "bias",
    )
    assert t("s2/pathway0_res0/branch1/kernel") == (
        "s2.pathway0_res0.branch1.weight", "linear",
    )
    assert t("head/projection/kernel") == ("head.projection.weight", "linear")


def test_mvit_names():
    assert t("patch_embed_proj/kernel") == ("patch_embed.proj.weight", "linear")
    assert t("blocks_2/attn/pool_q/pool/kernel") == (
        "blocks.2.attn.pool_q.weight", "linear",
    )
    assert t("blocks_2/attn/pool_k/norm/scale") == (
        "blocks.2.attn.norm_k.weight", "ln_scale",
    )
    assert t("pos_embed_spatial") == ("pos_embed_spatial", "raw")


def test_steve_names():
    # sequential-stage mapping verified end-to-end by
    # tests/test_full_model_golden.py::test_steve_full_golden
    assert t("dvae/encoder/stem/conv/kernel") == (
        "dvae.encoder.0.m.weight", "linear",
    )
    assert t("dvae/decoder/block_3/conv/bias") == (
        "dvae.decoder.6.m.bias", "bias",
    )
    assert t("steve_encoder/cnn/head/kernel") == (
        "steve_encoder.cnn.fenc.3.weight", "linear",
    )
    assert t("steve_encoder/savi/gru/weight_ih") == (
        "steve_encoder.savi.gru.weight_ih", "linear",
    )
    assert t("steve_decoder/tf/blocks_1/ffn/fc1/linear/kernel") == (
        "steve_decoder.tf.blocks.1.ffn.0.weight", "linear",
    )
    assert t("steve_decoder/dict_emb/embedding") == (
        "steve_decoder.dict.dictionary.weight", "embed",
    )
    assert t("steve_decoder/dict/embedding") == (
        "steve_decoder.dict.dictionary.weight", "embed",
    )


def test_batch_stats_names():
    from focus_tpu.utils.torch_import import import_torch_batch_stats
    import numpy as np

    stats = {"s1": {"pathway0_stem": {"bn": {"bn": {
        "mean": np.zeros(4, np.float32), "var": np.ones(4, np.float32)
    }}}}}
    sd = {
        "s1.pathway0_stem.bn.running_mean": np.full(4, 2.0, np.float32),
        "s1.pathway0_stem.bn.running_var": np.full(4, 3.0, np.float32),
    }
    out = import_torch_batch_stats(sd, stats)
    assert float(out["s1"]["pathway0_stem"]["bn"]["bn"]["mean"][0]) == 2.0
    assert float(out["s1"]["pathway0_stem"]["bn"]["bn"]["var"][0]) == 3.0
