"""timm-style load_pretrained transformations (reference
models/utils.py:48-210) on a synthetic local timm ViT checkpoint."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from focus_tpu.utils import timm_pretrained as tp  # noqa: E402


def fake_timm_sd(n_cls=1000, patches=196, dim=8):
    rs = np.random.RandomState(0)
    sd = {
        "patch_embed.proj.weight": rs.randn(dim, 3, 16, 16).astype(np.float32),
        "patch_embed.proj.bias": rs.randn(dim).astype(np.float32),
        "pos_embed": rs.randn(1, patches + 1, dim).astype(np.float32),
        "blocks.0.attn.qkv.weight": rs.randn(3 * dim, dim).astype(np.float32),
        "blocks.0.attn.qkv.bias": rs.randn(3 * dim).astype(np.float32),
        "head.weight": rs.randn(n_cls, dim).astype(np.float32),
        "head.bias": rs.randn(n_cls).astype(np.float32),
    }
    return sd


def test_load_state_dict_strips_prefixes(tmp_path):
    sd = fake_timm_sd()
    payload = {
        "state_dict": {
            "module." + k: torch.from_numpy(v) for k, v in sd.items()
        }
    }
    path = tmp_path / "ckpt.pth"
    torch.save(payload, path)
    out = tp.load_timm_state_dict(str(path))
    assert set(out) == set(sd)
    np.testing.assert_allclose(out["head.bias"], sd["head.bias"])


def test_conv_filter_splits_qkv_and_renames_head():
    sd = fake_timm_sd(dim=8)
    # linear patchify form too
    sd["patch_embed.proj.weight"] = sd["patch_embed.proj.weight"].reshape(
        8, -1
    )
    out = tp.conv_filter(sd, patch_size=16)
    assert out["patch_embed.proj.weight"].shape == (8, 3, 16, 16)
    assert "head.projection.weight" in out and "head.weight" not in out
    assert out["blocks.0.attn.q.weight"].shape == (8, 8)
    np.testing.assert_allclose(
        np.concatenate(
            [out[f"blocks.0.attn.{n}.weight"] for n in "qkv"], axis=0
        ),
        sd["blocks.0.attn.qkv.weight"],
    )


def test_classifier_mismatch_dropped_and_1001_sliced():
    out = tp.timm_to_video_state(
        fake_timm_sd(n_cls=400), num_classes=174, num_patches=196,
        target_patch_kernel=(2, 16, 16),
    )
    assert "head.projection.weight" not in out

    out = tp.timm_to_video_state(
        fake_timm_sd(n_cls=1001), num_classes=1000, num_patches=196,
        target_patch_kernel=(2, 16, 16), pretrained_num_classes=1001,
    )
    assert out["head.projection.weight"].shape[0] == 1000


def test_pos_embed_resize_and_split():
    out = tp.timm_to_video_state(
        fake_timm_sd(patches=196), num_classes=1000, num_patches=49,
        target_patch_kernel=(2, 16, 16),
    )
    assert out["pos_embed_class"].shape == (1, 1, 8)
    assert out["pos_embed_spatial"].shape == (1, 49, 8)


def test_patch_kernel_inflation_and_resize():
    out = tp.timm_to_video_state(
        fake_timm_sd(), num_classes=1000, num_patches=196,
        target_patch_kernel=(3, 7, 7),
    )
    w = out["patch_embed.proj.weight"]
    assert w.shape == (8, 3, 3, 7, 7)
    # temporal inflation is a broadcast of the resized 2D kernel
    np.testing.assert_allclose(w[:, :, 0], w[:, :, 2])


def test_in_chans_conversion():
    out = tp.timm_to_video_state(
        fake_timm_sd(), num_classes=1000, num_patches=196,
        target_patch_kernel=None, in_chans=1,
    )
    assert out["patch_embed.proj.weight"].shape[1] == 1

    sd = fake_timm_sd()
    ref_sum = sd["patch_embed.proj.weight"].astype(np.float64)
    out = tp.timm_to_video_state(
        sd, num_classes=1000, num_patches=196,
        target_patch_kernel=None, in_chans=6,
    )
    w = out["patch_embed.proj.weight"]
    assert w.shape[1] == 6
    # repeated channels scaled by 3/in_chans preserve response magnitude
    np.testing.assert_allclose(
        w[:, :3] * 2.0, ref_sum, rtol=1e-6
    )
