"""Caffe2 checkpoint ingestion: name-conversion golden test against the
actual reference converter, plus an end-to-end load of a synthetic c2
pickle into a ResNet-50 Slow state."""

import pickle
import sys

import numpy as np
import pytest

from focus_tpu.utils.c2_import import c2_name_to_torch, load_c2_state_dict

C2_NAMES = [
    "conv1_w",
    "res_conv1_bn_s",
    "res_conv1_bn_b",
    "res_conv1_bn_rm",
    "res_conv1_bn_riv",
    "res2_0_branch1_w",
    "res2_0_branch1_bn_s",
    "res2_0_branch2a_w",
    "res2_0_branch2a_bn_s",
    "res4_4_branch2c_bn_b",
    "res5_2_branch2b_w",
    "pred_w",
    "pred_b",
    "t_conv1_w",
    "t_res_conv1_bn_s",
    "t_res4_1_branch2a_w",
    "t_pool1_subsample_w",
    "t_pool1_subsample_bn_s",
    "t_res2_3_branch2c_bn_subsample_w",
    "t_res2_3_branch2c_bn_subsample_bn_rm",
    "nonlocal_conv3_1_theta_w",
    "nonlocal_conv3_1_phi_w",
    "nonlocal_conv3_1_g_w",
    "nonlocal_conv3_1_out_w",
    "nonlocal_conv3_1_bn_s",
    "conv_5_w",
    "lin_5_w",
]


def test_c2_names_match_reference_converter():
    import os

    sys.path.insert(
        0,
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "scripts"),
    )
    import make_golden_fixtures as mgf

    mgf._install_stubs()  # iopath/fvcore stubs for the package import
    from slowfast.utils.c2_model_loading import get_name_convert_func

    ref = get_name_convert_func()
    for name in C2_NAMES:
        assert c2_name_to_torch(name) == ref(name), name


def test_c2_pickle_loads_into_resnet_state(tmp_path):
    from focus_tpu.config import get_cfg
    from focus_tpu.engine.trainer import build_supervised_state
    from focus_tpu.models.build import build_model
    from focus_tpu.parallel import mesh as mesh_lib
    from focus_tpu.utils import checkpoint as cu
    from focus_tpu.utils.torch_import import _flatten, flax_path_to_torch

    cfg = get_cfg()
    cfg.MODEL.MODEL_NAME = "ResNet"
    cfg.MODEL.ARCH = "slow"
    cfg.MODEL.NUM_CLASSES = 4
    cfg.RESNET.DEPTH = 50
    cfg.DATA.NUM_FRAMES = 4
    cfg.DATA.TRAIN_CROP_SIZE = 32
    cfg.TPU.COMPUTE_DTYPE = "float32"
    cfg.TRAIN.BATCH_SIZE = 1

    mesh = mesh_lib.build_mesh(cfg)
    model = build_model(cfg)
    v = np.zeros((1, 4, 32, 32, 3), np.float32)
    batch = ([v], np.zeros(1, np.int32), np.zeros(1, np.int32), {})
    state = build_supervised_state(cfg, model, mesh, batch, 1)

    # invert our own name map to synthesize a c2 pickle covering a few
    # known blobs (stem, one branch conv, one bn, head)
    torch_shapes = {}
    for path, leaf in _flatten(state.params).items():
        tname, kind = flax_path_to_torch(path)
        torch_shapes[tname] = (np.shape(leaf), kind)

    def torch_conv_shape(flax_shape):
        # flax [kt, kh, kw, I, O] -> torch/c2 [O, I, kt, kh, kw]
        kt, kh, kw, i, o = flax_shape
        return (o, i, kt, kh, kw)

    rs = np.random.RandomState(0)
    blobs = {}
    expected = {}
    for c2name in ("conv1_w", "res2_0_branch2a_w", "pred_w", "pred_b"):
        tname = c2_name_to_torch(c2name)
        assert tname in torch_shapes, (c2name, tname)
        shape, kind = torch_shapes[tname]
        if c2name.endswith("_b"):
            arr = rs.randn(*shape).astype(np.float32)
        elif len(shape) == 5:
            arr = rs.randn(*torch_conv_shape(shape)).astype(np.float32)
        else:  # linear kernel flax [I, O] -> torch [O, I]
            arr = rs.randn(shape[1], shape[0]).astype(np.float32)
        blobs[c2name] = arr
        expected[tname] = arr
    blobs["conv1_w_momentum"] = np.zeros(3, np.float32)  # must be skipped

    path = str(tmp_path / "c2_checkpoint.pkl")
    with open(path, "wb") as f:
        pickle.dump({"blobs": blobs}, f)

    sd = load_c2_state_dict(path)
    assert set(sd) == set(expected)

    cfg.TEST.CHECKPOINT_TYPE = "caffe2"
    cfg.TEST.CHECKPOINT_FILE_PATH = path
    new_state = cu.load_test_checkpoint(cfg, state)

    # the targeted leaves carry the blob values (layout-transformed)
    flat = _flatten(new_state.params)
    hits = 0
    for p, leaf in flat.items():
        tname, kind = flax_path_to_torch(p)
        if tname == "head.projection.bias":
            np.testing.assert_allclose(
                np.asarray(leaf), expected[tname], rtol=1e-6
            )
            hits += 1
        if tname == "conv1_w" or tname == "s1.pathway0_stem.conv.weight":
            tc = expected["s1.pathway0_stem.conv.weight"]
            np.testing.assert_allclose(
                np.asarray(leaf), np.transpose(tc, (2, 3, 4, 1, 0)),
                rtol=1e-6,
            )
            hits += 1
    assert hits == 2
