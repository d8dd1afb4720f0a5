"""Native CSN / R(2+1)D backbones (the reference's pytorchvideo model
families, ``slowfast/models/ptv_model_builder.py:516-700``).

Block-level numerics are differentially tested against a torch replica
built from plain ``torch.nn.Conv3d``/``BatchNorm3d`` — pytorchvideo
itself is not installed in either environment (which is why the
reference wrappers are optional), so the replica pins the conv
stride/groups/padding semantics the architectures rely on.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from focus_tpu.config import get_cfg

torch = pytest.importorskip("torch")


def base_cfg(name):
    cfg = get_cfg()
    cfg.MODEL.MODEL_NAME = name
    cfg.MODEL.NUM_CLASSES = 11
    cfg.RESNET.WIDTH_PER_GROUP = 8
    cfg.RESNET.DEPTH = 50
    cfg.DATA.TRAIN_CROP_SIZE = 64
    cfg.DATA.TEST_CROP_SIZE = 64
    cfg.TPU.COMPUTE_DTYPE = "float32"
    return cfg


def run_model(cfg, inputs):
    from focus_tpu.models.build import build_model, init_model

    model = build_model(cfg)
    variables = init_model(model, cfg, (inputs, None))
    return model.apply(variables, inputs, None)


def test_csn_forward():
    cfg = base_cfg("PTVCSN")
    cfg.DATA.NUM_FRAMES = 8
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.rand(2, 8, 64, 64, 3), jnp.float32)
    out = run_model(cfg, [x])
    assert out.shape == (2, 11)
    np.testing.assert_allclose(np.asarray(out.sum(-1)), 1.0, rtol=1e-4)


def test_r2plus1d_forward():
    cfg = base_cfg("PTVR2plus1D")
    cfg.DATA.NUM_FRAMES = 4
    rs = np.random.RandomState(1)
    x = jnp.asarray(rs.rand(2, 4, 64, 64, 3), jnp.float32)
    out = run_model(cfg, [x])
    assert out.shape == (2, 11)
    np.testing.assert_allclose(np.asarray(out.sum(-1)), 1.0, rtol=1e-4)


def test_ptv_aliases_resolve():
    from focus_tpu.models.build import MODEL_REGISTRY
    import focus_tpu.models.registry_imports  # noqa: F401
    from focus_tpu.models.mvit import MViT
    from focus_tpu.models.resnet_video import ResNet, SlowFast, X3D

    assert MODEL_REGISTRY.get("PTVResNet") is ResNet
    assert MODEL_REGISTRY.get("PTVSlowFast") is SlowFast
    assert MODEL_REGISTRY.get("PTVX3D") is X3D
    assert MODEL_REGISTRY.get("PTVMViT") is MViT


def test_ptv_dataset_aliases_resolve():
    import focus_tpu.datasets.registry_imports  # noqa: F401
    from focus_tpu.datasets.build import DATASET_REGISTRY
    from focus_tpu.datasets.kinetics import Kinetics

    assert DATASET_REGISTRY.get("Ptvkinetics") is Kinetics
    assert "Ptvssv2" in DATASET_REGISTRY
    assert "Ptvcharades" in DATASET_REGISTRY


def test_ptv_yaml_configs_build():
    """The shipped pytorchvideo YAMLs resolve to buildable models."""
    import os

    from focus_tpu.config import assert_and_infer_cfg
    from focus_tpu.models.build import build_model

    root = os.path.join(os.path.dirname(os.path.dirname(__file__)),
                        "configs", "Kinetics", "pytorchvideo")
    for fname in ("CSN_32x2_R101.yaml", "R2PLUS1D_16x4_R50.yaml"):
        cfg = get_cfg()
        cfg.merge_from_file(os.path.join(root, fname))
        assert_and_infer_cfg(cfg)
        model = build_model(cfg)
        assert model is not None


# ---------------------------------------------------------------------
# torch-replica block parity
# ---------------------------------------------------------------------


def _randomize(variables, seed):
    rs = np.random.RandomState(seed)
    scale = {"var": (0.5, 1.5), "scale": (0.5, 1.5)}

    def rnd(path, leaf):
        key = path[-1].key
        lo, hi = scale.get(key, (-0.5, 0.5))
        return jnp.asarray(rs.uniform(lo, hi, leaf.shape), jnp.float32)

    return jax.tree_util.tree_map_with_path(rnd, variables)


def _conv_w(kernel):
    # flax [kt, kh, kw, cin/groups, cout] -> torch [cout, cin/groups, ...]
    return torch.from_numpy(
        np.ascontiguousarray(np.transpose(np.asarray(kernel), (4, 3, 0, 1, 2)))
    )


def _load_bn(tbn, params, stats):
    tbn.weight.data = torch.from_numpy(np.asarray(params["bn"]["scale"]))
    tbn.bias.data = torch.from_numpy(np.asarray(params["bn"]["bias"]))
    tbn.running_mean.data = torch.from_numpy(np.asarray(stats["bn"]["mean"]))
    tbn.running_var.data = torch.from_numpy(np.asarray(stats["bn"]["var"]))


class _TorchCSNBlock(torch.nn.Module):
    def __init__(self, din, dout, dinner, stride):
        super().__init__()
        self.a = torch.nn.Conv3d(din, dinner, 1, bias=False)
        self.a_bn = torch.nn.BatchNorm3d(dinner)
        self.b = torch.nn.Conv3d(dinner, dinner, 3, stride=stride,
                                 padding=1, groups=dinner, bias=False)
        self.b_bn = torch.nn.BatchNorm3d(dinner)
        self.c = torch.nn.Conv3d(dinner, dout, 1, bias=False)
        self.c_bn = torch.nn.BatchNorm3d(dout)
        self.sc = torch.nn.Conv3d(din, dout, 1, stride=stride, bias=False)
        self.sc_bn = torch.nn.BatchNorm3d(dout)

    def forward(self, x):
        f = torch.relu(self.a_bn(self.a(x)))
        f = torch.relu(self.b_bn(self.b(f)))
        f = self.c_bn(self.c(f))
        return torch.relu(self.sc_bn(self.sc(x)) + f)


class _TorchR2Plus1DBlock(torch.nn.Module):
    def __init__(self, din, dout, dinner, stride):
        super().__init__()
        t, s = stride[0], stride[1]
        self.a = torch.nn.Conv3d(din, dinner, 1, bias=False)
        self.a_bn = torch.nn.BatchNorm3d(dinner)
        self.b_xy = torch.nn.Conv3d(dinner, dinner, (1, 3, 3),
                                    stride=(1, s, s), padding=(0, 1, 1),
                                    bias=False)
        self.b_xy_bn = torch.nn.BatchNorm3d(dinner)
        self.b_t = torch.nn.Conv3d(dinner, dinner, (3, 1, 1),
                                   stride=(t, 1, 1), padding=(1, 0, 0),
                                   bias=False)
        self.b_t_bn = torch.nn.BatchNorm3d(dinner)
        self.c = torch.nn.Conv3d(dinner, dout, 1, bias=False)
        self.c_bn = torch.nn.BatchNorm3d(dout)
        self.sc = torch.nn.Conv3d(din, dout, 1, stride=stride, bias=False)
        self.sc_bn = torch.nn.BatchNorm3d(dout)

    def forward(self, x):
        f = torch.relu(self.a_bn(self.a(x)))
        f = torch.relu(self.b_xy_bn(self.b_xy(f)))
        f = torch.relu(self.b_t_bn(self.b_t(f)))
        f = self.c_bn(self.c(f))
        return torch.relu(self.sc_bn(self.sc(x)) + f)


def _block_parity(trans, torch_cls, conv_names, stride, seed):
    from focus_tpu.models.norms import get_norm
    from focus_tpu.models.ptv_variants import PTVResBlock

    cfg = get_cfg()
    din, dout, dinner = 12, 24, 6
    block = PTVResBlock(dim_in=din, dim_out=dout, dim_inner=dinner,
                        stride=stride, trans=trans, norm=get_norm(cfg))
    rs = np.random.RandomState(seed)
    x = rs.rand(2, 4, 8, 8, din).astype(np.float32)
    variables = block.init(jax.random.PRNGKey(0), jnp.asarray(x))
    variables = _randomize(variables, seed + 1)
    out = block.apply(variables, jnp.asarray(x))

    tm = torch_cls(din, dout, dinner, stride)
    p, s = variables["params"], variables["batch_stats"]
    for name in conv_names:
        getattr(tm, name).weight.data = _conv_w(p["branch2"][name]["kernel"])
        _load_bn(getattr(tm, f"{name}_bn"), p["branch2"][f"{name}_bn"],
                 s["branch2"][f"{name}_bn"])
    tm.sc.weight.data = _conv_w(p["branch1"]["kernel"])
    _load_bn(tm.sc_bn, p["branch1_bn"], s["branch1_bn"])
    tm.eval()
    with torch.no_grad():
        ref = tm(torch.from_numpy(x.transpose(0, 4, 1, 2, 3)))
    ref = ref.numpy().transpose(0, 2, 3, 4, 1)
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-5, rtol=1e-5)


def test_csn_block_matches_torch():
    _block_parity("csn", _TorchCSNBlock, ("a", "b", "c"), (2, 2, 2), 7)


def test_r2plus1d_block_matches_torch():
    _block_parity("r2plus1d", _TorchR2Plus1DBlock, ("a", "b_xy", "b_t", "c"),
                  (2, 2, 2), 11)
