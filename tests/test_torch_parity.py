"""End-to-end logit parity: flax Motionformer/ORViT vs a torch replica of
the reference model, weights transferred through the checkpoint importer.

This is the strongest available stand-in for the zoo-checkpoint parity
goal (no network access to fetch real checkpoints): identical weights and
inputs must produce identical eval logits through the full model."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from focus_tpu.config import get_cfg  # noqa: E402


def parity_cfg(orvit_layers=()):
    cfg = get_cfg()
    cfg.MODEL.MODEL_NAME = "Motionformer"
    cfg.MODEL.NUM_CLASSES = 7
    cfg.TRAIN.DATASET = "ssv2"
    # patch 56 on a 224 crop -> 16 patches == base grid, no pos interpolation
    cfg.DATA.TRAIN_CROP_SIZE = 224
    cfg.MF.PATCH_SIZE = 56
    cfg.MF.PATCH_SIZE_TEMP = 2
    cfg.MF.EMBED_DIM = 24
    cfg.MF.DEPTH = 3
    cfg.MF.NUM_HEADS = 2
    cfg.MF.MLP_RATIO = 4
    cfg.MF.QKV_BIAS = True
    cfg.MF.TEMPORAL_RESOLUTION = 2
    cfg.MF.USE_MLP = True
    cfg.ORVIT.LAYERS = list(orvit_layers)
    cfg.ORVIT.ENABLE = bool(orvit_layers)
    cfg.ORVIT.O = 3
    cfg.ORVIT.MOTION_STREAM_N_HEADS = 2
    cfg.TPU.COMPUTE_DTYPE = "float32"
    return cfg


def export_reference_names(tmodel):
    """Torch replica state_dict -> reference checkpoint names."""
    sd = {}
    for k, v in tmodel.state_dict().items():
        k = k.replace(".seq.0.", ".0.").replace(".seq.2.", ".2.")
        if k.startswith("proj."):
            k = "patch_embed_3d." + k
        sd[k] = v.detach().numpy()
    return sd


@pytest.mark.parametrize("orvit_layers", [(), (1,)])
def test_motionformer_parity_with_torch_replica(orvit_layers):
    import jax.numpy as jnp

    from focus_tpu.models.build import build_model, init_model
    from focus_tpu.utils.torch_import import import_torch_params
    from tests.torch_reference import Motionformer as TorchMF

    cfg = parity_cfg(orvit_layers)
    torch.manual_seed(0)
    tmodel = TorchMF(cfg)
    # randomise params so parity is non-trivial
    with torch.no_grad():
        for p in tmodel.parameters():
            p.copy_(torch.randn_like(p) * 0.05)
    tmodel.eval()

    rs = np.random.RandomState(0)
    B, T = 2, 4
    video = rs.rand(B, T, 224, 224, 3).astype(np.float32)
    boxes = (rs.rand(B, 2, cfg.ORVIT.O, 4) * 0.4 + 0.2).astype(np.float32)
    metadata = {"orvit_bboxes": boxes}

    with torch.no_grad():
        ref = tmodel(
            torch.from_numpy(video.transpose(0, 4, 1, 2, 3)),
            {"orvit_bboxes": torch.from_numpy(boxes)},
        ).numpy()

    model = build_model(cfg)
    variables = init_model(
        model, cfg, (jnp.asarray(video), {"orvit_bboxes": jnp.asarray(boxes)})
    )
    sd = export_reference_names(tmodel)
    new_params, report = import_torch_params(sd, variables["params"],
                                             allow_missing=False)
    assert not report["missing"], report["missing"]
    assert not report["unused"], report["unused"]

    ours = model.apply(
        {"params": new_params}, jnp.asarray(video),
        {"orvit_bboxes": jnp.asarray(boxes)},
    )
    np.testing.assert_allclose(np.asarray(ours), ref, atol=2e-5)
