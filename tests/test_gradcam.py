"""Grad-CAM test on a tiny Motionformer."""

import jax.numpy as jnp
import numpy as np

from tests.test_motionformer import make_inputs, mf_cfg


def test_gradcam_heatmaps():
    from focus_tpu.models.build import build_model, init_model
    from focus_tpu.visualization.gradcam import gradcam_motionformer

    cfg = mf_cfg()
    model = build_model(cfg)
    x, metadata = make_inputs(cfg)
    variables = init_model(model, cfg, (x, metadata))
    cams = gradcam_motionformer(model, variables, x, metadata, layer_idx=1)
    T = cfg.MF.TEMPORAL_RESOLUTION
    side = 32 // cfg.MF.PATCH_SIZE
    assert cams.shape == (2, T, side, side)
    c = np.asarray(cams)
    assert np.isfinite(c).all()
    assert c.min() >= 0.0 and c.max() <= 1.0 + 1e-6
