"""jax.export serving artifact round-trip (tools/export_model.py):
serialize the eval step with baked-in weights, deserialize into a fresh
context, and require exact logit agreement with the live model —
including at a batch size other than the export example's (symbolic
batch dim)."""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "tools")
)


def _tiny_cfg():
    import __graft_entry__ as ge

    cfg = ge._flagship_cfg(tiny=True)
    cfg.ORVIT.ENABLE = False
    cfg.ORVIT.LAYERS = []
    cfg.MF.DEPTH = 2
    return cfg


def test_export_roundtrip_symbolic_batch(tmp_path):
    from jax import export as jexport

    from export_model import export_model
    from focus_tpu.engine.trainer import build_supervised_state
    from focus_tpu.models.build import build_model
    from focus_tpu.parallel import mesh as mesh_lib

    cfg = _tiny_cfg()
    path = str(tmp_path / "model.jaxexport")
    export_model(cfg, path)
    assert os.path.getsize(path) > 0

    with open(path, "rb") as f:
        exported = jexport.deserialize(bytearray(f.read()))

    # live model with the same (fresh-init, fixed-seed) weights
    mesh = mesh_lib.build_mesh(cfg)
    model = build_model(cfg)
    t, s = cfg.DATA.NUM_FRAMES, cfg.DATA.TEST_CROP_SIZE
    video1 = np.zeros((1, t, s, s, 3), np.float32)
    state = build_supervised_state(
        cfg, model, mesh, (video1, np.zeros(1, np.int32), None, {}), 1
    )

    # a different batch size than the export example (symbolic batch)
    video = np.random.RandomState(0).rand(3, t, s, s, 3).astype(np.float32)
    got = np.asarray(exported.call(jnp.asarray(video)))
    want = np.asarray(
        model.apply({"params": state.params}, jnp.asarray(video), {})
    )
    np.testing.assert_allclose(got, want, atol=1e-6)
