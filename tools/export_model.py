"""Export a trained model's eval step as a serialized StableHLO artifact
(``jax.export``) for Python-free serving.

A TPU-native deployment surface beyond the reference (which serves
through torch): the exported artifact embeds the jitted forward —
weights baked in as constants — and reloads into any JAX process (or a
PJRT C++ runtime via the StableHLO payload) without the framework, the
config system, or the checkpoint importer.

    python tools/export_model.py --cfg <yaml> \\
        TEST.CHECKPOINT_FILE_PATH <ckpt> TPU.EXPORT_PATH model.jaxexport

Round-trip is tested in tests/test_export.py: deserialize + call on the
CPU mesh reproduces the eval logits exactly. Symbolic batch ("b") keeps
one artifact valid for any serving batch size.
"""

import sys

import numpy as np


def export_model(cfg, out_path: str, batch: int = 0):
    """Build the model, load the test checkpoint, export the eval step.

    ``batch`` 0 exports with a symbolic batch dimension; a positive
    value pins it (needed for models whose forward has batch-dependent
    static logic).
    """
    import jax
    import jax.numpy as jnp
    from jax import export as jexport

    from focus_tpu.engine.trainer import build_supervised_state
    from focus_tpu.models.build import build_model
    from focus_tpu.parallel import mesh as mesh_lib
    from focus_tpu.utils import checkpoint as cu

    mesh = mesh_lib.build_mesh(cfg)
    model = build_model(cfg)
    t, s = cfg.DATA.NUM_FRAMES, cfg.DATA.TEST_CROP_SIZE
    b0 = batch or 1
    video = np.zeros((b0, t, s, s, 3), np.float32)
    needs_boxes = cfg.ORVIT.ENABLE
    o = int(cfg.ORVIT.O) if needs_boxes else 0
    nf = int(cfg.MF.TEMPORAL_RESOLUTION)
    boxes = np.zeros((b0, nf, o, 4), np.float32) if needs_boxes else None
    meta = {"orvit_bboxes": boxes} if needs_boxes else {}
    state = build_supervised_state(
        cfg, model, mesh, (video, np.zeros(b0, np.int32), None, meta), 1
    )
    state = cu.load_test_checkpoint(cfg, state)

    variables = {"params": jax.device_get(state.params)}
    if state.batch_stats is not None:
        variables["batch_stats"] = jax.device_get(state.batch_stats)

    if needs_boxes:
        def fn(video, boxes):
            return model.apply(
                variables, video, {"orvit_bboxes": boxes}, train=False
            )
        example = (video, boxes)
    else:
        def fn(video):
            return model.apply(variables, video, {}, train=False)
        example = (video,)

    if batch:
        specs = tuple(
            jax.ShapeDtypeStruct(a.shape, a.dtype) for a in example
        )
    else:
        specs = jexport.symbolic_args_specs(example, "b, ...")
    exported = jexport.export(jax.jit(fn))(*specs)
    payload = exported.serialize()
    with open(out_path, "wb") as f:
        f.write(payload)
    print(
        f"exported {cfg.MODEL.MODEL_NAME} eval step -> {out_path} "
        f"({len(payload) / 1e6:.1f} MB, in_avals={exported.in_avals})"
    )
    return out_path


def main():
    from focus_tpu.utils.parser import load_config, parse_args

    args = parse_args(sys.argv[1:])
    cfg = load_config(args)
    out = getattr(cfg.TPU, "EXPORT_PATH", "") or "model.jaxexport"
    export_model(cfg, out)


if __name__ == "__main__":
    main()
