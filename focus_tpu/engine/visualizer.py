"""Model visualisation entry (counterpart of reference
``tools/visualization.py``): Grad-CAM overlays, weight histograms, and
input videos written to TensorBoard.
"""

from __future__ import annotations

import jax
import numpy as np

from focus_tpu.datasets import loader as data_loader
from focus_tpu.engine.trainer import _split_batch, build_supervised_state
from focus_tpu.models.build import build_model
from focus_tpu.parallel import mesh as mesh_lib
from focus_tpu.utils import checkpoint as cu
from focus_tpu.utils import logging
from focus_tpu.visualization.tensorboard_vis import TensorboardWriter

logger = logging.get_logger(__name__)


def perform_wrong_prediction_vis(cfg, model, state, loader, writer):
    """Sweep the test loader, collect misclassified clips, and write
    them to TensorBoard (reference tools/visualization.py:185-248)."""
    from focus_tpu.visualization.prediction_vis import WrongPredictionVis

    vis = WrongPredictionVis(cfg, writer)
    variables = {"params": state.params}
    if state.batch_stats is not None:
        variables["batch_stats"] = state.batch_stats

    import jax.numpy as jnp

    @jax.jit
    def fwd(variables, video, metadata):
        return model.apply(variables, video, metadata)

    for batch_idx, batch in enumerate(loader):
        video, labels, metadata = _split_batch(batch)
        video_dev = jax.tree_util.tree_map(jnp.asarray, video)
        meta_dev = {
            k: jnp.asarray(v)
            for k, v in (metadata or {}).items()
            if isinstance(v, np.ndarray)
        }
        preds = fwd(variables, video_dev, meta_dev)
        if not hasattr(preds, "shape"):
            logger.warning(
                "WrongPredictionVis supports single-logit models only "
                "(got %s); skipping", type(preds).__name__
            )
            break
        vis.visualize_vid(video, np.asarray(preds), labels, batch_idx)
    vis.clean()


def visualize(cfg):
    """(reference tools/visualization.py:250-345)"""
    if not cfg.TENSORBOARD.ENABLE:
        return
    logging.setup_logging(cfg.OUTPUT_DIR)
    if cfg.TENSORBOARD.PREDICTIONS_PATH:
        # class-level eval panels from results saved by
        # TEST.SAVE_RESULTS_PATH, without re-running eval (reference
        # tools/visualization.py:293-303)
        import pickle

        if jax.process_index() == 0:
            logger.info(
                "Visualizing class-level performance from saved results..."
            )
            with open(cfg.TENSORBOARD.PREDICTIONS_PATH, "rb") as f:
                preds, labels = pickle.load(f, encoding="latin1")
            w = TensorboardWriter(cfg)
            w.plot_eval(np.asarray(preds), np.asarray(labels))
            w.close()
    wrong_pred = cfg.TENSORBOARD.WRONG_PRED_VIS.ENABLE
    if not (cfg.TENSORBOARD.MODEL_VIS.ENABLE or wrong_pred):
        return
    # vis paths call model.apply directly and de-normalise frames on
    # host — keep the float host-normalised pipeline here (the uint8
    # device-preprocess contract only holds inside the engine steps)
    if cfg.TPU.DEVICE_PREPROCESS:
        logger.info(
            "visualize(): overriding TPU.DEVICE_PREPROCESS=False for the "
            "visualization pass (vis de-normalises frames on host)"
        )
    cfg = cfg.clone()
    cfg.TPU.DEVICE_PREPROCESS = False
    mesh = mesh_lib.build_mesh(cfg)
    model = build_model(cfg)
    loader = data_loader.construct_loader(cfg, "test")
    sample = next(iter(loader))
    state = build_supervised_state(cfg, model, mesh, sample, 1)
    state = cu.load_test_checkpoint(cfg, state)
    writer = TensorboardWriter(cfg)

    if wrong_pred:
        # reference tools/visualization.py:346-350 runs the wrong-
        # prediction sweep over the full test loader after model vis
        logger.info(
            "Visualize Wrong Predictions for %d iterations", len(loader)
        )
        perform_wrong_prediction_vis(cfg, model, state, loader, writer)
    if not cfg.TENSORBOARD.MODEL_VIS.ENABLE:
        writer.close()
        logger.info("Visualization done.")
        return

    layer_list = [
        str(l).replace(".", "/")
        for l in (cfg.TENSORBOARD.MODEL_VIS.LAYER_LIST or ())
    ]

    def _selected(name):
        # empty LAYER_LIST -> everything (reference tools/visualization.py
        # :45 restricts to the listed layers when given)
        return not layer_list or any(l in name for l in layer_list)

    if cfg.TENSORBOARD.MODEL_VIS.MODEL_WEIGHTS:
        import torch

        flat = jax.tree_util.tree_flatten_with_path(state.params)[0]
        count = 0
        for path, leaf in flat:
            name = "/".join(str(getattr(p, "key", p)) for p in path)
            if not _selected(name) or count >= 200:
                continue
            count += 1
            if writer.writer is not None:
                writer.writer.add_histogram(
                    f"weights/{name}", torch.from_numpy(np.asarray(leaf))
                )

    if cfg.TENSORBOARD.MODEL_VIS.ACTIVATIONS:
        # per-layer activation histograms on one batch: flax
        # capture_intermediates replaces the reference's forward hooks
        # (tools/visualization.py:181)
        import torch

        video, _, metadata = _split_batch(sample)
        variables = {"params": state.params}
        if state.batch_stats is not None:
            variables["batch_stats"] = state.batch_stats
        _, mods = model.apply(
            variables, jax.tree_util.tree_map(np.asarray, video), metadata,
            capture_intermediates=True, mutable=["intermediates"],
        )
        flat = jax.tree_util.tree_flatten_with_path(
            mods["intermediates"]
        )[0]
        count = 0
        for path, leaf in flat:
            name = "/".join(str(getattr(p, "key", p)) for p in path)
            if not _selected(name) or count >= 200:
                continue
            count += 1
            if writer.writer is not None:
                writer.writer.add_histogram(
                    f"activations/{name}",
                    torch.from_numpy(np.asarray(leaf).ravel()),
                )

    if cfg.TENSORBOARD.MODEL_VIS.INPUT_VIDEO:
        video, _, _ = _split_batch(sample)
        vid = np.asarray(video if not isinstance(video, tuple) else video[-1])
        writer.add_video(
            np.clip(vid.transpose(0, 1, 4, 2, 3), 0, 1), tag="input_video"
        )

    if cfg.TENSORBOARD.MODEL_VIS.GRAD_CAM.ENABLE:
        from focus_tpu.visualization.gradcam import (
            gradcam_motionformer,
            model_gradcam,
            overlay_heatmap,
        )

        video, labels, metadata = _split_batch(sample)
        variables = {"params": state.params}
        if state.batch_stats is not None:
            variables["batch_stats"] = state.batch_stats
        gc = cfg.TENSORBOARD.MODEL_VIS.GRAD_CAM
        gc_layers = [str(l) for l in (gc.LAYER_LIST or ())]
        if cfg.MODEL.MODEL_NAME == "Motionformer":
            # token-grid models: split-at-block Grad-CAM; LAYER_LIST
            # names the target block (reference tools/visualization.py
            # :66-69) — parse its index, default to the last block
            layer = cfg.MF.DEPTH - 1
            if gc_layers:
                import re

                m = re.search(r"(\d+)\s*$", gc_layers[0])
                if m:
                    layer = min(int(m.group(1)), cfg.MF.DEPTH - 1)
            cams = gradcam_motionformer(
                model, variables, video, metadata, layer,
                labels=labels, use_labels=gc.USE_TRUE_LABEL,
            )  # [B, T', h, w] token grid
            vid = np.asarray(video)
            cam = jax.image.resize(
                cams, (cams.shape[0],) + vid.shape[1:4], method="trilinear"
            )
            cam_list, vid_list = [cam], [vid]
        else:
            # CNN families: activation taps at named layers (reference
            # gradcam_utils.py:12-110); default to the last conv stage,
            # which expands to one cam per pathway
            names = [l.replace(".", "/") for l in gc_layers] or ["s5"]
            import jax.numpy as jnp

            video_dev = jax.tree_util.tree_map(jnp.asarray, video)
            cam_list, _ = model_gradcam(
                model, variables, video_dev, metadata, names,
                labels=labels, use_labels=gc.USE_TRUE_LABEL,
            )
            vid_list = [
                np.asarray(v)
                for v in (video if isinstance(video, (list, tuple))
                          else [video])
            ]
        # colormap overlay on the de-normalised frames (reference
        # gradcam_utils.py:155-170)
        for p, cam in enumerate(cam_list):
            vid = vid_list[min(p, len(vid_list) - 1)]
            overlaid = overlay_heatmap(
                np.asarray(cam), vid, cfg.DATA.MEAN, cfg.DATA.STD,
                colormap=gc.COLORMAP,
            )
            writer.add_video(
                overlaid.transpose(0, 1, 4, 2, 3),
                tag=f"gradcam/pathway{p}",
            )

    writer.close()
    logger.info("Visualization done.")
