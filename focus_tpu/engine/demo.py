"""Video/webcam demo pipeline (counterpart of reference
``tools/demo_net.py`` + ``slowfast/visualization/``).

Host pipeline: cv2 reader -> clip assembly -> jitted predictor ->
label overlay -> cv2 writer/window. The reference's multiprocess
AsyncDemo (one model per GPU process) collapses to a single async
dispatch queue: the jitted step is non-blocking, so read/predict/draw
already overlap through JAX's async dispatch.
"""

from __future__ import annotations

import json
import os
from collections import deque

import numpy as np

from focus_tpu.utils import logging

logger = logging.get_logger(__name__)


class VideoReader:
    """cv2 capture wrapper (reference demo_loader.py:17-145)."""

    def __init__(self, cfg):
        import cv2

        self.cfg = cfg
        source = (
            cfg.DEMO.WEBCAM if cfg.DEMO.WEBCAM > -1 else cfg.DEMO.INPUT_VIDEO
        )
        self.cap = cv2.VideoCapture(source)
        if cfg.DEMO.DISPLAY_WIDTH > 0:
            self.cap.set(cv2.CAP_PROP_FRAME_WIDTH, cfg.DEMO.DISPLAY_WIDTH)
        if cfg.DEMO.DISPLAY_HEIGHT > 0:
            self.cap.set(cv2.CAP_PROP_FRAME_HEIGHT, cfg.DEMO.DISPLAY_HEIGHT)
        if not self.cap.isOpened():
            raise IOError(f"Cannot open video source {source}")

    def __iter__(self):
        while True:
            ok, frame = self.cap.read()
            if not ok:
                break
            yield frame

    def release(self):
        self.cap.release()


def demo(cfg):
    """(reference demo_net.py:96-119)"""
    if cfg.DETECTION.ENABLE and cfg.DEMO.PREDS_BOXES != "":
        # AVA-style detection demo over precomputed person boxes
        # (reference demo_net.py:104-107)
        from focus_tpu.engine.ava_demo import run_ava_demo

        return run_ava_demo(cfg)
    import cv2
    import jax
    import jax.numpy as jnp

    from focus_tpu.datasets import utils as data_utils
    from focus_tpu.engine.trainer import build_supervised_state
    from focus_tpu.models.build import build_model
    from focus_tpu.parallel import mesh as mesh_lib
    from focus_tpu.utils import checkpoint as cu

    logging.setup_logging(cfg.OUTPUT_DIR)
    class_names = {}
    if cfg.DEMO.LABEL_FILE_PATH and os.path.exists(cfg.DEMO.LABEL_FILE_PATH):
        with open(cfg.DEMO.LABEL_FILE_PATH) as f:
            class_names = {str(v): k for k, v in json.load(f).items()}

    # visualization-grade overlay (colormap class colors, score labels)
    from focus_tpu.visualization.video_visualizer import VideoVisualizer

    video_vis = VideoVisualizer(
        num_classes=cfg.MODEL.NUM_CLASSES,
        class_names_path=cfg.DEMO.LABEL_FILE_PATH,
        top_k=max(cfg.TENSORBOARD.MODEL_VIS.TOPK_PREDS, 3),
        thres=cfg.DEMO.COMMON_CLASS_THRES,
        lower_thres=cfg.DEMO.UNCOMMON_CLASS_THRES,
        colormap=cfg.TENSORBOARD.MODEL_VIS.COLORMAP,
        mode="top-k",
    )

    mesh = mesh_lib.build_mesh(cfg)
    model = build_model(cfg)
    seq_len = cfg.DATA.NUM_FRAMES * cfg.DATA.SAMPLING_RATE
    crop = cfg.DATA.TEST_CROP_SIZE

    reader = VideoReader(cfg)
    writer = None
    if cfg.DEMO.OUTPUT_FILE:
        fps = cfg.DEMO.OUTPUT_FPS if cfg.DEMO.OUTPUT_FPS > 0 else cfg.DEMO.FPS
        writer = cv2.VideoWriter(
            cfg.DEMO.OUTPUT_FILE, cv2.VideoWriter_fourcc(*"mp4v"), fps,
            (int(reader.cap.get(cv2.CAP_PROP_FRAME_WIDTH)),
             int(reader.cap.get(cv2.CAP_PROP_FRAME_HEIGHT))),
        )

    state = None
    predict = None
    buffer: deque = deque(maxlen=seq_len)
    latest = None
    for i, frame in enumerate(reader):
        rgb = frame[:, :, ::-1]
        buffer.append(cv2.resize(rgb, (crop, crop)))
        if len(buffer) == seq_len and i % (cfg.DEMO.BUFFER_SIZE + seq_len) == 0:
            clip = np.stack(list(buffer))[:: cfg.DATA.SAMPLING_RATE]
            clip = data_utils.tensor_normalize(
                clip, cfg.DATA.MEAN, cfg.DATA.STD
            )[None]
            pathways = data_utils.pack_pathway_output(cfg, clip[0])
            inputs = (
                pathways[0][None]
                if len(pathways) == 1
                else tuple(p[None] for p in pathways)
            )
            if state is None:
                batch = (np.asarray(inputs), np.zeros(1, np.int32),
                         np.zeros(1, np.int32), {})
                state = build_supervised_state(cfg, model, mesh, batch, 1)
                state = cu.load_test_checkpoint(cfg, state)

                @jax.jit
                def predict(params_state, x):
                    variables = {"params": params_state.params}
                    if params_state.batch_stats is not None:
                        variables["batch_stats"] = params_state.batch_stats
                    return model.apply(variables, x, {})

            probs = np.asarray(jax.device_get(predict(state, jnp.asarray(inputs))))
            latest = probs[0]
        if latest is not None and len(np.shape(latest)):
            out_frame = np.ascontiguousarray(
                video_vis.draw_one_frame(frame[:, :, ::-1], latest)[:, :, ::-1]
            )
        else:
            out_frame = frame
        if writer is not None:
            writer.write(out_frame)
    reader.release()
    if writer is not None:
        writer.release()
    logger.info("Demo finished.")
