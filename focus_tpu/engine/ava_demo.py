"""AVA demo with precomputed person boxes (counterpart of reference
``slowfast/visualization/ava_demo_precomputed_boxes.py:24-467``).

Reads AVA-format box CSVs (predicted and optionally ground-truth), runs
the detection model on the clip around every keyframe that has boxes,
and writes a video with per-box action labels drawn by VideoVisualizer.
Predictions come from one jitted detection step (static MAX_BOXES box
padding); frame IO stays host-side cv2.
"""

from __future__ import annotations

import os
from collections import defaultdict

import numpy as np

from focus_tpu.utils import logging

logger = logging.get_logger(__name__)

MAX_BOXES = 16  # static per-keyframe box budget (matches ava_dataset)


def load_boxes_labels(cfg, video_name, fps, img_width, img_height):
    """Parse DEMO.PREDS_BOXES / DEMO.GT_BOXES CSVs for one video
    (reference ava_demo_precomputed_boxes.py:390-443).

    CSV rows: video_id, frame_sec, x1, y1, x2, y2 (normalised), label[,
    score]. Returns ({keyframe_idx: [boxes, labels]}, same-or-None for
    GT); boxes are pixel xyxy lists, labels lists of int lists."""
    starting_second = cfg.DEMO.STARTING_SECOND

    def sec_to_frameidx(sec):
        return (sec - starting_second) * fps

    def parse_file(path):
        by_key = defaultdict(lambda: [[], []])
        boxes_seen = defaultdict(dict)
        with open(path) as f:
            for line in f.read().splitlines():
                if not line:
                    continue
                row = line.split(",")
                if row[0] != video_name:
                    continue
                key = sec_to_frameidx(int(row[1]))
                box = [
                    float(row[2]) * img_width,
                    float(row[3]) * img_height,
                    float(row[4]) * img_width,
                    float(row[5]) * img_height,
                ]
                label = -1 if row[6] == "" else int(row[6])
                bkey = ",".join(row[2:6])
                if bkey not in boxes_seen[key]:
                    boxes_seen[key][bkey] = len(by_key[key][0])
                    by_key[key][0].append(box)
                    by_key[key][1].append([])
                by_key[key][1][boxes_seen[key][bkey]].append(label)
        return dict(by_key)

    preds = parse_file(cfg.DEMO.PREDS_BOXES)
    gt = parse_file(cfg.DEMO.GT_BOXES) if cfg.DEMO.GT_BOXES else None
    return preds, gt


class AVAVisualizerWithPrecomputedBox:
    def __init__(self, cfg):
        import cv2

        self.cfg = cfg
        self.source = cfg.DEMO.INPUT_VIDEO
        self.video_name = os.path.basename(self.source).split(".")[0]
        self.cap = cv2.VideoCapture(self.source)
        if not self.cap.isOpened():
            raise IOError(f"Video {self.source} cannot be opened")
        self.fps = int(self.cap.get(cv2.CAP_PROP_FPS) or cfg.DEMO.FPS)
        self.total_frames = int(self.cap.get(cv2.CAP_PROP_FRAME_COUNT))
        self.width = int(self.cap.get(cv2.CAP_PROP_FRAME_WIDTH))
        self.height = int(self.cap.get(cv2.CAP_PROP_FRAME_HEIGHT))
        self.seq_length = cfg.DATA.NUM_FRAMES * cfg.DATA.SAMPLING_RATE
        self.no_frames_repeat = cfg.DEMO.SLOWMO
        self.pred_boxes, self.gt_boxes = load_boxes_labels(
            cfg, self.video_name, self.fps, self.width, self.height
        )
        logger.info(
            f"AVA demo: {len(self.pred_boxes)} keyframes with boxes in "
            f"{self.video_name}"
        )

    def _read_clip(self, keyframe_idx):
        """Clip frames around a keyframe, short side scaled to the test
        crop (reference :92-121)."""
        import cv2

        from focus_tpu.datasets import utils as data_utils

        seq = data_utils.get_sequence(
            keyframe_idx, self.seq_length // 2, self.cfg.DATA.SAMPLING_RATE,
            self.total_frames,
        )
        crop = self.cfg.DATA.TEST_CROP_SIZE
        frames = []
        for fidx in seq:
            self.cap.set(cv2.CAP_PROP_POS_FRAMES, fidx)
            ok, frame = self.cap.read()
            if ok:
                rgb = frame[:, :, ::-1]
                h, w = rgb.shape[:2]
                if w < h:
                    nw, nh = crop, int(round(h * crop / w))
                else:
                    nw, nh = int(round(w * crop / h)), crop
                frames.append(cv2.resize(rgb, (nw, nh)))
            elif frames:
                frames.append(frames[-1])
            else:
                raise IOError(f"cannot read frame {fidx}")
        return np.stack(frames)

    def get_predictions(self):
        """Run the detection model per keyframe and attach class scores
        to the boxes (reference :123-191)."""
        import jax
        import jax.numpy as jnp

        from focus_tpu.datasets import utils as data_utils
        from focus_tpu.engine.trainer import build_supervised_state
        from focus_tpu.models.build import build_model
        from focus_tpu.parallel import mesh as mesh_lib
        from focus_tpu.utils import checkpoint as cu

        cfg = self.cfg
        mesh = mesh_lib.build_mesh(cfg)
        model = build_model(cfg)
        state = None
        predict = None
        for keyframe_idx in sorted(self.pred_boxes):
            boxes, _ = self.pred_boxes[keyframe_idx]
            clip = self._read_clip(keyframe_idx)
            h, w = clip.shape[1:3]
            # _read_clip's get_sequence already strides by SAMPLING_RATE,
            # so the clip is NUM_FRAMES long here — no second subsample
            clip = data_utils.tensor_normalize(
                clip, cfg.DATA.MEAN, cfg.DATA.STD
            )
            pathways = data_utils.pack_pathway_output(cfg, clip)
            video = (
                pathways[0][None]
                if len(pathways) == 1
                else tuple(p[None] for p in pathways)
            )
            # boxes scaled from display to model input pixels, padded
            scale = np.array(
                [w / self.width, h / self.height] * 2, np.float32
            )
            padded = np.zeros((1, MAX_BOXES, 4), np.float32)
            n = min(len(boxes), MAX_BOXES)
            padded[0, :n] = np.asarray(boxes, np.float32)[:n] * scale
            mask = np.zeros((1, MAX_BOXES), np.float32)
            mask[0, :n] = 1.0

            # multi-pathway models (SlowFast) carry a tuple of
            # differently-shaped pathway arrays — convert each leaf
            def as_np(v):
                if isinstance(v, tuple):
                    return tuple(np.asarray(p) for p in v)
                return np.asarray(v)

            def as_jnp(v):
                if isinstance(v, tuple):
                    return tuple(jnp.asarray(p) for p in v)
                return jnp.asarray(v)

            if state is None:
                meta = {"boxes": padded, "boxes_mask": mask}
                batch = (as_np(video), np.zeros(1, np.int32),
                         np.zeros(1, np.int32), meta)
                state = build_supervised_state(cfg, model, mesh, batch, 1)
                state = cu.load_test_checkpoint(cfg, state)

                @jax.jit
                def predict(st, x, bx):
                    variables = {"params": st.params}
                    if st.batch_stats is not None:
                        variables["batch_stats"] = st.batch_stats
                    return model.apply(variables, x, {}, bx, train=False)

            preds = predict(state, as_jnp(video), jnp.asarray(padded))
            preds = np.asarray(jax.device_get(preds))[0, :n]
            self.pred_boxes[keyframe_idx][1] = preds
        logger.info("Finished making predictions.")

    def draw_video(self):
        """Write the overlay video (reference :193-292)."""
        import cv2

        from focus_tpu.visualization.video_visualizer import VideoVisualizer

        cfg = self.cfg
        common = (
            list(cfg.DEMO.COMMON_CLASS_NAMES)
            if cfg.DEMO.LABEL_FILE_PATH
            else None
        )
        vis = VideoVisualizer(
            num_classes=cfg.MODEL.NUM_CLASSES,
            class_names_path=cfg.DEMO.LABEL_FILE_PATH,
            top_k=cfg.TENSORBOARD.MODEL_VIS.TOPK_PREDS,
            thres=cfg.DEMO.COMMON_CLASS_THRES,
            lower_thres=cfg.DEMO.UNCOMMON_CLASS_THRES,
            common_class_names=common,
            colormap=cfg.TENSORBOARD.MODEL_VIS.COLORMAP,
            mode=cfg.DEMO.VIS_MODE,
        )
        out_path = cfg.DEMO.OUTPUT_FILE or os.path.join(
            cfg.OUTPUT_DIR, f"{self.video_name}_ava_demo.mp4"
        )
        writer = cv2.VideoWriter(
            out_path, cv2.VideoWriter_fourcc(*"mp4v"), float(self.fps),
            (self.width, self.height),
        )
        half = self.seq_length // 2
        draw_span = max(self.seq_length // 10, 1)
        keyframes = sorted(self.pred_boxes)
        next_draw = {
            k: (k - draw_span, k + draw_span) for k in keyframes
        }
        self.cap.set(cv2.CAP_PROP_POS_FRAMES, 0)
        active = None
        for fidx in range(self.total_frames):
            ok, frame = self.cap.read()
            if not ok:
                break
            # is this frame inside a keyframe's draw window?
            for k in keyframes:
                lo, hi = next_draw[k]
                if lo <= fidx <= hi:
                    active = k
                    break
                if fidx < lo:
                    break
            else:
                active = None
            if active is not None and not (
                next_draw[active][0] <= fidx <= next_draw[active][1]
            ):
                active = None
            if active is not None:
                boxes, preds = self.pred_boxes[active]
                if len(boxes):
                    rgb = frame[:, :, ::-1]
                    drawn = vis.draw_one_frame(
                        rgb, np.asarray(preds), np.asarray(boxes)
                    )
                    for _ in range(self.no_frames_repeat):
                        writer.write(np.ascontiguousarray(drawn[:, :, ::-1]))
                    continue
            writer.write(frame)
        writer.release()
        logger.info(f"AVA demo written to {out_path}")

    def __call__(self):
        self.get_predictions()
        self.draw_video()


def run_ava_demo(cfg):
    AVAVisualizerWithPrecomputedBox(cfg)()
