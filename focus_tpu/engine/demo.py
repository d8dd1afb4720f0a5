"""Video/webcam demo pipeline (counterpart of reference
``tools/demo_net.py`` + ``slowfast/visualization/``).

Host pipeline: threaded cv2 reader -> clip assembly -> jitted predictor
-> label overlay -> ordered writer thread (cv2 window or file). The
reference's multiprocess AsyncDemo (one model per GPU process,
async_predictor.py:17-123) collapses to a single async dispatch queue:
the jitted step is non-blocking, so read/predict/draw already overlap
through JAX's async dispatch; ThreadVideoManager (demo_loader.py:147-331)
adds read-side and write-side threads so capture and display never wait
on the predictor.

The reference's Detectron2Predictor (predictor.py:23-97, GPU torch) is
replaced for the live detection demo by a cv2 HOG+SVM person detector —
a CPU-only substitute with a documented accuracy gap; precomputed-box
demos (DEMO.PREDS_BOXES) remain the high-quality detection path.
"""

from __future__ import annotations

import json
import os
import queue
import threading
import time

import numpy as np

from focus_tpu.utils import logging

logger = logging.get_logger(__name__)


class ClipTask:
    """One predictor work item (reference utils.py TaskInfo)."""

    __slots__ = ("id", "frames", "num_buffer_frames", "was_read")

    def __init__(self, task_id, frames, num_buffer_frames, was_read):
        self.id = task_id
        self.frames = frames
        self.num_buffer_frames = num_buffer_frames
        self.was_read = was_read


class ThreadVideoManager:
    """Threaded read/predict/write overlap (reference
    demo_loader.py:147-331): a reader thread assembles seq-length clip
    tasks (with BUFFER_SIZE-frame overlap) while the main thread runs
    the predictor; a writer thread emits visualized tasks in input
    order — to a live cv2 window at OUTPUT_FPS when DEMO.OUTPUT_FILE is
    empty, else to the file writer. NUM_CLIPS_SKIP routes skipped clips
    straight to the writer (drawn with the stale prediction upstream;
    undrawn here, as the reference does for skipped tasks)."""

    def __init__(self, cfg):
        import cv2

        self.cv2 = cv2
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
        self.width = int(self.cap.get(cv2.CAP_PROP_FRAME_WIDTH))
        self.height = int(self.cap.get(cv2.CAP_PROP_FRAME_HEIGHT))
        self.output_fps = (
            cfg.DEMO.OUTPUT_FPS
            if cfg.DEMO.OUTPUT_FPS > 0
            else (self.cap.get(cv2.CAP_PROP_FPS) or cfg.DEMO.FPS)
        )
        self.writer = None
        self.live = not cfg.DEMO.OUTPUT_FILE
        if cfg.DEMO.OUTPUT_FILE:
            self.writer = cv2.VideoWriter(
                cfg.DEMO.OUTPUT_FILE, cv2.VideoWriter_fourcc(*"mp4v"),
                float(self.output_fps), (self.width, self.height),
            )
        self.seq_length = cfg.DATA.NUM_FRAMES * cfg.DATA.SAMPLING_RATE
        self.buffer_size = cfg.DEMO.BUFFER_SIZE
        self.num_skip = cfg.DEMO.NUM_CLIPS_SKIP

        self.read_queue: queue.Queue = queue.Queue(maxsize=4)
        self.write_queue: dict = {}
        self.write_lock = threading.Lock()
        self.stopped = False
        self.put_id = -1
        self.not_end = True
        self._threads = []

    def start(self):
        for fn in (self._read_loop, self._write_loop):
            t = threading.Thread(target=fn, daemon=True)
            t.start()
            self._threads.append(t)
        return self

    def _read_loop(self):
        was_read = True
        buffer: list = []
        while was_read and not self.stopped:
            frames = list(buffer)
            while was_read and len(frames) < self.seq_length:
                was_read, frame = self.cap.read()
                if was_read:
                    frames.append(frame)
            num_buffer = 0 if self.put_id == -1 else len(buffer)
            if was_read and self.buffer_size > 0:
                buffer = frames[-self.buffer_size:]
            self.put_id += 1
            task = ClipTask(self.put_id, frames, num_buffer, was_read)
            skip = self.num_skip > 0 and task.id % (self.num_skip + 1) != 0
            if was_read and skip:
                # skipped clips bypass the predictor, straight to output
                with self.write_lock:
                    self.write_queue[task.id] = task
            else:
                self.read_queue.put(task)
            # publish EOF only after the final task is enqueued — the
            # other order lets the consumer observe (not_end=False,
            # empty queue) and break before the last clip arrives
            self.not_end = was_read

    def __iter__(self):
        return self

    def __next__(self):
        """(was_read, task|None); task None when the queue is empty."""
        try:
            task = self.read_queue.get(timeout=0.02)
        except queue.Empty:
            return self.not_end, None
        if not task.was_read and not task.frames:
            # empty EOF task: route to the writer so it can advance
            with self.write_lock:
                self.write_queue[task.id] = task
            return False, None
        return task.was_read or bool(task.frames), task

    def display(self, task):
        with self.write_lock:
            self.write_queue[task.id] = task

    def _write_loop(self):
        get_id = -1
        while not self.stopped:
            with self.write_lock:
                task = self.write_queue.pop(get_id + 1, None)
            if task is None:
                # done only when EOF reached AND every task was displayed
                if not self.not_end and get_id >= self.put_id:
                    break
                time.sleep(0.02)
                continue
            get_id += 1
            for frame in task.frames[task.num_buffer_frames:]:
                if self.writer is not None:
                    self.writer.write(frame)
                elif self.live:
                    try:
                        self.cv2.imshow("focus_tpu demo", frame)
                        self.cv2.waitKey(
                            max(int(1000 / self.output_fps), 1)
                        )
                    except self.cv2.error:
                        # headless environment: drop display frames
                        self.live = False

    def join(self):
        # reader finishes on EOF; drain the writer
        while any(t.is_alive() for t in self._threads[:1]):
            time.sleep(0.02)
        self._threads[1].join(timeout=30.0)
        self.stopped = True
        self.cap.release()
        if self.writer is not None:
            self.writer.release()


class HOGPersonDetector:
    """cv2 HOG+SVM person detector — CPU substitute for the reference's
    Detectron2Predictor (GPU torch, predictor.py:23-97). Lower recall
    than a Faster-RCNN; for quality detection demos use precomputed
    boxes (DEMO.PREDS_BOXES -> engine/ava_demo.py)."""

    def __init__(self, score_thresh=0.0):
        import cv2

        self.hog = cv2.HOGDescriptor()
        self.hog.setSVMDetector(cv2.HOGDescriptor_getDefaultPeopleDetector())
        self.score_thresh = score_thresh

    def __call__(self, frame_bgr):
        """frame -> [N, 4] xyxy pixel boxes."""
        rects, scores = self.hog.detectMultiScale(
            frame_bgr, winStride=(8, 8), padding=(8, 8), scale=1.05
        )
        boxes = []
        for (x, y, w, h), s in zip(rects, np.ravel(scores) if len(rects) else []):
            if s >= self.score_thresh:
                boxes.append([x, y, x + w, y + h])
        return np.asarray(boxes, np.float32).reshape(-1, 4)


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
    del class_names  # names resolved inside VideoVisualizer

    from focus_tpu.visualization.video_visualizer import VideoVisualizer

    detection = cfg.DETECTION.ENABLE
    video_vis = VideoVisualizer(
        num_classes=cfg.MODEL.NUM_CLASSES,
        class_names_path=cfg.DEMO.LABEL_FILE_PATH,
        top_k=max(cfg.TENSORBOARD.MODEL_VIS.TOPK_PREDS, 3),
        thres=cfg.DEMO.COMMON_CLASS_THRES,
        lower_thres=cfg.DEMO.UNCOMMON_CLASS_THRES,
        colormap=cfg.TENSORBOARD.MODEL_VIS.COLORMAP,
        mode="thres" if detection else "top-k",
    )
    detector = HOGPersonDetector() if detection else None

    mesh = mesh_lib.build_mesh(cfg)
    model = build_model(cfg)
    crop = cfg.DATA.TEST_CROP_SIZE
    rate = cfg.DATA.SAMPLING_RATE
    max_boxes = 16

    manager = ThreadVideoManager(cfg).start()
    state = None
    predict = None
    latest = None

    def build_predict(inputs, boxes=None):
        nonlocal state, predict
        meta = {}
        if boxes is not None:
            meta = {"boxes": boxes, "boxes_mask": np.ones(boxes.shape[:2],
                                                          np.float32)}
        batch = (
            jax.tree_util.tree_map(np.asarray, inputs),
            np.zeros(1, np.int32), np.zeros(1, np.int32), meta,
        )
        state = build_supervised_state(cfg, model, mesh, batch, 1)
        state = cu.load_test_checkpoint(cfg, state)

        if boxes is None:
            @jax.jit
            def predict(st, x):
                variables = {"params": st.params}
                if st.batch_stats is not None:
                    variables["batch_stats"] = st.batch_stats
                return model.apply(variables, x, {})
        else:
            @jax.jit
            def predict(st, x, bx):
                variables = {"params": st.params}
                if st.batch_stats is not None:
                    variables["batch_stats"] = st.batch_stats
                return model.apply(variables, x, {}, bx, train=False)

    try:
        _demo_loop(
            cfg, manager, detector, video_vis, build_predict,
            lambda: (state, predict), crop, rate, max_boxes, detection,
        )
    except BaseException:
        # unblock the reader (it only re-checks `stopped` between clips)
        # so the join below can't wait out a long source video
        manager.stopped = True
        raise
    finally:
        # always drain + release the writer: an exception mid-predict
        # must not leave the output container without its final header
        manager.join()
    logger.info("Demo finished.")


def _demo_loop(cfg, manager, detector, video_vis, build_predict,
               get_predictor, crop, rate, max_boxes, detection):
    import cv2
    import jax
    import jax.numpy as jnp

    from focus_tpu.datasets import utils as data_utils

    latest = None
    # source pixel order (reference predictor.py:71): cv2 capture yields
    # BGR (the default); RGB sources skip the channel reversal
    bgr_in = getattr(cfg.DEMO, "INPUT_FORMAT", "BGR") == "BGR"

    def to_rgb(f):
        return f[:, :, ::-1] if bgr_in else f

    while True:
        alive, task = next(manager)
        if task is None:
            if not alive:
                break
            time.sleep(0.01)
            continue
        frames_resized = [
            cv2.resize(to_rgb(f), (crop, crop)) for f in task.frames
        ]
        clip = np.stack(frames_resized[::rate])[: cfg.DATA.NUM_FRAMES]
        if clip.shape[0] < cfg.DATA.NUM_FRAMES:
            clip = np.concatenate(
                [clip] + [clip[-1:]] * (cfg.DATA.NUM_FRAMES - clip.shape[0])
            )
        clip = data_utils.tensor_normalize(clip, cfg.DATA.MEAN, cfg.DATA.STD)
        pathways = data_utils.pack_pathway_output(cfg, clip)
        inputs = (
            pathways[0][None]
            if len(pathways) == 1
            else tuple(p[None] for p in pathways)
        )

        boxes_disp = None
        state, predict = get_predictor()
        if detection:
            mid = task.frames[len(task.frames) // 2]
            det = detector(mid)[:max_boxes]
            if len(det) == 0:
                latest = None
            else:
                h, w = mid.shape[:2]
                scaled = det * np.array(
                    [crop / w, crop / h, crop / w, crop / h], np.float32
                )
                padded = np.zeros((1, max_boxes, 4), np.float32)
                padded[0, : len(det)] = scaled
                if state is None:
                    build_predict(inputs, boxes=padded)
                    state, predict = get_predictor()
                preds = predict(
                    state,
                    jax.tree_util.tree_map(jnp.asarray, inputs),
                    jnp.asarray(padded),
                )
                latest = np.asarray(jax.device_get(preds))[0, : len(det)]
                boxes_disp = det
        else:
            if state is None:
                build_predict(inputs)
                state, predict = get_predictor()
            probs = predict(
                state, jax.tree_util.tree_map(jnp.asarray, inputs)
            )
            latest = np.asarray(jax.device_get(probs))[0]

        if latest is not None:
            drawn = []
            for f in task.frames:
                rgb = to_rgb(f)
                out = video_vis.draw_one_frame(rgb, latest, boxes_disp)
                # writer/display consume the source order
                drawn.append(
                    np.ascontiguousarray(out[:, :, ::-1] if bgr_in else out)
                )
            task.frames = drawn
        manager.display(task)
