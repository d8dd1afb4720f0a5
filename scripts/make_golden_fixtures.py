#!/usr/bin/env python3
"""Generate golden parity fixtures from the ACTUAL reference modules.

Runs the reference's own torch code (/root/reference/slowfast/...) on tiny
fixed inputs and saves inputs + torch state_dicts + outputs as .npz under
tests/fixtures/. The parity tests (tests/test_golden_parity.py) then check
the flax implementations against these — a true oracle, unlike a
self-authored torch replica (round-1 VERDICT weakness #3).

Import blockers (iopath/fvcore/torchvision — not installed here) are
stubbed in sys.modules; the only stub that affects numerics is
torchvision.ops.roi_align, replaced by a naive pure-torch implementation
of its aligned=True / sampling_ratio=-1 semantics — so the full ORViT
block fixture and the SlowFast detection-head fixture are oracles modulo
that one op (which is itself unit-tested against the documented
semantics in tests/test_orvit_ops.py).

Usage: python scripts/make_golden_fixtures.py
"""

import os
import sys
import types

import numpy as np
import torch

OUT_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "tests", "fixtures")


# ---------------------------------------------------------------- stubs
def _install_stubs():
    class _PM:
        def register_handler(self, *a, **k):
            pass

        def open(self, *a, **k):
            return open(*a, **k)

    for name in ("iopath", "iopath.common", "iopath.common.file_io"):
        sys.modules.setdefault(name, types.ModuleType(name))
    fio = sys.modules["iopath.common.file_io"]
    fio.PathManagerFactory = types.SimpleNamespace(get=lambda *a, **k: _PM())
    fio.g_pathmgr = _PM()

    # fvcore: registry + weight init are the only pieces the model modules
    # pull in at import time
    class Registry:
        def __init__(self, name):
            self._name, self._map = name, {}

        def register(self, obj=None):
            if obj is None:
                def deco(o):
                    self._map[o.__name__] = o
                    return o
                return deco
            self._map[obj.__name__] = obj
            return obj

        def get(self, name):
            return self._map[name]

    for name in ("fvcore", "fvcore.common", "fvcore.common.registry",
                 "fvcore.nn", "fvcore.common.config", "fvcore.nn.weight_init",
                 "fvcore.common.timer"):
        sys.modules.setdefault(name, types.ModuleType(name))
    sys.modules["fvcore.common.registry"].Registry = Registry
    sys.modules["fvcore.common.timer"].Timer = object
    # slowfast.utils.misc (pulled in by the MViT constructor) imports
    # these as modules, plus psutil/matplotlib
    for name in ("fvcore.nn.activation_count", "fvcore.nn.flop_count"):
        sys.modules.setdefault(name, types.ModuleType(name))
    sys.modules["fvcore.nn.activation_count"].activation_count = lambda *a, **k: ({}, {})
    sys.modules["fvcore.nn.flop_count"].flop_count = lambda *a, **k: ({}, {})
    try:
        import psutil  # noqa: F401
    except ImportError:
        sys.modules.setdefault("psutil", types.ModuleType("psutil"))
    try:
        import matplotlib  # noqa: F401
    except ImportError:
        mpl = types.ModuleType("matplotlib")
        mpl.pyplot = types.ModuleType("matplotlib.pyplot")
        sys.modules.setdefault("matplotlib", mpl)
        sys.modules.setdefault("matplotlib.pyplot", mpl.pyplot)
    wi = sys.modules["fvcore.nn.weight_init"]
    wi.c2_msra_fill = lambda m: None
    wi.c2_xavier_fill = lambda m: None
    fn = sys.modules["fvcore.nn"]
    fn.flop_count = None
    fn.parameter_count = None
    fn.weight_init = wi

    sys.modules.setdefault("simplejson", __import__("json"))

    ed = types.ModuleType("easydict")

    class EasyDict(dict):
        def __getattr__(self, k):
            try:
                return self[k]
            except KeyError as e:
                raise AttributeError(k) from e

        def __setattr__(self, k, v):
            self[k] = v

    ed.EasyDict = EasyDict
    sys.modules.setdefault("easydict", ed)

    # torchvision.ops.roi_align — naive pure-torch implementation of
    # aligned=True / sampling_ratio=-1 (torchvision-documented semantics)
    def roi_align(feats, rois, output_size, spatial_scale=1.0,
                  sampling_ratio=-1, aligned=True):
        if isinstance(output_size, int):
            output_size = (output_size, output_size)
        ph, pw = output_size
        if isinstance(rois, (list, tuple)):
            rois = torch.cat(
                [
                    torch.cat(
                        [torch.full((len(b), 1), float(i)), b], dim=1
                    )
                    for i, b in enumerate(rois)
                ],
                dim=0,
            )
        N, C, H, W = feats.shape
        out = feats.new_zeros((rois.shape[0], C, ph, pw))
        offset = 0.5 if aligned else 0.0
        for ri, roi in enumerate(rois):
            b = int(roi[0].item())
            x1, y1, x2, y2 = (roi[1:5] * spatial_scale - offset).tolist() \
                if aligned else (roi[1:5] * spatial_scale).tolist()
            rw = max(x2 - x1, 1e-10 if aligned else 1.0)
            rh = max(y2 - y1, 1e-10 if aligned else 1.0)
            bin_w, bin_h = rw / pw, rh / ph
            sx = sampling_ratio if sampling_ratio > 0 else max(
                1, int(np.ceil(rw / pw)))
            sy = sampling_ratio if sampling_ratio > 0 else max(
                1, int(np.ceil(rh / ph)))
            for py in range(ph):
                for px in range(pw):
                    acc = feats.new_zeros((C,))
                    for iy in range(sy):
                        yy = y1 + py * bin_h + (iy + 0.5) * bin_h / sy
                        for ix in range(sx):
                            xx = x1 + px * bin_w + (ix + 0.5) * bin_w / sx
                            if yy < -1.0 or yy > H or xx < -1.0 or xx > W:
                                continue
                            yyc = min(max(yy, 0.0), H - 1)
                            xxc = min(max(xx, 0.0), W - 1)
                            y0, x0 = int(yyc), int(xxc)
                            y1i, x1i = min(y0 + 1, H - 1), min(x0 + 1, W - 1)
                            ly, lx = yyc - y0, xxc - x0
                            acc = acc + (
                                feats[b, :, y0, x0] * (1 - ly) * (1 - lx)
                                + feats[b, :, y0, x1i] * (1 - ly) * lx
                                + feats[b, :, y1i, x0] * ly * (1 - lx)
                                + feats[b, :, y1i, x1i] * ly * lx
                            )
                    out[ri, :, py, px] = acc / (sx * sy)
        return out

    for name in ("torchvision", "torchvision.ops", "torchvision.ops.boxes",
                 "torchvision.models", "torchvision.transforms",
                 "torchvision.transforms.functional",
                 "torchvision.io"):
        sys.modules.setdefault(name, types.ModuleType(name))
    sys.modules["torchvision.transforms"].functional = sys.modules[
        "torchvision.transforms.functional"
    ]
    sys.modules["torchvision"].transforms = sys.modules[
        "torchvision.transforms"
    ]
    sys.modules["torchvision"].io = sys.modules["torchvision.io"]
    sys.modules["torchvision.ops"].roi_align = roi_align

    def box_area(boxes):
        return (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])

    sys.modules["torchvision.ops.boxes"].box_area = box_area
    sys.modules["torchvision.ops"].boxes = sys.modules["torchvision.ops.boxes"]
    sys.modules["torchvision"].ops = sys.modules["torchvision.ops"]

    # detectron2.layers.ROIAlign — module wrapper over the same roi_align
    for name in ("detectron2", "detectron2.layers"):
        sys.modules.setdefault(name, types.ModuleType(name))

    class ROIAlign(torch.nn.Module):
        def __init__(self, output_size, spatial_scale, sampling_ratio,
                     aligned=True):
            super().__init__()
            self.output_size = output_size
            self.spatial_scale = spatial_scale
            self.sampling_ratio = sampling_ratio
            self.aligned = aligned

        def forward(self, feats, rois):
            return roi_align(
                feats, rois, self.output_size, self.spatial_scale,
                self.sampling_ratio, self.aligned,
            )

    sys.modules["detectron2.layers"].ROIAlign = ROIAlign

    # slowfast.utils.misc (MViT constructor) does
    # `from slowfast.datasets.utils import pack_pathway_output`, which
    # would drag in the whole dataset package (imgaug, av, ...). The
    # model fixtures never touch datasets — pre-register a stub package.
    ds = types.ModuleType("slowfast.datasets")
    ds.__path__ = []
    dsu = types.ModuleType("slowfast.datasets.utils")
    dsu.pack_pathway_output = lambda cfg, frames: [frames]
    ds.utils = dsu
    sys.modules.setdefault("slowfast.datasets", ds)
    sys.modules.setdefault("slowfast.datasets.utils", dsu)

    sys.path.insert(0, "/root/reference")


def _sd_to_np(module):
    return {f"sd/{k}": v.detach().numpy() for k, v in module.state_dict().items()}


def save(name, **arrays):
    os.makedirs(OUT_DIR, exist_ok=True)
    path = os.path.join(OUT_DIR, f"{name}.npz")
    np.savez_compressed(path, **arrays)
    print(f"wrote {path}: {sorted(arrays)[:6]}...")


# ------------------------------------------------------------- fixtures
def gen_trajectory_attention():
    from slowfast.models.attention import TrajectoryAttention

    torch.manual_seed(0)
    B, F, P, C, h = 2, 4, 4, 32, 4
    x = torch.randn(B, 1 + F * P, C)
    for orig in (True, False):
        torch.manual_seed(1)
        mod = TrajectoryAttention(C, num_heads=h, qkv_bias=True,
                                  use_original_code=orig).eval()
        with torch.no_grad():
            y, _ = mod(x, (F, 2, 2))
        save(
            f"trajectory_attention_{'orig' if orig else 'learnedv'}",
            x=x.numpy(), out=y.numpy(), thw=np.array([F, 2, 2]),
            num_heads=np.array(h), **_sd_to_np(mod),
        )


def gen_layout():
    from slowfast.models.ORViT.utils import box2spatial_layout

    torch.manual_seed(2)
    BS, T, O, d, H, W = 2, 3, 4, 8, 7, 7
    boxes = torch.rand(BS, T, O, 4) * 0.4 + 0.1  # cxcywh, in-bounds
    boxes[0, :, 2] = 0.0  # an illegal all-zero box slot
    vecs = torch.randn(BS, T, O, d)
    with torch.no_grad():
        seg = box2spatial_layout(boxes, vecs, H, W)  # [B, d, T, H, W]
    save("box_layout", boxes=boxes.numpy(), vecs=vecs.numpy(),
         out=seg.numpy(), hw=np.array([H, W]))


def gen_slot_attention():
    from slowfast.models.STEVE.steve import SlotAttentionVideo

    torch.manual_seed(3)
    B, T, N, D_in, S, D_slot = 2, 3, 9, 12, 4, 16
    inputs = torch.randn(B, T, N, D_in)
    noise = torch.randn(B, S, D_slot)
    mod = SlotAttentionVideo(
        num_iterations=2, num_slots=S, input_size=D_in, slot_size=D_slot,
        mlp_hidden_size=24, num_predictor_blocks=1, num_predictor_heads=2,
        dropout=0.0,
    ).eval()

    # make the random slot init deterministic and recorded
    orig_normal_ = torch.Tensor.normal_

    def fixed_normal_(self, *a, **k):
        self.copy_(noise.to(self.dtype))
        return self

    torch.Tensor.normal_ = fixed_normal_
    try:
        with torch.no_grad():
            slots, attns = mod(inputs)
    finally:
        torch.Tensor.normal_ = orig_normal_
    save("slot_attention_video", inputs=inputs.numpy(), noise=noise.numpy(),
         slots=slots.numpy(), attns=attns.numpy(), **_sd_to_np(mod))


def gen_dvae():
    from slowfast.models.STEVE.dvae import dVAE

    torch.manual_seed(4)
    vocab, C = 16, 3
    mod = dVAE(vocab, C).eval()
    x = torch.rand(2, C, 16, 16)
    with torch.no_grad():
        logits = mod.encoder(x)
        z_hard = torch.zeros_like(logits)
        z_hard.scatter_(1, logits.argmax(1, keepdim=True), 1.0)
        recon = mod.decoder(z_hard)
    save("dvae", x=x.numpy(), logits=logits.numpy(), z_hard=z_hard.numpy(),
         recon=recon.numpy(), **_sd_to_np(mod))


def gen_steve_transformer():
    from slowfast.models.STEVE.transformer import TransformerDecoder

    torch.manual_seed(5)
    L, d, h, S = 6, 16, 2, 4
    mod = TransformerDecoder(
        num_blocks=2, max_len=L, d_model=d, num_heads=h, dropout=0.0
    ).eval()
    inp = torch.randn(2, L, d)
    encoder_out = torch.randn(2, S, d)
    with torch.no_grad():
        out = mod(inp, encoder_out)
    save("steve_transformer_decoder", inp=inp.numpy(),
         encoder_out=encoder_out.numpy(), out=out.numpy(), **_sd_to_np(mod))


def gen_multiscale_attention():
    from slowfast.models.attention import MultiScaleAttention

    torch.manual_seed(6)
    B, T, H, W, C, h = 2, 4, 4, 4, 16, 2
    thw = [T, H, W]
    x = torch.randn(B, 1 + T * H * W, C)
    import functools

    mod = MultiScaleAttention(
        C, num_heads=h, qkv_bias=True, kernel_q=(1, 3, 3),
        kernel_kv=(1, 3, 3), stride_q=(1, 1, 1), stride_kv=(1, 2, 2),
        mode="conv", has_cls_embed=True, pool_first=False,
        # MViT constructs every LN with eps=1e-6 (video_model_builder.py:803)
        norm_layer=functools.partial(torch.nn.LayerNorm, eps=1e-6),
    ).eval()
    with torch.no_grad():
        (y, out_thw), _attn = mod(x, thw)
    save("multiscale_attention", x=x.numpy(), out=y.numpy(),
         thw=np.array(thw), out_thw=np.array(out_thw),
         num_heads=np.array(h), **_sd_to_np(mod))


def gen_orvit_block():
    from slowfast.models.ORViT.orvit import ORViT

    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    from focus_tpu.config import get_cfg

    cfg = get_cfg()
    cfg.ORVIT.O = 3
    cfg.ORVIT.USE_MOTION_STREAM = True
    cfg.ORVIT.MOTION_STREAM_ATTN_TYPE = "joint"
    cfg.DATA.NUM_FRAMES = 4
    torch.manual_seed(7)
    B, T, HW, C, O = 2, 2, 9, 32, 3
    import functools

    mod = ORViT(cfg, dim=C, num_heads=4, attn_type="trajectory",
                qkv_bias=True, use_original_code=True, nb_frames=T,
                # Motionformer passes eps=1e-6 (video_model_builder.py:1129)
                norm_layer=functools.partial(torch.nn.LayerNorm, eps=1e-6),
                ).eval()
    x = torch.randn(B, 1 + T * HW, C)
    boxes = torch.rand(B, T, O, 4) * 0.3 + 0.2  # cxcywh
    metadata = {"orvit_bboxes": boxes}
    with torch.no_grad():
        y, _ = mod(x, metadata, (T, 3, 3))
    save("orvit_block", x=x.numpy(), boxes=boxes.numpy(), out=y.numpy(),
         thw=np.array([T, 3, 3]), **_sd_to_np(mod))


# ------------------------------------------------- full-model fixtures
def _repo_cfg():
    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    from focus_tpu.config import get_cfg

    return get_cfg()


def _randomize(mod, seed, scale=0.05):
    torch.manual_seed(seed)
    with torch.no_grad():
        for p in mod.parameters():
            if p.is_floating_point():
                p.copy_(torch.randn_like(p) * scale)
    return mod.eval()


def _mf_full_cfg(orvit_layers=(), dataset="ssv2"):
    """Tiny-but-real Motionformer: patch 56 on a 224 crop -> 16 patches
    == the base grid, so no pos-embed interpolation ambiguity."""
    cfg = _repo_cfg()
    cfg.MODEL.MODEL_NAME = "Motionformer"
    cfg.MODEL.NUM_CLASSES = 7
    cfg.TRAIN.DATASET = dataset
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
    return cfg


def gen_motionformer_full():
    """Full reference Motionformer forward (video_model_builder.py:
    1103-1353): patch embed, separate pos-embed tiling, blocks, USE_MLP
    pre-logits, eval softmax — plus the ORViT-MF and EK dual-head
    variants."""
    from slowfast.models.video_model_builder import Motionformer

    rs = np.random.RandomState(8)
    video = rs.rand(2, 3, 4, 224, 224).astype(np.float32)
    boxes = (rs.rand(2, 2, 3, 4) * 0.4 + 0.2).astype(np.float32)

    mod = _randomize(Motionformer(_mf_full_cfg()), 8)
    with torch.no_grad():
        out = mod([torch.from_numpy(video)], {})
    save("motionformer_full", video=video, out=out.numpy(), **_sd_to_np(mod))

    mod = _randomize(Motionformer(_mf_full_cfg(orvit_layers=(1,))), 9)
    with torch.no_grad():
        out = mod(
            [torch.from_numpy(video)],
            {"orvit_bboxes": torch.from_numpy(boxes)},
        )
    save("orvit_mf_full", video=video, boxes=boxes, out=out.numpy(),
         **_sd_to_np(mod))

    mod = _randomize(Motionformer(_mf_full_cfg(dataset="epickitchens")), 10)
    with torch.no_grad():
        _, both = mod([torch.from_numpy(video)], {})
    save("motionformer_ek_full", video=video, out_verb=both["verb"].numpy(),
         out_noun=both["noun"].numpy(), **_sd_to_np(mod))


def _mf_flagship_cfg():
    """The REAL ORViT-MF SSv2 flagship shape
    (configs/ORViT/SSv2_ORViT-MF_224_16x4.yaml): 768-d, 12 layers,
    12 heads, patch 16 on a 224 crop (full 14x14 grid + separate
    pos-embed tiling at scale), ORViT at [1,6,10], 174 classes."""
    cfg = _repo_cfg()
    cfg.MODEL.MODEL_NAME = "Motionformer"
    cfg.MODEL.NUM_CLASSES = 174
    cfg.TRAIN.DATASET = "ssv2"
    cfg.DATA.NUM_FRAMES = 16
    cfg.DATA.TRAIN_CROP_SIZE = 224
    cfg.MF.PATCH_SIZE = 16
    cfg.MF.PATCH_SIZE_TEMP = 2
    cfg.MF.EMBED_DIM = 768
    cfg.MF.DEPTH = 12
    cfg.MF.NUM_HEADS = 12
    cfg.MF.MLP_RATIO = 4
    cfg.MF.QKV_BIAS = True
    cfg.MF.TEMPORAL_RESOLUTION = 8
    cfg.MF.USE_MLP = True
    cfg.ORVIT.LAYERS = [1, 6, 10]
    cfg.ORVIT.ENABLE = True
    cfg.ORVIT.O = 4
    return cfg


def gen_motionformer_flagship():
    """Round-4 verdict #5: one golden from the executed reference at the
    REAL flagship shape (reference video_model_builder.py:1103-1353 at
    768-d/12-layer scale — full-size pos-embed tiling, real patch grid,
    head MLP at width). The ~110M random weights are NOT stored: the
    fixture carries (seed, scale, ordered param names+shapes) and both
    sides regenerate the identical torch.randn stream — the npz stays
    ~3 MB instead of ~440."""
    import json

    from slowfast.models.video_model_builder import Motionformer

    seed, scale = 42, 0.02
    rs = np.random.RandomState(seed)
    video_u8 = rs.randint(0, 256, (1, 3, 16, 224, 224), dtype=np.uint8)
    video = (video_u8 / 255.0).astype(np.float32)
    boxes = (rs.rand(1, 8, 4, 4) * 0.4 + 0.2).astype(np.float32)

    mod = Motionformer(_mf_flagship_cfg())
    torch.manual_seed(seed)
    entries = []
    with torch.no_grad():
        for name, p in mod.named_parameters():
            p.copy_(torch.randn_like(p) * scale)
            entries.append((name, list(p.shape)))
    mod.eval()

    # self-check: the reconstruction recipe the test uses reproduces the
    # exact weights the module executed with
    torch.manual_seed(seed)
    for name, shape in entries[:5]:
        v = torch.randn(shape) * scale
        assert torch.equal(v, dict(mod.named_parameters())[name].data), name

    # re-randomize properly (the self-check consumed RNG; re-copy all)
    torch.manual_seed(seed)
    with torch.no_grad():
        for name, p in mod.named_parameters():
            p.copy_(torch.randn_like(p) * scale)

    with torch.no_grad():
        out = mod(
            [torch.from_numpy(video)],
            {"orvit_bboxes": torch.from_numpy(boxes)},
        )
    save(
        "orvit_mf_flagship",
        video_u8=video_u8, boxes=boxes, out=out.numpy(),
        param_list=np.frombuffer(
            json.dumps(entries).encode(), np.uint8
        ).copy(),
        seed=np.int64(seed), scale=np.float64(scale),
    )


def gen_mvit_full():
    """Full reference MViT forward (video_model_builder.py:765-1100) at
    a tiny config with one pooling stage + dim/head expansion."""
    from slowfast.models.video_model_builder import MViT

    cfg = _repo_cfg()
    cfg.MODEL.MODEL_NAME = "MViT"
    cfg.MODEL.ARCH = "mvit"
    cfg.MODEL.NUM_CLASSES = 7
    cfg.DATA.NUM_FRAMES = 4
    cfg.DATA.TRAIN_CROP_SIZE = 64
    cfg.DATA.TEST_CROP_SIZE = 64
    cfg.MVIT.EMBED_DIM = 24
    cfg.MVIT.NUM_HEADS = 2
    cfg.MVIT.DEPTH = 4
    cfg.MVIT.DIM_MUL = [[1, 2.0]]
    cfg.MVIT.HEAD_MUL = [[1, 2.0]]
    cfg.MVIT.POOL_Q_STRIDE = [[1, 1, 2, 2]]
    cfg.MVIT.POOL_KVQ_KERNEL = [3, 3, 3]
    cfg.MVIT.POOL_KV_STRIDE_ADAPTIVE = [1, 4, 4]
    # the fork's PATCH_PADDING default [2,4,4] contradicts its own
    # pos-embed sizing (input_dims // stride); every zoo MViT config
    # overrides to [1,3,3]
    cfg.MVIT.PATCH_PADDING = [1, 3, 3]

    # upstream bug: attention.py:321 passes drop_rate= to common.Mlp,
    # whose __init__ takes drop= — the reference MViT cannot be
    # constructed as-is. Shim the obvious intent (drop_rate -> drop).
    import slowfast.models.attention as ref_attn

    orig_mlp = ref_attn.Mlp

    class MlpCompat(orig_mlp):
        def __init__(self, *a, drop_rate=0.0, **k):
            super().__init__(*a, drop=drop_rate, **k)

    ref_attn.Mlp = MlpCompat
    try:
        mod = _randomize(MViT(cfg), 11)
        rs = np.random.RandomState(11)
        video = rs.rand(2, 3, 4, 64, 64).astype(np.float32)
        with torch.no_grad():
            out = mod([torch.from_numpy(video)], {})
    finally:
        ref_attn.Mlp = orig_mlp
    save("mvit_full", video=video, out=out.numpy(), **_sd_to_np(mod))


def gen_steve_full():
    """Full reference STEVE forward (models/STEVE/steve.py:253-392) with
    RECORDED gumbel noise, so the stochastic dVAE sampling can be
    replayed exactly on the flax side."""
    import torch.nn.functional as F

    from slowfast.models.STEVE import steve as ref_steve

    cfg = _repo_cfg()
    cfg.SLOTS.NUM_ITERS = 2
    cfg.SLOTS.NUM_SLOTS = 3
    cfg.SLOTS.VOCAB_SIZE = 8
    cfg.SLOTS.IMG_SIZE = 32
    cfg.SLOTS.IMG_CHANNELS = 3
    cfg.SLOTS.SIZE = 32
    cfg.SLOTS.DIM = 32
    cfg.SLOTS.CNN_HID_SIZE = 16
    cfg.SLOTS.MLP_HID_SIZE = 64
    cfg.SLOTS.NUM_PREDICTOR_BLOCKS = 1
    cfg.SLOTS.NUM_PREDICTOR_HEADS = 2
    cfg.SLOTS.DECODER.NUM_BLOCKS = 2
    cfg.SLOTS.DECODER.NUM_HEADS = 2
    cfg.SLOTS.DECODER.DIM = 32

    noises = []
    real_gumbel = ref_steve.gumbel_softmax

    def recording_gumbel(logits, tau=1.0, hard=False, dim=-1):
        eps = torch.finfo(logits.dtype).tiny
        g = torch.Generator().manual_seed(1234 + len(noises))
        u = torch.empty_like(logits).exponential_(generator=g)
        noise = -(u + eps).log()
        noises.append(noise.numpy())
        y_soft = F.softmax((logits + noise) / tau, dim)
        if hard:
            index = y_soft.argmax(dim, keepdim=True)
            y_hard = torch.zeros_like(logits).scatter_(dim, index, 1.0)
            return y_hard - y_soft.detach() + y_soft
        return y_soft

    # the SAVi slot init draws torch noise inline (steve.py:56
    # new_empty().normal_()) — record it for replay too
    slot_noises = []
    orig_normal_ = torch.Tensor.normal_

    def recording_normal_(self, *a, **k):
        g = torch.Generator().manual_seed(777 + len(slot_noises))
        vals = torch.randn(self.shape, generator=g)
        self.copy_(vals)
        slot_noises.append(vals.numpy())
        return self

    ref_steve.gumbel_softmax = recording_gumbel
    try:
        mod = _randomize(ref_steve.STEVE(cfg), 12)
        rs = np.random.RandomState(12)
        video = rs.rand(2, 2, 3, 32, 32).astype(np.float32)
        torch.Tensor.normal_ = recording_normal_
        with torch.no_grad():
            recon, ce, mse, attns = mod(
                torch.from_numpy(video), tau=1.0, hard=False
            )
    finally:
        ref_steve.gumbel_softmax = real_gumbel
        torch.Tensor.normal_ = orig_normal_
    save(
        "steve_full", video=video, recon=recon.numpy(),
        cross_entropy=np.array(float(ce)), mse=np.array(float(mse)),
        attns=attns.numpy(),
        **{f"noise_{i}": n for i, n in enumerate(noises)},
        **{f"slot_noise_{i}": n for i, n in enumerate(slot_noises)},
        **_sd_to_np(mod),
    )


def _randomize_with_buffers(mod, seed, scale=0.05):
    """_randomize plus non-trivial BN running stats, so the conv-family
    fixtures exercise the batch_stats import path (all-zero mean /
    all-one var would make a stats-mapping bug invisible)."""
    _randomize(mod, seed)
    g = torch.Generator().manual_seed(seed + 1000)
    with torch.no_grad():
        for name, b in mod.named_buffers():
            if not b.is_floating_point():
                continue
            if name.endswith("running_mean"):
                b.copy_(torch.randn(b.shape, generator=g) * scale)
            elif name.endswith("running_var"):
                b.copy_(torch.rand(b.shape, generator=g) * 0.5 + 0.5)
    return mod.eval()


def _slowfast_cfg(detection=False):
    """Skinny SlowFast-R50 (+one dot-product nonlocal on the slow path);
    the detection variant is the AVA recipe shape — res5 stride-1 +
    dilation-2, RoI head, sigmoid act."""
    cfg = _repo_cfg()
    cfg.MODEL.MODEL_NAME = "SlowFast"
    cfg.MODEL.ARCH = "slowfast"
    cfg.MODEL.NUM_CLASSES = 9
    cfg.DATA.NUM_FRAMES = 8
    cfg.DATA.TRAIN_CROP_SIZE = 64
    cfg.DATA.INPUT_CHANNEL_NUM = [3, 3]
    cfg.RESNET.DEPTH = 50
    cfg.RESNET.NUM_GROUPS = 1
    cfg.RESNET.WIDTH_PER_GROUP = 8
    cfg.RESNET.NUM_BLOCK_TEMP_KERNEL = [[3, 3], [4, 4], [6, 6], [3, 3]]
    cfg.RESNET.SPATIAL_STRIDES = [[1, 1], [2, 2], [2, 2], [2, 2]]
    cfg.RESNET.SPATIAL_DILATIONS = [[1, 1], [1, 1], [1, 1], [1, 1]]
    cfg.SLOWFAST.ALPHA = 4
    cfg.SLOWFAST.BETA_INV = 8
    cfg.SLOWFAST.FUSION_CONV_CHANNEL_RATIO = 2
    cfg.SLOWFAST.FUSION_KERNEL_SZ = 5
    cfg.NONLOCAL.LOCATION = [[[], []], [[], []], [[1], []], [[], []]]
    cfg.NONLOCAL.GROUP = [[1, 1], [1, 1], [1, 1], [1, 1]]
    cfg.NONLOCAL.INSTANTIATION = "dot_product"
    if detection:
        cfg.DETECTION.ENABLE = True
        cfg.DETECTION.ALIGNED = True
        cfg.DETECTION.ROI_XFORM_RESOLUTION = 7
        cfg.DETECTION.SPATIAL_SCALE_FACTOR = 16
        cfg.RESNET.SPATIAL_STRIDES = [[1, 1], [2, 2], [2, 2], [1, 1]]
        cfg.RESNET.SPATIAL_DILATIONS = [[1, 1], [1, 1], [1, 1], [2, 2]]
        cfg.MODEL.HEAD_ACT = "sigmoid"
    return cfg


def _x3d_cfg():
    cfg = _repo_cfg()
    cfg.MODEL.MODEL_NAME = "X3D"
    cfg.MODEL.ARCH = "x3d"
    cfg.MODEL.NUM_CLASSES = 9
    cfg.DATA.NUM_FRAMES = 4
    cfg.DATA.TRAIN_CROP_SIZE = 64
    cfg.DATA.INPUT_CHANNEL_NUM = [3]
    cfg.RESNET.DEPTH = 50
    cfg.RESNET.NUM_GROUPS = 1
    cfg.RESNET.WIDTH_PER_GROUP = 8
    cfg.RESNET.TRANS_FUNC = "x3d_transform"
    cfg.RESNET.STRIDE_1X1 = False
    cfg.RESNET.SPATIAL_DILATIONS = [[1], [1], [1], [1]]
    cfg.NONLOCAL.LOCATION = [[[]], [[]], [[]], [[]]]
    cfg.NONLOCAL.GROUP = [[1], [1], [1], [1]]
    cfg.X3D.DIM_C1 = 12
    cfg.X3D.WIDTH_FACTOR = 1.5
    cfg.X3D.DEPTH_FACTOR = 1.0
    cfg.X3D.BOTTLENECK_FACTOR = 2.25
    cfg.X3D.CHANNELWISE_3x3x3 = True
    cfg.X3D.SCALE_RES2 = False
    cfg.X3D.DIM_C5 = 64
    cfg.X3D.BN_LIN5 = False
    return cfg


def _slow_cfg():
    """Single-pathway slow-R50, skinny, with one softmax nonlocal (the
    other instantiation) in res3."""
    cfg = _repo_cfg()
    cfg.MODEL.MODEL_NAME = "ResNet"
    cfg.MODEL.ARCH = "slow"
    cfg.MODEL.NUM_CLASSES = 9
    cfg.DATA.NUM_FRAMES = 4
    cfg.DATA.TRAIN_CROP_SIZE = 64
    cfg.DATA.INPUT_CHANNEL_NUM = [3]
    cfg.RESNET.DEPTH = 50
    cfg.RESNET.NUM_GROUPS = 1
    cfg.RESNET.WIDTH_PER_GROUP = 8
    cfg.RESNET.NUM_BLOCK_TEMP_KERNEL = [[3], [4], [6], [3]]
    cfg.RESNET.SPATIAL_STRIDES = [[1], [2], [2], [2]]
    cfg.RESNET.SPATIAL_DILATIONS = [[1], [1], [1], [1]]
    cfg.NONLOCAL.LOCATION = [[[]], [[1]], [[]], [[]]]
    cfg.NONLOCAL.GROUP = [[1], [1], [1], [1]]
    cfg.NONLOCAL.INSTANTIATION = "softmax"
    return cfg


def gen_conv_full():
    """Full reference conv-family forwards (video_model_builder.py
    SlowFast:159-420, ResNet:424-616, X3D:619-761) incl. BN running
    stats, nonlocal blocks, SlowFast fusion, X3D SE/swish stages, and
    the AVA RoI detection head (head_helper.py:11-129; ROIAlign is the
    naive aligned=True oracle stubbed above)."""
    from slowfast.models.video_model_builder import X3D, ResNet, SlowFast

    rs = np.random.RandomState(21)
    video = rs.rand(2, 3, 8, 64, 64).astype(np.float32)
    alpha = 4
    paths = lambda: [
        torch.from_numpy(video[:, :, ::alpha].copy()),
        torch.from_numpy(video),
    ]

    mod = _randomize_with_buffers(SlowFast(_slowfast_cfg()), 21)
    with torch.no_grad():
        out = mod(paths())
    save("slowfast_full", video=video, out=out.numpy(), **_sd_to_np(mod))

    # detection: O=3 well-formed xyxy pixel boxes per sample
    lo = rs.rand(2, 3, 2).astype(np.float32) * 30.0
    hi = lo + 8.0 + rs.rand(2, 3, 2).astype(np.float32) * 20.0
    boxes = np.concatenate(
        [lo[..., :1], lo[..., 1:], hi[..., :1], hi[..., 1:]], axis=-1
    )
    rois = torch.cat(
        [
            torch.cat(
                [torch.full((3, 1), float(b)), torch.from_numpy(boxes[b])],
                dim=1,
            )
            for b in range(2)
        ],
        dim=0,
    )
    mod = _randomize_with_buffers(SlowFast(_slowfast_cfg(detection=True)), 22)
    with torch.no_grad():
        out = mod(paths(), bboxes=rois)
    save("slowfast_det_full", video=video, boxes=boxes, out=out.numpy(),
         **_sd_to_np(mod))

    video4 = rs.rand(2, 3, 4, 64, 64).astype(np.float32)
    mod = _randomize_with_buffers(X3D(_x3d_cfg()), 23)
    with torch.no_grad():
        out = mod([torch.from_numpy(video4)])
    save("x3d_full", video=video4, out=out.numpy(), **_sd_to_np(mod))

    mod = _randomize_with_buffers(ResNet(_slow_cfg()), 24)
    with torch.no_grad():
        out = mod([torch.from_numpy(video4)])
    save("slow_full", video=video4, out=out.numpy(), **_sd_to_np(mod))


def main():
    _install_stubs()
    if "--flagship-only" in sys.argv:
        gen_motionformer_flagship()
        return
    gen_trajectory_attention()
    gen_layout()
    gen_slot_attention()
    gen_dvae()
    gen_steve_transformer()
    gen_multiscale_attention()
    gen_orvit_block()
    gen_motionformer_full()
    if "--flagship" in sys.argv or "--all" in sys.argv:
        gen_motionformer_flagship()
    gen_mvit_full()
    gen_steve_full()
    gen_conv_full()


if __name__ == "__main__":
    main()
