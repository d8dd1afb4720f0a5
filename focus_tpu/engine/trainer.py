"""Supervised training loop (counterpart of reference ``tools/train_net.py``).

One jitted train step over the device mesh: params replicated, batch
sharded on 'data'. LR follows the reference's per-iteration fractional-
epoch policy as a pure function of the step counter (see
focus_tpu/models/optimizer.py). Top-1/top-5 are computed on-device in the
step and only synced at LOG_PERIOD boundaries so dispatch stays async.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from focus_tpu.datasets import loader as data_loader
from focus_tpu.models import losses as losses_lib
from focus_tpu.models import optimizer as optim
from focus_tpu.models.build import build_model, init_model
from focus_tpu.ops.preprocess import device_normalize
from focus_tpu.parallel import mesh as mesh_lib
from focus_tpu.parallel.train_state import TrainState
from focus_tpu.utils import checkpoint as cu
from focus_tpu.utils import logging, lr_policy
from focus_tpu.utils.meters import EpochTimer, TrainMeter, ValMeter
from focus_tpu.visualization.tensorboard_vis import TensorboardWriter

logger = logging.get_logger(__name__)


def _topk_errors_device(logits, labels, ks=(1, 5)):
    """Per-batch top-k error (%) computed on device."""
    out = {}
    max_k = min(max(ks), logits.shape[-1])
    _, top = jax.lax.top_k(logits, max_k)
    correct = top == labels[:, None]
    for k in ks:
        kk = min(k, max_k)
        err = 100.0 * (1.0 - correct[:, :kk].any(axis=1).mean())
        out[f"top{k}_err"] = err
    return out


def _device_mixup(rng, video, labels, cfg):
    """MixUp/CutMix inside the jitted step (reference applies it on host in
    the train loop, train_net.py:58-80; elementwise mixing is cheaper on
    device). Returns (video, soft_labels)."""
    n_classes = cfg.MODEL.NUM_CLASSES
    smoothing = cfg.MIXUP.LABEL_SMOOTH_VALUE
    k_lam, k_use, k_switch, k_box = jax.random.split(rng, 4)
    use_mix = jax.random.uniform(k_use) < cfg.MIXUP.PROB
    use_cutmix = jnp.logical_and(
        cfg.MIXUP.CUTMIX_ALPHA > 0.0,
        jnp.logical_or(
            cfg.MIXUP.ALPHA <= 0.0,
            jax.random.uniform(k_switch) < cfg.MIXUP.SWITCH_PROB,
        ),
    )
    alpha_mix = max(cfg.MIXUP.ALPHA, 1e-8)
    alpha_cut = max(cfg.MIXUP.CUTMIX_ALPHA, 1e-8)
    lam_mix = jax.random.beta(k_lam, alpha_mix, alpha_mix)
    lam_cut = jax.random.beta(k_lam, alpha_cut, alpha_cut)
    lam = jnp.where(use_cutmix, lam_cut, lam_mix)
    lam = jnp.where(use_mix, lam, 1.0)

    flipped = jnp.flip(video, axis=0)
    H, W = video.shape[-3], video.shape[-2]
    ratio = jnp.sqrt(1.0 - lam)
    cut_h = (H * ratio).astype(jnp.int32)
    cut_w = (W * ratio).astype(jnp.int32)
    cy = jax.random.randint(k_box, (), 0, H)
    cx = jax.random.randint(jax.random.fold_in(k_box, 1), (), 0, W)
    y1, y2 = jnp.clip(cy - cut_h // 2, 0, H), jnp.clip(cy + cut_h // 2, 0, H)
    x1, x2 = jnp.clip(cx - cut_w // 2, 0, W), jnp.clip(cx + cut_w // 2, 0, W)
    ys = jnp.arange(H)[:, None]
    xs = jnp.arange(W)[None, :]
    in_box = ((ys >= y1) & (ys < y2) & (xs >= x1) & (xs < x2))[..., None]
    cut_video = jnp.where(in_box, flipped, video)
    lam_cut_actual = 1.0 - ((y2 - y1) * (x2 - x1)) / (H * W)
    mix_video = video * lam + flipped * (1.0 - lam)
    video = jnp.where(use_cutmix & use_mix, cut_video,
                      jnp.where(use_mix, mix_video, video))
    lam_final = jnp.where(use_cutmix & use_mix, lam_cut_actual, lam)

    on = 1.0 - smoothing + smoothing / n_classes
    off = smoothing / n_classes
    y1h = jax.nn.one_hot(labels, n_classes) * (on - off) + off
    y2h = jax.nn.one_hot(labels[::-1], n_classes) * (on - off) + off
    soft = y1h * lam_final + y2h * (1.0 - lam_final)
    return video, soft


def _detection_loss(preds, labels, mask, denom=None):
    """Masked BCE over per-box class probabilities (the RoI head applies
    sigmoid; reference uses 'bce' for AVA). preds: [B,O,C],
    labels: [B,O,C], mask: [B,O]. ``denom`` overrides the normaliser —
    gradient accumulation passes global_box_count/accum so the mean of
    microbatch losses equals the whole-batch masked mean exactly."""
    eps = 1e-7
    p = jnp.clip(preds, eps, 1 - eps)
    labels = labels.astype(p.dtype)
    bce = -(labels * jnp.log(p) + (1 - labels) * jnp.log(1 - p)).mean(-1)
    if denom is None:
        denom = jnp.maximum(mask.sum(), 1.0)
    return (bce * mask).sum() / denom


def make_supervised_train_step(model, cfg, mesh, loss_fn,
                               state_sharding=None):
    """``state_sharding``: optional per-leaf sharding tree for the
    TrainState (mesh_lib.state_shardings). Pinning it on BOTH sides of
    the jit keeps tensor-parallel placements stable across steps — with
    unpinned outputs GSPMD re-chooses layouts, and the donated next-step
    input would no longer match the compiled signature."""
    is_ek = cfg.TRAIN.DATASET == "epickitchens"
    detection = cfg.DETECTION.ENABLE
    use_mixup = cfg.MIXUP.ENABLE and not is_ek and not detection
    moe_cfg = getattr(cfg.TPU, "MOE", None)
    moe_on = int(getattr(moe_cfg, "NUM_EXPERTS", 0) or 0) > 1
    moe_aux_w = float(getattr(moe_cfg, "AUX_LOSS_WEIGHT", 0.0)) if moe_on else 0.0

    def _moe_aux(new_vars):
        """Switch load-balance loss: weighted mean over all sown
        (aux*w, w) pairs (models/moe.py — one per expert MLP; under
        pipeline parallelism also per stage and per tick, with w=0 on
        bubble ticks). The mean keeps the penalty magnitude independent
        of depth and of the parallelism layout, and the weights keep
        router gradients off discarded pipeline-bubble work."""
        leaves = jax.tree_util.tree_leaves(new_vars.get("moe", {}))
        if not leaves:
            return jnp.float32(0.0)
        num = sum(jnp.sum(leaf[..., 0]) for leaf in leaves)
        den = sum(jnp.sum(leaf[..., 1]) for leaf in leaves)
        return num / jnp.maximum(den, 1e-9)

    def forward(params, batch_stats, video, labels, metadata, rng,
                det_denom=None):
        """The one forward+loss closure both step variants differentiate
        (single-shot and GRAD_ACCUM microbatch)."""
        video = device_normalize(video, cfg)
        variables = {"params": params}
        has_bn = batch_stats is not None
        if has_bn:
            variables["batch_stats"] = batch_stats
        cols = (["batch_stats"] if has_bn else []) + (
            ["moe"] if moe_on else []
        )
        args = (video, metadata, metadata["boxes"]) if detection else (
            video, metadata)
        out = model.apply(
            variables, *args, train=True, rngs={"dropout": rng},
            mutable=cols if cols else False,
        )
        preds, new_vars = out if cols else (out, {})
        if detection:
            loss = _detection_loss(
                preds, labels, metadata["boxes_mask"], denom=det_denom
            )
        else:
            loss = loss_fn(preds, labels)
        if moe_on:
            loss = loss + moe_aux_w * _moe_aux(new_vars)
        return loss, (preds, new_vars)

    def _step_stats(loss, preds, new_vars, hard_labels):
        stats = {"loss": loss}
        if moe_on:
            stats["moe_aux"] = _moe_aux(new_vars)
        if hard_labels is not None:
            logits = preds[0] if isinstance(preds, tuple) else preds
            stats.update(_topk_errors_device(logits, hard_labels))
        return stats

    want_topk = not is_ek and not cfg.DATA.MULTI_LABEL and not detection

    def train_step(state, video, labels, metadata, base_rng):
        # normalise uint8 batches BEFORE mixup so blending happens in
        # normalised space like the reference's host pipeline (no-op on
        # float batches; forward's call is then also a no-op)
        video = device_normalize(video, cfg)
        rng = jax.random.fold_in(base_rng, state.step)
        hard_labels = labels
        if use_mixup:
            k_mix, rng = jax.random.split(rng)
            video, labels = _device_mixup(k_mix, video, labels, cfg)

        (loss, (preds, new_vars)), grads = jax.value_and_grad(
            forward, has_aux=True
        )(state.params, state.batch_stats, video, labels, metadata, rng)
        new_state = state.apply_gradients(grads)
        if state.batch_stats is not None:
            new_state = new_state.replace(batch_stats=new_vars["batch_stats"])
        topk_labels = hard_labels if (
            want_topk and getattr(hard_labels, "ndim", 1) == 1
        ) else None
        return new_state, _step_stats(loss, preds, new_vars, topk_labels)

    accum = max(int(getattr(cfg.TPU, "GRAD_ACCUM", 1) or 1), 1)

    def _microbatch(x):
        """[B, ...] -> [accum, B/accum, ...] with microbatch a = x[a::A]
        (strided split: each device's contiguous data shard splits into A
        local microbatches — no cross-device reshuffle under DP)."""
        b = x.shape[0]
        x = jnp.swapaxes(x.reshape(b // accum, accum, *x.shape[1:]), 0, 1)
        return jax.lax.with_sharding_constraint(
            x,
            jax.sharding.NamedSharding(
                mesh,
                jax.sharding.PartitionSpec(
                    None, mesh_lib.DATA_AXIS, *([None] * (x.ndim - 2))
                ),
            ),
        )

    def train_step_accum(state, video, labels, metadata, base_rng):
        """TPU.GRAD_ACCUM > 1: scan `forward` over microbatches carrying a
        gradient sum, then apply one optimizer update of the mean
        gradient. Activation memory scales 1/accum. The mean-of-means is
        the single-shot loss/gradient exactly for the mean-reduced
        classification losses and (via det_denom) the masked detection
        loss; BN stats update once per microbatch (standard accumulation
        semantics) and the MoE aux ratio is per-microbatch."""
        video = device_normalize(video, cfg)  # before mixup, as above
        rng = jax.random.fold_in(base_rng, state.step)
        hard_labels = labels
        if use_mixup:
            k_mix, rng = jax.random.split(rng)
            video, labels = _device_mixup(k_mix, video, labels, cfg)

        # whole-batch box count, known before the scan: each microbatch
        # normalises by global/accum so the loss mean is the global
        # masked mean (see _detection_loss)
        det_denom = None
        if detection:
            det_denom = jnp.maximum(
                metadata["boxes_mask"].sum(), 1.0
            ) / accum

        xs = {
            "video": jax.tree_util.tree_map(_microbatch, video),
            "labels": jax.tree_util.tree_map(_microbatch, labels),
            "metadata": jax.tree_util.tree_map(_microbatch, metadata),
            "rng": jax.random.split(rng, accum),
        }
        if want_topk and getattr(hard_labels, "ndim", 1) == 1:
            xs["hard_labels"] = _microbatch(hard_labels)

        grad0 = jax.tree_util.tree_map(jnp.zeros_like, state.params)

        def micro(carry, x):
            grads_sum, batch_stats = carry
            (loss, (preds, new_vars)), g = jax.value_and_grad(
                forward, has_aux=True
            )(state.params, batch_stats, x["video"], x["labels"],
              x["metadata"], x["rng"], det_denom)
            grads_sum = jax.tree_util.tree_map(jnp.add, grads_sum, g)
            if batch_stats is not None:
                batch_stats = new_vars["batch_stats"]
            stats = _step_stats(loss, preds, new_vars,
                                x.get("hard_labels"))
            return (grads_sum, batch_stats), stats

        (grads_sum, batch_stats), stats = jax.lax.scan(
            micro, (grad0, state.batch_stats), xs
        )
        grads = jax.tree_util.tree_map(lambda g: g / accum, grads_sum)
        new_state = state.apply_gradients(grads)
        if batch_stats is not None:
            new_state = new_state.replace(batch_stats=batch_stats)
        return new_state, {k: v.mean() for k, v in stats.items()}

    if accum > 1:
        train_step = train_step_accum

    data = mesh_lib.batch_sharded(mesh)
    kw = {}
    if state_sharding is not None:
        kw = dict(
            in_shardings=(state_sharding, data, data, data, None),
            out_shardings=(state_sharding, None),
        )
    else:
        kw = dict(in_shardings=(None, data, data, data, None))
    return mesh_lib.mesh_context(
        jax.jit(train_step, donate_argnums=(0,), **kw), mesh
    )


def make_supervised_eval_step(model, cfg, mesh):
    detection = cfg.DETECTION.ENABLE

    def eval_step(state, video, metadata):
        video = device_normalize(video, cfg)
        variables = {"params": state.params}
        if state.batch_stats is not None:
            variables["batch_stats"] = state.batch_stats
        if detection:
            return model.apply(
                variables, video, metadata, metadata["boxes"], train=False
            )
        return model.apply(variables, video, metadata, train=False)

    data = mesh_lib.batch_sharded(mesh)
    return mesh_lib.mesh_context(
        jax.jit(eval_step, in_shardings=(None, data, data)), mesh
    )


def _no_wd_paths(cfg):
    """Positional/class embeddings excluded from weight decay. MViT
    gates the exclusion on MVIT.ZERO_DECAY_POS_CLS (reference
    video_model_builder.py:1016-1030); Motionformer's is unconditional
    (:1256-1261)."""
    if cfg.MODEL.MODEL_NAME == "MViT" and not cfg.MVIT.ZERO_DECAY_POS_CLS:
        return ()
    return ("pos_embed", "cls_token", "temp_embed", "st_embed")


def _split_batch(batch):
    """Normalise loader output to (video, labels, metadata)."""
    if isinstance(batch, (tuple, list)):
        if len(batch) == 2:
            return batch[0], batch[1], {}
        if len(batch) >= 4:
            return batch[0], batch[1], batch[3]
        return batch[0], batch[1], {}
    return batch, None, {}


def build_supervised_state(cfg, model, mesh, sample_batch, steps_per_epoch):
    video, labels, metadata = _split_batch(sample_batch)
    video = jax.tree_util.tree_map(jnp.asarray, video)
    # uint8 device-preprocess batches: init sees the float view the
    # jitted steps compute with
    video = device_normalize(video, cfg)
    if cfg.DETECTION.ENABLE:
        variables = init_model(
            model, cfg, (video, metadata, metadata["boxes"])
        )
    else:
        variables = init_model(model, cfg, (video, metadata))
    params = variables["params"]
    from focus_tpu.models.build import maybe_zero_init_orvit

    params = maybe_zero_init_orvit(cfg, params)
    batch_stats = variables.get("batch_stats")
    no_wd = _no_wd_paths(cfg)
    tx = optim.construct_optimizer(
        params, cfg, steps_per_epoch, no_weight_decay_paths=no_wd
    )
    state = TrainState.create(params, tx, batch_stats=batch_stats)
    if getattr(cfg.MODEL, "LOAD_IN_PRETRAIN", ""):
        # timm-format image pretrained (reference models/build.py:47-61)
        from focus_tpu.utils import timm_pretrained

        state = timm_pretrained.load_into_state(cfg, state)
    # replicated for pure DP; tensor-parallel specs on the transformer
    # dense layers when the mesh has a model axis, dp-sharded optimizer
    # moments under TPU.ZERO1 (TPU extensions)
    state = jax.device_put(
        state, mesh_lib.state_shardings(mesh, state, zero1=cfg.TPU.ZERO1)
    )
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(params))
    logger.info(
        f"{cfg.MODEL.MODEL_NAME} initialised: {n_params / 1e6:.2f}M params"
    )
    if getattr(cfg, "LOG_MODEL_INFO", False) and not cfg.DETECTION.ENABLE:
        # params + analytical FLOPs of the eval forward (reference
        # misc.log_model_info, train_net.py gates it on LOG_MODEL_INFO)
        from focus_tpu.utils import misc

        variables_ = {"params": state.params}
        if state.batch_stats is not None:
            variables_["batch_stats"] = state.batch_stats
        misc.log_model_info(
            cfg.MODEL.MODEL_NAME, state.params,
            fn=lambda v: model.apply(variables_, v, metadata, train=False),
            args=(video,),
        )
    return state


def train_epoch(train_loader, state, train_step, train_meter, cur_epoch, cfg,
                base_rng, writer=None, profiler=None, preempt_guard=None):
    data_size = len(train_loader)
    train_meter.iter_tic()
    for cur_iter, batch in enumerate(train_loader):
        if profiler is not None:
            profiler.step(data_size * cur_epoch + cur_iter)
        video, labels, metadata = _split_batch(batch)
        train_meter.data_toc()
        state, stats = train_step(state, video, labels, metadata, base_rng)
        if (cur_iter + 1) % cfg.LOG_PERIOD == 0:
            host = {k: float(v) for k, v in jax.device_get(stats).items()}
            epoch_f = cur_epoch + float(cur_iter) / data_size
            lr = lr_policy.get_lr_at_epoch(cfg, epoch_f)["lr"]
            # multi-pathway models (SlowFast) carry a tuple of videos
            mb = (video[0] if isinstance(video, (tuple, list)) else video).shape[0]
            train_meter.update_stats(
                host.get("top1_err"), host.get("top5_err"), host["loss"], lr,
                mb,
            )
            if writer is not None:
                # (reference train_net.py:262-274)
                writer.add_scalars(
                    {
                        "Train/loss": host["loss"],
                        "Train/lr": lr,
                        **(
                            {
                                "Train/Top1_err": host["top1_err"],
                                "Train/Top5_err": host["top5_err"],
                            }
                            if host.get("top1_err") is not None
                            else {}
                        ),
                    },
                    global_step=data_size * cur_epoch + cur_iter,
                )
        train_meter.iter_toc()
        train_meter.log_iter_stats(cur_epoch, cur_iter)
        if preempt_guard is not None and preempt_guard.poll(cur_iter):
            from focus_tpu.utils.preemption import PreemptionSignaled

            raise PreemptionSignaled(cur_epoch, state)
        train_meter.iter_tic()
    train_meter.log_epoch_stats(cur_epoch)
    train_meter.reset()
    return state


def _eval_epoch_detection(val_loader, state, eval_step, val_meter, cur_epoch,
                          cfg):
    """AVA detection validation (reference train_net.py:330-380): the
    shared loop in engine/tester.py (pad-duplicate filtering included)."""
    from focus_tpu.engine.tester import run_detection_eval

    val_meter.reset()
    run_detection_eval(val_loader, state, eval_step, val_meter,
                       cur_epoch=cur_epoch)


def eval_epoch(val_loader, state, eval_step, val_meter, cur_epoch, cfg, writer=None):
    from focus_tpu.utils import metrics
    from focus_tpu.utils.meters import AVAMeter, EPICValMeter

    if isinstance(val_meter, AVAMeter):
        return _eval_epoch_detection(
            val_loader, state, eval_step, val_meter, cur_epoch, cfg
        )
    is_ek = isinstance(val_meter, EPICValMeter)
    val_meter.reset()  # noqa: E305
    for cur_iter, batch in enumerate(val_loader):
        video, labels, metadata = _split_batch(batch)
        # the loader pads the final batch with duplicates (index -1) to
        # keep shapes static; drop them from metrics (host-side, after
        # the device step) so each val clip is counted exactly once
        valid = None
        if isinstance(batch, (tuple, list)) and len(batch) >= 4:
            idx_h = np.asarray(jax.device_get(batch[2]))
            if idx_h.ndim == 1 and (idx_h < 0).any():
                valid = idx_h >= 0
        preds = eval_step(state, video, metadata)
        if is_ek:
            _, both = preds
            verb = np.asarray(jax.device_get(both["verb"]))
            noun = np.asarray(jax.device_get(both["noun"]))
            lv = np.asarray(jax.device_get(labels["verb"]))
            ln = np.asarray(jax.device_get(labels["noun"]))
            if valid is not None:
                verb, noun, lv, ln = verb[valid], noun[valid], lv[valid], ln[valid]
            if verb.shape[0] == 0:
                continue
            v1, v5 = metrics.topk_accuracies(verb, lv, (1, 5))
            n1, n5 = metrics.topk_accuracies(noun, ln, (1, 5))
            a1, a5 = metrics.multitask_topk_accuracies(
                (verb, noun), (lv, ln), (1, 5)
            )
            val_meter.update_stats((v1, n1, a1), (v5, n5, a5), verb.shape[0])
        else:
            logits = preds[0] if isinstance(preds, tuple) else preds
            logits_h = np.asarray(jax.device_get(logits))
            labels_h = np.asarray(jax.device_get(labels))
            if valid is not None:
                logits_h, labels_h = logits_h[valid], labels_h[valid]
            if logits_h.shape[0] == 0:
                continue
            errs = metrics.topk_errors(logits_h, labels_h, (1, 5))
            val_meter.update_stats(errs[0], errs[1], logits_h.shape[0])
            val_meter.update_predictions(logits_h, labels_h)
        val_meter.log_iter_stats(cur_epoch, cur_iter)
    val_meter.log_epoch_stats(cur_epoch)
    if writer is not None and getattr(val_meter, "all_preds", None):
        # confusion-matrix / histogram panels (reference
        # train_net.py:476-492, tensorboard_vis.py:106-172)
        all_preds = np.concatenate(val_meter.all_preds, axis=0)
        all_labels = np.concatenate(val_meter.all_labels, axis=0)
        writer.plot_eval(all_preds, all_labels, global_step=cur_epoch)


def _build_val(cfg, mesh):
    """Val loader + matching meter (shared by initial construction and
    the multigrid long-cycle rebuild — the reference rebuilds the whole
    trainer incl. val loader and meters on a shape change,
    train_net.py:653-675; our val dataset shares the mutated cfg so its
    shapes follow the cycle, and loader batch size / meter sizing must
    follow too)."""
    data_sh = mesh_lib.batch_sharded(mesh)
    val_loader = data_loader.construct_loader(cfg, "val", sharding=data_sh)
    if cfg.DETECTION.ENABLE:
        from focus_tpu.utils.meters import AVAMeter

        val_meter = AVAMeter(
            len(val_loader), cfg, "val",
            video_idx_to_name=getattr(
                val_loader.dataset, "_video_idx_to_name", None
            ),
        )
    elif cfg.TRAIN.DATASET == "epickitchens":
        from focus_tpu.utils.meters import EPICValMeter

        val_meter = EPICValMeter(len(val_loader), cfg)
    else:
        val_meter = ValMeter(len(val_loader), cfg)
    return val_loader, val_meter


def _rebuild_for_long_cycle(cfg, mesh, state, cur_epoch):
    """Multigrid long-cycle shape change (reference train_net.py:653-675):
    rebuild the model (BN type per the schedule — the redesigned
    SubBatchNorm keeps the variable tree identical across types, see
    models/norms.py) and the train loader (new B/T/S + stretched
    sampling rate), and continue the LR schedule from the current
    (epoch, step) under the new steps-per-epoch. Params, optimizer
    momentum and the step counter carry over in place of the reference's
    checkpoint round-trip; the jitted step recompiles once per new shape
    (XLA caches by shape — the finite-compiled-shapes design in
    utils/multigrid.py)."""
    model = build_model(cfg)
    data_sh = mesh_lib.batch_sharded(mesh)
    train_loader = data_loader.construct_loader(cfg, "train", sharding=data_sh)
    no_wd = _no_wd_paths(cfg)
    tx = optim.construct_optimizer(
        state.params, cfg, len(train_loader), no_weight_decay_paths=no_wd,
        epoch_offset=float(cur_epoch), step_offset=int(state.step),
    )
    state = state.replace(tx=tx)
    return model, train_loader, state


def train(cfg):
    """Supervised training entry (reference train_net.py:573-747)."""
    mesh_lib.init_distributed(cfg)
    np.random.seed(cfg.RNG_SEED)
    logging.setup_logging(cfg.OUTPUT_DIR)

    multigrid = None
    if cfg.MULTIGRID.LONG_CYCLE or cfg.MULTIGRID.SHORT_CYCLE:
        from focus_tpu.utils.multigrid import MultigridSchedule

        multigrid = MultigridSchedule()
        cfg = multigrid.init_multigrid(cfg)
        if cfg.MULTIGRID.LONG_CYCLE:
            cfg, _ = multigrid.update_long_cycle(cfg, cur_epoch=0)
    logger.info("Train with config:")
    logger.info(cfg.dump())

    mesh = mesh_lib.build_mesh(cfg)
    model = build_model(cfg)
    data_sh = mesh_lib.batch_sharded(mesh)
    train_loader = data_loader.construct_loader(cfg, "train", sharding=data_sh)
    val_loader, val_meter = _build_val(cfg, mesh)

    sample = next(iter(train_loader))
    state = build_supervised_state(cfg, model, mesh, sample, len(train_loader))

    start_epoch = 0
    ckpt_dir = cfg.OUTPUT_DIR
    zero1 = bool(cfg.TPU.ZERO1)
    if cfg.TRAIN.AUTO_RESUME and cu.has_checkpoint(ckpt_dir):
        state, start_epoch = cu.load_checkpoint(
            cu.get_last_checkpoint(ckpt_dir), state
        )
        state = jax.device_put(
            state, mesh_lib.state_shardings(mesh, state, zero1=zero1)
        )
    elif cfg.TRAIN.CHECKPOINT_FILE_PATH:
        state, start_epoch = cu.load_train_checkpoint(cfg, state)
        state = jax.device_put(
            state, mesh_lib.state_shardings(mesh, state, zero1=zero1)
        )

    loss_fn = losses_lib.get_loss_func(cfg)
    state_sharding = mesh_lib.state_shardings(mesh, state, zero1=zero1)
    if not mesh_lib.has_param_sharding(mesh, zero1=zero1):
        state_sharding = None  # replicated state: unpinned signature
    train_step = make_supervised_train_step(
        model, cfg, mesh, loss_fn, state_sharding=state_sharding
    )
    eval_step = make_supervised_eval_step(model, cfg, mesh)
    base_rng = jax.random.PRNGKey(cfg.RNG_SEED)

    train_meter = TrainMeter(len(train_loader), cfg)
    writer = TensorboardWriter(cfg) if jax.process_index() == 0 else None
    from focus_tpu.utils.profiler import StepProfiler

    profiler = StepProfiler(cfg)
    epoch_timer = EpochTimer()
    from focus_tpu.utils.preemption import PreemptionGuard, PreemptionSignaled

    preempt_guard = PreemptionGuard(cfg)

    try:
        state = _train_epochs(
            cfg, mesh, model, state, train_loader, val_loader, train_step,
            eval_step, train_meter, val_meter, writer, profiler, epoch_timer,
            base_rng, start_epoch, ckpt_dir, zero1, loss_fn, multigrid,
            preempt_guard,
        )
    except PreemptionSignaled as p:
        # every process raises at the same sync point (PreemptionGuard
        # agreement), so all join save_checkpoint's collective gather
        logger.info(
            f"Preempted during epoch {p.epoch}: saving checkpoint and "
            "exiting 0 for requeue (AUTO_RESUME replays the epoch)"
        )
        cu.save_checkpoint(ckpt_dir, p.state, p.epoch, cfg, async_write=False)
        cu.wait_for_saves()
        profiler.stop()
        if writer is not None:
            writer.close()
        raise SystemExit(0)

    profiler.stop()
    cu.wait_for_saves()  # land any async checkpoint writes before exit
    if writer is not None:
        writer.close()
    return state


def _train_epochs(cfg, mesh, model, state, train_loader, val_loader,
                  train_step, eval_step, train_meter, val_meter, writer,
                  profiler, epoch_timer, base_rng, start_epoch, ckpt_dir,
                  zero1, loss_fn, multigrid, preempt_guard):
    for cur_epoch in range(start_epoch, cfg.SOLVER.MAX_EPOCH):
        if multigrid is not None and cfg.MULTIGRID.LONG_CYCLE:
            cfg, changed = multigrid.update_long_cycle(cfg, cur_epoch)
            if changed:
                train_loader.close()  # release any worker pool
                model, train_loader, state = _rebuild_for_long_cycle(
                    cfg, mesh, state, cur_epoch
                )
                state_sharding = mesh_lib.state_shardings(
                    mesh, state, zero1=zero1
                )
                if not mesh_lib.has_param_sharding(mesh, zero1=zero1):
                    state_sharding = None
                train_step = make_supervised_train_step(
                    model, cfg, mesh, loss_fn, state_sharding=state_sharding
                )
                eval_step = make_supervised_eval_step(model, cfg, mesh)
                train_meter = TrainMeter(len(train_loader), cfg)
                val_loader.close()
                val_loader, val_meter = _build_val(cfg, mesh)
        data_loader.shuffle_dataset(train_loader, cur_epoch)
        epoch_timer.epoch_tic()
        state = train_epoch(
            train_loader, state, train_step, train_meter, cur_epoch, cfg,
            base_rng, writer=writer, profiler=profiler,
            preempt_guard=preempt_guard,
        )
        epoch_timer.epoch_toc()
        logger.info(
            f"Epoch {cur_epoch} takes {epoch_timer.last_epoch_time():.2f}s."
        )
        mg_sched = multigrid.schedule if multigrid is not None else None
        is_checkp = cu.is_checkpoint_epoch(cfg, cur_epoch, mg_sched)
        from focus_tpu.utils.misc import is_eval_epoch

        is_eval = is_eval_epoch(cfg, cur_epoch, mg_sched)
        if (is_checkp or is_eval) and cfg.BN.USE_PRECISE_STATS and (
            state.batch_stats is not None
        ):
            from focus_tpu.engine.precise_bn import compute_precise_bn_stats

            state = compute_precise_bn_stats(
                model, state, train_loader, cfg.BN.NUM_BATCHES_PRECISE,
                _split_batch,
            )
        if is_checkp:
            cu.save_checkpoint(ckpt_dir, state, cur_epoch + 1, cfg)
        if is_eval:
            eval_epoch(val_loader, state, eval_step, val_meter, cur_epoch,
                       cfg, writer=writer)
    return state
