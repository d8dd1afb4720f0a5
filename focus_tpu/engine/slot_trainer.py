"""STEVE training / evaluation loops.

TPU-native counterpart of the reference's slot trainer
(reference ``tools/steve_train_net.py:33-457`` and ``steve_eval_net.py:27-133``):

* One jitted train step over a device mesh: params replicated, batch
  sharded on the ``data`` axis; XLA inserts the gradient all-reduce.
* tau annealing and all three LR schedules are functions of the on-device
  step counter — nothing is mutated per iteration, nothing recompiles.
* BatchNorm stats (res18 encoder) are computed under global-batch
  semantics, i.e. synchronised across devices for free.
* best-val checkpointing + per-epoch checkpoint, like the reference.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from focus_tpu.datasets import loader as data_loader
from focus_tpu.models import optimizer as optim
from focus_tpu.models.build import build_model, init_model
from focus_tpu.parallel import mesh as mesh_lib
from focus_tpu.parallel.train_state import TrainState
from focus_tpu.utils import checkpoint as cu
from focus_tpu.utils import logging, lr_policy, metrics
from focus_tpu.utils.meters import EpochTimer, MetricTracker
from focus_tpu.utils import slot_misc as smisc
from focus_tpu.visualization.tensorboard_vis import TensorboardWriter

logger = logging.get_logger(__name__)


def _rngs_for_step(base_rng, step):
    r = jax.random.fold_in(base_rng, step)
    k_slots, k_gumbel, k_drop = jax.random.split(r, 3)
    return {"slots": k_slots, "gumbel": k_gumbel, "dropout": k_drop}


def make_train_step(model, cfg, mesh):
    so = cfg.SLOTS_OPTIM
    hard = bool(cfg.SLOTS.HARD)

    def train_step(state, video, base_rng):
        tau = lr_policy.cosine_anneal_jnp(
            state.step.astype(jnp.float32), so.TAU_START, so.TAU_FINAL, 0, so.TAU_STEPS
        )
        rngs = _rngs_for_step(base_rng, state.step)

        def loss_fn(params):
            variables = {"params": params}
            has_bn = state.batch_stats is not None
            if has_bn:
                variables["batch_stats"] = state.batch_stats
            out = model.apply(
                variables, video, tau, hard, train=True, rngs=rngs,
                mutable=["batch_stats"] if has_bn else False,
            )
            (recon, ce, mse, _attns), new_vars = out if has_bn else (out, {})
            return mse + ce, (ce, mse, new_vars)

        (loss, (ce, mse, new_vars)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        new_state = state.apply_gradients(grads)
        if state.batch_stats is not None:
            new_state = new_state.replace(batch_stats=new_vars["batch_stats"])
        stats = {"loss": loss, "mse": mse, "cross_entropy": ce, "tau": tau}
        return new_state, stats

    repl = mesh_lib.replicated(mesh)
    data = mesh_lib.batch_sharded(mesh)
    return jax.jit(
        train_step,
        in_shardings=(None, data, repl),
        donate_argnums=(0,),
    )


def make_eval_step(model, cfg, mesh):
    hard = bool(cfg.SLOTS.HARD)

    def eval_step(state, video, tau, base_rng):
        variables = {"params": state.params}
        if state.batch_stats is not None:
            variables["batch_stats"] = state.batch_stats
        rngs = _rngs_for_step(base_rng, state.step)
        recon, ce, mse, attns = model.apply(
            variables, video, tau, hard, train=False, rngs=rngs
        )
        return recon, ce, mse, attns

    data = mesh_lib.batch_sharded(mesh)
    return jax.jit(eval_step, in_shardings=(None, data, None, None))


def make_encode_step(model, mesh):
    def encode_step(state, video, base_rng):
        variables = {"params": state.params}
        if state.batch_stats is not None:
            variables["batch_stats"] = state.batch_stats
        rngs = _rngs_for_step(base_rng, state.step)
        return model.apply(variables, video, method="encode", rngs=rngs)

    data = mesh_lib.batch_sharded(mesh)
    return jax.jit(encode_step, in_shardings=(None, data, None))


def build_slot_state(cfg, model, mesh, sample_video):
    variables = init_model(model, cfg, (jnp.asarray(sample_video), 1.0, True))
    params = variables["params"]
    batch_stats = variables.get("batch_stats")
    tx = optim.construct_optimizer_slot(params, cfg)
    state = TrainState.create(params, tx, batch_stats=batch_stats)
    # replicate onto the mesh
    repl = mesh_lib.replicated(mesh)
    state = jax.device_put(state, repl)
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(params))
    logger.info(f"STEVE initialised: {n_params / 1e6:.2f}M params")
    return state


def slot_train_epoch(
    train_loader, state, train_step, cur_epoch, cfg, base_rng, writer=None,
    preempt_guard=None,
):
    data_size = len(train_loader)
    stats = None
    for cur_iter, video in enumerate(train_loader):
        if preempt_guard is not None and preempt_guard.poll(cur_iter - 1):
            from focus_tpu.utils.preemption import PreemptionSignaled

            raise PreemptionSignaled(cur_epoch, state)
        state, stats = train_step(state, video, base_rng)
        global_step = cur_epoch * data_size + cur_iter
        if (cur_iter + 1) % cfg.LOG_PERIOD == 0:
            host = {k: float(v) for k, v in jax.device_get(stats).items()}
            logging.log_json_stats(
                {
                    "_type": "slot_train_iter",
                    "epoch": cur_epoch + 1,
                    "iter": f"{cur_iter + 1}/{data_size}",
                    "global_step": global_step,
                    **host,
                }
            )
            if writer is not None:
                writer.add_scalars(
                    {
                        "TRAIN/loss": host["loss"],
                        "TRAIN/cross_entropy": host["cross_entropy"],
                        "TRAIN/mse": host["mse"],
                        "TRAIN/tau": host["tau"],
                    },
                    global_step=global_step,
                )
    tau = float(jax.device_get(stats["tau"])) if stats is not None else cfg.SLOTS_OPTIM.TAU_START
    return state, {"tau": tau, "global_step": (cur_epoch + 1) * data_size - 1}


def slot_eval_epoch(val_loader, state, eval_step, cur_epoch, cfg, opd, base_rng,
                    writer=None):
    mse_meter, ce_meter = MetricTracker(), MetricTracker()
    last = None
    tau = jnp.asarray(opd["tau"], jnp.float32)
    for video in val_loader:
        recon, ce, mse, attns = eval_step(state, video, tau, base_rng)
        mse_meter.update(float(jax.device_get(mse)))
        ce_meter.update(float(jax.device_get(ce)))
        last = (video, recon, attns)
    val_loss = mse_meter.avg + ce_meter.avg
    logging.log_json_stats(
        {
            "_type": "slot_val_epoch",
            "epoch": cur_epoch + 1,
            "loss": val_loss,
            "mse": mse_meter.avg,
            "cross_entropy": ce_meter.avg,
        }
    )
    if writer is not None:
        writer.add_scalars(
            {
                "VAL/loss": val_loss,
                "VAL/cross_entropy": ce_meter.avg,
                "VAL/mse": mse_meter.avg,
            },
            global_step=cur_epoch + 1,
        )
    model_out = None
    if last is not None:
        model_out = {"video": last[0], "recon": last[1], "attns": last[2]}
    return val_loss, model_out


def slot_train(cfg):
    """Main slot-training entry (reference steve_train_net.py:214-458)."""
    mesh_lib.init_distributed(cfg)
    np.random.seed(cfg.RNG_SEED)
    logging.setup_logging(cfg.EXP.PATH or cfg.OUTPUT_DIR)
    logger.info("Train with config:")
    logger.info(cfg.dump())

    mesh = mesh_lib.build_mesh(cfg)
    model = build_model(cfg)
    data_sh = mesh_lib.batch_sharded(mesh)

    train_loader = data_loader.construct_loader(cfg, "train", sharding=data_sh)
    val_loader = data_loader.construct_loader(cfg, "val", sharding=data_sh)

    sample = next(iter(train_loader))
    state = build_slot_state(cfg, model, mesh, jax.device_get(sample))

    ckpt_dir = cfg.EXP.PATH or cfg.OUTPUT_DIR
    start_epoch = 0
    if cfg.TRAIN.AUTO_RESUME and cu.has_checkpoint(ckpt_dir):
        state, start_epoch = cu.load_checkpoint(
            cu.get_last_checkpoint(ckpt_dir), state
        )
        state = jax.device_put(state, mesh_lib.replicated(mesh))
    elif cfg.TRAIN.CHECKPOINT_FILE_PATH:
        state, start_epoch = cu.load_train_checkpoint(cfg, state)
        state = jax.device_put(state, mesh_lib.replicated(mesh))

    train_step = make_train_step(model, cfg, mesh)
    eval_step = make_eval_step(model, cfg, mesh)
    base_rng = jax.random.PRNGKey(cfg.RNG_SEED)

    writer = (
        TensorboardWriter(cfg) if jax.process_index() == 0 else None
    )
    best_val_loss = math.inf
    epoch_timer = EpochTimer()
    opd = {"tau": cfg.SLOTS_OPTIM.TAU_START, "global_step": 0}
    from focus_tpu.utils.preemption import PreemptionGuard, PreemptionSignaled

    preempt_guard = PreemptionGuard(cfg)

    try:
        state = _slot_train_epochs(
            cfg, state, train_loader, val_loader, train_step, eval_step,
            base_rng, writer, epoch_timer, best_val_loss, opd, start_epoch,
            ckpt_dir, preempt_guard,
        )
    except PreemptionSignaled as p:
        logger.info(
            f"Preempted during epoch {p.epoch}: saving checkpoint and "
            "exiting 0 for requeue (AUTO_RESUME replays the epoch)"
        )
        cu.save_checkpoint(ckpt_dir, p.state, p.epoch, cfg, async_write=False)
        cu.wait_for_saves()
        if writer is not None:
            writer.close()
        raise SystemExit(0)

    cu.wait_for_saves()  # land any async checkpoint writes before exit
    if writer is not None:
        writer.close()
    return state


def _slot_train_epochs(cfg, state, train_loader, val_loader, train_step,
                       eval_step, base_rng, writer, epoch_timer,
                       best_val_loss, opd, start_epoch, ckpt_dir,
                       preempt_guard):
    for cur_epoch in range(start_epoch, cfg.SOLVER.MAX_EPOCH):
        data_loader.shuffle_dataset(train_loader, cur_epoch)
        epoch_timer.epoch_tic()
        if not cfg.TRAIN.VAL_ONLY:
            state, opd = slot_train_epoch(
                train_loader, state, train_step, cur_epoch, cfg, base_rng,
                writer, preempt_guard=preempt_guard,
            )
        epoch_timer.epoch_toc()
        logger.info(
            f"Epoch {cur_epoch} takes {epoch_timer.last_epoch_time():.2f}s "
            f"(median {epoch_timer.median_epoch_time():.2f}s)."
        )

        val_loss, model_out = slot_eval_epoch(
            val_loader, state, eval_step, cur_epoch, cfg, opd, base_rng, writer
        )
        if cfg.TRAIN.VAL_ONLY:
            break

        if val_loss < best_val_loss:
            best_val_loss = val_loss
            cu.save_checkpoint(
                ckpt_dir, state, cur_epoch + 1, cfg, name="best_model", fmt=".pt"
            )
        if writer is not None:
            writer.add_scalars(
                {"VAL/best_loss": best_val_loss}, global_step=cur_epoch + 1
            )
        cu.save_checkpoint(
            ckpt_dir, state, cur_epoch + 1, cfg, name="checkpoint", fmt=".pt.tar"
        )
        # also keep epoch-indexed checkpoints for AUTO_RESUME
        if cu.is_checkpoint_epoch(cfg, cur_epoch):
            cu.save_checkpoint(ckpt_dir, state, cur_epoch + 1, cfg)
    return state


def slot_eval(cfg):
    """FG-ARI (and mBO) eval (reference steve_eval_net.py:27-133)."""
    mesh_lib.init_distributed(cfg)
    np.random.seed(cfg.RNG_SEED)
    logging.setup_logging(cfg.OUTPUT_DIR)
    logger.info("Test with config:")
    logger.info(cfg.dump())

    mesh = mesh_lib.build_mesh(cfg)
    model = build_model(cfg)
    data_sh = mesh_lib.batch_sharded(mesh)
    eval_loader = data_loader.construct_loader(cfg, "test", sharding=data_sh)
    logger.info(f"Testing model for {len(eval_loader)} iterations")

    sample_video, _ = next(iter(eval_loader))
    state = build_slot_state(cfg, model, mesh, jax.device_get(sample_video))
    state = cu.load_test_checkpoint(cfg, state)
    state = jax.device_put(state, mesh_lib.replicated(mesh))

    encode_step = make_encode_step(model, mesh)
    base_rng = jax.random.PRNGKey(cfg.RNG_SEED)

    fgaris, mbos = [], []
    for batch_idx, (video, true_masks) in enumerate(eval_loader):
        _, _, pred_masks = encode_step(state, video, base_rng)
        pred = np.asarray(jax.device_get(pred_masks))  # [B,T,S,H,W,1]
        true = np.asarray(jax.device_get(true_masks))  # [B,T,S0,H,W,1]
        B = pred.shape[0]
        # drop the background (0th) GT segment, flatten time+space
        true_f = true.transpose(0, 2, 1, 3, 4, 5)[:, 1:].reshape(B, true.shape[2] - 1, -1)
        pred_f = pred.transpose(0, 2, 1, 3, 4, 5).reshape(B, pred.shape[2], -1)
        fgaris.append(100 * metrics.evaluate_ari(true_f, pred_f))
        mbos.append(100 * metrics.evaluate_mbo(true_f, pred_f))
        logger.info(
            f"Done batches {batch_idx + 1}. FG-ARI MEAN = {np.mean(fgaris):.3f} "
            f"STD = {np.std(fgaris):.3f}  mBO MEAN = {np.mean(mbos):.3f}"
        )
    results = {
        "fg_ari": float(np.mean(fgaris)) if fgaris else 0.0,
        "mbo": float(np.mean(mbos)) if mbos else 0.0,
    }
    logging.log_json_stats({"_type": "slot_eval_final", **results})
    return results
