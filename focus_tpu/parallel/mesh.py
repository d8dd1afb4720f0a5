"""Device mesh construction and sharding helpers.

TPU-native replacement for the reference's process-group machinery
(reference ``slowfast/utils/distributed.py``, ``multiprocessing.py``): one
process per host, a ``Mesh`` over all chips with a ``data`` axis (DP) and
an optional ``model`` axis for TPU-only model sharding. Gradient psum is
inserted by XLA from the sharding annotations — there is no DDP wrapper.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from focus_tpu.utils import logging

logger = logging.get_logger(__name__)

DATA_AXIS = "data"
MODEL_AXIS = "model"
SEQ_AXIS = "seq"
PIPE_AXIS = "pipe"
EXPERT_AXIS = "expert"


def init_distributed(cfg) -> None:
    """Multi-host init (reference mpu.run/init_process_group). On a single
    host this is a no-op; on pods, call before any jax usage."""
    if cfg.NUM_SHARDS > 1 and jax.process_count() == 1:
        import jax.distributed

        jax.distributed.initialize()


def build_mesh(cfg=None, devices=None) -> Mesh:
    """Mesh with ('data', 'model') axes.

    Device selection follows the reference's NUM_GPUS semantics
    (reference multiprocessing.py:45-57 spawns exactly NUM_GPUS
    processes per machine): on a single host, a config asking for fewer
    devices than are attached uses only that many; asking for more than
    exist falls back to all local devices (the common case when running
    an 8-GPU YAML on a 1-chip host). Multi-host runs always use the full
    global device set — per-host counts are fixed by the slice topology.
    """
    if devices is None:
        if cfg is not None and jax.process_count() == 1:
            local = jax.local_devices()
            want = int(cfg.NUM_GPUS)
            if 0 < want < len(local):
                devices = local[:want]
            else:
                if want > len(local):
                    logger.warning(
                        f"NUM_GPUS={want} > {len(local)} local devices; "
                        f"using all {len(local)}"
                    )
                devices = local
        else:
            devices = jax.devices()
    devices = np.asarray(devices)
    model, seq, pipe, expert = 1, 1, 1, 1
    if cfg is not None:
        model = max(int(cfg.TPU.MESH.MODEL), 1)
        seq = max(int(getattr(cfg.TPU.MESH, "SEQ", 1)), 1)
        pipe = max(int(getattr(cfg.TPU.MESH, "PIPE", 1)), 1)
        expert = max(int(getattr(cfg.TPU.MESH, "EXPERT", 1)), 1)
    n = devices.size
    assert not (seq > 1 and pipe > 1), (
        "sequence and pipeline parallelism each compose with data/model "
        "axes but not with each other (shard_tokens' token constraint "
        "conflicts with the pipeline microbatch layout)"
    )
    denom = model * seq * pipe * expert
    assert n % denom == 0, (
        f"{n} devices not divisible by model axis {model} x seq axis {seq}"
        f" x pipe axis {pipe} x expert axis {expert}"
    )
    grid = devices.reshape(n // denom, pipe, seq, model, expert)
    return Mesh(grid, (DATA_AXIS, PIPE_AXIS, SEQ_AXIS, MODEL_AXIS,
                       EXPERT_AXIS))


def has_seq_axis(mesh: Mesh) -> bool:
    return dict(mesh.shape).get(SEQ_AXIS, 1) > 1


def has_pipe_axis(mesh: Mesh) -> bool:
    return dict(mesh.shape).get(PIPE_AXIS, 1) > 1


def shard_pipeline_state(x):
    """Constrain a [stages, microbatch, ...] pipeline buffer to
    (pipe, data, ...) sharding so each pipeline stage's activations live
    on that stage's devices (models/motionformer.py PipelinedTrajBlocks).
    No-op outside a mesh context or when the mesh has no pipe axis."""
    ctx = jax.sharding.get_abstract_mesh()
    if ctx is None or ctx.empty or PIPE_AXIS not in ctx.shape:
        return x
    spec = P(PIPE_AXIS, DATA_AXIS, *([None] * (x.ndim - 2)))
    return jax.lax.with_sharding_constraint(x, spec)


def shard_tokens(x):
    """Constrain a [B, N, C] token tensor to (data, seq, -) sharding —
    the sequence-parallel activation layout (LN/MLP/projections run
    token-sharded; GSPMD inserts the k/v all-gathers attention needs).
    Requires an active mesh context (``with mesh:``) at trace time; the
    jitted steps from engine/trainer.py provide it when the mesh has a
    seq axis. Outside a mesh context (e.g. parameter init, single-chip
    serving of an sp-configured checkpoint) the constraint is a no-op."""
    ctx = jax.sharding.get_abstract_mesh()
    if ctx is None or ctx.empty or SEQ_AXIS not in ctx.shape:
        return x
    return jax.lax.with_sharding_constraint(x, P(DATA_AXIS, SEQ_AXIS, None))


def has_expert_axis(mesh: Mesh) -> bool:
    return dict(mesh.shape).get(EXPERT_AXIS, 1) > 1


def has_param_sharding(mesh: Mesh, zero1: bool = False) -> bool:
    """True when state_shardings produces non-replicated placements —
    any of the model/pipe/expert axes is active, or ZeRO-1 moments over
    a >1 data axis. Callers that pin the TrainState sharding through jit
    must do so exactly when this holds (a plain replicated-state mesh
    keeps the unpinned signature)."""
    shape = dict(mesh.shape)
    return (
        shape.get(MODEL_AXIS, 1) > 1
        or shape.get(PIPE_AXIS, 1) > 1
        or shape.get(EXPERT_AXIS, 1) > 1
        or (zero1 and shape.get(DATA_AXIS, 1) > 1)
    )


def shard_expert_acts(x):
    """Constrain a [B, E, cap, ...] expert-dispatched activation tensor
    to (data, expert, ...) sharding — each device group runs its own
    experts; GSPMD inserts the token all-to-alls at the dispatch/combine
    einsums (models/moe.py). No-op outside a mesh context or when the
    mesh has no expert axis."""
    ctx = jax.sharding.get_abstract_mesh()
    if ctx is None or ctx.empty or EXPERT_AXIS not in ctx.shape:
        return x
    spec = P(DATA_AXIS, EXPERT_AXIS, *([None] * (x.ndim - 2)))
    return jax.lax.with_sharding_constraint(x, spec)


def mesh_context(fn, mesh: Mesh):
    """Wrap a jitted step so bare-PartitionSpec sharding constraints
    (shard_tokens, shard_pipeline_state, shard_expert_acts) can resolve
    the mesh at trace time. Identity when no seq/pipe/expert axis is
    active."""
    if (not has_seq_axis(mesh) and not has_pipe_axis(mesh)
            and not has_expert_axis(mesh)):
        return fn

    import functools

    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        with jax.set_mesh(mesh):
            return fn(*args, **kwargs)

    return wrapped


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharded(mesh: Mesh) -> NamedSharding:
    """Leading axis split over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def shard_batch(mesh: Mesh, tree):
    """Device-put a host batch with the batch axis sharded."""
    sh = batch_sharded(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)


# Megatron-style tensor-parallel placement for transformer dense layers
# (a TPU extension; the reference is DDP-only). Expanding projections are
# column-parallel (output dim sharded), their consumers row-parallel
# (input dim sharded) — XLA's GSPMD inserts the single per-block psum.
# Module names are matched exactly against flax path components, so
# `proj` does not catch `proj_q`/`proj_kv` (those feed the trajectory
# kernel and stay replicated).
_COL_PARALLEL = {"qkv", "fc1"}
_ROW_PARALLEL = {"proj", "fc2"}


def _param_spec(path, leaf, model_size: int, pipe_size: int,
                expert_size: int = 1):
    names = [getattr(p, "key", getattr(p, "name", None)) for p in path]
    ndim = getattr(leaf, "ndim", 0)
    spec = [None] * ndim
    # pipeline-parallel stacks carry a leading [stages, ...] axis
    # (PipelinedTrajBlocks names its stage vmap 'pipe_stages')
    if pipe_size > 1 and "pipe_stages" in names and ndim >= 1:
        if leaf.shape[0] == pipe_size:
            spec[0] = PIPE_AXIS
    # MoE expert stacks (models/moe.py _Experts): the expert dim sits at
    # -3 of kernels / -2 of biases under any scan/pipeline wrapping
    if expert_size > 1 and "experts" in names and names:
        leaf_name = names[-1]
        if leaf_name.startswith("kernel") and ndim >= 3:
            if leaf.shape[-3] % expert_size == 0:
                spec[-3] = EXPERT_AXIS
        elif leaf_name.startswith("bias") and ndim >= 2:
            if leaf.shape[-2] % expert_size == 0:
                spec[-2] = EXPERT_AXIS
    if model_size > 1:
        col = any(n in _COL_PARALLEL for n in names)
        row = any(n in _ROW_PARALLEL for n in names)
        is_kernel = names and names[-1] == "kernel"
        is_bias = names and names[-1] == "bias"
        # kernels: 2D dense, 3D scanned-stack ([layers, in, out]) or 4D
        # pipelined stack ([stages, layers, in, out]) — conv kernels
        # (patch embed 'proj') stay replicated
        if col and is_kernel and 2 <= ndim <= 4:
            if leaf.shape[-1] % model_size == 0:
                spec[-1] = MODEL_AXIS
        elif col and is_bias and 1 <= ndim <= 3:
            if leaf.shape[-1] % model_size == 0:
                spec[-1] = MODEL_AXIS
        elif row and is_kernel and 2 <= ndim <= 4:
            if leaf.shape[-2] % model_size == 0:
                spec[-2] = MODEL_AXIS
    if not any(spec):
        return P()
    return P(*spec)


def _zero1_spec(spec: P, leaf, dp_size: int) -> P:
    """Add DATA_AXIS to the first unsharded dim divisible by the data-axis
    size. Optimizer moments are updated elementwise, so any split is
    valid; indivisible leaves (and scalars like the adam count) stay
    replicated."""
    ndim = getattr(leaf, "ndim", 0)
    spec = list(spec) + [None] * (ndim - len(spec))
    for d in range(ndim):
        if spec[d] is None and leaf.shape[d] % dp_size == 0 and leaf.shape[d] > 0:
            spec[d] = DATA_AXIS
            return P(*spec)
    return P(*spec) if any(spec) else P()


def state_shardings(mesh: Mesh, state, zero1: bool = False):
    """Per-leaf NamedShardings for a TrainState: tensor-parallel specs on
    the recognised dense layers and pipeline-stage specs on pipelined
    stacks (params AND their optimizer moments — the rules match path
    suffixes, which the adamw mu/nu trees share), replicated elsewhere.

    ``zero1`` (TPU.ZERO1, a TPU extension — the reference's DDP keeps full
    optimizer state per GPU): additionally shard every ``opt_state`` leaf
    over the data axis. GSPMD then emits the ZeRO-1 schedule — each
    data-parallel group updates a 1/dp slice of the adamw moments and
    all-gathers the new params — cutting optimizer memory per device by
    the data-axis size at the cost of one params all-gather per step."""
    model_size = mesh.shape[MODEL_AXIS]
    pipe_size = dict(mesh.shape).get(PIPE_AXIS, 1)
    expert_size = dict(mesh.shape).get(EXPERT_AXIS, 1)
    dp_size = dict(mesh.shape).get(DATA_AXIS, 1)
    zero1 = zero1 and dp_size > 1
    if model_size <= 1 and pipe_size <= 1 and expert_size <= 1 and not zero1:
        return replicated(mesh)

    def leaf_sharding(path, leaf, in_opt_state):
        spec = _param_spec(path, leaf, model_size, pipe_size, expert_size)
        if zero1 and in_opt_state:
            spec = _zero1_spec(spec, leaf, dp_size)
        return NamedSharding(mesh, spec)

    if not zero1:
        return jax.tree_util.tree_map_with_path(
            lambda path, leaf: leaf_sharding(path, leaf, False), state
        )
    opt_sh = jax.tree_util.tree_map_with_path(
        lambda path, leaf: leaf_sharding(path, leaf, True), state.opt_state
    )
    rest = jax.tree_util.tree_map_with_path(
        lambda path, leaf: leaf_sharding(path, leaf, False), state
    )
    return rest.replace(opt_state=opt_sh)
