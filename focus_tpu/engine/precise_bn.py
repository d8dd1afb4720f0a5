"""Precise-BN: recompute BN running statistics over the train set
(counterpart of fvcore's update_bn_stats used by reference
``tools/train_net.py:716-728``).

Each batch's *instantaneous* statistics are recovered from flax's
momentum update (cur = (new - m*old) / (1-m)) and averaged with equal
weight across NUM_BATCHES_PRECISE batches.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from focus_tpu.utils import logging

logger = logging.get_logger(__name__)

_BN_MOMENTUM = 0.9  # matches focus_tpu.models.norms defaults


def compute_precise_bn_stats(model, state, loader, num_batches, split_batch_fn):
    """Returns state with batch_stats replaced by precise averages."""
    if state.batch_stats is None:
        return state

    @jax.jit
    def forward_collect(params, batch_stats, video, metadata):
        variables = {"params": params, "batch_stats": batch_stats}
        _, new_vars = model.apply(
            variables, video, metadata, train=True, mutable=["batch_stats"],
            rngs={"dropout": jax.random.PRNGKey(0)},
        )
        return new_vars["batch_stats"]

    running = None
    count = 0
    old = state.batch_stats
    for i, batch in enumerate(loader):
        if i >= num_batches:
            break
        video, _, metadata = split_batch_fn(batch)
        new = forward_collect(state.params, old, video, metadata)
        # instantaneous stats of this batch
        cur = jax.tree_util.tree_map(
            lambda n, o: (n - _BN_MOMENTUM * o) / (1.0 - _BN_MOMENTUM), new, old
        )
        running = cur if running is None else jax.tree_util.tree_map(
            jnp.add, running, cur
        )
        old = new
        count += 1
    if count == 0:
        return state
    precise = jax.tree_util.tree_map(lambda x: x / count, running)
    logger.info(f"Precise BN stats computed over {count} batches")
    return state.replace(batch_stats=precise)
