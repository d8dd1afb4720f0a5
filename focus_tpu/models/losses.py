"""Loss functions (counterpart of reference ``slowfast/models/losses.py``).

Each loss is ``fn(logits, labels) -> scalar`` over a batch (mean
reduction, like the reference's defaults). Labels may be integer class
ids or soft/one-hot distributions depending on the loss.
"""

import jax
import jax.numpy as jnp
import optax


def cross_entropy(logits, labels):
    if labels.ndim == logits.ndim:  # soft targets
        return soft_target_cross_entropy(logits, labels)
    return optax.softmax_cross_entropy_with_integer_labels(logits, labels).mean()


def bce(probs, labels):
    eps = 1e-7
    probs = jnp.clip(probs, eps, 1 - eps)
    return -(labels * jnp.log(probs) + (1 - labels) * jnp.log(1 - probs)).mean()


def bce_logit(logits, labels):
    return optax.sigmoid_binary_cross_entropy(logits, labels.astype(logits.dtype)).mean()


def soft_target_cross_entropy(logits, soft_targets):
    """(reference losses.py:15-36)"""
    loss = jnp.sum(-soft_targets * jax.nn.log_softmax(logits, axis=-1), axis=-1)
    return loss.mean()


def label_smoothing_cross_entropy(logits, labels, smoothing: float = 0.1):
    """(reference losses.py:39-59)

    Soft (already-mixed/smoothed) labels pass through unchanged: the
    reference recipe smooths inside timm MixUp and then uses
    SoftTargetCrossEntropy, so smoothing must not be applied twice.
    """
    if labels.ndim == logits.ndim:
        return soft_target_cross_entropy(logits, labels)
    n = logits.shape[-1]
    soft = jax.nn.one_hot(labels, n)
    soft = soft * (1.0 - smoothing) + smoothing / n
    return soft_target_cross_entropy(logits, soft)


def ek_loss(preds, labels):
    """Verb+noun composite summed, not averaged, matching the reference
    recipe (reference tools/train_net.py:93-100: loss = verb + noun).
    preds: (first, {'verb','noun'}); labels: {'verb','noun'}."""
    _, out = preds
    lv = cross_entropy(out["verb"], labels["verb"])
    ln = cross_entropy(out["noun"], labels["noun"])
    return lv + ln


_LOSSES = {
    "cross_entropy": cross_entropy,
    "bce": bce,
    "bce_logit": bce_logit,
    "soft_cross_entropy": soft_target_cross_entropy,
    "label_smoothing_cross_entropy": label_smoothing_cross_entropy,
    "EK_loss": ek_loss,
}


def get_loss_func(cfg_or_name):
    name = (
        cfg_or_name
        if isinstance(cfg_or_name, str)
        else cfg_or_name.MODEL.LOSS_FUNC
    )
    if name not in _LOSSES:
        raise NotImplementedError(f"Loss {name} not supported")
    return _LOSSES[name]
