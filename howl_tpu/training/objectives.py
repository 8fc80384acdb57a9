"""Loss functions: frame cross-entropy and CTC.

(ref: training/run/train.py:250-253 — nn.CrossEntropyLoss for the 'frame'
objective, nn.CTCLoss for 'ctc'.)
"""

from __future__ import annotations

import jax.numpy as jnp
import optax


def frame_ce_loss(logits: jnp.ndarray, labels: jnp.ndarray, weights=None) -> jnp.ndarray:
    """Mean CE over (B, L) logits and int labels; optional per-example weights."""
    losses = optax.softmax_cross_entropy_with_integer_labels(logits, labels)
    if weights is not None:
        return (losses * weights).sum() / jnp.maximum(weights.sum(), 1.0)
    return losses.mean()


def ctc_loss(
    logits_tbl: jnp.ndarray,
    logit_lengths: jnp.ndarray,
    labels: jnp.ndarray,
    label_lengths: jnp.ndarray,
    blank_id: int,
) -> jnp.ndarray:
    """CTC over sequential-model outputs.

    logits_tbl: (T, B, L) per-frame logits (the sequential-model layout);
    optax.ctc_loss wants (B, T, L) + padding masks, so adapt here.
    """
    logits = logits_tbl.swapaxes(0, 1)  # (B, T, L)
    t = logits.shape[1]
    logit_paddings = (jnp.arange(t)[None, :] >= logit_lengths[:, None]).astype(jnp.float32)
    u = labels.shape[1]
    label_paddings = (jnp.arange(u)[None, :] >= label_lengths[:, None]).astype(jnp.float32)
    per_seq = optax.ctc_loss(logits, logit_paddings, labels, label_paddings, blank_id=blank_id)
    # torch nn.CTCLoss(reduction='mean') — the reference's loss
    # (ref train.py:253) — divides each sequence's NLL by its target length
    # before averaging, so short and long transcripts contribute equal
    # gradient weight and the tuned LR/decay transfer
    return (per_seq / jnp.maximum(label_lengths, 1)).mean()
