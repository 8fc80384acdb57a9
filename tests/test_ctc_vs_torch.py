"""Differential test: howl_tpu's CTC objective vs the ACTUAL torch nn.CTCLoss.

The reference trains its sequential models with ``nn.CTCLoss(ctx.blank_label)``
(ref training/run/train.py:250-253); ``howl_tpu.training.objectives.ctc_loss``
builds on optax.ctc_loss and re-implements torch's ``reduction='mean'``
normalization (per-sequence NLL divided by target length, then batch mean) so
the reference recipes' tuned LR/decay transfer. Until now that normalization —
and the blank/padding conventions feeding it — was asserted only in a
docstring; torch is importable in this container, so pin it differentially:
values AND gradients, across ragged logit/label lengths, repeated labels,
non-zero blank ids, and single-label targets.
"""

from __future__ import annotations

import numpy as np
import pytest

from howl_tpu.training.objectives import ctc_loss


def _torch_ctc(logits, logit_lengths, labels, label_lengths, blank_id):
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    t = torch.from_numpy(logits).double().requires_grad_(True)
    log_probs = F.log_softmax(t, dim=-1)  # (T, B, L)
    loss = torch.nn.CTCLoss(blank=blank_id, reduction="mean")(
        log_probs,
        torch.from_numpy(labels),
        torch.from_numpy(logit_lengths),
        torch.from_numpy(label_lengths),
    )
    loss.backward()
    return float(loss.detach()), t.grad.numpy()


def _jax_ctc(logits, logit_lengths, labels, label_lengths, blank_id):
    import jax
    import jax.numpy as jnp

    def f(lg):
        return ctc_loss(lg, jnp.asarray(logit_lengths), jnp.asarray(labels),
                        jnp.asarray(label_lengths), blank_id)

    val, grad = jax.value_and_grad(f)(jnp.asarray(logits))
    return float(val), np.asarray(grad)


def _random_case(rng, t_max, batch, num_labels, blank_id, u_max):
    """Random ragged CTC batch; targets avoid blank and satisfy the
    CTC feasibility bound (T >= U + repeats)."""
    logits = rng.standard_normal((t_max, batch, num_labels)).astype(np.float32)
    logit_lengths = rng.integers(max(2 * u_max, 4), t_max + 1, batch).astype(np.int32)
    label_lengths = rng.integers(1, u_max + 1, batch).astype(np.int32)
    non_blank = np.array([l for l in range(num_labels) if l != blank_id])
    labels = non_blank[rng.integers(0, len(non_blank), (batch, u_max))].astype(np.int32)
    # zero out padding positions (torch ignores them via target_lengths; optax
    # via label_paddings — keep the padded values inert either way)
    pad = np.arange(u_max)[None, :] >= label_lengths[:, None]
    labels[pad] = non_blank[0]
    return logits, logit_lengths, labels, label_lengths


@pytest.mark.parametrize("blank_id", [0, 3])
def test_ctc_matches_torch_values_and_grads(rng, blank_id):
    logits, logit_lengths, labels, label_lengths = _random_case(
        rng, t_max=24, batch=6, num_labels=4, blank_id=blank_id, u_max=5
    )
    ref_val, ref_grad = _torch_ctc(logits, logit_lengths, labels, label_lengths, blank_id)
    got_val, got_grad = _jax_ctc(logits, logit_lengths, labels, label_lengths, blank_id)

    assert got_val == pytest.approx(ref_val, rel=1e-5)
    # torch's 'mean' gradient divides by target length exactly as the value
    # does; padded logit frames past each logit_length get zero gradient in
    # both implementations
    np.testing.assert_allclose(got_grad, ref_grad, rtol=1e-4, atol=1e-6)
    t_pad = np.arange(logits.shape[0])[:, None] >= logit_lengths[None, :]
    assert np.all(got_grad[t_pad] == 0.0)


def test_ctc_matches_torch_repeats_and_short_targets(rng):
    """Repeated labels force the blank-separated path; U=1 everywhere hits the
    shortest alignment lattice."""
    blank_id = 2
    logits = rng.standard_normal((12, 4, 3)).astype(np.float32)
    logit_lengths = np.array([12, 9, 7, 5], np.int32)
    labels = np.array([[1, 1, 1], [0, 0, 1], [1, 0, 0], [0, 0, 0]], np.int32)
    label_lengths = np.array([3, 2, 1, 1], np.int32)
    ref_val, ref_grad = _torch_ctc(logits, logit_lengths, labels, label_lengths, blank_id)
    got_val, got_grad = _jax_ctc(logits, logit_lengths, labels, label_lengths, blank_id)
    assert got_val == pytest.approx(ref_val, rel=1e-5)
    np.testing.assert_allclose(got_grad, ref_grad, rtol=1e-4, atol=1e-6)


def test_ctc_full_length_no_padding(rng):
    """Dense case: every sequence uses the whole time axis and label buffer."""
    blank_id = 0
    logits = rng.standard_normal((16, 3, 5)).astype(np.float32)
    logit_lengths = np.full(3, 16, np.int32)
    labels = rng.integers(1, 5, (3, 6)).astype(np.int32)
    label_lengths = np.full(3, 6, np.int32)
    ref_val, _ = _torch_ctc(logits, logit_lengths, labels, label_lengths, blank_id)
    got_val, _ = _jax_ctc(logits, logit_lengths, labels, label_lengths, blank_id)
    assert got_val == pytest.approx(ref_val, rel=1e-5)
