"""Recurrent wake-word classifiers: LSTM / seq-LSTM / GRU / LAS.

Behavioral parity with ref howl/model/rnn.py, rebuilt on flax RNN cells so XLA
lowers the recurrence as `lax.scan`:

  * streaming state (the reference's mutable ``model.streaming_state``,
    rnn.py:52-68) is an explicit carry passed in and returned — exactly what
    the batched streaming engine scans over;
  * padded batches use ``seq_lengths`` masking instead of pack_padded_sequence.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from howl_tpu.models.base import HowlModel, register_model


def _mels_time_major_to_batch(x: jnp.ndarray) -> jnp.ndarray:
    """(B, C, F, T) -> (B, T, F) log-mel frames."""
    return x[:, 0].swapaxes(-1, -2)


@register_model("lstm", is_recurrent=True)
class SimpleLstm(HowlModel):
    """LSTM over mel frames; MLP on the final hidden state (ref rnn.py:74-92)."""

    num_labels: int
    hidden_size: int = 128
    dtype: Any = None  # e.g. jnp.bfloat16 for mixed-precision compute

    @nn.compact
    def __call__(self, x, lengths=None, train: bool = False, carry=None, return_carry: bool = False):
        x = _mels_time_major_to_batch(x)  # (B, T, F)
        if self.dtype is not None:
            x = x.astype(self.dtype)
        rnn = nn.RNN(nn.OptimizedLSTMCell(self.hidden_size, dtype=self.dtype), name="lstm")
        kwargs = {}
        if lengths is not None:
            kwargs["seq_lengths"] = lengths
        new_carry, _seq = rnn(x, initial_carry=carry, return_carry=True, **kwargs)
        h = new_carry[1] if isinstance(new_carry, tuple) else new_carry  # LSTM carry = (c, h)
        out = nn.Dense(2 * self.hidden_size, dtype=self.dtype, name="fc1")(h)
        out = nn.relu(out)
        # head + logits in f32 for stable softmax/CE
        out = nn.Dense(self.num_labels, name="fc2")(out.astype(jnp.float32))
        return (out, new_carry) if return_carry else out


@register_model("seq-lstm", is_sequential=True, is_recurrent=True)
class SequentialLstm(HowlModel):
    """LSTM emitting per-frame logits for CTC (ref rnn.py:41-71)."""

    num_labels: int
    hidden_size: int = 128
    dtype: Any = None

    @nn.compact
    def __call__(self, x, lengths=None, train: bool = False, carry=None, return_carry: bool = False):
        x = _mels_time_major_to_batch(x)  # (B, T, F)
        if self.dtype is not None:
            x = x.astype(self.dtype)
        rnn = nn.RNN(nn.OptimizedLSTMCell(self.hidden_size, dtype=self.dtype), name="lstm")
        kwargs = {}
        if lengths is not None:
            kwargs["seq_lengths"] = lengths
        new_carry, seq = rnn(x, initial_carry=carry, return_carry=True, **kwargs)
        out = nn.Dense(2 * self.hidden_size, dtype=self.dtype, name="fc1")(seq)
        out = nn.relu(out)
        out = nn.Dense(self.num_labels, name="fc2")(out.astype(jnp.float32))  # (B, T, L)
        out = out.swapaxes(0, 1)  # (T, B, L) — sequential-model output layout
        return (out, new_carry) if return_carry else out


@register_model("gru", is_recurrent=True)
class SimpleGru(HowlModel):
    """Conv encoder + GRU; MLP on the final hidden state (ref rnn.py:94-129)."""

    num_labels: int
    hidden_size: int = 96
    num_latent_channels: int = 8
    use_maxpool: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x, lengths=None, train: bool = False, carry=None, return_carry: bool = False):
        feats = self._mels_only_nhwc(x)  # (B, T, F, 1)
        if self.dtype is not None:
            feats = feats.astype(self.dtype)
        # conv1 3x3, time pad 3 / freq pad 1 (ref pads (1,3) in (F,T) layout)
        h = nn.Conv(self.num_latent_channels, (3, 3), padding=((3, 3), (1, 1)), dtype=self.dtype, name="conv1")(feats)
        h = nn.BatchNorm(use_running_average=not train, dtype=self.dtype, name="bn1")(h)
        h = nn.relu(h)
        if self.use_maxpool:
            h = nn.max_pool(h, (2, 1), strides=(2, 1))  # halve time
        h = nn.Conv(1, (3, 3), padding="SAME", dtype=self.dtype, name="conv2")(h)
        h = nn.relu(h)
        h = nn.BatchNorm(use_running_average=not train, dtype=self.dtype, name="bn2")(h)
        seq = h[..., 0]  # (B, T', F)
        if lengths is not None:
            lengths = lengths + 4
            if self.use_maxpool:
                lengths = lengths // 2
        rnn = nn.RNN(nn.GRUCell(self.hidden_size, dtype=self.dtype), name="gru")
        kwargs = {}
        if lengths is not None:
            kwargs["seq_lengths"] = lengths
        new_carry, _seq = rnn(seq, initial_carry=carry, return_carry=True, **kwargs)
        out = nn.Dense(2 * self.hidden_size, dtype=self.dtype, name="fc1")(new_carry)
        out = nn.relu(out)
        out = nn.Dropout(0.2, deterministic=not train)(out)
        out = nn.Dense(self.num_labels, name="fc2")(out.astype(jnp.float32))
        return (out, new_carry) if return_carry else out


class LASEncoder(nn.Module):
    """Two padded convs + biLSTM (ref rnn.py:133-168). Consumes all 3 feature
    channels (log-mels, deltas, accels)."""

    hidden_size: int = 96
    num_latent_channels: int = 8
    use_maxpool: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x, lengths=None, train: bool = False):
        feats = jnp.transpose(x, (0, 3, 2, 1))  # (B, C, F, T) -> (B, T, F, C)
        if self.dtype is not None:
            feats = feats.astype(self.dtype)
        h = nn.Conv(self.num_latent_channels, (3, 3), padding=((2, 2), (2, 2)), dtype=self.dtype, name="conv1")(feats)
        h = nn.BatchNorm(use_running_average=not train, dtype=self.dtype, name="bn1")(h)
        h = nn.relu(h)
        if self.use_maxpool:
            h = nn.max_pool(h, (2, 1), strides=(2, 1))
        h = nn.Conv(self.num_latent_channels, (3, 3), padding=((2, 2), (2, 2)), dtype=self.dtype, name="conv2")(h)
        h = nn.BatchNorm(use_running_average=not train, dtype=self.dtype, name="bn2")(h)
        h = nn.relu(h)
        if self.use_maxpool:
            h = nn.max_pool(h, (2, 1), strides=(2, 1))
        # (B, T', F', C) -> (B, T', F'*C) per-frame features for the biLSTM
        seq = h.reshape(h.shape[0], h.shape[1], -1)
        if lengths is not None:
            lengths = (lengths - 3 + 4) // 1 + 1
            if self.use_maxpool:
                lengths = lengths // 2
            lengths = (lengths - 3 + 4) // 1 + 1
            if self.use_maxpool:
                lengths = lengths // 2
        fwd = nn.RNN(nn.OptimizedLSTMCell(self.hidden_size, dtype=self.dtype), name="lstm_fwd")
        bwd = nn.RNN(
            nn.OptimizedLSTMCell(self.hidden_size, dtype=self.dtype),
            name="lstm_bwd",
            reverse=True,
            keep_order=True,
        )
        bi = nn.Bidirectional(fwd, bwd, name="bilstm")
        kwargs = {"seq_lengths": lengths} if lengths is not None else {}
        seq_out = bi(seq, **kwargs)  # (B, T', 2*hidden)
        return seq_out, lengths


class FixedAttentionModule(nn.Module):
    """Multi-head attention against a learned context vector (ref rnn.py:171-192)."""

    hidden_size: int = 96
    num_heads: int = 4

    @nn.compact
    def __call__(self, seq, mask=None):
        # seq: (B, T, 2H)
        dim = 2 * self.hidden_size
        context = self.param(
            "context_vec", lambda key, shape: jax.random.uniform(key, shape, jnp.float32, -0.25, 0.25), (dim,)
        )
        values = nn.Dense(dim, name="v_proj")(seq)
        keys = nn.Dense(dim, name="k_proj")(seq)
        B, T = seq.shape[0], seq.shape[1]
        head_dim = dim // self.num_heads
        values = values.reshape(B, T, self.num_heads, head_dim)
        keys = keys.reshape(B, T, self.num_heads, head_dim)
        cvec = context.reshape(head_dim, self.num_heads)
        logits = jnp.einsum("bthl,lh->bth", values, cvec)  # score per (time, head)
        if mask is not None:
            logits = logits + ((1.0 - mask) * -100.0)[..., None]
        scores = jax.nn.softmax(logits, axis=1)  # over time
        vec = jnp.einsum("bth,bthl->bhl", scores, keys)
        return vec.reshape(B, dim)


@register_model("las", uses_deltas=True)
class LASClassifier(HowlModel):
    """LAS encoder + fixed attention + MLP head (ref rnn.py:194-222)."""

    num_labels: int
    hidden_size: int = 96
    num_latent_channels: int = 8
    dnn_size: int = 256
    dropout: float = 0.1
    use_maxpool: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x, lengths=None, train: bool = False):
        seq, out_lengths = LASEncoder(
            self.hidden_size, self.num_latent_channels, self.use_maxpool, dtype=self.dtype, name="encoder"
        )(x, lengths, train)
        # attention softmax + head in f32 for numerical stability
        seq = seq.astype(jnp.float32)
        mask = None
        if out_lengths is not None:
            T = seq.shape[1]
            mask = (jnp.arange(T)[None, :] < out_lengths[:, None]).astype(seq.dtype)
        context = FixedAttentionModule(self.hidden_size, name="attn")(seq, mask)
        h = nn.relu(nn.Dense(self.dnn_size, name="fc1")(context))
        h = nn.Dropout(self.dropout, deterministic=not train)(h)
        return nn.Dense(self.num_labels, name="fc2")(h)


