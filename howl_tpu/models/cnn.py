"""Convolutional wake-word classifiers.

Behavioral parity with ref howl/model/cnn.py (res8 :107-145, small-cnn :40,
seq-cnn :70) re-expressed in NHWC for the TPU conv pipeline:

  * time is the H axis, mel frequency the W axis, so AvgPool(3, 4) pools
    (time=3, freq=4) exactly like the reference's permuted layout;
  * BatchNorm is affine-less (no scale/bias) as in the reference, with batch
    stats synchronized across the data axis when an ``axis_name`` is given
    (DP-correct, which the reference never had).
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from howl_tpu.models.base import HowlModel, register_model


@register_model("res8", supports_trunk=True)
class Res8(HowlModel):
    """res8: 1 stem conv + AvgPool + 6 residual 3x3 convs with affine-less
    BatchNorm + global mean + linear head (~111k params; ref cnn.py:107-145).

    Split into ``trunk_features`` (fully-convolutional: everything before the
    global mean) and ``head`` so the streaming engine can run the trunk ONCE
    over a whole clip and derive every sliding window's logits by windowed
    average pooling over the trunk output — removing the ~8x per-window conv
    redundancy of re-scoring 41-frame windows every 5 frames (the residual
    FLOP waste of ref howl/model/inference.py:214-244). Same parameter tree as
    the round-1 compact version (conv0..conv6, bn1..bn6, output)."""

    num_labels: int
    num_maps: int = 45
    pooling: Tuple[int, int] = (3, 4)
    bn_axis_name: Optional[str] = None
    dtype: Any = None  # e.g. jnp.bfloat16 for mixed-precision compute

    def setup(self):
        conv = lambda: nn.Conv(  # noqa: E731
            self.num_maps, (3, 3), padding="SAME", use_bias=False, dtype=self.dtype
        )
        self.conv0 = conv()
        for i in range(1, 7):
            setattr(self, f"conv{i}", conv())
            setattr(
                self,
                f"bn{i}",
                nn.BatchNorm(
                    use_bias=False,
                    use_scale=False,
                    momentum=0.9,
                    dtype=self.dtype,
                    axis_name=self.bn_axis_name,
                ),
            )
        self.output = nn.Dense(self.num_labels)

    def trunk_features(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        """(B, C, F, T) features -> (B, T', F', maps) pre-mean trunk output."""
        return self.residual_features(self.stem_features(x), train=train)

    def stem_features(self, x: jnp.ndarray) -> jnp.ndarray:
        """(B, C, F, T) features -> (B, T', F', maps) pooled stem activations
        (conv0 + relu + avg-pool) — the XLA stem alone, so serving modes that
        replace only the residual stack (ops/int8_trunk.py) can reuse it."""
        x = self._mels_only_nhwc(x)  # (B, T, F, 1)
        if self.dtype is not None:
            x = x.astype(self.dtype)
        y = nn.relu(self.conv0(x))
        return nn.avg_pool(y, self.pooling, strides=self.pooling)

    def residual_features(self, y: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        """Pooled stem activations (B, T', F', maps) -> trunk output. Split
        from ``trunk_features`` so serving can swap the stem for the fused
        Pallas kernel (ops/stem_pallas.py) and feed the same residual stack
        — XLA's conv emitter is already near the 45->128 padding floor on
        these six layers (measured: tools/bench_trunk_kernel_micro.py)."""
        if self.dtype is not None:
            y = y.astype(self.dtype)
        x = old_x = y
        for i in range(1, 7):
            y = nn.relu(getattr(self, f"conv{i}")(x))
            if i % 2 == 0:
                x = y + old_x
                old_x = x
            else:
                x = y
            x = getattr(self, f"bn{i}")(x, use_running_average=not train)
        return x

    def head(self, pooled: jnp.ndarray) -> jnp.ndarray:
        """Mean trunk features (..., maps) -> logits; f32 for stable softmax/CE."""
        return self.output(pooled.astype(jnp.float32))

    # ---- streaming-trunk support (FusedStreamingOnlineEngine) ----
    #
    # The trunk is a causal-with-lookahead stack of 3x3 SAME convs: each
    # layer's output frame t needs the previous layer's frames t-1..t+1, so a
    # live stream can compute ONLY the newly-final frames of every layer each
    # hop by caching a 4-frame ring per stage — the streaming-conv cache —
    # instead of re-convolving the whole 41-frame window per step (the ~3.3x
    # FLOP redundancy the per-window online engines still pay). Residuals add
    # the PRE-BatchNorm sums (old_x in trunk_features), so those sums (r2, r4)
    # are cached alongside the post-BN stage outputs (s0..s5).

    def trunk_intermediates(self, x: jnp.ndarray) -> dict:
        """Full-clip trunk forward that also returns every cached stage:
        s0 (pooled stem), s1..s6 (post-BN outputs), r2/r4 (pre-BN residual
        sums). Used to prefill the streaming-trunk rings so stream startup
        matches the offline clip's left-edge SAME padding exactly."""
        x = self._mels_only_nhwc(x)
        if self.dtype is not None:
            x = x.astype(self.dtype)
        y = nn.relu(self.conv0(x))
        y = nn.avg_pool(y, self.pooling, strides=self.pooling)
        outs = {"s0": y}
        x = old_x = y
        for i in range(1, 7):
            y = nn.relu(getattr(self, f"conv{i}")(x))
            if i % 2 == 0:
                x = y + old_x
                old_x = x
                if i < 6:
                    outs[f"r{i}"] = x
            else:
                x = y
            x = getattr(self, f"bn{i}")(x, use_running_average=True)
            outs[f"s{i}"] = x
        return outs

    @staticmethod
    def _ingest(ring: jnp.ndarray, new: jnp.ndarray, delta: int) -> jnp.ndarray:
        """Shift ``delta`` new frames into a newest-last time ring (axis 1).
        When delta < new frame count, the leading new frames are recomputes of
        frames already in the ring (bit-identical) and are dropped."""
        n_new = new.shape[1]
        if delta == n_new:
            return jnp.concatenate([ring[:, n_new:], new], axis=1)
        return jnp.concatenate([ring[:, delta:], new[:, n_new - delta :]], axis=1)

    def trunk_stream_step(self, mel_slab: jnp.ndarray, rings: dict, delta: int):
        """One streaming-trunk step: compute the n_new newest pooled-trunk
        frames from per-stage 4-frame caches.

        mel_slab: (B, n_new*pool_t + 2, F, 1) ZMUV'd mel frames covering the
        conv0 support of the new pooled frames. rings: dict of
        (B, n_new+2, F', maps) newest-last stage rings (s0..s5, r2, r4).
        delta: how many of the computed frames are genuinely new this step
        (static; the rest are bit-identical recomputes at phase boundaries).

        Returns (updated rings, s6 freq-mean (B, n_new, maps) f32). SAME convs
        run over the slab and the interior frames are sliced out — identical
        values to the full-clip trunk (tests/test_streaming_trunk.py).
        """
        pool_t = self.pooling[0]
        n_new = (mel_slab.shape[1] - 2) // pool_t
        if self.dtype is not None:
            mel_slab = mel_slab.astype(self.dtype)
        y = nn.relu(self.conv0(mel_slab))[:, 1 : 1 + n_new * pool_t]
        y = nn.avg_pool(y, self.pooling, strides=self.pooling)  # (B, n_new, F', maps)
        rings = dict(rings)
        rings["s0"] = self._ingest(rings["s0"], y, delta)
        s6_mean = None
        for i in range(1, 7):
            slab = rings[f"s{i-1}"][:, -(n_new + 2) :]
            y = nn.relu(getattr(self, f"conv{i}")(slab))[:, 1 : 1 + n_new]
            if i % 2 == 0:
                res_src = "s0" if i == 2 else f"r{i-2}"
                x = y + rings[res_src][:, -(n_new + 2) : -2]
                if i < 6:
                    rings[f"r{i}"] = self._ingest(rings[f"r{i}"], x, delta)
            else:
                x = y
            s = getattr(self, f"bn{i}")(x, use_running_average=True)
            if i < 6:
                rings[f"s{i}"] = self._ingest(rings[f"s{i}"], s, delta)
            else:
                s6_mean = s.astype(jnp.float32).mean(axis=2)
        return rings, s6_mean

    def windowed_logits(self, x: jnp.ndarray, span_lo: int, span_hi: int, train: bool = False):
        """Logits for the window covering trunk frames [span_lo, span_hi) of a
        context segment — the trunk-mode TRAINING forward, so train matches
        the fused clip-level serving computation exactly."""
        feats = self.trunk_features(x, train=train)
        return self.head(feats[:, span_lo:span_hi].mean(axis=(1, 2)))

    def __call__(self, x: jnp.ndarray, lengths=None, train: bool = False):
        feats = self.trunk_features(x, train=train)
        return self.head(feats.mean(axis=(1, 2)))  # global average over (time, freq)


@register_model("small-cnn")
class SmallCnn(HowlModel):
    """Two conv encoders + MLP head (ref cnn.py:40-66)."""

    num_labels: int
    num_maps1: int = 48
    num_maps2: int = 64
    num_hidden_input: int = 384
    hidden_size: int = 128
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, lengths=None, train: bool = False):
        x = self._mels_only_nhwc(x)  # (B, T, F, 1)
        if self.dtype is not None:
            x = x.astype(self.dtype)
        # encoder1: conv (8,16) stride (2,2) pad (4,0) -> relu -> maxpool 2 -> BN
        x = nn.Conv(
            self.num_maps1, (8, 16), strides=(2, 2), padding=((4, 4), (0, 0)), dtype=self.dtype, name="conv0"
        )(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = nn.BatchNorm(use_running_average=not train, dtype=self.dtype, name="bn1")(x)
        # encoder2: conv (5,5) stride (2,1) pad 2 -> relu -> maxpool 2 -> BN
        x = nn.Conv(
            self.num_maps2, (5, 5), strides=(2, 1), padding=((2, 2), (2, 2)), dtype=self.dtype, name="conv1"
        )(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = nn.BatchNorm(use_running_average=not train, dtype=self.dtype, name="bn2")(x)
        x = x.reshape(x.shape[0], -1)
        x = nn.relu(nn.Dense(self.hidden_size, dtype=self.dtype, name="fc1")(x))
        x = nn.Dropout(0.1, deterministic=not train)(x)
        return nn.Dense(self.num_labels, name="fc2")(x.astype(jnp.float32))


@register_model("seq-cnn", is_sequential=True)
class SequentialCnn(HowlModel):
    """Per-frame conv encoder for the CTC objective (ref cnn.py:70-104)."""

    num_labels: int
    num_maps1: int = 48
    num_maps2: int = 64
    hidden_size: int = 128
    dtype: Any = None

    def compute_length(self, length):
        length = (length + 2 * 10 - 20) // 1 + 1
        length = length // 2
        length = (length + 2 * 2 - 4 - 1) // 2 + 1
        length = length // 2
        return length

    @nn.compact
    def __call__(self, x: jnp.ndarray, lengths=None, train: bool = False):
        x = self._mels_only_nhwc(x)  # (B, T, F, 1)
        if self.dtype is not None:
            x = x.astype(self.dtype)
        x = nn.Conv(
            self.num_maps1, (20, 16), strides=(1, 2), padding=((10, 10), (0, 0)), dtype=self.dtype, name="conv0"
        )(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = nn.BatchNorm(use_running_average=not train, dtype=self.dtype, name="bn1")(x)
        x = nn.Conv(
            self.num_maps2, (5, 5), strides=(2, 1), padding=((2, 2), (2, 2)), dtype=self.dtype, name="conv1"
        )(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = nn.BatchNorm(use_running_average=not train, dtype=self.dtype, name="bn2")(x)
        # (B, T', F', C) -> (T', B, F'*C) per-frame features
        x = jnp.transpose(x, (1, 0, 2, 3))
        x = x.reshape(x.shape[0], x.shape[1], -1)
        x = nn.relu(nn.Dense(self.hidden_size, dtype=self.dtype, name="fc1")(x))
        x = nn.Dropout(0.1, deterministic=not train)(x)
        return nn.Dense(self.num_labels, name="fc2")(x.astype(jnp.float32))  # (T', B, L)
