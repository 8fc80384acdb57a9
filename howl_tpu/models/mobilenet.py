"""MobileNetV2-style classifier.

Capability parity with the reference's torchvision-backed model
(ref: howl/model/cnn.py:15-29: 1->3 channel downsample conv + MobileNetV2 +
replaced classifier head). torchvision's ImageNet-pretrained weights have no
TPU-native analog, so this is the same architecture trained from scratch
(documented gap; see SURVEY.md §7 risks).
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from howl_tpu.models.base import HowlModel, register_model

# (expansion t, output channels c, repeats n, stride s) — MobileNetV2 paper table 2
_V2_CONFIG: Sequence[Tuple[int, int, int, int]] = (
    (1, 16, 1, 1),
    (6, 24, 2, 2),
    (6, 32, 3, 2),
    (6, 64, 4, 2),
    (6, 96, 3, 1),
    (6, 160, 3, 2),
    (6, 320, 1, 1),
)


class InvertedResidual(nn.Module):
    out_channels: int
    stride: int
    expand_ratio: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_ch = x.shape[-1]
        hidden = in_ch * self.expand_ratio
        use_residual = self.stride == 1 and in_ch == self.out_channels
        h = x
        if self.expand_ratio != 1:
            h = nn.Conv(hidden, (1, 1), use_bias=False, dtype=self.dtype)(h)
            h = nn.BatchNorm(use_running_average=not train, dtype=self.dtype)(h)
            h = nn.relu6(h)
        h = nn.Conv(
            hidden,
            (3, 3),
            strides=(self.stride, self.stride),
            padding="SAME",
            feature_group_count=hidden,
            use_bias=False,
            dtype=self.dtype,
        )(h)
        h = nn.BatchNorm(use_running_average=not train, dtype=self.dtype)(h)
        h = nn.relu6(h)
        h = nn.Conv(self.out_channels, (1, 1), use_bias=False, dtype=self.dtype)(h)
        h = nn.BatchNorm(use_running_average=not train, dtype=self.dtype)(h)
        return x + h if use_residual else h


@register_model("mobilenet")
class MobileNetClassifier(HowlModel):
    """Downsample stem + MobileNetV2 trunk + dropout classifier head."""

    num_labels: int
    width_mult: float = 1.0
    dropout: float = 0.2
    dtype: Any = None

    @nn.compact
    def __call__(self, x, lengths=None, train: bool = False):
        h = self._mels_only_nhwc(x)  # (B, T, F, 1)
        if self.dtype is not None:
            h = h.astype(self.dtype)
        # stem parity with ref downsample: 1->3ch conv + BN + ReLU + time
        # maxpool. Reference pads (F=1, T=3) on NCHW (ref cnn.py:18); in this
        # NHWC (B, T, F, 1) layout that is ((3,3),(1,1)) — same pattern as
        # SimpleGru (rnn.py:95)
        h = nn.Conv(3, (3, 3), padding=((3, 3), (1, 1)), dtype=self.dtype, name="downsample")(h)
        h = nn.BatchNorm(use_running_average=not train, dtype=self.dtype, name="downsample_bn")(h)
        h = nn.relu(h)
        h = nn.max_pool(h, (2, 1), strides=(2, 1))
        # MobileNetV2 trunk
        ch = max(8, int(32 * self.width_mult))
        h = nn.Conv(ch, (3, 3), strides=(2, 2), padding="SAME", use_bias=False, dtype=self.dtype, name="stem")(h)
        h = nn.BatchNorm(use_running_average=not train, dtype=self.dtype, name="stem_bn")(h)
        h = nn.relu6(h)
        for t, c, n, s in _V2_CONFIG:
            out_c = max(8, int(c * self.width_mult))
            for i in range(n):
                h = InvertedResidual(out_c, s if i == 0 else 1, t, dtype=self.dtype)(h, train=train)
        last = max(8, int(1280 * self.width_mult))
        h = nn.Conv(last, (1, 1), use_bias=False, dtype=self.dtype, name="head_conv")(h)
        h = nn.BatchNorm(use_running_average=not train, dtype=self.dtype, name="head_bn")(h)
        h = nn.relu6(h)
        h = h.mean(axis=(1, 2))
        h = nn.Dropout(self.dropout, deterministic=not train)(h)
        # head + logits in f32 for stable softmax/CE
        return nn.Dense(self.num_labels, name="classifier")(h.astype(jnp.float32))
