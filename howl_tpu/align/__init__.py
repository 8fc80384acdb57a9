"""Forced-alignment providers (ref: training/align/)."""

from howl_tpu.align.base import AlignedTranscription, Aligner
from howl_tpu.align.mfa import MfaTextGridConverter
from howl_tpu.align.stub import StubAligner
from howl_tpu.align.textgrid import TextGrid, TextGridInterval
from howl_tpu.align.vad import LeftRightVadAligner

__all__ = [
    "AlignedTranscription",
    "Aligner",
    "LeftRightVadAligner",
    "MfaTextGridConverter",
    "StubAligner",
    "TextGrid",
    "TextGridInterval",
]
