"""Offline dataset-generation ETL: mine corpora, attach alignments, stitch wakewords."""

from howl_tpu.etl.aligned_generator import AlignedAudioDatasetGenerator, AlignmentType
from howl_tpu.etl.raw_generator import RawAudioDatasetGenerator
from howl_tpu.etl.stitched_generator import StitchedAudioDatasetGenerator
from howl_tpu.etl.stitcher import WordStitcher

__all__ = [
    "AlignedAudioDatasetGenerator",
    "AlignmentType",
    "RawAudioDatasetGenerator",
    "StitchedAudioDatasetGenerator",
    "WordStitcher",
]
