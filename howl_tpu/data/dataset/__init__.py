"""Datasets: metadata containers, corpus loaders, writers."""

from howl_tpu.data.dataset.dataset import (
    AudioClassificationDataset,
    AudioClipDataset,
    AudioDataset,
    DatasetSplit,
    DatasetType,
    WakeWordDataset,
)
from howl_tpu.data.dataset.dataset_loader import (
    AudioClipDatasetLoader,
    RecursiveNoiseDatasetLoader,
    RegisteredPathDatasetLoader,
    WakeWordDatasetLoader,
)
from howl_tpu.data.dataset.gsc_loader import GoogleSpeechCommandsDatasetLoader

__all__ = [
    "AudioClassificationDataset",
    "AudioClipDataset",
    "AudioClipDatasetLoader",
    "AudioDataset",
    "DatasetSplit",
    "DatasetType",
    "GoogleSpeechCommandsDatasetLoader",
    "RecursiveNoiseDatasetLoader",
    "RegisteredPathDatasetLoader",
    "WakeWordDataset",
]
