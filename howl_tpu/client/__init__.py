"""Live serving client."""

from howl_tpu.client.howl_client import FileAudioSource, HowlClient, MicrophoneAudioSource

__all__ = ["FileAudioSource", "HowlClient", "MicrophoneAudioSource"]
