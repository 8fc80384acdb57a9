"""Live wake-word client (ref: howl/client/howl_client.py:14-164).

Same cadence contract as the reference: 16 kHz mono int16, 500-sample chunks,
a ring buffer re-scored every 2 chunks (62.5 ms hop), duplicate-fire
suppression, and user listener callbacks. The ring is sized from the engine's
scoring window (the reference hardcodes 16 chunks = 500 ms).

The audio source is pluggable: ``MicrophoneAudioSource`` uses pyaudio when
available (a native PortAudio binding, like the reference); ``FileAudioSource``
replays WAV files for tests/offline use; any iterator of int16 byte chunks
works.
"""

from __future__ import annotations

import time
from pathlib import Path
from typing import Callable, Iterable, Iterator, List, Optional

import numpy as np

from howl_tpu.utils import audio_utils
from howl_tpu.utils.logger import Logger


class MicrophoneAudioSource:
    """PortAudio microphone stream -> int16 chunks (requires pyaudio)."""

    def __init__(self, sample_rate: int = 16000, chunk_size: int = 500):
        self.sample_rate = sample_rate
        self.chunk_size = chunk_size
        self._audio = None
        self._stream = None

    def __iter__(self) -> Iterator[bytes]:
        try:
            import pyaudio
        except ImportError as e:
            raise RuntimeError(
                "pyaudio is not installed; use FileAudioSource or provide your own chunk iterator"
            ) from e
        self._audio = pyaudio.PyAudio()
        chosen_idx = 0
        for idx in range(self._audio.get_device_count()):
            info = self._audio.get_device_info_by_index(idx)
            if info["name"] in ("pulse", "sysdefault"):
                chosen_idx = idx
                break
        self._stream = self._audio.open(
            format=pyaudio.paInt16,
            channels=1,
            rate=self.sample_rate,
            input=True,
            input_device_index=chosen_idx,
            frames_per_buffer=self.chunk_size,
        )
        while True:
            yield self._stream.read(self.chunk_size, exception_on_overflow=False)

    def close(self):
        if self._stream is not None:
            self._stream.stop_stream()
            self._stream.close()
        if self._audio is not None:
            self._audio.terminate()


class FileAudioSource:
    """Replays WAV file(s) as int16 chunks (for tests and offline runs)."""

    def __init__(self, paths, sample_rate: int = 16000, chunk_size: int = 500, realtime: bool = False):
        self.paths = [paths] if isinstance(paths, (str, Path)) else list(paths)
        self.sample_rate = sample_rate
        self.chunk_size = chunk_size
        self.realtime = realtime

    def __iter__(self) -> Iterator[bytes]:
        for path in self.paths:
            audio = audio_utils.silent_load(path, self.sample_rate)
            pcm = np.clip(audio * 32768.0, -32768, 32767).astype("<i2")
            for start in range(0, len(pcm) - self.chunk_size + 1, self.chunk_size):
                if self.realtime:
                    time.sleep(self.chunk_size / self.sample_rate)
                yield pcm[start : start + self.chunk_size].tobytes()

    def close(self):
        pass


def _reject_blocked(engine):
    """The client serves the live per-hop cadence (one chunk group per
    inference, ref howl_client.py:85-94); hop-blocked engines expect
    hop_block*hop_samples per push and would crash mid-stream. Reject at
    construction instead."""
    if engine is not None and getattr(engine, "hop_block", 1) > 1:
        raise ValueError(
            "HowlClient serves per-hop; hop-blocked engines (hop_block="
            f"{engine.hop_block}) are the bulk/capacity mode — load the "
            "workspace with hop_block=1 for live client serving"
        )
    return engine


class HowlClient:
    """Wake-word serving loop over an OnlineEngine.

    Usage::

        client = HowlClient.from_workspace("workspaces/hey-ff", "res8")
        client.add_listener(lambda words: print("detected:", words))
        client.start().join()
    """

    def __init__(
        self,
        engine=None,
        context=None,
        source: Optional[Iterable[bytes]] = None,
        chunk_size: int = 500,
    ):
        self.engine = _reject_blocked(engine)
        self.ctx = context
        self.source = source
        self.chunk_size = chunk_size
        self.listeners: List[Callable] = []
        self._infer_detected = False
        self._running = False
        self.detections = 0
        # the ring is sized lazily from the ENGINE's window (the reference
        # hardcodes 16 x 500 = 500 ms, howl_client.py:47; a workspace trained
        # with the default 0.75 s window would then get every scoring window
        # silently left-padded with 250 ms of fabricated silence)
        self._ring = None
        self._audio_buf_len = None
        self._chunks_since_infer = 0
        self._chunks_total = 0

    def _ensure_ring(self):
        """Create the native SPSC PCM ring once the engine is known: capacity
        covers the engine's scoring window (falls back to the reference's 16
        chunks for engines that expose no window). Falls back to numpy when
        no C++ toolchain is available."""
        if self._ring is not None:
            return
        window = getattr(self.engine, "window_samples", None) or self.chunk_size * 16
        self._audio_buf_len = max(-(-window // self.chunk_size), 1)
        from howl_tpu.native import NativeRingBuffer

        self._ring = NativeRingBuffer(capacity=self.chunk_size * self._audio_buf_len * 4)

    # ---- construction ----

    @classmethod
    def from_workspace(
        cls,
        workspace_path,
        model_name: str = None,
        source=None,
        incremental: bool = False,
        streaming_trunk: bool = False,
        **kwargs,
    ) -> "HowlClient":
        from howl_tpu.hub import load_workspace_engine

        engine, ctx = load_workspace_engine(
            workspace_path, model_name, incremental=incremental, streaming_trunk=streaming_trunk
        )
        return cls(engine=engine, context=ctx, source=source, **kwargs)

    def from_pretrained(self, name: str, models_path=None):
        """Load a published pretrained model by name (ref howl_client.py:148).

        Models resolve from ``models_path`` or $HOWL_MODELS_PATH — a checkout
        of a howl-models-style repository of workspaces.
        """
        from howl_tpu.hub import load_pretrained

        engine, self.ctx = load_pretrained(name, models_path)
        self.engine = _reject_blocked(engine)
        return self

    def add_listener(self, listener: Callable):
        self.listeners.append(listener)
        return self

    # ---- the loop ----

    def ingest_chunk(self, chunk: bytes) -> bool:
        """Feed one chunk; runs inference every 2 chunks once the buffer fills
        (exact reference cadence, howl_client.py:85-94). Returns True when the
        wakeword fired on this hop."""
        self._ensure_ring()
        self._ring.push_int16(chunk)
        self._chunks_total += 1
        self._chunks_since_infer += 1
        # Incremental/FusedStreaming engines own their feature state and take
        # only the new hop's samples
        incremental = hasattr(self.engine, "push")
        if incremental:
            # the engine keeps its own feature ring; hand it only the new
            # hop's samples, from the first hop on (its ring starts as silence)
            hop = self.engine.hop_samples
            if hop % self.chunk_size:
                raise ValueError(
                    f"chunk_size={self.chunk_size} must divide the incremental engine's "
                    f"hop ({hop} samples); non-divisible chunks would hand the engine "
                    "short or overlapping windows"
                )
            hop_chunks = hop // self.chunk_size
            if self._chunks_since_infer < hop_chunks:
                return False
            self._chunks_since_infer = 0
            fired = self.engine.push(self._ring.latest(hop))
        else:
            if self._chunks_total < self._audio_buf_len:
                return False  # ring still filling to the first full window
            if self._chunks_total > self._audio_buf_len and self._chunks_since_infer < 2:
                return False  # re-score every 2 chunks (62.5 ms hop)
            self._chunks_since_infer = 0
            window_samples = getattr(self.engine, "window_samples", self.chunk_size * self._audio_buf_len)
            fired = self.engine.ingest(self._ring.latest(window_samples))
        if fired:
            if self._infer_detected:
                return False
            self._infer_detected = True
            self.detections += 1
            seq = list(self.engine.cfg.inference_sequence)
            # context is optional (the constructor accepts a bare engine)
            phrase = (
                " ".join(str(self.ctx.vocab[x]) for x in seq).title()
                if self.ctx is not None
                else f"sequence {seq}"
            )
            Logger.info(f"{phrase} detected")
            for listener in self.listeners:
                listener(list(self.engine.cfg.inference_sequence))
            return True
        self._infer_detected = False
        return False

    def start(self) -> "HowlClient":
        if self.engine is None:
            raise AttributeError("provide an engine or initialize via from_pretrained/from_workspace")
        if self.source is None:
            self.source = MicrophoneAudioSource(chunk_size=self.chunk_size)
        self._running = True
        Logger.info("starting howl_tpu inference client...")
        return self

    def join(self):
        """Consume the audio source until it ends (or forever for a mic)."""
        try:
            for chunk in self.source:
                if not self._running:
                    break
                self.ingest_chunk(chunk)
        finally:
            close = getattr(self.source, "close", None)
            if close:
                close()

    def stop(self):
        self._running = False
