"""ctypes bindings for the native serving runtime (native/howl_native.cpp).

Builds the shared library on first use when a compiler is available; every
entry point has a pure-Python fallback, so the package works without a
toolchain (``available()`` reports which path is active).
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path
from typing import Optional

import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parents[2] / "native"
_LIB_PATH = _NATIVE_DIR / "libhowl_native.so"
_lib = None
_load_failed = False


def _ensure_built() -> Optional[ctypes.CDLL]:
    global _lib, _load_failed
    if _lib is not None or _load_failed:
        return _lib
    try:
        # always invoke make: a no-op when fresh, and a stale .so from before
        # a source change would lack newer symbols (make owns the dependency).
        # A toolchain-less host with a prebuilt .so still loads it.
        try:
            subprocess.run(["make", "-C", str(_NATIVE_DIR)], check=True, capture_output=True)
        except Exception:  # noqa: BLE001
            if not _LIB_PATH.exists():
                raise
        lib = ctypes.CDLL(str(_LIB_PATH))
    except Exception:  # noqa: BLE001 — no toolchain / load failure -> fallback
        _load_failed = True
        return None
    try:
        c_i64, c_f32p, c_i16p = ctypes.c_int64, ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int16)
        lib.ring_create.restype = ctypes.c_void_p
        lib.ring_create.argtypes = [c_i64]
        lib.ring_destroy.argtypes = [ctypes.c_void_p]
        lib.ring_push_i16.argtypes = [ctypes.c_void_p, c_i16p, c_i64]
        lib.ring_push_f32.argtypes = [ctypes.c_void_p, c_f32p, c_i64]
        lib.ring_total_written.restype = c_i64
        lib.ring_total_written.argtypes = [ctypes.c_void_p]
        lib.ring_latest.restype = c_i64
        lib.ring_latest.argtypes = [ctypes.c_void_p, c_f32p, c_i64]
        lib.pcm_i16_to_f32.argtypes = [c_i16p, c_f32p, c_i64]
        lib.vad_leading_silence_ms.restype = c_i64
        lib.vad_leading_silence_ms.argtypes = [c_f32p, c_i64, ctypes.c_int, ctypes.c_int, ctypes.c_float]
        lib.wav_decode_i16.restype = c_i64
        lib.wav_decode_i16.argtypes = [
            ctypes.POINTER(ctypes.c_uint8),
            c_i64,
            c_f32p,
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32),
        ]
        lib.mux_create.restype = ctypes.c_void_p
        lib.mux_create.argtypes = [c_i64, c_i64]
        lib.mux_destroy.argtypes = [ctypes.c_void_p]
        lib.mux_push_f32.argtypes = [ctypes.c_void_p, c_i64, c_f32p, c_i64]
        lib.mux_push_i16.argtypes = [ctypes.c_void_p, c_i64, c_i16p, c_i64]
        lib.mux_pending.restype = c_i64
        lib.mux_pending.argtypes = [ctypes.c_void_p, c_i64]
        lib.mux_gather.restype = c_i64
        lib.mux_gather.argtypes = [ctypes.c_void_p, c_f32p, c_i64, ctypes.POINTER(ctypes.c_int8)]
        lib.mux_gather_range.restype = c_i64
        lib.mux_gather_range.argtypes = [
            ctypes.c_void_p, c_f32p, c_i64, ctypes.POINTER(ctypes.c_int8), c_i64, c_i64,
        ]
        _lib = lib
    except AttributeError:
        # a stale prebuilt .so (older symbol set) that make couldn't
        # rebuild (no toolchain) -> pure-Python fallback, loudly absent
        _load_failed = True
        return None
    return _lib


def available() -> bool:
    return _ensure_built() is not None


class NativeRingBuffer:
    """SPSC PCM ring buffer; ``latest(n)`` returns the trailing window
    (zero-padded on the left while filling) — the client's scoring cadence."""

    def __init__(self, capacity: int):
        lib = _ensure_built()
        self._lib = lib
        self.capacity = capacity
        if lib is not None:
            self._handle = lib.ring_create(capacity)
        else:  # pure-python fallback
            self._handle = None
            self._buf = np.zeros(capacity, np.float32)
            self._total = 0

    def push_int16(self, pcm: bytes):
        arr = np.frombuffer(pcm, dtype="<i2")
        if self._lib is not None:
            self._lib.ring_push_i16(
                self._handle, arr.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)), len(arr)
            )
        else:
            self.push_float(arr.astype(np.float32) / 32768.0)

    def push_float(self, audio: np.ndarray):
        audio = np.ascontiguousarray(audio, np.float32)
        if self._lib is not None:
            self._lib.ring_push_f32(
                self._handle, audio.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(audio)
            )
        else:
            idx = (self._total + np.arange(len(audio))) % self.capacity
            self._buf[idx] = audio
            self._total += len(audio)

    @property
    def total_written(self) -> int:
        if self._lib is not None:
            return int(self._lib.ring_total_written(self._handle))
        return self._total

    def latest(self, n: int) -> np.ndarray:
        if n > self.capacity:
            # only `capacity` samples still exist; modulo indexing past that
            # would re-read overwritten slots as if they were older audio
            raise ValueError(f"latest({n}) exceeds ring capacity {self.capacity}")
        out = np.zeros(n, np.float32)
        if self._lib is not None:
            self._lib.ring_latest(self._handle, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n)
        else:
            avail = min(self._total, n)
            start = self._total - avail
            idx = (start + np.arange(avail)) % self.capacity
            out[n - avail :] = self._buf[idx]
        return out

    def __del__(self):
        if getattr(self, "_lib", None) is not None and getattr(self, "_handle", None):
            self._lib.ring_destroy(self._handle)
            self._handle = None


class NativeStreamMux:
    """N per-stream SPSC PCM rings drained in lockstep into (N, hop) float32
    batches — the host-side feeder for the batched online engines. One
    producer thread per stream may ``push``; ONE consumer calls ``gather``.

    Per-tick policy (mux_gather in native/howl_native.cpp): a stream with
    fewer than ``hop`` unread samples contributes zeros and is NOT consumed
    (late audio serves on a later tick — latency, never corruption); a stream
    whose producer lapped its ring skips to the oldest live sample (oldest
    audio dropped, status -1)."""

    def __init__(self, n_streams: int, capacity: int):
        if capacity < 1:
            raise ValueError("capacity must be positive")
        lib = _ensure_built()
        self._lib = lib
        self.n_streams = int(n_streams)
        self.capacity = int(capacity)
        if lib is not None:
            self._handle = lib.mux_create(self.n_streams, self.capacity)
        else:  # pure-python fallback (single-threaded semantics)
            self._handle = None
            self._buf = np.zeros((self.n_streams, self.capacity), np.float32)
            self._write = np.zeros(self.n_streams, np.int64)
            self._read = np.zeros(self.n_streams, np.int64)

    def push(self, stream: int, pcm):
        """Append one stream's newest audio: float32 array or int16 PCM bytes."""
        if not 0 <= stream < self.n_streams:
            raise IndexError(f"stream {stream} out of range [0, {self.n_streams})")
        if isinstance(pcm, (bytes, bytearray)):
            arr = np.frombuffer(pcm, dtype="<i2")
            if self._lib is not None:
                self._lib.mux_push_i16(
                    self._handle, stream, arr.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)), len(arr)
                )
                return
            audio = arr.astype(np.float32) / 32768.0
        else:
            audio = np.ascontiguousarray(pcm, np.float32)
        if self._lib is not None:
            self._lib.mux_push_f32(
                self._handle, stream, audio.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(audio)
            )
        else:
            idx = (self._write[stream] + np.arange(len(audio))) % self.capacity
            self._buf[stream, idx] = audio
            self._write[stream] += len(audio)

    def pending(self, stream: int) -> int:
        if self._lib is not None:
            return int(self._lib.mux_pending(self._handle, stream))
        return max(int(self._write[stream] - self._read[stream]), 0)

    def gather(self, hop: int, threads: int = 1):
        """Next ``hop`` samples of every stream -> ((N, hop) f32 batch,
        (N,) int8 status: 1 ok / 0 underrun / -1 overrun-skip).

        ``threads`` > 1 shards the native gather by stream range across that
        many Python threads (ctypes releases the GIL; the per-stream rows are
        independent) — one core sustains ~16k streams at the 62.5 ms cadence,
        so larger fleets shard."""
        if hop > self.capacity:
            raise ValueError(f"gather({hop}) exceeds per-stream capacity {self.capacity}")
        out = np.zeros((self.n_streams, hop), np.float32)
        status = np.zeros(self.n_streams, np.int8)
        if self._lib is not None:
            out_p = out.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
            st_p = status.ctypes.data_as(ctypes.POINTER(ctypes.c_int8))
            if threads <= 1 or self.n_streams < 2 * threads:
                self._lib.mux_gather(self._handle, out_p, hop, st_p)
            else:
                import threading

                bounds = np.linspace(0, self.n_streams, threads + 1).astype(int)
                ts = [
                    threading.Thread(
                        target=self._lib.mux_gather_range,
                        args=(self._handle, out_p, hop, st_p, int(lo), int(hi)),
                    )
                    for lo, hi in zip(bounds[:-1], bounds[1:])
                ]
                for t in ts:
                    t.start()
                for t in ts:
                    t.join()
            return out, status
        for s in range(self.n_streams):  # mirrors mux_gather_range (1 thread)
            wp, rp = int(self._write[s]), int(self._read[s])
            st = 1
            if wp - rp > self.capacity:
                rp = wp - self.capacity
                st = -1
            if wp - rp < hop:  # underrun (possibly just after a skip)
                self._read[s] = rp  # persist any skip
                status[s] = -1 if st == -1 else 0
                continue
            idx = (rp + np.arange(hop)) % self.capacity
            out[s] = self._buf[s, idx]
            self._read[s] = rp + hop
            status[s] = st
        return out, status

    def __del__(self):
        if getattr(self, "_lib", None) is not None and getattr(self, "_handle", None):
            self._lib.mux_destroy(self._handle)
            self._handle = None


def pcm_int16_to_float(pcm: bytes) -> np.ndarray:
    arr = np.frombuffer(pcm, dtype="<i2")
    lib = _ensure_built()
    if lib is None:
        return arr.astype(np.float32) / 32768.0
    out = np.empty(len(arr), np.float32)
    lib.pcm_i16_to_f32(
        arr.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        len(arr),
    )
    return out


def leading_silence_ms(audio: np.ndarray, sample_rate: int = 16000, frame_ms: int = 30, threshold_db: float = -35.0) -> int:
    lib = _ensure_built()
    audio = np.ascontiguousarray(audio, np.float32)
    if lib is None:
        frame_len = int(frame_ms / 1000 * sample_rate)
        ms = 0
        for start in range(0, len(audio) - frame_len + 1, frame_len):
            frame = audio[start : start + frame_len]
            rms = float(np.sqrt(np.mean(frame**2) + 1e-12))
            if 20 * np.log10(rms + 1e-12) > threshold_db:
                break
            ms += frame_ms
        return ms
    return int(
        lib.vad_leading_silence_ms(
            audio.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(audio), sample_rate, frame_ms, threshold_db
        )
    )


def wav_decode(data: bytes):
    """16-bit PCM WAV bytes -> (audio float32 (channels*frames,), sr, channels);
    None when the native lib is unavailable or the input is malformed."""
    lib = _ensure_built()
    if lib is None:
        return None
    buf = np.frombuffer(data, np.uint8)
    sr = ctypes.c_int32(0)
    ch = ctypes.c_int32(0)
    n = lib.wav_decode_i16(
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), len(buf), None, ctypes.byref(sr), ctypes.byref(ch)
    )
    if n < 0:
        return None
    out = np.empty(n, np.float32)
    lib.wav_decode_i16(
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        len(buf),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.byref(sr),
        ctypes.byref(ch),
    )
    return out, int(sr.value), int(ch.value)
