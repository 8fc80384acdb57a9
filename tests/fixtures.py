"""Synthetic test corpora (this environment cannot decode the reference's mp3
fixtures, so fixtures are generated: distinguishable tones per word class)."""

from __future__ import annotations

import json
from pathlib import Path

import numpy as np

from howl_tpu.utils.audio_utils import write_wav

SR = 16000


def tone(freq: float, seconds: float = 1.0, noise: float = 0.02, rng=None) -> np.ndarray:
    rng = rng or np.random.default_rng(0)
    t = np.arange(int(seconds * SR)) / SR
    sig = 0.3 * np.sin(2 * np.pi * freq * t) + noise * rng.standard_normal(t.shape)
    return sig.astype(np.float32)


def make_gsc_corpus(root: Path, vocab=("yes", "no"), n_per_class: int = 10, seconds: float = 1.0):
    """GSC-style tree: <word>/<file>.wav + testing_list.txt + validation_list.txt.

    Each word gets a distinct carrier frequency so a small model can separate
    classes within a few epochs.
    """
    root = Path(root)
    rng = np.random.default_rng(0)
    test_list, val_list = [], []
    freqs = {w: 400.0 * (i + 1) for i, w in enumerate(vocab)}
    for word in vocab:
        (root / word).mkdir(parents=True, exist_ok=True)
        for i in range(n_per_class):
            # jitter frequency & amplitude per clip
            f = freqs[word] * (1.0 + 0.03 * rng.standard_normal())
            clip = tone(f, seconds, rng=rng)
            name = f"{word}/{word}_{i:03d}.wav"
            write_wav(root / name, clip, SR)
            if i % 5 == 3:
                val_list.append(name)
            elif i % 5 == 4:
                test_list.append(name)
    (root / "testing_list.txt").write_text("\n".join(test_list) + "\n")
    (root / "validation_list.txt").write_text("\n".join(val_list) + "\n")
    return root


def make_wakeword_corpus(
    root: Path,
    vocab=("hey", "fire", "fox"),
    n_positive: int = 8,
    n_negative: int = 8,
    seconds: float = 2.0,
):
    """Howl-format aligned dataset: audio/*.wav + aligned-metadata-{split}.jsonl.

    Positive clips contain the vocab words as tone bursts at known times with
    per-character end_timestamps; negatives are other-frequency noise.
    """
    root = Path(root)
    (root / "audio").mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(0)
    freqs = {w: 500.0 * (i + 1) for i, w in enumerate(vocab)}
    transcript = " ".join(vocab)

    records = {"training": [], "dev": [], "test": []}
    splits = ["training", "dev", "test"]

    def split_for(i):
        return splits[0] if i % 4 < 2 else splits[1 + (i % 2)]

    n_samples = int(seconds * SR)
    word_dur = 0.3  # seconds per word burst

    for i in range(n_positive):
        audio = 0.01 * rng.standard_normal(n_samples).astype(np.float32)
        end_timestamps = []
        char_time = []
        cursor = 0.2 + 0.1 * rng.random()  # start offset seconds
        for w in vocab:
            start = int(cursor * SR)
            dur = int(word_dur * SR)
            t = np.arange(dur) / SR
            audio[start : start + dur] += 0.3 * np.sin(2 * np.pi * freqs[w] * t).astype(np.float32)
            # per-character end timestamps spread over the word interval
            word_end_ms = (cursor + word_dur) * 1000
            word_start_ms = cursor * 1000
            for k in range(len(w)):
                end_timestamps.append(word_start_ms + (k + 1) * (word_end_ms - word_start_ms) / len(w))
            char_time.append(word_end_ms)
            cursor += word_dur + 0.15
        # spaces between words get the previous char's timestamp
        full_ts = []
        ci = 0
        for w_idx, w in enumerate(transcript.split()):
            for _ in w:
                full_ts.append(end_timestamps[ci])
                ci += 1
            if w_idx < len(vocab) - 1:
                full_ts.append(full_ts[-1])
        name = f"pos_{i:03d}.wav"
        write_wav(root / "audio" / name, audio, SR)
        records[split_for(i)].append(
            {"path": name, "transcription": transcript, "end_timestamps": full_ts}
        )

    for i in range(n_negative):
        audio = 0.05 * rng.standard_normal(n_samples).astype(np.float32)
        name = f"neg_{i:03d}.wav"
        write_wav(root / "audio" / name, audio, SR)
        text = "something else entirely"
        ts = list(np.linspace(10.0, seconds * 1000 - 10.0, len(text)))
        records[split_for(i)].append({"path": name, "transcription": text, "end_timestamps": ts})

    for split, recs in records.items():
        with (root / f"aligned-metadata-{split}.jsonl").open("w") as f:
            for rec in recs:
                f.write(json.dumps(rec) + "\n")
    return root


def make_noise_dir(root: Path, n: int = 12, seconds: float = 3.0):
    root = Path(root)
    root.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(7)
    for i in range(n):
        write_wav(root / f"noise_{i}.wav", 0.1 * rng.standard_normal(int(seconds * SR)).astype(np.float32), SR)
    return root
