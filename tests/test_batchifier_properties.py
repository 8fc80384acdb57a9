"""Property tests: the label-aware window sampler's labeling invariants.

WakeWordFrameBatchifier decides which audio spans train as which labels
(ref howl/data/transform/batchifier.py:37-118) — a mislabeling here poisons
every downstream recipe, and until now it was covered only end-to-end (a
training-convergence gate). Index-encoded audio (sample i stores i+1) lets the
tests recover each emitted window's exact source span through the random
left/right placement, and assert the sampler's contract directly:

  * positive rows end within [word_end, word_end + eps_ms] of the word whose
    label they carry;
  * negative rows never intersect the +-positive_delta_ms guard band of ANY
    word-end (the reference has a bug here — it samples negative starts from
    0 rather than the complement interval, ref batchifier.py:95-105 — which
    howl_tpu deliberately fixes, so the assert is strict);
  * unlabeled clips emit negative windows drawn inside the clip;
  * the probability knob at its extremes yields all-positive / all-negative.
"""

from __future__ import annotations

import numpy as np
import pytest

from howl_tpu.data.common.label import FrameLabelData
from howl_tpu.data.common.metadata import AudioClipMetadata
from howl_tpu.data.common.sample import Sample

SR = 16000
NEG = 9


def _sample(ts_map, duration_s=2.0):
    n = int(duration_s * SR)
    audio = (np.arange(n, dtype=np.float32) + 1.0)  # sample i stores i+1
    meta = AudioClipMetadata(path="mem.wav", transcription="x")
    label = FrameLabelData(timestamp_label_map=dict(ts_map), start_timestamp=[], char_indices=[])
    return Sample(metadata=meta, audio_data=audio, sample_rate=SR, label_data=label)


def _recover_span(row):
    """Source [a, b) of a window row of index-encoded audio (value = i+1)."""
    nz = row[row > 0]
    assert nz.size > 0, "empty window"
    b = int(nz.max())
    a = int(nz.min()) - 1
    assert b - a == nz.size, "window is not one contiguous source span"
    return a, b


def _batchifier(**kw):
    from howl_tpu.data.transform.batchifier import WakeWordFrameBatchifier

    kw.setdefault("window_size_ms", 500)
    kw.setdefault("sample_rate", SR)
    return WakeWordFrameBatchifier(NEG, seed=kw.pop("seed", 0), **kw)


def test_positive_windows_end_at_their_words(rng):
    ts_map = {500.0: 1, 1200.0: 2, 1800.0: 3}
    bf = _batchifier(positive_sample_prob=1.0)
    samples = [_sample(ts_map)] * 16
    for _ in range(20):
        batch = bf(samples)
        assert set(np.unique(batch.labels)) <= {1, 2, 3}
        label_to_ts = {v: k for k, v in ts_map.items()}
        for row, label, length in zip(batch.audio_data, batch.labels, batch.lengths):
            a, b = _recover_span(row)
            assert b - a == int(length)
            t = label_to_ts[int(label)]
            lo = int(t / 1000 * SR)
            hi = int((t + bf.eps_ms) / 1000 * SR)
            assert lo <= b <= hi, (t, a, b)
            assert b - a <= bf.window_samples


def test_negative_windows_avoid_guard_bands():
    ts_map = {500.0: 1, 1200.0: 2}
    bf = _batchifier(positive_sample_prob=0.0)
    samples = [_sample(ts_map)] * 16
    for _ in range(20):
        batch = bf(samples)
        assert (batch.labels == NEG).all()
        # guard-band assertions below must not pass vacuously: most rows of a
        # 2 s clip with two positives have plenty of negative room to sample
        assert int((batch.lengths > 0).sum()) >= len(samples) // 2, batch.lengths
        for row, length in zip(batch.audio_data, batch.lengths):
            if int(length) == 0:
                continue  # degenerate empty interval pick
            a, b = _recover_span(row)
            a_ms, b_ms = a / SR * 1000, b / SR * 1000
            for t in ts_map:
                # 1-sample slack for the int() floor at interval edges
                assert b_ms <= t - bf.positive_delta_ms + 1 / 16 or a_ms >= t + bf.positive_delta_ms - 1 / 16, (
                    t, a_ms, b_ms,
                )


def test_unlabeled_clip_is_negative_window_inside_clip():
    n = 2 * SR
    meta = AudioClipMetadata(path="mem.wav", transcription="")
    s = Sample(
        metadata=meta,
        audio_data=np.arange(n, dtype=np.float32) + 1.0,
        sample_rate=SR,
        label_data=None,
    )
    bf = _batchifier()
    batch = bf([s] * 8)
    assert (batch.labels == NEG).all()
    for row, length in zip(batch.audio_data, batch.lengths):
        a, b = _recover_span(row)
        assert 0 <= a and b <= n and b - a == int(length) <= bf.window_samples


def test_word_end_near_clip_start_never_mislabels():
    """A word end at (or rounding to) the clip start yields a zero-length
    positive span; the sampler must fall back to a NEGATIVE window rather
    than emit an all-zeros row carrying a positive label."""
    bf = _batchifier(positive_sample_prob=1.0, eps_ms=0)
    batch = bf([_sample({0.0: 1})] * 8)
    assert (batch.labels == NEG).all()


@pytest.mark.parametrize("prob,expected", [(1.0, {1}), (0.0, {NEG})])
def test_probability_extremes(prob, expected):
    bf = _batchifier(positive_sample_prob=prob)
    batch = bf([_sample({1000.0: 1})] * 32)
    assert set(np.unique(batch.labels)) == expected
