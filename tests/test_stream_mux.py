"""Multi-stream ingest mux + MultiStreamServer: the bulk-serving host glue.

The mux is N lock-free SPSC rings drained in lockstep into (N, hop) batches
(native C with a pure-Python fallback, howl_tpu/native). Tests pin the
per-tick policy — underrun streams contribute silence without consuming,
lapped streams drop their oldest audio — plus native/fallback parity, a
threaded-producer soak, and an end-to-end wakeword detection through
MultiStreamServer on the streaming-trunk engine.
"""

from __future__ import annotations

import threading

import numpy as np
import pytest

from howl_tpu.native import NativeStreamMux


def _seq(stream: int, start: int, n: int) -> np.ndarray:
    """Recognizable per-stream sample values: stream*1000 + sample index."""
    return (stream * 1000.0 + start + np.arange(n)).astype(np.float32)


@pytest.fixture(params=["native", "fallback"])
def make_mux(request, monkeypatch):
    if request.param == "fallback":
        import howl_tpu.native as native_mod

        monkeypatch.setattr(native_mod, "_ensure_built", lambda: None)
    else:
        from howl_tpu.native import available

        if not available():
            pytest.skip("native toolchain unavailable")
    return NativeStreamMux


def test_gather_lockstep_and_underrun(make_mux):
    mux = make_mux(n_streams=3, capacity=64)
    mux.push(0, _seq(0, 0, 16))
    mux.push(1, _seq(1, 0, 8))  # only half a hop: underruns
    mux.push(2, _seq(2, 0, 40))
    batch, status = mux.gather(16)
    np.testing.assert_array_equal(status, [1, 0, 1])
    np.testing.assert_array_equal(batch[0], _seq(0, 0, 16))
    np.testing.assert_array_equal(batch[1], np.zeros(16))  # silence, not consumed
    np.testing.assert_array_equal(batch[2], _seq(2, 0, 16))
    assert mux.pending(1) == 8  # underrun stream kept its audio
    # stream 1 catches up: its ORIGINAL samples arrive one tick late
    mux.push(1, _seq(1, 8, 24))
    batch, status = mux.gather(16)
    np.testing.assert_array_equal(status, [0, 1, 1])
    np.testing.assert_array_equal(batch[1], _seq(1, 0, 16))
    np.testing.assert_array_equal(batch[2], _seq(2, 16, 16))


def test_gather_overrun_drops_oldest(make_mux):
    mux = make_mux(n_streams=1, capacity=32)
    mux.push(0, _seq(0, 0, 100))  # laps the 32-sample ring: only newest 32 live
    batch, status = mux.gather(16)
    assert status[0] == -1
    np.testing.assert_array_equal(batch[0], _seq(0, 68, 16))  # oldest live sample
    batch, status = mux.gather(16)
    assert status[0] == 1  # back in sync after the skip
    np.testing.assert_array_equal(batch[0], _seq(0, 84, 16))


def test_gather_validates_hop_and_stream(make_mux):
    mux = make_mux(n_streams=2, capacity=32)
    with pytest.raises(ValueError, match="capacity"):
        mux.gather(64)
    with pytest.raises(IndexError):
        mux.push(5, np.zeros(4, np.float32))


def test_native_matches_fallback_schedule():
    import howl_tpu.native as native_mod

    if not native_mod.available():
        pytest.skip("native toolchain unavailable")
    rng = np.random.default_rng(3)
    pushes = [(int(rng.integers(0, 4)), rng.standard_normal(int(rng.integers(1, 50))).astype(np.float32))
              for _ in range(200)]

    def run(mux):
        outs = []
        for i, (s, pcm) in enumerate(pushes):
            mux.push(s, pcm)
            if i % 7 == 6:
                outs.append(mux.gather(20))
        outs.append(mux.gather(20))
        return outs

    native = run(NativeStreamMux(4, 128))
    orig = native_mod._ensure_built
    try:
        native_mod._ensure_built = lambda: None
        fallback = run(NativeStreamMux(4, 128))
    finally:
        native_mod._ensure_built = orig
    for (nb, ns), (fb, fs) in zip(native, fallback):
        np.testing.assert_array_equal(ns, fs)
        np.testing.assert_array_equal(nb, fb)


def test_no_torn_reads_under_fast_lapping_producer():
    """The reserve/publish seqlock: a producer that laps the ring while the
    consumer copies must NEVER yield torn audio. Every gathered hop with
    status 1 or a consumed -1 must be a CONTIGUOUS run of the pushed
    sequence — a torn read would splice two ranges ~capacity apart.
    (This stresses the exact window the pre-fix write_pos-only check missed:
    data stores precede the write_pos release.)"""
    from howl_tpu.native import available

    if not available():
        pytest.skip("native toolchain unavailable")
    hop, cap = 64, 256  # tiny ring: laps constantly
    mux = NativeStreamMux(1, cap)
    stop = threading.Event()

    def producer():
        sent = 0
        while not stop.is_set():
            n = 48
            mux.push(0, _seq(0, sent, n))
            sent += n

    t = threading.Thread(target=producer)
    t.start()
    try:
        real = torn = 0
        for _ in range(4000):
            batch, status = mux.gather(hop)
            if status[0] == 0:
                continue
            row = batch[0]
            if not row.any():  # -1 may carry silence (skip-only tick)
                continue
            real += 1
            expect = row[0] + np.arange(hop, dtype=np.float32)
            if not np.array_equal(row, expect):
                torn += 1
        assert torn == 0, f"{torn}/{real} gathered hops were torn"
        # the producer laps so aggressively that most ticks take the skip
        # path; a handful of clean reads still exercises the race window
        assert real >= 10, f"stress produced too few real gathers ({real})"
    finally:
        stop.set()
        t.join()


def test_threaded_gather_matches_single():
    """gather(threads=N) shards by stream range and must equal threads=1."""
    from howl_tpu.native import available

    if not available():
        pytest.skip("native toolchain unavailable")
    a, b = NativeStreamMux(7, 256), NativeStreamMux(7, 256)
    rng = np.random.default_rng(5)
    for s in range(7):
        pcm = rng.standard_normal(int(rng.integers(10, 200))).astype(np.float32)
        a.push(s, pcm)
        b.push(s, pcm)
    for _ in range(3):
        ba, sa = a.gather(32, threads=1)
        bb, sb = b.gather(32, threads=3)
        np.testing.assert_array_equal(sa, sb)
        np.testing.assert_array_equal(ba, bb)


def test_int16_push_matches_float(make_mux):
    mux = make_mux(n_streams=1, capacity=64)
    pcm = (np.array([0, 16384, -16384, 32767], np.int16)).tobytes()
    mux.push(0, pcm)
    mux.push(0, np.zeros(12, np.float32))
    batch, status = mux.gather(16)
    assert status[0] == 1
    np.testing.assert_allclose(batch[0, :4], [0.0, 0.5, -0.5, 32767 / 32768.0])


def test_threaded_producers_deliver_everything():
    """4 producer threads push concurrently while the consumer gathers; with
    ample capacity nothing drops and each stream's consumed audio is exactly
    its pushed sequence."""
    from howl_tpu.native import available

    if not available():
        pytest.skip("native toolchain unavailable")
    n_streams, total, hop = 4, 4096, 64
    mux = NativeStreamMux(n_streams, capacity=8192)

    def producer(s):
        rng = np.random.default_rng(s)
        sent = 0
        while sent < total:
            n = min(int(rng.integers(1, 200)), total - sent)
            mux.push(s, _seq(s, sent, n))
            sent += n

    threads = [threading.Thread(target=producer, args=(s,)) for s in range(n_streams)]
    for t in threads:
        t.start()
    consumed = [[] for _ in range(n_streams)]
    for _ in range(10 * total // hop):  # generous budget; exits early when done
        batch, status = mux.gather(hop)
        for s in range(n_streams):
            if status[s] == 1:
                consumed[s].append(batch[s])
            assert status[s] != -1, "overrun with ample capacity"
        if all(not t.is_alive() for t in threads) and all(
            mux.pending(s) < hop for s in range(n_streams)
        ):
            break
    for t in threads:
        t.join()
    for s in range(n_streams):
        got = np.concatenate(consumed[s]) if consumed[s] else np.zeros(0)
        assert len(got) >= total - hop + 1  # at most a partial-hop tail remains
        np.testing.assert_array_equal(got, _seq(s, 0, len(got)))


def test_server_survives_raising_listener(monkeypatch, capsys):
    """A user callback that raises must not kill the serving loop."""
    import howl_tpu.native as native_mod

    monkeypatch.setattr(native_mod, "_ensure_built", lambda: None)

    class FakeEngine:
        num_streams, hop_samples, hop_block = 2, 4, 1
        cfg = type("C", (), {"sample_rate": 16000})()
        last_fired = np.array([True, False])

        def push(self, batch):
            return True

    from howl_tpu.client.stream_server import MultiStreamServer

    server = MultiStreamServer(FakeEngine())
    server.add_listener(lambda idx, tick: (_ for _ in ()).throw(RuntimeError("boom")))
    hits = []
    server.add_listener(lambda idx, tick: hits.append(idx.tolist()))
    server.push(0, np.zeros(4, np.float32))
    server.push(1, np.zeros(4, np.float32))
    r = server.tick()
    assert r.any_fired and hits == [[0]]  # later listeners still ran
    assert "boom" in capsys.readouterr().err


@pytest.fixture(scope="module")
def trained_ws(tmp_path_factory):
    """Tiny trained wakeword model for the end-to-end server test."""
    import os

    from tests.fixtures import make_wakeword_corpus

    tmp = tmp_path_factory.mktemp("mux_serving")
    corpus = make_wakeword_corpus(tmp / "ww", n_positive=12, n_negative=12)
    ws = tmp / "ws"
    env = {
        "VOCAB": '["hey","fire","fox"]',
        "INFERENCE_SEQUENCE": "[0,1,2]",
        "NUM_EPOCHS": "40",
        "BATCH_SIZE": "16",
        "LEARNING_RATE": "0.02",
        "LR_DECAY": "0.98",
        "MAX_WINDOW_SIZE_SECONDS": "0.5",
        "EVAL_STRIDE_SIZE_SECONDS": "0.0625",
        "NUM_MELS": "40",
        "INFERENCE_THRESHOLD": "0",
    }
    old = {k: os.environ.get(k) for k in env}
    os.environ.update(env)
    from howl_tpu.settings import SETTINGS

    SETTINGS.reset()
    from howl_tpu.training.run.train import run

    run(["--model", "res8", "--workspace", str(ws), "-i", str(corpus),
         "--eval-freq", "0", "--steps-per-epoch", "10", "--no-augment"])
    yield ws, corpus, dict(env)
    for k, v in old.items():
        if v is None:
            os.environ.pop(k, None)
        else:
            os.environ[k] = v
    SETTINGS.reset()


@pytest.mark.slow
def test_multistream_server_detects_on_the_right_stream(trained_ws, monkeypatch):
    """End to end: 4 live streams through MultiStreamServer on the
    streaming-trunk engine — the wakeword stream fires, the noise streams
    don't, and a late stream is served as silence then catches up."""
    ws, corpus, env = trained_ws
    for k, v in env.items():
        monkeypatch.setenv(k, v)
    from howl_tpu.settings import SETTINGS

    SETTINGS.reset()
    from howl_tpu import hub
    from howl_tpu.client.stream_server import MultiStreamServer
    from howl_tpu.utils.audio_utils import silent_load

    engine, ctx = hub.load_workspace_engine(ws, num_streams=4, streaming_trunk=True)
    server = MultiStreamServer(engine, capacity_ticks=64)
    fired_streams = []
    server.add_listener(lambda idx, tick: fired_streams.extend(idx.tolist()))

    pos = sorted((corpus / "audio").glob("pos_*.wav"))[0]
    wake = silent_load(str(pos), 16000, True)
    rng = np.random.default_rng(0)
    hop = server.samples_per_tick
    n_ticks = (len(wake) // hop) + engine.schedule.lag + 4

    for t in range(n_ticks):
        chunk = wake[t * hop : (t + 1) * hop]
        if len(chunk):
            server.push(0, np.pad(chunk, (0, hop - len(chunk))))
        if t >= 2:  # stream 2 delivers the SAME clip two ticks late
            late = wake[(t - 2) * hop : (t - 1) * hop]
            if len(late):
                server.push(2, np.pad(late, (0, hop - len(late))))
        server.push(1, (rng.standard_normal(hop) * 0.01).astype(np.float32))
        # stream 3 pushes nothing at all: permanent underrun -> silence
        server.tick()

    assert 0 in fired_streams, "wakeword stream never fired"
    assert 1 not in fired_streams and 3 not in fired_streams
    assert server.detections[0] >= 1 and server.detections[1] == 0
    assert server.underruns[3] == server.ticks  # silent stream: all underruns
    # the late stream still detects (its audio just arrives later)
    assert 2 in fired_streams, "late stream should catch up and fire"


@pytest.mark.slow
def test_demo_streams_cli(trained_ws, monkeypatch, capsys):
    """demo.py --streams N replays WAVs on their own streams through one
    batched engine and reports per-stream detections."""
    ws, corpus, env = trained_ws
    for k, v in env.items():
        monkeypatch.setenv(k, v)
    from howl_tpu.settings import SETTINGS

    SETTINGS.reset()
    from howl_tpu.training.run.demo import run

    pos = str(sorted((corpus / "audio").glob("pos_*.wav"))[0])
    neg = str(sorted((corpus / "audio").glob("neg_*.wav"))[0])
    server = run(["--workspace", str(ws), "--model", "res8",
                  "--streams", "2", "--wav", pos, neg, "--incremental"])
    assert server.detections[0] >= 1, "wakeword stream should detect"
    assert server.detections[1] == 0, "negative stream should stay quiet"
    assert "wakeword detected on streams [0]" in capsys.readouterr().out


@pytest.mark.slow  # shares the trained_ws fixture (multi-epoch training)
def test_server_rejects_whole_window_engine(trained_ws, monkeypatch):
    ws, corpus, env = trained_ws
    for k, v in env.items():
        monkeypatch.setenv(k, v)
    from howl_tpu.settings import SETTINGS

    SETTINGS.reset()
    from howl_tpu import hub
    from howl_tpu.client.stream_server import MultiStreamServer

    engine, _ = hub.load_workspace_engine(ws, num_streams=2)  # OnlineEngine
    with pytest.raises(ValueError, match="push-based"):
        MultiStreamServer(engine)
