"""ETL pipeline: raw mining -> alignment attachment -> stitching, end to end,
plus TextGrid parsing and loaders."""

import json
from pathlib import Path

import numpy as np
import pytest

from tests.fixtures import SR, tone


def _make_cv_corpus(root: Path, rng=None):
    """Mini Common Voice corpus: clips/ + train/dev/test.tsv with transcripts."""
    from howl_tpu.utils.audio_utils import write_wav

    rng = rng or np.random.default_rng(0)
    root = Path(root)
    (root / "clips").mkdir(parents=True)
    rows = {
        "train.tsv": [
            ("a1.wav", "hey fire fox is cool"),
            ("a2.wav", "nothing to see here"),
            ("a3.wav", "the fire is warm"),
            ("a4.wav", "hey you there"),
        ],
        "dev.tsv": [("b1.wav", "hey fire fox"), ("b2.wav", "unrelated words")],
        "test.tsv": [("c1.wav", "fox says hey fire fox"), ("c2.wav", "silence speaks")],
    }
    for tsv, entries in rows.items():
        lines = ["client_id\tpath\tsentence"]
        for name, sentence in entries:
            freq = 300 + 100 * (hash(name) % 5)
            write_wav(root / "clips" / name, tone(freq, 1.2, rng=rng), SR)
            lines.append(f"client{hash(name) % 3}\t{name}\t{sentence}")
        (root / tsv).write_text("\n".join(lines) + "\n")
    return root


def test_textgrid_parser(tmp_path):
    from howl_tpu.align.textgrid import TextGrid

    grid_text = '''File type = "ooTextFile"
Object class = "TextGrid"

xmin = 0
xmax = 2.0
tiers? <exists>
size = 2
item []:
    item [1]:
        class = "IntervalTier"
        name = "words"
        xmin = 0
        xmax = 2.0
        intervals: size = 3
        intervals [1]:
            xmin = 0
            xmax = 0.5
            text = ""
        intervals [2]:
            xmin = 0.5
            xmax = 1.0
            text = "hey"
        intervals [3]:
            xmin = 1.0
            xmax = 1.6
            text = "fire"
    item [2]:
        class = "IntervalTier"
        name = "phones"
        xmin = 0
        xmax = 2.0
        intervals: size = 2
        intervals [1]:
            xmin = 0.5
            xmax = 0.75
            text = "HH"
        intervals [2]:
            xmin = 0.75
            xmax = 1.0
            text = "EY1"
'''
    grid = TextGrid.parse(grid_text)
    assert "words" in grid and "phones" in grid
    words = [i for i in grid["words"] if i.text]
    assert [w.text for w in words] == ["hey", "fire"]
    assert words[0].xmin == 0.5 and words[0].xmax == 1.0
    assert [p.text for p in grid["phones"]] == ["HH", "EY1"]


def test_mfa_converter():
    from howl_tpu.align.mfa import MfaTextGridConverter
    from howl_tpu.align.textgrid import TextGrid, TextGridInterval

    grid = TextGrid(
        tiers={
            "words": [
                TextGridInterval(0.0, 0.5, ""),
                TextGridInterval(0.5, 1.0, "hey"),
                TextGridInterval(1.0, 1.6, "fire"),
            ]
        }
    )
    aligned = MfaTextGridConverter().convert(grid)
    assert aligned.transcription == "hey fire"
    assert len(aligned.end_timestamps) == len("hey fire")
    # last char of 'hey' ends at 1000 ms; last char of 'fire' at 1600 ms
    assert aligned.end_timestamps[2] == pytest.approx(1000.0)
    assert aligned.end_timestamps[-1] == pytest.approx(1600.0)
    # the space slot repeats the word-end timestamp
    assert aligned.end_timestamps[3] == pytest.approx(1000.0)


def test_vad_aligner():
    from howl_tpu.align.vad import LeftRightVadAligner
    from howl_tpu.data.common.metadata import AudioClipMetadata
    from howl_tpu.data.common.sample import Sample

    # 0.5 s silence + 1 s tone + 0.5 s silence
    audio = np.concatenate(
        [np.zeros(8000, np.float32), tone(500, 1.0, noise=0.0), np.zeros(8000, np.float32)]
    )
    sample = Sample(AudioClipMetadata(path="x.wav", transcription="hello"), audio, SR)
    aligned = LeftRightVadAligner().align(sample)
    assert aligned.transcription == "hello"
    assert aligned.end_timestamps[0] >= 400  # starts near 500 ms
    assert aligned.end_timestamps[-1] <= 1600  # ends near 1500 ms


@pytest.mark.slow
def test_full_etl_pipeline(tmp_path, monkeypatch):
    """common-voice corpus -> raw positive/negative -> stub alignment ->
    stitched samples -> loadable by the wakeword trainer's loader."""
    monkeypatch.setenv("VOCAB", '["hey","fire","fox"]')
    monkeypatch.setenv("INFERENCE_SEQUENCE", "[0,1,2]")
    from howl_tpu.settings import SETTINGS

    SETTINGS.reset()

    cv = _make_cv_corpus(tmp_path / "cv")
    datasets = tmp_path / "datasets"

    # 1) mine raw positives/negatives
    from howl_tpu.training.run.generate_raw_audio_dataset import run as gen_run

    gen_run(["-i", str(cv), "--dataset-type", "common-voice", "-o", str(datasets)])
    pos_dir = datasets / "hey_fire_fox" / "positive"
    neg_dir = datasets / "hey_fire_fox" / "negative"
    assert (pos_dir / "metadata-training.jsonl").exists()
    assert (neg_dir / "metadata-training.jsonl").exists()
    pos_train = [json.loads(l) for l in (pos_dir / "metadata-training.jsonl").read_text().splitlines()]
    # positives: transcripts containing any vocab word
    assert all(
        any(w in rec["transcription"] for w in ("hey", "fire", "fox")) for rec in pos_train
    )
    # negatives: no transcript contains the full wakeword sequence
    neg_all = []
    for split in ("training", "dev", "test"):
        neg_all += [
            json.loads(l) for l in (neg_dir / f"metadata-{split}.jsonl").read_text().splitlines()
        ]
    assert all("hey fire fox" not in rec["transcription"] for rec in neg_all)
    # audio re-encoded + .lab sidecars for MFA
    wavs = list((pos_dir / "audio").glob("*.wav"))
    labs = list((pos_dir / "audio").glob("*.lab"))
    assert wavs and len(labs) == len(wavs)

    # 2) attach stub alignments
    from howl_tpu.training.run.attach_alignment import run as align_run

    align_run(["-i", str(pos_dir), "--alignment-type", "stub"])
    align_run(["-i", str(neg_dir), "--alignment-type", "stub"])
    aligned = [
        json.loads(l) for l in (pos_dir / "aligned-metadata-training.jsonl").read_text().splitlines()
    ]
    assert aligned and all(len(r["end_timestamps"]) == len(r["transcription"]) for r in aligned)

    # 3) stitch wakeword samples
    from howl_tpu.training.run.stitch_vocab_samples import run as stitch_run

    stitch_run(
        [
            "-i",
            str(pos_dir),
            "--max-num-training-samples",
            "4",
            "--max-num-dev-samples",
            "2",
            "--max-num-test-samples",
            "2",
            "--disable-detect-keyword",
        ]
    )
    stitched = [
        json.loads(l)
        for l in (pos_dir / "stitched-metadata-training.jsonl").read_text().splitlines()
    ]
    assert len(stitched) == 4
    assert all(r["transcription"] == "hey fire fox" for r in stitched)
    assert all(len(r["end_timestamps"]) == len("hey fire fox") for r in stitched)

    # 4) the trainer's loader can read raw + aligned + stitched
    from howl_tpu.context import InferenceContext
    from howl_tpu.data.dataset.dataset_loader import WakeWordDatasetLoader

    ctx = InferenceContext(vocab=["hey", "fire", "fox"], token_type="word")
    loader = WakeWordDatasetLoader()
    train, dev, test = loader.load_splits(pos_dir, frame_labeler=ctx.labeler)
    assert len(train) > 0
    sample = train[0]
    assert sample.audio_data.shape[-1] > 0
    st_train, _, _ = loader.load_splits(pos_dir, prefix="stitched-", frame_labeler=ctx.labeler)
    assert len(st_train) == 4
    st = st_train[0]
    # stitched samples carry all three word labels
    assert sorted(st.label_data.timestamp_label_map.values()) == [0, 1, 2]


def test_mfa_alignment_attachment(tmp_path, monkeypatch):
    """Raw dataset + hand-written TextGrids -> aligned metadata."""
    monkeypatch.setenv("VOCAB", '["hey"]')
    from howl_tpu.settings import SETTINGS

    SETTINGS.reset()
    from howl_tpu.utils.audio_utils import write_wav

    ds = tmp_path / "raw"
    (ds / "audio").mkdir(parents=True)
    write_wav(ds / "audio" / "clip1.wav", tone(500, 1.0), SR)
    (ds / "metadata-training.jsonl").write_text(
        json.dumps({"path": "clip1.wav", "transcription": "hey fire"}) + "\n"
    )
    (ds / "metadata-dev.jsonl").write_text("")
    (ds / "metadata-test.jsonl").write_text("")
    grids = tmp_path / "grids"
    grids.mkdir()
    (grids / "clip1.TextGrid").write_text(
        'item [1]:\n    class = "IntervalTier"\n    name = "words"\n'
        "    intervals: size = 2\n"
        "    intervals [1]:\n        xmin = 0.1\n        xmax = 0.4\n        text = \"hey\"\n"
        "    intervals [2]:\n        xmin = 0.5\n        xmax = 0.9\n        text = \"fire\"\n"
    )
    from howl_tpu.training.run.attach_alignment import run as align_run

    align_run(["-i", str(ds), "--alignment-type", "mfa", "--alignments-path", str(grids)])
    rec = json.loads((ds / "aligned-metadata-training.jsonl").read_text().splitlines()[0])
    assert rec["transcription"] == "hey fire"
    assert rec["end_timestamps"][2] == pytest.approx(400.0)
    assert rec["end_timestamps"][-1] == pytest.approx(900.0)


def test_mozilla_kw_and_snips_loaders(tmp_path):
    from howl_tpu.data.dataset.common_voice_loader import MozillaKeywordLoader
    from howl_tpu.data.dataset.hey_snips_loader import HeySnipsWakeWordLoader
    from howl_tpu.utils.audio_utils import write_wav

    # mozilla-kw: validated.tsv split by client hash
    kw = tmp_path / "kw"
    (kw / "clips").mkdir(parents=True)
    lines = ["client_id\tpath\tsentence"]
    for i in range(20):
        name = f"k{i}.wav"
        write_wav(kw / "clips" / name, tone(440, 0.2), SR)
        lines.append(f"client{i}\t{name}\tsome words {i}")
    (kw / "validated.tsv").write_text("\n".join(lines) + "\n")
    train, dev, test = MozillaKeywordLoader().load_splits(kw)
    assert len(train) + len(dev) + len(test) == 20
    assert len(train) > len(dev)

    # hey-snips: json metadata, positives transcribed as 'hey snips'
    sn = tmp_path / "snips"
    (sn / "audio").mkdir(parents=True)
    for i in range(4):
        write_wav(sn / "audio" / f"s{i}.wav", tone(440, 0.2), SR)
    meta = [
        {"audio_file_path": "audio/s0.wav", "is_hotword": 1},
        {"audio_file_path": "audio/s1.wav", "is_hotword": 0},
    ]
    for f in ("train.json", "dev.json", "test.json"):
        (sn / f).write_text(json.dumps(meta))
    train, dev, test = HeySnipsWakeWordLoader().load_splits(sn)
    assert len(train) == 2
    assert train.metadata_list[0].transcription == "hey snips"
    assert train.metadata_list[1].transcription == "[UNKNOWN]"
    # pluggable transcriber
    train2, _, _ = HeySnipsWakeWordLoader(transcriber=lambda p: "negative words").load_splits(sn)
    assert train2.metadata_list[1].transcription == "negative words"


@pytest.mark.slow
def test_parallel_etl_matches_sequential(tmp_path):
    """VERDICT r3 #6: worker pools for writer / stats / TextGrid ingestion
    (ref dataset_writer.py:97-100, dataset.py:175-194,
    aligned_audio_dataset_generator.py:98-116) must produce bit-identical
    artifacts to the sequential path."""
    from howl_tpu.data.common.metadata import AudioClipMetadata
    from howl_tpu.data.dataset.constants import AudioDatasetType
    from howl_tpu.data.dataset.dataset import AudioClipDataset, DatasetType
    from howl_tpu.data.dataset.dataset_writer import AudioDatasetWriter
    from howl_tpu.utils.audio_utils import write_wav

    rng = np.random.default_rng(7)
    src = tmp_path / "src"
    src.mkdir()
    metadata = []
    for i in range(9):
        name = f"clip{i}.wav"
        write_wav(src / name, tone(300 + 40 * i, 0.3, rng=rng), SR)
        metadata.append(AudioClipMetadata(path=src / name, transcription=f"words number {i}"))

    def write_with(workers, out_name):
        ds = AudioClipDataset([m for m in metadata], DatasetType.TRAINING, sample_rate=SR, mono=True)
        out = tmp_path / out_name
        AudioDatasetWriter(ds, AudioDatasetType.RAW).write(out, num_workers=workers)
        return out

    seq, par = write_with(1, "seq"), write_with(4, "par")
    seq_files = sorted(p.relative_to(seq) for p in seq.rglob("*") if p.is_file())
    par_files = sorted(p.relative_to(par) for p in par.rglob("*") if p.is_file())
    assert seq_files == par_files and len(seq_files) > 9
    for rel in seq_files:
        assert (seq / rel).read_bytes() == (par / rel).read_bytes(), rel

    # statistics: pooled == sequential
    from howl_tpu.context import InferenceContext

    searcher = InferenceContext(vocab=["words"], token_type="word").searcher
    ds = AudioClipDataset(metadata, DatasetType.TRAINING, sample_rate=SR, mono=True)
    s1 = ds.compute_statistics(word_searcher=searcher, num_workers=1)
    s4 = ds.compute_statistics(word_searcher=searcher, num_workers=4)
    assert s1 == s4 and s1["vocab_counts"] == {"words": 9}

    # TextGrid ingestion: spawn-process pool == sequential
    from howl_tpu.data.common.tokenizer import TokenType
    from howl_tpu.etl.aligned_generator import AlignedAudioDatasetGenerator

    grids = tmp_path / "grids"
    grids.mkdir()
    for i in range(4):
        (grids / f"clip{i}.TextGrid").write_text(
            'item [1]:\n    class = "IntervalTier"\n    name = "words"\n'
            "    intervals: size = 1\n"
            f"    intervals [1]:\n        xmin = 0.1\n        xmax = 0.{4 + i}\n        text = \"hey\"\n"
        )
    (grids / "broken.TextGrid").write_text("not a textgrid at all")
    a1 = AlignedAudioDatasetGenerator._load_mfa_alignments(grids, TokenType.WORD, num_workers=1)
    a2 = AlignedAudioDatasetGenerator._load_mfa_alignments(grids, TokenType.WORD, num_workers=2)
    assert sorted(a1) == sorted(a2) == [f"clip{i}" for i in range(4)]
    for stem in a1:
        assert a1[stem].transcription == a2[stem].transcription
        assert a1[stem].end_timestamps == a2[stem].end_timestamps
