"""Differential parity: howl_tpu label algebra vs the ACTUAL reference code.

Imports the reference's pure-Python modules from /root/reference (with a
pydantic-v1 ``BaseSettings`` shim — v2 moved it to pydantic-settings) and
property-tests howl_tpu against them on randomized transcripts, timestamps,
and pronunciations:

  * VocabTrie.max_split / Vocab.__getitem__      (ref howl/data/common/vocab.py)
  * WakeWordTokenizer encode/decode              (ref tokenizer.py)
  * WordFrameLabeler.compute_frame_labels        (ref labeler.py:156-182)
  * PhonePhrase index algebra + audible_index    (ref phone.py:39-150)
  * PronunciationDictionary.from_file/encode     (ref phone.py:145-171)
  * Word + phonetic transcript searchers         (ref searcher.py:74,122)
  * PhoneticFrameLabeler.compute_frame_labels    (ref labeler.py:29-150)

Known, deliberate divergences (asserted separately, not diffed):
  * ref ``PhoneticFrameLabeler.transform("<unk>")`` is broken — its recovery
    path sets idx=-1 so ``word[idx:]`` leaves ">" behind and the retry raises;
    howl_tpu maps "<unk>" to the ``spn`` phone as the code plainly intends.
  * ref labelers IndexError on truncated ``end_timestamps``; howl_tpu guards.
"""

from __future__ import annotations

import random
import sys

import pytest

VOCAB_WORDS = ["hey", "fire", "fox"]
# includes prefixes of vocab words, vocab words with suffixes/punctuation,
# case variants, and unrelated words
WORD_POOL = VOCAB_WORDS + [
    "he",
    "hey",
    "heyday",
    "f",
    "firefox",
    "fire,",
    "fox.",
    "FIRE",
    "Fox",
    "the",
    "quick",
    "firework",
    "ox",
    "hex",
    "h",
    "heyyy",
    "foxes",
    "hey's",
]


@pytest.fixture(scope="module")
def ref():
    """The reference howl package, imported read-only from /root/reference."""
    import pydantic

    if "BaseSettings" not in pydantic.__dict__:  # hasattr would re-raise the v2 import error
        pydantic.BaseSettings = pydantic.BaseModel  # v1 shim: env overrides unused in tests
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    import howl.data.common.labeler as ref_labeler
    import howl.data.common.metadata as ref_metadata
    import howl.data.common.phone as ref_phone
    import howl.data.common.searcher as ref_searcher
    import howl.data.common.tokenizer as ref_tokenizer
    import howl.data.common.vocab as ref_vocab
    from howl.settings import SETTINGS as REF_SETTINGS

    class Ref:
        vocab = ref_vocab
        tokenizer = ref_tokenizer
        labeler = ref_labeler
        searcher = ref_searcher
        phone = ref_phone
        metadata = ref_metadata
        settings = REF_SETTINGS

    return Ref


def ref_meta(ref, transcript: str, ts: list):
    """Reference AudioClipMetadata; pydantic v2 drops v1's implicit-None on
    bare Optional fields, so the optional phone fields are passed explicitly."""
    return ref.metadata.AudioClipMetadata(
        path="/tmp/x.wav",
        transcription=transcript,
        end_timestamps=ts,
        phone_strings=None,
        words=None,
        phone_end_timestamps=None,
    )


def random_transcript(rnd: random.Random, n_words=None) -> str:
    n = n_words if n_words is not None else rnd.randint(0, 8)
    return " ".join(rnd.choice(WORD_POOL) for _ in range(n))


def timestamps_for(transcript: str, rnd: random.Random) -> list:
    """Monotonic per-character end timestamps (one per char incl. spaces)."""
    t, out = 0.0, []
    for _ in transcript:
        t += rnd.uniform(10.0, 90.0)
        out.append(round(t, 3))
    return out


# ---------------------------------------------------------------- vocab / trie


def test_trie_max_split_parity(ref):
    from howl_tpu.data.common.vocab import VocabTrie

    rnd = random.Random(7)
    for trial in range(100):
        words = rnd.sample(WORD_POOL, rnd.randint(1, 6))
        ref_trie, our_trie = ref.vocab.VocabTrie(), VocabTrie()
        for w in words:
            ref_trie.add_word(w)
            our_trie.add_word(w)
        for _ in range(20):
            token = rnd.choice(WORD_POOL + ["", "heyfirefox", "xyz", "hey fire"])
            assert our_trie.max_split(token) == ref_trie.max_split(token), (words, token)


def test_vocab_getitem_parity(ref):
    from howl_tpu.data.common.vocab import Vocab

    for oov in (None, 3):
        rv = ref.vocab.Vocab(VOCAB_WORDS, oov_token_id=oov)
        ov = Vocab(VOCAB_WORDS, oov_token_id=oov)
        for item in ["hey", "HEY", "nope", 0, 1, 2, 99]:
            try:
                expected = rv[item]
            except ValueError:
                with pytest.raises(ValueError):
                    ov[item]
            else:
                assert ov[item] == expected, item
        assert len(ov) == len(rv)
        if oov is not None:
            assert ov.wakeword([0, 1, 2]) == rv.wakeword([0, 1, 2])


# ------------------------------------------------------------------ tokenizer


@pytest.mark.parametrize("ignore_oov", [True, False])
def test_tokenizer_encode_decode_parity(ref, ignore_oov):
    from howl_tpu.data.common.tokenizer import WakeWordTokenizer
    from howl_tpu.data.common.vocab import Vocab

    rnd = random.Random(11)
    rt = ref.tokenizer.WakeWordTokenizer(ref.vocab.Vocab(VOCAB_WORDS, oov_token_id=3), ignore_oov)
    ot = WakeWordTokenizer(Vocab(VOCAB_WORDS, oov_token_id=3), ignore_oov)
    for _ in range(200):
        transcript = random_transcript(rnd)
        assert ot.encode(transcript) == rt.encode(transcript), transcript
    for _ in range(50):
        ids = [rnd.randint(0, 2) for _ in range(rnd.randint(0, 5))]
        assert ot.decode(ids) == rt.decode(ids)


# -------------------------------------------------------------- word labeler


def test_word_frame_labeler_parity(ref):
    from howl_tpu.data.common.labeler import WordFrameLabeler
    from howl_tpu.data.common.metadata import AudioClipMetadata
    from howl_tpu.data.common.vocab import Vocab

    rnd = random.Random(13)
    rl = ref.labeler.WordFrameLabeler(ref.vocab.Vocab(VOCAB_WORDS, oov_token_id=3))
    ol = WordFrameLabeler(Vocab(VOCAB_WORDS, oov_token_id=3))
    for _ in range(200):
        transcript = random_transcript(rnd, n_words=rnd.randint(1, 8))
        ts = timestamps_for(transcript, rnd)
        ref_out = rl.compute_frame_labels(ref_meta(ref, transcript, ts))
        our_out = ol.compute_frame_labels(
            AudioClipMetadata(path="/tmp/x.wav", transcription=transcript, end_timestamps=ts)
        )
        assert our_out.timestamp_label_map == ref_out.timestamp_label_map, transcript
        assert our_out.start_timestamp == ref_out.start_timestamp, transcript
        assert our_out.char_indices == ref_out.char_indices, transcript


# ------------------------------------------------------------- phone algebra

PHONE_POOL = ["ay", "k", "s", "hh", "ey", "f", "aa", "r", "sil", "sp", "spn"]


def _random_phone_string(rnd: random.Random, lo=1, hi=8) -> str:
    return " ".join(rnd.choice(PHONE_POOL) for _ in range(rnd.randint(lo, hi)))


def test_phone_phrase_algebra_parity(ref):
    from howl_tpu.data.common.phone import PhonePhrase

    rnd = random.Random(17)
    for _ in range(150):
        s = _random_phone_string(rnd)
        rp = ref.phone.PhonePhrase.from_string(s)
        op = PhonePhrase.from_string(s)
        assert op.audible_transcript == rp.audible_transcript
        assert op.sil_indices == rp.sil_indices
        for i in range(len(rp.phones)):
            assert op.all_idx_to_transcript_idx(i) == rp.all_idx_to_transcript_idx(i)
        for i in range(len(rp.audible_phones)):
            assert op.audible_idx_to_all_idx(i) == rp.audible_idx_to_all_idx(i)
        # sub-phrase search parity, incl. the not-found ValueError contract
        query = ref.phone.PhonePhrase.from_string(_random_phone_string(rnd, 1, 3))
        our_query = PhonePhrase.from_string(query.text)
        start = rnd.randint(0, 3)
        try:
            expected = rp.audible_index(query, start)
        except ValueError:
            with pytest.raises(ValueError):
                op.audible_index(our_query, start)
        else:
            assert op.audible_index(our_query, start) == expected


def test_pronunciation_dictionary_parity(ref, tmp_path):
    from howl_tpu.data.common.phone import PronunciationDictionary

    content = (
        ";;; comment line\n"
        "hey HH EY\n"
        "fire F AY ER\n"
        "fire F AY R\n"
        "fox F AA K S\n"
        "a AH\n"
    )
    path = tmp_path / "dict.txt"
    path.write_text(content)
    rd = ref.phone.PronunciationDictionary.from_file(path)
    od = PronunciationDictionary.from_file(path)
    for word in ["hey", "fire", "fox", "a", "HEY ", "nope"]:
        assert (word in od) == (word in rd)
        try:
            expected = [p.text for p in rd.encode(word)]
        except ValueError:
            with pytest.raises(ValueError):
                od.encode(word)
        else:
            assert [p.text for p in od.encode(word)] == expected


# ------------------------------------------------------------------ searchers


def test_word_searcher_parity(ref):
    from howl_tpu.data.common.searcher import WordTranscriptSearcher
    from howl_tpu.data.common.vocab import Vocab

    rnd = random.Random(19)
    ref.settings.inference_engine.inference_sequence = [0, 1, 2]
    rs = ref.searcher.WordTranscriptSearcher(ref.vocab.Vocab(VOCAB_WORDS, oov_token_id=3))
    os_ = WordTranscriptSearcher(Vocab(VOCAB_WORDS, oov_token_id=3), inference_sequence=[0, 1, 2])
    for _ in range(300):
        transcript = random_transcript(rnd)
        assert os_.search(transcript) == rs.search(transcript), transcript
        assert os_.contains_any(transcript) == rs.contains_any(transcript), transcript
        assert os_.count_vocab(transcript) == rs.count_vocab(transcript), transcript


def test_phonetic_searcher_parity(ref):
    from howl_tpu.data.common.phone import PhonePhrase
    from howl_tpu.data.common.searcher import LabelColoring, PhoneticTranscriptSearcher

    rnd = random.Random(23)
    ref.settings.inference_engine.inference_sequence = [0, 1, 2]
    phrase_strs = ["hh ey", "f ay er", "f aa k s"]
    rc = ref.searcher.LabelColoring.sequential_coloring(3)
    oc = LabelColoring.sequential_coloring(3)
    assert oc.color_map == rc.color_map
    rs = ref.searcher.PhoneticTranscriptSearcher([ref.phone.PhonePhrase.from_string(s) for s in phrase_strs], rc)
    os_ = PhoneticTranscriptSearcher(
        [PhonePhrase.from_string(s) for s in phrase_strs], oc, inference_sequence=[0, 1, 2]
    )
    assert os_.pattern.pattern == rs.pattern.pattern
    for _ in range(200):
        transcript = _random_phone_string(rnd, 1, 12)
        assert os_.search(transcript) == rs.search(transcript), transcript
        assert os_.contains_any(transcript) == rs.contains_any(transcript), transcript


def test_label_coloring_extend_sequence_parity(ref):
    from howl_tpu.data.common.searcher import LabelColoring

    rc, oc = ref.searcher.LabelColoring(), LabelColoring()
    for args in [(2, None), (3, 5), (1, None)]:
        rc.extend_sequence(*args)
        oc.extend_sequence(*args)
    assert oc.color_map == rc.color_map
    assert oc.color_counter == rc.color_counter
    assert oc.label_counter == rc.label_counter


# -------------------------------------------------------- phonetic labeler


def _phone_dict_file(tmp_path):
    path = tmp_path / "cmudict.txt"
    path.write_text(
        "hey HH EY\n"
        "fire F AY ER\n"
        "fox F AA K S\n"
        "he HH IY\n"
        "y Y\n"
        "the DH AH\n"
        "ox AA K S\n"
        "f EH F\n"
    )
    return path


def test_phonetic_frame_labeler_parity(ref, tmp_path):
    from howl_tpu.data.common.labeler import PhoneticFrameLabeler
    from howl_tpu.data.common.metadata import AudioClipMetadata
    from howl_tpu.data.common.phone import PhonePhrase, PronunciationDictionary

    rnd = random.Random(29)
    path = _phone_dict_file(tmp_path)
    phrase_strs = ["hh ey", "f ay er", "f aa k s"]
    rl = ref.labeler.PhoneticFrameLabeler(
        [ref.phone.PhonePhrase.from_string(s) for s in phrase_strs],
        ref.phone.PronunciationDictionary.from_file(path),
    )
    ol = PhoneticFrameLabeler(
        [PhonePhrase.from_string(s) for s in phrase_strs], PronunciationDictionary.from_file(path)
    )
    words = ["hey", "fire", "fox", "he", "the", "ox", "heyy", "f", "fire,", "zzz", "Fox."]
    for _ in range(150):
        transcript = " ".join(rnd.choice(words) for _ in range(rnd.randint(1, 6)))
        # generous timestamps: one per phone position so neither side truncates
        ts = [round(40.0 * (i + 1), 2) for i in range(120)]
        ref_out = rl.compute_frame_labels(ref_meta(ref, transcript, ts))
        our_out = ol.compute_frame_labels(
            AudioClipMetadata(path="/tmp/x.wav", transcription=transcript, end_timestamps=ts)
        )
        assert our_out.timestamp_label_map == ref_out.timestamp_label_map, transcript


def test_phonetic_transform_unk_divergence(ref, tmp_path):
    """Documented divergence: ref's '<unk>' recovery is broken (leaves '>')."""
    from howl_tpu.data.common.labeler import PhoneticFrameLabeler
    from howl_tpu.data.common.phone import PhonePhrase, PronunciationDictionary

    path = _phone_dict_file(tmp_path)
    ol = PhoneticFrameLabeler([PhonePhrase.from_string("hh ey")], PronunciationDictionary.from_file(path))
    assert ol.transform("<unk>").text == "spn"
    rl = ref.labeler.PhoneticFrameLabeler(
        [ref.phone.PhonePhrase.from_string("hh ey")],
        ref.phone.PronunciationDictionary.from_file(path),
    )
    with pytest.raises(ValueError):
        rl.transform("<unk>")


def test_stride_differential_vs_reference(rng):
    """Window-for-window parity of utils.audio_utils.stride with the
    reference generator (ref howl/utils/audio_utils.py:26) across random
    geometries, including the drop_incomplete flag both ways."""
    import numpy as np

    torch = pytest.importorskip("torch")
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    if "librosa" not in sys.modules:
        # the reference module imports librosa at top level for silent_load;
        # stride() never touches it — a bare stub suffices in this image
        import types

        sys.modules["librosa"] = types.ModuleType("librosa")
    from howl.utils.audio_utils import stride as ref_stride

    from howl_tpu.utils.audio_utils import stride as our_stride

    r = random.Random(7)
    for _ in range(25):
        n = r.randint(0, 40000)
        window_ms = r.choice([100, 250, 500, 517])
        stride_ms = r.choice([50, 63, 125, 250])
        drop = r.random() < 0.5
        audio = rng.standard_normal(n).astype(np.float32)
        ours = list(our_stride(audio, window_ms, stride_ms, 16000, drop_incomplete=drop))
        refs = list(ref_stride(torch.from_numpy(audio), window_ms, stride_ms, 16000, drop_incomplete=drop))
        assert len(ours) == len(refs), (n, window_ms, stride_ms, drop)
        for a, b in zip(ours, refs):
            np.testing.assert_array_equal(a, b.numpy())
