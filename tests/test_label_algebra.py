"""Unit tests for vocab/trie, tokenizer, labelers, searchers, phones, context.

Behavioral spec from the reference unit tests (test/data/common/*_test.py).
"""

import numpy as np
import pytest


def test_vocab_trie_max_split():
    from howl_tpu.data.common.vocab import VocabTrie

    trie = VocabTrie()
    trie.add_word("hey")
    trie.add_word("fire")
    trie.add_word("fox")
    assert trie.max_split("fire") == ("fire", "")
    assert trie.max_split("firefox") == ("fire", "fox")
    assert trie.max_split("heyyy") == ("hey", "yy")
    # prefix that is not a full vocab word -> no match
    assert trie.max_split("fi") == ("", "fi")
    assert trie.max_split("banana") == ("", "banana")
    # case insensitivity
    assert trie.max_split("FIRE") == ("FIRE", "")


def test_vocab_oov_and_wakeword():
    from howl_tpu.data.common.vocab import Vocab

    vocab = Vocab({"hey": 0, "fire": 1, "fox": 2}, oov_token_id=3)
    assert vocab["hey"] == 0
    assert vocab["HEY"] == 0
    assert vocab["banana"] == 3
    assert vocab[1] == "fire"
    assert vocab[99] == "[OOV]"
    assert len(vocab) == 3
    assert vocab.wakeword([0, 1, 2]) == "hey fire fox"


def test_tokenizer_encode_decode():
    from howl_tpu.data.common.tokenizer import WakeWordTokenizer
    from howl_tpu.data.common.vocab import Vocab

    vocab = Vocab({"hey": 0, "fire": 1, "fox": 2}, oov_token_id=3)
    tok = WakeWordTokenizer(vocab, ignore_oov=True)
    assert tok.encode("hey fire fox") == [0, 1, 2]
    assert tok.encode("i saw a fire fox today") == [1, 2]
    tok_oov = WakeWordTokenizer(vocab, ignore_oov=False)
    assert tok_oov.encode("i saw fire") == [3, 3, 1]
    assert tok.decode([0, 1, 2]) == "hey fire fox"


def test_word_frame_labeler():
    from howl_tpu.data.common.labeler import WordFrameLabeler
    from howl_tpu.data.common.metadata import AudioClipMetadata
    from howl_tpu.data.common.vocab import Vocab

    vocab = Vocab({"hey": 0, "fire": 1, "fox": 2}, oov_token_id=3)
    labeler = WordFrameLabeler(vocab)
    # "hey fire fox": chars h-e-y( )f-i-r-e( )f-o-x with end timestamps per char
    transcript = "hey fire fox"
    end_ts = [float(100 * (i + 1)) for i in range(len(transcript))]
    meta = AudioClipMetadata(path="a.wav", transcription=transcript, end_timestamps=end_ts)
    fld = labeler.compute_frame_labels(meta)
    # 'hey' ends at char idx 2 -> ts 300; 'fire' ends at char idx 7 -> ts 800;
    # 'fox' ends at char idx 11 -> ts 1200
    assert fld.timestamp_label_map == {300.0: 0, 800.0: 1, 1200.0: 2}
    assert fld.start_timestamp[0] == (0, 0.0)
    assert fld.char_indices[1] == (1, [4, 5, 6, 7])


def test_word_searcher():
    from howl_tpu.data.common.searcher import WordTranscriptSearcher
    from howl_tpu.data.common.vocab import Vocab

    vocab = Vocab({"hey": 0, "fire": 1, "fox": 2}, oov_token_id=3)
    searcher = WordTranscriptSearcher(vocab, inference_sequence=[0, 1, 2])
    assert searcher.search("well hey fire fox yes")
    assert not searcher.search("hey fox fire")  # wrong order
    assert not searcher.search("hey fire")  # incomplete
    assert searcher.contains_any("the fox jumped")
    assert not searcher.contains_any("nothing here")
    counts = searcher.count_vocab("fire fire fox")
    assert counts == {"hey": 0, "fire": 2, "fox": 1}


def test_word_searcher_subsequence_not_contiguous_words():
    from howl_tpu.data.common.searcher import WordTranscriptSearcher
    from howl_tpu.data.common.vocab import Vocab

    # reference semantics: encode with OOV then substring-match the digit string,
    # so OOV words BETWEEN sequence words break the match
    vocab = Vocab({"hey": 0, "fire": 1, "fox": 2}, oov_token_id=3)
    searcher = WordTranscriptSearcher(vocab, inference_sequence=[0, 1, 2])
    assert not searcher.search("hey big fire fox")


def test_phone_phrase_indices():
    from howl_tpu.data.common.phone import PhonePhrase

    pp = PhonePhrase.from_string("abc sil ghi")
    assert pp.audible_transcript == "abc ghi"
    assert pp.all_idx_to_transcript_idx(0) == 3
    assert pp.all_idx_to_transcript_idx(1) == 7
    assert pp.all_idx_to_transcript_idx(2) == 11
    assert pp.audible_idx_to_all_idx(0) == 0
    assert pp.audible_idx_to_all_idx(1) == 2
    ghi = PhonePhrase.from_string("ghi")
    assert pp.audible_index(ghi, 0) == 1
    with pytest.raises(ValueError):
        pp.audible_index(PhonePhrase.from_string("zzz"), 0)


def test_pronunciation_dictionary(tmp_path):
    from howl_tpu.data.common.phone import PronunciationDictionary

    dict_file = tmp_path / "dict.txt"
    dict_file.write_text("hey HH EY1\nfire F AY1 ER0\nfirefox F AY1 ER0 F AA1 K S\n;;; comment\n")
    pdict = PronunciationDictionary.from_file(dict_file)
    assert "hey" in pdict
    assert "HEY" in pdict
    assert "nope" not in pdict
    assert pdict.encode("fire")[0].audible_transcript == "f ay1 er0"
    with pytest.raises(ValueError):
        pdict.encode("nope")


def test_phonetic_labeler(tmp_path):
    from howl_tpu.data.common.labeler import PhoneticFrameLabeler
    from howl_tpu.data.common.metadata import AudioClipMetadata
    from howl_tpu.data.common.phone import PhonePhrase, PronunciationDictionary

    dict_file = tmp_path / "dict.txt"
    dict_file.write_text("hey HH EY1\nfire F AY1 ER0\n")
    pdict = PronunciationDictionary.from_file(dict_file)
    phrases = [PhonePhrase.from_string("hh ey1"), PhonePhrase.from_string("f ay1 er0")]
    labeler = PhoneticFrameLabeler(phrases, pdict)
    meta = AudioClipMetadata(
        path="a.wav", transcription="hey fire", end_timestamps=[100.0 * (i + 1) for i in range(10)]
    )
    fld = labeler.compute_frame_labels(meta)
    # 'hh ey1' found at audible index 0 -> ts end_ts[0]; 'f ay1 er0' at index 2 -> end_ts[2]
    assert fld.timestamp_label_map == {100.0: 0, 300.0: 1}


def test_inference_context_word():
    from howl_tpu.context import InferenceContext

    ctx = InferenceContext(vocab=["hey", "fire", "fox"], token_type="word")
    assert ctx.num_labels == 4  # 3 words + [OOV]
    assert ctx.negative_label == 3
    assert ctx.wake_word == "hey fire fox"
    assert ctx.blank_label == -1
    ctx_ctc = InferenceContext(vocab=["fire"], token_type="word", use_blank=True)
    assert ctx_ctc.blank_label == 2
    assert ctx_ctc.num_labels == 3


def test_inference_context_phone(tmp_path):
    from howl_tpu.context import InferenceContext

    dict_file = tmp_path / "dict.txt"
    dict_file.write_text("hey HH EY1\nfire F AY1 ER0\n")
    ctx = InferenceContext(
        vocab=["hey", "fire"], token_type="phone", phone_dictionary_path=str(dict_file)
    )
    # hey -> 2 phones, fire -> 3 phones, + [OOV]
    assert ctx.num_labels == 6
    assert ctx.negative_label == 5
    assert ctx.coloring is not None
    # phones of the same word share a color
    assert ctx.coloring.color_map[0] == ctx.coloring.color_map[1]
    assert ctx.coloring.color_map[2] == ctx.coloring.color_map[3] == ctx.coloring.color_map[4]
    assert ctx.searcher.search("hh ey1 f ay1 er0")
    assert not ctx.searcher.search("f ay1 er0 hh ey1")


def test_metadata_json_roundtrip(tmp_path):
    from howl_tpu.data.common.metadata import AudioClipMetadata

    meta = AudioClipMetadata(
        path="/data/audio/abc.wav", transcription="hey fire fox", end_timestamps=[1.0, 2.0, 3.0]
    )
    line = meta.to_json()
    back = AudioClipMetadata.from_json(line)
    assert back.audio_id == "abc"
    assert back.transcription == "hey fire fox"
    assert back.end_timestamps == [1.0, 2.0, 3.0]
    # unknown fields survive in extra and round-trip
    import json

    raw = json.loads(line)
    raw["custom_field"] = 42
    back2 = AudioClipMetadata.from_json(json.dumps(raw))
    assert back2.extra["custom_field"] == 42
    assert "custom_field" in back2.to_json()


def test_sample_rescaling():
    from howl_tpu.data.common.label import FrameLabelData
    from howl_tpu.data.common.metadata import AudioClipMetadata
    from howl_tpu.data.common.sample import Sample

    meta = AudioClipMetadata(path="a.wav", transcription="fire")
    fld = FrameLabelData({1000.0: 0}, [(0, 500.0)], [(0, [0, 1, 2, 3])])
    sample = Sample(meta, np.zeros(16000, np.float32), 16000, label_data=fld)
    stretched = sample.with_audio(np.zeros(8000, np.float32), scale=0.5)
    assert stretched.label_data.timestamp_label_map == {500.0: 0}
    cleared = sample.with_audio(np.zeros(100, np.float32), new=True)
    assert cleared.label_data.timestamp_label_map == {}
    assert cleared.metadata.transcription == ""
    # original untouched
    assert sample.label_data.timestamp_label_map == {1000.0: 0}
