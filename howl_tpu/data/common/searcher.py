"""Transcript searchers: does a transcript contain the wakeword / any vocab word.

(ref: howl/data/common/searcher.py:20,74,122)
"""

from __future__ import annotations

import re
from collections import defaultdict
from typing import List

from howl_tpu.data.common.phone import PhonePhrase
from howl_tpu.data.common.tokenizer import WakeWordTokenizer
from howl_tpu.data.common.vocab import Vocab
from howl_tpu.utils.logger import Logger


class LabelColoring:
    """Maps phone labels to word-group 'colors' (ref: searcher.py:20-57)."""

    def __init__(self):
        self.color_map = {}
        self.color_counter = 0
        self.label_counter = 0

    def append_label(self, label: int, color: int = None):
        if label in self.color_map:
            registered = self.color_map[label]
            if color is not None and color != registered:
                raise RuntimeError(
                    f"label {label} already registered with color {registered}, got {color}"
                )
            return
        color = self._inc_color_counter(color)
        self.color_map[label] = color
        self.label_counter = max(self.label_counter, label + 1)

    def _inc_color_counter(self, color: int = None) -> int:
        if color is None:
            color = self.color_counter
        else:
            self.color_counter = max(self.color_counter, color)
        self.color_counter += 1
        return color

    def extend_sequence(self, size: int, color: int = None):
        color = self._inc_color_counter(color)
        for label in range(self.label_counter, self.label_counter + size):
            self.color_map[label] = color
        self.label_counter += size

    @classmethod
    def sequential_coloring(cls, num_labels: int) -> "LabelColoring":
        coloring = cls()
        for label_idx in range(num_labels):
            coloring.append_label(label_idx)
        return coloring


class TranscriptSearcher:
    def __init__(self, inference_sequence: List[int] = None):
        if inference_sequence is None:
            from howl_tpu.settings import SETTINGS

            inference_sequence = SETTINGS.inference_engine.inference_sequence
        self.inference_sequence = list(inference_sequence)

    def search(self, item: str) -> bool:
        raise NotImplementedError

    def contains_any(self, item: str) -> bool:
        raise NotImplementedError


class WordTranscriptSearcher(TranscriptSearcher):
    """Wakeword-subsequence search over encoded transcripts (ref: searcher.py:74-120)."""

    def __init__(self, vocab: Vocab, **kwargs):
        super().__init__(**kwargs)
        self.vocab = vocab
        self.tokenizer = WakeWordTokenizer(self.vocab, ignore_oov=False)
        self._sequence_str = "".join(map(str, self.inference_sequence))

    def search(self, item: str) -> bool:
        encoded = "".join(map(str, self.tokenizer.encode(item)))
        return self._sequence_str in encoded

    def contains_any(self, item: str) -> bool:
        return any(e != self.vocab.oov_token_id for e in self.tokenizer.encode(item))

    def count_vocab(self, item: str, ignore_oov: bool = True) -> dict:
        encoded = self.tokenizer.encode(item)
        counter = {self.vocab[i]: 0 for i in range(len(self.vocab))}
        for encoding in encoded:
            if ignore_oov and encoding == self.vocab.oov_token_id:
                continue
            counter[self.vocab[encoding]] += 1
        return counter


class PhoneticTranscriptSearcher(TranscriptSearcher):
    """Regex search over audible phone transcripts (ref: searcher.py:122-144)."""

    def __init__(self, phrases: List[PhonePhrase], coloring: LabelColoring, **kwargs):
        super().__init__(**kwargs)
        self.phrases = phrases
        label_map = [(phrase.audible_transcript, coloring.color_map[idx]) for idx, phrase in enumerate(phrases)]
        buckets = defaultdict(list)
        for transcript, color in label_map:
            buckets[color].append(transcript)
        pattern_strings = []
        for _, transcripts in sorted(buckets.items(), key=lambda x: x[0]):
            pattern_strings.append("(" + "|".join(f"({x})" for x in transcripts) + ")")
        ordered = [pattern_strings[i] for i in self.inference_sequence]
        pattern_str = "^.*" + " ".join(ordered) + ".*$"
        Logger.debug(f"phonetic search pattern: {pattern_str}")
        self.pattern = re.compile(pattern_str)

    def search(self, item: str) -> bool:
        transcript = PhonePhrase.from_string(item).audible_transcript
        return self.pattern.match(transcript) is not None

    def contains_any(self, item: str) -> bool:
        transcript = PhonePhrase.from_string(item).audible_transcript
        return any(word.audible_transcript in transcript for word in self.phrases)
