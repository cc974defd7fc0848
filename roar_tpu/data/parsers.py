"""Char parsers with cleaning + tokenization.

Re-design of roar/collections/common/parts/preprocessing/parsers.py
(CharParser :12, ENCharParser :108, RUCharParser :162, make_parser :209) —
the text path FastPitchModel takes when `learn_alignment` is false
(models/fastpitch.py:277-285 builds an ENCharParser over the tokenizer's
charset).  Note this module's CharParser handles multi-char special labels
and normalization; the ASR-dataset CharParser (data/asr_datasets.py) is the
bare id-mapping variant.
"""

from __future__ import annotations

import string
from typing import List, Optional

from roar_tpu.data import cleaners


class CharParser:
    """Functor parsing raw strings into lists of int tokens
    (parsers.py:12-107)."""

    def __init__(
        self,
        labels: List[str],
        *,
        unk_id: int = -1,
        blank_id: int = -1,
        do_normalize: bool = True,
        do_lowercase: bool = True,
        do_tokenize: bool = True,
    ):
        self._labels = labels
        self._unk_id = unk_id
        self._blank_id = blank_id
        self._do_normalize = do_normalize
        self._do_lowercase = do_lowercase
        self._do_tokenize = do_tokenize
        self._labels_map = {label: index for index, label in enumerate(labels)}
        self._special_labels = {label for label in labels if len(label) > 1}

    def __call__(self, text: str):
        if self._do_normalize:
            text = self._normalize(text)
            if text is None:
                return None
        if not self._do_tokenize:
            return text
        return self._tokenize(text)

    def _normalize(self, text: str) -> Optional[str]:
        text = text.strip()
        if self._do_lowercase:
            text = text.lower()
        return text

    def _tokenize(self, text: str) -> List[int]:
        tokens = []
        for word_id, word in enumerate(text.split(" ")):
            if word_id != 0:
                tokens.append(self._labels_map.get(" ", self._unk_id))
            if word in self._special_labels:
                tokens.append(self._labels_map[word])
                continue
            for char in word:
                tokens.append(self._labels_map.get(char, self._unk_id))
        return [token for token in tokens if token != self._blank_id]

    def decode(self, ids) -> str:
        r_map = {v: k for k, v in self._labels_map.items()}
        r_map[len(self._labels_map)] = "<BOS>"
        r_map[len(self._labels_map) + 1] = "<EOS>"
        r_map[len(self._labels_map) + 2] = "<P>"
        return "".join(r_map[int(i)] for i in ids if int(i) in r_map)


class ENCharParser(CharParser):
    """English parser: full cleaners pipeline in _normalize
    (parsers.py:108-160)."""

    PUNCTUATION_TO_REPLACE = {"+": "plus", "&": "and", "%": "percent"}

    def __init__(self, abbreviation_version=None, make_table=True, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self._table = self._make_trans_table() if make_table else None
        self.abbreviation_version = abbreviation_version

    def _make_trans_table(self):
        punctuation = string.punctuation
        for char in self.PUNCTUATION_TO_REPLACE:
            punctuation = punctuation.replace(char, "")
        for label in self._labels:
            punctuation = punctuation.replace(label, "")
        return str.maketrans(punctuation, " " * len(punctuation))

    def _normalize(self, text: str) -> Optional[str]:
        try:
            return cleaners.clean_text(
                string=text,
                table=self._table,
                punctuation_to_replace=self.PUNCTUATION_TO_REPLACE,
                abbreviation_version=self.abbreviation_version,
            )
        except Exception:
            return None


class RUCharParser(CharParser):
    """Cyrillic parser (parsers.py:162-206)."""

    PUNCTUATION_TO_REPLACE = {"+": "плюс", "ё": "е"}

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self._table = self._make_trans_table()

    def _make_trans_table(self):
        punctuation = string.punctuation
        for char in self.PUNCTUATION_TO_REPLACE:
            punctuation = punctuation.replace(char, "")
        for label in self._labels:
            punctuation = punctuation.replace(label, "")
        return str.maketrans(punctuation, " " * len(punctuation))

    def _normalize(self, text: str) -> Optional[str]:
        try:
            return cleaners.clean_text(
                string=text,
                table=self._table,
                punctuation_to_replace=self.PUNCTUATION_TO_REPLACE,
            )
        except Exception:
            return None


NAME_TO_PARSER = {"base": CharParser, "en": ENCharParser, "ru": RUCharParser}


def make_parser(labels: Optional[List[str]] = None, name: str = "base", **kwargs) -> CharParser:
    """Parser factory (parsers.py:209-244)."""
    if name not in NAME_TO_PARSER:
        raise ValueError("Invalid parser name.")
    if labels is None:
        labels = list(string.printable)
    return NAME_TO_PARSER[name](labels=labels, **kwargs)
