"""Tests for text cleaners + char parsers
(reference common/parts/preprocessing/{cleaners,parsers}.py)."""

import pytest

from roar_tpu.data import cleaners
from roar_tpu.data.parsers import CharParser, ENCharParser, make_parser


class TestNumberToWords:
    @pytest.mark.parametrize(
        "n,words",
        [
            (0, "zero"),
            (7, "seven"),
            (14, "fourteen"),
            (20, "twenty"),
            (42, "forty-two"),
            (100, "one hundred"),
            (123, "one hundred and twenty-three"),
            (1000, "one thousand"),
            (1234, "one thousand, two hundred and thirty-four"),
            (1000000, "one million"),
        ],
    )
    def test_cardinals(self, n, words):
        assert cleaners.number_to_words(n) == words

    @pytest.mark.parametrize(
        "n,words",
        [
            (1, "first"), (2, "second"), (3, "third"), (4, "fourth"),
            (5, "fifth"), (9, "ninth"), (12, "twelfth"), (20, "twentieth"),
            (21, "twenty-first"), (100, "one hundredth"),
        ],
    )
    def test_ordinals(self, n, words):
        assert cleaners.number_to_words(n, ordinal=True) == words

    def test_decimals(self):
        assert cleaners.number_to_words("3.5") == "three point five"
        assert cleaners.number_to_words("0.25") == "zero point two five"


class TestCleanText:
    def setup_method(self):
        self.parser = make_parser(list("abcdefghijklmnopqrstuvwxyz '"), "en")
        self.table = self.parser._table
        self.punct = ENCharParser.PUNCTUATION_TO_REPLACE

    def clean(self, s, version=None):
        return cleaners.clean_text(s, self.table, self.punct, version)

    def test_abbreviations(self):
        assert self.clean("Dr. Smith") == "doctor smith"
        assert self.clean("Mt. St. Helens").startswith("mt saint")

    def test_currency(self):
        assert self.clean("$5.50") == "five dollars and fifty cents"
        assert self.clean("$1.00") == "one dollar and zero cents"
        assert self.clean("$1") == "one dollar"

    def test_time(self):
        assert self.clean("at 7:30pm") == "at seven thirty pm"
        assert self.clean("at 9:00") == "at nine"

    def test_ordinal(self):
        assert self.clean("the 2nd time") == "the second time"

    def test_punct_replacement(self):
        assert self.clean("25% of A&B") == "twenty five percent of a and b"
        assert self.clean("1+1") == "one plus one"

    def test_transliteration(self):
        assert self.clean("Café naïve") == "cafe naive"

    def test_grouped_thousands(self):
        # commas/hyphens inside the expansion are punctuation-stripped by the
        # parser's translation table (parsers.py ENCharParser semantics)
        out = self.clean("1,234 people")
        assert out == "one thousand two hundred and thirty four people"


class TestCharParser:
    def test_base(self):
        p = CharParser(["a", "b", "c"])
        assert p("abc") == [0, 1, 2]

    def test_oov_and_blank(self):
        p = CharParser(["a", "b"], unk_id=-1, blank_id=-1)
        assert p("axb") == [0, 1]  # unk==blank -> dropped

    def test_special_labels(self):
        p = CharParser(["a", " ", "<sp>"])
        assert p("a <sp>") == [0, 1, 2]

    def test_decode_roundtrip(self):
        labels = list("abc ")
        p = CharParser(labels)
        assert p.decode(p("ab c")) == "ab c"

    def test_en_parser_end_to_end(self):
        p = make_parser(list("abcdefghijklmnopqrstuvwxyz '"), "en")
        ids = p("Mr. Jones bought 2 cars.")
        assert p.decode(ids) == "mister jones bought two cars"

    def test_make_parser_validates(self):
        with pytest.raises(ValueError):
            make_parser(["a"], name="nope")

    def test_en_parser_normalize_failure_returns_none(self):
        p = ENCharParser(labels=["a"], make_table=True)
        # clean_text raising inside -> None (reference behavior)
        assert p(None) is None


class TestTextNormalizerInjection:
    """FastPitchModel.parse applies an optional text_normalizer before
    tokenization (ref models/fastpitch.py:82-111,288-309)."""

    def _model(self, **extra):
        from roar_tpu.models.fastpitch_model import FastPitchModel

        cfg = {
            "learn_alignment": True,
            "symbols_embedding_dim": 16,
            "n_mel_channels": 8,
            "input_fft": {"n_layer": 1, "n_head": 1, "d_model": 16, "d_head": 8, "d_inner": 16},
            "output_fft": {"n_layer": 1, "n_head": 1, "d_model": 16, "d_head": 8, "d_inner": 16},
            "alignment_module": {"n_text_channels": 16, "n_att_channels": 8},
            "duration_predictor": {"input_size": 16, "filter_size": 8},
            "pitch_predictor": {"input_size": 16, "filter_size": 8},
            "text_tokenizer": {
                "_target_": "roar_tpu.data.tokenizers.EnglishCharsTokenizer",
                "pad_with_space": True,
            },
            **extra,
        }
        return FastPitchModel(cfg)

    def test_callable_normalizer_applied(self):
        calls = []

        def norm(text, **kw):
            calls.append((text, kw))
            return text.replace("2", "two")

        m = self._model(
            text_normalizer=norm,
            text_normalizer_call_kwargs={"verbose": False},
        )
        ids = m.parse("2 cats")
        assert calls == [("2 cats", {"verbose": False})]
        # parse tokenized the NORMALIZED text
        m2 = self._model()
        import numpy as np

        np.testing.assert_array_equal(ids, m2.parse("two cats"))

    def test_target_normalizer_with_normalize_method(self):
        m = self._model(
            text_normalizer={
                "_target_": "tests.test_parsers_cleaners._ExclaimNormalizer"
            }
        )
        # .normalize was bound and applied before tokenization
        m2 = self._model()
        import numpy as np

        np.testing.assert_array_equal(m.parse("abc"), m2.parse("abc!"))

    def test_missing_target_degrades_with_warning(self):
        import warnings as w

        with w.catch_warnings(record=True) as rec:
            w.simplefilter("always")
            m = self._model(
                text_normalizer={"_target_": "nemo_text_processing.Normalizer"}
            )
        assert m.normalizer_call is None
        assert any("text_normalizer" in str(r.message) for r in rec)
        assert m.parse("hello").size > 0  # parse still works


class _ExclaimNormalizer:
    """Stand-in for the reference Normalizer: exposes .normalize()."""

    def normalize(self, text, **kw):
        return text + "!"


if __name__ == "__main__":
    import sys

    sys.exit(pytest.main([__file__, "-q"]))
