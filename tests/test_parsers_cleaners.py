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


if __name__ == "__main__":
    import sys

    sys.exit(pytest.main([__file__, "-q"]))
