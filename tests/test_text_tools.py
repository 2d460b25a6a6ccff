"""Normalization unit vectors (FIXTURES.md §7) pinning TextTools semantics."""

from nobletools_spark.text import tools as T
from nobletools_spark.text.porter import porter_stem


class TestPorter:
    # canonical Porter pairs from the algorithm paper / reference Javadoc
    CASES = [
        ("caresses", "caress"), ("ponies", "poni"), ("ties", "ti"),
        ("caress", "caress"), ("cats", "cat"), ("feed", "feed"),
        ("matting", "mat"), ("mating", "mate"), ("meeting", "meet"),
        ("milling", "mill"), ("messing", "mess"), ("meetings", "meet"),
        ("happy", "happi"), ("sky", "sky"), ("relational", "relat"),
        ("cancer", "cancer"), ("cancers", "cancer"), ("nevus", "nevu"),
        ("nevi", "nevi"), ("melanoma", "melanoma"), ("biopsies", "biopsi"),
        ("lesions", "lesion"), ("ulceration", "ulcer"), ("is", "is"),
        ("be", "be"), ("a", "a"), ("", ""),
    ]

    def test_vectors(self):
        for w, expect in self.CASES:
            assert porter_stem(w) == expect, w

    def test_short_words_unchanged(self):
        for w in ["a", "ab", "io", "x"]:
            assert porter_stem(w) == w


class TestGetWords:
    def test_delimiters(self):
        assert T.get_words("a,b!c?d;e:f-g_h/i|j") == list("abcdefghij")
        assert T.get_words("x<y>z^(w)[v]\"u\"") == list("xyzwvu")

    def test_float_period_preserved(self):
        assert T.get_words("dose 1.5 mg") == ["dose", "1.5", "mg"]
        assert T.get_words("v2.5.1") == ["v2", "5", "1"]
        assert T.get_words("e.g. test") == ["e", "g", "test"]

    def test_trailing_period_split(self):
        assert T.get_words("done.") == ["done"]
        assert T.get_words("a.b") == ["a", "b"]

    def test_empty(self):
        assert T.get_words("") == []
        assert T.get_words(None) == []


class TestNormalizeWords:
    def test_stop_words_and_stem(self):
        assert T.normalize_words("cancer of the skin") == ["cancer", "skin"]

    def test_genitive(self):
        assert T.normalize_words("Alzheimer's disease") == ["alzheim", "diseas"]

    def test_diacritics(self):
        assert T.normalize_words("Protégé") == ["proteg"]  # stemmed after ASCII-fold
        assert T.normalize_words("Protégé", stem_words=False) == ["protege"]

    def test_parenthetic_plural(self):
        assert T.normalize_words("finding(s)") == ["find"]

    def test_float_preserved(self):
        assert T.normalize_words("1.5 mg dose", strip_digits=True) == ["1.5", "mg", "dose"]

    def test_digits_stripped_when_asked(self):
        assert T.normalize_words("stage 3 cancer", strip_digits=True) == ["stage", "cancer"]
        assert T.normalize_words("stage 3 cancer", strip_digits=False) == ["stage", "3", "cancer"]

    def test_abbreviation_not_stemmed(self):
        # post-lowercase guard fires only on digit/punct-bearing tokens
        assert T.normalize_words("p53 testing") == ["p53", "test"]


class TestNormalize:
    def test_unique_unsorted(self):
        # dictionary-side term normalization: unique words, insertion order
        assert T.normalize("cancer of the skin", True, False, True,
                           unique_words=True, sort_words=False) == "cancer skin"
        assert T.normalize("skin cancer", True, False, True,
                           unique_words=True, sort_words=False) == "skin cancer"

    def test_sorted_default(self):
        assert T.normalize("skin cancer", True, False, True) == "cancer skin"


class TestAbbreviation:
    def test_allcaps_short(self):
        assert T.is_likely_abbreviation("DCIS")
        assert T.is_likely_abbreviation("FISH")
        assert not T.is_likely_abbreviation("fish")
        assert not T.is_likely_abbreviation("Fish")

    def test_mixed(self):
        assert T.is_likely_abbreviation("p53")
        assert T.is_likely_abbreviation("BRCA1")
        assert T.is_likely_abbreviation("mRNA")
        assert not T.is_likely_abbreviation("Melanoma")

    def test_multiword(self):
        assert not T.is_likely_abbreviation("A B")


class TestPlural:
    def test_plural_suffixes(self):
        for w in ["cancers", "nevi", "bacteria", "churches", "ferries"]:
            assert T.is_plural(w), w
        # the permissive table calls anything ending in a plural suffix plural
        assert T.is_plural("melanoma")  # ends 'a'

    def test_not_plural(self):
        assert not T.is_plural("skin")
        assert not T.is_plural("deep")


class TestStringStats:
    def test_uppercase(self):
        st = T.StringStats("ABC")
        assert st.is_uppercase and not st.is_lowercase

    def test_capitalized(self):
        assert T.StringStats("Hello").is_capitalized
        assert not T.StringStats("HEllo").is_capitalized
