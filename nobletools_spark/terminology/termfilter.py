"""Synonym cleanup rules (H1) + Schwartz-Hearst acronym extraction.

Behavior-matched to the reference engine:
- term filter rule chain      tools/TermFilter.java:44-401 (Hettne et al.
  2010 rewrite/suppress rules; first applicable rule wins, term kept
  verbatim when none applies)
- qualifier parenthetical set resources/TermFilterQualifiers.txt
- acronym extraction          tools/AcronymDetector.java:91-161
  (``extractAcronym`` long-form/(SHORT) and ``MM - Malignant melanoma``
  shapes with the reverse letter-alignment walk)

Pure-Python string functions: at build time they run inside a pandas UDF
over exploded synonyms (``build.py``); at match time ``extract_acronym``
feeds the document-level acronym pass (context/acronyms.py).
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from ..text import tools as T

# resources/TermFilterQualifiers.txt — semantic-type parentheticals
QUALIFIER_FILTER = {
    "disorder", "procedure", "finding", "organism", "substance",
    "body structure", "product", "qualifier value", "observable entity",
    "systemic", "manifestation", "physical object", "etiology",
    "morphologic abnormality", "occupation", "event", "situation",
    "regime/therapy", "specimen", "unintentional", "dimethylamino",
    "attribute", "environment", "or disorder", "assessment scale",
    "allelic variant", "cell", "navigational concept", "geographic location",
    "combined site", "cell structure", "including anastomotic", "alpha",
    "bone", "person", "Human", "mechanical", "strain", "chronic", "partial",
    "acute", "ethnic group",
}


@dataclass(frozen=True)
class Acronym:
    long_form: str
    short_form: str


def _aligned_expanded_form(expanded: str, acronym: str) -> str | None:
    """Reverse letter-alignment walk (AcronymDetector.java:91-129): walk the
    acronym's capital letters right-to-left against the expanded words,
    skipping stop/empty words, allowing multi-letter-per-word hits; return
    the suffix of ``expanded`` that spells the acronym, or None."""
    words = re.split(r"[^A-Za-z]+", expanded.strip())
    acronym = re.sub(r"[^A-Z]", "", acronym)
    k = 0
    s = 0
    for i in range(len(acronym) - 1, -1, -1):
        c = acronym[i]
        j = (len(words) - len(acronym)) + i - s
        if j >= len(words) or j < 0:
            return None
        if len(words[j]) == 0 or T.is_stop_word(words[j]):
            j -= 1
            s += 1
        if j < 0:
            return None
        if len(words[j]) > 0 and c.lower() != words[j][0].lower():
            if c.lower() in words[j].lower():
                s -= 1
            else:
                return None
        k = expanded.rfind(words[j])
    return expanded[k:]


_PAREN_FORM = re.compile(r"(([A-Z]?[a-z-0-9]+ )+)\(([A-Z-0-9]+s?)\)")
_DASH_FORM = re.compile(r"([A-Z]{2,4})\s*-\s*(([A-Z]?[a-z-0-9]+\s*)+)")


def extract_acronym(phrase: str) -> Acronym | None:
    """AcronymDetector.extractAcronym:133-161 — ``Long Form (ACR)`` first,
    then ``MM - Malignant melanoma``; both validated by the alignment walk;
    single-letter and all-digit acronyms rejected."""
    text = T.strip_diacritics(phrase)
    m = _PAREN_FORM.search(text)
    if m:
        expanded = _aligned_expanded_form(m.group(1), m.group(3))
        acr = m.group(3)
        if expanded is not None and len(acr) > 1 and not acr.isdigit():
            return Acronym(expanded, acr)
    m = _DASH_FORM.search(text)
    if m:
        expanded = _aligned_expanded_form(m.group(2), m.group(1))
        acr = m.group(1)
        if expanded is not None and len(acr) > 1 and not acr.isdigit():
            return Acronym(expanded, acr)
    return None


# ------------------------------------------------------------------ rules --
# Each rule: (is_applicable, filter) — first applicable rule wins
# (TermFilter.filter:365-381). A filter returns the rewritten term set
# (empty = suppress).

_EC_NUMBER = re.compile(r".*\d+\.\d+\.\d+\.\d+.*")
_INVERSION = re.compile(r"([^,]+), ([^,]+)")
_POSSESSIVE = re.compile(r".*['’]s.*")
_ANGULAR = re.compile(r".*[<\[].*[>\]].*")
_SEMTYPE_PAREN = re.compile(r".* \(([A-Za-z ]+)\)$")


def _affix_match(t: str, affixes, comma_raw: str | None = None) -> bool:
    for a in affixes:
        if t.startswith(a) or t.endswith(" " + a):
            return True
        if comma_raw is not None and comma_raw.endswith("," + a):
            return True
    return False


def _r_at_sign(term: str):
    if "@" in term:
        return set()
    return None


def _r_ec_number(term: str):
    if _EC_NUMBER.fullmatch(term):
        return set()
    return None


def _r_nec(term: str):
    t = term.lower()
    if _affix_match(t, ("nec", "not elsewhere classified", "unclassified",
                        "without mention"), term):
        return set()
    return None


def _r_nos(term: str):
    t = term.lower()
    for a in ("nos", "not specified", "unspecified", "not otherwise specified"):
        if t.startswith(a + " ") or t.endswith(" " + a) or t.endswith("," + a):
            return set()
    return None


def _r_misc(term: str):
    t = term.lower()
    for a in ("other", "deprecated", "unspecified", "unknown", "miscellaneous",
              "no"):
        if t.startswith(a + " ") or t.endswith(" " + a) or term.endswith("," + a):
            return set()
    return None


def _r_long_term(term: str):
    # words > 5 after normalization without stemming (TermFilter.java:200-208)
    if len(T.normalize_words(term, stem_words=False, strip_digits=True,
                             strip_stop_words=True)) > 5:
        return set()
    return None


def _r_structure_of(term: str):
    t = term.lower()
    for a in ("structure of", "entire", "structure"):
        if t.startswith(a + " ") or t.endswith(" " + a):
            return set()
    return None


def _r_laterality(term: str):
    t = term.lower()
    for a in ("left", "right", "bilateral", "or", "and"):
        if re.fullmatch(r".*\b" + a + r"\b.*", t):
            return set()
    return None


def _r_inversion(term: str):
    m = _INVERSION.fullmatch(term)
    if m:
        return {m.group(2) + " " + m.group(1)}
    return None


def _r_possessive(term: str):
    if _POSSESSIVE.fullmatch(term):
        return {re.sub(r"([A-Za-z]+)['’]s ", r"\1 ", term)}
    return None


def _r_acronym(term: str):
    acr = extract_acronym(term)
    if acr is not None:
        return {acr.long_form, acr.short_form}
    return None


def _r_angular(term: str):
    if _ANGULAR.fullmatch(term):
        return {re.sub(r"[<\[].*[>\]]", "", term).strip()}
    return None


def _r_semtype_paren(term: str):
    m = _SEMTYPE_PAREN.fullmatch(term)
    if m:
        if m.group(1) in QUALIFIER_FILTER:
            term = re.sub(r"\([A-Za-z ]+\)", "", term)
        return {term.strip()}
    return None


_RULES = (_r_at_sign, _r_ec_number, _r_nec, _r_nos, _r_misc, _r_long_term,
          _r_structure_of, _r_laterality, _r_inversion, _r_possessive,
          _r_acronym, _r_angular, _r_semtype_paren)


def filter_term(term: str) -> list[str]:
    """Apply the first applicable rule; unmatched terms pass through."""
    for rule in _RULES:
        out = rule(term)
        if out is not None:
            return sorted(out) if len(out) > 1 else list(out)
    return [term]


def filter_terms(synonyms) -> list[str]:
    """TermFilter.filter(Collection):365-381 — insertion-ordered dedupe."""
    out: dict[str, None] = {}
    for syn in synonyms:
        for t in filter_term(syn):
            out.setdefault(t, None)
    return list(out)
