"""In-memory dictionary (the broadcast small side of the match join).

This is the engine's replacement for the reference's ten JDBM disk hashtables
(``NobleCoderTerminology.Storage``, NobleCoderTerminology.java:148-160): the
word->terms (WT) and term->concepts (TC) tables plus word stats, blacklist,
regex synonyms and concept metadata, built once per terminology and shipped
to executors via ``SparkContext.broadcast``. At UMLS scale the same tables
live as columnar DataFrames (see ``build.py``) and the match stage can flip
to a shuffle join keyed by rarest word without changing semantics.

Build semantics follow ``addConcept`` (NobleCoderTerminology.java:1142-1214):
- synonyms -> normalized terms via ``TextTools.normalize(stem, digits, stop,
  unique=True, sort=False)`` with the maxWordsInTerm cap
  (NobleCoderUtils.getNormalizedTerms:287-323);
- ``/regex/`` synonyms go to the regex table wrapped as ``\\b(...)\\b`` unless
  purely non-word (:1161-1183);
- word stats count (concept, term) insertion events per word, which is what
  drives the matcher's rarest-word-first greedy order (:2379-2396);
- the blacklist pre-prunes posting lists of hot words
  (util/BlacklistHandler.java:38-110) — the reference's manual skew defense,
  kept here both for parity and as the hot-key side table for salting.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from ..config import SearchConfig
from ..text import tools as T

BLACKLIST_CUTOFF = 0.002
BLACKLIST_TOP_CUTOFF = 0.1
BLACKLIST_MIN_TERMS = 100


@dataclass(frozen=True)
class ConceptMeta:
    """Per-CUI metadata needed by scoring/filtering (Concept.java:26-46)."""

    cui: str
    name: str
    synonyms: tuple[str, ...] = ()
    sem_types: tuple[str, ...] = ()
    sources: tuple[str, ...] = ()
    # (text, form) pairs; form in {PT, PN, SY, AB, ACR, ...}
    terms: tuple[tuple[str, str], ...] = ()
    definitions: tuple[str, ...] = ()
    codes: tuple[tuple[str, str], ...] = ()  # (source, code)
    # free-form properties (Concept.java properties map) — carries the
    # ConText hasActionEn/windowSize/hasTermination/... metadata (F3/F4)
    props: tuple[tuple[str, str], ...] = ()

    def get_prop(self, key: str) -> str | None:
        for k, v in self.props:
            if k == key:
                return v
        return None

    def single_word_synonyms_desc(self) -> tuple[str, ...]:
        """TreeSet(reverseOrder) of single-word synonyms
        (NobleCoderUtils.getSingleWordSynonyms:104-112)."""
        return tuple(sorted({s for s in self.synonyms if " " not in s},
                            reverse=True))


def _all_synonyms(name: str, synonyms) -> list[str]:
    """Preferred name first, then synonyms, de-duplicated keeping order."""
    out: dict[str, None] = {name: None}
    for s in synonyms:
        out.setdefault(s, None)
    return list(out)


@dataclass
class Dictionary:
    """WT/TC tables + metadata; values are tuples for cheap pickling."""

    concepts: dict[str, ConceptMeta] = field(default_factory=dict)
    term_map: dict[str, tuple[str, ...]] = field(default_factory=dict)
    word_map: dict[str, tuple[str, ...]] = field(default_factory=dict)
    word_stats: dict[str, int] = field(default_factory=dict)  # termCount
    word_is_term: set[str] = field(default_factory=set)
    blacklist: dict[str, tuple[str, ...]] = field(default_factory=dict)
    regex_map: dict[str, tuple[str, ...]] = field(default_factory=dict)
    code_map: dict[str, str] = field(default_factory=dict)
    isa_edges: list[tuple[str, str]] = field(default_factory=list)  # child,parent
    roots: set[str] = field(default_factory=set)
    build_config: SearchConfig = field(default_factory=SearchConfig)

    _regex_compiled: list | None = None
    _parents: dict[str, tuple[str, ...]] | None = None

    def parents_of(self, cui: str) -> tuple[str, ...]:
        """BROADER parents from the isa edge list (memoized)."""
        if self._parents is None:
            p: dict[str, list[str]] = {}
            for c, par in self.isa_edges:
                p.setdefault(c, []).append(par)
            self._parents = {k: tuple(v) for k, v in p.items()}
        return self._parents.get(cui, ())

    def compiled_regexes(self):
        if self._regex_compiled is None:
            self._regex_compiled = [
                (re.compile(p, re.IGNORECASE), cuis)
                for p, cuis in self.regex_map.items()
            ]
        return self._regex_compiled

    def get_terms_for_word(self, word: str) -> tuple[str, ...]:
        """Blacklist override first, else full WT entry (getBestTerms:1580)."""
        bl = self.blacklist.get(word)
        if bl is not None:
            return bl
        return self.word_map.get(word, ())

    def __getstate__(self):
        state = self.__dict__.copy()
        state["_regex_compiled"] = None  # compiled patterns re-made per executor
        state["_parents"] = None
        return state


def normalized_terms_for(name: str, synonyms, cfg: SearchConfig) -> list[str]:
    """NobleCoderUtils.getNormalizedTerms:287-323 — regex synonyms pass
    through verbatim; others normalized (unique words, insertion order) with
    the maxWordsInTerm space-count cap."""
    out: dict[str, None] = {}
    for syn in _all_synonyms(name, synonyms):
        if syn is None or syn == "":
            continue
        if syn.startswith("/") and syn.endswith("/") and len(syn) > 1:
            out.setdefault(syn, None)
            continue
        if 0 <= cfg.max_words_in_term < syn.count(" "):
            continue
        norm = T.normalize(syn, cfg.stem_words, cfg.strip_digits,
                           cfg.strip_stop_words, unique_words=True,
                           sort_words=False)
        if norm:
            out.setdefault(norm, None)
    return list(out)


def build_dictionary(concepts: list[dict | ConceptMeta],
                     cfg: SearchConfig | None = None,
                     isa_edges: list[tuple[str, str]] | None = None,
                     build_blacklist: bool = True) -> Dictionary:
    """Pure-Python dictionary build (fixture/test scale).

    ``concepts`` entries carry cui/name/synonyms/sem_types/sources/terms.
    The Spark-side build (``build.py``) produces the same tables as
    DataFrames with groupBy aggregations; this builder is the collected
    driver-side equivalent used for broadcasting.
    """
    cfg = cfg or SearchConfig()
    d = Dictionary(build_config=cfg)
    term_map: dict[str, set[str]] = {}
    word_map: dict[str, set[str]] = {}

    for c in concepts:
        meta = c if isinstance(c, ConceptMeta) else ConceptMeta(
            cui=c["cui"], name=c["name"],
            synonyms=tuple(c.get("synonyms", ())),
            sem_types=tuple(c.get("sem_types", ())),
            sources=tuple(c.get("sources", ())),
            terms=tuple((t[0], t[1]) for t in c.get("terms", ())),
            definitions=tuple(c.get("definitions", ())),
            codes=tuple((k, v) for k, v in dict(c.get("codes", {})).items()),
            props=tuple((k, v) for k, v in dict(c.get("props", {})).items()),
        )
        if meta.cui in d.concepts:
            continue
        d.concepts[meta.cui] = meta

        for term in normalized_terms_for(meta.name, meta.synonyms, cfg):
            if term.startswith("/") and term.endswith("/"):
                regex = term[1:-1]
                try:
                    re.compile(regex)
                except re.error:
                    continue
                if re.fullmatch(r"\W+", regex, re.ASCII):
                    wrapped = "(" + regex + ")"
                else:
                    wrapped = r"\b(" + regex + r")\b"
                cur = set(d.regex_map.get(wrapped, ()))
                cur.add(meta.cui)
                d.regex_map[wrapped] = tuple(sorted(cur))
                continue

            term_map.setdefault(term, set()).add(meta.cui)
            for word in T.get_words(term):
                word_map.setdefault(word, set()).add(term)
                # termCount counts (concept, term) insertion events
                d.word_stats[word] = d.word_stats.get(word, 0) + 1
                if term == word:
                    d.word_is_term.add(word)

        for src, code in meta.codes:
            if code and code != "NOCODE" and code not in d.code_map:
                d.code_map[code] = meta.cui

    d.term_map = {t: tuple(sorted(s)) for t, s in term_map.items()}
    d.word_map = {w: tuple(sorted(s)) for w, s in word_map.items()}

    if isa_edges:
        d.isa_edges = list(isa_edges)
        children = {c for c, _ in isa_edges}
        parents = {p for _, p in isa_edges}
        d.roots = {p for p in parents if p not in children}

    if build_blacklist:
        d.blacklist = _build_blacklist(d)
    return d


def _build_blacklist(d: Dictionary) -> dict[str, tuple[str, ...]]:
    """BlacklistHandler.getBlacklist:86-110: words with >100 terms, sorted by
    termCount desc (ties reverse-lexicographic), top 0.002 fraction of the
    whole vocabulary; per hot word keep only terms all of whose words are
    themselves hot (super-hot 10% use the tighter list)."""
    hot = [(w, n) for w, n in d.word_stats.items() if n > BLACKLIST_MIN_TERMS]
    hot.sort(key=lambda x: x[0], reverse=True)   # ties: reverse-lexicographic
    hot.sort(key=lambda x: x[1], reverse=True)   # primary: termCount desc
    top_n = int(len(d.word_stats) * BLACKLIST_CUTOFF)
    top = [w for w, _ in hot[:top_n]]
    ttop = top[: int(len(top) * BLACKLIST_TOP_CUTOFF)]
    top_set, ttop_set = set(top), set(ttop)

    out: dict[str, tuple[str, ...]] = {}
    for word in top:
        allowed = ttop_set if word in ttop_set else top_set
        kept = tuple(
            t for t in d.word_map.get(word, ())
            if all(tw in allowed for tw in t.split(" "))
        )
        out[word] = kept
    return out
