"""Search configuration mirroring the reference engine's flag semantics.

Defaults and search-method presets pinned to
``terminology/impl/NobleCoderTerminology.java`` :123-130 (field defaults) and
``setupSearch`` :1299-1345. A ``SearchConfig`` is an immutable value — the
reference mutates engine fields per search; we derive a fresh config per
call so concurrent Arrow batches can't race.
"""

from __future__ import annotations

from dataclasses import dataclass, replace

BEST_MATCH = "best-match"
ALL_MATCH = "all-match"
PRECISE_MATCH = "precise-match"
PARTIAL_MATCH = "partial-match"
NONOVERLAP_MATCH = "nonoverlap-match"
CUSTOM_MATCH = "custom-match"

SEARCH_METHODS = (BEST_MATCH, ALL_MATCH, PRECISE_MATCH, PARTIAL_MATCH,
                  NONOVERLAP_MATCH, CUSTOM_MATCH)


@dataclass(frozen=True)
class SearchConfig:
    # normalization flags
    strip_digits: bool = False          # stripDigits (false)
    stem_words: bool = True             # stemWords
    strip_stop_words: bool = True       # stripStopWords
    # lookup flags
    ignore_small_words: bool = True     # ignoreSmallWords (skip len<=1)
    ignore_common_words: bool = False   # ignoreCommonWords
    ignore_used_words: bool = True      # ignoreUsedWords (greedy speedup)
    ignore_acronyms: bool = False       # ignoreAcronyms
    # matching modes
    subsumption_mode: bool = True       # keep narrowest (longest) terms
    overlap_mode: bool = True           # terms may share words
    ordered_mode: bool = False          # term word order must match text
    contiguous_mode: bool = False       # words within maxWordGap
    partial_mode: bool = False          # hit-ratio >= partial threshold
    # scoring / selection
    score_concepts: bool = True         # scoreConcepts
    select_best_candidate: bool = False # selectBestCandidate
    # numeric knobs
    window_size: int = -1               # windowSize (disabled)
    max_word_gap: int = 1               # maxWordGap
    max_words_in_term: int = 10         # maxWordsInTerm
    partial_match_threshold: float = 0.5
    # filters (None = disabled); tuples preserve priority order for scoring
    filter_sources: tuple[str, ...] | None = None
    filter_semantic_types: tuple[str, ...] | None = None


def for_search_method(method: str | None, base: SearchConfig | None = None,
                      compacted: bool = False) -> SearchConfig:
    """Apply the reference's ``setupSearch`` preset on top of ``base``."""
    cfg = base or SearchConfig()
    if method == BEST_MATCH or method is None:
        cfg = replace(cfg, subsumption_mode=True, overlap_mode=True,
                      contiguous_mode=True, ordered_mode=False,
                      partial_mode=False, max_word_gap=1)
    elif method == ALL_MATCH:
        cfg = replace(cfg, subsumption_mode=False, overlap_mode=True,
                      contiguous_mode=False, ordered_mode=False,
                      partial_mode=False, ignore_used_words=False)
    elif method == PRECISE_MATCH:
        cfg = replace(cfg, subsumption_mode=True, overlap_mode=True,
                      contiguous_mode=True, ordered_mode=True,
                      partial_mode=False, max_word_gap=0)
    elif method == NONOVERLAP_MATCH:
        cfg = replace(cfg, subsumption_mode=True, overlap_mode=False,
                      contiguous_mode=False, ordered_mode=False,
                      partial_mode=False)
    elif method == PARTIAL_MATCH:
        cfg = replace(cfg, subsumption_mode=False, overlap_mode=False,
                      contiguous_mode=False, ordered_mode=False,
                      partial_mode=True)
    # CUSTOM_MATCH: leave base flags untouched
    if compacted:
        cfg = replace(cfg, ignore_used_words=False, ignore_common_words=False)
    return cfg
