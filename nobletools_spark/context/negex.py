"""NegEx (F5): the legacy token-stream negation detector.

Behavior-matched to ``tools/NegEx.java``:
- sentence tokenized on non-word chars; each token position probed
  longest-prefix against the phrase lists in priority order indeterminate >
  pseudo > post-negation > pre-negation > conjunction-stop > concept
  (:246-372, findMatch :135-158)
- scan with window 6 (:637-640): a pre-negation phrase marks FOLLOWING
  concepts Negative until window/conjunction/other negation; post-negation
  and indeterminate phrases retroactively mark PRECEDING candidates
  (negative resp. hedged); pseudo phrases are neutral; conjunctions reset
  (:642-726)
- emits Polarity=Negative_Polarity / ContextualModality=Hedged modifiers
  (:734-762)

Phrase lists are the published NegEx data (Chapman et al. 2001;
bundled by the reference as resources/NegEx*.lst).
"""

from __future__ import annotations

import re

from ..matcher.core import MentionOut
from .context import ModifierOut
from .negex_phrases import (CONJUNCTIONS, INDETERMINATE_PHRASES,
                            POST_NEGATION_PHRASES, PRE_NEGATION_PHRASES,
                            PSEUDO_NEGATION_PHRASES)

WINDOW_SIZE = 6

_PRE, _POST, _PSEUDO, _STOP, _CONCEPT, _PLAIN, _INDET = range(7)

_LISTS = (
    (_INDET, INDETERMINATE_PHRASES),
    (_PSEUDO, PSEUDO_NEGATION_PHRASES),
    (_POST, POST_NEGATION_PHRASES),
    (_PRE, PRE_NEGATION_PHRASES),
    (_STOP, CONJUNCTIONS),
)


def _find_match(text: str, phrases: tuple[str, ...]) -> str | None:
    """findMatch:135-158 — prefix match against each phrase (kept in file
    order), whole-word bounded by a following space or end of text."""
    low = text.lower().strip()
    for term in phrases:
        t = term.strip()
        if len(low) > len(t):
            if low.startswith(t + " "):
                return text[:len(t)]
        elif len(low) == len(t) and low.startswith(t):
            return text[:len(t)]
    return None


def _tokenize(sentence: str, mentions: list[MentionOut]):
    """parse:246-372 -> list of (offset, text, type, mention_index)."""
    text = re.sub(r"\W", " ", sentence)
    tokens = []
    offset = 0
    # mention probe list keyed by matched text
    probes = [(i, re.sub(r"\W", " ", m.matched_term).lower())
              for i, m in enumerate(mentions)]
    for wm in re.finditer(r"\S+", text):
        i = wm.start()
        if i < offset:
            continue
        tail = text[i:]
        matched = False
        for typ, phrases in _LISTS:
            t = _find_match(tail, phrases)
            if t is not None:
                tokens.append((i, t, typ, -1))
                offset = i + len(t)
                matched = True
                break
        if matched:
            continue
        low = tail.lower()
        for mi, mtext in probes:
            if mtext and (low.startswith(mtext + " ") or low == mtext
                          or re.match(re.escape(mtext) + r"\b", low)):
                tokens.append((i, mtext, _CONCEPT, mi))
                offset = i + len(mtext)
                matched = True
                break
        if not matched:
            tokens.append((i, wm.group(), _PLAIN, -1))
            offset = wm.end()
    return tokens


def _negative(off: int, text: str) -> ModifierOut:
    return ModifierOut(type="Polarity", value="Negative_Polarity",
                       start=off, end=off + len(text))


def _hedged(off: int, text: str) -> ModifierOut:
    return ModifierOut(type="ContextualModality",
                       value="Hedged_ContextualModality",
                       start=off, end=off + len(text))


def process(sentence: str, mentions: list[MentionOut]
            ) -> list[list[ModifierOut]]:
    """Scan loop of process:623-726. Returns per-mention modifier lists
    (same order as ``mentions``)."""
    out: list[list[ModifierOut]] = [[] for _ in mentions]
    if not sentence:
        return out
    tokens = _tokenize(sentence, mentions)

    negation: tuple[int, str] | None = None
    window = 0
    negatable: list[tuple[int, str, int, int]] = []

    for tok in tokens:
        off, text, typ, mi = tok
        if typ in (_PRE, _POST, _INDET):
            negation = None
            window = 0
            if typ == _PRE:
                negation = (off, text)
            else:
                for c in negatable:
                    if c[2] == _CONCEPT:
                        mod = (_negative(off, text) if typ == _POST
                               else _hedged(off, text))
                        out[c[3]].append(mod)
            negatable.clear()
        elif typ == _STOP:
            negation = None
            negatable.clear()
            window = 0
        elif typ == _CONCEPT:
            if negation is not None:
                out[mi].append(_negative(negation[0], negation[1]))
            else:
                negatable.append(tok)
            window += 1
        else:
            # plain tokens AND pseudo phrases: neutral (pseudo is not
            # isNegation in the reference, NegEx.java:475-486)
            if negation is None:
                negatable.append(tok)
            window += 1

        if window >= WINDOW_SIZE:
            if negation is not None:
                window = 0
                negation = None
                negatable.clear()
            else:
                window -= 1
                if negatable:
                    negatable.pop(0)
    return out
