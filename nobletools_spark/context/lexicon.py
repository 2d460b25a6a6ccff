"""Modifier lexicon: a ConText-style modifier terminology fixture.

The reference bootstraps its modifier terminology from ``Modifier.owl``
(``tools/ConText.java:35,139-153`` — an external URL, unavailable here), so
this module provides a deterministic equivalent with the same *shape*: a
concept tree rooted at LinguisticModifier/Pseudo/Closure whose concepts
carry the ConText control properties —

- ``hasActionEn``: forward / backward / bidirectional / terminate
  (ConText.java:50-57)
- ``windowSize``: word-window scope, inherited from parents, default 8
  (:41,67; lookup :723-730)
- ``hasTermination`` / ``hasPseudo``: group-level links naming terminator /
  pseudo groups (:37-38, :776-800)
- per-type value property, e.g. concept Negated has Polarity ->
  Negative_Polarity (getModifierValue :754-766)
- type concepts carry ``hasDefaultValue`` (:300-311)

The modifier vocabulary itself (negation/temporality/experiencer/hedging
phrases) follows the published ConText phrase sets (Harkema et al., JBI
2009) — data, not code.

The lexicon is matched with the reference's fixed strict configuration
(ConText.java:186-205): custom-match, contiguous, ordered, gap 0, overlap
on, subsumption off, no stemming, no stop-word stripping, no small-word or
digit skips, no scoring, semantic-type filter = Instance.
"""

from __future__ import annotations

from ..config import SearchConfig
from ..terminology.storage import Dictionary, build_dictionary

# modifier types and their document-level defaults (getDefaultValues
# semantics; values per the ConText/DomainOntology conventions)
MODIFIER_TYPES = ("Certainty", "ContextualAspect", "ContextualModality",
                  "Degree", "Experiencer", "Permanence", "Polarity",
                  "Temporality")

DEFAULT_VALUES = {
    "Polarity": "Positive_Polarity",
    "Experiencer": "Patient_Experiencer",
    "Temporality": "DocTimeRel_Overlap",
    "ContextualModality": "Actual_ContextualModality",
    "Certainty": "Certain_Certainty",
}

# structural semantic types (ConText.java:61-70 MODIFIER_TYPES_FILTER)
STRUCTURAL_TYPES = frozenset({
    "Instance", "Class", "Modifier", "LinguisticModifier", "NumericModifier",
    "SemanticModifier", "Qualifier", "BodyModifier", "Lexicon", "Pseudo",
    "Closure", "Quantity",
})

ACTION_FORWARD = "forward"
ACTION_BACKWARD = "backward"
ACTION_BIDIRECTIONAL = "bidirectional"
ACTION_TERMINATE = "terminate"
DEFAULT_WINDOW_SIZE = 8

_LING = ("Instance", "Modifier", "LinguisticModifier")


def _value_concept(cui, name, synonyms, mtype, value, extra_props=None):
    props = {mtype: value}
    if extra_props:
        props.update(extra_props)
    return dict(cui=cui, name=name, synonyms=synonyms,
                sem_types=[*_LING, mtype], sources=["CONTEXT"], props=props)


# value concepts grouped under group concepts; (cui, name, synonyms, type,
# value). Groups carry action/window/termination/pseudo.
LEXICON_CONCEPTS: list[dict] = [
    # ---- group concepts (not matchable: no Instance semtype) ----
    dict(cui="NegationGroup", name="Negation group", synonyms=[],
         sem_types=["Modifier", "LinguisticModifier"], sources=["CONTEXT"],
         props={"hasActionEn": ACTION_FORWARD,
                "hasTermination": "ConjunctionGroup",
                "hasPseudo": "PseudoNegationGroup"}),
    dict(cui="PostNegationGroup", name="Post negation group", synonyms=[],
         sem_types=["Modifier", "LinguisticModifier"], sources=["CONTEXT"],
         props={"hasActionEn": ACTION_BACKWARD,
                "hasTermination": "ConjunctionGroup",
                "hasPseudo": "PseudoNegationGroup"}),
    dict(cui="FamilyGroup", name="Family history group", synonyms=[],
         sem_types=["Modifier", "LinguisticModifier"], sources=["CONTEXT"],
         props={"hasActionEn": ACTION_FORWARD,
                # a family-history phrase in a section header scopes the
                # whole section (ConText.java HAS_SECTION_ACTION :39-40)
                "hasSectionAction": ACTION_FORWARD,
                "hasTermination": "ConjunctionGroup"}),
    dict(cui="HistoricalGroup", name="Historical group", synonyms=[],
         sem_types=["Modifier", "LinguisticModifier"], sources=["CONTEXT"],
         props={"hasActionEn": ACTION_FORWARD, "windowSize": "6",
                "hasSectionAction": ACTION_FORWARD,
                "hasTermination": "ConjunctionGroup"}),
    dict(cui="HedgeGroup", name="Hedging group", synonyms=[],
         sem_types=["Modifier", "LinguisticModifier"], sources=["CONTEXT"],
         props={"hasActionEn": ACTION_BIDIRECTIONAL,
                "hasTermination": "ConjunctionGroup"}),
    dict(cui="ConjunctionGroup", name="Conjunction group", synonyms=[],
         sem_types=["Closure"], sources=["CONTEXT"], props={}),
    dict(cui="PseudoNegationGroup", name="Pseudo negation group", synonyms=[],
         sem_types=["Pseudo"], sources=["CONTEXT"], props={}),

    # ---- type concepts: carry defaults, never matched ----
    *[dict(cui=t, name=t, synonyms=[], sem_types=["Class"],
           sources=["CONTEXT"],
           props=({"hasDefaultValue": DEFAULT_VALUES[t]}
                  if t in DEFAULT_VALUES else {}))
      for t in MODIFIER_TYPES],

    # ---- pre-negation (forward) ----
    _value_concept("Negated", "Negated", [
        "no", "not", "without", "denies", "denied", "denying",
        "negative for", "absence of", "free of", "no evidence of",
        "no sign of", "no signs of", "never had", "not have", "cannot see",
        "fails to reveal", "rule out", "ruled out", "with no", "lacks",
    ], "Polarity", "Negative_Polarity"),
    # ---- post-negation (backward) ----
    _value_concept("NegatedAfter", "Negated after", [
        "is absent", "are absent", "not identified", "not seen",
        "not present", "not detected", "was ruled out", "is ruled out",
        "unlikely", "none", "negative",
    ], "Polarity", "Negative_Polarity"),
    # ---- experiencer ----
    _value_concept("FamilyMember", "Family member", [
        "family history of", "family history", "mother had", "father had",
        "brother had", "sister had", "maternal", "paternal", "FH",
    ], "Experiencer", "FamilyMember_Experiencer"),
    # ---- temporality ----
    _value_concept("Historical", "Historical", [
        "history of", "h/o", "past medical history of", "status post",
        "previous", "prior",
    ], "Temporality", "Before_DocTimeRel"),
    # ---- hedging / contextual modality ----
    _value_concept("Hedged", "Hedged", [
        "possible", "possibly", "probable", "probably", "likely",
        "suspicious for", "suggestive of", "questionable", "may represent",
        "cannot be excluded", "worrisome for", "concerning for",
    ], "ContextualModality", "Hedged_ContextualModality"),
    # ---- paragraph-scoped negation (C5 / hasParagraphAction) ----
    # list-style negation ("the following were not identified: a, b, c")
    # scopes every mention in its PARAGRAPH; the property VALUE is the
    # scoping action and it sits DIRECTLY on the matchable concept, as
    # ConText.getGlobalModifierMentions:405-414 reads concept properties
    # without a parent walk
    _value_concept("NegatedParagraph", "Negated paragraph", [
        "the following were not identified",
        "negative for the following",
        "none of the following were seen",
    ], "Polarity", "Negative_Polarity",
        extra_props={"hasActionEn": ACTION_FORWARD,
                     "hasParagraphAction": ACTION_FORWARD}),

    # ---- terminators ----
    dict(cui="Conjunction", name="Conjunction", synonyms=[
        "but", "however", "although", "though", "aside from", "except",
        "apart from", "which", "who",
    ], sem_types=["Instance", "Closure"], sources=["CONTEXT"],
        props={"hasActionEn": ACTION_TERMINATE}),
    # ---- pseudo phrases: cancel intersecting negation modifiers ----
    dict(cui="PseudoNegation", name="Pseudo negation", synonyms=[
        "no increase", "no change", "no significant change",
        "no interval change", "gram negative", "not certain if",
        "not certain whether", "not necessarily", "without difficulty",
        "not only",
    ], sem_types=["Instance", "Pseudo"], sources=["CONTEXT"], props={}),
]

# child -> parent (group) edges; value concepts hang under their group so
# windowSize/hasTermination/hasPseudo inherit (getWindowSize:723-730,
# getTermination/getPseudo walk parents :776-800)
LEXICON_ISA_EDGES: list[tuple[str, str]] = [
    ("Negated", "NegationGroup"),
    ("NegatedParagraph", "NegationGroup"),
    ("NegatedAfter", "PostNegationGroup"),
    ("FamilyMember", "FamilyGroup"),
    ("Historical", "HistoricalGroup"),
    ("Hedged", "HedgeGroup"),
    ("Conjunction", "ConjunctionGroup"),
    ("PseudoNegation", "PseudoNegationGroup"),
    ("NegationGroup", "LinguisticModifierRoot"),
    ("PostNegationGroup", "LinguisticModifierRoot"),
    ("FamilyGroup", "LinguisticModifierRoot"),
    ("HistoricalGroup", "LinguisticModifierRoot"),
    ("HedgeGroup", "LinguisticModifierRoot"),
]


def context_config() -> SearchConfig:
    """The fixed strict modifier-matching config (ConText.java:186-205)."""
    return SearchConfig(
        strip_digits=False, stem_words=False, strip_stop_words=False,
        ignore_small_words=False, ignore_common_words=False,
        ignore_used_words=True, ignore_acronyms=False,
        subsumption_mode=False, overlap_mode=True, ordered_mode=True,
        contiguous_mode=True, partial_mode=False,
        score_concepts=False, select_best_candidate=False,
        max_word_gap=0, max_words_in_term=10,
        filter_semantic_types=("Instance",),
    )


_CACHE: Dictionary | None = None


def modifier_dictionary() -> Dictionary:
    global _CACHE
    if _CACHE is None:
        _CACHE = build_dictionary(LEXICON_CONCEPTS, context_config(),
                                  isa_edges=LEXICON_ISA_EDGES)
    return _CACHE
