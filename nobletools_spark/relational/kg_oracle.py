"""Generated DuckDB oracles for the KG pipeline queries.

The dataeng corpus (driver ``documents`` testdata) is a closed bag-of-words
over ~31 tokens with single-space separation, which makes the full
best-match semantics of the matcher (matcher/core.py — greedy rarest-first
lookup, per-word and global subsumption, seen-original dedupe, concept
scoring, annotation windowing into mentions) *re-derivable in pure SQL*.
This module generates that SQL from the deterministic in-repo dictionary,
the same way ``__spark_entry__`` inlines the terminology's isa edges as
VALUES for the ``kg_ancestors`` recursive-CTE oracle: the dictionary
content (terms, CUIs, names, per-word normalizations) is inlined as DATA,
and every piece of *computation* — interleave split, tokenization, word
offsets, term validity (contiguity over the stop-stripped norm list),
single-term suppression under valid bigrams, the alphabetical
seen-original winner among equal-wordset term orders, the scoreConcept
weights, the Mention.getMentions window split — is re-executed by DuckDB
from the raw parquet.

Key semantic reductions, each provable for THIS dictionary (2-word max
terms, every bigram pair containing a word unique to it) and pinned by the
differential test in tests/test_kg_oracle.py:

- the greedy used-word loop is order-independent: a bigram term is in the
  result iff both its norm words occur in the sentence AND their nearest
  occurrences are <= 2 apart in the stop-stripped norm list
  (checkContiguity with max_word_gap=1); a single-word term survives iff
  no valid bigram contains its word (per-word subsumption in
  getBestTerms).
- among the dictionary's normalized orderings of one word set (e.g.
  'scan tabl' / 'tabl scan'), the alphabetically first is inserted first
  (postings are sorted) and wins the seen-original dedupe; the others
  contribute the +5 subset-term score bonus (scoreConcept:2546-2551).
- scoring collapses to 1.05 + 5*(n_other_orders) + 2*(name == surface
  term): every corpus surface is an exact-case synonym, so the acronym and
  stemmed-only penalties never fire.
- the word normalization map is inlined from text.tools.normalize_words
  over the closed vocabulary; the Porter stemmer behind it is separately
  parity-pinned against the compiled reference Stemmer.java (0/21k
  diffs, scripts/texttools_parity.py), so the map is fixture data, not
  trusted computation.

Reference semantics being re-checked: NobleCoderTerminology.process
:2360-2518, getBestTerms :1578-1658, scoreConcept :2537-2664,
Mention.getMentions :207-270 (see matcher/core.py for the full map).
"""

from __future__ import annotations

from functools import lru_cache

from ..terminology.dataeng import dataeng_dictionary
from ..text import tools as T

# closed corpus vocabulary beyond the dictionary's own synonym words
# (TESTDATA.md bag-of-words fillers; identity under normalization)
_EXTRA_VOCAB = ("the", "a", "small", "slow", "big", "dup", "fast")


def _q(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


@lru_cache(maxsize=1)
def _dico():
    return dataeng_dictionary()


@lru_cache(maxsize=1)
def _norm_rows() -> list[tuple[str, str, bool]]:
    """(surface word, normalized word, is_stop) over the closed vocab."""
    d = _dico()
    vocab: set[str] = set(_EXTRA_VOCAB)
    for meta in d.concepts.values():
        for s in meta.synonyms:
            vocab.update(T.get_words(s))
    rows = []
    for w in sorted(vocab):
        ws = T.normalize_words(w, stem_words=True, strip_digits=False,
                               strip_stop_words=True)
        if not ws:
            rows.append((w, "", True))
        else:
            rows.append((w, ws[0], False))
    return rows


@lru_cache(maxsize=1)
def _term_data():
    """singles: (nword, cui, name); pairs: wordset rows + winner cuis."""
    d = _dico()
    singles: list[tuple[str, str, str]] = []
    by_set: dict[tuple[str, str], list[str]] = {}
    for term, cuis in sorted(d.term_map.items()):
        words = term.split(" ")
        if len(words) == 1:
            for cui in cuis:
                singles.append((term, cui, d.concepts[cui].name))
        elif len(words) == 2 and words[0] != words[1]:
            key = tuple(sorted(words))
            by_set.setdefault(key, []).append(term)
        # 3+-word terms: every one contains a norm word unreachable from
        # the corpus vocabulary (asserted below), so they are never valid
    reachable = {n for _, n, stop in _norm_rows() if not stop}
    for term in d.term_map:
        words = term.split(" ")
        if len(words) >= 3:
            assert any(w not in reachable for w in words), term

    def probe(w: str) -> str:
        return w[:-1] if len(w) > 3 else w

    pairs = []       # (ws1, ws2, winner_term, n_orders, probe1, probe2)
    paircuis = []    # (ws1, ws2, cui, name)
    for (w1, w2), terms in sorted(by_set.items()):
        winner = min(terms)
        pairs.append((w1, w2, winner, len(terms), probe(w1), probe(w2)))
        for cui in d.term_map[winner]:
            paircuis.append((w1, w2, cui, d.concepts[cui].name))
    return singles, pairs, paircuis


def _values(rows, cols: str) -> str:
    body = ", ".join("(" + ", ".join(
        _q(v) if isinstance(v, str) else str(v) for v in r) + ")"
        for r in rows)
    return f"(VALUES {body}) AS t({cols})"


def _base_ctes() -> str:
    """Shared CTE chain: documents -> sentences -> words -> norm positions
    -> valid pairs -> per-sentence arrays. Everything downstream (mentions,
    counts, triples, annotated) builds on `bmen`/`smen` mention rows with
    SENTENCE-relative offsets plus `soff` for doc-level rebasing."""
    norm_vals = _values([(w, n, s) for w, n, s in _norm_rows()],
                        "word, nword, is_stop")
    singles, pairs, paircuis = _term_data()
    singles_vals = _values(
        [(t, c, n, n.lower()) for t, c, n in singles],
        "nterm, cui, cname, cname_low")
    pairs_vals = _values(pairs,
                         "ws1, ws2, wterm, n_orders, probe1, probe2")
    paircui_vals = _values(
        [(a, b, c, n, n.lower()) for a, b, c, n in paircuis],
        "ws1, ws2, cui, cname, cname_low")
    return f"""
WITH d AS (
  SELECT CAST(doc_id AS VARCHAR) AS doc_id, text,
         greatest(CAST(floor(length(text)/2) AS INT), 1) AS p
  FROM documents),
mm AS (
  SELECT doc_id, text,
         CASE WHEN strpos(substr(text, p), ' ') > 0
              THEN strpos(substr(text, p), ' ') + p - 1 ELSE 0 END AS mid
  FROM d),
sents AS (
  SELECT doc_id, 0 AS sent_id, substr(text, 1, mid) AS stext, 0 AS soff
  FROM mm WHERE mid > 0
  UNION ALL
  SELECT doc_id, 1, substr(text, mid + 1), mid FROM mm WHERE mid > 0
  UNION ALL
  SELECT doc_id, 0, text, 0 FROM mm WHERE mid = 0),
toks AS (
  SELECT doc_id, sent_id, soff, stext, string_split(stext, ' ') AS ws
  FROM sents),
w0 AS (
  SELECT doc_id, sent_id, soff,
         unnest(ws) AS word, generate_subscripts(ws, 1) AS wi
  FROM toks),
wn AS (  -- original words with exact sentence-relative char offsets
  SELECT doc_id, sent_id, soff, word, wi,
         CAST(wi - 1 + coalesce(sum(length(word))
              OVER (PARTITION BY doc_id, sent_id ORDER BY wi
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS INT) AS off
  FROM w0 WHERE word <> ''),
normmap AS (SELECT * FROM {norm_vals}),
wnn AS (
  SELECT w.*, coalesce(n.nword, w.word) AS nword,
         coalesce(n.is_stop, false) AS is_stop
  FROM wn w LEFT JOIN normmap n USING (word)),
np AS (  -- stop-stripped norm list with positions (contiguity space)
  SELECT *, CAST(row_number() OVER (PARTITION BY doc_id, sent_id
                                    ORDER BY wi) AS INT) AS ni
  FROM wnn WHERE NOT is_stop),
surf AS (  -- norm_map: first surface form per normalized word
  SELECT doc_id, sent_id, nword, min_by(word, wi) AS surface
  FROM np GROUP BY doc_id, sent_id, nword),
pairsd AS (SELECT * FROM {pairs_vals}),
singlesd AS (SELECT * FROM {singles_vals}),
paircuid AS (SELECT * FROM {paircui_vals}),
vp AS (  -- valid bigram word sets: both present, norm distance <= 2
  SELECT n1.doc_id, n1.sent_id, p.ws1, p.ws2, p.wterm, p.n_orders,
         p.probe1, p.probe2
  FROM pairsd p
  JOIN np n1 ON n1.nword = p.ws1
  JOIN np n2 ON n2.nword = p.ws2
            AND n2.doc_id = n1.doc_id AND n2.sent_id = n1.sent_id
  GROUP BY ALL
  HAVING min(abs(n1.ni - n2.ni)) <= 2),
sarr AS (  -- per-sentence original word / offset arrays for windowing
  SELECT doc_id, sent_id, list(word ORDER BY wi) AS wl,
         list(off ORDER BY wi) AS ol, CAST(count(*) AS INT) AS nw
  FROM wn GROUP BY doc_id, sent_id),
bg AS (  -- bigram mention base: surfaces, original term, score
  SELECT v.*, se.soff, su1.surface AS s1, su2.surface AS s2,
         strpos(lower(se.stext), v.probe1) - 1 AS pos1,
         strpos(lower(se.stext), v.probe2) - 1 AS pos2,
         CASE WHEN (strpos(lower(se.stext), v.probe1) - 1, v.probe1)
                 <= (strpos(lower(se.stext), v.probe2) - 1, v.probe2)
              THEN su1.surface || ' ' || su2.surface
              ELSE su2.surface || ' ' || su1.surface END AS oterm
  FROM vp v
  JOIN sents se ON se.doc_id = v.doc_id AND se.sent_id = v.sent_id
  JOIN surf su1 ON su1.doc_id = v.doc_id AND su1.sent_id = v.sent_id
               AND su1.nword = v.ws1
  JOIN surf su2 ON su2.doc_id = v.doc_id AND su2.sent_id = v.sent_id
               AND su2.nword = v.ws2),
bga AS (  -- all word annotations of each bigram (getAnnotations)
  SELECT b.doc_id, b.sent_id, b.ws1, b.ws2, w.wi, w.word, w.off
  FROM bg b
  JOIN wn w ON w.doc_id = b.doc_id AND w.sent_id = b.sent_id
           AND w.word IN (b.s1, b.s2)),
bgn AS (
  SELECT doc_id, sent_id, ws1, ws2, CAST(count(*) AS INT) AS ann_n
  FROM bga GROUP BY ALL),
bwin AS (  -- Mention.getMentions windows: span 3 original words. The
           -- window end is indexOf(LAST-window-word STRING, window start)
           -- + len — the first occurrence of that string at-or-after the
           -- start, a faithful quirk of the reference (:259-261): with a
           -- repeated word the end lands on the FIRST repeat, not the
           -- window's last word.
  SELECT a.doc_id, a.sent_id, a.ws1, a.ws2, a.wi AS i,
         s.ol[a.wi] AS st,
         strpos(substr(se.stext, s.ol[a.wi] + 1),
                s.wl[least(a.wi + 2, s.nw)]) - 1 + s.ol[a.wi]
           + length(s.wl[least(a.wi + 2, s.nw)]) AS en
  FROM bga a
  JOIN sarr s ON s.doc_id = a.doc_id AND s.sent_id = a.sent_id
  JOIN sents se ON se.doc_id = a.doc_id AND se.sent_id = a.sent_id
  JOIN bg b ON b.doc_id = a.doc_id AND b.sent_id = a.sent_id
           AND b.ws1 = a.ws1 AND b.ws2 = a.ws2
  WHERE list_contains(s.wl[a.wi:least(a.wi + 2, s.nw)], b.s1)
    AND list_contains(s.wl[a.wi:least(a.wi + 2, s.nw)], b.s2)),
bgroups AS (  -- one mention per qualifying window
  SELECT w.doc_id, w.sent_id, w.ws1, w.ws2, w.i,
         min(a.off) AS mstart, max(a.off + length(a.word)) AS mend,
         '[' || string_agg('{{"text":"' || a.word || '","offset":'
                           || (a.off + b.soff) || '}}', ','
                           ORDER BY a.off) || ']' AS ann_json
  FROM bwin w
  JOIN bga a ON a.doc_id = w.doc_id AND a.sent_id = w.sent_id
            AND a.ws1 = w.ws1 AND a.ws2 = w.ws2
            AND a.off >= w.st AND a.off + length(a.word) <= w.en
  JOIN bg b ON b.doc_id = w.doc_id AND b.sent_id = w.sent_id
           AND b.ws1 = w.ws1 AND b.ws2 = w.ws2
  GROUP BY ALL),
ball AS (  -- the all-annotations fallback group (also the ann_n=2 path)
  SELECT a.doc_id, a.sent_id, a.ws1, a.ws2,
         min(a.off) AS mstart, max(a.off + length(a.word)) AS mend,
         '[' || string_agg('{{"text":"' || a.word || '","offset":'
                           || (a.off + b.soff) || '}}', ','
                           ORDER BY a.off) || ']' AS ann_json
  FROM bga a
  JOIN bg b ON b.doc_id = a.doc_id AND b.sent_id = a.sent_id
           AND b.ws1 = a.ws1 AND b.ws2 = a.ws2
  GROUP BY ALL),
bspans AS (  -- exactly-two annotations -> single direct group; else
             -- windows; else fallback to the all-annotations group
  SELECT g.doc_id, g.sent_id, g.ws1, g.ws2, g.mstart, g.mend, g.ann_json
  FROM bgroups g
  JOIN bgn n ON n.doc_id = g.doc_id AND n.sent_id = g.sent_id
            AND n.ws1 = g.ws1 AND n.ws2 = g.ws2
  WHERE n.ann_n <> 2
  UNION ALL
  SELECT f.doc_id, f.sent_id, f.ws1, f.ws2, f.mstart, f.mend, f.ann_json
  FROM ball f
  JOIN bgn n ON n.doc_id = f.doc_id AND n.sent_id = f.sent_id
            AND n.ws1 = f.ws1 AND n.ws2 = f.ws2
  WHERE n.ann_n = 2
     OR NOT EXISTS (SELECT 1 FROM bgroups g
                    WHERE g.doc_id = f.doc_id AND g.sent_id = f.sent_id
                      AND g.ws1 = f.ws1 AND g.ws2 = f.ws2)),
bmen AS (  -- bigram mentions with concept + score
  SELECT b.doc_id, b.sent_id, c.cui, c.cname,
         b.oterm AS matched_term, b.wterm AS normalized_term,
         1.05 + 5.0 * (b.n_orders - 1)
              + CASE WHEN c.cname_low = b.oterm THEN 2.0 ELSE 0.0 END
           AS score,
         sp.mstart + b.soff AS start, sp.mend + b.soff AS "end",
         sp.ann_json
  FROM bspans sp
  JOIN bg b ON b.doc_id = sp.doc_id AND b.sent_id = sp.sent_id
           AND b.ws1 = sp.ws1 AND b.ws2 = sp.ws2
  JOIN paircuid c ON c.ws1 = sp.ws1 AND c.ws2 = sp.ws2),
sgl AS (  -- single-word terms: present and not covered by a valid bigram
  SELECT x.doc_id, x.sent_id, s.cui, s.cname, s.cname_low, s.nterm,
         su.surface
  FROM (SELECT DISTINCT doc_id, sent_id, nword FROM np) x
  JOIN singlesd s ON s.nterm = x.nword
  JOIN surf su ON su.doc_id = x.doc_id AND su.sent_id = x.sent_id
              AND su.nword = x.nword
  WHERE NOT EXISTS (SELECT 1 FROM vp
                    WHERE vp.doc_id = x.doc_id AND vp.sent_id = x.sent_id
                      AND x.nword IN (vp.ws1, vp.ws2))),
smen AS (  -- one mention per occurrence of the first-surface form
  SELECT g.doc_id, g.sent_id, g.cui, g.cname,
         g.surface AS matched_term, g.nterm AS normalized_term,
         1.05 + CASE WHEN g.cname_low = g.surface THEN 2.0 ELSE 0.0 END
           AS score,
         w.off + w.soff AS start,
         w.off + length(w.word) + w.soff AS "end",
         '[{{"text":"' || w.word || '","offset":' || (w.off + w.soff)
           || '}}]' AS ann_json
  FROM sgl g
  JOIN wn w ON w.doc_id = g.doc_id AND w.sent_id = g.sent_id
           AND w.word = g.surface),
men AS (
  SELECT * FROM bmen UNION ALL SELECT * FROM smen)
"""


def kg_sentences_sql() -> str:
    base = _base_ctes()
    return base + """
SELECT doc_id, CAST(sent_id AS INT) AS sent_id, 'Line' AS sent_type,
       stext AS text, CAST(soff AS INT) AS offset,
       CAST(sent_id AS INT) AS paragraph_id
FROM sents ORDER BY doc_id, sent_id
"""


def kg_mentions_sql() -> str:
    base = _base_ctes()
    return base + """
SELECT doc_id, CAST(sent_id AS INT) AS sent_id, cui,
       cname AS concept_name, matched_term, normalized_term,
       CAST(score AS DOUBLE) AS score,
       CAST(start AS INT) AS start, CAST("end" AS INT) AS "end",
       ann_json AS annotations_json,
       'DataOp' AS sem_types, 'DE' AS sources
FROM men
"""


def kg_mention_counts_sql() -> str:
    base = _base_ctes()
    return base + """
SELECT cui, cname AS concept_name, count(*) AS n_mentions
FROM men GROUP BY cui, cname
ORDER BY n_mentions DESC, cui
"""


def kg_triples_sql() -> str:
    d = _dico()
    isa = ", ".join(f"('{c}', 'isa', '{p}', '')"
                    for c, p in sorted(d.isa_edges))
    base = _base_ctes()
    return base + f"""
SELECT DISTINCT doc_id AS subj, 'mentions_concept' AS pred, cui AS obj,
       doc_id
FROM men
UNION ALL
SELECT * FROM (VALUES {isa}) t(subj, pred, obj, doc_id)
"""


def kg_annotated_sql(modifiers_json: str) -> str:
    """kg_annotated: the corpus contains no modifier-lexicon phrase, so
    every mention carries the document-level default modifier values
    (lexicon.DEFAULT_VALUES) — passed in as the constant JSON."""
    base = _base_ctes()
    return base + f"""
SELECT doc_id, CAST(sent_id AS INT) AS sent_id, cui,
       CAST(start AS INT) AS start, CAST("end" AS INT) AS "end",
       {_q(modifiers_json)} AS modifiers_json
FROM men
"""


def kg_instances_sql() -> str:
    """I-group instances over annotated mentions: the schema anchors every
    concept and requires Polarity, which the document-level defaults
    always satisfy — so instances are the per-(doc, span) mentions with
    the deterministic smallest-CUI pick and a composed instance id."""
    base = _base_ctes()
    return base + """
SELECT doc_id || '#DataOpMention#' || start || '#' || "end"
         AS instance_id,
       doc_id, 'DataOpMention' AS var_name, min(cui) AS cui,
       CAST(start AS INT) AS start, CAST("end" AS INT) AS "end"
FROM men GROUP BY doc_id, start, "end"
ORDER BY instance_id
"""


def kg_canonical_triples_sql() -> str:
    """P5+P6: mentions rewritten through connected components over
    co-synonymous CUIs before triple materialization. The synonym edges
    (terms shared by >1 CUI) are dictionary DATA inlined as VALUES; the
    component labels are recomputed by a recursive min-label CTE, and the
    mention/isa rewrite runs over the SQL-derived mention set."""
    d = _dico()
    edges = set()
    for term, cuis in d.term_map.items():
        if len(cuis) > 1:
            hub = min(cuis)
            for c in cuis:
                if c != hub:
                    edges.add((hub, c))
    rows = ", ".join(f"('{a}', '{b}')" for a, b in sorted(edges))
    isa = ", ".join(f"('{c}', 'isa', '{p}', '')"
                    for c, p in sorted(d.isa_edges))
    base = _base_ctes()
    return base + f""",
e AS (SELECT * FROM (VALUES {rows}) t(src, dst)
      UNION SELECT dst, src FROM (VALUES {rows}) t(src, dst)),
cc AS (  -- min-label propagation to fixpoint (depth-bounded recursion;
         -- synonym components are stars, diameter <= 4)
  WITH RECURSIVE walk(cui, label, depth) AS (
    SELECT src, src, 0 FROM e
    UNION ALL
    SELECT w.cui, e2.dst, w.depth + 1
    FROM walk w JOIN e e2 ON w.label = e2.src
    WHERE w.depth < 6)
  SELECT cui, min(label) AS canonical_cui FROM walk GROUP BY cui),
cmen AS (
  SELECT m.doc_id, coalesce(c.canonical_cui, m.cui) AS cui
  FROM men m LEFT JOIN cc c ON c.cui = m.cui),
cisa AS (
  SELECT coalesce(cs.canonical_cui, i.subj) AS subj, 'isa' AS pred,
         coalesce(co.canonical_cui, i.obj) AS obj, '' AS doc_id
  FROM (VALUES {isa}) i(subj, pred, obj, doc_id)
  LEFT JOIN cc cs ON cs.cui = i.subj
  LEFT JOIN cc co ON co.cui = i.obj)
SELECT DISTINCT doc_id AS subj, 'mentions_concept' AS pred, cui AS obj,
       doc_id
FROM cmen
UNION ALL
SELECT DISTINCT subj, pred, obj, doc_id FROM cisa WHERE subj <> obj
"""


def kg_cooccurrence_pmi_sql() -> str:
    """Doc-level concept co-occurrence with PMI weights, re-derived from
    the same independent mention CTEs (`graph/analytics.py::
    concept_cooccurrence_pmi` over the detected mentions is the Spark
    side). PMI = ln(n_ab * N / (n_a * n_b)) over distinct (doc, cui)."""
    base = _base_ctes()
    return base + """
, dc AS MATERIALIZED (SELECT DISTINCT doc_id, cui FROM men),
nn AS (SELECT CAST(count(DISTINCT doc_id) AS DOUBLE) AS n_corpus FROM dc),
freq AS (SELECT cui, CAST(count(*) AS DOUBLE) AS df FROM dc GROUP BY cui),
cpairs AS (SELECT a.cui AS cui_a, b.cui AS cui_b, count(*) AS n_docs
           FROM dc a JOIN dc b ON a.doc_id = b.doc_id AND a.cui < b.cui
           GROUP BY a.cui, b.cui)
SELECT p.cui_a, p.cui_b, CAST(p.n_docs AS BIGINT) AS n_docs,
       round(ln(p.n_docs * nn.n_corpus / (fa.df * fb.df)), 4) AS pmi
FROM cpairs p JOIN freq fa ON fa.cui = p.cui_a
              JOIN freq fb ON fb.cui = p.cui_b
CROSS JOIN nn
ORDER BY p.cui_a, p.cui_b
"""


def kg_triangle_counts_sql() -> str:
    """Per-vertex triangle counts over the doc-level co-occurrence graph,
    from the same independent mention CTEs (Spark side:
    `graph/analytics.py::triangle_counts` over the detected mentions)."""
    base = _base_ctes()
    return base + """
, dc AS MATERIALIZED (SELECT DISTINCT doc_id, cui FROM men),
e AS MATERIALIZED (SELECT DISTINCT a.cui AS a, b.cui AS b
      FROM dc a JOIN dc b ON a.doc_id = b.doc_id AND a.cui < b.cui),
vv AS (SELECT a AS cui FROM e UNION SELECT b FROM e),
tri AS MATERIALIZED (SELECT e1.a AS x, e1.b AS y, e2.b AS z
        FROM e e1 JOIN e e2 ON e1.b = e2.a
        JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b),
corners AS (SELECT x AS cui FROM tri UNION ALL SELECT y FROM tri
            UNION ALL SELECT z FROM tri),
cnt AS (SELECT cui, count(*) AS triangles FROM corners GROUP BY cui)
SELECT vv.cui, CAST(coalesce(cnt.triangles, 0) AS BIGINT) AS triangles
FROM vv LEFT JOIN cnt ON cnt.cui = vv.cui
ORDER BY vv.cui
"""


def kg_components_sql() -> str:
    """Connected components over the co-occurrence graph (min reachable
    cui per concept via a recursive closure), singletons included —
    oracle twin of `graph/analytics.py::connected_components` over the
    detected mentions."""
    base = _base_ctes()
    if base.lstrip().startswith("WITH RECURSIVE"):
        head = base
    else:
        head = base.replace("WITH ", "WITH RECURSIVE ", 1)
    return head + """
, cc_dc AS MATERIALIZED (SELECT DISTINCT doc_id, cui FROM men),
cc_e AS MATERIALIZED (
  SELECT a.cui AS src, b.cui AS dst
  FROM cc_dc a JOIN cc_dc b
    ON a.doc_id = b.doc_id AND a.cui <> b.cui),
cc_v AS MATERIALIZED (SELECT DISTINCT cui FROM cc_dc),
reach(cui, r) AS (
  SELECT cui, cui FROM cc_v
  UNION
  SELECT rr.cui, e.dst FROM reach rr JOIN cc_e e ON rr.r = e.src)
SELECT cui, min(r) AS component FROM reach GROUP BY cui ORDER BY cui
"""


def default_modifiers_json() -> str:
    """The constant map annotate_documents emits when no modifier matches:
    Spark to_json of a map<string,string> — keys in map insertion order
    (MODIFIER_TYPES order filtered to those with defaults)."""
    from ..context.lexicon import DEFAULT_VALUES, MODIFIER_TYPES
    parts = [f'"{t}":"{DEFAULT_VALUES[t]}"' for t in MODIFIER_TYPES
             if t in DEFAULT_VALUES]
    return "{" + ",".join(parts) + "}"
