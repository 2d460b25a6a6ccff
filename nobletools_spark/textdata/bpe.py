"""Byte-pair-encoding tokenizer training and encoding over a corpus.

Sennrich-style BPE (the LLM-tokenizer shape): train merges on the
word-frequency table, then encode the corpus with the learned merge
ranks. The split of labor is the industrial one:

- **Corpus-scale stages are distributed.** ``word_counts`` is the one
  pass over all text (groupBy word, partial-aggregated map-side);
  ``pair_counts`` is the distributed adjacent-pair aggregation (the BPE
  training hot loop's first iteration, oracle-checked in SQL);
  ``bpe_encode`` re-tokenizes every document with the learned table (an
  Arrow-batched pandas pass — the 100 TB-relevant step).
- **The merge loop is vocab-bounded, not corpus-bounded.** After the
  corpus collapses to (word, count), the table is bounded by distinct
  vocabulary (~1e5-1e7 rows at web scale, independent of corpus bytes),
  so the iterative merge selection runs on the collected table — the
  same bounded-collect pattern as the terminology broadcast build
  (terminology/build.py), documented and size-guarded, NOT a corpus
  collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

END = "</w>"  # end-of-word marker, per the original BPE formulation


def word_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """-> (word, n): the one corpus-scale pass. Lowercased whitespace
    words; Catalyst partial-aggregates map-side so the shuffle carries
    (word, partial_count), not rows."""
    w = F.explode(F.split(F.lower(F.trim(F.col(text_col))), r"\s+"))
    return (df.select(w.alias("word")).where(F.col("word") != "")
            .groupBy("word").agg(F.count(F.lit(1)).alias("n")))


def _sym_col(word_col):
    """Initial symbol sequence: characters plus the end-of-word marker."""
    return F.concat(F.regexp_extract_all(word_col, F.lit("."), 0),
                    F.array(F.lit(END)))


def _pair_counts_from_syms(d: DataFrame) -> DataFrame:
    """(s array<string>, n) -> (a, b, n) adjacent-pair frequencies.
    Guarded for fully-merged single-symbol sequences: sequence(1, 0)
    would DESCEND through index 0 rather than produce an empty range."""
    idx = F.when(F.size("s") >= 2, F.sequence(F.lit(1), F.size("s") - 1)) \
           .otherwise(F.array().cast("array<int>"))
    pairs = d.select(
        "n", F.explode(F.transform(
            idx, lambda i: F.struct(
                F.element_at("s", i).alias("a"),
                F.element_at("s", i + 1).alias("b")))).alias("p"))
    return (pairs.groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
            .agg(F.sum("n").alias("n")))


def pair_counts(wc: DataFrame) -> DataFrame:
    """-> (a, b, n): adjacent-symbol pair frequencies over the word table,
    weighted by word count — one BPE training iteration's statistics,
    fully distributed (explode over an index sequence, JVM-side; groupBy
    pair). At web scale this is the stage worth distributing: the pair
    key space is quadratic in alphabet, tiny next to the corpus."""
    syms = _sym_col(F.col("word"))
    return _pair_counts_from_syms(wc.select("n", syms.alias("s")))


def _merge_seq(seq: list[str], a: str, b: str) -> list[str]:
    """Greedy left-to-right merge of adjacent (a, b) into a+b."""
    out: list[str] = []
    i = 0
    while i < len(seq):
        if i + 1 < len(seq) and seq[i] == a and seq[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(seq[i])
            i += 1
    return out


def bpe_train(df: DataFrame, num_merges: int = 100,
              text_col: str = "text",
              max_vocab_rows: int = 10_000_000) -> list[tuple[str, str]]:
    """Learn ``num_merges`` BPE merges. Tiebreak is deterministic: max
    count, then lexicographic (a, b) — so training is reproducible across
    cluster sizes and engines.

    The corpus-scale work is ``word_counts`` (distributed); the merge
    loop runs over the collected (word, n) table, which is bounded by
    DISTINCT vocabulary, not corpus size — guarded by ``max_vocab_rows``
    (at the guard's default, the table is ~100 MB: broadcast-build scale,
    same budget argument as terminology/build.py's dictionary collect)."""
    # one corpus pass: collect once, guard on the collected row count
    # (a separate count() would re-run the corpus aggregation)
    rows = word_counts(df, text_col).collect()
    if len(rows) > max_vocab_rows:
        raise ValueError(
            f"bpe_train: {len(rows)} distinct words exceeds max_vocab_rows="
            f"{max_vocab_rows}; raise the guard or pre-filter the corpus")
    table = [(list(r.word) + [END], r.n) for r in rows]

    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        counts: dict[tuple[str, str], int] = {}
        for seq, n in table:
            for i in range(len(seq) - 1):
                p = (seq[i], seq[i + 1])
                counts[p] = counts.get(p, 0) + n
        if not counts:
            break
        # deterministic tiebreak: max count, then lexicographically
        # smallest pair
        top = max(counts.values())
        best = min(p for p, c in counts.items() if c == top)
        merges.append(best)
        table = [(_merge_seq(seq, *best), n) for seq, n in table]
    return merges


def _merge_expr(col, a: str, b: str):
    """JVM-side greedy left-to-right merge of adjacent (a, b) into a+b —
    the exact semantics of ``_merge_seq``. The fold carries the output
    array; a fresh element b fuses with a trailing a. A token CREATED by
    this pass can never re-trigger the rule as its `a` side (that would
    need a+b == a, impossible with nonempty b), so the fold's
    "look at the last output token" test is exactly greedy
    non-overlapping left-to-right."""
    return F.aggregate(
        col, F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(a)) & (x == F.lit(b)),
            F.concat(F.slice(acc, F.lit(1), F.size(acc) - 1),
                     F.array(F.lit(a + b)))
        ).otherwise(F.concat(acc, F.array(x))))


def bpe_train_distributed(df: DataFrame, num_merges: int = 100,
                          text_col: str = "text") -> list[tuple[str, str]]:
    """Learn ``num_merges`` BPE merges with the merge loop itself driven
    from the DISTRIBUTED pair table — nothing vocab-sized ever reaches
    the driver (each iteration collects exactly ONE row: the winning
    pair). Identical output to ``bpe_train`` (same deterministic
    tiebreak: max count, then lexicographically smallest pair —
    pytest-pinned parity), so the two are interchangeable; pick by
    deployment shape:

    - ``bpe_train``: vocab fits the driver comfortably (it usually
      does — the table is distinct-vocabulary-bounded); 1 Spark job
      total, merge loop at Python speed.
    - this: web-scale vocabularies past the ``max_vocab_rows`` budget,
      or drivers that must stay thin. Per iteration: one shuffle over
      the vocab table (pair aggregation), a 1-row collect, and one
      narrow JVM fold applying the merge. Lineage is truncated with an
      eager ``localCheckpoint`` per iteration — without it, iteration k
      replays all k-1 prior merge folds and the plan grows O(k^2).
    """
    wc = word_counts(df, text_col)
    table = wc.select(_sym_col(F.col("word")).alias("s"), "n")
    table = table.localCheckpoint(eager=True)
    merges: list[tuple[str, str]] = []
    try:
        for _ in range(num_merges):
            top = (_pair_counts_from_syms(table)
                   .orderBy(F.desc("n"), "a", "b").limit(1).collect())
            if not top:
                break
            a, b = top[0].a, top[0].b
            merges.append((a, b))
            nxt = table.select(_merge_expr(F.col("s"), a, b).alias("s"),
                               "n").localCheckpoint(eager=True)
            table.unpersist()
            table = nxt
    finally:
        table.unpersist()
    return merges


def bpe_encode(df: DataFrame, merges: list[tuple[str, str]],
               text_col: str = "text") -> DataFrame:
    """-> (doc_id, tokens array<string>): encode every document with the
    learned merge ranks — the corpus-scale application step, one
    Arrow-batched pandas pass, merge table shipped in the closure (small:
    num_merges entries). Standard rank-greedy BPE encoding: repeatedly
    merge the lowest-rank adjacent pair present."""
    import pandas as pd

    rank = {pair: i for i, pair in enumerate(merges)}

    def enc_word(word: str) -> list[str]:
        seq = list(word) + [END]
        while len(seq) > 1:
            ranked = [(rank[(seq[i], seq[i + 1])], i)
                      for i in range(len(seq) - 1)
                      if (seq[i], seq[i + 1]) in rank]
            if not ranked:
                break
            r, _ = min(ranked)
            a, b = merges[r]
            seq = _merge_seq(seq, a, b)
        return seq

    def gen(batches):
        # word->tokens memo shared across the task's batches: word
        # frequency is Zipfian, so re-running the merge loop per
        # occurrence would redo ~all the work; the memo is vocab-bounded
        # (the same argument as bpe_train's collected word table)
        memo: dict[str, list[str]] = {}
        for pdf in batches:
            toks = []
            for t in pdf[text_col]:
                out: list[str] = []
                for w in (t or "").lower().split():
                    enc = memo.get(w)
                    if enc is None:
                        enc = memo[w] = enc_word(w)
                    out.extend(enc)
                toks.append(out)
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "tokens": toks})

    return (df.select("doc_id", text_col)
            .mapInPandas(gen, schema="doc_id long, tokens array<string>"))
