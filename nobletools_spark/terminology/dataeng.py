"""Deterministic terminology over the driver-corpus vocabulary.

The driver's ``documents`` testdata is a bag-of-words over a 30-token
data-engineering vocabulary (join, hash, scan, batch, ...). This terminology
maps that vocabulary to concepts — single words plus frequent bigrams — so
the KG pipeline queries exposed through ``__spark_entry__`` produce real
mentions/triples on the provided corpus. Same build path as any other
terminology (storage.build_dictionary), nothing fixture-specific downstream.
"""

from __future__ import annotations

from ..config import SearchConfig
from ..terminology.storage import Dictionary, build_dictionary

_WORD_CONCEPTS = [
    ("join", "Join operator", ["join"]),
    ("hash", "Hash function", ["hash"]),
    ("scan", "Table scan", ["scan"]),
    ("batch", "Batch", ["batch"]),
    ("filter", "Filter operator", ["filter"]),
    ("merge", "Merge", ["merge"]),
    ("sort", "Sort operator", ["sort"]),
    ("agg", "Aggregation", ["agg"]),
    ("window", "Window operator", ["window"]),
    ("stream", "Stream", ["stream"]),
    ("query", "Query", ["query", "queries"]),
    ("table", "Table", ["table", "tables"]),
    ("row", "Row", ["row", "rows"]),
    ("column", "Column", ["column", "columns"]),
    ("vector", "Vector", ["vector", "vectors"]),
    ("spark", "Spark engine", ["spark"]),
    ("customer", "Customer entity", ["customer", "customers"]),
    ("key", "Key", ["key", "keys"]),
    ("value", "Value", ["value", "values"]),
    ("data", "Data", ["data"]),
    ("group", "Group", ["group", "groups"]),
    ("line", "Line", ["line", "lines"]),
    ("order", "Order entity", ["order", "orders"]),
    ("part", "Part entity", ["part", "parts"]),
]

_BIGRAM_CONCEPTS = [
    ("hash_join", "Hash join", ["hash join"]),
    ("sort_merge", "Sort merge", ["sort merge", "merge sort"]),
    ("table_scan", "Table scan operator", ["table scan", "scan of the table"]),
    ("window_agg", "Window aggregation", ["window agg", "agg window"]),
    ("group_key", "Grouping key", ["group key", "key group"]),
    ("stream_batch", "Stream batch", ["stream batch", "batch stream"]),
    ("big_data", "Big data", ["big data", "data big"]),
    ("fast_scan", "Fast scan", ["fast scan", "scan fast"]),
    ("row_column", "Row column layout", ["row column", "column row"]),
    ("query_filter", "Query filter", ["query filter", "filter query"]),
]

DATAENG_CONCEPTS: list[dict] = []
for i, (slug, name, syns) in enumerate(_WORD_CONCEPTS):
    DATAENG_CONCEPTS.append(dict(
        cui=f"D{i:07d}", name=name, synonyms=[name.split(" ")[0].lower(), *syns],
        sem_types=["DataOp"], sources=["DE"]))
for i, (slug, name, syns) in enumerate(_BIGRAM_CONCEPTS):
    DATAENG_CONCEPTS.append(dict(
        cui=f"B{i:07d}", name=name, synonyms=syns,
        sem_types=["DataOp"], sources=["DE"]))

# bigram concepts subsume their component word concepts
DATAENG_ISA_EDGES: list[tuple[str, str]] = []
_word_cui = {w[0]: f"D{i:07d}" for i, w in enumerate(_WORD_CONCEPTS)}
for i, (slug, name, syns) in enumerate(_BIGRAM_CONCEPTS):
    for w in slug.split("_"):
        if w in _word_cui:
            DATAENG_ISA_EDGES.append((f"B{i:07d}", _word_cui[w]))

_CACHE: Dictionary | None = None


def dataeng_dictionary(cfg: SearchConfig | None = None) -> Dictionary:
    global _CACHE
    if _CACHE is None or cfg is not None:
        d = build_dictionary(DATAENG_CONCEPTS, cfg, isa_edges=DATAENG_ISA_EDGES)
        if cfg is not None:
            return d
        _CACHE = d
    return _CACHE
