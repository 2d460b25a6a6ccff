"""B4/A7: terminology persistence — the `.term` directory, Spark-style.

The reference persists ten JDBM maps + ``search.properties``
(``NobleCoderTerminology.save``:1060-1072, ``load``:739-815). Here the
dictionary tables persist as one parquet directory per table plus a JSON
properties file carrying the build ``SearchConfig`` — readable by any
Spark job (`load_terminology`) and collectable into the broadcastable
``Dictionary`` (`dictionary_from_tables`), or queryable directly when the
vocabulary is too big to broadcast (the shuffle-join match path).
"""

from __future__ import annotations

import dataclasses
import json
import os

from pyspark.sql import DataFrame, SparkSession

from ..config import SearchConfig
from .build import build_terminology, dictionary_from_tables
from .storage import Dictionary

TABLES = ("concepts", "term_index", "word_index", "word_stats",
          "regex_terms", "code_xref", "blacklist", "word_index_compact",
          "isa_edges")
PROPS_FILE = "search.properties.json"


def save_terminology(tables: dict[str, DataFrame], path: str,
                     cfg: SearchConfig | None = None,
                     isa_edges: list[tuple[str, str]] | None = None) -> None:
    os.makedirs(path, exist_ok=True)
    spark = next(iter(tables.values())).sparkSession
    for name in TABLES:
        if name == "isa_edges" and "isa_edges" not in tables:
            if isa_edges:
                df = spark.createDataFrame(
                    isa_edges, "child_cui string, parent_cui string")
                df.write.mode("overwrite").parquet(os.path.join(path, name))
            continue
        if name in tables:
            tables[name].write.mode("overwrite").parquet(
                os.path.join(path, name))
    props = dataclasses.asdict(cfg or SearchConfig())
    props = {k: (list(v) if isinstance(v, tuple) else v)
             for k, v in props.items()}
    with open(os.path.join(path, PROPS_FILE), "w") as f:
        json.dump(props, f, indent=1)


def load_terminology(spark: SparkSession, path: str
                     ) -> tuple[dict[str, DataFrame], SearchConfig]:
    tables: dict[str, DataFrame] = {}
    for name in TABLES:
        p = os.path.join(path, name)
        if os.path.isdir(p):
            tables[name] = spark.read.parquet(p)
    with open(os.path.join(path, PROPS_FILE)) as f:
        props = json.load(f)
    props = {k: (tuple(v) if isinstance(v, list) else v)
             for k, v in props.items()}
    return tables, SearchConfig(**props)


def load_dictionary(spark: SparkSession, path: str) -> Dictionary:
    """Open a persisted terminology read-only as a broadcastable
    Dictionary (the ``NobleCoderTerminology(name)`` constructor analog)."""
    tables, cfg = load_terminology(spark, path)
    edges = None
    if "isa_edges" in tables:
        edges = [(r.child_cui, r.parent_cui)
                 for r in tables["isa_edges"].collect()]
    return dictionary_from_tables(tables, cfg, isa_edges=edges)


def build_and_save(spark: SparkSession, concepts, path: str,
                   cfg: SearchConfig | None = None,
                   isa_edges: list[tuple[str, str]] | None = None,
                   **build_kw) -> dict[str, DataFrame]:
    tables = build_terminology(spark, concepts, cfg, **build_kw)
    save_terminology(tables, path, cfg, isa_edges=isa_edges)
    return tables
