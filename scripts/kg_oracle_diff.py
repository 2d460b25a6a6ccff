"""Differential check: generated DuckDB KG oracles vs the live Spark
queries, same canonicalization as scripts/oracle_check.py. Usage:

    python scripts/kg_oracle_diff.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys

import duckdb
import pandas as pd

sys.path.insert(0, "/root/repo")


def canon(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf[sorted(pdf.columns)]
    if len(pdf):
        pdf = pdf.sort_values(list(pdf.columns)).reset_index(drop=True)
    return pdf


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    import __spark_entry__ as entry
    from nobletools_spark.relational import kg_oracle as KO
    from pyspark.sql import SparkSession

    spark = (SparkSession.builder.master("local[8]")
             .config("spark.sql.shuffle.partitions", "16")
             .config("spark.ui.enabled", "false")
             .config("spark.driver.memory", "8g").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'")

    oracles = {
        "kg_sentences": KO.kg_sentences_sql(),
        "kg_mentions": KO.kg_mentions_sql(),
        "kg_mention_counts": KO.kg_mention_counts_sql(),
        "kg_triples": KO.kg_triples_sql(),
        "kg_annotated": KO.kg_annotated_sql(KO.default_modifiers_json()),
        "kg_instances": KO.kg_instances_sql(),
        "kg_canonical_triples": KO.kg_canonical_triples_sql(),
    }
    q = entry.queries()
    rc = 0
    for name, sql in oracles.items():
        if only and name not in only:
            continue
        got = canon(q[name](spark, sf).toPandas())
        want = canon(con.execute(sql).fetchdf())
        ok_rows = len(got) == len(want)
        ok_cols = list(got.columns) == list(want.columns)
        ok_vals = False
        if ok_rows and ok_cols:
            g, w = got.copy(), want.copy()
            for c in g.columns:
                if g[c].dtype.kind == "f":
                    g[c] = g[c].round(6)
                if w[c].dtype.kind == "f":
                    w[c] = w[c].round(6)
                g[c] = g[c].astype(str)
                w[c] = w[c].astype(str)
            ok_vals = g.equals(w)
            if not ok_vals:
                neq = (g != w).any(axis=1)
                print(f"  first diffs for {name}:")
                print(pd.concat([g[neq].head(5).add_prefix("spark_"),
                                 w[neq].head(5).add_prefix("oracle_")],
                                axis=1).to_string())
        print(f"[{'OK  ' if ok_rows and ok_cols and ok_vals else 'FAIL'}] "
              f"{name}: spark={len(got)} oracle={len(want)} "
              f"cols={ok_cols} vals={ok_vals}")
        if not (ok_rows and ok_cols and ok_vals):
            rc = 1
    return rc


if __name__ == "__main__":
    sys.exit(main())
