"""Triple-level P/R of the Spark KG pipeline vs the COMPILED reference engine.

The acceptance metric for this build is "docs/sec and triple P/R (>=0.95) vs
reference NobleCoder annotations".  `matcher_parity.py` pins mention equality
sentence-by-sentence; this script measures the metric at the TRIPLE level,
end-to-end, on the driver testdata:

- OUR side is the actual Spark pipeline (`__spark_entry__._kg_triples`):
  interleave -> sentence split -> detect_mentions (broadcast dictionary,
  mapInPandas) -> materialize_triples, at sf0.001 by default.
- The REFERENCE side is the compiled engine
  (`NobleCoderTerminology.process(Sentence)`, via the DiffMain harness that
  `matcher_parity.build()` compiles from /root/reference) loaded with the
  SAME dataeng terminology and fed the SAME sentences (segmentation itself
  is independently 0-diff-pinned by `run_docproc_diff`).

Both sides reduce to (subj, pred, obj) sets — doc->mentions_concept->CUI
from the mentions, CUI->isa->CUI from the terminology — and are scored as
precision/recall.  Output: one JSON line, embedded by bench.py as
``triple_pr`` so the per-round BENCH artifact carries the metric directly.

Usage: python scripts/triple_pr.py [--sf-dir /root/testdata/sf0.001]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "scripts"))

import matcher_parity as MP  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    ap.add_argument("--cores", default=os.environ.get("SPARK_GRAFT_CPUS", "8"))
    args = ap.parse_args()

    if not MP.build():
        print(json.dumps({"available": False,
                          "reason": "javac or reference sources unavailable"}))
        return 0

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from nobletools_spark.sentence.splitter import filter_deid_tags
    from nobletools_spark.terminology.dataeng import (DATAENG_CONCEPTS,
                                                      DATAENG_ISA_EDGES)

    spark = (SparkSession.builder.master(f"local[{args.cores}]")
             .config("spark.sql.shuffle.partitions", str(args.cores))
             .config("spark.ui.showConsoleProgress", "false")
             .config("spark.ui.enabled", "false")
             .appName("triple_pr").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as E

    sent_rows = (E._kg_sentences(spark, args.sf_dir)
                 .select("doc_id", "sent_id", "text")
                 .orderBy("doc_id", "sent_id").collect())
    triples = E._kg_triples(spark, args.sf_dir).collect()
    ours = {(r.subj, r.pred, r.obj) for r in triples}
    spark.stop()

    # Reference engine on the identical sentences + terminology.  The match
    # stage scrubs DeID tags before matching (stages.detect_mentions) — feed
    # the reference the same scrubbed text.
    sentences = [filter_deid_tags(r.text) for r in sent_rows]
    ref_out = MP.run_reference(DATAENG_CONCEPTS, sentences, mode="best-match")
    ref = {(sent_rows[i].doc_id, "mentions_concept", m[0])
           for i, ms in ref_out.items() for m in ms}
    ref |= {(a, "isa", b) for a, b in DATAENG_ISA_EDGES}

    tp = len(ours & ref)
    precision = tp / len(ours) if ours else 1.0
    recall = tp / len(ref) if ref else 1.0
    result = {
        "available": True,
        "precision": round(precision, 4),
        "recall": round(recall, 4),
        "tp": tp, "fp": len(ours - ref), "fn": len(ref - ours),
        "n_triples_ours": len(ours), "n_triples_ref": len(ref),
        "n_docs": len({r.doc_id for r in sent_rows}),
        "n_sentences": len(sent_rows),
        "sf_dir": args.sf_dir, "mode": "best-match",
        "scope": "doc->mentions_concept->CUI + CUI->isa->CUI vs compiled "
                 "NobleCoderTerminology on identical sentences/terminology",
    }
    print(json.dumps(result))
    if ours - ref:
        for t in sorted(ours - ref)[:5]:
            print("ours-only:", t, file=sys.stderr)
    if ref - ours:
        for t in sorted(ref - ours)[:5]:
            print("ref-only :", t, file=sys.stderr)
    return 0 if (precision >= 0.95 and recall >= 0.95) else 1


if __name__ == "__main__":
    sys.exit(main())
