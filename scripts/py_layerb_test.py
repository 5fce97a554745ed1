#!/usr/bin/env python3
"""Dev-only byte-parity test for the Layer B Python surface
(python/graft.py: dedup_exact, dedup_minhash_lsh, semantic_dedup,
token_count, quality_score, bm25_topk, hybrid_stored, ann_stored_ivf,
index_erasure, fuzzy_decontaminate, incremental_mv).

Each wrapper call must return rows byte-identical to the Scala gate's
Verify dump for the same key — the wrapper is a transport, never a
reimplementation.

Usage:
    sbt package
    GRAFT_VERIFY_ONLY=d01_dedup_exact,d02_dedup_minhash_lsh,\
t01_token_count,t02_quality_score,t19_bm25_topk,s29_hybrid_stored \
      sbt "runMain graft.Verify /root/testdata/sf0.01 /tmp/py_layerb_scala"
    python3 scripts/py_layerb_test.py /root/testdata/sf0.01 /tmp/py_layerb_scala

Driver-side python (pyspark, pandas) only — NOT part of the shipped
library.
"""
import glob
import os
import sys

import pandas as pd
from pyspark.sql import SparkSession

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "python"))

import graft  # noqa: E402

OPS = [
    ("d01_dedup_exact", graft.dedup_exact),
    ("d02_dedup_minhash_lsh", graft.dedup_minhash_lsh),
    ("t01_token_count", graft.token_count),
    ("t02_quality_score", graft.quality_score),
    ("t19_bm25_topk", graft.bm25_topk),
    ("s29_hybrid_stored", graft.hybrid_stored),
    ("s24_ann_stored_ivf", graft.ann_stored_ivf),
    ("s32_index_erasure", graft.index_erasure),
    ("t42_fuzzy_decontaminate", graft.fuzzy_decontaminate),
    ("c08_incremental_mv", graft.incremental_mv),
    ("d09_semantic_dedup", graft.semantic_dedup),
]


def canon(df):
    """Sort columns by name, rows by every column — the driver's
    oracle-compare canonicalization."""
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def main():
    sf_dir, scala_out = sys.argv[1], sys.argv[2]
    jars = glob.glob(os.path.join(
        REPO, "target", "scala-2.13", "geckospark_*.jar"))
    assert jars, "run `sbt package` first"
    spark = (SparkSession.builder
             .master("local[8]")
             .config("spark.jars", jars[0])
             .config("spark.sql.shuffle.partitions", "8")
             .config("spark.sql.session.timeZone", "UTC")
             .config("spark.ui.enabled", "false")
             .getOrCreate())
    spark.sparkContext.setLogLevel("WARN")
    failures = 0
    for name, fn in OPS:
        scala_dir = os.path.join(scala_out, name)
        assert os.path.isdir(scala_dir), (
            f"missing Scala dump {scala_dir} — run Verify with "
            f"GRAFT_VERIFY_ONLY including {name}")
        expect = canon(pd.read_parquet(scala_dir))
        got = canon(fn(spark, sf_dir).toPandas())
        if got.equals(expect):
            print(f"PASS {name} ({len(got)} rows)")
        else:
            failures += 1
            print(f"FAIL {name}: wrapper rows != Scala gate rows "
                  f"({len(got)} vs {len(expect)})")
    spark.stop()
    print(f"== {len(OPS) - failures} pass / {failures} fail")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
