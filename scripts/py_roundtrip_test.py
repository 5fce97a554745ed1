#!/usr/bin/env python3
"""Dev-only parity test for the PySpark wrapper (python/graft.py).

Runs the README example (generate 10k rows -> mutate) through the
Python wrapper and asserts the rows are byte-identical to the Scala
dump written by `runMain graft.tools.PyParityDump <scalaOut>`.

Usage:
    sbt package
    sbt "runMain graft.tools.PyParityDump /tmp/py_parity_scala"
    python3 scripts/py_roundtrip_test.py /tmp/py_parity_scala

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


def main():
    scala_out = sys.argv[1]
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

    import graft

    freq = spark.createDataFrame(
        [("consumer", 6), ("corporate", 3), ("household", 1)],
        "value string, freq long")
    words = spark.createDataFrame(
        [("foobar", 5), ("FooBar", 3), ("quux", 2)],
        "value string, freq long")
    regex_csv = os.path.join(
        REPO, "src", "test", "resources", "assets",
        "regex-foobar-case-insensitive.csv")
    df = graft.to_data_frame(spark, [
        (["segment"], graft.from_frequency_table(freq, "value", "freq",
                                                 seed=1)),
        (["dob"], graft.from_datetime_range("1940-01-01", "2005-12-31",
                                            "%Y-%m-%d", "d", seed=2)),
        (["score"], graft.from_uniform_distribution(0.0, 100.0, 2, seed=5)),
        (["word"], graft.from_frequency_table(words, "value", "freq",
                                              seed=7)),
    ], 10000)
    out = graft.mutate_data_frame(df, [
        (["dob"], [(0.3, graft.with_replacement_table(
            [("0", "o"), ("1", "|"), ("5", "s")], inline=True, seed=3))]),
        (["segment"], [(0.2, graft.with_insert(seed=4))]),
        (["word"], [(0.5, graft.with_regex_replacement_table_csv(
            spark, regex_csv, "pattern", "flags", seed=6))]),
    ])

    got = out.orderBy("__row_id").toPandas()
    want = pd.concat([
        pd.read_parquet(f) for f in
        sorted(glob.glob(os.path.join(scala_out, "*.parquet")))
    ]).sort_values("__row_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_exact=True)
    print(f"PY-PARITY PASS: {len(got)} rows byte-identical "
          f"({list(got.columns)})")

    # ---- from_function / with_function (pandas_udf bridge) ----
    # README-style escape hatch: a custom callable per row. Pure
    # callables -> reproducible frames (the bridge's documented
    # contract); the p-draw is hash-gated on __row_id, so WHICH rows
    # mutate is exactly reproducible too.
    df2 = graft.to_data_frame(spark, [
        (["country"], graft.from_function(lambda: "de_DE")),
        (["segment"], graft.from_frequency_table(freq, "value", "freq",
                                                 seed=1)),
    ], 2000)
    assert df2.columns == ["__row_id", "country", "segment"], df2.columns
    p2 = df2.orderBy("__row_id").toPandas()
    assert (p2["country"] == "de_DE").all(), "from_function value drift"

    full = graft.mutate_data_frame(df2, [
        (["segment"], [(1.0, graft.with_function(
            lambda v: v.upper(), seed=9))]),
    ]).orderBy("__row_id").toPandas()
    assert (full["segment"] == p2["segment"].str.upper()).all(), \
        "with_function p=1.0 must mutate every row"

    half_a = graft.mutate_data_frame(df2, [
        (["segment"], [(0.5, graft.with_function(
            lambda v: v.upper(), seed=9))]),
    ]).orderBy("__row_id").toPandas()
    half_b = graft.mutate_data_frame(df2, [
        (["segment"], [(0.5, graft.with_function(
            lambda v: v.upper(), seed=9))]),
    ]).orderBy("__row_id").toPandas()
    pd.testing.assert_frame_equal(half_a, half_b, check_exact=True)
    n_mut = int((half_a["segment"] != p2["segment"]).sum())
    assert 0 < n_mut < len(half_a), f"p=0.5 mutated {n_mut} rows"
    # unmutated rows must be byte-identical to the input
    untouched = half_a["segment"] == half_a["segment"].str.upper()
    assert (half_a.loc[~untouched, "segment"]
            == p2.loc[~untouched, "segment"]).all()
    try:
        graft.mutate_data_frame(df2, [
            (["segment"], [
                (0.5, graft.with_function(lambda v: v, seed=9)),
                (0.2, graft.with_insert(seed=4))])])
        raise AssertionError("interleaved with_function must raise")
    except ValueError:
        pass
    # same hazard ACROSS groups: an engine mutator listed after a
    # with_function on the same column must raise, not silently
    # reorder (all engine mutators run first in the fused plan)
    try:
        graft.mutate_data_frame(df2, [
            (["segment"], [(0.5, graft.with_function(
                lambda v: v, seed=9))]),
            (["segment"], [(0.2, graft.with_insert(seed=4))])])
        raise AssertionError("cross-group reordering must raise")
    except ValueError:
        pass
    print(f"PY-FUNCTION-BRIDGE PASS: from_function 2000 rows, "
          f"with_function p=0.5 mutated {n_mut} (reproducible)")
    spark.stop()


if __name__ == "__main__":
    main()
