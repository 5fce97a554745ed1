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
    spark.stop()


if __name__ == "__main__":
    main()
