"""PySpark wrapper for the geckospark Layer A API (generators G1-G8,
mutators M1-M20).

The reference library's audience calls it from Python; this module
gives them the same surface over the Spark engine. It is a thin py4j
bridge onto ``graft.python.PyGraft`` — every plan is built by the
Scala library, so the fused one-scan generator path and the single
fused mutator stats job are exactly what Scala callers get, and the
output is byte-identical for the same seeds (see
``scripts/py_roundtrip_test.py``).

Usage (any SparkSession whose JVM has the geckospark jar on the
classpath, e.g. ``spark-submit --jars geckospark.jar`` or
``spark.jars`` in the builder)::

    import graft

    df = graft.to_data_frame(spark, [
        (["segment"], graft.from_frequency_table(freq_df, "value", "freq", seed=1)),
        (["dob"], graft.from_datetime_range("1940-01-01", "2005-12-31",
                                            "%Y-%m-%d", "d", seed=2)),
    ], 1_000_000)

    out = graft.mutate_data_frame(df, [
        (["dob"], [(0.3, graft.with_replacement_table(
            [("0", "o"), ("1", "|"), ("5", "s")], inline=True, seed=3))]),
        (["segment"], [(0.2, graft.with_insert(seed=4))]),
    ])

Generator/mutator values returned by the factories are opaque JVM
handles; build them against the same SparkSession you pass to
``to_data_frame``.

Surface parity with the reference (gecko) API:

======================================  =========================================
reference                               this module
======================================  =========================================
generator.from_function                 NOT exposed (see below)
generator.from_uniform_distribution     from_uniform_distribution
generator.from_normal_distribution      from_normal_distribution
generator.from_frequency_table          from_frequency_table / ..._csv
generator.from_multicolumn_frequency_…  from_multicolumn_frequency_table
generator.from_datetime_range           from_datetime_range
generator.from_group                    from_group
generator.to_data_frame                 to_data_frame
mutator.with_function                   NOT exposed (see below)
mutator.with_cldr_keymap_file           with_cldr_keymap_file
mutator.with_phonetic_replacement_table with_phonetic_replacement_table
mutator.with_replacement_table          with_replacement_table
mutator.with_missing_value              with_missing_value
mutator.with_insert / delete /          with_insert / with_delete /
  transpose / substitute / noop           with_transpose / with_substitute /
                                          with_noop
mutator.with_categorical_values         with_categorical_values
mutator.with_permute                    with_permute
mutator.with_lowercase / uppercase      with_lowercase / with_uppercase
mutator.with_datetime_offset            with_datetime_offset
mutator.with_generator                  with_generator
mutator.with_regex_replacement_table    with_regex_replacement_table / ..._csv
mutator.with_repeat                     with_repeat
mutator.with_group                      with_group
mutator.mutate_data_frame               mutate_data_frame
======================================  =========================================

``from_function`` / ``with_function`` — the callable escape hatches —
are deliberately NOT exposed through this wrapper. They take an
arbitrary Python callable, and shipping one through the py4j bridge
would execute it row-at-a-time on the driver: the opposite of the
fused, distributed plans everything else here compiles to. Python
callers who need custom per-row logic should express it either as one
of the config-driven mutators above (replacement/regex/phonetic
tables cover the reference's own examples) or as a native PySpark
``pandas_udf`` applied outside the Layer A pipeline; Scala callers
get the real G1/M1 (`graft.gen.Generators.FromFunction`,
`graft.mut.Mutators.WithFunction`), which run as distributed
expressions/UDFs inside the fused plan.
"""

from pyspark.sql import DataFrame, SparkSession

# must match graft.mut.Mutators.Ascii exactly (index-for-index: the
# charset draw is an index into this string)
_ASCII = "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ"


def _jvm(spark):
    return spark._jvm.graft.python.PyGraft


def _active_spark():
    s = SparkSession.getActiveSession()
    if s is None:
        raise RuntimeError("no active SparkSession")
    return s


def _jlist(spark, xs):
    lst = spark._jvm.java.util.ArrayList()
    for x in xs:
        lst.add(x)
    return lst


# --------------------------------------------------------- generators

def from_uniform_distribution(low=0.0, high=1.0, precision=6, *, seed):
    s = _active_spark()
    return _jvm(s).fromUniform(float(low), float(high), int(precision),
                               int(seed))


def from_normal_distribution(mean=0.0, sd=1.0, precision=6, *, seed):
    s = _active_spark()
    return _jvm(s).fromNormal(float(mean), float(sd), int(precision),
                              int(seed))


def from_datetime_range(start_dt, end_dt, dt_format, unit, *, seed):
    s = _active_spark()
    return _jvm(s).fromDatetimeRange(start_dt, end_dt, dt_format, unit,
                                     int(seed))


def from_frequency_table(df, value_column, freq_column, *, seed):
    """G4 from a PySpark DataFrame with (value, integer-freq) columns."""
    return _jvm(df.sparkSession).fromFrequencyTable(
        df._jdf, value_column, freq_column, int(seed))


def from_frequency_table_csv(spark, path, value_column, freq_column,
                             delimiter=",", encoding="UTF-8", *, seed):
    return _jvm(spark).fromFrequencyTableCsv(
        spark._jsparkSession, path, value_column, freq_column, delimiter,
        encoding, int(seed))


def from_multicolumn_frequency_table(df, value_columns, freq_column, *, seed):
    s = df.sparkSession
    return _jvm(s).fromMulticolumnFrequencyTable(
        df._jdf, _jlist(s, list(value_columns)), freq_column, int(seed))


def from_group(weighted_generators, max_rounding_adjustment=0, *, seed):
    """G7 — ``weighted_generators`` is [(weight, generator), ...]."""
    s = _active_spark()
    ws = _jlist(s, [float(w) for w, _ in weighted_generators])
    gs = _jlist(s, [g for _, g in weighted_generators])
    return _jvm(s).fromGroup(ws, gs, int(max_rounding_adjustment), int(seed))


def to_data_frame(spark, spec, n):
    """G8 — ``spec`` is [([col, ...], generator), ...]; returns a
    PySpark DataFrame with a ``__row_id`` column plus the spec's
    columns, built as ONE fused range(n) scan when every generator is
    expression-backed."""
    names = _jlist(spark, [_jlist(spark, list(cols)) for cols, _ in spec])
    gens = _jlist(spark, [g for _, g in spec])
    jdf = _jvm(spark).toDataFrame(spark._jsparkSession, names, gens, int(n))
    return DataFrame(jdf, spark)


# ----------------------------------------------------------- mutators

def with_missing_value(value="", *, seed):
    return _jvm(_active_spark()).withMissingValue(value, int(seed))


def with_insert(charset=_ASCII, *, seed):
    return _jvm(_active_spark()).withInsert(charset, int(seed))


def with_delete(*, seed):
    return _jvm(_active_spark()).withDelete(int(seed))


def with_transpose(*, seed):
    return _jvm(_active_spark()).withTranspose(int(seed))


def with_substitute(charset=_ASCII, *, seed):
    return _jvm(_active_spark()).withSubstitute(charset, int(seed))


def with_noop():
    return _jvm(_active_spark()).withNoop()


def with_categorical_values(values, *, seed):
    s = _active_spark()
    return _jvm(s).withCategoricalValues(_jlist(s, list(values)), int(seed))


def with_permute(*, seed):
    return _jvm(_active_spark()).withPermute(int(seed))


def with_lowercase(*, seed):
    return _jvm(_active_spark()).withLowercase(int(seed))


def with_uppercase(*, seed):
    return _jvm(_active_spark()).withUppercase(int(seed))


def with_datetime_offset(max_delta, unit, dt_format,
                         prevent_wraparound=False, *, seed):
    return _jvm(_active_spark()).withDatetimeOffset(
        int(max_delta), unit, dt_format, bool(prevent_wraparound), int(seed))


def with_repeat(join_with=" ", *, seed):
    return _jvm(_active_spark()).withRepeat(join_with, int(seed))


def with_generator(generator, mode="replace", join_with=" ", *, seed):
    return _jvm(_active_spark()).withGenerator(generator, mode, join_with,
                                               int(seed))


def with_replacement_table(pairs, inline=False, reverse=False, *, seed):
    """M4 — ``pairs`` is [(source, target), ...]."""
    s = _active_spark()
    srcs = _jlist(s, [a for a, _ in pairs])
    tgts = _jlist(s, [b for _, b in pairs])
    return _jvm(s).withReplacementTable(srcs, tgts, bool(inline),
                                        bool(reverse), int(seed))


def with_phonetic_replacement_table(rules, *, seed):
    """M3 — ``rules`` is [(source, target, flags), ...]; flags in
    {"^", "$", "_"} combinations, "" = all."""
    s = _active_spark()
    srcs = _jlist(s, [r[0] for r in rules])
    tgts = _jlist(s, [r[1] for r in rules])
    fls = _jlist(s, [r[2] for r in rules])
    return _jvm(s).withPhoneticReplacementTable(srcs, tgts, fls, int(seed))


def with_cldr_keymap_file(path, charset=None, *, seed):
    return _jvm(_active_spark()).withCldrKeymapFile(
        path, charset if charset else "", int(seed))


def with_regex_replacement_table(df, pattern_column="pattern",
                                 flags_column=None, *, seed):
    """M17 — regex substitutions from a rule DataFrame: ``pattern_column``
    holds the regex, every other column (minus ``flags_column``) is a
    capture-group replacement, numbered ("1", "2", ...) or named. Pure
    config — no callable crosses the bridge."""
    return _jvm(df.sparkSession).withRegexReplacementTable(
        df._jdf, pattern_column, flags_column or "", int(seed))


def with_regex_replacement_table_csv(spark, path, pattern_column="pattern",
                                     flags_column=None, encoding="UTF-8",
                                     delimiter=",", *, seed):
    """M17 from a headered CSV file (reference: mutator.py:1444-1483)."""
    return _jvm(spark).withRegexReplacementTableCsv(
        spark._jsparkSession, path, pattern_column, flags_column or "",
        encoding, delimiter, int(seed))


def with_group(weighted_mutators, *, seed):
    """M19 — ``weighted_mutators`` is [(p, mutator), ...]."""
    s = _active_spark()
    ps = _jlist(s, [float(p) for p, _ in weighted_mutators])
    ms = _jlist(s, [m for _, m in weighted_mutators])
    return _jvm(s).withGroup(ps, ms, int(seed))


def mutate_data_frame(df, spec):
    """M20 — ``spec`` is [([col, ...], [(p, mutator), ...]), ...]."""
    s = df.sparkSession
    col_groups = _jlist(s, [_jlist(s, list(cols)) for cols, _ in spec])
    probs = _jlist(s, [_jlist(s, [float(p) for p, _ in ms])
                       for _, ms in spec])
    muts = _jlist(s, [_jlist(s, [m for _, m in ms]) for _, ms in spec])
    return DataFrame(_jvm(s).mutate(df._jdf, col_groups, probs, muts), s)
