package graft

import graft.queries.Relational

/** Smoke + determinism for the Layer B corpus. Value-level correctness
  * is validated against the DuckDB oracle by the driver (and locally by
  * scripts/compare_oracle.py). */
class RelationalSpec extends SparkSpec {

  for ((name, fn, sql) <- Relational.all) {
    test(s"$name runs, is non-empty, and is deterministic") {
      val a = fn(spark, sfDir).collect()
      assert(a.nonEmpty, s"$name returned 0 rows at sf0.001")
      val b = fn(spark, sfDir).collect()
      assert(a.sameElements(b), s"$name not deterministic across runs")
      val head = sql.trim.toLowerCase
      assert(head.startsWith("select") || head.startsWith("with"))
    }
  }

  test("q18: HLL sketch tracks exact distincts within the error bound") {
    Relational.q18ApproxDistinct(spark, sfDir).collect().foreach { r =>
      val (eo, ao) = (r.getLong(1), r.getLong(2))
      val (ep, ap) = (r.getLong(3), r.getLong(4))
      assert(math.abs(ao - eo) <= math.max(3, 0.1 * eo), s"orders $eo vs $ao")
      assert(math.abs(ap - ep) <= math.max(3, 0.1 * ep), s"parts $ep vs $ap")
    }
  }

  test("q20: t-digest percentiles track exact q19 within 2%") {
    val exact = Relational.q19Percentiles(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    Relational.q20ApproxPercentiles(spark, sfDir).collect().foreach { r =>
      val (e50, e95) = exact(r.getString(0))
      assert(math.abs(r.getDouble(1) - e50) <= 0.02 * e50,
        s"p50 $e50 vs ${r.getDouble(1)}")
      assert(math.abs(r.getDouble(2) - e95) <= 0.02 * e95,
        s"p95 $e95 vs ${r.getDouble(2)}")
    }
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("queries and oracleSql keys line up") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }
}
