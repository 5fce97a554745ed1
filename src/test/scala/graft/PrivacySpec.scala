package graft

import graft.queries.Privacy

/** Invariants of the privacy-risk audits (pv01–pv03) that hold on ANY
  * corpus — the oracle hash-match pins the values, these pin the
  * semantics.
  *
  * Extends [[SparkSpec]] — `getOrCreate()` returns the JVM-shared
  * session, so a suite-local `afterAll { spark.stop() }` here once
  * killed the session under every suite scheduled after this one
  * (76 cross-suite failures). Never stop the shared session. */
class PrivacySpec extends SparkSpec {

  test("pv01: class-size histogram conserves the released rows and " +
    "flags exactly the sub-k sizes") {
    val rows = Privacy.kAnonymityAudit(spark, sfDir).collect()
    val released = spark.read
      .parquet(s"$sfDir/customer.parquet").count()
    assert(rows.map(_.getLong(2)).sum == released,
      "histogram rows must sum to the release size")
    rows.foreach { r =>
      assert(r.getBoolean(3) == (r.getLong(0) < 5),
        s"at_risk must be class_size < 5, got $r")
      assert(r.getLong(2) == r.getLong(0) * r.getLong(1),
        "n_rows must equal class_size * n_classes")
    }
  }

  test("pv02: generalizing can only merge classes — risk is " +
    "non-increasing up the ladder, and full suppression meets k") {
    val rows = Privacy.generalizationLadder(spark, sfDir).collect()
      .sortBy(_.getLong(0))
    assert(rows.map(_.getLong(0)).toSeq == Seq(0L, 1L, 2L, 3L, 4L))
    // each coarsening merges classes: fewer classes, larger minimum
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(b.getLong(1) <= a.getLong(1),
        s"coarser level grew the class count: $a -> $b")
      assert(b.getLong(2) >= a.getLong(2),
        s"coarser level shrank the min class: $a -> $b")
    }
    val released = spark.read.parquet(s"$sfDir/customer.parquet").count()
    val top = rows.last
    assert(top.getLong(1) == 1L && top.getLong(2) == released,
      "level 4 is one class holding every row")
    assert(top.getBoolean(5), "full suppression must meet k")
    rows.foreach { r =>
      assert(r.getBoolean(5) == (r.getLong(2) >= 5))
      assert(r.getLong(4) == r.getLong(3) * 1000000L / released)
    }
  }

  test("pv03: diversity histogram conserves rows and flags exactly " +
    "the sub-l classes") {
    val rows = Privacy.lDiversityAudit(spark, sfDir).collect()
    val released = spark.read.parquet(s"$sfDir/customer.parquet").count()
    assert(rows.map(_.getLong(2)).sum == released)
    rows.foreach { r =>
      assert(r.getBoolean(3) == (r.getLong(0) < 3))
      // a class cannot have more distinct sensitive values than rows —
      // so every histogram bucket's rows are >= its diversity level
      assert(r.getLong(2) >= r.getLong(0) * r.getLong(1))
    }
  }
}
