package graft

/** The production session factory: settings land on the session and
  * the SQL surface is wired. (In this shared-JVM test the builder
  * attaches to the existing session — getOrCreate applies the SQL
  * confs — which is also the notebook upgrade path.) */
class GraftSessionSpec extends SparkSpec {

  test("GraftSession.local applies the engine's settings") {
    val s = GraftSession.local(4)
    assert(s.conf.get("spark.sql.adaptive.enabled") == "true")
    assert(s.conf.get("spark.sql.adaptive.skewJoin.enabled") == "true")
    assert(s.conf.get("spark.sql.session.timeZone") == "UTC")
    assert(s.conf.get("spark.sql.shuffle.partitions") == "4")
  }

  test("SQL surface available after explicit registration") {
    val s = GraftSession.local(4)
    GraftExtensions.register(s)
    val got = s.sql("SELECT int_dot(array(2, 3), array(4, 5)) AS d")
      .collect().head.getLong(0)
    assert(got == 23L)
  }
}
