package graft.core

import java.util.concurrent.ConcurrentLinkedQueue
import scala.jdk.CollectionConverters._

/** Shared constants + validation for the Layer A engine. */
object Gecko {
  /** Stable row-identity column: the engine's analog of the pandas index
    * that the reference leans on for alignment (SURVEY.md §1). Always a
    * unique Long; all per-row randomness derives from it. */
  val RowId = "__row_id"

  def checkProbability(p: Double): Unit = {
    if (p < 0 || p > 1)
      throw new IllegalArgumentException(
        "probability is out of range, must be between 0 and 1")
  }
}

/** Engine warning channel — the Spark analog of the reference's
  * GeckoWarning (reference: gecko/_typedefs.py:11-16, mutator.py:68-73).
  * Mutator p-protocol stats run eagerly on the driver, so warnings are
  * collected driver-side; tests drain them like pytest.warns. */
object Warnings {
  private val queue = new ConcurrentLinkedQueue[String]()

  /** Same structural message as the reference's _warn_p
    * (mutator.py:68-73). */
  def warnP(fnName: String, pExpected: Double, pActual: Double): Unit =
    warn(s"$fnName: desired probability of $pExpected cannot be met since " +
      s"percentage of rows that could possibly be mutated is $pActual")

  def warn(msg: String): Unit = {
    queue.add(msg)
    System.err.println(s"[gecko-warning] $msg")
  }

  def drain(): Seq[String] = {
    val out = queue.iterator().asScala.toList
    queue.clear()
    out
  }
}
