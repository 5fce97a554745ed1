package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic, partition-stable per-row randomness.
  *
  * The reference threads a seeded `np.random.Generator` through every
  * operator (reference: gecko/generator.py:70-71, docs/index.md:126-127).
  * Bitwise parity with NumPy PCG64 is a non-goal (SURVEY.md §1); the
  * contract here is *self*-reproducibility: the k-th uniform drawn for a
  * given (rowId, seed) is a pure function of those values, so output is
  * byte-identical across runs, partition counts, and cluster sizes —
  * unlike `rand(seed)`, whose stream depends on partition layout.
  *
  * All helpers are plain Catalyst expressions (xxhash64 + arithmetic),
  * so they stay inside whole-stage codegen.
  */
object Rand {

  /** Uniform double in [0, 1). Distinct draws for one operator use
    * distinct draw indices k. The hash is truncated to 53 bits so the
    * double conversion is exact — a 63-bit value near 2^63 would round
    * UP to 2^63 and yield exactly 1.0, breaking floor(u*n) indexing
    * once in ~1e16 draws (which a trillion-row run does hit). */
  def uniform(rowId: Column, seed: Long, k: Int = 0): Column =
    shiftrightunsigned(xxhash64(rowId, lit(seed), lit(k)), 11)
      .cast("double") / lit(9007199254740992.0) // 2^53

  /** Uniform integer in [0, n) where n is a per-row column (e.g. a string
    * length). n must be >= 1 for the row to be meaningful. */
  def uniformInt(rowId: Column, seed: Long, k: Int, n: Column): Column =
    floor(uniform(rowId, seed, k) * n.cast("double")).cast("int")

  /** Standard normal via Box-Muller on two stable uniforms (codegen-able:
    * sqrt/log/cos are Catalyst builtins). u1 is nudged away from 0. */
  def gaussian(rowId: Column, seed: Long, k: Int = 0): Column = {
    val u1 = uniform(rowId, seed, 2 * k) + lit(1e-300)
    val u2 = uniform(rowId, seed, 2 * k + 1)
    sqrt(lit(-2.0) * log(u1)) * cos(lit(2.0 * math.Pi) * u2)
  }

  /** Pick an index in [0, k) for a weighted choice given cumulative
    * probabilities (driver-side small k): returns a when-chain. */
  def weightedPick(u: Column, cumProbs: Array[Double]): Column = {
    // cumProbs strictly increasing, last == 1.0
    cumProbs.init.zipWithIndex.foldRight(lit(cumProbs.length - 1)) {
      case ((cp, i), elseCol) => when(u < cp, lit(i)).otherwise(elseCol)
    }
  }
}
