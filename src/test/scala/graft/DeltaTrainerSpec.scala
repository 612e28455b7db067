package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.CurationOps

/** e48c — the BPE trainer with incremental pair-count deltas. The
  * whole contract is that the delta bookkeeping is INVISIBLE in the
  * result: the maintained pair state must reproduce, at every
  * iteration, exactly the statistics a full recount would produce —
  * same adopted pairs, same counts, same live vocabulary, same token
  * totals. The spec asserts trace equality against e48b (which
  * BpeSemanticSpec already proves equal to the sequential greedy BPE
  * reference), at the declared 8 merges and at a smaller count to rule
  * out an off-by-one in the rotation. */
class DeltaTrainerSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  private val sf = SparkTestSession.sf

  private def trace(df: org.apache.spark.sql.DataFrame): Seq[Seq[Any]] =
    df.collect().toSeq.map(_.toSeq)

  test("e48c 8-merge trace equals the full-recount trainer row-for-row") {
    val recount = trace(CurationOps.e48bBpeTrainN(spark, sf, 8))
    val delta = trace(CurationOps.e48cBpeDeltaN(spark, sf, 8))
    assert(delta.length == 8)
    recount.zip(delta).zipWithIndex.foreach { case ((r, d), i) =>
      assert(r == d, s"iteration ${i + 1}: recount=$r delta=$d")
    }
  }

  test("e48c trace equality holds at 3 merges (rotation off-by-one guard)") {
    val recount = trace(CurationOps.e48bBpeTrainN(spark, sf, 3))
    val delta = trace(CurationOps.e48cBpeDeltaN(spark, sf, 3))
    assert(recount == delta)
  }

  test("e48c vocab shrinks or holds as merges consume pairs, totals telescope") {
    val rows = CurationOps.e48cBpeDeltaN(spark, sf, 8).collect()
    rows.sliding(2).withFilter(_.length == 2).foreach { w =>
      val (a, b) = (w(0), w(1))
      // telescoping: iteration k's toks_after is k+1's toks_before
      assert(a.getAs[Long]("toks_after") == b.getAs[Long]("toks_before"),
        s"token totals do not telescope at iter ${b.getAs[Int]("iter")}")
    }
    rows.foreach { r =>
      assert(r.getAs[Long]("n_merged") >= 1, "an adopted merge must fire")
      assert(r.getAs[Long]("n_occ") >= r.getAs[Long]("n_merged"),
        "occurrence count is an upper bound on non-overlapping merges")
    }
  }
}
