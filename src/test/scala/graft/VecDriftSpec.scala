package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.VecStreams
import graft.sources.IvfServe

/** e2g — the quantizer-lifecycle drift gate (r12 verdict ask #2).
  * Claims: (1) the fixture's iid arrivals do NOT trip the gate (the
  * declared key's stable output); (2) PLANTED drifted arrivals — a
  * tight cluster far outside the training distribution — do trip it;
  * (3) the re-stage path retrains on base+arrivals and REDISTRIBUTES
  * the drifted mass (max per-cell arrival occupancy strictly drops),
  * shrinking a drifted query's probe candidate volume while its
  * recall@3 against the exact full-corpus top-3 does not drop. The
  * gate protects probe COST — exact in-cell rescore keeps answers
  * exact either way; an ever-fattening frozen cell is what kills a
  * served IVF index, and that is what the occupancy-skew metric sees. */
class VecDriftSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  private val sf = SparkTestSession.sf

  test("fixture arrivals are iid — the gate must not trip") {
    val rows = VecStreams.e2gDriftGate(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getLong(2)).sum == VecStreams.ArrivalBound,
      "every arrival lands in exactly one cell")
    val maxDrift = rows.head.getDouble(6)
    assert(rows.forall(_.getDouble(6) == maxDrift), "max_drift is a scalar attach")
    assert(maxDrift < VecStreams.DriftBar,
      f"iid arrivals must stay under the bar: $maxDrift%.4f >= ${VecStreams.DriftBar}")
    assert(rows.forall(!_.getBoolean(7)), "gate must not trip on the fixture")
  }

  test("planted drift trips the gate; re-stage redistributes and keeps recall") {
    import java.nio.file.Files
    val tmp = Files.createTempDirectory("vec-drift")
    val work = tmp.resolve("work")
    try {
      // synthetic corpus: 952 iid base vectors (ids 16..967), a 48-doc
      // base tail in a DRIFT REGION (ids 968..1015, shifted +5 — dense
      // but un-seeded: the frozen build seeds ids 16..79, all normal,
      // so the whole region collapses into ONE frozen cell), and 16
      // ARRIVALS (ids 0..15) landing in that region — the fold fattens
      // the one cell further, which is exactly the drift mode the gate
      // exists to catch
      val rnd = new scala.util.Random(42)
      def vec(shift: Double, spread: Double): Seq[Float] =
        Seq.fill(64)((shift + (rnd.nextDouble() - 0.5) * spread).toFloat)
      val base = (16L until 968L).map(i => (i, vec(0.0, 2.0), (i % 10).toInt)) ++
        (968L until 1016L).map(i => (i, vec(5.0, 0.5), (i % 10).toInt))
      val arrivals = (0L until VecStreams.ArrivalBound).map(i =>
        (i, vec(5.0, 0.5), (i % 10).toInt))
      import spark.implicits._
      (base ++ arrivals).toDF("vec_id", "embedding", "label")
        .coalesce(1).write.parquet(tmp.resolve("embeddings.parquet").toString)
      val d = tmp.toString
      VecStreams.ensureFoldBase(spark, d)
      val cents = IvfServe.centroidsAt(spark, VecStreams.foldBaseDir(d))
      VecStreams.e2fFoldBatch(
        arrivals.toDF("vec_id", "embedding", "label"), 0L, cents, work)
      val report = VecStreams.driftReport(spark, d, work).collect()
      val maxDrift = report.head.getDouble(6)
      assert(report.head.getBoolean(7) && maxDrift > VecStreams.DriftBar,
        f"a one-cell arrival cluster must trip the gate: $maxDrift%.4f")
      val arrCellsBefore = report.count(_.getLong(2) > 0)
      val maxArrBefore = report.map(_.getLong(2)).max
      // probe cost/recall BEFORE: candidates for the drifted queries
      // (vec_id < 8 — arrivals by construction) through the frozen
      // layout + folds
      val candBefore = VecStreams.e2fCandidates(spark, d, work).count()
      def exactTop3(): Map[Long, Set[Long]] = {
        val all = Tables.embeddings(spark, d)
          .select(col("vec_id"), col("embedding").cast("array<double>"))
          .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
        def cos(a: Array[Double], b: Array[Double]): Double = {
          var dp = 0.0; var na = 0.0; var nb = 0.0; var i = 0
          while (i < a.length) { dp += a(i)*b(i); na += a(i)*a(i); nb += b(i)*b(i); i += 1 }
          dp / (math.sqrt(na) * math.sqrt(nb))
        }
        (0L until 8L).map(q => q ->
          all.toSeq.filter(_._1 != q).map { case (c, x) => (c, cos(all(q), x)) }
            .sortBy { case (c, s2) => (-s2, c) }.take(3).map(_._1).toSet).toMap
      }
      val exact = exactTop3()
      def recall(rows: Array[org.apache.spark.sql.Row]): Double = {
        // topK rows are (q_id, rank, cand_id, cos_sim)
        val byQ = rows.groupBy(_.getLong(0))
        byQ.map { case (q, rs) =>
          rs.map(_.getLong(2)).toSet.intersect(exact(q)).size / 3.0 }.sum / byQ.size
      }
      val recBefore = recall(VecStreams.e2fProbe(spark, d, work).collect())
      // RE-STAGE: retrain on base + folded arrivals, re-assign
      val restagedRoot = VecStreams.restageWithArrivals(spark, d, work)
      val asg = spark.read.parquet(s"$restagedRoot/lists")
        .where(col("vec_id") < VecStreams.ArrivalBound)
        .groupBy("cell").count().collect()
      val maxArrAfter = asg.map(_.getLong(1)).max
      assert(maxArrAfter < maxArrBefore,
        s"re-training must break up the fat cell: $maxArrAfter >= $maxArrBefore")
      // the rebalanced index serves through its probe knob (the e2w
      // trajectory; nprobe=12 of 64 rebalanced cells measured here):
      // same recall as the fat frozen cell at strictly fewer
      // candidates read — the COST restoration the gate exists for
      // (answers are exact either way)
      val after12 =
        VecStreams.multiprobeCandidatesAt(spark, restagedRoot.toString, None, d, 12)
      val candAfter = after12.count()
      val recAfter = recall(graft.ops.SimOps.topK(after12, 3).collect())
      info(f"drift ${maxDrift}%.3f tripped; arrival cells $arrCellsBefore, " +
        f"max arrival cell $maxArrBefore -> $maxArrAfter, " +
        f"candidates $candBefore -> $candAfter, recall $recBefore%.3f -> $recAfter%.3f")
      assert(candAfter < candBefore,
        s"re-staged multiprobe must read fewer candidates than the fat cell: " +
          s"$candAfter >= $candBefore")
      assert(recAfter >= recBefore, "re-staging must not cost recall")
    } finally {
      graft.streaming.DocStreams.deleteTree(
        java.nio.file.Paths.get(VecStreams.foldBaseDir(tmp.toString)))
      graft.streaming.DocStreams.deleteTree(tmp)
    }
  }
}
