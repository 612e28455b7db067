package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.SimOps

/** The r8 additions to the similarity family: sparse idf-weighted
  * cosine over the shingle inverted index (e30), int8 scalar-quantized
  * ANN (e31), and the typed-Aggregator centroid UDAF (e32). */
class SparseQuantCentroidSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  private val sf = SparkTestSession.sf

  private def plan(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("e30 pairs are ordered, thresholded, and split bimodally on this corpus") {
    val rows = SimOps.e30SparseCosine(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (a, b) = (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))
      val cos = r.getAs[Double]("cos_sim")
      assert(a < b, s"pair not ordered: $a, $b")
      assert(cos >= 0.2 && cos <= 1.000001, s"cos out of range: $cos")
      assert(r.getAs[Long]("n_shared") >= 1)
    }
    // the fixture's true near-dups sit far above the background noise
    // (prototyped: background < 0.05, injected dups > 0.9); 0.2 keeps the
    // threshold scale-invariant (idf grows with N and pushes borderline
    // noise past 0.1 on amplified fixtures)
    val dups = rows.count(_.getAs[Double]("cos_sim") > 0.9)
    assert(dups > 0, "no high-cosine near-dup pairs found")
  }

  test("e30 plan has no cartesian product — pairs come from posting lists") {
    val p = plan(SimOps.e30SparseCosine(spark, sf))
    assert(!p.contains("CartesianProduct"), p)
  }

  test("e31 quantized ranking tracks exact cosine within int8 error") {
    val rows = SimOps.e31QuantAnn(spark, sf).collect()
    assert(rows.length == 15) // 3 queries x top-5
    rows.foreach { r =>
      val (q, e) = (r.getAs[Double]("q_cos"), r.getAs[Double]("exact_cos"))
      // 64-dim int8 symmetric quantization: cosine error is a few 1e-3;
      // 0.02 is a loose ceiling that still catches a broken quantizer
      assert(math.abs(q - e) < 0.02, s"quantization error too large: q=$q exact=$e")
    }
    // per query: ranks are 1..5 ordered by q_cos desc
    rows.groupBy(_.getAs[Long]("q_id")).foreach { case (_, g) =>
      val sorted = g.sortBy(_.getAs[Int]("rank"))
      assert(sorted.map(_.getAs[Int]("rank")).toSeq == Seq(1, 2, 3, 4, 5))
      val cs = sorted.map(_.getAs[Double]("q_cos")).toSeq
      assert(cs == cs.sorted.reverse, s"q_cos not descending: $cs")
    }
  }

  test("e32 typed-UDAF centroid equals the expression-based per-position mean") {
    // declared shape is exploded scalar rows (driver-sortable); regroup
    // per label for the comparison against the expression-based build
    val udafOut = SimOps.e32CentroidAgg(spark, sf).collect()
      .groupBy(_.getAs[Int]("label"))
      .map { case (label, rows) =>
        val sorted = rows.sortBy(_.getAs[Int]("pos"))
        assert(sorted.map(_.getAs[Int]("pos")).toSeq == sorted.indices.toSeq,
          s"pos not dense for label $label")
        label -> (sorted.head.getAs[Long]("n_vecs"),
          sorted.map(_.getAs[Double]("centroid_val")).toList)
      }
    val expr = Tables.embeddings(spark, sf)
      .select(col("label"), posexplode(col("embedding").cast("array<double>")))
      .groupBy("label", "pos").agg(avg(col("col")).as("m"))
      .groupBy("label").agg(
        sort_array(collect_list(struct(col("pos"), col("m")))).as("ps"))
      .select(col("label"), transform(col("ps"),
        p => round(p.getField("m"), 6)).as("centroid"))
      .collect()
      .map(r => r.getAs[Int]("label") -> r.getAs[scala.collection.Seq[Double]]("centroid").toList)
      .toMap
    assert(udafOut.keySet == expr.keySet)
    udafOut.foreach { case (label, (n, c)) =>
      assert(n > 0)
      assert(c == expr(label), s"centroid mismatch for label $label")
    }
  }

  test("VectorCentroid merge rejects mixed dimensions; zero-length vectors count") {
    import graft.functions.{CentroidBuf, VectorCentroid}
    val mism = intercept[IllegalArgumentException] {
      VectorCentroid.merge(
        CentroidBuf(Array(1.0, 2.0), 1L), CentroidBuf(Array(1.0, 2.0, 3.0), 1L))
    }
    assert(mism.getMessage.contains("mismatch"))
    // a zero-length vector initializes (sums=[], n=1); a later non-empty
    // vector must ERROR, not silently re-initialize and drop the count
    val z = VectorCentroid.reduce(VectorCentroid.zero, Array.emptyDoubleArray)
    assert(z.n == 1L && z.sums.isEmpty)
    intercept[IllegalArgumentException] {
      VectorCentroid.reduce(z, Array(1.0, 2.0))
    }
    // all-zero-length groups merge and count correctly
    val m = VectorCentroid.merge(z, CentroidBuf(Array.emptyDoubleArray, 2L))
    assert(m.n == 3L && m.sums.isEmpty)
  }

  test("e32 runs as a partial (map-side combined) aggregation") {
    val p = plan(SimOps.e32CentroidAgg(spark, sf))
    // typed Aggregator → ObjectHashAggregate with a partial phase below
    // the exchange: the buffers shuffle, never the vectors
    assert(p.contains("ObjectHashAggregate"), p)
  }

  test("e34 keeper is the per-label cosine argmax; centroids broadcast, argmax partial-aggregates") {
    val out = SimOps.e34CentroidKeeper(spark, sf)
    val rows = out.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      // max >= mean always; equality only in a 1-vector cluster
      assert(r.getAs[Double]("keeper_cos") >= r.getAs[Double]("mean_cos") - 1e-9)
      assert(r.getAs[Long]("n_vecs") > 0)
    }
    // independent argmax recompute on one label
    val label0 = rows.head.getAs[Int]("label")
    val scored = Tables.embeddings(spark, sf)
      .where(col("label") === label0)
      .count()
    assert(scored == rows.head.getAs[Long]("n_vecs"))
    val p = plan(out)
    assert(p.contains("BroadcastHashJoin"),
      "the label-count-sized centroid dim must broadcast")
    assert(!p.contains("CartesianProduct"))
    assert(p.contains("partial_max") || p.contains("SortAggregate"),
      "the keeper election must collapse in a partial aggregate")
  }
}
