package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.{CurationOps, SimOps}

/** The r9 pipeline additions past the verdict list: k-means training
  * iterations (e40), sliding-window chunking (e41), leakage-safe split
  * assignment (e42), and the snapshot diff (e43). */
class ChunkSplitDiffSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  private val sf = SparkTestSession.sf

  private def plan(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("e40 clusters partition the corpus and the Lloyd objective is non-increasing") {
    val rows = SimOps.e40KmeansTrain(spark, sf).collect()
    assert(rows.nonEmpty)
    val dim = Tables.embeddings(spark, sf)
      .select(size(col("embedding"))).head().getInt(0)
    // one row per (cluster, pos): every surviving cluster carries the
    // full centroid, and memberships partition the vector set exactly
    val byCluster = rows.groupBy(_.getAs[Int]("cluster"))
    byCluster.foreach { case (c, g) =>
      assert(g.map(_.getAs[Int]("pos")).sorted.toSeq == (0 until dim),
        s"cluster $c missing centroid positions")
      assert(g.map(_.getAs[Long]("n_members")).distinct.length == 1)
      assert(g.head.getAs[Double]("inertia") >= 0.0)
    }
    val total = Tables.embeddings(spark, sf).count()
    val members = byCluster.map(_._2.head.getAs[Long]("n_members")).sum
    assert(members == total, s"memberships $members != corpus $total")
    // Lloyd: mean d2 vs the centroids that produced the assignment
    // cannot grow with another assign+recompute round
    def objective(iters: Int): Double = {
      val cl = SimOps.kmeansTrain(spark, sf, iters)
        .select("cluster", "n_members", "inertia").distinct().collect()
      cl.map(r => r.getAs[Double]("inertia") * r.getAs[Long]("n_members")).sum /
        cl.map(_.getAs[Long]("n_members")).sum
    }
    val (o1, o2) = (objective(1), objective(2))
    assert(o2 <= o1 + 1e-6, s"objective grew: iter1=$o1 iter2=$o2")
  }

  test("e40 assignment is map-side: no join anywhere, recompute partial-aggregates") {
    val p = plan(SimOps.e40KmeansTrain(spark, sf))
    assert(!p.contains("Join"), s"k-means assignment must not join:\n$p")
    assert(p.contains("ObjectHashAggregate"),
      "centroid recompute must run the partial-agg UDAF")
  }

  test("e41 chunk manifest covers every token with stride-12 width-16 windows") {
    val rows = CurationOps.e41ChunkOverlap(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[Long]("doc_id")).foreach { case (id, g) =>
      val sorted = g.sortBy(_.getAs[Int]("chunk_id"))
      val nTok = sorted.head.getAs[Int]("n_tok")
      assert(sorted.map(_.getAs[Int]("chunk_id")).toSeq ==
        (0 until sorted.length), s"doc $id chunk ids not dense")
      assert(sorted.head.getAs[Int]("n_chunks") == sorted.length)
      sorted.zipWithIndex.foreach { case (r, i) =>
        assert(r.getAs[Int]("start_tok") == i * 12)
        val len = r.getAs[Int]("n_tok_chunk")
        assert(len >= 1 && len <= 16, s"doc $id chunk $i len $len")
      }
      val last = sorted.last
      assert(last.getAs[Int]("start_tok") + last.getAs[Int]("n_tok_chunk") == nTok,
        s"doc $id last chunk must end at n_tok")
      // width > stride: consecutive chunks overlap, so coverage is total
      assert(sorted.length == 1 || 16 > 12)
    }
  }

  test("e41 plan is shuffle-free except the declared ordering") {
    val p = plan(CurationOps.e41ChunkOverlap(spark, sf))
    assert(!p.contains("Join"), p)
    // allowed: the declared sort + the fixture-gated staging spread
    // (spreadIfNarrow fires on the test fixture's 1-split scan; a
    // many-split production corpus sees only the sort)
    val exchanges = "Exchange".r.findAllIn(p).length
    assert(exchanges <= 2,
      s"chunking must not shuffle (only the gated spread + final sort): $exchanges\n$p")
    assert(!p.contains("HashAggregate"), "no aggregation — chunking is per-row")
  }

  test("e42 split partitions the corpus with zero cross-split duplicate groups") {
    val rows = CurationOps.e42SplitLeakage(spark, sf).collect()
    val splits = rows.map(_.getAs[String]("split")).toSet
    assert(splits.subsetOf(Set("train", "val", "test")) && splits.contains("train"))
    rows.foreach { r =>
      assert(r.getAs[Long]("leaked_groups") == 0L)
      assert(r.getAs[Long]("dup_docs") ==
        r.getAs[Long]("n_docs") - r.getAs[Long]("n_groups"))
    }
    val total = Tables.documents(spark, sf).count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == total)
    // train dominates under the 8/1/1 bucket rule
    val train = rows.find(_.getAs[String]("split") == "train").get.getAs[Long]("n_docs")
    assert(train > total / 2)
  }

  test("e43 diff counts match the modular derivation rule per status") {
    val rows = CurationOps.e43SnapshotDiff(spark, sf).collect()
    def n(status: String): Long =
      rows.filter(_.getAs[String]("status") == status).map(_.getAs[Long]("n_docs")).sum
    val docs = Tables.documents(spark, sf).select("doc_id").collect()
      .map(_.getLong(0))
    assert(n("removed") == docs.count(_ % 7 == 0))
    assert(n("added") == docs.count(_ % 11 == 0))
    assert(n("changed") == docs.count(id => id % 7 != 0 && id % 5 == 0))
    assert(n("unchanged") == docs.count(id => id % 7 != 0 && id % 5 != 0))
  }
}
