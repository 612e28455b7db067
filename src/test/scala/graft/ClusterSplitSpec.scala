package graft

import java.security.MessageDigest
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.ClusterOps

/** e67 — cluster-aware split. The assignment arithmetic is replayed with
  * java.security MessageDigest (no Spark expressions) over the e16
  * labels (themselves independently oracle-gated), and the structural
  * guarantees a leakage-proof split owes are asserted directly: every
  * doc assigned exactly once, clusters never straddle splits, and the
  * split actually keys on the CLUSTER (all members of any multi-doc
  * cluster land together).
  */
class ClusterSplitSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  private val sf = SparkTestSession.sf

  private def bucket(rep: Long): Long = {
    val hex = MessageDigest.getInstance("MD5")
      .digest(rep.toString.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16) % 10
  }
  private def splitOf(rep: Long): String = {
    val b = bucket(rep)
    if (b < 8) "train" else if (b == 8) "val" else "test"
  }

  test("e67 equals the MessageDigest recompute over e16's labels") {
    val labels = ClusterOps.e16DedupClusters(spark, sf)
      .select("doc_id", "cluster_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "n_chars").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val assigned = docs.map { case (id, nc) =>
      val rep = labels.getOrElse(id, id)
      (splitOf(rep), rep, nc)
    }
    val expect = assigned.groupBy(_._1).map { case (s, v) =>
      s -> (v.size.toLong, v.map(_._2).distinct.size.toLong, v.map(_._3).sum)
    }
    val got = ClusterOps.e67ClusterSplit(spark, sf).collect()
    assert(got.map(_.getString(0)).toSet == expect.keySet, "splits present")
    got.foreach { r =>
      val (n, cl, nc) = expect(r.getString(0))
      assert(r.getLong(1) == n, s"${r.getString(0)} n_docs")
      assert(r.getLong(2) == cl, s"${r.getString(0)} n_clusters")
      assert(r.getLong(3) == nc, s"${r.getString(0)} n_chars")
      assert(r.getLong(4) == 0L, "leak gate")
    }
    assert(got.map(_.getLong(1)).sum == docs.length, "every doc assigned once")
  }

  test("multi-doc clusters land in ONE split — the leakage-proof property") {
    val labels = ClusterOps.e16DedupClusters(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val multi = labels.groupBy(_._2).filter(_._2.length > 1)
    assert(multi.nonEmpty, "fixture must contain near-dup clusters")
    multi.foreach { case (rep, members) =>
      val splits = members.map(m => splitOf(rep)).distinct
      assert(splits.length == 1, s"cluster $rep straddles $splits")
    }
    // and a doc-keyed split WOULD leak on this fixture — the mistake the
    // gate exists to catch is detectable here, not vacuous
    val docKeyed = multi.exists { case (_, members) =>
      members.map(m => splitOf(m._1)).distinct.length > 1
    }
    assert(docKeyed, "fixture must be able to distinguish doc- from cluster-keyed splits")
  }
}
