package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.{SimOps, TextOps}

/** The xxhash64 production-hash fast paths must be behaviorally
  * equivalent to their md5/sha2 oracle-stable twins wherever the output
  * is hash-independent — the guarantee that lets a deployment swap the
  * cheap hash in without changing results (only hash VALUES differ,
  * which DuckDB can't reproduce; everything checkable is checked here). */
class XxHashVariantSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  private val sf = SparkTestSession.sf

  test("e1x: xxhash64 dedup groups exactly like sha2 dedup") {
    val viaSha = TextOps.e1TextDedup(spark, sf).select("keeper_id", "n_copies")
    val viaXx = TextOps.e1xTextDedupXx(spark, sf)
    assert(viaXx.exceptAll(viaSha).count() == 0)
    assert(viaSha.exceptAll(viaXx).count() == 0)
    assert(viaXx.count() > 0)
  }

  test("e6x: exact duplicates surface identically; shared pairs carry identical Jaccard") {
    val md = SimOps.e6MinhashLsh(spark, sf)
      .select("d1", "d2", "n_common", "n1", "n2", "jaccard")
    val xx = SimOps.e6xMinhashLshXx(spark, sf)
      .select("d1", "d2", "n_common", "n1", "n2", "jaccard")
    // exact duplicates (jaccard = 1): MinHash signatures collide in every
    // band under ANY hash family, so both variants must report them
    val exactMd = md.where(col("jaccard") === 1.0).select("d1", "d2")
    val exactXx = xx.where(col("jaccard") === 1.0).select("d1", "d2")
    assert(exactMd.exceptAll(exactXx).count() == 0)
    assert(exactXx.exceptAll(exactMd).count() == 0)
    // verification math is hash-independent: any pair candidate under both
    // hash families must agree on every count and the Jaccard value
    val joined = md.as("m").join(xx.as("x"), Seq("d1", "d2"))
    assert(joined.count() > 0)
    assert(joined.where(
      col("m.n_common") =!= col("x.n_common") ||
        col("m.n1") =!= col("x.n1") || col("m.n2") =!= col("x.n2") ||
        col("m.jaccard") =!= col("x.jaccard")).count() == 0)
  }

  test("e6x declared slice: non-trivial at sf0.1 and equal to the md5 family's exact-dup slice") {
    // the DECLARED e6x key is the identical-shingle-set pair slice; at
    // sf0.01 (the driver's gate) the fixture genuinely has no exact dups
    // (the oracle agrees: 0 = 0) — this pins that the slice is NON-empty
    // one scale up and family-invariant there, so the key is a real gate
    val d = "/root/testdata/sf0.1"
    val declared = SimOps.e6xMinhashXxDups(spark, d)
    val viaMd = SimOps.e6MinhashLsh(spark, d)
      .where(col("n_common") === col("n1") && col("n_common") === col("n2"))
      .select(col("d1"), col("d2"), col("n_common").as("n_sh"))
    assert(declared.count() > 0)
    assert(declared.exceptAll(viaMd).count() == 0)
    assert(viaMd.exceptAll(declared).count() == 0)
    spark.catalog.clearCache() // both pipelines persist shared subtrees
  }

  test("e11x: shingle counts equal e11's; fingerprint equality classes match md5's") {
    val md = TextOps.e11Fingerprint(spark, sf).select(col("doc_id"),
      col("n_shingles"), col("fp_md5"))
    val xx = TextOps.e11xFingerprintXx(spark, sf).select(col("doc_id"),
      col("n_shingles").as("n_shingles_xx"), col("fp_xx"))
    val j = md.join(xx, "doc_id")
    assert(j.count() == md.count())
    assert(j.where(col("n_shingles") =!= col("n_shingles_xx")).count() == 0)
    // same partition into duplicate classes: each md5 fingerprint maps to
    // exactly one xx fingerprint and vice versa
    assert(j.groupBy("fp_md5").agg(countDistinct("fp_xx").as("k"))
      .where(col("k") > 1).count() == 0)
    assert(j.groupBy("fp_xx").agg(countDistinct("fp_md5").as("k"))
      .where(col("k") > 1).count() == 0)
  }
}
