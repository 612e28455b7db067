package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.{CurationOps, SimOps}

/** Second r9 extension batch: DSIR importance weights (e44), n-gram
  * novelty (e45), and embedding outlier pruning (e46). */
class DsirNoveltyOutlierSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  private val sf = SparkTestSession.sf

  private def plan(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("e44 target language dominates the top importance quintile") {
    val rows = CurationOps.e44DsirWeights(spark, sf).collect()
    assert(rows.nonEmpty)
    val byLang = rows.map(r => r.getAs[String]("lang") -> r).toMap
    assert(byLang.contains("en"))
    // the scorer trains p_tgt on English: English docs must score
    // higher on average than every other language, and own a top-share
    // above the 20% base rate
    val en = byLang("en")
    byLang.foreach { case (lang, r) =>
      if (lang != "en")
        assert(en.getAs[Double]("mean_w") > r.getAs[Double]("mean_w"),
          s"en mean_w must beat $lang")
    }
    assert(en.getAs[Double]("top_share") > 0.2,
      s"en top-quintile share ${en.getAs[Double]("top_share")} not above base rate")
    // counts partition the tokenized corpus
    val total = Tables.documents(spark, sf)
      .where(size(split(lower(col("text")), "\\s+")) > 0).count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum <= total)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_top") <= r.getAs[Long]("n_docs"))
      assert(math.abs(r.getAs[Double]("top_share") -
        r.getAs[Long]("n_top").toDouble / r.getAs[Long]("n_docs")) < 1e-5)
    }
  }

  test("e44 LM side broadcasts — scoring joins carry no corpus-keyed exchange") {
    // keepLazyForPlans: e44 materializes-and-releases its feature cache
    // (r15), which would otherwise collapse the plan to a checkpoint
    // stub (the e39/e70 spec convention)
    Tables.keepLazyForPlans = true
    try {
      val p = plan(CurationOps.e44DsirWeights(spark, sf))
      assert(p.contains("BroadcastHashJoin"),
        "the 1024-bucket log-ratio relation must broadcast onto the feature rows")
    } finally Tables.keepLazyForPlans = false
  }

  test("e45 novelty is a valid fraction and sums are consistent") {
    val rows = CurationOps.e45Novelty(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val mean = r.getAs[Double]("mean_novelty")
      assert(mean >= 0.0 && mean <= 1.0)
      assert(r.getAs[Long]("n_unique") <= r.getAs[Long]("n_shingles"))
      assert(r.getAs[Long]("n_fully_novel") <= r.getAs[Long]("n_docs"))
    }
    // every df=1 shingle is unique to exactly one doc: summing n_unique
    // over sources equals the corpus-wide count of df=1 shingles
    // (independent recompute with its own shingle build)
    val toks = filter(split(lower(col("text")), "\\s+"), t => length(t) > 0)
    val uniqueTotal = Tables.documents(spark, sf)
      .select(col("doc_id"), toks.as("w"))
      .where(size(col("w")) >= 3)
      .select(col("doc_id"), explode(array_distinct(
        transform(sequence(lit(0), size(col("w")) - 3),
          i => concat_ws(" ", element_at(col("w"), i + 1),
            element_at(col("w"), i + 2), element_at(col("w"), i + 3))))).as("sh"))
      .groupBy("sh").agg(count(lit(1)).as("df"))
      .where(col("df") === 1).count()
    assert(rows.map(_.getAs[Long]("n_unique")).sum == uniqueTotal)
  }

  test("e46 outlier counts respect the 2-sigma tail bound") {
    val rows = SimOps.e46EmbedOutliers(spark, sf).collect()
    assert(rows.nonEmpty)
    val total = Tables.embeddings(spark, sf).count()
    assert(rows.map(_.getAs[Long]("n_vecs")).sum == total)
    rows.foreach { r =>
      val (n, out) = (r.getAs[Long]("n_vecs"), r.getAs[Long]("n_outliers"))
      assert(out <= n)
      // one-sided Chebyshev: P(X > mean + 2σ) ≤ 1/(1+4) = 0.2
      assert(out.toDouble / n <= 0.2 + 1e-9,
        s"label ${r.getAs[Int]("label")}: ${out.toDouble / n} breaks Chebyshev")
      assert(r.getAs[Double]("std_d2") >= 0.0)
      assert(r.getAs[Double]("outlier_rate") ==
        BigDecimal(out.toDouble / n).setScale(6, BigDecimal.RoundingMode.HALF_UP)
          .toDouble)
    }
    val p = plan(SimOps.e46EmbedOutliers(spark, sf))
    assert(p.contains("BroadcastHashJoin"), "centroids and stats must broadcast")
    assert(!p.contains("SortMergeJoin"), p)
  }
}
