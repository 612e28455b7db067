package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.CurationOps

/** e54x — the xxhash64-sampled CMS gate twin (r10 verdict ask #6, the
  * e1/e1x split applied to e54's vocabulary sample). The declared row
  * carries only the hash-independent contract; the hash-dependent
  * claims live here: the xx membership filter selects a genuine ~1/16
  * vocabulary slice, its top-20 exact counts equal a plain recount,
  * and the quorum verdict holds under the same CMS ε-bound the md5 arm
  * gates. */
class CmsXxGateSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  private val sf = SparkTestSession.sf

  private def bigrams() =
    Tables.documents(spark, sf)
      .select(expr("filter(split(lower(text), '\\\\s+'), x -> length(x) > 0)").as("w"))
      .where(size(col("w")) >= 2)
      .select(explode(expr(
        "transform(sequence(1, size(w) - 1), i -> concat_ws(' ', w[i-1], w[i]))"))
        .as("bg"))

  test("declared row: gate passes, probe count 20, bound = ceil(eps * total)") {
    val r = CurationOps.e54xCmsXxGate(spark, sf).head()
    assert(r.getLong(0) == 20L, "probe count")
    assert(r.getBoolean(1), "quorum gate")
    val total = r.getLong(2)
    assert(r.getLong(3) == math.ceil(1e-4 * total).toLong, "eps bound")
    assert(total > 0)
  }

  test("xx membership is a genuine vocabulary slice: ~1/16 of distinct bigrams, counts exact") {
    val bg = bigrams()
    val vocabN = bg.distinct().count()
    val sampled = bg
      .where(pmod(xxhash64(concat(lit("cms:"), col("bg"))), lit(16L)) === 0)
      .groupBy("bg").agg(count(lit(1)).as("n"))
    val sampleVocab = sampled.count()
    // binomial p=1/16: generous 3x bounds either side still catch a
    // broken modulus (all-in or all-out) loudly
    assert(sampleVocab > vocabN / 48 && sampleVocab < vocabN / 5,
      s"$sampleVocab of $vocabN distinct bigrams sampled")
    // membership is by VALUE, so a sampled bigram's count is its exact
    // corpus count: recount the sample's top row against the full table
    val top = sampled.orderBy(col("n").desc, col("bg")).limit(1).head()
    val full = bg.where(col("bg") === top.getString(0)).count()
    assert(top.getLong(1) == full, "sampled count must be the exact corpus count")
  }

  test("md5 and xx arms gate the same sketch contract (both quorums pass)") {
    val md = CurationOps.e54CmsHeavyHitters(spark, sf)
      .select("gate_ok").distinct().collect().map(_.getBoolean(0)).toSeq
    val xx = CurationOps.e54xCmsXxGate(spark, sf)
      .select("gate_ok").head().getBoolean(0)
    assert(md == Seq(true) && xx, "both hash families must satisfy the CMS bound quorum")
  }
}
