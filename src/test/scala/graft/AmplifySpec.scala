package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** The scale-amplification generator's copy-disjointness contract: the
  * similarity decade benchmarks are only meaningful if candidate volume
  * grows exactly linearly, which requires that no n-gram posting ever
  * spans two copies — including when an amplified directory is
  * amplified AGAIN (the r6 bug: a bare "x<c>" suffix made copy 1's
  * suffixed originals collide with the verbatim copy-0 tokens of the
  * input's own sub-copy 1, inflating sf10a pair volume to 11.9× per
  * 10× data). */
class AmplifySpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark

  test("re-amplified documents keep copies bigram-disjoint") {
    val t1 = Files.createTempDirectory("graft-amp1").toString
    val t2 = Files.createTempDirectory("graft-amp2").toString
    Amplify.run(spark, "/root/testdata/sf0.001", t1, 3, only = Set("documents"))
    Amplify.run(spark, t1, t2, 3, only = Set("documents"))
    val base = spark.read.parquet(s"$t1/documents.parquet")
    val off = base.agg(max(col("doc_id"))).head().getLong(0) + 1
    val docs = spark.read.parquet(s"$t2/documents.parquet")
    // a (source, bigram) posting reaching across two copies of the
    // SECOND amplification means suffixing collided somewhere
    val spanning = docs
      .withColumn("toks",
        filter(split(lower(col("text")), "\\s+"), t => length(t) > 0))
      .select(col("source"), (col("doc_id") / off).cast("int").as("copy"),
        explode(when(size(col("toks")) >= 2,
          array_distinct(transform(sequence(lit(0), size(col("toks")) - 2),
            i => concat_ws(" ", element_at(col("toks"), i + 1),
              element_at(col("toks"), i + 2)))))
          .otherwise(array().cast("array<string>"))).as("bg"))
      .distinct()
      .groupBy("source", "bg")
      .agg(countDistinct(col("copy")).as("n_copies"))
      .where(col("n_copies") > 1)
    assert(spanning.count() == 0,
      "a bigram posting spans copies — the token suffix collided, " +
        "candidate volume is no longer linear in the copy count")
  }
}
