package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops._

/** Pinned semantics on tiny literal data — the reference behaviors that
  * must survive any refactor (first-seen dedup, 1-based end-inclusive
  * slices, tagged-union exclusivity, defaults-on-missing). */
class RelationalSemanticsSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  private val sf = SparkTestSession.sf
  import spark.implicits._

  test("D1 first-seen dedup keeps the earliest row per key (web_scrpaer_2.py:262-263)") {
    import org.apache.spark.sql.expressions.Window
    val df = Seq((1, "a", 10), (2, "a", 20), (3, "b", 30), (4, "a", 40))
      .toDF("pos", "id", "v")
    val w = Window.partitionBy($"id").orderBy($"pos")
    val out = df.withColumn("rn", row_number().over(w)).where($"rn" === 1)
      .select("id", "pos").collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(out == Map("a" -> 1, "b" -> 3))
  }

  test("L2 slice is 1-based and end-inclusive (web_scrpaer_2.py:425-429)") {
    // reference: all_ids[start-1 : end] with start=3, end=5 → elements 3,4,5
    val ids = (1 to 10).toDF("id").orderBy("id")
    val out = ids.offset(2).limit(3).collect().map(_.getInt(0)).toSeq
    assert(out == Seq(3, 4, 5))
  }

  test("P5 tagged union: exactly one kind wins, v2 mass branch included") {
    val out = Relational.p5TaggedUnion(spark, sf)
    val kinds = out.select("amount_kind").distinct()
      .collect().map(_.getString(0)).toSet
    assert(kinds == Set("moles", "volume", "mass"))
    // units always pair with their kind (web_scrpaer_2.py:124-145)
    val mismatched = out.where(
      ($"amount_kind" === "moles" && $"amount_units" =!= "MOLE") ||
      ($"amount_kind" === "volume" && $"amount_units" =!= "LITER") ||
      ($"amount_kind" === "mass" && $"amount_units" =!= "GRAM"))
    assert(mismatched.count() == 0)
  }

  test("F5 explode_outer retains parents with no children") {
    val out = Relational.f5ExplodeOuter(spark, sf)
    val nOrders = Tables.orders(spark, sf).count()
    assert(out.select("o_orderkey").distinct().count() == nOrders)
    assert(out.where($"big_part".isNull).count() > 0)
  }

  test("A3 rollup grand total equals the sum of group counts") {
    val rows = Relational.a3RollupTotals(spark, sf).collect()
    val grand = rows.filter(r => r.getString(0) == "ALL" && r.getString(1) == "ALL")
    val flagTotals = rows.filter(r => r.getString(0) != "ALL" && r.getString(1) == "ALL")
    val leaves = rows.filter(r => r.getString(0) != "ALL" && r.getString(1) != "ALL")
    assert(grand.length == 1)
    assert(grand(0).getLong(2) == leaves.map(_.getLong(2)).sum)
    assert(grand(0).getLong(2) == flagTotals.map(_.getLong(2)).sum)
  }

  test("E1 dedup is idempotent: rerunning over keepers yields all-singleton groups") {
    val first = TextOps.e1TextDedup(spark, sf)
    assert(first.where($"n_copies" =!= 1).count() == 0 ||
      first.count() < Tables.documents(spark, sf).count())
    // second pass over the deduped set: every hash occurs exactly once
    val keepers = first.select($"keeper_id".as("doc_id"))
    val docs = Tables.documents(spark, sf).join(keepers, "doc_id")
    val second = docs
      .select(sha2(lower(trim(regexp_replace($"text", "\\s+", " "))), 256).as("h"))
      .groupBy("h").count()
    assert(second.where($"count" =!= 1).count() == 0)
  }

  test("E2 top-k ranks are dense 1..k per query and cosines are within [-1, 1]") {
    val out = SimOps.e2CosineTopk(spark, sf).collect()
    val byQ = out.groupBy(_.getLong(0))
    byQ.foreach { case (_, rows) =>
      assert(rows.map(_.getInt(1)).toSeq.sorted == (1 to rows.length))
      // ranks ordered by non-increasing cosine
      val cos = rows.sortBy(_.getInt(1)).map(_.getDouble(3))
      assert(cos.zip(cos.tail).forall { case (a, b) => a >= b })
      assert(cos.forall(c => c >= -1.0001 && c <= 1.0001))
    }
  }

  test("E12 brute-force top-1 agrees with IVF e2 when the bucket holds the true NN") {
    // for queries where e12's global best shares the query's label, e2
    // must find the same neighbor at rank 1
    val brute = SimOps.e12AnnBrute(spark, sf).where($"rank" === 1)
      .select($"q_id", $"cand_id".as("brute_cand"))
    val ivf = SimOps.e2CosineTopk(spark, sf).where($"rank" === 1)
      .select($"q_id", $"cand_id".as("ivf_cand"))
    val emb = Tables.embeddings(spark, sf).select($"vec_id", $"label")
    val joined = brute.join(ivf, "q_id")
      .join(emb.withColumnRenamed("vec_id", "q_id").withColumnRenamed("label", "q_label"), "q_id")
      .join(emb.withColumnRenamed("vec_id", "brute_cand").withColumnRenamed("label", "b_label"), "brute_cand")
    val sameBucket = joined.where($"q_label" === $"b_label")
    assert(sameBucket.where($"brute_cand" =!= $"ivf_cand").count() == 0)
  }

  test("S5 validated read reports its rejection metric via observe()") {
    val df = ops.SourceSink.s5ValidatedRead(spark, sf)
    df.collect()
    val metrics = df.queryExecution.observedMetrics
    assert(metrics.contains("s5_validation"))
    // the synthetic events table has no invalid rows - the metric must
    // exist and report zero, proving the validation rides the same scan
    assert(metrics("s5_validation").getAs[Long]("n_rejected") == 0L)
  }

  test("S6 sink round-trips through from_json") {
    import org.apache.spark.sql.types._
    val out = SourceSink.s6JsonSink(spark, sf)
    val schema = StructType(Seq(
      StructField("order_id", LongType), StructField("status", StringType),
      StructField("items", ArrayType(StructType(Seq(
        StructField("l_linenumber", IntegerType),
        StructField("l_partkey", LongType),
        StructField("l_quantity", DoubleType)))))))
    val back = out.withColumn("p", from_json($"doc", schema))
    assert(back.where($"p".isNull).count() == 0)
    assert(back.where($"p.order_id" =!= $"o_orderkey").count() == 0)
  }

  test("M1 multimodal stub decode is deterministic and batch-shaped") {
    val a = TextOps.m1MultimodalMeta(spark, sf).collect()
    val b = TextOps.m1MultimodalMeta(spark, sf).collect()
    assert(a.sameElements(b))
    assert(a.forall(r => r.getInt(3) >= 32 && r.getInt(5) >= 1))
  }
}
