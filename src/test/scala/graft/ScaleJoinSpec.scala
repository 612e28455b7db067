package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.plans.ScaleJoins

/** Bucketing and salting: semantic equivalence + plan-shape proof. */
class ScaleJoinSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  private val sf = SparkTestSession.sf
  import spark.implicits._

  test("salted join returns exactly the plain join's rows") {
    val big = Tables.lineitem(spark, sf)
      .select($"l_orderkey".as("k"), $"l_partkey", $"l_quantity")
    val dim = Tables.orders(spark, sf)
      .select($"o_orderkey".as("k"), $"o_orderstatus")
    val plain = big.join(dim, "k")
    val salted = ScaleJoins.saltedJoin(big, dim, "k", saltBuckets = 4)
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).count() == 0)
    assert(plain.exceptAll(salted).count() == 0)
  }

  test("salted join splits a hot key across salt buckets") {
    // hot rows vary in their payload column, so the deterministic
    // hash-of-row salt spreads them; fully identical rows would share a
    // salt (pure-duplicate skew needs a different remedy)
    val hot = (1 to 1000).map(i => ("hot", i)).toDF("k", "v")
      .union(Seq(("cold", 0)).toDF("k", "v"))
    val dim = Seq(("hot", "H"), ("cold", "C")).toDF("k", "name")
    val salted = hot.withColumn("_salt",
      pmod(hash($"k", $"v"), lit(4)))
    val nSalts = salted.where($"k" === "hot").select("_salt").distinct().count()
    assert(nSalts == 4, "hot rows must land in every salt bucket")
    val out = ScaleJoins.saltedJoin(hot, dim, "k", 4)
    assert(out.count() == 1001)
  }

  test("bucketed join plans with zero Exchange (co-located)") {
    val df = ScaleJoins.bucketedJoinDemo(spark, sf)
    df.collect() // finalize AQE
    val p = df.queryExecution.executedPlan.toString
    val joinSection = p.linesIterator.takeWhile(!_.contains("TakeOrdered")).mkString("\n")
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"))
    // the join inputs come straight from bucketed scans - no shuffle
    // below the join (the final orderBy exchange is above the agg)
    val beforeAgg = p.substring(p.indexOf("Join"))
    assert(!beforeAgg.contains("Exchange hashpartitioning"),
      s"bucketed join must not re-shuffle its inputs:\n$p")
    // and it matches the plain-join answer
    val plain = Tables.orders(spark, sf)
      .join(Tables.lineitem(spark, sf), $"o_orderkey" === $"l_orderkey")
      .groupBy($"o_orderkey")
      .agg(count(lit(1)).as("n_items"), round(sum($"l_quantity")).cast("long").as("qty"))
    assert(df.exceptAll(plain).count() == 0)
  }
}
