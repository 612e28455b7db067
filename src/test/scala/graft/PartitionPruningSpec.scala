package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.PartitionedLayout

/** Directory-level partition pruning over the Hive-style layout. */
class PartitionPruningSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  private val sf = SparkTestSession.sf
  import spark.implicits._

  test("scan carries PartitionFilters on the partition column") {
    val df = PartitionedLayout.prunedScan(spark, sf)
    val p = df.queryExecution.executedPlan.toString
    val scanLine = p.linesIterator.find(_.contains("PartitionFilters")).getOrElse("")
    assert(scanLine.contains("o_orderstatus"),
      s"partition predicate must prune directories, not filter rows: $scanLine")
    // the pruned-out partitions never produce rows
    assert(df.select("o_orderstatus").distinct().collect().map(_.getString(0)).toSeq == Seq("F"))
  }

  test("pruned scan equals the flat-table filter") {
    val flat = Tables.orders(spark, sf)
      .where($"o_orderstatus" === "F")
      .select($"o_orderkey", $"o_custkey", $"o_orderstatus")
    val pruned = PartitionedLayout.prunedScan(spark, sf)
    assert(pruned.exceptAll(flat).count() == 0)
    assert(flat.exceptAll(pruned).count() == 0)
  }
}
