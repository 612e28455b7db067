package graft

import org.apache.spark.sql.SparkSession

/** One shared local SparkSession for the whole suite. */
object SparkTestSession {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // e2pq refine-fetch In-list pushdown — IvfServe.InFilterThresholdPin
      .config("spark.sql.parquet.pushdown.inFilterThreshold",
        graft.sources.IvfServe.InFilterThresholdPin.toString)
      // force Spark's external sorters onto their real spill path once a
      // task holds >16k rows (core conf, fixed at context creation) — lets
      // TopKOperatorSpec prove the sort-based final survives actual
      // spilling; suite tasks are small enough that other specs rarely
      // cross it, and a forced spill is correctness-neutral by contract
      .config("spark.shuffle.spill.numElementsForceSpillThreshold", "16384")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
  val sf: String = "/root/testdata/sf0.001"
}
