package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table loaders for the driver test tables (TESTDATA.md).
  *
  * All query entry points take the scale-factor directory at call time so
  * the same plan runs at sf0.001 (smoke), sf0.01 (DuckDB oracle) and sf0.1
  * (bench) — and, on a real cluster, at any path. Reads are plain
  * `spark.read.parquet` so Catalyst handles column pruning + filter
  * pushdown; nothing is cached or collected here.
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(s: SparkSession, d: String): DataFrame  = table(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame    = table(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame  = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = table(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame    = table(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame    = table(s, d, "region")
  /** The events parquet stores TIMESTAMP(NANOS), which Spark 4 rejects by
    * default; read it as nanos-since-epoch longs and convert to a proper
    * TimestampType (µs). The data is µs-precision, so truncation is
    * lossless. */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    table(s, d, "events")
      .withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
