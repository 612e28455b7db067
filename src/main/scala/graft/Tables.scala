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
  /** The events fixture has shipped `ts` three ways across driver
    * generations: TIMESTAMP(NANOS) (Spark 4 rejects it unless read as
    * nanos-since-epoch longs via `nanosAsLong`), BIGINT nanos (our
    * amplified copies), and plain µs TIMESTAMP / TIMESTAMP_NTZ. All
    * queries see one canonical TimestampType (µs); the session timezone
    * is pinned to UTC everywhere, so the NTZ→TZ cast is value-preserving. */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeEventTs(table(s, d, "events"))
  }

  /** Rewrite `ts` to TimestampType (µs) whatever the stored type was.
    * Long = nanos-since-epoch (µs-precision data, so the truncation is
    * lossless); NTZ casts 1:1 under the UTC session timezone. */
  def normalizeEventTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType}
    df.schema("ts").dataType match {
      case LongType         => df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case TimestampNTZType => df.withColumn("ts", col("ts").cast("timestamp"))
      case _                => df
    }
  }

  /** Schema the events parquet at `path` actually carries, with
    * `nanosAsLong` pre-set so a TIMESTAMP(NANOS) column surfaces as
    * LongType — the schema a file-source stream must declare. */
  def eventsRawSchema(s: SparkSession, path: String): org.apache.spark.sql.types.StructType = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    s.read.parquet(path).schema
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")

  /** Hash-spread `df` by `key` ONLY when the scan yields too few splits
    * to feed the session's parallelism. A local few-file fixture
    * arrives as one input split, which would serialize the heavy
    * per-row stages that follow (shingling, 50× explode fan-outs) —
    * but at real scale the parquet scan already carries thousands of
    * splits and the same exchange would ship the whole table for
    * nothing before any reduction. Gating on the scan's actual
    * effective-split count keeps the local fixtures wide AND keeps the
    * 100 TB plan exchange-free; reading footers runs no Spark job.
    *
    * Two traps shaped this gate, both measured at sfx10 (500 k docs in
    * one 78 MB single-row-group file):
    *
    *  1. PLANNED splits lie. Spark's bytesPerCore sizing cuts that file
    *     into ~20 byte-range splits — more than the target, so a
    *     `getNumPartitions` gate stands down — but a parquet split only
    *     yields the row groups whose MIDPOINT it contains, so 19 splits
    *     are empty and every row lands in one task (e44 ran 250 s on
    *     one core). The unit of parquet scan parallelism is the ROW
    *     GROUP, so the gate counts row groups from file footers
    *     (`df.inputFiles` + a footer read per file, capped: it stops as
    *     soon as the target is met, and skips footers entirely when the
    *     file count alone clears it — a production corpus with
    *     thousands of files never reads one).
    *  2. AQE un-spreads a bare `repartition(key)`. The spread exists
    *     precisely when shuffle BYTES are tiny but downstream per-row
    *     CPU is huge (HOF tokenization, shingle fan-outs), which is the
    *     regime where AQE's byte-count heuristic coalesces the exchange
    *     right back to ~1 partition. An explicit numPartitions is a
    *     user-pinned width AQE respects. */
  def spreadIfNarrow(df: DataFrame, key: org.apache.spark.sql.Column): DataFrame = {
    val sc = df.sparkSession.sparkContext
    val target = math.max(2, sc.defaultParallelism / 2)
    if (effectiveSplits(df, target) >= target) df
    else df.repartition(sc.defaultParallelism, key)
  }

  /** Number of independently-scannable parquet row groups feeding `df`,
    * counted only far enough to decide against `target`. Non-parquet
    * inputs (memory relations, streaming sources) fall back to the
    * planned partition count. */
  private def effectiveSplits(df: DataFrame, target: Int): Int = {
    val files = try df.inputFiles catch { case _: Throwable => Array.empty[String] }
    if (files.isEmpty) return df.rdd.getNumPartitions
    if (files.length >= target) return files.length
    val conf = df.sparkSession.sessionState.newHadoopConf()
    var groups = 0
    val it = files.iterator
    while (groups < target && it.hasNext) {
      val f = it.next()
      groups += (try {
        val in = org.apache.parquet.hadoop.util.HadoopInputFile
          .fromPath(new org.apache.hadoop.fs.Path(f), conf)
        val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
        try r.getRowGroups.size finally r.close()
      } catch { case _: Throwable => 1 }) // unreadable footer: count the file
    }
    groups
  }
}
