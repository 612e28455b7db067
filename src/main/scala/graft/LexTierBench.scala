package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures the e35t claim: probe cost GROWS WITH SEGMENT COUNT (every
  * segment pays its own listing, term filter, and df merge), and one
  * tier merge caps it. Folds N single-batch segments (the arrival docs
  * re-keyed per segment so content scales with N), times the probe at
  * N segments, tier-merges, times the probe at 1 — the
  * cost-vs-segment-count curve SCALE.md reports.
  *
  * Usage: SPARK_GRAFT_SF_DIR=... SPARK_GRAFT_TIER_SEGS=16 \
  *   sbt "runMain graft.LexTierBench"
  */
object LexTierBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val nSegs = sys.env.get("SPARK_GRAFT_TIER_SEGS").map(_.toInt).getOrElse(16)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.parquet.pushdown.inFilterThreshold",
        graft.sources.IvfServe.InFilterThresholdPin.toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.streaming.{DocStreams, LexStreams}
    LexStreams.ensureFoldBase(spark, sfDir)
    val work = java.nio.file.Files.createTempDirectory("lex-tier-bench")
    def timed(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    try {
      val arrivals = Tables.documents(spark, sfDir)
        .where(col("doc_id") < LexStreams.ArrivalDocBound)
      (0 until nSegs).foreach { i =>
        LexStreams.foldBatch(
          arrivals.withColumn("doc_id", col("doc_id") + lit(1000000L * (i + 1))),
          i.toLong, work)
      }
      def probeOnce(): Unit =
        LexStreams.probe(spark, sfDir, work)
          .write.format("noop").mode("overwrite").save()
      probeOnce() // warm
      val manyCold = timed(probeOnce())
      val many = timed(probeOnce())
      val mergeSecs = timed {
        graft.streaming.EventStreams.tierMerge(spark, work.resolve("segs"))
        graft.streaming.EventStreams.tierMerge(spark, work.resolve("lens"))
      }
      probeOnce() // warm post-merge
      val one = timed(probeOnce())
      println(s"""{"metric":"lex_tier","sf":"$sfDir","n_segments":$nSegs,""" +
        s""""probe_secs_${nSegs}segs":${f"$many%.3f"},""" +
        s""""probe_secs_${nSegs}segs_cold":${f"$manyCold%.3f"},""" +
        s""""tier_merge_secs":${f"$mergeSecs%.3f"},""" +
        s""""probe_secs_1seg":${f"$one%.3f"}}""")
    } finally {
      DocStreams.deleteTree(work)
      spark.stop()
    }
  }
}
