package graft

import org.apache.spark.sql.SparkSession

/** Build-vs-serve economics for the persisted inverted text index
  * (the ServeColdBench pattern, on the lexical layout): times the
  * one-shot `ensure` build from a clean slate, then `probes` repeats
  * of the declared e35s probe, and prints one JSON line. Usage:
  *
  *   sbt "runMain graft.LexBuildBench <sfDir> [probes]"
  *
  * The build number is what a production deployment pays ONCE per
  * corpus version; the probe number is what every query pays — the
  * same amortization table the e2v serve build carries in SCALE.md. */
object LexBuildBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val probes = args.lift(1).map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.parquet.pushdown.inFilterThreshold",
        graft.sources.IvfServe.InFilterThresholdPin.toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val root = java.nio.file.Paths.get(graft.sources.LexIndex.serveDir(sfDir))
    graft.streaming.DocStreams.deleteTree(root)
    def timed[A](f: => A): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    val build = timed(graft.sources.LexIndex.ensure(spark, sfDir))
    val probeSecs = (1 to probes).map { _ =>
      timed(graft.sources.LexIndex.e35sBm25Serve(spark, sfDir)
        .write.format("noop").mode("overwrite").save())
    }
    val recompute = (1 to probes).map { _ =>
      timed(graft.ops.CurationOps.e35Bm25Topk(spark, sfDir)
        .write.format("noop").mode("overwrite").save())
    }
    // the positional and rewrite probes ride the same layout — their
    // per-decade cost sits in the same amortization table
    val phrase = (1 to probes).map { _ =>
      timed(graft.sources.LexIndex.e35pPhraseQuery(spark, sfDir)
        .write.format("noop").mode("overwrite").save())
    }
    val prefix = (1 to probes).map { _ =>
      timed(graft.sources.LexIndex.e35wPrefixQuery(spark, sfDir)
        .write.format("noop").mode("overwrite").save())
    }
    def fmt(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    // postings footprint on disk — the storage the build buys
    val (bytes, files) = {
      var b = 0L; var n = 0L
      val st = java.nio.file.Files.walk(root)
      try st.forEach { p =>
        if (java.nio.file.Files.isRegularFile(p)) {
          b += java.nio.file.Files.size(p); n += 1
        }
      } finally st.close()
      (b, n)
    }
    println(s"""{"bench":"lex_build","sf":"$sfDir","build_sec":${fmt(build)},""" +
      s""""probe_sec":[${probeSecs.map(fmt).mkString(",")}],""" +
      s""""e35_recompute_sec":[${recompute.map(fmt).mkString(",")}],""" +
      s""""phrase_sec":[${phrase.map(fmt).mkString(",")}],""" +
      s""""prefix_sec":[${prefix.map(fmt).mkString(",")}],""" +
      s""""index_mb":${bytes / 1048576},"index_files":$files}""")
    spark.stop()
  }
}
