package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every SparkEntry query against
  * SPARK_GRAFT_SF_DIR and prints one JSON line of per-query seconds.
  *
  * Materialization is a `noop`-format write — every row and column is
  * fully computed and serialized by the executors (unlike `.count()`,
  * which lets Catalyst prune all columns and skip projection work), with
  * zero sink I/O cost, so the number measures the query itself.
  *
  * Measurement protocol (r4 verdict: the official artifact diverged up
  * to 4x from a same-day snapshot on two queries):
  *
  *  - one warm pass (codegen/JIT/reader caches), then THREE measured
  *    passes, INTERLEAVED — pass k runs every query once in the same
  *    alphabetical order, so a transient machine-load spike lands on one
  *    repeat of many queries instead of all repeats of one query, and
  *    the reported per-query number is the median of its three repeats;
  *  - durable checkpoint I/O (e16's loop state) is redirected to tmpfs
  *    (/dev/shm) when available: r4's spread was worst on e16 and its
  *    alphabetical neighbor, consistent with checkpoint writes landing
  *    on the same disk the bench reads from;
  *  - the printed line carries the protocol (`passes`, `run_order`,
  *    `checkpoint_dir`) so a reader can see HOW the numbers were taken;
  *    per-repeat raw values land in the file artifact only (keeps the
  *    stdout line short enough to survive the driver's tail capture).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Pre-set the checkpoint dir so ClusterOps.ensureCheckpointDir keeps
    // it; GRAFT_CHECKPOINT_DIR still wins for explicit placement. Only a
    // dir the bench itself chose is cleaned up at exit — an explicit env
    // path may be shared with another process and is never deleted here.
    val explicitCkpt = sys.env.get("GRAFT_CHECKPOINT_DIR")
    val ckptDir: String = explicitCkpt.orElse {
      val shm = new java.io.File("/dev/shm")
      if (shm.isDirectory && shm.canWrite) Some("/dev/shm/graft-bench-ckpt")
      else None
    }.getOrElse("target/bench-checkpoints")
    spark.sparkContext.setCheckpointDir(ckptDir)
    def run(name: String, fn: (org.apache.spark.sql.SparkSession, String) =>
        org.apache.spark.sql.DataFrame): Double = {
      // Queries that persist() shared sub-relations (e6/e8/e16) register
      // them in the session cache by canonicalized plan, so a later run
      // of the same query would silently reuse the earlier run's cache
      // and report a time that excludes building it. Clear the cache so
      // every reported number pays its own materialization.
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      try {
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      } catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
        -1.0 // sentinel: a crashed query must not read as a fast one
      }
    }
    // SPARK_GRAFT_BENCH_ONLY=a,b,c restricts the run to named queries —
    // used for targeted scale runs (e.g. the sf10a per-row-bound tail)
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    // a typo'd name must not yield a partial run that still looks like a
    // valid artifact: warn per unknown name, fail fast when nothing's left
    only.foreach { req =>
      val unknown = req.diff(SparkEntry.queries.keySet)
      unknown.toSeq.sorted.foreach(n =>
        System.err.println(s"[bench] SPARK_GRAFT_BENCH_ONLY: unknown query '$n'"))
    }
    val ordered = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
    if (ordered.isEmpty)
      sys.error("SPARK_GRAFT_BENCH_ONLY matched no queries — nothing to bench")
    val names = ordered.map(_._1)
    ordered.foreach { case (name, fn) => run(name, fn) } // warm pass
    val passes = sys.env.get("SPARK_GRAFT_BENCH_PASSES")
      .flatMap(v => scala.util.Try(v.trim.toInt).toOption)
      .filter(_ >= 1).getOrElse(3)
    val repeats: Seq[Map[String, Double]] =
      (1 to passes).map { _ => ordered.map { case (n, f) => n -> run(n, f) }.toMap }
    def median(xs: Seq[Double]): Double = {
      val ok = xs.filter(_ >= 0).sorted
      if (ok.isEmpty) -1.0
      // true median for even counts too: with PASSES=2 the upper-middle
      // element alone would report the SLOWER repeat as the "median"
      else if (ok.size % 2 == 1) ok(ok.size / 2)
      else (ok(ok.size / 2 - 1) + ok(ok.size / 2)) / 2.0
    }
    val med = names.map(n => n -> median(repeats.map(_(n))))
    val total = med.map(_._2).filter(_ >= 0).sum
    // Locale.ROOT: a comma-decimal default locale must not break the JSON
    def fmt(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    val qs = med.map { case (k, v) => "\"" + k + "\":" + fmt(v) }
      .mkString("{", ",", "}")
    val passTotals = repeats
      .map(r => fmt(r.values.filter(_ >= 0).sum)).mkString("[", ",", "]")
    val proto = s""""passes":$passes,"pass_totals":$passTotals,""" +
      s""""run_order":"alphabetical-interleaved","warmup":1,""" +
      s""""checkpoint_dir":"$ckptDir""""
    val line =
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":$qs,"sf":"$sfDir",$proto}"""
    // Full artifact (adds per-repeat raw values) — beside the working
    // dir by default; a failed write must not fail a successful bench.
    val runsJson = names.map { n =>
      "\"" + n + "\":" + repeats.map(r => fmt(r(n))).mkString("[", ",", "]")
    }.mkString("{", ",", "}")
    val detail = line.dropRight(1) + s""","queries_runs":$runsJson}"""
    val out = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT",
      java.nio.file.Paths.get("BENCH_LAST.json").toAbsolutePath.toString)
    try java.nio.file.Files.write(java.nio.file.Paths.get(out),
      (detail + "\n").getBytes("UTF-8"))
    catch { case e: java.io.IOException =>
      System.err.println(s"[bench] artifact write to $out failed: ${e.getMessage}")
    }
    // bench-chosen tmpfs checkpoints are scratch — reclaim the memory.
    // Cleanup and stop are best-effort: a successful 3-pass run must
    // never lose its summary line (printed LAST so the driver's tail
    // capture keeps it) to a shutdown failure.
    if (explicitCkpt.isEmpty && ckptDir.startsWith("/dev/shm/")) {
      scala.util.Try {
        val p = new org.apache.hadoop.fs.Path(ckptDir)
        p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
      }
    }
    scala.util.Try(spark.stop())
    println(line)
  }
}
