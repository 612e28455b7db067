package graft.sources
import org.apache.spark.sql.SparkSession
/** One-shot BUILD-cost measurement for the serve layout (SCALE.md's
  * build-vs-serve economics rows): deletes the staged dir and times a
  * cold `ensure` — the number a capacity planner amortizes against
  * the per-probe saving. Not part of the declared key surface. */
object IvfBuildProbe {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/tmp/sfx10")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.streaming.DocStreams.deleteTree(
      java.nio.file.Paths.get(IvfServe.serveDir(d)))
    val t0 = System.nanoTime()
    IvfServe.ensure(spark, d)
    println(f"[ivfbuild] $d build: ${(System.nanoTime()-t0)/1e9}%.2f s")
    spark.stop()
  }
}
