package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.SlidingChunks
import graft.ops.CurationOps

/** E41b — the native-Generator twin of e41 (SURVEY §2.11's
  * table-valued escape hatch). Three claims, each load-bearing:
  * the declared output is BIT-identical to e41's HOF build (so the
  * shared oracle states one semantics), the physical plan is a
  * GenerateExec driving [[SlidingChunks]] INSIDE whole-stage codegen
  * (the point of a CollectionGenerator), and both execution paths —
  * generated and interpreted — produce the same rows (the eval path
  * is what a codegen fallback would run, and an untested fallback is
  * a silent divergence waiting for a config flip). */
class ChunkGeneratorSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  private val sf = SparkTestSession.sf

  test("e41b: bit-identical to the e41 HOF build") {
    val hof = CurationOps.e41ChunkOverlap(spark, sf).collect().map(_.toSeq).toSeq
    val gen = CurationOps.e41bChunkGenerator(spark, sf).collect().map(_.toSeq).toSeq
    assert(gen.nonEmpty && gen == hof,
      "generator and HOF chunker must agree row-for-row, fingerprints included")
  }

  test("e41b plan: GenerateExec drives SlidingChunks inside whole-stage codegen") {
    val df = CurationOps.e41bChunkGenerator(spark, sf)
    df.collect() // finalize the AQE plan — codegen stages exist only after
    val exec = df.queryExecution.executedPlan
    val gens = PlanWalk.allNodes(exec).collect {
      case g: org.apache.spark.sql.execution.GenerateExec => g
    }
    assert(gens.nonEmpty, "expected a GenerateExec node")
    assert(gens.forall(_.generator.isInstanceOf[SlidingChunks]),
      s"the generator must be the native UDTF, got ${gens.map(_.generator.getClass)}")
    // codegen'd operators render with a WholeStageCodegen stage id
    // prefix; the Generate line carrying one proves the collection
    // protocol engaged (a CodegenFallback generator would print bare)
    val line = exec.toString.linesIterator
      .find(_.contains("Generate sliding_chunks")).getOrElse("")
    assert(line.contains("*("),
      s"Generate must sit inside a WholeStageCodegen stage, got: $line")
  }

  test("interpreted eval path agrees with codegen (fallback safety)") {
    val key = "spark.sql.codegen.wholeStage"
    val before = spark.conf.get(key)
    val withCodegen = CurationOps.e41bChunkGenerator(spark, sf)
      .collect().map(_.toSeq).toSeq
    try {
      spark.conf.set(key, "false")
      val interpreted = CurationOps.e41bChunkGenerator(spark, sf)
        .collect().map(_.toSeq).toSeq
      assert(interpreted == withCodegen)
    } finally spark.conf.set(key, before)
  }

  test("chunk arithmetic and fingerprints on a hand-built array") {
    import spark.implicits._
    // 7 tokens, width 4, stride 3 → chunks [0,4) [3,4) wait: n=7 →
    // nChunks = ⌊(3+2)/3⌋+1 = 2; c0 = tokens 0-3, c1 = tokens 3-6
    val df = Seq(Seq("a", "bb", "ccc", "d", "e", "f", "g")).toDF("w")
      .select(SlidingChunks.chunks(col("w"), 4, 3))
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getInt(2), r.getLong(3)))
    def fp(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
    }
    assert(df.toSeq == Seq(
      (0, 0, 4, fp("a bb ccc d")),
      (1, 3, 4, fp("d e f g"))))
    // and the md5-prefix convention matches Spark's own conv/substring
    val sparkFp = spark.sql(
      "SELECT CAST(conv(substring(md5('a bb ccc d'), 1, 8), 16, 10) AS BIGINT)")
      .head().getLong(0)
    assert(sparkFp == fp("a bb ccc d"),
      "generator fingerprint must equal the conv(substring(md5)) idiom")
  }

  test("null tokens hash as array_join does: skipped with their separator") {
    // the e41 semantics the generator pins bit-equality to is
    // md5(array_join(slice, ' ')), and array_join SKIPS null elements
    // and their separator — a containsNull=true token array (Spark's
    // `split` schema default) must fingerprint identically (r10 advice:
    // the old build emitted the 0x20 separator even for null tokens)
    import spark.implicits._
    val rows = Seq(Seq[String]("a", null, "b", "c", null))
      .toDF("w")
      .select(SlidingChunks.chunks(col("w"), 4, 3))
      .collect().map(r => (r.getInt(0), r.getLong(3)))
    val oracle = spark.sql(
      """SELECT CAST(conv(substring(md5(array_join(slice(array('a', NULL, 'b', 'c', NULL), 1, 4), ' ')), 1, 8), 16, 10) AS BIGINT) AS c0,
        |  CAST(conv(substring(md5(array_join(slice(array('a', NULL, 'b', 'c', NULL), 4, 4), ' ')), 1, 8), 16, 10) AS BIGINT) AS c1
        |""".stripMargin).head()
    assert(rows.toSeq == Seq((0, oracle.getLong(0)), (1, oracle.getLong(1))),
      "null-carrying slices must fingerprint exactly as md5(array_join(...))")
  }
}
