package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.GraftFunctions

/** The native CosineSimilarity expression: numeric parity with the
  * built-in HOF formulation, codegen/interpreted agreement, null
  * contract, and SQL registration via the extensions hook. */
class CosineExpressionSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  private val sf = SparkTestSession.sf
  import spark.implicits._

  test("bit-identical to the aggregate/zip_with built-in formulation") {
    val e = Tables.embeddings(spark, sf)
      .select($"vec_id", $"embedding".cast("array<double>").as("v"))
    val pairs = e.limit(50).crossJoin(
      e.limit(50).select($"vec_id".as("w_id"), $"v".as("w")))
    val hof = pairs.select($"vec_id", $"w_id",
      (aggregate(zip_with($"v", $"w", (x, y) => x * y), lit(0.0), (a, x) => a + x) /
        (sqrt(aggregate($"v", lit(0.0), (a, x) => a + x * x)) *
         sqrt(aggregate($"w", lit(0.0), (a, x) => a + x * x)))).as("c"))
    val native = pairs.select($"vec_id", $"w_id",
      GraftFunctions.cosine($"v", $"w").as("c"))
    // exceptAll on raw doubles: passes only if bit-identical
    assert(native.exceptAll(hof).count() == 0)
    assert(hof.exceptAll(native).count() == 0)
  }

  test("interpreted eval agrees with codegen") {
    val expr = graft.functions.CosineSimilarity(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Array(1.0, 2.0, 3.0),
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.DoubleType)),
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Array(3.0, 2.0, 1.0),
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.DoubleType)))
    val interpreted = expr.eval(null).asInstanceOf[Double]
    val viaPlan = Seq((Array(1.0, 2.0, 3.0), Array(3.0, 2.0, 1.0))).toDF("a", "b")
      .select(GraftFunctions.cosine($"a", $"b")).collect()(0).getDouble(0)
    assert(interpreted == viaPlan)
    assert(math.abs(interpreted - 10.0 / 14.0) < 1e-15)
  }

  test("null contract: null input, length mismatch, zero norm") {
    val df = Seq(
      (1, Option(Array(1.0, 2.0)), Option(Array(1.0, 2.0))),
      (2, None, Option(Array(1.0, 2.0))),
      (3, Option(Array(1.0, 2.0)), Option(Array(1.0, 2.0, 3.0))),
      (4, Option(Array(0.0, 0.0)), Option(Array(1.0, 2.0))))
      .toDF("id", "a", "b")
    val out = df.select($"id", GraftFunctions.cosine($"a", $"b").as("c"))
      .collect().map(r => r.getInt(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(out(1).exists(c => math.abs(c - 1.0) < 1e-15))
    assert(out(2).isEmpty && out(3).isEmpty && out(4).isEmpty)
  }

  test("null array ELEMENTS read as 0.0 — identically in codegen and interpreted") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.sql.types.{ArrayType, DoubleType}
    // codegen path (projection over a plan)
    val viaPlan = spark.sql("SELECT array(3.0d, CAST(NULL AS DOUBLE)) AS a, array(4.0d, 5.0d) AS b")
      .select(GraftFunctions.cosine($"a", $"b").as("c")).collect()(0).getDouble(0)
    // interpreted path (direct eval)
    val expr = graft.functions.CosineSimilarity(
      Literal(new GenericArrayData(Array[Any](3.0, null)), ArrayType(DoubleType, true)),
      Literal(new GenericArrayData(Array[Any](4.0, 5.0)), ArrayType(DoubleType, true)))
    val interpreted = expr.eval(null).asInstanceOf[Double]
    // null element ⇒ 0.0: dot=12, |a|=3, |b|=sqrt(41)
    val expected = 12.0 / (3.0 * math.sqrt(41.0))
    assert(viaPlan == interpreted)
    assert(math.abs(viaPlan - expected) < 1e-15)
  }

  test("graft_cosine wrong arity fails analysis cleanly, not with IndexOutOfBounds") {
    GraftFunctions.register(spark)
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT graft_cosine(array(1.0d))").collect()
    }
    assert(e.getMessage.contains("graft_cosine"))
  }

  test("SQL registration: graft_cosine callable after register()") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT graft_cosine(array(1.0d, 0.0d), array(0.0d, 1.0d)) AS c," +
        " graft_cosine(array(2.0d, 0.0d), array(1.0d, 0.0d)) AS d")
      .collect()(0)
    assert(r.getDouble(0) == 0.0 && r.getDouble(1) == 1.0)
  }

  test("float embeddings implicitly cast to double arrays") {
    val out = Tables.embeddings(spark, sf).limit(3)
      .select(GraftFunctions.cosine(
        $"embedding".cast("array<double>"), $"embedding".cast("array<double>")).as("self"))
      .collect().map(_.getDouble(0))
    assert(out.forall(c => math.abs(c - 1.0) < 1e-12))
  }
}
