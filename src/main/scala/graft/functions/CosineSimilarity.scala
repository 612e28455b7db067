package graft.functions

import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expression: cosine similarity of two double arrays in
  * ONE fused pass (dot product and both norms accumulate in the same
  * loop), with full whole-stage-codegen support via `doGenCode`.
  *
  * This is SURVEY.md §7.4's designated escape hatch for the E2/E12 hot
  * path: the equivalent built-in formulation
  * (`aggregate(zip_with(a,b,*), ...)`) allocates an intermediate array
  * per row and evaluates interpreted (higher-order functions never enter
  * codegen). The fused loop is allocation-free and JIT-compiled.
  *
  * Numeric contract (hash-match with the DuckDB oracle): accumulation is
  * strictly left-to-right over the same doubles as
  * `list_dot_product(a,b) / (sqrt(list_dot_product(a,a)) *
  * sqrt(list_dot_product(b,b)))`, so results are bit-identical, not just
  * close. Returns NULL on null input, length mismatch, or a zero-norm
  * side. Null array ELEMENTS are treated as 0.0 — checked explicitly
  * (isNullAt) in both the interpreted and codegen paths, so arbitrary
  * `array<double>` input (not just the non-nullable embeddings schema)
  * behaves identically in both modes.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_cosine expects array<double> inputs, got " +
        s"${left.dataType.simpleString} / ${right.dataType.simpleString}")
  }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_cosine"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val y = b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val xi = if (x.isNullAt(i)) 0.0 else x.getDouble(i)
      val yi = if (y.isNullAt(i)) 0.0 else y.getDouble(i)
      dot += xi * yi; na += xi * xi; nb += yi * yi
      i += 1
    }
    val denom = math.sqrt(na) * math.sqrt(nb)
    if (denom == 0.0) null else dot / denom
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      val denom = ctx.freshName("denom")
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    final double $x = $a.isNullAt($i) ? 0.0 : $a.getDouble($i);
         |    final double $y = $b.isNullAt($i) ? 0.0 : $b.getDouble($i);
         |    $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
         |  }
         |  final double $denom = java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb);
         |  if ($denom == 0.0) {
         |    ${ev.isNull} = true;
         |  } else {
         |    ${ev.value} = $dot / $denom;
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)
}

/** Column-API and SQL-registration entry points for graft's native
  * expressions. */
object GraftFunctions {

  /** Column form — usable on any session, no registration needed. */
  def cosine(a: Column, b: Column): Column =
    Bridge.column(CosineSimilarity(Bridge.expression(a), Bridge.expression(b)))

  /** SparkSessionExtensions hook: enable with
    * `.config("spark.sql.extensions", "graft.functions.GraftExtensions")`
    * to call `graft_cosine(a, b)` from SQL. */
  val cosineDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_cosine"),
    new ExpressionInfo(classOf[CosineSimilarity].getName, "graft_cosine"),
    (args: Seq[Expression]) => {
      // clean analysis-time arity error instead of an IndexOutOfBounds
      if (args.length != 2)
        throw new org.apache.spark.sql.AnalysisException(
          errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
          messageParameters = Map(
            "functionName" -> "graft_cosine",
            "expectedNum" -> "2",
            "actualNum" -> args.length.toString,
            "docroot" -> "https://spark.apache.org/docs/latest"))
      CosineSimilarity(args(0), args(1))
    })

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      cosineDescriptor._1.funcName, cosineDescriptor._3, "scala_udf")
}

/** Injectable extensions class (`spark.sql.extensions`): the SQL
  * function(s) plus the TopKPerKey planner strategy. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftFunctions.cosineDescriptor)
    ext.injectPlannerStrategy(_ => graft.plans.TopKStrategy)
  }
}
