package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expression: the MAXIMUM cosine similarity of a
  * double-array column against a FIXED, BOUNDED set of reference
  * vectors (an eval suite), in one fused allocation-free row loop with
  * full whole-stage-codegen support — the third member of the
  * [[CosineSimilarity]] family (SURVEY §2.11 escape hatch (b)).
  *
  * Why an expression and not a join: the equivalent dataflow —
  * `crossJoin(broadcast(bench)) → cosine per pair → groupBy(max)` —
  * MATERIALIZES N·B pair rows, and each one pays join-row copies and a
  * hash-aggregate probe that dwarf the 64-multiply cosine itself
  * (measured on e49 at sfx100: 224.6 s for 2M×1031 pairs, ~3.4 µs per
  * pair against a ~0.1 µs arithmetic cost). Folding the bench loop
  * INSIDE the row projection leaves a pure map-side scan: no pair
  * rows, no exchange, the bench arrays resident in cache. The bench
  * set must be bounded by declaration (it rides the plan; production
  * form is the same loop over a broadcast variable) — the e65
  * literal-codebook / e40 k-row-collect convention.
  *
  * Numeric contract (bit-parity with the pair-at-a-time form): per
  * candidate, dot and the query norm accumulate strictly left-to-right
  * exactly as [[CosineSimilarity]] does; reference norms are
  * precomputed once ([[CosineMaxBench.norms]]) with the same fold;
  * `dot / (sqrt(nv) * nb_j)` is the identical multiply-then-divide.
  * The running max compares RAW doubles; `round(max_j cos_j, 6) =
  * max_j round(cos_j, 6)` because decimal rounding is monotone, so a
  * caller that rounds the result matches the rounded-per-pair max
  * bit-for-bit (E49KernelSpec pins it on fixture vectors). Candidates
  * with zero norm or mismatched length contribute nothing (the fused
  * cosine's NULL); a zero-norm query or no contributing candidate
  * yields NULL. */
case class CosineMaxBench(
    child: Expression,
    bench: Array[Array[Double]],
    benchNorms: Array[Double]) extends UnaryExpression {
  require(bench.length == benchNorms.length,
    "cosine_max_bench: one precomputed norm per reference vector")
  require(bench.nonEmpty,
    "cosine_max_bench: empty reference set (the empty-bench relation " +
      "semantics belong to the join form)")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"cosine_max_bench expects array<double>, got ${t.simpleString}")
  }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "cosine_max_bench"

  /** Shared kernel — the interpreted path and the codegen'd Java below
    * must stay line-for-line equivalent. */
  def maxCosine(v: Array[Double]): Any = {
    var nv = 0.0
    var i = 0
    while (i < v.length) { nv += v(i) * v(i); i += 1 }
    val nq = math.sqrt(nv)
    if (nq == 0.0) return null
    var best = 0.0
    var found = false
    var j = 0
    while (j < bench.length) {
      val b = bench(j)
      if (b.length == v.length && benchNorms(j) != 0.0) {
        var dot = 0.0
        var k = 0
        while (k < v.length) { dot += v(k) * b(k); k += 1 }
        val c = dot / (nq * benchNorms(j))
        if (!found || c > best) { best = c; found = true }
      }
      j += 1
    }
    if (found) best else null
  }

  override def nullSafeEval(a: Any): Any = {
    val arr = a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val v = new Array[Double](arr.numElements())
    var i = 0
    while (i < v.length) {
      v(i) = if (arr.isNullAt(i)) 0.0 else arr.getDouble(i)
      i += 1
    }
    maxCosine(v)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val benchRef = ctx.addReferenceObj("bench", bench, "double[][]")
      val normsRef = ctx.addReferenceObj("benchNorms", benchNorms, "double[]")
      val v = ctx.freshName("v")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val k = ctx.freshName("k")
      val nq = ctx.freshName("nq")
      val dot = ctx.freshName("dot")
      val b = ctx.freshName("b")
      val c = ctx.freshName("c")
      val best = ctx.freshName("best")
      val found = ctx.freshName("found")
      s"""
         |final int $n = $a.numElements();
         |final double[] $v = new double[$n];
         |double $nq = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $v[$i] = $a.isNullAt($i) ? 0.0 : $a.getDouble($i);
         |  $nq += $v[$i] * $v[$i];
         |}
         |$nq = java.lang.Math.sqrt($nq);
         |double $best = 0.0;
         |boolean $found = false;
         |if ($nq != 0.0) {
         |  for (int $j = 0; $j < $benchRef.length; $j++) {
         |    final double[] $b = $benchRef[$j];
         |    if ($b.length == $n && $normsRef[$j] != 0.0) {
         |      double $dot = 0.0;
         |      for (int $k = 0; $k < $n; $k++) { $dot += $v[$k] * $b[$k]; }
         |      final double $c = $dot / ($nq * $normsRef[$j]);
         |      if (!$found || $c > $best) { $best = $c; $found = true; }
         |    }
         |  }
         |}
         |if ($found) { ${ev.value} = $best; } else { ${ev.isNull} = true; }
       """.stripMargin
    })

  // Case-class equality on Array fields is REFERENCE equality, so two
  // semantically identical kernels would never canonicalize equal and
  // subexpression elimination could not dedup them (r11 advice) —
  // compare the bench contents instead.
  override def equals(o: Any): Boolean = o match {
    case that: CosineMaxBench =>
      child == that.child &&
        java.util.Arrays.deepEquals(
          bench.asInstanceOf[Array[AnyRef]], that.bench.asInstanceOf[Array[AnyRef]]) &&
        java.util.Arrays.equals(benchNorms, that.benchNorms)
    case _ => false
  }
  override def hashCode(): Int =
    31 * (31 * child.hashCode() +
      java.util.Arrays.deepHashCode(bench.asInstanceOf[Array[AnyRef]])) +
      java.util.Arrays.hashCode(benchNorms)

  override protected def withNewChildInternal(newChild: Expression): CosineMaxBench =
    copy(child = newChild)
}

object CosineMaxBench {
  /** Reference norms with the exact [[CosineSimilarity]] accumulation
    * order (left-to-right Σx², one correctly-rounded sqrt) so the
    * factored `dot/(nq·nb)` is bit-identical to the fused kernel. */
  def norms(bench: Array[Array[Double]]): Array[Double] =
    bench.map { b =>
      var s = 0.0
      var i = 0
      while (i < b.length) { s += b(i) * b(i); i += 1 }
      math.sqrt(s)
    }

  /** Column form: max cosine of `v` against the bounded `bench` set. */
  def maxCosine(v: Column, bench: Array[Array[Double]]): Column =
    Bridge.column(CosineMaxBench(Bridge.expression(v), bench, norms(bench)))
}
