package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._

/** Native Catalyst expression: the NEAREST-CENTROID election over a
  * fixed, bounded centroid set — the quantizer assignment step every
  * member of the trained-ANN family runs (e40's Lloyd loop, e2t's
  * chain, the e2v/e2f layout builds) — in one fused codegen'd row
  * loop. Fourth member of the native-kernel family
  * ([[CosineSimilarity]], [[SlidingChunks]], [[CosineMaxBench]]).
  *
  * Why an expression and not the HOF fold: the built-in form
  * (`aggregate(centLit, acc, (acc, ct) => when(dist2 < acc.d2, ...))`
  * with `dist2 = round(aggregate(zip_with(...)), 6)`) evaluates
  * INTERPRETED — higher-order functions never enter codegen — and
  * allocates a zipped array per (row, centroid): measured 152 s for
  * the k=64 assignment over 2M vectors (the e2v build) and 21.4 s
  * for e2t's in-key training at sfx100. The kernel is the identical
  * arithmetic as a JIT-compiled loop.
  *
  * Numeric contract (bit-parity with the fold, pinned in
  * NearestCentroidSpec): per centroid, Σ(v_i − c_i)² accumulates
  * strictly left-to-right; the per-centroid round is EXACTLY Spark's
  * `round(_, 6)` on a double (`java.math.BigDecimal.valueOf(x)
  * .setScale(6, HALF_UP)` — finite d2 by construction); the running
  * min compares with strict `<` over centroids IN INPUT ORDER, so a
  * rounded-d2 tie keeps the earlier centroid — the fold's
  * lower-cid-wins discipline when callers pass cid-sorted sets. A
  * length-mismatched centroid contributes nothing (the fold's null
  * d2 keeps the accumulator); a null ELEMENT anywhere in the query
  * vector nulls every fold d2, so the fold returns its initial
  * (MaxValue, -1) accumulator — replicated exactly. Output is the
  * fold's struct(d2, cid). */
case class NearestCentroid(
    child: Expression,
    cents: Array[Array[Double]],
    cids: Array[Int]) extends UnaryExpression {
  require(cents.length == cids.length && cents.nonEmpty,
    "nearest_centroid: one cid per centroid, at least one centroid")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"nearest_centroid expects array<double>, got ${t.simpleString}")
  }
  override def dataType: DataType = StructType(Seq(
    StructField("d2", DoubleType, nullable = false),
    StructField("cid", IntegerType, nullable = false)))
  override def nullable: Boolean = true
  override def prettyName: String = "nearest_centroid"

  /** Shared kernel — interpreted path and the codegen'd Java below
    * must stay line-for-line equivalent. Returns {d2, cid}. */
  def nearest(v: Array[Double], anyNull: Boolean): InternalRow = {
    var best = Double.MaxValue
    var bestCid = -1
    if (!anyNull) {
      var j = 0
      while (j < cents.length) {
        val c = cents(j)
        if (c.length == v.length) {
          var acc = 0.0
          var i = 0
          while (i < c.length) { val df = v(i) - c(i); acc += df * df; i += 1 }
          val d = java.math.BigDecimal.valueOf(acc)
            .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
          if (d < best) { best = d; bestCid = cids(j) }
        }
        j += 1
      }
    }
    new GenericInternalRow(Array[Any](best, bestCid))
  }

  override def nullSafeEval(a: Any): Any = {
    val arr = a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val v = new Array[Double](arr.numElements())
    var anyNull = false
    var i = 0
    while (i < v.length) {
      if (arr.isNullAt(i)) anyNull = true else v(i) = arr.getDouble(i)
      i += 1
    }
    nearest(v, anyNull)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val centsRef = ctx.addReferenceObj("cents", cents, "double[][]")
      val cidsRef = ctx.addReferenceObj("cids", cids, "int[]")
      val v = ctx.freshName("v")
      val n = ctx.freshName("n")
      val anyNull = ctx.freshName("anyNull")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val k = ctx.freshName("k")
      val c = ctx.freshName("c")
      val acc = ctx.freshName("acc")
      val df = ctx.freshName("df")
      val d = ctx.freshName("d")
      val best = ctx.freshName("best")
      val bestCid = ctx.freshName("bestCid")
      s"""
         |final int $n = $a.numElements();
         |final double[] $v = new double[$n];
         |boolean $anyNull = false;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i)) { $anyNull = true; } else { $v[$i] = $a.getDouble($i); }
         |}
         |double $best = Double.MAX_VALUE;
         |int $bestCid = -1;
         |if (!$anyNull) {
         |  for (int $j = 0; $j < $centsRef.length; $j++) {
         |    final double[] $c = $centsRef[$j];
         |    if ($c.length == $n) {
         |      double $acc = 0.0;
         |      for (int $k = 0; $k < $n; $k++) {
         |        final double $df = $v[$k] - $c[$k];
         |        $acc += $df * $df;
         |      }
         |      final double $d = java.math.BigDecimal.valueOf($acc)
         |        .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue();
         |      if ($d < $best) { $best = $d; $bestCid = $cidsRef[$j]; }
         |    }
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
         |  new Object[]{java.lang.Double.valueOf($best), java.lang.Integer.valueOf($bestCid)});
       """.stripMargin
    })

  // content-based equality: Array fields compare by reference in the
  // synthesized case-class equals, which would defeat canonicalization
  // and subexpression elimination (the CosineMaxBench r11 advisory)
  override def equals(o: Any): Boolean = o match {
    case that: NearestCentroid =>
      child == that.child &&
        java.util.Arrays.deepEquals(
          cents.asInstanceOf[Array[AnyRef]], that.cents.asInstanceOf[Array[AnyRef]]) &&
        java.util.Arrays.equals(cids, that.cids)
    case _ => false
  }
  override def hashCode(): Int =
    31 * (31 * child.hashCode() +
      java.util.Arrays.deepHashCode(cents.asInstanceOf[Array[AnyRef]])) +
      java.util.Arrays.hashCode(cids)

  override protected def withNewChildInternal(newChild: Expression): NearestCentroid =
    copy(child = newChild)
}

object NearestCentroid {
  /** Column form: struct(d2, cid) of the nearest centroid — the
    * drop-in replacement for the HOF [[graft.ops.SimOps.bestCentroid]]
    * fold (same struct fields, same tie discipline). */
  def nearest(v: Column, cs: Seq[(Int, Seq[Double])]): Column =
    Bridge.column(NearestCentroid(Bridge.expression(v),
      cs.map(_._2.toArray).toArray, cs.map(_._1).toArray))
}
