package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.NearestCentroid
import graft.ops.SimOps

/** The nearest-centroid kernel (the family's fourth native
  * expression). Claims: bit-parity with the HOF fold it replaced on
  * the real fixture vectors under BOTH codegen and interpreted
  * evaluation; the tie keeps the earlier (lower-cid) centroid; a
  * length-mismatched centroid contributes nothing; a null element
  * yields the fold's initial (MaxValue, -1) accumulator. */
class NearestCentroidSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  private val sf = SparkTestSession.sf
  import spark.implicits._

  private def cents8() = {
    val e = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    e.where(col("vec_id") < 8)
      .select(col("vec_id").cast("int"), transform(col("v"), x => round(x, 6)))
      .orderBy("vec_id").collect().toSeq
      .map(r => (r.getInt(0), r.getSeq[Double](1)))
  }

  test("kernel equals the HOF fold on every fixture vector (codegen)") {
    val cs = cents8()
    val e = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val both = e.select(col("vec_id"),
      SimOps.bestCentroid(col("v"), cs).as("k"),
      SimOps.bestCentroidFold(col("v"), cs).as("f"))
    val bad = both.where(
      col("k.cid") =!= col("f.cid") || col("k.d2") =!= col("f.d2")).count()
    assert(bad == 0, s"$bad rows diverge between kernel and fold")
    assert(both.count() > 0)
  }

  test("interpreted eval agrees with codegen (fallback safety)") {
    val cs = cents8()
    val rows = Tables.embeddings(spark, sf).limit(64)
      .select(col("embedding").cast("array<double>").as("v")).collect()
      .map(_.getSeq[Double](0).toArray)
    val expr = NearestCentroid(
      org.apache.spark.sql.catalyst.expressions.BoundReference(0,
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.DoubleType),
        nullable = true),
      cs.map(_._2.toArray).toArray, cs.map(_._1).toArray)
    rows.foreach { v =>
      val row = org.apache.spark.sql.catalyst.InternalRow(
        org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(v))
      val interp = expr.eval(row)
        .asInstanceOf[org.apache.spark.sql.catalyst.InternalRow]
      // driver-side replication of the kernel arithmetic
      val expect = cs.map { case (cid, c) =>
        var acc = 0.0
        var i = 0
        while (i < c.length) { val d = v(i) - c(i); acc += d * d; i += 1 }
        (BigDecimal.valueOf(acc).setScale(6, BigDecimal.RoundingMode.HALF_UP)
          .toDouble, cid)
      }.minBy(identity)
      assert(interp.getDouble(0) == expect._1 && interp.getInt(1) == expect._2)
    }
  }

  test("tie keeps the earlier centroid; mismatched length contributes nothing") {
    val c0 = Seq.fill(4)(0.0)
    // two identical centroids (cids 5 then 9) + a length-3 centroid
    // that would be nearest if lengths were ignored
    val cs = Seq((5, c0), (9, c0), (2, Seq(0.5, 0.5, 0.5)))
    val out = Seq((1L, Seq(0.5, 0.5, 0.5, 0.5)))
      .toDF("id", "v")
      .select(SimOps.bestCentroid(col("v"), cs).as("b"))
      .select(col("b.cid"), col("b.d2")).head()
    assert(out.getInt(0) == 5, "rounded-d2 tie must keep the earlier cid")
    assert(out.getDouble(1) == 1.0)
  }

  test("a null element yields the fold's initial accumulator") {
    val cs = Seq((0, Seq(0.0, 0.0)))
    val kernel = Seq((1L, Seq[java.lang.Double](1.0, null)))
      .toDF("id", "v")
      .select(SimOps.bestCentroid(col("v").cast("array<double>"), cs).as("b"))
      .select(col("b.cid"), col("b.d2")).head()
    val fold = Seq((1L, Seq[java.lang.Double](1.0, null)))
      .toDF("id", "v")
      .select(SimOps.bestCentroidFold(col("v").cast("array<double>"), cs).as("b"))
      .select(col("b.cid"), col("b.d2")).head()
    assert(kernel == fold && kernel.getInt(0) == -1)
  }
}
