package graft.functions

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Column, Encoder, Encoders}

/** Mergeable partial state for [[VectorCentroid]]: element-wise sums
  * plus the row count. `sums` starts empty and adopts the first
  * vector's length, so the aggregator needs no up-front dimension
  * parameter. */
case class CentroidBuf(var sums: Array[Double], var n: Long)

/** Typed `Aggregator` computing the per-group element-wise mean of an
  * embedding column — the centroid a k-means/IVF build step or an
  * embedding-pooling stage needs. This is the SURVEY §2.11 designated
  * escape hatch exercised for real: a custom UDAF whose partial state
  * (`CentroidBuf`) is associatively mergeable, so Spark runs it as a
  * partial aggregation (map-side combine) — each partition ships ONE
  * (sums, n) pair per group, never the vectors. At 100 TB the shuffle
  * volume is `groups × dim × 8` bytes, independent of row count.
  *
  * Reference analogue: the per-dataset running totals the scraper keeps
  * while paging (`web_scrpaer_2.py:530-543` accumulates per-dataset
  * counts) — generalized from a scalar count to a vector sum.
  *
  * Determinism note: double addition is reordered across partitions;
  * the finished means are rounded to 6 dp (same policy as every other
  * double-producing key), which absorbs the ~1e-13 relative
  * reassociation error at any realistic group size.
  */
object VectorCentroid extends Aggregator[Array[Double], CentroidBuf, Array[Double]] {

  override def zero: CentroidBuf = CentroidBuf(Array.emptyDoubleArray, 0L)

  // Initialization is tracked by n == 0, NOT sums.isEmpty: a
  // zero-length input vector legitimately leaves sums empty with n = 1,
  // and the old emptiness test let the next non-empty vector silently
  // re-initialize the buffer and reset the count. With n-based tracking
  // a zero-length vector counts correctly against an all-zero-length
  // group, and a mixed-dimension group fails the require below instead
  // of corrupting the mean.
  override def reduce(b: CentroidBuf, v: Array[Double]): CentroidBuf = {
    if (v == null) return b
    if (b.n == 0L) { b.sums = v.clone(); b.n = 1L; return b }
    require(b.sums.length == v.length,
      s"vector length mismatch: ${b.sums.length} vs ${v.length}")
    var i = 0
    while (i < v.length) { b.sums(i) += v(i); i += 1 }
    b.n += 1
    b
  }

  override def merge(a: CentroidBuf, b: CentroidBuf): CentroidBuf = {
    if (b.n == 0L) return a
    if (a.n == 0L) return b
    // Same dimension contract as reduce(): without it, two partitions
    // that adopted different first-vector lengths would silently
    // truncate (loop bounded by a) or throw AIOOBE mid-merge.
    require(a.sums.length == b.sums.length,
      s"vector length mismatch in merge: ${a.sums.length} vs ${b.sums.length}")
    var i = 0
    while (i < a.sums.length) { a.sums(i) += b.sums(i); i += 1 }
    a.n += b.n
    a
  }

  override def finish(b: CentroidBuf): Array[Double] =
    b.sums.map(x => BigDecimal(x / b.n)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)

  override def bufferEncoder: Encoder[CentroidBuf] = Encoders.product[CentroidBuf]

  override def outputEncoder: Encoder[Array[Double]] = ExpressionEncoder[Array[Double]]()

  /** Column form for untyped `DataFrame.groupBy(...).agg(...)`. */
  def centroid(v: Column): Column =
    org.apache.spark.sql.functions.udaf(this, ExpressionEncoder[Array[Double]]())
      .apply(v)
}
