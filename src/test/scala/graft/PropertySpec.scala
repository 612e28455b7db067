package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

/** Randomized invariants (fixed seed → reproducible): explode∘nest = id,
  * dedup idempotence, rollup consistency, slice bounds — SURVEY.md §5's
  * property layer, hand-rolled over seeded generators. */
class PropertySpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private val rnd = new Random(42)

  test("explode ∘ nest = id on random grouped data") {
    for (_ <- 1 to 5) {
      val rows = Seq.fill(200)((rnd.nextInt(20), rnd.nextInt(1000)))
      val df = rows.toDF("k", "v")
      val renested = df.groupBy($"k")
        .agg(array_sort(collect_list($"v")).as("vs"))
        .select($"k", explode($"vs").as("v"))
      assert(renested.exceptAll(df).count() == 0)
      assert(df.exceptAll(renested).count() == 0)
    }
  }

  test("pyFloatRepr round-trips every random finite double and obeys Python's notation rules") {
    val fixed = Seq(0.1, 1.0 / 3.0, math.Pi, 1e-4, 9.999999999999999e-5,
      1e15, 1.0000000000000002e16, Double.MinPositiveValue, Double.MaxValue)
    val randoms = Seq.fill(2000) {
      // span magnitudes: random sign/mantissa/exponent
      val m = rnd.nextDouble() * 2 - 1
      val e = rnd.nextInt(613) - 306
      m * math.pow(10, e)
    }.filter(d => !d.isNaN && !d.isInfinite && d != 0.0)
    (fixed ++ randoms).foreach { d =>
      val s = graft.ord.OrdJson.pyFloatRepr(d)
      assert(s.toDouble == d, s"not a round trip: $d -> $s")
      // CPython: fixed notation iff decimal exponent in [-4, 16)
      val mag = math.abs(d)
      val exp = math.floor(math.log10(mag)).toInt
      if (s.contains("e")) {
        assert(s.matches("-?\\d(\\.\\d+)?e[+-]\\d\\d+"), s"bad sci shape: $s")
      } else if (mag >= 1e-4 && mag < 1e15) {
        // (log10 at regime boundaries is float-fuzzy; interior is exact)
        assert(exp >= -4 && exp < 16, s"fixed notation out of range: $d -> $s")
      }
    }
  }

  test("first-seen dedup is idempotent and keeps minimal positions") {
    import org.apache.spark.sql.expressions.Window
    for (_ <- 1 to 5) {
      val rows = Seq.tabulate(300)(i => (i, s"id${rnd.nextInt(40)}"))
      val df = rows.toDF("pos", "id")
      val w = Window.partitionBy($"id").orderBy($"pos")
      def dedup(d: org.apache.spark.sql.DataFrame) =
        d.withColumn("rn", row_number().over(w)).where($"rn" === 1).drop("rn")
      val once = dedup(df)
      val twice = dedup(once)
      assert(once.exceptAll(twice).count() == 0)
      // each kept pos is the minimum for its id
      val expected = rows.groupBy(_._2).map { case (id, g) => (g.map(_._1).min, id) }.toSeq
      assert(once.exceptAll(expected.toDF("pos", "id")).count() == 0)
    }
  }

  test("1-based end-inclusive slice matches list semantics for random bounds") {
    val n = 50
    val df = (1 to n).toDF("id").orderBy("id")
    for (_ <- 1 to 10) {
      val start = rnd.nextInt(n) + 1
      val end = (start + rnd.nextInt(n - start + 1)).min(n)
      // reference: all_ids[start-1 : end] (web_scrpaer_2.py:425-429)
      val expected = (1 to n).slice(start - 1, end)
      val got = df.offset(start - 1).limit(end - start + 1)
        .collect().map(_.getInt(0)).toSeq
      assert(got == expected, s"slice [$start,$end]")
    }
  }

  test("rollup: grand total equals sum over leaves for random data") {
    for (_ <- 1 to 3) {
      val rows = Seq.fill(500)((s"g${rnd.nextInt(5)}", s"h${rnd.nextInt(3)}", rnd.nextInt(100)))
      val out = rows.toDF("a", "b", "v")
        .rollup($"a", $"b").agg(sum($"v").as("s")).collect()
      val grand = out.filter(r => r.isNullAt(0) && r.isNullAt(1)).map(_.getLong(2)).head
      val leaves = out.filter(r => !r.isNullAt(0) && !r.isNullAt(1)).map(_.getLong(2)).sum
      val mids = out.filter(r => !r.isNullAt(0) && r.isNullAt(1)).map(_.getLong(2)).sum
      assert(grand == leaves && grand == mids && grand == rows.map(_._3.toLong).sum)
    }
  }

  test("tagged-union normalization: exactly one branch fires for any code") {
    val rows = Seq.tabulate(100)(i => (i, rnd.nextInt(5)))
    val df = rows.toDF("id", "code")
      .select($"id",
        when($"code" === 0, "moles").when($"code" === 1, "volume")
          .when($"code" >= 2, "mass").otherwise("none").as("kind"))
    assert(df.where($"kind" === "none").count() == 0)
    assert(df.count() == 100)
  }

  test("VectorCentroid partial state is associative and split-invariant on random data") {
    // the partial-agg contract the 100 TB story rests on: ANY partition
    // split of the input, merged in ANY association order, must finish
    // to the same centroid the sequential fold produces
    import graft.functions.{CentroidBuf, VectorCentroid => VC}
    for (trial <- 1 to 20) {
      val dim = 1 + rnd.nextInt(8)
      val n = 2 + rnd.nextInt(40)
      val vecs = Seq.fill(n)(Array.fill(dim)(rnd.nextDouble() * 20 - 10))
      def fold(vs: Seq[Array[Double]]): CentroidBuf =
        vs.foldLeft(VC.zero)((b, v) => VC.reduce(b, v))
      val sequential = VC.finish(fold(vecs)).toSeq
      // random split into 1..5 partitions, then a random merge tree
      val cuts = (Seq(0, n) ++ Seq.fill(rnd.nextInt(4))(rnd.nextInt(n + 1)))
        .distinct.sorted
      var bufs = cuts.zip(cuts.tail).map { case (a, b) => fold(vecs.slice(a, b)) }
        .filter(_.n > 0)
      while (bufs.size > 1) {
        val i = rnd.nextInt(bufs.size - 1)
        bufs = bufs.patch(i, Seq(VC.merge(bufs(i), bufs(i + 1))), 2)
      }
      val merged = VC.finish(bufs.head).toSeq
      // finish() rounds to 6 dp; reassociation drift is absorbed there
      assert(merged == sequential, s"trial $trial: $merged != $sequential")
    }
  }

  test("VectorCentroid rejects mixed dimensions in merge, not just reduce") {
    import graft.functions.{VectorCentroid => VC}
    val a = VC.reduce(VC.zero, Array(1.0, 2.0))
    val b = VC.reduce(VC.zero, Array(1.0, 2.0, 3.0))
    intercept[IllegalArgumentException](VC.merge(a, b))
  }

  test("packed-long argmax lemmas: every r11 repack preserves struct ordering (random)") {
    // the four keeper elections repacked from min/max(struct) to one
    // long (r10 verdict ask #1) each rest on a packing lemma; this
    // drives all four with random values INSIDE the documented bounds
    // and asserts the packed order equals lexicographic struct order.
    // e28/e39: min(id << 20 | small) = lexicographic min(id, small),
    // ids < 2^43, small < 2^20, both non-negative
    for (_ <- 1 to 2000) {
      val (a1, a2) = (rnd.nextLong().abs % (1L << 43), rnd.nextLong().abs % (1L << 20))
      val (b1, b2) = (rnd.nextLong().abs % (1L << 43), rnd.nextLong().abs % (1L << 20))
      val packedMin = math.min((a1 << 20) | a2, (b1 << 20) | b2)
      val structMin = if (Ordering[(Long, Long)].lteq((a1, a2), (b1, b2)))
        (a1 << 20) | a2 else (b1 << 20) | b2
      assert(packedMin == structMin, s"e28/e39 lemma: ($a1,$a2) vs ($b1,$b2)")
    }
    // e33: min(gap << 33 | error_id) = argmax onset (min gap) then min
    // id; gaps ≤ 15 min in µs < 2^30, ids < 2^33
    for (_ <- 1 to 2000) {
      val (g1, i1) = (rnd.nextLong().abs % 900000001L, rnd.nextLong().abs % (1L << 33))
      val (g2, i2) = (rnd.nextLong().abs % 900000001L, rnd.nextLong().abs % (1L << 33))
      val packed = math.min((g1 << 33) | i1, (g2 << 33) | i2)
      val struct = if (Ordering[(Long, Long)].lteq((g1, i1), (g2, i2)))
        (g1 << 33) | i1 else (g2 << 33) | i2
      assert(packed == struct, s"e33 lemma: ($g1,$i1) vs ($g2,$i2)")
    }
    // e34: max(q(cos) << 32 | (2^32-1 - id)) = argmax by (cos desc, id
    // asc) for 6-dp cosines in [-1,1] and ids < 2^32; and q/1e6 - 1
    // reconstructs round(cos, 6) bit-exactly
    val idMask = (1L << 32) - 1
    def r6(x: Double) =
      BigDecimal.valueOf(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    for (_ <- 1 to 2000) {
      val (c1, i1) = (r6(rnd.nextDouble() * 2 - 1), rnd.nextLong().abs % (1L << 32))
      val (c2, i2) = (r6(rnd.nextDouble() * 2 - 1), rnd.nextLong().abs % (1L << 32))
      def pack(c: Double, i: Long) =
        (math.round((c + 1) * 1e6) << 32) | (idMask - i)
      val winner = if (Ordering[(Double, Long)].lteq((-c1, i1), (-c2, i2)))
        (c1, i1) else (c2, i2)
      val packedWinner = if (pack(c1, i1) >= pack(c2, i2)) (c1, i1) else (c2, i2)
      assert(packedWinner == winner, s"e34 lemma: ($c1,$i1) vs ($c2,$i2)")
      val q = pack(c1, i1) >>> 32
      assert(r6(q / 1e6 - 1.0) == c1, s"e34 reconstruction: $c1")
    }
  }
}
