package graft

import java.nio.{ByteBuffer, ByteOrder}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.TextOps

/** m5 — PCM sample-domain energy. The expression-tree decoder is checked
  * against a REAL little-endian decoder: java.nio.ByteBuffer consumes the
  * same synthesized WAV payload bytes the engine parses in the hex
  * domain, byte-for-byte, with none of the engine's arithmetic shared.
  */
class AudioEnergySpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  private val sf = SparkTestSession.sf

  /** Real decoder: header via LE ByteBuffer reads, then every PCM value
    * (8-bit unsigned re-centered at 128, 16-bit signed LE). */
  private def decode(bytes: Array[Byte]): (Int, Int, Long, Long, Long, Long) = {
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    assert(new String(bytes, 0, 4, "US-ASCII") == "RIFF")
    assert(new String(bytes, 8, 4, "US-ASCII") == "WAVE")
    val channels = bb.getShort(22).toInt
    val bits = bb.getShort(34).toInt
    val fmtSize = bb.getInt(16)
    val dataOff = 20 + fmtSize
    assert(new String(bytes, dataOff, 4, "US-ASCII") == "data")
    val dataSize = bb.getInt(dataOff + 4)
    val nValues = dataSize / (bits / 8)
    var sumAbs = 0L; var sumSq = 0L; var peak = 0L
    var i = 0
    while (i < nValues) {
      val amp: Long =
        if (bits == 8) (bytes(dataOff + 8 + i) & 0xFF).toLong - 128L
        else bb.getShort(dataOff + 8 + i * 2).toLong
      sumAbs += math.abs(amp); sumSq += amp * amp
      peak = math.max(peak, math.abs(amp))
      i += 1
    }
    (channels, bits, nValues.toLong, sumAbs, sumSq, peak)
  }

  test("m5 equals a real ByteBuffer LE decode of the same payload bytes") {
    val payloads = Tables.documents(spark, sf)
      .select(col("doc_id"), TextOps.wavPayload.as("payload"))
      .collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).toMap
    val rows = TextOps.m5AudioEnergy(spark, sf).collect()
    assert(rows.length == payloads.size, "every payload must decode")
    rows.foreach { r =>
      val (ch, bits, nv, sa, sq, pk) = decode(payloads(r.getLong(0)))
      assert(r.getInt(1) == ch, s"doc ${r.getLong(0)} channels")
      assert(r.getInt(2) == bits, s"doc ${r.getLong(0)} bits")
      assert(r.getLong(3) == nv, s"doc ${r.getLong(0)} n_values")
      assert(r.getLong(4) == sa, s"doc ${r.getLong(0)} sum_abs")
      assert(r.getLong(5) == sq, s"doc ${r.getLong(0)} sum_sq")
      assert(r.getLong(6) == pk, s"doc ${r.getLong(0)} peak")
    }
  }

  test("energy invariants: Cauchy-Schwarz and peak bounds hold") {
    TextOps.m5AudioEnergy(spark, sf).collect().foreach { r =>
      val (nv, sa, sq, pk) = (r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))
      assert(pk * pk <= sq, "peak^2 <= sum of squares")
      assert(sa <= pk * nv, "sum_abs <= peak * n")
      // (sum |x|)^2 <= n * sum x^2
      assert(BigInt(sa) * BigInt(sa) <= BigInt(nv) * BigInt(sq), "Cauchy-Schwarz")
      val maxAmp = if (r.getInt(2) == 8) 128L else 32768L
      assert(pk <= maxAmp, "peak within sample domain")
    }
  }
}
