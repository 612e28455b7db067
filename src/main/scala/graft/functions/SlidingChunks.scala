package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.{CollectionGenerator, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst GENERATOR (UDTF): sliding-window chunking of a token
  * array into overlapping (width, stride) windows — one output row per
  * chunk, carrying the chunk index, token offsets, and an 8-byte md5
  * content fingerprint of the re-joined slice.
  *
  * This completes SURVEY §2.11's escape-hatch surface: scalar
  * `Expression` (CosineSimilarity), typed `Aggregator` (VectorCentroid),
  * whole logical operator (TopKPerKey) — and now a table-valued
  * generator, the extension point for "one input row → N output rows"
  * semantics that `explode(transform(...))` can only reach by first
  * materializing the N-element array per row.
  *
  * That materialization is exactly what this generator deletes in the
  * interpreted path and keeps OFF the expression stack in codegen: it is
  * a `CollectionGenerator` (inline struct form), so `GenerateExec`
  * consumes it inside whole-stage codegen — the generated code loops
  * over the chunk collection produced by one fused call (child array →
  * chunk rows, no intermediate per-chunk Catalyst expression tree, no
  * repeated `slice`/`array_join` HOF evaluation per chunk), while
  * `explode(transform(sequence(...)))` evaluates three nested
  * higher-order functions interpreted, per row.
  *
  * Semantics are bit-identical to the e41 declared query
  * (CurationOps.e41ChunkOverlap, oracle-shared):
  *   n_chunks = ⌊(max(n−width,0)+stride−1)/stride⌋ + 1 (≥1 per doc);
  *   chunk c covers tokens [c·stride, c·stride + min(width, n−c·stride));
  *   chunk_fp = first 8 hex digits of md5(space-joined slice) as a long
  * — the digest runs over the same UTF-8 bytes Spark's `md5(string)`
  * hashes, so the fingerprint matches `conv(substring(md5(...),1,8),16,10)`
  * exactly (ChunkGeneratorSpec pins bit-equality to e41).
  *
  * 100 TB path: identical to e41's — scan → project → one Generate,
  * embarrassingly parallel, no shuffle before the declared ordering. */
case class SlidingChunks(child: Expression, width: Int, stride: Int)
    extends UnaryExpression with CollectionGenerator {
  require(width >= 1 && stride >= 1, "sliding_chunks: width/stride must be >= 1")

  override def position: Boolean = false
  override def inline: Boolean = true
  override def prettyName: String = "sliding_chunks"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"sliding_chunks expects array<string>, got ${t.simpleString}")
  }

  override def elementSchema: StructType = StructType(Seq(
    StructField("chunk_id", IntegerType, nullable = false),
    StructField("start_tok", IntegerType, nullable = false),
    StructField("n_tok_chunk", IntegerType, nullable = false),
    StructField("chunk_fp", LongType, nullable = true)))

  override def collectionType: DataType = ArrayType(elementSchema, containsNull = false)

  /** The fused chunk build — shared by the interpreted path and the
    * codegen callback. One digest instance per call (per input row),
    * reset between chunks; tokens hash as their raw UTF-8 bytes with a
    * single 0x20 separator, byte-identical to md5(array_join(slice)). */
  def buildChunks(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    val nChunks = (math.max(n - width, 0) + stride - 1) / stride + 1
    val md = java.security.MessageDigest.getInstance("MD5")
    val out = new Array[Any](nChunks)
    var c = 0
    while (c < nChunks) {
      val start = c * stride
      val len = math.min(width, n - start)
      md.reset()
      // null tokens hash exactly as array_join does: skipped along
      // with their separator (the separator only follows a non-null
      // token already written) — a containsNull=true token array
      // (Spark's `split` schema default) therefore fingerprints
      // identically to md5(array_join(slice, ' ')) (r10 advice)
      var i = start
      var wrote = false
      while (i < start + len) {
        val t = arr.getUTF8String(i)
        if (t != null) {
          if (wrote) md.update(0x20.toByte)
          md.update(t.getBytes)
          wrote = true
        }
        i += 1
      }
      val d = md.digest()
      // first 8 hex digits = the top 4 digest bytes, as an unsigned int
      val fp = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
      out(c) = new GenericInternalRow(Array[Any](c, start, len, fp))
      c += 1
    }
    new GenericArrayData(out)
  }

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val v = child.eval(input)
    if (v == null) Nil
    else {
      val rows = buildChunks(v.asInstanceOf[ArrayData])
      (0 until rows.numElements()).map(i =>
        rows.get(i, elementSchema).asInstanceOf[InternalRow])
    }
  }

  /** Codegen: GenerateExec's CollectionGenerator protocol wants this
    * expression's generated value to BE the chunk collection; the exec
    * node then emits the per-element consumption loop inside the same
    * whole-stage pipeline. The collection build delegates to
    * [[buildChunks]] via a reference object — the loop that matters for
    * fusion (per-chunk row emission) is the exec's generated one. */
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("slidingChunks", this, classOf[SlidingChunks].getName)
    val childGen = child.genCode(ctx)
    ev.copy(code = code"""
      |${childGen.code}
      |boolean ${ev.isNull} = ${childGen.isNull};
      |org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} = ${ev.isNull}
      |  ? null : $ref.buildChunks(${childGen.value});
      |""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): SlidingChunks =
    copy(child = newChild)
}

object SlidingChunks {
  /** Column form: emits columns (chunk_id, start_tok, n_tok_chunk,
    * chunk_fp) when selected, like any generator. */
  def chunks(tokens: Column, width: Int, stride: Int): Column =
    Bridge.column(SlidingChunks(Bridge.expression(tokens), width, stride))
}
