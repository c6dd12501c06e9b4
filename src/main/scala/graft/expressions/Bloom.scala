package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType, LongType}

/** Bloom-filter kernels for `join_bloom_prefilter` — the broadcast
  * runtime-filter primitive: build a fixed-size bitmap over a keyset
  * with [[BloomBuild]] (an aggregate → ONE binary row), broadcast it,
  * and prune a fact scan map-side with [[BloomContains]] BEFORE the
  * shuffle join that removes the false positives.
  *
  * This exists because Spark's own `BloomFilterAggregate`/
  * `BloomFilterMightContain` pair is internal — reachable only through
  * the `InjectRuntimeFilter` rule's cost gates, not from the API — and
  * the explicit form is the one a pipeline author can size and place
  * deliberately (filtered-dim semi joins the optimizer's heuristics
  * skip). Hashing is double-hashing over two splitmix64 finalizers —
  * self-contained integer math, deterministic on every JVM, and
  * irrelevant to the oracle: false positives are removed by the exact
  * join, so the RESULT is independent of the hash scheme by
  * construction.
  *
  * Sizing: [[BloomUtil.NumBits]] = 2²⁰ bits (128 KiB) with 4 probes
  * holds ~100k keys at ~1% FPR; at larger keysets the filter degrades
  * gracefully (more false positives survive to the exact join — more
  * shuffled rows, never wrong results). At 100 TB you size bits ≈ 10×
  * keys and broadcast a few MiB to prune a TB-scale scan.
  */
object BloomUtil {
  val NumHashes = 4
  val NumBits: Int = 1 << 20
  val NumWords: Int = NumBits / 64

  private def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }
  private def h1(key: Long): Long = mix(key)
  // forced odd so the probe stride never degenerates to 0
  private def h2(key: Long): Long = mix(key ^ 0x5851f42d4c957f2dL) | 1L

  def set(bits: Array[Long], key: Long): Unit = {
    val a = h1(key); val b = h2(key)
    var i = 0
    while (i < NumHashes) {
      val pos = java.lang.Long.remainderUnsigned(a + i * b, NumBits).toInt
      bits(pos >> 6) |= 1L << (pos & 63)
      i += 1
    }
  }

  /** Byte-array probe (the broadcast side is the serialized bitmap).
    * Byte layout is the little-endian packing of [[toBytes]], so bit p
    * lives at byte `p >> 3`, bit `p & 7`. */
  def contains(bytes: Array[Byte], key: Long): Boolean = {
    val a = h1(key); val b = h2(key)
    var i = 0
    while (i < NumHashes) {
      val pos = java.lang.Long.remainderUnsigned(a + i * b, NumBits).toInt
      if ((bytes(pos >> 3) & (1 << (pos & 7))) == 0) return false
      i += 1
    }
    true
  }

  def toBytes(bits: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(bits.length * 8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.asLongBuffer().put(bits)
    bb.array()
  }

  def fromBytes(bytes: Array[Byte]): Array[Long] = {
    val out = new Array[Long](bytes.length / 8)
    java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).asLongBuffer().get(out)
    out
  }
}

/** `bloom_build(key) -> BINARY` — aggregate a BIGINT keyset into the
  * fixed-size bitmap. Partial aggregation works: each partition builds
  * its own bitmap and merge is a bitwise OR, so the shuffle carries one
  * 128 KiB buffer per partition, never the keys. */
case class BloomBuild(child: Expression,
                      mutableAggBufferOffset: Int = 0,
                      inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]]
    with ImplicitCastInputTypes with UnaryLike[Expression] {

  override def inputTypes = Seq(LongType)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "bloom_build"

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](BloomUtil.NumWords)

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) BloomUtil.set(buffer, v.asInstanceOf[Long])
    buffer
  }

  override def merge(buffer: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buffer.length) { buffer(i) |= other(i); i += 1 }
    buffer
  }

  override def eval(buffer: Array[Long]): Any = BloomUtil.toBytes(buffer)

  override def serialize(buffer: Array[Long]): Array[Byte] =
    BloomUtil.toBytes(buffer)

  override def deserialize(bytes: Array[Byte]): Array[Long] =
    BloomUtil.fromBytes(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomBuild =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): BloomBuild =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildInternal(newChild: Expression): BloomBuild =
    copy(child = newChild)
}

/** `bloom_contains(bloom BINARY, key BIGINT) -> BOOLEAN` — the probe;
  * codegen'd so the fact-scan filter stays inside whole-stage codegen
  * (a probe per row on the hot path must not fall back to interpreted
  * eval). */
case class BloomContains(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {

  override def inputTypes = Seq(BinaryType, LongType)
  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_contains"

  override protected def nullSafeEval(bloom: Any, key: Any): Any =
    BloomUtil.contains(bloom.asInstanceOf[Array[Byte]],
      key.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (b, k) =>
      s"graft.expressions.BloomUtil.contains($b, $k)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomContains =
    copy(left = newLeft, right = newRight)
}
