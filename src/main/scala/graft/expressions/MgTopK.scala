package graft.expressions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `mg_topk_candidates(term) -> ARRAY<STRING>` — a Misra-Gries
  * heavy-hitters summary as a mergeable aggregate: each partition
  * tracks at most [[MgTopK.Capacity]] counters (miss on a full buffer
  * decrements every counter by the buffer minimum and evicts zeros);
  * merge sums counters pointwise, then re-truncates by subtracting the
  * (capacity+1)-th largest count.
  *
  * The guarantee that matters — independent of partitioning and merge
  * order: every term with true frequency > N/capacity SURVIVES in the
  * final buffer. The stored counts (and any sub-threshold extras) are
  * merge-order-dependent, so the aggregate emits only the candidate
  * TERM SET; callers re-count candidates exactly and threshold ABOVE
  * N/capacity, which makes the end result deterministic and lets a
  * plain GROUP BY / HAVING serve as the oracle. This is the
  * sketch→verify shape: at corpus scale the first pass shuffles
  * capacity-bounded buffers (not the vocabulary), and only the ≤
  * capacity candidates shuffle for the exact recount. */
object MgTopK {
  val Capacity = 64

  def update(buf: mutable.HashMap[String, Long], term: String): Unit = {
    buf.get(term) match {
      case Some(c) => buf.update(term, c + 1)
      case None if buf.size < Capacity => buf.update(term, 1L)
      case None =>
        // decrement-by-min: the classic MG step, amortized O(1) per
        // miss at the cost of an O(cap) sweep when the buffer is full
        val m = buf.valuesIterator.min
        val dead = mutable.ArrayBuffer.empty[String]
        buf.mapValuesInPlace((_, c) => c - m)
        buf.foreach { case (t, c) => if (c <= 0) dead += t }
        dead.foreach(buf.remove)
        if (buf.size < Capacity) buf.update(term, 1L)
    }
  }

  def merge(a: mutable.HashMap[String, Long],
            b: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    b.foreach { case (t, c) => a.update(t, a.getOrElse(t, 0L) + c) }
    if (a.size > Capacity) {
      val d = a.valuesIterator.toArray.sorted(Ordering[Long].reverse)(Capacity)
      val dead = mutable.ArrayBuffer.empty[String]
      a.mapValuesInPlace((_, c) => c - d)
      a.foreach { case (t, c) => if (c <= 0) dead += t }
      dead.foreach(a.remove)
    }
    a
  }
}

case class MgTopKCandidates(child: Expression,
                            mutableAggBufferOffset: Int = 0,
                            inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.HashMap[String, Long]]
    with ImplicitCastInputTypes with UnaryLike[Expression] {

  override def inputTypes = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "mg_topk_candidates"

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty

  override def update(buffer: mutable.HashMap[String, Long],
                      input: InternalRow): mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) MgTopK.update(buffer, v.asInstanceOf[UTF8String].toString)
    buffer
  }

  override def merge(buffer: mutable.HashMap[String, Long],
                     other: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] =
    MgTopK.merge(buffer, other)

  override def eval(buffer: mutable.HashMap[String, Long]): Any =
    new GenericArrayData(
      buffer.keysIterator.toArray.sorted
        .map(t => UTF8String.fromString(t).asInstanceOf[Any]))

  override def serialize(buffer: mutable.HashMap[String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buffer.size)
    buffer.foreach { case (t, c) => out.writeUTF(t); out.writeLong(c) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.HashMap.empty[String, Long]
    var i = 0
    while (i < n) { buf.update(in.readUTF(), in.readLong()); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MgTopKCandidates =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): MgTopKCandidates =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildInternal(newChild: Expression): MgTopKCandidates =
    copy(child = newChild)
}
