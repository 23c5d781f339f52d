package graft.plans

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Aggregate that merges MinHash signatures by element-wise minimum.
  *
  * Property that makes this useful: min-wise signatures compose — the
  * element-wise min of two docs' signatures IS the signature of the union
  * of their shingle sets. So a group's merged signature summarizes the
  * whole group's content, enabling cluster-level / source-level similarity
  * estimates without touching the raw text again, and incremental
  * signature maintenance (merge yesterday's sig with today's delta).
  *
  * TypedImperativeAggregate (mutable long[] buffer) — the tier for
  * sketch-like aggregation state the guide points to for HLL/sketches;
  * supports partial aggregation, so map-side combine happens before the
  * shuffle like any built-in agg.
  */
final case class MinHashMerge(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): Array[Long] = Array.emptyLongArray

  private def minInto(buf: Array[Long], arr: ArrayData): Array[Long] = {
    val n = arr.numElements()
    val b = if (buf.isEmpty) Array.fill(n)(Long.MaxValue) else buf
    require(b.length == n,
      s"minhash_merge: mixed signature lengths (${b.length} vs $n) — all rows " +
        "in a group must use the same numPerms")
    var i = 0
    while (i < n && i < b.length) {
      val v = arr.getLong(i)
      if (v < b(i)) b(i) = v
      i += 1
    }
    b
  }

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v == null) buf else minInto(buf, v.asInstanceOf[ArrayData])
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] =
    if (b1.isEmpty) b2
    else if (b2.isEmpty) b1
    else {
      require(b1.length == b2.length,
        s"minhash_merge: mixed signature lengths (${b1.length} vs ${b2.length})")
      var i = 0
      while (i < b1.length) { if (b2(i) < b1(i)) b1(i) = b2(i); i += 1 }
      b1
    }

  override def eval(buf: Array[Long]): Any =
    if (buf.isEmpty) null else UnsafeArrayData.fromPrimitiveArray(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.length * 8)
    bb.putInt(buf.length)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    Array.fill(n)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(off: Int): MinHashMerge =
    copy(mutableAggBufferOffset = off)
  override def withNewInputAggBufferOffset(off: Int): MinHashMerge =
    copy(inputAggBufferOffset = off)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): MinHashMerge =
    copy(child = c.head)
  override def prettyName: String = "minhash_merge"
}
