package graft.plans

import java.nio.ByteBuffer

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Element-wise mean of an embedding column in ONE aggregation pass.
  *
  * Buffer = (running element sums, row count) — dim doubles + a long — so a
  * group's whole contribution crosses the shuffle as a single k-per-partition
  * buffer row. The posexplode → groupBy(label, dim) → groupBy(label)
  * formulation this replaces in the k-means update is two sequential
  * exchanges of (groups × dim) rows each; here partial aggregation folds
  * every partition's vectors locally and the exchange carries one buffer per
  * (group, partition).
  *
  * Accumulation is left-to-right per partition then merge-order across
  * partitions — the same nondeterminism class as Spark's own `avg`; callers
  * that need oracle-stable floats (emb_centroids) keep the (label, dim)
  * formulation, where each dimension is averaged independently.
  */
final case class VectorMeanAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[VectorMeanAgg.Buf] {

  import VectorMeanAgg.Buf

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  private val childFloat = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def createAggregationBuffer(): Buf = Buf(Array.emptyDoubleArray, 0L)

  override def update(buf: Buf, input: InternalRow): Buf = {
    val v = child.eval(input)
    if (v == null) buf
    else {
      val arr = v.asInstanceOf[ArrayData]
      val n = arr.numElements()
      val sums = if (buf.n == 0L) new Array[Double](n) else buf.sums
      require(sums.length == n,
        s"vector_mean: mixed dimensions (${sums.length} vs $n) in one group")
      var i = 0
      while (i < n) {
        sums(i) += (if (childFloat) arr.getFloat(i).toDouble else arr.getDouble(i))
        i += 1
      }
      Buf(sums, buf.n + 1)
    }
  }

  override def merge(b1: Buf, b2: Buf): Buf =
    if (b1.n == 0L) b2
    else if (b2.n == 0L) b1
    else {
      require(b1.sums.length == b2.sums.length,
        s"vector_mean: mixed dimensions (${b1.sums.length} vs ${b2.sums.length})")
      var i = 0
      while (i < b1.sums.length) { b1.sums(i) += b2.sums(i); i += 1 }
      Buf(b1.sums, b1.n + b2.n)
    }

  override def eval(buf: Buf): Any =
    if (buf.n == 0L) null
    else {
      val out = new Array[Double](buf.sums.length)
      var i = 0
      while (i < out.length) { out(i) = buf.sums(i) / buf.n; i += 1 }
      UnsafeArrayData.fromPrimitiveArray(out)
    }

  override def serialize(buf: Buf): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 + 4 + buf.sums.length * 8)
    bb.putLong(buf.n)
    bb.putInt(buf.sums.length)
    buf.sums.foreach(bb.putDouble)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Buf = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getLong
    val len = bb.getInt
    Buf(Array.fill(len)(bb.getDouble), n)
  }

  override def withNewMutableAggBufferOffset(off: Int): VectorMeanAgg =
    copy(mutableAggBufferOffset = off)
  override def withNewInputAggBufferOffset(off: Int): VectorMeanAgg =
    copy(inputAggBufferOffset = off)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): VectorMeanAgg =
    copy(child = c.head)
  override def prettyName: String = "vector_mean"
}

object VectorMeanAgg {
  final case class Buf(sums: Array[Double], n: Long)

  def register(spark: SparkSession): Unit = NativeFunctions.register(spark)

  def mean(spark: SparkSession, vec: Column): Column = {
    register(spark)
    org.apache.spark.sql.functions.call_function("vector_mean", vec)
  }
}
