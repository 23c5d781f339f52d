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
  * Buffer = (running element sums, row count) — dim longs + a long — so a
  * group's whole contribution crosses the shuffle as a single k-per-partition
  * buffer row. The posexplode → groupBy(label, dim) → groupBy(label)
  * formulation this replaces in the k-means update is two sequential
  * exchanges of (groups × dim) rows each; here partial aggregation folds
  * every partition's vectors locally and the exchange carries one buffer per
  * (group, partition).
  *
  * Accumulation is ORDER-FREE: each element is quantized once at the input
  * boundary — `floor(x * 1e6)` as a long — and the fold is integer addition,
  * which commutes and associates exactly. Partition order and merge order
  * (the nondeterminism class of Spark's own float `avg`) therefore cannot
  * change the result, and an external engine summing the same quantized
  * longs replays the mean bit-exactly: mean_i = (Σ floor(x_i·1e6)) / 1e6 / n
  * with both divisions in double. The 1e-6 input quantization is far below
  * any useful signal for a k-means coarse quantizer (the one consumer,
  * [[graft.operators.Ivf.kmeansCentroids]]); callers that need the
  * full-precision float mean (emb_centroids) keep the (label, dim)
  * formulation, where each dimension is averaged independently.
  *
  * Overflow headroom: |x| ≤ B ⇒ |sum| ≤ n · B · 1e6; at B = 1 that allows
  * ~9.2e12 vectors per group before Long overflow — beyond any single
  * cluster at 100 TB (and a group that large has bigger problems than its
  * mean).
  */
final case class VectorMeanAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[VectorMeanAgg.Buf] {

  import VectorMeanAgg.{Buf, Scale}

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  private val childFloat = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def createAggregationBuffer(): Buf = Buf(Array.emptyLongArray, 0L)

  override def update(buf: Buf, input: InternalRow): Buf = {
    val v = child.eval(input)
    if (v == null) buf
    else {
      val arr = v.asInstanceOf[ArrayData]
      val n = arr.numElements()
      val sums = if (buf.n == 0L) new Array[Long](n) else buf.sums
      require(sums.length == n,
        s"vector_mean: mixed dimensions (${sums.length} vs $n) in one group")
      var i = 0
      while (i < n) {
        val x = if (childFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
        sums(i) += math.floor(x * Scale).toLong
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
      // division order matters for bit-parity with the oracle's
      // CAST(sum AS DOUBLE) / 1e6 / n — keep it left-to-right
      while (i < out.length) { out(i) = buf.sums(i).toDouble / Scale / buf.n; i += 1 }
      UnsafeArrayData.fromPrimitiveArray(out)
    }

  override def serialize(buf: Buf): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 + 4 + buf.sums.length * 8)
    bb.putLong(buf.n)
    bb.putInt(buf.sums.length)
    buf.sums.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Buf = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getLong
    val len = bb.getInt
    Buf(Array.fill(len)(bb.getLong), n)
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
  /** Input quantization: floor(x · Scale) per element. Mirrored verbatim by
    * the knn_ivf oracle (`CAST(floor(x * 1e6) AS BIGINT)`) — change both or
    * neither. `floor` (not rint): DuckDB's round() is half-away-from-zero
    * while JVM rint is half-to-even, so floor is the only cheap function the
    * two engines compute identically at every representable input. */
  val Scale: Double = 1e6

  final case class Buf(sums: Array[Long], n: Long)

  def register(spark: SparkSession): Unit = NativeFunctions.register(spark)

  def mean(spark: SparkSession, vec: Column): Column = {
    register(spark)
    org.apache.spark.sql.functions.call_function("vector_mean", vec)
  }
}
