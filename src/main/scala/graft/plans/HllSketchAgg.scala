package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._

/** REPLAYABLE HyperLogLog (Flajolet et al. 2007) as a mergeable aggregate —
  * the library-surface form of q_approx_distinct's register algebra, and
  * the fourth point on the cardinality spectrum next to `countDistinct`
  * (exact, value-set state), `bitmap_distinct` (exact, dense-domain fixed
  * state) and `bottomk_distinct`/KMV (approximate, k-hash state):
  * approximate with FIXED 512-byte state and a hash contract any engine
  * reproduces.
  *
  * The caller supplies the 48-bit hash (the md5-prefix family every graft
  * sketch uses), exactly like `bottomk_distinct` — keeping the hash OUT of
  * the aggregate is what makes the estimator cross-engine replayable:
  * bucket = top 9 bits (m = 512 registers, rsd ≈ 4.6%), rho = leading-zero
  * count of the low 39 bits + 1, registers max-merge (commutative,
  * idempotent, associative ⇒ partition- and retry-order-free, and dedupe
  * is free — duplicates land on the same register value).
  *
  * Scale shape: partial aggregation reduces every map task to ONE 512-byte
  * buffer per group before the exchange — the map-side-combined register
  * table q_approx_distinct builds with a groupBy, collapsed into a single
  * fixed-width blob (the exchange carries O(groups × 512 B), not
  * O(groups × 512 rows)).
  *
  * eval returns the full gate-checked report as a struct — the floored
  * estimate plus the sketch state summaries the oracle replays:
  * Σ2^-Mj folds as the exact integer Σ2^(50-Mj) (order-free), the raw
  * αm²2⁵⁰/S estimate is transcendental-free fixed-order IEEE, and the
  * small-range m·ln(m/V) branch floors to a whole count with ≥ 3×10⁹-ulp
  * boundary clearance over its entire 512-value input domain (measured —
  * immune to the Java/glibc ln last-ulp divergence, which hits 2 of the
  * 512 inputs).
  */
final case class HllSketchAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]] {

  private val m = 512

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = StructType(Seq(
    StructField("hll_parts", LongType, nullable = false),
    StructField("hll_small_range", BooleanType, nullable = false),
    StructField("hll_empty_regs", LongType, nullable = false),
    StructField("reg_checksum", LongType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"hll_distinct expects a 48-bit bigint hash, got ${child.dataType}")

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](m)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      require(h >= 0L && h < (1L << 48),
        s"hll_distinct: hash $h outside the 48-bit contract")
      val j = (h >>> 39).toInt
      val w = h & 549755813887L // low 39 bits
      // rho = leading zeros within 39 bits + 1; Long.toBinaryString-free:
      // 64-bit nlz minus the 25 bits above the field
      val rho = if (w == 0L) 40 else java.lang.Long.numberOfLeadingZeros(w) - 25 + 1
      if (rho > buf(j)) buf(j) = rho.toByte
    }
    buf
  }

  override def merge(b1: Array[Byte], b2: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < m) { if (b2(i) > b1(i)) b1(i) = b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Byte]): Any = {
    var sPresent = 0L
    var vEmpty = 0L
    var checksum = 0L
    var i = 0
    while (i < m) {
      val mj = buf(i)
      if (mj == 0) vEmpty += 1
      else { sPresent += 1L << (50 - mj); checksum += mj }
      i += 1
    }
    val sScaled = sPresent + vEmpty * 1125899906842624L // empty: 2^-0 → 2^50
    // identical literal op order to the query/oracle expression
    val raw = 0.7213 / (1.0 + 1.079 / 512.0) * 262144.0 *
      1125899906842624.0 / sScaled.toDouble
    val small = raw <= 1280.0 && vEmpty > 0
    val est = if (small) 512.0 * math.log(512.0 / vEmpty.toDouble) else raw
    InternalRow(math.floor(est).toLong, small, vEmpty, checksum)
  }

  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def withNewMutableAggBufferOffset(off: Int): HllSketchAgg =
    copy(mutableAggBufferOffset = off)
  override def withNewInputAggBufferOffset(off: Int): HllSketchAgg =
    copy(inputAggBufferOffset = off)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): HllSketchAgg =
    copy(child = c.head)
  override def prettyName: String = "hll_distinct"
}
