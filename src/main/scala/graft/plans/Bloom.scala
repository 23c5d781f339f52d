package graft.plans

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Bloom-filter semi-join pruning — the big-big join mechanic.
  *
  * When a selective predicate on the build side leaves a key set too large
  * to broadcast as an exact set but cheap to summarize, a Bloom filter of
  * the qualifying keys broadcast to the probe side prunes probe rows
  * BEFORE their shuffle: at 100 TB that is the difference between
  * exchanging the whole fact table and exchanging only the ~matching rows.
  * False positives cost nothing but wasted shuffle (the join still decides
  * membership exactly); false negatives are impossible, so query results
  * are bit-identical to the unpruned plan — which is exactly what the
  * oracle checks.
  *
  * Spark can inject this itself (`spark.sql.optimizer.runtimeFilter.*`)
  * when statistics line up; shipping it as an explicit aggregate +
  * predicate makes the filter a first-class REUSABLE artifact — build the
  * bloom once, persist it like the signature tables, and prefilter many
  * probe queries (the "stored semi-join filter" shape), independent of
  * optimizer heuristics.
  *
  * Layout: the serialized ARTIFACT is an 8-byte header (magic "GBF1" +
  * numHashes, both little-endian ints) followed by the bit words; bit i
  * lives in byte(8 + (i >>> 3)), bit (i & 7) — words are written
  * little-endian so the aggregate's long[] view and the probe's byte[]
  * view agree. k probe positions come from double hashing with two
  * splitmix64-finalized streams (h2 forced odd). Carrying k INSIDE the
  * artifact means a probe can never run with a different hash count than
  * the build (a larger k would silently produce false negatives — rows
  * wrongly pruned); the probe reads k from the header and validates the
  * magic, failing loudly on anything that isn't a bloom artifact.
  */
object Bloom {

  /** "GBF1" little-endian. */
  val Magic: Int = 0x31464247

  /** Header: int magic, int numHashes. */
  val HeaderBytes: Int = 8

  /** splitmix64 finalizer — full-avalanche 64-bit mix (public constant
    * set; same family as the xxh64 mixes used across plans). */
  @inline def mix(v: Long): Long = {
    var z = v
    z ^= (z >>> 30); z *= 0xbf58476d1ce4e5b9L
    z ^= (z >>> 27); z *= 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Membership probe against a HEADERED bloom artifact: k comes from the
    * artifact itself, so the probe cannot disagree with the build. Called
    * from interpreted eval AND from generated code (static call keeps the
    * surrounding whole-stage-codegen span alive). Loud on a missing magic
    * or an out-of-range k — corrupt filters must surface, not silently
    * prune (k too large ⇒ false negatives) or no-op (k = 0 ⇒ always true). */
  def mightContain(bloom: Array[Byte], value: Long): Boolean = {
    require(bloom.length > HeaderBytes && readIntLE(bloom, 0) == Magic,
      s"not a bloom artifact: ${bloom.length} bytes, bad magic")
    val numHashes = readIntLE(bloom, 4)
    require(numHashes >= 1 && numHashes <= 16,
      s"bloom artifact carries numHashes=$numHashes, expected 1..16")
    val numBits = (bloom.length - HeaderBytes).toLong << 3
    val h1 = mix(value)
    val h2 = mix(value ^ 0x9e3779b97f4a7c15L) | 1L
    var i = 0
    var h = h1
    while (i < numHashes) {
      val bit = ((h % numBits) + numBits) % numBits
      if ((bloom(HeaderBytes + (bit >>> 3).toInt) & (1 << (bit & 7).toInt)) == 0) return false
      h += h2
      i += 1
    }
    true
  }

  @inline private def readIntLE(b: Array[Byte], off: Int): Int =
    (b(off) & 0xFF) | ((b(off + 1) & 0xFF) << 8) |
      ((b(off + 2) & 0xFF) << 16) | ((b(off + 3) & 0xFF) << 24)

  /** Set the k bits for `value` in the aggregate's long[] word buffer
    * (same positions mightContain probes — little-endian word bytes). */
  def setBits(words: Array[Long], value: Long, numHashes: Int): Unit = {
    val numBits = words.length.toLong << 6
    val h1 = mix(value)
    val h2 = mix(value ^ 0x9e3779b97f4a7c15L) | 1L
    var i = 0
    var h = h1
    while (i < numHashes) {
      val bit = ((h % numBits) + numBits) % numBits
      words((bit >>> 6).toInt) |= (1L << (bit & 63))
      h += h2
      i += 1
    }
  }

  def wordsToBytes(words: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(words.length * 8).order(ByteOrder.LITTLE_ENDIAN)
    words.foreach(bb.putLong)
    bb.array()
  }

  /** The final artifact the aggregate evals: header + bit words. */
  def toArtifact(words: Array[Long], numHashes: Int): Array[Byte] = {
    val bb = ByteBuffer.allocate(HeaderBytes + words.length * 8)
      .order(ByteOrder.LITTLE_ENDIAN)
    bb.putInt(Magic).putInt(numHashes)
    words.foreach(bb.putLong)
    bb.array()
  }

  def register(spark: SparkSession): Unit = NativeFunctions.register(spark)

  /** One-row DataFrame holding the bloom of `keys` — crossJoin(broadcast(_))
    * it onto the probe side (the lm_score "corpus total" shape: the filter
    * rides the plan as a broadcast value, never a driver collect). */
  def build(spark: SparkSession, keys: DataFrame, keyCol: String,
      numBits: Int, numHashes: Int): DataFrame = {
    register(spark)
    import org.apache.spark.sql.functions._
    keys.agg(call_function("bloom_agg", col(keyCol), lit(numBits),
      lit(numHashes)).as("bloom"))
  }

  def contains(spark: SparkSession, bloom: Column, value: Column): Column = {
    register(spark)
    org.apache.spark.sql.functions.call_function("bloom_contains", bloom, value)
  }

  /** The bloom as a driver-held byte array — O(numBits/8), bounded by
    * construction like the IVF centroids and PQ codebooks, and embedded
    * the same way: as a plan LITERAL. The literal matters for throughput:
    * a bloom riding a broadcast ROW is re-copied out of its UnsafeRow by
    * every probe row's getBinary (measured ~3× on the probe scan at 16
    * KiB), while a literal is one object reference in the generated code. */
  def buildBytes(spark: SparkSession, keys: DataFrame, keyCol: String,
      numBits: Int, numHashes: Int): Array[Byte] = {
    import spark.implicits._
    build(spark, keys, keyCol, numBits, numHashes).as[Array[Byte]].head()
  }
}

/** Builds a Bloom filter over a LongType key column. Buffer is the word
  * array; map-side partial blooms merge by OR across the exchange — the
  * shuffle carries O(numBits), never the key set. */
final case class BloomFilterAgg(
    child: Expression,
    numBits: Int,
    numHashes: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  require(numBits >= 64 && (numBits & 63) == 0,
    s"bloom_agg: numBits must be a positive multiple of 64, got $numBits")
  require(numHashes >= 1 && numHashes <= 16,
    s"bloom_agg: numHashes must be in 1..16, got $numHashes")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bloom_agg expects a bigint key, got ${child.dataType}")

  override def createAggregationBuffer(): Array[Long] = new Array[Long](numBits >>> 6)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) Bloom.setBits(buf, v.asInstanceOf[Long], numHashes)
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < b1.length) { b1(i) |= b2(i); i += 1 }
    b1
  }

  // the RESULT carries the header (k rides the artifact to every probe);
  // serialize stays raw words — it's only the partial-buffer shuffle format
  // and round-trips through deserialize below
  override def eval(buf: Array[Long]): Any = Bloom.toArtifact(buf, numHashes)

  override def serialize(buf: Array[Long]): Array[Byte] = Bloom.wordsToBytes(buf)

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    Array.fill(bytes.length >>> 3)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(off: Int): BloomFilterAgg =
    copy(mutableAggBufferOffset = off)
  override def withNewInputAggBufferOffset(off: Int): BloomFilterAgg =
    copy(inputAggBufferOffset = off)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): BloomFilterAgg =
    copy(child = c.head)
  override def prettyName: String = "bloom_agg"
}

/** `bloom_contains(bloom, key)` probe predicate. The hash count comes from
  * the bloom artifact's header, so a probe can never run with a k the build
  * didn't use. Lives in the probe scan's filter — directly in the hottest
  * per-row path — so it generates a static call instead of falling back to
  * interpreted eval. */
final case class BloomMightContain(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = BooleanType

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bloom_contains expects (binary, bigint), got ${left.dataType}, ${right.dataType}")

  override def nullSafeEval(bloom: Any, value: Any): Any =
    java.lang.Boolean.valueOf(Bloom.mightContain(
      bloom.asInstanceOf[Array[Byte]], value.asInstanceOf[Long]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (b, v) =>
      s"${ev.value} = graft.plans.Bloom.mightContain($b, $v);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): BloomMightContain =
    copy(left = l, right = r)
  override def prettyName: String = "bloom_contains"
}
