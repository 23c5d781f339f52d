package graft.plans

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types._

/** Native Catalyst expressions for the signature inner loops.
  *
  * The higher-order-function formulations in graft.functions.Hashes are
  * CodegenFallback AND allocate a lambda-dispatched object graph per slot —
  * ~numPerms × numShingles interpreted evals per row. These expressions do
  * the same math in one tight JVM loop per row over the unsafe string
  * bytes: one XXH64 string hash per shingle, then numPerms 8-byte re-hashes
  * with zero allocation. Same preference tier as the guide's "custom
  * Expression beats UDF": no SerDe boundary, null-safety and types handled
  * by Catalyst.
  */
final case class MinHashSig(child: Expression, numPerms: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"minhash_sig expects array<string>, got $other")
    }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val mins = Array.fill(numPerms)(Long.MaxValue)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i))
        // identical chain to the HOF formulation xxhash64(xxhash64(s), p):
        // string hashed once, then the shared per-perm chain (minUpdate) —
        // the two implementations are interchangeable (parity spec'd)
        NativeHashes.minUpdate(mins, XXH64.hashUTF8String(arr.getUTF8String(i), 42L))
      i += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(mins)
  }

  /** Same loop in generated Java via the shared static chain, so the
    * surrounding projection stays one WholeStageCodegen span
    * (CodegenFallback would break it). */
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val xxh = classOf[XXH64].getName
      val mins = ctx.freshName("mins")
      val i = ctx.freshName("i")
      s"""
         |long[] $mins = new long[$numPerms];
         |java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |for (int $i = 0; $i < $arr.numElements(); $i++) {
         |  if (!$arr.isNullAt($i)) {
         |    graft.plans.NativeHashes.minUpdate($mins, $xxh.hashUTF8String($arr.getUTF8String($i), 42L));
         |  }
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($mins);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
  override def prettyName: String = "minhash_sig"
}

/** 64-bit SimHash (Charikar '02) over an array<string> of tokens, one pass,
  * zero allocation beyond the vote array. */
final case class SimHashSig(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"simhash_sig expects array<string>, got $other")
    }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val votes = new Array[Int](64)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val h = XXH64.hashUTF8String(arr.getUTF8String(i), 42L)
        var k = 0
        while (k < 64) {
          votes(k) += (if (((h >>> k) & 1L) == 1L) 1 else -1)
          k += 1
        }
      }
      i += 1
    }
    var sig = 0L
    var k = 0
    while (k < 64) {
      if (votes(k) > 0) sig |= (1L << k)
      k += 1
    }
    java.lang.Long.valueOf(sig)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val xxh = classOf[XXH64].getName
      val votes = ctx.freshName("votes")
      val i = ctx.freshName("i")
      val k = ctx.freshName("k")
      val h = ctx.freshName("h")
      val sig = ctx.freshName("sig")
      s"""
         |int[] $votes = new int[64];
         |for (int $i = 0; $i < $arr.numElements(); $i++) {
         |  if (!$arr.isNullAt($i)) {
         |    long $h = $xxh.hashUTF8String($arr.getUTF8String($i), 42L);
         |    for (int $k = 0; $k < 64; $k++) {
         |      $votes[$k] += ((($h >>> $k) & 1L) == 1L) ? 1 : -1;
         |    }
         |  }
         |}
         |long $sig = 0L;
         |for (int $k = 0; $k < 64; $k++) {
         |  if ($votes[$k] > 0) $sig |= (1L << $k);
         |}
         |${ev.value} = $sig;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SimHashSig =
    copy(child = newChild)
  override def prettyName: String = "simhash_sig"
}

/** 60-bit SimHash whose per-token hash is the first 15 hex chars of
  * `md5(token)` — a hash BOTH engines implement identically, which is what
  * lets `dedup_simhash` graduate from rows-only to an exact DuckDB oracle
  * match (`('0x' || substr(md5(tok), 1, 15))::BIGINT`, then the same ±1
  * bit votes). 60 bits (not 64) so the value is always a non-negative
  * BIGINT on both sides — no sign-bit divergence between engines. One
  * native pass per row (thread-local MessageDigest, no per-token lambda
  * dispatch); the XXH64 [[SimHashSig]] stays the cheaper choice where no
  * cross-engine replay is needed. */
final case class Md5SimHashSig(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"md5_simhash expects array<string>, got $other")
    }

  override def nullSafeEval(input: Any): Any =
    java.lang.Long.valueOf(NativeHashes.md5Simhash(input.asInstanceOf[ArrayData]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev,
      arr => s"${ev.value} = graft.plans.NativeHashes.md5Simhash($arr);")

  override protected def withNewChildInternal(newChild: Expression): Md5SimHashSig =
    copy(child = newChild)
  override def prettyName: String = "md5_simhash"
}

/** Rolling polynomial (Karp-Rabin-style) document fingerprint over an
  * array<string> of tokens: `acc = (acc * 31 + md5prefix(token) mod M) mod M`
  * with M ≈ 1e15, order-sensitive (permuted docs fingerprint differently).
  * The md5-prefix token hash makes the whole chain replayable in DuckDB
  * (`list_reduce` over the same recurrence), so `text_fingerprint` is
  * exact-oracle-checked; bounds: acc < M ≈ 2^50, acc*31 + h < 3.3e16 —
  * no overflow on either engine's BIGINT. One native pass per row
  * (bit-equal to the HOF reference `Text.fingerprint`, parity spec'd). */
final case class Md5FingerprintExpr(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"md5_fingerprint expects array<string>, got $other")
    }

  override def nullSafeEval(input: Any): Any =
    java.lang.Long.valueOf(NativeHashes.md5Fingerprint(input.asInstanceOf[ArrayData]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev,
      arr => s"${ev.value} = graft.plans.NativeHashes.md5Fingerprint($arr);")

  override protected def withNewChildInternal(newChild: Expression): Md5FingerprintExpr =
    copy(child = newChild)
  override def prettyName: String = "md5_fingerprint"
}

/** Session registration + Column-facing wrappers. Registration is idempotent
  * and per-session (Spark 4 removed the public Column-from-Expression
  * constructor, so the registry + call_function is the supported route). */
object NativeHashes {

  /** The fingerprint modulus — shared with the HOF reference
    * (`Text.fpMod`) and embedded in the DuckDB oracle. */
  val FpMod = 1000000000000037L

  /** See [[Md5FingerprintExpr]]. Null tokens contribute nothing (skipped),
    * matching Spark's `aggregate` HOF semantics where the lambda output for
    * a null element would poison the whole accumulator otherwise. */
  def md5Fingerprint(arr: ArrayData): Long = {
    val md = md5Local.get()
    val n = arr.numElements()
    var acc = 0L
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val h = md5Token60(md, arr.getUTF8String(i)) % FpMod
        acc = (acc * 31L + h) % FpMod
      }
      i += 1
    }
    acc
  }

  private val md5Local = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Thread-local MD5 instance for sibling native expressions (NgramHashes'
    * gram walk) — one digest per executor thread, zero per-row allocation. */
  private[plans] def md5Digest: java.security.MessageDigest = md5Local.get()

  /** 60-bit md5-prefix token hash: the value DuckDB reads as
    * `('0x' || substr(md5(tok), 1, 15))::BIGINT` — 15 hex nibbles,
    * big-endian, built from the digest's first 8 bytes. */
  def md5Token60(md: java.security.MessageDigest, tok: org.apache.spark.unsafe.types.UTF8String): Long = {
    val b = tok.getBytes
    md5Prefix60(md, b, b.length)
  }

  /** [[md5Token60]] over a raw byte range — the form the native gram walk
    * uses so a reusable scratch buffer never has to become a UTF8String. */
  def md5Prefix60(md: java.security.MessageDigest, bytes: Array[Byte], len: Int): Long = {
    md.reset()
    md.update(bytes, 0, len)
    val d = md.digest()
    var v = 0L
    var j = 0
    while (j < 15) {
      val b = d(j / 2) & 0xFF
      v = (v << 4) | (if (j % 2 == 0) b >>> 4 else b & 0xF)
      j += 1
    }
    v
  }

  /** Mersenne prime 2^61 - 1 — the modulus of the replayable MinHash
    * permutation family. DuckDB replays `(a * g + b) mod p` exactly in
    * HUGEINT (128-bit) arithmetic; the JVM side uses [[mulmodP61]]. */
  val MersenneP61: Long = (1L << 61) - 1

  /** (a * b) mod (2^61 - 1) for 0 <= a, b < 2^61, exact, no allocation:
    * split the 128-bit product at bit 61 (product = q·2^61 + r) and use
    * 2^61 ≡ 1 (mod p), so product ≡ q + r. `multiplyHigh` gives the
    * product's high 64 bits (signed == unsigned here since both operands
    * are < 2^61). */
  def mulmodP61(a: Long, b: Long): Long = {
    val hi = Math.multiplyHigh(a, b)
    val lo = a * b
    // q = product >>> 61 = (hi << 3) | (lo >>> 61); disjoint bit ranges
    var s = ((hi << 3) | (lo >>> 61)) + (lo & MersenneP61)
    if (s >= MersenneP61) s -= MersenneP61
    if (s >= MersenneP61) s -= MersenneP61
    s
  }

  /** Deterministic affine-permutation tables (a_i, b_i) for the replayable
    * MinHash family, derived from md5 so DuckDB can derive the IDENTICAL
    * table in SQL: a_i = md5prefix60("minhash-a:i") + 1 (non-zero, < p),
    * b_i = md5prefix60("minhash-b:i"). Cached per size. */
  private val permCache =
    new java.util.concurrent.ConcurrentHashMap[Int, (Array[Long], Array[Long])]()
  def minhashPerms(numPerms: Int): (Array[Long], Array[Long]) =
    permCache.computeIfAbsent(numPerms, { _ =>
      val md = md5Local.get()
      val a = Array.tabulate(numPerms) { i =>
        md5Token60(md, org.apache.spark.unsafe.types.UTF8String.fromString(s"minhash-a:$i")) + 1L
      }
      val b = Array.tabulate(numPerms) { i =>
        md5Token60(md, org.apache.spark.unsafe.types.UTF8String.fromString(s"minhash-b:$i"))
      }
      (a, b)
    })

  /** See [[Md5SimHashSig]]. Vote rule: bit b of the signature is 1 iff
    * strictly more tokens have bit b set than clear (`sum(±1) > 0`) —
    * mirrored verbatim by the oracle's `CASE WHEN s > 0`. */
  def md5Simhash(arr: ArrayData): Long = {
    val md = md5Local.get()
    val n = arr.numElements()
    val votes = new Array[Int](60)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val h = md5Token60(md, arr.getUTF8String(i))
        var k = 0
        while (k < 60) {
          votes(k) += (if (((h >>> k) & 1L) == 1L) 1 else -1)
          k += 1
        }
      }
      i += 1
    }
    var sig = 0L
    var k = 0
    while (k < 60) {
      if (votes(k) > 0) sig |= (1L << k)
      k += 1
    }
    sig
  }

  /** THE per-gram minhash permutation chain — seed the gram hash
    * (hashLong(h, 42)), then fold hashInt(p, seeded) into each
    * permutation's running min. Single-sourced here because three call
    * sites must stay bit-identical for LSH banding and the memoized
    * near-dup pipeline to agree: MinHashSig's interpreted eval, its
    * generated Java (static call), and MinHashSigFromText. */
  def minUpdate(mins: Array[Long], gramHash: Long): Unit = {
    val hSeeded = XXH64.hashLong(gramHash, 42L)
    var p = 0
    while (p < mins.length) {
      val hp = XXH64.hashInt(p, hSeeded)
      if (hp < mins(p)) mins(p) = hp
      p += 1
    }
  }

  def register(spark: SparkSession): Unit = NativeFunctions.register(spark)

  def minhashMerge(spark: SparkSession, sig: Column): Column = {
    register(spark)
    call_function("minhash_merge", sig)
  }

  def minhashSig(spark: SparkSession, shingles: Column, numPerms: Int): Column = {
    register(spark)
    call_function("minhash_sig", shingles, org.apache.spark.sql.functions.lit(numPerms))
  }

  def simhashSig(spark: SparkSession, tokens: Column): Column = {
    register(spark)
    call_function("simhash_sig", tokens)
  }

  def md5SimhashSig(spark: SparkSession, tokens: Column): Column = {
    register(spark)
    call_function("md5_simhash", tokens)
  }

  def md5Fingerprint(spark: SparkSession, tokens: Column): Column = {
    register(spark)
    call_function("md5_fingerprint", tokens)
  }
}
