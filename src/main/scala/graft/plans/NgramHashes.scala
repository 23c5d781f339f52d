package graft.plans

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** text → DISTINCT XXH64-hashed word k-grams, one native pass.
  *
  * Bit-equal to `array_distinct(transform(Text.wordShingles(text, k),
  * xxhash64))` (parity spec'd), but that formulation is three interpreted
  * higher-order functions back to back — per-element lambda dispatch for the
  * shingle build AND the hash AND an O(n²)-ish string `array_distinct` —
  * which measured ~8 s of the sf0.1 set-similarity join. This expression
  * tokenizes the string once, hashes each k-window from a reusable scratch
  * buffer, and dedupes longs, with `doGenCode` delegating to one static call
  * so the surrounding whole-stage span stays intact.
  */
final case class NgramHashesExpr(child: Expression, k: Int)
    extends UnaryExpression {

  require(k >= 1, s"ngram_hashes needs k >= 1, got $k")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"ngram_hashes expects string, got $other")
    }

  override def nullSafeEval(input: Any): Any =
    NgramHashes.compute(input.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev,
      c => s"${ev.value} = graft.plans.NgramHashes.compute($c, $k);")

  override protected def withNewChildInternal(newChild: Expression): NgramHashesExpr =
    copy(child = newChild)
  override def prettyName: String = "ngram_hashes"
}

/** text → MinHash signature in one native pass: the gram hashes from
  * `NgramHashes.compute` are exactly the `XXH64.hashUTF8String(gram, 42)`
  * value MinHashSig computes per shingle, so chaining the per-permutation
  * re-hash onto them is BIT-IDENTICAL to
  * `minhash_sig(Text.wordShingles(text, k), numPerms)` (parity spec'd) —
  * while skipping the interpreted shingle-building HOF chain entirely.
  * Duplicate grams can't change a min, so NgramHashes' dedup is free
  * candidate pruning. This is the signature map phase — the dominant
  * linear cost of every near-dup pass at corpus scale — as one codegen'd
  * static call. */
final case class MinHashSigFromText(child: Expression, k: Int, numPerms: Int)
    extends UnaryExpression {

  require(k >= 1 && numPerms >= 1, s"ngram_minhash needs k,perms >= 1, got $k/$numPerms")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"ngram_minhash expects string, got $other")
    }

  override def nullSafeEval(input: Any): Any =
    NgramHashes.minhashFromText(input.asInstanceOf[UTF8String], k, numPerms)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev,
      c => s"${ev.value} = graft.plans.NgramHashes.minhashFromText($c, $k, $numPerms);")

  override protected def withNewChildInternal(newChild: Expression): MinHashSigFromText =
    copy(child = newChild)
  override def prettyName: String = "ngram_minhash"
}

/** MinHash signature → LSH band-bucket keys, natively: bucket b = an XXH64
  * fold of band index + the band's `rowsPerBand` signature slots. Replaces
  * the interpreted per-band transform/concat/string-hash chain — two docs
  * share bucket b iff their signatures agree on every slot of band b
  * (modulo 64-bit collisions), which is the only property LSH banding
  * needs, so the hash need not (and does not) match the HOF formulation's
  * string-concat hash. */
final case class LshBandsExpr(child: Expression, bands: Int, rowsPerBand: Int)
    extends UnaryExpression {

  require(bands >= 1 && rowsPerBand >= 1,
    s"lsh_bands needs bands,rowsPerBand >= 1, got $bands/$rowsPerBand")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"lsh_bands expects array<long>, got $other")
    }

  override def nullSafeEval(input: Any): Any =
    NgramHashes.lshBands(
      input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], bands, rowsPerBand)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev,
      c => s"${ev.value} = graft.plans.NgramHashes.lshBands($c, $bands, $rowsPerBand);")

  override protected def withNewChildInternal(newChild: Expression): LshBandsExpr =
    copy(child = newChild)
  override def prettyName: String = "lsh_bands"
}

/** text → MinHash signature whose whole chain is replayable in DuckDB:
  * gram hash = 60-bit md5 prefix of the k-word shingle (the value DuckDB
  * reads as `('0x' || substr(md5(gram), 1, 15))::BIGINT`), permutation i =
  * `(a_i · g + b_i) mod (2^61 − 1)` with md5-derived (a_i, b_i)
  * ([[NativeHashes.minhashPerms]]) — all exact integer math both engines
  * implement identically (HUGEINT on the DuckDB side), which is what lets
  * the minhash-family queries graduate from rows-only to exact oracle
  * checks. Same one-native-pass scale shape as [[MinHashSigFromText]];
  * the XXH64 variant stays the cheaper choice where no cross-engine
  * replay is needed. Affine-mod-prime is the textbook MinHash permutation
  * family, so estimator quality is unchanged. */
final case class Md5MinHashFromText(child: Expression, k: Int, numPerms: Int)
    extends UnaryExpression {

  require(k >= 1 && numPerms >= 1,
    s"ngram_minhash_md5 needs k,perms >= 1, got $k/$numPerms")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"ngram_minhash_md5 expects string, got $other")
    }

  override def nullSafeEval(input: Any): Any =
    NgramHashes.md5MinhashFromText(input.asInstanceOf[UTF8String], k, numPerms)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev,
      c => s"${ev.value} = graft.plans.NgramHashes.md5MinhashFromText($c, $k, $numPerms);")

  override protected def withNewChildInternal(newChild: Expression): Md5MinHashFromText =
    copy(child = newChild)
  override def prettyName: String = "ngram_minhash_md5"
}

/** text → ALL word k-grams as STRINGS, one native pass — the
  * frequency-counting sibling of [[NgramHashesExpr]] (duplicates kept,
  * document order preserved, values bit-equal to `Text.wordShingles`).
  * Serves corpus n-gram statistics (`text_top_ngrams`), where counts need
  * per-occurrence multiplicity and the top-k tie-break needs the gram
  * string itself. */
final case class WordShinglesExpr(child: Expression, k: Int)
    extends UnaryExpression {

  require(k >= 1, s"word_shingles needs k >= 1, got $k")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"word_shingles expects string, got $other")
    }

  override def nullSafeEval(input: Any): Any =
    NgramHashes.gramStrings(input.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev,
      c => s"${ev.value} = graft.plans.NgramHashes.gramStrings($c, $k);")

  override protected def withNewChildInternal(newChild: Expression): WordShinglesExpr =
    copy(child = newChild)
  override def prettyName: String = "word_shingles"
}

/** text → distinct XXH64 hashes of every n-BYTE character window — the
  * pg_trgm posting unit for the trigram inverted index behind
  * `text_trgm_search`. Byte windows (not codepoint windows): hashing is
  * closed under any consistent windowing rule, and the only property the
  * index needs is "P substring of T ⇒ gramset(P) ⊆ gramset(T)", which
  * byte windows give on any UTF-8 text with no decode pass. No
  * lowercasing/trimming — substring search is exact-match semantics.
  * Text shorter than n emits NO grams (it cannot contain an n+ byte
  * pattern), so short docs simply have no postings. */
final case class CharGramHashesExpr(child: Expression, n: Int)
    extends UnaryExpression {

  require(n >= 2, s"chargram_hashes needs n >= 2, got $n")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"chargram_hashes expects string, got $other")
    }

  override def nullSafeEval(input: Any): Any =
    NgramHashes.charGramsCompute(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev,
      c => s"${ev.value} = graft.plans.NgramHashes.charGramsCompute($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): CharGramHashesExpr =
    copy(child = newChild)
  override def prettyName: String = "chargram_hashes"
}

object NgramHashes {

  /** Distinct XXH64(seed 42) of each n-byte sliding window of the RAW
    * UTF-8 bytes (no normalization) — see [[CharGramHashesExpr]]. */
  def charGramsCompute(text: UTF8String, n: Int): UnsafeArrayData = {
    val b = text.getBytes
    val nGrams = b.length - n + 1
    if (nGrams <= 0) return UnsafeArrayData.fromPrimitiveArray(Array.emptyLongArray)
    val seen = new java.util.HashSet[java.lang.Long]()
    val out = new Array[Long](nGrams)
    var nOut = 0
    var i = 0
    while (i < nGrams) {
      val h = XXH64.hashUnsafeBytes(b, Platform.BYTE_ARRAY_OFFSET + i, n, 42L)
      if (seen.add(h)) { out(nOut) = h; nOut += 1 }
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(
      if (nOut == nGrams) out else java.util.Arrays.copyOf(out, nOut))
  }

  /** Token byte boundaries of a lowered+trimmed text, with Spark SQL
    * `split("\\s+", -1)` semantics: a leading OR trailing whitespace run
    * yields an empty token at that end (unlike Java's String.split, which
    * drops trailing empties), and an empty string yields one empty token.
    * \s chars are ASCII, so multi-byte UTF-8 sequences can never be split. */
  private[plans] def tokenBounds(b: Array[Byte])
      : (java.util.ArrayList[Integer], java.util.ArrayList[Integer]) = {
    @inline def isWs(c: Byte): Boolean =
      c == ' ' || c == '\t' || c == '\n' || c == 0x0B || c == '\f' || c == '\r'
    val starts = new java.util.ArrayList[Integer]()
    val ends = new java.util.ArrayList[Integer]()
    if (b.length == 0) { starts.add(0); ends.add(0) }
    else {
      if (isWs(b(0))) { starts.add(0); ends.add(0) }
      var i = 0
      while (i < b.length) {
        while (i < b.length && isWs(b(i))) i += 1
        if (i < b.length) {
          val s = i
          while (i < b.length && !isWs(b(i))) i += 1
          starts.add(s); ends.add(i)
        }
      }
      if (isWs(b(b.length - 1))) { starts.add(b.length); ends.add(b.length) }
    }
    (starts, ends)
  }

  /** Mirrors lower → trim(' ') → split("\\s+") → k-windows joined with ' '
    * → xxhash64(seed 42) → first-occurrence distinct, so values (not just
    * set semantics) match the HOF reference chain. */
  def compute(text: UTF8String, k: Int): UnsafeArrayData = {
    val b = text.toLowerCase.trim().getBytes
    val (starts, ends) = tokenBounds(b)
    val n = starts.size()
    val nGrams = if (n < k) 1 else n - k + 1
    val window = math.min(k, n)
    val scratch = new Array[Byte](b.length + n) // upper bound incl. joiners
    val seen = new java.util.HashSet[java.lang.Long]()
    val out = new Array[Long](nGrams)
    var nOut = 0
    var w = 0
    while (w < nGrams) {
      var len = 0
      var t = w
      while (t < w + window) {
        if (t > w) { scratch(len) = ' '; len += 1 }
        val s = starts.get(t); val e = ends.get(t)
        System.arraycopy(b, s, scratch, len, e - s)
        len += e - s
        t += 1
      }
      val h = XXH64.hashUnsafeBytes(scratch, Platform.BYTE_ARRAY_OFFSET, len, 42L)
      if (seen.add(h)) { out(nOut) = h; nOut += 1 }
      w += 1
    }
    UnsafeArrayData.fromPrimitiveArray(
      if (nOut == nGrams) out else java.util.Arrays.copyOf(out, nOut))
  }

  /** text → ALL word k-grams as strings — duplicates kept, document order
    * preserved — bit-equal to `Text.wordShingles(text, k)` (parity spec'd)
    * but one native pass instead of the interpreted
    * sequence/transform/slice/concat_ws chain (~µs per ELEMENT). This is
    * the frequency-counting sibling of [[compute]]: counting needs
    * multiplicity, and top-k tie-breaks need the gram STRING, so the
    * distinct-hash form can't serve corpus n-gram statistics. */
  def gramStrings(text: UTF8String, k: Int)
      : org.apache.spark.sql.catalyst.util.GenericArrayData = {
    val b = text.toLowerCase.trim().getBytes
    val (starts, ends) = tokenBounds(b)
    val n = starts.size()
    val nGrams = if (n < k) 1 else n - k + 1
    val window = math.min(k, n)
    val scratch = new Array[Byte](b.length + n)
    val out = new Array[AnyRef](nGrams)
    var w = 0
    while (w < nGrams) {
      var len = 0
      var t = w
      while (t < w + window) {
        if (t > w) { scratch(len) = ' '; len += 1 }
        val s = starts.get(t); val e = ends.get(t)
        System.arraycopy(b, s, scratch, len, e - s)
        len += e - s
        t += 1
      }
      out(w) = UTF8String.fromBytes(java.util.Arrays.copyOf(scratch, len))
      w += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** Gram hashes → MinHash mins via the single-sourced permutation chain
    * (NativeHashes.minUpdate). */
  def minhashFromText(text: UTF8String, k: Int, numPerms: Int): UnsafeArrayData = {
    val grams = compute(text, k)
    val n = grams.numElements()
    val mins = Array.fill(numPerms)(Long.MaxValue)
    var i = 0
    while (i < n) {
      NativeHashes.minUpdate(mins, grams.getLong(i))
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(mins)
  }

  /** See [[Md5MinHashFromText]]. Same gram walk as [[compute]] (identical
    * tokenization + k-window join, so the DuckDB shingle replay used by the
    * jaccard oracle applies verbatim), but the gram hash is the 60-bit md5
    * prefix and the permutations are affine mod 2^61−1. Duplicate grams are
    * NOT dedup'd — a duplicate can never change a min, so the HashSet the
    * XXH64 path needs for its distinct-array contract is pure overhead
    * here. Every doc yields ≥ 1 gram (empty text → one empty token), so no
    * Long.MaxValue sentinel ever escapes. */
  def md5MinhashFromText(text: UTF8String, k: Int, numPerms: Int): UnsafeArrayData = {
    val (pa, pb) = NativeHashes.minhashPerms(numPerms)
    val md = NativeHashes.md5Digest
    val b = text.toLowerCase.trim().getBytes
    val (starts, ends) = tokenBounds(b)
    val n = starts.size()
    val nGrams = if (n < k) 1 else n - k + 1
    val window = math.min(k, n)
    val scratch = new Array[Byte](b.length + n)
    val mins = Array.fill(numPerms)(Long.MaxValue)
    var w = 0
    while (w < nGrams) {
      var len = 0
      var t = w
      while (t < w + window) {
        if (t > w) { scratch(len) = ' '; len += 1 }
        val s = starts.get(t); val e = ends.get(t)
        System.arraycopy(b, s, scratch, len, e - s)
        len += e - s
        t += 1
      }
      val g = NativeHashes.md5Prefix60(md, scratch, len)
      var i = 0
      while (i < numPerms) {
        var v = NativeHashes.mulmodP61(pa(i), g) + pb(i)
        if (v >= NativeHashes.MersenneP61) v -= NativeHashes.MersenneP61
        if (v < mins(i)) mins(i) = v
        i += 1
      }
      w += 1
    }
    UnsafeArrayData.fromPrimitiveArray(mins)
  }

  /** Band b folds its slots left-to-right: acc = hashLong(slot, acc),
    * seeded with hashInt(b, 42) so identical content in DIFFERENT bands
    * lands in different buckets. */
  def lshBands(sig: org.apache.spark.sql.catalyst.util.ArrayData,
      bands: Int, rowsPerBand: Int): UnsafeArrayData = {
    // loud, not lenient: a short signature would make the out-of-range
    // bands fold nothing and emit ONE GLOBAL bucket shared by the whole
    // corpus — the bucket join then degenerates to an O(n²) self-join
    require(sig.numElements() >= bands * rowsPerBand,
      s"lsh_bands: signature has ${sig.numElements()} slots, " +
        s"need bands*rowsPerBand = ${bands * rowsPerBand}")
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var acc = XXH64.hashInt(b, 42L)
      var r = 0
      while (r < rowsPerBand) {
        acc = XXH64.hashLong(sig.getLong(b * rowsPerBand + r), acc)
        r += 1
      }
      out(b) = acc
      b += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  def register(spark: SparkSession): Unit = NativeFunctions.register(spark)

  def hashes(spark: SparkSession, text: Column, k: Int): Column = {
    register(spark)
    call_function("ngram_hashes", text, org.apache.spark.sql.functions.lit(k))
  }

  def shingles(spark: SparkSession, text: Column, k: Int): Column = {
    register(spark)
    call_function("word_shingles", text, org.apache.spark.sql.functions.lit(k))
  }

  def minhash(spark: SparkSession, text: Column, k: Int, numPerms: Int): Column = {
    register(spark)
    call_function("ngram_minhash", text,
      org.apache.spark.sql.functions.lit(k), org.apache.spark.sql.functions.lit(numPerms))
  }

  def charGrams(spark: SparkSession, text: Column, n: Int): Column = {
    register(spark)
    call_function("chargram_hashes", text, org.apache.spark.sql.functions.lit(n))
  }

  def minhashMd5(spark: SparkSession, text: Column, k: Int, numPerms: Int): Column = {
    register(spark)
    call_function("ngram_minhash_md5", text,
      org.apache.spark.sql.functions.lit(k), org.apache.spark.sql.functions.lit(numPerms))
  }

  def bands(spark: SparkSession, sig: Column, bands: Int, rowsPerBand: Int): Column = {
    register(spark)
    call_function("lsh_bands", sig,
      org.apache.spark.sql.functions.lit(bands), org.apache.spark.sql.functions.lit(rowsPerBand))
  }
}
