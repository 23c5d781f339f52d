package graft.plans

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types._

/** Product-quantization primitives (Jégou et al. '11, "Product Quantization
  * for Nearest Neighbor Search"): a vector is split into `m` subvectors,
  * each encoded as the index of its nearest sub-codebook centroid, so the
  * corpus is scanned in compressed form (m bytes per vector) and distances
  * are approximated per-subspace against the query (ADC — asymmetric
  * distance computation).
  *
  * The codebook rides the plan as a LITERAL array of m·K subvector
  * centroids (index s·K + c = centroid c of subspace s) — the same
  * shuffle-free shape as [[NearestCentroid]]: encode and ADC are per-row
  * math inside whole-stage codegen, no join or exchange anywhere in the
  * scan. All distance folds accumulate left-to-right in double, so a
  * DuckDB `list_reduce` replay is bit-identical and PQ queries can be
  * exact-oracle-checked.
  */

/** codes(s) = argmin over c of ‖vec[s·sub ..] − cb(s·K + c)‖² (ties → the
  * lowest c; strict Double.compare keeps NaN from ever winning). */
final case class PqEncodeExpr(left: Expression, right: Expression, m: Int)
    extends BinaryExpression {

  require(m >= 1, s"pq_encode needs m >= 1, got $m")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val vecOk = left.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _ => false
    }
    val cbOk = right.dataType match {
      case ArrayType(ArrayType(DoubleType, _), _) => true
      case _ => false
    }
    if (vecOk && cbOk)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"pq_encode expects (array<float|double>, array<array<double>>), " +
        s"got ${left.dataType}, ${right.dataType}")
  }

  private val lFloat = left.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val vec = l.asInstanceOf[ArrayData]
    val cb = r.asInstanceOf[ArrayData]
    Pq.checkShape(vec.numElements(), cb.numElements(), m)
    val sub = vec.numElements() / m
    val k = cb.numElements() / m
    val codes = new Array[Int](m)
    var s = 0
    while (s < m) {
      var best = -1
      var bestD = Double.PositiveInfinity
      var c = 0
      while (c < k) {
        val cent = Pq.centroid(cb, s * k + c, sub)
        var d = 0.0
        var i = 0
        while (i < sub) {
          val x = if (lFloat) vec.getFloat(s * sub + i).toDouble
            else vec.getDouble(s * sub + i)
          val diff = x - cent.getDouble(i)
          d += diff * diff
          i += 1
        }
        if (best < 0 || java.lang.Double.compare(d, bestD) < 0) {
          best = c
          bestD = d
        }
        c += 1
      }
      codes(s) = best
      s += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(codes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (vec, cb) => {
      val sub = ctx.freshName("sub")
      val k = ctx.freshName("k")
      val codes = ctx.freshName("codes")
      val s = ctx.freshName("s")
      val best = ctx.freshName("best")
      val bestD = ctx.freshName("bestD")
      val c = ctx.freshName("c")
      val cent = ctx.freshName("cent")
      val d = ctx.freshName("d")
      val i = ctx.freshName("i")
      val x = ctx.freshName("x")
      val diff = ctx.freshName("diff")
      val getX = if (lFloat) s"(double) $vec.getFloat($s * $sub + $i)"
        else s"$vec.getDouble($s * $sub + $i)"
      s"""
         |graft.plans.Pq.checkShape($vec.numElements(), $cb.numElements(), $m);
         |int $sub = $vec.numElements() / $m;
         |int $k = $cb.numElements() / $m;
         |int[] $codes = new int[$m];
         |for (int $s = 0; $s < $m; $s++) {
         |  int $best = -1;
         |  double $bestD = Double.POSITIVE_INFINITY;
         |  for (int $c = 0; $c < $k; $c++) {
         |    org.apache.spark.sql.catalyst.util.ArrayData $cent =
         |      graft.plans.Pq.centroid($cb, $s * $k + $c, $sub);
         |    double $d = 0.0;
         |    for (int $i = 0; $i < $sub; $i++) {
         |      double $x = $getX;
         |      double $diff = $x - $cent.getDouble($i);
         |      $d += $diff * $diff;
         |    }
         |    if ($best < 0 || Double.compare($d, $bestD) < 0) {
         |      $best = $c;
         |      $bestD = $d;
         |    }
         |  }
         |  $codes[$s] = $best;
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($codes);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): PqEncodeExpr =
    copy(left = l, right = r)
  override def prettyName: String = "pq_encode"
}

/** ADC distance: Σ_s ‖q[s·sub ..] − cb(s·K + codes(s))‖², subspaces
  * accumulated in ascending s with the same inner fold as the encoder —
  * the exact doubles a `list_reduce` over the per-subspace distances
  * (ordered by s) produces in the oracle. */
final case class PqAdcExpr(first: Expression, second: Expression, third: Expression, m: Int)
    extends TernaryExpression {

  require(m >= 1, s"pq_adc needs m >= 1, got $m")

  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val qOk = first.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _ => false
    }
    val codesOk = second.dataType match {
      case ArrayType(IntegerType, _) => true
      case _ => false
    }
    val cbOk = third.dataType match {
      case ArrayType(ArrayType(DoubleType, _), _) => true
      case _ => false
    }
    if (qOk && codesOk && cbOk)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"pq_adc expects (array<float|double>, array<int>, array<array<double>>), " +
        s"got ${first.dataType}, ${second.dataType}, ${third.dataType}")
  }

  private val qFloat = first.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def nullSafeEval(q: Any, cs: Any, cbv: Any): Any = {
    val vec = q.asInstanceOf[ArrayData]
    val codes = cs.asInstanceOf[ArrayData]
    val cb = cbv.asInstanceOf[ArrayData]
    Pq.checkShape(vec.numElements(), cb.numElements(), m)
    Pq.checkCodes(codes.numElements(), m)
    val sub = vec.numElements() / m
    val k = cb.numElements() / m
    var total = 0.0
    var s = 0
    while (s < m) {
      val cent = Pq.centroid(cb, s * k + Pq.code(codes, s, k), sub)
      var d = 0.0
      var i = 0
      while (i < sub) {
        val x = if (qFloat) vec.getFloat(s * sub + i).toDouble
          else vec.getDouble(s * sub + i)
        val diff = x - cent.getDouble(i)
        d += diff * diff
        i += 1
      }
      total += d
      s += 1
    }
    total
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (vec, codes, cb) => {
      val sub = ctx.freshName("sub")
      val k = ctx.freshName("k")
      val total = ctx.freshName("total")
      val s = ctx.freshName("s")
      val cent = ctx.freshName("cent")
      val d = ctx.freshName("d")
      val i = ctx.freshName("i")
      val x = ctx.freshName("x")
      val diff = ctx.freshName("diff")
      val getX = if (qFloat) s"(double) $vec.getFloat($s * $sub + $i)"
        else s"$vec.getDouble($s * $sub + $i)"
      s"""
         |graft.plans.Pq.checkShape($vec.numElements(), $cb.numElements(), $m);
         |graft.plans.Pq.checkCodes($codes.numElements(), $m);
         |int $sub = $vec.numElements() / $m;
         |int $k = $cb.numElements() / $m;
         |double $total = 0.0;
         |for (int $s = 0; $s < $m; $s++) {
         |  org.apache.spark.sql.catalyst.util.ArrayData $cent =
         |    graft.plans.Pq.centroid($cb, $s * $k + graft.plans.Pq.code($codes, $s, $k), $sub);
         |  double $d = 0.0;
         |  for (int $i = 0; $i < $sub; $i++) {
         |    double $x = $getX;
         |    double $diff = $x - $cent.getDouble($i);
         |    $d += $diff * $diff;
         |  }
         |  $total += $d;
         |}
         |${ev.value} = $total;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): PqAdcExpr =
    copy(first = f, second = s, third = t)
  override def prettyName: String = "pq_adc"
}

object Pq {
  def register(spark: SparkSession): Unit = NativeFunctions.register(spark)

  /** Loud shape validation shared by eval and generated code: pq_encode /
    * pq_adc are user-callable SQL functions (GraftExtensions), and a
    * malformed-but-well-typed call must error instead of reading unchecked
    * UnsafeArrayData offsets (which has no bounds check — garbage results
    * or worse). Called per row; a handful of branches next to the ~1k-flop
    * distance loops. */
  def checkShape(dims: Int, cbLen: Int, m: Int): Unit = {
    if (dims == 0 || dims % m != 0) throw new IllegalArgumentException(
      s"pq: vector of $dims dims is not a positive multiple of m=$m")
    if (cbLen == 0 || cbLen % m != 0) throw new IllegalArgumentException(
      s"pq: codebook of $cbLen entries is not a positive multiple of m=$m")
  }

  /** The codes array must carry exactly one entry per subspace. */
  def checkCodes(nCodes: Int, m: Int): Unit =
    if (nCodes != m) throw new IllegalArgumentException(
      s"pq: codes array has $nCodes entries, expected m=$m")

  /** Range-checked centroid index within a subspace. */
  def checkCode(code: Int, k: Int): Int = {
    if (code < 0 || code >= k) throw new IllegalArgumentException(
      s"pq: code $code out of range [0, $k)")
    code
  }

  /** Null- and dimension-checked sub-centroid fetch: UnsafeArrayData reads
    * past a short centroid would return garbage, and a null entry would
    * NPE without context. */
  def centroid(cb: ArrayData, idx: Int, sub: Int): ArrayData = {
    val cent = cb.getArray(idx)
    if (cent == null) throw new IllegalArgumentException(
      s"pq: null codebook centroid at index $idx")
    if (cent.numElements() != sub) throw new IllegalArgumentException(
      s"pq: centroid $idx has ${cent.numElements()} dims, expected $sub")
    cent
  }

  /** Null-checked code fetch (a null element would silently read as 0). */
  def code(codes: ArrayData, s: Int, k: Int): Int = {
    if (codes.isNullAt(s)) throw new IllegalArgumentException(
      s"pq: null code at subspace $s")
    checkCode(codes.getInt(s), k)
  }

  /** PQ codes: array<int> of length m (centroid index per subspace). */
  def encode(spark: SparkSession, vec: Column, codebook: Column, m: Int): Column = {
    register(spark)
    call_function("pq_encode", vec, codebook, org.apache.spark.sql.functions.lit(m))
  }

  /** ADC distance of a raw query vector against a coded corpus vector. */
  def adc(spark: SparkSession, qvec: Column, codes: Column, codebook: Column, m: Int): Column = {
    register(spark)
    call_function("pq_adc", qvec, codes, codebook, org.apache.spark.sql.functions.lit(m))
  }
}
