package graft.plans

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types._

/** Native multi-table random-hyperplane LSH signature over an Array[Float]
  * embedding — bit-identical to `graft.functions.Vectors.hyperplaneSigs`
  * (parity spec'd), but with the plane matrix DERIVED ONCE per expression
  * instance instead of re-hashing (dim, plane) for every row: the HOF
  * formulation spends ~tables×bits×dims hash evaluations per row; this
  * spends tables×bits×dims multiply-adds against a cached matrix.
  *
  * Plane component (j, p) = pmod(xxhash64(j, p), 1e6)/5e5 - 1 — the same
  * deterministic hash-derived pseudo-randomness, so every executor
  * materializes an identical matrix with no driver state or broadcast.
  */
final case class HyperplaneSigsExpr(child: Expression, bits: Int, tables: Int,
    md5Planes: Boolean = false)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"hyperplane_sigs expects array<float|double>, got $other")
    }

  private val isFloat = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  // planes(p)(j), built lazily for the first-seen dimensionality. The
  // (dims, matrix) pair lives in ONE immutable reference so a concurrent
  // rebuild (shared instance across threads, or interleaved dims) can never
  // hand a caller a matrix of the wrong shape: each call validates + returns
  // its own local, and Tuple2's final fields give safe publication. A lost
  // race just rebuilds identical data.
  @transient private var cached: (Int, Array[Array[Double]]) = _

  /** Public: the generated code calls this through a reference object. */
  def planeMatrix(dims: Int): Array[Array[Double]] = {
    val c = cached
    if (c != null && c._1 == dims) c._2
    else {
      val nPlanes = bits * tables
      val m =
        if (md5Planes) HyperplaneSigs.md5PlaneMatrix(nPlanes, dims)
        else {
          // XXH64 family: component (p, j) = xxhash64(j, p) in Spark's
          // multi-arg chain (seed 42); signed hash, so the double mod.
          val x = Array.ofDim[Double](nPlanes, dims)
          var p = 0
          while (p < nPlanes) {
            var j = 0
            while (j < dims) {
              val h = XXH64.hashInt(p, XXH64.hashInt(j, 42L))
              val mod = ((h % 1000000L) + 1000000L) % 1000000L
              x(p)(j) = mod.toDouble / 500000.0 - 1.0
              j += 1
            }
            p += 1
          }
          x
        }
      cached = (dims, m)
      m
    }
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val dims = arr.numElements()
    val m = planeMatrix(dims)
    val vec = new Array[Double](dims)
    var j = 0
    while (j < dims) {
      vec(j) = if (isFloat) arr.getFloat(j).toDouble else arr.getDouble(j)
      j += 1
    }
    val sigs = new Array[Long](tables)
    var t = 0
    while (t < tables) {
      var sig = 0L
      var p0 = 0
      while (p0 < bits) {
        val plane = m(t * bits + p0)
        var proj = 0.0
        var k = 0
        while (k < dims) { proj += vec(k) * plane(k); k += 1 }
        if (proj >= 0) sig |= (1L << p0)
        p0 += 1
      }
      sigs(t) = sig
      t += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(sigs)
  }

  /** Same loops in generated Java; the cached plane matrix is reached via a
    * reference object to this instance (the standard route for per-instance
    * state in whole-stage codegen). */
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val self = ctx.addReferenceObj("hyperplaneSigs", this,
        classOf[HyperplaneSigsExpr].getName)
      val dims = ctx.freshName("dims")
      val m = ctx.freshName("m")
      val vec = ctx.freshName("vec")
      val sigs = ctx.freshName("sigs")
      val j = ctx.freshName("j")
      val t = ctx.freshName("t")
      val p = ctx.freshName("p")
      val k = ctx.freshName("k")
      val sig = ctx.freshName("sig")
      val proj = ctx.freshName("proj")
      val plane = ctx.freshName("plane")
      val get = if (isFloat) s"(double) $arr.getFloat($j)" else s"$arr.getDouble($j)"
      s"""
         |int $dims = $arr.numElements();
         |double[][] $m = $self.planeMatrix($dims);
         |double[] $vec = new double[$dims];
         |for (int $j = 0; $j < $dims; $j++) $vec[$j] = $get;
         |long[] $sigs = new long[$tables];
         |for (int $t = 0; $t < $tables; $t++) {
         |  long $sig = 0L;
         |  for (int $p = 0; $p < $bits; $p++) {
         |    double[] $plane = $m[$t * $bits + $p];
         |    double $proj = 0.0;
         |    for (int $k = 0; $k < $dims; $k++) $proj += $vec[$k] * $plane[$k];
         |    if ($proj >= 0) $sig |= (1L << $p);
         |  }
         |  $sigs[$t] = $sig;
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($sigs);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): HyperplaneSigsExpr =
    copy(child = newChild)
  override def prettyName: String = "hyperplane_sigs"
}

/** Native Johnson–Lindenstrauss random projection: the same md5-derived
  * plane family as [[HyperplaneSigsExpr]] (`md5Planes = true`), but
  * returning the raw projection VALUES — proj(p) = Σ_k vec(k)·plane(p)(k)
  * in array order — instead of sign bits. The left-fold of float→double
  * products is the identical IEEE op sequence DuckDB's `list_reduce`
  * replay runs, so projections are bit-identical cross-engine and the
  * query hash-matches its oracle.
  */
final case class ProjectPlanesExpr(child: Expression, nPlanes: Int)
    extends UnaryExpression {

  require(nPlanes >= 1, s"project_planes needs nPlanes >= 1, got $nPlanes")

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"project_planes expects array<float|double>, got $other")
    }

  private val isFloat = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  // same single-reference publication discipline as HyperplaneSigsExpr
  @transient private var cached: (Int, Array[Array[Double]]) = _

  /** Public: the generated code calls this through a reference object.
    * Delegates to the ONE shared md5 builder — the sign-consistency
    * invariant with hyperplane_sigs_md5 requires bit-identical planes. */
  def planeMatrix(dims: Int): Array[Array[Double]] = {
    val c = cached
    if (c != null && c._1 == dims) c._2
    else {
      val m = HyperplaneSigs.md5PlaneMatrix(nPlanes, dims)
      cached = (dims, m)
      m
    }
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val dims = arr.numElements()
    val m = planeMatrix(dims)
    val out = new Array[Double](nPlanes)
    var p = 0
    while (p < nPlanes) {
      val plane = m(p)
      var proj = 0.0
      var k = 0
      while (k < dims) {
        proj += (if (isFloat) arr.getFloat(k).toDouble else arr.getDouble(k)) * plane(k)
        k += 1
      }
      out(p) = proj
      p += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val self = ctx.addReferenceObj("projectPlanes", this,
        classOf[ProjectPlanesExpr].getName)
      val dims = ctx.freshName("dims")
      val m = ctx.freshName("m")
      val out = ctx.freshName("out")
      val p = ctx.freshName("p")
      val k = ctx.freshName("k")
      val proj = ctx.freshName("proj")
      val plane = ctx.freshName("plane")
      val get = if (isFloat) s"(double) $arr.getFloat($k)" else s"$arr.getDouble($k)"
      s"""
         |int $dims = $arr.numElements();
         |double[][] $m = $self.planeMatrix($dims);
         |double[] $out = new double[$nPlanes];
         |for (int $p = 0; $p < $nPlanes; $p++) {
         |  double[] $plane = $m[$p];
         |  double $proj = 0.0;
         |  for (int $k = 0; $k < $dims; $k++) $proj += $get * $plane[$k];
         |  $out[$p] = $proj;
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): ProjectPlanesExpr =
    copy(child = newChild)
  override def prettyName: String = "project_planes"
}

object HyperplaneSigs {

  def register(spark: SparkSession): Unit = NativeFunctions.register(spark)

  /** The md5-derived plane matrix — the ONE builder both
    * [[HyperplaneSigsExpr]] (`md5Planes = true`) and [[ProjectPlanesExpr]]
    * materialize, so the cross-expression sign-consistency invariant and
    * the cross-engine oracle replay can never drift between copies:
    * component (p, j) = md5prefix60("plane:p:j") mod 1e6 / 5e5 − 1
    * (md5Token60 is 60-bit non-negative, so the plain mod suffices). */
  def md5PlaneMatrix(nPlanes: Int, dims: Int): Array[Array[Double]] = {
    val m = Array.ofDim[Double](nPlanes, dims)
    val md = NativeHashes.md5Digest
    var p = 0
    while (p < nPlanes) {
      var j = 0
      while (j < dims) {
        val h = NativeHashes.md5Token60(md,
          org.apache.spark.unsafe.types.UTF8String.fromString(s"plane:$p:$j"))
        m(p)(j) = (h % 1000000L).toDouble / 500000.0 - 1.0
        j += 1
      }
      p += 1
    }
    m
  }

  /** Array of `tables` signatures (multi-table LSH). */
  def sigs(spark: SparkSession, vec: Column, bits: Int, tables: Int): Column = {
    register(spark)
    call_function("hyperplane_sigs", vec,
      org.apache.spark.sql.functions.lit(bits), org.apache.spark.sql.functions.lit(tables))
  }

  /** The DuckDB-replayable plane family (md5-derived components, identical
    * double math on both engines) — what the oracle-checked LSH queries
    * use. Projection/sign/signature layout is the same as [[sigs]]. */
  def sigsMd5(spark: SparkSession, vec: Column, bits: Int, tables: Int): Column = {
    register(spark)
    call_function("hyperplane_sigs_md5", vec,
      org.apache.spark.sql.functions.lit(bits), org.apache.spark.sql.functions.lit(tables))
  }

  /** Single-table signature (element 0 of the one-table variant). */
  def sig(spark: SparkSession, vec: Column, bits: Int): Column =
    org.apache.spark.sql.functions.element_at(sigs(spark, vec, bits, 1), 1)

  /** Raw md5-plane projection values (JL dimensionality reduction) — the
    * un-signed form of [[sigsMd5]]'s projections, DuckDB-replayable. */
  def project(spark: SparkSession, vec: Column, nPlanes: Int): Column = {
    register(spark)
    call_function("project_planes", vec, org.apache.spark.sql.functions.lit(nPlanes))
  }
}
