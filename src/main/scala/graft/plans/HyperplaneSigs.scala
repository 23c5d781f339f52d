package graft.plans

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
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
final case class HyperplaneSigsExpr(child: Expression, bits: Int, tables: Int)
    extends UnaryExpression with CodegenFallback {

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

  // planes(p)(j), built lazily for the first-seen dimensionality; benign
  // race (recomputation yields identical data)
  @transient private var planeDims: Int = -1
  @transient private var planes: Array[Array[Double]] = _

  private def planeMatrix(dims: Int): Array[Array[Double]] = {
    if (planeDims != dims) {
      val nPlanes = bits * tables
      val m = Array.ofDim[Double](nPlanes, dims)
      var p = 0
      while (p < nPlanes) {
        var j = 0
        while (j < dims) {
          // = xxhash64(j, p) in Spark's multi-arg chain (seed 42)
          val h = XXH64.hashInt(p, XXH64.hashInt(j, 42L))
          val mod = ((h % 1000000L) + 1000000L) % 1000000L
          m(p)(j) = mod.toDouble / 500000.0 - 1.0
          j += 1
        }
        p += 1
      }
      planes = m
      planeDims = dims
    }
    planes
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

  override protected def withNewChildInternal(newChild: Expression): HyperplaneSigsExpr =
    copy(child = newChild)
  override def prettyName: String = "hyperplane_sigs"
}

object HyperplaneSigs {

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction("hyperplane_sigs", {
      case Seq(c, b, t) => HyperplaneSigsExpr(c,
        b.eval(null).asInstanceOf[Number].intValue(),
        t.eval(null).asInstanceOf[Number].intValue())
      case other => throw new IllegalArgumentException(
        s"hyperplane_sigs(vec, bits, tables) expects 3 args, got ${other.size}")
    }, "built-in")

  /** Array of `tables` signatures (multi-table LSH). */
  def sigs(spark: SparkSession, vec: Column, bits: Int, tables: Int): Column = {
    register(spark)
    call_function("hyperplane_sigs", vec,
      org.apache.spark.sql.functions.lit(bits), org.apache.spark.sql.functions.lit(tables))
  }

  /** Single-table signature (element 0 of the one-table variant). */
  def sig(spark: SparkSession, vec: Column, bits: Int): Column =
    org.apache.spark.sql.functions.element_at(sigs(spark, vec, bits, 1), 1)
}
