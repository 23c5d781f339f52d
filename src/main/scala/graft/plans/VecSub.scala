package graft.plans

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types._

/** Elementwise vector subtraction, `a − b`, as a codegen'd expression —
  * the residual step of IVF-PQ (`knn_ivfpq`): after coarse assignment the
  * corpus vector is re-expressed relative to its cluster centroid and the
  * RESIDUAL is PQ-coded (Jégou et al. '11 §III — residual codebooks carry
  * far more resolution than raw-vector codebooks at the same byte budget).
  *
  * A `zip_with` lambda computes the same values, but this sits on the
  * full-corpus encode path, and the repo's contract is that corpus-scan
  * map phases stay inside whole-stage codegen (no interpreted
  * higher-order functions in hot paths). Each element is one IEEE double
  * subtraction — no fold, no accumulation order — so the DuckDB replay
  * (`list_transform(range(n), i -> a[i+1] - b[i+1])`) is trivially
  * bit-identical.
  */
final case class VecSub(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def vecOk(dt: DataType) = dt match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (vecOk(left.dataType) && vecOk(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"vec_sub expects (array<float|double>, array<float|double>), " +
        s"got ${left.dataType}, ${right.dataType}")
  }

  private val lFloat = left.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
  private val rFloat = right.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    VecSub.checkDims(a.numElements(), b.numElements())
    val n = a.numElements()
    val out = new Array[Double](n)
    var i = 0
    while (i < n) {
      val x = if (lFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (rFloat) b.getFloat(i).toDouble else b.getDouble(i)
      out(i) = x - y
      i += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      val i = ctx.freshName("i")
      val getX = if (lFloat) s"(double) $a.getFloat($i)" else s"$a.getDouble($i)"
      val getY = if (rFloat) s"(double) $b.getFloat($i)" else s"$b.getDouble($i)"
      s"""
         |graft.plans.VecSub.checkDims($a.numElements(), $b.numElements());
         |int $n = $a.numElements();
         |double[] $out = new double[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  $out[$i] = $getX - $getY;
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): VecSub =
    copy(left = l, right = r)
  override def prettyName: String = "vec_sub"
}

object VecSub {
  /** Loud shape check shared by eval and codegen — vec_sub is a
    * user-callable SQL function, and a length mismatch must error rather
    * than silently truncate the residual. */
  def checkDims(na: Int, nb: Int): Unit =
    if (na != nb) throw new IllegalArgumentException(
      s"vec_sub: length mismatch, $na vs $nb")

  def sub(spark: SparkSession, a: Column, b: Column): Column = {
    NativeFunctions.register(spark)
    call_function("vec_sub", a, b)
  }
}
