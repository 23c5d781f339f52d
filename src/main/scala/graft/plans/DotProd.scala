package graft.plans

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native dot product over two float/double array columns — the raw-dot
  * sibling of [[CosineSim]] (identical left-to-right double accumulation,
  * so the fold is bit-replayable by any engine that runs the same ordered
  * fold), as one codegen'd tight loop instead of an interpreted
  * zip_with/aggregate chain per row. Powers the PCA power iteration
  * (emb_pca), where the projection (x−μ)·v runs once per corpus row per
  * Lloyd-style pass and an interpreted HOF would cost micro-seconds per
  * ELEMENT (see the verify gotchas). */
final case class DotProd(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"dot_prod expects two array<float|double>, got ${left.dataType}, ${right.dataType}")
  }

  private def isFloat(e: Expression) = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
  private val lFloat = isFloat(left)
  private val rFloat = isFloat(right)

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0
    var i = 0
    while (i < n) {
      val x = if (lFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (rFloat) b.getFloat(i).toDouble else b.getDouble(i)
      dot += x * y
      i += 1
    }
    java.lang.Double.valueOf(dot)
  }

  /** Identical loop in generated Java — same op order, bit-equal results. */
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val i = ctx.freshName("i")
      val getX = if (lFloat) s"(double) $a.getFloat($i)" else s"$a.getDouble($i)"
      val getY = if (rFloat) s"(double) $b.getFloat($i)" else s"$b.getDouble($i)"
      s"""
         |int $n = Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $dot += ($getX) * ($getY);
         |}
         |${ev.value} = $dot;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): DotProd =
    copy(left = l, right = r)
  override def prettyName: String = "dot_prod"
}

object DotProd {
  def dot(spark: SparkSession, a: Column, b: Column): Column = {
    NativeFunctions.register(spark)
    org.apache.spark.sql.functions.call_function("dot_prod", a, b)
  }
}
