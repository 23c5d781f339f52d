package graft.plans

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types._

/** Native vector × scalar over a float/double array column — the third
  * piece of the codegen'd vector-algebra family ([[VecSub]], [[DotProd]],
  * [[CosineSim]]). Powers the PCA power iteration's per-row outer-product
  * contribution c·(c·v) without an interpreted `transform` lambda per
  * element (emb_pca runs it once per corpus row per iteration). Per-element
  * op is one double multiply, identical in eval and codegen, so the
  * downstream quantized-long mean fold sees bit-identical inputs on any
  * engine that multiplies the same doubles. */
final case class VecScale(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val vecOk = left.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (vecOk && right.dataType == DoubleType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"vec_scale expects (array<float|double>, double), got ${left.dataType}, ${right.dataType}")
  }

  private val lFloat = left.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val s = r.asInstanceOf[Double]
    val n = a.numElements()
    val out = new Array[Double](n)
    var i = 0
    while (i < n) {
      out(i) = (if (lFloat) a.getFloat(i).toDouble else a.getDouble(i)) * s
      i += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, s) => {
      val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      val i = ctx.freshName("i")
      val getX = if (lFloat) s"(double) $a.getFloat($i)" else s"$a.getDouble($i)"
      s"""
         |int $n = $a.numElements();
         |double[] $out = new double[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  $out[$i] = ($getX) * $s;
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): VecScale =
    copy(left = l, right = r)
  override def prettyName: String = "vec_scale"
}

object VecScale {
  def scale(spark: SparkSession, a: Column, s: Column): Column = {
    NativeFunctions.register(spark)
    call_function("vec_scale", a, s)
  }
}
