package graft.plans

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Intersection CARDINALITY of two numerically-sorted distinct long
  * arrays — one merge pass, zero allocation.
  *
  * This is the verify kernel of the prefix-filter joins: Spark's
  * `size(array_intersect(a, b))` builds a boxed hash set PER ROW and
  * `array_union` a second one, which at candidate-set density (10⁷ pairs ×
  * ~10² grams each) is the single hottest allocation site in the library —
  * measured 90+ s of a 94 s exact-audit join at 30×. A merge walk over
  * presorted arrays does the same count with two int cursors, and the
  * union needs no second pass at all: |∪| = n_a + n_b − |∩| on distinct
  * sets (inclusion–exclusion). Sorting happens ONCE per doc in the stored
  * ranked-gram artifact, not once per candidate pair.
  *
  * Inputs MUST be numerically ascending and duplicate-free; the count is
  * then exactly `size(array_intersect(a, b))` (parity-spec'd). */
final case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"sorted_intersect_count expects two array<bigint>, got " +
        s"${left.dataType}, ${right.dataType}")
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val (na, nb) = (a.numElements(), b.numElements())
    var i = 0
    var j = 0
    var cnt = 0L
    while (i < na && j < nb) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x == y) { cnt += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    java.lang.Long.valueOf(cnt)
  }

  /** Identical merge walk in generated Java. */
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val cnt = ctx.freshName("cnt")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      s"""
         |int $na = $a.numElements();
         |int $nb = $b.numElements();
         |int $i = 0; int $j = 0; long $cnt = 0L;
         |while ($i < $na && $j < $nb) {
         |  long $x = $a.getLong($i);
         |  long $y = $b.getLong($j);
         |  if ($x == $y) { $cnt++; $i++; $j++; }
         |  else if ($x < $y) { $i++; } else { $j++; }
         |}
         |${ev.value} = $cnt;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): SortedIntersectCount =
    copy(left = l, right = r)
  override def prettyName: String = "sorted_intersect_count"
}

object SortedIntersectCount {
  def count(spark: SparkSession, a: Column, b: Column): Column = {
    NativeFunctions.register(spark)
    org.apache.spark.sql.functions.call_function("sorted_intersect_count", a, b)
  }
}
