package graft.plans

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Map-side nearest-centroid assignment: argmax cosine of one embedding
  * against a (plan-literal) array of centroids, returning the winning
  * POSITION in the centroid array (the caller maps position → cluster id).
  *
  * This is the shuffle-free core of IVF cluster assignment
  * (`Ivf.assign`): centroids are k × dim and ride the plan as a literal, so
  * assignment is per-row math inside whole-stage codegen — no join, no
  * exchange, nothing but the corpus scan. Replaces the earlier
  * crossJoin(broadcast) + groupBy argmax, whose final aggregate exchanged
  * every (vec_id, embedding) row once per Lloyd iteration.
  *
  * Semantics are bit-matched to that earlier plan
  * (`max_by(cluster, struct(sim, -cluster))`):
  *   - per-centroid cosine uses the exact accumulation order of
  *     [[CosineSim]] (left-to-right dot/norm sums in double), so the scores
  *     compared are the same doubles;
  *   - the comparison is `Double.compare(sim, best) > 0` — Spark's total
  *     order, where NaN sorts above every value — and strict, so ties (and
  *     all-NaN rows) keep the EARLIEST position = lowest cluster id.
  */
final case class NearestCentroid(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val embOk = left.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _ => false
    }
    val centsOk = right.dataType match {
      case ArrayType(ArrayType(DoubleType, _), _) => true
      case _ => false
    }
    if (embOk && centsOk)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"nearest_centroid expects (array<float|double>, array<array<double>>), " +
        s"got ${left.dataType}, ${right.dataType}")
  }

  private val lFloat = left.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val emb = l.asInstanceOf[ArrayData]
    val cents = r.asInstanceOf[ArrayData]
    val k = cents.numElements()
    var best = -1
    var bestSim = Double.NegativeInfinity
    var c = 0
    while (c < k) {
      val cent = cents.getArray(c)
      val n = math.min(emb.numElements(), cent.numElements())
      var dot = 0.0
      var na = 0.0
      var nb = 0.0
      var i = 0
      while (i < n) {
        val x = if (lFloat) emb.getFloat(i).toDouble else emb.getDouble(i)
        val y = cent.getDouble(i)
        dot += x * y
        na += x * x
        nb += y * y
        i += 1
      }
      val sim = dot / (math.sqrt(na) * math.sqrt(nb))
      if (best < 0 || java.lang.Double.compare(sim, bestSim) > 0) {
        best = c
        bestSim = sim
      }
      c += 1
    }
    if (best < 0) null else java.lang.Integer.valueOf(best)
  }

  /** Same loops in generated Java — identical op order keeps results
    * bit-equal to nullSafeEval and to the CosineSim-scored join it
    * replaces. */
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val k = ctx.freshName("k")
      val best = ctx.freshName("best")
      val bestSim = ctx.freshName("bestSim")
      val c = ctx.freshName("c")
      val cent = ctx.freshName("cent")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val i = ctx.freshName("i")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      val sim = ctx.freshName("sim")
      val getX = if (lFloat) s"(double) $a.getFloat($i)" else s"$a.getDouble($i)"
      s"""
         |int $k = $b.numElements();
         |int $best = -1;
         |double $bestSim = Double.NEGATIVE_INFINITY;
         |for (int $c = 0; $c < $k; $c++) {
         |  org.apache.spark.sql.catalyst.util.ArrayData $cent = $b.getArray($c);
         |  int $n = Math.min($a.numElements(), $cent.numElements());
         |  double $dot = 0.0, $na = 0.0, $nb = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    double $x = $getX;
         |    double $y = $cent.getDouble($i);
         |    $dot += $x * $y;
         |    $na += $x * $x;
         |    $nb += $y * $y;
         |  }
         |  double $sim = $dot / (Math.sqrt($na) * Math.sqrt($nb));
         |  if ($best < 0 || Double.compare($sim, $bestSim) > 0) {
         |    $best = $c;
         |    $bestSim = $sim;
         |  }
         |}
         |if ($best < 0) { ${ev.isNull} = true; } else { ${ev.value} = $best; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): NearestCentroid =
    copy(left = l, right = r)
  override def prettyName: String = "nearest_centroid"
}

object NearestCentroid {
  def register(spark: SparkSession): Unit = NativeFunctions.register(spark)

  def nearest(spark: SparkSession, emb: Column, centroids: Column): Column = {
    register(spark)
    org.apache.spark.sql.functions.call_function("nearest_centroid", emb, centroids)
  }
}
