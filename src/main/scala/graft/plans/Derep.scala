package graft.plans

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass consecutive-duplicate-token collapse — the native kernel of
  * `text_derep` (the hot-path rule: a per-token interpreted lambda costs
  * µs per ELEMENT; this is one codegen'd call per document). Token
  * semantics are EXACTLY `split(trim(text), "\\s+")` (the shared
  * [[NgramHashes.tokenBounds]] contract: leading/trailing non-space
  * whitespace mints an edge empty token, empty text one empty token —
  * parity-spec'd against the HOF chain), duplicate = byte-equal adjacent
  * tokens, output = kept tokens joined by single spaces plus the removed
  * count from the SAME pass (recomputing it from the cleaned string would
  * miscount edge empty tokens).
  */
object Derep {

  /** (cleaned text, n tokens removed) in one pass. */
  def compute(text: UTF8String): InternalRow = {
    val b = text.trim().getBytes
    val (starts, ends) = NgramHashes.tokenBounds(b)
    val n = starts.size()
    val keep = new Array[Boolean](n)
    var kept = 0
    var i = 0
    while (i < n) {
      val dup = i > 0 && {
        val s = starts.get(i).intValue(); val e = ends.get(i).intValue()
        val ps = starts.get(i - 1).intValue(); val pe = ends.get(i - 1).intValue()
        (e - s) == (pe - ps) && java.util.Arrays.equals(b, s, e, b, ps, pe)
      }
      keep(i) = !dup
      if (!dup) kept += 1
      i += 1
    }
    var len = math.max(0, kept - 1)
    i = 0
    while (i < n) {
      if (keep(i)) len += ends.get(i).intValue() - starts.get(i).intValue()
      i += 1
    }
    val out = new Array[Byte](len)
    var w = 0
    var first = true
    i = 0
    while (i < n) {
      if (keep(i)) {
        if (!first) { out(w) = ' '; w += 1 }
        val s = starts.get(i).intValue(); val e = ends.get(i).intValue()
        System.arraycopy(b, s, out, w, e - s)
        w += e - s
        first = false
      }
      i += 1
    }
    new GenericInternalRow(Array[Any](UTF8String.fromBytes(out), n - kept))
  }

  /** Column wrapper (registers the function once per session). */
  def apply(spark: SparkSession, text: Column): Column = {
    NativeFunctions.register(spark)
    org.apache.spark.sql.functions.call_function("derep", text)
  }
}

/** text → struct(clean: string, n_removed: int) — see [[Derep.compute]]. */
final case class DerepExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("clean", StringType, nullable = false),
    StructField("n_removed", IntegerType, nullable = false)))

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"derep expects string, got $other")
    }

  override def nullSafeEval(input: Any): Any =
    Derep.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev,
      c => s"${ev.value} = (InternalRow) graft.plans.Derep.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): DerepExpr =
    copy(child = newChild)
  override def prettyName: String = "derep"
}
