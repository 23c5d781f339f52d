package graft.plans

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, ArrayData, GenericArrayData, MapData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `map_project_keys(map, keys)`: the map narrowed to a LITERAL key set —
  * what a Postgres publication column list does to a published tuple's
  * before/after image (cdc/Bootstrap.slice, the micro-batch dispatch hot
  * path). Replaces the interpreted `map_filter(m, (k, _) →
  * array_contains(keys, k))` higher-order chain: the keep set is built
  * ONCE from the foldable keys argument and probed per entry via a hash
  * set inside a generated static call (the BloomMightContain codegen
  * pattern) — no per-row lambda interpretation.
  *
  * Null map → null (what `map_filter` on a null map yields too); a key
  * the map lacks is simply absent from the output, and entry order is
  * preserved (map_filter parity, spec'd on randomized images).
  */
final case class MapProjectKeys(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = left.dataType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (MapType(StringType, _, _), ArrayType(StringType, _)) if right.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"map_project_keys expects (map<string, _>, literal array<string>), " +
          s"got ${left.dataType}, ${right.dataType}" +
          (if (!right.foldable) " (keys must be a literal)" else ""))
    }

  @transient private lazy val valueType: DataType =
    left.dataType.asInstanceOf[MapType].valueType

  /** Keep set built once per plan from the literal keys — shared by the
    * interpreted path and the generated static call (reference object). */
  @transient private lazy val keepSet: java.util.HashSet[UTF8String] = {
    val arr = right.eval(null).asInstanceOf[ArrayData]
    val s = new java.util.HashSet[UTF8String]()
    var i = 0
    while (i < arr.numElements()) { s.add(arr.getUTF8String(i)); i += 1 }
    s
  }

  override def nullSafeEval(m: Any, keys: Any): Any =
    MapProjectKeys.project(m.asInstanceOf[MapData], keepSet, valueType)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val keepRef = ctx.addReferenceObj("keepKeys", keepSet, "java.util.HashSet")
    val vtRef = ctx.addReferenceObj("valueType", valueType,
      "org.apache.spark.sql.types.DataType")
    nullSafeCodeGen(ctx, ev, (m, _) =>
      s"${ev.value} = graft.plans.MapProjectKeys.project($m, $keepRef, $vtRef);")
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): MapProjectKeys =
    copy(left = l, right = r)
  override def prettyName: String = "map_project_keys"
}

object MapProjectKeys {

  /** Static per-row worker (callable from generated code and interpreted
    * eval alike): two passes — mark keepers, then copy entries in original
    * order. Result buffers are consumed into the output row immediately,
    * the same same-row lifetime Spark's own collection expressions rely
    * on. */
  def project(m: MapData, keep: java.util.HashSet[UTF8String],
      valueType: DataType): MapData = {
    val ks = m.keyArray()
    val vs = m.valueArray()
    val n = m.numElements()
    val flags = new Array[Boolean](n)
    var cnt = 0
    var i = 0
    while (i < n) {
      if (keep.contains(ks.getUTF8String(i))) { flags(i) = true; cnt += 1 }
      i += 1
    }
    val ok = new Array[Any](cnt)
    val ov = new Array[Any](cnt)
    var j = 0
    i = 0
    while (i < n) {
      if (flags(i)) {
        ok(j) = ks.getUTF8String(i)
        ov(j) = if (vs.isNullAt(i)) null else vs.get(i, valueType)
        j += 1
      }
      i += 1
    }
    new ArrayBasedMapData(new GenericArrayData(ok), new GenericArrayData(ov))
  }

  def register(spark: SparkSession): Unit = NativeFunctions.register(spark)

  def project(spark: SparkSession, map: Column, keys: Column): Column = {
    register(spark)
    org.apache.spark.sql.functions.call_function("map_project_keys", map, keys)
  }
}
