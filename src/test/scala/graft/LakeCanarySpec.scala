package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.types.{BinaryType, DataType, DateType, DoubleType, FloatType, LongType, StringType, TimestampNTZType, TimestampType, ArrayType, IntegerType}

/** Lake-encoding canary: the FIRST suite to go red when the driver changes
  * the physical shape of the testdata lake (round 5 shipped `events.ts` as
  * TIMESTAMP(MICROS)/NTZ after rounds of INT64 TIMESTAMP(NANOS) and 22
  * queries silently vanished from the correctness gate). The per-table and
  * per-representative tests are analysis-only — no Spark jobs — so a
  * data-shape break surfaces in milliseconds with the table/column/query
  * named. The all-queries pass is schema-driven but NOT job-free: queries
  * whose construction builds a memoized artifact (the knn indexes, the LM /
  * signature / keep-list tables) execute that build eagerly — still far
  * cheaper than the execution suites, and the analysis error (when there is
  * one) surfaces before any job runs.
  */
class LakeCanarySpec extends AnyFunSuite with SparkTestBase {

  private val allSfs = Seq(
    "/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")

  /** Physical types each encoding-sensitive driver column is allowed to
    * arrive as. Columns not listed are consumed through type-agnostic
    * operations (string/double/binary columns read as declared). */
  private val accepted: Map[(String, String), Set[DataType]] = Map(
    // the driver has shipped both nanos-as-long and micros-NTZ; either is
    // handled by Tables.tsMicros — anything else must fail loudly here
    ("events", "ts") -> Set(LongType, TimestampNTZType, TimestampType),
    ("orders", "o_orderdate") -> Set(DateType, TimestampType, TimestampNTZType, StringType),
    ("lineitem", "l_shipdate") -> Set(DateType, TimestampType, TimestampNTZType, StringType),
    ("documents", "text") -> Set(StringType, BinaryType),
    ("embeddings", "embedding") -> Set(ArrayType(FloatType, containsNull = true),
      ArrayType(FloatType, containsNull = false),
      ArrayType(DoubleType, containsNull = true),
      ArrayType(DoubleType, containsNull = false)))

  test("every encoding-sensitive column arrives as an accepted physical type, all SFs") {
    val bad = for {
      dir <- allSfs
      ((table, column), ok) <- accepted.toSeq
      schema = sources.Tables(spark, dir, table).schema
      actual = schema(column).dataType
      if !ok.contains(actual)
    } yield s"$dir/$table.$column: $actual not in ${ok.mkString("{", ", ", "}")}"
    assert(bad.isEmpty, bad.mkString("\n"))
  }

  test("tsMicros resolves against the actual lake at all SFs") {
    allSfs.foreach { dir =>
      val ev = sources.Tables(spark, dir, "events")
      // analysis-only: resolving the projection is what broke in round 5
      val resolved = ev.select(sources.Tables.tsMicros(ev).as("ts_us"))
      assert(resolved.schema("ts_us").dataType == LongType,
        s"$dir: ts_us must normalize to LongType micros")
    }
  }

  test("every registered query analyzes at sf0.001 (schema-only)") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try { fn(spark, sf).schema; None }
        catch { case e: Exception => Some(s"$name: ${e.getMessage.take(200)}") }
    }
    assert(failures.isEmpty, s"${failures.size} queries fail analysis:\n" +
      failures.mkString("\n"))
  }

  test("core table-deriving entry points analyze at every SF") {
    // the per-SF variant of the previous test, restricted to the cheap
    // construction paths (no eager index builds): one representative per
    // events-consuming family — these are exactly the 22 that broke in r5
    val reps = Seq("cdc_images", "cdc_pgoutput_decode", "q_pivot",
      "q_asof_join", "q_funnel", "q_retention")
    val failures = for {
      dir <- allSfs
      name <- reps
      err <- (try { SparkEntry.queries(name)(spark, dir).schema; None }
              catch { case e: Exception => Some(s"$dir $name: ${e.getMessage.take(200)}") })
    } yield err
    assert(failures.isEmpty, failures.mkString("\n"))
  }
}
