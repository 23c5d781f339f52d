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

  /** Physical types EVERY driver column is allowed to arrive as — the
    * complete lake schema, not just the historically-burned columns (r7,
    * VERDICT #6): a driver re-encode of ANY consumed column must be a
    * named millisecond failure here, never a silent absence downstream.
    * Multi-type entries are the columns the repo genuinely dispatches on
    * (Tables.tsMicros, string/binary text, float/double embeddings);
    * single-type entries pin exactly what ships today — if the driver
    * changes one, this fails by design and the accepted set is widened
    * only together with the code that handles the new shape. */
  private def ints = Set[DataType](IntegerType)
  private def longs = Set[DataType](LongType)
  private def doubles = Set[DataType](DoubleType)
  private def strings = Set[DataType](StringType)
  private val accepted: Map[(String, String), Set[DataType]] = Map(
    ("region", "r_regionkey") -> ints, ("region", "r_name") -> strings,
    ("nation", "n_nationkey") -> ints, ("nation", "n_name") -> strings,
    ("nation", "n_regionkey") -> ints,
    ("customer", "c_custkey") -> longs, ("customer", "c_name") -> strings,
    ("customer", "c_nationkey") -> ints, ("customer", "c_acctbal") -> doubles,
    ("customer", "c_mktsegment") -> strings,
    ("supplier", "s_suppkey") -> longs, ("supplier", "s_name") -> strings,
    ("supplier", "s_nationkey") -> ints, ("supplier", "s_acctbal") -> doubles,
    ("part", "p_partkey") -> longs, ("part", "p_name") -> strings,
    ("part", "p_brand") -> strings, ("part", "p_type") -> strings,
    ("part", "p_size") -> ints, ("part", "p_retailprice") -> doubles,
    ("orders", "o_orderkey") -> longs, ("orders", "o_custkey") -> longs,
    ("orders", "o_orderstatus") -> strings, ("orders", "o_totalprice") -> doubles,
    ("orders", "o_orderdate") -> Set(DateType, TimestampType, TimestampNTZType, StringType),
    ("orders", "o_orderpriority") -> strings,
    ("lineitem", "l_orderkey") -> longs, ("lineitem", "l_partkey") -> longs,
    ("lineitem", "l_suppkey") -> longs, ("lineitem", "l_linenumber") -> ints,
    ("lineitem", "l_quantity") -> doubles, ("lineitem", "l_extendedprice") -> doubles,
    ("lineitem", "l_discount") -> doubles, ("lineitem", "l_tax") -> doubles,
    ("lineitem", "l_returnflag") -> strings, ("lineitem", "l_linestatus") -> strings,
    ("lineitem", "l_shipdate") -> Set(DateType, TimestampType, TimestampNTZType, StringType),
    ("events", "event_id") -> longs,
    // the driver has shipped both nanos-as-long and micros-NTZ; either is
    // handled by Tables.tsMicros — anything else must fail loudly here
    ("events", "ts") -> Set(LongType, TimestampNTZType, TimestampType),
    ("events", "user_id") -> longs, ("events", "event_type") -> strings,
    ("events", "value") -> doubles, ("events", "props") -> strings,
    ("documents", "doc_id") -> longs,
    ("documents", "text") -> Set(StringType, BinaryType),
    ("documents", "lang") -> strings, ("documents", "source") -> strings,
    ("documents", "n_chars") -> longs,
    ("embeddings", "vec_id") -> longs,
    ("embeddings", "embedding") -> Set(ArrayType(FloatType, containsNull = true),
      ArrayType(FloatType, containsNull = false),
      ArrayType(DoubleType, containsNull = true),
      ArrayType(DoubleType, containsNull = false)),
    ("embeddings", "label") -> ints)

  test("every consumed column arrives as an accepted physical type, all SFs") {
    val bad = for {
      dir <- allSfs
      ((table, column), ok) <- accepted.toSeq
      schema = sources.Tables(spark, dir, table).schema
      actual = schema(column).dataType
      if !ok.contains(actual)
    } yield s"$dir/$table.$column: $actual not in ${ok.mkString("{", ", ", "}")}"
    assert(bad.isEmpty, bad.mkString("\n"))
  }

  test("the accepted map covers the ENTIRE lake schema, all SFs") {
    // coverage proof: every column of every table is enumerated (consumed
    // columns are a subset of the schema, so full-schema coverage subsumes
    // per-query ReadSchema coverage — and a NEW driver column fails here
    // until someone decides its accepted shapes)
    val gaps = for {
      dir <- allSfs
      table <- sources.Tables.names
      field <- sources.Tables(spark, dir, table).schema.fields
      if !accepted.contains((table, field.name))
    } yield s"$dir/$table.${field.name} (${field.dataType}) not enumerated"
    assert(gaps.isEmpty, gaps.distinct.mkString("\n"))
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
