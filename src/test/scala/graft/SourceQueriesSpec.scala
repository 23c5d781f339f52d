package graft

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

class SourceQueriesSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  /** Nasty rows the gate lake can't exercise (its synthetic text is
    * letters+spaces): quotes, commas, tabs, unicode, JSON specials,
    * empty string, NULL. Newlines only on the JSONL side — the CSV
    * export domain excludes them by contract (multiLine read-back would
    * make every file one unsplittable record at scale). */
  private def nasty(withNewlines: Boolean) = {
    val texts = Seq(
      """a "quoted" phrase""",
      "comma, separated, values",
      "tab\tand backslash \\ and more",
      "unicode: café 日本語 😃",
      """json specials: {"k": [1,2]}""",
      " leading and trailing boundary whitespace\t",
      "",
      null) ++ (if (withNewlines) Seq("line one\nline two\n\nline four") else Nil)
    texts.zipWithIndex.map { case (t, i) =>
      (i.toLong, t, if (i % 2 == 0) "en" else "xx", s"s${i % 3}",
        if (t == null) 0L else t.length.toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
  }

  private def roundtripEqual(orig: org.apache.spark.sql.DataFrame,
      back: org.apache.spark.sql.DataFrame): Unit = {
    val a = orig.orderBy("doc_id").collect().toSeq
    val b = back.orderBy("doc_id").collect().toSeq
    assert(b == a, s"roundtrip diverged:\n  orig=$a\n  back=$b")
  }

  test("JSONL roundtrip is lossless on quotes/commas/unicode/newlines/empty") {
    val dir = java.nio.file.Files.createTempDirectory("src-spec-jsonl").toString
    try {
      val df = nasty(withNewlines = true)
      df.write.json(s"$dir/out")
      roundtripEqual(df, spark.read.schema(schema).json(s"$dir/out"))
    } finally graft.operators.Checkpointing.deleteRecursively(dir)
  }

  test("Avro roundtrip is lossless on quotes/unicode/newlines/empty/null") {
    val dir = java.nio.file.Files.createTempDirectory("src-spec-avro").toString
    try {
      val df = nasty(withNewlines = true)
      graft.sources.Avro.write(df.repartition(3), s"$dir/out")
      roundtripEqual(df, graft.sources.Avro.read(spark, s"$dir/out", schema))
      // nulls survive as nulls (the ["null", T] union), empty as empty
      val back = graft.sources.Avro.read(spark, s"$dir/out", schema)
      assert(back.filter(col("text").isNull).count() == 1)
      assert(back.filter(col("text") === "").count() == 1)
      // a drifted read schema fails loudly instead of miscasting
      val drifted = StructType(schema.fields.map(f =>
        if (f.name == "n_chars") f.copy(dataType = StringType) else f))
      val e = intercept[org.apache.spark.SparkException](
        graft.sources.Avro.read(spark, s"$dir/out", drifted).count())
      def msgs(t: Throwable): Seq[String] =
        Option(t).toSeq.flatMap(x => x.getMessage +: msgs(x.getCause))
      assert(msgs(e).exists(m => m != null && m.contains("schema drifted")))
    } finally graft.operators.Checkpointing.deleteRecursively(dir)
  }

  test("Avro read is block-splittable: ONE multi-block container file is " +
      "read by >1 task on sync-marker boundaries, no row dropped or doubled") {
    val dir = java.nio.file.Files.createTempDirectory("src-spec-avro-split").toString
    try {
      import spark.implicits._
      val df = (0L until 5000L).map(i => (i, s"doc-$i-${"x" * 50}"))
        .toDF("doc_id", "text")
      val sch = StructType(Seq(StructField("doc_id", LongType),
        StructField("text", StringType)))
      // one file, tiny blocks → many sync markers inside it
      graft.sources.Avro.write(df.coalesce(1), s"$dir/out", syncInterval = 2048)
      val whole = graft.sources.Avro.read(spark, s"$dir/out", sch)
      val split = graft.sources.Avro.read(spark, s"$dir/out", sch,
        splitBytes = 16L << 10)
      assert(split.rdd.getNumPartitions > 1,
        "a 16 KiB split plan over a multi-block container must yield >1 task")
      assert(whole.rdd.getNumPartitions == 1)
      // exact multiset equality: every block owned by exactly one split
      assert(split.count() == 5000L)
      assert(split.orderBy("doc_id").collect().toSeq ==
        whole.orderBy("doc_id").collect().toSeq)
      // seam robustness: a split size that can land mid-block still
      // partitions the blocks exactly (sync-ownership, not byte-ownership)
      val odd = graft.sources.Avro.read(spark, s"$dir/out", sch,
        splitBytes = 7777L)
      assert(odd.count() == 5000L)
      assert(odd.select(sum(col("doc_id"))).head().getLong(0) ==
        (0L until 5000L).sum)
    } finally graft.operators.Checkpointing.deleteRecursively(dir)
  }

  test("CSV roundtrip with RFC 4180 quote-doubling is lossless on its domain") {
    // includes "" vs NULL (the writer emits quoted "" for empty and the
    // \N sentinel for null; the sentinel reader keeps them distinct —
    // Spark's default nullValue="" would collapse both to null) and
    // BOUNDARY whitespace (the WRITER's ignore*WhiteSpace defaults are
    // true and would silently trim it out of the file bytes).
    val dir = java.nio.file.Files.createTempDirectory("src-spec-csv").toString
    try {
      val df = nasty(withNewlines = false)
      df.write.option("header", "true").option("escape", "\"")
        .option("nullValue", "\\N")
        .option("ignoreLeadingWhiteSpace", "false")
        .option("ignoreTrailingWhiteSpace", "false").csv(s"$dir/out")
      roundtripEqual(df, spark.read.schema(schema)
        .option("header", "true").option("escape", "\"")
        .option("nullValue", "\\N").csv(s"$dir/out"))
    } finally graft.operators.Checkpointing.deleteRecursively(dir)
  }

  test("CSV domain boundary: a literal \\N text conflates to null (documented)") {
    val dir = java.nio.file.Files.createTempDirectory("src-spec-csvn").toString
    try {
      val df = Seq((0L, "\\N", "en", "s0", 2L))
        .toDF("doc_id", "text", "lang", "source", "n_chars")
      df.write.option("header", "true").option("escape", "\"")
        .option("nullValue", "\\N").csv(s"$dir/out")
      val back = spark.read.schema(schema)
        .option("header", "true").option("escape", "\"")
        .option("nullValue", "\\N").csv(s"$dir/out").head()
      assert(back.isNullAt(1),
        "the sentinel convention necessarily reads a literal \\N as null " +
          "— if this starts passing through, the domain doc is stale")
    } finally graft.operators.Checkpointing.deleteRecursively(dir)
  }

  test("XML roundtrip is lossless incl. markup specials and boundary space") {
    // XML-specific nasties on top of the shared set: angle brackets and
    // ampersands (must entity-escape), a ]]> sequence (must not be
    // emitted as a naked CDATA terminator), and carriage returns (the
    // XML line-end normalization rule would fold a raw \r to \n — the
    // writer must emit it as a character reference to survive). Boundary
    // whitespace survives only under ignoreSurroundingSpaces=false: the
    // reader's default TRIMS element text (probed; same silent-mutation
    // class as the CSV writer's whitespace defaults).
    val dir = java.nio.file.Files.createTempDirectory("src-spec-xml").toString
    try {
      val df = nasty(withNewlines = true).union(Seq(
        (100L, "<angle> brackets & ampersands", "en", "s0", 29L),
        (101L, "cdata terminator ]]> inline", "xx", "s1", 27L),
        (102L, "carriage\rreturn", "en", "s2", 15L))
        .toDF("doc_id", "text", "lang", "source", "n_chars"))
      df.write.option("rowTag", "doc").xml(s"$dir/out")
      roundtripEqual(df, spark.read.schema(schema).option("rowTag", "doc")
        .option("ignoreSurroundingSpaces", "false").xml(s"$dir/out"))
    } finally graft.operators.Checkpointing.deleteRecursively(dir)
  }

  test("partitioned roundtrip reconstructs the partition column losslessly") {
    val dir = java.nio.file.Files.createTempDirectory("src-spec-part").toString
    try {
      val df = nasty(withNewlines = true)
      df.write.partitionBy("source").parquet(s"$dir/out")
      // read-back schema: partition col comes from the directory key
      roundtripEqual(df.select("doc_id", "text", "lang", "n_chars", "source"),
        spark.read.schema(schema).parquet(s"$dir/out")
          .select("doc_id", "text", "lang", "n_chars", "source"))
    } finally graft.operators.Checkpointing.deleteRecursively(dir)
  }

  test("src_partitioned_roundtrip's source filter PRUNES at the scan") {
    // the 100 TB property the gate can't hash: the 3-source filter must
    // reach the scan as a partitionFilter (directory pruning), not a
    // post-scan Filter over all 20 sources' files.
    val out = graft.queries.SourceQueries
      .queries("src_partitioned_roundtrip")(spark, sf)
    // AQE wraps the tree — collectLeaves on the sparkPlan sees through it
    val scans = out.queryExecution.sparkPlan.collectLeaves().collect {
      case sc: FileSourceScanExec => sc
    }
    assert(scans.nonEmpty, "expected a FileSourceScanExec in the plan")
    val pf = scans.map(_.partitionFilters).filter(_.nonEmpty)
    assert(pf.nonEmpty,
      s"source IN (...) must be a partitionFilter; got none in ${scans.size} scans")
    assert(pf.head.mkString(",").contains("src3"),
      s"partitionFilters should carry the source list: ${pf.head.mkString(",")}")
    // and the pruned read sees exactly the 3 requested sources
    val srcs = out.select("source").collect().map(_.getString(0)).toSet
    assert(srcs == Set("src3", "src7", "src11"))
  }

  test("gate checksum catches a single-field corruption (non-vacuous hash)") {
    // the roundtrip gate rests on the checksum aggregate detecting any
    // field change — prove a 1-char text corruption moves the checksum.
    val dir = java.nio.file.Files.createTempDirectory("src-spec-chk").toString
    try {
      val df = nasty(withNewlines = true)
      df.write.json(s"$dir/out")
      val back = spark.read.schema(schema).json(s"$dir/out")
      def checksum(d: org.apache.spark.sql.DataFrame): Long =
        d.agg(sum(pmod(conv(substring(md5(concat_ws("|",
            col("doc_id"), col("lang"), col("n_chars"), col("text"))),
            1, 12), 16, 10).cast("long"), lit(1000000007L))))
          .head().getLong(0)
      val corrupted = back.withColumn("text",
        when(col("doc_id") === 3L, concat(col("text"), lit("X")))
          .otherwise(col("text")))
      assert(checksum(back) == checksum(df))
      assert(checksum(corrupted) != checksum(df))
    } finally graft.operators.Checkpointing.deleteRecursively(dir)
  }
}
