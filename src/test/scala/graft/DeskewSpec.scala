package graft

import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, Window => LWindow}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{PrefixSum, ThresholdSelect}

/** The de-skewed stratum operators: value parity with the single-window
  * forms they replace, plus plan-shape guards proving the full-stratum
  * single-reducer sort is actually gone (not just moved).
  */
class DeskewSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def docs = spark.read.parquet(s"$sf/documents.parquet")

  test("ThresholdSelect.smallestByHash matches the full window rank exactly") {
    val hashed = docs.select($"source", $"doc_id", md5($"text").as("h"))
    val w = Window.partitionBy("source")
    val expected = hashed
      .withColumn("n", count(lit(1)).over(w))
      .withColumn("rn", row_number().over(w.orderBy("h", "doc_id")))
      .filter($"rn" <= expr("(n + 4) div 5"))
      .select("source", "doc_id")
      .as[(String, Long)].collect().toSet
    val got = ThresholdSelect
      .smallestByHash(hashed, "source", "h", "doc_id", n => (n + 4) / 5)
      .select("source", "doc_id").as[(String, Long)].collect().toSet
    assert(got == expected)
  }

  test("ThresholdSelect boundary cases: k=0 keeps nothing, k>=n keeps all") {
    val tiny = Seq(("a", 1L, "0a"), ("a", 2L, "ff"), ("b", 3L, "7c"))
      .toDF("source", "doc_id", "h")
    assert(ThresholdSelect.smallestByHash(tiny, "source", "h", "doc_id",
      _ => 0L, bucketHexChars = 1).count() == 0)
    assert(ThresholdSelect.smallestByHash(tiny, "source", "h", "doc_id",
      n => n, bucketHexChars = 1).count() == 3)
    // k = 1 with a 1-hex-char bucket: both 'a' rows share no bucket, so the
    // boundary rank fires on a single-row bucket
    val one = ThresholdSelect.smallestByHash(tiny, "source", "h", "doc_id",
        _ => 1L, bucketHexChars = 1)
      .select("doc_id").as[Long].collect().toSet
    assert(one == Set(1L, 3L))
  }

  test("ThresholdSelect enforces the bounded-group contract and refuses null groups") {
    // a group key that explodes the driver histogram must trip the loud
    // require, not a silent driver OOM — doc_id as the "group" gives one
    // histogram row per doc, far over a tiny cap
    val perDoc = docs.select($"doc_id".as("g"), $"doc_id", md5($"text").as("h"))
    val tripped = intercept[IllegalArgumentException] {
      ThresholdSelect.smallestByHash(perDoc, "g", "h", "doc_id",
        n => n, maxDriverHistRows = 8)
    }
    assert(tripped.getMessage.contains("bounded-group contract"))

    // null group keys would be dropped by the inner join (where the window
    // form ranks them in a null partition) — refuse loudly instead
    val withNull = Seq((Some("a"), 1L, "0a"), (None, 2L, "ff"))
      .toDF("source", "doc_id", "h")
    val nullTrip = intercept[IllegalArgumentException] {
      ThresholdSelect.smallestByHash(withNull, "source", "h", "doc_id", n => n)
    }
    assert(nullTrip.getMessage.contains("null group keys"))
  }

  test("ThresholdSelect window only ever ranks the boundary bucket") {
    val hashed = docs.select($"source", $"doc_id", md5($"text").as("h"))
    val out = ThresholdSelect
      .smallestByHash(hashed, "source", "h", "doc_id", n => (n + 4) / 5)
    val wins = out.queryExecution.optimizedPlan.collect { case w: LWindow => w }
    assert(wins.nonEmpty, "expected the boundary-bucket rank window")
    wins.foreach { w =>
      val gated = w.child.collectFirst {
        case f: Filter if f.condition.toString.contains("__b") => f
      }
      assert(gated.nonEmpty,
        s"window must rank only the __b = threshold bucket slice:\n$w")
    }
  }

  test("PrefixSum.cumSum matches the single-window running sum exactly") {
    val base = docs.select($"source", $"doc_id", $"n_chars")
    val w = Window.partitionBy("source").orderBy("doc_id")
    val expected = base.withColumn("cum", sum("n_chars").over(w))
      .select("source", "doc_id", "cum")
      .as[(String, Long, Long)].collect().toSet
    val got = PrefixSum.cumSum(base, "source", Seq(col("doc_id")), "n_chars", "cum")
      .select("source", "doc_id", "cum")
      .as[(String, Long, Long)].collect().toSet
    assert(got == expected)
  }

  test("PrefixSum.cumSum with a desc order key matches the window form") {
    val base = docs.select($"source", $"doc_id", $"n_chars",
      graft.functions.Text.qualityScore($"text").as("q"))
    val w = Window.partitionBy("source").orderBy($"q".desc, $"doc_id")
    val expected = base.withColumn("cum", sum("n_chars").over(w))
      .select("source", "doc_id", "cum")
      .as[(String, Long, Long)].collect().toSet
    val got = PrefixSum.cumSum(base, "source",
        Seq($"q".desc, $"doc_id"), "n_chars", "cum")
      .select("source", "doc_id", "cum")
      .as[(String, Long, Long)].collect().toSet
    assert(got == expected)
  }

  test("PrefixSum windows are slice-bounded: (grp, __pid) rows or partials only") {
    val out = PrefixSum.cumSum(docs.select($"source", $"doc_id", $"n_chars"),
      "source", Seq(col("doc_id")), "n_chars", "cum")
    val wins = out.queryExecution.optimizedPlan.collect { case w: LWindow => w }
    assert(wins.nonEmpty)
    wins.foreach { w =>
      val overPartials = w.child.collectFirst {
        case a: Aggregate if a.aggregateExpressions.exists(_.toString.contains("__psum")) => a
      }.nonEmpty
      assert(w.partitionSpec.size >= 2 || overPartials,
        s"window neither slice-bounded nor over the partials table:\n$w")
    }
  }

  test("dedup_keep_list plans with no window (max_by argmax, not a cluster sort)") {
    // the served query memoizes behind a lineage cut — lint the uncut
    // construction, which is the plan the artifact is built from
    val out = queries.DedupQueries.keepListPlan(spark, sf)
    val wins = out.queryExecution.optimizedPlan.collect { case w: LWindow => w }
    assert(wins.isEmpty,
      s"keep-list must pick winners by aggregate, not a per-cluster sort: $wins")
    assert(out.queryExecution.optimizedPlan.toString.contains("max_by"))
  }

  test("text_vocab_stats plans with no window at all (topk head-mass)") {
    val out = queries.TextQueries.queries("text_vocab_stats")(spark, sf)
    val wins = out.queryExecution.optimizedPlan.collect { case w: LWindow => w }
    assert(wins.isEmpty, s"vocab stats must not rank the vocabulary in a window: $wins")
    assert(out.queryExecution.optimizedPlan.toString.contains("topk"))
  }
}
