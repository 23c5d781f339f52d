package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{Hashes, Text, Vectors}
import graft.plans.NativeHashes

/** Real corpora contain null/empty rows the driver tables don't — every
  * column function must propagate null (or a documented zero) rather than
  * return sentinel garbage (-1 counts) or throw. */
class NullSafetySpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private val df = Seq(Some("the quick fox"), Some(""), None)
    .toDF("text")

  test("token counts: null text → null, empty text → 0") {
    val rows = df.select(
      Text.wsTokenCount($"text").as("ws"),
      Text.bpeTokenCount($"text").as("bpe")).collect()
    assert(rows(0).getLong(0) == 3L && rows(0).getLong(1) == 3L)
    assert(rows(1).getLong(0) == 0L && rows(1).getLong(1) == 0L)
    assert(rows(2).isNullAt(0) && rows(2).isNullAt(1))
  }

  test("quality, langid, fingerprint, shingles tolerate null/empty") {
    val rows = df.select(
      Text.qualityScore($"text").as("q"),
      Text.langId($"text").as("l"),
      Text.fingerprint($"text").as("f"),
      Text.wordShingles($"text", 3).as("s")).collect()
    // row 0: real values
    assert(!rows(0).isNullAt(0) && rows(0).getString(1) == "en")
    // empty doc: defined, not garbage
    assert(!rows(1).isNullAt(0))
    // null doc: everything null, nothing thrown
    assert(rows(2).isNullAt(0) && rows(2).isNullAt(1) &&
      rows(2).isNullAt(2) && rows(2).isNullAt(3))
  }

  test("native signatures propagate null input") {
    val rows = df.select(
      NativeHashes.minhashSig(spark, Text.wordShingles($"text", 2), 8).as("mh"),
      NativeHashes.simhashSig(spark, Text.wsTokens($"text")).as("sh"),
      NativeHashes.md5SimhashSig(spark, Text.wsTokens($"text")).as("m5"),
      NativeHashes.md5Fingerprint(spark, Text.wsTokens($"text")).as("fp"),
      graft.plans.NgramHashes.minhashMd5(spark, $"text", 3, 8).as("mm5")).collect()
    (0 until 5).foreach(i => assert(!rows(0).isNullAt(i), s"col $i null for text"))
    (0 until 5).foreach(i => assert(rows(2).isNullAt(i), s"col $i not null for null text"))
  }

  test("md5 hyperplane sigs propagate null vectors") {
    val vdf = Seq(Some(Array(1f, 2f, 3f, 4f)), None).toDF("v")
    val rows = vdf.select(
      graft.plans.HyperplaneSigs.sigsMd5(spark, $"v", 4, 2).as("s")).collect()
    assert(!rows(0).isNullAt(0) && rows(0).getSeq[Long](0).length == 2)
    assert(rows(1).isNullAt(0))
  }

  test("cosine with null vector is null, not an exception") {
    val vdf = Seq((Some(Array(1f, 2f)), Some(Array(1f, 2f))), (None, Some(Array(1f, 2f))))
      .toDF("a", "b")
    val rows = vdf.select(Vectors.cosine($"a", $"b").as("c")).collect()
    assert(math.abs(rows(0).getDouble(0) - 1.0) < 1e-9)
    assert(rows(1).isNullAt(0))
  }

  test("projection and PQ expressions propagate null vectors") {
    val cb = typedLit(Seq(Seq(0.0, 0.0), Seq(1.0, 1.0)))
    val vdf = Seq(Some(Array(1f, 2f, 3f, 4f)), None).toDF("v")
    val rows = vdf.select(
      graft.plans.HyperplaneSigs.project(spark, $"v", 4).as("pj"),
      graft.plans.Pq.encode(spark, $"v", cb, 2).as("pqc"),
      // m=2 over the 2-entry codebook → K=1 per subspace, codes all 0
      graft.plans.Pq.adc(spark, $"v", typedLit(Seq(0, 0)), cb, 2).as("pqd")).collect()
    assert(!rows(0).isNullAt(0) && rows(0).getSeq[Double](0).length == 4)
    assert(!rows(0).isNullAt(1) && rows(0).getSeq[Int](1).length == 2)
    assert(!rows(0).isNullAt(2))
    (0 until 3).foreach(i => assert(rows(1).isNullAt(i), s"col $i not null for null vec"))
  }
}
