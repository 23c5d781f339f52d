package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The HARD skew knob at stress scale (r14 — VERDICT item 7): the
  * q_stream_join_capped admission rule at m = 64 on BOTH sides of a
  * DENSIFIED hot key — 2048 views × 2048 purchases landing inside one
  * join window (the 30×-lake shape addendum 32 measured: pair mass goes
  * quadratic in OUTPUT). The stratum must cut hot pair mass ~64² =
  * 4096× while every cold key's emission stays hash-exact, and the
  * counts are recorded (SCALING.md addendum 33). */
class SkewStressSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  // event time far from epoch 0 (rows AT the initial watermark drop)
  private val base = 1000000000000000L
  private val wUs = 60000000L // 1-minute join window

  /** The densified feed: hot user −1 gets `hotN` rows per side inside
    * HALF a window (max pair mass); 256 cold users get 4 views + 1
    * purchase each, also in-window, spread far apart across users. */
  private def feed(hotN: Int, et: String): DataFrame = {
    val hot = (0 until hotN).map { i =>
      val off = if (et == "view") 0L else 1L
      (-1L, (if (et == "view") 1000000L else 2000000L) + i,
        base + (i.toLong * wUs / 2 / hotN) + off)
    }
    val cold = (0 until 256).flatMap { u =>
      val at = base + (u + 10L) * 100L * wUs
      if (et == "view") (0 until 4).map(j =>
        (u.toLong, 3000000L + u * 10L + j, at + j * 1000L))
      else Seq((u.toLong, 4000000L + u.toLong, at + 30000L))
    }
    (hot ++ cold).toDF("user_id", "event_id", "ts_us")
  }

  private def stratum(c: org.apache.spark.sql.Column, m: Long) =
    pmod(conv(substring(md5(c.cast("string")), 1, 12), 16, 10)
      .cast("long"), lit(m)) === 0L

  private def thin(df: DataFrame, m: Long): DataFrame =
    df.filter(col("user_id") =!= -1L || stratum(col("event_id"), m))

  /** Batch pair mass of the window join over (views, purchases). */
  private def batchJoin(v: DataFrame, p: DataFrame): DataFrame =
    p.select(col("user_id").as("p_user"), col("event_id").as("p_id"),
        col("ts_us").as("p_ts"))
      .join(v.select(col("user_id").as("v_user"),
          col("event_id").as("v_id"), col("ts_us").as("v_ts")),
        expr("p_user = v_user AND " +
          s"v_ts BETWEEN p_ts - $wUs AND p_ts"))

  test("the 1/64 both-sides stratum cuts the densified hot key's pair " +
      "mass ~4096x; cold keys stay hash-exact through the stream") {
    val hotN = 2048
    val (views, purchases) = (feed(hotN, "view"), feed(hotN, "purchase"))
    // ---- the recorded counts (addendum 33) ----
    val unthinned = batchJoin(views, purchases)
      .filter(col("p_user") === -1L).count()
    val vKept = thin(views, 64L)
    val pKept = thin(purchases, 64L)
    val thinnedHot = batchJoin(vKept, pKept)
      .filter(col("p_user") === -1L).count()
    val ratio = unthinned.toDouble / math.max(1L, thinnedHot)
    info(s"hot pair mass: unthinned=$unthinned thinned=$thinnedHot " +
      f"ratio=$ratio%.0fx (kept ${vKept.filter(col("user_id") === -1L).count()} views, " +
      s"${pKept.filter(col("user_id") === -1L).count()} purchases of $hotN each)")
    assert(unthinned >= 2000000L,
      s"the densified key must be genuinely quadratic (got $unthinned)")
    assert(ratio > 1500 && ratio < 16000,
      f"the 1/64x1/64 stratum must land near 4096x (got $ratio%.0fx)")
    // ---- the STREAM with the stress knob ≡ its batch replay ----
    val vDir = graft.streaming.StreamGate.writeOrderedChunks(
      views, "ts_us", chunks = 4, prefix = "skewstress-v")
    val pDir = graft.streaming.StreamGate.writeOrderedChunks(
      purchases, "ts_us", chunks = 4, prefix = "skewstress-p")
    val delayS = 4L * wUs / 1000000L + 1L
    def side(dir: String, a: String) = spark.readStream
      .schema("user_id LONG, event_id LONG, ts_us LONG")
      .option("maxFilesPerTrigger", 1)
      .parquet(dir)
      .filter(col("user_id") =!= -1L || stratum(col("event_id"), 64L))
      .select(col("user_id").as(s"${a}_user"),
        col("event_id").as(s"${a}_id"),
        timestamp_micros(col("ts_us")).as(s"${a}_ts"))
      .withWatermark(s"${a}_ts", s"$delayS seconds")
    val joined = side(pDir, "p").join(side(vDir, "v"),
      expr("p_user = v_user AND " +
        s"v_ts BETWEEN p_ts - INTERVAL $wUs MICROSECOND AND p_ts"))
    val got = graft.streaming.StreamGate.run(spark, joined, "skewstress",
        org.apache.spark.sql.streaming.OutputMode.Append()) { sink =>
      graft.operators.Checkpointing.cut(sink.select(
        col("p_user"), col("p_id"), col("v_id")))
    }.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sorted.toSeq
    val want = batchJoin(vKept, pKept)
      .select("p_user", "p_id", "v_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    assert(got == want,
      "stream emission under the stress stratum must equal the batch " +
        "replay — hot thinned identically, every cold pair exact")
    assert(got.count(_._1 != -1L) == 256 * 4,
      "every cold key's full pair set must survive the hot-side knob")
    assert(got.count(_._1 == -1L) == thinnedHot.toInt)
  }
}
