package graft

import scala.util.Random

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.cdc.Apply
import graft.operators.Relational

/** Top-level so Spark can derive an Encoder (inner classes can't). */
case class Ev(id: Long, k: Long, ts: Long, v: Double)

/** Reference-model checks: random inputs (fixed seed), brute-force Scala
  * oracles, compared row-for-row against the Spark operators. */
class RandomizedSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private val rnd = new Random(20260812)
  private val events: Seq[Ev] = {
    val tss = rnd.shuffle((1 to 400).map(_.toLong * 7)).toIndexedSeq
    (0 until 400).map(i => Ev(i.toLong, rnd.nextInt(12).toLong, tss(i), rnd.nextInt(1000) / 10.0))
  }

  test("asofJoin matches the brute-force reference on random data") {
    val left = events.filter(_.id % 2 == 0)
    val right = events.filter(_.id % 2 == 1)
    val expected = left.map { l =>
      val m = right.filter(r => r.k == l.k && r.ts <= l.ts)
      l.id -> (if (m.isEmpty) None else Some(m.maxBy(r => (r.ts, r.id)).v))
    }.toMap
    val got = Relational.asofJoin(
        left.toDF("event_id", "k", "ts", "v"),
        right.toDF("event_id", "k", "ts", "v"),
        "k", "ts", "ts", "event_id", Seq("v" -> "r_v"))
      .select("event_id", "r_v").as[(Long, Option[Double])].collect().toMap
    assert(got.size == expected.size)
    expected.foreach { case (id, exp) => assert(got(id) == exp, s"id=$id") }
  }

  test("sessionize matches the brute-force reference on random data") {
    val gap = 40L
    val expected = events.groupBy(_.k).flatMap { case (_, es) =>
      val sorted = es.sortBy(e => (e.ts, e.id))
      var sid = 0L
      var prev = Long.MinValue
      sorted.map { e =>
        if (prev == Long.MinValue || e.ts - prev > gap) sid += 1
        prev = e.ts
        e.id -> sid
      }
    }
    val got = Relational.sessionize(
        events.toDF("id", "k", "ts", "v"), "k", "ts", "id", gap)
      .select("id", "session_id").as[(Long, Long)].collect().toMap
    expected.foreach { case (id, sid) => assert(got(id) == sid, s"id=$id") }
  }

  test("latestSnapshot + upsert match the brute-force reference on random data") {
    val ops = Seq("INSERT", "UPDATE", "DELETE")
    val feed = events.map(e => (e.id, "users", ops(rnd.nextInt(3)), e.k, e.ts, e.v, "{}"))
    val df = feed.toDF("lsn", "table_name", "op", "pk", "ts_us", "value", "props")

    val lastPerKey = feed.groupBy(_._4).map { case (k, es) => k -> es.maxBy(_._1) }
    val expSnap = lastPerKey.filter(_._2._3 != "DELETE").map { case (k, e) => k -> e._6 }
    val gotSnap = Apply.latestSnapshot(df)
      .select("pk", "value").as[(Long, Double)].collect().toMap
    assert(gotSnap == expSnap)

    val base = (0L until 20L).map(k => (k, k * 100.0))
    val expUpsert = (base.map(_._1) ++ lastPerKey.keys).distinct.flatMap { k =>
      lastPerKey.get(k) match {
        case Some(e) if e._3 == "DELETE" => None
        case Some(e) => Some(k -> e._6)
        case None => Some(k -> base.find(_._1 == k).get._2)
      }
    }.toMap
    val gotUpsert = Apply.upsert(base.toDF("k", "v"), df, "users", "k", "v")
      .select("pk", "value").as[(Long, Double)].collect().toMap
    assert(gotUpsert == expUpsert)
  }

  test("jaccardPairs prefix-filter join matches brute-force all-pairs") {
    // Random gram sets with planted overlap structure: docs come in families
    // of 3 drawing from a shared pool, so thresholds land above AND below
    // 0.8 — a lossy prefix would show up as a missing pair.
    val docs: Seq[(Long, Seq[String])] = (0 until 90).map { i =>
      val fam = i / 3
      val shared = (0 until 12 + fam % 5).map(k => s"f${fam}_$k")
      val own = (0 until rnd.nextInt(4)).map(k => s"d${i}_$k")
      (i.toLong, rnd.shuffle(shared ++ own).distinct)
    }
    for ((tNum, tDen) <- Seq((4, 5), (1, 2))) {
      val thr = tNum.toDouble / tDen
      val expected = (for {
        (ia, ga) <- docs; (ib, gb) <- docs if ia < ib
        inter = ga.toSet.intersect(gb.toSet).size
        j = BigDecimal(inter.toDouble / (ga.size + gb.size - inter))
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
        if j >= thr
      } yield (ia, ib, j)).toSet
      val got = graft.operators.Dedup.jaccardPairs(
          docs.toDF("doc_id", "grams"), tNum, tDen)
        .as[(Long, Long, Double)].collect().toSet
      assert(got == expected,
        s"t=$tNum/$tDen missing=${(expected -- got).take(3)} extra=${(got -- expected).take(3)}")
    }
  }

  test("map_project_keys matches the interpreted map_filter on random images") {
    // the Bootstrap.slice selector prune: parity with the HOF it replaced,
    // across empty/null maps, absent keys, null values, and entry order
    val cols = Seq("id", "name", "val", "ts", "extra")
    val rows: Seq[(Long, Map[String, String])] = (0 until 200).map { i =>
      val m = cols.filter(_ => rnd.nextBoolean())
        .map(c => c -> (if (rnd.nextInt(5) == 0) null else s"v$i$c")).toMap
      (i.toLong, if (i % 17 == 0) null else m)
    }
    val df = rows.toDF("id", "img")
    for (sel <- Seq(Seq("id", "name"), Seq("nope"), Seq("val", "ts", "extra"))) {
      val keep = org.apache.spark.sql.functions.array(sel.map(
        org.apache.spark.sql.functions.lit): _*)
      val native = df.select($"id", graft.plans.MapProjectKeys.project(
          spark, $"img", keep).as("m"))
        .as[(Long, Map[String, String])].collect().toMap
      val hof = df.select($"id", org.apache.spark.sql.functions.map_filter(
          $"img", (k, _) => org.apache.spark.sql.functions.array_contains(keep, k)).as("m"))
        .as[(Long, Map[String, String])].collect().toMap
      assert(native == hof, s"selector $sel diverged")
    }
  }

  test("md5 minhash matches an independent slow reference on random texts") {
    // independent path: Java-regex tokenization + MessageDigest + BigInteger
    // affine mod p — shares NO code with the native gram walk, so it
    // catches tokenization drift (empties, multi-byte, \x0B) and modmul
    // bugs alike
    val p = java.math.BigInteger.valueOf(graft.plans.NativeHashes.MersenneP61)
    val (pa, pb) = graft.plans.NativeHashes.minhashPerms(16)
    val md = java.security.MessageDigest.getInstance("MD5")
    def md5p60(s: String): Long = {
      val d = md.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      java.lang.Long.parseLong(d.take(8).map(b => f"$b%02x").mkString.take(15), 16)
    }
    def refSig(text: String, k: Int): Array[Long] = {
      // Spark's trim strips ONLY 0x20 spaces (unlike Java String.trim,
      // which also strips \t and friends — a real divergence this spec
      // caught on first run)
      val lowered = text.toLowerCase
      val sparkTrimmed = lowered.dropWhile(_ == ' ').reverse.dropWhile(_ == ' ').reverse
      val toks = sparkTrimmed.split("\\s+", -1).toSeq
      val grams = if (toks.size < k) Seq(toks.mkString(" "))
        else toks.sliding(k).map(_.mkString(" ")).toSeq
      Array.tabulate(16) { i =>
        grams.map { g =>
          java.math.BigInteger.valueOf(pa(i)).multiply(java.math.BigInteger.valueOf(md5p60(g)))
            .add(java.math.BigInteger.valueOf(pb(i))).mod(p).longValueExact()
        }.min
      }
    }
    val alphabet = "ab c\tdé\n 日本 x!"
    val texts = (0 until 60).map { i =>
      val len = rnd.nextInt(40)
      (0 until len).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
    } :+ "" :+ "   " :+ "one"
    val got = texts.toDF("text")
      .select(graft.plans.NgramHashes.minhashMd5(spark, $"text", 3, 16).as("sig"))
      .as[Array[Long]].collect()
    got.zip(texts).foreach { case (sig, t) =>
      assert(sig.sameElements(refSig(t, 3)), s"sig mismatch for ${t.take(30).mkString}")
    }
  }

  test("Behavior.funnel matches a brute-force reference on random journeys") {
    val rnd = new scala.util.Random(23)
    val types = Vector("view", "click", "purchase", "other")
    // many users, few events each, unique timestamps so strict-order
    // semantics are unambiguous
    val evs = new scala.util.Random(7)
      .shuffle((0 until 3000).map { i =>
        (rnd.nextInt(300).toLong, types(rnd.nextInt(types.size)), i.toLong)
      }.toVector)
    // sequential per-user reference model
    val stages = Seq("view", "click", "purchase")
    val byUser = evs.groupBy(_._1)
    var expected = Vector.empty[(String, Long, Option[Long])]
    var reach = byUser.flatMap { case (u, es) =>
      es.filter(_._2 == stages.head).map(_._3).sorted.headOption.map(u -> _)
    }
    expected :+= (("1_view", reach.size.toLong, None: Option[Long]))
    for ((st, i) <- stages.tail.zipWithIndex) {
      val next = reach.flatMap { case (u, prevTs) =>
        byUser(u).filter(e => e._2 == st && e._3 > prevTs)
          .map(_._3).sorted.headOption.map(ts => u -> (ts, prevTs))
      }
      val sum = next.values.map { case (ts, prev) => ts - prev }.sum
      expected :+= ((s"${i + 2}_$st", next.size.toLong,
        if (next.isEmpty) None else Some(sum)))
      reach = next.map { case (u, (ts, _)) => u -> ts }
    }
    val got = operators.Behavior.funnel(
        evs.toDF("user_id", "event_type", "ts_us").repartition(7),
        "user_id", "event_type", "ts_us", stages)
      .as[(String, Long, Option[Long])].collect().toSeq
    assert(got == expected, s"got=$got\nexpected=$expected")
  }

  test("topKPerGroup matches the brute-force reference on random data") {
    val k = 3
    val expected = events.groupBy(_.k).flatMap { case (_, es) =>
      es.sortBy(e => (-e.v, e.id)).take(k).map(_.id)
    }.toSet
    val got = Relational.topKPerGroup(
        events.toDF("id", "k", "ts", "v"), Seq("k"), Seq($"v".desc, $"id"), k)
      .select("id").as[Long].collect().toSet
    assert(got == expected)
  }

  test("ThresholdSelect matches the brute-force rank on random hashes, many k rules") {
    // random md5-like hex incl. DUPLICATE hashes (tie-break path), skewed
    // group sizes incl. a singleton group; several k rules per dataset
    val groups = Seq("a", "b", "c", "single")
    val rows = (0 until 600).map { i =>
      val g = if (i == 599) "single" else groups(rnd.nextInt(3))
      // 1-in-4 rows reuse a shared hash to force (h, id) tie-breaks
      val h = if (rnd.nextInt(4) == 0) f"00dup${rnd.nextInt(5)}%02d" + "0" * 24
        else (1 to 32).map(_ => "0123456789abcdef" (rnd.nextInt(16))).mkString
      (g, i.toLong, h)
    }
    val df = rows.toDF("g", "id", "h")
    for ((name, kf) <- Seq[(String, Long => Long)](
        ("ceil n/5", n => (n + 4) / 5), ("1", _ => 1L),
        ("n/2", n => n / 2), ("all", n => n), ("none", _ => 0L))) {
      val expected = rows.groupBy(_._1).flatMap { case (_, rs) =>
        rs.sortBy(r => (r._3, r._2)).take(kf(rs.size.toLong).toInt).map(_._2)
      }.toSet
      val got = graft.operators.ThresholdSelect
        .smallestByHash(df, "g", "h", "id", kf, bucketHexChars = 2)
        .select("id").as[Long].collect().toSet
      assert(got == expected, s"k rule '$name': got ${got.size}, want ${expected.size}")
    }
  }

  test("orderedDeltas matches the window lag on random data with heavy duplicates") {
    // values drawn from a small range so duplicates are common — including
    // duplicates that straddle range-slice boundaries (the boundary-fix
    // path must yield delta 0 for them, exactly like the window form)
    val rows = (0 until 500).map(_ => (s"t${rnd.nextInt(3)}", rnd.nextInt(120).toLong))
    val expected = rows.groupBy(_._1).view.mapValues { rs =>
      val s = rs.map(_._2).sorted
      s.zip(s.drop(1)).map { case (a, b) => b - a }.sorted
    }.toMap
    val out = graft.operators.PrefixSum
      .orderedDeltas(rows.toDF("g", "v"), "g", "v", "d")
      .select("g", "d").as[(String, Option[Long])].collect()
    // exactly one null (first row) per group; delta multisets identical
    val nulls = out.filter(_._2.isEmpty).groupBy(_._1).view.mapValues(_.length)
    assert(nulls.toMap == rows.map(_._1).distinct.map(_ -> 1).toMap)
    val got = out.collect { case (g, Some(d)) => (g, d) }
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap
    assert(got == expected.view.mapValues(_.toSeq).toMap)
  }

  test("PrefixSum matches the brute-force running sum on random data incl. negatives") {
    val rows = (0 until 500).map { i =>
      (s"g${rnd.nextInt(4)}", i.toLong, (rnd.nextInt(200) - 80).toLong)
    }
    val expected = rows.groupBy(_._1).flatMap { case (_, rs) =>
      var acc = 0L
      rs.sortBy(_._2).map { r => acc += r._3; r._2 -> acc }
    }.toMap
    val got = graft.operators.PrefixSum
      .cumSum(rows.toDF("g", "id", "v"), "g", Seq($"id"), "v", "cum")
      .select("id", "cum").as[(Long, Long)].collect().toMap
    assert(got == expected)
  }

  test("last-touch attribution matches the brute-force reference on random journeys") {
    val types = Seq("view", "click", "signup", "purchase", "error")
    val evs = (0 until 600).map { i =>
      (rnd.nextInt(25).toLong, i.toLong, types(rnd.nextInt(types.size)),
        rnd.nextInt(300).toLong, rnd.nextInt(5000) / 100.0)
    }
    val touches = Set("view", "click", "signup")
    val expected = evs.groupBy(_._1).flatMap { case (_, rs) =>
      val ordered = rs.sortBy(r => (r._4, r._2))
      var touch: Option[String] = None
      ordered.flatMap { r =>
        val out = if (r._3 == "purchase")
          Some(r._2 -> touch.getOrElse("direct")) else None
        if (touches(r._3)) touch = Some(r._3)
        out
      }
    }
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("ts_us", "event_id")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val got = evs.toDF("user_id", "event_id", "event_type", "ts_us", "value")
      .withColumn("touch", last(
        when(col("event_type").isin(touches.toSeq: _*), col("event_type")),
        ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase")
      .select(col("event_id"), coalesce(col("touch"), lit("direct")).as("ch"))
      .as[(Long, String)].collect().toMap
    assert(got == expected)
  }

  test("gap-fill carry law matches the brute-force reference on random series") {
    val evs = (0 until 400).map { i =>
      (rnd.nextInt(15).toLong, i.toLong, rnd.nextInt(40).toLong,
        (rnd.nextInt(900) + 1) / 10.0)
    }
    // reference: per user, last event per day by (day, id); forward fill
    val expected = evs.groupBy(_._1).flatMap { case (u, rs) =>
      val daily = rs.groupBy(_._3).view
        .mapValues(_.maxBy(_._2)._4).toMap
      val (d0, d1) = (rs.map(_._3).min, rs.map(_._3).max)
      var lastV = Option.empty[Double]
      (d0 to d1).map { d =>
        if (daily.contains(d)) lastV = Some(daily(d))
        (u, d) -> (lastV.get, !daily.contains(d))
      }
    }
    // Spark: the q_gap_fill shape over the same crafted frame (ts == day
    // here, so the close pick is by (ts, event_id) = (day, id))
    val e = evs.toDF("user_id", "event_id", "day", "value")
    val wPick = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id", "day").orderBy(col("event_id").desc)
    val daily = e.withColumn("rn", row_number().over(wPick))
      .filter(col("rn") === 1).select("user_id", "day", "value")
    val spine = e.groupBy("user_id")
      .agg(min("day").as("d0"), max("day").as("d1"))
      .select(col("user_id"), explode(sequence(col("d0"), col("d1"))).as("day"))
    val wFill = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("day")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val got = spine.join(daily, Seq("user_id", "day"), "left")
      .withColumn("filled", col("value").isNull)
      .withColumn("vf", last("value", ignoreNulls = true).over(wFill))
      .select("user_id", "day", "vf", "filled")
      .as[(Long, Long, Double, Boolean)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    assert(got == expected)
  }
}
