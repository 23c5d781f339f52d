package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.Bloom

/** Bloom-filter semi-join pruning: no false negatives ever, a sane false-
  * positive rate at the designed load, partition-order-independent merge,
  * and result parity between the bloom-pruned join and the plain join.
  */
class BloomSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private val numBits = 1 << 14
  private val k = 5

  test("no false negatives: every inserted key passes, FP rate is sane") {
    val rnd = new scala.util.Random(11)
    val keys = Seq.fill(500)(rnd.nextLong()).distinct
    val bloomBytes = Bloom.build(spark, keys.toDF("key"), "key", numBits, k)
      .as[Array[Byte]].head()
    keys.foreach(key => assert(Bloom.mightContain(bloomBytes, key)))
    // ~500 keys in 16384 bits, k=5 → theoretical FP ≈ (1-e^(-5·500/16384))^5
    // ≈ 5e-5; assert a generous 1% over a disjoint probe set
    val probes = Seq.fill(20000)(rnd.nextLong()).filterNot(keys.contains)
    val fp = probes.count(Bloom.mightContain(bloomBytes, _))
    assert(fp.toDouble / probes.size < 0.01, s"$fp/${probes.size} false positives")
  }

  test("the artifact carries its hash count; probing non-artifacts fails loudly") {
    val art = Bloom.build(spark, Seq(7L).toDF("key"), "key", numBits, k)
      .as[Array[Byte]].head()
    // header = magic + k, then the bit words — k can never drift from the
    // build (a larger probe-side k would silently false-negative)
    assert(art.length == Bloom.HeaderBytes + numBits / 8)
    assert(Bloom.mightContain(art, 7L))
    val headerless = java.util.Arrays.copyOfRange(art, Bloom.HeaderBytes, art.length)
    val e1 = intercept[IllegalArgumentException](Bloom.mightContain(headerless, 7L))
    assert(e1.getMessage.contains("magic"))
    // a corrupted k in an otherwise-valid header must not no-op (k=0 is
    // "always true" — silent non-pruning)
    val zeroK = art.clone(); zeroK(4) = 0
    val e2 = intercept[IllegalArgumentException](Bloom.mightContain(zeroK, 7L))
    assert(e2.getMessage.contains("numHashes"))
  }

  test("merge is partition-independent: sharded build equals 1-partition build") {
    val keys = (1L to 3000L).map(i => i * 2654435761L).toDF("key")
    val one = Bloom.build(spark, keys.repartition(1), "key", numBits, k)
      .as[Array[Byte]].head()
    val many = Bloom.build(spark, keys.repartition(13), "key", numBits, k)
      .as[Array[Byte]].head()
    assert(java.util.Arrays.equals(one, many))
  }

  test("pure SQL surface: bloom_agg + bloom_contains") {
    Bloom.register(spark)
    Seq(1L, 2L, 3L).toDF("key").createOrReplaceTempView("bloom_keys")
    val got = spark.sql(
      s"""WITH b AS (SELECT bloom_agg(key, $numBits, $k) AS bloom FROM bloom_keys)
         |SELECT probe, bloom_contains(b.bloom, probe) AS hit
         |FROM b CROSS JOIN (SELECT explode(sequence(1L, 4L)) AS probe)
         |ORDER BY probe""".stripMargin)
      .as[(Long, Boolean)].collect().toSeq
    assert(got.take(3).forall(_._2))
    // key 4 was never inserted; with 3 keys in 16k bits a FP is ~impossible
    assert(!got(3)._2)
  }

  test("q_bloom_join equals the plain (unpruned) join") {
    val sel = sources.Tables(spark, sf, "orders")
      .filter($"o_totalprice" > 450000.0)
      .select("o_orderkey", "o_orderpriority")
    val plain = sources.Tables(spark, sf, "lineitem")
      .join(sel, $"l_orderkey" === $"o_orderkey")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_items"),
        round(sum($"l_extendedprice" * (lit(1) - $"l_discount")), 4).as("revenue"))
      .orderBy("o_orderpriority")
      .as[(String, Long, Double)].collect().toSeq
    val pruned = SparkEntry.queries("q_bloom_join")(spark, sf)
      .as[(String, Long, Double)].collect().toSeq
    assert(pruned == plain)
    assert(pruned.nonEmpty)
  }

  test("bitmap_distinct equals exact countDistinct under forced partial merges") {
    graft.plans.NativeFunctions.register(spark)
    val rnd = new scala.util.Random(3)
    val df = Seq.fill(5000)((rnd.nextInt(4), rnd.nextInt(700).toLong))
      .toDF("g", "id").repartition(11)
    val viaBitmap = df.groupBy("g")
      .agg(call_function("bitmap_distinct", $"id", lit(1024)).as("n"))
      .orderBy("g").as[(Int, Long)].collect().toSeq
    val exact = df.groupBy("g").agg(countDistinct($"id").as("n"))
      .orderBy("g").as[(Int, Long)].collect().toSeq
    assert(viaBitmap == exact)
  }

  test("bitmap_distinct fails loudly on keys outside the declared domain") {
    graft.plans.NativeFunctions.register(spark)
    val err = intercept[Exception] {
      Seq(5L, 2000L).toDF("id")
        .agg(call_function("bitmap_distinct", $"id", lit(1024))).collect()
    }
    assert(err.getMessage != null)
    // nulls are skipped (SQL aggregate semantics), not range-checked
    val ok = Seq(Some(5L), None, Some(6L)).toDF("id")
      .agg(call_function("bitmap_distinct", $"id", lit(1024)))
      .as[Long].head()
    assert(ok == 2L)
  }

  test("q_bloom_join plans the prefilter BELOW the equi-join (pre-shuffle)") {
    import org.apache.spark.sql.catalyst.plans.logical.Join
    val lp = SparkEntry.queries("q_bloom_join")(spark, sf)
      .queryExecution.optimizedPlan
    val equiJoins = lp.collect {
      case j: Join if j.condition.exists(_.toString.contains("l_orderkey")) => j
    }
    assert(equiJoins.nonEmpty, s"no equi-join in:\n${lp.toString.take(2000)}")
    // the probe-side subtree of the key join must carry the bloom filter —
    // i.e. pruning happens before rows reach the join's exchange
    assert(equiJoins.exists(j =>
      j.left.toString.contains("bloom_contains") ||
        j.right.toString.contains("bloom_contains")),
      s"bloom_contains not under the join:\n${lp.toString.take(3000)}")
  }

  test("the bloom prefilter actually prunes probe rows at the designed load") {
    val li = sources.Tables(spark, sf, "lineitem")
    val sel = sources.Tables(spark, sf, "orders")
      .filter($"o_totalprice" > 450000.0)
    val bloom = Bloom.build(spark, sel.select("o_orderkey"), "o_orderkey",
      1 << 17, k)
    val kept = li.crossJoin(broadcast(bloom))
      .filter(Bloom.contains(spark, $"bloom", $"l_orderkey")).count()
    val total = li.count()
    val trueMatches = li.join(sel, $"l_orderkey" === $"o_orderkey").count()
    assert(kept >= trueMatches) // never loses a matching row
    assert(kept < total / 2, s"pruned only ${total - kept} of $total")
  }
}
