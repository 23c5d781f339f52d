package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Text
import graft.plans.NativeHashes

class NativeHashSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("native minhash: identical docs → identical sigs; near-dup overlaps; disjoint doesn't") {
    val base = "the quick brown fox jumps over the lazy dog again and again today"
    val near = base.replace("today", "tomorrow")
    val far = "completely different words nothing shared here at all whatsoever ok ok"
    val sigs = Seq((0L, base), (1L, base), (2L, near), (3L, far)).toDF("doc_id", "text")
      .select($"doc_id",
        NativeHashes.minhashSig(spark, Text.wordShingles($"text", 3), 64).as("sig"))
      .orderBy("doc_id").collect().map(_.getSeq[Long](1).toVector)
    assert(sigs(0) == sigs(1))
    val overlapNear = sigs(0).zip(sigs(2)).count { case (a, b) => a == b }
    val overlapFar = sigs(0).zip(sigs(3)).count { case (a, b) => a == b }
    assert(overlapNear > 32, s"near overlap $overlapNear/64")
    assert(overlapFar < 8, s"far overlap $overlapFar/64")
  }

  test("native minhash matches the HOF reference implementation exactly") {
    // same chain: xxhash64(s) once, then xxhash64(h, permIndex) — signatures
    // from the two implementations must be interchangeable
    val df = Seq("the quick brown fox jumps over it", "a b c d e", "solo")
      .toDF("text")
    val got = df.select(
      NativeHashes.minhashSig(spark, Text.wordShingles($"text", 2), 32).as("native"),
      graft.functions.Hashes.minhash(Text.wordShingles($"text", 2), 32).as("hof"))
      .collect()
    got.foreach(r => assert(r.getSeq[Long](0) == r.getSeq[Long](1)))
  }

  test("native simhash matches the HOF reference implementation exactly") {
    // same hash chain for the per-token hash (xxhash64 = XXH64 seed 42), so
    // the two implementations must agree bit-for-bit
    val df = Seq("spark engine table scan join merge", "a b c", "x")
      .toDF("text")
    val got = df.select(
      NativeHashes.simhashSig(spark, Text.wsTokens($"text")).as("native"),
      graft.functions.Hashes.simhash(Text.wsTokens($"text")).as("hof"))
      .collect()
    got.foreach(r => assert(r.getLong(0) == r.getLong(1)))
  }

  test("minhash_merge(sigs) == sig of the union of the token sets") {
    // with 1-shingles the shingle set is the token set, and min-wise sigs
    // compose: elementwise-min of member sigs = sig of the union
    val a = "alpha beta gamma delta"
    val b = "gamma delta epsilon zeta"
    val c = "eta theta"
    val merged = Seq(a, b, c).toDF("text")
      .select(NativeHashes.minhashSig(spark, Text.wordShingles($"text", 1), 64).as("sig"))
      .agg(NativeHashes.minhashMerge(spark, $"sig").as("m"))
      .collect().head.getSeq[Long](0).toVector
    val unionSig = Seq(s"$a $b $c").toDF("text")
      .select(NativeHashes.minhashSig(spark, Text.wordShingles($"text", 1), 64).as("sig"))
      .collect().head.getSeq[Long](0).toVector
    assert(merged == unionSig)
  }

  test("native hyperplane sigs match the HOF reference implementation exactly") {
    val vecs = (0 until 20).map(i =>
      Tuple1(Array.tabulate(16)(j => ((i * 31 + j * 7) % 13).toFloat - 6f)))
    val df = vecs.toDF("e")
    val got = df.select(
      graft.plans.HyperplaneSigs.sigs(spark, $"e", 8, 4).as("native"),
      graft.functions.Vectors.hyperplaneSigs($"e", 8, 4).as("hof"),
      graft.plans.HyperplaneSigs.sig(spark, $"e", 12).as("native1"),
      graft.functions.Vectors.hyperplaneSig($"e", 12).as("hof1"))
      .collect()
    got.foreach { r =>
      assert(r.getSeq[Long](0) == r.getSeq[Long](1))
      assert(r.getLong(2) == r.getLong(3))
    }
  }

  test("native cosine matches the HOF reference bit-for-bit") {
    val rows = (0 until 25).map { i =>
      (Array.tabulate(32)(j => ((i + j * 3) % 11).toFloat - 5f),
        Array.tabulate(32)(j => ((i * 7 + j) % 9).toFloat - 4f))
    }
    val df = rows.toDF("a", "b")
    val got = df.select(
      graft.plans.CosineSim.cosine(spark, $"a", $"b").as("native"),
      graft.functions.Vectors.cosine($"a", $"b").as("hof"))
      .collect()
    got.foreach(r => assert(
      java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1))))
  }

  test("native ngram hashes match the HOF chain bit-for-bit on edge cases") {
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog",
      "",                       // empty → one empty token → one gram
      "   ",                    // spaces only → trims to empty
      "one",                    // fewer tokens than k → single joined gram
      "one two",                // still fewer than k=3
      "a  b\t\tc\nd",           // mixed whitespace runs collapse
      "\tleading tab token",    // leading \s run → empty first token
      "trailing ws  \t ",       // trailing runs dropped
      "Ünïcode ÜPPER case über straße", // unicode lowercasing
      "dup dup dup dup dup")    // repeated grams → distinct
    val df = texts.toDF("text")
    val hof = array_distinct(transform(
      graft.functions.Text.wordShingles($"text", 3), g => xxhash64(g)))
    val rows = df.select(
      graft.plans.NgramHashes.hashes(spark, $"text", 3).as("native"),
      hof.as("ref")).collect()
    rows.zip(texts).foreach { case (r, t) =>
      assert(r.getSeq[Long](0) == r.getSeq[Long](1),
        s"ngram hash mismatch for input '$t'")
    }
  }

  test("text-direct minhash matches minhashSig over wordShingles bit-for-bit") {
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog and more words here",
      "", "   ", "one", "one two",
      "a  b\t\tc\nd", "\tleading tab", "trailing ws  \t ",
      "Ünïcode ÜPPER case über straße",
      "dup dup dup dup dup")
    val rows = texts.toDF("text").select(
      graft.plans.NgramHashes.minhash(spark, $"text", 3, 64).as("direct"),
      NativeHashes.minhashSig(spark, Text.wordShingles($"text", 3), 64).as("ref"))
      .collect()
    rows.zip(texts).foreach { case (r, t) =>
      assert(r.getSeq[Long](0) == r.getSeq[Long](1), s"minhash mismatch for '$t'")
    }
  }

  test("md5 simhash: token hash matches the oracle's hex-prefix read, votes are strict") {
    // the cross-engine contract: md5Token60 must equal DuckDB's
    // ('0x' || substr(md5(tok), 1, 15))::BIGINT — pin it on a known digest
    // (md5('hello') = 5d41402abc4b2a76..., first 15 nibbles = 0x5d41402abc4b2a7)
    val md = java.security.MessageDigest.getInstance("MD5")
    assert(graft.plans.NativeHashes.md5Token60(md,
      org.apache.spark.unsafe.types.UTF8String.fromString("hello")) == 0x5d41402abc4b2a7L)
    assert(graft.plans.NativeHashes.md5Token60(md,
      org.apache.spark.unsafe.types.UTF8String.fromString("")) ==
      java.lang.Long.parseLong("d41d8cd98f00b20", 16)) // md5('') prefix
    // signature stays within 60 bits, deterministic, single-token sig = its hash
    val rows = Seq(Seq("hello"), Seq("hello", "hello"), Seq.empty[String])
      .toDF("toks")
      .select(graft.plans.NativeHashes.md5SimhashSig(spark, $"toks").as("sig"))
      .as[Long].collect()
    assert(rows(0) == 0x5d41402abc4b2a7L) // one token: every set bit wins its vote
    assert(rows(1) == rows(0)) // duplicate tokens don't flip votes
    assert(rows(2) == 0L) // no tokens, no votes: strict > 0 leaves all bits clear
    assert(rows.forall(s => s >= 0L && s < (1L << 60)))
  }

  test("md5 fingerprint: native matches the HOF reference and DuckDB goldens") {
    val texts = Seq("hello world  x", "", "x world hello", "hello hello",
      "  pad  ", "Ünïcode straße")
    val rows = texts.toDF("text").select(
      graft.plans.NativeHashes.md5Fingerprint(spark, Text.wsTokens($"text")).as("native"),
      Text.fingerprint($"text").as("ref"))
      .as[(Long, Long)].collect()
    rows.zip(texts).foreach { case ((n, r), t) =>
      assert(n == r, s"fingerprint mismatch for '$t'") }
    // goldens computed by DuckDB's list_reduce replay — the cross-engine contract
    assert(rows(0)._1 == 692887712196623L) // "hello world  x"
    assert(rows(1)._1 == 282973524984089L) // "" → one empty token
    // order sensitivity: same bag of tokens, different fingerprint
    assert(rows(0)._1 != rows(2)._1)
  }

  test("native word shingles match Text.wordShingles bit-for-bit") {
    // duplicates kept + document order preserved — the properties the
    // distinct-hash form deliberately drops — across the same boundary
    // cases the hash parity spec uses
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog and more words here",
      "", "   ", "one", "one two",
      "a  b\t\tc\nd", "\tleading tab", "trailing ws  \t ",
      "Ünïcode ÜPPER case über straße",
      "dup dup dup dup dup")
    for (k <- Seq(1, 2, 3)) {
      val rows = texts.toDF("text").select(
        graft.plans.NgramHashes.shingles(spark, $"text", k).as("native"),
        Text.wordShingles($"text", k).as("ref"))
        .collect()
      rows.zip(texts).foreach { case (r, t) =>
        assert(r.getSeq[String](0) == r.getSeq[String](1),
          s"shingle mismatch for k=$k '$t'")
      }
    }
  }

  test("native lsh bands: equal buckets iff the band's signature slots agree") {
    // sigA and sigB share bands 0 and 2 exactly, differ in 1 and 3; sigC
    // has band 1's CONTENT at band 0 — the band-index seed must separate it
    val sigA = Array(1L, 2L, 3L, 4L, 10L, 20L, 30L, 40L, 5L, 6L, 7L, 8L, 9L, 9L, 9L, 9L)
    val sigB = Array(1L, 2L, 3L, 4L, 11L, 21L, 31L, 41L, 5L, 6L, 7L, 8L, 8L, 8L, 8L, 8L)
    val sigC = Array(10L, 20L, 30L, 40L) ++ sigA.drop(4)
    val rows = Seq(sigA, sigB, sigC).toDF("sig")
      .select(graft.plans.NgramHashes.bands(spark, $"sig", 4, 4).as("b"))
      .as[Array[Long]].collect()
    assert(rows(0)(0) == rows(1)(0) && rows(0)(2) == rows(1)(2))
    assert(rows(0)(1) != rows(1)(1) && rows(0)(3) != rows(1)(3))
    // sigA band 1 and sigC band 0 hold the SAME content (10,20,30,40) at
    // different band indices — only the band-index seed separates them
    assert(rows(0)(1) != rows(2)(0), "band-index seed failed to separate shifted content")
  }

  test("mulmodP61 matches BigInteger modular multiplication") {
    val p = java.math.BigInteger.valueOf(NativeHashes.MersenneP61)
    val rnd = new scala.util.Random(7)
    val edge = Seq(0L, 1L, NativeHashes.MersenneP61 - 1, NativeHashes.MersenneP61,
      (1L << 60) - 1, 1L << 60)
    val samples = edge.flatMap(a => edge.map(a -> _)) ++
      Seq.fill(2000)((rnd.nextLong() >>> 3, rnd.nextLong() >>> 3))
    samples.foreach { case (a, b) =>
      val expect = java.math.BigInteger.valueOf(a)
        .multiply(java.math.BigInteger.valueOf(b)).mod(p).longValueExact()
      assert(NativeHashes.mulmodP61(a, b) == expect, s"mulmod($a, $b)")
    }
  }

  test("md5 affine minhash matches the DuckDB replay goldens") {
    // goldens from DuckDB: min over grams of
    // ((md5p60('minhash-a:i')+1) * md5p60(gram) + md5p60('minhash-b:i'))
    // mod 2^61-1 — the cross-engine contract behind the minhash-family
    // oracles (k=3 word shingles; '' → one empty token → one gram)
    val rows = Seq("hello world foo bar", "", "hello world foo bar")
      .toDF("text")
      .select(graft.plans.NgramHashes.minhashMd5(spark, $"text", 3, 64).as("sig"))
      .as[Array[Long]].collect()
    assert(rows(0).take(4).sameElements(Array(
      1752949636433043825L, 801808260001346020L, 954226664265791715L, 1023276470896444867L)))
    assert(rows(1).take(4).sameElements(Array(
      835270611853338558L, 1421297784239637416L, 1784337467693709537L, 1894019179635369449L)))
    assert(rows(0).sameElements(rows(2)), "same text must sign identically")
    assert(rows(0).length == 64 && rows(0).forall(s => s >= 0L && s < NativeHashes.MersenneP61))
    // independent JVM-path cross-check of one slot: gram hashes via
    // md5Token60 on the two shingles of the 4-token doc, affine via
    // BigInteger — must equal slot 0 of the native walk
    val md = java.security.MessageDigest.getInstance("MD5")
    def m60(s: String) = NativeHashes.md5Token60(md, org.apache.spark.unsafe.types.UTF8String.fromString(s))
    val (pa, pb) = NativeHashes.minhashPerms(64)
    val p = java.math.BigInteger.valueOf(NativeHashes.MersenneP61)
    val slot0 = Seq("hello world foo", "world foo bar").map { gram =>
      java.math.BigInteger.valueOf(pa(0)).multiply(java.math.BigInteger.valueOf(m60(gram)))
        .add(java.math.BigInteger.valueOf(pb(0))).mod(p).longValueExact()
    }.min
    assert(rows(0)(0) == slot0)
  }

  test("md5 hyperplane family: plane components match the oracle's derivation") {
    // plane(p, j) = md5prefix60("plane:p:j") % 1e6 / 5e5 - 1, the value the
    // DuckDB replay derives; check the expression's cached matrix against
    // an independent recomputation through md5Token60
    val expr = graft.plans.HyperplaneSigsExpr(
      org.apache.spark.sql.catalyst.expressions.Literal(null,
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType)),
      8, 4, md5Planes = true)
    val m = expr.planeMatrix(16)
    val md = java.security.MessageDigest.getInstance("MD5")
    for (p <- Seq(0, 7, 31); j <- Seq(0, 15)) {
      val h = NativeHashes.md5Token60(md,
        org.apache.spark.unsafe.types.UTF8String.fromString(s"plane:$p:$j"))
      assert(m(p)(j) == (h % 1000000L).toDouble / 500000.0 - 1.0, s"plane($p)($j)")
    }
    assert(m.length == 32 && m.forall(row => row.forall(v => v >= -1.0 && v <= 1.0)))
    // distinct from the XXH64 family (different pseudo-randomness source)
    val xxh = graft.plans.HyperplaneSigsExpr(expr.child, 8, 4).planeMatrix(16)
    assert(!m(0).sameElements(xxh(0)))
  }

  test("project_planes matches an independent matrix multiply and the sig signs") {
    // the JL projection must be the exact fold the signature expression
    // signs: recompute proj through the spec's own matrix walk, and check
    // sign-consistency against hyperplane_sigs_md5 table 0
    val vecs = (0 until 6).map(i =>
      (i.toLong, Array.tabulate(16)(j => ((i * 5 + j * 3) % 11).toFloat - 5f)))
    val df = vecs.toDF("vec_id", "emb")
    val out = df.select($"vec_id",
        graft.plans.HyperplaneSigs.project(spark, $"emb", 8).as("proj"),
        graft.plans.HyperplaneSigs.sigsMd5(spark, $"emb", 8, 1).as("sigs"))
      .as[(Long, Seq[Double], Seq[Long])].collect()
    val md = java.security.MessageDigest.getInstance("MD5")
    val m = Array.tabulate(8, 16) { (p, j) =>
      val h = NativeHashes.md5Token60(md,
        org.apache.spark.unsafe.types.UTF8String.fromString(s"plane:$p:$j"))
      (h % 1000000L).toDouble / 500000.0 - 1.0
    }
    out.foreach { case (id, proj, sigs) =>
      val vec = vecs(id.toInt)._2
      (0 until 8).foreach { p =>
        var expect = 0.0
        (0 until 16).foreach(k => expect += vec(k).toDouble * m(p)(k))
        assert(proj(p) == expect, s"vec $id plane $p: ${proj(p)} vs $expect")
        assert(((sigs.head >> p) & 1L) == (if (proj(p) >= 0) 1L else 0L),
          s"vec $id plane $p sign mismatch")
      }
    }
  }

  test("native dot_prod and vec_scale match HOF references bit-for-bit") {
    val rows = (0 until 25).map { i =>
      (Array.tabulate(32)(j => ((i + j * 3) % 11).toFloat - 5f),
        Array.tabulate(32)(j => ((i * 7 + j) % 9).toFloat - 4f),
        (i - 12) * 0.37)
    }
    val df = rows.toDF("a", "b", "s")
    df.select(
        graft.plans.DotProd.dot(spark, $"a", $"b").as("native"),
        graft.functions.Vectors.dot($"a", $"b").as("hof"))
      .collect().foreach(r => assert(
        java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
          java.lang.Double.doubleToLongBits(r.getDouble(1))))
    df.select(
        graft.plans.VecScale.scale(spark, $"a", $"s").as("native"),
        transform($"a", x => x.cast("double") * $"s").as("hof"))
      .collect().foreach { r =>
        val n = r.getSeq[Double](0); val h = r.getSeq[Double](1)
        assert(n.length == h.length)
        n.zip(h).foreach { case (x, y) => assert(
          java.lang.Double.doubleToLongBits(x) ==
            java.lang.Double.doubleToLongBits(y)) }
      }
  }

  test("sorted_intersect_count: parity with size(array_intersect) on random sets") {
    val rnd = new scala.util.Random(7)
    val rows = (0 until 300).map { i =>
      def set() = Seq.fill(rnd.nextInt(40))(rnd.nextInt(60).toLong)
        .distinct.sorted
      (i.toLong, set(), set())
    }
    val df = rows.toDF("id", "a", "b")
    val got = df.select($"id",
        graft.plans.SortedIntersectCount.count(spark, $"a", $"b").as("n"))
      .as[(Long, Long)].collect().toMap
    rows.foreach { case (id, a, b) =>
      assert(got(id) == a.toSet.intersect(b.toSet).size.toLong,
        s"row $id: merge walk diverged from set intersection") }
    // empty sides
    val e = Seq((Seq.empty[Long], Seq(1L, 2L))).toDF("a", "b")
    assert(e.select(graft.plans.SortedIntersectCount.count(spark, $"a", $"b"))
      .head().getLong(0) == 0L)
  }

  test("all native expressions compile under CODEGEN_ONLY (no silent fallback)") {
    // Spark silently falls back to interpreted eval when generated code
    // fails to compile — which would erase the whole point of doGenCode and
    // break the surrounding whole-stage span. Force codegen-only so a broken
    // generator fails the suite instead.
    val conf = spark.conf
    val oldFactory = conf.getOption("spark.sql.codegen.factoryMode")
    val oldFallback = conf.getOption("spark.sql.codegen.fallback")
    conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    conf.set("spark.sql.codegen.fallback", "false")
    try {
      val rows = (0 until 8).map { i =>
        ("alpha beta gamma delta epsilon zeta",
          Array.tabulate(16)(j => ((i + j) % 7).toFloat - 3f),
          Array.tabulate(16)(j => ((i * 3 + j) % 5).toFloat - 2f))
      }
      val df = rows.toDF("text", "a", "b")
      val out = df.select(
        NativeHashes.minhashSig(spark, Text.wordShingles($"text", 2), 16).as("mh"),
        NativeHashes.simhashSig(spark, Text.wsTokens($"text")).as("sh"),
        NativeHashes.md5SimhashSig(spark, Text.wsTokens($"text")).as("m5"),
        NativeHashes.md5Fingerprint(spark, Text.wsTokens($"text")).as("fp"),
        graft.plans.NgramHashes.hashes(spark, $"text", 3).as("ng"),
        graft.plans.NgramHashes.shingles(spark, $"text", 2).as("ws"),
        graft.plans.NgramHashes.minhash(spark, $"text", 3, 16).as("ngmh"),
        graft.plans.NgramHashes.minhashMd5(spark, $"text", 3, 16).as("ngm5"),
        graft.plans.NgramHashes.bands(spark,
          graft.plans.NgramHashes.minhash(spark, $"text", 3, 16), 4, 4).as("ngb"),
        graft.plans.HyperplaneSigs.sigs(spark, $"a", 8, 4).as("hp"),
        graft.plans.HyperplaneSigs.sigsMd5(spark, $"a", 8, 4).as("hp5"),
        graft.plans.HyperplaneSigs.project(spark, $"a", 8).as("pj"),
        // m=2 subspaces of 8 dims over the 16-dim vectors, K=2 centroids each
        graft.plans.Pq.encode(spark, $"a",
          typedLit(Seq(Seq.fill(8)(0.5), Seq.fill(8)(-0.5),
            Seq.fill(8)(0.25), Seq.fill(8)(-0.25))), 2).as("pqc"),
        graft.plans.Pq.adc(spark, $"a", typedLit(Seq(0, 1)),
          typedLit(Seq(Seq.fill(8)(0.5), Seq.fill(8)(-0.5),
            Seq.fill(8)(0.25), Seq.fill(8)(-0.25))), 2).as("pqd"),
        graft.plans.CosineSim.cosine(spark, $"a", $"b").as("cos"),
        graft.plans.DotProd.dot(spark, $"a", $"b").as("dp"),
        graft.plans.SortedIntersectCount.count(spark,
          sort_array(graft.plans.NgramHashes.hashes(spark, $"text", 3)),
          sort_array(graft.plans.NgramHashes.hashes(spark, $"text", 2))).as("sic"),
        graft.plans.VecScale.scale(spark, $"a", lit(0.75)).as("vs"),
        graft.plans.Derep(spark, $"text").as("dr"),
        graft.plans.NearestCentroid.nearest(spark, $"a",
          typedLit(Seq(Seq.fill(16)(0.5), Seq.fill(16)(-0.5)))).as("nc"))
        .collect()
      assert(out.length == 8 && out.forall(r => !r.anyNull))
    } finally {
      oldFactory.fold(conf.unset("spark.sql.codegen.factoryMode"))(
        conf.set("spark.sql.codegen.factoryMode", _))
      oldFallback.fold(conf.unset("spark.sql.codegen.fallback"))(
        conf.set("spark.sql.codegen.fallback", _))
    }
  }

  test("native expressions survive filter pushdown planning on parquet scans") {
    val d = sources.Tables(spark, sf, "documents")
    val out = d.filter($"n_chars" > 100)
      .select($"doc_id", NativeHashes.simhashSig(spark, Text.wsTokens($"text")).as("sig"))
    assert(out.count() > 0)
    assert(out.queryExecution.executedPlan.toString.contains("PushedFilters"))
  }
}
