package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{Hashes, Text, Vectors}

class TextHashSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def one[T](c: org.apache.spark.sql.Column, text: String): T =
    Seq(text).toDF("t").select(c.as("r")).collect().head.getAs[T]("r")

  test("wsTokenCount: empty and whitespace-only → 0") {
    assert(one[Long](Text.wsTokenCount($"t"), "") == 0L)
    assert(one[Long](Text.wsTokenCount($"t"), "   ") == 0L)
    assert(one[Long](Text.wsTokenCount($"t"), " a  b ") == 2L)
  }

  test("bpe tokens: letter runs + digits + punctuation") {
    assert(one[Long](Text.bpeTokenCount($"t"), "ab12,cd") == 5L) // ab,1,2,',',cd
  }

  test("langId votes: english vs german vs no markers") {
    assert(one[String](Text.langId($"t"), "the cat is in the house") == "en")
    assert(one[String](Text.langId($"t"), "das ist nicht der hund") == "de")
    assert(one[String](Text.langId($"t"), "zzz qqq xxx") == "und")
  }

  test("fingerprint is order-sensitive") {
    val a = one[Long](Text.fingerprint($"t"), "alpha beta gamma")
    val b = one[Long](Text.fingerprint($"t"), "gamma beta alpha")
    assert(a != b)
  }

  test("wordShingles: short docs collapse to one shingle") {
    def shingles(text: String, k: Int): Seq[String] =
      Seq(text).toDF("t").select(Text.wordShingles($"t", k).as("r"))
        .collect().head.getSeq[String](0).toList
    assert(shingles("a b", 3) == Seq("a b"))
    assert(shingles("a b c", 2) == Seq("a b", "b c"))
  }

  test("lm score ranks common-token docs above rare-token docs") {
    val lm = graft.SparkEntry.queries("text_lm_score")(spark, sf)
      .select("doc_id", "lm_score", "n_tokens")
      .collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getDouble(1)), r.getLong(2)))
    assert(lm.nonEmpty && lm.forall(_._2.forall(_ <= 0.0)), "log-probs must be <= 0")
    val docs = sources.Tables(spark, sf, "documents")
      .select("doc_id").as[Long].collect().toSet
    assert(lm.map(_._1).toSet == docs, "one row per document")
    // the RANKING contract (not just sign): recompute one doc's expected
    // score independently — collect its tokens and the corpus frequency
    // table, fold in plain Scala — and require 4dp equality
    val texts = sources.Tables(spark, sf, "documents")
      .select("doc_id", "text").as[(Long, String)].collect()
    val tokensOf: Map[Long, Seq[String]] = texts.map { case (id, t) =>
      id -> t.toLowerCase.trim.split("\\s+", -1).toSeq.filter(_.nonEmpty)
    }.toMap
    val freqs = tokensOf.values.flatten.groupBy(identity).view.mapValues(_.size).toMap
    val total = freqs.values.map(_.toLong).sum.toDouble
    val (someDoc, someTokens) = tokensOf.find(_._2.nonEmpty).get
    val expect = BigDecimal(someTokens.map(t => math.log(freqs(t) / total)).sum / someTokens.size)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val got = lm.find(_._1 == someDoc).get._2.get
    assert(math.abs(got - expect) < 1.5e-4, s"doc $someDoc: got $got expected $expect")
    // empty docs (if any) carry n_tokens 0 and a null score
    lm.filter(_._3 == 0L).foreach { case (_, s, _) => assert(s.isEmpty) }
  }

  test("minhash: identical docs → identical sigs, est similarity 1.0") {
    val df = Seq(("x x y z w q r"), ("x x y z w q r")).toDF("t")
      .select(Hashes.minhash(Text.wordShingles($"t", 2), 32).as("sig"))
    val sigs = df.collect().map(_.getSeq[Long](0).toSeq)
    assert(sigs(0) == sigs(1))
  }

  test("minhash LSH finds a planted near-duplicate") {
    val base = "the quick brown fox jumps over the lazy dog again and again today"
    val near = base.replace("today", "tomorrow")
    val far = "completely different words nothing shared here at all whatsoever ok ok"
    val docs = Seq((0L, base), (1L, near), (2L, far)).toDF("doc_id", "text")
    val sigged = docs.select($"doc_id",
      Hashes.minhash(Text.wordShingles($"text", 3), 64).as("sig"))
    val bands = sigged.select($"doc_id", explode(Hashes.lshBands($"sig", 16, 4)).as("bk"))
    val pairs = bands.as("a").join(bands.as("b"),
        $"a.bk" === $"b.bk" && $"a.doc_id" < $"b.doc_id")
      .select($"a.doc_id", $"b.doc_id").distinct().as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 1L)))
    assert(!pairs.contains((0L, 2L)) && !pairs.contains((1L, 2L)))
  }

  test("simhash: near-identical docs hamming-close, unrelated docs far") {
    // 1 token changed out of 120: expected flips ≈ 64·P(|vote margin| ≤ 1)/2,
    // small for long docs; unrelated docs sit near hamming 32
    val base = (1 to 120).map(i => s"tok$i").mkString(" ")
    val near = base.replace("tok60", "changed")
    val far = (1 to 120).map(i => s"other$i").mkString(" ")
    val df = Seq((0L, base), (1L, near), (2L, far)).toDF("doc_id", "text")
      .select($"doc_id", Hashes.simhash(Text.wsTokens($"text")).as("sig"))
    val sigs = df.orderBy("doc_id").collect().map(_.getLong(1))
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(sigs(0), sigs(1)) <= 6, s"near pair hamming=${ham(sigs(0), sigs(1))}")
    assert(ham(sigs(0), sigs(2)) > 15, s"far pair hamming=${ham(sigs(0), sigs(2))}")
  }

  test("cosine: identity 1.0, orthogonal 0.0") {
    val df = Seq((Array(1f, 0f), Array(1f, 0f), Array(0f, 1f))).toDF("a", "b", "c")
    val r = df.select(
      round(Vectors.cosine($"a", $"b"), 6).as("same"),
      round(Vectors.cosine($"a", $"c"), 6).as("orth")).collect().head
    assert(r.getDouble(0) == 1.0 && r.getDouble(1) == 0.0)
  }

  test("hyperplane signature is deterministic and executor-independent") {
    val v = Array.tabulate(64)(i => (i % 7).toFloat - 3f)
    val df = Seq(Tuple1(v), Tuple1(v)).toDF("e").repartition(2)
      .select(Vectors.hyperplaneSig($"e", 12).as("sig"))
    val sigs = df.collect().map(_.getLong(0))
    assert(sigs(0) == sigs(1))
  }

  test("charGrams: distinct byte trigrams, substring => gram-subset, short text empty") {
    import graft.plans.NgramHashes
    def grams(s: String): Set[Long] = Seq(s).toDF("t")
      .select(NgramHashes.charGrams(spark, $"t", 3).as("g"))
      .head().getSeq[Long](0).toSet
    // reference: distinct hashes of each 3-byte window — count check via
    // a string with a repeated trigram ("abcabc" → abc, bca, cab, abc)
    assert(grams("abcabc").size == 3)
    assert(grams("ab").isEmpty, "text shorter than n has no postings")
    assert(grams("abc").size == 1)
    // the index invariant the search key rests on: P substring of T ⇒
    // gramset(P) ⊆ gramset(T) — incl. multi-byte UTF-8 in the haystack
    val t = "slow query café over the window table"
    for (p <- Seq("slow query", "window table", "café", "w t"))
      assert(grams(p).subsetOf(grams(t)), s"grams($p) must be ⊆ grams(T)")
    // and a non-substring with foreign chars shares nothing
    assert(grams("xyzzy").intersect(grams(t)).isEmpty)
    // exact-match semantics: no case folding
    assert(!grams("SLOW").subsetOf(grams(t)))
  }

  test("redactPii scrubs planted emails/phones/IPs and leaves clean text alone") {
    val rows = Seq(
      ("mail me at jo.doe+x@sub.example.co.uk thanks",
        "mail me at <EMAIL> thanks"),
      ("call 555-867-5309 or 111-222-3333 now",
        "call <PHONE> or <PHONE> now"),
      ("server at 192.168.0.1 and 10.0.0.255.",
        "server at <IP> and <IP>."),
      ("a@b.io then 10.0.0.1 then 999-999-9999",
        "<EMAIL> then <IP> then <PHONE>"),
      // untouched: no-PII text, bare digits, version-ish dotted string with
      // an alpha segment, @handle without a domain dot
      ("plain text 12345 v1.2.3.beta @handle stays",
        "plain text 12345 v1.2.3.beta @handle stays"))
    val got = rows.toDF("text", "expected")
      .select(graft.functions.Text.redactPii($"text").as("got"), $"expected")
      .as[(String, String)].collect()
    got.foreach { case (g, e) => assert(g == e, s"redaction mismatch: $g") }
  }
}
