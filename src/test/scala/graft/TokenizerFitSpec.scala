package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.TokenizerFit
import graft.operators.TokenizerFit.Merge

/** BPE trainer laws on crafted corpora with hand-computable merges. */
class TokenizerFitSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  /** The classic subword corpus (hug/pug/pun/bun/hugs with these
    * frequencies is the standard worked BPE example): the first three
    * merges and their weighted counts are hand-checkable. */
  private def craftedVocab() = {
    val words = Seq("hug" -> 10, "pug" -> 5, "pun" -> 12, "bun" -> 4,
      "hugs" -> 5)
    val text = words.flatMap { case (w, n) => Seq.fill(n)(w) }.mkString(" ")
    TokenizerFit.vocab(Seq(text).toDF("text"), "text")
  }

  test("fit learns the hand-computed merge sequence with exact counts") {
    val (merges, v) = TokenizerFit.fit(craftedVocab(), merges = 3)
    assert(merges == Seq(Merge("u", "g", 20L), Merge("u", "n", 16L),
      Merge("h", "ug", 15L)))
    val syms = v.select("term", "syms").as[(String, Seq[String])]
      .collect().toMap
    assert(syms("hug") == Seq("hug"))
    assert(syms("hugs") == Seq("hug", "s"))
    assert(syms("pun") == Seq("p", "un"))
    assert(syms("pug") == Seq("p", "ug"))
  }

  test("rewrite is left-to-right non-overlapping; stats count overlaps") {
    val v = Seq(("aaaa", 1L)).toDF("term", "freq")
      .withColumn("syms",
        expr("transform(sequence(1, length(term)), i -> substring(term, i, 1))"))
    val (merges, after) = TokenizerFit.fit(v, merges = 1, minCount = 1L)
    // "aaaa" has THREE overlapping (a,a) adjacencies in the stats…
    assert(merges == Seq(Merge("a", "a", 3L)))
    // …but the fold fuses left-to-right non-overlapping: [aa, aa]
    assert(after.select("syms").as[Seq[String]].head() == Seq("aa", "aa"))
  }

  test("fit stops when no pair reaches minCount; encode replays training") {
    val singles = Seq(("a b c d", 1)).map(_._1).toDF("text")
    val (none, _) = TokenizerFit.fit(TokenizerFit.vocab(singles, "text"), 5)
    assert(none.isEmpty, "single-char terms admit no pairs")

    val (merges, _) = TokenizerFit.fit(craftedVocab(), merges = 3)
    val enc = TokenizerFit.encode(Seq("hugs", "spun").toDF("term"), merges)
      .select("term", "syms").as[(String, Seq[String])].collect().toMap
    assert(enc("hugs") == Seq("hug", "s"))
    // unseen word: merges apply where adjacencies match ((u,n) in "spun")
    assert(enc("spun") == Seq("s", "p", "un"))

    // empty term: sequence(1, 0) DESCENDS in Spark — the guard must yield
    // an empty symbol array, not ["", ""] (ADVICE r7)
    val empty = TokenizerFit.encode(Seq("").toDF("term"), merges)
      .select("syms").as[Seq[String]].head()
    assert(empty == Seq.empty, s"empty term must encode to [], got $empty")
  }

  test("vocab collapse: pair stats equal text_bpe_pairs' corpus counts") {
    // the trainer's iteration-0 pair table must agree with the gated query
    // on the same lake — same tokenization, same weighting
    val gated = SparkEntry.queries("text_bpe_pairs")(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1))
    val v = TokenizerFit.vocab(graft.sources.Tables(spark, sf, "documents"), "text")
    val fromVocab = v.filter(size(col("syms")) >= 2)
      .select(col("freq"),
        explode(expr("transform(sequence(1, size(syms) - 1), " +
          "i -> concat(element_at(syms, i), element_at(syms, i + 1)))")).as("pair"))
      .groupBy("pair").agg(sum("freq").as("n"))
      .orderBy(col("n").desc, col("pair")).limit(20)
      .collect().map(r => r.getString(0) -> r.getLong(1))
    assert(gated.toSeq == fromVocab.toSeq)
  }
}
