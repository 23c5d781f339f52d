package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed BPE tokenizer training (Sennrich et al. 2016, "Neural
  * Machine Translation of Rare Words with Subword Units") in the only
  * shape a 100 TB corpus admits: the corpus collapses ONCE to its
  * vocabulary (distinct term × frequency — the `text_bpe_pairs` table),
  * and every merge iteration runs over that vocab table alone —
  *
  *  - pair stats: one explode of adjacent symbol pairs weighted by term
  *    frequency, O(vocab × symbols-per-term) rows, map-side combined into
  *    the O(symbol-pair-space) count table;
  *  - best pair: a bounded orderBy(count desc, pair asc).limit(1) pull —
  *    the ONLY driver state is the merge list itself, O(merges);
  *  - merge rewrite: a left-fold `aggregate` lambda over each vocab row's
  *    symbol array (left-to-right non-overlapping, the BPE rule —
  *    folding "a a a" under merge (a,a) yields [aa, a] because the
  *    just-merged symbol no longer equals the pair's left element).
  *    Interpreted-HOF cost is paid per VOCAB element, never per corpus
  *    token — the collapse is what makes that affordable.
  *
  * No iteration re-touches the corpus; lineage is cut every iteration so
  * k merges never stack k plan generations.
  *
  * Pair STATS count overlapping occurrences ("aaaa" contributes 3 to
  * (a,a)) — the cheap upper bound the reference implementations use — while
  * the REWRITE is non-overlapping; the fixpoint is identical because a
  * merged symbol can never re-form its own left element.
  */
object TokenizerFit {

  /** One learned merge: `left` + `right` fused after being the most
    * frequent adjacent pair with weighted count `count`. */
  final case class Merge(left: String, right: String, count: Long)

  /** Whitespace-token vocabulary of a corpus: (term, freq, syms) with
    * syms initialized to the term's characters. */
  def vocab(docs: DataFrame, textCol: String): DataFrame =
    docs
      .select(explode(graft.functions.Text.wsTokens(lower(col(textCol)))).as("term"))
      .filter(col("term") =!= "")
      .groupBy("term").agg(count(lit(1)).as("freq"))
      .withColumn("syms",
        expr("transform(sequence(1, length(term)), i -> substring(term, i, 1))"))

  /** Learn up to `merges` BPE merges over `vocabDf` (term, freq, syms).
    * Stops early when no adjacent pair reaches `minCount`. Returns the
    * ordered merge list and the final rewritten vocab. */
  def fit(vocabDf: DataFrame, merges: Int, minCount: Long = 2L)
      : (Seq[Merge], DataFrame) = {
    require(merges >= 0 && minCount >= 1)
    var v = Checkpointing.cut(vocabDf)
    val learned = Seq.newBuilder[Merge]
    var done = false
    var k = 0
    while (k < merges && !done) {
      // sequence(1, 0) DESCENDS in Spark rather than being empty, so
      // single-symbol terms must not reach the pair explode
      val best = v.filter(size(col("syms")) >= 2)
        .select(col("freq"),
          explode(expr(
            "transform(sequence(1, size(syms) - 1), " +
              "i -> struct(element_at(syms, i) AS a, element_at(syms, i + 1) AS b))"))
            .as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum("freq").as("cnt"))
        .orderBy(col("cnt").desc, col("a"), col("b"))
        .limit(1).collect()
      if (best.isEmpty || best.head.getLong(2) < minCount) done = true
      else {
        val (a, b, cnt) = (best.head.getString(0), best.head.getString(1),
          best.head.getLong(2))
        learned += Merge(a, b, cnt)
        def q(s: String) = s.replace("\\", "\\\\").replace("'", "\\'")
        val (qa, qb, qab) = (q(a), q(b), q(a + b))
        // left-fold rewrite: fuse every left-to-right non-overlapping
        // (a, b) adjacency into the merged symbol
        val next = v.withColumn("syms", expr(
          s"""aggregate(syms, cast(array() as array<string>), (acc, x) ->
             |  CASE WHEN size(acc) > 0 AND element_at(acc, -1) = '$qa'
             |            AND x = '$qb'
             |       THEN concat(slice(acc, 1, size(acc) - 1), array('$qab'))
             |       ELSE concat(acc, array(x)) END)""".stripMargin))
        v = Checkpointing.cut(next)
        k += 1
      }
    }
    (learned.result(), v)
  }

  /** Tokenize `terms` (one column `term`) with a learned merge list by
    * replaying the merges in order — the encoder side of the trainer. */
  def encode(terms: DataFrame, merges: Seq[Merge]): DataFrame = {
    // guard term = '': sequence(1, 0) DESCENDS to [1, 0] (the fit()
    // gotcha), which would explode '' into ["", ""] instead of []
    val init = terms.withColumn("syms",
      expr("""CASE WHEN length(term) >= 1
             |  THEN transform(sequence(1, length(term)), i -> substring(term, i, 1))
             |  ELSE cast(array() as array<string>) END""".stripMargin))
    merges.foldLeft(init) { (df, m) =>
      def q(s: String) = s.replace("\\", "\\\\").replace("'", "\\'")
      val (qa, qb, qab) = (q(m.left), q(m.right), q(m.left + m.right))
      df.withColumn("syms", expr(
        s"""aggregate(syms, cast(array() as array<string>), (acc, x) ->
           |  CASE WHEN size(acc) > 0 AND element_at(acc, -1) = '$qa'
           |            AND x = '$qb'
           |       THEN concat(slice(acc, 1, size(acc) - 1), array('$qab'))
           |       ELSE concat(acc, array(x)) END)""".stripMargin))
    }
  }
}
