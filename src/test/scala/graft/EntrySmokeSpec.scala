package graft

import org.scalatest.funsuite.AnyFunSuite

class EntrySmokeSpec extends AnyFunSuite with SparkTestBase {

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a query") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  test("every query runs at sf0.001 and most return rows") {
    val counts = SparkEntry.queries.map { case (name, fn) =>
      name -> fn(spark, sf).count()
    }
    val empty = counts.filter(_._2 == 0).keys.toSet
    // near-dup thresholds may legitimately find nothing at tiny scale for
    // the random synthetic corpus — but only for these (the audio cluster
    // and keep queries derive from the audio pair table, so they share
    // its small-corpus emptiness)
    assert(empty.subsetOf(
      Set("dedup_ngram_jaccard", "dedup_embedding", "mm_audio_near_dup",
        "mm_audio_clusters", "mm_audio_keep_list")),
      s"empty: $empty")
  }
}
