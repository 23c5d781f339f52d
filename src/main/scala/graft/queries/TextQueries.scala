package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Text
import graft.sources.Tables

/** Text-analysis inventory (SURVEY.md §2): token counting, quality scoring,
  * language ID, document fingerprinting over `documents`. All map-only plans
  * — no shuffle except the final presentation sort.
  */
object TextQueries {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.sharded(s, dir, "documents")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_tokens" -> ((s, dir) =>
      docs(s, dir).select(
        col("doc_id"),
        Text.wsTokenCount(col("text")).as("n_ws_tokens"),
        Text.bpeTokenCount(col("text")).as("n_bpe_tokens"))
        .orderBy("doc_id")),

    "text_quality" -> ((s, dir) =>
      docs(s, dir).select(
        (col("doc_id") +: Text.qualityFeatures(col("text"))) :+
          Text.qualityScore(col("text")).as("quality_score"): _*)
        .orderBy("doc_id")),

    "text_langid" -> ((s, dir) =>
      docs(s, dir).select(
        col("doc_id"),
        Text.langId(col("text")).as("lang_pred"),
        col("lang").as("lang_actual"))
        .orderBy("doc_id")),

    "text_fingerprint" -> ((s, dir) =>
      docs(s, dir).select(
        col("doc_id"),
        Text.fingerprint(col("text")).as("fingerprint"),
        Text.wsTokenCount(col("text")).as("n_ws_tokens"))
        .orderBy("doc_id")))

  private val stopList = Text.stopwords.map(w => s"'$w'").mkString(", ")

  val oracles: Map[String, String] = Map(
    "text_tokens" ->
      """SELECT doc_id,
        |       CASE WHEN length(trim(text)) = 0 THEN 0
        |            ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS n_ws_tokens,
        |       len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]|[^a-zA-Z0-9\s]')) AS n_bpe_tokens
        |FROM documents ORDER BY doc_id""".stripMargin,

    "text_quality" ->
      s"""WITH f AS (
         |  SELECT doc_id,
         |         length(text) AS n_chars,
         |         CASE WHEN length(trim(text)) = 0 THEN 0
         |              ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS n_tokens,
         |         len(list_filter(regexp_split_to_array(trim(text), '\\s+'),
         |             x -> x IN ($stopList))) AS n_stop,
         |         len(regexp_extract_all(text, '[^a-zA-Z0-9\\s]')) AS n_punct
         |  FROM documents)
         |SELECT doc_id, n_chars, n_tokens,
         |       round(CAST(n_chars AS DOUBLE) / greatest(n_tokens, 1), 4) AS avg_token_len,
         |       round(CAST(n_stop AS DOUBLE) / greatest(n_tokens, 1), 4) AS stopword_ratio,
         |       round(CAST(n_punct AS DOUBLE) / greatest(n_chars, 1), 4) AS punct_ratio,
         |       round(
         |         least(CAST(n_tokens AS DOUBLE) / 100.0, 1.0) * 0.4 +
         |         least((CAST(n_stop AS DOUBLE) / greatest(CAST(n_tokens AS DOUBLE), 1.0)) * 5.0, 1.0) * 0.4 +
         |         (1.0 - least((CAST(n_punct AS DOUBLE) / greatest(CAST(n_chars AS DOUBLE), 1.0)) * 10.0, 1.0)) * 0.2,
         |         4) AS quality_score
         |FROM f ORDER BY doc_id""".stripMargin)
}
