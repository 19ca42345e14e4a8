package graft
package entry

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.{Ffiec, Text, Vectors}
import graft.operators.{CombineParts, Dedup, Graph, KeyChecks, Knn, LongPivot, Pq, Sampling, TextAnalytics}
import graft.sources.{Scan, XbrlZip}
import graft.streaming.Sessions

import graft.entry.EntryHelpers._

/** Gate registry, text analysis (tokens, quality, contamination, BPE) — split verbatim out of
  * SparkEntry.scala (round 10, r9 verdict ask #8; zero behavior
  * change, every entry byte-identical to the monolith at split
  * time). SparkEntry concatenates the family maps back into the
  * driver contract.
  */
private[graft] object GatesTextAnalysis {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

"q22_token_count" -> ((s, dir) => {
      t(s, dir, "documents").select(
        col("doc_id"),
        Text.tokenCount(col("text")).as("n_tokens"),
        length(col("text")).as("n_chars_m"))
        .orderBy("doc_id")
    }),

"q23_lang_id" -> ((s, dir) => {
      t(s, dir, "documents").select(
        col("doc_id"), Text.langId(col("text")).as("lang_pred"))
        .orderBy("doc_id")
    }),

"q24_quality_score" -> ((s, dir) => {
      t(s, dir, "documents").select(
        col("doc_id"), Text.qualityScore(col("text")).as("quality"))
        .orderBy("doc_id")
    }),

"q25_fingerprint" -> ((s, dir) => {
      t(s, dir, "documents").select(
        col("doc_id"), Text.fingerprint(col("text")).as("fp"))
        .orderBy("doc_id")
    }),

    // Per-doc trigram novelty vs everything earlier (round 10):
    // first-occurrence ownership by min doc_id, no pair join — the
    // novelty-subsampling curation signal.
    "q328_ngram_novelty" -> ((s, dir) => {
      TextAnalytics.ngramNovelty(t(s, dir, "documents"), "doc_id", "text",
        n = 3)
        .orderBy("doc_id")
    }))

  val oracles: Map[String, String] = Map(

"q22_token_count" ->
      """SELECT doc_id,
        |  CAST(len(list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '')) AS INTEGER) AS n_tokens,
        |  CAST(length(text) AS INTEGER) AS n_chars_m
        |FROM documents ORDER BY doc_id""".stripMargin,

"q23_lang_id" ->
      s"""WITH t AS (SELECT doc_id, $toksLower AS toks FROM documents),
         |h AS (SELECT doc_id,
         |  len(list_filter(toks, x -> list_contains(['der','die','und','ist','nicht','das','ein','zu'], x))) AS de,
         |  len(list_filter(toks, x -> list_contains(['the','and','is','of','to','in','that','it'], x))) AS en,
         |  len(list_filter(toks, x -> list_contains(['el','la','de','que','los','una','es','por'], x))) AS es,
         |  len(list_filter(toks, x -> list_contains(['le','la','les','des','est','une','dans','pas'], x))) AS fr
         |  FROM t)
         |SELECT doc_id,
         |  CASE WHEN greatest(de, en, es, fr) = 0 THEN 'und'
         |       WHEN de >= en AND de >= es AND de >= fr THEN 'de'
         |       WHEN en >= es AND en >= fr THEN 'en'
         |       WHEN es >= fr THEN 'es'
         |       ELSE 'fr' END AS lang_pred
         |FROM h ORDER BY doc_id""".stripMargin,

"q24_quality_score" ->
      s"""WITH t AS (
         |  SELECT doc_id, text,
         |    len(list_filter(string_split_regex(trim(text), '\\s+'), x -> x <> '')) AS n_tok,
         |    CASE WHEN length(text) = 0 THEN 0.0
         |         ELSE (length(text) - length(regexp_replace(text, '[[:punct:]]', '', 'g'))) * 1.0 / length(text)
         |    END AS punct_ratio,
         |    CASE WHEN len($toksLower) = 0 THEN 0.0
         |         ELSE len(list_filter($toksLower,
         |                x -> list_contains(['the','a','an','and','or','of','to','in','is','it','that','for','on','with','as','was','at','by'], x))) * 1.0
         |              / len($toksLower)
         |    END AS stop_ratio
         |  FROM documents)
         |SELECT doc_id,
         |  ROUND(least(n_tok / 50.0, 1.0) * 0.4
         |        + greatest(0.0, 1.0 - punct_ratio * 4.0) * 0.3
         |        + least(stop_ratio * 3.0, 1.0) * 0.3, 6) AS quality
         |FROM t ORDER BY doc_id""".stripMargin,

"q25_fingerprint" ->
      s"""SELECT doc_id, md5($normText) AS fp FROM documents ORDER BY doc_id""".stripMargin,

    "q328_ngram_novelty" ->
      s"""$shinglesSql,
         |firsts AS (
         |  SELECT shingle, MIN(doc_id) AS first_id FROM ex GROUP BY shingle),
         |nov AS (
         |  SELECT first_id AS doc_id, COUNT(*) AS n_novel
         |  FROM firsts GROUP BY 1),
         |tot AS (SELECT doc_id, COUNT(*) AS n_shingles FROM ex GROUP BY 1)
         |SELECT t.doc_id, t.n_shingles,
         |  COALESCE(v.n_novel, 0) AS n_novel,
         |  (COALESCE(v.n_novel, 0) * 1000000) // t.n_shingles AS novelty_micro
         |FROM tot t LEFT JOIN nov v USING (doc_id)
         |ORDER BY t.doc_id""".stripMargin)
}
