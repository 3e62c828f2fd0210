package graft.llmops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines.
  *
  * All operators are narrow, codegen-friendly per-row column expressions —
  * no shuffles, no UDFs — so they scale linearly with input splits and stay
  * inside whole-stage codegen at 100 TB.
  */
object TextOps {

  // Marker stopword lists for the n-gram/stopword language heuristic.
  // (Kept tiny + hardcoded so the DuckDB oracle replicates them verbatim.)
  val EnStop: Seq[String] = Seq("the", "a", "of", "and", "to", "in", "is")
  val DeStop: Seq[String] = Seq("der", "die", "das", "und", "ist", "nicht")
  val EsStop: Seq[String] = Seq("el", "los", "de", "y", "es", "que")
  val FrStop: Seq[String] = Seq("le", "la", "et", "est", "un", "une")

  private def toks(textCol: Column): Column = split(lower(textCol), " ")

  private def stopHits(textCol: Column, words: Seq[String]): Column = {
    val arr = words.map(w => s"'$w'").mkString("array(", ", ", ")")
    size(expr(s"filter(split(lower(${textCol.toString}), ' '), x -> array_contains($arr, x))"))
  }

  /** Quality-scoring stats: char/token counts, avg token length, stopword
    * ratio. One projection, zero shuffles. */
  def stats(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = col(textCol)
    val nTok = size(toks(t)).cast("long")
    df.select(
      col(idCol),
      length(t).cast("long").as("n_chars_m"),
      nTok.as("n_tokens"),
      round(length(regexp_replace(t, " ", "")).cast("double") / nTok, 4).as("avg_tok_len"),
      round(stopHits(t, EnStop).cast("double") / nTok, 4).as("stop_ratio"))
  }

  /** Language-ID heuristic: marker-stopword hit counts per language,
    * deterministic argmax tie-break (en > de > es > fr). */
  def langId(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = col(textCol)
    val (en, de, es, fr) =
      (stopHits(t, EnStop), stopHits(t, DeStop), stopHits(t, EsStop), stopHits(t, FrStop))
    df.select(
      col(idCol),
      en.cast("long").as("en_hits"),
      de.cast("long").as("de_hits"),
      when(en >= de && en >= es && en >= fr, "en")
        .when(de >= es && de >= fr, "de")
        .when(es >= fr, "es")
        .otherwise("fr").as("lang_pred"))
  }

  /** BPE-ish token counting: word / number / single-symbol pieces via one
    * regex pass (≈ pre-tokenizer granularity, an upper bound on BPE tokens). */
  def tokenCount(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol),
      size(split(col(textCol), " ")).cast("long").as("ws_tokens"),
      size(expr(s"regexp_extract_all($textCol, '[a-z]+|[0-9]+|[^a-z0-9 ]', 0)"))
        .cast("long").as("bpe_tokens"))

  /** Document fingerprints: content hash (md5 of raw text) + an
    * order-independent bag-of-words hash — both engine-portable. */
  def fingerprint(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol),
      md5(col(textCol).cast("binary")).as("content_hash"),
      md5(concat_ws(" ", array_sort(array_distinct(split(lower(col(textCol)), " "))))
        .cast("binary")).as("bow_hash"))

  /** Exact deduplication: hash-groupBy on full content. One shuffle on the
    * content hash (never on the full text), partial-aggregated map-side.
    * Returns one row per distinct text: survivor id + duplicate count. */
  def exactDedup(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(md5(col(textCol).cast("binary")).as("text_hash"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))
}
