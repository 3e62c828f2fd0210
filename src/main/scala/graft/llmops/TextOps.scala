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

  /** Narrow (id, text) projection spread to the session's cores
    * ([[graft.operators.Spread.toCores]]) — r21, guide §2.5 "input skew":
    * the fixtures (and any single-object ingest source) scan as ONE task,
    * so every regex/shingle/JSON-heavy per-row operator here ran at
    * parallelism 1 regardless of core count. A no-op at scale where
    * splits ≥ cores; the starved case pays one narrow exchange before the
    * expensive per-row work instead of computing it single-threaded. */
  private def spreadIdText(df: DataFrame, idCol: String, textCol: String): DataFrame =
    graft.operators.Spread.toCores(df.select(col(idCol), col(textCol)), idCol)

  private def stopHits(textCol: Column, words: Seq[String]): Column = {
    val arr = words.map(w => s"'$w'").mkString("array(", ", ", ")")
    size(expr(s"filter(split(lower(${textCol.toString}), ' '), x -> array_contains($arr, x))"))
  }

  /** Quality-scoring stats: char/token counts, avg token length, stopword
    * ratio. One projection, zero shuffles. */
  def stats(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = col(textCol)
    val nTok = size(toks(t)).cast("long")
    spreadIdText(df, idCol, textCol).select(
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
    spreadIdText(df, idCol, textCol).select(
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
    spreadIdText(df, idCol, textCol).select(
      col(idCol),
      size(split(col(textCol), " ")).cast("long").as("ws_tokens"),
      size(expr(s"regexp_extract_all($textCol, '[a-z]+|[0-9]+|[^a-z0-9 ]', 0)"))
        .cast("long").as("bpe_tokens"))

  /** Document fingerprints: content hash (md5 of raw text) + an
    * order-independent bag-of-words hash — both engine-portable. */
  def fingerprint(df: DataFrame, idCol: String, textCol: String): DataFrame =
    spreadIdText(df, idCol, textCol).select(
      col(idCol),
      md5(col(textCol).cast("binary")).as("content_hash"),
      md5(concat_ws(" ", array_sort(array_distinct(split(lower(col(textCol)), " "))))
        .cast("binary")).as("bow_hash"))

  /** Exact deduplication: hash-groupBy on full content. One shuffle on the
    * content hash (never on the full text), partial-aggregated map-side.
    * Returns one row per distinct text: survivor id + duplicate count. */
  // NOT spread (r21, measured 0.19 s → 0.37 s): one md5 pass per row is
  // cheap; the groupBy's own exchange ships 16-byte hashes, while a
  // pre-spread would ship the full text first.
  def exactDedup(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(md5(col(textCol).cast("binary")).as("text_hash"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  // RE2-compatible patterns (portable to the DuckDB oracle verbatim).
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhoneRe = "\\+?[0-9]{3}[- ][0-9]{3}[- ][0-9]{4}"

  /** PII scrubbing: mask email and phone-shaped spans, emit redaction counts
    * for audit. Two regex passes per row, narrow projection, no shuffle —
    * the shape a 100 TB pre-training scrub needs. */
  def piiScrub(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = col(textCol)
    spreadIdText(df, idCol, textCol).select(
      col(idCol),
      regexp_count(t, lit(EmailRe)).cast("long").as("n_emails"),
      regexp_count(t, lit(PhoneRe)).cast("long").as("n_phones"),
      regexp_replace(regexp_replace(t, EmailRe, "<EMAIL>"), PhoneRe, "<PHONE>")
        .as("clean_text"))
  }

  /** Token-window chunking: fixed windows of `chunkTokens` whitespace tokens
    * advancing by `chunkTokens - overlap`, the unit a training pipeline
    * feeds downstream. Emits (chunk ordinal, start token, token count, chunk
    * content hash) per window — posexplode of window starts, so output rows
    * scale with chunks, never tokens². */
  def chunk(df: DataFrame, idCol: String, textCol: String,
            chunkTokens: Int = 50, overlap: Int = 10): DataFrame = {
    require(overlap >= 0 && overlap < chunkTokens,
      s"overlap ($overlap) must be in [0, chunkTokens=$chunkTokens)")
    spanize(df, idCol, textCol, chunkTokens, chunkTokens - overlap)
      .select(col(idCol),
        col("span_idx").as("chunk_idx"),
        col("start_tok"), col("n_tokens"),
        md5(col("span_text").cast("binary")).as("chunk_hash"))
  }

  /** (id, span_idx, start_tok, n_tokens, span_text) for `windowTokens`-
    * token windows advancing by `stride` — the ONE token-window splitter
    * behind [[chunk]], [[spanDedup]], and [[dropDupSpans]], so chunk
    * hashes and span-dedup decisions can never silently diverge on
    * boundaries, tokenization, or the empty-doc convention. */
  // NOT spread (r21, measured): the splitter's per-row work (split + slice
  // + concat_ws + md5) is cheap, and pre-spreading only added an exchange —
  // dedup_spans 0.32 s → 0.55 s, clean_spans 0.49 s → 0.77 s, chunking
  // 0.18 s → 0.22 s at sf0.1.
  private def spanize(df: DataFrame, idCol: String, textCol: String,
                      windowTokens: Int, stride: Int): DataFrame =
    df.select(col(idCol), split(col(textCol), " ").as("__toks"))
      .select(col(idCol), col("__toks"),
        posexplode(sequence(lit(1), greatest(size(col("__toks")), lit(1)),
          lit(stride))).as(Seq("__i", "__start")))
      .select(col(idCol), col("__i").cast("long").as("span_idx"),
        col("__start").cast("long").as("start_tok"),
        size(slice(col("__toks"), col("__start"), lit(windowTokens)))
          .cast("long").as("n_tokens"),
        concat_ws(" ", slice(col("__toks"), col("__start"), lit(windowTokens)))
          .as("span_text"))

  private def spanFirstOccurrence(idCol: String) =
    row_number().over(org.apache.spark.sql.expressions.Window
      .partitionBy(col("span_hash"))
      .orderBy(col(idCol), col("span_idx"))) === 1

  /** Span-level exact dedup (the C4 / "dedup training data" span rule):
    * split each doc into non-overlapping `spanTokens`-token spans, hash
    * each span, and keep a duplicated span only at its FIRST occurrence —
    * the arg-min (doc_id, span_idx) over every occurrence of the same
    * hash. Emits (doc, span ordinal, hash, keep) so a downstream rewrite
    * can drop boilerplate spans repeated across documents while each
    * retains one copy.
    *
    * Scale shape: one posexplode (rows scale with spans), then ONE window
    * over the span hash — a hash-partitioned shuffle of (id, idx, hash)
    * triples, never of text; no self-join, no all-pairs. Skewed hashes
    * (a span repeated millions of times) stay one partition's rank
    * computation of small fixed-width rows. */
  def spanDedup(df: DataFrame, idCol: String, textCol: String,
                spanTokens: Int = 10): DataFrame =
    spanize(df, idCol, textCol, spanTokens, spanTokens)
      .withColumn("span_hash", md5(col("span_text").cast("binary")))
      .select(col(idCol), col("span_idx"), col("span_hash"),
        spanFirstOccurrence(idCol).as("keep"))

  /** The rewrite [[spanDedup]] feeds: documents reassembled from only the
    * spans that are the global first occurrence of their content —
    * cross-document boilerplate collapses to one surviving copy. Docs
    * whose every span was seen earlier elsewhere disappear from the
    * output entirely (fully-duplicate documents). Shape: spanDedup's one
    * hash-window plus one groupBy(doc) re-assembly; the re-assembly
    * shuffles only KEPT span text, and span order is restored by an
    * in-row sort of (idx, text) structs — no second window. */
  def dropDupSpans(df: DataFrame, idCol: String, textCol: String,
                   spanTokens: Int = 10): DataFrame =
    spanize(df, idCol, textCol, spanTokens, spanTokens)
      .withColumn("span_hash", md5(col("span_text").cast("binary")))
      .withColumn("__keep", spanFirstOccurrence(idCol))
      .filter(col("__keep"))
      .groupBy(col(idCol))
      .agg(expr("array_join(transform(array_sort(" +
        "collect_list(struct(span_idx, span_text))), x -> x.span_text), ' ')")
        .as("clean_text"))

  /** Benchmark decontamination: flag every training doc sharing at least
    * `minOverlap` distinct 3-token shingles with the eval/benchmark set —
    * the n-gram-overlap rule used before pre-training so test sets don't
    * leak into the corpus.
    *
    * Scale shape: the eval side collapses to one distinct shingle-HASH set
    * and is broadcast (benchmarks are MB-sized against a 100 TB corpus), so
    * the train side is a single explode + broadcast-hash join + partial-agg
    * count — no train-side shuffle of text, no all-pairs comparison. Both
    * sides join on xxhash64 of the shingle: the broadcast table and every
    * comparison are 8-byte longs, never n-gram strings (a 64-bit collision
    * would need ~2^32 distinct eval shingles to become likely). */
  def decontaminate(train: DataFrame, eval: DataFrame, idCol: String,
                    textCol: String, minOverlap: Int = 1): DataFrame = {
    // explode_outer, not explode: plain explode makes Generate push an
    // `isnotnull AND size>0` guard below the shingle projection, inlining
    // the whole shingle expression 3× into the scan filter (a huge codegen
    // blowup measured at ~5s of fixed overhead per action at any data
    // size). Shingle arrays are never empty (the whole-text fallback), so
    // the outer variant is semantically identical.
    // r22: shingle + hash fused into one native pass
    // ([[graft.functions.ShingleExprs.ShingleHashes]]) — the values are
    // the same xxhash64(shingle_string, seed 42) as before, so the join
    // semantics and output are byte-identical; the interpreted
    // higher-order-function shingling and per-shingle string
    // materialization are gone.
    val evalSh = MinHash.withShingleHashes(eval, idCol, textCol)
      .select(explode_outer(col("sh")).as("sh")).distinct()
    val counts = MinHash.withShingleHashes(
        graft.operators.Spread.toCores(
          train.select(col(idCol), col(textCol)), idCol), idCol, textCol)
      .select(col("doc_id"), explode_outer(col("sh")).as("sh"))
      .join(broadcast(evalSh), "sh")
      .groupBy("doc_id").agg(count(lit(1)).as("n_overlap"))
    train.select(col(idCol).as("doc_id")).join(counts, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_overlap"), lit(0L)).as("n_overlap"))
      .withColumn("contaminated", col("n_overlap") >= minOverlap)
  }

  /** Intra-document repetition scores (the Gopher repetition-removal rules):
    * duplicate-token fraction and most-frequent-2-gram fraction, plus the
    * keep gate. Pure per-row column math — the 2-gram mode is computed
    * in-row over the gram array (O(distinct·grams) per doc) instead of an
    * explode + two shuffles; for documents (10²–10⁴ tokens) per-row compute
    * is far cheaper at 100 TB than shuffling the exploded gram stream. */
  def repetition(df: DataFrame, idCol: String, textCol: String,
                 maxDupTokens: Double = 0.3, maxTopGram: Double = 0.2): DataFrame = {
    val withGrams = spreadIdText(df, idCol, textCol)
      .select(col(idCol), split(lower(col(textCol)), " ").as("__toks"))
      .withColumn("__grams",
        when(size(col("__toks")) >= 2,
          expr("transform(sequence(1, size(__toks) - 1), " +
            "i -> concat_ws(' ', __toks[i-1], __toks[i]))"))
          .otherwise(array().cast("array<string>")))
    val nTok = size(col("__toks")).cast("double")
    val nGram = size(col("__grams"))
    // Max multiplicity = longest equal-run in the SORTED gram array — one
    // O(n log n) pass instead of the O(distinct × n) nested
    // transform/filter scan (quadratic on repetitive documents, exactly
    // the ones this filter exists to catch).
    val topCnt = expr(
      """aggregate(array_sort(__grams),
        |  named_struct('prev', CAST(NULL AS STRING), 'run', 0, 'best', 0),
        |  (a, x) -> named_struct('prev', x,
        |    'run', IF(a.prev <=> x, a.run + 1, 1),
        |    'best', GREATEST(a.best, IF(a.prev <=> x, a.run + 1, 1))),
        |  a -> a.best)""".stripMargin)
    val dupRatio = round(lit(1.0) - size(array_distinct(col("__toks"))) / nTok, 4)
    val topRatio = round(
      when(nGram > 0, topCnt.cast("double") / nGram).otherwise(lit(0.0)), 4)
    withGrams.select(
      col(idCol),
      dupRatio.as("dup_token_ratio"),
      topRatio.as("top_2gram_ratio"),
      (dupRatio <= maxDupTokens && topRatio <= maxTopGram).as("keep"))
  }

  /** Composite quality score: penalize punctuation- and digit-heavy text
    * (2× resp. 3× the character ratio), floor at 0; `keep` additionally
    * requires a sane token count. One projection, deterministic arithmetic
    * the oracle reproduces bit-for-bit. */
  def qualityScore(df: DataFrame, idCol: String, textCol: String,
                   minTokens: Int = 5, maxTokens: Int = 10000): DataFrame = {
    val t = col(textCol)
    val nTok = size(split(t, " ")).cast("long")
    val nChars = length(t).cast("double")
    val punctRatio = regexp_count(t, lit("[^A-Za-z0-9 ]")).cast("double") / nChars
    val digitRatio = regexp_count(t, lit("[0-9]")).cast("double") / nChars
    val score = round(greatest(lit(0.0),
      lit(1.0) - lit(2.0) * punctRatio - lit(3.0) * digitRatio), 4)
    spreadIdText(df, idCol, textCol).select(
      col(idCol),
      nTok.as("n_tokens"),
      score.as("quality_score"),
      (score >= 0.5 && nTok >= minTokens && nTok <= maxTokens).as("keep"))
  }
}
