package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines: token counting
  * (whitespace + BPE-ish regex), quality scoring, language identification
  * (marker-word heuristic), and content fingerprinting (polynomial rolling
  * hash). Everything is built from codegen'd native functions — no UDFs — and
  * every operator is arithmetic-reproducible in the DuckDB oracle.
  */
object TextAnalysis {

  // --- token counting --------------------------------------------------------

  /** Whitespace token count (single-space tokenization, oracle-aligned). */
  def tokenCount(text: Column): Column = size(split(text, " "))

  /** BPE-ish subword-boundary count: runs of letters, runs of digits, and
    * single non-alphanumeric marks — the regex shape GPT-2-style tokenizers
    * use as their pre-tokenizer. A cheap, deterministic proxy for "how many
    * tokens will the model see".
    */
  def bpeishCount(text: Column): Column =
    regexp_count(text, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"))

  def avgTokenLen(text: Column): Column =
    length(regexp_replace(text, lit(" "), lit(""))).cast("double") / tokenCount(text)

  // --- quality scoring -------------------------------------------------------

  /** Stopword list used by the quality score and the "en" language profile. */
  val enStopwords: Seq[String] = Seq(
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "that", "this", "for", "on", "with", "as", "at", "by", "be", "are")

  private def ratioInList(text: Column, words: Seq[String]): Column = {
    val toks = split(text, " ")
    size(filter(toks, t => t.isin(words.map(w => w: Any): _*))).cast("double") /
      size(toks)
  }

  /** Heuristic document quality in [0,1]: blends length saturation (chars /
    * (chars + 500)), non-punctuation ratio, a stopword-presence band, and
    * mean-word-length sanity (penalize <2 or >12 chars). The exact blend is
    * ours (the reference has no quality scoring); the VALUE of the operator
    * is that it is pure column arithmetic — pushdown-safe, codegen'd,
    * reproducible in SQL.
    */
  def qualityScore(text: Column): Column = {
    val chars = length(text).cast("double")
    val lenScore = chars / (chars + lit(500.0))
    val punctRatio =
      regexp_count(text, lit("[^A-Za-z0-9 ]")).cast("double") / greatest(chars, lit(1.0))
    val stopRatio = ratioInList(text, enStopwords)
    val stopScore = when(stopRatio.between(0.01, 0.6), lit(1.0)).otherwise(lit(0.5))
    val awl = avgTokenLen(text)
    val awlScore = when(awl.between(2.0, 12.0), lit(1.0)).otherwise(lit(0.3))
    round(lenScore * (lit(1.0) - punctRatio) * stopScore * awlScore, 6)
  }

  // --- language identification ----------------------------------------------

  /** Marker-word profiles (top function words per language — public
    * knowledge). Scoring counts DISTINCT marker hits, so repeated fillers
    * don't dominate.
    */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "that", "it", "for", "with"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "mit", "auf", "zu"),
    "es" -> Seq("el", "la", "los", "las", "es", "y", "en", "que", "por", "con"),
    "fr" -> Seq("le", "la", "les", "et", "est", "dans", "que", "pour", "une", "avec"),
    "zh" -> Seq("的", "是", "在", "了", "和", "有", "我", "不", "这", "他"))

  def langScore(text: Column, markers: Seq[String]): Column =
    size(array_intersect(array_distinct(split(text, " ")),
      array(markers.map(lit): _*)))

  /** Predicted language: argmax of marker hits with a fixed priority order on
    * ties (first match in [[langMarkers]] order); "und" (undetermined) when
    * no marker hits at all.
    */
  def langId(text: Column): Column = {
    val scores = langMarkers.map { case (l, m) => l -> langScore(text, m) }
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    val cases = scores.foldLeft(when(best <= 0, lit("und"))) {
      case (acc, (l, s)) => acc.when(s === best, lit(l))
    }
    cases
  }

  // --- fingerprinting --------------------------------------------------------

  /** Polynomial rolling hash of the full text, mod 1e9+7 — a deterministic
    * content fingerprint computable by any engine (unlike murmur/xxhash,
    * whose constants differ across systems). Codegen'd byte loop
    * ([[graft.functions.PolyHash]]); identical to [[fingerprintHof]] for
    * ASCII content and to the DuckDB list_reduce oracle.
    */
  def fingerprint(text: Column): Column =
    graft.functions.TextFunctions.poly_hash(text)

  /** The composable-HOF formulation (walks code points via ascii/substr),
    * kept as the reference the native expression is pinned against.
    * acc stays < 2^35 so the fold never overflows under ANSI arithmetic.
    */
  def fingerprintHof(text: Column): Column =
    aggregate(
      transform(sequence(lit(1), length(text)), i => ascii(text.substr(i, lit(1)))),
      lit(0L),
      (acc, x) => (acc * 31 + x) % 1000000007L)

  // --- corpus-level scoring ----------------------------------------------------

  /** CCNet-style unigram language-model scoring: train a unigram LM on the
    * corpus itself (token counts / total), then score every document by its
    * mean token log-probability — the standard "how typical is this text"
    * quality signal for training-data filtering (low scorers are boilerplate
    * or noise, extreme high scorers are repetitive filler).
    *
    * Scale shape: token rows are pre-aggregated to (doc, token, m) BEFORE the
    * vocabulary join, so the join input is one row per distinct token per doc
    * (not one per occurrence), and the per-doc mean is reconstituted as the
    * m-weighted average — the identical formulation the DuckDB oracle runs.
    * The vocabulary (counts ⨯ scalar total) is broadcast by default: even at
    * 100 TB a natural-language token vocabulary is tens of millions of rows
    * (Heaps' law), far under executor memory; `broadcastModel = false` falls
    * back to a sort-merge join for adversarial (e.g. random-hex) corpora.
    */
  def unigramLmScores(docs: DataFrame, idCol: String, textCol: String,
      broadcastModel: Boolean = true): DataFrame = {
    val docToks = docs
      .select(col(idCol).as("doc_id"),
        explode(split(lower(col(textCol)), " ")).as("tok"))
      .groupBy(col("doc_id"), col("tok"))
      .agg(count(lit(1)).as("m"))
    val counts = docToks.groupBy(col("tok")).agg(sum(col("m")).as("c"))
    val total = counts.agg(sum(col("c")).cast("double").as("n_total"))
    val model0 = counts.crossJoin(total) // 1-row side: plan-time broadcast NL
    val model = if (broadcastModel) broadcast(model0) else model0
    docToks.join(model, Seq("tok"))
      .groupBy(col("doc_id"))
      .agg(
        sum(col("m")).as("n_tokens"),
        round(sum(col("m") * log(col("c").cast("double") / col("n_total")))
          / sum(col("m")), 6).as("avg_logp"))
  }

  /** Overlapping token-window chunking — the standard pre-tokenization split
    * for LLM training corpora (fixed window, stride < window for context
    * overlap). One generated row per chunk: (doc_id, chunk_idx, start_tok,
    * n_tok, chunk_md5). Pure per-row generate (sequence → transform →
    * explode): no shuffle, no UDF, stays inside whole-stage codegen, and the
    * chunk array is sliced lazily per window rather than re-tokenized.
    * A document shorter than `size` yields exactly one (possibly short)
    * chunk; the trailing partial chunk is kept (standard for training data —
    * the tail is real text). Window starts stop at the FIRST window that
    * reaches end-of-document (round-13 fix): the last start is
    * ceil((n - size) / stride) * stride, not every multiple of stride
    * below n — the old bound emitted tail chunks fully CONTAINED in the
    * previous window whenever stride < n <= size (or more generally when
    * the previous window already covered the tail), silently duplicating
    * training text.
    */
  def chunkTokens(docs: DataFrame, idCol: String, textCol: String,
      size: Int = 64, stride: Int = 32): DataFrame = {
    // stride 0 is a sequence-step-0 runtime error on the first non-trivial
    // doc; stride > size would emit a zero-token phantom tail chunk
    // whenever the last start lands exactly at end-of-document (and gaps
    // between chunks contradict the overlapping-window contract)
    require(size >= 1 && stride >= 1 && stride <= size,
      s"chunkTokens: need 1 <= stride <= size, got size=$size stride=$stride")
    docs
      .select(col(idCol).as("doc_id"), split(col(textCol), " ").as("toks"))
      .select(col("doc_id"), col("toks"),
        org.apache.spark.sql.functions.size(col("toks")).as("n"))
      // last window start: 0 for n <= size, else ceil((n-size)/stride)
      // * stride — positive operands, so integer DIV is exact floor
      .withColumn("_last_st", expr(
        s"CASE WHEN n <= $size THEN 0 " +
          s"ELSE (((n - $size - 1) DIV $stride) + 1) * $stride END"))
      .select(col("doc_id"),
        explode(transform(
          sequence(lit(0), col("_last_st"), lit(stride)),
          (st, i) => struct(
            i.as("chunk_idx"),
            st.cast("long").as("start_tok"),
            least(lit(size), col("n") - st).cast("long").as("n_tok"),
            md5(array_join(
              slice(col("toks"), st + 1, least(lit(size), col("n") - st)),
              " ")).as("chunk_md5")))).as("ch"))
      .select(col("doc_id"), col("ch.chunk_idx"), col("ch.start_tok"),
        col("ch.n_tok"), col("ch.chunk_md5"))
  }

  /** Shard-local sequence packing — the sample-packing step a training
    * pipeline runs after chunking: concatenate documents into fixed-budget
    * training sequences so short docs don't waste context length as padding.
    *
    * Algorithm (deterministic, distributed): hash docs into `shards`, order
    * each shard by (token count desc, doc id) — the "sorted contiguous fill"
    * approximation of first-fit-decreasing — take the running token sum and
    * assign each doc to bin floor(previous_cum / budget). A bin may overrun
    * the budget by less than one max-doc-length (standard for greedy
    * packing; overlong docs should be chunked first via [[chunkTokens]]).
    *
    * Scale shape: one shuffle on the shard key, then a per-shard window sort
    * — no global order, no single-partition window. True first-fit packing
    * is inherently sequential; per-shard independence is what production
    * packers do (each worker packs its own partition), and the shard count
    * is the parallelism knob.
    *
    * Output: one row per (shard, bin) with document and token fill counts.
    */
  def packSequences(docs: DataFrame, idCol: String, textCol: String,
      budget: Int = 512, shards: Int = 32): DataFrame = {
    // budget 0 floors a division by zero into NULL bins; shards 0 pmods
    // every doc into a NULL shard (one single-task window over the corpus)
    require(budget >= 1 && shards >= 1,
      s"packSequences: budget/shards must be >= 1, got $budget/$shards")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard"))
      .orderBy(col("n_tokens").desc, col("doc_id"))
    // round-13 fix: pmod(string_id, n) implicitly casts the id to double —
    // NULL for non-numeric ids — so every doc would land in shard = null
    // and the window sort would serialize the whole corpus into ONE task,
    // the exact failure the shard key exists to avoid. Numeric ids keep
    // the plain modulo (pins the oracle-gated layout); anything else is
    // hashed to a shard instead of silently collapsing.
    val shardOf = docs.schema(idCol).dataType match {
      case _: org.apache.spark.sql.types.NumericType =>
        pmod(col("doc_id"), lit(shards)).cast("int")
      case _ => pmod(xxhash64(col("doc_id")), lit(shards.toLong)).cast("int")
    }
    docs
      .select(col(idCol).as("doc_id"), tokenCount(col(textCol)).as("n_tokens"))
      .withColumn("shard", shardOf)
      .withColumn("cum", sum(col("n_tokens")).over(w))
      .withColumn("bin", floor((col("cum") - col("n_tokens")) / budget).cast("int"))
      .groupBy(col("shard"), col("bin"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("tokens"))
  }
}
