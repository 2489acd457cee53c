package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Text-analysis columns for training-data curation: token counting,
  * quality scoring, language identification, fingerprinting. All pure
  * Column expressions — narrow, codegen'd, no shuffle, linear at any
  * scale.
  *
  * Ratio outputs are integer PER-MILLE units computed with the identical
  * IEEE double op sequence the DuckDB oracle runs (count·1000 then ÷ then
  * floor) — never raw doubles (the driver compares float repr exactly)
  * and never decimal casts of dyadic rationals (tie-rounding differs
  * across engines).
  */
object TextStats {

  /** Whitespace token count. */
  def wsTokenCount(text: Column): Column =
    size(split(trim(text), "\\s+"))

  /** BPE-ish subword unit count: letter runs, digit runs, single
    * non-alphanumeric marks — the usual pre-tokenizer regex shape.
    */
  def subwordCount(text: Column): Column =
    regexp_count(text, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"))

  /** Per-mille of tokens drawn from a stopword list. */
  def stopwordCount(tokens: Column, stopwords: Seq[String]): Column = {
    val sw = typedLit(stopwords)
    size(filter(tokens, t => array_contains(sw, t)))
  }

  // ───── Count-Min Sketch (deterministic, hash-checkable) ─────
  //
  // The frequency sketch for corpora whose vocabulary does not fit an
  // exact groupBy: d rows × w buckets of counters, estimate = min over
  // rows — never under the true count, over by at most εN (ε = e/w)
  // with probability 1−e^−d. Unlike the float sketch family (a7 HLL,
  // a13 KLL), every number here is an integer and the row hashes are
  // md5-derived, so the sketch is bit-identical across engines, reruns
  // AND shard layouts: the DuckDB oracle replays it exactly (t24 is a
  // hash-green sketch query), and per-shard sketches fold by counter
  // addition into precisely the unsharded sketch (`cmsMerge` — the
  // index-merge doctrine for sketches, spec-pinned).

  /** Row `row`'s bucket for a token: first 8 md5 hex chars (seeded by
    * the row id) as an integer, mod `width` — the same derivation both
    * engines compute (`conv` == DuckDB `CAST(concat('0x',…) AS BIGINT)`).
    */
  def cmsBucket(tok: Column, row: Int, width: Int): Column =
    conv(substring(md5(concat(lit(s"$row:"), tok)), 1, 8), 16, 10)
      .cast(LongType) % width

  /** Build the sketch over the corpus token stream: one narrow explode
    * (tokens × d hash rows), one aggregation whose key space is at most
    * d·w (map-side partials absorb the token mass before the shuffle —
    * the exchange carries ≤ d·w·partitions rows regardless of corpus
    * size). Output (row, bucket, cnt), ≤ d·w rows.
    */
  def cmsBuild(docs: DataFrame, depth: Int = 4, width: Int = 1024,
      textCol: String = "text"): DataFrame =
    Par.fan(docs)
      .select(explode(split(col(textCol), " ")).as("token"))
      .filter(col("token") =!= "")
      .select(posexplode(array((0 until depth).map(i =>
        cmsBucket(col("token"), i, width)): _*)).as(Seq("row", "bucket")))
      .groupBy(col("row"), col("bucket")).agg(count(lit(1)).as("cnt"))

  /** Point estimates for probe tokens: min over rows of the probed
    * buckets (absent bucket = 0). The sketch side is ≤ d·w rows —
    * broadcast-sized at any corpus scale.
    */
  def cmsEstimate(sketch: DataFrame, probes: DataFrame, depth: Int = 4,
      width: Int = 1024, tokenCol: String = "token"): DataFrame =
    probes
      .select(col(tokenCol), posexplode(array((0 until depth).map(i =>
        cmsBucket(col(tokenCol), i, width)): _*)).as(Seq("row", "bucket")))
      .join(broadcast(sketch), Seq("row", "bucket"), "left")
      .groupBy(col(tokenCol))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("cms_n"))

  /** Fold two sketches built with the SAME (depth, width): counters add
    * — merged == the unsharded build exactly (linearity of counting),
    * so corpus shards sketch independently with no cross-shard shuffle.
    */
  def cmsMerge(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).groupBy(col("row"), col("bucket"))
      .agg(sum(col("cnt")).as("cnt"))

  private def permille(num: Column, den: Column): Column =
    when(den > 0, floor(num.cast(DoubleType) * 1000d / den)).otherwise(lit(0L)).cast(LongType)

  /** English-ish stopwords present in the synthetic corpus vocabulary. */
  val EnStopwords: Seq[String] = Seq("the", "a", "and", "of", "to", "in", "is", "on")

  /** Quality metrics per doc: lengths, token counts, punctuation and
    * stopword per-mille, and a composite integer score (higher = better):
    *   score = stop_permille + min(n_tokens, 100)·10 − punct_permille.
    */
  def qualityMetrics(docs0: DataFrame, textCol: String = "text"): DataFrame = {
    val docs = Par.fan(docs0)
    val t = col(textCol)
    val toks = split(TextDedup.normalizeText(t), " ")
    docs
      .withColumn("n_chars_m", length(t).cast(LongType))
      .withColumn("n_tokens", size(split(trim(t), "\\s+")).cast(LongType))
      .withColumn("n_subwords", subwordCount(t).cast(LongType))
      .withColumn("punct_permille",
        permille(regexp_count(t, lit("[^A-Za-z0-9\\s]")).cast(LongType), length(t)))
      .withColumn("stop_permille",
        permille(stopwordCount(toks, EnStopwords), size(toks)))
      .withColumn("quality_score",
        col("stop_permille") + least(col("n_tokens"), lit(100L)) * 10L - col("punct_permille"))
  }

  // ───── language identification (stopword-profile heuristic) ─────

  /** Tiny per-language function-word profiles. Real language ID uses
    * character n-gram models; on a 100 TB corpus this exact shape —
    * per-language match counts then argmax, all narrow — is what scales.
    */
  val LangProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "and", "of", "to", "in", "is", "that", "it", "for"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "los", "se", "no"),
    "de" -> Seq("der", "die", "und", "das", "ist", "nicht", "von", "mit", "den", "ein"),
    "fr" -> Seq("le", "la", "et", "les", "des", "est", "un", "une", "du", "que"))

  /** Predicted language per doc: CJK script check first, then the profile
    * with the highest match count (priority order breaks ties), 'und' when
    * nothing matches.
    */
  def languageId(docs0: DataFrame, textCol: String = "text"): DataFrame = {
    val docs = Par.fan(docs0)
    val toks = split(TextDedup.normalizeText(col(textCol)), " ")
    val scored = LangProfiles.foldLeft(docs) { case (df, (lang, words)) =>
      df.withColumn(s"score_$lang", stopwordCount(toks, words))
    }
    val maxScore = greatest(LangProfiles.map { case (l, _) => col(s"score_$l") }: _*)
    // first profile (priority order) hitting the max wins ties
    val best = LangProfiles.map(_._1).foldRight(lit("und")) { case (lang, alt) =>
      when(col(s"score_$lang") === maxScore, lit(lang)).otherwise(alt)
    }
    scored.withColumn("pred_lang",
      when(col(textCol).rlike("[\\u4e00-\\u9fff]"), lit("zh"))
        .when(maxScore <= 0, lit("und"))
        .otherwise(best))
  }

  /** Document fingerprint: MD5 over the normalized text — the cheap
    * content-identity key (the reference's payload-hash idea applied to
    * documents; rolling-hash shingles feed MinHash in TextDedup).
    */
  def fingerprint(docs: DataFrame, textCol: String = "text"): DataFrame =
    Par.fan(docs).withColumn("fingerprint", md5(TextDedup.normalizeText(col(textCol))))

  /** Per-doc NOVELTY: the permille of a doc's shingles that appear
    * nowhere else in the corpus (df == 1) — "how much unique content
    * does this doc contribute". Low novelty + not-a-near-dup flags
    * boilerplate-heavy sources; curation keep-rates can key on it.
    * Shape: one shingle-frequency groupBy + one join keyed on the
    * shingle (batch side narrow) + one per-doc agg — no n², no window.
    */
  def noveltyScores(docs: DataFrame, n: Int = 3): DataFrame = {
    val sh = TextDedup.shingleRows(docs, n)
    val freq = sh.groupBy(col("s")).agg(count(lit(1)).as("df"))
    sh.join(freq, Seq("s"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shingles"),
        sum(when(col("df") === 1, 1L).otherwise(0L)).as("n_unique"))
      .withColumn("novelty_permille",
        floor(lit(1000d) * col("n_unique").cast(DoubleType) /
          col("n_shingles").cast(DoubleType)).cast(LongType))
  }

  /** Incremental novelty — the deployment form: the CORPUS's shingle
    * frequencies are the stored state (plain abelian counts, maintained
    * per append like the d12 df table); an arriving batch scores the
    * permille of its shingles UNSEEN in the corpus via one left join.
    * The corpus is never re-shuffled per batch beyond its stored
    * frequency table.
    */
  def noveltyScoresFrozen(existing: DataFrame, incoming: DataFrame,
      n: Int = 3): DataFrame =
    noveltyAgainstFreq(incoming,
      TextDedup.shingleRows(existing, n)
        .groupBy(col("s")).agg(count(lit(1)).as("df")),
      n)

  /** Novelty of `incoming` against an explicit (s, df) frequency table —
    * the stored-state form `Streams.noveltyStream` maintains per batch.
    */
  def noveltyAgainstFreq(incoming: DataFrame, freq: DataFrame,
      n: Int = 3): DataFrame =
    TextDedup.shingleRows(incoming, n)
      .join(freq, Seq("s"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shingles"),
        sum(when(col("df").isNull, 1L).otherwise(0L)).as("n_unseen"))
      .withColumn("novelty_permille",
        floor(lit(1000d) * col("n_unseen").cast(DoubleType) /
          col("n_shingles").cast(DoubleType)).cast(LongType))

  /** Per-document Shannon entropy of the unigram distribution, integer
    * micro-nats: H = ln n − (Σ_tok c·ln c)/n. High = diverse vocabulary;
    * near zero = repeated-token spam — the information-theoretic form of
    * the dup-word ratio (t9) the filtering literature thresholds on.
    *
    * Parity: each ln rounds through DECIMAL(18,6) once (the t15
    * doctrine), c·lnc and the sums are exact decimal arithmetic, and
    * the normalization is integer (micro DIV n) — hash-stable across
    * engines. Shape: one narrow explode + two hash aggregations, the
    * same fabric as t1/t13.
    */
  def tokenEntropy(docs: DataFrame): DataFrame =
    Par.fan(docs)
      .select(col("doc_id"),
        explode(split(TextDedup.normalizeText(col("text")), " ")).as("tok"))
      .filter(length(col("tok")) > 0)
      .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("c"))
      .select(col("doc_id"), col("c"),
        log(col("c").cast(DoubleType)).cast(DecimalType(18, 6)).as("lnc6"))
      .groupBy(col("doc_id"))
      .agg(sum(col("c")).as("n_toks"),
        sum(col("c").cast(DecimalType(18, 0)) * col("lnc6")).as("s6"))
      .select(col("doc_id"), col("n_toks"),
        expr("""CAST(CAST(CAST(ln(CAST(n_toks AS DOUBLE)) AS DECIMAL(18,6))
            * 1000000 AS BIGINT)
          - (CAST(s6 * 1000000 AS BIGINT) DIV n_toks) AS BIGINT)""")
          .as("entropy_micro"))
}
