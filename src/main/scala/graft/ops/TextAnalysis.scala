package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Text analysis for training-data pipelines: language ID, quality
 * scoring, token counting, fingerprinting (BASELINE.json north-star).
 * All pure Column expressions — codegen'd, oracle-expressible.
 */
object TextAnalysis {

  /** Whitespace tokens of trimmed, lowercased text. */
  def tokens(text: Column): Column =
    split(lower(trim(text)), "\\s+")

  /** Whitespace token count (0 for blank). */
  def tokenCount(text: Column): Column =
    when(trim(text) === "" || text.isNull, lit(0))
      .otherwise(size(tokens(text)))

  /** BPE-ish subword token count: letter runs, digit runs, and single
    * non-alphanumeric marks each count as one token — the classic
    * pre-tokenizer regex shape. */
  def subwordCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0)))

  /** Count of tokens appearing in a fixed vocabulary (occurrences, not
    * distinct). */
  def vocabHits(toks: Column, vocab: Seq[String]): Column = {
    val vocabCol = array(vocab.map(lit(_)): _*)
    size(filter(toks, t => array_contains(vocabCol, t)))
  }

  /** Small multilingual stopword lists for the n-gram/stopword language
    * heuristic. Order = deterministic tie priority. */
  val StopwordLists: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "a", "in", "is", "it", "that", "for"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "mit", "auf", "zu"),
    "fr" -> Seq("le", "la", "les", "et", "est", "pas", "un", "une", "dans", "pour"),
    "es" -> Seq("el", "la", "los", "las", "y", "es", "no", "un", "una", "para"))

  /**
   * Stopword-vote language ID: the language whose stopword list scores
   * the most occurrences wins; blank/no-hits → "unknown". Deterministic
   * tie-break by list order (greatest-with-priority encoding).
   */
  def languageId(text: Column): Column = {
    val toks = tokens(text)
    // encode (score, priority) as score * 8 + priority so one greatest()
    // resolves both; priority descends with list order for stable ties
    val n = StopwordLists.size
    val scored = StopwordLists.zipWithIndex.map { case ((lang, words), i) =>
      (lang, vocabHits(toks, words) * lit(8) + lit(n - i))
    }
    val best = scored.map(_._2).reduce((a, b) => greatest(a, b))
    val noHits = scored.map(_._2 <= lit(n)).reduce(_ && _) // all scores 0
    scored.foldLeft(when(noHits, lit("unknown"))) { case (acc, (lang, s)) =>
      acc.when(s === best, lit(lang))
    }.otherwise(lit("unknown"))
  }

  /** Ratio of simple punctuation chars to total length (0 for blank). */
  def punctRatio(text: Column): Column = {
    val punct = length(text) -
      length(regexp_replace(text, "[.,!?;:()\"']", ""))
    when(length(text) > 0, punct.cast("double") / length(text))
      .otherwise(lit(0.0))
  }

  /** Mean token length (0 for blank). */
  def meanTokenLength(text: Column): Column = {
    val tc = tokenCount(text)
    when(tc > 0,
      length(regexp_replace(trim(text), "\\s+", "")).cast("double") / tc)
      .otherwise(lit(0.0))
  }

  /**
   * Heuristic quality score in [0,1]: rewards in-range doc length and
   * token shape, penalizes punctuation soup and stopword-free text —
   * the standard cheap pretraining-quality signals.
   */
  def qualityScore(text: Column): Column = {
    val tc = tokenCount(text).cast("double")
    val lenScore = least(tc / lit(20.0), lit(1.0)) // ≥20 tokens = full marks
    val mtl = meanTokenLength(text)
    val shapeScore = when(mtl >= 3 && mtl <= 10, lit(1.0)).otherwise(lit(0.5))
    val punctScore = lit(1.0) - least(punctRatio(text) * lit(4.0), lit(1.0))
    val stopScore = when(
      vocabHits(tokens(text), StopwordLists.head._2).cast("double") / greatest(tc, lit(1.0)) >= 0.01,
      lit(1.0)).otherwise(lit(0.5))
    round((lenScore * lit(0.4) + shapeScore * lit(0.2) +
      punctScore * lit(0.2) + stopScore * lit(0.2)), 4)
  }

  /**
   * Document fingerprint: lexicographic min of the MD5 digests of the
   * k-char shingles (a 1-hash MinHash — stable under small edits, cheap
   * to compare). Hex string, deterministic, oracle-expressible.
   */
  def fingerprint(text: Column, shingleLen: Int = 8): Column = {
    val norm = lower(regexp_replace(trim(text), "\\s+", " "))
    when(length(norm) === 0, lit(null).cast("string")).otherwise(
      array_min(
        transform(
          sequence(lit(1), greatest(lit(1), length(norm) - lit(shingleLen - 1))),
          i => md5(norm.substr(i, lit(shingleLen))))))
  }

  /** Full per-document profile used by the pipeline queries. */
  def profile(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = col(textCol)
    df.select(
      col(idCol),
      length(t).as("n_chars"),
      tokenCount(t).as("n_tokens"),
      subwordCount(t).as("n_subwords"),
      round(meanTokenLength(t), 4).as("mean_token_len"),
      round(punctRatio(t), 4).as("punct_ratio"),
      languageId(t).as("lang_pred"),
      qualityScore(t).as("quality"),
      fingerprint(t).as("fingerprint"))
  }
}
