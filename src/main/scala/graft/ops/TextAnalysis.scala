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
    * distinct). JIT'd kernel — the filter/array_contains lambda pair is
    * interpreted (CodegenFallback) and shows up hot in profiles. */
  def vocabHits(toks: Column, vocab: Seq[String]): Column = {
    val set = vocab.toSet
    val kernel = udf((ts: Seq[String]) =>
      if (ts == null) 0 else ts.count(set.contains))
    kernel(toks)
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
    // one JIT'd pass computing every language's stopword score and the
    // argmax with the same encoding the oracle SQL replicates:
    // score = hits*8 + (n - listIndex); all-zero-hits → "unknown";
    // first language (list order) holding the max wins ties
    val lists = StopwordLists.map { case (lang, ws) => (lang, ws.toSet) }
    val n = lists.size
    val kernel = udf((ts: Seq[String]) => {
      if (ts == null) "unknown"
      else {
        val scores = lists.zipWithIndex.map { case ((_, set), i) =>
          ts.count(set.contains) * 8 + (n - i)
        }
        if (scores.forall(_ <= n)) "unknown"
        else {
          val best = scores.max
          lists(scores.indexOf(best))._1
        }
      }
    })
    kernel(tokens(text))
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
    // JIT'd kernel: one MessageDigest reused across shingles; identical
    // digests/hex to Spark's md5() and DuckDB's md5() (UTF-8 bytes,
    // lowercase hex), so the oracle stays expressible in plain SQL
    val kernel = udf((s: String) => {
      if (s == null || s.isEmpty) null
      else {
        val md = java.security.MessageDigest.getInstance("MD5")
        val n = s.length
        val m = math.max(1, n - shingleLen + 1)
        var minHex: String = null
        var i = 0
        while (i < m) {
          val sh = s.substring(i, math.min(i + shingleLen, n))
          val d = md.digest(sh.getBytes(java.nio.charset.StandardCharsets.UTF_8))
          val hex = new Array[Char](32)
          var j = 0
          while (j < 16) {
            val v = d(j) & 0xFF
            hex(j * 2) = Character.forDigit(v >>> 4, 16)
            hex(j * 2 + 1) = Character.forDigit(v & 0xF, 16)
            j += 1
          }
          val hs = new String(hex)
          if (minHex == null || hs.compareTo(minHex) < 0) minHex = hs
          i += 1
        }
        minHex
      }
    })
    kernel(lower(regexp_replace(trim(text), "\\s+", " ")))
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

  /**
   * Word-repetition metrics (Gopher/RefinedWeb-style quality-filter
   * family): duplicate-word fraction and the share of the most frequent
   * word bigram among all bigram occurrences (WITH repeats — unlike the
   * distinct shingle sets of the dedup paths). High values mark
   * boilerplate/looping text that quality filters drop before training.
   * One JIT'd pass per document; both fractions are plain int/int
   * divisions, so the SQL oracle reproduces them bit-exactly.
   * Returns a struct (n_words, dup_word_frac, top_bigram_frac).
   */
  def repetitionMetrics(text: Column): Column = {
    val kernel = udf((s: String) => {
      if (s == null) (0, 0.0, 0.0)
      else {
        val toks = s.trim.toLowerCase.split("\\s+")
        val n = toks.length
        val words = new java.util.HashMap[String, Integer]
        var i = 0
        while (i < n) {
          words.merge(toks(i), 1, (a, b) => a + b)
          i += 1
        }
        val dupFrac = 1.0 - words.size.toDouble / n
        var topBigram = 0
        if (n >= 2) {
          val bigrams = new java.util.HashMap[String, Integer]
          i = 0
          while (i < n - 1) {
            val c = bigrams.merge(toks(i) + " " + toks(i + 1), 1, (a, b) => a + b)
            if (c > topBigram) topBigram = c
            i += 1
          }
        }
        val topFrac = if (n < 2) 0.0 else topBigram.toDouble / (n - 1)
        (n, dupFrac, topFrac)
      }
    })
    kernel(text).cast(
      "struct<n_words:int,dup_word_frac:double,top_bigram_frac:double>")
  }

  /**
   * PII redaction for training text: emails, US-style SSNs, and phone
   * numbers replaced with typed placeholder tokens. Patterns are kept
   * RE2-compatible (character classes and bounded repeats only — no
   * backreferences/lookaround) so external engines apply the identical
   * scrub; application order is fixed (email → ssn → phone) because
   * the pattern domains can overlap on digit runs.
   */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val SsnPattern = "\\b\\d{3}-\\d{2}-\\d{4}\\b"
  val PhonePattern = "\\b\\d{3}[-. ]\\d{3}[-. ]\\d{4}\\b"

  def redactPii(text: Column): Column = {
    val noEmail = regexp_replace(text, EmailPattern, "<EMAIL>")
    val noSsn = regexp_replace(noEmail, SsnPattern, "<SSN>")
    regexp_replace(noSsn, PhonePattern, "<PHONE>")
  }

  /**
   * Deterministic content-hash dataset split — the standard way to get
   * train/valid/test assignments that are stable across runs, cluster
   * sizes, and row order (a random() split is none of these): bucket by
   * the first two hex chars of md5(key) (uniform over 0..255) and
   * compare against hex thresholds. md5 is identical across engines,
   * so the assignment is oracle-expressible in plain SQL — and more
   * importantly, reproducible anywhere.
   */
  def assignSplit(key: Column, trainPct: Double = 0.8,
                  validPct: Double = 0.1): Column = {
    require(trainPct >= 0 && validPct >= 0 && trainPct + validPct <= 1.0,
      "split fractions must be non-negative and sum to at most 1")
    // "zz" sorts above every hex pair — a 100% bucket, since f"100"
    // would compare lexicographically BELOW "ff"
    def hex2(v: Int): String = if (v >= 256) "zz" else f"$v%02x"
    val trainHex = hex2(math.round(trainPct * 256).toInt)
    val validHex = hex2(math.round((trainPct + validPct) * 256).toInt)
    val bucket = substring(md5(key.cast("string")), 1, 2)
    when(bucket < trainHex, "train")
      .when(bucket < validHex, "valid")
      .otherwise("test")
  }

  /** URL parts of the FIRST http(s) URL in `text` as a struct
    * (url, domain, path) — '' when absent (regexp_extract semantics,
    * identical in Spark and DuckDB). The pattern is deliberately
    * RE2-simple: scheme, host of [A-Za-z0-9.-], optional
    * non-space path. */
  def urlParts(text: Column): Column = {
    val full = "https?://[A-Za-z0-9.-]+(/[^ ]*)?"
    val host = "https?://([A-Za-z0-9.-]+)"
    struct(
      regexp_extract(text, full, 0).as("url"),
      regexp_extract(text, host, 1).as("domain"),
      regexp_extract(text, "https?://[A-Za-z0-9.-]+(/[^ ]*)", 1).as("path"))
  }

  /**
   * URL canonicalization — the normalization a web-corpus pipeline
   * applies before URL-level dedup, so syntactic variants of one page
   * collapse to one key. Rules (documented contract, applied in
   * order):
   *   1. strip the fragment (`#…`);
   *   2. lowercase scheme and host (path/query case is significant);
   *   3. drop a `www.` host prefix;
   *   4. drop explicit default ports (`:80`, `:443`);
   *   5. drop `utm_*` tracking parameters (and tidy separators);
   *   6. strip one trailing `/`.
   *
   * Pure chained regexp_replace — whole-stage codegen, no UDF, safe
   * in a 100 TB narrow pass.
   */
  def canonicalUrl(url: Column): Column = {
    val noFrag = regexp_replace(url, "#.*", "")
    val lowered = concat(
      lower(regexp_extract(noFrag, "^(https?://[^/?#]*)", 1)),
      regexp_replace(noFrag, "^https?://[^/?#]*", ""))
    val noWww = regexp_replace(lowered, "^(https?://)www\\.", "$1")
    // scheme-anchored default-port strip: :80 is only a default for
    // http and :443 only for https — http://host:443/x is a real
    // non-default port and must NOT collapse onto http://host/x
    // (URL-level dedup would drop a distinct document)
    val noPort = regexp_replace(
      regexp_replace(noWww, "^(http://[^/?#]*):80(?=[/?#]|$)", "$1"),
      "^(https://[^/?#]*):443(?=[/?#]|$)", "$1")
    val noUtm = regexp_replace(
      regexp_replace(
        regexp_replace(noPort, "utm_[A-Za-z0-9_]*=[^&#]*&", ""),
        "[?&]utm_[A-Za-z0-9_]*=[^&#]*", ""),
      "[?&]$", "")
    regexp_replace(noUtm, "(.)/$", "$1")
  }

  /**
   * Text cleaning for scraped corpora: strip HTML tags, decode the
   * five predefined entities, NFC-normalize (native codegen'd
   * [[org.apache.spark.sql.graftshim.NfcNormalizeExpr]] — composed
   * and decomposed spellings must hash identically downstream), then
   * collapse runs of whitespace and trim. Narrow, UDF-free pass.
   *
   * Entity decode runs after tag strip (so `&lt;b&gt;` survives as
   * literal text rather than becoming a strippable tag) and `&amp;`
   * is decoded LAST — the standard order that keeps `&amp;lt;` from
   * double-decoding.
   */
  def cleanText(text: Column): Column = {
    val noTags = regexp_replace(text, "<[^>]*>", " ")
    val decoded = Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "'", "&amp;" -> "&")
      .foldLeft(noTags) { case (c, (e, r)) =>
        regexp_replace(c, e, java.util.regex.Matcher.quoteReplacement(r)) }
    val nfc = org.apache.spark.sql.graftshim.UnicodeColumns.nfcNormalize(decoded)
    trim(regexp_replace(nfc, "\\s+", " "))
  }

  /**
   * Deterministic hash sample: keep a row iff the first 8 md5 hex
   * chars of its key fall under `fraction` of the bucket space — the
   * same mechanism as [[assignSplit]], so membership is stable across
   * runs, row order, and cluster size, and composes with it (disjoint
   * hash prefixes ⇒ independent decisions). Content-hash sampling is
   * how a 100 TB pipeline takes reproducible subsets: no RNG state,
   * no seed plumbing, re-runs and backfills agree.
   */
  def sampleByHash(key: Column, fraction: Double): Column = {
    require(fraction >= 0 && fraction <= 1, "fraction must be in [0,1]")
    // 'zzzzzzzz' sorts above every hex string — the 100% bucket
    // (f"$n%08x" of 16^8 would be '100000000', which compares BELOW
    // most hex strings; same trap as assignSplit's 2-char version)
    val space = 1L << 32
    val bound = math.round(fraction * space)
    val hex = if (bound >= space) "zzzzzzzz" else f"$bound%08x"
    substring(md5(key.cast("string")), 1, 8) < hex
  }

  /**
   * Token-budget subset — "give me a reproducible N-token slice of
   * this corpus": documents are laid out in content-hash order (md5 of
   * the id, id-padded into the key so the order is total — the
   * [[graft.ops.Packing.shufflePositions]] key) and the maximal PREFIX
   * of whole documents whose tokens fit `budgetTokens` is kept. Hash
   * order makes the slice an unbiased sample that is stable across
   * runs, clusters, and partition counts, and MONOTONE in the budget:
   * raising it only adds documents (the [[sampleByHash]] property, but
   * exact in tokens rather than approximate in rows — a training run
   * budgeted in tokens wants the former).
   *
   * Scale shape: the global token offset is
   * [[graft.ops.Packing.withPrefixSum]]'s distributed exclusive prefix
   * sum — one range shuffle plus a shuffle-free streaming pass; the
   * driver sees one total per partition, never rows. No global window.
   * All arithmetic exact longs; empty documents carry no tokens and
   * are dropped. `idCol` must be unique (the prefix-sum total-order
   * contract): duplicated ids share a sort key, making their relative
   * offsets — and a budget cut landing between them — run-dependent.
   *
   * Output: (idCol, n_toks, cum_toks), cum_toks ≤ budgetTokens.
   */
  def tokenBudgetSample(df: DataFrame, idCol: String, textCol: String,
                        budgetTokens: Long): DataFrame = {
    require(budgetTokens > 0, s"budgetTokens must be positive: $budgetTokens")
    val withN = df
      .select(col(idCol),
        tokenCount(col(textCol)).cast("long").as("n_toks"))
      .filter(col("n_toks") > 0)
      .withColumn("__okey",
        concat(md5(col(idCol).cast("string")),
          lpad(col(idCol).cast("string"), 20, "0")))
    Packing.withPrefixSum(withN, "__okey", col("n_toks"), "__off")
      .filter(col("__off") + col("n_toks") <= budgetTokens)
      .select(col(idCol), col("n_toks"),
        (col("__off") + col("n_toks")).as("cum_toks"))
  }

  /**
   * Weighted mixture sampling — the data-mixing step of corpus
   * assembly: each row's keep decision uses the per-class rate of its
   * `cls` value (e.g. upsample books, downsample web). Built on
   * [[sampleByHash]], so decisions are content-deterministic AND
   * nested: raising a class's rate only ADDS rows, it never swaps the
   * kept subset — reweighting a 100 TB mix between runs touches only
   * the delta. Classes absent from `rates` use `defaultRate`.
   */
  def mixtureSample(key: Column, cls: Column,
                    rates: Seq[(String, Double)],
                    defaultRate: Double = 0.0): Column =
    rates.foldRight(sampleByHash(key, defaultRate)) {
      case ((c, r), acc) => when(cls === lit(c), sampleByHash(key, r))
        .otherwise(acc)
    }

  /**
   * Token-budget mixture rates — the "assemble an N-token mix: 50%
   * web, 25% code, …" step of corpus construction. For each (class,
   * weight): rate = min(1, budget·weight / class_tokens). Classes
   * only DOWNSAMPLE — a deficit class caps at rate 1 and lands under
   * its target share (upsampling means duplication, an epoch policy
   * for the caller, not a sampler's job); classes without a weight
   * row rate 0. Feed the result straight to [[mixtureSample]] for
   * the content-deterministic keep decision — because that sampler
   * is nested, re-budgeting between corpus builds only adds or
   * removes the delta.
   *
   * Scale: one map-side-combined aggregate bounded by class
   * cardinality; the driver holds |weights| rate scalars. Same
   * corpus + budget + weights ⇒ bit-identical rates (IEEE ops over
   * exact long counts).
   */
  def mixtureRates(df: DataFrame, clsCol: String, tokenCol: String,
                   budget: Long, weights: Seq[(String, Double)])
      : Seq[(String, Double)] = {
    require(budget > 0, s"budget must be positive: $budget")
    require(weights.nonEmpty && weights.forall(_._2 >= 0),
      "weights must be non-empty and non-negative")
    val totals = df.groupBy(col(clsCol))
      .agg(sum(col(tokenCol).cast("long")).as("__tok"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    weights.map { case (c, w) =>
      val avail = totals.getOrElse(c, 0L)
      val rate =
        if (avail <= 0 || w <= 0) 0.0
        else math.min(1.0, budget.toDouble * w / avail.toDouble)
      c -> rate
    }
  }

  /**
   * Token-distribution drift between two corpus snapshots — the
   * TEXT-space sibling of [[graft.ops.Similarity.embeddingDrift]]:
   * per-token chi-square homogeneity contributions over the top-N
   * tokens by combined count, the "did the language of this source
   * move" tripwire between crawls. Chi-square (not KL/JSD) is
   * deliberate: it is PURE rational arithmetic over exact counts —
   * hash-exact across engines — where a log-based divergence inherits
   * each engine's last-ulp `ln`.
   *
   *   e₁ = (o₁+o₂)·n₁/(n₁+n₂),   χ²(t) = (o₁−e₁)²/e₁ + (o₂−e₂)²/e₂
   *
   * with n₁/n₂ the FULL token totals of each side (top-N bounds the
   * report, not the denominators). Sort the output by chi2 desc and
   * the head IS the changed vocabulary.
   *
   * Scale: two map-side-combined token counts, a full-outer join at
   * vocab cardinality, TakeOrdered(topN) (combined-count desc, term
   * asc — total order), two broadcast total scalars. Nothing
   * data-scale crosses the driver.
   *
   * Output: (term, n_before, n_after, p_before, p_after, chi2),
   * round-9/round-6 mirrored trees.
   */
  def tokenDistributionDrift(before: DataFrame, after: DataFrame,
                             textCol: String, topN: Int = 100): DataFrame = {
    require(topN >= 1, s"topN must be >= 1: $topN")
    def counts(df: DataFrame, name: String): DataFrame = df
      .filter(col(textCol).isNotNull && trim(col(textCol)) =!= "")
      .select(explode(tokens(col(textCol))).as("term"))
      .filter(col("term") =!= "")
      .groupBy(col("term")).agg(count(lit(1)).as(name))
    val b = counts(before, "n_before")
    val a = counts(after, "n_after")
    val nb = b.agg(sum(col("n_before")).as("__n1"))
    val na = a.agg(sum(col("n_after")).as("__n2"))
    val top = b.join(a, Seq("term"), "full_outer")
      .select(col("term"),
        coalesce(col("n_before"), lit(0L)).as("n_before"),
        coalesce(col("n_after"), lit(0L)).as("n_after"))
      .orderBy((col("n_before") + col("n_after")).desc, col("term").asc)
      .limit(topN)
    val e1 = (col("n_before") + col("n_after")).cast("double") *
      col("__n1") / (col("__n1") + col("__n2"))
    val e2 = (col("n_before") + col("n_after")).cast("double") *
      col("__n2") / (col("__n1") + col("__n2"))
    val d1 = col("n_before") - e1
    val d2 = col("n_after") - e2
    top.crossJoin(broadcast(nb)).crossJoin(broadcast(na))
      .select(col("term"), col("n_before"), col("n_after"),
        round(col("n_before").cast("double") / col("__n1"), 9)
          .as("p_before"),
        round(col("n_after").cast("double") / col("__n2"), 9)
          .as("p_after"),
        when(col("__n1") > 0 && col("__n2") > 0,
          round(d1 * d1 / e1 + d2 * d2 / e2, 6)).as("chi2"))
  }

  /**
   * Dialog-structure audit for chat-format training data: per
   * conversation, the turn-taking shape SFT/RLHF formats require —
   * how many turns, how many CONSECUTIVE same-role turns (the
   * role-alternation violations chat templates reject), which role
   * opens, how many distinct roles. Feed the violation rows to a
   * filter or a repair pass; at corpus scale malformed conversations
   * are the rule, not the exception.
   *
   * Order within a conversation is (tsCol, tieCol) — the tie column
   * makes the order total, so repeat counts are a pure function of
   * the data (the groupedTopK total-order contract).
   *
   * Scale: one keyed window (lag + row_number within the
   * conversation — partitioned by conv, never global) and one
   * map-side-combined aggregate. A mega-conversation costs its own
   * partition sort, nothing more.
   *
   * Output: (convCol, n_turns, n_repeats, first_role, n_roles).
   */
  def dialogTurnAudit(df: DataFrame, convCol: String, tsCol: String,
                      tieCol: String, roleCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(convCol))
      .orderBy(col(tsCol).asc, col(tieCol).asc)
    df
      // tieCol non-null keeps the order engine-independent: Spark
      // sorts NULLS FIRST on ASC where DuckDB defaults NULLS LAST, so
      // a ts-tie involving a null tie id would diverge cross-engine
      .filter(col(convCol).isNotNull && col(tsCol).isNotNull &&
        col(roleCol).isNotNull && col(tieCol).isNotNull)
      .select(col(convCol), col(roleCol).as("__r"),
        lag(col(roleCol), 1).over(w).as("__prev"),
        row_number().over(w).as("__rn"))
      .groupBy(col(convCol))
      .agg(count(lit(1)).as("n_turns"),
        count(when(col("__r") === col("__prev"), lit(1))).as("n_repeats"),
        max(when(col("__rn") === 1, col("__r"))).as("first_role"),
        countDistinct(col("__r")).as("n_roles"))
  }

  /**
   * Temperature-scaled mixture rates — the multilingual/multi-domain
   * rebalancing recipe (the mT5/XLM-R sampling rule): class shares
   * follow n^α instead of n, so α < 1 flattens the head and lifts the
   * tail (α = 1 is proportional, α → 0 uniform),
   *
   *   weight_c = n_c^α / Σ_d n_d^α,   rate_c = min(1, budget·weight_c / n_c)
   *
   * The rate column feeds [[mixtureSample]] directly (classes only
   * downsample — the [[mixtureRates]] convention; a deficit class caps
   * at 1 and lands under target).
   *
   * Scale: one class-cardinality aggregate + one broadcast normalizer
   * scalar. Cross-engine note: α = 0.5 (the common default) computes
   * via `sqrt`, which IEEE requires correctly rounded — bit-exact on
   * every engine; other α use `pow`, where engines may differ in the
   * last ulp (the round-6 on the weight absorbs it away from rate
   * boundaries, but only sqrt is exact by construction).
   *
   * Output: (clsCol, n_tokens, weight, rate).
   */
  def temperatureMixtureRates(df: DataFrame, clsCol: String,
                              tokenCol: String, budget: Long,
                              alpha: Double = 0.5): DataFrame = {
    require(budget > 0, s"budget must be positive: $budget")
    require(alpha > 0 && alpha <= 1, s"alpha must be in (0,1]: $alpha")
    val totals = df
      .filter(col(clsCol).isNotNull)
      .groupBy(col(clsCol))
      .agg(sum(col(tokenCol).cast("long")).as("n_tokens"))
      .filter(col("n_tokens") > 0)
    val wRaw =
      if (alpha == 0.5) sqrt(col("n_tokens").cast("double"))
      else pow(col("n_tokens").cast("double"), lit(alpha))
    val weighted = totals.withColumn("__w", round(wRaw, 6))
    val norm = weighted.agg(
      sum(col("__w").cast("decimal(38,6)")).cast("double").as("__s"))
    weighted.crossJoin(broadcast(norm))
      .select(col(clsCol), col("n_tokens"),
        round(col("__w") / col("__s"), 9).as("weight"),
        round(least(lit(1.0),
          lit(budget.toDouble) * (col("__w") / col("__s")) /
            col("n_tokens")), 9).as("rate"))
  }

  /**
   * Frequency-ordered token vocabulary: the top `maxSize` whitespace
   * tokens by (count DESC, token ASC), with token_id = rank position —
   * the dictionary half of a tokenizer pipeline. Deterministic by
   * construction (total tiebreak order). The result is collected: a
   * vocabulary is driver-sized BY DEFINITION (maxSize bounds it), and
   * `orderBy().limit()` folds to TakeOrderedAndProject — a per-partition
   * top-k plus one merge, NOT a global sort.
   */
  def buildVocab(df: DataFrame, textCol: String,
                 maxSize: Int = 4096): Array[(String, Long)] =
    df.select(explode(tokens(col(textCol))).as("term"))
      .filter(col("term") =!= "")
      .groupBy(col("term")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("term").asc)
      .limit(maxSize)
      .collect().map(r => (r.getString(0), r.getLong(1)))

  /** The vocabulary as a relation (term, token_id, n_occurrences). */
  def vocabDf(spark: org.apache.spark.sql.SparkSession,
              vocab: Array[(String, Long)]): DataFrame = {
    import spark.implicits._
    vocab.zipWithIndex
      .map { case ((t, n), i) => (t, i, n) }.toSeq
      .toDF("term", "token_id", "n_occurrences")
  }

  /**
   * Dictionary-encode documents: (id, pos, token_id) with `oovId` for
   * out-of-vocabulary tokens. `pos` is the 0-based index in the raw
   * whitespace token array (empty tokens keep their slot, so positions
   * are stable under vocabulary changes). The vocabulary joins in as a
   * BROADCAST local relation — the corpus-side pass is narrow.
   */
  def tokenize(df: DataFrame, idCol: String, textCol: String,
               vocab: Array[(String, Long)], oovId: Int = -1): DataFrame = {
    val vdf = vocabDf(df.sparkSession, vocab).select(col("term"),
      col("token_id").as("__tid"))
    df.select(col(idCol), posexplode(tokens(col(textCol))).as(Seq("pos", "term")))
      .filter(col("term") =!= "")
      .join(broadcast(vdf), Seq("term"), "left")
      .select(col(idCol), col("pos"),
        coalesce(col("__tid"), lit(oovId)).as("token_id"))
  }

  /**
   * TextRank keyword extraction (Mihalcea & Tarau 2004): PageRank over
   * the word co-occurrence graph — two distinct words co-occurring
   * within `window` raw token positions of each other (same document)
   * form an edge, multiplicity = co-occurrence count, and the rank is
   * the keyword score. A pure composition of this file's tokenizer
   * with [[graft.ops.Graphs.pageRank]]'s oracle-exact loop: the
   * co-occurrence join is one keyed self-join on (doc, position
   * range) — bounded fan-out `window` per token, never all-pairs —
   * and the power iteration inherits the persisted pre-partitioned
   * loop and DECIMAL float discipline (so the whole chain stays
   * hash-exact through an unrolled SQL oracle).
   *
   * Positions index the `\s+` whitespace split (runs of whitespace
   * collapse, so a double space does not widen co-occurrence reach);
   * blank tokens are filtered before pairing.
   *
   * Output: top `k` of (word, rank), rank desc / word asc — the
   * deterministic keyword list.
   */
  def textRankKeywords(df: DataFrame, idCol: String, textCol: String,
                       window: Int = 2, iterations: Int = 3,
                       k: Int = 30): DataFrame = {
    require(window >= 1, "window must be >= 1")
    val wp = df
      .select(col(idCol).as("__d"),
        posexplode(tokens(col(textCol))).as(Seq("__p", "__w")))
      .filter(col("__w") =!= "")
    val e0 = wp.alias("a")
      .join(wp.alias("b"),
        col("a.__d") === col("b.__d") &&
          col("b.__p") - col("a.__p") >= 1 &&
          col("b.__p") - col("a.__p") <= window &&
          col("a.__w") =!= col("b.__w"))
      .select(col("a.__w").as("src"), col("b.__w").as("dst"))
    val e = e0.unionAll(e0.select(col("dst").as("src"), col("src").as("dst")))
    val ranked = graft.ops.Graphs.pageRank(e, "src", "dst", iterations)
    val out = ranked
      .orderBy(col("rank").desc, col("node").asc)
      .limit(k)
      .select(col("node").as("word"), col("rank"))
    // the loop's persisted rank frame backs `out` only until collected;
    // materialization here is the bounded top-k, safe to leave cached —
    // callers running inside a gate clear caches between queries
    out
  }

  /**
   * Unicode script profile — per-document character counts by script
   * class (Latin, digit, whitespace, CJK, Cyrillic), the writing-
   * system evidence [[languageId]]'s stopword vote can't see (it only
   * knows the four stopword languages; a Chinese or Russian document
   * scores zero there but lights up here). Each count is
   * `len(text) − len(text with the class removed)` — one codegen'd
   * narrow pass, no tokenization, exact integers (no float surface at
   * all, the cheapest kind of oracle exactness).
   *
   * Output: (idCol, n_chars, latin, digit, space, cjk, cyrillic).
   */
  def scriptProfile(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = coalesce(col(textCol), lit(""))
    def cnt(cls: String) = (length(t) -
      length(regexp_replace(t, cls, ""))).cast("long")
    df.select(col(idCol),
      length(t).cast("long").as("n_chars"),
      cnt("[A-Za-z]").as("latin"),
      cnt("[0-9]").as("digit"),
      cnt("\\s").as("space"),
      cnt("[\\u4e00-\\u9fff]").as("cjk"),
      cnt("[\\u0400-\\u04ff]").as("cyrillic"))
  }

  /**
   * Feature hashing (the "hashing trick", Weinberger et al. 2009):
   * vectorize text into a FIXED dimension without any vocabulary pass
   * — token t lands in bucket `md5("b:"+t) mod dim` with sign ±1 from
   * an independent hash bit, occurrences summing per (doc, bucket).
   * The signed variant makes collisions cancel in expectation
   * (unbiased inner products), which is why it is the standard
   * vocabulary-free featurizer for a streaming/100 TB corpus: no
   * dictionary to build, broadcast, or version — two fixed hashes per
   * token, one map-side-combined aggregate, and the output is a
   * sparse (doc, bucket, val) relation any classifier step (e.g.
   * [[graft.ops.QualityClassifier]]) can consume at any later date
   * with no stored state. Engine-portable via the md5 hash convention
   * (the [[graft.operators.Audits.cmsBucket]] family), so the gate is
   * hash-exact.
   *
   * Output: (idCol, bucket, val), zero-sum buckets included (they
   * carry cancellation information; filter if a consumer wants
   * non-zeros only).
   */
  def hashingVectorize(df: DataFrame, idCol: String, textCol: String,
                       dim: Int = 256): DataFrame = {
    require(dim >= 2, s"dim must be >= 2: $dim")
    val bucket = conv(substring(md5(concat(lit("b:"), col("term"))), 1, 8),
      16, 10).cast("long") % dim
    val sign = when(conv(substring(md5(concat(lit("s:"), col("term"))),
      1, 1), 16, 10).cast("long") % 2 === 0, lit(1L)).otherwise(lit(-1L))
    df.select(col(idCol), explode(tokens(col(textCol))).as("term"))
      .filter(col("term") =!= "")
      .select(col(idCol), bucket.as("bucket"), sign.as("__s"))
      .groupBy(col(idCol), col("bucket"))
      .agg(sum(col("__s")).as("val"))
  }

  /**
   * BPE trainer — the full iterative merge loop (`q_bpe_pairs` is only
   * its first iteration's statistics). Spark-first split of work, the
   * same decomposition HF/SentencePiece trainers use:
   *
   *   - the CORPUS-scale job is ONE word-count aggregate (shuffle on
   *     word, map-side combined), truncated to the top `vocabLimit`
   *     word forms by (count desc, word asc) — `orderBy().limit()`
   *     folds to TakeOrderedAndProject, a per-partition top-k + merge,
   *     not a global sort;
   *   - the merge LOOP runs on the driver over that bounded
   *     word-frequency table (the greedyAssign budget pattern): each
   *     iteration costs O(table symbols), independent of corpus size.
   *     A 100 TB corpus pays one aggregate, then the loop is constant.
   *
   * Deterministic end to end: the word table has a total order and the
   * winning pair each round is max by (count, then lexicographically
   * smallest (left, right)). Merging is leftmost-first within a word
   * ("aaa" under (a,a) → [aa, a]). Returns (rank, left, right, freq)
   * per learned merge; stops early when no adjacent pair remains.
   */
  def trainBpeMerges(df: DataFrame, textCol: String, nMerges: Int,
                     vocabLimit: Int = 65536): Array[(Int, String, String, Long)] = {
    val words = df.select(explode(tokens(col(textCol))).as("w"))
      .filter(col("w") =!= "")
      .groupBy(col("w")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("w").asc)
      .limit(vocabLimit)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val syms = words.map { case (w, n) =>
      (scala.collection.mutable.ArrayBuffer.from(w.map(_.toString)), n)
    }
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var rank = 0
    var exhausted = false
    while (rank < nMerges && !exhausted) {
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      syms.foreach { case (s, n) =>
        var i = 0
        while (i < s.length - 1) {
          val k = (s(i), s(i + 1))
          counts.update(k, counts.getOrElse(k, 0L) + n)
          i += 1
        }
      }
      if (counts.isEmpty) exhausted = true
      else {
        var bl: String = null
        var br: String = null
        var bc = -1L
        counts.foreach { case ((l, r), c) =>
          if (c > bc || (c == bc &&
            (l < bl || (l == bl && r < br)))) { bc = c; bl = l; br = r }
        }
        out += ((rank, bl, br, bc))
        val merged = bl + br
        syms.foreach { case (s, _) =>
          var i = 0
          while (i < s.length - 1) {
            if (s(i) == bl && s(i + 1) == br) { s(i) = merged; s.remove(i + 1) }
            else i += 1
          }
        }
        rank += 1
      }
    }
    out.toArray
  }

  /** The learned merges as a relation (rank, left, right, freq). */
  def bpeMergesDf(spark: org.apache.spark.sql.SparkSession,
                  merges: Array[(Int, String, String, Long)]): DataFrame = {
    import spark.implicits._
    merges.toSeq.toDF("rank", "left", "right", "freq")
  }

  /** Encode one word with learned merges: repeatedly contract the
    * LOWEST-rank adjacent pair (the standard GPT-2-style BPE apply;
    * ranks are unique so there are no ties). Driver/executor-side
    * kernel for [[applyBpe]]. */
  def bpeEncodeWord(word: String,
                    ranks: collection.Map[(String, String), Int]): Seq[String] = {
    val s = scala.collection.mutable.ArrayBuffer.from(word.map(_.toString))
    var go = s.length > 1
    while (go) {
      var bi = -1
      var bRank = Int.MaxValue
      var i = 0
      while (i < s.length - 1) {
        val r = ranks.getOrElse((s(i), s(i + 1)), Int.MaxValue)
        if (r < bRank) { bRank = r; bi = i }
        i += 1
      }
      if (bi < 0) go = false
      else { s(bi) = s(bi) + s(bi + 1); s.remove(bi + 1) }
    }
    s.toSeq
  }

  /**
   * Tokenize the corpus with learned merges: (id, pos, subtokens) per
   * word. The merge table broadcasts (it is vocab-sized); the corpus
   * pass is a narrow per-word kernel — no shuffle.
   */
  /** Fan a (id, text) projection of a single-split scan across the
    * session's cores BEFORE the tokenize/encode/score kernels attach
    * (graft.ops.Dispatch.fanOut scaladoc; exchanges do not commute
    * with projections, so the spread must happen on the raw text).
    * No-op at production scan parallelism. */
  private def spreadIdText(df: DataFrame, idCol: String,
                           textCol: String): DataFrame =
    Dispatch.fanOut(df.select(col(idCol), col(textCol)), col(idCol))

  def applyBpe(df: DataFrame, idCol: String, textCol: String,
               merges: Array[(Int, String, String, Long)]): DataFrame = {
    val rankMap = merges.map { case (r, l, rt, _) => (l, rt) -> r }.toMap
    val bc = df.sparkSession.sparkContext.broadcast(rankMap)
    val enc = udf((w: String) => bpeEncodeWord(w, bc.value))
    spreadIdText(df, idCol, textCol).select(col(idCol),
      posexplode(tokens(col(textCol))).as(Seq("pos", "w")))
      .filter(col("w") =!= "")
      .select(col(idCol), col("pos"), enc(col("w")).as("subtokens"))
  }

  /**
   * WordPiece trainer (Schuster & Nakajima 2012; the BERT tokenizer —
   * the third major subword family beside [[trainBpeMerges]]'s BPE and
   * [[trainUnigram]]'s unigram LM, completing the set real LLM
   * pipelines choose from). Identical 100 TB shape to the BPE trainer:
   * ONE corpus-scale word-count aggregate truncated to the top
   * `vocabLimit` forms (TakeOrderedAndProject, no global sort), then a
   * driver loop whose per-iteration cost is O(word-table symbols),
   * independent of corpus size.
   *
   * The one semantic difference from BPE is the merge objective:
   * instead of raw pair frequency, WordPiece maximizes the likelihood
   * gain  score = count(l,r) / (count(l) · count(r))  — a pair of rare
   * symbols that almost always co-occur wins over a frequent but
   * independent pair. Continuation symbols carry the `##` prefix
   * (word-initial symbol bare), and merging strips the right side's
   * `##`: ("a", "##b") → "ab", ("##a", "##b") → "##ab".
   *
   * Deterministic and ORACLE-REPLAYABLE end to end: the score is
   * computed as the ONE IEEE expression `c.toDouble / (cl.toDouble *
   * cr.toDouble)` — one multiply and one divide, both correctly
   * rounded, so DuckDB evaluating the same tree over the same integer
   * counts produces bit-equal doubles and the same argmax; ties break
   * to the lexicographically smallest (left, right). Merging is
   * leftmost-first within a word, exactly like BPE.
   *
   * Returns (rank, left, right, pair_n, left_n, right_n) per merge —
   * all-integer evidence, so the driver's oracle can re-derive the
   * choice, not just trust it. Stops early when no adjacent pair
   * remains.
   */
  def trainWordPiece(df: DataFrame, textCol: String, nMerges: Int,
                     vocabLimit: Int = 65536)
      : Array[(Int, String, String, Long, Long, Long)] = {
    val words = df.select(explode(tokens(col(textCol))).as("w"))
      .filter(col("w") =!= "")
      .groupBy(col("w")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("w").asc)
      .limit(vocabLimit)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val syms = words.map { case (w, n) =>
      val b = scala.collection.mutable.ArrayBuffer.empty[String]
      var i = 0
      w.foreach { ch =>
        b += (if (i == 0) ch.toString else "##" + ch); i += 1
      }
      (b, n)
    }
    val out = scala.collection.mutable.ArrayBuffer
      .empty[(Int, String, String, Long, Long, Long)]
    var rank = 0
    var exhausted = false
    while (rank < nMerges && !exhausted) {
      val pairN = scala.collection.mutable.HashMap.empty[(String, String), Long]
      val symN = scala.collection.mutable.HashMap.empty[String, Long]
      syms.foreach { case (s, n) =>
        var i = 0
        while (i < s.length) {
          symN.update(s(i), symN.getOrElse(s(i), 0L) + n)
          if (i < s.length - 1) {
            val k = (s(i), s(i + 1))
            pairN.update(k, pairN.getOrElse(k, 0L) + n)
          }
          i += 1
        }
      }
      if (pairN.isEmpty) exhausted = true
      else {
        var bl: String = null
        var br: String = null
        var bc = 0L
        var bs = -1.0
        pairN.foreach { case ((l, r), c) =>
          // the oracle-shared IEEE tree: one multiply, one divide
          val score = c.toDouble / (symN(l).toDouble * symN(r).toDouble)
          if (score > bs || (score == bs &&
            (l < bl || (l == bl && r < br)))) {
            bs = score; bl = l; br = r; bc = c
          }
        }
        out += ((rank, bl, br, bc, symN(bl), symN(br)))
        val merged = bl + br.stripPrefix("##")
        syms.foreach { case (s, _) =>
          var i = 0
          while (i < s.length - 1) {
            if (s(i) == bl && s(i + 1) == br) { s(i) = merged; s.remove(i + 1) }
            else i += 1
          }
        }
        rank += 1
      }
    }
    out.toArray
  }

  /** The learned WordPiece merges as a relation
    * (rank, left, right, pair_n, left_n, right_n). */
  def wordPieceMergesDf(spark: org.apache.spark.sql.SparkSession,
                        merges: Array[(Int, String, String, Long, Long, Long)])
      : DataFrame = {
    import spark.implicits._
    merges.toSeq.toDF("rank", "left", "right", "pair_n", "left_n",
      "right_n")
  }

  /** Encode one word against a WordPiece vocab: greedy
    * longest-match-first (the BERT `WordpieceTokenizer` algorithm) —
    * take the longest vocab piece prefixing the remainder (continuation
    * positions try `##`-prefixed pieces), emit `unk` if none matches.
    * Driver/executor-side kernel for [[applyWordPiece]]. */
  def wordPieceEncodeWord(word: String, vocab: collection.Set[String],
                          unk: String = "[UNK]"): Seq[String] = {
    if (word.isEmpty) return Seq.empty
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var start = 0
    while (start < word.length) {
      val prefix = if (start == 0) "" else "##"
      var end = word.length
      var hit: String = null
      while (end > start && hit == null) {
        val cand = prefix + word.substring(start, end)
        if (vocab.contains(cand)) hit = cand else end -= 1
      }
      if (hit == null) {
        // the BERT contract: one unmatchable position voids the WHOLE
        // word to [UNK] (not a partial piece list)
        return Seq(unk)
      }
      out += hit
      start = end
    }
    out.toSeq
  }

  /**
   * Tokenize the corpus with a trained WordPiece vocab: (id, pos,
   * subtokens) per word. The vocab broadcasts; the corpus pass is a
   * narrow per-word kernel — no shuffle, same shape as [[applyBpe]].
   * `vocab` is the full piece set: every initial symbol (bare first
   * char + `##`-continuations) plus the merged pieces, i.e. exactly
   * what [[trainWordPiece]]'s corpus induces.
   */
  def applyWordPiece(df: DataFrame, idCol: String, textCol: String,
                     vocab: Set[String], unk: String = "[UNK]"): DataFrame = {
    val bc = df.sparkSession.sparkContext.broadcast(vocab)
    val enc = udf((w: String) => wordPieceEncodeWord(w, bc.value, unk))
    spreadIdText(df, idCol, textCol).select(col(idCol),
      posexplode(tokens(col(textCol))).as(Seq("pos", "w")))
      .filter(col("w") =!= "")
      .select(col(idCol), col("pos"), enc(col("w")).as("subtokens"))
  }

  /** The vocab a [[trainWordPiece]] run induces over its own corpus:
    * the word table's initial symbols plus every merged piece. */
  def wordPieceVocab(df: DataFrame, textCol: String,
                     merges: Array[(Int, String, String, Long, Long, Long)],
                     vocabLimit: Int = 65536): Set[String] = {
    val alphabet = df.select(explode(tokens(col(textCol))).as("w"))
      .filter(col("w") =!= "")
      .groupBy(col("w")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("w").asc)
      .limit(vocabLimit)
      .select(col("w")).collect().map(_.getString(0))
      .flatMap { w =>
        w.zipWithIndex.map { case (ch, i) =>
          if (i == 0) ch.toString else "##" + ch
        }
      }.toSet
    alphabet ++ merges.map { case (_, l, r, _, _, _) =>
      l + r.stripPrefix("##")
    }
  }

  /**
   * Unigram-LM tokenizer training (Kudo 2018, the SentencePiece
   * unigram model — the other major subword family beside
   * [[trainBpeMerges]]'s BPE). Same 100 TB shape as the BPE trainer:
   * ONE distributed word-frequency aggregate bounded to the top
   * `vocabLimit` word forms (TakeOrdered, not a global sort), then a
   * driver loop whose cost is table-sized, corpus-independent.
   *
   * Documented simplifications vs the paper, chosen for determinism:
   *   - seed = all substrings up to `maxPieceLen` of the bounded word
   *     table, scored by occurrence-weighted frequency, top
   *     `seedFactor`·vocabSize kept (single chars always kept);
   *   - hard EM (Viterbi counts) instead of forward–backward
   *     expected counts: each iteration re-segments the word table
   *     by the current piece scores and re-estimates p(piece) from
   *     the winning segmentations;
   *   - final vocab = top `vocabSize` by (count desc, piece asc),
   *     single chars always retained, probabilities renormalized.
   *
   * Everything after the one aggregate is driver arithmetic over a
   * sorted array — bit-deterministic on any partition layout.
   * Returns (piece, log_prob) sorted by (log_prob desc, piece asc).
   */
  def trainUnigramLm(df: DataFrame, textCol: String, vocabSize: Int,
                     maxPieceLen: Int = 6, emIters: Int = 3,
                     seedFactor: Int = 4,
                     vocabLimit: Int = 65536): Array[(String, Double)] = {
    require(vocabSize >= 1 && maxPieceLen >= 1 && emIters >= 0)
    val words = df.select(explode(tokens(col(textCol))).as("w"))
      .filter(col("w") =!= "")
      .groupBy(col("w")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("w").asc)
      .limit(vocabLimit)
      .collect().map(r => (r.getString(0), r.getLong(1)))

    // seed: substring occurrence frequencies over the bounded table
    val seedCounts = scala.collection.mutable.HashMap.empty[String, Long]
    words.foreach { case (w, n) =>
      var i = 0
      while (i < w.length) {
        var len = 1
        while (len <= maxPieceLen && i + len <= w.length) {
          val p = w.substring(i, i + len)
          seedCounts.update(p, seedCounts.getOrElse(p, 0L) + n)
          len += 1
        }
        i += 1
      }
    }
    val chars = seedCounts.keysIterator.filter(_.length == 1).toArray.sorted
    val multi = seedCounts.iterator.filter(_._1.length > 1).toArray
      .sortBy { case (p, c) => (-c, p) }
      .take(math.max(0, seedFactor * vocabSize - chars.length))
      .map(_._1)
    var vocab: Array[String] = chars ++ multi

    def estimate(pieces: Array[String]): collection.Map[String, Double] = {
      // scores from current counts; first round uses seed frequencies
      val total = pieces.iterator.map(seedCounts.getOrElse(_, 1L)).sum.toDouble
      // StrictMath.log: platform-unconditional bits (the r11 pin
      // contract — Math.log may differ by an ulp per JVM build)
      pieces.iterator.map(p =>
        p -> StrictMath.log(seedCounts.getOrElse(p, 1L) / total)).toMap
    }
    var scores: collection.Map[String, Double] = estimate(vocab)
    val UnkLp = -1e3 // any in-vocab path beats a path through UNK

    var iter = 0
    while (iter < emIters) {
      // E: Viterbi-segment the word table; count winning pieces
      val counts = scala.collection.mutable.HashMap.empty[String, Long]
      words.foreach { case (w, n) =>
        viterbiPieces(w, scores, maxPieceLen, UnkLp).foreach { p =>
          counts.update(p, counts.getOrElse(p, 0L) + n)
        }
      }
      // M: re-score from counts; unused pieces drop (chars survive via
      // the final union); prune to vocabSize on the LAST iteration
      val kept0 = counts.toArray.sortBy { case (p, c) => (-c, p) }
      val kept =
        if (iter == emIters - 1) {
          val top = kept0.take(vocabSize).map(_._1).toSet
          (top ++ chars).toArray.sorted.map(p =>
            (p, counts.getOrElse(p, 0L).max(1L)))
        } else kept0 ++ chars.filterNot(counts.contains).map((_, 1L))
      val tot = kept.iterator.map(_._2).sum.toDouble
      scores = kept.iterator.map { case (p, c) =>
        p -> StrictMath.log(c / tot)
      }.toMap
      vocab = kept.map(_._1)
      iter += 1
    }
    vocab.map(p => (p, scores(p)))
      .sortBy { case (p, lp) => (-lp, p) }
  }

  /** Viterbi best segmentation of `w` under piece log-probs: maximize
    * Σ log p; ties prefer the LONGER trailing piece (smaller start),
    * unknown single chars cost `unkLp`. Deterministic. */
  def viterbiPieces(w: String, scores: collection.Map[String, Double],
                    maxPieceLen: Int, unkLp: Double): Seq[String] = {
    val n = w.length
    if (n == 0) return Seq.empty
    val best = Array.fill(n + 1)(Double.NegativeInfinity)
    val back = Array.fill(n + 1)(-1)
    best(0) = 0.0
    var j = 1
    while (j <= n) {
      var i = math.max(0, j - maxPieceLen)
      while (i < j) {
        val piece = w.substring(i, j)
        val lp = scores.get(piece) match {
          case Some(v) => v
          case None => if (j - i == 1) unkLp else Double.NegativeInfinity
        }
        val cand = best(i) + lp
        // strict > with ascending i ⇒ ties keep the smallest i, i.e.
        // the longest piece ending at j — the deterministic tiebreak
        if (cand > best(j)) { best(j) = cand; back(j) = i }
        i += 1
      }
      j += 1
    }
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var k = n
    while (k > 0) { out.prepend(w.substring(back(k), k)); k = back(k) }
    out.toSeq
  }

  /** The learned unigram vocab as a relation (piece, log_prob rounded
    * to 6 — driver doubles are deterministic, rounding makes them
    * comparison-stable). */
  def unigramVocabDf(spark: org.apache.spark.sql.SparkSession,
                     vocab: Array[(String, Double)]): DataFrame = {
    import spark.implicits._
    vocab.toSeq.toDF("piece", "log_prob")
      .select(col("piece"), round(col("log_prob"), 6).as("log_prob"))
  }

  /**
   * Segment the corpus with a trained unigram vocab: (id, pos,
   * pieces) per word — the vocab broadcasts (vocab-sized), the corpus
   * pass is a narrow per-word Viterbi, no shuffle (the [[applyBpe]]
   * shape).
   */
  def applyUnigram(df: DataFrame, idCol: String, textCol: String,
                   vocab: Array[(String, Double)],
                   maxPieceLen: Int = 6): DataFrame = {
    val bc = df.sparkSession.sparkContext.broadcast(vocab.toMap)
    val seg = udf((w: String) =>
      viterbiPieces(w, bc.value, maxPieceLen, -1e3))
    spreadIdText(df, idCol, textCol).select(col(idCol),
      posexplode(tokens(col(textCol))).as(Seq("pos", "w")))
      .filter(col("w") =!= "")
      .select(col(idCol), col("pos"), seg(col("w")).as("pieces"))
  }

  /**
   * Corpus-level Zipf / type-token profile — the one-glance "is this
   * corpus natural language" check (a healthy crawl has a rank-
   * frequency slope near −1; template/spam farms and synthetic text
   * bend it): token and type counts, type-token ratio, and the
   * log-log least-squares slope over the top `topN` rank-frequency
   * points.
   *
   * Scale: ONE partially-aggregated term-count shuffle; totals are a
   * single aggregate and the regression reads only the bounded top-N
   * table (TakeOrdered → driver, the [[buildVocab]] idiom — 200 rows
   * regardless of corpus size). Cross-engine: ln(rank)/ln(count) are
   * rounded to 12, products and sums fold sequentially in rank order
   * (the sequential-fold parity trick), and the slope is one fixed
   * IEEE expression tree, rounded to 6.
   *
   * Output: one row (n_tokens, n_types, ttr, zipf_slope).
   */
  def zipfStats(df: DataFrame, textCol: String,
                topN: Int = 200): DataFrame = {
    require(topN >= 2)
    val spark = df.sparkSession
    import spark.implicits._
    val counts = df.select(explode(tokens(col(textCol))).as("t"))
      .filter(col("t") =!= "")
      .groupBy(col("t")).agg(count(lit(1)).as("n"))
    val tot = counts.agg(sum(col("n")), count(lit(1))).head()
    val (nTokens, nTypes) = (tot.getLong(0), tot.getLong(1))
    val top = counts.orderBy(col("n").desc, col("t").asc).limit(topN)
      .select(col("n")).as[Long].collect()
    def r12(v: Double): Double =
      BigDecimal.valueOf(v).setScale(12, BigDecimal.RoundingMode.HALF_UP)
        .toDouble
    var (sx, sy, sxy, sxx) = (0.0, 0.0, 0.0, 0.0)
    var i = 0
    while (i < top.length) {
      val x = r12(math.log((i + 1).toDouble))
      val y = r12(math.log(top(i).toDouble))
      sx += x; sy += y; sxy += x * y; sxx += x * x
      i += 1
    }
    val m = top.length.toDouble
    val slope = (m * sxy - sx * sy) / (m * sxx - sx * sx)
    def r6(v: Double): Double =
      BigDecimal.valueOf(v).setScale(6, BigDecimal.RoundingMode.HALF_UP)
        .toDouble
    Seq((nTokens, nTypes, r6(nTypes.toDouble / nTokens), r6(slope)))
      .toDF("n_tokens", "n_types", "ttr", "zipf_slope")
  }

  /** Persist a trained unigram vocab (train once on 100 TB, segment
    * anywhere). Doubles round-trip parquet bit-exactly, so a reloaded
    * vocab produces byte-identical segmentations. */
  def saveUnigramVocab(spark: org.apache.spark.sql.SparkSession,
                       vocab: Array[(String, Double)],
                       path: String): Unit = {
    import spark.implicits._
    vocab.toSeq.toDF("piece", "log_prob")
      .repartition(1).write.mode("overwrite").parquet(path)
  }

  /** Load a vocab written by [[saveUnigramVocab]], restoring the
    * trainer's (log_prob desc, piece asc) order. Model-sized. */
  def loadUnigramVocab(spark: org.apache.spark.sql.SparkSession,
                       path: String): Array[(String, Double)] = {
    import spark.implicits._
    spark.read.parquet(path).select(col("piece"), col("log_prob"))
      .as[(String, Double)].collect()
      .sortBy { case (p, lp) => (-lp, p) }
  }

  /**
   * Per-document vocabulary coverage / OOV rate under a fixed term
   * vocabulary — the "will my tokenizer cover this corpus" check run
   * before committing to a vocab, and the per-doc quality signal
   * (high OOV rate ⇒ gibberish, wrong language, or domain shift).
   *
   * The vocab joins in as a BROADCAST local relation (vocab-sized);
   * the corpus pass is explode → one partially-aggregated groupBy on
   * the id the explode already carried. Blank docs come back with
   * zero counts, never disappear.
   *
   * Output: (id, n_tokens, n_oov, oov_rate).
   */
  def vocabCoverage(df: DataFrame, idCol: String, textCol: String,
                    vocab: Seq[String]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val vdf = vocab.toDF("__term").distinct()
    val agg = df
      .select(col(idCol), explode(tokens(col(textCol))).as("__tok"))
      .filter(col("__tok") =!= "")
      .join(broadcast(vdf), col("__tok") === col("__term"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).cast("int").as("n_tokens"),
        sum(when(col("__term").isNull, 1).otherwise(0))
          .cast("int").as("n_oov"))
    df.select(col(idCol)).join(agg, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_tokens"), lit(0)).as("n_tokens"),
        coalesce(col("n_oov"), lit(0)).as("n_oov"),
        when(coalesce(col("n_tokens"), lit(0)) === 0, lit(0.0))
          .otherwise(round(col("n_oov") / col("n_tokens"), 6))
          .as("oov_rate"))
  }

  /**
   * Top-k TF-IDF terms per document — the keyword/salience pass of a
   * corpus profile. Plain counts + one double expression, so it is
   * oracle-exact: score = CAST(tf AS DOUBLE) * n_docs / df (raw
   * inverse-frequency ratio; a log-damped idf is a monotone transform
   * of it per term, but libm `ln` is not bit-stable across engines —
   * the ratio IS, because both sides evaluate the identical IEEE
   * multiply-then-divide tree). Deterministic (score DESC, term ASC)
   * tiebreak.
   *
   * Scale: tf is one shuffle on (doc, term); df is one shuffle on term
   * (map-side combined); n_docs rides in as a broadcast 1-row cross
   * join (NOT a global window); top-k is a per-doc window. Term
   * cardinality, not corpus size, bounds the df side.
   */
  def tfIdfTopK(df: DataFrame, idCol: String, textCol: String,
                k: Int = 5): DataFrame = {
    val tf = df
      .select(col(idCol), explode(tokens(col(textCol))).as("term"))
      .filter(col("term") =!= "")
      .groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val n = df.agg(count(lit(1)).as("n_docs"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol))
      .orderBy(col("score").desc, col("term").asc)
    tf.join(dfreq, Seq("term"))
      .crossJoin(broadcast(n))
      .withColumn("score",
        col("tf").cast("double") * col("n_docs") / col("df"))
      .withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= k)
      .select(col(idCol), col("term"), col("tf"), col("df"), col("score"))
  }

  /** Ordered word n-gram OCCURRENCES (space-joined, duplicates kept) —
    * [[TextDedup.wordShingles]] is distinct-per-document, which is
    * right for Jaccard but wrong for language-model counting. JIT'd
    * kernel for the same reason as wordShingles (the transform/concat
    * HOF tree is CodegenFallback). Under n tokens → empty. */
  def wordGramsOccur(text: Column, n: Int): Column = {
    require(n >= 1)
    val kernel = udf((s: String) => {
      if (s == null) Array.empty[String]
      else {
        // drop the empty token "".split produces for blank strings so
        // n=1 matches the tokenCount=0 blank-document convention
        val toks = s.trim.toLowerCase.split("\\s+").filter(_.nonEmpty)
        if (toks.length < n) Array.empty[String]
        else Array.tabulate(toks.length - n + 1) { i =>
          val sb = new StringBuilder(toks(i))
          var j = 1
          while (j < n) { sb.append(' ').append(toks(i + j)); j += 1 }
          sb.result()
        }
      }
    })
    kernel(text)
  }

  /** Ordered word-bigram occurrences ("w1 w2", duplicates kept). */
  def wordBigrams(text: Column): Column = wordGramsOccur(text, 2)

  /**
   * Corpus-trained bigram language-model scoring with add-α smoothing —
   * the count-based perplexity filter of a pretraining pipeline (the
   * CCNet/KenLM shape: docs whose perplexity under a corpus LM is
   * extreme are low-quality or out-of-domain).
   *
   * P(w2|w1) = (c(w1 w2) + α) / (ctx(w1) + α·V), where ctx(w1) is the
   * number of bigram occurrences starting with w1 (so the conditional
   * properly normalizes) and V is the distinct-token vocabulary size.
   * Docs with fewer than 2 tokens yield no row.
   *
   * Scale: counting is two map-side-combined aggregates (bigram table
   * bounded by observed-bigram cardinality, context table by vocabulary);
   * scoring re-joins the bigram stream to those tables by key — the
   * classic distributed count-based LM estimation, no driver state but
   * the single V scalar.
   *
   * Reproducibility: per-bigram ln is rounded to 6 decimals and summed
   * as DECIMAL(18,6) (order-free exact); avg_logprob is then one IEEE
   * division (bit-exact cross-engine); perplexity = exp(-avg) rounded
   * to 4.
   */
  def bigramLmScore(df: DataFrame, idCol: String, textCol: String,
                    alpha: Double = 0.1): DataFrame = {
    require(alpha > 0, "alpha must be positive")
    val vCount = df
      .filter(col(textCol).isNotNull && trim(col(textCol)) =!= "")
      .select(explode(tokens(col(textCol))).as("tok"))
      .agg(countDistinct(col("tok"))).head().getLong(0)

    val big = df
      .select(col(idCol), explode(wordBigrams(col(textCol))).as("gram"))
      .withColumn("w1", substring_index(col("gram"), " ", 1))
    val cnt = big.groupBy(col("gram")).agg(count(lit(1)).as("c12"))
    val ctx = big.groupBy(col("w1")).agg(count(lit(1)).as("c1"))

    val term = round(
      log((col("c12") + lit(alpha)) / (col("c1") + lit(alpha) * lit(vCount))),
      6).cast("decimal(18,6)")
    big.join(cnt, Seq("gram"))
      .join(ctx, Seq("w1"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"), sum(term).as("_sum"))
      .select(col(idCol), col("n_bigrams"),
        (col("_sum").cast("double") / col("n_bigrams")).as("avg_logprob"))
      .withColumn("perplexity", round(exp(-col("avg_logprob")), 4))
  }

  /**
   * CCNet-style perplexity bucketing (Wenzek et al. 2020, "CCNet:
   * Extracting High Quality Monolingual Datasets from Web Crawl
   * Data" §4.3): rank documents by LM perplexity and split the corpus
   * into head / middle / tail tiers at trained quantile cutoffs — the
   * coarse quality split of a pretraining mix (head = most fluent,
   * tail = candidate discard). Feed it [[bigramLmScore]] (or
   * [[trigramLmScore]]) output.
   *
   * Thresholds train on a [[sampleByHash]] content-hash sample, NOT
   * the full corpus: Spark's exact `percentile` buffers every value
   * it aggregates, so the trained side must be bounded —
   * `sampleFraction` is the knob, and CCNet itself fits cutoffs on a
   * fraction of the crawl. The bucketing pass is then a narrow
   * broadcast-literal CASE: no shuffle, no window — the ntile()
   * alternative would funnel the corpus through one unpartitioned
   * window. Only the two threshold scalars touch the driver.
   *
   * Float parity: thresholds round to 6 decimals in-engine before
   * the compare; perplexities arrive 4-decimal rounded, so a
   * sub-1e-6 cross-engine difference in quantile interpolation
   * cannot flip a bucket.
   */
  def perplexityBuckets(scored: DataFrame, idCol: String,
                        pplCol: String = "perplexity",
                        sampleFraction: Double = 1.0,
                        cuts: (Double, Double) = (1.0 / 3, 2.0 / 3))
      : DataFrame = {
    require(cuts._1 > 0 && cuts._1 < cuts._2 && cuts._2 < 1,
      s"cuts must satisfy 0 < c1 < c2 < 1: $cuts")
    val samp = scored.filter(sampleByHash(col(idCol), sampleFraction))
    val thrRow = samp.agg(
      round(percentile(col(pplCol), lit(cuts._1)), 6),
      round(percentile(col(pplCol), lit(cuts._2)), 6)).head()
    require(!thrRow.isNullAt(0),
      s"threshold sample is empty (fraction=$sampleFraction) — " +
        "raise sampleFraction or check the scored frame")
    val (t1, t2) = (thrRow.getDouble(0), thrRow.getDouble(1))
    scored.select(col(idCol), col(pplCol),
      when(col(pplCol) <= t1, "head")
        .when(col(pplCol) <= t2, "middle")
        .otherwise("tail").as("bucket"))
  }

  /**
   * DSIR-style importance weights (Xie et al. 2023, "Data Selection
   * for Language Models via Importance Resampling"): score every
   * document by how much more likely its n-grams are under a TARGET
   * distribution than under the RAW corpus distribution —
   * `w(x) = Σ_g c(g,x)·(ln p_t(g) − ln p_r(g))`, add-alpha smoothed
   * over the observed n-gram union. Selecting the top-weighted
   * documents shifts the corpus mixture toward the target domain.
   *
   * Scale: one n-gram pass feeds two map-side-combined aggregates (the
   * per-side gram counts and the three corpus scalars — both
   * vocab-bounded), then one gram-keyed join back onto per-doc gram
   * counts and a per-doc sum. No driver funnel; alpha = 0.5 (or any
   * binary-exact constant) keeps the smoothing arithmetic IEEE-stable;
   * per-gram log-ratios round to 7 decimals and the per-doc sum runs
   * through DECIMAL(18,6) — order-free and oracle-exact.
   *
   * Output: (idCol, n_grams, weight) for every document with >= 1
   * n-gram; docs come back with weight 0 when blank. `isTarget` marks
   * the in-domain rows (they still receive weights — selection
   * normally applies to the raw side, callers filter as needed).
   */
  def dsirWeights(df: DataFrame, idCol: String, textCol: String,
                  isTarget: Column, n: Int = 2,
                  alpha: Double = 0.5): DataFrame = {
    require(alpha > 0, "alpha must be positive")
    val grams = df.select(col(idCol), isTarget.as("_t"),
      explode(wordGramsOccur(col(textCol), n)).as("gram"))
    val sideCnt = grams.groupBy(col("gram")).agg(
      sum(when(col("_t"), 1L).otherwise(0L)).as("ct"),
      sum(when(col("_t"), 0L).otherwise(1L)).as("cr"))
    // three scalars off the (vocab-bounded) count table
    val Seq(nt, nr, v) = sideCnt
      .agg(coalesce(sum(col("ct")), lit(0L)),
        coalesce(sum(col("cr")), lit(0L)), count(lit(1)))
      .head().toSeq.map(_.asInstanceOf[Long])
    val ratio = round(
      log((col("ct") + lit(alpha)) / lit(nt + alpha * v)) -
        log((col("cr") + lit(alpha)) / lit(nr + alpha * v)),
      7)
    val perGram = sideCnt.select(col("gram"), ratio.as("_lr"))
    val docGram = grams.groupBy(col(idCol), col("gram"))
      .agg(count(lit(1)).as("_c"))
    val weights = docGram.join(perGram, Seq("gram"))
      .groupBy(col(idCol))
      .agg(
        sum(col("_c")).as("n_grams"),
        sum((col("_c") * col("_lr")).cast("decimal(18,6)")).as("_w"))
      .select(col(idCol), col("n_grams"),
        col("_w").cast("double").as("weight"))
    df.select(col(idCol)).join(weights, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        coalesce(col("weight"), lit(0.0)).as("weight"))
  }

  /**
   * PMI collocations — top-k word bigrams by pointwise mutual
   * information over bigram events (the word2vec-phrases / collocation
   * detection statistic): PMI = ln(c12·N / (c1·c2)) with c1 = w1's
   * count as a bigram start, c2 = w2's count as a bigram end, N =
   * total bigram occurrences. `minCount` suppresses rare-pair noise.
   *
   * Scale: three map-side-combined aggregates over one bigram pass,
   * two broadcast-size join sides (vocab-bounded), top-k through
   * TakeOrderedAndProject. The ratio is computed in doubles
   * (c12·N overflows long at corpus scale) with the identical IEEE
   * tree on both engines; PMI is rounded to 6 decimals and the
   * ORDERING uses the rounded value + gram tiebreak, so ranks match
   * the oracle exactly.
   */
  def pmiCollocations(df: DataFrame, textCol: String,
                      minCount: Long = 5, k: Int = 50): DataFrame = {
    val big = df
      .select(explode(wordGramsOccur(col(textCol), 2)).as("gram"))
      .withColumn("w1", substring_index(col("gram"), " ", 1))
      .withColumn("w2", substring_index(col("gram"), " ", -1))
    val cnt = big.groupBy(col("gram"), col("w1"), col("w2"))
      .agg(count(lit(1)).as("c12"))
    val c1 = big.groupBy(col("w1")).agg(count(lit(1)).as("c1"))
    val c2 = big.groupBy(col("w2")).agg(count(lit(1)).as("c2"))
    val n = big.agg(count(lit(1)).as("n_bigrams"))
    cnt.filter(col("c12") >= minCount)
      .join(c1, Seq("w1"))
      .join(c2, Seq("w2"))
      .crossJoin(broadcast(n))
      .withColumn("pmi",
        round(log((col("c12").cast("double") * col("n_bigrams")) /
          (col("c1").cast("double") * col("c2"))), 6))
      .orderBy(col("pmi").desc, col("gram").asc)
      .limit(k)
      .select(col("gram"), col("c12"), col("pmi"))
  }

  /**
   * Deflate compression ratio of the UTF-8 text (zlib level 6):
   * compressed bytes / raw bytes. Highly compressible text is
   * repetitive or templated — the long-range-repetition quality signal
   * the per-window [[repetitionMetrics]] can't see (Gopher/RefinedWeb
   * use exactly this as a filter input). Blank/null → 1.0
   * (incompressible by convention, so filters keyed "ratio < t" never
   * select empty docs). Narrow JIT'd kernel, no shuffle; deterministic
   * for a given JVM's zlib (gate is rows-only, specs assert ordering
   * properties, not exact bytes).
   */
  def compressionRatio(text: Column): Column = {
    val kernel = udf((s: String) => {
      // trim-blank → 1.0, matching every other blank convention here
      // (tokenCount, trainNonblank): a whitespace-only doc must not
      // read as "highly compressible content"
      if (s == null || s.trim.isEmpty) 1.0
      else {
        val raw = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        val d = DeflaterPool.get() // per-thread reuse: deflateInit/End
        d.reset()                  // per row is native-alloc dominated
        d.setInput(raw)
        d.finish()
        val buf = new Array[Byte](8192)
        var n = 0L
        while (!d.finished()) n += d.deflate(buf)
        n.toDouble / raw.length
      }
    })
    kernel(text)
  }

  /** Per-executor-thread Deflater reuse for [[compressionRatio]] —
    * accessed statically on each executor, never serialized. */
  private object DeflaterPool extends ThreadLocal[java.util.zip.Deflater] {
    override def initialValue(): java.util.zip.Deflater =
      new java.util.zip.Deflater(6, true)
  }

  /**
   * Trigram stupid-backoff scoring (Brants et al. 2007, "Large Language
   * Models in Machine Translation") of a held-out corpus under counts
   * estimated on a TRAIN corpus — the honest perplexity-filter shape:
   * scoring the training corpus itself never exercises backoff, so the
   * API takes the two corpora separately (pair it with [[assignSplit]]).
   *
   *   S(w3|w1 w2) = c123/c12                      if the trigram was seen
   *                 0.4 · c23/ctx(w2)             else if the bigram was
   *                 0.4² · (c3+1)/(N+V)           else (add-one unigram,
   *                                                OOV-safe — ln never
   *                                                sees zero)
   *
   * where ctx(w2) counts train bigrams STARTING with w2 (proper
   * conditional denominator) and N/V are train token count / distinct
   * vocabulary.
   *
   * Scale: three map-side-combined count tables over the train corpus,
   * LEFT-joined back onto the scored trigram stream by key — the
   * distributed count-based LM shape of [[bigramLmScore]] with one more
   * order; two scalars (N, V) on the driver. Reproducibility: identical
   * IEEE ratio trees both engines, ln rounded to 6 → DECIMAL sums.
   */
  def trigramLmScore(train: DataFrame, scored: DataFrame, idCol: String,
                     textCol: String, backoff: Double = 0.4): DataFrame = {
    require(backoff > 0, "backoff factor must be positive")
    val trainNonblank = train
      .filter(col(textCol).isNotNull && trim(col(textCol)) =!= "")
    val Array(nToks, vocab) = trainNonblank
      .select(explode(tokens(col(textCol))).as("tok"))
      .agg(count(lit(1)), countDistinct(col("tok")))
      .head().toSeq.map(_.asInstanceOf[Long]).toArray

    val tri = train
      .select(explode(wordGramsOccur(col(textCol), 3)).as("g"))
      .groupBy(col("g")).agg(count(lit(1)).as("c123"))
    val bi = train
      .select(explode(wordGramsOccur(col(textCol), 2)).as("g2"))
    val biCnt = bi.groupBy(col("g2")).agg(count(lit(1)).as("cbi"))
    val ctx = bi
      .select(substring_index(col("g2"), " ", 1).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("cctx"))
    val uni = trainNonblank
      .select(explode(tokens(col(textCol))).as("w3"))
      .groupBy(col("w3")).agg(count(lit(1)).as("c3"))

    val stream = scored
      .select(col(idCol), explode(wordGramsOccur(col(textCol), 3)).as("g"))
      .select(col(idCol), col("g"),
        substring_index(col("g"), " ", 2).as("p12"),
        substring_index(col("g"), " ", -2).as("s23"),
        substring_index(substring_index(col("g"), " ", 2), " ", -1).as("w2"),
        substring_index(col("g"), " ", -1).as("w3"))

    val prob =
      when(col("c123").isNotNull, col("c123") / col("c12"))
        .when(col("c23").isNotNull,
          lit(backoff) * (col("c23") / col("cw2")))
        .otherwise(lit(backoff * backoff) *
          ((coalesce(col("c3"), lit(0L)) + 1) / lit(nToks + vocab)))
    val term = round(log(prob), 6).cast("decimal(18,6)")

    stream
      .join(tri, Seq("g"), "left")
      .join(biCnt.withColumnRenamed("g2", "p12")
        .withColumnRenamed("cbi", "c12"), Seq("p12"), "left")
      .join(biCnt.withColumnRenamed("g2", "s23")
        .withColumnRenamed("cbi", "c23"), Seq("s23"), "left")
      .join(ctx.withColumnRenamed("w", "w2")
        .withColumnRenamed("cctx", "cw2"), Seq("w2"), "left")
      .join(uni, Seq("w3"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_trigrams"), sum(term).as("_sum"))
      .select(col(idCol), col("n_trigrams"),
        (col("_sum").cast("double") / col("n_trigrams")).as("avg_logprob"))
      .withColumn("perplexity", round(exp(-col("avg_logprob")), 4))
  }

  /**
   * C4-style line/document cleaning (Raffel et al. 2020, §2.2 — the
   * public heuristics behind the C4 corpus), re-expressed as array
   * expressions over the line list — one narrow pass, no UDF, no
   * shuffle (reference scope: the load-time text cleanup family of
   * `csv_file.rb`, generalized to web-corpus rules):
   *
   *  - line rules (applied to each trimmed line): keep only lines that
   *    end in terminal punctuation (`.` `!` `?` `"`), have at least
   *    `minLineWords` whitespace words, and do not contain the word
   *    "javascript" (case-insensitive);
   *  - document rules: drop documents whose ORIGINAL text contains
   *    "lorem ipsum" (boilerplate) or `{` (code), or that retain
   *    fewer than `minLines` lines after line filtering.
   *
   * Returns surviving docs as (id, text = kept lines re-joined with
   * `\n`, n_lines_kept, n_lines_dropped). The line lambda runs as an
   * interpreted higher-order function — still a distributed narrow
   * pass; at 100 TB it scales with input like every other scan-only
   * operator here.
   */
  def c4Filter(df: DataFrame, idCol: String, textCol: String,
               minLineWords: Int = 5, minLines: Int = 3): DataFrame = {
    require(minLineWords >= 1 && minLines >= 1)
    val lines = split(col(textCol), "\n")
    val kept = filter(lines, l => {
      val t = trim(l)
      t.rlike("[.!?\"]$") &&
        size(split(t, "\\s+")) >= minLineWords &&
        !lower(t).contains("javascript")
    })
    df.select(col(idCol), col(textCol), kept.as("__kept"),
        size(lines).as("__n_lines"))
      .filter(!lower(col(textCol)).contains("lorem ipsum") &&
        !col(textCol).contains("{") &&
        size(col("__kept")) >= minLines)
      .select(col(idCol), array_join(col("__kept"), "\n").as("text"),
        size(col("__kept")).as("n_lines_kept"),
        (col("__n_lines") - size(col("__kept"))).as("n_lines_dropped"))
  }

  /**
   * Intra-document line dedup + the Gopher duplicate-line metrics
   * (Rae et al. 2021, A1.2): boilerplate pages repeat nav/footer lines
   * inside one document, and the published filter thresholds both the
   * duplicate-LINE fraction and the duplicate-line CHARACTER fraction
   * (long repeated lines matter more than short ones). Keeps the
   * FIRST occurrence of each exact line, preserving order.
   *
   * Pure array expressions (keep-first = `array_position(lines, l) ==
   * index`), one narrow pass, no shuffle — the 100 TB shape of every
   * other per-doc metric here. Quadratic in a document's LINE count
   * (position scan per line), fine where lines-per-doc is bounded;
   * both fractions are int/int divisions rounded to 4 (the
   * cross-engine discipline).
   *
   * Output: (id, text = deduped lines re-joined, n_lines,
   * dup_line_frac, dup_char_frac).
   */
  def dedupLinesWithMetrics(df: DataFrame, idCol: String,
                            textCol: String): DataFrame = {
    val lines = split(col(textCol), "\n")
    val idx = transform(lines, (l, i) =>
      struct(l.as("l"), i.as("i")))
    val firsts = filter(idx, s =>
      array_position(lines, s("l")) === s("i") + 1)
    val sumLen = (a: Column) => aggregate(a, lit(0),
      (acc, s) => acc + length(s("l")))
    df.select(col(idCol), lines.as("__ls"), idx.as("__ix"),
        firsts.as("__fs"))
      .select(col(idCol),
        array_join(transform(col("__fs"), _("l")), "\n").as("text"),
        size(col("__ls")).as("n_lines"),
        round((size(col("__ls")) - size(col("__fs"))) /
          size(col("__ls")), 4).as("dup_line_frac"),
        when(sumLen(col("__ix")) === 0, lit(0.0))
          .otherwise(round((sumLen(col("__ix")) - sumLen(col("__fs"))) /
            sumLen(col("__ix")), 4)).as("dup_char_frac"))
  }

  /**
   * Character-distribution Shannon entropy (bits/char) — the cheap
   * gibberish detector: natural language sits ~3.5–4.5 bits, repeated
   * filler and base64/hex blobs fall outside. Explode → count is the
   * scale shape: a document's characters sit in one input row, so
   * map-side partial aggregation collapses them to (doc, distinct
   * char) pairs before any shuffle — network volume is docs×alphabet,
   * not corpus characters. The p·log2(p) terms go through the
   * round-12 DECIMAL sum (order-free ⇒ bit-identical on any cluster
   * layout and in the oracle), final entropy rounded to 6.
   *
   * Output: (id, n_chars_counted, entropy).
   */
  def charEntropy(df: DataFrame, idCol: String,
                  textCol: String): DataFrame = {
    val chars = df
      .select(col(idCol), explode(split(col(textCol), "")).as("__c"))
      .filter(col("__c") =!= "")
    val cnt = chars.groupBy(col(idCol), col("__c"))
      .agg(count(lit(1)).as("__k"))
    val p = col("__k") / col("__n")
    val term = round(p * log(2.0, p), 12).cast("decimal(20,12)")
    cnt
      .withColumn("__n", sum(col("__k"))
        .over(org.apache.spark.sql.expressions.Window
          .partitionBy(col(idCol))))
      .groupBy(col(idCol))
      .agg(max(col("__n")).as("n_chars_counted"),
        round(-sum(term).cast("double"), 6).as("entropy"))
  }

  /** The eight Gopher "stop words" whose presence gates a document
    * (Rae et al. 2021, table A1 rule 7). */
  val GopherStopwords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /**
   * Gopher document-quality metrics (Rae et al. 2021, appendix A1.1 —
   * the public MassiveWeb filter rules), one struct per document from
   * a single narrow pass:
   *
   *  - `n_words` whitespace words; `mean_word_len`;
   *  - `frac_alpha_words` — share of words containing a letter;
   *  - `symbol_ratio` — (`#` chars + `...`/`…` occurrences) / words;
   *  - `frac_bullet_lines` — lines starting with `-` `*` `•`;
   *  - `frac_ellipsis_lines` — lines ending with `...` or `…`;
   *  - `n_stopwords` — how many of the eight [[GopherStopwords]]
   *    appear at least once.
   *
   * All fractions are int/int divisions rounded to 4 decimals (the
   * cross-engine float discipline); empty documents yield zero counts
   * and null-free zeros so the downstream pass/fail CASE is total.
   */
  def gopherMetrics(text: Column): Column = {
    val t = trim(text)
    val words = split(t, "\\s+")
    val n = when(t === "" || text.isNull, lit(0)).otherwise(size(words))
    val sumLen = aggregate(words, lit(0), (acc, w) => acc + length(w))
    val nAlpha = size(filter(words, w => w.rlike("[A-Za-z]")))
    val nHash = length(t) - length(regexp_replace(t, "#", ""))
    val nDots = floor((length(t) -
      length(regexp_replace(t, "\\.\\.\\.", ""))) / 3).cast("int")
    val nEll = length(t) - length(regexp_replace(t, "…", ""))
    val lines = split(text, "\n")
    val nLines = size(lines)
    val nBullet = size(filter(lines, l => trim(l).rlike("^[-*•]")))
    val nEllLines = size(filter(lines, l =>
      trim(l).rlike("(\\.\\.\\.|…)$")))
    val lowerWords = transform(words, lower(_))
    val nStop = size(filter(
      array(GopherStopwords.map(lit): _*),
      sw => array_contains(lowerWords, sw)))
    val frac4 = (num: Column, den: Column) =>
      when(den === 0, lit(0.0)).otherwise(round(num / den, 4))
    struct(
      n.as("n_words"),
      frac4(sumLen, n).as("mean_word_len"),
      frac4(nAlpha, n).as("frac_alpha_words"),
      frac4(nHash + nDots + nEll, n).as("symbol_ratio"),
      frac4(nBullet, nLines).as("frac_bullet_lines"),
      frac4(nEllLines, nLines).as("frac_ellipsis_lines"),
      when(n === 0, lit(0)).otherwise(nStop).as("n_stopwords"))
  }

  /**
   * The Gopher keep/drop decision over [[gopherMetrics]] — the
   * published thresholds as one boolean CASE: 50 ≤ words ≤ 100k,
   * 3 ≤ mean word length ≤ 10, symbol ratio < 0.1, ≥ 80% alphabetic
   * words, < 90% bullet lines, < 30% ellipsis lines, ≥ 2 stop words.
   * Thresholds are parameters so corpus-specific tuning stays one
   * call-site change.
   */
  def gopherPass(m: Column, minWords: Int = 50, maxWords: Int = 100000,
                 minMeanWl: Double = 3.0, maxMeanWl: Double = 10.0,
                 maxSymbolRatio: Double = 0.1,
                 minAlphaFrac: Double = 0.8,
                 maxBulletFrac: Double = 0.9,
                 maxEllipsisFrac: Double = 0.3,
                 minStopwords: Int = 2): Column =
    m("n_words") >= minWords && m("n_words") <= maxWords &&
      m("mean_word_len") >= minMeanWl && m("mean_word_len") <= maxMeanWl &&
      m("symbol_ratio") < maxSymbolRatio &&
      m("frac_alpha_words") >= minAlphaFrac &&
      m("frac_bullet_lines") < maxBulletFrac &&
      m("frac_ellipsis_lines") < maxEllipsisFrac &&
      m("n_stopwords") >= minStopwords

  /**
   * Clipped n-gram overlap between a candidate and a reference text —
   * ROUGE-n recall / BLEU-style clipped precision / F1, the standard
   * generation-eval and distillation-filter metric (Lin 2004;
   * Papineni et al. 2002). Counting is multiset with clipping:
   * overlap = Σ_g min(count_cand(g), count_ref(g)).
   *
   * Scale shape: explode → per-(id, gram) counts partial-aggregate
   * map-side (a doc's repeats of one gram never cross the network),
   * the overlap join keys on (id, gram) so it co-partitions with both
   * count aggregates, and the totals are narrow `size()` arithmetic —
   * no window, no driver state, row count = input pairs.
   *
   * Ratios are int/int IEEE divisions and F1 is composed from the
   * UNROUNDED ratios in one expression tree (bit-exact cross-engine
   * per the repo float discipline), all rounded to 6 at the end.
   *
   * Output: (id, n_cand, n_ref, overlap, precision, recall, f1).
   */
  def ngramOverlap(df: DataFrame, idCol: String, candCol: String,
                   refCol: String, n: Int): DataFrame = {
    require(n >= 1)
    def counts(c: String, out: String) = df
      .select(col(idCol), explode(wordGramsOccur(col(c), n)).as("__g"))
      .groupBy(col(idCol), col("__g")).agg(count(lit(1)).as(out))
    val ov = counts(candCol, "__c")
      .join(counts(refCol, "__r"), Seq(idCol, "__g"))
      .groupBy(col(idCol))
      .agg(sum(least(col("__c"), col("__r"))).cast("int").as("__ov"))
    val o = coalesce(col("__ov"), lit(0))
    val p = o / col("n_cand")
    val r = o / col("n_ref")
    df.select(col(idCol),
        size(wordGramsOccur(col(candCol), n)).as("n_cand"),
        size(wordGramsOccur(col(refCol), n)).as("n_ref"))
      .join(ov, Seq(idCol), "left")
      .select(col(idCol), col("n_cand"), col("n_ref"),
        o.as("overlap"),
        when(col("n_cand") === 0, lit(0.0))
          .otherwise(round(p, 6)).as("precision"),
        when(col("n_ref") === 0, lit(0.0))
          .otherwise(round(r, 6)).as("recall"),
        when(o === 0, lit(0.0))
          .otherwise(round(lit(2) * p * r / (p + r), 6)).as("f1"))
  }

  /**
   * CROSS-corpus boilerplate line detection — the complement of
   * [[dedupLinesWithMetrics]] (which dedups WITHIN a document): nav
   * menus, cookie banners and footer lines repeat across *documents*,
   * so the unit of evidence is "how many distinct docs contain this
   * line" (distinct-docs, not raw occurrences — one spammy document
   * repeating its own footer a million times is intra-doc repetition,
   * not corpus boilerplate). C4 (Raffel et al. 2020 §2.2) removes
   * such lines corpus-wide; this is that step's learnable half.
   *
   * Scale shape: (id, trimmed line) `distinct` collapses map-side
   * before its one shuffle (per-doc repeats never cross the network),
   * then the line count is a second partially-aggregated shuffle.
   * Blank lines are never boilerplate (formatting, not content).
   *
   * Output: (line, n_docs) for trimmed lines in ≥ `minDocs` docs.
   */
  def boilerplateLines(df: DataFrame, idCol: String, textCol: String,
                       minDocs: Int): DataFrame = {
    require(minDocs >= 2, "boilerplate needs cross-document evidence")
    df.select(col(idCol),
        explode(split(col(textCol), "\n")).as("__line"))
      .select(col(idCol), trim(col("__line")).as("line"))
      .filter(col("line") =!= "")
      .distinct()
      .groupBy(col("line")).agg(count(lit(1)).as("n_docs"))
      .filter(col("n_docs") >= minDocs)
  }

  /**
   * Strip [[boilerplateLines]] from every document: a line is dropped
   * wherever its TRIMMED form is in the learned set; surviving lines
   * keep their original text and order. Docs reduced to nothing come
   * back with empty text, never disappear (corpus row count is load-
   * bearing downstream).
   *
   * The strip join is a LEFT ANTI on the trimmed line — AQE broadcasts
   * the learned set when it is small (the common case: lines crossing
   * the `minDocs` bar are a sliver of distinct lines), and the
   * reassembly `collect_list` is per-document sized, grouped on the
   * id the explode already carried.
   *
   * Output: (id, text, n_lines, n_removed).
   */
  def stripBoilerplate(df: DataFrame, idCol: String, textCol: String,
                       minDocs: Int): DataFrame = {
    val bl = boilerplateLines(df, idCol, textCol, minDocs)
    val lines = df.select(col(idCol),
      posexplode(split(col(textCol), "\n")).as(Seq("__pos", "__line")))
    val kept = lines
      .join(bl, trim(lines("__line")) === bl("line"), "left_anti")
      .groupBy(col(idCol))
      .agg(
        array_join(transform(
          array_sort(collect_list(struct(col("__pos"), col("__line")))),
          _("__line")), "\n").as("__text"),
        count(lit(1)).as("__kept"))
    df.select(col(idCol),
        size(split(col(textCol), "\n")).as("n_lines"))
      .join(kept, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("__text"), lit("")).as("text"),
        col("n_lines"),
        (col("n_lines") - coalesce(col("__kept"), lit(0L)))
          .cast("int").as("n_removed"))
  }

  /**
   * Compiled Aho–Corasick automaton: goto/fail/output tables built once
   * from the pattern list. Serializable — the task closure ships the
   * compiled tables (a blocklist is KBs of ints; per-task rebuild would
   * be the real waste). Matching walks UTF-16 code units, so `first`
   * positions agree with `String.indexOf` (and with SQL `position` on
   * ASCII/BMP text).
   */
  private object AcAutomaton {
    /** Build the compiled (goto, fail, merged-output) tables. Lives in
      * the companion so the construction scaffolding (growable
      * buffers, per-node output LISTS) is garbage the moment
      * compilation ends — instance fields would ride the serialized
      * task closure and ship the automaton roughly twice. */
    def compile(patterns: Array[String])
        : (Array[java.util.HashMap[Char, Int]], Array[Int],
           Array[Array[Int]]) = {
      // nodes: goto maps (char -> node), fail links, and the pattern
      // ids whose suffix ends at the node (own outputs ∪ fail-chain
      // outputs, pre-merged so the scan never chases links)
      val gotoMaps =
        scala.collection.mutable.ArrayBuffer(
          new java.util.HashMap[Char, Int]())
      val outs =
        scala.collection.mutable.ArrayBuffer[List[Int]](Nil)
      val fail = scala.collection.mutable.ArrayBuffer(0)
      patterns.zipWithIndex.foreach { case (p, pi) =>
        var node = 0
        var i = 0
        while (i < p.length) {
          val m = gotoMaps(node)
          var next = m.getOrDefault(p.charAt(i), -1)
          if (next < 0) {
            next = gotoMaps.size
            m.put(p.charAt(i), next)
            gotoMaps += new java.util.HashMap[Char, Int]()
            outs += Nil
            fail += 0
          }
          node = next
          i += 1
        }
        outs(node) ::= pi
      }
      // BFS fail links; merge fail-target outputs into each node so a
      // match report is a single list read
      val queue = new java.util.ArrayDeque[Int]()
      gotoMaps(0).forEach { (_, n) => fail(n) = 0; queue.add(n) }
      while (!queue.isEmpty) {
        val u = queue.poll()
        outs(u) = outs(u) ++ outs(fail(u))
        gotoMaps(u).forEach { (c, v) =>
          var f = fail(u)
          while (f != 0 && !gotoMaps(f).containsKey(c)) f = fail(f)
          fail(v) = gotoMaps(f).getOrDefault(c, 0)
          if (fail(v) == v) fail(v) = 0
          queue.add(v)
        }
      }
      (gotoMaps.toArray, fail.toArray, outs.map(_.toArray).toArray)
    }
  }

  private final class AcAutomaton(val patterns: Array[String])
      extends Serializable {
    private val (gotoArr, failArr, outArr) = AcAutomaton.compile(patterns)

    /** One left-to-right pass: per pattern, 1-based first-occurrence
      * position and the greedy non-overlapping occurrence count (the
      * `indexOf`/SQL-`replace` semantics — each accepted match resumes
      * the search after its own last char). */
    def scan(text: String): Seq[(String, Int, Int)] = {
      if (text == null || text.isEmpty) return Nil
      val first = new Array[Int](patterns.length)
      val count = new Array[Int](patterns.length)
      val nextFree = new Array[Int](patterns.length) // 0-based resume point
      var node = 0
      var i = 0
      while (i < text.length) {
        val c = text.charAt(i)
        while (node != 0 && !gotoArr(node).containsKey(c))
          node = failArr(node)
        node = gotoArr(node).getOrDefault(c, 0)
        val hits = outArr(node)
        var h = 0
        while (h < hits.length) {
          val pi = hits(h)
          val start = i - patterns(pi).length + 1
          if (first(pi) == 0) first(pi) = start + 1 // 1-based
          if (start >= nextFree(pi)) {
            count(pi) += 1
            nextFree(pi) = i + 1
          }
          h += 1
        }
        i += 1
      }
      val b = Seq.newBuilder[(String, Int, Int)]
      var pi = 0
      while (pi < patterns.length) {
        if (count(pi) > 0) b += ((patterns(pi), first(pi), count(pi)))
        pi += 1
      }
      b.result()
    }
  }

  /**
   * Multi-pattern exact keyword tagging — the blocklist / PII-screen /
   * topic-tag shape of a web-corpus pipeline: mark every document that
   * contains any of a dictionary of exact strings (bad-word lists,
   * benchmark canaries, brand terms), with position and count evidence.
   *
   * One Aho–Corasick pass per document: O(chars + matches) regardless
   * of dictionary size. The naive alternative — a `contains` join
   * against a patterns table — is a Cartesian O(docs × patterns)
   * re-scan of every document per pattern, which is exactly what dies
   * first at 100 TB × a 10k-term blocklist. The compiled automaton
   * rides the task closure (KBs); the scan is a narrow map + explode —
   * zero shuffles, parallel in the input splits.
   *
   * Output: (id, keyword, first_pos, n_hits) — one row per (document,
   * matched keyword); `first_pos` is the 1-based offset of the first
   * occurrence (SQL `position` convention), `n_hits` the greedy
   * non-overlapping count (SQL `replace`-delta convention), so every
   * cell is independently recomputable by an external SQL engine.
   * Matching is exact and case-sensitive; normalize upstream (e.g.
   * [[cleanText]], `lower`) when the dictionary expects it.
   */
  def keywordTags(df: DataFrame, idCol: String, textCol: String,
                  keywords: Seq[String]): DataFrame = {
    require(keywords.nonEmpty, "keywordTags needs at least one keyword")
    require(keywords.forall(_.nonEmpty), "empty string is not a keyword")
    val distinctKw = keywords.distinct.toArray
    val ac = new AcAutomaton(distinctKw)
    val kernel = udf((text: String) => ac.scan(text))
    df.select(col(idCol), explode(kernel(col(textCol))).as("__hit"))
      .select(col(idCol),
        col("__hit._1").as("keyword"),
        col("__hit._2").as("first_pos"),
        col("__hit._3").as("n_hits"))
  }
}
