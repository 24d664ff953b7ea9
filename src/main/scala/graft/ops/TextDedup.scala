package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.FastHash

/**
 * Large-scale text deduplication operators (BASELINE.json north-star:
 * training-data pipeline ops, first-class alongside the reference's own
 * dedup — SURVEY.md §7.6).
 *
 * Performance design (profiled, not guessed):
 *  - Spark's higher-order array functions and collection expressions
 *    (transform / aggregate / array_intersect / array_sort) are
 *    CodegenFallback — interpreted per element. Every per-document and
 *    per-pair hot loop therefore runs as a JIT-compiled Scala UDF
 *    kernel instead.
 *  - Shingle sets are carried as SORTED arrays of 64-bit hashes
 *    (FastHash), not strings: ~8 bytes/shingle through shuffles and a
 *    branch-predictable merge-intersection per candidate pair.
 *    (Collision odds per pair ≈ |A|·|B|/2^64 — immaterial.)
 *  - Pairwise work is always blocked (LSH bands / hash buckets /
 *    length bands) so nothing is O(n²) at 100 TB, and per-document prep
 *    is persisted before any self-join so it cannot be re-evaluated per
 *    candidate pair.
 *
 * Cache contract (caller-owned, like [[Similarity.ivfAssign]]): the
 * pair-finding functions persist their per-document prep, and the
 * RETURNED lazy plan still references that cache — the library cannot
 * unpersist it without un-doing the self-join dedup of work. A
 * long-lived session running many of these should call
 * `spark.catalog.clearCache()` between pipelines (as Bench does), or
 * rely on Spark's LRU eviction (MEMORY_AND_DISK blocks are evictable;
 * eviction costs recompute, never correctness).
 */
object TextDedup {

  /** Distinct k-char shingles of a (lowercased, whitespace-squashed)
    * string as an array column. Per-document only — pair paths use
    * [[shingleHashes]]. */
  def charShingles(text: Column, k: Int): Column = {
    val norm = lower(regexp_replace(trim(text), "\\s+", " "))
    array_distinct(
      transform(
        sequence(lit(1), greatest(lit(1), length(norm) - lit(k - 1))),
        i => norm.substr(i, lit(k))))
  }

  /** Distinct whitespace word n-gram shingles; documents with fewer
    * than n words yield an EMPTY set (no truncated grams). One JIT'd
    * pass per document — the equivalent
    * transform/slice/concat_ws expression tree is CodegenFallback
    * (interpreted per gram) and measured ~3× slower corpus-wide. */
  def wordShingles(text: Column, n: Int): Column = {
    val kernel = udf((s: String) => {
      if (s == null) Array.empty[String]
      else {
        val toks = s.trim.toLowerCase.split("\\s+")
        if (toks.length < n || (toks.length == 1 && toks(0).isEmpty))
          Array.empty[String]
        else {
          val set = new java.util.LinkedHashSet[String]
          var i = 0
          while (i + n <= toks.length) {
            val sb = new StringBuilder
            var j = 0
            while (j < n) {
              if (j > 0) sb.append(' ')
              sb.append(toks(i + j))
              j += 1
            }
            set.add(sb.result())
            i += 1
          }
          val arr = new Array[String](set.size)
          set.toArray(arr)
          arr
        }
      }
    })
    kernel(text)
  }

  /** Sorted distinct 64-bit hash set of the k-char shingles of a
    * normalized string — a NATIVE codegen'd Catalyst expression
    * (org.apache.spark.sql.graftshim.ShingleHashesExpr): the whole
    * normalize→hash→sort→dedupe prep stays inside WholeStageCodegen
    * with no UDF closure/Row-conversion boundary. */
  def shingleHashes(text: Column, k: Int): Column = {
    val norm = lower(regexp_replace(trim(text), "\\s+", " "))
    org.apache.spark.sql.graftshim.ShingleColumns.shingleHashes(norm, k)
  }

  /** Jaccard of two sorted distinct hash arrays: merge-intersection,
    * no allocation, JIT'd. */
  private val jaccardKernel = udf((a: Array[Long], b: Array[Long]) => {
    var i = 0
    var j = 0
    var inter = 0
    val na = a.length
    val nb = b.length
    while (i < na && j < nb) {
      val x = a(i)
      val y = b(j)
      if (x == y) { inter += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    inter.toDouble / (na + nb - inter)
  })

  /** Smallest integer overlap x whose jaccard x/(s−x) passes the FINAL
    * double compare `fl(x/(s−x)) >= t` — float-estimated, then adjusted
    * with the exact final comparison so boundary pairs (J == t after
    * rounding) are never mis-pruned. */
  private def minPassingOverlap(s: Int, t: Double): Int = {
    var need = math.max(0, math.ceil(t * s / (1.0 + t)).toInt - 1)
    while (need <= s && need.toDouble / (s - need) < t) need += 1
    need
  }

  /** Thresholded Jaccard kernel with a LOSSLESS early exit: once
    * inter + min(remaining) drops below the smallest overlap that can
    * pass the final compare, the pair provably fails, so we bail — the
    * returned underestimate is still < t and gets filtered. Pairs ≥ t
    * always complete the full merge, so their reported jaccard is
    * exact. The exit threshold is an INTEGER derived from the final
    * double compare itself (see [[minPassingOverlap]]) — a float bound
    * like t·(na+nb)/(1+t) can round a hair above the true minimum and
    * drop exact-boundary pairs. */
  private def jaccardAtLeastKernel(t: Double) =
    udf((a: Array[Long], b: Array[Long]) => {
      val na = a.length
      val nb = b.length
      val need = minPassingOverlap(na + nb, t)
      var i = 0
      var j = 0
      var inter = 0
      var live = true
      while (live && i < na && j < nb) {
        if (inter + math.min(na - i, nb - j) < need) live = false
        else {
          val x = a(i)
          val y = b(j)
          if (x == y) { inter += 1; i += 1; j += 1 }
          else if (x < y) i += 1
          else j += 1
        }
      }
      inter.toDouble / (na + nb - inter)
    })

  /**
   * Exact dedup by content hash (hash-groupBy): one shuffle on the
   * digest. Returns (content_hash, survivor_id = min id, dup_count).
   */
  def exactGroups(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(md5(col(textCol)).as("content_hash"))
      .agg(
        min(col(idCol)).as("survivor_id"),
        count(lit(1)).as("dup_count"))

  /** Exact-dedup'd relation: one survivor row per distinct content. */
  def exactDedup(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val survivors = exactGroups(df, idCol, textCol)
      .select(col("survivor_id").as(idCol))
    df.join(survivors, Seq(idCol), "left_semi")
  }

  // ---- Exact substring (duplicated-span) dedup ---------------------------

  /**
   * Cross-document duplicated-substring spans: token runs of length
   * >= k that appear verbatim in MORE THAN ONE document, reported per
   * document as merged `[span_start, span_end]` token intervals
   * (0-based, inclusive; tokens are the whitespace/lowercase
   * convention of [[TextAnalysis.wordGramsOccur]]).
   *
   * This is the exact-substring flavor of training-data dedup
   * (Lee et al. 2021, "Deduplicating Training Data Makes Language
   * Models Better"): MinHash/SimHash catch near-duplicate DOCUMENTS;
   * this catches verbatim boilerplate/quotation SPANS inside otherwise
   * distinct documents. The published implementation builds a corpus
   * suffix array; Spark-first the same spans fall out of k-gram
   * fingerprints, which distribute:
   *
   *  1. one row per token position: (doc, pos, xxhash64(k-gram)) —
   *     8-byte fingerprints through the shuffle, never gram strings;
   *  2. fingerprints seen in >= 2 distinct docs via a single
   *     partial-aggregating groupBy — `min(doc) <> max(doc)` is the
   *     2-distinct test without a countDistinct;
   *  3. join back (same key => AQE reuses the exchange) and merge
   *     overlapping/adjacent hits per doc with ONE keyed window
   *     (partitioned by doc — bounded by document length, never
   *     corpus-scale).
   *
   * No all-pairs comparison, no driver funnel; skewed (ubiquitous)
   * k-grams hit the map-side combine in step 2, not a hot reducer.
   * Intra-document repeats are deliberately excluded (those are
   * repetition metrics, [[TextAnalysis.repetitionMetrics]]).
   *
   * Output: (idCol, span_start, span_end, span_tokens), one row per
   * maximal duplicated span.
   */
  def duplicateSpans(df: DataFrame, idCol: String, textCol: String,
                     k: Int): DataFrame = {
    require(k >= 1, s"k-gram size must be positive, got $k")
    import org.apache.spark.sql.expressions.Window
    val occ = df
      .select(col(idCol), posexplode(
        TextAnalysis.wordGramsOccur(col(textCol), k)).as(Seq("pos", "g")))
      .select(col(idCol), col("pos").cast("long").as("pos"),
        xxhash64(col("g")).as("gh"))
    val dup = occ
      .groupBy(col("gh"))
      .agg(min(col(idCol)).as("_mn"), max(col(idCol)).as("_mx"))
      .filter(col("_mn") =!= col("_mx"))
      .select(col("gh"))
    val hits = occ.join(dup, "gh").select(col(idCol), col("pos"))
    val byDoc = Window.partitionBy(col(idCol)).orderBy(col("pos"))
    val prevEnd = max(col("pos") + lit(k - 1))
      .over(byDoc.rowsBetween(Window.unboundedPreceding, -1))
    hits
      .withColumn("_brk",
        when(prevEnd.isNull || col("pos") > prevEnd + 1, 1).otherwise(0))
      .withColumn("_isl", sum(col("_brk")).over(
        byDoc.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col(idCol), col("_isl"))
      .agg(min(col("pos")).as("span_start"),
        (max(col("pos")) + lit(k - 1)).cast("long").as("span_end"))
      .select(col(idCol), col("span_start"), col("span_end"),
        (col("span_end") - col("span_start") + 1).as("span_tokens"))
  }

  /**
   * Cleaned corpus face of [[duplicateSpans]]: every document with its
   * duplicated spans removed (normalized to the same lowercase /
   * single-space token convention the spans index into). Documents
   * fully covered by duplicated spans come back with an empty string;
   * documents with no duplicated span come back whole. Output:
   * (idCol, clean_text, kept_tokens, removed_tokens).
   *
   * Token positions anti-join the span intervals per document (equi on
   * doc + a range predicate over the doc's few spans), then each doc
   * reassembles order-deterministically via array_sort over (pos, tok)
   * structs — per-document arrays, bounded by document length.
   */
  def stripDuplicateSpans(df: DataFrame, idCol: String, textCol: String,
                          k: Int): DataFrame = {
    // alias the span side: both frames share the source lineage, and a
    // raw idCol === idCol would be built over identical attribute ids
    // (resolves correctly via dataset-id disambiguation, but logs a
    // "trivially true predicate" WARN per run)
    val spans = duplicateSpans(df, idCol, textCol, k)
      .select(col(idCol).as("_span_doc"),
        col("span_start"), col("span_end"))
    val toks = df.select(col(idCol),
      posexplode(TextAnalysis.wordGramsOccur(col(textCol), 1))
        .as(Seq("pos", "tok")))
      .select(col(idCol), col("pos").cast("long").as("pos"), col("tok"))
    val kept = toks.join(spans,
      col(idCol) === col("_span_doc") &&
        col("pos").between(col("span_start"), col("span_end")),
      "left_anti")
    val rebuilt = kept
      .groupBy(col(idCol))
      .agg(
        concat_ws(" ", transform(
          array_sort(collect_list(struct(col("pos"), col("tok")))),
          s => s.getField("tok"))).as("clean_text"),
        count(lit(1)).as("kept_tokens"))
    df.select(col(idCol),
        TextAnalysis.tokenCount(col(textCol)).cast("long").as("_n"))
      .join(rebuilt, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("clean_text"), lit("")).as("clean_text"),
        coalesce(col("kept_tokens"), lit(0L)).as("kept_tokens"),
        (col("_n") - coalesce(col("kept_tokens"), lit(0L)))
          .as("removed_tokens"))
  }

  // ---- MinHash + LSH ----------------------------------------------------

  /** Deterministic affine hash params (seeded — reproducible runs). */
  private def hashParams(k: Int, seed: Long): Array[(Long, Long)] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(k)((rnd.nextInt(Int.MaxValue - 1).toLong + 1L,
      rnd.nextInt(Int.MaxValue).toLong))
  }

  private val MersennePrime = 2147483647L // 2^31 - 1

  /** The (a, b) coefficient table behind [[minhashSignatureFromHashes]],
    * exposed so the DuckDB oracle for `q_dedup_minhash` can pin the
    * SAME hash family as SQL literals (the pinned-vocab oracle
    * pattern) — any drift in the derivation breaks the gate loudly. */
  private[graft] def minhashParams(k: Int, seed: Long): Array[(Long, Long)] =
    hashParams(k, seed)

  /** MinHash signature (array<long> length k) from the sorted shingle
    * hash set: per function, min of (a·(h&2³¹⁻¹)+b) mod (2³¹−1) —
    * products < 2⁶², no overflow; one JIT'd pass. */
  def minhashSignatureFromHashes(hashes: Column, k: Int = 128,
                                 seed: Long = 42L): Column = {
    val params = hashParams(k, seed)
    val kernel = udf((hs: Array[Long]) => {
      val n = hs.length
      val base = new Array[Long](n)
      var i = 0
      while (i < n) { base(i) = hs(i) & 0x7FFFFFFFL; i += 1 }
      val sig = new Array[Long](params.length)
      var j = 0
      while (j < params.length) {
        val (a, b) = params(j)
        var m = Long.MaxValue
        i = 0
        while (i < n) {
          val v = (a * base(i) + b) % MersennePrime
          if (v < m) m = v
          i += 1
        }
        sig(j) = m
        j += 1
      }
      sig
    })
    kernel(hashes)
  }

  /** MinHash signature over a string-shingle array (API-compat wrapper:
    * hashes each shingle, then [[minhashSignatureFromHashes]]). */
  def minhashSignature(shingles: Column, k: Int = 128,
                       seed: Long = 42L): Column = {
    val toHashes = udf((sh: Seq[String]) => {
      val hs = sh.map(FastHash.hash64).toArray
      java.util.Arrays.sort(hs)
      hs
    })
    minhashSignatureFromHashes(toHashes(shingles), k, seed)
  }

  /** LSH band hashes: b bands of r contiguous signature rows, each
    * hashed (murmur3 over the slice + band index). */
  def bandHashes(sig: Column, bands: Int, rows: Int): Column =
    array((0 until bands).map { j =>
      hash(slice(sig, j * rows + 1, rows), lit(j))
    }: _*)

  /**
   * MinHash-LSH near-duplicate pairs.
   *
   * shingle → minhash → band → bucket-join → exact-Jaccard verify:
   *  1. per doc: sorted shingle-hash set, signature, band hashes —
   *     JIT'd kernels, persisted (self-joins must not re-evaluate
   *     per-document prep per candidate pair);
   *  2. explode bands; self-join on (band index, band hash) — the ONLY
   *     wide shuffle, keyed by bucket, so cost is Σ bucket², not n²;
   *  3. distinct candidate pairs verified with exact Jaccard
   *     (merge-intersection of the sorted hash sets); keep ≥ threshold.
   *
   * Returns (id_a, id_b, jaccard) with id_a < id_b.
   */
  /** Fan a (id, text) projection of a single-split scan across the
    * session's cores BEFORE the shingle/minhash kernels attach — the
    * kernels are the dominant per-row cost and exchanges do not
    * commute with projections, so the spread must happen on the raw
    * text (graft.ops.Dispatch.fanOut scaladoc; no-op at production
    * scan parallelism). */
  private def spreadIdText(df: DataFrame, idCol: String,
                           textCol: String): DataFrame =
    Dispatch.fanOut(df.select(col(idCol), col(textCol)), col(idCol))

  def minhashLshPairs(df: DataFrame, idCol: String, textCol: String,
                      shingleLen: Int = 5, numHashes: Int = 128,
                      bands: Int = 32, jaccardThreshold: Double = 0.8,
                      seed: Long = 42L): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val rows = numHashes / bands
    val prepared = spreadIdText(df, idCol, textCol)
      .select(col(idCol), shingleHashes(col(textCol), shingleLen).as("__shh"))
      .filter(size(col("__shh")) > 0)
      .withColumn("__bands",
        bandHashes(minhashSignatureFromHashes(col("__shh"), numHashes, seed),
          bands, rows))
      .persist()
    val bandTable = prepared
      .select(col(idCol), posexplode(col("__bands")).as(Seq("__band", "__bh")))
    val candidates = bandTable.as("a")
      // shuffle-hash: a broadcast join would stream the probe side with
      // the persisted input's (few) partitions — one core does all pairs
      .hint("shuffle_hash")
      .join(bandTable.as("b"),
        col("a.__band") === col("b.__band") &&
          col("a.__bh") === col("b.__bh") &&
          col(s"a.$idCol") < col(s"b.$idCol"))
      .select(col(s"a.$idCol").as("id_a"), col(s"b.$idCol").as("id_b"))
      .distinct()
    val sh = prepared.select(col(idCol), col("__shh"))
    candidates
      .join(sh.withColumnRenamed(idCol, "id_a").withColumnRenamed("__shh", "__sa"),
        Seq("id_a"))
      .join(sh.withColumnRenamed(idCol, "id_b").withColumnRenamed("__shh", "__sb"),
        Seq("id_b"))
      .withColumn("jaccard", jaccardKernel(col("__sa"), col("__sb")))
      .filter(col("jaccard") >= jaccardThreshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  // ---- n-gram Jaccard with deterministic blocking ----------------------

  /**
   * Exact n-gram Jaccard threshold join via LOSSLESS prefix filtering
   * (AllPairs/PPJoin family, deterministic — no probabilistic recall):
   *
   * With a GLOBAL total order on shingles, J(A,B) ≥ t implies
   * |A∩B| ≥ t·|A| and ≥ t·|B| (union ≥ max size). Let prefix(X) = the
   * first |X| − ⌈t·|X|⌉ + 1 elements in that order. The smallest common
   * element e must lie in both prefixes: were e outside prefix(A), all
   * ≥ prefixLen elements before it in A would be non-shared, capping
   * the overlap below ⌈t·|A|⌉ — contradiction. So joining the exploded
   * prefixes finds every qualifying pair; the merge-intersection kernel
   * then verifies exactly. Result = ALL pairs with Jaccard ≥ t (a true
   * threshold join, plain-SQL oracle-expressible).
   *
   * The order is RAREST-FIRST (ascending global document frequency,
   * hash tiebreak) — the AllPairs/PPJoin canonical ordering (Bayardo
   * et al., WWW'07; Xiao et al., PPJoin). Prefixes then hold each
   * document's rarest shingles, so join buckets are tiny even at
   * moderate thresholds where the prefix is half the document (a
   * hash-ordered prefix degrades to near-all-pairs there: corpus-common
   * shingles land in every prefix).
   *
   * Scale: frequency counting and the candidate join are both keyed by
   * shingle hash (well-spread); per-document re-ordering is one
   * groupBy sized as the corpus token count; AQE handles residual
   * bucket skew. The size-ratio prefilter (implied by t) skips the
   * verify kernel for hopeless candidates.
   */
  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String,
                        shingleLen: Int = 5,
                        threshold: Double = 0.8,
                        denseVocabLimit: Int = 1 << 14,
                        denseBlocks: Int = 32): DataFrame = {
    val prepared = df
      .select(col(idCol), shingleHashes(col(textCol), shingleLen).as("__sh"))
      .filter(size(col("__sh")) > 0)
      .persist()
    val toks = prepared.select(col(idCol), explode(col("__sh")).as("__h"))
    // adaptive dispatch on corpus statistics (the regimes need different
    // algorithms): a SMALL shingle universe makes prefix filtering
    // structurally useless — every shingle is corpus-common, so nearly
    // every pair shares a "rare" prefix element — while making dense
    // bitmap intersection cheap. Probe cardinality approximately first
    // (one cheap agg) and only collect the exact vocabulary when it
    // plausibly fits.
    val vocabOpt = Dispatch.denseVocab(toks, col("__h"),
      Dispatch.integralId(prepared, idCol), denseVocabLimit)
    vocabOpt match {
      case Some(vocab) =>
        val orig = prepared.schema(idCol).dataType
        denseJaccardPairs(prepared, idCol, threshold, vocab, denseBlocks)
          .select(col("id_a").cast(orig).as("id_a"),
            col("id_b").cast(orig).as("id_b"), col("jaccard"))
      case None =>
        prefixJaccardPairs(prepared, toks, idCol, threshold)
    }
  }

  /**
   * Small-universe exact Jaccard: dictionary-encode each document's
   * shingle set as a V-bit bitmap (V = vocabulary size, broadcast as a
   * sorted hash dictionary) and compare documents tile-by-tile.
   * Documents are assigned to `blocks` blocks; each unordered block
   * pair is one task comparing its tile with popcount-AND kernels
   * (~V/64 word ops per pair, branchless — several times faster than a
   * merge-intersection of sorted arrays when V is small). The
   * replication is n·blocks rows — the Afrati–Ullman communication-
   * optimal scheme for all-pairs problems; at scale pick blocks so a
   * tile (2n/blocks bitmaps) fits executor memory. The length-ratio
   * prefilter (J ≥ t ⇒ min ≥ t·max) skips hopeless pairs before the
   * kernel.
   */
  private def denseJaccardPairs(prepared: DataFrame, idCol: String,
                                threshold: Double, vocab: Array[Long],
                                blocks: Int): DataFrame = {
    val spark = prepared.sparkSession
    import spark.implicits._
    val (toBits, nWords) = Tiles.bitmapUdf(spark, vocab)
    val t = threshold
    val docs = prepared.select(
      col(idCol).cast("long").as("id"),
      struct(size(col("__sh")).as("_1"), toBits(col("__sh")).as("_2")).as("p"))
      .as[(Long, (Int, Array[Long]))]
    Tiles.selfPairs[(Int, Array[Long]), (Long, Long, Double)](docs, blocks) {
      case ((ida, (na, ba)), (idb, (nb, bb)), out) =>
        // division form, matching the final `jac >= t` compare exactly —
        // fl(t*max) can exceed the true bound and drop boundary pairs
        if (math.min(na, nb).toDouble / math.max(na, nb) >= t) {
          var inter = 0
          var w = 0
          while (w < nWords) {
            inter += java.lang.Long.bitCount(ba(w) & bb(w))
            w += 1
          }
          val jac = inter.toDouble / (na + nb - inter)
          if (jac >= t) {
            if (ida < idb) out += ((ida, idb, jac)) else out += ((idb, ida, jac))
          }
        }
    }.toDF("id_a", "id_b", "jaccard")
  }

  /** Large-universe exact Jaccard: rarest-first prefix filtering (see
    * [[ngramJaccardPairs]] scaladoc for the losslessness argument). */
  private def prefixJaccardPairs(prepared: DataFrame, toks: DataFrame,
                                 idCol: String, threshold: Double): DataFrame = {
    // sort (docfreq, hash) ascending, emit the prefix as (pos, hash, n).
    // Prefix length n − ⌈t·n⌉ + 2: one slot more than the textbook
    // n − ⌈t·n⌉ + 1, absorbing float rounding of ⌈t·n⌉ (e.g. t=0.4,
    // n=30: fl(0.4·30)=12.000000000000002 → ceil 13 shortens the
    // prefix and silently drops exact-boundary pairs).
    val prefixKernel = udf((ch: Seq[Long], hh: Seq[Long]) => {
      val n = ch.length
      val keys = new Array[(Long, Long)](n)
      var i = 0
      while (i < n) { keys(i) = (ch(i), hh(i)); i += 1 }
      java.util.Arrays.sort(keys, implicitly[Ordering[(Long, Long)]])
      val p = math.max(1, math.min(n - math.ceil(threshold * n).toInt + 2, n))
      Array.tabulate(p)(i => (i, keys(i)._2, n))
    })
    val freqs = toks.groupBy(col("__h")).agg(count(lit(1)).as("__c"))
    val prefixes = toks
      // shuffle-hash on __h; freqs is one row per distinct shingle but
      // may exceed broadcast limits at scale (vocabulary-sized)
      .hint("shuffle_hash")
      .join(freqs, Seq("__h"))
      .groupBy(col(idCol))
      .agg(collect_list(col("__c")).as("__cs"), collect_list(col("__h")).as("__hs"))
      .select(col(idCol),
        explode(prefixKernel(col("__cs"), col("__hs"))).as("__p"))
      .select(col(idCol), col("__p._1").as("__pos"), col("__p._2").as("__h"),
        col("__p._3").as("__n"))
      // both sides of the self-join read this — without a
      // materialization barrier the freq join + reorder runs twice
      .persist()
    val candidates = prefixes.as("a")
      // shuffle-hash: partition candidate generation by prefix hash; a
      // broadcast join would stream on the cached side's few partitions
      .hint("shuffle_hash")
      .join(prefixes.as("b"),
        col("a.__h") === col("b.__h") &&
          col(s"a.$idCol") < col(s"b.$idCol"))
      // group-count positional filter (PPJoin family, LOSSLESS): per
      // pair, cnt = |prefix(A) ∩ prefix(B)| and (pa, pb) = positions of
      // the LARGEST common prefix element e*. Positions are monotone in
      // the global order, so every common element < e* sits in both
      // prefixes (all of A's elements below a prefix element are prefix
      // elements) and is counted by cnt, while common elements > e*
      // number ≤ min(|A|−1−pa, |B|−1−pb). Hence
      //   overlap ≤ maxInter := min(cnt + min(|A|−1−pa, |B|−1−pb),
      //                             min(|A|,|B|)).
      // The pass test is the SAME division compare as the final filter
      // — fl(maxInter/(|A|+|B|−maxInter)) ≥ t — which is lossless
      // because x/(s−x) is monotone in x and fl is monotone, so the
      // bound's rounded jaccard dominates the pair's rounded jaccard
      // (a multiplicative form like overlap·(1+t) ≥ t·(na+nb) rounds
      // differently from the final compare and can drop exact-boundary
      // pairs). Replaces a bare distinct(): same shuffle, but hopeless
      // pairs never reach the array-verify join.
      .groupBy(
        col(s"a.$idCol").as("id_a"), col(s"b.$idCol").as("id_b"),
        col("a.__n").as("__na"), col("b.__n").as("__nb"))
      .agg(count(lit(1)).as("__cnt"),
        max(col("a.__pos")).as("__pa"), max(col("b.__pos")).as("__pb"))
      .withColumn("__maxi",
        least(
          col("__cnt") +
            least(col("__na") - 1 - col("__pa"), col("__nb") - 1 - col("__pb")),
          least(col("__na"), col("__nb"))))
      .filter(col("__maxi") > 0 &&
        col("__maxi").cast("double") /
          (col("__na") + col("__nb") - col("__maxi")) >= lit(threshold))
      .select(col("id_a"), col("id_b"))
    val sh = prepared.select(col(idCol), col("__sh"))
    candidates
      .join(sh.withColumnRenamed(idCol, "id_a").withColumnRenamed("__sh", "__sa"),
        Seq("id_a"))
      .join(sh.withColumnRenamed(idCol, "id_b").withColumnRenamed("__sh", "__sb"),
        Seq("id_b"))
      // size prefilter implied by the threshold: J ≥ t ⇒ min/max ≥ t,
      // checked with the same division compare as the final filter
      // (multiplicative t·max rounds differently and can drop
      // exact-boundary pairs)
      .filter(least(size(col("__sa")), size(col("__sb"))).cast("double") /
        greatest(size(col("__sa")), size(col("__sb"))) >= lit(threshold))
      .withColumn("jaccard", jaccardAtLeastKernel(threshold)(col("__sa"), col("__sb")))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /**
   * Exact n-gram Jaccard dedup with deterministic length-band blocking
   * (no probabilistic LSH): pairs are compared iff their normalized
   * lengths fall within one band of each other — a pair with Jaccard ≥ t
   * has size ratio ≥ t, so true pairs are never missed for sane
   * (t, bandWidth) and the result is fully oracle-expressible in plain
   * SQL. The size-ratio prefilter (implied by the threshold) skips the
   * merge kernel for hopeless pairs.
   *
   * NOTE: prefer [[ngramJaccardPairs]] — length bands carry no signal
   * on same-length corpora (measured 290 s vs 2 s at sf0.1), and the
   * band constraint changes the result set (cross-band pairs are
   * excluded by DESIGN here, not missed). Kept for callers who want
   * exactly the banded semantics.
   */
  def ngramJaccardPairsBanded(df: DataFrame, idCol: String, textCol: String,
                        shingleLen: Int = 5, threshold: Double = 0.8,
                        bandWidth: Int = 32, saltBuckets: Int = 32): DataFrame = {
    val prepared = df
      .select(col(idCol), shingleHashes(col(textCol), shingleLen).as("__sh"),
        floor(length(lower(regexp_replace(trim(col(textCol)), "\\s+", " "))) / bandWidth)
          .as("__band"))
      .filter(size(col("__sh")) > 0)
      .persist()
    // compare within band b and neighbor band b+1 (covers ±1)
    val expanded = prepared
      .withColumn("__probe", explode(array(col("__band"), col("__band") + 1)))
    // length bands are few and fat (classic self-join skew): salt the
    // left side by id, replicate the right side across salts — the same
    // pair set, split saltBuckets ways so every core gets work
    val left = expanded.select(col(idCol).as("id_a"),
      col("__sh").as("__sa"), col("__band").as("__ba"), col("__probe"),
      pmod(col(idCol), lit(saltBuckets)).as("__salt"))
    val right = expanded.select(col(idCol).as("id_b"),
      col("__sh").as("__sb"), col("__band").as("__bb"), col("__probe"))
      .withColumn("__salt", explode(array((0 until saltBuckets).map(lit(_)): _*)))
    left
      // shuffle-hash: partition the pair work by (probe, salt); a
      // broadcast join would run every pair on the streamed side's
      // few cached partitions
      .hint("shuffle_hash")
      .join(right, Seq("__probe", "__salt"))
      .filter(col("id_a") < col("id_b") &&
        // count each pair once: in the band-pair where probe = max band
        col("__probe") === greatest(col("__ba"), col("__bb")))
      // size prefilter implied by the threshold: J ≥ t ⇒ min/max ≥ t,
      // checked with the same division compare as the final filter
      // (multiplicative t·max rounds differently and can drop
      // exact-boundary pairs)
      .filter(least(size(col("__sa")), size(col("__sb"))).cast("double") /
        greatest(size(col("__sa")), size(col("__sb"))) >= lit(threshold))
      .withColumn("jaccard", jaccardAtLeastKernel(threshold)(col("__sa"), col("__sb")))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
      .distinct()
  }

  // ---- Cross-corpus contamination --------------------------------------

  /**
   * Benchmark-contamination check: for every TEST document, the maximum
   * shingle containment |T∩R|/|T| over all TRAIN documents — the
   * standard train/test-leakage metric (a test doc most of whose
   * shingles appear verbatim in one training doc is contaminated).
   * Returns (test id, max_containment, contaminated).
   *
   * Small shingle universes (the dispatch probe mirrors
   * [[ngramJaccardPairs]]) run a bitmap GRID: test docs are assigned to
   * A-blocks and train docs to B-blocks, every (A,B) tile is one task
   * comparing its bitmaps with popcount-AND — replication is
   * test·B + train·A rows, the two-relation analogue of the all-pairs
   * tiling. Large universes take a token join on shingle hashes with a
   * per-pair group count. Both paths are exact and agree
   * (AdaptivePathPropertiesSpec).
   */
  def contaminationScores(test: DataFrame, train: DataFrame,
                          idCol: String, textCol: String,
                          shingleLen: Int = 5, threshold: Double = 0.5,
                          denseVocabLimit: Int = 1 << 14,
                          blocks: Int = 8): DataFrame = {
    val tPrep = test
      .select(col(idCol), shingleHashes(col(textCol), shingleLen).as("__sh"))
      .filter(size(col("__sh")) > 0).persist()
    val rPrep = train
      .select(col(idCol), shingleHashes(col(textCol), shingleLen).as("__sh"))
      .filter(size(col("__sh")) > 0).persist()
    val toks = tPrep.select(explode(col("__sh")).as("__h"))
      .union(rPrep.select(explode(col("__sh")).as("__h")))
    // the dense grid long-casts BOTH sides' ids
    val vocabOpt = Dispatch.denseVocab(toks, col("__h"),
      Dispatch.integralId(tPrep, idCol) && Dispatch.integralId(rPrep, idCol),
      denseVocabLimit)
    val scores = vocabOpt match {
      case Some(vocab) => denseContainment(tPrep, rPrep, idCol, vocab, blocks)
      case None =>
        val tTok = tPrep.select(col(idCol).as("test_id"),
          size(col("__sh")).as("__tn"), explode(col("__sh")).as("__h"))
        val rTok = rPrep.select(col(idCol).as("__train_id"),
          explode(col("__sh")).as("__h"))
        tTok.hint("shuffle_hash").join(rTok, Seq("__h"))
          .groupBy(col("test_id"), col("__train_id"), col("__tn"))
          .agg(count(lit(1)).as("__cnt"))
          .withColumn("__c", col("__cnt").cast("double") / col("__tn"))
          .groupBy(col("test_id"))
          .agg(max(col("__c")).as("max_containment"))
    }
    // zero-overlap test docs produce no rows on EITHER path (no join
    // match / no populated tile) but still score 0.0 — restore them
    // once here so the paths cannot diverge on the edge
    val orig = tPrep.schema(idCol).dataType
    val aligned = scores.select(col("test_id").cast(orig).as("test_id"),
      col("max_containment"))
    tPrep.select(col(idCol).as("test_id"))
      .join(aligned, Seq("test_id"), "left")
      .withColumn("max_containment",
        coalesce(col("max_containment"), lit(0.0)))
      .withColumn("contaminated", col("max_containment") >= threshold)
  }

  /**
   * SPAN-LEVEL contamination report — the forensic face of
   * [[contaminationScores]]: for every (test, train) pair whose
   * distinct-shingle containment |T∩R|/|T| ≥ threshold, report how
   * much leaked and WHERE in the test document:
   * (test_id, train_id, n_shared, containment,
   * span_start, span_end) — 1-based char positions in the normalized
   * test text of the first/last shingle also present in the train doc
   * (span_end = last start + shingleLen − 1).
   *
   * Same adaptive dispatch as the score pass: small universes take the
   * bitmap grid with a positional membership scan per qualifying pair
   * (the scan only runs AFTER the popcount gate passes, so its cost is
   * per reported pair, not per candidate); large universes take a
   * positional token join with count(DISTINCT) per pair. Paths agree
   * exactly (AdaptivePathPropertiesSpec).
   */
  def contaminationSpans(test: DataFrame, train: DataFrame,
                         idCol: String, textCol: String,
                         shingleLen: Int = 5, threshold: Double = 0.5,
                         denseVocabLimit: Int = 1 << 14,
                         blocks: Int = 8): DataFrame = {
    val posKernel = udf((s: String) =>
      graft.functions.FastHash.shingleHashesByPos(s, shingleLen))
    def norm(c: Column) = lower(regexp_replace(trim(c), "\\s+", " "))
    val tPrep = test
      .select(col(idCol), shingleHashes(col(textCol), shingleLen).as("__sh"),
        posKernel(norm(col(textCol))).as("__ph"))
      .filter(size(col("__sh")) > 0).persist()
    val rPrep = train
      .select(col(idCol), shingleHashes(col(textCol), shingleLen).as("__sh"))
      .filter(size(col("__sh")) > 0).persist()
    val toks = tPrep.select(explode(col("__sh")).as("__h"))
      .union(rPrep.select(explode(col("__sh")).as("__h")))
    val vocabOpt = Dispatch.denseVocab(toks, col("__h"),
      Dispatch.integralId(tPrep, idCol) && Dispatch.integralId(rPrep, idCol),
      denseVocabLimit)
    val orig = tPrep.schema(idCol).dataType
    val pairs = vocabOpt match {
      case Some(vocab) =>
        denseSpans(tPrep, rPrep, idCol, vocab, blocks, shingleLen, threshold)
      case None =>
        val tTok = tPrep.select(col(idCol).as("test_id"),
          size(col("__sh")).as("__tn"),
          posexplode(col("__ph")).as(Seq("__pos0", "__h")))
        val rTok = rPrep.select(col(idCol).as("train_id"),
          explode(col("__sh")).as("__h"))
        tTok.hint("shuffle_hash").join(rTok, Seq("__h"))
          .groupBy(col("test_id"), col("train_id"), col("__tn"))
          .agg(countDistinct(col("__h")).as("n_shared"),
            (min(col("__pos0")) + 1).as("span_start"),
            (max(col("__pos0")) + lit(shingleLen)).as("span_end"))
          .withColumn("containment",
            col("n_shared").cast("double") / col("__tn"))
          .filter(col("containment") >= threshold)
          .select(col("test_id"), col("train_id"), col("n_shared"),
            col("containment"), col("span_start"), col("span_end"))
    }
    pairs.select(col("test_id").cast(orig).as("test_id"),
      col("train_id").cast(orig).as("train_id"),
      col("n_shared"), col("containment"),
      col("span_start").cast("long").as("span_start"),
      col("span_end").cast("long").as("span_end"))
  }

  /** Bitmap-grid span report (small-universe path of
    * [[contaminationSpans]]). Test payloads carry (distinct count,
    * bitmap, per-position vocab indices); train payloads reuse the
    * same shape with an empty position array. */
  private def denseSpans(tPrep: DataFrame, rPrep: DataFrame,
                         idCol: String, vocab: Array[Long], blocks: Int,
                         shingleLen: Int, threshold: Double): DataFrame = {
    val spark = tPrep.sparkSession
    import spark.implicits._
    val (toBits, nWords) = Tiles.bitmapUdf(spark, vocab)
    val vocabB = spark.sparkContext.broadcast(vocab)
    val toIdx = udf((ph: Array[Long]) => {
      val v = vocabB.value
      val out = new Array[Int](ph.length)
      var i = 0
      while (i < ph.length) {
        out(i) = java.util.Arrays.binarySearch(v, ph(i)) // ≥ 0: in vocab
        i += 1
      }
      out
    })
    val t = tPrep.select(col(idCol).cast("long").as("id"),
      struct(size(col("__sh")).as("_1"), toBits(col("__sh")).as("_2"),
        toIdx(col("__ph")).as("_3")).as("p"))
      .as[(Long, (Int, Array[Long], Array[Int]))]
    val r = rPrep.select(col(idCol).cast("long").as("id"),
      struct(size(col("__sh")).as("_1"), toBits(col("__sh")).as("_2"),
        typedLit(Array.emptyIntArray).as("_3")).as("p"))
      .as[(Long, (Int, Array[Long], Array[Int]))]
    Tiles.grid[(Int, Array[Long], Array[Int]),
               (Long, Long, Long, Double, Long, Long)](t, r, blocks) {
      (tests, trains, out) =>
        tests.foreach { case (tid, (tn, tb, posIdx)) =>
          trains.foreach { case (rid, (_, rb, _)) =>
            var inter = 0
            var w = 0
            while (w < nWords) {
              inter += java.lang.Long.bitCount(tb(w) & rb(w))
              w += 1
            }
            val c = inter.toDouble / tn
            // inter > 0 matches the join path, which cannot emit
            // zero-overlap pairs (and keeps the span well-defined)
            if (inter > 0 && c >= threshold) {
              // positional scan only for qualifying pairs
              var first = -1
              var last = -1
              var i = 0
              while (i < posIdx.length) {
                val ix = posIdx(i)
                if (ix >= 0 && (rb(ix >> 6) & (1L << (ix & 63))) != 0L) {
                  if (first < 0) first = i
                  last = i
                }
                i += 1
              }
              out += ((tid, rid, inter.toLong, c,
                (first + 1).toLong, (last + shingleLen).toLong))
            }
          }
        }
    }.toDF("test_id", "train_id", "n_shared", "containment",
      "span_start", "span_end")
  }

  /** Bitmap-grid max containment (small-universe path of
    * [[contaminationScores]]): tiles of (test A-block × train B-block),
    * per-tile local maxima reduced by one tiny final aggregation. */
  private def denseContainment(tPrep: DataFrame, rPrep: DataFrame,
                               idCol: String, vocab: Array[Long],
                               blocks: Int): DataFrame = {
    val spark = tPrep.sparkSession
    import spark.implicits._
    val (toBits, nWords) = Tiles.bitmapUdf(spark, vocab)
    def prep(df: DataFrame) = df.select(
      col(idCol).cast("long").as("id"),
      struct(size(col("__sh")).as("_1"), toBits(col("__sh")).as("_2")).as("p"))
      .as[(Long, (Int, Array[Long]))]
    Tiles.grid[(Int, Array[Long]), (Long, Double)](
      prep(tPrep), prep(rPrep), blocks) { (tests, trains, out) =>
        if (trains.nonEmpty) tests.foreach { case (id, (n, bits)) =>
          var best = 0.0
          var r = 0
          while (r < trains.length) {
            val rb = trains(r)._2._2
            var inter = 0
            var w = 0
            while (w < nWords) {
              inter += java.lang.Long.bitCount(bits(w) & rb(w))
              w += 1
            }
            val c = inter.toDouble / n
            if (c > best) best = c
            r += 1
          }
          out += ((id, best))
        }
    }.groupByKey(_._1)
      .mapGroups { (id, it) => (id, it.map(_._2).max) }
      .toDF("test_id", "max_containment")
  }

  // ---- SimHash ---------------------------------------------------------

  /**
   * 64-bit SimHash over a token array: per token, FastHash.hash64; per
   * bit, sum ±1 across tokens; sign decides the bit. One JIT'd pass.
   */
  def simhash64(tokens: Column): Column = {
    val kernel = udf((toks: Seq[String]) => {
      val sums = new Array[Int](64)
      var i = 0
      while (i < toks.length) {
        val h = FastHash.hash64(toks(i))
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) sums(b) += 1 else sums(b) -= 1
          b += 1
        }
        i += 1
      }
      var out = 0L
      var b = 0
      while (b < 64) {
        if (sums(b) > 0) out |= (1L << b)
        b += 1
      }
      out
    })
    kernel(tokens)
  }

  /**
   * SimHash near-duplicate pairs, adaptive like [[ngramJaccardPairs]]:
   *
   * - Small corpora (≤ `denseLimit` docs) compare signatures
   *   tile-by-tile — docs replicated to `denseBlocks` block-pair tasks
   *   (16-byte rows), each pair one xor+popcount. At large radii on
   *   clustered corpora the TRUE pair count is itself near-quadratic
   *   (every blocking scheme's candidate set contains the output), so
   *   the piece self-join's multi-million-row shuffle+distinct buys
   *   nothing over the direct tiled compare whose kernel is ~4 ops.
   * - Larger corpora block on (maxHamming + 1) bit pieces — by
   *   pigeonhole, a pair with hamming ≤ maxHamming agrees on at least
   *   one piece — then verify bit_count(xor) ≤ maxHamming. Lossless for
   *   any maxHamming ≤ 20 (pieces keep ≥ 3 bits so buckets stay
   *   selective); larger radii are rejected rather than silently losing
   *   recall.
   */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
                   maxHamming: Int = 3, denseLimit: Long = 200000L,
                   denseBlocks: Int = 32): DataFrame = {
    val toks = split(lower(trim(col(textCol))), "\\s+")
    hammingPairs64(
      spreadIdText(df, idCol, textCol)
        .select(col(idCol), simhash64(toks).as("__sig")),
      idCol, "__sig", maxHamming, denseLimit, denseBlocks)
  }

  /**
   * All pairs of 64-bit signatures within `maxHamming` — the shared
   * near-dup kernel under [[simhashPairs]] (text SimHash) and
   * [[graft.ops.Multimodal.imageNearDup]] (perceptual image dHash):
   * any modality that fingerprints to 64 bits dedups through this one
   * dispatch. Lossless pigeonhole piece blocking at selective radii,
   * Afrati–Ullman tiled all-pairs when the corpus is small or the
   * radius so large that blocking degenerates — identical results
   * either path (property-tested on the text face).
   *
   * Output: (id_a, id_b, hamming), id_a < id_b.
   */
  def hammingPairs64(sigsIn: DataFrame, idCol: String, sigCol: String,
                     maxHamming: Int = 3, denseLimit: Long = 200000L,
                     denseBlocks: Int = 32): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 20,
      s"maxHamming must be in [0, 20] for lossless piece blocking, got $maxHamming")
    val sigs = sigsIn.select(col(idCol), col(sigCol).as("__sim"))
      .persist() // consumed by both sides of the block self-join
    // piece blocking is selective when the per-piece bucket space
    // dwarfs the explode factor (small radii: 2^(64/(r+1)) buckets per
    // piece); at large radii buckets are few and the blocked self-join
    // degenerates past the direct tiled compare. Small corpora take
    // the tiles regardless — job overhead dominates either way.
    val pieces0 = maxHamming + 1
    val blockingSelective =
      (1L << math.min(62, 64 / pieces0)) > 2L * pieces0
    val takeDense = Dispatch.integralId(sigs, idCol) && {
      val n = sigs.count()
      n <= denseLimit && (n <= 5000 || !blockingSelective)
    }
    if (takeDense) {
      val orig = sigs.schema(idCol).dataType
      denseSimhashPairs(sigs, idCol, maxHamming, denseBlocks)
        .select(col("id_a").cast(orig).as("id_a"),
          col("id_b").cast(orig).as("id_b"), col("hamming"))
    } else {
      val pieces = maxHamming + 1
      val baseWidth = 64 / pieces
      val remainder = 64 % pieces
      // first `remainder` pieces get baseWidth+1 bits
      val ranges = (0 until pieces).scanLeft((0, 0)) { case ((_, end), i) =>
        val w = baseWidth + (if (i < remainder) 1 else 0)
        (end, end + w)
      }.tail
      val blocks = sigs.select(col(idCol), col("__sim"),
        posexplode(array(ranges.map { case (start, end) =>
          val width = end - start
          val mask = if (width >= 64) -1L else (1L << width) - 1L
          shiftright(col("__sim"), start).bitwiseAND(lit(mask))
        }: _*)).as(Seq("__q", "__qh")))
      blocks.as("a")
        .hint("shuffle_hash") // spread block buckets across cores
        .join(blocks.as("b"),
          col("a.__q") === col("b.__q") && col("a.__qh") === col("b.__qh") &&
            col(s"a.$idCol") < col(s"b.$idCol"))
        .select(col(s"a.$idCol").as("id_a"), col(s"b.$idCol").as("id_b"),
          bit_count(col("a.__sim").bitwiseXOR(col("b.__sim"))).as("hamming"))
        .distinct()
        .filter(col("hamming") <= maxHamming)
    }
  }

  /**
   * Incremental dedup: flag each NEW-batch document against an
   * already-accepted corpus — the shape a continuously-crawled 100 TB
   * pipeline actually runs (dedup the day's batch against the index;
   * never re-pair the corpus against itself). Two stages:
   *
   *   1. exact: md5(content) probe against the corpus hash index
   *      (min corpus id per hash is the canonical representative);
   *   2. near: remaining batch docs meet the corpus through the SAME
   *      lossless rarest-first prefix scheme as [[ngramJaccardPairs]]
   *      (AllPairs/PPJoin), just asymmetric: both sides' prefixes are
   *      ordered by one shared (docfreq, hash) total order — built
   *      over the union, so the order is consistent — the prefix join
   *      crosses sides only, the positional upper bound discards
   *      hopeless candidates losslessly, and survivors verify with
   *      the exact merge-intersection kernel. A raw postings join
   *      (every shared shingle a row) measured 26 s at sf0.1 —
   *      corpus-common shingles explode it quadratically; prefixes
   *      keep only each doc's rarest (1−t)·n+2 tokens in the join.
   *
   * Jaccard is one double division of exact integer intersection /
   * union counts — engine-exact. `dup_of` is the smallest matching
   * corpus id (exact stage wins over near), deterministic at any
   * layout. Intra-batch duplicates are out of scope by design (run
   * [[exactDupGroups]] within the batch for that).
   *
   * Output: one row per batch doc —
   * (idCol, status ∈ exact_dup|near_dup|unique, dup_of).
   */
  def incrementalDedup(corpus: DataFrame, batch: DataFrame, idCol: String,
                       textCol: String, shingleLen: Int = 5,
                       threshold: Double = 0.8,
                       denseVocabLimit: Int = 1 << 14,
                       denseBlocks: Int = 32): DataFrame = {
    require(threshold > 0 && threshold <= 1, s"threshold: $threshold")
    val hashIdx = corpus
      .select(md5(col(textCol).cast("binary")).as("__h"),
        col(idCol).as("__cid"))
      .groupBy(col("__h")).agg(min(col("__cid")).as("__exact"))
    // persisted like ngramJaccardPairs' prepared frame: b0 feeds the
    // dispatch probe, the near stage AND the final status join, and
    // preparedC feeds probe + encode + verify — without the barrier
    // the md5 index join and the shingle kernel re-run per consumer
    val b0 = batch
      .select(col(idCol), col(textCol), md5(col(textCol).cast("binary")).as("__h"))
      .join(hashIdx, Seq("__h"), "left")
      .persist()
    val preparedB = b0.filter(col("__exact").isNull)
      .select(col(idCol).as("__bid"),
        shingleHashes(col(textCol), shingleLen).as("__sh"))
      .filter(size(col("__sh")) > 0)
      .persist()
    val preparedC = corpus
      .select(col(idCol).as("__cid"),
        shingleHashes(col(textCol), shingleLen).as("__sh"))
      .filter(size(col("__sh")) > 0)
      .persist()
    // same adaptive dispatch as ngramJaccardPairs: a small shared
    // shingle universe makes prefixes structurally useless (every
    // prefix token is corpus-common) while bitmap tiles are cheap
    val idOk = Dispatch.integralId(preparedB, "__bid") &&
      Dispatch.integralId(preparedC, "__cid")
    val toksU = preparedB.select(explode(col("__sh")).as("__h"))
      .unionAll(preparedC.select(explode(col("__sh")).as("__h")))
    val pairs =
      Dispatch.denseVocab(toksU, col("__h"), idOk, denseVocabLimit) match {
        case Some(vocab) =>
          val origB = preparedB.schema("__bid").dataType
          val origC = preparedC.schema("__cid").dataType
          denseAsymmetricNearPairs(preparedB, preparedC, threshold,
            vocab, denseBlocks)
            .select(col("__bid").cast(origB).as("__bid"),
              col("__cid").cast(origC).as("__cid"))
        case None => asymmetricNearPairs(preparedB, preparedC, threshold)
      }
    val near = pairs
      .groupBy(col("__bid")).agg(min(col("__cid")).as("__near"))
    b0.join(near, col(idCol) === col("__bid"), "left")
      .select(col(idCol),
        when(col("__exact").isNotNull, lit("exact_dup"))
          .when(col("__near").isNotNull, lit("near_dup"))
          .otherwise(lit("unique")).as("status"),
        coalesce(col("__exact"), col("__near")).as("dup_of"))
  }

  /** Small-universe asymmetric near-dup: bitmap-encode both sides over
    * the shared vocabulary and run the bipartite block grid
    * ([[Tiles.grid]]) — popcount-AND kernel per (batch, corpus) pair
    * with the length-ratio prefilter, exactly the asymmetric face of
    * [[denseJaccardPairs]]. Output (__bid, __cid) as longs. */
  private def denseAsymmetricNearPairs(preparedB: DataFrame,
                                       preparedC: DataFrame,
                                       threshold: Double,
                                       vocab: Array[Long],
                                       blocks: Int): DataFrame = {
    val spark = preparedB.sparkSession
    import spark.implicits._
    val (toBits, nWords) = Tiles.bitmapUdf(spark, vocab)
    val t = threshold
    def enc(df: DataFrame, id: String) = df.select(
      col(id).cast("long").as("id"),
      struct(size(col("__sh")).as("_1"), toBits(col("__sh")).as("_2")).as("p"))
      .as[(Long, (Int, Array[Long]))]
    Tiles.grid[(Int, Array[Long]), (Long, Long)](
      enc(preparedB, "__bid"), enc(preparedC, "__cid"), blocks) {
      case (ls, rs, out) =>
        ls.foreach { case (bid, (na, ba)) =>
          rs.foreach { case (cid, (nb, bb)) =>
            if (math.min(na, nb).toDouble / math.max(na, nb) >= t) {
              var inter = 0
              var w = 0
              while (w < nWords) {
                inter += java.lang.Long.bitCount(ba(w) & bb(w))
                w += 1
              }
              if (inter.toDouble / (na + nb - inter) >= t)
                out += ((bid, cid))
            }
          }
        }
    }.toDF("__bid", "__cid")
  }

  /**
   * Cross-side AllPairs/PPJoin: prefix candidates between a batch side
   * (`__bid`, `__sh`) and a corpus side (`__cid`, `__sh`) under ONE
   * shared (docfreq, hash) order built over the union of both sides —
   * the losslessness of the prefix scheme needs a total order both
   * sides agree on, nothing more. Mirrors [[prefixJaccardPairs]] step
   * for step (prefix length n − ⌈t·n⌉ + 2, positional upper bound with
   * the same division compare, exact merge-kernel verify); differs
   * only in joining across sides instead of `id_a < id_b`, and no
   * persist — each prefix frame feeds exactly one join.
   * Output: (__bid, __cid) with exact Jaccard ≥ threshold.
   */
  private def asymmetricNearPairs(preparedB: DataFrame, preparedC: DataFrame,
                                  threshold: Double): DataFrame = {
    val prefixKernel = udf((ch: Seq[Long], hh: Seq[Long]) => {
      val n = ch.length
      val keys = new Array[(Long, Long)](n)
      var i = 0
      while (i < n) { keys(i) = (ch(i), hh(i)); i += 1 }
      java.util.Arrays.sort(keys, implicitly[Ordering[(Long, Long)]])
      val p = math.max(1, math.min(n - math.ceil(threshold * n).toInt + 2, n))
      Array.tabulate(p)(i => (i, keys(i)._2, n))
    })
    val bt = preparedB.select(col("__bid"), explode(col("__sh")).as("__h"))
    val ct = preparedC.select(col("__cid"), explode(col("__sh")).as("__h"))
    val freqs = bt.select(col("__h")).unionAll(ct.select(col("__h")))
      .groupBy(col("__h")).agg(count(lit(1)).as("__c"))
    def prefixes(toks: DataFrame, id: String) = toks
      .hint("shuffle_hash")
      .join(freqs, Seq("__h"))
      .groupBy(col(id))
      .agg(collect_list(col("__c")).as("__cs"),
        collect_list(col("__h")).as("__hs"))
      .select(col(id), explode(prefixKernel(col("__cs"), col("__hs"))).as("__p"))
      .select(col(id), col("__p._1").as("__pos"), col("__p._2").as("__h"),
        col("__p._3").as("__n"))
    val candidates = prefixes(bt, "__bid").as("a")
      .hint("shuffle_hash")
      .join(prefixes(ct, "__cid").as("b"), col("a.__h") === col("b.__h"))
      .groupBy(col("a.__bid").as("__bid"), col("b.__cid").as("__cid"),
        col("a.__n").as("__na"), col("b.__n").as("__nb"))
      .agg(count(lit(1)).as("__cnt"),
        max(col("a.__pos")).as("__pa"), max(col("b.__pos")).as("__pb"))
      .withColumn("__maxi",
        least(
          col("__cnt") +
            least(col("__na") - 1 - col("__pa"), col("__nb") - 1 - col("__pb")),
          least(col("__na"), col("__nb"))))
      .filter(col("__maxi") > 0 &&
        col("__maxi").cast("double") /
          (col("__na") + col("__nb") - col("__maxi")) >= lit(threshold))
      .select(col("__bid"), col("__cid"))
    candidates
      .join(preparedB.withColumnRenamed("__sh", "__sa"), Seq("__bid"))
      .join(preparedC.withColumnRenamed("__sh", "__sb"), Seq("__cid"))
      .filter(least(size(col("__sa")), size(col("__sb"))).cast("double") /
        greatest(size(col("__sa")), size(col("__sb"))) >= lit(threshold))
      .withColumn("__j",
        jaccardAtLeastKernel(threshold)(col("__sa"), col("__sb")))
      .filter(col("__j") >= threshold)
      .select(col("__bid"), col("__cid"))
  }

  /** Tiled all-pairs hamming compare over 64-bit signatures (the
    * small-corpus / large-radius regime of [[simhashPairs]]); same
    * Afrati–Ullman block-pair replication as the dense Jaccard path. */
  private def denseSimhashPairs(sigs: DataFrame, idCol: String,
                                maxHamming: Int, blocks: Int): DataFrame = {
    val spark = sigs.sparkSession
    import spark.implicits._
    val r = maxHamming
    val docs = sigs.select(col(idCol).cast("long").as("id"), col("__sim"))
      .as[(Long, Long)]
    Tiles.selfPairs[Long, (Long, Long, Int)](docs, blocks) {
      case ((ida, sa), (idb, sb), out) =>
        val d = java.lang.Long.bitCount(sa ^ sb)
        if (d <= r) {
          if (ida < idb) out += ((ida, idb, d)) else out += ((idb, ida, d))
        }
    }.toDF("id_a", "id_b", "hamming")
  }

  // ---- persisted MinHash-LSH index (the near-dup storage face) ---------

  /**
   * Persist a MinHash-LSH index of a corpus — the near-duplicate
   * sibling of [[graft.ops.Retrieval.saveBm25Index]] and
   * `Similarity.saveIvfPqIndex`: shingle/minhash/band 100 TB ONCE, then
   * dedup every future crawl batch against the saved layout instead of
   * re-preparing the corpus per run ([[incrementalDedup]] recomputes
   * corpus shingles on each call; this is its amortized face).
   *
   * Layout:
   *  - `bands/` — (id, bh) hive-partitioned by `band` (the probe join
   *    co-partitions by construction) with a parquet bloom filter on
   *    `bh` (band hashes are uniform — min/max stats prune nothing;
   *    the bloom answers "this row group has no such bucket" for the
   *    pushed-down probe keys);
   *  - `sets/` — (id, sorted shingle-hash array) with a bloom on `id`
   *    for the verification fetch;
   *  - `meta/` — one row of (shingle_len, num_hashes, bands, seed):
   *    probes MUST hash identically, so they read the params rather
   *    than trust the caller to repeat them.
   */
  def saveMinhashIndex(df: DataFrame, idCol: String, textCol: String,
                       path: String, shingleLen: Int = 5,
                       numHashes: Int = 128, bands: Int = 32,
                       seed: Long = 42L,
                       bhNdvPerGroup: Long = 1L << 17): Unit = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    // the delete lifecycle matches ids through a long cast — lossy
    // (silent purge no-op) for non-integral ids; refuse to build an
    // unpurgeable index (r10 advice, the BM25 sibling check)
    require(graft.ops.Similarity.integralType(df.schema(idCol).dataType),
      s"saveMinhashIndex requires an integral id column, got " +
        s"${df.schema(idCol).dataType}: tombstone/compact match ids " +
        "through a long cast, which is lossy for any other type")
    val spark = df.sparkSession
    import spark.implicits._
    val rows = numHashes / bands
    val prepared = df
      .select(col(idCol), shingleHashes(col(textCol), shingleLen).as("__shh"))
      .filter(size(col("__shh")) > 0)
      .withColumn("__bands",
        bandHashes(minhashSignatureFromHashes(col("__shh"), numHashes, seed),
          bands, rows))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    prepared
      .select(col(idCol), posexplode(col("__bands")).as(Seq("band", "bh")))
      .repartition(col("band"))
      .write.mode("overwrite").partitionBy("band")
      .option("parquet.bloom.filter.enabled#bh", "true")
      .option("parquet.bloom.filter.expected.ndv#bh", bhNdvPerGroup.toString)
      .parquet(s"$path/bands")
    prepared.select(col(idCol), col("__shh"))
      .write.mode("overwrite")
      .option("parquet.bloom.filter.enabled#" + idCol, "true")
      .parquet(s"$path/sets")
    Seq((shingleLen, numHashes, bands, seed))
      .toDF("shingle_len", "num_hashes", "bands", "seed")
      .repartition(1).write.mode("overwrite").parquet(s"$path/meta")
    prepared.unpersist()
  }

  /**
   * Append a document batch to a [[saveMinhashIndex]] layout — the
   * crawl-loop completion of the index: probe the batch
   * ([[minhashProbeIndexed]]), keep the novel docs, then append THEM
   * so the next batch dedups against the grown corpus, never
   * re-shingling what is already indexed. The batch is prepared with
   * the SAVED params (meta read, exactly like the probe — appended
   * rows are bit-identical to what a full rebuild would have written),
   * its band rows land as new files inside the existing `band=N`
   * partition directories with the same bloom-filter options, and its
   * shingle sets append to `sets/`. `meta/` is untouched — the hash
   * params are immutable for the index's lifetime. Appending an id
   * that is already indexed simply duplicates its rows (probes then
   * report it twice); keep ids unique upstream.
   */
  def appendMinhashIndex(df: DataFrame, idCol: String, textCol: String,
                         path: String,
                         bhNdvPerGroup: Long = 1L << 17): Unit = {
    val spark = df.sparkSession
    import spark.implicits._
    val (shingleLen, numHashes, bands, seed) =
      spark.read.parquet(s"$path/meta")
        .select(col("shingle_len").cast("int"),
          col("num_hashes").cast("int"), col("bands").cast("int"),
          col("seed").cast("long"))
        .as[(Int, Int, Int, Long)].head()
    val rows = numHashes / bands
    val prepared = df
      .select(col(idCol), shingleHashes(col(textCol), shingleLen).as("__shh"))
      .filter(size(col("__shh")) > 0)
      .withColumn("__bands",
        bandHashes(minhashSignatureFromHashes(col("__shh"), numHashes, seed),
          bands, rows))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    prepared
      .select(col(idCol), posexplode(col("__bands")).as(Seq("band", "bh")))
      .repartition(col("band"))
      .write.mode("append").partitionBy("band")
      .option("parquet.bloom.filter.enabled#bh", "true")
      .option("parquet.bloom.filter.expected.ndv#bh", bhNdvPerGroup.toString)
      .parquet(s"$path/bands")
    prepared.select(col(idCol), col("__shh"))
      .write.mode("append")
      .option("parquet.bloom.filter.enabled#" + idCol, "true")
      .parquet(s"$path/sets")
    prepared.unpersist()
  }

  /**
   * Tombstone indexed documents — the delete face of the index
   * (right-to-be-forgotten without rewriting band/sets files, which
   * are append-only by design): the ids land in `<path>/tombstones`
   * and every subsequent [[minhashProbeIndexed]] excludes them from
   * its candidate set, so deleted documents can never re-link. A
   * re-appended id stays dead while its tombstone stands (resurrect by
   * compacting first — [[compactMinhashIndex]] physically erases the
   * dead rows and clears the list, after which the id is simply absent
   * and a fresh append of it is a new document). The lifecycle mirrors
   * the snapshot store's deleteCommit-then-vacuum sequence.
   */
  def tombstoneMinhashIndex(ids: DataFrame, idCol: String,
                            path: String): Unit = {
    // fail-fast (r10 advice): a non-integral purge id casts to null,
    // matches nothing, and compaction then discards the tombstone
    // list — the purge intent would be lost SILENTLY
    require(graft.ops.Similarity.integralType(ids.schema(idCol).dataType),
      s"tombstoneMinhashIndex requires an integral id column, got " +
        s"${ids.schema(idCol).dataType}: tombstones match through a " +
        "long cast, which yields null (matches nothing) otherwise")
    ids.select(col(idCol).cast("long").as("__cid")).distinct()
      .write.mode("append").parquet(s"$path/tombstones")
  }

  /** True iff any of `ids` is present in the index (its sets table) —
    * `forgetEverywhere`'s pre-flight: an idempotent purge RE-RUN (the
    * scheduled-compliance pattern) skips the family's tombstone write
    * and compaction rebuild when nothing matches, costing a probe
    * instead of an index rewrite. Loud on a MISSING layout
    * ([[Layout.readParquetIfData]]); a valid-empty index reads as
    * nothing-live. */
  def minhashAnyLive(ids: DataFrame, idCol: String,
                     path: String): Boolean = {
    val spark = ids.sparkSession
    Layout.readParquetIfData(spark, s"$path/sets").exists { sets =>
      val sid = sets.schema.fields.filterNot(_.name == "__shh").head.name
      !sets.select(col(sid).cast("long").as("__cid"))
        .join(ids.select(col(idCol).cast("long").as("__cid")).distinct(),
          Seq("__cid"), "left_semi").isEmpty
    }
  }

  /** The bands table of a [[saveMinhashIndex]] layout, schema-safe
    * when the directory holds no data files — the state a compaction
    * of a fully-tombstoned index leaves (a partitioned zero-row write
    * emits only _SUCCESS, and schema inference over it throws). The
    * empty schema derives from `sets/` (unpartitioned, so its footer
    * survives even a zero-row rewrite) plus the fixed band columns. */
  private def bandsOrEmpty(spark: org.apache.spark.sql.SparkSession,
                           path: String): DataFrame =
    Layout.readParquetIfData(spark, s"$path/bands").getOrElse {
      val idField = spark.read.parquet(s"$path/sets")
        .schema.fields.filterNot(_.name == "__shh").head
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType(Seq(
          idField,
          org.apache.spark.sql.types.StructField("bh",
            org.apache.spark.sql.types.IntegerType),
          org.apache.spark.sql.types.StructField("band",
            org.apache.spark.sql.types.IntegerType))))
    }

  /** Tombstoned ids of an index (empty frame if none were ever
    * written). */
  def minhashTombstones(spark: org.apache.spark.sql.SparkSession,
                        path: String): DataFrame = {
    import spark.implicits._
    val p = new org.apache.hadoop.fs.Path(s"$path/tombstones")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) spark.read.parquet(s"$path/tombstones").distinct()
    else Seq.empty[Long].toDF("__cid")
  }

  /**
   * Compact a [[saveMinhashIndex]] layout: physically ERASE tombstoned
   * documents from `bands/` and `sets/` (the vacuum step completing
   * the tombstone lifecycle — probes already excluded them logically)
   * and fold the append-accumulated small files back into one file per
   * band partition. Each directory is rewritten beside itself and
   * promoted with [[graft.ops.Layout.atomicSwap]]; the swap ORDER
   * (bands, then sets, then the tombstone list) keeps every crash
   * window consistent — a compacted bands dir with an uncompacted sets
   * dir merely carries unreachable set rows, and the tombstone list is
   * only dropped once nothing it names remains. `meta/` (the immutable
   * hash geometry) is untouched, so probes and appends keep working
   * across the compaction unchanged.
   */
  def compactMinhashIndex(spark: org.apache.spark.sql.SparkSession,
                          path: String,
                          bhNdvPerGroup: Long = 1L << 17): Unit = {
    val sets = spark.read.parquet(s"$path/sets")
    val idCol = sets.columns.filterNot(_ == "__shh").head
    val tomb = minhashTombstones(spark, path)
      .withColumnRenamed("__cid", "__tomb")
    val bands = bandsOrEmpty(spark, path)
    bands
      .join(tomb, col(idCol).cast("long") === col("__tomb"), "left_anti")
      .repartition(col("band"))
      .write.mode("overwrite").partitionBy("band")
      .option("parquet.bloom.filter.enabled#bh", "true")
      .option("parquet.bloom.filter.expected.ndv#bh", bhNdvPerGroup.toString)
      .parquet(s"$path/bands.__compact")
    Layout.atomicSwap(spark, s"$path/bands.__compact", s"$path/bands")
    sets
      .join(tomb, col(idCol).cast("long") === col("__tomb"), "left_anti")
      .write.mode("overwrite")
      .option("parquet.bloom.filter.enabled#" + idCol, "true")
      .parquet(s"$path/sets.__compact")
    Layout.atomicSwap(spark, s"$path/sets.__compact", s"$path/sets")
    val tp = new org.apache.hadoop.fs.Path(s"$path/tombstones")
    tp.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(tp, true)
  }

  /**
   * Probe a new batch against a [[saveMinhashIndex]] layout: for each
   * batch doc, every indexed corpus doc sharing an LSH band bucket,
   * verified with exact Jaccard ≥ `jaccardThreshold`.
   *
   * Scale shape (the incremental-crawl asymmetry, never corpus×corpus):
   *  1. the batch is prepared with the SAVED params (meta read);
   *  2. the index scan is prefiltered by a budget-gated driver Bloom
   *     over the batch's (band, bh) keys — built on the batch side
   *     (small by definition of the shape) and applied BELOW the index
   *     scan's exchange, the [[graft.ops.BloomJoin]] contract — so
   *     corpus band rows that cannot match never shuffle; batches too
   *     big for the budget fall back to the plain co-partitioned join;
   *  3. candidate (batch, corpus) pairs fetch corpus shingle sets from
   *     `sets/` (Bloom-prefiltered on id the same way) and verify with
   *     the exact merge-intersection kernel.
   *
   * Returns (batch_id, corpus_id, jaccard) — every qualifying pair, so
   * the caller picks min/best per its own survivor policy.
   */
  /** Probe size (in exploded band rows) at or below which the band
    * hashes are collected and pushed down as an IN literal — ~300 docs
    * at 32 bands; the "is this handful of docs already indexed" shape. */
  val pushdownKeyLimit: Long = 10000L

  def minhashProbeIndexed(spark: org.apache.spark.sql.SparkSession,
                          path: String, batch: DataFrame, idCol: String,
                          textCol: String, jaccardThreshold: Double,
                          maxBloomKeys: Long = 10L * 1000 * 1000,
                          pushdownLimit: Long = pushdownKeyLimit): DataFrame = {
    import spark.implicits._
    val meta = spark.read.parquet(s"$path/meta")
      .select(col("shingle_len").cast("int"), col("num_hashes").cast("int"),
        col("bands").cast("int"), col("seed").cast("long"))
      .as[(Int, Int, Int, Long)].head()
    val (shingleLen, numHashes, nBands, seed) = meta
    val rows = numHashes / nBands
    // one long key packs (band, 32-bit band hash) for the bloom/join
    def packed(band: Column, bh: Column): Column =
      band.cast("long") * lit(4294967296L) +
        (bh.cast("long") bitwiseAND lit(0xFFFFFFFFL))
    val bprep = batch
      .select(col(idCol).as("__bid"),
        shingleHashes(col(textCol), shingleLen).as("__bsh"))
      .filter(size(col("__bsh")) > 0)
      .withColumn("__bands",
        bandHashes(minhashSignatureFromHashes(col("__bsh"), numHashes, seed),
          nBands, rows))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val bBands = bprep
      .select(col("__bid"),
        posexplode(col("__bands")).as(Seq("band", "bh")))
      .withColumn("__k", packed(col("band"), col("bh")))
    // point-lookup fast path: a small probe's band hashes become a
    // pushed-down IN literal, so the parquet bloom filters on bh skip
    // whole row groups (min/max stats are useless on uniform hashes —
    // this is what the blooms were written for) and no driver Bloom is
    // needed on top (the scan is already key-filtered). The size test
    // is collect-with-limit — ONE job instead of a count plus a
    // second collect, keeping the point-lookup path low-latency.
    val iBandsRaw = bandsOrEmpty(spark, path)
    val bhProbe = bprep.select(explode(col("__bands")).as("bh"))
      .distinct().limit(pushdownLimit.toInt + 1).collect()
    val smallProbe = bhProbe.length <= pushdownLimit
    val iBands =
      (if (smallProbe) iBandsRaw.filter(col("bh").isin(bhProbe.map(_.getInt(0)).toSeq: _*))
       else iBandsRaw)
        .withColumn("__k", packed(col("band"), col("bh")))
        .select(col(idCol).cast("long").as("__cid"), col("__k"))
    val joined =
      if (smallProbe)
        iBands.join(bBands.select(col("__k"), col("__bid")), Seq("__k"))
      else {
        // row count, not distinct — BloomJoin's build budget is row-based
        val keyCount = bBands.count()
        if (keyCount > 0 && keyCount <= maxBloomKeys)
          BloomJoin.prefiltered(iBands,
            bBands.select(col("__k"), col("__bid")), "__k")
        else iBands.hint("shuffle_hash")
          .join(bBands.select(col("__k"), col("__bid")), Seq("__k"))
      }
    // tombstoned corpus docs are dead to the probe (delete face); the
    // tombstone set is id-cardinality-bounded and the anti-join rides
    // the same candidate frame every downstream stage reads
    val candidates = joined.select(col("__bid"), col("__cid")).distinct()
      .join(minhashTombstones(spark, path), Seq("__cid"), "left_anti")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val sets = spark.read.parquet(s"$path/sets")
      .select(col(idCol).cast("long").as("__cid"),
        col("__shh").as("__csh"))
    // same collect-with-limit discipline for the verification fetch:
    // a small candidate set becomes a pushed-down IN on the sets
    // table's id (rides its bloom filter); big ones build the driver
    // Bloom; over-budget ones join plain
    val cids = candidates.select(col("__cid")).distinct()
    val cidProbe = cids.limit(pushdownLimit.toInt + 1).collect()
    val corpusSets =
      if (cidProbe.length <= pushdownLimit)
        sets.filter(col("__cid").isin(cidProbe.map(_.getLong(0)).toSeq: _*))
      else {
        val nCids = cids.count()
        if (nCids <= maxBloomKeys) BloomJoin.prefiltered(sets, cids, "__cid")
        else sets.join(cids, Seq("__cid"))
      }
    // bprep/candidates stay cached until the caller's action completes;
    // release is caller-owned (Bench clears caches between reps), the
    // bm25TopK convention
    candidates
      .join(corpusSets, Seq("__cid"))
      .join(bprep.select(col("__bid"), col("__bsh")), Seq("__bid"))
      .withColumn("jaccard", jaccardKernel(col("__bsh"), col("__csh")))
      .filter(col("jaccard") >= jaccardThreshold)
      .select(col("__bid").as("batch_id"), col("__cid").as("corpus_id"),
        col("jaccard"))
  }
}
