package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/**
 * Sequence packing for LLM training corpora: concatenate documents in
 * a deterministic order and chunk the resulting token stream into
 * fixed-length training sequences (the standard GPT-style pretraining
 * layout — documents may span sequence boundaries). A 100 TB corpus is
 * trillions of tokens, so the global token offset of each document is
 * the scale-sensitive part; it is computed as a DISTRIBUTED exclusive
 * prefix sum, never a single-partition window.
 */
object Packing {

  /**
   * Exclusive prefix sum of `weightCol` in `orderCol` order, added as
   * `cumCol` (LongType). The classic two-pass construction:
   *
   *   1. range-repartition + sort within partitions by `orderCol`, so
   *      partition i holds a contiguous ordered slice, then persist —
   *      the barrier guarantees pass 2 sees the SAME layout (range
   *      boundaries come from sampling; an unpersisted plan could
   *      re-sample between jobs). Same reasoning as
   *      `Merger.withDistributedRank`.
   *   2. per-partition weight totals (one tiny collect, ≤ nParts
   *      rows), driver-side prefix sum into partition base offsets,
   *      then one shuffle-FREE mapPartitions pass that streams each
   *      sorted partition with a running sum seeded at its base.
   *
   * A `Window.partitionBy(pid)` would re-shuffle the full data by pid
   * hash; the mapPartitions pass reuses the range layout directly —
   * per-partition imperative streaming is exactly what the row
   * iterator is for here.
   *
   * `orderCol` must be a unique key (ties within a partition would
   * make the running order, and thus the prefix sums, run-dependent).
   * Null weights count as 0 (the row occupies no stream positions but
   * still gets its offset) — coalesced at the cast so the streaming
   * pass never unboxes a null.
   *
   * Cache contract (caller-owned, like [[TextDedup]]): the ranged
   * layout stays persisted because the returned plan reads it; callers
   * running many pipelines in one session should
   * `spark.catalog.clearCache()` between them (as Verify/Bench do) or
   * rely on LRU eviction (costs recompute, never correctness).
   */
  def withPrefixSum(df: DataFrame, orderCol: String, weight: Column,
                    cumCol: String): DataFrame = {
    val spark = df.sparkSession
    val nParts = spark.conf.get("spark.sql.shuffle.partitions", "32").toInt
    // `spark_partition_id()` is stamped BEFORE persist, so the pid
    // VALUES are baked into the cache when pass 1 materializes it
    // under genuine shuffle tasks. Pass 2 must read pids from the
    // rows, NEVER from TaskContext: a downstream `coalesce(1)` (or
    // any partition-collapsing parent) re-runs the closure with a
    // different task partition id, while row-carried pids stay true.
    val ranged = df
      .withColumn("__w", coalesce(weight.cast(LongType), lit(0L)))
      .repartitionByRange(nParts, col(orderCol).asc)
      .sortWithinPartitions(col(orderCol).asc)
      .withColumn("__pid", spark_partition_id())
      .persist()
    val totals = ranged.groupBy(col("__pid"))
      .agg(sum(col("__w")).as("__tot")).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val bases = new Array[Long](nParts + 1)
    var i = 0
    while (i < nParts) {
      bases(i + 1) = bases(i) + totals.getOrElse(i, 0L)
      i += 1
    }
    val bcBases = spark.sparkContext.broadcast(bases)
    val outSchema = StructType(
      ranged.schema.fields.filterNot(f => f.name == "__w" || f.name == "__pid")
        :+ StructField(cumCol, LongType, nullable = false))
    val wIdx = ranged.schema.fieldIndex("__w")
    val pIdx = ranged.schema.fieldIndex("__pid")
    val keep = ranged.schema.fields.indices
      .filterNot(i => i == wIdx || i == pIdx).toArray
    ranged.mapPartitions { it =>
      val bs = bcBases.value
      var cur = -1
      var run = 0L
      it.map { r =>
        // partitions arrive contiguously even when a parent collapses
        // several of them into one closure invocation — reset the
        // running sum at every pid change
        val pid = r.getInt(pIdx)
        if (pid != cur) { cur = pid; run = bs(pid) }
        val w = r.getLong(wIdx)
        val out = Row.fromSeq(keep.map(r.get).toSeq :+ run)
        run += w
        out
      }
    }(RowEncoder.encoderFor(outSchema))
  }

  /**
   * Pack documents into fixed-capacity training sequences: documents
   * are laid out in `idCol` order as one continuous token stream and
   * cut every `seqLen` tokens; a document overlapping k sequences
   * yields k rows. Output: (id, seq_id, doc_start, n_toks) where
   * `doc_start` is the 0-based token index INSIDE the document where
   * the slice begins — exactly the index map a data loader needs to
   * materialize sequence `seq_id`. All arithmetic is integer (`DIV`),
   * so results are engine-exact. Empty documents carry no tokens and
   * are dropped (they occupy no stream positions).
   */
  def packSequences(docs: DataFrame, idCol: String, textCol: String,
                    seqLen: Int): DataFrame = {
    require(seqLen > 0, s"seqLen must be positive, got $seqLen")
    val withN = docs
      .select(col(idCol),
        TextAnalysis.tokenCount(col(textCol)).cast(LongType).as("n_toks_doc"))
      .filter(col("n_toks_doc") > 0)
    val cum = withPrefixSum(withN, idCol, col("n_toks_doc"), "__off")
    val L = lit(seqLen.toLong)
    cum
      .withColumn("seq_id", explode(sequence(
        expr(s"__off DIV $seqLen"),
        expr(s"(__off + n_toks_doc - 1) DIV $seqLen"))))
      .select(col(idCol), col("seq_id").cast(LongType).as("seq_id"),
        greatest(lit(0L), col("seq_id") * L - col("__off")).as("doc_start"),
        (least((col("seq_id") + 1) * L - col("__off"), col("n_toks_doc"))
          - greatest(lit(0L), col("seq_id") * L - col("__off"))).as("n_toks"))
  }

  /**
   * Deterministic global shuffle — training-order randomization:
   * every row gets a dense position 0..n-1 in the order of a
   * content-derived pseudorandom key (md5 of id + salt), so the
   * "shuffled" order is reproducible across runs, clusters, and
   * partition counts, and changes wholesale with the salt. The id is
   * zero-padded INTO the sort key, making it total even under digest
   * ties. Rank is `Merger.withDistributedRank` — never a
   * single-partition window.
   */
  def shufflePositions(df: DataFrame, idCol: String,
                       salt: String): DataFrame = {
    val keyed = df.withColumn("__skey",
      concat(md5(concat(col(idCol).cast("string"), lit(":" + salt))),
        lpad(col(idCol).cast("string"), 20, "0")))
    graft.operators.Merger
      .withDistributedRank(keyed, "__skey", "pos", -1L)
      .drop("__skey")
  }

  /**
   * Per-sequence occupancy report over `packSequences` output — the
   * sanity view a pipeline operator watches: every sequence must hold
   * exactly `seqLen` tokens except the ragged last one.
   */
  def packStats(packed: DataFrame): DataFrame =
    packed.groupBy(col("seq_id"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_toks")).as("n_toks"))

  /**
   * Tag every row with its TRAINING SHARD: dense [[shufflePositions]]
   * order chopped into `docsPerShard`-sized contiguous blocks — the
   * loader-facing unit (epoch k streams shard files in order; shard
   * membership is reproducible across runs/clusters/partition counts
   * and reshuffles wholesale with the salt). Output: input + `pos` +
   * `shard`.
   */
  def shardPositions(df: DataFrame, idCol: String, salt: String,
                     docsPerShard: Long): DataFrame = {
    require(docsPerShard >= 1, s"docsPerShard must be >= 1: $docsPerShard")
    shufflePositions(df, idCol, salt)
      .withColumn("shard", (col("pos") / docsPerShard).cast("long"))
  }

  /**
   * Materialize [[shardPositions]] as a shard-partitioned layout:
   * `<path>/shard=K/` holds exactly the rows of shard K in ONE file —
   * `repartition(col)` routes every row of a shard to one partition,
   * and the hive writer emits one file per (partition, shard) pair, so
   * a training loader maps shard → file 1:1. Rows inside a shard carry
   * `pos` for in-shard ordering (parquet row order is not a contract).
   */
  def writeShards(df: DataFrame, idCol: String, path: String,
                  salt: String, docsPerShard: Long): Unit =
    shardPositions(df, idCol, salt, docsPerShard)
      .repartition(col("shard"))
      .write.mode("overwrite").partitionBy("shard").parquet(path)

  /**
   * Curriculum interleave: a deterministic total training order that
   * is (a) easiest-first WITHIN each domain (ascending `scoreCol`,
   * ties to the smaller id) and (b) round-robin ACROSS domains, so no
   * early training window is dominated by one domain — the standard
   * curriculum-plus-domain-balance ordering, assigned in CLOSED FORM:
   * `global_pos = (rank_in_domain − 1) · nDomains + domain_index`
   * (domains indexed in lexicographic order). Injective by
   * construction; positions of exhausted domains leave gaps, which is
   * fine — consumers order by `global_pos` (or feed it to
   * [[shardPositions]]-style sharding), they never need contiguity.
   *
   * 100 TB shape: one per-domain window (partitioned — never a global
   * sort) plus a broadcast join against the tiny domain-index table.
   * The total order EXISTS without ever being materialized by a
   * global sort; writers range-partition on `global_pos` when laying
   * out shards.
   *
   * Output: input columns + (domain_idx, domain_rank, global_pos).
   */
  def curriculumInterleave(df: DataFrame, idCol: String,
                           domainCol: String,
                           scoreCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    // the domain table is bounded (the unimaxAllocation assumption),
    // so index it driver-side — a row_number window over it would be
    // a single-task funnel the plan audit rightly rejects
    val doms = df.select(col(domainCol).cast("string"))
      .filter(col(domainCol).isNotNull)
      .distinct().as[String].collect().sorted
    val n = doms.length.toLong
    val idx = doms.zipWithIndex.toSeq.toDF(domainCol, "domain_idx")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(domainCol))
      .orderBy(col(scoreCol).asc, col(idCol).asc)
    df.filter(col(domainCol).isNotNull)
      .join(broadcast(idx), Seq(domainCol))
      .withColumn("domain_rank", org.apache.spark.sql.functions
        .row_number().over(w))
      .withColumn("global_pos",
        (col("domain_rank").cast("long") - 1L) * lit(n) +
          col("domain_idx").cast("long"))
  }

  /**
   * UniMax sampling allocation (Chung et al. 2023, "UniMax: Fairer and
   * More Effective Language Sampling for Large-Scale Multilingual
   * Pretraining"): split a total token `budget` across languages as
   * UNIFORMLY as possible subject to a per-language repeat cap —
   * no language contributes more than `maxEpochs` passes over its own
   * corpus. Languages are visited smallest-first; each receives
   * `min(maxEpochs · tokens, ⌊remaining / languagesLeft⌋)`, so budget
   * a small language cannot absorb waterfalls to the larger ones.
   * The temperature-sampling alternative ([[graft.ops]] mixture gates)
   * over-samples heads or starves tails; UniMax is the budget-exact,
   * cap-respecting allocation.
   *
   * All-integer arithmetic (floor division), visiting order (tokens
   * asc, language asc) total — deterministic and SQL-replayable. The
   * loop runs driver-side over the LANGUAGE table (bounded — the
   * corpus-scale work is whatever aggregate produced `tokens`).
   *
   * Input: (langCol, tokensCol) one row per language. Output:
   * (lang, tokens, alloc_tokens, epochs = alloc/tokens as one
   * double divide).
   */
  def unimaxAllocation(tokenCounts: DataFrame, langCol: String,
                       tokensCol: String, budget: Long,
                       maxEpochs: Int): DataFrame = {
    require(budget >= 0, s"budget must be >= 0: $budget")
    require(maxEpochs >= 1, s"maxEpochs must be >= 1: $maxEpochs")
    val spark = tokenCounts.sparkSession
    import spark.implicits._
    val langs = tokenCounts
      .filter(col(langCol).isNotNull) // a null language has no quota
      .select(col(langCol).cast("string"), col(tokensCol).cast("long"))
      .as[(String, Long)].collect()
      .sortBy { case (l, t) => (t, l) }
    langs.foreach { case (l, t) =>
      require(t >= 0, s"negative token count for '$l': $t") }
    var remaining = budget
    val out = langs.zipWithIndex.map { case ((l, t), i) =>
      val fair = remaining / (langs.length - i) // floor division
      val quota = math.min(maxEpochs.toLong * t, fair)
      remaining -= quota
      (l, t, quota)
    }
    out.toSeq.toDF(langCol, tokensCol, "alloc_tokens")
      .withColumn("epochs",
        when(col(tokensCol) === 0L, lit(0.0))
          .otherwise(col("alloc_tokens").cast("double") /
            col(tokensCol).cast("double")))
  }
}
