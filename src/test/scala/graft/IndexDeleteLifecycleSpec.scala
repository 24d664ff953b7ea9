package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.{Retrieval, Similarity, TextDedup}

/**
 * The four persisted index families — MinHash (text near-dup), IVF-PQ
 * (embedding ANN), BM25 (lexical retrieval) and HNSW (graph ANN, the
 * persisted face new in r11) — must expose ONE observable delete
 * lifecycle (r9 verdict #2 closed the BM25 gap):
 *
 *   1. tombstone  → the id stops being SERVED immediately (logical
 *                   exclusion below every query path), and stays dead
 *                   even if re-appended while the tombstone stands;
 *   2. compact    → physical erase + tombstone-list clear, after which
 *                   the id is simply absent;
 *   3. append     → post-compaction, the id is a NEW document and is
 *                   served again (resurrection is an explicit two-step,
 *                   never an accident of re-ingestion).
 *
 * A right-to-be-forgotten purge that runs tombstone-then-compact on
 * every index beside `SnapshotStore.deleteCommitAll` therefore leaves
 * NO query path that can surface the entity.
 */
class IndexDeleteLifecycleSpec extends SparkSpec {
  import spark.implicits._

  private def exists(p: String): Boolean =
    java.nio.file.Files.exists(java.nio.file.Paths.get(p))

  private def lifecycle(name: String, served: () => Set[Long],
                        tombstone: () => Unit, reAppend: () => Unit,
                        compact: () => Unit, tombstonesDir: String): Unit = {
    assert(served() == Set(1L), s"$name: baseline must serve doc 1")
    tombstone()
    assert(!served().contains(1L), s"$name: tombstoned id still served")
    reAppend()
    assert(!served().contains(1L),
      s"$name: re-appended id must stay dead while its tombstone stands")
    compact()
    assert(!exists(tombstonesDir),
      s"$name: compaction must clear the tombstone list")
    assert(!served().contains(1L),
      s"$name: physically erased id surfaced post-compaction")
    reAppend()
    assert(served() == Set(1L),
      s"$name: a fresh append after compaction must resurrect the id")
  }

  test("the four index families share one delete lifecycle: tombstone " +
    "excludes (re-append stays dead), compact erases + clears, " +
    "fresh append resurrects") {
    val base = java.nio.file.Files
      .createTempDirectory("graft_idxdel").toString

    // --- MinHash ---------------------------------------------------
    val mh = s"$base/minhash"
    val doc1 = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"))
      .toDF("doc_id", "text")
    val docsMh = doc1.unionByName(Seq(
      (2L, "a completely different sentence about spark physical plans"),
      (3L, "yet another unrelated string of words for the index test"))
      .toDF("doc_id", "text"))
    TextDedup.saveMinhashIndex(docsMh, "doc_id", "text", mh,
      numHashes = 16, bands = 8)
    val probeMh = Seq(
      (100L, "the quick brown fox jumps over the lazy dog again and again"))
      .toDF("doc_id", "text")
    lifecycle("minhash",
      served = () => TextDedup
        .minhashProbeIndexed(spark, mh, probeMh, "doc_id", "text", 0.9)
        .select(col("corpus_id").cast("long")).as[Long].collect().toSet,
      tombstone = () => TextDedup
        .tombstoneMinhashIndex(Seq(1L).toDF("doc_id"), "doc_id", mh),
      reAppend = () => TextDedup
        .appendMinhashIndex(doc1, "doc_id", "text", mh),
      compact = () => TextDedup.compactMinhashIndex(spark, mh),
      tombstonesDir = s"$mh/tombstones")

    // --- IVF-PQ ----------------------------------------------------
    val ann = s"$base/ivfpq"
    def oneHot(d: Int, m: Float): Array[Float] =
      Array.tabulate(8)(i => if (i == d % 8) m else 0f)
    val vec1 = Seq((1L, oneHot(1, 2f))).toDF("vec_id", "embedding")
    val corpusAnn = vec1.unionByName(
      // i % 8 == 1 excluded: doc 1 must be the ONLY direction-1 vector
      (2 to 24).filter(_ % 8 != 1)
        .map(i => (i.toLong, oneHot(i, 1f + (i % 3))))
        .toDF("vec_id", "embedding"))
    Similarity.saveIvfPqIndex(corpusAnn, "vec_id", "embedding", ann,
      nCells = 2, m = 4, k = 4, iterations = 2)
    val qAnn = Seq((200L, oneHot(1, 5f))).toDF("vec_id", "embedding")
    lifecycle("ivfpq",
      served = () => Similarity
        .ivfPqTopKIndexed(spark, ann, qAnn, "vec_id", "embedding",
          k = 3, nProbe = 2)
        .filter(col("cosine") > 0.99)
        .select(col("neighbor_id").cast("long")).as[Long].collect().toSet,
      tombstone = () => Similarity
        .tombstoneIvfPqIndex(Seq(1L).toDF("vec_id"), "vec_id", ann),
      reAppend = () => Similarity
        .appendIvfPqIndex(vec1, "vec_id", "embedding", ann),
      compact = () => Similarity.compactIvfPqIndex(spark, ann),
      tombstonesDir = s"$ann/tombstones")

    // --- HNSW (the 4th family, persisted face new in r11) -----------
    val hn = s"$base/hnsw"
    val hnVec1 = Seq((1L, oneHot(1, 2f))).toDF("vec_id", "embedding")
    val corpusHn = hnVec1.unionByName(
      (2 to 24).filter(_ % 8 != 1)
        .map(i => (i.toLong, oneHot(i, 1f + (i % 3))))
        .toDF("vec_id", "embedding"))
    graft.ops.Hnsw.saveHnswIndex(corpusHn, "vec_id", "embedding", hn,
      m = 4, efConstruction = 24, nShards = 2)
    val qHn = Seq((200L, oneHot(1, 5f))).toDF("vec_id", "embedding")
    lifecycle("hnsw",
      served = () => graft.ops.Hnsw
        .hnswTopKIndexed(spark, hn, qHn, "vec_id", "embedding",
          k = 3, efSearch = 24)
        .filter(col("cosine") > 0.99)
        .select(col("neighbor_id")).as[Long].collect().toSet,
      tombstone = () => graft.ops.Hnsw
        .tombstoneHnswIndex(Seq(1L).toDF("vec_id"), "vec_id", hn),
      reAppend = () => graft.ops.Hnsw
        .appendHnswIndex(hnVec1, "vec_id", "embedding", hn),
      compact = () => graft.ops.Hnsw.compactHnswIndex(spark, hn),
      tombstonesDir = s"$hn/tombstones")

    // --- BM25 ------------------------------------------------------
    val bm = s"$base/bm25"
    val bmDoc1 = Seq((1L, "alpha beta gamma alpha")).toDF("doc_id", "text")
    val docsBm = bmDoc1.unionByName(Seq(
      (2L, "delta epsilon zeta"),
      (3L, "eta theta iota kappa")).toDF("doc_id", "text"))
    Retrieval.saveBm25Index(docsBm, "doc_id", "text", bm, nBuckets = 4)
    lifecycle("bm25",
      served = () => {
        val got = Retrieval
          .bm25TopKIndexed(spark, bm, "doc_id", Seq((1L, "alpha")), k = 5)
          .select(col("doc_id")).as[Long].collect().toSet
        Retrieval.releaseCaches()
        got
      },
      tombstone = () => Retrieval
        .tombstoneBm25Index(Seq(1L).toDF("doc_id"), "doc_id", bm),
      reAppend = () => Retrieval
        .appendBm25Index(bmDoc1, "doc_id", "text", bm),
      compact = () => Retrieval.compactBm25Index(spark, bm),
      tombstonesDir = s"$bm/tombstones")
  }

  test("bm25 compaction is probe-identical to a rebuild on the purged " +
    "corpus — scores, stats and zero-token docs included") {
    val base = java.nio.file.Files
      .createTempDirectory("graft_bm25_rebuild").toString
    // doc 6 is zero-token: present in n_docs/avgdl, absent from
    // postings — exactly the row doclens exists to keep exact
    val docs = Seq(
      (1L, "alpha beta gamma alpha beta"),
      (2L, "alpha delta delta epsilon"),
      (3L, "beta beta beta zeta"),
      (4L, "gamma delta alpha"),
      (5L, "epsilon zeta eta theta iota"),
      (6L, "   ")).toDF("doc_id", "text")
    val queries = Seq((1L, "alpha beta"), (2L, "delta zeta"))
    val live = s"$base/live"
    Retrieval.saveBm25Index(docs, "doc_id", "text", live, nBuckets = 4)
    Retrieval.tombstoneBm25Index(Seq(2L, 4L).toDF("doc_id"), "doc_id", live)
    Retrieval.compactBm25Index(spark, live)
    val rebuilt = s"$base/rebuilt"
    Retrieval.saveBm25Index(docs.filter(!col("doc_id").isin(2L, 4L)),
      "doc_id", "text", rebuilt, nBuckets = 4)
    def probe(path: String) = {
      val got = Retrieval
        .bm25TopKIndexed(spark, path, "doc_id", queries, k = 5)
        .as[(Long, Long, Double)].collect().sorted.toSeq
      Retrieval.releaseCaches()
      got
    }
    val a = probe(live)
    assert(a == probe(rebuilt), "compaction must equal a purged rebuild")
    assert(a.nonEmpty && !a.exists(r => r._2 == 2L || r._2 == 4L))
    // the corpus scalars themselves must agree (zero-token doc kept)
    def stats(path: String) = spark.read.parquet(s"$path/stats")
      .select(col("n_docs").cast("long"), col("sum_dl").cast("long"))
      .as[(Long, Long)].head()
    assert(stats(live) == stats(rebuilt))
    assert(stats(live)._1 == 4L) // docs 1, 3, 5 and the empty doc 6
  }

  test("bm25 compaction heals a missing doclens roster from the " +
    "postings themselves (pre-doclens index / append crash window)") {
    val base = java.nio.file.Files
      .createTempDirectory("graft_bm25_heal").toString
    val docs = Seq(
      (1L, "alpha beta gamma"),
      (2L, "alpha delta"),
      (3L, "beta zeta eta"),
      (4L, "   ")).toDF("doc_id", "text") // doc 4 is zero-token
    Retrieval.saveBm25Index(docs, "doc_id", "text", base, nBuckets = 2)
    // simulate an index whose roster never landed (saved pre-doclens,
    // or an append crash before the doclens write)
    val dlP = new org.apache.hadoop.fs.Path(s"$base/doclens")
    dlP.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .delete(dlP, true)
    Retrieval.tombstoneBm25Index(Seq(2L).toDF("doc_id"), "doc_id", base)
    Retrieval.compactBm25Index(spark, base) // must not throw
    val served = Retrieval
      .bm25TopKIndexed(spark, base, "doc_id", Seq((1L, "alpha beta")), k = 5)
      .select(col("doc_id")).as[Long].collect().toSet
    Retrieval.releaseCaches()
    assert(served == Set(1L, 3L), s"healed index served $served")
    // stats recovered from postings: docs 1, 3 AND the blank doc 4 —
    // whitespace-only text tokenizes to one empty-string token, so
    // even it has a (dl = 0) posting row to recover from; only a
    // NULL-text doc would be unrecoverable (the documented migration
    // cost). Healed stats equal a purged rebuild's exactly here.
    val (n, s) = spark.read.parquet(s"$base/stats")
      .select(col("n_docs").cast("long"), col("sum_dl").cast("long"))
      .as[(Long, Long)].head()
    assert(n == 3L && s == 6L, s"healed stats ($n, $s)")
    // and the healed roster now exists — the next compaction is exact
    assert(java.nio.file.Files.exists(
      java.nio.file.Paths.get(s"$base/doclens")))
  }

  test("forgetEverywhere with compactIndexes = false: probes are clean " +
    "immediately, tombstones stand until maintenance compacts") {
    import graft.sources.SnapshotStore
    val base = java.nio.file.Files
      .createTempDirectory("graft_rtbf_defer").toString
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon"),
      (2L, "zeta eta theta iota kappa"),
      (3L, "lambda mu nu xi omicron pi rho")).toDF("doc_id", "text")
    SnapshotStore.commitAll(Map("docs" -> docs), s"$base/cat")
    graft.ops.Retrieval.saveBm25Index(docs, "doc_id", "text",
      s"$base/bm", nBuckets = 2)
    val v = SnapshotStore.forgetEverywhere(
      Seq(2L).toDF("id"), s"$base/cat", Map("docs" -> "doc_id"),
      bm25Indexes = Seq(s"$base/bm"), compactIndexes = false)
    assert(v >= 2L)
    // catalog flipped atomically to the purged state
    assert(SnapshotStore.readTable(spark, s"$base/cat", "docs")
      .select(col("doc_id")).as[Long].collect().toSet == Set(1L, 3L))
    // the index serves clean NOW, via the standing tombstone...
    val served = graft.ops.Retrieval.bm25TopKIndexed(spark, s"$base/bm",
      "doc_id", Seq((1L, "zeta alpha")), k = 5)
      .select(col("doc_id")).as[Long].collect().toSet
    graft.ops.Retrieval.releaseCaches()
    assert(served == Set(1L), s"deferred-compaction probe served $served")
    // ...and the physical erase is still owed to maintenance
    assert(java.nio.file.Files.exists(
      java.nio.file.Paths.get(s"$base/bm/tombstones")))
    graft.ops.Retrieval.compactBm25Index(spark, s"$base/bm")
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(s"$base/bm/tombstones")))
  }

  test("forgetEverywhere re-run is probe-only (r11 anyLive pre-flight): " +
    "no tombstones written, no index files rewritten — and a deferred " +
    "compaction still completes on the next run") {
    import graft.sources.SnapshotStore
    val base = java.nio.file.Files
      .createTempDirectory("graft_rtbf_rerun").toString
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon"),
      (2L, "zeta eta theta iota kappa"),
      (3L, "lambda mu nu xi omicron pi rho")).toDF("doc_id", "text")
    SnapshotStore.commitAll(Map("docs" -> docs), s"$base/cat")
    TextDedup.saveMinhashIndex(docs, "doc_id", "text", s"$base/mh",
      shingleLen = 5, numHashes = 16, bands = 4)
    graft.ops.Retrieval.saveBm25Index(docs, "doc_id", "text",
      s"$base/bm", nBuckets = 2)
    // run 1 DEFERS compaction: tombstones stand, data files keep the id
    SnapshotStore.forgetEverywhere(
      Seq(2L).toDF("id"), s"$base/cat", Map("docs" -> "doc_id"),
      minhashIndexes = Seq(s"$base/mh"), bm25Indexes = Seq(s"$base/bm"),
      compactIndexes = false)
    assert(exists(s"$base/bm/tombstones"))
    // run 2 with compaction: the id is still IN the data tables
    // (deferred), so anyLive reads it as live and the erase COMPLETES
    SnapshotStore.forgetEverywhere(
      Seq(2L).toDF("id"), s"$base/cat", Map("docs" -> "doc_id"),
      minhashIndexes = Seq(s"$base/mh"), bm25Indexes = Seq(s"$base/bm"))
    assert(!exists(s"$base/bm/tombstones"), "deferred erase not completed")
    assert(!exists(s"$base/mh/tombstones"))
    def fileState(p: String): Set[(String, Long)] = {
      val d = new java.io.File(p)
      d.listFiles().filter(_.isFile)
        .map(f => (f.getName, f.lastModified())).toSet
    }
    val mhSets = fileState(s"$base/mh/sets")
    val bmDl = fileState(s"$base/bm/doclens")
    // run 3 is the idempotent RE-RUN: the pre-flight finds nothing
    // live — no tombstone dirs appear, no index file is rewritten
    SnapshotStore.forgetEverywhere(
      Seq(2L).toDF("id"), s"$base/cat", Map("docs" -> "doc_id"),
      minhashIndexes = Seq(s"$base/mh"), bm25Indexes = Seq(s"$base/bm"))
    assert(!exists(s"$base/bm/tombstones") && !exists(s"$base/mh/tombstones"),
      "re-run wrote tombstones for absent ids")
    assert(fileState(s"$base/mh/sets") == mhSets,
      "re-run rewrote the minhash sets table")
    assert(fileState(s"$base/bm/doclens") == bmDl,
      "re-run rewrote the bm25 doclens table")
    // and the serving state is unchanged
    val served = graft.ops.Retrieval.bm25TopKIndexed(spark, s"$base/bm",
      "doc_id", Seq((1L, "zeta alpha lambda")), k = 5)
      .select(col("doc_id")).as[Long].collect().toSet
    graft.ops.Retrieval.releaseCaches()
    assert(served == Set(1L, 3L), s"served $served")
  }

  test("compacting a FULLY tombstoned index leaves a valid empty layout " +
    "in every family: compaction completes (twice), probes answer " +
    "empty, a fresh append resurrects service (r10 advice)") {
    val base = java.nio.file.Files
      .createTempDirectory("graft_idxempty").toString

    // --- BM25: the advice's named case — partitioned zero-row
    // rewrites leave no inferable files, and the terms/stats
    // recompute must not abort midway
    val bm = s"$base/bm25"
    val bmDocs = Seq((1L, "alpha beta gamma"), (2L, "delta epsilon"))
      .toDF("doc_id", "text")
    Retrieval.saveBm25Index(bmDocs, "doc_id", "text", bm, nBuckets = 2)
    Retrieval.tombstoneBm25Index(Seq(1L, 2L).toDF("doc_id"), "doc_id", bm)
    Retrieval.compactBm25Index(spark, bm)
    assert(!exists(s"$bm/tombstones"))
    assert(!exists(s"$bm/postings.__compact") &&
      !exists(s"$bm/terms.__compact"),
      "compaction must not strand .__compact dirs")
    def bmServed(): Set[Long] = {
      val got = Retrieval
        .bm25TopKIndexed(spark, bm, "doc_id", Seq((1L, "alpha")), k = 5)
        .select(col("doc_id")).as[Long].collect().toSet
      Retrieval.releaseCaches()
      got
    }
    assert(bmServed().isEmpty, "empty index must answer empty, not crash")
    // compacting the ALREADY-empty index is a no-op, not a crash
    Retrieval.compactBm25Index(spark, bm)
    Retrieval.appendBm25Index(
      Seq((5L, "alpha alpha")).toDF("doc_id", "text"), "doc_id", "text", bm)
    assert(bmServed() == Set(5L), "append into the empty layout must serve")

    // --- MinHash ---------------------------------------------------
    val mh = s"$base/minhash"
    val mhDocs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog tonight"),
      (2L, "a different sentence about catalyst physical planning"))
      .toDF("doc_id", "text")
    TextDedup.saveMinhashIndex(mhDocs, "doc_id", "text", mh,
      numHashes = 16, bands = 8)
    TextDedup.tombstoneMinhashIndex(Seq(1L, 2L).toDF("doc_id"),
      "doc_id", mh)
    TextDedup.compactMinhashIndex(spark, mh)
    assert(!exists(s"$mh/tombstones"))
    val probeMh = Seq(
      (100L, "the quick brown fox jumps over the lazy dog tonight"))
      .toDF("doc_id", "text")
    def mhServed(): Set[Long] = TextDedup
      .minhashProbeIndexed(spark, mh, probeMh, "doc_id", "text", 0.9)
      .select(col("corpus_id").cast("long")).as[Long].collect().toSet
    assert(mhServed().isEmpty)
    TextDedup.compactMinhashIndex(spark, mh) // already-empty: no-op
    TextDedup.appendMinhashIndex(
      mhDocs.filter(col("doc_id") === 1L), "doc_id", "text", mh)
    assert(mhServed() == Set(1L))

    // --- IVF-PQ ----------------------------------------------------
    val ann = s"$base/ivfpq"
    def oneHot(d: Int, m: Float): Array[Float] =
      Array.tabulate(8)(i => if (i == d % 8) m else 0f)
    val corpusAnn = (1 to 16).map(i => (i.toLong, oneHot(i, 1f + (i % 3))))
      .toDF("vec_id", "embedding")
    Similarity.saveIvfPqIndex(corpusAnn, "vec_id", "embedding", ann,
      nCells = 2, m = 4, k = 4, iterations = 2)
    Similarity.tombstoneIvfPqIndex(
      (1 to 16).map(_.toLong).toDF("vec_id"), "vec_id", ann)
    Similarity.compactIvfPqIndex(spark, ann)
    assert(!exists(s"$ann/tombstones"))
    val qAnn = Seq((200L, oneHot(1, 5f))).toDF("vec_id", "embedding")
    def annServed(): Set[Long] = Similarity
      .ivfPqTopKIndexed(spark, ann, qAnn, "vec_id", "embedding",
        k = 3, nProbe = 2)
      .select(col("neighbor_id").cast("long")).as[Long].collect().toSet
    assert(annServed().isEmpty)
    Similarity.compactIvfPqIndex(spark, ann) // already-empty: no-op
    Similarity.appendIvfPqIndex(
      Seq((1L, oneHot(1, 2f))).toDF("vec_id", "embedding"),
      "vec_id", "embedding", ann)
    assert(annServed() == Set(1L))

    // --- HNSW --------------------------------------------------------
    val hn = s"$base/hnsw"
    val corpusHn = (1 to 12).map(i => (i.toLong, oneHot(i, 1f + (i % 3))))
      .toDF("vec_id", "embedding")
    graft.ops.Hnsw.saveHnswIndex(corpusHn, "vec_id", "embedding", hn,
      m = 4, efConstruction = 24, nShards = 2)
    graft.ops.Hnsw.tombstoneHnswIndex(
      (1 to 12).map(_.toLong).toDF("vec_id"), "vec_id", hn)
    graft.ops.Hnsw.compactHnswIndex(spark, hn)
    assert(!exists(s"$hn/tombstones"))
    val qHn = Seq((200L, oneHot(1, 5f))).toDF("vec_id", "embedding")
    def hnServed(): Set[Long] = graft.ops.Hnsw
      .hnswTopKIndexed(spark, hn, qHn, "vec_id", "embedding",
        k = 3, efSearch = 24)
      .select(col("neighbor_id")).as[Long].collect().toSet
    assert(hnServed().isEmpty)
    graft.ops.Hnsw.compactHnswIndex(spark, hn) // already-empty: no-op
    graft.ops.Hnsw.appendHnswIndex(
      Seq((1L, oneHot(1, 2f))).toDF("vec_id", "embedding"),
      "vec_id", "embedding", hn)
    assert(hnServed() == Set(1L))
  }

  test("a MISSING index component is LOUD in every family — never " +
    "'validly empty': the swap-crash recovery state must not serve " +
    "zero rows or let a compaction discard the purge intent") {
    val base = java.nio.file.Files
      .createTempDirectory("graft_idxmissing").toString
    def mv(from: String, to: String): Unit = {
      val p = new org.apache.hadoop.fs.Path(from)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      assert(fs.rename(p, new org.apache.hadoop.fs.Path(to)))
    }
    // BM25: postings parked at .__old (atomicSwap crash shape)
    val bm = s"$base/bm"
    Retrieval.saveBm25Index(Seq((1L, "alpha beta")).toDF("doc_id", "text"),
      "doc_id", "text", bm, nBuckets = 2)
    mv(s"$bm/postings", s"$bm/postings.__old")
    intercept[IllegalStateException] {
      Retrieval.bm25TopKIndexed(spark, bm, "doc_id",
        Seq((1L, "alpha")), k = 5).collect()
    }
    // IVF-PQ: a missing codes dir must NOT let compaction delete the
    // tombstone list (the silent-lost-purge shape)
    val ann = s"$base/ann"
    Similarity.saveIvfPqIndex(
      (1 to 8).map(i => (i.toLong, Array.tabulate(4)(j =>
        if (j == i % 4) 1f else 0f))).toDF("vec_id", "embedding"),
      "vec_id", "embedding", ann, nCells = 2, m = 2, k = 2)
    Similarity.tombstoneIvfPqIndex(Seq(1L).toDF("vec_id"), "vec_id", ann)
    mv(s"$ann/codes", s"$ann/codes.__old")
    intercept[IllegalStateException] {
      Similarity.compactIvfPqIndex(spark, ann)
    }
    assert(exists(s"$ann/tombstones"),
      "the purge intent must survive a refused compaction")
    // MinHash: bands parked aside — probes are loud
    val mh = s"$base/mh"
    TextDedup.saveMinhashIndex(
      Seq((1L, "alpha beta gamma delta epsilon zeta"))
        .toDF("doc_id", "text"),
      "doc_id", "text", mh, numHashes = 16, bands = 8)
    mv(s"$mh/bands", s"$mh/bands.__old")
    intercept[IllegalStateException] {
      TextDedup.minhashProbeIndexed(spark, mh,
        Seq((9L, "alpha beta gamma delta epsilon zeta"))
          .toDF("doc_id", "text"),
        "doc_id", "text", 0.8).collect()
    }
  }

  test("non-integral ids are refused LOUDLY at save and tombstone time " +
    "in every family — never a silent purge no-op (r10 advice, medium)") {
    val base = java.nio.file.Files
      .createTempDirectory("graft_idxtype").toString
    val strDocs = Seq(("a", "alpha beta")).toDF("doc_id", "text")
    val strVecs = Seq(("a", Array(1f, 0f))).toDF("vec_id", "embedding")
    val strIds = Seq("a").toDF("doc_id")
    // save: an index a purge could never reach must not be buildable
    intercept[IllegalArgumentException] {
      Retrieval.saveBm25Index(strDocs, "doc_id", "text", s"$base/bm")
    }
    intercept[IllegalArgumentException] {
      TextDedup.saveMinhashIndex(strDocs, "doc_id", "text", s"$base/mh")
    }
    intercept[IllegalArgumentException] {
      Similarity.saveIvfPqIndex(strVecs, "vec_id", "embedding",
        s"$base/ann", nCells = 2)
    }
    // tombstone: a purge id that would cast to null must be refused,
    // not written as a tombstone that matches nothing
    val bm = s"$base/bm_ok"
    Retrieval.saveBm25Index(Seq((1L, "alpha")).toDF("doc_id", "text"),
      "doc_id", "text", bm, nBuckets = 2)
    intercept[IllegalArgumentException] {
      Retrieval.tombstoneBm25Index(strIds, "doc_id", bm)
    }
    val mh = s"$base/mh_ok"
    TextDedup.saveMinhashIndex(
      Seq((1L, "alpha beta gamma delta epsilon zeta"))
        .toDF("doc_id", "text"),
      "doc_id", "text", mh, numHashes = 16, bands = 8)
    intercept[IllegalArgumentException] {
      TextDedup.tombstoneMinhashIndex(strIds, "doc_id", mh)
    }
    val ann = s"$base/ann_ok"
    Similarity.saveIvfPqIndex(
      (1 to 8).map(i => (i.toLong, Array.tabulate(4)(j =>
        if (j == i % 4) 1f else 0f))).toDF("vec_id", "embedding"),
      "vec_id", "embedding", ann, nCells = 2, m = 2, k = 2)
    intercept[IllegalArgumentException] {
      Similarity.tombstoneIvfPqIndex(Seq("a").toDF("vec_id"),
        "vec_id", ann)
    }
  }
}
