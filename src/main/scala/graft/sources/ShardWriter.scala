package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Training-shard export — the sink end of the pipeline (ingest →
 * dedup → split → SHARDS): one directory per (split, shard) value,
 * shard files of bounded size, deterministic shard membership.
 *
 * Scale design: each row's shard is a materialized column
 * `pmod(hash(id), shards)` written via `partitionBy(split, shard)`,
 * so which DIRECTORY a row lands in is a pure function of its id —
 * stable across runs, cluster sizes, and partition counts. (How rows
 * within one directory are laid out across part-files is Spark task
 * layout, an implementation detail readers must not depend on.) The
 * write is one shuffle on (split, shard) and `maxRecordsPerFile`
 * bounds file size without a second pass. Readers get
 * `path/split=train/shard=3/...` partition pruning for free.
 */
object ShardWriter {

  def writeShards(df: DataFrame, path: String, splitCol: String,
                  idCol: String, shardsPerSplit: Int = 8,
                  maxRecordsPerFile: Long = 1L << 20): Unit = {
    require(shardsPerSplit > 0, "shardsPerSplit must be positive")
    require(!df.columns.contains("shard"),
      "input already has a 'shard' column — writeShards materializes " +
        "its own; rename the existing column first")
    df.withColumn("shard", pmod(hash(col(idCol)), lit(shardsPerSplit)))
      .repartition(col(splitCol), col("shard"))
      .sortWithinPartitions(col(splitCol), col("shard"), col(idCol))
      .write
      .partitionBy(splitCol, "shard")
      .option("maxRecordsPerFile", maxRecordsPerFile.toString)
      .mode("overwrite")
      .parquet(path)
  }
}
