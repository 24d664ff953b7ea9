package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Training-shard export — the sink end of the pipeline (ingest →
 * dedup → split → SHARDS): one directory per split value, shard files
 * of bounded size, deterministic shard membership and in-file order.
 *
 * Scale design: rows route to shards by hash(id) (stable across runs
 * and cluster size, like the split assignment itself), the write is
 * one shuffle on (split, shard), and `maxRecordsPerFile` bounds file
 * size without a second pass. Readers get `path/split=train/...`
 * partition pruning for free.
 */
object ShardWriter {

  def writeShards(df: DataFrame, path: String, splitCol: String,
                  idCol: String, shardsPerSplit: Int = 8,
                  maxRecordsPerFile: Long = 1L << 20): Unit = {
    require(shardsPerSplit > 0, "shardsPerSplit must be positive")
    df.repartition(col(splitCol),
        pmod(hash(col(idCol)), lit(shardsPerSplit)))
      .sortWithinPartitions(col(splitCol), col(idCol))
      .write
      .partitionBy(splitCol)
      .option("maxRecordsPerFile", maxRecordsPerFile.toString)
      .mode("overwrite")
      .parquet(path)
  }
}
