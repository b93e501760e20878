package graft.sources

import org.apache.spark.sql.DataFrame

/** Table-layout tools for the warehouse side of the engine: bucketed
  * tables for exchange-free joins and partitioned parquet for
  * partition-pruned scans. These are LAYOUT decisions — pay one shuffle
  * at write time, skip it on every subsequent read — the standard trade
  * for tables that are joined or filtered the same way repeatedly (fact
  * tables on their join key, corpora on their split/language column).
  */
object Warehouse {

  /** Write `df` as a bucketed, bucket-sorted table on `key`: rows are
    * hash-distributed into `buckets` files per partition and sorted
    * within each bucket. Two tables bucketed on the same key with the
    * same bucket count equi-join WITHOUT ANY EXCHANGE — the scan itself
    * reports the hash distribution Catalyst needs (and the in-bucket
    * sort feeds sort-merge join without a re-sort). At 100 TB this turns
    * the recurring fact⋈fact shuffle into a write-once cost. */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int,
      path: Option[String] = None): Unit = {
    require(buckets > 0, s"bucket count must be positive, got $buckets")
    val w = df.write.mode("overwrite").format("parquet")
      .bucketBy(buckets, key).sortBy(key)
    // explicit data location (external table) — lets callers bucket into
    // scratch space on sessions whose warehouse dir is unset/shared
    path.fold(w.saveAsTable(table))(p => w.option("path", p).saveAsTable(table))
  }

  /** Write `df` as parquet partitioned by `cols`: each distinct value
    * combination becomes a directory, so a filter on the partition
    * columns prunes whole directories at PLANNING time (the scan's
    * `PartitionFilters`) — no file of a non-matching partition is ever
    * opened. The layout for corpus splits (train/val/test), languages,
    * and date-sharded event logs. */
  def writePartitioned(df: DataFrame, path: String, cols: Seq[String]): Unit = {
    require(cols.nonEmpty, "need at least one partition column")
    df.write.mode("overwrite").partitionBy(cols: _*).parquet(path)
  }
}
