package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Ingest for the text-corpus file formats a training pipeline actually
  * receives — JSONL (the interchange format of web-crawl corpora) and
  * CSV — plus the shard writer that lays a corpus out in deterministic
  * training order.
  *
  * Both readers take an EXPLICIT schema: schema inference reads the
  * data twice and silently unifies drifting types across files — at
  * 100 TB both are unacceptable, so the schema is a required argument.
  * Malformed records are quarantined, not dropped: PERMISSIVE mode with
  * a `_corrupt_record` column the caller splits on ([[withQuarantine]]),
  * so a bad crawl file costs a filter, never a failed 10-hour job, and
  * nothing disappears silently.
  */
object TextIngest {

  val CorruptCol = "_corrupt_record"

  /** Read JSON-lines with an explicit schema; malformed lines land in
    * [[CorruptCol]] with every data column null. */
  def readJsonl(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .schema(schema.add(CorruptCol, "string"))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .json(path)

  /** Read headered CSV with an explicit schema; malformed rows land in
    * [[CorruptCol]]. `multiLine=false` keeps the input splittable —
    * a multiline CSV cannot be chunked across executors. */
  def readCsv(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .schema(schema.add(CorruptCol, "string"))
      .option("header", "true")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .csv(path)

  /** Split an ingest frame into (clean, quarantined): clean rows drop
    * the corrupt column; quarantined rows keep every column (data
    * columns null) with the raw line first as `raw_record`. The
    * quarantine plan must reference a data column alongside the corrupt
    * one — Spark refuses a raw-file query whose only referenced column
    * is the internal corrupt-record column (it is filled lazily). */
  def withQuarantine(df: DataFrame): (DataFrame, DataFrame) = {
    val clean = df.filter(col(CorruptCol).isNull).drop(CorruptCol)
    val dataCols = df.columns.filterNot(_ == CorruptCol).map(c => col(s"`$c`"))
    val bad = df.filter(col(CorruptCol).isNotNull)
      .select(col(CorruptCol).as("raw_record") +: dataCols: _*)
    (clean, bad)
  }

  /** Write the corpus in deterministic training order: assign
    * (shard, shard_pos) via [[graft.pipeline.Splits.shuffleOrder]],
    * then write parquet partitioned by shard with rows sorted by
    * shard_pos inside each shard file. A reader that walks the
    * `shard=N` directories round-robin replays the same
    * pseudo-random permutation on every run — the on-disk form of
    * "shuffle the corpus once, train reproducibly forever". One
    * exchange (the shard repartition); the per-shard sort is the
    * write-side sort, never a global one. */
  def writeShuffled(df: DataFrame, idCol: String, path: String,
      numShards: Int = 8, salt: String = graft.pipeline.Splits.DefaultSalt): Unit = {
    val ordered = graft.pipeline.Splits
      .withShuffleOrder(df, idCol, numShards, salt) // in place — no self-join
      // range (not hash) repartition: hash(shard) % numShards collides
      // shards into one task and leaves others empty; range gives the
      // bijective shard→task layout the scaladoc promises
      .repartitionByRange(numShards, col("shard"))
      .sortWithinPartitions(col("shard"), col("shard_pos"))
    ordered.write.mode("overwrite").partitionBy("shard").parquet(path)
  }
}
