package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

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

  /** Apply a CDC changelog to a snapshot (the MERGE INTO / upsert shape
    * every incremental warehouse load runs): `changes` carries `opCol`
    * ∈ {I, U, D} plus the full row image for I/U; the result is
    * base − (keys present in the changelog) ∪ (changelog rows that are
    * not deletes). An update is therefore replace-by-key, an insert is
    * a plain add, a delete removes the key — last-writer-wins at the
    * changelog's granularity, which is why callers must pre-collapse a
    * multi-entry log to one row per key (the usual "latest change per
    * key" window) before applying.
    *
    * Scale shape: ONE left-anti join on the key plus a union — both
    * sides shuffle once on `key` (or the changelog broadcasts when it
    * is small, the common case for incremental loads: Catalyst picks).
    * Nothing is rewritten row-at-a-time and the snapshot streams once,
    * so a 100 TB base table with a 1 GB day-batch costs one broadcast
    * anti join — the Delta/Iceberg MERGE physical plan. */
  def applyChangelog(base: DataFrame, changes: DataFrame, key: String,
      opCol: String = "op"): DataFrame = {
    val dataCols = base.columns.toSeq
    require(dataCols.contains(key), s"base is missing key column $key")
    require(changes.columns.contains(opCol), s"changelog is missing $opCol")
    val sel: Seq[Column] = dataCols.map(c => col(s"`$c`"))
    val survivors = base.join(changes.select(col(s"`$key`")), Seq(key), "left_anti")
    val applied = changes.filter(col(s"`$opCol`") =!= "D").select(sel: _*)
    survivors.unionByName(applied)
  }

  /** Build a mergeable per-key aggregate STATE over `valueCol`:
    * (key…, cnt, sum_<v> [exact decimal], min_<v>, max_<v>). The state
    * is the materialized-view form of a groupBy — see [[mergeAggStates]]
    * for the maintenance contract. */
  def aggState(df: DataFrame, keys: Seq[String], valueCol: String): DataFrame = {
    require(keys.nonEmpty, "need at least one key column")
    val v = col(s"`$valueCol`")
    df.groupBy(keys.map(c => col(s"`$c`")): _*)
      .agg(count(lit(1)).as("cnt"),
        sum(v.cast(org.apache.spark.sql.types.DecimalType(18, 2))).as(s"sum_$valueCol"),
        min(v).as(s"min_$valueCol"), max(v).as(s"max_$valueCol"))
  }

  /** Incremental materialized-view maintenance: merge per-key aggregate
    * STATES (count / sum / min / max shaped like [[aggState]]) so that
    * merge(agg(A), agg(B)) = agg(A ∪ B) — counts and exact-decimal sums
    * add, mins/maxes fold, and the base data is NEVER rescanned. This is
    * the algebraic-aggregate property (Gray et al. '97 cube taxonomy)
    * that makes a 100 TB rolling view affordable: each refresh
    * aggregates only the delta batch and merges ~|keys| state rows.
    * (Non-algebraic measures — exact distinct, exact median — need
    * sketch states instead: see [[graft.pipeline.Sketches]].)
    *
    * Scale shape: ONE union + one keyed aggregation over state rows
    * (bounded by key cardinality, not data volume); the delta side is
    * typically tiny and the merge shuffles state, never facts. */
  def mergeAggStates(states: Seq[DataFrame], keys: Seq[String],
      valueCol: String): DataFrame = {
    require(states.nonEmpty, "need at least one state to merge")
    val merged = states.reduce(_ unionByName _)
    merged.groupBy(keys.map(c => col(s"`$c`")): _*)
      .agg(sum(col("cnt")).as("cnt"),
        sum(col(s"`sum_$valueCol`")).as(s"sum_$valueCol"),
        min(col(s"`min_$valueCol`")).as(s"min_$valueCol"),
        max(col(s"`max_$valueCol`")).as(s"max_$valueCol"))
  }

  /** Build a type-2 slowly-changing-dimension history from a change
    * log: one row per (key, consecutive run of equal `attr` values),
    * with `valid_from` = first tick of the run, `valid_to` = the next
    * run's first tick (null while current), and a per-key version
    * number. Consecutive duplicate values do NOT open a new version —
    * only genuine changes do, which is the SCD2 contract (a dimension
    * row's history is its sequence of distinct states, not its event
    * firehose).
    *
    * `ord` must be a deterministic total order within each key (pass a
    * tiebreaker column alongside the timestamp when events can share a
    * tick). Scale shape: ONE hash exchange on `key` feeds two window
    * passes over the same sort (lag to find change points, lead to
    * close intervals) and the change-point filter runs between them —
    * no joins, no global sort; each key's history lives on one
    * executor, which is exactly the dimension-table cardinality. */
  def scd2(log: DataFrame, key: String, attr: String,
      ord: Seq[String]): DataFrame = {
    require(ord.nonEmpty, "need at least one ordering column")
    val ordCols = ord.map(c => col(s"`$c`"))
    val w = Window.partitionBy(col(s"`$key`")).orderBy(ordCols: _*)
    val tick = ordCols.head
    val changes = log
      .withColumn("__prev", lag(col(s"`$attr`"), 1).over(w))
      // null-safe inequality: the first row per key (prev = null) and
      // real null-valued states must both open versions
      .filter(!(col(s"`$attr`") <=> col("__prev")))
    val w2 = Window.partitionBy(col(s"`$key`")).orderBy(ordCols: _*)
    changes
      .withColumn("valid_from", tick)
      .withColumn("valid_to", lead(tick, 1).over(w2))
      .withColumn("version", row_number().over(w2))
      .select(col(s"`$key`"), col(s"`$attr`"),
        col("valid_from"), col("valid_to"), col("version"),
        col("valid_to").isNull.as("is_current"))
  }

  /** Snapshot DIFF — the CDC-extraction inverse of [[applyChangelog]]:
    * given two keyed snapshots, derive the minimal changelog (op I/U/D
    * per key, with the AFTER values for I/U and nulls for D) such that
    * `applyChangelog(before, snapshotDiff(before, after), key) ≡ after`
    * — the reconciliation pass a warehouse runs when a source cannot
    * emit its own changelog (and the audit when it claims to). Change
    * detection is null-safe per-column comparison (IS DISTINCT FROM),
    * never a hash, so the diff is exact by definition.
    *
    * Scale shape: ONE full-outer hash join keyed on `key` — both
    * snapshots shuffle once (or the smaller broadcasts); unchanged keys
    * are dropped in the join's output stage, so only the changed rows
    * ever move downstream. At 100 TB this is the canonical two-scan
    * table compare. */
  def snapshotDiff(before: DataFrame, after: DataFrame, key: String): DataFrame = {
    val dataCols = before.columns.toSeq
    require(dataCols.contains(key), s"before is missing key column $key")
    require(after.columns.toSeq == dataCols,
      s"snapshots must share a schema: ${dataCols} vs ${after.columns.toSeq}")
    val nonKey = dataCols.filterNot(_ == key)
    val a = before.select((col(s"`$key`") +: lit(true).as("__in_a") +:
      nonKey.map(c => col(s"`$c`").as(s"__a_$c"))): _*)
    val b = after.select((col(s"`$key`") +: lit(true).as("__in_b") +:
      nonKey.map(c => col(s"`$c`"))): _*)
    val changed = nonKey.map(c => !(col(s"__a_$c") <=> col(s"`$c`")))
      .reduceOption(_ || _).getOrElse(lit(false))
    a.join(b, Seq(key), "full_outer")
      .withColumn("op",
        when(col("__in_a").isNull, "I")
          .when(col("__in_b").isNull, "D")
          .when(changed, "U"))
      .filter(col("op").isNotNull)
      .select((col(s"`$key`") +: col("op") +: nonKey.map(c => col(s"`$c`"))): _*)
  }
}
