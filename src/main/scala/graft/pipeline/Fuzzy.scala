package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{functions => F}

/** Blocked edit-distance pair generation — the fuzzy-matching /
  * entity-resolution primitive (near-identical product names, author
  * aliases, OCR'd titles) that exact and shingle dedup both miss when
  * the variation is a few character edits.
  *
  * Scale shape: candidates come from an equi-join on a caller-supplied
  * BLOCKING key (phonetic code, token, prefix, brand...), never an
  * all-pairs product — the classic record-linkage blocking design. A
  * block of size s still costs s² comparisons, so `maxBlock` drops
  * oversized blocks (the same hot-key guard as the shingle posting cap
  * in [[Dedup]]): a degenerate key ("", "unknown") cannot quadratically
  * dominate the job. Levenshtein itself is the codegen'd Spark builtin,
  * evaluated only on within-block candidates that survive a cheap
  * length-difference pre-filter (|len a − len b| > maxDist can never be
  * within maxDist edits).
  */
object Fuzzy {

  /** Distinct unordered pairs `(left, right, dist)` of `strCol` values
    * sharing a block key, with Levenshtein distance ≤ `maxDist`.
    * `blockKey` maps the string column to its blocking key; blocks
    * larger than `maxBlock` distinct values are dropped whole. */
  def blockedPairs(df: DataFrame, strCol: String, blockKey: Column => Column,
      maxDist: Int, maxBlock: Long = 10000L): DataFrame = {
    require(maxDist >= 0, s"negative maxDist: $maxDist")
    val names = df.select(col(s"`$strCol`").as("s")).where(col("s").isNotNull)
      .distinct()
      .select(col("s"), blockKey(col("s")).as("k"))
    val keep = names.groupBy(col("k")).agg(F.count(lit(1)).as("n"))
      .where(col("n") <= maxBlock).select(col("k"))
    val blocked = names.join(keep.hint("shuffle_hash"), "k")

    val l = blocked.select(col("k"), col("s").as("left"))
    val r = blocked.select(col("k").as("k2"), col("s").as("right"))
    l.join(r, col("k") === col("k2") && col("left") < col("right") &&
        abs(length(col("left")) - length(col("right"))) <= maxDist)
      .select(col("left"), col("right"),
        levenshtein(col("left"), col("right")).cast("long").as("dist"))
      .where(col("dist") <= maxDist)
  }
}
