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

  /** Blocking-recall harness — the measure-before-trust evaluation for
    * [[blockedPairs]] (the ER sibling of the MinHash/SimHash recall
    * rows): ground TRUTH is every unordered pair within `maxDist`
    * edits, generated LOSSLESSLY by length-band blocking — two strings
    * within `maxDist` edits differ in length by at most `maxDist`, so
    * an equi-join of (length, length+d) for d ∈ [0, maxDist] enumerates
    * every admissible pair exactly once without an all-pairs product
    * (the exact-truth arm stays scale-shaped, like the inverted-index
    * Jaccard truth in `dedup_minhash_recall`). The candidate arm is the
    * production blocking key. Blocked pairs at ≤ maxDist are a SUBSET
    * of the truth by construction, so recall = candidates/truth — what
    * a sparser/cheaper blocking key silently costs.
    *
    * One summary row: (n_true_pairs, n_blocked_pairs, n_missed,
    * recall). */
  def blockingRecall(df: DataFrame, strCol: String, blockKey: Column => Column,
      maxDist: Int, maxBlock: Long = 10000L): DataFrame = {
    require(maxDist >= 0, s"negative maxDist: $maxDist")
    val names = df.select(col(s"`$strCol`").as("s")).where(col("s").isNotNull)
      .distinct()
      .select(col("s"), length(col("s")).as("len"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val lx = names.select(col("s").as("left"), col("len").as("ll"),
        explode(array((0 to maxDist).map(lit): _*)).as("d"))
      .withColumn("len", col("ll") + col("d"))
    val truth = lx.join(names.select(col("s").as("right"), col("len")), Seq("len"))
      .where(col("d") > 0 || col("left") < col("right"))
      .where(levenshtein(col("left"), col("right")) <= maxDist)
      .agg(F.count(lit(1)).as("n_true_pairs"))
    val cand = blockedPairs(df, strCol, blockKey, maxDist, maxBlock)
      .agg(F.count(lit(1)).as("n_blocked_pairs"))
    val out = truth.crossJoin(cand)
      .select(col("n_true_pairs"), col("n_blocked_pairs"),
        (col("n_true_pairs") - col("n_blocked_pairs")).as("n_missed"),
        // explicit null on an empty truth set (ANSI division would
        // throw; the oracle mirrors the same CASE)
        when(col("n_true_pairs") === 0L, lit(null).cast("double"))
          .otherwise(round(col("n_blocked_pairs").cast("double") /
            col("n_true_pairs").cast("double"), 4)).as("recall"))
    val rows = out.collect().toSeq
    names.unpersist()
    df.sparkSession.createDataFrame(
      df.sparkSession.sparkContext.parallelize(rows, 1), out.schema)
  }
}
