package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic dataset splitting for training pipelines.
  *
  * A train/val/test split at corpus scale must be (a) stable across
  * re-runs and cluster layouts — `rand()` or `monotonically_increasing_id`
  * reshuffle membership whenever partitioning changes, leaking eval docs
  * into training between pipeline versions — and (b) a pure narrow map,
  * no shuffle. Hashing a stable id with a salt gives both: membership is
  * a function of (id, salt) alone, and changing the salt draws a fresh
  * independent split.
  *
  * The bucket is the first two hex characters of sha-256(id|salt) — 256
  * equal-probability buckets compared LEXICALLY, which on lowercase hex
  * equals numeric order in every engine (no hex→int conversion, which
  * SQL dialects disagree on). 256 buckets quantize fractions to ~0.4%,
  * plenty for split ratios; a finer grid would take more hex chars.
  */
object Splits {

  /** Default boundaries: train < 'cd' (205/256 ≈ 80.1%),
    * val < 'e6' (29/256 ≈ 11.3%), test the rest (22/256 ≈ 8.6%). */
  val TrainUpper = "cd"
  val ValUpper = "e6"
  val DefaultSalt = "graft"
  /** Shard count pinned by the `split_shuffle_order` oracle. */
  val NumShards = 8

  private[pipeline] def bucketCol(idCol: String, salt: String): Column =
    substring(sha2(concat(col(idCol).cast("string"), lit("|" + salt)), 256), 1, 2)

  /** Assign every row a stable (bucket, split) pair keyed on `idCol`.
    * Boundaries are inclusive-exclusive on the hex bucket: bucket <
    * trainUpper → train, < valUpper → val, else test. */
  def hashSplit(df: DataFrame, idCol: String, salt: String = DefaultSalt,
      trainUpper: String = TrainUpper, valUpper: String = ValUpper): DataFrame = {
    // boundaries must live on the lowercase-hex grid the buckets use, or
    // the lexical comparison silently stops being a numeric one
    for (bound <- Seq(trainUpper, valUpper))
      // ASCII range check, NOT isDigit: Unicode digits ('٥') pass isDigit
      // but sort above 'f', silently sending every row to train
      require(bound.length == 2 && bound.forall(c => ('0' to '9').contains(c) || ('a' to 'f').contains(c)),
        s"split boundary '$bound' is not two lowercase hex chars")
    require(trainUpper <= valUpper,
      s"trainUpper ($trainUpper) must not exceed valUpper ($valUpper)")
    val b = bucketCol(idCol, salt)
    df.withColumn("bucket", b)
      .withColumn("split",
        when(col("bucket") < lit(trainUpper), lit("train"))
          .when(col("bucket") < lit(valUpper), lit("val"))
          .otherwise(lit("test")))
  }

  /** K-fold cross-validation assignment — the evaluation twin of
    * [[hashSplit]]: every row lands in exactly one of `k` folds by
    * salted hash, so fold f's validation set is `fold = f` and its
    * training set is everything else, stable across re-runs, cluster
    * layouts, and incremental ingest (a new row joins one fold and
    * perturbs no other). The fold is the first 4 hex chars of
    * sha-256(id|salt|fold) mod k — the same narrow-map, shuffle-free
    * gate as every split here; the salt namespace ("|fold") keeps fold
    * membership independent of the train/val/test and order draws on
    * the same id. For GROUP-safe folds (no leakage across near-dup
    * clusters), pass the cluster id as `idCol` — the
    * `split_leakage_safe` composition. */
  def kfold(df: DataFrame, idCol: String, k: Int = 5,
      salt: String = DefaultSalt): DataFrame = {
    require(k >= 2 && k <= 65536, s"k must be in [2, 65536], got $k")
    val h = conv(substring(sha2(concat(col(s"`$idCol`").cast("string"),
      lit("|" + salt + "|fold")), 256), 1, 4), 16, 10).cast("long")
    df.withColumn("fold", h % k)
  }

  /** Deterministic global training order as (shard, shard_pos): rows land
    * in one of `numShards` shards by salted hash, ordered within each
    * shard by the full hash (lexical on lowercase hex = numeric). This IS
    * the scalable formulation of "shuffle the corpus": a reader that
    * walks shards round-robin sees a reproducible pseudo-random
    * permutation, yet the plan is ONE shuffle with `numShards`-way
    * parallel window sorts — never the single-task global row_number a
    * naive `ORDER BY hash` rank would compile to. At 100 TB, shards map
    * 1:1 onto output files (repartitionByRange + sortWithinPartitions
    * under the hood of a partitioned write); stability follows from the
    * [[hashSplit]] argument — membership and position are functions of
    * (id, salt) alone, so re-runs and incremental ingest cannot reorder
    * history. The salt is namespaced ("|order") so shard assignment is
    * independent of the split/sample gates drawn from the same id. */
  def shuffleOrder(df: DataFrame, idCol: String, numShards: Int = NumShards,
      salt: String = DefaultSalt): DataFrame =
    withShuffleOrder(df, idCol, numShards, salt)
      .select(col(s"`$idCol`"), col("shard"), col("shard_pos"))

  /** Train fraction of the observed time span for [[timeEmbargoSplit]]
    * (numerator/denominator — integer arithmetic, no float cutoff). */
  val EmbargoTrainNum = 7L
  val EmbargoTrainDen = 10L

  /** Temporal split with an EMBARGO gap — the leakage-safe protocol for
    * time-ordered data (de Prado '18 §7: purged splits): train is
    * everything before the cutoff, test everything at or after
    * cutoff + embargo, and the embargo window between them is DROPPED,
    * so no test example's look-back features overlap a training
    * example's look-ahead labels. The cutoff is derived from the
    * observed span by integer arithmetic (min + 7/10·(max−min)), so the
    * protocol is a pure function of the data, reproducible anywhere.
    * Output: one row per split (train/embargo/test) with event count
    * and the exact [min,max] event-time bounds — the audit a reviewer
    * checks for gap discipline (min(test) − max(train) ≥ embargo).
    *
    * Scale shape: the span bounds are a 1-row aggregate broadcast back
    * onto the scan (the scalar-subquery shape); the verdict is one
    * map-side-combined aggregation over 3 keys. Never a sort. */
  def timeEmbargoSplit(df: DataFrame, tsCol: Column, embargoUs: Long): DataFrame = {
    require(embargoUs >= 0, s"embargo must be nonnegative, got $embargoUs")
    val bounds = df.agg(min(tsCol).as("__mn"), max(tsCol).as("__mx"))
    df.select(tsCol.as("__t"))
      .crossJoin(org.apache.spark.sql.functions.broadcast(bounds))
      // `div`, not `/`: Column./ on longs compiles to IEEE division and
      // the cutoff would drift from the oracle's exact integer `//`
      .withColumn("__cut",
        expr(s"__mn + ((__mx - __mn) * $EmbargoTrainNum) div $EmbargoTrainDen"))
      .withColumn("split",
        when(col("__t") < col("__cut"), "train")
          .when(col("__t") >= col("__cut") + embargoUs, "test")
          .otherwise("embargo"))
      .groupBy(col("split"))
      .agg(count(lit(1)).as("n_events"),
        min(col("__t")).as("min_ts"), max(col("__t")).as("max_ts"))
  }

  /** DuckDB half of [[timeEmbargoSplit]] (same integer cutoff). */
  def timeEmbargoOracle(table: String, tsExpr: String, embargoUs: Long): String =
    s"""WITH b AS (SELECT min($tsExpr) AS mn, max($tsExpr) AS mx FROM $table),
       |c AS (SELECT mn + (mx - mn) * $EmbargoTrainNum // $EmbargoTrainDen AS cut FROM b),
       |s AS (SELECT CASE WHEN ($tsExpr) < c.cut THEN 'train'
       |               WHEN ($tsExpr) >= c.cut + $embargoUs THEN 'test'
       |               ELSE 'embargo' END AS split, ($tsExpr) AS t
       |      FROM $table, c)
       |SELECT split, count(*)::BIGINT AS n_events,
       |  min(t)::BIGINT AS min_ts, max(t)::BIGINT AS max_ts
       |FROM s GROUP BY 1""".stripMargin

  /** [[shuffleOrder]] keeping every input column — the writer-side form
    * ([[graft.sources.TextIngest.writeShuffled]]): computing the order
    * in place costs one window shuffle, where joining the projected
    * form back would cost two more. */
  def withShuffleOrder(df: DataFrame, idCol: String, numShards: Int = NumShards,
      salt: String = DefaultSalt): DataFrame = {
    require(numShards > 0, s"numShards must be positive, got $numShards")
    val h = sha2(concat(col(s"`$idCol`").cast("string"), lit("|" + salt + "|order")), 256)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard")).orderBy(col("__h").asc, col(s"`$idCol`").asc)
    df.withColumn("__h", h)
      .withColumn("shard", conv(substring(col("__h"), 1, 4), 16, 10).cast("long") % numShards)
      .withColumn("shard_pos", row_number().over(w).cast("long"))
      .drop("__h")
  }
}
