package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic stratified sampling: keep each row with a per-stratum
  * rate (e.g. downsample web text to 10%, keep all books), where
  * membership is a pure function of (id, salt) — the same stability
  * argument as [[Splits]]: `rand()`-based sampling re-draws membership
  * whenever partitioning changes, silently changing the corpus between
  * pipeline versions; hash-gated sampling is reproducible on any
  * cluster layout and composes with incremental ingest (previously
  * sampled rows never flip). A pure narrow map — no shuffle.
  *
  * Gate: the first four hex chars of sha-256(id|salt) — a 65,536-cell
  * grid compared LEXICALLY against a per-stratum boundary (lowercase hex
  * order == numeric order in every engine; boundaries quantize rates to
  * ~0.0015%). Strata not named in `rates` keep everything (rate 1.0).
  */
object Sampling {

  val DefaultSalt = "graft-sample"

  /** The lexical gate boundary for a rate: the 4-hex-char cell index
    * `floor(rate · 65536)`, shared verbatim with the oracle SQL. */
  def hexBound(rate: Double): String = {
    require(rate >= 0.0 && rate <= 1.0, s"rate out of [0,1]: $rate")
    f"${math.min((rate * 65536).toLong, 65535L)}%04x"
  }

  private[pipeline] def gateCol(idCol: String, salt: String): Column =
    substring(sha2(concat(col(s"`$idCol`").cast("string"), lit("|" + salt)), 256), 1, 4)

  /** Per-stratum quota capping: keep the top `k` rows of every stratum by
    * `scoreCol` (descending, `idCol` ascending tie-break) — the domain/
    * source capping step of web-corpus curation (a handful of giant
    * domains must not dominate the training mix; cf. CCNet/RefinedWeb-
    * style per-domain quotas).
    *
    * Scale shape: ONE shuffle on the stratum key + a per-group sort,
    * emitted through a rank filter (Spark pushes a rank-limit into the
    * window sort at execution). Caveat at extreme skew: a stratum is one
    * task's sort; a pathological mega-stratum would want a pre-filter by
    * score quantile first — composable with this operator, not built in. */
  def capPerStratum(df: DataFrame, idCol: String, strataCol: String,
      scoreCol: String, k: Int): DataFrame = {
    require(k > 0, s"quota must be positive, got $k")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(s"`$strataCol`"))
      .orderBy(col(s"`$scoreCol`").desc, col(s"`$idCol`").asc)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .drop("__rn")
  }

  /** Exact-k uniform sample per stratum: rank rows inside each stratum
    * by the salted hash of their id and keep the k smallest — a
    * reproducible uniform draw (every row equally likely under the
    * random-oracle hash) that completes the sampling triad: rate-based
    * ([[stratified]]), score-based ([[capPerStratum]]), and uniform
    * exact-k (this — the eval-set builder: "200 random docs per
    * language, same 200 every run"). One shuffle on the stratum key;
    * same skew caveat as [[capPerStratum]]. */
  def uniformPerStratum(df: DataFrame, idCol: String, strataCol: String,
      k: Int, salt: String = DefaultSalt): DataFrame = {
    require(k > 0, s"sample size must be positive, got $k")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(s"`$strataCol`"))
      .orderBy(gateCol(idCol, salt).asc, col(s"`$idCol`").asc)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .drop("__rn")
  }

  /** CLASS-BALANCED exact downsample — [[uniformPerStratum]] with the
    * quota set BY THE DATA: every class is cut to the size of the
    * smallest class (the classic imbalanced-training fix), drawn in
    * salted-hash order so the balanced set is reproducible and stable
    * under re-runs. Unlike a fixed-k cap, the quota moves with the
    * corpus — the operator's contract is "perfectly balanced output"
    * rather than "at most k per class".
    *
    * Scale shape: one class-cardinality-sized count aggregate, its
    * 1-row minimum broadcast back (scalar-subquery shape), one window
    * shuffle on the class key — the [[capPerStratum]] plan plus a
    * broadcast; same mega-stratum caveat. */
  def classBalance(df: DataFrame, idCol: String, classCol: String,
      salt: String = DefaultSalt): DataFrame = {
    val minN = df.groupBy(col(s"`$classCol`")).agg(count(lit(1)).as("__n"))
      .agg(min(col("__n")).as("__min"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(s"`$classCol`"))
      .orderBy(gateCol(idCol, salt).asc, col(s"`$idCol`").asc)
    df.crossJoin(org.apache.spark.sql.functions.broadcast(minN))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= col("__min"))
      .drop("__rn", "__min")
  }

  /** DuckDB half of [[classBalance]] (same salted order, same
    * data-derived quota). */
  def classBalanceOracle(table: String, idCol: String, classCol: String,
      outCols: String, salt: String = DefaultSalt): String =
    s"""WITH m AS (SELECT min(n) AS mn FROM
       |       (SELECT count(*) AS n FROM $table GROUP BY $classCol)),
       |r AS (SELECT $outCols,
       |        row_number() OVER (PARTITION BY $classCol
       |          ORDER BY substr(sha256($idCol::VARCHAR || '|$salt'), 1, 4), $idCol) AS rn
       |      FROM $table)
       |SELECT $outCols FROM r, m WHERE rn <= m.mn""".stripMargin

  /** Token-budgeted mixture sampling (the data-mixture step of
    * Dolma/DataComp-style recipes: "X% of the training tokens from each
    * source"): integer source weights allocate a global token budget
    * proportionally — budget_s = (budget · w_s) div W, all exact longs —
    * and each source admits its documents in salted-hash order (the
    * reproducible uniform shuffle of [[uniformPerStratum]]) until the
    * budget is consumed. A document is admitted iff the tokens admitted
    * BEFORE it are still under budget, so the straddling document lands
    * (a source always contributes ≥ 1 document; the overshoot is one
    * document — packing's "last window runs short" pragmatism). Emits
    * the full decision table (per-doc token count, cumulative-before,
    * budget, verdict), not just survivors — the audit artifact a mixture
    * pipeline keeps.
    *
    * Scale shape: the weight/budget table is source-cardinality-sized
    * (distinct + broadcast); the corpus pass is one window per source
    * partition with a running long sum — one shuffle on the source key.
    * Same mega-stratum caveat as [[capPerStratum]]; the two-phase
    * [[graft.operators.PrefixSum]] is the remedy if one source dominates.
    * Weights are INTEGERS so W sums exactly in any order (a float weight
    * sum would be partial-aggregation-order dependent). */
  def mixTokenBudget(df: DataFrame, idCol: String, sourceCol: String,
      textCol: String, weights: Seq[(String, Long)], defaultWeight: Long,
      budget: Long, salt: String = DefaultSalt): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    require(defaultWeight >= 0 && weights.forall(_._2 >= 0), "negative weight")
    // W = 0 divides by zero (null budgets in Spark, an ERROR in the
    // oracle engine): with a positive default every census row weighs
    // ≥ 1; an all-zero config is rejected here rather than diverging
    require(defaultWeight > 0 || weights.exists(_._2 > 0),
      "all weights zero: the weight total must be positive")
    val wexpr = weights.foldRight(lit(defaultWeight): Column) {
      case ((s, w), els) => when(col(s"`$sourceCol`") === s, lit(w)).otherwise(els)
    }
    // W via an unpartitioned window over the SOURCE CENSUS — a
    // source-cardinality frame (distinct output), never the corpus, so
    // the single task holds rows = number of sources, not documents.
    // (Names must differ by more than case: default case-insensitive
    // resolution folds `__w`/`__W` into one column.)
    val budgets = df.select(col(s"`$sourceCol`")).distinct()
      .withColumn("__w", wexpr)
      .withColumn("__wtot", sum(col("__w")).over(
        org.apache.spark.sql.expressions.Window.partitionBy()))
      .withColumn("budget", expr(s"($budget * __w) div __wtot"))
      .select(col(s"`$sourceCol`"), col("budget"))
    val toks = df.select(
      col(s"`$idCol`"), col(s"`$sourceCol`"),
      size(TextPipeline.tokens(col(s"`$textCol`"))).cast("long").as("n_tokens"),
      gateCol(idCol, salt).as("__gate"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(s"`$sourceCol`"))
      .orderBy(col("__gate").asc, col(s"`$idCol`").asc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    toks.join(broadcast(budgets), sourceCol)
      .withColumn("cum_before", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .withColumn("admitted", col("cum_before") < col("budget"))
      .select(col(s"`$idCol`"), col(s"`$sourceCol`"), col("n_tokens"),
        col("cum_before"), col("budget"), col("admitted"))
  }

  /** Temperature-flattened corpus mixing (the multilingual-corpus
    * resampling of mBERT/XLM-R style pipelines at α = 0.5): keep each
    * stratum with rate √(n_min / n_s), so a stratum's expected surviving
    * count is √(n_min · n_s) — the geometric mean, flattening the size
    * distribution halfway toward uniform while never upsampling. Rates
    * are DERIVED FROM THE DATA in-plan (a per-stratum count aggregate
    * broadcast back onto the scan), not configured: two jobs' worth of
    * stages but the second pass is a pure scan-side gate, zero wide
    * exchange over the corpus — the shape that matters at 100 TB.
    *
    * Cross-engine determinism: the rate is sqrt(exactLong / exactLong) —
    * one IEEE division + IEEE sqrt, bit-identical everywhere; the gate
    * compares the numeric 4-hex cell against floor(rate · 65536) (the
    * minimal stratum's rate 1.0 yields bound 65536 > every cell, keeping
    * all rows with no special case). */
  def temperatureMix(df: DataFrame, idCol: String, strataCol: String,
      salt: String = DefaultSalt): DataFrame = {
    val counts = df.groupBy(col(s"`$strataCol`")).agg(count(lit(1)).as("n_stratum"))
    val minN = counts.agg(min(col("n_stratum")).as("__nmin"))
    val rates = counts.crossJoin(broadcast(minN))
      .withColumn("rate", sqrt(col("__nmin").cast("double") / col("n_stratum")))
      .select(col(s"`$strataCol`"), col("n_stratum"), col("rate"))
    df.join(broadcast(rates), strataCol)
      .withColumn("gate", gateCol(idCol, salt))
      .filter(conv(col("gate"), 16, 10).cast("long") < floor(col("rate") * lit(65536.0d)))
      .select(col(s"`$idCol`"), col(s"`$strataCol`"), col("n_stratum"), col("rate"), col("gate"))
  }

  /** Quality-weighted Bernoulli sampling: keep each row with probability
    * proportional to a non-negative integer weight column, normalized
    * in-plan by the corpus weight maximum (the heaviest row is kept with
    * p = 1) — the score-proportional downsampling of quality-classifier
    * pipelines ("keep high-quality documents more often"), deterministic
    * like the rest of the triad. The gate is salted with a `|weight`
    * namespace so composing with [[stratified]]/[[uniformPerStratum]]
    * draws INDEPENDENT coins.
    *
    * Cross-engine determinism: the keep test is pure integer arithmetic —
    * cell · w_max < w · 65536 — no float rate, no rounding boundary.
    * Scale shape: one tiny max() aggregate broadcast back onto the scan;
    * the pass over the corpus itself is a zero-exchange filtered scan,
    * same as [[stratified]]. */
  def weightedBernoulli(df: DataFrame, idCol: String, weightCol: String,
      salt: String = DefaultSalt): DataFrame = {
    val w = col(s"`$weightCol`").cast("long")
    val wmax = df.agg(max(w).as("__wmax"))
    df.crossJoin(broadcast(wmax))
      .withColumn("gate", gateCol(idCol, salt + "|weight"))
      .filter(conv(col("gate"), 16, 10).cast("long") * col("__wmax") < w * lit(65536L))
      .drop("__wmax")
  }

  /** Rows surviving the per-stratum gate, with the gate cell surfaced as
    * `gate` for auditability. A rate of exactly 1.0 keeps every row of
    * the stratum (no boundary comparison — 'ffff' would drop cell ffff). */
  def stratified(df: DataFrame, idCol: String, strataCol: String,
      rates: Map[String, Double], salt: String = DefaultSalt): DataFrame = {
    val gate = gateCol(idCol, salt)
    val keep = rates.toSeq.sortBy(_._1).foldRight(lit(true): Column) {
      case ((stratum, rate), els) =>
        when(col(s"`$strataCol`") === stratum,
          if (rate >= 1.0) lit(true) else gate < lit(hexBound(rate))).otherwise(els)
    }
    df.withColumn("gate", gate).filter(keep)
  }
}
