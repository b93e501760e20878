package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding-column transforms for vector corpora: int8 scalar
  * quantization (the storage/bandwidth workhorse of large-scale vector
  * search — 4× smaller than float32 with ~no recall loss at rerank).
  *
  * Everything is a pure narrow map over `array<float>` — no UDFs, no
  * shuffle; at 100 TB these are scan-side rewrites that fuse with the
  * reading stage. Determinism contract with the DuckDB oracle
  * ([[Oracles]]): the max-abs reduction is order-independent (max is
  * exact in any order, unlike a float sum), the scale is ONE IEEE
  * division of that max, and codes round half-away-from-zero — the
  * rounding both Spark's `round` (HALF_UP on BigDecimal) and DuckDB's
  * `round` implement. No float accumulations cross rows or elements
  * except exact-integer code sums.
  */
object Embeddings {

  /** Quantization range of a signed int8 symmetric quantizer. */
  val Int8Max = 127.0d

  /** Per-element |x| as double (float→double cast is exact). */
  private def absChain(e: Column): Column =
    aggregate(e, lit(0.0d), (acc, x) => greatest(acc, abs(x.cast("double"))))

  /** Symmetric per-vector int8 quantization: amax = max |xᵢ|,
    * scale = amax / 127, codeᵢ = round(xᵢ · 127 / amax) ∈ [−127, 127].
    * The all-zero vector (amax = 0) quantizes to all-zero codes with
    * scale 0 — no division ever sees a zero denominator. `code_l1`
    * (Σ|codeᵢ|, an exact integer) rides along as the reconstruction
    * checksum: it pins the whole code vector against the oracle without
    * comparing 64 columns. Dequantization is codeᵢ · scale. */
  def quantizeInt8(df: DataFrame, idCol: String = "vec_id",
      embCol: String = "embedding"): DataFrame = {
    val withAmax = df
      .select(col(s"`$idCol`"), col(s"`$embCol`").as("__e"))
      .withColumn("amax", absChain(col("__e")))
    withAmax
      .withColumn("scale", col("amax") / Int8Max)
      .withColumn("codes",
        when(col("amax") === 0.0d,
          transform(col("__e"), _ => lit(0)))
          .otherwise(transform(col("__e"), x =>
            round(x.cast("double") * Int8Max / col("amax"), 0).cast("int"))))
      .withColumn("code_l1",
        aggregate(col("codes"), lit(0L), (acc, c) => acc + abs(c).cast("long")))
      .select(col(s"`$idCol`"), col("amax"), col("scale"), col("codes"), col("code_l1"))
  }

  /** Offset for [[centroidOutliers]] fixed-point quantization: element
    * values must lie in (−Shift, Shift) so the shifted quantized values
    * are non-negative — where truncating (Spark `div`) and flooring
    * (DuckDB `//`) integer division agree. Distances are shift-invariant
    * up to the deterministic per-element floor. */
  val CentroidShift = 4.0d

  /** Outliers reported per group (oracle-pinned default). */
  val OutlierTopK = 3

  /** Per-group outliers: retrieve the `topK` vectors FARTHEST from their
    * group's centroid — the embedding-space QA sweep (mislabeled /
    * corrupted / off-manifold members of a cluster or source).
    *
    * All arithmetic is exact-integer: qᵢ = floor((xᵢ + Shift) · 2²⁰) is a
    * long, the group sums are order-independent long adds, the centroid
    * is the integer mean sᵢ div n, and dist² = Σ (qᵢ − cᵢ)² stays within
    * long range (≤ 64 · 2⁴⁶ at Shift 4). A float mean or a float
    * distance sum would be partial-aggregation-order dependent — this is
    * the [[Ann.CentroidQuant]] move applied to the whole metric.
    *
    * Scale shape: one groupBy over fixed-width quantized columns (64
    * longs per row, map-side combinable; group count = label
    * cardinality), the centroid table broadcast back onto the scan, and
    * a per-group top-k window — no shuffle carries raw vectors beyond
    * the first aggregation. */
  def centroidOutliers(df: DataFrame, labelCol: String = "label",
      idCol: String = "vec_id", embCol: String = "embedding",
      dim: Int = Ann.Dim, topK: Int = OutlierTopK): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val q = (1 to dim).map(i =>
      floor((element_at(col(embCol), i).cast("double") + lit(CentroidShift))
        * lit(Ann.CentroidQuant)).cast("long").as(s"q$i"))
    val base = df.select(
      col(s"`$labelCol`").cast("long").as("label") +: col(s"`$idCol`").as("vec_id") +: q: _*)
    val aggs = (1 to dim).map(i => sum(col(s"q$i")).as(s"s$i")) :+ count(lit(1)).as("n")
    val cents = base.groupBy(col("label")).agg(aggs.head, aggs.tail: _*)
    val dist2 = (1 to dim).map { i =>
      val d = col(s"q$i") - expr(s"s$i div n")
      d * d
    }.reduce(_ + _)
    val w = Window.partitionBy(col("label")).orderBy(col("dist2").desc, col("vec_id"))
    base.join(broadcast(cents), "label")
      .withColumn("dist2", dist2)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= topK)
      .select(col("label"), col("vec_id"), col("dist2"), col("n").as("n_members"))
  }

  /** Per-label centroid DRIFT between two corpus slices — the
    * embedding-pipeline monitoring gate ("did the encoder or the
    * upstream corpus move?") run between snapshots, here between the
    * even and odd vec_id halves. Same exact-integer contract as
    * [[centroidOutliers]]: quantize, sum as longs, integer-mean via
    * truncating div, and drift² = Σᵢ (c_new,i − c_old,i)² stays a
    * BIGINT — no float ever enters, so the oracle hash-checks the
    * drift itself. Labels missing either slice are excluded (a
    * drift needs both ends).
    *
    * Scale shape: ONE map-side-combinable aggregate over the scan (the
    * 2·dim conditional sums widen the row, never add a pass); the
    * drift arithmetic runs on |labels| metadata rows. */
  def centroidDrift(df: DataFrame, labelCol: String = "label",
      idCol: String = "vec_id", embCol: String = "embedding",
      dim: Int = Ann.Dim): DataFrame = {
    val q = (1 to dim).map(i =>
      floor((element_at(col(embCol), i).cast("double") + lit(CentroidShift))
        * lit(Ann.CentroidQuant)).cast("long").as(s"q$i"))
    val base = df.select(
      col(s"`$labelCol`").cast("long").as("label") +:
        (col(s"`$idCol`") % 2).as("slice") +: q: _*)
    val aggs =
      (1 to dim).flatMap(i => Seq(
        sum(when(col("slice") === 0, col(s"q$i")).otherwise(0L)).as(s"so$i"),
        sum(when(col("slice") === 1, col(s"q$i")).otherwise(0L)).as(s"sn$i"))) ++
        Seq(sum(when(col("slice") === 0, 1L).otherwise(0L)).as("n_old"),
          sum(when(col("slice") === 1, 1L).otherwise(0L)).as("n_new"))
    val drift2 = (1 to dim).map { i =>
      val d = expr(s"sn$i div n_new") - expr(s"so$i div n_old")
      d * d
    }.reduce(_ + _)
    base.groupBy(col("label")).agg(aggs.head, aggs.tail: _*)
      .filter(col("n_old") > 0 && col("n_new") > 0)
      .select(col("label"), col("n_old"), col("n_new"), drift2.as("drift2"))
  }

  /** DuckDB half of [[centroidDrift]] — same quantization, truncating
    * `//` mean, integer drift chain. */
  def centroidDriftOracle(table: String = "embeddings", dim: Int = Ann.Dim): String = {
    val sums = (1 to dim).flatMap(i => Seq(
      s"sum(CASE WHEN vec_id % 2 = 0 THEN floor((embedding[$i]::DOUBLE + $CentroidShift) * ${Ann.CentroidQuant})::BIGINT ELSE 0 END) AS so$i",
      s"sum(CASE WHEN vec_id % 2 = 1 THEN floor((embedding[$i]::DOUBLE + $CentroidShift) * ${Ann.CentroidQuant})::BIGINT ELSE 0 END) AS sn$i"))
      .mkString(",\n       |    ")
    val chain = (1 to dim).map(i =>
      s"((sn$i // n_new) - (so$i // n_old)) * ((sn$i // n_new) - (so$i // n_old))")
      .mkString(" + ")
    s"""WITH s AS (SELECT label::BIGINT AS label,
       |    sum(CASE WHEN vec_id % 2 = 0 THEN 1 ELSE 0 END)::BIGINT AS n_old,
       |    sum(CASE WHEN vec_id % 2 = 1 THEN 1 ELSE 0 END)::BIGINT AS n_new,
       |    $sums
       |  FROM $table GROUP BY 1)
       |SELECT label, n_old, n_new, CAST($chain AS BIGINT) AS drift2
       |FROM s WHERE n_old > 0 AND n_new > 0""".stripMargin
  }

  /** Gram-matrix quantization scale (2^20 — the [[graft.pipeline.Ann.CentroidQuant]]
    * move): elements quantize to exact integers, so every partial sum is
    * order-independent and the oracle re-derives the matrix bit-for-bit. */
  val GramQuant = 1048576.0d

  /** Exact-integer Gram matrix over the embedding corpus — the
    * second-moment accumulation behind PCA/whitening/ZCA pipelines.
    * Each element quantizes to qᵢ = floor(xᵢ · 2²⁰) (a long); the output
    * is the upper triangle (i ≤ j) of Σ_v qᵢ(v)·qᵢ(v) with the corpus
    * count riding along — covariance is (s/n − μᵢμⱼ) downstream in
    * whatever precision the consumer wants, but the ACCUMULATED moment
    * itself is exact and engine-independent (a float Gram sum would be
    * partial-aggregation-order dependent and unverifiable).
    *
    * Scale shape: explode to (vec, dim, q) rows (narrow), self-join on
    * vec_id (i ≤ j) — per-vector fan-out is Dim²/2, independent of
    * corpus size — then ONE map-side-combinable aggregation into
    * Dim²/2 groups. Long-range bound: |x| < 4 ⟹ |q| ≤ 2²², so a
    * product is ≤ 2⁴⁴ and 2⁰⁹ vectors fit a long; beyond that switch
    * the sum to DECIMAL(38,0) (same contract, wider accumulator). */
  /** [[whiten]] subspace width default: the leading block of the
    * covariance that gets whitened. The Cholesky/substitution chain is
    * GENERATED from the recurrence for any d in [2, 8] (d² expression
    * columns — past ~8 the d×d solve belongs driver-side on collected
    * moments, same two-pass plan); 4 keeps the oracle SQL readable. */
  val WhitenDims = 4

  /** [[whiten]] quantization (2¹⁰): coarser than [[GramQuant]] because
    * the covariance entries are n·Σqq − (Σq)², i.e. O(n²·q²) — with
    * |x| < 4 ⟹ |q| ≤ 2¹², products ≤ 2²⁴ and ~7·10⁵ vectors fit the
    * long accumulator (DuckDB's BIGINT sums widen to HUGEINT, so the
    * Spark side is the binding constraint; beyond that, swap the sums
    * to DECIMAL(38,0) — same contract). */
  val WhitenQuant = 1024.0d

  /** Whitening over the leading [[WhitenDims]] dimensions — the
    * decorrelation step of PCA/ZCA feature pipelines, as one
    * oracle-checkable plan. The second moments accumulate as EXACT
    * integers (the [[gramMatrix]] move, at [[WhitenQuant]]); the scaled
    * covariance C = n·G − s·sᵀ is Cholesky-factored in an UNROLLED,
    * fixed-order chain of IEEE double ops (sqrt/divide/multiply-subtract
    * — each correctly rounded, no transcendentals), and each row's
    * centered coordinates forward-substitute through L. Fixed op order +
    * exact integer inputs ⟹ bit-identical results on any IEEE engine,
    * which is what lets DuckDB check a numerical-linear-algebra operator
    * it cannot eigendecompose. (Cholesky whitening, not eigen-whitening:
    * same decorrelation guarantee — cov(w) = I — different basis; the
    * scale factors cancel, n·(q−μ) / (n·L_cov) = L_cov⁻¹(q−μ).)
    *
    * Scale shape: one map-side-combinable 15-sum aggregation over the
    * corpus (count + 4 sums + 10 moments), a 1-row broadcast back onto
    * the scan, and a narrow per-row transform — the same two-pass shape
    * as any global-statistic normalization; nothing keyed, nothing
    * skewed. */
  def whiten(df: DataFrame, idCol: String = "vec_id",
      embCol: String = "embedding", dims: Int = WhitenDims): DataFrame = {
    val d = dims
    require(d >= 2 && d <= 8, s"dims must be in [2, 8], got $d")
    val qCols = (1 to d).map(i =>
      floor(element_at(col(s"`$embCol`"), i).cast("double") * WhitenQuant)
        .cast("long").as(s"q$i"))
    val base = df.select((col(s"`$idCol`").as("vec_id") +: qCols): _*)
    val aggExprs =
      Seq(count(lit(1)).as("n")) ++
        (1 to d).map(i => sum(col(s"q$i")).as(s"s$i")) ++
        (for { i <- 1 to d; j <- i to d }
          yield sum(col(s"q$i") * col(s"q$j")).as(s"g$i$j"))
    val stats = base.agg(aggExprs.head, aggExprs.tail: _*)
    var t = base.crossJoin(broadcast(stats))
    for { i <- 1 to d; j <- i to d }
      t = t.withColumn(s"c$i$j",
        (col("n") * col(s"g$i$j") - col(s"s$i") * col(s"s$j")).cast("double"))
    // Cholesky chain GENERATED from the recurrence, left-associated
    // subtractions — the SQL oracle emits the same expressions from the
    // same loops, which is the cross-engine bit-identity contract:
    //   l_jj = sqrt(c_jj − Σ_{k<j} l_jk²)
    //   l_ij = (c_ji − Σ_{k<j} l_ik·l_jk) / l_jj   (i > j)
    for (j <- 1 to d) {
      val diag = (1 until j).foldLeft(col(s"c$j$j"))((acc, k) =>
        acc - col(s"l$j$k") * col(s"l$j$k"))
      t = t.withColumn(s"l$j$j", sqrt(diag))
      for (i <- j + 1 to d) {
        val num = (1 until j).foldLeft(col(s"c$j$i"))((acc, k) =>
          acc - col(s"l$i$k") * col(s"l$j$k"))
        t = t.withColumn(s"l$i$j", num / col(s"l$j$j"))
      }
    }
    for (i <- 1 to d)
      t = t.withColumn(s"x$i",
        (col("n") * col(s"q$i") - col(s"s$i")).cast("double"))
    // forward substitution: w_i = (x_i − Σ_{k<i} l_ik·w_k) / l_ii
    for (i <- 1 to d) {
      val num = (1 until i).foldLeft(col(s"x$i"))((acc, k) =>
        acc - col(s"l$i$k") * col(s"w$k"))
      t = t.withColumn(s"w$i", num / col(s"l$i$i"))
    }
    t.select(col("vec_id") +: (1 to d).map(i => col(s"w$i")): _*)
  }

  def gramMatrix(df: DataFrame, idCol: String = "vec_id",
      embCol: String = "embedding"): DataFrame = {
    val dims = array((1 to graft.pipeline.Ann.Dim).map(i =>
      struct(lit(i).as("i"),
        floor(element_at(col(s"`$embCol`"), i).cast("double") * GramQuant)
          .cast("long").as("q"))): _*)
    val rows = df.select(col(s"`$idCol`").as("__v"), explode(dims).as("dq"))
      .select(col("__v"), col("dq.i").as("i"), col("dq.q").as("q"))
    val a = rows.select(col("__v"), col("i"), col("q").as("qa"))
    val b = rows.select(col("__v"), col("i").as("j"), col("q").as("qb"))
    a.join(b, Seq("__v")).filter(col("i") <= col("j"))
      .groupBy(col("i"), col("j"))
      .agg(count(lit(1)).as("n"), sum(col("qa") * col("qb")).as("s"))
  }
}
