package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{functions => F}

/** Column-level data profiling — the schema-health primitive run before
  * any corpus lands in a training mix (null saturation, cardinality
  * collapse, constant columns, key-ness checks).
  *
  * One pass: every row melts to (column, value-as-string) pairs and one
  * hash aggregation computes per-column null and exact distinct counts.
  * The melt multiplies rows by the column count, but each pair is narrow
  * (two strings) and the aggregate is hash-based with map-side partials;
  * the exact distinct is the honest profile — callers that can trade
  * exactness for a constant-memory sketch at petabyte width use the KMV
  * sketch (`sketch_kmv_distinct`) per column instead.
  *
  * String casting is round-trip (injective) for every atomic Spark type,
  * so distinct-on-rendering equals distinct-on-value; NULL survives the
  * cast, so null counts are unaffected. The one IEEE wrinkle — -0.0 and
  * 0.0 render as distinct strings but compare equal as values — is
  * closed by adding +0.0 to float/double columns before the cast
  * (-0.0 + 0.0 = 0.0; every other value, including NaN and ±Inf, is
  * unchanged).
  */
object Profile {

  /** One row per column of `df`: `(col_name, n_nulls, n_distinct)`
    * (distinct excludes NULL, per SQL convention). */
  def columns(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.{DoubleType, FloatType}
    val entries = df.schema.fields.flatMap { f =>
      val raw = col(s"`${f.name}`")
      val v = f.dataType match {
        case FloatType | DoubleType => raw + lit(0.0) // collapse -0.0
        case _ => raw
      }
      Seq(lit(f.name), v.cast("string"))
    }
    df.select(explode(map(entries: _*)).as(Seq("col_name", "v")))
      .groupBy(col("col_name"))
      .agg((F.count(lit(1)) - F.count(col("v"))).as("n_nulls"),
        countDistinct(col("v")).as("n_distinct"))
  }

  /** [[driftChi2]] bucket edges over the monitored value (top bucket
    * catches everything above the last edge). */
  val DriftEdges: Seq[Long] = Seq(128L, 256L, 512L, 1024L, 2048L, 4096L)

  /** Distribution-drift monitor — Pearson's chi-square of each source's
    * value histogram against the corpus-wide reference: the
    * ingest-monitoring gate that catches a crawler or upstream feed
    * whose length/quality profile shifted (the PSI alternative without
    * PSI's logarithm, which is banned here: libm differs across
    * engines). χ²(src) = Σ_b (o_b − e_b)²/e_b with e_b = g_b·n_src/N —
    * conditional-sum histograms (one pass, no pivot shuffle), a 1-row
    * global broadcast, and the bucket terms added in FIXED WRITTEN
    * ORDER, so the float statistic is engine-deterministic (a groupBy
    * SUM of float terms would be partial-aggregation-order dependent
    * and unverifiable).
    *
    * Scale shape: one map-side-combinable aggregation per side over the
    * scan + a 1-row broadcast; at 100 TB the moving rows are |sources| ×
    * |buckets| counts, never documents. */
  def driftChi2(df: DataFrame, sourceCol: String, valueCol: Column): DataFrame = {
    val edges = DriftEdges
    def bucketOf(v: Column): Column = edges.foldRight(lit(edges.last * 2)) {
      (e, rest) => when(v <= e, lit(e)).otherwise(rest)
    }
    val allBuckets = edges :+ edges.last * 2
    val b = df.select(col(s"`$sourceCol`").as("src"), bucketOf(valueCol).as("b"))
    def histAggs(prefix: String) =
      count(lit(1)).as(s"${prefix}n") +:
        allBuckets.map(e => F.sum(when(col("b") === e, 1L).otherwise(0L)).as(s"$prefix$e"))
    val per = b.groupBy(col("src")).agg(histAggs("o_").head, histAggs("o_").tail: _*)
    val global = b.agg(histAggs("g_").head, histAggs("g_").tail: _*)
    val joined = per.crossJoin(broadcast(global))
    val terms = allBuckets.map { e =>
      val o = col(s"o_$e").cast("double")
      val g = col(s"g_$e").cast("double")
      val exp = (g * col("o_n").cast("double")) / col("g_n").cast("double")
      when(col(s"g_$e") === 0L, lit(0.0d)).otherwise((o - exp) * (o - exp) / exp)
    }
    joined.select(col("src").as("source"), col("o_n").as("n_docs"),
      round(terms.reduce(_ + _), 4).as("chi2"))
  }

  /** DuckDB half of [[driftChi2]]: same conditional-sum histograms,
    * same fixed-order term chain. */
  def driftChi2Oracle(table: String, sourceCol: String, valueExpr: String): String = {
    val edges = DriftEdges
    val allBuckets = edges :+ edges.last * 2
    val chain = edges.foldRight(s"${edges.last * 2}") {
      (e, rest) => s"CASE WHEN v <= $e THEN $e ELSE $rest END"
    }
    def hist(prefix: String) =
      (s"count(*) AS ${prefix}n" +:
        allBuckets.map(e => s"sum(CASE WHEN b = $e THEN 1 ELSE 0 END)::BIGINT AS $prefix$e")).mkString(", ")
    val terms = allBuckets.map { e =>
      s"(CASE WHEN g_$e = 0 THEN 0.0 ELSE " +
        s"(o_$e::DOUBLE - (g_$e::DOUBLE * o_n::DOUBLE) / g_n::DOUBLE) * " +
        s"(o_$e::DOUBLE - (g_$e::DOUBLE * o_n::DOUBLE) / g_n::DOUBLE) / " +
        s"((g_$e::DOUBLE * o_n::DOUBLE) / g_n::DOUBLE) END)"
    }.mkString(" + ")
    s"""WITH v AS (SELECT $sourceCol AS src, ($valueExpr) AS v FROM $table),
       |bk AS (SELECT src, $chain AS b FROM v),
       |per AS (SELECT src, ${hist("o_")} FROM bk GROUP BY src),
       |g AS (SELECT ${hist("g_")} FROM bk)
       |SELECT src AS source, o_n AS n_docs, round($terms, 4) AS chi2 FROM per, g"""
      .stripMargin
  }

  /** Foreign-key DISCOVERY across candidate column pairs — the
    * schema-inference pass every warehouse catalog tool runs on
    * undocumented data: a pair (A.x → B.y) is FK-shaped when A.x's
    * value set is (nearly) CONTAINED in B.y's and B.y is (nearly)
    * unique. One row per candidate: distinct counts on both sides, the
    * contained-distinct count, containment = |x ∩ y| / |distinct x|,
    * and y's uniqueness = |distinct y| / |B|. Thresholding both near
    * 1.0 is the discovery rule (Rostin et al. '09); pairs far below
    * discriminate themselves.
    *
    * Scale shape per pair: two distinct-reductions that shuffle KEYS
    * only, one left-semi join between the distinct sets, three 1-row
    * aggregates — at 100 TB the distinct sets of id-like columns are
    * the small side of everything. Candidates are a declared list
    * (metadata-sized), not the n² column cross. */
  def fkCandidates(pairs: Seq[(String, DataFrame, String, String, DataFrame, String)]): DataFrame = {
    require(pairs.nonEmpty, "need at least one candidate pair")
    val stats = pairs.map { case (fkName, fk, fkCol, pkName, pk, pkCol) =>
      val fkD = fk.select(col(s"`$fkCol`").as("__v")).where(col("__v").isNotNull).distinct()
      val pkD = pk.select(col(s"`$pkCol`").as("__v")).where(col("__v").isNotNull).distinct()
      val nFk = fkD.agg(F.count(lit(1)).as("n_fk_distinct"))
      val nPk = pkD.agg(F.count(lit(1)).as("n_pk_distinct"))
      val nPkRows = pk.agg(F.count(lit(1)).as("n_pk_rows"))
      val contained = fkD.join(pkD, Seq("__v"), "left_semi")
        .agg(F.count(lit(1)).as("n_contained"))
      nFk.crossJoin(nPk).crossJoin(nPkRows).crossJoin(contained)
        .select(
          lit(s"$fkName.$fkCol").as("fk"), lit(s"$pkName.$pkCol").as("pk"),
          col("n_fk_distinct"), col("n_pk_distinct"), col("n_contained"),
          round(col("n_contained").cast("double") / col("n_fk_distinct").cast("double"), 4)
            .as("containment"),
          round(col("n_pk_distinct").cast("double") / col("n_pk_rows").cast("double"), 4)
            .as("pk_uniqueness"))
    }
    stats.reduce(_.unionAll(_))
  }

  /** ANALYZE-style NDV statistics at SKETCH cost — the stats-collection
    * pass a cost-based optimizer runs over every table: each declared
    * column's distinct count estimated by the shared KMV machinery
    * ([[Sketches.kmvDistinctByGroup]] — k minima of a deterministic
    * hash, (k−1)/U estimator, exact below k). [[columns]] is the exact
    * twin; at 100 TB exact countDistinct per column is a full-width
    * shuffle per column, while this ships k 8-byte minima per column —
    * and KMV sketches MERGE, so per-partition stats roll up to
    * table-level without rescanning (the `sketch_kmv_rollup` contract).
    *
    * Columns are cast to string BEFORE hashing on both engines, so the
    * declared list must stick to types with identical cross-engine
    * rendering (integers, strings, dates — not floats).
    *
    * Scale shape: ONE scan fanned out via explode(map) — rows move as
    * (col_name, value) pairs into a map-side-combined distinct, then a
    * per-column k-minima window over distinct hashes only. */
  def ndvProfile(df: DataFrame, cols: Seq[String], k: Int = 256): DataFrame = {
    require(cols.nonEmpty, "need at least one column")
    val entries = cols.flatMap(c => Seq(lit(c), col(s"`$c`").cast("string")))
    val kv = df.select(explode(map(entries: _*)).as(Seq("col_name", "v")))
    Sketches.kmvDistinctByGroup(kv, "col_name", "v", k)
  }

  /** DuckDB half of [[ndvProfile]]: the same explode (UNION ALL per
    * column) feeding the same KMV chain as
    * [[Sketches.kmvDistinctByGroupOracle]]. */
  def ndvProfileOracle(table: String, cols: Seq[String], k: Int = 256): String = {
    val kv = cols.map(c => s"SELECT '$c' AS col_name, $c::VARCHAR AS v FROM $table")
      .mkString(" UNION ALL ")
    s"""WITH kv AS ($kv),
       |h AS (SELECT DISTINCT col_name, ('0x' || substr(md5(v), 1, 15))::BIGINT AS hv
       |      FROM kv WHERE v IS NOT NULL),
       |r AS (SELECT col_name, hv,
       |        row_number() OVER (PARTITION BY col_name ORDER BY hv) AS rn FROM h),
       |m AS (SELECT col_name, count(*) AS k, max(hv) AS kth FROM r
       |      WHERE rn <= $k GROUP BY 1)
       |SELECT col_name, k, kth, CASE WHEN k < $k THEN k::DOUBLE
       |  ELSE (k - 1)::DOUBLE * ${Sketches.KmvHashSpace} / kth::DOUBLE END AS est_distinct
       |FROM m""".stripMargin
  }
}
