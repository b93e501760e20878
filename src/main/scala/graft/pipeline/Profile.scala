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
    // rebalance BEFORE the explode: a small parquet scans as one
    // partition, and the md5 over rows×columns values is the dominant
    // cost — single-threaded without this (measured 7.4 → 2.0 s at
    // sf0.1, isolated best-of-2). One round-robin exchange of the raw
    // rows buys a fully parallel hash stage.
    val kv = graft.core.Algebra.balanced(df.select(cols.map(c => col(s"`$c`")): _*))
      .select(explode(map(entries: _*)).as(Seq("col_name", "v")))
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

  /** Dictionary-encoding benefit estimate per string column — the
    * storage-planning pass behind "should this column be dict-encoded
    * in the table's file layout": raw cost is the plain byte mass,
    * dictionary cost is the distinct-value byte mass plus one
    * fixed-width code per row. Everything stays integer BITS
    * (code width = ceil(log2 ndv) via a power-of-two CASE ladder — no
    * libm), one double ratio at the end; ratio < 1 means the
    * dictionary wins.
    *
    * Scale shape: one map-side-combinable (column, value) count (the
    * shuffle carries distinct values once, with their counts), then a
    * per-column reduce; nothing re-reads the table. */
  def dictEstimate(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "need at least one column")
    val entries = cols.flatMap(c => Seq(lit(c), col(s"`$c`").cast("string")))
    val counts = df.select(explode(map(entries: _*)).as(Seq("col_name", "v")))
      .where(col("v").isNotNull)
      .groupBy(col("col_name"), col("v")).agg(count(lit(1)).as("cnt"))
    val per = counts.groupBy(col("col_name"))
      .agg(F.sum(col("cnt")).as("n"), count(lit(1)).as("ndv"),
        F.sum(col("cnt") * octet_length(col("v"))).as("raw_bytes"),
        F.sum(octet_length(col("v")).cast("long")).as("distinct_bytes"))
    // fold ASCENDING: the last step wraps outermost, so the largest
    // threshold is checked first (same inversion fix as benford's
    // magnitude ladder — the StatGatesSpec fixture is what catches it;
    // the oracle can't, because it is single-sourced from this fold)
    val codeBits = (1 to 30).foldLeft(lit(1)) { (rest, b) =>
      when(col("ndv") > (1L << (b - 1)), lit(b)).otherwise(rest)
    }
    per.withColumn("code_bits", codeBits.cast("long"))
      .select(col("col_name"), col("n"), col("ndv"),
        (col("raw_bytes") * 8).as("raw_bits"),
        (col("distinct_bytes") * 8 + col("n") * col("code_bits")).as("dict_bits"),
        round((col("distinct_bytes") * 8 + col("n") * col("code_bits")).cast("double") /
          (col("raw_bytes") * 8).cast("double"), 4).as("ratio"))
  }

  /** DuckDB half of [[dictEstimate]] — same ladder, same bit math. */
  def dictEstimateOracle(table: String, cols: Seq[String]): String = {
    val kv = cols.map(c => s"SELECT '$c' AS col_name, $c::VARCHAR AS v FROM $table")
      .mkString(" UNION ALL ")
    val ladder = (1 to 30).foldLeft("1") { (rest, b) =>
      s"CASE WHEN ndv > ${1L << (b - 1)} THEN $b ELSE $rest END"
    }
    s"""WITH kv AS ($kv),
       |c AS (SELECT col_name, v, count(*) AS cnt FROM kv WHERE v IS NOT NULL GROUP BY 1, 2),
       |p AS (SELECT col_name, CAST(sum(cnt) AS BIGINT) AS n, count(*) AS ndv,
       |        CAST(sum(cnt * strlen(v)) AS BIGINT) AS raw_bytes,
       |        CAST(sum(strlen(v)) AS BIGINT) AS distinct_bytes
       |      FROM c GROUP BY 1),
       |w AS (SELECT *, CAST($ladder AS BIGINT) AS code_bits FROM p)
       |SELECT col_name, n, ndv, raw_bytes * 8 AS raw_bits,
       |  distinct_bytes * 8 + n * code_bits AS dict_bits,
       |  round((distinct_bytes * 8 + n * code_bits)::DOUBLE / (raw_bytes * 8)::DOUBLE, 4) AS ratio
       |FROM w""".stripMargin
  }

  /** Re-identification bar for [[kAnonymity]] (classes smaller than
    * this are flagged). */
  val KAnonBar = 5

  /** k-anonymity census over a quasi-identifier combination — the
    * privacy/governance gate run before a table with demographic-ish
    * columns is released into a training mix: every row must hide in
    * an equivalence class of at least k rows sharing its
    * quasi-identifiers. Reports the census, not a verdict: total rows,
    * class count, the smallest class (the table's actual k), and how
    * many classes/rows fall below the bar.
    *
    * Scale shape: ONE keyed groupBy (map-side combinable) to class
    * sizes, then a 1-row reduce over |classes| metadata rows. */
  def kAnonymity(df: DataFrame, qis: Seq[Column], bar: Int = KAnonBar): DataFrame = {
    require(qis.nonEmpty, "need at least one quasi-identifier")
    val sizes = df.groupBy(qis: _*).agg(count(lit(1)).as("sz"))
    sizes.agg(
      F.sum(col("sz")).as("n_rows"),
      count(lit(1)).as("n_classes"),
      F.min(col("sz")).as("k_min"),
      F.sum(when(col("sz") < bar, 1L).otherwise(0L)).as("n_classes_below"),
      F.sum(when(col("sz") < bar, col("sz")).otherwise(0L)).as("n_rows_below"))
  }

  /** DuckDB half of [[kAnonymity]]. */
  def kAnonymityOracle(table: String, qiExprs: Seq[String], bar: Int = KAnonBar): String =
    s"""WITH c AS (SELECT ${qiExprs.mkString(", ")}, count(*) AS sz
       |      FROM $table GROUP BY ${(1 to qiExprs.size).mkString(", ")})
       |SELECT CAST(sum(sz) AS BIGINT) AS n_rows, count(*) AS n_classes,
       |  min(sz) AS k_min,
       |  sum(CASE WHEN sz < $bar THEN 1 ELSE 0 END)::BIGINT AS n_classes_below,
       |  CAST(sum(CASE WHEN sz < $bar THEN sz ELSE 0 END) AS BIGINT) AS n_rows_below
       |FROM c""".stripMargin

  /** l-diversity census — [[kAnonymity]]'s companion gate: a class can
    * be large (k-anonymous) yet expose a SENSITIVE attribute if every
    * member shares its value; distinct-l-diversity requires ≥ l
    * distinct sensitive values per quasi-identifier class. Reports
    * (n_classes, l_min, n_classes_below, n_rows_below) at the given
    * bar. Scale shape: one (QI, sensitive) distinct-ish groupBy, one
    * per-class reduce, one 1-row census — all map-side combinable. */
  def lDiversity(df: DataFrame, qis: Seq[Column], sensitive: Column,
      bar: Int = 2): DataFrame = {
    require(qis.nonEmpty, "need at least one quasi-identifier")
    val base = df.select(qis.zipWithIndex.map { case (q, i) => q.as(s"__q$i") } :+
      sensitive.as("__s"): _*)
    val classes = base
      .groupBy((qis.indices.map(i => col(s"__q$i")) :+ col("__s")): _*)
      .agg(count(lit(1)).as("__cnt"))
      .groupBy(qis.indices.map(i => col(s"__q$i")): _*)
      .agg(count(lit(1)).as("l"), F.sum(col("__cnt")).as("sz"))
    classes.agg(count(lit(1)).as("n_classes"),
      F.min(col("l")).as("l_min"),
      F.sum(when(col("l") < bar, 1L).otherwise(0L)).as("n_classes_below"),
      F.sum(when(col("l") < bar, col("sz")).otherwise(0L)).as("n_rows_below"))
  }

  /** DuckDB half of [[lDiversity]]. */
  def lDiversityOracle(table: String, qiExprs: Seq[String], sensitiveExpr: String,
      bar: Int = 2): String = {
    val qs = qiExprs.zipWithIndex.map { case (e, i) => s"$e AS q$i" }.mkString(", ")
    val qnames = qiExprs.indices.map(i => s"q$i").mkString(", ")
    s"""WITH b AS (SELECT $qs, $sensitiveExpr AS s FROM $table),
       |sv AS (SELECT $qnames, s, count(*) AS cnt FROM b GROUP BY ALL),
       |c AS (SELECT $qnames, count(*) AS l, CAST(sum(cnt) AS BIGINT) AS sz
       |      FROM sv GROUP BY ALL)
       |SELECT count(*) AS n_classes, min(l) AS l_min,
       |  sum(CASE WHEN l < $bar THEN 1 ELSE 0 END)::BIGINT AS n_classes_below,
       |  CAST(sum(CASE WHEN l < $bar THEN sz ELSE 0 END) AS BIGINT) AS n_rows_below
       |FROM c""".stripMargin
  }

  /** Benford first-digit expected probabilities log10(1+1/d), inlined
    * as full-precision DOUBLE LITERALS in both plans (computed once on
    * the driver — no libm call ever runs inside either engine, so the
    * ban on cross-engine transcendentals is not violated). */
  val BenfordP: Seq[Double] = (1 to 9).map(d => math.log10(1.0 + 1.0 / d))

  /** Benford first-digit conformance of a positive money column — the
    * classic fabricated-data / unit-mixup gate: compare the leading-
    * digit histogram against Benford's law by chi-square. The leading
    * digit is extracted ARITHMETICALLY (exact cents → a CASE ladder of
    * integer magnitude bounds — never via number-to-string formatting,
    * which engines disagree on), the nine cells are conditional sums in
    * ONE scan-aggregate, and the chi-square terms are added in fixed
    * written order against the literal expectations. Returns one row
    * (n, chi2). */
  def benford(df: DataFrame, valueCol: Column): DataFrame = {
    val base = df.select(
      (valueCol.cast(org.apache.spark.sql.types.DecimalType(18, 2)) * 100)
        .cast("long").as("cents"))
    // fold ASCENDING so the LARGEST magnitude ends outermost (the last
    // fold step wraps the whole expression): descending would leave
    // `cents >= 1` outermost and every value would "extract" to its
    // full cents — a bug the planted StatGatesSpec fixture caught
    // (both engines agreed on the same wrong number, so the oracle
    // alone could not)
    val ladder = (0 to 14).foldLeft("0") { (rest, m) =>
      val p = math.pow(10, m).toLong
      s"CASE WHEN cents >= ${p}L THEN CAST(cents div ${p}L AS INT) ELSE $rest END"
    }
    val aggs = count(lit(1)).as("n") +: (1 to 9).map(d =>
      F.sum(when(col("__d") === d, 1L).otherwise(0L)).as(s"c$d"))
    val t = base.select(expr(ladder).as("__d")).where(col("__d") >= 1)
      .agg(aggs.head, aggs.tail: _*)
    val terms = (1 to 9).map { d =>
      val e = col("n").cast("double") * lit(BenfordP(d - 1))
      (col(s"c$d").cast("double") - e) * (col(s"c$d").cast("double") - e) / e
    }
    t.select(col("n"), round(terms.reduce(_ + _), 4).as("chi2"))
  }

  /** DuckDB half of [[benford]] — same ladder, same literal
    * expectations, same fixed-order chain. */
  def benfordOracle(table: String, valueExpr: String): String = {
    val ladder = (0 to 14).foldLeft("0") { (rest, m) =>
      val p = math.pow(10, m).toLong
      s"CASE WHEN cents >= $p THEN (cents // $p)::INT ELSE $rest END"
    }
    val cells = (1 to 9).map(d =>
      s"sum(CASE WHEN d = $d THEN 1 ELSE 0 END)::BIGINT AS c$d").mkString(", ")
    val terms = (1 to 9).map { d =>
      val e = s"(n::DOUBLE * ${BenfordP(d - 1)})"
      s"((c$d::DOUBLE - $e) * (c$d::DOUBLE - $e) / $e)"
    }.mkString(" + ")
    s"""WITH v AS (SELECT CAST(CAST($valueExpr AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents FROM $table),
       |dg AS (SELECT $ladder AS d FROM v),
       |t AS (SELECT count(*) AS n, $cells FROM dg WHERE d >= 1)
       |SELECT n, round($terms, 4) AS chi2 FROM t""".stripMargin
  }

  /** Two-sample Kolmogorov–Smirnov drift statistic over an integer
    * value column — the CONTINUOUS-value sibling of [[driftChi2]]
    * (which needs bucket edges; KS needs none): D = max |CDF_a − CDF_b|
    * over the merged value domain. Kept EXACT by scaling:
    * D·n_a·n_b = max |cum_a·n_b − cum_b·n_a| is an integer, so the
    * whole gate hash-checks; one double division at the end.
    *
    * Scale shape: per-value conditional counts are one map-side-
    * combinable aggregate (the shuffle carries the DISTINCT values of
    * an already-bounded measurement column, e.g. document lengths —
    * metadata, not documents); the cumulative pass is one window over
    * those distinct values. Returns one row
    * (n_a, n_b, d_scaled, d). */
  def ksDrift(df: DataFrame, valueCol: Column, sideA: Column,
      sideB: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = df.select(valueCol.as("v"), sideA.as("__a"), sideB.as("__b"))
      .where(col("v").isNotNull && (col("__a") || col("__b")))
      .groupBy(col("v"))
      .agg(F.sum(when(col("__a"), 1L).otherwise(0L)).as("ca"),
        F.sum(when(col("__b"), 1L).otherwise(0L)).as("cb"))
    val w = Window.orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val all = Window.orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    counts
      .select(F.sum(col("ca")).over(w).as("cuma"), F.sum(col("cb")).over(w).as("cumb"),
        F.sum(col("ca")).over(all).as("na"), F.sum(col("cb")).over(all).as("nb"))
      .select(col("na"), col("nb"),
        abs(col("cuma") * col("nb") - col("cumb") * col("na")).as("dd"))
      .groupBy(col("na").as("n_a"), col("nb").as("n_b"))
      .agg(max(col("dd")).as("d_scaled"))
      .select(col("n_a"), col("n_b"), col("d_scaled"),
        round(col("d_scaled").cast("double") /
          (col("n_a").cast("double") * col("n_b").cast("double")), 6).as("d"))
  }

  /** DuckDB half of [[ksDrift]] over `table.valueExpr` with boolean
    * side predicates. */
  def ksDriftOracle(table: String, valueExpr: String, predA: String,
      predB: String): String =
    s"""WITH c AS (SELECT ($valueExpr) AS v,
       |        sum(CASE WHEN $predA THEN 1 ELSE 0 END)::BIGINT AS ca,
       |        sum(CASE WHEN $predB THEN 1 ELSE 0 END)::BIGINT AS cb
       |      FROM $table WHERE ($valueExpr) IS NOT NULL AND (($predA) OR ($predB))
       |      GROUP BY 1),
       |k AS (SELECT sum(ca) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cuma,
       |             sum(cb) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumb,
       |             sum(ca) OVER () AS na, sum(cb) OVER () AS nb
       |      FROM c)
       |SELECT na::BIGINT AS n_a, nb::BIGINT AS n_b,
       |  CAST(max(abs(cuma * nb - cumb * na)) AS BIGINT) AS d_scaled,
       |  round(CAST(max(abs(cuma * nb - cumb * na)) AS BIGINT)::DOUBLE
       |    / (na::DOUBLE * nb::DOUBLE), 6) AS d
       |FROM k GROUP BY na, nb""".stripMargin

  /** Salt-bucket count for [[topkValues]]'s first-stage local top-k. */
  val TopkValueSalts = 32

  /** Most-frequent values per column — the frequent-items half of the
    * ANALYZE stats pass ([[ndvProfile]] is the distinct-count half);
    * optimizers use these for selectivity on skewed columns, curation
    * uses them as the "what's actually in this field" glance. Exact
    * counts, ties broken by the value string, nulls excluded.
    *
    * Scale shape: the melt is a projection fused with the (rebalanced)
    * scan; the (column, value) counts are ONE map-side-combinable
    * aggregate; and the per-column top-k avoids the single-reducer-per-
    * column window via the standard two-stage cover — local top-k per
    * (column, value-hash salt) first (lossless: a global top-k member
    * is in its salt bucket's top-k), then the final window ranks only
    * salts·k rows per column. */
  def topkValues(df: DataFrame, cols: Seq[String], k: Int = 3): DataFrame = {
    require(cols.nonEmpty, "need at least one column")
    import org.apache.spark.sql.expressions.Window
    val entries = cols.flatMap(c => Seq(lit(c), col(s"`$c`").cast("string")))
    val counts = graft.core.Algebra.balanced(df.select(cols.map(c => col(s"`$c`")): _*))
      .select(explode(map(entries: _*)).as(Seq("col_name", "v")))
      .where(col("v").isNotNull)
      .groupBy(col("col_name"), col("v")).agg(count(lit(1)).as("cnt"))
    val w1 = Window.partitionBy(col("col_name"),
        pmod(xxhash64(col("v")), lit(TopkValueSalts.toLong)))
      .orderBy(col("cnt").desc, col("v"))
    val w2 = Window.partitionBy(col("col_name"))
      .orderBy(col("cnt").desc, col("v"))
    counts.withColumn("__s", row_number().over(w1)).where(col("__s") <= k)
      .withColumn("rk", row_number().over(w2).cast("long")).where(col("rk") <= k)
      .select(col("col_name"), col("v"), col("cnt"), col("rk"))
  }

  /** DuckDB half of [[topkValues]] (the oracle ranks directly — same
    * order, same ties). */
  def topkValuesOracle(table: String, cols: Seq[String], k: Int = 3): String = {
    val kv = cols.map(c => s"SELECT '$c' AS col_name, $c::VARCHAR AS v FROM $table")
      .mkString(" UNION ALL ")
    s"""WITH kv AS ($kv),
       |c AS (SELECT col_name, v, count(*) AS cnt FROM kv WHERE v IS NOT NULL GROUP BY 1, 2),
       |r AS (SELECT *, row_number() OVER (PARTITION BY col_name ORDER BY cnt DESC, v) AS rk FROM c)
       |SELECT col_name, v, cnt, rk FROM r WHERE rk <= $k""".stripMargin
  }

  /** Cramér's V association between two LOW-CARDINALITY categorical
    * columns with plan-time-known domains — the feature-relevance /
    * redundancy gate ("are these two labels telling me the same
    * thing?") that mutual information usually answers, minus MI's
    * logarithm (banned: libm differs across engines). χ² is Pearson's
    * over the r×c contingency table, every cell a conditional sum in
    * ONE scan-aggregate; V = sqrt(χ² / (n·(min(r,c)−1))) — sqrt is
    * IEEE-exact, so the whole statistic is engine-deterministic when
    * the cell terms are added in fixed written order (same contract as
    * [[driftChi2]]).
    *
    * Scale shape: ONE map-side-combinable aggregate over the scan (the
    * contingency table is a single wide row — cardinality widens the
    * row, never adds a pass); row/column marginals derive from the
    * cells by exact integer addition, no second job. */
  def cramersV(df: DataFrame, aCol: String, aDomain: Seq[String],
      bCol: String, bDomain: Seq[String]): DataFrame = {
    require(aDomain.nonEmpty && bDomain.nonEmpty, "domains must be known")
    val cells = for (a <- aDomain; b <- bDomain) yield (a, b)
    val aggs = count(lit(1)).as("n") +: cells.map { case (a, b) =>
      F.sum(when(col(s"`$aCol`") === a && col(s"`$bCol`") === b, 1L)
        .otherwise(0L)).as(s"c_${a}_$b")
    }
    val t = df.agg(aggs.head, aggs.tail: _*)
    def rowTotal(a: String) = bDomain.map(b => col(s"c_${a}_$b")).reduce(_ + _)
    def colTotal(b: String) = aDomain.map(a => col(s"c_${a}_$b")).reduce(_ + _)
    val withMargins = t
      .withColumns(aDomain.map(a => s"r_$a" -> rowTotal(a)).toMap)
      .withColumns(bDomain.map(b => s"k_$b" -> colTotal(b)).toMap)
    val terms = cells.map { case (a, b) =>
      val o = col(s"c_${a}_$b").cast("double")
      val e = (col(s"r_$a").cast("double") * col(s"k_$b").cast("double")) /
        col("n").cast("double")
      when(col(s"r_$a") === 0L || col(s"k_$b") === 0L, lit(0.0d))
        .otherwise((o - e) * (o - e) / e)
    }
    val chi2 = terms.reduce(_ + _)
    val dof = math.min(aDomain.size, bDomain.size) - 1
    withMargins.select(col("n"),
      round(chi2, 4).as("chi2"),
      round(sqrt(chi2 / (col("n").cast("double") * dof.toDouble)), 6)
        .as("cramers_v"))
  }

  /** DuckDB half of [[cramersV]] — same cells, same fixed-order chain. */
  def cramersVOracle(table: String, aCol: String, aDomain: Seq[String],
      bCol: String, bDomain: Seq[String]): String = {
    val cells = for (a <- aDomain; b <- bDomain) yield (a, b)
    val cellSel = cells.map { case (a, b) =>
      s"sum(CASE WHEN $aCol = '$a' AND $bCol = '$b' THEN 1 ELSE 0 END)::BIGINT AS c_${a}_$b"
    }.mkString(", ")
    val rowSel = aDomain.map(a =>
      bDomain.map(b => s"c_${a}_$b").mkString(" + ") + s" AS r_$a").mkString(", ")
    val colSel = bDomain.map(b =>
      aDomain.map(a => s"c_${a}_$b").mkString(" + ") + s" AS k_$b").mkString(", ")
    val terms = cells.map { case (a, b) =>
      val e = s"(r_$a::DOUBLE * k_$b::DOUBLE) / n::DOUBLE"
      s"(CASE WHEN r_$a = 0 OR k_$b = 0 THEN 0.0 ELSE " +
        s"(c_${a}_$b::DOUBLE - $e) * (c_${a}_$b::DOUBLE - $e) / ($e) END)"
    }.mkString(" + ")
    val dof = math.min(aDomain.size, bDomain.size) - 1
    s"""WITH t AS (SELECT count(*) AS n, $cellSel FROM $table),
       |m AS (SELECT *, $rowSel, $colSel FROM t)
       |SELECT n, round($terms, 4) AS chi2,
       |  round(sqrt(($terms) / (n::DOUBLE * $dof)), 6) AS cramers_v
       |FROM m""".stripMargin
  }

  /** Tukey-fence outlier census — the numeric-column health check next
    * to [[dqChecks]]: per column, the exact quartiles and the count of
    * rows outside [q1 − 1.5·IQR, q3 + 1.5·IQR] (1.5 is dyadic, so the
    * fence arithmetic is bit-reproducible across engines; quartiles use
    * the same `percentile` ≡ `quantile_cont` parity the quartile rows
    * pin). Fences beat z-scores for admission gating because quartiles
    * are robust to the very outliers being hunted.
    *
    * Scale shape: ONE aggregate computes every column's quartiles side
    * by side, broadcasts its single row back (scalar-subquery shape),
    * and a second single scan counts all fences at once — two passes
    * total regardless of column count, never a melt shuffle. */
  def outlierIqr(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "need at least one column")
    val aggs = cols.flatMap(c => Seq(
      expr(s"percentile(`$c`, 0.25)").as(s"__q1_$c"),
      expr(s"percentile(`$c`, 0.75)").as(s"__q3_$c")))
    val stats = df.agg(aggs.head, aggs.tail: _*)
    val per = cols.flatMap { c =>
      val q1 = col(s"__q1_$c"); val q3 = col(s"__q3_$c")
      val lo = q1 - (q3 - q1) * 1.5
      val hi = q3 + (q3 - q1) * 1.5
      Seq(first(q1).as(s"__fq1_$c"), first(q3).as(s"__fq3_$c"),
        sum(when(col(s"`$c`") < lo, 1L).otherwise(0L)).as(s"__lo_$c"),
        sum(when(col(s"`$c`") > hi, 1L).otherwise(0L)).as(s"__hi_$c"))
    }
    df.crossJoin(broadcast(stats))
      .agg(per.head, per.tail: _*)
      .select(explode(array(cols.map(c => struct(
        lit(c).as("col_name"),
        col(s"__fq1_$c").as("q1"), col(s"__fq3_$c").as("q3"),
        col(s"__lo_$c").as("n_low"), col(s"__hi_$c").as("n_high"))): _*)).as("s"))
      .select(col("s.col_name"), col("s.q1"), col("s.q3"),
        col("s.n_low"), col("s.n_high"))
  }

  /** DuckDB half of [[outlierIqr]] (same fence expression order). */
  def outlierIqrOracle(table: String, cols: Seq[String]): String = {
    val statSel = cols.flatMap(c => Seq(
      s"quantile_cont($c, 0.25) AS q1_$c", s"quantile_cont($c, 0.75) AS q3_$c"))
      .mkString(", ")
    val arms = cols.map(c =>
      s"""SELECT '$c' AS col_name, st.q1_$c AS q1, st.q3_$c AS q3,
         |  sum(CASE WHEN $c < st.q1_$c - (st.q3_$c - st.q1_$c) * 1.5 THEN 1 ELSE 0 END)::BIGINT AS n_low,
         |  sum(CASE WHEN $c > st.q3_$c + (st.q3_$c - st.q1_$c) * 1.5 THEN 1 ELSE 0 END)::BIGINT AS n_high
         |FROM $table, st GROUP BY 2, 3""".stripMargin)
      .mkString("\nUNION ALL\n")
    s"WITH st AS (SELECT $statSel FROM $table)\n$arms"
  }

  /** Pairwise Pearson correlation MATRIX over numeric columns — the
    * EDA/CBO pass that finds redundant features and functionally-tied
    * columns before training or join planning. Every moment (per-column
    * sums/squares and all k(k−1)/2 cross products) accumulates in ONE
    * scan as exact DECIMAL sums (the `agg_corr_pricing` discipline —
    * float addition order never touches the statistic), and each
    * correlation is a fixed-order double expression over the cast
    * moments. Zero-variance columns report null, not NaN.
    *
    * Scale shape: one aggregate, k²/2 moment cells wide, one row out —
    * column count multiplies the in-row expression width, never the
    * I/O or the shuffle. */
  def corrMatrix(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.size >= 2, s"need at least two columns, got $cols")
    import org.apache.spark.sql.types.DecimalType
    def d(c: String) = col(s"`$c`").cast(DecimalType(18, 2))
    val pairs = for {
      i <- cols.indices; j <- cols.indices if i < j
    } yield (cols(i), cols(j))
    val aggs = count(lit(1)).cast("double").as("__n") +:
      (cols.flatMap(c => Seq(
        sum(d(c)).cast("double").as(s"__s_$c"),
        sum(d(c) * d(c)).cast("double").as(s"__ss_$c"))) ++
        pairs.map { case (a, b) =>
          sum(d(a) * d(b)).cast("double").as(s"__sp_${a}_$b") })
    df.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(pairs.map { case (a, b) =>
        val n = col("__n")
        val sx = col(s"__s_$a"); val sy = col(s"__s_$b")
        val sxx = col(s"__ss_$a"); val syy = col(s"__ss_$b")
        val sxy = col(s"__sp_${a}_$b")
        val varx = n * sxx - sx * sx
        val vary = n * syy - sy * sy
        struct(lit(a).as("col_a"), lit(b).as("col_b"),
          when(varx === 0.0 || vary === 0.0, lit(null).cast("double"))
            .otherwise((n * sxy - sx * sy) / (sqrt(varx) * sqrt(vary)))
            .as("corr"))
      }: _*)).as("s"))
      .select(col("s.col_a"), col("s.col_b"), col("s.corr"))
  }

  /** DuckDB half of [[corrMatrix]] (same DECIMAL moments, same
    * fixed-order double expression). */
  def corrMatrixOracle(table: String, cols: Seq[String]): String = {
    def d(c: String) = s"CAST($c AS DECIMAL(18,2))"
    val pairs = for {
      i <- cols.indices; j <- cols.indices if i < j
    } yield (cols(i), cols(j))
    val moments = (s"CAST(count(*) AS DOUBLE) AS n" +:
      (cols.flatMap(c => Seq(
        s"CAST(sum(${d(c)}) AS DOUBLE) AS s_$c",
        s"CAST(sum(${d(c)} * ${d(c)}) AS DOUBLE) AS ss_$c")) ++
        pairs.map { case (a, b) =>
          s"CAST(sum(${d(a)} * ${d(b)}) AS DOUBLE) AS sp_${a}_$b" })).mkString(",\n    ")
    val arms = pairs.map { case (a, b) =>
      val vx = s"((n * ss_$a) - (s_$a * s_$a))"
      val vy = s"((n * ss_$b) - (s_$b * s_$b))"
      s"""SELECT '$a' AS col_a, '$b' AS col_b,
         |  CASE WHEN $vx = 0.0 OR $vy = 0.0 THEN NULL
         |       ELSE ((n * sp_${a}_$b) - (s_$a * s_$b)) / (sqrt($vx) * sqrt($vy))
         |  END AS corr
         |FROM m""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"WITH m AS (SELECT\n    $moments\n  FROM $table)\n$arms"
  }

  /** Declarative data-quality EXPECTATION suite (the Deequ/
    * great-expectations shape): a named list of row-level predicates,
    * key-uniqueness assertions, and referential-containment assertions
    * over a table, reduced to one verdict row per check —
    * `(check, n_rows, n_violations, pass)`. This is the admission gate
    * a warehouse runs on every ingest batch before it publishes.
    *
    * Scale shape: ALL row-level predicates evaluate in ONE scan (a
    * single aggregate computes every violation count side by side — the
    * check count never multiplies the I/O); each uniqueness check is
    * one map-side-combined groupBy on its key; each referential check
    * is one left-anti-shaped join (Catalyst/AQE broadcasts the
    * deduplicated parent side when it is small). The output is one row
    * per check — fixed-width, collectible, alertable.
    *
    * `rowChecks`: (name, violation predicate) — a row VIOLATES the
    * check when the predicate is true (null predicates count as
    * violations: an unevaluable expectation is a failed one).
    * `uniqueChecks`: (name, key columns) — violations = rows beyond the
    * first per duplicated key (a clean table reports 0).
    * `fkChecks`: (name, child key, parent frame, parent key) —
    * violations = child rows (null-keyed included) with no parent. */
  def dqChecks(df: DataFrame,
      rowChecks: Seq[(String, Column)],
      uniqueChecks: Seq[(String, Seq[String])] = Nil,
      fkChecks: Seq[(String, String, DataFrame, String)] = Nil): DataFrame = {
    require(rowChecks.nonEmpty || uniqueChecks.nonEmpty || fkChecks.nonEmpty,
      "need at least one check")
    val names = rowChecks.map(_._1) ++ uniqueChecks.map(_._1) ++ fkChecks.map(_._1)
    require(names.distinct.size == names.size, s"duplicate check names in $names")

    val verdict = (name: String, rows: Column, bad: Column) =>
      struct(lit(name).as("check_name"), rows.cast("long").as("n_rows"),
        bad.cast("long").as("n_violations"))

    val rowFrame: Option[DataFrame] =
      if (rowChecks.isEmpty) None
      else {
        val aggs = count(lit(1)).as("__n") +:
          rowChecks.zipWithIndex.map { case ((_, pred), i) =>
            sum(when(coalesce(pred, lit(true)), 1L).otherwise(0L)).as(s"__v$i")
          }
        val one = df.agg(aggs.head, aggs.tail: _*)
        Some(one.select(explode(array(rowChecks.zipWithIndex.map {
          case ((name, _), i) => verdict(name, col("__n"), col(s"__v$i"))
        }: _*)).as("s")))
      }

    val uniqueFrames = uniqueChecks.map { case (name, keys) =>
      df.groupBy(keys.map(k => col(s"`$k`")): _*)
        .agg(count(lit(1)).as("__c"))
        .agg(coalesce(sum(col("__c")), lit(0L)).as("__n"),
          coalesce(sum(col("__c") - 1L), lit(0L)).as("__v"))
        .select(verdict(name, col("__n"), col("__v")).as("s"))
    }

    val fkFrames = fkChecks.map { case (name, childKey, parent, parentKey) =>
      val p = parent.select(col(s"`$parentKey`").as("__pk"))
        .filter(col("__pk").isNotNull).distinct()
        .withColumn("__hit", lit(true))
      df.select(col(s"`$childKey`").as("__ck"))
        .join(p, col("__ck") === col("__pk"), "left_outer")
        .agg(count(lit(1)).as("__n"),
          sum(when(col("__hit").isNull, 1L).otherwise(0L)).as("__v"))
        .select(verdict(name, col("__n"), col("__v")).as("s"))
    }

    (rowFrame.toSeq ++ uniqueFrames ++ fkFrames)
      .reduce(_ unionAll _)
      .select(col("s.check_name").as("check_name"), col("s.n_rows").as("n_rows"),
        col("s.n_violations").as("n_violations"),
        (col("s.n_violations") === 0L).as("pass"))
  }
}
