package graft.pipeline

import org.apache.spark.sql.DataFrame
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
}
