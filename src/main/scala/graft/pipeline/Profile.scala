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
}
