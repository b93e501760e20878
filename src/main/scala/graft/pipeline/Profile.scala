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
  * cast, so null counts are unaffected.
  */
object Profile {

  /** One row per column of `df`: `(col_name, n_nulls, n_distinct)`
    * (distinct excludes NULL, per SQL convention). */
  def columns(df: DataFrame): DataFrame = {
    val entries = df.schema.fields.flatMap(f =>
      Seq(lit(f.name), col(s"`${f.name}`").cast("string")))
    df.select(explode(map(entries: _*)).as(Seq("col_name", "v")))
      .groupBy(col("col_name"))
      .agg((F.count(lit(1)) - F.count(col("v"))).as("n_nulls"),
        countDistinct(col("v")).as("n_distinct"))
  }
}
