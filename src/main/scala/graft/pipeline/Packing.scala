package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for LLM training: lay every document's tokens
  * end-to-end in a canonical order (doc id) and cut the tape every
  * `capacity` tokens — the concat-and-chunk packing GPT-style training
  * uses. Each document gets its global token `start_offset`, the
  * `seq_id` of the training sequence its first token lands in, and a
  * `straddles` flag marking documents split across a sequence boundary
  * (the rows an attention-masking policy needs to see).
  *
  * Scale formulation: the global offset is a DISTRIBUTED PREFIX SUM, not
  * a global window. A naive `Window.orderBy(doc_id)` with no partition
  * key funnels the entire corpus through ONE task; instead the corpus is
  * range-partitioned by doc id, each partition's token total is
  * aggregated (one tiny job — num-partitions rows to the driver), the
  * driver prefix-sums those totals into per-partition base offsets
  * (thousands of longs, trivially driver-sized at any corpus scale), and
  * a per-partition window adds the within-partition running count to the
  * broadcast base. Two passes over the persisted ranged data, all
  * parallelism preserved — the textbook two-phase scan.
  *
  * The result is a pure function of (doc_id order, token counts):
  * partition boundaries cancel out of the final offsets, so re-runs and
  * different cluster layouts produce identical packing.
  */
object Packing {

  /** Default sequence capacity in tokens. */
  val Capacity = 256L

  /** [[paddingCensus]] bucket edges: powers of two, 16..4096 tokens
    * (shorter docs land in the 16 bucket, longer in the top one). */
  val PadBuckets: Seq[Long] = (4 to 12).map(1L << _)

  /** Length-bucket padding census — the planning statistic behind
    * bucketed batching for inference/training: pad-to-bucket wastes
    * (bucket − len) tokens per doc, so per-bucket document counts, real
    * token mass, padded mass, and the waste ratio decide the bucket
    * edges (versus [[pack]]'s concat-and-chunk, which trades padding
    * for cross-doc attention). Buckets are a generated CASE chain over
    * power-of-two edges — identical on both engines; ratios are ONE
    * IEEE division of exact integers.
    *
    * Scale shape: a narrow token-count map + one map-side-combinable
    * aggregation into ≤ |buckets| groups. */
  def paddingCensus(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val nTok = size(split(trim(col(s"`$textCol`")), "\\s+")).cast("long")
    val bucket = PadBuckets.init.foldRight(lit(PadBuckets.last): org.apache.spark.sql.Column) {
      (edge, rest) => when(col("__n") <= edge, lit(edge)).otherwise(rest)
    }
    df.select(col(s"`$idCol`"), nTok.as("__n"))
      .withColumn("bucket", bucket)
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_docs"), sum(col("__n")).as("sum_tokens"))
      .select(col("bucket"), col("n_docs"), col("sum_tokens"),
        (col("n_docs") * col("bucket")).as("padded_tokens"),
        round((col("n_docs") * col("bucket") - col("sum_tokens")).cast("double") /
          (col("n_docs") * col("bucket")).cast("double"), 4).as("waste_ratio"))
  }

  /** DuckDB half of [[paddingCensus]] — the same generated CASE chain
    * and the same fixed IEEE ratio. */
  def paddingCensusOracle(table: String, textExpr: String): String = {
    val chain = PadBuckets.init.map(e => s"WHEN n <= $e THEN $e").mkString(" ")
    s"""WITH w AS (SELECT len(regexp_split_to_array(trim($textExpr), '\\s+'))::BIGINT AS n FROM $table),
       |b AS (SELECT CASE $chain ELSE ${PadBuckets.last} END AS bucket, n FROM w),
       |g AS (SELECT bucket, count(*) AS n_docs, sum(n)::BIGINT AS sum_tokens FROM b GROUP BY 1)
       |SELECT bucket, n_docs, sum_tokens, (n_docs * bucket)::BIGINT AS padded_tokens,
       |  round((n_docs * bucket - sum_tokens)::DOUBLE / (n_docs * bucket)::DOUBLE, 4) AS waste_ratio
       |FROM g"""
      .stripMargin
  }

  def pack(df: DataFrame, idCol: String, textCol: String,
      capacity: Long = Capacity,
      tokenizer: TextPipeline.Tokenizer = TextPipeline.Tokenizer.Whitespace): DataFrame = {
    require(capacity > 0, s"capacity must be positive, got $capacity")
    val spark = df.sparkSession
    val counted = df.select(
      col(idCol).cast("long").as(idCol),
      size(TextPipeline.tokens(col(textCol), tokenizer)).cast("long").as("n_tokens"))

    // Two-phase distributed prefix sum over token counts in doc-id order
    // (range exchange + driver prefix of per-partition totals — the
    // scaffold and its persist rationale live in operators.PrefixSum)
    val (ranged, baseDf, _) =
      graft.operators.PrefixSum.rangedBases(counted, Seq(idCol), col("n_tokens"))

    // phase 2: within-partition running sum + broadcast base join
    val w = Window.partitionBy(col("__pid")).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    ranged
      .join(broadcast(baseDf), Seq("__pid"))
      .withColumn("start_offset",
        col("__base") + coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .withColumn("seq_id", floor(col("start_offset") / capacity))
      .withColumn("straddles",
        col("start_offset") % capacity + col("n_tokens") > capacity)
      .select(col(idCol), col("n_tokens"), col("start_offset"),
        col("seq_id"), col("straddles"))
  }
}
