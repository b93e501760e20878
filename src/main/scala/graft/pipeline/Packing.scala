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
