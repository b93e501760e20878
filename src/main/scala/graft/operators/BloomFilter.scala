package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic Bloom runtime filter: build a bitset over a (filtered)
  * dimension key set, broadcast it as a LITERAL into the fact scan, and
  * pre-filter fact rows before any join — the classic semi-join
  * reduction at 100 TB, where shipping an 8 KB bitset beats shuffling a
  * 600M-row fact table into a join just to drop 80% of it.
  *
  * Spark's AQE injects its own runtime bloom filters opportunistically;
  * this operator is the explicit, deterministic variant whose exact
  * admission set an external engine can replay: positions are
  * md5-derived (`(0x || md5(i:key)[:15]) mod m`, the same hex-literal
  * construction the MinHash family uses), so "bit set at p" is
  * equivalent to "p ∈ the distinct position set" — which is how the
  * DuckDB oracle checks it without a bitset type.
  *
  * Scale shape: the build side is one distinct + narrow position
  * explode + 64-bit-word bit_or aggregate — the collect is bounded by
  * construction at m/64 words (1024 longs at the default 2^16 bits),
  * NOT by the key count. The probe side is a scan-side narrow filter
  * against the literal word array: no join, no shuffle, fuses into
  * whole-stage codegen. False positives pass the filter (and are
  * dropped by the real join downstream); false negatives cannot occur.
  */
object BloomFilter {
  /** Bitset width in bits (power of two, ≥ 64). */
  val DefaultBits: Int = 1 << 16
  /** Hash probes per key. */
  val DefaultHashes = 3

  /** Position of hash probe `i` for `key`: 60 md5 bits mod m — the
    * hex-literal construction shared verbatim with the oracle SQL. */
  def position(key: Column, i: Int, mBits: Int): Column =
    conv(substring(md5(concat(lit(s"$i:"), key.cast("string"))), 1, 15), 16, 10)
      .cast("long") % mBits

  /** Build the word array: distinct keys → k positions each → per-word
    * bit_or. Returns exactly mBits/64 longs (missing words are 0). */
  def build(dim: DataFrame, keyCol: String, mBits: Int = DefaultBits,
      kHashes: Int = DefaultHashes): Array[Long] = {
    require(mBits >= 64 && mBits % 64 == 0, s"mBits must be a multiple of 64: $mBits")
    require(kHashes >= 1, s"need at least one hash: $kHashes")
    val posCol = explode(array((0 until kHashes)
      .map(i => position(col(s"`$keyCol`"), i, mBits)): _*))
    // NULL keys carry no membership semantics and would NPE the word
    // assembly (null positions → null word index); drop them up front
    val words = dim.select(col(s"`$keyCol`"))
      .where(col(s"`$keyCol`").isNotNull).distinct()
      .select(posCol.as("p"))
      .select(call_function("div", col("p"), lit(64L)).cast("int").as("w"),
        call_function("shiftleft", lit(1L), (col("p") % 64).cast("int")).as("bit"))
      .groupBy(col("w")).agg(expr("bit_or(bit) AS word"))
      .collect() // bounded by construction: ≤ mBits/64 rows
    val arr = new Array[Long](mBits / 64)
    words.foreach(r => arr(r.getInt(0)) = r.getLong(1))
    arr
  }

  /** Membership test against a literal word array: all k probe bits
    * set. A narrow, codegen-friendly predicate — no join. */
  def mightContain(key: Column, words: Seq[Long], mBits: Int = DefaultBits,
      kHashes: Int = DefaultHashes): Column = {
    val wlit = typedLit(words)
    (0 until kHashes).map { i =>
      val p = position(key, i, mBits)
      val word = element_at(wlit, call_function("div", p, lit(64L)).cast("int") + lit(1))
      call_function("shiftright", word, (p % 64).cast("int"))
        .bitwiseAND(lit(1L)) === lit(1L)
    }.reduce(_ && _)
  }

  /** Measured semi-join reduction: how many fact rows the bloom admits
    * vs the exact semi-join — one summary row (n_fact, n_exact, n_pass,
    * n_false_pos). No false negative is possible, so
    * n_exact ≤ n_pass ≤ n_fact always; n_false_pos is the price of the
    * 8 KB filter vs a full shuffle. */
  def semiJoinStats(fact: DataFrame, factKey: String, dim: DataFrame,
      dimKey: String, mBits: Int = DefaultBits,
      kHashes: Int = DefaultHashes): DataFrame = {
    val words = build(dim, dimKey, mBits, kHashes).toSeq
    // ONE pass over the fact side: the bloom verdict is a narrow column,
    // the exact verdict a broadcast left join against the (small,
    // already-filtered) dim key set, and the three counts conditional
    // sums in a single aggregate — not three separate fact scans
    val keys = broadcast(
      dim.select(col(s"`$dimKey`").as(factKey)).distinct()
        .withColumn("__hit", lit(1)))
    fact
      .withColumn("__bloom",
        mightContain(col(s"`$factKey`"), words, mBits, kHashes))
      .join(keys, Seq(factKey), "left")
      .agg(count(lit(1)).as("n_fact"),
        count(col("__hit")).as("n_exact"),
        count(when(col("__bloom"), lit(1))).as("n_pass"))
      .select(col("n_fact"), col("n_exact"), col("n_pass"),
        (col("n_pass") - col("n_exact")).as("n_false_pos"))
  }
}
