package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StructField, StructType}

/** Backward as-of join: for each left row, attach the single most recent
  * right row with `right.ts <= left.ts` within the same key group — the
  * temporal-join primitive (market-data "latest quote at trade time",
  * attribution "latest campaign touch before conversion") that plain
  * equi-joins cannot express and naive range joins explode on.
  *
  * Scale formulation: NO join at all. Both sides are tagged and unioned,
  * then ONE window pass per key group ordered by (ts, side, tiebreak)
  * carries the latest right-side payload forward (`last(_, ignoreNulls)`
  * over an unbounded-preceding frame). Cost is a single shuffle on the
  * key columns + a per-partition sort — the same shape as any windowed
  * aggregate, with no candidate blow-up however dense the right side is.
  * This is the standard union-scan formulation of temporal joins (the
  * plan a MATCH/ASOF-capable SQL engine lowers to); a sort-merge
  * formulation would need a custom physical operator for no asymptotic
  * gain, so composition wins here (extension-ladder tier (a)).
  *
  * Semantics (deterministic, shared with the oracle SQL):
  *  - inclusive match: a right row at exactly left.ts is visible (it
  *    sorts before the left row via the side flag);
  *  - among right rows tied on ts, the greatest `rightTieBreak` wins;
  *  - left rows with no prior right row keep NULL payloads (left outer);
  *  - the payload travels as ONE struct filled as a unit, so a NULL
  *    field in the matched right row stays NULL — it is never backfilled
  *    from an older right row (which per-column ignoreNulls fills would
  *    silently do, mixing columns of different right rows in one match).
  */
object AsofJoin {

  /** @param keys          equality keys (e.g. user_id) — the shuffle key
    * @param tsCol         ordering column, same name and type both sides
    * @param rightPayload  right columns carried onto matching left rows
    * @param rightTieBreak right column ordering ties on equal ts
    * @param outPrefix     prefix for the attached payload columns
    */
  def backward(left: DataFrame, right: DataFrame, keys: Seq[String], tsCol: String,
      rightPayload: Seq[String], rightTieBreak: String,
      outPrefix: String = "asof_"): DataFrame = {
    require(keys.nonEmpty, "as-of join needs at least one equality key")
    val lTs = left.schema(tsCol).dataType
    val rTs = right.schema(tsCol).dataType
    require(lTs == rTs, s"ts column type mismatch: left $lTs vs right $rTs")

    val leftOnly = left.columns.filterNot(c => keys.contains(c) || c == tsCol).toSeq
    val tieType = right.schema(rightTieBreak).dataType
    val payType = StructType(rightPayload.map(c =>
      StructField(c, right.schema(c).dataType, nullable = true)))
    def q(c: String): Column = col(s"`$c`")

    // tagged union: keys ++ ts ++ side ++ tie ++ left-only ++ payload
    // struct (non-null on every right row, so ignoreNulls skips only
    // LEFT rows — the payload of the winning right row travels whole)
    val lSide = left.select(
      (keys.map(q) :+ q(tsCol) :+ lit(1).as("__side") :+
        lit(null).cast(tieType).as("__tie")) ++
        leftOnly.map(q) :+
        lit(null).cast(payType).as("__pay"): _*)
    val rSide = right.select(
      (keys.map(q) :+ q(tsCol) :+ lit(0).as("__side") :+
        q(rightTieBreak).as("__tie")) ++
        leftOnly.map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
        struct(rightPayload.map(c => q(c).as(c)): _*).as("__pay"): _*)

    val w = Window.partitionBy(keys.map(q): _*)
      .orderBy(q(tsCol).asc, col("__side").asc, col("__tie").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lSide.unionAll(rSide)
      .withColumn("__pay", last(col("__pay"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select((keys.map(q) :+ q(tsCol)) ++ leftOnly.map(q) ++
        rightPayload.map(c => col("__pay").getField(c).as(s"$outPrefix$c")): _*)
  }

  /** Forward as-of join: for each left row, the single EARLIEST right
    * row with `right.ts >= left.ts` in the same key group — the "next
    * event at/after" primitive (next restock after a stock-out, next
    * purchase after a click). Same union-scan formulation as
    * [[backward]], with the window order reversed:
    *  - inclusive match: a right row at exactly left.ts is visible;
    *  - among right rows tied on ts, the SMALLEST `rightTieBreak` wins
    *    (the mirror of backward's greatest-wins);
    *  - left rows with no later right row keep NULL payloads;
    *  - the payload travels as one struct, never mixed across rows. */
  def forward(left: DataFrame, right: DataFrame, keys: Seq[String], tsCol: String,
      rightPayload: Seq[String], rightTieBreak: String,
      outPrefix: String = "asof_"): DataFrame = {
    require(keys.nonEmpty, "as-of join needs at least one equality key")
    val lTs = left.schema(tsCol).dataType
    val rTs = right.schema(tsCol).dataType
    require(lTs == rTs, s"ts column type mismatch: left $lTs vs right $rTs")

    val leftOnly = left.columns.filterNot(c => keys.contains(c) || c == tsCol).toSeq
    val tieType = right.schema(rightTieBreak).dataType
    val payType = StructType(rightPayload.map(c =>
      StructField(c, right.schema(c).dataType, nullable = true)))
    def q(c: String): Column = col(s"`$c`")

    val lSide = left.select(
      (keys.map(q) :+ q(tsCol) :+ lit(1).as("__side") :+
        lit(null).cast(tieType).as("__tie")) ++
        leftOnly.map(q) :+
        lit(null).cast(payType).as("__pay"): _*)
    val rSide = right.select(
      (keys.map(q) :+ q(tsCol) :+ lit(0).as("__side") :+
        q(rightTieBreak).as("__tie")) ++
        leftOnly.map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
        struct(rightPayload.map(c => q(c).as(c)): _*).as("__pay"): _*)

    // ts DESC: later rows come first, so last() over the preceding
    // frame carries the NEAREST ts >= left.ts. Rights precede lefts at
    // equal ts (inclusive); __tie DESC makes the smallest tiebreak the
    // LAST right seen at its ts, i.e. the winner.
    val w = Window.partitionBy(keys.map(q): _*)
      .orderBy(q(tsCol).desc, col("__side").asc, col("__tie").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lSide.unionAll(rSide)
      .withColumn("__pay", last(col("__pay"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select((keys.map(q) :+ q(tsCol)) ++ leftOnly.map(q) ++
        rightPayload.map(c => col("__pay").getField(c).as(s"$outPrefix$c")): _*)
  }

  /** Nearest as-of join: for each left row, the right row minimizing
    * |right.ts - left.ts| in the same key group, EITHER direction — the
    * sensor-alignment / log-correlation primitive ("closest reading to
    * this fault, before or after"). Distance ties resolve BACKWARD (the
    * at-or-before row wins), matching the intuition that the past is
    * known and the future is a guess; within a direction the usual
    * per-direction tie rules apply.
    *
    * Same union-scan scale shape: ONE shuffle on the keys, then TWO
    * ordered window passes (ascending carries the backward candidate,
    * descending the forward one) sharing that exchange — no join, no
    * candidate blow-up. The per-row pick is then a scalar comparison of
    * the two deltas. `tsCol` must be numeric (epoch ticks): the pick
    * compares subtraction results, not orderings. */
  def nearest(left: DataFrame, right: DataFrame, keys: Seq[String], tsCol: String,
      rightPayload: Seq[String], rightTieBreak: String,
      outPrefix: String = "asof_"): DataFrame = {
    require(keys.nonEmpty, "as-of join needs at least one equality key")
    val lTs = left.schema(tsCol).dataType
    val rTs = right.schema(tsCol).dataType
    require(lTs == rTs, s"ts column type mismatch: left $lTs vs right $rTs")
    require(lTs.isInstanceOf[org.apache.spark.sql.types.NumericType],
      s"nearest needs a numeric ts (epoch ticks) to compare deltas: $lTs")

    val leftOnly = left.columns.filterNot(c => keys.contains(c) || c == tsCol).toSeq
    val tieType = right.schema(rightTieBreak).dataType
    // the matched row's ts travels inside the payload so the delta
    // compare can run after the window passes
    val payCols = if (rightPayload.contains(tsCol)) rightPayload
      else rightPayload :+ tsCol
    val payType = StructType(payCols.map(c =>
      StructField(c, right.schema(c).dataType, nullable = true)))
    def q(c: String): Column = col(s"`$c`")

    val lSide = left.select(
      (keys.map(q) :+ q(tsCol) :+ lit(1).as("__side") :+
        lit(null).cast(tieType).as("__tie")) ++
        leftOnly.map(q) :+
        lit(null).cast(payType).as("__pay"): _*)
    val rSide = right.select(
      (keys.map(q) :+ q(tsCol) :+ lit(0).as("__side") :+
        q(rightTieBreak).as("__tie")) ++
        leftOnly.map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
        struct(payCols.map(c => q(c).as(c)): _*).as("__pay"): _*)

    // both windows share the key partitioning (one exchange, two sorts)
    val wb = Window.partitionBy(keys.map(q): _*)
      .orderBy(q(tsCol).asc, col("__side").asc, col("__tie").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wf = Window.partitionBy(keys.map(q): _*)
      .orderBy(q(tsCol).desc, col("__side").asc, col("__tie").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val bDelta = q(tsCol) - col("__b").getField(tsCol)
    val fDelta = col("__f").getField(tsCol) - q(tsCol)
    val pick = when(col("__b").isNull, col("__f"))
      .when(col("__f").isNull, col("__b"))
      .when(bDelta <= fDelta, col("__b"))
      .otherwise(col("__f"))
    lSide.unionAll(rSide)
      .withColumn("__b", last(col("__pay"), ignoreNulls = true).over(wb))
      .withColumn("__f", last(col("__pay"), ignoreNulls = true).over(wf))
      .filter(col("__side") === 1)
      .withColumn("__n", pick)
      .select((keys.map(q) :+ q(tsCol)) ++ leftOnly.map(q) ++
        rightPayload.map(c => col("__n").getField(c).as(s"$outPrefix$c")): _*)
  }
}
