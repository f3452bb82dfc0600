package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Generic as-of join (SURVEY.md §2.b "range/as-of join"): for each left
  * row, attach the latest right row whose `tsCol` is <= (or strictly <)
  * the left row's, within the same `keyCol`.
  *
  * Implementation is the scale-safe union trick rather than a non-equi
  * range join: tag both sides, union, and take `last(right payload)` over
  * an ordered per-key window. Cost = ONE shuffle on the key + a
  * partition-local sort — no O(n·m) range-condition nested loop, no
  * broadcast requirement, and skew is bounded by the hottest key, same as
  * any windowed op. This is the plan you want at 100 TB; Spark's built-in
  * join would fall back to BroadcastNestedLoop for the range condition.
  */
object AsOf {

  /** @param left       rows to enrich
    * @param right      lookup stream (its columns come back `right_`-prefixed)
    * @param keyCol     equi-key column name present on both sides
    * @param tsCol      ordering column name present on both sides
    * @param strict     true → match right.ts <  left.ts;
    *                   false → match right.ts <= left.ts
    * @param tolerance  optional max lookback in tsCol units: a match older
    *                   than `left.ts - tolerance` is dropped (nulled) —
    *                   the usual as-of staleness bound. Applied as a
    *                   post-filter on the matched ts, so the plan is
    *                   unchanged (still one shuffle + window).
    */
  def join(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      tsCol: String,
      strict: Boolean = false,
      tolerance: Option[Long] = None,
  ): DataFrame = {
    val leftCols  = left.columns.toSeq
    val rightCols = right.columns.toSeq.filterNot(c => c == keyCol)

    val l = left.select(
      col(keyCol).as("_k"),
      col(tsCol).as("_ts"),
      lit(1).as("_side"),
      struct(leftCols.map(col): _*).as("_lpay"),
      lit(null).cast(
        org.apache.spark.sql.types.StructType(
          right.schema.fields.filterNot(_.name == keyCol)
        )
      ).as("_rpay"),
    )
    val r = right.select(
      col(keyCol).as("_k"),
      col(tsCol).as("_ts"),
      lit(0).as("_side"),
      lit(null).cast(left.schema).as("_lpay"),
      struct(rightCols.map(col): _*).as("_rpay"),
    )

    // At equal _ts: _side orders right(0) before left(1), so `<=` matches
    // rows at the same instant; for strict mode exclude the current row's
    // instant by ordering left first and closing the frame one row early.
    val ordered =
      if (strict)
        Window.partitionBy("_k").orderBy(col("_ts"), col("_side").desc)
      else Window.partitionBy("_k").orderBy(col("_ts"), col("_side"))
    val frame =
      ordered.rowsBetween(Window.unboundedPreceding, if (strict) -1 else 0)

    val joined0 = l
      .unionByName(r)
      .withColumn("_match", last(col("_rpay"), ignoreNulls = true).over(frame))
      .filter(col("_side") === 1)
    val joined = tolerance match {
      case Some(tol) =>
        joined0.withColumn(
          "_match",
          when(col(s"_match.$tsCol") >= col("_ts") - lit(tol), col("_match")),
        )
      case None => joined0
    }

    val out = leftCols.map(c => col(s"_lpay.$c").as(c)) ++
      rightCols.map(c => col(s"_match.$c").as(s"right_$c"))
    joined.select(out: _*)
  }
}
