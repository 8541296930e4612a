package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (most-recent-match) join — SURVEY §2.4's flagged-hard operator.
  *
  * Semantics (DuckDB `ASOF JOIN` / kdb aj): for each left row, attach the
  * right row with the greatest `rightTs <= leftTs` within the same key
  * (left outer: unmatched left rows keep nulls).
  *
  * Implementation is the union-and-carry trick, not a cross/range join:
  * tag both sides, union, sort within key by (ts, side) and carry the
  * last-seen right payload forward with `last(_, ignoreNulls) over rows
  * unbounded-preceding`. Cost = one shuffle on the key + one sort —
  * identical shape to a sort-merge join, so it scales like one (no
  * broadcast requirement, no O(n·m) pairing). Skewed keys are handled by
  * AQE the same way a sort-merge join's are.
  */
object AsOf {

  /** @param left      left side; must contain `keyCol` and `tsCol`
    * @param right     right side; must contain `keyCol` and `tsCol`
    * @param keyCol    equi-key column name present on both sides
    * @param tsCol     event-time column name present on both sides
    * @param payload   right-side columns to attach (renamed as-is)
    * @param tolerance optional max lookback (kdb `aj` tolerance): a match
    *                  older than `leftTs - tolerance` is nulled out
    * @param carryThreshold left column count above which the wide-schema
    *                  path kicks in (see [[join]] scaladoc): the window
    *                  pass runs over distinct (key, ts) only and the full
    *                  left re-joins after. At 100 TB a wide left would
    *                  otherwise ship every column through the shuffle
    *                  just to null half of them on carrier rows.
    */
  def join(left: DataFrame, right: DataFrame, keyCol: String, tsCol: String,
           payload: Seq[String], tolerance: Option[String] = None,
           carryThreshold: Int = 8): DataFrame = {
    if (left.columns.length <= carryThreshold)
      joinCarry(left, right, keyCol, tsCol, payload, tolerance)
    else {
      // Projection pushdown: the as-of match for a left row depends only
      // on (key, ts), so compute matches once per DISTINCT (key, ts) —
      // slim shuffle through the window — and attach the wide payload
      // with an ordinary equi join afterwards (SMJ/broadcast, Catalyst's
      // pick). Deterministic by construction: no synthetic row ids.
      val slim = left.select(col(keyCol), col(tsCol)).distinct()
      val matched = joinCarry(slim, right, keyCol, tsCol, payload, tolerance)
      left.join(matched, Seq(keyCol, tsCol), "left")
    }
  }

  /** Union-and-carry core — every left column rides the shuffle+window.
    *
    * The carried right payload is ONE struct, not per-column carries:
    * attachment is row-atomic (a matched row's legitimate NULL payload
    * value must come through as NULL, never resurrect an older row's
    * value for that column), and duplicate right (key, ts) rows resolve
    * deterministically to the greatest payload tuple (the struct rides
    * the window sort when its type is orderable — maps aren't; there
    * the tie stays engine-order as before). */
  private def joinCarry(left: DataFrame, right: DataFrame, keyCol: String, tsCol: String,
                        payload: Seq[String], tolerance: Option[String]): DataFrame = {
    val lCols = left.columns.toIndexedSeq
    val pStruct = struct((payload.map(col) :+ col(tsCol).as("__mts")): _*)
    val pType = org.apache.spark.sql.types.StructType(
      payload.map(c => right.schema(c)) :+
        org.apache.spark.sql.types.StructField("__mts", right.schema(tsCol).dataType))
    // Right rows become carrier rows: payload present, left columns null.
    val rTagged = right.select(
      (col(keyCol) +: col(tsCol).as("__ts") +: lit(0).as("__side") +: pStruct.as("__p") +:
        lCols.filterNot(c => c == keyCol).map(c => lit(null).cast(left.schema(c).dataType).as(c))): _*)
    val lTagged = left.select(
      (col(keyCol) +: col(tsCol).as("__ts") +: lit(1).as("__side") +:
        lit(null).cast(pType).as("__p") +:
        lCols.filterNot(c => c == keyCol).map(col)): _*)
    val unioned = rTagged.unionByName(lTagged)
    // Order right rows before left rows at equal ts => `<=` semantics;
    // among equal-ts right rows the greatest payload struct sorts last,
    // so `last()` picks it — a deterministic tie policy.
    val sortKeys = Seq(col("__ts").asc, col("__side").asc) ++
      (if (org.apache.spark.sql.catalyst.expressions.RowOrdering.isOrderable(pType))
         Seq(col("__p").asc_nulls_first) else Nil)
    val w = Window.partitionBy(col(keyCol))
      .orderBy(sortKeys: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = unioned
      .withColumn("__pc", last(col("__p"), ignoreNulls = true).over(w))
    // the matched right-row timestamp rides inside the struct so a
    // tolerance bound can null out stale matches after the window pass
    val fresh: Column = tolerance match {
      case Some(t) => col("__pc.__mts") >= col("__ts") - expr(s"INTERVAL $t")
      case None    => col("__pc").isNotNull
    }
    carried.filter(col("__side") === 1)
      .select((lCols.map(col) ++ payload.map(c =>
        when(fresh, col(s"__pc.$c")).as(s"right_$c"))): _*)
  }
}
