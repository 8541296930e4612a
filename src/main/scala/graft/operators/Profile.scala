package graft.operators

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

/** Data profiling — per-column null count, exact distinct count, min/max —
  * in ONE pass over the table (the schema-health check run before any
  * training-data job; the reference's closest analog is the stats sidecar,
  * `writer.py:269-281` [EXT beyond it]).
  *
  * Scale shape: a single aggregation computes every column's profile
  * (count-distinct columns each add an Expand branch, still one scan),
  * then `stack` reshapes the one wide row to long format. Profiling N
  * columns costs one table pass, not N.
  *
  * `approxDistinct = true` is the 100 TB tier: `approx_count_distinct`
  * (HLL++, mergeable partial agg) instead of exact `countDistinct` —
  * no Expand multiplication of the scan (N exact distincts expand rows
  * ×(N+1)), bounded memory per column. Exact stays the default and the
  * oracle anchor (q84); the approx tier is q105, rows-only with a
  * 5%-accuracy spec — the q41/q57 discipline.
  */
object Profile {

  def profile(df: DataFrame, cols: Seq[String],
              approxDistinct: Boolean = false): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    // the reshape below interpolates names into an expr() string — quote
    // them as backticked identifiers and refuse the one char that can't
    // be quoted (no SQL can ride in through a column name)
    require(cols.forall(c => !c.contains("`") && !c.contains("'")),
      "profile: column names must not contain backticks or quotes")
    val aggs = cols.flatMap { c => Seq(
      // coalesce: sum over ZERO rows is NULL, and a profile of an empty
      // table must report 0 nulls, not a null count of null
      coalesce(sum(when(col(c).isNull, 1L).otherwise(0L)), lit(0L)).as(s"__null_$c"),
      (if (approxDistinct) approx_count_distinct(col(c))
       else countDistinct(col(c))).as(s"__nd_$c"),
      min(col(c)).cast("string").as(s"__min_$c"),
      max(col(c)).cast("string").as(s"__max_$c")) }
    val agged = df.agg(count(lit(1)).as("__n"), aggs: _*)
    val stackArgs = cols.map(c =>
      s"'$c', `__null_$c`, `__nd_$c`, `__min_$c`, `__max_$c`").mkString(", ")
    agged.select(col("__n").as("n_rows"),
        expr(s"stack(${cols.size}, $stackArgs) AS (col_name, n_null, n_distinct, min_val, max_val)"))
      .select(col("col_name"), col("n_rows"), col("n_null"),
        col("n_distinct"), col("min_val"), col("max_val"))
  }
}
