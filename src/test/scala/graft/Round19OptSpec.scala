package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Round-19 OPTIMIZATION specs: the shuffle-removal rewrites must be
  * row-for-row equivalent to the formulations they replaced —
  * the in-row pair transform vs the (user_id, sid) self-join behind
  * the co-visitation family (q148/q162/q183/q203–q206/q208/q228), the
  * free total from the dense-id counts pass (q344), and the
  * session-set frame vs the old distinct (user_id, sid, page) frame
  * at fixture scale. */
class Round19OptSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("sessionPagePairs ≡ the old (user_id, sid) self-join with page_a < page_b") {
    // synthetic sets incl. empty, singleton, and >2-page sessions
    val sets = Seq(
      (1L, 0L, Seq.empty[Long]),         // all-null-page session: no pairs
      (1L, 1L, Seq(7L)),                 // singleton: no pairs
      (2L, 0L, Seq(1L, 5L, 9L)),         // 3 pairs
      (3L, 0L, Seq(2L, 3L)),             // 1 pair
      (3L, 1L, Seq(2L, 3L, 4L, 8L))      // 6 pairs
    ).toDF("user_id", "sid", "pgs")
      .select(col("user_id"), col("sid"), array_sort(col("pgs")).as("pgs"))
    val got = SparkEntry.sessionPagePairs(sets)
      .groupBy(col("page_a"), col("page_b")).agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

    // reference: the pre-r19 formulation — distinct (user_id, sid, page)
    // self-joined on the session key, page_a < page_b
    val d = sets.select(col("user_id"), col("sid"), explode(col("pgs")).as("page"))
    val a = d.select(col("user_id"), col("sid"), col("page").as("page_a"))
    val b = d.select(col("user_id"), col("sid"), col("page").as("page_b"))
    val want = a.join(b, Seq("user_id", "sid"))
      .filter(col("page_a") < col("page_b"))
      .groupBy(col("page_a"), col("page_b")).agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

    assert(got == want)
    assert(got.nonEmpty)
  }

  test("sessionPageSets on the fixture ≡ the old distinct session-page frame") {
    val dir = TestSpark.sf0001
    val sets = SparkEntry.sessionPageSets(spark, dir)
    // exploded sets = the old distinct (user_id, sid, page) frame
    // restricted to non-null pages (nulls never paired in the old join)
    val exploded = sets
      .select(col("user_id"), col("sid"), explode(col("pgs")).as("page"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val old = Tables.events(spark, dir)
      .select(col("user_id"), col("ts"), col("event_id"),
        get_json_object(col("props"), "$.k").cast("long").as("page"))
      .withColumn("gap", (unix_timestamp(col("ts")) -
        unix_timestamp(lag(col("ts"), 1).over(w))) >= 1800)
      .withColumn("brk", when(col("gap").isNull || !col("gap"), 0L).otherwise(1L))
      .withColumn("sid", sum(col("brk")).over(
        w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.currentRow)))
      .select(col("user_id"), col("sid"), col("page")).distinct()
      .filter(col("page").isNotNull)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(exploded == old)
    assert(exploded.nonEmpty)
  }

  test("withDenseIdsAndCount: the free total equals the frame's row count") {
    val df = (1 to 137).map(i => (i.toLong, s"v$i")).toDF("k", "v")
    val (ranked, n) = graft.operators.DocPipeline
      .withDenseIdsAndCount(df, col("k"), "rid")
    assert(n == 137L)
    assert(ranked.count() == 137L)
    // ids stay dense 0..n-1
    val ids = ranked.select(col("rid")).collect().map(_.getLong(0)).sorted
    assert(ids.toSeq == (0L until 137L).toSeq)
  }
}
