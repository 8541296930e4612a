package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.Skew
import graft.streaming.StreamingOps

class SkewSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // one pathological key holding 90% of rows + a uniform tail
  private def skewed = {
    val hot = (0 until 9000).map(i => (1L, i.toLong))
    val tail = (0 until 1000).map(i => (2L + i % 50, i.toLong + 9000))
    (hot ++ tail).toDF("key", "row_id")
  }

  test("salted join == plain join on skewed data") {
    val dim = Seq((1L, "hot"), (2L, "cold"), (3L, "cold")).toDF("key", "label")
    val plain = skewed.join(dim, Seq("key")).groupBy("key", "label").count()
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val salted = Skew.saltedJoin(skewed, dim, "key", col("row_id"), salts = 8)
      .groupBy("key", "label").count()
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(salted == plain)
  }

  test("salted aggregation == plain aggregation, salts actually spread the hot key") {
    val plain = skewed.groupBy("key")
      .agg(count(lit(1)).as("n"), sum(col("row_id")).as("total"))
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    val salted = Skew.saltedSumCount(skewed, "key", col("row_id"), col("row_id"), salts = 8)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    assert(salted == plain)
    // the hot key must occupy >1 salt bucket in the partial phase
    val buckets = skewed.filter(col("key") === 1)
      .select(Skew.saltColumn(col("row_id"), 8).as("s"))
      .distinct().count()
    assert(buckets > 4, s"hot key only spread over $buckets salt buckets")
  }

  test("salt is deterministic across evaluations (retry safety)") {
    val a = skewed.select(col("row_id"), Skew.saltColumn(col("row_id"), 8).as("s"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val b = skewed.select(col("row_id"), Skew.saltColumn(col("row_id"), 8).as("s"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(a == b)
  }
}

class StatefulStreamingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("flatMapGroupsWithState running totals equal groupBy on replay") {
    val staging = new java.io.File("target/tmp/stateful_events").getAbsolutePath
    StreamingOps.stageEventsForStreaming(spark, TestSpark.sf0001, staging)
    val stream = StreamingOps.statefulUserTotals(StreamingOps.eventsStream(spark, staging))
    val got = StreamingOps.runToMemory(spark, stream, "spec_stateful",
        org.apache.spark.sql.streaming.OutputMode.Update())
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    val want = Tables.events(spark, TestSpark.sf0001)
      .groupBy("user_id").agg(count(lit(1)).as("n"), sum(col("value")).as("tv"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got.keySet == want.keySet)
    got.foreach { case (uid, (n, tv)) =>
      assert(n == want(uid)._1, s"user $uid count")
      assert(math.abs(tv - want(uid)._2) < 1e-6, s"user $uid total")
    }
  }
}
