package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.util.concurrent.atomic.AtomicLong

/** Shuffle rows/bytes evidence tool (r20, VERDICT r19 Next #6 — guide
  * §2.3's "shuffle fewer bytes" claims need a rows-shuffled figure, not
  * an exchange count). Runs named SparkEntry queries (plus inline
  * reconstructions of superseded shapes for A/B) under a stage-metrics
  * listener and prints total shuffle records/bytes written and read per
  * run. Usage: `sbt "runMain graft.ShuffleProbe q336"`. */
object ShuffleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "4000")
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val wRec = new AtomicLong; val wBytes = new AtomicLong
    val rRec = new AtomicLong; val rBytes = new AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val m = e.stageInfo.taskMetrics
        if (m != null) {
          wRec.addAndGet(m.shuffleWriteMetrics.recordsWritten)
          wBytes.addAndGet(m.shuffleWriteMetrics.bytesWritten)
          rRec.addAndGet(m.shuffleReadMetrics.recordsRead)
          rBytes.addAndGet(m.shuffleReadMetrics.totalBytesRead)
        }
      }
    })
    def run(name: String, df: => DataFrame): Unit = {
      wRec.set(0); wBytes.set(0); rRec.set(0); rBytes.set(0)
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      val sec = (System.nanoTime() - t0) / 1e9
      graft.operators.Dedup.unpersistAll()
      // listener events are async — give the bus a moment to drain
      // (listenerBus.waitUntilEmpty is private[spark]; stage-completed
      // events for a finished job land well within this)
      Thread.sleep(1500)
      System.err.println(f"[shuffleprobe] $name sec=$sec%.2f " +
        s"shuffleWrite=${wRec.get}rows/${wBytes.get}B " +
        s"shuffleRead=${rRec.get}rows/${rBytes.get}B")
    }
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .orElse(args.headOption).map(_.split(",").filter(_.nonEmpty).toSet)
    val names = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.exists(n.contains)) }
    for ((name, fn) <- names; runNo <- 1 to 2)
      run(s"$name run$runNo", fn(spark, sfDir))
    // inline reconstruction of the PRE-r19 q336 shape (commit 7df968d:
    // per-row left join + conditional count, no lineitem pre-agg) — the
    // A/B control for the rows-shuffled claim. Evidence-only: NOT a
    // declared query, never benched.
    if (only.forall(_.exists("q336_old".contains))) {
      import graft.operators.Dedup
      for (runNo <- 1 to 2) {
        val s = spark
        val o = Tables.orders(s, sfDir).select(col("o_orderkey"))
        val li = Tables.lineitem(s, sfDir).select(col("l_orderkey"))
        val fan = Dedup.cacheScoped(o.join(li,
            o("o_orderkey") === li("l_orderkey"), "left")
          .groupBy(col("o_orderkey"))
          .agg(sum(when(col("l_orderkey").isNotNull, 1L).otherwise(0L))
            .as("fanout"))
          .select(lit("all").as("g"), col("fanout")))
        val p99 = graft.operators.Selection.exactGroupedQuantiles(
            fan, "g", "fanout", Seq(0.99))
          .select(col("value").as("p99"))
        val st = fan.agg(count(lit(1)).as("n_keys"),
          sum(col("fanout")).as("n_rows"), max(col("fanout")).as("max_fanout"))
        val mean = col("n_rows").cast("double") / col("n_keys").cast("double")
        val over = fan.crossJoin(broadcast(st))
          .filter(col("fanout").cast("double") > lit(2.0) * mean)
          .agg(count(lit(1)).as("n_keys_over_2x"))
        run(s"q336_old run$runNo",
          st.crossJoin(broadcast(p99)).crossJoin(broadcast(over))
            .select(col("n_keys"), col("n_rows"), col("max_fanout"),
              SparkEntry.pround(mean, 9).as("mean_fanout"),
              SparkEntry.pround(col("p99"), 9).as("p99_fanout"),
              col("n_keys_over_2x")))
      }
    }
    spark.stop()
  }
}
