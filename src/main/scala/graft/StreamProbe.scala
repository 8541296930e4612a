package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Micro-batch cost breakdown for the streaming queries — the r20
  * evidence tool for q65/q131 (guide §1: measure first). Registers a
  * StreamingQueryListener and runs the matching SparkEntry queries
  * twice (cold, then warm — the bench's comparable steady state),
  * printing each micro-batch's durationMs map (triggerExecution,
  * queryPlanning, addBatch, getBatch, walCommit, commitOffsets) and
  * state-operator metrics (rows total/updated, memory, commit time) so
  * the per-batch overheads are attributable instead of guessed at.
  * Usage: SPARK_GRAFT_ONLY=q65 sbt "runMain graft.StreamProbe". */
object StreamProbe {
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
    spark.streams.addListener(new StreamingQueryListener {
      override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
      override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
        val p = e.progress
        val dur = p.durationMs
        val keys = Seq("triggerExecution", "queryPlanning", "getBatch",
          "addBatch", "walCommit", "commitOffsets", "latestOffset")
        val ds = keys.flatMap(k => Option(dur.get(k)).map(v => s"$k=${v}ms"))
        System.err.println(s"[streamprobe] ${p.name} batch=${p.batchId} " +
          s"rowsIn=${p.numInputRows} ${ds.mkString(" ")}")
        p.stateOperators.foreach { so =>
          System.err.println(s"[streamprobe]   state op=${so.operatorName} " +
            s"rowsTotal=${so.numRowsTotal} updated=${so.numRowsUpdated} " +
            s"commitMs=${so.allUpdatesTimeMs}+${so.commitTimeMs} " +
            s"memUsed=${so.memoryUsedBytes}")
        }
      }
    })
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").filter(_.nonEmpty).toSet)
    val names = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.exists(n.contains)) }
    for ((name, fn) <- names; run <- 1 to 2) {
      val t0 = System.nanoTime()
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        System.err.println(s"[streamprobe] $name failed: ${e.getMessage}")
      }
      System.err.println(f"[streamprobe] $name run$run total=${(System.nanoTime() - t0) / 1e9}%.2fs")
      graft.operators.Dedup.unpersistAll()
    }
    spark.stop()
  }
}
