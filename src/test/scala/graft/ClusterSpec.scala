package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.Cluster

/** Round-8 clustering operators: multi-step Lloyd k-means (driver-loop,
  * literal centroids) and SemDeDup. Planted-blob semantics, partition-
  * layout invariance, empty-cluster carry. */
class ClusterSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** 3 well-separated 4-d blobs of 5 vectors each; keys 0,1,2 are one
    * per blob so the k=3 seeds start in distinct basins. */
  private def blobs = {
    val centers = Seq(
      Array(10f, 0f, 0f, 0f), Array(0f, 10f, 0f, 0f), Array(0f, 0f, 10f, 0f))
    val rows = for {
      b <- 0 until 3
      i <- 0 until 5
    } yield {
      // deterministic small offsets keep each point firmly in its blob
      val off = 0.1f * ((b * 5 + i) % 3 - 1)
      val v = centers(b).clone()
      v(3) = off
      // key layout: 0,1,2 are blob exemplars (the seeds), rest arbitrary
      val key = if (i == 0) b.toLong else (3 + b * 4 + (i - 1)).toLong
      (key, v.toSeq)
    }
    rows.toDF("key", "vec")
  }

  test("lloyd recovers planted blobs: every member lands with its seed, sizes 5/5/5") {
    val (state, means) = Cluster.lloyd(blobs, col("key"), col("vec"), k = 3, iters = 3)
    val sizes = means.select(col("cluster"), col("n_members")).distinct()
      .collect().map(r => (r.getInt(0), r.getLong(1))).toMap
    assert(sizes === Map(0 -> 5L, 1 -> 5L, 2 -> 5L))
    // centroids converge to the blob centers (offsets average ~0 on dim 3)
    state.centroids.zipWithIndex.foreach { case (c, b) =>
      assert(math.abs(c(b) - 10.0) < 0.2, s"centroid $b dim $b = ${c(b)}")
      assert(math.abs(c(3)) < 0.2)
    }
  }

  test("lloyd trajectory is partition-layout invariant (repartition(7) ≡ repartition(2))") {
    def run(parts: Int) = {
      val (_, means) = Cluster.lloyd(blobs.repartition(parts), col("key"), col("vec"), k = 3, iters = 3)
      means.collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet
    }
    assert(run(7) === run(2))
  }

  test("assignCol breaks exact distance ties toward the lower centroid id") {
    val df = Seq((0L, Seq(0f, 5f))).toDF("key", "vec")
    // equidistant centroids at (0,0) and (0,10)
    val cents = Seq(Array(0f, 0f), Array(0f, 10f))
    val cid = df.select(Cluster.assignCol(col("vec"), cents).as("c")).head().getInt(0)
    assert(cid === 0)
  }

  test("empty cluster carries its previous centroid instead of NaN") {
    // seed 2 starts on an outlier that immediately loses all members:
    // both its points sit closer to blob 0 after one refinement
    val df = Seq(
      (0L, Seq(10f, 0f)), (1L, Seq(0f, 10f)), (2L, Seq(9f, 1f)),
      (3L, Seq(10.2f, 0f)), (4L, Seq(0f, 10.2f))
    ).toDF("key", "vec")
    val (state, _) = Cluster.lloyd(df, col("key"), col("vec"), k = 3, iters = 3)
    state.centroids.foreach(c => c.foreach(x => assert(!x.isNaN)))
    assert(state.centroids.length === 3)
  }

  test("semDedup removes exactly the higher-keyed near-duplicates within a cluster") {
    // blob 0 gets two exact copies of key 0's vector (keys 100, 101);
    // cosine(copy, original) = 1 ≥ τ, so 100 and 101 are removed and
    // key 0 (the lowest-keyed exemplar) survives.
    val dups = Seq(
      (100L, Seq(10f, 0f, 0f, 0.1f)), (101L, Seq(10f, 0f, 0f, 0.1f))
    ).toDF("key", "vec")
    val out = Cluster.semDedup(blobs.unionByName(dups), col("key"), col("vec"),
      k = 3, iters = 1, minCosine = 0.999)
    val removed = out.filter(col("removed")).select(col("key"))
      .collect().map(_.getLong(0)).toSet
    // the original blob members are nearly parallel (cos > 0.999 for
    // same-center points with tiny dim-3 offsets), so compute the
    // expected set directly from the definition: lower-keyed neighbor
    // with cosine ≥ τ in the same cluster.
    val rows = out.collect().map(r => (r.getLong(0), r.getInt(1))).toMap
    val vecs = blobs.unionByName(dups).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).toMap
    def cos(a: Array[Float], b: Array[Float]): Double = {
      val dot = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
      val na = math.sqrt(a.map(x => x.toDouble * x.toDouble).sum)
      val nb = math.sqrt(b.map(x => x.toDouble * x.toDouble).sum)
      dot / (na * nb)
    }
    val expected = rows.keys.filter { k =>
      rows.keys.exists(j => j < k && rows(j) == rows(k) && cos(vecs(j), vecs(k)) >= 0.999)
    }.toSet
    assert(removed === expected)
    assert(removed.contains(100L) && removed.contains(101L))
    assert(!removed.contains(0L))
  }

  test("semDedup output covers every input key exactly once") {
    val out = Cluster.semDedup(blobs, col("key"), col("vec"), k = 3, iters = 1, minCosine = 2.0)
    // τ > 1 → nothing can be removed; all 15 keys present, none removed
    val rows = out.collect()
    assert(rows.length === 15)
    assert(rows.forall(!_.getBoolean(2)))
  }

  test("trained IVF is a deterministic high-recall subset of brute force (real embeddings)") {
    val emb = Tables.embeddings(spark, TestSpark.sf0001)
    val q = emb.filter(col("vec_id") < 10)
    val brute = graft.operators.Similarity.bruteForceTopK(
        emb, col("vec_id"), col("embedding"),
        q, col("vec_id"), col("embedding"), k = 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val (state, _) = Cluster.lloyd(emb, col("vec_id"), col("embedding"), k = 8, iters = 2)
    val ivf = Cluster.ivfTopK(emb, col("vec_id"), col("embedding"),
        q, col("vec_id"), col("embedding"), state, k = 5, nprobe = 3)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (brute & ivf).size.toDouble / brute.size
    // 3-of-8 refined cells on near-random 64-d vectors (the regime where
    // IVF recall is weakest); the pipeline is deterministic end to end,
    // so this is a regression bound, not a flaky sample
    assert(recall >= 0.5, s"trained-IVF recall too low: $recall")
    // nprobe=8 probes every cell → IVF must equal brute force exactly
    val full = Cluster.ivfTopK(emb, col("vec_id"), col("embedding"),
        q, col("vec_id"), col("embedding"), state, k = 5, nprobe = 8)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    assert(full === brute, "all-cells IVF must recover brute force exactly")
  }
}
