package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Vectors

/** Similarity search over an embedding column (`ArrayType(FloatType)`).
  *
  * Two tiers (SURVEY §2.5 Vector row / north-star):
  *  - [[bruteForceTopK]]: exact top-k cosine — broadcast the (small) query
  *    set against the corpus; the scan is a single codegen'd stage (the
  *    [[graft.functions.CosineSimilarity]] expression), per-partition
  *    top-k via window rank. At 100 TB the corpus side stays partitioned;
  *    only queries are broadcast — no shuffle of the corpus at all until
  *    the final k·|queries| rows.
  *  - [[lshTopK]]: approximate — random-hyperplane LSH bucket join prunes
  *    candidates (probes = sign-flip neighborhoods), then exact rerank.
  *    This is the scale path: candidate generation is an equi-join on
  *    bucket id instead of a cross product.
  */
object Similarity {

  /** Deterministic random unit-ish hyperplanes: plane p, dim d coefficient
    * derived from a hash — reproducible across engines and runs (no RNG
    * state; xxhash64 of (p,d) scaled to [-1,1]). */
  private def planeCoef(p: Int, d: Column): Column =
    (xxhash64(lit(p), d) % 1000000L).cast("double") / 1000000.0

  /** Sign-bit bucket of a vector against `planes` deterministic
    * hyperplanes → integer bucket in [0, 2^planes). */
  def hyperplaneBucket(vec: Column, planes: Int): Column = {
    val bits = (0 until planes).map { p =>
      val proj = aggregate(
        zip_with(vec, sequence(lit(0), size(vec) - 1),
          (x, i) => x.cast("double") * planeCoef(p, i)),
        lit(0.0), (acc, x) => acc + x)
      when(proj >= 0, lit(1L << p)).otherwise(lit(0L))
    }
    bits.reduce((a, b) => a.bitwiseOR(b))
  }

  /** Exact top-k cosine neighbors for each query vector.
    *
    * @param corpus  (key, vec) corpus side — stays distributed
    * @param queries (qkey, qvec) query side — must be broadcastable
    */
  def bruteForceTopK(corpus: DataFrame, corpusKey: Column, corpusVec: Column,
                     queries: DataFrame, queryKey: Column, queryVec: Column,
                     k: Int, metric: String = "cosine"): DataFrame = {
    val c = corpus.select(corpusKey.as("neighbor_id"), corpusVec.as("__cv"))
    val q = queries.select(queryKey.as("query_id"), queryVec.as("__qv"))
    // cosine ranks best-first descending; L2 distance ascending — both
    // through the same broadcast + WindowGroupLimit shape
    val (scoreName, score, ord) = metric match {
      case "cosine" => ("cosine", Vectors.cosine(col("__qv"), col("__cv")),
        col("cosine").desc)
      case "l2"     => ("dist", Vectors.l2Distance(col("__qv"), col("__cv")),
        col("dist").asc)
      case other    => throw new IllegalArgumentException(s"unknown metric: $other")
    }
    val scored = c.join(broadcast(q), col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"), score.as(scoreName))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(ord, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col(scoreName), col("rank"))
  }

  /** IVF-style approximate top-k: corpus is partitioned into `nlist`
    * inverted lists by nearest centroid; queries probe the `nprobe`
    * nearest lists and rerank exactly within them.
    *
    * Centroids here are a deterministic corpus sample (smallest keys) —
    * the IVF *plumbing* (assignment join shape, probe fan-out, pruned
    * rerank) is what scales; production swaps the sample for k-means||
    * centroids without touching the plan. Everything is broadcast
    * (centroids are tiny) + equi-join on list id — the corpus is never
    * cross-joined against the query set. */
  def ivfTopK(corpus: DataFrame, corpusKey: Column, corpusVec: Column,
              queries: DataFrame, queryKey: Column, queryVec: Column,
              k: Int, nlist: Int = 16, nprobe: Int = 3): DataFrame = {
    val cents = corpus.select(corpusKey.as("cid"), corpusVec.as("cv"))
      .orderBy(col("cid")).limit(nlist)
    // assign each corpus vector to its nearest centroid (1 list each)
    val c = corpus.select(corpusKey.as("neighbor_id"), corpusVec.as("__cv"))
    val wAssign = Window.partitionBy(col("neighbor_id")).orderBy(col("__sim").desc, col("cid").asc)
    val assigned = c.join(broadcast(cents))
      .withColumn("__sim", Vectors.cosine(col("__cv"), col("cv")))
      .withColumn("__r", row_number().over(wAssign))
      .filter(col("__r") === 1)
      .select(col("neighbor_id"), col("__cv"), col("cid"))
    // each query probes its nprobe nearest lists
    val q = queries.select(queryKey.as("query_id"), queryVec.as("__qv"))
    val wProbe = Window.partitionBy(col("query_id")).orderBy(col("__sim").desc, col("cid").asc)
    val probes = q.join(broadcast(cents))
      .withColumn("__sim", Vectors.cosine(col("__qv"), col("cv")))
      .withColumn("__r", row_number().over(wProbe))
      .filter(col("__r") <= nprobe)
      .select(col("query_id"), col("__qv"), col("cid"))
    // exact rerank within probed lists only
    val scored = assigned.join(broadcast(probes), Seq("cid"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        Vectors.cosine(col("__qv"), col("__cv")).as("cosine"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cosine"), col("rank"))
  }

  /** Approximate top-k: LSH bucket equi-join (with single-bit-flip probe
    * expansion on the query side for recall), exact cosine rerank within
    * candidates. Falls back to fewer than k rows when a bucket is sparse —
    * callers trade recall for the pruned scan. */
  def lshTopK(corpus: DataFrame, corpusKey: Column, corpusVec: Column,
              queries: DataFrame, queryKey: Column, queryVec: Column,
              k: Int, planes: Int = 8, probeBits: Int = 1): DataFrame = {
    val c = corpus.select(corpusKey.as("neighbor_id"), corpusVec.as("__cv"),
      hyperplaneBucket(corpusVec, planes).as("bucket"))
    val qBase = queries.select(queryKey.as("query_id"), queryVec.as("__qv"),
      hyperplaneBucket(queryVec, planes).as("__b0"))
    // multi-probe: original bucket + all single-bit flips (probeBits=1)
    val probes: Column =
      if (probeBits <= 0) array(col("__b0"))
      else array((col("__b0") +: (0 until planes).map(p =>
        col("__b0").bitwiseXOR(lit(1L << p)))): _*)
    val q = qBase.select(col("query_id"), col("__qv"),
      explode(probes).as("bucket"))
    val scored = c.join(broadcast(q), Seq("bucket"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        Vectors.cosine(col("__qv"), col("__cv")).as("cosine"))
      .groupBy(col("query_id"), col("neighbor_id"))
      .agg(first(col("cosine")).as("cosine"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cosine"), col("rank"))
  }

  /** Maximal Marginal Relevance selection (Carbonell & Goldstein 1998):
    * greedily pick k of the candidates maximizing
    * `λ·rel(d) − (1−λ)·max_{s∈S} cos(d, s)` — relevance traded against
    * redundancy with what's already selected. The greedy argmax is
    * inherently sequential in k, so the RIGHT distributed shape is:
    * corpus-scale candidate generation via [[bruteForceTopK]]/[[ivfTopK]]
    * (the expensive part), then this ≤pool-row driver loop (the cheap
    * part — pool is bounded by construction, never corpus-sized). Ties
    * break to the smaller id so the selection is deterministic.
    *
    * @param cands (id, vector, relevance) pool, pre-scored against the query
    * @return (id, mmrScore, rank) in selection order, rank 1-based
    */
  def mmrSelect(cands: IndexedSeq[(Long, Array[Double], Double)], k: Int,
                lambda: Double): Seq[(Long, Double, Int)] = {
    val n = cands.size
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }
      s
    }
    val norms = cands.map(c => math.sqrt(dot(c._2, c._2)))
    def cos(i: Int, j: Int): Double =
      if (norms(i) == 0.0 || norms(j) == 0.0) 0.0
      else dot(cands(i)._2, cands(j)._2) / (norms(i) * norms(j))
    val taken = new Array[Boolean](n)
    // max cosine to the selected set — init −∞, NOT 0.0: cosines can be
    // negative, and a zero floor silently clamps the diversity penalty
    // into a bonus-free zone (found when the q242 oracle's true max
    // diverged on an all-negative neighborhood; the spec reference
    // always computed the unclamped max)
    val maxSim = Array.fill(n)(Double.NegativeInfinity)
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Double, Int)]
    var step = 0
    while (step < math.min(k, n)) {
      var best = -1; var bestScore = Double.NegativeInfinity
      var i = 0
      while (i < n) {
        if (!taken(i)) {
          val div = if (step == 0) 0.0 else maxSim(i)
          val sc = lambda * cands(i)._3 - (1 - lambda) * div
          if (sc > bestScore ||
            (sc == bestScore && (best < 0 || cands(i)._1 < cands(best)._1))) {
            best = i; bestScore = sc
          }
        }
        i += 1
      }
      taken(best) = true
      out += ((cands(best)._1, bestScore, step + 1))
      i = 0
      while (i < n) {
        if (!taken(i)) maxSim(i) = math.max(maxSim(i), cos(i, best))
        i += 1
      }
      step += 1
    }
    out.toSeq
  }
}
