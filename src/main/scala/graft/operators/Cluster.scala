package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.functions.Vectors

/** Distributed Lloyd k-means over embedding columns — the centroid
  * instance of the [[Optim]] training-loop discipline (reference
  * doc2dataset has no clustering; this is part of the LLM-data-pipeline
  * surface: SemDeDup, IVF coarse quantizers and corpus cartography all
  * start from "k-means the embeddings"). [EXT]
  *
  * Scale shape: centroids ride the plan as LITERALS (k×d floats,
  * broadcast with the closure — exactly how a trained model's
  * coefficients ship), so ASSIGNMENT is map-side only: the corpus never
  * shuffles for it. Each Lloyd step is one scan — assignment feeds a
  * partial-aggregated per-(cluster, dim) mean (shuffle rows = k×d per
  * partition, not the corpus), and the driver collects k×d doubles per
  * step (the textbook driver loop; at any corpus size the per-step
  * driver traffic is O(k·d)).
  *
  * Determinism (the oracle argument): seeds are the k lowest-keyed
  * vectors; distance is the codegen [[Vectors.l2Distance]] kernel
  * (double accumulator, index order — bit-matches DuckDB's
  * `list_distance`, q66/q85-proven); argmin ties break on the lower
  * centroid id via struct ordering; per-dim means use DECIMAL(27,12)
  * exact sums (partial-agg-order-free) rounded to 9 and are cast to
  * FLOAT before the next iteration (both engines do the identical
  * round-then-narrow, the q144 centroid discipline) — the whole
  * trajectory is engine-exact, so a 3-iteration run hash-matches SQL.
  */
object Cluster {

  /** Centroids after a refinement step (clusters that lost every
    * member keep their previous centroid — the standard Lloyd
    * empty-cluster carry). Member counts deliberately do NOT live
    * here: the final step's counts ride the means frame [[lloyd]]
    * returns (`n_members`), and a driver copy would either be stale
    * by one step or force collecting a frame most callers never
    * need. */
  final case class KMeansState(centroids: Array[Array[Float]])

  /** Map-side nearest-centroid id for `vec` against literal centroids:
    * `least` over (distance, cid) structs — equal distances resolve to
    * the lower cid by struct ordering. Zero shuffle, zero join.
    * Precondition: `vec` is non-null and matches the centroid
    * dimension (a mismatch nulls the distance, which struct ordering
    * would silently sort first). */
  def assignCol(vec: Column, centroids: Seq[Array[Float]]): Column = {
    require(centroids.size >= 2, "need at least 2 centroids")
    val scored = centroids.zipWithIndex.map { case (c, i) =>
      struct(Vectors.l2Distance(vec, typedlit(c.toSeq)).as("d"), lit(i).as("cid"))
    }
    least(scored: _*).getField("cid")
  }

  /** Per-(cluster, dim) exact-decimal means of `vec` under the given
    * centroid assignment — ONE scan, partial-aggregated. Columns:
    * cluster, dim (long), cv (round-9 double), n_members.
    *
    * The round-9 is `floor(x·1e9 + 0.5)/1e9` rather than `round(x, 9)`:
    * Spark rounds via exact BigDecimal HALF_UP while DuckDB rounds in
    * double arithmetic, and a mean landing exactly on a 9th-decimal
    * half-boundary (observed at sf0.1, a 1-ulp divergence) splits them.
    * The floor form is pure IEEE double ops — bit-identical in any
    * engine by construction, so the whole k-means trajectory stays
    * oracle-exact at every scale. */
  def meansUnder(df: DataFrame, vec: Column, centroids: Seq[Array[Float]]): DataFrame =
    df.select(assignCol(vec, centroids).as("cluster"),
        posexplode(vec).as(Seq("dim", "v")))
      .groupBy(col("cluster"), col("dim").cast("long").as("dim"))
      .agg((floor(sum(col("v").cast("double").cast(DecimalType(27, 12)))
          .cast("double") / count(lit(1)) * 1e9 + 0.5) / 1e9).as("cv"),
        count(lit(1)).as("n_members"))

  /** `iters` Lloyd steps from the k lowest-`key` vectors. Returns the
    * final state AND the final step's distributed per-(cluster, dim)
    * mean frame (so callers that only need the aggregate never collect
    * it — the returned frame is the plan, not data). `iters = 1` is
    * exactly one assign+recompute (q85's shape). */
  def lloyd(df: DataFrame, key: Column, vec: Column, k: Int, iters: Int): (KMeansState, DataFrame) = {
    require(iters >= 1, "iters must be >= 1")
    val seeds: Array[Array[Float]] = df.select(key.as("__k"), vec.as("__v"))
      .orderBy(col("__k")).limit(k)
      .collect().map(_.getSeq[Float](1).toArray)
    require(seeds.length == k, s"fewer than $k vectors to seed from")
    var state = KMeansState(seeds)
    var lastMeans: DataFrame = null
    for (step <- 1 to iters) {
      lastMeans = meansUnder(df, vec, state.centroids.toSeq)
      if (step < iters) state = refine(state, lastMeans.collect().map { r =>
        (r.getInt(0), r.getLong(1).toInt, r.getDouble(2), r.getLong(3))
      })
    }
    // member counts live on the returned means frame (n_members):
    // callers that need them run the frame; collecting it here would
    // tax every caller that doesn't.
    (state, lastMeans)
  }

  /** Fold one collected (cluster, dim, cv, n) step into new centroids;
    * clusters absent from the rows carry their previous centroid. */
  private def refine(prev: KMeansState, rows: Array[(Int, Int, Double, Long)]): KMeansState = {
    val byCluster = rows.groupBy(_._1)
    val cents = prev.centroids.zipWithIndex.map { case (old, cid) =>
      byCluster.get(cid) match {
        case Some(dims) =>
          val c = old.clone()
          dims.foreach { case (_, d, v, _) => c(d) = v.toFloat }
          c
        case None => old
      }
    }
    KMeansState(cents)
  }

  /** The `nprobe` nearest centroid ids for `vec`, as an exploded
    * column of cids — the literal-centroid twin of [[assignCol]]:
    * sort the (distance, cid) structs in-row and take the prefix.
    * Map-side, zero shuffle, ties to the lower cid. */
  def probeCol(vec: Column, centroids: Seq[Array[Float]], nprobe: Int): Column = {
    val scored = centroids.zipWithIndex.map { case (c, i) =>
      struct(Vectors.l2Distance(vec, typedlit(c.toSeq)).as("d"), lit(i).as("cid"))
    }
    explode(transform(slice(array_sort(array(scored: _*)), 1, nprobe),
      s => s.getField("cid")))
  }

  /** IVF top-k over TRAINED centroids — [[Similarity.ivfTopK]] with two
    * upgrades: the coarse quantizer is a real Lloyd-refined codebook
    * (not raw seed vectors), and BOTH the corpus assignment and the
    * query probes are literal-centroid map-side expressions (the
    * existing tier plans a per-vector window rank — a corpus shuffle
    * this formulation deletes). The only shuffle left is the candidate
    * equi-join on the cell id, and the query side broadcasts. Fully
    * deterministic (engine-exact centroids + bit-exact cosine), so the
    * WHOLE approximate search is oracle-matchable — recall loss vs
    * brute force is a measured property, not nondeterminism. */
  def ivfTopK(corpus: DataFrame, corpusKey: Column, corpusVec: Column,
              queries: DataFrame, queryKey: Column, queryVec: Column,
              state: KMeansState, k: Int, nprobe: Int): DataFrame = {
    val cents = state.centroids.toSeq
    val assigned = corpus.select(corpusKey.as("neighbor_id"), corpusVec.as("__cv"),
      assignCol(corpusVec, cents).as("cid"))
    val probes = queries.select(queryKey.as("query_id"), queryVec.as("__qv"),
      probeCol(queryVec, cents, nprobe).as("cid"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    assigned.join(broadcast(probes), Seq("cid"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        Vectors.cosine(col("__qv"), col("__cv")).as("cosine"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cosine"),
        col("rank").cast("long").as("rank"))
  }

  /** SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic
    * deduplication = k-means the embeddings, then drop any vector with
    * a sufficiently-cosine-similar LOWER-KEYED neighbor in the SAME
    * cluster. Clustering bounds the pair blow-up to Σ|cluster|² (the
    * embedding analog of LSH blocking — never corpus²); the intra-
    * cluster join shuffles on the cluster id only. Returns every input
    * key with (cluster, removed). Deterministic keep-lowest-key rule
    * (the paper keeps a random exemplar; lowest-key is the oracle-able
    * choice, same as every dedup family here — q30/q32 discipline). */
  def semDedup(df: DataFrame, key: Column, vec: Column, k: Int, iters: Int,
               minCosine: Double): DataFrame = {
    val (state, _) = lloyd(df, key, vec, k, iters + 1) // state = centroids after `iters` refinements
    val assigned = Dedup.cacheScoped(
      df.select(key.as("key"), vec.as("__v"),
        assignCol(vec, state.centroids.toSeq).as("cluster")))
    val b = assigned.select(col("cluster"), col("key").as("__kb"), col("__v").as("__vb"))
    val removed = assigned.join(b,
        assigned("cluster") === b("cluster") && col("__kb") < assigned("key")
          && Vectors.cosine(col("__v"), col("__vb")) >= minCosine,
        "left_semi")
      .select(col("key"))
    assigned.join(removed.withColumn("removed", lit(true)), Seq("key"), "left")
      .select(col("key"), col("cluster"), coalesce(col("removed"), lit(false)).as("removed"))
  }
}
