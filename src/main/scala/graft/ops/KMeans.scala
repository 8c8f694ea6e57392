package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed Lloyd k-means over an embedding column — the codebook
  * trainer the IVF index documents as its real-deployment companion
  * (`VectorOps.knnIvf`'s seeded random codebook keeps the OPERATOR
  * deterministic; this trains a data-adapted one with the same
  * downstream shape). Spherical variant: assignment is by COSINE
  * (`NearestCentroids` — the metric the IVF index retrieves by), the
  * centroid update is the arithmetic mean (unnormalized — scale does not
  * affect subsequent cosine assignments, so renormalizing would only
  * change the reported norms, not the clustering).
  *
  * 100 TB shape: every iteration is ONE aggregation job — assignment is
  * the map-side `NearestCentroids` expression over the broadcast-literal
  * codebook (no join, no shuffle of vectors), and the per-cluster
  * centroid update rides the mergeable O(dim) `VecSumD` buffers, so the
  * exchange carries ≤ k × partitions buffers of `dim` doubles no matter
  * the corpus size. Driver state is the k×dim codebook (bounded).
  *
  * Determinism: initial centroids are the vectors of the k rows with the
  * smallest (xxhash64(id), id) — a TakeOrdered pass, reproducible across
  * runs, partitionings and cluster sizes (the same device as t09's
  * md5-ranked sampling); ties in assignment break to the lower centroid
  * id inside NearestCentroids; empty clusters keep their previous
  * centroid. Float→double widening happens once at init and in the sum
  * buffers, in element order, so repeated runs are bit-identical.
  */
object KMeans {

  /** Train `k` centroids with `iters` Lloyd iterations.
    * Returns the k×dim codebook (row i = centroid i).
    *
    * `init` warm-starts from a caller-supplied codebook instead of the
    * hash-ranked seeding — the standard production device when a prior
    * codebook exists (incremental re-training on a grown corpus, or
    * domain-known cluster anchors); centroid i keeps meaning "the
    * cluster seeded by init(i)", which also makes planted-cluster
    * convergence provable (s07b). */
  def fit(df: DataFrame, idCol: String, vecCol: String,
          k: Int, iters: Int,
          init: Option[Array[Array[Double]]] = None): Array[Array[Double]] = {
    require(k > 0 && iters >= 0, s"need k > 0, iters >= 0 (got $k, $iters)")
    require(init.forall(_.length == k), "init codebook must have k rows")
    // Drop null vectors AND vectors containing null elements: VecBuf.add
    // skips null elements, so an all-null-element group would aggregate to
    // a NULL struct (NPE below), and the seeding row-decode would
    // MatchError on a null element.
    val vecs = df.select(col(idCol).as("__id"), col(vecCol).as("__vec"))
      .filter(col("__vec").isNotNull &&
        !exists(col("__vec"), _.isNull))
    // deterministic seeding: k smallest (xxhash64(id), id) — TakeOrdered,
    // no global sort — unless the caller warm-starts
    var codebook: Array[Array[Double]] = init.getOrElse(vecs
      .orderBy(xxhash64(col("__id")), col("__id"))
      .limit(k).collect()
      .map(_.getSeq[Any](1).map {
        case f: Float => f.toDouble
        case d: Double => d
      }.toArray))
    require(codebook.nonEmpty, "kmeans: no input vectors")

    var it = 0
    while (it < iters) {
      // one job: map-side assignment + mergeable vector-sum partials
      val sums = vecs
        .select(assignTo(col("__vec"), codebook).as("__c"), col("__vec"))
        .groupBy("__c")
        .agg(graft.functions.AggExprs.vecSum(col("__vec")).as("s"))
        .collect() // bounded: ≤ k rows of (sum array<double>, n)
      val next = codebook.map(_.clone()) // empty clusters keep position
      sums.foreach { r =>
        val c = r.getInt(0)
        val s = r.getStruct(1)
        // NULL struct ⇒ the group contributed no usable vectors; keep the
        // previous centroid (same rule as an empty cluster).
        if (s != null) {
          val sum = s.getSeq[Double](0)
          val n = s.getLong(1).toDouble
          if (n > 0) next(c) = sum.map(_ / n).toArray
        }
      }
      codebook = next
      it += 1
    }
    codebook
  }

  /** Nearest-centroid id (the map-side assignment expression). */
  def assignTo(vec: Column, codebook: Array[Array[Double]]): Column =
    graft.functions.VectorExprs.nearestCentroids(vec, codebook, 1).getItem(0)

  /** Per-cluster summary of a fitted codebook over `df`: cluster id,
    * member count, centroid L2 norm, mean member-to-centroid cosine. */
  def summary(df: DataFrame, idCol: String, vecCol: String,
              k: Int, iters: Int): DataFrame = {
    val codebook = fit(df, idCol, vecCol, k, iters)
    val spark = df.sparkSession
    val cb = spark.createDataFrame(
      codebook.zipWithIndex.map { case (c, i) =>
        (i, c.toSeq, math.sqrt(c.map(x => x * x).sum))
      }.toSeq).toDF("cluster_id", "centroid", "centroid_norm")
    val assigned = df
      .filter(col(vecCol).isNotNull)
      .select(assignTo(col(vecCol), codebook).as("cluster_id"), col(vecCol).as("v"))
    assigned
      .join(broadcast(cb), "cluster_id")
      .select(col("cluster_id"),
        (graft.functions.VectorExprs.dotF32(col("v"), col("centroid")) /
          (graft.functions.VectorExprs.normF32(col("v")) *
            graft.functions.VectorExprs.normF32(col("centroid")))).as("cos"),
        col("centroid_norm"))
      .groupBy("cluster_id")
      .agg(count(lit(1)).as("n_vecs"),
        round(first(col("centroid_norm")), 4).as("centroid_norm"),
        round(avg(col("cos")), 4).as("avg_cos"))
      .orderBy("cluster_id")
  }
}
