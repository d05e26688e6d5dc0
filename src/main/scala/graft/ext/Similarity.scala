package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`Array[Float]`).
  *
  * Baseline: brute-force cosine top-k — one pass, no shuffle beyond the final
  * top-k (TakeOrdered). Scale path: sign-random-projection LSH — vectors are
  * bucketed by the sign pattern of `nPlanes` fixed hyperplanes, and search
  * only probes the query's bucket (an equi-join at fleet scale), trading
  * recall for a ~2^nPlanes fan-in reduction.
  *
  * All arithmetic is double-precision composed from codegen'd higher-order
  * functions (`zip_with` + `aggregate`) — no UDFs in the hot path.
  */
object Similarity {

  /** Dot product of two float-array columns, computed in double. */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Brute-force cosine top-k neighbors of `queryVec` (a one-row DataFrame
    * with column `qv`). The broadcast + TakeOrdered plan is the right shape
    * at any scale: no shuffle of the big side. */
  def bruteForceTopK(em: DataFrame, idCol: String, vecCol: String,
                     queryVec: DataFrame, k: Int): DataFrame =
    em.crossJoin(broadcast(queryVec))
      .withColumn("cos", cosine(col(vecCol), col("qv")))
      .select(col(idCol), col("cos"))
      .orderBy(col("cos").desc, col(idCol))
      .limit(k)

  /** Deterministic ±1 hyperplanes (nPlanes × dim) from a fixed seed. */
  def planes(nPlanes: Int, dim: Int, seed: Long = 42L): Seq[Seq[Double]] = {
    val rng = new scala.util.Random(seed)
    Seq.fill(nPlanes)(Seq.fill(dim)(if (rng.nextBoolean()) 1.0 else -1.0))
  }

  /** LSH bucket id = sign bit pattern of the plane dot products. */
  def lshBucket(vec: Column, planes: Seq[Seq[Double]]): Column =
    planes.zipWithIndex.map { case (p, i) =>
      when(dot(vec, typedLit(p)) >= 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Bucketed ANN: assign every vector a bucket once (write-time at scale),
    * then probe only the query's bucket with exact cosine. */
  def annTopK(em: DataFrame, idCol: String, vecCol: String,
              queryVec: DataFrame, k: Int, nPlanes: Int, dim: Int,
              seed: Long = 42L): DataFrame = {
    val ps = planes(nPlanes, dim, seed)
    val bucketed = em.withColumn("bucket", lshBucket(col(vecCol), ps))
    val qb = queryVec.withColumn("bucket", lshBucket(col("qv"), ps))
    bucketed.join(broadcast(qb), Seq("bucket"))
      .withColumn("cos", cosine(col(vecCol), col("qv")))
      .select(col(idCol), col("cos"))
      .orderBy(col("cos").desc, col(idCol))
      .limit(k)
  }

  // ------------------------------------------------------------------ IVF --

  /** IVF coarse quantizer: KMeans centroids over the corpus (seeded, so the
    * index is reproducible). At 100 TB the centroids are trained on a sample
    * and the assignment is a write-time column like the LSH bucket. */
  def ivfTrain(em: DataFrame, vecCol: String, nLists: Int,
               seed: Long = 42L): Array[Array[Double]] = {
    val toVec = org.apache.spark.ml.functions.array_to_vector(
      transform(col(vecCol), x => x.cast("double")))
    val feats = em.select(toVec.as("features"))
    val km = new org.apache.spark.ml.clustering.KMeans()
      .setK(nLists).setSeed(seed).setMaxIter(10).setFeaturesCol("features")
    km.fit(feats).clusterCenters.map(_.toArray)
  }

  /** Nearest-centroid assignment as a pure column expression (argmin of
    * squared L2 over the broadcast centroid literals). */
  def ivfAssign(vec: Column, centroids: Array[Array[Double]]): Column = {
    val dists = centroids.zipWithIndex.map { case (c, i) =>
      val d = aggregate(
        zip_with(vec, typedLit(c.toSeq), (x, y) => {
          val diff = x.cast("double") - y
          diff * diff
        }),
        lit(0.0), (acc, v) => acc + v)
      struct(d.as("d"), lit(i).as("list"))
    }
    array_min(array(dists: _*)).getField("list")
  }

  /** IVF ANN: probe the `nProbe` lists nearest to the query with exact
    * cosine. Equi-join on the list id — same shuffle shape as LSH buckets. */
  def ivfTopK(em: DataFrame, idCol: String, vecCol: String,
              queryVec: DataFrame, k: Int, centroids: Array[Array[Double]],
              nProbe: Int = 2): DataFrame = {
    val bucketed = em.withColumn("list", ivfAssign(col(vecCol), centroids))
    val qLists = queryVec.withColumn("lists",
      slice(transform(array_sort(array(centroids.zipWithIndex.map { case (c, i) =>
        val d = aggregate(
          zip_with(col("qv"), typedLit(c.toSeq), (x, y) => {
            val diff = x.cast("double") - y
            diff * diff
          }),
          lit(0.0), (acc, v) => acc + v)
        struct(d.as("d"), lit(i).as("list"))
      }: _*)), s => s.getField("list")), 1, nProbe))
      .select(col("qv"), explode(col("lists")).as("list"))
    bucketed.join(broadcast(qLists), Seq("list"))
      .withColumn("cos", cosine(col(vecCol), col("qv")))
      .select(col(idCol), col("cos"))
      .orderBy(col("cos").desc, col(idCol))
      .limit(k)
  }

  /** Embedding-cosine near-duplicate pairs: LSH-bucketed self-join (equi on
    * bucket) + exact cosine filter — the scale path for vector dedup. */
  def cosineNearDupPairs(em: DataFrame, idCol: String, vecCol: String,
                         threshold: Double, nPlanes: Int, dim: Int,
                         seed: Long = 42L): DataFrame = {
    val ps = planes(nPlanes, dim, seed)
    val b = em.select(col(idCol), col(vecCol))
      .withColumn("bucket", lshBucket(col(vecCol), ps))
    val a = b.select(col("bucket"), col(idCol).as("a_id"), col(vecCol).as("va"))
    val c = b.select(col("bucket"), col(idCol).as("b_id"), col(vecCol).as("vb"))
    a.join(c, Seq("bucket"))
      .filter(col("a_id") < col("b_id"))
      .withColumn("cos", cosine(col("va"), col("vb")))
      .filter(col("cos") >= threshold)
      .select("a_id", "b_id", "cos")
  }
}
