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
}
