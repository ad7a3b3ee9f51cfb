package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`embeddings.embedding`,
  * ARRAY<FLOAT>).
  *
  * Baseline: brute-force cosine top-k — a single narrow map + TakeOrdered
  * (no shuffle of the vectors; only k rows reach the driver). Scale path:
  * sign-random-projection LSH bucketing so candidate generation touches
  * only same-bucket vectors, plus an IVF-style coarse quantizer.
  *
  * All vector math is higher-order array expressions (`zip_with` +
  * `aggregate`) over doubles — in-order folds, so the DuckDB oracle's
  * sequential sums match bit-for-bit before rounding.
  */
object Similarity {

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column =
    sqrt(aggregate(a, lit(0.0),
      (acc, v) => acc + v.cast("double") * v.cast("double")))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Brute-force cosine top-k against one query vector (given as a
    * same-typed array column, e.g. from a 1-row broadcast join).
    * Plan shape: scan → project(sim) → TakeOrderedAndProject(k) — the
    * full 100 TB of vectors stream through map tasks; only k survive.
    */
  def bruteForceTopK(emb: DataFrame, id: Column, vec: Column,
                     query: Column, k: Int): DataFrame =
    emb.select(id.as("vec_id"), cosine(vec, query).as("sim"))
      .orderBy(col("sim").desc, col("vec_id"))
      .limit(k)

  /** Sign-random-projection LSH bucket id (`nBits`-bit). Hyperplanes are
    * deterministic pseudo-random unit-free vectors derived from a seeded
    * xorshift — same bucket ⇒ likely-high cosine. Bucket join replaces
    * the all-pairs compare at scale.
    */
  def srpBucket(vec: Column, dim: Int, nBits: Int, seed: Long = 42L): Column = {
    val planes: Seq[Array[Double]] = (0 until nBits).map { b =>
      Array.tabulate(dim) { i =>
        // splitmix64-ish deterministic pseudo-random in [-1, 1)
        var z = seed + (b.toLong * dim + i) * 0x9E3779B97F4A7C15L
        z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
        z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
        z = z ^ (z >>> 31)
        (z.toDouble / Long.MaxValue.toDouble)
      }
    }
    val bits = planes.zipWithIndex.map { case (plane, b) =>
      val planeCol = array(plane.map(lit): _*)
      val proj = dot(vec, planeCol)
      when(proj > 0, lit(1 << b)).otherwise(lit(0))
    }
    bits.reduce(_ + _)
  }

  /** LSH-bucketed ANN: query joins only its own bucket; a multi-probe
    * variant would also join neighboring buckets (Hamming-1) for recall.
    */
  def lshTopK(emb: DataFrame, id: Column, vec: Column, query: Column,
              dim: Int, nBits: Int, k: Int): DataFrame = {
    val bucketed = emb.select(id.as("vec_id"), vec.as("v"),
      srpBucket(vec, dim, nBits).as("bucket"))
    val qBucket = srpBucket(query, dim, nBits)
    bucketed.filter(col("bucket") === qBucket)
      .select(col("vec_id"), cosine(col("v"), query).as("sim"))
      .orderBy(col("sim").desc, col("vec_id"))
      .limit(k)
  }

  /** IVF-style coarse quantizer: assign each vector to the nearest of
    * `centroids` (k-means-style cells); ANN then probes only the top
    * cells. Centroids arrive as a small Seq (broadcast as literals).
    */
  def ivfAssign(vec: Column, centroids: Seq[Array[Double]]): Column = {
    val scored = centroids.zipWithIndex.map { case (c, i) =>
      val cCol = array(c.map(lit): _*)
      struct((dot(vec, cCol) * -1).as("negdot"), lit(i).as("cell"))
    }
    least(scored: _*).getField("cell")
  }
}
