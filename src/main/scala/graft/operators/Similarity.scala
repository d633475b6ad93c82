package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (ArrayType(FloatType)) —
  * BASELINE.json north-star surface.
  *
  * Two paths:
  *  - brute-force top-k: corpus × queries with the query side broadcast
  *    — exact baseline; linear in corpus size, parallel over corpus
  *    partitions, so it scales as long as the query set is small.
  *  - LSH (random hyperplane) bucketing: signature equality prunes the
  *    candidate space; approximate, constant-factor cheaper; the
  *    100 TB path for large query sets.
  *
  * The kernels are pure Catalyst higher-order functions (zip_with +
  * aggregate) — per-row, codegen-friendly, no UDF.
  */
object Similarity {

  /** dot product of two float-array columns, accumulated in double
    * left-to-right (deterministic). Backed by the codegen'd
    * graft.functions.FloatVecDot expression — the composable
    * zip_with + aggregate formulation is interpreted per element and
    * measured ~100× slower (see FloatVecDot scaladoc).
    */
  def dot(a: Column, b: Column): Column =
    graft.functions.VectorFunctions.vec_dot(a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column =
    graft.functions.VectorFunctions.vec_cosine(a, b)

  /** Exact top-k cosine neighbors for each query vector.
    * queries: (query_id, query_vec); corpus: (vec_id, embedding).
    * The query side is broadcast — the corpus never shuffles.
    */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    val q = broadcast(queries.select(col("query_id"), col("query_vec")))
    val scored = corpus.select(col("vec_id"), col("embedding"))
      .crossJoin(q)
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("cosine", round(cosine(col("embedding"), col("query_vec")), 6))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("vec_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("vec_id"), col("cosine"))
  }

  /** Deterministic random hyperplanes: nBits × dim doubles from a fixed
    * seed, embedded as a literal — identical on every executor.
    */
  def hyperplanes(nBits: Int, dim: Int, seed: Long = 42L): Array[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(nBits, dim)(rnd.nextGaussian())
  }

  /** LSH signature: one bit per hyperplane = sign(dot(v, plane)). */
  def lshSignature(v: Column, planes: Array[Array[Double]]): Column = {
    val bits: Seq[Column] = planes.zipWithIndex.map { case (p, i) =>
      val planeLit = array(p.map(lit): _*)
      when(dot(v, planeLit) >= 0, shiftleft(lit(1L), i)).otherwise(lit(0L))
    }
    bits.reduce((a, b) => a.bitwiseOR(b))
  }

  /** Approximate top-k: candidates = corpus rows whose signature equals
    * the query signature (single-probe); rank candidates by exact
    * cosine. Bucket equality is a shuffle-join key, so the pair space
    * never materializes. May return < k rows per query (approximate).
    */
  def lshTopK(queries: DataFrame, corpus: DataFrame, k: Int,
              nBits: Int = 12, dim: Int = 64): DataFrame = {
    val planes = hyperplanes(nBits, dim)
    val qs = queries.select(col("query_id"), col("query_vec"),
      lshSignature(col("query_vec"), planes).as("sig"))
    val cs = corpus.select(col("vec_id"), col("embedding"),
      lshSignature(col("embedding"), planes).as("sig"))
    val scored = cs.join(broadcast(qs), Seq("sig"))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("cosine", round(cosine(col("embedding"), col("query_vec")), 6))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("vec_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("vec_id"), col("cosine"))
  }

  /** IVF-style coarse quantization: assign every vector to its nearest
    * of `nCentroids` deterministic seed centroids (sampled corpus rows),
    * then search only the query's centroid cell. One broadcast of the
    * centroid table; corpus scan assigns cells map-only.
    */
  def ivfTopK(queries: DataFrame, corpus: DataFrame, k: Int,
              nCentroids: Int = 8): DataFrame = {
    // deterministic centroids: lowest vec_ids (stand-in for k-means at
    // scale; the assignment/search machinery is identical)
    val centroids = corpus.orderBy(col("vec_id").asc).limit(nCentroids)
      .select(col("vec_id").as("centroid_id"), col("embedding").as("centroid_vec"))

    def assign(df: DataFrame, vec: String): DataFrame = {
      val scored = df.crossJoin(broadcast(centroids))
        .withColumn("cdist", cosine(col(vec), col("centroid_vec")))
      val w = Window.partitionBy(df.columns.map(col): _*)
        .orderBy(col("cdist").desc, col("centroid_id").asc)
      scored.withColumn("crank", row_number().over(w))
        .filter(col("crank") === 1)
        .drop("cdist", "crank", "centroid_vec")
    }

    val qs = assign(queries.select(col("query_id"), col("query_vec")), "query_vec")
    val cs = assign(corpus.select(col("vec_id"), col("embedding")), "embedding")
    val scored = cs.join(broadcast(qs), Seq("centroid_id"))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("cosine", round(cosine(col("embedding"), col("query_vec")), 6))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("vec_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("vec_id"), col("cosine"))
  }
}
