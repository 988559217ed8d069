package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`).
  *
  * Two paths:
  *  - [[bruteForcePairs]] / [[bruteForceTopK]]: exact cosine, O(n²)
  *    cross join — the correctness baseline, bounded corpora only.
  *  - [[lshBucketTopK]]: random-hyperplane LSH — sign-bit signature
  *    buckets the vectors, the quadratic step runs within buckets only.
  *    This is the 100 TB path: signature derivation is a scan
  *    projection; one shuffle on the bucket key.
  *
  * All arithmetic is promoted to double before accumulation
  * (float32 -> float64 is exact) and folds left-to-right, so results
  * are bit-deterministic.
  */
object Similarity {

  private def asDouble(v: Column): Column = transform(v, _.cast("double"))

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(asDouble(a), asDouble(b), (x, y) => x * y),
      lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** All pairs (idA < idB) with cosine similarity. */
  def bruteForcePairs(df: DataFrame, idCol: String, vecCol: String): DataFrame =
    df.select(col(idCol).as("id_a"), col(vecCol).as("va")).crossJoin(
        df.select(col(idCol).as("id_b"), col(vecCol).as("vb")))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        cosine(col("va"), col("vb")).as("cos"))

  /** Global top-k most-similar pairs (ties broken on ids). */
  def bruteForceTopK(df: DataFrame, idCol: String, vecCol: String,
                     k: Int): DataFrame =
    bruteForcePairs(df, idCol, vecCol)
      .orderBy(desc("cos"), asc("id_a"), asc("id_b"))
      .limit(k)

  /** Deterministic pseudo-random hyperplane component in [-1, 1) for
    * (plane, dim) — xxhash64-derived, stable across runs/executors. */
  private def planeComponent(plane: Int, d: Column): Column =
    (pmod(xxhash64(lit(plane), d), lit(2000003L)).cast("double") /
      lit(1000001.5)) - 1.0

  /** Sign-bit LSH signature over a materialized double-array column. */
  def lshSignatureFromDoubles(v: Column, numPlanes: Int): Column = {
    val bits = (0 until numPlanes).map { p =>
      val proj = aggregate(
        zip_with(v, sequence(lit(1), size(v)),
          (x, i) => x * planeComponent(p, i)),
        lit(0.0), (acc, x) => acc + x)
      when(proj > 0, lit(1L << p)).otherwise(lit(0L))
    }
    bits.reduce((a, b) => a + b)
  }

  /** Sign-bit LSH signature with `numPlanes` hyperplanes. */
  def lshSignature(vecCol: Column, numPlanes: Int): Column =
    lshSignatureFromDoubles(asDouble(vecCol), numPlanes)

  /** IVF (inverted-file) ANN: a k-means coarse quantizer partitions the
    * corpus into `nlist` cells; each query probes its `nprobe` nearest
    * cells and ranks candidates by exact cosine. The 100 TB shape:
    * training samples the corpus (driver-side, nlist centroids only),
    * assignment is a scan projection against broadcast centroids, and
    * the candidate join shuffles on the cell id.
    *
    * Deterministic: fixed seed, fixed init, deterministic input order
    * from the id sort. */
  def ivfTopK(df: DataFrame, idCol: String, vecCol: String, k: Int,
              nlist: Int = 16, nprobe: Int = 2,
              trainSampleLimit: Int = 10000): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    import org.apache.spark.ml.linalg.Vector
    import org.apache.spark.sql.expressions.Window

    val spark = df.sparkSession
    val base = df.select(col(idCol).as("id"), col(vecCol).as("v"),
      array_to_vector(transform(col(vecCol), _.cast("double"))).as("fv"))

    val model = new KMeans().setK(nlist).setSeed(42L)
      .setFeaturesCol("fv").setPredictionCol("cell")
      .fit(base.orderBy("id").limit(trainSampleLimit))

    import spark.implicits._
    val centDf = model.clusterCenters.zipWithIndex.toSeq
      .map { case (c, i) => (i, c.toArray.toSeq) }
      .toDF("cell", "centroid")

    val assigned = model.transform(base).select("id", "v", "cell")

    // nprobe nearest centroids per vector (broadcast nlist rows)
    val probes = base.crossJoin(broadcast(centDf))
      .withColumn("dist",
        aggregate(zip_with(asDouble(col("v")), col("centroid"),
          (x, y) => (x - y) * (x - y)), lit(0.0), (a, x) => a + x))
      .withColumn("probe_rank", row_number().over(
        Window.partitionBy("id").orderBy(asc("dist"), asc("cell"))))
      .filter(col("probe_rank") <= nprobe)
      .select(col("id").as("query_id"), col("v").as("qv"), col("cell"))

    val pairs = probes.join(assigned, Seq("cell"))
      .filter(col("query_id") =!= col("id"))
      .select(col("query_id"), col("id").as("neighbor_id"),
        cosine(col("qv"), col("v")).as("cos"))
      // a neighbor can appear via multiple probed cells only if
      // assignment were ambiguous — cells are disjoint, so no dedup
    val w = Window.partitionBy("query_id")
      .orderBy(desc("cos"), asc("neighbor_id"))
    pairs.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** Approximate per-query top-k: candidates share the LSH bucket,
    * ranked by exact cosine within it. Recall grows with fewer planes
    * (bigger buckets); specs measure it against brute force. */
  /** All same-bucket pairs with exact cosine — the shared candidate
    * generator for LSH top-k and cosine near-dup dedup. */
  def lshBucketPairs(df: DataFrame, idCol: String, vecCol: String,
                     numPlanes: Int = 8): DataFrame = {
    // materialize the double-cast vector once; the per-plane projections
    // each scan it (don't inline the cast numPlanes times)
    val sig = df.select(col(idCol).as("id"), col(vecCol).as("v"),
        asDouble(col(vecCol)).as("__vd"))
      .select(col("id"), col("v"),
        lshSignatureFromDoubles(col("__vd"), numPlanes).as("bucket"))
    sig.as("a").join(sig.as("b"),
        col("a.bucket") === col("b.bucket") && col("a.id") =!= col("b.id"))
      .select(col("a.id").as("query_id"), col("b.id").as("neighbor_id"),
        cosine(col("a.v"), col("b.v")).as("cos"))
  }

  def lshBucketTopK(df: DataFrame, idCol: String, vecCol: String,
                    k: Int, numPlanes: Int = 8): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("query_id")
      .orderBy(desc("cos"), asc("neighbor_id"))
    lshBucketPairs(df, idCol, vecCol, numPlanes)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }
}
