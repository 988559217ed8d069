package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for a training-data pipeline: exact,
  * MinHash+LSH, SimHash, and n-gram Jaccard. All are shuffle-based
  * bucket joins — no driver-side loops, no n² at corpus scale; the
  * quadratic step only ever runs within a candidate bucket.
  *
  * Scale shape (100 TB): shingle/signature derivation is a scan
  * projection; the only shuffles are the groupBy on bucket keys and the
  * candidate-pair verification join, both on keys whose cardinality the
  * band/row parameters control.
  */
object Dedup {

  /** Exact dedup: keep the smallest id per identical key. */
  def exact(df: DataFrame, idCol: String, keyCol: Column): DataFrame =
    df.groupBy(keyCol.as("dedup_key"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("copies"))

  /** Word k-shingles (distinct) of a text column. */
  def shingles(text: Column, k: Int = 3): Column = {
    val toks = TextAnalysis.tokenize(text)
    array_distinct(
      when(size(toks) >= k,
        transform(sequence(lit(1), size(toks) - (k - 1)), i =>
          concat_ws(" ", (0 until k).map(j => element_at(toks, i + j)): _*)))
        .otherwise(array(concat_ws(" ", toks))))
  }

  /** MinHash signature: for each of `numHashes` seeded xxhash64 families,
    * the min hash over the shingle set. Pure column expressions. */
  def minhashSignature(shingleCol: Column, numHashes: Int): Column =
    array((0 until numHashes).map { i =>
      array_min(transform(shingleCol, s => xxhash64(lit(i), s)))
    }: _*)

  /** MinHash-LSH candidate pairs: band the signature, bucket-join on
    * (band index, band hash), emit distinct (a, b) id pairs with a < b.
    *
    * bands * rowsPerBand must equal numHashes. */
  /** (id, sig) signatures. The shingle array is materialized ONCE via a
    * projection before the per-hash-family min scans — passing the
    * shingle expression straight into [[minhashSignature]] would
    * re-shingle the text numHashes times. */
  def minhashSignatures(df: DataFrame, idCol: String, text: Column,
                        numHashes: Int, shingleK: Int): DataFrame =
    df.select(col(idCol).as("id"), shingles(text, shingleK).as("__sh"))
      .select(col("id"), minhashSignature(col("__sh"), numHashes).as("sig"))

  def minhashCandidates(df: DataFrame, idCol: String, text: Column,
                        numHashes: Int = 16, bands: Int = 4,
                        shingleK: Int = 3): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val rows = numHashes / bands
    val sig = minhashSignatures(df, idCol, text, numHashes, shingleK)
    val banded = sig.select(col("id"), posexplode(
      transform(sequence(lit(0), lit(bands - 1)), b =>
        xxhash64(slice(col("sig"), b * rows + 1, lit(rows))))))
      .toDF("id", "band", "band_hash")
    // est_jaccard = fraction of agreeing bands, computed from the
    // band-collision COUNT per pair — the join ships only (id, band,
    // hash) rows, never the signatures, and the estimate falls out of
    // the same groupBy that dedups the pairs. For r=1 this equals the
    // signature-agreement fraction; for r>1 it is a (valid, stricter)
    // underestimate.
    banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") &&
        col("a.band_hash") === col("b.band_hash") &&
        col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .agg((count(lit(1)).cast("double") / bands).as("est_jaccard"))
  }

  /** Exact Jaccard similarity of two shingle-set columns. */
  def jaccard(a: Column, b: Column): Column =
    when(size(array_union(a, b)) === 0, 0.0)
      .otherwise(size(array_intersect(a, b)).cast("double") /
        size(array_union(a, b)))

  /** MinHash-LSH near-dup pairs verified by true Jaccard >= threshold. */
  /** MinHash-LSH near-dup pairs verified by true Jaccard >= threshold.
    * Candidates whose signature-estimated Jaccard is far below the
    * threshold are pruned before the exact (array-intersect) check —
    * at corpus scale the estimate prunes the bulk of band collisions
    * for the cost of one zip over the signatures. */
  def minhashNearDups(df: DataFrame, idCol: String, text: Column,
                      threshold: Double, numHashes: Int = 16,
                      bands: Int = 4, shingleK: Int = 3): DataFrame = {
    val withShingles = df.select(col(idCol).as("id"),
      shingles(text, shingleK).as("sh"))
    // prune bar: at least 2 agreeing components (1 is just the band
    // collision itself under r=1 banding) and within 2x of the target —
    // costs some recall exactly at the threshold, prunes the bulk of
    // band-collision noise before the exact array intersect
    minhashCandidates(df, idCol, text, numHashes, bands, shingleK)
      .filter(col("est_jaccard") >=
        math.max(threshold / 2, 2.0 / numHashes))
      .join(withShingles.withColumnRenamed("id", "id_a")
        .withColumnRenamed("sh", "sh_a"), "id_a")
      .join(withShingles.withColumnRenamed("id", "id_b")
        .withColumnRenamed("sh", "sh_b"), "id_b")
      .withColumn("jaccard", jaccard(col("sh_a"), col("sh_b")))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  /** 64-bit SimHash (per-bit majority vote) over a MATERIALIZED token
    * hash array column — the 64 per-bit aggregates each scan the array,
    * so the tokenize+hash work must not be inlined into them. */
  def simhashFromHashes(hashes: Column): Column = {
    val bits = (0 until 64).map { i =>
      val votes = aggregate(hashes, lit(0L),
        (acc, h) => acc + shiftright(h, i).bitwiseAND(1) * 2 - 1)
      when(votes > 0, lit(1L << i)).otherwise(lit(0L))
    }
    bits.reduce((a, b) => a + b)
  }

  /** (id, sig) simhash signatures via explode + 64 bit-vote sums.
    * One tokenize pass, one shuffle with map-side partial aggregation —
    * robust against projection collapse re-inlining the token hashing
    * into each of the 64 per-bit scans. Docs with zero tokens produce
    * no row (tokenize of non-empty text always yields >= 1 token). */
  def simhashSignatures(df: DataFrame, idCol: String,
                        text: Column): DataFrame = {
    val exploded = df
      .select(col(idCol).as("id"),
        explode(TextAnalysis.tokenize(text)).as("t"))
      .select(col("id"), xxhash64(col("t")).as("h"))
    val votes = (0 until 64).map(i =>
      sum(shiftright(col("h"), i).bitwiseAND(1) * 2 - 1).as(s"v$i"))
    val sig = (0 until 64).map(i =>
      when(col(s"v$i") > 0, lit(1L << i)).otherwise(lit(0L)))
      .reduce((a, b) => a + b)
    exploded.groupBy("id").agg(votes.head, votes.tail: _*)
      .select(col("id"), sig.as("sig"))
  }

  /** Convenience single-column form (re-derives hashes; prefer
    * [[simhashSignatures]] in bulk paths). */
  def simhash(text: Column): Column =
    simhashFromHashes(transform(TextAnalysis.tokenize(text),
      t => xxhash64(t)))

  /** SimHash near-dup pairs with Hamming distance <= maxDist, found via
    * (maxDist+1)-block banding then exact bit_count verification. The
    * 64 bits split into maxDist+1 near-equal blocks, so by pigeonhole
    * any pair within maxDist differing bits shares at least one
    * identical block — full recall at the requested distance. Larger
    * maxDist means narrower blocks and more candidate collisions; keep
    * maxDist small (<= ~10) at corpus scale. */
  def simhashNearDups(df: DataFrame, idCol: String, text: Column,
                      maxDist: Int = 3): DataFrame = {
    require(maxDist >= 0 && maxDist < 32,
      s"maxDist must be in [0, 32), got $maxDist")
    val nb = maxDist + 1
    val bounds = (0 to nb).map(b => b * 64 / nb)
    val sigs = simhashSignatures(df, idCol, text)
    val blocks = sigs.select(col("id"), col("sig"), posexplode(
      array((0 until nb).map { b =>
        val width = bounds(b + 1) - bounds(b)
        shiftrightunsigned(col("sig"), bounds(b))
          .bitwiseAND((1L << width) - 1)
      }: _*)))
      .toDF("id", "sig", "block", "block_val")
    blocks.as("a").join(blocks.as("b"),
        col("a.block") === col("b.block") &&
        col("a.block_val") === col("b.block_val") &&
        col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        bit_count(col("a.sig").bitwiseXOR(col("b.sig"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxDist)
  }

  /** Embedding-cosine near-dup: pairs above `threshold` found via LSH
    * hyperplane buckets (the scale path — no global n²), plus the
    * keep/drop decision: the smaller id of each near-dup pair is kept,
    * any id that appears as the larger side of some pair is dropped.
    * Returns (id_a, id_b, cos) pairs; [[embeddingDropIds]] derives the
    * drop set. */
  def embeddingNearDups(df: DataFrame, idCol: String, vecCol: String,
                        threshold: Double, numPlanes: Int = 4,
                        tables: Int = 6, dims: Int = 64): DataFrame =
    Similarity.lshBucketPairs(df, idCol, vecCol, numPlanes, tables, dims)
      .filter(col("cos") >= threshold)
      .filter(col("query_id") < col("neighbor_id"))
      .select(col("query_id").as("id_a"), col("neighbor_id").as("id_b"),
        col("cos"))

  /** Ids to remove so that no kept pair exceeds the threshold
    * (greedy keep-smallest-id policy). */
  def embeddingDropIds(nearDups: DataFrame): DataFrame =
    nearDups.select(col("id_b").as("drop_id")).distinct()

  /** Pairwise n-gram Jaccard over a (bounded) candidate set — the
    * brute-force verifier used by specs and small corpora. */
  def ngramJaccardPairs(df: DataFrame, idCol: String, text: Column,
                        k: Int = 3): DataFrame = {
    val sh = df.select(col(idCol).as("id"), shingles(text, k).as("sh"))
    sh.as("a").join(sh.as("b"), col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        jaccard(col("a.sh"), col("b.sh")).as("jaccard"))
  }
}
