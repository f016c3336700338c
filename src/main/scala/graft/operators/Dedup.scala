package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._

/** Deduplication operators for LLM training-data pipelines, over the
  * `documents` table (doc_id, text, lang, source, n_chars).
  *
  * Scale design (100 TB):
  *  - exact dedup = hash-groupBy — one shuffle on a 128-bit digest, uniform
  *    by construction (no skew);
  *  - MinHash+LSH = shingle→signature (narrow, codegen'd) → band-explode →
  *    self-join on (band, hash) — the join keys are hash-uniform and the
  *    candidate set is tiny relative to n², which is the whole point vs the
  *    brute-force O(n²) twin kept here as the oracle baseline;
  *  - the brute-force variant blocks on `lang` to bound the quadratic term —
  *    at scale the block key would be (lang, length-bucket).
  */
object Dedup {

  /** Exact-duplicate groups: md5(text) → (n_docs, keeper = min doc_id).
    * Keeping min-id is the usual deterministic survivor rule.
    */
  def exactDuplicateGroups(docs: DataFrame): DataFrame =
    docs.groupBy(md5(col("text")).as("text_hash"))
      .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("keeper_id"))
      .orderBy(col("text_hash"))

  /** Exact dedup survivors — one doc_id per distinct text. */
  def dedupKeepFirst(docs: DataFrame): DataFrame =
    docs.groupBy(col("text"))
      .agg(min(col("doc_id")).as("doc_id"))
      .select(col("doc_id"))
      .orderBy(col("doc_id"))

  /** MinHash + LSH near-dup pairs, verified with exact Jaccard.
    *
    * shingle(3-gram) → k-component MinHash → `bands` band hashes →
    * self-join on (band_idx, band_hash) → distinct candidate pairs →
    * exact-Jaccard filter ≥ threshold. With k=12, bands=4, rows=3 a pair at
    * Jaccard 0.6 collides in ≥1 band with p ≈ 1-(1-0.6³)⁴ ≈ 0.65; at 0.8,
    * ≈ 0.95 — the corpus's planted dups sit at ≥0.8 (bimodal vs ≈0.01
    * background). The EXACT candidate set (not just the verified output) is
    * deterministic, so the DuckDB oracle reproduces it including its false
    * negatives.
    */
  def minhashLshPairs(
      docs: DataFrame, k: Int = 12, bands: Int = 4, rows: Int = 3,
      threshold: Double = 0.6): DataFrame = {
    require(bands * rows == k, "bands*rows must equal signature length")
    val base = docs.select(
      col("doc_id"),
      array_distinct(shingles(tokens(col("text")), 3)).as("sh"))
      .withColumn("sig", minhashSignature(col("sh"), k))
    val banded = base.select(
      col("doc_id"), posexplode(bandHashes(col("sig"), bands, rows)))
      .toDF("doc_id", "band", "bh")
    val candidates = banded.as("x")
      .join(banded.as("y"),
        col("x.band") === col("y.band") && col("x.bh") === col("y.bh") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("i"), col("y.doc_id").as("j"))
      .distinct()
    val shA = base.select(col("doc_id").as("i"), col("sh").as("sh_i"))
    val shB = base.select(col("doc_id").as("j"), col("sh").as("sh_j"))
    candidates.join(shA, "i").join(shB, "j")
      .withColumn("jac", round(jaccard(col("sh_i"), col("sh_j")), 6))
      .filter(col("jac") >= threshold)
      .select(col("i"), col("j"), col("jac"))
      .orderBy(col("i"), col("j"))
  }

  /** Brute-force n-gram Jaccard near-dup pairs, blocked by `lang` — the
    * exact-recall baseline the LSH variant trades against.
    */
  def ngramJaccardPairs(docs: DataFrame, threshold: Double = 0.6): DataFrame = {
    val base = docs.select(
      col("doc_id"), col("lang"),
      array_distinct(shingles(tokens(col("text")), 3)).as("sh"))
    base.as("a").join(base.as("b"),
        col("a.lang") === col("b.lang") && col("a.doc_id") < col("b.doc_id"))
      .withColumn("jac", round(jaccard(col("a.sh"), col("b.sh")), 6))
      .filter(col("jac") >= threshold)
      .select(col("a.doc_id").as("i"), col("b.doc_id").as("j"), col("jac"))
      .orderBy(col("i"), col("j"))
  }

  /** SimHash fingerprints (60-bit, as a bit string): Hamming-near rows are
    * near-dups. Pair extraction at scale: band the bit string into 4 chunks
    * and join on chunk equality (Hamming ≤ 3 ⇒ ≥1 identical chunk).
    */
  def simhashFingerprints(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      simhashBits(transform(tokens(col("text")), tokenHash _), 60).as("simhash"))
      .orderBy(col("doc_id"))

  /** Embedding-cosine near-dup pairs (brute force; the ANN path for scale is
    * SimilaritySearch.lshTopK). Cosine is computed in double, sequentially,
    * index-ascending — bit-identical to the oracle's list_sum.
    */
  def embeddingNearDupPairs(embeddings: DataFrame, threshold: Double = 0.45): DataFrame = {
    val base = embeddings.select(col("vec_id"), col("embedding"))
    base.as("a").join(base.as("b"), col("a.vec_id") < col("b.vec_id"))
      .withColumn("cos",
        round(SimilaritySearch.cosine(col("a.embedding"), col("b.embedding")), 6))
      .filter(col("cos") >= threshold)
      .select(col("a.vec_id").as("i"), col("b.vec_id").as("j"), col("cos"))
      .orderBy(col("i"), col("j"))
  }
}
