package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level text/hashing primitives for the LLM-pipeline operators
  * (dedup, fingerprinting, language/quality analysis).
  *
  * Cross-engine determinism contract: every primitive here is defined in
  * arithmetic both Spark and DuckDB reproduce bit-for-bit — md5 for hashing
  * (never engine-specific hash()/xxhash64), lexicographic min over hex
  * strings for MinHash, integer shift/mask for SimHash bits, exact integer
  * modular arithmetic for rolling fingerprints. That makes each operator
  * testable against the DuckDB oracle; at cluster scale the same expressions
  * are codegen'd by Catalyst (all built-ins, no UDFs).
  */
object TextFunctions {

  /** Whitespace tokenize (corpus is single-space separated). */
  def tokens(text: Column): Column = split(text, " ")

  /** n-word shingles: ["a b c", "b c d", ...]; empty array when the doc is
    * shorter than n tokens (guards Spark's descending `sequence`).
    */
  def shingles(toks: Column, n: Int): Column =
    when(size(toks) >= n,
      transform(sequence(lit(1), size(toks) - (n - 1)),
        i => array_join(slice(toks, i, lit(n)), " ")))
      .otherwise(array().cast("array<string>"))

  /** 60-bit token hash: first 15 hex chars of md5 as a long. DuckDB twin:
    * `('0x' || substr(md5(t),1,15))::BIGINT`.
    */
  def tokenHash(t: Column): Column =
    conv(substring(md5(t), 1, 15), 16, 10).cast("long")

  /** MinHash signature: k independent hash families h_i(s) = md5("i:" ++ s);
    * the signature component is the lexicographic min hex digest — uniform
    * over shingle sets and identical across engines.
    */
  def minhashSignature(shinglesCol: Column, k: Int): Column =
    array((0 until k).map { s =>
      array_min(transform(shinglesCol, x => md5(concat(lit(s"$s:"), x))))
    }: _*)

  /** LSH band hashes: md5 over each `rows`-wide signature slice. Equal band
    * hash ⇒ candidate pair. bands*rows must equal the signature length.
    */
  def bandHashes(sig: Column, bands: Int, rows: Int): Column =
    array((0 until bands).map { b =>
      md5(array_join(slice(sig, b * rows + 1, rows), "|"))
    }: _*)

  /** Exact Jaccard over two (distinct-element) arrays. */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b))
    inter.cast("double") / (size(a) + size(b) - inter).cast("double")
  }

  /** SimHash fingerprint as a bit string: bit j is the sign of the sum over
    * tokens of (bit j of tokenHash)*2-1 (frequency-weighted, classic
    * SimHash). `hashesCol` must be `transform(tokens, tokenHash)` — computed
    * once per row, not per bit. Near-dup docs differ in few bits (Hamming).
    */
  def simhashBits(hashesCol: Column, bits: Int = 60): Column = {
    // expr: shiftright's shift amount must be a column (the lambda var j),
    // which the Scala functions API doesn't expose
    val h = hashesCol
    array_join(
      transform(sequence(lit(0), lit(bits - 1)), j =>
        when(aggregate(h, lit(0L),
          (acc, th) => acc + ((shiftRightCol(th, j) % 2) * 2 - 1)) > 0,
          lit("1")).otherwise(lit("0"))),
      "")
  }

  private def shiftRightCol(v: Column, amount: Column): Column =
    // integer shiftright with a column shift amount; DuckDB twin `(v >> j)`
    call_function("shiftright", v, amount)

  /** Polynomial rolling-hash document fingerprint over token hashes:
    * acc = (acc*31 + h) mod (2^31-1). Order-sensitive (unlike MinHash) —
    * reorderings change it; exact-content check cheaper than full md5 compare
    * at scale. DuckDB twin: list_reduce([0]||hashes, (acc,h)->...).
    */
  def rollingFingerprint(hashesCol: Column): Column =
    aggregate(hashesCol, lit(0L), (acc, h) => (acc * 31 + h) % 2147483647L)

  /** Stopword frequency (token occurrences, not distinct). */
  def stopwordHits(toks: Column, stopwords: Seq[String]): Column =
    size(filter(toks, t => t.isInCollection(stopwords)))

  // Minimal per-language stopword lists for the n-gram/stopword language-ID
  // heuristic. Ordered priority en > fr > de > es on ties.
  val EnStop = Seq("the", "a", "of", "and", "to", "in", "is", "it")
  val FrStop = Seq("le", "la", "et", "les", "des", "un", "une", "du")
  val DeStop = Seq("der", "die", "und", "das", "ein", "nicht", "mit", "ist")
  val EsStop = Seq("el", "la", "de", "que", "y", "los", "un", "una")
}
