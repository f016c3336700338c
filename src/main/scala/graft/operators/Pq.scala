package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import SimilaritySearch.{dotKernel, l2NormKernel, round6, safeCos}

/** Product-quantization (PQ) ANN — the memory-bound billion-scale index
  * structure (Jégou, Douze, Schmid, "Product Quantization for Nearest
  * Neighbor Search", TPAMI 2011): split the `dim`-dimensional embedding
  * into `m` contiguous subspaces, fit an independent small codebook per
  * subspace (Lloyd k-means on the subvectors), and store each corpus
  * vector as its `m` nearest-code ordinals — `m` small ints instead of
  * `dim` floats (64-dim float32 → 8 codes = 32× compression). Queries stay
  * RAW and score against reconstructions (asymmetric distance computation,
  * the accurate variant): per query, one tiny lookup table of per-subspace
  * dot products against every code; a corpus row's approximate cosine then
  * costs `m` table lookups + integer adds, not `dim` multiplies.
  *
  * Everything is deterministic and engine-replayable (the DuckDB oracle
  * replays fit, encode, and scoring bit-for-bit):
  *  - init: the `nCodes` corpus vectors with the smallest md5(vec_id) (the
  *    [[SimilaritySearch.ivfCentroids]] draw); code ordinal = rank by
  *    ascending vec_id; subspace `s` takes the draw's s-th subvector;
  *  - assignment: argmin L2² over codes, ROUNDED to 6 dp, ties to the
  *    lowest code ordinal — partitioning-independent;
  *  - update: quantized-integer means (the [[Embeddings]] quant6
  *    arithmetic) so summation order never leaks; emptied codes drop out;
  *  - scoring: the per-sub LUT entries are 6-dp-rounded dots scaled to
  *    exact ×10⁶ longs, so the cross-subspace ADC sum is exact integer
  *    arithmetic — associativity-proof — and only the final cosine
  *    (dot / (‖q‖·‖recon‖)) rounds, once, at 6 dp.
  *
  * Scale shape (100 TB): fit is `iters` driver-coordinated jobs, each ONE
  * mapPartitions pass that pre-reduces per-partition (sub, code) → (count,
  * quantized sums) — partitions×m×nCodes tiny rows to the driver, no
  * shuffle; encode is a narrow kernel pass emitting the m-byte code
  * column (the artifact a lake persists next to — or instead of — the raw
  * vectors); scoring broadcasts an O(|queries|·m·nCodes) long table and
  * scans CODES, not vectors: memory traffic per corpus row drops from
  * dim·4 bytes to m bytes, which is the index's point — the scan is
  * bandwidth-bound at this scale. The per-query top-k is the same
  * row_number shape as [[SimilaritySearch.bruteForceTopK]]. For the
  * compute-side pruning story PQ composes with IVF (probe a cell, then
  * ADC-score its codes) — the cell routing of [[SimilaritySearch.ivfTopK]]
  * slots in front unchanged.
  */
object Pq {

  /** One subspace's codebook: surviving (code ordinal, subvector) entries,
    * ascending ordinal.
    */
  type Codebook = Array[(Int, Array[Double])]

  /** ×10⁶ exact-integer quantization of a 6-dp-rounded double — the
    * [[Embeddings]] centroid arithmetic (`CAST(round(x,6)*1000000 AS
    * BIGINT)` in the oracle).
    */
  private def quant6(x: Double): Long = Math.round(round6(x) * 1e6)

  /** 6-dp-rounded squared L2 between `c` and the slice of `e` at `off` —
    * fixed index-ascending summation, the oracle's
    * `round(list_sum(list_transform(...)), 6)` arithmetic.
    */
  private def subL2sq(e: Array[Double], off: Int, c: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < c.length) { val d = e(off + i) - c(i); s += d * d; i += 1 }
    round6(s)
  }

  /** Fixed-order dot of `c` against the slice of `e` at `off`. */
  private def subDot(e: Array[Double], off: Int, c: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < c.length) { s += e(off + i) * c(i); i += 1 }
    s
  }

  /** Index (position, not ordinal) of the nearest surviving code: argmin
    * rounded L2², first (= lowest ordinal, books stay sorted) wins ties.
    */
  private def nearestCode(e: Array[Double], off: Int, book: Codebook): Int = {
    var bestP = 0; var best = Double.PositiveInfinity
    var p = 0
    while (p < book.length) {
      val d = subL2sq(e, off, book(p)._2)
      if (d < best) { best = d; bestP = p }
      p += 1
    }
    bestP
  }

  /** Lloyd-fit the `m` per-subspace codebooks. `iters` rounds of (assign
    * every subvector to its nearest code, recompute codes as quantized
    * member means); a code that loses every member drops out, exactly as
    * [[Embeddings]] clusters do.
    */
  def fitCodebooks(
      corpus: DataFrame, m: Int = 8, nCodes: Int = 8, iters: Int = 2): Array[Codebook] =
    fitWithStats(corpus, m, nCodes, iters)._1

  /** The (vec_id, vec: array<double>) projection the fit/encode kernels
    * consume — float→double element cast is exact widening, so the arithmetic
    * matches the oracle's CAST(x AS DOUBLE) lists bit-for-bit.
    */
  private def toVecs(corpus: DataFrame): DataFrame =
    corpus.select(col("vec_id"), col("embedding").cast("array<double>").as("vec"))

  /** [[fitCodebooks]] plus the final round's exact-integer statistics —
    * (sub, code, member count, component micro-sums), the form whose mean
    * is csum / cnt / 10⁶. [[codebooksFrame]] emits the stats rather than
    * the rounded mean because a quantized-integer sum over a small member
    * count can land EXACTLY on a 6-dp half boundary, where Spark's
    * BigDecimal HALF_UP and another engine's float round may disagree —
    * integers hash identically everywhere.
    */
  private[operators] def fitWithStats(
      corpus: DataFrame, m: Int, nCodes: Int, iters: Int)
      : (Array[Codebook], Array[(Int, Int, Long, Array[Long])]) =
    fitWithStatsOn(toVecs(corpus), m, nCodes, iters)

  /** The fit core, over a (vec_id, vec: array<double>) frame — the raw
    * corpus and the IVF-residual frame ([[ivfPqTopK]]) both route here.
    * The init draw is the same replayable smallest-md5(vec_id) order as
    * [[SimilaritySearch.ivfCentroids]], evaluated against THIS frame's
    * vectors (raw or residual).
    */
  private def fitWithStatsOn(
      vecsDf: DataFrame, m: Int, nCodes: Int, iters: Int)
      : (Array[Codebook], Array[(Int, Int, Long, Array[Long])]) = {
    require(m >= 1 && nCodes >= 1 && iters >= 0, "need m, nCodes >= 1 and iters >= 0")
    val spark = vecsDf.sparkSession
    import spark.implicits._
    val draw = vecsDf
      .orderBy(md5(col("vec_id").cast("string")), col("vec_id"))
      .limit(nCodes)
      .select(col("vec_id"), col("vec")).as[(Long, Array[Double])]
      .collect().sortBy(_._1)
    val dim = draw.head._2.length
    require(dim % m == 0, s"dim $dim must divide into $m subspaces")
    val subLen = dim / m

    var books: Array[Codebook] = Array.tabulate(m) { s =>
      draw.zipWithIndex.map { case ((_, e), ordinal) =>
        (ordinal, java.util.Arrays.copyOfRange(e, s * subLen, (s + 1) * subLen))
      }
    }
    var stats = Array.empty[(Int, Int, Long, Array[Long])]
    if (iters == 0) return (books, stats)

    val vecs = Par.spread(vecsDf.select(col("vec_id"), col("vec")))
      .as[(Long, Array[Double])]
      .localCheckpoint()

    for (_ <- 1 to iters) {
      val bc = spark.sparkContext.broadcast(books)
      // one pass: assign each of the m subvectors + pre-reduce quantized
      // sums per (sub, code ordinal) — partitions×m×nCodes rows collected
      val partials = vecs.mapPartitions { it =>
        val bk = bc.value
        val sl = bk(0)(0)._2.length
        val acc = scala.collection.mutable.HashMap.empty[(Int, Int), (Long, Array[Long])]
        it.foreach { case (_, e) =>
          var s = 0
          while (s < bk.length) {
            val pos = nearestCode(e, s * sl, bk(s))
            val key = (s, bk(s)(pos)._1)
            val (n, sums) = acc.getOrElseUpdate(key, (0L, new Array[Long](sl)))
            var i = 0
            while (i < sl) { sums(i) += quant6(e(s * sl + i)); i += 1 }
            acc(key) = (n + 1, sums)
            s += 1
          }
        }
        acc.iterator.map { case ((s, c), (n, sums)) => (s, c, n, sums) }
      }.collect()
      stats = partials.groupBy(p => (p._1, p._2)).toArray
        .sortBy { case ((s, c), _) => (s, c) }
        .map { case ((s, c), parts) =>
          val n = parts.map(_._3).sum
          val sums = Array.tabulate(subLen)(i => parts.map(_._4(i)).sum)
          (s, c, n, sums)
        }
      val bySub = stats.groupBy(_._1)
      books = Array.tabulate(m) { s =>
        bySub.getOrElse(s, Array.empty).sortBy(_._2).map { case (_, code, n, sums) =>
          (code, sums.map(_.toDouble / n.toDouble / 1e6))
        }
      }
      bc.unpersist()
    }
    vecs.unpersist()
    (books, stats)
  }

  /** Encode every corpus vector as its `m` nearest-code ordinals —
    * (vec_id, codes). The narrow kernel pass whose output is the
    * compressed index a lake persists.
    */
  def encode(corpus: DataFrame, books: Array[Codebook]): DataFrame =
    encodeOn(toVecs(corpus), books)

  private def encodeOn(vecsDf: DataFrame, books: Array[Codebook]): DataFrame = {
    val spark = vecsDf.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(books)
    Par.spread(vecsDf.select(col("vec_id"), col("vec")))
      .as[(Long, Array[Double])]
      .mapPartitions { it =>
        val bk = bc.value
        val sl = bk(0)(0)._2.length
        it.map { case (id, e) =>
          (id, Array.tabulate(bk.length)(s => bk(s)(nearestCode(e, s * sl, bk(s)))._1))
        }
      }.toDF("vec_id", "codes")
  }

  /** The fitted codebooks as a query result, in the exact-integer form
    * (sub, code, component index, component micro-sum, member count) —
    * the persistable model artifact and the direct correctness check on
    * the fit (centroid component = csum / cnt / 10⁶; see [[fitWithStats]]
    * for why the stats, not the rounded mean, are what hashes exactly).
    */
  def codebooksFrame(
      corpus: DataFrame, m: Int = 8, nCodes: Int = 8, iters: Int = 2): DataFrame = {
    require(iters >= 1, "stats need at least one Lloyd round")
    val spark = corpus.sparkSession
    import spark.implicits._
    fitWithStats(corpus, m, nCodes, iters)._2.flatMap { case (s, code, n, sums) =>
      sums.zipWithIndex.map { case (cs, i) =>
        (s.toLong, code.toLong, (i + 1).toLong, cs, n)
      }
    }.toSeq.toDF("sub", "code", "i", "csum", "cnt")
      .orderBy(col("sub"), col("code"), col("i"))
  }

  /** Approximate cosine top-k under the PQ index: fit on the corpus,
    * encode the corpus, ADC-score raw queries against the code column.
    * Output shape matches every other `q_ann_*`: (query_id, neighbor_id,
    * rank, cos), rank by (cos desc, neighbor_id).
    */
  def pqTopK(
      corpus: DataFrame, queries: DataFrame,
      k: Int = 5, m: Int = 8, nCodes: Int = 8, iters: Int = 2): DataFrame =
    rankTopK(pqAdcScores(corpus, queries, m, nCodes, iters), k)

  /** The (query_id, neighbor_id, cos) ADC-scored frame behind [[pqTopK]] —
    * exposed so [[pqTopKRerank]] can shortlist from it without re-fitting.
    */
  private[operators] def pqAdcScores(
      corpus: DataFrame, queries: DataFrame,
      m: Int, nCodes: Int, iters: Int): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val books = fitCodebooks(corpus, m, nCodes, iters)
    val subLen = books(0)(0)._2.length
    // per-(sub, position) quantized reconstruction norm² — shared by all queries
    val normSq: Array[Array[Long]] =
      books.map(_.map { case (_, cv) => quant6(round6(subDot(cv, 0, cv))) })
    // per-query LUT: quantized per-sub dot against every code position
    val qLut = queries.select(col("vec_id"), col("embedding")).as[(Long, Array[Float])]
      .collect().sortBy(_._1)
      .map { case (qid, f) =>
        val q = f.map(_.toDouble)
        val lut = Array.tabulate(m) { s =>
          books(s).map { case (_, cv) => quant6(round6(subDot(q, s * subLen, cv))) }
        }
        (qid, l2NormKernel(q), lut)
      }
    val bcLut = spark.sparkContext.broadcast(qLut)
    val bcBooks = spark.sparkContext.broadcast(books)
    val bcNorm = spark.sparkContext.broadcast(normSq)

    val scored = encode(corpus, books).as[(Long, Array[Int])]
      .mapPartitions { it =>
        val qs = bcLut.value
        val bk = bcBooks.value
        val ns = bcNorm.value
        // ordinal → position per sub (ordinals may be sparse after drops)
        val posOf = bk.map(_.iterator.map(_._1).zipWithIndex.toMap)
        it.flatMap { case (nid, codes) =>
          // exact-integer ADC: Σ_s lut[s][code_s] and Σ_s ‖recon_s‖² as longs
          var nsum = 0L
          var s = 0
          val pos = new Array[Int](codes.length)
          while (s < codes.length) {
            pos(s) = posOf(s)(codes(s))
            nsum += ns(s)(pos(s))
            s += 1
          }
          val rNorm = math.sqrt(nsum.toDouble / 1e6)
          qs.iterator.filter(_._1 != nid).map { case (qid, qn, lut) =>
            var dsum = 0L
            var t = 0
            while (t < codes.length) { dsum += lut(t)(pos(t)); t += 1 }
            val denom = qn * rNorm
            val cos = if (denom == 0.0) -1.0 else round6((dsum.toDouble / 1e6) / denom)
            (qid, nid, cos)
          }
        }
      }.toDF("query_id", "neighbor_id", "cos")
    scored
  }

  /** A PQ-compressed embedding-space novelty index — the
    * [[Dedup.buildSemanticIndex]] artifact with its packed members stored
    * as residual CODES instead of raw vectors: (cell, members:
    * array<struct<id, codes: array<int>, nsq: bigint>>), members sorted by
    * id. `nsq` is each member's PRECOMPUTED reconstruction norm²
    * (‖centroid + decoded residual‖²) in exact ×10⁶ micro-units, so the
    * probe pays only the per-subspace LUT adds. `nCodesInit` is the lut
    * stride (code ordinals stay < the init draw size even after drops).
    *
    * Why: the raw index weighs corpus·(dim·4 + 8) bytes and the scaladoc
    * contract of [[Dedup.semanticNoveltyProbe]] degrades it to a sort-merge
    * join past the broadcast threshold; the PQ form weighs corpus·(m·4 +
    * 16) — 32× less raw payload at dim=64/m=8 — which keeps the SAME
    * corpus broadcastable ~an order of magnitude longer (the verdict's one
    * scale caveat, attacked from the size side instead of the join side).
    * The trade is the PQ approximation: the gate's max-cos is the ADC
    * cosine against reconstructions, not the exact cosine — the recall
    * audit (`q_ann_recall`) measures exactly that gap at every refresh.
    */
  case class PqSemanticIndex(
      centroids: Array[(Int, Array[Double], Double)],
      books: Array[Codebook],
      nCodesInit: Int,
      cells: DataFrame,
      sizeHintBytes: Long = -1L)

  def buildPqSemanticIndex(
      corpus: DataFrame, k: Int = 8, iters: Int = 2, cellCap: Int = 4096,
      m: Int = 8, nCodes: Int = 8, pqIters: Int = 2): PqSemanticIndex = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val centroids = Embeddings.fitCentroids(corpus, k, iters)
    val cMap = centroids.map { case (ci, v, _) => ci -> v }.toMap
    val bcCm = spark.sparkContext.broadcast(cMap)
    // (vec_id, cluster, cos, vec = residual vs the OWN trained centroid);
    // cos is the assignment cosine the cellCap window ranks on, exactly as
    // buildSemanticIndex does
    val res = Embeddings.assignTo(corpus, centroids)
      .as[(Long, Array[Float], Int, Double)]
      .mapPartitions { it =>
        val cm = bcCm.value
        it.map { case (id, f, ci, cos) =>
          val e = f.map(_.toDouble)
          val cv = cm(ci)
          val r = new Array[Double](e.length)
          var i = 0
          while (i < e.length) { r(i) = e(i) - cv(i); i += 1 }
          (id, ci, cos, r)
        }
      }.toDF("vec_id", "cluster", "cos", "vec")
      .localCheckpoint() // the PQ fit re-scans pqIters times, encode once more
    val (books, _) = fitWithStatsOn(res.select(col("vec_id"), col("vec")), m, nCodes, pqIters)
    val subLen = books(0)(0)._2.length
    // the ivfPqTopK ‖x̂‖² decomposition, folded into ONE per-member long at
    // build time: nsq = ‖c‖² + 2·Σ_s cross + Σ_s ‖code‖² (micro-units)
    val nq = books.map(_.map { case (_, cv) => quant6(round6(subDot(cv, 0, cv))) })
    val cross = centroids.map { case (ci, cv, _) =>
      ci -> Array.tabulate(m) { s =>
        books(s).map { case (_, bv) => quant6(round6(subDot(cv, s * subLen, bv))) }
      }
    }.toMap
    val ncSq = centroids.map { case (ci, cv, _) =>
      ci -> quant6(round6(dotKernel(cv, cv)))
    }.toMap
    val bcB = spark.sparkContext.broadcast(books)
    val bcNq = spark.sparkContext.broadcast(nq)
    val bcCx = spark.sparkContext.broadcast(cross)
    val bcNc = spark.sparkContext.broadcast(ncSq)
    val encoded = res.as[(Long, Int, Double, Array[Double])]
      .mapPartitions { it =>
        val bk = bcB.value; val ns = bcNq.value
        val cx = bcCx.value; val nc = bcNc.value
        val sl = bk(0)(0)._2.length
        it.map { case (id, ci, cos, r) =>
          var nsq = nc(ci)
          val codes = new Array[Int](bk.length)
          var s = 0
          while (s < bk.length) {
            val pos = nearestCode(r, s * sl, bk(s))
            codes(s) = bk(s)(pos)._1 // ordinal — the probe's lut index
            nsq += 2L * cx(ci)(s)(pos) + ns(s)(pos)
            s += 1
          }
          (id, ci, cos, codes, nsq)
        }
      }.toDF("vec_id", "cluster", "cos", "codes", "nsq")
    val w = Window.partitionBy(col("cluster")).orderBy(col("cos").desc, col("vec_id"))
    val cells = encoded
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= cellCap)
      .groupBy(col("cluster").as("cell"))
      .agg(sort_array(collect_list(struct(
        col("vec_id").as("id"), col("codes"), col("nsq")))).as("members"))
    // size hint: the raw projection's Catalyst stats, scaled to what the
    // packed PQ rows actually weigh per member
    val dim = centroids.head._2.length
    val rawHint = corpus.select(col("vec_id"), col("embedding"))
      .queryExecution.optimizedPlan.stats.sizeInBytes
    val hint = (rawHint * (m * 4 + 16) / (dim * 4 + 8))
      .min(BigInt(Long.MaxValue)).toLong
    PqSemanticIndex(centroids, books, nCodes, cells, hint)
  }

  /** Probe a [[PqSemanticIndex]] with a batch OR STREAM of vectors — the
    * PQ twin of [[Dedup.semanticNoveltyProbe]], same verdict schema
    * (vec_id, cell, max_cos, best_match, reason), same size-aware
    * broadcast, same append-safe stream-static shape. Each probe row
    * carries its own integer scoring state (cell, ‖q‖, quantized dot with
    * the cell centroid, and the m·nCodes LUT of quantized subvector dots
    * against every code) built in one narrow kernel pass; the packed cell
    * then scores in the fused codegen'd [[graft.plans.CellMaxAdc]] loop at
    * m integer adds per member — dim/m× less arithmetic AND 32× less
    * broadcast traffic than the full-vector probe.
    */
  /** RETIRE vectors from a [[PqSemanticIndex]] —
    * [[Dedup.retireSemanticIndex]] for the compressed layout: only cells
    * holding a doomed member explode and re-pack (codes and the
    * precomputed `nsq` are per-member, so survivors carry theirs
    * unchanged); untouched packed cells pass through byte-identical and
    * emptied cells drop. Centroids AND codebooks stay frozen — both are
    * Lloyd means (aggregates, no verbatim corpus row survives in them;
    * the md5 init draw is refined away by the build's pqIters ≥ 1
    * rounds), so the forget attestation is the cells' alone.
    */
  def retirePqSemanticIndex(
      index: PqSemanticIndex, tombstones: DataFrame): PqSemanticIndex = {
    val doomed = tombstones.select(col("vec_id"))
    val touched = index.cells
      .select(col("cell"), explode(col("members.id")).as("vec_id"))
      .join(broadcast(doomed), Seq("vec_id"), "left_semi")
      .select(col("cell")).distinct()
    val repacked = index.cells
      .join(broadcast(touched), Seq("cell"), "left_semi")
      .select(col("cell"), explode(col("members")).as("m"))
      .join(broadcast(doomed), col("m.id") === col("vec_id"), "left_anti")
      .groupBy(col("cell"))
      .agg(sort_array(collect_list(col("m"))).as("members"))
    val untouched = index.cells.join(broadcast(touched), Seq("cell"), "left_anti")
    index.copy(cells = untouched.unionByName(repacked))
  }

  def pqNoveltyProbe(
      vecs: DataFrame, index: PqSemanticIndex,
      threshold: Double = 0.45): DataFrame = {
    val spark = vecs.sparkSession
    import spark.implicits._
    graft.plans.GraftFunctions.register(spark)
    val m = index.books.length
    val stride = index.nCodesInit
    val subLen = index.books(0)(0)._2.length
    val bcC = spark.sparkContext.broadcast(index.centroids)
    val bcB = spark.sparkContext.broadcast(index.books)
    val probes = Par.spread(vecs.select(col("vec_id"), col("embedding")))
      .as[(Long, Array[Float])]
      .mapPartitions { it =>
        val cs = bcC.value; val bk = bcB.value
        it.map { case (id, f) =>
          val q = f.map(_.toDouble)
          val qn = l2NormKernel(q)
          var bestC = -1; var best = Double.NegativeInfinity
          var bestVec: Array[Double] = null
          cs.foreach { case (ci, cv, cn) =>
            val cos = safeCos(dotKernel(q, cv), qn, cn)
            if (cos > best) { best = cos; bestC = ci; bestVec = cv }
          }
          val lut = new Array[Long](m * stride)
          var s = 0
          while (s < bk.length) {
            bk(s).foreach { case (ord, bv) =>
              lut(s * stride + ord) = quant6(round6(subDot(q, s * subLen, bv)))
            }
            s += 1
          }
          (id, bestC, qn, quant6(round6(dotKernel(q, bestVec))), lut)
        }
      }.toDF("vec_id", "cell", "qn", "dqc", "lut")
    val bcastLimit = {
      val raw = spark.conf
        .get("spark.sql.autoBroadcastJoinThreshold", "10MB").trim
      if (raw.startsWith("-")) -1L
      else org.apache.spark.network.util.JavaUtils.byteStringAsBytes(raw)
    }
    val cellsSide =
      if (bcastLimit > 0 && index.sizeHintBytes >= 0 &&
          index.sizeHintBytes <= bcastLimit) broadcast(index.cells)
      else index.cells
    val best = call_function("cell_max_adc",
      col("members"), col("lut"), col("dqc"), col("qn"))
    probes
      .join(cellsSide, Seq("cell"), "left_outer")
      .withColumn("best", best)
      .select(
        col("vec_id"), col("cell"),
        col("best").getField("cos").as("max_cos"),
        col("best").getField("id").as("best_match"),
        when(col("best").getField("cos") >= threshold, "duplicate_semantic")
          .otherwise("ok").as("reason"))
  }

  /** Incremental SemDeDup served from the COMPRESSED index — the
    * [[Dedup.incrementalSemanticDedup]] admit-a-batch model with the PQ
    * artifact: build once on the corpus, probe each batch vector's cell.
    */
  def incrementalSemanticDedupPq(
      corpus: DataFrame, batch: DataFrame, threshold: Double = 0.45,
      k: Int = 8, iters: Int = 2, cellCap: Int = 4096,
      m: Int = 8, nCodes: Int = 8, pqIters: Int = 2): DataFrame =
    pqNoveltyProbe(batch,
      buildPqSemanticIndex(corpus, k, iters, cellCap, m, nCodes, pqIters), threshold)
      .orderBy(col("vec_id"))

  /** IVF-PQ — the composed billion-scale serving shape (Jégou et al. 2011
    * §V, "IVFADC"): an IVF coarse quantizer routes every vector to a cell
    * and PQ codebooks — fit on the RESIDUALS (vector − cell centroid), the
    * part the coarse quantizer doesn't explain — compress what each cell
    * stores. A query probes its own cell only and ADC-scores that cell's
    * codes against the reconstruction x̂ = centroid + decoded residual:
    *   dot(q, x̂)  = dot(q, c) + Σₛ lut_s[code_s]
    *   ‖x̂‖²       = ‖c‖² + 2·Σₛ cross_s[code_s] + Σₛ ‖book_s[code_s]‖²
    * with every per-term dot 6-dp-rounded and ×10⁶-quantized, so both sums
    * are exact integer arithmetic (the [[pqTopK]] contract) and only the
    * final cosine rounds. All three lookup tables are query- or
    * index-constant: lut is O(m·nCodes) per query, cross is O(cells·m·
    * nCodes) per index build, both broadcast.
    *
    * Scale shape (100 TB): the scan per query is ONE cell's codes — the
    * corpus/nCentroids pruning of [[SimilaritySearch.ivfTopK]] times the
    * 32× byte-compression of PQ; the index build is one assignment kernel
    * + the residual fit's `iters` pre-reduced passes. Cell routing,
    * encode, and scoring are all narrow kernel passes against broadcast
    * tables; the only shuffle is the per-query top-k window.
    */
  def ivfPqTopK(
      corpus: DataFrame, queries: DataFrame,
      k: Int = 5, nCentroids: Int = 16, m: Int = 8, nCodes: Int = 8,
      iters: Int = 2, nprobe: Int = 1): DataFrame =
    rankTopK(
      ivfPqAdcScores(corpus, queries, nCentroids, m, nCodes, iters, nprobe), k)

  /** The (query_id, neighbor_id, cos) ADC-scored frame behind [[ivfPqTopK]]
    * — exposed so [[ivfPqTopKRerank]] can shortlist from it.
    */
  private[operators] def ivfPqAdcScores(
      corpus: DataFrame, queries: DataFrame,
      nCentroids: Int, m: Int, nCodes: Int, iters: Int,
      nprobe: Int = 1): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val cents = SimilaritySearch.ivfCentroids(corpus, nCentroids)
    val bcC = spark.sparkContext.broadcast(cents)

    // (vec_id, cell, vec = residual): argmax rounded cosine, ties to the
    // lowest cell id — the ivfTopK assignment — then subtract the centroid
    val res = Par.spread(corpus.select(col("vec_id"), col("embedding")))
      .as[(Long, Array[Float])]
      .mapPartitions { it =>
        val cs = bcC.value
        it.map { case (id, f) =>
          val e = f.map(_.toDouble)
          val ne = l2NormKernel(e)
          var bestId = -1L; var best = Double.NegativeInfinity
          var bestVec: Array[Double] = null
          cs.foreach { case (cid, cv, cn) =>
            val cos = safeCos(dotKernel(e, cv), ne, cn)
            if (cos > best) { best = cos; bestId = cid; bestVec = cv }
          }
          val r = new Array[Double](e.length)
          var i = 0
          while (i < e.length) { r(i) = e(i) - bestVec(i); i += 1 }
          (id, bestId, r)
        }
      }.toDF("vec_id", "cell", "vec")
      .localCheckpoint() // fit re-scans iters times; encode+score once more

    val (books, _) = fitWithStatsOn(res.select(col("vec_id"), col("vec")), m, nCodes, iters)
    val subLen = books(0)(0)._2.length

    // index-constant tables: per-(sub, position) residual-code norm² and
    // per-(cell, sub, position) centroid×code cross terms, all quantized
    val nq: Array[Array[Long]] =
      books.map(_.map { case (_, cv) => quant6(round6(subDot(cv, 0, cv))) })
    val cross: Map[Long, Array[Array[Long]]] = cents.map { case (cid, cv, _) =>
      cid -> Array.tabulate(m) { s =>
        books(s).map { case (_, bv) => quant6(round6(subDot(cv, s * subLen, bv))) }
      }
    }.toMap
    val ncSq: Map[Long, Long] =
      cents.map { case (cid, cv, _) => cid -> quant6(round6(dotKernel(cv, cv))) }.toMap

    // queries: top-nprobe cell assignment (rounded-cosine rank, ties to
    // the lowest cell id; nprobe=1 is the classic own-cell argmax) +
    // per-sub LUT + per-probed-cell dot(q, c). One (qid, cell, qn, dqc,
    // lut) entry PER PROBE — the scorer below is probe-count-agnostic: a
    // corpus row matches at most one of a query's probes (its own cell),
    // so multi-probe widens candidates without ever double-scoring a pair
    val qArr = queries.select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])].collect().sortBy(_._1)
      .flatMap { case (qid, f) =>
        val q = f.map(_.toDouble)
        val qn = l2NormKernel(q)
        val lut = Array.tabulate(m) { s =>
          books(s).map { case (_, cv) => quant6(round6(subDot(q, s * subLen, cv))) }
        }
        cents.map { case (cid, cv, cn) =>
          (safeCos(dotKernel(q, cv), qn, cn), cid, cv)
        }.sortBy { case (cos, cid, _) => (-cos, cid) }
          .take(nprobe)
          .map { case (_, cid, cv) =>
            (qid, cid, qn, quant6(round6(dotKernel(q, cv))), lut)
          }
      }
    val bcQ = spark.sparkContext.broadcast(qArr)
    val bcBooks = spark.sparkContext.broadcast(books)
    val bcNq = spark.sparkContext.broadcast(nq)
    val bcCross = spark.sparkContext.broadcast(cross)
    val bcNc = spark.sparkContext.broadcast(ncSq)

    val scored = res.as[(Long, Long, Array[Double])]
      .mapPartitions { it =>
        val qs = bcQ.value
        val bk = bcBooks.value
        val ns = bcNq.value
        val cx = bcCross.value
        val nc = bcNc.value
        val sl = bk(0)(0)._2.length
        it.flatMap { case (nid, cell, r) =>
          val cellQs = qs.filter(q => q._2 == cell && q._1 != nid)
          if (cellQs.isEmpty) Iterator.empty
          else {
            // encode inline (one pass over the residual) and pre-sum the
            // query-independent integer parts
            val pos = Array.tabulate(bk.length)(s => nearestCode(r, s * sl, bk(s)))
            var nqs = 0L; var cxs = 0L
            var s = 0
            while (s < pos.length) {
              nqs += ns(s)(pos(s)); cxs += cx(cell)(s)(pos(s)); s += 1
            }
            val nsum = nc(cell) + 2L * cxs + nqs
            val rNorm = if (nsum <= 0L) 0.0 else math.sqrt(nsum.toDouble / 1e6)
            cellQs.iterator.map { case (qid, _, qn, dqc, lut) =>
              var dres = 0L
              var t = 0
              while (t < pos.length) { dres += lut(t)(pos(t)); t += 1 }
              val dn = qn * rNorm
              val cos =
                if (nsum <= 0L || dn == 0.0) -1.0
                else round6(((dqc + dres).toDouble / 1e6) / dn)
              (qid, nid, cos)
            }
          }
        }
      }.toDF("query_id", "neighbor_id", "cos")
    scored
  }

  /** Rank an ADC- or exact-scored (query_id, neighbor_id, cos) frame to the
    * per-query top-k: row_number by (cos desc, neighbor_id) — one shuffle
    * on query_id, the [[SimilaritySearch.bruteForceTopK]] shape.
    */
  private[operators] def rankTopK(scored: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"), col("cos"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** ADC shortlist + exact re-rank ("IVFADC+R", Jégou et al. 2011 §VI.A):
    * the compressed index proposes the `shortlist` best candidates per
    * query by ADC cosine, then the FULL vectors of just those candidates
    * are fetched and exactly re-scored ([[SimilaritySearch.safeCos]], the
    * brute-twin arithmetic), and the final top-k ranks by the exact score.
    * Recovers most of the recall PQ's quantization loses — the returned
    * `cos` is exact, so downstream thresholds (dedup gates, recall audits)
    * compare like-for-like with the brute twin — while the expensive exact
    * kernel touches only |queries|·shortlist rows, not the corpus.
    *
    * Scale shape (100 TB): the shortlist frame is O(|queries|·shortlist)
    * ids; the candidate fetch broadcasts it and hash-joins the corpus — a
    * second corpus scan in this file-based harness, but the scan carries
    * codes-to-ids pruning semantics: in a lake deployment the id set pushes
    * into a point-lookup-keyed vector store (the re-rank store of a serving
    * stack), and either way the exact kernel's compute and the result
    * shuffle stay O(|queries|·shortlist), independent of corpus size.
    */
  def pqTopKRerank(
      corpus: DataFrame, queries: DataFrame,
      k: Int = 5, shortlist: Int = 20,
      m: Int = 8, nCodes: Int = 8, iters: Int = 2): DataFrame =
    rerankExact(pqAdcScores(corpus, queries, m, nCodes, iters),
      corpus, queries, k, shortlist)

  /** [[pqTopKRerank]] over the IVF-PQ index: cell-pruned ADC shortlist,
    * exact re-rank — the full IVFADC+R serving composition.
    */
  def ivfPqTopKRerank(
      corpus: DataFrame, queries: DataFrame,
      k: Int = 5, shortlist: Int = 20, nCentroids: Int = 16,
      m: Int = 8, nCodes: Int = 8, iters: Int = 2,
      nprobe: Int = 1): DataFrame =
    rerankExact(
      ivfPqAdcScores(corpus, queries, nCentroids, m, nCodes, iters, nprobe),
      corpus, queries, k, shortlist)

  private def rerankExact(
      adc: DataFrame, corpus: DataFrame, queries: DataFrame,
      k: Int, shortlist: Int): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val wAdc = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    val short = adc
      .withColumn("adc_rank", row_number().over(wAdc))
      .filter(col("adc_rank") <= shortlist)
      .select(col("query_id"), col("neighbor_id"))
    val qMat = spark.sparkContext.broadcast(
      queries.select(col("vec_id"), col("embedding")).as[(Long, Array[Float])]
        .collect()
        .map { case (id, f) =>
          val d = f.map(_.toDouble); id -> (d, l2NormKernel(d))
        }.toMap)
    val cand = corpus.select(col("vec_id"), col("embedding"))
      .join(broadcast(short), col("vec_id") === col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"), col("embedding"))
    val exact = cand.as[(Long, Long, Array[Float])]
      .mapPartitions { it =>
        val qs = qMat.value
        it.map { case (qid, nid, f) =>
          val e = f.map(_.toDouble)
          val (qv, qn) = qs(qid)
          (qid, nid, safeCos(dotKernel(qv, e), qn, l2NormKernel(e)))
        }
      }.toDF("query_id", "neighbor_id", "cos")
    rankTopK(exact, k)
  }
}
