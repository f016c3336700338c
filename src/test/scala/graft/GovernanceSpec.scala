package graft

import org.apache.spark.sql.functions._
import graft.operators.Governance

class GovernanceSpec extends SparkSpec {
  import spark.implicits._

  test("snapshotDiff classifies added/removed/changed/unchanged exactly") {
    val oldSnap = Seq(
      (1L, "alpha"), (2L, "beta"), (3L, "gamma"), (4L, "delta")
    ).toDF("doc_id", "text")
    val newSnap = Seq(
      (2L, "beta"), (3L, "gamma EDITED"), (4L, "delta"), (5L, "epsilon")
    ).toDF("doc_id", "text")
    val got = Governance.snapshotDiff(oldSnap, newSnap).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("status")).toMap
    assert(got == Map(
      1L -> "removed", 2L -> "unchanged", 3L -> "changed",
      4L -> "unchanged", 5L -> "added"))
  }

  test("snapshotDiff digests: null exactly on the missing side") {
    val oldSnap = Seq((1L, "a"), (2L, "b")).toDF("doc_id", "text")
    val newSnap = Seq((2L, "b2"), (3L, "c")).toDF("doc_id", "text")
    val rows = Governance.snapshotDiff(oldSnap, newSnap).collect()
    val byId = rows.map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(byId(1L).getAs[String]("new_digest") == null)
    assert(byId(3L).getAs[String]("old_digest") == null)
    assert(byId(2L).getAs[String]("old_digest") != null
      && byId(2L).getAs[String]("new_digest") != null
      && byId(2L).getAs[String]("old_digest") != byId(2L).getAs[String]("new_digest"))
  }

  test("sourceReportCard: exact per-source stats, cross-source dups count both sides") {
    val docs = Seq(
      (1L, "a b c", "en", "web", 5L),
      (2L, "a b c", "en", "books", 5L),   // cross-source copy of 1
      (3L, "d e", "fr", "web", 3L),
      (4L, "f", "en", "web", 1L),
      (5L, "f", "en", "web", 1L)          // in-source copy of 4
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val got = Governance.sourceReportCard(docs).collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("total_tokens"),
          r.getAs[Long]("total_chars"), r.getAs[Long]("n_langs"),
          r.getAs[Long]("dup_docs"))).toMap
    assert(got == Map(
      "web" -> ((4L, 7L, 10L, 2L, 3L)),   // docs 1 (cross-source), 4, 5 are dup mass
      "books" -> ((1L, 3L, 5L, 1L, 1L))))
  }

  test("trainValTestSplit: boundaries, determinism, all splits populated") {
    val docs = Tables.documents(spark, sf)
    val rows = Governance.trainValTestSplit(docs).collect()
    rows.foreach { r =>
      val (b, s) = (r.getAs[Long]("bucket"), r.getAs[String]("split"))
      val want = if (b < 80) "train" else if (b < 90) "val" else "test"
      assert(s == want, s"bucket $b got split $s")
    }
    val bySplit = rows.groupBy(_.getAs[String]("split")).view.mapValues(_.length).toMap
    assert(bySplit.keySet == Set("train", "val", "test"), s"got $bySplit")
    // uniform hash: train ~80% with generous slack at sf0.001
    val frac = bySplit("train").toDouble / rows.length
    assert(frac > 0.7 && frac < 0.9, s"train fraction $frac")
    val again = Governance.trainValTestSplit(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("split")).toMap
    assert(rows.map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("split")).toMap == again)
  }

  test("trainValTestSplit: membership survives re-curation (subset invariance)") {
    // the anti-leakage contract: a doc's split depends only on (seed,
    // doc_id) — re-curating the corpus (dropping rows) must not move any
    // surviving doc across splits
    val docs = Tables.documents(spark, sf)
    val full = Governance.trainValTestSplit(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("split")).toMap
    val curated = Governance.trainValTestSplit(docs.filter(col("doc_id") % 3 =!= 0))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("split")).toMap
    curated.foreach { case (id, s) => assert(full(id) == s, s"doc $id moved to $s") }
  }

  test("trainValTestSplit: a new seed is an independent re-split") {
    val docs = Tables.documents(spark, sf)
    val v1 = Governance.trainValTestSplit(docs, seed = "v1").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("bucket")).toMap
    val v2 = Governance.trainValTestSplit(docs, seed = "v2").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("bucket")).toMap
    assert(v1 != v2, "different seeds must produce different bucketings")
  }

  test("forgetCascade: docs, exact copies, chunks, and packed seqs all flagged") {
    // 100-token doc -> 2 chunks (64-token window, stride 48); its exact
    // copy under another id must cascade too
    val longText = (1 to 100).map(_ => "w").mkString(" ")
    val docs = Seq(
      (1L, longText, "en", "web", 0L),
      (2L, "keep me", "en", "web", 0L),
      (3L, longText, "en", "books", 0L),   // byte-identical copy of 1
      (4L, "also kept", "en", "books", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val ts = Seq(Tuple1(1L)).toDF("doc_id")
    val got = Governance.forgetCascade(docs, ts).collect()
    val keys = got.map(r => (r.getAs[String]("artifact"),
      r.getAs[String]("artifact_key"), r.getAs[Long]("doc_id"),
      r.getAs[String]("reason"))).toSet
    // the requested doc and its byte-identical copy
    assert(keys.contains(("document", "1", 1L, "requested")))
    assert(keys.contains(("document", "3", 3L, "exact_copy")))
    // both docs' chunks (2 each at 100 tokens), reasons inherited
    assert(keys.contains(("chunk", "1:0", 1L, "requested")))
    assert(keys.contains(("chunk", "1:1", 1L, "requested")))
    assert(keys.contains(("chunk", "3:0", 3L, "exact_copy")))
    assert(keys.contains(("chunk", "3:1", 3L, "exact_copy")))
    // the packed sequences holding them, per source
    assert(keys.contains(("packed_seq", "web:0", 1L, "contains_forgotten")))
    assert(keys.contains(("packed_seq", "books:0", 3L, "contains_forgotten")))
    // nothing else: untouched docs appear in NO artifact row
    assert(!got.exists(r => r.getAs[Long]("doc_id") == 2L ||
      r.getAs[Long]("doc_id") == 4L))
    assert(got.length == 8)
  }

  test("embeddingIntegrity: each defect class counted once, precedence fixed") {
    val docs = Seq(1L, 2L, 3L, 4L, 5L, 6L).toDF("doc_id")
    def vec(seed: Int) = Array.tabulate(3)(i => (seed + i).toFloat)
    val emb = Seq(
      (1L, vec(1)),                       // ok
      (2L, Array(0f, 0f, 0f)),            // zero_norm
      (3L, Array(1f, Float.NaN, 2f)),     // nan_component
      (4L, Array(1f, 2f)),                // bad_dim (expect 3)
      // doc 5 and 6 have no vector -> missing_vector x2
      (9L, vec(9)))                       // orphan_vector
      .toDF("vec_id", "embedding")
    val got = graft.operators.Governance.embeddingIntegrity(docs, emb, dim = 3)
      .collect().map(r => r.getAs[String]("status") -> r.getAs[Long]("n_rows")).toMap
    assert(got == Map(
      "ok" -> 1L, "zero_norm" -> 1L, "nan_component" -> 1L,
      "bad_dim" -> 1L, "missing_vector" -> 2L, "orphan_vector" -> 1L))
    // precedence: a wrong-dim vector containing NaN is bad_dim, not nan
    val emb2 = Seq((1L, Array(Float.NaN, 1f))).toDF("vec_id", "embedding")
    val got2 = graft.operators.Governance.embeddingIntegrity(
      Seq(1L).toDF("doc_id"), emb2, dim = 3).collect()
      .map(r => r.getAs[String]("status")).toSeq
    assert(got2 == Seq("bad_dim"))
  }

  test("leakageSafeSplit: near-dup cluster-mates can never straddle splits") {
    // 60-token docs: 1 and 2 near-dup (one word differs), others unrelated
    val base = (0 until 60).map(i => s"w$i").mkString(" ")
    val variant = base.replace("w30", "w30x")
    val docs = Seq(
      (1L, base, "en"), (2L, variant, "en"),
      (3L, (0 until 60).map(i => s"x$i").mkString(" "), "en"),
      (4L, (0 until 60).map(i => s"y$i").mkString(" "), "en"))
      .toDF("doc_id", "text", "lang")
    val got = Governance.leakageSafeSplit(docs).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("cluster_id"), r.getAs[String]("split")))).toMap
    // the pair shares a cluster AND a split, keyed by the cluster min-id
    assert(got(1L)._1 == 1L && got(2L)._1 == 1L)
    assert(got(1L)._2 == got(2L)._2,
      s"cluster-mates split apart: ${got(1L)} vs ${got(2L)}")
    // singletons are their own cluster
    assert(got(3L)._1 == 3L && got(4L)._1 == 4L)
    // the property that matters at corpus scale: EVERY cluster maps to
    // exactly one split on the real fixture
    val real = Governance.leakageSafeSplit(Tables.documents(spark, sf)).collect()
    val perCluster = real.groupBy(_.getAs[Long]("cluster_id"))
      .view.mapValues(_.map(_.getAs[String]("split")).distinct.length)
    assert(perCluster.values.forall(_ == 1), "a cluster straddles splits")
  }

  test("embeddingDrift: planted geometry lands in the right class") {
    val a = Array(1f, 0f, 0f)
    val old = Seq((1L, 0, a), (2L, 0, a), (3L, 1, a))
      .toDF("vec_id", "label", "embedding")
    val neu = Seq(
      (1L, a),                        // identical -> stable
      (2L, Array(-1f, 0f, 0f)),       // negated -> flipped
      (3L, Array(0f, 1f, 0f)))        // orthogonal -> drifted
      .toDF("vec_id", "embedding")
    val got = graft.operators.Governance.embeddingDrift(old, neu).collect()
      .map(r => r.getAs[Int]("label") -> r).toMap
    assert(got(0).getAs[Long]("n_stable") == 1L)
    assert(got(0).getAs[Long]("n_flipped") == 1L)
    assert(got(0).getAs[Double]("min_cos") == -1.0)
    assert(got(1).getAs[Long]("n_drifted") == 1L)
    assert(got(1).getAs[Double]("mean_cos") == 0.0)
  }

  test("forgetCascade flags EVERY sequence a boundary-straddling doc spills into") {
    // source order by doc_id: filler(2040 tokens) then the tombstoned doc
    // (100 tokens at start=2040) -> its tokens occupy seqs 0 AND 1
    val filler = (1 to 2040).map(_ => "f").mkString(" ")
    val doomed = (1 to 100).map(_ => "d").mkString(" ")
    val docs = Seq(
      (1L, filler, "en", "web", 0L),
      (2L, doomed, "en", "web", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val ts = Seq(Tuple1(2L)).toDF("doc_id")
    val seqs = Governance.forgetCascade(docs, ts).collect()
      .filter(_.getAs[String]("artifact") == "packed_seq")
      .map(_.getAs[String]("artifact_key")).toSet
    assert(seqs == Set("web:0", "web:1"),
      s"both touched sequences must be flagged, got $seqs")
  }

  test("forgetCascade threads a non-default budget through packing AND straddle math") {
    // 60-token filler + 10-token doomed doc: on the 64-token grid the
    // doomed doc starts at 60 and ends at 69 -> straddles seqs 0 and 1;
    // on the default 2048 grid everything fits in seq 0. Listing web:1
    // only at budget=64 proves ONE parameter reached both packSequences
    // and the DIV arithmetic — the compliance fragility the hardcoded
    // constant had.
    val filler = (1 to 60).map(_ => "f").mkString(" ")
    val doomed = (1 to 10).map(_ => "d").mkString(" ")
    val docs = Seq(
      (1L, filler, "en", "web", 0L),
      (2L, doomed, "en", "web", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val ts = Seq(Tuple1(2L)).toDF("doc_id")
    def seqKeys(budget: Option[Long]) =
      budget.fold(Governance.forgetCascade(docs, ts))(
        b => Governance.forgetCascade(docs, ts, b)).collect()
        .filter(_.getAs[String]("artifact") == "packed_seq")
        .map(_.getAs[String]("artifact_key")).toSet
    assert(seqKeys(Some(64L)) == Set("web:0", "web:1"))
    assert(seqKeys(None) == Set("web:0"))
  }

  test("leakageSafeSplit: split key is content-derived, not id-derived") {
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val base = (0 until 60).map(i => s"w$i").mkString(" ")
    val variant = base.replace("w30", "w30x")
    // put the LARGER-digest text on the cluster's id representative (min
    // doc_id): dropping the representative then leaves the cluster's min
    // CONTENT digest — and so the split — in place, exactly where an
    // id-keyed split re-rolls (cluster_id would change 1 -> 2)
    val (repText, mateText) =
      if (md5hex(base) > md5hex(variant)) (base, variant) else (variant, base)
    val solo = (0 until 60).map(i => s"z$i").mkString(" ")
    val docs = Seq((1L, repText, "en"), (2L, mateText, "en"), (3L, solo, "en"))
      .toDF("doc_id", "text", "lang")
    def splits(d: org.apache.spark.sql.DataFrame) =
      Governance.leakageSafeSplit(d).collect()
        .map(r => r.getAs[Long]("doc_id") ->
          ((r.getAs[Long]("bucket"), r.getAs[String]("split")))).toMap
    val before = splits(docs)
    // re-curation drops the cluster representative: the surviving mate
    // keeps its bucket and split
    val after = splits(docs.filter(col("doc_id") =!= 1L))
    assert(after(2L) == before(2L),
      s"survivor re-rolled after representative drop: ${after(2L)} vs ${before(2L)}")
    // re-IDing the corpus moves no one: the singleton relabeled 99 keeps
    // its split (the id-keyed draw fails exactly this)
    val reid = splits(docs.withColumn("doc_id",
      when(col("doc_id") === 3L, 99L).otherwise(col("doc_id"))))
    assert(reid(99L) == before(3L),
      s"re-IDed singleton moved: ${reid(99L)} vs ${before(3L)}")
  }
}
