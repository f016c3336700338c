package graft

import org.apache.spark.sql.functions._
import graft.functions.RandomFns
import graft.plans.GraftFunctions

class FunctionsSpec extends SparkSpec {
  import spark.implicits._

  private def draws(c: org.apache.spark.sql.Column, n: Int = 10000) =
    spark.range(n).select(c.as("x"))

  test("uniformInt covers [lo, hi) uniformly and deterministically") {
    val out = draws(RandomFns.uniformInt(42L, -5, 5)).as[Int].collect()
    assert(out.min == -5 && out.max == 4)
    val counts = out.groupBy(identity).view.mapValues(_.size)
    counts.values.foreach(c => assert(c > 700 && c < 1300)) // ~1000 each
    val again = draws(RandomFns.uniformInt(42L, -5, 5)).as[Int].collect()
    assert(out.sameElements(again)) // seeded determinism
  }

  test("triangular(a,b,c) stays in range with mode-heavy mass") {
    val out = draws(RandomFns.triangular(7L, -10, 10, 0)).as[Double].collect()
    assert(out.forall(v => v >= -10 && v <= 10))
    val nearMode = out.count(v => math.abs(v) < 5).toDouble / out.length
    val nearEdges = out.count(v => math.abs(v) > 5).toDouble / out.length
    assert(nearMode > nearEdges) // triangular: center beats tails (75/25 split)
    val mean = out.sum / out.length
    assert(math.abs(mean) < 0.5) // symmetric around the mode
  }

  test("categorical draws every value roughly uniformly") {
    val vals = Seq("sunny", "partly_cloudy", "cloudy", "windy", "precipitation")
    val out = draws(RandomFns.categorical(3L, vals)).as[String].collect()
    val counts = out.groupBy(identity).view.mapValues(_.size)
    assert(counts.keySet == vals.toSet)
    counts.values.foreach(c => assert(c > 1400 && c < 2600))
  }

  test("hamming_distance: native expression evals and codegens correctly") {
    GraftFunctions.register(spark)
    val df = Seq(
      ("10101", "10101", 0),
      ("10101", "10001", 1),
      ("00000", "11111", 5),
      ("101", "10100", 2) // length diff counts
    ).toDF("a", "b", "expect")
    val out = df.select(
      call_function("hamming_distance", col("a"), col("b")).as("d"), col("expect"))
      .collect()
    out.foreach(r => assert(r.getInt(0) == r.getInt(1)))
    // also callable from SQL once registered
    df.createOrReplaceTempView("hd_test")
    val viaSql = spark.sql("SELECT hamming_distance(a, b) AS d FROM hd_test ORDER BY d")
      .as[Int].collect()
    assert(viaSql.toSeq == Seq(0, 1, 2, 5))
    // null propagation
    val withNull = Seq((Option("101"), Option.empty[String])).toDF("a", "b")
      .select(call_function("hamming_distance", col("a"), col("b")))
      .collect()
    assert(withNull(0).isNullAt(0))
  }

  test("cosine_similarity native expression equals the HOF composition bit-for-bit") {
    GraftFunctions.register(spark)
    val emb = Tables.embeddings(spark, sf).limit(100)
    val both = emb.as("a").join(emb.as("b"), col("a.vec_id") < col("b.vec_id"))
      .limit(500)
      .select(
        call_function("cosine_similarity", col("a.embedding"), col("b.embedding")).as("native"),
        graft.operators.SimilaritySearch.cosine(col("a.embedding"), col("b.embedding")).as("hof"))
      .collect()
    assert(both.nonEmpty)
    both.foreach(r => assert(r.getDouble(0) == r.getDouble(1))) // exact, not approx
    // SQL-callable
    emb.createOrReplaceTempView("emb_cs")
    val viaSql = spark.sql(
      "SELECT cosine_similarity(embedding, embedding) AS s FROM emb_cs LIMIT 5")
      .collect()
    viaSql.foreach(r => assert(math.abs(r.getDouble(0) - 1.0) < 1e-12))
  }

  test("SimplifyHammingSelfCompare folds hamming_distance(x, x) to a literal") {
    import org.apache.spark.sql.catalyst.expressions.{AttributeReference, Literal}
    import org.apache.spark.sql.types.StringType
    val x = AttributeReference("x", StringType, nullable = false)()
    val plan = org.apache.spark.sql.catalyst.plans.logical.Project(
      Seq(org.apache.spark.sql.catalyst.expressions.Alias(
        graft.plans.HammingDistance(x, x), "d")()),
      org.apache.spark.sql.catalyst.plans.logical.LocalRelation(x))
    val optimized = graft.plans.SimplifyHammingSelfCompare(plan)
    val folded = optimized.expressions.head.children.head
    assert(folded == Literal(0, org.apache.spark.sql.types.IntegerType))
    // nullable input must NOT fold (null propagation would be lost)
    val xn = AttributeReference("x", StringType, nullable = true)()
    val plan2 = org.apache.spark.sql.catalyst.plans.logical.Project(
      Seq(org.apache.spark.sql.catalyst.expressions.Alias(
        graft.plans.HammingDistance(xn, xn), "d")()),
      org.apache.spark.sql.catalyst.plans.logical.LocalRelation(xn))
    assert(graft.plans.SimplifyHammingSelfCompare(plan2) == plan2)
  }

  test("simhashNearDupPairs finds the corpus' planted near-dups via chunk blocking") {
    val pairs = graft.operators.Dedup.simhashNearDupPairs(
      Tables.documents(spark, sf)).collect()
    assert(pairs.nonEmpty)
    assert(pairs.forall(_.getAs[Int]("hamming") <= 3))
  }
}
