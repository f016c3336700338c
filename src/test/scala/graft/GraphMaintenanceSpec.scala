package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.operators.SimilaritySearch
import graft.streaming.GraphMaintainer

class GraphMaintenanceSpec extends SparkSpec {
  import spark.implicits._

  private def rebuildWant = {
    val emb = Tables.embeddings(spark, sf)
    val old = emb.filter(col("vec_id") % 5 =!= 0)
    SimilaritySearch.knnGraph(
        emb.select(col("vec_id"), col("embedding")),
        quantizerSource = Some(old))
      .collect().map(_.toSeq).toSet
  }

  test("chained folds equal the frozen-quantizer full rebuild") {
    val emb = Tables.embeddings(spark, sf)
    val old = emb.filter(col("vec_id") % 5 =!= 0)
    val b1 = emb.filter(col("vec_id") % 5 === 0 && col("vec_id") % 2 === 0)
    val b2 = emb.filter(col("vec_id") % 5 === 0 && col("vec_id") % 2 =!= 0)
    val m = new GraphMaintainer(old)
    m.fold(b1)
    m.fold(b2)
    assert(m.graph.collect().map(_.toSeq).toSet == rebuildWant)
    assert(m.corpus.count() == emb.count())
  }

  test("attached to a MemoryStream, the artifact matches the rebuild") {
    implicit val sqlCtx = spark.sqlContext
    val emb = Tables.embeddings(spark, sf)
    val old = emb.filter(col("vec_id") % 5 =!= 0)
    val rows = emb.filter(col("vec_id") % 5 === 0)
      .select(col("vec_id"), col("embedding")).as[(Long, Array[Float])].collect()
    val (b1, b2) = rows.partition(_._1 % 2 == 0)
    val input = MemoryStream[(Long, Array[Float])]
    val m = new GraphMaintainer(old)
    val q = m.attach(input.toDF().toDF("vec_id", "embedding"))
    try {
      input.addData(b1.toSeq: _*)
      q.processAllAvailable()
      input.addData(b2.toSeq: _*)
      q.processAllAvailable()
      assert(m.graph.collect().map(_.toSeq).toSet == rebuildWant)
    } finally q.stop()
  }
}
