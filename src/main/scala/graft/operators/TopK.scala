package graft.operators

import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Per-group top-k as a single-pass bounded-state aggregation.
  *
  * The window form (`row_number() over (partition by g order by ...) <= k`)
  * sorts every group in full — O(n log n) per group and the whole group's
  * rows shuffle to one task. This Aggregator keeps only k rows of state per
  * group, merges map-side partials (each input partition contributes at most
  * k rows per group to the shuffle), and never materializes a group sort —
  * the physical strategy a 100 TB per-key top-k needs. Output is identical
  * to the window twin, so both share one oracle; Bench measures them side
  * by side.
  */
object TopK {

  case class Entry(key: Long, value: Double)
  case class Buf(items: Seq[Entry])

  /** Keep the k largest by (value desc, key asc) — insertion into a small
    * sorted buffer; k is tiny so linear insertion beats heap overhead.
    */
  class TopKAgg(k: Int) extends Aggregator[Entry, Buf, Buf] {
    private def better(a: Entry, b: Entry): Boolean =
      a.value > b.value || (a.value == b.value && a.key < b.key)

    private def insert(items: Seq[Entry], e: Entry): Seq[Entry] = {
      val (before, after) = items.span(better(_, e))
      val merged = before ++ (e +: after)
      if (merged.size > k) merged.take(k) else merged
    }

    override def zero: Buf = Buf(Nil)
    override def reduce(b: Buf, e: Entry): Buf = Buf(insert(b.items, e))
    override def merge(a: Buf, b: Buf): Buf =
      Buf(b.items.foldLeft(a.items)(insert))
    override def finish(b: Buf): Buf = b
    override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
    override def outputEncoder: Encoder[Buf] = Encoders.product[Buf]
  }

  /** Top `k` orders per market segment — output shape and oracle identical
    * to [[Relational.topOrdersPerSegment]] (the window twin).
    */
  def topOrdersPerSegmentAgg(
      orders: DataFrame, customer: DataFrame, k: Int = 3): DataFrame = {
    val spark = orders.sparkSession
    import spark.implicits._
    val agg = new TopKAgg(k).toColumn
    orders
      .join(broadcast(customer), col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment").as("seg"),
        col("o_orderkey").as("key"), col("o_totalprice").as("value"))
      .as[(String, Long, Double)]
      .map { case (seg, key, value) => (seg, Entry(key, value)) }
      .groupByKey(_._1)
      .mapValues(_._2)
      .agg(agg.name("top"))
      .flatMap { case (seg, buf) =>
        buf.items.iterator.zipWithIndex.map { case (e, i) =>
          (seg, i + 1, e.key, e.value)
        }
      }
      .toDF("c_mktsegment", "rank", "o_orderkey", "o_totalprice")
      .orderBy(col("c_mktsegment"), col("rank"))
  }
}
