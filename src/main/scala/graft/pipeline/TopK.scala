package graft.pipeline

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** One scored candidate inside a bounded top-k buffer. */
final case class ScoredId(cos: Double, id: Long)

/** Bounded top-k typed `Aggregator` — the custom-aggregation extension
  * point the reference exposes as facet `AggValueSource` / collector
  * plugins [U solr/core/.../search/facet/AggValueSource.java,
  * lucene/core/.../search/TopScoreDocCollector.java], re-expressed as a
  * Spark `Aggregator[IN, BUF, OUT]`.
  *
  * Scale shape: compiles to ObjectHashAggregate with PARTIAL + FINAL
  * phases — every partition reduces its rows into an O(k) buffer
  * map-side, and only ≤k-entry buffers cross the shuffle. This is the
  * distributed TopDocs.merge: no row set larger than k per group ever
  * sits in one task (versus `row_number().over(Window.partitionBy(q))`,
  * which moves EVERY candidate row of a group into one partition —
  * a single-node sort of the corpus per query at web scale).
  *
  * Total order: (cos DESC, id ASC) — ties broken by id, so the result
  * is deterministic and merge-order independent (top-k selection under
  * a total order is associative + commutative).
  */
final class TopKAggregator(k: Int)
    extends Aggregator[ScoredId, Seq[ScoredId], Seq[ScoredId]] {
  require(k > 0, s"k must be positive: $k")

  /** (cos desc, id asc) — true iff a ranks strictly before b.
    * TOTAL order over doubles (java.lang.Double.compare: NaN greatest,
    * matching Spark's and DuckDB's DESC sort where NaN sorts first) —
    * IEEE `>` would silently drop NaN scores (e.g. a zero-norm
    * embedding's 0/0 cosine) from a full buffer and break merge-order
    * independence. -0.0 is collapsed to 0.0 first (Spark sort treats
    * them equal; Double.compare does not). */
  @inline private def norm(d: Double): Double = if (d == 0.0) 0.0 else d
  @inline private def before(a: ScoredId, b: ScoredId): Boolean = {
    val c = java.lang.Double.compare(norm(a.cos), norm(b.cos))
    c > 0 || (c == 0 && a.id < b.id)
  }

  override def zero: Seq[ScoredId] = Vector.empty

  override def reduce(buf: Seq[ScoredId], a: ScoredId): Seq[ScoredId] =
    if (buf.length >= k && !before(a, buf.last)) buf // fast reject vs current kth
    else insert(buf, a)

  override def merge(b1: Seq[ScoredId], b2: Seq[ScoredId]): Seq[ScoredId] =
    b2.foldLeft(b1)(reduce)

  override def finish(buf: Seq[ScoredId]): Seq[ScoredId] = buf

  private def insert(buf: Seq[ScoredId], a: ScoredId): Seq[ScoredId] = {
    val i = buf.indexWhere(before(a, _))
    val at = if (i < 0) buf.length else i
    ((buf.take(at) :+ a) ++ buf.drop(at)).take(k)
  }

  override def bufferEncoder: Encoder[Seq[ScoredId]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[ScoredId]]()
  override def outputEncoder: Encoder[Seq[ScoredId]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[ScoredId]]()
}

object TopKAggregator {
  /** Untyped column form: `topK(5)(col("cos"), col("vec_id"))` →
    * array<struct<cos,id>> sorted (cos desc, id asc), length ≤ k. */
  def topK(k: Int): (Column, Column) => Column = {
    val fn = udaf(new TopKAggregator(k), Encoders.product[ScoredId])
    (cos, id) => fn(cos, id)
  }
}
