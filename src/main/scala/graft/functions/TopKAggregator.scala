package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF: bounded top-k by score with deterministic tie-break on id.
  *
  * The window-function formulation of top-k-per-group
  * (row_number over partitionBy(qid).orderBy(score desc)) sorts every
  * group's full candidate list. This Aggregator keeps only k entries per
  * partial buffer, merges associatively, and never materializes a group
  * sort — at 100 TB the shuffle carries k rows per (partition × group)
  * instead of the whole candidate set. Declared queries keep the window
  * form (it is the SQL-oracle-comparable one); this is the scale path,
  * proven result-identical in TopKAggregatorSpec.
  */
class TopKAggregator(k: Int)
    extends Aggregator[(Long, Double), Seq[(Long, Double)], Seq[(Long, Double)]] {

  /** total order: higher score first, then lower id (matches
    * orderBy(score.desc, id.asc)) */
  private def better(a: (Long, Double), b: (Long, Double)): Boolean =
    a._2 > b._2 || (a._2 == b._2 && a._1 < b._1)

  private def trim(s: Seq[(Long, Double)]): Seq[(Long, Double)] =
    s.sortWith(better).take(k)

  override def zero: Seq[(Long, Double)] = Seq.empty

  override def reduce(buf: Seq[(Long, Double)], in: (Long, Double)): Seq[(Long, Double)] =
    if (buf.size < k || better(in, buf.last)) trim(buf :+ in) else buf

  override def merge(a: Seq[(Long, Double)], b: Seq[(Long, Double)]): Seq[(Long, Double)] =
    trim(a ++ b)

  override def finish(buf: Seq[(Long, Double)]): Seq[(Long, Double)] = buf

  override def bufferEncoder: Encoder[Seq[(Long, Double)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[(Long, Double)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
}
