package graft.operators

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** §2.10 — custom typed aggregate: exact top-k per group WITHOUT a
  * per-group sort.
  *
  * The window-function formulation (`row_number() over (partition by g
  * order by score desc) <= k`) sorts every group's full contents; this
  * `Aggregator` keeps a bounded k-element buffer per group, so the
  * shuffle carries at most k rows per group from each map task
  * (partial aggregation) and no sort of group contents ever happens —
  * the per-group analog of what `TakeOrderedAndProject` does globally.
  * At 100 TB with millions of members per group, the window shape
  * sorts millions per group; this shape merges k-buffers.
  *
  * Ordering: score descending, id ascending on ties — deterministic,
  * matching a `ORDER BY score DESC, id` oracle.
  */
object TopK {

  type Entry = (Long, Double) // (id, score)

  private def better(a: Entry, b: Entry): Boolean =
    a._2 > b._2 || (a._2 == b._2 && a._1 < b._1)

  /** Sorted-insert into a bounded buffer (buffer stays sorted best-first
    * and ≤ k long — insertion is O(k), fine for the small k this is
    * for). */
  private def insert(buf: List[Entry], e: Entry, k: Int): List[Entry] = {
    val (front, back) = buf.span(better(_, e))
    (front ::: e :: back).take(k)
  }

  def topK(k: Int): Aggregator[Entry, List[Entry], Seq[Entry]] =
    new Aggregator[Entry, List[Entry], Seq[Entry]] {
      override def zero: List[Entry] = Nil
      override def reduce(buf: List[Entry], in: Entry): List[Entry] =
        insert(buf, in, k)
      override def merge(a: List[Entry], b: List[Entry]): List[Entry] =
        b.foldLeft(a)((acc, e) => insert(acc, e, k))
      override def finish(buf: List[Entry]): Seq[Entry] = buf
      override def bufferEncoder: Encoder[List[Entry]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[List[Entry]]()
      override def outputEncoder: Encoder[Seq[Entry]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Entry]]()
    }
}
