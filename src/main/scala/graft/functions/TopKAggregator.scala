package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Bounded top-k as a typed Aggregator (SURVEY.md §2.2 #21c scale
  * path).
  *
  * The window-filter formulation (`row_number() over (...) <= k`)
  * sorts every group in full; this aggregator keeps a k-bounded buffer
  * per group, so partial aggregation runs map-side and the shuffle
  * carries at most k rows per (partition, group) — the difference
  * between shuffling N rows and shuffling k·P rows when groups are
  * huge. Results are identical (ties broken by payload asc, matching
  * `ORDER BY sort DESC, payload`).
  */
object TopKAggregator {

  final case class Entry(sort: Double, payload: Long)
  final case class Buf(items: List[Entry])

  /** keep the k largest by (sort desc, payload asc) */
  private def trim(items: List[Entry], k: Int): List[Entry] =
    items.sortBy(e => (-e.sort, e.payload)).take(k)

  def topK(k: Int): Aggregator[Entry, Buf, Seq[Entry]] =
    new Aggregator[Entry, Buf, Seq[Entry]] {
      override def zero: Buf = Buf(Nil)
      override def reduce(b: Buf, e: Entry): Buf = {
        // cheap reject before the sort: full buffer and e below the floor
        if (b.items.lengthCompare(k) >= 0) {
          val floor = b.items.last
          if (e.sort < floor.sort || (e.sort == floor.sort && e.payload > floor.payload)) return b
        }
        Buf(trim(e :: b.items, k))
      }
      override def merge(a: Buf, b: Buf): Buf = Buf(trim(a.items ++ b.items, k))
      override def finish(b: Buf): Seq[Entry] = b.items
      override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
      override def outputEncoder: Encoder[Seq[Entry]] = {
        import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
        ExpressionEncoder[Seq[Entry]]()
      }
    }
}
