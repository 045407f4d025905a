package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Misra-Gries frequent-items sketch as a typed `Aggregator` UDAF — the
  * heavy-hitters counterpart to the HLL (q48/q93) and percentile (q91)
  * sketches: bounded state, mergeable partials, one pass.
  *
  * The buffer holds at most [[HeavyHitters.K]] counters. Classic
  * guarantees (Misra & Gries '82; merge step per Agarwal et al.,
  * "Mergeable Summaries", PODS'12):
  *   - estimated count ≤ true count (decrements only remove);
  *   - undercount ≤ N/(K+1) over N items, merges included — the merge
  *     sums two sketches then subtracts the (K+1)-largest count from
  *     every counter, keeping the top K;
  *   - every item with true count > N/(K+1) is guaranteed present.
  * HeavyHittersSpec pins all three against q22's exact counts.
  *
  * Scale posture: the whole point. Exact top-k over words needs a
  * corpus-wide (word → count) shuffle first (q22); the sketch keeps K
  * counters per partition and merges kilobyte buffers — the shuffle
  * carries 64 entries per map task no matter how many petabytes streamed
  * through it. Estimates are stream-order-dependent (inherent to MG), so
  * the query face is rows-only in the driver contract; the spec pins the
  * error envelope instead of exact values.
  */
object HeavyHitters extends Aggregator[String, Map[String, Long], Map[String, Long]] {
  val K = 64

  override def zero: Map[String, Long] = Map.empty

  override def reduce(b: Map[String, Long], w: String): Map[String, Long] =
    b.get(w) match {
      case Some(c) => b.updated(w, c + 1)
      case None if b.size < K => b.updated(w, 1L)
      case None => // decrement all; drop exhausted counters
        b.flatMap { case (k, c) => if (c > 1) Some(k -> (c - 1)) else None }
    }

  override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
    val summed = b.foldLeft(a) { case (m, (k, c)) =>
      m.updated(k, m.getOrElse(k, 0L) + c)
    }
    if (summed.size <= K) summed
    else {
      // subtract the (K+1)-th largest count from everything, keep > 0
      val cut = summed.valuesIterator.toArray.sorted(Ordering[Long].reverse)(K)
      summed.flatMap { case (k, c) => if (c > cut) Some(k -> (c - cut)) else None }
    }
  }

  override def finish(r: Map[String, Long]): Map[String, Long] = r

  // ExpressionEncoder (not kryo): the buffer ships as a real MapType —
  // compact tungsten rows between partial and merge — and the OUTPUT is a
  // SQL map the query face can explode/sort relationally.
  private val mapEnc: Encoder[Map[String, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
  override def bufferEncoder: Encoder[Map[String, Long]] = mapEnc
  override def outputEncoder: Encoder[Map[String, Long]] = mapEnc
}
