package graft.core.sketch

import scala.collection.mutable

/** Misra-Gries frequent-items summary (Misra & Gries, Science of Computer
  * Programming 1982; rediscovered as "Frequent" by Demaine et al., ESA'02).
  *
  * Streams items through at most `k` counters in O(k) memory. When an
  * unseen item arrives with all counters occupied, EVERY counter decrements
  * (the arriving item is charged too), so each decrement event consumes
  * k+1 units of stream mass — there can be at most n/(k+1) of them.
  * Consequences, both load-bearing for the q97 two-pass pattern:
  *
  *   - an item with true frequency f leaves with counter value in
  *     [f - n/(k+1), f];
  *   - any item with f > n/(k+1) is GUARANTEED to survive (its counter
  *     cannot reach zero), so the survivor set is a superset of every
  *     item above that threshold.
  *
  * Run per-partition, the supersets union: if an item had local frequency
  * f_p <= n_p/(k+1) on every partition, summing over partitions gives
  * global f <= N/(k+1) — so every item with global f > N/(k+1) survives
  * in at least one partition. The exact confirmation pass then counts
  * only the candidate superset.
  *
  * Pure JVM, no Spark imports — unit-tested without a session
  * (MisraGriesSpec).
  */
final class MisraGries(val k: Int) {
  require(k >= 1, s"misra-gries needs k >= 1 counters, got $k")

  private val counters = mutable.HashMap.empty[String, Long]
  private var total = 0L

  /** Items offered so far (the partition's stream length). */
  def n: Long = total

  def offer(item: String): Unit = {
    total += 1
    counters.get(item) match {
      case Some(c) => counters.update(item, c + 1)
      case None =>
        if (counters.size < k) counters.update(item, 1L)
        else {
          // Decrement-all over a snapshot (mutating while iterating the
          // live map is undefined). Amortized O(1) per offer: each
          // decrement event costs O(k) but destroys k+1 units of counter
          // mass, and mass only enters one unit per offer.
          counters.toArray.foreach { case (g, c) =>
            if (c == 1L) counters.remove(g) else counters.update(g, c - 1)
          }
        }
    }
  }

  /** Surviving candidates — superset of items with frequency > n/(k+1).
    * Counts are NOT returned: they undercount by up to n/(k+1) and the
    * two-pass pattern recounts exactly; returning them invites misuse. */
  def candidates: Seq[String] = counters.keysIterator.toSeq

  /** Absorb another summary — Agarwal et al., PODS'12 ("Mergeable
    * Summaries", §3.1): add the counters together; if more than k
    * survive, subtract the (k+1)-th largest count from every counter and
    * drop the non-positive. The merged summary keeps the single-pass
    * guarantee over the CONCATENATED stream: each side's undercount is
    * ≤ nᵢ/(k+1) and the pivot subtraction removes ≤ (combined counter
    * mass)/(k+1) more, so total undercount ≤ (n₁+n₂)/(k+1) — any item
    * with combined frequency above that threshold still survives. This
    * is what makes the sketch a correct Catalyst partial aggregate
    * (MisraGriesAgg): Spark may merge partials in any tree shape. */
  def absorb(other: MisraGries): Unit = {
    require(other.k == k,
      s"cannot merge misra-gries summaries of different k: $k vs ${other.k}")
    other.counters.foreach { case (g, c) =>
      counters.update(g, counters.getOrElse(g, 0L) + c)
    }
    total += other.total
    if (counters.size > k) {
      val pivot = counters.values.toArray
        .sorted(Ordering[Long].reverse).apply(k)
      counters.toArray.foreach { case (g, c) =>
        if (c <= pivot) counters.remove(g) else counters.update(g, c - pivot)
      }
    }
  }

  /** Counter state for serialization (MisraGriesAgg). */
  def snapshot: Seq[(String, Long)] = counters.toSeq
}

object MisraGries {
  /** Rebuild a summary from serialized state (MisraGriesAgg.deserialize).
    * The entries must come from [[MisraGries.snapshot]] — they are counter
    * values, not raw stream items. */
  def restore(k: Int, total: Long, entries: Seq[(String, Long)]): MisraGries = {
    val mg = new MisraGries(k)
    entries.foreach { case (g, c) => mg.counters.update(g, c) }
    mg.total = total
    mg
  }
}
