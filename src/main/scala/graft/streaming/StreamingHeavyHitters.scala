package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming HEAVY HITTERS via the SPACE-SAVING sketch (Metwally,
  * Agrawal & El Abbadi 2005, public) — the "what tokens/domains/urls are
  * trending in the ingest stream RIGHT NOW" monitor, the streaming
  * counterpart of the batch count-min verification pass (q106) and the
  * batch head-coverage curve (q127).
  *
  * Space-saving maintains at most `capacity` counters per shard. An
  * incoming item that already has a counter increments it; otherwise it
  * REPLACES the minimum counter c_min, entering with count c_min + w and
  * error bound c_min. Invariants (the paper's, testable and tested):
  *  - for a tracked item, true_count ≤ count ≤ true_count + err;
  *  - any item with true frequency > N/capacity is guaranteed tracked;
  *  - Σ counts over the sketch == N exactly (every arrival increments
  *    exactly one counter).
  *
  * Sharding: the group key is a HASH of the item modulo `shards`, so one
  * item always lands in one shard (its count is never split) and state
  * memory is `shards × capacity` counters — a fixed budget independent
  * of stream length or vocabulary. A reader unions shards and takes a
  * global top-k; per-shard N gives the per-item error certificate. This
  * is the same fixed-size-state doctrine as the batch sketches (HLL /
  * count-min, text/Sketch.scala): nothing in state grows with the data.
  *
  * Emission: Update mode — after every trigger each touched shard emits
  * its CURRENT counters (item, count, err, shard N), newest snapshot
  * wins downstream. No timeout: heavy-hitter state is the product, not
  * a session to expire; a deployment that wants decay composes this
  * with windowed restarts.
  */
object StreamingHeavyHitters {

  case class Item(shard: Int, item: String, w: Long)

  case class HHState(counts: Map[String, (Long, Long)], n: Long)

  case class HeavyHitter(shard: Int, item: String, count: Long,
                         err: Long, shard_n: Long)

  /** Shard key for an item — md5-derived so the sharding is stable
    * across runs and engines (the repo's hash doctrine), never
    * `hashCode`. */
  def shardOf(item: String, shards: Int): Int = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val h = md.digest(item.getBytes("UTF-8"))
    val v = ((h(0) & 0xffL) << 24) | ((h(1) & 0xffL) << 16) |
      ((h(2) & 0xffL) << 8) | (h(3) & 0xffL)
    (v % shards).toInt
  }

  /** One space-saving step: merge a batch of (item, weight) arrivals
    * into a bounded counter map. Deterministic victim choice: the
    * minimum count, ties broken by the lexicographically smallest item —
    * so a replayed stream rebuilds the identical sketch. */
  private[streaming] def step(state: HHState, batch: Iterator[Item],
                              capacity: Int): HHState = {
    var counts = state.counts
    var n = state.n
    batch.foreach { it =>
      n += it.w
      counts.get(it.item) match {
        case Some((c, e)) =>
          counts = counts.updated(it.item, (c + it.w, e))
        case None if counts.size < capacity =>
          counts = counts.updated(it.item, (it.w, 0L))
        case None =>
          val (victim, (cMin, _)) = counts.minBy { case (k, (c, _)) => (c, k) }
          counts = (counts - victim).updated(it.item, (cMin + it.w, cMin))
      }
    }
    HHState(counts, n)
  }

  /** The streaming transform: groupByKey on the stable shard of each
    * item, space-saving state per shard, Update-mode snapshots. */
  def heavyHitters(items: Dataset[Item], capacity: Int)
      : Dataset[HeavyHitter] = {
    implicit val enc = Encoders.product[HeavyHitter]
    implicit val stEnc = Encoders.product[HHState]
    implicit val keyEnc = Encoders.scalaInt
    items.groupByKey(_.shard)
      .flatMapGroupsWithState[HHState, HeavyHitter](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (shard: Int, rows: Iterator[Item], gs: GroupState[HHState]) =>
          val prev = gs.getOption.getOrElse(HHState(Map.empty, 0L))
          val next = step(prev, rows, capacity)
          gs.update(next)
          next.counts.iterator.map { case (item, (c, e)) =>
            HeavyHitter(shard, item, c, e, next.n)
          }
      }
  }
}
