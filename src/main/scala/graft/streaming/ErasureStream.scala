package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming._

/** Streaming right-to-be-forgotten: the in-flight twin of
  * `RelationalJobs.erasureAudit`. A tagged union of profile events and
  * erase commands (the TxMatchStream connect pattern) drives one keyed
  * state machine per user:
  *
  *  - "event": upsert the running profile (min first-seen, count, exact
  *    cent sum — all order-insensitive) and emit the updated profile row,
  *    UNLESS the user is tombstoned, in which case the row is dropped
  *    SILENTLY (suppression, never re-materialization — the GDPR
  *    contract: late or replayed data for an erased user must not rebuild
  *    a profile, and emitting anything for it would itself leak).
  *  - "erase": clear the profile state, emit a purge ack carrying what
  *    was deleted, and retain ONLY a tombstone marker (minimal metadata —
  *    the suppression list every real deletion pipeline keeps).
  *
  * Within a micro-batch, events apply BEFORE an erase command for the
  * same key, so the ack deterministically accounts for everything seen up
  * to and including its batch; arrival batching otherwise cannot change
  * any emitted value (every profile field is order-insensitive, the
  * ProfileStream contract). TimeMode.None — no timers: a tombstone has no
  * expiry, exactly like the batch cohort predicate.
  *
  * Requires the RocksDB state store provider (multiple column families).
  */
object ErasureStream {

  /** kind: "event" or "erase"; us/event_id/cents only read for events. */
  case class In(user_id: Long, kind: String, us: Long, event_id: Long,
      cents: Long)

  /** kind: "profile" (live upsert) or "purge_ack" (n_events/sum_cents =
    * what was deleted; first_us = tombstone batch's floor marker 0 when
    * nothing existed). A third kind never exists: suppressed events emit
    * NOTHING — silence is the contract.
    */
  case class Out(user_id: Long, kind: String, first_us: Long,
      n_events: Long, sum_cents: Long)

  private case class Profile(first_us: Long, n_events: Long, sum_cents: Long)

  class Processor extends StatefulProcessor[Long, In, Out] {
    @transient private var profile: ValueState[Profile] = _
    @transient private var tombstoned: ValueState[Boolean] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      profile = getHandle.getValueState[Profile](
        "profile", Encoders.product[Profile], TTLConfig.NONE)
      tombstoned = getHandle.getValueState[Boolean](
        "tombstoned", Encoders.scalaBoolean, TTLConfig.NONE)
    }

    override def handleInputRows(user: Long, rows: Iterator[In],
        timerValues: TimerValues): Iterator[Out] = {
      // Match both kinds EXPLICITLY: an unknown kind must be dropped, not
      // fall into the erase branch (a malformed record would otherwise
      // silently tombstone the user forever).
      val all = rows.toSeq
      val events = all.filter(_.kind == "event")
      val erases = all.filter(_.kind == "erase")
      if (tombstoned.exists() && tombstoned.get()) return Iterator.empty
      // events first — the ack accounts for everything seen this batch.
      // Fold locally, write state ONCE: m events = 1 RocksDB put, not m.
      val changed = events.nonEmpty
      if (changed) {
        val p0 = if (profile.exists()) profile.get()
                 else Profile(Long.MaxValue, 0L, 0L)
        profile.update(events.foldLeft(p0) { (p, e) =>
          Profile(math.min(p.first_us, e.us),
            p.n_events + 1L, p.sum_cents + e.cents)
        })
      }
      if (erases.nonEmpty) {
        val p = if (profile.exists()) profile.get() else Profile(0L, 0L, 0L)
        profile.clear()
        tombstoned.update(true)
        Iterator.single(Out(user, "purge_ack", p.first_us, p.n_events,
          p.sum_cents))
      } else if (changed) {
        val p = profile.get()
        Iterator.single(Out(user, "profile", p.first_us, p.n_events,
          p.sum_cents))
      } else Iterator.empty
    }
  }

  /** Tagged-union input (see [[In]]) → profile upserts + purge acks. */
  def erasure(in: Dataset[In]): Dataset[Out] = {
    import in.sparkSession.implicits._
    in.groupByKey(_.user_id)
      .transformWithState(new Processor, TimeMode.None(), OutputMode.Update())
  }
}

/** Deletion propagation to downstream aggregates — the retract-stream leg
  * of [[ErasureStream]]. `Sinks.retractBatches` diffs rows that ARRIVE,
  * so a key that silently disappears never retracts; an erasure is exactly
  * that disappearance, and GDPR requires the user's contribution to leave
  * every derived table, not just the profile store. This foreachBatch
  * handler maintains the live per-user profile table plus a per-bucket
  * rollup and emits the Flink-style changelog: a purge ack retracts the
  * old bucket row and adds the recomputed one — or retracts WITHOUT a
  * re-add when the bucket empties (the case the plain diff can never
  * produce).
  *
  * Driver-side maps are bounded by live users and buckets — the same
  * memory contract as `retractBatches`' previous-result map (retract
  * streams decorate RESULT tables, never the corpus).
  */
object ErasureRollup {

  case class BucketAgg(bucket: Long, n_users: Long, n_events: Long,
      sum_cents: Long)

  /** foreachBatch handler over [[ErasureStream.erasure]]'s output. */
  def handler(buckets: Long)(emit: (Boolean, BucketAgg) => Unit)
      : (Dataset[ErasureStream.Out], Long) => Unit = {
    val current =
      scala.collection.mutable.HashMap.empty[Long, (Long, Long)]
    val prevAgg = scala.collection.mutable.HashMap.empty[Long, BucketAgg]
    (batch: Dataset[ErasureStream.Out], _: Long) => {
      val touched = scala.collection.mutable.Set.empty[Long]
      batch.collect().foreach { o =>
        val b = java.lang.Math.floorMod(o.user_id, buckets)
        o.kind match {
          case "profile" =>
            current(o.user_id) = (o.n_events, o.sum_cents); touched += b
          case "purge_ack" =>
            if (current.remove(o.user_id).nonEmpty) touched += b
          case _ => ()
        }
      }
      // ONE pass over the live-user table, grouped by bucket — per-bucket
      // filtering would rescan all U users for each of the k touched
      // buckets (O(k·U) per micro-batch instead of O(U))
      val byBucket = current.groupBy { case (u, _) =>
        java.lang.Math.floorMod(u, buckets) }
      touched.toSeq.sorted.foreach { b =>
        val next = byBucket.get(b).map { m =>
          BucketAgg(b, m.size.toLong, m.values.map(_._1).sum,
            m.values.map(_._2).sum)
        }
        (prevAgg.get(b), next) match {
          case (Some(o), Some(n)) if o == n => ()
          case (Some(o), Some(n)) =>
            emit(false, o); emit(true, n); prevAgg(b) = n
          case (Some(o), None) => emit(false, o); prevAgg.remove(b)
          case (None, Some(n)) => emit(true, n); prevAgg(b) = n
          case (None, None) => ()
        }
      }
    }
  }
}
