package graft.ops

import org.apache.spark.sql.Dataset
import scala.collection.mutable

/** Structured lifecycle for operator-internal caches.
  *
  * Operators like [[Dedup.jaccardPairs]] or [[Similarity.withinCellPairs]]
  * cache small derived frames (signatures, membership maps, hashed gram
  * sets) that several branches of one query plan consume. Under a
  * one-query-then-`clearCache` harness that is free; in a long-lived
  * session composing many pipeline stages, each stage's dead caches
  * accumulate executor storage memory until eviction pressure hurts live
  * ones. A `CacheScope` makes the lifecycle explicit: every internal
  * `.cache()` registers with the scope, and `close()` releases them all.
  *
  * Loan pattern — materialize INSIDE the scope, then close:
  * {{{
  * val pairs = CacheScope.scoped { scope =>
  *   Dedup.jaccardPairs(docs, 2, 0.35, scope).collect()
  * } // all operator-internal caches released here
  * }}}
  *
  * `close()` only unpersists — plans built inside the scope stay valid
  * afterwards but recompute from source, so actions (write/collect/count)
  * belong inside the scope body. Frames whose lineage was TRUNCATED
  * (`localCheckpoint`) must never be scope-owned: unpersisting them breaks
  * recomputation instead of merely un-caching it (which is why
  * [[Dedup.connectedComponents]] manages its iteration caches internally).
  *
  * Every operator parameter defaults to [[CacheScope.unmanaged]] — cache
  * and never track — which is exactly the pre-scope behavior, so existing
  * call sites are unchanged.
  */
final class CacheScope private[ops] (track: Boolean) {
  private val owned = mutable.ArrayBuffer.empty[Dataset[_]]

  /** Cache `df` and (in tracking scopes) register it for release. */
  def cache[A](df: Dataset[A]): Dataset[A] = {
    if (track) synchronized { owned += df }
    df.cache()
  }

  /** How many owned frames are currently materialized as cached — the
    * observable contract `close()` drives to zero (and what a lifecycle
    * test should assert, rather than global session cache counts that
    * other concurrently-running work can perturb).
    */
  def liveOwnedCaches: Int = synchronized {
    owned.count(_.storageLevel != org.apache.spark.storage.StorageLevel.NONE)
  }

  /** Release every owned cache (non-blocking unpersist). Idempotent —
    * the owned list is retained (unpersist twice is a no-op) so
    * [[liveOwnedCaches]] stays observable after close.
    */
  def close(): Unit = synchronized {
    owned.foreach(_.unpersist())
  }
}

object CacheScope {

  /** The no-release scope: frames cache as always and stay cached until
    * `spark.catalog.clearCache()` (the driver harness does this between
    * queries). Holds no references, so it is safe as a global default.
    */
  val unmanaged: CacheScope = new CacheScope(track = false)

  /** A fresh tracking scope — pair every `apply()` with a `close()`. */
  def apply(): CacheScope = new CacheScope(track = true)

  /** Loan wrapper: run `f` with a fresh scope, always close it. */
  def scoped[A](f: CacheScope => A): A = {
    val s = apply()
    try f(s) finally s.close()
  }
}
