package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Scoped lifetime for persisted intermediate tables.
  *
  * A query whose plan reuses a subtree >= 2 times must persist it (Catalyst
  * folds shared subtrees into each consumer differently, so ReuseExchange
  * never fires — see q74). But a bare `.persist()` inside a query-builder
  * leaks: the handle is unreachable after the builder returns, and repeated
  * invocations in a long-lived session stack dead cached tables that compete
  * with execution memory.
  *
  * This registry bounds residency to ONE live generation per scope key:
  * rebuilding a scope releases everything its previous build persisted. The
  * final generation is released by the next rebuild or by
  * `spark.catalog.clearCache()` (Bench does it per run; Verify per query).
  */
object CacheScope {
  private val live = scala.collection.concurrent.TrieMap.empty[String, List[DataFrame]]

  /** Unpersist everything registered under `key` (no-op if nothing is). */
  def release(key: String): Unit =
    live.remove(key).foreach(_.foreach { df =>
      try df.unpersist(blocking = false) catch { case _: Throwable => () }
    })

  /** Persist `df` and register it under `key`. Call [[release]](key) at the
    * top of the scope so the previous generation is freed first.
    */
  def persist(key: String, df: DataFrame,
              level: StorageLevel = StorageLevel.MEMORY_AND_DISK): DataFrame = {
    df.persist(level)
    live.updateWith(key)(cur => Some(df :: cur.getOrElse(Nil)))
    df
  }
}
