package graft.queries

import java.util.concurrent.ConcurrentHashMap
import org.apache.spark.sql.SparkSession

/** Shared hygiene for the per-(session, dir) artifact caches
  * ([[AnalyticsQueries]] graphs, [[TextQueries]] shingle sets,
  * [[MiningQueries]] winnowing fingerprints, [[SketchQueries]] vector
  * training chain): entries hold eagerly `localCheckpoint`ed blocks
  * whose storage dies WITH the owning SparkSession's context — keeping
  * the keys after the session stops pins dead references (and
  * corpus-sized driver-held lineage) for the process lifetime. Each
  * cache accessor calls [[purgeStopped]] first: O(#entries) with a
  * handful of entries, and exact — a stopped context is precisely the
  * moment the cached values became unusable anyway.
  *
  * (Within ONE long-lived session the entries are still immortal by
  * design — that is the driver's one-process contract; a multi-tenant
  * service would additionally evict on corpus-version change and
  * persist artifacts to storage, the [[graft.ext.VectorIndexStore]]
  * path.)
  */
private[queries] object SessionCaches {

  /** Drop every entry whose key's SparkSession has a stopped context.
    * `session` extracts the session from the cache key (keys are
    * tuples of differing arity across the caches). Safe concurrently:
    * ConcurrentHashMap iterators support removal and never throw. */
  def purgeStopped[K, V](m: ConcurrentHashMap[K, V])(
      session: K => SparkSession): Unit = {
    val it = m.keySet.iterator()
    while (it.hasNext) {
      if (session(it.next()).sparkContext.isStopped) it.remove()
    }
  }

  private val registered =
    new java.util.concurrent.CopyOnWriteArrayList[() => Unit]()

  /** Enroll a cache in the engine-wide clear ([[clearRegistered]]).
    * Every per-(session, dir) artifact cache registers at declaration,
    * so "cold caches" is one call that cannot silently miss a module —
    * the invariant [[RegistryRoots]] depends on: a registry artifact is
    * only ever re-published after ALL publish caches dropped together
    * with the root they published into. */
  def registerMap[K, V](m: ConcurrentHashMap[K, V]): ConcurrentHashMap[K, V] = {
    registered.add(() => m.clear())
    m
  }

  /** Clear every registered cache AND allocate a fresh registry root on
    * next use — the engine-wide cold-cache hook behind
    * [[SketchQueries.vecCacheClear]]. */
  def clearRegistered(): Unit = {
    registered.forEach(_.apply())
    RegistryRoots.reset()
  }
}
