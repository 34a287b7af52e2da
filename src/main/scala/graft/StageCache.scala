package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Session-scoped ROLLING stage cache for fixture queries that persist
  * mid-plan stages consumed by several downstream branches (dedup shingle
  * arrays, hash tables, bigram occurrences, domain sketches).
  *
  * `df.persist` registers the plan in the session's CacheManager, which
  * holds a STRONG reference — and a query that RETURNS its plan to the
  * caller cannot unpersist inside its own body, because the caller has
  * not executed the plan yet. Without rolling, every Bench repeat
  * therefore leaked a full corpus-sized cache generation (new DataFrame
  * objects → new cache entries, never collected: the ContextCleaner only
  * frees blocks of GC'd RDDs, and CacheManager pins these), and the
  * block manager filled until neighboring queries evicted and spilled
  * nondeterministically — the q_containment_pairs 5× bench swings that
  * recurred across rounds 11-13.
  *
  * [[roll]] is the [[Scratch.fresh]] discipline applied to cache:
  * registering generation N for a tag unpersists generation N-1
  * (non-blocking). Safe because per-tag callers are sequential and have
  * fully consumed the prior invocation's plan before building a new one
  * (Bench collects each repeat's result before invoking the next; Verify
  * runs a query once) — so at most ONE live generation per query ever
  * occupies the block manager.
  */
object StageCache {

  /** Keyed by (session, tag) so two live sessions running the same query
    * concurrently cannot unpersist each other's in-use generation, and
    * WEAKLY on the session so a stopped session's entries (and,
    * transitively, its DataFrames' SparkSession graph) never pin memory
    * process-wide — the r14 ADVICE on the old tag-only global map. The
    * per-(session, tag) sequential-caller assumption is unchanged.
    */
  private val lastForTag = new java.util.WeakHashMap[
    org.apache.spark.sql.SparkSession,
    java.util.concurrent.ConcurrentHashMap[String, Seq[DataFrame]]]()

  /** Persist `dfs` (MEMORY_AND_DISK) as `tag`'s current cache generation,
    * unpersisting the previous generation. Call AFTER the stage plans are
    * built and BEFORE the composed plan is returned — cache substitution
    * happens at execution time, so every downstream branch picks the
    * persisted stage up regardless of construction order.
    */
  def roll(tag: String, dfs: DataFrame*): Unit = {
    if (dfs.isEmpty) return
    val session = dfs.head.sparkSession
    val perSession = lastForTag.synchronized {
      var m = lastForTag.get(session)
      if (m == null) {
        m = new java.util.concurrent.ConcurrentHashMap[String, Seq[DataFrame]]()
        lastForTag.put(session, m): Unit
      }
      m
    }
    Option(perSession.put(tag, dfs.toSeq)).foreach(_.foreach { prev =>
      try prev.unpersist(blocking = false)
      catch { case _: Exception => () } // a dead session's entry: ignore
    })
    dfs.foreach(_.persist(StorageLevel.MEMORY_AND_DISK): Unit)
  }
}
