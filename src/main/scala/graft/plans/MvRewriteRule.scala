package graft.plans

import java.util.concurrent.ConcurrentHashMap

import scala.jdk.CollectionConverters._

import graft.model.ObjectStoreSpec
import graft.sinks.ObjectStoreSink
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.Alias
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule

/** Materialized-view query rewrite: a query subtree that provably computes
  * the same result as a registered MV's defining query is answered from
  * the maintained snapshot instead of the base tables — zero base-table
  * scan tasks for repeated analytics, the planner-seam twin of the
  * engine's incremental-aggregate maintenance
  * ([[graft.operators.IncrementalAgg]] keeps the snapshot current at
  * delta cost; this rule makes queries USE it without the user knowing
  * the snapshot exists). Warehouses the reference delegated to do exactly
  * this (Redshift auto-rewrite, BigQuery smart tuning); Spark itself only
  * matches `sameResult` against in-memory cache entries (CacheManager) —
  * this extends the same proof to durable, incrementally-maintained
  * snapshots.
  *
  * Soundness gates, all of which refuse (leave the plan untouched) rather
  * than guess:
  *   - RESULT IDENTITY: the subtree must `sameResult` the registered
  *     defining plan — Spark's canonicalized-plan equivalence, the exact
  *     proof CacheManager trusts for cached-data substitution. Both sides
  *     are OPTIMIZED plans, so cosmetic differences (aliases, projection
  *     order, exprIds) normalize away while semantic ones don't.
  *   - FRESHNESS: registration pins every base table's committed version;
  *     the rule re-reads the lakes' current committed versions at plan
  *     time and refuses if ANY base moved — a stale snapshot is never
  *     substituted. A refresh re-arms the rewrite through
  *     [[refreshed]] (or the two-phase [[beginRefresh]] /
  *     [[completeRefresh]]): the watermark is captured BEFORE the refresh
  *     reads base data, so concurrent appends only ever make the pin
  *     conservative, never stale. [[register]] stays idempotent by name
  *     for manual re-arming.
  *   - SHAPE: the snapshot read must match the subtree's output
  *     positionally in arity and exact data types. Nullability the
  *     round-trip widened (parquet reads back nullable) is restored with
  *     an AssertNotNull runtime check — a corrupted snapshot fails
  *     loudly, never silently. The substitute is a Project aliasing
  *     snapshot columns onto the subtree's output exprIds, so parents
  *     re-resolve exactly.
  *
  * At 100 TB the economics are the point: the defining query scans the
  * lake; the rewritten query reads a snapshot thousands of times smaller,
  * kept current by delta maintenance — repeated dashboards cost O(answer)
  * instead of O(data).
  */
object MvRewriteRule extends Rule[LogicalPlan] {

  /** A registered MV: the defining-query THUNK (re-resolved to derive the
    * canonical match target after every refresh — a base commit repoints
    * the catalog at a new version dir, so the optimized plan must be
    * re-derived against the current resolution or `sameResult` can never
    * match again), the OPTIMIZED defining plan, a reader of the FINALIZED
    * snapshot content, and the base lakes pinned by BOTH committed
    * version and manifest file-set signature. The signature is what
    * catches in-place appends and dynamic partition overwrites, which
    * change a version's content WITHOUT bumping its number — data files
    * are immutable under the commit protocol, so an identical (path,
    * bytes, rows) set is an identical table.
    */
  final case class Registration(name: String, defining: () => DataFrame,
      view: LogicalPlan, read: () => DataFrame,
      bases: Seq[(ObjectStoreSpec, Int, String)])

  /** A captured freshness watermark — see [[beginRefresh]]. */
  type Pin = Seq[(ObjectStoreSpec, Int, String)]

  private val registry = new ConcurrentHashMap[String, Registration]()

  /** Re-entrancy guard: optimizing the defining/snapshot plans below must
    * not re-fire this rule.
    */
  private val inRule = new ThreadLocal[java.lang.Boolean] {
    override def initialValue: java.lang.Boolean = false
  }

  /** Register (or re-register after a refresh — idempotent by name) an MV.
    * `defining` is a THUNK of the view's defining query over the base
    * tables (a thunk, not a plan, so [[completeRefresh]] can re-resolve it
    * against the catalog's current version dirs); `read` must produce the
    * FINALIZED snapshot content with the same columns, positionally;
    * `bases` are the versioned lakes the snapshot was refreshed against —
    * their CURRENT committed versions are pinned as the freshness
    * watermark, so call this only when the snapshot is in fact current.
    */
  def register(name: String, defining: () => DataFrame,
      read: () => DataFrame, bases: Seq[ObjectStoreSpec]): Unit = {
    val pinned = pinBases(name, bases)
    val view = withGuard(defining().queryExecution.optimizedPlan)
    registry.put(name, Registration(name, defining, view, read, pinned)): Unit
  }

  /** Materialized-plan convenience overload — refresh re-arming
    * ([[completeRefresh]]) will then keep refusing (a captured DataFrame
    * can't be re-resolved), so long-lived MVs should pass the thunk form.
    */
  def register(name: String, defining: DataFrame, read: () => DataFrame,
      bases: Seq[ObjectStoreSpec]): Unit =
    register(name, () => defining, read, bases)

  private def pinBases(name: String,
      bases: Seq[ObjectStoreSpec]): Pin =
    bases.map { s =>
      val snaps = ObjectStoreSink.snapshots(s)
      require(snaps.nonEmpty,
        s"MV '$name': base ${s.database}.${s.table} has no committed version")
      val last = snaps.last
      val sig = fileSetSig(last.path).getOrElse(throw new IllegalStateException(
        s"MV '$name': base ${s.database}.${s.table} version " +
          s"${last.version} has no readable manifest"))
      (s, last.version, sig)
    }

  /** Capture the registered bases' CURRENT committed versions as the
    * watermark an in-flight refresh will re-arm with. MUST be called
    * BEFORE the refresh body reads any base data — then a concurrent
    * append can only land AFTER the capture, the refreshed snapshot
    * reflects at-least the captured content, and a query-time base
    * version NEWER than the pin refuses (conservative, never stale).
    * Capturing after the read would invert that: the pin could claim a
    * version whose late-arriving files the snapshot never saw.
    */
  def beginRefresh(name: String): Pin = {
    val r = Option(registry.get(name)).getOrElse(throw new NoSuchElementException(
      s"MV '$name' is not registered"))
    pinBases(name, r.bases.map(_._1))
  }

  /** Re-arm the rewrite after a successful refresh: swap in the pin
    * captured by [[beginRefresh]] and re-derive the canonical defining
    * plan against the catalog's CURRENT resolution (the refresh commit
    * repointed version dirs, so the old optimized plan can never
    * `sameResult` a new query again). Call only after the refresh body
    * committed the snapshot successfully.
    */
  def completeRefresh(name: String, pin: Pin): Unit =
    Option(registry.get(name)).foreach { r =>
      val view = withGuard(r.defining().queryExecution.optimizedPlan)
      registry.put(name, r.copy(view = view, bases = pin)): Unit
    }

  /** Refresh-and-re-arm sugar: capture the watermark, run the caller's
    * refresh body (which must bring the snapshot up to date with
    * everything committed at capture time — reading the bases' live
    * state inside the body satisfies that), then re-arm. The rewrite
    * never lapses across refreshes and never fires stale: an append
    * landing mid-body leaves the query-time version ahead of the pin,
    * which refuses until the next refresh.
    */
  def refreshed[T](name: String)(body: => T): T = {
    val pin = beginRefresh(name)
    val out = body
    completeRefresh(name, pin)
    out
  }

  def deregister(name: String): Unit = registry.remove(name): Unit

  def registered: Seq[String] = registry.keySet().asScala.toSeq.sorted

  private[plans] def registration(name: String): Option[Registration] =
    Option(registry.get(name))

  private[plans] def isFresh(r: Registration): Boolean = fresh(r)

  private def withGuard[T](body: => T): T = {
    inRule.set(true)
    try body finally inRule.set(false)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (registry.isEmpty || inRule.get || conf.getConfString(
        "spark.graft.mvRewrite.enabled", "true") != "true") return plan
    plan.transformDown {
      case p =>
        registry.values.asScala
          .collectFirst(Function.unlift(r => substitute(p, r)))
          .getOrElse(p)
    }
  }

  private def substitute(p: LogicalPlan,
      r: Registration): Option[LogicalPlan] =
    try {
      if (!p.sameResult(r.view) || !fresh(r)) None
      else {
        val mv = withGuard(r.read().queryExecution.optimizedPlan)
        if (mv.output.size != p.output.size ||
          mv.output.zip(p.output).exists { case (s, t) =>
            s.dataType != t.dataType })
          None
        else Some(Project(p.output.zip(mv.output).map { case (tgt, src) =>
          // a snapshot round-trip widens nullability (parquet columns
          // read back nullable even for count(*) results); the values
          // cannot actually be null — AssertNotNull restores the
          // output contract with a RUNTIME check instead of a metadata
          // lie, so a corrupted snapshot fails loudly, never silently
          val e =
            if (src.nullable && !tgt.nullable)
              org.apache.spark.sql.catalyst.expressions.objects
                .AssertNotNull(src)
            else src
          Alias(e, tgt.name)(exprId = tgt.exprId) }, mv))
      }
    } catch { case _: Exception => None } // refusal, never a guess

  /** Every pinned base lake is still at the version AND exact file set
    * the snapshot was refreshed against — the signature catches in-place
    * appends and partition overwrites that keep the version number. Any
    * move, or any doubt (missing versions, unreadable manifests),
    * refuses.
    */
  private def fresh(r: Registration): Boolean =
    r.bases.forall { case (spec, v, sig) =>
      ObjectStoreSink.snapshots(spec).lastOption.exists(s =>
        s.version == v && fileSetSig(s.path).contains(sig))
    }

  /** Content identity of a committed version at file granularity: data
    * files are immutable, so the sorted (path, bytes, rows) set IS the
    * table content.
    */
  private def fileSetSig(versionPath: String): Option[String] =
    graft.sinks.TableManifest.read(java.nio.file.Paths.get(versionPath))
      .map(_.files.map(f => s"${f.path}:${f.bytes}:${f.rows}")
        .sorted.mkString("\n"))
}
