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
  *     substituted. After an MV refresh, re-registering (same name) is
  *     what re-arms the rewrite; [[register]] is idempotent by name.
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

  /** A registered MV: the OPTIMIZED defining plan (the canonical match
    * target), a reader of the FINALIZED snapshot content, and the base
    * lakes pinned by BOTH committed version and manifest file-set
    * signature. The signature is what catches in-place appends and
    * dynamic partition overwrites, which change a version's content
    * WITHOUT bumping its number — data files are immutable under the
    * commit protocol, so an identical (path, bytes, rows) set is an
    * identical table.
    */
  final case class Registration(name: String, view: LogicalPlan,
      read: () => DataFrame, bases: Seq[(ObjectStoreSpec, Int, String)])

  private val registry = new ConcurrentHashMap[String, Registration]()

  /** Re-entrancy guard: optimizing the defining/snapshot plans below must
    * not re-fire this rule.
    */
  private val inRule = new ThreadLocal[java.lang.Boolean] {
    override def initialValue: java.lang.Boolean = false
  }

  /** Register (or re-register after a refresh — idempotent by name) an MV.
    * `defining` is the view's defining query over the base tables;
    * `read` must produce the FINALIZED snapshot content with the same
    * columns, positionally; `bases` are the versioned lakes the snapshot
    * was refreshed against — their CURRENT committed versions are pinned
    * as the freshness watermark, so call this only when the snapshot is
    * in fact current.
    */
  def register(name: String, defining: DataFrame, read: () => DataFrame,
      bases: Seq[ObjectStoreSpec]): Unit = {
    val pinned = bases.map { s =>
      val snaps = ObjectStoreSink.snapshots(s)
      require(snaps.nonEmpty,
        s"MV '$name': base ${s.database}.${s.table} has no committed version")
      val last = snaps.last
      val sig = fileSetSig(last.path).getOrElse(throw new IllegalStateException(
        s"MV '$name': base ${s.database}.${s.table} version " +
          s"${last.version} has no readable manifest"))
      (s, last.version, sig)
    }
    val view = withGuard(defining.queryExecution.optimizedPlan)
    registry.put(name, Registration(name, view, read, pinned)): Unit
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
