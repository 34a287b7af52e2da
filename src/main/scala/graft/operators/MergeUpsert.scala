package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Join-based MERGE upsert: matched rows take the source's values, unmatched
  * target rows are carried over, unmatched source rows are inserted.
  *
  * Re-expresses the reference's delegated MERGE shapes
  * (reference: IcebergUtil.scala:124-157 buildMergeIntoSql,
  * SnowflakeLoader.scala:233-291, RedshiftLoader.scala:149-184
  * delete+insert) as one Spark plan: a single full-outer shuffle join on the
  * key columns plus column-wise resolve — no external SQL engine.
  *
  * Scale: one shuffle of each side hashed on `keys`. When the update batch is
  * small relative to the target (the common CDC case), prefer
  * [[MergeUpsert.viaAnti]] which broadcasts the source key set.
  */
object MergeUpsert {

  def apply(target: DataFrame, source: DataFrame, keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "MERGE requires at least one key column")
    val t = target.alias("t")
    val s = source.alias("s")
    val cond = keys.map(k => col(s"t.$k") <=> col(s"s.$k")).reduce(_ && _)
    val cols = target.columns.map { c =>
      coalesce(col(s"s.$c"), col(s"t.$c")).as(c)
    }
    // NOTE: coalesce-resolve means a source row cannot set a matched row's
    // non-key column to NULL; the reference's MERGE has the same effective
    // behavior for its CSV-sourced updates (empty string, not NULL). A
    // null-overwriting variant would use a marker column instead:
    //   when(col("s._present"), col(s"s.$c")).otherwise(col(s"t.$c"))
    t.join(s, cond, "full_outer").select(cols.toIndexedSeq: _*)
  }

  /** Anti-join + union variant (reference J3 delete+insert shape,
    * RedshiftLoader.scala:149-184): keep target rows whose key is absent from
    * the source, then append all source rows. The source side is typically a
    * small batch → Spark broadcasts it and the 100 TB target never shuffles.
    *
    * NULL-key semantics differ from [[apply]] BY DESIGN: the anti-join uses
    * SQL equality (a NULL key never matches), exactly like the
    * `DELETE ... WHERE key IN (SELECT key FROM source)` it re-expresses —
    * a NULL-key target row survives and a NULL-key source row appends a
    * second row, where [[apply]]'s `<=>` join would merge them. Matched
    * rows also take the source row WHOLE (no per-column coalesce): a NULL
    * source attribute overwrites, as delete+insert semantics demand.
    */
  def viaAnti(target: DataFrame, source: DataFrame, keys: Seq[String]): DataFrame = {
    val sKeys = broadcast(source.select(keys.map(col).toIndexedSeq: _*).distinct())
    target.join(sKeys, keys, "left_anti").unionByName(source)
  }

  /** SQL `MERGE INTO` semantics (ANSI / the reference's generated shape,
    * IcebergUtil.scala:124-157): matched target rows take the UPDATE SET
    * assignments (a NULL source attribute OVERWRITES — unlike [[apply]]'s
    * coalesce resolve), unmatched source rows insert per the INSERT
    * clause, unmatched target rows carry over. Equality on the ON keys is
    * SQL equality: a NULL key never matches (both sides' NULL-key rows
    * survive/insert independently).
    *
    * `keys` are the ON equi-conjuncts as (targetCol, sourceCol); `setExprs`
    * maps a target column to its matched-row value (columns absent keep
    * the target's value; pass every column ↦ `s.col` for `UPDATE SET *`);
    * `insertExprs` maps a target column to its not-matched value (absent
    * columns insert NULL; every column ↦ `s.col` is `INSERT *`). Values
    * are cast to the target column's type — the MERGE contract that the
    * table schema never drifts.
    *
    * Standard-SQL cardinality: a target row matched by MORE THAN ONE
    * source row is an error, enforced by [[requireSingleMatch]] (one
    * source-sized aggregation in the happy path — the precise
    * target-probing check runs only when the source actually has
    * duplicate key tuples).
    *
    * Scale: one equi-join hashed on the ON keys (AQE broadcasts a small
    * source), plus the source-sized cardinality aggregation. The 100 TB
    * target shuffles at most once; with a broadcast source it never does.
    */
  def sqlMerge(target: DataFrame, source: DataFrame,
      tAlias: String, sAlias: String, keys: Seq[(String, String)],
      setExprs: Map[String, Column], insertExprs: Map[String, Column]): DataFrame =
    sqlMergeClauses(target, source, tAlias, sAlias, keys, Seq(
      MergeWhen(Matched, None, UpdateAction(setExprs)),
      MergeWhen(NotMatchedByTarget, None, InsertAction(insertExprs))))

  /** Which join-result category a `WHEN` clause applies to. */
  sealed trait MergeKind
  case object Matched extends MergeKind
  case object NotMatchedByTarget extends MergeKind // plain `NOT MATCHED`
  case object NotMatchedBySource extends MergeKind

  /** What an applicable clause does: update the target row's columns
    * (absent columns keep their value), delete it, or — for not-matched-
    * by-target rows — insert per the value map (absent columns NULL).
    */
  sealed trait MergeAction
  final case class UpdateAction(set: Map[String, Column]) extends MergeAction
  case object DeleteAction extends MergeAction
  final case class InsertAction(values: Map[String, Column]) extends MergeAction

  /** One `WHEN … [AND cond] THEN action` clause. `cond` evaluates on the
    * joined row (a NULL condition is not-applicable, SQL semantics); for
    * not-matched-by-target rows the target side is all-NULL and vice
    * versa, exactly as ANSI scopes the clause conditions.
    */
  final case class MergeWhen(kind: MergeKind, cond: Option[Column],
      action: MergeAction)

  // NOTE on cardinality: a target row matched by MORE THAN ONE source row
  // errors REGARDLESS of which clause kinds are present (strict — ANSI
  // requires the error only when an update/delete would apply twice, but
  // the join-shaped plan would otherwise CARRY the multiply-matched
  // target row once per partner, and silently duplicating a row is worse
  // than a loud refusal). Duplicate source keys matching NO target row
  // remain legal and insert per-row, as SQL specifies.

  /** Full ANSI `MERGE INTO` clause semantics (generalizing the fixed
    * matched-update + not-matched-insert pair the reference generated,
    * IcebergUtil.scala:124-157): within each category, clauses apply IN
    * ORDER — the first whose condition is TRUE fires; a row no clause
    * fires for carries over (matched / target-only) or is discarded
    * (source-only). `WHEN MATCHED … DELETE` drops the row; `WHEN NOT
    * MATCHED BY SOURCE` reaches target rows with NO join partner.
    * Cardinality: a target row matched by >1 source row always errors
    * ([[requireSingleMatch]] — see the strictness note on [[MergeWhen]]).
    *
    * Scale: still ONE equi-join hashed on the ON keys plus a single
    * projection — the clause chain compiles to a branch-index column
    * (`when` chain, first-true-wins) and per-column conditionals, all
    * codegen'd; no extra shuffle, no per-clause pass.
    */
  def sqlMergeClauses(target: DataFrame, source: DataFrame,
      tAlias: String, sAlias: String, keys: Seq[(String, String)],
      clauses: Seq[MergeWhen]): DataFrame = {
    require(keys.nonEmpty, "MERGE requires at least one ON equi-key")
    require(clauses.nonEmpty, "MERGE requires at least one WHEN clause")
    clauses.foreach {
      case MergeWhen(NotMatchedByTarget, _, _: InsertAction) => ()
      case MergeWhen(NotMatchedByTarget, _, a) => throw new IllegalArgumentException(
        s"WHEN NOT MATCHED [BY TARGET] supports only INSERT, got $a")
      case MergeWhen(_, _, _: InsertAction) => throw new IllegalArgumentException(
        "INSERT is only valid in WHEN NOT MATCHED [BY TARGET] clauses")
      case _ => ()
    }
    requireSingleMatch(target, source, keys)
    val tm = "_graft_merge_t"
    val sm = "_graft_merge_s"
    val act = "_graft_merge_a"
    val t = target.withColumn(tm, lit(true)).alias(tAlias)
    val s = source.withColumn(sm, lit(true)).alias(sAlias)
    val joinCond = keys.map { case (tk, sk) =>
      col(s"$tAlias.$tk") === col(s"$sAlias.$sk") }.reduce(_ && _)
    val matched = col(s"$tAlias.$tm").isNotNull && col(s"$sAlias.$sm").isNotNull
    val srcOnly = col(s"$tAlias.$tm").isNull
    val tgtOnly = col(s"$sAlias.$sm").isNull
    def catOf(k: MergeKind): Column = k match {
      case Matched => matched
      case NotMatchedByTarget => srcOnly
      case NotMatchedBySource => tgtOnly
    }
    // first-applicable clause index; -1 = carry the target row, -2 = a
    // source-only row no insert clause fired for (discard, ANSI)
    val actionIdx = clauses.zipWithIndex.foldLeft(
      when(lit(false), lit(-1))) { case (acc, (c, i)) =>
        val applicable = c.cond.fold(catOf(c.kind))(cc =>
          catOf(c.kind) && coalesce(cc, lit(false)))
        acc.when(applicable, lit(i))
      }
      .otherwise(when(srcOnly, lit(-2)).otherwise(lit(-1)))
    val dropIdxs = clauses.zipWithIndex.collect {
      case (MergeWhen(_, _, DeleteAction), i) => i
    } :+ -2
    val out = target.schema.fields.map { f =>
      val keep = col(s"$tAlias.${f.name}")
      clauses.zipWithIndex.foldLeft(when(lit(false), keep)) {
        case (acc, (c, i)) =>
          val v = c.action match {
            case UpdateAction(set) => set.getOrElse(f.name, keep)
            case InsertAction(values) => values.getOrElse(f.name, lit(null))
            case DeleteAction => keep // the row is dropped below
          }
          acc.when(col(act) === i, v)
      }.otherwise(keep).cast(f.dataType).as(f.name)
    }
    t.join(s, joinCond, "full_outer")
      .withColumn(act, actionIdx)
      .where(!col(act).isin(dropIdxs: _*))
      .select(out.toIndexedSeq: _*)
  }

  /** ANSI MERGE cardinality guard: error when any target row would be
    * matched by more than one source row. Cheap-first: duplicate key
    * tuples in the SOURCE are a necessary condition (with equi-ON), so the
    * happy path costs one source-sized aggregation; only a source that
    * actually carries duplicates pays the precise probe against the
    * target (duplicate source keys that match NO target row are legal —
    * they simply insert multiple rows, as SQL specifies). NULL source
    * keys never match, so they are exempt.
    */
  private def requireSingleMatch(target: DataFrame, source: DataFrame,
      keys: Seq[(String, String)]): Unit = {
    val sCols = keys.map(_._2)
    val dups = source
      .na.drop(sCols) // NULL keys never match — exempt from the guard
      .groupBy(sCols.map(col).toIndexedSeq: _*)
      .agg(count(lit(1)).as("_graft_merge_n"))
      .filter(col("_graft_merge_n") > 1).drop("_graft_merge_n")
    if (dups.limit(1).count() == 0) return
    val joinCond = keys.map { case (tk, sk) =>
      col(s"_mt.$tk") === col(s"_md.$sk") }.reduce(_ && _)
    val clash = target.alias("_mt")
      .join(broadcast(dups.alias("_md")), joinCond, "left_semi")
      .limit(1).count()
    if (clash > 0) throw new IllegalStateException(
      "MERGE cardinality violation: a target row is matched by more than " +
        s"one source row on keys ${keys.map(_._2).mkString(", ")} — ANSI " +
        "MERGE requires at most one match per target row")
  }
}
