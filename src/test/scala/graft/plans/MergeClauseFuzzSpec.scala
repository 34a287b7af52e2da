package graft.plans

import graft.SparkSpec
import graft.model.ObjectStoreSpec
import graft.sinks.ObjectStoreSink

/** Differential fuzz for the generalized MERGE clause engine: random
  * clause chains (conditional MATCHED UPDATE/DELETE, conditional NOT
  * MATCHED INSERT, NOT MATCHED BY SOURCE UPDATE/DELETE, in random order)
  * against an INDEPENDENT in-memory reference evaluator implementing the
  * ANSI semantics from the spec text alone: per category, clauses apply
  * in order, first TRUE condition fires (SQL three-valued: a NULL
  * condition is not-applicable), unfired matched/target-only rows carry,
  * unfired source-only rows drop, duplicate-key sources inserting to no
  * target are legal, and a target row matched by >1 source row ALWAYS
  * errors (the engine's documented strictness — silently carrying a
  * multiply-matched row once per partner would be worse). Seeds pinned.
  */
class MergeClauseFuzzSpec extends SparkSpec {

  private val ss = spark
  import ss.implicits._

  private type JL = java.lang.Long
  // target rows: (id, v nullable, tag); source rows: (id, sv nullable, stag)
  private type Row3 = (Long, JL, String)

  private sealed trait Cond {
    def sql: String
    /** TRUE under SQL three-valued logic (UNKNOWN = not applicable). */
    def eval(t: Option[Row3], s: Option[Row3]): Boolean
  }
  private case class SGt(c: Long) extends Cond {
    val sql = s"s.sv > $c"
    def eval(t: Option[Row3], s: Option[Row3]) =
      s.exists(r => r._2 != null && r._2.longValue > c)
  }
  private case class TLt(c: Long) extends Cond {
    val sql = s"t.v < $c"
    def eval(t: Option[Row3], s: Option[Row3]) =
      t.exists(r => r._2 != null && r._2.longValue < c)
  }
  private case object SNull extends Cond {
    val sql = "s.sv IS NULL"
    def eval(t: Option[Row3], s: Option[Row3]) = s.exists(_._2 == null)
  }
  private case class TagIs(g: String) extends Cond {
    val sql = s"t.tag = '$g'"
    def eval(t: Option[Row3], s: Option[Row3]) = t.exists(_._3 == g)
  }

  private sealed trait Act { def sql: String }
  private case object UpdV extends Act { val sql = "UPDATE SET v = s.sv" }
  private case object UpdTag extends Act { val sql = "UPDATE SET tag = s.stag" }
  private case object UpdBoth extends Act {
    val sql = "UPDATE SET v = s.sv, tag = s.stag" }
  private case object Del extends Act { val sql = "DELETE" }
  private case object Ins extends Act {
    val sql = "INSERT (id, v, tag) VALUES (s.id, s.sv, s.stag)" }
  private case object OrphTag extends Act { val sql = "UPDATE SET tag = 'orphan'" }

  private case class Clause(kind: String, cond: Option[Cond], act: Act) {
    def sql: String = {
      val head = kind match {
        case "m" => "WHEN MATCHED"
        case "nt" => "WHEN NOT MATCHED"
        case _ => "WHEN NOT MATCHED BY SOURCE"
      }
      s"$head${cond.fold("")(c => s" AND ${c.sql}")} THEN ${act.sql}"
    }
  }

  private def applyAct(a: Act, t: Option[Row3], s: Option[Row3]): Option[Row3] =
    a match {
      case UpdV => t.map(r => (r._1, s.get._2, r._3))
      case UpdTag => t.map(r => (r._1, r._2, s.get._3))
      case UpdBoth => t.map(r => (r._1, s.get._2, s.get._3))
      case OrphTag => t.map(r => (r._1, r._2, "orphan"))
      case Del => None
      case Ins => s.map(r => (r._1, r._2, r._3))
    }

  /** The reference merge. Left(()) = expected cardinality error — a
    * target row matched by >1 source row always errors (the engine's
    * documented strictness; see MergeUpsert.MergeWhen's note).
    */
  private def reference(target: Seq[Row3], source: Seq[Row3],
      clauses: Seq[Clause]): Either[Unit, Seq[Row3]] = {
    val mc = clauses.filter(_.kind == "m")
    val ntc = clauses.filter(_.kind == "nt")
    val nsc = clauses.filter(_.kind == "ns")
    val byId = source.groupBy(_._1)
    if (target.exists(t => byId.getOrElse(t._1, Nil).size > 1))
      return Left(())
    val out = Seq.newBuilder[Row3]
    target.foreach { t =>
      byId.getOrElse(t._1, Nil) match {
        case Seq(s) =>
          mc.find(c => c.cond.forall(_.eval(Some(t), Some(s)))) match {
            case Some(c) => applyAct(c.act, Some(t), Some(s)).foreach(r => out += r)
            case None => out += t
          }
        case _ =>
          nsc.find(c => c.cond.forall(_.eval(Some(t), None))) match {
            case Some(c) => applyAct(c.act, Some(t), None).foreach(r => out += r)
            case None => out += t
          }
      }
    }
    val tIds = target.map(_._1).toSet
    source.filterNot(s => tIds(s._1)).foreach { s =>
      ntc.find(c => c.cond.forall(_.eval(None, Some(s))))
        .foreach(c => applyAct(c.act, None, Some(s)).foreach(r => out += r))
    }
    Right(out.result())
  }

  private def randCond(rnd: scala.util.Random, kind: String): Option[Cond] =
    rnd.nextInt(4) match {
      case 0 => None
      case 1 if kind != "ns" => Some(SGt(rnd.nextInt(60).toLong))
      case 2 if kind != "nt" => Some(TLt(rnd.nextInt(60).toLong))
      case 3 if kind != "nt" => Some(TagIs(s"g${rnd.nextInt(3)}"))
      case _ if kind != "nt" => Some(TLt(rnd.nextInt(60).toLong))
      case _ => Some(SNull)
    }

  private def randClauses(rnd: scala.util.Random): Seq[Clause] = {
    val mActs = Seq(UpdV, UpdTag, UpdBoth, Del)
    val m = Seq.fill(rnd.nextInt(3))(
      Clause("m", randCond(rnd, "m"), mActs(rnd.nextInt(mActs.size))))
    val nt = Seq.fill(rnd.nextInt(3))(
      Clause("nt", randCond(rnd, "nt"), Ins))
    val ns = Seq.fill(rnd.nextInt(2))(
      Clause("ns", randCond(rnd, "ns"),
        if (rnd.nextBoolean()) Del else OrphTag))
    val all = rnd.shuffle(m ++ nt ++ ns)
    if (all.isEmpty) Seq(Clause("m", None, UpdV)) else all
  }

  for (seed <- 1 to 25)
    test(s"random MERGE clause chain equals the reference evaluator — " +
      s"seed $seed") {
      val rnd = new scala.util.Random(seed * 65537)
      val nT = 60 + rnd.nextInt(60)
      val target: Seq[Row3] = (0L until nT.toLong).map { i =>
        (i, if (i % 7 == 0) null else java.lang.Long.valueOf(rnd.nextInt(100).toLong),
          s"g${i % 3}")
      }
      // source: overlapping band + fresh ids + occasional duplicates
      val src0: Seq[Row3] = (0 until 50).map { _ =>
        val id = rnd.nextInt(nT + 30).toLong
        (id, if (rnd.nextInt(6) == 0) null
             else java.lang.Long.valueOf(rnd.nextInt(100).toLong),
          s"s${rnd.nextInt(4)}")
      }
      val source = src0.distinctBy(_._1) ++
        (if (rnd.nextInt(3) == 0) src0.take(2).map(r =>
          (r._1, java.lang.Long.valueOf(999L), "dup")) else Nil)
      val clauses = randClauses(rnd)
      val sqlText = clauses.map(_.sql).mkString("\n")

      val spec = ObjectStoreSpec(path = scratchDir(s"mrgfz$seed").toString,
        database = "graft_mrgfuzz", table = s"t_$seed")
      ObjectStoreSink.replaceTable(spark,
        target.toDF("id", "v", "tag"), spec)
      val fq = s"${spec.database}.${spec.table}"
      source.toDF("id", "sv", "stag").createOrReplaceTempView(s"mfz_src$seed")
      def run() = spark.sql(
        s"""MERGE INTO $fq t USING mfz_src$seed s ON t.id = s.id
           |$sqlText""".stripMargin).collect()

      reference(target, source, clauses) match {
        case Left(()) =>
          withClue(s"clauses:\n$sqlText\n") {
            val e = the[Exception] thrownBy run()
            e.getMessage should include("cardinality")
          }
        case Right(expected) =>
          run()
          val got = spark.table(fq).collect().map(r =>
            (r.getLong(0), if (r.isNullAt(1)) null else java.lang.Long.valueOf(r.getLong(1)),
              r.getString(2))).toSeq
          withClue(s"clauses:\n$sqlText\n") {
            got.sortBy(r => (r._1, Option(r._2).map(_.longValue)
              .getOrElse(Long.MinValue), r._3)) shouldBe
              expected.sortBy(r => (r._1, Option(r._2).map(_.longValue)
                .getOrElse(Long.MinValue), r._3))
          }
      }
    }
}
