package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Per-document sketch kernels (companions to [[MinHashSig]]): each computes
  * a whole document's sketch in one pass over its shingle array, making the
  * sketch stage a narrow map — no explode, no shuffle. At 100 TB the
  * exploded token table is ~20× the corpus bytes; these kernels keep it off
  * the wire entirely for every sketch family the engine ships.
  *
  * All hash contracts match the SQL/DuckDB-oracle formulations bit-for-bit
  * (md5 hex prefixes via byte math).
  */
object DocSketches {

  /** md5(token) first 15 hex chars as a 60-bit long (the SimHash/60 base). */
  private[functions] def hash60(md: java.security.MessageDigest,
      bytes: Array[Byte]): Long = {
    md.reset()
    val d = md.digest(bytes)
    var h = 0L
    var i = 0
    while (i < 8) { h = (h << 8) | (d(i) & 0xffL); i += 1 }
    h >>> 4 // 64 bits read, keep the first 15 hex chars = 60 bits
  }

  /** md5(token) first 7 hex chars as a 28-bit long (the winnow/minhash base). */
  private[functions] def hash28(md: java.security.MessageDigest,
      bytes: Array[Byte]): Long = {
    md.reset()
    val d = md.digest(bytes)
    var h = 0L
    var i = 0
    while (i < 4) { h = (h << 8) | (d(i) & 0xffL); i += 1 }
    h >>> 4
  }

  def simhash(tokens: Column): Column =
    GraftSqlBridge.column(SimHashSig(GraftSqlBridge.expression(tokens)))

  def winnow(tokens: Column, window: Int): Column =
    GraftSqlBridge.column(WinnowFingerprint(GraftSqlBridge.expression(tokens), window))
}

/** 60-bit SimHash over a document's DISTINCT shingle array: majority vote
  * per bit of the 60-bit md5-prefix hashes. Null for an empty array (the
  * groupBy formulation produces no row there).
  */
case class SimHashSig(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"simhash_sig needs array<string>, got ${other.simpleString}")
    }

  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    SimHashSig.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val resultTerm = ctx.freshName("shResult")
    nullSafeCodeGen(ctx, ev, a =>
      s"""
         |Long $resultTerm = graft.functions.SimHashSig.compute($a);
         |if ($resultTerm == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $resultTerm.longValue(); }
       """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): SimHashSig =
    copy(child = newChild)
}

object SimHashSig {
  /** Boxed so generated code can signal null for empty token sets. */
  def compute(tokens: ArrayData): java.lang.Long = {
    val n = tokens.numElements()
    if (n == 0) return null
    val votes = new Array[Int](60)
    val md = java.security.MessageDigest.getInstance("MD5")
    var t = 0
    while (t < n) {
      val h = DocSketches.hash60(md, tokens.getUTF8String(t).getBytes)
      var b = 0
      while (b < 60) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      t += 1
    }
    var sig = 0L
    var b = 0
    while (b < 60) { if (votes(b) > 0) sig |= (1L << b); b += 1 }
    java.lang.Long.valueOf(sig)
  }
}

/** Winnowing fingerprints over a document's ORDERED shingle array
  * (duplicates preserved — position matters): min of each `window`-wide
  * sliding window of the 28-bit rolling hash sequence, distinct, ascending.
  * Full windows only; null when the sequence is shorter than the window.
  */
case class WinnowFingerprint(child: Expression, window: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"winnow_fingerprint needs array<string>, got ${other.simpleString}")
    }

  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    WinnowFingerprint.compute(input.asInstanceOf[ArrayData], window)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => s"""
       |${ev.value} = graft.functions.WinnowFingerprint.compute($a, $window);
       |${ev.isNull} = (${ev.value} == null);
     """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): WinnowFingerprint =
    copy(child = newChild)
}

object WinnowFingerprint {
  def compute(tokens: ArrayData, window: Int): ArrayData = {
    val n = tokens.numElements()
    if (n < window) return null
    val md = java.security.MessageDigest.getInstance("MD5")
    val hs = new Array[Long](n)
    var i = 0
    while (i < n) {
      hs(i) = DocSketches.hash28(md, tokens.getUTF8String(i).getBytes)
      i += 1
    }
    val fps = new java.util.TreeSet[java.lang.Long]()
    i = window - 1
    while (i < n) {
      var m = hs(i)
      var j = i - window + 1
      while (j < i) { if (hs(j) < m) m = hs(j); j += 1 }
      fps.add(m)
      i += 1
    }
    val out = new Array[Long](fps.size)
    val it = fps.iterator()
    var k = 0
    while (it.hasNext) { out(k) = it.next(); k += 1 }
    new GenericArrayData(out)
  }
}
