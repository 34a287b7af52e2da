package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Whole-signature MinHash kernel: `array<string>` shingles → `array<long>`
  * of the document's k min-hashes, computed in ONE pass per row.
  *
  * This replaces the explode→groupBy formulation (one row per shingle
  * instance shuffled to compute k MIN aggregates) with a narrow map — the
  * signature stage becomes shuffle-FREE, which at 100 TB removes the
  * largest data movement of the dedup pipeline: the exploded token table
  * is ~20× the corpus size and previously crossed the wire once per
  * signature build.
  *
  * Hash contract (identical to the exploded form and the DuckDB oracle):
  * base = first 7 md5 hex chars of the shingle as a long;
  * h_i = (base * (2i+1) + (7919i+1)) mod (2^31-1); signature_i = min over
  * shingles of h_i.
  */
case class MinHashSig(child: Expression, numHashes: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"minhash_sig needs array<string>, got ${other.simpleString}")
    }

  override def nullSafeEval(input: Any): Any =
    MinHashSig.compute(input.asInstanceOf[ArrayData], numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    // one static call per row keeps the expression inside WholeStageCodegen
    // (vs CodegenFallback, which would break the pipeline into interpreted
    // segments); the md5 work dominates, so per-element codegen buys nothing
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.MinHashSig.compute($a, $numHashes);")

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

object MinHashSig {

  val HashP = 2147483647L // 2^31-1, matches Dedup.HashP

  /** Static kernel shared by eval and generated code. Returns null for an
    * empty shingle set (a min over nothing — matches the groupBy form,
    * where such documents simply produce no row).
    */
  def compute(tokens: ArrayData, numHashes: Int): ArrayData = {
    val n = tokens.numElements()
    if (n == 0) return null
    val mins = new Array[Long](numHashes)
    java.util.Arrays.fill(mins, Long.MaxValue)
    val md = java.security.MessageDigest.getInstance("MD5")
    var t = 0
    while (t < n) {
      val token = tokens.getUTF8String(t)
      md.reset()
      val digest = md.digest(token.getBytes)
      // first 7 hex chars = high 28 bits of the first 3.5 bytes
      var base = 0L
      var i = 0
      while (i < 4) { // 4 bytes = 8 hex chars; drop the low nibble of byte 3
        base = (base << 8) | (digest(i) & 0xffL)
        i += 1
      }
      base = base >>> 4 // keep 28 bits (7 hex chars)
      var k = 0
      while (k < numHashes) {
        val h = (base * (2L * k + 1) + (7919L * k + 1)) % HashP
        if (h < mins(k)) mins(k) = h
        k += 1
      }
      t += 1
    }
    new GenericArrayData(mins)
  }

  def sig(tokens: Column, numHashes: Int): Column =
    GraftSqlBridge.column(
      MinHashSig(GraftSqlBridge.expression(tokens), numHashes))

  /** Sanity helper mirroring the SQL-side base hash for tests. */
  private[graft] def baseHashOf(token: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(token.getBytes("UTF-8"))
      .map(b => f"${b & 0xff}%02x").mkString.take(7)
    java.lang.Long.parseLong(hex, 16)
  }
}
