package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float>` embedding columns, built from codegen'd
  * higher-order functions (`zip_with`/`aggregate`/`transform`) — no UDFs, so
  * the whole pipeline stays inside WholeStageCodegen.
  *
  * Arithmetic contract: all math in double with a sequential left fold over
  * the array, which makes results reproducible across engines (the DuckDB
  * oracle computes the same fold via `list_dot_product` on `DOUBLE[]`).
  */
object VectorOps {

  /** Σ aᵢ·bᵢ, in double, sequential — codegen'd native expression. */
  def dot(a: Column, b: Column): Column = DotProduct.dot(a, b)

  /** HOF reference implementation of [[dot]] (interpreted; kept for
    * cross-checking the native kernel in tests). */
  def dotHof(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** L2 distance, double, sequential fold. */
  def l2(a: Column, b: Column): Column =
    sqrt(aggregate(
      zip_with(a, b, (x, y) => {
        val diff = x.cast("double") - y.cast("double"); diff * diff
      }),
      lit(0.0),
      (acc, v) => acc + v))
}
