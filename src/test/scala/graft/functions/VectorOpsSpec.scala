package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class VectorOpsSpec extends SparkSpec {

  private lazy val emb = spark.read.parquet(s"$sfDir/embeddings.parquet").limit(50)

  test("native dot kernel matches HOF reference implementation") {
    val diff = emb.select(
      abs(VectorOps.dot(col("embedding"), col("embedding")) -
        VectorOps.dotHof(col("embedding"), col("embedding"))).as("d"))
      .agg(max("d")).head.getDouble(0)
    assert(diff == 0.0, "codegen'd dot must be bit-identical to the fold")
  }

  test("cosine of a vector with itself is 1") {
    val c = emb.select(
      abs(VectorOps.cosine(col("embedding"), col("embedding")) - 1.0).as("e"))
      .agg(max("e")).head.getDouble(0)
    assert(c < 1e-12)
  }

  test("l2 distance to self is 0 and is symmetric-positive") {
    val z = emb.select(VectorOps.l2(col("embedding"), col("embedding")).as("d"))
      .agg(max("d")).head.getDouble(0)
    assert(z == 0.0)
  }
}
