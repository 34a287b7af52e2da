package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Deterministic train/validation/test assignment — the split step every
  * training-data pipeline needs between curation and materialization.
  *
  * The assignment is a pure function of the row's id: bucket =
  * md5(id)[0,8) as a 32-bit integer mod 1000, thresholds carve the bucket
  * space. Properties that matter at 100 TB:
  *
  *   - '''No shuffle, no state.''' A narrow map; appending the split column
  *     never moves data, and re-running over a grown corpus never reassigns
  *     an existing id (stable splits across snapshots — rows only ever ADD).
  *   - '''No sampling RNG.''' `df.randomSplit` draws per-partition random
  *     numbers: resplitting after a repartition reassigns rows, and the
  *     split can't be reproduced from the data alone. Hashing the id makes
  *     the split a property of the ROW, reproducible anywhere — including
  *     by the SQL oracle.
  *   - '''Leak-safe joins.''' Any table keyed by the same id lands in the
  *     same split, so features/labels/metadata never straddle train/test.
  *
  * Mirrors the engine-wide md5 hash contract (DuckDB twin:
  * `('0x' || substring(md5(CAST(id AS VARCHAR)), 1, 8))::BIGINT % 1000`).
  */
object DatasetSplit {

  val Buckets = 1000

  /** Bucket in [0, 1000) from the id's md5 prefix — 32 uniform bits. */
  def bucket(id: Column): Column =
    conv(substring(md5(id.cast("string")), 1, 8), 16, 10).cast(LongType) % Buckets

  def bucketSql(id: String): String =
    s"CAST(('0x' || substring(md5(CAST($id AS VARCHAR)), 1, 8)) AS BIGINT) % $Buckets"

  /** Split label from per-mille thresholds: [0, trainPm) → train,
    * [trainPm, trainPm+valPm) → val, rest → test.
    */
  def split(id: Column, trainPm: Int = 900, valPm: Int = 50): Column = {
    require(trainPm >= 0 && valPm >= 0 && trainPm + valPm <= Buckets,
      "per-mille thresholds must fit in [0, 1000]")
    val b = bucket(id)
    when(b < trainPm, "train")
      .when(b < trainPm + valPm, "val")
      .otherwise("test")
  }

  def splitSql(id: String, trainPm: Int = 900, valPm: Int = 50): String =
    s"""CASE WHEN ${bucketSql(id)} < $trainPm THEN 'train'
       |     WHEN ${bucketSql(id)} < ${trainPm + valPm} THEN 'val'
       |     ELSE 'test' END""".stripMargin

  /** The assignment projection: input + (bucket, split) columns. */
  def assign(df: DataFrame, idCol: String, trainPm: Int = 900,
      valPm: Int = 50): DataFrame =
    df.withColumn("bucket", bucket(col(idCol)))
      .withColumn("split", split(col(idCol), trainPm, valPm))
}
