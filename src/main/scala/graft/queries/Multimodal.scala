package graft.queries

import graft.Tables
import graft.operators.{Multimodal => MM}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Encoders, Row, SparkSession}
import org.apache.spark.sql.types._

/** Multimodal-column coverage: binary media payloads flowing through the
  * engine with typed metadata + per-row feature extraction (operators
  * .Multimodal). The corpus is synthesized deterministically from
  * `documents` (seeded by doc_id) because the testdata ships no media
  * files — the plumbing (binary columns, decode loop, feature schema,
  * no-shuffle plan) is exactly what real media would traverse.
  *
  * No DuckDB oracle: the per-byte synthesis/statistics aren't expressible
  * in portable SQL — the driver records the rows-only check, and
  * MultimodalSpec pins the values in unit tests.
  */
object MultimodalQueries {

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "q_multimodal_features",
      (s, d) => {
        val docs = Tables.load(s, d, "documents").select(col("doc_id"))
        val mediaSchema = StructType(Seq(
          StructField("doc_id", LongType),
          StructField("media", BinaryType)))
        // ingestion: one synthetic media blob per document (deterministic)
        val media = docs.mapPartitions { rows =>
          rows.map { r =>
            val id = r.getLong(0)
            Row(id, MM.synthesize(id,
              width = (id % 640).toInt + 16, height = (id % 480).toInt + 16,
              channels = if (id % 7 == 0) 1 else 3))
          }
        }(Encoders.row(mediaSchema))
        MM.features(media, "media").orderBy("doc_id")
      },
      None) // rows-only: byte-level synthesis isn't SQL-expressible
  )
}
