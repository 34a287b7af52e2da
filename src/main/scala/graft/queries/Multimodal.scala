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
      None), // rows-only: byte-level synthesis isn't SQL-expressible

    // The decode METADATA path oracled: format/dimensions/byte-count are
    // pure functions of doc_id through synthesize → binary column →
    // mapPartitions decode, so DuckDB can replay them relationally — the
    // binary round-trip (big-endian header encode/decode, magic check,
    // schema) is hash-verified; only the LCG byte statistics stay
    // rows-only above (64-bit wrapping multiply isn't portable SQL).
    QueryDef(
      "q_multimodal_meta",
      (s, d) => {
        val docs = Tables.load(s, d, "documents").select(col("doc_id"))
        val mediaSchema = StructType(Seq(
          StructField("doc_id", LongType),
          StructField("media", BinaryType)))
        val media = docs.mapPartitions { rows =>
          rows.map { r =>
            val id = r.getLong(0)
            Row(id, MM.synthesize(id,
              width = (id % 640).toInt + 16, height = (id % 480).toInt + 16,
              channels = if (id % 7 == 0) 1 else 3))
          }
        }(Encoders.row(mediaSchema))
        MM.features(media, "media")
          .select(col("doc_id"), col("format"), col("width"), col("height"),
            col("channels"), col("n_bytes"))
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id, 'gft' AS format,
             |  CAST(doc_id % 640 + 16 AS INTEGER) AS width,
             |  CAST(doc_id % 480 + 16 AS INTEGER) AS height,
             |  CAST(CASE WHEN doc_id % 7 = 0 THEN 1 ELSE 3 END AS INTEGER) AS channels,
             |  CAST(16 + 64 + doc_id % 64 AS BIGINT) AS n_bytes
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // Frame sampling oracled: every 2nd of 8 equal body chunks per payload;
    // chunk count and sizes are pure functions of doc_id (body = 64 +
    // doc_id % 64 bytes), so the explode shape + per-frame byte accounting
    // hash-verify relationally.
    QueryDef(
      "q_multimodal_frames",
      (s, d) => {
        val docs = Tables.load(s, d, "documents").select(col("doc_id"))
        val mediaSchema = StructType(Seq(
          StructField("doc_id", LongType),
          StructField("media", BinaryType)))
        val media = docs.mapPartitions { rows =>
          rows.map { r =>
            val id = r.getLong(0)
            Row(id, MM.synthesize(id,
              width = (id % 640).toInt + 16, height = (id % 480).toInt + 16,
              channels = if (id % 7 == 0) 1 else 3))
          }
        }(Encoders.row(mediaSchema))
        MM.frameSample(media, "media", frames = 8, step = 2)
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_frames"),
            sum(length(col("frame")).cast("long")).as("frame_bytes"))
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id, CAST(4 AS BIGINT) AS n_frames,
             |  CAST(4 * ((64 + doc_id % 64) // 8) AS BIGINT) AS frame_bytes
             |FROM documents ORDER BY doc_id""".stripMargin))
  )
}
