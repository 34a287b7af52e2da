package graft.queries

import org.apache.spark.sql.functions._

/** Training-data curation composites — the queries a real pretraining
  * pipeline runs by COMBINING the engine's operators, each still fully
  * DuckDB-oracled. Both compose from their parents' QueryDefs (plans AND
  * oracle SQL), the same pattern as the ANN recall query.
  */
object Curation {

  private def parent(all: Seq[QueryDef], name: String): QueryDef =
    all.find(_.name == name).getOrElse(sys.error(s"missing parent $name"))

  /** Recursive-CTE twin of [[graft.operators.ConnectedComponents]] over a
    * pair oracle producing (id_a, id_b, ...).
    */
  private def componentsSql(pairsSql: String): String =
    s"""WITH RECURSIVE pairs AS ($pairsSql),
       |edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
       |          UNION SELECT id_b, id_a FROM pairs),
       |nodes AS (SELECT DISTINCT src AS id FROM edges),
       |reach(id, comp) AS (
       |  SELECT id, id FROM nodes
       |  UNION
       |  SELECT e.dst, r.comp FROM reach r JOIN edges e ON e.src = r.id)
       |SELECT id, MIN(comp) AS comp, id = MIN(comp) AS is_canonical
       |FROM reach GROUP BY id""".stripMargin

  val defs: Seq[QueryDef] = {
    val embedNearDup = parent(Embeddings.defs, "q_embed_neardup")
    val langId = parent(Text.defs, "q_text_langid")
    val quality = parent(Text.defs, "q_text_quality")
    val clusters = parent(Dedup.clusterDefs, "q_dedup_clusters")

    Seq(
      // ---- embedding near-dup clusters (the vector-side dedup clustering) --
      QueryDef(
        "q_embed_clusters",
        (s, d) => {
          val pairs = embedNearDup.query(s, d).select("id_a", "id_b")
          graft.operators.ConnectedComponents.components(pairs, "id_a", "id_b")
            .select(col("id").as("vec_id"), col("comp").as("cluster_id"),
              (col("id") === col("comp")).as("is_canonical"))
            .orderBy("vec_id")
        },
        Some(s"""SELECT id AS vec_id, comp AS cluster_id, is_canonical
                |FROM (${componentsSql(embedNearDup.oracle.get)}) cc
                |ORDER BY vec_id""".stripMargin)),

      // ---- the curation flagship: language gate + quality gate + keep one
      // canonical doc per near-dup cluster — the end-to-end "which documents
      // survive into the training set" query, composed entirely from
      // oracled parents.
      QueryDef(
        "q_curation_pipeline",
        (s, d) => {
          val lang = langId.query(s, d).select("doc_id", "lang_guess")
          val qual = quality.query(s, d).select("doc_id", "uniq_token_ratio")
          val dupes = clusters.query(s, d)
            .filter(!col("is_canonical")).select("doc_id")
          lang.join(qual, "doc_id")
            .filter(col("lang_guess") === "en" &&
              col("uniq_token_ratio") >= 0.35)
            .join(dupes, Seq("doc_id"), "left_anti")
            .orderBy("doc_id")
        },
        Some(s"""WITH lang AS (${langId.oracle.get}),
                |qual AS (${quality.oracle.get}),
                |dupes AS (
                |  SELECT doc_id FROM (${clusters.oracle.get}) c
                |  WHERE NOT is_canonical)
                |SELECT l.doc_id, l.lang_guess, q.uniq_token_ratio
                |FROM lang l JOIN qual q USING (doc_id)
                |WHERE l.lang_guess = 'en' AND q.uniq_token_ratio >= 0.35
                |  AND l.doc_id NOT IN (SELECT doc_id FROM dupes)
                |ORDER BY l.doc_id""".stripMargin)))
  }
}
