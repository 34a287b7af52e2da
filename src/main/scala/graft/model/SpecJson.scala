package graft.model

import org.json4s._
import org.json4s.jackson.JsonMethods
import org.json4s.jackson.Serialization

/** JSON codec for [[PipelineSpec]] (json4s-jackson, which ships with Spark).
  * The JSON document is the engine's user-facing config format — the
  * equivalent of the reference's DynamoDB-stored DatasetConfig JSON
  * (DatasetConfigIO.scala:33-55). Missing fields take the case-class
  * defaults; unknown fields are ignored.
  */
object SpecJson {

  private implicit val formats: Formats = DefaultFormats

  def parse(json: String): PipelineSpec =
    try JsonMethods.parse(json).extract[PipelineSpec].normalized.validated
    catch {
      case e: PipelineSpecException => throw e
      case e: Exception =>
        throw new PipelineSpecException(s"invalid pipeline spec JSON: ${e.getMessage}")
    }

  def write(spec: PipelineSpec): String = Serialization.writePretty(spec)

  def parseFile(path: String): PipelineSpec =
    parse(new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)),
      java.nio.charset.StandardCharsets.UTF_8))
}
