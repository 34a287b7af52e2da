package graft.dq

import org.json4s._
import org.json4s.jackson.JsonMethods

import javax.xml.XMLConstants
import javax.xml.transform.stream.StreamSource
import javax.xml.validation.SchemaFactory
import java.io.StringReader

/** Whole-payload validation of semi-structured data (SURVEY §2.7 F6/F7,
  * reference SchemaValidationUtil.scala:33-59).
  *
  * XML is validated against an XSD with the JDK's `javax.xml.validation` —
  * the same machinery the reference uses. JSON is validated with a built-in
  * structural checker covering the JSON-Schema core the reference's everit
  * validator is used for in practice: `type`, `properties`, `required`,
  * `items`, `enum`, `minimum`/`maximum`, `minLength`/`maxLength`,
  * `pattern` (offline build — no everit jar; unsupported keywords are
  * ignored rather than failing, like a draft-tolerant validator).
  */
object SchemaValidation {

  final class ValidationException(msg: String) extends RuntimeException(msg)

  def validateXml(payload: String, xsd: String): Unit =
    try {
      val factory = SchemaFactory.newInstance(XMLConstants.W3C_XML_SCHEMA_NS_URI)
      val schema = factory.newSchema(new StreamSource(new StringReader(xsd)))
      schema.newValidator().validate(new StreamSource(new StringReader(payload)))
    } catch {
      case e: org.xml.sax.SAXException =>
        throw new ValidationException(s"XML validation failed: ${e.getMessage}")
    }

  def validateJson(payload: String, schemaJson: String): Unit = {
    val doc = try JsonMethods.parse(payload) catch {
      case e: Exception => throw new ValidationException(s"invalid JSON payload: ${e.getMessage}")
    }
    val schema = try JsonMethods.parse(schemaJson) catch {
      case e: Exception => throw new ValidationException(s"invalid JSON schema: ${e.getMessage}")
    }
    val errs = check(doc, schema, "$")
    if (errs.nonEmpty)
      throw new ValidationException(s"JSON validation failed: ${errs.mkString("; ")}")
  }

  private def check(v: JValue, schema: JValue, path: String): List[String] = {
    val errs = List.newBuilder[String]
    schema \ "type" match {
      case JString(t) if !typeMatches(v, t) =>
        errs += s"$path: expected type $t"
        return errs.result() // wrong type — deeper checks are meaningless
      case JArray(ts) if !ts.collect { case JString(t) => t }.exists(typeMatches(v, _)) =>
        errs += s"$path: expected one of ${ts.collect { case JString(t) => t }.mkString("/")}"
        return errs.result()
      case _ =>
    }
    schema \ "enum" match {
      case JArray(allowed) if !allowed.contains(v) => errs += s"$path: not in enum"
      case _ =>
    }
    (v, schema \ "required") match {
      case (JObject(fields), JArray(req)) =>
        val have = fields.map(_._1).toSet
        req.collect { case JString(r) if !have(r) => r }
          .foreach(r => errs += s"$path: missing required property '$r'")
      case _ =>
    }
    (v, schema \ "properties") match {
      case (JObject(fields), JObject(props)) =>
        val fmap = fields.toMap
        props.foreach { case (name, sub) =>
          fmap.get(name).foreach(fv => errs ++= check(fv, sub, s"$path.$name"))
        }
      case _ =>
    }
    (v, schema \ "items") match {
      case (JArray(items), sub: JObject) =>
        items.zipWithIndex.foreach { case (it, i) => errs ++= check(it, sub, s"$path[$i]") }
      case _ =>
    }
    v match {
      case JString(s) =>
        schema \ "minLength" match {
          case JInt(m) if s.length < m.toInt => errs += s"$path: shorter than minLength $m"
          case _ =>
        }
        schema \ "maxLength" match {
          case JInt(m) if s.length > m.toInt => errs += s"$path: longer than maxLength $m"
          case _ =>
        }
        schema \ "pattern" match {
          case JString(p) if !java.util.regex.Pattern.compile(p).matcher(s).find() =>
            errs += s"$path: does not match pattern"
          case _ =>
        }
      case _ =>
    }
    num(v).foreach { d =>
      num(schema \ "minimum").filter(d < _).foreach(m => errs += s"$path: below minimum $m")
      num(schema \ "maximum").filter(d > _).foreach(m => errs += s"$path: above maximum $m")
    }
    errs.result()
  }

  private def num(v: JValue): Option[Double] = v match {
    case JInt(i) => Some(i.toDouble)
    case JLong(l) => Some(l.toDouble)
    case JDouble(d) => Some(d)
    case JDecimal(d) => Some(d.toDouble)
    case _ => None
  }

  private def typeMatches(v: JValue, t: String): Boolean = (v, t) match {
    case (_: JObject, "object")   => true
    case (_: JArray, "array")     => true
    case (_: JString, "string")   => true
    case (JInt(_) | JLong(_), "integer" | "number") => true
    case (JDouble(_) | JDecimal(_), "number")       => true
    case (_: JBool, "boolean")    => true
    case (JNull, "null")          => true
    case _ => false
  }
}
