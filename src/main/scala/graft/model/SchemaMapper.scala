package graft.model

import org.apache.spark.sql.types._

/** Hive/Glue-style type-string → Spark `DataType`, matched by prefix exactly
  * like the reference (DataFrameUtil.scala:108-145,
  * DatasetValidatorUtil.scala:271-289).
  *
  * One deliberate fidelity decision: the reference casts `decimal(p,s)` to
  * DOUBLE (losing precision, DataFrameUtil.scala:128-129). We default to the
  * correct `DecimalType(p,s)` and keep the lossy behavior behind
  * `decimalCompat = true` for bit-compatibility with reference outputs.
  */
object SchemaMapper {

  private val DecimalRe = """decimal\s*\(\s*(\d+)\s*,\s*(\d+)\s*\)""".r

  def isSupported(t: String): Boolean =
    try { toDataType(t); true } catch { case _: IllegalArgumentException => false }

  def toDataType(typeString: String, decimalCompat: Boolean = false): DataType = {
    val t = typeString.trim.toLowerCase
    // Prefix matching order mirrors the reference: tinyint/smallint/bigint
    // before int would be shadowed by startsWith("int"), so test longest
    // prefixes first.
    if (t.startsWith("boolean")) BooleanType
    else if (t.startsWith("tinyint")) IntegerType  // Spark-path semantics (ref :118-119)
    else if (t.startsWith("smallint")) IntegerType // (ref :120-121)
    else if (t.startsWith("bigint")) LongType
    else if (t.startsWith("int")) IntegerType
    else if (t.startsWith("float")) FloatType
    else if (t.startsWith("double")) DoubleType
    else if (t.startsWith("decimal")) {
      if (decimalCompat) DoubleType
      else t match {
        case DecimalRe(p, s) => DecimalType(p.toInt, s.toInt)
        case _               => DecimalType(38, 18)
      }
    }
    else if (t.startsWith("string")) StringType
    else if (t.startsWith("varchar")) StringType
    else if (t.startsWith("char")) StringType
    else if (t.startsWith("date")) DateType
    else if (t.startsWith("timestamp")) TimestampType
    else throw new IllegalArgumentException(s"unsupported type string: '$typeString'")
  }

  /** Declared schema → StructType (all fields nullable, like CSV reads). */
  def toStructType(fields: Seq[FieldSpec], decimalCompat: Boolean = false): StructType =
    StructType(fields.map(f =>
      StructField(f.name, toDataType(f.`type`, decimalCompat), nullable = true)))

  /** Spark type → type-string (for JDBC DDL generation in the sinks). */
  def toTypeString(dt: DataType): String = dt match {
    case BooleanType          => "boolean"
    case IntegerType          => "int"
    case ShortType            => "smallint"
    case ByteType             => "tinyint"
    case LongType             => "bigint"
    case FloatType            => "float"
    case DoubleType           => "double"
    case d: DecimalType       => s"decimal(${d.precision},${d.scale})"
    case StringType           => "varchar(65535)"
    case DateType             => "date"
    case TimestampType        => "timestamp"
    case other                => throw new IllegalArgumentException(
      s"no JDBC DDL mapping for ${other.simpleString}")
  }
}
