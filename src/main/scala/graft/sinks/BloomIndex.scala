package graft.sinks

import java.io.ByteArrayInputStream
import java.nio.file.{Files, Path, Paths}
import java.util.Base64

import graft.sinks.TableManifest.FileEntry
import graft.sinks.ZoneMap.PruneReport
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Literal, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions.{col, input_file_name, xxhash64}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter
import org.json4s.{DefaultFormats, Formats}
import org.json4s.jackson.{JsonMethods, Serialization}

/** Per-file Bloom-filter index, the skipping proof for layouts zone maps
  * are blind to. A range-clustered table prunes on [min, max] windows;
  * an UNCLUSTERED layout (hash-distributed writes, append order) gives
  * every file a full-range window, so a point lookup `id = K` or a sparse
  * IN-list still lists every file. A per-file Bloom filter answers "might
  * this file contain K?" in O(1) from metadata: false positives only keep
  * an extra file (re-filtered exactly by the retained predicate), false
  * negatives cannot happen, so a negative is a sound skip — the same
  * contract as Parquet's column bloom filters and Iceberg's puffin blobs,
  * rebuilt here at the MANIFEST level so the decision is driver-side,
  * before a single scan task exists. The reference had no file-skipping
  * layer at all (scans were delegated wholesale, AthenaUtil.scala:61-160).
  *
  * Build: at commit, one extra pass over the just-written version dir
  * (`spark.read … groupBy(input_file_name)`) aggregates one filter per
  * (file, column) with Spark's own distributed BloomFilterAggregate over
  * `xxhash64(col)` — the hashing convention of the engine's runtime
  * filters. The filters land in per-column `_blooms_<col>.json` shards
  * next to the manifest, each published through the same atomic
  * [[CommitPublisher]] seam. The sidecar is auxiliary: absence (crash
  * between manifest and sidecar, pre-bloom versions, unsupported column
  * type, a budget too tight to fund useful filters) only disables the
  * optimization.
  *
  * Probe: the driver recomputes `xxhash64` of each external key — the
  * SAME hash the build side applied, via a local Catalyst eval of
  * [[XxHash64]] over a typed literal — and keeps a file iff ANY key might
  * be contained. Type discipline is what keeps this sound: xxhash64 of an
  * int and of a long differ, so the sidecar records the column's build
  * type and every key must convert LOSSLESSLY to it or the probe refuses
  * wholesale. Float/double/decimal columns are refused at build time
  * (±0.0 and NaN have multiple bit patterns that are SQL-equal but hash
  * differently — a false negative waiting to happen); string columns are
  * indexed only under the default binary collation (non-binary equality
  * is not byte equality).
  *
  * Scale stance: the sidecar is SHARDED one file per column
  * (`_blooms_<col>.json`) and probed lazily per column, so a 100k-file
  * table's driver never parses filters for columns a query doesn't
  * touch; decoded index bytes (filters + serialization headers) are HARD-
  * capped by `maxIndexBytes` — the bit budget degrades (higher false-
  * positive rate, weaker-but-sound pruning) down to a 1024-bit floor,
  * below which the build REFUSES to publish at all rather than overrun
  * the budget with useless filters (on-disk JSON carries the usual ~4/3
  * base64 framing on top). Probing is O(files · keys) bloom tests capped
  * by `maxProbes`, refusing (not subsetting — an absence proof must test
  * every key) beyond it. File immutability inside a committed version dir
  * is the versioned-table contract that makes a sidecar entry permanently
  * valid; files the sidecar does not cover are always kept. Pre-shard
  * monolithic `_blooms.json` sidecars keep probing unchanged.
  */
object BloomIndex {

  /** Legacy (pre-shard) monolithic sidecar — still read, never written. */
  val SidecarName = "_blooms.json"

  private val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** Per-column shard file. Identifier-safe column names embed verbatim;
    * anything else hashes to an 8-byte MD5 prefix (the shard records the
    * true name inside). Should two hashed names COLLIDE within one build,
    * the colliding columns fall back to [[fullShardName]] (r12 ADVICE —
    * a prefix collision must not make two columns write the same file,
    * silently losing one index); probes check both names.
    */
  def shardName(column: String): String = {
    val safe =
      if (column.matches("[A-Za-z0-9_]{1,64}")) column
      else fullDigest(column).take(16)
    s"_blooms_$safe.json"
  }

  /** Collision-proof long form: the full 32-hex MD5 digest. */
  def fullShardName(column: String): String =
    s"_blooms_${fullDigest(column)}.json"

  private def fullDigest(column: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(column.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** `typ` is the build-side column type (Spark catalogString) — the hash
    * domain every probe key must convert to losslessly. `files` maps
    * manifest-relative data-file paths to base64 bloom bits (the
    * BloomFilterImpl serialization Spark's might_contain consumes).
    */
  final case class ColBlooms(typ: String, files: Map[String, String])

  /** One shard: `col` is the true column name ([[shardName]] may hash). */
  final case class Shard(col: String, typ: String,
      files: Map[String, String])

  final case class Sidecar(cols: Map[String, ColBlooms])

  /** Decoded per-entry serialization overhead allowance (BloomFilterImpl
    * header) budgeted alongside the bits so the cap holds inclusive of
    * headers.
    */
  private val EntryOverheadBytes = 32L

  private implicit val formats: Formats = DefaultFormats

  /** Build per-file blooms for `columns` over a freshly committed version
    * dir and publish ONE SHARD PER COLUMN. Columns that don't exist,
    * aren't soundly hashable (float/double/decimal/non-binary collation),
    * or can't be sized (no row counts) are silently skipped — absence
    * never breaks reads. No-op when nothing qualifies, INCLUDING when the
    * byte budget cannot fund a useful (≥1024-bit) filter per (file,
    * column) pair: the budget is a hard cap, never overrun.
    */
  def build(spark: SparkSession, versionDir: Path, fileFormat: String,
      columns: Seq[String], m: TableManifest.Manifest,
      maxIndexBytes: Long = 64L << 20): Unit = {
    if (columns.isEmpty || m.files.isEmpty) return
    val df = spark.read.format(fileFormat).load(versionDir.toString)
    planBuild(df, versionDir, columns, m, maxIndexBytes).foreach { plan =>
      // one distributed pass, one row per data file — driver-side result is
      // files × columns × numBits/8 bytes, bounded by maxIndexBytes
      val rows = df.groupBy(input_file_name().as("_file"))
        .agg(plan.aggs.head, plan.aggs.tail: _*).collect()
      publishShards(versionDir, plan, rows, offset = 0)
    }
  }

  /** The planned build pass: qualifying (column, build type) pairs plus
    * the sized per-file BloomFilterAggregate columns, in lockstep order.
    */
  private[sinks] final case class BuildPlan(typed: Seq[(String, String)],
      aggs: Seq[org.apache.spark.sql.Column])

  /** The decision half of [[build]] (no Spark job): type qualification,
    * filter sizing from the manifest's footer counts, and the byte-budget
    * guard — `None` (with the same visible refusal log) when nothing
    * qualifies. Split out so a commit that also maintains exact sums can
    * fuse both enrichments into ONE pass over the fresh files
    * ([[graft.sinks.ObjectStoreSink]]): the aggs here compose with any
    * other per-file aggregate over the same `df`.
    */
  private[sinks] def planBuild(df: DataFrame, versionDir: Path,
      columns: Seq[String], m: TableManifest.Manifest,
      maxIndexBytes: Long = 64L << 20): Option[BuildPlan] = {
    if (columns.isEmpty || m.files.isEmpty) return None
    val typed = columns.distinct.flatMap { c =>
      df.schema.find(_.name == c).flatMap(f => buildType(f.dataType).map(c -> _))
    }
    if (typed.isEmpty) return None
    // size from the manifest's per-file footer counts (the largest file
    // bounds every filter's expected-item count)
    val perFile = m.files.map(_.rows)
    val expected0: Long =
      if (perFile.forall(_ >= 0)) math.max(64L, perFile.max)
      else if (m.rowCount >= 0)
        math.max(64L, 2L * m.rowCount / math.max(1, m.files.size))
      else return None // unsizable (non-parquet without counts): skip
    // BloomFilterAggregate's own item cap (runtime-filter conf default);
    // beyond it the filter saturates gracefully (higher fpp, still sound)
    val expected = math.min(expected0, 4000000L)
    // ~16 bits/item ≈ 0.05% fpp; degrade bits to stay inside the sidecar
    // budget (a coarser filter is still sound) — down to a floor below
    // which filters are noise: then REFUSE to build, honoring the cap
    val ideal = math.min(expected * 16L, 1L << 23)
    val entries = math.max(1L, m.files.size.toLong * typed.size)
    val budgetBits = (maxIndexBytes / entries - EntryOverheadBytes) * 8L
    if (budgetBits < 1024L) {
      // refusal must be VISIBLE: file-count growth silently disabling the
      // index reads as "queries got slow" to an operator (r12 ADVICE)
      log.warn(s"bloom index NOT built for $versionDir: ${m.files.size} " +
        s"files x ${typed.size} columns leaves ${budgetBits} bits/filter " +
        s"under the ${maxIndexBytes}B budget (< 1024-bit floor) — compact " +
        "the table or raise the budget to restore point-lookup skipping")
      return None
    }
    val numBits = math.min(ideal, budgetBits)
    val aggs = typed.map { case (c, _) =>
      GraftSqlBridge.column(new BloomFilterAggregate(
        GraftSqlBridge.expression(xxhash64(col(c))),
        Literal(expected), Literal(numBits)).toAggregateExpression())
        .as(s"bf_$c")
    }
    Some(BuildPlan(typed, aggs))
  }

  /** Publish one shard per planned column from the collected per-file
    * rows. `offset` = how many non-bloom aggregate columns precede the
    * plan's own in each row (0 when the pass was bloom-only); column 0 is
    * always the file name.
    */
  private[sinks] def publishShards(versionDir: Path, plan: BuildPlan,
      rows: Array[org.apache.spark.sql.Row], offset: Int): Unit = {
    val enc = Base64.getEncoder
    // hashed shard names that collide within THIS column set take the
    // collision-proof long form; a full-digest collision (an actual MD5
    // collision) drops the later column with a log, never overwrites
    val collided = plan.typed.map(_._1).groupBy(shardName)
      .filter(_._2.size > 1).values.flatten.toSet
    val written = scala.collection.mutable.Set[String]()
    plan.typed.zipWithIndex.foreach { case ((c, t), i) =>
      val files = rows.flatMap { r =>
        for {
          rel <- relPath(versionDir, r.getString(0))
          bits <- Option(r.get(i + 1 + offset)).map(_.asInstanceOf[Array[Byte]])
        } yield rel -> enc.encodeToString(bits)
      }.toMap
      val name = if (collided(c)) fullShardName(c) else shardName(c)
      if (!written.add(name))
        log.warn(s"bloom shard name collision on '$name' — column '$c' " +
          "not indexed")
      else
        // one atomic publish per column: a crash mid-build leaves whole-
        // column shards, and an uncovered column simply never prunes
        TableManifest.publisher.publish(versionDir, name,
          Serialization.writePretty(Shard(c, t, files)))
    }
  }

  /** Carry the previous version's shards into a link-append commit and
    * extend them over ONLY the new files. Per-file filters are
    * independent, so a carried entry stays bit-identical (the linked file
    * is the same inode at the same relative path) and only the freshly
    * written files get a build pass — an INSERT INTO never re-reads the
    * table to keep its point-lookup index. Columns whose carried build
    * type no longer matches the live schema keep their carried entries
    * (sound for the linked files) but are not extended — uncovered new
    * files are always kept by the probe contract. When the grown
    * files × columns total can no longer fund floor-size filters under
    * `maxIndexBytes`, the carried entries still publish (they exist and
    * are sound) and the extension is refused with the same visible log as
    * [[build]].
    */
  def carryAndExtend(spark: SparkSession, prevDir: Path, versionDir: Path,
      fileFormat: String, m: TableManifest.Manifest, carriedRel: Set[String],
      maxIndexBytes: Long = 64L << 20): Unit = {
    val df = newDf(spark, versionDir, fileFormat, m, carriedRel)
    planExtend(prevDir, versionDir, m, carriedRel, df, maxIndexBytes)
      .foreach { plan =>
        if (plan.aggs.isEmpty)
          publishExtended(versionDir, plan, Array.empty, offset = 0)
        else {
          val rows = df.get.groupBy(input_file_name().as("_file"))
            .agg(plan.aggs.head, plan.aggs.tail: _*).collect()
          publishExtended(versionDir, plan, rows, offset = 0)
        }
      }
  }

  /** The fresh (non-carried) files of a link commit as one DataFrame —
    * the table every extension aggregate (and any fused sum pass) runs
    * over. None when the commit added no files.
    */
  private[sinks] def newDf(spark: SparkSession, versionDir: Path,
      fileFormat: String, m: TableManifest.Manifest,
      carriedRel: Set[String]): Option[DataFrame] = {
    val newRels = m.files.map(_.path).filterNot(carriedRel)
    if (newRels.isEmpty) None
    else Some(spark.read.format(fileFormat)
      .load(newRels.map(r => versionDir.resolve(r).toString): _*))
  }

  /** The planned extension: carried filters (re-keyed to the files that
    * actually linked), the qualifying new columns, and the sized
    * aggregates — `aggs` empty means "publish the carried filters only"
    * (no new files, nothing qualifying, or the budget refused — with the
    * same visible log).
    */
  private[sinks] final case class ExtendPlan(
      carriedCols: Map[String, ColBlooms],
      typed: Seq[(String, String)],
      aggs: Seq[org.apache.spark.sql.Column])

  /** The decision half of [[carryAndExtend]] (no Spark job): None when
    * the prior version had no shards at all. Split out so a link commit
    * that also maintains exact sums fuses both enrichments into ONE pass
    * over the fresh files ([[graft.sinks.ObjectStoreSink]]).
    */
  private[sinks] def planExtend(prevDir: Path, versionDir: Path,
      m: TableManifest.Manifest, carriedRel: Set[String],
      df: Option[DataFrame],
      maxIndexBytes: Long = 64L << 20): Option[ExtendPlan] = {
    val prior = read(prevDir).map(_.cols).getOrElse(Map.empty)
    if (prior.isEmpty) return None
    // carried filters: only files that actually linked at the SAME rel
    // path (a name-disambiguated link loses its entry — kept-not-pruned)
    val carriedCols = prior.map { case (c, cb) =>
      c -> ColBlooms(cb.typ, cb.files.filter { case (rel, _) => carriedRel(rel) })
    }
    def carriedOnly = Some(ExtendPlan(carriedCols, Nil, Nil))
    val dff = df.getOrElse(return carriedOnly)
    val typed = carriedCols.toSeq.sortBy(_._1).flatMap { case (c, cb) =>
      dff.schema.find(_.name == c)
        .flatMap(f => buildType(f.dataType))
        .filter(_ == cb.typ).map(c -> _)
    }
    if (typed.isEmpty) return carriedOnly
    val newEntries = m.files.filter(e => !carriedRel(e.path)).map(_.rows)
    val expected0: Long =
      if (newEntries.forall(_ >= 0)) math.max(64L, newEntries.max)
      else return carriedOnly // unsizable new files
    val expected = math.min(expected0, 4000000L)
    val ideal = math.min(expected * 16L, 1L << 23)
    val entries = math.max(1L, m.files.size.toLong * typed.size)
    val budgetBits = (maxIndexBytes / entries - EntryOverheadBytes) * 8L
    if (budgetBits < 1024L) {
      log.warn(s"bloom index NOT extended for $versionDir: ${m.files.size} " +
        s"files x ${typed.size} columns leaves ${budgetBits} bits/filter " +
        s"under the ${maxIndexBytes}B budget (< 1024-bit floor) — carried " +
        "filters remain; compact or raise the budget to re-cover new files")
      return carriedOnly
    }
    val numBits = math.min(ideal, budgetBits)
    val aggs = typed.map { case (c, _) =>
      GraftSqlBridge.column(new BloomFilterAggregate(
        GraftSqlBridge.expression(xxhash64(col(c))),
        Literal(expected), Literal(numBits)).toAggregateExpression())
        .as(s"bf_$c")
    }
    Some(ExtendPlan(carriedCols, typed, aggs))
  }

  /** Publish every carried-plus-extended shard from the collected
    * per-file rows (empty rows/aggs publish the carried filters alone).
    * `offset` = non-bloom aggregate columns preceding the plan's own.
    */
  private[sinks] def publishExtended(versionDir: Path, plan: ExtendPlan,
      rows: Array[org.apache.spark.sql.Row], offset: Int): Unit = {
    val enc = Base64.getEncoder
    val extra: Map[String, Map[String, String]] =
      plan.typed.zipWithIndex.map { case ((c, _), i) =>
        c -> rows.flatMap { r =>
          for {
            rel <- relPath(versionDir, r.getString(0))
            bits <- Option(r.get(i + 1 + offset)).map(_.asInstanceOf[Array[Byte]])
          } yield rel -> enc.encodeToString(bits)
        }.toMap
      }.toMap
    val collided = plan.carriedCols.keys.toSeq.groupBy(shardName)
      .filter(_._2.size > 1).values.flatten.toSet
    val written = scala.collection.mutable.Set[String]()
    plan.carriedCols.toSeq.sortBy(_._1).foreach { case (c, cb) =>
      val name = if (collided(c)) fullShardName(c) else shardName(c)
      if (!written.add(name))
        log.warn(s"bloom shard name collision on '$name' — column '$c' " +
          "not carried")
      else TableManifest.publisher.publish(versionDir, name,
        Serialization.writePretty(
          Shard(c, cb.typ, cb.files ++ extra.getOrElse(c, Map.empty))))
    }
  }

  /** One column's filters: its shard first (short name, then the
    * collision-fallback long name), then the legacy monolithic sidecar —
    * the lazy per-column read path every probe goes through.
    */
  def readCol(versionDir: Path, column: String): Option[ColBlooms] = {
    def fromFile(name: String): Option[ColBlooms] = {
      val sf = versionDir.resolve(name)
      if (!Files.exists(sf)) None
      else
        try {
          val s = JsonMethods.parse(Files.readString(sf)).extract[Shard]
          // the recorded true name is ALWAYS checked — a same-named shard
          // holding a different column's filters never answers
          if (s.col == column) Some(ColBlooms(s.typ, s.files)) else None
        } catch { case _: Exception => None }
    }
    fromFile(shardName(column))
      .orElse(fromFile(fullShardName(column)))
      .orElse(readLegacy(versionDir).flatMap(_.cols.get(column)))
  }

  private def readLegacy(versionDir: Path): Option[Sidecar] = {
    val f = versionDir.resolve(SidecarName)
    if (!Files.exists(f)) None
    else
      try Some(JsonMethods.parse(Files.readString(f)).extract[Sidecar])
      catch { case _: Exception => None }
  }

  /** Assembled whole-index view (shards overlaid on any legacy sidecar) —
    * introspection/testing; probes use the lazy [[readCol]].
    */
  /** The shard sidecar files of a version dir (for metadata-only carries
    * like SHALLOW CLONE — shards key file paths the clone keeps verbatim).
    */
  def sidecarFiles(versionDir: Path): Seq[Path] =
    try {
      val s = Files.list(versionDir)
      try {
        import scala.jdk.CollectionConverters._
        s.iterator().asScala
          .filter(p => p.getFileName.toString.startsWith("_blooms_") &&
            p.getFileName.toString.endsWith(".json"))
          .toList
      } finally s.close()
    } catch { case _: Exception => Nil }

  def read(versionDir: Path): Option[Sidecar] = {
    val shards =
      try {
        val s = Files.list(versionDir)
        try {
          import scala.jdk.CollectionConverters._
          s.iterator().asScala
            .filter(p => p.getFileName.toString.startsWith("_blooms_") &&
              p.getFileName.toString.endsWith(".json"))
            .flatMap(p =>
              try Some(JsonMethods.parse(Files.readString(p)).extract[Shard])
              catch { case _: Exception => None })
            .map(sh => sh.col -> ColBlooms(sh.typ, sh.files))
            .toMap
        } finally s.close()
      } catch { case _: Exception => Map.empty[String, ColBlooms] }
    val legacy = readLegacy(versionDir).map(_.cols).getOrElse(Map.empty)
    val all = legacy ++ shards
    if (all.isEmpty) None else Some(Sidecar(all))
  }

  /** The subset of `files` that may hold a row with `column` equal to some
    * key in `keys`, by per-file bloom probes. None = no proof possible
    * (no sidecar, column not indexed, a key outside the build type's
    * lossless domain, or keys × files beyond `maxProbes`) — the caller
    * keeps its current file set. Files the sidecar doesn't cover are
    * kept. Null keys are dropped (`null = x` is never true); an empty
    * key set proves every file partner-free.
    */
  def pruneAmong(versionDir: Path, files: Seq[FileEntry], column: String,
      keys: Seq[Any], filesTotal: Int, totalBytes: Long,
      maxProbes: Long = 4000000L): Option[(Seq[FileEntry], PruneReport)] =
    for {
      cb <- readCol(versionDir, column) // lazy: only this column's shard
      nonNull = keys.filterNot(_ == null)
      if nonNull.size.toLong * files.size <= maxProbes
      hashes <- {
        val hs = nonNull.map(k => keyHash(cb.typ, k))
        if (hs.exists(_.isEmpty)) None else Some(hs.flatten)
      }
    } yield {
      val dec = Base64.getDecoder
      val kept = files.filter { fe =>
        cb.files.get(fe.path) match {
          case None => true // not covered → unknowable → keep
          case Some(b64) =>
            try {
              val bf = BloomFilter.readFrom(
                new ByteArrayInputStream(dec.decode(b64)))
              hashes.exists(bf.mightContainLong)
            } catch { case _: Exception => true } // corrupt entry → keep
        }
      }
      (kept, PruneReport(filesTotal, kept.size, totalBytes,
        kept.map(_.bytes).sum))
    }

  /** Whole-manifest convenience form of [[pruneAmong]]. */
  def prune(versionDir: Path, m: TableManifest.Manifest, column: String,
      keys: Seq[Any]): Option[(Seq[FileEntry], PruneReport)] =
    pruneAmong(versionDir, m.files, column, keys, m.files.size,
      m.files.map(_.bytes).sum)

  /** Column types the hash proof is sound for. Floating point is refused
    * (±0.0 / NaN bit-pattern aliases are SQL-equal but hash apart);
    * strings only under the default binary collation. Decimals ARE sound:
    * a column's scale is FIXED, so each value has exactly one
    * (unscaled, scale) representation and hashing is deterministic — the
    * shard records the full `decimal(p,s)` and every probe key must
    * rescale EXACTLY to s or the probe refuses (scale aliasing guarded at
    * probe time, not by refusing the build — r12 verdict #4).
    */
  private def buildType(dt: DataType): Option[String] = dt match {
    case LongType => Some("bigint")
    case IntegerType => Some("int")
    case ShortType => Some("smallint")
    case ByteType => Some("tinyint")
    case StringType => Some("string")
    case DateType => Some("date")
    case TimestampType => Some("timestamp")
    case d: DecimalType => Some(s"decimal(${d.precision},${d.scale})")
    case _ => None
  }

  private val DecimalTyp = raw"decimal\((\d+),(\d+)\)".r

  /** xxhash64 of an external key value AS the build-side type — a local
    * Catalyst eval of the same expression the build aggregated, so build
    * and probe hash identically. None = the key does not convert
    * losslessly (a long key probing an int column, a fractional key, a
    * foreign type): no proof, refuse.
    */
  private[sinks] def keyHash(typ: String, v: Any): Option[Long] = {
    val lit: Option[Literal] = typ match {
      case "bigint" => ZoneMap.asLong(v).map(Literal(_, LongType))
      case "int" => ZoneMap.asLong(v).collect {
        case l if l.isValidInt => Literal(l.toInt, IntegerType) }
      case "smallint" => ZoneMap.asLong(v).collect {
        case l if l.isValidShort => Literal(l.toShort, ShortType) }
      case "tinyint" => ZoneMap.asLong(v).collect {
        case l if l.isValidByte => Literal(l.toByte, ByteType) }
      case "string" => v match {
        case s: String => Some(Literal(UTF8String.fromString(s), StringType))
        case _ => None
      }
      case "date" => ZoneMap.asDays(v).collect {
        case d if d.isValidInt => Literal(d.toInt, DateType) }
      case "timestamp" => ZoneMap.asMicros(v).map(Literal(_, TimestampType))
      case DecimalTyp(p, s) =>
        // the key must rescale EXACTLY to the column's scale (setScale
        // throws on rounding) and fit its precision — scale aliasing
        // (1.0 vs 1.00) hashes apart, so an inexact key refuses
        try ZoneMap.asBigDec(v).map { bd =>
          val exact = bd.setScale(s.toInt)
          Literal(org.apache.spark.sql.types.Decimal(exact, p.toInt, s.toInt),
            DecimalType(p.toInt, s.toInt))
        } catch { case _: Exception => None }
      case _ => None
    }
    lit.map(l => new XxHash64(Seq(l), 42L)
      .eval(InternalRow.empty).asInstanceOf[Long])
  }

  /** Manifest-relative path of an `input_file_name()` URI under
    * `versionDir`; None for foreign/unparseable paths (never indexed).
    */
  private def relPath(versionDir: Path, uri: String): Option[String] =
    try {
      val p = Paths.get(java.net.URI.create(uri).getPath).normalize
      if (p.startsWith(versionDir.normalize))
        Some(versionDir.normalize.relativize(p).toString)
      else None
    } catch {
      case _: Exception =>
        try {
          val p = Paths.get(uri).normalize
          if (p.startsWith(versionDir.normalize))
            Some(versionDir.normalize.relativize(p).toString)
          else None
        } catch { case _: Exception => None }
    }
}
