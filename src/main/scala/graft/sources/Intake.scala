package graft.sources

import java.io.{BufferedInputStream, FileInputStream, FileOutputStream}
import java.nio.file.{Files, Path, Paths}
import org.apache.commons.compress.archivers.tar.TarArchiveInputStream
import org.apache.commons.compress.archivers.zip.ZipArchiveInputStream
import java.util.zip.GZIPInputStream

/** File-intake front door (S1/S8/S9): filename-convention parsing, bulk
  * manifest resolution, and archive expansion — the driver-side pre-step
  * before Spark readers take over.
  *
  * Conventions (reference DatasetMetadataUtil.scala:33-183):
  *   - data file:  `[dataset].[publisher-token].[anything...].dataset.[ext]`
  *   - manifest:   `[dataset].[...].metadata.json` with
  *                 `{"dataset": ..., "dataFilePath": dir, "bulkUpload": true}`
  *                 → every file under `dataFilePath` is one logical load
  *   - archives:   `.zip/.gz/.tar/.jar` expand to a temp dir (junk entries
  *                 skipped: directories, `__MAC*`, `META-INF`, `./._*`),
  *                 then the expanded dir is read as a bulk load.
  *
  * At scale the expansion step stays a driver/edge-node concern (object
  * stores deliver archives as single blobs); everything after — the actual
  * read — is a Spark multi-file scan over the expanded directory.
  */
object Intake {

  final case class DatasetMetadata(
      dataset: String,
      publisherToken: String,
      paths: Seq[String],
      bulkUpload: Boolean = false)

  private val ArchiveExts = Set("zip", "gz", "tar", "jar")

  /** Resolve an arriving file into (dataset, file list to read). */
  def resolve(pathStr: String): DatasetMetadata = {
    val fileName = Paths.get(pathStr).getFileName.toString
    val parts = fileName.split('.')
    val ext = parts.last.toLowerCase
    if (fileName.endsWith(".metadata.json")) readManifest(pathStr, parts.head)
    else if (ArchiveExts(ext)) {
      val dir = expandArchive(pathStr, ext)
      DatasetMetadata(parts.head, tokenOf(parts),
        listFiles(dir).map(_.toString), bulkUpload = true)
    } else {
      require(parts.length >= 3 && parts.contains("dataset"),
        s"file name '$fileName' does not match [dataset].[token].[...].dataset.[ext]")
      DatasetMetadata(parts.head, tokenOf(parts), Seq(pathStr))
    }
  }

  private def tokenOf(parts: Array[String]): String =
    if (parts.length >= 4) parts(1) else ""

  private def readManifest(path: String, dataset: String): DatasetMetadata = {
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    implicit val fmts: Formats = DefaultFormats
    val j = JsonMethods.parse(new String(Files.readAllBytes(Paths.get(path)), "UTF-8"))
    val ds = (j \ "dataset").extractOpt[String].getOrElse(dataset)
    val dataFilePath = (j \ "dataFilePath").extract[String]
    val bulk = (j \ "bulkUpload").extractOpt[Boolean].getOrElse(true)
    // the manifest may live inside the directory it points at — it is
    // metadata, never data, so exclude manifests from the load set
    val files = listFiles(Paths.get(dataFilePath))
      .filterNot(_.getFileName.toString.endsWith(".metadata.json"))
    DatasetMetadata(ds, "", files.map(_.toString), bulk)
  }

  /** Expand one archive into a fresh temp dir; returns the dir. */
  def expandArchive(pathStr: String, ext: String): Path = {
    val outDir = graft.Scratch.freshOracle("graft-intake")
    val in = new BufferedInputStream(new FileInputStream(pathStr))
    try {
      ext match {
        case "zip" | "jar" =>
          val z = new ZipArchiveInputStream(in)
          var e = z.getNextEntry
          while (e != null) {
            if (!e.isDirectory && keep(e.getName)) writeEntry(z, outDir, e.getName)
            e = z.getNextEntry
          }
        case "tar" =>
          val t = new TarArchiveInputStream(in)
          var e = t.getNextEntry
          while (e != null) {
            if (!e.isDirectory && keep(e.getName)) writeEntry(t, outDir, e.getName)
            e = t.getNextEntry
          }
        case "gz" =>
          val base = Paths.get(pathStr).getFileName.toString.stripSuffix(".gz")
          writeEntry(new GZIPInputStream(in), outDir, if (base.isEmpty) "data" else base)
        case other =>
          throw new IllegalArgumentException(s"unsupported archive extension: $other")
      }
    } finally in.close()
    outDir
  }

  /** Junk-entry filter (reference DatasetMetadataUtil.scala:121-138). */
  private[sources] def keep(name: String): Boolean = {
    val base = name.split('/').last
    !name.startsWith("__MAC") && !name.startsWith("META-INF") &&
      !base.startsWith("._") && base.nonEmpty
  }

  private def writeEntry(in: java.io.InputStream, outDir: Path, name: String): Unit = {
    // Flatten entry paths: archives of data files carry no meaningful
    // directory structure, and flattening also neutralizes ../ traversal.
    val target = outDir.resolve(Paths.get(name).getFileName.toString)
    val out = new FileOutputStream(target.toFile)
    try in.transferTo(out) finally out.close()
  }

  private def listFiles(dir: Path): Seq[Path] = {
    val s = Files.list(dir)
    try {
      import scala.jdk.CollectionConverters._
      s.iterator().asScala.filter(Files.isRegularFile(_)).toVector.sortBy(_.toString)
    } finally s.close()
  }
}
