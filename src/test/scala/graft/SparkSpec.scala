package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Shared local SparkSession for all suites (one JVM, one session — suite
  * startup cost is paid once). Config mirrors Verify/Bench so specs exercise
  * the same session the driver's gates use.
  */
object SparkSpec {
  lazy val spark: SparkSession = {
    val b = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir", "target/spark-warehouse")
      // mirrors Verify/Bench: full engine surface incl. the
      // maintenance-SQL parser (builder-time only)
      .config("spark.sql.extensions", "graft.GraftExtensions")
    Tables.requiredConfs.foreach { case (k, v) => b.config(k, v) }
    val s = b.getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
  val sfDir = "/root/testdata/sf0.001"

  private[graft] def deleteTree(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(deleteTree))
    f.delete(): Unit
  }
}

trait SparkSpec extends AnyFunSuite with Matchers {
  def spark: SparkSession = SparkSpec.spark
  def sfDir: String = SparkSpec.sfDir
  /** Fresh scratch dir under target/ for suites that write files; the whole
    * tree is removed recursively on JVM exit (deleteOnExit can't delete
    * non-empty directories).
    */
  def scratchDir(tag: String): java.io.File = {
    val d = java.nio.file.Files
      .createTempDirectory(java.nio.file.Paths.get("target"), s"graft-$tag-")
      .toFile
    Runtime.getRuntime.addShutdownHook(new Thread(() => SparkSpec.deleteTree(d)))
    d
  }
}
