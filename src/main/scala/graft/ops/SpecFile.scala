package graft.ops

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** The tiny sidecar-spec protocol the derived artifacts share
  * ([[graft.dedup.DedupIndex]], [[graft.sim.AnnIndex]]): one small text
  * file of `#tag\tvalue` lines claimed exclusively at create, read
  * whole. Centralized so the claim/cleanup and read paths cannot drift
  * between the twins (and a half-written spec never bricks a root: a
  * FAILED write deletes its own claim). */
private[graft] object SpecFile {

  def fs(spark: SparkSession, p: Path): FileSystem =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  def b64e(s: String): String = java.util.Base64.getEncoder
    .encodeToString(s.getBytes(StandardCharsets.UTF_8))
  def b64d(s: String): String = new String(
    java.util.Base64.getDecoder.decode(s), StandardCharsets.UTF_8)

  /** Exclusive claim + write. A failure while WRITING deletes the claim
    * (a partial spec would block every retry and every read); losing
    * the claim race itself rethrows the caller's contract error. */
  def writeExclusive(spark: SparkSession, p: Path, text: String): Unit = {
    val f = fs(spark, p)
    val out = VersionedTable.createExclusive(f, p)
    try {
      try out.write(text.getBytes(StandardCharsets.UTF_8))
      finally out.close()
    } catch { case t: Throwable =>
      try f.delete(p, false)
      catch { case c: Throwable => t.addSuppressed(c) }
      throw t
    }
  }

  /** The whole file as text; FileNotFoundException with the caller's
    * message when absent. */
  def readText(spark: SparkSession, p: Path, missing: => String): String = {
    val f = fs(spark, p)
    if (!f.exists(p)) throw new java.io.FileNotFoundException(missing)
    val in = f.open(p)
    try {
      val out = new java.io.ByteArrayOutputStream()
      org.apache.hadoop.io.IOUtils.copyBytes(in, out, 65536, false)
      new String(out.toByteArray, StandardCharsets.UTF_8)
    } finally in.close()
  }

  /** Parse `#tag\tvalue` lines after validating the header prefix. */
  def tagged(text: String, header: String, at: => String)
      : Map[String, String] = {
    val lines = text.split("\n").filter(_.nonEmpty)
    require(lines.headOption.exists(_.startsWith(header)),
      s"unrecognized spec at $at")
    lines.toSeq.collect {
      case l if l.startsWith("#") && l.contains('\t') =>
        val i = l.indexOf('\t')
        l.substring(1, i) -> l.substring(i + 1)
    }.toMap
  }
}
