package graft

import java.io.BufferedInputStream
import java.nio.file.{Files, Path => JPath}
import java.util.zip.GZIPInputStream

import scala.util.Using

import org.apache.commons.compress.archivers.tar.TarArchiveInputStream
import org.apache.commons.compress.archivers.zip.ZipArchiveInputStream
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** The reference's S3 job driver (s3-diag.sh:44-78) re-expressed over the
  * Hadoop FileSystem API: fetch the diag archive from object storage,
  * unpack it locally, run the full report, upload `summary.json` and the
  * xlsx workbook BACK next to the input key, and delete the input object.
  *
  * Using Hadoop FS instead of an S3 SDK call means every scheme the
  * cluster's FS config knows works unchanged — `s3a://bucket/key.zip` in
  * production, `file:///...` in tests (S3JobSpec drives the whole
  * round-trip against a local directory, the same way DiagPipelineSpec
  * tests the readers). Naming mirrors the reference exactly:
  * `KEY.zip` → `KEY-summary.json` + `KEY.xlsx`, and the archive is
  * expected to unpack into a directory named after its own basename
  * (s3-diag.sh:64-70: `unzip` / `tar -xvf` then `explore.py -p
  * ${ORIGINALNAME%POSTFIX}`). The reference's telemetry and
  * secrets-cleanup calls are vendor-service side effects, not data
  * processing, and are deliberately not reproduced.
  */
object S3Job {

  /** usage: S3Job [-tp_* n …] [-incl_sys] [-keep_input] <archiveUri>
    * `archiveUri` is any Hadoop-FS URI ending in `.zip` or `.tar.gz`.
    * `-keep_input` skips the reference's final `aws s3 rm` step.
    */
  def main(args: Array[String]): Unit = {
    val keepInput = args.contains("-keep_input")
    val (pos, tp, inclSys) = DiagReport.parseArgs(args.toSeq.filterNot(_ == "-keep_input"))
    require(pos.length == 1, "usage: S3Job [-tp_* n ...] [-keep_input] <archiveUri>")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val (sum, xlsx) = run(spark, pos.head, tp, inclSys, keepInput)
    println(s"uploaded $sum")
    println(s"uploaded $xlsx")
    spark.stop()
  }

  /** Fetch→unpack→report→upload→cleanup for one archive. Returns the
    * (summaryUri, xlsxUri) the results were uploaded to. The local
    * scratch directory is always removed; the INPUT object is removed
    * only when `keepInput` is false (the reference's default). */
  def run(spark: SparkSession, archiveUri: String,
      tp: model.Thresholds = model.Thresholds(), inclSys: Boolean = false,
      keepInput: Boolean = false): (String, String) = {
    val src = new Path(archiveUri)
    val fs = src.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val name = src.getName
    val stem =
      if (name.endsWith(".zip")) name.dropRight(4)
      else if (name.endsWith(".tar.gz")) name.dropRight(7)
      else sys.error(s"unsupported archive (want .zip or .tar.gz): $name")
    val work = Files.createTempDirectory("graft-s3job-")
    try {
      val local = work.resolve(name)
      fs.copyToLocalFile(false, src, new Path(local.toUri), true)
      unpack(local, work)
      val root = work.resolve(stem)
      require(Files.isDirectory(root),
        s"archive did not unpack to its basename directory '$stem' (s3-diag.sh expects ORIGINALNAME%POSTFIX)")
      val outDir = work.resolve("report")
      DiagReport.runRoots(spark, Seq(root.toString), outDir.toString, tp, inclSys)
      val parent = src.getParent
      val sumDest = new Path(parent, s"$stem-summary.json")
      val xlsxLocal = Using.resource(Files.list(outDir)) { s =>
        s.filter(_.toString.endsWith(".xlsx")).findFirst()
          .orElseThrow(() => new IllegalStateException(s"no xlsx produced under $outDir"))
      }
      val xlsxDest = new Path(parent, s"$stem.xlsx")
      fs.copyFromLocalFile(false, true, new Path(outDir.resolve("summary.json").toUri), sumDest)
      fs.copyFromLocalFile(false, true, new Path(xlsxLocal.toUri), xlsxDest)
      if (!keepInput) fs.delete(src, false)
      (sumDest.toString, xlsxDest.toString)
    } finally deleteRecursively(work)
  }

  /** Unpack a `.zip` or `.tar.gz` under `dest`, refusing entries that
    * escape it (zip-slip) — archives here arrive from user uploads. */
  private[graft] def unpack(archive: JPath, dest: JPath): Unit = {
    val in = new BufferedInputStream(Files.newInputStream(archive))
    val s = archive.toString
    val arch =
      if (s.endsWith(".zip")) new ZipArchiveInputStream(in)
      else new TarArchiveInputStream(new GZIPInputStream(in))
    try {
      Iterator.continually(arch.getNextEntry).takeWhile(_ != null).foreach { e =>
        val target = dest.resolve(e.getName).normalize()
        require(target.startsWith(dest), s"archive entry escapes extraction root: ${e.getName}")
        if (e.isDirectory) Files.createDirectories(target)
        else {
          Files.createDirectories(target.getParent)
          Files.copy(arch, target,
            java.nio.file.StandardCopyOption.REPLACE_EXISTING)
        }
      }
    } finally arch.close()
  }

  private def deleteRecursively(p: JPath): Unit =
    Using.resource(Files.walk(p)) { s =>
      s.sorted(java.util.Comparator.reverseOrder[JPath]()).forEach(Files.delete(_))
    }
}
