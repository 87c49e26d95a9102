package graft

import java.io.BufferedOutputStream
import java.nio.file.{Files, Path, Paths}
import java.util.zip.{GZIPOutputStream, ZipEntry, ZipOutputStream}

import scala.jdk.CollectionConverters._
import scala.util.Using

import org.apache.commons.compress.archivers.tar.{TarArchiveEntry, TarArchiveOutputStream}
import org.scalatest.funsuite.AnyFunSuite

/** Round-trip test for the S3 job wrapper (ref s3-diag.sh:44-78) against
  * a `file:` "bucket", the same substitution DiagPipelineSpec uses for
  * the readers: pack the diag_mini fixture into an archive, drop it in a
  * bucket directory, run the job, and assert the reference's exact
  * output contract — `KEY-summary.json` + `KEY.xlsx` uploaded next to
  * the input and the input object deleted.
  */
class S3JobSpec extends AnyFunSuite with SparkTestBase {

  private val fixture = Paths.get("src/test/resources/diag_mini")

  private def fixtureFiles: Seq[Path] =
    Using.resource(Files.walk(fixture))(_.iterator().asScala.toList)
      .filter(Files.isRegularFile(_))

  /** Zip the fixture with every entry under top-level dir `stem/`. */
  private def makeZip(dest: Path, stem: String): Unit =
    Using.resource(new ZipOutputStream(new BufferedOutputStream(
        Files.newOutputStream(dest)))) { z =>
      fixtureFiles.foreach { f =>
        z.putNextEntry(new ZipEntry(s"$stem/${fixture.relativize(f)}"))
        z.write(Files.readAllBytes(f))
        z.closeEntry()
      }
    }

  private def makeTarGz(dest: Path, stem: String): Unit =
    Using.resource(new TarArchiveOutputStream(new GZIPOutputStream(
        new BufferedOutputStream(Files.newOutputStream(dest))))) { t =>
      t.setLongFileMode(TarArchiveOutputStream.LONGFILE_POSIX)
      fixtureFiles.foreach { f =>
        val e = new TarArchiveEntry(f.toFile, s"$stem/${fixture.relativize(f)}")
        t.putArchiveEntry(e)
        t.write(Files.readAllBytes(f))
        t.closeArchiveEntry()
      }
    }

  test("zip round-trip: fetch, run, upload summary+xlsx, delete input") {
    val bucket = Files.createTempDirectory("s3job-bucket-")
    val key = bucket.resolve("diag-cluster-1.zip")
    makeZip(key, "diag-cluster-1")
    val (sumUri, xlsxUri) =
      S3Job.run(spark, s"file:$key")
    // dest naming mirrors s3-diag.sh:76-78: KEY-summary.json / KEY.xlsx
    assert(sumUri.endsWith("diag-cluster-1-summary.json"))
    assert(xlsxUri.endsWith("diag-cluster-1.xlsx"))
    val sum = bucket.resolve("diag-cluster-1-summary.json")
    val xlsx = bucket.resolve("diag-cluster-1.xlsx")
    assert(Files.isRegularFile(sum), "summary.json uploaded to bucket")
    assert(Files.isRegularFile(xlsx), "xlsx uploaded to bucket")
    val sumText = Files.readString(sum)
    assert(sumText.contains("\"TestCluster\""), "summary carries the fixture cluster")
    // xlsx is a zip container: PK magic
    val magic = Files.readAllBytes(xlsx).take(2)
    assert(magic.sameElements(Array[Byte]('P', 'K')), "xlsx has zip magic")
    assert(!Files.exists(key), "input object deleted (aws s3 rm step)")
  }

  test("tar.gz round-trip with -keep_input leaves the input object") {
    val bucket = Files.createTempDirectory("s3job-bucket-")
    val key = bucket.resolve("diag2.tar.gz")
    makeTarGz(key, "diag2")
    S3Job.run(spark, s"file:$key", keepInput = true)
    assert(Files.isRegularFile(bucket.resolve("diag2-summary.json")))
    assert(Files.isRegularFile(bucket.resolve("diag2.xlsx")))
    assert(Files.exists(key), "-keep_input skips the delete step")
  }

  test("zip-slip entries are refused") {
    val bucket = Files.createTempDirectory("s3job-bucket-")
    val key = bucket.resolve("evil.zip")
    Using.resource(new ZipOutputStream(Files.newOutputStream(key))) { z =>
      z.putNextEntry(new ZipEntry("../outside.txt"))
      z.write("x".getBytes)
      z.closeEntry()
    }
    val e = intercept[Exception] { S3Job.run(spark, s"file:$key", keepInput = true) }
    assert(e.getMessage.contains("escapes extraction root"))
  }

  test("non-archive extension is rejected up front") {
    val e = intercept[RuntimeException] {
      S3Job.run(spark, "file:/tmp/not-an-archive.rar", keepInput = true)
    }
    assert(e.getMessage.contains("unsupported archive"))
  }
}
