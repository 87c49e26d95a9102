package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Multimodal

/** The decoded-pixel layer now carries the mm01 metadata decode, the
  * mm02 sampled frame hashes, and the mm03 resize inputs (r13 verdict
  * #2 — finish the layer doctrine on the mm family). This spec pins
  * layer-served ≡ pre-layer legacy for each, on a corpus whose shape
  * exercises both containers (even/odd doc_ids), all channel counts
  * (mod 3), multi-frame clips, and the upscale branch of mm03.
  */
class MultimodalLayerSpec extends AnyFunSuite with SparkTestBase {

  private lazy val dir: String = {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft_mmlayer").toString
    // n_chars spread: small (upscale branch, few frames) through large
    // (downscale, many sampled frames); text drives the body fingerprint
    val docs = (0L until 120L).map { i =>
      val text = s"doc $i " + ("body word " * ((i % 37).toInt + 1)).trim
      (i, text, "en", "u", text.length.toLong)
    }
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .repartition(4).write.parquet(s"$d/documents.parquet")
    d
  }

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.mkString("|")).sorted.toSeq

  test("mm01: layer metadata columns equal the per-query header decode") {
    assert(rows(Multimodal.mm01(spark, dir)) ==
      rows(Multimodal.mm01Legacy(spark, dir)))
  }

  test("mm02: exploded layer frame hashes equal the per-query md5 pass") {
    val layer = Multimodal.mm02(spark, dir)
    assert(rows(layer) == rows(Multimodal.mm02Legacy(spark, dir)))
    // every clip's sampled frame count: ceil(n_frames / 10) rows
    import org.apache.spark.sql.functions._
    val bad = layer.groupBy("doc_id", "n_frames")
      .agg(count(lit(1)).as("n"), max("frame_idx").as("mx"))
      .filter(col("n") =!= ((col("n_frames") + 9) / 10).cast("long") ||
        col("mx") % 10 =!= 0)
    assert(bad.count() == 0)
  }

  test("mm03: layer-served resize plan equals the per-query decode path") {
    assert(rows(Multimodal.mm03(spark, dir)) ==
      rows(Multimodal.mm03Legacy(spark, dir)))
  }
}
