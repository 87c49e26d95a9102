package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.TextAnalysis

/** Dev tool: the model-scale BPE measurements r10's verdict asked for —
  * (1) the batched-training rounds/scan curve (seconds per scan and
  * total wall for the same merge count at k = 1 / 8 / 64), and (2) the
  * lexicon (bpeWordsFrom) build time against a 32k-row merges table.
  * Results recorded in SCALING.md.
  *
  * Usage: runMain graft.tools.BpeBench [srcDir] [rounds]
  */
object BpeBench {
  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf1.0")
    val rounds = args.lift(1).map(_.toInt).getOrElse(64)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val words = spark.read.parquet(s"$src/documents.parquet")
      .select(explode(split(lower(trim(col("text"))), "\\s+")).as("tok"))
      .filter(col("tok") =!= "")
    val nWords = words.distinct().count()
    println(s"corpus $src: $nWords distinct words")

    for (k <- Seq(1, 8, 64)) {
      var scans = 0
      var scanSecs = List.empty[Double]
      val t0 = System.nanoTime()
      val mg = TextAnalysis.bpeMergesBatched(spark, words, rounds, k,
        onScan = (_, _, s) => { scans += 1; scanSecs ::= s })
      val n = mg.count()
      val total = (System.nanoTime() - t0) / 1e9
      println(f"TRAIN k=$k%-3d rounds=$n%d scans=$scans%d " +
        f"total=$total%.1f s avg_scan=${scanSecs.sum / scans}%.2f s " +
        f"projected_32k=${total / n * 32768 / 60}%.1f min")
    }

    // lexicon build against a 32k-row artifact: the learned table padded
    // with never-adjacent pairs exercises the map sizes without changing
    // the encode (BpeScaleSpec pins the identity)
    import spark.implicits._
    val learned = TextAnalysis
      .bpeMergesBatched(spark, words, TextAnalysis.BpeRounds, 1)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq
    val padded = learned ++ ((learned.length + 1) to 32768)
      .map(i => (i.toLong, s"①x$i", s"②y$i"))
    val t1 = System.nanoTime()
    val lex = TextAnalysis.bpeWordsFrom(spark, words.distinct(),
      padded.toDF("rank", "l", "r"))
    val lexN = lex.count()
    println(f"LEXICON 32k-merge fold over $lexN%d words: " +
      f"${(System.nanoTime() - t1) / 1e9}%.1f s")
    spark.stop()
  }
}
