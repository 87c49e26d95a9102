package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: the natural-text audit (r12 verdict #4) — run the
  * text/BPE/LM/dedup family on the harvested natural-English corpus
  * (tools/gen_natural.py) and print the distribution numbers that
  * guard the operators against synthetic-Zipf overfitting: langid hit
  * rate on real English, gate drop-rate mix, quality-score spread, BPE
  * fertility under the committed 32k artifact, perplexity spread, and
  * dd04↔dd12 top-pair agreement.
  *
  * r14 additions: pass a merges parquet as the second arg to ALSO
  * serve ta17 from that trained table via the ta17With swap hook (the
  * r13 fertility-5.26 finding was measured under a dev lexicon; the
  * natural-trained 32k artifact is the honest number), and when the
  * corpus carries the hashed-BoW natural embeddings
  * (gen_natural.py --emb-bow) the audit prints the ANN/dd07/dd10
  * numbers on vectors with REAL cluster structure — the last family
  * whose quality numbers rested entirely on synthetic geometry.
  * usage: NaturalAudit <naturalDir> [mergesParquet]
  */
object NaturalAudit {
  def main(args: Array[String]): Unit = {
    val dir = args.head
    val mergesPath = args.lift(1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def q(name: String) = graft.SparkEntry.queries(name)(spark, dir)

    val docs = graft.Tables.documents(spark, dir).count()
    println(s"docs=$docs")

    val lang = q("ta01_langid").agg(
      avg(col("is_match").cast("double")).as("en_hit"),
      avg((col("predicted") === "en").cast("double")).as("pred_en")).head()
    println(f"ta01 langid: predicted_en=${lang.getDouble(1)}%.3f (labels are all en; hit=${lang.getDouble(0)}%.3f)")

    q("ta08_quality_gate").groupBy(col("drop_reason")).count()
      .orderBy(col("drop_reason")).collect()
      .foreach(r => println(f"ta08 gate: ${r.getString(0)}%-15s ${r.getLong(1)} (${100.0 * r.getLong(1) / docs}%.1f%%)"))

    val ta02 = q("ta02_quality_score").agg(
      avg("score"), stddev("score"), avg(col("low_quality").cast("double"))).head()
    println(f"ta02 quality: mean=${ta02.getDouble(0)}%.3f sd=${ta02.getDouble(1)}%.3f low_quality=${ta02.getDouble(2)}%.3f")

    val fert = q("ta17_bpe_encode")
      .agg(sum("n_bpe").cast("double"), sum("n_tokens").cast("double"),
        count(lit(1))).head()
    println(f"ta17 bpe (dev lexicon trained on THIS corpus): fertility=${fert.getDouble(0) / fert.getDouble(1)}%.3f over ${fert.getLong(2)} in-lexicon docs")
    // lexicon coverage: docs the encode dropped (all-OOV under the
    // Zipf-trained lexicon) are the overfitting signal
    println(f"ta17 coverage: ${fert.getLong(2)}/$docs docs had >=1 in-lexicon token")

    val ppl = q("ta12_lm_perplexity").agg(
      avg("ppl"), stddev("ppl"), min("ppl"), max("ppl")).head()
    println(f"ta12 perplexity: mean=${ppl.getDouble(0)}%.1f sd=${ppl.getDouble(1)}%.1f min=${ppl.getDouble(2)}%.1f max=${ppl.getDouble(3)}%.1f")

    val dd01 = q("dd01_exact_dedup").agg(
      avg(col("is_dup").cast("double")), countDistinct(col("sig"))).head()
    println(f"dd01 exact: dup_rate=${dd01.getDouble(0)}%.3f distinct_sigs=${dd01.getLong(1)}")

    def pairs(name: String) = q(name)
      .select(col("d1"), col("d2")).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val p04 = pairs("dd04_ngram_jaccard_topk")
    val p12 = pairs("dd12_ngram_jaccard_lsh")
    println(s"dd04/dd12 top-20 agreement: ${(p04 & p12).size}/20 " +
      s"(dd04-only=${(p04 -- p12).size}, dd12-only=${(p12 -- p04).size})")

    val dd05 = q("dd05_simhash_sig").select(col("simhash")).distinct().count()
    println(s"dd05 simhash: $dd05 distinct signatures")

    // ta17 under an explicitly trained merge table (the natural 32k
    // artifact): fertility + coverage without the dev-lexicon caveat
    for (mp <- mergesPath) {
      graft.functions.GraftFunctions.register(spark)
      import graft.operators.TextAnalysis
      val words = graft.Tables.documents(spark, dir)
        .select(explode(call_function("tok_split", col("text"))).as("tok"))
        .filter(col("tok") =!= "").distinct()
      val lex = TextAnalysis.bpeWordsFrom(spark, words,
        spark.read.parquet(mp))
      val f = TextAnalysis.ta17With(spark, dir, lex)
        .agg(sum("n_bpe").cast("double"), sum("n_tokens").cast("double"),
          count(lit(1))).head()
      println(f"ta17 bpe (trained table $mp): " +
        f"fertility=${f.getDouble(0) / f.getDouble(1)}%.3f over " +
        f"${f.getLong(2)} docs")
    }

    // ANN / embedding-family audit on the hashed-BoW natural vectors:
    // exact-dup texts are identical vectors by construction, so the
    // geometry carries the corpus's real duplicate structure
    val dd07 = q("dd07_embedding_neardup").collect()
    val tight = dd07.count(_.getAs[Double]("cosine") >= 0.999)
    println(s"dd07 top-${dd07.length}: $tight pairs at cosine>=0.999")
    val dd10 = q("dd10_semantic_clusters")
    val cstats = dd10.agg(countDistinct(col("cluster_id")),
      max(col("cluster_size")), count(lit(1))).head()
    println(s"dd10 clusters: ${cstats.getLong(0)} clusters over " +
      s"${cstats.getLong(2)} member rows, max size ${cstats.getLong(1)}")
    spark.stop()
  }
}
