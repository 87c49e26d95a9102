package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.Dedup

/** Dev tool: the r12-verdict-#3 ROUTING sweep — attribute the clustered
  * sf1.0 recall ceiling (0.54 at every nprobe/shortlist,
  * `IVFPQ_SWEEP_SF1_CLUSTERED.json`) to its structural cause and
  * measure the fix. For each (cells, cap, spill) config this builds the
  * learned coarse index EXACTLY as the engine does (hash init + 2
  * grid-exact Lloyd rounds, closing M-step, per-cell vec_id-ranked cap,
  * optional spill-to-2nd-best-cell) and reports recall@5 of exact
  * in-cell probing at nprobe 1 and 2 against the brute-force ground
  * truth, plus the membership accounting (vectors lost to the cap,
  * cells at cap). One JSON line per config; the adopted operating point
  * is the engine's `ivfCells` formula + spill (Similarity.ivfMembers).
  * usage: IvfRouteSweep <clusteredSfDir>
  */
object IvfRouteSweep {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftFunctions.register(spark)
    import spark.implicits._

    val e = Tables.embeddings(spark, sfDir)
    val el = e.select(col("vec_id"), posexplode(col("embedding")).as(Seq("pos", "x")))
      .withColumn("x", col("x").cast("double"))
      .persist()
    val nEmb = e.count()
    val vnorm = el.groupBy(col("vec_id"))
      .agg(sum(Dedup.gridL(col("x") * col("x"))).as("vn2")).persist()

    def cosineC(dot: org.apache.spark.sql.Column,
        n1: org.apache.spark.sql.Column, n2: org.apache.spark.sql.Column) =
      dot.cast("double") / (sqrt(n1.cast("double")) * sqrt(n2.cast("double")))

    // ground truth: exact top-5 per query (vec_id < 10), engine tie-break
    val qel = el.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("pos"), col("x").as("qx"))
    val exact = qel.join(el.withColumnRenamed("vec_id", "neighbor_id")
        .withColumnRenamed("x", "nx"), Seq("pos"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .groupBy(col("query_id"), col("neighbor_id"))
      .agg(sum(Dedup.gridL(col("qx") * col("nx"))).as("dot"))
      .join(vnorm.withColumnRenamed("vec_id", "query_id")
        .withColumnRenamed("vn2", "qn2"), Seq("query_id"))
      .join(vnorm.withColumnRenamed("vec_id", "neighbor_id")
        .withColumnRenamed("vn2", "nn2"), Seq("neighbor_id"))
      .withColumn("cosine", cosineC(col("dot"), col("qn2"), col("nn2")))
      .withColumn("rank", row_number().over(Window.partitionBy(col("query_id"))
        .orderBy(col("cosine").desc, col("neighbor_id"))))
      .filter(col("rank") <= 5)
      .select(col("query_id"), col("neighbor_id")).persist()
    val nExact = exact.count()

    def lloyd(k: Int): (DataFrame, DataFrame, DataFrame) = {
      var assign = e.select(col("vec_id"))
        .withColumn("cell",
          (Dedup.h60(concat(lit("ivf"), col("vec_id"))) % k).cast("int"))
      def centOf(a: DataFrame) = el.join(a, Seq("vec_id"))
        .groupBy(col("cell"), col("pos"))
        .agg((sum(Dedup.gridL(col("x"))).cast("double") / 1e9 /
          count(lit(1))).as("c"))
      for (_ <- 1 to 2) {
        val cent = centOf(assign)
        val centN = cent.groupBy(col("cell"))
          .agg(sum(Dedup.gridL(col("c") * col("c"))).as("cn2"))
        assign = el.join(broadcast(cent), Seq("pos"))
          .groupBy(col("vec_id"), col("cell"))
          .agg(sum(Dedup.gridL(col("x") * col("c"))).as("dotvc"))
          .join(broadcast(centN), Seq("cell"))
          .join(vnorm, Seq("vec_id"))
          .withColumn("d2", col("vn2") - lit(2L) * col("dotvc") + col("cn2"))
          .groupBy(col("vec_id"))
          .agg(min(struct(col("d2"), col("cell"))).as("m"))
          .select(col("vec_id"), col("m.cell").as("cell"))
      }
      val a = assign.persist()
      val cf = centOf(a).persist()
      val cfn = cf.groupBy(col("cell"))
        .agg(sum(Dedup.gridL(col("c") * col("c"))).as("cn2")).persist()
      (a, cf, cfn)
    }

    def membersOf(assign: DataFrame, cf: DataFrame, cfn: DataFrame,
        cap: Int, spill: Boolean): DataFrame = {
      val wCell = Window.partitionBy(col("cell")).orderBy(col("vec_id"))
      val pr = assign.withColumn("rn", row_number().over(wCell))
      val kept1 = pr.filter(col("rn") <= cap)
        .select(col("vec_id"), col("cell"), lit(0).as("sp"))
      if (!spill) kept1.select("vec_id", "cell")
      else {
        val ovf = pr.filter(col("rn") > cap)
          .select(col("vec_id"), col("cell").as("pcell"))
        val spilled = el.join(ovf, Seq("vec_id"))
          .join(broadcast(cf), Seq("pos"))
          .groupBy(col("vec_id"), col("pcell"), col("cell"))
          .agg(sum(Dedup.gridL(col("x") * col("c"))).as("dotvc"))
          .filter(col("cell") =!= col("pcell"))
          .join(broadcast(cfn), Seq("cell"))
          .join(vnorm, Seq("vec_id"))
          .withColumn("d2", col("vn2") - lit(2L) * col("dotvc") + col("cn2"))
          .groupBy(col("vec_id"))
          .agg(min(struct(col("d2"), col("cell"))).as("m"))
          .select(col("vec_id"), col("m.cell").as("cell"), lit(1).as("sp"))
        val wFill = Window.partitionBy(col("cell"))
          .orderBy(col("sp"), col("vec_id"))
        kept1.unionByName(spilled)
          .withColumn("rn", row_number().over(wFill))
          .filter(col("rn") <= cap)
          .select("vec_id", "cell")
      }
    }

    def recallAt(members: DataFrame, cf: DataFrame, cfn: DataFrame,
        nprobe: Int): Double = {
      val qc = qel.join(cf.withColumnRenamed("cell", "ccell"), Seq("pos"))
        .groupBy(col("query_id"), col("ccell"))
        .agg(sum(Dedup.gridL(col("qx") * col("c"))).as("dotqc"))
        .join(vnorm.withColumnRenamed("vec_id", "query_id")
          .withColumnRenamed("vn2", "qn2"), Seq("query_id"))
        .join(cfn.withColumnRenamed("cell", "ccell"), Seq("ccell"))
        .withColumn("ccos", cosineC(col("dotqc"), col("qn2"), col("cn2")))
      val best = qc.withColumn("rn",
          row_number().over(Window.partitionBy(col("query_id"))
            .orderBy(col("ccos").desc, col("ccell"))))
        .filter(col("rn") <= nprobe).select(col("query_id"), col("ccell"))
      val cand = members.join(broadcast(best), col("cell") === col("ccell"))
        .filter(col("vec_id") =!= col("query_id"))
        .select(col("query_id"), col("vec_id").as("neighbor_id"))
      val top5 = cand
        .join(el.withColumnRenamed("vec_id", "neighbor_id")
          .withColumnRenamed("x", "nx"), Seq("neighbor_id"))
        .join(qel, Seq("query_id", "pos"))
        .groupBy(col("query_id"), col("neighbor_id"))
        .agg(sum(Dedup.gridL(col("qx") * col("nx"))).as("dot"))
        .join(vnorm.withColumnRenamed("vec_id", "query_id")
          .withColumnRenamed("vn2", "qn2"), Seq("query_id"))
        .join(vnorm.withColumnRenamed("vec_id", "neighbor_id")
          .withColumnRenamed("vn2", "nn2"), Seq("neighbor_id"))
        .withColumn("cosine", cosineC(col("dot"), col("qn2"), col("nn2")))
        .withColumn("rank", row_number().over(Window.partitionBy(col("query_id"))
          .orderBy(col("cosine").desc, col("neighbor_id"))))
        .filter(col("rank") <= 5)
        .select(col("query_id"), col("neighbor_id"))
      top5.join(exact, Seq("query_id", "neighbor_id")).count().toDouble / nExact
    }

    val adoptedK = graft.operators.Similarity.ivfCellsOf(nEmb)
    println(s"""{"sf_dir":"$sfDir","n_emb":$nEmb,"adopted_cells":$adoptedK,"n_exact":$nExact}""")
    val configs = Seq(
      (10, 1000, false),   // r12 shipped: the 0.54 ceiling
      (10, 1000, true),    // spill alone (capacity still 10*cap < n)
      (10, 100000, false), // cap lifted: isolates the cap as the cause
      (40, 1000, false),   // adopted cells, no spill
      (40, 1000, true),    // ADOPTED: ivfCells(n)=40 + spill
      (100, 1000, true))   // geometry-matched k (100 true centers)
    configs.foreach { case (k, cap, spill) =>
      val t0 = System.nanoTime()
      val (a, cf, cfn) = lloyd(k)
      val members = membersOf(a, cf, cfn, cap, spill).persist()
      val nKept = members.count()
      val cellsAtCap = members.groupBy(col("cell"))
        .agg(count(lit(1)).as("n")).filter(col("n") >= cap).count()
      val r1 = recallAt(members, cf, cfn, 1)
      val r2 = recallAt(members, cf, cfn, 2)
      // nprobe 4 (r14): on natural-geometry corpora the recall limiter
      // is cell-boundary routing, not capacity — the np4 column shows
      // where the serving dial saturates
      val r4 = recallAt(members, cf, cfn, 4)
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"""{"cells":$k,"cap":$cap,"spill":$spill,"recall5_np1":$r1%.3f,"recall5_np2":$r2%.3f,"recall5_np4":$r4%.3f,"members_kept":$nKept,"members_lost":${nEmb - nKept},"cells_at_cap":$cellsAtCap,"wall_sec":$secs%.1f}""")
      members.unpersist(); a.unpersist(); cf.unpersist(); cfn.unpersist()
    }
    spark.stop()
  }
}
