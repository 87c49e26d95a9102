package graft
import org.apache.spark.sql.SparkSession

/** Dev tool: dump formatted plans for a few representative queries to
  * audit pushdown / pruning / join strategy (run via tools symlink). */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    // same session shape as Bench so audited plans match benched plans
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // same env override as Bench: plan census at other scale factors
    // (the sf1.0 soak re-checks the budgets against real file stats)
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    if (args.sameElements(Array("-counts"))) {
      // exchange census over every registered query (pre-AQE initial
      // plans — deterministic), the input to PlanBudgetSpec's budgets
      for (name <- SparkEntry.queries.keys.toSeq.sorted) {
        val plan = SparkEntry.queries(name)(spark, dir)
          .queryExecution.executedPlan.toString
        val ex = "Exchange ".r.findAllIn(plan).length
        println(s"COUNT $name $ex")
      }
    } else for (name <- args) {
      println(s"========== $name ==========")
      SparkEntry.queries(name)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
