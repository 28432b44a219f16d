package graft.tools
import graft.pipeline.CacheScope
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** One-off probe: execute the simhash_index gate query, then dump the
  * FINAL adaptive plan so the verify-join strategy (broadcast vs SMJ) and
  * the rank-cap window exchanges are visible post-AQE.
  */
object SimhashIndexPlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.Queries.queries("simhash_index_documents")(spark,
      "/root/testdata/sf0.1")
    df.write.format("noop").mode("overwrite").save()
    val plan = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan.toString
      case p => p.toString
    }
    // summarize: joins + exchanges only, full plan is thousands of lines
    plan.linesIterator
      .filter(l => l.contains("Join") || l.contains("Exchange") ||
        l.contains("Window") || l.contains("Sort "))
      .foreach(l => println("PLAN| " + l.trim.take(200)))
    CacheScope.releaseSession(spark)
    spark.stop()
  }
}
