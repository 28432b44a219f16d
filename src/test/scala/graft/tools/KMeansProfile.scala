package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev profiling driver for the k-means train path (not a test). */
object KMeansProfile {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val e = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    e.count()
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"STAGE $name: ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    import graft.pipeline.KMeans
    for (round <- 1 to 3) {
      println(s"--- round $round")
      val init = t("init")(KMeans.initCentroids(e, "vec_id", "embedding", 5))
      val c1 = t("lloyd1")(KMeans.lloydRound(e, "embedding", init))
      val c2 = t("lloyd2")(KMeans.lloydRound(e, "embedding", c1))
      t("assign-count")(KMeans.assign(e, "embedding",
        KMeans.Model(c2, KMeans.defaultScale)).count())
    }
    spark.stop()
  }
}
