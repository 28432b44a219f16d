package graft.tools

import org.apache.spark.sql.SparkSession

/** Repro driver for curate_documents timing behavior across repeated
  * evaluations in one JVM (bench-shaped loop: evaluate, release, repeat).
  */
object CurateProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.functions._
    import graft.pipeline.{CacheScope, Curation, Dedup, TextAnalysis}
    val gcTime = new java.util.concurrent.atomic.AtomicLong
    val runTime = new java.util.concurrent.atomic.AtomicLong
    val deserTime = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          val m = e.taskMetrics
          if (m != null) {
            gcTime.addAndGet(m.jvmGCTime)
            runTime.addAndGet(m.executorRunTime)
            deserTime.addAndGet(m.executorDeserializeTime)
          }
        }
      })
    def t[A](what: String)(body: => A): A = {
      val t0 = System.nanoTime()
      gcTime.set(0); runTime.set(0); deserTime.set(0)
      val r = body
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"CURATE_STAGE $what $dt%.2f s " +
        f"(taskRun=${runTime.get / 1000.0}%.1f gc=${gcTime.get / 1000.0}%.1f " +
        f"deser=${deserTime.get / 1000.0}%.1f)")
      r
    }
    (1 to 8).foreach { i =>
      if (i == 5) {
        println("CURATE_PROFILE === wholeStage codegen OFF from here ===")
        spark.conf.set("spark.sql.codegen.wholeStage", "false")
      }
      println(s"CURATE_PROFILE iter=$i")
      val docs = graft.Queries.docsForCuration(spark, sfDir)
      CacheScope.withScope { sc =>
        val base = docs.select(col("doc_id").as("id"), col("text"))
        val staged = TextAnalysis.withLangId(base, "text", as = "_lang")
          .withColumn("_lang_ok", col("_lang").isin("en"))
          .withColumn("_q_ok",
            TextAnalysis.qualityScore(col("text")) >= 40)
          .drop("_lang")
        val pkey = when(col("_lang_ok") && col("_q_ok"), md5(col("text")))
          .otherwise(concat(lit("r:"), col("id").cast("string")))
        val ranked = sc.persist(staged.withColumn("_rn",
          row_number().over(org.apache.spark.sql.expressions.Window
            .partitionBy(pkey).orderBy(col("id")))))
        t("ranked.count")(ranked.count())
        val exactKept = ranked
          .filter(col("_lang_ok") && col("_q_ok") && col("_rn") === 1)
          .select("id", "text")
        println("CURATE_STAGE survivors " + t("survivors.count")(
          exactKept.count()))
        val pairs = Dedup.ngramJaccardPairs(exactKept, "id", "text",
          threshold = 0.8, maxDocFreq = 0, scope = sc)
        println("CURATE_STAGE pairs " + t("pairs.count")(pairs.count()))
        val dropIds = pairs.select(col("id_b").as("id")).distinct()
          .withColumn("_near_dup", lit(true))
        val audit = ranked.join(dropIds, Seq("id"), "left")
          .withColumn("status", when(!col("_lang_ok"), "lang_filtered")
            .when(!col("_q_ok"), "quality_filtered")
            .when(col("_rn") > 1, "exact_dup")
            .when(col("_near_dup"), "near_dup").otherwise("kept"))
        t("audit.noop")(audit.write.format("noop").mode("overwrite").save())
      }
      t("full query noop")(
        graft.Queries.queries("curate_documents")(spark, sfDir)
          .write.format("noop").mode("overwrite").save())
      CacheScope.releaseSession(spark)
    }
    spark.stop()
  }
}
