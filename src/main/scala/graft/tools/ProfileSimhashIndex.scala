package graft.tools

import graft.Queries
import graft.pipeline.Dedup
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One-off stage-level profile of the `simhash_index_documents` probe —
  * the r9 bench's slowest entry. Times each sub-plan of
  * [[Dedup.simhashPairsFromIndex]] separately so the 5 s cost can be
  * attributed (data volume is tiny at sf0.1 — 5k docs — so the suspect
  * is per-stage overhead, not row count).
  */
object ProfileSimhashIndex {
  private def t[A](label: String)(body: => A): A = {
    val t0 = System.nanoTime()
    val r = body
    println(f"PROFILE $label%-40s ${(System.nanoTime() - t0) / 1e9}%.3f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val path = t("index build (fixture)") { Queries.simhashIndexFor(spark, dir) }

    if (args.contains("--explain")) {
      val corpus = Queries.rd(spark, dir, "documents")
        .select(col("doc_id"), col("text"))
      val batch = corpus.filter(col("doc_id") % 20 === 0)
        .select((col("doc_id") + 20000).as("doc_id"),
          concat(col("text"), lit(" zz qq xx")).as("text"))
      val df = Dedup.simhashPairsFromIndex(spark, path, batch, "doc_id",
        "text", threshold = 0.7, verifyRankCap = 32)
      df.write.format("noop").mode("overwrite").save()
      println("EXPLAIN-START")
      println(df.queryExecution.executedPlan.toString.linesIterator
        .filter(l => l.contains("Join") || l.contains("Exchange") ||
          l.contains("Window") || l.contains("Aggregate") ||
          l.contains("Scan") || l.contains("InMemory"))
        .map(_.take(150)).mkString("\n"))
      println("EXPLAIN-END")
      spark.stop()
      return
    }

    def once(label: String): Unit = {
      val corpus = Queries.rd(spark, dir, "documents")
        .select(col("doc_id"), col("text"))
      val batch = corpus.filter(col("doc_id") % 20 === 0)
        .select((col("doc_id") + 20000).as("doc_id"),
          concat(col("text"), lit(" zz qq xx")).as("text"))
      t(s"$label full probe") {
        Dedup.simhashPairsFromIndex(spark, path, batch, "doc_id", "text",
          threshold = 0.7, verifyRankCap = 32)
          .write.format("noop").mode("overwrite").save()
      }
      graft.pipeline.CacheScope.releaseSession(spark)
    }
    once("warm1"); once("warm2")

    // stage-by-stage: replicate the probe's internals with counts
    val corpus = Queries.rd(spark, dir, "documents")
      .select(col("doc_id"), col("text"))
    val batch = corpus.filter(col("doc_id") % 20 === 0)
      .select((col("doc_id") + 20000).as("doc_id"),
        concat(col("text"), lit(" zz qq xx")).as("text"))

    t("read params json") { spark.read.json(s"$path/params").head() }
    val fp = t("read fingerprints count") {
      val d = spark.read.parquet(s"$path/fingerprints"); d.count(); d
    }
    t("batch simhash kernel count") {
      Dedup.simhashDfJ(batch, "doc_id", "text").count()
    }
    t("batch shingleSets count") {
      Dedup.shingleSets(batch, "doc_id", "text", 3).count()
    }
    t("corpus shingle scan count") {
      spark.read.parquet(s"$path/shingles").count()
    }
    val shAll = Dedup.simhashDfJ(batch, "doc_id", "text")
      .withColumn("new", lit(true))
      .union(fp.withColumn("new", lit(false)))
    t("union fingerprints count") { shAll.count() }

    // candidate stage via the public API with verify disabled-ish:
    // run full probe but with threshold high / rank cap variants
    for (round <- 1 to 3; cap <- Seq(0, 32)) {
      t(s"probe r$round verifyRankCap=$cap noop") {
        Dedup.simhashPairsFromIndex(spark, path, batch, "doc_id", "text",
          threshold = 0.7, verifyRankCap = cap)
          .write.format("noop").mode("overwrite").save()
      }
      graft.pipeline.CacheScope.releaseSession(spark)
    }

    // replicate the incremental core's candidate stage to count rows at
    // each step (mirrors simhashIncrementalCore with stored point b=8,
    // probeBits=1, cap=1000, prefilter=15)
    {
      val blocks = 8; val bits = 64 / blocks; val mask = (1L << bits) - 1
      val sh0 = Dedup.simhashDfJ(batch, "doc_id", "text")
        .withColumn("new", lit(true))
        .union(spark.read.parquet(s"$path/fingerprints")
          .withColumn("new", lit(false)))
      val sh = sh0.persist()
      def partCol(q: Int) = shiftright(col("sh"), q * bits).bitwiseAND(mask)
      def parts(src: DataFrame, flips: Boolean): DataFrame = {
        val js: Seq[Int] = if (flips) -1 until bits else Seq(-1)
        val structs = for { q <- 0 until blocks; j <- js } yield {
          val p = partCol(q)
          if (j < 0) struct(lit(q).as("q"), p.as("part"))
          else struct(lit(q).as("q"), p.bitwiseXOR(lit(1L << j)).as("part"))
        }
        src.select(col("id"), col("sh"), col("new"),
            explode(array(structs: _*)).as("bb"))
          .select(col("id"), col("sh"), col("new"), col("bb.q"), col("bb.part"))
      }
      val exactAll = parts(sh, flips = false)
      val oversized = exactAll.groupBy("q", "part").count()
        .filter(col("count") > 1000).select("q", "part")
      def bounded(df: DataFrame) =
        df.join(broadcast(oversized), Seq("q", "part"), "left_anti")
      val l = bounded(exactAll).select(col("q"), col("part"),
        col("id").as("id_x"), col("sh").as("sh_x"), col("new").as("new_x"))
      val r = bounded(parts(sh.filter(col("new")), flips = true))
        .select(col("q"), col("part"), col("id").as("id_y"),
          col("sh").as("sh_y"), col("new").as("new_y"))
      val joined = l.join(r, Seq("q", "part"))
        .filter(col("id_x") =!= col("id_y"))
      t("raw bucket-join rows count") { println("  raw=" + joined.count()) }
      val cand = joined.select(
          when(col("new_x"), least(col("id_x"), col("id_y")))
            .otherwise(col("id_y")).as("id_a"),
          when(col("new_x"), greatest(col("id_x"), col("id_y")))
            .otherwise(col("id_x")).as("id_b"),
          bit_count(col("sh_x").bitwiseXOR(col("sh_y"))).as("hamming"))
        .filter(col("hamming") <= 15)
      t("hamming<=15 rows count") { println("  ham=" + cand.count()) }
      val dist = cand.select("id_a", "id_b", "hamming").distinct()
      t("distinct pairs count") { println("  dist=" + dist.count()) }
      val distP = dist.persist()
      distP.count()
      t("rank-cap windows count") {
        import org.apache.spark.sql.expressions.Window
        val wA = Window.partitionBy("id_a").orderBy(col("hamming").asc, col("id_b").asc)
        val wB = Window.partitionBy("id_b").orderBy(col("hamming").asc, col("id_a").asc)
        println("  capped=" + distP.withColumn("rn_a", row_number().over(wA))
          .withColumn("rn_b", row_number().over(wB))
          .filter(col("rn_a") <= 32 || col("rn_b") <= 32).count())
      }
      sh.unpersist(); distP.unpersist()
    }
    once("final")
    spark.stop()
  }
}
