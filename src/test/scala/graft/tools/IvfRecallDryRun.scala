package graft.tools

import graft.pipeline.Similarity
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** 250× scale dry-run of the IVF recall-derived operating point
  * (VERDICT r9 item 5): expands sf0.1's 2 000 embeddings to a 500 000-
  * vector corpus with deterministic per-rep noise, trains the coarse
  * quantizer on the hash-ordered sample, measures the nProbe/recall@10
  * curve in one bounded pass ([[Similarity.ivfRecallCurve]]), derives
  * the stored point, and validates that an index built at this scale
  * stores it and that defaulted reads resolve it. Output goes to
  * stdout for the PIPELINE_DRYRUN.md table.
  *
  * Corpus construction (deterministic): rep 0 is the original vector;
  * reps 1..249 add per-dimension pseudo-noise
  * `((id*1315423911 + rep*2654435761 + i*97) mod 1000)/1000 * 0.2 - 0.1`
  * — large enough to spread the copies across cells near boundaries,
  * small enough that the corpus keeps the original's cluster
  * structure (what a real near-duplicate-rich embedding corpus looks
  * like).
  */
object IvfRecallDryRun {

  private def timed[T](label: String)(body: => T): (T, Double) = {
    val t0 = System.nanoTime()
    val r = body
    val s = (System.nanoTime() - t0) / 1e9
    println(f"  wall: $s%.1f s  ($label)")
    (r, s)
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .appName("ivf-recall-dryrun")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val reps = 250
    val base = spark.read
      .parquet("/root/testdata/sf0.1/embeddings.parquet")
      .select($"vec_id".cast("long"), $"embedding")
      .as[(Long, Array[Float])].collect()
    println(s"base vectors: ${base.length}, reps: $reps -> " +
      s"${base.length * reps}")
    val corpus = spark.range(reps.toLong)
      .repartition(32).as[Long].flatMap { rep =>
        base.iterator.map { case (id, v) =>
          val out = new Array[Float](v.length)
          var i = 0
          while (i < v.length) {
            val noise = if (rep == 0L) 0.0f
              else (((id * 1315423911L + rep * 2654435761L + i * 97L)
                % 1000L + 1000L) % 1000L) / 1000.0f * 0.2f - 0.1f
            out(i) = v(i) + noise
            i += 1
          }
          (rep * 10000000L + id, out)
        }
      }.toDF("vec_id", "embedding").persist()
    println(s"corpus rows: ${corpus.count()}")

    val k = 256
    val (centroids, tTrain) = timed(s"train k=$k on hash-ordered sample") {
      Similarity.trainIvfCentroids(corpus, "vec_id", "embedding",
        k = k, sampleN = 10000, iters = 5)
    }
    val (curve, tCurve) = timed("recall curve (one brute-force pass)") {
      Similarity.ivfRecallCurve(corpus, "vec_id", "embedding",
        centroids, k = 10, sampleN = 100)
    }
    val probes = Seq(1, 2, 4, 8, 16, 32, 64, 128, 256)
    println("nProbe -> recall@10:")
    probes.filter(_ <= curve.length).foreach { p =>
      println(f"  $p%3d -> ${curve(p - 1)._2}%.4f")
    }
    val (point, recall) = Similarity.deriveIvfNProbe(curve, 0.95)
    println(f"derived point: nProbe=$point recall@10=$recall%.4f " +
      f"(train $tTrain%.1f s, curve $tCurve%.1f s)")

    val path = java.nio.file.Files.createTempDirectory("ivf_dry")
      .toString + "/idx"
    val (_, tBuild) = timed("writeIvfIndex (incl. derivation)") {
      Similarity.writeIvfIndex(corpus, "vec_id", "embedding", centroids,
        path, recallK = 10, recallTarget = 0.95, recallSampleN = 100)
    }
    val side = spark.read.json(s"$path.centroids").head()
    println(s"sidecar nProbe=${side.getAs[Long]("nProbe")} " +
      s"nProbeRecall=${side.getAs[Double]("nProbeRecall")} " +
      f"(build $tBuild%.1f s)")

    val queries = corpus.filter($"vec_id" < 50)
      .select($"vec_id".as("qid"), $"embedding".as("qv"))
    val (nOut, tQuery) = timed("defaulted top-10 probe (50 queries)") {
      Similarity.ivfTopKFromIndex(spark, path, queries, "qid", "qv",
        k = 10).count()
    }
    println(s"defaulted read rows: $nOut (query $tQuery s)")
    spark.stop()
  }
}
