package graft.tools

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Synthesize an sf×`factor` replica of a testdata directory for SCALE
  * measurements (the sf0.1 → sf1 growth-factor datapoint): `factor`
  * deterministic copies of `documents`/`embeddings`, ids offset by
  * 1000000·k (clear of every fixture's synthetic-id band — the refresh
  * fixture offsets up to +96000, so a 100000 spacing collided: copy-1
  * clones at 104999+96000 landed inside copy-2's id range, duplicate
  * ids broke the dedup family's id-uniqueness contract), with copy texts GENUINELY different — every
  * third word of copy k > 0 is replaced by an md5-derived salt word,
  * dropping cross-copy Jaccard to ~0.2 (below every near-dup
  * threshold and the minhash banding floor), so dup families do NOT
  * grow with the factor and the scaled corpus measures honest
  * linear-corpus growth instead of a quadratic dup-family blow-up.
  * Embedding copies perturb component 0 by 0.001·k for the same
  * reason. The other eight tables copy through unchanged.
  *
  * Usage: ScaleTestData <inDir> <outDir> <factor>
  * (bench-evidence tooling — never part of the library surface).
  */
object ScaleTestData {

  private def saltText(text: Column, k: Int): Column =
    concat_ws(" ", transform(split(text, " "), (w, i) =>
      when(pmod(i + lit(k), lit(3)) === 0,
        concat(lit("s"), substring(
          md5(concat_ws(":", lit(k.toString), i.cast("string"), w)),
          1, 6)))
        .otherwise(w)))

  def main(args: Array[String]): Unit = {
    val Array(inDir, outDir, factorS) = args
    val factor = factorS.toInt
    require(factor >= 1)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = spark.read.parquet(s"$inDir/documents.parquet")
    val docCopies: DataFrame = (0 until factor).map { k =>
      if (k == 0) docs
      else {
        val t = saltText(col("text"), k)
        docs.select((col("doc_id") + lit(k * 1000000L)).as("doc_id"),
          t.as("text"), col("lang"), col("source"),
          length(t).cast("long").as("n_chars"))
      }
    }.reduce(_ unionAll _)
    docCopies.repartition(32).write.mode("overwrite")
      .parquet(s"$outDir/documents.parquet")

    val emb = spark.read.parquet(s"$inDir/embeddings.parquet")
    val embCopies = (0 until factor).map { k =>
      if (k == 0) emb
      else emb.select(Seq(
        (col("vec_id") + lit(k * 1000000L)).as("vec_id"),
        transform(col("embedding"), (x, i) =>
          when(i === 0, x + lit(k * 0.001f)).otherwise(x))
          .as("embedding")) ++
        emb.columns.filterNot(Set("vec_id", "embedding")).map(col): _*)
    }.reduce(_ unionAll _)
    embCopies.repartition(32).write.mode("overwrite")
      .parquet(s"$outDir/embeddings.parquet")

    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "events").foreach { t =>
      spark.read.parquet(s"$inDir/$t.parquet")
        .write.mode("overwrite").parquet(s"$outDir/$t.parquet")
    }
    println(s"scaled $inDir x$factor -> $outDir: " +
      s"${docCopies.count()} docs, ${embCopies.count()} embeddings")
    spark.stop()
  }
}
