package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Native lang-id kernel vs the portable Column tree: bit-for-bit
  * parity corpus-wide and on the adversarial edges (ties, no-probe,
  * multi-byte unicode around ASCII probes, nulls), plus the
  * whole-stage-codegen plan assert — the [[VectorExpressions]]
  * discipline for the text hot path.
  */
class TextExpressionsSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._
  import graft.pipeline.TextAnalysis

  test("kernel == Column tree on the whole test corpus") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val both = docs.select(
      TextAnalysis.langId($"text").as("native"),
      TextAnalysis.langIdColumnTree($"text").as("tree"))
    assert(both.filter($"native" =!= $"tree").count() == 0)
    // the corpus actually exercises the kernel (not all und)
    assert(both.filter($"native" =!= "und").count() > 0)
  }

  test("edges: ties favor earlier language; no probe -> und; " +
      "unicode and nulls safe") {
    val rows = Seq(
      // " la " scores fr AND it once each -> tie -> fr (earlier)
      "x la y",
      // en via " the ", de via " und " -> tie -> en
      "a the b und c",
      "no probes here",
      "",
      "ü the ö the 𝓍 the 𝔷", // multi-byte neighbors of ASCII probes
      " DE LA ", // case folding; fr " la " ties es " de la " -> fr
      null) // tree's null-comparison fallthrough -> "und"; native matches
    val df = rows.toDF("text")
    val got = df.select(
        TextAnalysis.langId($"text").as("native"),
        TextAnalysis.langIdColumnTree($"text").as("tree"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    got.foreach { case (n, t) => assert(n == t, s"native $n != tree $t") }
    assert(got(0)._1 == "fr" && got(1)._1 == "en" &&
      got(2)._1 == "und" && got(3)._1 == "und" && got(4)._1 == "en")
    assert(got(5)._1 == "fr")
    assert(got(6)._1 == "und")
  }

  test("greedy non-overlap matches the replace rule") {
    // " e e e " : probe " e " (it) matches greedily at 0 then from 4
    // -> 2, exactly what replace-removal arithmetic counts
    val one = Seq(" e e e ").toDF("text")
    val n = one.select(TextAnalysis.langId($"text")).head().getString(0)
    val t = one.select(TextAnalysis.langIdColumnTree($"text"))
      .head().getString(0)
    assert(n == t && n == "it")
  }

  test("lang-id stays inside whole-stage codegen") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val plan = docs.select(TextAnalysis.langId($"text").as("l"))
      .queryExecution.executedPlan.toString
    // the `*(n)` prefix marks a WholeStageCodegen stage; the lang-id
    // projection must carry it (a CodegenFallback would not)
    assert("""\*\(\d+\) Project""".r.findFirstIn(plan).isDefined, plan)
  }
}
