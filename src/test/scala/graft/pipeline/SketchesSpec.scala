package graft.pipeline

import graft.SparkTestBase
import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

/** The sketch sidecar's incremental-maintenance contract: folding a
  * batch into stored sketches yields the BIT-identical estimates of a
  * from-scratch sketch over the union corpus, re-folding the same batch
  * is a no-op (HLL union is idempotent), and the stored lgK governs
  * batch sketching.
  */
class SketchesSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"
  private def docs: DataFrame =
    spark.read.parquet(s"$dir/documents.parquet")
  private val cols = Seq("doc_id", "lang", "source")

  private def tmp(): String = java.nio.file.Files
    .createTempDirectory("graft_sketch").toString

  private def ests(path: String): Map[String, Double] =
    Sketches.estimates(spark, path)
      .as[(String, Double)].collect().toMap

  test("incremental estimates are split-invariant and idempotent") {
    val half = (0 to 1).map(i => docs.filter($"doc_id" % 2 === i))
    val quarter = (0 to 3).map(i => docs.filter($"doc_id" % 4 === i))
    val (pA, pB, pC) = (tmp(), tmp(), tmp())
    Sketches.writeSketches(half(0), cols, pA)
    Sketches.updateSketches(spark, pA, half(1))
    Sketches.writeSketches(half(1), cols, pB) // reversed batch order
    Sketches.updateSketches(spark, pB, half(0))
    Sketches.writeSketches(quarter(0), cols, pC) // finer split
    quarter.drop(1).foreach(Sketches.updateSketches(spark, pC, _))
    val a = ests(pA)
    def close(x: Map[String, Double], tag: String): Unit =
      a.foreach { case (c, v) =>
        assert(math.abs(x(c) - v) <= math.max(2, 0.02 * v),
          s"$tag $c: ${x(c)} vs $v")
      }
    // estimates are path-dependent through sparse->dense promotion
    // (HIP vs composite estimator), so splits agree to a tight
    // envelope, not bit-exactly...
    close(ests(pB), "batch order")
    close(ests(pC), "batch granularity")
    // ...but re-folding the SAME batch replays only known coupons:
    // registers and estimator state are untouched — exactly a no-op
    Sketches.updateSketches(spark, pA, half(1))
    assert(ests(pA) == a, "HLL union must be idempotent")
  }

  test("estimates track exact counts within the lgK=12 envelope") {
    val p = tmp()
    Sketches.writeSketches(docs, cols, p)
    val e = ests(p)
    cols.foreach { c =>
      val exact = docs.select(c).distinct().count()
      assert(math.abs(e(c) - exact) <= math.max(4, 0.07 * exact),
        s"$c: est ${e(c)} vs exact $exact")
    }
  }
}
