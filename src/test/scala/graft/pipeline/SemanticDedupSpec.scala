package graft.pipeline

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** SemDeDup-shaped semantic dedup: co-cell clone detection, the
  * documented cell-boundary approximation, the cell-size refusal, and
  * the drop rule.
  */
class SemanticDedupSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def deg(d: Double): Array[Float] =
    Array(math.cos(math.toRadians(d)).toFloat,
      math.sin(math.toRadians(d)).toFloat)

  // two well-separated cells on the unit circle
  private val centroids: Array[Array[Float]] =
    Array(deg(0), deg(90))

  test("scale-clones co-assign and are found; distant vectors are not") {
    val vecs = Seq(
      (1L, deg(5)), (2L, deg(85)),
      // clone of 1 at x1.5: same direction, same cell, cosine 1
      (101L, deg(5).map(_ * 1.5f)),
      (3L, deg(40))).toDF("id", "v")
    val pairs = Dedup.semanticPairs(vecs, "id", "v", centroids,
        threshold = 0.999)
      .select("id_a", "id_b").collect().map(r =>
        (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 101L)))
  }

  test("a near-pair straddling a cell boundary is invisible by design") {
    val vecs = Seq((1L, deg(44)), (2L, deg(46))).toDF("id", "v")
    // cosine(2 degrees apart) ~ 0.9994 — would qualify...
    val brute = Similarity.cosineJ(deg(44), deg(46))
    assert(brute >= 0.999)
    // ...but 44 degrees assigns to cell 0, 46 degrees to cell 1
    val pairs = Dedup.semanticPairs(vecs, "id", "v", centroids,
      threshold = 0.999).collect()
    assert(pairs.isEmpty)
  }

  test("cells above maxCellSize refuse with the offending sizes") {
    val vecs = (1L to 50L).map(i => (i, deg(1))).toDF("id", "v")
    val e = intercept[IllegalArgumentException] {
      Dedup.semanticPairs(vecs, "id", "v", centroids,
        threshold = 0.999, maxCellSize = 10).collect()
    }
    assert(e.getMessage.contains("maxCellSize=10"))
    assert(e.getMessage.contains("size=50"))
    // opt-out runs
    assert(Dedup.semanticPairs(vecs, "id", "v", centroids,
      threshold = 0.999, maxCellSize = 0).count() == 50L * 49 / 2)
  }

  test("semanticDedup drops the higher id of each verified pair") {
    val vecs = Seq(
      (1L, deg(5)), (2L, deg(85)), (101L, deg(5).map(_ * 1.5f)))
      .toDF("id", "v")
    val kept = Dedup.semanticDedup(vecs, "id", "v", centroids,
      threshold = 0.999).select("id").as[Long].collect().toSet
    assert(kept == Set(1L, 2L))
  }
}
