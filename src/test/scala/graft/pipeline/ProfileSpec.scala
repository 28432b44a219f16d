package graft.pipeline

import graft.SparkTestBase
import org.scalatest.funsuite.AnyFunSuite

/** Profile's one-scan contract: correct measures incl. nulls and
  * doubles, the approx-distinct mode bounded against exact, and exactly
  * one source scan in the default plan.
  */
class ProfileSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private val rows = Seq(
    (1L, Some(2.5), Some("aa")), (2L, None, Some("bb")),
    (3L, Some(2.5), None), (4L, Some(7.0), Some("aa")),
    (5L, None, Some("ccc")))
  private def df = rows.toDF("id", "score", "tag")

  test("measures: counts, nulls, distinct, min/max, total_len") {
    val p = Profile.profile(df, exactDistinct = true)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(p.keySet == Set("id", "score", "tag"))
    val id = p("id")
    assert(id.getString(1) == "bigint" && id.getLong(2) == 5 &&
      id.getLong(3) == 0 && id.getLong(4) == 5 &&
      id.getString(5) == "1" && id.getString(6) == "5" &&
      id.getLong(7) == 5)
    val sc = p("score")
    assert(sc.getString(1) == "double" && sc.getLong(3) == 2 &&
      sc.getLong(4) == 2 && sc.getString(5) == "2.5" &&
      sc.getString(6) == "7.0")
    val tg = p("tag")
    assert(tg.getLong(3) == 1 && tg.getLong(4) == 3 &&
      tg.getString(5) == "aa" && tg.getString(6) == "ccc" &&
      tg.getLong(7) == 9) // aa + bb + aa + ccc
  }

  test("approx distinct stays within HLL tolerance of exact") {
    val d = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val exact = Profile.profile(d, exactDistinct = true)
      .select("col_name", "n_distinct").as[(String, Long)]
      .collect().toMap
    val approx = Profile.profile(d)
      .select("col_name", "n_distinct").as[(String, Long)]
      .collect().toMap
    exact.foreach { case (c, e) =>
      val a = approx(c)
      // default rsd = 5%; allow 4 sigma
      assert(math.abs(a - e) <= math.max(4, 0.2 * e),
        s"$c: approx $a vs exact $e")
    }
  }

  test("default mode plans ONE scan of the source") {
    val plan = Profile.profile(
      spark.read.parquet("/root/testdata/sf0.001/orders.parquet"))
      .queryExecution.executedPlan.toString
    assert(plan.split("FileScan").length - 1 == 1, plan.take(800))
    assert(!plan.contains("Expand"), "approx mode must not expand")
  }
}
