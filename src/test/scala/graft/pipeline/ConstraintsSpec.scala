package graft.pipeline

import graft.SparkTestBase
import org.apache.spark.sql.execution.FileSourceScanExec
import org.scalatest.funsuite.AnyFunSuite

/** Constraints: planted violations count exactly; null semantics (a
  * null never violates a value-shape constraint); completeness
  * tolerance; uniqueness and referential members; the one-scan plan for
  * the row-level block; suggestion rules incl. the bounded is_in pass.
  */
class ConstraintsSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._
  import Constraints._

  private val rows = Seq(
    (1L, Some("a"), Some(10.0), Some("1-HIGH")),
    (2L, Some("b"), Some(20.0), Some("2-MED")),
    (3L, None, Some(-5.0), Some("9-BAD")),
    (4L, Some("a"), None, None),
    (5L, Some("zz"), Some(120.0), Some("3-LOW")),
    (5L, Some("b"), Some(30.0), Some("1-HIGH")))
  private def df = rows.toDF("id", "tag", "score", "prio")

  private def report(cs: Seq[Constraint]) =
    Constraints.check(df, cs).collect()
      .map(r => r.getString(0) -> ((r.getLong(3), r.getLong(4),
        r.getBoolean(5)))).toMap

  test("row-level constraints: planted violation counts, null-safe") {
    val r = report(Seq(
      NotNull("tag"),                       // one null row
      InRange("score", 0.0, 100.0),         // -5 and 120 violate; null free
      Matches("prio", "^[1-5]-"),           // 9-BAD violates; null free
      IsIn("tag", Seq("a", "b")),           // zz violates; null free
      Completeness("score", 0.8)))          // 5/6 = .833 >= .8 passes
    assert(r("not_null(tag)") == ((6L, 1L, false)))
    assert(r("in_range(score,0.0,100.0)") == ((6L, 2L, false)))
    assert(r("matches(prio,^[1-5]-)") == ((6L, 1L, false)))
    assert(r("is_in(tag,a|b)") == ((6L, 1L, false)))
    assert(r("completeness(score,0.8)") == ((6L, 1L, true)))
    // tighter completeness fails
    val r2 = report(Seq(Completeness("score", 0.9)))
    assert(r2("completeness(score,0.9)") == ((6L, 1L, false)))
  }

  test("unique: violations count all rows sharing a key") {
    val r = report(Seq(Unique(Seq("id")), Unique(Seq("id", "tag"))))
    assert(r("unique(id)") == ((6L, 2L, false)))   // two id=5 rows
    assert(r("unique(id,tag)") == ((6L, 0L, true)))
  }

  test("subset_of: row-counted misses, null keys exempt") {
    val ref = Seq("a", "b").toDF("v")
    val r = Constraints.check(df,
      Seq(SubsetOf("tag", ref, "v", "ref"))).collect()(0)
    assert(r.getString(0) == "subset_of(tag,ref.v)")
    assert(r.getLong(3) == 6L && r.getLong(4) == 1L && !r.getBoolean(5))
    val refAll = Seq("a", "b", "zz").toDF("v")
    val ok = Constraints.check(df,
      Seq(SubsetOf("tag", refAll, "v", "ref"))).collect()(0)
    assert(ok.getLong(4) == 0L && ok.getBoolean(5))
  }

  test("empty input passes vacuously: 0 rows, 0 violations, passed") {
    val empty = df.limit(0)
    val r = Constraints.check(empty, Seq(
        NotNull("tag"), InRange("score", 0.0, 100.0),
        Completeness("score", 0.8), Unique(Seq("id")),
        SubsetOf("tag", df.select($"tag".as("v")), "v", "ref")))
      .collect()
    assert(r.length == 5)
    r.foreach { row =>
      assert(row.getLong(3) == 0L, s"n_rows for ${row.getString(0)}")
      assert(row.getLong(4) == 0L, s"n_violations for ${row.getString(0)}")
      assert(row.getBoolean(5), s"passed for ${row.getString(0)}")
    }
  }

  test("declaration order is preserved in the report") {
    val names = Constraints.check(df, Seq(Unique(Seq("id")),
        NotNull("tag"), InRange("score", 0, 1000), Unique(Seq("tag"))))
      .collect().map(_.getString(0)).toSeq
    assert(names == Seq("unique(id)", "not_null(tag)",
      "in_range(score,0.0,1000.0)", "unique(tag)"))
  }

  test("row-level block is ONE scan of the source") {
    val src = spark.read
      .parquet("/root/testdata/sf0.001/orders.parquet")
    val plan = Constraints.check(src, Seq(
        NotNull("o_custkey"), InRange("o_totalprice", 0, 1e9),
        IsIn("o_orderstatus", Seq("F", "O", "P")),
        Matches("o_orderpriority", "^[1-5]-"),
        Completeness("o_orderkey", 1.0)))
      .queryExecution.executedPlan
    // AQE wraps the plan in AdaptiveSparkPlanExec, a leaf to collect():
    // unwrap to the current physical plan before counting scans.
    val unwrapped = plan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }
    val scans = unwrapped.collect { case s: FileSourceScanExec => s }
    assert(scans.size == 1, s"expected 1 scan, got ${scans.size}")
  }

  test("suggest: rules fire from the profile, is_in set bounded+sorted") {
    val d = Seq(
      (1L, "x", 1.5), (2L, "y", 2.5), (3L, "x", 3.5), (4L, "z", 4.5))
      .toDF("id", "cat", "v")
    val s = Constraints.suggest(d, maxSetSize = 3).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r).toMap
    assert(s.contains(("id", "not_null")) && s.contains(("id", "unique")))
    assert(s.contains(("cat", "not_null")) && !s.contains(("cat", "unique")))
    val range = s(("v", "in_range"))
    assert(range.getString(2) == "1.5" && range.getString(3) == "4.5")
    assert(s(("cat", "is_in")).getString(4) == "x,y,z")
    // cardinality above the cap: no is_in suggestion
    val wide = Constraints.suggest(d, maxSetSize = 2).collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(!wide.contains(("cat", "is_in")))
  }

  test("suggest: nullable column suggests neither not_null nor unique") {
    val d = Seq((1L, Some("a")), (2L, None), (3L, Some("b")))
      .toDF("id", "t")
    val kinds = Constraints.suggest(d).collect()
      .filter(_.getString(0) == "t").map(_.getString(1)).toSet
    assert(!kinds.contains("not_null") && !kinds.contains("unique"))
  }

  test("refusals: empty constraint list, non-row-level misuse") {
    intercept[IllegalArgumentException] {
      Constraints.check(df, Seq.empty)
    }
    intercept[IllegalArgumentException] { Completeness("x", 0.0) }
    intercept[IllegalArgumentException] { InRange("x", 5.0, 1.0) }
    intercept[IllegalArgumentException] { IsIn("x", Seq.empty) }
    intercept[IllegalArgumentException] { Unique(Seq.empty) }
  }
}
