package graft.pipeline

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** BottomK: the sketch equals the serial bottom-k rule bit-for-bit on
  * any partitioning; merge across batchings is EXACT (not an
  * envelope); re-folding is a no-op; quantile indexing matches the
  * serial definition; the plan is a top-k, not a full sort; and the
  * persisted update path preserves all of it.
  */
class BottomKSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def docs = spark.read
    .parquet("/root/testdata/sf0.001/documents.parquet")

  private def serialBottomK(k: Int): Seq[(String, Long)] =
    docs.select($"doc_id", $"n_chars").collect()
      .map { r =>
        val h = java.security.MessageDigest.getInstance("MD5")
          .digest(r.getLong(0).toString.getBytes("UTF-8"))
          .map("%02x".format(_)).mkString
        (h, r.getLong(1))
      }
      .sortBy(identity).take(k).toSeq

  test("sketch equals the serial rule on any partitioning") {
    val expect = serialBottomK(50)
    for (parts <- Seq(1, 3, 16)) {
      val got = BottomK.sketch(docs.repartition(parts), "doc_id",
          "n_chars", 50)
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
        .sortBy(identity)
      assert(got == expect, s"parts=$parts")
    }
  }

  test("merge is EXACT: bottom-k of union == trim(union of bottom-ks)") {
    val whole = BottomK.sketch(docs, "doc_id", "n_chars", 64)
      .collect().map(r => (r.getString(0), r.getLong(1))).sortBy(identity)
    val halves = Seq(0, 1).map(i =>
      BottomK.sketch(docs.filter($"doc_id" % 2 === i), "doc_id",
        "n_chars", 64))
    val merged = halves.reduce(_ unionAll _)
      .orderBy(col("h"), col("v")).limit(64)
      .collect().map(r => (r.getString(0), r.getLong(1))).sortBy(identity)
    assert(merged.toSeq == whole.toSeq) // bit-exact, no envelope
  }

  test("quantiles follow the serial index rule incl. endpoints") {
    val sk = Seq((1L, 10.0), (2L, 20.0), (3L, 30.0), (4L, 40.0),
      (5L, 50.0)).toDF("id", "x")
    val s = BottomK.sketch(sk, "id", "x", 5)
    val q = BottomK.quantiles(s, Seq(0.0, 0.5, 0.49, 1.0))
      .collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    // sorted sample = [10,20,30,40,50]; idx = floor(p*4)
    assert(q(0.0) == 10.0 && q(1.0) == 50.0)
    assert(q(0.5) == 30.0 && q(0.49) == 20.0)
  }

  test("plan is a top-k over a partial-agg dedup, not a full sort") {
    val plan = BottomK.sketch(docs, "doc_id", "n_chars", 100)
      .queryExecution.executedPlan
    // the dedup's exchange makes AQE wrap the plan; unwrap to count
    val unwrapped = plan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }
    assert(unwrapped.exists(
      _.isInstanceOf[org.apache.spark.sql.execution.TakeOrderedAndProjectExec]),
      s"expected TakeOrderedAndProject in:\n$unwrapped")
    // the (h,v) dedup must partial-aggregate BELOW its exchange (the
    // map side collapses repeats before any pair crosses the wire)
    import org.apache.spark.sql.execution.aggregate.HashAggregateExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    val aggs = unwrapped.collect { case h: HashAggregateExec => h }
    assert(aggs.size == 2, s"expected partial+final dedup aggs in:\n$unwrapped")
    assert(aggs.exists(_.exists(_.isInstanceOf[ShuffleExchangeLike])),
      "final dedup agg should sit above the exchange")
  }

  test("persisted sidecar: update path equals the whole-corpus sketch; " +
      "re-folding a batch is a no-op") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_bottomk").toString
    val old = docs.filter($"doc_id" % 3 =!= 0)
    val batch = docs.filter($"doc_id" % 3 === 0)
    BottomK.writeSketch(old, "doc_id", "n_chars", 40, dir)
    BottomK.updateSketch(spark, dir, batch)
    val whole = BottomK.sketch(docs, "doc_id", "n_chars", 40)
      .collect().map(r => (r.getString(0), r.getLong(1))).sortBy(identity)
    def stored = BottomK.readSketch(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1))).sortBy(identity)
    assert(stored.toSeq == whole.toSeq)
    BottomK.updateSketch(spark, dir, batch) // idempotent re-fold
    assert(stored.toSeq == whole.toSeq)
  }

  test("duplicate (key,value) rows: one-shot sketch equals the " +
      "update-folded sidecar (set semantics on both paths)") {
    // 3 copies of every row: under multiset semantics the one-shot
    // bottom-k would keep triplicates (crowding out genuine entries)
    // while updateSketch's (h,v) dedup would not — the r12 divergence.
    val base = docs.select($"doc_id", $"n_chars").limit(30)
    val tripled = base.unionAll(base).unionAll(base)
    val whole = BottomK.sketch(tripled, "doc_id", "n_chars", 20)
      .collect().map(r => (r.getString(0), r.getLong(1))).sortBy(identity)
    // no pair appears twice: the sketch is a SET
    assert(whole.distinct.length == whole.length)
    // and it equals the sketch of the deduplicated corpus
    val ofDistinct = BottomK.sketch(base, "doc_id", "n_chars", 20)
      .collect().map(r => (r.getString(0), r.getLong(1))).sortBy(identity)
    assert(whole.toSeq == ofDistinct.toSeq)
    // persisted parity: writeSketch(tripled) == fold tripled batches
    // into an empty-start sidecar
    val oneShot = java.nio.file.Files
      .createTempDirectory("graft_bk_dup1").toString
    val folded = java.nio.file.Files
      .createTempDirectory("graft_bk_dup2").toString
    BottomK.writeSketch(tripled, "doc_id", "n_chars", 20, oneShot)
    BottomK.writeSketch(base.limit(0), "doc_id", "n_chars", 20, folded)
    BottomK.updateSketch(spark, folded, tripled)
    def rows(p: String) = BottomK.readSketch(spark, p)
      .collect().map(r => (r.getString(0), r.getLong(1))).sortBy(identity)
    assert(rows(oneShot).toSeq == rows(folded).toSeq)
    assert(rows(oneShot).toSeq == whole.toSeq)
  }

  test("null keys hash as empty string and tie-break on value") {
    val d = Seq((Option.empty[Long], 2.0), (None, 1.0), (Some(7L), 3.0))
      .toDF("id", "x")
    val got = BottomK.sketch(d, "id", "x", 2).collect()
      .map(r => (r.getString(0), r.getDouble(1)))
    val emptyMd5 = "d41d8cd98f00b204e9800998ecf8427e"
    assert(got.count(_._1 == emptyMd5) >= 1)
    // both null-key rows share the hash; the smaller value wins first
    val nulls = got.filter(_._1 == emptyMd5).map(_._2)
    assert(nulls.headOption.contains(1.0))
  }

  test("refusals: k < 1, bad probabilities") {
    intercept[IllegalArgumentException] {
      BottomK.sketch(docs, "doc_id", "n_chars", 0) }
    intercept[IllegalArgumentException] {
      BottomK.quantiles(docs.select(lit("h").as("h"),
        $"n_chars".as("v")), Seq(1.5)) }
    intercept[IllegalArgumentException] {
      BottomK.quantiles(docs.select(lit("h").as("h"),
        $"n_chars".as("v")), Seq.empty) }
  }
}
