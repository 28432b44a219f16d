package graft.sinks

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class CompactionBucketingSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  test("compaction merges small files content-identically") {
    val dir = tmp("graft_compact") + "/t"
    val df = spark.range(10000).select($"id",
      concat(lit("row"), $"id").as("s"))
    df.repartition(64).write.parquet(dir) // 64 tiny files
    val before = Compaction.plan(spark, dir, targetBytes = 512L * 1024)
    assert(before.nFiles == 64 && before.worthwhile)
    val executed = Compaction.compact(spark, dir, targetBytes = 512L * 1024)
    val after = Compaction.plan(spark, dir, targetBytes = 512L * 1024)
    assert(after.nFiles == executed.targetFiles && after.nFiles < 64,
      after.toString)
    val got = spark.read.parquet(dir).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    val want = df.collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == want)
    // already-compact directory: no-op, plan returned unchanged
    val again = Compaction.compact(spark, dir, targetBytes = 512L * 1024)
    assert(!again.worthwhile ||
      Compaction.plan(spark, dir, 512L * 1024).nFiles == again.targetFiles)
  }

  test("compaction plan refuses bad inputs") {
    intercept[IllegalArgumentException] {
      Compaction.plan(spark, tmp("graft_compact_e"), targetBytes = 0)
    }
  }

  test("bucketed tables join without an exchange or a sort") {
    val base = tmp("graft_bucket")
    val orders = spark.range(5000).select(
      $"id".as("k"), ($"id" % 97).as("v1"))
    val custs = spark.range(3000).select(
      $"id".as("k"), concat(lit("c"), $"id").as("name"))
    Bucketing.writeBucketed(orders, "graft_bkt_orders",
      s"$base/orders", Seq("k"), 8)
    Bucketing.writeBucketed(custs, "graft_bkt_custs",
      s"$base/custs", Seq("k"), 8)
    val old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = Bucketing.bucketedJoin(spark, "graft_bkt_orders",
        "graft_bkt_custs", Seq("k"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!plan.contains("Exchange"),
        s"bucketed join must not shuffle:\n$plan")
      // content correct
      val got = joined.agg(count(lit(1)), sum($"v1")).head()
      val want = orders.join(custs, "k").agg(count(lit(1)), sum($"v1"))
        .head()
      assert(got == want && got.getLong(0) == 3000L)
      // the layout is CATALOG-carried: a path read loses it and the
      // exchange comes back — the documented trap, pinned here
      val pathRead = spark.read.parquet(s"$base/orders")
        .join(spark.read.parquet(s"$base/custs"), "k")
      assert(pathRead.queryExecution.executedPlan.toString
        .contains("Exchange"))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
      spark.sql("DROP TABLE IF EXISTS graft_bkt_orders")
      spark.sql("DROP TABLE IF EXISTS graft_bkt_custs")
    }
  }
}
