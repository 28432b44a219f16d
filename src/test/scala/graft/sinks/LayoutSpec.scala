package graft.sinks

import graft.SparkTestBase
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.scalatest.funsuite.AnyFunSuite

/** Layout (Z-order) evidence at the parquet-footer level: after
  * `writeZOrdered(orders, custkey+totalprice)`, a narrow predicate on
  * EITHER column overlaps only a fraction of the written files'
  * min/max ranges, while a plain single-column sort leaves the other
  * column un-skippable (every file spans its full range). Plus content
  * preservation and the refusal paths.
  */
class LayoutSpec extends AnyFunSuite with SparkTestBase {

  private def orders = spark.read
    .parquet("/root/testdata/sf0.01/orders.parquet")
    .select("o_orderkey", "o_custkey", "o_totalprice")

  /** Per-file (min, max) of a column, from the parquet footers. */
  private def fileRanges(dir: String, column: String)
      : Seq[(Double, Double)] = {
    val conf = spark.sessionState.newHadoopConf()
    val files = new java.io.File(dir).listFiles()
      .filter(f => f.getName.startsWith("part-") &&
        f.getName.endsWith(".parquet"))
    assert(files.nonEmpty, s"no parquet files under $dir")
    files.toSeq.map { f =>
      val r = ParquetFileReader.open(
        HadoopInputFile.fromPath(new Path(f.getAbsolutePath), conf))
      try {
        val stats = r.getFooter.getBlocks.toArray.toSeq
          .flatMap(_.asInstanceOf[org.apache.parquet.hadoop.metadata
            .BlockMetaData].getColumns.toArray.toSeq)
          .map(_.asInstanceOf[org.apache.parquet.hadoop.metadata
            .ColumnChunkMetaData])
          .filter(_.getPath.toDotString == column)
          .map(_.getStatistics)
        assert(stats.nonEmpty, s"no stats for $column in ${f.getName}")
        def d(x: Any): Double = x match {
          case l: java.lang.Long    => l.toDouble
          case i: java.lang.Integer => i.toDouble
          case v: java.lang.Double  => v
          case v: java.lang.Float   => v.toDouble
          case other => fail(s"unexpected stat type $other")
        }
        (stats.map(s => d(s.genericGetMin())).min,
          stats.map(s => d(s.genericGetMax())).max)
      } finally r.close()
    }
  }

  /** Fraction of files whose [min,max] intersects [lo,hi]. */
  private def overlapFrac(ranges: Seq[(Double, Double)], lo: Double,
      hi: Double): Double =
    ranges.count { case (mn, mx) => mx >= lo && mn <= hi }.toDouble /
      ranges.size

  private def midWindow(ranges: Seq[(Double, Double)], frac: Double)
      : (Double, Double) = {
    val lo = ranges.map(_._1).min
    val hi = ranges.map(_._2).max
    val mid = (lo + hi) / 2
    val w = (hi - lo) * frac / 2
    (mid - w, mid + w)
  }

  test("both z-columns are file-skippable; a plain sort is not") {
    val zDir = java.nio.file.Files
      .createTempDirectory("graft_zorder").toString
    val sDir = java.nio.file.Files
      .createTempDirectory("graft_sorted").toString
    // 64 files: z-stripe granularity is 3 bits per column, so a
    // mid-range window straddling the major stripe boundary still
    // touches only ~2/8 of each column's stripes (16 files = 2 bits
    // per column leaves the straddled midpoint touching half the
    // files — the skipping power grows with file count, as it does on
    // a real multi-thousand-file table)
    Layout.writeZOrdered(orders, Seq("o_custkey", "o_totalprice"),
      zDir, bits = 8, numFiles = 64)
    val o = orders
    o.repartitionByRange(64, o("o_custkey"))
      .sortWithinPartitions("o_custkey")
      .write.mode("overwrite").parquet(sDir)

    val zCust = fileRanges(zDir, "o_custkey")
    val zPrice = fileRanges(zDir, "o_totalprice")
    val sCust = fileRanges(sDir, "o_custkey")
    val sPrice = fileRanges(sDir, "o_totalprice")

    // a 1%-wide mid-range predicate on EITHER z column touches ~2/8 of
    // that column's stripes at this granularity — pin <= 0.3, not the
    // 16-file-era 0.5 (which a half-touched layout would also pass)
    val (cl, ch) = midWindow(zCust, 0.01)
    val (pl, ph) = midWindow(zPrice, 0.01)
    assert(overlapFrac(zCust, cl, ch) <= 0.3,
      s"custkey overlap ${overlapFrac(zCust, cl, ch)}")
    assert(overlapFrac(zPrice, pl, ph) <= 0.3,
      s"totalprice overlap ${overlapFrac(zPrice, pl, ph)}")

    // the single-column sort: tight on the sort column, useless on the
    // other (every file spans ~the full price range)
    val (scl, sch) = midWindow(sCust, 0.01)
    val (spl, sph) = midWindow(sPrice, 0.01)
    assert(overlapFrac(sCust, scl, sch) <= 0.5)
    assert(overlapFrac(sPrice, spl, sph) >= 0.9,
      "sorted layout unexpectedly skippable on the non-sort column")

    // z-order is strictly better than the sort on the non-sort column
    assert(overlapFrac(zPrice, pl, ph) < overlapFrac(sPrice, spl, sph))
  }

  test("content round-trips exactly") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_zorder_rt").toString
    Layout.writeZOrdered(orders, Seq("o_custkey", "o_totalprice"), dir,
      numFiles = 8)
    val back = spark.read.parquet(dir)
    assert(back.columns.sorted.toSeq ==
      Seq("o_custkey", "o_orderkey", "o_totalprice"))
    assert(back.count() == orders.count())
    assert(back.exceptAll(orders).count() == 0)
    assert(orders.exceptAll(back).count() == 0)
  }

  test("boundary audit: one sorted cut list per z column") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_zorder_b").toString
    val bounds = Layout.writeZOrdered(orders,
      Seq("o_custkey", "o_totalprice"), dir, bits = 4, numFiles = 4)
    assert(bounds.keySet == Set("o_custkey", "o_totalprice"))
    bounds.values.foreach { bs =>
      assert(bs.size == 15)
      assert(bs == bs.sorted)
    }
  }

  test("boundary phase is ONE action with ONE scan of the source") {
    val execs = new java.util.concurrent.CopyOnWriteArrayList[
      org.apache.spark.sql.execution.QueryExecution]()
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          durationNs: Long): Unit = { execs.add(qe); () }
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          exception: Exception): Unit = { execs.add(qe); () }
    }
    spark.listenerManager.register(listener)
    try {
      val bounds = Layout.boundariesForAll(orders,
        Seq("o_custkey", "o_totalprice"), bits = 4, sampleK = 1024)
      assert(bounds.keySet == Set("o_custkey", "o_totalprice"))
      // the listener fires asynchronously on the bus: wait for the one
      // expected event, then linger to prove no second action follows
      val t0 = System.nanoTime()
      while (execs.isEmpty && System.nanoTime() - t0 < 30e9)
        Thread.sleep(50)
      Thread.sleep(500)
      assert(execs.size == 1,
        s"boundary phase ran ${execs.size} actions, expected 1")
      // descend through AQE wrappers AND materialized query stages
      // (QueryStageExec is a leaf to collect(); the scan lives inside)
      def scansIn(p: org.apache.spark.sql.execution.SparkPlan)
          : Seq[org.apache.spark.sql.execution.FileSourceScanExec] =
        p.collect {
          case s: org.apache.spark.sql.execution.FileSourceScanExec =>
            Seq(s)
          case a: org.apache.spark.sql.execution.adaptive
              .AdaptiveSparkPlanExec => scansIn(a.executedPlan)
          case q: org.apache.spark.sql.execution.adaptive
              .QueryStageExec => scansIn(q.plan)
        }.flatten
      val scans = scansIn(execs.get(0).executedPlan)
      assert(scans.size == 1,
        s"expected 1 source scan in the boundary action, got " +
          s"${scans.size}:\n${execs.get(0).executedPlan}")
    } finally spark.listenerManager.unregister(listener)
  }

  test("refusals: one column, bit overflow") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_zorder_r").toString
    intercept[IllegalArgumentException] {
      Layout.writeZOrdered(orders, Seq("o_custkey"), dir) }
    intercept[IllegalArgumentException] {
      Layout.writeZOrdered(orders, Seq("o_custkey", "o_totalprice"),
        dir, bits = 32) }
  }
}
