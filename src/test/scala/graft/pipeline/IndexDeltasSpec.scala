package graft.pipeline

import graft.SparkTestBase
import org.apache.hadoop.fs.Path
import org.scalatest.funsuite.AnyFunSuite

/** The shared delta layer's crash windows, exercised directly:
  * recovery-flow compaction (base absent, `_prev` live) must never
  * delete the only generation before the swap lands, and a delta
  * replay must never expose a partially-written directory to readers
  * (tmp + rename).
  */
class IndexDeltasSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def tmpPath(tag: String): String =
    sys.props("java.io.tmpdir") + s"/graft_ixd_${tag}_p" +
      java.lang.ProcessHandle.current().pid() + "_" +
      java.util.UUID.randomUUID().toString

  private def sortedIds(path: String): Seq[Long] =
    IndexDeltas.rows(spark, path).select("id").as[Long]
      .collect().toSeq.sorted

  test("compact folds deltas; replayed batch id overwrites (no-op)") {
    val path = tmpPath("fold")
    Seq(1L, 2L).toDF("id").write.parquet(path)
    IndexDeltas.writeDelta(Seq(3L).toDF("id"), path, 1L, Nil)
    IndexDeltas.writeDelta(Seq(3L).toDF("id"), path, 1L, Nil) // replay
    IndexDeltas.writeDelta(Seq(4L).toDF("id"), path, 2L, Nil)
    assert(sortedIds(path) == Seq(1L, 2L, 3L, 4L))
    IndexDeltas.compact(spark, path, Nil)
    assert(sortedIds(path) == Seq(1L, 2L, 3L, 4L))
    // folded ids are ignored even if a stale delta dir resurfaces
    IndexDeltas.writeDelta(Seq(9L).toDF("id"), path, 2L, Nil)
    assert(sortedIds(path) == Seq(1L, 2L, 3L, 4L))
    // the NEXT append id climbs past the folded floor
    assert(IndexDeltas.nextAppendId(spark, path) == 3L)
  }

  test("recovery-flow compaction: base absent, _prev live — _prev " +
      "survives until the swap lands, then folds") {
    val path = tmpPath("recover")
    Seq(1L, 2L).toDF("id").write.parquet(path)
    IndexDeltas.writeDelta(Seq(3L).toDF("id"), path, 1L, Nil)
    // simulate a crash inside a previous compaction's swap window:
    // the base moved to _prev, the tmp->path rename never happened
    val fs = new Path(path).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    assert(fs.rename(new Path(path), new Path(path + "_prev")))
    // readers serve from _prev (plus the live delta)
    assert(sortedIds(path) == Seq(1L, 2L, 3L))
    // compaction from the recovery state folds correctly
    IndexDeltas.compact(spark, path, Nil)
    assert(fs.exists(new Path(path)), "no live base after compaction")
    assert(!fs.exists(new Path(path + "_prev")), "_prev not cleaned")
    assert(sortedIds(path) == Seq(1L, 2L, 3L))
  }

  test("writeDelta never exposes a partial delta dir (tmp + rename)") {
    val path = tmpPath("atomic")
    Seq(1L).toDF("id").write.parquet(path)
    IndexDeltas.writeDelta(Seq(2L).toDF("id"), path, 1L, Nil)
    val fs = new Path(path).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val names = fs.listStatus(new Path(path + ".delta"))
      .map(_.getPath.getName).toSeq
    assert(names == Seq("batch=1"), s"unexpected delta layout: $names")
    // a leftover tmp dir from a crashed replay is invisible to readers
    fs.mkdirs(new Path(path + ".delta/_tmp_batch=2"))
    assert(sortedIds(path) == Seq(1L, 2L))
    assert(IndexDeltas.nextAppendId(spark, path) == 2L)
  }
}
