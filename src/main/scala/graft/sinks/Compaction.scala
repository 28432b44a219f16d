package graft.sinks

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** Small-file compaction for parquet directories — the operational
  * chore every long-lived 100 TB lake needs: streaming sinks and
  * per-batch appends leave thousands of KB-scale files per directory,
  * and scan cost degrades with file COUNT (driver listing, task
  * scheduling, row-group overhead) long before it degrades with bytes.
  *
  * Two-step contract, refusal-guarded like the index builders:
  * [[plan]] is a read-only report (file count, bytes, target file
  * count) so an operator can see what a rewrite would do; [[compact]]
  * rewrites content-identically into ~`targetBytes` files and REFUSES
  * to replace the source until the rewritten copy's row count equals
  * the source's — a failed rewrite leaves the original untouched.
  *
  * Scale notes: all filesystem work goes through the Hadoop
  * `FileSystem` API, so the same code runs on HDFS/S3A/local; `plan`
  * reads only file metadata (no data scan); the rewrite is one
  * `repartition(n)` pass — a single round-robin exchange sized from
  * the directory's own on-disk bytes, no driver-side row buffering.
  * Partitioned layouts compact per leaf directory, keeping each
  * rewrite's blast radius one partition. The promote step is two
  * renames — atomic on HDFS; on S3A pair it with a committer the
  * bucket supports.
  */
object Compaction {

  /** Read-only compaction report for a parquet directory. */
  final case class Plan(path: String, nFiles: Long, totalBytes: Long,
      targetFiles: Int) {
    def worthwhile: Boolean = nFiles > targetFiles
  }

  private def fs(spark: SparkSession, path: Path): FileSystem =
    path.getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Compute the compaction plan: current data-file count and bytes,
    * and the file count a `targetBytes`-sized rewrite would produce.
    */
  def plan(spark: SparkSession, path: String,
      targetBytes: Long = 128L * 1024 * 1024): Plan = {
    require(targetBytes > 0, "targetBytes must be > 0")
    val dir = new Path(path)
    val f = fs(spark, dir)
    require(f.getFileStatus(dir).isDirectory, s"$path is not a directory")
    val files = f.listStatus(dir).toSeq
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
    val bytes = files.map(_.getLen).sum
    val target = math.max(1L, (bytes + targetBytes - 1) / targetBytes)
    require(target <= Int.MaxValue, s"target file count $target overflows")
    Plan(path, files.size.toLong, bytes, target.toInt)
  }

  /** Rewrite `path` into ~`targetBytes` parquet files, content-
    * preserving. The rewrite lands in a sibling staging directory
    * first; only after its row count matches the source does the
    * original move aside and the staging directory take its place —
    * the refusal path leaves the source untouched and the staging
    * directory on disk for inspection. Returns the executed [[Plan]].
    */
  def compact(spark: SparkSession, path: String,
      targetBytes: Long = 128L * 1024 * 1024): Plan = {
    val p = plan(spark, path, targetBytes)
    if (!p.worthwhile) return p
    val src = spark.read.parquet(path)
    val staging = path.stripSuffix("/") + "_compact_staging"
    src.repartition(p.targetFiles).write.mode("overwrite").parquet(staging)
    val nSrc = src.count()
    val nOut = spark.read.parquet(staging).count()
    require(nOut == nSrc,
      s"compaction rewrite of $path produced $nOut rows, source has " +
        s"$nSrc — source left untouched, staging kept at $staging")
    val dir = new Path(path)
    val f = fs(spark, dir)
    val retired = new Path(path.stripSuffix("/") + "_compact_old")
    f.delete(retired, true)
    require(f.rename(dir, retired), s"could not retire $path")
    require(f.rename(new Path(staging), dir),
      s"could not promote $staging into place (source retired at " +
        s"$retired)")
    f.delete(retired, true)
    p
  }
}
