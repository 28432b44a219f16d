package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-lifecycle operators: snapshot-to-snapshot diff and
  * incremental re-curation — the day-2 loop of a 100 TB corpus, where
  * each day delivers a full new snapshot (crawl refresh, upstream
  * re-export) and recomputing everything from scratch is the cost
  * ceiling, not the plan.
  *
  * Scale design: diffs carry `(id, md5)` pairs — 40 bytes a row — never
  * document text through the join; change classification is one
  * hash-partitioned full-outer join. Refresh pays per-DELTA cost: only
  * added/changed documents run the curation stages, against the
  * PERSISTED indexes of the previous corpus (no old-corpus rescan).
  */
object Refresh {

  /** Row-level diff of two corpus snapshots keyed by `idCol`:
    * one row per id present in either side, with
    * `change ∈ added | removed | changed | unchanged` and the content
    * hashes that justify it (`old_h` / `new_h`, null where the side is
    * absent). Content equality is md5 — the same content-identity rule
    * the exact-dedup family uses, so "changed" here and "new content"
    * there can never disagree.
    *
    * 100 TB: hashes are computed map-side BEFORE the join, so the
    * full-outer shuffle moves 40-byte rows, not documents; both sides
    * hash-partition on id (no broadcast — both snapshots are
    * corpus-sized).
    */
  def snapshotDiff(oldSnap: DataFrame, newSnap: DataFrame,
      idCol: String, textCol: String): DataFrame = {
    val o = oldSnap.select(col(idCol).cast("long").as("id"),
      md5(col(textCol)).as("old_h"))
    val n = newSnap.select(col(idCol).cast("long").as("id"),
      md5(col(textCol)).as("new_h"))
    o.join(n, Seq("id"), "full_outer")
      .select(col("id"),
        when(col("old_h").isNull, lit("added"))
          .when(col("new_h").isNull, lit("removed"))
          .when(col("old_h") =!= col("new_h"), lit("changed"))
          .otherwise(lit("unchanged")).as("change"),
        col("old_h"), col("new_h"))
  }
}
