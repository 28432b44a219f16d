package graft.pipeline

import graft.SparkTestBase
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** curateRefresh's contract: on a delta it applies EXACTLY the batch
  * rules, so refresh(old→new) equals a full curate(new) whenever no
  * carried verdict depended on a removed/changed doc — and diverges in
  * precisely the documented dup-of-removed shape otherwise.
  */
class RefreshSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"
  private def base: DataFrame =
    spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"))

  private val cfg = Curation.Config(
    nearDup = Curation.NearDupStrategy.Ngram(maxDocFreq = 0),
    nearDupThreshold = 0.8)

  private def tmp(tag: String): String = java.nio.file.Files
    .createTempDirectory(s"graft_refresh_$tag").toString

  private def rows(df: DataFrame): Set[Seq[Any]] =
    df.collect().map(_.toSeq).toSet

  /** Old-corpus ids that participate in any internal exact/near-dup
    * relation — removing/changing one of those is exactly the
    * divergence case, so the equality fixture excludes them.
    */
  private lazy val tainted: Set[Long] = {
    val nd = Dedup.ngramJaccardPairs(base, "doc_id", "text",
      threshold = cfg.nearDupThreshold, maxDocFreq = 0)
    val ex = Dedup.exactGroups(base, "doc_id", "text")
    (nd.select(explode(array($"id_a", $"id_b")).as("id"))
      .as[Long].collect() ++
      ex.select($"keep_id").as[Long].collect()).toSet
  }

  test("snapshotDiff classifies all four states") {
    val o = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("doc_id", "text")
    val n = Seq((1L, "a"), (2L, "B2"), (4L, "d")).toDF("doc_id", "text")
    val d = Refresh.snapshotDiff(o, n, "doc_id", "text")
      .select("id", "change").as[(Long, String)].collect().toMap
    assert(d == Map(1L -> "unchanged", 2L -> "changed",
      3L -> "removed", 4L -> "added"))
  }

  test("refresh == full recompute when no carried verdict is stale") {
    val oldAudit = Curation.curate(base, "doc_id", "text", cfg)
    val oldKept = base.join(
      oldAudit.filter($"status" === "kept").select("doc_id"), "doc_id")
    val (pEx, pNg) = (tmp("ex"), tmp("ng"))
    Dedup.writeExactIndex(oldKept, "doc_id", "text", pEx)
    Dedup.writeNgramIndex(oldKept, "doc_id", "text", pNg)

    val t = tainted.toSeq
    val untouchable = $"doc_id".isin(t: _*)
    // remove %10==4, revise %10==7 — but never a doc another verdict
    // depended on; add an exact clone, a near-dup clone, and a
    // batch-internal dup pair, all under ids ABOVE every old id (the
    // min-id keeper rule makes corpus docs "earlier"; refresh assumes
    // ids grow, as ingestion ids do)
    val newSnap = base
      .filter(!($"doc_id" % 10 === 4 && !untouchable))
      .select($"doc_id",
        when($"doc_id" % 10 === 7 && !untouchable,
          concat($"text", lit(" rev2 tail"))).otherwise($"text")
          .as("text"))
      .union(oldKept.orderBy("doc_id").limit(1)
        .select(($"doc_id" + 100000).as("doc_id"), $"text"))
      .union(oldKept.orderBy("doc_id").limit(3)
        .select(($"doc_id" + 110000).as("doc_id"),
          concat($"text", lit(" zz qq xx")).as("text")))

    val refreshed = Refresh.curateRefresh(base, newSnap,
      "doc_id", "text", oldAudit, pEx,
      Some(Refresh.NearDupIndexRef.Ngram(pNg, maxDocFreq = 0)), cfg)
    val recomputed = Curation.curate(newSnap, "doc_id", "text", cfg)
    assert(rows(refreshed) == rows(recomputed))
    assert(refreshed.count() == newSnap.count())
    // the fixture really exercised every delta path
    val st = refreshed.filter($"doc_id" >= 100000)
      .select("status").as[String].collect().toSet
    assert(st.contains("exact_dup") && st.contains("near_dup"))
  }

  test("documented divergence: dup-of-removed is not resurrected") {
    val o = Seq((1L, "the quick brown fox jumps over the lazy dog today"),
      (2L, "the quick brown fox jumps over the lazy dog today"))
      .toDF("doc_id", "text")
    val c = Curation.Config(keepLangs = Seq("en", "und"), minQuality = 0)
    val oldAudit = Curation.curate(o, "doc_id", "text", c)
    assert(oldAudit.filter($"doc_id" === 2 && $"status" === "exact_dup")
      .count() == 1)
    val oldKept = o.join(
      oldAudit.filter($"status" === "kept").select("doc_id"), "doc_id")
    val pEx = tmp("div")
    Dedup.writeExactIndex(oldKept, "doc_id", "text", pEx)
    val newSnap = o.filter($"doc_id" === 2) // doc 1 removed
    val refreshed = Refresh.curateRefresh(o, newSnap, "doc_id", "text",
      oldAudit, pEx, None, c)
    // carried verdict: still exact_dup (the approximation); a full
    // recompute would keep it
    assert(refreshed.select("doc_id", "status").as[(Long, String)]
      .collect().toSet == Set((2L, "exact_dup")))
    assert(Curation.curate(newSnap, "doc_id", "text", c)
      .filter($"status" === "kept").count() == 1)
  }

  test("rollIndex: rolled indexes == rebuilt indexes on the new corpus") {
    val oldAudit = Curation.curate(base, "doc_id", "text", cfg)
    val oldKept = base.join(
      oldAudit.filter($"status" === "kept").select("doc_id"), "doc_id")
    val (pEx, pNg) = (tmp("roll_ex"), tmp("roll_ng"))
    Dedup.writeExactIndex(oldKept, "doc_id", "text", pEx)
    Dedup.writeNgramIndex(oldKept, "doc_id", "text", pNg)

    val t = tainted.toSeq
    val untouchable = $"doc_id".isin(t: _*)
    val newSnap = base
      .filter(!($"doc_id" % 10 === 4 && !untouchable))
      .union(base.filter($"doc_id" % 9 === 2)
        .select(($"doc_id" + 120000).as("doc_id"),
          concat($"text", lit(" fresh addendum words here")).as("text")))
    val refreshed = Refresh.curateRefresh(base, newSnap, "doc_id",
      "text", oldAudit, pEx,
      Some(Refresh.NearDupIndexRef.Ngram(pNg, maxDocFreq = 0)), cfg,
      rollIndex = true)
    refreshed.count() // force the roll

    // rebuild ground truth on the refreshed corpus's kept set
    val newKept = newSnap.join(
      refreshed.filter($"status" === "kept").select("doc_id"), "doc_id")
    val (pEx2, pNg2) = (tmp("rb_ex"), tmp("rb_ng"))
    Dedup.writeExactIndex(newKept, "doc_id", "text", pEx2)
    Dedup.writeNgramIndex(newKept, "doc_id", "text", pNg2)

    // tomorrow's probe: exact clones + near-dup variants of day-1 docs
    val probe = newKept.filter($"doc_id" % 3 === 0)
      .select(($"doc_id" + 200000).as("doc_id"), $"text")
      .union(newKept.filter($"doc_id" % 4 === 1)
        .select(($"doc_id" + 210000).as("doc_id"),
          concat($"text", lit(" zz qq xx")).as("text")))
    val exRolled = Dedup.exactKeepFromIndex(spark, pEx, probe,
      "doc_id", "text")
    val exRebuilt = Dedup.exactKeepFromIndex(spark, pEx2, probe,
      "doc_id", "text")
    assert(rows(exRolled) == rows(exRebuilt) && rows(exRolled).nonEmpty)
    val ngRolled = Dedup.ngramJaccardPairsFromIndex(spark, pNg, probe,
      "doc_id", "text", threshold = 0.8, maxDocFreq = 0)
    val ngRebuilt = Dedup.ngramJaccardPairsFromIndex(spark, pNg2, probe,
      "doc_id", "text", threshold = 0.8, maxDocFreq = 0)
    assert(rows(ngRolled) == rows(ngRebuilt) && rows(ngRolled).nonEmpty)
  }

  test("LM stage without a persisted model is refused") {
    val e = intercept[IllegalArgumentException] {
      Refresh.curateRefresh(base, base, "doc_id", "text",
        Curation.curate(base, "doc_id", "text", cfg), tmp("lm"),
        None, cfg.copy(minLmScore = Some(0.1)))
    }
    assert(e.getMessage.contains("lmModel"))
  }
}
