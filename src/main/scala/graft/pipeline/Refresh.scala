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

  /** Which persisted near-dup index [[curateRefresh]] probes (and, with
    * `rollIndex`, rolls forward). Minhash is the at-scale default for
    * the same reasons as [[Curation.NearDupStrategy]]; Ngram with
    * `maxDocFreq = 0` is the provably-exact mode the oracle queries pin.
    */
  sealed trait NearDupIndexRef { def path: String }
  object NearDupIndexRef {
    final case class Minhash(path: String, maxBucketSize: Int = 1000)
      extends NearDupIndexRef
    final case class Ngram(path: String, maxDocFreq: Int = 1000)
      extends NearDupIndexRef
  }

  /** Incremental re-curation of a NEW snapshot given the OLD snapshot's
    * audit and persisted indexes — the day-2 composition: only the
    * DELTA (added + changed docs) runs the curation stages; unchanged
    * docs carry their old verdicts forward; removed docs leave the
    * audit. Output shape equals [[Curation.curate]]'s:
    * `(idCol, status, split)`, one row per NEW-snapshot id.
    *
    * Decision rules on the delta are EXACTLY the batch rules (shared
    * [[Curation.stageFlags]] definition): language → quality → model →
    * pii → repetition → lm → exact → near-dup → split, where the exact
    * stage
    * probes `exactIndexPath` (the old KEPT corpus) and the near-dup
    * stage probes `nearDupIndex` — a delta doc is `near_dup` iff it
    * pairs with a live old-kept doc (the corpus is "earlier") or with a
    * lower-id delta doc, the incremental reading of curate's
    * drop-higher-id rule.
    *
    * INDEX MAINTENANCE IS PART OF THE CONTRACT: the operator first
    * APPENDS tombstones for dead old content (removed/changed docs
    * that were kept — rejected old docs were never in the index, and
    * tombstoning a removed exact-dup's hash would kill its surviving
    * keeper's content, so the kept-filter is load-bearing), making the
    * probes see the reduced corpus; with `rollIndex = true` it then
    * appends the delta's kept docs, so tomorrow's refresh probes
    * today's corpus. Reruns over the same diff are idempotent
    * (tombstone rows dedupe at read); `rollIndex` reruns are NOT —
    * roll once per accepted refresh.
    *
    * Deliberate approximation (the incremental family's documented
    * one): verdicts of UNCHANGED docs are carried, so a doc that was
    * `exact_dup`/`near_dup` of a now-removed doc is not resurrected —
    * a full [[Curation.curate]] of the new snapshot is the exact
    * recompute; RefreshSpec pins both the equality (when no such case
    * exists) and the divergence shape.
    *
    * 100 TB: cost is delta-sized — stage filters map over the delta
    * only, the exact probe is bloom-prefiltered and prefix-pruned, the
    * near-dup probe is batch-kernel + index-scan joins, and the
    * carried side is one id join of audit-width rows. Nothing
    * corpus-sized is re-read beyond the index scans.
    */
  def curateRefresh(oldSnap: DataFrame, newSnap: DataFrame,
      idCol: String, textCol: String, oldAudit: DataFrame,
      exactIndexPath: String,
      nearDupIndex: Option[NearDupIndexRef] = None,
      cfg: Curation.Config = Curation.Config(),
      rollIndex: Boolean = false,
      scope: CacheScope = CacheScope.session): DataFrame = {
    val spark = newSnap.sparkSession
    val sc = CacheScope.resolve(scope, spark)
    require(cfg.keepLangs.nonEmpty, "keepLangs must be non-empty")
    require(cfg.minLmScore.isEmpty || cfg.lmModel.nonEmpty,
      "refresh with an LM stage needs the persisted reference model " +
        "(cfg.lmModel): self-training on a delta diverges from the " +
        "corpus-trained scores the old audit used")
    require(cfg.maxPerKey.isEmpty,
      "maxPerKey is a whole-corpus stage: a delta alone cannot " +
        "evaluate a global per-key cap — cap in the batch curate, or " +
        "re-run the cap over old-kept + delta upstream")

    val diff = sc.persist(snapshotDiff(oldSnap, newSnap, idCol, textCol))
    val audit = oldAudit.select(col(idCol).cast("long").as("id"),
      col("status"), col("split"))

    // dead old content: removed/changed docs that were KEPT (and thus
    // live in the indexes) — tombstone them so every probe below sees
    // the reduced corpus
    val deadIds = diff.filter(col("change").isin("removed", "changed"))
      .select("id")
      .join(audit.filter(col("status") === Curation.Kept).select("id"),
        "id")
    val deadDocs = oldSnap.select(col(idCol).cast("long").as("id"),
        col(textCol).as("text"))
      .join(deadIds, "id")
    Dedup.writeTombstones(deadDocs, "id", "text", exactIndexPath)
    nearDupIndex.foreach(r =>
      Dedup.writeTombstones(deadDocs, "id", "text", r.path))

    val delta = sc.persist(newSnap
      .select(col(idCol).cast("long").as("id"),
        col(textCol).as("text"))
      .join(diff.filter(col("change").isin("added", "changed"))
        .select("id"), "id"))

    val staged = sc.persist(
      Curation.stageFlags(delta, "id", "text", cfg, sc))
    val filtersOk = col("_lang_ok") && col("_q_ok") && col("_m_ok") &&
      col("_pii_ok") && col("_rep_ok") && col("_lm_ok")
    val survivors = staged.filter(filtersOk).select("id", "text")

    val exact = Dedup.exactKeepFromIndex(spark, exactIndexPath,
      survivors, "id", "text").select(col("id"), col("status").as("_ex"))
    val exKept = sc.persist(survivors
      .join(exact.filter(col("_ex") === "new").select("id"), "id"))

    val pairs = nearDupIndex match {
      case Some(NearDupIndexRef.Minhash(p, cap)) =>
        Dedup.minhashPairsFromIndex(spark, p, exKept, "id", "text",
          threshold = cfg.nearDupThreshold, maxBucketSize = cap,
          scope = sc)
      case Some(NearDupIndexRef.Ngram(p, mdf)) =>
        Dedup.ngramJaccardPairsFromIndex(spark, p, exKept, "id", "text",
          threshold = cfg.nearDupThreshold, maxDocFreq = mdf, scope = sc)
      case None =>
        import spark.implicits._
        Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    }
    // incremental drop rule: (batch, corpus) pair drops the batch doc
    // (id_a); batch-internal pair (a < b by the incremental contract)
    // drops the higher id. Corpus and delta ids are disjoint — changed
    // ids were tombstoned above — so delta membership is the test.
    val ndDrop = pairs
      .join(delta.select(col("id").as("id_b"))
        .withColumn("_b_batch", lit(true)), Seq("id_b"), "left")
      .select(when(col("_b_batch"), col("id_b"))
        .otherwise(col("id_a")).as("id"))
      .distinct().withColumn("_nd", lit(true))

    val status = when(!col("_lang_ok"), lit(Curation.LangFiltered))
      .when(!col("_q_ok"), lit(Curation.QualityFiltered))
      .when(!col("_m_ok"), lit(Curation.ModelFiltered))
      .when(!col("_pii_ok"), lit(Curation.PiiFiltered))
      .when(!col("_rep_ok"), lit(Curation.RepetitionFiltered))
      .when(!col("_lm_ok"), lit(Curation.LmFiltered))
      .when(col("_ex").isin("dup_of_corpus", "dup_in_batch"),
        lit(Curation.ExactDup))
      .when(col("_nd"), lit(Curation.NearDup))
      .otherwise(lit(Curation.Kept))
    val deltaAudit = staged
      .join(exact, Seq("id"), "left")
      .join(ndDrop, Seq("id"), "left")
      .withColumn("status", status)
      .withColumn("split",
        when(col("status") === Curation.Kept,
          Sampling.hashSplitColumn(col("text"), cfg.splits)))
      .select(col("id"), col("status"), col("split"))

    if (rollIndex) {
      val keptNew = delta.join(
        deltaAudit.filter(col("status") === Curation.Kept).select("id"),
        "id")
      Dedup.appendToExactIndex(spark, exactIndexPath, keptNew,
        "id", "text")
      nearDupIndex.foreach {
        case NearDupIndexRef.Minhash(p, _) =>
          Dedup.appendToMinhashIndex(spark, p, keptNew, "id", "text")
        case NearDupIndexRef.Ngram(p, _) =>
          Dedup.appendToNgramIndex(spark, p, keptNew, "id", "text")
      }
    }

    audit.join(diff.filter(col("change") === "unchanged").select("id"),
        "id")
      .select("id", "status", "split")
      .union(deltaAudit)
      .select(col("id").as(idCol), col("status"), col("split"))
  }
}
