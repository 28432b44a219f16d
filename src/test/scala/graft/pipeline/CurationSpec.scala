package graft.pipeline

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class CurationSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def docs = spark.read
    .parquet("/root/testdata/sf0.001/documents.parquet")
    .select($"doc_id", $"text")

  /** base docs ∪ exact copies (+10000, %10) ∪ near copies (+20000, %20) —
    * the same fixture shape the oracle query uses.
    */
  private def fixture = {
    val d = docs
    d.union(d.filter($"doc_id" % 10 === 0)
        .select(($"doc_id" + 10000).as("doc_id"), $"text"))
      .union(d.filter($"doc_id" % 20 === 0)
        .select(($"doc_id" + 20000).as("doc_id"),
          concat($"text", lit(" zz qq xx")).as("text")))
  }

  private val cfg = Curation.Config(nearDup = Curation.NearDupStrategy.Ngram(maxDocFreq = 0))

  test("audit covers every input row exactly once, statuses partition") {
    CacheScope.withScope { scope =>
      val audit = Curation.curate(fixture, "doc_id", "text", cfg, scope)
        .collect()
      assert(audit.length == fixture.count())
      assert(audit.map(_.getLong(0)).distinct.length == audit.length)
      val statuses = audit.map(_.getString(1)).toSet
      assert(statuses.subsetOf(Set(Curation.LangFiltered,
        Curation.QualityFiltered, Curation.ExactDup, Curation.NearDup,
        Curation.Kept)))
      // every planted stage fires on this fixture
      assert(statuses.contains(Curation.Kept))
      assert(statuses.contains(Curation.ExactDup))
      assert(statuses.contains(Curation.NearDup))
      assert(statuses.contains(Curation.LangFiltered))
      // split present iff kept
      audit.foreach { r =>
        val kept = r.getString(1) == Curation.Kept
        assert(kept == !r.isNullAt(2),
          s"row ${r.getLong(0)}: status=${r.getString(1)} split=${r.get(2)}")
      }
    }
  }

  test("stage rules: exact copies drop as exact_dup, near copies as near_dup") {
    CacheScope.withScope { scope =>
      val audit = Curation.curate(fixture, "doc_id", "text", cfg, scope)
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      // an exact copy (+10000) whose BASE was kept must be exact_dup;
      // if the base was filtered, the copy was filtered at the same stage
      audit.filter { case (id, _) => id >= 10000 && id < 20000 }.foreach {
        case (id, st) =>
          val base = audit(id - 10000)
          if (base == Curation.Kept || base == Curation.NearDup)
            assert(st == Curation.ExactDup, s"copy $id: $st (base $base)")
          else if (base == Curation.LangFiltered ||
              base == Curation.QualityFiltered)
            assert(st == base, s"copy $id: $st (base $base)")
      }
      // a near copy (+20000) of a kept base must be near_dup (the base
      // has the smaller id and J >= 0.8 by construction at these lengths)
      val nearOfKept = audit.filter { case (id, _) =>
        id >= 20000 && audit(id - 20000) == Curation.Kept
      }
      assert(nearOfKept.nonEmpty)
      nearOfKept.foreach { case (id, st) =>
        assert(st == Curation.NearDup || st == Curation.QualityFiltered ||
          st == Curation.LangFiltered, s"near copy $id: $st")
      }
      assert(nearOfKept.values.exists(_ == Curation.NearDup))
    }
  }

  test("curated returns exactly the kept rows with original columns") {
    CacheScope.withScope { scope =>
      val audit = Curation.curate(fixture, "doc_id", "text", cfg, scope)
      val keptIds = audit.filter($"status" === Curation.Kept)
        .select("doc_id").as[Long].collect().toSet
      val curated = Curation.curated(fixture, "doc_id", "text", cfg, scope)
      assert(curated.columns.toSet == Set("doc_id", "text", "split"))
      assert(curated.select("doc_id").as[Long].collect().toSet == keptIds)
    }
  }

  test("null text is rejected at the language stage, not kept") {
    CacheScope.withScope { scope =>
      val withNull = fixture.union(
        Seq((99999L, null: String)).toDF("doc_id", "text"))
      val audit = Curation.curate(withNull, "doc_id", "text", cfg, scope)
        .filter($"doc_id" === 99999L).collect()
      assert(audit.length == 1)
      assert(audit.head.getString(1) == Curation.LangFiltered)
      assert(audit.head.isNullAt(2))
    }
  }

  test("MinHash near-dup strategy agrees with exact ngram on this fixture") {
    // the planted near-dups share most shingles, far above the banding
    // collision floor — so the approximate strategy must produce the
    // IDENTICAL audit here (its cost advantage appears on template-dense
    // corpora, PIPELINE_DRYRUN.md)
    CacheScope.withScope { scope =>
      val exact = Curation.curate(fixture, "doc_id", "text", cfg, scope)
        .collect().map(r => (r.getLong(0), r.getString(1))).toSet
      val mh = Curation.curate(fixture, "doc_id", "text",
          Curation.Config(nearDup = Curation.NearDupStrategy.MinHash()), scope)
        .collect().map(r => (r.getLong(0), r.getString(1))).toSet
      assert(mh == exact)
    }
  }

  test("transitive near-dup collapses hub shapes single-pass keeps") {
    // component {1,3,5} wired 1~5, 3~5 (a larger hub; J(1,3) sits below
    // the 0.7 threshold): single-pass drops only 5 (the higher id of
    // each pair) and keeps BOTH 1 and 3, though they are transitively
    // connected through 5; transitive mode keeps only the component min
    val t1 = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val docs = Seq(
      (1L, t1 + " one extra"),
      (3L, t1 + " two extra"),
      (5L, t1),
      (9L, "completely different words that share no shingles at all ok")
    ).toDF("doc_id", "text")
    def statuses(c: Curation.Config) = CacheScope.withScope { scope =>
      Curation.curate(docs, "doc_id", "text", c, scope)
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    }
    val base = Curation.Config(minQuality = 0, keepLangs = Seq("en", "und"),
      nearDupThreshold = 0.7,
      nearDup = Curation.NearDupStrategy.Ngram(maxDocFreq = 0))
    val single = statuses(base)
    assert(single(1L) == "kept" && single(3L) == "kept" &&
      single(5L) == "near_dup")
    val trans = statuses(base.copy(transitiveNearDup = true))
    assert(trans(1L) == "kept" && trans(3L) == "near_dup" &&
      trans(5L) == "near_dup")
    assert(single(9L) == "kept" && trans(9L) == "kept")
  }

  test("pii and repetition stages sit between quality and dedup") {
    val docs = Seq(
      (1L, "a perfectly ordinary sentence about nothing much at all"),
      (2L, "another ordinary sentence but reach me at spam@junk.example"),
      (3L, "the " * 49 + "the"),
      (4L, "a perfectly ordinary sentence about nothing much at all"))
      .toDF("doc_id", "text")
    val cfg = Curation.Config(minQuality = 0,
      keepLangs = Seq("en", "und"), maxPiiHits = 0, maxTokenRunPct = 50,
      nearDup = Curation.NearDupStrategy.Ngram(maxDocFreq = 0))
    val m = CacheScope.withScope { scope =>
      Curation.curate(docs, "doc_id", "text", cfg, scope)
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    }
    assert(m(1L) == Curation.Kept)
    assert(m(2L) == Curation.PiiFiltered)
    assert(m(3L) == Curation.RepetitionFiltered)
    assert(m(4L) == Curation.ExactDup) // dup of 1, which survived
    // stages off by default: same input all survives to dedup rules
    val off = CacheScope.withScope { scope =>
      Curation.curate(docs, "doc_id", "text",
          cfg.copy(maxPiiHits = Int.MaxValue, maxTokenRunPct = 100), scope)
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    }
    assert(off(2L) != Curation.PiiFiltered &&
      off(3L) != Curation.RepetitionFiltered)
  }

  test("per-key cap sits between filters and exact dedup: filtered " +
      "rows never consume slots, capped dups are cap_filtered") {
    val ok = "a perfectly ordinary sentence about nothing much at all"
    val docs = Seq(
      (1L, ok + " one", "d1"),
      (2L, "write only to spam@junk.example please thanks", "d1"),
                                      // pii-filtered: no cap slot
      (3L, ok + " three", "d1"),      // 2nd survivor of d1 -> kept
      (4L, ok + " four", "d1"),       // 3rd survivor, cap=2 -> capped
      (5L, ok + " one", "d1"),        // dup of 1 BUT past the cap:
                                      //   cap_filtered, NOT exact_dup
      (6L, ok + " six", "d2"),        // other key unaffected
      (7L, ok + " three", "d2"))      // dup of 3 (in-cap) -> exact_dup
      .toDF("doc_id", "text", "source")
    val cfg = Curation.Config(minQuality = 0,
      keepLangs = Seq("en", "und"), maxPiiHits = 0,
      nearDup = Curation.NearDupStrategy.Ngram(maxDocFreq = 0),
      maxPerKey = Some(("source", 2)))
    val m = CacheScope.withScope { scope =>
      Curation.curate(docs, "doc_id", "text", cfg, scope)
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    }
    assert(m(1L) == Curation.Kept)
    assert(m(2L) == Curation.PiiFiltered) // not cap_filtered
    assert(m(3L) == Curation.Kept) // slot NOT eaten by filtered row 2
    assert(m(4L) == Curation.CapFiltered)
    assert(m(5L) == Curation.CapFiltered) // cap decides before dedup
    assert(m(6L) == Curation.Kept)
    assert(m(7L) == Curation.ExactDup) // dup of an in-cap survivor
    // stage off: same input, no cap_filtered at all
    val off = CacheScope.withScope { scope =>
      Curation.curate(docs, "doc_id", "text",
          cfg.copy(maxPerKey = None), scope)
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    }
    assert(!off.values.toSet.contains(Curation.CapFiltered))
    assert(off(4L) == Curation.Kept && off(5L) == Curation.ExactDup)
  }

  test("model gate sits between quality and pii; quantized threshold") {
    val docs = Seq(
      (1L, "a perfectly ordinary sentence about nothing much at all"),
      (2L, "99 1 22 333 4444 55 6 77 888 9 00 11 2 3 44 55 66 77 88"),
      (3L, "another ordinary sentence but reach me at spam@junk.example"),
      (4L, "a perfectly ordinary sentence about nothing much at all"))
      .toDF("doc_id", "text")
    // digit soup scores a deeply negative logit under the default
    // model; prose scores positive — threshold 0 separates them
    val cfg = Curation.Config(minQuality = 0,
      keepLangs = Seq("en", "und"), maxPiiHits = 0,
      nearDup = Curation.NearDupStrategy.Ngram(maxDocFreq = 0),
      modelGate = Some(QualityModel.default), minModelLogitQ = 0L)
    val m = CacheScope.withScope { scope =>
      Curation.curate(docs, "doc_id", "text", cfg, scope)
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    }
    assert(m(1L) == Curation.Kept)
    assert(m(2L) == Curation.ModelFiltered) // model gate fires...
    assert(m(3L) == Curation.PiiFiltered) // ...BEFORE the pii stage
    assert(m(4L) == Curation.ExactDup)
    // gate off by default: the digit doc survives to the dedup rules
    val off = CacheScope.withScope { scope =>
      Curation.curate(docs, "doc_id", "text",
          cfg.copy(modelGate = None), scope)
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    }
    assert(off(2L) != Curation.ModelFiltered)
    // the stage decision equals the standalone scorer's keep column
    val scored = QualityModel.score(docs, "text").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Boolean]("keep")).toMap
    assert(!scored(2L) && scored(1L))
  }

  test("LM stage sits between cheap filters and dedup; null score rejects") {
    // model trained on a reference corpus the junk doc diverges from
    val ref = docs.limit(50)
    val model = LanguageModel.train(ref, "doc_id", "text", vocabSize = 20)
    // the %10 exact copies must still label exact_dup (LM passes them
    // like their originals), and an earlier-stage reject must KEEP its
    // earlier label: the one-token doc is unscorable (null LM score)
    // but the language stage already rejected it — stage order wins
    val withJunk = fixture
      .union(Seq((90001L, "solitary")).toDF("doc_id", "text"))
    val audit = Curation.curate(withJunk, "doc_id", "text",
      Curation.Config(nearDup = Curation.NearDupStrategy.Ngram(
          maxDocFreq = 0),
        minLmScore = Some(0.01), lmVocabSize = 20,
        lmModel = Some(model)))
    val byId = audit.collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(byId(90001L) == Curation.LangFiltered) // not lm_filtered
    assert(byId.values.count(_ == Curation.ExactDup) > 0)
    assert(byId.values.count(_ == Curation.Kept) > 0)
    // threshold above every score → everything not rejected earlier is
    // lm_filtered, and no doc ever reaches exact/near/kept
    val strict = Curation.curate(withJunk, "doc_id", "text",
      Curation.Config(nearDup = Curation.NearDupStrategy.Ngram(
          maxDocFreq = 0),
        minLmScore = Some(1.1), lmVocabSize = 20, lmModel = Some(model)))
      .collect().map(_.getString(1)).toSet
    assert(!strict.contains(Curation.Kept) &&
      !strict.contains(Curation.ExactDup) &&
      strict.contains(Curation.LmFiltered))
  }

  test("curate is deterministic across runs") {
    CacheScope.withScope { scope =>
      val a = Curation.curate(fixture, "doc_id", "text", cfg, scope)
        .collect().map(r => (r.getLong(0), r.getString(1), r.get(2))).toSet
      val b = Curation.curate(fixture, "doc_id", "text", cfg, scope)
        .collect().map(r => (r.getLong(0), r.getString(1), r.get(2))).toSet
      assert(a == b)
    }
  }

  test("prepareTrainingSequences equals the manual composition") {
    CacheScope.withScope { scope =>
      val got = Curation.prepareTrainingSequences(fixture, "doc_id",
          "text", cfg, seed = "sx", maxLen = 64, scope = scope)
        .select("doc_id", "_order", "seq", "seq_offset", "n_seqs")
        .collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
          r.getLong(3), r.getLong(4))).toSet
      // manual: curate, filter kept-train, permute, pack
      val keptIds = Curation.curate(fixture, "doc_id", "text", cfg, scope)
        .filter(col("status") === Curation.Kept &&
          col("split") === "train")
        .select("doc_id")
      val kept = fixture.select(col("doc_id"), col("text"))
        .join(keptIds, Seq("doc_id"))
      val exp = Sharding.packSequences(
          Sampling.permuted(kept, "doc_id", "sx"), "_order",
          TextAnalysis.tokenEstimate(col("text")), 64L)
        .select("doc_id", "_order", "seq", "seq_offset", "n_seqs")
        .collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
          r.getLong(3), r.getLong(4))).toSet
      assert(got == exp && got.nonEmpty)
      // only kept-train docs appear
      val ids = got.map(_._1)
      assert(ids == keptIds.collect().map(_.getLong(0)).toSet)
    }
  }

  test("prepareTrainingSequences rejects an unconfigured split name") {
    val e = intercept[IllegalArgumentException] {
      Curation.prepareTrainingSequences(fixture, "doc_id", "text", cfg,
        split = "holdout")
    }
    assert(e.getMessage.contains("holdout"))
  }
}
