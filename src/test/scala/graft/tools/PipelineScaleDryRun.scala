package graft.tools

import graft.pipeline.{CacheScope, Curation, Sharding, TextAnalysis}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** 100× scale dry-run of the round-10 composed operators: expands the
  * sf0.1 documents table (5 000 docs) to a 500 000-doc corpus and runs
  *
  *   1. token-budget SHARDING — the claim under test is the two-level
  *      prefix sum: assignment must be identical across partition
  *      counts (8 vs 64) AND identical to the serial driver-side
  *      contract, with no single-partition stage anywhere; walls
  *      recorded.
  *   2. CURATION — the composed pipeline at 500k docs with the
  *      stop-shingle guard at its default (the at-scale configuration,
  *      NOT the exact-oracle pin), recording per-status counts and
  *      wall; the guard exists exactly for this corpus shape (100
  *      near-identical reps make every shingle a stop-shingle, so the
  *      guarded run must stay bounded where exact mode would square).
  *
  * Corpus construction (deterministic, same family as DedupScaleDryRun):
  * rep 0 = original; reps 1..99 keep a rep-seeded half of the tokens
  * plus two rep/id marker tokens (Jaccard ~0.33 vs rep 0 — below any
  * near-dup threshold), except id%100==0 docs whose reps stay EXACT
  * copies (100-copy dup groups for the exact stage).
  *
  * Output goes to stdout AND PIPELINE_DRYRUN.md (committed evidence).
  */
object PipelineScaleDryRun {

  private val out = new StringBuilder
  private def log(s: String): Unit = { println(s); out.append(s).append('\n') }

  private def timed[T](label: String)(body: => T): T = {
    val t0 = System.nanoTime()
    val r = body
    log(f"  wall: ${(System.nanoTime() - t0) / 1e9}%.1f s  ($label)")
    r
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .appName("pipeline-scale-dryrun")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val reps = 100
    val base = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
      .select($"doc_id", $"text")
    val nBase = base.count()
    val corpus = base.crossJoin(
        spark.range(reps.toLong).toDF("rep").hint("broadcast"))
      .select(($"doc_id" + $"rep" * 1000000L).as("doc_id"),
        when($"rep" === 0 || $"doc_id" % 100 === 0, $"text")
          .otherwise(concat_ws(" ",
            filter(split($"text", " "),
              (w, i) => pmod(hash(w, $"rep", lit(0)), lit(2)) === (i % 2)),
            concat(lit("rep"), $"rep"),
            concat(lit("uid"), $"doc_id", lit("x"), $"rep")))
          .as("text"))
      .repartition(32).persist()
    val n = corpus.count()
    log(s"# Pipeline 100x scale dry-run (generated $n docs from " +
      s"sf0.1's $nBase)\n")

    // ---------------------------------------------------------- sharding
    log("## token-budget sharding (budget=65536 tokens)")
    val budget = 65536L
    def shardWith(parts: Int): DataFrame =
      Sharding.shardDocumentsByTokenBudget(corpus, "doc_id", "text",
        budget, numPartitions = parts)
        .select($"doc_id", $"shard")
    val a = timed("shard @ 8 partitions") {
      val d = shardWith(8).as[(Long, Long)].collect().sortBy(_._1); d
    }
    val b = timed("shard @ 64 partitions") {
      val d = shardWith(64).as[(Long, Long)].collect().sortBy(_._1); d
    }
    log(s"  partition-count invariance (8 vs 64): ${a.sameElements(b)}")
    val serial = timed("serial driver-side contract") {
      val toks = corpus
        .select($"doc_id", TextAnalysis.tokenEstimate($"text").as("t"))
        .as[(Long, Int)].collect().sortBy(_._1)
      var run = 0L
      toks.map { case (id, t) =>
        val s = run / budget; run += t; (id, s)
      }
    }
    log(s"  equals serial contract: ${a.sameElements(serial)}")
    log(s"  shards produced: ${a.map(_._2).max + 1} " +
      s"(~${a.length / (a.map(_._2).max + 1)} docs/shard)\n")

    // ---------------------------------------------------------- curation
    // near-dup strategies to measure come from args (default all three);
    // the ngram-1000 leg costs ~17 min on this corpus — pass a subset to
    // add one measurement without re-running the others. Args: integers
    // select the ngram guard at that maxDocFreq; "minhash" selects the
    // banded-signature strategy.
    // "cluster" arg: connected components over the at-scale MinHash pair
    // set — 50 planted 100-copy exact families = 50 cliques of 100
    // (~247k edges), the designed CC stress: rounds, walls, and the
    // component census are the committed scale evidence.
    if (args.contains("cluster")) {
      log("## dup clustering at 500k docs (minhash pairs -> components)")
      CacheScope.withScope { scope =>
        val pairs = timed("minhash pair generation") {
          val p = graft.pipeline.Dedup.minhashPairs(corpus,
            "doc_id", "text", threshold = 0.8, scope = scope)
            .persist()
          log(s"  pairs: ${p.count()}"); p
        }
        val (labels, rounds) = timed("connected components") {
          val (l, r) = graft.pipeline.Clustering
            .connectedComponentsStats(pairs, scope = scope)
          log(s"  star rounds to converge: $r (nodes: ${l.count()})")
          (l, r)
        }
        val census = labels.groupBy("cluster_id").count()
          .agg(count(lit(1)), max($"count"), min($"count"))
          .head()
        log(s"  components: ${census.getLong(0)}, sizes " +
          s"${census.getLong(2)}..${census.getLong(1)}")
        val _ = rounds
        pairs.unpersist()
      }
      log("")
    }

    // "prepare" arg: the END-TO-END flagship at 500k docs — curate
    // (minhash strategy, the at-scale default) → train split → md5
    // permutation → 2048-token sequence packing, one call.
    if (args.contains("prepare")) {
      log("## prepareTrainingSequences at 500k docs " +
        "(minhash strategy, maxLen=2048)")
      CacheScope.withScope { scope =>
        val packed = timed("curate -> train split -> permute -> pack") {
          val p = Curation.prepareTrainingSequences(corpus, "doc_id",
            "text",
            Curation.Config(nearDup = Curation.NearDupStrategy.MinHash()),
            seed = "dry", maxLen = 2048, scope = scope).persist()
          log(s"  kept+packed docs: ${p.count()}"); p
        }
        val stats = packed
          .agg(max($"seq"), sum($"_tokens"), count(lit(1))).head()
        log(s"  sequences: ${stats.getLong(0) + 1}, total tokens " +
          s"${stats.getLong(1)}, straddling docs: " +
          s"${packed.filter($"n_seqs" > 1).count()}")
        packed.unpersist()
      }
      log("")
    }

    // "lines" arg: line-level boilerplate dedup at 500k docs — the
    // corpus gains deterministic multi-line structure (' value ' line
    // breaks + nav/footer lines on id-modulo classes, the oracle
    // fixture's shape at 100×), then measures the offline index build,
    // the one-shot rewrite, and the per-batch index-probe rewrite; the
    // probe must equal the one-shot rewrite restricted to the batch
    // (both decide from CORPUS frequencies).
    if (args.contains("lines")) {
      log("## line-level boilerplate dedup at 500k docs (guard=1000)")
      import graft.pipeline.LineDedup
      // the oracle fixture's exact shape at 100× — shared helper, so a
      // fixture change in Queries cannot silently diverge from what
      // this leg measures
      val lined = graft.Queries.linedDocs(corpus).persist()
      log(s"  lined docs: ${lined.count()}; exploded lines: " +
        LineDedup.explodedLines(lined, "doc_id", "text").count())
      val idxPath = java.nio.file.Files
        .createTempDirectory("dryrun_line_idx").toString
      timed("writeLineIndex (offline corpus count)") {
        LineDedup.writeLineIndex(lined, "doc_id", "text", idxPath)
      }
      val idx = spark.read.parquet(s"$idxPath/hashes").persist()
      log(s"  distinct lines indexed: ${idx.count()}; above guard: " +
        idx.filter($"doc_freq" > 1000).count())
      val oneShot = timed("dropBoilerplate one-shot rewrite") {
        CacheScope.withScope { scope =>
          val r = LineDedup.dropBoilerplate(lined, "doc_id", "text",
            maxDocFreq = 1000, scope = scope).persist()
          log(s"  docs out: ${r.count()}, lines dropped: " +
            r.agg(sum($"n_dropped")).head().getLong(0))
          r
        }
      }
      // rep-0 originals only: a 5 000-doc daily batch, 1% of corpus
      val batch = lined.filter($"doc_id" < 1000000L).persist()
      val probed = timed(s"dropBoilerplateFromIndex on a " +
          s"${batch.count()}-doc batch") {
        val r = LineDedup.dropBoilerplateFromIndex(spark, idxPath,
          batch, "doc_id", "text", maxDocFreq = 1000).persist()
        log(s"  batch docs rewritten: ${r.count()}")
        r
      }
      val restricted = oneShot.join(batch.select("doc_id"), "doc_id")
        .select("doc_id", "text", "n_lines", "n_dropped")
      val diff = probed.union(restricted)
        .groupBy("doc_id", "text", "n_lines", "n_dropped").count()
        .filter($"count" =!= 2).count()
      log(s"  probe equals one-shot restricted to batch: ${diff == 0L}")
      probed.unpersist(); oneShot.unpersist(); idx.unpersist()
      batch.unpersist(); lined.unpersist()
      log("")
    }

    // "semantic" arg: SemDeDup-shaped dedup at 200k vectors — sf0.1's
    // 2k embeddings cloned 100×: id%100==0 families stay EXACT copies
    // (20 families × 100 copies = 99,000 true pairs, all co-assigned
    // by construction), every other rep becomes an independent hash-
    // generated vector (random 64-dim cosines concentrate near 0 — no
    // false pairs at 0.999). Claims measured: the cell-size refusal
    // fires at an under-provisioned k; at k ~ corpus/1000 the pair
    // join stays bounded and recovers exactly the planted families.
    if (args.contains("semantic")) {
      log("## semantic dedup at 200k vectors (k-means cells)")
      import graft.pipeline.{Dedup => D}
      val baseE = spark.read
        .parquet("/root/testdata/sf0.1/embeddings.parquet")
        .select($"vec_id", $"embedding")
      val vecs = baseE.crossJoin(
          spark.range(reps.toLong).toDF("rep").hint("broadcast"))
        .select(($"vec_id" + $"rep" * 1000000L).as("vec_id"),
          when($"rep" === 0 || $"vec_id" % 100 === 0, $"embedding")
            .otherwise(transform($"embedding", (_, i) =>
              ((pmod(hash($"vec_id", $"rep", i), lit(1000)))
                .cast("float") / 500.0f) - 1.0f)).as("embedding"))
        .repartition(32).persist()
      log(s"  vectors: ${vecs.count()}")
      val centroids = timed("trainIvfCentroids k=512 (driver Lloyd's)") {
        graft.pipeline.Similarity.trainIvfCentroids(vecs, "vec_id",
          "embedding", k = 512, sampleN = 10000, iters = 4)
      }
      val refused =
        try { D.semanticPairs(vecs, "vec_id", "embedding",
            centroids.take(4), threshold = 0.999,
            maxCellSize = 10000).count(); false }
        catch { case e: IllegalArgumentException =>
          log(s"  under-provisioned k refused: ${e.getMessage
            .takeWhile(_ != ':')} (k=4, cap=10000)"); true }
      log(s"  refusal guard fired: $refused")
      CacheScope.withScope { scope =>
        val pairs = timed("semanticPairs k=512, threshold=0.999") {
          val p = D.semanticPairs(vecs, "vec_id", "embedding",
            centroids, threshold = 0.999, scope = scope).persist()
          log(s"  pairs found: ${p.count()} (planted: 20 exact " +
            "families x C(100,2) = 99000)")
          p
        }
        val unexpected = pairs.filter(!(
          pmod($"id_a", lit(1000000L)) === pmod($"id_b", lit(1000000L)) &&
          pmod($"id_a", lit(100L)) === 0)).persist()
        val nUnexpected = unexpected.count()
        log(s"  non-planted pairs: $nUnexpected")
        if (nUnexpected > 0 && nUnexpected <= 20)
          unexpected.orderBy("id_a", "id_b").collect().foreach(r =>
            log(f"    ${r.getLong(0)}%d ~ ${r.getLong(1)}%d cos=" +
              f"${r.getDouble(2)}%.6f"))
        unexpected.unpersist(); pairs.unpersist()
      }
      vecs.unpersist()
      log("")
    }

    // "spans" arg: exact duplicated-span detection at 500k docs. The
    // id%100==0 exact-copy families mean every window of those docs is
    // duplicated 100-fold — the designed hot-hash stress for the
    // partial-agg keep-first rule (a rank window over the hash
    // partition would funnel those through single reducers). Expect
    // whole-doc spans on all non-first family members.
    if (args.contains("spans")) {
      log("## duplicated-span detection at 500k docs (window=20)")
      import graft.pipeline.SpanDedup
      val nWindows = SpanDedup.windowHashes(corpus, "doc_id", "text", 20)
        .count()
      log(s"  window table rows: $nWindows")
      CacheScope.withScope { scope =>
        val spans = timed("duplicateSpans (keep-first + merge)") {
          val sp = SpanDedup.duplicateSpans(corpus, "doc_id", "text",
            20, scope).persist()
          log(s"  spans found: ${sp.count()}")
          sp
        }
        // family members (id%100==0, rep>0) must be fully covered by
        // one whole-doc span each; rep-0 family docs are corpus-first
        val fam = spans.filter(pmod($"id", lit(100L)) === 0 &&
          $"id" >= 1000000L)
        val famStats = fam.groupBy().agg(count(lit(1)),
          min($"span_start"), countDistinct($"id")).head()
        log(s"  family-member spans: ${famStats.getLong(0)} over " +
          s"${famStats.getLong(2)} docs, min start " +
          s"${famStats.getInt(1)} (expect one [0, n) span per doc: " +
          "99 non-first copies x 47 families at >= 20 tokens = 4653; " +
          "3 family bases are shorter than one window and sit below " +
          "the method's resolution by definition)")
        spans.unpersist()
      }
      log("")
    }

    val nonStrategyArgs = Set("cluster", "prepare", "lines", "semantic",
      "spans")
    val strategies: Seq[(String, Curation.NearDupStrategy)] =
      (args.filterNot(nonStrategyArgs) match {
        case Array() if args.exists(nonStrategyArgs) => Seq.empty[String]
        case Array() => Seq("1000", "50", "minhash")
        case rest => rest.toSeq
      }).map {
          case "minhash" => "minhash 64/16" -> Curation.NearDupStrategy.MinHash()
          case g => s"ngram guard=$g" ->
            Curation.NearDupStrategy.Ngram(maxDocFreq = g.toInt)
        }
    strategies.foreach { case (label, strat) =>
      log(s"## curation at 500k docs ($label)")
      val counts = timed(s"curate (lang=en, q>=40, J>=0.8, $label)") {
        CacheScope.withScope { scope =>
          Curation.curate(corpus, "doc_id", "text",
              Curation.Config(nearDup = strat), scope)
            .groupBy("status").count()
            .as[(String, Long)].collect().toMap
        }
      }
      counts.toSeq.sortBy(_._1).foreach { case (s, c) =>
        log(f"  $s%-18s $c%8d")
      }
      log("")
    }
    log("Note: exact mode (maxDocFreq=0) on this corpus is the designed-" )
    log("for failure: ~100 reps of every document make every shingle a")
    log("stop-shingle, so the unguarded self-join squares. The guard is")
    log("the at-scale default; the oracle queries pin exact mode only at")
    log("oracle scale.")

    val target = if (args.nonEmpty)
      s"PIPELINE_DRYRUN_${args.mkString("_")}.md" else "PIPELINE_DRYRUN.md"
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(target), out.toString)
    spark.stop()
  }
}
