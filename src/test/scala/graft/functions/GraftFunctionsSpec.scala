package graft.functions

import graft.SparkTestBase
import graft.pipeline.{Sampling, TextAnalysis}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class GraftFunctionsSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def docs = spark.read
    .parquet("/root/testdata/sf0.001/documents.parquet")
    .select($"doc_id", $"text")

  test("SQL surface equals the Column API term by term") {
    GraftFunctions.register(spark)
    docs.createOrReplaceTempView("gf_docs")
    val viaSql = spark.sql("""
      SELECT doc_id, graft_token_count(text) AS a,
             graft_token_estimate(text) AS b,
             graft_quality_score(text) AS c,
             graft_lang_id(text) AS d,
             graft_fingerprint(text) AS e,
             graft_split(text, 'train', 0.8D, 'val', 0.1D, 'test', 0.1D)
               AS f,
             graft_keep_sample(text, 0.25D) AS g,
             graft_permutation(doc_id, 'p9') AS h
      FROM gf_docs""").collect().map(r => r.getLong(0) -> r.toSeq.tail).toMap
    val viaColumns = docs.select($"doc_id",
        TextAnalysis.tokenCount($"text"),
        TextAnalysis.tokenEstimate($"text"),
        TextAnalysis.qualityScore($"text"),
        TextAnalysis.langId($"text"),
        TextAnalysis.fingerprint($"text"),
        Sampling.hashSplitColumn($"text",
          Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)),
        Sampling.hashSampleColumn($"text", 0.25),
        Sampling.permutationColumn($"doc_id", "p9"))
      .collect().map(r => r.getLong(0) -> r.toSeq.tail).toMap
    assert(viaSql == viaColumns)
  }

  test("PII SQL surface equals the Column API") {
    GraftFunctions.register(spark)
    Seq(Tuple1("mail a@b.io from 10.0.0.1 or +123456789 x"))
      .toDF("text").createOrReplaceTempView("gf_pii")
    val r = spark.sql("""
      SELECT graft_email_count(text), graft_ipv4_count(text),
             graft_phone_count(text), graft_redact_pii(text)
      FROM gf_pii""").head()
    assert((r.getInt(0), r.getInt(1), r.getInt(2)) == ((1, 1, 1)))
    assert(r.getString(3) == "mail <EMAIL> from <IP> or <PHONE> x")
  }

  test("repetition + URL SQL surface equals the Column API") {
    GraftFunctions.register(spark)
    Seq(Tuple1("go go go stop https://a.io/x and https://b.io now"))
      .toDF("text").createOrReplaceTempView("gf_rep")
    val r = spark.sql("""
      SELECT graft_max_token_count(text), graft_max_bigram_count(text),
             graft_distinct_token_count(text), graft_url_count(text)
      FROM gf_rep""").head()
    assert((r.getInt(0), r.getInt(1), r.getInt(2), r.getInt(3)) ==
      ((3, 2, 6, 2)))
  }

  test("graft_cosine_similarity matches the Column expression") {
    GraftFunctions.register(spark)
    val e = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
      .limit(20).select($"vec_id", $"embedding")
    e.createOrReplaceTempView("gf_embs")
    val viaSql = spark.sql("""
      SELECT a.vec_id, b.vec_id,
             graft_cosine_similarity(a.embedding, b.embedding) AS sim
      FROM gf_embs a JOIN gf_embs b ON a.vec_id < b.vec_id""")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
      .toMap
    val viaCol = e.as("a").join(e.as("b"), $"a.vec_id" < $"b.vec_id")
      .select($"a.vec_id", $"b.vec_id",
        VectorExpressions.cosineC($"a.embedding", $"b.embedding").as("sim"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
      .toMap
    assert(viaSql == viaCol)
  }

  test("registration is idempotent and arity errors are clear") {
    GraftFunctions.register(spark)
    GraftFunctions.register(spark) // replace, not fail
    docs.createOrReplaceTempView("gf_docs")
    val err = intercept[Exception] {
      spark.sql("SELECT graft_token_count(text, text) FROM gf_docs")
        .collect()
    }
    assert(err.getMessage.contains("expected 1 argument"))
    val err2 = intercept[Exception] {
      spark.sql("SELECT graft_split(text, 'train', text) FROM gf_docs")
        .collect()
    }
    assert(err2.getMessage.contains("literal"))
  }

  test("graft_curate table function equals the DataFrame operator") {
    GraftTableFunctions.register(spark)
    docs.createOrReplaceTempView("gf_curate_docs")
    val viaSql = spark.sql("""
      SELECT doc_id, status, split
      FROM graft_curate('gf_curate_docs', 'doc_id', 'text',
                        'en', 40, 0.8D, 'ngram_exact')""")
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), Option(r.getString(2)))).toMap
    val viaApi = graft.pipeline.Curation.curate(docs, "doc_id", "text",
        graft.pipeline.Curation.Config(nearDup =
          graft.pipeline.Curation.NearDupStrategy.Ngram(maxDocFreq = 0)))
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), Option(r.getString(2)))).toMap
    assert(viaSql == viaApi)
    assert(viaSql.nonEmpty)
    graft.pipeline.CacheScope.releaseSession(spark)
  }

  test("graft_curate composes inside a larger SQL statement") {
    GraftTableFunctions.register(spark)
    docs.createOrReplaceTempView("gf_curate_docs")
    // the TVF result is a first-class FROM source: filter + aggregate
    // over it in the SAME statement, one optimized plan
    val bySplit = spark.sql("""
      SELECT split, count(*) AS n
      FROM graft_curate('gf_curate_docs', 'doc_id', 'text')
      WHERE status = 'kept' GROUP BY split""")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySplit.values.sum > 0)
    assert(bySplit.keySet.subsetOf(Set("train", "val", "test")))
    graft.pipeline.CacheScope.releaseSession(spark)
  }

  test("graft_dedup_exact and graft_contamination equal the operators") {
    GraftTableFunctions.register(spark)
    // plant exact copies so the group table is non-empty
    val planted = docs.union(docs.filter($"doc_id" % 7 === 0)
      .select(($"doc_id" + 90000).as("doc_id"), $"text"))
    planted.createOrReplaceTempView("gf_tvf_docs")
    val viaSql = spark.sql("""
      SELECT content_hash, keep_id, n_copies
      FROM graft_dedup_exact('gf_tvf_docs', 'doc_id', 'text')""")
      .collect().map(_.toSeq).toSet
    val viaApi = graft.pipeline.Dedup.exactGroups(planted,
      "doc_id", "text").collect().map(_.toSeq).toSet
    assert(viaSql == viaApi && viaSql.nonEmpty)

    docs.limit(5).select($"text".as("bench_text"))
      .createOrReplaceTempView("gf_tvf_bench")
    val cSql = spark.sql("""
      SELECT * FROM graft_contamination('gf_tvf_docs', 'gf_tvf_bench',
        'doc_id', 'text', 'bench_text')""")
      .collect().map(_.toSeq).toSet
    val cApi = graft.pipeline.Curation.contamination(planted,
      spark.table("gf_tvf_bench"), "doc_id", "text", "bench_text")
      .collect().map(_.toSeq).toSet
    assert(cSql == cApi && cSql.nonEmpty)
  }

  test("graft_line_dedup and graft_span_dedup equal the operators") {
    GraftTableFunctions.register(spark)
    // multi-line fixture with frequent lines so the boilerplate set is
    // non-empty, same construction as the oracle queries
    val lined = docs.select($"doc_id",
      concat(lit("nav home about\n"),
        regexp_replace($"text", lit(" value "), lit("\n"))).as("text"))
    lined.createOrReplaceTempView("gf_lined_docs")
    val lSql = spark.sql("""
      SELECT doc_id, text, n_lines, n_dropped
      FROM graft_line_dedup('gf_lined_docs', 'doc_id', 'text', 10)""")
      .collect().map(_.toSeq).toSet
    val lApi = graft.pipeline.LineDedup.dropBoilerplate(lined,
      "doc_id", "text", maxDocFreq = 10)
      .select("doc_id", "text", "n_lines", "n_dropped")
      .collect().map(_.toSeq).toSet
    assert(lSql == lApi && lSql.nonEmpty)
    assert(lSql.exists(_(3).asInstanceOf[Long] > 0)) // something dropped

    // duplicate whole documents (%9 docs re-added under +90000 ids) so
    // 20-token duplicated-span rows exist for the window width below
    val spanned = docs.union(docs.filter($"doc_id" % 9 === 0)
      .select(($"doc_id" + 90000).as("doc_id"), $"text"))
    spanned.createOrReplaceTempView("gf_span_docs")
    val sSql = spark.sql("""
      SELECT id, span_start, span_end
      FROM graft_span_dedup('gf_span_docs', 'doc_id', 'text', 20)""")
      .collect().map(_.toSeq).toSet
    val sApi = graft.pipeline.SpanDedup.duplicateSpans(spanned,
      "doc_id", "text", windowTokens = 20)
      .select("id", "span_start", "span_end")
      .collect().map(_.toSeq).toSet
    assert(sSql == sApi && sSql.nonEmpty)
  }

  test("temporal and LM table functions equal the operators") {
    GraftTableFunctions.register(spark)
    val ev = Seq(
      ("u1", 100L, 1L, "c"), ("u1", 200L, 2L, "p"), ("u1", 250L, 3L, "c"),
      ("u2", 10L, 4L, "p"), ("u2", 900L, 5L, "c")
    ).toDF("user", "ts", "eid", "kind")
    ev.createOrReplaceTempView("gf_events")
    ev.filter($"kind" === "c").select($"user", $"ts".as("c_ts"),
      $"eid".as("c_id")).createOrReplaceTempView("gf_clicks")
    ev.filter($"kind" === "p").select($"user", $"ts".as("p_ts"),
      $"eid".as("p_id")).createOrReplaceTempView("gf_purchases")

    val sesSql = spark.sql("""
      SELECT eid, session_seq
      FROM graft_sessionize('gf_events', 'user', 'ts', 100)""")
      .collect().map(_.toSeq).toSet
    val sesApi = graft.pipeline.Temporal.sessionize(ev, Seq("user"),
        "ts", 100L).select("eid", "session_seq")
      .collect().map(_.toSeq).toSet
    assert(sesSql == sesApi && sesSql.nonEmpty)

    val stSql = spark.sql("""
      SELECT user, session_seq, session_start, session_end, n_events
      FROM graft_session_stats('gf_events', 'user', 'ts', 100)""")
      .collect().map(_.toSeq).toSet
    val stApi = graft.pipeline.Temporal.sessionStats(ev, Seq("user"),
        "ts", 100L)
      .select("user", "session_seq", "session_start", "session_end",
        "n_events")
      .collect().map(_.toSeq).toSet
    assert(stSql == stApi && stSql.nonEmpty)

    val asofSql = spark.sql("""
      SELECT c_id, p_id
      FROM graft_asof_join('gf_clicks', 'gf_purchases', 'user',
                           'c_ts', 'p_ts')""")
      .collect().map(_.toSeq).toSet
    val asofApi = graft.pipeline.Temporal.asofJoin(
        spark.table("gf_clicks"), spark.table("gf_purchases"),
        Seq("user"), "c_ts", "p_ts")
      .select("c_id", "p_id").collect().map(_.toSeq).toSet
    assert(asofSql == asofApi && asofSql.nonEmpty)

    val bandSql = spark.sql("""
      SELECT c_id, p_id
      FROM graft_band_join('gf_clicks', 'gf_purchases', 'user',
                           'c_ts', 'p_ts', 60)""")
      .collect().map(_.toSeq).toSet
    val bandApi = graft.pipeline.Temporal.bandJoin(
        spark.table("gf_clicks"), spark.table("gf_purchases"),
        Seq("user"), "c_ts", "p_ts", 60L)
      .select("c_id", "p_id").collect().map(_.toSeq).toSet
    assert(bandSql == bandApi && bandSql.nonEmpty)

    docs.createOrReplaceTempView("gf_lm_docs")
    val contSql = spark.sql("""
      SELECT id_a, id_b, containment_a, containment_b
      FROM graft_containment('gf_lm_docs', 'doc_id', 'text', 0.9D, 0)""")
      .collect().map(_.toSeq).toSet
    val contApi = graft.pipeline.Dedup.containmentPairs(docs, "doc_id",
        "text", threshold = 0.9, maxDocFreq = 0)
      .collect().map(_.toSeq).toSet
    assert(contSql == contApi)

    val lmSql = spark.sql("""
      SELECT doc_id, n_bigrams, lm_score
      FROM graft_lm_score('gf_lm_docs', 'doc_id', 'text', 20)""")
      .collect().map(_.toSeq).toSet
    val m = graft.pipeline.LanguageModel.train(docs, "doc_id", "text",
      vocabSize = 20)
    val lmApi = graft.pipeline.LanguageModel.score(docs, "doc_id",
        "text", m).collect().map(_.toSeq).toSet
    assert(lmSql == lmApi && lmSql.nonEmpty)
  }

  test("graft_quality_logit and graft_hybrid_search equal the operators") {
    GraftFunctions.register(spark)
    GraftTableFunctions.register(spark)
    docs.createOrReplaceTempView("gf_hyb_docs")
    val emb = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select($"vec_id", $"embedding")
    emb.createOrReplaceTempView("gf_hyb_vecs")
    docs.filter($"doc_id" % 29 === 1)
      .select($"doc_id".as("qid"),
        array_join(slice(split(lower(trim($"text")), "\\s+"), 1, 3), " ")
          .as("qtext"))
      .join(emb.select($"vec_id".as("qid"), $"embedding".as("qv")), "qid")
      .createOrReplaceTempView("gf_hyb_queries")

    // scalar: default model and explicit-weights form, vs the Column API
    val viaSql = spark.sql("""
      SELECT doc_id, graft_quality_logit(text) AS a,
             graft_quality_logit(text, -1.5D, 2.0D, 2.5D, -4.0D, 0.5D)
               AS b
      FROM gf_hyb_docs""").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val viaCol = docs.select($"doc_id",
        graft.pipeline.QualityModel.logitQ($"text",
          graft.pipeline.QualityModel.default))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaSql.forall { case (id, (a, b)) =>
      a == viaCol(id) && b == viaCol(id) })

    // TVF: fused rows equal the DataFrame composition with the same legs
    val viaTvf = spark.sql("""
      SELECT query_id, id, rrf_q, rank
      FROM graft_hybrid_search('gf_hyb_docs', 'gf_hyb_vecs',
        'gf_hyb_queries', 'doc_id', 'text', 'vec_id', 'embedding',
        'qid', 'qtext', 'qv', 10, 5)
      ORDER BY query_id, rank""")
      .as[(Long, Long, Long, Int)].collect().toSeq
    val queries = spark.table("gf_hyb_queries")
    val bm = graft.pipeline.Search.searchCorpus(docs, "doc_id", "text",
        queries, "qid", "qtext", 10)
      .select($"query_id", $"doc_id".as("id"), $"rank")
    val ann = graft.pipeline.Similarity.cosineTopKDeclarative(
        emb, "vec_id", "embedding", queries, "qid", "qv", 10)
      .select($"query_id", $"id", $"rank")
    val manual = graft.pipeline.Hybrid
      .rrfFuse(Seq(bm, ann), "query_id", "id", "rank", 60, 5)
      .orderBy("query_id", "rank")
      .as[(Long, Long, Long, Int)].collect().toSeq
    assert(viaTvf == manual)
    assert(viaTvf.nonEmpty)
    // declarative cosine leg ranks exactly as the brute-force kernel
    val brute = graft.pipeline.Similarity.bruteForceTopK(
        emb, "vec_id", "embedding", queries.select("qid", "qv"),
        "qid", "qv", 10)
      .select("query_id", "id", "rank").orderBy("query_id", "rank")
      .as[(Long, Long, Int)].collect().toSeq
    val decl = ann.orderBy("query_id", "rank")
      .as[(Long, Long, Int)].collect().toSeq
    assert(decl == brute)
  }

  test("graft_curate rejects bad arguments loudly") {
    GraftTableFunctions.register(spark)
    docs.createOrReplaceTempView("gf_curate_docs")
    val err = intercept[Exception] {
      spark.sql("SELECT * FROM graft_curate('gf_curate_docs')").collect()
    }
    assert(err.getMessage.contains("usage: graft_curate"))
    val err2 = intercept[Exception] {
      spark.sql("""SELECT * FROM graft_curate('gf_curate_docs',
        'doc_id', 'text', 'en', 40, 0.8D, 'bogus')""").collect()
    }
    assert(err2.getMessage.contains("strategy must be"))
  }

  test("GraftExtensions registers the surface at session build time") {
    // `spark.sql.extensions` is a STATIC conf — it cannot take effect
    // over an already-running SparkContext, and getOrCreate would hand
    // back the existing session anyway. Clear the session slots to force
    // a genuinely new session over the SHARED context and attach the
    // extensions programmatically (the withExtensions path exercises the
    // same injectFunction wiring the config path does). Restore the
    // suite session afterwards.
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder()
        .master("local[2]")
        .appName("graft-ext-test")
        .config("spark.ui.enabled", "false")
        .withExtensions(new graft.GraftExtensions)
        .getOrCreate()
      val out = s2.sql(
        "SELECT graft_token_count('a b c') AS n").head().getInt(0)
      assert(out == 3)
      // the TABLE function rides the same injection: every input row
      // gets an audit row regardless of status, so count(*) = inputs
      s2.range(3).selectExpr("id AS doc_id",
          "'hello world text here' AS text")
        .createOrReplaceTempView("gf_ext_docs")
      val n = s2.sql("SELECT count(*) AS n FROM " +
        "graft_curate('gf_ext_docs', 'doc_id', 'text')").head().getLong(0)
      assert(n == 3)
      graft.pipeline.CacheScope.releaseSession(s2)
      // do NOT stop s2: the SparkContext is shared with the suite session
    } finally {
      SparkSession.setDefaultSession(spark)
      SparkSession.setActiveSession(spark)
    }
  }
}
