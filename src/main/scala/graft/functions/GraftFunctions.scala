package graft.functions

import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo,
  Literal}
import org.apache.spark.sql.graftshim
import org.apache.spark.sql.types.{DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.pipeline.{Sampling, TextAnalysis}

/** The engine's scalar surface as native SQL functions, so `spark.sql`
  * users get the same operators as the Column API — registered either
  * in-place on an existing session ([[register]]) or at session build
  * time via [[graft.GraftExtensions]] (`spark.sql.extensions`).
  *
  * Every builder composes the SAME Column expressions the DataFrame API
  * uses (no parallel implementations to drift), so each SQL function is
  * codegen'd exactly like its Column twin — zero UDFs, and the DuckDB
  * oracle SQL that checks the Column queries checks these too.
  */
object GraftFunctions {

  private def unary(f: Column => Column): Seq[Expression] => Expression = {
    es =>
      require(es.length == 1, s"expected 1 argument, got ${es.length}")
      graftshim.resolvedExpression(f(graftshim.column(es.head)))
  }

  private def strLit(e: Expression, what: String): String = e match {
    case Literal(s: UTF8String, StringType) => s.toString
    case other => throw new IllegalArgumentException(
      s"$what must be a string literal, got $other")
  }

  private def numLit(e: Expression, what: String): Double = e match {
    case Literal(d: Double, DoubleType) => d
    case Literal(d: org.apache.spark.sql.types.Decimal, _) => d.toDouble
    case Literal(n: Number, _) => n.doubleValue()
    case other => throw new IllegalArgumentException(
      s"$what must be a numeric literal, got $other")
  }

  /** (name, builder) for every registered function. */
  val all: Seq[(String, Seq[Expression] => Expression)] = Seq(
    // vector hot path — the native codegen'd expression, directly
    "graft_cosine_similarity" -> { es =>
      require(es.length == 2, s"expected 2 arguments, got ${es.length}")
      CosineSimilarity(es(0), es(1))
    },
    // text analysis
    "graft_token_count" -> unary(TextAnalysis.tokenCount),
    "graft_token_estimate" -> unary(TextAnalysis.tokenEstimate),
    "graft_quality_score" -> unary(TextAnalysis.qualityScore),
    "graft_lang_id" -> unary(TextAnalysis.langId),
    "graft_fingerprint" -> unary(TextAnalysis.fingerprint),
    "graft_strip_markup" -> unary(TextAnalysis.stripMarkup),
    // PII pre-filter signals + typed-marker redaction
    "graft_email_count" -> unary(TextAnalysis.emailCount),
    "graft_ipv4_count" -> unary(TextAnalysis.ipv4Count),
    "graft_phone_count" -> unary(TextAnalysis.phoneCount),
    "graft_redact_pii" -> unary(TextAnalysis.redactPii),
    // unicode normalization (native codegen'd expression)
    "graft_normalize_text" -> { es =>
      require(es.length == 1, s"expected 1 argument, got ${es.length}")
      NormalizeText(es.head)
    },
    // repetition + URL signals
    // model-based quality scorer: graft_quality_logit(text) with the
    // library default operating point, or (text, bias, wTokens, wAlpha,
    // wDigit, wAwl) with literal weights (the model is config, not
    // data) — returns the exact quantized logit (floor(z * 1e6) long)
    "graft_quality_logit" -> { es =>
      require(es.length == 1 || es.length == 6,
        s"expected text or text + 5 weight literals, got ${es.length}")
      val m =
        if (es.length == 1) graft.pipeline.QualityModel.default
        else graft.pipeline.QualityModel.LinearModel(
          numLit(es(1), "bias"), numLit(es(2), "wTokens"),
          numLit(es(3), "wAlpha"), numLit(es(4), "wDigit"),
          numLit(es(5), "wAwl"))
      graftshim.resolvedExpression(graft.pipeline.QualityModel
        .logitQ(graftshim.column(es.head), m))
    },
    "graft_max_token_count" -> unary(TextAnalysis.maxTokenCount),
    "graft_max_bigram_count" -> unary(TextAnalysis.maxBigramCount),
    "graft_distinct_token_count" -> unary(TextAnalysis.distinctTokenCount),
    "graft_url_count" -> unary(TextAnalysis.urlCount),
    // deterministic content-hash split:
    //   graft_split(key, 'train', 0.8, 'val', 0.1, 'test', 0.1)
    // labels/fractions must be literals (the rule is a config, not data)
    "graft_split" -> { es =>
      require(es.length >= 3 && es.length % 2 == 1,
        s"expected key plus (label, fraction) pairs, got ${es.length} args")
      val splits = es.tail.grouped(2).map { case Seq(l, f) =>
        strLit(l, "split label") -> numLit(f, "split fraction")
      }.toSeq
      graftshim.resolvedExpression(
        Sampling.hashSplitColumn(graftshim.column(es.head), splits))
    },
    // deterministic content-hash sample membership predicate
    "graft_keep_sample" -> { es =>
      require(es.length == 2, s"expected 2 arguments, got ${es.length}")
      graftshim.resolvedExpression(Sampling.hashSampleColumn(
        graftshim.column(es.head), numLit(es(1), "sample fraction")))
    },
    // engine-portable training-order permutation key: md5(seed ':' key)
    "graft_permutation" -> { es =>
      require(es.length == 2, s"expected 2 arguments, got ${es.length}")
      graftshim.resolvedExpression(Sampling.permutationColumn(
        graftshim.column(es.head), strLit(es(1), "permutation seed")))
    },
    // real BPE tokenizer: graft_bpe_*(text, 'model_name') — the model
    // name must be a literal (resolved at analysis time against
    // Bpe.registerModel, driver-side; the model object then rides the
    // plan reference like any other)
    "graft_bpe_count" -> { es =>
      require(es.length == 2, s"expected 2 arguments, got ${es.length}")
      BpeCountExpr(es(0), graft.pipeline.Bpe.model(
        strLit(es(1), "bpe model name")))
    },
    "graft_bpe_pieces" -> { es =>
      require(es.length == 2, s"expected 2 arguments, got ${es.length}")
      BpePiecesExpr(es(0), graft.pipeline.Bpe.model(
        strLit(es(1), "bpe model name")))
    },
    "graft_bpe_encode" -> { es =>
      require(es.length == 2, s"expected 2 arguments, got ${es.length}")
      BpeEncodeExpr(es(0), graft.pipeline.Bpe.model(
        strLit(es(1), "bpe model name")))
    },
    // unigram-LM (SentencePiece) tokenizer: graft_unigram_*(text,
    // 'model_name') — same literal-name resolution against
    // Unigram.registerModel
    "graft_unigram_count" -> { es =>
      require(es.length == 2, s"expected 2 arguments, got ${es.length}")
      UnigramCountExpr(es(0), graft.pipeline.Unigram.model(
        strLit(es(1), "unigram model name")))
    },
    "graft_unigram_pieces" -> { es =>
      require(es.length == 2, s"expected 2 arguments, got ${es.length}")
      UnigramPiecesExpr(es(0), graft.pipeline.Unigram.model(
        strLit(es(1), "unigram model name")))
    },
    "graft_unigram_encode" -> { es =>
      require(es.length == 2, s"expected 2 arguments, got ${es.length}")
      UnigramEncodeExpr(es(0), graft.pipeline.Unigram.model(
        strLit(es(1), "unigram model name")))
    },
    "graft_unigram_score" -> { es =>
      require(es.length == 2, s"expected 2 arguments, got ${es.length}")
      UnigramScoreExpr(es(0), graft.pipeline.Unigram.model(
        strLit(es(1), "unigram model name")))
    })

  /** Register every function on an existing session. Idempotent. */
  def register(spark: SparkSession): Unit =
    all.foreach { case (name, builder) =>
      graftshim.registerFunction(spark, name, builder)
    }

  /** Inject every function into a `SparkSessionExtensions` (the
    * `spark.sql.extensions` path — see [[graft.GraftExtensions]]).
    */
  def injectInto(ext: SparkSessionExtensions): Unit =
    all.foreach { case (name, builder) =>
      ext.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo("graft.functions.GraftFunctions", name),
        builder))
    }
}
