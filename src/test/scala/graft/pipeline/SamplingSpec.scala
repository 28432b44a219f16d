package graft.pipeline

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SamplingSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def docs = spark.read
    .parquet("/root/testdata/sf0.001/documents.parquet")
    .select($"doc_id", $"text")

  test("hashSplit: deterministic, exhaustive, stable under row removal") {
    val splits = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val a = Sampling.hashSplit(docs, "text", splits)
      .select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val b = Sampling.hashSplit(docs, "text", splits)
      .select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(a == b) // re-run determinism
    assert(a.size == docs.count())
    assert(a.values.toSet.subsetOf(Set("train", "val", "test")))
    // proportions: 500 docs at 0.8 -> binomial 3sd ≈ 27
    val n = a.size.toDouble
    val train = a.values.count(_ == "train")
    assert(math.abs(train - 0.8 * n) < 30, s"train=$train of $n")
    // membership is a pure function of the key: dropping half the corpus
    // leaves every surviving row's label unchanged (randomSplit cannot
    // promise this)
    val half = Sampling.hashSplit(docs.filter($"doc_id" % 2 === 0),
        "text", splits)
      .select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(half.forall { case (id, s) => a(id) == s })
  }

  test("stratifiedHashSample: per-stratum fractions, deterministic") {
    val d = docs.withColumn("stratum",
      when($"doc_id" % 2 === 0, "even").otherwise("odd"))
    val keep = Sampling.stratifiedHashSample(d, "text", "stratum",
      Map("even" -> 1.0, "odd" -> 0.0))
      .select("doc_id").as[Long].collect().toSet
    // full stratum kept, zero stratum dropped — exact at the extremes
    assert(keep.nonEmpty && keep.forall(_ % 2 == 0))
    assert(keep.size == d.filter($"doc_id" % 2 === 0).count())
    // fractional stratum: membership is a subset of the unstratified
    // sample at the same fraction (same per-row rule)
    val half = Sampling.stratifiedHashSample(d, "text", "stratum",
      Map("even" -> 0.5), defaultFrac = 0.0)
      .select("doc_id").as[Long].collect().toSet
    val plain = Sampling.hashSample(d.filter($"doc_id" % 2 === 0),
      "text", 0.5).select("doc_id").as[Long].collect().toSet
    assert(half == plain)
    // unlisted strata keep defaultFrac
    val dflt = Sampling.stratifiedHashSample(d, "text", "stratum",
      Map.empty, defaultFrac = 1.0).count()
    assert(dflt == d.count())
  }

  test("hashSplit rejects fractions that do not sum to 1") {
    val e = intercept[IllegalArgumentException] {
      Sampling.hashSplit(docs, "text", Seq("a" -> 0.5, "b" -> 0.4))
    }
    assert(e.getMessage.contains("sum to 1"))
  }

  test("hashSample: deterministic subset; frac=1 keeps every row") {
    val s1 = Sampling.hashSample(docs, "text", 0.25)
      .select("doc_id").as[Long].collect().toSet
    val s2 = Sampling.hashSample(docs, "text", 0.25)
      .select("doc_id").as[Long].collect().toSet
    assert(s1 == s2 && s1.nonEmpty)
    val n = docs.count().toDouble
    assert(math.abs(s1.size - 0.25 * n) < 30, s"${s1.size} of $n")
    // sample of a superset restricted to the subset = sample of subset
    val sub = Sampling.hashSample(docs.filter($"doc_id" < 250), "text", 0.25)
      .select("doc_id").as[Long].collect().toSet
    assert(sub == s1.filter(_ < 250))
    assert(Sampling.hashSample(docs, "text", 1.0).count() == n.toLong)
    assert(Sampling.hashSample(docs, "text", 0.0).count() == 0L)
  }

  test("null keys hash as the empty key — same rule in split and sample") {
    val withNull = Seq((1L, "alpha"), (2L, null), (3L, "beta"))
      .toDF("id", "text")
    // md5("") = d41d... -> bucket 'd41d' -> val at 0.8/0.1/0.1 cutoffs
    val split = Sampling.hashSplit(withNull, "text",
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      .filter($"id" === 2).select("split").head().getString(0)
    assert(split == "val", s"null key landed in $split")
    // a 100% sample keeps null-key rows (they must never vanish)
    assert(Sampling.hashSample(withNull, "text", 1.0).count() == 3L)
    // and membership below/above the d41d bucket is consistent with the
    // split assignment (one rule, two functions)
    assert(Sampling.hashSample(withNull, "text", 0.9)
      .filter($"id" === 2).count() == 1L) // 'd41d' < 'e666'
    assert(Sampling.hashSample(withNull, "text", 0.8)
      .filter($"id" === 2).count() == 0L) // 'd41d' >= 'cccc'
  }

  test("permuted order matches the serial md5 rule; seeds decorrelate") {
    val got = Sampling.permuted(docs, "doc_id", "s1")
      .select("doc_id", "_order").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val exp = docs.select("doc_id").as[Long].collect().map { id =>
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s"s1:$id".getBytes("UTF-8"))
      id -> d.map("%02x".format(_)).mkString
    }.toMap
    assert(got == exp)
    // a different seed produces a different order
    val other = Sampling.permuted(docs, "doc_id", "s2")
      .select("doc_id", "_order").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(other != got)
    val byA = got.toSeq.sortBy(_._2).map(_._1)
    val byB = other.toSeq.sortBy(_._2).map(_._1)
    assert(byA != byB, "two seeds should not yield the same permutation")
  }

  test("permutedShards packs exact equal-row shards in permuted order") {
    val rows = 120L
    val sharded = Sampling.permutedShards(docs, "doc_id", "s1", rows,
      numPartitions = 5)
    val sizes = sharded.groupBy("shard").count()
      .orderBy("shard").collect().map(r => r.getLong(0) -> r.getLong(1))
    val n = docs.count()
    sizes.init.foreach { case (sh, c) =>
      assert(c == rows, s"shard $sh has $c rows") }
    assert(sizes.map(_._2).sum == n)
    assert(sizes.last._2 == n - rows * (sizes.length - 1))
    // shard boundaries follow the permutation: max order of shard k is
    // below min order of shard k+1
    val bounds = sharded.groupBy("shard")
      .agg(min("_order").as("lo"), max("_order").as("hi"))
      .orderBy("shard").collect()
      .map(r => (r.getString(1), r.getString(2)))
    bounds.sliding(2).foreach {
      case Array((_, hi1), (lo2, _)) => assert(hi1 < lo2)
      case _ =>
    }
  }

  test("capPerKey: exactly the unsalted window's answer, any salt count") {
    val d = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"doc_id", $"source")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"source").orderBy($"doc_id")
    val plain = d.withColumn("rn", row_number().over(w))
      .filter($"rn" <= 7).select("source", "doc_id")
      .orderBy("source", "doc_id")
      .as[(String, Long)].collect().toSeq
    for (salts <- Seq(1, 3, 16)) {
      val got = Sampling.capPerKey(d, "source", "doc_id", cap = 7,
          salts = salts)
        .select("source", "doc_id").orderBy("source", "doc_id")
        .as[(String, Long)].collect().toSeq
      assert(got == plain, s"salts=$salts diverged from unsalted window")
    }
    // caps >= key size are a no-op
    val n = d.count()
    assert(Sampling.capPerKey(d, "source", "doc_id",
      cap = 100000).count() == n)
  }

  test("weightedSample: deterministic, exact size, local-formula parity") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val a = Sampling.weightedSample(docs, "doc_id", col("n_chars"), 30,
      seed = "t1").select("doc_id").as[Long].collect().toSet
    val b = Sampling.weightedSample(docs, "doc_id", col("n_chars"), 30,
      seed = "t1").select("doc_id").as[Long].collect().toSet
    assert(a == b && a.size == 30)
    // a different seed is a fresh draw
    val c = Sampling.weightedSample(docs, "doc_id", col("n_chars"), 30,
      seed = "t2").select("doc_id").as[Long].collect().toSet
    assert(a != c)
    // parity with the A-Res formula computed locally
    def md5hex(x: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(x.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val rows = docs.select("doc_id", "n_chars")
      .as[(Long, Long)].collect()
    val expected = rows.filter(_._2 > 0).map { case (id, w) =>
      val u = (java.lang.Long.parseLong(
        md5hex("t1" + id.toString).take(13), 16).toDouble + 1.0) /
        math.pow(16.0, 13)
      (math.log(u) / w.toDouble, id)
    }.sortBy { case (k, id) => (-k, id) }.take(30).map(_._2).toSet
    assert(a == expected)
  }

  test("weightedSample: nonpositive and null weights are refused rows") {
    import spark.implicits._
    val df = Seq((1L, Some(10L)), (2L, Some(0L)), (3L, Some(-5L)),
      (4L, Option.empty[Long]), (5L, Some(1L))).toDF("id", "w")
    val got = Sampling.weightedSample(df, "id", col("w"), 10)
      .select("id").as[Long].collect().toSet
    assert(got == Set(1L, 5L))
  }
}
