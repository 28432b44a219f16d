package graft.pipeline

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ClusteringSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def labelsOf(pairs: Seq[(Long, Long)]): Map[Long, Long] =
    Clustering.connectedComponents(pairs.toDF("id_a", "id_b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("chain components collapse transitively to the min id") {
    // 1-2-3-4-5 chained pairwise plus a disjoint 10-11: transitivity is
    // the whole point — (1,5) is never a pair but shares 1's cluster
    val m = labelsOf(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (10L, 11L)))
    assert((1L to 5L).forall(m(_) == 1L))
    assert(m(10L) == 10L && m(11L) == 10L)
    assert(m.size == 7)
  }

  test("long path exercises multiple star rounds") {
    val path = (0L until 64L).map(i => (i, i + 1))
    val m = labelsOf(path)
    assert(m.size == 65 && m.values.forall(_ == 0L))
  }

  test("high-degree hub and reversed/duplicated/self pairs") {
    // hub 100 connected to 60 spokes, pairs given in both orientations
    // with duplicates and self-loops sprinkled in
    val spokes = (101L to 160L)
    val pairs = spokes.map(s => (100L, s)) ++ spokes.map(s => (s, 100L)) ++
      Seq((100L, 100L), (101L, 101L), (150L, 100L))
    val m = labelsOf(pairs)
    assert(m.size == 61 && m.values.forall(_ == 100L))
  }

  test("null endpoints drop the edge, not the run") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    val schema = StructType(Seq(StructField("id_a", LongType, nullable = true),
      StructField("id_b", LongType, nullable = true)))
    val pairs = spark.createDataFrame(
      java.util.Arrays.asList(Row(1L, 2L), Row(null, 3L), Row(4L, null)),
      schema)
    val m = Clustering.connectedComponents(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // 3 and 4 had only null-partnered edges: absent from pair labels
    assert(m == Map(1L -> 1L, 2L -> 1L))
  }

  test("empty pair set yields empty labels") {
    val empty = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    assert(Clustering.connectedComponents(empty).count() == 0)
  }

  test("dupClusters labels every document; keep-set is one per cluster") {
    val docs = (1L to 10L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val out = Clustering.dupClusters(docs, "doc_id",
      Seq((2L, 3L), (3L, 7L), (5L, 6L)).toDF("id_a", "id_b"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    assert(out.length == 10)
    val cluster = out.map(t => t._1 -> t._2).toMap
    assert(cluster(2L) == 2L && cluster(3L) == 2L && cluster(7L) == 2L)
    assert(cluster(5L) == 5L && cluster(6L) == 5L)
    // untouched docs are their own singleton cluster
    assert(Seq(1L, 4L, 8L, 9L, 10L).forall(i => cluster(i) == i))
    // canonical = exactly the cluster minima
    val canonical = out.filter(_._3).map(_._1).toSet
    assert(canonical == Set(1L, 2L, 4L, 5L, 8L, 9L, 10L))
  }

  test("labels agree with a brute-force union-find on real near-dup pairs") {
    val docs = graft.Queries.docsWithNearDups(spark, "/root/testdata/sf0.001")
    val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text",
      threshold = 0.8, maxDocFreq = 0)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val got = Clustering.connectedComponents(
      pairs.toSeq.toDF("id_a", "id_b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // driver-side union-find truth
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val truth = parent.keys.map(k => k -> find(k)).toMap
    assert(got == truth)
    assert(got.nonEmpty, "fixture should produce at least one pair")
  }

  test("leakage-safe split: a dup cluster never straddles splits") {
    import org.apache.spark.sql.functions._
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"))
    val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text",
      threshold = 0.8, maxDocFreq = 0)
    val clustered = Clustering.dupClusters(docs, "doc_id", pairs)
    val split = clustered.select(col("cluster_id"),
      Sampling.hashSplitColumn(col("cluster_id").cast("string"),
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)).as("split"))
    val straddlers = split.groupBy("cluster_id")
      .agg(countDistinct("split").as("n"))
      .filter(col("n") > 1).count()
    assert(straddlers == 0L)
    // all three splits materialize on the fixture
    assert(split.select("split").distinct().count() == 3L)
  }
}
