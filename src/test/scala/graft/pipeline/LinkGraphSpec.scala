package graft.pipeline

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Fixed-point PageRank: hand-computed exact ranks, the stationary
  * cycle, edge hygiene (nulls, self-loops, parallel edges), dangling
  * mass leak, and the authority ordering.
  */
class LinkGraphSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  private def ranks(edges: Seq[(Long, Long)], iters: Int)
      : Map[Long, Long] =
    LinkGraph.pageRank(edges.toDF("src", "dst"), "src", "dst", iters)
      .as[(Long, Long)].collect().toMap

  test("one iteration: hand-computed exact integer ranks") {
    // 1→2, 1→4, 2→3, 3→1; node 4 dangles. N=4, r0=25e10, base=3.75e10
    val r = ranks(Seq((1L, 2L), (1L, 4L), (2L, 3L), (3L, 1L)), 1)
    assert(r(1L) == 37500000000L + 212500000000L) // base + share(3)
    assert(r(2L) == 37500000000L + 106250000000L) // base + share(1)/2
    assert(r(3L) == 37500000000L + 212500000000L) // base + share(2)
    assert(r(4L) == 37500000000L + 106250000000L)
    // dangling node 4 leaks: total < 1e12
    assert(r.values.sum < 1000000000000L)
  }

  test("a pure cycle is an exact fixed point") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L))
    val one = ranks(edges, 1)
    val five = ranks(edges, 5)
    assert(one == five)
    assert(one.values.toSet == Set(333333333333L))
  }

  test("edge hygiene: nulls and self-loops drop, parallel edges collapse") {
    val base = Seq((1L, 2L), (2L, 1L))
    val noisy = Seq((Some(1L), Some(2L)), (Some(2L), Some(1L)),
      (None, Some(2L)), (Some(1L), None), (Some(1L), Some(1L)),
      (Some(1L), Some(2L))) // null rows, a self-loop, a duplicate
      .toDF("src", "dst")
    val got = LinkGraph.pageRank(noisy, "src", "dst", 2)
      .as[(Long, Long)].collect().toMap
    assert(got == ranks(base, 2))
  }

  test("topAuthorities: the sink of a star graph ranks first") {
    // 2..6 all point at 1
    val edges = (2L to 6L).map(i => (i, 1L))
    val top = LinkGraph.topAuthorities(edges.toDF("src", "dst"),
      "src", "dst", k = 2)
      .select("id", "position").as[(Long, Int)].collect()
    assert(top.head == ((1L, 1)))
    assert(top.length == 2)
  }

  test("testdata: nation trade graph ranks all nations, mass bounded") {
    val dir = "/root/testdata/sf0.001"
    val l = spark.read.parquet(s"$dir/lineitem.parquet")
    val o = spark.read.parquet(s"$dir/orders.parquet")
    val c = spark.read.parquet(s"$dir/customer.parquet")
    val su = spark.read.parquet(s"$dir/supplier.parquet")
    val edges = l.join(o, l("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .join(su, l("l_suppkey") === su("s_suppkey"))
      .select(c("c_nationkey").as("src"), su("s_nationkey").as("dst"))
    val r = LinkGraph.pageRank(edges, "src", "dst", iters = 2)
      .as[(Long, Long)].collect()
    assert(r.nonEmpty && r.forall(_._2 > 0))
    assert(r.map(_._2).sum <= 1000000000000L)
  }
}
