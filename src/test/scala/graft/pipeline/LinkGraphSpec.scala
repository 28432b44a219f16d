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

  test("redistributeDangling: exact hand replay, mass conserved up to " +
      "div remainders, beats the leaking variant") {
    // 1→2, 1→3, 2→3; node 3 dangles. Replay the integer arithmetic
    // in plain Scala maps and require exact equality.
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L))
    val outdeg = Map(1L -> 2L, 2L -> 1L)
    val n = 3L
    val d = 850000L
    val base = (LinkGraph.massTotal * (1000000L - d)) / (1000000L * n)
    var r = Map(1L -> LinkGraph.massTotal / n,
      2L -> LinkGraph.massTotal / n, 3L -> LinkGraph.massTotal / n)
    val iters = 3
    for (_ <- 1 to iters) {
      val dangling = r.keys.filterNot(outdeg.contains).map(r).sum
      val extra = (dangling * d) / (1000000L * n)
      val inflow = edges.groupBy(_._2).map { case (dst, es) =>
        dst -> es.map { case (src, _) =>
          (r(src) * d) / (1000000L * outdeg(src))
        }.sum
      }
      r = r.keys.map(id =>
        id -> (base + extra + inflow.getOrElse(id, 0L))).toMap
    }
    val got = LinkGraph.pageRank(edges.toDF("src", "dst"), "src", "dst",
      iters, redistributeDangling = true)
      .as[(Long, Long)].collect().toMap
    assert(got == r, s"engine $got != replay $r")
    // conservation up to div remainders: per round each share, base,
    // and extra term floors away < 1 part — slack ≤ (edges + 2n)·iters
    val slack = (edges.size + 2 * n) * iters
    assert(got.values.sum >= LinkGraph.massTotal - slack,
      s"mass ${got.values.sum} leaked past the remainder bound")
    assert(got.values.sum <= LinkGraph.massTotal)
    // strictly more mass than the leaking variant on a dangling graph
    val leaky = ranks(edges, iters)
    assert(got.values.sum > leaky.values.sum)
    // and the authority ORDER is preserved between the variants
    def order(m: Map[Long, Long]) =
      m.toSeq.sortBy { case (id, rk) => (-rk, id) }.map(_._1)
    assert(order(got) == order(leaky))
  }

  test("redistributeDangling on a dangling-free graph is a no-op") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L))
    val got = LinkGraph.pageRank(edges.toDF("src", "dst"), "src", "dst",
      3, redistributeDangling = true)
      .as[(Long, Long)].collect().toMap
    assert(got == ranks(edges, 3))
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
