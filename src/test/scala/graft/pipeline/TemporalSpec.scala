package graft.pipeline

import graft.SparkTestBase
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Temporal operators checked against brute-force references computed
  * with plain (quadratic) joins on small fixtures — the reference is
  * the semantics, the operator is the scalable plan; they must agree
  * row-for-row. Determinism is additionally pinned by re-running under
  * different partitionings.
  */
class TemporalSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  // trades (left): per-key points; quotes (right): per-key reference rows
  private lazy val trades = Seq(
    ("A", 100L, 1L), ("A", 205L, 2L), ("A", 300L, 3L), ("A", 305L, 4L),
    ("B", 50L, 5L), ("B", 500L, 6L),
    ("C", 10L, 7L) // key with no quotes at all
  ).toDF("sym", "t_ts", "trade_id")

  private lazy val quotes = Seq(
    ("A", 90L, 1.0), ("A", 200L, 2.0), ("A", 205L, 2.5), ("A", 400L, 4.0),
    ("B", 60L, 9.0), ("B", 490L, 9.9),
    ("D", 1L, 0.0) // key with no trades
  ).toDF("sym", "q_ts", "px")

  /** Brute-force as-of via a full pairwise join + per-trade selection. */
  private def bruteAsof(forward: Boolean, tol: Option[Long]): Set[Row] = {
    val pred = if (forward) col("q_ts") >= col("t_ts")
      else col("q_ts") <= col("t_ts")
    val delta = abs(col("q_ts") - col("t_ts"))
    val within = tol.map(t => delta <= t).getOrElse(lit(true))
    val cand = trades.join(quotes, Seq("sym")).filter(pred && within)
    val best = cand.groupBy("trade_id")
      .agg(max(struct(
        (if (forward) -col("q_ts") else col("q_ts")).as("ord"),
        col("px").as("px"), col("q_ts").as("q_ts"))).as("m"))
      .select(col("trade_id"), col("m.q_ts").as("q_ts"),
        col("m.px").as("px"))
    trades.join(best, Seq("trade_id"), "left")
      .select(col("sym"), col("t_ts"), col("trade_id"), col("q_ts"),
        col("px"))
      .collect().toSet
  }

  private def runAsof(direction: String, tol: Option[Long]): Set[Row] =
    Temporal.asofJoin(trades, quotes, Seq("sym"), "t_ts", "q_ts",
        direction, tol)
      .select("sym", "t_ts", "trade_id", "q_ts", "px")
      .collect().toSet

  test("asof backward matches brute force (incl. exact-tie inclusive)") {
    assert(runAsof("backward", None) == bruteAsof(forward = false, None))
    // the t=205 trade must take the t=205 quote (inclusive), not t=200
    val tie = Temporal.asofJoin(trades, quotes, Seq("sym"), "t_ts", "q_ts")
      .filter($"trade_id" === 2).select("px").as[Double].head()
    assert(tie == 2.5)
  }

  test("asof forward matches brute force") {
    assert(runAsof("forward", None) == bruteAsof(forward = true, None))
  }

  test("asof tolerance nulls out stale matches but keeps left rows") {
    val tol = Some(20L)
    assert(runAsof("backward", tol) == bruteAsof(forward = false, tol))
    val got = Temporal.asofJoin(trades, quotes, Seq("sym"), "t_ts", "q_ts",
      "backward", toleranceMicros = Some(20L))
    assert(got.count() == trades.count()) // left join: every trade kept
    // B@500 has only the 490 quote (delta 10, within); B@50 quote is at
    // 60 (forward of it) so backward finds nothing
    val b = got.filter($"sym" === "B").select("t_ts", "px")
      .collect().map(r => (r.getLong(0), Option(r.get(1)))).toMap
    assert(b(500L).contains(9.9) && b(50L).isEmpty)
  }

  test("asof nearest picks the closer side, backward on ties") {
    val brute = {
      val cand = trades.join(quotes, Seq("sym"))
      val best = cand.groupBy("trade_id")
        .agg(min(struct(abs($"q_ts" - $"t_ts").as("d"),
          $"q_ts".as("ord"), // equal distance: smaller q_ts = backward
          $"px".as("px"), $"q_ts".as("q_ts"))).as("m"))
        .select($"trade_id", $"m.q_ts".as("q_ts"), $"m.px".as("px"))
      trades.join(best, Seq("trade_id"), "left")
        .select($"sym", $"t_ts", $"trade_id", $"q_ts", $"px")
        .collect().toSet
    }
    assert(runAsof("nearest", None) == brute)
  }

  test("asof refuses empty keys and colliding payload columns") {
    intercept[IllegalArgumentException] {
      Temporal.asofJoin(trades, quotes, Nil, "t_ts", "q_ts")
    }
    intercept[IllegalArgumentException] {
      Temporal.asofJoin(trades,
        quotes.withColumnRenamed("px", "trade_id"), Seq("sym"),
        "t_ts", "q_ts")
    }
    intercept[IllegalArgumentException] {
      Temporal.asofJoin(trades, quotes, Seq("sym"), "t_ts", "q_ts",
        "sideways")
    }
  }

  test("asof result is invariant under input partitioning") {
    val a = runAsof("backward", None)
    val b = Temporal.asofJoin(trades.repartition(7), quotes.repartition(3),
        Seq("sym"), "t_ts", "q_ts")
      .select("sym", "t_ts", "trade_id", "q_ts", "px").collect().toSet
    assert(a == b)
  }

  private lazy val intervals = Seq(
    ("A", 95L, 210L, 10L), ("A", 300L, 300L, 11L), // degenerate point span
    ("B", 0L, 1000L, 12L), ("D", 5L, 6L, 13L)
  ).toDF("sym", "s_ts", "e_ts", "iv_id")

  test("point-in-interval join matches the naive range join exactly") {
    val naive = trades.join(intervals, Seq("sym"))
      .filter($"t_ts" >= $"s_ts" && $"t_ts" <= $"e_ts")
      .select("trade_id", "iv_id").collect().toSet
    for (w <- Seq(1L, 7L, 64L, 1000L)) {
      val got = Temporal.pointInIntervalJoin(trades, intervals, Seq("sym"),
          "t_ts", "s_ts", "e_ts", binWidthMicros = w)
        .select("trade_id", "iv_id").collect().toSet
      assert(got == naive, s"binWidth=$w")
    }
  }

  test("point-in-interval refuses runaway bin explosion") {
    val e = intercept[IllegalArgumentException] {
      Temporal.pointInIntervalJoin(trades, intervals, Seq("sym"),
        "t_ts", "s_ts", "e_ts", binWidthMicros = 1L,
        maxBinsPerInterval = 10)
    }
    assert(e.getMessage.contains("binWidthMicros"))
  }

  test("interval-overlap join matches the naive overlap join") {
    val lv = Seq(("A", 0L, 50L, 1L), ("A", 100L, 200L, 2L),
      ("A", 199L, 210L, 3L), ("B", 5L, 6L, 4L)).toDF(
      "sym", "l_s", "l_e", "l_id")
    val rv = Seq(("A", 40L, 120L, 10L), ("A", 210L, 300L, 11L),
      ("A", 0L, 1000L, 12L), ("B", 7L, 8L, 13L)).toDF(
      "sym", "r_s", "r_e", "r_id")
    val naive = lv.join(rv, Seq("sym"))
      .filter($"l_s" <= $"r_e" && $"r_s" <= $"l_e")
      .select("l_id", "r_id").collect().toSet
    for (w <- Seq(1L, 16L, 500L, 5000L)) {
      val got = Temporal.intervalOverlapJoin(lv, rv, Seq("sym"),
          "l_s", "l_e", "r_s", "r_e", binWidthMicros = w)
        .select("l_id", "r_id").collect().toSet
      assert(got == naive, s"binWidth=$w")
      // each overlapping pair must appear EXACTLY once (canonical bin)
      val cnt = Temporal.intervalOverlapJoin(lv, rv, Seq("sym"),
        "l_s", "l_e", "r_s", "r_e", binWidthMicros = w).count()
      assert(cnt == naive.size, s"binWidth=$w duplicated pairs")
    }
  }

  test("band join matches the naive |l-r| <= band join") {
    val naive = trades.join(quotes, Seq("sym"))
      .filter(abs($"t_ts" - $"q_ts") <= 15L)
      .select("trade_id", "q_ts").collect().toSet
    val got = Temporal.bandJoin(trades, quotes, Seq("sym"),
        "t_ts", "q_ts", bandMicros = 15L)
      .select("trade_id", "q_ts").collect().toSet
    assert(got == naive)
  }

  test("sessionize labels gaps correctly and deterministically") {
    val ev = Seq(
      ("u1", 0L), ("u1", 10L), ("u1", 100L), ("u1", 105L), ("u1", 300L),
      ("u2", 50L), ("u2", 50L), ("u2", 51L), // equal-time rows share a session
      ("u3", 0L), ("u3", 100L), ("u3", 100L) // boundary ON a duplicated ts
    ).toDF("user", "ts")
    val got = Temporal.sessionize(ev, Seq("user"), "ts", gapMicros = 20L)
      .select("user", "ts", "session_seq")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSet
    val want = Set(
      ("u1", 0L, 1L), ("u1", 10L, 1L), ("u1", 100L, 2L), ("u1", 105L, 2L),
      ("u1", 300L, 3L),
      ("u2", 50L, 1L), ("u2", 51L, 1L),
      // RANGE-frame prefix sum: BOTH duplicated-ts rows carry the
      // post-boundary label — a ROWS frame would split them by sort order
      ("u3", 0L, 1L), ("u3", 100L, 2L))
    // the duplicate (u2, 50) row appears twice with the same label;
    // Set collapses it — check multiplicity separately
    assert(got == want)
    val dup = Temporal.sessionize(ev, Seq("user"), "ts", 20L)
      .filter($"user" === "u2" && $"ts" === 50L && $"session_seq" === 1L)
    assert(dup.count() == 2)
    val reGot = Temporal.sessionize(ev.repartition(5), Seq("user"), "ts",
        20L).select("user", "ts", "session_seq")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSet
    assert(reGot == want)
  }

  test("sessionStats aggregates per session") {
    val ev = Seq(("u1", 0L), ("u1", 10L), ("u1", 100L)).toDF("user", "ts")
    val got = Temporal.sessionStats(ev, Seq("user"), "ts", 20L)
      .select("user", "session_seq", "session_start", "session_end",
        "n_events")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    assert(got == Set(("u1", 1L, 0L, 10L, 2L), ("u1", 2L, 100L, 100L, 1L)))
  }

  test("asof plan shuffles once on the keys (no cartesian, no BNLJ)") {
    val df = Temporal.asofJoin(trades, quotes, Seq("sym"), "t_ts", "q_ts")
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan)
    val shuffles = "Exchange hashpartitioning".r
      .findAllIn(plan.replace("\n", " ")).length
    assert(shuffles <= 2, s"expected <=2 hash exchanges, got $shuffles\n$plan")
  }
}
