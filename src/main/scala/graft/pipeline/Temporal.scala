package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Temporal relational operators Spark lacks natively: as-of join,
  * point-in-interval range join, band join, and gap-based sessionization.
  * All are declarative single-exchange plans — no custom physical
  * operator is needed because each reduces to a keyed shuffle plus
  * either a sorted window pass (as-of, sessionize) or an equi-join on a
  * derived bin key (range, band). That keeps them inside Catalyst:
  * filters still push below the exchange, AQE still coalesces
  * partitions, and whole-stage codegen covers everything but the
  * window's sorted iteration.
  *
  * Scale contract (100 TB): every operator shuffles ONCE on the join
  * keys. The window-based members buffer one key's rows at a time
  * (Spark's WindowExec spills via UnsafeExternalSorter), so keys must
  * be real entities (user, instrument, device) — high cardinality,
  * bounded per-key history. A single global key funnels the corpus
  * through one partition; that is a modeling error, not an engine path,
  * and the operators refuse an empty `keys` list for that reason.
  */
object Temporal {

  /** Event-time column as comparable/subtractable long: microseconds
    * for timestamps, the value itself for numerics. Comparisons and
    * gap/tolerance arithmetic all happen in this space.
    */
  private def tsLong(c: Column, dt: DataType): Column = dt match {
    case TimestampType => unix_micros(c)
    // NTZ converts through the session zone; sessions here pin UTC, so
    // the long is the naive reading taken as UTC — matching DuckDB's
    // epoch_us on naive timestamps
    case TimestampNTZType => unix_micros(c.cast(TimestampType))
    case _: NumericType => c.cast(LongType)
    case other => throw new IllegalArgumentException(
      s"as-of/sessionize time column must be timestamp or numeric, got $other")
  }

  private def fieldType(df: DataFrame, name: String): DataType =
    df.schema(name).dataType

  private def requireDisjoint(left: DataFrame, right: DataFrame,
      keys: Seq[String]): Unit = {
    require(keys.nonEmpty, "temporal joins require at least one equi-key " +
      "(a keyless as-of funnels everything through one partition)")
    val overlap =
      (right.columns.toSet -- keys).intersect(left.columns.toSet -- keys)
    require(overlap.isEmpty,
      s"left/right non-key columns must be disjoint, overlap: " +
        overlap.toSeq.sorted.mkString(", ") + " — rename before joining")
  }

  /** As-of join: for every left row, the single right row with the same
    * keys whose time is the latest at-or-before (`backward`), earliest
    * at-or-after (`forward`), or closest in either direction
    * (`nearest`, ties broken backward) the left row's time — optionally
    * within `toleranceMicros`. Right columns come back null when no
    * match qualifies (left join semantics; every left row survives).
    *
    * Plan shape: the classic union trick instead of an O(n·m) range
    * join — both sides are tagged and unioned, ONE exchange hashes the
    * keys, each partition sorts by (time, side), and a running
    * `last(right_payload, ignoreNulls)` window carries the most recent
    * right row forward onto every left row. Cost is the same
    * exchange+sort a sort-merge equi-join would pay; no candidate pairs
    * ever materialize. Right rows sort BEFORE left rows at equal times,
    * so the match is inclusive, and equal-time right duplicates resolve
    * deterministically to the greatest payload struct (document ids
    * make this a stable total order); pre-aggregate the right side if
    * another tie policy is wanted.
    */
  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTsCol: String, rightTsCol: String,
      direction: String = "backward",
      toleranceMicros: Option[Long] = None): DataFrame = {
    requireDisjoint(left, right, keys)
    toleranceMicros.foreach(t => require(t >= 0, s"negative tolerance $t"))
    direction match {
      case "backward" | "forward" =>
        asofDirectional(left, right, keys, leftTsCol, rightTsCol,
          forward = direction == "forward", toleranceMicros)
      case "nearest" =>
        asofNearest(left, right, keys, leftTsCol, rightTsCol,
          toleranceMicros)
      case other => throw new IllegalArgumentException(
        s"direction must be backward|forward|nearest, got '$other'")
    }
  }

  /** Tagged union frame shared by the as-of variants: key columns, the
    * long event time, a side tag (right=0 so it sorts before left at
    * equal times), and both payload structs (each null on the other
    * side).
    */
  private def taggedUnion(left: DataFrame, right: DataFrame,
      keys: Seq[String], leftTsCol: String, rightTsCol: String)
      : (DataFrame, Seq[String], Seq[String]) = {
    val lPay = left.columns.filterNot(keys.contains).toSeq
    val rPay = right.columns.filterNot(keys.contains).toSeq
    val lStruct = StructType(lPay.map(c => left.schema(c)))
    val rStruct = StructType(rPay.map(c => right.schema(c)))
    val l = left.select(keys.map(col) ++ Seq(
      tsLong(col(leftTsCol), fieldType(left, leftTsCol)).as("_graft_ts"),
      lit(1).as("_graft_side"),
      struct(lPay.map(col): _*).as("_graft_l"),
      lit(null).cast(rStruct).as("_graft_r")): _*)
    val r = right.select(keys.map(col) ++ Seq(
      tsLong(col(rightTsCol), fieldType(right, rightTsCol)).as("_graft_ts"),
      lit(0).as("_graft_side"),
      lit(null).cast(lStruct).as("_graft_l"),
      struct(rPay.map(col): _*).as("_graft_r")): _*)
    (l.unionByName(r), lPay, rPay)
  }

  private def asofDirectional(left: DataFrame, right: DataFrame,
      keys: Seq[String], leftTsCol: String, rightTsCol: String,
      forward: Boolean, toleranceMicros: Option[Long]): DataFrame = {
    val (unioned, lPay, rPay) = taggedUnion(left, right, keys,
      leftTsCol, rightTsCol)
    val ord =
      if (forward) Seq(col("_graft_ts").desc, col("_graft_side").asc,
        col("_graft_r").asc)
      else Seq(col("_graft_ts").asc, col("_graft_side").asc,
        col("_graft_r").asc)
    val w = Window.partitionBy(keys.map(col): _*).orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = unioned
      .withColumn("_graft_m", last(col("_graft_r"), ignoreNulls = true)
        .over(w))
      .filter(col("_graft_side") === 1)
    finishAsof(matched, keys, lPay, rPay, right, rightTsCol, forward,
      toleranceMicros)
  }

  /** Delta (always >= 0 when the directions agree) between the left
    * time and a matched payload's right time.
    */
  private def matchDelta(m: Column, right: DataFrame, rightTsCol: String,
      forward: Boolean): Column = {
    val mTs = tsLong(m.getField(rightTsCol), fieldType(right, rightTsCol))
    if (forward) mTs - col("_graft_ts") else col("_graft_ts") - mTs
  }

  private def finishAsof(matched: DataFrame, keys: Seq[String],
      lPay: Seq[String], rPay: Seq[String], right: DataFrame,
      rightTsCol: String, forward: Boolean,
      toleranceMicros: Option[Long]): DataFrame = {
    val m = col("_graft_m")
    val keep = toleranceMicros match {
      case Some(t) =>
        m.isNotNull && matchDelta(m, right, rightTsCol, forward) <= t
      case None => m.isNotNull
    }
    matched.select(keys.map(col) ++
      lPay.map(c => col("_graft_l").getField(c).as(c)) ++
      rPay.map(c => when(keep, m.getField(c)).as(c)): _*)
  }

  private def asofNearest(left: DataFrame, right: DataFrame,
      keys: Seq[String], leftTsCol: String, rightTsCol: String,
      toleranceMicros: Option[Long]): DataFrame = {
    val (unioned, lPay, rPay) = taggedUnion(left, right, keys,
      leftTsCol, rightTsCol)
    // two window passes over the SAME key hash — one exchange, two
    // sorts (ascending for the backward carry, descending for the
    // forward one)
    val wb = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("_graft_ts").asc, col("_graft_side").asc,
        col("_graft_r").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wf = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("_graft_ts").desc, col("_graft_side").asc,
        col("_graft_r").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val both = unioned
      .withColumn("_graft_mb", last(col("_graft_r"), ignoreNulls = true)
        .over(wb))
      .withColumn("_graft_mf", last(col("_graft_r"), ignoreNulls = true)
        .over(wf))
      .filter(col("_graft_side") === 1)
    val db = matchDelta(col("_graft_mb"), right, rightTsCol,
      forward = false)
    val df_ = matchDelta(col("_graft_mf"), right, rightTsCol,
      forward = true)
    val inTol: Column => Column = d => toleranceMicros match {
      case Some(t) => d <= t
      case None => lit(true)
    }
    val bOk = col("_graft_mb").isNotNull && inTol(db)
    val fOk = col("_graft_mf").isNotNull && inTol(df_)
    // ties (equal delta) break backward — the at-or-before row wins
    val m = when(bOk && (!fOk || db <= df_), col("_graft_mb"))
      .when(fOk, col("_graft_mf"))
    both.select(keys.map(col) ++
      lPay.map(c => col("_graft_l").getField(c).as(c)) ++
      rPay.map(c => m.getField(c).as(c)): _*)
  }

  /** Point-in-interval range join: every (point, interval) pair with
    * equal keys and `start <= t <= end` (inclusive both ends). A naive
    * formulation — equi-join on keys, filter on the range — degenerates
    * to per-key cartesian pairing; this one derives a bin key of width
    * `binWidthMicros` in the shared time-long space, explodes each
    * interval onto the bins it covers, and equi-joins points to
    * intervals on (keys, bin). Each matching pair meets on EXACTLY one
    * bin (the point's), so no distinct pass is needed, and the exact
    * range predicate drops bin-granularity false positives after the
    * join.
    *
    * Choosing the bin width is a real knob, so the operator measures
    * the widest interval up front (one partial-agg scalar to the
    * driver) and REFUSES a configuration where one interval would
    * explode onto more than `maxBinsPerInterval` bins — a silent
    * 10^6-way row amplification at 100 TB is an outage, not a plan.
    */
  def pointInIntervalJoin(points: DataFrame, intervals: DataFrame,
      keys: Seq[String], tsCol: String, startCol: String, endCol: String,
      binWidthMicros: Long, maxBinsPerInterval: Int = 4096): DataFrame = {
    requireDisjoint(points, intervals, keys)
    require(binWidthMicros > 0, s"binWidthMicros must be > 0")
    val sT = tsLong(col(startCol), fieldType(intervals, startCol))
    val eT = tsLong(col(endCol), fieldType(intervals, endCol))
    val maxSpan = intervals.agg(max(eT - sT)).head()
    if (!maxSpan.isNullAt(0)) {
      val worstBins = maxSpan.getLong(0) / binWidthMicros + 2
      require(worstBins <= maxBinsPerInterval,
        s"widest interval spans ~$worstBins bins of $binWidthMicros " +
          s"(cap $maxBinsPerInterval) — raise binWidthMicros or split " +
          "the intervals")
    }
    val pT = tsLong(col(tsCol), fieldType(points, tsCol))
    val p = points.withColumn("_graft_bin", floorDiv(pT, binWidthMicros))
    val iv = intervals.withColumn("_graft_bin",
      explode(sequence(floorDiv(sT, binWidthMicros),
        floorDiv(eT, binWidthMicros))))
    p.join(iv, keys :+ "_graft_bin")
      .filter(pT >= sT && pT <= eT)
      .drop("_graft_bin")
  }

  /** Floor division in exact long arithmetic: `pmod` makes the
    * numerator an exact multiple, so the divide is integer-exact — no
    * double rounding (which can shift a boundary timestamp into the
    * wrong bin) and correct for negative time longs (Spark's integral
    * `/` truncates toward zero).
    */
  private def floorDiv(c: Column, w: Long): Column = {
    val cl = c.cast(LongType)
    ((cl - pmod(cl, lit(w))) / lit(w)).cast(LongType)
  }

  /** Interval-overlap join: every pair with equal keys whose intervals
    * intersect (`s1 <= e2 AND s2 <= e1`, inclusive). Both sides explode
    * onto their covered bins; a candidate pair then appears once per
    * SHARED bin, so instead of a distinct pass the join keeps only the
    * canonical bin — the one containing `max(s1, s2)`, which every
    * overlapping pair shares exactly once (the overlap starts there).
    * The same widest-interval refusal as [[pointInIntervalJoin]]
    * guards both sides' explosion.
    */
  def intervalOverlapJoin(left: DataFrame, right: DataFrame,
      keys: Seq[String], leftStartCol: String, leftEndCol: String,
      rightStartCol: String, rightEndCol: String, binWidthMicros: Long,
      maxBinsPerInterval: Int = 4096): DataFrame = {
    requireDisjoint(left, right, keys)
    require(binWidthMicros > 0, "binWidthMicros must be > 0")
    val ls = tsLong(col(leftStartCol), fieldType(left, leftStartCol))
    val le = tsLong(col(leftEndCol), fieldType(left, leftEndCol))
    val rs = tsLong(col(rightStartCol), fieldType(right, rightStartCol))
    val re = tsLong(col(rightEndCol), fieldType(right, rightEndCol))
    Seq(("left", left, le - ls), ("right", right, re - rs))
      .foreach { case (side, df, span) =>
        val maxSpan = df.agg(max(span)).head()
        if (!maxSpan.isNullAt(0)) {
          val worstBins = maxSpan.getLong(0) / binWidthMicros + 2
          require(worstBins <= maxBinsPerInterval,
            s"widest $side interval spans ~$worstBins bins of " +
              s"$binWidthMicros (cap $maxBinsPerInterval) — raise " +
              "binWidthMicros or split the intervals")
        }
      }
    val l = left.withColumn("_graft_bin",
      explode(sequence(floorDiv(ls, binWidthMicros),
        floorDiv(le, binWidthMicros))))
    val r = right.withColumn("_graft_bin",
      explode(sequence(floorDiv(rs, binWidthMicros),
        floorDiv(re, binWidthMicros))))
    l.join(r, keys :+ "_graft_bin")
      .filter(ls <= re && rs <= le &&
        col("_graft_bin") === floorDiv(greatest(ls, rs), binWidthMicros))
      .drop("_graft_bin")
  }

  /** Band join: every pair with equal keys and `|l - r| <= band` in the
    * time-long space. The right side keeps its single bin of width
    * `band`; each LEFT row fans out to its bin and both neighbors
    * (constant 3× amplification), so any in-band pair shares a bin
    * exactly once and the exact predicate prunes the rest.
    */
  def bandJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTsCol: String, rightTsCol: String, bandMicros: Long): DataFrame = {
    requireDisjoint(left, right, keys)
    require(bandMicros > 0, "bandMicros must be > 0")
    val lT = tsLong(col(leftTsCol), fieldType(left, leftTsCol))
    val rT = tsLong(col(rightTsCol), fieldType(right, rightTsCol))
    val lBin = floorDiv(lT, bandMicros)
    val l = left.withColumn("_graft_bin",
      explode(array(lBin - 1, lBin, lBin + 1)))
    val r = right.withColumn("_graft_bin", floorDiv(rT, bandMicros))
    l.join(r, keys :+ "_graft_bin")
      .filter(abs(lT - rT) <= bandMicros)
      .drop("_graft_bin")
  }

  /** Gap-based sessionization: rows that are within `gapMicros` of
    * their predecessor (per key, time order) share a session. Appends
    * `session_seq` — the 1-based session index within the key — to
    * every input row. One exchange on the keys, one sorted window
    * pass; the boundary flag (`gap exceeded or first row`) prefix-sums
    * into the label, so no per-session state ever leaves the executors.
    *
    * Determinism under duplicated timestamps is structural: the lag
    * diff is order-dependent among equal-time rows, but the boundary
    * MULTISET of a tie group is not (exactly one row carries the gap
    * flag), and the prefix sum runs over a RANGE frame — every row of
    * a tie group sums the whole group — so each row's label is a pure
    * function of the (key, time)-multiset, never of sort order. Equal-
    * time rows therefore always share a session, on any partitioning.
    */
  def sessionize(df: DataFrame, keys: Seq[String], tsCol: String,
      gapMicros: Long): DataFrame = {
    require(keys.nonEmpty, "sessionize requires at least one key")
    require(gapMicros > 0, "gapMicros must be > 0")
    val t = tsLong(col(tsCol), fieldType(df, tsCol))
    val w = Window.partitionBy(keys.map(col): _*).orderBy(t.asc)
    val prev = lag(t, 1).over(w)
    // boundary is itself a window expression, so it must materialize
    // before the prefix sum (window functions cannot nest) — both ride
    // the same exchange+sort
    df.withColumn("_graft_boundary",
        when(prev.isNull || t - prev > gapMicros, 1L).otherwise(0L))
      .withColumn("session_seq", sum(col("_graft_boundary"))
        .over(w.rangeBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("_graft_boundary")
  }

  /** Per-session aggregates over [[sessionize]] labels: `(keys...,
    * session_seq, session_start, session_end, n_events)`. After the
    * window pass each (key, session) is CONTIGUOUS within its
    * partition, so the map-side partial aggregation collapses every
    * session to one row before the final exchange — the second shuffle
    * moves session-count rows, not event-count rows.
    */
  def sessionStats(df: DataFrame, keys: Seq[String], tsCol: String,
      gapMicros: Long): DataFrame =
    sessionize(df, keys, tsCol, gapMicros)
      .groupBy((keys :+ "session_seq").map(col): _*)
      .agg(min(col(tsCol)).as("session_start"),
        max(col(tsCol)).as("session_end"),
        count(lit(1)).as("n_events"))
}
