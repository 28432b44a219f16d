package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality constraints verified in (almost) one scan —
  * the contract gate a 100 TB ingest runs between "the files landed"
  * and "downstream trusts the table" (the Deequ/Great-Expectations
  * operator family, re-expressed as pure Catalyst aggregates).
  *
  * Scale design, by constraint class:
  *  - ROW-LEVEL constraints (not-null, range, regex, value-set,
  *    completeness) all compile into ONE aggregate over ONE scan of the
  *    source: each constraint is a `sum(violated ? 1 : 0)` partial agg,
  *    so the map side reduces every partition to a single row and the
  *    shuffle carries `numPartitions` rows regardless of table size
  *    (the [[Profile]] shape; ConstraintsSpec pins the single-scan
  *    plan). Adding a constraint adds a column to the agg row, not a
  *    pass over the data.
  *  - UNIQUENESS adds one `groupBy(key)` shuffle per distinct key-set —
  *    unavoidable (uniqueness is a global property), partial-agg
  *    friendly (map-side combine collapses repeats before the
  *    exchange), and the post-group reduction to a single (rows,
  *    violations) row is again partial-only.
  *  - REFERENTIAL containment (`SubsetOf`) is a LEFT ANTI join against
  *    the DISTINCT reference keys — when the reference side is
  *    dimension-sized it broadcasts under AQE and the fact side is
  *    scanned once map-side (the decontamination discipline).
  *
  * Violation semantics: a NULL value never violates a value-shape
  * constraint (range/regex/set) — null-ness is [[NotNull]]'s or
  * [[Completeness]]'s job, so one bad column reports through the
  * constraint that names the defect instead of triple-counting.
  * `passed` is `n_violations == 0` everywhere except [[Completeness]],
  * whose tolerance is the declared minimum non-null fraction.
  */
object Constraints {

  sealed trait Constraint {
    /** Stable rendered id — the report's primary key. */
    def label: String
    def kind: String
    def columnLabel: String
  }

  /** Every value present. */
  final case class NotNull(column: String) extends Constraint {
    val kind = "not_null"
    val columnLabel: String = column
    val label = s"not_null($column)"
  }

  /** Non-null fraction at least `minFrac` (0..1]. */
  final case class Completeness(column: String, minFrac: Double)
      extends Constraint {
    require(minFrac > 0 && minFrac <= 1,
      s"completeness fraction $minFrac outside (0,1]")
    val kind = "completeness"
    val columnLabel: String = column
    val label = s"completeness($column,$minFrac)"
  }

  /** Non-null values inside [lo, hi] (inclusive both ends). */
  final case class InRange(column: String, lo: Double, hi: Double)
      extends Constraint {
    require(lo <= hi, s"empty range [$lo,$hi]")
    val kind = "in_range"
    val columnLabel: String = column
    val label = s"in_range($column,$lo,$hi)"
  }

  /** Non-null values match `pattern` (Java-regex ∩ RE2 subset — the PII
    * discipline, so the same pattern runs on any engine).
    */
  final case class Matches(column: String, pattern: String)
      extends Constraint {
    val kind = "matches"
    val columnLabel: String = column
    val label = s"matches($column,$pattern)"
  }

  /** Non-null values drawn from the listed set. */
  final case class IsIn(column: String, values: Seq[String])
      extends Constraint {
    require(values.nonEmpty, "empty value set")
    val kind = "is_in"
    val columnLabel: String = column
    val label = s"is_in($column,${values.mkString("|")})"
  }

  /** The key-set identifies rows (no key occurs twice; a NULL key is a
    * key value like any other).
    */
  final case class Unique(columns: Seq[String]) extends Constraint {
    require(columns.nonEmpty, "unique over zero columns")
    val kind = "unique"
    val columnLabel: String = columns.mkString(",")
    val label = s"unique(${columns.mkString(",")})"
  }

  /** Every non-null value appears in `refColumn` of `ref` (foreign-key
    * containment). Violations count ROWS (not distinct values) so the
    * number is the repair cost.
    */
  final case class SubsetOf(column: String, ref: DataFrame,
      refColumn: String, refLabel: String) extends Constraint {
    val kind = "subset_of"
    val columnLabel: String = column
    val label = s"subset_of($column,$refLabel.$refColumn)"
  }

  /** True when the row VIOLATES a row-level constraint (never true on
    * null values except for the null-ness constraints themselves).
    */
  private def violation(c: Constraint, df: DataFrame): Column = c match {
    case NotNull(col0)         => col(col0).isNull
    case Completeness(col0, _) => col(col0).isNull
    case InRange(col0, lo, hi) =>
      col(col0).isNotNull &&
        (col(col0).cast("double") < lo || col(col0).cast("double") > hi)
    case Matches(col0, p) => col(col0).isNotNull && !col(col0).rlike(p)
    case IsIn(col0, vs) =>
      col(col0).isNotNull && !col(col0).cast("string").isin(vs: _*)
    case other => throw new IllegalArgumentException(
      s"${other.kind} is not a row-level constraint")
  }

  private val reportCols = Seq("cname", "kind", "col_name", "n_rows",
    "n_violations", "passed")

  /** Verify `constraints` against `df` — one report row per constraint:
    * `(cname, kind, col_name, n_rows, n_violations, passed)`, in
    * declaration order.
    *
    * Empty input passes VACUOUSLY: zero rows means zero violations, so
    * every constraint reports `(n_rows=0, n_violations=0, passed=true)`
    * — the ingest-gate semantics (an empty partition landing is not a
    * data-quality defect; pair with a row-count floor upstream if
    * emptiness itself should fail the gate).
    */
  def check(df: DataFrame, constraints: Seq[Constraint]): DataFrame = {
    require(constraints.nonEmpty, "no constraints to check")
    val spark = df.sparkSession
    val indexed = constraints.zipWithIndex
    val rowLevel = indexed.filter {
      case (_: Unique, _) | (_: SubsetOf, _) => false
      case _                                 => true
    }

    // ---- one aggregate over one scan: total rows + one violation
    // counter per row-level constraint ----
    val aggs = count(lit(1L)).as("_n") +: rowLevel.map { case (c, i) =>
      sum(when(violation(c, df), 1L).otherwise(0L)).as(s"_v$i")
    }
    val one = df.agg(aggs.head, aggs.tail: _*)

    // all row-level report rows come out of ONE select over the one-row
    // agg (explode of a struct array) — N union branches over the same
    // agg would plan N scans and lean on runtime exchange reuse to
    // collapse them; this shape is one scan IN THE PLAN
    val rowFrames = if (rowLevel.isEmpty) Seq.empty[DataFrame] else {
      val reportStructs = rowLevel.map { case (c, i) =>
        val v = coalesce(col(s"_v$i"), lit(0L))
        val passed = c match {
          case Completeness(_, f) =>
            (col("_n") - v).cast("double") >= lit(f) * col("_n")
          case _ => v === 0L
        }
        struct(lit(i).as("_ord"), lit(c.label).as("cname"),
          lit(c.kind).as("kind"), lit(c.columnLabel).as("col_name"),
          col("_n").as("n_rows"), v.as("n_violations"),
          passed.as("passed"))
      }
      Seq(one.select(explode(array(reportStructs: _*)).as("_r"))
        .select(col("_r.*")))
    }

    // ---- uniqueness: groupBy(key) → single partial-agg reduction;
    // violations = rows that share their key with another row ----
    val uniqueFrames = indexed.collect { case (c @ Unique(cols0), i) =>
      df.groupBy(cols0.map(col): _*).agg(count(lit(1L)).as("_c"))
        .agg(coalesce(sum(col("_c")), lit(0L)).as("_nr"),
          coalesce(sum(when(col("_c") > 1, col("_c")).otherwise(0L)),
            lit(0L)).as("_nv"))
        .select(lit(i).as("_ord"), lit(c.label).as("cname"),
          lit(c.kind).as("kind"), lit(c.columnLabel).as("col_name"),
          col("_nr").as("n_rows"), col("_nv").as("n_violations"),
          (col("_nv") === 0L).as("passed"))
    }

    // ---- referential containment: anti-join the distinct reference
    // keys (broadcasts when dimension-sized); n_rows rides the shared
    // one-row agg, so no second scan of the fact side ----
    val subsetFrames = indexed.collect { case (c @ SubsetOf(col0, ref,
        refCol, _), i) =>
      val misses = df.select(col(col0)).where(col(col0).isNotNull)
        .join(ref.select(col(refCol).as(col0)).distinct(),
          Seq(col0), "left_anti")
        .agg(count(lit(1L)).as("_nv"))
      one.select(col("_n")).crossJoin(misses)
        .select(lit(i).as("_ord"), lit(c.label).as("cname"),
          lit(c.kind).as("kind"), lit(c.columnLabel).as("col_name"),
          col("_n").as("n_rows"), col("_nv").as("n_violations"),
          (col("_nv") === 0L).as("passed"))
    }

    val frames = rowFrames ++ uniqueFrames ++ subsetFrames
    frames.reduce(_ unionAll _).orderBy("_ord")
      .select(reportCols.map(col): _*)
  }

  /** Constraints the data already satisfies, inferred from one
    * [[Profile]]-shaped scan (the "suggestion" half of the Deequ
    * workflow): `not_null` where no value is missing, `unique` where
    * the exact distinct count equals the row count, `in_range` over the
    * observed min/max of numeric columns, `is_in` where a string
    * column's cardinality is at most `maxSetSize` (its value set is
    * then collected in ONE second bounded pass restricted to the
    * pre-qualified columns — the collected state is ≤ maxSetSize values
    * per column BY CONSTRUCTION, because pass 1 already measured the
    * cardinality).
    *
    * Output: `(col_name, kind, min_str, max_str, set_str)` — the
    * evidence columns stay separate strings (min/max as rendered by
    * `cast(string)`, the value set sorted and comma-joined) so an
    * independent engine can reproduce them without label-rendering
    * drift.
    */
  def suggest(df: DataFrame, maxSetSize: Int = 10): DataFrame = {
    require(maxSetSize >= 1, s"maxSetSize $maxSetSize < 1")
    val spark = df.sparkSession
    val prof = Profile.profile(df, exactDistinct = true)
    val numericTypes = Set("tinyint", "smallint", "int", "bigint",
      "float", "double", "decimal")
    val isNumeric = col("data_type").isin(numericTypes.toSeq: _*) ||
      col("data_type").startsWith("decimal")

    val notNull = prof.filter(col("n_null") === 0L)
      .select(col("col_name"), lit("not_null").as("kind"),
        lit(null: String).as("min_str"), lit(null: String).as("max_str"),
        lit(null: String).as("set_str"))
    val unique = prof.filter(col("n_distinct") === col("n_rows") &&
        col("n_null") === 0L)
      .select(col("col_name"), lit("unique").as("kind"),
        lit(null: String).as("min_str"), lit(null: String).as("max_str"),
        lit(null: String).as("set_str"))
    val inRange = prof.filter(isNumeric && col("n_rows") > col("n_null"))
      .select(col("col_name"), lit("in_range").as("kind"),
        col("min_str"), col("max_str"), lit(null: String).as("set_str"))

    // pass 2: value sets for the string columns pass 1 qualified —
    // bounded collect_set state by construction
    val candidates = prof
      .filter(col("data_type") === "string" &&
        col("n_distinct") <= maxSetSize && col("n_distinct") > 0L)
      .select("col_name").collect().map(_.getString(0)).toSeq
    val isIn = if (candidates.isEmpty) {
      import spark.implicits._
      Seq.empty[(String, String, String, String, String)]
        .toDF("col_name", "kind", "min_str", "max_str", "set_str")
    } else {
      val aggs = candidates.zipWithIndex.map { case (c, i) =>
        array_join(sort_array(collect_set(col(c).cast("string"))), ",")
          .as(s"_s$i")
      }
      val one = df.agg(aggs.head, aggs.tail: _*)
      val stacks = candidates.zipWithIndex
        .map { case (c, i) => s"'$c', _s$i" }
      one.select(expr(s"stack(${candidates.length}, " +
          s"${stacks.mkString(", ")}) AS (col_name, set_str)"))
        .select(col("col_name"), lit("is_in").as("kind"),
          lit(null: String).as("min_str"), lit(null: String).as("max_str"),
          col("set_str"))
    }

    notNull.unionAll(unique).unionAll(inRange).unionAll(isIn)
      .orderBy("col_name", "kind")
  }
}
