package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** One-scan column profiling — the ingest-validation operator a 100 TB
  * load runs before anything else trusts the data: per column, row and
  * null counts, distinct cardinality, min/max, and total rendered
  * length, in long format (one output row per column).
  *
  * Scale design: ONE aggregate over ONE scan of the source — all
  * per-column measures are partial-aggregable, so the map side reduces
  * each partition to a single row and the shuffle carries
  * `numPartitions` rows regardless of table size. The long format is
  * produced by `stack` over the single aggregate row (no second scan,
  * no per-column jobs — the naive `df.describe`-per-column shape scans
  * once per column).
  *
  * Distinct counts default to HyperLogLog `approx_count_distinct`
  * (map-side mergeable sketch, keeps the one-row-per-partition shuffle
  * shape). `exactDistinct = true` switches to exact `count(distinct)` —
  * Spark plans multiple distinct aggregates through EXPAND, which
  * multiplies shuffle volume by the column count; right for gate-sized
  * validation, wrong as the 100 TB default (the oracle query pins the
  * exact mode, ProfileSpec bounds the approx mode against it).
  */
object Profile {

  def profile(df: DataFrame, exactDistinct: Boolean = false): DataFrame = {
    val fields = df.schema.fields
    require(fields.nonEmpty, "cannot profile a zero-column frame")
    val aggs = fields.zipWithIndex.flatMap { case (f, i) =>
      val c = col(f.name)
      Seq(
        count(c).as(s"_nn$i"),
        (if (exactDistinct) countDistinct(c)
         else approx_count_distinct(c)).as(s"_nd$i"),
        min(c).cast("string").as(s"_min$i"),
        max(c).cast("string").as(s"_max$i"),
        sum(length(c.cast("string"))).as(s"_len$i"))
    } :+ count(lit(1)).as("_n")
    val one = df.agg(aggs.head, aggs.tail: _*)
    val stacks = fields.zipWithIndex.map { case (f, i) =>
      s"'${f.name}', '${f.dataType.simpleString}', _n, _n - _nn$i, " +
        s"_nd$i, _min$i, _max$i, _len$i"
    }
    one.select(expr(
      s"stack(${fields.length}, ${stacks.mkString(", ")}) AS " +
        "(col_name, data_type, n_rows, n_null, n_distinct, " +
        "min_str, max_str, total_len)"))
  }
}
