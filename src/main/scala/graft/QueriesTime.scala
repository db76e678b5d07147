package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.functions.Exact._
import graft.Tables._

/** Time-series and advanced relational operators beyond the reference's own
  * surface: as-of join, interval (range) join, frame-based moving windows,
  * CUBE grouping sets, exact percentiles, and distribution windows
  * (ntile / percent_rank / cume_dist).
  *
  * Scale posture (100 TB):
  *  - `join_asof` avoids Spark's missing ASOF operator with the union +
  *    keyed-window formulation: ONE shuffle/sort per user key, no
  *    per-row probing, no broadcast requirement on either side.
  *  - `join_range` turns an interval predicate into an equi join on a
  *    fixed-width bucket key (the standard interval-bucketing trick), so the
  *    plan is a BroadcastHashJoin instead of an interpreted nested-loop scan.
  *  - the window queries shuffle once on their partition key and sort within
  *    partitions — the minimal possible movement for frame semantics.
  */
object TimeQueries {

  /** As-of core, shared by the catalog query and its spec: left rows pick up
    * the `carry` columns of the most recent right row with right.ts <=
    * left.ts per `key` (>= / backward semantics; ties match). The scalable
    * formulation: union both sides with a side marker, sort each key
    * partition by (ts, side) with right rows first on ties, carry the last
    * seen right row forward with last(_, ignoreNulls) — ONE shuffle/sort
    * per key. The carry columns travel as ONE struct (null only on left
    * rows), so a matched right row whose individual carry values are null
    * is still the row that wins — per-column carries would skip it and mix
    * values from different right rows. `right` must be unique per
    * (key, ts) for determinism. */
  private[graft] def asofJoin(
      left: org.apache.spark.sql.DataFrame,
      right: org.apache.spark.sql.DataFrame,
      key: String, ts: String, carry: Seq[String]): org.apache.spark.sql.DataFrame = {
    val leftExtras = left.columns.toSeq.filterNot(c => c == key || c == ts)
    val r = leftExtras.foldLeft(
        right.withColumn("__side", lit(0))
          .withColumn("__carry", struct(carry.map(col): _*))
          .drop(carry: _*)) { (df, c) =>
      df.withColumn(c, lit(null).cast(left.schema(c).dataType))
    }
    val l = left.withColumn("__side", lit(1))
      .withColumn("__carry", lit(null).cast(r.schema("__carry").dataType))
    val w = Window.partitionBy(key).orderBy(col(ts), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = l.unionByName(r.select(l.columns.map(col).toSeq: _*))
      .withColumn("__carry", last(col("__carry"), ignoreNulls = true).over(w))
    carry.foldLeft(carried.filter(col("__side") === 1)) { (df, c) =>
      df.withColumn(c, col(s"__carry.$c"))
    }.drop("__side", "__carry")
  }

  // As-of join: every click event picks the most recent purchase by the same
  // user at-or-before its timestamp. Spark has no ASOF join; see [[asofJoin]].
  // Purchases are pre-deduplicated per (user, ts) so the carried value is
  // deterministic. DuckDB twin: native ASOF LEFT JOIN.
  private val joinAsof = Q(
    (s, d) => {
      val ev = events(s, d)
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"), col("event_id"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .groupBy("user_id", "ts").agg(max(col("event_id")).as("pe_id"))
        .withColumn("p_ts", col("ts"))
      asofJoin(clicks, purchases, "user_id", "ts", Seq("pe_id", "p_ts"))
        .select("event_id", "user_id", "ts", "pe_id", "p_ts")
        .orderBy("event_id")
    },
    Some("""WITH clicks AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'),
            pur AS (SELECT user_id, ts, max(event_id) AS pe_id FROM events
                    WHERE event_type = 'purchase' GROUP BY user_id, ts)
            SELECT c.event_id, c.user_id, c.ts, p.pe_id, p.ts AS p_ts
            FROM clicks c ASOF LEFT JOIN pur p ON c.user_id = p.user_id AND c.ts >= p.ts
            ORDER BY c.event_id"""))

  // Interval join: orders against half-open price bands [lo, hi). The band
  // predicate alone would plan as an interpreted nested-loop join; expanding
  // each band into the fixed-width buckets it covers and equi-joining on the
  // bucket makes it a codegen'd BroadcastHashJoin — and at 100 TB the bucket
  // key also co-partitions a shuffle join if the band table ever grows.
  /** Expand half-open [lo, hi) bands into every fixed-width bucket they
    * cover (shared by the catalog query and its spec): the equi key that
    * turns an interval predicate into a hash join. */
  private[graft] def expandBands(
      bands: org.apache.spark.sql.DataFrame, width: Long): org.apache.spark.sql.DataFrame =
    bands.withColumn("bucket",
      explode(sequence(floor(col("lo") / width), floor((col("hi") - 1) / width))))

  private val joinRange = Q(
    (s, d) => {
      import s.implicits._
      val W = 50000L
      val bands = Seq(
        (0L, 50000L, "p0_low"), (50000L, 150000L, "p1_mid"),
        (150000L, 300000L, "p2_high"), (300000L, 600000L, "p3_top"))
        .toDF("lo", "hi", "band")
      val expanded = expandBands(bands, W)
      orders(s, d)
        .withColumn("bucket", floor(col("o_totalprice") / W))
        .join(broadcast(expanded), Seq("bucket"))
        .filter(col("o_totalprice") >= col("lo") && col("o_totalprice") < col("hi"))
        .groupBy("band")
        .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("rev"))
        .orderBy("band")
    },
    Some(s"""WITH bands(lo, hi, band) AS (VALUES
              (0, 50000, 'p0_low'), (50000, 150000, 'p1_mid'),
              (150000, 300000, 'p2_high'), (300000, 600000, 'p3_top'))
            SELECT band, count(*) AS n_orders, ${sqlDsum("o_totalprice")} AS rev
            FROM orders JOIN bands ON o_totalprice >= lo AND o_totalprice < hi
            GROUP BY band ORDER BY band"""))

  // Frame-based windows per customer: previous order price (lag), running
  // revenue (cumulative frame), 3-order moving average. The moving average is
  // an exact decimal sum over the frame divided by the frame row count, so
  // both engines compute identical doubles.
  private val windowMoveAvg = Q(
    (s, d) => {
      val w = Window.partitionBy("o_custkey").orderBy(col("o_orderdate"), col("o_orderkey"))
      val cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val m3 = w.rowsBetween(-2, 0)
      orders(s, d)
        .select(
          col("o_custkey"), col("o_orderkey"), col("o_orderdate"), col("o_totalprice"),
          lag(col("o_totalprice"), 1).over(w).as("prev_price"),
          sum(dec(col("o_totalprice"))).over(cum).cast("double").as("cum_rev"),
          (sum(dec(col("o_totalprice"))).over(m3).cast("double") /
            count(lit(1)).over(m3).cast("double")).as("mavg3"))
        .orderBy("o_custkey", "o_orderkey")
    },
    Some("""SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice,
            lag(o_totalprice, 1) OVER w AS prev_price,
            CAST(sum(CAST(o_totalprice AS DECIMAL(18,4)))
              OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS cum_rev,
            CAST(sum(CAST(o_totalprice AS DECIMAL(18,4)))
              OVER (w ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE)
              / CAST(count(*) OVER (w ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE) AS mavg3
            FROM orders
            WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
            ORDER BY o_custkey, o_orderkey"""))

  // CUBE over (returnflag, linestatus) with a grouping id. Subtotal rows
  // carry NULL keys; both engines order them identically via explicit
  // NULLS FIRST and the gid column.
  private val cubeAgg = Q(
    (s, d) =>
      lineitem(s, d)
        .cube("l_returnflag", "l_linestatus")
        .agg(grouping_id().as("gid"), count(lit(1)).as("n_rows"),
          dsum(col("l_quantity")).as("sum_qty"))
        .select("l_returnflag", "l_linestatus", "gid", "n_rows", "sum_qty")
        .orderBy(col("gid"), col("l_returnflag").asc_nulls_first,
          col("l_linestatus").asc_nulls_first),
    Some(s"""SELECT l_returnflag, l_linestatus,
            CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
            count(*) AS n_rows, ${sqlDsum("l_quantity")} AS sum_qty
            FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
            ORDER BY gid, l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST"""))

  // Exact (interpolating) percentiles per group. Spark's `percentile` and
  // DuckDB's `quantile_cont` both sort the group and interpolate linearly at
  // q*(n-1); quantities are integer-valued doubles, so the interpolation
  // arithmetic is bit-identical.
  private val aggPercentile = Q(
    (s, d) =>
      lineitem(s, d)
        .groupBy("l_linestatus")
        .agg(
          expr("percentile(l_quantity, 0.25)").as("q25"),
          expr("percentile(l_quantity, 0.5)").as("q50"),
          expr("percentile(l_quantity, 0.75)").as("q75"),
          count(lit(1)).as("n_rows"))
        .orderBy("l_linestatus"),
    Some("""SELECT l_linestatus, quantile_cont(l_quantity, 0.25) AS q25,
            quantile_cont(l_quantity, 0.5) AS q50, quantile_cont(l_quantity, 0.75) AS q75,
            count(*) AS n_rows
            FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus"""))

  // Distribution windows: quartile bucket, percent_rank and cume_dist per
  // order priority. All three are integer-arithmetic-derived (then one double
  // division), so cross-engine deterministic given the unique total order.
  private val windowNtile = Q(
    (s, d) => {
      val w = Window.partitionBy("o_orderpriority")
        .orderBy(col("o_totalprice"), col("o_orderkey"))
      orders(s, d)
        .select(
          col("o_orderpriority"), col("o_orderkey"), col("o_totalprice"),
          ntile(4).over(w).as("quartile"),
          percent_rank().over(w).as("pct_rank"),
          cume_dist().over(w).as("cd"))
        .orderBy("o_orderpriority", "o_orderkey")
    },
    Some("""SELECT o_orderpriority, o_orderkey, o_totalprice,
            CAST(ntile(4) OVER w AS INTEGER) AS quartile,
            percent_rank() OVER w AS pct_rank,
            cume_dist() OVER w AS cd
            FROM orders
            WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey)
            ORDER BY o_orderpriority, o_orderkey"""))

  // Winsorization (percentile clipping) — the outlier-robust feature-prep
  // step: per event type, clip `value` (at exact cent granularity) to its
  // [p01, p99] band and account what was clipped. The bounds are EXACT
  // order statistics picked by pure-integer ranks (k = ⌈q·n⌉ via
  // (q·100·n + 99) DIV 100 — no double×quantile arithmetic whose ceil could
  // straddle an ulp between engines, and no reliance on the engines'
  // subtly-different quantile_disc conventions); ties are safe because the
  // k-th smallest VALUE is invariant under tie order. Scale posture: exact
  // per-group percentiles cost one sort per group (the window below — fine
  // while the group count is bounded, as here); at 100 TB with huge groups
  // the same clip shape runs off `agg_approx_quantile`'s sketch bounds
  // instead.
  private val eventsWinsorize = Q(
    (s, d) => {
      val ev = graft.Tables.events(s, d).select(col("event_type"),
        floor(col("value") * lit(100.0) + lit(0.5)).as("cents"))
      val w = Window.partitionBy("event_type").orderBy("cents")
      val ranked = ev
        .withColumn("rn", row_number().over(w))
        .withColumn("n", count(lit(1)).over(Window.partitionBy("event_type")))
      val bounds = ranked.groupBy("event_type").agg(
        min(when(col("rn") === expr("(n + 99) DIV 100"), col("cents"))).as("lo"),
        min(when(col("rn") === expr("(99 * n + 99) DIV 100"), col("cents"))).as("hi"))
      ev.join(broadcast(bounds), "event_type")
        .groupBy("event_type")
        .agg(min(col("lo")).as("lo"), min(col("hi")).as("hi"),
          sum(when(col("cents") < col("lo"), 1L).otherwise(0L)).as("n_lo"),
          sum(when(col("cents") > col("hi"), 1L).otherwise(0L)).as("n_hi"),
          sum(least(col("hi"), greatest(col("lo"), col("cents")))).as("sum_winsorized"))
        .orderBy("event_type")
    },
    Some("""WITH ev AS (SELECT event_type,
                   CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS cents FROM events),
            r AS (SELECT event_type, cents,
                    row_number() OVER (PARTITION BY event_type ORDER BY cents) AS rn,
                    count(*) OVER (PARTITION BY event_type) AS n FROM ev),
            b AS (SELECT event_type,
                    min(CASE WHEN rn = (n + 99) // 100 THEN cents END) AS lo,
                    min(CASE WHEN rn = (99 * n + 99) // 100 THEN cents END) AS hi
                  FROM r GROUP BY event_type)
            SELECT e.event_type, min(lo) AS lo, min(hi) AS hi,
                   CAST(sum(CASE WHEN cents < lo THEN 1 ELSE 0 END) AS BIGINT) AS n_lo,
                   CAST(sum(CASE WHEN cents > hi THEN 1 ELSE 0 END) AS BIGINT) AS n_hi,
                   CAST(sum(least(hi, greatest(lo, cents))) AS BIGINT) AS sum_winsorized
            FROM ev e JOIN b USING (event_type)
            GROUP BY e.event_type ORDER BY event_type"""))

  val all: List[(String, Q)] = List(
    "join_asof" -> joinAsof,
    "join_range" -> joinRange,
    "window_move_avg" -> windowMoveAvg,
    "cube_agg" -> cubeAgg,
    "agg_percentile" -> aggPercentile,
    "events_winsorize" -> eventsWinsorize,
    "window_ntile" -> windowNtile)
}
