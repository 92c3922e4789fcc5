package graft.ops

import graft.QuerySpec
import graft.model.Tables
import org.apache.spark.sql.functions._

/** Additional SQL-surface coverage: PIVOT, string functions, ordered
  * collect, explode/unnest, exact percentiles. All oracle-checked.
  */
object Extras {

  /** PIVOT: wide conditional aggregation (explicit pivot values so the plan
    * is a single pass — no extra distinct-values job, which also matters at
    * scale). */
  val pivotQuery: QuerySpec = QuerySpec.sql(
    "q_pivot",
    """SELECT l_linestatus,
      |       sum(CASE WHEN l_returnflag = 'A' THEN l_quantity END) AS A,
      |       sum(CASE WHEN l_returnflag = 'N' THEN l_quantity END) AS N,
      |       sum(CASE WHEN l_returnflag = 'R' THEN l_quantity END) AS R
      |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin) { (spark, dir) =>
    Tables.lineitem(spark, dir)
      .groupBy(col("l_linestatus"))
      .pivot("l_returnflag", Seq("A", "N", "R"))
      .agg(sum(col("l_quantity")))
      .orderBy(col("l_linestatus"))
  }

  /** UNPIVOT (melt): the wide per-flag aggregate of [[pivotQuery]] turned
    * back into long form with `Dataset.unpivot` — the narrow↔wide
    * round-trip every feature pipeline needs in both directions. Pure
    * projection over the aggregated (tiny) wide table: the unpivot itself
    * is an Expand node, no shuffle beyond the aggregation's own. */
  val unpivotQuery: QuerySpec = QuerySpec.sql(
    "q_unpivot",
    """WITH w AS (
      |  SELECT l_linestatus,
      |         sum(CASE WHEN l_returnflag = 'A' THEN l_quantity END) AS A,
      |         sum(CASE WHEN l_returnflag = 'N' THEN l_quantity END) AS N,
      |         sum(CASE WHEN l_returnflag = 'R' THEN l_quantity END) AS R
      |  FROM lineitem GROUP BY 1)
      |SELECT l_linestatus, flag, qty FROM (
      |  SELECT l_linestatus, 'A' AS flag, A AS qty FROM w
      |  UNION ALL SELECT l_linestatus, 'N', N FROM w
      |  UNION ALL SELECT l_linestatus, 'R', R FROM w)
      |WHERE qty IS NOT NULL ORDER BY 1, 2""".stripMargin) { (spark, dir) =>
    Tables.lineitem(spark, dir)
      .groupBy(col("l_linestatus"))
      .pivot("l_returnflag", Seq("A", "N", "R"))
      .agg(sum(col("l_quantity")))
      .unpivot(Array(col("l_linestatus")), Array(col("A"), col("N"), col("R")),
        "flag", "qty")
      .filter(col("qty").isNotNull)
      .orderBy(col("l_linestatus"), col("flag"))
  }

  /** Scalar string functions over `part`: case, substring, replace, pad,
    * regexp, concat, reverse. */
  val stringFuncs: QuerySpec = QuerySpec.sql(
    "q_string_funcs",
    """SELECT p_partkey,
      |       upper(p_name) AS up,
      |       lower(p_type) AS lo,
      |       substring(p_name, 1, 8) AS head8,
      |       replace(p_name, ' ', '_') AS snake,
      |       lpad(CAST(p_size AS VARCHAR), 4, '0') AS size_padded,
      |       length(p_name) AS name_len,
      |       regexp_replace(p_name, '[aeiou]', '*', 'g') AS devoweled,
      |       p_brand || '#' || p_type AS brand_type,
      |       reverse(p_name) AS rev
      |FROM part ORDER BY p_partkey""".stripMargin) { (spark, dir) =>
    Tables.part(spark, dir)
      .select(
        col("p_partkey"),
        upper(col("p_name")).as("up"),
        lower(col("p_type")).as("lo"),
        substring(col("p_name"), 1, 8).as("head8"),
        regexp_replace(col("p_name"), " ", "_").as("snake"),
        lpad(col("p_size").cast("string"), 4, "0").as("size_padded"),
        length(col("p_name")).as("name_len"),
        regexp_replace(col("p_name"), "[aeiou]", "*").as("devoweled"),
        concat(col("p_brand"), lit("#"), col("p_type")).as("brand_type"),
        reverse(col("p_name")).as("rev"))
      .orderBy(col("p_partkey"))
  }

  /** Ordered collect (collect_list + sort, emitted as CSV string for
    * engine-neutral comparison). */
  val collectQuery: QuerySpec = QuerySpec.sql(
    "q_collect",
    """SELECT p_brand,
      |       array_to_string(array_agg(p_size ORDER BY p_size), ',') AS sizes_csv,
      |       count(*) AS n_sizes
      |FROM (SELECT DISTINCT p_brand, p_size FROM part)
      |GROUP BY 1 ORDER BY 1""".stripMargin) { (spark, dir) =>
    Tables.part(spark, dir)
      .select(col("p_brand"), col("p_size")).distinct()
      .groupBy(col("p_brand"))
      .agg(
        concat_ws(",", sort_array(collect_list(col("p_size")))).as("sizes_csv"),
        count(lit(1)).as("n_sizes"))
      .orderBy(col("p_brand"))
  }

  /** Explode / unnest: token frequency across the corpus. */
  val explodeQuery: QuerySpec = QuerySpec.sql(
    "q_explode",
    """SELECT word, count(*) AS n, count(DISTINCT doc_id) AS n_docs
      |FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents)
      |GROUP BY 1 ORDER BY 1""".stripMargin) { (spark, dir) =>
    Tables.documents(spark, dir)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
      .groupBy(col("word"))
      .agg(count(lit(1)).as("n"), countDistinct(col("doc_id")).as("n_docs"))
      .orderBy(col("word"))
  }

  /** Exact interpolated percentiles per group (Spark `percentile` ≙ DuckDB
    * `quantile_cont`). */
  val percentiles: QuerySpec = QuerySpec.sql(
    "q_percentiles",
    """SELECT l_returnflag,
      |       quantile_cont(l_quantity, 0.25) AS qty_p25,
      |       quantile_cont(l_quantity, 0.5) AS qty_p50,
      |       quantile_cont(l_quantity, 0.9) AS qty_p90,
      |       quantile_cont(l_extendedprice, 0.5) AS price_p50
      |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin) { (spark, dir) =>
    Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        percentile(col("l_quantity"), lit(0.25)).as("qty_p25"),
        percentile(col("l_quantity"), lit(0.5)).as("qty_p50"),
        percentile(col("l_quantity"), lit(0.9)).as("qty_p90"),
        percentile(col("l_extendedprice"), lit(0.5)).as("price_p50"))
      .orderBy(col("l_returnflag"))
  }

  /** Date/interval arithmetic: add/sub days, day difference, truncation,
    * last_day, extract epoch. */
  val dateArith: QuerySpec = QuerySpec.sql(
    "q_date_arith",
    """SELECT o_orderkey,
      |       CAST(CAST(o_orderdate AS DATE) + INTERVAL 30 DAY AS DATE) AS due_date_d,
      |       datediff('day', TIMESTAMP '1995-01-01', o_orderdate) AS days_since_epoch_start,
      |       CAST(date_trunc('month', o_orderdate) AS DATE) AS order_month,
      |       last_day(CAST(o_orderdate AS DATE)) AS month_end,
      |       CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s
      |FROM orders ORDER BY o_orderkey""".stripMargin) { (spark, dir) =>
    Tables.orders(spark, dir)
      .select(
        col("o_orderkey"),
        date_add(col("o_orderdate").cast("date"), 30).as("due_date_d"),
        datediff(col("o_orderdate"), lit("1995-01-01").cast("timestamp")).as("days_since_epoch_start"),
        date_trunc("month", col("o_orderdate")).cast("date").as("order_month"),
        last_day(col("o_orderdate").cast("date")).as("month_end"),
        unix_timestamp(col("o_orderdate")).as("epoch_s"))
      .orderBy(col("o_orderkey"))
  }

  /** Null-handling scalar functions. */
  val nullFuncs: QuerySpec = QuerySpec.sql(
    "q_null_funcs",
    """SELECT c_custkey,
      |       coalesce(nullif(c_mktsegment, 'BUILDING'), 'IS_BUILDING') AS seg_or_marker,
      |       CASE WHEN c_acctbal < 0 THEN NULL ELSE c_acctbal END AS pos_bal,
      |       coalesce(CASE WHEN c_acctbal < 0 THEN NULL ELSE c_acctbal END, 0.0) AS pos_bal_or_zero,
      |       (c_acctbal IS NULL) AS bal_is_null,
      |       ifnull(NULL, c_name) AS name_filled
      |FROM customer ORDER BY c_custkey""".stripMargin) { (spark, dir) =>
    Tables.customer(spark, dir)
      .select(
        col("c_custkey"),
        coalesce(nullif(col("c_mktsegment"), lit("BUILDING")), lit("IS_BUILDING")).as("seg_or_marker"),
        when(col("c_acctbal") < 0, lit(null)).otherwise(col("c_acctbal")).as("pos_bal"),
        coalesce(when(col("c_acctbal") < 0, lit(null)).otherwise(col("c_acctbal")), lit(0.0)).as("pos_bal_or_zero"),
        col("c_acctbal").isNull.as("bal_is_null"),
        expr("ifnull(NULL, c_name)").as("name_filled"))
      .orderBy(col("c_custkey"))
  }

  /** Explicit GROUPING SETS (beyond rollup/cube): chosen level combinations
    * only, with GROUPING() disambiguation of the null rows. */
  val groupingSets: QuerySpec = QuerySpec.sql(
    "q_grouping_sets",
    """SELECT yr, l_returnflag,
      |       CAST(grouping(yr) AS INTEGER) AS g_yr,
      |       CAST(grouping(l_returnflag) AS INTEGER) AS g_flag,
      |       sum(l_quantity) AS sum_qty
      |FROM (SELECT CAST(year(l_shipdate) AS INTEGER) AS yr, l_returnflag, l_quantity FROM lineitem)
      |GROUP BY GROUPING SETS ((yr), (l_returnflag))
      |ORDER BY yr NULLS FIRST, l_returnflag NULLS FIRST""".stripMargin) { (spark, dir) =>
    Tables.lineitem(spark, dir)
      .select(
        year(col("l_shipdate")).as("yr"),
        col("l_returnflag"), col("l_quantity"))
      .createOrReplaceTempView("graft_gs_lineitem")
    spark.sql(
      """SELECT yr, l_returnflag,
        |       CAST(grouping(yr) AS INT) AS g_yr,
        |       CAST(grouping(l_returnflag) AS INT) AS g_flag,
        |       sum(l_quantity) AS sum_qty
        |FROM graft_gs_lineitem
        |GROUP BY GROUPING SETS ((yr), (l_returnflag))
        |ORDER BY yr ASC NULLS FIRST, l_returnflag ASC NULLS FIRST""".stripMargin)
  }

  /** Extended window-function suite beyond `q_window_funcs`: ntile,
    * percent_rank, cume_dist, first/last/nth_value with explicit frames,
    * and lead with default. Ordering key (o_orderdate, o_orderkey) is
    * unique, so every function is deterministic. */
  val windowFuncs2: QuerySpec = QuerySpec.sql(
    "q_window_funcs2",
    """SELECT o_orderkey,
      |       o_orderpriority,
      |       ntile(4) OVER w AS quartile,
      |       percent_rank() OVER w AS pct_rank,
      |       cume_dist() OVER w AS cume,
      |       first_value(o_orderkey) OVER w AS first_key,
      |       last_value(o_orderkey) OVER
      |         (PARTITION BY o_orderpriority ORDER BY o_orderdate, o_orderkey
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_so_far,
      |       nth_value(o_orderkey, 2) OVER
      |         (PARTITION BY o_orderpriority ORDER BY o_orderdate, o_orderkey
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS second_key,
      |       lead(o_orderkey, 1, -1) OVER w AS next_key
      |FROM orders
      |WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_orderdate, o_orderkey)
      |ORDER BY o_orderkey""".stripMargin) { (spark, dir) =>
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.orders(spark, dir)
      .select(
        col("o_orderkey"),
        col("o_orderpriority"),
        ntile(4).over(w).as("quartile"),
        percent_rank().over(w).as("pct_rank"),
        cume_dist().over(w).as("cume"),
        first(col("o_orderkey")).over(w).as("first_key"),
        last(col("o_orderkey")).over(wRun).as("last_so_far"),
        nth_value(col("o_orderkey"), 2).over(wRun).as("second_key"),
        lead(col("o_orderkey"), 1, -1).over(w).as("next_key"))
      .orderBy(col("o_orderkey"))
  }

  /** Equi-depth histogram / feature discretization (the ML-preprocessing
    * binning primitive), sketch-first: the PRIMARY boundary pass is
    * `percentile_approx` — a Greenwald-Khanna rank sketch with
    * O(accuracy·log N) memory per buffer (rank error ≤ N/accuracy) — the
    * only boundary pass that survives 100 TB. An EXACT interpolated
    * boundary set rides along as the DRIFT COMPANION: it anchors the
    * DuckDB oracle (bin/n/lo/hi below are exact-boundary bins, matched
    * hash-for-hash) and makes sketch-vs-exact drift visible as the
    * `sketch_drift_ok` column — true iff each sketch-boundary bin's count
    * is within the 2·N/accuracy GK guarantee of the exact bin's count
    * (DuckDB asserts the literal TRUE, so a sketch outside its error bound
    * goes red).
    *
    * The exact boundaries come from a SKETCH-GUIDED REFINE, not a full
    * exact-percentile aggregate (which buffers EVERY value per partial —
    * the superlinear term the r16 scale probe flagged at 5.42×/10×):
    * pass 1 additionally probes the sketch at q±2ε, which by the GK rank
    * guarantee brackets each true order statistic inside a value window
    * holding ≤ ~4εN rows; pass 2 counts rows below each window; pass 3
    * ranks ONLY the window members (row_number per decile) and picks the
    * two order statistics each interpolation needs. Exactness is
    * preserved — the picked values ARE the true order statistics, and
    * the interpolation mirrors Spark's `percentile` formula
    * bit-for-bit — while the heavy pass touches ~1% of rows instead of
    * buffering all of them. Tiny inputs (< 10k rows, where the GK
    * bracket math needs N ≥ 2/ε) keep the plain exact aggregate.
    * Binning itself is a codegen'd array-filter HOF over driver-literal
    * bounds — no per-row join. */
  val equidepthHist: QuerySpec = QuerySpec.sql(
    "q_equidepth_hist",
    """WITH b AS (
      |  SELECT quantile_cont(l_extendedprice,
      |           [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]) AS bounds
      |  FROM lineitem)
      |SELECT CAST(len(list_filter(b.bounds, x -> x <= l.l_extendedprice)) AS INTEGER) AS bin,
      |       count(*) AS n,
      |       min(l.l_extendedprice) AS lo,
      |       max(l.l_extendedprice) AS hi,
      |       TRUE AS sketch_drift_ok
      |FROM lineitem l CROSS JOIN b
      |GROUP BY 1 ORDER BY 1""".stripMargin) { (spark, dir) =>
    val deciles = (1 to 9).map(_ / 10.0)
    val accuracy = 1000 // GK sketch: rank error ≤ N/accuracy
    val li = Tables.lineitem(spark, dir).select(col("l_extendedprice").as("x"))
    // PASS 1 — the sketch (primary, production) boundary pass, extended
    // with the refine's window probes at q ± 2ε: by the GK guarantee the
    // probed values bracket every true order statistic the exact
    // interpolation needs
    val eps = 1.0 / accuracy
    val delta = 2 * eps
    val loQs = deciles.map(q => math.max(0.0, q - delta))
    val hiQs = deciles.map(q => math.min(1.0, q + delta))
    def timed[A](tag: String)(body: => A): A = {
      val t0 = System.nanoTime(); val r = body
      if (sys.env.contains("SPARK_GRAFT_DEBUG"))
        System.err.println(f"[edh] $tag ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val probe = timed("pass1 sketch+probes")(li.agg(
      percentile_approx(col("x"), typedLit(deciles ++ loQs ++ hiQs),
        lit(accuracy)).as("p"),
      count(lit(1)).as("n_total")).head)
    val p = probe.getSeq[Double](0)
    val nTotal = probe.getLong(1)
    val sbounds = p.slice(0, 9)
    val wlo = p.slice(9, 18)
    val whi = p.slice(18, 27)
    val ebounds: Seq[Double] =
      if (nTotal < 10000) {
        // tiny input: the GK bracket needs N ≥ 2/ε; the plain exact
        // aggregate is cheap here anyway
        li.agg(percentile(col("x"), typedLit(deciles)).as("e"))
          .head.getSeq[Double](0)
      } else {
        // PASS 2 — absolute rank offset of each window (rows below it)
        val belowAggs = deciles.indices.map(i =>
          sum(when(col("x") < lit(wlo(i)), 1L).otherwise(0L)).as(s"b$i"))
        val bRow = timed("pass2 below-counts")(
          li.agg(belowAggs.head, belowAggs.tail: _*).head)
        val below = deciles.indices.map(bRow.getLong)
        // PASS 3 — rank ONLY the window members (≤ ~4εN rows per decile)
        // and pick the two order statistics each interpolation reads;
        // absolute 1-based rank of a member = below(i) + its row_number
        val j = deciles.map(q => math.floor((nTotal - 1) * q).toLong)
        val memb = array(deciles.indices.map(i =>
          when(col("x") >= lit(wlo(i)) && col("x") <= lit(whi(i)),
            struct(lit(i).as("i"), col("x").as("x")))): _*)
        val winDf = li
          .select(explode(filter(memb, c => c.isNotNull)).as("r"))
          .select(col("r.i").as("i"), col("r.x").as("x"))
        import org.apache.spark.sql.expressions.Window
        val ranked = winDf.withColumn("rn", row_number()
          .over(Window.partitionBy(col("i")).orderBy(col("x"))))
        val want: Map[Int, Seq[Long]] = deciles.indices.map { i =>
          i -> Seq(j(i) + 1 - below(i), j(i) + 2 - below(i))
        }.toMap
        val cond = want.map { case (i, rns) =>
          col("i") === lit(i) && col("rn").cast("long").isin(rns: _*)
        }.reduce(_ || _)
        val picked: Map[(Int, Long), Double] = timed("pass3 window-refine")(
          ranked.filter(cond)
          .collect() // ≤ 2 rows per decile
          .map(r => (r.getInt(0), r.getInt(2).toLong) -> r.getDouble(1)).toMap)
        deciles.indices.map { i =>
          def at(k: Long): Double = picked.getOrElse((i, k + 1 - below(i)),
            throw new IllegalStateException(
              s"equi-depth refine: window for decile ${i + 1} missed order " +
                s"statistic $k (below=${below(i)}) — GK bracket violated"))
          // Spark's exact `percentile` interpolation, mirrored
          // bit-for-bit so the refined boundaries hash-match the oracle
          val pos = (nTotal - 1) * deciles(i)
          val lower = math.floor(pos).toLong
          val higher = math.ceil(pos).toLong
          if (lower == higher) at(lower)
          else at(lower) * (higher - pos) + at(higher) * (pos - lower)
        }
      }
    val binned = li.select(
      size(filter(typedLit(ebounds), b => b <= col("x"))).as("bin"),
      size(filter(typedLit(sbounds), b => b <= col("x"))).as("sbin"),
      col("x"), lit(nTotal).as("n_total"))
    // both histograms from ONE scan + ONE shuffle: each row contributes a
    // record under its exact-bin key and one under its sketch-bin key
    // (map-side partial aggregation collapses the 2× fan-out to ≤ 2·bins
    // groups before the exchange); a DAG split (grouping sets / self-join)
    // would recompute the whole binning pipeline per branch
    val tagged = binned
      .select(explode(array(
        struct(col("bin").as("key"), lit(0).as("kind"), col("x"), col("n_total")),
        struct(col("sbin").as("key"), lit(1).as("kind"), col("x"), col("n_total")))).as("r"))
      .select(col("r.key").as("bin"), col("r.kind"), col("r.x"), col("r.n_total"))
    driftBins(tagged, accuracy)
  }

  /** Drift-checked per-bin aggregation stage of [[equidepthHist]], split out
    * so the straddle case is directly testable. Input is the tagged 2×
    * fan-out `(bin, kind 0=exact/1=sketch, x, n_total)`.
    *
    * A bin key only the SKETCH binning produced (sketch and exact
    * boundaries straddling a bin edge while exact bounds carry duplicates)
    * has zero exact rows — it must still be drift-checked, with its
    * `n_sketch` bounded against 0, or the sketch can silently drift in
    * exactly the bins the check skips. Such a bin can't surface as its own
    * output row (the DuckDB oracle can only enumerate exact bins), so its
    * verdict folds into EVERY row's flag via a global AND — computed as an
    * unpartitioned windowed aggregate over the tiny (≤ 2·bins rows)
    * post-shuffle bin table, NOT a second aggregate branch: a DAG split
    * here re-executed the whole upstream binning pipeline (including the
    * exact-percentile companion that buffers every value) when exchange
    * reuse didn't kick in — measured 2× wall on the sf0.1 bench. */
  def driftBins(tagged: org.apache.spark.sql.DataFrame, accuracy: Int): org.apache.spark.sql.DataFrame = {
    val perBin = tagged.groupBy(col("bin"))
      .agg(
        sum(when(col("kind") === 0, 1L).otherwise(0L)).as("n"),
        min(when(col("kind") === 0, col("x"))).as("lo"),
        max(when(col("kind") === 0, col("x"))).as("hi"),
        sum(when(col("kind") === 1, 1L).otherwise(0L)).as("n_sketch"),
        first(col("n_total")).as("n_total"))
      .select(col("bin"), col("n"), col("lo"), col("hi"),
        (abs(col("n_sketch") - col("n")).cast("double")
          <= lit(2.0) * col("n_total") / accuracy + 2).as("bin_ok"))
    perBin
      .withColumn("all_ok", bool_and(col("bin_ok"))
        .over(org.apache.spark.sql.expressions.Window.partitionBy()))
      .filter(col("n") > 0)
      .select(col("bin"), col("n"), col("lo"), col("hi"),
        (col("bin_ok") && col("all_ok")).as("sketch_drift_ok"))
      .orderBy(col("bin"))
  }

  /** Feature scaling (ML preprocessing): z-score standardization and
    * min-max normalization in one pass — a 1-row moments/extrema aggregate
    * broadcast back over the table (the same two-pass shape as the
    * histogram; no shuffle of the data itself). Variance comes from the
    * moment sums (Σx, Σx²) rather than a streaming stddev: the sums are
    * exact integer-valued doubles (quantities are integral), so the result
    * is associative — order- and parallelism-independent — and the scalar
    * math replays identically in the oracle engine. Micro-unit floors make
    * the output integers. */
  val featureScale: QuerySpec = QuerySpec.sql(
    "q_feature_scale",
    """WITH s AS (SELECT sum(l_quantity) AS s1,
      |                  sum(l_quantity * l_quantity) AS s2,
      |                  CAST(count(*) AS DOUBLE) AS n,
      |                  min(l_extendedprice) AS mnp,
      |                  max(l_extendedprice) AS mxp
      |           FROM lineitem)
      |SELECT l_orderkey, l_linenumber,
      |       CAST(floor((l_quantity - s1 / n)
      |                  / sqrt((s2 - s1 * s1 / n) / (n - 1)) * 1000000 + 0.5) AS BIGINT)
      |         AS z_qty_micro,
      |       CAST(floor((l_extendedprice - mnp) / (mxp - mnp) * 1000000 + 0.5) AS BIGINT)
      |         AS minmax_price_micro
      |FROM lineitem, s
      |ORDER BY 1, 2""".stripMargin) { (spark, dir) =>
    val li = Tables.lineitem(spark, dir)
    val stats = li.agg(
      sum(col("l_quantity")).as("s1"),
      sum(col("l_quantity") * col("l_quantity")).as("s2"),
      count(lit(1)).cast("double").as("n"),
      min(col("l_extendedprice")).as("mnp"),
      max(col("l_extendedprice")).as("mxp"))
    li.crossJoin(broadcast(stats))
      .select(
        col("l_orderkey"), col("l_linenumber"),
        floor((col("l_quantity") - col("s1") / col("n"))
          / sqrt((col("s2") - col("s1") * col("s1") / col("n")) / (col("n") - 1)) * 1000000 + 0.5)
          .cast("long").as("z_qty_micro"),
        floor((col("l_extendedprice") - col("mnp")) / (col("mxp") - col("mnp")) * 1000000 + 0.5)
          .cast("long").as("minmax_price_micro"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))
  }

  /** KMV SKETCH SET OPERATIONS (Beyer et al. 2007, "On Synopses for
    * Distinct-Value Estimation Under Multiset Operations") — the reason
    * bottom-k sketches beat HLL when you need more than cardinalities:
    * two KMV sketches MERGE into a sketch of the union (k smallest of
    * the combined hash sets), and the merged sketch doubles as a uniform
    * SAMPLE of the union, so |A∩B| estimates as (members of both ∕ k) ×
    * est(|A∪B|). Built here on md5-derived 32-bit uniforms (the engine's
    * cross-engine hash), so the DuckDB oracle replays every hash, every
    * k-th order statistic, and every integer-division estimate EXACTLY —
    * no invariant-style tolerance row needed. The k-smallest selections
    * are TakeOrdered (bounded heap per partition, k rows to the driver),
    * the membership probe is two broadcast semi-joins against the k-row
    * union sketch — at 100 TB nothing here scales with the data but the
    * distinct-scan itself. Exact counts ride along for reference (cheap
    * at test SF; production drops them). */
  val kmvSetOps: QuerySpec = QuerySpec.sql(
    "q_kmv_setops",
    """WITH a AS (SELECT DISTINCT o_custkey AS v FROM orders
      |           WHERE year(o_orderdate) = 1996),
      |b AS (SELECT DISTINCT o_custkey AS v FROM orders
      |      WHERE year(o_orderdate) = 1997),
      |ha AS (SELECT v, CAST(CAST('0x' || substring(md5('kmv-' || v), 1, 8) AS UBIGINT)
      |                 AS BIGINT) + 1 AS h FROM a),
      |hb AS (SELECT v, CAST(CAST('0x' || substring(md5('kmv-' || v), 1, 8) AS UBIGINT)
      |                 AS BIGINT) + 1 AS h FROM b),
      |ska AS (SELECT v, h FROM ha ORDER BY h LIMIT 256),
      |skb AS (SELECT v, h FROM hb ORDER BY h LIMIT 256),
      |sku AS (SELECT v, h FROM (SELECT v, h FROM ska UNION SELECT v, h FROM skb)
      |        ORDER BY h LIMIT 256),
      |est AS (
      |  SELECT (SELECT 255 * 4294967296 // max(h) FROM ska) AS est_a,
      |         (SELECT 255 * 4294967296 // max(h) FROM skb) AS est_b,
      |         (SELECT 255 * 4294967296 // max(h) FROM sku) AS est_union,
      |         (SELECT count(*) FROM sku
      |          WHERE v IN (SELECT v FROM a) AND v IN (SELECT v FROM b)) AS n_both),
      |x AS (SELECT (SELECT count(*) FROM a) AS exact_a,
      |             (SELECT count(*) FROM b) AS exact_b,
      |             (SELECT count(*) FROM a WHERE v IN (SELECT v FROM b)) AS exact_i)
      |SELECT CAST(est_a AS BIGINT) AS est_a, CAST(est_b AS BIGINT) AS est_b,
      |       CAST(est_union AS BIGINT) AS est_union,
      |       CAST(n_both AS BIGINT) AS n_both,
      |       CAST(n_both * est_union // 256 AS BIGINT) AS est_intersection,
      |       CAST(exact_a AS BIGINT) AS exact_a, CAST(exact_b AS BIGINT) AS exact_b,
      |       CAST(exact_i AS BIGINT) AS exact_intersection
      |FROM est, x""".stripMargin) { (spark, dir) =>
    val k = 256
    def side(yr: Int) = Tables.orders(spark, dir)
      .filter(year(col("o_orderdate")) === yr)
      .select(col("o_custkey").as("v")).distinct()
      .withColumn("h",
        conv(substring(md5(concat(lit("kmv-"), col("v").cast("string"))), 1, 8),
          16, 10).cast("long") + 1)
    val (a, b) = (side(1996).localCheckpoint(), side(1997).localCheckpoint())
    val ska = a.orderBy(col("h")).limit(k)
    val skb = b.orderBy(col("h")).limit(k)
    val sku = ska.select("v", "h").union(skb.select("v", "h")).distinct()
      .orderBy(col("h")).limit(k).localCheckpoint() // union sketch: k rows
    def est(sk: org.apache.spark.sql.DataFrame) =
      sk.agg(max(col("h"))).head.getLong(0) match {
        case hk => (k - 1).toLong * 4294967296L / hk
      }
    val nBoth = sku
      .join(a.select(col("v")), Seq("v"), "left_semi")
      .join(b.select(col("v")), Seq("v"), "left_semi")
      .count()
    val (estA, estB, estU) = (est(ska), est(skb), est(sku))
    val (exactA, exactB) = (a.count(), b.count())
    val exactI = a.select("v").join(b.select("v"), Seq("v"), "left_semi").count()
    import spark.implicits._
    Seq((estA, estB, estU, nBoth, nBoth * estU / k, exactA, exactB, exactI))
      .toDF("est_a", "est_b", "est_union", "n_both", "est_intersection",
        "exact_a", "exact_b", "exact_intersection")
  }

  /** ARRAY-FUNCTION surface parity: per order, the sorted line-number
    * array and the canonical array ops over it — size, membership, slice,
    * reverse, integer fold — every output deterministic (arrays are
    * sorted before anything order-sensitive, and serialized to strings in
    * the result so the driver's row comparator sorts them) and exactly
    * replayable in DuckDB's list vocabulary. One hash aggregation builds the arrays;
    * the per-array ops are codegen'd projections. */
  val arrayFuncs: QuerySpec = QuerySpec.sql(
    "q_array_funcs",
    """WITH a AS (
      |  SELECT l_orderkey, list_sort(list(l_linenumber)) AS lns
      |  FROM lineitem GROUP BY 1)
      |SELECT l_orderkey,
      |       array_to_string(lns, ',') AS lns,
      |       CAST(len(lns) AS INTEGER) AS n,
      |       list_contains(lns, 4) AS has4,
      |       array_to_string(list_slice(lns, 1, 2), ',') AS first2,
      |       array_to_string(list_reverse(lns), ',') AS rev,
      |       CAST(list_sum(lns) AS BIGINT) AS total
      |FROM a ORDER BY l_orderkey LIMIT 1000""".stripMargin) { (spark, dir) =>
    Tables.lineitem(spark, dir)
      .groupBy(col("l_orderkey"))
      .agg(sort_array(collect_list(col("l_linenumber"))).as("lns"))
      .select(col("l_orderkey"),
        array_join(col("lns"), ",").as("lns"),
        size(col("lns")).as("n"),
        array_contains(col("lns"), 4).as("has4"),
        array_join(slice(col("lns"), 1, 2), ",").as("first2"),
        array_join(reverse(col("lns")), ",").as("rev"),
        aggregate(col("lns"), lit(0L), (a, x) => a + x).as("total"))
      .orderBy(col("l_orderkey")).limit(1000)
  }

  /** MAP-TYPE surface: per line status, a returnflag→quantity map built
    * with `map_from_entries`, then the canonical map ops — keys, values,
    * point lookup, `map_concat` with a literal map, `transform_values`.
    * Maps are unordered, so every map-shaped output serializes through
    * its SORTED entry list; the oracle never builds a map at all — it
    * derives the same strings from the underlying pairs, which is exactly
    * the semantic contract (a map IS its key→value set). Quantities are
    * exact integers. */
  val mapFuncs: QuerySpec = QuerySpec.sql(
    "q_map_funcs",
    """WITH p AS (
      |  SELECT l_linestatus, l_returnflag,
      |         CAST(sum(l_quantity) AS BIGINT) AS qty
      |  FROM lineitem GROUP BY 1, 2),
      |m AS (
      |  SELECT l_linestatus,
      |         string_agg(l_returnflag || ':' || qty, ',' ORDER BY l_returnflag) AS entries,
      |         string_agg(l_returnflag, ',' ORDER BY l_returnflag) AS ks,
      |         CAST(count(*) AS INTEGER) AS n_keys,
      |         CAST(min(CASE WHEN l_returnflag = 'R' THEN qty END) AS BIGINT) AS r_qty,
      |         string_agg(l_returnflag || ':' || (qty * 2), ',' ORDER BY l_returnflag)
      |           AS doubled
      |  FROM p GROUP BY 1)
      |SELECT l_linestatus, entries, ks, n_keys, r_qty,
      |       entries || ',_unit:1' AS with_unit, doubled
      |FROM m ORDER BY 1""".stripMargin) { (spark, dir) =>
    val m = Tables.lineitem(spark, dir)
      .groupBy(col("l_linestatus"), col("l_returnflag"))
      .agg(sum(col("l_quantity")).cast("long").as("qty"))
      .groupBy(col("l_linestatus"))
      .agg(map_from_entries(sort_array(
        collect_list(struct(col("l_returnflag"), col("qty"))))).as("m"))
    def ser(mc: org.apache.spark.sql.Column) = array_join(
      transform(map_entries(mc), e =>
        concat(e.getField("key"), lit(":"), e.getField("value"))), ",")
    m.select(col("l_linestatus"),
        ser(col("m")).as("entries"),
        array_join(map_keys(col("m")), ",").as("ks"),
        size(col("m")).as("n_keys"),
        element_at(col("m"), "R").as("r_qty"),
        ser(map_concat(col("m"),
          map(lit("_unit"), lit(1L)))).as("with_unit"),
        ser(transform_values(col("m"), (_, v) => v * 2)).as("doubled"))
      .orderBy(col("l_linestatus"))
  }

  val all: Seq[QuerySpec] =
    Seq(pivotQuery, unpivotQuery, stringFuncs, collectQuery, explodeQuery,
      percentiles, dateArith, nullFuncs, groupingSets, windowFuncs2,
      equidepthHist, featureScale, kmvSetOps, arrayFuncs, mapFuncs)
}
