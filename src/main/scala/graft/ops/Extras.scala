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

  val all: Seq[QuerySpec] =
    Seq(pivotQuery, stringFuncs, collectQuery, explodeQuery, percentiles)
}
