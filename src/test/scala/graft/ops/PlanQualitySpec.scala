package graft.ops

import graft.TestSpark
import graft.model.Tables
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape regression tests — the properties that make these queries
  * survive a 100× scale-up: dimension joins stay broadcast, filters and
  * column pruning reach the parquet scan, partition pruning fires on
  * partitioned layouts, bucketed joins avoid the shuffle entirely.
  */
class PlanQualitySpec extends AnyFunSuite {
  import TestSpark.{spark, sf}

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("flagship enrichment join is a broadcast hash join") {
    val p = plan(Relational.salesTrends.fn(spark, sf))
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("SortMergeJoin"))
  }

  test("three-table flagship: one fact shuffle, broadcast dim, pruned scans") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // pin the 100 TB shape, not the tiny-data one: stop AQE from
      // broadcasting the orders side of the fact-to-fact join
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val df = Relational.salesBySegment.fn(spark, sf)
      val p = plan(df)
      assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
      // customer enrichment stays broadcast even with the threshold off
      // (explicit hint), so the joined fact stream never reshuffles
      assert(p.contains("BroadcastHashJoin"), s"customer dim not broadcast:\n$p")
      // exactly two hash exchanges: the l_orderkey fact join (both sides
      // count as one logical shuffle of the join) + the final tiny
      // (year, segment) aggregation; none keyed on the customer key
      assert(!p.contains("Exchange hashpartitioning(o_custkey") &&
        !p.contains("Exchange hashpartitioning(c_custkey"),
        s"joined fact reshuffled for the dimension join:\n$p")
      // all three scans pruned to exactly the used columns
      assert(p.contains("ReadSchema: struct<l_orderkey:bigint,l_extendedprice:double,l_discount:double>"))
      assert(p.contains("ReadSchema: struct<o_orderkey:bigint,o_custkey:bigint,o_orderdate:timestamp"))
      assert(p.contains("ReadSchema: struct<c_custkey:bigint,c_mktsegment:string>"))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("filters and projection push down to the parquet scan") {
    val p = plan(Tables.lineitem(spark, sf)
      .filter(col("l_shipdate") >= "1997-01-01")
      .select("l_orderkey", "l_extendedprice"))
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), GreaterThanOrEqual(l_shipdate"))
    // column pruning: scan schema is exactly the 3 needed columns
    assert(p.contains("ReadSchema: struct<l_orderkey:bigint,l_extendedprice:double,l_shipdate:timestamp"))
  }

  test("partition pruning fires on the Hive-partitioned sink read-back") {
    val out = s"${graft.Scratch.root}/prune_test"
    Tables.orders(spark, sf)
      .withColumn("o_year", year(col("o_orderdate")))
      .repartition(col("o_year"))
      .write.mode("overwrite").partitionBy("o_year").parquet(out)
    val p = plan(spark.read.parquet(out).filter(col("o_year") === 1997))
    assert(p.contains("PartitionFilters: [isnotnull(o_year"))
    assert(p.contains("(o_year"))
  }

  test("co-bucketed tables join without a shuffle exchange") {
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_customer")
    // in-memory catalog forgets tables between JVMs but the warehouse files
    // survive — remove them or saveAsTable fails with LOCATION_ALREADY_EXISTS
    Seq("b_orders", "b_customer").foreach { t =>
      val d = new java.io.File(s"/tmp/graft_warehouse/$t")
      if (d.exists()) {
        java.nio.file.Files.walk(d.toPath)
          .sorted(java.util.Comparator.reverseOrder())
          .forEach(p => java.nio.file.Files.delete(p))
      }
    }
    Tables.orders(spark, sf)
      .write.mode("overwrite").bucketBy(8, "o_custkey").sortBy("o_custkey")
      .saveAsTable("b_orders")
    Tables.customer(spark, sf)
      .write.mode("overwrite").bucketBy(8, "c_custkey").sortBy("c_custkey")
      .saveAsTable("b_customer")
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ path
      val j = spark.table("b_orders")
        .join(spark.table("b_customer"),
          col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n"))
      val p = plan(j)
      assert(p.contains("SortMergeJoin"))
      // the join itself reads pre-bucketed data: no hash-partitioning
      // exchange below the join (only the final aggregation shuffles)
      val joinPart = p.substring(p.indexOf("SortMergeJoin"))
      assert(!joinPart.contains("Exchange hashpartitioning"),
        s"bucketed join still shuffles:\n$joinPart")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("exact embedding near-dup plan is blocked equi-joins, never a cartesian") {
    val p = plan(graft.sim.Ann.embeddingNearDup.fn(spark, sf))
    assert(!p.contains("CartesianProduct"), s"all-pairs cartesian crept back:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin"), s"theta join crept back:\n$p")
    assert(p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin") ||
      p.contains("ShuffledHashJoin"))
  }

  test("LSH ANN multi-probe is a bucket equi-join, not a nested-loop scan") {
    val p = plan(graft.sim.Ann.annLsh.fn(spark, sf))
    assert(!p.contains("BroadcastNestedLoopJoin"), s"theta join crept back:\n$p")
    assert(!p.contains("CartesianProduct"))
    assert(p.contains("BroadcastHashJoin"))
  }

  test("registered bucketed join reads pre-bucketed data without a shuffle") {
    val p = plan(graft.sources.Sources.bucketedJoin.fn(spark, sf))
    assert(p.contains("SortMergeJoin"))
    val joinPart = p.substring(p.indexOf("SortMergeJoin"))
    assert(!joinPart.contains("Exchange hashpartitioning"),
      s"bucketed join still shuffles:\n$joinPart")
  }

  test("doc packing never runs a single-partition window over the corpus") {
    import org.apache.spark.sql.execution.window.WindowExec
    import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
    val p = graft.text.CorpusPipeline.docPacking.fn(spark, sf).queryExecution.sparkPlan
    val windows = p.collect { case w: WindowExec => w }
    assert(windows.nonEmpty)
    // the corpus-sized cumsum must be partitioned (by the contiguous batch key)
    assert(windows.exists(_.partitionSpec.nonEmpty),
      "per-batch cumsum lost its partitioning")
    // any unpartitioned window may only see already-aggregated input (the
    // one-row-per-batch totals), never the raw documents scan
    windows.filter(_.partitionSpec.isEmpty).foreach { w =>
      assert(w.child.collect { case a: BaseAggregateExec => a }.nonEmpty,
        s"single-partition Window over unreduced input:\n$w")
    }
    // the offsets joins are declared shuffle-safe (never an unconditional
    // broadcast of a corpus-proportional side): the declared plan is SHJ —
    // the probe side reuses the phase-1 window's hash partitioning, and
    // only AQE may demote to broadcast at runtime when genuinely small
    val ps = p.toString
    assert(ps.contains("ShuffledHashJoin") && !ps.contains("BroadcastHashJoin"),
      s"offsets join not shuffle-declared:\n$ps")
  }

  test("dynamic partition pruning fires on a partitioned fact x selective dim join") {
    import spark.implicits._
    val out = s"${graft.Scratch.root}/dpp_fact"
    Tables.orders(spark, sf)
      .withColumn("o_year", year(col("o_orderdate")))
      .repartition(col("o_year"))
      .write.mode("overwrite").partitionBy("o_year").parquet(out)
    val fact = spark.read.parquet(out)
    // selective parquet-backed dim (a LocalRelation's filter constant-folds
    // away and DPP sees no selective predicate): only 1995/1996 survive —
    // DPP should turn that into a runtime PartitionFilter on the fact scan
    // instead of reading all partitions
    val dim = Tables.orders(spark, sf)
      .filter(col("o_orderdate") >= "1995-01-01" && col("o_orderdate") < "1997-01-01")
      .select(year(col("o_orderdate")).as("d_year"))
      .distinct()
    val joined = fact.join(dim, col("o_year") === col("d_year"))
      .groupBy(col("d_year")).agg(count(lit(1)).as("n"))
    val p = plan(joined)
    assert(p.contains("dynamicpruningexpression"),
      s"no dynamic partition pruning on the fact scan:\n$p")
    assert(joined.collect().map(_.getLong(1)).sum > 0)
  }

  test("bloom-filter join pruning guards the probe side below the join's exchange") {
    val p = plan(Relational.bloomJoin.fn(spark, sf))
    // physical plan prints the guard as might_contain(Subquery …)
    assert(p.contains("might_contain("), s"bloom pruning rule did not fire:\n$p")
    assert(p.contains("bloom_filter_agg("), s"bloom build subquery missing:\n$p")
    assert(p.contains("SortMergeJoin"))
    // the guard must sit BENEATH the probe side's shuffle exchange
    // (pre-shuffle pruning), not above the join
    val probeExchange = p.indexOf("Exchange hashpartitioning(l_orderkey")
    assert(probeExchange >= 0, s"probe-side exchange missing:\n$p")
    assert(p.substring(probeExchange).contains("might_contain("),
      s"might_contain not below the probe exchange:\n$p")
  }

  test("ANALYZE column statistics flip a selective dim join to broadcast, no hint") {
    import org.apache.spark.sql.catalyst.plans.logical.Join
    def recreateDim(): Unit = {
      spark.sql("DROP TABLE IF EXISTS stats_dim")
      val d = new java.io.File("/tmp/graft_warehouse/stats_dim")
      if (d.exists()) {
        java.nio.file.Files.walk(d.toPath)
          .sorted(java.util.Comparator.reverseOrder())
          .forEach(p => java.nio.file.Files.delete(p))
      }
      Tables.orders(spark, sf).write.saveAsTable("stats_dim")
    }
    recreateDim()
    val prevCbo = spark.conf.get("spark.sql.cbo.enabled")
    val prevT = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.cbo.enabled", "true")
      def joined = Tables.lineitem(spark, sf).join(
        spark.table("stats_dim")
          .filter(col("o_orderpriority") === "1-URGENT" && col("o_orderstatus") === "F")
          .select("o_orderkey"),
        col("l_orderkey") === col("o_orderkey"))
      def dimEstimate: BigInt = joined.queryExecution.optimizedPlan
        .collectFirst { case j: Join => j.right.stats.sizeInBytes }.get
      val noStats = dimEstimate
      spark.sql("ANALYZE TABLE stats_dim COMPUTE STATISTICS FOR COLUMNS o_orderkey, o_orderpriority, o_orderstatus")
      val withStats = dimEstimate
      // column stats let FilterEstimation apply the predicates' selectivity
      // (and Project the true column width) instead of the raw scan size
      assert(withStats < noStats,
        s"column stats did not shrink the dim estimate: $noStats -> $withStats")
      // threshold between the two estimates: the planner's choice now
      // depends ONLY on whether statistics exist
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", ((noStats + withStats) / 2).toString)
      assert(plan(joined).contains("BroadcastHashJoin"),
        s"analyzed stats did not flip the join to broadcast:\n${plan(joined)}")
      recreateDim() // wipes the stats; same threshold, same query
      assert(!plan(joined).contains("BroadcastHashJoin"),
        s"join broadcast even without stats — threshold proves nothing:\n${plan(joined)}")
    } finally {
      spark.conf.set("spark.sql.cbo.enabled", prevCbo)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevT)
      spark.sql("DROP TABLE IF EXISTS stats_dim")
    }
  }

  test("SCD2 reuses one o_custkey shuffle for both windows") {
    val p = plan(graft.ops.Scd.scd2.fn(spark, sf))
    val custkeyExchanges = "Exchange hashpartitioning\\(o_custkey".r
      .findAllIn(p).size
    assert(custkeyExchanges === 1,
      s"expected the lag and lead windows to share one shuffle, got $custkeyExchanges:\n$p")
  }

  test("gap fill keeps the dims broadcast and never goes cartesian") {
    val p = plan(Temporal.gapFill.fn(spark, sf))
    assert(!p.contains("CartesianProduct"), s"cartesian in gap-fill plan:\n$p")
    assert(p.contains("BroadcastHashJoin"), s"dims not broadcast:\n$p")
    assert(!p.contains("Exchange hashpartitioning(c_custkey") &&
      !p.contains("Exchange hashpartitioning(c_nationkey"),
      s"fact reshuffled for a dimension join:\n$p")
  }

  test("rolling range window shuffles once, on user_id") {
    val p = plan(Temporal.rollingWindow.fn(spark, sf))
    val hashExchanges = "Exchange hashpartitioning\\(".r.findAllIn(p).size
    assert(hashExchanges === 1, s"expected exactly the user_id window shuffle:\n$p")
    assert(!p.contains("Window  ") || p.contains("hashpartitioning(user_id"),
      s"window not partitioned by user_id:\n$p")
  }

  test("quality deciles rank on a range partitioning, never a corpus-wide single partition") {
    val df = graft.text.TrainingPrep.qualityDeciles.fn(spark, sf)
    val p = plan(df)
    assert(p.contains("Exchange rangepartitioning"),
      s"two-phase rank lost its range repartition:\n$p")
    // the only single-partition work allowed is the 16-row offsets table;
    // no Exchange SinglePartition may take the full documents scan as input
    val firstSingle = p.indexOf("Exchange SinglePartition")
    if (firstSingle >= 0) {
      val upstream = p.substring(firstSingle)
      assert(upstream.contains("HashAggregate") || upstream.contains("pn"),
        s"single-partition exchange not over the bounded offsets table:\n$p")
    }
  }

  test("clustered layout read-back pushes the date filter to the scan") {
    val p = plan(graft.sources.Sources.clusteredLayout.fn(spark, sf))
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), GreaterThanOrEqual(l_shipdate"),
      s"date filter did not reach the clustered parquet scan:\n$p")
  }

  test("pagerank step has no cartesian product and prunes the fact scans") {
    val p = plan(graft.graph.Graph.pageRankStep.fn(spark, sf))
    assert(!p.contains("CartesianProduct"), s"cartesian in pagerank plan:\n$p")
    assert(p.contains("ReadSchema: struct<o_orderkey:bigint,o_custkey:bigint>"),
      s"orders scan not pruned to join columns:\n$p")
    assert(p.contains("ReadSchema: struct<l_orderkey:bigint,l_suppkey:bigint>"),
      s"lineitem scan not pruned to join columns:\n$p")
  }

  test("chunk dedup scan reads only (doc_id, text); hash shuffle carries no text") {
    val p = plan(graft.dedup.Dedup.chunkDedup.fn(spark, sf))
    assert(p.contains("ReadSchema: struct<doc_id:bigint,text:string>"),
      s"documents scan not pruned to the two used columns:\n$p")
    assert(!p.contains("CartesianProduct"))
  }

  test("PIT join is a key equi-join (interval as post-filter), never a cartesian") {
    val p = plan(Scd.scd2Pit.fn(spark, sf))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"PIT join degenerated to an all-pairs plan:\n$p")
    // orders scan pruned to exactly the fact columns the query touches
    assert(p.contains("ReadSchema: struct<o_orderkey:bigint,o_custkey:bigint,o_totalprice:double,o_orderdate:timestamp"),
      s"orders scan not pruned:\n$p")
  }

  test("Kneser-Ney scoring joins stay equi-joins against bounded model tables") {
    val p = plan(graft.text.TrainingPrep.lmKneserNey.fn(spark, sf))
    assert(!p.contains("CartesianProduct"), s"cartesian in KN plan:\n$p")
    assert(p.contains("ReadSchema: struct<doc_id:bigint,text:string>"),
      s"documents scan not pruned:\n$p")
  }

  test("bucketed aggregation runs with zero exchanges") {
    val agg = graft.sources.Sources.bucketedLineitem(spark, sf)
      .groupBy(col("l_suppkey"))
      .agg(count(lit(1)).as("n"))
    val p = plan(agg)
    assert(!p.contains("Exchange hashpartitioning"),
      s"bucketed groupBy still shuffled:\n$p")
    assert(p.contains("Bucketed: true"), s"scan did not use buckets:\n$p")
  }

  test("star join: one fact shuffle, every dimension hop broadcast") {
    val p = plan(Relational.starJoin.fn(spark, sf))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
    // the enriched fact never reshuffles on a dimension key
    assert(!p.contains("Exchange hashpartitioning(o_custkey") &&
      !p.contains("Exchange hashpartitioning(c_custkey") &&
      !p.contains("Exchange hashpartitioning(c_nationkey") &&
      !p.contains("Exchange hashpartitioning(n_regionkey"),
      s"dimension hop reshuffled the fact stream:\n$p")
    assert(p.contains("BroadcastHashJoin"), s"no broadcast dim join:\n$p")
  }

  test("dpp join: fact scan carries a runtime dynamic-pruning partition filter") {
    val p = plan(graft.sources.Sources.dppJoin.fn(spark, sf))
    assert(p.contains("dynamicpruning"),
      s"no dynamic partition pruning on the fact scan:\n$p")
    assert(p.contains("PartitionFilters"), s"fact scan not partition-filtered:\n$p")
  }

  test("profile aggregates push into the parquet scan (footer-only answer)") {
    val prevV1 = spark.conf.get("spark.sql.sources.useV1SourceList")
    val prevPush = spark.conf.get("spark.sql.parquet.aggregatePushdown")
    spark.conf.set("spark.sql.sources.useV1SourceList", "")
    spark.conf.set("spark.sql.parquet.aggregatePushdown", "true")
    try {
      val df = spark.read.parquet(s"$sf/lineitem.parquet")
        .agg(expr("count(*)"), min(col("l_extendedprice")), max(col("l_extendedprice")))
      val p = df.queryExecution.executedPlan.toString
      assert(p.contains("PushedAggregation: [COUNT(*), MIN(l_extendedprice), MAX(l_extendedprice)]"),
        s"aggregate not pushed to the scan:\n$p")
    } finally {
      spark.conf.set("spark.sql.sources.useV1SourceList", prevV1)
      spark.conf.set("spark.sql.parquet.aggregatePushdown", prevPush)
    }
  }

  test("salted aggregation equals plain aggregation") {
    import spark.implicits._
    val salted = Skew.saltedAggQuery.fn(spark, sf)
      .as[(String, Double, Long)].collect().toSet
    val plain = Tables.lineitem(spark, sf)
      .groupBy(col("l_returnflag"))
      .agg(sum(col("l_quantity")).as("sum_qty"), count(lit(1)).as("n"))
      .as[(String, Double, Long)].collect().toSet
    assert(salted === plain)
  }
}
