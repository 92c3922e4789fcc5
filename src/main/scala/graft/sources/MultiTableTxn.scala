package graft.sources

import graft.QuerySpec
import graft.model.Tables
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** MULTI-TABLE TRANSACTIONS — the one transactional surface a
  * single-table manifest format lacks: commit a write to SEVERAL tables
  * so that readers eventually see either ALL tables advanced or NONE,
  * even across crashes. The single-table verbs get atomicity from one
  * rename; a cross-table commit can't (two renames can't be made one),
  * so this uses the standard two-phase shape every log-coordinated
  * format uses:
  *
  *   1. PREPARE — for each table, stage the new snapshot's data files
  *      and write its would-be manifest under a TEMP name (invisible to
  *      readers, exactly like a half-written single-table commit).
  *   2. COMMIT POINT — write ONE transaction record
  *      (`<coordinator>/_txn/<id>.txn`, atomic rename) listing every
  *      (table, version, temp manifest). This rename IS the decision:
  *      before it the transaction never happened; after it the
  *      transaction is durable even if nothing else runs.
  *   3. FINALIZE — rename each temp manifest into place (the ordinary
  *      per-table commit rename). Idempotent: a finalize that finds the
  *      real manifest already present (or the temp gone) skips.
  *
  * Crash anywhere before 2: no reader ever sees anything — the undecided
  * temp manifests are [[cleanup]]'s debris (it checks the coordinator log
  * before deleting), after which the staged files fall to
  * [[ManifestTable.removeOrphans]]. removeOrphans alone never destroys a
  * DECIDED transaction: it treats files named by any remaining `.txn-*`
  * temp manifest as referenced.
  * Crash between 2 and 3: the txn is decided but unfinalized —
  * [[recover]] scans the coordinator log and completes step 3, which any
  * reader/writer runs before trusting multi-table consistency (the
  * Iceberg/Delta "commit then invisibly retry metadata" discipline).
  * Readers of a SINGLE table keep their usual snapshot isolation
  * throughout; the cross-table guarantee is "both or neither, after
  * recovery", which is exactly what a coordinator log can promise on a
  * rename-atomic store. At 100 TB the txn record is bytes, PREPARE is
  * the ordinary distributed writes, and FINALIZE is one rename per
  * table. */
object MultiTableTxn {

  /** One table's contribution to a transaction. */
  sealed trait TxnWrite { def base: String }
  /** Append `df` partitioned by `partCol`. */
  final case class TxnAppend(base: String, df: DataFrame, partCol: String)
      extends TxnWrite
  /** MERGE `updates` on `keyCol` — PREPARE stages the touched-partition
    * copy-on-write rewrite ([[ManifestTable.prepareMergeEntries]]); the
    * rewrite becomes visible only when the coordinator record decides the
    * transaction, so a matched-row replacement and another table's append
    * land both-or-neither. */
  final case class TxnMerge(base: String, updates: DataFrame,
      keyCol: String, partCol: String) extends TxnWrite

  private def txnDir(coordinator: String) = new Path(coordinator, "_txn")

  /** Run PREPARE + COMMIT POINT + FINALIZE. `failBeforeFinalize` injects
    * the crash between the decision and the per-table renames;
    * `failAfterPrepare` the crash before the decision (an undecided
    * transaction that must leave no trace after [[cleanup]]). Returns the
    * transaction id. */
  def commitAll(spark: SparkSession, coordinator: String,
      writes: Seq[TxnWrite], failBeforeFinalize: Boolean = false,
      failAfterPrepare: Boolean = false): String = {
    require(writes.nonEmpty)
    val fs = new Path(coordinator).getFileSystem(spark.sessionState.newHadoopConf())
    val txnId = java.util.UUID.randomUUID().toString
    // the same pending-DV fence every rewrite/append verb carries: a
    // member staged from read() under a pending vector would resurrect
    // its rows (merge) or let the vector wrongly hide fresh ones (append)
    writes.foreach(w =>
      ManifestTable.requireNoPendingDv(spark, w.base, "multi-table transaction"))
    // PREPARE: stage files + temp manifests, all invisible
    val prepared = writes.map { w =>
      val v = ManifestTable.currentVersion(spark, w.base)
      val entries = w match {
        case TxnAppend(base, df, partCol) =>
          ManifestTable.entries(spark, base, v) ++
            ManifestTable.writeSnapshotFilesExpr(spark, base, v + 1, df, col(partCol))
        case TxnMerge(base, updates, keyCol, partCol) =>
          ManifestTable.prepareMergeEntries(spark, base, updates, keyCol, partCol, v)
      }
      val tmp = new Path(w.base, s"_manifests/.txn-$txnId-v${v + 1}.manifest")
      val out = fs.create(tmp, false)
      try out.write(entries.map { case (p, f) => s"$p\t$f" }
        .mkString("\n").getBytes("UTF-8"))
      finally out.close()
      (w.base, v + 1, tmp.toString)
    }
    if (failAfterPrepare)
      throw new RuntimeException("injected crash after prepare, before txn commit")
    // COMMIT POINT: one atomic rename decides the whole transaction
    fs.mkdirs(txnDir(coordinator))
    val rec = prepared.map { case (b, v, t) => s"$b\t$v\t$t" }.mkString("\n")
    val recTmp = new Path(txnDir(coordinator), s".tmp-$txnId")
    val o2 = fs.create(recTmp, false)
    try o2.write(rec.getBytes("UTF-8")) finally o2.close()
    val recDst = new Path(txnDir(coordinator), s"$txnId.txn")
    if (!fs.rename(recTmp, recDst))
      throw new java.io.IOException(s"transaction $txnId lost the commit race")
    if (failBeforeFinalize)
      throw new RuntimeException("injected crash after txn commit, before finalize")
    finalizeTxn(spark, coordinator, txnId)
    txnId
  }

  /** FINALIZE one decided transaction (idempotent). A version the
    * transaction reserved that was meanwhile committed by an INDEPENDENT
    * writer is detected by content comparison and fails loudly — silently
    * skipping would drop this table's write while other members advance
    * (partial application). */
  private def finalizeTxn(spark: SparkSession, coordinator: String,
      txnId: String): Unit = {
    val fs = new Path(coordinator).getFileSystem(spark.sessionState.newHadoopConf())
    val rec = new Path(txnDir(coordinator), s"$txnId.txn")
    def slurp(p: Path): String = {
      val in = fs.open(p)
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
    }
    slurp(rec).split("\n").filter(_.nonEmpty).foreach { line =>
      val Array(base, v, tmp) = line.split("\t")
      val dst = new Path(base, s"_manifests/v$v.manifest")
      val tmpPath = new Path(tmp)
      if (fs.exists(dst)) {
        if (fs.exists(tmpPath)) {
          // dst committed while our temp still exists: either a duplicate
          // finalize raced us (identical content — clean the temp) or an
          // independent commit took the version (our write would be lost)
          if (slurp(dst) == slurp(tmpPath)) fs.delete(tmpPath, false)
          else throw new IllegalStateException(
            s"txn $txnId: version $v of $base was committed by an independent " +
              "writer — this member's write is not applied; re-run the transaction")
        } // else: our own earlier finalize renamed it — done
      } else {
        if (!fs.exists(tmpPath)) throw new IllegalStateException(
          s"txn $txnId: neither $dst nor its temp manifest exists — " +
            "staged state was destroyed before finalize")
        // exclusive publish (link on local fs): a POSIX rename would
        // silently OVERWRITE a version an independent writer committed
        // between our exists() check and now — same TOCTOU the manifest
        // commit closes in [[ManifestTable.publishFileExclusive]]
        if (!ManifestTable.publishFileExclusive(spark, tmpPath, dst)) {
          // lost the publish race — dst now exists, but WHOSE content won?
          // Mere existence is not success: an independent writer landing
          // v between the exists() check and the publish would silently
          // drop this member's write while other members advance (the
          // partial application the earlier branch throws for). Same
          // content-comparison discipline as the fs.exists(dst) branch.
          if (!fs.exists(dst))
            throw new java.io.IOException(s"finalize failed for $base v$v")
          if (slurp(dst) == slurp(tmpPath)) fs.delete(tmpPath, false)
          else throw new IllegalStateException(
            s"txn $txnId: version $v of $base was committed by an independent " +
              "writer during finalize — this member's write is not applied; " +
              "re-run the transaction")
        }
      }
      ManifestTable.refreshAllStats(spark, base)
    }
  }

  /** Complete every decided-but-unfinalized transaction in the
    * coordinator log — run at startup, exactly like a WAL redo pass.
    * Returns the ids finalized. */
  def recover(spark: SparkSession, coordinator: String): Seq[String] = {
    val fs = new Path(coordinator).getFileSystem(spark.sessionState.newHadoopConf())
    val dir = txnDir(coordinator)
    if (!fs.exists(dir)) return Seq.empty
    fs.listStatus(dir).toSeq.map(_.getPath.getName)
      .collect { case n if n.endsWith(".txn") => n.stripSuffix(".txn") }
      .map { id => finalizeTxn(spark, coordinator, id); id }
  }

  /** Crash-debris protocol, run BEFORE [[ManifestTable.removeOrphans]]:
    * (1) REDO — [[recover]] finalizes every decided transaction, renaming
    * its temp manifests into place; (2) temp `.txn-*` manifests whose
    * transaction has NO coordinator record (crash before the commit
    * point — undecided, and never will be) and are older than the
    * retention are deleted, after which their staged files are ordinary
    * removeOrphans food. removeOrphans itself treats files named by any
    * REMAINING temp manifest as referenced, so running it without this
    * pass is safe — just incomplete. Returns deleted temp-manifest
    * paths.
    *
    * The retention window is the LIVENESS fence: a transaction currently
    * between PREPARE and its commit-point rename has temp manifests but
    * no coordinator record yet — zero retention would classify it as
    * undecided debris, delete its temps, and (if it then decides)
    * poison every future [[recover]] with an unfinalizable record. The
    * default is comfortably longer than any PREPARE; pass a smaller
    * value only when no writer can be in flight. */
  def cleanup(spark: SparkSession, coordinator: String,
      tables: Seq[String], olderThanMs: Long = 10 * 60 * 1000L): Seq[String] = {
    recover(spark, coordinator)
    val fs = new Path(coordinator).getFileSystem(spark.sessionState.newHadoopConf())
    val dir = txnDir(coordinator)
    val decided: Set[String] =
      if (!fs.exists(dir)) Set.empty
      else fs.listStatus(dir).toSeq.map(_.getPath.getName)
        .collect { case n if n.endsWith(".txn") => n.stripSuffix(".txn") }.toSet
    val cutoff = System.currentTimeMillis() - olderThanMs
    tables.flatMap { base =>
      val glob = fs.globStatus(new Path(base, "_manifests/.txn-*.manifest"))
      if (glob == null) Seq.empty
      else glob.toSeq.flatMap { s =>
        val core = s.getPath.getName.stripPrefix(".txn-").stripSuffix(".manifest")
        val id = core.substring(0, core.lastIndexOf("-v")) // UUIDs contain '-'
        if (!decided(id) && s.getModificationTime < cutoff) {
          fs.delete(s.getPath, false)
          Some(s.getPath.toString)
        } else None
      }
    }
  }

  // ---------------------------------------------------------------- fixture

  private[graft] val cache = scala.collection.mutable.Map[String, (String, String)]()

  /** Build-once pair of tables fed by ONE transaction: an orders fact
    * (first orderkey half at v1) and a per-year running aggregate table
    * (matching v1 state), then a single [[commitAll]] appends the second
    * half to the fact AND its per-year aggregate delta to the summary —
    * both-or-neither. */
  private[sources] def txnFixture(spark: SparkSession, dir: String): (String, String) =
    cache.synchronized {
      cache.getOrElseUpdate(dir, {
        val fact =
          s"${graft.Scratch.root}/txn_fact_${graft.Scratch.dirToken(dir)}"
        val summ =
          s"${graft.Scratch.root}/txn_summ_${graft.Scratch.dirToken(dir)}"
        val t = Tables.orders(spark, dir)
          .select(col("o_orderkey"),
            year(col("o_orderdate")).cast("int").as("o_year"),
            col("o_totalprice"))
        val mx = t.agg(max(col("o_orderkey"))).head.getLong(0)
        val (h1, h2) = (t.filter(col("o_orderkey") <= mx / 2),
          t.filter(col("o_orderkey") > mx / 2))
        def aggOf(df: DataFrame) = df.groupBy(col("o_year"))
          .agg(count(lit(1)).as("n"),
            sum(floor(col("o_totalprice") * 100 + 0.5).cast("long")).as("cents"))
        ManifestTable.create(spark, fact, h1, "o_year")
        ManifestTable.create(spark, summ, aggOf(h1), "o_year")
        commitAll(spark, fact, Seq(
          TxnAppend(fact, h2, "o_year"),
          TxnAppend(summ, aggOf(h2), "o_year")))
        (fact, summ)
      })
    }

  /** Registered MULTI-TABLE transaction: the fact table and its running
    * summary advanced by ONE atomic transaction; the query cross-checks
    * them — per year, the summary's SUMMED deltas must equal the fact's
    * recomputed aggregate, which only holds if both tables saw both
    * halves (a torn commit leaves a year where they disagree and the
    * consistency flag — asserted TRUE by the oracle — goes false). */
  val tableTxn: QuerySpec = QuerySpec.sql(
    "q_table_txn",
    """WITH t AS (SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
      |                  o_totalprice
      |           FROM orders)
      |SELECT o_year, count(*) AS n,
      |       CAST(sum(floor(o_totalprice * 100 + 0.5)) AS BIGINT) AS cents,
      |       TRUE AS consistent
      |FROM t GROUP BY 1 ORDER BY 1""".stripMargin) { (spark, dir) =>
    val (fact, summ) = txnFixture(spark, dir)
    val factAgg = ManifestTable.read(spark, fact)
      .groupBy(col("o_year"))
      .agg(count(lit(1)).as("n"),
        sum(floor(col("o_totalprice") * 100 + 0.5).cast("long")).as("cents"))
    val summAgg = ManifestTable.read(spark, summ)
      .groupBy(col("o_year"))
      .agg(sum(col("n")).as("s_n"), sum(col("cents")).as("s_cents"))
    factAgg.join(summAgg, Seq("o_year"), "full_outer")
      .select(col("o_year"), col("n"), col("cents"),
        (col("n") === col("s_n") && col("cents") === col("s_cents"))
          .as("consistent"))
      .orderBy(col("o_year"))
  }

  /** Build-once pair advanced by ONE transaction whose members are a
    * MERGE and an APPEND: the fact table re-prices a deterministic cohort
    * (+1.00 on every orderkey ≡ 3 mod 10 — a matched-row REPLACEMENT,
    * staged as the touched-partition copy-on-write rewrite) while the
    * summary table appends the matching cents delta — both-or-neither. */
  private[sources] def txnMergeFixture(spark: SparkSession, dir: String): (String, String) =
    cache.synchronized {
      cache.getOrElseUpdate(s"merge:$dir", {
        val fact =
          s"${graft.Scratch.root}/txnm_fact_${graft.Scratch.dirToken(dir)}"
        val summ =
          s"${graft.Scratch.root}/txnm_summ_${graft.Scratch.dirToken(dir)}"
        val t = Tables.orders(spark, dir)
          .select(col("o_orderkey"),
            year(col("o_orderdate")).cast("int").as("o_year"),
            col("o_totalprice"))
        def aggOf(df: DataFrame) = df.groupBy(col("o_year"))
          .agg(count(lit(1)).as("n"),
            sum(floor(col("o_totalprice") * 100 + 0.5).cast("long")).as("cents"))
        ManifestTable.create(spark, fact, t, "o_year")
        ManifestTable.create(spark, summ, aggOf(t), "o_year")
        val updates = t.filter(col("o_orderkey") % 10 === 3)
          .withColumn("o_totalprice", col("o_totalprice") + lit(1.0))
        // the summary delta of a pure replacement: zero count change, the
        // cents difference new − old per year
        val delta = t.filter(col("o_orderkey") % 10 === 3)
          .withColumn("__new", col("o_totalprice") + lit(1.0))
          .groupBy(col("o_year"))
          .agg(lit(0L).as("n"),
            sum(floor(col("__new") * 100 + 0.5).cast("long") -
              floor(col("o_totalprice") * 100 + 0.5).cast("long")).as("cents"))
        commitAll(spark, fact, Seq(
          TxnMerge(fact, updates, "o_orderkey", "o_year"),
          TxnAppend(summ, delta, "o_year")))
        (fact, summ)
      })
    }

  /** Registered MERGE-member transaction: same consistency cross-check as
    * [[tableTxn]], but the fact-side member is a MERGE (matched-row
    * replacement) — the oracle replays the re-pricing in SQL and asserts
    * the summed summary deltas still equal the fact's recomputed
    * aggregate, which only holds if the COW rewrite and the delta append
    * landed in the same decision. `MultiTableTxnSpec` adds the
    * injected-crash + recovery pin for the merge member. */
  val tableTxnMerge: QuerySpec = QuerySpec.sql(
    "q_table_txn_merge",
    """WITH t AS (SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
      |                  CASE WHEN o_orderkey % 10 = 3
      |                       THEN o_totalprice + 1.0 ELSE o_totalprice
      |                  END AS price
      |           FROM orders)
      |SELECT o_year, count(*) AS n,
      |       CAST(sum(floor(price * 100 + 0.5)) AS BIGINT) AS cents,
      |       TRUE AS consistent
      |FROM t GROUP BY 1 ORDER BY 1""".stripMargin) { (spark, dir) =>
    val (fact, summ) = txnMergeFixture(spark, dir)
    val factAgg = ManifestTable.read(spark, fact)
      .groupBy(col("o_year"))
      .agg(count(lit(1)).as("n"),
        sum(floor(col("o_totalprice") * 100 + 0.5).cast("long")).as("cents"))
    val summAgg = ManifestTable.read(spark, summ)
      .groupBy(col("o_year"))
      .agg(sum(col("n")).as("s_n"), sum(col("cents")).as("s_cents"))
    factAgg.join(summAgg, Seq("o_year"), "full_outer")
      .select(col("o_year"), col("n"), col("cents"),
        (col("n") === col("s_n") && col("cents") === col("s_cents"))
          .as("consistent"))
      .orderBy(col("o_year"))
  }

  def all: Seq[QuerySpec] = Seq(tableTxn, tableTxnMerge)
}
