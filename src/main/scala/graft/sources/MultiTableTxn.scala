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
  * Crash anywhere before 2: no reader ever sees anything (temp manifests
  * and staged files are [[ManifestTable.removeOrphans]] debris).
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

  /** One table's contribution to a transaction: append `df` partitioned
    * by `partCol`. */
  final case class TxnAppend(base: String, df: DataFrame, partCol: String)

  private def txnDir(coordinator: String) = new Path(coordinator, "_txn")

  /** Run PREPARE + COMMIT POINT + FINALIZE. `failBeforeFinalize` injects
    * the crash between the decision and the per-table renames for the
    * recovery spec. Returns the transaction id. */
  def commitAll(spark: SparkSession, coordinator: String,
      writes: Seq[TxnAppend], failBeforeFinalize: Boolean = false): String = {
    require(writes.nonEmpty)
    val fs = new Path(coordinator).getFileSystem(spark.sessionState.newHadoopConf())
    val txnId = java.util.UUID.randomUUID().toString
    // PREPARE: stage files + temp manifests, all invisible
    val prepared = writes.map { w =>
      val v = ManifestTable.currentVersion(spark, w.base)
      val newFiles = ManifestTable.writeSnapshotFilesExpr(
        spark, w.base, v + 1, w.df, col(w.partCol))
      val entries = ManifestTable.entries(spark, w.base, v) ++ newFiles
      val tmp = new Path(w.base, s"_manifests/.txn-$txnId-v${v + 1}.manifest")
      val out = fs.create(tmp, false)
      try out.write(entries.map { case (p, f) => s"$p\t$f" }
        .mkString("\n").getBytes("UTF-8"))
      finally out.close()
      (w.base, v + 1, tmp.toString)
    }
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

  /** FINALIZE one decided transaction (idempotent). */
  private def finalizeTxn(spark: SparkSession, coordinator: String,
      txnId: String): Unit = {
    val fs = new Path(coordinator).getFileSystem(spark.sessionState.newHadoopConf())
    val rec = new Path(txnDir(coordinator), s"$txnId.txn")
    val in = fs.open(rec)
    val text = try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
    text.split("\n").filter(_.nonEmpty).foreach { line =>
      val Array(base, v, tmp) = line.split("\t")
      val dst = new Path(base, s"_manifests/v$v.manifest")
      val tmpPath = new Path(tmp)
      if (!fs.exists(dst) && fs.exists(tmpPath)) {
        if (!fs.rename(tmpPath, dst) && !fs.exists(dst))
          throw new java.io.IOException(s"finalize failed for $base v$v")
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

  // ---------------------------------------------------------------- fixture

  private val cache = scala.collection.mutable.Map[String, (String, String)]()

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

  def all: Seq[QuerySpec] = Seq(tableTxn)
}
