package graft.sources

import graft.QuerySpec
import graft.model.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** S8 — warehouse bulk load + staged merge (`redshift_setup.py:175-196`,
  * the commented Redshift `COPY … FORMAT AS PARQUET` / staging-merge
  * sketch), realized against embedded Apache Derby: the JDBC engine that
  * ships inside Spark's own jar directory, so the surface is exercised
  * with zero extra dependencies.
  *
  * Scale note: `df.write.jdbc` parallelizes one connection per partition —
  * the Spark-native analog of a warehouse bulk COPY. The staged merge is
  * the reference's idempotency pattern: load into a staging table, then
  * DELETE-matching-keys + INSERT in ONE transaction, so re-running a
  * day's load never duplicates rows (`redshift_setup.py:190-194`).
  */
object Jdbc {

  def derbyUrl(dbDir: String): String = s"jdbc:derby:$dbDir;create=true"

  private def props: java.util.Properties = {
    val p = new java.util.Properties()
    p.setProperty("driver", "org.apache.derby.jdbc.EmbeddedDriver")
    p
  }

  /** Bulk-load `df` into `table` (overwrite). */
  def bulkLoad(df: DataFrame, url: String, table: String): Unit =
    df.write.mode("overwrite").jdbc(url, table, props)

  /** Read a warehouse table back as a DataFrame. */
  def readTable(spark: SparkSession, url: String, table: String): DataFrame =
    spark.read.jdbc(url, table, props)

  /** Staged merge (delete-then-insert upsert, `redshift_setup.py:190-194`):
    * bulk-load into `staging`, then atomically DELETE target rows whose
    * keys appear in staging and INSERT all staging rows — one transaction,
    * so a re-run of the same batch is a no-op-equivalent (idempotent). */
  def stagedMerge(
      df: DataFrame, url: String, target: String, staging: String,
      keyCols: Seq[String]): Unit = {
    bulkLoad(df, url, staging)
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      conn.setAutoCommit(false)
      val st = conn.createStatement()
      // create target on first run, empty, with staging's schema
      val exists =
        conn.getMetaData.getTables(null, null, target.toUpperCase, null).next()
      if (!exists)
        st.executeUpdate(
          s"CREATE TABLE $target AS SELECT * FROM $staging WITH NO DATA")
      // Spark's JDBC writer creates columns as QUOTED lowercase identifiers
      // — unquoted references would upcase and miss them
      val keyMatch = keyCols.map(k => s"""$target."$k" = s."$k"""").mkString(" AND ")
      st.executeUpdate(
        s"DELETE FROM $target WHERE EXISTS (SELECT 1 FROM $staging s WHERE $keyMatch)")
      st.executeUpdate(s"INSERT INTO $target SELECT * FROM $staging")
      conn.commit()
    } catch {
      case e: Throwable => conn.rollback(); throw e
    } finally conn.close()
  }

  /** S8 as an oracle row: bulk-load the supplier dim into Derby, read it
    * back through JDBC, aggregate — must equal the same aggregate straight
    * off the source parquet. (Money summed via the exact cent-floor trick
    * so the float total is order-independent.) */
  val jdbcSink: QuerySpec = QuerySpec.sql(
    "q_jdbc_sink",
    """SELECT s_nationkey, count(*) AS n,
      |       sum(floor(s_acctbal * 100 + 0.5)) / 100.0 AS total_bal
      |FROM supplier GROUP BY 1 ORDER BY 1""".stripMargin) { (spark, dir) =>
    val dbDir = s"${graft.Scratch.root}/derby_wh"
    val url = derbyUrl(dbDir)
    bulkLoad(
      Tables.supplier(spark, dir).select("s_suppkey", "s_nationkey", "s_acctbal"),
      url, "graft_supplier")
    readTable(spark, url, "graft_supplier")
      .groupBy(col("s_nationkey"))
      .agg(count(lit(1)).as("n"),
        (sum(floor(col("s_acctbal") * 100 + 0.5)) / 100.0).as("total_bal"))
      .orderBy(col("s_nationkey"))
  }

  val all: Seq[QuerySpec] = Seq(jdbcSink)
}
