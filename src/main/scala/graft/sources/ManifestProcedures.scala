package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** SQL-CALLABLE MAINTENANCE PROCEDURES (Spark 4's `ProcedureCatalog`) —
  * the Iceberg `CALL catalog.system.<proc>(...)` surface for every
  * table-maintenance verb the format has, so an operator never needs the
  * programmatic API for day-2 work:
  *
  * {{{
  * CALL graft_cat.system.optimize(`table` => 't', min_files => 2)
  * CALL graft_cat.system.expire_snapshots(`table` => 't', keep => 2)
  * CALL graft_cat.system.remove_orphans(`table` => 't')
  * CALL graft_cat.system.purge_deletes(`table` => 't')
  * CALL graft_cat.system.create_tag(`table` => 't', name => 'rc1')
  * CALL graft_cat.system.create_branch(`table` => 't', name => 'stage')
  * CALL graft_cat.system.fast_forward(`table` => 't', branch => 'stage')
  * CALL graft_cat.system.rebase_publish(`table` => 't', branch => 'stage')
  * CALL graft_cat.system.optimize_branch(`table` => 't', branch => 'stage')
  * CALL graft_cat.system.restore(`table` => 't', version => 3)
  * CALL graft_cat.system.drop_tag / drop_branch(...)
  * }}}
  *
  * Each procedure resolves the table under the catalog's root, reads the
  * layout/key columns from the table PROPERTIES (never a guess — a table
  * that lacks them refuses with the property name), executes the same
  * verb the programmatic API runs, and returns its summary as ONE
  * driver-local row (`LocalScan` — the counts every verb already
  * reports). Concurrency, crash-safety, and classification are exactly
  * the verbs' own: a CALL is the verb. */
private[sources] object ManifestProcedures {

  /** Procedure names, lowercase (the CALL grammar's identifier). */
  val names: Set[String] = Set(
    "expire_snapshots", "remove_orphans", "optimize", "purge_deletes",
    "create_tag", "drop_tag", "create_branch", "drop_branch",
    "fast_forward", "rebase_publish", "optimize_branch", "restore",
    "optimize_sorted", "build_stats", "build_bloom", "evolve_spec")

  private def param(n: String, dt: DataType): ProcedureParameter =
    ProcedureParameter.in(n, dt).build()
  private def paramDefault(n: String, dt: DataType, sql: String): ProcedureParameter =
    ProcedureParameter.in(n, dt).defaultValue(sql).build()

  /** One-row driver-local result. */
  private final case class Result(schema: StructType, row: Seq[Any])
      extends LocalScan {
    override def readSchema(): StructType = schema
    override def rows(): Array[InternalRow] = Array(new GenericInternalRow(
      row.map {
        case s: String => UTF8String.fromString(s)
        case x => x.asInstanceOf[AnyRef]
      }.toArray[Any]))
  }

  private def one(schema: StructType, row: Seq[Any]): java.util.Iterator[Scan] =
    java.util.List.of[Scan](Result(schema, row)).iterator()

  private def partColOf(spark: SparkSession, base: String, proc: String): String =
    ManifestTable.tableProperties(spark, base).getOrElse("partCol",
      throw new UnsupportedOperationException(
        s"CALL $proc needs the partCol table property under $base"))

  /** Build the procedure. `root` is the owning catalog's table root. */
  def load(root: String, procName: String): UnboundProcedure = new UnboundProcedure {
    override def name(): String = procName
    override def description(): String = s"graft manifest-table maintenance: $procName"
    override def bind(inputType: StructType): BoundProcedure = new BoundProcedure {
      override def name(): String = procName
      override def description(): String =
        s"graft manifest-table maintenance: $procName"
      override def isDeterministic: Boolean = false

      override def parameters(): Array[ProcedureParameter] = procName match {
        // dry_run => true returns each verb's would-be summary (the same
        // manifest arithmetic) and mutates nothing — CALL as EXPLAIN
        case "expire_snapshots" => Array(
          param("table", StringType), paramDefault("keep", IntegerType, "2"),
          paramDefault("dry_run", BooleanType, "false"),
          // non-empty: expire THAT branch's manifest sequence instead of
          // main's (the fork version always survives — it is the diff
          // base rebasePublish/optimizeBranch need)
          paramDefault("branch", StringType, "''"))
        case "remove_orphans" => Array(
          param("table", StringType),
          paramDefault("older_than_ms", LongType, "0"),
          paramDefault("dry_run", BooleanType, "false"))
        case "optimize" => Array(
          param("table", StringType), paramDefault("min_files", IntegerType, "2"),
          paramDefault("dry_run", BooleanType, "false"))
        case "purge_deletes" => Array(param("table", StringType),
          paramDefault("dry_run", BooleanType, "false"))
        case "create_tag" => Array(
          param("table", StringType), param("name", StringType),
          // -1 = tag the current version
          paramDefault("version", IntegerType, "-1"))
        case "drop_tag" | "drop_branch" | "create_branch" => Array(
          param("table", StringType), param("name", StringType))
        case "fast_forward" | "rebase_publish" => Array(
          param("table", StringType), param("branch", StringType))
        case "optimize_branch" => Array(
          param("table", StringType), param("branch", StringType),
          paramDefault("min_files", IntegerType, "2"))
        case "restore" => Array(
          param("table", StringType), param("version", IntegerType))
        case "optimize_sorted" => Array(
          param("table", StringType), param("sort_col", StringType),
          paramDefault("files_per_partition", IntegerType, "4"),
          paramDefault("dry_run", BooleanType, "false"))
        case "build_stats" => Array(
          param("table", StringType), param("col", StringType))
        case "build_bloom" => Array(
          param("table", StringType), param("col", StringType),
          paramDefault("m_bits", IntegerType, "16384"),
          paramDefault("k", IntegerType, "7"))
        case "evolve_spec" => Array(
          param("table", StringType), param("fields", StringType))
        case other => throw new UnsupportedOperationException(
          s"unknown procedure $other — supported: ${names.toSeq.sorted.mkString(", ")}")
      }

      override def call(input: InternalRow): java.util.Iterator[Scan] = {
        val spark = SparkSession.active
        val base = s"$root/${input.getUTF8String(0).toString}"
        procName match {
          case "expire_snapshots" =>
            val br = if (input.numFields > 3 && !input.isNullAt(3))
              input.getUTF8String(3).toString else ""
            val (vs, files) =
              if (br.isEmpty)
                ManifestTable.expireSnapshots(spark, base,
                  input.getInt(1), dryRun = input.getBoolean(2))
              else
                ManifestTable.expireBranchSnapshots(spark, base, br,
                  input.getInt(1), dryRun = input.getBoolean(2))
            one(StructType(Seq(StructField("expired_manifests", IntegerType),
              StructField("deleted_files", IntegerType))), Seq(vs, files))
          case "remove_orphans" =>
            val deleted = ManifestTable.removeOrphans(spark, base,
              input.getLong(1), dryRun = input.getBoolean(2))
            one(StructType(Seq(StructField("deleted_files", IntegerType))),
              Seq(deleted.size))
          case "optimize" =>
            val (parts, before, after) = ManifestTable.optimizeTable(
              spark, base, partColOf(spark, base, procName), input.getInt(1),
              dryRun = input.getBoolean(2))
            one(StructType(Seq(StructField("partitions_compacted", IntegerType),
              StructField("files_before", IntegerType),
              StructField("files_after", IntegerType))), Seq(parts, before, after))
          case "purge_deletes" =>
            val props = ManifestTable.tableProperties(spark, base)
            val keyCol = props.getOrElse("keyCol",
              throw new UnsupportedOperationException(
                s"CALL purge_deletes needs the keyCol table property under $base"))
            val (parts, keys) = ManifestTable.purgeDeletes(
              spark, base, keyCol, partColOf(spark, base, procName),
              dryRun = input.getBoolean(1))
            // box explicitly: Seq(Int, Long) would numeric-widen the Int
            // to Long and the Int field read would ClassCastException
            one(StructType(Seq(StructField("partitions_rewritten", IntegerType),
              StructField("keys_purged", LongType))),
              Seq[Any](Int.box(parts), Long.box(keys)))
          case "create_tag" =>
            val v = input.getInt(2)
            val tagged = ManifestTable.createTag(spark, base,
              input.getUTF8String(1).toString, if (v < 0) None else Some(v))
            one(StructType(Seq(StructField("version", IntegerType))), Seq(tagged))
          case "drop_tag" =>
            ManifestTable.dropTag(spark, base, input.getUTF8String(1).toString)
            one(StructType(Seq(StructField("dropped", BooleanType))), Seq(true))
          case "create_branch" =>
            val fork = ManifestTable.createBranch(spark, base,
              input.getUTF8String(1).toString)
            one(StructType(Seq(StructField("fork_version", IntegerType))), Seq(fork))
          case "drop_branch" =>
            ManifestTable.dropBranch(spark, base, input.getUTF8String(1).toString)
            one(StructType(Seq(StructField("dropped", BooleanType))), Seq(true))
          case "fast_forward" =>
            val v = ManifestTable.fastForward(spark, base,
              input.getUTF8String(1).toString)
            one(StructType(Seq(StructField("version", IntegerType))), Seq(v))
          case "rebase_publish" =>
            val v = ManifestTable.rebasePublish(spark, base,
              input.getUTF8String(1).toString)
            one(StructType(Seq(StructField("version", IntegerType))), Seq(v))
          case "optimize_branch" =>
            val (parts, before, after) = ManifestTable.optimizeBranch(spark, base,
              input.getUTF8String(1).toString,
              partColOf(spark, base, procName), input.getInt(2))
            one(StructType(Seq(StructField("partitions_compacted", IntegerType),
              StructField("files_before", IntegerType),
              StructField("files_after", IntegerType))), Seq(parts, before, after))
          case "restore" =>
            val v = ManifestTable.restore(spark, base, input.getInt(1))
            one(StructType(Seq(StructField("version", IntegerType))), Seq(v))
          case "optimize_sorted" =>
            val (before, after) = ManifestTable.optimizeSorted(spark, base,
              partColOf(spark, base, procName),
              input.getUTF8String(1).toString, input.getInt(2),
              dryRun = input.getBoolean(3))
            one(StructType(Seq(StructField("files_before", IntegerType),
              StructField("files_after", IntegerType))), Seq(before, after))
          case "build_stats" =>
            ManifestTable.buildStats(spark, base, input.getUTF8String(1).toString)
            one(StructType(Seq(StructField("built", BooleanType))), Seq(true))
          case "build_bloom" =>
            ManifestTable.buildBloom(spark, base,
              input.getUTF8String(1).toString, input.getInt(2), input.getInt(3))
            one(StructType(Seq(StructField("built", BooleanType))), Seq(true))
          case "evolve_spec" =>
            val (id, ser) = ManifestTable.evolveSpec(spark, base,
              input.getUTF8String(1).toString)
            one(StructType(Seq(StructField("spec_id", IntegerType),
              StructField("fields", StringType))), Seq[Any](Int.box(id), ser))
          case other => throw new UnsupportedOperationException(
            s"unknown procedure $other")
        }
      }
    }
  }
}
