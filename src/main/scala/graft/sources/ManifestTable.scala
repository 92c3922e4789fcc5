package graft.sources

import graft.QuerySpec
import graft.model.Tables
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StructField, StructType}

/** A minimal snapshot/manifest table format — the transactionally-correct
  * form of the reference's staged warehouse merge
  * (`redshift_setup.py:190-194`). At 100 TB a MERGE cannot be a DELETE +
  * INSERT against live files (readers would see a torn table, and a crash
  * between the two statements loses data): it has to be copy-on-write of
  * the touched partitions plus an ATOMIC commit that flips readers from
  * the old file set to the new one in one step. That is exactly the
  * Delta/Iceberg design; this is the smallest faithful expression of it on
  * plain parquet + a filesystem with atomic rename.
  *
  * Layout under `base/`:
  *   - `files/v<N>/p=<val>/` — immutable parquet data files, each holding
  *     exactly one partition value of one committed version (data files
  *     keep ALL columns; the dir name is bookkeeping, not Hive layout).
  *   - `_manifests/v<N>.manifest` — one `<pval>\t<relative path>` line per
  *     live data file in snapshot N. Written to a temp name and RENAMED
  *     in: the rename is the commit point, and a half-written temp file is
  *     invisible to readers. Rename-refuses-to-overwrite doubles as
  *     optimistic concurrency control — two writers racing to commit the
  *     same version: exactly one wins.
  *
  * Readers list `_manifests/`, take the highest committed version, and
  * read precisely the files it names — so a crash at ANY point of a merge
  * (staged files written, moved, manifest half-written) leaves the previous
  * snapshot byte-identical and fully readable, and old snapshots remain
  * addressable (`readVersion` = time travel). No file named by any
  * committed manifest is ever rewritten or deleted by a merge.
  *
  * MERGE itself is partition-grained copy-on-write: only partitions that
  * the update set touches are rewritten (anti-join out the matched keys,
  * union in the updates); every untouched partition's files carry over to
  * the new manifest by reference. On a 1000-executor cluster the rewrite
  * is an ordinary distributed join sized by the touched partitions, the
  * commit is one driver-side rename, and partition pruning comes from the
  * manifest (readers of one partition open only its files).
  */
object ManifestTable
    extends ManifestCommitProtocol
    with ManifestVerbs
    with ManifestSidecars
    with ManifestMoR
    with ManifestRefs
    with ManifestTableQueriesA
    with ManifestTableQueriesB
    with ManifestTableQueriesC {

  val all: Seq[QuerySpec] =
    Seq(tableMerge, tableDiff, incrementalAgg, streamMerge, tableDelete,
      tableRestore, tableOptimize, tableAudit, tableStatsSkip,
      tableStatsSkipMulti, tableBloomSkip, tableCdc, tableCdfAgg, streamCdf,
      tableClone, tableOptimizeSorted, tableIndexJoin, tablePartitions,
      tableEvolve, streamTable, connectorTravel, tableMoR, catalogSql,
      streamSink, tableOptimize2d, catalogInsert, connectorMoR, catalogAgg,
      lakehouseE2e, catalogPrune, catalogPoint, catalogDpp, catalogSpj,
      streamCdfRead, streamEvolve, catalogMetaAgg, catalogLimit,
      catalogCreate, catalogDelete, catalogUpdate, catalogMergeInto,
      tableConcurrent, catalogRename, catalogDropCol,
      tableOptimizeConcurrent, catalogDeleteMoR, catalogMetaSum,
      streamCdfEvolve, tableUpdateMoR, catalogUpdateMoR, catalogHistory,
      catalogChanges, catalogConstraint, catalogDefault,
      catalogTag, tableBranch, catalogBranch, branchRebase, mergeSchema,
      streamWap, bucketJoin, catalogRefs, bucketJoinMixed, streamBranchRead,
      catalogWap, bucketDeleteMoR, catalogWapFix, branchCdf, branchOptimize,
      catalogCall, bucketCdf, catalogMonthLayout, catalogMonthDelete,
      catalogMonthMerge, catalogMonthCdf, catalogTruncLayout, catalogSpec2,
      catalogMergeEvolve, spec2DeleteMoR, spec2UpdateMoR, catalogSpecEvolve2,
      catalogHourLayout, catalogSpecStr, specEvolveMoR, catalogSpecTs,
      branchDeleteMoR, catalogSpecStrRange, branchUpdateMoR, branchCdfMoR,
      branchPrunedScan)
}
