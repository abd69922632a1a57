package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, lit}

/** Batch write path: partitioned (and optionally bucketed) parquet layout —
  * the storage posture every 100 TB table here assumes (SURVEY.md §2.1
  * "Scans"; the test tables are unpartitioned single files only because the
  * driver generates them that way).
  *
  *  - `partitionBy` columns become directory keys → partition pruning turns
  *    a predicate on them into a directory listing, skipping file IO
  *    entirely (verified by ParquetSinkSpec via the plan's partitionFilters).
  *  - bucketing co-locates join/agg keys at write time so later joins on
  *    the bucket key skip their shuffle (saveAsTable-only in Spark, hence
  *    kept behind a separate method — the bench tables are path-based).
  */
object ParquetSink {

  /** Write `df` partitioned by `cols`; returns the reloaded DataFrame. */
  def writePartitioned(df: DataFrame, path: String, cols: String*): DataFrame = {
    df.write.mode("overwrite").partitionBy(cols: _*).parquet(path)
    df.sparkSession.read.parquet(path)
  }

  /** Layout-controlled parquet write: `repartitionByRange(numFiles,
    * orderKey)` (each output file covers one contiguous key range — the
    * file-count dial) + `sortWithinPartitions(orderKey)` (row groups
    * inside each file get TIGHT footer min-max stats on every column
    * correlated with the key). The key column is dropped before the write
    * when synthetic — projection after the sort preserves ordering. This
    * is the generic engine under [[writeClustered]] and its lexico
    * comparison twin in ParquetSinkSpec. */
  def writeLayout(df: DataFrame, path: String, numFiles: Int,
      orderKeys: Column*): DataFrame = {
    val keyed = df.withColumns(
      orderKeys.zipWithIndex.map { case (k, i) => s"__graft_k$i" -> k }.toMap)
    val keyCols = orderKeys.indices.map(i => col(s"__graft_k$i"))
    keyed.repartitionByRange(numFiles, keyCols: _*)
      .sortWithinPartitions(keyCols: _*)
      .drop(orderKeys.indices.map(i => s"__graft_k$i"): _*)
      .write.mode("overwrite").parquet(path)
    df.sparkSession.read.parquet(path)
  }

  /** Z-order-clustered write (round-8 verdict item 4: `layout_zorder`
    * proved the pruning win on bucket stand-ins; this is the real write
    * path): cluster by the Morton interleave of two dimension columns so
    * every file/row-group has tight min-max footer stats on BOTH —
    * a 2-D predicate then prunes row groups by stats alone, where a
    * lexicographic sort keeps only the major column tight. Cost at scale:
    * exactly the range exchange any file-count-controlled write already
    * pays — the z-value is a pure codegen column expression
    * ([[graft.operators.Layout.zValue]]). [[rowGroupsHit]] audits the
    * result from the REAL parquet footers. */
  def writeClustered(df: DataFrame, path: String, xCol: String, yCol: String,
      numFiles: Int, bits: Int = graft.operators.Layout.Bits): DataFrame =
    writeLayout(df, path, numFiles,
      graft.operators.Layout.zValue(col(xCol), col(yCol), bits))

  /** [[writeClustered]] with the Hilbert index as the layout key — the
    * `layout_hilbert` audit's production form. The range exchange cuts
    * the 1-D key space by ROW COUNT, not by bit-aligned prefixes, which
    * is precisely the regime where the Hilbert walk's grid-adjacency
    * tightens file bounding boxes over the Morton interleave's diagonal
    * seams (aligned power-of-4 ranges tie; unaligned runs do not —
    * measured on real footers in `ParquetSinkSpec`). */
  def writeClusteredHilbert(df: DataFrame, path: String, xCol: String,
      yCol: String, numFiles: Int,
      bits: Int = graft.operators.Layout.GridBits): DataFrame =
    writeLayout(df, path, numFiles,
      graft.functions.LayoutFunctions.hilbertD(col(xCol), col(yCol), bits))

  /** Footer-stats pruning audit over a parquet directory: of all row
    * groups, how many have a min-max bounding box on (`xCol`, `yCol`)
    * intersecting the query rectangle — i.e. how many a stats-pruning
    * scan must OPEN for that 2-D predicate. Reads only footers (driver-
    * side metadata IO, no data pages) via parquet-hadoop — the same
    * statistics a production lakehouse scan planner consults. Returns
    * (rowGroupsHit, rowGroupsTotal). */
  def rowGroupsHit(spark: SparkSession, path: String, xCol: String, yCol: String,
      x0: Long, x1: Long, y0: Long, y1: Long): (Int, Int) = {
    import scala.jdk.CollectionConverters._
    val conf = spark.sparkContext.hadoopConfiguration
    val dir = new org.apache.hadoop.fs.Path(path)
    val fs = dir.getFileSystem(conf)
    var hit = 0
    var total = 0
    fs.listStatus(dir).filter(_.getPath.getName.endsWith(".parquet")).foreach { f =>
      val rd = org.apache.parquet.hadoop.ParquetFileReader.open(
        org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(f.getPath, conf))
      try rd.getFooter.getBlocks.asScala.foreach { b =>
        total += 1
        def minMax(name: String): (Long, Long) = {
          val cc = b.getColumns.asScala.find(_.getPath.toDotString == name)
            .getOrElse(sys.error(s"no column chunk '$name' in ${f.getPath}"))
          val st = cc.getStatistics
          (st.genericGetMin.asInstanceOf[Number].longValue,
            st.genericGetMax.asInstanceOf[Number].longValue)
        }
        val (xmin, xmax) = minMax(xCol)
        val (ymin, ymax) = minMax(yCol)
        if (xmin <= x1 && xmax >= x0 && ymin <= y1 && ymax >= y0) hit += 1
      } finally rd.close()
    }
    (hit, total)
  }

  /** Write `df` bucketed+sorted by `key` into `numBuckets` as a managed
    * table; joins between two tables bucketed the same way plan with zero
    * exchanges on the bucket key.
    *
    * Two robustness properties, both spec-pinned (ParquetSinkSpec):
    *
    *  - **Idempotent ACROSS JVMs.** `mode("overwrite")` only overwrites a
    *    table the *current catalog* knows about; a fresh JVM's in-memory
    *    catalog is empty while the managed location (`<warehouse>/<table>`)
    *    may survive on disk from a prior process, making a plain
    *    `saveAsTable` throw `LOCATION_ALREADY_EXISTS`. Stale state is
    *    cleared via [[dropWithLocation]] before each write.
    *  - **The previous table survives a failed write.** The new data is
    *    staged to `<table>__staging` first; the live table is dropped and
    *    the staging table renamed into place ONLY after the staging write
    *    committed. If evaluating `df` throws, the old store — for the
    *    fingerprint store, the pipeline's only dedup history — is intact.
    *    (The final drop+rename pair itself is not transactional; the
    *    window is two catalog calls on written data, not a data write.) */
  def writeBucketed(df: DataFrame, table: String, key: String, numBuckets: Int): DataFrame =
    // repartition on the bucket key FIRST: bucketed writes emit one file per
    // (task, bucket) pair, so an unaligned upstream partitioning writes up
    // to tasks×buckets tiny files (measured 5 s on a 112k-row store — the
    // file-per-bucket explosion, not the data). repartition's Murmur3
    // HashPartitioning is exactly the bucket hash, so after it each task
    // holds one whole bucket → numBuckets files, and the exchange it adds
    // is the same one the bucketed layout conceptually requires anyway.
    writeStaged(df.repartition(numBuckets, org.apache.spark.sql.functions.col(key)),
      table)(_.bucketBy(numBuckets, key).sortBy(key))

  /** Same staged overwrite for an UNBUCKETED managed table — the right form
    * for small broadcast-side tables (a stoplist, a dimension): bucketing
    * only pays on the shuffled side of a join, and the bucketed write's
    * per-bucket files are pure overhead for a table that ships whole. */
  def writeTable(df: DataFrame, table: String): DataFrame =
    writeStaged(df, table)(identity)

  private def writeStaged(df: DataFrame, table: String)(
      configure: org.apache.spark.sql.DataFrameWriter[org.apache.spark.sql.Row] =>
        org.apache.spark.sql.DataFrameWriter[org.apache.spark.sql.Row]): DataFrame = {
    val spark = df.sparkSession
    val staging = table + "__staging"
    dropWithLocation(spark, staging)
    configure(df.write).saveAsTable(staging)
    dropWithLocation(spark, table)
    // managed-table rename moves the staging directory to the table's path
    spark.sql(s"ALTER TABLE `$staging` RENAME TO `$table`")
    // the session caches file listings per table name: a reader that saw a
    // previous incarnation of `table` would otherwise read the old listing
    spark.catalog.refreshTable(table)
    // a PARTITIONED table's catalog partition entries still carry absolute
    // locations under the staging directory after the rename — rebuild them
    // from the renamed directory tree or every scan resolves to zero files
    if (spark.sessionState.catalog
        .getTableMetadata(org.apache.spark.sql.catalyst.TableIdentifier(table))
        .partitionColumnNames.nonEmpty)
      spark.catalog.recoverPartitions(table)
    spark.table(table)
  }

  /** Keyed MERGE/upsert — the lakehouse primitive the append-only stores
    * lack: fold `batch` into the bucketed managed table `table`,
    * LAST-WRITER-WINS per `key` — a batch row REPLACES the stored row
    * carrying its key, unmatched batch rows INSERT, unmatched store rows
    * CARRY OVER (ANSI MERGE's WHEN MATCHED UPDATE + WHEN NOT MATCHED
    * INSERT applied batch-at-a-time). Without this, a re-crawled page that
    * CHANGED (same canonical key, new content) could only be appended
    * beside its stale row. The batch must be KEYED — at most one row per
    * key — which is MERGE's own contract (a multi-match update is
    * nondeterministic); callers collapse first (arg-max by arrival order,
    * typically).
    *
    * Shape: one join — the store enters as the bucketed scan IN PLACE
    * (left_anti on the batch's keys drops superseded rows without moving
    * history), the union lands through the SAME staged bucketed write
    * that built the store, so a crash mid-merge leaves the previous
    * generation live (the [[writeStaged]] survival rule) and the new
    * generation is bucketed identically for the next probe or merge. At
    * 100 TB the cost is O(store + batch) IO — the copy-on-write MERGE
    * posture; a deletion-vector/manifest format would trade that IO for
    * read-side merge work — but only O(batch) compute above the scans,
    * and the store side never exchanges. Returns the merged table. */
  def mergeBucketed(batch: DataFrame, table: String, key: String): DataFrame = {
    val spark = batch.sparkSession
    val buckets = bucketCount(spark, table).getOrElse(throw new IllegalArgumentException(
      s"mergeBucketed: `$table` is not a bucketed table — merge targets " +
        "must be writeBucketed stores (the bucket layout is what keeps the " +
        "store side of the merge and every later probe exchange-free)"))
    // the batch lineage is evaluated three times (the keyed-batch check,
    // the anti-join's key side, the union): persist for the duration so a
    // caller passing an expensive unmaterialized batch pays its upstream
    // plan once, not per consumer (advisor round 13)
    val b = batch.persist()
    try {
      requireKeyedBatch(b, key, "mergeBucketed")
      val merged = spark.table(table)
        .join(b.select(col(key)), Seq(key), "left_anti")
        .unionByName(b)
      writeBucketed(merged, table, key, buckets)
    } finally b.unpersist()
  }

  /** Write `df` PARTITIONED by `partCol` (directory keys — partition
    * pruning on read AND on merge) and bucketed+sorted by `key` WITHIN each
    * partition — the two-level layout a 100 TB keyed store actually uses:
    * the partition column (a key range / hash band / date) bounds which
    * directories any operation touches, the bucket layout keeps key joins
    * exchange-free within them. This is the store layout
    * [[mergePartitionedBucketed]] needs to rewrite ONLY touched partitions
    * instead of [[mergeBucketed]]'s full copy-on-write. Same staged-swap
    * crash safety as every managed-table write here. */
  def writePartitionedBucketed(df: DataFrame, table: String, partCol: String,
      key: String, numBuckets: Int): DataFrame =
    // repartition on the bucket key first (the writeBucketed file-count
    // rationale): each task holds one bucket and emits ≤ one file per
    // partition directory → |partitions| × numBuckets files total
    writeStaged(df.repartition(numBuckets, col(key)), table)(
      _.partitionBy(partCol).bucketBy(numBuckets, key).sortBy(key))

  /** The keyed-batch MERGE precondition shared by both merge forms: at most
    * one batch row per key, failed loud (an unkeyed batch would silently
    * break the store's one-row-per-key invariant for every later probe and
    * merge) — one aggregation job over the batch only, never the store. */
  private def requireKeyedBatch(batch: DataFrame, key: String, op: String): Unit = {
    val dupKey = batch.groupBy(col(key)).count().filter(col("count") > 1).limit(1)
      .collect()
    if (dupKey.nonEmpty) throw new IllegalArgumentException(
      s"$op: batch carries ${dupKey.head.get(0)} more than once on " +
        s"key `$key` — MERGE requires at most one batch row per key (a " +
        "multi-match update is nondeterministic); collapse the batch first " +
        "(arg-max by arrival order, typically)")
  }

  /** PARTITION-PRUNED keyed MERGE into a [[writePartitionedBucketed]]
    * store: identical last-writer-wins semantics to [[mergeBucketed]], but
    * only partitions CONTAINING BATCH KEYS are rewritten — untouched
    * partitions' files are left byte-identical on disk (ParquetSinkSpec
    * pins this with before/after checksums). This is the copy-on-write
    * mitigation the full-table MERGE documents: at 100 TB with daily
    * batches, a date/key-range-partitioned store rewrites the touched
    * slice, not the corpus.
    *
    * Contract: `partCol` must be a pure function of the key (or of the
    * row's immutable identity) so a key's replacement lands in the same
    * partition its stale row occupies — otherwise the stale row would
    * survive in an untouched partition. The rewrite is Spark's dynamic
    * partition overwrite (only partitions present in the merged output are
    * replaced), committed per job; a crash mid-write leaves some touched
    * partitions old and some new — the generation discipline of the
    * streaming merge loop is the stronger-isolation alternative when that
    * window matters. Returns the merged table. */
  def mergePartitionedBucketed(batch: DataFrame, table: String,
      partCol: String, key: String): DataFrame = {
    val spark = batch.sparkSession
    val buckets = bucketCount(spark, table).getOrElse(throw new IllegalArgumentException(
      s"mergePartitionedBucketed: `$table` is not a bucketed table — merge " +
        "targets must be writePartitionedBucketed stores"))
    val b = batch.persist()
    try {
      requireKeyedBatch(b, key, "mergePartitionedBucketed")
      // the touched-partition list is bounded by the batch's distinct
      // partition values (≪ partition count by design), so the collect is a
      // driver-side pruning predicate, not data movement
      val touched = b.select(col(partCol)).distinct().collect().map(_.get(0)).toSeq
      val slice = spark.table(table).filter(col(partCol).isInCollection(touched))
      val cols = spark.table(table).columns.toIndexedSeq
      val merged = slice
        .join(b.select(col(key)), Seq(key), "left_anti")
        .unionByName(b.select(cols.map(col): _*))
      // insertInto is position-based: project to the table's column order
      // (partition column last), then dynamic-overwrite — only the touched
      // partitions are replaced, every other directory is never opened.
      // The merged slice is eagerly localCheckpoint'ed first: its plan reads
      // the very table being overwritten (UNSUPPORTED_OVERWRITE otherwise),
      // and the slice is touched-partitions-sized by design, so snapshotting
      // it is batch-scale, not store-scale. The dynamic mode must be the
      // SESSION conf for catalog-table inserts (the writer-level option is
      // honored only for path-based writes — measured: a full overwrite
      // deleted every untouched partition), restored afterwards.
      val snap = merged.select(cols.map(col): _*)
        .localCheckpoint(true)
        .repartition(buckets, col(key))
      insertDynamicOverwrite(snap, table)
      spark.table(table)
    } finally b.unpersist()
  }

  /** Dynamic-partition-overwrite insert shared by the partitioned-store
    * writers ([[mergePartitionedBucketed]], [[optimizePartition]]): only
    * partitions present in `out` are replaced, every other directory is
    * never opened. The dynamic mode must be the SESSION conf for
    * catalog-table inserts (the writer-level option is honored only for
    * path-based writes — measured: a full overwrite deleted every
    * untouched partition), restored afterwards. The flip is session-global
    * for the insert's duration; the synchronized block keeps two
    * in-process ParquetSink writers from interleaving a static-overwrite
    * write into the window (the ingest loops' path-based writes are
    * unaffected either way — they pass the writer-level option, which path
    * writes DO honor). A caller driving non-ParquetSink overwrite-mode
    * inserts concurrently on the same session must serialize against this
    * method itself. */
  private def insertDynamicOverwrite(out: DataFrame, table: String): Unit = {
    val spark = out.sparkSession
    ParquetSink.synchronized {
      val prevMode = spark.conf.get("spark.sql.sources.partitionOverwriteMode")
      try {
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        out.write.mode("overwrite").insertInto(table)
      } finally
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prevMode)
    }
    spark.catalog.refreshTable(table)
  }

  /** Per-partition OPTIMIZE for a [[writePartitionedBucketed]] store — the
    * partition-scoped compaction [[compact]] cannot provide: `compact`
    * rewrites a whole path as plain parquet, which on a bucketed catalog
    * table would both move every byte of every partition and DESTROY the
    * bucket layout (bucket identity lives in the file names the bucketed
    * write path emits). This rewrites exactly ONE partition back to the
    * ideal layout — `numBuckets` files, bucketed and sorted per the
    * table's own spec — and leaves every other partition's files untouched
    * on disk.
    *
    * When it's needed: [[mergePartitionedBucketed]] itself MAINTAINS the
    * numBuckets-files-per-touched-partition invariant (each merge's
    * dynamic overwrite replaces the partition with one file per bucket —
    * ParquetSinkSpec pins this across consecutive merges), so the merge
    * cadence never degrades. The degradation path is APPEND-cadence
    * writers — `df.write.insertInto(table)` without overwrite, the shape
    * of a streaming sink or a multi-writer ingest — each of which adds up
    * to `numBuckets` more files (possibly several per bucket) to every
    * partition it touches, unbounded over time. At daily cadence that is
    * the classic small-files spiral; this is the periodic repair.
    *
    * Mechanism: one partition-pruned scan of the slice (the planner reads
    * only `partCol = partValue` directories), eagerly snapshotted
    * (`localCheckpoint` — the output overwrites the very files the plan
    * reads; the snapshot is one-partition-sized, never store-scale),
    * repartitioned onto the table's own bucket hash so each task holds
    * exactly one bucket, then dynamic-overwrite-inserted — only this
    * partition is replaced, and Spark's bucketed write path re-emits the
    * canonical file-per-bucket layout with the table's sort order, so
    * bucket joins stay exchange-free afterwards. Crash safety = the
    * insert's own job commit (the partition flips old→new atomically at
    * commit; a crash mid-job leaves the old files live). Scale shape: IO
    * is O(one partition), moved exactly once, regardless of store size.
    * Returns (files before, files after) for the partition's directory —
    * the receipt a maintenance loop logs. */
  def optimizePartition(spark: SparkSession, table: String, partCol: String,
      partValue: Any): (Int, Int) = {
    val meta = spark.sessionState.catalog
      .getTableMetadata(org.apache.spark.sql.catalyst.TableIdentifier(table))
    val bucketSpec = meta.bucketSpec.getOrElse(throw new IllegalArgumentException(
      s"optimizePartition: `$table` is not a bucketed table — targets must " +
        "be writePartitionedBucketed stores (for a plain directory use compact)"))
    val key = bucketSpec.bucketColumnNames.head
    // fail LOUD on a mistyped target, like the non-bucketed check above —
    // a silent (0,0) from a partCol typo or a multi-level partition spec
    // reads as "nothing to optimize" and the small-files spiral this
    // exists to repair goes unrepaired forever
    require(meta.partitionColumnNames == Seq(partCol),
      s"optimizePartition: `$table` is partitioned by " +
        s"(${meta.partitionColumnNames.mkString(", ")}) — got partCol=" +
        s"`$partCol`; single-level partitioning only (one dir per value)")
    // the null partition lives in __HIVE_DEFAULT_PARTITION__ and the slice
    // filter below would need isNull semantics — String.valueOf(null) would
    // silently target a non-existent "part=null" directory instead; reject
    // loud until someone actually needs to optimize the null partition
    // empty string is Spark's OTHER alias for the default partition:
    // getPartitionPathString maps "" to __HIVE_DEFAULT_PARTITION__ and the
    // scan reads it back as NULL, so countFiles would count the null slice
    // while the `col(partCol) === ""` snapshot filter selects zero rows —
    // a misleading (N, N) "nothing repacked" receipt (r17 ADVICE)
    require(partValue != null && String.valueOf(partValue).nonEmpty,
      s"optimizePartition: null/empty partition value for `$table`.$partCol " +
        "is not supported (both resolve to __HIVE_DEFAULT_PARTITION__ and " +
        "need isNull slice semantics)")
    // directory name via Spark's own partition-path escaping: a raw
    // s"$partCol=$partValue" diverges from the on-disk layout for any value
    // Spark URL-escapes (space, ':', '/', '%', …) — countFiles() would then
    // inspect a non-existent path and silently no-op (0,0), the exact
    // silent-skip failure mode the guards above exist to prevent
    val partDir = new org.apache.hadoop.fs.Path(
      new org.apache.hadoop.fs.Path(meta.location),
      org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
        .getPartitionPathString(partCol, String.valueOf(partValue)))
    val fs = partDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def countFiles(): Int =
      if (!fs.exists(partDir)) 0
      else fs.listStatus(partDir).count(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
    val before = countFiles()
    if (before == 0) return (0, 0) // nothing to optimize, nothing to replace
    val cols = spark.table(table).columns.toIndexedSeq
    val snap = spark.table(table).filter(col(partCol) === lit(partValue))
      .select(cols.map(col): _*)
      .localCheckpoint(true)
      .repartition(bucketSpec.numBuckets, col(key))
    insertDynamicOverwrite(snap, table)
    (before, countFiles())
  }

  /** Small-file compaction — the lakehouse OPTIMIZE primitive. Streaming
    * ingest and over-parallel writes leave directories of KB-scale files;
    * at 100 TB that means listing millions of entries and paying the
    * per-file open cost on every scan, so periodic bin-packing into
    * ~`targetBytes` files is part of the write path's contract.
    *
    * Mechanism: Spark's own file-source packing IS a bin-packer — with
    * `maxPartitionBytes = targetBytes` and `openCostInBytes = 0`, the scan
    * greedily packs small files into ~target-sized `FilePartition`s — so
    * reading and writing back with NO shuffle re-emits one ~target file
    * per bin. Each task reads only its own file group: compaction is
    * embarrassingly parallel and moves every byte exactly once. (A
    * `repartition` form would shuffle 100 % of the data to achieve the
    * same file count.)
    *
    * The compacted copy is STAGED first and swapped in only after its
    * write committed — the [[writeStaged]] survival rule; a partitioned
    * table compacts by mapping this over its leaf directories. Returns
    * (files before, files after).
    *
    * Swap discipline (round-9 verdict item 5): the swap is rename-aside +
    * rename-in — never delete-then-rename. Directory rename is a single
    * metadata operation on HDFS-like stores, so the only window where the
    * table path is absent is between the two renames (two metadata calls),
    * not for the duration of a recursive delete of N files; a crash in
    * that window leaves `<path>__precompact` intact and [[compact]] itself
    * (or [[recoverCompact]]) restores it on the next call before doing
    * anything else. The old data is deleted only after the replacement is
    * live. (On S3-like stores where rename is copy, a real table format's
    * manifest swap replaces this — the staging/aside discipline is the
    * same.) */
  def compact(spark: SparkSession, path: String, targetBytes: Long): (Int, Int) = {
    val dir = new org.apache.hadoop.fs.Path(path)
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    recoverCompact(spark, path) // heal a previous crashed swap first
    def countFiles(p: org.apache.hadoop.fs.Path): Int =
      fs.listStatus(p).count(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
    val before = countFiles(dir)
    val staging = new org.apache.hadoop.fs.Path(path + "__compact")
    // minPartitionNum defaults to the session parallelism, which SPLITS the
    // scan toward one partition per core (bytesPerCore caps the split size)
    // — right for compute, wrong for a compactor, which must let bins reach
    // the full target. Pin it to 1 for the duration.
    val prevMax = spark.conf.get("spark.sql.files.maxPartitionBytes")
    val prevOpen = spark.conf.get("spark.sql.files.openCostInBytes")
    val prevMin = spark.conf.getOption("spark.sql.files.minPartitionNum")
    try {
      spark.conf.set("spark.sql.files.maxPartitionBytes", targetBytes.toString)
      spark.conf.set("spark.sql.files.openCostInBytes", "0")
      spark.conf.set("spark.sql.files.minPartitionNum", "1")
      spark.read.parquet(path).write.mode("overwrite").parquet(staging.toString)
    } finally {
      spark.conf.set("spark.sql.files.maxPartitionBytes", prevMax)
      spark.conf.set("spark.sql.files.openCostInBytes", prevOpen)
      prevMin match {
        case Some(v) => spark.conf.set("spark.sql.files.minPartitionNum", v)
        case None => spark.conf.unset("spark.sql.files.minPartitionNum")
      }
    }
    val aside = new org.apache.hadoop.fs.Path(path + "__precompact")
    if (fs.exists(aside)) fs.delete(aside, true) // stale from a healed crash
    if (!fs.rename(dir, aside))
      throw new java.io.IOException(s"compaction swap failed: $dir -> $aside")
    if (!fs.rename(staging, dir)) {
      fs.rename(aside, dir) // roll back: old table returns, staging remains
      throw new java.io.IOException(s"compaction swap failed: $staging -> $dir")
    }
    fs.delete(aside, true) // replacement live: old copy is now garbage
    (before, countFiles(dir))
  }

  /** Heal a [[compact]] swap interrupted between its two renames: if the
    * table path is absent but `<path>__precompact` exists, the original
    * data was renamed aside and never replaced — rename it back. Returns
    * true when a recovery was performed. Idempotent; called automatically
    * at the start of every [[compact]]. */
  def recoverCompact(spark: SparkSession, path: String): Boolean = {
    val dir = new org.apache.hadoop.fs.Path(path)
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val aside = new org.apache.hadoop.fs.Path(path + "__precompact")
    if (!fs.exists(dir) && fs.exists(aside)) { fs.rename(aside, dir); true }
    else false
  }

  /** Reuse `table` if the session's catalog already has it, else run
    * `build` (which is expected to create it). For store-backed queries the
    * build is the once-per-corpus bootstrap; the per-run unit of work is
    * everything downstream of the reload, and rebuilding history on every
    * execution would bench the bootstrap, not the operator. Callers MUST
    * key the table name by the source data (see `Dedup.dirKey`) — a bare
    * name would silently reuse a store built from a different directory. */
  def tableOrBuild(spark: SparkSession, table: String)(build: => DataFrame): DataFrame =
    if (spark.catalog.tableExists(table)) spark.table(table) else build

  /** Drop stale GENERATIONS of a content-keyed managed table: every
    * catalog table whose name starts with `prefix` other than `keep` —
    * the [[tableOrBuild]] complement of ModelStore's stale-artifact prune
    * (same rationale: a corpus regeneration changes the content key, and
    * without this every regeneration leaks a dead store-sized managed
    * table forever). Dropping a MANAGED table deletes its data. */
  def pruneStaleTables(spark: SparkSession, prefix: String, keep: String): Unit = {
    // list and drop in the SAME namespace: unqualified DROP resolves
    // against the session's current database, so listing a hard-coded
    // "default" would miss (or mis-target) when the current db differs
    val db = spark.catalog.currentDatabase
    spark.sessionState.catalog.listTables(db)
      .map(_.table)
      .filter(t => t.startsWith(prefix) && t != keep)
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS `$db`.`$t`"))
  }

  /** Recover the bucket count a table was written with — the read side of
    * the bucketing contract: a later session gets the exchange-free
    * bucket-join plan only if its `spark.sql.shuffle.partitions` matches
    * this recorded count (see [[graft.operators.Dedup.storeBuckets]]). */
  def bucketCount(spark: SparkSession, table: String): Option[Int] =
    spark.sessionState.catalog
      .getTableMetadata(org.apache.spark.sql.catalyst.TableIdentifier(table))
      .bucketSpec.map(_.numBuckets)

  /** Drop `table` and clear its DEFAULT managed location — but only when
    * that location is actually ours to clear: when the catalog entry is a
    * managed table (whose data lives there) or when no entry exists at all
    * (an orphan directory left by a dead JVM). An EXTERNAL entry's data
    * lives elsewhere and a default-path directory alongside it is not this
    * table's data, so it is left alone. */
  private def dropWithLocation(spark: SparkSession, table: String): Unit = {
    val catalog = spark.sessionState.catalog
    val id = org.apache.spark.sql.catalyst.TableIdentifier(table)
    val clearDefaultPath = !catalog.tableExists(id) ||
      catalog.getTableMetadata(id).tableType ==
        org.apache.spark.sql.catalyst.catalog.CatalogTableType.MANAGED
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    if (clearDefaultPath) {
      val loc = new org.apache.hadoop.fs.Path(catalog.defaultTablePath(id))
      val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(loc)) fs.delete(loc, true)
    }
  }
}
