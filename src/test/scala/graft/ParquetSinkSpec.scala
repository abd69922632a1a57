package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.ParquetSink

/** Write-path semantics: partitioned layout round-trips losslessly and a
  * partition-key predicate prunes at the directory level (no data files of
  * other partitions are even listed into the scan). */
class ParquetSinkSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark

  private def scanOf(df: org.apache.spark.sql.DataFrame): FileSourceScanExec = {
    val plan = df.queryExecution.executedPlan
    val scans = plan.collect { case s: FileSourceScanExec => s } ++
      plan.collect { case a: AdaptiveSparkPlanExec =>
        a.executedPlan.collect { case s: FileSourceScanExec => s } }.flatten
    scans.head
  }

  test("partitioned write round-trips and prunes partitions on read") {
    val dir = Files.createTempDirectory("graft-sink").toFile.getAbsolutePath
    val src = Tables.orders(spark, "/root/testdata/sf0.001")
    val reloaded = ParquetSink.writePartitioned(src, s"$dir/orders_p", "o_orderstatus")
    // lossless round-trip (column order differs: partition cols move last)
    assert(reloaded.count() === src.count())
    val a = src.select("o_orderkey", "o_orderstatus").collect().map(_.toSeq).toSet
    val b = reloaded.select("o_orderkey", "o_orderstatus").collect().map(_.toSeq).toSet
    assert(a === b)
    // predicate on the partition key becomes a partitionFilter, not a data filter
    val filtered = reloaded.filter(col("o_orderstatus") === "F")
    val scan = scanOf(filtered)
    assert(scan.partitionFilters.nonEmpty, "status predicate must prune partitions")
    val statuses = src.select("o_orderstatus").distinct().count()
    assert(statuses > 1, "test requires multiple partitions")
    assert(filtered.count() ===
      src.filter(col("o_orderstatus") === "F").count())
  }

  test("bucketed write joins without an exchange on the bucket key") {
    val src = Tables.customer(spark, "/root/testdata/sf0.001")
    val t1 = ParquetSink.writeBucketed(src, "cust_b1", "c_custkey", 4)
    val t2 = ParquetSink.writeBucketed(
      src.select(col("c_custkey"), col("c_acctbal")), "cust_b2", "c_custkey", 4)
    // force the shuffle-join path: broadcast would bypass bucketing entirely
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = t1.join(t2, "c_custkey")
      val shuffles = joined.queryExecution.executedPlan.toString
        .linesIterator.count(_.contains("ShuffleExchange"))
      assert(shuffles === 0, "same-bucketing join must plan with zero shuffles")
      assert(joined.count() === src.count())
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("bucketed write is idempotent: rewrite and orphaned warehouse dir") {
    import spark.implicits._
    val df = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    // same-session rewrite: second call overwrites the first
    ParquetSink.writeBucketed(df, "idem_t", "k", 2)
    val again = ParquetSink.writeBucketed(df.filter(col("k") === 1L), "idem_t", "k", 2)
    assert(again.count() === 1)
    // orphaned-location case: the driver's failure mode — a fresh JVM's
    // in-memory catalog has no entry for the table, but the managed location
    // survives on disk from a prior process. Simulate by dropping the
    // catalog entry while leaving the directory behind.
    ParquetSink.writeBucketed(df, "idem_orphan", "k", 2)
    val loc = new java.io.File(
      spark.sessionState.catalog.defaultTablePath(
        org.apache.spark.sql.catalyst.TableIdentifier("idem_orphan")))
    spark.sessionState.catalog.dropTable(
      org.apache.spark.sql.catalyst.TableIdentifier("idem_orphan"),
      ignoreIfNotExists = false, purge = false)
    if (!loc.exists()) { // dropTable purged the managed dir: recreate the orphan
      loc.mkdirs()
      java.nio.file.Files.write(loc.toPath.resolve("stale"), Array[Byte](1))
    }
    assert(loc.exists(), "orphaned location must be on disk for this test")
    val reloaded = ParquetSink.writeBucketed(df, "idem_orphan", "k", 2)
    assert(reloaded.count() === 2)
  }

  test("failed overwrite leaves the previous table intact (staging swap)") {
    import spark.implicits._
    val good = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    ParquetSink.writeBucketed(good, "swap_t", "k", 2)
    // a df that throws during evaluation — the write must fail BEFORE the
    // live table is touched (r5 advice: the fingerprint store is the
    // pipeline's only dedup history; a failed refresh must not destroy it)
    val boom = udf((k: Long) => { throw new RuntimeException("boom"); k })
    val bad = good.select(boom(col("k")).as("k"), col("v"))
    intercept[Exception] { ParquetSink.writeBucketed(bad, "swap_t", "k", 2) }
    val survived = spark.table("swap_t")
    assert(survived.count() === 2)
    assert(survived.select("v").as[String].collect().sorted === Array("a", "b"))
    // and the staging table does not linger after a successful write
    ParquetSink.writeBucketed(good.filter(col("k") === 1L), "swap_t", "k", 2)
    assert(spark.table("swap_t").count() === 1)
    assert(!spark.catalog.tableExists("swap_t__staging"))
  }

  test("mergeBucketed: update replaces, insert lands, unmatched store rows carry over") {
    import spark.implicits._
    val store = Seq((1L, "old-1"), (2L, "keep-2"), (3L, "keep-3")).toDF("k", "v")
    ParquetSink.writeBucketed(store, "merge_t", "k", 2)
    val batch = Seq((1L, "new-1"), (9L, "ins-9")).toDF("k", "v")
    val merged = ParquetSink.mergeBucketed(batch, "merge_t", "k")
    val rows = merged.as[(Long, String)].collect().sortBy(_._1)
    assert(rows === Array((1L, "new-1"), (2L, "keep-2"), (3L, "keep-3"), (9L, "ins-9")))
    // the merged generation keeps the bucket layout — the next probe or
    // merge must stay exchange-free, so this is part of the contract
    assert(ParquetSink.bucketCount(spark, "merge_t") === Some(2))
    // idempotent: re-merging the same keyed batch is a fixpoint (the
    // crash-replay posture — a retried batch must not duplicate or churn)
    val again = ParquetSink.mergeBucketed(batch, "merge_t", "k")
    assert(again.as[(Long, String)].collect().sortBy(_._1) === rows)
  }

  test("mergeBucketed: failed batch evaluation leaves the store generation intact") {
    import spark.implicits._
    val store = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    ParquetSink.writeBucketed(store, "merge_crash_t", "k", 2)
    val boom = udf((k: Long) => { throw new RuntimeException("boom"); k })
    val bad = store.select(boom(col("k")).as("k"), col("v"))
    intercept[Exception] { ParquetSink.mergeBucketed(bad, "merge_crash_t", "k") }
    // the staging swap fired only after the merged write committed, so the
    // pre-merge generation — the store's only history — survives untouched
    val survived = spark.table("merge_crash_t").as[(Long, String)].collect().sortBy(_._1)
    assert(survived === Array((1L, "a"), (2L, "b")))
  }

  test("mergeBucketed: the store side of the merge never exchanges (bucketed " +
      "scan probed in place; only the batch shuffles)") {
    import spark.implicits._
    val store = Tables.customer(spark, "/root/testdata/sf0.001")
      .select(col("c_custkey").as("k"), col("c_name").as("v"))
    ParquetSink.writeBucketed(store, "merge_plan_t", "k", 4)
    val batch = Seq((1L, "updated"), (99999L, "inserted")).toDF("k", "v")
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      // the exact anti-join+union plan mergeBucketed evaluates, pre-write
      val merged = spark.table("merge_plan_t")
        .join(batch.select(col("k")), Seq("k"), "left_anti")
        .unionByName(batch)
      merged.collect()
      val root = merged.queryExecution.executedPlan
      val plan = root.collectFirst {
        case a: AdaptiveSparkPlanExec => a.executedPlan
      }.getOrElse(root).toString
      val hashExchanges = plan.linesIterator.count(_.contains("Exchange hashpartitioning"))
      assert(hashExchanges === 1, s"store side must not shuffle:\n$plan")
      assert(plan.contains("Bucketed: true"), s"store scan must be bucketed:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("mergePartitionedBucketed rewrites ONLY partitions containing batch " +
      "keys: untouched partitions' files stay byte-identical on disk") {
    import spark.implicits._
    // part = k % 3 — a pure function of the key (the layout contract)
    val store = (0L until 30L).map(k => (k, s"old-$k", k % 3)).toDF("k", "v", "part")
    ParquetSink.writePartitionedBucketed(store, "pmerge_t", "part", "k", 2)
    assert(ParquetSink.bucketCount(spark, "pmerge_t") === Some(2))
    val loc = new java.io.File(
      spark.sessionState.catalog.defaultTablePath(
        org.apache.spark.sql.catalyst.TableIdentifier("pmerge_t")))
    def snapshot(part: String): Map[String, (Long, String)] = {
      val dir = new java.io.File(loc, part)
      dir.listFiles().filter(_.getName.endsWith(".parquet")).map { f =>
        val bytes = java.nio.file.Files.readAllBytes(f.toPath)
        val sum = java.security.MessageDigest.getInstance("MD5").digest(bytes)
          .map("%02x".format(_)).mkString
        f.getName -> ((f.length(), sum))
      }.toMap
    }
    val before0 = snapshot("part=0")
    val before2 = snapshot("part=2")
    assert(before0.nonEmpty && before2.nonEmpty, "fixture writes every partition")
    // the batch touches only part=1 keys: update k=1, insert k=31 (31%3=1)
    val batch = Seq((1L, "new-1", 1L), (31L, "ins-31", 1L)).toDF("k", "v", "part")
    val merged = ParquetSink.mergePartitionedBucketed(batch, "pmerge_t", "part", "k")
    val got = merged.select("k", "v").as[(Long, String)].collect().toMap
    assert(got(1L) === "new-1" && got(31L) === "ins-31", "replace + insert land")
    assert(got(4L) === "old-4" && got(0L) === "old-0" && got.size === 31,
      s"same-partition and other-partition store rows carry over: ${got.size}")
    // THE claim: untouched partitions were never rewritten
    assert(snapshot("part=0") === before0, "part=0 files byte-identical")
    assert(snapshot("part=2") === before2, "part=2 files byte-identical")
    // re-merging the same keyed batch is a fixpoint (crash-replay posture)
    val again = ParquetSink.mergePartitionedBucketed(batch, "pmerge_t", "part", "k")
    assert(again.select("k", "v").as[(Long, String)].collect().toMap === got)
    // and the keyed-batch precondition holds here too
    val unkeyed = Seq((1L, "x", 1L), (1L, "y", 1L)).toDF("k", "v", "part")
    val e = intercept[IllegalArgumentException] {
      ParquetSink.mergePartitionedBucketed(unkeyed, "pmerge_t", "part", "k")
    }
    assert(e.getMessage.contains("mergePartitionedBucketed"))
  }

  test("optimizePartition: merges maintain the numBuckets layout, append " +
      "cadence degrades it, optimize restores exactly ONE partition to " +
      "numBuckets bucketed files with untouched partitions byte-identical " +
      "and bucket joins still exchange-free") {
    import spark.implicits._
    val nb = 2
    val store = (0L until 30L).map(k => (k, s"old-$k", k % 3)).toDF("k", "v", "part")
    ParquetSink.writePartitionedBucketed(store, "popt_t", "part", "k", nb)
    val loc = new java.io.File(
      spark.sessionState.catalog.defaultTablePath(
        org.apache.spark.sql.catalyst.TableIdentifier("popt_t")))
    def files(part: String): Seq[java.io.File] = {
      val dir = new java.io.File(loc, part)
      if (!dir.exists()) Seq.empty
      else dir.listFiles().filter(_.getName.endsWith(".parquet")).sortBy(_.getName).toSeq
    }
    def snapshot(part: String): Map[String, (Long, String)] =
      files(part).map { f =>
        val sum = java.security.MessageDigest.getInstance("MD5")
          .digest(java.nio.file.Files.readAllBytes(f.toPath))
          .map("%02x".format(_)).mkString
        f.getName -> ((f.length(), sum))
      }.toMap
    // the MERGE cadence never degrades the layout: consecutive merges keep
    // the touched partition at exactly numBuckets files (each dynamic
    // overwrite replaces it with one file per bucket)
    for (i <- 1 to 2) {
      val batch = Seq((1L, s"m$i", 1L)).toDF("k", "v", "part")
      ParquetSink.mergePartitionedBucketed(batch, "popt_t", "part", "k")
      assert(files("part=1").size === nb,
        s"merge $i keeps the numBuckets invariant")
    }
    // the APPEND cadence does: each append adds files to the partitions it
    // touches (the streaming-sink / multi-writer ingest shape)
    for (i <- 1 to 3)
      Seq((100L + 3 * i, s"app$i", 1L)).toDF("k", "v", "part")
        .write.insertInto("popt_t")
    assert(files("part=1").size > nb,
      s"append cadence accumulated files: ${files("part=1").size}")
    val contentBefore = spark.table("popt_t").select("k", "v")
      .as[(Long, String)].collect().toMap
    val before0 = snapshot("part=0")
    val before2 = snapshot("part=2")
    val (fBefore, fAfter) = ParquetSink.optimizePartition(spark, "popt_t", "part", 1L)
    assert(fBefore > nb && fAfter === nb,
      s"partition bin-packed back to the bucket layout: $fBefore -> $fAfter")
    assert(files("part=1").size === nb)
    // content identical, untouched partitions never rewritten
    assert(spark.table("popt_t").select("k", "v").as[(Long, String)]
      .collect().toMap === contentBefore, "optimize moves bytes, not rows")
    assert(snapshot("part=0") === before0, "part=0 files byte-identical")
    assert(snapshot("part=2") === before2, "part=2 files byte-identical")
    // the rewritten partition still carries the BUCKETED layout: a keyed
    // join probes the store scan in place (no store-side exchange)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val probe = Seq((1L, "p"), (103L, "p")).toDF("k", "p")
      val j = spark.table("popt_t").filter(col("part") === 1L)
        .join(probe.select(col("k")), Seq("k"), "left_semi")
      j.collect()
      val root = j.queryExecution.executedPlan
      val plan = root.collectFirst {
        case a: AdaptiveSparkPlanExec => a.executedPlan
      }.getOrElse(root).toString
      assert(plan.linesIterator.count(_.contains("Exchange hashpartitioning")) === 1,
        s"store side must not shuffle after optimize:\n$plan")
      assert(plan.contains("Bucketed: true"), s"store scan must stay bucketed:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    // and the merge path keeps working on the optimized partition
    val merged = ParquetSink.mergePartitionedBucketed(
      Seq((103L, "post-opt", 1L)).toDF("k", "v", "part"), "popt_t", "part", "k")
    val got = merged.select("k", "v").as[(Long, String)].collect().toMap
    assert(got(103L) === "post-opt" && got.size === contentBefore.size,
      "merge after optimize: replace lands, nothing lost")
    // a partition with no files is a no-op receipt, not an error
    assert(ParquetSink.optimizePartition(spark, "popt_t", "part", 99L) === ((0, 0)))
    // but a mistyped partition COLUMN fails loud — a silent (0,0) would
    // read as "nothing to optimize" and the spiral goes unrepaired
    val typo = intercept[IllegalArgumentException] {
      ParquetSink.optimizePartition(spark, "popt_t", "prt", 1L)
    }
    assert(typo.getMessage.contains("partitioned by"))
    // the EMPTY STRING is Spark's other alias for the default partition
    // (getPartitionPathString maps "" to __HIVE_DEFAULT_PARTITION__, read
    // back as NULL): countFiles would count the null slice while the
    // equality filter selects zero rows — a misleading (N, N) "nothing
    // repacked" receipt, so it rejects like null does (r17 ADVICE)
    val empty = intercept[IllegalArgumentException] {
      ParquetSink.optimizePartition(spark, "popt_t", "part", "")
    }
    assert(empty.getMessage.contains("null/empty"))
  }

  test("optimizePartition: a partition VALUE Spark escapes in directory " +
      "names (space, colon) resolves to the real on-disk directory — the " +
      "repair runs instead of silently no-opping (0,0) on a path that " +
      "does not exist (r16 ADVICE)") {
    import spark.implicits._
    val nb = 2
    val hot = "2024-01-01 10:00" // space + ':' both URL-escape in the dir name
    val store = (0L until 20L).map(k => (k, s"v$k", hot)).toDF("k", "v", "part")
    ParquetSink.writePartitionedBucketed(store, "popt_esc_t", "part", "k", nb)
    // the on-disk directory is the ESCAPED form — the raw s"part=$hot"
    // path genuinely does not exist
    val loc = new java.io.File(
      spark.sessionState.catalog.defaultTablePath(
        org.apache.spark.sql.catalyst.TableIdentifier("popt_esc_t")))
    assert(!new java.io.File(loc, s"part=$hot").exists(),
      "precondition: the unescaped directory must not exist")
    // degrade with append cadence, then repair
    for (i <- 1 to 3)
      Seq((100L + i, s"app$i", hot)).toDF("k", "v", "part")
        .write.insertInto("popt_esc_t")
    val (before, after) = ParquetSink.optimizePartition(
      spark, "popt_esc_t", "part", hot)
    assert(before > nb && after === nb,
      s"escaped-value partition found and bin-packed: $before -> $after")
    assert(spark.table("popt_esc_t").count() === 23L, "no rows lost")
  }

  test("mergeBucketed: refuses an UNKEYED batch with a named error (the " +
      "one-row-per-key store invariant is load-bearing)") {
    import spark.implicits._
    ParquetSink.writeBucketed(Seq((1L, "a")).toDF("k", "v"), "merge_unkeyed_t", "k", 2)
    val unkeyed = Seq((1L, "x"), (1L, "y")).toDF("k", "v")
    val e = intercept[IllegalArgumentException] {
      ParquetSink.mergeBucketed(unkeyed, "merge_unkeyed_t", "k")
    }
    assert(e.getMessage.contains("more than once"))
    // and the store generation was not touched
    assert(spark.table("merge_unkeyed_t").count() === 1L)
  }

  test("mergeBucketed: refuses an unbucketed target with a named error") {
    import spark.implicits._
    val flat = Seq((1L, "a")).toDF("k", "v")
    ParquetSink.writeTable(flat, "merge_flat_t")
    val e = intercept[IllegalArgumentException] {
      ParquetSink.mergeBucketed(flat, "merge_flat_t", "k")
    }
    assert(e.getMessage.contains("not a bucketed table"))
  }

  test("bucket count is recoverable from the catalog (cross-session contract)") {
    import spark.implicits._
    val df = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
    ParquetSink.writeBucketed(df, "bc_t", "k", 3)
    assert(ParquetSink.bucketCount(spark, "bc_t") === Some(3))
  }

  test("z-clustered write opens strictly fewer row groups than lexico under a 2-D predicate") {
    // The layout_zorder audit made real (r8 verdict item 4): same grid
    // coordinates as Layout.audit (custkey & 255, order-day & 255), same
    // query rectangle, but the "buckets" are now actual parquet row groups
    // and the hit counts come from the files' own footer min-max stats —
    // the statistics a lakehouse scan planner prunes by.
    val dir = Files.createTempDirectory("graft-zorder").toFile.getAbsolutePath
    val mask = 255L
    val src = Tables.orders(spark, "/root/testdata/sf0.01").select(
      col("o_orderkey"),
      col("o_custkey").bitwiseAND(lit(mask)).as("x"),
      datediff(col("o_orderdate"), lit("1992-01-01").cast("date"))
        .cast("long").bitwiseAND(lit(mask)).as("y"))
    // 256 files = the same bucket granularity the layout_zorder audit
    // measures (12/256 z vs 31/256 lexico); at coarser granularity (e.g.
    // 64 files) quadrant-boundary slop can erase the z margin on this
    // rectangle — granularity is part of the layout design, not a tunable
    val nFiles = 256
    val z = ParquetSink.writeClustered(src, s"$dir/z", "x", "y", nFiles, bits = 8)
    val lex = ParquetSink.writeLayout(src, s"$dir/lex", nFiles, col("x"), col("y"))
    // both layouts round-trip the data
    assert(z.count() === src.count())
    assert(lex.count() === src.count())
    // the audited rectangle: both dimensions selective (Layout's Xq/Yq)
    val (zHit, zTotal) = ParquetSink.rowGroupsHit(spark, s"$dir/z", "x", "y", 50, 80, 100, 150)
    val (lexHit, lexTotal) = ParquetSink.rowGroupsHit(spark, s"$dir/lex", "x", "y", 50, 80, 100, 150)
    assert(zTotal === lexTotal, "same file-count dial must yield the same row-group count")
    assert(zHit < lexHit,
      s"z-order must open strictly fewer row groups ($zHit vs lexico $lexHit of $zTotal)")
    // and on a minor-dimension-only predicate the lexico layout collapses
    // to a full scan (every x-major file spans the full y range) while the
    // z layout still prunes — the whole reason to interleave
    val (zY, _) = ParquetSink.rowGroupsHit(spark, s"$dir/z", "x", "y", 0, mask, 100, 150)
    val (lexY, _) = ParquetSink.rowGroupsHit(spark, s"$dir/lex", "x", "y", 0, mask, 100, 150)
    assert(zY < lexY,
      s"y-only predicate: z must beat lexico ($zY vs $lexY of $zTotal)")
  }

  test("hilbert-clustered write opens fewer real row groups than z-order") {
    // layout_hilbert made real: same grid coordinates, same rectangle,
    // hits counted from actual parquet footer min-max stats. The range
    // exchange cuts the key space by row count (unaligned runs), the
    // regime where Hilbert's grid-adjacent walk beats Morton's diagonal
    // seams — the model sweep (194/200 rectangles) pinned at the audit's
    // fixed rectangle on real files.
    val dir = Files.createTempDirectory("graft-hilbert").toFile.getAbsolutePath
    val mask = 255L
    val src = Tables.orders(spark, "/root/testdata/sf0.01").select(
      col("o_orderkey"),
      col("o_custkey").bitwiseAND(lit(mask)).as("x"),
      datediff(col("o_orderdate"), lit("1992-01-01").cast("date"))
        .cast("long").bitwiseAND(lit(mask)).as("y"))
    val nFiles = 256
    val h = ParquetSink.writeClusteredHilbert(src, s"$dir/h", "x", "y", nFiles, bits = 8)
    ParquetSink.writeClustered(src, s"$dir/z", "x", "y", nFiles, bits = 8)
    assert(h.count() === src.count())
    val (hHit, hTotal) = ParquetSink.rowGroupsHit(spark, s"$dir/h", "x", "y", 50, 80, 100, 150)
    val (zHit, zTotal) = ParquetSink.rowGroupsHit(spark, s"$dir/z", "x", "y", 50, 80, 100, 150)
    assert(hHit < zHit,
      s"hilbert must open fewer row groups ($hHit/$hTotal vs z $zHit/$zTotal)")
  }

  test("compaction bin-packs small files losslessly and stages the swap") {
    val dir = Files.createTempDirectory("graft-compact").toFile.getAbsolutePath
    val path = s"$dir/events_small"
    val src = Tables.orders(spark, "/root/testdata/sf0.01")
    src.repartition(40).write.parquet(path) // the streaming-ingest litter shape
    val checksum = src.agg(sum(crc32(concat_ws("|",
      col("o_orderkey"), col("o_custkey"), col("o_totalprice")))))
      .collect()(0).getLong(0)
    val (before, after) = ParquetSink.compact(spark, path, 32L << 20)
    assert(before === 40)
    assert(after < before, s"compaction must reduce files ($before -> $after)")
    // at a 32 MiB target this sf0.01 table fits in very few bins
    assert(after <= 4, s"expected near-total consolidation, got $after files")
    // lossless: same rows, same values
    val re = spark.read.parquet(path)
    assert(re.count() === src.count())
    assert(re.agg(sum(crc32(concat_ws("|",
      col("o_orderkey"), col("o_custkey"), col("o_totalprice")))))
      .collect()(0).getLong(0) === checksum)
    // no staging residue after the swap
    assert(!new java.io.File(path + "__compact").exists())
    // idempotent: an already-compacted directory stays put
    val (b2, a2) = ParquetSink.compact(spark, path, 32L << 20)
    assert(b2 === after && a2 <= b2)
  }

  test("compaction swap is crash-safe: interrupted swap recovers, old data never deleted first") {
    val dir = Files.createTempDirectory("graft-compact-crash").toFile.getAbsolutePath
    val path = s"$dir/t"
    val src = Tables.orders(spark, "/root/testdata/sf0.001")
    src.repartition(8).write.parquet(path)
    val rows = src.count()
    // simulate the crash window: compact renamed the live dir aside and
    // died before renaming the staging copy in — the worst reachable state
    // under the rename-aside + rename-in discipline (the pre-fix
    // delete-then-rename could lose the table entirely)
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.rename(new org.apache.hadoop.fs.Path(path),
      new org.apache.hadoop.fs.Path(path + "__precompact")))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(path)))
    // explicit recovery restores the table readable and complete
    assert(ParquetSink.recoverCompact(spark, path))
    assert(spark.read.parquet(path).count() === rows)
    assert(!ParquetSink.recoverCompact(spark, path), "recovery is idempotent")
    // and compact() self-heals the same state before doing its work
    assert(fs.rename(new org.apache.hadoop.fs.Path(path),
      new org.apache.hadoop.fs.Path(path + "__precompact")))
    val (before, after) = ParquetSink.compact(spark, path, 32L << 20)
    assert(before === 8 && after < before)
    assert(spark.read.parquet(path).count() === rows)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(path + "__precompact")),
      "no aside residue after a successful swap")
    assert(!fs.exists(new org.apache.hadoop.fs.Path(path + "__compact")),
      "no staging residue after a successful swap")
  }

  /** ADVICE r11 (low): the Hilbert clustered writer must accept the same
    * integral input types as the Z-order twin — INT grid coordinates
    * previously failed HilbertD's (bigint, bigint) analysis check while
    * writeClustered's shift/mask tree widened implicitly. */
  test("writeClusteredHilbert accepts INT coordinate columns like the z twin") {
    val dir = Files.createTempDirectory("graft-hilbert-int").toFile.getAbsolutePath
    val src = Tables.orders(spark, "/root/testdata/sf0.001").select(
      col("o_orderkey"),
      col("o_custkey").bitwiseAND(lit(15L)).cast("int").as("x"),
      datediff(col("o_orderdate"), lit("1992-01-01").cast("date"))
        .bitwiseAND(lit(15)).cast("int").as("y"))
    val h = ParquetSink.writeClusteredHilbert(src, s"$dir/h", "x", "y", 4, bits = 4)
    assert(h.count() === src.count())
    ParquetSink.writeClustered(src, s"$dir/z", "x", "y", 4, bits = 4)
    assert(spark.read.parquet(s"$dir/z").count() === src.count())
  }
}
