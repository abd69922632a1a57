package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Train-once persistence for model artifacts (ANN codebooks, the NB
  * quality-classifier fit, the langid prediction table): any deterministic
  * derived table that several queries consume is built ONCE per corpus
  * content and served from parquet afterwards — the serving posture real
  * pipelines run (models are fit on a schedule, not per query), and the
  * reason a suite of N model-consuming queries costs one fit, not N.
  *
  * Generalized from the ANN family's codebook store (round 8) so any
  * source table can key an artifact, with the same three disciplines:
  *
  *  - STALENESS: the artifact directory name embeds a content fingerprint
  *    of the source table's files (name, length, mtime) — regenerating the
  *    corpus in place produces a new key, so nothing stale ever serves,
  *    and stale generations of the same tag are pruned on sight.
  *  - CRASH SAFETY: a directory without its `_SUCCESS` marker is a crashed
  *    write and is rebuilt; builds land in a dot-prefixed temp dir and
  *    enter via one atomic rename, so two drivers sharing a warehouse race
  *    to a single winner and the loser reads the winner's artifact.
  *  - ORACLE REACH: [[fsPath]] exposes the scheme-stripped filesystem path
  *    so a DuckDB oracle can `read_parquet` the artifact directly — the
  *    trained serving paths stay hash-checked, not self-reported. */
object ModelStore {

  /** Content fingerprint of `dir/table` — every underlying file's
    * (name, length, mtime), md5'd to 12 hex chars. */
  def contentKey(s: SparkSession, dir: String, table: String): String = {
    val src = new org.apache.hadoop.fs.Path(s"$dir/$table")
    val fs = src.getFileSystem(s.sparkContext.hadoopConfiguration)
    val listing = new StringBuilder(dir)
    def walk(p: org.apache.hadoop.fs.Path): Unit =
      fs.listStatus(p).sortBy(_.getPath.getName).foreach { st =>
        if (st.isDirectory) walk(st.getPath)
        else listing.append(st.getPath.getName).append(':')
          .append(st.getLen).append(':').append(st.getModificationTime).append(';')
      }
    if (fs.getFileStatus(src).isDirectory) walk(src)
    else {
      val st = fs.getFileStatus(src)
      listing.append(st.getLen).append(':').append(st.getModificationTime)
    }
    java.security.MessageDigest.getInstance("MD5")
      .digest(listing.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(12)
  }

  /** Serve the `tag` artifact keyed on `dir/table`'s content, building it
    * (and persisting to the warehouse) only if absent or stale. */
  def getOrBuild(s: SparkSession, dir: String, table: String, tag: String)(
      build: => DataFrame): DataFrame = {
    val key = contentKey(s, dir, table)
    val path = s"${s.conf.get("spark.sql.warehouse.dir")}/graft_codebook_${tag}_$key"
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    // prune stale generations of this tag: a corpus regeneration changes
    // the key, and without this every regeneration leaks a dead
    // graft_codebook_${tag}_* directory forever (advisor round 7)
    val parent = p.getParent
    if (fs.exists(parent)) fs.listStatus(parent).foreach { st =>
      val nm = st.getPath.getName
      if (nm.startsWith(s"graft_codebook_${tag}_") && nm != p.getName)
        fs.delete(st.getPath, true)
    }
    val marker = new org.apache.hadoop.fs.Path(p, "_SUCCESS")
    if (fs.exists(p) && !fs.exists(marker)) fs.delete(p, true) // crashed write self-heals
    if (!fs.exists(p)) {
      // build into a dot-prefixed temp dir (never matches the prune
      // pattern), then rename into place: two concurrent drivers pointed
      // at one warehouse race to a single atomic rename — last writer
      // loses cleanly and reads the winner's artifact (advisor round 7)
      val tmp = new org.apache.hadoop.fs.Path(
        s"${s.conf.get("spark.sql.warehouse.dir")}/.graft_tmp_${tag}_${key}_${java.util.UUID.randomUUID}")
      build.write.parquet(tmp.toString)
      if (!fs.rename(tmp, p)) fs.delete(tmp, true)
    }
    s.read.parquet(path)
  }

  /** Resolved filesystem path of a [[getOrBuild]] artifact, scheme-stripped
    * so a DuckDB oracle can `read_parquet` it directly. */
  def fsPath(s: SparkSession, dir: String, table: String, tag: String): String = {
    val w = s.conf.get("spark.sql.warehouse.dir")
    val base =
      if (w.matches("^[a-zA-Z][a-zA-Z0-9+.-]*:.*")) new java.net.URI(w).getPath
      else w
    s"$base/graft_codebook_${tag}_${contentKey(s, dir, table)}"
  }
}
