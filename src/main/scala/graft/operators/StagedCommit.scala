package graft.operators

import org.apache.spark.sql.SparkSession

/** The ONE staged-commit engine shared by every persisted layout (the
  * dual observation store, the BM25 text index, the IVF-PQ vector
  * index). Each layout stages its expensive writes under
  * `_staging_<generation>`, commits by writing a manifest that LISTS
  * every staged piece, and this object supplies the common second half:
  *
  *  - [[applyPieces]]: swap each staged piece into the live tree by an
  *    idempotent rename (staged present → swap; already applied → skip;
  *    present in NEITHER place → fail loudly rather than commit a
  *    generation with pieces missing), bump the generation exactly once,
  *    drop the staging dir;
  *  - [[recover]]: resolve interrupted merges on open — a staging dir
  *    WITH a manifest is committed and replays; one WITHOUT is either a
  *    crash leftover or a merge a live writer is staging right now, so
  *    only the writer path (`deleteUncommitted = true`) may discard it.
  *
  * Everything runs under [[RecoveryLock]] (recovery always executes on
  * the driver), closing the delete+rename window between concurrent
  * recoverers of the same path. Keeping this logic in one place is
  * load-bearing: a crash-safety fix must reach every index at once, or
  * the layouts silently diverge in exactly the scenarios this exists
  * for. */
private[operators] object StagedCommit {

  /** A manifest whose write was torn mid-crash — the ONLY condition
    * [[recover]] may treat as "not committed" and discard. A dedicated
    * type so transient failures that also surface as
    * IllegalStateException (e.g. a stopped SparkContext during
    * shutdown) propagate instead of deleting a committed merge. */
  final class TornManifest(msg: String) extends IllegalStateException(msg)

  def readManifest(spark: SparkSession, staging: String): String = {
    val (f, p) = ObservationStore.fs(spark, s"$staging/_manifest.json")
    val in = f.open(p)
    try new String(in.readAllBytes(), "UTF-8") finally in.close()
  }

  /** Numeric manifest field; an absent field means the manifest write
    * was torn → [[TornManifest]] = "not committed". */
  def numField(manifest: String, name: String): Long =
    (""""""" + name + """"\s*:\s*(\d+)""").r.findFirstMatchIn(manifest)
      .getOrElse(throw new TornManifest(
        s"staged manifest missing $name: $manifest"))
      .group(1).toLong

  /** Optional numeric field (e.g. the streaming batch-id marker). */
  def optNumField(manifest: String, name: String): Option[Long] =
    (""""""" + name + """"\s*:\s*(\d+)""").r.findFirstMatchIn(manifest)
      .map(_.group(1).toLong)

  /** Comma-separated list field, None when absent (older manifests). */
  def listField(manifest: String, name: String): Option[Seq[String]] =
    (""""""" + name + """"\s*:\s*"([^"]*)"""").r.findFirstMatchIn(manifest)
      .map(_.group(1).split(",").toSeq.filter(_.nonEmpty))

  /** Stage schema-only EMPTY pieces into every directory in `targets`
    * with ONE Spark job: the limit-0 frame writes once (into the first
    * target) and the single footer-only parquet file it produced
    * fs-copies into the rest. Fully-dead partitions must stage explicit
    * empties (dynamic/pieced swaps would otherwise strand the live
    * files), and a mass takedown can kill THOUSANDS of buckets — one
    * serial limit-0 job per bucket is O(dead) driver job launches;
    * this is one job plus metadata-sized copies. */
  def stageEmptyPieces(spark: SparkSession,
      schemaOnly: org.apache.spark.sql.DataFrame,
      targets: Seq[String]): Unit = {
    if (targets.isEmpty) return
    schemaOnly.limit(0).coalesce(1)
      .write.mode("overwrite").parquet(targets.head)
    if (targets.sizeIs == 1) return
    val (f, hp) = ObservationStore.fs(spark, targets.head)
    val part = f.listStatus(hp).map(_.getPath)
      .find(_.getName.endsWith(".parquet"))
      .getOrElse(throw new IllegalStateException(
        s"stageEmptyPieces: no parquet file written at ${targets.head}"))
    val conf = spark.sessionState.newHadoopConf()
    targets.tail.foreach { t =>
      val (tf, tp) = ObservationStore.fs(spark, t)
      if (tf.exists(tp)) tf.delete(tp, true)
      tf.mkdirs(tp)
      org.apache.hadoop.fs.FileUtil.copy(f, part, tf,
        new org.apache.hadoop.fs.Path(tp, part.getName), false, conf): Unit
    }
  }

  /** Names of the partition subdirectories actually staged under
    * `dir` with the given prefix (e.g. "bucket=", "cluster=") — what a
    * writer records in the manifest as the authoritative piece list. */
  def stagedPartDirs(spark: SparkSession, dir: String,
      prefix: String): Seq[String] = {
    val (f, p) = ObservationStore.fs(spark, dir)
    if (!f.exists(p)) Seq.empty
    else f.listStatus(p).filter(s =>
        s.isDirectory && s.getPath.getName.startsWith(prefix))
      .map(_.getPath.getName).sorted.toSeq
  }

  /** Swap `pieces` (paths relative to BOTH the staging dir and the live
    * root, e.g. "by_rrname/bucket=3", "terms", "vectors/cluster=7")
    * from `staging` into `path`, then commit `targetGen` once and drop
    * the staging dir. Idempotent at every step — safe to replay from
    * any crash point, and tolerant of a concurrent recoverer winning an
    * individual rename.
    *
    * The swap never DELETES a live piece: the old `dest` is moved ASIDE
    * (atomic rename into `staging/_replaced/`) before the staged piece
    * renames in, so a concurrent recoverer of the same manifest cannot
    * destroy data — every piece exists in at least one of
    * {staging, live, aside} at every instant, interleavings at worst
    * strand a piece in the aside slot, and the aside branch below heals
    * that on replay. The aside copies die with the staging dir. */
  def applyPieces(spark: SparkSession, path: String, staging: String,
      pieces: Seq[String], targetGen: Long,
      readGen: () => Option[Long], writeGen: Long => Unit): Unit =
    RecoveryLock.withLock(path) {
      val (f, _) = ObservationStore.fs(spark, staging)
      pieces.foreach { rel =>
        val src = new org.apache.hadoop.fs.Path(s"$staging/$rel")
        val dest = new org.apache.hadoop.fs.Path(s"$path/$rel")
        val aside = new org.apache.hadoop.fs.Path(s"$staging/_replaced/$rel")
        if (f.exists(src)) {
          if (f.exists(dest)) {
            // only move a live piece aside while OUR manifest is still
            // live: a concurrent recoverer that finished this manifest
            // deletes the staging dir, and blindly recreating it would
            // park the committed piece in a manifest-less staging dir
            // (which a later writer-path recover would discard)
            if (!f.exists(new org.apache.hadoop.fs.Path(staging,
              "_manifest.json")))
              throw new java.io.IOException(
                s"staging $staging vanished mid-apply (concurrent " +
                  "recoverer finished this manifest) — aborting replay")
            f.mkdirs(aside.getParent)
            // the aside rename MUST be verified: on local/HDFS
            // filesystems, renaming into a still-existing non-empty
            // directory can NEST src under dest and report success —
            // silent corruption, strictly worse than failing here
            if (!f.rename(dest, aside) && f.exists(dest))
              throw new java.io.IOException(
                s"cannot move live piece aside: $dest -> $aside")
          }
          if (!f.rename(src, dest) && !(f.exists(dest) && !f.exists(src)))
            // a concurrent recoverer may win the rename between our
            // exists-checks — dest present + src gone is success
            throw new java.io.IOException(s"rename $src -> $dest failed")
        } else if (!f.exists(dest)) {
          // src gone, dest gone: an interleaved recoverer can strand the
          // freshly-applied piece in the aside slot (it moved dest aside
          // after the other's swap) — restore it before declaring corrupt
          if (!(f.exists(aside) && f.rename(aside, dest)))
            throw new java.io.IOException(
              s"staged merge corrupt: $rel missing from $staging, $path " +
                s"and the aside slot — refusing to commit " +
                s"generation $targetGen")
        }
      }
      // the generation commits LAST, and only once — recovery after a
      // crash between the swaps and this write re-enters with the same
      // target
      if (readGen().getOrElse(0L) < targetGen) writeGen(targetGen)
      f.delete(new org.apache.hadoop.fs.Path(staging), true)
      ()
    }

  /** Salvage committed pieces stranded in a staging dir's `_replaced`
    * slot before that dir is discarded: a recoverer that stalled while a
    * concurrent process finished the same manifest can park the ONLY
    * copy of a committed piece under `_replaced` of a re-created,
    * manifest-less staging dir (its own apply then fails loudly). A
    * stranded piece is recognizable by its live counterpart being
    * MISSING — restore it; a piece whose live counterpart exists is the
    * pre-merge data the swap replaced, and dies with the dir. */
  private def salvageAside(f: org.apache.hadoop.fs.FileSystem,
      staging: org.apache.hadoop.fs.Path, liveRoot: String): Unit = {
    def walk(aside: org.apache.hadoop.fs.Path,
        live: org.apache.hadoop.fs.Path, depth: Int): Unit = {
      if (!f.exists(live)) {
        f.mkdirs(live.getParent)
        if (!f.rename(aside, live) && !f.exists(live))
          throw new java.io.IOException(
            s"cannot restore stranded committed piece $aside -> $live")
      } else if (depth < 3 && f.getFileStatus(aside).isDirectory &&
        f.getFileStatus(live).isDirectory) {
        // live CONTAINER exists (e.g. by_rrname) — the stranded piece
        // may be a partition below it
        f.listStatus(aside).foreach(st => walk(st.getPath,
          new org.apache.hadoop.fs.Path(live, st.getPath.getName),
          depth + 1))
      }
    }
    val r = new org.apache.hadoop.fs.Path(staging, "_replaced")
    if (f.exists(r))
      f.listStatus(r).foreach(st => walk(st.getPath,
        new org.apache.hadoop.fs.Path(s"$liveRoot/${st.getPath.getName}"),
        1))
  }

  /** Resolve interrupted merges under `path`: committed staging (has a
    * manifest) replays through `applyFn`; unparsable manifests and
    * manifest-less staging are discarded ONLY on the writer path —
    * a reader may be looking at a live writer mid-stage/mid-manifest.
    * Every discard first salvages stranded `_replaced` pieces. */
  def recover(spark: SparkSession, path: String,
      deleteUncommitted: Boolean)(applyFn: String => Unit): Unit =
    RecoveryLock.withLock(path) {
      val (f, p) = ObservationStore.fs(spark, path)
      if (!f.exists(p)) return
      f.listStatus(p).filter(s =>
        s.isDirectory && s.getPath.getName.startsWith("_staging_"))
        .foreach { s =>
          val staging = s.getPath
          if (f.exists(new org.apache.hadoop.fs.Path(staging,
            "_manifest.json"))) {
            try applyFn(staging.toString)
            catch { case _: TornManifest =>
              // ONLY a provably-torn manifest may be discarded; any
              // other failure (including transient IllegalStateException
              // like a stopped SparkContext) propagates — deleting on it
              // would destroy a committed merge
              if (deleteUncommitted) {
                salvageAside(f, staging, path)
                f.delete(staging, true); ()
              }
            }
          } else if (deleteUncommitted) {
            salvageAside(f, staging, path)
            f.delete(staging, true)
            ()
          }
        }
    }
}
