package graft.operators

import java.sql.Timestamp

import scala.collection.concurrent.TrieMap

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.ParquetReadOptions
import org.apache.parquet.conf.HadoopParquetConfiguration
import org.apache.parquet.example.data.Group
import org.apache.parquet.example.data.simple.convert.GroupRecordConverter
import org.apache.parquet.filter2.compat.FilterCompat
import org.apache.parquet.filter2.predicate.{FilterApi, FilterPredicate}
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.metadata.ParquetMetadata
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.io.api.Binary
import org.apache.parquet.io.{ColumnIOFactory, MessageColumnIO}
import org.apache.parquet.schema.{LogicalTypeAnnotation, MessageType, PrimitiveType}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.XxHash64Function
import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String

import graft.model.Observation

/** Driver-local point-lookup reader over one sorted, hash-bucketed store
  * copy — the ms-class serving fast path. The reference answers a point
  * query with a seek + residual filters + limit
  * (`backend/balboa-rocksdb/rocksdb-impl.c:259-422`), not a distributed
  * job; the Spark-plan equivalent pays per-query driver planning + task
  * scheduling (~10 ms floor in local mode, measured in `BenchPoints`) for
  * a read that only ever touches ONE bucket directory. This reader does
  * exactly what that pruned plan would do — bucket-prune with the same
  * `xxhash64(key) % n`, Parquet row-group stats + dictionary filtering on
  * the sorted leading key, residual equality predicates pushed into the
  * record filter, stop at `limit` — on the serving thread with parquet-mr
  * (the same reader library Spark's scan uses underneath).
  *
  * Measured cost structure (sf0.1, 113 KB bucket file, local disk) and
  * the resulting design:
  *  - Hadoop's ChecksumFileSystem costs ~7 ms per file open → local
  *    paths read via java.nio ([[inputFile]]).
  *  - `ParquetReadOptions.builder()` constructs a fresh Hadoop
  *    `Configuration` per call (~7.7 ms) → ONE [[HadoopParquetConfiguration]]
  *    is built per reader and shared.
  *  - footer parse is ~1–15 ms → footers cache per file ([[footerCache]]),
  *    invalidated with the file map on epoch change.
  *  - with those amortized, a lookup is ~2 ms: dictionary-page check
  *    (misses prune the whole row group) + filtered assembly of matches.
  * Column-index (page-level) filtering is explicitly DISABLED: the
  * manual record loop below does not implement the row-range alignment
  * it requires, and with bucket files sorted on the key, block stats +
  * dictionary already prune misses.
  *
  * Scale stance: the bytes read are the SAME pruned set the Spark plan
  * reads (one bucket ≈ store/numBuckets, row-group-pruned below that);
  * the win is dropping per-query planning/scheduling, not skipping work.
  * Analytics-shaped queries (prefix, CIDR ranges, aliases, fan-out,
  * dumps) stay on the Spark plan path where distribution pays for
  * itself. On a real cluster the serving driver holds the bucket→file
  * map + footers (numBuckets entries — metadata, not data) and streams
  * at most `limit` rows per query.
  *
  * Staleness: file map + footer cache are revalidated against the
  * store's committed epoch at most every [[PointReader.EpochCheckMillis]]
  * — [[ObservationStore.mergeBatch]]/expire swap whole bucket
  * directories, so a stale map surfaces as a vanished file, which also
  * triggers an immediate relist-and-retry (never a wrong answer: renames
  * are the store's commit mechanism, a listed file either has
  * pre-merge-complete content or does not exist).
  */
final class PointReader private[operators] (
    spark: SparkSession,
    storePath: String,
    copy: String, // "by_rrname" | "by_rdata"
    keyCol: String,
    numBuckets: Int) {

  private val copyPath = s"$storePath/$copy"
  private val hadoopConf =
    new Configuration(spark.sparkContext.hadoopConfiguration)
  private val parquetConf = new HadoopParquetConfiguration(hadoopConf)

  /** bucket id → parquet file paths, listed lazily per bucket. */
  private val filesByBucket = new TrieMap[Long, Seq[Path]]()

  /** file path → parsed footer + column IO (reused across lookups; both
    * are immutable after construction and safe to share across serving
    * threads). Bounded by the store's file count; dropped on epoch
    * change alongside [[filesByBucket]]. */
  private val footerCache =
    new TrieMap[String, (ParquetMetadata, MessageColumnIO)]()
  @volatile private var lastEpochCheck = 0L
  @volatile private var lastEpoch = -1L

  // Projection + type validation, derived once from the first data file's
  // footer: serving returns the 7 observation columns (the inverted copy
  // also persists rdata_ip/rdata_ip6 — layout-only, never returned) and
  // requires INT64 TIMESTAMP timestamps (what writeCopy produces under
  // `outputTimestampType=TIMESTAMP_MICROS`). A store written with any
  // other shape disables the fast path (projection = None) instead of
  // returning differently-typed results than the plan path.
  private lazy val projection: Option[MessageType] = {
    val cols = Seq("rrname", "sensor_id", "rrtype", "rdata", "count",
      "first_seen", "last_seen")
    try {
      anyDataFile().flatMap { f =>
        val r = ParquetFileReader.open(inputFile(f))
        val schema =
          try r.getFooter.getFileMetaData.getSchema
          finally r.close()
        val fields = cols.flatMap { c =>
          if (schema.containsField(c))
            Some(schema.getType(schema.getFieldIndex(c)))
          else None
        }
        def tsOk(name: String): Boolean = schema.containsField(name) &&
          (schema.getType(schema.getFieldIndex(name)) match {
            case p: PrimitiveType =>
              p.getPrimitiveTypeName == PrimitiveType.PrimitiveTypeName.INT64 &&
                p.getLogicalTypeAnnotation
                  .isInstanceOf[LogicalTypeAnnotation.TimestampLogicalTypeAnnotation]
            case _ => false
          })
        if (fields.size != cols.size || !tsOk("first_seen") || !tsOk("last_seen"))
          None
        else Some(new MessageType(schema.getName, fields: _*))
      }
    } catch { case _: Exception => None }
  }

  /** Whether this store copy can serve driver-local lookups. */
  def available: Boolean = projection.isDefined

  /** InputFile for a store file: local paths bypass the Hadoop
    * ChecksumFileSystem (java.nio reads — measured ~7 ms saved per file
    * open on a 113 KB file); hdfs://, s3a:// etc. go through
    * HadoopInputFile. */
  private def inputFile(p: Path): org.apache.parquet.io.InputFile = {
    val uri = p.toUri
    if (uri.getScheme == null || uri.getScheme == "file")
      new org.apache.parquet.io.LocalInputFile(
        java.nio.file.Paths.get(uri.getPath))
    else HadoopInputFile.fromPath(p, hadoopConf)
  }

  private def anyDataFile(): Option[Path] = {
    val (f, p) = ObservationStore.fs(spark, copyPath)
    if (!f.exists(p)) return None
    f.listStatus(p).iterator
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("bucket="))
      .flatMap(d => f.listStatus(d.getPath))
      .find(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
      .map(_.getPath)
  }

  private def bucketOf(key: String): Long = {
    val h = XxHash64Function.hash(UTF8String.fromString(key), StringType, 42L)
    val n = numBuckets.toLong
    ((h % n) + n) % n
  }

  private def listBucket(bucket: Long): Seq[Path] = {
    val (f, p) = ObservationStore.fs(spark, s"$copyPath/bucket=$bucket")
    if (!f.exists(p)) Seq.empty
    else f.listStatus(p).iterator
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
      .map(_.getPath).toSeq
  }

  /** Drop cached file lists + footers when the store's committed epoch
    * moved (checked at most every [[PointReader.EpochCheckMillis]]). */
  private def ensureFresh(): Unit = {
    val now = System.currentTimeMillis()
    if (now - lastEpochCheck < PointReader.EpochCheckMillis) return
    lastEpochCheck = now
    val epoch = ObservationStore.readEpoch(spark, storePath).getOrElse(-1L)
    if (epoch != lastEpoch) {
      lastEpoch = epoch
      filesByBucket.clear()
      footerCache.clear()
    }
  }

  private def predicate(key: String,
      residual: Seq[(String, String)]): FilterPredicate =
    ((keyCol, key) +: residual).map { case (c, v) =>
      FilterApi.eq(FilterApi.binaryColumn(c),
        Binary.fromString(v)): FilterPredicate
    }.reduce(FilterApi.and)

  private def tsOf(micros: Long): Timestamp = {
    val t = new Timestamp(Math.floorDiv(micros, 1000000L) * 1000L)
    t.setNanos((Math.floorMod(micros, 1000000L) * 1000L).toInt)
    t
  }

  private def str(g: Group, c: String): String =
    if (g.getFieldRepetitionCount(c) == 0) null
    else g.getBinary(c, 0).toStringUsingUTF8

  /** Point lookup: key equality on this copy's leading column plus
    * residual string-equality filters, capped at `limit`. Semantics match
    * `ObservationStore.entries` on the same store exactly (the
    * `PointReaderSpec` contract). */
  def lookup(key: String, residual: Seq[(String, String)],
      limit: Int): Vector[Observation] = {
    val proj = projection.getOrElse(
      throw new IllegalStateException("fast path unavailable"))
    ensureFresh()
    val bucket = bucketOf(key)
    // An EMPTY cached list never touches a file, so the vanished-file
    // retry below can't fire for it — a merge that populates the bucket
    // would otherwise serve stale misses for up to EpochCheckMillis.
    // Relisting an empty bucket is one cheap directory stat, so always
    // relist rather than trusting an empty cache entry.
    val cached = filesByBucket.getOrElseUpdate(bucket, listBucket(bucket))
    val files =
      if (cached.nonEmpty) cached
      else {
        val fresh = listBucket(bucket)
        filesByBucket.put(bucket, fresh)
        fresh
      }
    try readFiles(files, proj, key, residual, limit)
    catch {
      // vanished file = concurrent committed merge swapped this bucket:
      // drop caches for it, relist once and retry (see staleness note)
      case _: java.io.FileNotFoundException | _: java.nio.file.NoSuchFileException =>
        files.foreach(f => footerCache.remove(f.toString))
        val fresh = listBucket(bucket)
        filesByBucket.put(bucket, fresh)
        readFiles(fresh, proj, key, residual, limit)
    }
  }

  private def footerAndIo(p: Path, proj: MessageType)
      : (ParquetMetadata, MessageColumnIO) =
    footerCache.getOrElseUpdate(p.toString, {
      val r = ParquetFileReader.open(inputFile(p))
      val footer = try r.getFooter finally r.close()
      val io = new ColumnIOFactory()
        .getColumnIO(proj, footer.getFileMetaData.getSchema)
      (footer, io)
    })

  private def readFiles(files: Seq[Path], proj: MessageType, key: String,
      residual: Seq[(String, String)], limit: Int): Vector[Observation] = {
    val out = Vector.newBuilder[Observation]
    var n = 0
    val filter = FilterCompat.get(predicate(key, residual))
    // one cheap options object per lookup (the filter is per-query);
    // building from the prebuilt ParquetConfiguration avoids the
    // fresh-Configuration cost, and column-index filtering stays off
    // (row-range alignment — see class doc)
    val opts = ParquetReadOptions.builder(parquetConf)
      .withRecordFilter(filter)
      .useColumnIndexFilter(false)
      .build()
    val it = files.iterator
    while (it.hasNext && n < limit) {
      val path = it.next()
      val (footer, columnIO) = footerAndIo(path, proj)
      val in = inputFile(path)
      val reader = new ParquetFileReader(in, footer, opts, in.newStream())
      try {
        reader.setRequestedSchema(proj)
        var pages = reader.readNextFilteredRowGroup()
        while (pages != null && n < limit) {
          val rr = columnIO.getRecordReader(pages,
            new GroupRecordConverter(proj), filter)
          val rows = pages.getRowCount
          var i = 0L
          while (i < rows && n < limit) {
            val g = rr.read()
            if (!rr.shouldSkipCurrentRecord && g != null) {
              out += Observation(
                str(g, "rrname"), str(g, "sensor_id"), str(g, "rrtype"),
                str(g, "rdata"), g.getLong("count", 0),
                tsOf(g.getLong("first_seen", 0)),
                tsOf(g.getLong("last_seen", 0)))
              n += 1
            }
            i += 1
          }
          pages =
            if (n < limit) reader.readNextFilteredRowGroup() else null
        }
      } finally reader.close()
    }
    out.result()
  }
}

object PointReader {
  /** How long a cached bucket→file map may be used before revalidating
    * against the store's committed epoch. */
  val EpochCheckMillis: Long = 2000L
}
