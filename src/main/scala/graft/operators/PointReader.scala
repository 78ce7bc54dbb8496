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
  * Column-index (page-level) filtering is ON (see [[readFiles]]): the
  * store writes 64 KB pages sorted on the key, so a hit decodes the
  * 1–2 pages overlapping the key range, not the whole row group.
  *
  * Scale stance: the bytes read are the SAME pruned set the Spark plan
  * reads (one bucket ≈ store/numBuckets, row-group-pruned below that);
  * the win is dropping per-query planning/scheduling, not skipping work.
  * Point lookups and prefix seeks serve here; analytics-shaped queries
  * (CIDR ranges, fan-out, dumps) stay on the Spark plan path where
  * distribution pays for itself. On a real cluster the serving driver holds the bucket→file
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

  /** file path → ((decoded key-column dictionary per row group, whether
    * its entries are ascending), approx bytes). None for a row group
    * whose key chunk has non-dictionary pages. Read ONCE per file and
    * then answering exact key/prefix membership with zero I/O —
    * strictly stronger than the parquet bloom (no false positives) and
    * than per-query DictionaryFilter (which re-reads the dictionary
    * page every lookup). Store files are written SORTED on the key, so
    * dictionary ids follow first-occurrence = key order and the
    * membership probe is a BINARY SEARCH (O(log n) per file per query,
    * verified once at decode; an unsorted dictionary — foreign file —
    * falls back to the linear scan): at 100× the keys a prefix fan
    * stays O(buckets·log) instead of rescanning every distinct key.
    * Same lifecycle as [[footerCache]], but BYTE-BOUNDED: a prefix fan
    * touches every file, and unbounded caching would pin the store's
    * whole distinct key column in driver heap (data-sized memory —
    * against this class's metadata-only stance). When admission would
    * overflow [[PointReader.DictCacheBytes]] the cache CLEARS AND
    * READMITS (hot files re-enter on their next lookup) — true LRU
    * would serialize the lock-free read path on every hit; a full
    * clear once per budget cycle keeps reads lock-free and bounds the
    * over-budget cost to one repeat decode per file per cycle, never
    * the permanent admission freeze of an admission-only cache. */
  private val dictCache =
    new TrieMap[String, (Seq[Option[(Array[Array[Byte]], Boolean)]], Long)]()
  private val dictCacheBytes = new java.util.concurrent.atomic.AtomicLong(0)
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
      // NOT parquet's LocalInputFile: its stream is an unbuffered
      // RandomAccessFile, and thrift parsing (page headers, column/
      // offset indexes, footers) reads it byte-by-byte — profiled at
      // 63% of a prefix seek spent in read0 syscalls. The buffered
      // wrapper turns those into one 64 KB positional read per region.
      new PointReader.BufferedLocalInputFile(
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
      dictCache.synchronized {
        dictCache.clear()
        dictCacheBytes.set(0)
      }
    }
  }

  private def predicate(key: String,
      residual: Seq[(String, String)]): FilterPredicate =
    ((keyCol, key) +: residual).map { case (c, v) =>
      FilterApi.eq(FilterApi.binaryColumn(c),
        Binary.fromString(v)): FilterPredicate
    }.reduce(FilterApi.and)

  private def prefixPredicate(prefix: String,
      residual: Seq[(String, String)]): FilterPredicate = {
    val pfx: FilterPredicate = FilterApi.userDefined(
      FilterApi.binaryColumn(keyCol),
      new PointReader.StartsWithPredicate(
        prefix.getBytes(java.nio.charset.StandardCharsets.UTF_8)))
    residual.foldLeft(pfx) { case (acc, (c, v)) =>
      FilterApi.and(acc, FilterApi.eq(FilterApi.binaryColumn(c),
        Binary.fromString(v)))
    }
  }

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
    val kb = key.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    readBucket(bucketOf(key), proj, predicate(key, residual), limit,
      (entries, sorted) =>
        if (sorted) PointReader.containsSorted(entries, kb)
        else entries.exists(java.util.Arrays.equals(_, kb)))
  }

  /** Prefix range scan: every observation whose `keyCol` starts with
    * `prefix`, plus residual equality filters, capped at `limit` — the
    * reference's forward scan IS a prefix seek
    * (`backend/balboa-rocksdb/rocksdb-impl.c:345-354`), so serving it
    * should not pay the Spark-plan floor either. `xxhash64(key) % n`
    * bucketing cannot prune a prefix (hashing destroys key order), so
    * the reader fans over ALL buckets; within each sorted bucket file
    * the [[PointReader.StartsWithPredicate]] bounds the candidate row
    * groups from footer min/max stats (a `[prefix, nextPrefix)` range
    * check), prunes via dictionary pages, and keeps only true prefix
    * matches — the same pruning the pruned Spark scan would do, minus
    * the per-query planning/scheduling. Result order is per-bucket file
    * order (callers needing an order sort, exactly as with the plan
    * path's unordered scan + limit). */
  def prefixLookup(prefix: String, residual: Seq[(String, String)],
      limit: Int): Vector[Observation] = {
    val proj = projection.getOrElse(
      throw new IllegalStateException("fast path unavailable"))
    ensureFresh()
    val pred = prefixPredicate(prefix, residual)
    val pb = prefix.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val anyEntry = (entries: Array[Array[Byte]], sorted: Boolean) =>
      if (sorted) PointReader.anyPrefixSorted(entries, pb)
      else entries.exists(PointReader.startsWith(_, pb))
    if (numBuckets <= 1)
      readBucket(0L, proj, pred, limit, anyEntry, trackFan = true)
    else {
      // the buckets are INDEPENDENT reads (every cache here is a
      // TrieMap — the same concurrency the multi-worker serving path
      // already exercises), so fan them over the shared bounded pool:
      // a serial walk pays bucket-count × per-file latency for what is
      // mostly dictionary-pruned no-ops plus a handful of real reads.
      // Per-bucket cap stays the full limit (no cross-bucket early exit
      // in parallel); when the limit binds both paths already return an
      // arbitrary subset, and concatenation keeps bucket order so the
      // non-binding case is byte-identical to the serial walk.
      val futures = (0L until numBuckets).map { b =>
        PointReader.prefixFanPool.submit(
          new java.util.concurrent.Callable[Vector[Observation]] {
            def call(): Vector[Observation] =
              readBucket(b, proj, pred, limit, anyEntry, trackFan = true)
          })
      }
      futures.flatMap(_.get()).take(limit).toVector
    }
  }

  /** May this file contain a matching key? Answered from the cached
    * decoded dictionary with zero I/O after the first consultation —
    * a row group whose key chunk is not fully dictionary-encoded (or
    * whose dictionary failed to read) conservatively answers yes. */
  private def mayContain(p: Path,
      anyEntry: (Array[Array[Byte]], Boolean) => Boolean): Boolean = {
    val dicts = dictCache.get(p.toString) match {
      case Some((d, _)) =>
        PointReader.dictCacheHits.incrementAndGet()
        d
      case None =>
        PointReader.dictCacheDecodes.incrementAndGet()
        val d = readDicts(p)
        val sz = d.iterator.flatten.map(_._1)
          .flatten.map(_.length.toLong + 16L).sum
        // admission and the byte counter move together under one lock
        // (reads stay lock-free): an unsynchronized put racing the
        // epoch-invalidation clear below would leak phantom bytes into
        // the counter — entries gone, budget consumed — and admission
        // would eventually stop forever (permanent repeat-I/O, the
        // exact regression the cache prevents)
        dictCache.synchronized {
          if (dictCacheBytes.get() + sz > PointReader.DictCacheBytes &&
            sz <= PointReader.DictCacheBytes) {
            // budget exhausted: clear-and-readmit (see dictCache doc) —
            // without this, files created after the budget fills would
            // NEVER cache and pay dictionary read+decode on every lookup
            dictCache.clear()
            dictCacheBytes.set(0)
          }
          if (dictCacheBytes.get() + sz <= PointReader.DictCacheBytes &&
            dictCache.putIfAbsent(p.toString, (d, sz)).isEmpty)
            dictCacheBytes.addAndGet(sz): Unit
        }
        d
    }
    dicts.exists {
      case Some((entries, sorted)) => anyEntry(entries, sorted)
      case None                    => true
    }
  }

  private def readDicts(p: Path): Seq[Option[(Array[Array[Byte]], Boolean)]] =
    try {
      val r = ParquetFileReader.open(inputFile(p))
      try {
        val schema = r.getFooter.getFileMetaData.getSchema
        if (!schema.containsField(keyCol)) return Seq(None)
        val desc = schema.getColumnDescription(Array(keyCol))
        import scala.jdk.CollectionConverters._
        r.getFooter.getBlocks.asScala.toSeq.map { block =>
          block.getColumns.asScala
            .find(_.getPath.toDotString == keyCol)
            .flatMap { chunk =>
              val st = chunk.getEncodingStats
              if (st == null || st.hasNonDictionaryEncodedPages) None
              else {
                // widen to the public interface: the concrete
                // DictionaryPageReader is package-private
                val ds: org.apache.parquet.column.page.DictionaryPageReadStore =
                  r.getDictionaryReader(block)
                Option(ds.readDictionaryPage(desc))
                  .map { page =>
                    val dict = page.getEncoding.initDictionary(desc, page)
                    val entries = Array.tabulate(dict.getMaxId + 1)(i =>
                      dict.decodeToBinary(i).getBytes)
                    (entries, PointReader.isAscending(entries))
                  }
              }
            }
        }
      } finally r.close()
    } catch { case _: Exception => Seq(None) }

  private def readBucket(bucket: Long, proj: MessageType,
      pred: FilterPredicate, limit: Int,
      anyEntry: (Array[Array[Byte]], Boolean) => Boolean,
      trackFan: Boolean = false): Vector[Observation] = {
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
    val live = files.filter(mayContain(_, anyEntry))
    if (trackFan) {
      PointReader.fanBucketsTotal.incrementAndGet()
      if (live.nonEmpty) PointReader.fanBucketsRead.incrementAndGet(): Unit
    }
    try readFiles(live, proj, pred, limit)
    catch {
      // vanished file = concurrent committed merge swapped this bucket:
      // drop caches for it, relist once and retry (see staleness note)
      case _: java.io.FileNotFoundException | _: java.nio.file.NoSuchFileException =>
        files.foreach { f =>
          footerCache.remove(f.toString)
          dictCache.synchronized {
            dictCache.remove(f.toString)
              .foreach(e => dictCacheBytes.addAndGet(-e._2): Unit)
          }
        }
        val fresh = listBucket(bucket)
        filesByBucket.put(bucket, fresh)
        readFiles(fresh.filter(mayContain(_, anyEntry)), proj, pred, limit)
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

  private def readFiles(files: Seq[Path], proj: MessageType,
      pred: FilterPredicate, limit: Int): Vector[Observation] = {
    val out = Vector.newBuilder[Observation]
    var n = 0
    val filter = FilterCompat.get(pred)
    // one cheap options object per lookup (the filter is per-query);
    // building from the prebuilt ParquetConfiguration avoids the
    // fresh-Configuration cost. Column-index (page-level) filtering is
    // ON: with 512-row pages (bloomOpts) a lookup decodes only the
    // pages overlapping the key range — parquet-mr ≥1.11 aligns rows
    // across columns itself when the page store carries row indexes
    // (MessageColumnIO.getRecordReader + pages.getRowIndexes), so the
    // manual record loop below needs no extra bookkeeping; pinned by
    // PointReaderSpec's multi-page store case. Dictionary and bloom
    // row-group filtering are OFF: [[mayContain]]'s cached decoded
    // dictionary already answered exact membership with no I/O, while
    // parquet's own levels re-read dictionary/bloom pages every query
    // (profiled at ~15% of a prefix seek).
    val opts = ParquetReadOptions.builder(parquetConf)
      .withRecordFilter(filter)
      .useColumnIndexFilter(true)
      .useDictionaryFilter(false)
      .useBloomFilter(false)
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

  /** Prefix-fan pruning telemetry (cumulative across all readers):
    * of the buckets a prefix fan visited, how many actually had a
    * candidate file after the cached-dictionary prune (i.e. opened
    * data). `graft.Bench` snapshots these around its prefix phase —
    * the falsifiable form of "a selective prefix touches few buckets
    * even though hash bucketing can't prune the fan". */
  private[graft] val fanBucketsTotal =
    new java.util.concurrent.atomic.AtomicLong(0)
  private[graft] val fanBucketsRead =
    new java.util.concurrent.atomic.AtomicLong(0)

  /** Dictionary-cache telemetry (cumulative across all readers):
    * hits answer the membership probe with zero I/O; decodes re-read
    * and re-decode a file's key dictionary (first touch, epoch
    * invalidation, or a clear-and-readmit budget cycle). `graft.Bench`
    * snapshots these around its serving phases — if a round's qps
    * moves, the decode count says whether the dict cache (stampeding
    * re-decodes) or something else (scheduler, disk, CPU clocks) did
    * it. */
  private[graft] val dictCacheHits =
    new java.util.concurrent.atomic.AtomicLong(0)
  private[graft] val dictCacheDecodes =
    new java.util.concurrent.atomic.AtomicLong(0)

  /** Is `entries` ascending in unsigned byte order? True by
    * construction for this store's files (written sorted on the key,
    * so dictionary ids follow first-occurrence order); verified once
    * per decode so a foreign/unsorted file degrades to the linear
    * probe instead of returning wrong prunes. */
  private[graft] def isAscending(entries: Array[Array[Byte]]): Boolean = {
    var i = 1
    while (i < entries.length) {
      if (java.util.Arrays.compareUnsigned(entries(i - 1), entries(i)) > 0)
        return false
      i += 1
    }
    true
  }

  /** First index whose entry is >= `target` (unsigned byte order). */
  private def lowerBound(entries: Array[Array[Byte]],
      target: Array[Byte]): Int = {
    var lo = 0
    var hi = entries.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (java.util.Arrays.compareUnsigned(entries(mid), target) < 0)
        lo = mid + 1
      else hi = mid
    }
    lo
  }

  private[graft] def containsSorted(entries: Array[Array[Byte]],
      key: Array[Byte]): Boolean = {
    val i = lowerBound(entries, key)
    i < entries.length && java.util.Arrays.equals(entries(i), key)
  }

  /** Any entry starting with `prefix`? Sorted case: entries with the
    * prefix form the contiguous range [prefix, prefix∞), so the entry
    * at the prefix's lower bound either starts with it or nothing
    * does. */
  private[graft] def anyPrefixSorted(entries: Array[Array[Byte]],
      prefix: Array[Byte]): Boolean = {
    val i = lowerBound(entries, prefix)
    i < entries.length && startsWith(entries(i), prefix)
  }

  private[graft] def startsWith(e: Array[Byte],
      prefix: Array[Byte]): Boolean = {
    if (e.length < prefix.length) return false
    var i = 0
    while (i < prefix.length) {
      if (e(i) != prefix(i)) return false
      i += 1
    }
    true
  }

  /** Upper bound on retained decoded key dictionaries across all files
    * (approx bytes). 256 MB holds ~10⁷ typical DNS keys with overhead —
    * plenty for the dictionaries that matter, a rounding error against
    * a serving driver's heap, and a hard ceiling against pinning a
    * 100 TB store's key column in memory. */
  val DictCacheBytes: Long =
    sys.props.get("graft.pointreader.dictCacheMB")
      .flatMap(s => scala.util.Try(s.toLong).toOption)
      .getOrElse(256L) * 1024L * 1024L

  /** Shared bounded pool for the prefix bucket fan-out — sized small
    * (the reads are I/O-bound and dictionary-pruned; more threads than
    * this just queue on the disk) and daemon so it never pins a JVM.
    * Serving threads block on their own fan's futures only (no nested
    * submits), so a bounded pool cannot deadlock. */
  private[operators] lazy val prefixFanPool =
    java.util.concurrent.Executors.newFixedThreadPool(
      math.min(8, Runtime.getRuntime.availableProcessors()),
      (r: Runnable) => {
        val t = new Thread(r, "graft-prefix-fan")
        t.setDaemon(true)
        t
      })

  /** Local parquet InputFile whose streams buffer reads (64 KB window,
    * positional FileChannel reads). parquet-mr's own LocalInputFile
    * hands thrift an unbuffered RandomAccessFile, so metadata parsing
    * degenerates into per-byte syscalls; this wrapper serves small
    * reads from the window and bypasses it for reads ≥ the window size
    * (data-page region reads stay single-syscall). Streams are
    * single-threaded (one per lookup), the underlying channel reads are
    * positional. */
  private[graft] final class BufferedLocalInputFile(
      p: java.nio.file.Path, bufSize: Int = 64 * 1024)
      extends org.apache.parquet.io.InputFile {
    override def getLength: Long = java.nio.file.Files.size(p)
    override def newStream(): org.apache.parquet.io.SeekableInputStream =
      new BufferedSeekableStream(
        java.nio.channels.FileChannel.open(p,
          java.nio.file.StandardOpenOption.READ), bufSize)
  }

  private final class BufferedSeekableStream(
      ch: java.nio.channels.FileChannel, bufSize: Int)
      extends org.apache.parquet.io.SeekableInputStream {
    private val buf = java.nio.ByteBuffer.allocate(bufSize)
    private var winStart = 0L
    private var winLen = 0
    private var pos = 0L

    private def inWindow: Boolean =
      pos >= winStart && pos < winStart + winLen

    /** Reposition the window at `pos`; returns bytes available. */
    private def fill(): Int = {
      winStart = pos
      buf.clear()
      var n = ch.read(buf, pos)
      winLen = math.max(n, 0)
      winLen
    }

    override def getPos: Long = pos
    override def seek(newPos: Long): Unit = pos = newPos

    override def read(): Int = {
      if (!inWindow && fill() <= 0) return -1
      val b = buf.get((pos - winStart).toInt) & 0xff
      pos += 1
      b
    }

    override def read(b: Array[Byte], off: Int, len: Int): Int = {
      if (len == 0) return 0
      if (!inWindow) {
        if (len >= bufSize) { // large read: straight to the channel
          val n = ch.read(java.nio.ByteBuffer.wrap(b, off, len), pos)
          if (n > 0) pos += n
          return n
        }
        if (fill() <= 0) return -1
      }
      val avail = (winStart + winLen - pos).toInt
      val n = math.min(avail, len)
      System.arraycopy(buf.array(), (pos - winStart).toInt, b, off, n)
      pos += n
      n
    }

    override def readFully(bytes: Array[Byte]): Unit =
      readFully(bytes, 0, bytes.length)

    override def readFully(bytes: Array[Byte], start: Int, len: Int)
        : Unit = {
      var o = start
      var rem = len
      while (rem > 0) {
        val n = read(bytes, o, rem)
        if (n < 0) throw new java.io.EOFException(
          s"EOF at $pos reading $len bytes")
        o += n
        rem -= n
      }
    }

    override def read(dst: java.nio.ByteBuffer): Int = {
      if (!dst.hasRemaining) return 0
      if (inWindow) {
        val avail = (winStart + winLen - pos).toInt
        val n = math.min(avail, dst.remaining())
        dst.put(buf.array(), (pos - winStart).toInt, n)
        pos += n
        n
      } else if (dst.remaining() >= bufSize) {
        val n = ch.read(dst, pos)
        if (n > 0) pos += n
        n
      } else {
        if (fill() <= 0) -1 else read(dst)
      }
    }

    override def readFully(dst: java.nio.ByteBuffer): Unit =
      while (dst.hasRemaining)
        if (read(dst) < 0) throw new java.io.EOFException(
          s"EOF at $pos filling ${dst.remaining()} bytes")

    override def close(): Unit = ch.close()
  }

  /** `startsWith(prefix)` as a parquet user-defined predicate over a
    * UTF-8 BINARY column. Byte-level: a whole-codepoint UTF-8 prefix of
    * the character string is exactly a byte prefix of the encoding (and
    * parquet orders BINARY/UTF8 stats by unsigned bytes), so both the
    * value test and the stats pruning work on raw bytes:
    *  - values with the prefix lie in `[prefix, nextPrefix)` where
    *    `nextPrefix` increments the last non-0xff byte and truncates —
    *    a row group whose `max < prefix` or `min >= nextPrefix` drops
    *    from footer stats alone;
    *  - dictionary-encoded pages drop when no dictionary entry keeps.
    */
  private[operators] final class StartsWithPredicate(
      prefix: Array[Byte])
      extends org.apache.parquet.filter2.predicate.UserDefinedPredicate[Binary]
      with java.io.Serializable {

    private def cmp(a: Array[Byte], b: Array[Byte]): Int = {
      val n = math.min(a.length, b.length)
      var i = 0
      while (i < n) {
        val d = (a(i) & 0xff) - (b(i) & 0xff)
        if (d != 0) return d
        i += 1
      }
      a.length - b.length
    }

    /** Smallest byte string greater than EVERY string with this prefix;
      * None when the prefix is all 0xff (no upper bound exists). */
    private val upper: Option[Array[Byte]] = {
      var i = prefix.length - 1
      while (i >= 0 && prefix(i) == 0xff.toByte) i -= 1
      if (i < 0) None
      else {
        val u = java.util.Arrays.copyOf(prefix, i + 1)
        u(i) = (u(i) + 1).toByte
        Some(u)
      }
    }

    override def keep(value: Binary): Boolean = {
      if (value == null) return false
      val v = value.getBytesUnsafe
      if (v.length < prefix.length) return false
      var i = 0
      while (i < prefix.length) {
        if (v(i) != prefix(i)) return false
        i += 1
      }
      true
    }

    override def canDrop(
        st: org.apache.parquet.filter2.predicate.Statistics[Binary])
        : Boolean = {
      val min = st.getMin.getBytesUnsafe
      val max = st.getMax.getBytesUnsafe
      cmp(max, prefix) < 0 || upper.exists(u => cmp(min, u) >= 0)
    }

    /** For NOT(startsWith): droppable only when every value in
      * [min, max] has the prefix — i.e. the whole range sits inside
      * `[prefix, nextPrefix)`. */
    override def inverseCanDrop(
        st: org.apache.parquet.filter2.predicate.Statistics[Binary])
        : Boolean = {
      val min = st.getMin.getBytesUnsafe
      val max = st.getMax.getBytesUnsafe
      cmp(min, prefix) >= 0 && upper.exists(u => cmp(max, u) < 0)
    }
  }
}
