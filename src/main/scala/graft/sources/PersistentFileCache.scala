package graft.sources

import scala.collection.mutable

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/**
 * Cross-restart processed-file metadata cache — the warm-start layer
 * the reference keeps in front of its storage readers
 * (src/persistent_cache.rs:54-289: versioned entries, access
 * tracking, generation counter, age expiry, periodic persistence,
 * recovery on startup). Graft's parse-once parquet store +
 * [[IncrementalIngest]]'s byte-offset checkpoint already make
 * re-parsing cheap; what this adds is the restart story for the
 * LISTING layer: a directory of 100k historical logs costs one
 * `getFileStatus` storm per process start unless something remembers
 * which (path, mtime, size) triples were already ingested.
 *
 * Spark-native shape — deliberate departures from the reference:
 *  - State persists as a TSV through the Hadoop `FileSystem` API with
 *    the tmp-write + rename-swap discipline every graft checkpoint
 *    uses (works on HDFS/S3A, not just local disk), instead of JSON
 *    on the local FS.
 *  - No background tokio task: a driver-side library must not own
 *    threads. Callers invoke [[maybeFlush]] on their scan cadence —
 *    it persists only when dirty AND the persistence interval elapsed
 *    (persistent_cache.rs:160-188's loop, inverted into a pull).
 *  - The clock is injectable so expiry/interval logic is spec-testable
 *    without sleeping.
 *
 * Entry semantics: [[getFile]] returns a hit only when the caller's
 * observed (modTime, size) MATCH the cached triple — a changed file is
 * a miss (and the stale entry is dropped), so "cached" always means
 * "this exact byte state was already processed". Hits update access
 * stats (persistent_cache.rs:246-261). Eviction: least-recently-
 * accessed beyond `maxEntries` (the reference bounds by serialized MB;
 * an entry count is the same bound without sizeof guesswork). Expiry:
 * entries older than `maxAgeSecs` since last scan are dropped at
 * recovery and at flush (persistent_cache.rs:136-157).
 */
class PersistentFileCache(spark: SparkSession, cacheDir: String,
                          maxEntries: Int = 1 << 20,
                          maxAgeSecs: Long = 7L * 86400,
                          persistIntervalSecs: Long = 300,
                          clock: () => Long = () => System.currentTimeMillis() / 1000) {

  /** One cached file: the byte-state triple + access metadata
   *  (persistent_cache.rs:17-29 without the redundant version field —
   *  the TSV header carries the schema version once). */
  case class Entry(modTime: Long, size: Long, lastScanned: Long,
                   var lastAccess: Long, var accessCount: Long,
                   generation: Long)

  private val fileCache = mutable.LinkedHashMap.empty[String, Entry]
  private val appCache = mutable.LinkedHashMap.empty[String, Long]
  private var generation = 0L
  private var dirty = false
  private var lastFlush = clock()

  private val cachePath = new Path(cacheDir, "file_cache.tsv")
  private val appPath = new Path(cacheDir, "app_cache.tsv")
  private def fs(p: Path): FileSystem =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  recover()

  /** Load both caches from disk, dropping expired entries — the
   *  startup recovery + validation pass
   *  (persistent_cache.rs:88-157). Malformed final lines are dropped
   *  (torn-write tolerance, same rule as the ingest checkpoint);
   *  malformed interior lines throw. */
  private def recover(): Unit = synchronized {
    val now = clock()
    readTsv(cachePath).foreach { parts =>
      if (parts.length >= 7) {
        val e = Entry(parts(1).toLong, parts(2).toLong, parts(3).toLong,
          parts(4).toLong, parts(5).toLong, parts(6).toLong)
        if (now - e.lastScanned < maxAgeSecs) fileCache.put(parts(0), e)
        else dirty = true
        generation = math.max(generation, e.generation)
      }
    }
    readTsv(appPath).foreach { parts =>
      if (parts.length >= 2) appCache.put(parts(0), parts(1).toLong)
    }
  }

  private def readTsv(p: Path): Seq[Array[String]] = {
    val f = fs(p)
    if (!f.exists(p)) Seq.empty
    else {
      val in = f.open(p)
      val txt = try scala.io.Source.fromInputStream(in).mkString finally in.close()
      val lines = txt.linesIterator.filter(_.nonEmpty).toVector
      lines.zipWithIndex.flatMap { case (line, i) =>
        val parts = line.split("\t", -1)
        // numeric validation: a torn FINAL line is dropped, interior
        // corruption throws (IncrementalIngest.loadState discipline)
        try { parts.tail.foreach(_.toLong); Some(parts) }
        catch {
          case e: NumberFormatException =>
            if (i == lines.size - 1) None else throw e
        }
      }
    }
  }

  /** Record a processed file's byte state (persistent_cache.rs:224-244). */
  def putFile(path: String, modTime: Long, size: Long): Unit = synchronized {
    val now = clock()
    fileCache.remove(path)
    fileCache.put(path, Entry(modTime, size, now, now, 1L, generation))
    while (fileCache.size > maxEntries) {
      // the map's insertion order IS access order (hits re-insert), so
      // the head is the least-recently-accessed entry — O(1) eviction;
      // a minBy scan here turns a listing storm past capacity quadratic
      fileCache.remove(fileCache.head._1)
    }
    dirty = true
  }

  /** Hit only when the observed byte state matches; a stale entry is
   *  dropped so the caller re-processes. Hits bump access stats. */
  def getFile(path: String, modTime: Long, size: Long): Option[Entry] = synchronized {
    fileCache.get(path) match {
      case Some(e) if e.modTime == modTime && e.size == size =>
        e.accessCount += 1
        e.lastAccess = clock()
        // move to back: keeps insertion order == access order so
        // putFile's eviction head is always the true LRU entry
        fileCache.remove(path)
        fileCache.put(path, e)
        dirty = true
        Some(e)
      case Some(_) =>
        fileCache.remove(path)
        dirty = true
        None
      case None => None
    }
  }

  /** The files in `observed` (path, modTime, size) NOT already cached
   *  at that exact byte state — the one-call warm-start filter a
   *  reader runs over its listing before parsing anything. */
  def filterUnprocessed(observed: Seq[(String, Long, Long)]): Seq[String] =
    observed.collect {
      case (p, m, s) if getFile(p, m, s).isEmpty => p
    }

  def putApp(appId: String, lastUpdated: Long): Unit = synchronized {
    appCache.put(appId, lastUpdated); dirty = true
  }
  def getApp(appId: String): Option[Long] = synchronized(appCache.get(appId))

  /** Drop everything and bump the generation counter
   *  (persistent_cache.rs:28 `cache_generation` — entries written
   *  before an invalidation are distinguishable after recovery). */
  def invalidateAll(): Unit = synchronized {
    fileCache.clear(); appCache.clear(); generation += 1; dirty = true
  }

  /** Persist when dirty AND the interval elapsed — call on the scan
   *  cadence; cheap no-op otherwise. Returns true when a flush ran. */
  def maybeFlush(): Boolean = synchronized {
    if (dirty && clock() - lastFlush >= persistIntervalSecs) { flush(); true }
    else false
  }

  /** Force persistence (graceful shutdown — persistent_cache.rs:269-274).
   *  Expired entries are dropped on the way out. */
  def flush(): Unit = synchronized {
    val now = clock()
    fileCache.filterInPlace { case (_, e) => now - e.lastScanned < maxAgeSecs }
    writeTsv(cachePath, fileCache.iterator.map { case (k, e) =>
      s"$k\t${e.modTime}\t${e.size}\t${e.lastScanned}\t${e.lastAccess}\t${e.accessCount}\t${e.generation}"
    })
    writeTsv(appPath, appCache.iterator.map { case (k, v) => s"$k\t$v" })
    dirty = false
    lastFlush = now
  }

  private def writeTsv(p: Path, lines: Iterator[String]): Unit = {
    val f = fs(p)
    if (!f.exists(p.getParent)) f.mkdirs(p.getParent)
    val tmp = new Path(p.toString + ".tmp")
    val out = f.create(tmp, true)
    try {
      var first = true
      lines.foreach { line =>
        if (!first) out.write('\n')
        out.write(line.getBytes("UTF-8"))
        first = false
      }
    } finally out.close()
    if (f.exists(p)) f.delete(p, false)
    if (!f.rename(tmp, p))
      throw new java.io.IOException(s"cache swap failed: rename($tmp, $p)")
  }

  /** Monitoring readout (persistent_cache.rs:277-288). */
  def stats: (Int, Int, Long, Boolean) = synchronized {
    (fileCache.size, appCache.size, generation, dirty)
  }
}
