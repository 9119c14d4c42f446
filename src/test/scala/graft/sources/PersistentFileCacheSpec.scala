package graft.sources

import graft.SparkSpec

class PersistentFileCacheSpec extends SparkSpec {

  private def mkCache(dir: String, clock: () => Long,
                      maxEntries: Int = 1 << 20,
                      maxAgeSecs: Long = 7L * 86400,
                      interval: Long = 300) =
    new PersistentFileCache(spark, dir, maxEntries, maxAgeSecs, interval, clock)

  test("put/get with byte-state validation: exact match hits, changed file misses and drops") {
    var now = 1000L
    val c = mkCache(tmpDir("pfc"), () => now)
    c.putFile("/logs/app-1", modTime = 10L, size = 100L)
    assert(c.getFile("/logs/app-1", 10L, 100L).isDefined)
    // grown file -> miss, stale entry dropped
    assert(c.getFile("/logs/app-1", 10L, 150L).isEmpty)
    assert(c.getFile("/logs/app-1", 10L, 100L).isEmpty)
    // access stats tick on hits
    c.putFile("/logs/app-2", 20L, 7L)
    now = 2000L
    val e = c.getFile("/logs/app-2", 20L, 7L).get
    assert(e.accessCount === 2L && e.lastAccess === 2000L)
  }

  test("restart recovery: a new instance over the same dir sees flushed state") {
    val dir = tmpDir("pfc")
    var now = 1000L
    val c1 = mkCache(dir, () => now)
    c1.putFile("/logs/a", 1L, 10L)
    c1.putFile("/logs/b", 2L, 20L)
    c1.putApp("app-1", 555L)
    c1.flush()
    val c2 = mkCache(dir, () => now)
    assert(c2.getFile("/logs/a", 1L, 10L).isDefined)
    assert(c2.getFile("/logs/b", 2L, 20L).isDefined)
    assert(c2.getApp("app-1") === Some(555L))
    assert(c2.stats._1 === 2 && c2.stats._2 === 1)
  }

  test("recovery drops entries older than maxAgeSecs (validation pass)") {
    val dir = tmpDir("pfc")
    var now = 1000L
    val c1 = mkCache(dir, () => now, maxAgeSecs = 500L)
    c1.putFile("/logs/old", 1L, 1L)
    c1.flush()
    now = 1600L // 600s later > 500s max age
    val c2 = mkCache(dir, () => now, maxAgeSecs = 500L)
    assert(c2.getFile("/logs/old", 1L, 1L).isEmpty)
    assert(c2.stats._1 === 0)
  }

  test("LRU eviction beyond maxEntries") {
    var now = 0L
    val c = mkCache(tmpDir("pfc"), () => now, maxEntries = 2)
    now = 1; c.putFile("/a", 1L, 1L)
    now = 2; c.putFile("/b", 1L, 1L)
    now = 3; assert(c.getFile("/a", 1L, 1L).isDefined) // /a now most recent
    now = 4; c.putFile("/c", 1L, 1L)                   // evicts /b (LRU)
    assert(c.getFile("/b", 1L, 1L).isEmpty)
    assert(c.getFile("/a", 1L, 1L).isDefined)
    assert(c.getFile("/c", 1L, 1L).isDefined)
  }

  test("maybeFlush honors dirty flag and persistence interval") {
    var now = 0L
    val c = mkCache(tmpDir("pfc"), () => now, interval = 300L)
    assert(!c.maybeFlush())            // clean -> no-op
    c.putFile("/a", 1L, 1L)
    assert(!c.maybeFlush())            // dirty but interval not elapsed
    now = 301L
    assert(c.maybeFlush())             // dirty + elapsed -> flush
    assert(!c.maybeFlush())            // clean again
  }

  test("invalidateAll bumps the generation and survives a restart") {
    val dir = tmpDir("pfc")
    var now = 0L
    val c1 = mkCache(dir, () => now)
    c1.putFile("/a", 1L, 1L)
    c1.invalidateAll()
    c1.putFile("/b", 1L, 1L)
    c1.flush()
    val c2 = mkCache(dir, () => now)
    assert(c2.getFile("/a", 1L, 1L).isEmpty)
    assert(c2.getFile("/b", 1L, 1L).get.generation === 1L)
    assert(c2.stats._3 === 1L)
  }

  test("filterUnprocessed keeps only new-or-changed byte states") {
    var now = 0L
    val c = mkCache(tmpDir("pfc"), () => now)
    c.putFile("/a", 1L, 10L)
    c.putFile("/b", 2L, 20L)
    val pending = c.filterUnprocessed(Seq(
      ("/a", 1L, 10L),   // cached, unchanged -> skip
      ("/b", 3L, 25L),   // grown -> re-process
      ("/c", 1L, 5L)))   // new -> process
    assert(pending === Seq("/b", "/c"))
  }

  test("torn final checkpoint line is dropped; earlier entries survive") {
    val dir = tmpDir("pfc")
    var now = 0L
    val c1 = mkCache(dir, () => now)
    c1.putFile("/a", 1L, 10L)
    c1.flush()
    // simulate a torn write: rewrite the checkpoint with a half-line
    // appended, through the Hadoop FS (keeps the local CRC sidecar valid)
    val p = new org.apache.hadoop.fs.Path(s"$dir/file_cache.tsv")
    val hfs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = hfs.open(p)
    val txt = try scala.io.Source.fromInputStream(in).mkString finally in.close()
    val out = hfs.create(p, true)
    try out.write((txt + "\n/b\t2\t20\tgarb").getBytes("UTF-8"))
    finally out.close()
    val c2 = mkCache(dir, () => now)
    assert(c2.getFile("/a", 1L, 10L).isDefined)
    assert(c2.stats._1 === 1)
  }
}
