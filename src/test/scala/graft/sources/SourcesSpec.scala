package graft.sources

import graft.SparkSpec
import graft.events.EventLogFixture
import org.apache.spark.sql.functions._

class SourcesSpec extends SparkSpec {

  test("listLogs lists only log-shaped files") {
    val d = tmpDir("srclist")
    EventLogFixture.writeLogs(d, Seq("app-x"))
    java.nio.file.Files.write(java.nio.file.Paths.get(d, "junk.parquet"),
      "not a log".getBytes)
    // compressed logs must be listed too (the parser strips these
    // suffixes and Hadoop auto-decompresses)
    java.nio.file.Files.write(java.nio.file.Paths.get(d, "app-z.json.gz"),
      Array[Byte](0x1f, 0x8b.toByte))
    val names = EventLogSource.listLogs(spark, s"file://$d")
      .map(_.getPath.getName).sorted
    assert(names === Seq("app-x.json", "app-z.json.gz"))
  }

  test("readDirectory parses a file:// URI directory end-to-end") {
    val d = tmpDir("srcdir")
    EventLogFixture.writeLogs(d, Seq("app-a", "app-b", "app-c"))
    val canon = EventLogSource.readDirectory(spark, s"file://$d")
    assert(canon.count() === 36)
    assert(canon.select("app_id").distinct().count() === 3)
  }

  test("readDirectory of a missing directory yields an empty frame") {
    assert(EventLogSource.readDirectory(spark, "file:///nonexistent-graft").count() === 0)
  }

  test("gzip-compressed logs decompress and parse to the same app_id") {
    val d = tmpDir("srcgz")
    val bytes = EventLogFixture.appLog("app-gz").mkString("\n").getBytes("UTF-8")
    val out = new java.io.ByteArrayOutputStream()
    val gz = new java.util.zip.GZIPOutputStream(out)
    gz.write(bytes); gz.close()
    java.nio.file.Files.write(
      java.nio.file.Paths.get(d, "app-gz.json.gz"), out.toByteArray)
    val canon = EventLogSource.readDirectory(spark, s"file://$d")
    assert(canon.count() === 12)
    // .json.gz strips to the bare app id
    assert(canon.select("app_id").distinct().collect().map(_.getString(0)).toSeq
      === Seq("app-gz"))
  }

  test("compactStore merges fragmented partitions, preserving content") {
    val d = tmpDir("compact-logs")
    EventLogFixture.writeLogs(d, Seq("app-c1", "app-c2"))
    val store = tmpDir("compact-store") + "/store"
    // simulate incremental ingest: several small append batches
    val canon = EventLogSource.readDirectory(spark, s"file://$d")
    for (_ <- 0 until 4)
      canon.write.mode("append").partitionBy("event_date").parquet(store)
    def files = new java.io.File(store).listFiles()
      .filter(_.getName.startsWith("event_date="))
      .flatMap(_.listFiles()).count(_.getName.endsWith(".parquet"))
    def contentHash = spark.read.parquet(store)
      .agg(sum(expr("hash(event_id, app_id, event_type, event_time_us)")))
      .collect()(0).getLong(0)
    val (filesBefore, hashBefore, rowsBefore) =
      (files, contentHash, spark.read.parquet(store).count())
    EventLogSource.compactStore(spark, store)
    assert(files < filesBefore, s"$files vs $filesBefore")
    assert(spark.read.parquet(store).count() === rowsBefore)
    assert(contentHash === hashBefore)
  }

  test("readGlob reads matching logs without a driver-side listing") {
    val d = tmpDir("srcglob")
    EventLogFixture.writeLogs(d, Seq("app-g1", "app-g2"))
    java.nio.file.Files.write(java.nio.file.Paths.get(d, "junk.parquet"),
      "not a log".getBytes)
    val canon = EventLogSource.readGlob(spark, s"file://$d/*.json")
    assert(canon.count() === 24)
    assert(canon.select("app_id").distinct().count() === 2)
  }

  test("writeStore partitions by event_date and survives a round-trip") {
    val d = tmpDir("srcstore")
    EventLogFixture.writeLogs(d, Seq("app-a", "app-b"))
    val out = tmpDir("store-out")
    EventLogSource.writeStore(EventLogSource.readDirectory(spark, s"file://$d"), out)
    val dirs = new java.io.File(out).listFiles().filter(_.isDirectory).map(_.getName)
    assert(dirs.count(_.startsWith("event_date=")) >= 2) // one day per app in fixture
    val back = spark.read.parquet(out)
    assert(back.count() === 24)
    // partition pruning: a one-day filter must scan a subset
    val oneDay = back.filter(col("event_date") === dirs.sorted.head.stripPrefix("event_date="))
    assert(oneDay.count() === 12)
  }

  test("incremental ingest parses only the delta; checkpoint commits after processing") {
    val d = tmpDir("incr")
    val ckpt = tmpDir("incr-ckpt") + "/state.tsv"
    EventLogFixture.writeLogs(d, Seq("app-a"))
    val ing = new IncrementalIngest(spark, ckpt)
    var n = 0L
    ing.ingest(s"file://$d")(df => n = df.count())
    assert(n === 12)
    assert(ing.ingest(s"file://$d")(_ => fail("no delta expected")).isEmpty)
    // a failing processor must NOT commit — the files stay pending
    EventLogFixture.writeLogs(d, Seq("app-b"))
    intercept[RuntimeException] {
      ing.ingest(s"file://$d")(_ => throw new RuntimeException("sink down"))
    }
    var apps: Seq[String] = Nil
    ing.ingest(s"file://$d")(df => apps =
      df.select("app_id").distinct().collect().map(_.getString(0)).toSeq)
    assert(apps === Seq("app-b"))
  }

  test("offset tracking: a grown file re-ingests exactly the appended tail, once") {
    val d = tmpDir("incr-tail")
    val ckpt = tmpDir("incr-tail-ckpt") + "/state.tsv"
    val p = java.nio.file.Paths.get(d, "app-t.json")
    val lines = EventLogFixture.appLog("app-t")
    java.nio.file.Files.writeString(p, lines.take(8).mkString("", "\n", "\n"))
    val ing = new IncrementalIngest(spark, ckpt)
    var got: Seq[Long] = Nil
    def run(): Unit = { got = Nil
      ing.ingest(s"file://$d")(df =>
        got = df.select("event_time_us").collect().map(_.getLong(0)).toSeq.sorted)
    }
    run()
    assert(got.size === 8)
    // append 4 complete events + one PARTIAL line (writer mid-append)
    val partial = lines(11).substring(0, 30)
    java.nio.file.Files.writeString(p,
      lines.slice(8, 11).mkString("", "\n", "\n") + partial,
      java.nio.file.StandardOpenOption.APPEND)
    run()
    // exactly the 3 new complete events — the partial line is held back
    assert(got.size === 3)
    // completing the partial line delivers it, once
    java.nio.file.Files.writeString(p,
      lines(11).substring(30) + "\n", java.nio.file.StandardOpenOption.APPEND)
    run()
    assert(got.size === 1)
    // and a no-change rescan is empty
    assert(ing.ingest(s"file://$d")(_ => fail("no delta expected")).isEmpty)
  }

  test("tail-ingested events carry the file's attempt_id from the checkpoint") {
    val d = tmpDir("incr-att")
    val ckpt = tmpDir("incr-att-ckpt") + "/state.tsv"
    val p = java.nio.file.Paths.get(d, "app-att.json")
    val ts = 1700000000000L
    val start =
      s"""{"Event":"SparkListenerApplicationStart","App Name":"a","App ID":"app-att","App Attempt ID":"2","Timestamp":$ts,"User":"u","Spark Version":"3.5.1"}"""
    def taskEnd(i: Int) =
      s"""{"Event":"SparkListenerTaskEnd","Task Info":{"Task ID":$i,"Stage ID":0,"Executor ID":"1","Host":"h","Launch Time":${ts + i},"Finish Time":${ts + i + 5}},"Task Metrics":{"Executor Run Time":5}}"""
    java.nio.file.Files.writeString(p, start + "\n" + taskEnd(0) + "\n")
    val ing = new IncrementalIngest(spark, ckpt)
    var atts: Seq[String] = Nil
    def run(): Unit = ing.ingest(s"file://$d")(df => atts =
      df.select("attempt_id").collect().map(_.getString(0)).toSeq)
    run()
    assert(atts.toSet === Set("2")) // whole-file read: window attribution
    // the appended tail has no ApplicationStart in view — the attempt
    // must come from the checkpoint, not default to null
    java.nio.file.Files.writeString(p, taskEnd(1) + "\n" + taskEnd(2) + "\n",
      java.nio.file.StandardOpenOption.APPEND)
    run()
    assert(atts.size === 2)
    assert(atts.toSet === Set("2"))
  }

  test("one scan handles 1k concurrently-grown tails without per-file driver serialization") {
    val d = tmpDir("incr-fleet")
    val ckpt = tmpDir("incr-fleet-ckpt") + "/state.tsv"
    val ts = 1700000000000L
    def start(i: Int) =
      s"""{"Event":"SparkListenerApplicationStart","App Name":"a$i","App ID":"app-f$i","App Attempt ID":"$i","Timestamp":$ts,"User":"u","Spark Version":"3.5.1"}"""
    def taskEnd(i: Int, t: Int) =
      s"""{"Event":"SparkListenerTaskEnd","Task Info":{"Task ID":$t,"Stage ID":0,"Executor ID":"1","Host":"h","Launch Time":${ts + t},"Finish Time":${ts + t + 5}},"Task Metrics":{"Executor Run Time":5}}"""
    val n = 1000
    for (i <- 0 until n)
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(d, f"app-f$i%04d.json"),
        start(i) + "\n" + taskEnd(i, 0) + "\n")
    val ing = new IncrementalIngest(spark, ckpt)
    var cnt = 0L
    ing.ingest(s"file://$d")(df => cnt = df.count())
    assert(cnt === 2L * n)
    // every file grows by one event; the re-scan must ingest exactly
    // the 1000 tails — two Spark jobs (metadata + tail read), with the
    // per-file seeks running in executors, not a driver loop
    for (i <- 0 until n)
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(d, f"app-f$i%04d.json"), taskEnd(i, 1) + "\n",
        java.nio.file.StandardOpenOption.APPEND)
    var tails: Array[org.apache.spark.sql.Row] = Array.empty
    ing.ingest(s"file://$d")(df =>
      tails = df.select("app_id", "attempt_id").collect())
    assert(tails.length === n)
    // attempt ids come from the checkpoint written by the first scan —
    // each tail row is stamped with ITS OWN file's attempt
    assert(tails.map(_.getString(1)).distinct.length === n)
    assert(ing.ingest(s"file://$d")(_ => fail("no delta expected")).isEmpty)
  }

  test("a same-length in-place rewrite is detected via mtime and re-read whole") {
    val d = tmpDir("incr-rw")
    val ckpt = tmpDir("incr-rw-ckpt") + "/state.tsv"
    val p = java.nio.file.Paths.get(d, "app-rw.json")
    val lines = EventLogFixture.appLog("app-rw")
    val body = lines.mkString("", "\n", "\n")
    java.nio.file.Files.writeString(p, body)
    val ing = new IncrementalIngest(spark, ckpt)
    var n = -1L
    ing.ingest(s"file://$d")(df => n = df.count())
    assert(n === 12)
    // rewrite the file with DIFFERENT bytes of the SAME length, mtime
    // bumped past the recorded one (length-only detection misses this)
    val rewritten = body.replace("nightly-etl", "nightly-ETL")
    assert(rewritten.length === body.length)
    java.nio.file.Files.writeString(p, rewritten)
    java.nio.file.Files.setLastModifiedTime(p,
      java.nio.file.attribute.FileTime.fromMillis(
        java.nio.file.Files.getLastModifiedTime(p).toMillis + 5000))
    n = -1L
    ing.ingest(s"file://$d")(df => n = df.count())
    assert(n === 12) // whole-file re-read, not skipped, not a tail
  }

  test("checkpoint commits via tmp-swap; a torn FINAL line re-scans its file only") {
    val d = tmpDir("incr-torn")
    val ckpt = tmpDir("incr-torn-ckpt") + "/state.tsv"
    EventLogFixture.writeLogs(d, Seq("app-t1", "app-t2"))
    val ing = new IncrementalIngest(spark, ckpt)
    ing.ingest(s"file://$d")(df => df.count())
    val ckptPath = java.nio.file.Paths.get(ckpt)
    // a successful commit leaves no .tmp behind (write-then-rename)
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(ckpt + ".tmp")))
    val lines = java.nio.file.Files.readString(ckptPath).split("\n")
    assert(lines.length === 2)
    // tampering out-of-band invalidates the Hadoop local-FS checksum
    // sidecar — drop it (a real torn write would have a torn crc too)
    def dropCrc(): Unit = java.nio.file.Files.deleteIfExists(
      ckptPath.getParent.resolve("." + ckptPath.getFileName + ".crc"))
    // simulate the pre-swap failure mode: the final line cut mid-entry
    // (before its first tab, so no field parses)
    java.nio.file.Files.writeString(ckptPath,
      lines(0) + "\n" + lines(1).takeWhile(_ != '\t'))
    dropCrc()
    // the torn entry is dropped -> exactly that file re-ingests; the
    // intact entry stays committed
    var apps: Seq[String] = Nil
    ing.ingest(s"file://$d")(df => apps =
      df.select("app_id").distinct().collect().map(_.getString(0)).toSeq)
    val intactApp = lines(0).split("\t")(0).split("/").last.stripSuffix(".json")
    assert(apps.size === 1)
    assert(apps.head != intactApp)
    // a torn INTERIOR line is real corruption and still fails loudly
    java.nio.file.Files.writeString(ckptPath,
      lines(0).takeWhile(_ != '\t') + "\n" + lines(1))
    dropCrc()
    intercept[Exception] { ing.ingest(s"file://$d")(_ => ()) }
  }
}
