package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: times every SparkEntry query at
  * SPARK_GRAFT_SF_DIR with a noop-sink write (forces full column
  * materialisation — `.count()` would let Spark skip work), after a
  * warmup pass that absorbs JVM/codegen startup. Prints ONE JSON line. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def runNoop(name: String): Double = {
      spark.catalog.clearCache() // operators cache intermediates; isolate queries
      System.gc() // settle heap so one query's garbage isn't billed to the next
      val t0 = System.nanoTime()
      try SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}"); return -1.0
      }
      (System.nanoTime() - t0) / 1e9
    }

    // Warmup: run every query once at the smallest scale factor so
    // Janino compilation + JIT of the generated code is NOT billed to
    // the timed run (the generated code is identical across scale
    // factors; only the data volume changes). Standard warmup practice
    // — the timed numbers then reflect data-proportional work.
    val warmDir = "/root/testdata/sf0.001"
    val names = SparkEntry.queries.keys.toSeq.sorted
    for (n <- names) {
      spark.catalog.clearCache()
      try SparkEntry.queries(n)(spark, warmDir)
        .write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => () }
    }
    val results = names.map(n => n -> runNoop(n))
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
