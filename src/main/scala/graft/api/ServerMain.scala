package graft.api

import org.apache.spark.sql.SparkSession

import graft.config.GraftConfig
import graft.sources.EventLogSource

/**
 * Standalone server entrypoint — the reference's `main.rs` shape
 * (src/main.rs:20-200: parse CLI + settings file, build the store
 * from the configured log directory, bind the HTTP API): `spark-submit
 * --class graft.api.ServerMain <jar> [--config settings.toml] [--host
 * H] [--port P] [--log-directory DIR] [--hdfs-namenode URL |
 * --s3-bucket NAME]`.
 *
 * The SparkSession is taken from the environment (`spark-submit`
 * decides master/resources — cluster-config concerns stay out of the
 * library); storage credentials from the settings file land on the
 * Hadoop configuration via [[GraftConfig.Settings.hadoopOverrides]]
 * before the first read. Event logs parse ONCE into the canonical
 * frame, which every route then queries — the parse-once discipline
 * the whole analytics layer assumes.
 */
object ServerMain {
  def main(args: Array[String]): Unit = {
    val settings = GraftConfig.fromArgs(args)
    val spark = SparkSession.builder()
      .appName("graft-history-server")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.extensions", "graft.ext.GraftExtensions")
      .getOrCreate()
    settings.hadoopOverrides.foreach { case (k, v) =>
      spark.sparkContext.hadoopConfiguration.set(k, v)
    }
    // krb5.conf override: applies on EVERY kerberized path, including
    // principal-only (ticket-cache) setups with no keytab to log in —
    // and must land before any JVM Kerberos use. If something already
    // initialized Kerberos (the JVM caches krb5.conf at first touch),
    // force a re-read; sun.security.krb5.Config is JDK-internal, so
    // the refresh goes through reflection (spark-submit's launcher
    // opens java.security.jgss/sun.security.krb5; outside it the
    // refresh degrades to a warning and the property still governs
    // first-touch initialization).
    settings.krb5ConfPath.foreach { p =>
      System.setProperty("java.security.krb5.conf", p)
      scala.util.Try(Class.forName("sun.security.krb5.Config")
        .getMethod("refresh").invoke(null)) match {
        case scala.util.Failure(e) => System.err.println(
          s"[graft] krb5.conf set to $p but refresh failed (pre-init " +
            s"Kerberos state may persist): ${e.getMessage}")
        case _ => ()
      }
    }
    // Keytab login when the settings carry one (hdfs_reader.rs:55-91
    // create_kerberos_client): must run after the auth-mode override
    // lands on the Hadoop conf and before the first filesystem touch.
    // DRIVER-ONLY: UserGroupInformation.loginUserFromKeytab
    // authenticates this JVM — executors in a cluster deployment get
    // NO delegation tokens from it, so kerberized-HDFS reads from
    // executors REQUIRE `spark-submit --principal/--keytab` (which
    // obtains and ships HDFS delegation tokens at submit time); this
    // login covers local-mode and client-side (driver listing /
    // store-maintenance) filesystem access only. When the submit-time
    // login already happened, this is a no-op re-login of the same
    // identity or an explicit switch to the configured one.
    settings.kerberosLogin.foreach { case (principal, keytab) =>
      org.apache.hadoop.security.UserGroupInformation.setConfiguration(
        spark.sparkContext.hadoopConfiguration)
      org.apache.hadoop.security.UserGroupInformation.loginUserFromKeytab(
        principal, keytab)
      System.err.println(s"[graft] kerberos login as $principal from " +
        s"$keytab (driver-side; cluster executors need spark-submit " +
        "--principal/--keytab for delegation tokens)")
    }
    val canon = EventLogSource.readDirectory(spark, settings.eventLogUri)
      .cache()
    val server = new HistoryServerHttp(spark, canon, settings.server.port,
      settings.server.host)
    val port = server.start()
    System.err.println(s"[graft] serving on ${settings.server.host}:$port " +
      s"over ${settings.eventLogUri}")
    Thread.currentThread().join() // serve until killed
  }
}
