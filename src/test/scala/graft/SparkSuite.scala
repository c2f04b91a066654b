package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Shared session per suite (reused across tests in the JVM). */
trait SparkSuite extends AnyFunSuite with BeforeAndAfterAll {
  // Each suite captures the session at first use; SparkSuite.session
  // transparently rebuilds it if a prior suite stopped the context (the
  // ModelCache eviction spec does). Safe because suites run sequentially
  // (Test / fork := true) — a stable val is required for
  // `import spark.implicits._`.
  lazy val spark: SparkSession = SparkSuite.session
  def tmpDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString
}

object SparkSuite {
  private var _session: SparkSession = _

  /** The shared session; transparently rebuilt if a test stopped it. */
  def session: SparkSession = synchronized {
    if (_session == null || _session.sparkContext.isStopped) {
      val s = graft.core.Session.tune(SparkSession.builder()
        .master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.warehouse.dir",
          java.nio.file.Files.createTempDirectory("graft-warehouse").toString))
        .getOrCreate()
      s.sparkContext.setLogLevel("WARN")
      _session = s
    }
    _session
  }
}
