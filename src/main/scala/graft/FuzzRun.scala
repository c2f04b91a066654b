package graft

import java.nio.file.{Files, Paths}

import graft.core.{Session, Tables}

/** Differential-test executor: runs generated common-dialect SQL
  * (scripts/fuzz_gen.py) through Spark SQL and dumps each result to
  * parquet for scripts/fuzz_check.py to compare against DuckDB running
  * the identical text. This is the breadth arm of the correctness story
  * — the hand-written operator oracles are depth.
  *
  * Usage: runMain graft.FuzzRun <sfDir> <fuzzSqlJson> <outDir>
  */
object FuzzRun {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, sqlJson, outDir) = args.take(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt
    val spark = Session.local(cpus, cpus)
    Tables.all.foreach { t =>
      Tables.table(spark, sfDir, t).createOrReplaceTempView(t)
    }
    new java.io.File(outDir).mkdirs()
    // minimal JSON object parse: {"name": "sql", ...} with no nesting
    val raw = Files.readString(Paths.get(sqlJson))
    val entries = """"(fz_\d+)"\s*:\s*"((?:[^"\\]|\\.)*)"""".r
      .findAllMatchIn(raw)
      .map(m => m.group(1) ->
        m.group(2).replace("\\\"", "\"").replace("\\\\", "\\").replace("\\n", "\n"))
      .toSeq
    var failed = 0
    entries.foreach { case (name, sql) =>
      try spark.sql(sql).coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
      catch {
        case e: Throwable =>
          failed += 1
          System.err.println(s"[fuzz] $name failed: ${e.getMessage.linesIterator.next()}")
      }
    }
    println(s"[fuzz] ran ${entries.size} queries, $failed failed")
    spark.stop()
  }
}
