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
    // Real JSON parse (Jackson ships on the Spark classpath): the file is a
    // flat {"fz_<n>": "<sql>", ...} object. A hand-rolled regex+replace
    // decoder corrupts escape sequences (e.g. "\\n" — a literal backslash
    // then 'n' — decodes to a newline) once string literals appear in the
    // generated SQL.
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = mapper.readTree(Files.readString(Paths.get(sqlJson)))
    val entries = {
      val it = root.fields()
      val buf = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
      while (it.hasNext) {
        val e = it.next()
        if (e.getKey.startsWith("fz_")) buf += (e.getKey -> e.getValue.asText())
      }
      buf.toSeq.sortBy(_._1)
    }
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
