package graft

/** Dev tool: print the formatted physical plan of declared queries —
  * used to audit pushdown (PushedFilters/ReadSchema), join strategies
  * (broadcast vs shuffle), and whole-stage codegen coverage.
  *
  * Usage: runMain graft.PlanDump <sfDir> [queryName ...]
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val names = if (args.length > 1) args.drop(1).toSeq
                else SparkEntry.declared.map(_.name)
    val spark = graft.core.Session.local(4, 4)
    names.foreach { n =>
      println(s"\n========== $n ==========")
      SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
