package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Hub-skew observability probe (round-17 verdict #1): prints, for the
  * two bipartite pair lists the wedge-capped graph censuses run on
  * (durable ≥4-repeat and tri ≥2-repeat customer–supplier pairs), the
  * degree profile of BOTH sides and the hub-split block census from the
  * exact production machinery ([[graft.ops.Graph.wedgeBlocks]]) — the
  * committed evidence that a ScaleGen hub dir actually drives the
  * split branch (keys with nblk > 1) rather than re-measuring the
  * nblk = 1 fast path under a different directory name.
  *
  * Usage: runMain graft.tools.HubProbe <sfDir>
  */
object HubProbe {

  private def profile(name: String, eo: DataFrame): Unit = {
    val t0 = System.nanoTime()
    val cached = eo.localCheckpoint()
    for (side <- Seq("c", "s")) {
      val r = cached.groupBy(col(side)).agg(count(lit(1)).as("d"))
        .agg(count(lit(1)).as("n_keys"), sum(col("d")).as("n_edges"),
          max(col("d")).as("max_deg"),
          sum(expr("d * (d - 1) div 2")).as("n_wedges"))
        .head()
      println(s"[hubprobe] $name side=$side n_keys=${r.getLong(0)} " +
        s"n_edges=${r.getLong(1)} max_deg=${r.getLong(2)} n_wedges=${r.getLong(3)}")
    }
    // the production split, exactly as butterfly/triangle censuses run it
    val blocks = graft.ops.Graph.wedgeBlocks(cached).localCheckpoint()
    val perKey = blocks.groupBy("k")
      .agg(count(lit(1)).as("nblk"), sum(col("n")).as("deg"))
    val split = perKey.filter(col("nblk") > 1)
      .agg(coalesce(count(lit(1)), lit(0L)).as("n_split_keys"),
        coalesce(max(col("nblk")), lit(0L)).as("max_nblk"),
        coalesce(max(col("deg")), lit(0L)).as("max_split_deg"))
      .head()
    val maxBlock = blocks.agg(max(col("n"))).head().getLong(0)
    val sec = (System.nanoTime() - t0) / 1e9
    println(f"[hubprobe] $name split: n_split_keys=${split.getLong(0)} " +
      f"max_nblk=${split.getLong(1)} max_split_deg=${split.getLong(2)} " +
      f"max_block_rows=$maxBlock probe_sec=$sec%.1f")
  }

  def main(args: Array[String]): Unit = {
    require(args.length == 1, "usage: HubProbe <sfDir>")
    val d = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16").toInt
    val spark = graft.core.Session.local(cpus, cpus)
    spark.sparkContext.setLogLevel("ERROR")
    profile("durable(>=4)", graft.ops.Graph.durablePairs(spark, d))
    profile(s"tri(>=${graft.ops.Graph.TriMinRepeats})",
      graft.core.Tables.orders(spark, d)
        .join(graft.core.Tables.lineitem(spark, d),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_custkey").as("c"), col("l_suppkey").as("s"))
        .agg(count(lit(1)).as("cnt"))
        .filter(col("cnt") >= graft.ops.Graph.TriMinRepeats)
        .select("c", "s"))
    spark.stop()
  }
}
