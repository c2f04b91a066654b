package graft.ops

import org.apache.spark.sql.functions._
import graft.core.{Q, Tables => T}

/** Data-layout planning — the write-side half of 100 TB scan efficiency.
  * Predicate pushdown (PlanShapeSpec asserts it everywhere) only pays
  * when file-level min/max stats are TIGHT; which rows share a file is
  * therefore a first-class operator decision, not an afterthought. The
  * standard mitigation for multi-dimensional access patterns is
  * space-filling-curve clustering (z-order), public in every modern
  * lakehouse table format.
  *
  * Reference relevance: the reference rewrites whole snapshots per tick
  * (duckdb_cdc.go:217-258) with no layout control at all — consumers
  * scan every file for any predicate. This operator is the planning
  * query a snapshot sink runs before choosing a write order.
  *
  * All math is exact-integer (grid normalization by floor-division, bit
  * interleave by shift/and/or), so Spark and DuckDB agree bit-for-bit;
  * the engines differ only in shift syntax (shiftleft() vs <<), so the
  * interleave expression is generated per dialect from one loop.
  */
object Layout {

  private val GridBits = 10           // 1024×1024 z-grid
  private val GridSize = 1L << GridBits
  private val NFiles = 64L            // target file count per layout
  private val ZCells = 1L << (2 * GridBits)

  /** Bit-interleave expression for dialect `shift(col, i)` over grid
    * coordinate subexpressions `nx`/`ny`. */
  private def interleave(shiftL: (String, Int) => String,
                         shiftR: (String, Int) => String,
                         nx: String = "nx", ny: String = "ny"): String =
    (0 until GridBits).map { i =>
      s"(${shiftL(s"(${shiftR(nx, i)} & 1)", 2 * i)} + " +
        s"${shiftL(s"(${shiftR(ny, i)} & 1)", 2 * i + 1)})"
    }.mkString(" + ")

  private val zSpark = interleave(
    (e, n) => s"shiftleft($e, $n)", (e, n) => s"shiftright($e, $n)")
  private val zDuck = interleave(
    (e, n) => s"($e << $n)", (e, n) => s"($e >> $n)")

  /** Attach the z-interleave of (`xExpr`, `yExpr`) — normalized to the
    * observed GridBits-grid with the exact-integer math of
    * q_zorder_layout — as column `__z`. This is the WRITE-side entry
    * point (Maintenance.compactZOrder clusters files by it); the query
    * above is the planning/reporting side of the same curve. Costs one
    * 1-row census collect; the per-row z math is codegen'd integer ops,
    * no shuffle. An empty input gets a constant z (nothing to cluster). */
  private[graft] def withZ(df: org.apache.spark.sql.DataFrame,
      xExpr: String, yExpr: String): org.apache.spark.sql.DataFrame = {
    val scratch = Set("__z", "__nx", "__ny")
    require(!df.columns.exists(scratch),
      s"input already has a ${scratch.mkString("/")} column — the z rewrite " +
        "would overwrite and then silently drop it")
    val censusDf = df.selectExpr(s"min($xExpr)", s"max($xExpr)",
      s"min($yExpr)", s"max($yExpr)")
    // the normalization below is exact-INTEGER math: a fractional
    // clustering expression would silently truncate (clustering quality
    // degrades with no error) — refuse loudly and ask for a pre-cast
    val integral: org.apache.spark.sql.types.DataType => Boolean = {
      case _: org.apache.spark.sql.types.ByteType => true
      case _: org.apache.spark.sql.types.ShortType => true
      case _: org.apache.spark.sql.types.IntegerType => true
      case _: org.apache.spark.sql.types.LongType => true
      case _ => false
    }
    require(censusDf.schema.fields.forall(f => integral(f.dataType)),
      s"z-order clustering expressions must be integer-valued; " +
        s"($xExpr, $yExpr) census types are " +
        s"${censusDf.schema.fields.map(_.dataType.simpleString).mkString(", ")} — " +
        "cast/bucket to an integer grid first")
    val r = censusDf.collect()(0)
    // empty input: nothing to cluster, constant z
    if ((0 to 3).forall(r.isNullAt)) return df.withColumn("__z", lit(0L))
    // a dimension that exists but is entirely NULL would NPE below (or
    // silently degrade clustering) — refuse loudly instead
    require((0 to 3).forall(i => !r.isNullAt(i)),
      s"z-order clustering expressions must be non-NULL: census of " +
        s"($xExpr, $yExpr) = $r")
    def v(i: Int) = r.getAs[Number](i).longValue
    val (minx, maxx, miny, maxy) = (v(0), v(1), v(2), v(3))
    // ((x − min) · GridSize) is bounded by (span − 1) · GridSize: guard
    // the span arithmetic itself (min ≪ 0, max ≫ 0 can overflow the
    // subtraction) and the multiply, instead of wrapping silently
    def spanOf(lo: Long, hi: Long, dim: String): Long = {
      val w =
        try Math.addExact(Math.subtractExact(hi, lo), 1L)
        catch { case _: ArithmeticException =>
          throw new IllegalArgumentException(
            s"z-order $dim domain [$lo, $hi] wider than Long — " +
              "bucket the expression before clustering")
        }
      require(w <= Long.MaxValue / GridSize,
        s"z-order $dim domain [$lo, $hi] would overflow the grid " +
          s"normalization (span $w × $GridSize) — bucket the expression first")
      w
    }
    val (spanX, spanY) = (spanOf(minx, maxx, "x"), spanOf(miny, maxy, "y"))
    df.withColumn("__nx",
        expr(s"(($xExpr - $minx) * $GridSize) div $spanX"))
      .withColumn("__ny",
        expr(s"(($yExpr - $miny) * $GridSize) div $spanY"))
      .withColumn("__z", expr(interleave(
        (e, n) => s"shiftleft($e, $n)", (e, n) => s"shiftright($e, $n)",
        "__nx", "__ny")))
      .drop("__nx", "__ny")
  }

  /** q_zorder_layout: cluster events on (user_id, hour) by z-value and
    * compare the resulting per-file bounding boxes against the naive
    * time-ordered layout. Per layout: file count and the average/worst
    * per-file span in BOTH dimensions — a time-ordered file inevitably
    * spans (almost) the whole user domain, so a `user_id = k` predicate
    * prunes nothing; z-ordered files stay tight in both dimensions, so
    * min/max skipping works for either predicate.
    *
    * Scale shape: one fact scan feeds a 1-row census (broadcast back),
    * the z computation is pure per-row integer math (codegen'd, no
    * shuffle), and each layout summary is a two-level aggregation whose
    * first level carries one row per FILE — O(files), not O(rows),
    * into the final 2-row result. The grid census makes the operator
    * sf-robust: domains are normalized to 0..1023 from observed bounds,
    * not hard-coded ranges. */
  val zorderLayout: Q = Q(
    "q_zorder_layout",
    s"""WITH ev AS (
       |  SELECT user_id AS x, epoch_us(ts) // 3600000000 AS h FROM events),
       |c AS (SELECT min(x) AS minx, max(x) AS maxx,
       |             min(h) AS minh, max(h) AS maxh FROM ev),
       |n AS (SELECT x, h,
       |  ((x - minx) * $GridSize) // (maxx - minx + 1) AS nx,
       |  ((h - minh) * $GridSize) // (maxh - minh + 1) AS ny
       |  FROM ev CROSS JOIN c),
       |z AS (SELECT x, h, ny, $zDuck AS z FROM n),
       |zf AS (SELECT z // ${ZCells / NFiles} AS file_id,
       |  max(x) - min(x) AS uspan, max(h) - min(h) AS hspan
       |  FROM z GROUP BY 1),
       |tf AS (SELECT ny // ${GridSize / NFiles} AS file_id,
       |  max(x) - min(x) AS uspan, max(h) - min(h) AS hspan
       |  FROM z GROUP BY 1),
       |s AS (
       |  SELECT 'time' AS layout, CAST(count(*) AS BIGINT) AS n_files,
       |    CAST(sum(uspan) // count(*) AS BIGINT) AS avg_user_span,
       |    CAST(max(uspan) AS BIGINT) AS max_user_span,
       |    CAST(sum(hspan) // count(*) AS BIGINT) AS avg_hour_span,
       |    CAST(max(hspan) AS BIGINT) AS max_hour_span
       |  FROM tf
       |  UNION ALL
       |  SELECT 'zorder', CAST(count(*) AS BIGINT),
       |    CAST(sum(uspan) // count(*) AS BIGINT),
       |    CAST(max(uspan) AS BIGINT),
       |    CAST(sum(hspan) // count(*) AS BIGINT),
       |    CAST(max(hspan) AS BIGINT)
       |  FROM zf)
       |SELECT * FROM s ORDER BY layout""".stripMargin
  ) { (s, d) =>
    val ev = T.events(s, d).select(
      col("user_id").as("x"),
      expr("unix_micros(ts) div 3600000000").as("h"))
    val c = ev.agg(
      min(col("x")).as("minx"), max(col("x")).as("maxx"),
      min(col("h")).as("minh"), max(col("h")).as("maxh"))
    val z = ev.crossJoin(broadcast(c))
      .select(col("x"), col("h"),
        expr(s"((x - minx) * $GridSize) div (maxx - minx + 1)").as("nx"),
        expr(s"((h - minh) * $GridSize) div (maxh - minh + 1)").as("ny"))
      .select(col("x"), col("h"), col("ny"), expr(zSpark).as("z"))
    def fileSpans(fileId: org.apache.spark.sql.Column) = z
      .groupBy(fileId.as("file_id"))
      .agg((max(col("x")) - min(col("x"))).as("uspan"),
        (max(col("h")) - min(col("h"))).as("hspan"))
    def summary(name: String, spans: org.apache.spark.sql.DataFrame) = spans
      .agg(count(lit(1)).as("n_files"),
        expr("sum(uspan) div count(*)").as("avg_user_span"),
        max(col("uspan")).as("max_user_span"),
        expr("sum(hspan) div count(*)").as("avg_hour_span"),
        max(col("hspan")).as("max_hour_span"))
      .select(lit(name).as("layout"), col("n_files"), col("avg_user_span"),
        col("max_user_span"), col("avg_hour_span"), col("max_hour_span"))
    summary("time", fileSpans(expr(s"ny div ${GridSize / NFiles}")))
      .unionAll(summary("zorder", fileSpans(expr(s"z div ${ZCells / NFiles}"))))
      .orderBy("layout")
  }

  /** q_compact_plan: small-file compaction planning — the maintenance
    * job a CDC snapshot sink owes its consumers. The reference rewrites a
    * full snapshot every poll tick (duckdb_cdc.go:217-258) and our
    * consistent-tick stream pins one listing file per epoch: either way a
    * long-running capture produces thousands of small files, and scan
    * cost at 100 TB is dominated by file count, not bytes. The planner
    * groups adjacent small files into target-size bins.
    *
    * The file census here is synthesized deterministically from events —
    * one "file" per (event_type, day) with bytes proportional to its row
    * count — so both engines derive identical input (the production
    * entry point feeds a real listing the same shape).
    *
    * Binning is next-fit by cumulative offset: a file lands in the bin
    * its starting offset falls in (bin = floor(preceding_bytes/target)),
    * so a bin exceeds the target by at most its last file — the standard
    * compaction-planner guarantee. Scale shape: the cumulative sum runs
    * per PARTITION KEY (event_type), not globally — planning is
    * embarrassingly parallel across table partitions exactly like the
    * compaction jobs it feeds, and the window input is one row per FILE,
    * not per event row. */
  private val compactPlanSql =
    """WITH f AS (
      |  SELECT event_type, epoch_us(ts) // 86400000000 AS day,
      |    CAST(count(*) * 100 AS BIGINT) AS bytes
      |  FROM events GROUP BY 1, 2),
      |w AS (
      |  SELECT event_type, day, bytes,
      |    CAST(sum(bytes) OVER (PARTITION BY event_type ORDER BY day
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - bytes
      |      AS BIGINT) AS start_off
      |  FROM f)
      |SELECT event_type, start_off // 50000 AS bin_id,
      |  CAST(count(*) AS BIGINT) AS n_files,
      |  CAST(sum(bytes) AS BIGINT) AS bytes_total,
      |  CAST(min(day) AS BIGINT) AS day_min,
      |  CAST(max(day) AS BIGINT) AS day_max
      |FROM w GROUP BY 1, 2 ORDER BY event_type, bin_id""".stripMargin

  /** The next-fit binning tail over a (event_type, day, bytes) file
    * census — shared by the from-scratch planner and the delta member
    * so the two can only differ in how the census was produced. */
  private def binPlan(f: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    f.withColumn("start_off", sum(col("bytes")).over(w) - col("bytes"))
      .groupBy(col("event_type"), expr("start_off div 50000").as("bin_id"))
      .agg(count(lit(1)).as("n_files"), sum(col("bytes")).as("bytes_total"),
        min(col("day")).as("day_min"), max(col("day")).as("day_max"))
      .orderBy("event_type", "bin_id")
  }

  val compactPlan: Q = Q("q_compact_plan", compactPlanSql) { (s, d) =>
    binPlan(T.events(s, d)
      .groupBy(col("event_type"),
        expr("unix_micros(ts) div 86400000000").as("day"))
      .agg((count(lit(1)) * 100).as("bytes")))
  }

  /** The per-(event_type, day) row-count census over an event-id slice —
    * the ONE corpus-sized pass of compaction planning, and a textbook
    * monoid over disjoint id slices (counts add). */
  private def fileCensus(s: org.apache.spark.sql.SparkSession, d: String,
      lo: Long, hi: Long): org.apache.spark.sql.DataFrame =
    censusOf(T.events(s, d)
      .filter(col("event_id") >= lo && col("event_id") < hi))

  /** Unbounded-upper slice census (filter only `event_id >= lo`) — the
    * SERVE delta leg's form, so a row at event_id == Long.MaxValue is
    * counted exactly as the from-scratch planner and the SQL oracle
    * count it (round-15 advice; `< hi` would silently exclude it). */
  private def fileCensusFrom(s: org.apache.spark.sql.SparkSession, d: String,
      lo: Long): org.apache.spark.sql.DataFrame =
    censusOf(T.events(s, d).filter(col("event_id") >= lo))

  private def censusOf(ev: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame =
    ev.groupBy(col("event_type"),
        expr("unix_micros(ts) div 86400000000").as("day"))
      .agg(count(lit(1)).as("n"))

  /** Frozen layout census for [[compactPlanDelta]] — the LAYOUT member
    * of the delta family (the round-14 verdict's last retrain-only
    * operator axis): (split, (event_type, day, n) over events below the
    * 7/8 event_id split). REFRESH rolls the census forward with one
    * groupBy-sum over the old base plus the [sp0, sp1) slice census —
    * O(delta events + census rows), the old corpus never re-read. The
    * checkpoint re-written per refresh is the census itself, which is
    * O(event_types × days) — FILE-count-sized, not corpus-sized, so the
    * lp-base no-O(corpus)-write rule holds trivially.
    *
    * BACKFILL GUARD (round-15 verdict #1): the merge above is exact only
    * when appended files carry ids at-or-above the frozen split — a
    * backfilled slice below it would be invisible to both the frozen
    * census and the delta scan, silently under-counting the plan. The
    * guard probes min(event_id) over ONLY the new files and declines the
    * merge (→ ModelCache retrains from scratch) when the contract is
    * broken; RefreshSpec's below-split case pins the fallback. */
  private[graft] def layoutBase(s: org.apache.spark.sql.SparkSession,
      d: String): (Long, org.apache.spark.sql.DataFrame) =
    graft.core.ModelCache.getOrRefreshGuarded(
      s, "layout-base", s"$d/events.parquet") {
      val maxRow = T.events(s, d).agg(max(col("event_id"))).head()
      val maxId = if (maxRow.isNullAt(0)) 0L else maxRow.getLong(0)
      val sp = 7L * maxId / 8L
      (sp, fileCensus(s, d, Long.MinValue, sp).localCheckpoint())
    } { case ((sp0, cen0), newFiles) =>
      if (graft.core.Backfill.below(s, newFiles, "event_id", sp0)) None
      else Some {
        val maxRow = T.events(s, d).agg(max(col("event_id"))).head()
        val maxId = if (maxRow.isNullAt(0)) 0L else maxRow.getLong(0)
        val sp1 = math.max(7L * maxId / 8L, sp0) // monotone, now CHECKED
        val cenS = fileCensus(s, d, sp0, sp1)
        (sp1, cen0.unionAll(cenS)
          .groupBy("event_type", "day").agg(sum(col("n")).as("n"))
          .localCheckpoint())
      }
    }

  /** q_compact_plan_delta: the compaction plan served INCREMENTALLY —
    * a snapshot sink's nightly maintenance planner must not re-census
    * the whole table because today's tick appended a slice. The frozen
    * [[layoutBase]] census merges with the live delta slice's census
    * (one groupBy-sum of two O(files) relations plus the delta scan,
    * whose event_id ≥ split predicate reaches the parquet scan), and
    * the identical next-fit binning runs over the merged O(files) rows.
    * ORACLE: q_compact_plan's SQL VERBATIM — the incremental path must
    * reproduce the from-scratch plan bit-for-bit, the delta-family
    * contract (q_concurrency_delta / q_bm25_delta precedent). */
  val compactPlanDelta: Q = Q("q_compact_plan_delta", compactPlanSql) { (s, d) =>
    val (split, cenB) = layoutBase(s, d)
    val cenD = fileCensusFrom(s, d, split)
    binPlan(cenB.unionAll(cenD)
      .groupBy("event_type", "day").agg(sum(col("n")).as("n"))
      .select(col("event_type"), col("day"), (col("n") * 100).as("bytes")))
  }

  val all: Seq[Q] = Seq(zorderLayout, compactPlan, compactPlanDelta)
}
