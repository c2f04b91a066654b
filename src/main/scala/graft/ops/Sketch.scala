package graft.ops

import org.apache.spark.sql.functions._
import graft.core.{Canonical => C, Q, Tables => T}

/** Approximate / sampling operators (SURVEY.md §2C: excluded from the
  * hash-compare gate by nature — HLL estimates and sample membership are
  * engine-specific). Declared without oracle SQL (the driver records a
  * weaker rows-only check); value-level guarantees are asserted in
  * SketchSpec (estimate within HLL error bounds of the exact count;
  * sampling deterministic under a fixed seed).
  *
  * Scale role: these are the O(1)-memory substitutes for exact distinct /
  * full scans — an HLL sketch per partition merges associatively (one
  * tiny buffer per group crosses the shuffle), and seeded Bernoulli
  * sampling is a narrow scan with no shuffle at all.
  */
object Sketch {

  /** HLL distinct users per event_type next to the exact count's shape:
    * (event_type, approx). rsd=0.02 → ±2% typical error; sketch size
    * scales with 1/rsd², so this is 4× cheaper than rsd=0.01 while
    * SketchSpec's 5% bound still holds comfortably. */
  val approxDistinct: Q = Q.noOracle("q_approx_distinct") { (s, d) =>
    T.events(s, d)
      .groupBy("event_type")
      .agg(approx_count_distinct(col("user_id"), 0.02).as("approx_users"))
      .orderBy("event_type")
  }

  /** Seeded 1% Bernoulli sample of lineitem — the training-corpus
    * subset-selection primitive. Deterministic for a fixed seed and input
    * partitioning. */
  val sampleSeeded: Q = Q.noOracle("q_sample") { (s, d) =>
    T.lineitem(s, d)
      .sample(withReplacement = false, fraction = 0.01, seed = 42L)
      .select(col("l_orderkey"), col("l_linenumber"))
      .orderBy("l_orderkey", "l_linenumber")
  }

  /** Deterministic ~10% hash sample: keep rows whose key-digest lands in
    * the first 10 of 100 hash buckets. Unlike rand()-based sampling this
    * IS oracle-comparable (md5 is engine-portable, H1) and is the sampling
    * method that survives scale-out: membership depends only on the key,
    * so re-runs, retries, and different partitionings select the identical
    * subset — and the filter runs map-side with no shuffle. */
  val hashSample: Q = Q(
    "q_hash_sample",
    """SELECT event_id, user_id, event_type
      |FROM events
      |WHERE ('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 12))::BIGINT % 100 < 10
      |ORDER BY event_id""".stripMargin
  ) { (s, d) =>
    T.events(s, d)
      .filter(C.md5Long48(col("event_id").cast("string")) % 100 < 10)
      .select("event_id", "user_id", "event_type")
      .orderBy("event_id")
  }

  /** Stratified deterministic sampling: per-class keep rates (the
    * class-rebalancing step of corpus curation — downsample the dominant
    * classes, keep the rare ones whole). Same md5-bucket membership as
    * q_hash_sample, so the selection is retry-stable and partition-
    * independent, with the threshold a per-row CASE on the stratum. Pure
    * map-side filter — no shuffle at any scale. */
  val stratifiedSample: Q = Q(
    "q_stratified_sample",
    """WITH r AS (
      |  SELECT event_id, user_id, event_type,
      |    CASE event_type WHEN 'signup' THEN 100 WHEN 'purchase' THEN 50
      |      WHEN 'error' THEN 25 WHEN 'click' THEN 10 ELSE 5 END AS keep_pct
      |  FROM events)
      |SELECT event_id, user_id, event_type FROM r
      |WHERE ('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 12))::BIGINT % 100 < keep_pct
      |ORDER BY event_id""".stripMargin
  ) { (s, d) =>
    val keepPct = when(col("event_type") === "signup", 100)
      .when(col("event_type") === "purchase", 50)
      .when(col("event_type") === "error", 25)
      .when(col("event_type") === "click", 10)
      .otherwise(5)
    T.events(s, d)
      .filter(C.md5Long48(col("event_id").cast("string")) % 100 < keepPct)
      .select("event_id", "user_id", "event_type")
      .orderBy("event_id")
  }

  /** Approximate per-group quantiles — the O(1)-memory mergeable-sketch
    * substitute for q_quantiles' exact sort-based percentile_disc (the
    * swap BASELINE.md prescribes at 100 TB: the sketch merges
    * associatively across partitions, so one bounded buffer per group
    * crosses the shuffle instead of a sort). Approximate → no oracle;
    * SketchSpec bounds it against the exact discrete quantiles. */
  val approxQuantiles: Q = Q.noOracle("q_approx_quantiles") { (s, d) =>
    T.events(s, d)
      .groupBy("event_type")
      .agg(
        percentile_approx(col("value"), lit(0.5), lit(10000)).as("p50"),
        percentile_approx(col("value"), lit(0.9), lit(10000)).as("p90"))
      .orderBy("event_type")
  }

  /** Count-min sketch over the token stream — the mergeable heavy-hitters
    * structure: partial sketches build map-side and merge associatively,
    * so one fixed-size buffer per partition crosses the wire regardless
    * of token volume (the exact q_token_topk shuffles the whole
    * vocabulary). Output is the sketch itself + the exact stream length;
    * SketchSpec deserializes it and bounds the estimates (CMS never
    * underestimates; overestimate ≤ eps·N with the configured
    * confidence). No oracle — sketch bytes are engine-specific. */
  val heavyHitters: Q = Q.noOracle("q_heavy_hitters") { (s, d) =>
    T.documents(s, d)
      .select(explode(split(col("text"), " ")).as("token"))
      .agg(expr("count_min_sketch(token, 0.001d, 0.99d, 42)").as("sketch"),
        count(lit(1)).as("n_tokens"))
  }

  val all: Seq[Q] =
    Seq(approxDistinct, sampleSeeded, hashSample, stratifiedSample,
      approxQuantiles, heavyHitters)
}
