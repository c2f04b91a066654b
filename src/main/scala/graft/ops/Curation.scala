package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import graft.core.{Q, Tables => T}

/** End-to-end corpus curation — the composition the individual operators
  * exist for: near-dup removal (multiset-digest keepers) → quality floor
  * (length + type-token ratio, integer-math thresholds) → per-doc stats,
  * as ONE declarative plan.
  *
  * Scale shape: digest and both metrics are computed map-side from the
  * split array (size / array_distinct — no explode, no token-level
  * shuffle), then keeper selection is a single window over digest. The
  * only exchange carries (doc_id, digest, lang, source, two longs) per
  * document — the text itself never crosses a shuffle, so at 100 TB the
  * shuffle volume is O(docs), not O(tokens).
  */
object Curation {

  /** Keep one doc per token-multiset digest (min doc_id), require ≥20
    * tokens and type-token ratio ≥ 0.3 (spelled n_uniq·10 ≥ n_tok·3 so no
    * float compare crosses engines), and emit the curation metrics.
    * Keeper selection runs BEFORE the quality floor: a group whose keeper
    * fails quality contributes nothing (no promotion of the next doc). */
  val curate: Q = Q(
    "q_curation",
    """WITH scored AS (
      |  SELECT doc_id, lang, source,
      |    md5(array_to_string(list_sort(string_split(lower(text), ' ')), ',')) AS digest,
      |    len(string_split(text, ' ')) AS n_tok,
      |    len(list_distinct(string_split(text, ' '))) AS n_uniq
      |  FROM documents
      |), kept AS (
      |  SELECT * FROM scored
      |  QUALIFY doc_id = min(doc_id) OVER (PARTITION BY digest)
      |)
      |SELECT doc_id, lang, source, n_tok, n_uniq, n_uniq / n_tok AS ttr
      |FROM kept
      |WHERE n_tok >= 20 AND n_uniq * 10 >= n_tok * 3
      |ORDER BY doc_id""".stripMargin
  ) { (s, d) =>
    val toks = split(col("text"), " ")
    val scored = T.documents(s, d).select(
      col("doc_id"), col("lang"), col("source"),
      md5(concat_ws(",", sort_array(split(lower(col("text")), " ")))).as("digest"),
      size(toks).cast(LongType).as("n_tok"),
      size(array_distinct(toks)).cast(LongType).as("n_uniq"))
    scored
      .withColumn("keeper", min(col("doc_id")).over(Window.partitionBy(col("digest"))))
      .filter(col("doc_id") === col("keeper") &&
        col("n_tok") >= 20 && col("n_uniq") * 10 >= col("n_tok") * 3)
      .select(col("doc_id"), col("lang"), col("source"), col("n_tok"),
        col("n_uniq"), (col("n_uniq") / col("n_tok")).as("ttr"))
      .orderBy("doc_id")
  }

  /** Importance-weighted data selection — the DSIR-class curation step
    * (importance resampling toward a target distribution, public in the
    * data-selection literature): score every document by how much its
    * token distribution resembles a target subset (here lang='en', the
    * stand-in for "looks like the reference corpus"). True DSIR weights
    * are log-ratios of hashed n-gram LM probabilities; ln() fold order
    * differs across engines, so the signal here is the log-free
    * per-token target-affinity ratio in exact-integer ppm with add-one
    * smoothing — aff(t) = (cnt_target+1)·1e6 div (cnt_corpus+1) — and a
    * document's weight is its tf-weighted affinity mean. Selection is an
    * integer compare (weight·2 ≥ 1e6, i.e. affinity ≥ 0.5).
    *
    * Scale shape: the q_tfidf/q_rarity_score class — the token stream
    * collapses to per-doc tf first (one partial-aggregated shuffle), the
    * affinity table is one token-keyed aggregation with BOTH counts as
    * conditional sums of the same pass (no second scan for the target),
    * and the Zipf-skewed tf⋈aff join carries distinct (doc, token) pairs
    * only. Products stay < 2^53: tf ≤ doc length, aff ≤ 1e6. */
  /** The trainable artifact of q_importance_weight: per-token target
    * affinity in exact-integer ppm. Exposed separately so the streaming
    * gate (Stateful.importanceGate) can freeze it as a plan literal —
    * the same train-rarely/score-continuously split as ivfAssignStream. */
  def affinityTable(s: org.apache.spark.sql.SparkSession, d: String)
      : org.apache.spark.sql.DataFrame = {
    val tok = T.documents(s, d)
      .select(col("doc_id"), col("lang"),
        explode(split(col("text"), " ")).as("token"))
      .filter(col("token") =!= "")
    tok.groupBy("doc_id", "lang", "token").agg(count(lit(1)).as("tf"))
      .groupBy("token")
      .agg(sum(col("tf")).as("cnt_all"),
        sum(when(col("lang") === "en", col("tf")).otherwise(0L)).as("cnt_tgt"))
      .select(col("token"),
        expr("((cnt_tgt + 1) * 1000000) div (cnt_all + 1)").as("aff_ppm"))
  }

  val importanceWeight: Q = Q(
    "q_importance_weight",
    """WITH tok AS (
      |  SELECT doc_id, lang, unnest(string_split(text, ' ')) AS token
      |  FROM documents),
      |tf AS (SELECT doc_id, lang, token, count(*) AS tf FROM tok
      |       WHERE token <> '' GROUP BY 1, 2, 3),
      |cf AS (SELECT token,
      |    CAST(sum(tf) AS BIGINT) AS cnt_all,
      |    CAST(sum(CASE WHEN lang = 'en' THEN tf ELSE 0 END) AS BIGINT) AS cnt_tgt
      |  FROM tf GROUP BY 1),
      |aff AS (SELECT token,
      |    ((cnt_tgt + 1) * 1000000) // (cnt_all + 1) AS aff_ppm FROM cf)
      |SELECT tf.doc_id, tf.lang,
      |  CAST(sum(tf.tf) AS BIGINT) AS n_tok,
      |  CAST(sum(tf.tf * aff.aff_ppm) AS BIGINT) AS weight_sum,
      |  CAST(sum(tf.tf * aff.aff_ppm) // sum(tf.tf) AS BIGINT) AS weight_avg_ppm,
      |  CAST(CASE WHEN sum(tf.tf * aff.aff_ppm) * 2 >= sum(tf.tf) * 1000000
      |       THEN 1 ELSE 0 END AS BIGINT) AS selected
      |FROM tf JOIN aff USING (token)
      |GROUP BY 1, 2 ORDER BY doc_id""".stripMargin
  ) { (s, d) =>
    val tok = T.documents(s, d)
      .select(col("doc_id"), col("lang"),
        explode(split(col("text"), " ")).as("token"))
      .filter(col("token") =!= "")
    val tf = tok.groupBy("doc_id", "lang", "token").agg(count(lit(1)).as("tf"))
    val aff = tf.groupBy("token")
      .agg(sum(col("tf")).as("cnt_all"),
        sum(when(col("lang") === "en", col("tf")).otherwise(0L)).as("cnt_tgt"))
      .select(col("token"),
        expr("((cnt_tgt + 1) * 1000000) div (cnt_all + 1)").as("aff_ppm"))
    tf.join(aff, "token")
      .groupBy("doc_id", "lang")
      .agg(sum(col("tf")).as("n_tok"),
        sum(col("tf") * col("aff_ppm")).as("weight_sum"))
      .select(col("doc_id"), col("lang"), col("n_tok"), col("weight_sum"),
        expr("weight_sum div n_tok").as("weight_avg_ppm"),
        when(col("weight_sum") * 2 >= col("n_tok") * 1000000L, 1L)
          .otherwise(0L).as("selected"))
      .orderBy("doc_id")
  }

  /** Target-mix reweighting — the data-mixing step between curation and
    * packing: given the observed per-language document counts and a
    * UNIFORM target mix, emit each language's current share, the
    * sampling weight that would hit the target, the downsample-only keep
    * rate (upsampling is a repetition decision made elsewhere), and the
    * expected post-sampling count. All exact-integer ppm arithmetic
    * (weight = N·1e6 div (k·n), the inverse-frequency formula), so both
    * engines agree bit-for-bit.
    *
    * Scale shape: ONE partial-aggregating groupBy over (lang) — the
    * per-language census is k rows (k ≪ corpus) — and a 1-row corpus
    * census broadcast back; nothing else touches the data. The weights
    * table is the input a sampler (q_stratified_sample's per-class rate
    * map) consumes; at 100 TB this is the op that decides what the next
    * epoch's corpus looks like, and it costs one scan. */
  val mixWeights: Q = Q(
    "q_mix_weights",
    """WITH per AS (SELECT lang, count(*) AS n_docs FROM documents GROUP BY 1),
      |tot AS (SELECT CAST(count(*) AS BIGINT) AS n_total,
      |               CAST(count(DISTINCT lang) AS BIGINT) AS n_langs
      |        FROM documents)
      |SELECT per.lang, CAST(per.n_docs AS BIGINT) AS n_docs,
      |  CAST((per.n_docs * 1000000) // tot.n_total AS BIGINT) AS share_ppm,
      |  CAST(1000000 // tot.n_langs AS BIGINT) AS target_ppm,
      |  CAST((tot.n_total * 1000000) // (tot.n_langs * per.n_docs) AS BIGINT)
      |    AS weight_ppm,
      |  CAST(least(1000000, (tot.n_total * 1000000) // (tot.n_langs * per.n_docs))
      |    AS BIGINT) AS keep_ppm,
      |  CAST((per.n_docs *
      |    least(1000000, (tot.n_total * 1000000) // (tot.n_langs * per.n_docs)))
      |    // 1000000 AS BIGINT) AS expected_kept
      |FROM per CROSS JOIN tot ORDER BY lang""".stripMargin
  ) { (s, d) =>
    val docs = T.documents(s, d)
    val per = docs.groupBy("lang").agg(count(lit(1)).as("n_docs"))
    val tot = docs.agg(count(lit(1)).as("n_total"),
      countDistinct(col("lang")).as("n_langs"))
    per.crossJoin(broadcast(tot))
      .select(col("lang"), col("n_docs"),
        expr("(n_docs * 1000000) div n_total").as("share_ppm"),
        expr("1000000 div n_langs").as("target_ppm"),
        expr("(n_total * 1000000) div (n_langs * n_docs)").as("weight_ppm"),
        expr("least(1000000L, (n_total * 1000000) div (n_langs * n_docs))")
          .as("keep_ppm"),
        expr("(n_docs * least(1000000L, (n_total * 1000000) div (n_langs * n_docs))) div 1000000")
          .as("expected_kept"))
      .orderBy("lang")
  }

  /** Deterministic global shuffle into training shards — the step that
    * turns a curated corpus into the randomized shard files a trainer
    * streams: shard = multiplicative hash of doc_id mod S, with S
    * DERIVED from the corpus (S = n_docs div 128 + 1, so shards stay
    * ~128 docs at every sf instead of hard-coding a count that is wrong
    * at 1000× the data). The census reports each shard's size, char
    * mass, and id range — the balance evidence (multiplicative hashing
    * spreads sequential ids), plus the skew census a scheduler needs.
    *
    * Scale shape: the shard key is pure per-row integer math (codegen'd,
    * no shuffle to ASSIGN); the census is one partial-aggregating
    * groupBy on S keys. An actual shard WRITE would be
    * repartitionByRange on the same key — the assignment proven here is
    * the whole algorithm. */
  val shardShuffle: Q = Q(
    "q_shard_shuffle",
    """WITH nd AS (SELECT count(*) // 128 + 1 AS s FROM documents),
      |a AS (SELECT ((doc_id % 1048573) * 2654435761) % nd.s AS shard,
      |             doc_id, n_chars
      |      FROM documents CROSS JOIN nd)
      |SELECT CAST(shard AS BIGINT) AS shard,
      |  CAST(count(*) AS BIGINT) AS n_docs,
      |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
      |  CAST(min(doc_id) AS BIGINT) AS min_doc,
      |  CAST(max(doc_id) AS BIGINT) AS max_doc
      |FROM a GROUP BY shard ORDER BY shard""".stripMargin
  ) { (s, d) =>
    val docs = T.documents(s, d)
    val nd = docs.agg(expr("count(*) div 128 + 1").as("s"))
    docs.crossJoin(broadcast(nd))
      .select(expr("((doc_id % 1048573) * 2654435761) % s").as("shard"),
        col("doc_id"), col("n_chars"))
      .groupBy("shard")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("sum_chars"),
        min(col("doc_id")).as("min_doc"),
        max(col("doc_id")).as("max_doc"))
      .orderBy("shard")
  }

  /** Deterministic round-robin interleave of language sub-corpora into
    * one global training order: the i-th doc of every language (by
    * doc_id) is scheduled before any (i+1)-th doc, ties across languages
    * broken by language code — so a trainer streaming the schedule sees
    * every language continuously instead of corpus-order language runs.
    * Output is the verification census over 100-position buckets of the
    * schedule (per-bucket per-language counts + position ranges), which
    * is how an engineer checks the mix is actually uniform over time.
    *
    * Scale shape — two ideas make this O(scan) instead of one global
    * sort:
    *  1. WITHIN-LANGUAGE RANK is two-phase range-bucketed (the
    *     GridPercentile recipe): per-(lang, id-range) counts (tiny),
    *     a running offset over that tiny table, plus a row_number
    *     bounded to one range bucket — no language-sized window
    *     partition anywhere, so a 100 TB mono-lingual corpus cannot
    *     single-reduce.
    *  2. GLOBAL POSITION is a CLOSED FORM of (rank, lang) against the
    *     k-row per-language census: pos = 1 + Σ_L' min(n_L', rank−1)
    *     + #{L' < lang with n_L' ≥ rank} — a map-side expression built
    *     from a bounded control-plane read (k languages), not a global
    *     row_number. The oracle computes the same schedule with plain
    *     window functions; CurationSpec proves the closed form IS
    *     row_number over (rank, lang). */
  val interleave: Q = Q(
    "q_interleave",
    """WITH r AS (SELECT doc_id, lang,
      |    row_number() OVER (PARTITION BY lang ORDER BY doc_id) AS rk
      |  FROM documents),
      |p AS (SELECT lang, row_number() OVER (ORDER BY rk, lang) AS pos FROM r)
      |SELECT CAST((pos - 1) // 100 AS BIGINT) AS bucket, lang,
      |  CAST(count(*) AS BIGINT) AS n_docs,
      |  CAST(min(pos) AS BIGINT) AS min_pos,
      |  CAST(max(pos) AS BIGINT) AS max_pos
      |FROM p GROUP BY 1, 2 ORDER BY bucket, lang""".stripMargin
  ) { (s, d) => interleaveCensus(scheduleOf(s, d)) }

  /** (doc_id, lang, rk, pos) — the full interleaved schedule, factored so
    * CurationSpec can compare the closed-form pos against a literal
    * row_number over (rk, lang). */
  private[graft] def scheduleOf(s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame = {
    val docs = T.documents(s, d).select(col("doc_id"), col("lang"))
    val maxRow = docs.agg(max(col("doc_id"))).head()
    val maxId = if (maxRow.isNullAt(0)) 0L else maxRow.getLong(0)
    // range width: ≤ ~1M offset rows however large the corpus, floor 1024
    // so small corpora stay single-bucket-per-lang
    val w = math.max(1024L, (maxId + 1) / 1048576L)
    val withRb = docs.withColumn("rb", expr(s"doc_id div $w"))
    val cnt = withRb.groupBy("lang", "rb").agg(count(lit(1)).as("c"))
    val wOff = Window.partitionBy("lang").orderBy("rb")
      .rowsBetween(Window.unboundedPreceding, -1)
    val off = cnt.select(col("lang"), col("rb"),
      coalesce(sum(col("c")).over(wOff), lit(0L)).as("off"))
    val wIn = Window.partitionBy("lang", "rb").orderBy("doc_id")
    val ranked = withRb.withColumn("rn", row_number().over(wIn))
      .join(off, Seq("lang", "rb"))
      .select(col("doc_id"), col("lang"),
        (col("off") + col("rn")).as("rk"))
    // k-language census: the bounded control-plane read the closed form
    // is built from (same convention as the frozen-model collects)
    val langN = docs.groupBy("lang").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).sortBy(_._1)
    // empty corpus: no languages to fold the closed form over (and the
    // schedule is empty anyway) — pos := rk keeps the schema
    if (langN.isEmpty) return ranked.withColumn("pos", col("rk"))
    val before = langN.map { case (_, n) =>
      least(lit(n), col("rk") - 1L) }.reduce(_ + _)
    val ties = langN.map { case (l, n) =>
      when(lit(l) < col("lang") && lit(n) >= col("rk"), 1L).otherwise(0L)
    }.reduce(_ + _)
    ranked.withColumn("pos", lit(1L) + before + ties)
  }

  private def interleaveCensus(sched: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame =
    sched
      .groupBy(expr("(pos - 1) div 100").as("bucket"), col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        min(col("pos")).as("min_pos"), max(col("pos")).as("max_pos"))
      .orderBy("bucket", "lang")

  /** Temporal train/val/test split with a leakage audit — the dataset-
    * versioning step every eval pipeline needs before it can trust a
    * number: events are cut at the 80% and 90% points of the corpus's
    * OWN time range (boundaries derived by exact integer math over
    * epoch-microsecond min/max, so both engines cut identically), and
    * each split reports its event count, distinct-entity count, how many
    * of its entities ALSO appear in an earlier split (train < val <
    * test), and that overlap as ppm — the cross-split entity leakage a
    * time-based split is supposed to allow (same user, later behavior)
    * but an ENTITY-disjoint protocol must flag. The audit is the point:
    * whichever protocol the eval claims, this census is the evidence.
    *
    * Scale shape: one 1-row time-range census broadcast back; the split
    * id is per-row integer math (no shuffle to assign); the census is a
    * 3-group aggregate; the leakage self-join runs on the DISTINCT
    * (split, user) table — O(users), keyed by user_id, 3 rows per user
    * max — never on events. */
  val temporalSplit: Q = Q(
    "q_temporal_split",
    """WITH b AS (SELECT min(epoch_us(ts)) AS mn, max(epoch_us(ts)) AS mx
      |           FROM events),
      |a AS (SELECT user_id,
      |        CASE WHEN epoch_us(ts) < b.mn + ((b.mx - b.mn) * 8) // 10 THEN 0
      |             WHEN epoch_us(ts) < b.mn + ((b.mx - b.mn) * 9) // 10 THEN 1
      |             ELSE 2 END AS sp
      |      FROM events CROSS JOIN b),
      |spl AS (SELECT sp, count(*) AS n_events,
      |               count(DISTINCT user_id) AS n_users
      |        FROM a GROUP BY 1),
      |u AS (SELECT DISTINCT sp, user_id FROM a),
      |seen AS (SELECT u.sp, count(DISTINCT u.user_id) AS n_seen
      |         FROM u JOIN u p ON p.user_id = u.user_id AND p.sp < u.sp
      |         GROUP BY 1)
      |SELECT CASE spl.sp WHEN 0 THEN 'train' WHEN 1 THEN 'val' ELSE 'test' END
      |    AS split,
      |  CAST(spl.n_events AS BIGINT) AS n_events,
      |  CAST(spl.n_users AS BIGINT) AS n_users,
      |  CAST(coalesce(seen.n_seen, 0) AS BIGINT) AS n_seen_users,
      |  CAST((coalesce(seen.n_seen, 0) * 1000000) // spl.n_users AS BIGINT)
      |    AS leak_ppm
      |FROM spl LEFT JOIN seen ON seen.sp = spl.sp
      |ORDER BY split""".stripMargin
  ) { (s, d) =>
    val ev = T.events(s, d)
      .select(col("user_id"), unix_micros(col("ts")).as("ts_us"))
    val b = ev.agg(min(col("ts_us")).as("mn"), max(col("ts_us")).as("mx"))
    val a = ev.crossJoin(broadcast(b))
      .select(col("user_id"),
        when(col("ts_us") < col("mn") + expr("((mx - mn) * 8) div 10"), 0L)
          .when(col("ts_us") < col("mn") + expr("((mx - mn) * 9) div 10"), 1L)
          .otherwise(2L).as("sp"))
    val spl = a.groupBy("sp")
      .agg(count(lit(1)).as("n_events"), countDistinct(col("user_id")).as("n_users"))
    val u = a.distinct()
    val seen = u.as("u")
      .join(u.select(col("sp").as("p_sp"), col("user_id").as("p_uid")),
        col("p_uid") === col("user_id") && col("p_sp") < col("sp"))
      .groupBy("sp")
      .agg(countDistinct(col("user_id")).as("n_seen"))
    spl.join(seen.withColumnRenamed("sp", "s_sp"),
        col("s_sp") === col("sp"), "left")
      .select(
        when(col("sp") === 0L, "train").when(col("sp") === 1L, "val")
          .otherwise("test").as("split"),
        col("n_events"), col("n_users"),
        coalesce(col("n_seen"), lit(0L)).as("n_seen_users"),
        expr("(coalesce(n_seen, 0L) * 1000000) div n_users").as("leak_ppm"))
      .orderBy("split")
  }

  /** Data-constrained epoch planning — the step AFTER q_mix_weights
    * decides target shares: a trainer with a token budget larger than
    * the corpus must REPEAT sources, and repeating a source beyond a few
    * epochs stops buying quality (the public data-constrained-scaling
    * result), so the plan is per-source "how many epochs, how many
    * tokens allocated, how short of target". Budget = 2× the corpus's
    * total tokens (census-derived, so the fixture is genuinely
    * data-constrained at every sf), target share = budget split evenly
    * across sources (the q_mix_weights uniform-target convention),
    * epochs = target/owned capped at 4.0 — all exact-integer ppm
    * arithmetic, so both engines agree bit-for-bit. deficit_tok > 0 is
    * the actionable output: the tokens the mixture CANNOT supply at the
    * cap, i.e. where to spend acquisition effort.
    *
    * Scale shape: ONE documents scan → partial-aggregated per-source
    * token census (S=20 keys); the global census (budget, n_sources) is
    * re-aggregated from the S-row per-source table — never a second
    * corpus scan — and broadcast-cross-joined back (the q_mix_weights
    * shape, minus its double scan). Everything after the census is
    * O(sources) arithmetic; at 100 TB this is literally the same plan —
    * the census is the only data-sized term. */
  val epochPlan: Q = Q(
    "q_epoch_plan",
    """WITH per AS (SELECT source,
      |    CAST(count(*) AS BIGINT) AS n_docs,
      |    CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS own_tok
      |  FROM documents GROUP BY 1),
      |tot AS (SELECT CAST(sum(len(string_split(text, ' '))) * 2 AS BIGINT)
      |    AS budget_tok,
      |    CAST(count(DISTINCT source) AS BIGINT) AS n_sources
      |  FROM documents)
      |SELECT source, n_docs, own_tok,
      |  budget_tok // n_sources AS target_tok,
      |  least(4000000, (budget_tok // n_sources) * 1000000 // own_tok)
      |    AS epochs_ppm,
      |  own_tok * least(4000000, (budget_tok // n_sources) * 1000000 // own_tok)
      |    // 1000000 AS alloc_tok,
      |  budget_tok // n_sources
      |    - own_tok * least(4000000, (budget_tok // n_sources) * 1000000 // own_tok)
      |      // 1000000 AS deficit_tok
      |FROM per CROSS JOIN tot ORDER BY source""".stripMargin
  ) { (s, d) =>
    val toks = T.documents(s, d)
      .select(col("source"), size(split(col("text"), " ")).cast(LongType).as("tok"))
    // one corpus scan; the S-row census is referenced twice (the global
    // roll-up and the output spine), so pin it
    val per = toks.groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum(col("tok")).as("own_tok"))
      .localCheckpoint()
    val tot = per.agg((sum(col("own_tok")) * 2L).as("budget_tok"),
      count(lit(1)).as("n_sources"))
    per.crossJoin(broadcast(tot))
      .withColumn("target_tok", expr("budget_tok div n_sources"))
      .withColumn("epochs_ppm",
        expr("least(4000000L, target_tok * 1000000 div own_tok)"))
      .withColumn("alloc_tok", expr("own_tok * epochs_ppm div 1000000"))
      .select(col("source"), col("n_docs"), col("own_tok"), col("target_tok"),
        col("epochs_ppm"), col("alloc_tok"),
        expr("target_tok - alloc_tok").as("deficit_tok"))
      .orderBy("source")
  }

  /** Split-churn audit under corpus growth — the WHY behind hash-based
    * split assignment, measured: an id-RANGE 80/10/10 split (the
    * q_temporal_split shape, thresholds derived from the corpus census)
    * moves its boundaries UP every time the corpus grows, silently
    * promoting documents the previous checkpoint evaluated on into the
    * new training set (the worst possible leak: yesterday's val/test is
    * tomorrow's training data); a content-HASH split
    * (the q_hash_sample md5-bucket membership) is checkpoint-independent
    * by construction. This operator replays both policies at two ingest
    * checkpoints (the id-half prefix — the q_vocab_growth convention —
    * and the full corpus) and emits the split transition matrix over the
    * documents present at both: the hash policy's matrix must be exactly
    * diagonal, and the range policy's off-diagonal mass IS the churn an
    * entity-stable eval protocol cannot absorb (with monotone ids the
    * boundaries only grow, so every off-diagonal cell is a val/test →
    * train promotion; the matrix shows each explicitly).
    *
    * Scale shape: one 2-value census (min/max id, a 1-row control read),
    * then a single map-side pass over documents — two CASE columns and
    * an md5 bucket per row, no join, no window — into a ≤ 18-group
    * partial aggregate. Nothing shuffles but the final tiny group-by. */
  val splitChurn: Q = Q(
    "q_split_churn",
    """WITH c AS (SELECT min(doc_id) AS mn, max(doc_id) AS mx FROM documents),
      |b AS (SELECT mn, mx, mid,
      |    mn - 1 + (mid - mn + 1) * 8 // 10 AS t80o,
      |    mn - 1 + (mid - mn + 1) * 9 // 10 AS t90o,
      |    mn - 1 + (mx - mn + 1) * 8 // 10 AS t80n,
      |    mn - 1 + (mx - mn + 1) * 9 // 10 AS t90n
      |  FROM (SELECT mn, mx, mn - 1 + (mx - mn + 1) // 2 AS mid FROM c)),
      |r AS (
      |  SELECT 'range' AS policy,
      |    CASE WHEN doc_id <= t80o THEN 'train' WHEN doc_id <= t90o THEN 'val'
      |      ELSE 'test' END AS old_split,
      |    CASE WHEN doc_id <= t80n THEN 'train' WHEN doc_id <= t90n THEN 'val'
      |      ELSE 'test' END AS new_split
      |  FROM documents CROSS JOIN b WHERE doc_id <= mid
      |  UNION ALL
      |  SELECT 'hash',
      |    CASE WHEN hb < 80 THEN 'train' WHEN hb < 90 THEN 'val' ELSE 'test' END,
      |    CASE WHEN hb < 80 THEN 'train' WHEN hb < 90 THEN 'val' ELSE 'test' END
      |  FROM (SELECT doc_id,
      |      ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 12))::BIGINT % 100 AS hb
      |    FROM documents) h CROSS JOIN b WHERE doc_id <= mid)
      |SELECT policy, old_split, new_split, CAST(count(*) AS BIGINT) AS n_docs
      |FROM r GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin
  ) { (s, d) =>
    val docs = T.documents(s, d)
    val cRow = docs.agg(min(col("doc_id")), max(col("doc_id"))).head()
    val (mn, mx) = (cRow.getLong(0), cRow.getLong(1))
    val mid = mn - 1 + (mx - mn + 1) / 2
    def rangeSplit(id: org.apache.spark.sql.Column, hi: Long)
        : org.apache.spark.sql.Column = {
      val t80 = mn - 1 + (hi - mn + 1) * 8 / 10
      val t90 = mn - 1 + (hi - mn + 1) * 9 / 10
      when(id <= t80, "train").when(id <= t90, "val").otherwise("test")
    }
    val hashSplit = {
      val hb = graft.core.Canonical.md5Long48(col("doc_id").cast("string")) % 100
      when(hb < 80, "train").when(hb < 90, "val").otherwise("test")
    }
    val prefix = docs.filter(col("doc_id") <= mid)
    prefix
      .select(lit("range").as("policy"),
        rangeSplit(col("doc_id"), mid).as("old_split"),
        rangeSplit(col("doc_id"), mx).as("new_split"))
      .unionAll(prefix.select(lit("hash").as("policy"),
        hashSplit.as("old_split"), hashSplit.as("new_split")))
      .groupBy("policy", "old_split", "new_split")
      .agg(count(lit(1)).as("n_docs"))
      .orderBy("policy", "old_split", "new_split")
  }

  /** Shuffle-quality eval: does the deterministic shard shuffle actually
    * DECORRELATE sources at read time? A training loader that reads
    * same-source documents back-to-back trains on correlated batches no
    * matter how balanced the shards are (q_shard_shuffle audits balance,
    * not order). Within each shard this measures the serial source
    * correlation of two read orders — ingest (doc_id) and shuffled (the
    * md5-bucket key, the q_hash_sample membership hash as a sort key) —
    * as the fraction of ADJACENT pairs sharing a source, next to the
    * exact random-permutation expectation: in a uniform shuffle of a
    * shard with per-source counts c_s (n total), the expected number of
    * same-source adjacencies is Σ c_s(c_s−1)/n; per-shard values are
    * ppm-scaled, floored, then pooled over shards (both engines run the
    * identical floor chain, so the pooled statistic is engine-exact). A
    * healthy shuffle reads ≈ expected; ingest order deviating in EITHER
    * direction marks structure — above when sources arrive in runs,
    * below when a round-robin writer interleaved them (this corpus reads
    * 0 ppm at ingest: perfectly anti-correlated, which would starve any
    * loader that assumes i.i.d. batches of per-source statistics).
    *
    * Scale shape: shard assignment and the md5 key are map-side; each
    * read order costs one window shuffle partitioned by shard (per-key
    * work bounded by the ~128-doc shard size q_shard_shuffle fixes by
    * construction); the expectation is two partial-agg censuses. All
    * final arithmetic happens on a 2×4-value control read. */
  val shuffleQuality: Q = Q(
    "q_shuffle_quality",
    """WITH nd AS (SELECT count(*) // 128 + 1 AS s FROM documents),
      |a AS MATERIALIZED (SELECT
      |    ((doc_id % 1048573) * 2654435761) % nd.s AS shard, doc_id, source,
      |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 12))::BIGINT AS rnd
      |  FROM documents CROSS JOIN nd),
      |ing AS (SELECT source,
      |    lag(source) OVER (PARTITION BY shard ORDER BY doc_id) AS prev FROM a),
      |shf AS (SELECT source,
      |    lag(source) OVER (PARTITION BY shard ORDER BY rnd, doc_id) AS prev FROM a),
      |obs AS (
      |  SELECT 'ingest' AS read_order, CAST(count(prev) AS BIGINT) AS n_pairs,
      |    CAST(count(*) FILTER (WHERE prev = source) AS BIGINT) AS n_same
      |  FROM ing
      |  UNION ALL
      |  SELECT 'shuffled', CAST(count(prev) AS BIGINT),
      |    CAST(count(*) FILTER (WHERE prev = source) AS BIGINT)
      |  FROM shf),
      |cs AS (SELECT shard, source, CAST(count(*) AS BIGINT) AS c
      |  FROM a GROUP BY 1, 2),
      |ex AS (SELECT CAST(sum(en) AS BIGINT) AS num, CAST(sum(n - 1) AS BIGINT) AS den
      |  FROM (SELECT shard, sum(c * (c - 1)) * 1000000 // sum(c) AS en,
      |      sum(c) AS n
      |    FROM cs GROUP BY shard))
      |SELECT read_order, n_pairs, n_same,
      |  CAST(CASE WHEN n_pairs = 0 THEN 0
      |    ELSE n_same * 1000000 // n_pairs END AS BIGINT) AS same_ppm,
      |  CAST(CASE WHEN ex.den = 0 THEN 0 ELSE ex.num // ex.den END AS BIGINT)
      |    AS expected_ppm
      |FROM obs CROSS JOIN ex ORDER BY read_order""".stripMargin
  ) { (s, d) =>
    val docs = T.documents(s, d)
    val nd = docs.agg(expr("count(*) div 128 + 1").as("s"))
    val a = docs.crossJoin(broadcast(nd))
      .select(expr("((doc_id % 1048573) * 2654435761) % s").as("shard"),
        col("doc_id"), col("source"),
        graft.core.Canonical.md5Long48(col("doc_id").cast("string")).as("rnd"))
      .localCheckpoint() // two window passes + the expectation censuses
    def adjacency(w: org.apache.spark.sql.expressions.WindowSpec): (Long, Long) = {
      val r = a.select(col("source"), lag(col("source"), 1).over(w).as("prev"))
        .agg(count(col("prev")),
          coalesce(sum(when(col("prev") === col("source"), 1L).otherwise(0L)),
            lit(0L)))
        .head()
      (r.getLong(0), r.getLong(1))
    }
    val (ingP, ingS) = adjacency(
      Window.partitionBy("shard").orderBy(col("doc_id")))
    val (shfP, shfS) = adjacency(
      Window.partitionBy("shard").orderBy(col("rnd"), col("doc_id")))
    val ex = a.groupBy("shard", "source").agg(count(lit(1)).as("c"))
      .groupBy("shard")
      .agg(expr("sum(c * (c - 1)) * 1000000 div sum(c)").as("en"),
        sum(col("c")).as("n"))
      .agg(coalesce(sum(col("en")), lit(0L)),
        coalesce(sum(col("n") - 1L), lit(0L)))
      .head()
    val expPpm = if (ex.getLong(1) == 0L) 0L else ex.getLong(0) / ex.getLong(1)
    def ppm(same: Long, pairs: Long) = if (pairs == 0L) 0L else same * 1000000L / pairs
    import s.implicits._
    Seq(("ingest", ingP, ingS, ppm(ingS, ingP), expPpm),
      ("shuffled", shfP, shfS, ppm(shfS, shfP), expPpm))
      .toDF("read_order", "n_pairs", "n_same", "same_ppm", "expected_ppm")
      .orderBy("read_order")
  }

  val all: Seq[Q] =
    Seq(curate, importanceWeight, mixWeights, shardShuffle, interleave,
      temporalSplit, epochPlan, splitChurn, shuffleQuality)
}
