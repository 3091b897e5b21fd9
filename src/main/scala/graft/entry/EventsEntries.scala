package graft.entry

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr, hex}

import graft.ext.{Audit, Events, Multimodal}
import EntryUtil._

/**
 * Driver-contract queries for event-stream analytics and the multimodal
 * metadata path. Event-time arithmetic is exact int64 nanoseconds on both
 * sides (Spark normalizes the parquet timestamp to an epoch-ns Long at the
 * scan boundary, [[graft.ext.Events.normalizeTs]]; DuckDB via epoch_ns) —
 * no float timestamps, no timezone dependence.
 */
object EventsEntries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "events_hourly" -> ((s, dir) =>
      gate(Events.hourly(Events.read(s, dir)), "hour_start_sec", "event_type")),
    // unique reach per (hour, type) — exact count-distinct; the
    // events/users ratio is the bot/hot-user abuse signal
    "events_hourly_uniques" -> ((s, dir) =>
      gate(Events.hourlyUniques(Events.read(s, dir)),
        "hour_start_sec", "event_type")),
    // recency-weighted engagement: exp(-ln2*age/halfLife) per event,
    // decay rate a JVM literal shared with the oracle
    "events_decay" -> ((s, dir) =>
      gate(Events.decayedEngagement(Events.read(s, dir)), "user_id")),
    "events_sessionize" -> ((s, dir) =>
      gate(Events.sessionize(Events.read(s, dir)), "user_id", "session_id")),
    // as-of join, inner form: the contract output stays NULL-free so the
    // driver's hash compare never sees engine-specific null encodings.
    // Timestamps are pre-truncated to MICROSECONDS on the Spark side so
    // both engines match and subtract identical integers (the testdata is
    // µs-precision; DuckDB's epoch_us reads it exactly). The library
    // operator itself is ns-exact.
    "events_asof" -> ((s, dir) =>
      gate(Events.lastPriorEvent(
          Events.read(s, dir).withColumn("ts", expr("ts div 1000")),
          AsofProbe, AsofRef)
        .where(col("ref_event_id").isNotNull)
        .withColumnRenamed("ts", "ts_us")
        .withColumnRenamed("lag_ns", "lag_us"), "event_id")),
    // 7-day rolling distinct reach (WAU curve) via the bounded-explode
    // shape — rolling COUNT DISTINCT has no windowed form; work is
    // active-user-days x 7, independent of per-day volume. Day indexing
    // on µs like the other time contracts
    "events_rolling_reach" -> ((s, dir) =>
      gate(Events.rollingReach(
          Events.read(s, dir).withColumn("ts", expr("ts div 1000")),
          windowDays = ReachWindowDays, dayTicks = 86400000000L),
        "day_index")),
    // interval attribution: EVERY click in the 24h band before each
    // purchase (multi-touch; events_asof keeps only the last). Same µs
    // truncation as events_asof; lag is exact integer µs
    "events_attribution" -> ((s, dir) =>
      gate(Events.clickAttribution(
          Events.read(s, dir).withColumn("ts", expr("ts div 1000")),
          AsofProbe, AsofRef, horizon = AttribHorizonUs)
        .withColumnRenamed("p_ts", "p_ts_us")
        .withColumnRenamed("c_ts", "c_ts_us")
        .withColumnRenamed("lag", "lag_us"),
        "purchase_id", "click_id")),
    // rolling per-user trailing-window features. Same µs truncation as
    // events_asof (DuckDB's parquet reader truncates ns→µs): the CONTRACT
    // runs both engines on µs-truncated int64 time; the library operator
    // itself is ns-exact.
    "events_rolling" -> ((s, dir) =>
      gate(Events.rolling(
          Events.read(s, dir).withColumn("ts", expr("ts div 1000")),
          span = RollingSpanUs)
        .withColumnRenamed("ts", "ts_us"), "event_id")),
    // ordered funnel (view → click → purchase), per-user step times.
    // Same µs truncation as events_asof; the contract coalesces the
    // nullable step times to -1 so the output stays NULL-free for the
    // driver's hash compare.
    "events_funnel" -> ((s, dir) => {
      val f = Events.funnel(
        Events.read(s, dir).withColumn("ts", expr("ts div 1000")),
        FunnelSteps)
      gate(f.select(col("user_id"),
        expr("coalesce(t1, -1)").as("step1_us"),
        expr("coalesce(t2, -1)").as("step2_us"),
        expr("coalesce(t3, -1)").as("step3_us"),
        col("depth")), "user_id")
    }),
    // heavy-key shuffle-skew audit over the event stream's user_id
    "events_skew" -> ((s, dir) =>
      gate(Audit.skewAudit(Events.read(s, dir), "user_id", SkewTopN),
        "rank")),
    // daily cohort retention triangle (first-event cohort x day offset)
    "events_retention" -> ((s, dir) =>
      gate(Events.retention(Events.read(s, dir)), "cohort", "bucket_offset")),
    // one-row-per-user engagement feature table
    "events_user_profile" -> ((s, dir) =>
      gate(Events.userProfile(Events.read(s, dir)), "user_id")),
    // hourly volume z-scores per event type (ops anomaly monitor)
    "events_anomaly" -> ((s, dir) =>
      gate(Events.hourlyAnomaly(Events.read(s, dir)),
        "hour_start_sec", "event_type")),
    // first-order (prev → next) transition counts + row-normalized
    // probabilities; the terminal '(end)' row makes each prev row a
    // proper distribution. Probability is one division of exact counts.
    "events_transitions" -> ((s, dir) =>
      gate(Events.transitionMatrix(Events.read(s, dir)),
        "prev_type", "next_type")),
    // hash-randomized A/B readout: deterministic mix-chain arms, purchase
    // conversion, pooled two-proportion z — a 1-row summary
    "events_abtest" -> ((s, dir) =>
      gate(Events.abTest(Events.read(s, dir), AbConvType), "n0")),
    // ext: top-k 3-step event paths — the sequence-mining layer past the
    // first-order transition matrix; one lead window, exact-count top-k
    "events_paths" -> ((s, dir) =>
      gate(Events.topPaths(Events.read(s, dir), PathLen, PathK), "path")),
    // ext: session concurrency — the interval-overlap self-join spelled
    // as a bucket-keyed equi-join with the exact overlap predicate
    // riding it; overlaps pair-deduped, zero-overlap rows kept
    "events_concurrency" -> ((s, dir) =>
      gate(Events.concurrentSessions(Events.read(s, dir),
        bucketSec = ConcBucketSec), "user_id", "session_id")),
    // ext: Kaplan–Meier lifetime survival with right censoring — the
    // churn curve; exact int64 risk sets, the KM product folded as a
    // window-ordered exp(Σ ln), extinction pinned to exactly 0
    "events_survival" -> ((s, dir) =>
      gate(Events.survivalCurve(Events.read(s, dir),
        censorBuckets = SurvivalCensorDays), "t")),
    // ext: CUPED variance-reduced A/B readout + SRM chi-square — the
    // pre-period covariate (midpoint cut, exact int64) removes
    // θ²·var(X) of the metric variance; every moment is an exact int64
    // sum, divisions only at the end
    "events_cuped" -> ((s, dir) =>
      gate(Events.abTestCuped(Events.read(s, dir), AbConvType), "n0")),
    // HLL register-UNION audience overlap per event-type pair: the
    // sketch set operation (merged registers = union's sketch) +
    // inclusion–exclusion intersection, audited against the exact join
    "events_reach_overlap" -> ((s, dir) =>
      gate(Events.reachOverlap(Events.read(s, dir)), "t0", "t1")),
    "multimodal_meta" -> ((s, dir) =>
      gate(Multimodal.metadata(docs(s, dir), "doc_id", "text"), "doc_id")),
    // frame sampling ahead of decode: 16-char frames, every 4th kept.
    // The CONTRACT hex-encodes the binary frame so the driver's pandas
    // sort/hash can handle it (raw bytes are unhashable there); the
    // library operator (Multimodal.sampleFrames) stays binary.
    "multimodal_frames" -> ((s, dir) =>
      gate(Multimodal.sampleFrames(docs(s, dir), "doc_id", "text",
        FrameChars, FrameStride)
        .withColumn("frame", hex(col("frame"))), "doc_id", "frame_no")),
    // REAL codec round-trip: per-doc planted RGB image → actual ImageIO
    // PNG encode → binary payload column → actual ImageIO decode →
    // exact integer channel sums. PNG is lossless, so the oracle
    // recomputes the sums in closed form from doc_id — any byte the
    // codec pair mishandles breaks the hash.
    "multimodal_decode" -> ((s, dir) => {
      implicit val sp: SparkSession = s
      gate(Multimodal.imageStats(
        Multimodal.withPngPayload(docs(s, dir), "doc_id"),
        "doc_id", "payload").toDF(), "doc_id")
    }),
    // REAL decode + nearest-neighbor RESIZE through the same codec seam:
    // per-channel sums of the fixed thumbnail grid — the preprocessing
    // step between decode and any vision featurizer; the oracle replays
    // the exact sampling arithmetic closed-form
    "multimodal_resize" -> ((s, dir) => {
      implicit val sp: SparkSession = s
      gate(Multimodal.resizeStats(
        Multimodal.withPngPayload(docs(s, dir), "doc_id"),
        "doc_id", "payload", ResizeW, ResizeH).toDF(), "doc_id")
    }),
    // perceptual dHash over the REAL codec: group-planted near-dup PNGs
    // (one base image per 25-id block, per-member red brightness shift)
    // decoded through actual ImageIO, reduced to the 9×8-grid
    // difference hash. The oracle recomputes grid, integer luminance,
    // and bit packing closed-form from doc_id.
    "multimodal_phash" -> ((s, dir) => {
      implicit val sp: SparkSession = s
      gate(Multimodal.imageDHash(
        Multimodal.withGroupedPngPayload(docs(s, dir), "doc_id", PhashGroup),
        "doc_id", "payload"), "doc_id")
    }),
    // banded Hamming join over those hashes: brightness variants match
    // within a few bits (mod-256 wrap pixels), candidates only from the
    // four 16-bit band equi-joins — never an all-pairs scan
    "multimodal_phash_dups" -> ((s, dir) => {
      implicit val sp: SparkSession = s
      gate(Multimodal.phashDups(Multimodal.imageDHash(
        Multimodal.withGroupedPngPayload(docs(s, dir), "doc_id", PhashGroup),
        "doc_id", "payload").localCheckpoint(), MaxPhashHamming),
        "doc0", "doc1")
    }),
    // the BUCKET-CAPPED scale path (banding analog of dfCapShingles):
    // band values above the occupancy bound leave candidate generation
    // — the lever that keeps low-entropy image corpora sub-quadratic
    // (measured 78× candidates for 10× docs uncapped)
    "multimodal_phash_dups_capped" -> ((s, dir) => {
      implicit val sp: SparkSession = s
      gate(Multimodal.phashDups(Multimodal.imageDHash(
        Multimodal.withGroupedPngPayload(docs(s, dir), "doc_id", PhashGroup),
        "doc_id", "payload").localCheckpoint(), MaxPhashHamming,
        maxBucket = Some(PhashMaxBucket)), "doc0", "doc1")
    }),
    // REAL audio-codec round-trip (the PNG path's WAV twin): per-doc
    // planted 16-bit PCM clip → actual AudioSystem WAV encode → binary
    // payload → actual RIFF parse + frame decode → exact amplitude
    // sums. PCM is lossless, so the oracle recomputes every int16 in
    // closed form from doc_id — a swapped endian or misread header
    // offset shifts the sums and breaks the hash.
    "multimodal_audio" -> ((s, dir) => {
      implicit val sp: SparkSession = s
      gate(Multimodal.audioStats(
        Multimodal.withWavPayload(docs(s, dir), "doc_id"),
        "doc_id", "payload").toDF(), "doc_id")
    }),
    // ext: per-user bot signals — fast-gap counts, type entropy, span,
    // and an int64-exact flag; ONE exchange (window + both aggregates
    // share the user_id clustering)
    "events_bots" -> ((s, dir) =>
      gate(Events.botScores(Events.read(s, dir)), "user_id")),
    // ext: weekly calendar heatmap — (dow, hod) volume/reach cells in
    // pure int64 epoch arithmetic; share via the ≤168-row window
    "events_seasonality" -> ((s, dir) =>
      gate(Events.seasonality(Events.read(s, dir)), "dow", "hod")),
    // ext: seasonality-adjusted anomaly — each hour scored against its
    // own (type, dow, hod) cell; z = (k·n − s1)/sqrt(k·s2 − s1²), exact
    // ints under one sqrt + one division
    "events_anomaly_seasonal" -> ((s, dir) =>
      gate(Events.seasonalAnomaly(Events.read(s, dir)),
        "hour_start_sec", "event_type")),
    // ext: per-type top-k users via the bounded-heap typed Aggregator
    // (no window sort of group contents); oracle = the window spelling
    "events_top_users" -> ((s, dir) =>
      gate(Events.topUsersPerType(Events.read(s, dir), TopUsersK),
        "event_type", "rank"))
  )

  /** Frame width (chars) and sampling stride for the frames contract. */
  private val FrameChars = 16
  private val FrameStride = 4

  /** Near-dup image group size and the banding-complete Hamming cut. */
  private val PhashGroup = 25
  private val MaxPhashHamming = 3

  /** Band-bucket occupancy cap for the capped variant: comfortably
    * above a full 25-member group's bucket, far below the hot
    * cross-group collision buckets the cap exists to drop. */
  private val PhashMaxBucket = 200L

  /** The closed-form dHash words (hw CTE) of the group-planted images —
    * shared front half of both phash oracles. Shift amounts are bounded
    * by (j % 4) in BOTH branches: a vectorized engine may evaluate a
    * CASE arm for unselected rows, and a raw j·8+i would hit the
    * range-checked 1 << 63. */
  private def phashHwSql(group: Int): String =
    s"""WITH p AS (SELECT doc_id, doc_id // $group AS gid, doc_id % $group AS delta,
      |            4 + (doc_id // $group) % 13 AS w, 3 + (doc_id // $group) % 7 AS h
      |           FROM documents),
      |gp AS (SELECT doc_id, gid, delta, i, j, (i*w)//9 AS x, (j*h)//8 AS y
      |       FROM p, UNNEST(range(9)) r1(i), UNNEST(range(8)) r2(j)),
      |gr AS (SELECT doc_id, i, j,
      |              (299*((gid + 31*x + 17*y + delta) % 256)
      |             + 587*((2*gid + 13*x + 7*y) % 256)
      |             + 114*((3*gid + 5*x + 23*y) % 256)) // 1000 AS gray
      |       FROM gp),
      |bits AS (SELECT a.doc_id, a.j, a.i,
      |                CASE WHEN b.gray > a.gray THEN 1 ELSE 0 END AS bit
      |         FROM gr a JOIN gr b ON b.doc_id = a.doc_id AND b.j = a.j
      |          AND b.i = a.i + 1
      |         WHERE a.i < 8),
      |hw AS MATERIALIZED (SELECT doc_id,
      |        CAST(SUM(CASE WHEN j < 4
      |                      THEN bit * (1::BIGINT << ((j % 4) * 8 + i))
      |                      ELSE 0 END) AS BIGINT) AS lo,
      |        CAST(SUM(CASE WHEN j >= 4
      |                      THEN bit * (1::BIGINT << ((j % 4) * 8 + i))
      |                      ELSE 0 END) AS BIGINT) AS hi
      |      FROM bits GROUP BY doc_id)""".stripMargin

  private val nsHour = Events.NsPerHour
  private val nsSec = Events.NsPerSec
  private val gapNs = Events.DefaultGapNs

  /** Trailing-window span for the rolling contract: one hour in µs. */
  private val RollingSpanUs = 3600000000L

  /** Event types for the as-of contract: each purchase is matched to the
    * user's most recent click at or before it. */
  private val AsofProbe = "purchase"
  private val AsofRef = "click"

  /** Attribution band for the interval-join contract: 24 hours in µs
    * (860 purchase×click pairs at sf0.01). */
  private val AttribHorizonUs = 86400000000L

  /** Trailing window of the rolling-reach contract (the WAU curve). */
  private val ReachWindowDays = 7

  /** Conversion event of the A/B contract. */
  private val AbConvType = "purchase"

  /** Path-mining contract: 3-step windows, top-20 cut. */
  private val PathLen = 3
  private val PathK = 20

  /** Survival contract: users active in the final week are censored. */
  private val SurvivalCensorDays = 7L

  /** Thumbnail grid of the resize contract (below the smallest planted
    * source on one axis, above it on the other — both directions hit). */
  private val ResizeW = 8
  private val ResizeH = 6

  /** Concurrency contract: hour-wide interval buckets. */
  private val ConcBucketSec = 3600L

  /** Funnel step sequence for the funnel contract. */
  private val FunnelSteps = Seq("view", "click", "purchase")

  /** Heavy keys reported by the skew-audit contract. */
  private val SkewTopN = 20

  /** Kept users per type in the top-k aggregator contract. */
  private val TopUsersK = 5

  val oracles: Map[String, String] = Map(
    "events_hourly" ->
      s"""WITH ev AS (SELECT epoch_ns(ts) AS tns, event_type, value FROM events)
        |SELECT (tns // $nsHour) * 3600 AS hour_start_sec, event_type,
        |       CAST(COUNT(*) AS BIGINT) AS n_events,
        |       ${r6sql("SUM(value)")} AS sum_value,
        |       ${r6sql("AVG(value)")} AS avg_value
        |FROM ev GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "events_hourly_uniques" ->
      s"""WITH ev AS (SELECT epoch_ns(ts) AS tns, event_type, user_id FROM events)
        |SELECT (tns // $nsHour) * 3600 AS hour_start_sec, event_type,
        |       CAST(COUNT(*) AS BIGINT) AS n_events,
        |       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
        |       ${r6sql("CAST(COUNT(*) AS DOUBLE) / COUNT(DISTINCT user_id)")} AS events_per_user
        |FROM ev GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // identical exponent expression (tns − tmax)·λ with λ the SAME JVM
    // double literal; only exp itself runs engine-side, under the snap
    "events_decay" -> {
      val lambdaPerNs =
        math.log(2.0) / (7.0 * graft.ext.Events.NsPerDay.toDouble)
      s"""WITH ev AS (SELECT user_id, epoch_ns(ts) AS tns, value FROM events),
        |mx AS (SELECT MAX(tns) AS tmax FROM ev)
        |SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
        |       ${r6sql(s"SUM(exp(CAST(tns - mx.tmax AS DOUBLE) * $lambdaPerNs))")} AS decayed_events,
        |       ${r6sql(s"SUM(exp(CAST(tns - mx.tmax AS DOUBLE) * $lambdaPerNs) * value)")} AS decayed_value
        |FROM ev CROSS JOIN mx GROUP BY user_id ORDER BY user_id""".stripMargin
    },
    "events_sessionize" ->
      s"""WITH ev AS (SELECT epoch_ns(ts) AS tns, user_id, event_id, value FROM events),
        |lg AS (SELECT user_id, tns, event_id, value,
        |              lag(tns) OVER (PARTITION BY user_id ORDER BY tns, event_id) AS prev
        |       FROM ev),
        |mk AS (SELECT *, CASE WHEN prev IS NULL OR tns - prev > $gapNs
        |                      THEN 1 ELSE 0 END AS new_sess FROM lg),
        |sess AS (SELECT *, SUM(new_sess) OVER (PARTITION BY user_id ORDER BY tns, event_id
        |                                       ROWS UNBOUNDED PRECEDING) AS session_id
        |         FROM mk)
        |SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
        |       CAST(COUNT(*) AS BIGINT) AS n_events,
        |       MIN(tns) // $nsSec AS start_sec,
        |       MAX(tns) // $nsSec AS end_sec,
        |       ${r6sql("SUM(value)")} AS sum_value
        |FROM sess GROUP BY user_id, session_id ORDER BY user_id, session_id""".stripMargin,
    // DuckDB's native ASOF JOIN is the independent oracle for the
    // union+window implementation. Both sides work in µs int64 time
    // (DuckDB via epoch_us over the µs-precision testdata; the Spark
    // entry divides its normalized ns longs by 1000 to match). Equal-ts
    // references are collapsed to the max-event_id row BEFORE the ASOF
    // join (r dedup below): native ASOF picks an arbitrary row among
    // equal-ts matches, while the Spark window deterministically keeps
    // the larger event_id — the dedup makes the tie-break explicit
    // instead of relying on the generator never producing equal-ts
    // references per user.
    // the same bounded-explode derivation: DISTINCT (user, day) →
    // +0..6 day contributions → DISTINCT → count per window day
    "events_rolling_reach" ->
      s"""WITH ud AS (SELECT DISTINCT user_id,
        |              epoch_us(ts) // 86400000000 AS d FROM events),
        |w AS (SELECT DISTINCT user_id, d + i AS day_index
        |      FROM ud, UNNEST(range($ReachWindowDays)) AS r(i))
        |SELECT day_index, CAST(COUNT(*) AS BIGINT) AS reach_${ReachWindowDays}d
        |FROM w GROUP BY 1 ORDER BY 1""".stripMargin,
    // the same (probe, ref) types as events_asof but EVERY in-band pair;
    // band membership is pure integer arithmetic on µs timestamps
    "events_attribution" ->
      s"""WITH ev AS (SELECT event_id, user_id, epoch_us(ts) AS tus, event_type, value FROM events),
        |p AS (SELECT event_id AS purchase_id, user_id, tus AS p_ts_us, value AS purchase_value
        |      FROM ev WHERE event_type = '$AsofProbe'),
        |c AS (SELECT event_id AS click_id, user_id AS cu, tus AS c_ts_us
        |      FROM ev WHERE event_type = '$AsofRef')
        |SELECT p.purchase_id, c.click_id, p.user_id, p.p_ts_us, c.c_ts_us,
        |       p.p_ts_us - c.c_ts_us AS lag_us, ${r6sql("p.purchase_value")} AS purchase_value
        |FROM p JOIN c ON c.cu = p.user_id
        |  AND c.c_ts_us > p.p_ts_us - $AttribHorizonUs
        |  AND c.c_ts_us <= p.p_ts_us
        |ORDER BY purchase_id, click_id""".stripMargin,
    "events_asof" ->
      s"""WITH ev AS (SELECT event_id, user_id, epoch_us(ts) AS tus, event_type, value FROM events),
        |p AS (SELECT event_id, user_id, tus, value FROM ev WHERE event_type = '$AsofProbe'),
        |r0 AS (SELECT event_id AS ref_event_id, user_id AS ruid, tus AS rtus, value AS ref_value
        |       FROM ev WHERE event_type = '$AsofRef'),
        |r AS (SELECT ruid, rtus, arg_max(ref_event_id, ref_event_id) AS ref_event_id,
        |             arg_max(ref_value, ref_event_id) AS ref_value
        |      FROM r0 GROUP BY ruid, rtus)
        |SELECT p.event_id, p.user_id, p.tus AS ts_us, ${r6sql("p.value")} AS value,
        |       r.ref_event_id, p.tus - r.rtus AS lag_us, ${r6sql("r.ref_value")} AS ref_value
        |FROM p ASOF JOIN r ON p.user_id = r.ruid AND p.tus >= r.rtus
        |ORDER BY event_id""".stripMargin,
    // step i+1's earliest hit at-or-after step i's, as a CTE chain; the
    // Spark side computes the same chain with per-user window minima.
    "events_funnel" ->
      s"""WITH ev AS (SELECT user_id, epoch_us(ts) AS t, event_type FROM events
        |            WHERE event_type IN (${FunnelSteps.map(s => s"'$s'").mkString(", ")})),
        |s1 AS (SELECT user_id, MIN(t) AS t1 FROM ev
        |       WHERE event_type = '${FunnelSteps(0)}' GROUP BY 1),
        |s2 AS (SELECT ev.user_id, MIN(t) AS t2 FROM ev JOIN s1 USING (user_id)
        |       WHERE event_type = '${FunnelSteps(1)}' AND t >= t1 GROUP BY 1),
        |s3 AS (SELECT ev.user_id, MIN(t) AS t3 FROM ev JOIN s2 USING (user_id)
        |       WHERE event_type = '${FunnelSteps(2)}' AND t >= t2 GROUP BY 1)
        |SELECT u.user_id,
        |       COALESCE(t1, -1) AS step1_us,
        |       COALESCE(t2, -1) AS step2_us,
        |       COALESCE(t3, -1) AS step3_us,
        |       CAST(CASE WHEN t1 IS NULL THEN 0 WHEN t2 IS NULL THEN 1
        |                 WHEN t3 IS NULL THEN 2 ELSE 3 END AS BIGINT) AS depth
        |FROM (SELECT DISTINCT user_id FROM ev) u
        |LEFT JOIN s1 USING (user_id) LEFT JOIN s2 USING (user_id)
        |LEFT JOIN s3 USING (user_id)
        |ORDER BY user_id""".stripMargin,
    // stddev_pop on both engines; zero-variance types filtered the same
    "events_anomaly" ->
      s"""WITH ev AS (SELECT epoch_ns(ts) AS tns, event_type FROM events),
        |cells AS (SELECT (tns // $nsHour) * 3600 AS hour_start_sec, event_type,
        |                 CAST(COUNT(*) AS BIGINT) AS n_events
        |          FROM ev GROUP BY 1, 2),
        |dist AS (SELECT event_type, AVG(CAST(n_events AS DOUBLE)) AS mean_n,
        |                stddev_pop(CAST(n_events AS DOUBLE)) AS std_n
        |         FROM cells GROUP BY 1)
        |SELECT hour_start_sec, event_type, n_events,
        |       ${r6sql("(CAST(n_events AS DOUBLE) - mean_n) / std_n")} AS z
        |FROM cells JOIN dist USING (event_type)
        |WHERE std_n > 0.0
        |ORDER BY hour_start_sec, event_type""".stripMargin,
    "events_user_profile" ->
      s"""WITH ev AS (SELECT epoch_ns(ts) AS tns, user_id, event_id, event_type, value
        |            FROM events),
        |lg AS (SELECT *, lag(tns) OVER (PARTITION BY user_id ORDER BY tns, event_id) AS prev
        |       FROM ev),
        |mk AS (SELECT *, CASE WHEN prev IS NULL OR tns - prev > $gapNs
        |                      THEN 1 ELSE 0 END AS new_sess FROM lg)
        |SELECT user_id,
        |       CAST(COUNT(*) AS BIGINT) AS n_events,
        |       CAST(SUM(new_sess) AS BIGINT) AS n_sessions,
        |       CAST(COUNT(DISTINCT tns // ${Events.NsPerDay}) AS BIGINT) AS n_active_days,
        |       CAST(COUNT(DISTINCT event_type) AS BIGINT) AS n_types,
        |       MIN(tns) // $nsSec AS first_sec,
        |       MAX(tns) // $nsSec AS last_sec,
        |       ${r6sql("SUM(value)")} AS sum_value
        |FROM mk GROUP BY user_id ORDER BY user_id""".stripMargin,
    "events_retention" ->
      s"""WITH b AS (SELECT user_id, epoch_ns(ts) // ${Events.NsPerDay} AS bucket FROM events),
        |f AS (SELECT user_id, MIN(bucket) AS cohort FROM b GROUP BY 1)
        |SELECT f.cohort, b.bucket - f.cohort AS bucket_offset,
        |       CAST(COUNT(DISTINCT b.user_id) AS BIGINT) AS n_users
        |FROM b JOIN f USING (user_id)
        |GROUP BY 1, 2 ORDER BY cohort, bucket_offset""".stripMargin,
    "events_skew" ->
      s"""WITH c AS (SELECT user_id AS key, CAST(COUNT(*) AS BIGINT) AS n
        |           FROM events GROUP BY 1),
        |tot AS (SELECT SUM(n) AS total FROM c),
        |top AS (SELECT key, n FROM c ORDER BY n DESC, key LIMIT $SkewTopN)
        |SELECT key, n, ${r6sql("CAST(n AS DOUBLE) / total")} AS fraction,
        |       CAST(row_number() OVER (ORDER BY n DESC, key) AS BIGINT) AS rank
        |FROM top, tot ORDER BY rank""".stripMargin,
    "events_rolling" ->
      s"""WITH ev AS (SELECT event_id, user_id, epoch_us(ts) AS tus, value FROM events)
        |SELECT event_id, user_id, tus AS ts_us,
        |       CAST(COUNT(*) OVER w AS BIGINT) AS n_window,
        |       ${r6sql("SUM(value) OVER w")} AS sum_window
        |FROM ev
        |WINDOW w AS (PARTITION BY user_id ORDER BY tus
        |             RANGE BETWEEN $RollingSpanUs PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin,
    // same mix-chain arm, same conversion flag, the identical IEEE op
    // sequence for rates and z (sqrt's last ulp absorbed by the snap)
    "events_abtest" -> {
      val mix = graft.ext.Export.mixBucketSql("user_id", 2, 0L)
      s"""WITH u AS (SELECT user_id,
        |            MAX(CASE WHEN event_type = '$AbConvType' THEN 1 ELSE 0 END) AS conv
        |            FROM events GROUP BY user_id),
        |v AS (SELECT ($mix) AS v, conv FROM u),
        |s AS (SELECT CAST(SUM(CASE WHEN v = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0,
        |             CAST(SUM(CASE WHEN v = 0 THEN conv ELSE 0 END) AS BIGINT) AS c0,
        |             CAST(SUM(CASE WHEN v = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
        |             CAST(SUM(CASE WHEN v = 1 THEN conv ELSE 0 END) AS BIGINT) AS c1
        |      FROM v)
        |SELECT n0, c0, n1, c1,
        |  ${r6sql("CASE WHEN n0 > 0 THEN CAST(c0 AS DOUBLE)/CAST(n0 AS DOUBLE) ELSE 0.0 END")} AS rate0,
        |  ${r6sql("CASE WHEN n1 > 0 THEN CAST(c1 AS DOUBLE)/CAST(n1 AS DOUBLE) ELSE 0.0 END")} AS rate1,
        |  ${r6sql(
             "CASE WHEN n0 > 0 AND n1 > 0 " +
             "AND CAST(c0+c1 AS DOUBLE)/CAST(n0+n1 AS DOUBLE) > 0 " +
             "AND CAST(c0+c1 AS DOUBLE)/CAST(n0+n1 AS DOUBLE) < 1 THEN " +
             "(CAST(c0 AS DOUBLE)/CAST(n0 AS DOUBLE) - CAST(c1 AS DOUBLE)/CAST(n1 AS DOUBLE)) / " +
             "sqrt(CAST(c0+c1 AS DOUBLE)/CAST(n0+n1 AS DOUBLE) * (1.0 - CAST(c0+c1 AS DOUBLE)/CAST(n0+n1 AS DOUBLE)) * " +
             "(1.0/CAST(n0 AS DOUBLE) + 1.0/CAST(n1 AS DOUBLE))) ELSE 0.0 END")} AS z
        |FROM s""".stripMargin
    },
    // the same gap-rule sessions, overlap counted by the BRUTE
    // inequality self-join (DuckDB's IEJoin affords it at oracle scale —
    // the bucketed plan must match it exactly)
    "events_concurrency" ->
      s"""WITH ev AS (SELECT epoch_ns(ts) AS tns, user_id, event_id FROM events),
        |lg AS (SELECT user_id, tns, event_id,
        |              lag(tns) OVER (PARTITION BY user_id ORDER BY tns, event_id) AS prev
        |       FROM ev),
        |mk AS (SELECT *, CASE WHEN prev IS NULL OR tns - prev > $gapNs
        |                      THEN 1 ELSE 0 END AS new_sess FROM lg),
        |ss AS (SELECT *, SUM(new_sess) OVER (PARTITION BY user_id ORDER BY tns, event_id
        |                                     ROWS UNBOUNDED PRECEDING) AS session_id
        |       FROM mk),
        |s AS MATERIALIZED (SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
        |            MIN(tns) // $nsSec AS start_sec, MAX(tns) // $nsSec AS end_sec
        |     FROM ss GROUP BY user_id, session_id),
        |ov AS (SELECT a.user_id, a.session_id, CAST(COUNT(*) AS BIGINT) AS n_concurrent
        |       FROM s a JOIN s c
        |         ON (a.user_id <> c.user_id OR a.session_id <> c.session_id)
        |        AND a.start_sec <= c.end_sec AND c.start_sec <= a.end_sec
        |       GROUP BY 1, 2)
        |SELECT s.user_id, s.session_id, s.start_sec, s.end_sec,
        |       CAST(COALESCE(ov.n_concurrent, 0) AS BIGINT) AS n_concurrent
        |FROM s LEFT JOIN ov USING (user_id, session_id)
        |ORDER BY user_id, session_id""".stripMargin,
    // the same day grid (µs·1000 = the exact ns int64), the same
    // censoring rule, the identical window-ordered exp(Σ ln) KM fold
    // with the same extinction pin
    "events_survival" -> {
      val day = graft.ext.Events.NsPerDay
      s"""WITH ev AS (SELECT user_id, epoch_us(ts) * 1000 AS t FROM events),
        |dd AS (SELECT user_id, t // $day AS day FROM ev),
        |us AS (SELECT user_id, MIN(day) AS f, MAX(day) AS l FROM dd GROUP BY 1),
        |en AS (SELECT MAX(day) AS end_day FROM dd),
        |u AS (SELECT l - f AS t,
        |        CASE WHEN l > end_day - $SurvivalCensorDays THEN 1 ELSE 0 END AS cen
        |      FROM us CROSS JOIN en),
        |ex AS (SELECT t, CAST(SUM(1 - cen) AS BIGINT) AS d,
        |        CAST(SUM(cen) AS BIGINT) AS c FROM u GROUP BY 1),
        |tt AS (SELECT CAST(COALESCE(SUM(d + c), 0) AS BIGINT) AS n_users FROM ex),
        |rk AS (SELECT t, d, c,
        |        n_users - CAST(COALESCE(SUM(d + c) OVER (ORDER BY t
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS n_risk
        |       FROM ex CROSS JOIN tt),
        |s1 AS (SELECT t, n_risk, d, c,
        |        CASE WHEN d > 0 AND d < n_risk
        |             THEN ln(1.0 - CAST(d AS DOUBLE) / CAST(n_risk AS DOUBLE))
        |             ELSE 0.0 END AS ln_t,
        |        CASE WHEN d = n_risk THEN 1 ELSE 0 END AS deadrow
        |       FROM rk),
        |s2 AS (SELECT t, n_risk, d, c,
        |        SUM(ln_t) OVER (ORDER BY t
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ln_cum,
        |        MAX(deadrow) OVER (ORDER BY t
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS dead
        |       FROM s1)
        |SELECT t, n_risk, d AS n_deaths, c AS n_censored,
        |  ${r6sql("CASE WHEN dead = 1 THEN 0.0 ELSE exp(ln_cum) END")} AS survival
        |FROM s2 ORDER BY t""".stripMargin
    },
    // the same lead windows over the same (ts, event_id) total order
    // (µs vs ns is order-preserving), exact-count (n DESC, path) cut
    "events_paths" -> {
      val leadCols = (1 until PathLen).map(i =>
        s"lead(event_type, $i) OVER (PARTITION BY user_id ORDER BY t, event_id) AS e$i")
        .mkString(",\n        |       ")
      val concatExpr = (0 until PathLen).map(i => s"e$i").mkString(" || '>' || ")
      s"""WITH ev AS (SELECT user_id, epoch_us(ts) AS t, event_id, event_type FROM events),
        |w AS (SELECT event_type AS e0,
        |       $leadCols
        |      FROM ev),
        |p AS (SELECT $concatExpr AS path FROM w WHERE e${PathLen - 1} IS NOT NULL),
        |c AS (SELECT path, CAST(COUNT(*) AS BIGINT) AS n_paths FROM p GROUP BY 1)
        |SELECT path, n_paths
        |FROM (SELECT * FROM c ORDER BY n_paths DESC, path LIMIT $PathK) x
        |ORDER BY path""".stripMargin
    },
    // the same exact-moment CUPED arithmetic: µs·1000 = the Spark side's
    // exact epoch-ns int64, midpoint cut via integer //, every sum an
    // exact integer (DuckDB's HUGEINT intermediates are exact too), the
    // identical division order at the end
    "events_cuped" -> {
      val mix = graft.ext.Export.mixBucketSql("user_id", 2, 0L)
      val theta = "CASE WHEN n > 0 AND CAST(n*sxx - sx*sx AS DOUBLE) > 0 " +
        "THEN CAST(n*sxy - sx*sy AS DOUBLE) / CAST(n*sxx - sx*sx AS DOUBLE) ELSE 0.0 END"
      val meanX = "(CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))"
      def armMean(s: String, c: String) =
        s"CASE WHEN $c > 0 THEN CAST($s AS DOUBLE) / CAST($c AS DOUBLE) ELSE 0.0 END"
      val my0 = armMean("sy0", "n0")
      val my1 = armMean("sy1", "n1")
      val adj0 = s"CASE WHEN n0 > 0 AND n > 0 THEN $my0 - ($theta) * " +
        s"(${armMean("sx0", "n0")} - $meanX) ELSE 0.0 END"
      val adj1 = s"CASE WHEN n1 > 0 AND n > 0 THEN $my1 - ($theta) * " +
        s"(${armMean("sx1", "n1")} - $meanX) ELSE 0.0 END"
      val varY = "CASE WHEN n > 0 THEN CAST(n*syy - sy*sy AS DOUBLE) / " +
        "(CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) ELSE 0.0 END"
      val varX = "CASE WHEN n > 0 THEN CAST(n*sxx - sx*sx AS DOUBLE) / " +
        "(CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) ELSE 0.0 END"
      s"""WITH ev AS (SELECT user_id, epoch_us(ts) * 1000 AS t, event_type FROM events),
        |b AS (SELECT MIN(t) + (MAX(t) - MIN(t)) // 2 AS cut FROM ev),
        |u AS (SELECT user_id,
        |        SUM(CASE WHEN t <= b.cut THEN 1 ELSE 0 END) AS x,
        |        SUM(CASE WHEN t > b.cut AND event_type = '$AbConvType'
        |            THEN 1 ELSE 0 END) AS y
        |      FROM ev CROSS JOIN b GROUP BY user_id),
        |v AS (SELECT ($mix) AS v, x, y FROM u),
        |m AS (SELECT COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
        |        SUM(x*x) AS sxx, SUM(y*y) AS syy, SUM(x*y) AS sxy,
        |        SUM(CASE WHEN v = 0 THEN 1 ELSE 0 END) AS n0,
        |        SUM(CASE WHEN v = 0 THEN x ELSE 0 END) AS sx0,
        |        SUM(CASE WHEN v = 0 THEN y ELSE 0 END) AS sy0,
        |        SUM(CASE WHEN v = 1 THEN 1 ELSE 0 END) AS n1,
        |        SUM(CASE WHEN v = 1 THEN x ELSE 0 END) AS sx1,
        |        SUM(CASE WHEN v = 1 THEN y ELSE 0 END) AS sy1
        |      FROM v)
        |SELECT CAST(n0 AS BIGINT) AS n0, CAST(n1 AS BIGINT) AS n1,
        |  ${r6sql(my0)} AS mean_y0, ${r6sql(my1)} AS mean_y1,
        |  ${r6sql(theta)} AS theta,
        |  ${r6sql(adj0)} AS adj_mean_y0, ${r6sql(adj1)} AS adj_mean_y1,
        |  ${r6sql(s"($my1) - ($my0)")} AS diff,
        |  ${r6sql(s"($adj1) - ($adj0)")} AS adj_diff,
        |  ${r6sql(varY)} AS var_y,
        |  ${r6sql(s"($varY) - ($theta) * ($theta) * ($varX)")} AS var_adj,
        |  ${r6sql("CASE WHEN n0 + n1 > 0 THEN " +
             "CAST((n0 - n1) * (n0 - n1) AS DOUBLE) / CAST(n0 + n1 AS DOUBLE) " +
             "ELSE 0.0 END")} AS srm_chi2
        |FROM m""".stripMargin
    },
    // same lead window over the same (ts, event_id) total order; µs vs ns
    // is irrelevant here — only the ORDER of the int64 times matters, and
    // ns = µs·1000 is order-preserving
    "events_transitions" ->
      s"""WITH ev AS (SELECT user_id, epoch_us(ts) AS t, event_id, event_type FROM events),
        |n AS (SELECT event_type AS prev_type,
        |             coalesce(lead(event_type) OVER (PARTITION BY user_id ORDER BY t, event_id),
        |                      '(end)') AS next_type
        |      FROM ev),
        |c AS (SELECT prev_type, next_type, CAST(COUNT(*) AS BIGINT) AS n_transitions
        |      FROM n GROUP BY 1, 2)
        |SELECT prev_type, next_type, n_transitions,
        |       ${r6sql("CAST(n_transitions AS DOUBLE) / CAST(SUM(n_transitions) OVER (PARTITION BY prev_type) AS DOUBLE)")} AS prob
        |FROM c ORDER BY 1, 2""".stripMargin,
    "multimodal_frames" ->
      s"""WITH d AS (SELECT doc_id, text, length(text) // $FrameChars AS nf FROM documents)
        |SELECT doc_id, CAST(i AS BIGINT) AS frame_no,
        |       hex(encode(substring(text, CAST(i * $FrameChars + 1 AS INT), $FrameChars))) AS frame
        |FROM d, UNNEST(range(nf)) AS r(i)
        |WHERE i % $FrameStride = 0
        |ORDER BY doc_id, frame_no""".stripMargin,
    "multimodal_meta" ->
      s"""WITH h AS (SELECT doc_id, text, least(16, length(text)) AS hl FROM documents)
        |SELECT doc_id,
        |       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        |       (SELECT CAST(COALESCE(SUM(ascii(substr(h.text, CAST(i + 1 AS INT), 1)) * (i + 1)), 0) AS BIGINT)
        |        FROM UNNEST(range(h.hl)) AS r(i)) AS header_sum
        |FROM h ORDER BY doc_id""".stripMargin,
    // closed-form replay of the planted image: PNG is lossless, so the
    // Spark side's ImageIO encode→decode must read back exactly these
    // per-channel linear-congruential values (Multimodal.plantedPng)
    // closed-form replay of the planted clip: PCM is lossless, so the
    // Spark side's WAV encode→RIFF decode must read back exactly these
    // quadratic int16 amplitudes (Multimodal.plantedWav/plantedSample)
    "multimodal_audio" ->
      """WITH d AS (SELECT doc_id, 64 + doc_id % 97 AS n FROM documents),
        |s AS (SELECT doc_id, n,
        |        (doc_id * 31 + 7 * i * i + 13 * i) % 4001 - 2000 AS amp
        |      FROM d, UNNEST(range(n)) AS r(i))
        |SELECT doc_id, CAST(n AS BIGINT) AS n_samples,
        |  CAST(8000 AS BIGINT) AS sample_rate,
        |  CAST(1 AS BIGINT) AS n_channels,
        |  CAST(SUM(amp) AS BIGINT) AS sum_amp,
        |  CAST(SUM(abs(amp)) AS BIGINT) AS sum_abs,
        |  CAST(MAX(abs(amp)) AS BIGINT) AS peak_abs
        |FROM s GROUP BY 1, 2 ORDER BY doc_id""".stripMargin,
    // the same register/estimator replay as vocab_hll_audit, over
    // (event_type, user_id), plus the pair-merged register table and
    // the exact self-join audit
    "events_reach_overlap" -> {
      import graft.ext.TextAnalysis
      import TextAnalysis.{HllAlpha, HllM}
      def estSql(keys: String, src: String, out: String) =
        s"""${out}_zs AS (SELECT $keys, CAST(COUNT(*) AS BIGINT) AS n_nonzero,
          |        SUM(${TextAnalysis.hllInvPowSql("mj")}) AS z_live
          |        FROM $src GROUP BY $keys),
          |$out AS MATERIALIZED (SELECT $keys,
          |        CASE WHEN ${HllAlpha * HllM * HllM} /
          |                  (z_live + CAST($HllM - n_nonzero AS DOUBLE)) <= ${2.5 * HllM}
          |              AND n_nonzero < $HllM
          |             THEN ${HllM.toDouble} *
          |                  ln(${HllM.toDouble} / CAST($HllM - n_nonzero AS DOUBLE))
          |             ELSE ${HllAlpha * HllM * HllM} /
          |                  (z_live + CAST($HllM - n_nonzero AS DOUBLE)) END AS hll_est
          |        FROM ${out}_zs)""".stripMargin
      s"""WITH du AS MATERIALIZED (
        |  SELECT DISTINCT event_type AS t, user_id AS u FROM events),
        |hh AS (SELECT t, ${TextAnalysis.hllH2Sql("u")} AS h2 FROM du),
        |hw AS (SELECT t, CAST(h2 % $HllM AS BIGINT) AS j,
        |              CAST((h2 - h2 % $HllM) / $HllM AS BIGINT) AS w FROM hh),
        |reg AS MATERIALIZED (SELECT t, j, MAX(${TextAnalysis.hllRhoSql("w")}) AS mj
        |       FROM hw GROUP BY 1, 2),
        |${estSql("t", "reg", "es")},
        |prs AS MATERIALIZED (SELECT x.t AS t0, y.t AS t1
        |       FROM (SELECT DISTINCT t FROM reg) x
        |       JOIN (SELECT DISTINCT t FROM reg) y ON x.t < y.t),
        |ur AS (SELECT p.t0, p.t1, r.j, MAX(r.mj) AS mj
        |       FROM prs p JOIN reg r ON r.t = p.t0 OR r.t = p.t1
        |       GROUP BY 1, 2, 3),
        |${estSql("t0, t1", "ur", "eu")},
        |ex AS (SELECT a.t AS t0, b.t AS t1, CAST(COUNT(*) AS BIGINT) AS n_exact
        |       FROM du a JOIN du b ON a.u = b.u AND a.t < b.t GROUP BY 1, 2),
        |fin AS (SELECT p.t0, p.t1,
        |        COALESCE(ex.n_exact, CAST(0 AS BIGINT)) AS n_exact,
        |        e0.hll_est AS est0, e1.hll_est AS est1,
        |        eu.hll_est AS est_union,
        |        GREATEST(CAST(0 AS DOUBLE),
        |                 e0.hll_est + e1.hll_est - eu.hll_est) AS est_inter
        |        FROM prs p
        |        JOIN es e0 ON e0.t = p.t0
        |        JOIN es e1 ON e1.t = p.t1
        |        JOIN eu ON eu.t0 = p.t0 AND eu.t1 = p.t1
        |        LEFT JOIN ex ON ex.t0 = p.t0 AND ex.t1 = p.t1)
        |SELECT t0, t1, n_exact, ${r6sql("est0")} AS est0,
        |       ${r6sql("est1")} AS est1, ${r6sql("est_union")} AS est_union,
        |       ${r6sql("est_inter")} AS est_inter,
        |       ${r6sql("CASE WHEN n_exact > 0 THEN (est_inter - n_exact) / CAST(n_exact AS DOUBLE) ELSE CAST(0 AS DOUBLE) END")} AS rel_err
        |FROM fin ORDER BY t0, t1""".stripMargin
    },
    // the hw chain alone: every decoded hash must equal its closed form
    "multimodal_phash" ->
      (phashHwSql(PhashGroup) + """
        |SELECT doc_id, lo, hi FROM hw ORDER BY doc_id""".stripMargin),
    // hw chain + 16-bit band candidates + popcount verify (mirrors
    // Multimodal.phashDups: 4-band pigeonhole complete for hamming <= 3)
    "multimodal_phash_dups" ->
      (phashHwSql(PhashGroup) + s""",
        |bands AS (SELECT doc_id, b,
        |          CASE b WHEN 0 THEN lo & 65535 WHEN 1 THEN (lo >> 16) & 65535
        |                 WHEN 2 THEN hi & 65535 ELSE (hi >> 16) & 65535 END AS key
        |          FROM hw, UNNEST(range(4)) rb(b)),
        |cand AS (SELECT DISTINCT a.doc_id AS doc0, c.doc_id AS doc1
        |         FROM bands a JOIN bands c ON a.b = c.b AND a.key = c.key
        |          AND a.doc_id < c.doc_id)
        |SELECT doc0, doc1,
        |       CAST(bit_count(xor(h0.lo, h1.lo)) + bit_count(xor(h0.hi, h1.hi)) AS BIGINT) AS hamming
        |FROM cand JOIN hw h0 ON h0.doc_id = doc0 JOIN hw h1 ON h1.doc_id = doc1
        |WHERE bit_count(xor(h0.lo, h1.lo)) + bit_count(xor(h0.hi, h1.hi)) <= $MaxPhashHamming
        |ORDER BY doc0, doc1""".stripMargin),
    // the same chain with the occupancy HAVING-filter on band buckets
    "multimodal_phash_dups_capped" ->
      (phashHwSql(PhashGroup) + s""",
        |bands AS (SELECT doc_id, b,
        |          CASE b WHEN 0 THEN lo & 65535 WHEN 1 THEN (lo >> 16) & 65535
        |                 WHEN 2 THEN hi & 65535 ELSE (hi >> 16) & 65535 END AS key
        |          FROM hw, UNNEST(range(4)) rb(b)),
        |keep AS (SELECT b, key FROM bands GROUP BY b, key
        |         HAVING COUNT(*) <= $PhashMaxBucket),
        |kb AS MATERIALIZED (SELECT bands.* FROM bands JOIN keep USING (b, key)),
        |cand AS (SELECT DISTINCT a.doc_id AS doc0, c.doc_id AS doc1
        |         FROM kb a JOIN kb c ON a.b = c.b AND a.key = c.key
        |          AND a.doc_id < c.doc_id)
        |SELECT doc0, doc1,
        |       CAST(bit_count(xor(h0.lo, h1.lo)) + bit_count(xor(h0.hi, h1.hi)) AS BIGINT) AS hamming
        |FROM cand JOIN hw h0 ON h0.doc_id = doc0 JOIN hw h1 ON h1.doc_id = doc1
        |WHERE bit_count(xor(h0.lo, h1.lo)) + bit_count(xor(h0.hi, h1.hi)) <= $MaxPhashHamming
        |ORDER BY doc0, doc1""".stripMargin),
    "multimodal_decode" ->
      """WITH d AS (SELECT doc_id, 4 + doc_id % 13 AS w, 3 + doc_id % 7 AS h
        |           FROM documents),
        |px AS (SELECT doc_id, w, h, x, y
        |       FROM d, UNNEST(range(w)) AS rx(x), UNNEST(range(h)) AS ry(y))
        |SELECT doc_id, w AS width, h AS height, CAST(w * h AS BIGINT) AS n_pixels,
        |  CAST(SUM((doc_id + 31 * x + 17 * y) % 256) AS BIGINT) AS r_sum,
        |  CAST(SUM((2 * doc_id + 13 * x + 7 * y) % 256) AS BIGINT) AS g_sum,
        |  CAST(SUM((3 * doc_id + 5 * x + 23 * y) % 256) AS BIGINT) AS b_sum
        |FROM px GROUP BY 1, 2, 3 ORDER BY doc_id""".stripMargin,
    // the planted channel formulas sampled on the SAME integer thumbnail
    // grid (x = i·w // tw, y = j·h // th) the Spark seam resamples on —
    // decode AND resample arithmetic check value-exactly
    "multimodal_resize" ->
      s"""WITH d AS (SELECT doc_id, 4 + doc_id % 13 AS w, 3 + doc_id % 7 AS h
        |           FROM documents),
        |px AS (SELECT doc_id, w, h,
        |              (i * w) // $ResizeW AS x, (j * h) // $ResizeH AS y
        |       FROM d, UNNEST(range($ResizeW)) AS ri(i),
        |              UNNEST(range($ResizeH)) AS rj(j))
        |SELECT doc_id, w AS src_w, h AS src_h,
        |  CAST($ResizeW AS BIGINT) AS dst_w, CAST($ResizeH AS BIGINT) AS dst_h,
        |  CAST(SUM((doc_id + 31 * x + 17 * y) % 256) AS BIGINT) AS r_sum,
        |  CAST(SUM((2 * doc_id + 13 * x + 7 * y) % 256) AS BIGINT) AS g_sum,
        |  CAST(SUM((3 * doc_id + 5 * x + 23 * y) % 256) AS BIGINT) AS b_sum
        |FROM px GROUP BY 1, 2, 3 ORDER BY doc_id""".stripMargin,
    // same lag gaps, same integer flag algebra; ln only on exact int64
    // counts, snapped at 1e-6
    "events_bots" ->
      s"""WITH ev AS (SELECT epoch_ns(ts) AS tns, user_id, event_id, event_type
        |            FROM events),
        |lg AS (SELECT *, tns - lag(tns) OVER (PARTITION BY user_id
        |                                      ORDER BY tns, event_id) AS gap
        |       FROM ev),
        |pt AS (SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT) AS c,
        |              CAST(SUM(CASE WHEN gap IS NOT NULL AND gap < ${Events.NsPerHour}
        |                            THEN 1 ELSE 0 END) AS BIGINT) AS nf,
        |              MIN(tns) AS mn, MAX(tns) AS mx
        |       FROM lg GROUP BY 1, 2)
        |SELECT user_id,
        |       CAST(SUM(c) AS BIGINT) AS n_events,
        |       CAST(COUNT(*) AS BIGINT) AS n_types,
        |       CAST(SUM(nf) AS BIGINT) AS n_fast,
        |       (MAX(mx) - MIN(mn)) // $nsSec AS span_sec,
        |       ${r6sql("ln(CAST(SUM(c) AS DOUBLE)) - SUM(c * ln(CAST(c AS DOUBLE))) / SUM(c)")} AS type_entropy,
        |       CAST(CASE WHEN SUM(c) >= 30 AND SUM(nf) * 4 >= SUM(c) - 1
        |                 THEN 1 ELSE 0 END AS BIGINT) AS is_bot
        |FROM pt GROUP BY user_id ORDER BY user_id""".stripMargin,
    // same epoch div/% cell arithmetic; share over the cell-table total
    "events_seasonality" ->
      s"""WITH ev AS (SELECT epoch_ns(ts) AS tns, user_id FROM events),
        |cell AS (SELECT ((tns // ${Events.NsPerDay}) + 3) % 7 AS dow,
        |                (tns // ${Events.NsPerHour}) % 24 AS hod,
        |                user_id
        |         FROM ev),
        |agg AS (SELECT dow, hod, CAST(COUNT(*) AS BIGINT) AS n_events,
        |               CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
        |        FROM cell GROUP BY 1, 2),
        |tot AS (SELECT CAST(SUM(n_events) AS BIGINT) AS t FROM agg)
        |SELECT dow, hod, n_events, n_users,
        |       ${r6sql("n_events / CAST(t AS DOUBLE)")} AS share
        |FROM agg, tot ORDER BY dow, hod""".stripMargin,
    // same integer z algebra: exact ints under one sqrt + one division
    "events_anomaly_seasonal" ->
      s"""WITH ev AS (SELECT epoch_ns(ts) AS tns, event_type FROM events),
        |h AS (SELECT (tns // $nsHour) * 3600 AS hour_start_sec, event_type,
        |             CAST(COUNT(*) AS BIGINT) AS n
        |      FROM ev GROUP BY 1, 2),
        |c AS (SELECT *, ((hour_start_sec // 86400) + 3) % 7 AS dow,
        |             (hour_start_sec // 3600) % 24 AS hod
        |      FROM h),
        |st AS (SELECT event_type, dow, hod, CAST(COUNT(*) AS BIGINT) AS k,
        |              CAST(SUM(n) AS BIGINT) AS s1,
        |              CAST(SUM(n * n) AS BIGINT) AS s2
        |       FROM c GROUP BY 1, 2, 3)
        |SELECT c.hour_start_sec, c.event_type, c.n AS n_events,
        |       c.dow, c.hod, st.k,
        |       ${r6sql("CASE WHEN st.k * st.s2 - st.s1 * st.s1 = 0 THEN 0.0 ELSE (st.k * c.n - st.s1) / sqrt(CAST(st.k * st.s2 - st.s1 * st.s1 AS DOUBLE)) END")} AS z
        |FROM c JOIN st USING (event_type, dow, hod)
        |ORDER BY hour_start_sec, event_type""".stripMargin,
    // the window spelling IS the oracle — the aggregator must reproduce
    // it exactly (n DESC, user_id tie-break)
    "events_top_users" ->
      s"""WITH c AS (SELECT event_type, user_id, CAST(COUNT(*) AS BIGINT) AS n
        |           FROM events GROUP BY 1, 2),
        |r AS (SELECT event_type, user_id, n,
        |             CAST(row_number() OVER (PARTITION BY event_type
        |                                     ORDER BY n DESC, user_id) AS BIGINT) AS rank
        |      FROM c)
        |SELECT event_type, rank, user_id, n AS n_events
        |FROM r WHERE rank <= $TopUsersK
        |ORDER BY event_type, rank""".stripMargin
  )
}
