package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

import graft.streaming.StreamingOps

/** Structured Streaming coverage with batch-equivalent oracles: the
  * streaming result of a windowed aggregation over a finite source equals
  * the batch aggregation, so DuckDB can check it. */
object StreamQueries {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    "q33_stream_hourly" -> ((s, d) => StreamingOps.hourlyCounts(s, d)),
    // bounded-memory sorted-pass form (one open session per task, no
    // per-user buffering); the flatMapGroupsWithState streaming form is
    // spec-pinned to produce identical sessions
    "q34_sessionize" -> ((s, d) =>
      StreamingOps.sessionizeSorted(s, d).orderBy("user_id", "start_us")),
    // the dedup registry as streaming aggregation state; equals the batch
    // q21 operator on a finite source (min/count are order-insensitive)
    "q74_stream_dedup" -> ((s, d) => StreamingOps.streamingDedup(s, d)),
    // stream-static admission: row-local signatures on the stream probe
    // the corpus's stored LSH index; equals the q48 candidate set
    "q79_stream_admission" -> ((s, d) => StreamingOps.streamAdmission(s, d)),
    // the watermarked APPEND path's finalized windows: the data batch
    // advances the watermark to max event time - 1h and the runner's
    // watermark-change batch evicts every window closed under it, so the
    // emitted prefix = the q33 aggregation minus the trailing open hour
    "q81_stream_hourly_append" -> ((s, d) =>
      StreamingOps.hourlyCounts(s, d, watermarked = true)),
    // stream-static semantic admission: row-local quantization + sign
    // bucket on the stream probe the corpus's vector index; equals the
    // batch sign-bucket near-dup set across the split
    "q88_stream_semantic" -> ((s, d) =>
      StreamingOps.streamSemanticAdmission(s, d)),
    // ingest-time token metering: the batch-trained BPE merge table
    // literalized into a row-local expression chain over the stream —
    // pure Append mode, no state; equals the batch q125 counts
    // (oracle defined beside the BPE family in OpsQueries)
    "q129_stream_bpe" -> ((s, d) => StreamingOps.streamBpeCounts(s, d)),
    // stream-stream interval join (both sides watermarked, user-keyed
    // state, 24 h attribution window); equals the batch interval join
    // on the finite source
    "q131_stream_join" -> ((s, d) =>
      StreamingOps.streamClickAttribution(s, d)),
    // the histogram-quantile register table as streaming aggregation
    // state (bounded: maxBins rows/group); equals the batch q142 sketch
    // on a finite source (oracle defined beside it in OpsQueries)
    "q146_stream_hist" -> ((s, d) =>
      StreamingOps.streamingHistSketch(s, d)),
    // the Count-Min register table as streaming aggregation state
    // (bounded: depth x width rows); equals the batch q144 estimates
    "q148_stream_cms" -> ((s, d) =>
      StreamingOps.streamingCmsSketch(s, d)),
    // streaming CDC materialization: latest-value-per-key as streaming
    // aggregation state (one struct per key), tombstones filtered
    // post-agg; equals the batch latest-per-key on a finite source
    "q158_stream_cdc" -> ((s, d) =>
      StreamingOps.streamLatestValue(s, d)),
    // streaming SCD-2 maintenance: attribute changes close intervals in
    // pure Append mode; state = the one open version per key; equals
    // the batch scd2's CLOSED rows on a finite source
    "q171_stream_scd2" -> ((s, d) => StreamingOps.streamScd2(s, d)),
    // streaming funnel: the batch funnel's aggregation AS streaming
    // state; equals the batch q154 on a finite source
    "q172_stream_funnel" -> ((s, d) =>
      StreamingOps.streamFunnel(s, d, Seq("view", "click", "purchase"))),
    // streaming audience bitmaps: the bit_or register table AS streaming
    // state (segments x users/62 rows); equals the batch q162
    "q175_stream_bitmap" -> ((s, d) =>
      StreamingOps.streamBitmapSegments(s, d)),
    // Spark's NATIVE session_window operator (watermarked append):
    // emits the finalized sessions; last-event ends recovered as
    // window.end - gap
    "q184_native_session" -> ((s, d) =>
      StreamingOps.nativeSessionWindows(s, d)),
    // streaming OHLC: min_by/max_by bars AS streaming aggregation
    // state; equals the batch q185 on a finite source
    "q187_stream_ohlc" -> ((s, d) => StreamingOps.streamOhlc(s, d)),
    // point-in-time enrichment: the purchase stream joins the SCD-2
    // dimension at EVENT time (no future-version leakage); equals the
    // batch interval join
    "q190_stream_pit" -> ((s, d) => StreamingOps.streamPointInTime(s, d)),
    // the commit log as a FIRST-CLASS streaming source (DSv2
    // MicroBatchStream): offsets ARE commit versions, each batch plans
    // only delta files; on the finite run equals the batch change feed
    "q210_feed_source" -> ((s, d) => {
      val cl = OpsQueries.ensureCdfLake(s, d)
      StreamingOps.streamFeedSource(s, cl.path, cl.fromV)
        .select(col("_change_type").as("change_type"), col("o_orderkey"),
          col("o_custkey"), col("o_totalprice"))
        .orderBy("change_type", "o_orderkey")
    }),
    // exactly-once lake-to-lake CDC replication: the DSv2 feed tails
    // the source commit log (one commit per micro-batch) and each batch
    // applies through ONE atomic merge-on-read commit with the batch id
    // as txn watermark; the op replays the WHOLE stream against a fresh
    // checkpoint (total loss) and the replica must still equal the
    // source head exactly — the target manifest is the only ledger
    "q255_cdc_replicate" -> ((s, d) => {
      val cl = OpsQueries.ensureCdfLake(s, d)
      StreamingOps.streamReplicate(s, cl.path, s"${cl.path}-replica",
          cl.fromV, "o_orderkey", appId = "q255")
        .orderBy("o_orderkey")
    }),
    // the upsert commit through the DSv2 log tailer: added files
    // stream as inserts, added sidecars as position-replayed deletes —
    // one atomic MERGE commit, two exact CDC directions
    "q254_stream_upsert_feed" -> ((s, d) => {
      val u = OpsQueries.ensureUpsertLake(s, d)
      StreamingOps.streamFeedSource(s, u.path, u.feedFrom)
        .select(col("_change_type").as("change_type"), col("l_orderkey"),
          col("l_linenumber"), col("l_partkey"), col("l_suppkey"),
          col("l_quantity"))
        .orderBy("change_type", "l_orderkey", "l_linenumber")
    }),
    // BOOTSTRAP against a merge-on-read table: the first batch is the
    // committed snapshot WITH the active sidecars subtracted inside
    // each file's reader (positions loaded executor-side) — standing a
    // CDC consumer up on a DV-carrying table needs no applyDvs/compact
    // first, and deleted rows never resurrect as inserts
    "q260_stream_bootstrap_dv" -> ((s, d) => {
      val dv = OpsQueries.ensureDvLake(s, d)
      StreamingOps.streamFeedBootstrap(s, dv.path)
        .select("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey",
          "l_quantity")
        .orderBy("l_orderkey", "l_linenumber")
    }),
    // the round-12 composition end-to-end: a replica stood up ENTIRELY
    // through the stream against a DV-carrying source — bootstrap
    // snapshot (sidecars subtracted in the readers) as the initial
    // load, exactly-once txn watermarks, full-replay-with-fresh-
    // checkpoint proven inside the op; replica == source merge-on-read
    "q262_stream_bootstrap_replicate" -> ((s, d) => {
      val dv = OpsQueries.ensureDvLake(s, d)
      StreamingOps.streamReplicateBootstrap(s, dv.path,
          s"${dv.path}-bootrepl", "l_orderkey", appId = "q262")
        .select("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey",
          "l_quantity")
        .orderBy("l_orderkey", "l_linenumber")
    }),
    // merge-on-read deletes through the DSv2 log tailer: a dvdelete
    // commit plans its sidecar (file, pos) pairs per named data file
    // and the reader replays them as delete rows by counting the
    // physical row index — a DV delete must never brick the stream
    "q250_stream_dv_feed" -> ((s, d) => {
      val dv = OpsQueries.ensureDvLake(s, d)
      StreamingOps.streamFeedSource(s, dv.path, dv.feedFrom)
        .filter(col("_change_type") === "delete")
        .select("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey",
          "l_quantity")
        .orderBy("l_orderkey", "l_linenumber")
    }),
    // streaming maintenance from the manifest change feed: signed
    // per-key partials AS streaming aggregation state over the feed's
    // commit-batch files, merged with the stored base — equals the
    // batch q197 maintenance; the base table is never scanned
    "q205_stream_feed_maintain" -> ((s, d) => {
      val cl = OpsQueries.ensureCdfLake(s, d)
      StreamingOps.streamFeedMaintain(s, cl.path, cl.basePath,
        cl.fromV, cl.toV)
    }),
    // streaming materialized-JOIN-view maintenance: the stored
    // orders ⋈ customer view — kept AS A MANIFEST LAKE — maintained
    // from the DSv2 feed one commit per micro-batch through atomic
    // merge-on-read applies (O(changed rows) written per batch, batch
    // id = the view lake's txn watermark, so restart is exactly-once);
    // equals the batch q234 maintenance and the full join recompute
    "q263_stream_join_maintain" -> ((s, d) => {
      val cl = OpsQueries.ensureCdfLake(s, d)
      StreamingOps.streamFeedJoinMaintain(s, cl.path, cl.fromV,
          baseView = s.read.parquet(cl.joinPath),
          dim = graft.Tables(s, d, "customer").select(
            col("c_custkey").as("o_custkey"),
            col("c_name"), col("c_mktsegment")),
          joinKey = "o_custkey", rowKey = "o_orderkey",
          viewPath = s"${cl.path}-joinview", appId = "q263")
        .orderBy("o_orderkey")
    }),
    // TABLE-level streaming change feed over a Hive-partitioned lake:
    // ONE TableFeedSource whose checkpointed offset is the per-leaf
    // version vector (leaves enumerated per planning round, so a leaf
    // born mid-stream enters at its birth version), the partition
    // column riding typed from path inference — the insert batch
    // surfaces from day=1, the DV delete's rows from day=2, untouched
    // history nothing
    "q264_stream_table_feed" -> ((s, d) => {
      val tf = OpsQueries.ensureTableFeedLake(s, d)
      StreamingOps.streamFeedTable(s, tf.root, tf.cursors)
        .select(col("_change_type").as("change_type"), col("o_orderkey"),
          col("o_custkey"), col("o_totalprice"),
          col("day").cast("long").as("day"))
        .orderBy("change_type", "o_orderkey")
    }),
    // the PRODUCTION sink shape of the same table-level feed: parquet
    // file sink + real checkpoint (exactly-once via the sink metadata
    // log); shares q264's oracle — the landed feed equals the memory
    // harness bit-for-bit
    "q266_stream_table_feed_sink" -> ((s, d) => {
      val tf = OpsQueries.ensureTableFeedLake(s, d)
      val out = s"${System.getProperty("java.io.tmpdir")}/" +
        s"graft_tfsink_qch7dwoux1_${ProcessHandle.current().pid()}/" +
        new java.io.File(d).getName
      StreamingOps.streamFeedTableToDir(s, tf.root, tf.cursors, out)
        .select(col("_change_type").as("change_type"), col("o_orderkey"),
          col("o_custkey"), col("o_totalprice"),
          col("day").cast("long").as("day"))
        .orderBy("change_type", "o_orderkey")
    }),
    // streaming ingest adopted into the manifest lake with stats; the
    // manifest-resolved read equals the source table
    "q167_stream_manifest" -> ((s, d) => {
      val dir = s"${System.getProperty("java.io.tmpdir")}/" +
        s"graft_streammanifest_qch7dwoux1_${ProcessHandle.current().pid()}/" +
        new java.io.File(d).getName
      StreamingOps.streamIngestManifest(s, d, dir)
        .orderBy("event_id")
    }),
    // exactly-once lake sink via manifest txn watermarks (no file-sink
    // metadata log): the op itself replays the ENTIRE stream against a
    // fresh checkpoint — the total-loss scenario — and the table must
    // still equal the source exactly (a duplicate would hash-mismatch)
    "q246_stream_txn_sink" -> ((s, d) => {
      val dir = s"${System.getProperty("java.io.tmpdir")}/" +
        s"graft_streamtxn_qch7dwoux1_${ProcessHandle.current().pid()}/" +
        new java.io.File(d).getName
      StreamingOps.streamIngestTxn(s, d, dir, appId = "q246")
        .orderBy("event_id")
    }))

  // shared by q264 (memory harness) and q266 (parquet file sink): the
  // table-level feed's delta — inserts from the day=1 batch, deletes
  // from day=2's box-range DV delete, the partition column attached
  private val tableFeedOracle =
    """WITH b AS (SELECT min(o_orderkey) AS klo, max(o_orderkey) AS khi
         FROM orders),
       s AS (SELECT klo + (khi - klo) // 4 AS dlo,
           klo + (khi - klo) // 2 AS dhi,
           khi - klo + 1000000 AS span FROM b)
       SELECT 'insert' AS change_type, o_orderkey + span AS o_orderkey,
         o_custkey, o_totalprice * 2 AS o_totalprice,
         CAST(1 AS BIGINT) AS day
       FROM orders, s WHERE o_orderkey % 2 = 0 AND o_orderkey % 5 = 0
       UNION ALL
       SELECT 'delete' AS change_type, o_orderkey, o_custkey,
         o_totalprice, CAST(2 AS BIGINT) AS day
       FROM orders, s
       WHERE o_orderkey % 2 = 1 AND o_orderkey BETWEEN dlo AND dhi
       ORDER BY change_type, o_orderkey"""

  val oracles: Map[String, String] = Map(
    // batch twin of the watermarked stream-stream interval join
    "q131_stream_join" ->
      """SELECT c.event_id AS click_id, v.event_id AS view_id,
         epoch_us(c.ts) - epoch_us(v.ts) AS gap_us
         FROM events c JOIN events v ON c.user_id = v.user_id
         WHERE c.event_type = 'click' AND v.event_type = 'view'
           AND epoch_us(v.ts) >= epoch_us(c.ts) - 86400000000
           AND epoch_us(v.ts) <= epoch_us(c.ts)
         ORDER BY click_id, view_id""",
    "q33_stream_hourly" ->
      """SELECT (epoch_us(ts) // 3600000000) * 3600 AS hour_start,
         event_type, count(*) AS n_events,
         CAST(sum(CAST(value AS DECIMAL(25,6))) AS DOUBLE) AS sum_value
         FROM events GROUP BY 1, 2 ORDER BY 1, 2""",
    "q34_sessionize" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS ts FROM events),
         m AS (SELECT *, CASE WHEN lag(ts) OVER w IS NULL
             OR ts - lag(ts) OVER w > 3600000000 THEN 1 ELSE 0 END AS brk
           FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
         s AS (SELECT *, sum(brk) OVER (PARTITION BY user_id
             ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS sid FROM m)
         SELECT user_id, min(ts) AS start_us, max(ts) AS end_us,
           count(*) AS n_events
         FROM s GROUP BY user_id, sid ORDER BY user_id, start_us""",
    "q74_stream_dedup" ->
      """SELECT md5(text) AS text_hash,
         min(doc_id) AS canonical_id, count(*) AS n_copies
         FROM documents GROUP BY 1 ORDER BY canonical_id""",
    // the candidate CTE of the q48 incremental chain: corpus bands capped
    // (singletons kept), fresh side joins on (band, key)
    "q79_stream_admission" ->
      s"""WITH ${OpsQueries.SIG_BANDS("documents")},
         bc AS (SELECT * FROM banded0 WHERE doc_id % 10 != 0),
         bf AS (SELECT * FROM banded0 WHERE doc_id % 10 = 0),
         ok AS (SELECT band, key FROM bc GROUP BY band, key
           HAVING count(*) <= 64),
         bck AS (SELECT bc.* FROM bc JOIN ok
           ON bc.band = ok.band AND bc.key = ok.key)
         SELECT DISTINCT bck.doc_id AS doc_a, bf.doc_id AS doc_b
         FROM bck JOIN bf ON bck.band = bf.band AND bck.key = bf.key
         ORDER BY doc_a, doc_b""",
    // the finalized-window prefix: windows whose END is at or before the
    // final watermark (max event time - 1h); the trailing hour stays open
    "q81_stream_hourly_append" ->
      """WITH c AS (SELECT max(epoch_us(ts)) - 3600000000 AS wm FROM events)
         SELECT (epoch_us(ts) // 3600000000) * 3600 AS hour_start,
           event_type, count(*) AS n_events,
           CAST(sum(CAST(value AS DECIMAL(25,6))) AS DOUBLE) AS sum_value
         FROM events, c
         WHERE (epoch_us(ts) // 3600000000) * 3600000000
           + 3600000000 <= c.wm
         GROUP BY 1, 2 ORDER BY 1, 2""",
    // batch twin of the stream-static semantic admission: sign-bucket
    // blocked cross-side cosine pairs (the q27 bucket + q25 cosine kit)
    "q88_stream_semantic" -> {
      val dotQ = graft.ops.TextKit.ducksql.dotQ(_: String, _: String)
      s"""WITH eb AS (SELECT vec_id, embedding,
           ${dotQ("embedding", "embedding")} AS nsq,
           list_sum(list_transform(generate_series(1, 6), d ->
             CASE WHEN embedding[d] >= 0 THEN (1::BIGINT << (d - 1))
               ELSE 0 END)) AS bucket
           FROM embeddings),
         c AS (SELECT * FROM eb WHERE vec_id % 10 != 0),
         f AS (SELECT * FROM eb WHERE vec_id % 10 = 0),
         scored AS (SELECT c.vec_id AS vec_a, f.vec_id AS vec_b,
           CAST(${dotQ("c.embedding", "f.embedding")} AS DOUBLE) /
             (sqrt(CAST(c.nsq AS DOUBLE)) * sqrt(CAST(f.nsq AS DOUBLE)))
             AS cosine
           FROM c JOIN f ON c.bucket = f.bucket)
         SELECT vec_a, vec_b, cosine FROM scored
         WHERE cosine >= 0.4 ORDER BY vec_a, vec_b"""
    },
    // batch twin of the streaming latest-value store: latest event per
    // user by (ts, event_id), tombstoned ('error'-latest) keys dropped
    "q158_stream_cdc" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us, event_id,
           event_type, value FROM events),
         l AS (SELECT * FROM (SELECT e.*, row_number() OVER (
             PARTITION BY user_id ORDER BY ts_us DESC, event_id DESC)
             AS rn FROM e) WHERE rn = 1)
         SELECT user_id, ts_us, event_type AS last_type,
           value AS last_value
         FROM l WHERE event_type != 'error' ORDER BY user_id""",
    "q167_stream_manifest" ->
      """SELECT event_id, epoch_us(ts) AS ts_us, user_id, event_type,
         value FROM events ORDER BY event_id""",
    "q246_stream_txn_sink" ->
      """SELECT event_id, epoch_us(ts) AS ts_us, user_id, event_type,
         value FROM events ORDER BY event_id""",
    // the batch q153 chain restricted to CLOSED intervals (the open row
    // per key lives in the state store, not the emitted history)
    "q171_stream_scd2" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us,
           event_type FROM events),
         c AS (SELECT user_id, ts_us, event_id, event_type FROM (
           SELECT user_id, ts_us, event_id, event_type,
             lag(event_type) OVER (PARTITION BY user_id
               ORDER BY ts_us, event_id) AS prev FROM e)
           WHERE prev IS NULL OR prev != event_type)
         SELECT user_id, event_type, valid_from, valid_to FROM (
           SELECT user_id, event_type, ts_us AS valid_from,
             lead(ts_us) OVER (PARTITION BY user_id
               ORDER BY ts_us, event_id) AS valid_to FROM c)
         WHERE valid_to IS NOT NULL ORDER BY user_id, valid_from""",
    // stream-equals-batch: the q240 dv-replay oracle verbatim
    "q250_stream_dv_feed" -> OpsQueries.oracles("q240_dv_feed"),
    // stream-equals-batch: the q253 upsert-replay oracle verbatim
    "q254_stream_upsert_feed" -> OpsQueries.oracles("q253_upsert_feed"),
    // the bootstrap snapshot of the DV lake == its merge-on-read read
    "q260_stream_bootstrap_dv" -> OpsQueries.oracles("q238_dv_read"),
    // the stream-bootstrapped replica == the same merge-on-read state
    "q262_stream_bootstrap_replicate" -> OpsQueries.oracles("q238_dv_read"),
    // the replica == the source head: initial snapshot (keys % 3 = 0)
    // + publish(1) (% 3 = 1) - the boxed deleteRange + publish(2)
    // (% 3 = 2, landed AFTER the delete so box keys survive there)
    "q255_cdc_replicate" ->
      """WITH b AS (SELECT min(o_orderkey) AS klo, max(o_orderkey) AS khi
           FROM orders)
         SELECT o_orderkey, o_custkey, o_totalprice FROM orders, b
         WHERE o_orderkey % 3 = 2
            OR o_orderkey NOT BETWEEN klo + (khi - klo) // 4
              AND klo + (khi - klo) // 2
         ORDER BY o_orderkey""",
    // stream-equals-batch: the q154 oracle verbatim
    "q172_stream_funnel" -> OpsQueries.oracles("q154_funnel"),
    // stream-equals-batch: the q162 oracle verbatim
    "q175_stream_bitmap" -> OpsQueries.oracles("q162_bitmap_segments"),
    // streaming == batch maintenance from the same feed
    "q205_stream_feed_maintain" -> OpsQueries.oracles("q197_incremental_agg"),
    // streaming == batch JOIN-view maintenance == the full recompute
    "q263_stream_join_maintain" -> OpsQueries.oracles("q234_incremental_join"),
    // the table-level feed's delta: inserts from the day=1 batch,
    // deletes from day=2's box-range DV delete, partition col attached
    "q264_stream_table_feed" -> tableFeedOracle,
    // file-sink twin: the landed parquet equals the memory harness
    "q266_stream_table_feed_sink" -> tableFeedOracle,
    // the DSv2 stream's collected rows == the batch change feed
    "q210_feed_source" -> OpsQueries.oracles("q196_change_feed"),
    // the q34 gap-session chain under native interval-merge semantics
    // (a gap of EXACTLY 1 h starts a new session: [a,b) ∪ [b,c) do not
    // overlap), restricted to sessions finalized under the watermark
    // (last event + gap <= max event time - gap)
    "q184_native_session" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS ts
           FROM events),
         m AS (SELECT *, CASE WHEN lag(ts) OVER w IS NULL
             OR ts - lag(ts) OVER w >= 3600000000 THEN 1 ELSE 0 END AS brk
           FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
         s AS (SELECT *, sum(brk) OVER (PARTITION BY user_id
             ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS sid FROM m),
         g AS (SELECT user_id, min(ts) AS start_us, max(ts) AS end_us,
           count(*) AS n_events FROM s GROUP BY user_id, sid),
         c AS (SELECT max(ts) - 3600000000 AS wm FROM e)
         SELECT user_id, start_us, end_us, n_events FROM g, c
         WHERE end_us + 3600000000 <= wm
         ORDER BY user_id, start_us""",
    // stream-equals-batch: the q185 oracle verbatim
    "q187_stream_ohlc" -> OpsQueries.oracles("q185_ohlc_resample"),
    // batch twin: the q153 SCD-2 chain interval-joined to purchases at
    // their event time
    "q190_stream_pit" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us,
           event_type FROM events),
         c AS (SELECT user_id, ts_us, event_id, event_type FROM (
           SELECT user_id, ts_us, event_id, event_type,
             lag(event_type) OVER (PARTITION BY user_id
               ORDER BY ts_us, event_id) AS prev FROM e)
           WHERE prev IS NULL OR prev != event_type),
         dim AS (SELECT user_id AS d_user, event_type AS state,
           ts_us AS valid_from,
           lead(ts_us) OVER (PARTITION BY user_id
             ORDER BY ts_us, event_id) AS valid_to FROM c),
         p AS (SELECT event_id, epoch_us(ts) AS ts_us, user_id
           FROM events WHERE event_type = 'purchase')
         SELECT p.event_id, p.user_id, p.ts_us, dim.state
         FROM p JOIN dim ON p.user_id = dim.d_user
           AND p.ts_us >= dim.valid_from
           AND (dim.valid_to IS NULL OR p.ts_us < dim.valid_to)
         ORDER BY p.event_id"""
  )
}
