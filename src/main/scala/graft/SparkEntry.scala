package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.gen.Generator
import graft.config.Schemas
import graft.operators.{Dedup, Rank, Similarity, Stage, TextOps}
import graft.queries.Workload
import graft.sources.TestTables

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each `queries` entry is one operator from SURVEY.md §2 (or a
  * training-data-pipeline operator); `oracleSql` holds the DuckDB-equivalent
  * SQL the driver checks it against. Cross-engine exactness rules used
  * throughout:
  *   - money aggregates: per-row products in double, cast to DECIMAL(18,6),
  *     exact decimal SUM, then cast to double — both engines produce
  *     identical bits (no float-summation-order sensitivity);
  *   - timestamps are never returned raw (Spark µs/UTC vs DuckDB naive):
  *     projected as `unix_micros` ↔ `epoch_us` bigints instead;
  *   - counts/sizes cast to BIGINT on both sides;
  *   - DuckDB `regexp_replace` needs the 'g' flag to match Spark's
  *     replace-all semantics.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q07_join_agg")(spark, "/root/testdata/sf0.001")

  // ---- shared expression helpers ----

  /** Exact money sum — semantically `CAST(SUM(CAST(e AS DECIMAL(18,6))) AS
    * DOUBLE)` (what the DuckDB oracles mirror), computed by the native
    * 128-bit-integer aggregate ([[graft.functions.MoneySum]]): identical
    * bits, ~3× faster than the BigDecimal-backed decimal accumulator. */
  private def moneySum(e: Column): Column = graft.functions.MoneySum.money_sum(e)

  private def ts(s: String): Column = lit(s).cast("timestamp")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- reference scan workload (temp.md:39-105 shapes; SURVEY §2.B13-B17) ----
    "q02_count_eq" -> ((s, dir) =>
      Workload.countWhereEq(TestTables.events(s, dir), "event_type", "click")),
    "q03_count_ts_range" -> ((s, dir) =>
      Workload.countWhereBetween(TestTables.events(s, dir), "ts",
        "2024-01-10 00:00:00", "2024-01-20 00:00:00")),
    "q04_count_like" -> ((s, dir) =>
      Workload.countWhereContains(TestTables.documents(s, dir), "text", "table")),
    "q05_count_composite" -> ((s, dir) => {
      val e = TestTables.events(s, dir)
      Workload.countComposite(e, Seq(
        col("props").contains("\"k\": 6"),
        col("ts").between(ts("2024-01-05 00:00:00"), ts("2024-01-25 00:00:00")),
        col("value") < 50.0))
    }),
    "q06_select_limit" -> ((s, dir) =>
      Workload.selectWhereLimit(TestTables.events(s, dir),
          col("event_type") === "purchase", "event_id", 10)
        .select(col("event_id"), unix_micros(col("ts")).as("ts_us"), col("user_id"),
          col("event_type"), col("value"), col("props"))),

    // ---- core SQL operators over the TPC-H-ish star schema ----
    "q01_pricing_summary" -> ((s, dir) => {
      // Examined-and-reverted (r16): widening the 3-split lineitem arrival
      // before the aggregate measured a 2× REGRESSION in an interleaved
      // A/B (base 0.355 vs widened 0.701 s mean-of-7) — writing the 7.4 MB
      // keyed exchange from the 3 scan tasks costs as much as the 6-group
      // partial aggregate it displaces, so the narrow stage keeps the same
      // wall and the extra stage boundary is pure loss. The scan-local
      // partial-agg shape below is already the cluster-correct plan.
      val li = TestTables.lineitem(s, dir)
      li.filter(col("l_shipdate") <= ts("1998-09-01 00:00:00"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          moneySum(col("l_quantity")).as("sum_qty"),
          moneySum(col("l_extendedprice")).as("sum_base_price"),
          moneySum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("sum_disc_price"),
          moneySum(col("l_extendedprice") * (lit(1) - col("l_discount")) *
            (lit(1) + col("l_tax"))).as("sum_charge"),
          round(moneySum(col("l_quantity")) / count(lit(1)), 6).as("avg_qty"),
          round(moneySum(col("l_extendedprice")) / count(lit(1)), 6).as("avg_price"),
          round(moneySum(col("l_discount")) / count(lit(1)), 6).as("avg_disc"),
          count(lit(1)).as("count_order"))
        // total order via a single-partition local sort: the group count is
        // schema-bounded (returnflag × linestatus = 6 rows at ANY corpus
        // size), so a global range sort pays its boundary-sampling job and
        // an extra exchange/stage to order 6 rows — measured 0.56 → 0.36 s
        // at sf0.1 (r15; guide §2.4). Identical rows, identical order.
        .coalesce(1)
        .sortWithinPartitions(col("l_returnflag"), col("l_linestatus"))
    }),
    "q07_join_agg" -> ((s, dir) => {
      val o = TestTables.orders(s, dir)
      val c = TestTables.customer(s, dir)
      val n = TestTables.nation(s, dir)
      val r = TestTables.region(s, dir)
      o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(moneySum(col("o_totalprice")).as("revenue"), count(lit(1)).as("n_orders"))
        // same bounded-output local sort as q01: region × nation is
        // schema-bounded (≤ 125 rows at any corpus size) — the range sort's
        // sampling job is pure overhead
        .coalesce(1)
        .sortWithinPartitions(col("r_name"), col("n_name"))
    }),
    "q08_semi_join" -> ((s, dir) => {
      val c = TestTables.customer(s, dir)
      val o = TestTables.orders(s, dir).select(col("o_custkey"))
      c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_name"))
    }),
    "q09_anti_join" -> ((s, dir) => {
      val c = TestTables.customer(s, dir)
      val o = TestTables.orders(s, dir)
        .filter(col("o_totalprice") > 300000).select(col("o_custkey"))
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))
    }),
    "q10_window_topn" -> ((s, dir) => {
      // Keyed widen on the window's own partition key: a narrow arrival
      // (orders is one 2.7 MB split at sf0.1) otherwise runs the scan +
      // partial WindowGroupLimit single-threaded, and the byte-blind AQE
      // coalescer squeezes the window stage too — measured 0.287 → 0.174 s
      // min-of-5. The widening exchange IS the window's required
      // distribution, so no second exchange is planned; on a wide arrival
      // this is the identity and the partial-limit-below-ENSURE_REQ
      // cluster plan stands untouched.
      val o = Stage.ensureWideBy(
        TestTables.orders(s, dir)
          .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice")),
        Seq("o_custkey"))
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      o.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
    }),
    "q11_distinct_agg" -> ((s, dir) =>
      TestTables.customer(s, dir)
        .groupBy(col("c_mktsegment"))
        .agg(countDistinct(col("c_custkey")).as("n_customers"),
          moneySum(col("c_acctbal")).as("sum_acctbal"))
        .orderBy(col("c_mktsegment"))),
    "q12_setop_intersect" -> ((s, dir) => {
      val withOrders = TestTables.orders(s, dir).select(col("o_custkey").as("custkey"))
      val rich = TestTables.customer(s, dir).filter(col("c_acctbal") > 5000)
        .select(col("c_custkey").as("custkey"))
      withOrders.intersect(rich)
    }),
    "q13_topk" -> ((s, dir) =>
      TestTables.orders(s, dir)
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(10)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))),
    "q14_rollup" -> ((s, dir) =>
      TestTables.orders(s, dir)
        .rollup(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n_orders"), moneySum(col("o_totalprice")).as("revenue"))),
    "q26_percentiles" -> ((s, dir) =>
      TestTables.lineitem(s, dir).agg(
        round(expr("percentile(l_quantity, 0.5)"), 4).as("p50_qty"),
        round(expr("percentile(l_quantity, 0.9)"), 4).as("p90_qty"),
        round(expr("percentile(l_extendedprice, 0.5)"), 4).as("p50_price"))),
    "q27_stats" -> ((s, dir) =>
      TestTables.lineitem(s, dir).agg(
        round(corr(col("l_quantity"), col("l_extendedprice")), 6).as("corr_qty_price"),
        round(stddev_samp(col("l_discount")), 6).as("sd_discount"),
        round(covar_samp(col("l_quantity"), col("l_tax")), 6).as("cov_qty_tax"))),
    "q20_sessionize" -> ((s, dir) => {
      // Examined-and-reverted (r16): pinning the user_id window exchange at
      // the session width (the q10 treatment) measured a REGRESSION here in
      // an interleaved A/B (base 0.345 vs pinned 0.479 s mean-of-7) — the
      // lag-window + aggregate over 150 users is cheap enough that 32-task
      // scheduling overhead exceeds the 2-task serialization it removes.
      val e = TestTables.events(s, dir)
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      e.withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(w))
        .withColumn("new_session",
          when(col("prev_us").isNull ||
            unix_micros(col("ts")) - col("prev_us") > 1800L * 1000000L, 1L).otherwise(0L))
        .groupBy(col("user_id"))
        .agg(sum(col("new_session")).as("n_sessions"), count(lit(1)).as("n_events"))
        .orderBy(col("user_id"))
    }),

    // ---- text analysis (training-data pipeline) ----
    "q16_token_stats" -> ((s, dir) => {
      // text expressions are the whole cost; widen a single-split corpus
      val d = Stage.ensureWide(
        TestTables.documents(s, dir).select(col("doc_id"), col("text")))
      d.select(col("doc_id"),
        length(col("text")).cast("long").as("n_chars"),
        TextOps.tokenCount(col("text")).cast("long").as("n_tokens"),
        TextOps.avgWordLen(col("text")).as("avg_word_len"),
        TextOps.punctRatio(col("text")).as("punct_ratio"))
    }),
    "q17_quality" -> ((s, dir) =>
      TestTables.documents(s, dir).select(col("doc_id"),
        TextOps.stopwordRatio(col("text")).as("stopword_ratio"),
        TextOps.qualityScore(col("text")).as("quality"))),
    "q18_langid" -> ((s, dir) =>
      TextOps.langIdFrame(TestTables.documents(s, dir), "doc_id", "text")),
    "q19_fingerprint" -> ((s, dir) =>
      TestTables.documents(s, dir)
        .select(col("doc_id"), TextOps.fingerprint(col("text")).as("fingerprint"))),
    "q15_dedup_exact" -> ((s, dir) =>
      // counts-only projection: at scale the exchange carries (id, hash)
      // slim rows instead of the text group key; below the size gate
      // (every driver SF) this is bit-for-bit the classic exact() plan
      Dedup.exactCounts(TestTables.documents(s, dir), "doc_id", Seq("text"))),

    // ---- near-dup & similarity (no SQL oracle: approximate/hash-defined;
    //      correctness asserted in ScalaTest against brute-force baselines) ----
    "q21_minhash_pairs" -> ((s, dir) =>
      Dedup.minhashLsh(TestTables.documents(s, dir), "doc_id", "text",
        numHashes = 64, bands = 16, threshold = 0.5)),
    "q22_simhash_pairs" -> ((s, dir) =>
      // portable md5-derived 60-bit signature (4 × 15-bit chunks) instead of
      // the native xxhash64 one, so the whole hash → signature → banding →
      // Hamming pipeline is DuckDB-reproducible and oracle-checked; the
      // native signature path stays covered by OperatorsSpec
      Dedup.simhashPairsFromSig(
          Dedup.portableSimhashSigs(TestTables.documents(s, dir), "doc_id", "text"),
          maxHamming = 8, chunks = 4, chunkBits = 15)
        .select(col("id_a"), col("id_b"), col("hamming").cast("bigint").as("hamming"))),
    "q54_minhash_portable" -> ((s, dir) =>
      // portable md5 + universal-hash MinHash (operators/Dedup) so the whole
      // shingle → signature → band → candidate → estimate pipeline is
      // DuckDB-reproducible and oracle-checked; the native codegen'd q21
      // path stays covered by OperatorsSpec recall/estimate assertions
      Dedup.portableMinhashLsh(TestTables.documents(s, dir), "doc_id", "text",
        numHashes = 32, bands = 16, threshold = 0.5)),
    "q87_incremental_dedup" -> ((s, dir) => {
      // incremental-ingest dedup: the NEW batch (doc_id >= 400) classified
      // against the admitted OLD corpus and against earlier new docs —
      // work is |new|-driven (old docs never pair with each other), the
      // production shape for a daily delta against a 100 TB index; the
      // q54 portable pipeline makes every verdict DuckDB-replayable
      val d = TestTables.documents(s, dir)
      Dedup.incrementalMinhashDedup(
        d.filter(col("doc_id") < 400), d.filter(col("doc_id") >= 400),
        "doc_id", "text", numHashes = 32, bands = 16, threshold = 0.5)
    }),
    "q88_quality_topp" -> ((s, dir) => {
      // per-language top-20% quality filter — the curation step that keeps
      // each language's best slice instead of imposing one global cutoff
      // (a global threshold empties low-resource languages). Ranking runs
      // window-free through Rank.withGroupRank: Window.partitionBy(lang)
      // would collapse each language onto ONE task — five tasks for a
      // 100 TB five-language corpus — while the grouped range-rank spreads
      // a hot language over as many partitions as its volume needs and
      // stitches rank offsets across the boundaries (O(parts) driver
      // state). Per-language totals ride back on a broadcast join.
      val scored = TestTables.documents(s, dir).select(
        col("doc_id"), col("lang"),
        TextOps.qualityScore(col("text")).as("quality"))
      val ranked = Rank.withGroupRank(scored, Seq(col("lang")),
        Seq(col("quality").desc, col("doc_id").asc), rankCol = "rk")
      val counts = scored.groupBy(col("lang")).agg(count(lit(1)).as("n_lang"))
      ranked.join(broadcast(counts), "lang")
        .filter(col("rk") <= ceil(col("n_lang") * lit(0.2)))
        .select(col("doc_id"), col("lang"), col("quality"), col("rk"))
    }),
    "q89_vocab_stats" -> ((s, dir) => {
      // per-language corpus vocabulary profile: exact distinct-token counts
      // via the two-level aggregate — groupBy(lang, token) then
      // groupBy(lang) — so the wide shuffle runs on the high-cardinality
      // (lang, token) key and the final exchange carries one row per
      // (lang, token) group; no count(DISTINCT) expansion, no per-lang
      // window, nothing skewed by a hot language
      val d = TestTables.documents(s, dir)
      val tf = d.select(col("lang"),
          explode(split(trim(lower(col("text"))), "\\s+")).as("tok"))
        .filter(col("tok") =!= "")
        .groupBy(col("lang"), col("tok")).agg(count(lit(1)).as("tf"))
      val vocab = tf.groupBy(col("lang")).agg(
        count(lit(1)).as("n_types"),
        sum(col("tf")).cast("bigint").as("n_tokens"),
        max(col("tf")).cast("bigint").as("max_tf"))
      val docs = d.groupBy(col("lang")).agg(count(lit(1)).as("n_docs"))
      vocab.join(docs, "lang")
        .select(col("lang"), col("n_docs"), col("n_tokens"), col("n_types"),
          col("max_tf"),
          round(col("n_types") / col("n_tokens"), 6).as("type_token_ratio"))
    }),
    "q90_dedup_e2e" -> ((s, dir) => {
      // the whole dedup pipeline as ONE oracle-checked composition:
      // portable minhash LSH pairs (q54) → connected components (q46) →
      // canonical-representative keep list → per-language corpus
      // accounting. Each stage is individually oracled; this row proves
      // the hand-off seams (pair orientation, left-join keep semantics)
      // with a DuckDB replay of the entire chain
      val d = TestTables.documents(s, dir)
      val pairs = Dedup.portableMinhashLsh(d, "doc_id", "text",
          numHashes = 32, bands = 16, threshold = 0.5)
        .select(col("id_a"), col("id_b"))
      val comps = graft.operators.ConnectedComponents
        .components(pairs, "id_a", "id_b")
      d.join(comps.hint("SHUFFLE_HASH"), d("doc_id") === comps("id"), "left")
        .select(col("lang"),
          when(col("rep").isNull || col("rep") === col("doc_id"), 1L)
            .otherwise(0L).as("kept"))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("kept")).cast("bigint").as("n_kept"),
          (count(lit(1)) - sum(col("kept"))).cast("bigint").as("n_dropped"))
    }),
    "q91_token_budget" -> ((s, dir) => {
      // budgeted corpus selection: spend a fixed token budget on the
      // best documents — order by quality, take docs while the running
      // token total stays inside the budget. The prefix sum runs through
      // Rank.withRunningTotal (range shuffle + per-partition sums +
      // offset-seeded stamp); a sum().over(Window.orderBy) would drag
      // the whole corpus onto one task. Long arithmetic end-to-end, so
      // the cutoff replays exactly in the window oracle.
      val scored = TestTables.documents(s, dir).select(
        col("doc_id"),
        TextOps.qualityScore(col("text")).as("quality"),
        TextOps.tokenCount(col("text")).cast("long").as("n_tokens"))
      Rank.withRunningTotal(scored,
          Seq(col("quality").desc, col("doc_id").asc),
          col("n_tokens"), totalCol = "running_tokens")
        .filter(col("running_tokens") <= lit(20000L))
        .select(col("doc_id"), col("quality"), col("n_tokens"),
          col("running_tokens"))
    }),
    "q92_interleave" -> ((s, dir) => {
      // language-interleaved training order: shuffle each language
      // deterministically (md5 content-hash order), then emit documents
      // round-robin across languages — the curriculum reorder that stops
      // a lang-partitioned corpus from training in monolingual blocks.
      // Both passes are window-free: per-lang position via
      // Rank.withGroupRank, global position via Rank.withGlobalRank over
      // (rk, lang) — each one range shuffle, no single-task stage.
      val d = TestTables.documents(s, dir).select(col("doc_id"), col("lang"),
        md5(col("doc_id").cast("string").cast("binary")).as("h"))
      val perLang = Rank.withGroupRank(d, Seq(col("lang")),
        Seq(col("h").asc, col("doc_id").asc), rankCol = "rk")
      Rank.withGlobalRank(perLang,
          Seq(col("rk").asc, col("lang").asc, col("doc_id").asc),
          rankCol = "pos")
        .select(col("doc_id"), col("lang"), col("rk"), col("pos"))
    }),
    "q93_vocab_coverage" -> ((s, dir) => {
      // token-mass coverage curve: what fraction of all corpus tokens the
      // top-k vocabulary types cover — the vocab-size dial for tokenizer
      // design. Rank and cumulative mass come out of ONE
      // Rank.withRunningTotal pass over the (token → tf) aggregate (rank
      // stamped in the same range shuffle); web-scale vocabularies are
      // billions of types, so the coverage scan must not fall into a
      // single-task window any more than the corpus ops do
      val d = TestTables.documents(s, dir)
      val tf = d.select(explode(split(trim(lower(col("text"))), "\\s+")).as("tok"))
        .filter(col("tok") =!= "")
        .groupBy(col("tok")).agg(count(lit(1)).as("tf"))
      val curve = Rank.withRunningTotal(tf,
        Seq(col("tf").desc, col("tok").asc), col("tf"),
        totalCol = "cum_tf", rankCol = Some("k"))
      val total = tf.agg(sum(col("tf")).cast("bigint").as("total_tf"))
      curve.filter(col("k").isin(5L, 10L, 20L))
        .join(broadcast(total))
        .select(col("k"), col("cum_tf"),
          round(col("cum_tf") / col("total_tf"), 6).as("coverage"))
    }),
    "q94_session_sequences" -> ((s, dir) => {
      // sessionization materialized into training sequences: per-user
      // 30-min-gap session ids (q20's assignment), then each session's
      // ordered event-type path + span — the event-stream counterpart of
      // document chunking. The per-user window partitions on the
      // HIGH-cardinality user key (scale-safe, unlike a per-lang window);
      // the path is rebuilt order-free with sort_array over
      // (ts, event_id) structs, so the aggregate needs no ordered
      // collect_list guarantee
      val e = TestTables.events(s, dir)
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val sess = e
        .withColumn("us", unix_micros(col("ts")))
        .withColumn("prev_us", lag(col("us"), 1).over(w))
        .withColumn("new_s",
          when(col("prev_us").isNull
            || col("us") - col("prev_us") > 1800L * 1000000L, 1L).otherwise(0L))
        .withColumn("session_id",
          sum(col("new_s")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      sess.groupBy(col("user_id"), col("session_id"))
        .agg(count(lit(1)).as("n_events"),
          min(col("us")).as("start_us"),
          (max(col("us")) - min(col("us"))).as("span_us"),
          array_join(transform(
            array_sort(collect_list(struct(col("us").as("t"),
              col("event_id").as("e"), col("event_type").as("et")))),
            x => x.getField("et")), ">").as("path"))
    }),
    "q95_retention" -> ((s, dir) => {
      // cohort retention: users grouped by first-seen day, activity
      // counted per (cohort, day-offset) — the engagement matrix behind
      // every retention curve. Two aggregations + one equi-join on the
      // HIGH-cardinality user key (AQE picks the join strategy); nothing
      // windows, nothing single-task
      val e = TestTables.events(s, dir)
      val firstDay = e.groupBy(col("user_id"))
        .agg(min(to_date(col("ts"))).as("cohort_day"))
      val active = e.select(col("user_id"), to_date(col("ts")).as("day")).distinct()
      active.join(firstDay, "user_id")
        .groupBy(col("cohort_day"),
          datediff(col("day"), col("cohort_day")).cast("long").as("day_offset"))
        .agg(count(lit(1)).as("n_users"))
    }),
    "q96_hard_negatives" -> ((s, dir) =>
      // hard-negative mining: each anchor's top-3 most-similar vectors
      // with a DIFFERENT label (operators/Similarity.hardNegatives) —
      // exact all-pairs baseline, label predicate inside the join so
      // mismatching pairs never reach the rank stage
      Similarity.hardNegatives(TestTables.embeddings(s, dir),
        "vec_id", "embedding", "label", k = 3)),
    "q97_rolling_counts" -> ((s, dir) => {
      // rolling 24-hour activity: per event, how many events the same
      // user fired in the preceding day — RANGE frame on event-time
      // micros over the HIGH-cardinality user partition (scale-safe;
      // contrast the per-lang windows q88 exists to avoid). The
      // rate-limiting / burst-detection feature of an event pipeline
      val e = TestTables.events(s, dir)
      val w = Window.partitionBy(col("user_id")).orderBy(col("us"))
        .rangeBetween(-86400000000L, 0L)
      e.select(col("event_id"), col("user_id"),
          unix_micros(col("ts")).as("us"))
        .withColumn("n_24h", count(lit(1)).over(w))
    }),
    "q98_funnel" -> ((s, dir) => {
      // ordered funnel conversion per user: signup → first view AFTER
      // signup → first purchase AFTER that view. min-timestamp per stage
      // with an order constraint — three skinny aggregates stitched by
      // user_id equi-joins; no per-user sort, no window, the
      // match_recognize shape expressed as joins
      val e = TestTables.events(s, dir)
      def stageMin(t: String) = e.filter(col("event_type") === t)
        .groupBy(col("user_id")).agg(min(unix_micros(col("ts"))).as(s"${t}_us"))
      val s1 = stageMin("signup")
      val views = e.filter(col("event_type") === "view")
        .select(col("user_id"), unix_micros(col("ts")).as("v_us"))
      val s2 = s1.join(views, "user_id")
        .filter(col("v_us") >= col("signup_us"))
        .groupBy(col("user_id"), col("signup_us")).agg(min(col("v_us")).as("view_us"))
      val buys = e.filter(col("event_type") === "purchase")
        .select(col("user_id"), unix_micros(col("ts")).as("p_us"))
      val s3 = s2.join(buys, "user_id")
        .filter(col("p_us") >= col("view_us"))
        .groupBy(col("user_id"), col("signup_us"), col("view_us"))
        .agg(min(col("p_us")).as("purchase_us"))
      s1.join(s2.select(col("user_id"), col("view_us")), Seq("user_id"), "left")
        .join(s3.select(col("user_id"), col("purchase_us")), Seq("user_id"), "left")
        .select(col("user_id"), col("signup_us"), col("view_us"), col("purchase_us"))
    }),
    "q99_dedup_keep_best" -> ((s, dir) => {
      // quality-aware dedup policy: within each near-dup cluster keep the
      // HIGHEST-quality member (min-id q90 keeps an arbitrary one) — the
      // curation rule production pipelines actually want. Cluster key =
      // component rep (doc_id for singletons via coalesce); the winner is
      // picked by a per-cluster window on the high-cardinality rep key,
      // tie-broken (quality, doc_id) so the verdict replays exactly
      val d = TestTables.documents(s, dir)
      val pairs = Dedup.portableMinhashLsh(d, "doc_id", "text",
          numHashes = 32, bands = 16, threshold = 0.5)
        .select(col("id_a"), col("id_b"))
      val comps = graft.operators.ConnectedComponents
        .components(pairs, "id_a", "id_b")
      val clustered = d.select(col("doc_id"), col("lang"),
          TextOps.qualityScore(col("text")).as("quality"))
        .join(comps.hint("SHUFFLE_HASH"), d("doc_id") === comps("id"), "left")
        .select(col("doc_id"), col("lang"), col("quality"),
          coalesce(col("rep"), col("doc_id")).as("cluster"))
      val w = Window.partitionBy(col("cluster"))
        .orderBy(col("quality").desc, col("doc_id").desc)
      clustered.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("cluster"), col("doc_id"), col("lang"), col("quality"))
    }),
    "q100_heavy_hitters" -> ((s, dir) =>
      // approximate boilerplate miner: SpaceSaving top-20 token trigrams
      // from a 256-slot mergeable summary — exchange is O(partitions ×
      // counters) rows instead of one per distinct n-gram (q76's exact
      // shuffle). Approximate by design → spec-gated (est/err sandwich +
      // guaranteed-hitter presence vs exact counts), not oracled: DuckDB
      // cannot replay eviction order
      TextOps.topNgramsApprox(TestTables.documents(s, dir), "doc_id", "text",
        n = 3, k = 20, counters = 256)),
    "q101_decontaminate_bloom" -> ((s, dir) => {
      // q47's leakage check behind a Bloom prefilter: the eval shingle
      // set's Bloom summary (built distributed, inlined as a literal into
      // Spark's own might_contain expression) kills the cold train-side
      // (id, hash) rows BEFORE the exchange; the exact equi-join on the
      // survivors removes Bloom false positives, so output — and oracle —
      // are identical to q47
      val d = TestTables.documents(s, dir)
      graft.operators.Contamination.overlapBloom(
          d.filter(col("doc_id") >= 100), "doc_id", "text",
          d.filter(col("doc_id") < 100), "doc_id", "text",
          shingleLen = 3, minShared = 2)
        .select(col("train_id"), col("n_shared"), col("n_eval_docs"))
    }),
    "q102_quality_pct" -> ((s, dir) => {
      // within-language quality percentile — the normalization that makes
      // quality scores comparable ACROSS corpora/languages before mixing
      // (raw scores have per-language scales; percentiles don't). Same
      // window-free grouped rank as q88, emitted as a transform
      // (pct = rank/n) instead of a filter
      val scored = TestTables.documents(s, dir).select(
        col("doc_id"), col("lang"),
        TextOps.qualityScore(col("text")).as("quality"))
      val ranked = Rank.withGroupRank(scored, Seq(col("lang")),
        Seq(col("quality").desc, col("doc_id").asc), rankCol = "rk")
      val counts = scored.groupBy(col("lang")).agg(count(lit(1)).as("n_lang"))
      ranked.join(broadcast(counts), "lang")
        .select(col("doc_id"), col("lang"), col("quality"),
          round(col("rk") / col("n_lang"), 6).as("pct"))
    }),
    "q103_source_cap" -> ((s, dir) => {
      // per-source document cap — the crawl-curation step that stops one
      // hot domain from dominating the corpus (keep at most K best docs
      // per source). Same window-free grouped rank as q88: a
      // Window.partitionBy(source) would put each domain on ONE task, and
      // web domains are exactly the key with million-fold skew at 100 TB;
      // the range-rank spreads a hot domain across partitions and
      // stitches offsets through the O(parts) boundary protocol.
      val scored = TestTables.documents(s, dir).select(
        col("doc_id"), col("source"),
        TextOps.qualityScore(col("text")).as("quality"))
      Rank.withGroupRank(scored, Seq(col("source")),
          Seq(col("quality").desc, col("doc_id").asc), rankCol = "rk")
        .filter(col("rk") <= 8)
        .select(col("doc_id"), col("source"), col("quality"), col("rk"))
    }),
    "q104_dsir_weights" -> ((s, dir) => {
      // DSIR-style importance weight (Xie et al. 2023, "Data Selection
      // for Language Models via Importance Resampling"): per-document
      // log-likelihood ratio between a target unigram LM (here: the
      // English slice, standing in for a curated target corpus) and the
      // background LM of the whole corpus, add-one smoothed. The shape is
      // two aggregates and one join, all on the token key: per-(doc,tok)
      // term frequencies, per-tok target/background counts in ONE pass
      // (conditional sum, not two scans), corpus totals as a 1-row
      // broadcast. The tok⋈stats join deliberately carries no broadcast
      // hint — a web-scale vocabulary is Zipf-unbounded, so AQE decides;
      // weights then reduce per doc map-side. Sampling by the weight is
      // the already-oracled q68 composition.
      val toks = TestTables.documents(s, dir)
        .select(col("doc_id"), col("lang"),
          explode(split(trim(lower(col("text"))), "\\s+")).as("tok"))
        .filter(col("tok") =!= "")
      val docTf = toks.groupBy(col("doc_id"), col("lang"), col("tok"))
        .agg(count(lit(1)).as("tf"))
      val stats = toks.groupBy(col("tok")).agg(
        count(lit(1)).as("b_cnt"),
        sum(when(col("lang") === "en", 1L).otherwise(0L)).as("t_cnt"))
      val totals = stats.agg(
        sum(col("b_cnt")).as("b_total"), sum(col("t_cnt")).as("t_total"),
        count(lit(1)).as("vocab"))
      docTf.join(stats, "tok")
        .crossJoin(broadcast(totals))
        .withColumn("w", col("tf") * (
          log((col("t_cnt") + lit(1.0)) / (col("t_total") + col("vocab"))) -
            log((col("b_cnt") + lit(1.0)) / (col("b_total") + col("vocab")))))
        .groupBy(col("doc_id"), col("lang"))
        .agg(round(sum(col("w")), 6).as("dsir_weight"))
    }),
    "q106_source_token_budget" -> ((s, dir) => {
      // domain-balanced budget selection: EVERY source spends the same
      // fixed token budget on its best documents — the curation shape
      // that holds a corpus to a global token target without letting one
      // domain buy more than its share. The per-source prefix sum runs
      // window-free through Rank.withGroupRunningTotal: a
      // sum().over(Window.partitionBy(source).orderBy(quality)) would put
      // each domain on ONE task (domains being the canonical skew key),
      // while the grouped range-sum spreads hot domains across partitions
      // and stitches running sums through the O(parts) boundary protocol.
      // Long token arithmetic end-to-end → the cutoff replays exactly in
      // the window oracle.
      val scored = TestTables.documents(s, dir).select(
        col("doc_id"), col("source"),
        TextOps.qualityScore(col("text")).as("quality"),
        TextOps.tokenCount(col("text")).cast("long").as("n_tokens"))
      Rank.withGroupRunningTotal(scored, Seq(col("source")),
          Seq(col("quality").desc, col("doc_id").asc),
          col("n_tokens"), totalCol = "running_tokens")
        .filter(col("running_tokens") <= lit(1500L))
        .select(col("doc_id"), col("source"), col("quality"),
          col("n_tokens"), col("running_tokens"))
    }),
    "q111_calibration" -> ((s, dir) => {
      // reliability curve of the trained q107 classifier: deciles of
      // predicted probability vs observed label rate — the calibration
      // check a score must pass before its threshold means anything.
      // One aggregate over the scored frame; bucket = floor(10·p) on the
      // 6-dp-rounded score, so the bucketing replays bit-for-bit. The
      // feature set differs from q107's: the English-marker ratio (the
      // langid signal) actually separates the label, so the fitted scores
      // SPREAD across deciles instead of collapsing onto the base rate.
      val d = TestTables.documents(s, dir)
      val tl = split(trim(lower(col("text"))), "\\s+")
      val fs = Seq(
        round(size(filter(tl, t => t.isin("the", "and", "of", "is", "with")))
          / greatest(size(tl), lit(1)).cast("double"), 4) * 20,
        TextOps.avgWordLen(col("text")) / 10,
        TextOps.stopwordRatio(col("text")))
      // label = the q18 heuristic langid verdict (label distillation) —
      // the generated lang COLUMN is uncorrelated with text content, so
      // fitting against it collapses onto the base rate (measured)
      val y = when(TextOps.langId(col("text")) === "en", 1.0).otherwise(0.0)
      val w = graft.operators.Classifier.logisticFit(
        d, y, fs, iters = 40, lr = 5.0)
      d.select(y.cast("long").as("y"),
          round(graft.operators.Classifier.logisticScore(w, fs), 6).as("p"))
        .withColumn("bucket",
          least(floor(col("p") * 10), lit(9L)).cast("long"))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n"),
          round(avg(col("p")), 6).as("mean_p"),
          round(avg(col("y")), 6).as("obs_rate"))
    }),
    "q109_substring_search" -> ((s, dir) => {
      // exact substring search THROUGH a PERSISTED positional trigram
      // index ([[graft.operators.SubstringIndex]]) — the corpus-tooling
      // shape ("which documents contain this leaked string / phone
      // number / eval answer?") where a full-text scan per query is the
      // thing to avoid at 100 TB. The index is built once through the
      // ManifestSidecarFormat seam (range-clustered on tri, per-file
      // min/max bounds in the manifest); the SEARCH plans its file set
      // from manifest bounds alone and reads only the pattern's own
      // trigram rows — position arithmetic over those rows makes the
      // answer exact with no verify join back to the documents table.
      // Output (doc_id, pos) = first occurrence, strpos semantics — the
      // oracle replays the same answer as a direct scan.
      val pat = "slow fast table"
      val d = TestTables.documents(s, dir)
      val idx = java.nio.file.Files.createTempDirectory("graft_triidx").toString
      graft.operators.SubstringIndex.buildIndex(d, "doc_id", "text", idx)
      graft.operators.SubstringIndex.search(s, idx, pat)
    }),
    "q110_cross_source_dups" -> ((s, dir) => {
      // cross-source duplication matrix: near-dup pairs (q54 pipeline)
      // rolled up by the source pair they connect — the provenance
      // analysis that shows which crawl sources mirror which (and how
      // much of a source is self-duplicated). Pair stream is tiny after
      // LSH, so the two source attaches ride ordinary id joins; the pair
      // is canonicalized (least/greatest) so the matrix is triangular.
      val d = TestTables.documents(s, dir)
      val src = d.select(col("doc_id"), col("source"))
      val pairs = Dedup.portableMinhashLsh(d, "doc_id", "text",
        numHashes = 32, bands = 16, threshold = 0.5)
      pairs
        .join(src.withColumnRenamed("doc_id", "id_a")
          .withColumnRenamed("source", "src_a"), "id_a")
        .join(src.withColumnRenamed("doc_id", "id_b")
          .withColumnRenamed("source", "src_b"), "id_b")
        .select(least(col("src_a"), col("src_b")).as("src_lo"),
          greatest(col("src_a"), col("src_b")).as("src_hi"),
          col("est_jaccard"))
        .groupBy(col("src_lo"), col("src_hi"))
        .agg(count(lit(1)).as("n_pairs"),
          round(avg(col("est_jaccard")), 6).as("avg_sim"))
    }),
    "q107_quality_classifier" -> ((s, dir) => {
      // in-engine trained quality classifier (the CCNet/fastText role):
      // full-batch logistic regression, label = "document is English",
      // features = the three scan-local quality signals. Each of the 5
      // gradient iterations is ONE map-side-combinable aggregate over a
      // persisted skinny feature frame with the weights inlined as
      // literals — no ML runtime, bounded driver state, and the whole
      // fit+score replays in DuckDB as unrolled iteration CTEs (features
      // are closed-form per row; double-sum order is the only divergence,
      // ~1e-12 against the 6-decimal output rounding).
      val d = TestTables.documents(s, dir)
      val fs = Seq(
        least(length(col("text")) / lit(500.0), lit(1.0)),
        TextOps.punctRatio(col("text")),
        TextOps.stopwordRatio(col("text")))
      val w = graft.operators.Classifier.logisticFit(
        d, when(col("lang") === "en", 1.0).otherwise(0.0), fs,
        iters = 5, lr = 1.0)
      d.select(col("doc_id"), col("lang"),
        round(graft.operators.Classifier.logisticScore(w, fs), 6).as("p_en"))
    }),
    "q108_auc" -> ((s, dir) => {
      // distributed ROC AUC of the quality score as a predictor of
      // English — the evaluation metric every trained curation filter
      // needs, at corpus scale. Tie-corrected Mann-Whitney form computed
      // EXACTLY: aggregate per distinct score (pos_s, neg_s), prefix-sum
      // the negatives over ascending score through the window-free
      // running total (the score-group frame is tiny — one row per
      // distinct rounded score — but stays a dataframe end to end), then
      // AUC = Σ_s pos_s · (2·cumneg_<s + neg_s) / (2·P·N). Integer
      // arithmetic until the final division → bit-exact cross-engine,
      // ties handled by the standard midrank correction rather than an
      // arbitrary row_number tie-break.
      graft.operators.Metrics.rocAuc(TestTables.documents(s, dir),
        when(col("lang") === "en", 1L).otherwise(0L),
        TextOps.qualityScore(col("text")))
    }),
    "q105_split_leakage" -> ((s, dir) => {
      // cross-split contamination check: near-duplicate pairs (the q54
      // portable minhash pipeline) whose members fall in DIFFERENT
      // train/val/test splits under the q65 hash assignment — the audit
      // that catches test-set leakage introduced by deduplicating before
      // splitting (or not deduplicating at all). Split membership is a
      // pure function of the id, so it is computed inline on the pair
      // row — no join against an assignment table, nothing shuffled
      // beyond the pair stream itself.
      def splitOf(c: Column): Column = {
        val h = md5(c.cast("string").cast("binary"))
        when(h < "cc", "train").when(h < "e6", "val").otherwise("test")
      }
      Dedup.portableMinhashLsh(TestTables.documents(s, dir), "doc_id", "text",
          numHashes = 32, bands = 16, threshold = 0.5)
        .withColumn("split_a", splitOf(col("id_a")))
        .withColumn("split_b", splitOf(col("id_b")))
        .filter(col("split_a") =!= col("split_b"))
        .select(col("id_a"), col("id_b"), col("split_a"), col("split_b"),
          col("est_jaccard"))
    }),
    "q69_hyperplane_portable" -> ((s, dir) =>
      // portable md5-sign hyperplane LSH (operators/Dedup) so the bucket →
      // candidate → cosine pipeline of the hyperplane family (q25's index
      // machinery) is DuckDB-reproducible and oracle-checked; the native
      // Gaussian-plane q25 path stays covered by SimilaritySpec recall
      // assertions. Integer-quantized projections: the bit decision is
      // exact cross-engine, no float-ordering hazard.
      Dedup.portableEmbeddingNearDups(TestTables.embeddings(s, dir), "vec_id",
        "embedding", threshold = 0.45, planes = 4, tables = 4, dims = 64)),
    "q23_ngram_pairs" -> ((s, dir) =>
      Dedup.ngramJaccard(TestTables.documents(s, dir), "doc_id", "text", threshold = 0.3)),
    "q24_cosine_topk" -> ((s, dir) => {
      val emb = TestTables.embeddings(s, dir)
      val qv = emb.filter(col("vec_id") === 0).head().getSeq[Float](1)
      Similarity.cosineTopK(emb, "vec_id", "embedding", qv, 10)
    }),
    "q25_ann_topk" -> ((s, dir) => {
      val emb = TestTables.embeddings(s, dir)
      val index = Similarity.buildLshIndex(emb, "vec_id", "embedding")
      val qv = emb.filter(col("vec_id") === 0).head().getSeq[Float](1)
      Similarity.annTopK(index, qv, 10)
    }),
    "q36_tfidf" -> ((s, dir) => {
      val d = TestTables.documents(s, dir)
      // Corpus size as a 1-row aggregate cross-joined in (always broadcast-
      // safe) — not a driver-side count() action, which would add a full
      // extra scan before the query starts. The tf⋈dfreq join carries no
      // broadcast hint: the term dictionary of a web-scale corpus is
      // unbounded (Zipf), so AQE broadcasts only when dfreq actually fits
      // and shuffle-joins otherwise.
      val n = d.agg(count(lit(1)).as("n_docs"))
      val terms = d.select(col("doc_id"),
        explode(TextOps.tokens(lower(col("text")))).as("term"))
      val tf = terms.groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
      // df per term from a scan-local per-doc distinct (array_distinct
      // BEFORE the explode): each doc emits each term once, so the per-term
      // count IS the document frequency. The former tf-derived df shuffled
      // the full distinct (doc_id, term) stream just to re-group it by term
      // — one full-corpus exchange removed (r15; guide §2.3/§2.4). Row sets
      // are identical: explode drops null arrays on both shapes, and
      // array_distinct implements exactly the per-doc DISTINCT the
      // (doc_id, term) groupBy produced.
      val dfreq = d.select(
          explode(array_distinct(TextOps.tokens(lower(col("text"))))).as("term"))
        .groupBy(col("term")).agg(count(lit(1)).as("df"))
      val scored = tf.join(dfreq, "term").crossJoin(broadcast(n))
        .withColumn("tfidf",
          round(col("tf") * (log((col("n_docs") + 1.0) / (col("df") + 1.0)) + 1.0), 4))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("doc_id")).orderBy(col("tfidf").desc, col("term").asc)
      scored.withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 3 && col("doc_id") < 50)
        .select(col("doc_id"), col("term"), col("tfidf"), col("rank"))
    }),
    "q37_bm25" -> ((s, dir) => {
      // BM25 (k1=1.2, b=0.75) with the same scale shape as q36: no driver
      // actions, 1-row corpus stats broadcast, term-dictionary join left to
      // AQE. Constants are pre-folded (2.2 = k1+1, 0.25 = 1-b) and mirrored
      // literally in the oracle so both engines evaluate the identical tree.
      val d = TestTables.documents(s, dir)
      val terms = d.select(col("doc_id"),
        explode(TextOps.tokens(lower(col("text")))).as("term"))
      val tf = terms.groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
      // dl (per-doc token count) is scan-local arithmetic: Σ_term tf(doc) is
      // by construction the SIZE of the doc's token array, so no explode and
      // no aggregate is needed at all — the former tf-derived rollup paid a
      // full (doc_id, term) exchange plus a doc_id exchange to compute a
      // number each scan task already holds (r15; guide §2.4). The isNotNull
      // filter reproduces explode's null-array drop exactly, so the row set
      // (and with it n_docs / avgdl) is bit-identical on any input.
      val dl = d.filter(col("text").isNotNull).select(col("doc_id"),
        size(TextOps.tokens(lower(col("text")))).cast("long").as("dl"))
      val stats = dl.agg(count(lit(1)).as("n_docs"), avg(col("dl")).as("avgdl"))
      // same scan-local per-doc-distinct df as q36 (see there)
      val dfreq = d.select(
          explode(array_distinct(TextOps.tokens(lower(col("text"))))).as("term"))
        .groupBy(col("term")).agg(count(lit(1)).as("df"))
      val scored = tf.join(dfreq, "term").join(dl, "doc_id").crossJoin(broadcast(stats))
        .withColumn("idf",
          log((col("n_docs") - col("df") + 0.5) / (col("df") + 0.5) + 1.0))
        .withColumn("bm25",
          round(col("idf") * (col("tf") * lit(2.2)) /
            (col("tf") + lit(1.2) * (lit(0.25) + (lit(0.75) * col("dl")) / col("avgdl"))), 4))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("doc_id")).orderBy(col("bm25").desc, col("term").asc)
      scored.withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 3 && col("doc_id") < 50)
        .select(col("doc_id"), col("term"), col("bm25"), col("rank"))
    }),
    "q35_knn_join" -> ((s, dir) =>
      Similarity.knnJoin(TestTables.embeddings(s, dir), "vec_id", "embedding", k = 5)),
    "q55_knn_brute" -> ((s, dir) =>
      // the exact all-pairs baseline the LSH q35 is measured against —
      // every pair scored, window top-k per row, rank on the rounded
      // cosine so cross-engine float association can't flip it
      Similarity.knnJoinExact(TestTables.embeddings(s, dir), "vec_id",
          "embedding", k = 5)
        .select(col("id_a"), col("id_b"), col("cosine"),
          col("rank").cast("long").as("rank"))),
    "q40_pq_topk" -> ((s, dir) => {
      val emb = TestTables.embeddings(s, dir)
      val cb = graft.operators.Pq.train(emb, "embedding", dim = 64, m = 8, k = 16, iters = 2)
      val index = graft.operators.Pq.encode(emb, "vec_id", "embedding", cb)
      val qv = emb.filter(col("vec_id") === 0).head().getSeq[Float](1)
      graft.operators.Pq.topK(index, cb, qv, 10)
    }),
    "q41_ivfpq_topk" -> ((s, dir) => {
      val emb = TestTables.embeddings(s, dir)
      val ivf = graft.operators.Ivf.train(emb, "embedding", k = 16, iters = 2)
      val pq = graft.operators.Pq.train(emb, "embedding", dim = 64, m = 8, k = 16, iters = 2)
      val index = graft.operators.Pq.ivfPqIndex(emb, "vec_id", "embedding", ivf, pq)
      val qv = emb.filter(col("vec_id") === 0).head().getSeq[Float](1)
      graft.operators.Pq.ivfPqTopK(index, ivf, pq, qv, 10, nprobe = 4)
    }),
    "q34_ivf_topk" -> ((s, dir) => {
      val emb = TestTables.embeddings(s, dir)
      val cb = graft.operators.Ivf.train(emb, "embedding", k = 16, iters = 3)
      val index = graft.operators.Ivf.buildIndex(emb, "vec_id", "embedding", cb)
      val qv = emb.filter(col("vec_id") === 0).head().getSeq[Float](1)
      graft.operators.Ivf.topK(index, cb, qv, 10, nprobe = 4)
    }),

    // ---- wider SQL-operator coverage ----
    "q28_cube" -> ((s, dir) =>
      TestTables.orders(s, dir)
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n_orders"),
          round(moneySum(col("o_totalprice")) / count(lit(1)), 4).as("avg_price"))),
    "q29_in_subquery" -> ((s, dir) => {
      val o = TestTables.orders(s, dir)
      val bigSpenders = o.groupBy(col("o_custkey"))
        .agg(moneySum(col("o_totalprice")).as("spend"))
        .filter(col("spend") > 1000000)
        .select(col("o_custkey").as("k"))
      o.join(broadcast(bigSpenders), o("o_custkey") === bigSpenders("k"), "left_semi")
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"), moneySum(col("o_totalprice")).as("revenue"))
        .orderBy(col("o_orderstatus"))
    }),
    "q30_union_all" -> ((s, dir) => {
      val e = TestTables.events(s, dir)
      val hi = e.filter(col("value") > 90).select(col("event_id"), lit("hi").as("band"))
      val lo = e.filter(col("value") < 10).select(col("event_id"), lit("lo").as("band"))
      hi.unionAll(lo).groupBy(col("band")).agg(count(lit(1)).as("n")).orderBy(col("band"))
    }),
    "q31_subword_tokens" -> ((s, dir) =>
      TestTables.documents(s, dir).select(col("doc_id"),
        TextOps.subwordCount(col("text")).cast("long").as("n_subwords"))),
    "q32_quality_pipeline" -> ((s, dir) => {
      // end-to-end training-data prep: quality-filter → exact-dedup → profile
      val d = TestTables.documents(s, dir)
      val scored = d.select(col("doc_id"), col("text"), col("lang"),
        TextOps.qualityScore(col("text")).as("quality"))
      val kept = scored.filter(col("quality") >= 0.7)
      val deduped = kept.groupBy(col("text"))
        .agg(min(col("doc_id")).as("doc_id"), min(col("lang")).as("lang"),
          min(col("quality")).as("quality"))
      deduped.groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          round(moneySum(col("quality")) / count(lit(1)), 4).as("mean_quality"))
        .orderBy(col("lang"))
    }),
    "q33_embedding_centroids" -> ((s, dir) => {
      val e = TestTables.embeddings(s, dir)
      e.select(col("label"), posexplode(col("embedding")))
        .groupBy(col("label"), col("pos"))
        .agg(round(avg(col("col").cast("double")), 6).as("centroid_val"))
        .filter(col("pos") < 4) // keep the oracle result compact
        .orderBy(col("label"), col("pos"))
    }),

    "q45_range_join" -> ((s, dir) => {
      // interval join via bin bucketization: lineitems shipped within 30
      // days of a high-value order's date, rolled up per (returnflag, month)
      val li = TestTables.lineitem(s, dir)
        .select(col("l_returnflag"),
          datediff(to_date(col("l_shipdate")), lit("1970-01-01").cast("date"))
            .cast("long").as("ship_day"))
      val big = TestTables.orders(s, dir).filter(col("o_totalprice") > 450000)
        .select(col("o_orderkey"),
          datediff(to_date(col("o_orderdate")), lit("1970-01-01").cast("date"))
            .cast("long").as("lo"))
        .withColumn("hi", col("lo") + 30)
      graft.operators.RangeJoin.pointInInterval(li, "ship_day", big, "lo", "hi",
          binWidth = 32)
        .groupBy(col("l_returnflag"), floor(col("ship_day") / 365).as("yr"))
        .agg(count(lit(1)).as("n_pairs"), countDistinct(col("o_orderkey")).as("n_orders"))
        .orderBy(col("l_returnflag"), col("yr"))
    }),
    "q44_asof_join" -> ((s, dir) => {
      // point-in-time enrichment: each click gets the latest prior purchase
      // (per user) — the as-of join Spark lacks natively, as a single
      // sort+forward-fill (see operators/AsofJoin)
      val e = TestTables.events(s, dir)
      val clicks = e.filter(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("ts_us"))
      val purchases = e.filter(col("event_type") === "purchase")
        .groupBy(col("user_id"), unix_micros(col("ts")).as("p_ts_us"))
        .agg(max(col("value")).as("p_value"))
        .select(col("user_id"), col("p_ts_us"), col("p_ts_us").as("p_ts"), col("p_value"))
      graft.operators.AsofJoin.asofLeft(clicks, purchases, "user_id", "ts_us", "p_ts_us")
    }),
    "q42_chunking" -> ((s, dir) =>
      TextOps.chunkFrame(TestTables.documents(s, dir), "doc_id", "text",
          chunkSize = 50, overlap = 10)
        .filter(col("doc_id") < 50)),
    "q43_packing" -> ((s, dir) => {
      val bins = TextOps.packBins(TestTables.documents(s, dir), "doc_id", "text",
        "lang", capacity = 2000)
      bins.groupBy(col("lang"), col("bin"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("sum_tokens"))
        .orderBy(col("lang"), col("bin"))
    }),
    "q38_hash_sample" -> ((s, dir) => {
      // Deterministic content-hash sampling — the training-pipeline way to
      // take a reproducible ~10% subset: md5 hex of the id compared against
      // a hex threshold ('1a'/'100' ≈ 10.2%). Pure scan-local filter, no
      // shuffle until the per-language rollup; the same rows are selected on
      // any engine, any cluster size, any run.
      val d = TestTables.documents(s, dir)
      d.filter(md5(col("doc_id").cast("string").cast("binary")) < "1a")
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_sampled"), min(col("doc_id")).as("first_id"))
        .orderBy(col("lang"))
    }),
    "q57_stratified_sample" -> ((s, dir) => {
      // per-stratum deterministic sampling — the training-mixture knob:
      // different keep-rates per language, selected by content hash so the
      // subset is reproducible on any engine/cluster/run. Scan-local
      // filter; md5 hex threshold '19'/'100' ≈ 9.8%, '4c' ≈ 29.7%
      val d = TestTables.documents(s, dir)
      val rate = when(col("lang") === "en", lit("19")).otherwise(lit("4c"))
      d.filter(md5(concat(col("lang"), lit(":"),
          col("doc_id").cast("string")).cast("binary")) < rate)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_kept"), min(col("doc_id")).as("first_id"))
        .orderBy(col("lang"))
    }),
    "q58_group_sample" -> ((s, dir) => {
      // deterministic k-per-stratum sample: rank docs inside each language
      // by content hash (a seeded uniform draw any engine reproduces), keep
      // the first 20 — the fixed-size variant of q57's fixed-rate sample.
      // Window is partitioned by the stratum, so it scales horizontally —
      // no global order anywhere
      val d = TestTables.documents(s, dir)
      val w = Window.partitionBy(col("lang"))
        .orderBy(md5(col("doc_id").cast("string").cast("binary")), col("doc_id"))
      d.select(col("doc_id"), col("lang"), row_number().over(w).as("rn"))
        .filter(col("rn") <= 20)
        .select(col("doc_id"), col("lang"), col("rn").cast("long").as("rn"))
    }),
    "q39_daily_histogram" -> ((s, dir) => {
      // Time-series binning: events per day + mean value, the standard
      // monitoring rollup. One map-side-combinable aggregation on the
      // day bucket.
      val e = TestTables.events(s, dir)
      e.groupBy(to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("n_events"),
          round(moneySum(col("value")) / count(lit(1)), 6).as("avg_value"))
        .orderBy(col("day"))
    }),

    "q63_cosine_pairs" -> ((s, dir) =>
      // exact embedding near-pair mining — the all-pairs baseline the LSH
      // embeddingNearDups candidates are measured against (threshold set to
      // the testdata's similarity regime; real near-dup corpora use ~0.95)
      Dedup.embeddingPairsExact(TestTables.embeddings(s, dir), "vec_id",
        "embedding", threshold = 0.45)),
    "q68_weighted_sample" -> ((s, dir) => {
      // importance-weighted sampling — keep probability ∝ quality score
      // (the mixture-reweighting op: upsample high-quality strata without
      // a shuffle). The uniform draw is a content hash, so the subset is
      // reproducible on any engine; compare u < q·rate in exact doubles
      val d = TestTables.documents(s, dir)
      val u = conv(substring(md5(col("doc_id").cast("string").cast("binary")), 1, 8),
        16, 10).cast("long").cast("double") / 4294967296.0
      d.select(col("doc_id"), col("lang"),
          TextOps.qualityScore(col("text")).as("quality"), u.as("u"))
        .filter(col("u") < col("quality") * 0.5)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_kept"),
          round(moneySum(col("quality")) / count(lit(1)), 4).as("mean_quality"))
        .orderBy(col("lang"))
    }),
    "q85_mixture_balance" -> ((s, dir) => {
      // mixture balancing — the data-MIXING op: given target proportions
      // per stratum, the largest total T respecting availability is
      // min_s(avail_s/target_s); each stratum keeps rate_s = T·target_s/
      // avail_s of its docs (the binding stratum keeps everything, the
      // rest downsample). Rates come from one map-side-combined count
      // aggregate (5 rows) broadcast back onto the scan; the keep draw is
      // the q68 content hash, so the subset replays on any engine.
      // Rate arithmetic is left-to-right IEEE (min_ratio·target/avail)
      // in BOTH engines, so the u < rate boundary is bit-identical
      val d = TestTables.documents(s, dir)
      val targets = Seq(("en", 0.3), ("zh", 0.2), ("es", 0.2),
        ("de", 0.15), ("fr", 0.15))
      val tdf = s.createDataFrame(targets).toDF("lang", "target")
      val avail = d.groupBy(col("lang")).agg(count(lit(1)).as("avail"))
        .join(broadcast(tdf), "lang")
      val minR = avail
        .agg(min(col("avail").cast("double") / col("target")).as("min_ratio"))
      val rates = avail.crossJoin(broadcast(minR))
        .select(col("lang"),
          (col("min_ratio") * col("target") / col("avail").cast("double")).as("rate"))
      val u = conv(substring(md5(col("doc_id").cast("string").cast("binary")), 1, 8),
        16, 10).cast("long").cast("double") / 4294967296.0
      d.join(broadcast(rates), "lang")
        .filter(u < col("rate"))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_kept"), round(min(col("rate")), 6).as("rate"))
        .orderBy(col("lang"))
    }),
    "q67_salted_agg" -> ((s, dir) => {
      // skew-safe two-level aggregation through the driver gate: the salted
      // path must be value-identical to the plain group-by the oracle runs —
      // the exactness contract that lets it replace a hot-key aggregation
      // without changing results (sums in decimal for cross-engine parity)
      val e = TestTables.events(s, dir)
        .select(col("event_type"), col("value").cast("decimal(18,6)").as("value"))
      graft.operators.Skew.saltedSum(e, Seq("event_type"), Seq("value"), salts = 8)
        .select(col("event_type"),
          col("sum_value").cast("double").as("sum_value"), col("n_rows"))
        .orderBy(col("event_type"))
    }),
    "q66_editdist_pairs" -> ((s, dir) =>
      // short-string dedup: Levenshtein ≤ 3 over 40-char title prefixes,
      // blocked on char-trigram SUBSTRINGS (operators/Dedup.editDistance-
      // Pairs) — the identical windows the oracle builds, so the blocking
      // sets match exactly (no hash-family caveat); every candidate is
      // exact-verified, and the df ∈ [2, 1000] gate appears in both
      // pipelines (at sf0.01's 500 docs the upper bound cannot bite, so
      // the gate is exercised, not lossy)
      Dedup.editDistancePairs(TestTables.documents(s, dir), "doc_id", "text",
        maxDist = 3, maxLen = 40)),
    "q70_editdist_rarest" -> ((s, dir) =>
      // q66's pipeline under the per-string guard: each string blocks only
      // on its 4 globally-rarest gated trigrams — the configuration that
      // keeps candidate volume ~linear when mid-frequency trigram mass
      // defeats the df gate alone. The (freq, trigram) tie-break compares
      // UTF-8 bytes, so the oracle's row_number window replays it exactly
      Dedup.editDistancePairs(TestTables.documents(s, dir), "doc_id", "text",
        maxDist = 3, maxLen = 40, rarestK = 4)),
    "q115_editdist_stats" -> ((s, dir) =>
      // q70's dedup as ACCOUNTING: the Levenshtein verify runs inside the
      // blocked self-join (pair dedup via the row-local min-shared-gram
      // rule) and only per-doc aggregates survive — the mode that produces
      // exact duplicate counts at corpus sizes where the pair list itself
      // is the infeasible artifact. Oracle = groupBy over q70's pair set,
      // both endpoints
      Dedup.editDistanceStats(TestTables.documents(s, dir), "doc_id", "text",
        maxDist = 3, maxLen = 40, rarestK = 4)),
    "q71_repeated_windows" -> ((s, dir) =>
      // span-level dup analysis (Lee et al. 2022): 20-char windows at
      // stride 5, corpus frequency ≥ 2 ⇒ duplicated; per-doc duplicated
      // fraction. Windows key the shuffle as plain substrings, so the
      // oracle rebuilds the identical window set
      TextOps.repeatedWindowStats(TestTables.documents(s, dir), "doc_id", "text",
          winLen = 20, stride = 5, minFreq = 2)
        .select(col("id").as("doc_id"), col("n_windows"), col("n_dup"),
          col("dup_ratio"))),
    "q75_dedup_spans" -> ((s, dir) =>
      // the removal half of span-level dedup: duplicated windows merged
      // into maximal intervals (gaps-and-islands, per-doc window sort
      // only) — what a cleaning pass would actually cut
      TextOps.dupSpanStats(TestTables.documents(s, dir), "doc_id", "text",
          winLen = 20, stride = 5, minFreq = 2)
        .select(col("id").as("doc_id"), col("n_chars"), col("n_spans"),
          col("removed_chars"), col("kept_ratio"))),
    "q77_dedup_span_removal" -> ((s, dir) =>
      // the splice q75 accounts for: duplicated spans cut out of the text
      // by one aggregate() fold over the merged intervals — string results
      // hash-compared against the oracle's complement-interval string_agg
      TextOps.removeDupSpans(TestTables.documents(s, dir), "doc_id", "text",
          winLen = 20, stride = 5, minFreq = 2)
        .select(col("id").as("doc_id"), col("clean_text"))),
    "q86_remove_spans_winnow" -> ((s, dir) =>
      // the cleaning splice under TRUE winnowing selection — q77's cut
      // with q82's alignment-free density-guaranteed window choice; the
      // full cleaned STRINGS hash-match the oracle's complement-interval
      // string_agg rebuild
      TextOps.removeDupSpans(TestTables.documents(s, dir), "doc_id", "text",
          winLen = 20, minFreq = 2, winnowK = 5)
        .select(col("id").as("doc_id"), col("clean_text"))),
    "q82_dedup_spans_winnow" -> ((s, dir) =>
      // TRUE winnowing selection (Schleimer et al. 2003): every frame of
      // k=5 consecutive windows fingerprints its min-hash window —
      // alignment-free like q80's mod-p AND density-guaranteed (no span
      // of length >= winLen+k-1 escapes); leftmost tie-break replays in
      // the oracle via first-occurrence list_position
      TextOps.dupSpanStats(TestTables.documents(s, dir), "doc_id", "text",
          winLen = 20, minFreq = 2, winnowK = 5)
        .select(col("id").as("doc_id"), col("n_chars"), col("n_spans"),
          col("removed_chars"), col("kept_ratio"))),
    "q81_decontaminate_spans" -> ((s, dir) => {
      // span-level decontamination: any window of a TRAIN doc that occurs
      // anywhere in the EVAL slice marks a contaminated interval (content-
      // defined selection — a leaked span is caught at any offset); the
      // substring counterpart of q47's doc-level shingle overlap
      val d = TestTables.documents(s, dir)
      TextOps.decontaminateSpans(
          d.filter(col("doc_id") >= 25), "doc_id", "text",
          d.filter(col("doc_id") < 25), "doc_id", "text",
          winLen = 20, stride = 5, modP = 5)
        .select(col("id").as("doc_id"), col("n_chars"), col("n_spans"),
          col("removed_chars"), col("kept_ratio"))
    }),
    "q84_decontaminate_winnow" -> ((s, dir) => {
      // density-guaranteed decontamination: winnowing selection on BOTH
      // corpora — a leaked span of length >= winLen + k - 1 contains a
      // frame fully interior to it in both docs, whose leftmost-min
      // depends only on span content, so it is caught with CERTAINTY at
      // any offset (the MOSS guarantee; q81's mod-p is probabilistic)
      val d = TestTables.documents(s, dir)
      TextOps.decontaminateSpans(
          d.filter(col("doc_id") >= 25), "doc_id", "text",
          d.filter(col("doc_id") < 25), "doc_id", "text",
          winLen = 20, winnowK = 5)
        .select(col("id").as("doc_id"), col("n_chars"), col("n_spans"),
          col("removed_chars"), col("kept_ratio"))
    }),
    "q80_dedup_spans_cdc" -> ((s, dir) =>
      // alignment-free span dedup: content-defined window selection (all
      // stride-1 windows, keep md5-head ≡ 0 mod 5 — the mod-p flavor of
      // winnowing). Unlike q75's stride grid, misaligned cross-doc
      // duplicates are detected; md5 keeps the selection rule replayable
      // in the oracle
      TextOps.dupSpanStats(TestTables.documents(s, dir), "doc_id", "text",
          winLen = 20, stride = 5, minFreq = 2, modP = 5)
        .select(col("id").as("doc_id"), col("n_chars"), col("n_spans"),
          col("removed_chars"), col("kept_ratio"))),
    "q79_bigram_lm" -> ((s, dir) =>
      // corpus-self-trained bigram LM quality scoring (the n-gram flavor
      // of the CCNet LM filter): mean ln P(w2|w1) per doc under the
      // corpus's own bigram MLE. The count tables are DataFrames — the
      // "model" is written once and reused at scale
      TextOps.bigramLmScore(TestTables.documents(s, dir), "doc_id", "text")
        .select(col("id").as("doc_id"), col("n_bigrams"), col("avg_logp"))),
    "q78_clean_pipeline" -> ((s, dir) => {
      // the cleaning pipeline end-to-end, composed from this round's
      // operators: PII-redact every doc, splice out corpus-duplicated
      // spans (windows computed over the REDACTED text — redaction can
      // itself create duplicates), then per-language corpus accounting.
      // Every stage is oracle-expressible, so the whole composition is
      // hash-checked, not just its parts
      val d = TestTables.documents(s, dir)
      val redacted = d.select(col("doc_id"), col("lang"),
        TextOps.piiRedact(col("text")).as("text"))
      val clean = TextOps.removeDupSpans(redacted, "doc_id", "text",
        winLen = 20, stride = 5, minFreq = 2)
      redacted.join(clean.select(col("id").as("doc_id"), col("clean_text")), "doc_id")
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(length(col("text"))).cast("bigint").as("redacted_chars"),
          sum(length(col("clean_text"))).cast("bigint").as("clean_chars"))
        .orderBy(col("lang"))
    }),
    "q76_top_ngrams" -> ((s, dir) =>
      // boilerplate miner: corpus-wide top-20 token trigrams; zero-state
      // sized window count on the ngram + TakeOrdered, lexicographic
      // tie-break (TextOps.topNgrams — the partial-agg shape spills one
      // hash entry per distinct trigram per JVM on heavy-tailed streams)
      TextOps.topNgrams(TestTables.documents(s, dir), "doc_id", "text",
        n = 3, k = 20)),
    "q72_pii_scan" -> ((s, dir) =>
      // PII scrub accounting: email/IPv4/phone counts + post-redaction
      // length per doc. Regexes restricted to the Java∩RE2 subset so
      // DuckDB matches byte-for-byte
      TextOps.piiScan(TestTables.documents(s, dir), "doc_id", "text")),
    "q73_ivf_portable" -> ((s, dir) =>
      // oracle-checkable IVF twin: md5-sign ±1 centroids, integer-
      // quantized assignment/probing (exact cross-engine), float cosine
      // only on rescored survivors — makes the IVF family's pruning
      // decisions themselves oracle-verified; the native k-means IVF
      // (q34) stays covered by IvfSpec recall assertions
      Similarity.portableIvfTopK(TestTables.embeddings(s, dir), "vec_id",
        "embedding", queryId = 0L, nLists = 8, nprobe = 2, k = 10)),
    "q74_pq_portable" -> ((s, dir) =>
      // oracle-checkable PQ twin: md5-lattice codebooks, bigint encode +
      // ADC end-to-end (no float anywhere), so the oracle replays the
      // whole index → encode → ADC → top-k pipeline; native PQ (q40/q41)
      // keeps its recall specs
      graft.operators.Pq.portablePqTopK(TestTables.embeddings(s, dir), "vec_id",
        "embedding", queryId = 0L, m = 8, ks = 16, k = 10)),
    "q83_semantic_dedup" -> ((s, dir) =>
      // SemDeDup: portable-IVF cluster assignment (in-row integer math, no
      // dim explode), then drop any vector with an earlier near-neighbor
      // (rounded cosine ≥ τ) in its cluster — greedy leader, per-pair
      // EXISTS, not transitive closure. τ from the testdata's similarity
      // regime (q63); the oracle replays assignment, pairing, and the
      // cosine gate value-for-value
      Similarity.semanticDedup(TestTables.embeddings(s, dir), "vec_id",
        "embedding", nLists = 8, tau = 0.45)),
    "q112_semantic_dedup_hier" -> ((s, dir) =>
      // the HIERARCHICAL assignment regime (nLists=128 > the 64-list
      // flat-scan threshold): super-cell argmax over 11 md5-sign
      // super-centroids, then only the winning 12-cell block scanned —
      // O(√nLists·dims)/row, the O(n²) fix for SemDeDup's nLists ∝ n
      // policy. Both levels are quantized-integer md5 arithmetic, so the
      // oracle replays the two-level rule value-for-value (q83 pins the
      // flat regime unchanged)
      Similarity.semanticDedup(TestTables.embeddings(s, dir), "vec_id",
        "embedding", nLists = 128, tau = 0.45)),
    "q113_knn_join_ivf" -> ((s, dir) =>
      // IVF-candidate batch k-NN join: probed md5-sign cells + PQ-coded
      // in-cell shortlists + exact rescore, no pair stream, no vector
      // broadcast — the measured handoff past knnJoin's broadcast-attach
      // ceiling. The PQ codebook is k-means-trained (float-iterative), so
      // like the native ANN family this is spec-gated on recall
      // (OperatorsSpec planted + vs-exact) rather than DuckDB-oracled
      Similarity.knnJoinIvf(TestTables.embeddings(s, dir), "vec_id",
        "embedding", k = 3, nLists = 8, nprobe = 4)),
    "q114_knn_join_ivfpq_portable" -> ((s, dir) =>
      // the JOIN form's oracle anchor: q73's md5-sign cells + q74's
      // md5-lattice PQ codebooks + bigint ADC shortlist + q55's
      // rounded-cosine rescore — every pruning decision exact integer
      // math, so the whole IVF+PQ k-NN join replays in ANSI SQL (the
      // native q113 path stays spec-gated; this twin gives the family a
      // cross-engine verdict on the same corpus)
      Similarity.knnJoinIvfPqPortable(TestTables.embeddings(s, dir),
        "vec_id", "embedding", k = 5, nLists = 8, nprobe = 2,
        m = 8, ks = 16, kCand = 20)),
    "q122_hard_negatives_cell" -> ((s, dir) =>
      // the NATIVE in-cell label-gated miner (trained-PQ shortlist →
      // spec-gated like q113; the q120 portable twin is the family's
      // oracle anchor): same-label members excluded inside the ADC
      // shortlist, label_b riding the winner struct — no oversample, no
      // attach joins
      Similarity.hardNegativesAnnCell(TestTables.embeddings(s, dir),
        "vec_id", "embedding", "label", k = 3, nLists = 8, nprobe = 4)),
    "q118_knn_join_restricted" -> ((s, dir) => {
      // member-ALLOW-LIST k-NN join — the filtered-search face of the
      // family ("rank only the license-clean third of the corpus"):
      // q114's pipeline with the rescored shortlist semi-joined to the
      // allowed ids before the rank re-numbers. The native path is
      // KnnIndex.knnJoinDelta(restrict = …) (deepened rescore + the
      // tombstone filter position); this twin replays the same decision
      // order in ANSI SQL
      val e = TestTables.embeddings(s, dir)
      Similarity.knnJoinIvfPqPortableRestricted(e, "vec_id", "embedding",
        restrictIds = e.filter(col("vec_id") % 3 === 0).select(col("vec_id")),
        k = 5, nLists = 8, nprobe = 2, m = 8, ks = 16, kCand = 20)
    }),
    "q119_ann_recall" -> ((s, dir) => {
      // recall@k evaluation as a first-class operator (Metrics.recallAtK):
      // the portable IVF+PQ join scored against the exact brute force —
      // micro-averaged recall, tail minimum, perfect fraction, all
      // single-division figures that replay bit-exactly in ANSI SQL. The
      // same harness grades the native ANN family in its specs; this
      // entry pins the metric arithmetic itself cross-engine
      val e = TestTables.embeddings(s, dir)
      graft.operators.Metrics.recallAtK(
        Similarity.knnJoinIvfPqPortable(e, "vec_id", "embedding", k = 5,
          nLists = 8, nprobe = 2, m = 8, ks = 16, kCand = 20),
        Similarity.knnJoinExact(e, "vec_id", "embedding", k = 5), k = 5)
    }),
    "q116_knn_join_incremental" -> ((s, dir) => {
      // the INCREMENTAL delta pass's oracle anchor (the KnnIndex lifecycle:
      // stored directories + delta probes): every 5th vector arrives as
      // the new batch and probes against the full union — q114's pipeline
      // with one probe-side filter, so the whole delta verdict (which old
      // or same-batch vector each arrival is nearest to) replays in ANSI
      // SQL. The native KnnIndex path stays spec-gated (trained PQ); this
      // twin pins the incremental SEMANTICS cross-engine
      val e = TestTables.embeddings(s, dir)
      Similarity.knnJoinIvfPqPortableIncremental(
        e.filter(col("vec_id") % 5 =!= 0), e.filter(col("vec_id") % 5 === 0),
        "vec_id", "embedding", k = 5, nLists = 8, nprobe = 2,
        m = 8, ks = 16, kCand = 20)
    }),
    "q117_semantic_dedup_delta" -> ((s, dir) => {
      // incremental SEMANTIC dedup verdicts — the KnnIndex.dedupDelta
      // oracle anchor: q116's candidate pipeline with the rank cut
      // removed, folded by the q87 rule (dup of the min qualifying stored
      // id, else of a lower-id same-batch arrival; τ=0.35 sits inside the
      // testdata's shortlist-cosine range — max 0.443 at sf0.01 — so the
      // verdict mixes keeps and drops). The native index path stays spec-gated
      // (trained PQ); this twin makes every ingest-batch keep/drop
      // verdict DuckDB-replayable
      val e = TestTables.embeddings(s, dir)
      Similarity.semanticDedupIncrementalPortable(
        e.filter(col("vec_id") % 5 =!= 0), e.filter(col("vec_id") % 5 === 0),
        "vec_id", "embedding", tau = 0.35, nLists = 8, nprobe = 2,
        m = 8, ks = 16, kCand = 20)
        .withColumnRenamed("id", "vec_id")
    }),
    "q120_hard_negatives_portable" -> ((s, dir) => {
      // hard-negative mining's oracle anchor: q114's pipeline with
      // same-label pairs excluded BEFORE the kCand ADC cut (labels =
      // vec_id % 16) — the decision position hardNegativesAnnCell's
      // in-cell shortlist gate holds, so every integer-shortlist slot is
      // spent on candidate negatives and the whole verdict (which k
      // different-label vectors each anchor is nearest to) replays in
      // ANSI SQL. The native cell path stays spec-gated (trained PQ);
      // this twin pins the label-gate POSITION cross-engine
      val e = TestTables.embeddings(s, dir)
      Similarity.hardNegativesPortable(
        e.withColumn("lbl", pmod(col("vec_id"), lit(16L))),
        "vec_id", "embedding", "lbl", k = 5, nLists = 8, nprobe = 2,
        m = 8, ks = 16, kCand = 20)
    }),
    "q121_hard_negatives_incremental" -> ((s, dir) => {
      // the DELTA mining shape's oracle anchor (KnnIndex.hardNegativesDelta:
      // mine negatives for an arriving batch against the stored index):
      // q116's probe restriction (anchors = the new batch, vec_id % 5 = 0)
      // composed with q120's label gate (same-label pairs excluded before
      // the kCand cut, labels = vec_id % 16) on the one portable pipeline —
      // two predicates over the q114 SQL replay every verdict
      val e = TestTables.embeddings(s, dir)
        .withColumn("lbl", pmod(col("vec_id"), lit(16L)))
      Similarity.hardNegativesPortableIncremental(
        e.filter(col("vec_id") % 5 =!= 0), e.filter(col("vec_id") % 5 === 0),
        "vec_id", "embedding", "lbl", k = 5, nLists = 8, nprobe = 2,
        m = 8, ks = 16, kCand = 20)
    }),
    "q123_hard_negatives_balanced" -> ((s, dir) => {
      // class-BALANCED mining's oracle anchor: the q120 rescored mismatch
      // shortlist re-ranked per (anchor, foreign label) and cut at k=2
      // within each class — one extra window partition key over the q120
      // SQL replays every balanced verdict (the native
      // hardNegativesAnnCellBalanced's per-cell quota stays spec-gated)
      val e = TestTables.embeddings(s, dir)
      Similarity.hardNegativesPortableBalanced(
        e.withColumn("lbl", pmod(col("vec_id"), lit(16L))),
        "vec_id", "embedding", "lbl", k = 2, nLists = 8, nprobe = 2,
        m = 8, ks = 16, kCand = 20)
    }),
    "q124_knn_join_payload_filtered" -> ((s, dir) => {
      // payload-PREDICATE-filtered ANN — the oracle anchor of
      // KnnIndex.knnJoinDelta(payloadIn = …): answers limited to members
      // whose stored payload (here vec_id % 16) is in {1, 3, 5}, the
      // filter at the q118 restrict position (shortlist + rescore over
      // ALL members, predicate, rank re-numbers) — one more predicate
      // over the q114 CTE prefix replays every verdict in ANSI SQL
      val e = TestTables.embeddings(s, dir)
      Similarity.knnJoinIvfPqPortablePayloadFiltered(
        e.withColumn("pay", pmod(col("vec_id"), lit(16L))),
        "vec_id", "embedding", "pay", allowed = Seq(1L, 3L, 5L),
        k = 5, nLists = 8, nprobe = 2, m = 8, ks = 16, kCand = 20)
    }),
    "q125_knn_join_payload_where" -> ((s, dir) => {
      // STRUCT-payload predicate ANN — the oracle anchor of
      // KnnIndex.knnJoinDelta(payloadWhere = …): the production filtered
      // search ("license IN (…) AND quality > q") as a set + range
      // CONJUNCTION over two stored member attributes (class = vec_id %
      // 16, quality = round6((vec_id % 97) / 97)), evaluated at the q118
      // restrict position — shortlist + rescore over ALL members, the
      // conjunction filters the rescored pairs, rank re-numbers; both
      // attributes ride the output. One more WHERE conjunction over the
      // q114 CTE prefix replays every verdict in ANSI SQL
      val e = TestTables.embeddings(s, dir)
      val payDf = e.select(col("vec_id").cast("long").as("id"),
        pmod(col("vec_id"), lit(16L)).as("payload_cls"),
        round(pmod(col("vec_id"), lit(97L)) / lit(97.0), 6).as("payload_q"))
      Similarity.knnJoinIvfPqPortablePayloadWhere(
        e, "vec_id", "embedding", payDf,
        col("payload_cls").isin(1L, 3L, 5L, 7L) && col("payload_q") > 0.25,
        k = 5, nLists = 8, nprobe = 2, m = 8, ks = 16, kCand = 20)
    }),
    "q64_shuffle_order" -> ((s, dir) =>
      // deterministic corpus shuffle — the pre-training reorder: sort by
      // content hash, reproducible on any engine/run. At scale this is a
      // repartitionByRange on the hash (balanced, one shuffle); the LIMIT
      // here keeps the oracle compact
      TestTables.documents(s, dir)
        .select(col("doc_id"), md5(col("doc_id").cast("string").cast("binary")).as("h"))
        .orderBy(col("h"), col("doc_id"))
        .limit(20)),
    "q65_split_assign" -> ((s, dir) => {
      // hash-based train/val/test assignment (~80/10/10 by md5 prefix) —
      // deterministic, scan-local, the canonical split op; rollup per
      // (split, lang) checks both the ratios and the stratification
      val d = TestTables.documents(s, dir)
      val h = md5(col("doc_id").cast("string").cast("binary"))
      d.select(col("doc_id"), col("lang"),
          when(h < "cc", "train").when(h < "e6", "val").otherwise("test").as("split"))
        .groupBy(col("split"), col("lang"))
        .agg(count(lit(1)).as("n"), min(col("doc_id")).as("first_id"))
        .orderBy(col("split"), col("lang"))
    }),
    "q60_pivot" -> ((s, dir) =>
      // wide-format rollup: one row per day, one column per event type —
      // Spark's relational pivot with an explicit value list (explicit so
      // the schema is static and no extra distinct-scan job runs)
      TestTables.events(s, dir)
        .groupBy(to_date(col("ts")).as("day"))
        .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
        .agg(count(lit(1)))
        .na.fill(0L)
        .orderBy(col("day"))),
    "q61_unpivot" -> ((s, dir) =>
      // long-format melt of per-order money columns — Spark 4's native
      // unpivot (UNPIVOT/MELT), the inverse surface of q60
      TestTables.orders(s, dir)
        .select(col("o_orderkey"), col("o_totalprice"),
          (col("o_totalprice") * 0.1).as("o_tax"))
        .unpivot(Array(col("o_orderkey")),
          Array(col("o_totalprice"), col("o_tax")), "measure", "amount")
        .groupBy(col("measure"))
        .agg(count(lit(1)).as("n"),
          round(moneySum(col("amount")), 4).as("total"))
        .orderBy(col("measure"))),
    "q62_grouping_sets" -> ((s, dir) => {
      // arbitrary grouping-set combos — the general form rollup/cube (q14/
      // q28) specialize: (status, priority), (status), (priority) but NOT ()
      val o = TestTables.orders(s, dir)
      o.createOrReplaceTempView("orders_gs")
      s.sql(
        """SELECT o_orderstatus, o_orderpriority,
          |  count(*) AS n_orders,
          |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS revenue
          |FROM orders_gs
          |GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
          |  (o_orderstatus), (o_orderpriority))""".stripMargin)
    }),
    "q46_dedup_clusters" -> ((s, dir) => {
      // pair edges → dedup clusters: min-label connected components over the
      // exact ngram-Jaccard pairs; rep = canonical (minimum) member id
      val pairs = Dedup.ngramJaccard(TestTables.documents(s, dir), "doc_id", "text",
        threshold = 0.3)
      graft.operators.ConnectedComponents.components(pairs, "id_a", "id_b")
        .select(col("id"), col("rep"))
    }),
    "q59_dedup_clusters_star" -> ((s, dir) => {
      // same clusters as q46 via alternating large-star/small-star
      // contraction — O(log² n) rounds independent of component diameter,
      // the formulation that survives adversarial near-dup chains
      val pairs = Dedup.ngramJaccard(TestTables.documents(s, dir), "doc_id", "text",
        threshold = 0.3)
      graft.operators.ConnectedComponents.componentsStar(pairs, "id_a", "id_b")
        .select(col("id"), col("rep"))
    }),
    "q47_decontaminate" -> ((s, dir) => {
      // benchmark-leakage check: training docs (id ≥ 100) sharing ≥2 distinct
      // 3-gram shingles with the "benchmark" slice (id < 100)
      val d = TestTables.documents(s, dir)
      graft.operators.Contamination.overlap(
          d.filter(col("doc_id") >= 100), "doc_id", "text",
          d.filter(col("doc_id") < 100), "doc_id", "text",
          shingleLen = 3, minShared = 2)
        .select(col("train_id"), col("n_shared"), col("n_eval_docs"))
    }),
    "q48_repetition" -> ((s, dir) => {
      // Gopher-style intra-document repetition: bigram duplication stats from
      // one native pass (hash, sort, run-length — no shingle strings)
      val d = Stage.ensureWide(
        TestTables.documents(s, dir).select(col("doc_id"), col("text")))
      d.select(col("doc_id"),
          graft.functions.HashExpressions.shingle_dup_stats(
            split(trim(lower(col("text"))), "\\s+"), 2).as("st"))
        .select(col("doc_id"),
          col("st.n_shingles").cast("long").as("n_shingles"),
          col("st.n_distinct").cast("long").as("n_distinct"),
          round(lit(1.0) - col("st.n_distinct") / col("st.n_shingles").cast("double"), 6)
            .as("dup_ratio"),
          col("st.max_freq").cast("long").as("max_freq"))
    }),

    "q50_json_extract" -> ((s, dir) => {
      // semi-structured extraction: parse the JSON props column, aggregate
      // on the extracted field — scan-local parse (codegen'd path), one
      // agg shuffle
      val e = TestTables.events(s, dir)
      e.select(get_json_object(col("props"), "$.k").cast("long").as("k"),
          col("value"))
        .groupBy(col("k"))
        .agg(count(lit(1)).as("n"),
          round(moneySum(col("value")) / count(lit(1)), 6).as("avg_value"))
        .orderBy(col("k"))
    }),
    "q51_moving_avg" -> ((s, dir) => {
      // event-time feature: per-user 5-row trailing mean over the purchase
      // stream — one shuffle on the window key, sorted within partitions
      val e = TestTables.events(s, dir)
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
        .rowsBetween(-4, Window.currentRow)
      // exact decimal window sum / row count instead of avg(): windowed
      // double summation order differs across engines (DuckDB segment-trees
      // its window aggs), so the float-exactness recipe applies here too
      e.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"),
          round(sum(col("value").cast("decimal(18,6)")).over(w).cast("double") /
            count(lit(1)).over(w), 6).as("avg5"))
    }),
    "q52_ntile" -> ((s, dir) => {
      // decile bucketing of customers by balance — the standard cohort cut
      val c = TestTables.customer(s, dir)
      // a window-over-global-order ntile collapses onto one task — fine on
      // a dimension table like this; the fact-table formulation is q56
      // (operators/Rank.exactNtile: range partition + offset stamp)
      c.select(col("c_custkey"),
          ntile(10).over(Window.orderBy(col("c_acctbal").desc,
            col("c_custkey").asc)).cast("long").as("decile"))
        .groupBy(col("decile"))
        .agg(count(lit(1)).as("n"), min(col("c_custkey")).as("min_key"))
        .orderBy(col("decile"))
    }),
    "q56_ntile_scalable" -> ((s, dir) => {
      // the same decile cut as q52 computed WITHOUT a single-partition
      // window: range-partition on the sort key, per-partition offsets,
      // local stamp (operators/Rank) — the formulation that survives a
      // fact-table input where q52's global Window.orderBy serializes
      val c = TestTables.customer(s, dir)
      graft.operators.Rank.exactNtile(c,
          Seq(col("c_acctbal").desc, col("c_custkey").asc), 10,
          tileCol = "decile")
        .groupBy(col("decile"))
        .agg(count(lit(1)).as("n"), min(col("c_custkey")).as("min_key"))
        .orderBy(col("decile"))
    }),
    "q53_select_latemat" -> ((s, dir) =>
      // the two-phase late-materialization row fetch (Workload.scala): phase
      // 1 takes the top-n matching ids from a 2-column scan, phase 2
      // refetches the full rows through a row-group-prunable IN filter —
      // scan cost ∝ hits, not table width × size
      Workload.selectWhereLimitLateMat(TestTables.events(s, dir),
          col("value") > 99.5, "event_id", 10)
        .select(col("event_id"), unix_micros(col("ts")).as("ts_us"), col("user_id"),
          col("event_type"), col("value"), col("props"))),
    "q49_bpe" -> ((s, dir) => {
      // learned subword tokenizer: corpus word-count (one shuffle) → driver
      // merge loop on the top word types → native scan-local encode. No
      // DuckDB oracle (BPE is not SQL-expressible); BpeSpec pins the merge
      // sequence on the classic hand-computable corpus and determinism.
      val d = TestTables.documents(s, dir)
      val model = graft.operators.Bpe.train(d, "text", numMerges = 100,
        maxWordTypes = 5000)
      Stage.ensureWide(d.select(col("doc_id"), col("text")))
        .select(col("doc_id"),
          size(graft.operators.Bpe.encode(model, col("text"))).cast("long")
            .as("n_bpe_tokens"))
    }),

    // ---- generator engine smoke through the driver (no DuckDB oracle:
    //      DuckDB cannot run the generator) ----
    "gen_profile" -> ((s, _) => {
      val df = Generator.generate(s, Schemas.narrowOrders, 1, 10000, seed = 1)
      df.groupBy(col("status")).agg(
          count(lit(1)).as("n"),
          sum(when(col("country").isNull, 1L).otherwise(0L)).as("null_countries"))
        .orderBy(col("status"))
    })
  )

  // ---- DuckDB oracles ----

  private val tokensSql = """regexp_split_to_array(trim(lower(text)), '\s+')"""
  private val stopList = "['the','a','an','and','or','of','to','in','is','it','for','on','with','as']"

  // q23's hot-shingle cutoff (maxShingleFreq=1000) cannot trigger at the
  // driver's sf0.01 (500 docs), so the operator is exact there: pairwise
  // Jaccard over distinct 3-word shingle sets. Spark dedups shingles by
  // xxhash64; a collision between distinct shingles would skew a count,
  // but at this scale the probability is ~1e-13. Shared by q23 and the
  // q46 connected-components oracle (clusters over the same pair list).
  private val ngramPairsSql: String =
    ("""WITH toks AS (
       |  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS tk
       |  FROM documents),
       |sh AS (
       |  SELECT DISTINCT doc_id, shingle FROM (
       |    SELECT doc_id,
       |      CASE WHEN len(tk) < 3 THEN array_to_string(tk, ' ')
       |           ELSE array_to_string(tk[i:i+2], ' ') END AS shingle
       |    FROM (SELECT doc_id, tk,
       |            unnest(range(1, greatest(len(tk) - 1, 2))) AS i
       |          FROM toks))),
       |counts AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_sh FROM sh GROUP BY doc_id),
       |pairs AS (
       |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
       |  FROM sh a JOIN sh b USING (shingle)
       |  WHERE a.doc_id < b.doc_id
       |  GROUP BY 1, 2)
       |SELECT id_a, id_b,
       |  round(inter / CAST(ca.n_sh + cb.n_sh - inter AS DOUBLE), 6) AS jaccard
       |FROM pairs
       |JOIN counts ca ON ca.doc_id = id_a
       |JOIN counts cb ON cb.doc_id = id_b
       |WHERE round(inter / CAST(ca.n_sh + cb.n_sh - inter AS DOUBLE), 6) >= 0.3""").stripMargin

  /** DuckDB replica of q22: md5-prefix per-token hash → ±1 bit votes →
    * 60-bit signature → 4×15-bit chunk-agreement candidates → Hamming ≤ 8.
    * Generated programmatically (60 vote sums) to match
    * [[graft.operators.Dedup.portableSimhashSigs]] bit-for-bit. */
  private val simhashPairsSql: String = {
    val bits = 0 until 60
    val votes = bits
      .map(j => s"SUM(CASE WHEN (h >> $j) & 1 = 1 THEN 1 ELSE -1 END) AS b$j")
      .mkString(", ")
    val sigExpr = bits
      .map(j => s"CASE WHEN b$j > 0 THEN ${1L << j} ELSE 0 END")
      .mkString(" + ")
    val chunkCond = (0 until 4)
      .map(b => s"((l.sig >> ${b * 15}) & 32767) = ((r.sig >> ${b * 15}) & 32767)")
      .mkString(" OR ")
    s"""WITH tok AS (
       |  SELECT doc_id AS id, CAST(('0x' || substring(md5(t), 1, 15)) AS BIGINT) AS h
       |  FROM (SELECT doc_id, unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS t
       |        FROM documents)),
       |bitvotes AS (SELECT id, $votes FROM tok GROUP BY id),
       |sigs AS (SELECT id, $sigExpr AS sig FROM bitvotes)
       |SELECT l.id AS id_a, r.id AS id_b,
       |  CAST(bit_count(xor(l.sig, r.sig)) AS BIGINT) AS hamming
       |FROM sigs l JOIN sigs r
       |  ON l.id < r.id AND ($chunkCond)
       |WHERE bit_count(xor(l.sig, r.sig)) <= 8""".stripMargin
  }

  /** DuckDB replica of q54: md5-prefix shingle hash mod p → 32 universal-
    * hash MIN slots → 16 two-slot band keys → band-equality candidates →
    * agreeing-slot estimate. Generated programmatically to match
    * [[graft.operators.Dedup.portableMinhashLsh]] value-for-value. */
  /** DuckDB replica of q107: the 5 full-batch gradient-descent iterations
    * unrolled as CTE pairs (g_i = gradient aggregate under weights w_{i-1},
    * w_i = the update), zero-initialized, then the final sigmoid scored per
    * document. Features are the same closed-form expressions the Spark side
    * computes, so the only cross-engine divergence is double-sum order
    * inside each gradient (~1e-12) — absorbed by the 6-decimal rounding.
    * Exposed as a parameterized CTE preamble ending in `scored` so
    * composed oracles (q111 calibration, at a longer/hotter fit that
    * actually spreads the scores) reuse the identical machinery. */
  private def logisticCtes(iters: Int, lr: Double,
      features: Seq[String] = LogisticQualityFeatures,
      labelSql: String = "CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END"): String = {
    val Seq(f1, f2, f3) = features
    def sig(w: String) =
      s"1.0 / (1.0 + exp(-($w.b + $w.w1*f1 + $w.w2*f2 + $w.w3*f3)))"
    val iterCtes = (1 to iters).map { i =>
      val prev = s"w${i - 1}"
      // MATERIALIZED: each iteration must evaluate ONCE — default CTE
      // inlining re-expands the whole w-chain at every reference, which
      // is exponential in the iteration count (40 iterations hang the
      // oracle engine; 1-row materialization is free)
      s"""g$i AS MATERIALIZED (
         |  SELECT sum(${sig(prev)} - y) AS g0,
         |         sum((${sig(prev)} - y) * f1) AS g1,
         |         sum((${sig(prev)} - y) * f2) AS g2,
         |         sum((${sig(prev)} - y) * f3) AS g3,
         |         count(*) AS n
         |  FROM f CROSS JOIN $prev),
         |w$i AS MATERIALIZED (
         |  SELECT $prev.b - $lr * g$i.g0 / g$i.n AS b,
         |         $prev.w1 - $lr * g$i.g1 / g$i.n AS w1,
         |         $prev.w2 - $lr * g$i.g2 / g$i.n AS w2,
         |         $prev.w3 - $lr * g$i.g3 / g$i.n AS w3
         |  FROM $prev CROSS JOIN g$i)""".stripMargin
    }.mkString(",\n")
    s"""WITH f AS MATERIALIZED (
       |  SELECT doc_id, lang,
       |    $labelSql AS y,
       |    $f1 AS f1, $f2 AS f2, $f3 AS f3
       |  FROM documents),
       |w0 AS (SELECT 0.0 AS b, 0.0 AS w1, 0.0 AS w2, 0.0 AS w3),
       |$iterCtes,
       |scored AS (
       |  SELECT doc_id, lang, y, round(${sig(s"w$iters")}, 6) AS p_en
       |  FROM f CROSS JOIN w$iters)""".stripMargin
  }

  /** The q107 quality-feature triple (length sweet-spot, punctuation,
    * stopwords) in oracle SQL. */
  private val LogisticQualityFeatures: Seq[String] = Seq(
    "least(length(text) / 500.0, 1.0)",
    """round(length(regexp_replace(text, '[^.,;:!?''"()-]', '', 'g')) / CAST(greatest(length(text), 1) AS DOUBLE), 4)""",
    s"round(CAST(len(list_filter($tokensSql, t -> list_contains($stopList, t))) AS DOUBLE) / greatest(len($tokensSql), 1), 4)")

  /** q111's label: the q18 heuristic language-ID verdict "is English" —
    * label distillation (fitting a probabilistic scorer to a rule-based
    * labeler), and the one target the synthetic corpus actually supports:
    * the generated `lang` COLUMN is uncorrelated with text content
    * (measured: en-marker ratio ≈ 0.03 for every lang value), so any fit
    * against it collapses onto the base rate. */
  private val langIdEnLabelSql: String = {
    def h(ws: String) =
      s"len(list_filter($tokensSql, t -> list_contains([$ws], t)))"
    val en = h("'the','and','of','is','with'")
    val de = h("'der','die','und','ist','nicht'")
    val fr = h("'le','la','les','est','une'")
    val es = h("'el','los','es','una','como'")
    val zh = h("'的','是','不','了','在'")
    s"CASE WHEN $en > 0 AND $en >= greatest($en,$de,$fr,$es,$zh) THEN 1.0 ELSE 0.0 END"
  }

  /** The q111 feature triple: English-marker ratio (the langid signal —
    * actually separates the label, so the calibration curve has spread),
    * mean word length, stopword ratio. */
  private val LogisticLangFeatures: Seq[String] = Seq(
    // ×20 feature scaling: marker ratios live in [0, 0.1], and 40
    // full-batch steps at lr 5 cannot grow the weight far enough to
    // spread the scores — scaled, the same fit covers 6 deciles
    // (parameter-searched offline on the identical feature matrix)
    s"round(CAST(len(list_filter($tokensSql, t -> list_contains(['the','and','of','is','with'], t))) AS DOUBLE) / greatest(len($tokensSql), 1), 4) * 20",
    """round(length(regexp_replace(text, '\s+', '', 'g')) / CAST(greatest(CASE WHEN length(trim(text)) = 0 THEN 0 ELSE len(regexp_split_to_array(trim(text), '\s+')) END, 1) AS DOUBLE), 4) / 10""",
    s"round(CAST(len(list_filter($tokensSql, t -> list_contains($stopList, t))) AS DOUBLE) / greatest(len($tokensSql), 1), 4)")

  private val logisticSql: String =
    s"""${logisticCtes(5, 1.0)}
       |SELECT doc_id, lang, p_en FROM scored""".stripMargin

  /** The q54 portable-minhash pipeline as a reusable `WITH` preamble plus
    * final pair-select, so composed oracles (q105 cross-split leakage) can
    * wrap the identical pair stream in one more CTE instead of duplicating
    * the signature/band construction. */
  private val (minhashCtes, minhashPairSelect): (String, String) = {
    val n = 32; val bands = 16; val rpb = n / bands; val p = 2147483647L
    val slots = (0 until n)
      .map(i => s"MIN((h * ${2 * i + 3} + ${5 * i + 7}) % $p) AS m$i")
      .mkString(", ")
    val bandSelects = (0 until bands).map { b =>
      val key = (0 until rpb)
        .map(j => s"CAST(m${b * rpb + j} AS VARCHAR)")
        .mkString(" || ',' || ")
      s"SELECT id, $b AS band, $key AS key FROM sigs"
    }.mkString(" UNION ALL ")
    val agree = (0 until n)
      .map(i => s"CASE WHEN a.m$i = b.m$i THEN 1 ELSE 0 END")
      .mkString(" + ")
    val ctes =
      s"""WITH toks AS (
         |  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\\s+') AS tk
         |  FROM documents),
         |sh AS (
         |  SELECT DISTINCT doc_id AS id, shingle FROM (
         |    SELECT doc_id,
         |      CASE WHEN len(tk) < 3 THEN array_to_string(tk, ' ')
         |           ELSE array_to_string(tk[i:i+2], ' ') END AS shingle
         |    FROM (SELECT doc_id, tk,
         |            unnest(range(1, greatest(len(tk) - 1, 2))) AS i
         |          FROM toks))),
         |hashed AS (
         |  SELECT id, CAST(('0x' || substring(md5(shingle), 1, 15)) AS BIGINT) % $p AS h
         |  FROM sh),
         |sigs AS (SELECT id, $slots FROM hashed GROUP BY id),
         |bands AS ($bandSelects),
         |cand AS (
         |  SELECT DISTINCT l.id AS id_a, r.id AS id_b
         |  FROM bands l JOIN bands r ON l.band = r.band AND l.key = r.key AND l.id < r.id)""".stripMargin
    val select =
      s"""SELECT id_a, id_b, round(($agree) / $n.0, 6) AS est_jaccard
         |FROM cand JOIN sigs a ON id_a = a.id JOIN sigs b ON id_b = b.id
         |WHERE round(($agree) / $n.0, 6) >= 0.5""".stripMargin
    (ctes, select)
  }

  private val minhashPairsSql: String = s"$minhashCtes\n$minhashPairSelect"

  /** The q114 portable IVF+PQ join pipeline as a CTE prefix ending at `sc`
    * (every rescored shortlist pair with its exact rounded cosine), with a
    * pluggable probe-side predicate — `""` is the full self-join (q114,
    * and q118 filters its `sc`); `" AND id % 5 = 0"` is the incremental
    * form whose probes are the new batch (q116/q117) — and a pluggable
    * candidate predicate applied BEFORE the kCand ADC cut — q120's
    * label-mismatch gate (`" AND p.id % 16 <> a.id % 16"`), the decision
    * position hardNegativesAnnCell's in-cell shortlist holds. */
  private def ivfPqJoinCtes(probeFilter: String, candFilter: String = ""): String =
    (s"""WITH v AS (
       |  SELECT vec_id AS id, generate_subscripts(embedding, 1) AS dim,
       |    CAST(round(CAST(unnest(embedding) AS DOUBLE) * 1000000) AS BIGINT) AS xq,
       |    CAST(unnest(embedding) AS DOUBLE) AS x
       |  FROM embeddings),
       |nrm AS (SELECT id, sqrt(sum(x * x)) AS n FROM v GROUP BY id),
       |keep AS (SELECT id FROM nrm WHERE n > 0),
       |signs AS (
       |  SELECT c.c AS c, i.i AS dim,
       |    CASE WHEN CAST(('0x' || substring(
       |        md5('ivf-' || c.c || '-' || i.i), 1, 8)) AS BIGINT) % 2 = 0
       |      THEN 1 ELSE -1 END AS sgn
       |  FROM (SELECT unnest(range(0, 8)) AS c) c,
       |       (SELECT unnest(range(1, 65)) AS i) i),
       |ranked AS (
       |  SELECT id, c,
       |    row_number() OVER (PARTITION BY id ORDER BY dot DESC, c ASC) AS rk
       |  FROM (
       |    SELECT id, c, sum(sgn * xq) AS dot
       |    FROM v JOIN keep USING (id) JOIN signs USING (dim)
       |    GROUP BY id, c)),
       |assigned AS (SELECT id, c FROM ranked WHERE rk = 1),
       |probed AS (SELECT id, c FROM ranked WHERE rk <= 2$probeFilter),
       |cb AS (
       |  SELECT s.s AS sub, c.c AS code, s.s * 8 + j.j AS dim,
       |    (CAST(('0x' || substring(
       |        md5('pq-' || s.s || '-' || c.c || '-' || j.j), 1, 8)) AS BIGINT)
       |      % 2001 - 1000) * 1000 AS cq
       |  FROM (SELECT unnest(range(0, 8)) AS s) s,
       |       (SELECT unnest(range(0, 16)) AS c) c,
       |       (SELECT unnest(range(1, 9)) AS j) j),
       |dists AS (
       |  SELECT id, sub, code, sum((xq - cq) * (xq - cq)) AS d2
       |  FROM v JOIN cb USING (dim)
       |  GROUP BY id, sub, code),
       |codes AS (
       |  SELECT id, sub, code FROM (
       |    SELECT id, sub, code,
       |      row_number() OVER (PARTITION BY id, sub ORDER BY d2 ASC, code ASC) AS rk
       |    FROM dists)
       |  WHERE rk = 1),
       |cands AS (
       |  SELECT p.id AS id_a, a.id AS id_b
       |  FROM probed p JOIN assigned a ON p.c = a.c AND p.id <> a.id$candFilter),
       |adc AS (
       |  SELECT cd.id_a, cd.id_b, sum(da.d2) AS adc
       |  FROM cands cd
       |  JOIN codes cb2 ON cb2.id = cd.id_b
       |  JOIN dists da ON da.id = cd.id_a AND da.sub = cb2.sub AND da.code = cb2.code
       |  GROUP BY cd.id_a, cd.id_b),
       |sl AS (
       |  SELECT id_a, id_b FROM (
       |    SELECT id_a, id_b,
       |      row_number() OVER (PARTITION BY id_a ORDER BY adc ASC, id_b ASC) AS rk
       |    FROM adc)
       |  WHERE rk <= 20),
       |dp AS (
       |  SELECT sl.id_a, sl.id_b, sum(va.x * vb.x) AS d
       |  FROM sl
       |  JOIN v va ON va.id = sl.id_a
       |  JOIN v vb ON vb.id = sl.id_b AND vb.dim = va.dim
       |  GROUP BY sl.id_a, sl.id_b),
       |sc AS (
       |  SELECT id_a, id_b, round(d / (na.n * nb.n), 6) AS cosine
       |  FROM dp JOIN nrm na ON na.id = id_a JOIN nrm nb ON nb.id = id_b)""")
      .stripMargin

  /** q116/q117's shared prefix — probes restricted to the new batch. */
  private val incrementalIvfPqCtes: String = ivfPqJoinCtes(" AND id % 5 = 0")

  /** DuckDB replica of q87: the q54 signature/band CTEs over the full
    * table, candidates restricted to new-vs-old and new-vs-earlier-new at
    * the doc_id 400 split, per-new-doc min matching ids, kept iff none —
    * value-for-value against [[graft.operators.Dedup.incrementalMinhashDedup]]
    * (the signature formula is per-doc independent, so computing it over
    * the union equals the operator's per-corpus computation). */
  private val incrementalDedupSql: String = {
    val n = 32; val bands = 16; val rpb = n / bands; val p = 2147483647L
    val split = 400
    val slots = (0 until n)
      .map(i => s"MIN((h * ${2 * i + 3} + ${5 * i + 7}) % $p) AS m$i")
      .mkString(", ")
    val bandSelects = (0 until bands).map { b =>
      val key = (0 until rpb)
        .map(j => s"CAST(m${b * rpb + j} AS VARCHAR)")
        .mkString(" || ',' || ")
      s"SELECT id, $b AS band, $key AS key FROM sigs"
    }.mkString(" UNION ALL ")
    val agree = (0 until n)
      .map(i => s"CASE WHEN a.m$i = b.m$i THEN 1 ELSE 0 END")
      .mkString(" + ")
    s"""WITH toks AS (
       |  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\\s+') AS tk
       |  FROM documents),
       |sh AS (
       |  SELECT DISTINCT doc_id AS id, shingle FROM (
       |    SELECT doc_id,
       |      CASE WHEN len(tk) < 3 THEN array_to_string(tk, ' ')
       |           ELSE array_to_string(tk[i:i+2], ' ') END AS shingle
       |    FROM (SELECT doc_id, tk,
       |            unnest(range(1, greatest(len(tk) - 1, 2))) AS i
       |          FROM toks))),
       |hashed AS (
       |  SELECT id, CAST(('0x' || substring(md5(shingle), 1, 15)) AS BIGINT) % $p AS h
       |  FROM sh),
       |sigs AS (SELECT id, $slots FROM hashed GROUP BY id),
       |bands AS ($bandSelects),
       |cand_old AS (
       |  SELECT DISTINCT r.id AS nid, l.id AS oid
       |  FROM bands l JOIN bands r ON l.band = r.band AND l.key = r.key
       |  WHERE l.id < $split AND r.id >= $split),
       |cand_new AS (
       |  SELECT DISTINCT r.id AS nid, l.id AS eid
       |  FROM bands l JOIN bands r ON l.band = r.band AND l.key = r.key
       |  WHERE l.id >= $split AND r.id >= $split AND l.id < r.id),
       |vold AS (
       |  SELECT nid, min(oid) AS min_oid
       |  FROM cand_old JOIN sigs b ON nid = b.id JOIN sigs a ON oid = a.id
       |  WHERE round(($agree) / $n.0, 6) >= 0.5
       |  GROUP BY nid),
       |vnew AS (
       |  SELECT nid, min(eid) AS min_eid
       |  FROM cand_new JOIN sigs b ON nid = b.id JOIN sigs a ON eid = a.id
       |  WHERE round(($agree) / $n.0, 6) >= 0.5
       |  GROUP BY nid)
       |SELECT s.id AS doc_id,
       |  CAST(coalesce(v1.min_oid, -1) AS BIGINT) AS dup_of_old,
       |  CAST(coalesce(v2.min_eid, -1) AS BIGINT) AS dup_of_new,
       |  CAST(CASE WHEN v1.nid IS NULL AND v2.nid IS NULL THEN 1 ELSE 0 END
       |    AS BIGINT) AS kept
       |FROM sigs s
       |LEFT JOIN vold v1 ON s.id = v1.nid
       |LEFT JOIN vnew v2 ON s.id = v2.nid
       |WHERE s.id >= $split""".stripMargin
  }

  /** DuckDB replica of q69: md5-parity ±1 plane signs × integer-quantized
    * components → per-(table, plane) sign of an exact bigint dot product →
    * plane-ordered bit-string bucket keys → bucket-equality candidates →
    * exact cosine ≥ threshold. Generated programmatically to match
    * [[graft.operators.Dedup.portableEmbeddingNearDups]] value-for-value
    * (tables = 4, planes = 4, dims = 64, threshold = 0.45). */
  private val hyperplanePairsSql: String = {
    val tables = 4; val planes = 4; val dims = 64
    s"""WITH v AS (
       |  SELECT vec_id AS id, generate_subscripts(embedding, 1) AS dim,
       |    CAST(round(CAST(unnest(embedding) AS DOUBLE) * 1000000) AS BIGINT) AS xq,
       |    CAST(unnest(embedding) AS DOUBLE) AS x
       |  FROM embeddings),
       |nrm AS (
       |  SELECT id, sqrt(sum(x * x)) AS n FROM v GROUP BY id),
       |keep AS (SELECT id FROM nrm WHERE n > 0),
       |signs AS (
       |  SELECT t.t AS tbl, p.p AS plane, i.i AS dim,
       |    CASE WHEN CAST(('0x' || substring(
       |        md5('hp-' || t.t || '-' || p.p || '-' || i.i), 1, 8)) AS BIGINT) % 2 = 0
       |      THEN 1 ELSE -1 END AS sgn
       |  FROM (SELECT unnest(range(0, $tables)) AS t) t,
       |       (SELECT unnest(range(0, $planes)) AS p) p,
       |       (SELECT unnest(range(1, ${dims + 1})) AS i) i),
       |bits AS (
       |  SELECT id, tbl, plane,
       |    CASE WHEN sum(sgn * xq) >= 0 THEN '1' ELSE '0' END AS bit
       |  FROM v JOIN keep USING (id) JOIN signs USING (dim)
       |  GROUP BY id, tbl, plane),
       |banded AS (
       |  SELECT id, tbl, string_agg(bit, '' ORDER BY plane) AS key
       |  FROM bits GROUP BY id, tbl),
       |cand AS (
       |  SELECT DISTINCT l.id AS id_a, r.id AS id_b
       |  FROM banded l JOIN banded r
       |    ON l.tbl = r.tbl AND l.key = r.key AND l.id < r.id),
       |dp AS (
       |  SELECT id_a, id_b, sum(a.x * b.x) AS d
       |  FROM cand JOIN v a ON a.id = id_a JOIN v b ON b.id = id_b AND a.dim = b.dim
       |  GROUP BY id_a, id_b)
       |SELECT id_a, id_b, round(d / (na.n * nb.n), 6) AS cosine
       |FROM dp JOIN nrm na ON na.id = id_a JOIN nrm nb ON nb.id = id_b
       |WHERE round(d / (na.n * nb.n), 6) >= 0.45""".stripMargin
  }

  /** Transitive closure over the exact q23 pair list (tiny at sf0.01), then
    * min reachable id per node — the declarative mirror of the min-label /
    * star-contraction fixpoint; shared by q46 and q59. */
  private val clustersOracleSql: String =
    "WITH RECURSIVE pairs AS (\n" + ngramPairsSql + "\n),\n" +
      """edges AS (
       |  SELECT id_a AS src, id_b AS dst FROM pairs
       |  UNION
       |  SELECT id_b, id_a FROM pairs),
       |reach AS (
       |  SELECT src, dst FROM edges
       |  UNION
       |  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src)
       |SELECT src AS id, CAST(least(src, min(dst)) AS BIGINT) AS rep
       |FROM reach GROUP BY src""".stripMargin

  /** q90: the q54 pair list → recursive-CTE components → left-join keep
    * verdict → per-language accounting, all in one replayable statement. */
  private val dedupE2eSql: String =
    "WITH RECURSIVE pairs AS (\n  SELECT id_a, id_b FROM (\n" + minhashPairsSql +
      "\n  ) mp\n),\n" +
      """edges AS (
       |  SELECT id_a AS src, id_b AS dst FROM pairs
       |  UNION
       |  SELECT id_b, id_a FROM pairs),
       |reach AS (
       |  SELECT src, dst FROM edges
       |  UNION
       |  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
       |rep AS (
       |  SELECT src AS id, CAST(least(src, min(dst)) AS BIGINT) AS rep
       |  FROM reach GROUP BY src)
       |SELECT d.lang, count(*) AS n_docs,
       |  CAST(sum(CASE WHEN rep.rep IS NULL OR rep.rep = d.doc_id
       |                THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       |  CAST(sum(CASE WHEN rep.rep IS NOT NULL AND rep.rep <> d.doc_id
       |                THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped
       |FROM documents d LEFT JOIN rep ON d.doc_id = rep.id
       |GROUP BY d.lang""".stripMargin

  /** q99: q90's recursive-CTE components + the q17 quality expression,
    * winner-per-cluster via QUALIFY — the whole keep-best policy in one
    * replayable statement. */
  private val dedupKeepBestSql: String =
    "WITH RECURSIVE pairs AS (\n  SELECT id_a, id_b FROM (\n" + minhashPairsSql +
      "\n  ) mp\n),\n" +
      s"""edges AS (
       |  SELECT id_a AS src, id_b AS dst FROM pairs
       |  UNION
       |  SELECT id_b, id_a FROM pairs),
       |reach AS (
       |  SELECT src, dst FROM edges
       |  UNION
       |  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
       |rep AS (
       |  SELECT src AS id, CAST(least(src, min(dst)) AS BIGINT) AS rep
       |  FROM reach GROUP BY src),
       |t AS (
       | SELECT doc_id, lang,
       |  CAST(len(list_filter($tokensSql, t -> list_contains($stopList, t))) AS DOUBLE)
       |    / greatest(len($tokensSql), 1) AS swr,
       |  length(regexp_replace(text, '[^.,;:!?''"()-]', '', 'g'))
       |    / CAST(greatest(length(text), 1) AS DOUBLE) AS pr,
       |  text
       | FROM documents),
       |scored AS (
       | SELECT doc_id, lang,
       |  round(least(length(text) / 500.0, 1.0) * 0.5 +
       |   (CASE WHEN round(pr, 4) < 0.2 THEN 1.0 ELSE 0.5 END) * 0.25 +
       |   (CASE WHEN round(swr, 4) > 0.01 THEN 1.0 ELSE 0.6 END) * 0.25, 4) AS quality
       | FROM t),
       |clustered AS (
       | SELECT s.doc_id, s.lang, s.quality,
       |   coalesce(rep.rep, s.doc_id) AS cluster
       | FROM scored s LEFT JOIN rep ON s.doc_id = rep.id)
       |SELECT cluster, doc_id, lang, quality FROM clustered
       |QUALIFY row_number() OVER (PARTITION BY cluster
       |  ORDER BY quality DESC, doc_id DESC) = 1""".stripMargin

  /** q47 + q101 (the Bloom-prefiltered path returns identical rows). */
  private val decontaminateSql: String =
    ("""WITH toks AS (
       |  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS tk
       |  FROM documents),
       |sh AS (
       |  SELECT DISTINCT doc_id, shingle FROM (
       |    SELECT doc_id,
       |      CASE WHEN len(tk) < 3 THEN array_to_string(tk, ' ')
       |           ELSE array_to_string(tk[i:i+2], ' ') END AS shingle
       |    FROM (SELECT doc_id, tk,
       |            unnest(range(1, greatest(len(tk) - 1, 2))) AS i
       |          FROM toks)))
       |SELECT t.doc_id AS train_id,
       |  CAST(count(DISTINCT t.shingle) AS BIGINT) AS n_shared,
       |  CAST(count(DISTINCT e.doc_id) AS BIGINT) AS n_eval_docs
       |FROM sh t JOIN sh e ON t.shingle = e.shingle
       |WHERE t.doc_id >= 100 AND e.doc_id < 100
       |GROUP BY t.doc_id
       |HAVING count(DISTINCT t.shingle) >= 2""").stripMargin

  def oracleSql: Map[String, String] = Map(
    "q99_dedup_keep_best" -> dedupKeepBestSql,
    "q88_quality_topp" ->
      (s"""WITH t AS (
         | SELECT doc_id, lang,
         |  CAST(len(list_filter($tokensSql, t -> list_contains($stopList, t))) AS DOUBLE)
         |    / greatest(len($tokensSql), 1) AS swr,
         |  length(regexp_replace(text, '[^.,;:!?''"()-]', '', 'g'))
         |    / CAST(greatest(length(text), 1) AS DOUBLE) AS pr,
         |  text
         | FROM documents),
         |scored AS (
         | SELECT doc_id, lang,
         |  round(least(length(text) / 500.0, 1.0) * 0.5 +
         |   (CASE WHEN round(pr, 4) < 0.2 THEN 1.0 ELSE 0.5 END) * 0.25 +
         |   (CASE WHEN round(swr, 4) > 0.01 THEN 1.0 ELSE 0.6 END) * 0.25, 4) AS quality
         | FROM t),
         |r AS (
         | SELECT doc_id, lang, quality,
         |  CAST(row_number() OVER (PARTITION BY lang ORDER BY quality DESC, doc_id) AS BIGINT) AS rk,
         |  count(*) OVER (PARTITION BY lang) AS n_lang
         | FROM scored)
         |SELECT doc_id, lang, quality, rk FROM r WHERE rk <= ceil(n_lang * 0.2)""").stripMargin,
    "q89_vocab_stats" ->
      (s"""WITH tok AS (
         |  SELECT lang, unnest($tokensSql) AS tok FROM documents),
         |tf AS (
         |  SELECT lang, tok, count(*) AS tf FROM tok WHERE tok <> '' GROUP BY 1, 2),
         |vocab AS (
         |  SELECT lang, CAST(count(*) AS BIGINT) AS n_types,
         |    CAST(sum(tf) AS BIGINT) AS n_tokens, CAST(max(tf) AS BIGINT) AS max_tf
         |  FROM tf GROUP BY lang),
         |d AS (SELECT lang, count(*) AS n_docs FROM documents GROUP BY lang)
         |SELECT d.lang, d.n_docs, vocab.n_tokens, vocab.n_types, vocab.max_tf,
         |  round(vocab.n_types / CAST(vocab.n_tokens AS DOUBLE), 6) AS type_token_ratio
         |FROM vocab JOIN d ON vocab.lang = d.lang""").stripMargin,
    "q90_dedup_e2e" -> dedupE2eSql,
    "q91_token_budget" ->
      (s"""WITH t AS (
         | SELECT doc_id,
         |  CAST(len(list_filter($tokensSql, t -> list_contains($stopList, t))) AS DOUBLE)
         |    / greatest(len($tokensSql), 1) AS swr,
         |  length(regexp_replace(text, '[^.,;:!?''"()-]', '', 'g'))
         |    / CAST(greatest(length(text), 1) AS DOUBLE) AS pr,
         |  CAST(CASE WHEN length(trim(text)) = 0 THEN 0 ELSE len($tokensSql) END AS BIGINT) AS n_tokens,
         |  text
         | FROM documents),
         |scored AS (
         | SELECT doc_id, n_tokens,
         |  round(least(length(text) / 500.0, 1.0) * 0.5 +
         |   (CASE WHEN round(pr, 4) < 0.2 THEN 1.0 ELSE 0.5 END) * 0.25 +
         |   (CASE WHEN round(swr, 4) > 0.01 THEN 1.0 ELSE 0.6 END) * 0.25, 4) AS quality
         | FROM t),
         |r AS (
         | SELECT doc_id, quality, n_tokens,
         |  CAST(sum(n_tokens) OVER (ORDER BY quality DESC, doc_id
         |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS running_tokens
         | FROM scored)
         |SELECT doc_id, quality, n_tokens, running_tokens
         |FROM r WHERE running_tokens <= 20000""").stripMargin,
    "q92_interleave" ->
      ("""WITH h AS (
         |  SELECT doc_id, lang, md5(CAST(doc_id AS VARCHAR)) AS h FROM documents),
         |r AS (
         |  SELECT doc_id, lang,
         |    CAST(row_number() OVER (PARTITION BY lang ORDER BY h, doc_id) AS BIGINT) AS rk
         |  FROM h)
         |SELECT doc_id, lang, rk,
         |  CAST(row_number() OVER (ORDER BY rk, lang, doc_id) AS BIGINT) AS pos
         |FROM r""").stripMargin,
    "q93_vocab_coverage" ->
      (s"""WITH tok AS (
         |  SELECT unnest($tokensSql) AS tok FROM documents),
         |tf AS (
         |  SELECT tok, count(*) AS tf FROM tok WHERE tok <> '' GROUP BY tok),
         |r AS (
         |  SELECT tok, tf,
         |    CAST(row_number() OVER (ORDER BY tf DESC, tok) AS BIGINT) AS k,
         |    CAST(sum(tf) OVER (ORDER BY tf DESC, tok
         |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tf
         |  FROM tf),
         |t AS (SELECT CAST(sum(tf) AS BIGINT) AS total_tf FROM tf)
         |SELECT k, cum_tf, round(cum_tf / CAST(total_tf AS DOUBLE), 6) AS coverage
         |FROM r, t WHERE k IN (5, 10, 20)""").stripMargin,
    "q94_session_sequences" ->
      ("""WITH s AS (
         |  SELECT user_id, event_id, event_type, epoch_us(ts) AS us,
         |    lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_us
         |  FROM events),
         |t AS (
         |  SELECT *, CASE WHEN prev_us IS NULL OR us - prev_us > 1800 * 1000000
         |                 THEN 1 ELSE 0 END AS new_s
         |  FROM s),
         |u AS (
         |  SELECT *, CAST(sum(new_s) OVER (PARTITION BY user_id ORDER BY us, event_id
         |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
         |  FROM t)
         |SELECT user_id, session_id, CAST(count(*) AS BIGINT) AS n_events,
         |  CAST(min(us) AS BIGINT) AS start_us,
         |  CAST(max(us) - min(us) AS BIGINT) AS span_us,
         |  string_agg(event_type, '>' ORDER BY us, event_id) AS path
         |FROM u GROUP BY user_id, session_id""").stripMargin,
    "q95_retention" ->
      ("""WITH f AS (
         |  SELECT user_id, min(CAST(ts AS DATE)) AS cohort_day
         |  FROM events GROUP BY user_id),
         |a AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events)
         |SELECT f.cohort_day,
         |  CAST(date_diff('day', f.cohort_day, a.day) AS BIGINT) AS day_offset,
         |  CAST(count(*) AS BIGINT) AS n_users
         |FROM a JOIN f ON a.user_id = f.user_id
         |GROUP BY 1, 2""").stripMargin,
    "q96_hard_negatives" ->
      ("""WITH v AS (
         |  SELECT vec_id, label, unnest(embedding) AS x,
         |         generate_subscripts(embedding, 1) AS i
         |  FROM embeddings),
         |nrm AS (
         |  SELECT vec_id, any_value(label) AS label,
         |         sqrt(sum(CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) AS n
         |  FROM v GROUP BY vec_id),
         |dp AS (
         |  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         |         sum(CAST(a.x AS DOUBLE) * CAST(b.x AS DOUBLE)) AS d
         |  FROM v a JOIN v b ON a.i = b.i
         |    AND a.vec_id <> b.vec_id AND a.label <> b.label
         |  GROUP BY 1, 2),
         |sc AS (
         |  SELECT id_a, na.label AS label_a, id_b, nb.label AS label_b,
         |         round(d / (na.n * nb.n), 6) AS cosine
         |  FROM dp JOIN nrm na ON na.vec_id = id_a JOIN nrm nb ON nb.vec_id = id_b
         |  WHERE na.n > 0 AND nb.n > 0),
         |r AS (
         |  SELECT id_a, label_a, id_b, label_b, cosine,
         |         row_number() OVER (PARTITION BY id_a ORDER BY cosine DESC, id_b) AS rank
         |  FROM sc)
         |SELECT id_a, label_a, id_b, label_b, cosine, CAST(rank AS INTEGER) AS rank
         |FROM r WHERE rank <= 3""").stripMargin,
    "q97_rolling_counts" ->
      ("""SELECT event_id, user_id, CAST(epoch_us(ts) AS BIGINT) AS us,
         |  CAST(count(*) OVER (PARTITION BY user_id ORDER BY epoch_us(ts)
         |    RANGE BETWEEN 86400000000 PRECEDING AND CURRENT ROW) AS BIGINT) AS n_24h
         |FROM events""").stripMargin,
    "q98_funnel" ->
      ("""WITH s1 AS (
         |  SELECT user_id, CAST(min(epoch_us(ts)) AS BIGINT) AS signup_us
         |  FROM events WHERE event_type = 'signup' GROUP BY user_id),
         |v AS (
         |  SELECT user_id, CAST(epoch_us(ts) AS BIGINT) AS v_us
         |  FROM events WHERE event_type = 'view'),
         |s2 AS (
         |  SELECT s1.user_id, s1.signup_us, CAST(min(v.v_us) AS BIGINT) AS view_us
         |  FROM s1 JOIN v ON s1.user_id = v.user_id AND v.v_us >= s1.signup_us
         |  GROUP BY s1.user_id, s1.signup_us),
         |p AS (
         |  SELECT user_id, CAST(epoch_us(ts) AS BIGINT) AS p_us
         |  FROM events WHERE event_type = 'purchase'),
         |s3 AS (
         |  SELECT s2.user_id, CAST(min(p.p_us) AS BIGINT) AS purchase_us
         |  FROM s2 JOIN p ON s2.user_id = p.user_id AND p.p_us >= s2.view_us
         |  GROUP BY s2.user_id)
         |SELECT s1.user_id, s1.signup_us, s2.view_us, s3.purchase_us
         |FROM s1
         |LEFT JOIN s2 ON s1.user_id = s2.user_id
         |LEFT JOIN s3 ON s1.user_id = s3.user_id""").stripMargin,
    "q102_quality_pct" ->
      (s"""WITH t AS (
         | SELECT doc_id, lang,
         |  CAST(len(list_filter($tokensSql, t -> list_contains($stopList, t))) AS DOUBLE)
         |    / greatest(len($tokensSql), 1) AS swr,
         |  length(regexp_replace(text, '[^.,;:!?''"()-]', '', 'g'))
         |    / CAST(greatest(length(text), 1) AS DOUBLE) AS pr,
         |  text
         | FROM documents),
         |scored AS (
         | SELECT doc_id, lang,
         |  round(least(length(text) / 500.0, 1.0) * 0.5 +
         |   (CASE WHEN round(pr, 4) < 0.2 THEN 1.0 ELSE 0.5 END) * 0.25 +
         |   (CASE WHEN round(swr, 4) > 0.01 THEN 1.0 ELSE 0.6 END) * 0.25, 4) AS quality
         | FROM t)
         |SELECT doc_id, lang, quality,
         |  round(CAST(row_number() OVER (PARTITION BY lang ORDER BY quality DESC, doc_id) AS DOUBLE)
         |    / count(*) OVER (PARTITION BY lang), 6) AS pct
         |FROM scored""").stripMargin,
    "q103_source_cap" ->
      (s"""WITH t AS (
         | SELECT doc_id, source,
         |  CAST(len(list_filter($tokensSql, t -> list_contains($stopList, t))) AS DOUBLE)
         |    / greatest(len($tokensSql), 1) AS swr,
         |  length(regexp_replace(text, '[^.,;:!?''"()-]', '', 'g'))
         |    / CAST(greatest(length(text), 1) AS DOUBLE) AS pr,
         |  text
         | FROM documents),
         |scored AS (
         | SELECT doc_id, source,
         |  round(least(length(text) / 500.0, 1.0) * 0.5 +
         |   (CASE WHEN round(pr, 4) < 0.2 THEN 1.0 ELSE 0.5 END) * 0.25 +
         |   (CASE WHEN round(swr, 4) > 0.01 THEN 1.0 ELSE 0.6 END) * 0.25, 4) AS quality
         | FROM t)
         |SELECT doc_id, source, quality,
         |  CAST(row_number() OVER (PARTITION BY source ORDER BY quality DESC, doc_id) AS BIGINT) AS rk
         |FROM scored
         |QUALIFY rk <= 8""").stripMargin,
    "q106_source_token_budget" ->
      (s"""WITH t AS (
         | SELECT doc_id, source,
         |  CAST(len(list_filter($tokensSql, t -> list_contains($stopList, t))) AS DOUBLE)
         |    / greatest(len($tokensSql), 1) AS swr,
         |  length(regexp_replace(text, '[^.,;:!?''"()-]', '', 'g'))
         |    / CAST(greatest(length(text), 1) AS DOUBLE) AS pr,
         |  CAST(CASE WHEN length(trim(text)) = 0 THEN 0 ELSE len($tokensSql) END AS BIGINT) AS n_tokens,
         |  text
         | FROM documents),
         |scored AS (
         | SELECT doc_id, source, n_tokens,
         |  round(least(length(text) / 500.0, 1.0) * 0.5 +
         |   (CASE WHEN round(pr, 4) < 0.2 THEN 1.0 ELSE 0.5 END) * 0.25 +
         |   (CASE WHEN round(swr, 4) > 0.01 THEN 1.0 ELSE 0.6 END) * 0.25, 4) AS quality
         | FROM t),
         |r AS (
         | SELECT doc_id, source, quality, n_tokens,
         |  CAST(sum(n_tokens) OVER (PARTITION BY source
         |    ORDER BY quality DESC, doc_id
         |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS running_tokens
         | FROM scored)
         |SELECT doc_id, source, quality, n_tokens, running_tokens
         |FROM r WHERE running_tokens <= 1500""").stripMargin,
    "q111_calibration" ->
      (s"""${logisticCtes(40, 5.0, LogisticLangFeatures, langIdEnLabelSql)}
         |SELECT CAST(least(floor(p_en * 10), 9) AS BIGINT) AS bucket,
         |  CAST(count(*) AS BIGINT) AS n,
         |  round(avg(p_en), 6) AS mean_p,
         |  round(avg(y), 6) AS obs_rate
         |FROM scored GROUP BY 1""").stripMargin,
    "q109_substring_search" ->
      ("""SELECT doc_id, CAST(strpos(text, 'slow fast table') AS BIGINT) AS pos
         |FROM documents WHERE strpos(text, 'slow fast table') > 0""").stripMargin,
    "q110_cross_source_dups" ->
      (s"""$minhashCtes,
         |pairs AS (
         |$minhashPairSelect)
         |SELECT least(a.source, b.source) AS src_lo,
         |  greatest(a.source, b.source) AS src_hi,
         |  CAST(count(*) AS BIGINT) AS n_pairs,
         |  round(avg(est_jaccard), 6) AS avg_sim
         |FROM pairs
         |JOIN documents a ON pairs.id_a = a.doc_id
         |JOIN documents b ON pairs.id_b = b.doc_id
         |GROUP BY 1, 2""").stripMargin,
    "q107_quality_classifier" -> logisticSql,
    "q108_auc" ->
      (s"""WITH t AS (
         | SELECT lang,
         |  CAST(len(list_filter($tokensSql, t -> list_contains($stopList, t))) AS DOUBLE)
         |    / greatest(len($tokensSql), 1) AS swr,
         |  length(regexp_replace(text, '[^.,;:!?''"()-]', '', 'g'))
         |    / CAST(greatest(length(text), 1) AS DOUBLE) AS pr,
         |  text
         | FROM documents),
         |f AS (
         | SELECT CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y,
         |  round(least(length(text) / 500.0, 1.0) * 0.5 +
         |   (CASE WHEN round(pr, 4) < 0.2 THEN 1.0 ELSE 0.5 END) * 0.25 +
         |   (CASE WHEN round(swr, 4) > 0.01 THEN 1.0 ELSE 0.6 END) * 0.25, 4) AS score
         | FROM t),
         |g AS (
         | SELECT score, CAST(sum(y) AS BIGINT) AS pos,
         |   CAST(sum(1 - y) AS BIGINT) AS neg
         | FROM f GROUP BY score),
         |c AS (
         | SELECT score, pos, neg,
         |  CAST(sum(neg) OVER (ORDER BY score ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cumneg
         | FROM g),
         |tot AS (
         | SELECT CAST(sum(pos) AS BIGINT) AS n_pos, CAST(sum(neg) AS BIGINT) AS n_neg
         | FROM g)
         |SELECT round(sum(pos * (2 * (cumneg - neg) + neg)) / (2.0 * n_pos * n_neg), 6) AS auc,
         |  n_pos, n_neg
         |FROM c CROSS JOIN tot GROUP BY n_pos, n_neg""").stripMargin,
    "q104_dsir_weights" ->
      (s"""WITH tok AS (
         |  SELECT doc_id, lang, unnest($tokensSql) AS tok FROM documents),
         |tok2 AS (SELECT * FROM tok WHERE tok <> ''),
         |doc_tf AS (
         |  SELECT doc_id, lang, tok, count(*) AS tf FROM tok2 GROUP BY 1, 2, 3),
         |stats AS (
         |  SELECT tok, count(*) AS b_cnt,
         |    sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS t_cnt
         |  FROM tok2 GROUP BY tok),
         |tot AS (
         |  SELECT sum(b_cnt) AS b_total, sum(t_cnt) AS t_total,
         |    count(*) AS vocab FROM stats)
         |SELECT doc_id, lang,
         |  round(sum(tf * (ln((t_cnt + 1.0) / (t_total + vocab))
         |    - ln((b_cnt + 1.0) / (b_total + vocab)))), 6) AS dsir_weight
         |FROM doc_tf JOIN stats USING (tok) CROSS JOIN tot
         |GROUP BY doc_id, lang""").stripMargin,
    "q105_split_leakage" ->
      (s"""$minhashCtes,
         |pairs AS (
         |$minhashPairSelect),
         |labeled AS (
         |  SELECT id_a, id_b,
         |    CASE WHEN md5(CAST(id_a AS VARCHAR)) < 'cc' THEN 'train'
         |         WHEN md5(CAST(id_a AS VARCHAR)) < 'e6' THEN 'val'
         |         ELSE 'test' END AS split_a,
         |    CASE WHEN md5(CAST(id_b AS VARCHAR)) < 'cc' THEN 'train'
         |         WHEN md5(CAST(id_b AS VARCHAR)) < 'e6' THEN 'val'
         |         ELSE 'test' END AS split_b,
         |    est_jaccard
         |  FROM pairs)
         |SELECT * FROM labeled WHERE split_a <> split_b""").stripMargin,
    "q22_simhash_pairs" -> simhashPairsSql,
    "q54_minhash_portable" -> minhashPairsSql,
    "q87_incremental_dedup" -> incrementalDedupSql,
    "q69_hyperplane_portable" -> hyperplanePairsSql,
    "q71_repeated_windows" ->
      ("""WITH t AS (
         |  SELECT doc_id, text AS s FROM documents WHERE length(text) >= 20),
         |w AS (
         |  SELECT doc_id, substring(s, i, 20) AS w
         |  FROM (SELECT doc_id, s, unnest(range(1, length(s) - 18, 5)) AS i FROM t)),
         |dup AS (
         |  SELECT w FROM w GROUP BY w HAVING count(*) >= 2),
         |d AS (
         |  SELECT w.doc_id, count(*) AS n_dup
         |  FROM w JOIN dup ON w.w = dup.w GROUP BY w.doc_id)
         |SELECT t.doc_id,
         |  CAST(floor((length(t.s) - 20) / 5) + 1 AS BIGINT) AS n_windows,
         |  CAST(coalesce(d.n_dup, 0) AS BIGINT) AS n_dup,
         |  round(CAST(coalesce(d.n_dup, 0) AS DOUBLE)
         |    / (floor((length(t.s) - 20) / 5) + 1), 4) AS dup_ratio
         |FROM t LEFT JOIN d ON t.doc_id = d.doc_id""").stripMargin,
    "q75_dedup_spans" ->
      ("""WITH t AS (
         |  SELECT doc_id, text AS s FROM documents WHERE length(text) >= 20),
         |w AS (
         |  SELECT doc_id, i AS s0, i + 19 AS e0, substring(s, i, 20) AS win
         |  FROM (SELECT doc_id, s, unnest(range(1, length(s) - 18, 5)) AS i FROM t)),
         |f AS (SELECT win FROM w GROUP BY win HAVING count(*) >= 2),
         |d AS (SELECT w.doc_id, w.s0, w.e0 FROM w JOIN f ON w.win = f.win),
         |m AS (
         |  SELECT doc_id, s0, e0,
         |    CASE WHEN max(e0) OVER (PARTITION BY doc_id ORDER BY s0
         |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
         |      OR s0 > max(e0) OVER (PARTITION BY doc_id ORDER BY s0
         |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
         |    THEN 1 ELSE 0 END AS isnew
         |  FROM d),
         |g AS (
         |  SELECT doc_id, s0, e0,
         |    sum(isnew) OVER (PARTITION BY doc_id ORDER BY s0
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp
         |  FROM m),
         |isl AS (
         |  SELECT doc_id, grp, min(s0) AS ms, max(e0) AS me
         |  FROM g GROUP BY doc_id, grp),
         |agg AS (
         |  SELECT doc_id, count(*) AS n_spans, sum(me - ms + 1) AS removed
         |  FROM isl GROUP BY doc_id)
         |SELECT t.doc_id, CAST(length(t.s) AS BIGINT) AS n_chars,
         |  CAST(coalesce(a.n_spans, 0) AS BIGINT) AS n_spans,
         |  CAST(coalesce(a.removed, 0) AS BIGINT) AS removed_chars,
         |  round((length(t.s) - coalesce(a.removed, 0))
         |    / CAST(length(t.s) AS DOUBLE), 4) AS kept_ratio
         |FROM t LEFT JOIN agg a ON t.doc_id = a.doc_id""").stripMargin,
    "q77_dedup_span_removal" ->
      ("""WITH t AS (SELECT doc_id, text AS s FROM documents),
         |te AS (SELECT doc_id, s FROM t WHERE length(s) >= 20),
         |w AS (
         |  SELECT doc_id, i AS s0, i + 19 AS e0, substring(s, i, 20) AS win
         |  FROM (SELECT doc_id, s, unnest(range(1, length(s) - 18, 5)) AS i FROM te)),
         |f AS (SELECT win FROM w GROUP BY win HAVING count(*) >= 2),
         |d AS (SELECT w.doc_id, w.s0, w.e0 FROM w JOIN f ON w.win = f.win),
         |m AS (
         |  SELECT doc_id, s0, e0,
         |    CASE WHEN max(e0) OVER (PARTITION BY doc_id ORDER BY s0
         |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
         |      OR s0 > max(e0) OVER (PARTITION BY doc_id ORDER BY s0
         |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
         |    THEN 1 ELSE 0 END AS isnew
         |  FROM d),
         |g AS (
         |  SELECT doc_id, s0, e0,
         |    sum(isnew) OVER (PARTITION BY doc_id ORDER BY s0
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp
         |  FROM m),
         |isl AS (
         |  SELECT doc_id, grp, min(s0) AS ms, max(e0) AS me
         |  FROM g GROUP BY doc_id, grp),
         |segs AS (
         |  SELECT doc_id,
         |    coalesce(lag(me) OVER (PARTITION BY doc_id ORDER BY ms), 0) + 1 AS ks,
         |    ms - 1 AS ke, ms AS ord
         |  FROM isl
         |  UNION ALL
         |  SELECT doc_id, max(me) + 1 AS ks, 2147483647 AS ke, 2147483647 AS ord
         |  FROM isl GROUP BY doc_id),
         |clean AS (
         |  SELECT segs.doc_id,
         |    string_agg(substring(te.s, ks,
         |      greatest(least(ke, length(te.s)) - ks + 1, 0)), '' ORDER BY ord) AS ct
         |  FROM segs JOIN te ON segs.doc_id = te.doc_id
         |  GROUP BY segs.doc_id)
         |SELECT t.doc_id, CASE WHEN c.ct IS NULL THEN t.s ELSE c.ct END AS clean_text
         |FROM t LEFT JOIN clean c ON t.doc_id = c.doc_id""").stripMargin,
    "q86_remove_spans_winnow" ->
      ("""WITH t AS (SELECT doc_id, text AS s FROM documents),
         |te AS (SELECT doc_id, s FROM t WHERE length(s) >= 20),
         |h AS (
         |  SELECT doc_id, s, length(s) - 19 AS n,
         |    list_transform(range(1, length(s) - 19 + 1),
         |      i -> CAST(('0x' || substring(md5(substring(s, i, 20)), 1, 8)) AS BIGINT)) AS hs
         |  FROM te),
         |sel AS (
         |  SELECT doc_id, s,
         |    unnest(list_distinct(list_transform(range(1, greatest(n - 4, 1) + 1),
         |      j -> j + list_position(hs[j:j+4], list_min(hs[j:j+4])) - 1))) AS i
         |  FROM h),
         |w AS (
         |  SELECT doc_id, i AS s0, i + 19 AS e0, substring(s, i, 20) AS win FROM sel),
         |f AS (SELECT win FROM w GROUP BY win HAVING count(*) >= 2),
         |d AS (SELECT w.doc_id, w.s0, w.e0 FROM w JOIN f ON w.win = f.win),
         |m AS (
         |  SELECT doc_id, s0, e0,
         |    CASE WHEN max(e0) OVER (PARTITION BY doc_id ORDER BY s0
         |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
         |      OR s0 > max(e0) OVER (PARTITION BY doc_id ORDER BY s0
         |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
         |    THEN 1 ELSE 0 END AS isnew
         |  FROM d),
         |g AS (
         |  SELECT doc_id, s0, e0,
         |    sum(isnew) OVER (PARTITION BY doc_id ORDER BY s0
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp
         |  FROM m),
         |isl AS (
         |  SELECT doc_id, grp, min(s0) AS ms, max(e0) AS me
         |  FROM g GROUP BY doc_id, grp),
         |segs AS (
         |  SELECT doc_id,
         |    coalesce(lag(me) OVER (PARTITION BY doc_id ORDER BY ms), 0) + 1 AS ks,
         |    ms - 1 AS ke, ms AS ord
         |  FROM isl
         |  UNION ALL
         |  SELECT doc_id, max(me) + 1 AS ks, 2147483647 AS ke, 2147483647 AS ord
         |  FROM isl GROUP BY doc_id),
         |clean AS (
         |  SELECT segs.doc_id,
         |    string_agg(substring(te.s, ks,
         |      greatest(least(ke, length(te.s)) - ks + 1, 0)), '' ORDER BY ord) AS ct
         |  FROM segs JOIN te ON segs.doc_id = te.doc_id
         |  GROUP BY segs.doc_id)
         |SELECT t.doc_id, CASE WHEN c.ct IS NULL THEN t.s ELSE c.ct END AS clean_text
         |FROM t LEFT JOIN clean c ON t.doc_id = c.doc_id""").stripMargin,
    "q82_dedup_spans_winnow" ->
      ("""WITH t AS (
         |  SELECT doc_id, text AS s FROM documents WHERE length(text) >= 20),
         |h AS (
         |  SELECT doc_id, s, length(s) - 19 AS n,
         |    list_transform(range(1, length(s) - 19 + 1),
         |      i -> CAST(('0x' || substring(md5(substring(s, i, 20)), 1, 8)) AS BIGINT)) AS hs
         |  FROM t),
         |sel AS (
         |  SELECT doc_id, s,
         |    unnest(list_distinct(list_transform(range(1, greatest(n - 4, 1) + 1),
         |      j -> j + list_position(hs[j:j+4], list_min(hs[j:j+4])) - 1))) AS i
         |  FROM h),
         |w AS (
         |  SELECT doc_id, i AS s0, i + 19 AS e0, substring(s, i, 20) AS win FROM sel),
         |f AS (SELECT win FROM w GROUP BY win HAVING count(*) >= 2),
         |d AS (SELECT w.doc_id, w.s0, w.e0 FROM w JOIN f ON w.win = f.win),
         |m AS (
         |  SELECT doc_id, s0, e0,
         |    CASE WHEN max(e0) OVER (PARTITION BY doc_id ORDER BY s0
         |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
         |      OR s0 > max(e0) OVER (PARTITION BY doc_id ORDER BY s0
         |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
         |    THEN 1 ELSE 0 END AS isnew
         |  FROM d),
         |g AS (
         |  SELECT doc_id, s0, e0,
         |    sum(isnew) OVER (PARTITION BY doc_id ORDER BY s0
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp
         |  FROM m),
         |isl AS (
         |  SELECT doc_id, grp, min(s0) AS ms, max(e0) AS me
         |  FROM g GROUP BY doc_id, grp),
         |agg AS (
         |  SELECT doc_id, count(*) AS n_spans, sum(me - ms + 1) AS removed
         |  FROM isl GROUP BY doc_id)
         |SELECT t.doc_id, CAST(length(t.s) AS BIGINT) AS n_chars,
         |  CAST(coalesce(a.n_spans, 0) AS BIGINT) AS n_spans,
         |  CAST(coalesce(a.removed, 0) AS BIGINT) AS removed_chars,
         |  round((length(t.s) - coalesce(a.removed, 0))
         |    / CAST(length(t.s) AS DOUBLE), 4) AS kept_ratio
         |FROM t LEFT JOIN agg a ON t.doc_id = a.doc_id""").stripMargin,
    "q84_decontaminate_winnow" ->
      ("""WITH tr AS (
         |  SELECT doc_id, text AS s FROM documents
         |  WHERE doc_id >= 25 AND length(text) >= 20),
         |ev AS (
         |  SELECT doc_id, text AS s FROM documents
         |  WHERE doc_id < 25 AND length(text) >= 20),
         |th AS (
         |  SELECT doc_id, s, length(s) - 19 AS n,
         |    list_transform(range(1, length(s) - 19 + 1),
         |      i -> CAST(('0x' || substring(md5(substring(s, i, 20)), 1, 8)) AS BIGINT)) AS hs
         |  FROM tr),
         |tsel AS (
         |  SELECT doc_id, s,
         |    unnest(list_distinct(list_transform(range(1, greatest(n - 4, 1) + 1),
         |      j -> j + list_position(hs[j:j+4], list_min(hs[j:j+4])) - 1))) AS i
         |  FROM th),
         |tw AS (
         |  SELECT doc_id, i AS s0, i + 19 AS e0, substring(s, i, 20) AS win FROM tsel),
         |eh AS (
         |  SELECT s, length(s) - 19 AS n,
         |    list_transform(range(1, length(s) - 19 + 1),
         |      i -> CAST(('0x' || substring(md5(substring(s, i, 20)), 1, 8)) AS BIGINT)) AS hs
         |  FROM ev),
         |esel AS (
         |  SELECT s,
         |    unnest(list_distinct(list_transform(range(1, greatest(n - 4, 1) + 1),
         |      j -> j + list_position(hs[j:j+4], list_min(hs[j:j+4])) - 1))) AS i
         |  FROM eh),
         |ew AS (SELECT DISTINCT substring(s, i, 20) AS win FROM esel),
         |d AS (SELECT tw.doc_id, tw.s0, tw.e0 FROM tw JOIN ew ON tw.win = ew.win),
         |m AS (
         |  SELECT doc_id, s0, e0,
         |    CASE WHEN max(e0) OVER (PARTITION BY doc_id ORDER BY s0
         |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
         |      OR s0 > max(e0) OVER (PARTITION BY doc_id ORDER BY s0
         |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
         |    THEN 1 ELSE 0 END AS isnew
         |  FROM d),
         |g AS (
         |  SELECT doc_id, s0, e0,
         |    sum(isnew) OVER (PARTITION BY doc_id ORDER BY s0
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp
         |  FROM m),
         |isl AS (
         |  SELECT doc_id, grp, min(s0) AS ms, max(e0) AS me
         |  FROM g GROUP BY doc_id, grp),
         |agg AS (
         |  SELECT doc_id, count(*) AS n_spans, sum(me - ms + 1) AS removed
         |  FROM isl GROUP BY doc_id)
         |SELECT tr.doc_id, CAST(length(tr.s) AS BIGINT) AS n_chars,
         |  CAST(coalesce(a.n_spans, 0) AS BIGINT) AS n_spans,
         |  CAST(coalesce(a.removed, 0) AS BIGINT) AS removed_chars,
         |  round((length(tr.s) - coalesce(a.removed, 0))
         |    / CAST(length(tr.s) AS DOUBLE), 4) AS kept_ratio
         |FROM tr LEFT JOIN agg a ON tr.doc_id = a.doc_id""").stripMargin,
    "q81_decontaminate_spans" ->
      ("""WITH tr AS (
         |  SELECT doc_id, text AS s FROM documents
         |  WHERE doc_id >= 25 AND length(text) >= 20),
         |ev AS (
         |  SELECT doc_id, text AS s FROM documents
         |  WHERE doc_id < 25 AND length(text) >= 20),
         |tw AS (
         |  SELECT doc_id, i AS s0, i + 19 AS e0, substring(s, i, 20) AS win
         |  FROM (SELECT doc_id, s, unnest(range(1, length(s) - 18)) AS i FROM tr)
         |  WHERE CAST(('0x' || substring(md5(substring(s, i, 20)), 1, 8)) AS BIGINT)
         |    % 5 = 0),
         |ew AS (
         |  SELECT DISTINCT substring(s, i, 20) AS win
         |  FROM (SELECT s, unnest(range(1, length(s) - 18)) AS i FROM ev)
         |  WHERE CAST(('0x' || substring(md5(substring(s, i, 20)), 1, 8)) AS BIGINT)
         |    % 5 = 0),
         |d AS (SELECT tw.doc_id, tw.s0, tw.e0 FROM tw JOIN ew ON tw.win = ew.win),
         |m AS (
         |  SELECT doc_id, s0, e0,
         |    CASE WHEN max(e0) OVER (PARTITION BY doc_id ORDER BY s0
         |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
         |      OR s0 > max(e0) OVER (PARTITION BY doc_id ORDER BY s0
         |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
         |    THEN 1 ELSE 0 END AS isnew
         |  FROM d),
         |g AS (
         |  SELECT doc_id, s0, e0,
         |    sum(isnew) OVER (PARTITION BY doc_id ORDER BY s0
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp
         |  FROM m),
         |isl AS (
         |  SELECT doc_id, grp, min(s0) AS ms, max(e0) AS me
         |  FROM g GROUP BY doc_id, grp),
         |agg AS (
         |  SELECT doc_id, count(*) AS n_spans, sum(me - ms + 1) AS removed
         |  FROM isl GROUP BY doc_id)
         |SELECT tr.doc_id, CAST(length(tr.s) AS BIGINT) AS n_chars,
         |  CAST(coalesce(a.n_spans, 0) AS BIGINT) AS n_spans,
         |  CAST(coalesce(a.removed, 0) AS BIGINT) AS removed_chars,
         |  round((length(tr.s) - coalesce(a.removed, 0))
         |    / CAST(length(tr.s) AS DOUBLE), 4) AS kept_ratio
         |FROM tr LEFT JOIN agg a ON tr.doc_id = a.doc_id""").stripMargin,
    "q80_dedup_spans_cdc" ->
      ("""WITH t AS (
         |  SELECT doc_id, text AS s FROM documents WHERE length(text) >= 20),
         |w AS (
         |  SELECT doc_id, i AS s0, i + 19 AS e0, substring(s, i, 20) AS win
         |  FROM (SELECT doc_id, s, unnest(range(1, length(s) - 18)) AS i FROM t)
         |  WHERE CAST(('0x' || substring(md5(substring(s, i, 20)), 1, 8)) AS BIGINT)
         |    % 5 = 0),
         |f AS (SELECT win FROM w GROUP BY win HAVING count(*) >= 2),
         |d AS (SELECT w.doc_id, w.s0, w.e0 FROM w JOIN f ON w.win = f.win),
         |m AS (
         |  SELECT doc_id, s0, e0,
         |    CASE WHEN max(e0) OVER (PARTITION BY doc_id ORDER BY s0
         |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
         |      OR s0 > max(e0) OVER (PARTITION BY doc_id ORDER BY s0
         |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
         |    THEN 1 ELSE 0 END AS isnew
         |  FROM d),
         |g AS (
         |  SELECT doc_id, s0, e0,
         |    sum(isnew) OVER (PARTITION BY doc_id ORDER BY s0
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp
         |  FROM m),
         |isl AS (
         |  SELECT doc_id, grp, min(s0) AS ms, max(e0) AS me
         |  FROM g GROUP BY doc_id, grp),
         |agg AS (
         |  SELECT doc_id, count(*) AS n_spans, sum(me - ms + 1) AS removed
         |  FROM isl GROUP BY doc_id)
         |SELECT t.doc_id, CAST(length(t.s) AS BIGINT) AS n_chars,
         |  CAST(coalesce(a.n_spans, 0) AS BIGINT) AS n_spans,
         |  CAST(coalesce(a.removed, 0) AS BIGINT) AS removed_chars,
         |  round((length(t.s) - coalesce(a.removed, 0))
         |    / CAST(length(t.s) AS DOUBLE), 4) AS kept_ratio
         |FROM t LEFT JOIN agg a ON t.doc_id = a.doc_id""").stripMargin,
    "q79_bigram_lm" ->
      (s"""WITH tk AS (
         |  SELECT doc_id, $tokensSql AS ts FROM documents),
         |big AS (
         |  SELECT doc_id, ts[i] AS w1, ts[i+1] AS w2
         |  FROM (SELECT doc_id, ts, unnest(range(1, len(ts))) AS i
         |        FROM tk WHERE len(ts) >= 2)),
         |c12 AS (SELECT w1, w2, count(*) AS c12 FROM big GROUP BY w1, w2),
         |c1 AS (SELECT w1, sum(c12) AS c1 FROM c12 GROUP BY w1)
         |SELECT big.doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
         |  round(avg(ln(CAST(c12.c12 AS DOUBLE) / c1.c1)), 4) AS avg_logp
         |FROM big JOIN c12 ON big.w1 = c12.w1 AND big.w2 = c12.w2
         |JOIN c1 ON big.w1 = c1.w1
         |GROUP BY big.doc_id""").stripMargin,
    "q78_clean_pipeline" ->
      ("""WITH t AS (
         |  SELECT doc_id, lang,
         |    regexp_replace(regexp_replace(regexp_replace(text,
         |      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '[PII]', 'g'),
         |      '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '[PII]', 'g'),
         |      '\+\d[\d -]{7,}\d', '[PII]', 'g') AS s
         |  FROM documents),
         |te AS (SELECT doc_id, s FROM t WHERE length(s) >= 20),
         |w AS (
         |  SELECT doc_id, i AS s0, i + 19 AS e0, substring(s, i, 20) AS win
         |  FROM (SELECT doc_id, s, unnest(range(1, length(s) - 18, 5)) AS i FROM te)),
         |f AS (SELECT win FROM w GROUP BY win HAVING count(*) >= 2),
         |d AS (SELECT w.doc_id, w.s0, w.e0 FROM w JOIN f ON w.win = f.win),
         |m AS (
         |  SELECT doc_id, s0, e0,
         |    CASE WHEN max(e0) OVER (PARTITION BY doc_id ORDER BY s0
         |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
         |      OR s0 > max(e0) OVER (PARTITION BY doc_id ORDER BY s0
         |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
         |    THEN 1 ELSE 0 END AS isnew
         |  FROM d),
         |g AS (
         |  SELECT doc_id, s0, e0,
         |    sum(isnew) OVER (PARTITION BY doc_id ORDER BY s0
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp
         |  FROM m),
         |isl AS (
         |  SELECT doc_id, grp, min(s0) AS ms, max(e0) AS me
         |  FROM g GROUP BY doc_id, grp),
         |segs AS (
         |  SELECT doc_id,
         |    coalesce(lag(me) OVER (PARTITION BY doc_id ORDER BY ms), 0) + 1 AS ks,
         |    ms - 1 AS ke, ms AS ord
         |  FROM isl
         |  UNION ALL
         |  SELECT doc_id, max(me) + 1 AS ks, 2147483647 AS ke, 2147483647 AS ord
         |  FROM isl GROUP BY doc_id),
         |cl AS (
         |  SELECT segs.doc_id,
         |    string_agg(substring(te.s, ks,
         |      greatest(least(ke, length(te.s)) - ks + 1, 0)), '' ORDER BY ord) AS ct
         |  FROM segs JOIN te ON segs.doc_id = te.doc_id
         |  GROUP BY segs.doc_id),
         |clean AS (
         |  SELECT t.doc_id, t.lang, t.s,
         |    CASE WHEN c.ct IS NULL THEN t.s ELSE c.ct END AS clean_text
         |  FROM t LEFT JOIN cl c ON t.doc_id = c.doc_id)
         |SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(length(s)) AS BIGINT) AS redacted_chars,
         |  CAST(sum(length(clean_text)) AS BIGINT) AS clean_chars
         |FROM clean GROUP BY lang ORDER BY lang""").stripMargin,
    "q76_top_ngrams" ->
      (s"""WITH tk AS (
         |  SELECT doc_id, $tokensSql AS ts FROM documents),
         |g AS (
         |  SELECT concat_ws(' ', ts[i], ts[i+1], ts[i+2]) AS ngram
         |  FROM (SELECT doc_id, ts,
         |          unnest(range(1, greatest(len(ts) - 2, 0) + 1)) AS i
         |        FROM tk))
         |SELECT ngram, CAST(count(*) AS BIGINT) AS freq
         |FROM g GROUP BY ngram ORDER BY freq DESC, ngram ASC LIMIT 20""").stripMargin,
    "q72_pii_scan" ->
      ("""SELECT doc_id,
         |  CAST(len(regexp_extract_all(text,
         |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_email,
         |  CAST(len(regexp_extract_all(text,
         |    '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS BIGINT) AS n_ipv4,
         |  CAST(len(regexp_extract_all(text,
         |    '\+\d[\d -]{7,}\d')) AS BIGINT) AS n_phone,
         |  CAST(length(regexp_replace(regexp_replace(regexp_replace(text,
         |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '[PII]', 'g'),
         |    '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '[PII]', 'g'),
         |    '\+\d[\d -]{7,}\d', '[PII]', 'g')) AS BIGINT) AS redacted_len
         |FROM documents""").stripMargin,
    "q73_ivf_portable" ->
      ("""WITH v AS (
         |  SELECT vec_id AS id, generate_subscripts(embedding, 1) AS dim,
         |    CAST(round(CAST(unnest(embedding) AS DOUBLE) * 1000000) AS BIGINT) AS xq,
         |    CAST(unnest(embedding) AS DOUBLE) AS x
         |  FROM embeddings),
         |nrm AS (SELECT id, sqrt(sum(x * x)) AS n FROM v GROUP BY id),
         |keep AS (SELECT id FROM nrm WHERE n > 0),
         |signs AS (
         |  SELECT c.c AS c, i.i AS dim,
         |    CASE WHEN CAST(('0x' || substring(
         |        md5('ivf-' || c.c || '-' || i.i), 1, 8)) AS BIGINT) % 2 = 0
         |      THEN 1 ELSE -1 END AS sgn
         |  FROM (SELECT unnest(range(0, 8)) AS c) c,
         |       (SELECT unnest(range(1, 65)) AS i) i),
         |dots AS (
         |  SELECT id, c, sum(sgn * xq) AS dot
         |  FROM v JOIN keep USING (id) JOIN signs USING (dim)
         |  GROUP BY id, c),
         |ranked AS (
         |  SELECT id, c,
         |    row_number() OVER (PARTITION BY id ORDER BY dot DESC, c ASC) AS rk
         |  FROM dots),
         |assigned AS (SELECT id, c FROM ranked WHERE rk = 1),
         |probed AS (SELECT c FROM ranked WHERE id = 0 AND rk <= 2),
         |cands AS (
         |  SELECT a.id FROM assigned a JOIN probed p ON a.c = p.c WHERE a.id <> 0),
         |dp AS (
         |  SELECT b.id AS vec_id, sum(q.x * b.x) AS d
         |  FROM v q JOIN v b ON q.dim = b.dim JOIN cands cd ON b.id = cd.id
         |  WHERE q.id = 0
         |  GROUP BY b.id)
         |SELECT vec_id, round(d / (nq.n * nb.n), 6) AS cosine
         |FROM dp
         |CROSS JOIN (SELECT n FROM nrm WHERE id = 0) nq
         |JOIN nrm nb ON nb.id = vec_id
         |ORDER BY cosine DESC, vec_id ASC
         |LIMIT 10""").stripMargin,
    "q83_semantic_dedup" ->
      ("""WITH v AS (
         |  SELECT vec_id AS id, generate_subscripts(embedding, 1) AS dim,
         |    CAST(round(CAST(unnest(embedding) AS DOUBLE) * 1000000) AS BIGINT) AS xq,
         |    CAST(unnest(embedding) AS DOUBLE) AS x
         |  FROM embeddings),
         |nrm AS (SELECT id, sqrt(sum(x * x)) AS n FROM v GROUP BY id),
         |keep AS (SELECT id FROM nrm WHERE n > 0),
         |signs AS (
         |  SELECT c.c AS c, i.i AS dim,
         |    CASE WHEN CAST(('0x' || substring(
         |        md5('ivf-' || c.c || '-' || i.i), 1, 8)) AS BIGINT) % 2 = 0
         |      THEN 1 ELSE -1 END AS sgn
         |  FROM (SELECT unnest(range(0, 8)) AS c) c,
         |       (SELECT unnest(range(1, 65)) AS i) i),
         |dots AS (
         |  SELECT id, c, sum(sgn * xq) AS dot
         |  FROM v JOIN keep USING (id) JOIN signs USING (dim)
         |  GROUP BY id, c),
         |assigned AS (
         |  SELECT id, c FROM (
         |    SELECT id, c,
         |      row_number() OVER (PARTITION BY id ORDER BY dot DESC, c ASC) AS rk
         |    FROM dots)
         |  WHERE rk = 1),
         |pairs AS (
         |  SELECT a.id AS ia, b.id AS ib
         |  FROM assigned a JOIN assigned b ON a.c = b.c AND a.id < b.id),
         |dp AS (
         |  SELECT p.ia, p.ib, sum(va.x * vb.x) AS d
         |  FROM pairs p
         |  JOIN v va ON va.id = p.ia
         |  JOIN v vb ON vb.id = p.ib AND vb.dim = va.dim
         |  GROUP BY p.ia, p.ib),
         |dropped AS (
         |  SELECT DISTINCT dp.ib AS id
         |  FROM dp
         |  JOIN nrm na ON na.id = dp.ia
         |  JOIN nrm nb ON nb.id = dp.ib
         |  WHERE round(d / (na.n * nb.n), 6) >= 0.45)
         |SELECT a.id AS vec_id, a.c AS cluster,
         |  CAST(CASE WHEN dr.id IS NULL THEN 1 ELSE 0 END AS BIGINT) AS kept
         |FROM assigned a LEFT JOIN dropped dr ON a.id = dr.id""").stripMargin,
    // q112: the hierarchical (two-level) assignment regime at nLists=128 —
    // B = ceil(sqrt(128)) = 12 cells per block, S = ceil(128/12) = 11
    // super-cells; super signs from md5('ivfs-g-i') parity, block membership
    // is integer division c // 12. Everything else matches q83.
    "q112_semantic_dedup_hier" ->
      ("""WITH v AS (
         |  SELECT vec_id AS id, generate_subscripts(embedding, 1) AS dim,
         |    CAST(round(CAST(unnest(embedding) AS DOUBLE) * 1000000) AS BIGINT) AS xq,
         |    CAST(unnest(embedding) AS DOUBLE) AS x
         |  FROM embeddings),
         |nrm AS (SELECT id, sqrt(sum(x * x)) AS n FROM v GROUP BY id),
         |keep AS (SELECT id FROM nrm WHERE n > 0),
         |ssigns AS (
         |  SELECT g.g AS g, i.i AS dim,
         |    CASE WHEN CAST(('0x' || substring(
         |        md5('ivfs-' || g.g || '-' || i.i), 1, 8)) AS BIGINT) % 2 = 0
         |      THEN 1 ELSE -1 END AS sgn
         |  FROM (SELECT unnest(range(0, 11)) AS g) g,
         |       (SELECT unnest(range(1, 65)) AS i) i),
         |gwin AS (
         |  SELECT id, g FROM (
         |    SELECT id, g,
         |      row_number() OVER (PARTITION BY id ORDER BY dot DESC, g ASC) AS rk
         |    FROM (
         |      SELECT id, g, sum(sgn * xq) AS dot
         |      FROM v JOIN keep USING (id) JOIN ssigns USING (dim)
         |      GROUP BY id, g))
         |  WHERE rk = 1),
         |csigns AS (
         |  SELECT c.c AS c, i.i AS dim,
         |    CASE WHEN CAST(('0x' || substring(
         |        md5('ivf-' || c.c || '-' || i.i), 1, 8)) AS BIGINT) % 2 = 0
         |      THEN 1 ELSE -1 END AS sgn
         |  FROM (SELECT unnest(range(0, 128)) AS c) c,
         |       (SELECT unnest(range(1, 65)) AS i) i),
         |assigned AS (
         |  SELECT id, c FROM (
         |    SELECT id, c,
         |      row_number() OVER (PARTITION BY id ORDER BY dot DESC, c ASC) AS rk
         |    FROM (
         |      SELECT v.id, s.c, sum(s.sgn * v.xq) AS dot
         |      FROM v JOIN gwin ON v.id = gwin.id
         |      JOIN csigns s ON s.dim = v.dim AND s.c // 12 = gwin.g
         |      GROUP BY v.id, s.c))
         |  WHERE rk = 1),
         |pairs AS (
         |  SELECT a.id AS ia, b.id AS ib
         |  FROM assigned a JOIN assigned b ON a.c = b.c AND a.id < b.id),
         |dp AS (
         |  SELECT p.ia, p.ib, sum(va.x * vb.x) AS d
         |  FROM pairs p
         |  JOIN v va ON va.id = p.ia
         |  JOIN v vb ON vb.id = p.ib AND vb.dim = va.dim
         |  GROUP BY p.ia, p.ib),
         |dropped AS (
         |  SELECT DISTINCT dp.ib AS id
         |  FROM dp
         |  JOIN nrm na ON na.id = dp.ia
         |  JOIN nrm nb ON nb.id = dp.ib
         |  WHERE round(d / (na.n * nb.n), 6) >= 0.45)
         |SELECT a.id AS vec_id, a.c AS cluster,
         |  CAST(CASE WHEN dr.id IS NULL THEN 1 ELSE 0 END AS BIGINT) AS kept
         |FROM assigned a LEFT JOIN dropped dr ON a.id = dr.id""").stripMargin,
    "q74_pq_portable" ->
      ("""WITH v AS (
         |  SELECT vec_id AS id, generate_subscripts(embedding, 1) AS dim,
         |    CAST(round(CAST(unnest(embedding) AS DOUBLE) * 1000000) AS BIGINT) AS xq
         |  FROM embeddings),
         |cb AS (
         |  SELECT s.s AS sub, c.c AS code, s.s * 8 + j.j AS dim,
         |    (CAST(('0x' || substring(
         |        md5('pq-' || s.s || '-' || c.c || '-' || j.j), 1, 8)) AS BIGINT)
         |      % 2001 - 1000) * 1000 AS cq
         |  FROM (SELECT unnest(range(0, 8)) AS s) s,
         |       (SELECT unnest(range(0, 16)) AS c) c,
         |       (SELECT unnest(range(1, 9)) AS j) j),
         |dists AS (
         |  SELECT id, sub, code, sum((xq - cq) * (xq - cq)) AS d2
         |  FROM v JOIN cb USING (dim)
         |  GROUP BY id, sub, code),
         |codes AS (
         |  SELECT id, sub, code FROM (
         |    SELECT id, sub, code,
         |      row_number() OVER (PARTITION BY id, sub ORDER BY d2 ASC, code ASC) AS rk
         |    FROM dists)
         |  WHERE rk = 1),
         |qd AS (SELECT sub, code, d2 AS qd FROM dists WHERE id = 0)
         |SELECT c.id AS vec_id, CAST(sum(q.qd) AS BIGINT) AS adc
         |FROM codes c JOIN qd q ON c.sub = q.sub AND c.code = q.code
         |WHERE c.id <> 0
         |GROUP BY c.id
         |ORDER BY adc ASC, vec_id ASC
         |LIMIT 10""").stripMargin,
    // q114: the IVF+PQ k-NN JOIN end-to-end — q73's cell assignment (every
    // row also probed to its nprobe=2 best cells), q74's md5-lattice PQ
    // codes, exact-bigint ADC shortlist at kCand=20, rounded-cosine rescore
    // and (cosine desc, id asc) rank at k=5
    "q114_knn_join_ivfpq_portable" ->
      (ivfPqJoinCtes("") + """
         |SELECT id_a, id_b, cosine, CAST(rank AS BIGINT) AS rank
         |FROM (
         |  SELECT id_a, id_b, cosine,
         |    row_number() OVER (PARTITION BY id_a ORDER BY cosine DESC, id_b ASC) AS rank
         |  FROM sc)
         |WHERE rank <= 5""").stripMargin,
    // q118: q114's pipeline with a member ALLOW-LIST (id_b % 3 = 0) — the
    // filter sits between the rescored shortlist and the rank window, so
    // rank re-numbers over the allowed survivors (the native
    // KnnIndex.knnJoinDelta(restrict) decision order: shortlist and
    // rescore over all members, filter, then cut)
    "q118_knn_join_restricted" ->
      (ivfPqJoinCtes("") + """
         |SELECT id_a, id_b, cosine, CAST(rank AS BIGINT) AS rank
         |FROM (
         |  SELECT id_a, id_b, cosine,
         |    row_number() OVER (PARTITION BY id_a ORDER BY cosine DESC, id_b ASC) AS rank
         |  FROM sc WHERE id_b % 3 = 0)
         |WHERE rank <= 5""").stripMargin,
    // q119: recall@5 of the portable IVF+PQ join vs the exact brute force
    // — approx top-k from the q114 CTEs, exact top-k from the q55 shape
    // (rounded-cosine rank), per-anchor hits via one left join, and the
    // three summary figures each a single division (micro recall, tail
    // min, perfect fraction) so they replay bit-exactly
    "q119_ann_recall" ->
      (ivfPqJoinCtes("") + """,
         |appr AS (
         |  SELECT id_a, id_b FROM (
         |    SELECT id_a, id_b,
         |      row_number() OVER (PARTITION BY id_a ORDER BY cosine DESC, id_b ASC) AS rank
         |    FROM sc)
         |  WHERE rank <= 5),
         |edp AS (
         |  SELECT a.id AS id_a, b.id AS id_b, sum(a.x * b.x) AS d
         |  FROM v a JOIN keep ka ON ka.id = a.id
         |  JOIN v b ON b.dim = a.dim AND b.id <> a.id
         |  JOIN keep kb ON kb.id = b.id
         |  GROUP BY 1, 2),
         |ex AS (
         |  SELECT id_a, id_b FROM (
         |    SELECT id_a, id_b,
         |      row_number() OVER (PARTITION BY id_a
         |        ORDER BY round(d / (na.n * nb.n), 6) DESC, id_b ASC) AS rank
         |    FROM edp JOIN nrm na ON na.id = id_a JOIN nrm nb ON nb.id = id_b)
         |  WHERE rank <= 5),
         |per AS (
         |  SELECT e.id_a, count(*) AS total,
         |    sum(CASE WHEN a.id_b IS NOT NULL THEN 1 ELSE 0 END) AS hits
         |  FROM ex e LEFT JOIN appr a ON a.id_a = e.id_a AND a.id_b = e.id_b
         |  GROUP BY e.id_a)
         |SELECT CAST(count(*) AS BIGINT) AS n_anchors,
         |  round(CAST(sum(hits) AS DOUBLE) / sum(total), 6) AS recall_micro,
         |  round(min(CAST(hits AS DOUBLE) / total), 6) AS min_recall,
         |  round(CAST(sum(CASE WHEN hits = total THEN 1 ELSE 0 END) AS DOUBLE)
         |    / count(*), 6) AS perfect_frac
         |FROM per""").stripMargin,
    // q116: q114's pipeline with the probe side restricted to the NEW
    // batch (vec_id % 5 = 0) — members, cells, codes, ADC and rescore are
    // unchanged over the full union, so the one-line probe filter IS the
    // incremental semantics (|new|-driven candidates, old docs never pair
    // together)
    "q116_knn_join_incremental" ->
      (incrementalIvfPqCtes + """
         |SELECT id_a, id_b, cosine, CAST(rank AS BIGINT) AS rank
         |FROM (
         |  SELECT id_a, id_b, cosine,
         |    row_number() OVER (PARTITION BY id_a ORDER BY cosine DESC, id_b ASC) AS rank
         |  FROM sc)
         |WHERE rank <= 5""").stripMargin,
    // q117: the q116 shortlist pairs (rank cut removed — `sc` IS the full
    // rescored shortlist) folded by the q87 incremental-dedup rule: a new
    // doc is dropped when a shortlisted neighbor clears τ=0.45 and is
    // stored (min id → dup_of_old) or a lower-id same-batch arrival
    // (dup_of_new); τ=0.35 (non-trivial at sf0.01), -1 coalescing, every
    // new id exactly once
    "q117_semantic_dedup_delta" ->
      (incrementalIvfPqCtes + """,
         |newids AS (SELECT vec_id AS id FROM embeddings WHERE vec_id % 5 = 0),
         |oldq AS (
         |  SELECT id_a, min(id_b) AS min_old FROM sc
         |  WHERE cosine >= 0.35 AND id_b % 5 <> 0 GROUP BY id_a),
         |newq AS (
         |  SELECT id_a, min(id_b) AS min_new FROM sc
         |  WHERE cosine >= 0.35 AND id_b % 5 = 0 AND id_b < id_a GROUP BY id_a)
         |SELECT n.id AS vec_id,
         |  coalesce(o.min_old, -1) AS dup_of_old,
         |  coalesce(q.min_new, -1) AS dup_of_new,
         |  CAST(CASE WHEN o.min_old IS NULL AND q.min_new IS NULL
         |    THEN 1 ELSE 0 END AS BIGINT) AS kept
         |FROM newids n
         |LEFT JOIN oldq o ON o.id_a = n.id
         |LEFT JOIN newq q ON q.id_a = n.id""").stripMargin,
    // q120: hard-negative mining — q114's pipeline with same-label pairs
    // (labels = id % 16) excluded in the candidate CTE, BEFORE the kCand
    // ADC cut (the hardNegativesAnnCell decision order: the shortlist is
    // spent entirely on candidate negatives), then rescore + rank as q114
    "q120_hard_negatives_portable" ->
      (ivfPqJoinCtes("", " AND p.id % 16 <> a.id % 16") + """
         |SELECT id_a, id_a % 16 AS label_a, id_b, id_b % 16 AS label_b,
         |  cosine, CAST(rank AS BIGINT) AS rank
         |FROM (
         |  SELECT id_a, id_b, cosine,
         |    row_number() OVER (PARTITION BY id_a ORDER BY cosine DESC, id_b ASC) AS rank
         |  FROM sc)
         |WHERE rank <= 5""").stripMargin,
    // q121: delta hard-negative mining — q116's probe restriction composed
    // with q120's label-mismatch candidate gate, both on the q114 pipeline
    "q121_hard_negatives_incremental" ->
      (ivfPqJoinCtes(" AND id % 5 = 0", " AND p.id % 16 <> a.id % 16") + """
         |SELECT id_a, id_a % 16 AS label_a, id_b, id_b % 16 AS label_b,
         |  cosine, CAST(rank AS BIGINT) AS rank
         |FROM (
         |  SELECT id_a, id_b, cosine,
         |    row_number() OVER (PARTITION BY id_a ORDER BY cosine DESC, id_b ASC) AS rank
         |  FROM sc)
         |WHERE rank <= 5""").stripMargin,
    // q123: class-balanced mining — q120's gated shortlist re-ranked per
    // (anchor, foreign label), cut at k=2 within each class
    "q123_hard_negatives_balanced" ->
      (ivfPqJoinCtes("", " AND p.id % 16 <> a.id % 16") + """
         |SELECT id_a, id_a % 16 AS label_a, id_b, id_b % 16 AS label_b,
         |  cosine, CAST(rank AS BIGINT) AS rank
         |FROM (
         |  SELECT id_a, id_b, cosine,
         |    row_number() OVER (PARTITION BY id_a, id_b % 16
         |      ORDER BY cosine DESC, id_b ASC) AS rank
         |  FROM sc)
         |WHERE rank <= 2""").stripMargin,
    // q124: payload-predicate-filtered ANN — q114's pipeline with the
    // member's stored payload (id % 16) gating the rescored pairs at the
    // q118 restrict position (BEFORE the rank window, so rank re-numbers
    // over allowed survivors); the surviving payload rides out
    "q124_knn_join_payload_filtered" ->
      (ivfPqJoinCtes("") + """
         |SELECT id_a, id_b, id_b % 16 AS payload_b, cosine,
         |  CAST(rank AS BIGINT) AS rank
         |FROM (
         |  SELECT id_a, id_b, cosine,
         |    row_number() OVER (PARTITION BY id_a ORDER BY cosine DESC, id_b ASC) AS rank
         |  FROM sc WHERE id_b % 16 IN (1, 3, 5))
         |WHERE rank <= 5""").stripMargin,
    // q125: struct-payload predicate ANN — q124 generalized to a set +
    // range CONJUNCTION over two member attributes, same restrict
    // position (filter BEFORE the rank window), both attributes ride out
    "q125_knn_join_payload_where" ->
      (ivfPqJoinCtes("") + """
         |SELECT id_a, id_b, id_b % 16 AS payload_cls,
         |  round((id_b % 97) / 97.0, 6) AS payload_q, cosine,
         |  CAST(rank AS BIGINT) AS rank
         |FROM (
         |  SELECT id_a, id_b, cosine,
         |    row_number() OVER (PARTITION BY id_a ORDER BY cosine DESC, id_b ASC) AS rank
         |  FROM sc
         |  WHERE id_b % 16 IN (1, 3, 5, 7)
         |    AND round((id_b % 97) / 97.0, 6) > 0.25)
         |WHERE rank <= 5""").stripMargin,
    "q55_knn_brute" ->
      ("""WITH v AS (
         |  SELECT vec_id, unnest(embedding) AS x, generate_subscripts(embedding, 1) AS i
         |  FROM embeddings),
         |nrm AS (
         |  SELECT vec_id, sqrt(sum(CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) AS n
         |  FROM v GROUP BY vec_id),
         |dp AS (
         |  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         |         sum(CAST(a.x AS DOUBLE) * CAST(b.x AS DOUBLE)) AS d
         |  FROM v a JOIN v b ON a.i = b.i AND a.vec_id <> b.vec_id
         |  GROUP BY 1, 2),
         |sc AS (
         |  SELECT id_a, id_b, round(d / (na.n * nb.n), 6) AS cosine
         |  FROM dp JOIN nrm na ON na.vec_id = id_a JOIN nrm nb ON nb.vec_id = id_b
         |  WHERE na.n > 0 AND nb.n > 0),
         |r AS (
         |  SELECT id_a, id_b, cosine,
         |         row_number() OVER (PARTITION BY id_a ORDER BY cosine DESC, id_b) AS rank
         |  FROM sc)
         |SELECT id_a, id_b, cosine, CAST(rank AS BIGINT) AS rank
         |FROM r WHERE rank <= 5""").stripMargin,
    "q02_count_eq" ->
      "SELECT CAST(count(*) AS BIGINT) AS cnt FROM events WHERE event_type = 'click'",
    "q03_count_ts_range" ->
      ("SELECT CAST(count(*) AS BIGINT) AS cnt FROM events WHERE ts >= TIMESTAMP '2024-01-10 00:00:00' " +
        "AND ts <= TIMESTAMP '2024-01-20 00:00:00'"),
    "q04_count_like" ->
      "SELECT CAST(count(*) AS BIGINT) AS cnt FROM documents WHERE text LIKE '%table%'",
    "q05_count_composite" ->
      ("SELECT CAST(count(*) AS BIGINT) AS cnt FROM events WHERE props LIKE '%\"k\": 6%' " +
        "AND ts BETWEEN TIMESTAMP '2024-01-05 00:00:00' AND TIMESTAMP '2024-01-25 00:00:00' " +
        "AND value < 50.0"),
    "q06_select_limit" ->
      ("SELECT event_id, CAST(epoch_us(ts) AS BIGINT) AS ts_us, user_id, event_type, value, props " +
        "FROM events WHERE event_type = 'purchase' ORDER BY event_id LIMIT 10"),
    "q01_pricing_summary" ->
      ("""SELECT l_returnflag, l_linestatus,
         | CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty,
         | CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS sum_base_price,
         | CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS sum_disc_price,
         | CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(18,6))) AS DOUBLE) AS sum_charge,
         | round(CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) / count(*), 6) AS avg_qty,
         | round(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) / count(*), 6) AS avg_price,
         | round(CAST(SUM(CAST(l_discount AS DECIMAL(18,6))) AS DOUBLE) / count(*), 6) AS avg_disc,
         | CAST(count(*) AS BIGINT) AS count_order
         |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
         |GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus""").stripMargin,
    "q07_join_agg" ->
      ("""SELECT r_name, n_name,
         | CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
         | CAST(count(*) AS BIGINT) AS n_orders
         |FROM orders JOIN customer ON o_custkey = c_custkey
         | JOIN nation ON c_nationkey = n_nationkey
         | JOIN region ON n_regionkey = r_regionkey
         |GROUP BY r_name, n_name ORDER BY r_name, n_name""").stripMargin,
    "q08_semi_join" ->
      ("SELECT c_custkey, c_name FROM customer c " +
        "WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)"),
    "q09_anti_join" ->
      ("SELECT c_custkey, c_name FROM customer c WHERE NOT EXISTS " +
        "(SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)"),
    "q10_window_topn" ->
      ("""SELECT o_custkey, o_orderkey, o_totalprice FROM (
         | SELECT o_custkey, o_orderkey, o_totalprice,
         |  row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
         | FROM orders) WHERE rn = 1""").stripMargin,
    "q11_distinct_agg" ->
      ("""SELECT c_mktsegment, CAST(count(DISTINCT c_custkey) AS BIGINT) AS n_customers,
         | CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE) AS sum_acctbal
         |FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment""").stripMargin,
    "q12_setop_intersect" ->
      ("SELECT o_custkey AS custkey FROM orders INTERSECT " +
        "SELECT c_custkey AS custkey FROM customer WHERE c_acctbal > 5000"),
    "q13_topk" ->
      ("SELECT o_orderkey, o_custkey, o_totalprice FROM orders " +
        "ORDER BY o_totalprice DESC, o_orderkey LIMIT 10"),
    "q14_rollup" ->
      ("""SELECT o_orderstatus, o_orderpriority, CAST(count(*) AS BIGINT) AS n_orders,
         | CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS revenue
         |FROM orders GROUP BY ROLLUP(o_orderstatus, o_orderpriority)""").stripMargin,
    "q26_percentiles" ->
      ("""SELECT round(quantile_cont(l_quantity, 0.5), 4) AS p50_qty,
         | round(quantile_cont(l_quantity, 0.9), 4) AS p90_qty,
         | round(quantile_cont(l_extendedprice, 0.5), 4) AS p50_price
         |FROM lineitem""").stripMargin,
    "q27_stats" ->
      ("""SELECT round(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price,
         | round(stddev_samp(l_discount), 6) AS sd_discount,
         | round(covar_samp(l_quantity, l_tax), 6) AS cov_qty_tax
         |FROM lineitem""").stripMargin,
    "q20_sessionize" ->
      ("""SELECT user_id, CAST(sum(new_session) AS BIGINT) AS n_sessions,
         | CAST(count(*) AS BIGINT) AS n_events
         |FROM (
         | SELECT user_id,
         |  CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
         |        OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800 * 1000000
         |       THEN 1 ELSE 0 END AS new_session
         | FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
         |) GROUP BY user_id ORDER BY user_id""").stripMargin,
    "q16_token_stats" ->
      (s"""SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars,
         | CAST(CASE WHEN length(trim(text)) = 0 THEN 0 ELSE len($tokensSql) END AS BIGINT) AS n_tokens,
         | round(length(regexp_replace(text, '\\s+', '', 'g')) /
         |   CAST(greatest(len($tokensSql), 1) AS DOUBLE), 4) AS avg_word_len,
         | round(length(regexp_replace(text, '[^.,;:!?''"()-]', '', 'g')) /
         |   CAST(greatest(length(text), 1) AS DOUBLE), 4) AS punct_ratio
         |FROM documents""").stripMargin,
    "q17_quality" ->
      (s"""WITH t AS (
         | SELECT doc_id, text,
         |  CAST(len(list_filter($tokensSql, t -> list_contains($stopList, t))) AS DOUBLE)
         |    / greatest(len($tokensSql), 1) AS swr,
         |  length(regexp_replace(text, '[^.,;:!?''"()-]', '', 'g'))
         |    / CAST(greatest(length(text), 1) AS DOUBLE) AS pr
         | FROM documents)
         |SELECT doc_id, round(swr, 4) AS stopword_ratio,
         | round(least(length(text) / 500.0, 1.0) * 0.5 +
         |  (CASE WHEN round(pr, 4) < 0.2 THEN 1.0 ELSE 0.5 END) * 0.25 +
         |  (CASE WHEN round(swr, 4) > 0.01 THEN 1.0 ELSE 0.6 END) * 0.25, 4) AS quality
         |FROM t""").stripMargin,
    "q18_langid" ->
      (s"""WITH t AS (
         | SELECT doc_id,
         |  len(list_filter($tokensSql, t -> list_contains(['the','and','of','is','with'], t))) AS h_en,
         |  len(list_filter($tokensSql, t -> list_contains(['der','die','und','ist','nicht'], t))) AS h_de,
         |  len(list_filter($tokensSql, t -> list_contains(['le','la','les','est','une'], t))) AS h_fr,
         |  len(list_filter($tokensSql, t -> list_contains(['el','los','es','una','como'], t))) AS h_es,
         |  len(list_filter($tokensSql, t -> list_contains(['的','是','不','了','在'], t))) AS h_zh
         | FROM documents)
         |SELECT doc_id, CASE
         |  WHEN h_en > 0 AND h_en >= greatest(h_en,h_de,h_fr,h_es,h_zh) THEN 'en'
         |  WHEN h_de > 0 AND h_de >= greatest(h_en,h_de,h_fr,h_es,h_zh) THEN 'de'
         |  WHEN h_fr > 0 AND h_fr >= greatest(h_en,h_de,h_fr,h_es,h_zh) THEN 'fr'
         |  WHEN h_es > 0 AND h_es >= greatest(h_en,h_de,h_fr,h_es,h_zh) THEN 'es'
         |  WHEN h_zh > 0 AND h_zh >= greatest(h_en,h_de,h_fr,h_es,h_zh) THEN 'zh'
         |  ELSE 'und' END AS lang_guess
         |FROM t""").stripMargin,
    "q19_fingerprint" ->
      ("SELECT doc_id, md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fingerprint " +
        "FROM documents"),
    "q15_dedup_exact" ->
      ("SELECT CAST(min(doc_id) AS BIGINT) AS keep_id, CAST(count(*) AS BIGINT) AS n_copies " +
        "FROM documents GROUP BY text"),
    "q28_cube" ->
      ("""SELECT o_orderstatus, o_orderpriority, CAST(count(*) AS BIGINT) AS n_orders,
         | round(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) / count(*), 4) AS avg_price
         |FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)""").stripMargin,
    "q29_in_subquery" ->
      ("""SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n,
         | CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS revenue
         |FROM orders WHERE o_custkey IN (
         | SELECT o_custkey FROM orders GROUP BY o_custkey
         | HAVING CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) > 1000000)
         |GROUP BY o_orderstatus ORDER BY o_orderstatus""").stripMargin,
    "q30_union_all" ->
      ("""SELECT band, CAST(count(*) AS BIGINT) AS n FROM (
         | SELECT event_id, 'hi' AS band FROM events WHERE value > 90
         | UNION ALL
         | SELECT event_id, 'lo' AS band FROM events WHERE value < 10
         |) GROUP BY band ORDER BY band""").stripMargin,
    "q31_subword_tokens" ->
      ("SELECT doc_id, CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) " +
        "AS BIGINT) AS n_subwords FROM documents"),
    "q32_quality_pipeline" ->
      (s"""WITH scored AS (
         | SELECT doc_id, text, lang,
         |  round(least(length(text) / 500.0, 1.0) * 0.5 +
         |   (CASE WHEN round(length(regexp_replace(text, '[^.,;:!?''"()-]', '', 'g'))
         |      / CAST(greatest(length(text), 1) AS DOUBLE), 4) < 0.2 THEN 1.0 ELSE 0.5 END) * 0.25 +
         |   (CASE WHEN round(CAST(len(list_filter($tokensSql, t -> list_contains($stopList, t))) AS DOUBLE)
         |      / greatest(len($tokensSql), 1), 4) > 0.01 THEN 1.0 ELSE 0.6 END) * 0.25, 4) AS quality
         | FROM documents),
         |kept AS (SELECT * FROM scored WHERE quality >= 0.7),
         |deduped AS (
         | SELECT min(doc_id) AS doc_id, min(lang) AS lang, min(quality) AS quality
         | FROM kept GROUP BY text)
         |SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
         | round(CAST(SUM(CAST(quality AS DECIMAL(18,6))) AS DOUBLE) / count(*), 4) AS mean_quality
         |FROM deduped GROUP BY lang ORDER BY lang""").stripMargin,
    "q33_embedding_centroids" ->
      ("""SELECT label, CAST(i - 1 AS INT) AS pos,
         | round(avg(CAST(x AS DOUBLE)), 6) AS centroid_val
         |FROM (SELECT label, unnest(embedding) AS x,
         |        generate_subscripts(embedding, 1) AS i FROM embeddings)
         |WHERE i <= 4 GROUP BY label, i ORDER BY label, i""").stripMargin,
    "q36_tfidf" ->
      (s"""WITH terms AS (
         |  SELECT doc_id, unnest($tokensSql) AS term FROM documents),
         |tf AS (SELECT doc_id, term, count(*) AS tf FROM terms GROUP BY doc_id, term),
         |dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
         |n AS (SELECT count(*) AS c FROM documents),
         |scored AS (
         |  SELECT doc_id, term,
         |   round(tf * (ln(((SELECT c FROM n) + 1.0) / (df + 1.0)) + 1.0), 4) AS tfidf
         |  FROM tf JOIN dfreq USING (term)),
         |ranked AS (
         |  SELECT doc_id, term, tfidf,
         |   CAST(row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, term) AS INT) AS rank
         |  FROM scored)
         |SELECT doc_id, term, tfidf, rank FROM ranked
         |WHERE rank <= 3 AND doc_id < 50""").stripMargin,
    // the oracle states the range join declaratively (DuckDB's IEJoin
    // handles the inequality join exactly at this scale); Spark runs the
    // bucketized formulation — same rows by construction
    "q45_range_join" ->
      ("""WITH li AS (
         |  SELECT l_returnflag,
         |    CAST(CAST(l_shipdate AS DATE) - DATE '1970-01-01' AS BIGINT) AS ship_day
         |  FROM lineitem),
         |big AS (
         |  SELECT o_orderkey,
         |    CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT) AS lo
         |  FROM orders WHERE o_totalprice > 450000)
         |SELECT l_returnflag, CAST(floor(ship_day / 365.0) AS BIGINT) AS yr,
         |  CAST(count(*) AS BIGINT) AS n_pairs,
         |  CAST(count(DISTINCT o_orderkey) AS BIGINT) AS n_orders
         |FROM li JOIN big ON li.ship_day >= big.lo AND li.ship_day <= big.lo + 30
         |GROUP BY 1, 2 ORDER BY 1, 2""").stripMargin,
    // identical union + forward-fill formulation (not DuckDB's native ASOF
    // JOIN) so tie/ordering semantics are mirrored by construction; the
    // payload is filled as ONE struct, exactly like AsofJoin.asofLeft, so a
    // right row with a legitimately-NULL payload value can never be stitched
    // with an older row's non-null value
    "q44_asof_join" ->
      ("""WITH clicks AS (
         |  SELECT event_id, user_id, CAST(epoch_us(ts) AS BIGINT) AS ts_us
         |  FROM events WHERE event_type = 'click'),
         |purchases AS (
         |  SELECT user_id, CAST(epoch_us(ts) AS BIGINT) AS p_ts_us, max(value) AS p_value
         |  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2),
         |u AS (
         |  SELECT user_id, ts_us AS t, 1 AS is_left, event_id,
         |         NULL::STRUCT(p_ts BIGINT, p_value DOUBLE) AS p
         |  FROM clicks
         |  UNION ALL
         |  SELECT user_id, p_ts_us AS t, 0, NULL,
         |         struct_pack(p_ts := p_ts_us, p_value := p_value) FROM purchases),
         |f AS (
         |  SELECT user_id, t, is_left, event_id,
         |    last_value(p IGNORE NULLS) OVER w AS p
         |  FROM u
         |  WINDOW w AS (PARTITION BY user_id ORDER BY t, is_left
         |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
         |SELECT event_id, user_id, t AS ts_us,
         |  struct_extract(p, 'p_ts') AS p_ts,
         |  struct_extract(p, 'p_value') AS p_value
         |FROM f WHERE is_left = 1""").stripMargin,
    "q42_chunking" ->
      (s"""WITH t AS (
         |  SELECT doc_id, $tokensSql AS tk FROM documents WHERE doc_id < 50),
         |c AS (
         |  SELECT doc_id, tk, len(tk) AS n,
         |    CAST(ceil(greatest(len(tk) - 10, 1) / 40.0) AS INT) AS cnt
         |  FROM t),
         |e AS (SELECT doc_id, tk, n, unnest(range(0, cnt)) AS i FROM c)
         |SELECT doc_id, CAST(i AS INT) AS chunk_idx,
         |  array_to_string(tk[i*40+1 : i*40+50], ' ') AS chunk_text,
         |  CAST(least(n - i*40, 50) AS BIGINT) AS n_tokens
         |FROM e""").stripMargin,
    "q43_packing" ->
      (s"""WITH t AS (
         |  SELECT doc_id, lang,
         |    CAST(CASE WHEN length(trim(text)) = 0 THEN 0 ELSE len($tokensSql) END AS BIGINT)
         |      AS n_tokens
         |  FROM documents),
         |b AS (
         |  SELECT lang,
         |    CAST(floor((sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id)
         |      - n_tokens) / 2000) AS BIGINT) AS bin,
         |    n_tokens
         |  FROM t)
         |SELECT lang, bin, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(n_tokens) AS BIGINT) AS sum_tokens
         |FROM b GROUP BY lang, bin ORDER BY lang, bin""").stripMargin,
    "q38_hash_sample" ->
      ("""SELECT lang, CAST(count(*) AS BIGINT) AS n_sampled,
         | CAST(min(doc_id) AS BIGINT) AS first_id
         |FROM documents WHERE md5(CAST(doc_id AS VARCHAR)) < '1a'
         |GROUP BY lang ORDER BY lang""").stripMargin,
    "q57_stratified_sample" ->
      ("""SELECT lang, CAST(count(*) AS BIGINT) AS n_kept,
         | CAST(min(doc_id) AS BIGINT) AS first_id
         |FROM documents
         |WHERE md5(lang || ':' || CAST(doc_id AS VARCHAR))
         |      < (CASE WHEN lang = 'en' THEN '19' ELSE '4c' END)
         |GROUP BY lang ORDER BY lang""").stripMargin,
    "q58_group_sample" ->
      ("""SELECT doc_id, lang, CAST(rn AS BIGINT) AS rn FROM (
         |  SELECT doc_id, lang,
         |    row_number() OVER (PARTITION BY lang
         |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
         |  FROM documents)
         |WHERE rn <= 20""").stripMargin,
    "q39_daily_histogram" ->
      ("""SELECT CAST(ts AS DATE) AS day, CAST(count(*) AS BIGINT) AS n_events,
         | round(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) / count(*), 6) AS avg_value
         |FROM events GROUP BY 1 ORDER BY 1""").stripMargin,
    "q37_bm25" ->
      (s"""WITH terms AS (
         |  SELECT doc_id, unnest($tokensSql) AS term FROM documents),
         |tf AS (SELECT doc_id, term, count(*) AS tf FROM terms GROUP BY 1, 2),
         |dl AS (SELECT doc_id, count(*) AS dl FROM terms GROUP BY 1),
         |stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
         |dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
         |scored AS (
         |  SELECT doc_id, term,
         |    round(ln((n_docs - df + 0.5) / (df + 0.5) + 1.0) * (tf * 2.2) /
         |      (tf + 1.2 * (0.25 + (0.75 * dl) / avgdl)), 4) AS bm25
         |  FROM tf JOIN dfreq USING (term) JOIN dl USING (doc_id) CROSS JOIN stats),
         |ranked AS (
         |  SELECT doc_id, term, bm25,
         |    CAST(row_number() OVER (PARTITION BY doc_id ORDER BY bm25 DESC, term) AS INT) AS rank
         |  FROM scored)
         |SELECT doc_id, term, bm25, rank FROM ranked
         |WHERE rank <= 3 AND doc_id < 50""").stripMargin,
    "q23_ngram_pairs" -> ngramPairsSql,
    "q50_json_extract" ->
      ("""SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
         | CAST(count(*) AS BIGINT) AS n,
         | round(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) / count(*), 6) AS avg_value
         |FROM events GROUP BY 1 ORDER BY 1""").stripMargin,
    "q51_moving_avg" ->
      ("""SELECT event_id, user_id,
         | round(CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER w AS DOUBLE)
         |   / count(*) OVER w, 6) AS avg5
         |FROM events WHERE event_type = 'purchase'
         |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
         |             ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)""").stripMargin,
    "q53_select_latemat" ->
      ("SELECT event_id, CAST(epoch_us(ts) AS BIGINT) AS ts_us, user_id, event_type, value, props " +
        "FROM events WHERE value > 99.5 ORDER BY event_id LIMIT 10"),
    "q52_ntile" ->
      ("""SELECT decile, CAST(count(*) AS BIGINT) AS n,
         | CAST(min(c_custkey) AS BIGINT) AS min_key
         |FROM (SELECT c_custkey,
         |        ntile(10) OVER (ORDER BY c_acctbal DESC, c_custkey) AS decile
         |      FROM customer)
         |GROUP BY decile ORDER BY decile""").stripMargin,
    // identical oracle to q52 by design: two implementations (window vs
    // range-partitioned rank), one semantic
    "q56_ntile_scalable" ->
      ("""SELECT decile, CAST(count(*) AS BIGINT) AS n,
         | CAST(min(c_custkey) AS BIGINT) AS min_key
         |FROM (SELECT c_custkey,
         |        ntile(10) OVER (ORDER BY c_acctbal DESC, c_custkey) AS decile
         |      FROM customer)
         |GROUP BY decile ORDER BY decile""").stripMargin,
    "q63_cosine_pairs" ->
      ("""WITH v AS (
         |  SELECT vec_id, unnest(embedding) AS x, generate_subscripts(embedding, 1) AS i
         |  FROM embeddings),
         |nrm AS (
         |  SELECT vec_id, sqrt(sum(CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) AS n
         |  FROM v GROUP BY vec_id),
         |dp AS (
         |  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         |         sum(CAST(a.x AS DOUBLE) * CAST(b.x AS DOUBLE)) AS d
         |  FROM v a JOIN v b ON a.i = b.i AND a.vec_id < b.vec_id
         |  GROUP BY 1, 2)
         |SELECT id_a, id_b, round(d / (na.n * nb.n), 6) AS cosine
         |FROM dp JOIN nrm na ON na.vec_id = id_a JOIN nrm nb ON nb.vec_id = id_b
         |WHERE na.n > 0 AND nb.n > 0
         |  AND round(d / (na.n * nb.n), 6) >= 0.45""").stripMargin,
    "q85_mixture_balance" ->
      ("""WITH targets(lang, target) AS (
         |  VALUES ('en', 0.3), ('zh', 0.2), ('es', 0.2), ('de', 0.15), ('fr', 0.15)),
         |avail AS (SELECT lang, count(*) AS avail FROM documents GROUP BY lang),
         |a AS (
         |  SELECT t.lang, CAST(t.target AS DOUBLE) AS target, avail.avail
         |  FROM targets t JOIN avail ON t.lang = avail.lang),
         |mr AS (SELECT min(CAST(avail AS DOUBLE) / target) AS min_ratio FROM a),
         |rates AS (
         |  SELECT lang, mr.min_ratio * target / CAST(avail AS DOUBLE) AS rate
         |  FROM a CROSS JOIN mr),
         |kept AS (
         |  SELECT d.lang, r.rate
         |  FROM documents d JOIN rates r ON d.lang = r.lang
         |  WHERE CAST(('0x' || substring(md5(CAST(d.doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
         |    / 4294967296.0 < r.rate)
         |SELECT lang, CAST(count(*) AS BIGINT) AS n_kept,
         |  round(min(rate), 6) AS rate
         |FROM kept GROUP BY lang
         |ORDER BY lang""").stripMargin,
    "q68_weighted_sample" ->
      (s"""WITH scored AS (
         | SELECT doc_id, lang,
         |  round(least(length(text) / 500.0, 1.0) * 0.5 +
         |   (CASE WHEN round(length(regexp_replace(text, '[^.,;:!?''"()-]', '', 'g'))
         |      / CAST(greatest(length(text), 1) AS DOUBLE), 4) < 0.2 THEN 1.0 ELSE 0.5 END) * 0.25 +
         |   (CASE WHEN round(CAST(len(list_filter($tokensSql, t -> list_contains($stopList, t))) AS DOUBLE)
         |      / greatest(len($tokensSql), 1), 4) > 0.01 THEN 1.0 ELSE 0.6 END) * 0.25, 4) AS quality,
         |  CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
         |    / 4294967296.0 AS u
         | FROM documents)
         |SELECT lang, CAST(count(*) AS BIGINT) AS n_kept,
         | round(CAST(SUM(CAST(quality AS DECIMAL(18,6))) AS DOUBLE) / count(*), 4) AS mean_quality
         |FROM scored WHERE u < quality * 0.5
         |GROUP BY lang ORDER BY lang""").stripMargin,
    "q67_salted_agg" ->
      ("""SELECT event_type,
         | CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value,
         | CAST(count(*) AS BIGINT) AS n_rows
         |FROM events GROUP BY event_type ORDER BY event_type""").stripMargin,
    "q66_editdist_pairs" ->
      ("""WITH t AS (
         |  SELECT doc_id AS id, substring(trim(lower(text)), 1, 40) AS s
         |  FROM documents WHERE length(substring(trim(lower(text)), 1, 40)) >= 3),
         |g AS (
         |  SELECT DISTINCT id, substring(s, i, 3) AS g
         |  FROM (SELECT id, s, unnest(range(1, length(s) - 1)) AS i FROM t)),
         |keep AS (
         |  SELECT g FROM g GROUP BY g HAVING count(*) >= 2 AND count(*) <= 1000),
         |gk AS (SELECT g.id, g.g FROM g JOIN keep ON g.g = keep.g),
         |cand AS (
         |  SELECT DISTINCT a.id AS id_a, b.id AS id_b
         |  FROM gk a JOIN gk b ON a.g = b.g AND a.id < b.id)
         |SELECT id_a, id_b, CAST(levenshtein(ta.s, tb.s) AS BIGINT) AS dist
         |FROM cand JOIN t ta ON ta.id = id_a JOIN t tb ON tb.id = id_b
         |WHERE abs(length(ta.s) - length(tb.s)) <= 3
         |  AND levenshtein(ta.s, tb.s) <= 3""").stripMargin,
    "q70_editdist_rarest" ->
      ("""WITH t AS (
         |  SELECT doc_id AS id, substring(trim(lower(text)), 1, 40) AS s
         |  FROM documents WHERE length(substring(trim(lower(text)), 1, 40)) >= 3),
         |g AS (
         |  SELECT DISTINCT id, substring(s, i, 3) AS g
         |  FROM (SELECT id, s, unnest(range(1, length(s) - 1)) AS i FROM t)),
         |f AS (
         |  SELECT g, count(*) AS freq FROM g GROUP BY g
         |  HAVING count(*) >= 2 AND count(*) <= 1000),
         |gk AS (
         |  SELECT id, g FROM (
         |    SELECT g.id, g.g,
         |           row_number() OVER (PARTITION BY g.id ORDER BY f.freq, g.g) AS rk
         |    FROM g JOIN f ON g.g = f.g)
         |  WHERE rk <= 4),
         |cand AS (
         |  SELECT DISTINCT a.id AS id_a, b.id AS id_b
         |  FROM gk a JOIN gk b ON a.g = b.g AND a.id < b.id)
         |SELECT id_a, id_b, CAST(levenshtein(ta.s, tb.s) AS BIGINT) AS dist
         |FROM cand JOIN t ta ON ta.id = id_a JOIN t tb ON tb.id = id_b
         |WHERE abs(length(ta.s) - length(tb.s)) <= 3
         |  AND levenshtein(ta.s, tb.s) <= 3""").stripMargin,
    // q115: per-doc accounting over exactly q70's verified pair set — each
    // pair counted at both endpoints
    "q115_editdist_stats" ->
      ("""WITH t AS (
         |  SELECT doc_id AS id, substring(trim(lower(text)), 1, 40) AS s
         |  FROM documents WHERE length(substring(trim(lower(text)), 1, 40)) >= 3),
         |g AS (
         |  SELECT DISTINCT id, substring(s, i, 3) AS g
         |  FROM (SELECT id, s, unnest(range(1, length(s) - 1)) AS i FROM t)),
         |f AS (
         |  SELECT g, count(*) AS freq FROM g GROUP BY g
         |  HAVING count(*) >= 2 AND count(*) <= 1000),
         |gk AS (
         |  SELECT id, g FROM (
         |    SELECT g.id, g.g,
         |           row_number() OVER (PARTITION BY g.id ORDER BY f.freq, g.g) AS rk
         |    FROM g JOIN f ON g.g = f.g)
         |  WHERE rk <= 4),
         |cand AS (
         |  SELECT DISTINCT a.id AS id_a, b.id AS id_b
         |  FROM gk a JOIN gk b ON a.g = b.g AND a.id < b.id),
         |pairs AS (
         |  SELECT id_a, id_b, levenshtein(ta.s, tb.s) AS dist
         |  FROM cand JOIN t ta ON ta.id = id_a JOIN t tb ON tb.id = id_b
         |  WHERE abs(length(ta.s) - length(tb.s)) <= 3
         |    AND levenshtein(ta.s, tb.s) <= 3)
         |SELECT id, CAST(count(*) AS BIGINT) AS dup_pairs,
         |  CAST(min(dist) AS BIGINT) AS min_dist
         |FROM (SELECT id_a AS id, dist FROM pairs
         |      UNION ALL SELECT id_b AS id, dist FROM pairs)
         |GROUP BY id""").stripMargin,
    "q64_shuffle_order" ->
      ("""SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS h
         |FROM documents ORDER BY h, doc_id LIMIT 20""").stripMargin,
    "q65_split_assign" ->
      ("""SELECT CASE WHEN md5(CAST(doc_id AS VARCHAR)) < 'cc' THEN 'train'
         |            WHEN md5(CAST(doc_id AS VARCHAR)) < 'e6' THEN 'val'
         |            ELSE 'test' END AS split,
         |  lang, CAST(count(*) AS BIGINT) AS n,
         |  CAST(min(doc_id) AS BIGINT) AS first_id
         |FROM documents GROUP BY 1, 2 ORDER BY 1, 2""").stripMargin,
    "q60_pivot" ->
      ("""SELECT CAST(ts AS DATE) AS day,
         | CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS click,
         | CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS error,
         | CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase,
         | CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS signup,
         | CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS view
         |FROM events GROUP BY 1 ORDER BY 1""").stripMargin,
    "q61_unpivot" ->
      ("""SELECT measure, CAST(count(*) AS BIGINT) AS n,
         | round(CAST(SUM(CAST(amount AS DECIMAL(18,6))) AS DOUBLE), 4) AS total
         |FROM (
         |  SELECT 'o_totalprice' AS measure, o_totalprice AS amount FROM orders
         |  UNION ALL
         |  SELECT 'o_tax' AS measure, o_totalprice * 0.1 AS amount FROM orders)
         |GROUP BY measure ORDER BY measure""").stripMargin,
    "q62_grouping_sets" ->
      ("""SELECT o_orderstatus, o_orderpriority, CAST(count(*) AS BIGINT) AS n_orders,
         | CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS revenue
         |FROM orders GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
         |  (o_orderstatus), (o_orderpriority))""").stripMargin,
    "q46_dedup_clusters" -> clustersOracleSql,
    // q59 computes the identical clusters by star contraction — one oracle,
    // two implementations (the q52/q56 pattern applied to clustering)
    "q59_dedup_clusters_star" -> clustersOracleSql,
    // string-shingle formulation of the hash-shingle overlap join; identical
    // counts barring 64-bit hash collisions (~1e-13 at this scale)
    "q47_decontaminate" -> decontaminateSql,
    // bit-identical to q47 by design: the Bloom prefilter only prunes
    // rows the exact join would discard, so the same oracle applies
    "q101_decontaminate_bloom" -> decontaminateSql,
    "q48_repetition" ->
      ("""WITH toks AS (
         |  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS tk
         |  FROM documents),
         |sh AS (
         |  SELECT doc_id,
         |    CASE WHEN len(tk) < 2 THEN array_to_string(tk, ' ')
         |         ELSE array_to_string(tk[i:i+1], ' ') END AS shingle
         |  FROM (SELECT doc_id, tk,
         |          unnest(range(1, greatest(len(tk), 2))) AS i
         |        FROM toks)),
         |g AS (SELECT doc_id, shingle, count(*) AS c FROM sh GROUP BY 1, 2)
         |SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_shingles,
         |  CAST(count(*) AS BIGINT) AS n_distinct,
         |  round(1.0 - count(*) / CAST(sum(c) AS DOUBLE), 6) AS dup_ratio,
         |  CAST(max(c) AS BIGINT) AS max_freq
         |FROM g GROUP BY doc_id""").stripMargin,
    "q24_cosine_topk" ->
      ("""WITH q AS (
         |  SELECT unnest(embedding) AS qv, generate_subscripts(embedding, 1) AS i
         |  FROM embeddings WHERE vec_id = 0),
         |v AS (
         |  SELECT vec_id, unnest(embedding) AS xv, generate_subscripts(embedding, 1) AS i
         |  FROM embeddings),
         |d AS (
         |  SELECT vec_id, sum(CAST(xv AS DOUBLE) * CAST(qv AS DOUBLE)) AS dp,
         |         sqrt(sum(CAST(xv AS DOUBLE) * CAST(xv AS DOUBLE))) AS nx
         |  FROM v JOIN q USING (i) GROUP BY vec_id),
         |nq AS (SELECT sqrt(sum(CAST(qv AS DOUBLE) * CAST(qv AS DOUBLE))) AS n FROM q)
         |SELECT vec_id AS id, round(dp / (nx * (SELECT n FROM nq)), 6) AS cosine
         |FROM d ORDER BY cosine DESC, id ASC LIMIT 10""").stripMargin
  )
}
