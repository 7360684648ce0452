package graft.queries

import graft.operators.Publish
import graft.transform.CsvLoaders
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Sink-side and loader-side end-to-end queries:
  *
  *   - q56: the reference's six-table keyed publish run twice — the
  *     MERGE-idempotence proof (`dags/idh_etl.py:182-272`);
  *   - q57: the weather CSV loader pipeline over real scrape-shaped CSV
  *     files (`src/weather.py:51-142`);
  *   - q58: the delays CSV loader incl. the NaN vehicle-number edge
  *     (`src/delays.py:11-54`).
  *
  * q57/q58 read REAL csv files (written deterministically from embedded
  * literal rows — the "scrape") through the distributed glob scan; their
  * oracles replay the identical rows as VALUES, so the compare verifies
  * the whole transform chain AND that the CSV scan parsed
  * headers/nulls/types correctly.
  */
object SinkQueries {

  type Q = (SparkSession, String) => DataFrame

  private def demoDir: String =
    sys.props.getOrElse("java.io.tmpdir", "/tmp") + "/graft_csv_demo"

  // --- q56: six-table publish, twice — second run must add 0 rows ------
  def q56PublishIdempotent(s: SparkSession, dir: String): DataFrame =
    Publish.publishTwiceSummary(s, dir)

  val q56Sql: String = {
    def cntDistinctId(sql: String) =
      s"(SELECT CAST(count(DISTINCT id) AS BIGINT) FROM ($sql))"
    val delayKeys = s"""(SELECT CAST(count(*) AS BIGINT) FROM (
      SELECT DISTINCT time_id, weather_id, vehicle_id, line_id, stop_id
      FROM (${StarSchema.q44Sql})))"""
    s"""SELECT * FROM (
       SELECT 'DelayFact' AS table_name, $delayKeys AS rows_first,
              CAST(0 AS BIGINT) AS rows_second
       UNION ALL SELECT 'LineDim', ${cntDistinctId(StarSchema.q40Sql)},
              CAST(0 AS BIGINT)
       UNION ALL SELECT 'StopDim', ${cntDistinctId(StarSchema.q41Sql)},
              CAST(0 AS BIGINT)
       UNION ALL SELECT 'TimeDim', ${cntDistinctId(CoreQueries.q17Sql)},
              CAST(0 AS BIGINT)
       UNION ALL SELECT 'VehicleDim', ${cntDistinctId(StarSchema.q42Sql)},
              CAST(0 AS BIGINT)
       UNION ALL SELECT 'WeatherDim', ${cntDistinctId(StarSchema.q43Sql)},
              CAST(0 AS BIGINT)
       ) ORDER BY table_name"""
  }

  // --- q68: incremental partitioned publish ----------------------------
  /** The hourly-publish scale story end-to-end, oracle-gated: the
    * DelayFact batch is staged once, split by day parity, and published
    * incrementally into a `time_id`-partitioned sink — batch 1 creates
    * the sink, batch 2 appends only its own days (its re-run anti-join
    * and footer counts PRUNE to batch-2 partitions, PlanAuditSpec), and
    * re-publishing batch 2 appends nothing. Output: one row per phase
    * with the appended-row count.
    *
    * Cost shape (bench ~8 s at sf0.1): ~12 intentionally SEQUENTIAL
    * Spark actions — stage (build + dedup + write), then per phase a
    * partition-value collect, pruned before-count, anti-join + append,
    * and pruned after-count. The phases model successive hourly runs,
    * so they cannot overlap; per-action driver latency, not data
    * volume, dominates at this SF. */
  def q68PublishIncremental(s: SparkSession, dir: String): DataFrame = {
    val root = java.nio.file.Files
      .createTempDirectory(java.nio.file.Paths.get(
        sys.props.getOrElse("java.io.tmpdir", "/tmp")), "graft_incr_")
      .toString
    try {
      val m = graft.model.StarModel.delayFact
      // the staged (conformed + keyed-deduped) DelayFact batch comes
      // from the JVM-shared staging root (Publish.sharedStaging) —
      // identical content to the per-query staging this used to
      // rebuild, paid once per process across the publish family.
      // conform restores the declared time_id type (the shared
      // staging is hive-partitioned, so directory values re-infer
      // narrower); the parquet round-trip remains (a cached frame was
      // measured SLOWER here — each phase's keys-only anti-join side
      // and partition-value collect column-prune the staging scan)
      val (stagingRoot, _) = Publish.sharedStaging(s, dir)
      val staged = graft.model.StarModel.conform(
        s.read.parquet(s"$stagingRoot/${m.name}"), m.schema)
      val sink = s"$root/DelayFact"
      def publish(batch: org.apache.spark.sql.DataFrame): Long =
        graft.operators.Upsert.upsertParquet(s, batch, m.keys, m.keys,
          sink, partitionCol = Some("time_id"), preDeduped = true)
      val n1 = publish(staged.filter(col("time_id") % 2 === 0))
      val n2 = publish(staged.filter(col("time_id") % 2 === 1))
      val n3 = publish(staged.filter(col("time_id") % 2 === 1))
      import s.implicits._
      Seq(("p1_even_days", n1), ("p2_odd_days", n2), ("p3_odd_rerun", n3))
        .toDF("phase", "rows_appended").orderBy("phase")
    } finally {
      graft.io.Sources.deleteRecursively(root)
    }
  }

  val q68Sql: String =
    s"""WITH dfkeys AS (
         SELECT DISTINCT time_id, weather_id, vehicle_id, line_id, stop_id
         FROM (${StarSchema.q44Sql}))
       SELECT * FROM (
         SELECT 'p1_even_days' AS phase,
                (SELECT CAST(count(*) AS BIGINT) FROM dfkeys
                 WHERE time_id % 2 = 0) AS rows_appended
         UNION ALL
         SELECT 'p2_odd_days',
                (SELECT CAST(count(*) AS BIGINT) FROM dfkeys
                 WHERE time_id % 2 = 1)
         UNION ALL
         SELECT 'p3_odd_rerun', CAST(0 AS BIGINT)
       ) ORDER BY phase"""

  // --- q71: small-file compaction end-to-end ---------------------------
  /** The maintenance flow an hourly partitioned publish eventually
    * needs, oracle-gated: three batches append into a `time_id`-
    * partitioned DelayFact sink (one file per touched partition per
    * batch — the reference's hourly-append small-file generator,
    * `dags/idh_etl.py:236-259`), [[graft.operators.Compact.compactSink]]
    * rewrites it to one file per partition, and a full re-publish after
    * the rewrite appends nothing — compaction preserved every row.
    *
    * Output (one row): files_before = Σ per batch of touched partitions,
    * files_after = partition count, rows_total = distinct keys in the
    * window, rerun_appended = 0. All four are exactly computable by the
    * DuckDB oracle: a batch writes exactly one file into each partition
    * it has rows for (`repartition(col(p))` routes a partition value to
    * one task; the writer opens one file per directory), and the
    * compaction target for tiny partitions is one file per directory.
    * The three batches split the staged (unique-key) rows on
    * `abs(delay_mins) % 3` — engine-identical arithmetic, disjoint by
    * construction. */
  def q71CompactSink(s: SparkSession, dir: String): DataFrame = {
    val root = java.nio.file.Files
      .createTempDirectory(java.nio.file.Paths.get(
        sys.props.getOrElse("java.io.tmpdir", "/tmp")), "graft_compact_")
      .toString
    try {
      val m = graft.model.StarModel.delayFact
      // shared staged batch (Publish.sharedStaging), filtered to the
      // window: time_id is a KEY column, so the keyed dedup commutes
      // with this filter — content identical to staging the filtered
      // batch from scratch, and the hive-partitioned staging layout
      // turns the filter into partition pruning. time_id is the
      // DAY-granular yyyyMMdd key (F6); ten days of the window → ten
      // sink partitions, 30 files before, 10 after.
      val (stagingRoot, _) = Publish.sharedStaging(s, dir)
      val staged = graft.model.StarModel.conform(
          s.read.parquet(s"$stagingRoot/${m.name}"), m.schema)
        .filter(col("time_id") < 20240111L)
      val sink = s"$root/DelayFact"
      // the small-file state (one file per touched partition per batch
      // — the hourly-append generator) is CONSTRUCTED with three plain
      // partitioned appends rather than three full publish flows: the
      // batches are disjoint by construction and the sink starts empty,
      // so the upserts' anti-joins were provably no-ops costing a
      // partition-value collect + pruned sink scan + metrics wait each
      // (the round-5 verdict's "fold the 3 publishes" task). The REAL
      // publish machinery still runs below, where it proves something:
      // the post-compaction rerun's anti-join must find every key.
      (0 to 2).foreach(i =>
        staged.filter(abs(col("delay_mins")) % 3 === i)
          .repartition(col("time_id"))
          .write.mode("append").partitionBy("time_id").parquet(sink))
      val (filesBefore, filesAfter) = graft.operators.Compact.compactSink(
        s, sink, partitionCol = Some("time_id"))
      // compaction lost nothing -> 0 appended
      val rerun = graft.operators.Upsert.upsertParquet(s, staged,
        m.keys, m.keys, sink, partitionCol = Some("time_id"),
        preDeduped = true)
      val rowsTotal = staged.count()
      import s.implicits._
      Seq((filesBefore, filesAfter, rowsTotal, rerun))
        .toDF("files_before", "files_after", "rows_total", "rerun_appended")
    } finally {
      graft.io.Sources.deleteRecursively(root)
    }
  }

  val q71Sql: String =
    s"""WITH dfkeys AS (
         SELECT time_id, weather_id, vehicle_id, line_id, stop_id,
                min(delay_mins) AS delay_mins
         FROM (${StarSchema.q44Sql})
         WHERE time_id < 20240111
         GROUP BY 1, 2, 3, 4, 5)
       SELECT
         (SELECT CAST(count(*) AS BIGINT) FROM
           (SELECT DISTINCT time_id, abs(delay_mins) % 3 FROM dfkeys))
           AS files_before,
         (SELECT CAST(count(DISTINCT time_id) AS BIGINT) FROM dfkeys)
           AS files_after,
         (SELECT CAST(count(*) AS BIGINT) FROM dfkeys) AS rows_total,
         CAST(0 AS BIGINT) AS rerun_appended"""

  // --- q72: partition-replacing upsert (MERGE UPDATE analog) -----------
  /** The re-statement flow the insert-only reference cannot express:
    * publish days 1-3 of the DelayFact window, then re-state days 2-4
    * with corrected values (delay_mins + 100) via
    * [[graft.operators.Upsert.replacePartitionsParquet]] — dynamic
    * partition overwrite replaces ONLY the partitions the batch
    * carries. Day 1 keeps v1 values, days 2-4 carry v2; nothing else is
    * touched. Output: per-day row count and delay sum of the final
    * sink — exactly predictable by the oracle. */
  def q72ReplacePartitions(s: SparkSession, dir: String): DataFrame = {
    val root = java.nio.file.Files
      .createTempDirectory(java.nio.file.Paths.get(
        sys.props.getOrElse("java.io.tmpdir", "/tmp")), "graft_replace_")
      .toString
    try {
      val m = graft.model.StarModel.delayFact
      val conformed = graft.model.StarModel.conform(
        StarSchema.delayFactFrame(s, dir), m.schema)
        // time_id is already the DAY-granular yyyyMMdd key (F6) — it IS
        // the partition column; days 1-4 of the window
        .filter(col("time_id") < 20240105L)
      val ord = m.schema.fieldNames.filterNot(m.keys.contains).toSeq
      graft.operators.Upsert.dedupKeepFirstAgg(conformed, m.keys, ord)
        .write.mode("overwrite").parquet(s"$root/_staging")
      val staged = s.read.parquet(s"$root/_staging")
      val sink = s"$root/DelayFact"
      // v1: days 1-3
      graft.operators.Upsert.upsertParquet(s,
        staged.filter(col("time_id") < 20240104L),
        m.keys, m.keys, sink, partitionCol = Some("time_id"),
        preDeduped = true)
      // v2 re-statement: days 2-4, corrected values — complete
      // partitions, so the replace contract holds
      graft.operators.Upsert.replacePartitionsParquet(s,
        staged.filter(col("time_id") >= 20240102L)
          .withColumn("delay_mins", col("delay_mins") + 100L),
        m.keys, m.keys, sink, partitionCol = "time_id",
        preDeduped = true)
      // materialize BEFORE the finally deletes the scratch sink — a lazy
      // plan over the temp files would read them after deletion; the
      // read resolves through the CommitLog manifest the replace committed
      val out = graft.operators.CommitLog.read(s, sink)
        .groupBy(col("time_id").cast("long").as("time_id"))
        .agg(count(lit(1)).as("n_rows"),
          sum(col("delay_mins")).as("delay_sum"))
        .orderBy("time_id")
      val rows = out.collect()
      s.createDataFrame(java.util.Arrays.asList(rows: _*), out.schema)
    } finally {
      graft.io.Sources.deleteRecursively(root)
    }
  }

  val q72Sql: String =
    s"""WITH dfkeys AS (
         SELECT time_id, weather_id, vehicle_id, line_id, stop_id,
                min(delay_mins) AS delay_mins
         FROM (${StarSchema.q44Sql})
         WHERE time_id < 20240105
         GROUP BY 1, 2, 3, 4, 5),
       final AS (
         SELECT time_id,
                CASE WHEN time_id >= 20240102 THEN delay_mins + 100
                     ELSE delay_mins END AS delay_mins
         FROM dfkeys)
       SELECT time_id, CAST(count(*) AS BIGINT) AS n_rows,
              CAST(sum(delay_mins) AS BIGINT) AS delay_sum
       FROM final GROUP BY time_id ORDER BY time_id"""

  // --- q36: row-granular MERGE (WHEN MATCHED UPDATE) -------------------
  // --- q257: CDC-apply (tri-branch MERGE) -------------------------------
  /** One net CDC batch — updates, deletes, AND inserts — landed on the
    * customer ledger in a single [[graft.operators.Merge
    * .applyCdcParquet]] pass: every 10th customer's balance corrected
    * (+$1000, op U), every 7th-but-not-10th customer closed (op D),
    * five new accounts (op U, unmatched → insert). The consumer side
    * of the CDC family (q121 feed → q198 net effect → THIS apply);
    * q36 covers update+insert, q140 covers delete — this is all three
    * branches against one sink, one touched-file rewrite, one
    * CommitLog swap. Output: per-segment count + balance sum of the
    * final ledger, so every preserved, corrected, deleted and
    * inserted cent is pinned by the oracle's relational simulation. */
  def q257CdcApply(s: SparkSession, dir: String): DataFrame = {
    val root = java.nio.file.Files
      .createTempDirectory(java.nio.file.Paths.get(
        sys.props.getOrElse("java.io.tmpdir", "/tmp")), "graft_cdc_")
      .toString
    try {
      val cust = graft.io.Sources.table(s, dir, "customer")
        .select(col("c_custkey"),
          expr("CAST(round(c_acctbal * 100) AS BIGINT)").as("bal_cents"),
          col("c_mktsegment"))
      val sink = s"$root/ledger"
      cust.repartition(8).write.parquet(sink)
      val changes = cust.filter(col("c_custkey") % 10 === 0)
        .withColumn("bal_cents", col("bal_cents") + 100000L)
        .withColumn("op", lit("U"))
        .unionByName(cust
          .filter(col("c_custkey") % 7 === 0 && col("c_custkey") % 10 =!= 0)
          .withColumn("op", lit("D")))
        .unionByName(s.range(1, 6)
          .select((col("id") + 91000000L).as("c_custkey"),
            lit(7700L).as("bal_cents"), lit("NEWACCT").as("c_mktsegment"),
            lit("U").as("op")))
      graft.operators.Merge.applyCdcParquet(s, changes, Seq("c_custkey"),
        "op", sink)
      val out = graft.operators.CommitLog.read(s, sink)
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_rows"), sum("bal_cents").as("bal_sum"))
        .orderBy("c_mktsegment")
      val rows = out.collect()
      s.createDataFrame(java.util.Arrays.asList(rows: _*), out.schema)
    } finally {
      graft.io.Sources.deleteRecursively(root)
    }
  }

  val q257Sql: String =
    """WITH base AS (
         SELECT c_custkey,
                CASE WHEN c_custkey % 10 = 0
                  THEN CAST(round(c_acctbal * 100) AS BIGINT) + 100000
                  ELSE CAST(round(c_acctbal * 100) AS BIGINT)
                END AS bal_cents,
                c_mktsegment
         FROM customer
         WHERE NOT (c_custkey % 7 = 0 AND c_custkey % 10 <> 0)
         UNION ALL
         SELECT 91000000 + i AS c_custkey, 7700 AS bal_cents,
                'NEWACCT' AS c_mktsegment
         FROM unnest(generate_series(1, 5)) AS t(i))
       SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_rows,
              CAST(sum(bal_cents) AS BIGINT) AS bal_sum
       FROM base GROUP BY 1 ORDER BY 1"""

  // --- q276: schema-evolution MERGE -------------------------------------
  /** The widen-on-merge flow end-to-end: the customer ledger starts as
    * (key, balance); a correction batch arrives carrying a NEW
    * `status` column (every 10th customer flagged 'CORRECTED', five
    * new 'NEW' accounts), and [[graft.operators.Merge.mergeParquet]]
    * with `allowSchemaEvolution` lands it WITHOUT rewriting the
    * untouched files — widening is lazy, the mixed on-disk schemas
    * resolve through the mergeSchema reader, and old rows surface
    * NULL status. Output: per-status row count + balance sum, so the
    * oracle pins that exactly the touched rows carry the new column.
    * The crash-window/byte-identity halves of this flow are
    * CommitProtocolSpec's; this query pins the VALUES. */
  def q276SchemaEvolution(s: SparkSession, dir: String): DataFrame = {
    val root = java.nio.file.Files
      .createTempDirectory(java.nio.file.Paths.get(
        sys.props.getOrElse("java.io.tmpdir", "/tmp")), "graft_evo_")
      .toString
    try {
      val cust = graft.io.Sources.table(s, dir, "customer")
        .select(col("c_custkey"),
          expr("CAST(round(c_acctbal * 100) AS BIGINT)").as("bal_cents"))
      val sink = s"$root/ledger"
      cust.repartition(8).write.parquet(sink)
      val updates = cust.filter(col("c_custkey") % 10 === 0)
        .withColumn("bal_cents", col("bal_cents") + 100000L)
        .withColumn("status", lit("CORRECTED"))
        .unionByName(s.range(1, 6)
          .select((col("id") + 93000000L).as("c_custkey"),
            lit(4200L).as("bal_cents"), lit("NEW").as("status")))
      graft.operators.Merge.mergeParquet(s, updates, Seq("c_custkey"),
        sink, allowSchemaEvolution = true)
      val out = graft.operators.CommitLog.read(s, sink, mergeSchema = true)
        .groupBy(coalesce(col("status"), lit("UNCHANGED")).as("status"))
        .agg(count(lit(1)).as("n_rows"), sum("bal_cents").as("bal_sum"))
        .orderBy("status")
      val rows = out.collect()
      s.createDataFrame(java.util.Arrays.asList(rows: _*), out.schema)
    } finally {
      graft.io.Sources.deleteRecursively(root)
    }
  }

  val q276Sql: String =
    """WITH base AS (
         SELECT c_custkey,
                CASE WHEN c_custkey % 10 = 0
                  THEN CAST(round(c_acctbal * 100) AS BIGINT) + 100000
                  ELSE CAST(round(c_acctbal * 100) AS BIGINT)
                END AS bal_cents,
                CASE WHEN c_custkey % 10 = 0 THEN 'CORRECTED'
                  ELSE 'UNCHANGED' END AS status
         FROM customer
         UNION ALL
         SELECT 93000000 + i, 4200, 'NEW'
         FROM unnest(generate_series(1, 5)) AS t(i))
       SELECT status, CAST(count(*) AS BIGINT) AS n_rows,
              CAST(sum(bal_cents) AS BIGINT) AS bal_sum
       FROM base GROUP BY 1 ORDER BY 1"""

  /** The MERGE variant q72's partition-replace and q102's feed
    * compaction still lacked: an in-place row-level update of ONLY the
    * sink files containing matched keys ([[graft.operators.Merge
    * .mergeParquet]]). Sink = the customer ledger in 8 files; batch =
    * every 10th customer with a corrected balance (+$1000) plus five
    * brand-new accounts. Matched rows take the batch payload, unmatched
    * rows in touched files are preserved verbatim, untouched files are
    * never rewritten (spec-pinned byte-identity), inserts append.
    * Output: per-segment count + balance sum of the final ledger —
    * every preserved, updated and inserted cent is pinned. */
  def q36MergeUpdate(s: SparkSession, dir: String): DataFrame = {
    val root = java.nio.file.Files
      .createTempDirectory(java.nio.file.Paths.get(
        sys.props.getOrElse("java.io.tmpdir", "/tmp")), "graft_merge_")
      .toString
    try {
      val cust = graft.io.Sources.table(s, dir, "customer")
        .select(col("c_custkey"),
          expr("CAST(round(c_acctbal * 100) AS BIGINT)").as("bal_cents"),
          col("c_mktsegment"))
      val sink = s"$root/ledger"
      cust.repartition(8).write.parquet(sink)
      val updates = cust.filter(col("c_custkey") % 10 === 0)
        .withColumn("bal_cents", col("bal_cents") + 100000L)
        .unionByName(s.range(1, 6)
          .select((col("id") + 90000000L).as("c_custkey"),
            lit(4200L).as("bal_cents"), lit("NEWACCT").as("c_mktsegment")))
      graft.operators.Merge.mergeParquet(s, updates, Seq("c_custkey"), sink)
      // materialize BEFORE the finally deletes the scratch sink; the
      // read resolves through the CommitLog manifest the merge committed
      val out = graft.operators.CommitLog.read(s, sink)
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_rows"), sum("bal_cents").as("bal_sum"))
        .orderBy("c_mktsegment")
      val rows = out.collect()
      s.createDataFrame(java.util.Arrays.asList(rows: _*), out.schema)
    } finally {
      graft.io.Sources.deleteRecursively(root)
    }
  }

  val q36Sql: String =
    """WITH base AS (
         SELECT c_custkey,
                CASE WHEN c_custkey % 10 = 0
                  THEN CAST(round(c_acctbal * 100) AS BIGINT) + 100000
                  ELSE CAST(round(c_acctbal * 100) AS BIGINT)
                END AS bal_cents,
                c_mktsegment
         FROM customer
         UNION ALL
         SELECT 90000000 + i AS c_custkey, 4200 AS bal_cents,
                'NEWACCT' AS c_mktsegment
         FROM unnest(generate_series(1, 5)) AS t(i))
       SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_rows,
              CAST(sum(bal_cents) AS BIGINT) AS bal_sum
       FROM base GROUP BY 1 ORDER BY 1"""

  // --- q57: weather CSV loader end-to-end ------------------------------
  def q57WeatherCsv(s: SparkSession, dir: String): DataFrame =
    CsvLoaders.weatherFromDemoCsv(s, demoDir).orderBy("id")

  /** Banker's (HALF_EVEN) rounding in DuckDB SQL — the weather loader
    * uses `bround` to match pandas `.round()` (`weather.py:94-97`), and
    * DuckDB's `round` is half-away-from-zero, so ties must be emulated:
    * at frac 0.5, round toward the even neighbor. The demo data plants
    * 2.5 (→2) and 6.5 (→6) ties to keep this path exercised. */
  private def broundSql(e: String): String =
    s"""(CASE WHEN ($e) - floor($e) = 0.5
          THEN CAST(floor($e) AS BIGINT) +
               (CASE WHEN CAST(floor($e) AS BIGINT) % 2 = 0
                     THEN 0 ELSE 1 END)
          ELSE CAST(round($e) AS BIGINT) END)"""

  /** The same embedded scrape rows as VALUES (see
    * CsvLoaders.writeDemoCsvs), through the same transform chain. */
  val q57Sql: String =
    s"""WITH raw(id_stacji, data_pomiaru, godzina_pomiaru, temperatura,
                suma_opadu, predkosc_wiatru, kierunek_wiatru,
                wilgotnosc_wzgledna, cisnienie) AS (VALUES
         (12375, '2024-12-25', 0, 1.4, 0.0, 3.2, 180, 65.0, 1013.2),
         (12375, '2024-12-25', 1, 2.1, 1.2, 6.8, 190, 75.0, 1011.8),
         (12500, '2024-12-25', 1, -0.3, 4.2, 12.1, 200, 92.0, NULL),
         (12375, '2024-12-25', 2, NULL, 0.0, 4.0, 170, 60.0, 1014.0),
         (12375, '2024-12-25', 3, 11.2, 0.0, 2.1, 160, 55.0, 1016.3),
         (12375, '2024-12-25', 3, 11.4, 0.0, 2.2, 165, 54.0, 1016.1),
         (12375, '2024-12-25', 4, 25.4, 0.0, 2.5, 150, 45.0, NULL),
         (12375, '2024-12-25', 5, 36.2, 6.5, 16.2, 140, 30.0, 1008.4)),
       keyed AS (
         SELECT CAST(id_stacji AS VARCHAR) || '-' || data_pomiaru || '-' ||
                  lpad(CAST(godzina_pomiaru AS VARCHAR), 2, '0') AS id,
                id_stacji AS station_id, data_pomiaru AS measurement_date,
                godzina_pomiaru AS hour,
                CAST(temperatura AS DOUBLE) AS temperature,
                CAST(suma_opadu AS DOUBLE) AS precipitation_mm,
                CAST(predkosc_wiatru AS DOUBLE) AS wind_speed_raw,
                CAST(kierunek_wiatru AS BIGINT) AS wind_direction_deg,
                CAST(wilgotnosc_wzgledna AS DOUBLE) AS humidity_percent,
                CAST(cisnienie AS DOUBLE) AS pressure_raw
         FROM raw
         WHERE temperatura IS NOT NULL AND predkosc_wiatru IS NOT NULL),
       dd AS (
         SELECT * FROM (
           SELECT *, row_number() OVER (
             PARTITION BY station_id, measurement_date, hour
             ORDER BY temperature ASC, pressure_raw ASC NULLS LAST) AS rn
           FROM keyed) WHERE rn = 1),
       drv AS (
         SELECT id, temperature,
                ${broundSql("coalesce(precipitation_mm, 0)")} AS fall_mm,
                CASE WHEN temperature < 2.0 THEN 'snow' ELSE 'rain' END
                  AS fall_type,
                ${broundSql("coalesce(wind_speed_raw, 0)")}
                  AS wind_speed_mps,
                wind_direction_deg, humidity_percent,
                ${broundSql("coalesce(pressure_raw, 1013)")} AS pressure_hpa
         FROM dd),
       scored AS (
         SELECT *,
                (CASE WHEN temperature BETWEEN 10.0 AND 25.0 THEN 2
                      WHEN temperature >= 2.0 AND temperature < 10.0 THEN 1
                      WHEN temperature < 2.0 OR temperature > 35.0 THEN -1
                      ELSE 0 END) +
                (CASE WHEN wind_speed_mps < 5.0 THEN 2
                      WHEN wind_speed_mps < 10.0 THEN 1
                      WHEN wind_speed_mps > 15.0 THEN -1 ELSE 0 END) +
                (CASE WHEN humidity_percent < 70.0 THEN 1
                      WHEN humidity_percent > 90.0 THEN -1 ELSE 0 END) +
                (CASE WHEN fall_mm = 0.0 THEN 2
                      WHEN fall_mm > 5.0 THEN -1 ELSE 0 END) AS score
         FROM drv)
       SELECT id, temperature, fall_mm, fall_type, wind_speed_mps,
              wind_direction_deg, humidity_percent, pressure_hpa,
              CASE WHEN score >= 6 THEN 'ludicrously-divine'
                   WHEN score >= 4 THEN 'titanically-passable'
                   WHEN score >= 2 THEN 'nobly-sufficient'
                   WHEN score >= 0 THEN 'courageously-subpar'
                   ELSE 'opera-level-atrocious' END AS general_circumstances
       FROM scored ORDER BY id"""

  // --- q58: delays CSV loader end-to-end (NaN vehicle edge) ------------
  def q58DelaysCsv(s: SparkSession, dir: String): DataFrame =
    CsvLoaders.delaysFromDemoCsv(s, demoDir)
      .orderBy("route", "timestamp", "stop_name")

  val q58Sql: String =
    """WITH raw(route, vehicle_no, stop_name, delay, ts) AS (VALUES
         ('R10', '1001', 'stop-alpha', '5 min', '2024-12-25T08:27:43'),
         ('R10', NULL, 'stop-beta', '3 min przed czasem',
          '2024-12-25T08:41:02'),
         ('R22', '1002', 'stop-gamma', '0 min', '2024-12-25T09:05:10'),
         ('R22', '1003', 'stop-delta', '12 min', '2024-12-25T09:59:59'),
         ('R7', '1001', 'stop-alpha', '7 min przed czasem',
          '2024-12-25T23:30:00'))
       SELECT route, vehicle_no, stop_name,
              (CASE WHEN delay LIKE '%min przed czasem%' THEN -1 ELSE 1 END) *
                CAST(regexp_extract(delay, '^([0-9]+)', 1) AS INTEGER)
                AS delay_mins,
              date_trunc('hour', CAST(ts AS TIMESTAMP)) AS timestamp
       FROM raw ORDER BY route, timestamp, stop_name"""

  // --- q140: right-to-be-forgotten corpus erasure ----------------------
  /** The MERGE matrix's last branch (WHEN MATCHED DELETE), framed as
    * the operation a training corpus actually runs it for: a deletion
    * request (every doc_id ≡ 0 mod 7) erased from a published corpus
    * via [[graft.operators.Merge.eraseParquet]] — only the files
    * containing a requested key are rewritten, the rest of the corpus
    * stays byte-identical (MaintenanceSpec pins both the untouched-file
    * bytes and the touched-file count). Output: per-language census of
    * the surviving corpus, hash-equal to the oracle's direct
    * anti-filter — proving the file-granular rewrite deleted exactly
    * the requested keys, nothing else. */
  def q140CorpusErasure(s: SparkSession, dir: String): DataFrame = {
    val root = java.nio.file.Files
      .createTempDirectory(java.nio.file.Paths.get(
        sys.props.getOrElse("java.io.tmpdir", "/tmp")), "graft_erase_")
      .toString
    try {
      val docs = graft.io.Sources.table(s, dir, "documents")
        .select("doc_id", "lang", "n_chars")
      val sink = s"$root/corpus"
      docs.repartition(8).write.parquet(sink)
      val request = docs.filter(col("doc_id") % 7 === 0).select("doc_id")
      graft.operators.Merge.eraseParquet(s, request, Seq("doc_id"), sink)
      val out = graft.operators.CommitLog.read(s, sink)
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          sum("n_chars").cast("long").as("chars_total"))
        .orderBy("lang")
      // materialize BEFORE the finally deletes the scratch sink
      val rows = out.collect()
      s.createDataFrame(java.util.Arrays.asList(rows: _*), out.schema)
    } finally {
      graft.io.Sources.deleteRecursively(root)
    }
  }

  val q140Sql: String =
    """SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
              CAST(sum(n_chars) AS BIGINT) AS chars_total
       FROM documents WHERE doc_id % 7 <> 0
       GROUP BY lang ORDER BY lang"""

  // --- q151: snapshot time travel over the commit log ------------------
  /** Table-format time travel on plain parquet: two `keepReplaced`
    * MERGEs advance the ledger through three commit-log generations,
    * and [[graft.operators.CommitLog.readAt]] reads EVERY generation
    * back — the pre-update snapshots — from the retained manifests +
    * replaced files, with zero data copied (history = the files a
    * default-GC rewrite would have deleted). Output: per-generation
    * row count and balance total, each exactly predictable from the
    * base table, so the oracle pins that every snapshot reads as the
    * ledger state at its commit point — not a mix, not the final
    * state. The reference's warehouse offers this only as BigQuery
    * time travel; here it falls out of the crash-atomicity manifests. */
  def q151TimeTravel(s: SparkSession, dir: String): DataFrame = {
    val root = java.nio.file.Files
      .createTempDirectory(java.nio.file.Paths.get(
        sys.props.getOrElse("java.io.tmpdir", "/tmp")), "graft_tt_")
      .toString
    try {
      val cust = graft.io.Sources.table(s, dir, "customer")
        .select(col("c_custkey"),
          expr("CAST(round(c_acctbal * 100) AS BIGINT)").as("bal_cents"))
      val sink = s"$root/ledger"
      cust.repartition(8).write.parquet(sink)
      // gen 0 = bootstrap (initial ledger), gen 1 = bonus for the
      // 0-mod-10 accounts, gen 2 = correction for the 5-mod-10 accounts
      graft.operators.Merge.mergeParquet(s,
        cust.filter(col("c_custkey") % 10 === 0)
          .withColumn("bal_cents", col("bal_cents") + 100000L),
        Seq("c_custkey"), sink, keepReplaced = true)
      graft.operators.Merge.mergeParquet(s,
        cust.filter(col("c_custkey") % 10 === 5)
          .withColumn("bal_cents", col("bal_cents") + 200000L),
        Seq("c_custkey"), sink, keepReplaced = true)
      val out = (0L to 2L).map { g =>
        graft.operators.CommitLog.readAt(s, sink, g)
          .agg(count(lit(1)).as("n_rows"),
            sum("bal_cents").as("bal_sum"))
          .select(lit(g).as("generation"), col("n_rows"), col("bal_sum"))
      }.reduce(_ unionByName _).orderBy("generation")
      val rows = out.collect()
      s.createDataFrame(java.util.Arrays.asList(rows: _*), out.schema)
    } finally {
      graft.io.Sources.deleteRecursively(root)
    }
  }

  val q151Sql: String =
    """WITH c AS (
         SELECT c_custkey,
                CAST(round(c_acctbal * 100) AS BIGINT) AS bal
         FROM customer)
       SELECT * FROM (
         SELECT CAST(0 AS BIGINT) AS generation,
                CAST(count(*) AS BIGINT) AS n_rows,
                CAST(sum(bal) AS BIGINT) AS bal_sum FROM c
         UNION ALL
         SELECT 1, CAST(count(*) AS BIGINT),
                CAST(sum(bal + CASE WHEN c_custkey % 10 = 0
                  THEN 100000 ELSE 0 END) AS BIGINT) FROM c
         UNION ALL
         SELECT 2, CAST(count(*) AS BIGINT),
                CAST(sum(bal
                  + CASE WHEN c_custkey % 10 = 0 THEN 100000 ELSE 0 END
                  + CASE WHEN c_custkey % 10 = 5 THEN 200000 ELSE 0 END)
                  AS BIGINT) FROM c
       ) ORDER BY generation"""

  // --- q158: calendar TTL retention (metadata-only partition drop) -----
  /** The lifecycle step between compaction and erasure: retire a
    * day-partitioned corpus's oldest days by DIRECTORY VALUE —
    * [[graft.operators.Upsert.dropPartitionsParquet]] reads zero data
    * (the calendar lives in the partition names), commits the shrunk
    * manifest, then GCs the dropped files. The policy here is
    * data-dependent ("drop the two oldest days present") yet still
    * metadata-only; the census of the surviving sink is exactly
    * reproducible by the oracle's day-filtered aggregate. */
  def q158TtlRetention(s: SparkSession, dir: String): DataFrame = {
    val root = java.nio.file.Files
      .createTempDirectory(java.nio.file.Paths.get(
        sys.props.getOrElse("java.io.tmpdir", "/tmp")), "graft_ttl_")
      .toString
    try {
      val ev = graft.io.Sources.table(s, dir, "events")
        .select(col("event_id"),
          expr("CAST(date_format(ts, 'yyyyMMdd') AS LONG)").as("day_id"),
          expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
      val sink = s"$root/events_by_day"
      ev.repartition(col("day_id"))
        .write.partitionBy("day_id").parquet(sink)
      graft.operators.Upsert.dropPartitionsParquet(s, sink, "day_id",
        values => {
          val days = values.map(_.toLong).sorted
          days.take(2).map(_.toString).toSet // the two oldest days
        })
      val out = graft.operators.CommitLog.read(s, sink)
        .groupBy(col("day_id").cast("long").as("day_id"))
        .agg(count(lit(1)).as("n_events"), sum("cents").as("cents_sum"))
        .orderBy("day_id")
      val rows = out.collect()
      s.createDataFrame(java.util.Arrays.asList(rows: _*), out.schema)
    } finally {
      graft.io.Sources.deleteRecursively(root)
    }
  }

  val q158Sql: String =
    """WITH ev AS (
         SELECT CAST(strftime(ts, '%Y%m%d') AS BIGINT) AS day_id,
                CAST(round(value * 100) AS BIGINT) AS cents
         FROM events),
       oldest AS (
         SELECT day_id FROM (SELECT DISTINCT day_id FROM ev)
         ORDER BY day_id LIMIT 2)
       SELECT day_id, CAST(count(*) AS BIGINT) AS n_events,
              CAST(sum(cents) AS BIGINT) AS cents_sum
       FROM ev WHERE day_id NOT IN (SELECT day_id FROM oldest)
       GROUP BY day_id ORDER BY day_id"""

  val all: Map[String, Q] = Map(
    "q36_merge_update" -> q36MergeUpdate _,
    "q257_cdc_apply" -> q257CdcApply _,
    "q276_schema_evolution" -> q276SchemaEvolution _,
    "q140_corpus_erasure" -> q140CorpusErasure _,
    "q56_publish_idempotent" -> q56PublishIdempotent _,
    "q57_weather_csv" -> q57WeatherCsv _,
    "q58_delays_csv" -> q58DelaysCsv _,
    "q68_publish_incremental" -> q68PublishIncremental _,
    "q71_compact_sink" -> q71CompactSink _,
    "q72_replace_partitions" -> q72ReplacePartitions _,
    "q151_time_travel" -> q151TimeTravel _,
    "q158_ttl_retention" -> q158TtlRetention _,
  )

  val oracles: Map[String, String] = Map(
    "q36_merge_update" -> q36Sql,
    "q257_cdc_apply" -> q257Sql,
    "q276_schema_evolution" -> q276Sql,
    "q140_corpus_erasure" -> q140Sql,
    "q56_publish_idempotent" -> q56Sql,
    "q57_weather_csv" -> q57Sql,
    "q58_delays_csv" -> q58Sql,
    "q68_publish_incremental" -> q68Sql,
    "q71_compact_sink" -> q71Sql,
    "q72_replace_partitions" -> q72Sql,
    "q151_time_travel" -> q151Sql,
    "q158_ttl_retention" -> q158Sql,
  )
}
