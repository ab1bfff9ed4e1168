package graft.queries

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.plan.SyntheticPartition
import graft.plans.SyntheticPartitionPruning
import graft.sink.SchemaSync

/** Coverage queries for the remaining SURVEY §2 operators: synthetic-
  * partition pruning end-to-end, bucket-column choice, rollup aggregation,
  * ORC staging, schema evolution. */
object ExtraQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  private def dsumSql(c: String): String =
    s"CAST(SUM(CAST($c AS DECIMAL(18,2))) AS DOUBLE)"

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    /** End-to-end synthetic-partition pruning: offload orders partitioned by
      * the month key, register the Catalyst injection rule, filter on the
      * SOURCE column only — the derived predicate prunes partitions and the
      * result must equal filtering the source directly (the oracle). */
    "q38_partition_prune" -> { (s, dir) =>
      // deterministic offloaded copy, reused across invocations in one
      // process run (keyed by sf dir; rebuilt if absent)
      val base = s"${System.getProperty("java.io.tmpdir")}/graft_prune_v1_" +
        dir.replaceAll("[^A-Za-z0-9]", "_")
      if (!Files.exists(java.nio.file.Paths.get(s"$base/orders/_SUCCESS")))
        t(s, dir, "orders")
          .withColumn("goe_part_m_o_orderdate",
            SyntheticPartition.dateStringKey(col("o_orderdate"), "M"))
          .write.mode("overwrite").partitionBy("goe_part_m_o_orderdate")
          .parquet(s"$base/orders")
      if (!s.experimental.extraOptimizations.contains(SyntheticPartitionPruning))
        s.experimental.extraOptimizations =
          s.experimental.extraOptimizations :+ SyntheticPartitionPruning
      s.read.parquet(s"$base/orders")
        .filter(col("o_orderdate") >= lit("1998-01-01").cast("timestamp"))
        .groupBy(col("goe_part_m_o_orderdate"))
        .agg(count(lit(1)).as("n"),
          sum(col("o_totalprice").cast("decimal(18,2)")).cast("double")
            .as("sum_price"))
        .orderBy(col("goe_part_m_o_orderdate"))
    },

    /** Bucket-hash column choice: pick the highest-NDV candidate
      * (reference `goe.py:2121-2154`). */
    "q39_bucket_choice" -> { (s, dir) =>
      t(s, dir, "lineitem")
        .agg(
          countDistinct(col("l_partkey")).as("ndv_partkey"),
          countDistinct(col("l_suppkey")).as("ndv_suppkey"),
          countDistinct(col("l_returnflag")).as("ndv_returnflag"))
        .withColumn("chosen",
          when(col("ndv_partkey") >= col("ndv_suppkey") &&
               col("ndv_partkey") >= col("ndv_returnflag"), lit("l_partkey"))
            .when(col("ndv_suppkey") >= col("ndv_returnflag"), lit("l_suppkey"))
            .otherwise(lit("l_returnflag")))
    },

    /** Rollup (subtotal) aggregation over the validation group keys. */
    "q40_rollup" -> { (s, dir) =>
      t(s, dir, "lineitem")
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"),
          sum(col("l_quantity").cast("decimal(18,2)")).cast("double")
            .as("sum_qty"))
        .select(
          coalesce(col("l_returnflag"), lit("(all)")).as("l_returnflag"),
          coalesce(col("l_linestatus"), lit("(all)")).as("l_linestatus"),
          col("n"), col("sum_qty"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    },

    /** ORC as the second staging format (no Avro module in this build):
      * write the slice to ORC, read it back, aggregate — the oracle
      * aggregates the source directly, so the round-trip must be lossless. */
    "q41_orc_stage" -> { (s, dir) =>
      val base = Files.createTempDirectory("graft_orc_q").toString
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") < lit("1996-01-01").cast("timestamp"))
        .write.format("orc").save(s"$base/stage")
      s.read.format("orc").load(s"$base/stage")
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"),
          sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double")
            .as("sum_price"))
        .orderBy(col("l_returnflag"))
    },

    /** The reference's emitted scalar-function vocabulary (SURVEY §2.6) in
      * one projection: substr/lpad/length/instr/translate/regexp_replace/
      * floor/mod/abs/round/base64/case — all codegen'd builtins. */
    "q43_scalar_funcs" -> { (s, dir) =>
      t(s, dir, "part")
        .filter(col("p_partkey") < 300)
        .select(
          col("p_partkey"),
          substring(col("p_type"), 1, 5).as("f_substr"),
          lpad(col("p_size").cast("string"), 4, "0").as("f_lpad"),
          length(col("p_name")).as("f_length"),
          instr(col("p_type"), "a").as("f_instr"),
          translate(col("p_brand"), "#", "-").as("f_translate"),
          regexp_replace(col("p_name"), "[aeiou]", "").as("f_regexp"),
          floor(col("p_retailprice") / 100.0).cast("long").as("f_floor"),
          pmod(col("p_partkey"), lit(7L)).as("f_mod"),
          abs(col("p_size") - 25).as("f_abs"),
          round(col("p_retailprice").cast("decimal(12,2)"), 1).as("f_round"),
          base64(encode(col("p_brand"), "UTF-8")).as("f_base64"),
          when(col("p_size") > 25, lit("big")).otherwise(lit("small"))
            .as("f_case"))
        .orderBy(col("p_partkey"))
    },

    /** Sliding-window event rates (each event in 4 overlapping windows). */
    "q44_events_sliding" -> { (s, dir) =>
      graft.streaming.Events.slidingCounts(t(s, dir, "events"))
        .select(
          date_format(col("window_start"), "yyyy-MM-dd HH:mm:ss")
            .as("window_start"),
          col("event_type"), col("n"))
        .orderBy(col("window_start"), col("event_type"))
    },

    /** CUBE over the validation keys (all grouping-set combinations). */
    "q45_cube" -> { (s, dir) =>
      // fanOut: the 4-way cube Expand + decimal partial aggregation
      // otherwise run inside the single-split scan task (profiled
      // 3 jobs / 5 tasks, 1.35 s serial)
      Tables.fanOut(t(s, dir, "lineitem"))
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"),
          sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double")
            .as("sum_price"))
        .select(
          coalesce(col("l_returnflag"), lit("(all)")).as("l_returnflag"),
          coalesce(col("l_linestatus"), lit("(all)")).as("l_linestatus"),
          col("n"), col("sum_price"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    },

    /** Ordered string aggregation (deterministic listagg). */
    "q46_string_agg" -> { (s, dir) =>
      t(s, dir, "nation")
        .join(t(s, dir, "region"), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"))
        .agg(
          concat_ws(",", array_sort(collect_list(col("n_name"))))
            .as("nations"),
          count(lit(1)).as("n"))
        .orderBy(col("r_name"))
    },

    /** SQL-interface query: the engine surface through spark.sql with
      * registered views (EXISTS + scalar subquery + window in one). */
    "q47_sql_interface" -> { (s, dir) =>
      graft.Tables.registerAll(s, dir)
      s.sql("""
        SELECT o_orderpriority,
               COUNT(*) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                 AS sum_price
        FROM orders
        WHERE EXISTS (SELECT 1 FROM lineitem
                      WHERE l_orderkey = o_orderkey
                        AND l_shipdate > o_orderdate)
          AND o_totalprice > (SELECT CAST(SUM(CAST(o_totalprice AS
                DECIMAL(18,2))) AS DOUBLE) / COUNT(*) * 0.5 FROM orders)
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority""")
    },

    /** As-of (temporal) join: each purchase matched to the user's latest
      * click at or before it — union + carry-forward window (one shuffle on
      * user_id, linear; never the quadratic per-key fan-out join). */
    "q59_asof_join" -> { (s, dir) =>
      val ev = t(s, dir, "events")
      val out = graft.operators.Joins.asOfJoin(
        left = ev.filter(col("event_type") === "purchase")
          .select("user_id", "ts", "event_id"),
        right = ev.filter(col("event_type") === "click"),
        keyCols = Seq("user_id"), tsCol = "ts",
        rightCols = Seq("value"), rightTiebreak = "event_id")
      val fmt = "yyyy-MM-dd HH:mm:ss.SSSSSS"
      out.select(col("user_id"), col("event_id"),
          date_format(col("ts"), fmt).as("ts"),
          date_format(col("matched_ts"), fmt).as("matched_ts"),
          col("matched_event_id"), col("matched_value"))
        .orderBy(col("event_id"))
    },

    /** Interval/range join: orders priced into variable-width bands via the
      * bucketed equi-join (never a nested-loop theta join). */
    "q60_range_join" -> { (s, dir) =>
      import s.implicits._
      val bands = Seq(
        ("micro", 0.0, 50000.0), ("small", 50000.0, 150000.0),
        ("mid", 150000.0, 300000.0), ("large", 300000.0, 450000.0),
        ("huge", 450000.0, 600000.0)).toDF("band", "lo", "hi")
      graft.operators.Joins.rangeJoin(
          t(s, dir, "orders"), "o_totalprice", bands, "lo", "hi",
          bucketWidth = 50000.0)
        .groupBy(col("band"))
        .agg(count(lit(1)).as("n"),
          sum(col("o_totalprice").cast("decimal(18,2)")).cast("double")
            .as("sum_price"))
        .orderBy(col("band"))
    },

    /** Subpartition-granular offload: a composite catalog (top-level LIST on
      * l_returnflag, RANGE subpartitions on ship month) is planned at
      * SUBPARTITION grain with the common-boundary guard, then exactly the
      * planned subpartitions are offloaded. The catalog probe is ONE
      * metadata-scale aggregate (flags × months ≈ 250 rows at any SF); the
      * data scan reads only the planned slice. */
    "q51_subpart_offload" -> { (s, dir) =>
      import graft.plan.{Boundary, PartitionPlanner, SourcePartition}
      import Boundary.{MaxValue, Value}
      val li = t(s, dir, "lineitem")
        .withColumn("sub_m", date_format(col("l_shipdate"), "yyyy-MM"))
      val cat = li.groupBy(col("l_returnflag").as("flag"), col("sub_m"))
        .agg(count(lit(1)).as("rows")).collect()
      val parents = cat.groupBy(_.getString(0)).toSeq.sortBy(_._1)
        .zipWithIndex.map { case ((flag, rows), i) =>
          val subs = rows.sortBy(_.getString(1)).zipWithIndex.map {
            case (r, j) => SourcePartition(s"${flag}_${r.getString(1)}", j,
              Seq(Value(r.getString(1))), r.getLong(2), r.getLong(2))
          }
          SourcePartition(flag, i, Seq(MaxValue), 0L, 0L,
            subpartitions = subs.toSeq)
        }
      val planned = PartitionPlanner.subpartitionRangeIpa(parents,
        offloadedHwm = Some(Seq(Value("1995-06"))),
        lessThan = Some(Seq(Value("1997-01")))) match {
        case Right(p) => p
        case Left(e) => throw new IllegalStateException(e)
      }
      val months = planned.map(_.highValues.head)
        .collect { case Value(v: String) => v }.distinct
      li.filter(col("sub_m").isInCollection(months))
        .groupBy(col("sub_m"))
        .agg(count(lit(1)).as("n"),
          sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double")
            .as("sum_price"))
        .orderBy(col("sub_m"))
    },

    /** LIST-as-RANGE planning: month-valued LIST partitions with scrambled
      * catalog positions; the planner must sort by HIGH VALUE and treat the
      * HWM as inclusive (like-for-like), then the planned value set drives
      * the offload slice. */
    "q52_list_as_range" -> { (s, dir) =>
      import graft.plan.{Boundary, PartitionPlanner, SourcePartition}
      import Boundary.Value
      val li = t(s, dir, "lineitem")
        .withColumn("m", date_format(col("l_shipdate"), "yyyy-MM"))
      val cat = li.groupBy(col("m")).agg(count(lit(1)).as("rows")).collect()
      // catalog position deliberately NOT value order (reverse) — LIST
      // catalog order is arbitrary and the planner must not trust it
      val parts = cat.sortBy(_.getString(0)).reverse.zipWithIndex.map {
        case (r, i) => SourcePartition(s"p_${r.getString(0)}", i,
          Seq(Value(r.getString(0))), r.getLong(1), r.getLong(1))
      }
      val planned = PartitionPlanner.listAsRangeIpa(parts.toSeq,
        offloadedHwm = Some(Seq(Value("1996-06"))),
        lessOrEqual = Some(Seq(Value("1998-01"))))
      val months = planned.map(_.highValues.head)
        .collect { case Value(v: String) => v }
      require(months == months.sorted, "planner must emit value order")
      li.filter(col("m").isInCollection(months))
        .groupBy(col("m"))
        .agg(count(lit(1)).as("n"),
          sum(col("l_quantity").cast("decimal(18,2)")).cast("double")
            .as("sum_qty"))
        .orderBy(col("m"))
    },

    /** Data-type override controls end-to-end: offload orders with
      * per-type-class column overrides (--integer-4-columns analogue on the
      * key, DECIMAL(12,2) on the price, --date-columns on the timestamp,
      * unicode semantics on the status) and read back the final table — the
      * oracle applies the same conversions in SQL, so the overridden load
      * must be value- and type-exact. */
    "q50_type_overrides" -> { (s, dir) =>
      import graft.types.TypeOverrides
      val base = Files.createTempDirectory("graft_tov_q").toString
      val cfg = graft.orchestrate.OffloadRunner.OffloadConfig(
        sourceTable = "orders_tov",
        sourcePath = s"$dir/orders.parquet",
        stagingPath = s"$base/staging",
        finalPath = s"$base/final",
        metadataDir = s"$base/meta",
        typeOverrides = TypeOverrides(
          integer4 = Seq("o_orderkey"),
          integer8 = Seq("o_custkey"),
          decimals = Seq(TypeOverrides.DecimalOverride(
            Seq("o_totalprice"), 12, 2)),
          dates = Seq("o_orderdate"),
          unicodeStrings = Seq("o_order*status"))) // wildcard expansion path
      val steps = graft.orchestrate.OffloadRunner.offload(s, cfg)
      require(steps.forall(_.ok), steps.mkString("\n"))
      // The load stores DECIMAL(12,2) (that IS the override feature); the
      // comparison surface casts back to DOUBLE because the driver hashes
      // stringified values and decimal readback renders trailing-zero cents
      // ('205941.60') where the oracle's float64 fetch gives '205941.6'.
      s.read.parquet(s"$base/final")
        .withColumn("o_totalprice", col("o_totalprice").cast("double"))
        .orderBy(col("o_orderkey"))
    },

    /** Z-order clustering: Morton code of (custkey, orderkey), bucketed —
      * the multi-dim layout key behind [[graft.plan.ZOrder.zorderWrite]].
      * The five-op bit spread runs verbatim in the DuckDB oracle, pinning
      * the interleave cross-engine. */
    "q69_zorder" -> { (s, dir) =>
      val o = t(s, dir, "orders")
      o.withColumn("zval",
          graft.plan.ZOrder.zvalue2(col("o_custkey"), col("o_orderkey")))
        .groupBy(shiftrightunsigned(col("zval"), 20).as("zbucket"))
        .agg(count(lit(1)).as("n"),
          min(col("o_custkey")).as("min_cust"),
          max(col("o_custkey")).as("max_cust"),
          min(col("o_orderkey")).as("min_ord"),
          max(col("o_orderkey")).as("max_ord"))
        .orderBy(col("zbucket"))
    },

    /** Exact quantile column stats per priority class — equi-height
      * histogram boundaries (TableStats.quantileProfile, exact mode). */
    "q71_quantile_stats" -> { (s, dir) =>
      graft.source.TableStats.quantileProfile(
        t(s, dir, "orders"), "o_totalprice", "o_orderpriority")
    },

    /** Offload-type state machine pinned as a VALUES oracle (the q37
      * treatment): every (from, to, forceReset) transition the reference
      * allows or refuses, evaluated through the real code path. */
    "q76_offload_type_fsm" -> { (s, dir) =>
      import graft.plan.OffloadType
      import graft.plan.OffloadType.{Full, Incremental}
      val cases: Seq[(String, String, Boolean)] = Seq(
        ("none", "FULL", false), ("none", "INCREMENTAL", false),
        ("FULL", "FULL", false), ("FULL", "INCREMENTAL", false),
        ("FULL", "INCREMENTAL", true), ("INCREMENTAL", "FULL", false),
        ("INCREMENTAL", "INCREMENTAL", false))
      def parse(v: String): Option[graft.plan.OffloadType] = v match {
        case "none" => None
        case "FULL" => Some(Full)
        case "INCREMENTAL" => Some(Incremental)
      }
      import s.implicits._
      cases.map { case (f, t, r) =>
        val out = OffloadType.transition(parse(f),
          if (t == "FULL") Full else Incremental, r)
        (f, t, r, out.isRight)
      }.toDF("from_state", "to_state", "force_reset", "allowed")
        .orderBy(col("from_state"), col("to_state"), col("force_reset"))
    },

    /** Hybrid-view boundary-clause builder pinned as a VALUES oracle:
      * tuple-greater-than over rendered HWM literals, MAXVALUE slots
      * unbounded — the clause the listener's views endpoint serves. */
    "q78_boundary_literals" -> { (s, dir) =>
      import graft.plan.Boundary
      val cases = Seq(
        ("single", Seq("k"), Seq("10")),
        ("tuple", Seq("d", "k"), Seq("DATE '1998-01-01'", "15000")),
        ("max_first", Seq("a", "b"), Seq("MAXVALUE", "5")),
        ("max_second", Seq("a", "b"), Seq("10", "MAXVALUE")),
        ("triple", Seq("a", "b", "c"), Seq("1", "2", "3")))
      import s.implicits._
      cases.map { case (label, cols, lits) =>
        (label, Boundary.Sql.greaterThanLiterals(cols, lits))
      }.toDF("c", "clause").orderBy(col("c"))
    },

    /** DDL type-mapping contract pinned as a VALUES oracle: the canonical
      * type → SparkSQL / BigQuery DDL rendering for every interesting
      * type, incl. the NUMERIC/BIGNUMERIC precision-scale boundary. */
    "q77_ddl_types" -> { (s, dir) =>
      import graft.types.{CanonicalColumn, CanonicalType => CT}
      import graft.sink.DdlRenderer
      val cases: Seq[(String, CT)] = Seq(
        "binary" -> CT.Binary, "bool" -> CT.Boolean1,
        "date" -> CT.Date, "dec_12_2" -> CT.Decimal(Some(12), Some(2)),
        "dec_38_10" -> CT.Decimal(Some(38), Some(10)),
        "double" -> CT.Double8, "int38" -> CT.Integer38,
        "int4" -> CT.Integer4, "string" -> CT.VariableString,
        "ts" -> CT.Timestamp, "tstz" -> CT.TimestampTz)
      import s.implicits._
      cases.map { case (label, t) =>
        val c = CanonicalColumn(label, t)
        (label, DdlRenderer.renderType(c, DdlRenderer.Dialect.SparkSql),
          DdlRenderer.renderType(c, DdlRenderer.Dialect.BigQuery))
      }.toDF("t", "spark_sql", "bigquery")
        .orderBy(col("t"))
    },

    /** Legacy-backend DDL render surface pinned as a VALUES oracle: the
      * canonical type → Hive / Snowflake / Synapse DDL rendering, incl.
      * the Hive BIGINT integer collapse, the even-scale decimal UDF
      * alignment (hadoop_backend_api.py:259-302), Snowflake's NUMBER
      * precision pinning (snowflake_backend_api.py:2169-2208) and the
      * Synapse T-SQL matrix (synapse_backend_api.py:2648-2768). The
      * backend *APIs* stay a documented non-goal (goe.py:2689-2691); the
      * DDL text is the part a change-controlled legacy warehouse still
      * needs. */
    "q83_ddl_legacy" -> { (s, dir) =>
      import graft.types.{CanonicalColumn, CanonicalType => CT}
      import graft.sink.DdlRenderer
      val cases: Seq[(String, CT)] = Seq(
        "binary" -> CT.Binary, "bool" -> CT.Boolean1,
        "date" -> CT.Date, "dec_10_3" -> CT.Decimal(Some(10), Some(3)),
        "dec_38_10" -> CT.Decimal(Some(38), Some(10)),
        "double" -> CT.Double8, "int38" -> CT.Integer38,
        "int4" -> CT.Integer4, "interval_ds" -> CT.IntervalDs,
        "string" -> CT.VariableString, "time" -> CT.Time,
        "ts" -> CT.Timestamp, "tstz" -> CT.TimestampTz)
      import s.implicits._
      cases.map { case (label, tp) =>
        val c = CanonicalColumn(label, tp)
        (label, DdlRenderer.renderType(c, DdlRenderer.Dialect.Hive),
          DdlRenderer.renderType(c, DdlRenderer.Dialect.Snowflake),
          DdlRenderer.renderType(c, DdlRenderer.Dialect.Synapse),
          DdlRenderer.renderType(c, DdlRenderer.Dialect.Impala))
      }.toDF("t", "hive", "snowflake", "synapse", "impala")
        .orderBy(col("t"))
    },

    /** Salted two-phase aggregation produces results identical to the
      * direct groupBy — the oracle IS the direct aggregation, so the skew
      * tooling's algebraic-composition contract is hash-checked, not just
      * spec-asserted. Sums ride an exact decimal cast through both phases. */
    "q73_salted_agg" -> { (s, dir) =>
      val li = t(s, dir, "lineitem")
        .withColumn("qty_dec", col("l_quantity").cast("decimal(18,2)"))
      graft.plan.Salting.saltedAgg(li, Seq("l_returnflag"),
          sumCols = Seq("qty_dec"), minMaxCols = Seq("l_extendedprice"))
        .select(col("l_returnflag"), col("n"),
          col("sum_qty_dec").cast("double").as("sum_qty"),
          col("min_l_extendedprice").as("min_price"),
          col("max_l_extendedprice").as("max_price"))
        .orderBy(col("l_returnflag"))
    },

    /** Incremental Update end-to-end with a REAL oracle: write a
      * month-partitioned target, apply an upsert (every 97th key's price
      * doubled) plus deletes (every 101st key), read the final table back —
      * the oracle computes the same final state relationally. Delete wins
      * over change for keys hit by both. */
    "q74_incremental_update" -> { (s, dir) =>
      val base = Files.createTempDirectory("graft_iu_q").toString
      // year granularity: the upsert's changed keys touch every period, so
      // partition count drives nothing but file churn here
      val orders = t(s, dir, "orders")
        .withColumn("om", date_format(col("o_orderdate"), "yyyy"))
      orders.write.partitionBy("om").parquet(s"$base/t")
      val changes = orders.filter(pmod(col("o_orderkey"), lit(97)) === 0)
        .withColumn("o_totalprice", col("o_totalprice") * 2)
      val deletes = orders.filter(pmod(col("o_orderkey"), lit(101)) === 0)
        .select(col("o_orderkey"))
      graft.sink.IncrementalUpdate.upsertPartitions(s, s"$base/t",
        changes, Seq("o_orderkey"), "om", Some(deletes))
      s.read.parquet(s"$base/t")
        .groupBy(col("om"))
        .agg(count(lit(1)).as("n"),
          sum(col("o_totalprice").cast("decimal(18,2)")).cast("double")
            .as("sum_price"))
        .orderBy(col("om"))
    },

    /** Schema evolution: v1 slice without the derived column, v2 slice with
      * it; mergeSchema read sees both, old rows null in the new column. */
    "q42_schema_evolution" -> { (s, dir) =>
      val base = Files.createTempDirectory("graft_evo_q").toString
      val orders = t(s, dir, "orders")
      orders.write.parquet(s"$base/t")
      val v2 = orders.withColumn("o_prio_digit",
        substring(col("o_orderpriority"), 1, 1).try_cast("int"))
      val plan = SchemaSync.analyze(v2, s.read.parquet(s"$base/t"), "t")
      require(plan.addedColumns.map(_.name) == Seq("o_prio_digit"),
        s"unexpected evolution plan: $plan")
      v2.write.mode("append").parquet(s"$base/t")
      SchemaSync.evolvedRead(s, s"$base/t")
        .agg(count(lit(1)).as("n_rows"),
          count(col("o_prio_digit")).as("n_evolved"),
          sum(col("o_prio_digit")).as("sum_digit"))
    })

  val oracles: Map[String, String] = Map(
    "q38_partition_prune" ->
      s"""SELECT strftime(o_orderdate, '%Y-%m') AS goe_part_m_o_orderdate,
         COUNT(*) AS n, ${dsumSql("o_totalprice")} AS sum_price
         FROM orders WHERE o_orderdate >= TIMESTAMP '1998-01-01'
         GROUP BY 1 ORDER BY goe_part_m_o_orderdate""",

    "q39_bucket_choice" ->
      """SELECT ndv_partkey, ndv_suppkey, ndv_returnflag,
           CASE WHEN ndv_partkey >= ndv_suppkey
                 AND ndv_partkey >= ndv_returnflag THEN 'l_partkey'
                WHEN ndv_suppkey >= ndv_returnflag THEN 'l_suppkey'
                ELSE 'l_returnflag' END AS chosen
         FROM (SELECT COUNT(DISTINCT l_partkey) AS ndv_partkey,
                      COUNT(DISTINCT l_suppkey) AS ndv_suppkey,
                      COUNT(DISTINCT l_returnflag) AS ndv_returnflag
               FROM lineitem) x""",

    "q40_rollup" ->
      s"""SELECT COALESCE(l_returnflag, '(all)') AS l_returnflag,
           COALESCE(l_linestatus, '(all)') AS l_linestatus,
           COUNT(*) AS n, ${dsumSql("l_quantity")} AS sum_qty
         FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
         ORDER BY l_returnflag, l_linestatus""",

    "q41_orc_stage" ->
      s"""SELECT l_returnflag, COUNT(*) AS n,
         ${dsumSql("l_extendedprice")} AS sum_price
         FROM lineitem WHERE l_shipdate < TIMESTAMP '1996-01-01'
         GROUP BY l_returnflag ORDER BY l_returnflag""",

    "q59_asof_join" ->
      """WITH l AS (SELECT user_id, ts, event_id, 1 AS is_left,
             NULL::BIGINT AS r_event_id, NULL::TIMESTAMP AS r_ts,
             NULL::DOUBLE AS r_value
           FROM events WHERE event_type = 'purchase'),
         r AS (SELECT user_id, ts, NULL::BIGINT AS event_id, 0 AS is_left,
             event_id AS r_event_id, ts AS r_ts, value AS r_value
           FROM events WHERE event_type = 'click'),
         u AS (SELECT * FROM l UNION ALL SELECT * FROM r),
         m AS (SELECT *,
             last_value(r_event_id IGNORE NULLS) OVER w AS matched_event_id,
             last_value(r_ts IGNORE NULLS) OVER w AS matched_ts,
             last_value(r_value IGNORE NULLS) OVER w AS matched_value
           FROM u WINDOW w AS (PARTITION BY user_id
             ORDER BY ts, is_left, r_event_id ASC NULLS FIRST
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
         SELECT user_id, event_id,
           strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS ts,
           strftime(matched_ts, '%Y-%m-%d %H:%M:%S.%f') AS matched_ts,
           matched_event_id, matched_value
         FROM m WHERE is_left = 1 ORDER BY event_id""",

    "q60_range_join" ->
      s"""WITH bands(band, lo, hi) AS (VALUES
           ('micro', 0.0, 50000.0), ('small', 50000.0, 150000.0),
           ('mid', 150000.0, 300000.0), ('large', 300000.0, 450000.0),
           ('huge', 450000.0, 600000.0))
         SELECT band, COUNT(*) AS n, ${dsumSql("o_totalprice")} AS sum_price
         FROM orders JOIN bands
           ON lo <= o_totalprice AND o_totalprice < hi
         GROUP BY band ORDER BY band""",

    "q51_subpart_offload" ->
      s"""SELECT strftime(l_shipdate, '%Y-%m') AS sub_m, COUNT(*) AS n,
           ${dsumSql("l_extendedprice")} AS sum_price
         FROM lineitem
         WHERE strftime(l_shipdate, '%Y-%m') > '1995-06'
           AND strftime(l_shipdate, '%Y-%m') <= '1997-01'
         GROUP BY 1 ORDER BY sub_m""",

    "q52_list_as_range" ->
      s"""SELECT strftime(l_shipdate, '%Y-%m') AS m, COUNT(*) AS n,
           ${dsumSql("l_quantity")} AS sum_qty
         FROM lineitem
         WHERE strftime(l_shipdate, '%Y-%m') > '1996-06'
           AND strftime(l_shipdate, '%Y-%m') <= '1998-01'
         GROUP BY 1 ORDER BY m""",

    "q50_type_overrides" ->
      """SELECT CAST(o_orderkey AS INTEGER) AS o_orderkey,
           CAST(o_custkey AS BIGINT) AS o_custkey,
           o_orderstatus,
           CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS DOUBLE) AS o_totalprice,
           CAST(o_orderdate AS DATE) AS o_orderdate,
           o_orderpriority
         FROM orders ORDER BY o_orderkey""",

    "q69_zorder" ->
      s"""SELECT (zval >> 20) AS zbucket, COUNT(*) AS n,
           MIN(o_custkey) AS min_cust, MAX(o_custkey) AS max_cust,
           MIN(o_orderkey) AS min_ord, MAX(o_orderkey) AS max_ord
         FROM (SELECT *,
             ${graft.plan.ZOrder.zvalue2Sql("o_custkey", "o_orderkey")}
               AS zval
           FROM orders) z
         GROUP BY 1 ORDER BY zbucket""",

    "q71_quantile_stats" ->
      """SELECT o_orderpriority, COUNT(*) AS n,
           quantile_cont(o_totalprice, 0.25) AS p25,
           quantile_cont(o_totalprice, 0.50) AS p50,
           quantile_cont(o_totalprice, 0.75) AS p75,
           quantile_cont(o_totalprice, 0.95) AS p95
         FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""",

    "q78_boundary_literals" ->
      """SELECT * FROM (VALUES
           ('max_first', 'FALSE'),
           ('max_second', '(a > 10)'),
           ('single', '(k > 10)'),
           ('triple',
            '(a > 1) OR (a = 1 AND b > 2) OR (a = 1 AND b = 2 AND c > 3)'),
           ('tuple',
            '(d > DATE ''1998-01-01'') OR (d = DATE ''1998-01-01'' AND k > 15000)'))
         AS t(c, clause)
         ORDER BY c""",

    "q83_ddl_legacy" ->
      """SELECT * FROM (VALUES
           ('binary', 'BINARY', 'BINARY', 'VARBINARY(max)', 'STRING'),
           ('bool', 'BOOLEAN', 'BOOLEAN', 'BIT', 'BOOLEAN'),
           ('date', 'DATE', 'DATE', 'DATE', 'DATE'),
           ('dec_10_3', 'DECIMAL(18,4)', 'NUMBER(10,3)', 'NUMERIC(10,3)', 'DECIMAL(18,4)'),
           ('dec_38_10', 'DECIMAL(38,10)', 'NUMBER(38,10)', 'NUMERIC(38,10)', 'DECIMAL(38,10)'),
           ('double', 'DOUBLE', 'FLOAT', 'FLOAT', 'DOUBLE'),
           ('int38', 'DECIMAL(38,0)', 'NUMBER(38,0)', 'NUMERIC(38,0)', 'DECIMAL(38,0)'),
           ('int4', 'BIGINT', 'NUMBER(10,0)', 'INT', 'BIGINT'),
           ('interval_ds', 'STRING', 'TEXT', 'VARCHAR(100)', 'STRING'),
           ('string', 'STRING', 'TEXT', 'VARCHAR(max)', 'STRING'),
           ('time', 'STRING', 'TIME', 'TIME', 'STRING'),
           ('ts', 'TIMESTAMP', 'TIMESTAMP_NTZ', 'DATETIME2', 'TIMESTAMP'),
           ('tstz', 'TIMESTAMP', 'TIMESTAMP_TZ', 'DATETIMEOFFSET', 'TIMESTAMP'))
         AS t(t, hive, snowflake, synapse, impala)
         ORDER BY t""",

    "q77_ddl_types" ->
      """SELECT * FROM (VALUES
           ('binary', 'BINARY', 'BYTES'),
           ('bool', 'BOOLEAN', 'BOOL'),
           ('date', 'DATE', 'DATE'),
           ('dec_12_2', 'DECIMAL(12,2)', 'NUMERIC(12, 2)'),
           ('dec_38_10', 'DECIMAL(38,10)', 'BIGNUMERIC(38, 10)'),
           ('double', 'DOUBLE', 'FLOAT64'),
           ('int38', 'DECIMAL(38,0)', 'BIGNUMERIC(38, 0)'),
           ('int4', 'INT', 'INT64'),
           ('string', 'STRING', 'STRING'),
           ('ts', 'TIMESTAMP_NTZ', 'DATETIME'),
           ('tstz', 'TIMESTAMP', 'TIMESTAMP'))
         AS t(t, spark_sql, bigquery)
         ORDER BY t""",

    "q76_offload_type_fsm" ->
      """SELECT * FROM (VALUES
           ('FULL', 'FULL', false, true),
           ('FULL', 'INCREMENTAL', false, false),
           ('FULL', 'INCREMENTAL', true, true),
           ('INCREMENTAL', 'FULL', false, true),
           ('INCREMENTAL', 'INCREMENTAL', false, true),
           ('none', 'FULL', false, true),
           ('none', 'INCREMENTAL', false, true))
         AS t(from_state, to_state, force_reset, allowed)
         ORDER BY from_state, to_state, force_reset""",

    "q73_salted_agg" ->
      s"""SELECT l_returnflag, COUNT(*) AS n,
           ${dsumSql("l_quantity")} AS sum_qty,
           MIN(l_extendedprice) AS min_price,
           MAX(l_extendedprice) AS max_price
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",

    "q74_incremental_update" ->
      s"""WITH o AS (SELECT *, strftime(o_orderdate, '%Y') AS om
           FROM orders),
         f AS (SELECT om,
             CASE WHEN o_orderkey % 97 = 0 THEN o_totalprice * 2
                  ELSE o_totalprice END AS p
           FROM o WHERE o_orderkey % 101 <> 0)
         SELECT om, COUNT(*) AS n,
           CAST(SUM(CAST(p AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
         FROM f GROUP BY om ORDER BY om""",

    "q42_schema_evolution" ->
      """SELECT 2 * COUNT(*) AS n_rows, COUNT(*) AS n_evolved,
           CAST(SUM(TRY_CAST(substr(o_orderpriority, 1, 1) AS INT)) AS BIGINT)
             AS sum_digit
         FROM orders""",

    "q43_scalar_funcs" ->
      """SELECT p_partkey,
           substr(p_type, 1, 5) AS f_substr,
           lpad(CAST(p_size AS VARCHAR), 4, '0') AS f_lpad,
           length(p_name) AS f_length,
           instr(p_type, 'a') AS f_instr,
           translate(p_brand, '#', '-') AS f_translate,
           regexp_replace(p_name, '[aeiou]', '', 'g') AS f_regexp,
           CAST(FLOOR(p_retailprice / 100.0) AS BIGINT) AS f_floor,
           p_partkey % 7 AS f_mod,
           abs(p_size - 25) AS f_abs,
           CAST(round(CAST(p_retailprice AS DECIMAL(12,2)), 1) AS DECIMAL(12,1))
             AS f_round,
           base64(encode(p_brand)) AS f_base64,
           CASE WHEN p_size > 25 THEN 'big' ELSE 'small' END AS f_case
         FROM part WHERE p_partkey < 300 ORDER BY p_partkey""",

    "q44_events_sliding" ->
      """SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS window_start,
           event_type, COUNT(*) AS n
         FROM (
           SELECT e.event_type,
             time_bucket(INTERVAL '15 minutes', e.ts)
               - k.k * INTERVAL '15 minutes' AS ws
           FROM events e, (SELECT unnest(range(0, 4)) AS k) k) w
         GROUP BY ws, event_type ORDER BY window_start, event_type""",

    "q45_cube" ->
      s"""SELECT COALESCE(l_returnflag, '(all)') AS l_returnflag,
           COALESCE(l_linestatus, '(all)') AS l_linestatus,
           COUNT(*) AS n, ${dsumSql("l_extendedprice")} AS sum_price
         FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
         ORDER BY l_returnflag, l_linestatus""",

    "q46_string_agg" ->
      """SELECT r_name,
           string_agg(n_name, ',' ORDER BY n_name) AS nations,
           COUNT(*) AS n
         FROM nation JOIN region ON n_regionkey = r_regionkey
         GROUP BY r_name ORDER BY r_name""",

    "q47_sql_interface" ->
      """SELECT o_orderpriority, COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
             AS sum_price
         FROM orders
         WHERE EXISTS (SELECT 1 FROM lineitem
                       WHERE l_orderkey = o_orderkey
                         AND l_shipdate > o_orderdate)
           AND o_totalprice > (SELECT CAST(SUM(CAST(o_totalprice AS
                 DECIMAL(18,2))) AS DOUBLE) / COUNT(*) * 0.5 FROM orders)
         GROUP BY o_orderpriority ORDER BY o_orderpriority""")
}
