package graft.queries

import graft.queries.Tables.cdcView
import graft.queries.OracleDefs.{cdcView => CDC, CheckpointUs}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch-expressible analogs of every reference dataflow operator
  * (SURVEY §2), over the `events` table through the shared CDC
  * mapping. Each one is the operator the streaming engine runs,
  * restated so the DuckDB oracle can replay it: the correctness gate
  * for parse/filter/order/quorum/merge/stats semantics.
  */
object CdcQueries {

  val all: Seq[QueryDef] = Seq(

    // P1/P2 — parse + shape projection
    QueryDef("cdc_parse_project",
      s"""WITH $CDC
         |SELECT event_id, part, step_us, op, has_value, has_props
         |FROM cdc ORDER BY event_id""".stripMargin) { (s, d) =>
      cdcView(s, d)
        .select(col("event_id"), col("part"), col("step_us"), col("op"),
          col("has_value"), col("has_props"))
        .orderBy("event_id")
    },

    // P3 — checkpoint filter (skip already-applied)
    QueryDef("cdc_checkpoint_filter",
      s"""WITH $CDC
         |SELECT event_id, step_us, part, op FROM cdc
         |WHERE step_us > $CheckpointUs ORDER BY event_id""".stripMargin) { (s, d) =>
      // filter on the RAW ts column (integer-equivalent to the µs
      // predicate) so it pushes into the parquet scan; a predicate on
      // the derived step_us expression cannot be pushed
      val v = cdcView(s, d)
      v.filter(Tables.tsAfterUs(v, CheckpointUs))
        .select(col("event_id"), col("step_us"), col("part"), col("op"))
        .orderBy("event_id")
    },

    // O1/O2 — global merge order + bounded pop
    QueryDef("cdc_order_emit",
      s"""WITH $CDC
         |SELECT event_id, step_us, part FROM cdc
         |ORDER BY step_us, event_id LIMIT 1000""".stripMargin) { (s, d) =>
      cdcView(s, d)
        .orderBy(col("step_us"), col("event_id"))
        .select(col("event_id"), col("step_us"), col("part"))
        .limit(1000)
    },

    // A1 — per-partition latest heartbeat
    QueryDef("cdc_hb_latest",
      s"""WITH $CDC
         |SELECT part, max(step_us) AS hb_step, count(*) AS n
         |FROM cdc GROUP BY part ORDER BY part""".stripMargin) { (s, d) =>
      cdcView(s, d).groupBy("part")
        .agg(max("step_us").as("hb_step"), count(lit(1)).as("n"))
        .orderBy("part")
    },

    // A2/A3 — quorum = min over per-partition maxima; max-hb target
    QueryDef("cdc_quorum",
      s"""WITH $CDC,
         |m AS (SELECT part, max(step_us) AS mx FROM cdc GROUP BY part)
         |SELECT min(mx) AS quorum, max(mx) AS max_hb,
         |       CAST(count(*) AS BIGINT) AS n_parts FROM m""".stripMargin) { (s, d) =>
      cdcView(s, d).groupBy("part").agg(max("step_us").as("mx"))
        .agg(min("mx").as("quorum"), max("mx").as("max_hb"),
          count(lit(1)).as("n_parts"))
    },

    // P6 — strictly-below-quorum cut
    QueryDef("cdc_quorum_cut",
      s"""WITH $CDC,
         |m AS (SELECT part, max(step_us) AS mx FROM cdc GROUP BY part),
         |q AS (SELECT min(mx) AS qv FROM m)
         |SELECT event_type, count(*) AS n,
         |       CAST(sum(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT) AS sum_value_c
         |FROM cdc, q WHERE step_us < qv
         |GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, d) =>
      val c = cdcView(s, d)
      val q = c.groupBy("part").agg(max("step_us").as("mx"))
        .agg(min("mx").as("qv"))
      c.crossJoin(broadcast(q)).filter(col("step_us") < col("qv"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          (sum(col("value").cast("decimal(18,2)")) * 100)
            .cast("long").as("sum_value_c"))
        .orderBy("event_type")
    },

    // A5 — per-key LWW merge with column overlay + erase semantics
    QueryDef("cdc_lww_merge",
      s"""WITH $CDC,
         |r AS (SELECT *, row_number() OVER
         |        (PARTITION BY user_id ORDER BY step_us, event_id) AS rn
         |      FROM cdc),
         |e AS (SELECT *, max(CASE WHEN op = 1 THEN rn END) OVER
         |        (PARTITION BY user_id) AS erase_rn FROM r)
         |SELECT user_id,
         |  max_by(op, rn) AS final_op,
         |  max_by(value, rn) FILTER (WHERE op = 0 AND has_value
         |    AND rn > coalesce(erase_rn, 0)) AS last_value,
         |  max_by(props, rn) FILTER (WHERE op = 0 AND has_props
         |    AND rn > coalesce(erase_rn, 0)) AS last_props,
         |  count(*) AS n_changes
         |FROM e GROUP BY user_id ORDER BY user_id""".stripMargin) { (s, d) =>
      val wOrd = Window.partitionBy("user_id").orderBy("step_us", "event_id")
      val wAll = Window.partitionBy("user_id")
      cdcView(s, d)
        .withColumn("rn", row_number().over(wOrd))
        .withColumn("erase_rn",
          max(when(col("op") === 1, col("rn"))).over(wAll))
        .groupBy("user_id")
        .agg(
          expr("max_by(op, rn)").as("final_op"),
          expr("max_by(value, rn) FILTER (WHERE op = 0 AND has_value " +
            "AND rn > coalesce(erase_rn, 0))").as("last_value"),
          expr("max_by(props, rn) FILTER (WHERE op = 0 AND has_props " +
            "AND rn > coalesce(erase_rn, 0))").as("last_props"),
          count(lit(1)).as("n_changes"))
        .orderBy("user_id")
    },

    // P5/J1 — blocked-key filter as broadcast anti-join
    // The user_id % 7 restriction keeps BOTH sides nonzero at every
    // SF: in the synthetic events every user has >= 3 erases, so a
    // bare HAVING blocks everyone and the query returns 0 rows —
    // passing vacuously without exercising the anti-join.
    QueryDef("cdc_key_filter",
      s"""WITH $CDC,
         |blocked AS (SELECT user_id FROM cdc WHERE op = 1
         |            AND user_id % 7 = 0
         |            GROUP BY user_id HAVING count(*) >= 3)
         |SELECT event_type, count(*) AS n FROM cdc
         |WHERE user_id NOT IN (SELECT user_id FROM blocked)
         |GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, d) =>
      val c = cdcView(s, d)
      val blocked = c.filter(col("op") === 1 && pmod(col("user_id"), lit(7)) === 0)
        .groupBy("user_id")
        .agg(count(lit(1)).as("ne")).filter(col("ne") >= 3)
        .select("user_id")
      c.join(broadcast(blocked), Seq("user_id"), "left_anti")
        .groupBy("event_type").agg(count(lit(1)).as("n"))
        .orderBy("event_type")
    },

    // J2 — command-queue instruction match, last-wins
    QueryDef("cdc_cmd_match",
      s"""WITH $CDC,
         |i AS (SELECT *, row_number() OVER
         |        (PARTITION BY user_id ORDER BY step_us, event_id) AS rn
         |      FROM cdc WHERE event_type IN ('signup','purchase'))
         |SELECT user_id, max_by(event_type, rn) AS last_action,
         |       count(*) AS n_instr
         |FROM i GROUP BY user_id ORDER BY user_id""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("user_id").orderBy("step_us", "event_id")
      cdcView(s, d)
        .filter(col("event_type").isin("signup", "purchase"))
        .withColumn("rn", row_number().over(w))
        .groupBy("user_id")
        .agg(expr("max_by(event_type, rn)").as("last_action"),
          count(lit(1)).as("n_instr"))
        .orderBy("user_id")
    },

    // A6 — column-set grouping of generated statements
    QueryDef("cdc_colset_group",
      s"""WITH $CDC
         |SELECT CASE WHEN op = 1 THEN ''
         |            WHEN event_type = 'click' THEN 'value'
         |            WHEN event_type = 'view' THEN 'props'
         |            ELSE 'props,value' END AS colset,
         |       count(*) AS n
         |FROM cdc GROUP BY 1 ORDER BY colset""".stripMargin) { (s, d) =>
      cdcView(s, d)
        .withColumn("colset",
          when(col("op") === 1, "")
            .when(col("event_type") === "click", "value")
            .when(col("event_type") === "view", "props")
            .otherwise("props,value"))
        .groupBy("colset").agg(count(lit(1)).as("n"))
        .orderBy("colset")
    },

    // A7 — batch statistics
    QueryDef("cdc_batch_stats",
      s"""WITH $CDC
         |SELECT part, count(*) AS n_mods,
         |  CAST(sum(CASE WHEN op = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_upserts,
         |  CAST(sum(CASE WHEN op = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_erases,
         |  CAST(sum(length(props) + 16) AS BIGINT) AS est_bytes
         |FROM cdc GROUP BY part ORDER BY part""".stripMargin) { (s, d) =>
      cdcView(s, d).groupBy("part")
        .agg(count(lit(1)).as("n_mods"),
          sum(when(col("op") === 0, 1).otherwise(0)).cast("long").as("n_upserts"),
          sum(when(col("op") === 1, 1).otherwise(0)).cast("long").as("n_erases"),
          sum(length(col("props")) + 16).cast("long").as("est_bytes"))
        .orderBy("part")
    },

    // P4/ST3 — per-partition out-of-order detection
    QueryDef("cdc_out_of_order",
      s"""WITH $CDC,
         |t AS (SELECT *, max(step_us) OVER (PARTITION BY part
         |        ORDER BY event_id ROWS BETWEEN UNBOUNDED PRECEDING
         |        AND 1 PRECEDING) AS prev_max
         |      FROM cdc)
         |SELECT part,
         |  CAST(sum(CASE WHEN step_us < prev_max THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_late,
         |  count(*) AS n_total
         |FROM t GROUP BY part ORDER BY part""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("part").orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
      cdcView(s, d)
        .withColumn("prev_max", max("step_us").over(w))
        .groupBy("part")
        .agg(sum(when(col("step_us") < col("prev_max"), 1).otherwise(0))
          .cast("long").as("n_late"),
          count(lit(1)).as("n_total"))
        .orderBy("part")
    },

    // §1.4 — destination type-conversion matrix (JSON, base64, casts)
    QueryDef("cdc_type_convert",
      s"""WITH $CDC
         |SELECT event_id,
         |  CAST(json_extract_string(props, '$$.k') AS INT) AS k_int,
         |  to_base64(event_type::BLOB) AS b64,
         |  CAST(floor(value) AS BIGINT) AS value_floor,
         |  strftime(make_timestamp(step_us), '%Y-%m-%d') AS day
         |FROM cdc ORDER BY event_id""".stripMargin) { (s, d) =>
      cdcView(s, d)
        .select(col("event_id"),
          get_json_object(col("props"), "$.k").cast("int").as("k_int"),
          base64(col("event_type").cast("binary")).as("b64"),
          floor(col("value")).cast("long").as("value_floor"),
          date_format(timestamp_micros(col("step_us")), "yyyy-MM-dd").as("day"))
        .orderBy("event_id")
    },

    // S8 — state/recovery scan
    QueryDef("cdc_state_recovery",
      s"""WITH $CDC
         |SELECT max(step_us) AS step_id, max(event_id) AS tx_id,
         |       count(*) AS n_applied FROM cdc""".stripMargin) { (s, d) =>
      cdcView(s, d)
        .agg(max("step_us").as("step_id"), max("event_id").as("tx_id"),
          count(lit(1)).as("n_applied"))
    },

    // composed as-of join (operator Spark lacks; built from window ops)
    QueryDef("cdc_asof_join",
      s"""WITH $CDC
         |SELECT event_id,
         |  max(CASE WHEN event_type = 'signup' THEN step_us END) OVER
         |    (PARTITION BY user_id ORDER BY step_us, event_id
         |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS asof_signup
         |FROM cdc ORDER BY event_id""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("user_id").orderBy("step_us", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
      cdcView(s, d)
        .withColumn("asof_signup",
          max(when(col("event_type") === "signup", col("step_us"))).over(w))
        .select("event_id", "asof_signup")
        .orderBy("event_id")
    },

    // session windows (streaming gap-session analog)
    QueryDef("cdc_sessionize",
      s"""WITH $CDC,
         |t AS (SELECT *, lag(step_us) OVER
         |        (PARTITION BY user_id ORDER BY step_us, event_id) AS prev_us
         |      FROM cdc)
         |SELECT user_id,
         |  CAST(sum(CASE WHEN prev_us IS NULL
         |       OR step_us - prev_us > 1800000000 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_sessions,
         |  count(*) AS n_events
         |FROM t GROUP BY user_id ORDER BY user_id""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("user_id").orderBy("step_us", "event_id")
      cdcView(s, d)
        .withColumn("prev_us", lag("step_us", 1).over(w))
        .groupBy("user_id")
        .agg(sum(when(col("prev_us").isNull ||
          col("step_us") - col("prev_us") > 1800000000L, 1).otherwise(0))
          .cast("long").as("n_sessions"),
          count(lit(1)).as("n_events"))
        .orderBy("user_id")
    },

    // skew-safe aggregation: two-phase salted count+sum over the 5
    // hot event_type keys — must equal the direct groupBy, which is
    // what the oracle computes
    QueryDef("cdc_salted_agg",
      s"""WITH $CDC
         |SELECT event_type, count(*) AS n,
         |       CAST(sum(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT) AS sum_value_c
         |FROM cdc GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, d) =>
      graft.ops.Skew.saltedCountSum(
        cdcView(s, d), Seq(col("event_type")),
        col("value").cast("decimal(18,2)"), salts = 16)
        .select(col("event_type"), col("n"),
          (col("sum_val") * 100).cast("long").as("sum_value_c"))
        .orderBy("event_type")
    },

    // tumbling time window (streaming window-agg analog)
    QueryDef("cdc_tumbling_window",
      s"""WITH $CDC
         |SELECT step_us // 3600000000 AS hour_bucket, count(*) AS n,
         |       CAST(sum(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT) AS sum_value_c
         |FROM cdc GROUP BY 1 ORDER BY hour_bucket""".stripMargin) { (s, d) =>
      cdcView(s, d)
        .withColumn("hour_bucket", expr("step_us div 3600000000"))
        .groupBy("hour_bucket")
        .agg(count(lit(1)).as("n"),
          (sum(col("value").cast("decimal(18,2)")) * 100)
            .cast("long").as("sum_value_c"))
        .orderBy("hour_bucket")
    })
}
