"""Envelope sources.

``synthesize_envelopes`` deterministically maps the driver's ``events``
table (TESTDATA.md) into Kinesis-record-shaped envelope rows covering
every arm of the route switch and the enrichment edge cases demanded by
FIXTURES.md A1 — all with built-in column expressions (no Python row
code), so the same frame serves batch tests and, via
``spark.readStream``, streaming tests.

``synthesize_cf_dimensions`` builds matching cf_apps/cf_spaces/cf_orgs
snapshots (FIXTURES.md A3) including suffix-strip, missing-space/org
and opt-out rows.

In production the source is a Kinesis connector
(``spark.readStream.format("kinesis")``, one input partition per shard
— consumer.go:103-145's goroutine-per-shard made declarative) with the
payload decoded by ``from_protobuf`` against the Envelope descriptor
(S7); neither AWS nor a protobuf runtime exists in this container, so
the synthesizer stands in as the test-mode source behind the same
RECORD_SCHEMA contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

__all__ = ["synthesize_envelopes", "synthesize_cf_dimensions", "ALLOWED_ORIGINS", "N_APPS"]

ALLOWED_ORIGINS = ["env1", "env2"]  # ALLOWED_ORIGINS env var, main.go:556
UNKNOWN_ORIGIN = "envX"  # origin not in allowed list -> enrichment skipped
N_APPS = 40  # dim rows; guids 40..49 stay unknown (missing-key path)
GUID_PREFIX = "00000000-0000-4000-8000-"


def _guid(n) -> "F.Column":
    return F.concat(F.lit(GUID_PREFIX), F.lpad(n.cast("string"), 12, "0"))


def synthesize_envelopes(
    spark: SparkSession, sf_dir: str, partitions: int | None = None
) -> DataFrame:
    """events.parquet -> RECORD_SCHEMA-shaped DataFrame.

    Row mix by event_id % 10 (FIXTURES.md A1 coverage matrix):
      0    non-LogMessage (HttpStartStop) ......... dropped by F1
      1    /var/log/... prefix ..................... disabled route
      2    gorouter access.log + ROUTERACCESS line . disabled route (rich parse)
      3    /var/vcap/sys/log/director/ ............. disabled route
      4    /var/vcap/sys/log/ prefix ............... disabled route
      5,6  tags[source_id]=gorouter ................ kept, class gorouter
      7    source_type APP/PROC/WEB ................ kept, class gorouter
      8    APP/PROC/WEB but empty app_id ........... dropped by F3
      9    unroutable source ....................... default drop
    Mixed-case guids exercise canonicalization; user_id%7==0 rows carry
    an unknown origin (enrichment skipped).
    """
    from ..io import load_table

    ev = load_table(spark, sf_dir, "events")
    if partitions:
        # The driver's events.parquet is ONE row group -> one scan
        # task. Shuffle the narrow raw columns FIRST so the envelope
        # synthesis below (format_string et al.) runs on every core;
        # shuffling after synthesis would leave it single-threaded.
        ev = ev.repartition(partitions, "event_id")
    arm = F.col("event_id") % 10
    # event_id spans the full range at every SF (user_id does not):
    # indices 40..49 have no dim row -> unknown-app path
    user_mod = (F.col("event_id") / 10).cast("long") % F.lit(N_APPS + 10)
    guid = _guid(user_mod)
    # mixed-case guid for one arm to exercise lower() canonicalization
    guid_mixed = F.when(arm == 6, F.upper(guid)).otherwise(guid)
    origin = (
        F.when(F.col("user_id") % 7 == 0, F.lit(UNKNOWN_ORIGIN))
        .when(F.col("user_id") % 3 == 0, F.lit("env2"))
        .otherwise(F.lit("env1"))
    )
    router_line = F.format_string(
        'host-%d.example.com - [2024-01-01T00:00:00+0000] "GET /p/%d HTTP/1.1" '
        '%d 10 200 "-" "UA" "10.0.0.1:1234" "10.0.1.2:61001" '
        'x_forwarded_for:"1.2.3.4" x_forwarded_proto:"https" '
        'vcap_request_id:"req-%d" response_time:0.012 app_id:"%s" '
        'app_index:"0" x_b3_traceid:"t" x_b3_spanid:"s" x_b3_parentspanid:"-"',
        F.col("user_id"),
        F.col("event_id"),
        (F.col("event_id") % 5 * 100 + 200).cast("int"),
        F.col("event_id"),
        guid,
    )
    plain_line = F.format_string(
        "evt=%s value=%s props=%s",
        F.col("event_type"),
        F.round("value", 2).cast("string"),
        F.col("props"),
    )
    message = F.when(arm == 2, router_line).otherwise(plain_line)
    source_instance = (
        F.when(arm == 1, F.lit("/var/log/syslog"))
        .when(arm == 2, F.lit("/var/vcap/sys/log/gorouter/access.log"))
        .when(arm == 3, F.lit("/var/vcap/sys/log/director/director.stdout.log"))
        .when(arm == 4, F.lit("/var/vcap/sys/log/other/app.log"))
        .otherwise(F.lit("APP/0"))
    )
    # arm 3 (director) also carries an app_id so the resurrected route
    # survives F3; arms 1 and 4 don't -> F3 drops them even when routed
    app_id = F.when(arm.isin(3, 5, 6, 7), guid_mixed).otherwise(F.lit(""))
    source_type = (
        F.when(arm.isin(7, 8), F.lit("APP/PROC/WEB"))
        .when(arm == 9, F.lit("OTHER"))
        .otherwise(F.lit("LOG"))
    )
    tags = F.when(
        arm.isin(5, 6), F.create_map(F.lit("source_id"), F.lit("gorouter"))
    ).otherwise(F.create_map().cast("map<string,string>"))
    return ev.select(
        F.concat(F.lit("shard-"), (F.col("event_id") % 4).cast("string")).alias(
            "shard_id"
        ),
        F.col("event_id").cast("string").alias("sequence_number"),
        F.col("user_id").cast("string").alias("partition_key"),
        F.col("ts").alias("arrival_ts"),
        origin.alias("origin"),
        F.when(arm == 0, F.lit(4)).otherwise(F.lit(5)).alias("event_type"),
        (F.unix_micros("ts") * 1000).alias("timestamp"),
        F.lit("cf").alias("deployment"),
        F.lit("job").alias("job"),
        F.lit("0").alias("index"),
        F.lit("10.0.0.1").alias("ip"),
        tags.alias("tags"),
        F.struct(
            message.alias("message"),
            F.lit(1).alias("message_type"),
            (F.unix_micros("ts") * 1000).alias("timestamp"),
            app_id.alias("app_id"),
            source_type.alias("source_type"),
            source_instance.alias("source_instance"),
        ).alias("log_message"),
    )


def synthesize_cf_dimensions(
    spark: SparkSession,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """cf_apps / cf_spaces / cf_orgs snapshots for ALLOWED_ORIGINS.

    Coverage (FIXTURES.md A3): suffix-stripped names (-venerable/-blue/
    -green), apps with missing space (n%10==9 -> space guid unknown),
    spaces with missing org (space n%5==4), opt-out env flag rows,
    UPPERCASE stored guids for env2 (canonicalization both sides).
    """
    # Everything below is spark.range + column expressions: the dim
    # subtree is re-executed inside EVERY broadcast build (and per
    # micro-batch refresh), so it must never touch a Python worker —
    # a parallelize()-based version costs ~1.5s of Python task startup
    # per broadcast; this JVM-only version is milliseconds.
    env_col = F.explode(F.array(*[F.lit(e) for e in ALLOWED_ORIGINS])).alias("env")

    n = F.col("id").cast("int")
    guid = _guid(n)
    suffix = F.element_at(
        F.array(F.lit("-venerable"), F.lit("-blue"), F.lit("-green"), F.lit("")),
        (n % 4) + 1,
    )
    space_guid = F.when(n % 10 != 9, _guid((n % 8) + 100)).otherwise(_guid(F.lit(999)))
    environment = F.when(
        n % 11 == 10, F.create_map(F.lit("F2S_DISABLE_LOGGING"), F.lit("true"))
    ).otherwise(F.create_map().cast("map<string,string>"))
    apps = spark.range(N_APPS).select(env_col, "id").select(
        "env",
        # env2 stores mixed-case guids; the join must lower()
        F.when(F.col("env") == "env2", F.upper(guid)).otherwise(guid).alias("guid"),
        F.concat(F.lit("app-"), "env", F.lit("-"), n.cast("string"), suffix)
        .alias("name"),
        space_guid.alias("space_guid"),
        environment.alias("environment"),
    )

    s = F.col("id").cast("int")
    org_guid = F.when(s % 5 != 4, _guid((s % 4) + 200)).otherwise(_guid(F.lit(998)))
    spaces = spark.range(8).select(env_col, "id").select(
        "env",
        _guid(s + 100).alias("guid"),
        F.concat(F.lit("space-"), "env", F.lit("-"), s.cast("string"))
        .alias("name"),
        org_guid.alias("organization_guid"),
    )

    o = F.col("id").cast("int")
    orgs = spark.range(4).select(env_col, "id").select(
        "env",
        _guid(o + 200).alias("guid"),
        F.concat(F.lit("org-"), "env", F.lit("-"), o.cast("string"))
        .alias("name"),
    )
    return apps, spaces, orgs
