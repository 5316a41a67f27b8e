package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Canonical loader for the driver-generated test tables.
  *
  * All queries go through here so physical-encoding quirks are absorbed
  * in ONE place — the reference takes the same posture (readers tolerate
  * heterogeneous files: crunch.rs:203-214 `to_supertypes:true`, DuckDB
  * `union_by_name` on every dashboard query). Whatever parquet encoding
  * a generator picked for `events.ts`, consumers see `TimestampType`
  * (µs instants under the engine's pinned-UTC sessions):
  *
  *  - TIMESTAMP(NANOS) → raw int64 under
  *    `spark.sql.legacy.parquet.nanosAsLong=true`, floor-truncated to µs
  *    (matching any µs-precision reader of the same file);
  *  - µs/ms without isAdjustedToUTC → TimestampType directly when the
  *    session sets `parquet.inferTimestampNTZ.enabled=false`
  *    ([[GraftSession.tune]] — the zero-cost path: predicates stay
  *    pushable into parquet footers); surfaced as TIMESTAMP_NTZ on a
  *    foreign session, where we cast — exact micros under UTC, same
  *    instants the DuckDB oracle sees via its naive TIMESTAMP;
  *  - µs/ms with isAdjustedToUTC → already TimestampType, pass-through.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  // Resolve each table ONCE per (session, path) — the catalog posture
  // (r20, measured): every bare `spark.read.parquet` call re-lists the
  // directory, re-reads parquet footers and re-resolves the relation at
  // ~80 ms WARM per call, and the registry re-reads its tables on every
  // query construction — ~17 s of the 146-query warm bench was pure
  // re-resolution of ten static files. A production engine resolves a
  // table's metadata once into a catalog and plans against that; this
  // memo is exactly that (the RELATION — schema + file index — is
  // cached, never data or results: every execution still scans the
  // parquet on disk). Keyed weakly by session so stopped sessions
  // (tests create dozens) don't pin their state; per-session keying
  // also keeps conf-dependent normalization (NTZ vs nanos branches)
  // correct. The sf/lake dirs are write-once inputs by contract; a
  // tool that regenerates a lake runs in a fresh session/process.
  //
  // The VALUES are held via SoftReference (r21 ADVICE): a Dataset
  // strongly references its own SparkSession, so holding the DataFrames
  // strongly would re-pin the weak KEY through the map's value chain and
  // no entry could ever be collected. With the per-session map behind a
  // SoftReference, a stopped session is only soft-reachable and the GC
  // reclaims it (entry included) under memory pressure; a cleared ref
  // for a LIVE session just re-resolves (~80 ms once).
  private val relCache =
    new java.util.WeakHashMap[SparkSession,
      java.lang.ref.SoftReference[
        scala.collection.concurrent.TrieMap[String, DataFrame]]]()

  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    val perSession = relCache.synchronized {
      val live = Option(relCache.get(spark)).flatMap(r => Option(r.get()))
      live.getOrElse {
        val m = scala.collection.concurrent.TrieMap.empty[String, DataFrame]
        relCache.put(spark, new java.lang.ref.SoftReference(m))
        m
      }
    }
    perSession.getOrElseUpdate(s"$dir/$name", {
      // NOTE: the sort-sampling deferral rule is NOT registered here.
      // Engine-built sessions get it from GraftSession.attach, extensions
      // sessions from GraftExtensions — registering from a table reader
      // put it in two optimizer batches on extensions sessions (r14
      // ADVICE) and mutated session state from a read helper.
      val df = spark.read.parquet(s"$dir/$name.parquet")
      if (name == "events") normalizeEventTs(spark, df) else df
    })
  }

  /** Normalize `ts` to TimestampType regardless of parquet physical
    * encoding (see object doc). Exposed for the fixture spec. */
  def normalizeEventTs(spark: SparkSession, df: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      case LongType =>
        // range predicates on the truncated column can't reach the scan on
        // their own — the pushdown rule derives the raw-nanos bounds
        graft.plans.NanosRangePushdown.register(spark)
        // integer div, not `/`: long→double division loses ulps at 1e18 ns
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>
        // foreign session (inferTimestampNTZ left on): wall-clock → UTC
        // instant; identity on the stored micros ONLY under a UTC session
        // — any other session timezone would silently shift the stored
        // micros away from what engine sessions and the DuckDB oracle
        // see, so refuse loudly instead of corrupting instants
        val tz = spark.conf.get("spark.sql.session.timeZone")
        require(tz == "UTC" || tz == "Etc/UTC" || tz == "GMT",
          s"TIMESTAMP_NTZ events require spark.sql.session.timeZone=UTC " +
            s"(got '$tz'): the NTZ→instant cast is timezone-dependent and " +
            s"would shift stored micros under any other zone")
        // The pushdown rule rederives range predicates on the cast
        // column against the raw NTZ attribute so the scan still prunes
        graft.plans.NtzCastPushdown.register(spark)
        df.withColumn("ts", col("ts").cast(TimestampType))
      case _ => df
    }
}
