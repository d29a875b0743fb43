package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet tables (see TESTDATA.md /
  * FIXTURES.md). Every query receives the scale-factor directory at call
  * time, so nothing here caches a path.
  *
  * Scale note: `spark.read.parquet` is the scan the whole engine builds on —
  * Catalyst pushes filters and prunes columns into this scan, which is what
  * makes the same plans viable at 100 TB (only the referenced columns and
  * row groups are read).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = load(s, d, "lineitem")
  /** Schema-adaptive events loader. The driver's generator has emitted
    * `ts` under two physical encodings across rounds, and a real lake holds
    * both, so we branch on the *loaded* dtype rather than assuming one:
    *
    *  - INT64 annotated TIMESTAMP(NANOS): Spark's vectorized reader rejects
    *    it at schema-inference time, so the plain load is PROBED first and
    *    only a footer that actually fails flips the legacy `nanosAsLong`
    *    conf (a session-global setting — gating it behind the failed probe
    *    keeps a loader from mutating shared session state on the common µs
    *    path; TablesSpec pins that the conf stays untouched there). Under
    *    the conf the column surfaces as LongType and we floor-convert to a
    *    microsecond TimestampType (lossless here; generator values are
    *    µs-aligned, and DuckDB compares at µs too).
    *  - real TIMESTAMP(MICROS) with isAdjustedToUTC=false: surfaces as
    *    TIMESTAMP_NTZ; cast to session-time TimestampType (session tz is
    *    pinned to UTC by every entry point), which keeps the wall-clock
    *    values identical to DuckDB's naive read while giving the `window()`
    *    / interval arithmetic the ev_* queries were written against.
    *  - TIMESTAMP(MICROS) adjusted-to-UTC: already TimestampType; pass
    *    through.
    *
    * Anything else fails loudly with the table/column/actual type so the
    * next generator drift surfaces in one place, not as 15 scattered
    * analysis errors. */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    val raw =
      try load(s, d, "events")
      catch {
        // TIMESTAMP(NANOS) footer — Spark rejects it during eager schema
        // inference ("Illegal Parquet type: INT64 (TIMESTAMP(NANOS,...))");
        // only that failure earns the session-global conf flip.
        case e: Exception if Option(e.getMessage).exists(m =>
            m.toLowerCase.contains("parquet")) =>
          s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
          load(s, d, "events")
      }
    raw.schema("ts").dataType match {
      case LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast(TimestampType))
      case TimestampType => raw
      case other =>
        throw new IllegalStateException(
          s"Tables.events: unsupported dtype for events.ts — expected " +
          s"LongType (nanos-as-long), TimestampNTZType or TimestampType, " +
          s"got $other in $d/events.parquet")
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")

  /** Register all tables as temp views (for spark.sql entry points).
    * Goes through the per-table accessors, NOT raw [[load]]: events is
    * parquet TIMESTAMP(NANOS), which only reads through the nanos-as-long
    * conversion above — a raw load fails at schema time
    * (PARQUET_TYPE_ILLEGAL), which is exactly how the `sql_text_surface`
    * entry caught this function being broken. */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    names.foreach { n =>
      val df = if (n == "events") events(spark, sfDir) else load(spark, sfDir, n)
      df.createOrReplaceTempView(n)
    }
}
