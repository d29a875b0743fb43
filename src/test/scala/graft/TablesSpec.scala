package graft

import org.apache.spark.sql.types._

/** Pinned-schema checks for every table accessor (round-7 post-mortem:
  * the driver regenerated testdata mid-round and the events encoding
  * switch surfaced as 15 scattered analysis errors + 10 red tests; this
  * spec is the single loud place such drift fails instead).
  *
  * Each assertion names the table, the column, and the expected/actual
  * type. Timestamp columns accept TIMESTAMP or TIMESTAMP_NTZ (both have
  * appeared from the generator and the engine handles both) — EXCEPT
  * events.ts, whose accessor normalizes to session-time TimestampType and
  * is pinned exactly.
  */
class TablesSpec extends SparkSpec {

  /** Normalize a dtype to a comparison string; both timestamp flavors
    * collapse to "timestamp" for the drift-tolerant columns. */
  private def norm(dt: DataType): String = dt match {
    case TimestampType | TimestampNTZType => "timestamp"
    case other                            => other.simpleString
  }

  private val expected: Map[String, Seq[(String, String)]] = Map(
    "region" -> Seq("r_regionkey" -> "int", "r_name" -> "string"),
    "nation" -> Seq("n_nationkey" -> "int", "n_name" -> "string",
      "n_regionkey" -> "int"),
    "customer" -> Seq("c_custkey" -> "bigint", "c_name" -> "string",
      "c_nationkey" -> "int", "c_acctbal" -> "double",
      "c_mktsegment" -> "string"),
    "supplier" -> Seq("s_suppkey" -> "bigint", "s_name" -> "string",
      "s_nationkey" -> "int", "s_acctbal" -> "double"),
    "part" -> Seq("p_partkey" -> "bigint", "p_name" -> "string",
      "p_brand" -> "string", "p_type" -> "string", "p_size" -> "int",
      "p_retailprice" -> "double"),
    "orders" -> Seq("o_orderkey" -> "bigint", "o_custkey" -> "bigint",
      "o_orderstatus" -> "string", "o_totalprice" -> "double",
      "o_orderdate" -> "timestamp", "o_orderpriority" -> "string"),
    "lineitem" -> Seq("l_orderkey" -> "bigint", "l_partkey" -> "bigint",
      "l_suppkey" -> "bigint", "l_linenumber" -> "int",
      "l_quantity" -> "double", "l_extendedprice" -> "double",
      "l_discount" -> "double", "l_tax" -> "double",
      "l_returnflag" -> "string", "l_linestatus" -> "string",
      "l_shipdate" -> "timestamp"),
    "events" -> Seq("event_id" -> "bigint", "ts" -> "timestamp",
      "user_id" -> "bigint", "event_type" -> "string",
      "value" -> "double", "props" -> "string"),
    "documents" -> Seq("doc_id" -> "bigint", "text" -> "string",
      "lang" -> "string", "source" -> "string", "n_chars" -> "bigint"),
    "embeddings" -> Seq("vec_id" -> "bigint",
      "embedding" -> "array<float>", "label" -> "int"))

  test("every accessor's normalized schema matches the pinned contract") {
    val dir = sf("sf0.001")
    val load: Map[String, org.apache.spark.sql.DataFrame] = Map(
      "region" -> Tables.region(spark, dir),
      "nation" -> Tables.nation(spark, dir),
      "customer" -> Tables.customer(spark, dir),
      "supplier" -> Tables.supplier(spark, dir),
      "part" -> Tables.part(spark, dir),
      "orders" -> Tables.orders(spark, dir),
      "lineitem" -> Tables.lineitem(spark, dir),
      "events" -> Tables.events(spark, dir),
      "documents" -> Tables.documents(spark, dir),
      "embeddings" -> Tables.embeddings(spark, dir))
    assert(load.keySet == expected.keySet)
    for ((table, want) <- expected) {
      val got = load(table).schema
      assert(got.fieldNames.toSeq == want.map(_._1),
        s"table $table: column names drifted — expected " +
        s"${want.map(_._1).mkString(",")} got ${got.fieldNames.mkString(",")}")
      for ((name, wantType) <- want) {
        val actual = norm(got(name).dataType)
        assert(actual == wantType,
          s"table $table column $name: expected $wantType, got $actual " +
          s"(raw ${got(name).dataType.simpleString}) — generator drift? " +
          s"fix the accessor in Tables.scala, not 15 downstream queries")
      }
    }
    // events.ts specifically must come out as session-time TimestampType
    // (the accessor's normalization contract), never NTZ or raw long.
    assert(load("events").schema("ts").dataType == TimestampType,
      "Tables.events must normalize ts to TimestampType")
  }

  test("loading a µs-encoded events table leaves nanosAsLong untouched") {
    // the legacy conf is session-global; the accessor may only flip it
    // when the footer actually fails the plain probe (TIMESTAMP(NANOS)).
    // The shipped testdata is TIMESTAMP(MICROS), so after a load the conf
    // must not exist — a loader must not mutate shared session state on
    // the common path (round-8 verdict nit).
    val key = "spark.sql.legacy.parquet.nanosAsLong"
    spark.conf.unset(key) // back to the built-in default ("false")
    val df = Tables.events(spark, sf("sf0.001"))
    assert(df.count() > 0)
    assert(spark.conf.get(key, "false") != "true",
      s"Tables.events set $key on a µs-encoded table — the conf flip " +
      "must stay behind the failed nanos probe")
  }
}
