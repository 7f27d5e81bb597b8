package graft

import org.apache.spark.sql.functions._

import graft.model.Config
import graft.sources.{AvroDecode, Sinks, Sources}

/** I/O surface: JDBC round-trip (embedded Derby), CSV sink, Avro
  * encode/decode round-trip, JSON config load. */
class IoSpec extends SparkSpec {

  private val derbyUrl = "jdbc:derby:memory:graftdb;create=true"

  test("K2/S5: JDBC append sink (NaN→0) + table scan round-trip on Derby") {
    import spark.implicits._
    val df = Seq(
      (1L, "a", 1.5), (2L, "b", Double.NaN), (3L, "c", -2.25)
    ).toDF("id", "name", "metric")
    Sinks.jdbcAppend(df, derbyUrl, "oee_out")
    val back = Sources.jdbcTable(spark, derbyUrl, "oee_out")
    val got = back.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    assert(got == Set((1L, "a", 1.5), (2L, "b", 0.0), (3L, "c", -2.25)))
  }

  test("K2 streaming: foreachBatch JDBC sink writes each micro-batch") {
    import spark.implicits._
    val stream =
      org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Double)](spark)
    val q = Sinks.jdbcForeachBatch(
        stream.toDF().toDF("id", "v"), derbyUrl, "oee_stream_out", tmpDir("ckpt-jdbc"))
      .start()
    try {
      stream.addData(Seq((1L, 1.0), (2L, Double.NaN)))
      q.processAllAvailable()
      stream.addData(Seq((3L, 3.0)))
      q.processAllAvailable()
      val got = Sources.jdbcTable(spark, derbyUrl, "oee_stream_out")
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
      assert(got == Set((1L, 1.0), (2L, 0.0), (3L, 3.0)))
    } finally q.stop()
  }

  test("K4: createTableFromSchema generates usable DDL with a primary key") {
    import spark.implicits._
    val df = Seq((1L, "x", 2.0, true)).toDF("id", "s", "d", "b")
    Sinks.createTableFromSchema(derbyUrl, "ddl_test", df, primaryKey = Some("id"))
    Sinks.jdbcAppend(df, derbyUrl, "ddl_test")
    // PK enforced: duplicate insert fails
    intercept[Exception] { Sinks.jdbcAppend(df, derbyUrl, "ddl_test") }
    assert(Sources.jdbcTable(spark, derbyUrl, "ddl_test").count() == 1)
  }

  test("K4: float columns map to REAL; reserved/injection identifiers rejected") {
    import spark.implicits._
    val df = Seq((1L, 1.5f), (2L, Float.NaN)).toDF("id", "score")
    // FloatType must create REAL, so the NaN→0 float append lands as a
    // float, not a string
    Sinks.createTableFromSchema(derbyUrl, "float_ddl", df, primaryKey = Some("id"))
    Sinks.jdbcAppend(df, derbyUrl, "float_ddl")
    val got = Sources.jdbcTable(spark, derbyUrl, "float_ddl")
      .collect().map(r => (r.getLong(0), r.getFloat(1))).toSet
    assert(got == Set((1L, 1.5f), (2L, 0.0f)))
    // reserved word -> rejected before any DDL runs
    intercept[IllegalArgumentException] {
      Sinks.createTableFromSchema(derbyUrl, "order", df)
    }
    intercept[IllegalArgumentException] {
      Sinks.createTableFromSchema(
        derbyUrl, "t2", Seq((1L, "x")).toDF("id", "select"))
    }
    // injection shapes still rejected, and so are leading underscores
    // (Derby refuses them unquoted — this sink never quotes)
    intercept[IllegalArgumentException] {
      Sinks.createTableFromSchema(derbyUrl, "t3; DROP TABLE x", df)
    }
    intercept[IllegalArgumentException] {
      Sinks.createTableFromSchema(
        derbyUrl, "t4", Seq((1L, "x")).toDF("id", "_score"))
    }
  }

  test("S4 evolution: framed records decode per-writer-schema; unknown id fails") {
    import spark.implicits._
    val v1 =
      """{"type":"record","name":"Dim","fields":[
        |{"name":"id","type":"long"},{"name":"name","type":"string"}]}""".stripMargin
    val v2 =
      """{"type":"record","name":"Dim","fields":[
        |{"name":"id","type":"long"},{"name":"name","type":"string"},
        |{"name":"score","type":"double","default":-1.0}]}""".stripMargin
    val oldRecs = AvroDecode.encodeFramed(
      Seq((1L, "a"), (2L, "b")).toDF("id", "name"), v1, schemaId = 1)
    val newRecs = AvroDecode.encodeFramed(
      Seq((3L, "c", 9.5)).toDF("id", "name", "score"), v2, schemaId = 2)
    // a mixed stream (ALTER mid-stream) decodes with per-record resolution:
    // v1 writers materialize v2's default
    val got = AvroDecode.decodeFramed(
        oldRecs.unionByName(newRecs), "value", Map(1 -> v1, 2 -> v2), v2)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    assert(got == Set((1L, "a", -1.0), (2L, "b", -1.0), (3L, "c", 9.5)))
    // an UNREGISTERED writer id fails the task loudly (no positional garbage)
    val e = intercept[Exception] {
      AvroDecode.decodeFramed(
        AvroDecode.encodeFramed(Seq((9L, "z")).toDF("id", "name"), v1, schemaId = 7),
        "value", Map(1 -> v1), v1).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("unknown writer schema id")))
    // unframed bytes fail the magic check instead of misparsing
    intercept[Exception] {
      AvroDecode.decodeFramed(
        AvroDecode.encode(Seq((9L, "z")).toDF("id", "name"), v1),
        "value", Map(1 -> v1), v1).collect()
    }
  }

  test("S4 resolver: an id absent from the static map resolves via callback") {
    import spark.implicits._
    val v1 =
      """{"type":"record","name":"Dim","fields":[
        |{"name":"id","type":"long"},{"name":"name","type":"string"}]}""".stripMargin
    val v2 =
      """{"type":"record","name":"Dim","fields":[
        |{"name":"id","type":"long"},{"name":"name","type":"string"},
        |{"name":"score","type":"double","default":-1.0}]}""".stripMargin
    // id 2 was registered AFTER query start: only the resolver knows it
    val mixed = AvroDecode.encodeFramed(
        Seq((1L, "a")).toDF("id", "name"), v1, schemaId = 1)
      .unionByName(AvroDecode.encodeFramed(
        Seq((3L, "c", 9.5)).toDF("id", "name", "score"), v2, schemaId = 2))
    val got = AvroDecode.decodeFramed(
        mixed, "value", Map(1 -> v1), v2,
        resolve = id => if (id == 2) Some(v2) else None)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    assert(got == Set((1L, "a", -1.0), (3L, "c", 9.5)))
    // a miss in BOTH the map and the resolver stays a loud failure
    val e = intercept[Exception] {
      AvroDecode.decodeFramed(
        AvroDecode.encodeFramed(Seq((9L, "z")).toDF("id", "name"), v1, schemaId = 7),
        "value", Map(1 -> v1), v1, resolve = _ => None).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("resolver returned None")))
  }

  test("K1 streaming: csvStreamWriter lands micro-batches as csv files") {
    import spark.implicits._
    val stream =
      org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Double)](spark)
    val outDir = tmpDir("csv-stream-out")
    val q = Sinks.csvStreamWriter(
        stream.toDF().toDF("id", "v"), outDir, tmpDir("ckpt-csv"))
      .start()
    try {
      stream.addData(Seq((1L, 1.5), (2L, 2.5)))
      q.processAllAvailable()
      stream.addData(Seq((3L, 3.5)))
      q.processAllAvailable()
      val back = spark.read.schema("id BIGINT, v DOUBLE").csv(outDir)
      assert(back.collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
        == Set((1L, 1.5), (2L, 2.5), (3L, 3.5)))
    } finally q.stop()
  }

  test("S4: truncated Avro bytes fail the task; well-formed-looking junk parses") {
    import spark.implicits._
    val schemaJson =
      """{"type":"record","name":"R","fields":[{"name":"id","type":"long"},
        |{"name":"s","type":"string"}]}""".stripMargin
    // Avro binary is positional (no magic/field tags): [1,2,3] decodes as
    // id=-1 (zigzag 1), s = 1-byte string "". Silent garbage-in is a
    // property of the format, worth pinning in a test.
    val junk = Seq(Array[Byte](1, 2, 3)).toDF("value")
    val r = AvroDecode.decode(junk, "value", schemaJson).head()
    assert(r.getLong(0) == -1L && r.getString(1).length == 1)
    // truncated payload (string length says 1, no bytes follow) must error
    val truncated = Seq(Array[Byte](1, 2)).toDF("value")
    intercept[Exception] {
      AvroDecode.decode(truncated, "value", schemaJson).collect()
    }
  }

  test("K1: CSV sink round-trip") {
    import spark.implicits._
    val df = Seq((1L, "a", 1.5), (2L, "b,with,commas", 2.5)).toDF("id", "name", "v")
    val dir = tmpDir("csv-out")
    Sinks.csv(df, dir)
    val back = spark.read.option("header", "true")
      .schema("id BIGINT, name STRING, v DOUBLE").csv(dir)
    assert(back.collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
      == df.collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet)
  }

  test("ORC source/sink: content round-trip identical to parquet, pushdown intact") {
    val li = Tables.load(spark, "/root/testdata/sf0.001", "lineitem")
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")
    val dir = tmpDir("orc-out")
    Sinks.orc(li, dir)
    val back = Sources.orcTable(spark, dir)
    assert(back.schema === li.schema)
    assert(back.collect().map(_.toString).sorted.toSeq ===
      li.collect().map(_.toString).sorted.toSeq)
    // the ORC scan takes predicate pushdown like parquet does
    val plan = back.filter(org.apache.spark.sql.functions.col("l_orderkey") === 1L)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(l_orderkey), EqualTo(l_orderkey,1)"),
      s"no pushdown into the ORC scan:\n${plan.take(1500)}")
  }

  test("csvTable: schema-explicit scan — no inference pass, declared types land") {
    import spark.implicits._
    val df = Seq((1L, "x", 1.25), (2L, "y", 2.5)).toDF("id", "name", "v")
    val dir = tmpDir("csv-src")
    Sinks.csv(df, dir)
    val back = Sources.csvTable(spark, dir, "id BIGINT, name STRING, v DOUBLE")
    assert(back.schema.map(f => (f.name, f.dataType.simpleString)) ===
      Seq("id" -> "bigint", "name" -> "string", "v" -> "double"))
    assert(back.collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
      === Set((1L, "x", 1.25), (2L, "y", 2.5)))
  }

  test("S4: Avro encode/decode round-trip incl. nullable union and bytes") {
    import spark.implicits._
    val schemaJson =
      """{"type":"record","name":"CdcRec","fields":[
        |{"name":"id","type":"long"},
        |{"name":"name","type":["null","string"],"default":null},
        |{"name":"qty","type":"double"},
        |{"name":"ts_ms","type":{"type":"long","logicalType":"timestamp-millis"}}
        |]}""".stripMargin
    val df = Seq(
      (1L, Option("alpha"), 1.25, 1700000000000L),
      (2L, None: Option[String], -0.5, 1700000001000L)
    ).toDF("id", "name", "qty", "ts_ms")
    val encoded = AvroDecode.encode(df, schemaJson)
    assert(encoded.schema.fields.map(_.name).toSeq == Seq("value"))
    val decoded = AvroDecode.decode(encoded, "value", schemaJson)
    val got = decoded.collect()
      .map(r => (r.getLong(0), Option(r.getString(1)), r.getDouble(2), r.getLong(3))).toSet
    val expect = df.collect()
      .map(r => (r.getLong(0), Option(r.getString(1)), r.getDouble(2), r.getLong(3))).toSet
    assert(got == expect)
    // P4: the epoch-millis long casts to a usable timestamp downstream
    val ts = decoded.select(timestamp_millis(col("ts_ms"))).head().getTimestamp(0)
    assert(ts.toInstant.toEpochMilli == 1700000000000L)
  }

  test("S6/F5: JSON config loads with driver-side predicates") {
    val json =
      """{
        |  "brokers": "broker1:9092",
        |  "watermarkDelay": "5 minutes",
        |  "shufflePartitions": 16,
        |  "tables": [
        |    {"tableName": "events", "isOperational": true,
        |     "keyColumns": ["event_id"], "ordColumn": "ts"},
        |    {"tableName": "equipment_status", "isOperational": false,
        |     "keyColumns": ["id"], "ordColumn": "updated_at",
        |     "filterColumn": "cod_equipment", "topicName": "cdc.es",
        |     "retentionDays": 10}
        |  ]
        |}""".stripMargin
    val path = java.nio.file.Files.createTempFile("graft-conf", ".json")
    java.nio.file.Files.writeString(path, json)
    val cfg = Config.load(spark, path.toString)
    assert(cfg.brokers.contains("broker1:9092"))
    assert(cfg.jdbcUrl.isEmpty)
    assert(cfg.watermarkDelay == "5 minutes")
    assert(cfg.shufflePartitions == 16)
    assert(cfg.operational.tableName == "events")
    assert(cfg.metadata.map(_.tableName) == Seq("equipment_status"))
    assert(cfg.metadata.head.retentionDays.contains(10))
    assert(cfg.metadata.head.filterColumn.contains("cod_equipment"))
  }
}
