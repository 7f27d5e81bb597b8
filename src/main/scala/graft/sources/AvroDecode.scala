package graft.sources

import scala.jdk.CollectionConverters._

import org.apache.avro.Schema
import org.apache.avro.generic.{GenericDatumReader, GenericRecord}
import org.apache.avro.io.DecoderFactory
import org.apache.avro.util.Utf8
import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions.{col, concat, lit}
import org.apache.spark.sql.types._

/** S4 — Avro deserialization (reference: Confluent `KafkaAvroDeserializer`
  * configured at `…/dodetl/imtu/InMemoryTableUpdaterManager.scala:43-53`,
  * schemas carried per-record via the registry).
  *
  * Implemented against the plain Apache Avro Java library (on the Spark
  * classpath): a binary column + a writer-schema JSON (the registry lookup
  * happens once at the driver, as in the reference) decode into typed
  * columns. `mapPartitions` is justified here — the reader/decoder pair is
  * per-partition state (the same amortization the reference gets from one
  * deserializer per consumer); the decode itself is a tight per-record loop.
  *
  * Schema mapping: Avro `union {null, T}` → nullable column; `timestamp-
  * millis` logical longs stay epoch-millis longs (the engine's P4 cast,
  * `timestamp_millis`, converts downstream — same contract as the
  * reference's `…/dodetl/imtu/DatabaseManager.scala:71-74`).
  */
object AvroDecode {

  private def unwrapUnion(s: Schema): (Schema, Boolean) =
    if (s.getType == Schema.Type.UNION) {
      val nonNull = s.getTypes.asScala.filter(_.getType != Schema.Type.NULL)
      require(nonNull.size == 1, s"only union{null,T} supported, got $s")
      (nonNull.head, true)
    } else (s, false)

  private def toSparkType(s: Schema): DataType = s.getType match {
    case Schema.Type.BOOLEAN => BooleanType
    case Schema.Type.INT => IntegerType
    case Schema.Type.LONG => LongType
    case Schema.Type.FLOAT => FloatType
    case Schema.Type.DOUBLE => DoubleType
    case Schema.Type.STRING => StringType
    case Schema.Type.BYTES => BinaryType
    case Schema.Type.ENUM => StringType
    case t => throw new IllegalArgumentException(s"unsupported Avro type $t")
  }

  /** Spark StructType for an Avro record schema. */
  def toSparkSchema(avroSchemaJson: String): StructType = {
    val schema = new Schema.Parser().parse(avroSchemaJson)
    require(schema.getType == Schema.Type.RECORD, "record schema required")
    StructType(schema.getFields.asScala.map { f =>
      val (inner, nullable) = unwrapUnion(f.schema())
      StructField(f.name(), toSparkType(inner), nullable)
    }.toSeq)
  }

  private def toRowValue(v: AnyRef): Any = v match {
    case null => null
    case u: Utf8 => u.toString
    case e: org.apache.avro.generic.GenericEnumSymbol[_] => e.toString
    case b: java.nio.ByteBuffer =>
      val a = new Array[Byte](b.remaining()); b.duplicate().get(a); a
    case other => other
  }

  /** Decode `binCol` (Avro-serialized record bytes) into one typed column per
    * Avro field, replacing the original columns. */
  def decode(df: DataFrame, binCol: String, avroSchemaJson: String): DataFrame = {
    val sparkSchema = toSparkSchema(avroSchemaJson)
    val bytesDs = df.select(col(binCol)).as(Encoders.BINARY)
    bytesDs.mapPartitions { it =>
      // per-partition reader/decoder state (the mapPartitions justification)
      val schema = new Schema.Parser().parse(avroSchemaJson)
      val reader = new GenericDatumReader[GenericRecord](schema)
      var record: GenericRecord = null
      it.map { bytes =>
        val decoder = DecoderFactory.get().binaryDecoder(bytes, null)
        record = reader.read(record, decoder)
        Row.fromSeq(schema.getFields.asScala.toSeq.map(f =>
          toRowValue(record.get(f.pos()))))
      }
    }(Encoders.row(sparkSchema))
  }

  /** Per-record schema evolution (the reference reads the WRITER schema off
    * every CDC record via its registry deserializer,
    * `…/dodetl/imtu/InMemoryTableUpdater.scala:191,196`): decode
    * registry-framed records — magic byte 0x0 + 4-byte big-endian schema id +
    * Avro binary payload — resolving each record's writer schema against one
    * `readerSchemaJson`. Avro schema resolution applies: fields added with a
    * default materialize the default for old writers; fields the reader
    * dropped are skipped. FAILS LOUDLY (task error) on an unknown schema id
    * or a bad magic byte instead of decoding garbage — [[decode]]'s
    * fixed-schema path would silently misparse positionally.
    *
    * `mapPartitions` justification as in [[decode]]: the resolved
    * reader-per-writer-id cache is per-partition state.
    *
    * `resolve`: fallback writer-schema lookup for ids NOT in the static
    * `schemasById` map — the hook a registry client plugs into (the
    * reference's deserializer fetches unknown ids from its registry per
    * record; a static map alone fails any id registered after query
    * start). Called at most once per unknown id per partition (the result
    * — including a miss — is cached); must be serializable, it runs in
    * tasks. The default resolves nothing, preserving the static-map-only
    * behavior; an id missed by BOTH stays a loud task failure — decoding
    * garbage positionally is never the fallback. */
  def decodeFramed(
      df: DataFrame, binCol: String,
      schemasById: Map[Int, String], readerSchemaJson: String,
      resolve: Int => Option[String] = _ => None): DataFrame = {
    val sparkSchema = toSparkSchema(readerSchemaJson)
    val bytesDs = df.select(col(binCol)).as(Encoders.BINARY)
    bytesDs.mapPartitions { it =>
      val readerSchema = new Schema.Parser().parse(readerSchemaJson)
      val parsed = scala.collection.mutable.Map.empty[Int, Schema] ++
        schemasById.map { case (id, json) => id -> new Schema.Parser().parse(json) }
      val readers = scala.collection.mutable.Map.empty[Int, GenericDatumReader[GenericRecord]]
      it.map { bytes =>
        require(
          bytes != null,
          "NULL Avro value (Kafka tombstone?) — filter nulls before decodeFramed")
        require(
          bytes.length >= 5 && bytes(0) == 0x0,
          s"not a registry-framed Avro record (len=${bytes.length}, " +
            s"magic=${if (bytes.nonEmpty) bytes(0) else "<empty>"})")
        val id = java.nio.ByteBuffer.wrap(bytes, 1, 4).getInt
        val reader = readers.getOrElseUpdate(id, {
          val writerSchema = parsed.getOrElseUpdate(id,
            resolve(id).map(new Schema.Parser().parse(_)).getOrElse(
              throw new IllegalStateException(
                s"unknown writer schema id $id — not in the static map and " +
                  "the resolver returned None; register it before decoding")))
          new GenericDatumReader[GenericRecord](writerSchema, readerSchema)
        })
        val decoder = DecoderFactory.get().binaryDecoder(bytes, 5, bytes.length - 5, null)
        val record = reader.read(null, decoder)
        Row.fromSeq(readerSchema.getFields.asScala.toSeq.map(f =>
          toRowValue(record.get(f.name()))))
      }
    }(Encoders.row(sparkSchema))
  }

  /** Frame Avro binary as registry wire format (magic 0x0 + schema id) —
    * the encode-side mate of [[decodeFramed]]. */
  def encodeFramed(
      df: DataFrame, avroSchemaJson: String, schemaId: Int,
      out: String = "value"): DataFrame = {
    val plain = encode(df, avroSchemaJson, out)
    val header = new Array[Byte](5)
    java.nio.ByteBuffer.wrap(header).put(0x0.toByte).putInt(schemaId)
    plain.select(concat(lit(header), col(out)).as(out))
  }

  /** Encode rows to Avro binary (test/round-trip helper and K-side building
    * block; primitive fields only, mirroring [[toSparkSchema]]'s mapping). */
  def encode(df: DataFrame, avroSchemaJson: String, out: String = "value"): DataFrame = {
    val fieldNames = new Schema.Parser().parse(avroSchemaJson)
      .getFields.asScala.map(_.name()).toSeq
    val src = df.select(fieldNames.map(col): _*)
    src.mapPartitions { it =>
      val schema = new Schema.Parser().parse(avroSchemaJson)
      val writer = new org.apache.avro.generic.GenericDatumWriter[GenericRecord](schema)
      val bos = new java.io.ByteArrayOutputStream()
      it.map { row =>
        bos.reset()
        val enc = org.apache.avro.io.EncoderFactory.get().binaryEncoder(bos, null)
        val rec = new org.apache.avro.generic.GenericData.Record(schema)
        schema.getFields.asScala.foreach { f =>
          val v = row.get(row.fieldIndex(f.name())) match {
            case null => null
            case s: String => new Utf8(s)
            case b: Array[Byte] => java.nio.ByteBuffer.wrap(b)
            case other => other.asInstanceOf[AnyRef]
          }
          rec.put(f.pos(), v)
        }
        writer.write(rec, enc)
        enc.flush()
        bos.toByteArray
      }
    }(Encoders.BINARY).toDF(out)
  }
}
