package graft

import org.apache.spark.sql.functions._
import graft.functions.{AvroEnvelope, AvroEnvelopeDecode}
import org.apache.spark.sql.graftbridge.Bridge

/** The native Avro envelope decode: wire round-trip identity in both
  * execution modes, and the PERMISSIVE malformed-frame contract (one
  * poison message decodes to NULL, never kills the scan).
  */
class AvroWireSpec extends SparkSpec {

  private def decodeCol(c: org.apache.spark.sql.Column) =
    Bridge.column(AvroEnvelopeDecode(Bridge.expression(c)))

  private def withSQLConf[A](pairs: (String, String)*)(f: => A): A = {
    val conf = spark.conf
    val saved = pairs.map { case (k, _) => k -> conf.getOption(k) }
    pairs.foreach { case (k, v) => conf.set(k, v) }
    try f
    finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }

  /** Hand-encode one epoch-1 frame with the registry writer schema. */
  private def frame(id: Int, uid: Long, tsMs: Long, lsn: Long, op: String,
      v: Double): Array[Byte] = {
    val (schema, _) = AvroEnvelope.registry(id)
    val imgT = schema.getField("after").schema.getTypes.get(1)
    val img = new org.apache.avro.generic.GenericData.Record(imgT)
    img.put("user_id", uid)
    if (id == 1) img.put("value", v)
    else img.put("amount_cents", math.round(v * 100))
    val src = new org.apache.avro.generic.GenericData.Record(
      schema.getField("source").schema)
    src.put("db", "app"); src.put("tbl", "events"); src.put("lsn", lsn)
    val rec = new org.apache.avro.generic.GenericData.Record(schema)
    rec.put(if (op == "d") "before" else "after", img)
    rec.put("source", src); rec.put("op", op); rec.put("ts_ms", tsMs)
    val bos = new java.io.ByteArrayOutputStream(64)
    bos.write(0)
    bos.write((id >>> 24) & 0xff); bos.write((id >>> 16) & 0xff)
    bos.write((id >>> 8) & 0xff); bos.write(id & 0xff)
    val enc = org.apache.avro.io.EncoderFactory.get().binaryEncoder(bos, null)
    new org.apache.avro.generic.GenericDatumWriter[
      org.apache.avro.generic.GenericRecord](schema).write(rec, enc)
    enc.flush()
    bos.toByteArray
  }

  test("decode round-trips both epochs and resolves the money encoding") {
    import spark.implicits._
    val frames = Seq(
      frame(1, 7L, 1000L, 11L, "u", 12.34),
      frame(2, 8L, 2000L, 12L, "c", 56.78),
      frame(2, 9L, 3000L, 13L, "d", 1.0))
    val got = frames.toDF("value")
      .select(decodeCol(col("value")).as("m")).select(col("m.*"))
      .orderBy(col("user_id"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5)))
    assert(got.toSeq == Seq(
      (1L, "u", 1000L, 11L, 7L, 12.34),
      (2L, "c", 2000L, 12L, 8L, 56.78),
      (2L, "d", 3000L, 13L, 9L, 1.0))) // delete decodes its BEFORE image
  }

  test("malformed frames decode to NULL (permissive), valid rows survive") {
    import spark.implicits._
    val rows: Seq[Array[Byte]] = Seq(
      frame(1, 1L, 10L, 1L, "u", 1.5),
      Array[Byte](),                       // empty
      Array[Byte](1, 0, 0, 0, 1, 2, 3),    // wrong magic
      Array[Byte](0, 0, 0, 0, 99, 2, 3),   // unknown schema id
      frame(1, 2L, 20L, 2L, "c", 2.5).take(8)) // truncated body
    val out = rows.toDF("value")
      .select(decodeCol(col("value")).as("m"))
    assert(out.filter(col("m").isNull).count() == 4)
    assert(out.filter(col("m").isNotNull).count() == 1)
    // interpreted mode agrees with codegen
    withSQLConf("spark.sql.codegen.wholeStage" -> "false",
      "spark.sql.codegen.factoryMode" -> "NO_CODEGEN") {
      assert(rows.toDF("value").select(decodeCol(col("value")).as("m"))
        .filter(col("m").isNull).count() == 4)
    }
  }

  test("cdc_avro_apply executes on sf0.001 and matches the JSON twin's " +
      "truth (same canonical LWW state, different wire)") {
    val avro = SparkEntry.queries("cdc_avro_apply")(spark, sfTiny).collect()
    val json = SparkEntry.queries("cdc_debezium_envelope")(spark, sfTiny)
      .collect()
    assert(avro.nonEmpty)
    assert(avro.map(_.toSeq).toSeq == json.map(_.toSeq).toSeq,
      "Avro wire and JSON wire disagree on the applied state")
  }
}
