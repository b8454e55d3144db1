package graft.functions

import org.apache.avro.Schema
import org.apache.avro.generic.{GenericDatumReader, GenericRecord}
import org.apache.avro.io.{BinaryDecoder, DecoderFactory}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The engine's Avro WIRE decode (SURVEY.md §2 S74, round-14): a native
  * Catalyst expression that decodes a Confluent-framed, Avro-BINARY
  * Debezium envelope — `[magic 0x00][schema id, 4B big-endian][Avro
  * binary body]` — into the normalized change struct every CDC apply
  * consumes. This is the half of SURVEY §0.1's "Avro" blocker that IS
  * buildable in this image: the `spark-avro` CONNECTOR (from_avro /
  * .format("avro")) is absent, but the Avro SERIALIZATION CORE
  * (avro-1.12.1.jar) is present, and the decode only needs the core —
  * GenericDatumReader over a BinaryDecoder, exactly what the connector's
  * AvroDataToCatalyst does under the hood (public pattern; see
  * spark-avro's AvroDataToCatalyst and Confluent's wire-format docs).
  *
  * The expression IS the registry client: the 4-byte id selects the
  * writer schema (and the epoch's integer-money decode rule) from the
  * compiled-in registry map — the JSON twin (operators/Cdc
  * .debeziumDecode) externalizes the same dictionary as a broadcast
  * join; here it rides inside the deserializer like a production
  * KafkaAvroDeserializer's schema cache. Malformed frames (short buffer,
  * wrong magic, unknown id, truncated body) decode to NULL — the
  * PERMISSIVE contract, so one poison message never kills the stream.
  *
  * Codegen: the decode body is a library call, not arithmetic, so
  * whole-stage codegen references this expression object and invokes
  * [[decode]] per row (the AvroDataToCatalyst pattern) — the expression
  * stays INSIDE the WholeStageCodegen span (no interpreted fallback),
  * and per-thread decoder/reader reuse lives in a ThreadLocal.
  */
case class AvroEnvelopeDecode(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case BinaryType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"avro_envelope_decode requires BINARY, got ${t.catalogString}")
    }

  override def dataType: DataType = AvroEnvelope.decodedType
  override def nullable: Boolean = true
  override def prettyName: String = "avro_envelope_decode"

  /** Public (codegen calls it through a reference to `this`). */
  def decode(bytes: Array[Byte]): InternalRow = AvroEnvelope.decode(bytes)

  override protected def nullSafeEval(input: Any): Any =
    decode(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("avroDecode", this,
      classOf[AvroEnvelopeDecode].getName)
    nullSafeCodeGen(ctx, ev, c => s"""
       |${ev.value} = $ref.decode($c);
       |if (${ev.value} == null) { ${ev.isNull} = true; }
     """.stripMargin)
  }

  override protected def withNewChildInternal(
      newChild: Expression): AvroEnvelopeDecode = copy(child = newChild)
}

/** Wire-format constants, the schema registry, and the per-thread decode
  * machinery shared by the expression (read side) and the landing
  * encoder in operators/AvroWire (write side) — ONE schema definition on
  * both sides by construction, the same no-drift discipline as the bloom
  * probe sharing the writer's xxhash64 expression.
  */
object AvroEnvelope {

  /** Epoch-1 writer schema: money as a 2dp double `value`. */
  val schemaV1Json: String =
    """{"type":"record","name":"Envelope1","namespace":"graft.cdc","fields":[
      |{"name":"before","type":["null",{"type":"record","name":"Img1","fields":[
      |  {"name":"user_id","type":"long"},{"name":"value","type":"double"}]}],"default":null},
      |{"name":"after","type":["null","Img1"],"default":null},
      |{"name":"source","type":{"type":"record","name":"Src","fields":[
      |  {"name":"db","type":"string"},{"name":"tbl","type":"string"},
      |  {"name":"lsn","type":"long"}]}},
      |{"name":"op","type":"string"},
      |{"name":"ts_ms","type":"long"}]}""".stripMargin

  /** Epoch-2 writer schema: the mid-stream DDL — money retyped to i64
    * `amount_cents` (the S14/S46 rename+retype, here at the Avro-schema
    * level where a registry would assign it a fresh id).
    */
  val schemaV2Json: String =
    """{"type":"record","name":"Envelope2","namespace":"graft.cdc","fields":[
      |{"name":"before","type":["null",{"type":"record","name":"Img2","fields":[
      |  {"name":"user_id","type":"long"},{"name":"amount_cents","type":"long"}]}],"default":null},
      |{"name":"after","type":["null","Img2"],"default":null},
      |{"name":"source","type":{"type":"record","name":"Src","fields":[
      |  {"name":"db","type":"string"},{"name":"tbl","type":"string"},
      |  {"name":"lsn","type":"long"}]}},
      |{"name":"op","type":"string"},
      |{"name":"ts_ms","type":"long"}]}""".stripMargin

  /** schema id → (writer schema, cents scale of the epoch's money
    * encoding) — the registry. Ids are the Confluent-frame ids the
    * landing writes.
    */
  lazy val registry: Map[Int, (Schema, Long)] = {
    val p1 = new Schema.Parser().parse(schemaV1Json)
    val p2 = new Schema.Parser().parse(schemaV2Json)
    Map(1 -> ((p1, 1L)), 2 -> ((p2, 100L)))
  }

  /** The normalized change struct (the JSON twin's decode output shape). */
  val decodedType: StructType = StructType(Seq(
    StructField("schema_id", LongType),
    StructField("op", StringType),
    StructField("ts_ms", LongType),
    StructField("lsn", LongType),
    StructField("user_id", LongType),
    StructField("value", DoubleType)))

  // Per-thread reader + reusable decoder: GenericDatumReader is not
  // thread-safe, and reusing the BinaryDecoder skips a per-row
  // allocation. ThreadLocal (not per-expression state) keeps the
  // expression object immutable and safe under whole-stage codegen.
  private final class Ctx {
    val readers: Map[Int, GenericDatumReader[GenericRecord]] =
      registry.map { case (id, (s, _)) =>
        id -> new GenericDatumReader[GenericRecord](s)
      }
    var decoder: BinaryDecoder = _
    var reuse: GenericRecord = _
  }
  private val local = ThreadLocal.withInitial[Ctx](() => new Ctx)

  /** Decode one wire frame; null on any malformation (PERMISSIVE). */
  def decode(bytes: Array[Byte]): InternalRow = {
    if (bytes == null || bytes.length < 6 || bytes(0) != 0) return null
    val id = ((bytes(1) & 0xff) << 24) | ((bytes(2) & 0xff) << 16) |
      ((bytes(3) & 0xff) << 8) | (bytes(4) & 0xff)
    val spec = registry.get(id).orNull
    if (spec == null) return null
    val ctx = local.get()
    try {
      ctx.decoder = DecoderFactory.get()
        .binaryDecoder(bytes, 5, bytes.length - 5, ctx.decoder)
      val rec = ctx.readers(id).read(null, ctx.decoder)
      val op = rec.get("op").toString
      // a delete's image is its BEFORE; everything else decodes AFTER
      val img = {
        val after = rec.get("after").asInstanceOf[GenericRecord]
        if (after != null) after else rec.get("before").asInstanceOf[GenericRecord]
      }
      if (img == null) return null
      val src = rec.get("source").asInstanceOf[GenericRecord]
      val value =
        if (id == 1) img.get("value").asInstanceOf[java.lang.Double].doubleValue()
        else img.get("amount_cents").asInstanceOf[java.lang.Long].longValue()
          .toDouble / spec._2
      new GenericInternalRow(Array[Any](
        id.toLong,
        UTF8String.fromString(op),
        rec.get("ts_ms").asInstanceOf[java.lang.Long].longValue(),
        src.get("lsn").asInstanceOf[java.lang.Long].longValue(),
        img.get("user_id").asInstanceOf[java.lang.Long].longValue(),
        value))
    } catch {
      // PERMISSIVE means ANY malformed-frame failure maps to NULL, not
      // just the decoder's documented exceptions: a corrupt length
      // prefix can surface as NegativeArraySizeException or
      // UnsupportedOperationException, a union-branch mismatch as
      // ClassCastException — an enumerated list re-introduces the
      // "one poison message kills the scan" failure the contract
      // forbids (r14 advisor). NonFatal still rethrows OOM/VM errors.
      case scala.util.control.NonFatal(_) => null
    }
  }
}
