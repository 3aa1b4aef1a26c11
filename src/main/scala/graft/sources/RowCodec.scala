package graft.sources

import java.io.{ByteArrayOutputStream, DataOutputStream}
import java.math.BigInteger

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{GenericInternalRow, SpecializedGetters}
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, ArrayData, GenericArrayData, MapData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.{CalendarInterval, UTF8String}

import graft.store.FeatureValidationError

/** Schema-driven binary row format — the wire/staging representation the
  * `graft` DataSource V2 connector moves rows through (a V2
  * `PartitionReader`/`DataWriter` produces and consumes `InternalRow`s
  * itself; this codec is the exact, zero-dependency encoding between
  * those rows and the staged blob files, [[BlobStagingIO]]).
  *
  * Layout per row (all big-endian, schema-driven — no per-row schema):
  *   - null bitmap: ceil(n/8) bytes, bit i set = field i IS NULL
  *   - non-null fields back to back:
  *       fixed-width primitives at their natural width; timestamps as
  *       their Catalyst micros long, dates as days int; strings/binary
  *       as length-prefixed bytes; decimals as length-prefixed unscaled
  *       big-integer bytes (scale from the schema — exact at any
  *       precision); arrays as count + element bitmap + elements;
  *       maps as key array + value array; structs recurse.
  *
  * Exactness contract: every Catalyst value roundtrips bit-identically
  * (no text formatting, no float printing, no timezone math) — the
  * property spec fuzzes the full type matrix.
  */
object RowCodec {

  /** Fail fast (at plan/build time, not mid-stream) on types the codec
    * does not carry.
    */
  def validate(schema: StructType): Unit = schema.fields.foreach(f => check(f.dataType))

  private def check(dt: DataType): Unit = dt match {
    case BooleanType | ByteType | ShortType | IntegerType | LongType |
        FloatType | DoubleType | StringType | BinaryType | DateType |
        TimestampType | TimestampNTZType | NullType | CalendarIntervalType =>
    case _: DecimalType => ()
    case _: YearMonthIntervalType | _: DayTimeIntervalType => ()
    case ArrayType(et, _) => check(et)
    case MapType(kt, vt, _) => check(kt); check(vt)
    case st: StructType => st.fields.foreach(f => check(f.dataType))
    case other =>
      throw new FeatureValidationError(
        s"graft row codec does not support ${other.simpleString}")
  }

  // ------------------------------------------------------------- write

  def pack(row: InternalRow, schema: StructType): Array[Byte] = {
    val bos = new ByteArrayOutputStream(64)
    val out = new DataOutputStream(bos)
    writeStruct(out, row, schema.fields.map(_.dataType))
    out.flush()
    bos.toByteArray
  }

  private def writeStruct(
      out: DataOutputStream, row: SpecializedGetters, types: Array[DataType]): Unit = {
    val n = types.length
    writeBitmap(out, n, row.isNullAt)
    var i = 0
    while (i < n) {
      if (!row.isNullAt(i)) writeValue(out, row, i, types(i))
      i += 1
    }
  }

  private def writeBitmap(
      out: DataOutputStream, n: Int, isNull: Int => Boolean): Unit = {
    var b = 0
    var i = 0
    while (i < n) {
      if (isNull(i)) b |= 1 << (i & 7)
      if ((i & 7) == 7) { out.writeByte(b); b = 0 }
      i += 1
    }
    if ((n & 7) != 0) out.writeByte(b)
  }

  private def writeValue(
      out: DataOutputStream, g: SpecializedGetters, i: Int, dt: DataType): Unit =
    dt match {
      case BooleanType => out.writeBoolean(g.getBoolean(i))
      case ByteType => out.writeByte(g.getByte(i).toInt)
      case ShortType => out.writeShort(g.getShort(i).toInt)
      case IntegerType | DateType | _: YearMonthIntervalType =>
        out.writeInt(g.getInt(i))
      case LongType | TimestampType | TimestampNTZType | _: DayTimeIntervalType =>
        out.writeLong(g.getLong(i))
      case FloatType => out.writeFloat(g.getFloat(i))
      case DoubleType => out.writeDouble(g.getDouble(i))
      case StringType => writeBytes(out, g.getUTF8String(i).getBytes)
      case BinaryType => writeBytes(out, g.getBinary(i))
      case d: DecimalType =>
        writeBytes(out,
          g.getDecimal(i, d.precision, d.scale)
            .toJavaBigDecimal.unscaledValue.toByteArray)
      case CalendarIntervalType =>
        val v = g.getInterval(i)
        out.writeInt(v.months); out.writeInt(v.days); out.writeLong(v.microseconds)
      case ArrayType(et, _) => writeArray(out, g.getArray(i), et)
      case MapType(kt, vt, _) =>
        val m = g.getMap(i)
        writeArray(out, m.keyArray(), kt)
        writeArray(out, m.valueArray(), vt)
      case st: StructType =>
        writeStruct(out, g.getStruct(i, st.length), st.fields.map(_.dataType))
      case NullType => () // bitmap already said null (non-null NullType impossible)
      case other =>
        throw new FeatureValidationError(
          s"graft row codec does not support ${other.simpleString}")
    }

  private def writeArray(out: DataOutputStream, a: ArrayData, et: DataType): Unit = {
    val n = a.numElements()
    out.writeInt(n)
    writeBitmap(out, n, a.isNullAt)
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i)) writeValue(out, a, i, et)
      i += 1
    }
  }

  private def writeBytes(out: DataOutputStream, b: Array[Byte]): Unit = {
    out.writeInt(b.length)
    out.write(b)
  }

  // -------------------------------------------------------------- read

  def unpack(bytes: Array[Byte], schema: StructType): InternalRow = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    readStruct(in, schema.fields.map(_.dataType))
  }

  private def readStruct(
      in: java.io.DataInputStream, types: Array[DataType]): GenericInternalRow = {
    val n = types.length
    val nulls = readBitmap(in, n)
    val values = new Array[Any](n)
    var i = 0
    while (i < n) {
      if (!nulls(i)) values(i) = readValue(in, types(i))
      i += 1
    }
    new GenericInternalRow(values)
  }

  private def readBitmap(in: java.io.DataInputStream, n: Int): Array[Boolean] = {
    val r = new Array[Boolean](n)
    var b = 0
    var i = 0
    while (i < n) {
      if ((i & 7) == 0) b = in.readUnsignedByte()
      r(i) = (b & (1 << (i & 7))) != 0
      i += 1
    }
    r
  }

  private def readValue(in: java.io.DataInputStream, dt: DataType): Any = dt match {
    case BooleanType => in.readBoolean()
    case ByteType => in.readByte()
    case ShortType => in.readShort()
    case IntegerType | DateType | _: YearMonthIntervalType => in.readInt()
    case LongType | TimestampType | TimestampNTZType | _: DayTimeIntervalType =>
      in.readLong()
    case FloatType => in.readFloat()
    case DoubleType => in.readDouble()
    case StringType => UTF8String.fromBytes(readBytes(in))
    case BinaryType => readBytes(in)
    case d: DecimalType =>
      Decimal(
        new java.math.BigDecimal(new BigInteger(readBytes(in)), d.scale),
        d.precision, d.scale)
    case CalendarIntervalType =>
      new CalendarInterval(in.readInt(), in.readInt(), in.readLong())
    case ArrayType(et, _) => readArray(in, et)
    case MapType(kt, vt, _) =>
      new ArrayBasedMapData(readArray(in, kt), readArray(in, vt))
    case st: StructType => readStruct(in, st.fields.map(_.dataType))
    case other =>
      throw new FeatureValidationError(
        s"graft row codec does not support ${other.simpleString}")
  }

  private def readArray(in: java.io.DataInputStream, et: DataType): ArrayData = {
    val n = in.readInt()
    val nulls = readBitmap(in, n)
    val values = new Array[Any](n)
    var i = 0
    while (i < n) {
      if (!nulls(i)) values(i) = readValue(in, et)
      i += 1
    }
    new GenericArrayData(values)
  }

  private def readBytes(in: java.io.DataInputStream): Array[Byte] = {
    val b = new Array[Byte](in.readInt())
    in.readFully(b)
    b
  }
}
