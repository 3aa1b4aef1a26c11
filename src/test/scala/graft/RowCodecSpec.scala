package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{BlobStagingIO, RowCodec, RowCodecExpressions}

/** The connector's binary row codec ([[graft.sources.RowCodec]]) and the
  * staged-blob parquet I/O ([[graft.sources.BlobStagingIO]]): exact
  * roundtrips across the full type matrix, nulls included, both through
  * Spark plans (pack/unpack expressions) and through the executor-side
  * parquet-mr reader/writer the V2 connector uses.
  */
class RowCodecSpec extends AnyFunSuite with SparkTestBase {

  private def gnarly = {
    val schema = StructType(Seq(
      StructField("s", StringType),
      StructField("l", LongType),
      StructField("i", IntegerType),
      StructField("sh", ShortType),
      StructField("by", ByteType),
      StructField("d", DoubleType),
      StructField("f", FloatType),
      StructField("b", BooleanType),
      StructField("bin", BinaryType),
      StructField("dt", DateType),
      StructField("ts", TimestampType),
      StructField("dec", DecimalType(38, 10)),
      StructField("small_dec", DecimalType(10, 2)),
      StructField("arr", ArrayType(FloatType)),
      StructField("arr_n", ArrayType(StringType, containsNull = true)),
      StructField("m", MapType(StringType, LongType, valueContainsNull = true)),
      StructField("st", StructType(Seq(
        StructField("a", LongType), StructField("b", StringType))))))
    val rows = Seq(
      Row("héllo ☃", 42L, 7, 3.toShort, 1.toByte, 2.5d, 1.25f, true,
        Array[Byte](1, 2, -3), java.sql.Date.valueOf("2024-02-29"),
        ts("2024-01-15 10:30:00"),
        BigDecimal("12345678901234567890.1234567891"), BigDecimal("99.99"),
        Seq(1.5f, -2.5f), Seq("x", null, "z"),
        Map("k1" -> 1L, "k2" -> null), Row(5L, "in")),
      Row(null, null, null, null, null, null, null, null,
        null, null, null, null, null, null, null, null, null),
      Row("", 0L, -1, 0.toShort, 0.toByte, Double.NaN, Float.NegativeInfinity,
        false, Array.empty[Byte], java.sql.Date.valueOf("1969-12-31"),
        ts("1969-12-31 23:59:59"), BigDecimal("-0.0000000001"),
        BigDecimal("-1.00"), Seq.empty[Float], Seq.empty[String],
        Map.empty[String, Long], Row(null, null)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), schema)
  }

  test("pack/unpack expressions roundtrip the full type matrix exactly") {
    val df = gnarly
    val packed = df.select(RowCodecExpressions.packed(df.columns.toSeq).as("r"))
    assert(packed.schema.head.dataType == BinaryType)
    val back = packed
      .select(RowCodecExpressions.unpacked(col("r"),
        df.schema).as("u"))
      .select("u.*")
    assert(back.schema == df.schema)
    // NaN-safe multiset equality (maps normalized to sorted entries —
    // set operations reject MapType columns)
    def norm(d: org.apache.spark.sql.DataFrame) =
      d.withColumn("m", array_sort(map_entries(col("m"))))
    assert(norm(back).exceptAll(norm(df)).isEmpty &&
      norm(df).exceptAll(norm(back)).isEmpty)
  }

  test("pack/unpack generate compilable code (no interpreted fallback)") {
    // CODEGEN_ONLY turns a codegen compile error into a hard failure
    // instead of Spark's silent fallback to interpreted eval — this is
    // the proof that doGenCode on both expressions actually compiles.
    val prevFactory = spark.conf.getOption("spark.sql.codegen.factoryMode")
    val prevFallback = spark.conf.getOption("spark.sql.codegen.fallback")
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val df = gnarly
      val back = df
        .select(RowCodecExpressions.packed(df.columns.toSeq).as("r"))
        .select(RowCodecExpressions.unpacked(col("r"), df.schema).as("u"))
        .select("u.*")
      assert(back.count() == 3)
    } finally {
      prevFactory.fold(spark.conf.unset("spark.sql.codegen.factoryMode"))(
        spark.conf.set("spark.sql.codegen.factoryMode", _))
      prevFallback.fold(spark.conf.unset("spark.sql.codegen.fallback"))(
        spark.conf.set("spark.sql.codegen.fallback", _))
    }
  }

  test("pack expression output decodes with the executor-side RowCodec") {
    val df = gnarly.filter(col("s").isNotNull && col("s") =!= "")
    val bytes = df.select(RowCodecExpressions.packed(df.columns.toSeq))
      .head().getAs[Array[Byte]](0)
    val row = RowCodec.unpack(bytes, df.schema)
    assert(row.getUTF8String(0).toString == "héllo ☃")
    assert(row.getLong(1) == 42L)
    assert(row.getDecimal(11, 38, 10).toJavaBigDecimal ==
      new java.math.BigDecimal("12345678901234567890.1234567891"))
    assert(row.getArray(13).toFloatArray().toSeq == Seq(1.5f, -2.5f))
    assert(row.getStruct(16, 2).getLong(0) == 5L)
  }

  test("blob parquet files roundtrip through parquet-mr and Spark both ways") {
    val dir = java.nio.file.Files.createTempDirectory("graft_blob").toString
    val conf = spark.sparkContext.hadoopConfiguration
    // executor-side writer -> Spark reader
    val w = new BlobStagingIO.BlobFileWriter(s"$dir/part-0.parquet", conf)
    val payloads = (0 until 100).map(i => Array.fill(i % 17 + 1)(i.toByte))
    payloads.foreach(w.write)
    assert(w.rows == 100)
    w.close()
    val viaSpark = spark.read.parquet(s"$dir/part-0.parquet")
      .collect().map(_.getAs[Array[Byte]](BlobStagingIO.BlobColumn))
    assert(viaSpark.map(_.toSeq).sortBy(_.length).toSeq ==
      payloads.map(_.toSeq).sortBy(_.length))
    // Spark writer -> executor-side reader
    val df = gnarly
    df.select(RowCodecExpressions.packed(df.columns.toSeq)
      .as(BlobStagingIO.BlobColumn))
      .write.parquet(s"$dir/spark")
    val files = new java.io.File(s"$dir/spark").listFiles()
      .filter(f => f.getName.endsWith(".parquet")).map(_.getPath)
    val decoded = files.iterator
      .flatMap(BlobStagingIO.readBlobs(_, conf))
      .map(RowCodec.unpack(_, df.schema))
      .toSeq
    assert(decoded.size == 3)
    assert(decoded.map(r => if (r.isNullAt(1)) -1L else r.getLong(1)).sorted
      == Seq(-1L, 0L, 42L))
    // serialized conf rebuilds and still reads
    val sc2 = new BlobStagingIO.SerializableHadoopConf(conf)
    val bytes2 = java.io.OutputStream.nullOutputStream()
    val oos = new java.io.ObjectOutputStream(bytes2)
    oos.writeObject(sc2); oos.close()
    assert(BlobStagingIO.readBlobs(files.head, sc2.value).nonEmpty)
  }
}
