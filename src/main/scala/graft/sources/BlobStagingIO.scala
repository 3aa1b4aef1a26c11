package graft.sources

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.example.data.simple.SimpleGroupFactory
import org.apache.parquet.hadoop.example.{ExampleParquetWriter, GroupReadSupport}
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.hadoop.{ParquetFileWriter, ParquetReader, ParquetWriter}
import org.apache.parquet.io.api.Binary
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName
import org.apache.parquet.schema.{MessageType, Types}

/** Executor-side I/O for the connector's STAGED MICROBATCHES: parquet
  * files of exactly one optional binary column (`r`), each value one
  * [[RowCodec]]-packed row.
  *
  * Why this shape: a DataSource V2 `PartitionReader`/`DataWriter` runs
  * on executors with no SparkSession, so it must read and write files
  * itself. A single-binary-column parquet file is trivially codable
  * through parquet-mr's PUBLIC example API (no Spark-internal parquet
  * classes), while staying a real parquet file — Spark's own
  * `spark.read.parquet` reads the sink's staged files back on the
  * driver, and Spark's parquet writer produces the source's staged
  * files. Compression and checksums come with the container for free.
  */
object BlobStagingIO {

  val BlobColumn = "r"

  val blobMessageType: MessageType =
    Types.buildMessage()
      .optional(PrimitiveTypeName.BINARY).named(BlobColumn)
      .named("graft_blob")

  /** The same single-column shape as a Spark schema, for reading the
    * sink's staged files back with `spark.read.schema(...).parquet`
    * (skips footer-based inference on the commit path).
    */
  val sparkBlobSchema: org.apache.spark.sql.types.StructType =
    new org.apache.spark.sql.types.StructType()
      .add(BlobColumn, org.apache.spark.sql.types.BinaryType)

  /** Read every packed blob of one staged file. */
  def readBlobs(file: String, conf: Configuration): Iterator[Array[Byte]] =
    new BlobFileIterator(file, conf)

  /** The executor-side reader of one staged file. Closes itself at
    * exhaustion; `close()` covers early termination (task kill,
    * downstream limit).
    */
  final class BlobFileIterator(file: String, conf: Configuration)
      extends Iterator[Array[Byte]] with AutoCloseable {
    private val reader: ParquetReader[org.apache.parquet.example.data.Group] =
      ParquetReader
        .builder(new GroupReadSupport(), new Path(file))
        .withConf(conf)
        .build()
    private var closed = false
    private var nextGroup = reader.read()
    override def hasNext: Boolean = {
      if (nextGroup == null) close()
      nextGroup != null
    }
    override def next(): Array[Byte] = {
      val g = nextGroup
      nextGroup = reader.read()
      if (g.getFieldRepetitionCount(BlobColumn) == 0)
        // a null blob row cannot be produced by our writers; skip
        if (hasNext) next() else throw new NoSuchElementException
      else g.getBinary(BlobColumn, 0).getBytes
    }
    override def close(): Unit =
      if (!closed) { closed = true; reader.close() }
  }

  /** An open single-file blob writer (the sink's DataWriter side). */
  final class BlobFileWriter(file: String, conf: Configuration) {
    private val factory = new SimpleGroupFactory(blobMessageType)
    private val writer: ParquetWriter[org.apache.parquet.example.data.Group] =
      ExampleParquetWriter.builder(new Path(file))
        .withConf(conf)
        .withType(blobMessageType)
        .withWriteMode(ParquetFileWriter.Mode.OVERWRITE)
        .build()
    private var count = 0L
    def write(bytes: Array[Byte]): Unit = {
      val g = factory.newGroup()
      g.append(BlobColumn, Binary.fromConstantByteArray(bytes))
      writer.write(g)
      count += 1L
    }
    def rows: Long = count
    def close(): Unit = writer.close()
  }

  /** The Hadoop configuration, serialized as its explicit entries so a
    * V2 reader/writer factory can carry it to executors (the
    * `Configuration` class itself is not `Serializable`).
    */
  final class SerializableHadoopConf(@transient conf: Configuration)
      extends Serializable {
    private val entries: Array[(String, String)] =
      conf.iterator().asScala.map(e => (e.getKey, e.getValue)).toArray
    @transient private lazy val rebuilt: Configuration = {
      val c = new Configuration(false)
      entries.foreach { case (k, v) => c.set(k, v) }
      c
    }
    def value: Configuration = rebuilt
  }
}
