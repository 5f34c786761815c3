package graft.sources

import java.util.concurrent.atomic.AtomicLong

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{
  Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan,
  ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.sources.{
  Filter, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.HashAlgos

/** DataSource V2 connector: a DETERMINISTIC synthetic-corpus generator —
  * `spark.read.format("graft-gen").option("rows", n).option("parts", p)`.
  *
  * This is the file-less way to produce a 100 TB test corpus: every row is a
  * pure function of its `doc_id` (mix64 chains over the same hash kernel the
  * dedup operators use), so any cluster generates the identical corpus in
  * parallel, no storage required. It is also the repo's demonstration of the
  * full V2 source contract, the architectural analog of the reference's
  * storage layer (reference: src/storage/csv.rs:88-167 — its CSV "table
  * provider" with schema + batched scan):
  *
  *  - SupportsPushDownRequiredColumns: pruning reaches GENERATION — if
  *    `text` is pruned, no token string is ever built (SourceV2Spec asserts
  *    this with a generation counter).
  *  - SupportsPushDownFilters: `doc_id` range predicates prune whole INPUT
  *    PARTITIONS — the generator-side equivalent of partition pruning.
  *  - planInputPartitions: `parts` independent id-range partitions, the
  *    parallelism contract of a real cluster scan.
  */
object GenSource {
  val Langs: Array[String] = Array("en", "de", "fr", "es", "zh")
  val VocabSize = 100

  /** Token t of document id — shared by the generator and tests. */
  def token(id: Long, t: Int): String =
    "w" + java.lang.Long.remainderUnsigned(
      HashAlgos.mix64(id * 131L + t), VocabSize.toLong)

  def nTokens(id: Long): Int =
    (10L + java.lang.Long.remainderUnsigned(HashAlgos.mix64(id ^ 0x5eedL), 90L)).toInt

  def lang(id: Long): String =
    Langs(java.lang.Long.remainderUnsigned(HashAlgos.mix64(id), Langs.length.toLong).toInt)

  def text(id: Long): String =
    (0 until nTokens(id)).map(token(id, _)).mkString(" ")

  val schema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("lang", StringType, nullable = false),
    StructField("n_tokens", IntegerType, nullable = false),
    StructField("text", StringType, nullable = false),
  ))

  /** Test hook: number of text strings actually materialized (local mode
    * shares one JVM, so the spec can observe generation work directly).
    */
  val textsGenerated = new AtomicLong(0)
}

class GenSource extends TableProvider with org.apache.spark.sql.sources.DataSourceRegister {
  override def shortName(): String = "graft-gen"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = GenSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table =
    new GenTable(properties.asScala.toMap)
}

class GenTable(props: Map[String, String]) extends Table with SupportsRead {
  override def name(): String = "graft_gen"
  override def schema(): StructType = GenSource.schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GenScanBuilder(
      props.getOrElse("rows", "1000").toLong,
      props.getOrElse("parts", "8").toInt)
}

class GenScanBuilder(rows: Long, parts: Int)
    extends ScanBuilder with SupportsPushDownRequiredColumns with SupportsPushDownFilters {
  private var required: StructType = GenSource.schema
  private var idLo = 0L // inclusive
  private var idHi = rows // exclusive
  private var pushed: Array[Filter] = Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  // accept doc_id range predicates; everything else stays post-scan
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (accepted, rest) = filters.partition {
      case GreaterThan("doc_id", _: java.lang.Long) => true
      case GreaterThanOrEqual("doc_id", _: java.lang.Long) => true
      case LessThan("doc_id", _: java.lang.Long) => true
      case LessThanOrEqual("doc_id", _: java.lang.Long) => true
      case _ => false
    }
    accepted.foreach {
      case GreaterThan("doc_id", v: java.lang.Long) => idLo = idLo.max(v + 1L)
      case GreaterThanOrEqual("doc_id", v: java.lang.Long) => idLo = idLo.max(v.longValue())
      case LessThan("doc_id", v: java.lang.Long) => idHi = idHi.min(v.longValue())
      case LessThanOrEqual("doc_id", v: java.lang.Long) => idHi = idHi.min(v + 1L)
      case _ => ()
    }
    pushed = accepted
    rest // Spark re-applies these above the scan
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan = new GenScan(rows, parts, idLo, idHi, required, pushed)
}

case class GenRange(start: Long, end: Long) extends InputPartition

class GenScan(rows: Long, parts: Int, idLo: Long, idHi: Long,
    required: StructType, pushed: Array[Filter]) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-gen rows=$rows parts=$parts idRange=[$idLo,$idHi) " +
      s"PushedFilters: ${pushed.mkString("[", ", ", "]")}, " +
      s"ReadSchema: ${required.catalogString}"

  // id-range partitions; partitions entirely outside [idLo, idHi) are
  // PRUNED AT PLANNING — the pushed range never even schedules their tasks
  override def planInputPartitions(): Array[InputPartition] = {
    val per = math.max(1L, (rows + parts - 1) / parts)
    (0 until parts).iterator
      .map(p => GenRange(p * per, ((p + 1) * per).min(rows)))
      .filter(r => r.end > r.start && r.end > idLo && r.start < idHi)
      .map(r => GenRange(r.start.max(idLo), r.end.min(idHi)): InputPartition)
      .toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new GenReaderFactory(required)
}

class GenReaderFactory(required: StructType) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val r = partition.asInstanceOf[GenRange]
    new PartitionReader[InternalRow] {
      private var id = r.start - 1
      private val cols = required.fieldNames
      override def next(): Boolean = { id += 1; id < r.end }
      override def get(): InternalRow = {
        InternalRow.fromSeq(cols.toIndexedSeq.map {
          case "doc_id" => id
          case "lang" => UTF8String.fromString(GenSource.lang(id))
          case "n_tokens" => GenSource.nTokens(id)
          case "text" =>
            GenSource.textsGenerated.incrementAndGet()
            UTF8String.fromString(GenSource.text(id))
        })
      }
      override def close(): Unit = ()
    }
  }
}
