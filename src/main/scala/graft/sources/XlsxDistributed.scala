package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions.col

import graft.classify.HeaderSniffer
import graft.schema.ReportType

/** Distributed xlsx ingestion — the scale form of the reference's
  * dormant tiered read (S6, `Old/reports_exporter_v0.82.ipynb:484-560`)
  * and the r8-verdict "10k-workbook batch" gap: a `binaryFile` scan
  * fans whole workbooks out to executors, and each parses with the SAME
  * JDK-only zip+StAX path as the driver-side [[Xlsx]] reader
  * ([[Xlsx.parseWorkbookBytes]]).
  *
  * Scale shape: parallelism is per FILE (a workbook is the natural unit
  * — its shared-string pool makes sub-file splits pay the whole pool
  * anyway); 10k workbooks become 10k scan rows spread across every
  * executor, with no driver involvement beyond listing. Parsing memory
  * is workbook-sized per task. The driver-pool path
  * (`Pipeline`/[[Xlsx.readClassified]]) remains the right call for the
  * reference's own handful-of-files workload; this is the form a
  * large-batch deployment switches to.
  *
  * Caveats: `binaryFile` caps single files at ~2 GB (format limit) —
  * far above any real workbook; multi-report batches should cache the
  * scan (`spark.read.format("binaryFile").load(glob).cache()`) before
  * calling [[readClassified]] per report type, or use [[readRaw]] once
  * and classify downstream.
  */
object XlsxDistributed {

  /** Routing threshold for [[readClassifiedSingle]]: a workbook at or
    * above this byte size parses on an EXECUTOR instead of the driver
    * pool ([[graft.pipeline.Pipeline.readInput]] consults it). 32 MB:
    * well past the reference's own report sizes (driver-pool parse
    * stays the low-latency default there), but under it long before a
    * workbook's unzipped XML (~10× the zip) plus its shared-string pool
    * could pressure driver memory when a pool of 16 parses runs
    * concurrently.
    */
  val SingleBookDistributedBytes: Long = 32L * 1024 * 1024

  /** Executor-side form of [[Xlsx.readClassified]] for ONE workbook —
    * identical output frame (same schema, same all-string body rows in
    * sheet order), different execution venue: the workbook ships
    * through a `binaryFile` scan and its single classified sheet parses
    * in an executor task, so a big workbook costs the driver nothing
    * but the listing. One file → one task → one partition, which also
    * preserves the parse-order row sequence the pipeline's
    * `monotonically_increasing_id` tiebreaker relies on.
    */
  def readClassifiedSingle(spark: SparkSession, path: String, sheetIndex: Int,
      headerIdx: Int, schema: graft.schema.ReportSchema): DataFrame = {
    import spark.implicits._
    val struct = schema.allStringStruct
    val width = struct.size
    val rows = spark.read.format("binaryFile").load(path)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (p, bytes) =>
        Xlsx.readSheetBytes(p, bytes, sheetIndex).drop(headerIdx + 1).map { r =>
          (0 until width).map(i => if (i < r.length) r(i) else null): Seq[String]
        }
      }
    spark.createDataFrame(rows.rdd.map(Row.fromSeq), struct)
  }

  /** One parsed sheet row: `cells` is the all-string row exactly as the
    * driver-side [[Xlsx.readSheet]] renders it (nulls for empty cells,
    * date-styled serials rendered).
    */
  final case class XlsxRow(path: String, sheet: String, sheet_idx: Int,
      row_idx: Long, cells: Seq[String])

  /** Every row of every sheet of every workbook matching `glob`, parsed
    * on executors (S1+S2+S5 in one distributed pass).
    */
  def readRaw(spark: SparkSession, glob: String,
      maxRowsPerSheet: Int = Int.MaxValue): Dataset[XlsxRow] = {
    import spark.implicits._
    spark.read.format("binaryFile").load(glob)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (path, bytes) =>
        Xlsx.parseWorkbookBytes(path, bytes, maxRowsPerSheet).flatMap {
          case (sheet, si, rows) =>
            rows.iterator.zipWithIndex.map { case (cells, ri) =>
              XlsxRow(path, sheet, si, ri.toLong, cells)
            }
        }
      }
  }

  /** The distributed analog of classify-then-read (S3+S4+S5): every
    * sheet across the batch sniffs its first 50 rows with the EXACT
    * driver-side semantics ([[HeaderSniffer.classify]] — drop-null exact
    * header match), and sheets classifying as `report` contribute their
    * body rows (below the header, padded/truncated to the schema width)
    * to one all-string frame — the same shape the per-sheet driver read
    * unions to, produced in a single executor-side pass with no
    * per-sheet driver round-trip.
    */
  def readClassified(spark: SparkSession, glob: String,
      report: ReportType): DataFrame = {
    import spark.implicits._
    val struct = report.schema.allStringStruct
    val width = struct.size
    val rows = spark.read.format("binaryFile").load(glob)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (_, bytes) =>
        Xlsx.parseWorkbookBytes(bytes = bytes, label = "batch").flatMap {
          case (_, _, sheetRows) =>
            HeaderSniffer.classify(sheetRows) match {
              case Some((headerIdx, t)) if t == report =>
                sheetRows.drop(headerIdx + 1).map { r =>
                  (0 until width).map(i => if (i < r.length) r(i) else null): Seq[String]
                }
              case _ => Nil
            }
        }
      }
    spark.createDataFrame(
      rows.rdd.map(cells => Row.fromSeq(cells)), struct)
  }
}
