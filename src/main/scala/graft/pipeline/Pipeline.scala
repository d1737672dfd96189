package graft.pipeline

import java.io.File

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.classify.HeaderSniffer
import graft.operators.{Consolidate, KeepLastDedup}
import graft.readers.{BookingPaymentReader, OccupancyReader, ReaderOutput, TrainListReader}
import graft.schema.ReportType
import graft.sinks.SideChannelCsv

/** C2/C3/C4 + §3.1 — the end-to-end batch pipeline: discover input files,
  * classify each (S3/S4), dispatch to the per-type reader with per-input
  * failure isolation, consolidate (union → keep-last dedup with an
  * input-order tiebreaker), and write the three side channels.
  *
  * Reference: `reports_exporter_v0.83.py:1629-1656` (dispatcher; a failing
  * sheet is logged and skipped, the batch proceeds) and `:1662-1875` (main).
  *
  * Scale notes: classification collects ≤50 rows per file (the reference's
  * own bound); everything else is one lazy plan per report type — the
  * union'd scan, clean, dedup window, and sinks all execute distributed.
  */
object Pipeline {

  final case class InputError(path: String, message: String)
  final case class ReportResult(
      report: ReportType,
      kept: DataFrame,
      duplicates: DataFrame,
      rejects: DataFrame,
      missingTrainNumbers: Option[DataFrame])
  final case class RunResult(results: Seq[ReportResult], errors: Seq[InputError],
      unclassified: Seq[String]) {
    /** C4 — any accumulated error flips the run to failed. */
    def errorsFound: Boolean = errors.nonEmpty
  }

  /** S1 — enumerate candidate input files (driver-side, like the
    * reference's `os.listdir`).
    */
  def discover(inputDir: String, suffix: String = ".csv"): Seq[String] = {
    val files = Option(new File(inputDir).listFiles()).getOrElse(Array.empty)
    files.filter(f => f.isFile && f.getName.endsWith(suffix))
      .map(_.getPath).sorted.toIndexedSeq
  }

  /** C2 — dispatch one classified input to its reader. Any throw is
    * captured (C3) and the input skipped.
    */
  def readInput(spark: SparkSession, path: String, headerIdx: Int, report: ReportType,
      fileOrd: Int, trainHours: => DataFrame, history: => DataFrame)
      : Either[InputError, ReaderOutput] =
    try {
      val raw = HeaderSniffer.readClassified(spark, path, headerIdx, report)
        // D1 input-order tiebreaker (SURVEY §7.4 risk 1): file ordinal +
        // per-file row id reproduce pandas' stable keep-last across a batch.
        .withColumn("__file_ord", lit(fileOrd))
        .withColumn("__row_ord", monotonically_increasing_id())
      report match {
        case ReportType.TrainList =>
          val r = TrainListReader(raw, trainHours, history)
          if (!r.missingTrainNumbers.isEmpty) {
            val missing = r.missingTrainNumbers.limit(20).collect().map(_.get(0)).mkString(", ")
            Left(InputError(path, s"train numbers missing from departure times: $missing"))
          } else Right(ReaderOutput(r.good, r.rejects))
        case ReportType.Occupancy      => Right(OccupancyReader(raw))
        case ReportType.BookingPayment => Right(BookingPaymentReader(raw))
      }
    } catch {
      case e: Exception => Left(InputError(path, String.valueOf(e.getMessage)))
    }

  /** Full run over a directory of CSVs. Readers carry the tiebreaker
    * columns through to consolidation, where the dedup window orders by
    * (report sort keys, file ordinal, row ordinal) — exact pandas
    * stable-sort keep-last parity — and drops them from the outputs.
    */
  def run(spark: SparkSession, inputDir: String, exportDir: String, runStamp: String,
      trainHours: => DataFrame, history: => DataFrame): RunResult = {
    val inputs = discover(inputDir)
    val classified = inputs.map(p => p -> HeaderSniffer.classifyCsv(spark, p))
    val unclassified = classified.collect { case (p, None) => p }

    val errors = Seq.newBuilder[InputError]
    val results = ReportType.all.flatMap { report =>
      val mine = classified.collect { case (p, Some((idx, r))) if r == report => (p, idx) }
      if (mine.isEmpty) None
      else {
        val reads = mine.zipWithIndex.map { case ((p, idx), ord) =>
          readInput(spark, p, idx, report, ord, trainHours, history)
        }
        reads.collect { case Left(e) => e }.foreach(errors += _)
        val ok = reads.collect { case Right(o) => o }
        if (ok.isEmpty) None
        else {
          val tiebreak = Seq(col("__file_ord"), col("__row_ord"))
          val ordering = report.schema.sortKeys
            .filter(k => ok.head.good.columns.contains(k)).map(col) ++ tiebreak
          val (kept0, dups0) = Consolidate(ok.map(_.good), report.schema.dedupKeys, ordering)
          val kept = kept0.drop("__file_ord", "__row_ord")
          val dups = dups0.drop("__file_ord", "__row_ord")
          val rejects = Consolidate.union(ok.map(_.rejects)).drop("__file_ord", "__row_ord")
          Some(ReportResult(report, kept, dups, rejects, None))
        }
      }
    }

    // K1-K3 side channels per report.
    results.foreach { r =>
      val name = r.report.schema.name
      SideChannelCsv.writeErrors(r.rejects, exportDir, name, runStamp)
      SideChannelCsv.writeDuplicates(r.duplicates, exportDir, name, runStamp)
      SideChannelCsv.writeSnapshot(r.kept, exportDir, name, runStamp)
    }
    RunResult(results, errors.result(), unclassified)
  }
}
