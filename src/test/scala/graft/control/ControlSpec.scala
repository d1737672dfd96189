package graft.control

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Jdbc

class ControlSpec extends AnyFunSuite {

  test("C1: version gate blocks older versions, registers newer final ones") {
    val dir = Files.createTempDirectory("graft-vg")
    val store = s"$dir/versions.txt"
    val d1 = VersionGate.check(store, 0.83, isFinal = true)
    assert(d1.proceed && d1.registered)
    val d2 = VersionGate.check(store, 0.82, isFinal = true)
    assert(!d2.proceed && d2.maxSeen === 0.83)
    val d3 = VersionGate.check(store, 0.83, isFinal = true) // equal → proceed, no re-register
    assert(d3.proceed && !d3.registered)
    val d4 = VersionGate.check(store, 0.90, isFinal = false) // newer draft → proceed, no register
    assert(d4.proceed && !d4.registered)
  }

  test("C4: error collector accumulates and maps to exit code") {
    val ec = new ErrorCollector
    assert(!ec.errorsFound && ec.exitCode === 0)
    ec.record("reader", "boom")
    ec.record("sink", "bang")
    assert(ec.errorsFound && ec.exitCode === 1)
    assert(ec.summary.contains("2 error(s)"))
    assert(ec.all.map(_._1) === Seq("reader", "sink"))
  }

  test("K8: archival moves and overwrites") {
    val src = Files.createTempDirectory("graft-src")
    val dst = Files.createTempDirectory("graft-dst")
    Files.writeString(Paths.get(s"$src/f.csv"), "v1")
    Files.writeString(Paths.get(s"$dst/f.csv"), "old")
    val moved = Archival.archive(Seq(s"$src/f.csv"), dst.toString)
    assert(moved === Seq(s"$dst/f.csv"))
    assert(Files.readString(Paths.get(s"$dst/f.csv")) === "v1")
    assert(!Files.exists(Paths.get(s"$src/f.csv")))
  }

  test("K4-K7: load-protocol SQL builders match the reference statement shapes") {
    assert(Jdbc.Sql.deleteRange("\"AFC\".train_list", "departure_date_short", "2024-01-01", "2024-01-03")
      === """DELETE FROM "AFC".train_list WHERE "departure_date_short" BETWEEN '2024-01-01' AND '2024-01-03'""")
    assert(Jdbc.Sql.deleteDay("t", "operation_date_time", "2024-01-01")
      === """DELETE FROM t WHERE to_char("operation_date_time", 'yyyy-mm-dd') = '2024-01-01'""")
    assert(Jdbc.Sql.deleteSnapshotRange("t", "date", "a", "b", "data_date", "today")
      .endsWith("""AND "data_date" = 'today'"""))
    assert(Jdbc.Sql.auditInsert("\"AFC\".audit", "rs", "t", "overwrite", "2024-01-01", "u")
      .startsWith("""INSERT INTO "AFC".audit ("timestamp", "table", operation, period, "user")"""))
    assert(Jdbc.Sql.dropConstraints("\"AFC\".drop_all_constraints", "AFC", "train_list")
      === """SELECT "AFC".drop_all_constraints('AFC', 'train_list')""")
  }
}
