package graft.functions

import java.time.LocalDateTime

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSuite
import graft.functions.EtlFunctions._

/** Scalacheck-generated property tests: each law samples a batch of cases
  * from a Gen (fixed seed), runs them through the Spark expression in ONE
  * DataFrame pass, and checks the law against an independent JVM-side
  * model implementation.
  */
class PropertySpec extends SparkSuite {
  import spark.implicits._

  private def sample[A](g: Gen[List[A]]): List[A] =
    g.apply(Gen.Parameters.default, Seed(42L)).get

  private val tsGen: Gen[java.sql.Timestamp] = for {
    day <- Gen.choose(0, 700)
    sec <- Gen.choose(0, 86399)
  } yield java.sql.Timestamp.valueOf(
    LocalDateTime.of(2023, 1, 1, 0, 0).plusDays(day).plusSeconds(sec))

  test("property: serviceDate equals the JVM model (cutoff at exactly 05:00:00)") {
    val cases = sample(Gen.listOfN(500, tsGen))
    val got = cases.toDF("t").select(serviceDate(col("t")).cast("string"))
      .as[String].collect()
    cases.zip(got).foreach { case (t, g) =>
      val ldt = t.toLocalDateTime
      val expected =
        if (ldt.toLocalTime.compareTo(java.time.LocalTime.of(5, 0)) <= 0)
          ldt.toLocalDate.minusDays(1)
        else ldt.toLocalDate
      assert(g === expected.toString, s"input $t")
    }
  }

  test("property: midnightRollover keeps scheduled time-of-day and shifts at most one day") {
    val pairGen = for { a <- tsGen; b <- tsGen } yield (a, b)
    val cases = sample(Gen.listOfN(500, pairGen))
    val got = cases.toDF("t", "s")
      .select(midnightRollover(col("t"), col("s")).cast("string"))
      .as[String].collect()
    cases.zip(got).foreach { case ((t, s), g) =>
      val ticket = t.toLocalDateTime
      val sched = s.toLocalDateTime
      val shift = if (sched.toLocalTime.isAfter(ticket.toLocalTime)) 1 else 0
      val expected = LocalDateTime.of(ticket.toLocalDate.minusDays(shift), sched.toLocalTime)
      val fmt = java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss")
      assert(g === expected.format(fmt), s"inputs $t / $s")
    }
  }

  test("property: cleanPhone output never contains dashes, is <= 14 chars, and drops a matching prefix") {
    val phoneGen = for {
      pre <- Gen.oneOf(Gen.const(null: String), Gen.choose(1, 99).map(n => s"+$n"))
      mid <- Gen.choose(0L, 999999999L)
      dashes <- Gen.choose(0, 3)
      matching <- Gen.oneOf(true, false)
    } yield {
      val body = ("-" * dashes) + mid.toString
      val tel = if (matching && pre != null) pre + body else body
      (pre, tel)
    }
    val cases = sample(Gen.listOfN(500, phoneGen))
    val got = cases.toDF("p", "t").select(cleanPhone(col("p"), col("t"))).as[String].collect()
    cases.zip(got).foreach { case ((pre, tel), g) =>
      assert(!g.contains("-"), s"dash in $g")
      assert(g.length <= 14)
      val afterStrip = if (pre != null && tel.startsWith(pre)) tel.drop(pre.length) else tel
      assert(g === afterStrip.replace("-", "").take(14), s"inputs $pre / $tel")
    }
  }

  test("property: vatGrossUp equals exact rational arithmetic on cents-scale values") {
    val moneyGen = Gen.choose(0L, 10000000L).map(_ / 100.0)
    val cases = sample(Gen.listOfN(300, moneyGen))
    val got = cases.toDF("x").select(vatGrossUp(col("x"))).as[Double].collect()
    cases.zip(got).foreach { case (x, g) =>
      val e4 = math.floor(x * 10000 + 0.5).toLong
      assert(g === e4 * 115 / 1000000.0, s"input $x")
    }
  }
}
