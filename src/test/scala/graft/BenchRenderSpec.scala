package graft

import org.json4s._
import org.json4s.jackson.JsonMethods
import org.scalatest.funsuite.AnyFunSuite

/** Pins the bench output contract. Since r18 the LAST stdout line is
  * the FULL per-query map (`tail -1` in tools/bench.sh must see every
  * query — the r17 PERF diff mislabeled below-cutoff queries as
  * dropped); the compact line is emitted one line earlier so a
  * char-truncated tail capture (round 8 went unscored, parsed=null,
  * when its only line ran ~2400 chars against a ~2000-char window) can
  * still recover the headline metric and the slowest queries.
  */
class BenchRenderSpec extends AnyFunSuite {

  // Realistic registry shape: ~98 queries with names this long.
  private val names: Seq[String] =
    (1 to 98).map(i => s"q${i}_some_operator_name_${"x" * (i % 12)}")
  private val results: Map[String, Double] =
    names.zipWithIndex.map { case (n, i) => n -> (i % 40) * 0.123456789 }.toMap

  test("compact line fits the tail window and parses standalone") {
    val (full, compact) = Bench.renderLines(results, Nil, "/root/testdata/sf0.1")
    assert(full.length > compact.length)
    // 2000-char window minus sbt's trailing "[success] Total time: …"
    // line (~90 chars) and both newlines, with margin.
    assert(compact.length <= 1700, s"compact line is ${compact.length} chars")
    val parsed = JsonMethods.parse(compact)
    val JString(metric) = (parsed \ "metric"): @unchecked
    assert(metric == "total")
    val value = (parsed \ "value") match {
      case JDouble(d)  => d
      case JInt(i)     => i.toDouble
      case JDecimal(d) => d.toDouble
      case other       => fail(s"value not numeric: $other")
    }
    val expected = results.values.filter(_ >= 0).sum
    assert(math.abs(value - expected) < 0.01)
    val JInt(n) = (parsed \ "n_queries"): @unchecked
    assert(n == results.size)
  }

  test("compact map keeps the slowest queries first and accounts for omissions") {
    val (_, compact) = Bench.renderLines(results, Nil, "/tmp/sf")
    val parsed = JsonMethods.parse(compact)
    val JObject(qfields) = (parsed \ "queries"): @unchecked
    val JInt(omitted) = (parsed \ "queries_omitted"): @unchecked
    assert(qfields.size + omitted.toInt == results.size)
    // The globally slowest query must always be present.
    val slowestName = results.maxBy(_._2)._1
    assert(qfields.exists(_._1 == slowestName))
    // Everything included must be at least as slow as everything omitted.
    val includedMin = qfields.map { case (k, _) => results(k) }.min
    val omittedMax = results.view.filterKeys(k => !qfields.exists(_._1 == k)).values
    if (omittedMax.nonEmpty) assert(includedMin >= omittedMax.max - 1e-9)
  }

  test("failed queries carry sentinel -1 and are excluded from total") {
    val r = Map("ok_a" -> 1.5, "ok_b" -> 2.5, "broken" -> -1.0)
    val (full, compact) = Bench.renderLines(r, Seq("broken"), "/tmp/sf")
    for (line <- Seq(full, compact)) {
      val parsed = JsonMethods.parse(line)
      val value = (parsed \ "value") match {
        case JDouble(d)  => d
        case JDecimal(d) => d.toDouble
        case JInt(i)     => i.toDouble
        case other       => fail(s"value not numeric: $other")
      }
      assert(math.abs(value - 4.0) < 1e-9)
      val JArray(errs) = (parsed \ "errors"): @unchecked
      assert(errs == List(JString("broken")))
    }
  }

  test("calibration_sec rides both lines; the spin is stable within ~10% across runs") {
    val r = Map("a" -> 1.0)
    val (full, compact) = Bench.renderLines(r, Nil, "/tmp/sf",
      runs = 3, prepareSec = -1.0, calibrationSec = 0.12345)
    for (line <- Seq(full, compact)) {
      val parsed = JsonMethods.parse(line)
      val cal = (parsed \ "calibration_sec") match {
        case JDouble(d)  => d
        case JDecimal(d) => d.toDouble
        case other       => fail(s"calibration_sec not numeric: $other")
      }
      assert(math.abs(cal - 0.1235) < 1e-9, s"rounded 4-dp passthrough: $cal")
    }
    // default (absent) renders the -1 sentinel, never breaks the JSON
    val (f2, _) = Bench.renderLines(r, Nil, "/tmp/sf")
    assert((JsonMethods.parse(f2) \ "calibration_sec") === JInt(-1))
    // the spin itself: constant work => two back-to-back min-of-3
    // measurements on the same host agree within the noise the field
    // exists to expose (generous 25% gate — CI hosts wobble)
    val c1 = Bench.calibrate()
    val c2 = Bench.calibrate()
    assert(c1 > 0.01 && c1 < 10.0, s"implausible calibration time $c1")
    assert(math.abs(c1 - c2) / math.max(c1, c2) < 0.25,
      s"calibration unstable: $c1 vs $c2")
  }

  test("error list in the compact line is capped at 10 with a true total") {
    val errs = (1 to 25).map(i => s"q${i}_fail")
    val r = errs.map(_ -> -1.0).toMap + ("ok" -> 1.0)
    val (_, compact) = Bench.renderLines(r, errs, "/tmp/sf")
    val parsed = JsonMethods.parse(compact)
    val JArray(listed) = (parsed \ "errors"): @unchecked
    assert(listed.size == 10)
    val JInt(total) = (parsed \ "errors_total"): @unchecked
    assert(total == 25)
  }
}
