package graft

/** Whole-suite sweeps (determinism, plan hygiene) iterate every registered
  * query; before r8 one unanalyzable query threw out of the iteration and
  * aborted the ENTIRE sweep — r7's events.ts drift cost four suites that
  * way. This harness contains the blast radius: each query's check runs
  * under a catch, an exception becomes one named "UNRUNNABLE" row in the
  * sweep's failure list, and every other query still gets checked.
  */
object SweepHarness {

  /** Run `check` for each name; returns all failure messages. A thrown
    * NON-fatal exception is converted to a named failure instead of
    * propagating; fatal JVM errors (OOM, stack overflow) and interrupts
    * still abort — continuing a sweep on a broken JVM would bury the real
    * error under a cascade of misleading UNRUNNABLE rows. */
  def sweep(names: Seq[String])(check: String => Seq[String]): Seq[String] =
    names.flatMap { name =>
      try check(name)
      catch {
        case scala.util.control.NonFatal(e) =>
          val msg = Option(e.getMessage).getOrElse(e.getClass.getName)
            .linesIterator.take(2).mkString(" ").take(300)
          Seq(s"$name: UNRUNNABLE — $msg")
      }
    }
}

/** Proves the containment property the r7 verdict asked for: a deliberately
  * broken query costs exactly one named failure row; the rest of the sweep
  * still executes.
  */
class SweepHarnessSpec extends SparkSpec {
  test("one unrunnable query yields one named failure; others still checked") {
    val seen = scala.collection.mutable.ArrayBuffer[String]()
    val failures = SweepHarness.sweep(Seq("good_a", "broken", "good_b")) { name =>
      seen += name
      if (name == "broken")
        throw new org.apache.spark.sql.AnalysisException(
          errorClass = "INTERNAL_ERROR",
          messageParameters = Map("message" -> "deliberately unanalyzable"))
      Nil
    }
    assert(seen === Seq("good_a", "broken", "good_b"), "sweep aborted early")
    assert(failures.size === 1)
    assert(failures.head.startsWith("broken: UNRUNNABLE"))
  }

  test("ordinary check failures pass through unchanged") {
    val failures = SweepHarness.sweep(Seq("a", "b"))(n =>
      if (n == "b") Seq("b: wrong plan") else Nil)
    assert(failures === Seq("b: wrong plan"))
  }
}
