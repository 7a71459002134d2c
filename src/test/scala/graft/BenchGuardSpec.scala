package graft

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._
import org.scalatest.funsuite.AnyFunSuite

/** Liveness guard for the bench regression guard itself.
  *
  * Round-11 post-mortem: `Bench.baseline()` read `BENCH_BASELINE.json`
  * with the forked JVM's default charset (ASCII in this sandbox); a
  * non-ASCII pin-protocol note made the read throw, a catch-all swallowed
  * it, and the guard reported `"regressions":{}` for half a round while
  * rows ran >2x their pins. These specs make that failure mode
  * structurally impossible to repeat silently:
  *
  *  1. the REAL baseline file must parse in THIS forked JVM (same fork
  *     settings as the bench run) and yield a full pin set;
  *  2. an unreadable baseline must surface as a Left (which Bench turns
  *     into a loud stderr note + an "unreadable" status in the JSON line),
  *     never as an empty-but-clean-looking guard;
  *  3. no default-charset text I/O may creep into src/main — the one
  *     `Source.fromFile` must carry an explicit codec, and the
  *     default-charset java.io constructors stay banned.
  */
class BenchGuardSpec extends AnyFunSuite {

  test("real BENCH_BASELINE.json parses in the forked test JVM with a full pin set") {
    val parsed = Bench.baseline()
    assert(parsed.isRight, s"baseline unreadable: $parsed")
    val (sf, pins) = parsed.toOption.get
    assert(sf == "/root/testdata/sf0.1")
    // 18 r5-era rows + 6 r11-tier rows = 24; a shrink means the parser
    // regressed or the file was truncated — either way the guard is blind
    assert(pins.size >= 24, s"expected >=24 pins, got ${pins.size}: ${pins.keys.toSeq.sorted}")
    assert(pins.values.forall(v => v > 0 && v < 600), "pins must be sane positive seconds")
  }

  test("baseline parse failure is a loud Left, not an empty success") {
    assert(Bench.baseline("/nonexistent/BENCH_BASELINE.json").isLeft)
    val bad = Files.createTempFile("graft_bad_baseline", ".json")
    try {
      Files.writeString(bad, """{"note":"no sf, no queries"}""")
      assert(Bench.baseline(bad.toString).isLeft)
      // non-ASCII content + a valid structure must STILL parse (the r11 bug)
      Files.writeString(bad,
        """{"sf":"/root/testdata/sf0.1","note":"§ pins — protocol","queries":{"q1_agg":0.5}}""")
      assert(Bench.baseline(bad.toString) ==
        Right(("/root/testdata/sf0.1", Map("q1_agg" -> 0.5))))
    } finally Files.deleteIfExists(bad)
  }

  test("record_quality: a contended run is stamped, an idle one is not") {
    // r14 verdict item 4: BENCH_r14's raw 43.9 s total (2.26x the truth)
    // carried honest per-row rechecks but no top-level taint marker.
    // Contended case shaped like the actual r14 record: seven flagged
    // rows, most refuted >2x by their in-run recheck, loadavg_start 5.34
    // on 32 cpus (bar = 32/8 = 4).
    val r14Flagged = Seq(
      1.89 -> 0.85, 3.34 -> 1.26, 3.82 -> 2.32, 11.45 -> 1.32,
      3.59 -> 0.49, 2.39 -> 1.04, 2.43 -> 2.18)
    assert(Bench.recordQuality(r14Flagged, loadavgStart = 5.34, cpus = 32)
      === "contended")
    // busy host alone with few flags: not contended (could be one real
    // regression under load — per-row adjudication handles it)
    assert(Bench.recordQuality(r14Flagged.take(2), 5.34, 32) === "ok")
    // idle host, flags confirmed by recheck (raw ≈ recheck): real
    // regressions, NOT contention — the marker must not launder them
    val confirmed = Seq(3.0 -> 2.9, 4.0 -> 3.8, 5.0 -> 4.9)
    assert(Bench.recordQuality(confirmed, loadavgStart = 1.0, cpus = 32)
      === "ok")
    // idle at start but rechecks broadly refute the raws (load arrived
    // mid-run): contended via the refutation arm
    val refuted = Seq(3.0 -> 1.0, 4.0 -> 1.5, 5.0 -> 2.0)
    assert(Bench.recordQuality(refuted, loadavgStart = 1.0, cpus = 32)
      === "contended")
    // clean run: nothing flagged
    assert(Bench.recordQuality(Nil, 0.5, 32) === "ok")
  }

  test("src/main has no default-charset text I/O") {
    val root = Paths.get("src/main/scala")
    val scalaFiles: Seq[Path] = Files.walk(root).iterator().asScala
      .filter(p => p.toString.endsWith(".scala")).toSeq
    assert(scalaFiles.nonEmpty)
    // patterns that read/write text with the platform default charset
    // Codec may arrive in the curried second list: fromFile(p)(Codec.UTF8)
    val fromFileNoCodec = """Source\.fromFile\((?!.*Codec)""".r
    val banned = Seq(
      "new java.io.FileReader(", "new FileReader(",
      "new java.io.FileWriter(", "new FileWriter(",
    )
    val offenders = scalaFiles.flatMap { p =>
      val lines = Files.readAllLines(p, UTF_8).asScala.zipWithIndex
      lines.collect {
        case (l, i) if fromFileNoCodec.findFirstIn(l).isDefined =>
          s"$p:${i + 1}: Source.fromFile without explicit Codec"
        case (l, i) if banned.exists(l.contains) =>
          s"$p:${i + 1}: default-charset java.io reader/writer"
        // single-arg PrintWriter(File) uses the default charset; the
        // two-arg (file, "UTF-8") form is fine
        case (l, i) if """new\s+(java\.io\.)?PrintWriter\(\s*$""".r.findFirstIn(l).isEmpty &&
            """new\s+(java\.io\.)?PrintWriter\([^,)]*\)""".r.findFirstIn(l).isDefined &&
            !l.contains("System.") =>
          s"$p:${i + 1}: single-arg PrintWriter (default charset)"
      }
    }
    assert(offenders.isEmpty, offenders.mkString("\n"))
  }
}
