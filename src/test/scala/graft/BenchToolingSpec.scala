package graft

/** Unit gates for the bench measurement tooling — the round-14
  * final-stamp machinery decides what a round SHIPS, so its parsing and
  * rewrite logic get the same spec treatment as an operator. */
class BenchToolingSpec extends GraftSpec {

  test("ledgerMedians: same-sf filter, last-10 window, err rows skipped, malformed lines skipped") {
    val p = java.nio.file.Files.createTempFile("bench_hist", ".jsonl")
    try {
      def entry(sf: String, q13: Double, d02: Double): String =
        s"""{"metric":"total","value":1.0,"queries":{"q13":$q13,"d02":$d02,"x09":"err"},"sf":"$sf"}"""
      val lines =
        Seq("not json at all", """{"metric":"total","sf":"/x/sf0.1"}""") ++
        Seq(entry("/x/sf0.01", 99.0, 99.0)) ++ // other sf — excluded
        (1 to 12).map(i => entry("/x/sf0.1", i.toDouble, 10.0 * i))
      java.nio.file.Files.write(p, lines.mkString("\n").getBytes("UTF-8"))
      val m = BenchDelta.ledgerMedians("/x/sf0.1", p)
      // last-10 window over values 3..12 -> median (7+8)/2 = 7.5; the
      // other-sf 99.0 and the malformed lines must not contribute
      assert(m("q13") == 7.5, s"q13 median: ${m.get("q13")}")
      assert(m("d02") == 75.0, s"d02 median: ${m.get("d02")}")
      assert(!m.contains("x09"), "err-valued rows must have no median")
      assert(BenchDelta.ledgerMedians("/y/sf0.1", p).isEmpty,
        "an sf with no history must yield no medians")
    } finally java.nio.file.Files.deleteIfExists(p)
  }

  test("ledgerMedians tolerates a missing ledger (first run)") {
    val gone = java.nio.file.Paths.get("/tmp/definitely_not_a_ledger.jsonl")
    assert(BenchDelta.ledgerMedians("/x/sf0.1", gone).isEmpty)
  }

  test("ledgerFieldMedian: top-level derived fields (x03marginal) get the same history gate as rows") {
    val p = java.nio.file.Files.createTempFile("bench_hist_f", ".jsonl")
    try {
      def entry(sf: String, m: Double): String =
        s"""{"metric":"total","value":1.0,"x03marginal":$m,"queries":{},"sf":"$sf"}"""
      val lines =
        Seq("garbage", """{"metric":"total","sf":"/x/sf0.1","queries":{}}""") ++
        Seq(entry("/x/sf0.01", 99.0)) ++
        (1 to 12).map(i => entry("/x/sf0.1", i.toDouble))
      java.nio.file.Files.write(p, lines.mkString("\n").getBytes("UTF-8"))
      // same-sf last-10 window (field-less same-sf artifacts count
      // toward the window): keeps entries 3..12 -> median (7+8)/2 = 7.5
      val m = BenchDelta.ledgerFieldMedian("/x/sf0.1", "x03marginal", p)
      assert(m.contains(7.5), s"x03marginal median: $m")
      assert(BenchDelta.ledgerFieldMedian("/x/sf0.1", "nope", p).isEmpty)
      assert(BenchDelta.ledgerFieldMedian("/y/sf0.1", "x03marginal", p).isEmpty)
      val gone = java.nio.file.Paths.get("/tmp/definitely_not_a_ledger.jsonl")
      assert(BenchDelta.ledgerFieldMedian("/x/sf0.1", "x03marginal", gone).isEmpty)
    } finally java.nio.file.Files.deleteIfExists(p)
  }

  test("BenchReport rewrites exactly the marked block, appends when markers absent, skips non-sf0.1") {
    val dir = java.nio.file.Files.createTempDirectory("bench_report")
    try {
      val rep = dir.resolve("REPORT_r99.md")
      val decoy = dir.resolve("REPORT_r9.md") // lower round — must not win
      java.nio.file.Files.write(decoy, "# decoy\n".getBytes("UTF-8"))
      val before =
        """# Title
          |
          |prose above
          |
          |<!-- bench:auto -->
          |stale content that must vanish
          |<!-- /bench:auto -->
          |
          |prose below
          |""".stripMargin
      java.nio.file.Files.write(rep, before.getBytes("UTF-8"))
      def line(sf: String) =
        s"""{"metric":"total","value":12.345,"unit":"sec","cpus":32,""" +
        s""""loadavg":1.0,"loadavg0":0.5,"final":true,""" +
        s""""divergent":["q07"],"unstable":["d99"],""" +
        s""""warmhits":7,"coldmode":"dropcaches",""" +
        s""""queries":{"q01":1.5,"d02":5.0,"gpxcold":0.2,"gpxwarm":0.1},""" +
        s""""sf":"$sf"}"""
      // a non-sf0.1 artifact (local iteration run) must not touch it
      BenchReport.update(line("/tmp/x/sf0.001"), Some(dir))
      assert(new String(java.nio.file.Files.readAllBytes(rep), "UTF-8") == before)
      BenchReport.update(line("/tmp/x/sf0.1"), Some(dir))
      val after = new String(java.nio.file.Files.readAllBytes(rep), "UTF-8")
      assert(after.contains("prose above") && after.contains("prose below"),
        "prose outside the markers must survive")
      assert(!after.contains("stale content"), "stale block must be replaced")
      assert(after.contains("total **12.345 s**") &&
        after.contains("final stamp: **true**") &&
        after.contains("unstable after all rechecks: d99") &&
        after.contains("q07") &&
        after.contains("cold 0.200 s / warm 0.100 s"), after)
      assert(new String(java.nio.file.Files.readAllBytes(decoy), "UTF-8")
        == "# decoy\n", "a lower-numbered report must not be rewritten")
      // markers absent -> section appended, nothing else lost
      val bare = dir.resolve("REPORT_r100.md")
      java.nio.file.Files.write(bare, "# bare\n".getBytes("UTF-8"))
      BenchReport.update(line("/tmp/x/sf0.1"), Some(dir))
      val bareAfter = new String(java.nio.file.Files.readAllBytes(bare), "UTF-8")
      assert(bareAfter.startsWith("# bare\n") &&
        bareAfter.contains("## Bench (auto-generated)") &&
        bareAfter.contains("<!-- bench:auto -->"), bareAfter)
    } finally org.apache.commons.io.FileUtils.deleteDirectory(dir.toFile)
  }
}
