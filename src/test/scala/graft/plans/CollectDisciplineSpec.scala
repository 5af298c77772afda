package graft.plans

import org.scalatest.funsuite.AnyFunSuite

/**
 * Mechanized bounded-collect discipline (VERDICT r14 #7): every
 * driver-side `.collect()` in a QUERY path must go through
 * [[graft.util.Bounded.boundedCollect]], which asserts a declared row
 * bound — the audit that each pull is model/centroid/codebook/
 * deletion-list-sized was prose until now. This sweep greps the main
 * source tree and fails naming the site when a raw collect appears
 * outside the helper or the harness allowlist, so an unbounded collect
 * cannot ship unreviewed.
 *
 * Allowlist rationale: `Bounded.scala` IS the helper; `Bench.scala`'s
 * one collect is the codegen warm-up on a literal range; `tools/` are
 * dev probes, not query paths; `stream/StreamBench.scala` collects the
 * view-grain MV fold for its batch≡stream equality gate (bench harness,
 * |day×type| rows by construction).
 */
class CollectDisciplineSpec extends AnyFunSuite {

  private val Root = java.nio.file.Paths.get("src/main/scala/graft")

  private val Allowed: Set[String] = Set(
    "src/main/scala/graft/util/Bounded.scala",
    "src/main/scala/graft/Bench.scala",
    "src/main/scala/graft/stream/StreamBench.scala")

  test("no raw .collect() in src/main query paths outside Bounded.boundedCollect") {
    import scala.jdk.CollectionConverters._
    // toLocalIterator is the same unbounded driver pull with a streaming
    // façade — swept alongside collect; .head()/.first() are left alone
    // (textually indistinguishable from Scala-collection heads, and a
    // 1-row pull can't be unbounded)
    val raw = "\\.(collect(AsList)?|toLocalIterator)\\(\\)".r
    val files = java.nio.file.Files.walk(Root).iterator().asScala
      .filter(p => p.toString.endsWith(".scala"))
      .filterNot(p => p.toString.startsWith("src/main/scala/graft/tools/"))
      .filterNot(p => Allowed(p.toString))
      .toSeq
    assert(files.nonEmpty, s"sweep found no sources under $Root — run from the repo root")
    val offenders = files.flatMap { p =>
      val lines = new String(java.nio.file.Files.readAllBytes(p), "UTF-8")
        .linesIterator.zipWithIndex.toSeq
      lines.collect {
        case (line, i) if raw.findFirstIn(line).isDefined =>
          s"$p:${i + 1}: ${line.trim}"
      }
    }
    assert(offenders.isEmpty,
      "raw driver-side collect in a query path — route it through " +
        "graft.util.Bounded.boundedCollect with a declared bound, or " +
        "restructure so the frame stays distributed:\n" +
        offenders.mkString("\n"))
  }
}
