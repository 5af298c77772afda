package graft.plans

import org.apache.spark.sql.DataFrame

import graft.SparkSpec

/**
 * Plan-fingerprint regression harness (VERDICT r12 #5). The two
 * discipline sweeps catch the two KNOWN anti-pattern classes
 * (partition-less windows, cartesian products); nothing caught an
 * unintended plan change that is neither — a lost broadcast hint
 * silently turning into a sort-merge join, a new Exchange from a
 * refactor. This spec digests every registered query's PRE-AQE physical
 * plan into a multiset of operator class names (join strategies and
 * Exchange/Window/Scan operators included by construction) and compares
 * against the committed canonical file `PLAN_DIGESTS.json`.
 *
 * On an INTENDED plan change, regenerate and commit the file — the diff
 * IS the review artifact (exactly which queries' shapes moved):
 *
 *   GRAFT_REGEN_DIGESTS=1 sbt 'testOnly graft.plans.PlanDigestSpec'
 *
 * Digests are computed at the spec fixture scale (sf0.001, the SparkSpec
 * session config), so they pin shape under the committed test
 * conditions — auto-broadcast decisions at other scales are AQE's and
 * the planner's job, not this file's.
 */
class PlanDigestSpec extends SparkSpec {

  private val CanonicalPath = java.nio.file.Paths.get("PLAN_DIGESTS.json")

  /** Operator-multiset fingerprint: sorted `Class=count` pairs over the
    * pre-AQE physical plan (subqueries included via innerChildren —
    * a broadcast hint lost inside a scalar subquery still shifts it). */
  private def digest(df: DataFrame): String = {
    import org.apache.spark.sql.execution.SparkPlan
    def nodes(p: SparkPlan): Seq[SparkPlan] =
      p.collect { case n => n }.flatMap(n => n +: n.subqueries.flatMap(nodes))
    nodes(df.queryExecution.sparkPlan)
      .map(_.getClass.getSimpleName)
      .groupBy(identity).toSeq.sortBy(_._1)
      .map { case (c, n) => s"$c=${n.size}" }.mkString(",")
  }

  test("every registered query's physical plan shape matches PLAN_DIGESTS.json") {
    // the snapshot-builder frames are fingerprinted alongside the
    // queries (VERDICT r13 #2): a lost broadcast hint inside an artifact
    // build now shifts a committed digest exactly like one inside a
    // query. select("*") re-plans the captured frame under the spec conf;
    // the `snapshot:` prefix keeps builder entries from colliding with
    // query names.
    val current = ((graft.SparkEntry.queries ++ graft.SparkEntry.specOnly)
      .toSeq.map { case (name, fn) => name -> (() => fn(spark, sf)) } ++
      BuilderPlans.all(spark, sf).toSeq
        .map { case (tag, df) => s"snapshot:$tag" -> (() => df.select("*")) })
      .sortBy(_._1)
      .map { case (name, mk) => name -> digest(mk()) }
    val currentMap = current.toMap
    if (sys.env.get("GRAFT_REGEN_DIGESTS").contains("1")) {
      val body = current
        .map { case (n, d) => s"""  "$n": "$d"""" }
        .mkString("{\n", ",\n", "\n}\n")
      java.nio.file.Files.write(CanonicalPath, body.getBytes("UTF-8"))
      info(s"regenerated ${CanonicalPath.toAbsolutePath} (${current.size} queries)")
    } else {
      assert(java.nio.file.Files.exists(CanonicalPath),
        s"missing ${CanonicalPath.toAbsolutePath} — regenerate with " +
          "GRAFT_REGEN_DIGESTS=1 sbt 'testOnly graft.plans.PlanDigestSpec'")
      val canonical = {
        val txt = new String(java.nio.file.Files.readAllBytes(CanonicalPath), "UTF-8")
        // the file is the flat {"name": "digest", ...} this spec writes —
        // parse with a line regex instead of pulling in a JSON library
        val Entry = """^\s*"([^"]+)":\s*"([^"]*)",?\s*$""".r
        txt.linesIterator.collect { case Entry(k, v) => k -> v }.toMap
      }
      val missing = currentMap.keySet -- canonical.keySet
      val stale = canonical.keySet -- currentMap.keySet
      val changed = currentMap.keysIterator
        .filter(k => canonical.get(k).exists(_ != currentMap(k))).toSeq.sorted
      val problems = Seq(
        if (missing.nonEmpty) Seq(s"not in canonical file: ${missing.toSeq.sorted.mkString(", ")}") else Nil,
        if (stale.nonEmpty) Seq(s"stale canonical entries: ${stale.toSeq.sorted.mkString(", ")}") else Nil,
        changed.map(k =>
          s"$k plan shape changed:\n  canonical: ${canonical(k)}\n  current:   ${currentMap(k)}")
      ).flatten
      assert(problems.isEmpty,
        problems.mkString("\n") +
          "\nIf the change is intended, regenerate: GRAFT_REGEN_DIGESTS=1 " +
          "sbt 'testOnly graft.plans.PlanDigestSpec' and commit the diff")
    }
  }
}
