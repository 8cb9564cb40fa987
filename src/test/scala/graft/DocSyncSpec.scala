package graft

import org.scalatest.funsuite.AnyFunSuite

/** Keeps SURVEY.md §2 1:1 with the code (the r7 verdict's drift item):
  * every key registered in SparkEntry.queries must appear in the §2
  * operator inventory, and every key §2 mentions must exist in code.
  */
class DocSyncSpec extends AnyFunSuite {

  private lazy val survey: String = {
    val s = scala.io.Source.fromFile("SURVEY.md", "UTF-8")
    try s.mkString
    finally s.close()
  }

  /** §2 spans from its header to the next top-level section. */
  private lazy val section2: String = {
    val start = survey.indexOf("## §2 ")
    val end = survey.indexOf("\n## ", start + 1)
    survey.substring(start, if (end > 0) end else survey.length)
  }

  private lazy val mentioned: Set[String] =
    "`([a-z0-9_]+)`".r.findAllMatchIn(section2).map(_.group(1)).toSet

  test("every SparkEntry.queries key has a SURVEY §2 mention") {
    val missing = SparkEntry.queries.keySet.diff(mentioned)
    assert(missing.isEmpty, s"queries keys absent from SURVEY §2: ${missing.toSeq.sorted}")
  }

  test("every backticked q-key SURVEY §2 mentions exists in SparkEntry.queries") {
    // restrict to identifiers that look like queries keys (the §2 tables
    // also backtick code symbols like `Skew` helpers and conf names)
    val prefixes = Seq("q_", "q1", "q2", "q3", "q4", "q5", "q6", "q7", "q8", "q9",
      "lake_", "dedup_", "ann_", "emb_", "text_", "multimodal_", "sample_",
      "pack_", "pipeline_", "shard_", "export_", "decontaminate", "profile_table")
    val keyish = mentioned.filter(m => prefixes.exists(m.startsWith))
    val ghosts = keyish.diff(SparkEntry.queries.keySet)
    assert(ghosts.isEmpty, s"SURVEY §2 mentions keys with no queries entry: ${ghosts.toSeq.sorted}")
  }

  test("§2 status tags carry no builder-internal round numbers") {
    // the builder's internal round counter ran ahead of the driver's,
    // so `✅ rN` tags were ambiguous cross-round (r8 verdict item 10):
    // the status column is a bare ✅ — round provenance lives in git
    // history and BASELINE.md, which name DRIVER rounds explicitly
    val tagged = "✅ r\\d+".r.findAllIn(section2).toSeq
    assert(tagged.isEmpty, s"round-numbered status tags remain in §2: ${tagged.distinct}")
  }

  test("§2 table row ids are unique within each subsection") {
    // the r9 verdict found two §2.5 rows both numbered 33x — row ids
    // are the judge's line-by-line coverage handle, so collisions hide
    // rows. Each `### §2.x` table numbers independently, so uniqueness
    // is scoped per subsection.
    val idRe = "(?m)^\\| ([0-9]+[a-z0-9]*) \\|".r
    for (sub <- section2.split("(?m)^### ").drop(1)) {
      val name = sub.linesIterator.next()
      val ids = idRe.findAllMatchIn(sub).map(_.group(1)).toSeq
      val dupes = ids.groupBy(identity).collect { case (id, xs) if xs.length > 1 => id }
      assert(dupes.isEmpty, s"duplicate row ids in $name: ${dupes.toSeq.sorted}")
    }
  }
}
