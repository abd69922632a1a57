package graft

import org.scalatest.funsuite.AnyFunSuite

/** The artifact-buyback invariant (r18 VERDICT item 2) as a test, mirroring
  * the Verify-time assert: artifact-served registry rows must declare a
  * fresh-benched twin that is itself registered and never artifact-served,
  * and oracle-replay-only rows must keep their replay-from-raw oracle.
  * `ArtifactTwins.check` is the single shared implementation — this spec
  * exists so `sbt test` catches a violation before a Verify run does. */
class ArtifactTwinSpec extends AnyFunSuite {

  private val registered = SparkEntry.allQueries.map(_.name).toSet
  private val oracled = SparkEntry.allQueries
    .filter(q => q.oracle.isDefined || q.oracleFor.isDefined)
    .map(_.name).toSet

  test("the full invariant holds over the live registry") {
    ArtifactTwins.check(registered, oracled)
  }

  test("declared artifact-served rows are registered") {
    assert(ArtifactTwins.allServed.subsetOf(registered))
  }

  test("every fresh twin is registered and not itself artifact-served") {
    val twins = ArtifactTwins.twins.values.toSet
    assert(twins.subsetOf(registered))
    assert(twins.intersect(ArtifactTwins.allServed).isEmpty)
  }

  test("check fails loud on a twin missing from the registry") {
    val e = intercept[IllegalArgumentException] {
      ArtifactTwins.check(registered - "dedup_containment", oracled)
    }
    assert(e.getMessage.contains("dedup_containment"))
  }

  test("check fails loud on an oracle-replay-only row losing its oracle") {
    val e = intercept[IllegalArgumentException] {
      ArtifactTwins.check(registered, oracled - "text_langid_trigram")
    }
    assert(e.getMessage.contains("text_langid_trigram"))
  }
}
