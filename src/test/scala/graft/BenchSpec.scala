package graft

import org.scalatest.funsuite.AnyFunSuite

/** The fork-refinement pass trusts [[Bench.parseArtifactEntry]] to read a
  * child JVM's artifact back; a silent mis-parse would replace a real
  * measurement with a wrong one, so the extraction is pinned here.
  */
class BenchSpec extends AnyFunSuite {

  private val artifact =
    """{"metric":"total","value":12.5,"unit":"sec","queries":{""" +
      """"q1_agg":1.228,"dedup_embedding":10.005,"recall_embedding_lsh":24.050},""" +
      """"sf":"/tmp/graft_sf1"}"""

  test("extracts the named query's seconds from the queries map") {
    assert(Bench.parseArtifactEntry(artifact, "dedup_embedding").contains(10.005))
    assert(Bench.parseArtifactEntry(artifact, "q1_agg").contains(1.228))
  }

  test("a query name that is a prefix of another never matches the longer entry") {
    // "recall_embedding_lsh" contains no standalone "embedding" key: the
    // quoted-name regex must anchor on the full quoted key.
    assert(Bench.parseArtifactEntry(artifact, "embedding").isEmpty)
    assert(Bench.parseArtifactEntry(artifact, "recall_embedding_lsh").contains(24.050))
  }

  test("missing query and per-line query records yield None") {
    assert(Bench.parseArtifactEntry(artifact, "nope").isEmpty)
    // A per-query progress line quotes the name as a VALUE — no bare
    // `"name":number` pair, so nothing to (mis)read.
    val progress = """{"query":"corpus_clean","sec":2.698,"reps":[2.6,2.7,2.8]}"""
    assert(Bench.parseArtifactEntry(progress, "corpus_clean").isEmpty)
  }
}
