package graft

import org.scalatest.funsuite.AnyFunSuite

/** QUERIES.md is the judge-facing index of the gate; this pins it to
  * the code so a key added without its doc row (or a doc row whose key
  * was renamed away) fails the build instead of silently drifting. */
class DocsConsistencySpec extends AnyFunSuite {

  private lazy val doc =
    new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("QUERIES.md")), java.nio.charset.StandardCharsets.UTF_8)

  test("every gated key has a QUERIES.md row, and every row names a real key") {
    val documented = "(?m)^\\| `(q[a-z0-9_]+)`".r
      .findAllMatchIn(doc).map(_.group(1)).toSet
    val gated = SparkEntry.queries.keySet
    val undocumented = gated -- documented
    val stale = documented -- gated
    assert(undocumented.isEmpty, s"keys missing a QUERIES.md row: $undocumented")
    assert(stale.isEmpty, s"QUERIES.md rows naming no gated key: $stale")
  }

  test("the headline count matches the gate") {
    val n = SparkEntry.queries.size
    assert(doc.contains(s"the $n oracle-checked operator queries"),
      s"QUERIES.md headline count is stale — the gate has $n keys")
    assert(doc.contains(s"All $n also verified locally"),
      s"QUERIES.md matrix sentence count is stale — the gate has $n keys")
  }
}
