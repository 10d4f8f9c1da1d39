package graft

/** t28/t29's core encoding trick: BPE merge application as a plain
  * string replace over per-symbol-wrapped text. The two hazards that
  * break naive separator encodings — shared-boundary consumption on
  * same-symbol chains and mid-symbol substring matches — are exactly
  * what the '<sym>' wrapping rules out; both engines' replace is a
  * left-to-right non-overlapping scan, so the identity below is the
  * whole cross-engine determinism argument.
  */
class BpeSpec extends SparkSpec {

  private def rep(s: String, find: String, to: String): String =
    spark.sql(
      s"SELECT replace('$s', '$find', '$to') AS r").head().getString(0)

  test("wrapped-symbol replace merges same-symbol chains like greedy BPE") {
    // [a,a,a,a] merging (a,a) → [aa,aa]: each symbol carries its own
    // delimiters, so consecutive matches never share a boundary char
    assert(rep("<a><a><a><a>", "<a><a>", "<aa>") == "<aa><aa>")
    // odd chain: [a,a,a] → [aa,a]
    assert(rep("<a><a><a>", "<a><a>", "<aa>") == "<aa><a>")
    // and the merged symbol can chain in the NEXT round
    assert(rep("<aa><aa>", "<aa><aa>", "<aaaa>") == "<aaaa>")
  }

  test("wrapped-symbol replace can never match mid-symbol") {
    // pair (b, c) must not fire inside symbol "ab" or across "bc"
    assert(rep("<ab><c>", "<b><c>", "<bc>") == "<ab><c>")
    assert(rep("<a><bc>", "<a><b>", "<ab>") == "<a><bc>")
    // multi-char symbols merge only on exact full-symbol adjacency
    assert(rep("<ab><cd><ab>", "<ab><cd>", "<abcd>") == "<abcd><ab>")
  }

  test("java and spark replace agree on the scan order (the oracle contract)") {
    val cases = Seq(
      ("<a><a><a><a><a>", "<a><a>", "<aa>"),
      ("<x><y><x><y>", "<x><y>", "<xy>"),
      ("<q>", "<q><q>", "<qq>"))
    for ((s, f, t) <- cases)
      assert(rep(s, f, t) == s.replace(f, t),
        s"replace('$s','$f','$t') diverges between engines")
  }
}
