package graft.mr

import org.scalatest.funsuite.AnyFunSuite

/** Pins the reference tokenizer quirks (FileWordCounter.cpp:149-177,
  * fixture list in FIXTURES.md §1). */
class TokenizerSpec extends AnyFunSuite {
  import FileWordCounter.tokenizeQuirk

  test("plain split")            { assert(tokenizeQuirk("a b") == Vector("a", "b")) }
  test("consecutive spaces emit empty token") {
    assert(tokenizeQuirk("a  b") == Vector("a", "", "b"))
  }
  test("leading space emits empty token")  { assert(tokenizeQuirk(" a") == Vector("", "a")) }
  test("trailing space emits empty token") { assert(tokenizeQuirk("a ") == Vector("a", "")) }
  test("newline is NOT a delimiter") { assert(tokenizeQuirk("a\nb") == Vector("a\nb")) }
  test("tab is NOT a delimiter")     { assert(tokenizeQuirk("a\tb") == Vector("a\tb")) }
  test("empty input yields one empty token") { assert(tokenizeQuirk("") == Vector("")) }
  test("only spaces") { assert(tokenizeQuirk("  ") == Vector("", "", "")) }

  test("agrees with Spark split(text, ' ', -1) semantics used by tokenize_quirk query") {
    // Spark's split keeps empties with limit -1 — same token stream.
    for (s <- Seq("a b", "a  b", " a", "a ", "", "  ", "a\nb"))
      assert(tokenizeQuirk(s) == s.split(" ", -1).toVector, s"input=<$s>")
  }
}
