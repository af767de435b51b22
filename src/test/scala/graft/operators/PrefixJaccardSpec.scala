package graft.operators

import graft.SparkSpec

/** Pins for the prefix-filtering similarity join behind
  * dedup_prefix_jaccard: the threshold boundary is inclusive, the
  * prefix-length arithmetic admits no false negatives at the exact
  * pigeonhole edge, and the whole algorithm agrees with the brute-force
  * shingle join on the real fixture (the oracle proves this at three
  * SFs; here it's pinned in-process so a refactor can't silently lean
  * on a stale verify artifact). */
class PrefixJaccardSpec extends SparkSpec {

  private def pairs(texts: (Long, String)*): Map[(Long, Long), Double] = {
    import spark.implicits._
    DedupQueries.prefixJaccardPairsOf(spark, texts.toDF("doc_id", "text"))
      .collect()
      .map(r => (r.getAs[Long]("da"), r.getAs[Long]("db")) -> r.getAs[Double]("jac"))
      .toMap
  }

  test("a pair at exactly jaccard 0.5 survives (inclusive threshold, boundary prefix)") {
    // A: trigrams {a b c, b c d, c d e}; B: {x a b, a b c, b c d} —
    // i = 2, union 4, jac = 0.5. n = 3 -> prefix = 3 - 2 + 1 = 2: the
    // pair must collide on some rarest-2 prefix shingle.
    val p = pairs(1L -> "a b c d e", 2L -> "x a b c d")
    assert(p.keySet == Set((1L, 2L)))
    assert(p((1L, 2L)) == 0.5)
  }

  test("a pair just under the threshold is excluded") {
    // A: {a b c, b c d, c d e, d e f}; B shares only {a b c, b c d}:
    // i = 2, union 6, jac = 1/3 < 0.5.
    val p = pairs(1L -> "a b c d e f", 2L -> "y x a b c d")
    assert(p.isEmpty)
  }

  test("identical docs pair at jaccard 1.0; disjoint docs never pair") {
    val p = pairs(1L -> "p q r s", 2L -> "p q r s", 3L -> "u v w x")
    assert(p == Map((1L, 2L) -> 1.0))
  }

  test("length-filter boundary: 2·min = max (jac exactly 0.5 via containment) survives") {
    // A: {abc, bcd} (n=2) ⊂ B: {xza, zab, abc, bcd} (n=4): i = 2,
    // jac = 2/4 = 0.5 — the exact edge of the PPJoin length filter
    // (2·na ≥ nb with equality). Pruning it would be a false negative.
    val p = pairs(1L -> "a b c d", 2L -> "x z a b c d")
    assert(p == Map((1L, 2L) -> 0.5))
  }

  test("positional filter admits no false negatives on a crafted mini-corpus (brute cross-check)") {
    // Deterministic corpus with heavy shared prefixes, containments and
    // length skews; the brute pair set is computed in-process with an
    // independent Set-based fold — any PPJoin filter that over-prunes
    // diverges here.
    val docs: Seq[(Long, String)] = (0L until 40L).map { i =>
      val words = (0 until (3 + (i % 7)).toInt).map(k => s"w${(i * 5 + k * (1 + i % 3)) % 23}")
      i -> words.mkString(" ")
    }
    def shingles(t: String): Set[String] = {
      val w = t.split(" ", -1)
      (0 to w.length - 3).map(k => s"${w(k)} ${w(k + 1)} ${w(k + 2)}").toSet
    }
    val brute = (for {
      (ia, ta) <- docs; (ib, tb) <- docs if ia < ib
      sa = shingles(ta); sb = shingles(tb) if sa.nonEmpty && sb.nonEmpty
      i = (sa & sb).size
      jac = i.toDouble / (sa.size + sb.size - i) if jac >= 0.5
    } yield (ia, ib) -> jac).toMap
    assert(pairs(docs: _*) == brute)
    assert(brute.nonEmpty, "vacuous fixture: no qualifying pairs")
  }

  test("agrees with the brute-force shingle join on the sf0.001 fixture") {
    val brute = graft.SparkEntry.queries("dedup_ngram_jaccard")(spark, sf("sf0.001"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val pref = graft.SparkEntry.queries("dedup_prefix_jaccard")(spark, sf("sf0.001"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(pref == brute)
    assert(brute.nonEmpty) // the fixture has real near-dups; an empty match is vacuous
  }
}
