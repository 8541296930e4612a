package graft

import org.scalatest.funsuite.AnyFunSuite

/** Round-16 hardening specs: the star-shaped exact tier of
  * [[graft.operators.Dedup.phashNearDups]] (VERDICT r15 item 1 — a hot
  * hash must emit g−1 edges, not C(g,2)), plus the r15 ADVICE items
  * (SJIS kanji-with-ASCII-trail recall, Arrow shard commit hygiene,
  * `post`-table boundary). */
class Round16Spec extends AnyFunSuite {

  // ------------------------------------------- phash star-edge scaling

  test("phashNearDups hot hash: a 10k-member identical-hash group emits " +
       "g-1 star edges (never the C(g,2) clique)") {
    val spark = TestSpark.spark
    import spark.implicits._
    val hot = 0x5A5A5A5A5A5A5A5AL
    // 10_000 docs share one hash (ids 100..10_099, min = 100) plus two
    // far-away singletons that must not join anything
    val df = ((100L until 10100L).map(_ -> hot) ++
      Seq(1L -> 0x0123456789ABCDEFL, 2L -> ~0x0123456789ABCDEFL))
      .toDF("doc_id", "phash")
    val out = graft.operators.Dedup.phashNearDups(df).collect()
    assert(out.length == 9999, s"expected g-1 = 9999 edges, got ${out.length}")
    assert(out.forall(r => r.getLong(0) == 100L && r.getLong(2) == 0L),
      "every exact edge must anchor at the group-min representative")
    assert(out.map(_.getLong(1)).toSet == (101L until 10100L).toSet)
  }

  test("phashNearDups near tier emits ONE representative edge per " +
       "qualifying hash pair, not the gA*gB id expansion") {
    val spark = TestSpark.spark
    import spark.implicits._
    val a = 0x00FF00FF00FF00FFL
    val b = a ^ (1L << 17) // hamming 1 from a
    // group A = {10, 11, 12}, group B = {20, 21}: all-pairs would list
    // 6 cross edges; representatives are 10 and 20
    val df = Seq(10L -> a, 11L -> a, 12L -> a, 20L -> b, 21L -> b)
      .toDF("doc_id", "phash")
    val out = graft.operators.Dedup.phashNearDups(df)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(out == Set((10L, 11L, 0L), (10L, 12L, 0L), (20L, 21L, 0L),
      (10L, 20L, 1L)))
    // downstream transitive grouping still collapses A ∪ B into one
    val groups = graft.operators.Dedup.connectedComponents(
      graft.operators.Dedup.phashNearDups(df)
        .select($"key_a", $"key_b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(Seq(10L, 11L, 12L, 20L, 21L).map(groups).distinct.size == 1)
  }

  // --------------------------------------- SJIS recall (r16 ADVICE)

  test("kanji-heavy Shift_JIS dominated by 0x91-0x97 leads with ASCII " +
       "trails still detects as SJIS (recall, not just precision)") {
    val sjis = java.nio.charset.Charset.forName("Shift_JIS")
    // harvest real characters by their encoded shape: 'band' = lead in
    // 0x91..0x97 with an ASCII-range trail (the windows-125x-lookalike
    // pair the precision gate discounts), 'strong' = any other two-byte
    // SJIS pair with lead in 0x81..0x9F
    def shape(cp: Int): Option[(Char, Boolean)] = {
      val ch = cp.toChar
      val b = ch.toString.getBytes(sjis)
      if (b.length != 2) return None
      val lead = b(0) & 0xff; val trail = b(1) & 0xff
      if (lead < 0x81 || lead > 0x9F) return None
      if (trail < 0x40 || trail > 0xFC || trail == 0x7F) return None
      // charset must round-trip (reject substitution chars)
      if (new String(b, sjis) != ch.toString) return None
      Some((ch, lead >= 0x91 && lead <= 0x97 && trail < 0x80))
    }
    val harvested = (0x4E00 to 0x9FFF).iterator.flatMap(shape).toSeq
    val band = harvested.filter(_._2).map(_._1).take(10)
    val strong = harvested.filterNot(_._2).map(_._1).take(6)
    assert(band.size == 10 && strong.size == 6, "fixture harvest")
    // 10 band pairs vs 6 strong pairs: the old strong >= punct gate
    // flipped this legal SJIS page to windows-1252
    val text = (band ++ strong).mkString("")
    val bytes = s"<html><body>$text</body></html>".getBytes(sjis)
    assert(!graft.functions.Dom.isValidUtf8(bytes))
    assert(graft.functions.Dom.detectEncoding(bytes).name == "Shift_JIS")
    assert(graft.functions.Dom.decodeHtml(bytes).contains(band.head))
  }
}
