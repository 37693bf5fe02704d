package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DupSpansProfileSpec extends SparkSpec {
  import spark.implicits._

  // k=3 keeps the hand-checked arithmetic small; the query uses k=8.
  private def spans(df: org.apache.spark.sql.DataFrame) =
    TextOps.dupSpans(df, k = 3).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_spans"), r.getAs[Long]("dup_words"), r.getAs[Double]("dup_frac"))))
      .toMap

  test("dupSpans: cross-doc shared 3-gram anchors one span per side") {
    val docs = Seq(
      (1L, "a b c d e f"),        // "a b c" at pos 1
      (2L, "x1 x2 a b c y1 z1 w1") // "a b c" at pos 3
    ).toDF("doc_id", "text")
    val got = spans(docs)
    assert(got(1L) === ((1L, 3L, 3.0 / 6.0)))
    assert(got(2L) === ((1L, 3L, 3.0 / 8.0)))
  }

  test("dupSpans: identical docs chain every anchor into one whole-doc span") {
    val docs = Seq(
      (1L, "p q r s t u v"),
      (2L, "p q r s t u v")
    ).toDF("doc_id", "text")
    val got = spans(docs)
    // 5 anchors at positions 1..5, all gaps = 1 <= k: one island covering
    // words 1..7 => dup_words = 5 - 1 + 3 = 7 = the whole doc
    assert(got(1L) === ((1L, 7L, 1.0)))
    assert(got(2L) === ((1L, 7L, 1.0)))
  }

  test("dupSpans: within-doc repeat with gap > k splits into two islands") {
    val docs = Seq(
      (1L, "a b c g1 g2 g3 g4 g5 g6 g7 a b c")
    ).toDF("doc_id", "text")
    val got = spans(docs)
    // "a b c" anchors at pos 1 and pos 11; gap 10 > 3 => two spans of 3
    assert(got(1L) === ((2L, 6L, 6.0 / 13.0)))
  }

  test("dupSpans: docs below k tokens or with no repeated shingle emit no row") {
    val docs = Seq(
      (1L, "a b"),                                   // < k tokens
      (2L, "unique words only in this one document"),
      (3L, "a b c d e f"),
      (4L, "q w a b c r t y")                        // pairs with 3
    ).toDF("doc_id", "text")
    val got = spans(docs)
    assert(got.keySet === Set(3L, 4L))
  }

  test("dupSpans: overlapping distinct anchors merge (shared run longer than k)") {
    // the 4-word run "a b c d" is shared: anchors "a b c"(+1) and
    // "b c d"(+2 on one side, +5 on the other) chain into one island
    val docs = Seq(
      (1L, "a b c d x1 x2 x3"),
      (2L, "y1 y2 y3 y4 a b c d z1")
    ).toDF("doc_id", "text")
    val got = spans(docs)
    assert(got(1L) === ((1L, 4L, 4.0 / 7.0)))
    assert(got(2L) === ((1L, 4L, 4.0 / 9.0)))
  }

  test("dupSpans ≅ naive reference over random corpora (differential property)") {
    // Naive reference: materialize every k-gram STRING, find repeated
    // ones, mark covered word positions, count maximal covered runs.
    // Anchors whose gap is <= k merge even when the words between them
    // are NOT duplicated — both sides implement that same island rule,
    // so coverage counts islands' extents, not the union of anchors.
    def ref(docs: Seq[(Long, String)], k: Int): Map[Long, (Long, Long, Double)] = {
      val grams = docs.flatMap { case (id, t) =>
        val w = t.split(" ", -1)
        (0 to w.length - k).map(i => (id, i + 1, w.slice(i, i + k).mkString(" ")))
      }
      val dup = grams.groupBy(_._3).filter(_._2.size > 1).keySet
      docs.flatMap { case (id, t) =>
        val w = t.split(" ", -1)
        val anchors = (0 to w.length - k).map(_ + 1)
          .filter(p => dup.contains(w.slice(p - 1, p - 1 + k).mkString(" ")))
        if (anchors.isEmpty) None
        else {
          // islands: split where gap > k
          val islands = anchors.tail.foldLeft(List(List(anchors.head))) {
            case (acc @ (cur :: rest), p) =>
              if (p - cur.head <= k) (p :: cur) :: rest else List(p) :: acc
            case (Nil, p) => List(List(p))
          }
          val nSpans = islands.size.toLong
          val dupWords = islands.map(i => i.head - i.last + k).sum.toLong
          Some(id -> ((nSpans, dupWords, dupWords.toDouble / w.length)))
        }
      }.toMap
    }
    val rnd = new scala.util.Random(77)
    (1 to 8).foreach { trial =>
      val k = 2 + rnd.nextInt(3) // 2..4
      // small vocab forces organic repeats; occasional shared phrase
      val phrase = Seq.fill(k + rnd.nextInt(3))("p" + rnd.nextInt(3)).mkString(" ")
      val docs = (1L to 8L).map { id =>
        val base = Seq.fill(3 + rnd.nextInt(10))("w" + rnd.nextInt(5))
        val text = if (rnd.nextBoolean()) (base.take(2) ++ Seq(phrase) ++ base.drop(2)).mkString(" ")
                   else base.mkString(" ")
        (id, text)
      }
      val want = ref(docs, k)
      val got = TextOps.dupSpans(docs.toDF("doc_id", "text"), k).collect()
        .map(r => r.getAs[Long]("doc_id") ->
          ((r.getAs[Long]("n_spans"), r.getAs[Long]("dup_words"), r.getAs[Double]("dup_frac"))))
        .toMap
      assert(got === want, s"trial=$trial k=$k docs=$docs")
    }
  }

  test("contaminatedSpans: bench-matching anchors localize to exact word spans") {
    val train = Seq((1L, "a b c d e f g")).toDF("doc_id", "text")
    val bench = Seq((100L, "x c d e y")).toDF("doc_id", "text")
    val got = Decontaminate.contaminatedSpans(train, bench, k = 3).collect()
      .map(r => (r.getAs[Long]("train_id"), r.getAs[Long]("span_start"),
        r.getAs[Long]("span_end"), r.getAs[Long]("span_words")))
    // only "c d e" (train pos 3) appears in bench: span covers words 3..5
    assert(got.toSeq === Seq((1L, 3L, 5L, 3L)))
  }

  test("contaminatedSpans: consecutive anchors merge into one leaked run") {
    val train = Seq((1L, "p q r s t u")).toDF("doc_id", "text")
    val bench = Seq((100L, "z p q r s w")).toDF("doc_id", "text")
    val got = Decontaminate.contaminatedSpans(train, bench, k = 3).collect()
      .map(r => (r.getAs[Long]("span_start"), r.getAs[Long]("span_end"),
        r.getAs[Long]("span_words")))
    // "p q r"@1 and "q r s"@2 chain: the shared 4-word run p..s
    assert(got.toSeq === Seq((1L, 4L, 4L)))
  }

  test("contaminatedSpans: clean corpus emits nothing") {
    val train = Seq((1L, "entirely novel words in this training document")).toDF("doc_id", "text")
    val bench = Seq((100L, "benchmark text that shares no run of three")).toDF("doc_id", "text")
    assert(Decontaminate.contaminatedSpans(train, bench, k = 3).count() === 0L)
  }

  test("chunk: overlapping windows clamp at the document end") {
    val df = Seq((1L, "w1 w2 w3 w4 w5")).toDF("doc_id", "text")
    val got = TextOps.chunk(df, chunkSize = 3, stride = 2).collect()
      .map(r => (r.getAs[Long]("chunk_start"), r.getAs[Long]("n_chunk_words"),
        r.getAs[String]("chunk_hash"))).sortBy(_._1)
    def h(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(got.toSeq === Seq(
      (1L, 3L, h("w1 w2 w3")), (3L, 3L, h("w3 w4 w5")), (5L, 1L, h("w5"))))
  }

  test("chunk: map-side only — the plan has no exchange") {
    val df = Seq((1L, "a b c")).toDF("doc_id", "text")
    val plan = TextOps.chunk(df).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"))
  }

  test("stripDupSpans: keeps the corpus-first occurrence, strips the rest") {
    val docs = Seq(
      (1L, "p q r s t"),           // first occurrence: untouched
      (2L, "p q r s t"),           // exact dup: fully stripped
      (3L, "x1 x2 p q r s2 y1")    // shares 3-gram "p q r" (foreign at pos 3)
    ).toDF("doc_id", "text")
    val got = TextOps.stripDupSpans(docs, k = 3).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[String]("clean_text"), r.getAs[Long]("n_kept"), r.getAs[Long]("n_removed"))))
      .toMap
    assert(got(1L) === (("p q r s t", 5L, 0L)))
    assert(got(2L) === (("", 0L, 5L)))
    assert(got(3L) === (("x1 x2 s2 y1", 4L, 3L)))
  }

  test("stripDupSpans: within-doc repeat keeps only the first occurrence") {
    val docs = Seq((1L, "a b c z1 z2 z3 z4 a b c")).toDF("doc_id", "text")
    val got = TextOps.stripDupSpans(docs, k = 3).collect().head
    assert(got.getAs[String]("clean_text") === "a b c z1 z2 z3 z4")
    assert(got.getAs[Long]("n_removed") === 3L)
  }

  test("stripDupSpans: overlapping duplicated grams erode a kept occurrence's shared words (documented semantics)") {
    // "a b a b a b", k=2: owners are "a b"@1 and "b a"@2; foreign
    // anchors 3,4,5 cover {3,4,5,6} wholesale — the kept "b a"@2 loses
    // position 3. Windows are removed whole; this pins that contract.
    val docs = Seq((1L, "a b a b a b")).toDF("doc_id", "text")
    val got = TextOps.stripDupSpans(docs, k = 2).collect().head
    assert(got.getAs[String]("clean_text") === "a b")
    assert(got.getAs[Long]("n_kept") === 2L)
    assert(got.getAs[Long]("n_removed") === 4L)
  }

  test("stripDupSpans: clean docs pass through byte-identical") {
    val docs = Seq((1L, "all unique words here"), (2L, "another clean document")).toDF("doc_id", "text")
    val got = TextOps.stripDupSpans(docs, k = 3).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("clean_text")).toMap
    assert(got === Map(1L -> "all unique words here", 2L -> "another clean document"))
  }

  test("stripDupSpans skew rehearsal: one boilerplate shingle in 200 docs — agg ownership, no per-hash window") {
    // the hot-key shape a real corpus guarantees (shared header/footer):
    // ownership must come from a partial-aggregable min, never a
    // row_number over the hash partition (one hot sort task at scale)
    val docs = (1L to 200L).map(i => (i, s"u${i}a u${i}b common boiler plate u${i}c"))
      .toDF("doc_id", "text")
    val res = TextOps.stripDupSpans(docs, k = 3)
    val plan = res.queryExecution.executedPlan.toString
    assert(!plan.contains("windowspecdefinition"), "ownership must be an aggregate, not a window")
    val rows = res.collect().map(r => r.getAs[Long]("doc_id") ->
      ((r.getAs[String]("clean_text"), r.getAs[Long]("n_removed")))).toMap
    // doc 1 owns the shared "common boiler plate" 3-gram; all others lose it
    assert(rows(1L) === ((s"u1a u1b common boiler plate u1c", 0L)))
    (2L to 200L).foreach { i =>
      assert(rows(i) === ((s"u${i}a u${i}b u${i}c", 3L)), s"doc $i")
    }
    // dupSpans over the same corpus: every doc reports the one span
    val spans200 = TextOps.dupSpans(docs, k = 3).collect()
    assert(spans200.length === 200)
    assert(spans200.forall(r => r.getAs[Long]("n_spans") == 1L && r.getAs[Long]("dup_words") == 3L))
  }

  test("mixtureReport: shares sum to 1 and totals join by broadcast, not a global window") {
    val docs = Seq(
      (1L, "a b c", "en", "s1"), (2L, "d e", "en", "s1"),
      (3L, "f g h i", "de", "s2")
    ).toDF("doc_id", "text", "lang", "source")
    val rep = TextOps.mixtureReport(docs)
    val rows = rep.collect().map(r => (r.getAs[String]("source"), r.getAs[String]("lang"),
      r.getAs[Long]("n_docs"), r.getAs[Long]("n_tokens"),
      r.getAs[Double]("doc_share"), r.getAs[Double]("token_share"))).sortBy(_._1)
    assert(rows.toSeq === Seq(
      ("s1", "en", 2L, 5L, 2.0 / 3.0, 5.0 / 9.0),
      ("s2", "de", 1L, 4L, 1.0 / 3.0, 4.0 / 9.0)))
    val plan = rep.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"))
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastExchange"))
  }

  private val profiled = Seq[(java.lang.Long, String)](
    (1L, "b"), (null, "a"), (3L, null), (3L, "a")
  ).toDF("x", "s")

  test("profile: exact tier — counts, nulls, distinct, native-type min/max") {
    val rows = Profile.columns(profiled, Seq("x", "s")).collect()
      .map(r => r.getAs[String]("col_name") ->
        ((r.getAs[Long]("n_rows"), r.getAs[Long]("n_null"), r.getAs[Long]("n_distinct"),
          r.getAs[String]("min_str"), r.getAs[String]("max_str")))).toMap
    assert(rows("x") === ((4L, 1L, 2L, "1", "3")))
    assert(rows("s") === ((4L, 1L, 2L, "a", "b")))
  }

  test("profile: numeric min/max order numerically, not lexically") {
    val df = Seq(2L, 10L, 9L).toDF("v")
    val r = Profile.columns(df, Seq("v")).collect().head
    // lexical ordering would say min="10", max="9"
    assert(r.getAs[String]("min_str") === "2")
    assert(r.getAs[String]("max_str") === "10")
  }

  test("profile: approx tier matches exact on small cardinalities and drops Expand") {
    val exact = Profile.columns(profiled, Seq("x", "s"))
    val approx = Profile.columns(profiled, Seq("x", "s"), approxDistinct = true)
    assert(approx.collect().map(_.toSeq).toSet === exact.collect().map(_.toSeq).toSet)
    // plan shape: multi-column exact distinct goes through Expand; the
    // HLL++ tier must plan as a plain partial+final aggregate
    assert(exact.queryExecution.executedPlan.toString.contains("Expand"))
    assert(!approx.queryExecution.executedPlan.toString.contains("Expand"))
  }

  test("profile: single scan — one table read feeds every column's stats") {
    val plan = Profile.columns(profiled, Seq("x", "s")).queryExecution.optimizedPlan
    val scans = plan.collect { case l: org.apache.spark.sql.catalyst.plans.logical.LocalRelation => l }
    assert(scans.size === 1)
  }

  test("cdcChunks: chunks tile the document exactly; short docs form one chunk") {
    val docs = Seq(
      (1L, (1 to 40).map(i => s"w$i").mkString(" ")),
      (2L, "tiny doc"), // < k tokens: one whole-doc chunk
      (3L, "")) // split('') = one empty token
      .toDF("doc_id", "text")
    val rows = TextOps.cdcChunks(docs, k = 4, modulus = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // tiling invariant: per doc, chunks are contiguous, start at 1 and
    // end at n_words — no gaps, no overlaps
    for ((id, n) <- Seq((1L, 40L), (2L, 2L), (3L, 1L))) {
      val cs = rows.filter(_._1 == id).sortBy(_._2)
      assert(cs.head._2 === 1L && cs.last._3 === n, s"doc $id must tile 1..$n")
      assert(cs.sliding(2).forall {
        case Array(a, b) => b._2 == a._3 + 1
        case _ => true
      }, s"doc $id chunks must be contiguous")
      assert(cs.forall(c => c._4 == c._3 - c._2 + 1))
    }
    assert(rows.count(_._1 == 2L) === 1 && rows.count(_._1 == 3L) === 1)
    // non-power-of-two / oversized moduli are rejected loudly (a
    // 2-hex-digit draw once capped any modulus > 256 silently)
    intercept[IllegalArgumentException] {
      TextOps.cdcChunks(docs, k = 4, modulus = 100)
    }
    intercept[IllegalArgumentException] {
      TextOps.cdcChunks(docs, k = 4, modulus = 131072)
    }
  }

  test("cdcChunks: boundaries are content-local — a prefix insertion reshapes only the head") {
    // The CDC property fixed-stride chunking lacks: words far from an
    // edit keep their chunk hashes.
    val base = (1 to 60).map(i => s"tok$i").mkString(" ")
    val shifted = "inserted words here " + base
    val a = TextOps.cdcChunks(Seq((1L, base)).toDF("doc_id", "text"), k = 4, modulus = 4)
      .collect().map(_.getAs[String]("chunk_hash")).toSet
    val b = TextOps.cdcChunks(Seq((1L, shifted)).toDF("doc_id", "text"), k = 4, modulus = 4)
      .collect().map(_.getAs[String]("chunk_hash")).toSet
    // every chunk of the original except (at most) the first survives
    // the prefix edit bit-identically
    assert((a -- b).size <= 1, s"CDC must localize the edit: lost ${(a -- b).size} chunks")
    // fixed-stride chunking shifts EVERY chunk (the contrast claim)
    val fa = TextOps.chunk(Seq((1L, base)).toDF("doc_id", "text"), 16, 16)
      .collect().map(_.getAs[String]("chunk_hash")).toSet
    val fb = TextOps.chunk(Seq((1L, shifted)).toDF("doc_id", "text"), 16, 16)
      .collect().map(_.getAs[String]("chunk_hash")).toSet
    assert((fa -- fb).size > 1)
  }

  test("profile stats are shard-mergeable: profile(A ∪ B) == merge(profile(A), profile(B)) for the mergeable tier") {
    // The 100 TB pattern: per-shard profiles combine WITHOUT rescanning
    // — rows/nulls add, min/max take extrema. (Exact distinct is the
    // non-mergeable column; its scale tier is the HLL variant, whose
    // sketches merge by design.)
    val a = Seq((1L, "x"), (2L, null.asInstanceOf[String]), (3L, "m")).toDF("id", "s")
    val b = Seq((4L, "z"), (5L, "a")).toDF("id", "s")
    def prof(df: org.apache.spark.sql.DataFrame) =
      Profile.columns(df, Seq("s")).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getString(4), r.getString(5))).head
    val (pa, pb) = (prof(a), prof(b))
    val merged = (pa._1, pa._2 + pb._2, pa._3 + pb._3,
      Seq(pa._4, pb._4).min, Seq(pa._5, pb._5).max)
    assert(merged === prof(a.unionByName(b)))
  }

  test("cdcChunks == naive per-doc reference on random corpora (8 trials)") {
    val rnd = new scala.util.Random(77)
    def refCdc(text: String, k: Int, m: Int): Set[(Long, Long, Long, String)] = {
      val w = text.split(" ", -1)
      val cuts = scala.collection.mutable.SortedSet[Int]()
      if (w.length >= k)
        for (p <- 1 to w.length - k + 1) {
          val h = md5hex(w.slice(p - 1, p - 1 + k).mkString(" "))
          if (Integer.parseInt(h.substring(0, 4), 16) % m == 0) cuts += (p + k - 1)
        }
      cuts += w.length
      val cs = cuts.toSeq
      cs.zip(0 +: cs.init).map { case (e, prev) =>
        (prev + 1L, e.toLong, (e - prev).toLong, md5hex(w.slice(prev, e).mkString(" ")))
      }.toSet
    }
    for (_ <- 1 to 8) {
      val docs = (1 to 20).map { id =>
        (id.toLong, Seq.fill(rnd.nextInt(30))("t" + rnd.nextInt(8)).mkString(" "))
      }
      val got = TextOps.cdcChunks(docs.toDF("doc_id", "text"), k = 4, modulus = 4)
        .collect()
        .groupBy(_.getLong(0))
        .view.mapValues(_.map(r =>
          (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4))).toSet).toMap
      docs.foreach { case (id, text) =>
        assert(got.getOrElse(id, Set.empty) === refCdc(text, 4, 4), s"doc $id: '$text'")
      }
    }
  }

  test("postings: counts and sorted positions per (token, doc)") {
    val docs = Seq((1L, "a b a c a"), (2L, "b b")).toDF("doc_id", "text")
    val rows = TextOps.postings(docs).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> (r.getLong(2), r.getString(3))).toMap
    assert(rows(("a", 1L)) === ((3L, "1,3,5")))
    assert(rows(("b", 1L)) === ((1L, "2")))
    assert(rows(("c", 1L)) === ((1L, "4")))
    assert(rows(("b", 2L)) === ((2L, "1,2")))
    assert(rows.size === 4)
  }
}
