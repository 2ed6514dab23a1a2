package graft.text

import graft.SparkSpec

class TextSpec extends SparkSpec {

  test("approx_top_k bigram sketch contains the exact top-10 heavy hitters") {
    val exact = TextQueries.ngramCounts(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val approx = TextQueries.ngramTopKSketch(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    // frequent-items guarantee: every sufficiently heavy item survives
    // the sketch; on this corpus the default sketch never saturates, so
    // the exact top-10 must be present with exact counts
    exact.take(10).foreach { case (gram, cnt) =>
      assert(approx.contains(gram), s"missing heavy hitter $gram")
      assert(approx(gram) === cnt, s"count drift for $gram")
    }
    // registered driver form renders the same guarantee as TRUE bits
    val audit = TextQueries.ngramTopKSketchChecked(spark, sf).collect()
    assert(audit.length === 1)
    assert(audit.head.getLong(0) === 10L &&
      audit.head.getBoolean(1) && audit.head.getBoolean(2))
  }

  test("repetition ratio is 1 - distinct/total and bounded [0, 1)") {
    val rs = TextQueries.repetition(spark, sf).collect()
    assert(rs.nonEmpty)
    rs.foreach { r =>
      val (n, d, ratio) = (r.getInt(1), r.getInt(2), r.getDouble(3))
      assert(d >= 1 && d <= n)
      assert(math.abs(ratio - (1.0 - d.toDouble / n)) < 1e-15)
      assert(ratio >= 0.0 && ratio < 1.0)
    }
    // the corpus contains docs with repeated 3-grams — signal is live
    assert(rs.exists(_.getDouble(3) > 0.0))
  }

  test("PII scrub redacts all three injected pattern classes on every doc") {
    val rs = TextQueries.piiRedact(spark, sf).collect()
    assert(rs.length > 0)
    rs.foreach { r =>
      assert(r.getInt(3) === 3, s"doc ${r.getLong(0)}: expected 3 redactions")
      // masked text is strictly shorter than raw (patterns are longer
      // than their tags on every doc by construction)
      assert(r.getInt(2) < r.getInt(1))
    }
  }

  test("decontamination flags benchmark docs and at least one cross-doc leak") {
    val rs = TextQueries.decontaminate(spark, sf).collect()
    val flagged = rs.map(r => (r.getLong(0), r.getBoolean(2))).toMap
    // every benchmark doc long enough to carry a 4-gram self-matches
    assert(flagged.count(_._2) > 0)
    // and the check catches real cross-document contamination, not just
    // self-hits — the signal a decontamination pass exists for
    assert(flagged.exists(!_._2), "no non-benchmark doc flagged")
    // the bench probe side is benchmark-sized: it must broadcast
    val plan = TextQueries.decontaminate(spark, sf).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"probe join did not broadcast:\n$plan")
  }

  test("sequence packing covers every doc exactly once within budget chunks") {
    val docs = graft.Tables.documents(spark, sf).count()
    val rs = TextQueries.sequencePack(spark, sf).collect()
    assert(rs.map(_.getLong(2)).sum === docs) // partition of the corpus
    // chunks are contiguous per source: 0..maxChunk all present
    rs.groupBy(_.getString(0)).foreach { case (_, rows) =>
      val ids = rows.map(_.getLong(1)).sorted
      assert(ids.sameElements(0L until ids.length.toLong))
    }
    // a chunk's token mass stays near budget: every non-final chunk must
    // have crossed the 512 boundary to close (start offsets partition on
    // multiples of 512)
    assert(rs.exists(_.getLong(1) > 0), "budget never overflowed — packing vacuous")
  }

  test("chunking covers every token with 16-token overlap between neighbors") {
    import org.apache.spark.sql.functions._
    val docs = graft.Tables.documents(spark, sf)
      .select(col("doc_id"),
        size(filter(split(col("text"), " "), w => w =!= "")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val chunks = TextQueries.chunk(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3)))
    chunks.groupBy(_._1).foreach { case (doc, rows) =>
      val sorted = rows.sortBy(_._2)
      // chunk ids dense from 0; starts at 1 + 48*k
      sorted.zipWithIndex.foreach { case ((_, cid, start, _), i) =>
        assert(cid === i && start === 1 + 48 * i)
      }
      // full coverage: last chunk must reach the final token
      val (_, _, lastStart, lastLen) = sorted.last
      assert(lastStart + lastLen - 1 === docs(doc),
        s"doc $doc: tokens ${docs(doc)} but last chunk ends at ${lastStart + lastLen - 1}")
      // every non-final chunk is full-width (64), giving a 16-token overlap
      sorted.init.foreach { case (_, _, _, len) => assert(len === 64) }
    }
    assert(chunks.nonEmpty && chunks.exists(_._2 > 0), "no multi-chunk docs — overlap untested")
  }

  test("tfidf ranks rarer terms above common ones at equal tf") {
    val rs = TextQueries.tfidf(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(rs.nonEmpty)
    rs.groupBy(_._1).foreach { case (_, rows) =>
      assert(rows.map(_._2).sorted.sameElements(1 to rows.length)) // rk dense from 1
      // scores non-increasing in rank order
      val byRank = rows.sortBy(_._2).map(_._6)
      assert(byRank.zip(byRank.tail).forall { case (a, b) => a >= b })
    }
    // idf monotonicity: within one doc, equal tf ⇒ the smaller df never
    // scores lower
    rs.groupBy(_._1).foreach { case (_, rows) =>
      for (a <- rows; b <- rows if a._4 == b._4 && a._5 < b._5)
        assert(a._6 >= b._6)
    }
  }

  test("vocabulary stats match a driver-side replay of one source") {
    val rows = TextQueries.vocabStats(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    assert(rows.nonEmpty)
    rows.values.foreach { case (tokens, vocab, hapax, ttr) =>
      assert(vocab <= tokens && hapax <= vocab)
      assert(ttr === vocab * 1000000L / tokens)
    }
    val src = rows.keys.min
    val words = graft.Tables.documents(spark, sf)
      .where(org.apache.spark.sql.functions.col("source") === src)
      .select("text").collect()
      .flatMap(_.getString(0).split(" ")).filter(_.nonEmpty)
    val counts = words.groupBy(identity).view.mapValues(_.length)
    val expect = (words.length.toLong, counts.size.toLong,
      counts.values.count(_ == 1).toLong,
      counts.size.toLong * 1000000L / words.length)
    assert(rows(src) === expect)
  }

  test("dataset card metrics agree with independent corpus counts") {
    val card = TextQueries.datasetCard(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val docs = graft.Tables.documents(spark, sf)
    assert(card("n_docs") === docs.count())
    assert(card("n_sources") === docs.select("source").distinct().count())
    assert(card("n_langs") === docs.select("lang").distinct().count())
    assert(card("min_chars") <= card("p50_chars") &&
      card("p50_chars") <= card("max_chars"))
    assert(card("n_exact_dup_docs") >= 0 && card("n_tokens") > card("n_docs"))
  }

  test("bm25 equals a driver-side BigInt replay of the rational formula") {
    val got = TextQueries.bm25(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1)) ->
        (r.getString(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    val docs = graft.Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ").filter(_.nonEmpty).toSeq)
    val tf = docs.flatMap { case (id, ws) =>
      ws.groupBy(identity).map { case (w, g) => (id, w) -> g.length.toLong } }.toMap
    val dfm = tf.keys.groupBy(_._2).map { case (w, ks) => w -> ks.size.toLong }
    val dl = docs.map { case (id, ws) => id -> ws.length.toLong }.toMap
    val n = BigInt(docs.length); val t = BigInt(dl.values.sum)
    val want = docs.flatMap { case (id, _) => tf.collect {
      case ((d, w), f) if d == id =>
        val idf = (BigInt(1000) * n) / BigInt(dfm(w))
        val score = (idf * 44 * f * t) /
          (BigInt(20) * f * t + 6 * t + BigInt(18) * dl(id) * n)
        (w, f, dfm(w), score.toLong)
    }.toSeq.sortBy { case (w, _, _, sc) => (-sc, w) }.take(3).zipWithIndex
      .map { case (row, i) => (id, i + 1) -> row } }.toMap
    assert(got === want)
  }

  test("weighted sample is the k smallest PPS priorities and skews long") {
    val got = TextQueries.weightedSample(spark, sf).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.nonEmpty)
    // recompute every priority independently: 60-bit md5 prefix div weight
    def prio(id: Long, w: Long): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString.take(15)
      java.lang.Long.parseLong(hex, 16) / w
    }
    got.foreach { case (_, _, id, w, p) => assert(p === prio(id, w)) }
    // per source: exactly the 10 smallest (priority, doc_id) of the corpus
    val all = graft.Tables.documents(spark, sf)
      .select("source", "doc_id", "n_chars").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .filter(_._3 > 0)
    all.groupBy(_._1).foreach { case (src, rows) =>
      val want = rows.map { case (_, id, w) => (prio(id, w), id) }
        .sorted.take(10).map(_._2).toSeq
      val sel = got.filter(_._1 == src).sortBy(_._2).map(_._3).toSeq
      assert(sel === want, s"selection mismatch for $src")
    }
    // PPS bias: long documents are favored, so the sample mean exceeds
    // the corpus mean (371.9 vs 306.3 at sf0.001 — wide margin)
    val sampMean = got.map(_._4).sum.toDouble / got.length
    val popMean = all.map(_._3).sum.toDouble / all.length
    assert(sampMean > popMean)
  }

  test("quality upsampling drops the tail and replicates top bins per epoch") {
    val rows = TextQueries.qualityUpsample(spark, sf).collect()
      .map(r => ((r.getString(0), r.getLong(1), r.getLong(2)), (r.getLong(3), r.getLong(4))))
    val bins = rows.map(_._1._2).toSet
    assert(bins.forall(_ >= 5), s"low-quality bin leaked: $bins")
    assert(bins.exists(_ >= 7) && bins.exists(b => b >= 5 && b < 7),
      s"both weight tiers must be live: $bins")
    // upsampled bins: identical doc/token counts in every epoch 1..3
    rows.groupBy { case ((src, bin, _), _) => (src, bin) }.foreach {
      case ((_, bin), grp) =>
        val epochs = grp.map(_._1._3).sorted.toSeq
        if (bin >= 7) assert(epochs === Seq(1L, 2L, 3L))
        else assert(epochs === Seq(1L))
        assert(grp.map(_._2).distinct.length === 1,
          "epoch replicas must be identical")
    }
  }

  test("token-budget selection: equals the global rule, tight, best-first complete") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val got = TextQueries.queries("q301_token_budget_select")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(got.nonEmpty)
    // the naive single-window global rule the plan-shape cleverness
    // (histogram walk + one-class sort) must land on exactly
    val scored = graft.Tables.documents(spark, sf)
      .select(col("doc_id"),
        expr("filter(split(text, ' '), w -> w != '')").as("ws"))
      .select(col("doc_id"),
        size(col("ws")).cast("long").as("words"),
        size(array_distinct(col("ws"))).cast("long").as("dwords"))
      .where(col("words") > 0)
      .withColumn("ppm", expr("dwords * 1000000 div words"))
      .select("doc_id", "ppm", "words")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val budget = scored.map(_._3).sum * 2 / 5
    val order = scored.sortBy { case (id, ppm, _) => (-ppm, id) }
    var cum = 0L
    val want = order.takeWhile { case (_, _, w) => cum += w; cum <= budget }
      .sortBy(_._1)
    assert(got.toSeq === want.toSeq)
    // tight: the selection spends the budget — the next doc in rule
    // order would overflow it (the corpus never fits in 40%)
    val spent = want.map(_._3).sum
    assert(want.length < order.length, "selection must be a strict prefix")
    assert(spent <= budget && spent + order(want.length)._3 > budget,
      s"not tight: spent=$spent budget=$budget")
    // best-first: every class strictly above the boundary score is
    // selected whole
    val boundaryPpm = want.last._2
    val above = scored.filter(_._2 > boundaryPpm).map(_._1).toSet
    assert(above.subsetOf(got.map(_._1).toSet))
  }

  test("shuffle shards: total, deterministic, balanced, positions dense per shard") {
    val rows = TextQueries.queries("q303_shuffle_shards")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val nDocs = graft.Tables.documents(spark, sf).count()
    // total and exactly-once: every doc lands in exactly one shard
    assert(rows.length.toLong === nDocs)
    assert(rows.map(_._1).distinct.length.toLong === nDocs)
    // deterministic: a second run is bit-identical (no rand() anywhere)
    val again = TextQueries.queries("q303_shuffle_shards")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.sortBy(_._1).toSeq === again.sortBy(_._1).toSeq)
    // positions are dense 1..n within every shard (a loader can seek)
    rows.groupBy(_._2).foreach { case (shard, grp) =>
      assert(grp.map(_._3).sorted.toSeq === (1L to grp.length).toSeq,
        s"shard $shard positions not dense")
    }
    // balanced enough to parallelize: the multiplicative hash spreads
    // consecutive ids — no shard may hold more than 4x the mean
    val mean = nDocs.toDouble / 64
    val maxShard = rows.groupBy(_._2).values.map(_.length).max
    assert(maxShard <= mean * 4, s"skewed shards: max=$maxShard mean=$mean")
    // shuffled, not sorted: within some shard the doc_id order and the
    // position order disagree (the point of the second hash)
    val disagree = rows.groupBy(_._2).values.exists { grp =>
      val byPos = grp.sortBy(_._3).map(_._1).toSeq
      byPos !== byPos.sorted
    }
    assert(disagree, "training order degenerated to doc_id order")
  }

  test("vocab coverage: OOV is exactly the token mass outside the global top-20") {
    val got = TextQueries.vocabCoverage(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.nonEmpty)
    // brute replay: global top-20 by (count desc, token), then per-source
    // occurrence counts outside it
    val toks = graft.Tables.documents(spark, sf)
      .selectExpr("source", "explode(filter(split(text, ' '), w -> w != '')) as t")
      .collect().map(r => (r.getString(0), r.getString(1)))
    val top20 = toks.groupBy(_._2).view.mapValues(_.length).toSeq
      .sortBy { case (t, c) => (-c, t) }.take(20).map(_._1).toSet
    val want = toks.groupBy(_._1).map { case (src, ts) =>
      val n = ts.length.toLong
      val oov = ts.count(t => !top20(t._2)).toLong
      (src, n, oov, oov * 1000000L / n)
    }.toSet
    assert(got.toSet === want)
    // the 31-word synthetic vocab leaves 11 words OOV — the audit must
    // not be vacuous in either direction
    assert(got.exists(_._3 > 0), "no OOV mass anywhere")
    assert(got.forall { case (_, n, oov, _) => oov < n }, "all-OOV source")
  }

  test("feature hashing conserves token mass and stays inside the bucket range") {
    val rows = TextQueries.featureHash(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty)
    assert(rows.forall { case (_, b, _) => b >= 0 && b < 32 },
      "bucket outside [0, 32)")
    // hashing is feature-dim reduction, not sampling: the per-doc bucket
    // counts must sum to exactly the doc's whitespace token count
    val got = rows.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    val expect = graft.Tables.documents(spark, sf)
      .selectExpr("doc_id",
        "cast(size(filter(split(text, ' '), w -> w != '')) as long) as n")
      .collect().map(r => r.getLong(0) -> r.getLong(1))
      .filter(_._2 > 0).toMap
    assert(got === expect)
    // 32 buckets over a ~40-word vocabulary: collisions are guaranteed,
    // so distinct buckets per doc must be < distinct tokens overall
    assert(rows.map(_._2).distinct.length <= 32)
  }

  test("phrase search equals a brute sliding-window scan") {
    val got = TextQueries.phraseSearch(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val docs = graft.Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val want = docs.flatMap { case (id, text) =>
      val ws = text.split(" ").filter(_.nonEmpty)
      val hits = ws.indices.dropRight(1)
        .filter(i => ws(i) == "fast" && ws(i + 1) == "table")
      if (hits.isEmpty) None
      else Some((id, hits.size.toLong, hits.head + 1L)) // 1-based
    }.toSet
    assert(got.nonEmpty && got === want)
  }

  test("posting bits: bucketed gap encoding equals the naive per-source scan") {
    // doc_ids cross the 256 bucket boundary at every sf, so BOTH legs
    // of the bucketed lag (in-bucket + boundary reach-back) run
    val d = sf
    val got = TextQueries.postingBits(spark, d).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSet
    val docs = graft.Tables.documents(spark, d)
      .select("source", "doc_id").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(docs.map(_._2).max > 256L, "corpus must span several buckets")
    val want = docs.groupBy(_._1).map { case (src, ds) =>
      val ids = ds.map(_._2).sorted
      val gaps = ids.head +: ids.sliding(2).map(p => p(1) - p(0)).toArray
      val bits = gaps.map(g => java.lang.Long.toBinaryString(g).length.toLong).sum
      val raw = ids.length * 64L
      (src, ids.length.toLong, raw, bits, (raw - bits) * 1000000L / raw)
    }.toSet
    assert(got === want)
  }

  test("bigram LM scores equal an independent smoothed-count recompute; tails live") {
    val got = TextQueries.lmScore(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val docs = graft.Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ").filter(_.nonEmpty))
    val vocab = docs.flatMap(_._2).distinct.length.toLong
    val allBigrams = docs.flatMap { case (_, ws) => ws.sliding(2).filter(_.length == 2) }
      .map(p => (p(0), p(1)))
    val cb = allBigrams.groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val cu = allBigrams.groupBy(_._1).map { case (k, v) => k -> v.length.toLong }
    val want = docs.filter(_._2.length >= 2).map { case (id, ws) =>
      val ps = ws.sliding(2).filter(_.length == 2).map { p =>
        (cb((p(0), p(1))) + 1L) * 1000000L / (cu(p(0)) + vocab)
      }.toArray
      id -> (ps.length.toLong, ps.sum / ps.length)
    }.toMap
    assert(got === want)
    // the filter signal is live: scores spread (the synthetic corpus is
    // homogeneous — ~25% min-to-max spread here; real web text spreads
    // orders of magnitude)
    val scores = got.values.map(_._2)
    assert(scores.toSet.size > 10, "degenerate LM: scores collapsed")
    assert(scores.min * 5 < scores.max * 4, "scores flat: no ranking signal")
  }
}
