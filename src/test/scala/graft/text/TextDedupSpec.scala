package graft.text

import org.apache.spark.sql.functions._
import graft.SparkSpec

class TextDedupSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (0L, "the quick brown fox jumps over the lazy dog near the river bank today"),
    (1L, "the quick brown fox jumps over the lazy dog near the river bank tonight"), // near-dup of 0
    (2L, "completely different content about spark query engines and columnar execution"),
    (3L, "the quick brown fox jumps over the lazy dog near the river bank today"),   // exact dup of 0
    (4L, "el la de que y en palabras espanolas aqui")).toDF("doc_id", "text")

  test("token and subword counts") {
    val got = Seq("hello, world!  two  spaces", "").toDF("t")
      .select(TextAnalysis.tokenCount(col("t")).as("n"),
        TextAnalysis.subwordCount(col("t")).as("sw"))
      .collect().map(r => (r.getInt(0), r.getInt(1)))
    assert(got(0) == ((4, 6))) // [hello, ,, world, !] runs + puncts = hello , world ! two spaces
    assert(got(1) == ((0, 0)))
  }

  test("language ID: stopword-vote heuristic") {
    val got = docs.select(col("doc_id"), TextAnalysis.langId(col("text")).as("l"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(0) == "en")
    assert(got(4) == "es")
  }

  test("language ID: no hits -> und") {
    val got = Seq("xyzzy plugh 42").toDF("t")
      .select(TextAnalysis.langId(col("t"))).collect()
    assert(got.head.getString(0) == "und")
  }

  test("quality score is in [0,1] and higher for clean English prose") {
    val got = docs.select(col("doc_id"),
        TextAnalysis.qualityScore(col("text")).as("q")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    got.values.foreach(q => assert(q >= 0.0 && q <= 1.0))
    assert(got(0) > got(4)) // English stopword-rich beats Spanish under en-weighted score
  }

  test("exact fingerprint: whitespace-insensitive, content-sensitive") {
    val got = Seq("a  b   c", "a b c", "a b d").toDF("t")
      .select(TextAnalysis.exactFingerprint(col("t"))).collect().map(_.getString(0))
    assert(got(0) == got(1))
    assert(got(0) != got(2))
  }

  test("rolling fingerprint is stable under small suffix edits") {
    // min-over-shingle-hashes: appending one word usually preserves the min
    val fp = docs.where(col("doc_id").isin(0L, 1L))
      .select(TextAnalysis.rollingFingerprint(col("text"))).collect().map(_.getString(0))
    assert(fp(0) == fp(1))
  }

  test("exactDuplicates groups identical docs") {
    val groups = Dedup.exactDuplicates(docs, "doc_id", "text")
      .where(col("cnt") > 1).collect()
    assert(groups.length == 1)
    assert(groups.head.getAs[Long]("cnt") == 2L)
    assert(groups.head.getAs[Long]("keeper") == 0L)
  }

  test("ngram Jaccard finds the planted near-dup pair") {
    val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text", n = 3,
        threshold = 0.5, maxDocFreq = 100L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 1L)))
    assert(pairs.contains((0L, 3L)))
    assert(pairs.contains((1L, 3L)))
    assert(!pairs.exists(p => p._1 == 2L || p._2 == 2L))
  }

  test("MinHash LSH recovers the same pairs as exact Jaccard here") {
    val exact = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.5, 100L)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.minHashLshPairs(docs, "doc_id", "text", 3, 0.5)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // LSH candidates are verified exactly, so lsh ⊆ exact; exact dup must survive
    assert(lsh.subsetOf(exact))
    assert(lsh.contains((0L, 3L)))
  }

  test("incremental dedup: batch pairs against state index + itself; accept drops doc_b side") {
    // State corpus: doc 0. Batch: 1 (near-dup of 0), 2 (unrelated),
    // 3 (exact dup of 0 — also a near-dup of 1 within the batch).
    val state = docs.where(col("doc_id") === 0L)
    val batch = docs.where(col("doc_id").isin(1L, 2L, 3L))
    val stateIdx = Dedup.countedShingleIndex(state, "doc_id", "text", 3, 100L)
    val batchIdx = Dedup.countedShingleIndex(batch, "doc_id", "text", 3, 100L)
    val pairs = Dedup.incrementalNearDupPairs(batchIdx, stateIdx, 0.5)
    val got = pairs.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(3))).toSet
    assert(got == Set((0L, 1L, "state"), (0L, 3L, "state"), (1L, 3L, "batch")))
    val accepted = Dedup.incrementalAccept(batch.select(col("doc_id")), pairs)
      .collect().map(_.getLong(0)).toSet
    // 1 drops against the state corpus; 3 drops both ways; 2 survives.
    // (1 is doc_b of its state pair, so the batch keeps only 2.)
    assert(accepted == Set(2L))
  }

  test("exact-collapsed pairs equal the per-doc reference on a hostile generated corpus") {
    // The collapse path's equivalence claim is intricate (duplicate-
    // weighted hot cap, survivor-gated within pairs, cross expansion):
    // pin it against the uncollapsed per-doc machinery — which still
    // exists as countedShingleIndex + the FromIndex variants — on a
    // corpus engineered to hit every edge: heavy duplicate groups, docs
    // below the shingle width, duplicate groups whose every shingle is
    // hot-capped away (cap weighted by duplicate count), and near-dups.
    val rng = new scala.util.Random(7)
    val pool = Seq(
      "alpha beta gamma delta epsilon zeta", // duplicated widely
      "alpha beta gamma delta epsilon eta", // near-dup of above
      "one two", // below n=3: no shingles
      "hot hot hot hot common common common", // shingles go over the weighted cap
      "unrelated prose about columnar engines and shuffles",
      "unrelated prose about columnar engines and sorting",
      "")
    val rows = (0L until 60L).map(i => (i, pool(rng.nextInt(pool.length))))
    val gen = rows.toDF("doc_id", "text")
    def pairSet(df: org.apache.spark.sql.DataFrame) =
      df.select(col("doc_a"), col("doc_b"), round(col("jaccard"), 9))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    for (cap <- Seq(3L, 10L, 1000L)) {
      val refIdx = Dedup.countedShingleIndex(gen, "doc_id", "text", 3, cap)
      val ref = pairSet(Dedup.ngramJaccardPairsFromIndex(refIdx, 0.5))
      val got = pairSet(Dedup.ngramJaccardPairs(gen, "doc_id", "text", 3, 0.5, cap))
      assert(got == ref, s"jaccard mismatch at cap=$cap: " +
        s"missing=${(ref -- got).take(5)} extra=${(got -- ref).take(5)}")
      val refLsh = pairSet(Dedup.minHashLshPairsFromIndex(refIdx, 0.5))
      val gotLsh = pairSet(Dedup.minHashLshPairs(gen, "doc_id", "text", 3, 0.5,
        maxDocFreq = cap))
      assert(gotLsh == refLsh, s"lsh mismatch at cap=$cap: " +
        s"missing=${(refLsh -- gotLsh).take(5)} extra=${(gotLsh -- refLsh).take(5)}")
      // Incremental: collapsed state+batch must equal the per-doc form
      // (state = even ids, batch = odd ids, caps per half).
      val evens = gen.where(col("doc_id") % 2 === 0)
      val odds = gen.where(col("doc_id") % 2 =!= 0)
      def incSet(df: org.apache.spark.sql.DataFrame) =
        df.select(col("doc_a"), col("doc_b"), round(col("jaccard"), 9), col("src"))
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getString(3))).toSet
      val refInc = incSet(Dedup.incrementalNearDupPairs(
        Dedup.countedShingleIndex(odds, "doc_id", "text", 3, cap),
        Dedup.countedShingleIndex(evens, "doc_id", "text", 3, cap), 0.5))
      val gotInc = incSet(Dedup.incrementalNearDupPairsCollapsed(
        Dedup.collapsedIndex(odds, "doc_id", "text", 3, cap),
        Dedup.collapsedIndex(evens, "doc_id", "text", 3, cap), 0.5))
      assert(gotInc == refInc, s"incremental mismatch at cap=$cap: " +
        s"missing=${(refInc -- gotInc).take(5)} extra=${(gotInc -- refInc).take(5)}")
    }
  }

  test("SimHash: identical docs at Hamming 0, near-dups within 3") {
    val pairs = Dedup.simHashPairs(docs, "doc_id", "text", maxHamming = 3)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getInt(2))).toMap
    assert(pairs.get((0L, 3L)).contains(0)) // exact dup -> identical simhash
  }

  test("clusterRepresentatives: chains collapse to the component min, singletons self-label") {
    // Chain 1-2-3-4 (only adjacent pairs), star 10-{11,12}, singleton 20:
    // propagation needs diameter (3) rounds to pull 4 down to 1.
    val nodes = Seq(1L, 2L, 3L, 4L, 10L, 11L, 12L, 20L).toDF("id")
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L), (10L, 12L))
      .toDF("doc_a", "doc_b")
    val got = Dedup.clusterRepresentatives(nodes, "id", pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L))
    // Direction of pair ids must not matter.
    val flipped = Dedup.clusterRepresentatives(nodes, "id",
      pairs.select(col("doc_b").as("doc_a"), col("doc_a").as("doc_b")))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(flipped == got)
    // Exceeding the round guard must FAIL, never return partial labels
    // (distributed path forced — the driver fast path has no rounds).
    val e = intercept[IllegalStateException] {
      Dedup.clusterRepresentatives(nodes, "id", pairs, maxIters = 1,
        smallGraphEdges = 0L)
    }
    assert(e.getMessage.contains("maxIters"))
    // And the forced distributed path agrees with the fast path above.
    val dist = Dedup.clusterRepresentatives(nodes, "id", pairs,
        smallGraphEdges = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(dist == got)
  }

  test("clusterRepresentatives: pathological chain converges in O(log diameter) rounds") {
    // Chain of 33 nodes (diameter 32). Pure min-label propagation needs 32
    // rounds; the pointer-jumping shortcut must close it in
    // <= log2(32) + 1 = 6 rounds (including the no-change detection round).
    val n = 33
    val nodes = (1 to n).map(_.toLong).toDF("id")
    val pairs = (1 until n).map(i => (i.toLong, (i + 1).toLong)).toDF("doc_a", "doc_b")
    val (labels, rounds) =
      Dedup.clusterRepresentativesWithRounds(nodes, "id", pairs, maxIters = 10)
    val got = labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.values.toSet == Set(1L), "every chain node must label to the min id")
    assert(rounds <= 6, s"expected <= log2(d)+1 = 6 rounds, took $rounds")
  }

  test("clusterRepresentatives: diameter-2048 chain stays logarithmic, not linear") {
    // The O(log d) claim at depth: a chain of 2049 nodes (diameter 2048 —
    // the worst near-dup pair graph, e.g. a document drifting one edit at
    // a time). Pure propagation would need 2048 rounds and would trip any
    // practical guard; pointer jumping must close it in ~log2(2048) = 11
    // doubling rounds plus a constant (shortcut slack + the no-change
    // detection round). The bound asserted is log2(d) + 3; the default
    // guard of 25 rounds therefore covers diameters beyond 4 million.
    val n = 2049
    val nodes = (1 to n).map(_.toLong).toDF("id")
    val pairs = (1 until n).map(i => (i.toLong, (i + 1).toLong)).toDF("doc_a", "doc_b")
    val (labels, rounds) =
      Dedup.clusterRepresentativesWithRounds(nodes, "id", pairs, maxIters = 16)
    val got = labels.collect()
    assert(got.length == n)
    assert(got.forall(_.getLong(1) == 1L), "every chain node must label to the min id")
    assert(rounds <= 14, s"expected <= log2(2048)+3 = 14 rounds, took $rounds")
  }

  test("hot-shingle cap removes high-df shingles from the index") {
    val repeated = (0L until 20L).map(i => (i, "same same same same text")).toDF("doc_id", "text")
    val idx = Dedup.shingleIndex(repeated, "doc_id", "text", 3, maxDocFreq = 5L)
    assert(idx.count() == 0L) // every shingle appears in all 20 docs -> capped out
  }

  test("incremental CC equals full recompute, including cross-parity chains and a late-arriving min") {
    // Sliding 16-token windows, stride 4: adjacent docs share 12 tokens
    // (trigram Jaccard 10/18 >= 0.5), skip-one docs share 8 (6/22 < 0.5)
    // — a parity-ALTERNATING chain, so the history half alone has ZERO
    // edges and the entire component only exists once the batch bridges
    // it (the contraction's worst case). Doc 1 (batch) is an exact copy
    // of doc 10 (history), so the merged component's min arrives WITH
    // the batch and every history label must move. Docs 200/201 stay
    // singletons on each side.
    val chain = (0 until 16).map { i =>
      (10L + i, (4 * i until 4 * i + 16).map(k => s"w$k").mkString(" "))
    }
    val docs = (chain ++ Seq(
      (1L, chain.head._2),
      (200L, "lone even document with private vocabulary entirely"),
      (201L, "another isolated text sharing nothing with anything else here")))
      .toDF("doc_id", "text")

    val full = Dedup.clusterRepresentatives(docs.select(col("doc_id")), "doc_id",
      Dedup.ngramJaccardPairs(docs, "doc_id", "text", n = 3, threshold = 0.5,
        maxDocFreq = 100L))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    val hist = docs.where(col("doc_id") % 2 === 0)
    val batch = docs.where(col("doc_id") % 2 =!= 0)
    val prior = Dedup.clusterRepresentatives(hist.select(col("doc_id")), "doc_id",
      Dedup.ngramJaccardPairs(hist, "doc_id", "text", n = 3, threshold = 0.5,
        maxDocFreq = 100L))
    val pairs = Dedup.incrementalNearDupPairsCollapsed(
      Dedup.collapsedIndex(batch, "doc_id", "text", n = 3, maxDocFreq = 100L),
      Dedup.collapsedIndex(hist, "doc_id", "text", n = 3, maxDocFreq = 100L),
      threshold = 0.5)
    val inc = Dedup.clusterRepresentativesIncremental(prior,
        batch.select(col("doc_id")), "doc_id", pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    assert(inc == full)

    // The collapsed fold (batch pre-contracted through exact-dup
    // membership) must produce the identical labeling — doc 1 is an
    // exact copy of doc 10's text, but they sit in DIFFERENT halves, so
    // the contraction only collapses within-batch duplicates.
    val incCollapsed = Dedup.clusterRepresentativesIncrementalCollapsed(prior,
        Dedup.exactCollapse(batch, "doc_id", "text").membership
          .select(col("doc_id"), col("rep_id")),
        pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(incCollapsed == full)
    assert(full.values.toSet.contains(1L)) // the chain collapsed to the batch min
    assert(full(25L) == 1L && full(10L) == 1L)
    assert(full(200L) == 200L && full(201L) == 201L)

    // Batch-form path equivalence: clusterRepresentatives' driver
    // union-find fast path (default) must equal the distributed
    // WithRounds loop on the same graph.
    val batchPairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text", n = 3,
      threshold = 0.5, maxDocFreq = 100L)
    val viaFast = Dedup.clusterRepresentatives(docs.select(col("doc_id")),
        "doc_id", batchPairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaFast == full)

    // Path equivalence: the driver union-find fast path (default — this
    // graph is far under SmallGraphEdges) and the distributed
    // pointer-jumping loop (forced via smallGraphEdges = 0) must produce
    // the identical labeling.
    val incDistributed = Dedup.clusterRepresentativesIncrementalCollapsed(prior,
        Dedup.exactCollapse(batch, "doc_id", "text").membership
          .select(col("doc_id"), col("rep_id")),
        pairs, smallGraphEdges = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(incDistributed == incCollapsed)
  }

  test("prefixContainedDocs: proper prefixes only, dup-text-safe, partition-boundary-safe") {
    import spark.implicits._
    // "ab" is duplicated: the duplicate must not hide that "abc"
    // extends it (distinct-collapse before the adjacency probe), both
    // copies must be reported, and an exact duplicate alone ("zz") is
    // NOT a proper prefix.
    val docs = Seq(
      (1L, "ab"), (2L, "ab"), (3L, "abc"), (4L, "abcd"),
      (5L, "zz"), (6L, "zz"), (7L, "q")
    ).toDF("doc_id", "text")
    def run(df: org.apache.spark.sql.DataFrame) =
      Dedup.prefixContainedDocs(df, "doc_id", "text")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = Set((1L, 2L), (2L, 2L), (3L, 3L)) // ab x2, abc; abcd/zz/q not contained
    assert(run(docs) == expected)
    // Partition-boundary fix-up: with shuffle.partitions > distinct
    // texts, "abc"'s successor "abcd" lands in a different range
    // partition; the boundary map must still link them. Result must be
    // identical under any partitioning.
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "7")
      assert(run(docs.repartition(5)) == expected)
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  test("suffixContainedDocs: proper suffixes via reversed-prefix, n_chars is original length") {
    import spark.implicits._
    // "cd" is a suffix of "abcd"; "d" is a suffix of both (reported
    // once per doc); "ab" is a PREFIX, not a suffix; equal texts alone
    // are not proper suffixes.
    val docs = Seq(
      (1L, "abcd"), (2L, "cd"), (3L, "d"), (4L, "ab"),
      (5L, "xy"), (6L, "xy")
    ).toDF("doc_id", "text")
    val got = Dedup.suffixContainedDocs(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((2L, 2L), (3L, 1L)))
  }

  test("bandsForThreshold: divisor whose S-curve midpoint is closest to the target") {
    // Midpoints for numPerm = 32: b=2 -> 0.958, b=4 -> 0.841,
    // b=8 -> 0.595, b=16 -> 0.25 (exact), b=32 -> 0.031.
    assert(Dedup.bandsForThreshold(32, 0.5) == 8)   // production default
    assert(Dedup.bandsForThreshold(32, 0.6) == 8)
    assert(Dedup.bandsForThreshold(32, 0.25) == 16)
    assert(Dedup.bandsForThreshold(32, 0.95) == 2)
    assert(Dedup.bandsForThreshold(32, 0.05) == 32)
    // The knob is corpus-independent: nothing but (numPerm, threshold)
    // feeds it, matching the production default the recall gate pins.
    assert(Dedup.MinHashParams().bands ==
      Dedup.bandsForThreshold(Dedup.MinHashParams().numPerm, 0.5))
    intercept[IllegalArgumentException](Dedup.bandsForThreshold(32, 1.0))
    intercept[IllegalArgumentException](Dedup.bandsForThreshold(0, 0.5))
  }
}
