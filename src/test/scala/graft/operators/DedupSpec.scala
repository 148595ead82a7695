package graft.operators

import graft.{SparkTestBase, Tables}
import org.apache.spark.sql.functions._

class DedupSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val docs = Seq(
    (0L, "the quick brown fox jumps over the lazy dog today", "a"),
    (1L, "the quick brown fox jumps over the lazy dog today", "a"),      // exact dup of 0
    (2L, "the quick brown fox jumps over the lazy cat today", "a"),      // near dup of 0
    (3L, "completely different words about spark query engines here", "b"),
  ).toDF("doc_id", "text", "src")

  test("exactCanonical: dup maps to keeper, uniques map to self") {
    val out = Dedup.exactCanonical(docs).select("doc_id", "keeper", "is_dup")
      .as[(Long, Long, Boolean)].collect().map { case (a, b, c) => a -> ((b, c)) }.toMap
    assert(out(0L) == (0L, false))
    assert(out(1L) == (0L, true))    // exact dup → keeper 0
    assert(out(2L) == (2L, false))
    assert(out(3L) == (3L, false))
  }

  test("exactCanonicalBy: the keeper follows the preference, not the min id") {
    val srcDocs = Seq(
      (1L, "same text here", "web"),      // min id but LOW-trust source
      (2L, "same text here", "curated"),  // the policy keeper
      (3L, "same text here", "web"),
      (4L, "other text", "web"))
      .toDF("doc_id", "text", "source")
    val out = Dedup.exactCanonicalBy(srcDocs,
        preference = Seq(when(col("source") === "curated", 0).otherwise(1)))
      .select("doc_id", "keeper", "is_dup")
      .as[(Long, Long, Boolean)].collect().map { case (a, b, c) => a -> ((b, c)) }.toMap
    assert(out(1L) == (2L, true))   // min id LOSES to the curated copy
    assert(out(2L) == (2L, false))
    assert(out(3L) == (2L, true))
    assert(out(4L) == (4L, false))
    intercept[IllegalArgumentException] {
      Dedup.exactCanonicalBy(srcDocs, preference = Nil)
    }
  }

  test("containment finds the excerpt symmetric jaccard misses") {
    val longText = (1 to 40).map(i => s"w$i").mkString(" ")
    val corpus = Seq(
      (10L, longText, "a"),
      (11L, (1 to 8).map(i => s"w$i").mkString(" "), "a"), // 8-token excerpt
      (12L, "unrelated words entirely different from everything else", "a")
    ).toDF("doc_id", "text", "src")
    val got = Dedup.containmentPairsByBlock(corpus, "src", threshold = 0.8)
      .select($"contained_id", $"container_id", $"containment")
      .as[(Long, Long, Double)].collect()
    assert(got.length == 1)
    val (contained, container, c) = got.head
    assert(contained == 11L && container == 10L && c == 1.0)
    // the same pair under symmetric jaccard: 6 shared / 38 union ≈ 0.16
    val j = Dedup.jaccardPairsByBlock(corpus, "src")
      .filter($"a_id" === 10L && $"b_id" === 11L)
      .select($"jaccard").as[Double].head()
    assert(j < 0.2, s"jaccard $j should miss what containment catches")
  }

  test("containment direction: equal sizes break the tie on id") {
    val corpus = Seq(
      (20L, "alpha beta gamma delta epsilon", "a"),
      (21L, "alpha beta gamma delta epsilon", "a")
    ).toDF("doc_id", "text", "src")
    val got = Dedup.containmentPairsByBlock(corpus, "src", threshold = 0.8)
      .select($"contained_id", $"container_id").as[(Long, Long)].collect()
    assert(got.toSeq == Seq((20L, 21L)))
  }

  test("minhash candidates find exact+near dup pairs, skip unrelated") {
    val pairs = Dedup.minhashCandidatePairs(docs)
      .as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 1L)))           // identical → all bands match
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))  // unrelated doc never a candidate
  }

  test("nearDupsMinhash verifies candidates with exact jaccard") {
    val out = Dedup.nearDupsMinhash(docs, threshold = 0.9)
      .select("a_id", "b_id", "jaccard").as[(Long, Long, Double)].collect()
    assert(out.exists { case (a, b, j) => a == 0L && b == 1L && j == 1.0 })
  }

  test("nearDupsMinhashFromShingles is bit-identical to the text path at every signature width") {
    // no localCheckpoint here: the later cache-accounting tests count
    // persistent RDDs, and an async-cleaned checkpoint would skew them
    val shingled = Dedup.shingledTable(docs)
    for (h <- Seq(8, 16, 32)) {
      val direct = Dedup.nearDupsMinhash(docs, threshold = 0.0, numHashes = h, bands = 4)
        .select("a_id", "b_id", "jaccard").as[(Long, Long, Double)].collect().toSet
      val shared = Dedup.nearDupsMinhashFromShingles(shingled, threshold = 0.0,
          numHashes = h, bands = 4)
        .select("a_id", "b_id", "jaccard").as[(Long, Long, Double)].collect().toSet
      assert(shared == direct, s"sweep path diverges from text path at H=$h")
      // NO clearCache here: suites share the session and run in
      // parallel — a global cache clear races their cached frames
    }
  }

  test("prefix-sliced sweep (one maximal signature + shared verify) is bit-identical per width") {
    val shingled = Dedup.shingledTable(docs)
    val byWidth = Dedup.candidatePairsByWidth(shingled, widths = Seq(8, 16, 32), bands = 4)
    val verified = Dedup.verifyJaccardPairs(
      byWidth.map(_._2).reduce(_ unionByName _).distinct(), shingled)
    for ((h, cand) <- byWidth) {
      val direct = Dedup.nearDupsMinhash(docs, threshold = 0.0, numHashes = h, bands = 4)
        .select("a_id", "b_id", "jaccard").as[(Long, Long, Double)].collect().toSet
      val sliced = cand.join(verified, Seq("a_id", "b_id"))
        .select("a_id", "b_id", "jaccard").as[(Long, Long, Double)].collect().toSet
      assert(sliced == direct,
        s"prefix-sliced banding + shared verify diverges from the direct path at H=$h")
    }
  }

  test("nearDupsSimhash storage-backed signatures match the cached path, cache untouched") {
    val dir = java.nio.file.Files.createTempDirectory("graft-shsigs").toString
    try {
      val cachedBefore = spark.sparkContext.getPersistentRDDs.keySet
      val stored = Dedup.nearDupsSimhash(docs, storagePath = Some(dir + "/sigs"))
        .select("a_id", "b_id", "hamming").as[(Long, Long, Long)].collect().toSet
      // the storage path must not leak anything into the session cache —
      // subset, not size equality: ContextCleaner may collect DEAD
      // checkpoint blocks from earlier suites at any moment (shrinking
      // is fine; only NEW persists violate the contract)
      val cachedAfter = spark.sparkContext.getPersistentRDDs.keySet
      assert(cachedAfter.subsetOf(cachedBefore),
        s"storage path leaked persists: ${cachedAfter -- cachedBefore}")
      val cached = Dedup.nearDupsSimhash(docs)
        .select("a_id", "b_id", "hamming").as[(Long, Long, Long)].collect().toSet
      assert(cached == stored)
      assert(new java.io.File(dir + "/sigs").exists())
    } finally {
      spark.catalog.clearCache()
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("nearDupsMinhash storage-backed signature table matches the cached path") {
    val dir = java.nio.file.Files.createTempDirectory("graft-sigs").toString
    try {
      val cached = Dedup.nearDupsMinhash(docs, threshold = 0.3)
        .select("a_id", "b_id", "jaccard").as[(Long, Long, Double)].collect().toSet
      val stored = Dedup.nearDupsMinhash(docs, threshold = 0.3,
          storagePath = Some(dir + "/sigs"))
        .select("a_id", "b_id", "jaccard").as[(Long, Long, Double)].collect().toSet
      assert(cached == stored)
      assert(new java.io.File(dir + "/sigs").exists()) // artifact really on storage
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("signatureTable rejects bands that do not divide numHashes") {
    intercept[IllegalArgumentException] {
      Dedup.minhashCandidatePairs(docs, numHashes = 16, bands = 5)
    }
  }

  test("jaccardPairsByBlock computes exact jaccard via inverted index") {
    val out = Dedup.jaccardPairsByBlock(docs, "src")
      .select("a_id", "b_id", "jaccard").as[(Long, Long, Double)].collect()
    val j01 = out.find(p => p._1 == 0L && p._2 == 1L).map(_._3)
    assert(j01.contains(1.0))                      // identical docs → jaccard 1
    val j02 = out.find(p => p._1 == 0L && p._2 == 2L).map(_._3)
    assert(j02.exists(j => j > 0.4 && j < 1.0))    // near dup → partial overlap
    assert(!out.exists(p => p._2 == 3L))           // cross-block pair absent
  }

  test("simhash: identical docs identical, near dups within hamming 4") {
    def hamming(a: String, b: String): Int = a.zip(b).count { case (x, y) => x != y }
    val fp = Dedup.withSimhash(docs).select("doc_id", "simhash")
      .as[(Long, String)].collect().toMap
    assert(fp(0L) == fp(1L))
    assert(fp.values.forall(s => s.length == 16 && s.forall("01".contains(_))))
    assert(hamming(fp(0L), fp(2L)) <= 4)
    assert(hamming(fp(0L), fp(3L)) > 4)
  }

  test("nearDupsSimhash: banding recall is exact for hamming <= maxHamming") {
    import graft.functions.TextFunctions.simhash16Shingles
    val t = Tables(spark, sf0001)
    // brute-force truth: all pairs within hamming 2 of the shingle-simhash
    val fp = t.documents.select($"doc_id", simhash16Shingles($"text").as("sh"))
      .as[(Long, String)].collect()
    def hamming(a: String, b: String): Int = a.zip(b).count { case (x, y) => x != y }
    val truth = (for {
      (a, sa) <- fp; (b, sb) <- fp if a < b
      h = hamming(sa, sb) if h <= 2
    } yield (a, b, h.toLong)).toSet
    val funnel = Dedup.nearDupsSimhash(t.documents, maxHamming = 2, bands = 4, width = 16)
      .select("a_id", "b_id", "hamming").as[(Long, Long, Long)].collect().toSet
    assert(funnel == truth, "pigeonhole guarantee: banding must lose no pair")
    assert(truth.nonEmpty)
  }

  test("nearDupsSimhash width=64: banding recall is exact vs brute force") {
    import graft.functions.TextFunctions.simhash64Shingles
    val t = Tables(spark, sf0001)
    val fp = t.documents.select($"doc_id", simhash64Shingles($"text").as("sh"))
      .as[(Long, String)].collect()
    def hamming(a: String, b: String): Int = a.zip(b).count { case (x, y) => x != y }
    val truth = (for {
      (a, sa) <- fp; (b, sb) <- fp if a < b
      h = hamming(sa, sb) if h <= 2
    } yield (a, b, h.toLong)).toSet
    val funnel = Dedup.nearDupsSimhash(t.documents, maxHamming = 2, bands = 4, width = 64)
      .select("a_id", "b_id", "hamming").as[(Long, Long, Long)].collect().toSet
    assert(funnel == truth)
    // 64-bit fingerprints discriminate: far fewer collisions than 16-bit
    val truth16 = Dedup.nearDupsSimhash(t.documents, maxHamming = 2, bands = 4, width = 16).count()
    assert(truth.size < truth16)
  }

  test("nearDupsSimhash rejects parameters that void the recall guarantee") {
    intercept[IllegalArgumentException] {
      Dedup.nearDupsSimhash(docs, maxHamming = 4, bands = 4)
    }
    intercept[IllegalArgumentException] {
      Dedup.nearDupsSimhash(docs, maxHamming = 2, bands = 3)
    }
    intercept[IllegalArgumentException] {
      Dedup.nearDupsSimhash(docs, width = 32)
    }
  }

  test("embeddingNearDups finds the planted duplicate vector") {
    val emb = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f), 0),
      (1L, Array(0.999f, 0.04f, 0.0f), 0),   // near dup of 0
      (2L, Array(0.0f, 1.0f, 0.0f), 0),
      (3L, Array(1.0f, 0.0f, 0.0f), 1),      // same vector, different block
    ).toDF("vec_id", "embedding", "label")
    val out = Dedup.embeddingNearDups(emb, threshold = 0.95)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(out == Set((0L, 1L)))   // 0-2 orthogonal; 0-3 blocked apart
  }

  test("prefix-filtered jaccard join equals the exact path above the threshold") {
    val t = Tables(spark, sf0001)
    val exact = Dedup.jaccardPairsByBlock(t.documents, "lang")
      .filter($"jaccard" >= 0.3)
      .select("block", "a_id", "b_id", "jaccard")
      .as[(String, Long, Long, Double)].collect().toSet
    val prefixed = Dedup.jaccardPairsByBlockPrefix(t.documents, "lang", threshold = 0.3)
      .select("block", "a_id", "b_id", "jaccard")
      .as[(String, Long, Long, Double)].collect().toSet
    assert(exact == prefixed, "prefix filtering must not change the qualifying pair set")
    assert(exact.nonEmpty)
  }

  test("hot-block guard bounds pair generation, keeps planted near-dups") {
    // one pathological block: 60 vectors, two of them identical
    val vecs = (0 until 60).map { i =>
      val v = Array.tabulate(4)(j => math.sin(i * 17.0 + j * 3.0).toFloat)
      (i.toLong, v, 0)
    } :+ (100L, Array(1.0f, 0.5f, 0.25f, 0.125f), 0) :+
      (101L, Array(1.0f, 0.5f, 0.25f, 0.125f), 0)
    val emb = vecs.toDF("vec_id", "embedding", "label")
    // threshold -1 keeps every SCORED pair, so the output counts pairs generated
    val exactPairs = Dedup.embeddingNearDups(emb, threshold = -1.0, dim = 4).count()
    val guarded = Dedup.embeddingNearDups(emb, threshold = -1.0,
      maxBlockSize = 20, subPlanes = 3, dim = 4)
    val guardedPairs = guarded.count()
    assert(exactPairs == 62L * 61 / 2)
    assert(guardedPairs < exactPairs / 2,
      s"sub-bucketing should cut scored pairs sharply: $guardedPairs vs $exactPairs")
    // identical vectors hash to the same sub-bucket — still caught
    val ids = guarded.filter($"cos_sim" >= 0.999999)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(ids.contains((100L, 101L)))
    // small blocks stay exhaustive
    val small = Dedup.embeddingNearDups(emb, threshold = -1.0,
      maxBlockSize = 1000, subPlanes = 3, dim = 4).count()
    assert(small == exactPairs)
  }

  test("hot-block guard: measured recall on the real fixture, engaged everywhere") {
    // force the guard onto every block and quantify what the LSH
    // sub-bucketing trades: high-similarity pairs must ALL survive
    // (their hyperplane signs agree), total recall stays high
    val t = Tables(spark, sf0001)
    val threshold = 0.35
    val exact = Dedup.embeddingNearDups(t.embeddings, threshold)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    val guarded = Dedup.embeddingNearDups(t.embeddings, threshold,
        maxBlockSize = 10, subPlanes = 2)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(guarded.subsetOf(exact)) // guard only drops, never invents
    val recall = guarded.size.toDouble / exact.size
    assert(exact.nonEmpty && recall >= 0.5,
      s"recall $recall (${guarded.size}/${exact.size}) under engaged guard")
    // the near-identical pairs (cos >= 0.9) must all survive
    val hi = Dedup.embeddingNearDups(t.embeddings, 0.9)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(hi.subsetOf(guarded) || hi.isEmpty)
  }

  test("semanticDedup: planted copy lands in its original's cell and is pruned against it") {
    val t = Tables(spark, sf0001)
    // clone vector 3 under a fresh id: identical geometry → same cell,
    // cos 1.0 → dup_of the original (or an even earlier exact match)
    val v3 = t.embeddings.filter($"vec_id" === 3L)
      .select(lit(9001L).as("vec_id"), $"embedding", $"label")
    val out = Dedup.semanticDedup(t.embeddings.unionByName(v3), nCells = 8, threshold = 0.35)
    val clone = out.filter($"vec_id" === 9001L)
      .select("dup_of", "cos_sim", "is_dup")
      .as[(Option[Long], Option[Double], Boolean)].collect().head
    assert(clone._3, s"planted copy not marked dup: $clone")
    assert(clone._2.get >= 0.35)
    val cells = out.filter($"vec_id".isin(3L, 9001L)).select("cell")
      .as[Int].collect().toSet
    assert(cells.size == 1, "identical vectors must share a cell")
    // every dup decision references an earlier id and meets the threshold
    val dups = out.filter($"is_dup")
      .select("vec_id", "dup_of", "cos_sim").as[(Long, Long, Double)].collect()
    assert(dups.nonEmpty)
    assert(dups.forall(d => d._2 < d._1 && d._3 >= 0.35))
  }

  test("sf0.001 fixture: minhash funnel matches all-pairs jaccard truth") {
    val t = Tables(spark, sf0001)
    val truth = Dedup.jaccardPairsByBlock(t.documents.withColumn("all", lit(1)), "all")
      .filter($"jaccard" >= 0.5).select("a_id", "b_id")
      .as[(Long, Long)].collect().toSet
    val funnel = Dedup.nearDupsMinhash(t.documents, threshold = 0.5)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    // at jaccard ≥ 0.5 with 16 hashes / 4 bands, recall should be total
    assert(truth == funnel)
  }
}
