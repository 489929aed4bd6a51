package graft.entry

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ml.{Ann, Bpe, Dedup, Incremental, Packing, Sampling, Sketch, TextStats}
import graft.sources.Derived
import graft.images.{Audio, Images, Video}

/**
 * Training-data pipeline queries (dedup / similarity search / text
 * analysis / multimodal) over documents + embeddings, with DuckDB oracle
 * twins for every deterministic op. Approximate/binary ops (SimHash over
 * xxhash64, LSH ANN probing, image decode) are rows-only checked here and
 * property-tested in ScalaTest.
 */
object MlQueries {

  val JaccardMaxId = 200L
  val JaccardThreshold = 0.7
  val MinhashMaxId = 200L
  /** d11 incremental near-dup: corpus cut + refine threshold (30 genuine
   *  >= 0.7 shingle-Jaccard pairs exist in the first 500 docs at sf0.01). */
  val NearMaxId = 1000L
  val NearThreshold = 0.7
  /** d8: spans of 5 tokens (production ExactSubstr uses ~50; 5 keeps the
   *  sf0.01 signal nondegenerate — 1,096 duplicated spans across 71 docs). */
  val SpanK = 5
  /** d9: 4-token overlap vs the benchmark cut (38/470 contaminated at
   *  sf0.01 — sparse but nonempty, like a real eval-suite leak). */
  val DecontamK = 4
  /** d9 benchmark cut: doc_id % 17 == 0 plays the eval suite. */
  val DecontamMod = 17
  /** e7 PQ shape: 8 subspaces x 16 centroids over dim 64, 2 Lloyd rounds
   *  (fixed, so the oracle can unroll them). */
  val PqNsub = 8
  val PqKsub = 16
  val PqIters = 2
  /** e8 IVF-PQ coarse shape: 4 lists, 2 Lloyd rounds (fixed → SQL-unrollable
   *  like the fine codebook). */
  val IvfPqNlist = 4
  val IvfPqCoarseIters = 2
  val CosinePairBits = 8
  /** x7 training-mix rates: downsample the dominant language, keep most of
   *  the rest, near-drop unidentified text. */
  val SampleRates: Map[String, Double] =
    Map("en" -> 0.5, "de" -> 0.8, "fr" -> 0.8, "es" -> 0.8)
  val SampleDefaultRate = 0.1
  val SampleSalt = "mix1"
  /** x12: tokens per training shard — ~10 docs/shard at the corpus's ~54
   *  tokens/doc, so boundaries land mid-stream and the off/shard math is
   *  exercised on every row. */
  val PackBudget = 512L
  /** b1/b2: BPE merge rounds — enough to chain merges (later merges consume
   *  earlier merge outputs as single symbols) while keeping the unrolled
   *  SQL oracle readable. */
  val BpeRounds = 6
  /** x15 semantic-decontamination threshold. Membership margin (nearest
   *  pair-cos to the cut): 4.6e-3 at sf0.01 / 2.4e-4 at sf0.1; nearest cos6
   *  rounding boundary 7.7e-10 / 1.1e-10 in cos units — both orders above
   *  cross-engine float-summation noise (~1e-13). 9 matched pairs at
   *  sf0.01 — sparse but nonempty, like d9's span leak. */
  val SemanticThreshold = 0.25
  /** x13: heavy-hitter parameter (count·K > total) — the corpus's 31 terms
   *  sit at 3.2–3.6% each, so the 1/30 cut splits the vocabulary mid-pack
   *  AND forces real Misra-Gries counter evictions (31 items > 30
   *  counters). */
  val HeavyK = 30
  /** Nearest observed pair-cosine is 8e-4 (sf0.01) / 5.9e-7 (sf0.1) from
   *  this cut, and the nearest cos6 rounding boundary is 2.7e-10 away in
   *  cos units — both orders beyond cross-engine float-summation noise
   *  (~1e-13), so membership and quantization are engine-stable. */
  val CosinePairThreshold = 0.3

  private def docs(s: SparkSession, dir: String) =
    s.read.parquet(s"$dir/documents.parquet")
  private def emb(s: SparkSession, dir: String) =
    s.read.parquet(s"$dir/embeddings.parquet")

  /** Scratch root for the ingest-state queries (d10/d11/e9/x18), which
   *  delete and rebuild their state EVERY run (nothing persists across
   *  invocations — the ingest sequence IS the query). Placement follows
   *  the Bench.localDir rationale: this VM's ext4 charges heavy kernel
   *  time to many-small-file writes (a 500-file shard stage pays seconds
   *  of commit-rename latency), which measures the disk, not the engine —
   *  tmpfs when available, `SPARK_GRAFT_LOCAL_DIR` overrides, plain
   *  java.io.tmpdir otherwise. Production ingest state lives on durable
   *  storage; the constant-factor wall of the write path is unchanged. */
  private def scratchRoot: String =
    sys.env.get("SPARK_GRAFT_LOCAL_DIR").getOrElse {
      val shm = java.nio.file.Paths.get("/dev/shm")
      if (java.nio.file.Files.isWritable(shm)) "/dev/shm/graft-state"
      else System.getProperty("java.io.tmpdir")
    }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // D1: exact dedup (hash groupBy), deterministic keep rule
    "d1_dedup_exact" -> ((s, dir) =>
      Dedup.exact(docs(s, dir), "doc_id", "text").orderBy(col("keep_id"))),

    // D2: n-gram (3-char shingle) Jaccard near-dup pairs — exact path
    "d2_jaccard" -> ((s, dir) =>
      Dedup.jaccardPairs(docs(s, dir).filter(col("doc_id") < JaccardMaxId),
          "doc_id", "text", 3, JaccardThreshold)
        .orderBy(col("id1"), col("id2"))),

    // D3: MinHash+LSH candidate pairs (16 hashes, 4 bands x 4)
    "d3_minhash" -> ((s, dir) =>
      Dedup.minhashCandidates(
        Dedup.minhashSignatures(docs(s, dir).filter(col("doc_id") < MinhashMaxId),
          "doc_id", "text"))
        .orderBy(col("id1"), col("id2"))),

    // D4: SimHash signatures over the cross-engine md5-60-bit term hash —
    // the full signature pipeline (tokenize -> hash -> ±1 bit sums ->
    // majority pack) gets a value-level DuckDB oracle. The production
    // xxhash64/64-bit basis is the same plan (Dedup.simhash) and is
    // spec-tested in DedupSpec.
    "d4_simhash" -> ((s, dir) =>
      Dedup.simhashWith(docs(s, dir), "doc_id", "text", Dedup.md5Hash60, 60)
        .orderBy(col("doc_id"))),

    // D6: near-dup CLUSTERS — connected components over the minhash
    // candidate-pair graph (distributed min-label propagation, the step a
    // dedup pipeline runs after banding), keep = min doc_id per component
    "d6_dup_clusters" -> ((s, dir) => {
      val d = docs(s, dir).filter(col("doc_id") < MinhashMaxId)
      val pairs = Dedup.minhashCandidates(
        Dedup.minhashSignatures(d, "doc_id", "text"))
      Dedup.dupClusters(d, "doc_id", pairs).orderBy(col("doc_id"))
    }),

    // D8: exact duplicated-span statistics (ExactSubstr dedup signal, Lee
    // et al. 2022 re-expressed relationally) — per doc: span counts,
    // duplicated-span occurrences, and the merged-interval token coverage a
    // span remover would cut. Fully value-level oracled.
    "d8_span_dedup" -> ((s, dir) =>
      Dedup.spanDupStats(docs(s, dir), "doc_id", "text", SpanK)
        .orderBy(col("doc_id"))),

    // D8b: the CUT stage of ExactSubstr dedup — keep each duplicated span's
    // globally-first occurrence, cut every position covered by a non-kept
    // duplicated occurrence, rebuild the text from surviving tokens.
    // Byte-identical text oracle (the x8_redact discipline).
    "d8b_span_cut" -> ((s, dir) =>
      Dedup.spanRemove(docs(s, dir), "doc_id", "text", SpanK)
        .orderBy(col("doc_id"))),

    // D9: benchmark decontamination (GPT-3/PaLM-style n-gram overlap): the
    // doc_id % 17 == 0 cut plays the eval suite; every other doc is flagged
    // with its count of distinct overlapping k-token spans. The benchmark
    // span set is broadcast — training spans never shuffle for the join.
    "d9_decontam" -> ((s, dir) => {
      val d = docs(s, dir)
      Dedup.decontaminate(
          d.filter(col("doc_id") % DecontamMod =!= 0),
          d.filter(col("doc_id") % DecontamMod === 0),
          "doc_id", "text", DecontamK)
        .orderBy(col("doc_id"))
    }),

    // D10: INCREMENTAL exact dedup — the corpus arrives in three batches
    // (split by doc_id mod 3, with deterministic exact-dup replicas: +same-
    // batch under shift 9999999 ≡ 0 mod 3, +cross-batch under 10000000 ≡ 1)
    // and each ingest dedups against persisted bucketed state — history
    // never re-shuffles (Incremental's scaladoc; plan-asserted in
    // IncrementalSpec). Accepted = first batch containing the text wins,
    // min id within that batch — so a replica arriving in an EARLIER batch
    // beats the original, the arrival-order semantics the oracle's
    // ROW_NUMBER-over-batch reproduces. State is rebuilt fresh per run
    // (the ingest sequence IS the query).
    "d10_incr_dedup" -> ((s, dir) => {
      val stateDir = s"$scratchRoot/graft-incr-state-" +
        f"${dir.hashCode & 0x7fffffff}%08x"
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(stateDir))
      val base = docs(s, dir).select(col("doc_id"), col("text"))
      val all = base
        .unionByName(base.filter(col("doc_id") % 5 === 0)
          .select((col("doc_id") + 9999999L).as("doc_id"), col("text")))
        .unionByName(base.filter(col("doc_id") % 7 === 0)
          .select((col("doc_id") + 10000000L).as("doc_id"), col("text")))
      (0 until 3).map { k =>
        Incremental.ingestExact(s, stateDir, s"b$k",
            all.filter(col("doc_id") % 3 === k), "doc_id", "text")
          .select(lit(k).as("batch"), col("id").as("doc_id"), col("n_dups"))
      }.reduce(_ unionByName _).orderBy(col("doc_id"))
    }),

    // D11: INCREMENTAL NEAR-dup dedup — d10's minhash twin: three batches
    // (doc_id mod 3 over the doc_id < NearMaxId cut), each banding-probed
    // against the persisted signature index of previously ACCEPTED docs and
    // exact-Jaccard-refined against only the candidate partners (state text
    // fetched by doc_id semi-join, never rescanned). Pinned semantics: a
    // doc drops if a refined (>= 0.7) candidate with a smaller id shares
    // its batch, or if any accepted earlier-batch doc refines — which the
    // oracle unrolls as three acceptance CTEs over the one global
    // banding+refine pair list.
    "d11_incr_near_dedup" -> ((s, dir) => {
      val stateDir = s"$scratchRoot/graft-incrn-state-" +
        f"${dir.hashCode & 0x7fffffff}%08x"
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(stateDir))
      val d = docs(s, dir).filter(col("doc_id") < NearMaxId)
        .select(col("doc_id"), col("text"))
      (0 until 3).map { k =>
        Incremental.ingestMinhash(s, stateDir, s"b$k",
            d.filter(col("doc_id") % 3 === k), "doc_id", "text", NearThreshold)
          .select(lit(k).as("batch"), col("doc_id"))
      }.reduce(_ unionByName _).orderBy(col("doc_id"))
    }),

    // D7: thumbnail → catalog reverse lookup (perceptual image dedup).
    // Both sides are fingerprinted map-side with the SAME function (aHash
    // of the 2×2-box 8×8 matrix — bytes never shuffle), candidates come
    // from the 4×16-bit band equi-join (recall-EXACT for hamming <= 3 by
    // pigeonhole), then a pixel-level refine kills fingerprint collisions.
    // Foreign thumbnails (no catalog source) probe precision. Oracled
    // value-for-value on the lossless half: DuckDB re-derives fingerprints
    // AND the pixel-equality refine from the seeds alone. The mixed-codec
    // run and the maxBucket production cap are ThumbMatchSpec territory.
    "d7_thumb_match" -> ((s, dir) =>
      Images.thumbMatch(
          Images.imageTable(s, dir).filter(col("fmt") === "png"),
          Images.thumbTable(s, dir).filter(col("fmt") === "png"),
          hamMax = 3, maxBucket = None, lossyTol = 0)
        .orderBy(col("thumb_id"), col("image_id"))),

    // X11: composed decontaminate -> span-cut chain — the two new stages as
    // a real pipeline, not a join of query outputs: training docs sharing
    // any eval-suite k-gram are DROPPED, then ExactSubstr span removal runs
    // over the SURVIVOR set (dup spans recounted post-drop). Byte-identical
    // text oracle end to end.
    "x11_decontam_cut" -> ((s, dir) => {
      val d = docs(s, dir)
      val train = d.filter(col("doc_id") % DecontamMod =!= 0)
      val bench = d.filter(col("doc_id") % DecontamMod === 0)
      val cleanIds = Dedup.decontaminate(train, bench, "doc_id", "text", DecontamK)
        .filter(!col("contaminated")).select(col("doc_id"))
      // spanRemove scans its input three times (span table, token table,
      // final doc join) — materialize the survivor set once so the whole
      // decontamination subtree isn't recomputed per scan (the
      // Curation.filterStage barrier pattern; measured 6.4 s -> ~1 s sf0.1)
      val survivors = train.join(cleanIds, Seq("doc_id"), "left_semi")
        .localCheckpoint(eager = true)
      Dedup.spanRemove(survivors, "doc_id", "text", SpanK)
        .orderBy(col("doc_id"))
    }),

    // E1: exact brute-force cosine top-k vs the vec_id=1 embedding
    "e1_cosine_topk" -> ((s, dir) => {
      val e = emb(s, dir)
      val q = e.filter(col("vec_id") === 1)
        .select(col("embedding").cast("array<double>")).head().getSeq[Double](0)
      e.select(col("vec_id"),
          Derived.q4(Ann.cosineLit(col("embedding").cast("array<double>"), q)).as("cos4"))
        .orderBy(desc("cos4"), col("vec_id")).limit(10)
    }),

    // E2: LSH-bucketed approximate top-k. The hyperplanes are deterministic
    // integer arithmetic (Ann.hyperplane), so the WHOLE approximate path —
    // signatures, multiprobe bucket set, in-bucket exact rank — has a
    // value-level DuckDB twin; recall vs brute force is asserted in AnnSpec.
    "e2_ann_lsh" -> ((s, dir) => {
      val e = emb(s, dir)
      val dim = e.select(size(col("embedding"))).head().getInt(0)
      val q = e.filter(col("vec_id") === 1)
        .select(col("embedding").cast("array<double>")).head().getSeq[Double](0)
      Ann.lshTopK(Ann.lshBuckets(e, "vec_id", "embedding", 12, dim), q, 10, 12)
        .select(col("vec_id"), col("cos6"))
    }),

    // E4: embedding-cosine near-dup pairs, LSH-bucketed self-join (the
    // scale path: pairs only form inside a bucket). Deterministic buckets
    // make the approximate operator fully oracle-checkable.
    "e4_cosine_pairs" -> ((s, dir) => {
      val e = emb(s, dir)
      val dim = e.select(size(col("embedding"))).head().getInt(0)
      Ann.cosinePairs(Ann.lshBuckets(e, "vec_id", "embedding", CosinePairBits, dim),
          CosinePairThreshold)
        .orderBy(col("id1"), col("id2"))
    }),

    // E7: product quantization (PQ) + asymmetric-distance (ADC) scoring —
    // the classic memory-bound ANN index (8 subspaces x 16 centroids over
    // the 64-dim corpus, 2 Lloyd iterations). Deterministic seeds (portable
    // integer rank hash) + a FIXED iteration count make the whole k-means
    // training run SQL-re-derivable: the oracle unrolls both Lloyd rounds
    // as CTEs and re-derives every code and every ADC distance. Per-vector
    // output: positional code checksum (value-checks all 8 codes) + adc6.
    "e7_pq_adc" -> ((s, dir) => {
      val e = emb(s, dir)
      val q = e.filter(col("vec_id") === 1)
        .select(col("embedding").cast("array<double>")).head().getSeq[Double](0)
      val cents = Ann.pqCentroids(e, "vec_id", "embedding", PqNsub, PqKsub, PqIters)
      Ann.pqAdc(Ann.pqAssign(e, "vec_id", "embedding", cents), cents, q)
        .select(col("vec_id"),
          aggregate(zip_with(col("codes"),
              sequence(lit(1), size(col("codes"))), (c, i) => c * i),
            lit(0L), (a, x) => a + x).as("chk"),
          Derived.q6(col("adc")).as("adc6"))
        .orderBy(col("vec_id"))
    }),

    // E8: IVF-PQ — the composed Faiss-style ANN index: coarse quantizer
    // (4 lists), residual product quantization (8×16), asymmetric-distance
    // scoring with a PER-LIST query lut. Full probe makes the whole
    // two-level training run + every code + every ADC deterministic; the
    // oracle unrolls BOTH k-means levels (the coarse one is PQ with a
    // single whole-vector subspace). Partial-probe recall and the
    // residual-vs-flat quantization-error win are AnnSpec territory.
    "e8_ivfpq" -> ((s, dir) => {
      val e = emb(s, dir)
      val q = e.filter(col("vec_id") === 1)
        .select(col("embedding").cast("array<double>")).head().getSeq[Double](0)
      val (index, coarse, fine) = Ann.ivfPqIndex(e, "vec_id", "embedding",
        IvfPqNlist, IvfPqCoarseIters, PqNsub, PqKsub, PqIters)
      Ann.ivfPqAdc(index, coarse, fine, q, 0 until IvfPqNlist)
        .select(col("vec_id"), col("list"),
          aggregate(zip_with(col("codes"),
              sequence(lit(1), size(col("codes"))), (c, i) => c * i),
            lit(0L), (a, x) => a + x).as("chk"),
          Derived.q6(col("adc")).as("adc6"))
        .orderBy(col("vec_id"))
    }),

    // E6: embedding near-dup CLUSTERS — the clustering step after e4's
    // LSH-bucketed cosine pairs (the embedding twin of d6): connected
    // components over the pair graph, keep = min vec_id. Oracled against an
    // independent recursive-CTE transitive closure over the same SQL-derived
    // pair set.
    "e6_embed_clusters" -> ((s, dir) => {
      val e = emb(s, dir)
      val dim = e.select(size(col("embedding"))).head().getInt(0)
      val pairs = Ann.cosinePairs(
          Ann.lshBuckets(e, "vec_id", "embedding", CosinePairBits, dim),
          CosinePairThreshold)
        .select(col("id1"), col("id2"))
      Dedup.dupClusters(e.select(col("vec_id")), "vec_id", pairs)
        .select(col("doc_id").as("vec_id"), col("keep_id"))
        .orderBy(col("vec_id"))
    }),

    // E3: IVF (inverted-file) approximate top-k — full probe (nprobe =
    // nlist) equals brute force EXACTLY, which gives this approximate op a
    // deterministic oracle; the partial-probe scale path is recall-tested
    // in AnnSpec
    "e3_ann_ivf" -> ((s, dir) => {
      val e = emb(s, dir)
      val q = e.filter(col("vec_id") === 1)
        .select(col("embedding").cast("array<double>")).head().getSeq[Double](0)
      val cents = Ann.ivfCentroids(e, "vec_id", "embedding", nlist = 8, iters = 2)
      val assigned = Ann.ivfAssign(e, "vec_id", "embedding", cents)
      Ann.ivfTopK(assigned, cents, q, k = 10, nprobe = 8)
    }),

    // E9: IVF index MAINTENANCE — append WITHOUT retraining: the index is
    // trained and persisted on the first half of the corpus only
    // (vec_id < 250), then the rest arrives in two appended batches,
    // assigned against the STORED centroids (one broadcast-argmin pass
    // over the new vectors — history never rescanned) into delta list
    // tables. Full probe (nprobe = nlist) over base + deltas must equal
    // brute force over the WHOLE corpus — the e3 oracle trick, which makes
    // the append path value-checkable with zero dependence on the k-means
    // seeds. Store rebuilt fresh per run (the append sequence IS the query).
    "e9_ivf_append" -> ((s, dir) => {
      val storeDir = s"$scratchRoot/graft-ivfapp-" +
        f"${dir.hashCode & 0x7fffffff}%08x"
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(storeDir))
      val e = emb(s, dir)
      val q = e.filter(col("vec_id") === 1)
        .select(col("embedding").cast("array<double>")).head().getSeq[Double](0)
      val base = e.filter(col("vec_id") < 250)
      val cents = Ann.ivfCentroids(base, "vec_id", "embedding", nlist = 8, iters = 2)
      graft.ml.AnnStore.writeIvf(s, storeDir,
        Ann.ivfAssign(base, "vec_id", "embedding", cents), cents)
      graft.ml.AnnStore.appendIvf(s, storeDir, "b1",
        e.filter(col("vec_id") >= 250 && col("vec_id") % 2 === 0), "vec_id", "embedding")
      graft.ml.AnnStore.appendIvf(s, storeDir, "b2",
        e.filter(col("vec_id") >= 250 && col("vec_id") % 2 === 1), "vec_id", "embedding")
      graft.ml.AnnStore.ivfFromStore(s, storeDir, q, k = 10, nprobe = 8)
    }),

    // E5: SQ8 scalar quantization of the embedding corpus (the ANN-index
    // memory-reduction step) — per-dim min/max, broadcast-joined codes,
    // summarized per vector as a positional checksum + clip count so the
    // whole 64-dim code table is value-checked row by row in DuckDB
    // (double arithmetic is identical cross-engine: min/max + one
    // subtract/multiply/divide chain, no float sums)
    "e5_quantize_sq8" -> ((s, dir) =>
      Ann.quantizeSq8(emb(s, dir), "vec_id", "embedding")
        .groupBy(col("vec_id"))
        .agg(sum((col("j") + 1) * col("code")).as("chk"),
          min(col("code")).as("code_min"), max(col("code")).as("code_max"),
          sum(when(col("code") === 0 || col("code") === 255, 1L)
            .otherwise(0L)).as("n_clip"))
        .orderBy(col("vec_id"))),

    // F18: distributed decode -> deterministic resize -> lossless re-encode
    // over the binary column, VERIFIED row-by-row: the output png bytes are
    // decoded back and compared against the resize of the re-derived source
    // matrix — exact for png-origin rows (2x2 box average, DuckDB-derivable),
    // bounded-deviation for jpeg-origin rows (measured max 6, bound 16; the
    // raw jpeg bytes are additionally decoded by the independent Python
    // baseline-JPEG decoder in tools/image_twin.py)
    "f18_image_resize" -> ((s, dir) =>
      Images.resizeVerify(Images.resize(Images.imageTable(s, dir), 8, 8),
          Images.W, Images.H, lossyTol = 16)
        .orderBy(col("image_id"))),

    // F18b: the resize chain's exact VALUES on the lossless half — decode
    // the resized png output and emit channel means ×10⁴ + the positional
    // checksum of the matrix; DuckDB re-derives both through the 2x2 box
    // average from doc_id (the resize arithmetic is integer-exact)
    "f18b_resize_png" -> ((s, dir) =>
      Images.resizedValues(Images.resize(
          Images.imageTable(s, dir).filter(col("fmt") === "png"), 8, 8))
        .orderBy(col("image_id"))),

    // F19: per-image feature extraction over the MIXED table, verified
    // row-by-row against the re-derived matrix: exact for png, bounded for
    // jpeg (mean dev <= 3 gray levels, measured max 0.92; aHash hamming
    // <= 24, measured max 12). The exact VALUES for the png half are
    // oracled by f19b below.
    "f19_image_features" -> ((s, dir) =>
      Images.featuresVerify(Images.imageTable(s, dir), meanTol4 = 30000, hamTol = 24)
        .orderBy(col("image_id"))),

    // X1: language ID heuristic
    "x1_langid" -> ((s, dir) =>
      TextStats.langId(docs(s, dir), "doc_id", "text").orderBy(col("doc_id"))),

    // X2: quality scoring
    "x2_quality" -> ((s, dir) =>
      TextStats.quality(docs(s, dir), "doc_id", "text").orderBy(col("doc_id"))),

    // X3: token counting (whitespace + BPE-ish regex)
    "x3_token_counts" -> ((s, dir) =>
      TextStats.tokenCounts(docs(s, dir), "doc_id", "text").orderBy(col("doc_id"))),

    // X4: document fingerprint (position-weighted checksum)
    "x4_fingerprint" -> ((s, dir) =>
      TextStats.fingerprint(docs(s, dir), "doc_id", "text").orderBy(col("doc_id"))),

    // X5: corpus-LM (bigram stupid-backoff) average log-prob per document —
    // LM-based quality filtering, fully distributed (counts are shuffles,
    // scoring is equi-joins; no driver-side model)
    "x5_lm_score" -> ((s, dir) =>
      TextStats.lmScore(docs(s, dir), "doc_id", "text").orderBy(col("doc_id"))),

    // X6: duplicate word-3-gram fraction (Gopher-style repetition filter)
    "x6_repetition" -> ((s, dir) =>
      TextStats.repetition(docs(s, dir), "doc_id", "text").orderBy(col("doc_id"))),

    // X7: deterministic hash-ticket stratified sampling by predicted
    // language — training-mix re-weighting, reproducible across engines,
    // runs and partitionings
    "x7_sample" -> ((s, dir) =>
      Sampling.stratifiedSample(
          docs(s, dir).withColumn("lang_pred", TextStats.langIdCol(col("text"))),
          "doc_id", col("lang_pred"), SampleRates, SampleDefaultRate, SampleSalt)
        .select(col("doc_id"), col("lang_pred"))
        .orderBy(col("doc_id"))),

    // X8: PII/identifier redaction (emails, long digit runs) — the
    // standard curation scrub, per-row regexp chain, byte-compared twin
    "x8_redact" -> ((s, dir) =>
      TextStats.redact(docs(s, dir), "doc_id", "text").orderBy(col("doc_id"))),

    // F17: image decode + per-row invariant (input_hint: decoded pixels
    // exact for png / PSNR >= 40 dB for jpeg, caption byte-equality) over
    // the MIXED table. The verdict columns are value-level oracled (DuckDB
    // derives the all-true expectation per row); the raw psnr4 VALUE is
    // codec-dependent for jpeg and is oracled on the png half as f17b;
    // the jpeg bytes are independently re-decoded by tools/image_twin.py's
    // from-scratch baseline-JPEG decoder, closing the self-verification
    // loop cross-implementation.
    "f17_image_verify" -> ((s, dir) => {
      val imgs = Images.imageTable(s, dir)
      Images.decodeVerify(imgs, docs(s, dir))
        .select(col("image_id"), col("fmt"), col("pixels_ok"), col("caption_ok"))
        .orderBy(col("image_id"))
    }),

    // F17b: the lossless half of the decode-verify invariant, value-level
    // oracled — PNG decode must reproduce the expected pixel matrix EXACTLY
    // (psnr4 = sentinel 9999999, pixels_ok, caption_ok), which DuckDB can
    // assert by re-deriving the matrix arithmetically from doc_id
    "f17b_verify_png" -> ((s, dir) => {
      val imgs = Images.imageTable(s, dir).filter(col("fmt") === "png")
      Images.decodeVerify(imgs, docs(s, dir)).orderBy(col("image_id"))
    }),

    // F19b: feature extraction over the DECODED png pixels — channel means
    // and aHash get an exact DuckDB twin (decoded == derived matrix for the
    // lossless format), so the decode→feature path is engine-independently
    // value-checked; f19 keeps the mixed-format rows-only run
    "f19b_features_png" -> ((s, dir) =>
      Images.features(Images.imageTable(s, dir).filter(col("fmt") === "png"))
        .orderBy(col("image_id"))),

    // F20: deterministic augmentation (flip/rotate by (id/2)%4) over the
    // DECODED lossless half — the training-pipeline augmentation stage.
    // Value-level oracled: the transform is an index permutation, so
    // DuckDB re-derives the positional checksum by permuting the weights
    // over the px CTE (means are permutation-invariant). The mixed run
    // rides on the same decode path; involution properties in ImagesSpec.
    "f20_augment_png" -> ((s, dir) =>
      Images.augment(Images.imageTable(s, dir).filter(col("fmt") === "png"))
        .orderBy(col("image_id"))),

    // X9: the COMPOSED curation pipeline end to end — redact → quality/
    // repetition gate → near-dup cluster collapse → stratified sample —
    // one oracled query over the final kept set (the checkpointed-stage
    // variant with resume is Curation.run, asserted in PipelineSpec)
    "x9_curation_e2e" -> ((s, dir) =>
      graft.ml.Curation.plan(docs(s, dir)).orderBy(col("doc_id"))),

    // X10: COMPOSED multimodal curation — the image+caption twin of x9:
    // corrupt-image gate (decode inside the chk pass), caption-quality
    // gate (same quality4 >= QualityMin as the text chain), then
    // DECODE-LEVEL image dedup (positional checksum of the decoded
    // matrix), which collapses byte-identical re-labels AND cross-codec
    // lossless re-saves of lossy images — the dup class byte hashing
    // misses. Keep = min image_id per cluster (originals sort first).
    // The oracle re-derives the kept set and each cluster's size
    // structurally (gate from text, dup classes from the id arithmetic)
    // — it never needs the codec-dependent jpeg checksum values.
    "x10_mm_curation" -> ((s, dir) => {
      // single-pass synthesis: imageTable ∪ resaveTable(imageTable)
      // re-encoded every source image twice (RDD lineage referenced twice);
      // the fused table is row-identical and the query only aggregates
      val all = Images.imageTableWithResaves(s, dir)
      val keys = Images.decodeChk(all)
        .withColumn("doc_id", substring(col("image_id"), 5, 12).cast("long"))
      val okDocs = docs(s, dir)
        .select(col("doc_id"), TextStats.qualityScoreCol(col("text")).as("q"))
        .filter(round(col("q") * 10000).cast("long") >= graft.ml.Curation.QualityMin)
        .select(col("doc_id"))
      keys.join(okDocs, Seq("doc_id"))
        .groupBy(col("chk"))
        .agg(min(col("image_id")).as("image_id"),
          min(col("doc_id")).as("doc_id"), count(lit(1)).as("n_dup"))
        .select(col("image_id"), col("doc_id"), col("n_dup"))
        .orderBy(col("image_id"))
    }),

    // F21: the audio payload — synthesize WAV bytes, DECODE them
    // partition-parallel, extract per-clip features. Value-level oracled:
    // the integer-only synthesis lets DuckDB re-derive every feature from
    // doc_id alone, so the whole encode->decode->feature path is checked
    // cross-engine (the audio twin of the PNG pixel path)
    "f21_audio_features" -> ((s, dir) =>
      Audio.features(Audio.audioTable(s, dir)).orderBy(col("audio_id"))),

    // G2: image table tile assignment from phash-derived coordinates —
    // value-level oracled end to end: DuckDB re-derives phash (LCG pixels →
    // gray → 8x8 aHash, 64-bit wraparound emulated in HUGEINT) and the
    // Morton cell from doc_id in pure SQL (imagePixelCtes)
    "g2_image_tiles" -> ((s, dir) =>
      Images.withGeo(Images.imageTable(s, dir))
        .select(col("image_id"), col("phash"), col("cell")).orderBy(col("image_id"))),

    // F22: the video payload — synthesize RIFF/AVI clips (MPNG/MJPG
    // frames), DECODE the containers partition-parallel, verify the
    // input_hint invariant lifted to clips: every frame exact (mpng) /
    // PSNR >= 40 dB (mjpg), container metadata equality, caption equality.
    // The verdict columns AND n_frames are value-level oracled; the mjpg
    // bytes are independently re-decoded by tools/video_twin.py's Python
    // AVI walker + from-scratch baseline-JPEG decoder.
    "f22_video_verify" -> ((s, dir) =>
      Video.decodeVerify(Video.videoTable(s, dir), docs(s, dir))
        .orderBy(col("video_id"))),

    // F22b: frame-sampling (every 3rd frame) + per-frame features over the
    // DECODED pixels, exact VALUES on the lossless half — DuckDB re-derives
    // each sampled frame's channel means from the frame seed vid*64+k
    "f22b_frames_png" -> ((s, dir) =>
      Video.frameFeatures(
          Video.videoTable(s, dir).filter(col("fmt") === "avi-mpng"))
        .orderBy(col("video_id"), col("frame_idx"))),

    // F23: per-clip motion proxy over consecutive sampled frames (static-
    // clip filtering) — integer-exact on the lossless half, value-oracled
    // end to end through container decode -> frame decode -> gray means
    "f23_video_motion" -> ((s, dir) =>
      Video.motion(
          Video.videoTable(s, dir).filter(col("fmt") === "avi-mpng"))
        .orderBy(col("video_id"))),

    // X12: token-budget shard packing — the global running-offset scan as a
    // distributed two-pass prefix sum (range partition -> per-partition
    // totals -> parallel local windows + driver prefix). The DuckDB oracle
    // computes the SAME offsets with a single-threaded global window; the
    // distributed plan must agree on every row. PackingSpec asserts the
    // plan contains no SinglePartition exchange (the naive form does).
    "x12_pack_shards" -> ((s, dir) =>
      Packing.tokenBudgetShards(
          docs(s, dir).select(col("doc_id"),
            size(Derived.tokens(col("text"))).as("toks")),
          "doc_id", "toks", PackBudget)
        .orderBy(col("doc_id"))),

    // X18: INCREMENTAL shard packing — the export-end member of the
    // incremental family: three id-range batches append to a persisted
    // packed stream, each batch's offsets shifted by the stream total, so
    // the combined layout is IDENTICAL to x12's one-shot pack over the
    // whole corpus — which is exactly what the oracle checks (same SQL as
    // x12: every off/shard must line up across the batch boundaries, the
    // incremental path's whole correctness claim). History shards are
    // never rewritten; each batch stages PARTITIONED BY shard.
    "x18_incr_pack" -> ((s, dir) => {
      val stateDir = s"$scratchRoot/graft-incrp-state-" +
        f"${dir.hashCode & 0x7fffffff}%08x"
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(stateDir))
      val t = docs(s, dir).select(col("doc_id"),
        size(Derived.tokens(col("text"))).cast("long").as("toks"))
      Seq(("b0", col("doc_id") < 170),
          ("b1", col("doc_id") >= 170 && col("doc_id") < 340),
          ("b2", col("doc_id") >= 340))
        .map { case (nm, pred) =>
          Incremental.ingestPack(s, stateDir, nm, t.filter(pred),
            "doc_id", "toks", PackBudget)
        }.reduce(_ unionByName _).orderBy(col("doc_id"))
    }),

    // X15: SEMANTIC decontamination — the embedding twin of d9: a training
    // vector is flagged iff it cosine-matches any eval-suite vector above
    // the threshold. Cross-set LSH-bucketed match (pairs only form inside
    // a bucket — the right set is an eval suite but the plan never assumes
    // it is small); deterministic hyperplanes make the whole approximate
    // path value-level oracle-able, like e2/e4.
    "x15_semantic_decontam" -> ((s, dir) => {
      val e = emb(s, dir)
      val dim = e.select(size(col("embedding"))).head().getInt(0)
      val bucketed = Ann.lshBuckets(e, "vec_id", "embedding", CosinePairBits, dim)
      Ann.cosineMatch(
          bucketed.filter(col("vec_id") % DecontamMod =!= 0),
          bucketed.filter(col("vec_id") % DecontamMod === 0),
          SemanticThreshold)
        .groupBy(col("id1").as("vec_id"))
        .agg(count(lit(1)).as("n_matches"), max(col("cos6")).as("max_cos6"))
        .orderBy(col("vec_id"))
    }),

    // X14: exact per-language quality quantiles (threshold selection for a
    // filtering pipeline) via the bounded-domain value histogram — one
    // corpus shuffle, the cumulative window runs over <= langs x 10001
    // histogram rows, never the corpus; nearest-rank in pure integer
    // arithmetic, so the oracle is bit-exact with no rounding margins.
    "x14_quality_quantiles" -> ((s, dir) =>
      TextStats.groupQuantiles(
          docs(s, dir).select(
            concat_ws("|", TextStats.langIdCol(col("text")),
              (size(Derived.tokens(col("text"))).cast("long") / 20)
                .cast("long").cast("string")).as("grp"),
            Derived.q4(TextStats.qualityScoreCol(col("text"))).as("q4")),
          "grp", "q4", Seq((1, 2), (9, 10), (99, 100)))
        .select(col("grp"), col("n"), col("p1_2").as("p50"),
          col("p9_10").as("p90"), col("p99_100").as("p99"))
        .orderBy(col("grp"))),

    // X16: exact per-language quantiles over a CONTINUOUS quality score —
    // the general (unbounded-domain) path x14's bounded-integer histogram
    // contract cannot serve. The cumulative count comes from a Packing-
    // style two-pass distributed prefix scan over the (group, value)
    // histogram, so no window ever partitions by the group over raw rows
    // (plan-asserted in SketchSpec). The score is q6-quantized before the
    // quantile purely for cross-engine float determinism (~10^6-point
    // domain — decisively past any bounded-histogram contract); outputs
    // requantize the selected double for hash-stable compare.
    "x16_quantiles_general" -> ((s, dir) =>
      TextStats.groupQuantilesGeneral(
          docs(s, dir).select(
            TextStats.langIdCol(col("text")).as("lang"),
            (Derived.q6(TextStats.qualityScoreCol(col("text"))).cast("double") / 1e6)
              .as("score")),
          "lang", "score", Seq((1, 2), (9, 10), (99, 100)))
        .select(col("lang"), col("n"),
          Derived.q6(col("p1_2")).as("p50_6"),
          Derived.q6(col("p9_10")).as("p90_6"),
          Derived.q6(col("p99_100")).as("p99_6"))
        .orderBy(col("lang"))),

    // X13: exact heavy hitters via a mergeable Misra-Gries sketch + exact
    // verify rescan — the full-cardinality groupBy never happens (pass 1
    // moves <= k rows per partition to the driver, pass 2 shuffles only
    // candidate rows), yet the output is EXACT, so the DuckDB twin is a
    // plain GROUP BY + HAVING.
    "x13_heavy_terms" -> ((s, dir) =>
      Sketch.heavyHitters(Derived.docTerms(s, dir).select(col("term")),
          "term", HeavyK)
        .orderBy(col("term"))),

    // B1: BPE merge training over the term-frequency dictionary — one
    // corpus aggregation, then vocabulary-bounded rounds. Every trained
    // merge (pair AND its frequency) is re-derived by the oracle, which
    // unrolls all rounds as SQL CTEs (pair counts, argmax tie-break,
    // double-replace application).
    "b1_bpe_merges" -> ((s, dir) => {
      val (merges, _) =
        Bpe.train(Bpe.dictionary(docs(s, dir), Derived.tokens(col("text"))),
          BpeRounds)
      import s.implicits._
      merges.toDF("merge_rank", "lft", "rgt", "freq").orderBy(col("merge_rank"))
    }),

    // B2: BPE tokenization — per-doc symbol count after applying the
    // trained merges (broadcast dictionary join; the corpus shuffles only
    // on the final doc-level aggregation).
    "b2_bpe_tokens" -> ((s, dir) => {
      val d = docs(s, dir)
      val (_, trained) =
        Bpe.train(Bpe.dictionary(d, Derived.tokens(col("text"))), BpeRounds)
      Bpe.tokenize(d, "doc_id", Derived.tokens(col("text")), trained)
        .orderBy(col("doc_id"))
    }),

    // X17: the composed training-data EXPORT chain — BPE tokenization (b2)
    // feeds the shard packer (x12), so shard budgets count REAL tokenizer
    // units (bpe_len) rather than whitespace-ish tokens: the step a
    // pipeline ends with before `Packing.writeShards` emits the at-rest
    // PARTITIONED-BY-shard training data (write + directory pruning
    // spec'd in PackingSpec over this exact chain). Oracle: the b2 CTEs
    // compute per-doc bpe_len, then the x12 single-threaded global window
    // recomputes every offset/shard the distributed prefix scan assigned.
    "x17_bpe_pack" -> ((s, dir) => {
      val d = docs(s, dir)
      val (_, trained) =
        Bpe.train(Bpe.dictionary(d, Derived.tokens(col("text"))), BpeRounds)
      Packing.tokenBudgetShards(
          Bpe.tokenize(d, "doc_id", Derived.tokens(col("text")), trained)
            .select(col("doc_id"), col("bpe_len")),
          "doc_id", "bpe_len", PackBudget)
        .orderBy(col("doc_id"))
    })
  )

  // ---- oracle SQL ----------------------------------------------------------

  private val T = Derived.tokensSql _

  private def shingleCte(maxId: Long): String =
    s"""d AS (SELECT doc_id, lower(text) AS t FROM documents WHERE doc_id < $maxId),
       |sh AS (SELECT DISTINCT doc_id,
       |  unnest(list_transform(range(1, len(t) - 1), i -> substr(t, CAST(i AS INTEGER), 3))) AS s
       |  FROM d WHERE len(t) >= 3)""".stripMargin

  /** sig/bands/pairs CTEs — the DuckDB twin of minhashSignatures +
   *  minhashCandidates over an in-scope `sh`(doc_id, s) shingle CTE. */
  private def minhashSigBandCtes: String = {
    import Dedup.MinHash._
    val code = codeSql("s")
    val hs = (0 until NumHashes).map(i =>
      s"MIN((CAST($code AS BIGINT) * ${A(i)} + ${B(i)}) % $P) AS h$i").mkString(",\n    ")
    val nBands = NumHashes / BandSize
    val bandSelects = (0 until nBands).map { b =>
      val key = (0 until BandSize).map(j => s"CAST(h${b * BandSize + j} AS VARCHAR)")
        .mkString(" || ',' || ")
      s"SELECT doc_id, $b AS band, $key AS band_key FROM sig"
    }.mkString("\n  UNION ALL\n  ")
    s"""sig AS (SELECT doc_id,
       |    $hs
       |  FROM sh GROUP BY doc_id),
       |bands AS (
       |  $bandSelects),
       |pairs AS (SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2
       |  FROM bands a JOIN bands b
       |    ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id)""".stripMargin
  }

  /** Shared CTE chain ending in `pairs`(id1, id2) — the DuckDB twin of
   *  minhashSignatures + minhashCandidates, reused by d3 (the pair list)
   *  and d6 (components over the pair graph). */
  private def minhashPairCtes: String =
    s"""${shingleCte(MinhashMaxId)},
       |$minhashSigBandCtes""".stripMargin

  private def minhashSql: String =
    s"""WITH $minhashPairCtes
       |SELECT id1, id2 FROM pairs ORDER BY id1, id2""".stripMargin

  /**
   * DuckDB twin of [[Ann.pqCentroids]] + [[Ann.pqAssign]] + [[Ann.pqAdc]]:
   * the fixed-iteration k-means training run UNROLLED — seeds by the
   * portable rank hash, then per round: distance join (sv x centroids),
   * argmin assignment (row_number ties to the smallest centroid index,
   * matching the Spark UDF's strict `<`), per-(s, ci, ld) means, and the
   * empty-cluster COALESCE keep rule. Codes are a final assignment against
   * the round-[[PqIters]] codebook; ADC re-derives the query lut. The
   * smallest cross-engine-sensitive margin (best-vs-second-best assignment
   * distance and adc6 rounding boundary) is orders above double-summation
   * noise — verified by the gate on every run.
   */
  // d$i/a$i: distance join + argmin assignment against codebook `prev`
  // (row_number ties to the smallest centroid index, matching the Spark
  // UDF's strict `<`)
  private def pqAssignCtes(p: String, src: String, i: Int, prev: String): String =
    s"""${p}d$i AS (SELECT sv.vec_id, sv.s, c.ci, SUM((sv.x - c.x)*(sv.x - c.x)) AS dist
       |  FROM $src sv JOIN $prev c ON sv.s = c.s AND sv.ld = c.ld GROUP BY 1, 2, 3),
       |${p}a$i AS (SELECT vec_id, s, ci FROM (SELECT vec_id, s, ci,
       |    row_number() OVER (PARTITION BY vec_id, s ORDER BY dist, ci) AS rn FROM ${p}d$i) ${p}t$i
       |  WHERE rn = 1)""".stripMargin

  /**
   * Unrolled PQ k-means training over an in-scope subvector CTE
   * `$src`(vec_id, s, ld, x) and the shared seed ranks `ord`(vec_id, rk) —
   * the generator behind BOTH e7 (flat PQ) and e8 (each IVF-PQ level:
   * the coarse quantizer is PQ with one whole-vector subspace). Emits
   * `${p}c0` (seeds), per round `${p}d$i`/`${p}a$i` (assignment),
   * `${p}m$i`/`${p}c$i` (means + empty-cluster keep rule), and the final
   * assignment `${p}a${iters+1}` against `${p}c$iters`.
   */
  private def pqRoundCtes(p: String, src: String, ksub: Int, iters: Int): String = {
    def update(i: Int, prev: String): String =
      s"""${p}m$i AS (SELECT a.s, a.ci, sv.ld, AVG(sv.x) AS x
         |  FROM ${p}a$i a JOIN $src sv ON sv.vec_id = a.vec_id AND sv.s = a.s GROUP BY 1, 2, 3),
         |${p}c$i AS (SELECT c.s, c.ci, c.ld, COALESCE(m.x, c.x) AS x
         |  FROM $prev c LEFT JOIN ${p}m$i m ON m.s = c.s AND m.ci = c.ci AND m.ld = c.ld)""".stripMargin
    val seeds =
      s"""${p}c0 AS (SELECT sv.s, CAST(o.rk AS INTEGER) AS ci, sv.ld, sv.x
         |  FROM $src sv JOIN ord o USING (vec_id) WHERE o.rk < $ksub)""".stripMargin
    val rounds = (1 to iters)
      .map(i => pqAssignCtes(p, src, i, s"${p}c${i - 1}") + ",\n" + update(i, s"${p}c${i - 1}"))
      .mkString(",\n")
    Seq(seeds, rounds,
      pqAssignCtes(p, src, iters + 1, s"${p}c$iters")).mkString(",\n")
  }

  /** Shared header: vectors, the sub=dim/nsub subvector layout, and the
   *  portable seed ranks. */
  private def pqHeaderCtes: String = {
    val sub = 64 / PqNsub
    s"""e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |sv AS (SELECT vec_id, CAST(d // $sub AS INTEGER) AS s, CAST(d % $sub AS INTEGER) AS ld,
       |    v[CAST(d AS INTEGER) + 1] AS x
       |  FROM e, (SELECT unnest(range(64)) AS d) dd),
       |ord AS (SELECT vec_id,
       |    row_number() OVER (ORDER BY (vec_id * 2654435761) % 4294967296, vec_id) - 1 AS rk
       |  FROM e)""".stripMargin
  }

  private def pqOracleSql: String = {
    val fin = PqIters + 1
    s"""$pqHeaderCtes,
       |${pqRoundCtes("", "sv", PqKsub, PqIters)},
       |qsv AS (SELECT s, ld, x FROM sv WHERE vec_id = 1),
       |lut AS (SELECT c.s, c.ci, SUM((q.x - c.x)*(q.x - c.x)) AS dist
       |  FROM c$PqIters c JOIN qsv q ON q.s = c.s AND q.ld = c.ld GROUP BY 1, 2),
       |adc AS (SELECT a.vec_id, SUM(l.dist) AS adc
       |  FROM a$fin a JOIN lut l ON l.s = a.s AND l.ci = a.ci GROUP BY 1),
       |chk AS (SELECT vec_id, CAST(SUM((s + 1) * ci) AS BIGINT) AS chk
       |  FROM a$fin GROUP BY 1)""".stripMargin
  }

  /**
   * DuckDB twin of [[Ann.ivfPqIndex]] + [[Ann.ivfPqAdc]] at full probe:
   * coarse k-means unrolled with prefix `g` over the whole-vector layout
   * `gsv` (one subspace, ksub = nlist), residual subvectors `rsv` =
   * sv − assigned coarse centroid, fine PQ unrolled with prefix `f` over
   * `rsv`, then per-LIST query-residual lookup tables and the summed ADC.
   * Ends with `glist`(vec_id, list), `chk8`, `adc8`.
   *
   * Cross-engine margins (measured at sf0.1, 2000 vectors): coarse argmin
   * best-vs-second gap >= 6.4e-5, fine (residual) argmin gap >= 6.7e-7,
   * adc6 rounding-boundary distance >= 6.4e-10 in adc units — all orders
   * above double-summation order noise (~1e-15), so assignments and
   * quantization are engine-stable.
   */
  private def ivfPqOracleSql: String = {
    val sub = 64 / PqNsub
    val gfin = IvfPqCoarseIters + 1
    val ffin = PqIters + 1
    s"""$pqHeaderCtes,
       |gsv AS (SELECT vec_id, 0 AS s, CAST(d AS INTEGER) AS ld,
       |    v[CAST(d AS INTEGER) + 1] AS x
       |  FROM e, (SELECT unnest(range(64)) AS d) dd),
       |${pqRoundCtes("g", "gsv", IvfPqNlist, IvfPqCoarseIters)},
       |glist AS (SELECT vec_id, ci AS list FROM ga$gfin),
       |rsv AS (SELECT sv.vec_id, sv.s, sv.ld, sv.x - gc.x AS x
       |  FROM sv JOIN glist USING (vec_id)
       |  JOIN gc$IvfPqCoarseIters gc ON gc.s = 0 AND gc.ci = glist.list
       |    AND gc.ld = sv.s * $sub + sv.ld),
       |${pqRoundCtes("f", "rsv", PqKsub, PqIters)},
       |qv AS (SELECT s, ld, x FROM sv WHERE vec_id = 1),
       |qr AS (SELECT g.ci AS list, q.s, q.ld, q.x - g.x AS x
       |  FROM qv q JOIN gc$IvfPqCoarseIters g ON g.s = 0 AND g.ld = q.s * $sub + q.ld),
       |lut8 AS (SELECT r.list, c.s, c.ci, SUM((r.x - c.x)*(r.x - c.x)) AS dist
       |  FROM qr r JOIN fc$PqIters c ON c.s = r.s AND c.ld = r.ld GROUP BY 1, 2, 3),
       |adc8 AS (SELECT a.vec_id, SUM(l.dist) AS adc
       |  FROM fa$ffin a JOIN glist gl ON gl.vec_id = a.vec_id
       |  JOIN lut8 l ON l.list = gl.list AND l.s = a.s AND l.ci = a.ci GROUP BY 1),
       |chk8 AS (SELECT vec_id, CAST(SUM((s + 1) * ci) AS BIGINT) AS chk
       |  FROM fa$ffin GROUP BY 1)""".stripMargin
  }

  /** DuckDB twin of [[Ann.lshSignature]]: hyperplane h(j,d) =
   *  ((j*73856093 + d*19349663 + 83492791) % 2000001)/1e6 - 1 (pure integer
   *  arithmetic — identical in both engines), bucket bit j set iff
   *  dot(v, h_j) > 0. The smallest observed |dot| is ~5.7e-5, five orders
   *  above cross-engine float-summation noise, so the sign never flips.
   *  Yields CTEs `e`(vec_id, v) and `sig`(vec_id, bucket). */
  private def lshSigCtes(nBits: Int): String =
    s"""e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |hp AS (SELECT j, d,
       |    (((j*73856093 + d*19349663 + 83492791) % 2000001) / 1000000.0 - 1.0) AS h
       |  FROM (SELECT unnest(range($nBits)) AS j),
       |       (SELECT unnest(range((SELECT MAX(len(embedding)) FROM embeddings))) AS d)),
       |dots AS (SELECT e.vec_id, hp.j, SUM(e.v[CAST(hp.d AS INTEGER) + 1] * hp.h) AS dot
       |  FROM e, hp GROUP BY 1, 2),
       |sig AS (SELECT vec_id,
       |    SUM(CASE WHEN dot > 0 THEN (1::BIGINT << CAST(j AS INTEGER)) ELSE 0 END) AS bucket
       |  FROM dots GROUP BY 1)""".stripMargin

  /**
   * CTE chain re-deriving the synthetic image table's pixel statistics from
   * doc_id in PURE SQL — the DuckDB twin of [[Images.pixels]] (LCG-seeded
   * channel gradients), [[Images.phash]] (8x8 aHash) and [[Images.withGeo]]
   * (phash → lat/lon → Morton cell). 64-bit wraparound arithmetic is
   * emulated in HUGEINT (s*M+C mod 2^64); `(s >>> 40) & 0xff` becomes
   * `// 2^40 % 256` on the unsigned residue. Ends with CTEs:
   *   feats(id, mean_r4, mean_g4, mean_b4)  — channel means ×10000
   *   ph(id, p)                             — phash as unsigned HUGEINT
   *   mort(id, p, m)                        — Morton interleave of tile x/y
   * Validated cell-for-cell against the engine (g2/f19b correctness gate).
   */
  private def imagePixelCtes: String =
    pixelCtes("ids AS (SELECT doc_id AS id FROM documents)")

  /** Same CTE chain over an arbitrary seed set: `idsCte` must define a CTE
   *  named `ids` with a column `id` (one row per pixel matrix to derive —
   *  doc ids for the image table, [[Video.frameSeed]] values for video
   *  frames). */
  private def pixelCtes(idsCte: String): String = {
    val M = "6364136223846793005"; val C = "1442695040888963407"
    val T64 = "18446744073709551616"
    val lcg = (1 to 9).map { k =>
      val prev = if (k == 1) "lcg0" else s"lcg${k - 1}"
      s"lcg$k AS (SELECT id, (s * $M + $C) % $T64 AS s, " +
        s"CAST(((s * $M + $C) % $T64) // 1099511627776 % 256 AS BIGINT) AS v FROM $prev)"
    }.mkString(",\n")
    s"""$idsCte,
       |lcg0 AS (SELECT id, ((CAST(id AS HUGEINT) * $M + $C) % $T64 + $T64) % $T64 AS s FROM ids),
       |$lcg,
       |params AS (SELECT lcg1.id, lcg1.v AS r0, lcg2.v AS g0, lcg3.v AS b0,
       |    lcg4.v % 9 - 4 AS rx, lcg5.v % 9 - 4 AS ry, lcg6.v % 9 - 4 AS gx,
       |    lcg7.v % 9 - 4 AS gy, lcg8.v % 9 - 4 AS bx, lcg9.v % 9 - 4 AS by
       |  FROM lcg1 JOIN lcg2 USING(id) JOIN lcg3 USING(id) JOIN lcg4 USING(id)
       |    JOIN lcg5 USING(id) JOIN lcg6 USING(id) JOIN lcg7 USING(id)
       |    JOIN lcg8 USING(id) JOIN lcg9 USING(id)),
       |px AS (SELECT id, i % 16 AS x, i // 16 AS y,
       |    least(greatest(r0 + rx*(i%16) + ry*(i//16), 0), 255) AS r,
       |    least(greatest(g0 + gx*(i%16) + gy*(i//16), 0), 255) AS g,
       |    least(greatest(b0 + bx*(i%16) + by*(i//16), 0), 255) AS b
       |  FROM params, (SELECT unnest(range(256)) AS i)),
       |feats AS (SELECT id, CAST(SUM(r)*10000 // 256 AS BIGINT) AS mean_r4,
       |    CAST(SUM(g)*10000 // 256 AS BIGINT) AS mean_g4,
       |    CAST(SUM(b)*10000 // 256 AS BIGINT) AS mean_b4 FROM px GROUP BY id),
       |gray AS (SELECT id, x, y, (r*299 + g*587 + b*114) // 1000 AS gv FROM px),
       |hcells AS (SELECT id, x // 2 AS cx, y // 2 AS cy, SUM(gv) // 4 AS cv
       |  FROM gray GROUP BY 1, 2, 3),
       |hmean AS (SELECT id, SUM(cv) // 64 AS mean FROM hcells GROUP BY 1),
       |ph AS (SELECT c.id,
       |    SUM(CASE WHEN c.cv > hm.mean
       |        THEN CAST(1 AS HUGEINT) << CAST(c.cy*8 + c.cx AS INTEGER) ELSE 0 END) AS p
       |  FROM hcells c JOIN hmean hm ON c.id = hm.id GROUP BY c.id),
       |geo AS (SELECT id, p,
       |    -8.0 + 2.0 * (CAST(p // 4294967296 AS DOUBLE) / 4294967296.0) AS lat,
       |    106.0 + 5.0 * (CAST(p % 4294967296 AS DOUBLE) / 4294967296.0) AS lon
       |  FROM ph),
       |txy AS (SELECT id, p,
       |    CAST(least(greatest(floor((lon + 180.0) / 360.0 * 8192), 0), 8191) AS BIGINT) AS tx,
       |    CAST(least(greatest(floor((lat + 90.0) / 180.0 * 8192), 0), 8191) AS BIGINT) AS ty
       |  FROM geo),
       |mort AS (SELECT id, p, CAST(SUM(
       |      ((tx >> CAST(b AS INTEGER)) & 1) * (CAST(1 AS BIGINT) << CAST(2*b AS INTEGER)) +
       |      ((ty >> CAST(b AS INTEGER)) & 1) * (CAST(1 AS BIGINT) << CAST(2*b + 1 AS INTEGER))
       |    ) AS BIGINT) AS m
       |  FROM txy, (SELECT unnest(range(13)) AS b) GROUP BY id, p),
       |rpx AS (SELECT id, x // 2 AS rx, y // 2 AS ry,
       |    SUM(r) // 4 AS r, SUM(g) // 4 AS g, SUM(b) // 4 AS b
       |  FROM px GROUP BY 1, 2, 3),
       |rfeat AS (SELECT id,
       |    CAST(SUM(r) * 10000 // 64 AS BIGINT) AS mean_r4,
       |    CAST(SUM(g) * 10000 // 64 AS BIGINT) AS mean_g4,
       |    CAST(SUM(b) * 10000 // 64 AS BIGINT) AS mean_b4,
       |    CAST(SUM((ry*8 + rx + 1) * (r*65536 + g*256 + b)) AS BIGINT) AS chk
       |  FROM rpx GROUP BY id)""".stripMargin
  }

  /** DuckDB twin of [[Audio.samples]] + [[Audio.features]]: 3 LCG draws →
   *  (period, phase, amp, slope), sawtooth + position-hash noise per
   *  sample (pure integer arithmetic), then peak / zero-crossings / rms
   *  over the derived sample set. Ends with CTE
   *  afeat(id, peak, zero_crossings, rms2). */
  private def audioCtes: String = {
    val M = "6364136223846793005"; val C = "1442695040888963407"
    val T64 = "18446744073709551616"
    val lcg = (1 to 3).map { k =>
      val prev = if (k == 1) "alcg0" else s"alcg${k - 1}"
      s"alcg$k AS (SELECT id, (s * $M + $C) % $T64 AS s, " +
        s"CAST(((s * $M + $C) % $T64) // 1099511627776 % 256 AS BIGINT) AS v FROM $prev)"
    }.mkString(",\n")
    s"""aids AS (SELECT doc_id AS id FROM documents),
       |alcg0 AS (SELECT id, ((CAST(id AS HUGEINT) * $M + $C) % $T64 + $T64) % $T64 AS s FROM aids),
       |$lcg,
       |aparams AS (SELECT alcg1.id, 20 + alcg1.v % 93 AS period,
       |    alcg2.v % (20 + alcg1.v % 93) AS phase, 2000 + alcg3.v * 100 AS amp,
       |    (2 * (2000 + alcg3.v * 100)) // (20 + alcg1.v % 93) AS slope
       |  FROM alcg1 JOIN alcg2 USING(id) JOIN alcg3 USING(id)),
       |asamp AS (SELECT id, i,
       |    least(greatest(
       |      ((i + phase) % period) * slope - amp +
       |      CAST(((i*i*2654435761 + id*40503) % 4294967296) // 16777216 AS BIGINT) - 128,
       |      -32768), 32767) AS v
       |  FROM aparams, (SELECT unnest(range(${Audio.NumSamples})) AS i)),
       |afeat AS (SELECT a.id,
       |    CAST(MAX(abs(a.v)) AS INTEGER) AS peak,
       |    CAST(SUM(CASE WHEN b.v IS NOT NULL AND a.v * b.v < 0 THEN 1 ELSE 0 END) AS INTEGER)
       |      AS zero_crossings,
       |    CAST(round(sqrt(SUM(a.v * a.v) / ${Audio.NumSamples}.0) * 100) AS BIGINT) AS rms2
       |  FROM asamp a LEFT JOIN asamp b ON b.id = a.id AND b.i = a.i - 1
       |  GROUP BY a.id)""".stripMargin
  }

  /** Seed-set CTE for the video-frame oracles: one `id` per SAMPLED frame
   *  of every lossless (even-id) clip — id = vid*[[Video.MaxFrames]]+k for
   *  k < numFrames(vid), k % EveryN == 0. Spliced into [[pixelCtes]]. */
  private def videoFrameIdsCte: String =
    s"""vids AS (SELECT doc_id AS vid, 6 + doc_id % 5 AS nf
       |  FROM documents WHERE doc_id % 2 = 0),
       |ids AS (SELECT vid * ${Video.MaxFrames} + k AS id
       |  FROM vids, (SELECT unnest(range(10)) AS k)
       |  WHERE k < nf AND k % ${Video.EveryN} = 0)""".stripMargin

  /** 'img_%012d' — the image_id format of [[Images.imageTable]]. */
  private val imageIdSql = "'img_' || lpad(CAST(id AS VARCHAR), 12, '0')"
  /** unsigned HUGEINT phash `p` → the signed 64-bit value Spark stores. */
  private val signedPhashSql =
    "CAST(CASE WHEN p >= 9223372036854775808 THEN p - 18446744073709551616 ELSE p END AS BIGINT)"

  /** Seed set for the d7 oracle: the lossless catalog (even doc ids) plus
   *  the foreign-thumbnail seeds (even, doc_id % 7 == 3, offset by
   *  [[Images.ForeignSeedOffset]]). Spliced into [[pixelCtes]]; the
   *  derived-thumbnail seeds are a subset of the catalog ids. */
  private def thumbIdsCte: String =
    s"""ids AS (SELECT doc_id AS id FROM documents WHERE doc_id % 2 = 0
       |  UNION ALL
       |  SELECT doc_id + ${Images.ForeignSeedOffset} AS id FROM documents
       |  WHERE doc_id % 2 = 0 AND doc_id % 7 = 3)""".stripMargin

  val oracles: Map[String, String] = Map(
    "d7_thumb_match" ->
      s"""WITH ${pixelCtes(thumbIdsCte)},
         |rgray AS (SELECT id, ry * 8 + rx AS idx,
         |    (r * 299 + g * 587 + b * 114) // 1000 AS gv FROM rpx),
         |rmean AS (SELECT id, SUM(gv) // 64 AS m FROM rgray GROUP BY id),
         |rph AS (SELECT g.id, SUM(CASE WHEN g.gv > rm.m
         |    THEN CAST(1 AS HUGEINT) << CAST(g.idx AS INTEGER) ELSE 0 END) AS p
         |  FROM rgray g JOIN rmean rm ON g.id = rm.id GROUP BY g.id),
         |rfp AS (SELECT id, $signedPhashSql AS fp FROM rph),
         |cat AS (SELECT id, fp FROM rfp WHERE id < ${Images.ForeignSeedOffset}),
         |th AS (SELECT id, fp FROM rfp
         |  WHERE id >= ${Images.ForeignSeedOffset} OR id % 3 != 2),
         |cand AS (SELECT t.id AS tid, c.id AS cid,
         |    CAST(bit_count(xor(t.fp, c.fp)) AS INTEGER) AS hamming
         |  FROM th t, cat c WHERE bit_count(xor(t.fp, c.fp)) <= 3),
         |okp AS (SELECT cand.tid, cand.cid, cand.hamming FROM cand
         |  JOIN rpx pt ON pt.id = cand.tid
         |  JOIN rpx pc ON pc.id = cand.cid AND pc.rx = pt.rx AND pc.ry = pt.ry
         |  GROUP BY 1, 2, 3
         |  HAVING MAX(greatest(abs(pt.r - pc.r), abs(pt.g - pc.g),
         |    abs(pt.b - pc.b))) = 0)
         |SELECT 'th_' || lpad(CAST(tid AS VARCHAR), 12, '0') AS thumb_id,
         |  'img_' || lpad(CAST(cid AS VARCHAR), 12, '0') AS image_id, hamming
         |FROM okp ORDER BY thumb_id, image_id""".stripMargin,

    "x10_mm_curation" ->
      s"""WITH q AS (SELECT doc_id,
         |    ${TextStats.qualitySqlSelect("text").last}
         |  FROM documents),
         |ok AS (SELECT doc_id FROM q
         |  WHERE quality4 >= ${graft.ml.Curation.QualityMin})
         |SELECT 'img_' || lpad(CAST(doc_id AS VARCHAR), 12, '0') AS image_id,
         |  doc_id,
         |  CAST(1 + CASE WHEN doc_id % 5 = 0 THEN 1 ELSE 0 END
         |         + CASE WHEN doc_id % 10 = 3 THEN 1 ELSE 0 END AS BIGINT)
         |    AS n_dup
         |FROM ok ORDER BY image_id""".stripMargin,

    "e5_quantize_sq8" ->
      s"""WITH x AS (SELECT vec_id, j,
         |    CAST(embedding[CAST(j AS INTEGER) + 1] AS DOUBLE) AS v
         |  FROM embeddings, (SELECT unnest(range(64)) AS j)),
         |s AS (SELECT j, MIN(v) AS lo, MAX(v) AS hi FROM x GROUP BY j),
         |c AS (SELECT vec_id, x.j,
         |    CASE WHEN hi = lo THEN 0
         |      ELSE CAST(round((v - lo) * 255.0 / (hi - lo)) AS BIGINT)
         |    END AS code
         |  FROM x JOIN s USING (j))
         |SELECT vec_id, CAST(SUM((j + 1) * code) AS BIGINT) AS chk,
         |  CAST(MIN(code) AS BIGINT) AS code_min,
         |  CAST(MAX(code) AS BIGINT) AS code_max,
         |  CAST(SUM(CASE WHEN code = 0 OR code = 255 THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_clip
         |FROM c GROUP BY vec_id ORDER BY vec_id""".stripMargin,

    "f20_augment_png" ->
      s"""WITH $imagePixelCtes,
         |augw AS (SELECT id, r, g, b,
         |    CASE (id // 2) % 4
         |      WHEN 0 THEN y * 16 + (15 - x) + 1
         |      WHEN 1 THEN (15 - y) * 16 + x + 1
         |      WHEN 2 THEN x * 16 + (15 - y) + 1
         |      ELSE (15 - y) * 16 + (15 - x) + 1 END AS wgt
         |  FROM px),
         |augchk AS (SELECT id,
         |    CAST(SUM(wgt * (r * 65536 + g * 256 + b)) AS BIGINT) AS chk
         |  FROM augw GROUP BY id)
         |SELECT $imageIdSql AS image_id,
         |  CASE (id // 2) % 4 WHEN 0 THEN 'flip_h' WHEN 1 THEN 'flip_v'
         |    WHEN 2 THEN 'rot90' ELSE 'rot180' END AS op,
         |  f.mean_r4, f.mean_g4, f.mean_b4, c.chk
         |FROM augchk c JOIN feats f USING (id)
         |WHERE id % 2 = 0 ORDER BY image_id""".stripMargin,

    "g2_image_tiles" ->
      s"""WITH $imagePixelCtes
         |SELECT $imageIdSql AS image_id, $signedPhashSql AS phash,
         |  (m << 5) | 13 AS cell
         |FROM mort ORDER BY image_id""".stripMargin,

    "f21_audio_features" ->
      s"""WITH $audioCtes
         |SELECT 'aud_' || lpad(CAST(id AS VARCHAR), 12, '0') AS audio_id,
         |  CAST(${Audio.SampleRate} AS INTEGER) AS sr,
         |  CAST(${Audio.NumSamples} AS INTEGER) AS n_samples,
         |  peak, zero_crossings, rms2
         |FROM afeat ORDER BY audio_id""".stripMargin,

    "f19b_features_png" ->
      s"""WITH $imagePixelCtes
         |SELECT $imageIdSql AS image_id, f.mean_r4, f.mean_g4, f.mean_b4,
         |  $signedPhashSql AS ahash
         |FROM mort JOIN feats f USING (id)
         |WHERE id % 2 = 0 ORDER BY image_id""".stripMargin,

    // the per-row invariant VERDICTS over the mixed table: every row must
    // decode, match (exact png / PSNR>=40 jpeg) and carry its caption —
    // the engine computes the comparisons, DuckDB derives the expectation
    "f17_image_verify" ->
      s"""SELECT 'img_' || lpad(CAST(doc_id AS VARCHAR), 12, '0') AS image_id,
         |  CASE WHEN doc_id % 2 = 0 THEN 'png' ELSE 'jpeg' END AS fmt,
         |  true AS pixels_ok, true AS caption_ok
         |FROM documents ORDER BY image_id""".stripMargin,

    // resize-chain verdicts: every row resizes to 8x8 png and matches the
    // re-derived 2x2 box average (exact for png-origin, bounded for jpeg)
    "f18_image_resize" ->
      s"""SELECT 'img_' || lpad(CAST(doc_id AS VARCHAR), 12, '0') AS image_id,
         |  CASE WHEN doc_id % 2 = 0 THEN 'png' ELSE 'jpeg' END AS fmt_in,
         |  CAST(8 AS INTEGER) AS w, CAST(8 AS INTEGER) AS h,
         |  true AS resized_ok
         |FROM documents ORDER BY image_id""".stripMargin,

    // feature verdicts over the mixed table (exact values for the png half
    // are f19b's oracle)
    "f19_image_features" ->
      s"""SELECT 'img_' || lpad(CAST(doc_id AS VARCHAR), 12, '0') AS image_id,
         |  CASE WHEN doc_id % 2 = 0 THEN 'png' ELSE 'jpeg' END AS fmt,
         |  true AS means_ok, true AS ahash_ok
         |FROM documents ORDER BY image_id""".stripMargin,

    // exact values of the 2x2 box resize on the lossless half, re-derived
    // in SQL from doc_id (rpx/rfeat CTEs)
    "f18b_resize_png" ->
      s"""WITH $imagePixelCtes
         |SELECT $imageIdSql AS image_id, mean_r4, mean_g4, mean_b4, chk
         |FROM rfeat WHERE id % 2 = 0 ORDER BY image_id""".stripMargin,

    // the lossless invariant itself: exact decode (sentinel psnr4), pixel
    // and caption equality for every png row
    "f17b_verify_png" ->
      s"""SELECT 'img_' || lpad(CAST(doc_id AS VARCHAR), 12, '0') AS image_id,
         |  'png' AS fmt, CAST(9999999 AS BIGINT) AS psnr4,
         |  true AS pixels_ok, true AS caption_ok
         |FROM documents WHERE doc_id % 2 = 0 ORDER BY image_id""".stripMargin,
    // clip verdicts over the mixed table: every clip must decode, carry
    // the derived frame count, match per-frame (exact mpng / PSNR>=40
    // mjpg) and carry its caption — engine computes, DuckDB derives
    "f22_video_verify" ->
      s"""SELECT 'vid_' || lpad(CAST(doc_id AS VARCHAR), 12, '0') AS video_id,
         |  CASE WHEN doc_id % 2 = 0 THEN 'avi-mpng' ELSE 'avi-mjpg' END AS fmt,
         |  CAST(6 + doc_id % 5 AS INTEGER) AS n_frames,
         |  true AS frames_ok, true AS meta_ok, true AS caption_ok
         |FROM documents ORDER BY video_id""".stripMargin,

    // exact per-sampled-frame channel means on the lossless half: the
    // pixel chain re-derived from the frame seed vid*MaxFrames+k
    "f22b_frames_png" ->
      s"""WITH ${pixelCtes(videoFrameIdsCte)}
         |SELECT 'vid_' || lpad(CAST(id // ${Video.MaxFrames} AS VARCHAR), 12, '0') AS video_id,
         |  CAST(id % ${Video.MaxFrames} AS INTEGER) AS frame_idx,
         |  mean_r4, mean_g4, mean_b4
         |FROM feats ORDER BY video_id, frame_idx""".stripMargin,

    // per-clip motion: gray mean per sampled frame (SUM(gv)//256, the
    // engine's floor arithmetic), lag-diff over the sample order
    "f23_video_motion" ->
      s"""WITH ${pixelCtes(videoFrameIdsCte)},
         |gmean AS (SELECT id, SUM(gv) // 256 AS mg FROM gray GROUP BY id),
         |seq AS (SELECT id // ${Video.MaxFrames} AS vid, mg,
         |    lag(mg) OVER (PARTITION BY id // ${Video.MaxFrames}
         |                  ORDER BY id % ${Video.MaxFrames}) AS pmg
         |  FROM gmean)
         |SELECT 'vid_' || lpad(CAST(vid AS VARCHAR), 12, '0') AS video_id,
         |  CAST(COUNT(*) AS INTEGER) AS n_sampled,
         |  CAST(COALESCE(SUM(abs(mg - pmg)), 0) AS BIGINT) AS motion
         |FROM seq GROUP BY vid ORDER BY video_id""".stripMargin,

    "d1_dedup_exact" ->
      """SELECT MIN(doc_id) AS keep_id, COUNT(*) AS n_dups
        |FROM documents GROUP BY text ORDER BY keep_id""".stripMargin,

    // the sequential three-batch ingest collapses to: per (text, batch)
    // firsts, then the earliest batch per text wins (arrival order)
    "d10_incr_dedup" ->
      """WITH base AS (SELECT doc_id, text FROM documents),
        |allr AS (SELECT doc_id, text FROM base
        |  UNION ALL SELECT doc_id + 9999999, text FROM base WHERE doc_id % 5 = 0
        |  UNION ALL SELECT doc_id + 10000000, text FROM base WHERE doc_id % 7 = 0),
        |firsts AS (SELECT text, CAST(doc_id % 3 AS INT) AS batch,
        |    MIN(doc_id) AS doc_id, COUNT(*) AS n_dups
        |  FROM allr GROUP BY 1, 2),
        |ranked AS (SELECT batch, doc_id, n_dups,
        |    ROW_NUMBER() OVER (PARTITION BY text ORDER BY batch) AS rn
        |  FROM firsts)
        |SELECT batch, doc_id, n_dups FROM ranked WHERE rn = 1
        |ORDER BY doc_id""".stripMargin,

    // the sequential near-dup ingest unrolled: ONE global banding+refine
    // pair list, then per-batch in-batch smaller-id rejection and
    // accepted-so-far rejection as three acceptance CTEs
    "d11_incr_near_dedup" ->
      s"""WITH ${shingleCte(NearMaxId)},
         |$minhashSigBandCtes,
         |sz AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
         |inter AS (SELECT p.id1, p.id2, COUNT(*) AS c
         |  FROM pairs p JOIN sh a ON a.doc_id = p.id1
         |  JOIN sh b ON b.doc_id = p.id2 AND b.s = a.s
         |  GROUP BY 1, 2),
         |ref AS (SELECT id1, id2 FROM inter
         |  JOIN sz s1 ON id1 = s1.doc_id JOIN sz s2 ON id2 = s2.doc_id
         |  WHERE c * 1.0 / (s1.sz + s2.sz - c) >= $NearThreshold),
         |refsym AS (SELECT id1, id2 FROM ref UNION ALL SELECT id2, id1 FROM ref),
         |bm AS (SELECT doc_id, CAST(doc_id % 3 AS INT) AS batch FROM d),
         |inok AS (SELECT m.doc_id, m.batch FROM bm m WHERE NOT EXISTS (
         |  SELECT 1 FROM ref r JOIN bm m2 ON r.id1 = m2.doc_id
         |  WHERE r.id2 = m.doc_id AND m2.batch = m.batch)),
         |acc0 AS (SELECT doc_id FROM inok WHERE batch = 0),
         |acc1 AS (SELECT i.doc_id FROM inok i WHERE batch = 1 AND NOT EXISTS (
         |  SELECT 1 FROM refsym r JOIN acc0 a ON r.id1 = a.doc_id
         |  WHERE r.id2 = i.doc_id)),
         |acc01 AS (SELECT doc_id FROM acc0 UNION ALL SELECT doc_id FROM acc1),
         |acc2 AS (SELECT i.doc_id FROM inok i WHERE batch = 2 AND NOT EXISTS (
         |  SELECT 1 FROM refsym r JOIN acc01 a ON r.id1 = a.doc_id
         |  WHERE r.id2 = i.doc_id))
         |SELECT 0 AS batch, doc_id FROM acc0
         |UNION ALL SELECT 1 AS batch, doc_id FROM acc1
         |UNION ALL SELECT 2 AS batch, doc_id FROM acc2
         |ORDER BY doc_id""".stripMargin,

    "d2_jaccard" ->
      s"""WITH ${shingleCte(JaccardMaxId)},
         |sz AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
         |inter AS (SELECT a.doc_id AS id1, b.doc_id AS id2, COUNT(*) AS c
         |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2)
         |SELECT id1, id2,
         |  ${Derived.q4Sql("c * 1.0 / (s1.sz + s2.sz - c)")} AS sim4
         |FROM inter JOIN sz s1 ON id1 = s1.doc_id JOIN sz s2 ON id2 = s2.doc_id
         |WHERE c * 1.0 / (s1.sz + s2.sz - c) >= $JaccardThreshold
         |ORDER BY id1, id2""".stripMargin,

    "d3_minhash" -> minhashSql,

    // components as an independent recursive-CTE transitive closure (the
    // same oracle pattern as g7_vectorize), over the same pair CTEs as d3
    "d6_dup_clusters" ->
      s"""WITH RECURSIVE $minhashPairCtes,
         |nodes AS (SELECT doc_id FROM documents WHERE doc_id < $MinhashMaxId),
         |sym AS (SELECT id1, id2 FROM pairs
         |  UNION ALL SELECT id2 AS id1, id1 AS id2 FROM pairs),
         |reach(id, r) AS (
         |  SELECT doc_id, doc_id FROM nodes
         |  UNION
         |  SELECT e.id1, reach.r FROM sym e JOIN reach ON e.id2 = reach.id)
         |SELECT id AS doc_id, MIN(r) AS keep_id FROM reach
         |GROUP BY id ORDER BY doc_id""".stripMargin,

    // the span pipeline re-derived from scratch: tokenize -> k-gram windows
    // with positions -> global occurrence count -> per-doc dup occurrences
    // and merged-interval coverage (DISTINCT over exploded positions)
    "d8_span_dedup" ->
      s"""WITH toks AS (SELECT doc_id, ${T("text")} AS ts FROM documents),
         |sp AS (SELECT doc_id, CAST(i AS INTEGER) AS pos,
         |    array_to_string(ts[CAST(i+1 AS INTEGER):CAST(i+$SpanK AS INTEGER)], ' ') AS span
         |  FROM toks, LATERAL (SELECT unnest(range(greatest(len(ts) - ${SpanK - 1}, 0))) AS i) u),
         |dup AS (SELECT span FROM sp GROUP BY span HAVING COUNT(*) >= 2),
         |occ AS (SELECT sp.doc_id, sp.pos FROM sp JOIN dup USING(span)),
         |perdoc AS (SELECT doc_id, COUNT(*) AS ds FROM occ GROUP BY doc_id),
         |cov AS (SELECT doc_id, COUNT(*) AS dc FROM (
         |    SELECT DISTINCT doc_id, pos + j AS p
         |    FROM occ, (SELECT unnest(range($SpanK)) AS j) w) GROUP BY doc_id)
         |SELECT t.doc_id, CAST(len(ts) AS BIGINT) AS n_tokens,
         |  CAST(greatest(len(ts) - ${SpanK - 1}, 0) AS BIGINT) AS n_spans,
         |  COALESCE(ds, 0) AS dup_spans, COALESCE(dc, 0) AS dup_cov
         |FROM toks t LEFT JOIN perdoc USING(doc_id) LEFT JOIN cov USING(doc_id)
         |ORDER BY doc_id""".stripMargin,

    // the cut stage: keeper = min(doc_id*2^20+pos) per duplicated span,
    // positions covered by non-kept occurrences cut, text re-assembled
    // position-ordered — byte-identical cross-engine
    "d8b_span_cut" -> {
      val enc = 1L << Dedup.SpanPosBits
      s"""WITH toks AS (SELECT doc_id, ${T("text")} AS ts FROM documents),
         |sp AS (SELECT doc_id, CAST(i AS INTEGER) AS pos,
         |    array_to_string(ts[CAST(i+1 AS INTEGER):CAST(i+$SpanK AS INTEGER)], ' ') AS span
         |  FROM toks, LATERAL (SELECT unnest(range(greatest(len(ts) - ${SpanK - 1}, 0))) AS i) u),
         |dup AS (SELECT span, MIN(doc_id * $enc + pos) AS keep_key
         |  FROM sp GROUP BY span HAVING COUNT(*) >= 2),
         |cutpos AS (SELECT DISTINCT s.doc_id, s.pos + j AS p
         |  FROM sp s JOIN dup USING(span), (SELECT unnest(range($SpanK)) AS j) w
         |  WHERE s.doc_id * $enc + s.pos <> dup.keep_key),
         |dt AS (SELECT doc_id, unnest(range(len(ts))) AS p, unnest(ts) AS term FROM toks),
         |kept AS (SELECT dt.doc_id, dt.p, dt.term FROM dt
         |  LEFT JOIN cutpos c ON dt.doc_id = c.doc_id AND dt.p = c.p
         |  WHERE c.doc_id IS NULL),
         |reb AS (SELECT doc_id, string_agg(term, ' ' ORDER BY p) AS text_dedup,
         |    COUNT(*) AS nk FROM kept GROUP BY doc_id)
         |SELECT t.doc_id, COALESCE(text_dedup, '') AS text_dedup,
         |  CAST(len(ts) - COALESCE(nk, 0) AS BIGINT) AS n_cut
         |FROM toks t LEFT JOIN reb USING(doc_id) ORDER BY t.doc_id""".stripMargin
    },

    // decontamination: distinct benchmark spans (the % 17 == 0 cut), count
    // of distinct overlapping spans per training doc
    "d9_decontam" ->
      s"""WITH toks AS (SELECT doc_id, ${T("text")} AS ts FROM documents),
         |sp AS (SELECT doc_id,
         |    array_to_string(ts[CAST(i+1 AS INTEGER):CAST(i+$DecontamK AS INTEGER)], ' ') AS span
         |  FROM toks, LATERAL (SELECT unnest(range(greatest(len(ts) - ${DecontamK - 1}, 0))) AS i) u),
         |bench AS (SELECT DISTINCT span FROM sp WHERE doc_id % $DecontamMod = 0),
         |hits AS (SELECT s.doc_id, COUNT(DISTINCT s.span) AS nh
         |  FROM sp s JOIN bench USING(span) WHERE s.doc_id % $DecontamMod != 0 GROUP BY 1)
         |SELECT d.doc_id, COALESCE(nh, 0) AS n_hits, COALESCE(nh, 0) > 0 AS contaminated
         |FROM documents d LEFT JOIN hits USING(doc_id)
         |WHERE d.doc_id % $DecontamMod != 0 ORDER BY d.doc_id""".stripMargin,

    // composed chain: d9's contamination drop, then d8b's span cut with dup
    // spans recounted over the survivor set only
    "x11_decontam_cut" -> {
      val enc = 1L << Dedup.SpanPosBits
      s"""WITH toks0 AS (SELECT doc_id, ${T("text")} AS ts FROM documents),
         |spd AS (SELECT doc_id,
         |    array_to_string(ts[CAST(i+1 AS INTEGER):CAST(i+$DecontamK AS INTEGER)], ' ') AS span
         |  FROM toks0, LATERAL (SELECT unnest(range(greatest(len(ts) - ${DecontamK - 1}, 0))) AS i) u),
         |bench AS (SELECT DISTINCT span FROM spd WHERE doc_id % $DecontamMod = 0),
         |contam AS (SELECT DISTINCT s.doc_id FROM spd s JOIN bench USING(span)
         |  WHERE s.doc_id % $DecontamMod != 0),
         |surv AS (SELECT doc_id, ts FROM toks0
         |  WHERE doc_id % $DecontamMod != 0
         |    AND doc_id NOT IN (SELECT doc_id FROM contam)),
         |sp AS (SELECT doc_id, CAST(i AS INTEGER) AS pos,
         |    array_to_string(ts[CAST(i+1 AS INTEGER):CAST(i+$SpanK AS INTEGER)], ' ') AS span
         |  FROM surv, LATERAL (SELECT unnest(range(greatest(len(ts) - ${SpanK - 1}, 0))) AS i) u),
         |dup AS (SELECT span, MIN(doc_id * $enc + pos) AS keep_key
         |  FROM sp GROUP BY span HAVING COUNT(*) >= 2),
         |cutpos AS (SELECT DISTINCT s.doc_id, s.pos + j AS p
         |  FROM sp s JOIN dup USING(span), (SELECT unnest(range($SpanK)) AS j) w
         |  WHERE s.doc_id * $enc + s.pos <> dup.keep_key),
         |dt AS (SELECT doc_id, unnest(range(len(ts))) AS p, unnest(ts) AS term FROM surv),
         |kept AS (SELECT dt.doc_id, dt.p, dt.term FROM dt
         |  LEFT JOIN cutpos c ON dt.doc_id = c.doc_id AND dt.p = c.p
         |  WHERE c.doc_id IS NULL),
         |reb AS (SELECT doc_id, string_agg(term, ' ' ORDER BY p) AS text_dedup,
         |    COUNT(*) AS nk FROM kept GROUP BY doc_id)
         |SELECT t.doc_id, COALESCE(text_dedup, '') AS text_dedup,
         |  CAST(len(ts) - COALESCE(nk, 0) AS BIGINT) AS n_cut
         |FROM surv t LEFT JOIN reb USING(doc_id) ORDER BY t.doc_id""".stripMargin
    },

    // PQ: the unrolled k-means training run (see pqOracleSql) — every code
    // and every ADC distance re-derived
    "e7_pq_adc" ->
      s"""WITH $pqOracleSql
         |SELECT chk.vec_id, chk.chk, ${Derived.q6Sql("adc.adc")} AS adc6
         |FROM chk JOIN adc USING (vec_id) ORDER BY vec_id""".stripMargin,

    // IVF-PQ: both k-means levels unrolled (see ivfPqOracleSql) — every
    // coarse list, every residual code and every per-list ADC re-derived
    "e8_ivfpq" ->
      s"""WITH $ivfPqOracleSql
         |SELECT gl.vec_id, CAST(gl.list AS INTEGER) AS list, chk8.chk,
         |  ${Derived.q6Sql("adc8.adc")} AS adc6
         |FROM glist gl JOIN chk8 ON chk8.vec_id = gl.vec_id
         |JOIN adc8 ON adc8.vec_id = gl.vec_id ORDER BY gl.vec_id""".stripMargin,

    // embedding near-dup clusters: recursive-CTE transitive closure (the
    // d6/g7 oracle pattern) over the SAME pair set e4 derives in SQL
    "e6_embed_clusters" ->
      s"""WITH RECURSIVE ${lshSigCtes(CosinePairBits)},
         |ev AS (SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS v,
         |    unnest(range(len(embedding))) AS pos
         |  FROM embeddings),
         |bpairs AS (SELECT a.vec_id AS id1, b.vec_id AS id2
         |  FROM sig a JOIN sig b ON a.bucket = b.bucket AND a.vec_id < b.vec_id),
         |pc AS (SELECT p.id1, p.id2,
         |    SUM(x.v * y.v) / (sqrt(SUM(x.v * x.v)) * sqrt(SUM(y.v * y.v))) AS cos
         |  FROM bpairs p
         |  JOIN ev x ON x.vec_id = p.id1
         |  JOIN ev y ON y.vec_id = p.id2 AND x.pos = y.pos
         |  GROUP BY 1, 2),
         |cp AS (SELECT id1, id2 FROM pc WHERE cos >= $CosinePairThreshold),
         |sym AS (SELECT id1, id2 FROM cp
         |  UNION ALL SELECT id2 AS id1, id1 AS id2 FROM cp),
         |reach(id, r) AS (
         |  SELECT vec_id, vec_id FROM embeddings
         |  UNION
         |  SELECT e.id1, reach.r FROM sym e JOIN reach ON e.id2 = reach.id)
         |SELECT id AS vec_id, MIN(r) AS keep_id FROM reach
         |GROUP BY id ORDER BY vec_id""".stripMargin,

    // portable simhash: md5-60-bit term hash (top 60 bits of the digest,
    // exact in both engines), ±1 bit sums over token OCCURRENCES, majority
    // pack — the same plan as the production xxhash64 signature
    "d4_simhash" ->
      s"""WITH toks AS (SELECT doc_id, unnest(${T("text")}) AS term FROM documents),
         |th AS (SELECT doc_id, CAST('0x' || substr(md5(term), 1, 15) AS BIGINT) AS h FROM toks),
         |bits AS (SELECT doc_id, CAST(b AS INTEGER) AS b,
         |    SUM(CASE WHEN ((h >> CAST(b AS INTEGER)) & 1) = 1 THEN 1 ELSE -1 END) AS s
         |  FROM th, (SELECT unnest(range(60)) AS b) GROUP BY 1, 2)
         |SELECT doc_id,
         |  CAST(SUM(CASE WHEN s > 0 THEN (1::BIGINT << b) ELSE 0::BIGINT END) AS BIGINT) AS simhash
         |FROM bits GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "e2_ann_lsh" ->
      s"""WITH ${lshSigCtes(12)},
         |qsig AS (SELECT bucket FROM sig WHERE vec_id = 1),
         |probes AS (SELECT bucket AS p FROM qsig
         |  UNION ALL
         |  SELECT xor(bucket, (1::BIGINT << CAST(j AS INTEGER)))
         |  FROM qsig, (SELECT unnest(range(12)) AS j)),
         |qv AS (SELECT CAST(unnest(embedding) AS DOUBLE) AS v,
         |    unnest(range(len(embedding))) AS pos
         |  FROM embeddings WHERE vec_id = 1),
         |ev AS (SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS v,
         |    unnest(range(len(embedding))) AS pos
         |  FROM embeddings),
         |cand AS (SELECT ev.* FROM ev JOIN sig USING (vec_id)
         |  WHERE sig.bucket IN (SELECT p FROM probes)),
         |d AS (SELECT e.vec_id, SUM(e.v * q.v) AS dot,
         |    SUM(e.v * e.v) AS n2, SUM(q.v * q.v) AS qn2
         |  FROM cand e JOIN qv q ON e.pos = q.pos GROUP BY e.vec_id)
         |SELECT vec_id, ${Derived.q6Sql("dot / (sqrt(n2) * sqrt(qn2))")} AS cos6
         |FROM d ORDER BY cos6 DESC, vec_id LIMIT 10""".stripMargin,

    "e4_cosine_pairs" ->
      s"""WITH ${lshSigCtes(CosinePairBits)},
         |ev AS (SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS v,
         |    unnest(range(len(embedding))) AS pos
         |  FROM embeddings),
         |pairs AS (SELECT a.vec_id AS id1, b.vec_id AS id2
         |  FROM sig a JOIN sig b ON a.bucket = b.bucket AND a.vec_id < b.vec_id),
         |pc AS (SELECT p.id1, p.id2,
         |    SUM(x.v * y.v) / (sqrt(SUM(x.v * x.v)) * sqrt(SUM(y.v * y.v))) AS cos
         |  FROM pairs p
         |  JOIN ev x ON x.vec_id = p.id1
         |  JOIN ev y ON y.vec_id = p.id2 AND x.pos = y.pos
         |  GROUP BY 1, 2)
         |SELECT id1, id2, ${Derived.q6Sql("cos")} AS cos6
         |FROM pc WHERE cos >= $CosinePairThreshold ORDER BY id1, id2""".stripMargin,

    "e1_cosine_topk" ->
      s"""WITH qv AS (SELECT CAST(unnest(embedding) AS DOUBLE) AS v,
         |    unnest(range(len(embedding))) AS pos
         |  FROM embeddings WHERE vec_id = 1),
         |ev AS (SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS v,
         |    unnest(range(len(embedding))) AS pos
         |  FROM embeddings),
         |d AS (SELECT e.vec_id, SUM(e.v * q.v) AS dot,
         |    SUM(e.v * e.v) AS n2, SUM(q.v * q.v) AS qn2
         |  FROM ev e JOIN qv q ON e.pos = q.pos GROUP BY e.vec_id)
         |SELECT vec_id, ${Derived.q4Sql("dot / (sqrt(n2) * sqrt(qn2))")} AS cos4
         |FROM d ORDER BY cos4 DESC, vec_id LIMIT 10""".stripMargin,

    // full-probe IVF == brute force exactly, so the approximate operator
    // gets a deterministic oracle (double summation differs from DuckDB's
    // far below the 1e-6 quantum)
    "e3_ann_ivf" ->
      s"""WITH qv AS (SELECT CAST(unnest(embedding) AS DOUBLE) AS v,
         |    unnest(range(len(embedding))) AS pos
         |  FROM embeddings WHERE vec_id = 1),
         |ev AS (SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS v,
         |    unnest(range(len(embedding))) AS pos
         |  FROM embeddings),
         |d AS (SELECT e.vec_id, SUM(e.v * q.v) AS dot,
         |    SUM(e.v * e.v) AS n2, SUM(q.v * q.v) AS qn2
         |  FROM ev e JOIN qv q ON e.pos = q.pos GROUP BY e.vec_id)
         |SELECT vec_id, ${Derived.q6Sql("dot / (sqrt(n2) * sqrt(qn2))")} AS cos6
         |FROM d ORDER BY cos6 DESC, vec_id LIMIT 10""".stripMargin,

    // full probe over base + appended deltas covers every vector exactly
    // once, so the oracle is the SAME brute-force top-k as e3 — append
    // correctness reduces to "no vector lost, none duplicated, scored
    // identically", independent of the k-means routing
    "e9_ivf_append" ->
      s"""WITH qv AS (SELECT CAST(unnest(embedding) AS DOUBLE) AS v,
         |    unnest(range(len(embedding))) AS pos
         |  FROM embeddings WHERE vec_id = 1),
         |ev AS (SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS v,
         |    unnest(range(len(embedding))) AS pos
         |  FROM embeddings),
         |d AS (SELECT e.vec_id, SUM(e.v * q.v) AS dot,
         |    SUM(e.v * e.v) AS n2, SUM(q.v * q.v) AS qn2
         |  FROM ev e JOIN qv q ON e.pos = q.pos GROUP BY e.vec_id)
         |SELECT vec_id, ${Derived.q6Sql("dot / (sqrt(n2) * sqrt(qn2))")} AS cos6
         |FROM d ORDER BY cos6 DESC, vec_id LIMIT 10""".stripMargin,

    "x1_langid" ->
      s"""SELECT doc_id, ${TextStats.langIdSqlCase("text")} AS lang_pred
         |FROM documents ORDER BY doc_id""".stripMargin,

    "x2_quality" ->
      s"""SELECT doc_id, ${TextStats.qualitySqlSelect("text").mkString(", ")}
         |FROM documents ORDER BY doc_id""".stripMargin,

    "x3_token_counts" ->
      s"""SELECT doc_id, ${TextStats.tokenCountsSqlSelect("text").mkString(", ")}
         |FROM documents ORDER BY doc_id""".stripMargin,

    "x4_fingerprint" ->
      s"""SELECT doc_id, ${TextStats.fingerprintSql("text")} AS fingerprint
         |FROM documents ORDER BY doc_id""".stripMargin,

    "x5_lm_score" ->
      s"""WITH ${Derived.docTermsSqlCte},
         |${TextStats.lmScoreSql}
         |ORDER BY doc_id""".stripMargin,

    "x6_repetition" ->
      s"""SELECT doc_id, ${TextStats.repetitionSqlSelect("text").mkString(", ")}
         |FROM documents ORDER BY doc_id""".stripMargin,

    "x8_redact" ->
      s"""SELECT doc_id, ${TextStats.redactSql("text")} AS redacted
         |FROM documents ORDER BY doc_id""".stripMargin,

    // the composed curation chain: every stage reuses an already-proven
    // twin (x8 redact, x2/x6 signals, d3 banding, d6 recursive-CTE
    // components, x7 ticket sampling) over the previous stage's output
    "x9_curation_e2e" -> {
      import graft.ml.Curation
      val redSql = TextStats.redactSql("text")
      val cut = Curation.SampleRates.foldLeft(
        math.round(Curation.SampleDefaultRate * graft.ml.Sampling.Tickets).toString) {
        case (acc, (k, r)) =>
          s"CASE WHEN lang_pred = '$k' THEN ${math.round(r * graft.ml.Sampling.Tickets)} ELSE $acc END"
      }
      s"""WITH RECURSIVE
         |red AS (SELECT doc_id, $redSql AS redacted FROM documents),
         |filb AS (SELECT doc_id, redacted,
         |    ${TextStats.qualitySqlSelect("redacted").last},
         |    ${TextStats.repetitionSqlSelect("redacted").last}
         |  FROM red),
         |fil AS (SELECT * FROM filb WHERE quality4 >= ${Curation.QualityMin} AND rep4 <= ${Curation.RepMax}),
         |d AS (SELECT doc_id, lower(redacted) AS t FROM fil),
         |sh AS (SELECT DISTINCT doc_id,
         |  unnest(list_transform(range(1, len(t) - 1), i -> substr(t, CAST(i AS INTEGER), 3))) AS s
         |  FROM d WHERE len(t) >= 3),
         |$minhashSigBandCtes,
         |bsz AS (SELECT band, band_key, COUNT(*) AS bn FROM bands GROUP BY 1, 2),
         |cpairs AS (SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2
         |  FROM bands a JOIN bands b
         |    ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id
         |  JOIN bsz ON bsz.band = a.band AND bsz.band_key = a.band_key
         |  WHERE bsz.bn <= ${Curation.MaxBandBucket}),
         |refined AS (SELECT p.id1, p.id2, COUNT(*) AS c
         |  FROM cpairs p JOIN sh a ON a.doc_id = p.id1
         |    JOIN sh b ON b.doc_id = p.id2 AND b.s = a.s
         |  GROUP BY 1, 2),
         |sz AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY 1),
         |rp AS (SELECT id1, id2 FROM refined
         |  JOIN sz s1 ON id1 = s1.doc_id JOIN sz s2 ON id2 = s2.doc_id
         |  WHERE c * 1.0 / (s1.sz + s2.sz - c) >= ${Curation.JaccardRefineThreshold}),
         |sym AS (SELECT id1, id2 FROM rp
         |  UNION ALL SELECT id2 AS id1, id1 AS id2 FROM rp),
         |reach(id, r) AS (
         |  SELECT doc_id, doc_id FROM fil
         |  UNION
         |  SELECT e.id1, reach.r FROM sym e JOIN reach ON e.id2 = reach.id),
         |comp AS (SELECT id AS doc_id, MIN(r) AS keep_id FROM reach GROUP BY id),
         |ded AS (SELECT f.doc_id, f.redacted, f.quality4, f.rep4
         |  FROM fil f JOIN comp c ON f.doc_id = c.doc_id AND c.keep_id = f.doc_id),
         |langd AS (SELECT doc_id, ${TextStats.langIdSqlCase("redacted")} AS lang_pred,
         |    quality4, rep4
         |  FROM ded)
         |SELECT doc_id, lang_pred, quality4, rep4 FROM langd
         |WHERE ${graft.ml.Sampling.ticketSql("doc_id", Curation.SampleSalt)} < $cut
         |ORDER BY doc_id""".stripMargin
    },

    "x7_sample" -> {
      // the rate CASE is generated from the SAME map as the Spark filter
      val cut = SampleRates.foldLeft(
        math.round(SampleDefaultRate * Sampling.Tickets).toString) {
        case (acc, (k, r)) =>
          s"CASE WHEN lang_pred = '$k' THEN ${math.round(r * Sampling.Tickets)} ELSE $acc END"
      }
      s"""WITH langs AS (SELECT doc_id, ${TextStats.langIdSqlCase("text")} AS lang_pred
         |  FROM documents)
         |SELECT doc_id, lang_pred FROM langs
         |WHERE ${Sampling.ticketSql("doc_id", SampleSalt)} < $cut
         |ORDER BY doc_id""".stripMargin
    },

    "x12_pack_shards" ->
      s"""WITH t AS (SELECT doc_id,
         |    CAST(len(${Derived.tokensSql("text")}) AS BIGINT) AS toks
         |  FROM documents),
         |c AS (SELECT doc_id, toks,
         |    COALESCE(SUM(toks) OVER (ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off
         |  FROM t)
         |SELECT doc_id, toks, CAST(off AS BIGINT) AS off,
         |  CAST(off // $PackBudget AS BIGINT) AS shard
         |FROM c ORDER BY doc_id""".stripMargin,

    // incremental pack ≡ one-shot pack over the concatenation: the oracle
    // is x12's single-threaded global window — offsets and shards must
    // line up bit-exactly across the three batch boundaries
    "x18_incr_pack" ->
      s"""WITH t AS (SELECT doc_id,
         |    CAST(len(${Derived.tokensSql("text")}) AS BIGINT) AS toks
         |  FROM documents),
         |c AS (SELECT doc_id, toks,
         |    COALESCE(SUM(toks) OVER (ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off
         |  FROM t)
         |SELECT doc_id, toks, CAST(off AS BIGINT) AS off,
         |  CAST(off // $PackBudget AS BIGINT) AS shard
         |FROM c ORDER BY doc_id""".stripMargin,

    "x15_semantic_decontam" ->
      s"""WITH ${lshSigCtes(CosinePairBits)},
         |ev AS (SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS v,
         |    unnest(range(len(embedding))) AS pos
         |  FROM embeddings),
         |bp AS (SELECT a.vec_id AS tid, b.vec_id AS bid
         |  FROM sig a JOIN sig b ON a.bucket = b.bucket
         |  WHERE a.vec_id % $DecontamMod != 0 AND b.vec_id % $DecontamMod = 0),
         |pc AS (SELECT p.tid, p.bid,
         |    SUM(x.v * y.v) / (sqrt(SUM(x.v * x.v)) * sqrt(SUM(y.v * y.v))) AS cos
         |  FROM bp p
         |  JOIN ev x ON x.vec_id = p.tid
         |  JOIN ev y ON y.vec_id = p.bid AND x.pos = y.pos
         |  GROUP BY 1, 2)
         |SELECT tid AS vec_id, CAST(COUNT(*) AS BIGINT) AS n_matches,
         |  CAST(MAX(${Derived.q6Sql("cos")}) AS BIGINT) AS max_cos6
         |FROM pc WHERE cos >= $SemanticThreshold
         |GROUP BY 1 ORDER BY vec_id""".stripMargin,

    "x14_quality_quantiles" ->
      s"""WITH q AS (SELECT ${TextStats.langIdSqlCase("text")} || '|' ||
         |    CAST(len(${Derived.tokensSql("text")}) // 20 AS VARCHAR) AS grp,
         |    ${TextStats.qualitySqlSelect("text").last}
         |  FROM documents),
         |h AS (SELECT grp, quality4 AS v, COUNT(*) AS c
         |  FROM q GROUP BY 1, 2),
         |t AS (SELECT grp, SUM(c) AS n FROM h GROUP BY 1),
         |cu AS (SELECT h.grp, v,
         |    SUM(c) OVER (PARTITION BY h.grp ORDER BY v) AS cum, n
         |  FROM h JOIN t USING (grp))
         |SELECT grp, CAST(MAX(n) AS BIGINT) AS n,
         |  CAST(MIN(CASE WHEN cum * 2 >= n * 1 THEN v END) AS BIGINT) AS p50,
         |  CAST(MIN(CASE WHEN cum * 10 >= n * 9 THEN v END) AS BIGINT) AS p90,
         |  CAST(MIN(CASE WHEN cum * 100 >= n * 99 THEN v END) AS BIGINT) AS p99
         |FROM cu GROUP BY 1 ORDER BY grp""".stripMargin,

    "x16_quantiles_general" ->
      s"""WITH q AS (SELECT ${TextStats.langIdSqlCase("text")} AS lang,
         |    CAST(${Derived.q6Sql(TextStats.qualityScoreSql("text"))} AS DOUBLE)
         |      / 1000000 AS v
         |  FROM documents),
         |h AS (SELECT lang, v, COUNT(*) AS c FROM q GROUP BY 1, 2),
         |t AS (SELECT lang, SUM(c) AS n FROM h GROUP BY 1),
         |cu AS (SELECT h.lang, v,
         |    SUM(c) OVER (PARTITION BY h.lang ORDER BY v) AS cum, n
         |  FROM h JOIN t USING (lang))
         |SELECT lang, CAST(MAX(n) AS BIGINT) AS n,
         |  ${Derived.q6Sql("MIN(CASE WHEN cum * 2 >= n * 1 THEN v END)")} AS p50_6,
         |  ${Derived.q6Sql("MIN(CASE WHEN cum * 10 >= n * 9 THEN v END)")} AS p90_6,
         |  ${Derived.q6Sql("MIN(CASE WHEN cum * 100 >= n * 99 THEN v END)")} AS p99_6
         |FROM cu GROUP BY 1 ORDER BY lang""".stripMargin,

    "x13_heavy_terms" ->
      s"""WITH ${Derived.docTermsSqlCte},
         |tc AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS cnt
         |  FROM doc_terms GROUP BY term),
         |tot AS (SELECT COUNT(*) AS n FROM doc_terms)
         |SELECT term, cnt FROM tc, tot
         |WHERE cnt * $HeavyK > n ORDER BY term""".stripMargin,

    "b1_bpe_merges" ->
      s"""WITH ${Derived.docTermsSqlCte},
         |${bpeCtes(BpeRounds)}
         |SELECT * FROM (
         |  ${(1 to BpeRounds).map(r =>
               s"SELECT CAST($r AS INTEGER) AS merge_rank, l AS lft, " +
                 s"rgt, CAST(cnt AS BIGINT) AS freq FROM bm$r")
             .mkString("\n  UNION ALL ")}
         |) ORDER BY merge_rank""".stripMargin,

    "b2_bpe_tokens" ->
      s"""WITH ${Derived.docTermsSqlCte},
         |${bpeCtes(BpeRounds)}
         |SELECT doc_id,
         |  CAST(SUM(len(list_filter(string_split(repr, ' '), t -> t <> '')))
         |    AS BIGINT) AS bpe_len,
         |  CAST(COUNT(*) AS BIGINT) AS n_terms
         |FROM doc_terms JOIN brep$BpeRounds USING (term)
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "x17_bpe_pack" ->
      s"""WITH ${Derived.docTermsSqlCte},
         |${bpeCtes(BpeRounds)},
         |bl AS (SELECT doc_id,
         |    CAST(SUM(len(list_filter(string_split(repr, ' '), t -> t <> '')))
         |      AS BIGINT) AS toks
         |  FROM doc_terms JOIN brep$BpeRounds USING (term)
         |  GROUP BY doc_id),
         |c AS (SELECT doc_id, toks,
         |    COALESCE(SUM(toks) OVER (ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off
         |  FROM bl)
         |SELECT doc_id, toks, CAST(off AS BIGINT) AS off,
         |  CAST(off // $PackBudget AS BIGINT) AS shard
         |FROM c ORDER BY doc_id""".stripMargin
  )

  /**
   * Unrolled BPE training rounds as DuckDB CTEs over `doc_terms` — the SQL
   * twin of [[Bpe.train]]. Ends with CTEs `bm{r}(l, rgt, cnt)` (the round-r
   * merge) and `brep{r}(term, freq, repr)` (the dictionary after r merges).
   * Argmax tie-break (cnt DESC, l ASC, rgt ASC) and the double literal
   * replace match the engine exactly — see Bpe's scaladoc.
   *
   * A round whose merge set runs dry (bm{r} empty — every repr is a single
   * symbol) must be a NO-OP like the engine loop's `if (top.nonEmpty)`
   * branch, not an empty cross join that zeroes every later CTE: brep{r}
   * LEFT-joins its merge row and keeps the repr unchanged when absent.
   */
  private def bpeCtes(rounds: Int): String = {
    val base =
      """bterms AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS freq
        |  FROM doc_terms GROUP BY term),
        |brep0 AS (SELECT term, freq,
        |  ' ' || regexp_replace(term, '(.)', '\1 ', 'g') AS repr FROM bterms)"""
        .stripMargin
    val perRound = (1 to rounds).map { r =>
      s"""bprs$r AS (
         |  SELECT syms[CAST(i + 1 AS INTEGER)] AS l,
         |    syms[CAST(i + 2 AS INTEGER)] AS rgt, SUM(freq) AS cnt
         |  FROM (SELECT freq, syms, unnest(range(len(syms) - 1)) AS i
         |    FROM (SELECT freq, list_filter(string_split(repr, ' '),
         |        t -> t <> '') AS syms FROM brep${r - 1}))
         |  GROUP BY 1, 2),
         |bm$r AS (SELECT l, rgt, cnt FROM bprs$r
         |  ORDER BY cnt DESC, l ASC, rgt ASC LIMIT 1),
         |brep$r AS (SELECT term, freq,
         |  CASE WHEN m.l IS NULL THEN repr ELSE
         |    replace(replace(repr, ' ' || m.l || ' ' || m.rgt || ' ',
         |                          ' ' || m.l || m.rgt || ' '),
         |                    ' ' || m.l || ' ' || m.rgt || ' ',
         |                    ' ' || m.l || m.rgt || ' ') END AS repr
         |  FROM brep${r - 1} LEFT JOIN bm$r m ON TRUE)""".stripMargin
    }
    (base +: perRound).mkString(",\n")
  }
}
