package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication family for training-data pipelines (north-star scope,
  * SURVEY §7.6): exact, n-gram Jaccard, MinHash+LSH, SimHash.
  *
  * Scale notes (the point of each variant):
  *  - exact/fingerprint: one hash-aggregate on a 128-bit key — the
  *    cheapest pass, always run it first to shrink the candidate set.
  *  - ngramJaccardPairs: EXACT pairwise Jaccard, but only over pairs that
  *    share ≥1 shingle (the shingle join prunes the O(n²) space). Shuffle
  *    is O(Σ shingle-postings²) — fine when no shingle is ubiquitous;
  *    hot shingles (boilerplate) should be dropped upstream via a
  *    document-frequency cap, exactly like stopword removal.
  *  - minhash*: the 100 TB path — signature size is constant per doc, and
  *    LSH banding turns all-pairs into per-bucket joins.
  *  - simhash64: constant 8 bytes/doc; hamming-ball lookup via bit-band
  *    buckets.
  */
object Dedup {

  /** Exact duplicates on md5(text); `keeper` = min id per group. */
  def exact(df: DataFrame, id: Column, text: Column): DataFrame =
    df.groupBy(md5(text).as("text_md5"))
      .agg(count(lit(1)).as("n_docs"), min(id).as("keeper"))

  /** Exact duplicates on the sorted-distinct-token fingerprint. */
  def byFingerprint(df: DataFrame, id: Column, text: Column): DataFrame =
    df.groupBy(Fingerprint.bagFingerprint(text).as("fp"))
      .agg(count(lit(1)).as("n_docs"), min(id).as("keeper"))

  /** Exact n-gram Jaccard over pairs sharing at least one shingle.
    * Output: (doc_a, doc_b, n_common, jaccard) with doc_a < doc_b,
    * jaccard >= minJaccard.
    *
    * Join shapes are all shuffle-based — NOTHING here is driver-bound:
    * the posting self-join uses a SHUFFLE_HASH hint (build side is
    * per-partition, scales out with partition count; a broadcast of the
    * posting table would OOM the driver beyond one corpus partition),
    * and the two size joins are left to AQE (the sizes table is
    * one-row-per-doc — also not broadcastable at corpus scale).
    *
    * `maxDocFreq`: optional hot-shingle cap — drop shingles appearing in
    * more than this many documents BEFORE the self-join (boilerplate
    * shingles, the stopwords of dedup). The shuffle is O(Σ postings²)
    * per shingle, so one ubiquitous shingle creates a quadratic hot key;
    * the cap bounds every posting list. Sizes (`n_sh`) are computed
    * BEFORE the cap so Jaccard denominators stay exact; pairs whose ONLY
    * shared shingles are capped are missed — at a sane cap those pairs
    * are far below any useful `minJaccard` anyway. `None` = exact.
    *
    * At `minJaccard` ≥ [[PrefixFilterThreshold]] (and no cap) the
    * all-postings self-join is replaced by LOSSLESS prefix filtering
    * (Bayardo/Ma/Srikant WWW'07 "Scaling Up All Pairs Similarity
    * Search"; Xiao et al. PPJoin): under any global total order over
    * shingles, a pair with J ≥ t shares its SMALLEST common shingle
    * within each side's first `|d| − ⌈t·|d|⌉ + 1` shingles — so only
    * those prefixes are indexed and joined, and the (far smaller)
    * candidate set is verified exactly against the full per-doc shingle
    * arrays. Σ postings² over prefixes is ~(1−t)² of the full join's —
    * at t = 0.8 a ~25× candidate-volume cut — and the verification is a
    * codegen `array_intersect` per candidate. Same output, bit for bit:
    * distinct-shingle overlap counts and identical Jaccard arithmetic.
    */
  def ngramJaccardPairs(df: DataFrame, idCol: String, text: Column,
                        n: Int = 3, minJaccard: Double = 0.05,
                        maxDocFreq: Option[Int] = None): DataFrame = {
    if (maxDocFreq.isEmpty && minJaccard >= PrefixFilterThreshold)
      return prefixFilteredPairs(df, idCol, text, n, minJaccard)
    // The shingle table feeds THREE branches (sizes, left, right) and
    // Catalyst does not CSE across them — persist so shingling runs once.
    val sh = Fingerprint.explodedShingleHashes(df, idCol, text, n)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val sizes = sh.groupBy(idCol).agg(count(lit(1)).as("n_sh"))
    val postings = maxDocFreq match {
      case Some(cap) =>
        // document frequency per shingle → keep only sub-cap shingles.
        // One aggregate + a semi join, both shuffle-partitioned by `sh`.
        val keep = sh.groupBy("sh").agg(count(lit(1)).as("__df"))
          .filter(col("__df") <= cap).select("sh")
        sh.join(keep, Seq("sh"), "left_semi")
      case None => sh
    }
    val a = postings.select(col(idCol).as("doc_a"), col("sh"))
    val b = postings.select(col(idCol).as("doc_b"), col("sh"))
    val inter = a.join(b.hint("shuffle_hash"), Seq("sh"))
      .filter(col("doc_a") < col("doc_b"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("n_common"))
    inter
      .join(sizes.select(col(idCol).as("doc_a"), col("n_sh").as("n_a")),
        "doc_a")
      .join(sizes.select(col(idCol).as("doc_b"), col("n_sh").as("n_b")),
        "doc_b")
      .withColumn("jaccard",
        col("n_common") / (col("n_a") + col("n_b") - col("n_common")))
      .filter(col("jaccard") >= minJaccard)
      .select("doc_a", "doc_b", "n_common", "jaccard")
  }

  /** Thresholds at/above which [[ngramJaccardPairs]] switches to prefix
    * filtering: below it the prefix covers most of each doc and the
    * extra verification joins stop paying for themselves. */
  val PrefixFilterThreshold = 0.4

  /** The prefix-filtered exact-Jaccard path ([[ngramJaccardPairs]] doc).
    * The global order is ascending shingle-hash value (validity needs
    * only SOME total order; hash order is free — the per-doc array is
    * sorted once. The AllPairs df-ascending order was tried and
    * MEASURED SLOWER end to end here: joining df back onto 26M postings
    * costs two extra shingle-keyed exchanges, more than the candidate
    * cut returns — PLANS.md r15). Candidate generation joins only
    * per-doc PREFIXES; prefix length `|d| − ⌈t·|d|⌉ + 1` is the tight
    * pigeonhole bound for overlap ≥ ⌈t·|d|⌉ (J ≥ t ⇒ |A∩B| ≥
    * t·max(|A|,|B|)). Candidates are further pruned POSITIONALLY
    * (PPJoin, Xiao et al.): a match at 1-based positions (i, j) of the
    * sorted arrays bounds the overlap by min(|A|−i, |B|−j)+1 — valid
    * for the pair's smallest common shingle, whose row is always
    * present (the prefix theorem), so keeping a pair only when the MAX
    * bound over its matching rows reaches ⌈t/(1+t)·(|A|+|B|)⌉ is
    * lossless, and the max-agg replaces the candidate `distinct` on the
    * same shuffle key (zero extra exchanges). Every ⌈·⌉ carries a −1e-9
    * bias so double rounding can only widen a bound (more candidates,
    * never a missed pair); same for the size-ratio filter (|B| ≥
    * t·|A|). */
  private def prefixFilteredPairs(df: DataFrame, idCol: String,
                                  text: Column, n: Int,
                                  t: Double): DataFrame = {
    val sh = Fingerprint.explodedShingleHashes(df, idCol, text, n)
    // per-doc sorted distinct shingle array: the shingle rows arrive
    // hash-partitioned by id (the window's exchange), so this aggregate
    // adds NO shuffle; the array table is the verification side too
    val arrs = sh.groupBy(idCol)
      .agg(sort_array(collect_list(col("sh"))).as("__arr"))
      .select(col(idCol), col("__arr"),
        size(col("__arr")).cast("long").as("__n"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val prefixLen = (col("__n") -
      ceil(col("__n") * lit(t) - lit(1e-9)) + lit(1)).cast("int")
    val pre = arrs.select(col(idCol), col("__n"),
      posexplode(slice(col("__arr"), lit(1), prefixLen))
        .as(Seq("__pos0", "sh")))
    val a = pre.select(col(idCol).as("doc_a"), col("__n").as("n_a"),
      (col("__pos0") + 1).as("__i"), col("sh"))
    val b = pre.select(col(idCol).as("doc_b"), col("__n").as("n_b"),
      (col("__pos0") + 1).as("__j"), col("sh"))
    val candidates = a.join(b.hint("shuffle_hash"), Seq("sh"))
      .filter(col("doc_a") < col("doc_b"))
      // size-ratio pruning: J ≥ t forces |A|,|B| within a factor t
      .filter(col("n_b") >= col("n_a") * lit(t) - lit(1e-9) &&
        col("n_a") >= col("n_b") * lit(t) - lit(1e-9))
      .groupBy("doc_a", "doc_b", "n_a", "n_b")
      .agg(max(least(col("n_a") - col("__i"), col("n_b") - col("__j")))
        .as("__ub"))
      .filter(col("__ub") + 1 >=
        ceil(lit(t / (1 + t)) * (col("n_a") + col("n_b")) - lit(1e-9)))
      .select("doc_a", "doc_b")
    candidates
      .join(arrs.select(col(idCol).as("doc_a"), col("__arr").as("__aa"),
        col("__n").as("n_a")), "doc_a")
      .join(arrs.select(col(idCol).as("doc_b"), col("__arr").as("__ab"),
        col("__n").as("n_b")), "doc_b")
      .withColumn("n_common",
        size(array_intersect(col("__aa"), col("__ab"))).cast("long"))
      .withColumn("jaccard",
        col("n_common") / (col("n_a") + col("n_b") - col("n_common")))
      .filter(col("jaccard") >= t)
      .select("doc_a", "doc_b", "n_common", "jaccard")
  }

  /** Cross-corpus near-dup audit — dedup a NEW corpus against a
    * REFERENCE corpus (the "don't re-ingest yesterday's training data"
    * pass every incremental crawl needs): for each new document, its
    * best reference match by n-gram Jaccard (highest J, ties broken by
    * smallest ref id), emitted only at J ≥ `minJaccard`. Unmatched new
    * docs are absent — the clean side of an anti-join downstream.
    *
    * Scale shape: identical to [[ngramJaccardPairs]] but two-sided —
    * shingle posting equi-join between the corpora (never all-pairs,
    * never a broadcast of a corpus-sized side), one size aggregate per
    * side, and a per-new-doc struct-max (no window, no global sort).
    * The optional `maxDocFreq` cap drops boilerplate shingles hot in
    * EITHER corpus before the join; Jaccard denominators always use
    * the true (uncapped) shingle counts.
    */
  def crossCorpusBest(newDf: DataFrame, refDf: DataFrame, idCol: String,
                      text: Column, n: Int = 3, minJaccard: Double = 0.5,
                      maxDocFreq: Option[Int] = None): DataFrame = {
    val shNew = Fingerprint.explodedShingleHashes(newDf, idCol, text, n)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val shRef = Fingerprint.explodedShingleHashes(refDf, idCol, text, n)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val (pNew, pRef) = maxDocFreq match {
      case Some(cap) =>
        val keep = shNew.select(col("sh")).unionAll(shRef.select(col("sh")))
          .groupBy("sh").agg(count(lit(1)).as("__df"))
          .filter(col("__df") <= cap).select("sh")
        (shNew.join(keep, Seq("sh"), "left_semi"),
          shRef.join(keep, Seq("sh"), "left_semi"))
      case None => (shNew, shRef)
    }
    val sizesNew = shNew.groupBy(idCol).agg(count(lit(1)).as("n_new"))
    val sizesRef = shRef.groupBy(idCol).agg(count(lit(1)).as("n_ref"))
    val inter = pNew.select(col(idCol).as("doc_id"), col("sh"))
      .join(pRef.select(col(idCol).as("ref_id"), col("sh"))
        .hint("shuffle_hash"), Seq("sh"))
      .groupBy("doc_id", "ref_id").agg(count(lit(1)).as("n_common"))
    inter
      .join(sizesNew.select(col(idCol).as("doc_id"), col("n_new")),
        "doc_id")
      .join(sizesRef.select(col(idCol).as("ref_id"), col("n_ref")),
        "ref_id")
      .withColumn("jaccard",
        col("n_common") / (col("n_new") + col("n_ref") - col("n_common")))
      .filter(col("jaccard") >= minJaccard)
      // best ref per new doc: highest J, ties by smallest ref id.
      // row_number over (J desc, ref_id asc) — TYPE-AGNOSTIC in the id
      // column (a struct-max over -ref_id would cast a string/UUID id
      // to NULL and silently corrupt the audit output); J ties are
      // identical rationals, so the doubles tie identically in every
      // engine. The window partitions on doc_id — same shuffle key the
      // old groupBy used, and the per-doc candidate list is threshold-
      // bounded, so no partition grows with corpus size.
      .withColumn("__rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("doc_id")
          .orderBy(col("jaccard").desc, col("ref_id").asc)))
      .filter(col("__rn") === 1)
      .select(col("doc_id"), col("ref_id"), col("n_common"),
        col("jaccard"))
  }

  /** MinHash signatures: k permutations h_i(x) = (a_i·x + b_i) mod p over
    * xxhash64 shingle hashes. Constant-size per doc; the scalable
    * near-dup representation. Signature as `sig` array column.
    */
  def minhashSignatures(df: DataFrame, idCol: String, text: Column,
                        n: Int = 3, k: Int = 16): DataFrame = {
    // Modulus/coefficient sizes chosen so a*h + b < 2^62 — no long
    // overflow under ANSI mode: h < p < 2^32, a < 2^30.
    val p = 4294967291L // largest prime below 2^32
    val perms = Seq.tabulate(k) { i =>
      // deterministic, seed-free coefficients derived from the index
      val mix = 2862933555777941757L * (i + 1) + 3037000493L
      (math.abs(mix % ((1L << 30) - 1)) + 1, math.abs((mix >> 7) % p))
    }
    val sh = Fingerprint.explodedShingleHashes(df, idCol, text, n)
      .withColumn("h", pmod(col("sh"), lit(p)))
    val aggs = perms.zipWithIndex.map { case ((a, b), i) =>
      min(pmod(col("h") * lit(a) + lit(b), lit(p))).as(s"__m$i")
    }
    sh.groupBy(idCol)
      .agg(count(lit(1)).as("n_shingles"), aggs: _*)
      .withColumn("sig", array(Seq.tabulate(k)(i => col(s"__m$i")): _*))
      .drop(Seq.tabulate(k)(i => s"__m$i"): _*)
  }

  /** Min-wise MD5 signatures — the ORACLE-CHECKABLE minhash variant:
    * signature component i = MIN over shingles of md5(i || '|' ||
    * shingle). md5 is bit-identical in every engine and MIN over its hex
    * strings is a valid min-wise hash family (uniform over a totally
    * ordered universe), so the whole signature reproduces in DuckDB
    * SQL. The xxhash64 form ([[minhashSignatures]]) stays the
    * production path — one 8-byte hash per shingle instead of k
    * 16-byte digests. Shingle strings are built with window `lead`
    * concat (codegen), not higher-order lambdas.
    */
  def minhashSignaturesMd5(df: DataFrame, idCol: String, text: Column,
                           n: Int = 3, k: Int = 8): DataFrame = {
    val sh = Fingerprint.explodedShingles(df, idCol, text, n)
      .select(col(idCol), col("sh")).distinct()
    val aggs = (0 until k).map(i =>
      min(md5(concat(lit(s"$i|"), col("sh")))).as(s"__m$i"))
    sh.groupBy(idCol)
      .agg(count(lit(1)).as("n_shingles"), aggs: _*)
      .withColumn("sig", array((0 until k).map(i => col(s"__m$i")): _*))
      .drop((0 until k).map(i => s"__m$i"): _*)
  }

  /** LSH banding over MinHash signatures → candidate pairs.
    * Docs agreeing on ALL rows of any band collide; near-dup probability
    * 1-(1-J^rows)^bands. Per-bucket self-join — never all-pairs.
    * Works over numeric (xxhash64) or string (md5) signature arrays.
    */
  def minhashLshCandidates(sigsIn: DataFrame, idCol: String,
                           rowsPerBand: Int = 2, k: Int = 16): DataFrame = {
    val bands = k / rowsPerBand
    // signatures feed both sides of the bucket self-join — persist
    val sigs = sigsIn.persist(
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val banded = sigs.select(
      col(idCol),
      posexplode(array(Seq.tabulate(bands) { bi =>
        struct(lit(bi).as("band"),
          concat_ws("_", (0 until rowsPerBand)
            .map(r => col("sig").getItem(bi * rowsPerBand + r)): _*).as("key"))
      }: _*)))
      .select(col(idCol), col("col.band"), col("col.key"))
    val l = banded.select(col(idCol).as("doc_a"), col("band"), col("key"))
    val r = banded.select(col(idCol).as("doc_b"), col("band"), col("key"))
    // Shuffle equi-join on (band, key): the banded table is O(docs ×
    // bands) — it GROWS with the corpus, so it must never be broadcast
    // (driver-bound). The bucket key IS the partitioning: each reducer
    // sees only its own buckets, which is the entire point of LSH at
    // 100 TB. SHUFFLE_HASH keeps the per-bucket build in-memory without
    // a sort; AQE handles skewed buckets.
    l.join(r.hint("shuffle_hash"), Seq("band", "key"))
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b").distinct()
  }

  /** 64-bit SimHash from token xxhash64s — each bit j is the sign of
    * Σ_tokens (bit_j(hash) ? +1 : -1). Pure DataFrame: explode + one
    * aggregation with 64 conditional sums, reassembled with shifts.
    */
  def simhash64(df: DataFrame, idCol: String, text: Column): DataFrame = {
    // Spread.up: tokenize + 64 conditional partial sums are the CPU
    // kernel; a one-split scan would run them single-threaded
    val toks = Spread.up(df.select(col(idCol), text.as("__t")), col(idCol))
      .select(col(idCol), explode(TextStats.tokens(col("__t"))).as("tok"))
      .withColumn("h", xxhash64(col("tok")))
    val bitSums = Seq.tabulate(64) { j =>
      sum(when(shiftright(col("h"), j).bitwiseAND(1) === 1, 1)
        .otherwise(-1)).as(s"__b$j")
    }
    val agg = toks.groupBy(idCol).agg(count(lit(1)).as("n_tokens"), bitSums: _*)
    val sim = Seq.tabulate(64) { j =>
      when(col(s"__b$j") > 0, shiftleft(lit(1L), j)).otherwise(0L)
    }.reduce(_ + _)
    agg.withColumn("simhash", sim)
      .drop(Seq.tabulate(64)(j => s"__b$j"): _*)
  }

  /** Hamming distance between two simhash values (for bucket verify). */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** MD5-based SimHash emitted as a 64-char '0'/'1' string — the
    * oracle-checkable variant: token bit j comes from hex digit j/4 of
    * md5(token) (digit value via position in "0123456789abcdef", bit via
    * integer div/mod — exact integer arithmetic in every engine), and
    * the output avoids 64-bit assembly entirely (bit 63 would overflow
    * BIGINT differently across engines). [[simhash64]] (xxhash64 →
    * one BIGINT) stays the production representation. */
  def simhashMd5Bits(df: DataFrame, idCol: String, text: Column): DataFrame = {
    // LANE-PACKED bit counters: the naive form is 64 aggregate
    // expressions (one ±1 CASE-sum per bit), and at bench scale its
    // cost is dominated by the generated-code size of the 65-aggregate
    // plan, not by data (270k tokens; measured 3.3–4.0 s at sf0.1).
    // Instead each hex digit's four bit counters ride in one LONG as
    // four 16-bit lanes: per token, digit i maps through a 16-entry
    // literal lookup to bit0 + bit1·2^16 + bit2·2^32 + bit3·2^48, and
    // ONE sum per digit position accumulates all four counters (16
    // sums total). Unpack is shiftright+mask; the sign test
    // 2·Σbit > n equals the old Σ(±1) > 0 exactly (Σ(±1) = 2·Σbit − n,
    // integer arithmetic). Measured 4.0 → 1.6 s at sf0.1; bit-exact
    // vs the 64-sum form (EXCEPT-verified).
    //
    // Lane bound: a counter saturates at 65535, so a single document
    // with ≥ 65536 whitespace tokens (~400 KB of text) would carry
    // into the next lane — that is outside this operator's contract
    // (chunk first, or use [[simhash64]]) and FAILS LOUD via
    // raise_error below rather than returning a silently-wrong hash.
    val lut = typedLit(Seq.tabulate(16) { d =>
      (0 until 4).map(k => ((d >> k) & 1).toLong << (16 * k)).sum
    })
    val packed = Seq.tabulate(16) { i =>
      // instr is 1-based: digit value d arrives as d+1, the lut index
      element_at(lut, instr(lit("0123456789abcdef"),
        substring(col("__h"), 1 + i, 1)).cast("int")).as(s"__p$i")
    }
    // Spread.up: md5-per-token + 16 lane-packed partial sums are the
    // CPU kernel — same one-split-scan rationale as [[simhash64]]
    val toks = Spread.up(df.select(col(idCol), text.as("__t")), col(idCol))
      .select(col(idCol), explode(TextStats.tokens(col("__t"))).as("tok"))
      .withColumn("__h", md5(col("tok")))
      .select(col(idCol) +: packed: _*)
    val sums = Seq.tabulate(16)(i => sum(col(s"__p$i")).as(s"__s$i"))
    val agg = toks.groupBy(idCol).agg(count(lit(1)).as("n_tokens"), sums: _*)
    val bits = concat(Seq.tabulate(64) { j =>
      val cnt = shiftright(col(s"__s${j / 4}"), 16 * (j % 4))
        .bitwiseAND(lit(65535L))
      when(cnt * 2 > col("n_tokens"), lit("1")).otherwise(lit("0"))
    }: _*)
    agg.withColumn("simhash_bits",
        when(col("n_tokens") >= 65536, raise_error(concat(
          lit("simhashMd5Bits lane bound: document "), col(idCol).cast("string"),
          lit(" has "), col("n_tokens").cast("string"),
          lit(" tokens (>= 65536) — chunk it or use simhash64"))))
          .otherwise(bits))
      .drop(Seq.tabulate(16)(i => s"__s$i"): _*)
  }
}
