package graft.queries

import java.security.MessageDigest

import graft.{GraftQuery, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over the `embeddings` table
  * (`Array[Float]`, 64 dims): brute-force cosine top-k as the baseline, and
  * a 4-table × 8-bit random-hyperplane LSH variant as the scale path.
  *
  * Bit-exactness contract with the DuckDB oracle: every dot product is a
  * sequential left-fold over the same element order (Spark `aggregate` ≡
  * DuckDB `list_reduce`), norms are sqrt of the self-fold, hyperplanes are
  * ±1 literals computed once on the driver and embedded identically in both
  * dialects.
  */
object Similarity {

  /** Left-fold dot product — Spark side. Compiled (graft.plans.DotFold);
    * the higher-order `aggregate(zip_with(...))` spelling is bit-identical
    * but runs interpreted, which made pairwise cosines the engine's
    * hotspot at sf0.1. Callers must have run GraftExtensions.install
    * (normedVectors does). */
  def dot(a: Column, b: Column): Column = call_function("dot_fold", a, b)

  /** Left-fold dot product — DuckDB side (same order, same IEEE ops). */
  def dotSql(a: String, b: String): String =
    s"list_reduce(list_transform(generate_series(1, 64), i -> $a[i] * $b[i]), (x, y) -> x + y)"

  /** embeddings as double vectors with precomputed L2 norms (shared by q33
    * — normalizing once keeps every downstream cosine a single fold).
    *
    * Zero-norm vectors are EXCLUDED, in both dialects: nrm=0 makes every
    * cosine 0/0 = NaN, and the engines then disagree silently — Spark's
    * `NaN >= t` join conditions are false while DuckDB's total float
    * order ranks NaN above everything, so the same threshold admits the
    * pair in the oracle and drops it in the engine. No current testdata
    * vector is zero (hashes unchanged); the guard closes the class. */
  def normedVectors(spark: SparkSession, dir: String): DataFrame =
    normedVectorsOf(spark, Tables.embeddings(spark, dir))

  /** Frame-based core of [[normedVectors]] — for callers whose vectors
    * do not live in a corpus dir (a query batch, an ingest epoch's
    * admitted slice). Expects (vec_id, label, embedding). */
  def normedVectorsOf(spark: SparkSession, embeddings: DataFrame): DataFrame = {
    graft.plans.GraftExtensions.install(spark)
    val v = transform(col("embedding"), x => x.cast("double"))
    embeddings
      .select(col("vec_id"), col("label"), v.as("v"))
      // explicit-count repartition: one source file = one scan partition,
      // and AQE would coalesce this small exchange (see Dedup.shingleDf)
      .repartition(spark.sparkContext.defaultParallelism, col("vec_id"))
      .withColumn("nrm", sqrt(dot(col("v"), col("v"))))
      .filter(col("nrm") > 0)
  }

  val normedVectorsSql: String =
    s"""e AS (
      SELECT vec_id, label, v, nrm FROM (
        SELECT vec_id, label, v, sqrt(${dotSql("v", "v")}) AS nrm
        FROM (SELECT vec_id, label,
                     list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
              FROM embeddings))
      WHERE nrm > 0)"""

  /** Deterministic ±1.0 hyperplanes: component d of plane p is +1 iff the
    * first hex nibble of md5("p:d") has its high bit set. The formula
    * defines plane p for EVERY p, so the pool is unbounded — adaptive
    * bandings ([[adaptiveBanding]]) that need more than the default 32
    * planes (4 LSH tables × 8 bits) simply read further into it; the
    * first 32 are byte-identical to the original pool, so every embedded
    * literal (and the oracle SQL) is unchanged. */
  private[queries] def hyperplanePool(count: Int): IndexedSeq[IndexedSeq[Double]] = {
    val mdig = MessageDigest.getInstance("MD5")
    def md5hex(s: String): String =
      mdig.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    (0 until count).map(p => (0 until 64).map(d =>
      if (md5hex(s"$p:$d").charAt(0) >= '8') 1.0 else -1.0))
  }
  private[queries] val hyperplanes: IndexedSeq[IndexedSeq[Double]] =
    hyperplanePool(32)

  /** Corpus-adaptive LSH banding for the hard-negative path (q125's
    * scale knob, derived instead of statically sized) — two cost terms,
    * calibrated by the round-15 probe (SCALING.md):
    *
    *  - `bits` from COST BALANCE between the two stages that actually
    *    pay for banding: signatures cost n·tables·bits plane-dots, the
    *    candidate re-rank costs anchors·tables·(n/2^bits) cosine-dots,
    *    so their ratio is anchors/(bits·2^bits) and the balanced width
    *    is the smallest b with b·2^b ≥ anchors. At q125's 20-anchor set
    *    that is b ≤ 4 — which is WHY the probe measured the static 8×4
    *    beating a pure occupancy-driven sizing (recall 0.87–0.90 vs
    *    0.63–0.65 at 30×/100×, AND faster wall: extra tables×bits buys
    *    signature cost that a 20-anchor probe volume never repays). At
    *    a production anchor set (10⁶ anchors — every doc mined for
    *    negatives) the same balance gives b = 16.
    *  - `bits` also floors at an OCCUPANCY CAP: expected bucket size
    *    n/2^bits stays under [[MaxBucketOccupancy]] so per-bucket
    *    shuffle/memory stays bounded however few anchors there are.
    *    The cap is generous (16 384) because the probe measured
    *    occupancy 12 400/bucket (100×, 4 bits) as NOT binding — the
    *    re-rank there is 2M dots, cheaper than one extra signature bit.
    *  - `tables` from RECALL: longer bands collide less (per-bit
    *    collision prob p < 1 ⇒ per-table p^bits), so OR-amplification
    *    must grow with bits. Exact compensation needs tables ∝ p^-Δbits
    *    (exponential — its own blow-up); 4 extra tables per extra bit
    *    is the linear compromise, capped at [[MaxTables]].
    *
    * Floor of [[MinBits]] = 4 — the measured sweet spot for the
    * low-cosine hard-negative regime (recall 0.67–0.77 at 8×4 vs 0.03
    * at 4×8 on the test corpus). At the oracle corpora (n = 500 / 2000,
    * 20 anchors) everything resolves to the DEFAULT 8×4, which is what
    * keeps q125 hash-checkable against its static oracle SQL — pinned
    * in DedupSimilaritySpec so a testdata resize fails loudly there,
    * not silently at the oracle gate. Probed recall at 30×/100×/300×
    * is in SCALING.md round 15. */
  def adaptiveBanding(n: Long, anchors: Long = AnchorCount): (Int, Int) = {
    val bitsBalance = (1 to 30)
      .find(b => b.toLong * (1L << b) >= anchors).getOrElse(30)
    val bitsOcc = math.ceil(
      math.log(math.max(n, 1L).toDouble / MaxBucketOccupancy) /
        math.log(2.0)).toInt
    val bits = Seq(MinBits, bitsBalance, bitsOcc).max
    val tables = math.min(MaxTables, 8 + 4 * (bits - MinBits))
    (tables, bits)
  }
  private[queries] val MaxBucketOccupancy = 16384
  private[queries] val MinBits = 4
  private[queries] val MaxTables = 32

  /** The anchor-set size of THIS module's query fixtures — the literal
    * count behind every `vec_id < 20` anchor predicate (q34/q35/q37/q38/
    * q122/q125). It is also [[adaptiveBanding]]'s `anchors` default, so
    * the default is only right for callers sharing that predicate:
    * production callers (mine negatives for every doc ⇒ anchors ≈ n)
    * must pass their own estimate or the balance term under-sizes
    * `bits`. [[lshTopKAdaptive]] passes it explicitly to keep the
    * coupling visible. */
  private[queries] val AnchorCount = 20L

  /** Q34: brute-force cosine top-5 for the first 20 vectors as queries.
    * The full candidate scan is the recall=1.0 baseline; at 100 TB the
    * query side is broadcast and each executor scans its candidate
    * partition once — still one shuffle (the top-k per query), handled as
    * partial per-partition heaps by TakeOrdered-style aggregation. */
  /** Shared scaffold of q34 (all neighbors) and q122 (cross-label
    * neighbors only): broadcast anchors (vec_id < 20) against the full
    * candidate scan, exact cosine, row_number top-k per anchor — ONE
    * definition of the tie rule and the anchor set, in both engines. */
  private[queries] def cosineTopK(spark: SparkSession, dir: String, k: Int,
      crossLabelOnly: Boolean): DataFrame = {
    val e = normedVectors(spark, dir)
    val q = e.filter(col("vec_id") < 20)
    val cos = dot(col("q.v"), col("c.v")) / (col("q.nrm") * col("c.nrm"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("neighbor_id"))
    val base = col("q.vec_id") =!= col("c.vec_id")
    val cond = if (crossLabelOnly) base && col("q.label") =!= col("c.label")
               else base
    val cols =
      if (crossLabelOnly)
        Seq(col("q.vec_id").as("query_id"), col("q.label").as("query_label"),
          col("c.vec_id").as("neighbor_id"),
          col("c.label").as("neighbor_label"), cos.as("cosine"))
      else
        Seq(col("q.vec_id").as("query_id"),
          col("c.vec_id").as("neighbor_id"), cos.as("cosine"))
    broadcast(q.as("q")).join(e.as("c"), cond)
      .select(cols: _*)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .orderBy("query_id", "rank")
  }

  private def cosineTopKSql(k: Int, crossLabelOnly: Boolean): String = {
    val labelCond = if (crossLabelOnly) " AND q.label <> c.label" else ""
    val labelCols =
      if (crossLabelOnly) "q.label AS query_label, c.label AS neighbor_label,"
      else ""
    val outCols =
      if (crossLabelOnly)
        "query_id, query_label, neighbor_id, neighbor_label, cosine, rank"
      else "query_id, neighbor_id, cosine, rank"
    s"""
      WITH $normedVectorsSql,
      scored AS (
        SELECT q.vec_id AS query_id, $labelCols
               c.vec_id AS neighbor_id,
               ${dotSql("q.v", "c.v")} / (q.nrm * c.nrm) AS cosine
        FROM e q JOIN e c ON q.vec_id <> c.vec_id$labelCond
        WHERE q.vec_id < 20),
      ranked AS (
        SELECT *, row_number() OVER (PARTITION BY query_id
                                     ORDER BY cosine DESC, neighbor_id) AS rank
        FROM scored)
      SELECT $outCols
      FROM ranked WHERE rank <= $k
      ORDER BY query_id, rank"""
  }

  private[queries] val q34 = GraftQuery(
    "q34_knn_bruteforce",
    (spark, dir) => cosineTopK(spark, dir, k = 5, crossLabelOnly = false),
    Some(cosineTopKSql(k = 5, crossLabelOnly = false)),
    headline = true)

  /** Q35: LSH-bucketed ANN — 4 hash tables of 8 sign-bits each
    * (OR-amplification: a pair is a candidate if it collides in ANY table),
    * exact cosine re-rank of candidates, top-5 per query.
    *
    * Scale shape: signatures are a narrow map; the candidate join is keyed
    * on (table, signature) so work scales with bucket occupancy, not N².
    * Recall vs q34 is checked in SimilaritySpec. */
  /** One signature row per (vector, table): (vec_id, label, tbl, sig,
    * v, nrm) — the persistable form of the LSH index ([[graft.sources.
    * AnnIndex]] writes it bucketed by sig for bucket-pruned probes). v
    * and nrm ride along (×tables storage) so the exact re-rank needs no
    * second corpus join. Same pool, same sign rule as [[lshTopK]]. */
  private[graft] def signatureRows(spark: SparkSession, dir: String,
      tables: Int, bits: Int): DataFrame =
    signatureRowsOf(normedVectors(spark, dir), tables, bits)

  /** [[signatureRows]] over an already-normed vector frame (vec_id,
    * label, v, nrm) — the form a point-query caller uses to sign its OWN
    * query vectors for [[graft.sources.AnnIndex.topKFor]], and the
    * ingest path uses to sign an admitted epoch before append. */
  private[graft] def signatureRowsOf(vectors: DataFrame,
      tables: Int, bits: Int): DataFrame = {
    val pool =
      if (tables * bits <= 32) hyperplanes else hyperplanePool(tables * bits)
    def sig(t: Int): Column = concat((0 until bits).map { j =>
      val hp = typedLit(pool(t * bits + j))
      when(dot(col("v"), hp) > 0, "1").otherwise("0")
    }: _*)
    vectors.select(col("vec_id") +: col("label") +: col("v") +: col("nrm") +:
        (0 until tables).map(t => sig(t).as(s"s$t")): _*)
      .select(col("vec_id"), col("label"), col("v"), col("nrm"),
        posexplode(array((0 until tables).map(t => col(s"s$t")): _*)))
      .toDF("vec_id", "label", "v", "nrm", "tbl", "sig")
  }

  /** Multi-probe expansion of a signature-row frame (…, tbl, sig) — the
    * query-side recall dial from Lv et al., "Multi-Probe LSH" (VLDB'07,
    * public paper): beside its exact bucket, each query row also probes
    * every bucket at HAMMING RADIUS 1 (one sign bit flipped), turning
    * near-miss hyperplane crossings — the dominant sign-LSH failure
    * mode for vectors near a boundary — into collisions. bits+1 rows
    * per input row, all other columns carried; everything downstream
    * (the candidate join, the (query, neighbor) dedup, the persisted
    * store's bucket pruning) is unchanged, which is the technique's
    * whole point: MORE RECALL FROM THE SAME PERSISTED INDEX — no
    * reband, no extra tables, no store rewrite. The query pays ~bits×
    * more bucket probes; the store pays nothing. Contrast the OTHER
    * recall lever, [[graft.sources.AnnIndex.reband]]: that one
    * re-signs the whole store (a measured 36.5 s rewrite at 600 k
    * rows) and moves the operating point for every query thereafter;
    * multi-probe is per-query and free to mix — the natural order is
    * multi-probe first, reband when adaptiveBanding's rule moves. */
  private[graft] def multiProbeExpand(sigRows: DataFrame,
      bits: Int): DataFrame = {
    def flipAt(i: Int): Column = concat(
      substring(col("sig"), 1, i),
      when(substring(col("sig"), i + 1, 1) === "1", lit("0"))
        .otherwise(lit("1")),
      substring(col("sig"), i + 2, bits - i - 1))
    val others = sigRows.columns.filter(_ != "sig").map(col).toSeq
    sigRows.select(others :+ explode(
      array(col("sig") +: (0 until bits).map(flipAt): _*)).as("sig"): _*)
  }

  /** q35's scaffold with the query side [[multiProbeExpand]]ed — the
    * q145 recompute spelling. Candidate set ⊇ q35's by construction
    * (the exact bucket is probe 0), so recall vs the exact ranking can
    * only rise; the exact re-rank and tie rule are unchanged. */
  private[queries] def lshTopKMultiProbe(spark: SparkSession, dir: String,
      k: Int, tables: Int = 4, bits: Int = 8): DataFrame = {
    val e = normedVectors(spark, dir)
    val sigs = signatureRowsOf(e, tables, bits)
      .select("vec_id", "tbl", "sig")
    val qprobe = multiProbeExpand(sigs.filter(col("vec_id") < 20), bits)
    val cand = qprobe.as("x").join(sigs.as("y"),
        col("x.tbl") === col("y.tbl") && col("x.sig") === col("y.sig") &&
          col("x.vec_id") =!= col("y.vec_id"))
      .select(col("x.vec_id").as("query_id"),
        col("y.vec_id").as("neighbor_id"))
      .distinct()
    val cos = dot(col("q.v"), col("c.v")) / (col("q.nrm") * col("c.nrm"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("neighbor_id"))
    cand
      .join(e.as("q"), col("q.vec_id") === col("query_id"))
      .join(e.as("c"), col("c.vec_id") === col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"), cos.as("cosine"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .orderBy("query_id", "rank")
  }

  /** Shared LSH scaffold of q35 (all neighbors) and q125 (cross-label
    * neighbors only — the corpus-scale hard-negative path): 4-table ×
    * 8-bit sign signatures, candidate join keyed on (table, signature),
    * exact cosine re-rank, top-k per query — ONE definition of the
    * banding, candidate dedup, and tie rule, in both engines. The
    * cross-label filter rides in the CANDIDATE join, so same-label pairs
    * die at the bucket probe before any cosine is computed. */
  private[queries] def lshTopK(spark: SparkSession, dir: String, k: Int,
      crossLabelOnly: Boolean, tables: Int = 4, bits: Int = 8,
      multiProbe: Boolean = false): DataFrame = {
    val pool =
      if (tables * bits <= 32) hyperplanes else hyperplanePool(tables * bits)
    val e = normedVectors(spark, dir)
    def sig(t: Int): Column = concat((0 until bits).map { j =>
      val hp = typedLit(pool(t * bits + j))
      when(dot(col("v"), hp) > 0, "1").otherwise("0")
    }: _*)
    val sigCols = Seq(col("vec_id")) ++
      (if (crossLabelOnly) Seq(col("label")) else Nil) ++
      (0 until tables).map(t => sig(t).as(s"s$t"))
    val explodeCols = Seq(col("vec_id")) ++
      (if (crossLabelOnly) Seq(col("label")) else Nil) :+
      posexplode(array((0 until tables).map(t => col(s"s$t")): _*))
    val sigNames = (Seq("vec_id") ++
      (if (crossLabelOnly) Seq("label") else Nil)) ++ Seq("tbl", "sig")
    val sigs = e.select(sigCols: _*)
      .select(explodeCols: _*)
      .toDF(sigNames: _*)
    val baseCond = col("x.tbl") === col("y.tbl") &&
      col("x.sig") === col("y.sig") && col("x.vec_id") =!= col("y.vec_id")
    val cond = if (crossLabelOnly) baseCond && col("x.label") =!= col("y.label")
               else baseCond
    // the query side optionally multi-probe-expands (the q145 dial on
    // this scaffold — the hard-negative recompute reference for the
    // expanded serving probes); single-probe plans are unchanged (the
    // anchor filter merely moves above the join, where the optimizer
    // pushed it anyway)
    val qsigs0 = sigs.filter(col("vec_id") < 20)
    val qsigs = if (multiProbe) multiProbeExpand(qsigs0, bits) else qsigs0
    val cand = qsigs.as("x").join(sigs.as("y"), cond)
      .select(col("x.vec_id").as("query_id"), col("y.vec_id").as("neighbor_id"))
      .distinct()
    val cos = dot(col("q.v"), col("c.v")) / (col("q.nrm") * col("c.nrm"))
    val w = Window.partitionBy("query_id").orderBy(col("cosine").desc, col("neighbor_id"))
    val outCols =
      if (crossLabelOnly)
        Seq(col("query_id"), col("q.label").as("query_label"),
          col("neighbor_id"), col("c.label").as("neighbor_label"),
          cos.as("cosine"))
      else Seq(col("query_id"), col("neighbor_id"), cos.as("cosine"))
    cand
      .join(e.as("q"), col("q.vec_id") === col("query_id"))
      .join(e.as("c"), col("c.vec_id") === col("neighbor_id"))
      .select(outCols: _*)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .orderBy("query_id", "rank")
  }

  /** The LSH ranking as a COMPOSABLE CTE chain ending in relation `rel`
    * (query_id[, labels], neighbor_id, cosine, rank ≤ k) — assumes the
    * caller's WITH already defines `e` ([[normedVectorsSql]]). Anchor
    * predicate parameterized so q136's hybrid oracle can fuse this with
    * the BM25 chain in ONE statement ([[lshTopKSql]] wraps it for the
    * standalone q35/q125/q135 oracles). */
  /** The `sigs` + `rows_` CTE pair — THE one SQL spelling of the sign
    * rule, pool selection, and per-table signature rows, shared by the
    * single-probe oracles ([[lshRankedSqlCtes]]) and the multi-probe
    * oracle ([[multiProbeSql]]): two copies of this construction ~500
    * lines apart would let a future pool/fold change regenerate one
    * oracle from the old rule and hash-compare Spark against a stale
    * spelling. Assumes `e` in scope. */
  private def sigRowsSqlCtes(tables: Int, bits: Int,
      labelSel: String): String = {
    val pool =
      if (tables * bits <= 32) hyperplanes else hyperplanePool(tables * bits)
    def hpLit(p: Int): String = pool(p).mkString("[", ", ", "]")
    def sigSql(t: Int): String = (0 until bits).map { j =>
      s"""CASE WHEN list_reduce(list_transform(generate_series(1, 64),
            i -> v[i] * (${hpLit(t * bits + j)})[i]), (x, y) -> x + y) > 0
          THEN '1' ELSE '0' END"""
    }.mkString(" || ")
    val sigSelect = (0 until tables).map(t => s"${sigSql(t)} AS s$t").mkString(", ")
    val sigRows = (0 until tables)
      .map(t => s"SELECT vec_id, $labelSel$t AS tbl, s$t AS sig FROM sigs")
      .mkString(" UNION ALL ")
    s"""sigs AS (SELECT vec_id, $labelSel$sigSelect FROM e),
    rows_ AS ($sigRows)"""
  }

  private[queries] def lshRankedSqlCtes(k: Int, crossLabelOnly: Boolean,
      tables: Int, bits: Int, anchorPredSql: String, rel: String): String = {
    val labelSel = if (crossLabelOnly) "label, " else ""
    val labelCond = if (crossLabelOnly) " AND x.label <> y.label" else ""
    val labelCols =
      if (crossLabelOnly) "q.label AS query_label, c.label AS neighbor_label,"
      else ""
    s"""${sigRowsSqlCtes(tables, bits, labelSel)},
    cand AS (
      SELECT DISTINCT x.vec_id AS query_id, y.vec_id AS neighbor_id
      FROM rows_ x JOIN rows_ y
        ON x.tbl = y.tbl AND x.sig = y.sig AND x.vec_id <> y.vec_id$labelCond
      WHERE $anchorPredSql),
    lscored AS (
      SELECT query_id, $labelCols neighbor_id,
             ${dotSql("q.v", "c.v")} / (q.nrm * c.nrm) AS cosine
      FROM cand
      JOIN e q ON q.vec_id = query_id
      JOIN e c ON c.vec_id = neighbor_id),
    $rel AS (
      SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY cosine DESC, neighbor_id) AS rank
      FROM lscored QUALIFY rank <= $k)"""
  }

  private def lshTopKSql(k: Int, crossLabelOnly: Boolean,
      tables: Int = 4, bits: Int = 8): String = {
    val outCols =
      if (crossLabelOnly)
        "query_id, query_label, neighbor_id, neighbor_label, cosine, rank"
      else "query_id, neighbor_id, cosine, rank"
    s"""
    WITH $normedVectorsSql,
    ${lshRankedSqlCtes(k, crossLabelOnly, tables, bits, "x.vec_id < 20", "lranked")}
    SELECT $outCols
    FROM lranked
    ORDER BY query_id, rank"""
  }

  /** RAW embeddings row count — what [[adaptiveBanding]] sizes against.
    * A count() over a bare parquet scan is answered from footer metadata
    * (no column decode), unlike normedVectors().count() which decodes
    * every vector and computes norms just to drop the zero-norm rows;
    * banding needs order-of-magnitude n only, so the handful of
    * zero-norm vectors the plan later excludes cannot move the chosen
    * (tables, bits). At 100 TB this really is catalog metadata. The
    * DedupSimilaritySpec tripwire counts THIS SAME number, so the spec
    * and the live entry point can never straddle a banding boundary. */
  private[graft] def corpusCount(spark: SparkSession, dir: String): Long = {
    val sig = listingSignature(dir)
    corpusCountCache.compute(dir, (_, prev) =>
      if (prev != null && prev._1 == sig) prev
      else (sig, Tables.embeddings(spark, dir).count()))._2
  }

  /** Per-directory memo KEYED ON the file-listing signature: the count
    * is immutable for a given (dir, files) pair (production reads it
    * from the catalog, which is exactly what a driver-side memo of a
    * footer-metadata count emulates), but a dir REWRITTEN in-process —
    * overwrite writes, as several specs do to temp dirs — must not serve
    * the stale count and silently size the wrong banding. The signature
    * is a driver-side listing (name, length, mtime per data file):
    * metadata-class like the count itself, so the memo still saves the
    * Spark job on repeated q125 invocations — bench passes, composed
    * pipelines — while any rewrite invalidates it. */
  private val corpusCountCache =
    new java.util.concurrent.ConcurrentHashMap[String, (String, Long)]()

  private def listingSignature(dir: String): String =
    Tables.listingSignature(dir, "embeddings")

  /** [[lshTopK]] with (tables, bits) CHOSEN by [[adaptiveBanding]] from
    * [[corpusCount]] — the q125 entry point. The count is driver-side,
    * before the plan is built: banding shapes the plan's signature
    * columns, so it cannot be a runtime expression. The anchor estimate
    * passed to the balance term is [[AnchorCount]] — the literal count
    * of q125's own anchor predicate (`vec_id < 20`), not a guess; a
    * caller mining negatives for a different anchor set owns its own
    * estimate and calls [[adaptiveBanding]]/[[lshTopK]] directly.
    *
    * `oracleBanding`: when this entry point carries a STATIC oracle SQL
    * (q125 does — DuckDB replays a fixed 8×4), the adaptive resolution
    * must match it or the oracle gate would hash-compare two different
    * plans; the require fails loudly AT THE GATE with the regeneration
    * instruction, complementing the DedupSimilaritySpec tripwire. */
  private[queries] def lshTopKAdaptive(spark: SparkSession, dir: String,
      k: Int, crossLabelOnly: Boolean,
      oracleBanding: Option[(Int, Int)] = None): DataFrame = {
    val n = corpusCount(spark, dir)
    val banding = adaptiveBanding(n, anchors = AnchorCount)
    oracleBanding.foreach { ob =>
      require(banding == ob,
        s"corpus ($n vecs) resolves adaptive banding $banding but the attached " +
          s"oracle SQL is static at $ob — regenerate the oracle at the new banding")
    }
    lshTopK(spark, dir, k, crossLabelOnly, banding._1, banding._2)
  }

  private[queries] val q35 = GraftQuery(
    "q35_ann_lsh",
    (spark, dir) => lshTopK(spark, dir, k = 5, crossLabelOnly = false),
    Some(lshTopKSql(k = 5, crossLabelOnly = false)),
    headline = true)

  /** Q135: the INDEX-SERVED spelling of q35 — q134's symmetry on the
    * vector side: same anchors, same banding, same output, SAME DuckDB
    * oracle; the signatures come from the persisted
    * [[graft.sources.AnnIndex]] (built once per corpus via the
    * listing-keyed memo, probed bucket-pruned) instead of being
    * recomputed per run. The oracle gate hash-comparing this row
    * against q35's SQL at both SFs is the end-to-end parity proof on
    * top of AnnIndexSpec's direct probe≡lshTopK pin — the
    * build-once/probe-many deployment is now oracle-gated on BOTH index
    * families. */
  private[queries] val q135 = GraftQuery(
    "q135_ann_index_probe",
    (spark, dir) => {
      val table = graft.sources.AnnIndex.ensureFor(spark, dir, tag = "q135")
      graft.sources.AnnIndex.topK(spark, table, nAnchors = 20, k = 5)
    },
    Some(lshTopKSql(k = 5, crossLabelOnly = false)),
    headline = true)

  /** Q37: IVF-style ANN — coarse quantization against 8 deterministic
    * centroids (the first 8 vectors stand in for k-means centers; the
    * assignment machinery is identical), then exact top-3 over the
    * query's TWO nearest cells (n-probe = 2; database vectors live in
    * exactly one cell).
    *
    * Scale shape: assignment is a broadcast cross join against the tiny
    * centroid set + one window per vector; search touches n-probe cells
    * (≈ 2/8 of candidates here), which is exactly how IVF indexes trade
    * recall for scan volume at 100 TB — single-probe drops neighbors
    * whose cell boundary passes between query and neighbor. */
  private val q37 = GraftQuery(
    "q37_ivf_ann",
    (spark, dir) => {
      val e = normedVectors(spark, dir)
      val cent = e.filter(col("vec_id") < 8)
        .select(col("vec_id").as("c_id"), col("v").as("cv"), col("nrm").as("cnrm"))
      val simToCent = dot(col("v"), col("cv")) / (col("nrm") * col("cnrm"))
      val wAssign = Window.partitionBy("vec_id")
        .orderBy(col("c_sim").desc, col("c_id"))
      val rankedCells = e.crossJoin(broadcast(cent))
        .select(col("vec_id"), col("c_id"), simToCent.as("c_sim"))
        .withColumn("rn", row_number().over(wAssign))
      val assign = rankedCells.filter(col("rn") === 1)
        .select(col("vec_id"), col("c_id").as("cell"))
      val probes = rankedCells.filter(col("rn") <= 2)
        .select(col("vec_id"), col("c_id").as("cell"))
      val cos = dot(col("q.v"), col("c.v")) / (col("q.nrm") * col("c.nrm"))
      val wRank = Window.partitionBy("query_id").orderBy(col("cosine").desc, col("neighbor_id"))
      probes.as("qa").filter(col("qa.vec_id") < 20)
        .join(assign.as("ca"),
          col("qa.cell") === col("ca.cell") && col("qa.vec_id") =!= col("ca.vec_id"))
        .select(col("qa.vec_id").as("query_id"), col("ca.vec_id").as("neighbor_id"))
        .join(e.as("q"), col("q.vec_id") === col("query_id"))
        .join(e.as("c"), col("c.vec_id") === col("neighbor_id"))
        .select(col("query_id"), col("neighbor_id"), cos.as("cosine"))
        .withColumn("rank", row_number().over(wRank))
        .filter(col("rank") <= 3)
        .orderBy("query_id", "rank")
    },
    Some(ivfTopKSql),
    headline = true)

  /** q37's oracle, shared with q137 (the index-served spelling probes
    * the persisted cell store against the SAME SQL — the q134/q135
    * register-against-the-recompute-oracle pattern on the IVF family). */
  private lazy val ivfTopKSql: String = s"""
      WITH $normedVectorsSql,
      cent AS (
        SELECT vec_id AS c_id, v AS cv, nrm AS cnrm FROM e WHERE vec_id < 8),
      ranked_cells AS (
        SELECT e.vec_id, cent.c_id AS cell,
               row_number() OVER (PARTITION BY e.vec_id
                 ORDER BY ${dotSql("e.v", "cent.cv")} / (e.nrm * cent.cnrm) DESC, cent.c_id) AS rn
        FROM e CROSS JOIN cent),
      assign AS (SELECT vec_id, cell FROM ranked_cells WHERE rn = 1),
      probes AS (SELECT vec_id, cell FROM ranked_cells WHERE rn <= 2),
      cand AS (
        SELECT qa.vec_id AS query_id, ca.vec_id AS neighbor_id
        FROM probes qa JOIN assign ca
          ON qa.cell = ca.cell AND qa.vec_id <> ca.vec_id
        WHERE qa.vec_id < 20),
      scored AS (
        SELECT query_id, neighbor_id,
               ${dotSql("q.v", "c.v")} / (q.nrm * c.nrm) AS cosine
        FROM cand
        JOIN e q ON q.vec_id = query_id
        JOIN e c ON c.vec_id = neighbor_id),
      ranked AS (
        SELECT query_id, neighbor_id, cosine,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY cosine DESC, neighbor_id) AS rank
        FROM scored)
      SELECT query_id, neighbor_id, cosine, rank
      FROM ranked WHERE rank <= 3
      ORDER BY query_id, rank"""

  /** Q137: the INDEX-SERVED spelling of q37 — the third index family's
    * end-to-end gate, after q134 (postings) and q135 (LSH): the same 20
    * anchors probe the persisted [[graft.sources.IvfIndex]] cell store
    * (built once per corpus via the listing-keyed memo; probes read the
    * n-probe cells bucket-PRUNED) against q37's own DuckDB oracle.
    * Where q37 re-assigns the whole corpus per run (broadcast cross
    * join + per-vector window, linear), the probe's per-query work is
    * anchors × 8 centroid rankings plus the probed cells' occupancy —
    * the IVF trade realized at the I/O layer. */
  private[queries] val q137 = GraftQuery(
    "q137_ivf_index_probe",
    (spark, dir) => {
      val table = graft.sources.IvfIndex.ensureFor(spark, dir, tag = "q137")
      graft.sources.IvfIndex.topK(spark, table, nAnchors = 20, k = 3)
    },
    Some(ivfTopKSql),
    headline = true)

  /** int8 scalar quantization, shared by q38 and the clustering family
    * (q57/q58 must quantize into the SAME domain q38 searches in, or the
    * "same quantizer" contract between the index and the search drifts):
    * per-vector scale 127/max|x|, components floor(x·scale + 0.5) — exact
    * small integers carried as doubles, so cross-row sums stay exact and
    * order-independent. Never `round()`, whose half-case semantics are
    * engine-specific. */
  def int8Quantized(spark: SparkSession, dir: String): DataFrame =
    int8QuantizedOf(spark, Tables.embeddings(spark, dir))

  /** The quantizer's scale for a double-vector column: 127 / max|x|
    * (guarded against the all-zero vector). Factored so every caller —
    * q38's corpus scan, the IVF-SQ store's build/append, and the SQ
    * probe's query-side quantization — quantizes into the SAME domain;
    * a drifted spelling at any one site would silently break the
    * "same quantizer" contract between index and search. */
  def int8Scale(v: Column): Column =
    lit(127.0) / greatest(array_max(transform(v, x => abs(x))), lit(1e-30))

  /** Quantize a double vector at `scale` — exact small integers
    * (|q| ≤ 127) carried as doubles, so cross-row sums stay exact and
    * order-independent. `floor(x·scale + 0.5)`, never `round()`, whose
    * half-case semantics are engine-specific. */
  def int8Of(v: Column, scale: Column): Column =
    transform(v, x => floor(x * scale + lit(0.5)).cast("double"))

  /** Frame-based core of [[int8Quantized]] — for callers whose vectors
    * do not live in a corpus dir (the [[Clustering.kmeansFitOf]] path
    * quantizes an index store's own rows). Expects (vec_id, label,
    * embedding), the [[normedVectorsOf]] contract. */
  def int8QuantizedOf(spark: SparkSession, embeddings: DataFrame): DataFrame =
    normedVectorsOf(spark, embeddings)
      .withColumn("scale", int8Scale(col("v")))
      .withColumn("qv", int8Of(col("v"), col("scale")))

  /** DuckDB mirror of [[int8Quantized]] (CTE `qz`; assumes `e` in scope). */
  val int8QuantizedSql: String = """
    qz AS (
      SELECT vec_id, list_transform(v, x -> floor(x * scale + 0.5)) AS qv
      FROM (SELECT vec_id, v,
                   127.0 / greatest(list_max(list_transform(v, y -> abs(y))), 1e-30) AS scale
            FROM e))"""

  /** Q38: int8 scalar-quantized cosine search — the memory-bandwidth
    * scale path. Each 64-dim float vector compresses to 64 signed bytes
    * plus one per-vector scale (127 / max|x|): an 8× reduction that turns
    * a 100 TB embedding store into something executors can hold in page
    * cache, with integer dot products ranking the candidates. Composed
    * with q37's IVF cells this is the standard IVF-SQ index; here the
    * quantized scan is kept full so SimilaritySpec can measure recall
    * against q34's exact ranking in isolation.
    *
    * Oracle bit-exactness: quantized components are small EXACT integers
    * (|q| ≤ 127) carried as doubles, so every product and the sequential
    * sum are representable exactly and identical in DuckDB. The quantizer
    * is `floor(x·scale + 0.5)` in both dialects — never `round()`, whose
    * half-case semantics are engine-specific. */
  private val q38 = GraftQuery(
    "q38_quantized_ann",
    (spark, dir) => {
      val qz = int8Quantized(spark, dir)
        .withColumn("qnrm", sqrt(dot(col("qv"), col("qv"))))
        .select(col("vec_id"), col("qv"), col("qnrm"))
      val q = qz.filter(col("vec_id") < 20)
      val score = dot(col("q.qv"), col("c.qv")) / (col("q.qnrm") * col("c.qnrm"))
      val w = Window.partitionBy("query_id").orderBy(col("qcosine").desc, col("neighbor_id"))
      broadcast(q.as("q")).join(qz.as("c"), col("q.vec_id") =!= col("c.vec_id"))
        .select(col("q.vec_id").as("query_id"), col("c.vec_id").as("neighbor_id"),
          score.as("qcosine"))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 5)
        .orderBy("query_id", "rank")
    },
    Some(s"""
      WITH $normedVectorsSql, $int8QuantizedSql,
      qn AS (
        SELECT vec_id, qv, sqrt(${dotSql("qv", "qv")}) AS qnrm FROM qz),
      scored AS (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               ${dotSql("q.qv", "c.qv")} / (q.qnrm * c.qnrm) AS qcosine
        FROM qn q JOIN qn c ON q.vec_id <> c.vec_id
        WHERE q.vec_id < 20),
      ranked AS (
        SELECT query_id, neighbor_id, qcosine,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY qcosine DESC, neighbor_id) AS rank
        FROM scored)
      SELECT query_id, neighbor_id, qcosine, rank
      FROM ranked WHERE rank <= 5
      ORDER BY query_id, rank"""),
    headline = true)

  /** Q122: hard-negative mining — the contrastive-training data-prep
    * step (ANCE, Xiong et al., ICLR'21 arXiv 2007.00808; DPR, Karpukhin
    * et al., EMNLP'20 — public papers): for each anchor, the most-SIMILAR
    * items carrying a DIFFERENT label are the informative negatives a
    * dual-encoder trains against (random negatives are too easy; the
    * near-boundary ones carry the gradient). Top-3 cross-label neighbors
    * per anchor by exact cosine, both labels carried so the pair table
    * feeds a training loader directly.
    *
    * Scale shape: q34's — the anchor side is broadcast and each executor
    * scans its candidate partition once; the label filter rides in the
    * join condition, so same-label pairs die at the probe. At corpus
    * scale the exact scan swaps for q35's LSH candidate stream — that
    * variant is BUILT (q125, the same lshTopK scaffold with the
    * cross-label filter in the candidate join) and recall-audited
    * against this exact ranking in SimilaritySpec, the q34→q35→q112
    * pattern applied once more. */
  private[queries] val q122 = GraftQuery(
    "q122_hard_negatives",
    (spark, dir) => cosineTopK(spark, dir, k = 3, crossLabelOnly = true),
    Some(cosineTopKSql(k = 3, crossLabelOnly = true)),
    headline = true)

  /** Q125: hard-negative mining at CORPUS scale — q122's semantics over
    * q35's LSH candidate stream instead of the exact anchor×corpus scan
    * (the scale-killer q122's scaladoc names at millions of anchors):
    * candidates come from sign-hyperplane bucket collisions with the
    * cross-label filter IN the candidate join, then the exact-cosine
    * re-rank and tie rule shared with q122. The banding is CHOSEN by
    * [[adaptiveBanding]] from the corpus count (bits from a bucket-
    * occupancy target, tables growing with bits to hold recall), which
    * resolves to 8 tables × 4 bits at both oracle corpora — short bands
    * because hard negatives live at LOWER cosine than same-label
    * neighbors (the decision-boundary region), where 8-bit bands almost
    * never collide: measured recall@3 was 0.03 under q35's 4×8 banding.
    * The static oracle SQL is generated at that same 8×4 (the resolution
    * is pinned in DedupSimilaritySpec, so a testdata resize fails there
    * loudly, not silently at the oracle gate). Recall@3 against exact
    * q122 is pinned in DedupSimilaritySpec (the q112 audit pattern) and
    * probed at 30×/100× corpus scale in SCALING.md round 15; q122 stays
    * the oracle-checked exact headline.
    *
    * Scale shape: q35's — signatures are a narrow map, the candidate
    * join keys on (table, signature) so work tracks bucket occupancy,
    * never anchors × corpus; the label predicate discards same-label
    * collisions at the bucket probe before any cosine is computed. */
  private[queries] val q125 = GraftQuery(
    "q125_hard_negatives_lsh",
    (spark, dir) => lshTopKAdaptive(spark, dir, k = 3, crossLabelOnly = true,
      oracleBanding = Some((8, 4))),
    Some(lshTopKSql(k = 3, crossLabelOnly = true, tables = 8, bits = 4)),
    headline = true)

  /** Q132: contrastive TRIPLET export — where q122/q125's mining actually
    * lands in a training pipeline (DPR, Karpukhin EMNLP'20 / ANCE): each
    * anchor paired with its nearest SAME-label neighbor (the positive)
    * and its [[TripletNegK]] nearest CROSS-label neighbors (the
    * negatives), one row per (anchor, negative) carrying both cosines
    * and the contrastive margin pos − neg. Anchors missing either side
    * (no same-label or no cross-label neighbor in the corpus) export no
    * triplet — a triplet needs both by definition.
    *
    * One pass: the anchor×corpus cosine stream is scored ONCE, ranked by
    * one window over (query_id, same-label flag) — so positive and
    * negatives come from the same shuffle — pre-truncated by the plain
    * `r ≤ negK` predicate (WindowGroupLimit pushes it partial), then the
    * anchors×(negK+1)-row survivor frame is checkpointed (bounded) and
    * self-assembled by a broadcast-scale join. The margin is a plain
    * IEEE subtraction of two already-bit-exact cosine folds, so it
    * hash-matches. At corpus scale the exact stream swaps for q125's
    * LSH candidates exactly as q122's does; the assembly is
    * anchors-bounded either way. */
  private val TripletNegK = 3
  private[queries] val q132 = GraftQuery(
    "q132_contrastive_triplets",
    (spark, dir) => {
      val e = normedVectors(spark, dir)
      val q = e.filter(col("vec_id") < 20)
      val cos = dot(col("q.v"), col("c.v")) / (col("q.nrm") * col("c.nrm"))
      val w = Window.partitionBy("query_id", "same")
        .orderBy(col("cosine").desc, col("cand_id"))
      val small = broadcast(q.as("q"))
        .join(e.as("c"), col("q.vec_id") =!= col("c.vec_id"))
        .select(col("q.vec_id").as("query_id"), col("q.label").as("query_label"),
          col("c.vec_id").as("cand_id"), col("c.label").as("cand_label"),
          cos.as("cosine"))
        .withColumn("same",
          when(col("cand_label") === col("query_label"), 1).otherwise(0))
        .withColumn("r", row_number().over(w))
        .filter(col("r") <= TripletNegK)
        .filter(!(col("same") === 1 && col("r") > 1))
        .localCheckpoint(true)
      val pos = small.filter(col("same") === 1)
        .select(col("query_id"), col("query_label"),
          col("cand_id").as("positive_id"), col("cosine").as("pos_cosine"))
      val neg = small.filter(col("same") === 0)
        .select(col("query_id"), col("cand_id").as("negative_id"),
          col("cosine").as("neg_cosine"), col("r").as("neg_rank"))
      pos.join(neg, Seq("query_id"))
        .select(col("query_id"), col("query_label"), col("positive_id"),
          col("negative_id"), col("neg_rank"), col("pos_cosine"),
          col("neg_cosine"),
          (col("pos_cosine") - col("neg_cosine")).as("margin"))
        .orderBy("query_id", "neg_rank")
    },
    Some(s"""
      WITH $normedVectorsSql,
      pairs AS (
        SELECT q.vec_id AS query_id, q.label AS query_label,
               c.vec_id AS cand_id, c.label AS cand_label,
               CASE WHEN c.label = q.label THEN 1 ELSE 0 END AS same,
               ${dotSql("q.v", "c.v")} / (q.nrm * c.nrm) AS cosine
        FROM e q JOIN e c ON q.vec_id <> c.vec_id
        WHERE q.vec_id < 20),
      ranked AS (
        SELECT *, row_number() OVER (PARTITION BY query_id, same
                                     ORDER BY cosine DESC, cand_id) AS r
        FROM pairs),
      small AS (
        SELECT * FROM ranked
        WHERE r <= $TripletNegK AND NOT (same = 1 AND r > 1)),
      pos AS (
        SELECT query_id, query_label, cand_id AS positive_id,
               cosine AS pos_cosine
        FROM small WHERE same = 1),
      neg AS (
        SELECT query_id, cand_id AS negative_id, cosine AS neg_cosine,
               r AS neg_rank
        FROM small WHERE same = 0)
      SELECT p.query_id, p.query_label, p.positive_id, n.negative_id,
             n.neg_rank, p.pos_cosine, n.neg_cosine,
             p.pos_cosine - n.neg_cosine AS margin
      FROM pos p JOIN neg n USING (query_id)
      ORDER BY query_id, neg_rank"""),
    headline = true)

  /** Q143: the IVF-SQ probe — q137's cell store with q38's int8 payload,
    * the composition q38's scaladoc names ("the standard IVF-SQ index"),
    * served from the persisted [[graft.sources.IvfIndex]] SQ store. Same
    * fit, same coarse ranking, same probed cells as q137; the in-cell
    * re-rank is q38's quantized cosine over the stored codes. The oracle
    * is NEW (neither q37's nor q38's — candidates come from the cell
    * rendezvous, scores from the quantized domain) and composes both
    * queries' own CTEs; exact small-integer arithmetic keeps the hash
    * gate bit-exact across engines, the q38 precedent.
    *
    * Scale story: the probed cells' bytes shrink ~7x (64 tinyints + one
    * norm vs 64 doubles + one), which is the memory-bandwidth half of
    * the IVF trade — cell occupancy still grows with the corpus (q137's
    * honest non-flat curve); what SQ cuts is the constant every scanned
    * row costs. Measured against q137 in SCALING.md round 18. */
  private[queries] val q143 = GraftQuery(
    "q143_ivfsq_probe",
    (spark, dir) => {
      val table = graft.sources.IvfIndex.ensureForSq(spark, dir, tag = "q143")
      val anchors = normedVectors(spark, dir).filter(col("vec_id") < 20)
        .select(col("vec_id").as("query_id"), col("v"), col("nrm"))
      graft.sources.IvfIndex.topKForSq(spark, table, anchors, k = 3)
    },
    Some(s"""
      WITH $normedVectorsSql, $int8QuantizedSql,
      cent AS (
        SELECT vec_id AS c_id, v AS cv, nrm AS cnrm FROM e WHERE vec_id < 8),
      ranked_cells AS (
        SELECT e.vec_id, cent.c_id AS cell,
               row_number() OVER (PARTITION BY e.vec_id
                 ORDER BY ${dotSql("e.v", "cent.cv")} / (e.nrm * cent.cnrm) DESC, cent.c_id) AS rn
        FROM e CROSS JOIN cent),
      assign AS (SELECT vec_id, cell FROM ranked_cells WHERE rn = 1),
      probes AS (SELECT vec_id, cell FROM ranked_cells WHERE rn <= 2),
      cand AS (
        SELECT qa.vec_id AS query_id, ca.vec_id AS neighbor_id
        FROM probes qa JOIN assign ca
          ON qa.cell = ca.cell AND qa.vec_id <> ca.vec_id
        WHERE qa.vec_id < 20),
      qn AS (
        SELECT vec_id, qv, sqrt(${dotSql("qv", "qv")}) AS qnrm FROM qz),
      scored AS (
        SELECT query_id, neighbor_id,
               ${dotSql("q.qv", "c.qv")} / (q.qnrm * c.qnrm) AS qcosine
        FROM cand
        JOIN qn q ON q.vec_id = query_id
        JOIN qn c ON c.vec_id = neighbor_id),
      ranked AS (
        SELECT query_id, neighbor_id, qcosine,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY qcosine DESC, neighbor_id) AS rank
        FROM scored)
      SELECT query_id, neighbor_id, qcosine, rank
      FROM ranked WHERE rank <= 3
      ORDER BY query_id, rank"""),
    headline = true)

  /** The multi-probe oracle: q35's sig/rows_ construction with the
    * query side expanded to Hamming-radius-1 buckets in SQL (substr
    * splice + CASE flip per position — DuckDB's generate_series is the
    * position stream), then the shared candidate-join / exact-re-rank /
    * tie-rule chain. Shared verbatim by q145 (recompute) and q146 (the
    * store-served spelling), the q35/q135 pattern. */
  private lazy val multiProbeSql: String = {
    val (tables, bits, k) = (4, 8, 5)
    s"""
    WITH $normedVectorsSql,
    ${sigRowsSqlCtes(tables, bits, labelSel = "")},
    qprobe AS (
      SELECT vec_id, tbl, sig FROM rows_ WHERE vec_id < 20
      UNION ALL
      SELECT vec_id, tbl,
             substr(sig, 1, i - 1) ||
             (CASE WHEN substr(sig, i, 1) = '1' THEN '0' ELSE '1' END) ||
             substr(sig, i + 1) AS sig
      FROM rows_ CROSS JOIN generate_series(1, $bits) AS gs(i)
      WHERE vec_id < 20),
    cand AS (
      SELECT DISTINCT x.vec_id AS query_id, y.vec_id AS neighbor_id
      FROM qprobe x JOIN rows_ y
        ON x.tbl = y.tbl AND x.sig = y.sig AND x.vec_id <> y.vec_id),
    mscored AS (
      SELECT query_id, neighbor_id,
             ${dotSql("q.v", "c.v")} / (q.nrm * c.nrm) AS cosine
      FROM cand
      JOIN e q ON q.vec_id = query_id
      JOIN e c ON c.vec_id = neighbor_id),
    mranked AS (
      SELECT query_id, neighbor_id, cosine,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY cosine DESC, neighbor_id) AS rank
      FROM mscored)
    SELECT query_id, neighbor_id, cosine, rank
    FROM mranked WHERE rank <= $k
    ORDER BY query_id, rank"""
  }

  /** Q145: multi-probe LSH ANN — q35 with the query side probing every
    * Hamming-radius-1 bucket beside its own ([[multiProbeExpand]], Lv
    * et al. VLDB'07). The recall dial that costs the QUERY ~bits× more
    * bucket probes and the store NOTHING — measured recall@5 vs exact
    * rises while the candidate stream stays bucket-bounded
    * (MultiProbeSpec pins both, and pins q145 ⊇ q35). */
  private[queries] val q145 = GraftQuery(
    "q145_multiprobe_ann",
    (spark, dir) => lshTopKMultiProbe(spark, dir, k = 5),
    Some(multiProbeSql),
    headline = true)

  /** Q146: the INDEX-SERVED multi-probe spelling — the SAME persisted
    * [[graft.sources.AnnIndex]] store q135 probes (the memo tag is
    * shared DELIBERATELY: the point is more recall from the index
    * already on disk), with the expansion applied to the client-signed
    * anchor rows before the probe. The store's bucket pruning, the
    * (query, neighbor) max-dedup, and the tie rule all absorb the
    * expansion unchanged; registered against q145's own oracle — the
    * q35/q135 pattern one rung up the recall dial. */
  private[queries] val q146 = GraftQuery(
    "q146_multiprobe_index_probe",
    (spark, dir) => {
      val table = graft.sources.AnnIndex.ensureFor(spark, dir, tag = "q135")
      // sign and expand at the RECORDED banding (the catalog truth —
      // the curatedVectorIndexed rule): a hardcoded (4, 8) would
      // silently diverge from the store if the shared tag's layout
      // ever moved. The static oracle is generated at 4x8; a banding
      // change fails the oracle gate loudly, never this seam.
      val (tables, bits) = graft.sources.AnnIndex.recordedBanding(spark, table)
      val anchors = multiProbeExpand(
        signatureRowsOf(
          normedVectors(spark, dir).filter(col("vec_id") < 20),
          tables, bits), bits)
      graft.sources.AnnIndex.topKFor(spark, table, anchors, 5,
        signedAt = Some((tables, bits)))
    },
    Some(multiProbeSql),
    headline = true)

  /** Q147: the INDEX-SERVED hard-negative probe — q125's cross-label
    * mining from the persisted [[graft.sources.AnnIndex]] store instead
    * of recomputing signatures per run (the q35→q135 pattern on the
    * training-data row that actually recurs: negatives re-mine every
    * training round against a growing corpus). The store carries the
    * label on every signature row, so the cross-label filter rides in
    * the bucket-probe join exactly as the recompute spelling's does;
    * anchors sign at the recorded banding. Banding contract mirrors
    * q125's own tripwire: the attached oracle is static at 8×4, so the
    * adaptive rule's resolution is require()d equal — a corpus resize
    * fails the registration loudly with the regeneration instruction,
    * never hash-compares two different plans. */
  /** q147's body with the multi-probe dial exposed — the q146 expansion
    * composed INTO the hard-negative serving row instead of beside it:
    * `multiProbe = true` expands the client-signed anchors to their
    * Hamming-radius-1 buckets before the cross-label store probe (the
    * store, the pruning, the dedup, the tie rule all absorb it
    * unchanged — probeCore's contract). The registered row keeps the
    * dial OFF so the static 8×4 oracle stays comparable; MultiProbeSpec
    * pins dial-on == the recompute scaffold with the same expansion, and
    * the recall/wall trade is measured at scale in MultiProbeRecallProbe
    * (SCALING.md round 19). */
  private[graft] def hardNegIndexServed(spark: SparkSession, dir: String,
      multiProbe: Boolean): DataFrame = {
    val n = corpusCount(spark, dir)
    val banding = adaptiveBanding(n, anchors = AnchorCount)
    require(banding == ((8, 4)),
      s"corpus ($n vecs) resolves adaptive banding $banding but q147's " +
        "oracle SQL is static at (8,4) — regenerate the oracle at the new banding")
    val table = graft.sources.AnnIndex.ensureFor(spark, dir, tag = "q147",
      tables = banding._1, bits = banding._2)
    val (t, b) = graft.sources.AnnIndex.recordedBanding(spark, table)
    val anchors0 = signatureRowsOf(
      normedVectors(spark, dir).filter(col("vec_id") < 20), t, b)
    val anchors = if (multiProbe) multiProbeExpand(anchors0, b) else anchors0
    graft.sources.AnnIndex.hardNegativesFor(spark, table, anchors, 3,
      signedAt = Some((t, b)))
  }

  private[queries] val q147 = GraftQuery(
    "q147_hard_negatives_index_probe",
    (spark, dir) => hardNegIndexServed(spark, dir, multiProbe = false),
    Some(lshTopKSql(k = 3, crossLabelOnly = true, tables = 8, bits = 4)),
    headline = true)

  val all: Seq[GraftQuery] =
    Seq(q34, q35, q37, q38, q122, q125, q132, q135, q137, q143, q145, q146,
      q147)
}
