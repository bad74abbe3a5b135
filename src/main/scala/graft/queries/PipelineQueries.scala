package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.TextHashFunctions.shingleHash60

/** End-to-end training-data curation (the north-star composition): quality
  * gate → exact dedup → near-dup removal → per-(lang, source) cap →
  * training-mix stats. Each stage is one of the engine's operators
  * composed into a single declarative plan — Catalyst sees the whole
  * lineage, so filters flow down and the near-dup join keys stay the only
  * wide exchanges.
  */
object PipelineQueries {

  /** p01's named stage prefixes — the SINGLE definition consumed by both
    * the benched query below and [[graft.tools.ProfileP01]], so the
    * profiler's stage attribution can never drift from the real plan
    * (the r9 review caught a copy-paste drift risk here). */
  private[graft] final case class P01Stages(docs: DataFrame, quality: DataFrame,
      exact: DataFrame, sh: DataFrame, pairCounts: DataFrame)

  private[graft] def p01Stages(spark: SparkSession, dir: String): P01Stages = {
    val docs = Tables.documents(spark, dir)
      .withColumn("toks", split(col("text"), " "))
      .withColumn("n_tokens", size(col("toks")))
      .withColumn("n_stop", graft.ops.TextOps.markerHits(col("toks"), Seq("the", "a")))
      .withColumn("tok_chars", graft.ops.TextOps.tokenCharSum(col("toks")))

    // stage 1 — quality gate (t03's OK bucket)
    val quality = docs.filter(
      col("n_tokens") >= 25 &&
      col("n_stop").cast("double") / col("n_tokens") <= 0.125 &&
      col("tok_chars").cast("double") / col("n_tokens") >= 3.5)

    // stage 2 — exact dedup: canonical (min-id) keeper per content hash.
    // A min_by hash AGGREGATE, not a window: partial aggregation shrinks
    // the shuffle map-side and there is no sort; and because the whole
    // subtree below this exchange is defined once and consumed twice (the
    // near-dup branch and the anti-join branch), ReuseExchange shares the
    // scan+quality+partial-agg work instead of executing the prefix twice.
    // Contract: doc_id is the table's unique key. min_by keeps ONE row per
    // hash where a window's `doc_id = min(doc_id)` filter would keep every
    // row tied at the minimum — equivalent exactly when doc_id is unique
    // (the oracle replays the window form, so a key-violating input would
    // surface as a gate mismatch, not silent divergence).
    val exact = quality
      .groupBy(md5(col("text")).as("_h"))
      .agg(min_by(
        struct(col("doc_id"), col("lang"), col("source"),
          col("toks"), col("n_tokens")),
        col("doc_id")).as("_v"))
      .select(col("_v.*"))

    // stage 3 — near-dup removal: drop the max-id side of every
    // shingle-Jaccard >= 0.5 pair (d02's detector over the survivors)
    val sh = exact
      .filter(size(col("toks")) >= 3)
      .withColumn("shingles", shingleHash60(col("toks")))
      .withColumn("n_sh", size(col("shingles")))
    P01Stages(docs, quality, exact, sh, DedupQueries.jaccardPairCounts(sh))
  }

  // p01 — the curated training mix.
  def p01TrainingMix(spark: SparkSession, dir: String): DataFrame = {
    val st = p01Stages(spark, dir)
    val dupIds = st.pairCounts
      .filter(col("inter").cast("double") / (col("na") + col("nb") - col("inter")) >= 0.5)
      .select(col("doc_b").as("dup_id")).distinct()
    val deduped = st.exact.join(dupIds, col("doc_id") === col("dup_id"), "left_anti")

    // stage 4 — per-(lang, source) cap, deterministic by doc_id
    val wCap = Window.partitionBy("lang", "source").orderBy("doc_id")
    val capped = deduped
      .withColumn("rn", row_number().over(wCap))
      .filter(col("rn") <= 5)

    capped.groupBy("lang", "source")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens").cast("long")).as("total_tokens"))
      .orderBy("lang", "source")
  }

  val p01Oracle: String =
    """WITH docs AS (
      |  SELECT doc_id, lang, source, text, string_split(text, ' ') AS toks,
      |    len(string_split(text, ' ')) AS n_tokens,
      |    len(list_filter(string_split(text, ' '), x -> x IN ('the','a'))) AS n_stop,
      |    list_sum(list_transform(string_split(text, ' '), x -> length(x))) AS tok_chars
      |  FROM documents
      |), quality AS (
      |  SELECT * FROM docs
      |  WHERE n_tokens >= 25
      |    AND CAST(n_stop AS DOUBLE)/n_tokens <= 0.125
      |    AND CAST(tok_chars AS DOUBLE)/n_tokens >= 3.5
      |), exact AS (
      |  SELECT * FROM (
      |    SELECT *, MIN(doc_id) OVER (PARTITION BY md5(text)) AS keeper FROM quality)
      |  WHERE doc_id = keeper
      |), sh AS (
      |  SELECT doc_id,
      |    list_distinct(list_transform(
      |      list_transform(range(1, len(toks) - 1),
      |        i -> concat_ws(' ', toks[i], toks[i + 1], toks[i + 2])),
      |      g -> CAST(('0x' || substr(md5(g), 1, 15)) AS BIGINT))) AS shingles
      |  FROM exact WHERE len(toks) >= 3
      |), e AS (
      |  SELECT doc_id, len(shingles) AS n, unnest(shingles) AS s FROM sh
      |), freq AS (
      |  SELECT s FROM e GROUP BY s HAVING COUNT(*) BETWEEN 2 AND 100
      |), dup AS (
      |  SELECT DISTINCT doc_b AS dup_id FROM (
      |    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.n AS na, b.n AS nb,
      |      COUNT(*) AS inter
      |    FROM e a JOIN e b ON a.s = b.s AND a.doc_id < b.doc_id
      |    JOIN freq f ON f.s = a.s
      |    GROUP BY 1, 2, 3, 4)
      |  WHERE CAST(inter AS DOUBLE)/(na + nb - inter) >= 0.5
      |), capped AS (
      |  SELECT * FROM (
      |    SELECT lang, source, doc_id, n_tokens,
      |      row_number() OVER (PARTITION BY lang, source ORDER BY doc_id) AS rn
      |    FROM exact WHERE doc_id NOT IN (SELECT dup_id FROM dup))
      |  WHERE rn <= 5
      |)
      |SELECT lang, source, COUNT(*) AS n_docs,
      |  CAST(SUM(CAST(n_tokens AS BIGINT)) AS BIGINT) AS total_tokens
      |FROM capped GROUP BY lang, source ORDER BY lang, source""".stripMargin

  // p02 — the tokenization-ready shard manifest: the second north-star
  // composition, chaining the round-9 operators the way a modern curation
  // pipeline actually runs them. Stages: (1) quality gate (t03) AND
  // repetition gate (t10's bigram thresholds) — both pure per-row
  // predicates evaluated in one pass over the scan; (2) hash-split and
  // DECONTAMINATE the train side against the raw test split's shingle set
  // (d11's inverted-index join, pointed the production direction: protect
  // the eval set by dropping contaminated TRAIN docs); (3) mixture
  // sampling (t08's exact-integer rates); (4) sequence packing (t11) and
  // the per-(lang, shard) manifest a tokenizer job would consume. One
  // declarative lineage: the only wide exchanges are the shingle join
  // keys and the packing window's (lang, block) partitions.
  def p02ShardManifest(spark: SparkSession, dir: String): DataFrame = {
    import graft.ops.TextOps
    val docs = Tables.documents(spark, dir)
      .withColumn("toks", split(col("text"), " "))
      .withColumn("n_tokens", size(col("toks")).cast("long"))

    // stage 1 — quality + repetition gates (n_tokens >= 25 implies the
    // bigram fractions are never null, so the conjunction is two-valued)
    val gated = docs
      .withColumn("n_stop", TextOps.markerHits(col("toks"), Seq("the", "a")))
      .withColumn("tok_chars", TextOps.tokenCharSum(col("toks")))
      .withColumn("bs", graft.functions.TextHashFunctions.bigramStats(col("toks")))
      .filter(col("n_tokens") >= 25 &&
        col("n_stop").cast("double") / col("n_tokens") <= 0.125 &&
        col("tok_chars").cast("double") / col("n_tokens") >= 3.5)
      .filter(!(element_at(col("bs"), 3).cast("double") / element_at(col("bs"), 1) > 0.08 ||
        lit(1.0) - element_at(col("bs"), 2).cast("double") / element_at(col("bs"), 1) > 0.12))

    // stage 2 — decontaminate the gated TRAIN split against the RAW test
    // split (the benchmark exists independently of train filtering): the
    // d11 inverted-index shape — both sides shuffle on the shingle hash,
    // nothing is collected or broadcast
    val train = graft.ops.Dedup.withShingles(
      gated.filter(TextOps.hashSplit(col("doc_id")) === "train"), "toks")
    val testSh = graft.ops.Dedup.withShingles(
      docs.filter(TextOps.hashSplit(col("doc_id")) === "test"), "toks")
      .select(explode(col("shingles")).as("sh")).distinct()
    val contamIds = train
      .select(col("doc_id"), col("n_sh"), explode(col("shingles")).as("sh"))
      .join(testSh, Seq("sh"))
      .groupBy("doc_id", "n_sh").agg(count(lit(1)).as("n_hit"))
      .filter(col("n_hit").cast("double") / col("n_sh") >= 0.7)
      .select("doc_id")
    val clean = train.join(contamIds, Seq("doc_id"), "left_anti")

    // stage 3 — mixture sampling; stage 4 — pack and emit the manifest
    val mixed = clean
      .filter(TextOps.mixtureSample(col("doc_id"), col("lang"),
        Map("en" -> 5000, "fr" -> 7500, "es" -> 7500)))
      .select(col("doc_id"), col("lang"),
        expr("doc_id div 100000").as("block_id"), col("n_tokens"))
    val w = Window.partitionBy("lang", "block_id").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    mixed
      .withColumn("cum", sum(col("n_tokens")).over(w))
      .withColumn("seq_id", expr("(cum - n_tokens) div 2048"))
      .groupBy("lang", "block_id")
      .agg(count(lit(1)).as("n_docs"),
        count_distinct(col("seq_id")).as("n_seqs"),
        sum(col("n_tokens")).as("total_tokens"))
      .orderBy("lang", "block_id")
  }

  val p02Oracle: String =
    """WITH d AS (
      |  SELECT doc_id, lang, source, text, string_split(text,' ') AS toks,
      |    CAST(len(string_split(text,' ')) AS BIGINT) AS n_tokens
      |  FROM documents
      |), feat AS (
      |  SELECT *,
      |    len(list_filter(toks, x -> x IN ('the','a'))) AS n_stop,
      |    list_sum(list_transform(toks, x -> length(x))) AS tok_chars
      |  FROM d
      |), bg AS (
      |  SELECT doc_id, CAST(SUM(c) AS INT) AS total2,
      |    CAST(COUNT(*) AS INT) AS distinct2, CAST(MAX(c) AS INT) AS top2
      |  FROM (
      |    SELECT doc_id, b, COUNT(*) AS c FROM (
      |      SELECT t.doc_id, t.l[i] || ' ' || t.l[i+1] AS b
      |      FROM (SELECT doc_id, toks AS l FROM d) t,
      |        LATERAL (SELECT unnest(generate_series(1, len(t.l)-1)) AS i) g)
      |    GROUP BY doc_id, b)
      |  GROUP BY doc_id
      |), gated AS (
      |  SELECT f.* FROM feat f JOIN bg ON bg.doc_id = f.doc_id
      |  WHERE n_tokens >= 25
      |    AND CAST(n_stop AS DOUBLE)/n_tokens <= 0.125
      |    AND CAST(tok_chars AS DOUBLE)/n_tokens >= 3.5
      |    AND NOT (CAST(top2 AS DOUBLE)/total2 > 0.08
      |             OR CAST(1.0 AS DOUBLE) - CAST(distinct2 AS DOUBLE)/total2 > 0.12)
      |), sh AS (
      |  SELECT doc_id, lang, n_tokens,
      |    list_distinct(list_transform(
      |      list_transform(range(1, len(toks)-1), i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2])),
      |      g -> CAST(('0x' || substr(md5(g),1,15)) AS BIGINT))) AS shingles
      |  FROM gated
      |  WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)),1,8)) AS BIGINT) % 100 < 80
      |    AND len(toks) >= 3
      |), tsh AS (
      |  SELECT DISTINCT unnest(shingles) AS sh FROM (
      |    SELECT list_distinct(list_transform(
      |      list_transform(range(1, len(toks)-1), i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2])),
      |      g -> CAST(('0x' || substr(md5(g),1,15)) AS BIGINT))) AS shingles
      |    FROM d
      |    WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)),1,8)) AS BIGINT) % 100 >= 90
      |      AND len(toks) >= 3)
      |), hits AS (
      |  SELECT t.doc_id, COUNT(*) AS n_hit
      |  FROM (SELECT doc_id, unnest(shingles) AS sh FROM sh) t JOIN tsh USING (sh)
      |  GROUP BY t.doc_id
      |), clean AS (
      |  SELECT s.doc_id, s.lang, s.n_tokens
      |  FROM sh s LEFT JOIN hits h ON h.doc_id = s.doc_id
      |  WHERE CAST(COALESCE(h.n_hit,0) AS DOUBLE)/len(s.shingles) < 0.7
      |), mixed AS (
      |  SELECT doc_id, lang, n_tokens FROM clean
      |  WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '#mix'),1,8)) AS BIGINT) % 10000
      |        < (CASE lang WHEN 'en' THEN 5000 WHEN 'fr' THEN 7500 WHEN 'es' THEN 7500 ELSE 10000 END)
      |), packed AS (
      |  SELECT lang, doc_id // 100000 AS block_id, doc_id, n_tokens,
      |    SUM(n_tokens) OVER (PARTITION BY lang, doc_id // 100000 ORDER BY doc_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      |  FROM mixed
      |)
      |SELECT lang, CAST(block_id AS BIGINT) AS block_id, COUNT(*) AS n_docs,
      |  CAST(COUNT(DISTINCT (cum - n_tokens) // 2048) AS BIGINT) AS n_seqs,
      |  CAST(SUM(n_tokens) AS BIGINT) AS total_tokens
      |FROM packed GROUP BY lang, block_id
      |ORDER BY lang, block_id""".stripMargin

  // p03 — decontaminated EVAL-SET construction, the benchmark-building
  // direction (p02 protects the benchmark by filtering TRAIN; p03 builds
  // the benchmark itself): draw an exact per-language sample by stable
  // hash order (t13's stratifiedRank — same N every run, every cluster),
  // then DROP any candidate whose shingle overlap with the remaining
  // (train) corpus is >= 0.5 — a held-out set leaking training text
  // overstates every model it evaluates. The kept-id checksum rides the
  // manifest so the gate proves the exact final membership. Scale shape:
  // one lang-keyed window for the draw, then d11's inverted-index
  // overlap — both sides shuffle on the 8-byte shingle hash, the
  // candidate side is BOUNDED (25 x languages rows), nothing collects.
  // Candidates with < 3 tokens have no shingles; they are kept
  // (unmeasurable overlap on a 2-token doc is not evidence of leakage).
  def p03EvalSet(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .withColumn("toks", split(col("text"), " "))
      .withColumn("n_tokens", size(col("toks")).cast("long"))
      .withColumn("rnk",
        graft.ops.TextOps.stratifiedRank(col("lang"), col("doc_id")))
    val cand = docs.filter(col("rnk") <= 25)
    val train = docs.filter(col("rnk") > 25)
    val trainSh = graft.ops.Dedup.withShingles(train, "toks")
      .select(explode(col("shingles")).as("sh")).distinct()
    val contamIds = graft.ops.Dedup.withShingles(cand, "toks")
      .select(col("doc_id"), col("n_sh"), explode(col("shingles")).as("sh"))
      .join(trainSh, Seq("sh"))
      .groupBy("doc_id", "n_sh").agg(count(lit(1)).as("n_hit"))
      .filter(col("n_hit").cast("double") / col("n_sh") >= 0.5)
      .select("doc_id")
    val kept = cand.join(contamIds, Seq("doc_id"), "left_anti")
    cand.groupBy("lang").agg(count(lit(1)).as("n_candidates"))
      .join(
        kept.groupBy("lang").agg(count(lit(1)).as("n_kept"),
          sum(col("doc_id")).as("kept_id_checksum"),
          sum(col("n_tokens")).as("kept_tokens")),
        Seq("lang"), "left")
      .select(col("lang"), col("n_candidates"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("kept_id_checksum"), lit(0L)).as("kept_id_checksum"),
        coalesce(col("kept_tokens"), lit(0L)).as("kept_tokens"))
      .orderBy("lang")
  }

  val p03Oracle: String =
    """WITH d AS (
      |  SELECT doc_id, lang, string_split(text, ' ') AS toks,
      |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
      |    row_number() OVER (PARTITION BY lang ORDER BY
      |      CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '#strat'), 1, 8)) AS BIGINT),
      |      doc_id) AS rnk
      |  FROM documents
      |), cand AS (
      |  SELECT * FROM d WHERE rnk <= 25
      |), tr AS (
      |  SELECT DISTINCT unnest(shingles) AS sh FROM (
      |    SELECT list_distinct(list_transform(
      |      list_transform(range(1, len(toks) - 1),
      |        i -> concat_ws(' ', toks[i], toks[i + 1], toks[i + 2])),
      |      g -> CAST(('0x' || substr(md5(g), 1, 15)) AS BIGINT))) AS shingles
      |    FROM d WHERE rnk > 25 AND len(toks) >= 3)
      |), csh AS (
      |  SELECT doc_id, CAST(len(shingles) AS INT) AS n_sh,
      |    unnest(shingles) AS sh
      |  FROM (
      |    SELECT doc_id, list_distinct(list_transform(
      |      list_transform(range(1, len(toks) - 1),
      |        i -> concat_ws(' ', toks[i], toks[i + 1], toks[i + 2])),
      |      g -> CAST(('0x' || substr(md5(g), 1, 15)) AS BIGINT))) AS shingles
      |    FROM cand WHERE len(toks) >= 3)
      |), contam AS (
      |  SELECT doc_id FROM (
      |    SELECT c.doc_id, c.n_sh, COUNT(*) AS n_hit
      |    FROM csh c JOIN tr USING (sh) GROUP BY c.doc_id, c.n_sh)
      |  WHERE CAST(n_hit AS DOUBLE) / n_sh >= 0.5
      |), kept AS (
      |  SELECT * FROM cand WHERE doc_id NOT IN (SELECT doc_id FROM contam)
      |), cagg AS (
      |  SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_candidates FROM cand GROUP BY lang
      |), kagg AS (
      |  SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_kept,
      |    CAST(SUM(doc_id) AS BIGINT) AS kept_id_checksum,
      |    CAST(SUM(n_tokens) AS BIGINT) AS kept_tokens
      |  FROM kept GROUP BY lang
      |)
      |SELECT c.lang, c.n_candidates,
      |  COALESCE(k.n_kept, 0) AS n_kept,
      |  COALESCE(k.kept_id_checksum, 0) AS kept_id_checksum,
      |  COALESCE(k.kept_tokens, 0) AS kept_tokens
      |FROM cagg c LEFT JOIN kagg k USING (lang)
      |ORDER BY c.lang""".stripMargin

  // p04 — pretrain curation v2, composing this round's operators into one
  // declarative lineage the way p01 composes round 5's: Gopher word-count
  // bounds (t14's first rule) → exact-dedup keeper (p01's min_by hash
  // agg) → CCNet familiarity tiers computed over the SURVIVORS (t15's
  // rank arithmetic — stage order is load-bearing: dedup first means the
  // bigram LM trains on unique text, the published CCNet order) → drop
  // the tail tier → leakage-safe grouped split (t16) → per-(split, lang)
  // manifest. One corpus scan feeds everything; the only wide exchanges
  // are the content-hash agg, the bigram count + join-back, and the
  // N_docs-row rank sort — each already costed in its standalone query.
  def p04CurationV2(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(spark, dir)
      .withColumn("toks", split(col("text"), " "))
      .withColumn("n_tokens", size(col("toks")).cast("long"))
    val quality = docs.filter(col("n_tokens") >= 25 && col("n_tokens") <= 50000)
    val exact = quality.groupBy(md5(col("text")).as("_h"))
      .agg(min_by(struct(col("doc_id"), col("lang"), col("source"),
        col("toks"), col("n_tokens")), col("doc_id")).as("_v"))
      .select(col("_v.*"))
    val bg = exact.select(col("doc_id"), explode(zip_with(
        slice(col("toks"), lit(1), size(col("toks")) - 1),
        slice(col("toks"), lit(2), size(col("toks")) - 1),
        (a, b) => concat(a, lit(" "), b))).as("bigram"))
    val cnt = bg.groupBy("bigram").agg(count(lit(1)).as("c"))
    val perDoc = bg.join(cnt, "bigram").groupBy("doc_id")
      .agg(count(lit(1)).as("nb"), sum(col("c")).as("fam"))
    val scored = exact.join(perDoc, Seq("doc_id"), "left")
      .withColumn("avg_fam", when(coalesce(col("nb"), lit(0L)) === 0, 0L)
        .otherwise(expr("fam DIV nb")))
    val n = scored.agg(count(lit(1)).as("n_docs"))
    // two-phase rank (ops.Prefix, the t15 discipline): quantized-score
    // bucket + full-score-led within-bucket order — no single-partition
    // N_docs sort, and the offset table stays bounded as scores grow
    val kept = graft.ops.Prefix.runningRank(scored, expr("avg_fam div 65536"),
        bucketDesc = true, Seq(col("avg_fam").desc, col("doc_id")), "rn")
      .crossJoin(broadcast(n))
      .filter(expr("((rn - 1) * 3) DIV n_docs") < 2)
    kept
      .withColumn("split", graft.ops.TextOps.hashSplit(col("source")))
      .groupBy("split", "lang")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("total_tokens"),
        sum(col("doc_id")).as("id_checksum"))
      .orderBy("split", "lang")
  }

  val p04Oracle: String =
    """WITH d AS (
      |  SELECT doc_id, lang, source, text, string_split(text, ' ') AS toks,
      |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
      |  FROM documents
      |), q AS (
      |  SELECT * FROM d WHERE n_tokens BETWEEN 25 AND 50000
      |), x AS (
      |  SELECT * FROM (
      |    SELECT *, MIN(doc_id) OVER (PARTITION BY md5(text)) AS keeper FROM q)
      |  WHERE doc_id = keeper
      |), bg AS (
      |  SELECT doc_id, toks[i] || ' ' || toks[i + 1] AS bigram
      |  FROM x, LATERAL (SELECT unnest(range(1, len(toks))) AS i) g
      |), cnt AS (
      |  SELECT bigram, COUNT(*) AS c FROM bg GROUP BY 1
      |), pd AS (
      |  SELECT doc_id, COUNT(*) AS nb, SUM(c) AS fam
      |  FROM bg JOIN cnt USING (bigram) GROUP BY 1
      |), sc AS (
      |  SELECT x.doc_id, x.lang, x.source, x.n_tokens,
      |    CASE WHEN COALESCE(pd.nb, 0) = 0 THEN 0
      |         ELSE pd.fam // pd.nb END AS avg_fam
      |  FROM x LEFT JOIN pd USING (doc_id)
      |), r AS (
      |  SELECT *, row_number() OVER (ORDER BY avg_fam DESC, doc_id) AS rn,
      |    COUNT(*) OVER () AS n FROM sc
      |), k AS (
      |  SELECT * FROM r WHERE ((rn - 1) * 3) // n < 2
      |)
      |SELECT CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'valid'
      |            ELSE 'test' END AS split,
      |  lang, COUNT(*) AS n_docs,
      |  CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
      |  CAST(SUM(doc_id) AS BIGINT) AS id_checksum
      |FROM (SELECT *,
      |  CAST(('0x' || substr(md5(source), 1, 8)) AS BIGINT) % 100 AS b FROM k)
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // p05 — TARGET-MIXTURE QUOTA ALLOCATION (largest-remainder method):
  // given target language proportions for a training mix and a global
  // document budget (half the corpus), compute exact integer per-lang
  // quotas — base = ⌊budget·pct/100⌋, then the leftover documents go to
  // the largest fractional remainders (ties by lang) — and fill each
  // quota by the stable md5 rank (t13's stratifiedRank, reproducible
  // under any repartitioning). This is the operator that turns a mixture
  // SPEC ("40% en, 20% zh, ...") into an exact document manifest; t08's
  // mixtureSample is its rate-based cousin (keeps a fixed FRACTION per
  // bucket, quota unknown), p05 hits an exact global budget. Hamilton's
  // method is pure integer arithmetic, so the gate is exact. Plan shape:
  // the quota table is 5 rows (one tiny window over it), broadcast to
  // the corpus; the only corpus-wide work is the per-lang stable-rank
  // window — the same (stratum) shuffle t13 pays. A lang smaller than
  // its quota under-fills (n_sel < quota) and is visibly reported
  // rather than silently rebalanced.
  def p05QuotaMix(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, dir)
    val targets = Seq(("en", 40L), ("zh", 20L), ("de", 15L), ("es", 15L), ("fr", 10L))
      .toDF("lang", "pct")
    val budget = docs.agg((count(lit(1)) / 2).cast("long").as("budget"))
    val wAll = Window.partitionBy()
    val wR = Window.orderBy(col("rem").desc, col("lang"))
    val quota = targets.crossJoin(broadcast(budget))
      .withColumn("base", expr("(budget * pct) div 100"))
      .withColumn("rem", (col("budget") * col("pct")) % 100)
      .withColumn("rrank", row_number().over(wR))
      .withColumn("leftover", col("budget") - sum(col("base")).over(wAll))
      .select(col("lang"), col("pct"),
        (col("base") + when(col("rrank") <= col("leftover"), 1L).otherwise(0L))
          .as("quota"))
    docs
      .withColumn("rk", graft.ops.TextOps.stratifiedRank(col("lang"), col("doc_id")))
      .join(broadcast(quota), Seq("lang"))
      .filter(col("rk") <= col("quota"))
      .groupBy("lang")
      .agg(max(col("pct")).as("pct"), max(col("quota")).as("quota"),
        count(lit(1)).as("n_sel"), sum(col("doc_id")).as("sel_id_sum"))
      .orderBy("lang")
  }

  val p05Oracle: String =
    """WITH t(lang, pct) AS (
      |  VALUES ('en', 40), ('zh', 20), ('de', 15), ('es', 15), ('fr', 10)
      |), tot AS (SELECT COUNT(*) // 2 AS budget FROM documents),
      |alloc AS (
      |  SELECT lang, pct, budget, (budget * pct) // 100 AS base,
      |    (budget * pct) % 100 AS rem
      |  FROM t, tot
      |), q AS (
      |  SELECT lang, pct, base, budget,
      |    row_number() OVER (ORDER BY rem DESC, lang) AS rrank,
      |    SUM(base) OVER () AS base_sum
      |  FROM alloc
      |), quota AS (
      |  SELECT lang, pct, base + CASE WHEN rrank <= budget - base_sum
      |    THEN 1 ELSE 0 END AS quota FROM q
      |), ranked AS (
      |  SELECT doc_id, lang,
      |    row_number() OVER (PARTITION BY lang ORDER BY
      |      CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '#strat'), 1, 8)) AS BIGINT),
      |      doc_id) AS rk
      |  FROM documents
      |)
      |SELECT r.lang, CAST(MAX(q.pct) AS BIGINT) AS pct,
      |  CAST(MAX(q.quota) AS BIGINT) AS quota,
      |  COUNT(*) AS n_sel, CAST(SUM(r.doc_id) AS BIGINT) AS sel_id_sum
      |FROM ranked r JOIN quota q USING (lang)
      |WHERE r.rk <= q.quota
      |GROUP BY r.lang ORDER BY lang""".stripMargin

  // p06 — the DATASET CARD: the per-language one-row summary every
  // released training corpus ships (docs, exact-dup mass, token mass,
  // mixture retention, split sizes) — and the cheapest drift monitor a
  // data pipeline runs nightly. Every column reuses a GATED definition
  // verbatim (d01's md5 content identity, t01's whitespace tokens,
  // t08's mixture thresholds, t06's hash split), so the card cannot
  // drift from the operators it summarizes — the point of gating the
  // composition separately. Plan: one scan with per-doc flags, a
  // (lang, content-hash) pre-aggregate for the distinct count, then
  // the per-lang fold — two narrowing hash aggregates, no window, no
  // collect; output rows = |langs| at any corpus size.
  def p06DatasetCard(spark: SparkSession, dir: String): DataFrame = {
    val rates = Map("en" -> 5000, "fr" -> 7500, "es" -> 7500)
    val d = Tables.documents(spark, dir)
      .select(col("lang"), col("doc_id"), col("text"))
      .withColumn("h", md5(col("text")))
      .withColumn("ntok", size(split(col("text"), " ")).cast("long"))
      .withColumn("mix_kept",
        graft.ops.TextOps.mixtureSample(col("doc_id"), col("lang"), rates))
      .withColumn("split", graft.ops.TextOps.hashSplit(col("doc_id")))
    val perHash = d.groupBy("lang", "h")
      .agg(count(lit(1)).as("n"), sum(col("ntok")).as("ntok"),
        sum(when(col("mix_kept"), 1L).otherwise(0L)).as("n_mix"),
        sum(when(col("split") === "train", 1L).otherwise(0L)).as("n_train"),
        sum(when(col("split") === "valid", 1L).otherwise(0L)).as("n_valid"),
        sum(when(col("split") === "test", 1L).otherwise(0L)).as("n_test"))
    perHash.groupBy("lang")
      .agg(sum(col("n")).as("n_docs"), count(lit(1)).as("n_unique_texts"),
        (sum(col("n")) - count(lit(1))).as("n_dup_docs"),
        sum(col("ntok")).as("n_tokens"),
        sum(col("n_mix")).as("n_mix_kept"),
        sum(col("n_train")).as("n_train"), sum(col("n_valid")).as("n_valid"),
        sum(col("n_test")).as("n_test"))
      .orderBy("lang")
  }

  val p06Oracle: String =
    """WITH d AS (
      |  SELECT lang, md5(text) AS h,
      |    CAST(len(string_split(text, ' ')) AS BIGINT) AS ntok,
      |    CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '#mix'), 1, 8)) AS BIGINT) % 10000
      |      < (CASE lang WHEN 'en' THEN 5000 WHEN 'fr' THEN 7500
      |                   WHEN 'es' THEN 7500 ELSE 10000 END) AS mix_kept,
      |    CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100 AS sb
      |  FROM documents
      |), ph AS (
      |  SELECT lang, h, COUNT(*) AS n, CAST(SUM(ntok) AS BIGINT) AS ntok,
      |    CAST(SUM(CASE WHEN mix_kept THEN 1 ELSE 0 END) AS BIGINT) AS n_mix,
      |    CAST(SUM(CASE WHEN sb < 80 THEN 1 ELSE 0 END) AS BIGINT) AS n_train,
      |    CAST(SUM(CASE WHEN sb >= 80 AND sb < 90 THEN 1 ELSE 0 END) AS BIGINT) AS n_valid,
      |    CAST(SUM(CASE WHEN sb >= 90 THEN 1 ELSE 0 END) AS BIGINT) AS n_test
      |  FROM d GROUP BY lang, h
      |)
      |SELECT lang, CAST(SUM(n) AS BIGINT) AS n_docs,
      |  COUNT(*) AS n_unique_texts,
      |  CAST(SUM(n) - COUNT(*) AS BIGINT) AS n_dup_docs,
      |  CAST(SUM(ntok) AS BIGINT) AS n_tokens,
      |  CAST(SUM(n_mix) AS BIGINT) AS n_mix_kept,
      |  CAST(SUM(n_train) AS BIGINT) AS n_train,
      |  CAST(SUM(n_valid) AS BIGINT) AS n_valid,
      |  CAST(SUM(n_test) AS BIGINT) AS n_test
      |FROM ph GROUP BY lang ORDER BY lang""".stripMargin

  // p07 — INCREMENTAL CURATION (the nightly posture of p01): only
  // day-2 arrivals (doc-id parity, cdc20's adversarial split) flow
  // through the funnel — quality gate (p01's t03 rules, expressed as
  // EXACT integer predicates: stop·8 ≤ n, chars·2 ≥ 7n) → exact-dedup
  // against BOTH the persisted day-1 content-hash index (d20's
  // pattern) and intra-batch (min-id keeper) → mixture sampling
  // (t08's thresholds). Output is the per-language FUNNEL — the
  // stage-by-stage survivor counts an operator reads to spot a
  // regressing filter the morning after. At 100 TB the day-1 index
  // join is the only contact with history, keyed on the content hash —
  // yesterday's corpus is never rescanned.
  def p07IncrementalCuration(spark: SparkSession, dir: String): DataFrame = {
    val rates = Map("en" -> 5000, "fr" -> 7500, "es" -> 7500)
    val docs = Tables.documents(spark, dir)
      .withColumn("toks", split(col("text"), " "))
      .withColumn("n_tokens", size(col("toks")).cast("long"))
      .withColumn("n_stop",
        graft.ops.TextOps.markerHits(col("toks"), Seq("the", "a")).cast("long"))
      .withColumn("tok_chars",
        graft.ops.TextOps.tokenCharSum(col("toks")).cast("long"))
      .withColumn("h", md5(col("text")))
    val day1Index = docs.filter(col("doc_id") % 2 === 0).select("h").distinct()
    val day2 = docs.filter(col("doc_id") % 2 =!= 0)
    val quality = day2.filter(col("n_tokens") >= 25 &&
      col("n_stop") * 8 <= col("n_tokens") &&
      col("tok_chars") * 2 >= col("n_tokens") * 7)
    val fresh = quality.join(day1Index, Seq("h"), "left_anti")
      .groupBy("h")
      .agg(min_by(struct(col("doc_id"), col("lang"), col("n_tokens")),
        col("doc_id")).as("_v"))
      .select(col("_v.*"))
    val kept = fresh.filter(
      graft.ops.TextOps.mixtureSample(col("doc_id"), col("lang"), rates))
    val f0 = day2.groupBy("lang").agg(count(lit(1)).as("n_raw"))
    val f1 = quality.groupBy("lang").agg(count(lit(1)).as("n_quality"))
    val f2 = fresh.groupBy("lang").agg(count(lit(1)).as("n_new"))
    val f3 = kept.groupBy("lang").agg(count(lit(1)).as("n_kept"),
      sum(col("n_tokens")).as("tokens_kept"))
    f0.join(f1, Seq("lang"), "left").join(f2, Seq("lang"), "left")
      .join(f3, Seq("lang"), "left")
      .select(col("lang"), col("n_raw"),
        coalesce(col("n_quality"), lit(0L)).as("n_quality"),
        coalesce(col("n_new"), lit(0L)).as("n_new"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("tokens_kept"), lit(0L)).as("tokens_kept"))
      .orderBy("lang")
  }

  val p07Oracle: String =
    """WITH d AS (
      |  SELECT doc_id, lang, md5(text) AS h,
      |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
      |    CAST(len(list_filter(string_split(text, ' '),
      |      x -> x IN ('the', 'a'))) AS BIGINT) AS n_stop,
      |    CAST(list_sum(list_transform(string_split(text, ' '),
      |      x -> length(x))) AS BIGINT) AS tok_chars
      |  FROM documents
      |), day1 AS (
      |  SELECT DISTINCT h FROM d WHERE doc_id % 2 = 0
      |), day2 AS (
      |  SELECT * FROM d WHERE doc_id % 2 <> 0
      |), quality AS (
      |  SELECT * FROM day2
      |  WHERE n_tokens >= 25 AND n_stop * 8 <= n_tokens
      |    AND tok_chars * 2 >= n_tokens * 7
      |), fresh AS (
      |  SELECT doc_id, lang, n_tokens FROM (
      |    SELECT q.doc_id, q.lang, q.n_tokens,
      |      row_number() OVER (PARTITION BY q.h ORDER BY q.doc_id) AS rn
      |    FROM quality q
      |    WHERE NOT EXISTS (SELECT 1 FROM day1 i WHERE i.h = q.h))
      |  WHERE rn = 1
      |), kept AS (
      |  SELECT * FROM fresh
      |  WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '#mix'), 1, 8)) AS BIGINT) % 10000
      |    < (CASE lang WHEN 'en' THEN 5000 WHEN 'fr' THEN 7500
      |                 WHEN 'es' THEN 7500 ELSE 10000 END)
      |)
      |SELECT f0.lang, f0.n_raw,
      |  COALESCE(f1.n_quality, 0) AS n_quality,
      |  COALESCE(f2.n_new, 0) AS n_new,
      |  COALESCE(f3.n_kept, 0) AS n_kept,
      |  COALESCE(f3.tokens_kept, 0) AS tokens_kept
      |FROM (SELECT lang, COUNT(*) AS n_raw FROM day2 GROUP BY lang) f0
      |LEFT JOIN (SELECT lang, COUNT(*) AS n_quality FROM quality GROUP BY lang) f1
      |  ON f1.lang = f0.lang
      |LEFT JOIN (SELECT lang, COUNT(*) AS n_new FROM fresh GROUP BY lang) f2
      |  ON f2.lang = f0.lang
      |LEFT JOIN (SELECT lang, COUNT(*) AS n_kept,
      |             CAST(SUM(n_tokens) AS BIGINT) AS tokens_kept
      |           FROM kept GROUP BY lang) f3
      |  ON f3.lang = f0.lang
      |ORDER BY f0.lang""".stripMargin

  // p08 — the RELEASE CARD: one per-language table carrying every number
  // a dataset release decision reads, computed from ONE shared near-dup
  // closure — raw doc/token mass, the HARD-dedup survivor count (d12's
  // keep-the-component-min policy), the SOFT-dedup effective mass (d24's
  // 1/|component| ppm weights), and the component-split train/test sizes
  // (d25's leakage-proof assignment). Composing all four policies over
  // one closure is the point: the card's columns must be mutually
  // consistent (hard ≤ soft-effective ≤ raw; train+test = raw) because
  // they share a lineage, and the gate pins that consistency — separate
  // pipelines could silently diverge on closure parameters. Plan: the
  // gated CC subtree once, one component-size join, one (lang) hash agg.
  def p08ReleaseCard(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir).select("doc_id", "lang", "text")
    val sh = graft.ops.Dedup.withShingles(
      docs.withColumn("toks", split(col("text"), " ")), "toks")
    val pairs = graft.ops.Dedup.jaccardPairs(sh, "doc_id", 0.5)
    val comp = graft.ops.Dedup.connectedComponents(
      docs.select("doc_id"), pairs, "doc_id", "doc_a", "doc_b",
      checkpointEvery = 1)
    val sizes = comp.groupBy("component").agg(count(lit(1)).as("csize"))
    docs
      .withColumn("tokens", size(split(col("text"), " ")).cast("long"))
      .join(comp, Seq("doc_id"))
      .join(sizes, Seq("component"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("tokens")).as("tokens"),
        sum(when(col("doc_id") === col("component"), 1L).otherwise(0L))
          .as("n_kept_hard"),
        sum(expr("1000000 div csize")).as("eff_ppm"),
        sum(when(col("component") % 5 =!= 0, 1L).otherwise(0L)).as("n_train"),
        sum(when(col("component") % 5 === 0, 1L).otherwise(0L)).as("n_test"))
      .orderBy("lang")
  }

  val p08Oracle: String =
    DedupQueries.shingleCte.replaceFirst("WITH ", "WITH RECURSIVE ") +
    DedupQueries.pairScoredCte +
    """, pairs AS (
      |  SELECT doc_a, doc_b FROM scored WHERE jaccard >= 0.5
      |), sym AS (
      |  SELECT doc_a AS a, doc_b AS b FROM pairs
      |  UNION ALL SELECT doc_b, doc_a FROM pairs
      |), reach(a, b) AS (
      |  SELECT a, b FROM sym
      |  UNION
      |  SELECT r.a, s2.b FROM reach r JOIN sym s2 ON r.b = s2.a
      |), mn AS (
      |  SELECT a AS doc_id, MIN(b) AS m FROM reach GROUP BY a
      |), comp AS (
      |  SELECT dd.doc_id, dd.lang,
      |    CAST(len(string_split(dd.text, ' ')) AS BIGINT) AS tokens,
      |    LEAST(COALESCE(m.m, dd.doc_id), dd.doc_id) AS component
      |  FROM documents dd LEFT JOIN mn m USING (doc_id)
      |), sizes AS (
      |  SELECT component, COUNT(*) AS csize FROM comp GROUP BY component
      |)
      |SELECT c.lang, COUNT(*) AS n_docs,
      |  CAST(SUM(c.tokens) AS BIGINT) AS tokens,
      |  CAST(SUM(CASE WHEN c.doc_id = c.component THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_kept_hard,
      |  CAST(SUM(1000000 // s.csize) AS BIGINT) AS eff_ppm,
      |  CAST(SUM(CASE WHEN c.component % 5 <> 0 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_train,
      |  CAST(SUM(CASE WHEN c.component % 5 = 0 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_test
      |FROM comp c JOIN sizes s USING (component)
      |GROUP BY c.lang ORDER BY c.lang""".stripMargin

  // p09 — RELEASE-OVER-RELEASE DRIFT CARD: the composition-shift table a
  // data team reads before shipping corpus v2 — per (lang, source) cell,
  // token mass and corpus share in each release plus the share delta,
  // flagged when a cell moved ≥ 500 ppm of the corpus. Release v1 is the
  // deterministic 80% ingest prefix (doc_id % 10 < 8 — the "what last
  // month's snapshot saw" model); v2 is the full corpus. All shares are
  // INTEGER ppm (tokens·10⁶ div total — both engines truncate non-
  // negative division identically), so the gate is exact at every SF and
  // the card never hashes a float. Plan: ONE scan with a conditional
  // aggregate per cell (no per-release scans), then the |cells|-row
  // table re-aggregates to a 1-row total broadcast back over a cross
  // join — the p06/p08 card-plan shape; output rows = |lang|×|source|
  // regardless of corpus size.
  def p09ReleaseDrift(spark: SparkSession, dir: String): DataFrame = {
    val cells = Tables.documents(spark, dir)
      .withColumn("ntok", size(split(col("text"), " ")).cast("long"))
      .groupBy("lang", "source")
      .agg(sum(when(col("doc_id") % 10 < 8, col("ntok")).otherwise(0L))
          .as("tok_v1"),
        sum(col("ntok")).as("tok_v2"))
    val totals = cells.agg(sum(col("tok_v1")).as("tot1"),
      sum(col("tok_v2")).as("tot2"))
    // ppm numerators are widened (decimal(38,0) here, HUGEINT in the
    // oracle) BEFORE the ·10⁶ scale-up: a BIGINT `tok * 1000000` wraps
    // once the corpus passes ~9.2e12 tokens (~37 TB of text) — silently
    // in Spark, as an error in DuckDB. Spark's `div` on decimal inputs
    // truncates exactly to BIGINT (no intermediate scale-6 rounding;
    // pinned by the 9999999999999·10⁶ div 10¹³ = 999999 case in the
    // review), so both engines stay exact to ~10³⁸-token corpora.
    cells.crossJoin(broadcast(totals))
      .withColumn("share_v1_ppm",
        expr("cast(tok_v1 as decimal(38,0)) * 1000000 div tot1"))
      .withColumn("share_v2_ppm",
        expr("cast(tok_v2 as decimal(38,0)) * 1000000 div tot2"))
      .withColumn("delta_ppm", col("share_v2_ppm") - col("share_v1_ppm"))
      .withColumn("drifted", abs(col("delta_ppm")) >= 500)
      .select("lang", "source", "tok_v1", "tok_v2", "share_v1_ppm",
        "share_v2_ppm", "delta_ppm", "drifted")
      .orderBy("lang", "source")
  }

  val p09Oracle: String =
    """WITH c AS (
      |  SELECT lang, source,
      |    CAST(SUM(CASE WHEN doc_id % 10 < 8
      |                  THEN len(string_split(text, ' ')) ELSE 0 END) AS BIGINT) AS tok_v1,
      |    CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS tok_v2
      |  FROM documents GROUP BY 1, 2
      |), t AS (
      |  SELECT CAST(SUM(tok_v1) AS BIGINT) AS tot1,
      |    CAST(SUM(tok_v2) AS BIGINT) AS tot2 FROM c
      |)
      |SELECT lang, source, tok_v1, tok_v2,
      |  CAST(CAST(tok_v1 AS HUGEINT) * 1000000 // tot1 AS BIGINT) AS share_v1_ppm,
      |  CAST(CAST(tok_v2 AS HUGEINT) * 1000000 // tot2 AS BIGINT) AS share_v2_ppm,
      |  CAST(CAST(tok_v2 AS HUGEINT) * 1000000 // tot2
      |       - CAST(tok_v1 AS HUGEINT) * 1000000 // tot1 AS BIGINT) AS delta_ppm,
      |  abs(CAST(tok_v2 AS HUGEINT) * 1000000 // tot2
      |      - CAST(tok_v1 AS HUGEINT) * 1000000 // tot1) >= 500 AS drifted
      |FROM c CROSS JOIN t
      |ORDER BY lang, source""".stripMargin

  // p10 — Z-ORDER LAYOUT AUDIT (the lakehouse OPTIMIZE ZORDER decision,
  // measured instead of asserted): interleave the bits of two scan
  // dimensions — source number and length bucket, 5 bits each — into a
  // Morton z-value, shard on z div 16, and report each shard's dimension
  // SPANS next to the same corpus round-robin-sharded by doc_id. Per-file
  // min/max spans are exactly what parquet data-skipping prunes on: a
  // z-ordered shard covers a narrow (src, len) rectangle (small spans →
  // a filter on EITHER dimension skips most shards), while round-robin
  // shards span the whole domain (skipping prunes nothing). The bit
  // interleave is pure integer arithmetic ((a&2ⁱ) scaled to bit 2i+1 —
  // no engine-specific bit intrinsics), so the gate is exact. Plan: one
  // scan, a 2-layout explode (2× rows, no second scan), one hash agg on
  // (layout, shard); output ≤ 128 rows at any corpus size. At 100 TB the
  // write path this audits is repartitionByRange(z) +
  // sortWithinPartitions(z) before the parquet write.
  def p10ZorderLayout(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        expr("cast(substring(source, 4) as int)").as("a"),
        least(expr("cast(n_chars div 32 as int)"), lit(31)).as("b"))
      .withColumn("zv", expr(
        "(a&1)*2 + (a&2)*4 + (a&4)*8 + (a&8)*16 + (a&16)*32" +
          " + (b&1) + (b&2)*2 + (b&4)*4 + (b&8)*8 + (b&16)*16"))
      .select(col("a"), col("b"), explode(array(
        struct(lit("zorder").as("layout"),
          expr("cast(zv div 16 as bigint)").as("shard")),
        struct(lit("roundrobin").as("layout"),
          pmod(col("doc_id"), lit(64)).cast("long").as("shard")))).as("s"))
      .select(col("a"), col("b"), col("s.layout").as("layout"),
        col("s.shard").as("shard"))
      .groupBy("layout", "shard")
      .agg(count(lit(1)).as("n_docs"),
        (max(col("a")) - min(col("a"))).cast("long").as("src_span"),
        (max(col("b")) - min(col("b"))).cast("long").as("len_span"),
        countDistinct(col("a") * 32 + col("b")).as("n_cells"))
      .orderBy("layout", "shard")

  val p10Oracle: String =
    """WITH d AS (
      |  SELECT doc_id, CAST(substr(source, 4) AS INT) AS a,
      |    LEAST(CAST(n_chars // 32 AS INT), 31) AS b
      |  FROM documents
      |), z AS (
      |  SELECT doc_id, a, b,
      |    (a&1)*2 + (a&2)*4 + (a&4)*8 + (a&8)*16 + (a&16)*32
      |    + (b&1) + (b&2)*2 + (b&4)*4 + (b&8)*8 + (b&16)*16 AS zv
      |  FROM d
      |), s AS (
      |  SELECT 'zorder' AS layout, CAST(zv // 16 AS BIGINT) AS shard, a, b FROM z
      |  UNION ALL
      |  SELECT 'roundrobin', CAST(doc_id % 64 AS BIGINT), a, b FROM z
      |)
      |SELECT layout, shard, COUNT(*) AS n_docs,
      |  CAST(MAX(a) - MIN(a) AS BIGINT) AS src_span,
      |  CAST(MAX(b) - MIN(b) AS BIGINT) AS len_span,
      |  CAST(COUNT(DISTINCT a * 32 + b) AS BIGINT) AS n_cells
      |FROM s GROUP BY 1, 2 ORDER BY layout, shard""".stripMargin

  // p11 — CLIPPED RELEASE: the curated-release funnel with span-level
  // decontamination integrated (quality word-count bound → exact-dedup
  // keeper → leakage clip → per-language token accounting). Stage order
  // is load-bearing: dedup BEFORE clipping means the benchmark gram set
  // and the clip spans are computed over unique text (a duplicated
  // contaminated doc would otherwise multiply its spans), and the
  // held-out split is carved from the deduped survivors — the same docs
  // that seed p03's eval set. Output is the release accounting a model
  // card states: per language, surviving docs, raw tokens, tokens
  // clipped for benchmark leakage (d30's islands over d29's positioned
  // grams), final token budget, and how many docs were touched. One
  // corpus scan; wide exchanges are the content-hash dedup window, the
  // gram semi-join, and the doc-keyed clip window — each already costed
  // in its standalone query (d01/d30).
  def p11ClippedRelease(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .withColumn("toks", split(col("text"), " "))
      .withColumn("n_toks", size(col("toks")))
      .filter(col("n_toks") >= 25) // Gopher word-count lower bound (t14 rule 1)
    val kept = graft.ops.Dedup.exactKeepers(docs, "text", "doc_id")
      .withColumn("split", graft.ops.TextOps.hashSplit(col("doc_id")))
    val bench = DedupQueries.grams8(kept.filter(col("split") === "test"))
      .select("gv").distinct()
    val train = kept.filter(col("split") === "train")
    val perDoc = DedupQueries.clipReport(
      DedupQueries.grams8(train).join(bench, Seq("gv"), "left_semi"))
    train.select("doc_id", "lang", "n_toks")
      .join(perDoc, Seq("doc_id"), "left")
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_toks").cast("long")).as("tokens_raw"),
        sum(coalesce(col("removed"), lit(0L))).as("tokens_removed"),
        (sum(col("n_toks").cast("long")) -
          sum(coalesce(col("removed"), lit(0L)))).as("tokens_final"),
        sum(when(col("removed").isNotNull, 1L).otherwise(0L)).as("docs_clipped"))
      .orderBy("lang")
  }

  val p11Oracle: String =
    s"""WITH dd AS (
      |  SELECT doc_id, lang, text, string_split(text, ' ') AS toks,
      |    CAST(len(string_split(text, ' ')) AS INT) AS n_toks,
      |    CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100 AS bucket
      |  FROM documents
      |  WHERE len(string_split(text, ' ')) >= 25
      |), k AS (
      |  SELECT * FROM (
      |    SELECT *, MIN(doc_id) OVER (PARTITION BY md5(text)) AS kp FROM dd)
      |  WHERE doc_id = kp
      |), ${DedupQueries.duckGrams8Cte("k", "bucket, ")}, bench AS (
      |  SELECT DISTINCT gv FROM g WHERE bucket >= 90
      |), hits AS (
      |  SELECT DISTINCT g.doc_id, g.i FROM g JOIN bench USING (gv) WHERE g.bucket < 80
      |), ${DedupQueries.duckClipCtes}
      |SELECT lang, COUNT(*) AS n_docs,
      |  CAST(SUM(n_toks) AS BIGINT) AS tokens_raw,
      |  CAST(SUM(COALESCE(removed, 0)) AS BIGINT) AS tokens_removed,
      |  CAST(SUM(n_toks) - SUM(COALESCE(removed, 0)) AS BIGINT) AS tokens_final,
      |  CAST(SUM(CASE WHEN removed IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS docs_clipped
      |FROM k LEFT JOIN pd USING (doc_id)
      |WHERE bucket < 80
      |GROUP BY lang ORDER BY lang""".stripMargin

  // p12 — TEMPERATURE-WEIGHTED LANGUAGE MIXTURE (the multilingual
  // rebalancing dial of XLM-R / mT5: sample language l with probability
  // ∝ n_l^α): where p05 consumes a mixture SPEC, p12 DERIVES one from
  // corpus token counts, at the three α values that stay integer-exact —
  // α = 1 (natural: weight = n), α = 0 (uniform: weight = 1), and the
  // classic α = ½ via EXACT INTEGER SQUARE ROOT: the double `sqrt` is
  // correctly rounded but its floor can still sit one off an exact
  // integer boundary, so both engines apply the same ±1 correction
  // (`(c+1)² ≤ n → c+1; c² > n → c−1`) and the gate never depends on
  // float rounding. Output per (α, lang): the natural share, the
  // tempered share, and `boost_ppm` — the up/down-sampling factor
  // low-resource languages actually receive (the number the papers
  // quote). Scale shape: one lang-keyed count shuffle over the corpus;
  // everything after is a ≤ |langs|-row table — the derivation composes
  // with p05's quota filler for the manifest step.
  def p12TemperatureMix(spark: SparkSession, dir: String): DataFrame = {
    val byLang = Tables.documents(spark, dir)
      .groupBy("lang")
      .agg(sum(size(split(col("text"), " ")).cast("long")).as("n_tokens"))
    val isqrt = expr(
      """CASE WHEN (cast(floor(sqrt(cast(n_tokens AS double))) AS bigint) + 1)
        |          * (cast(floor(sqrt(cast(n_tokens AS double))) AS bigint) + 1)
        |          <= n_tokens
        |     THEN cast(floor(sqrt(cast(n_tokens AS double))) AS bigint) + 1
        |     WHEN cast(floor(sqrt(cast(n_tokens AS double))) AS bigint)
        |          * cast(floor(sqrt(cast(n_tokens AS double))) AS bigint)
        |          > n_tokens
        |     THEN cast(floor(sqrt(cast(n_tokens AS double))) AS bigint) - 1
        |     ELSE cast(floor(sqrt(cast(n_tokens AS double))) AS bigint)
        |END""".stripMargin)
    val weighted = byLang.select(col("lang"), col("n_tokens"),
        explode(array(
          struct(lit(100L).as("alpha_e2"), col("n_tokens").as("weight")),
          struct(lit(50L).as("alpha_e2"), isqrt.as("weight")),
          struct(lit(0L).as("alpha_e2"), lit(1L).as("weight")))).as("aw"))
      .select(col("lang"), col("n_tokens"),
        col("aw.alpha_e2").as("alpha_e2"), col("aw.weight").as("weight"))
    val totals = weighted.groupBy("alpha_e2")
      .agg(sum("weight").as("w_total"), sum("n_tokens").as("tok_total"))
    weighted.join(broadcast(totals), "alpha_e2")
      .select(col("alpha_e2"), col("lang"), col("n_tokens"), col("weight"),
        expr("n_tokens * 1000000L div tok_total").as("nat_share_ppm"),
        expr("weight * 1000000L div w_total").as("temp_share_ppm"),
        // greatest(.., 1): a language holding < 1 ppm of corpus tokens
        // floors nat_share_ppm to 0, and ANSI div-by-zero would kill the
        // whole query on plausible long-tail corpora — clamp mirrors s47
        expr("(weight * 1000000L div w_total) * 1000000L" +
          " div greatest(n_tokens * 1000000L div tok_total, 1L)")
          .as("boost_ppm"))
      .orderBy("alpha_e2", "lang")
  }

  val p12Oracle: String =
    """WITH bylang AS (
      |  SELECT lang,
      |    CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
      |  FROM documents GROUP BY lang
      |), c AS (
      |  SELECT lang, n_tokens,
      |    CAST(floor(sqrt(CAST(n_tokens AS DOUBLE))) AS BIGINT) AS c0
      |  FROM bylang
      |), w AS (
      |  SELECT lang, n_tokens, a.alpha_e2,
      |    CASE a.alpha_e2
      |      WHEN 100 THEN n_tokens
      |      WHEN 0 THEN 1
      |      ELSE CASE WHEN (c0 + 1) * (c0 + 1) <= n_tokens THEN c0 + 1
      |                WHEN c0 * c0 > n_tokens THEN c0 - 1
      |                ELSE c0 END
      |    END AS weight
      |  FROM c CROSS JOIN (SELECT unnest([100, 50, 0]) AS alpha_e2) a
      |), tot AS (
      |  SELECT alpha_e2, CAST(SUM(weight) AS BIGINT) AS w_total,
      |    CAST(SUM(n_tokens) AS BIGINT) AS tok_total
      |  FROM w GROUP BY alpha_e2
      |)
      |SELECT CAST(w.alpha_e2 AS BIGINT) AS alpha_e2, w.lang, w.n_tokens,
      |  CAST(w.weight AS BIGINT) AS weight,
      |  CAST(w.n_tokens * 1000000 // t.tok_total AS BIGINT) AS nat_share_ppm,
      |  CAST(w.weight * 1000000 // t.w_total AS BIGINT) AS temp_share_ppm,
      |  CAST((w.weight * 1000000 // t.w_total) * 1000000
      |    // greatest(w.n_tokens * 1000000 // t.tok_total, 1) AS BIGINT)
      |    AS boost_ppm
      |FROM w JOIN tot t USING (alpha_e2)
      |ORDER BY alpha_e2, w.lang""".stripMargin

  // p13 — CONSISTENT-HASH RING vs NAIVE MOD under a shard-count change
  // (Karger et al. 1997; the partition-stability question every storage
  // resize asks): when 8 shards become 9, `id mod n` reassigns ~8/9 of
  // all objects (every data movement system's nightmare) while a hash
  // ring with virtual nodes moves ~1/9 — p13 computes BOTH assignments
  // at n = 8 and n = 9 and reports the moved fraction and the 9-shard
  // load peak per scheme, in exact ppm. The ring is RELATIONAL but
  // broadcast-shaped: 8 vnodes/shard hash to 60-bit positions, the
  // ≤ 72-row (pos, shard) table folds into ONE sorted array literal
  // that broadcasts to the corpus scan, and each object's successor
  // lookup is a per-row array scan (`filter(ring, x.pos >= h)[0]` with
  // wraparound to ring[0]) — no join, no shuffle, no per-object ring
  // walk; the corpus is touched exactly once. The md5 ring positions
  // and object hashes are the engines' shared 60-bit discipline, so
  // every assignment — and therefore every moved/stayed verdict — is
  // exactly replicated in the oracle.
  def p13ConsistentHash(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir).select(col("doc_id"),
      conv(substring(md5(concat(lit("obj:"), col("doc_id").cast("string"))),
        1, 15), 16, 10).cast("long").as("h"))
    def ringArr(n: Int): DataFrame =
      spark.range(n).select(col("id").as("shard"))
        .crossJoin(spark.range(8).select(col("id").as("r")))
        .select(col("shard"),
          conv(substring(md5(concat(lit("vn:"), col("shard").cast("string"),
            lit(":"), col("r").cast("string"))), 1, 15), 16, 10)
            .cast("long").as("pos"))
        .agg(sort_array(collect_list(struct(col("pos"), col("shard"))))
          .as(s"ring$n"))
    val assigned = docs
      .crossJoin(broadcast(ringArr(8)))
      .crossJoin(broadcast(ringArr(9)))
      .select(col("doc_id"),
        expr("coalesce(get(filter(ring8, x -> x.pos >= h), 0).shard," +
          " ring8[0].shard)").as("rs8"),
        expr("coalesce(get(filter(ring9, x -> x.pos >= h), 0).shard," +
          " ring9[0].shard)").as("rs9"),
        pmod(col("doc_id"), lit(8)).as("ms8"),
        pmod(col("doc_id"), lit(9)).as("ms9"))
    val byScheme = assigned
      .select(col("doc_id"), lit("mod").as("scheme"),
        col("ms8").as("s8"), col("ms9").as("s9"))
      .unionByName(assigned.select(col("doc_id"), lit("ring").as("scheme"),
        col("rs8").as("s8"), col("rs9").as("s9")))
    val stats = byScheme.groupBy("scheme")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("s8") =!= col("s9"), 1L).otherwise(0L)).as("n_moved"))
    val load9 = byScheme.groupBy("scheme", "s9")
      .agg(count(lit(1)).as("c"))
      .groupBy("scheme").agg(max(col("c")).as("max_load9"))
    stats.join(load9, "scheme")
      .select(col("scheme"), col("n_docs"), col("n_moved"),
        expr("n_moved * 1000000L div n_docs").as("moved_ppm"),
        expr("max_load9 * 1000000L div n_docs").as("max_load9_ppm"))
      .orderBy("scheme")
  }

  val p13Oracle: String = {
    def vn(n: Int): String =
      s"""vn$n AS (
         |  SELECT s.s AS shard,
         |    CAST(('0x' || substr(md5(concat('vn:', CAST(s.s AS VARCHAR),
         |      ':', CAST(r.r AS VARCHAR))), 1, 15)) AS BIGINT) AS pos
         |  FROM (SELECT unnest(range(0, $n)) AS s) s,
         |       (SELECT unnest(range(0, 8)) AS r) r
         |), ring$n AS (
         |  SELECT list(struct_pack(pos := pos, shard := shard)
         |              ORDER BY pos) AS ring
         |  FROM vn$n
         |)""".stripMargin
    s"""WITH docs AS (
       |  SELECT doc_id,
       |    CAST(('0x' || substr(md5('obj:' || CAST(doc_id AS VARCHAR)),
       |      1, 15)) AS BIGINT) AS h
       |  FROM documents
       |), ${vn(8)}, ${vn(9)},
       |a AS (
       |  SELECT doc_id,
       |    COALESCE(list_filter(r8.ring, x -> x.pos >= h)[1].shard,
       |      r8.ring[1].shard) AS rs8,
       |    COALESCE(list_filter(r9.ring, x -> x.pos >= h)[1].shard,
       |      r9.ring[1].shard) AS rs9,
       |    doc_id % 8 AS ms8, doc_id % 9 AS ms9
       |  FROM docs CROSS JOIN ring8 r8 CROSS JOIN ring9 r9
       |), b AS (
       |  SELECT doc_id, 'mod' AS scheme, ms8 AS s8, ms9 AS s9 FROM a
       |  UNION ALL
       |  SELECT doc_id, 'ring', rs8, rs9 FROM a
       |), st AS (
       |  SELECT scheme, COUNT(*) AS n_docs,
       |    CAST(SUM(CASE WHEN s8 <> s9 THEN 1 ELSE 0 END) AS BIGINT)
       |      AS n_moved
       |  FROM b GROUP BY scheme
       |), ld AS (
       |  SELECT scheme, MAX(c) AS max_load9 FROM (
       |    SELECT scheme, s9, COUNT(*) AS c FROM b GROUP BY scheme, s9)
       |  GROUP BY scheme
       |)
       |SELECT st.scheme, st.n_docs, st.n_moved,
       |  CAST(st.n_moved * 1000000 // st.n_docs AS BIGINT) AS moved_ppm,
       |  CAST(ld.max_load9 * 1000000 // st.n_docs AS BIGINT)
       |    AS max_load9_ppm
       |FROM st JOIN ld USING (scheme) ORDER BY st.scheme""".stripMargin
  }

  // p14 — STREAMING TOKEN-QUOTA ADMISSION (p05's per-language cap in
  // the ingest posture: a curation pipeline admits documents as they
  // ARRIVE until each language's token budget fills — it does not
  // buffer the crawl and cap in a batch pass). Documents ride the wire
  // as id-range-ordered binlog batches (the d32/d33 ingest discipline);
  // per micro-batch, each doc's admission verdict is "tokens consumed
  // by same-language docs with SMALLER doc_id < quota", computed from
  // the ACCUMULATED per-language totals (ViewMaintenance state of
  // additive partials under the cdc48 exactly-once discipline: batch_id
  // partition overwrites, the prior read filtered to batch_id < id, and
  // an INJECTED batch-0 redelivery absorbed bit-for-bit) plus an
  // intra-batch running sum (two-phase, lang-keyed window). The strict
  // id-prefix rule makes the admitted set batch-split-independent, so a
  // plain batch window oracle gates the stream. The quota is derived
  // from the data (global token count div 6 — a same-for-every-language
  // budget that big languages overflow and small ones never reach, so
  // both admission outcomes are live at every SF; the t31 lesson).
  // The last admitted doc may overshoot its language's budget — the
  // documented greedy-admission convention (a doc is atomic). At 100 TB:
  // per batch one narrow map + a lang-keyed window + a ≤|langs|-row
  // state read/append — admission never shuffles the corpus.
  def p14StreamQuotaAdmission(spark: SparkSession, dir: String): DataFrame = {
    import graft.streaming.ViewMaintenance
    val root = graft.streaming.Drains.tmpFixtureDir("graft_p14_", dir)
    root.mkdirs()
    val feed = new java.io.File(root, "feed").getPath
    val state = new java.io.File(root, "state").getPath
    val admitted = new java.io.File(root, "admitted").getPath
    val ckpt = new java.io.File(root, "ckpt").getPath
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"), col("text"))
    // data-derived per-language budget (integer-exact on both engines)
    val totRow = docs
      .agg(sum(size(split(col("text"), " ")).cast("long"))).head()
    val quota = if (totRow.isNullAt(0)) 0L else totRow.getLong(0) / 6L
    // lang and text ride the wire as their OWN typed columns — the r13
    // multi-column sink (op, doc_id BIGINT, lang STRING, text STRING →
    // LONGLONG + VARCHAR + VARCHAR, bounds derived from the data),
    // retiring the r12 `lang|text` payload-packing workaround
    graft.ingest.BinlogSink.writeChanges(
      docs.select(lit(1).as("op"), col("doc_id"), col("lang"), col("text"))
        .repartitionByRange(4, col("doc_id")),
      feed)
    // drain + the injected batch-0 redelivery (the cdc48 discipline):
    // both states land via applyIdempotent (batch_id partition
    // overwrite), and the prior-totals read FILTERS to batch_id < id —
    // a replayed batch therefore sees the same prior, computes the same
    // admissions, and overwrites its own partitions bit-for-bit
    graft.streaming.Drains.drainWithRedelivery(spark, feed, ckpt) { (batch, id) =>
      val d = batch.filter(col("event_type") === "WriteRowsEventV2")
        .select(explode(col("row_images")).as("img"))
        .select(element_at(col("img"), 1).cast("long").as("doc_id"),
          element_at(col("img"), 2).as("lang"),
          element_at(col("img"), 3).as("text"))
        .withColumn("toks", size(split(col("text"), " ")).cast("long"))
      val prior = ViewMaintenance.readState(spark, state,
          "lang STRING, t BIGINT, batch_id BIGINT")
        .filter(col("batch_id") < id) // replay reads the SAME prior
        .groupBy("lang").agg(sum(col("t")).as("prior_toks"))
      val w = Window.partitionBy("lang").orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
      val scored = d
        .withColumn("intra_before", coalesce(sum(col("toks")).over(w), lit(0L)))
        .join(broadcast(prior), Seq("lang"), "left")
        .withColumn("before",
          col("intra_before") + coalesce(col("prior_toks"), lit(0L)))
        .localCheckpoint(true) // admission write + state write
      ViewMaintenance.applyIdempotent(
        scored.filter(col("before") < quota)
          .select("doc_id", "lang", "toks"), admitted, id)
      ViewMaintenance.applyIdempotent(
        scored.groupBy("lang").agg(sum(col("toks")).as("t")), state, id)
    }
    val adm = ViewMaintenance.readState(spark, admitted,
        "doc_id BIGINT, lang STRING, toks BIGINT, batch_id BIGINT")
      .groupBy("lang")
      .agg(count(lit(1)).as("n_admitted"),
        sum(col("toks")).as("tokens_admitted"),
        sum(col("doc_id")).as("admitted_id_sum"))
    docs.select(col("lang"), size(split(col("text"), " ")).cast("long").as("toks"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"), sum(col("toks")).as("tokens_seen"))
      .join(adm, Seq("lang"), "left")
      .select(col("lang"), col("n_docs"), col("tokens_seen"),
        coalesce(col("n_admitted"), lit(0L)).as("n_admitted"),
        coalesce(col("tokens_admitted"), lit(0L)).as("tokens_admitted"),
        coalesce(col("admitted_id_sum"), lit(0L)).as("admitted_id_sum"))
      .orderBy("lang")
  }

  val p14Oracle: String =
    """WITH d AS (
      |  SELECT doc_id, lang,
      |    CAST(len(string_split(text, ' ')) AS BIGINT) AS toks
      |  FROM documents
      |), q AS (
      |  SELECT CAST(SUM(toks) // 6 AS BIGINT) AS quota FROM d
      |), cum AS (
      |  SELECT doc_id, lang, toks,
      |    COALESCE(SUM(toks) OVER (PARTITION BY lang ORDER BY doc_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS before
      |  FROM d
      |), adm AS (
      |  SELECT lang, COUNT(*) AS n_admitted,
      |    CAST(SUM(toks) AS BIGINT) AS tokens_admitted,
      |    CAST(SUM(doc_id) AS BIGINT) AS admitted_id_sum
      |  FROM cum, q WHERE before < q.quota GROUP BY lang
      |)
      |SELECT d.lang, COUNT(*) AS n_docs,
      |  CAST(SUM(d.toks) AS BIGINT) AS tokens_seen,
      |  COALESCE(MIN(a.n_admitted), 0) AS n_admitted,
      |  COALESCE(MIN(a.tokens_admitted), 0) AS tokens_admitted,
      |  COALESCE(MIN(a.admitted_id_sum), 0) AS admitted_id_sum
      |FROM d LEFT JOIN adm a ON a.lang = d.lang
      |GROUP BY d.lang ORDER BY d.lang""".stripMargin

  // p15 — MAINTAINED-STATE METRICS surface (the operational "is my view
  // healthy" query every IVM user hand-writes, promoted to one call:
  // ViewMaintenance.stateMetrics): a per-language token-sum state is
  // maintained over four DETERMINISTIC id-range batches (the s51
  // quartile cuts — DuckDB can replay exactly which batch each doc
  // landed in, which hash-partitioned feeds cannot offer), batches 0–1
  // are compacted into a base snapshot, and the gate pins the manifest
  // the metrics report: the base row (its reserved batch_id encodes the
  // coverage; covered_upto recovers it) plus the two live batches, each
  // with its exact partial-row count (= distinct languages in the
  // slice). File/byte columns exist on the API but are writer-layout-
  // dependent, so the gate selects the oracle-exact columns — the same
  // bytes>0 sanity lives in the spec suite instead. No streaming drain:
  // the surface under test is the manifest, so the batches apply
  // directly (applyIdempotent in a loop) and the gate stays batch-cheap.
  def p15StateMetrics(spark: SparkSession, dir: String): DataFrame = {
    import graft.streaming.ViewMaintenance
    val root = graft.streaming.Drains.tmpFixtureDir("graft_p15_", dir)
    root.mkdirs()
    val state = new java.io.File(root, "state").getPath
    val stateSchema = "lang STRING, t BIGINT, batch_id BIGINT"
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"),
        size(split(col("text"), " ")).cast("long").as("toks"))
    val maxRow = docs.agg(max(col("doc_id"))).head()
    if (!maxRow.isNullAt(0)) {
      val mx = maxRow.getLong(0)
      val cuts = Seq(0L, mx / 4 + 1, mx / 2 + 1, 3 * mx / 4 + 1, mx + 1)
      cuts.sliding(2).zipWithIndex.foreach { case (Seq(lo, hi), i) =>
        ViewMaintenance.applyIdempotent(
          docs.filter(col("doc_id") >= lo && col("doc_id") < hi)
            .groupBy("lang").agg(sum(col("toks")).as("t")),
          state, i.toLong)
      }
    }
    // UNCONDITIONAL: an empty table still compacts (the fold of nothing
    // is an empty base) — so the metrics report the base row with
    // n_rows = 0, exactly as the oracle's ungrouped aggregate does, and
    // the empty-corpus case is a real manifest, not a missing one
    ViewMaintenance.compact(spark, state, stateSchema, upto = 1L)(
      _.groupBy("lang").agg(sum(col("t")).as("t")))
    ViewMaintenance.stateMetrics(spark, state, stateSchema)
      .select("batch_id", "is_base", "covered_upto", "n_rows")
  }

  val p15Oracle: String =
    """WITH d AS (
      |  SELECT doc_id, lang FROM documents
      |), mx AS (
      |  SELECT MAX(doc_id) AS m FROM d
      |), sl AS (
      |  SELECT lang,
      |    CASE WHEN doc_id < m // 4 + 1 THEN 0
      |         WHEN doc_id < m // 2 + 1 THEN 1
      |         WHEN doc_id < (3 * m) // 4 + 1 THEN 2
      |         ELSE 3 END AS b
      |  FROM d, mx
      |)
      |SELECT * FROM (
      |  SELECT CAST(-1000000001 AS BIGINT) AS batch_id, TRUE AS is_base,
      |    CAST(1 AS BIGINT) AS covered_upto,
      |    CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_rows
      |  FROM sl WHERE b <= 1
      |  UNION ALL
      |  SELECT CAST(b AS BIGINT), FALSE, CAST(-1 AS BIGINT),
      |    CAST(COUNT(DISTINCT lang) AS BIGINT)
      |  FROM sl WHERE b >= 2 GROUP BY b)
      |ORDER BY batch_id""".stripMargin

  // p16 — MAINTAINED-STATE SCHEMA EVOLUTION (the lifecycle seam p15's
  // metrics don't cover: a long-lived view ADDS a partial column
  // mid-stream — new code tracks doc counts next to token sums — and
  // the state must keep serving across the boundary without a rewrite).
  // Batches 0–1 land with (lang, t); batches 2–3 with (lang, t,
  // n_docs). readState's explicit schema makes parquet surface the old
  // partitions' missing column as NULL (never a schema-inference error
  // or a silent drop), the serve-time fold coalesces it additively
  // (absent = contributed 0 — the standard backfill for an additive
  // partial, documented by the gate's own docs_tracked column counting
  // ONLY post-evolution batches), and a compaction spanning the
  // boundary (upto=2: one narrow batch + one wide batch + the narrow
  // base) folds into the WIDE schema. The oracle reconstructs both
  // metrics from the deterministic quartile batches, so a dropped old
  // partition, a mis-coalesced null, or a fold that loses the new
  // column is a hash mismatch. At 100 TB this is how a maintained view
  // evolves in place: no state rewrite, no dual-write window — old
  // partials age out through compaction.
  def p16StateEvolution(spark: SparkSession, dir: String): DataFrame = {
    import graft.streaming.ViewMaintenance
    val root = graft.streaming.Drains.tmpFixtureDir("graft_p16_", dir)
    root.mkdirs()
    val state = new java.io.File(root, "state").getPath
    val wideSchema = "lang STRING, t BIGINT, n_docs BIGINT, batch_id BIGINT"
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"),
        size(split(col("text"), " ")).cast("long").as("toks"))
    val maxRow = docs.agg(max(col("doc_id"))).head()
    if (!maxRow.isNullAt(0)) {
      val mx = maxRow.getLong(0)
      val cuts = Seq(0L, mx / 4 + 1, mx / 2 + 1, 3 * mx / 4 + 1, mx + 1)
      cuts.sliding(2).zipWithIndex.foreach { case (Seq(lo, hi), i) =>
        val slice = docs.filter(col("doc_id") >= lo && col("doc_id") < hi)
        val partials =
          if (i < 2) slice.groupBy("lang").agg(sum(col("toks")).as("t"))
          else slice.groupBy("lang").agg(sum(col("toks")).as("t"),
            count(lit(1)).as("n_docs")) // the EVOLVED shape
        ViewMaintenance.applyIdempotent(partials, state, i.toLong)
        // compact ACROSS the evolution boundary: narrow batches 0–1 +
        // wide batch 2 fold into one wide-schema base
        if (i == 2)
          ViewMaintenance.compact(spark, state, wideSchema, upto = 2L)(
            _.groupBy("lang").agg(sum(col("t")).as("t"),
              sum(coalesce(col("n_docs"), lit(0L))).as("n_docs")))
      }
    }
    ViewMaintenance.readState(spark, state, wideSchema)
      .groupBy("lang")
      .agg(sum(col("t")).as("tokens"),
        sum(coalesce(col("n_docs"), lit(0L))).as("docs_tracked"))
      .orderBy("lang")
  }

  val p16Oracle: String =
    """WITH d AS (
      |  SELECT doc_id, lang,
      |    CAST(len(string_split(text, ' ')) AS BIGINT) AS toks
      |  FROM documents
      |), mx AS (
      |  SELECT MAX(doc_id) AS m FROM d
      |)
      |SELECT lang, CAST(SUM(toks) AS BIGINT) AS tokens,
      |  CAST(SUM(CASE WHEN doc_id >= m // 2 + 1 THEN 1 ELSE 0 END)
      |    AS BIGINT) AS docs_tracked
      |FROM d, mx GROUP BY lang ORDER BY lang""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "p16_state_evolution" -> (p16StateEvolution _),
    "p15_state_metrics" -> (p15StateMetrics _),
    "p14_stream_quota_admission" -> (p14StreamQuotaAdmission _),
    "p13_consistent_hash" -> (p13ConsistentHash _),
    "p12_temperature_mix" -> (p12TemperatureMix _),
    "p01_training_mix" -> (p01TrainingMix _),
    "p11_clipped_release" -> (p11ClippedRelease _),
    "p09_release_drift" -> (p09ReleaseDrift _),
    "p10_zorder_layout" -> (p10ZorderLayout _),
    "p02_shard_manifest" -> (p02ShardManifest _),
    "p03_eval_set" -> (p03EvalSet _),
    "p04_curation_v2" -> (p04CurationV2 _),
    "p05_quota_mix" -> (p05QuotaMix _),
    "p06_dataset_card" -> (p06DatasetCard _),
    "p07_incremental_curation" -> (p07IncrementalCuration _),
    "p08_release_card" -> (p08ReleaseCard _),
  )

  val oracles: Map[String, String] = Map(
    "p16_state_evolution" -> p16Oracle,
    "p15_state_metrics" -> p15Oracle,
    "p14_stream_quota_admission" -> p14Oracle,
    "p13_consistent_hash" -> p13Oracle,
    "p12_temperature_mix" -> p12Oracle,
    "p01_training_mix" -> p01Oracle,
    "p11_clipped_release" -> p11Oracle,
    "p09_release_drift" -> p09Oracle,
    "p10_zorder_layout" -> p10Oracle,
    "p02_shard_manifest" -> p02Oracle,
    "p03_eval_set" -> p03Oracle,
    "p04_curation_v2" -> p04Oracle,
    "p05_quota_mix" -> p05Oracle,
    "p06_dataset_card" -> p06Oracle,
    "p07_incremental_curation" -> p07Oracle,
    "p08_release_card" -> p08Oracle,
  )
}
