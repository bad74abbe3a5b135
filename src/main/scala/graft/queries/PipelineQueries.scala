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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "p01_training_mix" -> (p01TrainingMix _),
  )

  val oracles: Map[String, String] = Map(
    "p01_training_mix" -> p01Oracle,
  )
}
