package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.PostingPairs.postingPairs
import graft.functions.TextHashFunctions.{minHashSig, shingleHash60, simHash32}
import graft.functions.VectorFunctions.cosineSim

/** Reusable deduplication operators (the library surface behind the d01–d06
  * bench queries): exact content-hash dedup, shingle-Jaccard candidate
  * pairs via an inverted index, MinHash+LSH, SimHash signatures, and
  * embedding-cosine near-dups. All are pure DataFrame transforms
  * parameterized by column names — callers bring any schema.
  *
  * Scale design (100 TB): every operator shuffles at most on a bounded key
  * (content hash, shingle hash, band signature) with map-side partial
  * aggregation; nothing collects to the driver, no O(n²) cross joins —
  * candidate pairs only materialize through posting lists / LSH buckets,
  * both bounded by the stop-shingle / band-width guards.
  */
object Dedup {

  /** Exact dedup groups: one row per distinct content with the group size
    * and the canonical (minimum-id) keeper. */
  def exactGroups(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.groupBy(md5(col(textCol)).as("content_hash"))
      .agg(count(lit(1)).as("n_docs"), min(col(idCol)).as("keeper_id"))

  /** Keep one row per distinct `textCol` (the minimum-`idCol` row wins) —
    * the filter form of [[exactGroups]]. */
  def exactKeepers(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy(md5(col(textCol)))
    df.withColumn("_keeper", min(col(idCol)).over(w))
      .filter(col(idCol) === col("_keeper"))
      .drop("_keeper")
  }

  /** Last-wins key dedup — the reference comparator's build-side semantics
    * (map insert, compare_timestamps.go:147) generalized to any key: keep,
    * per key, the row with the greatest `seq`. One hash aggregate
    * (max_by), map-side combinable; the output partitioning is the key,
    * reusable by a following join on the same key. */
  def lastWins(df: DataFrame, keyCols: Seq[String], seq: Column): DataFrame = {
    val withSeq = df.withColumn("_seq", seq)
    val valueCols = withSeq.columns.filterNot(keyCols.contains)
    withSeq
      .groupBy(keyCols.map(col): _*)
      .agg(max_by(struct(valueCols.map(col): _*), col("_seq")).as("_v"))
      .select(keyCols.map(col) ++
        valueCols.filterNot(_ == "_seq").map(c => col("_v." + c).as(c)): _*)
  }

  /** Add `shingles` (distinct 60-bit-hashed n-gram shingles of `toksCol`)
    * and `n_sh`; rows with fewer than `n` tokens are dropped (no shingle
    * exists). */
  def withShingles(df: DataFrame, toksCol: String, n: Int = 3): DataFrame =
    df.filter(size(col(toksCol)) >= n)
      .withColumn("shingles", shingleHash60(col(toksCol), n))
      .withColumn("n_sh", size(col("shingles")))

  /** Candidate-pair intersection counts over the shingle inverted index:
    * input must carry (`idCol`, `shingles`, `n_sh`) — see [[withShingles]].
    * Pairs materialize only inside per-shingle posting lists (one shuffle
    * keyed on the shingle, pairs expanded by the native [[PostingPairs]]
    * generator); lists longer than `maxPosting` are dropped — the
    * stop-shingle guard that bounds the k²/2 expansion of hot shingles at
    * scale. Output: (doc_a, doc_b, na, nb, inter). */
  def jaccardPairCounts(df: DataFrame, idCol: String, maxPosting: Int = 100): DataFrame = {
    val ex = df.select(col(idCol).as("doc_id"), col("n_sh"),
      explode(col("shingles")).as("sh"))
    ex.groupBy("sh")
      .agg(collect_list(struct(col("doc_id"), col("n_sh"))).as("ds"))
      .filter(size(col("ds")).between(2, maxPosting))
      .select(postingPairs(col("ds")).as(Seq("doc_a", "na", "doc_b", "nb")))
      .groupBy("doc_a", "doc_b", "na", "nb")
      .agg(count(lit(1)).as("inter"))
  }

  /** Near-dup pairs with exact Jaccard ≥ `minJaccard` over the inverted
    * index. Output: (doc_a, doc_b, inter, un, jaccard). */
  def jaccardPairs(df: DataFrame, idCol: String, minJaccard: Double,
      maxPosting: Int = 100): DataFrame =
    jaccardPairCounts(df, idCol, maxPosting)
      .withColumn("un", col("na") + col("nb") - col("inter"))
      .withColumn("jaccard", col("inter").cast("double") / col("un"))
      .filter(col("jaccard") >= minJaccard)

  /** MinHash+LSH candidate pairs verified with exact Jaccard: `bands` bands
    * of `rowsPerBand` signature components are the bucket keys (shuffle
    * key); only same-bucket ids pair up, and the shingle sets are joined
    * back solely for the surviving candidates. Input like [[withShingles]].
    * Output: (doc_a, doc_b, inter, jaccard). */
  def minHashLshPairs(df: DataFrame, idCol: String, minJaccard: Double,
      bands: Int = 4, rowsPerBand: Int = 4): DataFrame = {
    val docs = df.select(col(idCol).as("doc_id"), col("shingles"), col("n_sh"),
      minHashSig(col("shingles"), bands * rowsPerBand).as("sig"))
    val bandExprs = (0 until bands).map { b =>
      val parts = (1 to rowsPerBand).map(r => s"element_at(sig, ${rowsPerBand * b + r})")
      s"concat_ws('-', $b, ${parts.mkString(", ")})"
    }
    val banded = docs.select(col("doc_id"),
      explode(array(bandExprs.map(expr): _*)).as("band"))
    val cand = banded.select(col("doc_id").as("doc_a"), col("band"))
      .join(banded.select(col("doc_id").as("doc_b"), col("band")), Seq("band"))
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b").distinct()
    cand
      .join(docs.select(col("doc_id").as("doc_a"), col("shingles").as("sh_a"),
        col("n_sh").as("na")), Seq("doc_a"))
      .join(docs.select(col("doc_id").as("doc_b"), col("shingles").as("sh_b"),
        col("n_sh").as("nb")), Seq("doc_b"))
      .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))))
      .withColumn("jaccard",
        col("inter").cast("double") / (col("na") + col("nb") - col("inter")))
      .filter(col("jaccard") >= minJaccard)
      .select("doc_a", "doc_b", "inter", "jaccard")
  }

  /** Per-row 32-bit SimHash signature of a token-array column — no shuffle
    * at all; near-dup = small Hamming distance between signatures. */
  def simHashSignature(toks: Column): Column = simHash32(toks)

  /** Embedding-cosine near-dup pairs ≥ `minCos` (brute-force exact — the
    * LSH/IVF paths in [[Similarity]] are the approximate scale path). The
    * streamed side fans out over `fanout` partitions, the other side
    * broadcasts. Output: (id_a, id_b, cos). */
  def embeddingNearDups(df: DataFrame, idCol: String, embCol: String,
      minCos: Double, fanout: Int = 32): DataFrame = {
    val a = df.select(col(idCol).as("id_a"), col(embCol).as("_qv")).repartition(fanout)
    val b = df.select(col(idCol).as("id_b"), col(embCol).as("_emb"))
    a.join(broadcast(b), col("id_a") < col("id_b"))
      .withColumn("cos", cosineSim(col("_qv"), col("_emb")))
      .filter(col("cos") >= minCos)
      .select("id_a", "id_b", "cos")
  }
}
