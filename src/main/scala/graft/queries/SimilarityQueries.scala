package graft.queries

import java.security.MessageDigest

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.VectorFunctions.cosineSim

/** Similarity search over the `embeddings` table (builder prompt /
  * SURVEY §7.7): brute-force cosine top-k as the baseline, and a
  * random-hyperplane LSH-bucketed variant as the scale path, plus
  * embedding-cosine near-dup pairs.
  *
  * Scale design: the query set is broadcast against the corpus scan
  * (N×Q stays linear in N); the LSH variant buckets both sides on an
  * 8-bit hyperplane signature so the candidate join shuffles on the
  * bucket key instead of comparing all pairs. Cosine runs through the
  * codegen'd `CosineSimilarity` Catalyst expression (one fused pass,
  * no intermediate arrays).
  *
  * Cross-engine exactness: outputs are integer ranks/ids (plus a
  * floor-scaled cosine where informative). Both engines compute the dot
  * product as an ascending left fold in double precision; adjacent
  * neighbor gaps (~1e-3) dwarf any last-bit divergence, so ranks are
  * stable. The LSH plane matrix is a ±1 literal baked identically into
  * the Spark plan and the oracle SQL from one deterministic generator.
  */
object SimilarityQueries {

  // ---------------------------------------------------------------- planes

  /** Deterministic ±1 hyperplane matrix (`nPlanes` × 64 dims) from md5
    * parity of `"${prefix}_${j}_${i}"` — generated once, embedded as a
    * literal on both engines. */
  private def planeTable(prefix: String, nPlanes: Int): Seq[Seq[Int]] = {
    val md = MessageDigest.getInstance("MD5")
    (0 until nPlanes).map { j =>
      (0 until 64).map { i =>
        val h = md.digest(s"${prefix}_${j}_$i".getBytes("UTF-8"))
        if ((h(0) & 1) == 0) 1 else -1
      }
    }
  }

  /** The s02 bucket table (8 planes × 64 dims). */
  lazy val planes: Seq[Seq[Int]] = planeTable("plane", 8)

  /** The d07 banding tables: 8 independent tables × 8 planes. */
  lazy val lshTables: Seq[Seq[Seq[Int]]] =
    (0 until 8).map(t => planeTable(s"tplane_$t", 8))

  /** Chunk count for the bounded centroid fold (s03–s10): bounds the
    * level-2 fold row at `chunks` × 64 doubles (~512 KB) no matter how
    * large a cluster grows. Baked identically into the Spark plan and the
    * oracle — the chunking is part of the deterministic-fold contract.
    * Deployment-overridable WITHOUT code via `-Dgraft.centroidChunks=N`:
    * a JVM property (not a session conf) because the oracle SQL strings
    * are object-init vals — both the Spark plans and the oracle text
    * derive from this one value, so the gate stays exact at any setting.
    * (The operator layer's session dial is
    * [[graft.ops.Similarity.ChunksConfKey]]; the gate queries pass this
    * value explicitly so query and oracle can never disagree.) */
  val centroidChunks: Int = {
    val v = sys.props.get("graft.centroidChunks").map { raw =>
      // name the property on a bad value: a bare NumberFormatException
      // inside this object initializer would surface as an opaque
      // ExceptionInInitializerError with no hint at the one-char typo
      try raw.toInt catch {
        case _: NumberFormatException => throw new IllegalArgumentException(
          s"-Dgraft.centroidChunks must be a positive integer, got '$raw'")
      }
    }.getOrElse(1024)
    require(v > 0, s"-Dgraft.centroidChunks must be positive, got $v")
    v
  }

  /** DuckDB `VALUES` rows `(tbl, pj, pvec)` — one row per plane, `pvec`
    * a 64-element ±1 list literal. Feeding the planes in as a relation
    * (instead of inlining the whole matrix literal inside a
    * `list_transform` lambda, which DuckDB re-evaluates per element —
    * round 3's gate-breaking >10-min oracle) keeps the oracle vectorized:
    * the dot product folds over a *column* reference, so the full d07
    * bucket computation runs in ~0.1 s at sf0.01. */
  private def duckPlanesValues(tables: Seq[Seq[Seq[Int]]]): String =
    tables.zipWithIndex.flatMap { case (pls, t) =>
      pls.zipWithIndex.map { case (p, j) =>
        s"($t, $j, ${p.mkString("[", ", ", "]")})"
      }
    }.mkString(",\n      |  ")

  /** CTE bodies computing per-(vec_id, tbl) hyperplane buckets over the
    * `embeddings` view — the exact mirror of
    * [[graft.ops.Similarity.lshBucket]]: the dot product is the same
    * ascending i-fold in double precision (`list_sum` over
    * `list_transform(range(1, 65), ...)`), and the bucket is a sum of
    * distinct powers of two (integer, order-independent), so the `> 0.0`
    * sign test is bit-identical cross-engine. Yields CTEs `pl`, `dots`,
    * `bk(vec_id, tbl, bucket)`. */
  private def duckBucketCtes(tables: Seq[Seq[Seq[Int]]]): String = {
    val dim = tables.head.head.size
    s"""pl(tbl, pj, pvec) AS (VALUES ${duckPlanesValues(tables)}),
      |dots AS (
      |  SELECT e.vec_id, p.tbl, p.pj,
      |    list_sum(list_transform(range(1, ${dim + 1}), i -> CAST(e.embedding[i] AS DOUBLE) * p.pvec[i])) AS dot
      |  FROM embeddings e CROSS JOIN pl p
      |),
      |bk AS (
      |  SELECT vec_id, tbl,
      |    CAST(sum(CASE WHEN dot > 0.0 THEN CAST(1 AS BIGINT) << pj ELSE CAST(0 AS BIGINT) END) AS BIGINT) AS bucket
      |  FROM dots GROUP BY vec_id, tbl
      |)""".stripMargin
  }

  /** CTEs `cpart`/`cpsum`/`cfold`/`cent(clabel, cf)` — the exact DuckDB
    * mirror of [[graft.ops.Similarity.buildCentroids]]'s bounded two-level
    * ordered fold (same `vec_id % chunks` chunking, same ascending-id fold
    * within a chunk, same chunk-order fold of the partials), so the
    * centroid doubles are bit-identical cross-engine without either engine
    * ever holding a whole cluster in one row. */
  private def duckCentroidCtes(dim: Int, chunks: Int, src: String = "embeddings",
      sfx: String = "", embCol: String = "embedding"): String =
    s"""cpart$sfx AS (
      |  SELECT label, vec_id % $chunks AS chunk,
      |    list(struct_pack(id := vec_id, emb := $embCol) ORDER BY vec_id) AS vs
      |  FROM $src GROUP BY label, vec_id % $chunks
      |), cpsum$sfx AS (
      |  SELECT label, chunk,
      |    list_transform(range(1, ${dim + 1}), d -> list_sum(list_transform(vs, v -> CAST(v.emb[d] AS DOUBLE)))) AS psum,
      |    len(vs) AS pcnt
      |  FROM cpart$sfx
      |), cfold$sfx AS (
      |  SELECT label, list(struct_pack(chunk := chunk, psum := psum, pcnt := pcnt) ORDER BY chunk) AS ps
      |  FROM cpsum$sfx GROUP BY label
      |), cent$sfx AS (
      |  SELECT label AS clabel,
      |    list_transform(range(1, ${dim + 1}), d ->
      |      CAST(list_sum(list_transform(ps, p -> p.psum[d])) /
      |           list_sum(list_transform(ps, p -> p.pcnt)) AS FLOAT)) AS cf
      |  FROM cfold$sfx
      |)""".stripMargin

  private val duckCos: String =
    "list_sum(list_transform(list_zip(qv, embedding), x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))" +
      " / sqrt(list_sum(list_transform(qv, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))" +
      " * list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))"

  // s01 — brute-force cosine top-k: the exact baseline. Query set broadcast
  // against one corpus scan; per-query ranking window.
  def s01AnnBruteForce(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    val q = emb.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    graft.ops.Similarity.cosineTopK(emb, q, 10)
      .select("query_id", "rank", "neighbor_id")
      .orderBy("query_id", "rank")
  }

  val s01Oracle: String =
    s"""WITH q AS (
      |  SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id % 50 = 0
      |), scored AS (
      |  SELECT query_id, vec_id, $duckCos AS cos
      |  FROM embeddings, q WHERE vec_id <> query_id
      |)
      |SELECT query_id, rank, neighbor_id FROM (
      |  SELECT query_id, vec_id AS neighbor_id,
      |    CAST(row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id) AS INT) AS rank
      |  FROM scored)
      |WHERE rank <= 10
      |ORDER BY query_id, rank""".stripMargin

  // s02 — LSH-bucketed ANN: candidates only from the query's hyperplane
  // bucket (the shuffle key), ranked by exact cosine within the bucket.
  def s02AnnLsh(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
      .withColumn("bucket",
        graft.ops.Similarity.lshBucket(col("embedding"), planes.map(_.map(_.toDouble))))
    val q = emb.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"), col("bucket"))
    graft.ops.Similarity.lshTopK(emb, q, 5)
      .select("query_id", "bucket", "rank", "neighbor_id")
      .orderBy("query_id", "rank")
  }

  val s02Oracle: String =
    s"""WITH ${duckBucketCtes(Seq(planes))},
      |b AS (
      |  SELECT e.vec_id, e.embedding, bk.bucket FROM embeddings e JOIN bk USING (vec_id)
      |), q AS (
      |  SELECT vec_id AS query_id, embedding AS qv, bucket AS qbucket
      |  FROM b WHERE vec_id % 50 = 0
      |), scored AS (
      |  SELECT query_id, qbucket, vec_id, $duckCos AS cos
      |  FROM b, q WHERE b.bucket = q.qbucket AND vec_id <> query_id
      |)
      |SELECT query_id, bucket, rank, neighbor_id FROM (
      |  SELECT query_id, qbucket AS bucket, vec_id AS neighbor_id,
      |    CAST(row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id) AS INT) AS rank
      |  FROM scored)
      |WHERE rank <= 5
      |ORDER BY query_id, rank""".stripMargin

  // s03 — IVF-style ANN: k-means-free coarse quantizer using the label
  // partitions' centroids (computed with Similarity.buildCentroids'
  // bounded two-level ordered fold so both engines produce bit-identical
  // doubles and no row ever holds a whole cluster), nprobe=1 search inside
  // the query's cluster. At scale: centroids are a broadcast-size table,
  // the assignment is a per-row argmax over the broadcast, and the search
  // shuffles on the cluster id — the standard IVF layout.
  def s03AnnIvf(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    val cent = graft.ops.Similarity.buildCentroids(emb, dim = 64, chunks = centroidChunks)
    val assigned = graft.ops.Similarity.assignToCentroids(
      emb.select("vec_id", "embedding"), cent, Seq("vec_id"))
    val q = assigned.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"), col("cluster").as("qc"))
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("vec_id"))
    assigned.join(broadcast(q),
        col("cluster") === col("qc") && col("vec_id") =!= col("query_id"))
      .withColumn("cos", cosineSim(col("qv"), col("embedding")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
      .select(col("query_id"), col("qc").as("cluster"), col("rank"),
        col("vec_id").as("neighbor_id"))
      .orderBy("query_id", "rank")
  }

  // s44 — BIG-BATCH serving: s03's IVF search with the query side SHUFFLED
  // instead of broadcast. s03's broadcast-probe contract is right for an
  // online query batch (thousands of rows); the offline shapes — scoring a
  // 100 TB corpus against millions of queries (semdedup sweeps, kNN-graph
  // refresh, eval-set retrieval) — can't broadcast the query table, so the
  // probe join becomes a cluster-keyed ShuffledHashJoin: both sides
  // exchange on the IVF cluster key, each cluster's queries meet exactly
  // that cluster's members, and nothing is driver- or memory-bound by the
  // query count. Same candidate cut, same ranking, same rows — the gate
  // shares s03's oracle, and PlanAudit pins that the probe join is
  // broadcast-free (the one BroadcastExchange allowed in the plan is the
  // bounded centroid table inside the assignment argmax).
  def s44BatchSearch(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    val cent = graft.ops.Similarity.buildCentroids(emb, dim = 64, chunks = centroidChunks)
    val assigned = graft.ops.Similarity.assignToCentroids(
      emb.select("vec_id", "embedding"), cent, Seq("vec_id"))
    val q = assigned.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"), col("cluster").as("qc"))
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("vec_id"))
    assigned.join(q.hint("shuffle_hash"),
        col("cluster") === col("qc") && col("vec_id") =!= col("query_id"))
      .withColumn("cos", cosineSim(col("qv"), col("embedding")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
      .select(col("query_id"), col("qc").as("cluster"), col("rank"),
        col("vec_id").as("neighbor_id"))
      .orderBy("query_id", "rank")
  }

  // s45 — MUTUAL NEAREST NEIGHBORS across two sides of the corpus (the
  // bitext-mining / alignment shape — Artetxe & Schwenk 2019's candidate
  // stage: a pair survives only if each end is the other's top-1). Sides
  // are the even/odd `label` halves standing in for two languages; both
  // share the IVF coarse quantizer, candidates meet in a cluster-keyed
  // equi-join (never all-pairs), each direction takes its top-1 by
  // (cos desc, id), and the mutual filter is an equi-join of the two
  // direction tables. Ids-only output. At 100 TB both direction top-1
  // cuts are WindowGroupLimit-able per key and the mutual join is keyed
  // by the pair — no step holds more than a cluster's candidates.
  def s45MutualNn(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    val cent = graft.ops.Similarity.buildCentroids(emb, dim = 64, chunks = centroidChunks)
    val assigned = graft.ops.Similarity.assignToCentroids(
      emb.select("vec_id", "embedding", "label"), cent, Seq("vec_id"))
    val a = assigned.filter(col("label") % 2 === 0)
      .select(col("vec_id").as("id_a"), col("embedding").as("va"), col("cluster"))
    val b = assigned.filter(col("label") % 2 === 1)
      .select(col("vec_id").as("id_b"), col("embedding").as("vb"), col("cluster"))
    val scored = a.join(b, Seq("cluster"))
      .withColumn("cos", cosineSim(col("va"), col("vb")))
    val wa = Window.partitionBy("id_a").orderBy(col("cos").desc, col("id_b"))
    val wb = Window.partitionBy("id_b").orderBy(col("cos").desc, col("id_a"))
    val topAB = scored.withColumn("r", row_number().over(wa))
      .filter(col("r") === 1).select(col("cluster"), col("id_a"), col("id_b"))
    val topBA = scored.withColumn("r", row_number().over(wb))
      .filter(col("r") === 1).select(col("id_a"), col("id_b"))
    topAB.join(topBA, Seq("id_a", "id_b"))
      .select(col("cluster").cast("long").as("cluster"), col("id_a"), col("id_b"))
      .orderBy("id_a")
  }

  val s45Oracle: String = {
    def cos(a: String, b: String) =
      s"list_sum(list_transform(list_zip($a, $b), x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))" +
        s" / sqrt(list_sum(list_transform($a, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))" +
        s" * list_sum(list_transform($b, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))"
    s"""WITH ${duckCentroidCtes(64, centroidChunks)}, assigned AS (
      |  SELECT vec_id, embedding, label, clabel FROM (
      |    SELECT e.vec_id, e.embedding, e.label, c.clabel,
      |      row_number() OVER (PARTITION BY e.vec_id
      |        ORDER BY ${cos("e.embedding", "c.cf")} DESC, c.clabel) AS rn
      |    FROM embeddings e, cent c)
      |  WHERE rn = 1
      |), a AS (
      |  SELECT vec_id AS id_a, embedding AS va, clabel AS cluster
      |  FROM assigned WHERE label % 2 = 0
      |), b AS (
      |  SELECT vec_id AS id_b, embedding AS vb, clabel AS cluster
      |  FROM assigned WHERE label % 2 = 1
      |), scored AS (
      |  SELECT a.cluster, id_a, id_b, ${cos("va", "vb")} AS cos
      |  FROM a JOIN b USING (cluster)
      |), tab AS (
      |  SELECT cluster, id_a, id_b FROM (
      |    SELECT cluster, id_a, id_b,
      |      row_number() OVER (PARTITION BY id_a ORDER BY cos DESC, id_b) AS r
      |    FROM scored) WHERE r = 1
      |), tba AS (
      |  SELECT id_a, id_b FROM (
      |    SELECT id_a, id_b,
      |      row_number() OVER (PARTITION BY id_b ORDER BY cos DESC, id_a) AS r
      |    FROM scored) WHERE r = 1
      |)
      |SELECT CAST(t.cluster AS BIGINT) AS cluster, id_a, id_b
      |FROM tab t JOIN tba USING (id_a, id_b)
      |ORDER BY id_a""".stripMargin
  }

  // s46 — CDC-DRIVEN INDEX SYNC (the RAG-sync pattern): a change feed of
  // embedding UPDATES applied to a served vector index. Base corpus =
  // version 0; every vec_id % 3 == 0 receives a version-1 update with a
  // deterministically different vector (the reversed embedding — exact in
  // both engines); the applied state is last-wins per vec_id (max_by over
  // version — cdc20's apply shape), encoded against the quantizer FROZEN
  // on the base corpus (FAISS add() never retrains — s13/s42's contract),
  // and searched with the s03 candidate cut. The gate pins the end-to-end
  // property a sync pipeline must keep: search results reflect exactly
  // the post-apply state (updated vectors move clusters; stale versions
  // never match). Batch form of the s42 stream (drain ≡ batch there).
  def s46CdcIndexSync(spark: SparkSession, dir: String): DataFrame = {
    val base = Tables.embeddings(spark, dir).select("vec_id", "embedding")
    val cent = graft.ops.Similarity.buildCentroids(
      Tables.embeddings(spark, dir), dim = 64, chunks = centroidChunks)
    val events = base.withColumn("version", lit(0L))
      .unionByName(base.filter(col("vec_id") % 3 === 0)
        .withColumn("embedding", reverse(col("embedding")))
        .withColumn("version", lit(1L)))
    val applied = events.groupBy("vec_id")
      .agg(max_by(col("embedding"), col("version")).as("embedding"),
        max(col("version")).as("version"))
    val assigned = graft.ops.Similarity.assignToCentroids(
      applied, cent, Seq("vec_id"))
    val q = assigned.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"),
        col("cluster").as("qc"))
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("vec_id"))
    assigned.join(broadcast(q),
        col("cluster") === col("qc") && col("vec_id") =!= col("query_id"))
      .withColumn("cos", cosineSim(col("qv"), col("embedding")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
      .select(col("query_id"), col("rank"), col("vec_id").as("neighbor_id"),
        (col("version") === 1L).as("neighbor_updated"))
      .orderBy("query_id", "rank")
  }

  val s46Oracle: String = {
    def cos(a: String, b: String) =
      s"list_sum(list_transform(list_zip($a, $b), x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))" +
        s" / sqrt(list_sum(list_transform($a, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))" +
        s" * list_sum(list_transform($b, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))"
    s"""WITH ${duckCentroidCtes(64, centroidChunks)}, applied AS (
      |  SELECT vec_id, embedding, version FROM (
      |    SELECT vec_id, embedding, version,
      |      row_number() OVER (PARTITION BY vec_id ORDER BY version DESC) AS vr
      |    FROM (
      |      SELECT vec_id, embedding, 0 AS version FROM embeddings
      |      UNION ALL
      |      SELECT vec_id, list_reverse(embedding), 1 AS version
      |      FROM embeddings WHERE vec_id % 3 = 0))
      |  WHERE vr = 1
      |), assigned AS (
      |  SELECT vec_id, embedding, version, clabel FROM (
      |    SELECT e.vec_id, e.embedding, e.version, c.clabel,
      |      row_number() OVER (PARTITION BY e.vec_id
      |        ORDER BY ${cos("e.embedding", "c.cf")} DESC, c.clabel) AS rn
      |    FROM applied e, cent c)
      |  WHERE rn = 1
      |), q AS (
      |  SELECT vec_id AS query_id, embedding AS qv, clabel AS qc
      |  FROM assigned WHERE vec_id % 50 = 0
      |), scored AS (
      |  SELECT query_id, a.vec_id, a.version, ${cos("qv", "a.embedding")} AS cos
      |  FROM assigned a JOIN q ON a.clabel = q.qc AND a.vec_id <> q.query_id
      |)
      |SELECT query_id, rank, neighbor_id, neighbor_updated FROM (
      |  SELECT query_id, vec_id AS neighbor_id, version = 1 AS neighbor_updated,
      |    CAST(row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id) AS INT) AS rank
      |  FROM scored)
      |WHERE rank <= 5
      |ORDER BY query_id, rank""".stripMargin
  }

  val s03Oracle: String = {
    def cos(a: String, b: String) =
      s"list_sum(list_transform(list_zip($a, $b), x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))" +
        s" / sqrt(list_sum(list_transform($a, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))" +
        s" * list_sum(list_transform($b, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))"
    s"""WITH ${duckCentroidCtes(64, centroidChunks)}, assigned AS (
      |  SELECT vec_id, embedding, clabel FROM (
      |    SELECT e.vec_id, e.embedding, c.clabel,
      |      row_number() OVER (PARTITION BY e.vec_id
      |        ORDER BY ${cos("e.embedding", "c.cf")} DESC, c.clabel) AS rn
      |    FROM embeddings e, cent c)
      |  WHERE rn = 1
      |), q AS (
      |  SELECT vec_id AS query_id, embedding AS qv, clabel AS qc
      |  FROM assigned WHERE vec_id % 50 = 0
      |), scored AS (
      |  SELECT query_id, qc, a.vec_id, ${cos("qv", "a.embedding")} AS cos
      |  FROM assigned a JOIN q ON a.clabel = q.qc AND a.vec_id <> q.query_id
      |)
      |SELECT query_id, cluster, rank, neighbor_id FROM (
      |  SELECT query_id, qc AS cluster, vec_id AS neighbor_id,
      |    CAST(row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id) AS INT) AS rank
      |  FROM scored)
      |WHERE rank <= 5
      |ORDER BY query_id, rank""".stripMargin
  }

  // s04 — IVF with nprobe=2: same index layout as s03 (corpus rows live in
  // their single nearest cluster), but each query probes its TWO nearest
  // clusters and ranks over the union — the standard recall/cost dial of
  // IVF search. Candidate sets from the two probes are disjoint (a corpus
  // row has one home cluster), so the union needs no dedup.
  def s04AnnIvfProbe(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    val cent = graft.ops.Similarity.buildCentroids(emb, dim = 64, chunks = centroidChunks)
    val assigned = graft.ops.Similarity.assignToCentroids(
      emb.select("vec_id", "embedding"), cent, Seq("vec_id"))
    val probes = graft.ops.Similarity.probeCentroids(
        assigned.filter(col("vec_id") % 50 === 0).select("vec_id", "embedding"),
        cent, Seq("vec_id"), nprobe = 2)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"),
        col("cluster").as("qc"))
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("vec_id"))
    assigned.join(broadcast(probes),
        col("cluster") === col("qc") && col("vec_id") =!= col("query_id"))
      .withColumn("cos", cosineSim(col("qv"), col("embedding")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
      .select(col("query_id"), col("rank"), col("vec_id").as("neighbor_id"))
      .orderBy("query_id", "rank")
  }

  val s04Oracle: String = {
    def cos(a: String, b: String) =
      s"list_sum(list_transform(list_zip($a, $b), x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))" +
        s" / sqrt(list_sum(list_transform($a, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))" +
        s" * list_sum(list_transform($b, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))"
    s"""WITH ${duckCentroidCtes(64, centroidChunks)}, ranked AS (
      |  SELECT e.vec_id, e.embedding, c.clabel,
      |    row_number() OVER (PARTITION BY e.vec_id
      |      ORDER BY ${cos("e.embedding", "c.cf")} DESC, c.clabel) AS rn
      |  FROM embeddings e, cent c
      |), assigned AS (
      |  SELECT vec_id, embedding, clabel FROM ranked WHERE rn = 1
      |), q AS (
      |  SELECT vec_id AS query_id, embedding AS qv, clabel AS qc
      |  FROM ranked WHERE vec_id % 50 = 0 AND rn <= 2
      |), scored AS (
      |  SELECT query_id, a.vec_id, ${cos("qv", "a.embedding")} AS cos
      |  FROM assigned a JOIN q ON a.clabel = q.qc AND a.vec_id <> q.query_id
      |)
      |SELECT query_id, rank, neighbor_id FROM (
      |  SELECT query_id, vec_id AS neighbor_id,
      |    CAST(row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id) AS INT) AS rank
      |  FROM scored)
      |WHERE rank <= 5
      |ORDER BY query_id, rank""".stripMargin
  }

  // d05 — embedding-cosine near-dup pairs, exact: block-partitioned pair
  // join (no corpus broadcast, no nested-loop join — see
  // Dedup.embeddingNearDups). d07 is the approximate subquadratic path
  // for the same predicate.
  def d05EmbedNearDup(spark: SparkSession, dir: String): DataFrame =
    graft.ops.Dedup.embeddingNearDups(
        Tables.embeddings(spark, dir), "vec_id", "embedding", 0.45, blocks = 8)
      .select(col("id_a").as("vec_a"), col("id_b").as("vec_b"),
        floor(col("cos") * 1000000).cast("long").as("cos_micros"))
      .orderBy("vec_a", "vec_b")

  val d05Oracle: String =
    s"""SELECT vec_a, vec_b, CAST(floor(cos * 1000000) AS BIGINT) AS cos_micros FROM (
      |  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, qv, b.embedding,
      |    $duckCos AS cos
      |  FROM (SELECT vec_id, embedding AS qv FROM embeddings) a
      |  JOIN embeddings b ON a.vec_id < b.vec_id)
      |WHERE cos >= 0.45
      |ORDER BY vec_a, vec_b""".stripMargin

  // d07 — the approximate scale path for d05's predicate: multi-table
  // hyperplane-LSH candidates + exact cosine verify on candidates only.
  // The oracle mirrors the candidate generation (same deterministic plane
  // literals), so the gate checks blocking + verify cross-engine; measured
  // on this data no blocking scheme reaches recall 1.0 at cos 0.45
  // (qualifying pairs sit at the threshold), which is why the exact d05
  // keeps the all-pairs oracle and d07 owns the banding S-curve semantics
  // (recall ≈ 1 at true near-dup thresholds — see EmbeddingDedupSpec).
  def d07EmbedNearDupLsh(spark: SparkSession, dir: String): DataFrame =
    graft.ops.Dedup.embeddingNearDupsLsh(
        Tables.embeddings(spark, dir), "vec_id", "embedding", 0.45,
        lshTables.map(_.map(_.map(_.toDouble))))
      .select(col("id_a").as("vec_a"), col("id_b").as("vec_b"),
        floor(col("cos") * 1000000).cast("long").as("cos_micros"))
      .orderBy("vec_a", "vec_b")

  val d07Oracle: String = {
    val cosAB =
      "list_sum(list_transform(list_zip(ea.embedding, eb.embedding), x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))" +
        " / sqrt(list_sum(list_transform(ea.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))" +
        " * list_sum(list_transform(eb.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))"
    s"""WITH ${duckBucketCtes(lshTables)},
      |e AS (SELECT vec_id, embedding FROM embeddings),
      |x AS (SELECT vec_id, CAST(tbl AS VARCHAR) || '-' || CAST(bucket AS VARCHAR) AS bkt FROM bk),
      |cand AS (SELECT DISTINCT a.vec_id AS va, b.vec_id AS vb
      |  FROM x a JOIN x b ON a.bkt = b.bkt AND a.vec_id < b.vec_id),
      |scored AS (SELECT va AS vec_a, vb AS vec_b, $cosAB AS cos
      |  FROM cand JOIN e ea ON va = ea.vec_id JOIN e eb ON vb = eb.vec_id)
      |SELECT vec_a, vec_b, CAST(floor(cos * 1000000) AS BIGINT) AS cos_micros
      |FROM scored WHERE cos >= 0.45 ORDER BY vec_a, vec_b""".stripMargin
  }

  // d16 — LSH recall evaluation for the text/embedding dedup family: the
  // s19 pattern (score the approximate operator against its own exact
  // baseline, both already gated) applied to d05/d07. d05's
  // block-partitioned all-pairs join is ground truth; d07's multi-table
  // hyperplane-LSH candidates + exact verify is the scale path; this
  // query joins the two pair sets and reports the confusion counts plus
  // an integer checksum of the MISSED pair set — so a silent recall
  // regression in the banding scheme (more tables, fewer planes, a bad
  // plane literal) becomes an oracle hash mismatch, not a guess. d07's
  // verify step re-checks the exact cosine, so false positives are
  // structurally zero — n_found counts candidates that survived verify.
  // The measured number documented in PLANS.md: recall < 1 at τ = 0.45
  // on this corpus because qualifying pairs sit AT the threshold (the
  // banding S-curve's flat region); the operator contract is recall ≈ 1
  // at true near-dup thresholds, and this query is the instrument that
  // proves it per-corpus instead of asserting it.
  def d16LshRecall(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    val exact = graft.ops.Dedup.embeddingNearDups(
        emb, "vec_id", "embedding", 0.45, blocks = 8)
      .select(col("id_a"), col("id_b"))
    val approx = graft.ops.Dedup.embeddingNearDupsLsh(
        emb, "vec_id", "embedding", 0.45,
        lshTables.map(_.map(_.map(_.toDouble))))
      .select(col("id_a").as("fa"), col("id_b").as("fb"))
    exact.join(approx,
        col("id_a") === col("fa") && col("id_b") === col("fb"), "left")
      .agg(
        count(lit(1)).as("n_true"),
        sum(when(col("fa").isNotNull, 1L).otherwise(0L)).as("n_found"),
        sum(when(col("fa").isNull, 1L).otherwise(0L)).as("n_missed"),
        sum(when(col("fa").isNull, col("id_a") * 1000000L + col("id_b"))
          .otherwise(0L)).cast("long").as("missed_pair_checksum"))
  }

  val d16Oracle: String = {
    val cosAB =
      "list_sum(list_transform(list_zip(ea.embedding, eb.embedding), x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))" +
        " / sqrt(list_sum(list_transform(ea.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))" +
        " * list_sum(list_transform(eb.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))"
    s"""WITH ${duckBucketCtes(lshTables)},
      |e AS (SELECT vec_id, embedding FROM embeddings),
      |x AS (SELECT vec_id, CAST(tbl AS VARCHAR) || '-' || CAST(bucket AS VARCHAR) AS bkt FROM bk),
      |cand AS (SELECT DISTINCT a.vec_id AS va, b.vec_id AS vb
      |  FROM x a JOIN x b ON a.bkt = b.bkt AND a.vec_id < b.vec_id),
      |approx AS (SELECT va AS vec_a, vb AS vec_b
      |  FROM cand JOIN e ea ON va = ea.vec_id JOIN e eb ON vb = eb.vec_id
      |  WHERE $cosAB >= 0.45),
      |exact AS (SELECT ea.vec_id AS vec_a, eb.vec_id AS vec_b
      |  FROM e ea JOIN e eb ON ea.vec_id < eb.vec_id
      |  WHERE $cosAB >= 0.45)
      |SELECT CAST(COUNT(*) AS BIGINT) AS n_true,
      |  CAST(SUM(CASE WHEN ap.vec_a IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_found,
      |  CAST(SUM(CASE WHEN ap.vec_a IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_missed,
      |  CAST(SUM(CASE WHEN ap.vec_a IS NULL
      |       THEN ex.vec_a * 1000000 + ex.vec_b ELSE 0 END) AS BIGINT) AS missed_pair_checksum
      |FROM exact ex LEFT JOIN approx ap
      |  ON ap.vec_a = ex.vec_a AND ap.vec_b = ex.vec_b""".stripMargin
  }

  // d14 — SemDeDup (Abbas et al., "SemDeDup: Data-efficient learning at
  // web-scale through semantic deduplication", 2023): k-means-cluster the
  // embedding space, then drop near-duplicates WITHIN clusters only. This
  // is the semantic-dedup operator real curation pipelines run where
  // d05's exact all-pairs predicate is unaffordable: the pairwise cosine
  // join is partitioned by the cluster id, so the quadratic term is
  // n_c² per cluster instead of N² — with k sized so clusters stay
  // bounded (the paper runs k = 50 000 over 5 B embeddings), the
  // whole pass is one centroid broadcast + one shuffle on the cluster
  // key. Keep rule: a vector is DROPPED iff any lower-id vector in its
  // cluster is τ-similar (cos ≥ 0.35). This order-free rule is a
  // conservative superset of the paper's sequential greedy (a dropped
  // vector can still shadow later ones — they differ only on chains
  // a~b~c without a~c); it is chosen because it is engine-exact in one
  // join pass, where the sequential variant needs an iterative fixpoint
  // (d10's connected-components machinery serves that need). Output is
  // pure integers per cluster (sizes + kept-id checksum), pinning
  // centroid lineage, assignment, and the drop set. A nonempty cluster
  // always keeps its minimum id, so the kept side never vanishes.
  def d14SemDedup(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    val cent = graft.ops.Similarity.buildCentroids(emb, dim = 64, chunks = centroidChunks)
    val assigned = graft.ops.Similarity.assignToCentroids(
      emb.select("vec_id", "embedding"), cent, Seq("vec_id"))
    val left = assigned.select(col("cluster"), col("vec_id").as("id_a"),
      col("embedding").as("va"))
    val right = assigned.select(col("cluster"), col("vec_id").as("id_b"),
      col("embedding").as("vb"))
    val dropped = left.join(right, Seq("cluster"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("cos", cosineSim(col("va"), col("vb")))
      .filter(col("cos") >= 0.35)
      .select(col("id_b").as("vec_id")).distinct()
    val tot = assigned.groupBy(col("cluster"))
      .agg(count(lit(1)).as("n_vecs"))
    val kept = assigned.join(dropped, Seq("vec_id"), "left_anti")
      .groupBy(col("cluster"))
      .agg(count(lit(1)).as("n_kept"),
        sum(col("vec_id")).cast("long").as("kept_id_sum"))
    tot.join(kept, Seq("cluster"))
      .select(col("cluster").cast("long").as("cluster"),
        col("n_vecs"), col("n_kept"), col("kept_id_sum"))
      .orderBy("cluster")
  }

  val d14Oracle: String =
    s"""WITH ${duckCentroidCtes(64, centroidChunks)}, ranked AS (
      |  SELECT e.vec_id, e.embedding, c.clabel,
      |    row_number() OVER (PARTITION BY e.vec_id
      |      ORDER BY ${duckCosOf("e.embedding", "c.cf")} DESC, c.clabel) AS rn
      |  FROM embeddings e, cent c
      |), assigned AS (
      |  SELECT vec_id, embedding, clabel FROM ranked WHERE rn = 1
      |), drops AS (
      |  SELECT DISTINCT b.vec_id
      |  FROM assigned a JOIN assigned b
      |    ON a.clabel = b.clabel AND a.vec_id < b.vec_id
      |  WHERE ${duckCosOf("a.embedding", "b.embedding")} >= 0.35
      |)
      |SELECT CAST(s.clabel AS BIGINT) AS cluster,
      |  COUNT(*) AS n_vecs,
      |  COUNT(*) FILTER (WHERE d.vec_id IS NULL) AS n_kept,
      |  CAST(SUM(s.vec_id) FILTER (WHERE d.vec_id IS NULL) AS BIGINT) AS kept_id_sum
      |FROM assigned s LEFT JOIN drops d ON s.vec_id = d.vec_id
      |GROUP BY s.clabel ORDER BY cluster""".stripMargin

  // ------------------------------------------------------------- PQ (s05/s06)

  /** Shared s05/s06 search pipeline: per-query ADC LUT on the BROADCAST
    * side ([[graft.functions.PqLut]] — k×m subspace dots computed once
    * per query), candidates scored with m array reads each
    * ([[graft.functions.PqLutScore]]), cut to the top `candK` by
    * (approx desc, vec_id), then re-ranked by exact cosine. The candidate
    * window carries ONLY (query_id, vec_id, approx) — the query vector
    * never rides the big shuffle, preserving the ~64-byte-row movement
    * the PQ layout exists for; the exact vectors come back via broadcast
    * equi-joins that leave the corpus in place. */
  private def pqSearch(emb: DataFrame, encoded: DataFrame, q: DataFrame,
      codebook: Seq[(Long, Seq[Float])], m: Int, candK: Int,
      joinCond: org.apache.spark.sql.Column,
      qExact: Option[DataFrame] = None,
      approxBoost: Option[org.apache.spark.sql.Column] = None): DataFrame = {
    import graft.functions.PqFunctions
    val ql = q.withColumn("lut", PqFunctions.pqLut(col("qv"), codebook, m))
    val wA = Window.partitionBy("query_id").orderBy(col("approx").desc, col("vec_id"))
    // approxBoost (s11): a probe-side double added to the ADC score —
    // the per-cluster dot(q, c) term of the residual MIPS decomposition,
    // required for cross-cluster comparability at nprobe > 1. Kept
    // conditional (not `+ lit(0.0)`) so single-probe siblings' doubles
    // stay byte-identical to their r8-gated values.
    val lutScore = PqFunctions.pqLutScore(col("lut"), col("codes"), codebook, m)
    val cand = encoded.join(broadcast(ql), joinCond)
      .withColumn("approx", approxBoost.fold(lutScore)(b => lutScore + b))
      .select("query_id", "vec_id", "approx")
      .withColumn("arank", row_number().over(wA))
      .filter(col("arank") <= candK)
      .select("query_id", "vec_id")
    val wE = Window.partitionBy("query_id").orderBy(col("cos").desc, col("vec_id"))
    // multi-probe (s10): `q` carries one row per (query, probed cluster),
    // so the exact re-rank must join a ONE-row-per-query set (`qExact`) or
    // every candidate would duplicate through the query join
    emb.join(broadcast(cand), "vec_id")
      .join(broadcast(qExact.getOrElse(q).select("query_id", "qv")), "query_id")
      .withColumn("cos", cosineSim(col("qv"), col("embedding")))
      .withColumn("rank", row_number().over(wE))
      .filter(col("rank") <= 5)
      .select(col("query_id"), col("rank"), col("vec_id").as("neighbor_id"))
      .orderBy("query_id", "rank")
  }

  // s05 — product-quantization ANN (the compression scale path): the
  // corpus carries only m=8 codeword labels per row (64 bytes instead of
  // a 256-byte float vector in every scan/shuffle at 100 TB); queries
  // rank by the ADC LUT score, keep the top 20 candidates, then re-rank
  // exactly by cosine over just those candidates. The codebook is the
  // deterministic bounded-fold centroid table (one codeword per label),
  // collected driver-side under a loud broadcast-size guard — the
  // HyperplaneBucket plane-matrix pattern with data-derived values.
  // Encoding is a NARROW map (codebook inside the expression): no
  // crossJoin, no shuffle.
  def s05AnnPq(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.PqFunctions
    val m = 8
    val emb = Tables.embeddings(spark, dir)
    val cent = graft.ops.Similarity.buildCentroids(emb, dim = 64, chunks = centroidChunks)
    val codebook = graft.ops.Similarity.collectCodebook(cent)
    val encoded = emb.select(col("vec_id"),
      PqFunctions.pqCodes(col("embedding"), codebook, m).as("codes"))
    val q = emb.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    pqSearch(emb, encoded, q, codebook, m, candK = 20,
      joinCond = col("vec_id") =!= col("query_id"))
  }

  // s06 — IVF+PQ, the production ANN layout (coarse quantizer routes
  // each query to its cluster, PQ codes stand in for the vectors inside
  // it): the candidate join is an EQUI-join on the cluster id — the IVF
  // shuffle key — and the probe side carries 8 codeword labels per row.
  // This variant encodes raw vectors (not residuals) so the codebook
  // stays the shared bounded-fold centroid table both engines already
  // hold bit-identically.
  def s06AnnIvfPq(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.PqFunctions
    val m = 8
    val emb = Tables.embeddings(spark, dir)
    val cent = graft.ops.Similarity.buildCentroids(emb, dim = 64, chunks = centroidChunks)
    val codebook = graft.ops.Similarity.collectCodebook(cent)
    val assigned = graft.ops.Similarity.assignToCentroids(
      emb.select("vec_id", "embedding"), cent, Seq("vec_id"))
    val encoded = assigned.select(col("vec_id"), col("cluster"),
      PqFunctions.pqCodes(col("embedding"), codebook, m).as("codes"))
    val q = assigned.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"),
        col("cluster").as("qc"))
    pqSearch(emb, encoded, q, codebook, m, candK = 20,
      joinCond = col("cluster") === col("qc") && col("vec_id") =!= col("query_id"))
  }

  // s10 — IVF+PQ at nprobe=2, the production recall/cost dial composed
  // with ADC scoring: each query probes its TWO nearest clusters (s04's
  // multi-probe mechanism) and the PQ approx ranking runs over the union
  // of both clusters' candidates. The candidate join stays a cluster-key
  // EQUI-join (the probe table just carries two rows per query); the
  // union needs no dedup because a corpus row has exactly one home
  // cluster. Codes are the s06 non-residual layout, so the ADC score is
  // cluster-independent and ranking across the union is well-defined —
  // at nprobe>1 the residual layout would need the per-cluster dot(q,c)
  // term added back (it is no longer constant per query), which is why
  // the multi-probe composition gates the non-residual variant.
  def s10AnnIvfPqProbe(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.PqFunctions
    val m = 8
    val emb = Tables.embeddings(spark, dir)
    val cent = graft.ops.Similarity.buildCentroids(emb, dim = 64, chunks = centroidChunks)
    val codebook = graft.ops.Similarity.collectCodebook(cent)
    val assigned = graft.ops.Similarity.assignToCentroids(
      emb.select("vec_id", "embedding"), cent, Seq("vec_id"))
    val encoded = assigned.select(col("vec_id"), col("cluster"),
      PqFunctions.pqCodes(col("embedding"), codebook, m).as("codes"))
    val qRows = assigned.filter(col("vec_id") % 50 === 0)
    val probes = graft.ops.Similarity.probeCentroids(
        qRows.select("vec_id", "embedding"), cent, Seq("vec_id"), nprobe = 2)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"),
        col("cluster").as("qc"))
    pqSearch(emb, encoded, probes, codebook, m, candK = 20,
      joinCond = col("cluster") === col("qc") && col("vec_id") =!= col("query_id"),
      qExact = Some(qRows.select(col("vec_id").as("query_id"),
        col("embedding").as("qv"))))
  }

  val s10Oracle: String = duckPqSearchSql(8,
    s"""WITH ${duckCentroidCtes(64, centroidChunks)}, ranked AS (
      |  SELECT e.vec_id, e.embedding, c.clabel,
      |    row_number() OVER (PARTITION BY e.vec_id
      |      ORDER BY ${duckCosOf("e.embedding", "c.cf")} DESC, c.clabel) AS rn
      |  FROM embeddings e, cent c
      |), assigned AS (
      |  SELECT vec_id, embedding, clabel FROM ranked WHERE rn = 1
      |), qp AS (
      |  SELECT vec_id AS query_id, clabel AS qc
      |  FROM ranked WHERE vec_id % 50 = 0 AND rn <= 2
      |), q AS (
      |  SELECT vec_id AS query_id, embedding AS qv
      |  FROM assigned WHERE vec_id % 50 = 0
      |)""".stripMargin,
    appPreJoins = "  JOIN assigned a ON a.vec_id = co.vec_id\n",
    appPostJoins = "\n  JOIN qp ON qp.query_id = q0.query_id AND qp.qc = a.clabel")

  /** One cosine text used by every oracle below (ascending fold in
    * doubles — duckCos's shape with nameable operands). */
  private def duckCosOf(a: String, b: String): String =
    s"list_sum(list_transform(list_zip($a, $b), x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))" +
      s" / sqrt(list_sum(list_transform($a, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))" +
      s" * list_sum(list_transform($b, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))"

  /** Shared s05/s06 oracle assembly — ONE definition of the PQ CTE text
    * (subspace dots, per-subspace argmax codes, LUT-sum approx, candidate
    * cut, exact re-rank), so a fold-order or tie-break fix cannot land in
    * one sibling and not the other. `prefixCtes` supplies everything up
    * to and including the `q` CTE; `appJoins` injects s06's
    * cluster-restriction joins ("" for s05). */
  private def duckPqSearchSql(m: Int, prefixCtes: String,
      appPreJoins: String, appPostJoins: String,
      corpusSrc: String = "embeddings", corpusVec: String = "embedding",
      centName: String = "cent", qVec: String = "qv",
      approxBoost: String = ""): String = {
    def subDot(a: String, b: String, s: Int) =
      s"list_sum(list_transform(range(1, 9), i -> CAST($a[${s * 8} + i] AS DOUBLE) * CAST($b[${s * 8} + i] AS DOUBLE)))"
    val qds = (0 until m).map(s => s"    ${subDot(s"q.$qVec", "c.cf", s)} AS d$s").mkString(",\n")
    val eds = (0 until m).map(s => s"    ${subDot(s"e.$corpusVec", "c.cf", s)} AS d$s").mkString(",\n")
    val rns = (0 until m).map(s =>
      s"    row_number() OVER (PARTITION BY vec_id ORDER BY d$s DESC, clabel) AS r$s").mkString(",\n")
    val codeCols = (0 until m).map(s =>
      s"    MAX(CASE WHEN r$s = 1 THEN clabel END) AS code$s").mkString(",\n")
    val codeJoins = (1 until m).map(s =>
      s"  JOIN qcd q$s ON q$s.clabel = co.code$s AND q$s.query_id = q0.query_id").mkString("\n")
    val approx = (0 until m).map(s => s"q$s.d$s").mkString(" + ")
    s"""$prefixCtes, qcd AS (
      |  SELECT q.query_id, c.clabel,
      |$qds
      |  FROM q CROSS JOIN $centName c
      |), ecd AS (
      |  SELECT e.vec_id, c.clabel,
      |$eds
      |  FROM $corpusSrc e CROSS JOIN $centName c
      |), er AS (
      |  SELECT vec_id, clabel,
      |$rns
      |  FROM ecd
      |), codes AS (
      |  SELECT vec_id,
      |$codeCols
      |  FROM er GROUP BY vec_id
      |), app AS (
      |  SELECT co.vec_id, q0.query_id, $approx$approxBoost AS approx
      |  FROM codes co
      |$appPreJoins  JOIN qcd q0 ON q0.clabel = co.code0
      |$codeJoins$appPostJoins
      |  WHERE co.vec_id <> q0.query_id
      |), cand AS (
      |  SELECT query_id, vec_id FROM (
      |    SELECT query_id, vec_id,
      |      row_number() OVER (PARTITION BY query_id ORDER BY approx DESC, vec_id) AS arank
      |    FROM app)
      |  WHERE arank <= 20
      |), rr AS (
      |  SELECT c.query_id, e.vec_id, ${duckCosOf("q.qv", "e.embedding")} AS cos
      |  FROM cand c
      |  JOIN embeddings e ON e.vec_id = c.vec_id
      |  JOIN q ON q.query_id = c.query_id
      |)
      |SELECT query_id, rank, neighbor_id FROM (
      |  SELECT query_id, vec_id AS neighbor_id,
      |    CAST(row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id) AS INT) AS rank
      |  FROM rr)
      |WHERE rank <= 5
      |ORDER BY query_id, rank""".stripMargin
  }

  val s05Oracle: String = duckPqSearchSql(8,
    s"""WITH ${duckCentroidCtes(64, centroidChunks)}, q AS (
      |  SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id % 50 = 0
      |)""".stripMargin,
    appPreJoins = "", appPostJoins = "")

  val s06Oracle: String = duckPqSearchSql(8,
    s"""WITH ${duckCentroidCtes(64, centroidChunks)}, ranked AS (
      |  SELECT e.vec_id, e.embedding, c.clabel,
      |    row_number() OVER (PARTITION BY e.vec_id
      |      ORDER BY ${duckCosOf("e.embedding", "c.cf")} DESC, c.clabel) AS rn
      |  FROM embeddings e, cent c
      |), assigned AS (
      |  SELECT vec_id, embedding, clabel FROM ranked WHERE rn = 1
      |), q AS (
      |  SELECT vec_id AS query_id, embedding AS qv, clabel AS qc
      |  FROM assigned WHERE vec_id % 50 = 0
      |)""".stripMargin,
    appPreJoins = "  JOIN assigned a ON a.vec_id = co.vec_id\n",
    appPostJoins = "\n  JOIN q qq ON qq.query_id = q0.query_id AND qq.qc = a.clabel")

  // s07 — deterministic k-means (one Lloyd round): seed centroids are
  // the label partitions' bounded-fold means, every row reassigns to its
  // nearest centroid (aggregate argmax), per-cluster means recompute with
  // the same bounded fold, and the corpus assigns once more against the
  // LEARNED centroids. Output is pure integers (cluster sizes + id sums),
  // so the gate pins the entire two-generation centroid lineage — the
  // floats only decide assignments, where both engines are bit-identical.
  def s07Kmeans(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir).select("vec_id", "label", "embedding")
    val cent1 = graft.ops.Similarity.kmeansCentroids(
      emb, dim = 64, iters = 1, chunks = centroidChunks)
    graft.ops.Similarity.assignToCentroids(
        emb.select("vec_id", "embedding"), cent1, Seq("vec_id"))
      .groupBy(col("cluster").cast("long").as("cluster"))
      .agg(count(lit(1)).as("n_vecs"),
        sum(col("vec_id")).cast("long").as("id_sum"))
      .orderBy("cluster")
  }

  val s07Oracle: String = {
    s"""WITH ${duckCentroidCtes(64, centroidChunks)}, r1 AS (
      |  SELECT e.vec_id, e.embedding, c.clabel,
      |    row_number() OVER (PARTITION BY e.vec_id
      |      ORDER BY ${duckCosOf("e.embedding", "c.cf")} DESC, c.clabel) AS rn
      |  FROM embeddings e, cent c
      |), a1 AS (
      |  SELECT vec_id, embedding, clabel AS label FROM r1 WHERE rn = 1
      |), ${duckCentroidCtes(64, centroidChunks, src = "a1", sfx = "2")}, r2 AS (
      |  SELECT e.vec_id, c.clabel,
      |    row_number() OVER (PARTITION BY e.vec_id
      |      ORDER BY ${duckCosOf("e.embedding", "c.cf")} DESC, c.clabel) AS rn
      |  FROM embeddings e, cent2 c
      |)
      |SELECT CAST(clabel AS BIGINT) AS cluster, COUNT(*) AS n_vecs,
      |  CAST(SUM(vec_id) AS BIGINT) AS id_sum
      |FROM r2 WHERE rn = 1
      |GROUP BY clabel ORDER BY cluster""".stripMargin
  }

  // s09 — multi-round deterministic k-means (3 Lloyd rounds): the s07
  // pipeline at production iteration depth, exercising the between-round
  // centroid MATERIALIZATION (each round collects the ≤4096-row centroid
  // table and restarts the plan from a local relation — one corpus scan
  // per round instead of the O(iters²) recompute a lazily-nested lineage
  // pays; PlanAuditSpec pins the returned plan to a constant-size local
  // relation). Output pins the three-generation centroid lineage with
  // pure integers, like s07. Empty-cluster reseeding is enabled
  // (deterministic farthest-point, ties by id) but does not fire on this
  // data — KmeansSpec asserts both that no label empties here (so this
  // oracle needs no reseed arm) and, on a synthetic fixture where one
  // does, that the reseed rule is the documented one.
  def s09KmeansMulti(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir).select("vec_id", "label", "embedding")
    val cent3 = graft.ops.Similarity.kmeansCentroids(
      emb, dim = 64, iters = 3, chunks = centroidChunks, reseedEmpty = true)
    graft.ops.Similarity.assignToCentroids(
        emb.select("vec_id", "embedding"), cent3, Seq("vec_id"))
      .groupBy(col("cluster").cast("long").as("cluster"))
      .agg(count(lit(1)).as("n_vecs"),
        sum(col("vec_id")).cast("long").as("id_sum"))
      .orderBy("cluster")
  }

  /** One Lloyd round in oracle SQL: assign `embeddings` to `cent$prev`
    * (argmax by cosine, ties by label), then refold with the bounded
    * two-level centroid CTEs — the exact SQL s07 uses, chained. */
  private def duckLloydRound(prev: String, next: String): String =
    s"""r$next AS (
      |  SELECT e.vec_id, e.embedding, c.clabel,
      |    row_number() OVER (PARTITION BY e.vec_id
      |      ORDER BY ${duckCosOf("e.embedding", "c.cf")} DESC, c.clabel) AS rn
      |  FROM embeddings e, cent$prev c
      |), a$next AS (
      |  SELECT vec_id, embedding, clabel AS label FROM r$next WHERE rn = 1
      |), ${duckCentroidCtes(64, centroidChunks, src = s"a$next", sfx = next)}""".stripMargin

  val s09Oracle: String =
    s"""WITH ${duckCentroidCtes(64, centroidChunks)},
      |${duckLloydRound("", "2")},
      |${duckLloydRound("2", "3")},
      |${duckLloydRound("3", "4")}, rf AS (
      |  SELECT e.vec_id, c.clabel,
      |    row_number() OVER (PARTITION BY e.vec_id
      |      ORDER BY ${duckCosOf("e.embedding", "c.cf")} DESC, c.clabel) AS rn
      |  FROM embeddings e, cent4 c
      |)
      |SELECT CAST(clabel AS BIGINT) AS cluster, COUNT(*) AS n_vecs,
      |  CAST(SUM(vec_id) AS BIGINT) AS id_sum
      |FROM rf WHERE rn = 1
      |GROUP BY clabel ORDER BY cluster""".stripMargin

  // s08 — residual IVF+PQ, the full FAISS-style layout: rows quantize to
  // their cluster and the PQ codebook is learned on the RESIDUALS
  // (emb − centroid — what remains after the coarse quantizer explains
  // the vector). Scoring uses the exact MIPS decomposition
  // dot(q, ê) = dot(q, c) + dot(q, r̂_e): the LUT is built from the FULL
  // query vector against the residual codewords, and at nprobe = 1 the
  // dropped dot(q, c) term is constant per query, so within-cluster
  // ranking is unchanged (building the LUT from the query residual
  // instead would subtract a per-candidate dot(c, r̂_e) and silently
  // degrade recall). Residuals are computed with the
  // double-subtract-then-round kernel (VecSubToFloat) so both engines
  // hold bit-identical residual floats; the residual codebook is the
  // bounded-fold mean of residuals per ORIGINAL label (per-cluster
  // residual means would be ~0 — useless codewords). The codebook
  // collect executes the bounded assign+residual lineage once at build
  // time (the CdcQueries-fixture pattern); the query-side branch prunes
  // to the ~2% query rows via filter pushdown.
  def s08AnnIvfPqResidual(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.PqFunctions
    import graft.functions.VectorFunctions.vecSub
    val m = 8
    val emb = Tables.embeddings(spark, dir).select("vec_id", "label", "embedding")
    val cent = graft.ops.Similarity.buildCentroids(emb, dim = 64, chunks = centroidChunks)
    val assigned = graft.ops.Similarity.assignToCentroids(emb, cent, Seq("vec_id"))
    val withRes = assigned.join(broadcast(cent), col("cluster") === col("clabel"))
      .withColumn("res", vecSub(col("embedding"), col("cf")))
      .select("vec_id", "label", "cluster", "embedding", "res")
      // three actions consume this lineage (codebook fold, encode, the
      // query branch): materialize it once, bit-preserving (s16's pattern)
      .localCheckpoint()
    val resCent = graft.ops.Similarity.buildCentroids(
      withRes, dim = 64, chunks = centroidChunks, embCol = "res")
    val resCodebook = graft.ops.Similarity.collectCodebook(resCent)
    val encoded = withRes.select(col("vec_id"), col("cluster"),
      PqFunctions.pqCodes(col("res"), resCodebook, m).as("codes"))
    val q = withRes.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"),
        col("cluster").as("qc"))
    pqSearch(emb, encoded, q, resCodebook, m, candK = 20,
      joinCond = col("cluster") === col("qc") && col("vec_id") =!= col("query_id"))
  }

  val s08Oracle: String = {
    val resExpr =
      "list_transform(range(1, 65), i -> CAST(CAST(a.embedding[i] AS DOUBLE) - CAST(c.cf[i] AS DOUBLE) AS FLOAT))"
    duckPqSearchSql(8,
      s"""WITH ${duckCentroidCtes(64, centroidChunks)}, r1 AS (
        |  SELECT e.vec_id, e.label, e.embedding, c.clabel,
        |    row_number() OVER (PARTITION BY e.vec_id
        |      ORDER BY ${duckCosOf("e.embedding", "c.cf")} DESC, c.clabel) AS rn
        |  FROM embeddings e, cent c
        |), a1 AS (
        |  SELECT vec_id, label, embedding, clabel FROM r1 WHERE rn = 1
        |), res AS (
        |  SELECT a.vec_id, a.label, a.clabel AS cluster, a.embedding,
        |    $resExpr AS res
        |  FROM a1 a JOIN cent c ON c.clabel = a.clabel
        |), ${duckCentroidCtes(64, centroidChunks, src = "res", sfx = "r", embCol = "res")}, q AS (
        |  SELECT a.vec_id AS query_id, a.embedding AS qv, a.cluster AS qc
        |  FROM res a WHERE a.vec_id % 50 = 0
        |)""".stripMargin,
      appPreJoins = "  JOIN res a ON a.vec_id = co.vec_id\n",
      appPostJoins = "\n  JOIN q qq ON qq.query_id = q0.query_id AND qq.qc = a.cluster",
      corpusSrc = "res", corpusVec = "res", centName = "centr")
  }

  /** Ascending-index dot product in doubles over two `array<float>`
    * columns — the exact Spark mirror of the oracle's
    * `list_sum(list_transform(list_zip(a, b), ...))` (same fold order,
    * float→double casts exact, so the doubles are bit-identical).
    * Interpreted HOF, used ONLY on broadcast-sized probe rows (the hot
    * path keeps the codegen'd kernels). */
  private def dotD(a: org.apache.spark.sql.Column,
      b: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  // s11 — residual IVF+PQ at nprobe=2: the COMPLETE production FAISS
  // search path (coarse quantizer + residual codes + multi-probe). At
  // nprobe > 1 the residual decomposition's dot(q, c) term is no longer
  // constant per query — each probed cluster contributes its own — so the
  // candidate score restores it explicitly:
  //   approx = dot(q, c_probe) + Σ_s LUT[q](code_s)   ≈ dot(q, ê)
  // (s08's comment documents exactly this requirement; s10 took the
  // non-residual escape hatch). The dot(q, c_probe) is computed ONCE per
  // (query, probe) on the broadcast side with the ascending double fold
  // both engines share; candidates still move only (query_id, vec_id,
  // approx) and the join stays a cluster-key equi-join.
  def s11AnnIvfPqResProbe(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.PqFunctions
    import graft.functions.VectorFunctions.vecSub
    val m = 8
    val emb = Tables.embeddings(spark, dir).select("vec_id", "label", "embedding")
    val cent = graft.ops.Similarity.buildCentroids(emb, dim = 64, chunks = centroidChunks)
    val assigned = graft.ops.Similarity.assignToCentroids(emb, cent, Seq("vec_id"))
    val withRes = assigned.join(broadcast(cent), col("cluster") === col("clabel"))
      .withColumn("res", vecSub(col("embedding"), col("cf")))
      .select("vec_id", "label", "cluster", "embedding", "res")
      // three actions consume this lineage (codebook fold, encode, the
      // query branch): materialize it once, bit-preserving (s16's pattern)
      .localCheckpoint()
    val resCent = graft.ops.Similarity.buildCentroids(
      withRes, dim = 64, chunks = centroidChunks, embCol = "res")
    val resCodebook = graft.ops.Similarity.collectCodebook(resCent)
    val encoded = withRes.select(col("vec_id"), col("cluster"),
      PqFunctions.pqCodes(col("res"), resCodebook, m).as("codes"))
    val qRows = withRes.filter(col("vec_id") % 50 === 0)
    val probes = graft.ops.Similarity.probeCentroids(
        qRows.select("vec_id", "embedding"), cent, Seq("vec_id"), nprobe = 2)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"),
        col("cluster").as("qc"))
      .join(broadcast(cent), col("qc") === col("clabel"))
      .withColumn("qcdot", dotD(col("qv"), col("cf")))
      .select("query_id", "qv", "qc", "qcdot")
    pqSearch(emb, encoded, probes, resCodebook, m, candK = 20,
      joinCond = col("cluster") === col("qc") && col("vec_id") =!= col("query_id"),
      qExact = Some(qRows.select(col("vec_id").as("query_id"),
        col("embedding").as("qv"))),
      approxBoost = Some(col("qcdot")))
  }

  val s11Oracle: String = {
    val dotQC =
      "list_sum(list_transform(list_zip(r.embedding, c.cf), x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))"
    duckPqSearchSql(8,
      s"""WITH ${duckCentroidCtes(64, centroidChunks)}, r1 AS (
        |  SELECT e.vec_id, e.label, e.embedding, c.clabel,
        |    row_number() OVER (PARTITION BY e.vec_id
        |      ORDER BY ${duckCosOf("e.embedding", "c.cf")} DESC, c.clabel) AS rn
        |  FROM embeddings e, cent c
        |), a1 AS (
        |  SELECT vec_id, label, embedding, clabel FROM r1 WHERE rn = 1
        |), res AS (
        |  SELECT a.vec_id, a.label, a.clabel AS cluster, a.embedding,
        |    list_transform(range(1, 65), i -> CAST(CAST(a.embedding[i] AS DOUBLE) - CAST(c.cf[i] AS DOUBLE) AS FLOAT)) AS res
        |  FROM a1 a JOIN cent c ON c.clabel = a.clabel
        |), ${duckCentroidCtes(64, centroidChunks, src = "res", sfx = "r", embCol = "res")}, qp AS (
        |  SELECT r.vec_id AS query_id, r.clabel AS qc, $dotQC AS qcdot
        |  FROM r1 r JOIN cent c ON c.clabel = r.clabel
        |  WHERE r.vec_id % 50 = 0 AND r.rn <= 2
        |), q AS (
        |  SELECT a.vec_id AS query_id, a.embedding AS qv
        |  FROM res a WHERE a.vec_id % 50 = 0
        |)""".stripMargin,
      appPreJoins = "  JOIN res a ON a.vec_id = co.vec_id\n",
      appPostJoins = "\n  JOIN qp ON qp.query_id = q0.query_id AND qp.qc = a.cluster",
      corpusSrc = "res", corpusVec = "res", centName = "centr",
      approxBoost = " + qp.qcdot")
  }

  // s12 — PERSISTED IVF+PQ index: s06's layout written to disk and
  // searched from the read-back — the production lifecycle (an index is
  // built ONCE and searched by many query batches; every other s-query
  // rebuilds inline). The index is two parquet tables: codes partitioned
  // BY CLUSTER (the physical layout an IVF inverted list IS — a probe
  // reads only its cluster's directories at scale) and the broadcast-size
  // codebook. The search side re-derives everything from the PERSISTED
  // artifacts (centroids collected from the read-back codebook table, the
  // query's cluster re-assigned against them), so the gate pins the full
  // round-trip: float bits through parquet, the partition-column values,
  // and build/search consistency. Shares s06's oracle — a mismatch with a
  // green s06 isolates persistence.
  def s12AnnIvfPqPersisted(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.PqFunctions
    val m = 8
    // CdcQueries' shared fixture-dir helper: deterministic per input dir
    // AND wipes stale contents — without the wipe, dynamic
    // partition-overwrite (spark.sql.sources.partitionOverwriteMode=
    // dynamic) would leave a previous dataset's cluster directories in
    // place and read them back as phantom index rows
    val root = CdcQueries.tmpFixtureDir("graft_s12_", dir)
    root.mkdirs()
    val emb = Tables.embeddings(spark, dir)
    // ---- index build (once) ----
    val cent = graft.ops.Similarity.buildCentroids(emb, dim = 64, chunks = centroidChunks)
    val codebook = graft.ops.Similarity.collectCodebook(cent)
    val assigned = graft.ops.Similarity.assignToCentroids(
      emb.select("vec_id", "embedding"), cent, Seq("vec_id"))
    assigned.select(col("vec_id"), col("cluster"),
        PqFunctions.pqCodes(col("embedding"), codebook, m).as("codes"))
      .write.mode("overwrite").partitionBy("cluster")
      .parquet(new java.io.File(root, "codes").getPath)
    graft.ops.Similarity.codebookDf(spark, codebook)
      .write.mode("overwrite").parquet(new java.io.File(root, "codebook").getPath)
    // ---- search (from the persisted artifacts only) ----
    val centRead = spark.read.parquet(new java.io.File(root, "codebook").getPath)
    val cbRead = graft.ops.Similarity.collectCodebook(centRead)
    val encoded = spark.read.parquet(new java.io.File(root, "codes").getPath)
      // partition-column type inference reads small longs back as int
      .withColumn("cluster", col("cluster").cast("long"))
    val q = graft.ops.Similarity.assignToCentroids(
        emb.filter(col("vec_id") % 50 === 0).select("vec_id", "embedding"),
        centRead, Seq("vec_id"))
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"),
        col("cluster").as("qc"))
    pqSearch(emb, encoded, q, cbRead, m, candK = 20,
      joinCond = col("cluster") === col("qc") && col("vec_id") =!= col("query_id"))
  }

  // s13 — incremental index append with a FROZEN codebook (FAISS add()
  // semantics, the rest of the persisted-index lifecycle): the coarse
  // quantizer + codebook are trained on the BASE corpus only (vec_id%10
  // != 0), the delta batch (vec_id%10 == 0) is assigned and encoded
  // against those FROZEN artifacts — never retrained — and search runs
  // over the union. This is how a production index absorbs a new data
  // drop: re-training would re-shuffle every inverted list; appending
  // encodes only the delta (a narrow map + one broadcast argmax over the
  // new rows). The oracle mirrors the train/append split exactly: cent
  // CTEs over the base subset, assignment and codes for ALL rows against
  // that cent — so the gate pins that the delta really was encoded with
  // the frozen codebook, not a retrained one.
  def s13AnnIndexAppend(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.PqFunctions
    val m = 8
    val emb = Tables.embeddings(spark, dir)
    val base = emb.filter(col("vec_id") % 10 =!= 0)
    val cent = graft.ops.Similarity.buildCentroids(base, dim = 64, chunks = centroidChunks)
    val codebook = graft.ops.Similarity.collectCodebook(cent)
    def encode(rows: DataFrame): DataFrame =
      graft.ops.Similarity.assignToCentroids(
          rows.select("vec_id", "embedding"), cent, Seq("vec_id"))
        .select(col("vec_id"), col("cluster"),
          PqFunctions.pqCodes(col("embedding"), codebook, m).as("codes"))
    // base index + appended delta, both against the frozen artifacts
    val encoded = encode(base).unionByName(encode(emb.filter(col("vec_id") % 10 === 0)))
    val q = graft.ops.Similarity.assignToCentroids(
        emb.filter(col("vec_id") % 50 === 0).select("vec_id", "embedding"),
        cent, Seq("vec_id"))
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"),
        col("cluster").as("qc"))
    pqSearch(emb, encoded, q, codebook, m, candK = 20,
      joinCond = col("cluster") === col("qc") && col("vec_id") =!= col("query_id"))
  }

  val s13Oracle: String = duckPqSearchSql(8,
    s"""WITH base AS (
      |  SELECT vec_id, label, embedding FROM embeddings WHERE vec_id % 10 <> 0
      |), ${duckCentroidCtes(64, centroidChunks, src = "base")}, ranked AS (
      |  SELECT e.vec_id, e.embedding, c.clabel,
      |    row_number() OVER (PARTITION BY e.vec_id
      |      ORDER BY ${duckCosOf("e.embedding", "c.cf")} DESC, c.clabel) AS rn
      |  FROM embeddings e, cent c
      |), assigned AS (
      |  SELECT vec_id, embedding, clabel FROM ranked WHERE rn = 1
      |), q AS (
      |  SELECT vec_id AS query_id, embedding AS qv, clabel AS qc
      |  FROM assigned WHERE vec_id % 50 = 0
      |)""".stripMargin,
    appPreJoins = "  JOIN assigned a ON a.vec_id = co.vec_id\n",
    appPostJoins = "\n  JOIN q qq ON qq.query_id = q0.query_id AND qq.qc = a.clabel")

  // s14 — scalar-quantized (SQ8) flat ANN, the remaining classic FAISS
  // compression layout (PQ's codebook-free sibling): every dimension
  // quantizes independently to an 8-bit level against per-dimension
  // corpus [min,max] bounds, the approximate ranking scans RECONSTRUCTED
  // vectors (4× less memory traffic than raw floats at 100 TB), and the
  // top-20 re-rank exactly. Bounds are two 64-float aggregates (a 64-key
  // map-side-partial shuffle + guarded broadcast-size collect — no
  // training); encode/decode are narrow maps through the native
  // Sq8Codes/Sq8Decode kernels; the reconstructed-vector cosine reuses
  // the codegen'd CosineSimilarity. Every quantization op is a single
  // exactly-rounded IEEE double op, so codes and reconstructions are
  // bit-identical cross-engine.
  def s14AnnSq8(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.Sq8Functions
    val dim = 64
    val emb = Tables.embeddings(spark, dir)
    val bounds = emb
      .select(posexplode(col("embedding")).as(Seq("i", "x")))
      .groupBy("i").agg(min(col("x")).as("mn"), max(col("x")).as("mx"))
      .orderBy("i").limit(dim + 1).collect()
    require(bounds.length == dim,
      s"expected $dim per-dimension bounds, got ${bounds.length}")
    val mins = bounds.map(_.getFloat(1)).toSeq
    val scales = bounds.map(r =>
      (r.getFloat(2).toDouble - r.getFloat(1).toDouble) / 255.0).toSeq
    val encoded = emb.select(col("vec_id"),
      Sq8Functions.sq8Codes(col("embedding"), mins, scales).as("codes"))
    val q = emb.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val wA = Window.partitionBy("query_id").orderBy(col("approx").desc, col("vec_id"))
    val cand = encoded.join(broadcast(q), col("vec_id") =!= col("query_id"))
      .withColumn("approx",
        cosineSim(col("qv"), Sq8Functions.sq8Decode(col("codes"), mins, scales)))
      .select("query_id", "vec_id", "approx")
      .withColumn("arank", row_number().over(wA))
      .filter(col("arank") <= 20)
      .select("query_id", "vec_id")
    val wE = Window.partitionBy("query_id").orderBy(col("cos").desc, col("vec_id"))
    emb.join(broadcast(cand), "vec_id")
      .join(broadcast(q), "query_id")
      .withColumn("cos", cosineSim(col("qv"), col("embedding")))
      .withColumn("rank", row_number().over(wE))
      .filter(col("rank") <= 5)
      .select(col("query_id"), col("rank"), col("vec_id").as("neighbor_id"))
      .orderBy("query_id", "rank")
  }

  val s14Oracle: String =
    s"""WITH bounds AS (
      |  SELECT i, MIN(e.embedding[i]) AS mn, MAX(e.embedding[i]) AS mx
      |  FROM embeddings e, range(1, 65) t(i) GROUP BY i
      |), b AS (
      |  SELECT list(CAST(mn AS FLOAT) ORDER BY i) AS mns,
      |    list((CAST(mx AS DOUBLE) - CAST(mn AS DOUBLE)) / 255.0 ORDER BY i) AS scs
      |  FROM bounds
      |), dec AS (
      |  SELECT e.vec_id,
      |    list_transform(range(1, 65), i ->
      |      CAST(CAST(b.mns[i] AS DOUBLE) +
      |        (CASE WHEN b.scs[i] = 0 OR isnan(e.embedding[i]) THEN 0
      |              ELSE CAST(LEAST(GREATEST(floor((CAST(e.embedding[i] AS DOUBLE) - CAST(b.mns[i] AS DOUBLE)) / b.scs[i]), 0), 255) AS BIGINT)
      |         END) * b.scs[i] AS FLOAT)) AS rec
      |  FROM embeddings e CROSS JOIN b
      |), q AS (
      |  SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id % 50 = 0
      |), scored AS (
      |  SELECT query_id, d.vec_id, ${duckCosOf("qv", "rec")} AS approx
      |  FROM dec d, q WHERE d.vec_id <> query_id
      |), cand AS (
      |  SELECT query_id, vec_id FROM (
      |    SELECT query_id, vec_id,
      |      row_number() OVER (PARTITION BY query_id ORDER BY approx DESC, vec_id) AS arank
      |    FROM scored)
      |  WHERE arank <= 20
      |), rr AS (
      |  SELECT c.query_id, e.vec_id, ${duckCosOf("q.qv", "e.embedding")} AS cos
      |  FROM cand c
      |  JOIN embeddings e ON e.vec_id = c.vec_id
      |  JOIN q ON q.query_id = c.query_id
      |)
      |SELECT query_id, rank, neighbor_id FROM (
      |  SELECT query_id, vec_id AS neighbor_id,
      |    CAST(row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id) AS INT) AS rank
      |  FROM rr)
      |WHERE rank <= 5
      |ORDER BY query_id, rank""".stripMargin

  // s15 — IVF+SQ8 (FAISS IVFSQ): the coarse quantizer routes each query
  // to its cluster and SQ8 levels stand in for the vectors inside it —
  // completing the quantization matrix the engine now spans (IVF ×
  // {flat s03, PQ s06, SQ8 here}). The candidate join stays the cluster
  // equi-join; the probe side carries 64 byte-levels per row; approx
  // ranks reconstructed vectors via the codegen'd cosine; exact re-rank
  // on the top 20. Bounds and centroids are both broadcast-sized
  // aggregates, encode is a narrow map — nothing new moves at scale.
  def s15AnnIvfSq8(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.Sq8Functions
    val dim = 64
    val emb = Tables.embeddings(spark, dir)
    val bounds = emb
      .select(posexplode(col("embedding")).as(Seq("i", "x")))
      .groupBy("i").agg(min(col("x")).as("mn"), max(col("x")).as("mx"))
      .orderBy("i").limit(dim + 1).collect()
    require(bounds.length == dim,
      s"expected $dim per-dimension bounds, got ${bounds.length}")
    val mins = bounds.map(_.getFloat(1)).toSeq
    val scales = bounds.map(r =>
      (r.getFloat(2).toDouble - r.getFloat(1).toDouble) / 255.0).toSeq
    val cent = graft.ops.Similarity.buildCentroids(emb, dim = dim, chunks = centroidChunks)
    val assigned = graft.ops.Similarity.assignToCentroids(
      emb.select("vec_id", "embedding"), cent, Seq("vec_id"))
    val encoded = assigned.select(col("vec_id"), col("cluster"),
      Sq8Functions.sq8Codes(col("embedding"), mins, scales).as("codes"))
    val q = assigned.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"),
        col("cluster").as("qc"))
    val wA = Window.partitionBy("query_id").orderBy(col("approx").desc, col("vec_id"))
    val cand = encoded.join(broadcast(q),
        col("cluster") === col("qc") && col("vec_id") =!= col("query_id"))
      .withColumn("approx",
        cosineSim(col("qv"), Sq8Functions.sq8Decode(col("codes"), mins, scales)))
      .select("query_id", "vec_id", "approx")
      .withColumn("arank", row_number().over(wA))
      .filter(col("arank") <= 20)
      .select("query_id", "vec_id")
    val wE = Window.partitionBy("query_id").orderBy(col("cos").desc, col("vec_id"))
    emb.join(broadcast(cand), "vec_id")
      .join(broadcast(q.select("query_id", "qv")), "query_id")
      .withColumn("cos", cosineSim(col("qv"), col("embedding")))
      .withColumn("rank", row_number().over(wE))
      .filter(col("rank") <= 5)
      .select(col("query_id"), col("rank"), col("vec_id").as("neighbor_id"))
      .orderBy("query_id", "rank")
  }

  val s15Oracle: String =
    s"""WITH ${duckCentroidCtes(64, centroidChunks)}, bounds AS (
      |  SELECT i, MIN(e.embedding[i]) AS mn, MAX(e.embedding[i]) AS mx
      |  FROM embeddings e, range(1, 65) t(i) GROUP BY i
      |), b AS (
      |  SELECT list(CAST(mn AS FLOAT) ORDER BY i) AS mns,
      |    list((CAST(mx AS DOUBLE) - CAST(mn AS DOUBLE)) / 255.0 ORDER BY i) AS scs
      |  FROM bounds
      |), ranked AS (
      |  SELECT e.vec_id, e.embedding, c.clabel,
      |    row_number() OVER (PARTITION BY e.vec_id
      |      ORDER BY ${duckCosOf("e.embedding", "c.cf")} DESC, c.clabel) AS rn
      |  FROM embeddings e, cent c
      |), assigned AS (
      |  SELECT vec_id, embedding, clabel FROM ranked WHERE rn = 1
      |), dec AS (
      |  SELECT a.vec_id, a.clabel,
      |    list_transform(range(1, 65), i ->
      |      CAST(CAST(b.mns[i] AS DOUBLE) +
      |        (CASE WHEN b.scs[i] = 0 OR isnan(a.embedding[i]) THEN 0
      |              ELSE CAST(LEAST(GREATEST(floor((CAST(a.embedding[i] AS DOUBLE) - CAST(b.mns[i] AS DOUBLE)) / b.scs[i]), 0), 255) AS BIGINT)
      |         END) * b.scs[i] AS FLOAT)) AS rec
      |  FROM assigned a CROSS JOIN b
      |), q AS (
      |  SELECT vec_id AS query_id, embedding AS qv, clabel AS qc
      |  FROM assigned WHERE vec_id % 50 = 0
      |), scored AS (
      |  SELECT query_id, d.vec_id, ${duckCosOf("qv", "rec")} AS approx
      |  FROM dec d JOIN q ON d.clabel = q.qc AND d.vec_id <> q.query_id
      |), cand AS (
      |  SELECT query_id, vec_id FROM (
      |    SELECT query_id, vec_id,
      |      row_number() OVER (PARTITION BY query_id ORDER BY approx DESC, vec_id) AS arank
      |    FROM scored)
      |  WHERE arank <= 20
      |), rr AS (
      |  SELECT c.query_id, e.vec_id, ${duckCosOf("q.qv", "e.embedding")} AS cos
      |  FROM cand c
      |  JOIN embeddings e ON e.vec_id = c.vec_id
      |  JOIN q ON q.query_id = c.query_id
      |)
      |SELECT query_id, rank, neighbor_id FROM (
      |  SELECT query_id, vec_id AS neighbor_id,
      |    CAST(row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id) AS INT) AS rank
      |  FROM rr)
      |WHERE rank <= 5
      |ORDER BY query_id, rank""".stripMargin

  // s16 — residual IVF+PQ with a k-means-TRAINED residual codebook: s08's
  // layout, but the residual codewords are refined by one Lloyd round
  // (assign each residual to its nearest label-mean codeword by cosine,
  // refold by assignment) instead of stopping at label means — FAISS's
  // actual train() for IndexIVFPQ runs k-means on residuals, and this is
  // that step under the gate (the refinement PLANS.md lists as the s08
  // residual). Everything around the codebook is s08 unchanged: encode is
  // a narrow map, LUT from the full query vector, nprobe = 1 so the
  // dropped dot(q, c) is constant per query. The refined codebook stays
  // ≤ #labels rows (a codeword losing every residual drops, s07's
  // documented semantics); kmeansCentroids materializes the round's
  // centroids as a local relation, so the corpus-scan lineage runs once
  // per round, not O(rounds²).
  def s16AnnIvfPqResKmeans(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.PqFunctions
    import graft.functions.VectorFunctions.vecSub
    val m = 8
    val emb = Tables.embeddings(spark, dir).select("vec_id", "label", "embedding")
    val cent = graft.ops.Similarity.buildCentroids(emb, dim = 64, chunks = centroidChunks)
    val assigned = graft.ops.Similarity.assignToCentroids(emb, cent, Seq("vec_id"))
    val withRes = assigned.join(broadcast(cent), col("cluster") === col("clabel"))
      .withColumn("res", vecSub(col("embedding"), col("cf")))
      .select("vec_id", "label", "cluster", "embedding", "res")
    // The residual table feeds FOUR actions (codebook init fold, the
    // Lloyd round's assign+refold, encode, the query branch): training is
    // iterative, so materialize the training set ONCE (bit-preserving
    // localCheckpoint, the d10 cadence) instead of re-running
    // scan+assign+join per action — at scale this is "cache the training
    // sample before k-means", exactly what FAISS's train() does.
    val withResM = withRes.localCheckpoint()
    val resCent = graft.ops.Similarity.kmeansCentroids(
      withResM, dim = 64, iters = 1, chunks = centroidChunks, embCol = "res")
    val resCodebook = graft.ops.Similarity.collectCodebook(resCent)
    val encoded = withResM.select(col("vec_id"), col("cluster"),
      PqFunctions.pqCodes(col("res"), resCodebook, m).as("codes"))
    val q = withResM.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"),
        col("cluster").as("qc"))
    pqSearch(emb, encoded, q, resCodebook, m, candK = 20,
      joinCond = col("cluster") === col("qc") && col("vec_id") =!= col("query_id"))
  }

  val s16Oracle: String = {
    val resExpr =
      "list_transform(range(1, 65), i -> CAST(CAST(a.embedding[i] AS DOUBLE) - CAST(c.cf[i] AS DOUBLE) AS FLOAT))"
    duckPqSearchSql(8,
      s"""WITH ${duckCentroidCtes(64, centroidChunks)}, r1 AS (
        |  SELECT e.vec_id, e.label, e.embedding, c.clabel,
        |    row_number() OVER (PARTITION BY e.vec_id
        |      ORDER BY ${duckCosOf("e.embedding", "c.cf")} DESC, c.clabel) AS rn
        |  FROM embeddings e, cent c
        |), a1 AS (
        |  SELECT vec_id, label, embedding, clabel FROM r1 WHERE rn = 1
        |), res AS (
        |  SELECT a.vec_id, a.label, a.clabel AS cluster, a.embedding,
        |    $resExpr AS res
        |  FROM a1 a JOIN cent c ON c.clabel = a.clabel
        |), ${duckCentroidCtes(64, centroidChunks, src = "res", sfx = "r", embCol = "res")}, rl AS (
        |  SELECT a.vec_id, a.res, c.clabel,
        |    row_number() OVER (PARTITION BY a.vec_id
        |      ORDER BY ${duckCosOf("a.res", "c.cf")} DESC, c.clabel) AS rn
        |  FROM res a, centr c
        |), al AS (
        |  SELECT vec_id, res, clabel AS label FROM rl WHERE rn = 1
        |), ${duckCentroidCtes(64, centroidChunks, src = "al", sfx = "r2", embCol = "res")}, q AS (
        |  SELECT a.vec_id AS query_id, a.embedding AS qv, a.cluster AS qc
        |  FROM res a WHERE a.vec_id % 50 = 0
        |)""".stripMargin,
      appPreJoins = "  JOIN res a ON a.vec_id = co.vec_id\n",
      appPostJoins = "\n  JOIN q qq ON qq.query_id = q0.query_id AND qq.qc = a.cluster",
      corpusSrc = "res", corpusVec = "res", centName = "centr2")
  }

  // s17 — FILTERED ANN search (the metadata-predicate vector search every
  // production vector store implements): s03's IVF layout, but candidates
  // must satisfy a metadata predicate (here `label % 2 = 0`). The
  // predicate applies BEFORE the cluster-key candidate join — true
  // pre-filtering, so the top-k is the top-k OF THE FILTERED SET (a
  // post-rank filter would silently return fewer than k and miss
  // qualifying neighbors ranked past k). At scale the predicate is a
  // pushed parquet filter on the index side of the equi-join; queries
  // themselves are NOT filtered. Neighbor labels ride the output so the
  // gate also proves the filter held.
  def s17AnnFiltered(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    val cent = graft.ops.Similarity.buildCentroids(emb, dim = 64, chunks = centroidChunks)
    val assigned = graft.ops.Similarity.assignToCentroids(
      emb.select("vec_id", "label", "embedding"), cent, Seq("vec_id"))
    val q = assigned.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"),
        col("cluster").as("qc"))
    val cand = assigned.filter(col("label") % 2 === 0)
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("vec_id"))
    cand.join(broadcast(q),
        col("cluster") === col("qc") && col("vec_id") =!= col("query_id"))
      .withColumn("cos", cosineSim(col("qv"), col("embedding")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
      .select(col("query_id"), col("rank"), col("vec_id").as("neighbor_id"),
        col("label").cast("long").as("neighbor_label"))
      .orderBy("query_id", "rank")
  }

  val s17Oracle: String = {
    def cos(a: String, b: String) =
      s"list_sum(list_transform(list_zip($a, $b), x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))" +
        s" / sqrt(list_sum(list_transform($a, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))" +
        s" * list_sum(list_transform($b, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))"
    s"""WITH ${duckCentroidCtes(64, centroidChunks)}, assigned AS (
      |  SELECT vec_id, label, embedding, clabel FROM (
      |    SELECT e.vec_id, e.label, e.embedding, c.clabel,
      |      row_number() OVER (PARTITION BY e.vec_id
      |        ORDER BY ${cos("e.embedding", "c.cf")} DESC, c.clabel) AS rn
      |    FROM embeddings e, cent c)
      |  WHERE rn = 1
      |), q AS (
      |  SELECT vec_id AS query_id, embedding AS qv, clabel AS qc
      |  FROM assigned WHERE vec_id % 50 = 0
      |), scored AS (
      |  SELECT query_id, a.vec_id, a.label, ${cos("qv", "a.embedding")} AS cos
      |  FROM assigned a JOIN q ON a.clabel = q.qc AND a.vec_id <> q.query_id
      |  WHERE a.label % 2 = 0
      |)
      |SELECT query_id, rank, neighbor_id, neighbor_label FROM (
      |  SELECT query_id, vec_id AS neighbor_id,
      |    CAST(label AS BIGINT) AS neighbor_label,
      |    CAST(row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id) AS INT) AS rank
      |  FROM scored)
      |WHERE rank <= 5
      |ORDER BY query_id, rank""".stripMargin
  }

  // s18 — cluster purity: the evaluation join every clustering pipeline
  // runs — IVF-assign the embeddings, join the document table's metadata
  // on the shared id, and report each cluster's size, majority language,
  // and purity. The cross-table hop (embeddings ↔ documents) is an
  // equi-join on the id — at 100 TB both sides shuffle on it (or
  // co-bucket); the per-cluster majority is a two-level agg + one window
  // over cluster-sized rows, never the corpus.
  def s18ClusterPurity(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    val cent = graft.ops.Similarity.buildCentroids(emb, dim = 64, chunks = centroidChunks)
    val assigned = graft.ops.Similarity.assignToCentroids(
      emb.select("vec_id", "embedding"), cent, Seq("vec_id"))
    val byLang = assigned
      .join(Tables.documents(spark, dir).select(col("doc_id"), col("lang")),
        col("vec_id") === col("doc_id"))
      .groupBy(col("cluster").cast("long").as("cluster"), col("lang"))
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy("cluster").orderBy(col("n").desc, col("lang"))
    byLang
      .withColumn("rn", row_number().over(w))
      .withColumn("n_vecs", sum(col("n")).over(Window.partitionBy("cluster")))
      .filter(col("rn") === 1)
      .select(col("cluster"), col("n_vecs"),
        col("lang").as("top_lang"), col("n").as("top_n"),
        (col("n").cast("double") / col("n_vecs")).as("purity"))
      .orderBy("cluster")
  }

  val s18Oracle: String =
    s"""WITH ${duckCentroidCtes(64, centroidChunks)}, assigned AS (
      |  SELECT vec_id, clabel FROM (
      |    SELECT e.vec_id, c.clabel,
      |      row_number() OVER (PARTITION BY e.vec_id
      |        ORDER BY ${duckCosOf("e.embedding", "c.cf")} DESC, c.clabel) AS rn
      |    FROM embeddings e, cent c)
      |  WHERE rn = 1
      |), byl AS (
      |  SELECT CAST(a.clabel AS BIGINT) AS cluster, d.lang, COUNT(*) AS n
      |  FROM assigned a JOIN documents d ON d.doc_id = a.vec_id
      |  GROUP BY a.clabel, d.lang
      |)
      |SELECT cluster, n_vecs, lang AS top_lang, n AS top_n,
      |  CAST(n AS DOUBLE)/n_vecs AS purity
      |FROM (
      |  SELECT cluster, lang, n,
      |    row_number() OVER (PARTITION BY cluster ORDER BY n DESC, lang) AS rn,
      |    CAST(SUM(n) OVER (PARTITION BY cluster) AS BIGINT) AS n_vecs
      |  FROM byl)
      |WHERE rn = 1 ORDER BY cluster""".stripMargin

  // s19 — index-quality evaluation: recall@5 of the IVF index (s03)
  // against the exact brute-force ground truth (s01) — the metric every
  // ANN deployment reports before trusting an index. Both sides ARE the
  // gated operators (the DataFrames and the oracle SQL are s01's and
  // s03's own definitions, composed), so a recall regression isolates to
  // the index, not the evaluator. Scale: the truth side is exact top-k
  // over the sampled query set only (the standard evaluation protocol —
  // ground truth is priced per-query, never per-corpus-pair), and the
  // hit join carries (query_id, neighbor_id) pairs, k rows per query.
  def s19AnnRecall(spark: SparkSession, dir: String): DataFrame = {
    val truth = s01AnnBruteForce(spark, dir).filter(col("rank") <= 5)
      .select(col("query_id"), col("neighbor_id"))
    val approx = s03AnnIvf(spark, dir).select(col("query_id"), col("neighbor_id"))
    val hits = truth.join(approx, Seq("query_id", "neighbor_id"))
      .groupBy("query_id").agg(count(lit(1)).cast("int").as("n_hits"))
    truth.select("query_id").distinct()
      .join(hits, Seq("query_id"), "left")
      .withColumn("n_hits", coalesce(col("n_hits"), lit(0)))
      .withColumn("recall5", col("n_hits").cast("double") / 5.0)
      .orderBy("query_id")
  }

  val s19Oracle: String =
    s"""WITH truth AS (
      |  SELECT query_id, neighbor_id FROM ($s01Oracle) WHERE rank <= 5
      |), approx AS (
      |  SELECT query_id, neighbor_id FROM ($s03Oracle)
      |), hits AS (
      |  SELECT t.query_id, CAST(COUNT(*) AS INT) AS n_hits
      |  FROM truth t JOIN approx a
      |    ON a.query_id = t.query_id AND a.neighbor_id = t.neighbor_id
      |  GROUP BY t.query_id
      |)
      |SELECT q.query_id, COALESCE(h.n_hits, 0) AS n_hits,
      |  CAST(COALESCE(h.n_hits, 0) AS DOUBLE)/5.0 AS recall5
      |FROM (SELECT DISTINCT query_id FROM truth) q
      |LEFT JOIN hits h USING (query_id)
      |ORDER BY query_id""".stripMargin

  // s20 — tombstone-aware search: FAISS remove_ids() semantics, the
  // DELETE leg of index maintenance (s12 persists, s13 appends, s20
  // deletes). The coarse quantizer and codebook are NOT retrained — a
  // delete must not re-shuffle the inverted lists — the deleted ids are
  // an arbitrary id TABLE (production deletes arrive as GDPR/takedown id
  // lists, not predicates), and the index side drops them with a
  // LEFT ANTI join before the candidate join, so top-k is the top-k of
  // the live set (post-rank filtering would return < k). At 100 TB the
  // anti-join shuffles only (vec_id) pairs — or, with the s12 layout,
  // becomes a cluster-partition-local merge since both sides carry the
  // cluster key.
  def s20AnnTombstones(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.PqFunctions
    val m = 8
    val emb = Tables.embeddings(spark, dir)
    val cent = graft.ops.Similarity.buildCentroids(emb, dim = 64, chunks = centroidChunks)
    val codebook = graft.ops.Similarity.collectCodebook(cent)
    val assigned = graft.ops.Similarity.assignToCentroids(
      emb.select("vec_id", "embedding"), cent, Seq("vec_id"))
    val encoded = assigned.select(col("vec_id"), col("cluster"),
      PqFunctions.pqCodes(col("embedding"), codebook, m).as("codes"))
    val tombstones = emb.filter(col("vec_id") % 9 === 0).select("vec_id")
    val live = encoded.join(tombstones, Seq("vec_id"), "left_anti")
    // queries are NOT filtered: a deleted vector may still arrive as a
    // query (re-ingestion lookup); it must find live neighbors only
    val q = assigned.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"),
        col("cluster").as("qc"))
    pqSearch(emb, live, q, codebook, m, candK = 20,
      joinCond = col("cluster") === col("qc") && col("vec_id") =!= col("query_id"))
  }

  val s20Oracle: String = duckPqSearchSql(8,
    s"""WITH ${duckCentroidCtes(64, centroidChunks)}, live AS (
      |  SELECT vec_id, embedding FROM embeddings WHERE vec_id % 9 <> 0
      |), ranked AS (
      |  SELECT e.vec_id, e.embedding, c.clabel,
      |    row_number() OVER (PARTITION BY e.vec_id
      |      ORDER BY ${duckCosOf("e.embedding", "c.cf")} DESC, c.clabel) AS rn
      |  FROM embeddings e, cent c
      |), assigned AS (
      |  SELECT vec_id, embedding, clabel FROM ranked WHERE rn = 1
      |), q AS (
      |  SELECT vec_id AS query_id, embedding AS qv, clabel AS qc
      |  FROM assigned WHERE vec_id % 50 = 0
      |)""".stripMargin,
    appPreJoins = "  JOIN assigned a ON a.vec_id = co.vec_id\n",
    appPostJoins = "\n  JOIN q qq ON qq.query_id = q0.query_id AND qq.qc = a.clabel",
    corpusSrc = "live")

  // s21 — RANGE search (FAISS range_search): all live neighbors within a
  // cosine radius, not a fixed k — the dedup/retrieval primitive when the
  // caller wants "everything at least this similar" (radius filtering,
  // duplicate sweeps, threshold retrieval). Runs on the s04 IVF layout at
  // nprobe=2: candidates come only from the query's two nearest clusters
  // (the candidate join stays a cluster-key equi-join against broadcast
  // probes), the radius predicate replaces the top-k window — so the
  // operator has NO per-query sort at all, the cheapest shape of the
  // family — and empty result sets survive through the left join (a query
  // with no in-range neighbor reports n_in_range = 0, the FAISS
  // empty-list contract). The id checksum and floor-scaled max cosine
  // prove both engines selected the identical neighbor SETS. Radius 0.3
  // is live on the synthetic embeddings (2–4 hits per query at sf0.01).
  def s21AnnRange(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    val cent = graft.ops.Similarity.buildCentroids(emb, dim = 64, chunks = centroidChunks)
    val assigned = graft.ops.Similarity.assignToCentroids(
      emb.select("vec_id", "embedding"), cent, Seq("vec_id"))
    val qSet = assigned.filter(col("vec_id") % 50 === 0)
    val probes = graft.ops.Similarity.probeCentroids(
        qSet.select("vec_id", "embedding"), cent, Seq("vec_id"), nprobe = 2)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"),
        col("cluster").as("qc"))
    val hits = assigned.join(broadcast(probes),
        col("cluster") === col("qc") && col("vec_id") =!= col("query_id"))
      .withColumn("cos", cosineSim(col("qv"), col("embedding")))
      .filter(col("cos") >= 0.3)
      .groupBy("query_id")
      .agg(count(lit(1)).cast("int").as("n_in_range"),
        sum(col("vec_id")).as("id_checksum"),
        floor(max(col("cos")) * 1000000).cast("long").as("max_cos_micros"))
    qSet.select(col("vec_id").as("query_id"))
      .join(hits, Seq("query_id"), "left")
      .select(col("query_id"),
        coalesce(col("n_in_range"), lit(0)).as("n_in_range"),
        col("id_checksum"), col("max_cos_micros"))
      .orderBy("query_id")
  }

  val s21Oracle: String =
    s"""WITH ${duckCentroidCtes(64, centroidChunks)}, ranked AS (
      |  SELECT e.vec_id, e.embedding, c.clabel,
      |    row_number() OVER (PARTITION BY e.vec_id
      |      ORDER BY ${duckCosOf("e.embedding", "c.cf")} DESC, c.clabel) AS rn
      |  FROM embeddings e, cent c
      |), assigned AS (
      |  SELECT vec_id, embedding, clabel FROM ranked WHERE rn = 1
      |), q AS (
      |  SELECT vec_id AS query_id, embedding AS qv, clabel AS qc
      |  FROM ranked WHERE vec_id % 50 = 0 AND rn <= 2
      |), scored AS (
      |  SELECT query_id, a.vec_id, ${duckCosOf("qv", "a.embedding")} AS cos
      |  FROM assigned a JOIN q ON a.clabel = q.qc AND a.vec_id <> q.query_id
      |), hits AS (
      |  SELECT query_id, CAST(COUNT(*) AS INT) AS n_in_range,
      |    CAST(SUM(vec_id) AS BIGINT) AS id_checksum,
      |    CAST(floor(MAX(cos) * 1000000) AS BIGINT) AS max_cos_micros
      |  FROM scored WHERE cos >= 0.3 GROUP BY query_id
      |)
      |SELECT ql.query_id, COALESCE(h.n_in_range, 0) AS n_in_range,
      |  h.id_checksum, h.max_cos_micros
      |FROM (SELECT vec_id AS query_id FROM embeddings WHERE vec_id % 50 = 0) ql
      |LEFT JOIN hits h USING (query_id)
      |ORDER BY ql.query_id""".stripMargin

  // s22 — PQ quantization DISTORTION, the index-quality diagnostic FAISS
  // prints at train time (imbalance + per-subquantizer error): for every
  // encoded row, the squared reconstruction error against its codeword,
  // aggregated corpus-wide PER SUBSPACE. A subspace whose error is an
  // outlier is mis-trained (bad codebook slice, collapsed clusters) —
  // this is the number an operator watches before shipping an index, and
  // a regression in encode/codebook lineage moves it even when search
  // top-k happens to survive. Engine: the native [[graft.functions
  // .PqSqError]] kernel decodes against the constructor codebook, so the
  // whole query is a NARROW map + posexplode + an 8-group aggregate — no
  // join, no shuffle beyond the fixed-size agg; at 100 TB it rides a
  // single corpus scan. Cross-engine exactness: per-row per-subspace
  // error is an ascending-j double fold of widen-subtract-square (no
  // libm `pow`), floor-scaled to micros PER ROW before the corpus sum so
  // the aggregate is an integer — layout- and fold-order-independent.
  def s22PqDistortion(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.PqFunctions
    val m = 8
    val emb = Tables.embeddings(spark, dir)
    val cent = graft.ops.Similarity.buildCentroids(emb, dim = 64, chunks = centroidChunks)
    val codebook = graft.ops.Similarity.collectCodebook(cent)
    val encoded = emb.select(col("vec_id"), col("embedding"),
      PqFunctions.pqCodes(col("embedding"), codebook, m).as("codes"))
    encoded
      .select(posexplode(PqFunctions.pqSqError(
        col("embedding"), col("codes"), codebook, m)).as(Seq("subspace", "err")))
      .select(col("subspace"),
        floor(col("err") * 1000000d).cast("long").as("err_micros"))
      .groupBy("subspace")
      .agg(count(lit(1)).as("n_vecs"),
        sum(col("err_micros")).as("err_micros_sum"),
        max(col("err_micros")).as("max_err_micros"))
      .orderBy("subspace")
  }

  val s22Oracle: String = {
    val m = 8
    def subDot(a: String, b: String, s: Int) =
      s"list_sum(list_transform(range(1, 9), i -> CAST($a[${s * 8} + i] AS DOUBLE) * CAST($b[${s * 8} + i] AS DOUBLE)))"
    val eds = (0 until m).map(s => s"    ${subDot("e.embedding", "c.cf", s)} AS d$s").mkString(",\n")
    val rns = (0 until m).map(s =>
      s"    row_number() OVER (PARTITION BY vec_id ORDER BY d$s DESC, clabel) AS r$s").mkString(",\n")
    val codeCols = (0 until m).map(s =>
      s"    MAX(CASE WHEN r$s = 1 THEN clabel END) AS code$s").mkString(",\n")
    val codeList = (0 until m).map(s => s"co.code$s").mkString("[", ", ", "]")
    val diff = "(CAST(e.embedding[s.s*8 + i] AS DOUBLE) - CAST(c.cf[s.s*8 + i] AS DOUBLE))"
    s"""WITH ${duckCentroidCtes(64, centroidChunks)}, ecd AS (
      |  SELECT e.vec_id, c.clabel,
      |$eds
      |  FROM embeddings e CROSS JOIN cent c
      |), er AS (
      |  SELECT vec_id, clabel,
      |$rns
      |  FROM ecd
      |), codes AS (
      |  SELECT vec_id,
      |$codeCols
      |  FROM er GROUP BY vec_id
      |), err AS (
      |  SELECT e.vec_id, CAST(s.s AS INT) AS subspace,
      |    CAST(floor(list_sum(list_transform(range(1, 9), i ->
      |      $diff * $diff)) * 1000000.0) AS BIGINT) AS err_micros
      |  FROM embeddings e
      |  JOIN codes co USING (vec_id),
      |  LATERAL (SELECT unnest(range(0, $m)) AS s) s
      |  JOIN cent c ON c.clabel = $codeList[s.s + 1]
      |)
      |SELECT subspace, COUNT(*) AS n_vecs,
      |  CAST(SUM(err_micros) AS BIGINT) AS err_micros_sum,
      |  CAST(MAX(err_micros) AS BIGINT) AS max_err_micros
      |FROM err GROUP BY 1 ORDER BY 1""".stripMargin
  }

  // s23 — IVF inverted-list BALANCE statistics, FAISS's
  // `imbalance_factor` next to s22's distortion: per-cluster population
  // min/max and Σn², from which imbalance = k·Σn²/N² (reported as its
  // exact integer parts — the division is the reader's). An imbalanced
  // index is the OTHER way IVF degrades silently: search cost at
  // nprobe=p is the sum of the p probed list lengths, so one hot cluster
  // makes every query that probes it pay; FAISS prints exactly this
  // statistic after train(). One centroid broadcast + one count-shuffle
  // on the cluster key; constant-size output at any corpus scale.
  def s23IvfStats(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    val cent = graft.ops.Similarity.buildCentroids(emb, dim = 64, chunks = centroidChunks)
    val assigned = graft.ops.Similarity.assignToCentroids(
      emb.select("vec_id", "embedding"), cent, Seq("vec_id"))
    assigned.groupBy("cluster").agg(count(lit(1)).as("n"))
      .agg(count(lit(1)).as("k_nonempty"),
        sum(col("n")).as("n_total"),
        min(col("n")).as("min_cluster"),
        max(col("n")).as("max_cluster"),
        sum(col("n") * col("n")).as("sum_sq_sizes"))
  }

  val s23Oracle: String =
    s"""WITH ${duckCentroidCtes(64, centroidChunks)}, assigned AS (
      |  SELECT vec_id, clabel FROM (
      |    SELECT e.vec_id, c.clabel,
      |      row_number() OVER (PARTITION BY e.vec_id
      |        ORDER BY ${duckCosOf("e.embedding", "c.cf")} DESC, c.clabel) AS rn
      |    FROM embeddings e, cent c)
      |  WHERE rn = 1
      |), sizes AS (
      |  SELECT clabel, COUNT(*) AS n FROM assigned GROUP BY clabel
      |)
      |SELECT COUNT(*) AS k_nonempty,
      |  CAST(SUM(n) AS BIGINT) AS n_total,
      |  CAST(MIN(n) AS BIGINT) AS min_cluster,
      |  CAST(MAX(n) AS BIGINT) AS max_cluster,
      |  CAST(SUM(n * n) AS BIGINT) AS sum_sq_sizes
      |FROM sizes""".stripMargin

  // s24 — PER-CLUSTER PROTOTYPE (coreset) SELECTION: for every IVF
  // cluster, keep the 8 vectors most similar to their own centroid —
  // the "most prototypical" representatives. This is the selection
  // primitive behind cluster-based data pruning (keep prototypes /
  // drop them, per the density argument in SemDeDup §5 and
  // prototype-based coreset papers): once a corpus is clustered, both
  // pruning policies and human inspection want "the m examples that
  // define each cluster". Plan shape: the gated assignment
  // (broadcast-centroid argmax agg), ONE broadcast equi-join back to
  // the centroid table for the self-cosine (no pairwise join — cost is
  // N·1, not N·k), a per-cluster top-m window over (cos desc, vec_id),
  // and an integer reduction (count / id-checksum / cut-off id) that
  // pins the exact selected set. The window partitions by cluster —
  // thousands of lists at scale, bounded by the s23 balance profile.
  def s24ClusterPrototypes(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    val cent = graft.ops.Similarity.buildCentroids(emb, dim = 64, chunks = centroidChunks)
    val assigned = graft.ops.Similarity.assignToCentroids(
      emb.select("vec_id", "embedding"), cent, Seq("vec_id"))
    val w = Window.partitionBy("cluster").orderBy(col("ccos").desc, col("vec_id"))
    assigned
      .join(broadcast(cent.withColumnRenamed("clabel", "cluster")), Seq("cluster"))
      .withColumn("ccos", cosineSim(col("embedding"), col("cf")))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 8)
      .groupBy(col("cluster").cast("long").as("cluster"))
      .agg(count(lit(1)).as("n_sel"),
        sum(col("vec_id")).as("sel_id_sum"),
        max_by(col("vec_id"), col("rk")).as("cutoff_id"))
      .orderBy("cluster")
  }

  val s24Oracle: String =
    s"""WITH ${duckCentroidCtes(64, centroidChunks)}, assigned AS (
      |  SELECT vec_id, embedding, clabel FROM (
      |    SELECT e.vec_id, e.embedding, c.clabel,
      |      row_number() OVER (PARTITION BY e.vec_id
      |        ORDER BY ${duckCosOf("e.embedding", "c.cf")} DESC, c.clabel) AS rn
      |    FROM embeddings e, cent c)
      |  WHERE rn = 1
      |), scored AS (
      |  SELECT a.vec_id, a.clabel,
      |    row_number() OVER (PARTITION BY a.clabel
      |      ORDER BY ${duckCosOf("a.embedding", "c.cf")} DESC, a.vec_id) AS rk
      |  FROM assigned a JOIN cent c ON a.clabel = c.clabel
      |)
      |SELECT CAST(clabel AS BIGINT) AS cluster, COUNT(*) AS n_sel,
      |  CAST(SUM(vec_id) AS BIGINT) AS sel_id_sum,
      |  CAST(max_by(vec_id, rk) AS BIGINT) AS cutoff_id
      |FROM scored WHERE rk <= 8
      |GROUP BY clabel ORDER BY cluster""".stripMargin

  // s25 — CLUSTER-PARTITIONED kNN-GRAPH construction: each vector's 3
  // nearest neighbors WITHIN its IVF cluster (cos desc, ties by id) —
  // the standard distributed seeding for NN-Descent / graph-based ANN
  // (an HNSW-quality graph starts from exactly this partitioned kNN),
  // and the input to mutual-kNN agglomerative clustering. The quadratic
  // term is n_c² per cluster (d14's declared cost class — bounded by
  // the s23 balance profile, never N²); the per-node top-k is a window
  // over (cluster, node). Mutual edges (i→j AND j→i) are counted via a
  // self-equi-join of the directed edge set on the swapped key — mutual
  // density is THE graph-quality signal NN-Descent convergence is
  // judged by. Integer output pins nodes, edge multiset (neighbor-id
  // checksum), and mutual count per cluster.
  /** The directed top-`k` intra-cluster kNN edge list over an
    * [[graft.ops.Similarity.assignToCentroids]] output — the ONE edge
    * definition every graph-index query shares (s25 build stats,
    * s34/s36 search, s38/s40/s41 calibration), so the gated search and
    * its calibration tables cannot drift (the graphBallSearch
    * anti-drift rationale, applied to the index build itself).
    * Output: (cluster, id_a, id_b), rank ≤ k by (cos desc, id_b). */
  private def knnEdges(assigned: DataFrame, k: Int = 3): DataFrame = {
    val l = assigned.select(col("cluster"), col("vec_id").as("id_a"),
      col("embedding").as("va"))
    val r = assigned.select(col("cluster"), col("vec_id").as("id_b"),
      col("embedding").as("vb"))
    val wk = Window.partitionBy("cluster", "id_a")
      .orderBy(col("cos").desc, col("id_b"))
    l.join(r, Seq("cluster"))
      .filter(col("id_a") =!= col("id_b"))
      .withColumn("cos", cosineSim(col("va"), col("vb")))
      .withColumn("rk", row_number().over(wk))
      .filter(col("rk") <= k)
      .select("cluster", "id_a", "id_b")
  }

  /** One BRIDGE edge per vector — its top-cosine neighbor inside its
    * SECOND-nearest cluster (the rn=2 coarse assignment; DiskANN's
    * long-range links, relationally). The intra-cluster kNN ball cannot
    * leave the probed clusters, so without bridges recall saturates at
    * the coarse-quantizer truncation rate however many hops run; s41
    * prices the lift, and the SERVED search (s34/s36/s38) includes
    * these by default. Build cost: each vector joins ONE other
    * cluster's members — the same N²/k pair-mass class as the intra
    * kNN build, cluster-keyed, never all-pairs. Output: (id_a, id_b). */
  private def bridgeEdges(emb: DataFrame, cent: DataFrame,
      assigned: DataFrame): DataFrame = {
    // each vector's SECOND-nearest cluster: the nprobe=2 probe minus the
    // assignment — both share the (ccos desc, clabel) tie-break, so the
    // leftover row is exactly rn = 2
    val second = graft.ops.Similarity.probeCentroids(
        emb.select("vec_id", "embedding"), cent, Seq("vec_id"), nprobe = 2)
      .join(assigned.select(col("vec_id"), col("cluster").as("c1")), Seq("vec_id"))
      .filter(col("cluster") =!= col("c1"))
    val wB = Window.partitionBy("id_a").orderBy(col("cos").desc, col("id_b"))
    second.select(col("vec_id").as("id_a"),
        col("embedding").as("va"), col("cluster"))
      .join(assigned.select(col("cluster"), col("vec_id").as("id_b"),
        col("embedding").as("vb")), Seq("cluster"))
      .withColumn("cos", cosineSim(col("va"), col("vb")))
      .withColumn("rk", row_number().over(wB))
      .filter(col("rk") === 1)
      .select("id_a", "id_b")
  }

  /** The SERVED graph-search configuration, promoted from the measured
    * calibration curves (round-11): s40's nprobe sweep reads 266k /
    * 400k / 625k ppm recall@3 at nprobe 1/2/4 on sf0.1 (seed-scoring
    * cost grows linearly with nprobe — 625k ppm for 2× the nprobe=2
    * scoring is the curve's knee), and s41 measures bridge edges adding
    * a further lift at fixed nprobe (400k → 417k ppm at nprobe=2 on
    * sf0.1). The default serving path (s34/s36, measured by s38) is
    * therefore BRIDGED edges + nprobe = 4; s40/s41 keep pricing the
    * dials at their historical settings so the curves stay comparable
    * across rounds. */
  private val servedNprobe = 4

  def s25KnnGraph(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    val cent = graft.ops.Similarity.buildCentroids(emb, dim = 64, chunks = centroidChunks)
    val assigned = graft.ops.Similarity.assignToCentroids(
      emb.select("vec_id", "embedding"), cent, Seq("vec_id"))
    val edges = knnEdges(assigned)
    val mutual = edges.join(
        edges.select(col("cluster"), col("id_b").as("id_a"), col("id_a").as("id_b")),
        Seq("cluster", "id_a", "id_b"))
      .groupBy("cluster").agg((count(lit(1)) / 2).cast("long").as("n_mutual"))
    val nodes = assigned.groupBy("cluster").agg(count(lit(1)).as("n_nodes"))
    val estats = edges.groupBy("cluster")
      .agg(count(lit(1)).as("n_edges"), sum(col("id_b")).as("nbr_id_sum"))
    nodes.join(estats, Seq("cluster"), "left")
      .join(mutual, Seq("cluster"), "left")
      .select(col("cluster").cast("long").as("cluster"), col("n_nodes"),
        coalesce(col("n_edges"), lit(0L)).as("n_edges"),
        coalesce(col("nbr_id_sum"), lit(0L)).as("nbr_id_sum"),
        coalesce(col("n_mutual"), lit(0L)).as("n_mutual"))
      .orderBy("cluster")
  }

  val s25Oracle: String =
    s"""WITH ${duckCentroidCtes(64, centroidChunks)}, assigned AS (
      |  SELECT vec_id, embedding, clabel FROM (
      |    SELECT e.vec_id, e.embedding, c.clabel,
      |      row_number() OVER (PARTITION BY e.vec_id
      |        ORDER BY ${duckCosOf("e.embedding", "c.cf")} DESC, c.clabel) AS rn
      |    FROM embeddings e, cent c)
      |  WHERE rn = 1
      |), edges AS (
      |  SELECT clabel, id_a, id_b FROM (
      |    SELECT a.clabel, a.vec_id AS id_a, b.vec_id AS id_b,
      |      row_number() OVER (PARTITION BY a.clabel, a.vec_id
      |        ORDER BY ${duckCosOf("a.embedding", "b.embedding")} DESC, b.vec_id) AS rk
      |    FROM assigned a JOIN assigned b
      |      ON a.clabel = b.clabel AND a.vec_id <> b.vec_id)
      |  WHERE rk <= 3
      |), mut AS (
      |  SELECT e1.clabel, COUNT(*) // 2 AS n_mutual
      |  FROM edges e1 JOIN edges e2
      |    ON e1.clabel = e2.clabel AND e1.id_a = e2.id_b AND e1.id_b = e2.id_a
      |  GROUP BY e1.clabel
      |), nodes AS (
      |  SELECT clabel, COUNT(*) AS n_nodes FROM assigned GROUP BY clabel
      |), es AS (
      |  SELECT clabel, COUNT(*) AS n_edges, SUM(id_b) AS nbr_id_sum
      |  FROM edges GROUP BY clabel
      |)
      |SELECT CAST(n.clabel AS BIGINT) AS cluster, n.n_nodes,
      |  CAST(COALESCE(es.n_edges, 0) AS BIGINT) AS n_edges,
      |  CAST(COALESCE(es.nbr_id_sum, 0) AS BIGINT) AS nbr_id_sum,
      |  CAST(COALESCE(m.n_mutual, 0) AS BIGINT) AS n_mutual
      |FROM nodes n LEFT JOIN es ON n.clabel = es.clabel
      |LEFT JOIN mut m ON n.clabel = m.clabel
      |ORDER BY cluster""".stripMargin

  // s26 — the PRODUCTION SEARCH CONFIGURATION: every search-time feature
  // the ladder built, composed in one query — IVF multi-probe (s10's
  // nprobe=2 probes), PQ/ADC candidate scoring (s05's LUT path),
  // tombstone-masked index (s20's delete maintenance), and a metadata
  // pre-filter (s17's label predicate), finished with the exact
  // re-rank. This is what a real vector-search deployment actually
  // runs; gating the COMPOSITION catches interaction bugs the
  // single-feature queries can't (e.g. a filter applied after the
  // candidate cut would silently shrink recall — here it must be in
  // the index side of the ADC join to match the oracle). Plan shape is
  // s10's: candidate join stays a cluster-key equi-join against
  // broadcast probes; filter and tombstone anti-join land on the
  // encoded (8-longs-per-row) side BEFORE the join, so masked/filtered
  // vectors never ride the shuffle.
  def s26ProductionSearch(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.PqFunctions
    val m = 8
    val emb = Tables.embeddings(spark, dir)
    val cent = graft.ops.Similarity.buildCentroids(emb, dim = 64, chunks = centroidChunks)
    val codebook = graft.ops.Similarity.collectCodebook(cent)
    val assigned = graft.ops.Similarity.assignToCentroids(
      emb.select("vec_id", "label", "embedding"), cent, Seq("vec_id"))
    val encoded = assigned.select(col("vec_id"), col("cluster"), col("label"),
      PqFunctions.pqCodes(col("embedding"), codebook, m).as("codes"))
    val tombstones = emb.filter(col("vec_id") % 9 === 0).select("vec_id")
    val searchable = encoded.filter(col("label") % 2 === 0)
      .join(tombstones, Seq("vec_id"), "left_anti")
    val qRows = assigned.filter(col("vec_id") % 50 === 0)
    val probes = graft.ops.Similarity.probeCentroids(
        qRows.select("vec_id", "embedding"), cent, Seq("vec_id"), nprobe = 2)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"),
        col("cluster").as("qc"))
    pqSearch(emb, searchable, probes, codebook, m, candK = 20,
      joinCond = col("cluster") === col("qc") && col("vec_id") =!= col("query_id"),
      qExact = Some(qRows.select(col("vec_id").as("query_id"),
        col("embedding").as("qv"))))
  }

  val s26Oracle: String = duckPqSearchSql(8,
    s"""WITH ${duckCentroidCtes(64, centroidChunks)}, live AS (
      |  SELECT vec_id, embedding FROM embeddings
      |  WHERE vec_id % 9 <> 0 AND label % 2 = 0
      |), ranked AS (
      |  SELECT e.vec_id, e.embedding, c.clabel,
      |    row_number() OVER (PARTITION BY e.vec_id
      |      ORDER BY ${duckCosOf("e.embedding", "c.cf")} DESC, c.clabel) AS rn
      |  FROM embeddings e, cent c
      |), assigned AS (
      |  SELECT vec_id, embedding, clabel FROM ranked WHERE rn = 1
      |), qp AS (
      |  SELECT vec_id AS query_id, clabel AS qc
      |  FROM ranked WHERE vec_id % 50 = 0 AND rn <= 2
      |), q AS (
      |  SELECT vec_id AS query_id, embedding AS qv
      |  FROM assigned WHERE vec_id % 50 = 0
      |)""".stripMargin,
    appPreJoins = "  JOIN assigned a ON a.vec_id = co.vec_id\n",
    appPostJoins = "\n  JOIN qp ON qp.query_id = q0.query_id AND qp.qc = a.clabel",
    corpusSrc = "live")

  // s27 — BINARY (sign-bit) quantization ANN, the last classic FAISS
  // compression layout the matrix lacked (IndexBinaryFlat): each 64-dim
  // float vector compresses 256× to 64 sign bits, candidates rank by
  // Hamming distance (two xor+bit_count integer ops — the cheapest
  // possible scan at 100 TB: 8 bytes/vector of memory traffic), and the
  // top-20 re-rank exactly by cosine. The signs pack into TWO 32-bit
  // words in a BIGINT pair rather than one 64-bit word because the
  // oracle engine raises on `1 << 63` overflow — the split costs one
  // extra xor and removes the sign-bit hazard in both engines. Packing
  // is a narrow map (codegen'd HOF over the array — no shuffle); the
  // candidate generation broadcasts the query signatures against one
  // corpus scan (s01's shape at 1/32 the bytes); Hamming is exact
  // integer arithmetic, so ranks are bit-identical cross-engine by
  // construction — no float-fold contract needed until the re-rank.
  def s27AnnBinary(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    def packWord(offset: Int): Column = expr(
      s"""aggregate(sequence(0, 31), CAST(0 AS BIGINT),
         |  (acc, i) -> acc + IF(element_at(embedding, i + $offset + 1) > CAST(0 AS FLOAT),
         |                       shiftleft(CAST(1 AS BIGINT), i), CAST(0 AS BIGINT)))""".stripMargin)
    val coded = emb.select(col("vec_id"),
      packWord(0).as("sig_lo"), packWord(32).as("sig_hi"))
    val q = coded.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("query_id"),
        col("sig_lo").as("q_lo"), col("sig_hi").as("q_hi"))
    val wA = Window.partitionBy("query_id")
      .orderBy(col("hamming"), col("vec_id"))
    val cand = coded.join(broadcast(q), col("vec_id") =!= col("query_id"))
      .withColumn("hamming",
        (bit_count(col("sig_lo").bitwiseXOR(col("q_lo"))) +
          bit_count(col("sig_hi").bitwiseXOR(col("q_hi")))).cast("int"))
      .select("query_id", "vec_id", "hamming")
      .withColumn("arank", row_number().over(wA))
      .filter(col("arank") <= 20)
      .select("query_id", "vec_id", "hamming")
    val qv = emb.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val wE = Window.partitionBy("query_id").orderBy(col("cos").desc, col("vec_id"))
    emb.join(broadcast(cand), "vec_id")
      .join(broadcast(qv), "query_id")
      .withColumn("cos", cosineSim(col("qv"), col("embedding")))
      .withColumn("rank", row_number().over(wE))
      .filter(col("rank") <= 5)
      .select(col("query_id"), col("rank"), col("vec_id").as("neighbor_id"),
        col("hamming"))
      .orderBy("query_id", "rank")
  }

  val s27Oracle: String =
    s"""WITH coded AS (
      |  SELECT vec_id,
      |    CAST(list_sum(list_transform(range(0, 32), i ->
      |      CASE WHEN embedding[i + 1] > 0 THEN (1::BIGINT << i) ELSE 0 END)) AS BIGINT) AS sig_lo,
      |    CAST(list_sum(list_transform(range(0, 32), i ->
      |      CASE WHEN embedding[i + 33] > 0 THEN (1::BIGINT << i) ELSE 0 END)) AS BIGINT) AS sig_hi
      |  FROM embeddings
      |), q AS (
      |  SELECT vec_id AS query_id, sig_lo AS q_lo, sig_hi AS q_hi
      |  FROM coded WHERE vec_id % 50 = 0
      |), scored AS (
      |  SELECT query_id, c.vec_id,
      |    CAST(bit_count(xor(c.sig_lo, q.q_lo)) + bit_count(xor(c.sig_hi, q.q_hi)) AS INT) AS hamming
      |  FROM coded c, q WHERE c.vec_id <> q.query_id
      |), cand AS (
      |  SELECT query_id, vec_id, hamming FROM (
      |    SELECT query_id, vec_id, hamming,
      |      row_number() OVER (PARTITION BY query_id ORDER BY hamming, vec_id) AS arank
      |    FROM scored)
      |  WHERE arank <= 20
      |), qv AS (
      |  SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id % 50 = 0
      |), rr AS (
      |  SELECT c.query_id, e.vec_id, c.hamming, ${duckCosOf("qv.qv", "e.embedding")} AS cos
      |  FROM cand c
      |  JOIN embeddings e ON e.vec_id = c.vec_id
      |  JOIN qv ON qv.query_id = c.query_id
      |)
      |SELECT query_id, rank, neighbor_id, hamming FROM (
      |  SELECT query_id, vec_id AS neighbor_id, hamming,
      |    CAST(row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id) AS INT) AS rank
      |  FROM rr)
      |WHERE rank <= 5
      |ORDER BY query_id, rank""".stripMargin

  // s28 — MAXIMAL MARGINAL RELEVANCE diversification (Carbonell &
  // Goldstein '98): re-rank each query's top-20 exact-cosine
  // candidates into 5 picks by greedily maximizing
  // 0.7·rel − 0.3·max_sim_to_already_picked — the de-duplicating
  // re-rank every RAG retrieval stack runs between ANN and the
  // context window. Greedy selection is inherently sequential in k,
  // so the plan unrolls the FIXED k=5 into 4 join+argmax stages over
  // the per-query candidate table (20 rows/query, localCheckpoint'd
  // once — ONE corpus scan total, constant plan depth, the s09
  // iteration lesson); the candidate×candidate sim table is bounded
  // at 380 rows/query and shuffles on query_id only. Both λ weights
  // are written as the literal doubles 0.7/0.3 in both engines (never
  // `1 − λ`, whose float result differs from the 0.3 literal); rel
  // and sim come from the shared ascending cosine fold, so scores are
  // bit-identical and the integer picks gate exactly.
  def s28MmrDiversify(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    val q = emb.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val wC = Window.partitionBy("query_id").orderBy(col("rel").desc, col("vec_id"))
    val cand = emb.join(broadcast(q), col("vec_id") =!= col("query_id"))
      .withColumn("rel", cosineSim(col("qv"), col("embedding")))
      .withColumn("crank", row_number().over(wC)).filter(col("crank") <= 20)
      .select("query_id", "vec_id", "rel", "embedding")
      .localCheckpoint()
    val pair = cand.as("a")
      .join(cand.as("b"), Seq("query_id"))
      .filter(col("a.vec_id") =!= col("b.vec_id"))
      .select(col("query_id"), col("a.vec_id").as("a_id"),
        col("b.vec_id").as("b_id"),
        cosineSim(col("a.embedding"), col("b.embedding")).as("sim"))
      .localCheckpoint()
    val candS = cand.select("query_id", "vec_id", "rel")
    var selected = candS
      .withColumn("rn", row_number().over(wC)).filter(col("rn") === 1)
      .select(col("query_id"), col("vec_id"), lit(1).as("pick"))
    for (k <- 2 to 5) {
      val remaining = candS.join(selected.select("query_id", "vec_id"),
        Seq("query_id", "vec_id"), "left_anti")
      val maxSim = pair
        .join(selected.select(col("query_id"), col("vec_id").as("b_id")),
          Seq("query_id", "b_id"))
        .groupBy(col("query_id"), col("a_id").as("vec_id"))
        .agg(max(col("sim")).as("max_sim"))
      val wS = Window.partitionBy("query_id")
        .orderBy(col("score").desc, col("vec_id"))
      val pick = remaining.join(maxSim, Seq("query_id", "vec_id"))
        .withColumn("score",
          lit(0.7) * col("rel") - lit(0.3) * col("max_sim"))
        .withColumn("rn", row_number().over(wS)).filter(col("rn") === 1)
        .select(col("query_id"), col("vec_id"), lit(k).as("pick"))
      selected = selected.unionByName(pick).localCheckpoint()
    }
    selected.select(col("query_id"), col("pick"),
        col("vec_id").as("picked_id"))
      .orderBy("query_id", "pick")
  }

  val s28Oracle: String = {
    val steps = (2 to 5).map { k =>
      s"""sel$k AS (
        |  SELECT query_id, vec_id, $k AS pick FROM (
        |    SELECT c.query_id, c.vec_id,
        |      row_number() OVER (PARTITION BY c.query_id
        |        ORDER BY CAST(0.7 AS DOUBLE) * c.rel
        |                 - CAST(0.3 AS DOUBLE) * m.max_sim DESC,
        |        c.vec_id) AS rn
        |    FROM cand c
        |    JOIN (SELECT p.query_id, p.a_id, MAX(p.sim) AS max_sim
        |          FROM pair p JOIN selu${k - 1} s
        |            ON s.query_id = p.query_id AND s.vec_id = p.b_id
        |          GROUP BY p.query_id, p.a_id) m
        |      ON m.query_id = c.query_id AND m.a_id = c.vec_id
        |    WHERE NOT EXISTS (SELECT 1 FROM selu${k - 1} s2
        |                      WHERE s2.query_id = c.query_id
        |                        AND s2.vec_id = c.vec_id)
        |  ) WHERE rn = 1
        |), selu$k AS (
        |  SELECT * FROM selu${k - 1} UNION ALL SELECT * FROM sel$k
        |)""".stripMargin
    }.mkString(", ")
    s"""WITH q AS (
      |  SELECT vec_id AS query_id, embedding AS qv FROM embeddings
      |  WHERE vec_id % 50 = 0
      |), cand AS (
      |  SELECT query_id, vec_id, rel, embedding FROM (
      |    SELECT query_id, e.vec_id, ${duckCosOf("q.qv", "e.embedding")} AS rel,
      |      e.embedding,
      |      row_number() OVER (PARTITION BY query_id
      |        ORDER BY ${duckCosOf("q.qv", "e.embedding")} DESC, e.vec_id) AS crank
      |    FROM embeddings e, q WHERE e.vec_id <> q.query_id)
      |  WHERE crank <= 20
      |), pair AS (
      |  SELECT a.query_id, a.vec_id AS a_id, b.vec_id AS b_id,
      |    ${duckCosOf("a.embedding", "b.embedding")} AS sim
      |  FROM cand a JOIN cand b ON a.query_id = b.query_id
      |    AND a.vec_id <> b.vec_id
      |), selu1 AS (
      |  SELECT query_id, vec_id, 1 AS pick FROM (
      |    SELECT query_id, vec_id,
      |      row_number() OVER (PARTITION BY query_id
      |        ORDER BY rel DESC, vec_id) AS rn
      |    FROM cand) WHERE rn = 1
      |), $steps
      |SELECT query_id, pick, vec_id AS picked_id
      |FROM selu5 ORDER BY query_id, pick""".stripMargin
  }

  // s29 — the ANN RECALL MATRIX: corpus-level recall@5 of three gated
  // index layouts (s02 hyperplane-LSH, s03 IVF nprobe=1, s27 binary
  // signs) against s01's exact top-5 in ONE table — the benchmark
  // report a vector-infra team regenerates whenever the corpus or a
  // quantizer changes, and the s19 per-query evaluation aggregated to
  // the fleet view. Engine and oracle both COMPOSE the already-gated
  // definitions (the DataFrames and oracle SQL of s01/s02/s03/s27
  // verbatim), so this gate can only break if the composition itself
  // does. Truth is localCheckpoint'd once; each method row is a
  // (query_id, neighbor_id) semi-join + global count — nothing new
  // moves at scale beyond the three candidate pipelines themselves.
  def s29RecallMatrix(spark: SparkSession, dir: String): DataFrame = {
    val truth = s01AnnBruteForce(spark, dir).filter(col("rank") <= 5)
      .select(col("query_id"), col("neighbor_id"))
      .localCheckpoint()
    def row(method: String, approx: DataFrame): DataFrame = {
      val h = truth.join(approx.select("query_id", "neighbor_id"),
        Seq("query_id", "neighbor_id")).agg(count(lit(1)).as("n_hits"))
      truth.agg(countDistinct(col("query_id")).as("n_queries"))
        .crossJoin(h)
        .select(lit(method).as("method"), col("n_queries"), col("n_hits"),
          // NULLIF: zero queries (empty corpus) → undefined recall, the
          // shared cross-engine null convention (q41's ANSI /0 lesson).
          (col("n_hits").cast("double")
            / nullif(col("n_queries").cast("double") * 5.0, lit(0.0))).as("recall5"))
    }
    row("a_lsh", s02AnnLsh(spark, dir))
      .unionByName(row("b_ivf", s03AnnIvf(spark, dir)))
      .unionByName(row("c_binary", s27AnnBinary(spark, dir)))
      .orderBy("method")
  }

  val s29Oracle: String = {
    def m(method: String, sql: String): String =
      s"""SELECT '$method' AS method,
        |  (SELECT COUNT(DISTINCT query_id) FROM truth) AS n_queries,
        |  (SELECT COUNT(*) FROM truth t
        |   JOIN (SELECT query_id, neighbor_id FROM ($sql)) a
        |     ON a.query_id = t.query_id AND a.neighbor_id = t.neighbor_id) AS n_hits""".stripMargin
    s"""WITH truth AS (
      |  SELECT query_id, neighbor_id FROM ($s01Oracle) WHERE rank <= 5
      |)
      |SELECT method, n_queries, n_hits,
      |  CAST(n_hits AS DOUBLE) / NULLIF(CAST(n_queries AS DOUBLE) * 5.0, 0) AS recall5
      |FROM (
      |${m("a_lsh", s02Oracle)}
      |UNION ALL
      |${m("b_ivf", s03Oracle)}
      |UNION ALL
      |${m("c_binary", s27Oracle)}
      |)
      |ORDER BY method""".stripMargin
  }

  // s30 — SHARD-PARALLEL SEARCH MERGE: the distributed-serving layout —
  // the corpus split over 4 shards (vec_id mod 4, the id-hash sharding
  // a fleet of index servers uses), exact top-5 PER SHARD, then a
  // global merge of the 20 shard survivors. Sharing s01's oracle IS
  // the theorem being gated: per-shard top-k ⊇ the global top-k's
  // members in that shard, so merge-of-shard-top-k == direct top-k,
  // exactly — the property that makes scatter-gather serving correct.
  // A merge that takes shard-rank instead of score, or drops a shard,
  // fails the gate. Plan: the shard id rides the same scan (no extra
  // shuffle); the merge window sees ≤ 20 rows/query.
  def s30ShardedSearch(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    val q = emb.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val wS = Window.partitionBy("query_id", "shard")
      .orderBy(col("cos").desc, col("vec_id"))
    val perShard = emb.withColumn("shard", pmod(col("vec_id"), lit(4)))
      .join(broadcast(q), col("vec_id") =!= col("query_id"))
      .withColumn("cos", cosineSim(col("qv"), col("embedding")))
      .withColumn("srank", row_number().over(wS)).filter(col("srank") <= 5)
      .select("query_id", "vec_id", "cos")
    val wG = Window.partitionBy("query_id").orderBy(col("cos").desc, col("vec_id"))
    perShard.withColumn("rank", row_number().over(wG).cast("int"))
      .filter(col("rank") <= 5)
      .select(col("query_id"), col("rank"), col("vec_id").as("neighbor_id"))
      .orderBy("query_id", "rank")
  }

  /** s30 shares s01's oracle restricted to the merge depth — see the
    * scatter-gather theorem in the s30 doc comment. */
  val s30Oracle: String =
    s"""SELECT query_id, rank, neighbor_id FROM ($s01Oracle)
      |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin

  // s31 — CENTROID DRIFT monitor: the index-staleness metric a vector
  // platform watches to decide when to RETRAIN the coarse quantizer —
  // per-label L2 distance between centroids trained on the day-1 half
  // (vec_id parity, cdc20's split discipline) and on the full corpus,
  // floor-scaled to integer micros for the exact gate. Both centroid
  // builds are the engine's bounded deterministic fold
  // (buildCentroids); the distance is one zip-fold in doubles — the
  // same ascending-fold contract every cosine in this file shares.
  // Plan: two bounded centroid builds (broadcast-sized outputs) and a
  // |labels|-row join — nothing corpus-sized moves.
  def s31CentroidDrift(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    val cA = graft.ops.Similarity
      .buildCentroids(emb.filter(col("vec_id") % 2 === 0), dim = 64,
        chunks = centroidChunks)
      .select(col("clabel"), col("cf").as("cfa"))
    val cB = graft.ops.Similarity
      .buildCentroids(emb, dim = 64, chunks = centroidChunks)
      .select(col("clabel"), col("cf").as("cfb"))
    val counts = emb.groupBy(col("label").as("clabel"))
      .agg(count(lit(1)).as("n_full"),
        sum(when(col("vec_id") % 2 === 0, 1L).otherwise(0L)).as("n_half"))
    cA.join(cB, Seq("clabel")).join(counts, Seq("clabel"))
      .withColumn("drift_micro", floor(expr(
        """sqrt(aggregate(zip_with(cfa, cfb,
          |  (x, y) -> (CAST(x AS DOUBLE) - CAST(y AS DOUBLE))
          |          * (CAST(x AS DOUBLE) - CAST(y AS DOUBLE))),
          |  CAST(0 AS DOUBLE), (acc, v) -> acc + v)) * 1000000""".stripMargin))
        .cast("long"))
      .select("clabel", "n_half", "n_full", "drift_micro")
      .orderBy("clabel")
  }

  val s31Oracle: String =
    s"""WITH half AS (
      |  SELECT vec_id, label, embedding FROM embeddings WHERE vec_id % 2 = 0
      |), ${duckCentroidCtes(64, centroidChunks, src = "half", sfx = "_a")},
      |${duckCentroidCtes(64, centroidChunks, sfx = "_b")},
      |counts AS (
      |  SELECT label AS clabel, COUNT(*) AS n_full,
      |    CAST(SUM(CASE WHEN vec_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_half
      |  FROM embeddings GROUP BY label
      |)
      |SELECT a.clabel, c.n_half, c.n_full,
      |  CAST(floor(sqrt(list_sum(list_transform(list_zip(a.cf, b.cf),
      |    x -> (CAST(x[1] AS DOUBLE) - CAST(x[2] AS DOUBLE))
      |       * (CAST(x[1] AS DOUBLE) - CAST(x[2] AS DOUBLE))))) * 1000000) AS BIGINT) AS drift_micro
      |FROM cent_a a JOIN cent_b b ON a.clabel = b.clabel
      |JOIN counts c ON c.clabel = a.clabel
      |ORDER BY a.clabel""".stripMargin

  // s32 — DISTRIBUTED PCA TOP COMPONENT by power iteration: 3 rounds
  // of v ← normalize(Σᵢ xᵢ·(xᵢ·v)) over the corpus — the dominant
  // direction an embedding-quality audit reads (a collapsing encoder
  // shows one direction absorbing the variance), and the projection
  // axis cheap whitening/rank-reduction uses. The distributed float
  // hazard — Σᵢ xᵢwᵢ has no canonical order — is closed by the SAME
  // bounded two-level ordered fold buildCentroids uses (chunk by
  // vec_id, ascending-id level-1 kernel fold, ascending-chunk level-2
  // fold): the sum is deterministic at any parallelism. Between
  // rounds the 64-dim accumulator COLLECTS (one guarded row — the s09
  // materialization discipline) and re-lifts as a literal, so plan
  // depth is constant and the corpus scans once per round; the driver
  // normalization is the same ascending fold + IEEE sqrt the oracle's
  // list_sum replays. Output: per-label projection extremes onto the
  // converged axis, floor-scaled to integer micros. Uncentered
  // variant (the mean-removal composition is buildCentroids + one
  // VecSub — documented, not duplicated here). A zero-norm round
  // (empty corpus) keeps the previous axis — both engines then emit
  // zero rows, so the convention never reaches the gate.
  /** Dot of the `embedding` column with a literal axis — ascending zip
    * fold in doubles (the oracle's list_sum shape). */
  private def dotAxis(v: Seq[Double]): Column = {
    val vlit = array(v.map(lit): _*)
    aggregate(zip_with(col("embedding"), vlit,
      (x: Column, p: Column) => x.cast("double") * p),
      lit(0.0), (a: Column, b: Column) => a + b)
  }

  /** The 3-round power-iteration axis (see s32's doc comment) — shared
    * by s32 (projection card) and s33 (whitened residual search). */
  private def powerAxis(spark: SparkSession, dir: String): Seq[Double] = {
    val dim = 64
    val emb = Tables.embeddings(spark, dir)
    var v: Seq[Double] = Seq.fill(dim)(0.125) // exact 1/8 — unit start
    for (_ <- 1 to 3) {
      val scaled = emb
        .withColumn("w", dotAxis(v))
        .select(col("vec_id"),
          transform(col("embedding"),
            (x: Column) => x.cast("double") * col("w")).as("emb"))
      val level1 = scaled
        .groupBy((col("vec_id") % centroidChunks).as("_chunk"))
        .agg(array_sort(collect_list(struct(col("vec_id").as("id"),
          col("emb")))).as("vs"))
        .select(col("_chunk").as("chunk"),
          graft.functions.FoldFunctions.vecFieldSum(col("vs"), "emb", dim)
            .as("psum"))
      val sRows = level1
        .agg(array_sort(collect_list(struct(col("chunk"), col("psum"))))
          .as("ps"))
        .select(graft.functions.FoldFunctions.vecFieldSum(col("ps"), "psum", dim)
          .as("s"))
        .collect()
      require(sRows.length == 1, s"power-iteration fold returned ${sRows.length} rows")
      val s = sRows(0).getSeq[Double](0)
      val norm = math.sqrt(s.foldLeft(0.0)((a, x) => a + x * x))
      if (norm > 0) v = s.map(_ / norm)
    }
    v
  }

  def s32PowerIteration(spark: SparkSession, dir: String): DataFrame = {
    val v = powerAxis(spark, dir)
    Tables.embeddings(spark, dir).withColumn("p", dotAxis(v))
      .groupBy(col("label").as("clabel"))
      .agg(count(lit(1)).as("n"),
        floor(min(col("p")) * 1000000).cast("long").as("proj_min_micro"),
        floor(max(col("p")) * 1000000).cast("long").as("proj_max_micro"))
      .orderBy("clabel")
  }

  /** v0..v3 power-iteration CTE chain — shared by s32 and s33. */
  private val duckPowerCtes: String = {
    def round(k: Int): String =
      s"""w$k AS (
        |  SELECT e.vec_id,
        |    list_transform(e.embedding, x -> CAST(x AS DOUBLE) *
        |      list_sum(list_transform(list_zip(e.embedding, v.v),
        |        z -> CAST(z[1] AS DOUBLE) * z[2]))) AS emb
        |  FROM embeddings e, v${k - 1} v
        |), cp$k AS (
        |  SELECT vec_id % $centroidChunks AS chunk,
        |    list(struct_pack(id := vec_id, emb := emb) ORDER BY vec_id) AS vs
        |  FROM w$k GROUP BY vec_id % $centroidChunks
        |), ps$k AS (
        |  SELECT chunk, list_transform(range(1, 65),
        |    d -> list_sum(list_transform(vs, t -> t.emb[d]))) AS psum
        |  FROM cp$k
        |), s$k AS (
        |  SELECT list_transform(range(1, 65),
        |    d -> list_sum(list_transform(ps, p -> p.psum[d]))) AS s
        |  FROM (SELECT list(struct_pack(chunk := chunk, psum := psum)
        |                    ORDER BY chunk) AS ps FROM ps$k)
        |), v$k AS (
        |  SELECT list_transform(s,
        |    x -> x / sqrt(list_sum(list_transform(s, y -> y * y)))) AS v
        |  FROM s$k
        |)""".stripMargin
    s"""v0 AS (
      |  SELECT list_transform(range(1, 65), i -> CAST(0.125 AS DOUBLE)) AS v
      |), ${round(1)}, ${round(2)}, ${round(3)}""".stripMargin
  }

  val s32Oracle: String =
    s"""WITH $duckPowerCtes,
      |proj AS (
      |  SELECT e.label AS clabel,
      |    list_sum(list_transform(list_zip(e.embedding, v.v),
      |      z -> CAST(z[1] AS DOUBLE) * z[2])) AS p
      |  FROM embeddings e, v3 v
      |)
      |SELECT clabel, COUNT(*) AS n,
      |  CAST(floor(MIN(p) * 1000000) AS BIGINT) AS proj_min_micro,
      |  CAST(floor(MAX(p) * 1000000) AS BIGINT) AS proj_max_micro
      |FROM proj GROUP BY clabel ORDER BY clabel""".stripMargin

  // s33 — PCA-WHITENED residual search: project OUT the dominant
  // direction (s32's converged axis) and search what remains —
  // r = x − (x·v)v per vector, top-3 cosine over residuals. The
  // anisotropy fix retrieval stacks apply when one direction (length,
  // frequency, layout) swamps cosine and every neighbor list collapses
  // onto it. The residual rounds to FLOAT per dimension through one
  // double-arithmetic dag (subtract after the w·v[d] product, then one
  // cast) so both engines hold identical bits; the axis enters the
  // plan as a literal (constant depth — the s32 discipline), and the
  // search is s01's broadcast-query single-scan shape over residuals.
  def s33PcaResidualSearch(spark: SparkSession, dir: String): DataFrame = {
    val v = powerAxis(spark, dir)
    val vlit = array(v.map(lit): _*)
    val emb = Tables.embeddings(spark, dir)
    val res = emb.withColumn("w", dotAxis(v))
      .select(col("vec_id"),
        zip_with(col("embedding"), vlit,
          (x: Column, p: Column) =>
            (x.cast("double") - col("w") * p).cast("float")).as("r"))
    val q = res.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("query_id"), col("r").as("qr"))
    val wE = Window.partitionBy("query_id").orderBy(col("cos").desc, col("vec_id"))
    res.join(broadcast(q), col("vec_id") =!= col("query_id"))
      .withColumn("cos", cosineSim(col("qr"), col("r")))
      .withColumn("rank", row_number().over(wE).cast("int"))
      .filter(col("rank") <= 3)
      .select(col("query_id"), col("rank"), col("vec_id").as("neighbor_id"))
      .orderBy("query_id", "rank")
  }

  val s33Oracle: String =
    s"""WITH $duckPowerCtes,
      |rw AS (
      |  SELECT e.vec_id, e.embedding, v.v,
      |    list_sum(list_transform(list_zip(e.embedding, v.v),
      |      z -> CAST(z[1] AS DOUBLE) * z[2])) AS w
      |  FROM embeddings e, v3 v
      |), res AS (
      |  SELECT vec_id, list_transform(range(1, 65),
      |    d -> CAST(CAST(embedding[d] AS DOUBLE) - w * v[d] AS FLOAT)) AS r
      |  FROM rw
      |), q AS (
      |  SELECT vec_id AS query_id, r AS qr FROM res WHERE vec_id % 50 = 0
      |), scored AS (
      |  SELECT query_id, c.vec_id, ${duckCosOf("q.qr", "c.r")} AS cos
      |  FROM res c, q WHERE c.vec_id <> q.query_id
      |)
      |SELECT query_id, rank, neighbor_id FROM (
      |  SELECT query_id, vec_id AS neighbor_id,
      |    CAST(row_number() OVER (PARTITION BY query_id
      |      ORDER BY cos DESC, vec_id) AS INT) AS rank
      |  FROM scored)
      |WHERE rank <= 3
      |ORDER BY query_id, rank""".stripMargin

  // s34 — GRAPH-BASED ANN SEARCH (the DiskANN/HNSW family's search
  // pattern over the s25 kNN graph, made deterministic and relational):
  // entry points = PER-QUERY IVF SEEDS — the query's exact top-3 within
  // its probed clusters (s04's probe + s03's candidate cut, the coarse
  // quantizer every DiskANN deployment seeds from) — candidates = the
  // closed 1-hop out-neighborhood of the seeds in the directed top-3
  // kNN edge list plus the hop-2 expansion of its top-[[servedBeam]]
  // nodes by exact cosine (s50's priced beam), finished with the exact
  // re-rank. Best-first beam search is inherently sequential; the
  // beam-limited bounded-hop ball is its deterministic, relational
  // stand-in — same index (the kNN graph), same entry discipline, the
  // same score-then-prune frontier rule, and the expansion is two
  // vertex-keyed equi-joins plus one bounded window instead of a
  // data-dependent loop, so the whole search stays one declarative
  // plan. (r9 verdict: the earlier SHARED
  // per-cluster prototype entry measured ~3% recall@3 on s38's truth
  // join — a fixed entry two hops from nowhere; per-query seeds lift
  // the ball to the query's own neighborhood. r10 verdict: the served
  // configuration is now the MEASURED-BEST one — bridged edges +
  // nprobe = [[servedNprobe]], promoted from s40/s41's calibration
  // curves; recall measured in s38 and recorded in PLANS.md.) The gate
  // pins the seed choice, the exact candidate-set size, and the final
  // ranking. At scale: the edge list shuffles on the vertex key (id_a)
  // and is probed twice; seeding is a cluster-keyed equi-join (the s03
  // candidate shape); queries broadcast; the re-rank shuffles
  // (query_id, cand) only — query vectors never ride the candidate
  // shuffle.
  def s34GraphSearch(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    val cent = graft.ops.Similarity.buildCentroids(emb, dim = 64, chunks = centroidChunks)
    val assigned = graft.ops.Similarity.assignToCentroids(
      emb.select("vec_id", "embedding"), cent, Seq("vec_id"))
    val edges = knnEdges(assigned).select("id_a", "id_b")
      .unionByName(bridgeEdges(emb, cent, assigned)) // served default
      .localCheckpoint() // probed at hop 1 and hop 2 — build the graph once
    val qRows = emb.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val probes = graft.ops.Similarity.probeCentroids(
      qRows, cent, Seq("query_id"), nprobe = servedNprobe, embCol = "qv")
    val seeds = ivfSeeds(probes, assigned).localCheckpoint() // ≤3 rows/query
    graphBallSearch(edges, qRows, seeds, emb)
  }

  /** Per-query IVF entry seeds: the query's exact top-`k` neighbors
    * within its PROBED clusters (s04's nprobe=2 probe + s03's candidate
    * cut). `probes` carries (query_id, qv, cluster) — one row per
    * (query, probed cluster); `members` carries (cluster, vec_id,
    * embedding). Cluster-keyed equi-join — the s03 shape, never
    * all-pairs. Output: (query_id, seed, rk), rk over BOTH probed
    * clusters' members. */
  private def ivfSeeds(probes: DataFrame, members: DataFrame, k: Int = 3): DataFrame = {
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("seed"))
    probes.join(members.select(col("cluster"), col("vec_id").as("seed"),
        col("embedding").as("sv")), Seq("cluster"))
      .filter(col("seed") =!= col("query_id"))
      .withColumn("cos", cosineSim(col("qv"), col("sv")))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select("query_id", "seed", "rk")
  }

  /** The s34/s36 shared search body: closed 2-hop ball around each
    * query's IVF seed set over the directed kNN `edges`, exact cosine
    * re-rank top-3. `qRows` carries (query_id, qv) — one row per query;
    * `seeds` carries (query_id, seed, rk) — see [[ivfSeeds]]. `entry_id`
    * in the output is the rank-1 seed. One definition so the inline and
    * persisted-index routes cannot drift. */
  /** The served BEAM width: only the top-`servedBeam` hop-1 frontier
    * nodes (by exact cosine to the query) expand to hop 2. Promoted from
    * s50's measured curve (sf0.1: recall@3 identical to the unbounded
    * 2-hop ball — 633333 ppm — at 1195 vs 1910 candidates and 320 vs 536
    * hop-2 expansions; sf0.01 identical recall down to beam 2). */
  private val servedBeam = 8

  /** The served candidate ball around each query's seed set — shared by
    * the plain search ([[graphBallSearch]]), the filtered one (s49), and
    * the persisted route (s36) so the expansion cannot drift: the FULL
    * closed 1-hop frontier (every visited node is a candidate — its
    * exact-cosine score is computed for the re-rank anyway, and that
    * score IS the beam selection), of which only the top-[[servedBeam]]
    * expand to hop 2. */
  private def hopBall(edges: DataFrame, seeds: DataFrame,
      emb: DataFrame, qRows: DataFrame, beam: Int = servedBeam): DataFrame = {
    val h1 = seeds.select(col("query_id"), col("seed").as("id_a"))
      .join(edges, Seq("id_a"))
      .select(col("query_id"), col("id_b").as("cand"))
    val ball1 = seeds.select(col("query_id"), col("seed").as("cand"))
      .unionByName(h1).distinct()
      .filter(col("cand") =!= col("query_id"))
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("cand"))
    val scored1 = ball1
      .join(emb.select(col("vec_id").as("cand"), col("embedding")), Seq("cand"))
      .join(broadcast(qRows.select("query_id", "qv")), Seq("query_id"))
      .withColumn("cos", cosineSim(col("qv"), col("embedding")))
      .withColumn("rk", row_number().over(w))
      .select("query_id", "cand", "rk")
    val h2 = scored1.filter(col("rk") <= beam)
      .withColumnRenamed("cand", "id_a")
      .join(edges, Seq("id_a"))
      .select(col("query_id"), col("id_b").as("cand"))
    scored1.select("query_id", "cand").unionByName(h2)
      .distinct()
      .filter(col("cand") =!= col("query_id"))
  }

  private def graphBallSearch(edges: DataFrame, qRows: DataFrame,
      seeds: DataFrame, emb: DataFrame): DataFrame = {
    val q = qRows.join(seeds.filter(col("rk") === 1)
        .select(col("query_id"), col("seed").as("entry_id")), Seq("query_id"))
      .select("query_id", "qv", "entry_id")
    val ball = hopBall(edges, seeds, emb, qRows)
    val nc = ball.groupBy("query_id").agg(count(lit(1)).as("n_cand"))
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("cand"))
    ball
      .join(emb.select(col("vec_id").as("cand"), col("embedding")), Seq("cand"))
      .join(broadcast(q), Seq("query_id"))
      .withColumn("cos", cosineSim(col("qv"), col("embedding")))
      .withColumn("rank", row_number().over(w).cast("int"))
      .filter(col("rank") <= 3)
      .join(broadcast(nc), Seq("query_id"))
      .select(col("query_id"), col("entry_id"), col("n_cand"), col("rank"),
        col("cand").as("neighbor_id"))
      .orderBy("query_id", "rank")
  }

  // s36 — the GRAPH INDEX PERSISTED (DiskANN's disk story for the s34
  // search): the three index artifacts — the directed kNN edge list,
  // the coarse quantizer (centroid table, the seed router), and the
  // vec→cluster assignment — are written to parquet once and the
  // search re-derives EVERYTHING from the read-back (no centroid
  // recompute, no graph rebuild: a pure graph-index lookup, which is
  // the point of a persisted navigable graph). Shares s34's oracle — a
  // mismatch with a green s34 isolates persistence: long/float
  // round-trips, partition-column typing, or build/search drift. Raw
  // vectors for the IVF seeding and the exact re-rank come from the
  // corpus table, as on-disk graph indexes do (the graph is the index;
  // vectors stay in their own store).
  def s36GraphPersisted(spark: SparkSession, dir: String): DataFrame = {
    val root = CdcQueries.tmpFixtureDir("graft_s36_", dir)
    root.mkdirs()
    val emb = Tables.embeddings(spark, dir)
    // ---- build (once): s34's exact index structures ----
    val cent = graft.ops.Similarity.buildCentroids(emb, dim = 64, chunks = centroidChunks)
    val assigned = graft.ops.Similarity.assignToCentroids(
      emb.select("vec_id", "embedding"), cent, Seq("vec_id"))
    knnEdges(assigned).select("id_a", "id_b")
      .unionByName(bridgeEdges(emb, cent, assigned)) // served default
      .write.mode("overwrite").parquet(new java.io.File(root, "edges").getPath)
    assigned.select("vec_id", "cluster")
      .write.mode("overwrite").parquet(new java.io.File(root, "assign").getPath)
    cent.write.mode("overwrite").parquet(new java.io.File(root, "cent").getPath)
    // ---- search (from the persisted artifacts + the vector store) ----
    val edgesR = spark.read.parquet(new java.io.File(root, "edges").getPath)
    val assignR = spark.read.parquet(new java.io.File(root, "assign").getPath)
    val centR = spark.read.parquet(new java.io.File(root, "cent").getPath)
    val members = assignR.join(emb.select("vec_id", "embedding"), Seq("vec_id"))
      .select("cluster", "vec_id", "embedding")
    val qRows = emb.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val probes = graft.ops.Similarity.probeCentroids(
      qRows, centR, Seq("query_id"), nprobe = servedNprobe, embCol = "qv")
    val seeds = ivfSeeds(probes, members).localCheckpoint()
    graphBallSearch(edgesR, qRows, seeds, emb)
  }

  /** The SERVED graph index (bridged edges + nprobe = [[servedNprobe]]
    * + beam = [[servedBeam]]) as oracle CTE text — coarse quantizer,
    * assignment, intra + bridge edges, query seeds, the scored hop-1
    * frontier, and the beam-limited 2-hop ball — shared by s34/s36's
    * oracle, s49's filtered variant, and s50's sweep so the
    * served-index SQL cannot drift between the gates. */
  private val duckServedGraphCtes: String =
    s"""${duckCentroidCtes(64, centroidChunks)}, assigned AS MATERIALIZED (
      |  SELECT vec_id, embedding, clabel FROM (
      |    SELECT e.vec_id, e.embedding, c.clabel,
      |      row_number() OVER (PARTITION BY e.vec_id
      |        ORDER BY ${duckCosOf("e.embedding", "c.cf")} DESC, c.clabel) AS rn
      |    FROM embeddings e, cent c)
      |  WHERE rn = 1
      |), intra AS MATERIALIZED (
      |  SELECT id_a, id_b FROM (
      |    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
      |      row_number() OVER (PARTITION BY a.clabel, a.vec_id
      |        ORDER BY ${duckCosOf("a.embedding", "b.embedding")} DESC, b.vec_id) AS rk
      |    FROM assigned a JOIN assigned b
      |      ON a.clabel = b.clabel AND a.vec_id <> b.vec_id)
      |  WHERE rk <= 3
      |), p2 AS MATERIALIZED (
      |  SELECT vec_id, embedding, clabel FROM (
      |    SELECT e.vec_id, e.embedding, c.clabel,
      |      row_number() OVER (PARTITION BY e.vec_id
      |        ORDER BY ${duckCosOf("e.embedding", "c.cf")} DESC, c.clabel) AS rn
      |    FROM embeddings e, cent c)
      |  WHERE rn = 2
      |), bridge AS MATERIALIZED (
      |  SELECT id_a, id_b FROM (
      |    SELECT p.vec_id AS id_a, b.vec_id AS id_b,
      |      row_number() OVER (PARTITION BY p.vec_id
      |        ORDER BY ${duckCosOf("p.embedding", "b.embedding")} DESC, b.vec_id) AS rk
      |    FROM p2 p JOIN assigned b ON b.clabel = p.clabel)
      |  WHERE rk = 1
      |), edges AS MATERIALIZED (
      |  SELECT id_a, id_b FROM intra
      |  UNION ALL
      |  SELECT id_a, id_b FROM bridge
      |), q0 AS MATERIALIZED (
      |  SELECT vec_id AS query_id, embedding AS qv
      |  FROM embeddings WHERE vec_id % 50 = 0
      |), qp AS MATERIALIZED (
      |  SELECT query_id, qv, clabel FROM (
      |    SELECT q.query_id, q.qv, c.clabel,
      |      row_number() OVER (PARTITION BY q.query_id
      |        ORDER BY ${duckCosOf("q.qv", "c.cf")} DESC, c.clabel) AS rn
      |    FROM q0 q, cent c)
      |  WHERE rn <= 4
      |), seeds AS MATERIALIZED (
      |  SELECT query_id, seed, rk FROM (
      |    SELECT p.query_id, a.vec_id AS seed,
      |      row_number() OVER (PARTITION BY p.query_id
      |        ORDER BY ${duckCosOf("p.qv", "a.embedding")} DESC, a.vec_id) AS rk
      |    FROM qp p JOIN assigned a
      |      ON a.clabel = p.clabel AND a.vec_id <> p.query_id)
      |  WHERE rk <= 3
      |), q AS MATERIALIZED (
      |  SELECT q0.query_id, q0.qv, s.seed AS entry_id
      |  FROM q0 JOIN seeds s ON s.query_id = q0.query_id AND s.rk = 1
      |), ball1 AS MATERIALIZED (
      |  SELECT DISTINCT query_id, cand FROM (
      |    SELECT query_id, seed AS cand FROM seeds
      |    UNION ALL
      |    SELECT s.query_id, e.id_b FROM seeds s JOIN edges e ON e.id_a = s.seed)
      |  WHERE cand <> query_id
      |), scored1 AS MATERIALIZED (
      |  SELECT b.query_id, b.cand,
      |    row_number() OVER (PARTITION BY b.query_id
      |      ORDER BY ${duckCosOf("q0.qv", "e.embedding")} DESC, b.cand) AS rk
      |  FROM ball1 b
      |  JOIN q0 ON q0.query_id = b.query_id
      |  JOIN embeddings e ON e.vec_id = b.cand
      |), ball AS MATERIALIZED (
      |  SELECT DISTINCT query_id, cand FROM (
      |    SELECT query_id, cand FROM scored1
      |    UNION ALL
      |    SELECT s.query_id, e.id_b FROM scored1 s
      |    JOIN edges e ON e.id_a = s.cand WHERE s.rk <= $servedBeam)
      |  WHERE cand <> query_id
      |), nc AS (
      |  SELECT query_id, COUNT(*) AS n_cand FROM ball GROUP BY query_id
      |)""".stripMargin

  val s34Oracle: String =
    s"""WITH $duckServedGraphCtes, scored AS (
      |  SELECT b.query_id, q.entry_id, b.cand,
      |    ${duckCosOf("q.qv", "e.embedding")} AS cos
      |  FROM ball b
      |  JOIN q ON q.query_id = b.query_id
      |  JOIN embeddings e ON e.vec_id = b.cand
      |)
      |SELECT s.query_id, s.entry_id, nc.n_cand, s.rank, s.neighbor_id FROM (
      |  SELECT query_id, entry_id, cand AS neighbor_id,
      |    CAST(row_number() OVER (PARTITION BY query_id
      |      ORDER BY cos DESC, cand) AS INT) AS rank
      |  FROM scored) s
      |JOIN nc ON nc.query_id = s.query_id
      |WHERE s.rank <= 3
      |ORDER BY s.query_id, s.rank""".stripMargin

  // s49 — ATTRIBUTE-FILTERED search over the SERVED graph index (the
  // s17 question — "nearest neighbors WHERE label matches" — answered
  // by the graph index instead of the IVF list): the ball expands over
  // the UNfiltered bridged graph (filtering edges would disconnect it —
  // the known failure mode of pre-filtered navigable graphs at low
  // selectivity), then candidates POST-filter on the predicate before
  // the exact re-rank — the standard post-filtering strategy, priced
  // honestly: n_cand vs n_allowed on every row is the selectivity tax
  // (top-k among allowed comes from a ball sized for unfiltered top-k,
  // so low selectivity starves recall — the dial a deployment reads
  // before choosing post-filter vs a per-predicate index). Same label
  // predicate as s17 (label % 2 = 0), same served index as s34 (shared
  // hopBall + CTE text), integer/id-only output. A query whose ball
  // holds NO allowed candidate emits no rows (both engines — the
  // honest post-filter outcome; production either widens the ball or
  // falls back to the s17 per-predicate index for such queries).
  def s49GraphFiltered(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    val cent = graft.ops.Similarity.buildCentroids(emb, dim = 64, chunks = centroidChunks)
    val assigned = graft.ops.Similarity.assignToCentroids(
      emb.select("vec_id", "embedding"), cent, Seq("vec_id"))
    val edges = knnEdges(assigned).select("id_a", "id_b")
      .unionByName(bridgeEdges(emb, cent, assigned)) // served default
      .localCheckpoint()
    val qRows = emb.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val probes = graft.ops.Similarity.probeCentroids(
      qRows, cent, Seq("query_id"), nprobe = servedNprobe, embCol = "qv")
    val seeds = ivfSeeds(probes, assigned).localCheckpoint()
    val ball = hopBall(edges, seeds, emb, qRows)
      .localCheckpoint() // counted + filtered
    val nc = ball.groupBy("query_id").agg(count(lit(1)).as("n_cand"))
    val allowed = ball.join(
      emb.filter(col("label") % 2 === 0)
        .select(col("vec_id").as("cand"), col("label"), col("embedding")),
      Seq("cand"))
    val na = allowed.groupBy("query_id").agg(count(lit(1)).as("n_allowed"))
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("cand"))
    allowed.join(broadcast(qRows), Seq("query_id"))
      .withColumn("cos", cosineSim(col("qv"), col("embedding")))
      .withColumn("rank", row_number().over(w).cast("int"))
      .filter(col("rank") <= 3)
      .join(broadcast(nc), Seq("query_id"))
      .join(broadcast(na), Seq("query_id"))
      .select(col("query_id"), col("n_cand"), col("n_allowed"), col("rank"),
        col("cand").as("neighbor_id"),
        col("label").cast("long").as("neighbor_label"))
      .orderBy("query_id", "rank")
  }

  val s49Oracle: String =
    s"""WITH $duckServedGraphCtes, allowed AS MATERIALIZED (
      |  SELECT b.query_id, b.cand, e.label, e.embedding
      |  FROM ball b JOIN embeddings e
      |    ON e.vec_id = b.cand AND e.label % 2 = 0
      |), na AS (
      |  SELECT query_id, COUNT(*) AS n_allowed FROM allowed GROUP BY query_id
      |), scored AS (
      |  SELECT a.query_id, a.cand, a.label,
      |    ${duckCosOf("q0.qv", "a.embedding")} AS cos
      |  FROM allowed a JOIN q0 ON q0.query_id = a.query_id
      |)
      |SELECT s.query_id, nc.n_cand, na.n_allowed, s.rank, s.neighbor_id,
      |  s.neighbor_label
      |FROM (
      |  SELECT query_id, cand AS neighbor_id,
      |    CAST(label AS BIGINT) AS neighbor_label,
      |    CAST(row_number() OVER (PARTITION BY query_id
      |      ORDER BY cos DESC, cand) AS INT) AS rank
      |  FROM scored) s
      |JOIN nc ON nc.query_id = s.query_id
      |JOIN na ON na.query_id = s.query_id
      |WHERE s.rank <= 3
      |ORDER BY s.query_id, s.rank""".stripMargin

  // s50 — BEAM-WIDTH pricing for the served graph search (the last
  // unpriced dial after s40's nprobe and s41's bridge curves): the
  // hop-ball expands its ENTIRE hop-1 frontier; a best-first beam
  // search expands only the top-B frontier nodes by exact distance to
  // the query. This table prices B: all hop-1 nodes stay CANDIDATES
  // (they were visited and scored anyway — that score IS the beam
  // selection), but only the top-B expand to hop 2. Per B ∈
  // {2, 4, 8, unbounded-sentinel}: expansion count (the cost side —
  // hop-2 edge probes are B per query instead of |frontier|), candidate
  // mass, and recall@3 against s38's exact truth join. The unbounded
  // arm reproduces the pre-beam 2-hop ball, anchoring the curve to the
  // round-11 served config. MEASURED (sf0.1, PLANS.md): beam = 8
  // matches the unbounded ball's recall exactly (633333 ppm, 76 hits)
  // at 1195 vs 1910 candidates and 320 vs 536 hop-2 edge probes;
  // beam = 4 drops one hit. The curve therefore PROMOTED beam = 8 as
  // the served default ([[servedBeam]], consumed by [[hopBall]] and
  // the shared oracle CTEs) — this gate remains the pricing
  // instrument, its beam-8 arm now gating the served ball. Plan: index
  // subtrees once (edges/seeds/truth localCheckpoint), the hop-1
  // frontier scored ONCE and sliced per arm, per-arm aggregates 1-row
  // crossJoined folds (the s40 shape).
  def s50BeamSweep(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    val cent = graft.ops.Similarity.buildCentroids(emb, dim = 64, chunks = centroidChunks)
    val assigned = graft.ops.Similarity.assignToCentroids(
      emb.select("vec_id", "embedding"), cent, Seq("vec_id"))
    val edges = knnEdges(assigned).select("id_a", "id_b")
      .unionByName(bridgeEdges(emb, cent, assigned)) // served default
      .localCheckpoint()
    val qRows = emb.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
      .localCheckpoint()
    val probes = graft.ops.Similarity.probeCentroids(
      qRows, cent, Seq("query_id"), nprobe = servedNprobe, embCol = "qv")
    val seeds = ivfSeeds(probes, assigned).localCheckpoint()
    val truth = graft.ops.Similarity.cosineTopK(emb, qRows, 3)
      .select(col("query_id"), col("neighbor_id").as("cand"))
      .localCheckpoint()
    val h1 = seeds.select(col("query_id"), col("seed").as("id_a"))
      .join(edges, Seq("id_a"))
      .select(col("query_id"), col("id_b").as("cand"))
    val ball1 = seeds.select(col("query_id"), col("seed").as("cand"))
      .unionByName(h1).distinct()
      .filter(col("cand") =!= col("query_id"))
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("cand"))
    val scored1 = ball1
      .join(emb.select(col("vec_id").as("cand"), col("embedding")), Seq("cand"))
      .join(broadcast(qRows), Seq("query_id"))
      .withColumn("cos", cosineSim(col("qv"), col("embedding")))
      .withColumn("rk", row_number().over(w))
      .select("query_id", "cand", "rk")
      .localCheckpoint() // every beam arm slices it
    val nq = qRows.agg(count(lit(1)).as("n_queries"))
    val arms = Seq(2, 4, 8, 1000000).map { b =>
      val beam = scored1.filter(col("rk") <= b).select("query_id", "cand")
      val h2 = beam.withColumnRenamed("cand", "id_a")
        .join(edges, Seq("id_a"))
        .select(col("query_id"), col("id_b").as("cand"))
      val ball = scored1.select("query_id", "cand").unionByName(h2)
        .distinct()
        .filter(col("cand") =!= col("query_id"))
        .localCheckpoint() // scored twice (hits + mass)
      val expanded = beam.agg(count(lit(1)).as("n_expanded"))
      val hits = truth.join(ball, Seq("query_id", "cand"), "left_semi")
        .agg(count(lit(1)).as("n_hits"))
      val mass = ball.agg(count(lit(1)).as("n_cand_total"))
      nq.crossJoin(expanded).crossJoin(mass).crossJoin(hits)
        .select(lit(b).as("beam"), col("n_queries"), col("n_expanded"),
          col("n_cand_total"), col("n_hits"),
          expr("(n_hits * 1000000) div nullif(3 * n_queries, 0)")
            .as("recall_ppm"))
    }
    arms.reduce(_ unionByName _).orderBy("beam")
  }

  val s50Oracle: String = {
    def armCtes(b: Int): String =
      s"""ball$b AS MATERIALIZED (
        |  SELECT DISTINCT query_id, cand FROM (
        |    SELECT query_id, cand FROM scored1
        |    UNION ALL
        |    SELECT s.query_id, e.id_b FROM scored1 s
        |    JOIN edges e ON e.id_a = s.cand WHERE s.rk <= $b)
        |  WHERE cand <> query_id
        |)""".stripMargin
    def armSelect(b: Int): String =
      s"""SELECT $b AS beam, nq.n_queries,
        |    (SELECT COUNT(*) FROM scored1 WHERE rk <= $b) AS n_expanded,
        |    (SELECT COUNT(*) FROM ball$b) AS n_cand_total,
        |    (SELECT COUNT(*) FROM truth t
        |     WHERE EXISTS (SELECT 1 FROM ball$b bl
        |       WHERE bl.query_id = t.query_id AND bl.cand = t.cand)) AS n_hits
        |  FROM nq""".stripMargin
    s"""WITH $duckServedGraphCtes, truth AS MATERIALIZED (
      |  SELECT query_id, cand FROM (
      |    SELECT query_id, vec_id AS cand,
      |      row_number() OVER (PARTITION BY query_id
      |        ORDER BY cos DESC, vec_id) AS rank
      |    FROM (
      |      SELECT query_id, vec_id,
      |        ${duckCosOf("q0.qv", "embeddings.embedding")} AS cos
      |      FROM embeddings, q0 WHERE vec_id <> query_id))
      |  WHERE rank <= 3
      |), nq AS (SELECT COUNT(*) AS n_queries FROM q0),
      |${armCtes(2)},
      |${armCtes(4)},
      |${armCtes(8)},
      |${armCtes(1000000)}
      |SELECT beam, n_queries, n_expanded, n_cand_total, n_hits,
      |  CAST((n_hits * 1000000) // NULLIF(3 * n_queries, 0) AS BIGINT)
      |    AS recall_ppm
      |FROM (
      |  ${armSelect(2)}
      |  UNION ALL
      |  ${armSelect(4)}
      |  UNION ALL
      |  ${armSelect(8)}
      |  UNION ALL
      |  ${armSelect(1000000)})
      |ORDER BY beam""".stripMargin
  }

  // s35 — OPQ-STYLE ROTATED PQ distortion (the OPQ/ITQ family's core
  // claim, measured): rotate every vector by the Householder reflection
  // H = I − 2uuᵀ/(u·u) with u = v − e₁ (v = s32's power-iteration axis),
  // which maps the corpus's dominant direction onto coordinate axis 1 —
  // energy that previously SPANNED subspaces now concentrates in
  // subspace 0 — then train and encode PQ on the rotated corpus and
  // report per-subspace quantization error next to the identity
  // baseline (s22's diagnostic, two variants side by side). This is the
  // decision table an index builder reads to choose OPQ-vs-PQ; the gate
  // pins both codebook lineages and every per-subspace error. Exactness:
  // u and u₂ = 2u/(u·u) derive from v by the SAME ascending fold /
  // division dag on both engines (driver fold == DuckDB list_sum; the
  // rotation is s33's project-subtract-cast-to-float shape with u₂ as
  // the projection axis and u as the subtraction axis); per-row errors
  // floor to micros before the corpus sum. Plan: rotation is a narrow
  // map (axis literals, no join); each arm is s22's single-scan shape;
  // the rotated table materializes once (localCheckpoint) so codebook
  // build and encode share it.
  def s35OpqDistortion(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.PqFunctions
    val m = 8
    val emb = Tables.embeddings(spark, dir)
    def arm(src: DataFrame, variant: String): DataFrame = {
      val cent = graft.ops.Similarity.buildCentroids(src, dim = 64, chunks = centroidChunks)
      val codebook = graft.ops.Similarity.collectCodebook(cent)
      src.select(col("vec_id"),
          PqFunctions.pqCodes(col("embedding"), codebook, m).as("codes"),
          col("embedding"))
        .select(posexplode(PqFunctions.pqSqError(
          col("embedding"), col("codes"), codebook, m)).as(Seq("subspace", "err")))
        .select(lit(variant).as("variant"), col("subspace"),
          floor(col("err") * 1000000d).cast("long").as("err_micros"))
    }
    val v = powerAxis(spark, dir)
    val u = v.zipWithIndex.map { case (x, i) => if (i == 0) x - 1.0 else x }
    val uu = u.foldLeft(0.0)((a, x) => a + x * x)
    require(uu > 1e-12, s"degenerate rotation: power axis is e1 (u·u = $uu)")
    val u2 = u.map(x => 2.0 * x / uu)
    val ulit = array(u.map(lit): _*)
    val rot = emb.withColumn("w", dotAxis(u2))
      .select(col("label"), col("vec_id"),
        zip_with(col("embedding"), ulit,
          (x: Column, p: Column) =>
            (x.cast("double") - col("w") * p).cast("float")).as("embedding"))
      .localCheckpoint() // codebook build + encode share one materialization
    arm(emb.select("label", "vec_id", "embedding"), "identity")
      .unionByName(arm(rot, "opq"))
      .groupBy("variant", "subspace")
      .agg(count(lit(1)).as("n_vecs"),
        sum(col("err_micros")).as("err_micros_sum"),
        max(col("err_micros")).as("max_err_micros"))
      .orderBy("variant", "subspace")
  }

  val s35Oracle: String = {
    val m = 8
    // s22's error-CTE block, parameterized over (source relation, embedding
    // column, centroid suffix) so the identity and rotated arms cannot
    // drift from the gated s22 formulation
    def errCtes(sfx: String, src: String, embCol: String, centSfx: String): String = {
      def subDot(a: String, b: String, s: Int) =
        s"list_sum(list_transform(range(1, 9), i -> CAST($a[${s * 8} + i] AS DOUBLE) * CAST($b[${s * 8} + i] AS DOUBLE)))"
      val eds = (0 until m).map(s =>
        s"    ${subDot(s"e.$embCol", "c.cf", s)} AS d$s").mkString(",\n")
      val rns = (0 until m).map(s =>
        s"    row_number() OVER (PARTITION BY vec_id ORDER BY d$s DESC, clabel) AS r$s").mkString(",\n")
      val codeCols = (0 until m).map(s =>
        s"    MAX(CASE WHEN r$s = 1 THEN clabel END) AS code$s").mkString(",\n")
      val codeList = (0 until m).map(s => s"co.code$s").mkString("[", ", ", "]")
      val diff = s"(CAST(e.$embCol[s.s*8 + i] AS DOUBLE) - CAST(c.cf[s.s*8 + i] AS DOUBLE))"
      s"""ecd$sfx AS (
        |  SELECT e.vec_id, c.clabel,
        |$eds
        |  FROM $src e CROSS JOIN cent$centSfx c
        |), er$sfx AS (
        |  SELECT vec_id, clabel,
        |$rns
        |  FROM ecd$sfx
        |), codes$sfx AS (
        |  SELECT vec_id,
        |$codeCols
        |  FROM er$sfx GROUP BY vec_id
        |), err$sfx AS (
        |  SELECT e.vec_id, CAST(s.s AS INT) AS subspace,
        |    CAST(floor(list_sum(list_transform(range(1, 9), i ->
        |      $diff * $diff)) * 1000000.0) AS BIGINT) AS err_micros
        |  FROM $src e
        |  JOIN codes$sfx co USING (vec_id),
        |  LATERAL (SELECT unnest(range(0, $m)) AS s) s
        |  JOIN cent$centSfx c ON c.clabel = $codeList[s.s + 1]
        |)""".stripMargin
    }
    def armSelect(variant: String, sfx: String): String =
      s"""SELECT '$variant' AS variant, subspace, COUNT(*) AS n_vecs,
        |  CAST(SUM(err_micros) AS BIGINT) AS err_micros_sum,
        |  CAST(MAX(err_micros) AS BIGINT) AS max_err_micros
        |FROM err$sfx GROUP BY subspace""".stripMargin
    s"""WITH $duckPowerCtes, hu AS (
      |  SELECT list_transform(range(1, 65),
      |    i -> v[i] - CASE WHEN i = 1 THEN 1.0 ELSE 0.0 END) AS u
      |  FROM v3
      |), hu2 AS (
      |  SELECT u, list_transform(u, x -> 2.0 * x / uu) AS u2 FROM (
      |    SELECT u, list_sum(list_transform(u, x -> x * x)) AS uu FROM hu)
      |), rw AS (
      |  SELECT e.vec_id, e.label, e.embedding, t.u,
      |    list_sum(list_transform(list_zip(e.embedding, t.u2),
      |      z -> CAST(z[1] AS DOUBLE) * z[2])) AS w
      |  FROM embeddings e, hu2 t
      |), rot AS (
      |  SELECT vec_id, label, list_transform(range(1, 65),
      |    d -> CAST(CAST(embedding[d] AS DOUBLE) - w * u[d] AS FLOAT)) AS r
      |  FROM rw
      |), ${duckCentroidCtes(64, centroidChunks)},
      |${duckCentroidCtes(64, centroidChunks, src = "rot", sfx = "r", embCol = "r")},
      |${errCtes("_i", "embeddings", "embedding", "")},
      |${errCtes("_r", "rot", "r", "r")}
      |SELECT variant, subspace, n_vecs, err_micros_sum, max_err_micros FROM (
      |  ${armSelect("identity", "_i")}
      |  UNION ALL
      |  ${armSelect("opq", "_r")})
      |ORDER BY variant, subspace""".stripMargin
  }

  // s37 — HYBRID SEARCH with Reciprocal Rank Fusion (the production
  // retrieval composition: BM25-family lexical + dense vector, fused by
  // RRF — what every two-tower search deployment actually serves):
  // lexical arm = d23's trigram-tf sparse cosine restricted to the query
  // entities (posting-list pair generation, integer-ppm scores, top-10
  // per query); vector arm = s01's broadcast-query cosine top-10 over
  // the same entity ids (the testdata convention doc_id == vec_id, as
  // m06's cross-modal bridge established); fusion = the standard
  // RRF k=60, kept exact as 10⁶ div (60 + rank) per arm — candidates
  // outside an arm's top-10 contribute 0, the standard top-k RRF. The
  // FULL OUTER candidate union is the interaction the single-arm gates
  // can't see: a fused rank moves when EITHER arm's tie-break moves.
  // Plan: both arms are their gated shapes; the fusion is one
  // (query, cand)-keyed full-outer join + a per-query top-5 window.
  def s37HybridRrf(spark: SparkSession, dir: String): DataFrame = {
    // lexical arm — d23's machinery, unthresholded, directed from queries
    val tf = Tables.documents(spark, dir)
      .select(col("doc_id"), split(col("text"), " ").as("tk"))
      .filter(size(col("tk")) >= 3)
      .select(col("doc_id"), explode(expr(
        """transform(sequence(1, size(tk) - 2), i -> concat_ws(' ',
          |  element_at(tk, i), element_at(tk, i + 1), element_at(tk, i + 2)))""".stripMargin))
        .as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).cast("int").as("tf"))
    // DIRECTED expansion: the arm serves a ~2% query batch, so the pair
    // generation must be priced per QUERY, not per corpus — instead of
    // PostingPairs over every kept posting list (all corpus×corpus pairs,
    // 98% discarded by the query filter), the query docs' postings join
    // the corpus postings on the term. The df cap still applies (kept
    // terms pre-counted + semi-joined, no collect buffer at all in this
    // arm), and the dot aggregation's input mass is |query postings| ×
    // avg posting length — the query batch's cost, not the corpus's.
    val kept = tf.groupBy("term").agg(count(lit(1)).as("df_cnt"))
      .filter(col("df_cnt").between(2, 100))
      .select("term")
    val ktf = tf.join(kept, Seq("term"), "left_semi").localCheckpoint()
    val n2 = ktf
      .groupBy("doc_id")
      .agg(sum(col("tf").cast("long") * col("tf")).as("n2"))
    val qtf = ktf.filter(col("doc_id") % 50 === 0)
      .select(col("term"), col("doc_id").as("query_id"), col("tf").as("qtf"))
    val directed = qtf
      .join(ktf.select(col("term"), col("doc_id").as("cand"), col("tf").as("ctf")),
        Seq("term"))
      .filter(col("query_id") =!= col("cand"))
      .groupBy("query_id", "cand")
      .agg(sum(col("qtf").cast("long") * col("ctf")).as("dot"))
      .join(n2.select(col("doc_id").as("query_id"), col("n2").as("n2_q")),
        Seq("query_id"))
      .join(n2.select(col("doc_id").as("cand"), col("n2").as("n2_c")), Seq("cand"))
      .withColumn("simsq_ppm", expr("(dot * dot * 1000000) div (n2_q * n2_c)"))
      .select("query_id", "cand", "simsq_ppm")
    val wL = Window.partitionBy("query_id")
      .orderBy(col("simsq_ppm").desc, col("cand"))
    val lex = directed.withColumn("r_lex", row_number().over(wL))
      .filter(col("r_lex") <= 10)
      .select("query_id", "cand", "r_lex")
    // vector arm — s01's gated shape at k = 10
    val emb = Tables.embeddings(spark, dir)
    val q = emb.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val vec = graft.ops.Similarity.cosineTopK(emb, q, 10)
      .select(col("query_id"), col("neighbor_id").as("cand"),
        col("rank").as("r_vec"))
    // RRF fusion
    val fused = lex.join(vec, Seq("query_id", "cand"), "full_outer")
      .withColumn("rrf_ppm",
        coalesce(expr("1000000 div (60 + r_lex)"), lit(0L)) +
          coalesce(expr("1000000 div (60 + r_vec)"), lit(0L)))
    val wF = Window.partitionBy("query_id").orderBy(col("rrf_ppm").desc, col("cand"))
    fused.withColumn("rank", row_number().over(wF).cast("int"))
      .filter(col("rank") <= 5)
      .select(col("query_id"), col("rank"), col("cand").as("neighbor_id"),
        col("rrf_ppm"),
        coalesce(col("r_lex"), lit(-1)).cast("int").as("r_lex"),
        coalesce(col("r_vec"), lit(-1)).cast("int").as("r_vec"))
      .orderBy("query_id", "rank")
  }

  val s37Oracle: String =
    s"""WITH toks AS (
      |  SELECT doc_id, string_split(text, ' ') AS tk FROM documents
      |), tf AS MATERIALIZED (
      |  SELECT doc_id, term, COUNT(*) AS tf FROM (
      |    SELECT doc_id, unnest(list_transform(range(1, len(tk) - 1),
      |      i -> tk[i] || ' ' || tk[i + 1] || ' ' || tk[i + 2])) AS term
      |    FROM toks WHERE len(tk) >= 3)
      |  GROUP BY doc_id, term
      |), kept AS (
      |  SELECT term FROM tf GROUP BY term HAVING COUNT(*) BETWEEN 2 AND 100
      |), ktf AS MATERIALIZED (
      |  SELECT t.doc_id, t.term, t.tf FROM tf t JOIN kept k ON k.term = t.term
      |), n2 AS (
      |  SELECT doc_id, CAST(SUM(tf * tf) AS BIGINT) AS n2 FROM ktf GROUP BY doc_id
      |), dots AS (
      |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
      |    CAST(SUM(a.tf * b.tf) AS BIGINT) AS dot
      |  FROM ktf a JOIN ktf b ON a.term = b.term AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2
      |), sim AS MATERIALIZED (
      |  SELECT doc_a, doc_b,
      |    CAST((dot * dot * 1000000) // (na.n2 * nb.n2) AS BIGINT) AS simsq_ppm
      |  FROM dots
      |  JOIN n2 na ON na.doc_id = doc_a
      |  JOIN n2 nb ON nb.doc_id = doc_b
      |), lex AS (
      |  SELECT query_id, cand, r_lex FROM (
      |    SELECT query_id, cand,
      |      CAST(row_number() OVER (PARTITION BY query_id
      |        ORDER BY simsq_ppm DESC, cand) AS INT) AS r_lex
      |    FROM (
      |      SELECT doc_a AS query_id, doc_b AS cand, simsq_ppm FROM sim
      |      UNION ALL
      |      SELECT doc_b, doc_a, simsq_ppm FROM sim)
      |    WHERE query_id % 50 = 0)
      |  WHERE r_lex <= 10
      |), q AS (
      |  SELECT vec_id AS query_id, embedding AS qv FROM embeddings
      |  WHERE vec_id % 50 = 0
      |), vec AS (
      |  SELECT query_id, cand, r_vec FROM (
      |    SELECT query_id, vec_id AS cand,
      |      CAST(row_number() OVER (PARTITION BY query_id
      |        ORDER BY cos DESC, vec_id) AS INT) AS r_vec
      |    FROM (
      |      SELECT query_id, vec_id, $duckCos AS cos
      |      FROM embeddings, q WHERE vec_id <> query_id))
      |  WHERE r_vec <= 10
      |), fused AS (
      |  SELECT COALESCE(l.query_id, v.query_id) AS query_id,
      |    COALESCE(l.cand, v.cand) AS cand, l.r_lex, v.r_vec,
      |    CAST(COALESCE(1000000 // (60 + l.r_lex), 0)
      |      + COALESCE(1000000 // (60 + v.r_vec), 0) AS BIGINT) AS rrf_ppm
      |  FROM lex l FULL JOIN vec v
      |    ON l.query_id = v.query_id AND l.cand = v.cand
      |)
      |SELECT query_id, rank, neighbor_id, rrf_ppm,
      |  CAST(COALESCE(r_lex, -1) AS INT) AS r_lex,
      |  CAST(COALESCE(r_vec, -1) AS INT) AS r_vec
      |FROM (
      |  SELECT query_id, cand AS neighbor_id, rrf_ppm, r_lex, r_vec,
      |    CAST(row_number() OVER (PARTITION BY query_id
      |      ORDER BY rrf_ppm DESC, cand) AS INT) AS rank
      |  FROM fused)
      |WHERE rank <= 5
      |ORDER BY query_id, rank""".stripMargin

  // s38 — GRAPH-SEARCH RECALL CALIBRATION (the graph family's d19/s19
  // analogue): the 1-hop and 2-hop candidate balls of the s34 search —
  // measured over the SERVED configuration (bridged edges + nprobe =
  // servedNprobe, the s40/s41-promoted default) — each scored against
  // the exact top-3 truth (s01's gated definition): recall vs candidate
  // mass is THE dial a navigable-graph deployment tunes (hop depth ≈
  // HNSW's ef), and every index family in this engine ships its
  // calibration table (LSH: d16/d19; IVF/PQ: s19/s29; graph: this).
  // Integer-exact: hit counts and ppm recalls over the fixed
  // 3-per-query truth set; candidate mass pins the cost side. Plan: the
  // s34 index subtrees once (edges localCheckpoint), two ball
  // expansions sharing them, truth = one broadcast-query corpus scan,
  // hits via (query, cand)-keyed semi-joins.
  def s38GraphRecall(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    val cent = graft.ops.Similarity.buildCentroids(emb, dim = 64, chunks = centroidChunks)
    val assigned = graft.ops.Similarity.assignToCentroids(
      emb.select("vec_id", "embedding"), cent, Seq("vec_id"))
    val edges = knnEdges(assigned).select("id_a", "id_b")
      .unionByName(bridgeEdges(emb, cent, assigned)) // served default
      .localCheckpoint()
    val qRows = emb.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val probes = graft.ops.Similarity.probeCentroids(
      qRows, cent, Seq("query_id"), nprobe = servedNprobe, embCol = "qv")
    val seeds = ivfSeeds(probes, assigned).localCheckpoint() // s34's entry rule
    val h1 = seeds.select(col("query_id"), col("seed").as("id_a"))
      .join(edges, Seq("id_a"))
      .select(col("query_id"), col("id_b").as("cand"))
    val ball1 = seeds.select(col("query_id"), col("seed").as("cand"))
      .unionByName(h1).distinct()
      .filter(col("cand") =!= col("query_id"))
      .localCheckpoint() // ball2 extends it; both arms score it
    // hop 2 is the SERVED expansion: only the top-servedBeam frontier
    // nodes by exact cosine expand (s50's promoted default), so this
    // gate measures the recall of the configuration s34 actually serves
    val wB = Window.partitionBy("query_id").orderBy(col("cos").desc, col("cand"))
    val h2 = ball1
      .join(emb.select(col("vec_id").as("cand"), col("embedding")), Seq("cand"))
      .join(broadcast(qRows), Seq("query_id"))
      .withColumn("cos", cosineSim(col("qv"), col("embedding")))
      .withColumn("rk", row_number().over(wB))
      .filter(col("rk") <= servedBeam)
      .select(col("query_id"), col("cand").as("id_a"))
      .join(edges, Seq("id_a"))
      .select(col("query_id"), col("id_b").as("cand"))
    val ball2 = ball1.unionByName(h2).distinct()
      .filter(col("cand") =!= col("query_id"))
    val truth = graft.ops.Similarity.cosineTopK(
        emb, qRows, 3)
      .select(col("query_id"), col("neighbor_id").as("cand"))
    def arm(ball: DataFrame, hops: Int): DataFrame = {
      val hits = truth.join(ball, Seq("query_id", "cand"), "left_semi")
        .agg(count(lit(1)).as("n_hits"))
      val mass = ball.agg(count(lit(1)).as("n_cand_total"))
      val nq = qRows.agg(count(lit(1)).as("n_queries"))
      nq.crossJoin(mass).crossJoin(hits)
        .select(lit(hops).as("hops"), col("n_queries"), col("n_cand_total"),
          col("n_hits"),
          // NULLIF: the engine-wide rate-division convention (q41/s29
          // lesson) — an empty corpus has zero queries and must yield a
          // NULL recall, not an ANSI divide-by-zero
          expr("(n_hits * 1000000) div nullif(3 * n_queries, 0)").as("recall_ppm"))
    }
    arm(ball1, 1).unionByName(arm(ball2, 2)).orderBy("hops")
  }

  val s38Oracle: String =
    s"""WITH ${duckCentroidCtes(64, centroidChunks)}, assigned AS MATERIALIZED (
      |  SELECT vec_id, embedding, clabel FROM (
      |    SELECT e.vec_id, e.embedding, c.clabel,
      |      row_number() OVER (PARTITION BY e.vec_id
      |        ORDER BY ${duckCosOf("e.embedding", "c.cf")} DESC, c.clabel) AS rn
      |    FROM embeddings e, cent c)
      |  WHERE rn = 1
      |), intra AS MATERIALIZED (
      |  SELECT id_a, id_b FROM (
      |    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
      |      row_number() OVER (PARTITION BY a.clabel, a.vec_id
      |        ORDER BY ${duckCosOf("a.embedding", "b.embedding")} DESC, b.vec_id) AS rk
      |    FROM assigned a JOIN assigned b
      |      ON a.clabel = b.clabel AND a.vec_id <> b.vec_id)
      |  WHERE rk <= 3
      |), p2 AS MATERIALIZED (
      |  SELECT vec_id, embedding, clabel FROM (
      |    SELECT e.vec_id, e.embedding, c.clabel,
      |      row_number() OVER (PARTITION BY e.vec_id
      |        ORDER BY ${duckCosOf("e.embedding", "c.cf")} DESC, c.clabel) AS rn
      |    FROM embeddings e, cent c)
      |  WHERE rn = 2
      |), bridge AS MATERIALIZED (
      |  SELECT id_a, id_b FROM (
      |    SELECT p.vec_id AS id_a, b.vec_id AS id_b,
      |      row_number() OVER (PARTITION BY p.vec_id
      |        ORDER BY ${duckCosOf("p.embedding", "b.embedding")} DESC, b.vec_id) AS rk
      |    FROM p2 p JOIN assigned b ON b.clabel = p.clabel)
      |  WHERE rk = 1
      |), edges AS MATERIALIZED (
      |  SELECT id_a, id_b FROM intra
      |  UNION ALL
      |  SELECT id_a, id_b FROM bridge
      |), q AS MATERIALIZED (
      |  SELECT vec_id AS query_id, embedding AS qv
      |  FROM embeddings WHERE vec_id % 50 = 0
      |), qp AS MATERIALIZED (
      |  SELECT query_id, qv, clabel FROM (
      |    SELECT q.query_id, q.qv, c.clabel,
      |      row_number() OVER (PARTITION BY q.query_id
      |        ORDER BY ${duckCosOf("q.qv", "c.cf")} DESC, c.clabel) AS rn
      |    FROM q, cent c)
      |  WHERE rn <= 4
      |), seeds AS MATERIALIZED (
      |  SELECT query_id, seed FROM (
      |    SELECT p.query_id, a.vec_id AS seed,
      |      row_number() OVER (PARTITION BY p.query_id
      |        ORDER BY ${duckCosOf("p.qv", "a.embedding")} DESC, a.vec_id) AS rk
      |    FROM qp p JOIN assigned a
      |      ON a.clabel = p.clabel AND a.vec_id <> p.query_id)
      |  WHERE rk <= 3
      |), ball1 AS MATERIALIZED (
      |  SELECT DISTINCT query_id, cand FROM (
      |    SELECT query_id, seed AS cand FROM seeds
      |    UNION ALL
      |    SELECT s.query_id, e.id_b FROM seeds s JOIN edges e ON e.id_a = s.seed)
      |  WHERE cand <> query_id
      |), sc1 AS MATERIALIZED (
      |  SELECT b.query_id, b.cand,
      |    row_number() OVER (PARTITION BY b.query_id
      |      ORDER BY ${duckCosOf("q.qv", "e.embedding")} DESC, b.cand) AS rk
      |  FROM ball1 b JOIN q ON q.query_id = b.query_id
      |  JOIN embeddings e ON e.vec_id = b.cand
      |), ball2 AS MATERIALIZED (
      |  SELECT DISTINCT query_id, cand FROM (
      |    SELECT query_id, cand FROM ball1
      |    UNION ALL
      |    SELECT s.query_id, e.id_b FROM sc1 s
      |    JOIN edges e ON e.id_a = s.cand WHERE s.rk <= $servedBeam)
      |  WHERE cand <> query_id
      |), truth AS MATERIALIZED (
      |  SELECT query_id, cand FROM (
      |    SELECT query_id, vec_id AS cand,
      |      row_number() OVER (PARTITION BY query_id
      |        ORDER BY cos DESC, vec_id) AS rank
      |    FROM (
      |      SELECT query_id, vec_id, ${duckCosOf("q.qv", "embeddings.embedding")} AS cos
      |      FROM embeddings, q WHERE vec_id <> query_id))
      |  WHERE rank <= 3
      |), nq AS (SELECT COUNT(*) AS n_queries FROM q)
      |SELECT hops, n_queries, n_cand_total, n_hits,
      |  CAST((n_hits * 1000000) // NULLIF(3 * n_queries, 0) AS BIGINT) AS recall_ppm
      |FROM (
      |  SELECT 1 AS hops, nq.n_queries,
      |    (SELECT COUNT(*) FROM ball1) AS n_cand_total,
      |    (SELECT COUNT(*) FROM truth t
      |     WHERE EXISTS (SELECT 1 FROM ball1 b
      |       WHERE b.query_id = t.query_id AND b.cand = t.cand)) AS n_hits
      |  FROM nq
      |  UNION ALL
      |  SELECT 2, nq.n_queries,
      |    (SELECT COUNT(*) FROM ball2),
      |    (SELECT COUNT(*) FROM truth t
      |     WHERE EXISTS (SELECT 1 FROM ball2 b
      |       WHERE b.query_id = t.query_id AND b.cand = t.cand))
      |  FROM nq)
      |ORDER BY hops""".stripMargin

  // s39 — IVF + SQ8 ON RESIDUALS: the last cell of the quantization
  // matrix (IVF × {flat s03, PQ s06/s08/s16, SQ8 s15} — s15 scalar-
  // quantizes RAW vectors; this quantizes the RESIDUAL vec − centroid,
  // FAISS's IndexIVFScalarQuantizer with by_residual=true). Residuals
  // concentrate around 0, so the per-dimension [min,max] grid — trained
  // on the residual distribution, not the raw one — spends its 256
  // levels on a tighter range: same 4× memory traffic as s15, finer
  // effective resolution. Candidates reconstruct as centroid + dequant
  // (one exactly-rounded double add per dim, mirrored textually in the
  // oracle), rank by reconstructed cosine within the query's cluster
  // (nprobe=1), and the top-20 re-rank exactly. Plan shape: s15's —
  // bounds are two 64-key map-side-partial aggregates over residuals +
  // a guarded broadcast-size collect; encode/decode are narrow maps
  // through the native Sq8 kernels; the residual table materializes
  // once (localCheckpoint) and feeds bounds, encode, and queries.
  def s39AnnIvfSq8Res(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.Sq8Functions
    import graft.functions.VectorFunctions.vecSub
    val dim = 64
    val emb = Tables.embeddings(spark, dir)
    val cent = graft.ops.Similarity.buildCentroids(emb, dim = dim, chunks = centroidChunks)
    val assigned = graft.ops.Similarity.assignToCentroids(
      emb.select("vec_id", "embedding"), cent, Seq("vec_id"))
    val withRes = assigned.join(broadcast(cent), col("cluster") === col("clabel"))
      .withColumn("res", vecSub(col("embedding"), col("cf")))
      .select("vec_id", "cluster", "embedding", "res")
      .localCheckpoint() // feeds bounds, encode, and the query branch
    val bounds = withRes
      .select(posexplode(col("res")).as(Seq("i", "x")))
      .groupBy("i").agg(min(col("x")).as("mn"), max(col("x")).as("mx"))
      .orderBy("i").limit(dim + 1).collect()
    require(bounds.length == dim,
      s"expected $dim per-dimension residual bounds, got ${bounds.length}")
    val mins = bounds.map(_.getFloat(1)).toSeq
    val scales = bounds.map(r =>
      (r.getFloat(2).toDouble - r.getFloat(1).toDouble) / 255.0).toSeq
    val encoded = withRes.select(col("vec_id"), col("cluster"),
      Sq8Functions.sq8Codes(col("res"), mins, scales).as("codes"))
    val q = withRes.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"),
        col("cluster").as("qc"))
    val wA = Window.partitionBy("query_id").orderBy(col("approx").desc, col("vec_id"))
    val cand = encoded.join(broadcast(q),
        col("cluster") === col("qc") && col("vec_id") =!= col("query_id"))
      .join(broadcast(cent.withColumnRenamed("clabel", "cluster")), Seq("cluster"))
      .withColumn("dec", Sq8Functions.sq8Decode(col("codes"), mins, scales))
      // reconstruction = centroid + dequantized residual, one rounded
      // double add per dimension — the oracle's exact textual mirror
      .withColumn("rec", expr(
        "zip_with(dec, cf, (x, y) -> CAST(CAST(x AS DOUBLE) + CAST(y AS DOUBLE) AS FLOAT))"))
      .withColumn("approx", cosineSim(col("qv"), col("rec")))
      .select("query_id", "vec_id", "approx")
      .withColumn("arank", row_number().over(wA))
      .filter(col("arank") <= 20)
      .select("query_id", "vec_id")
    val wE = Window.partitionBy("query_id").orderBy(col("cos").desc, col("vec_id"))
    emb.join(broadcast(cand), "vec_id")
      .join(broadcast(q.select("query_id", "qv")), "query_id")
      .withColumn("cos", cosineSim(col("qv"), col("embedding")))
      .withColumn("rank", row_number().over(wE))
      .filter(col("rank") <= 5)
      .select(col("query_id"), col("rank"), col("vec_id").as("neighbor_id"))
      .orderBy("query_id", "rank")
  }

  val s39Oracle: String =
    s"""WITH ${duckCentroidCtes(64, centroidChunks)}, ranked AS (
      |  SELECT e.vec_id, e.embedding, c.clabel,
      |    row_number() OVER (PARTITION BY e.vec_id
      |      ORDER BY ${duckCosOf("e.embedding", "c.cf")} DESC, c.clabel) AS rn
      |  FROM embeddings e, cent c
      |), assigned AS (
      |  SELECT vec_id, embedding, clabel FROM ranked WHERE rn = 1
      |), res AS MATERIALIZED (
      |  SELECT a.vec_id, a.clabel AS cluster, a.embedding,
      |    list_transform(range(1, 65), i ->
      |      CAST(CAST(a.embedding[i] AS DOUBLE) - CAST(c.cf[i] AS DOUBLE) AS FLOAT)) AS res
      |  FROM assigned a JOIN cent c ON c.clabel = a.clabel
      |), bounds AS (
      |  SELECT i, MIN(r.res[i]) AS mn, MAX(r.res[i]) AS mx
      |  FROM res r, range(1, 65) t(i) GROUP BY i
      |), b AS (
      |  SELECT list(CAST(mn AS FLOAT) ORDER BY i) AS mns,
      |    list((CAST(mx AS DOUBLE) - CAST(mn AS DOUBLE)) / 255.0 ORDER BY i) AS scs
      |  FROM bounds
      |), recs AS (
      |  SELECT r.vec_id, r.cluster,
      |    list_transform(range(1, 65), i ->
      |      CAST(CAST(CAST(CAST(b.mns[i] AS DOUBLE) +
      |        (CASE WHEN b.scs[i] = 0 OR isnan(r.res[i]) THEN 0
      |              ELSE CAST(LEAST(GREATEST(floor((CAST(r.res[i] AS DOUBLE) - CAST(b.mns[i] AS DOUBLE)) / b.scs[i]), 0), 255) AS BIGINT)
      |         END) * b.scs[i] AS FLOAT) AS DOUBLE) + CAST(c.cf[i] AS DOUBLE) AS FLOAT)) AS rec
      |  FROM res r CROSS JOIN b JOIN cent c ON c.clabel = r.cluster
      |), q AS (
      |  SELECT vec_id AS query_id, embedding AS qv, cluster AS qc
      |  FROM res WHERE vec_id % 50 = 0
      |), scored AS (
      |  SELECT query_id, d.vec_id, ${duckCosOf("qv", "rec")} AS approx
      |  FROM recs d JOIN q ON d.cluster = q.qc AND d.vec_id <> q.query_id
      |), cand AS (
      |  SELECT query_id, vec_id FROM (
      |    SELECT query_id, vec_id,
      |      row_number() OVER (PARTITION BY query_id ORDER BY approx DESC, vec_id) AS arank
      |    FROM scored)
      |  WHERE arank <= 20
      |), rr AS (
      |  SELECT c.query_id, e.vec_id, ${duckCosOf("q.qv", "e.embedding")} AS cos
      |  FROM cand c
      |  JOIN embeddings e ON e.vec_id = c.vec_id
      |  JOIN q ON q.query_id = c.query_id
      |)
      |SELECT query_id, rank, neighbor_id FROM (
      |  SELECT query_id, vec_id AS neighbor_id,
      |    CAST(row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id) AS INT) AS rank
      |  FROM rr)
      |WHERE rank <= 5
      |ORDER BY query_id, rank""".stripMargin

  // s40 — GRAPH-SEED NPROBE SWEEP: the recall/cost curve for s34's one
  // remaining dial. s38 showed hop-2 adds candidates but no hits — the
  // ball can't leave the probed clusters (kNN edges are intra-cluster),
  // so recall is capped by the coarse-quantizer truncation and nprobe
  // is the lever. This table prices it: per nprobe ∈ {1, 2, 4}, the
  // seed-scoring mass (exact pairs priced by the IVF probe — the cost
  // side), the 2-hop candidate mass, and recall@3 against s01's exact
  // truth. The deployment reads this exactly like d19 (LSH sweep) and
  // s29 (IVF/PQ recall matrix) — every index family ships its
  // calibration table, and each arm COMPOSES the gated s34 definitions
  // verbatim (same probe, same seeds, same ball). Plan: index subtrees
  // built once (edges/queries/truth localCheckpoint), three arms share
  // them; per-arm aggregates are 1-row folds crossJoined (the d25
  // scalar-combine shape).
  def s40GraphSeedSweep(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    val cent = graft.ops.Similarity.buildCentroids(emb, dim = 64, chunks = centroidChunks)
    val assigned = graft.ops.Similarity.assignToCentroids(
      emb.select("vec_id", "embedding"), cent, Seq("vec_id"))
    val edges = knnEdges(assigned).select("id_a", "id_b")
      .localCheckpoint() // probed by all three arms' two hops
    val qRows = emb.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
      .localCheckpoint()
    val truth = graft.ops.Similarity.cosineTopK(emb, qRows, 3)
      .select(col("query_id"), col("neighbor_id").as("cand"))
      .localCheckpoint()
    val nq = qRows.agg(count(lit(1)).as("n_queries"))
    val arms = Seq(1, 2, 4).map { np =>
      val probes = graft.ops.Similarity.probeCentroids(
        qRows, cent, Seq("query_id"), nprobe = np, embCol = "qv")
      val seedCost = probes
        .join(assigned.select(col("cluster"), col("vec_id").as("seed")),
          Seq("cluster"))
        .filter(col("seed") =!= col("query_id"))
        .agg(count(lit(1)).as("n_scored"))
      val seeds = ivfSeeds(probes, assigned)
        .localCheckpoint() // the heavy per-arm stage; ball + hits + mass reuse it
      val h1 = seeds.select(col("query_id"), col("seed").as("id_a"))
        .join(edges, Seq("id_a"))
        .select(col("query_id"), col("id_b").as("cand"))
      val h2 = h1.withColumnRenamed("cand", "id_a")
        .join(edges, Seq("id_a"))
        .select(col("query_id"), col("id_b").as("cand"))
      val ball = seeds.select(col("query_id"), col("seed").as("cand"))
        .unionByName(h1).unionByName(h2)
        .distinct()
        .filter(col("cand") =!= col("query_id"))
        .localCheckpoint() // scored twice (hits + mass)
      val hits = truth.join(ball, Seq("query_id", "cand"), "left_semi")
        .agg(count(lit(1)).as("n_hits"))
      val mass = ball.agg(count(lit(1)).as("n_cand_total"))
      nq.crossJoin(seedCost).crossJoin(mass).crossJoin(hits)
        .select(lit(np).as("nprobe"), col("n_queries"), col("n_scored"),
          col("n_cand_total"), col("n_hits"),
          expr("(n_hits * 1000000) div nullif(3 * n_queries, 0)")
            .as("recall_ppm"))
    }
    arms.reduce(_ unionByName _).orderBy("nprobe")
  }

  val s40Oracle: String = {
    def armCtes(np: Int): String =
      s"""qp$np AS MATERIALIZED (
        |  SELECT query_id, qv, clabel FROM (
        |    SELECT q.query_id, q.qv, c.clabel,
        |      row_number() OVER (PARTITION BY q.query_id
        |        ORDER BY ${duckCosOf("q.qv", "c.cf")} DESC, c.clabel) AS rn
        |    FROM q, cent c)
        |  WHERE rn <= $np
        |), sc$np AS (
        |  SELECT COUNT(*) AS n_scored FROM qp$np p
        |  JOIN assigned a ON a.clabel = p.clabel AND a.vec_id <> p.query_id
        |), seeds$np AS MATERIALIZED (
        |  SELECT query_id, seed FROM (
        |    SELECT p.query_id, a.vec_id AS seed,
        |      row_number() OVER (PARTITION BY p.query_id
        |        ORDER BY ${duckCosOf("p.qv", "a.embedding")} DESC, a.vec_id) AS rk
        |    FROM qp$np p JOIN assigned a
        |      ON a.clabel = p.clabel AND a.vec_id <> p.query_id)
        |  WHERE rk <= 3
        |), ball$np AS MATERIALIZED (
        |  SELECT DISTINCT query_id, cand FROM (
        |    SELECT query_id, seed AS cand FROM seeds$np
        |    UNION ALL
        |    SELECT s.query_id, e.id_b FROM seeds$np s JOIN edges e ON e.id_a = s.seed
        |    UNION ALL
        |    SELECT s.query_id, e2.id_b FROM seeds$np s
        |    JOIN edges e ON e.id_a = s.seed
        |    JOIN edges e2 ON e2.id_a = e.id_b)
        |  WHERE cand <> query_id
        |)""".stripMargin
    def armSelect(np: Int): String =
      s"""SELECT $np AS nprobe, nq.n_queries,
        |    (SELECT n_scored FROM sc$np) AS n_scored,
        |    (SELECT COUNT(*) FROM ball$np) AS n_cand_total,
        |    (SELECT COUNT(*) FROM truth t
        |     WHERE EXISTS (SELECT 1 FROM ball$np b
        |       WHERE b.query_id = t.query_id AND b.cand = t.cand)) AS n_hits
        |  FROM nq""".stripMargin
    s"""WITH ${duckCentroidCtes(64, centroidChunks)}, assigned AS MATERIALIZED (
      |  SELECT vec_id, embedding, clabel FROM (
      |    SELECT e.vec_id, e.embedding, c.clabel,
      |      row_number() OVER (PARTITION BY e.vec_id
      |        ORDER BY ${duckCosOf("e.embedding", "c.cf")} DESC, c.clabel) AS rn
      |    FROM embeddings e, cent c)
      |  WHERE rn = 1
      |), edges AS MATERIALIZED (
      |  SELECT id_a, id_b FROM (
      |    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
      |      row_number() OVER (PARTITION BY a.clabel, a.vec_id
      |        ORDER BY ${duckCosOf("a.embedding", "b.embedding")} DESC, b.vec_id) AS rk
      |    FROM assigned a JOIN assigned b
      |      ON a.clabel = b.clabel AND a.vec_id <> b.vec_id)
      |  WHERE rk <= 3
      |), q AS MATERIALIZED (
      |  SELECT vec_id AS query_id, embedding AS qv
      |  FROM embeddings WHERE vec_id % 50 = 0
      |), truth AS MATERIALIZED (
      |  SELECT query_id, cand FROM (
      |    SELECT query_id, vec_id AS cand,
      |      row_number() OVER (PARTITION BY query_id
      |        ORDER BY cos DESC, vec_id) AS rank
      |    FROM (
      |      SELECT query_id, vec_id, ${duckCosOf("q.qv", "embeddings.embedding")} AS cos
      |      FROM embeddings, q WHERE vec_id <> query_id))
      |  WHERE rank <= 3
      |), nq AS (SELECT COUNT(*) AS n_queries FROM q),
      |${armCtes(1)},
      |${armCtes(2)},
      |${armCtes(4)}
      |SELECT nprobe, n_queries, n_scored, n_cand_total, n_hits,
      |  CAST((n_hits * 1000000) // NULLIF(3 * n_queries, 0) AS BIGINT) AS recall_ppm
      |FROM (
      |  ${armSelect(1)}
      |  UNION ALL
      |  ${armSelect(2)}
      |  UNION ALL
      |  ${armSelect(4)})
      |ORDER BY nprobe""".stripMargin
  }

  // s41 — BRIDGE EDGES for the graph index (DiskANN's long-range links,
  // relationally): s40 measures the ceiling — the intra-cluster kNN ball
  // cannot leave the probed clusters, so recall@3 saturates at the IVF
  // truncation rate however many hops run. The fix every navigable-graph
  // index ships is cross-partition edges: here each vector gets ONE
  // bridge edge to its top-cosine neighbor inside its SECOND-nearest
  // cluster (the rn=2 coarse assignment — probeCentroids' gated
  // tie-break), and this table prices the lift: recall@3 + candidate
  // mass of the nprobe=2-seeded 2-hop ball over {intra-only edges,
  // intra+bridge}. Build cost: the bridge scoring joins each vector to
  // ONE other cluster's members — the same N²/k pair-mass class as the
  // intra kNN build itself, keyed on the cluster (never all-pairs); the
  // N×k second-cluster probe is a vec-keyed window over k rows per
  // vector, dwarfed by the pair scoring. Search cost: +1 out-edge per
  // vertex (edge list grows 4/3×), ball still ≤ 4 + 16 + 64.
  def s41GraphBridgedRecall(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    val cent = graft.ops.Similarity.buildCentroids(emb, dim = 64, chunks = centroidChunks)
    val assigned = graft.ops.Similarity.assignToCentroids(
      emb.select("vec_id", "embedding"), cent, Seq("vec_id"))
    val edges = knnEdges(assigned).select("id_a", "id_b")
      .localCheckpoint()
    val edgesB = edges
      .unionByName(bridgeEdges(emb, cent, assigned)) // shared with s34/s36/s38
      .localCheckpoint()
    val qRows = emb.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
      .localCheckpoint()
    val probesQ = graft.ops.Similarity.probeCentroids(
      qRows, cent, Seq("query_id"), nprobe = 2, embCol = "qv")
    val seeds = ivfSeeds(probesQ, assigned).localCheckpoint()
    val truth = graft.ops.Similarity.cosineTopK(emb, qRows, 3)
      .select(col("query_id"), col("neighbor_id").as("cand"))
      .localCheckpoint()
    val nq = qRows.agg(count(lit(1)).as("n_queries"))
    def arm(variant: String, es: DataFrame): DataFrame = {
      val h1 = seeds.select(col("query_id"), col("seed").as("id_a"))
        .join(es, Seq("id_a"))
        .select(col("query_id"), col("id_b").as("cand"))
      val h2 = h1.withColumnRenamed("cand", "id_a")
        .join(es, Seq("id_a"))
        .select(col("query_id"), col("id_b").as("cand"))
      val ball = seeds.select(col("query_id"), col("seed").as("cand"))
        .unionByName(h1).unionByName(h2)
        .distinct()
        .filter(col("cand") =!= col("query_id"))
        .localCheckpoint() // scored twice (hits + mass)
      val hits = truth.join(ball, Seq("query_id", "cand"), "left_semi")
        .agg(count(lit(1)).as("n_hits"))
      val mass = ball.agg(count(lit(1)).as("n_cand_total"))
      val ne = es.agg(count(lit(1)).as("n_edges"))
      nq.crossJoin(ne).crossJoin(mass).crossJoin(hits)
        .select(lit(variant).as("variant"), col("n_queries"), col("n_edges"),
          col("n_cand_total"), col("n_hits"),
          expr("(n_hits * 1000000) div nullif(3 * n_queries, 0)")
            .as("recall_ppm"))
    }
    arm("1_intra", edges).unionByName(arm("2_bridged", edgesB))
      .orderBy("variant")
  }

  val s41Oracle: String = {
    def armSelect(variant: String, ball: String, es: String): String =
      s"""SELECT '$variant' AS variant, nq.n_queries,
        |    (SELECT COUNT(*) FROM $es) AS n_edges,
        |    (SELECT COUNT(*) FROM $ball) AS n_cand_total,
        |    (SELECT COUNT(*) FROM truth t
        |     WHERE EXISTS (SELECT 1 FROM $ball b
        |       WHERE b.query_id = t.query_id AND b.cand = t.cand)) AS n_hits
        |  FROM nq""".stripMargin
    def ballCtes(name: String, es: String): String =
      s"""$name AS MATERIALIZED (
        |  SELECT DISTINCT query_id, cand FROM (
        |    SELECT query_id, seed AS cand FROM seeds
        |    UNION ALL
        |    SELECT s.query_id, e.id_b FROM seeds s JOIN $es e ON e.id_a = s.seed
        |    UNION ALL
        |    SELECT s.query_id, e2.id_b FROM seeds s
        |    JOIN $es e ON e.id_a = s.seed
        |    JOIN $es e2 ON e2.id_a = e.id_b)
        |  WHERE cand <> query_id
        |)""".stripMargin
    s"""WITH ${duckCentroidCtes(64, centroidChunks)}, assigned AS MATERIALIZED (
      |  SELECT vec_id, embedding, clabel FROM (
      |    SELECT e.vec_id, e.embedding, c.clabel,
      |      row_number() OVER (PARTITION BY e.vec_id
      |        ORDER BY ${duckCosOf("e.embedding", "c.cf")} DESC, c.clabel) AS rn
      |    FROM embeddings e, cent c)
      |  WHERE rn = 1
      |), edges AS MATERIALIZED (
      |  SELECT id_a, id_b FROM (
      |    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
      |      row_number() OVER (PARTITION BY a.clabel, a.vec_id
      |        ORDER BY ${duckCosOf("a.embedding", "b.embedding")} DESC, b.vec_id) AS rk
      |    FROM assigned a JOIN assigned b
      |      ON a.clabel = b.clabel AND a.vec_id <> b.vec_id)
      |  WHERE rk <= 3
      |), p2 AS MATERIALIZED (
      |  SELECT vec_id, embedding, clabel FROM (
      |    SELECT e.vec_id, e.embedding, c.clabel,
      |      row_number() OVER (PARTITION BY e.vec_id
      |        ORDER BY ${duckCosOf("e.embedding", "c.cf")} DESC, c.clabel) AS rn
      |    FROM embeddings e, cent c)
      |  WHERE rn = 2
      |), bridge AS MATERIALIZED (
      |  SELECT id_a, id_b FROM (
      |    SELECT p.vec_id AS id_a, b.vec_id AS id_b,
      |      row_number() OVER (PARTITION BY p.vec_id
      |        ORDER BY ${duckCosOf("p.embedding", "b.embedding")} DESC, b.vec_id) AS rk
      |    FROM p2 p JOIN assigned b ON b.clabel = p.clabel)
      |  WHERE rk = 1
      |), edgesb AS MATERIALIZED (
      |  SELECT id_a, id_b FROM edges
      |  UNION ALL
      |  SELECT id_a, id_b FROM bridge
      |), q AS MATERIALIZED (
      |  SELECT vec_id AS query_id, embedding AS qv
      |  FROM embeddings WHERE vec_id % 50 = 0
      |), qp AS MATERIALIZED (
      |  SELECT query_id, qv, clabel FROM (
      |    SELECT q.query_id, q.qv, c.clabel,
      |      row_number() OVER (PARTITION BY q.query_id
      |        ORDER BY ${duckCosOf("q.qv", "c.cf")} DESC, c.clabel) AS rn
      |    FROM q, cent c)
      |  WHERE rn <= 2
      |), seeds AS MATERIALIZED (
      |  SELECT query_id, seed FROM (
      |    SELECT p.query_id, a.vec_id AS seed,
      |      row_number() OVER (PARTITION BY p.query_id
      |        ORDER BY ${duckCosOf("p.qv", "a.embedding")} DESC, a.vec_id) AS rk
      |    FROM qp p JOIN assigned a
      |      ON a.clabel = p.clabel AND a.vec_id <> p.query_id)
      |  WHERE rk <= 3
      |), truth AS MATERIALIZED (
      |  SELECT query_id, cand FROM (
      |    SELECT query_id, vec_id AS cand,
      |      row_number() OVER (PARTITION BY query_id
      |        ORDER BY cos DESC, vec_id) AS rank
      |    FROM (
      |      SELECT query_id, vec_id, ${duckCosOf("q.qv", "embeddings.embedding")} AS cos
      |      FROM embeddings, q WHERE vec_id <> query_id))
      |  WHERE rank <= 3
      |), nq AS (SELECT COUNT(*) AS n_queries FROM q),
      |${ballCtes("balli", "edges")},
      |${ballCtes("ballb", "edgesb")}
      |SELECT variant, n_queries, n_edges, n_cand_total, n_hits,
      |  CAST((n_hits * 1000000) // NULLIF(3 * n_queries, 0) AS BIGINT) AS recall_ppm
      |FROM (
      |  ${armSelect("1_intra", "balli", "edges")}
      |  UNION ALL
      |  ${armSelect("2_bridged", "ballb", "edgesb")})
      |ORDER BY variant""".stripMargin
  }

  // s42 — STREAMING INDEX INGEST (s13's append leg as a stream): the
  // delta vectors arrive as a bounded micro-batch stream (two parquet
  // files, maxFilesPerTrigger=1) and every batch encodes against the
  // FROZEN coarse quantizer + codebook (FAISS add() never retrains)
  // inside foreachBatch — the production idempotent-append pattern —
  // landing cluster-coded rows in the parquet index. The search then
  // runs over base ∪ drained delta and must equal s13's one-shot batch
  // append, which sharing s13's oracle gates exactly: the cdc20/cdc41
  // state-≡-batch equivalence, for the vector index. Plan: encode per
  // micro-batch is s13's exact shape (broadcast centroid argmax +
  // narrow PqCodes map — per-batch work is a narrow pipeline over the
  // batch, no cross-batch state needed because the artifacts are
  // frozen); the search plan is s13's, untouched by how the index rows
  // arrived.
  def s42StreamIndexIngest(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.streaming.Trigger
    import graft.functions.PqFunctions
    val m = 8
    val root = CdcQueries.tmpFixtureDir("graft_s42_", dir)
    root.mkdirs()
    val feed = new java.io.File(root, "feed").getPath
    val sink = new java.io.File(root, "sink").getPath
    val ckpt = new java.io.File(root, "ckpt").getPath
    val emb = Tables.embeddings(spark, dir)
    val base = emb.filter(col("vec_id") % 10 =!= 0)
    val cent = graft.ops.Similarity.buildCentroids(base, dim = 64, chunks = centroidChunks)
    val codebook = graft.ops.Similarity.collectCodebook(cent)
    def encode(rows: DataFrame): DataFrame =
      graft.ops.Similarity.assignToCentroids(
          rows.select("vec_id", "embedding"), cent, Seq("vec_id"))
        .select(col("vec_id"), col("cluster"),
          PqFunctions.pqCodes(col("embedding"), codebook, m).as("codes"))
    // two installments → two micro-batches; adversarially interleaved
    // by id parity-of-20 so neither batch is a contiguous id range
    val delta = emb.filter(col("vec_id") % 10 === 0)
      .select("vec_id", "embedding")
    delta.filter(col("vec_id") % 20 === 0).coalesce(1)
      .write.mode("append").parquet(feed)
    delta.filter(col("vec_id") % 20 =!= 0).coalesce(1)
      .write.mode("append").parquet(feed)
    val sq = spark.readStream
      .schema("vec_id BIGINT, embedding ARRAY<FLOAT>")
      .option("maxFilesPerTrigger", 1)
      .parquet(feed)
      .writeStream
      .foreachBatch { (b: DataFrame, _: Long) =>
        encode(b).write.mode("append").parquet(sink)
      }
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    sq.awaitTermination()
    new java.io.File(sink).mkdirs() // empty feed → empty delta (cdc12 note)
    val deltaCodes = spark.read
      .schema("vec_id BIGINT, cluster BIGINT, codes ARRAY<BIGINT>")
      .parquet(sink)
    val encoded = encode(base).unionByName(deltaCodes)
    val q = graft.ops.Similarity.assignToCentroids(
        emb.filter(col("vec_id") % 50 === 0).select("vec_id", "embedding"),
        cent, Seq("vec_id"))
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"),
        col("cluster").as("qc"))
    pqSearch(emb, encoded, q, codebook, m, candK = 20,
      joinCond = col("cluster") === col("qc") && col("vec_id") =!= col("query_id"))
  }

  // s43 — STREAMING QUERY SERVING (s42's mirror: there the VECTORS
  // streamed against frozen artifacts; here the QUERIES do): the query
  // vectors arrive as a bounded micro-batch stream (two parquet files,
  // maxFilesPerTrigger=1), and each batch runs s03's IVF nprobe=1
  // search inside foreachBatch against an index that was built ONCE and
  // persisted to parquet before the stream started — the scatter-gather
  // serving path, where the index is a frozen artifact and per-batch
  // work is batch-queries × probed-cluster only. Sharing s03's oracle
  // gates the serving property that makes this layout correct: ANN
  // queries are row-independent, so a query set split across arbitrary
  // micro-batches drains to exactly the one-shot batch answer (the
  // cdc20/cdc41/s42 state-≡-batch equivalence, for the query side).
  // Plan per batch: broadcast the batch's assigned queries, cluster-
  // keyed equi-join against the parquet index scan, per-query top-5
  // window over ≤ cluster-sized candidates.
  def s43StreamSearch(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.streaming.Trigger
    val root = CdcQueries.tmpFixtureDir("graft_s43_", dir)
    root.mkdirs()
    val feed = new java.io.File(root, "feed").getPath
    val index = new java.io.File(root, "index").getPath
    val sink = new java.io.File(root, "sink").getPath
    val ckpt = new java.io.File(root, "ckpt").getPath
    val emb = Tables.embeddings(spark, dir)
    val cent = graft.ops.Similarity.buildCentroids(emb, dim = 64, chunks = centroidChunks)
      .localCheckpoint()
    // freeze the index as an artifact: cluster-assigned corpus, on disk
    graft.ops.Similarity.assignToCentroids(
        emb.select("vec_id", "embedding"), cent, Seq("vec_id"))
      .write.mode("overwrite").parquet(index)
    val assigned = spark.read.parquet(index) // footer schema — always written
    // query stream: s03's query set, adversarially split so neither
    // micro-batch is a contiguous id range
    val q0 = emb.filter(col("vec_id") % 50 === 0).select("vec_id", "embedding")
    q0.filter(col("vec_id") % 100 === 0).coalesce(1)
      .write.mode("append").parquet(feed)
    q0.filter(col("vec_id") % 100 =!= 0).coalesce(1)
      .write.mode("append").parquet(feed)
    val sq = spark.readStream
      .schema("vec_id BIGINT, embedding ARRAY<FLOAT>")
      .option("maxFilesPerTrigger", 1)
      .parquet(feed)
      .writeStream
      .foreachBatch { (b: DataFrame, _: Long) =>
        val q = graft.ops.Similarity.assignToCentroids(b, cent, Seq("vec_id"))
          .select(col("vec_id").as("query_id"), col("embedding").as("qv"),
            col("cluster").as("qc"))
        val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("vec_id"))
        assigned.join(broadcast(q),
            col("cluster") === col("qc") && col("vec_id") =!= col("query_id"))
          .withColumn("cos", cosineSim(col("qv"), col("embedding")))
          .withColumn("rank", row_number().over(w))
          .filter(col("rank") <= 5)
          .select(col("query_id"), col("qc").as("cluster"),
            col("rank"), col("vec_id").as("neighbor_id"))
          .write.mode("append").parquet(sink)
      }
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    sq.awaitTermination()
    new java.io.File(sink).mkdirs() // empty feed → empty result (cdc12 note)
    spark.read
      .schema("query_id BIGINT, cluster INT, rank INT, neighbor_id BIGINT")
      .parquet(sink)
      .orderBy("query_id", "rank")
  }

  // s47 — MATRYOSHKA TRUNCATION RECALL (Kusupati et al. 2022): MRL-style
  // deployments serve the PREFIX of an embedding (first 16/32 of 64
  // dims) to cut index bytes and distance FLOPs 2–4×, betting that
  // prefix ordering approximates full ordering. s47 measures that bet
  // the way s19/s29/s38 measure theirs — exact top-3 under each prefix
  // length vs exact top-3 under the full vector, fleet recall in ppm —
  // with dim = 64 riding along as the must-be-exactly-1e6 control row.
  // The slice is `slice(embedding, 1, d)` on BOTH sides, so the kernel's
  // ascending-index cosine fold is unchanged and every truncated cosine
  // stays bit-identical cross-engine (the s01 float discipline survives
  // truncation because truncation preserves fold order). Queries are
  // s01's 1/50 id slice; the cost is the three brute-force scans (the
  // dim-64 truth scan runs once and reuses as its own control arm) —
  // this is the calibration table a team runs ONCE per model to pick a
  // serving dim, not a serving path (s03/s44 are the serving paths).
  def s47Matryoshka(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    def topkAt(d: Int): DataFrame = {
      val c = emb.select(col("vec_id"),
        slice(col("embedding"), 1, d).as("embedding"))
      val q = c.filter(col("vec_id") % 50 === 0)
        .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
      graft.ops.Similarity.cosineTopK(c, q, 3)
        .select(col("query_id"), col("neighbor_id"))
        .withColumn("dim", lit(d.toLong))
    }
    val truth = topkAt(64).drop("dim").localCheckpoint(true)
    val ests = Seq(16, 32).map(topkAt).reduce(_.unionByName(_))
      .unionByName(truth.withColumn("dim", lit(64L)))
    val nq = emb.filter(col("vec_id") % 50 === 0)
      .agg(count(lit(1)).as("n_queries"))
    val hits = ests.join(truth, Seq("query_id", "neighbor_id"))
      .groupBy("dim").agg(count(lit(1)).as("n_hits"))
    // literal dim spine: a prefix length with ZERO overlap must still
    // report its (honest) 0-recall row
    import spark.implicits._
    Seq(16L, 32L, 64L).toDF("dim")
      .join(hits, Seq("dim"), "left")
      .crossJoin(broadcast(nq))
      .select(col("dim"), col("n_queries"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        expr("coalesce(n_hits, 0L) * 1000000L" +
          " div greatest(3 * n_queries, 1L)").as("recall_ppm"))
      .orderBy("dim")
  }

  val s47Oracle: String =
    """WITH q AS (
      |  SELECT vec_id AS query_id, embedding AS qv FROM embeddings
      |  WHERE vec_id % 50 = 0
      |), dims AS (SELECT unnest([16, 32, 64]) AS dim),
      |scored AS (
      |  SELECT d.dim, q.query_id, e.vec_id,
      |    list_sum(list_transform(list_zip(q.qv[1:d.dim], e.embedding[1:d.dim]),
      |      x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))
      |    / sqrt(list_sum(list_transform(q.qv[1:d.dim],
      |        x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))
      |      * list_sum(list_transform(e.embedding[1:d.dim],
      |        x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS cos
      |  FROM embeddings e, q, dims d WHERE e.vec_id <> q.query_id
      |), top AS (
      |  SELECT dim, query_id, vec_id AS neighbor_id FROM (
      |    SELECT dim, query_id, vec_id,
      |      row_number() OVER (PARTITION BY dim, query_id
      |                         ORDER BY cos DESC, vec_id) AS rank
      |    FROM scored)
      |  WHERE rank <= 3
      |), truth AS (
      |  SELECT query_id, neighbor_id FROM top WHERE dim = 64
      |), hits AS (
      |  SELECT t.dim, COUNT(*) AS n_hits
      |  FROM top t JOIN truth u
      |    ON t.query_id = u.query_id AND t.neighbor_id = u.neighbor_id
      |  GROUP BY t.dim
      |), nq AS (SELECT COUNT(*) AS n_queries FROM q)
      |SELECT CAST(d.dim AS BIGINT) AS dim, nq.n_queries,
      |  CAST(COALESCE(h.n_hits, 0) AS BIGINT) AS n_hits,
      |  CAST(COALESCE(h.n_hits, 0) * 1000000
      |    // greatest(3 * nq.n_queries, 1) AS BIGINT) AS recall_ppm
      |FROM dims d LEFT JOIN hits h ON h.dim = d.dim
      |CROSS JOIN nq ORDER BY d.dim""".stripMargin

  // s48 — HARD-NEGATIVE MINING (the contrastive-training data step every
  // embedding-model pipeline runs — SimCSE/SBERT's triplet construction):
  // per anchor query, the exact nearest SAME-label neighbor (the
  // positive) and the exact nearest DIFFERENT-label neighbor (the hard
  // negative — the pair that actually moves a contrastive loss), plus
  // the margin between them. A small margin flags anchors whose labels
  // the embedding can't yet separate — the rows a curriculum samples
  // first. Exactness: cosines floored to micros through the shared
  // double dag (the s32/s22 discipline); selection ties break on
  // vec_id. Plan: the s01 broadcast-query single corpus scan, one
  // window over (query, same-label) — never all-pairs, anchors
  // broadcast.
  def s48HardNegatives(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    val q = emb.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("query_id"), col("label").as("qlabel"),
        col("embedding").as("qv"))
    val wS = Window.partitionBy("query_id", "same")
      .orderBy(col("cos").desc, col("vec_id"))
    val top = emb.join(broadcast(q), col("vec_id") =!= col("query_id"))
      .withColumn("same", col("label") === col("qlabel"))
      .withColumn("cos", cosineSim(col("qv"), col("embedding")))
      .withColumn("rk", row_number().over(wS))
      .filter(col("rk") === 1)
      .withColumn("cos_micro", floor(col("cos") * 1000000d).cast("long"))
    top.groupBy("query_id")
      .agg(max(when(col("same"), col("vec_id"))).as("pos_id"),
        max(when(col("same"), col("cos_micro"))).as("pos_cos_micro"),
        max(when(!col("same"), col("vec_id"))).as("neg_id"),
        max(when(!col("same"), col("cos_micro"))).as("neg_cos_micro"))
      .withColumn("margin_micro", col("pos_cos_micro") - col("neg_cos_micro"))
      .orderBy("query_id")
  }

  val s48Oracle: String =
    s"""WITH q AS (
      |  SELECT vec_id AS query_id, label AS qlabel, embedding AS qv
      |  FROM embeddings WHERE vec_id % 50 = 0
      |), scored AS (
      |  SELECT query_id, e.vec_id, e.label = q.qlabel AS same,
      |    ${duckCosOf("q.qv", "e.embedding")} AS cos
      |  FROM embeddings e, q WHERE e.vec_id <> q.query_id
      |), top AS (
      |  SELECT query_id, vec_id, same,
      |    CAST(floor(cos * 1000000) AS BIGINT) AS cos_micro
      |  FROM (
      |    SELECT *, row_number() OVER (PARTITION BY query_id, same
      |      ORDER BY cos DESC, vec_id) AS rk
      |    FROM scored)
      |  WHERE rk = 1
      |)
      |SELECT query_id,
      |  MAX(CASE WHEN same THEN vec_id END) AS pos_id,
      |  MAX(CASE WHEN same THEN cos_micro END) AS pos_cos_micro,
      |  MAX(CASE WHEN NOT same THEN vec_id END) AS neg_id,
      |  MAX(CASE WHEN NOT same THEN cos_micro END) AS neg_cos_micro,
      |  MAX(CASE WHEN same THEN cos_micro END)
      |    - MAX(CASE WHEN NOT same THEN cos_micro END) AS margin_micro
      |FROM top GROUP BY query_id ORDER BY query_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "s49_graph_filtered" -> (s49GraphFiltered _),
    "s50_beam_sweep" -> (s50BeamSweep _),
    "s48_hard_negatives" -> (s48HardNegatives _),
    "s47_matryoshka" -> (s47Matryoshka _),
    "s01_ann_bruteforce" -> (s01AnnBruteForce _),
    "s43_stream_search" -> (s43StreamSearch _),
    "s44_batch_search" -> (s44BatchSearch _),
    "s45_mutual_nn" -> (s45MutualNn _),
    "s46_cdc_index_sync" -> (s46CdcIndexSync _),
    "s39_ann_ivf_sq8_res" -> (s39AnnIvfSq8Res _),
    "s40_graph_seed_sweep" -> (s40GraphSeedSweep _),
    "s41_graph_bridged_recall" -> (s41GraphBridgedRecall _),
    "s42_stream_index_ingest" -> (s42StreamIndexIngest _),
    "s02_ann_lsh" -> (s02AnnLsh _),
    "s03_ann_ivf" -> (s03AnnIvf _),
    "s04_ann_ivf_nprobe" -> (s04AnnIvfProbe _),
    "s05_ann_pq" -> (s05AnnPq _),
    "s06_ann_ivfpq" -> (s06AnnIvfPq _),
    "s07_kmeans" -> (s07Kmeans _),
    "s08_ann_ivfpq_res" -> (s08AnnIvfPqResidual _),
    "s09_kmeans_multi" -> (s09KmeansMulti _),
    "s10_ann_ivfpq_probe" -> (s10AnnIvfPqProbe _),
    "s11_ann_ivfpq_res_probe" -> (s11AnnIvfPqResProbe _),
    "s12_ann_ivfpq_persisted" -> (s12AnnIvfPqPersisted _),
    "s13_ann_index_append" -> (s13AnnIndexAppend _),
    "s14_ann_sq8" -> (s14AnnSq8 _),
    "s15_ann_ivf_sq8" -> (s15AnnIvfSq8 _),
    "s16_ann_ivfpq_res_kmeans" -> (s16AnnIvfPqResKmeans _),
    "s17_ann_filtered" -> (s17AnnFiltered _),
    "s18_cluster_purity" -> (s18ClusterPurity _),
    "s19_ann_recall" -> (s19AnnRecall _),
    "s20_ann_tombstones" -> (s20AnnTombstones _),
    "s21_ann_range" -> (s21AnnRange _),
    "s22_pq_distortion" -> (s22PqDistortion _),
    "s23_ivf_stats" -> (s23IvfStats _),
    "s24_cluster_prototypes" -> (s24ClusterPrototypes _),
    "s25_knn_graph" -> (s25KnnGraph _),
    "s26_production_search" -> (s26ProductionSearch _),
    "s27_ann_binary" -> (s27AnnBinary _),
    "s28_mmr_diversify" -> (s28MmrDiversify _),
    "s29_recall_matrix" -> (s29RecallMatrix _),
    "s30_sharded_search" -> (s30ShardedSearch _),
    "s31_centroid_drift" -> (s31CentroidDrift _),
    "s32_power_iteration" -> (s32PowerIteration _),
    "s33_pca_residual_search" -> (s33PcaResidualSearch _),
    "s34_graph_search" -> (s34GraphSearch _),
    "s35_opq_distortion" -> (s35OpqDistortion _),
    "s36_graph_persisted" -> (s36GraphPersisted _),
    "s37_hybrid_rrf" -> (s37HybridRrf _),
    "s38_graph_recall" -> (s38GraphRecall _),
    "d05_embed_neardup" -> (d05EmbedNearDup _),
    "d07_embed_neardup_lsh" -> (d07EmbedNearDupLsh _),
    "d14_semdedup" -> (d14SemDedup _),
    "d16_lsh_recall" -> (d16LshRecall _),
  )

  val oracles: Map[String, String] = Map(
    "s47_matryoshka" -> s47Oracle,
    "s48_hard_negatives" -> s48Oracle,
    "s49_graph_filtered" -> s49Oracle,
    "s50_beam_sweep" -> s50Oracle,
    "s01_ann_bruteforce" -> s01Oracle,
    "s02_ann_lsh" -> s02Oracle,
    "s03_ann_ivf" -> s03Oracle,
    "s43_stream_search" -> s03Oracle, // drained query stream == one-shot batch search
    "s44_batch_search" -> s03Oracle, // shuffled-probe plan, identical rows
    "s45_mutual_nn" -> s45Oracle,
    "s46_cdc_index_sync" -> s46Oracle,
    "s04_ann_ivf_nprobe" -> s04Oracle,
    "s05_ann_pq" -> s05Oracle,
    "s06_ann_ivfpq" -> s06Oracle,
    "s07_kmeans" -> s07Oracle,
    "s08_ann_ivfpq_res" -> s08Oracle,
    "s09_kmeans_multi" -> s09Oracle,
    "s10_ann_ivfpq_probe" -> s10Oracle,
    "s11_ann_ivfpq_res_probe" -> s11Oracle,
    "s12_ann_ivfpq_persisted" -> s06Oracle, // same search, persisted index
    "s13_ann_index_append" -> s13Oracle,
    "s14_ann_sq8" -> s14Oracle,
    "s15_ann_ivf_sq8" -> s15Oracle,
    "s16_ann_ivfpq_res_kmeans" -> s16Oracle,
    "s17_ann_filtered" -> s17Oracle,
    "s18_cluster_purity" -> s18Oracle,
    "s19_ann_recall" -> s19Oracle,
    "s20_ann_tombstones" -> s20Oracle,
    "s21_ann_range" -> s21Oracle,
    "s22_pq_distortion" -> s22Oracle,
    "s23_ivf_stats" -> s23Oracle,
    "s24_cluster_prototypes" -> s24Oracle,
    "s25_knn_graph" -> s25Oracle,
    "s26_production_search" -> s26Oracle,
    "s27_ann_binary" -> s27Oracle,
    "s28_mmr_diversify" -> s28Oracle,
    "s29_recall_matrix" -> s29Oracle,
    "s30_sharded_search" -> s30Oracle,
    "s31_centroid_drift" -> s31Oracle,
    "s32_power_iteration" -> s32Oracle,
    "s33_pca_residual_search" -> s33Oracle,
    "s34_graph_search" -> s34Oracle,
    "s35_opq_distortion" -> s35Oracle,
    "s36_graph_persisted" -> s34Oracle, // same search, persisted graph index
    "s37_hybrid_rrf" -> s37Oracle,
    "s38_graph_recall" -> s38Oracle,
    "s39_ann_ivf_sq8_res" -> s39Oracle,
    "s40_graph_seed_sweep" -> s40Oracle,
    "s41_graph_bridged_recall" -> s41Oracle,
    "s42_stream_index_ingest" -> s13Oracle, // streamed ingest == batch append
    "d05_embed_neardup" -> d05Oracle,
    "d07_embed_neardup_lsh" -> d07Oracle,
    "d14_semdedup" -> d14Oracle,
    "d16_lsh_recall" -> d16Oracle,
  )
}
