package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Graph analytics over the co-purchase graph (parts co-occurring in an
  * order, edge weight = co-occurrence count, thresholded at ≥ 2 — q33's
  * pair semantics promoted to an edge list): deterministic PageRank and
  * exact triangle counting — the two classic distributed graph kernels a
  * relational engine is asked for first (recommendation centrality,
  * community density).
  *
  * Float discipline: PageRank's per-vertex neighbor-contribution sum is
  * the one order-dependent float fold in the family, closed the same way
  * every fold in this engine is closed — contributions collect into a
  * src-sorted list and fold ascending (the oracle's `list_sum` over
  * `list(... ORDER BY src)`), so ranks are bit-identical cross-engine and
  * under any partitioning. Triangle counting is pure integer joins.
  *
  * Scale notes: the edge list shuffles on the vertex key; per-vertex
  * adjacency lists are bounded by the weight threshold (at 100 TB raise
  * the threshold or cap lists — the documented dial); rank tables
  * materialize per round (localCheckpoint) so the 3-round lineage stays
  * flat — the s09/s32 iteration discipline.
  */
object GraphQueries {

  /** Thresholded co-purchase pairs WITH their weight — the single edge
    * definition of the family: (pa < pb, w = co-occurrence count ≥ 2).
    * [[edges]] drops the weight; g11 keeps it for the cost term. */
  private def weightedPairs(spark: SparkSession, dir: String): DataFrame = {
    val op = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_partkey")).distinct()
    op.select(col("l_orderkey"), col("l_partkey").as("pa"))
      .join(op.select(col("l_orderkey"), col("l_partkey").as("pb")),
        Seq("l_orderkey"))
      .filter(col("pa") < col("pb"))
      .groupBy("pa", "pb").agg(count(lit(1)).as("w"))
      .filter(col("w") >= 2)
  }

  /** Undirected thresholded co-purchase edges, one row per direction
    * (src, dst): the adjacency both kernels consume. */
  private def edges(spark: SparkSession, dir: String): DataFrame = {
    val pairs = weightedPairs(spark, dir)
    pairs.select(col("pa").as("src"), col("pb").as("dst"))
      .unionByName(pairs.select(col("pb").as("src"), col("pa").as("dst")))
  }

  private val duckEdgesCte: String =
    """op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
      |pairs AS (
      |  SELECT a.l_partkey AS pa, b.l_partkey AS pb, COUNT(*) AS w
      |  FROM op a JOIN op b ON a.l_orderkey = b.l_orderkey
      |    AND a.l_partkey < b.l_partkey
      |  GROUP BY 1, 2 HAVING COUNT(*) >= 2
      |), e AS (
      |  SELECT pa AS src, pb AS dst FROM pairs
      |  UNION ALL
      |  SELECT pb, pa FROM pairs
      |)""".stripMargin

  // g01 — DETERMINISTIC PAGERANK (damping 0.85, 3 rounds, unnormalized
  // r₀ = 1): r'(v) = 0.15 + 0.85·Σ_{u→v} r(u)/deg(u), the neighbor sum
  // folded in ascending-src order per vertex. Each round is ONE shuffle
  // on dst plus a broadcast-free join of the (vertex, rank) table back
  // onto the edge list keyed on src — the textbook Pregel round as
  // plain relational ops; ranks materialize between rounds. Output:
  // global top-20 by (rank DESC, part), rank floor-scaled to micros.
  def g01Pagerank(spark: SparkSession, dir: String): DataFrame = {
    val e = edges(spark, dir).localCheckpoint()
    val deg = e.groupBy("src").agg(count(lit(1)).as("deg"))
    var ranks = deg.select(col("src").as("part"), lit(1.0).as("r"))
      .localCheckpoint()
    for (_ <- 1 to 3) {
      val contribs = e.join(ranks.withColumnRenamed("part", "src"), Seq("src"))
        .join(deg, Seq("src"))
        .select(col("dst"), col("src"), (col("r") / col("deg")).as("contrib"))
      // the neighbor fold runs through the native OrderedVecFieldSum
      // kernel (1-dim vector per contribution) instead of the interpreted
      // `aggregate` HOF — identical ascending add order, so the doubles
      // (and the oracle hashes) are bit-identical; the HOF dispatched
      // one interpreted lambda per contribution (the r8 FoldFunctions
      // lesson). TWO-LEVEL chunked (the buildCentroids discipline, r10):
      // a celebrity vertex's full in-neighborhood in ONE collect buffer
      // is the d02 posting-buffer OOM in graph clothing, so chunk on
      // src div 2^10 — level 1 folds ≤1024 contributions per (dst,
      // chunk) in src order, level 2 folds the ≤degree/1024 chunk
      // partials in chunk order; the oracle mirrors both levels
      // textually, so the regrouped IEEE adds stay bit-identical.
      val summed = contribs
        .withColumn("chunk", expr("src div 1024"))
        .groupBy(col("dst"), col("chunk"))
        .agg(array_sort(collect_list(
          struct(col("src"), array(col("contrib")).as("cv")))).as("cs"))
        .select(col("dst"), col("chunk"),
          array(element_at(
            graft.functions.FoldFunctions.vecFieldSum(col("cs"), "cv", 1), 1))
            .as("pv"))
        .groupBy(col("dst"))
        .agg(array_sort(collect_list(struct(col("chunk"), col("pv")))).as("cs2"))
        .select(col("dst").as("part"),
          (lit(0.15) + lit(0.85) * element_at(
            graft.functions.FoldFunctions.vecFieldSum(col("cs2"), "pv", 1), 1))
            .as("r"))
      ranks = summed.localCheckpoint()
    }
    // top-20 via orderBy().limit() — TakeOrderedAndProject's distributed
    // per-partition top-k + driver merge, never a single-partition sort
    // of the full vertex rank table (r9 verdict nit); the positional
    // window then runs over the 20 surviving rows only
    val w = Window.orderBy(col("r").desc, col("part"))
    ranks.join(deg.withColumnRenamed("src", "part"), Seq("part"))
      .orderBy(col("r").desc, col("part"))
      .limit(20)
      .withColumn("pos", row_number().over(w).cast("int"))
      .select(col("pos"), col("part"), col("deg"),
        floor(col("r") * 1000000).cast("long").as("rank_micro"))
      .orderBy("pos")
  }

  val g01Oracle: String = {
    def round(k: Int): String =
      s"""r$k AS (
        |  SELECT dst AS part,
        |    CAST(0.15 AS DOUBLE) + CAST(0.85 AS DOUBLE) * list_sum(
        |      list_transform(ch, c -> c.s)) AS r
        |  FROM (
        |    SELECT dst,
        |      list(struct_pack(chunk := chunk, s := s) ORDER BY chunk) AS ch
        |    FROM (
        |      SELECT e.dst, e.src // 1024 AS chunk,
        |        list_sum(list_transform(
        |          list(struct_pack(src := e.src, contrib := p.r / d.deg)
        |               ORDER BY e.src),
        |          c -> c.contrib)) AS s
        |      FROM e
        |      JOIN r${k - 1} p ON p.part = e.src
        |      JOIN deg d ON d.src = e.src
        |      GROUP BY e.dst, chunk)
        |    GROUP BY dst)
        |)""".stripMargin
    s"""WITH $duckEdgesCte, deg AS (
      |  SELECT src, COUNT(*) AS deg FROM e GROUP BY src
      |), r0 AS (
      |  SELECT src AS part, CAST(1.0 AS DOUBLE) AS r FROM deg
      |), ${round(1)}, ${round(2)}, ${round(3)}
      |SELECT pos, part, deg, rank_micro FROM (
      |  SELECT CAST(row_number() OVER (ORDER BY r.r DESC, r.part) AS INT) AS pos,
      |    r.part, d.deg, CAST(floor(r.r * 1000000) AS BIGINT) AS rank_micro
      |  FROM r3 r JOIN deg d ON d.src = r.part)
      |WHERE pos <= 20 ORDER BY pos""".stripMargin
  }

  // g02 — EXACT TRIANGLE COUNT + wedge census: triangles enumerated on
  // the ORIENTED (a < b) edge list — e(a,b) ⋈ e(b,c) ⋈ e(a,c), each
  // triangle counted exactly once — and wedges (open 2-paths) from the
  // undirected degree census. Two vertex-keyed equi-join shuffles;
  // everything is integer, so the gate is exact. The wedge/triangle
  // pair is the global clustering coefficient's numerator/denominator,
  // published as raw integers (the cross-engine-stable form).
  def g02Triangles(spark: SparkSession, dir: String): DataFrame = {
    val e = edges(spark, dir)
    val oriented = e.filter(col("src") < col("dst")).localCheckpoint()
    val tri = oriented.select(col("src").as("a"), col("dst").as("b"))
      .join(oriented.select(col("src").as("b"), col("dst").as("c")), Seq("b"))
      .join(oriented.select(col("src").as("a"), col("dst").as("c")),
        Seq("a", "c"), "left_semi")
      .agg(count(lit(1)).as("n_triangles"))
    val deg = e.groupBy("src").agg(count(lit(1)).as("deg"))
    // integer division throughout: deg·(deg−1) is even, and keeping the
    // per-vertex wedge count a LONG keeps the global sum exact past the
    // 2^53 double envelope
    val census = deg.agg(
      count(lit(1)).as("n_vertices"),
      expr("sum(deg) div 2").as("n_edges"),
      sum(expr("(deg * (deg - 1)) div 2")).as("n_wedges"))
    census.crossJoin(tri)
      .select("n_vertices", "n_edges", "n_wedges", "n_triangles")
  }

  val g02Oracle: String =
    s"""WITH $duckEdgesCte, o AS (
      |  SELECT src AS a, dst AS b FROM e WHERE src < dst
      |), tri AS (
      |  SELECT COUNT(*) AS n_triangles
      |  FROM o e1 JOIN o e2 ON e1.b = e2.a
      |  WHERE EXISTS (SELECT 1 FROM o e3 WHERE e3.a = e1.a AND e3.b = e2.b)
      |), deg AS (
      |  SELECT src, COUNT(*) AS deg FROM e GROUP BY src
      |), census AS (
      |  SELECT COUNT(*) AS n_vertices,
      |    CAST(SUM(deg) // 2 AS BIGINT) AS n_edges,
      |    CAST(SUM((deg * (deg - 1)) // 2) AS BIGINT) AS n_wedges
      |  FROM deg
      |)
      |SELECT n_vertices, n_edges, n_wedges, n_triangles FROM census, tri""".stripMargin

  // g03 — K-CORE DECOMPOSITION (k = 3, bounded peel): iteratively drop
  // vertices of degree < k and the edges touching them — the standard
  // "dense community backbone" extraction (k-core is what graph
  // preprocessing runs before community detection or GNN sampling to
  // shed the long low-degree tail). Each peel round is one degree
  // aggregate plus two vertex-keyed LEFT SEMI joins — exactly the
  // Pregel round as relational ops; the survivor edge set materializes
  // between rounds (localCheckpoint) so the lineage stays flat at any
  // round count (the s09/g01 iteration discipline). The round ladder is
  // UNROLLED to a fixed depth on both engines and the gate pins every
  // intermediate peel GENERATION (the bounded-round formulation; a
  // fixpoint run just raises `rounds` — the documented dial; on the
  // gate data sf0.1 empties by round 2 while sf0.01 is still shedding
  // its low-degree fringe at round 4, so the ladder exercises both the
  // converged and the still-peeling regime). Everything is integer; the
  // vertex-id checksum pins the exact surviving set. At 100 TB: no
  // round shuffles more than the live edge list on its vertex key, and
  // the live set only shrinks. Oracle note: each round's CTE references
  // its predecessor twice (degree filter + edge restriction) — without
  // MATERIALIZED, CTE inlining re-evaluates the chain exponentially.
  def g03Kcore(spark: SparkSession, dir: String): DataFrame = {
    val k = 3
    val rounds = 4
    def stats(e: DataFrame, r: Int): DataFrame =
      e.agg(
        countDistinct(col("src")).as("n_vertices"),
        expr("count(*) div 2").as("n_edges"),
        coalesce(sum_distinct(col("src")), lit(0L)).as("vid_sum"))
        .select(lit(r).cast("int").as("round"), col("n_vertices"),
          col("n_edges"), col("vid_sum"))
    var live = edges(spark, dir).localCheckpoint()
    val perRound = scala.collection.mutable.ArrayBuffer(stats(live, 0))
    for (r <- 1 to rounds) {
      val keep = live.groupBy("src").agg(count(lit(1)).as("deg"))
        .filter(col("deg") >= k).select("src")
      live = live
        .join(keep, Seq("src"), "left_semi")
        .join(keep.withColumnRenamed("src", "dst"), Seq("dst"), "left_semi")
        .select("src", "dst").localCheckpoint()
      perRound += stats(live, r)
    }
    perRound.reduce(_.unionByName(_)).orderBy("round")
  }

  val g03Oracle: String = {
    val k = 3
    val rounds = 4
    val roundCtes = (1 to rounds).map { r =>
      s"""k$r AS MATERIALIZED (
        |  SELECT src FROM e${r - 1} GROUP BY src HAVING COUNT(*) >= $k),
        |e$r AS MATERIALIZED (
        |  SELECT t.src, t.dst FROM e${r - 1} t
        |  JOIN k$r a ON t.src = a.src JOIN k$r b ON t.dst = b.src
        |)""".stripMargin
    }.mkString(", ")
    val stats = (0 to rounds).map { r =>
      s"""SELECT CAST($r AS INT) AS round,
        |  CAST(COUNT(DISTINCT src) AS BIGINT) AS n_vertices,
        |  CAST(COUNT(*) // 2 AS BIGINT) AS n_edges,
        |  CAST(COALESCE(SUM(DISTINCT src), 0) AS BIGINT) AS vid_sum
        |FROM e$r""".stripMargin
    }.mkString(" UNION ALL ")
    s"""WITH $duckEdgesCte, e0 AS MATERIALIZED (SELECT src, dst FROM e), $roundCtes
      |SELECT round, n_vertices, n_edges, vid_sum FROM ($stats)
      |ORDER BY round""".stripMargin
  }

  // g04 — COMMON-NEIGHBOR LINK PREDICTION (the Liben-Nowell–Kleinberg
  // score family): for every non-adjacent vertex pair with ≥ 2 common
  // neighbors, the neighbor-set Jaccard — the "customers who bought
  // these two parts' shared companions" recommendation score. Wedge
  // enumeration is ONE self-equi-join of the edge list on the center
  // vertex (the g02 wedge census's cost model, Σ deg² — bounded by the
  // same weight-threshold dial); adjacency is subtracted with a LEFT
  // ANTI join on the oriented edge set, and degrees arrive by two
  // vertex-keyed joins. Jaccard in exact integer ppm — cn·10⁶ div
  // (deg_a + deg_b − cn) — so the global top-25 ranking (ties by pair)
  // is bit-stable cross-engine. The final window is a top-k over the
  // scored-pair table, not the corpus.
  def g04LinkPrediction(spark: SparkSession, dir: String): DataFrame = {
    val e = edges(spark, dir).localCheckpoint() // wedge join probes it twice
    val deg = e.groupBy("src").agg(count(lit(1)).as("deg"))
    val wedges = e.select(col("src").as("x"), col("dst").as("a"))
      .join(e.select(col("src").as("x"), col("dst").as("b")), Seq("x"))
      .filter(col("a") < col("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("cn"))
      .filter(col("cn") >= 2)
    val oriented = e.filter(col("src") < col("dst"))
      .select(col("src").as("a"), col("dst").as("b"))
    val nonAdj = wedges.join(oriented, Seq("a", "b"), "left_anti")
      .join(deg.select(col("src").as("a"), col("deg").as("deg_a")), Seq("a"))
      .join(deg.select(col("src").as("b"), col("deg").as("deg_b")), Seq("b"))
      .withColumn("jaccard_ppm",
        expr("(cn * 1000000) div (deg_a + deg_b - cn)"))
    val w = Window.orderBy(col("jaccard_ppm").desc, col("a"), col("b"))
    nonAdj.withColumn("pos", row_number().over(w).cast("int"))
      .filter(col("pos") <= 25)
      .select("pos", "a", "b", "cn", "deg_a", "deg_b", "jaccard_ppm")
      .orderBy("pos")
  }

  val g04Oracle: String =
    s"""WITH $duckEdgesCte, deg AS (
      |  SELECT src, COUNT(*) AS deg FROM e GROUP BY src
      |), wedges AS (
      |  SELECT ea.dst AS a, eb.dst AS b, COUNT(*) AS cn
      |  FROM e ea JOIN e eb ON ea.src = eb.src AND ea.dst < eb.dst
      |  GROUP BY 1, 2 HAVING COUNT(*) >= 2
      |), nonadj AS (
      |  SELECT w.a, w.b, w.cn, da.deg AS deg_a, db.deg AS deg_b,
      |    (w.cn * 1000000) // (da.deg + db.deg - w.cn) AS jaccard_ppm
      |  FROM wedges w
      |  JOIN deg da ON da.src = w.a
      |  JOIN deg db ON db.src = w.b
      |  WHERE NOT EXISTS (
      |    SELECT 1 FROM e WHERE e.src = w.a AND e.dst = w.b)
      |)
      |SELECT pos, a, b, cn, deg_a, deg_b, CAST(jaccard_ppm AS BIGINT) AS jaccard_ppm
      |FROM (
      |  SELECT CAST(row_number() OVER (
      |      ORDER BY jaccard_ppm DESC, a, b) AS INT) AS pos, *
      |  FROM nonadj)
      |WHERE pos <= 25 ORDER BY pos""".stripMargin

  // g05 — LABEL-PROPAGATION COMMUNITY DETECTION (Raghavan et al.'s LPA,
  // made deterministic): labels start as vertex ids; each synchronous
  // round every vertex adopts the label most frequent among its
  // neighbors, ties broken by the SMALLEST label (LPA's classic
  // nondeterminism — random tie-breaks and visit order — is replaced by
  // a total order so the gate can pin the result; 2 unrolled rounds).
  // Distinct from d10/g03: CC propagates min over any connectivity, LPA
  // aggregates neighbor MAJORITY — it splits a connected graph into
  // dense communities. Each round = one dst-keyed join to fetch neighbor
  // labels + one (vertex, label) count agg + one per-vertex argmax
  // (min_by on (−cnt, label) — an aggregate, not a sort); labels
  // materialize between rounds (the g01 discipline). Output pins the
  // full community census: per final label, size + member checksum.
  /** Two synchronous label-propagation rounds over a (src, dst) edge
    * table (majority label, ties by smallest label): the community
    * assignment g05 reports and g12 scores. */
  private def propLabels(e: DataFrame): DataFrame = {
    val verts = e.select(col("src").as("v")).distinct()
    var labels = verts.select(col("v"), col("v").as("lbl")).localCheckpoint()
    for (_ <- 1 to 2) {
      val nbr = e.join(labels.withColumnRenamed("v", "dst"), Seq("dst"))
        .groupBy(col("src").as("v"), col("lbl"))
        .agg(count(lit(1)).as("cnt"))
      val adopted = nbr.groupBy("v")
        .agg(min_by(col("lbl"), struct((-col("cnt")).as("nc"), col("lbl")))
          .as("new_lbl"))
      labels = verts
        .join(adopted, Seq("v"), "left")
        .join(labels, Seq("v"))
        .select(col("v"), coalesce(col("new_lbl"), col("lbl")).as("lbl"))
        .localCheckpoint()
    }
    labels
  }

  def g05LabelProp(spark: SparkSession, dir: String): DataFrame = {
    val e = edges(spark, dir).localCheckpoint()
    propLabels(e).groupBy(col("lbl").as("community"))
      .agg(count(lit(1)).as("n_members"), sum(col("v")).as("member_sum"))
      .orderBy("community")
  }

  /** The label-propagation CTE chain (l0 → l2), shared by g05 and g12. */
  private val duckLabelCtes: String = {
    def round(k: Int): String =
      s"""nbr$k AS MATERIALIZED (
        |  SELECT e.src AS v, l.lbl, COUNT(*) AS cnt
        |  FROM e JOIN l${k - 1} l ON l.v = e.dst
        |  GROUP BY e.src, l.lbl
        |), ad$k AS MATERIALIZED (
        |  SELECT v, lbl AS new_lbl FROM (
        |    SELECT v, lbl,
        |      row_number() OVER (PARTITION BY v ORDER BY cnt DESC, lbl) AS rn
        |    FROM nbr$k)
        |  WHERE rn = 1
        |), l$k AS MATERIALIZED (
        |  SELECT p.v, COALESCE(a.new_lbl, p.lbl) AS lbl
        |  FROM l${k - 1} p LEFT JOIN ad$k a ON a.v = p.v
        |)""".stripMargin
    s"""l0 AS MATERIALIZED (
      |  SELECT DISTINCT src AS v, src AS lbl FROM e
      |), ${round(1)}, ${round(2)}""".stripMargin
  }

  val g05Oracle: String =
    s"""WITH $duckEdgesCte, $duckLabelCtes
      |SELECT lbl AS community, COUNT(*) AS n_members,
      |  CAST(SUM(v) AS BIGINT) AS member_sum
      |FROM l2 GROUP BY lbl ORDER BY community""".stripMargin

  // g06 — BOUNDED MULTI-ROUND BFS from a deterministic seed (the
  // highest-degree vertex, ties by smallest id — the "hub" a reachability
  // or influence analysis starts from): 3 synchronous frontier rounds of
  // min-distance propagation (dist = min(dist, 1 + min neighbor dist) —
  // each round one dst-keyed join + one vertex min-agg, distances
  // materialized between rounds), then the exact distance histogram with
  // vertices still unreached after the ladder reported as distance −1
  // (the bounded-round contract, as g03: a full BFS raises `rounds`).
  // Distinct from g03/g05: this is traversal DEPTH, the primitive behind
  // hop-bounded neighborhoods and diameter estimates. All integers.
  def g06BfsDistance(spark: SparkSession, dir: String): DataFrame = {
    val INF = 999L
    val e = edges(spark, dir).localCheckpoint()
    val deg = e.groupBy("src").agg(count(lit(1)).as("deg"))
    val seed = deg.orderBy(col("deg").desc, col("src")).limit(1)
      .select(col("src").as("v"), lit(0L).as("d0"))
    var dist = deg.select(col("src").as("v"))
      .join(broadcast(seed), Seq("v"), "left")
      .select(col("v"), coalesce(col("d0"), lit(INF)).as("dist"))
      .localCheckpoint()
    for (_ <- 1 to 3) {
      val nd = e.join(dist.withColumnRenamed("v", "dst"), Seq("dst"))
        .groupBy(col("src").as("v"))
        .agg((min(col("dist")) + 1).as("nd"))
      dist = dist.join(nd, Seq("v"), "left")
        .select(col("v"),
          least(col("dist"), coalesce(col("nd"), lit(INF))).as("dist"))
        .localCheckpoint()
    }
    dist
      .withColumn("distance",
        when(col("dist") >= INF, lit(-1L)).otherwise(col("dist")))
      .groupBy("distance")
      .agg(count(lit(1)).as("n_vertices"), sum(col("v")).as("vid_sum"))
      .orderBy("distance")
  }

  val g06Oracle: String = {
    def round(k: Int): String =
      s"""nd$k AS MATERIALIZED (
        |  SELECT e.src AS v, MIN(p.dist) + 1 AS nd
        |  FROM e JOIN dist${k - 1} p ON p.v = e.dst
        |  GROUP BY e.src
        |), dist$k AS MATERIALIZED (
        |  SELECT p.v, LEAST(p.dist, COALESCE(n.nd, 999)) AS dist
        |  FROM dist${k - 1} p LEFT JOIN nd$k n ON n.v = p.v
        |)""".stripMargin
    s"""WITH $duckEdgesCte, deg AS (
      |  SELECT src, COUNT(*) AS deg FROM e GROUP BY src
      |), seed AS (
      |  SELECT src AS v FROM deg ORDER BY deg DESC, src LIMIT 1
      |), dist0 AS MATERIALIZED (
      |  SELECT d.src AS v,
      |    CASE WHEN s.v IS NOT NULL THEN 0 ELSE 999 END AS dist
      |  FROM deg d LEFT JOIN seed s ON s.v = d.src
      |), ${round(1)}, ${round(2)}, ${round(3)}
      |SELECT CAST(CASE WHEN dist >= 999 THEN -1 ELSE dist END AS BIGINT)
      |    AS distance,
      |  COUNT(*) AS n_vertices, CAST(SUM(v) AS BIGINT) AS vid_sum
      |FROM dist3 GROUP BY 1 ORDER BY distance""".stripMargin
  }

  // g07 — PERSONALIZED PAGERANK (random walk with restart): g01's rounds
  // with the teleport mass directed at a SEED SET (part % 97 == 0)
  // instead of spread uniformly — r'(v) = 0.15·seed(v) + 0.85·Σ
  // contribs, r₀ = seed indicator. The locality-sensitive ranking behind
  // "related items" recommendations and seed-expansion community
  // detection. Same scale shape as g01: per-round one dst-keyed shuffle,
  // the two-level ordered fold (celebrity in-neighborhoods never
  // materialize in one buffer), ranks localCheckpoint between rounds;
  // the seed join is vertex-keyed. Dense iteration (zero ranks carried)
  // keeps the oracle an exact textual mirror; a sparse frontier is the
  // production optimization when seeds ≪ vertices, same plan shape.
  def g07PersonalizedPagerank(spark: SparkSession, dir: String): DataFrame = {
    val e = edges(spark, dir).localCheckpoint()
    val deg = e.groupBy("src").agg(count(lit(1)).as("deg"))
    val seeds = deg.select(col("src").as("part"),
        when(col("src") % 97 === 0, lit(1.0)).otherwise(lit(0.0)).as("sv"))
      .localCheckpoint()
    var ranks = seeds.select(col("part"), col("sv").as("r")).localCheckpoint()
    for (_ <- 1 to 3) {
      val contribs = e.join(ranks.withColumnRenamed("part", "src"), Seq("src"))
        .join(deg, Seq("src"))
        .select(col("dst"), col("src"), (col("r") / col("deg")).as("contrib"))
      val summed = contribs
        .withColumn("chunk", expr("src div 1024"))
        .groupBy(col("dst"), col("chunk"))
        .agg(array_sort(collect_list(
          struct(col("src"), array(col("contrib")).as("cv")))).as("cs"))
        .select(col("dst"), col("chunk"),
          array(element_at(
            graft.functions.FoldFunctions.vecFieldSum(col("cs"), "cv", 1), 1))
            .as("pv"))
        .groupBy(col("dst"))
        .agg(array_sort(collect_list(struct(col("chunk"), col("pv")))).as("cs2"))
        .select(col("dst").as("part"),
          element_at(
            graft.functions.FoldFunctions.vecFieldSum(col("cs2"), "pv", 1), 1)
            .as("s"))
      // seeds LEFT-joins summed (not inner): a vertex receiving no
      // in-contributions this round still holds its 0.15·seed restart
      // mass — an inner join would silently evict an in-degree-0 seed
      // (possible in a general directed graph; this graph is symmetrized
      // so every vertex has in-edges, but the recurrence must not depend
      // on that)
      ranks = seeds.join(summed, Seq("part"), "left")
        .select(col("part"),
          (lit(0.15) * col("sv") +
            lit(0.85) * coalesce(col("s"), lit(0.0))).as("r"))
        .localCheckpoint()
    }
    val w = Window.orderBy(col("r").desc, col("part"))
    ranks.join(deg.withColumnRenamed("src", "part"), Seq("part"))
      .join(seeds, Seq("part"))
      .orderBy(col("r").desc, col("part"))
      .limit(20)
      .withColumn("pos", row_number().over(w).cast("int"))
      .select(col("pos"), col("part"), col("deg"),
        floor(col("r") * 1000000).cast("long").as("rank_micro"),
        (col("sv") === 1.0).as("is_seed"))
      .orderBy("pos")
  }

  val g07Oracle: String = {
    def round(k: Int): String =
      s"""r$k AS (
        |  SELECT sd.part, CAST(0.15 AS DOUBLE) * sd.sv
        |    + CAST(0.85 AS DOUBLE) * COALESCE(t.s, CAST(0.0 AS DOUBLE)) AS r
        |  FROM (
        |    SELECT dst AS part, list_sum(list_transform(ch, c -> c.s)) AS s
        |    FROM (
        |      SELECT dst,
        |        list(struct_pack(chunk := chunk, s := s) ORDER BY chunk) AS ch
        |      FROM (
        |        SELECT e.dst, e.src // 1024 AS chunk,
        |          list_sum(list_transform(
        |            list(struct_pack(src := e.src, contrib := p.r / d.deg)
        |                 ORDER BY e.src),
        |            c -> c.contrib)) AS s
        |        FROM e
        |        JOIN r${k - 1} p ON p.part = e.src
        |        JOIN deg d ON d.src = e.src
        |        GROUP BY e.dst, chunk)
        |      GROUP BY dst)) t
        |  RIGHT JOIN seeds sd ON sd.part = t.part
        |)""".stripMargin
    s"""WITH $duckEdgesCte, deg AS (
      |  SELECT src, COUNT(*) AS deg FROM e GROUP BY src
      |), seeds AS (
      |  SELECT src AS part,
      |    CASE WHEN src % 97 = 0 THEN CAST(1.0 AS DOUBLE)
      |         ELSE CAST(0.0 AS DOUBLE) END AS sv
      |  FROM deg
      |), r0 AS (
      |  SELECT part, sv AS r FROM seeds
      |), ${round(1)}, ${round(2)}, ${round(3)}
      |SELECT pos, part, deg, rank_micro, is_seed FROM (
      |  SELECT CAST(row_number() OVER (ORDER BY r.r DESC, r.part) AS INT) AS pos,
      |    r.part, d.deg, CAST(floor(r.r * 1000000) AS BIGINT) AS rank_micro,
      |    sd.sv = 1.0 AS is_seed
      |  FROM r3 r JOIN deg d ON d.src = r.part JOIN seeds sd ON sd.part = r.part)
      |WHERE pos <= 20 ORDER BY pos""".stripMargin
  }

  // g08 — connected components by STAR CONTRACTION (large-star/small-star,
  // Kiveris et al. 2014): the O(log² n)-round CC that replaces d10's
  // O(diameter) min-label propagation when components can be long chains
  // (at 100 TB, boilerplate chains make million-hop paths — propagation
  // stalls, contraction doesn't). Runs over the SAME d02 near-dup pair
  // graph and shares d10's recursive-closure oracle verbatim, so a
  // mismatch isolates the contraction algorithm itself — rewrite rules,
  // orientation invariants, fixed-point detection, isolated-vertex
  // identity. Scale shape per half-round: one vertex-keyed min aggregate
  // + one equi-join; the canonical edge set shrinks monotonically toward
  // one star per component.
  def g08CcStar(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .withColumn("toks", split(col("text"), " "))
    val pairs = graft.ops.Dedup.jaccardPairs(
      graft.ops.Dedup.withShingles(docs, "toks"), "doc_id", 0.5)
    graft.ops.Dedup.connectedComponentsStar(
        Tables.documents(spark, dir).select("doc_id"), pairs,
        "doc_id", "doc_a", "doc_b")
      .orderBy("doc_id")
  }

  val g08Oracle: String = DedupQueries.d10Oracle

  // g09 — HITS HUBS & AUTHORITIES (Kleinberg 1999) on the bipartite
  // customer→part purchase graph, in the UNNORMALIZED integer form:
  // a(p) = Σ_{c→p} h(c), h(c) = Σ_{c→p} a(p), h⁰ = 1 — i.e. exact
  // walk-counting centrality. Dropping the per-round L2 normalization
  // is what makes the kernel float-free: every score is a BIGINT, sums
  // are order-independent, and the gate is exact with zero fold
  // discipline needed (normalization only rescales; the top-k ORDER is
  // identical). Two rounds keep magnitudes ≤ Σdeg·maxdeg² — bounded by
  // ~deg³·|V|, far under 2^63 even at 100 TB fan-outs of 10⁴ (the
  // documented dial: more rounds ⇒ switch to the g01 ordered-float
  // fold). Scale shape: the round alternates two keyed aggregates —
  // shuffle on part, shuffle on cust — over the edge list, exactly the
  // Pregel-as-relational shape g01 uses, with per-round localCheckpoint
  // keeping lineage flat; top-10 per side via orderBy().limit() on the
  // aggregated score tables, never a global window over data.
  def g09Hits(spark: SparkSession, dir: String): DataFrame = {
    val ol = Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_custkey"))
      .join(Tables.lineitem(spark, dir).select(col("l_orderkey"), col("l_partkey")),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").as("cust"), col("l_partkey").as("part"))
      .distinct().localCheckpoint()
    var h = ol.select("cust").distinct().withColumn("h", lit(1L))
    var a = ol.select("part").distinct().withColumn("a", lit(0L))
    for (_ <- 1 to 2) {
      a = ol.join(h, Seq("cust")).groupBy("part")
        .agg(sum("h").as("a")).localCheckpoint(true)
      h = ol.join(a, Seq("part")).groupBy("cust")
        .agg(sum("a").as("h")).localCheckpoint(true)
    }
    val topA = a.orderBy(col("a").desc, col("part")).limit(10)
      .select(lit("authority").as("side"), col("part").as("id"), col("a").as("score"))
    val topH = h.orderBy(col("h").desc, col("cust")).limit(10)
      .select(lit("hub").as("side"), col("cust").as("id"), col("h").as("score"))
    topA.unionByName(topH)
      .withColumn("rank", row_number().over(
        Window.partitionBy("side").orderBy(col("score").desc, col("id"))))
      .orderBy("side", "rank")
  }

  val g09Oracle: String =
    """WITH ol AS (
      |  SELECT DISTINCT o.o_custkey AS cust, l.l_partkey AS part
      |  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
      |), a1 AS (
      |  SELECT part, CAST(COUNT(*) AS BIGINT) AS a FROM ol GROUP BY part
      |), h1 AS (
      |  SELECT cust, CAST(SUM(a1.a) AS BIGINT) AS h
      |  FROM ol JOIN a1 USING (part) GROUP BY cust
      |), a2 AS (
      |  SELECT part, CAST(SUM(h1.h) AS BIGINT) AS a
      |  FROM ol JOIN h1 USING (cust) GROUP BY part
      |), h2 AS (
      |  SELECT cust, CAST(SUM(a2.a) AS BIGINT) AS h
      |  FROM ol JOIN a2 USING (part) GROUP BY cust
      |), topa AS (
      |  SELECT 'authority' AS side, part AS id, a AS score
      |  FROM a2 ORDER BY a DESC, part LIMIT 10
      |), toph AS (
      |  SELECT 'hub' AS side, cust AS id, h AS score
      |  FROM h2 ORDER BY h DESC, cust LIMIT 10
      |), u AS (
      |  SELECT * FROM topa UNION ALL SELECT * FROM toph
      |)
      |SELECT side, id, score,
      |  CAST(row_number() OVER (PARTITION BY side
      |    ORDER BY score DESC, id) AS INT) AS rank
      |FROM u ORDER BY side, rank""".stripMargin

  // g10 — HYPERBALL NEIGHBORHOOD FUNCTION (Boldi, Rosa & Vigna 2011;
  // HyperANF): estimate |ball_t(v)| for every vertex simultaneously by
  // giving each vertex a 16-register HyperLogLog of its ball and
  // iterating register-wise max along edges — the O(m·rounds) algorithm
  // that replaced exact all-pairs BFS for graph-distance statistics.
  // Registers are q61's integer discipline scaled down (b=4: register
  // = h >> 56, ρ = 57 − length(bin(h % 2^56))); a sketch is 16 (v, reg,
  // r) rows, a round is one edge join + one (v, reg)-keyed max — fully
  // relational, materialized per round (the g-family localCheckpoint
  // discipline), never a per-vertex visited set. The estimator is the
  // real HLL two-regime form: harmonic mean Σ2^(48-ρ) with absent
  // registers at 2^48, switching to LINEAR COUNTING (m·ln(m/V), the
  // small-range correction) below 2.5m — ln(16/V) has only 16 possible
  // arguments, so it ships as an integer-e3 CASE table identical in
  // both engines (no floats cross the gate). Output: the neighborhood
  // function N(t) = Σ_v est|ball_t(v)| for t = 0, 1, 2 next to the
  // EXACT Σ|ball_t(v)| (distinct 2-hop join — affordable at test SF as
  // an audit; at 100 TB the exact column is dropped and only the sketch
  // path remains, which is the entire point of the algorithm).
  def g10Hyperball(spark: SparkSession, dir: String): DataFrame = {
    val m = 16
    val p48 = 281474976710656L // 2^48
    val e = edges(spark, dir).localCheckpoint()
    val verts = e.select(col("src").as("v")).distinct().localCheckpoint()
    val init = verts
      .withColumn("h",
        conv(substring(md5(col("v").cast("string")), 1, 15), 16, 10)
          .cast("long"))
      .select(col("v"), expr("shiftright(h, 56)").as("reg"),
        when(expr("h % 72057594037927936L") === 0, lit(57))
          .otherwise(lit(57) - length(expr("bin(h % 72057594037927936L)")))
          .cast("int").as("r"))
    val lcCase = "CASE nzero WHEN 1 THEN 44361 WHEN 2 THEN 33271 " +
      "WHEN 3 THEN 26784 WHEN 4 THEN 22181 WHEN 5 THEN 18610 " +
      "WHEN 6 THEN 15693 WHEN 7 THEN 13227 WHEN 8 THEN 11090 " +
      "WHEN 9 THEN 9206 WHEN 10 THEN 7520 WHEN 11 THEN 5995 " +
      "WHEN 12 THEN 4603 WHEN 13 THEN 3322 WHEN 14 THEN 2137 " +
      "WHEN 15 THEN 1033 ELSE 0 END"
    def ballEst(sk: DataFrame, t: Int): DataFrame =
      sk.groupBy("v")
        .agg((sum(expr("shiftright(281474976710656L, cast(r as int))")) +
          (lit(m) - count(lit(1))) * lit(p48)).as("sum48"),
          (lit(m.toLong) - count(lit(1))).as("nzero"))
        .withColumn("ratio", least(
          expr("72057594037927936L div greatest(sum48, 1L)"),
          lit(1000000000000L)))
        .withColumn("est_e3",
          when(col("nzero") > 0 && col("ratio") * 673 <= 40000,
            expr(lcCase)).otherwise(col("ratio") * lit(673)))
        .agg(count(lit(1)).as("n_vertices"),
          sum(col("est_e3")).as("sum_ball_est_e3"))
        .withColumn("t", lit(t))
    var sk = init.localCheckpoint()
    val ests = new scala.collection.mutable.ArrayBuffer[DataFrame]
    ests += ballEst(sk, 0)
    for (t <- 1 to 2) {
      val contrib = sk.join(e, sk("v") === e("dst"))
        .select(e("src").as("v"), col("reg"), col("r"))
      sk = contrib.unionByName(sk.select("v", "reg", "r"))
        .groupBy("v", "reg").agg(max(col("r")).as("r"))
        .localCheckpoint()
      ests += ballEst(sk, t)
    }
    // exact audit: closed 1- and 2-hop neighborhood sizes via distinct joins
    val self = verts.select(col("v").as("src"), col("v").as("dst"))
    val b1 = e.unionByName(self).distinct().localCheckpoint()
    val b2 = b1.join(
        b1.select(col("src").as("mid"), col("dst").as("d2")),
        col("dst") === col("mid"))
      .select(col("src"), col("d2").as("dst")).distinct()
    val exacts = verts.agg(count(lit(1)).as("exact_sum"))
      .withColumn("t", lit(0))
      .unionByName(b1.agg(count(lit(1)).as("exact_sum")).withColumn("t", lit(1)))
      .unionByName(b2.agg(count(lit(1)).as("exact_sum")).withColumn("t", lit(2)))
    ests.reduce(_.unionByName(_))
      .join(exacts, "t")
      .select(col("t"), col("n_vertices"), col("sum_ball_est_e3"),
        col("exact_sum"),
        expr("abs(sum_ball_est_e3 div 1000 - exact_sum) * 1000000L" +
          " div exact_sum").as("err_ppm"))
      .orderBy("t")
  }

  private val duckLcCase: String =
    """CASE nzero WHEN 1 THEN 44361 WHEN 2 THEN 33271 WHEN 3 THEN 26784
      |    WHEN 4 THEN 22181 WHEN 5 THEN 18610 WHEN 6 THEN 15693
      |    WHEN 7 THEN 13227 WHEN 8 THEN 11090 WHEN 9 THEN 9206
      |    WHEN 10 THEN 7520 WHEN 11 THEN 5995 WHEN 12 THEN 4603
      |    WHEN 13 THEN 3322 WHEN 14 THEN 2137 WHEN 15 THEN 1033
      |    ELSE 0 END""".stripMargin

  private def duckEstCte(sk: String, t: Int): String =
    s"""sums$t AS (
       |  SELECT v,
       |    CAST(SUM(281474976710656 >> CAST(r AS INT)) +
       |      (16 - COUNT(*)) * 281474976710656 AS BIGINT) AS sum48,
       |    16 - COUNT(*) AS nzero
       |  FROM $sk GROUP BY v
       |), pe$t AS (
       |  SELECT v, nzero,
       |    least(72057594037927936 // greatest(sum48, 1), 1000000000000)
       |      AS ratio
       |  FROM sums$t
       |), est$t AS (
       |  SELECT $t AS t, COUNT(*) AS n_vertices,
       |    CAST(SUM(CASE WHEN nzero > 0 AND ratio * 673 <= 40000
       |      THEN $duckLcCase
       |      ELSE ratio * 673 END) AS BIGINT) AS sum_ball_est_e3
       |  FROM pe$t
       |)""".stripMargin

  val g10Oracle: String =
    s"""WITH $duckEdgesCte,
       |verts AS (SELECT DISTINCT src AS v FROM e),
       |hs AS (
       |  SELECT v, CAST(('0x' || substr(md5(CAST(v AS VARCHAR)), 1, 15))
       |    AS BIGINT) AS h
       |  FROM verts
       |), sk0 AS (
       |  SELECT v, h >> 56 AS reg,
       |    CASE WHEN h % 72057594037927936 = 0 THEN 57
       |         ELSE 57 - length(bin(h % 72057594037927936)) END AS r
       |  FROM hs
       |), sk1 AS (
       |  SELECT v, reg, MAX(r) AS r FROM (
       |    SELECT e.src AS v, s.reg, s.r FROM sk0 s JOIN e ON s.v = e.dst
       |    UNION ALL SELECT v, reg, r FROM sk0
       |  ) GROUP BY v, reg
       |), sk2 AS (
       |  SELECT v, reg, MAX(r) AS r FROM (
       |    SELECT e.src AS v, s.reg, s.r FROM sk1 s JOIN e ON s.v = e.dst
       |    UNION ALL SELECT v, reg, r FROM sk1
       |  ) GROUP BY v, reg
       |), ${duckEstCte("sk0", 0)},
       |${duckEstCte("sk1", 1)},
       |${duckEstCte("sk2", 2)},
       |slf AS (SELECT v AS src, v AS dst FROM verts),
       |b1 AS (
       |  SELECT DISTINCT src, dst FROM (
       |    SELECT src, dst FROM e UNION ALL SELECT src, dst FROM slf)
       |), b2 AS (
       |  SELECT DISTINCT a.src, b.dst FROM b1 a JOIN b1 b ON a.dst = b.src
       |), ex AS (
       |  SELECT 0 AS t, (SELECT COUNT(*) FROM verts) AS exact_sum
       |  UNION ALL SELECT 1, (SELECT COUNT(*) FROM b1)
       |  UNION ALL SELECT 2, (SELECT COUNT(*) FROM b2)
       |), es AS (
       |  SELECT * FROM est0 UNION ALL SELECT * FROM est1
       |  UNION ALL SELECT * FROM est2
       |)
       |SELECT es.t, es.n_vertices, es.sum_ball_est_e3,
       |  CAST(ex.exact_sum AS BIGINT) AS exact_sum,
       |  CAST(abs(es.sum_ball_est_e3 // 1000 - ex.exact_sum) * 1000000
       |    // ex.exact_sum AS BIGINT) AS err_ppm
       |FROM es JOIN ex USING (t) ORDER BY es.t""".stripMargin

  // g11 — WEIGHTED MULTI-SOURCE SHORTEST PATHS (Bellman-Ford / min-plus,
  // 3 bounded rounds): g06 gives hop distance; real recommendation /
  // routing graphs are WEIGHTED, and the distributed answer is the
  // min-plus relaxation — dist'(v) = min(dist(v), min over in-edges
  // (dist(u) + cost(u,v))) — which is exactly one edge join + one
  // vertex-keyed MIN per round, the same Pregel-as-relational shape as
  // g01 with (min, +) replacing (sum, ×). Edge cost = max(1, 10 − w)
  // (stronger co-purchase ⇒ cheaper hop; integer, so every distance is
  // exact and the gate needs no float discipline). Seeds: every 100th
  // part id at distance 0, the multi-source form a "distance from the
  // catalog heads" feature actually ships with. Rounds materialize via
  // localCheckpoint (flat lineage); vertices unreached in 3 relaxations
  // are absent by construction (the bounded-frontier contract, like
  // g06). Output: the exact distance histogram with a vertex-id
  // checksum pinning WHICH vertices sit at each distance.
  def g11WeightedPaths(spark: SparkSession, dir: String): DataFrame = {
    val weighted = weightedPairs(spark, dir)
    val cost = weighted
      .select(col("pa").as("src"), col("pb").as("dst"),
        greatest(lit(1L), lit(10L) - col("w")).as("c"))
      .unionByName(weighted.select(col("pb").as("src"), col("pa").as("dst"),
        greatest(lit(1L), lit(10L) - col("w")).as("c")))
      .localCheckpoint()
    var dist = cost.select(col("src").as("v")).distinct()
      .filter(col("v") % 100 === 0)
      .select(col("v"), lit(0L).as("d"))
      .localCheckpoint()
    for (_ <- 1 to 3) {
      val relaxed = dist.join(cost, dist("v") === cost("src"))
        .select(cost("dst").as("v"), (dist("d") + cost("c")).as("d"))
      dist = dist.unionByName(relaxed)
        .groupBy("v").agg(min(col("d")).as("d"))
        .localCheckpoint()
    }
    dist.groupBy("d")
      .agg(count(lit(1)).as("n_vertices"), sum(col("v")).as("v_sum"))
      .orderBy("d")
  }

  val g11Oracle: String =
    s"""WITH $duckEdgesCte,
       |cost AS (
       |  SELECT pa AS src, pb AS dst, greatest(1, 10 - w) AS c FROM pairs
       |  UNION ALL
       |  SELECT pb, pa, greatest(1, 10 - w) FROM pairs
       |), d0 AS (
       |  SELECT DISTINCT src AS v, CAST(0 AS BIGINT) AS d FROM cost
       |  WHERE src % 100 = 0
       |), d1 AS (
       |  SELECT v, MIN(d) AS d FROM (
       |    SELECT v, d FROM d0
       |    UNION ALL
       |    SELECT c.dst AS v, d0.d + c.c AS d FROM d0 JOIN cost c ON d0.v = c.src
       |  ) GROUP BY v
       |), d2 AS (
       |  SELECT v, MIN(d) AS d FROM (
       |    SELECT v, d FROM d1
       |    UNION ALL
       |    SELECT c.dst AS v, d1.d + c.c AS d FROM d1 JOIN cost c ON d1.v = c.src
       |  ) GROUP BY v
       |), d3 AS (
       |  SELECT v, MIN(d) AS d FROM (
       |    SELECT v, d FROM d2
       |    UNION ALL
       |    SELECT c.dst AS v, d2.d + c.c AS d FROM d2 JOIN cost c ON d2.v = c.src
       |  ) GROUP BY v
       |)
       |SELECT d, COUNT(*) AS n_vertices, CAST(SUM(v) AS BIGINT) AS v_sum
       |FROM d3 GROUP BY d ORDER BY d""".stripMargin

  // g12 — MODULARITY of the g05 communities (Newman & Girvan 2004): the
  // number that says whether a community assignment MEANS anything —
  // Q = Σ_c [in_c/E − (d_c/E)²] over the directed edge table (E = 2m).
  // Kept EXACT: multiply through by E² and the per-community
  // contribution is the integer in_c·E − d_c², summed as a BIGINT and
  // reported with the fixed-point quotient q_e6 = num·10⁶ div E² — no
  // float ever forms, so the gate pins the label rounds AND the score
  // arithmetic (overflow bound: |q_num| ≤ E², safe to ~3·10⁹ directed
  // edges — past that, carry the per-community terms at e3 scale).
  // Plan shape: the label table joins the edge list twice (src, dst) —
  // both vertex-keyed shuffles — then everything folds to ≤ |communities|
  // rows; one broadcast 1-row E. This is the evaluation step a
  // community-detection pipeline runs after every g05-style pass, the
  // same calibrate-what-you-ship stance as s19/s38/s47.
  def g12Modularity(spark: SparkSession, dir: String): DataFrame = {
    val e = edges(spark, dir).localCheckpoint()
    val labels = propLabels(e).localCheckpoint()
    val eTot = e.agg(count(lit(1)).as("e_directed"))
    val inC = e
      .join(labels.select(col("v").as("src"), col("lbl").as("ls")), "src")
      .join(labels.select(col("v").as("dst"), col("lbl").as("ld")), "dst")
      .filter(col("ls") === col("ld"))
      .groupBy(col("ls").as("lbl")).agg(count(lit(1)).as("in_c"))
    val dC = e.groupBy("src").agg(count(lit(1)).as("dv"))
      .join(labels.select(col("v").as("src"), col("lbl")), "src")
      .groupBy("lbl").agg(sum(col("dv")).as("d_c"))
    dC.join(inC, Seq("lbl"), "left")
      .select(col("lbl"), coalesce(col("in_c"), lit(0L)).as("in_c"),
        col("d_c"))
      .crossJoin(broadcast(eTot))
      .agg(count(lit(1)).as("n_communities"),
        max(col("e_directed")).as("e_directed"),
        sum(col("in_c") * col("e_directed") - col("d_c") * col("d_c"))
          .as("q_num"))
      .select(col("n_communities"), col("e_directed"), col("q_num"),
        expr("q_num * 1000000L div (e_directed * e_directed)").as("q_e6"))
  }

  val g12Oracle: String =
    s"""WITH $duckEdgesCte, $duckLabelCtes,
      |etot AS (SELECT COUNT(*) AS e_directed FROM e),
      |inc AS (
      |  SELECT a.lbl, COUNT(*) AS in_c
      |  FROM e JOIN l2 a ON e.src = a.v JOIN l2 b ON e.dst = b.v
      |  WHERE a.lbl = b.lbl GROUP BY a.lbl
      |), deg AS (
      |  SELECT src AS v, COUNT(*) AS dv FROM e GROUP BY src
      |), dc AS (
      |  SELECT a.lbl, CAST(SUM(d.dv) AS BIGINT) AS d_c
      |  FROM deg d JOIN l2 a ON d.v = a.v GROUP BY a.lbl
      |), per AS (
      |  SELECT dc.lbl, CAST(COALESCE(inc.in_c, 0) AS BIGINT) AS in_c,
      |    dc.d_c
      |  FROM dc LEFT JOIN inc USING (lbl)
      |)
      |SELECT COUNT(*) AS n_communities,
      |  CAST(MAX(etot.e_directed) AS BIGINT) AS e_directed,
      |  CAST(SUM(in_c * etot.e_directed - d_c * d_c) AS BIGINT) AS q_num,
      |  CAST(SUM(in_c * etot.e_directed - d_c * d_c) * 1000000
      |    // (MAX(etot.e_directed) * MAX(etot.e_directed)) AS BIGINT)
      |    AS q_e6
      |FROM per CROSS JOIN etot""".stripMargin

  // g13 — K-TRUSS PEELING (Cohen 2008; k = 4): the EDGE-level community
  // core g03's vertex-level k-core can't see — an edge survives only
  // while it participates in ≥ k−2 = 2 triangles of the SURVIVING
  // subgraph, so each round recomputes triangle support on the peeled
  // edge set and drops the weak edges (support shrinks as neighbors
  // vanish — the same cascade as k-core, one level down). Two bounded
  // rounds (the g06 contract: a fixpoint truss raises `rounds`), each
  // round = g02's oriented triangle enumeration (a<b<c, two keyed joins)
  // with every triangle attributed to its three edges, one edge-keyed
  // support count, one semi-join peel, materialized. Output: the edge
  // count and an edge checksum per round — the checksum pins WHICH edges
  // survive, not just how many. All integers.
  def g13Ktruss(spark: SparkSession, dir: String): DataFrame = {
    var o = edges(spark, dir).filter(col("src") < col("dst"))
      .select(col("src").as("a"), col("dst").as("b"))
      .localCheckpoint()
    def roundRow(r: Int, df: DataFrame): DataFrame =
      df.agg(count(lit(1)).as("n_edges"),
        coalesce(sum(col("a") * lit(1000003L) + col("b")), lit(0L))
          .as("edge_checksum"))
        .select(lit(r.toLong).as("round"), col("n_edges"),
          col("edge_checksum"))
    val rows = new scala.collection.mutable.ArrayBuffer[DataFrame]
    rows += roundRow(0, o)
    for (r <- 1 to 2) {
      val tri = o
        .join(o.select(col("a").as("b"), col("b").as("c")), Seq("b"))
        .join(o.select(col("a"), col("b").as("c")), Seq("a", "c"))
        .select(col("a"), col("b"), col("c"))
      val sup = tri.select(col("a").as("x"), col("b").as("y"))
        .unionByName(tri.select(col("b").as("x"), col("c").as("y")))
        .unionByName(tri.select(col("a").as("x"), col("c").as("y")))
        .groupBy("x", "y").agg(count(lit(1)).as("supp"))
        .filter(col("supp") >= 2)
      o = o.join(sup.select(col("x").as("a"), col("y").as("b")),
          Seq("a", "b"), "left_semi")
        .localCheckpoint()
      rows += roundRow(r, o)
    }
    rows.reduce(_.unionByName(_)).orderBy("round")
  }

  val g13Oracle: String = {
    def peel(k: Int): String =
      s"""tri$k AS (
         |  SELECT e1.a, e1.b, e2.b AS c
         |  FROM o${k - 1} e1 JOIN o${k - 1} e2 ON e1.b = e2.a
         |  JOIN o${k - 1} e3 ON e3.a = e1.a AND e3.b = e2.b
         |), sup$k AS (
         |  SELECT x, y, COUNT(*) AS supp FROM (
         |    SELECT a AS x, b AS y FROM tri$k
         |    UNION ALL SELECT b, c FROM tri$k
         |    UNION ALL SELECT a, c FROM tri$k)
         |  GROUP BY x, y HAVING COUNT(*) >= 2
         |), o$k AS (
         |  SELECT o.a, o.b FROM o${k - 1} o
         |  WHERE EXISTS (SELECT 1 FROM sup$k s WHERE s.x = o.a AND s.y = o.b)
         |)""".stripMargin
    s"""WITH $duckEdgesCte, o0 AS (
       |  SELECT src AS a, dst AS b FROM e WHERE src < dst
       |), ${peel(1)}, ${peel(2)},
       |r AS (
       |  SELECT 0 AS round, COUNT(*) AS n_edges,
       |    COALESCE(SUM(a * 1000003 + b), 0) AS edge_checksum FROM o0
       |  UNION ALL
       |  SELECT 1, COUNT(*), COALESCE(SUM(a * 1000003 + b), 0) FROM o1
       |  UNION ALL
       |  SELECT 2, COUNT(*), COALESCE(SUM(a * 1000003 + b), 0) FROM o2
       |)
       |SELECT CAST(round AS BIGINT) AS round, n_edges,
       |  CAST(edge_checksum AS BIGINT) AS edge_checksum
       |FROM r ORDER BY round""".stripMargin
  }

  // g14 — LUBY'S MAXIMAL INDEPENDENT SET (Luby 1986): the symmetry-
  // breaking primitive behind distributed scheduling and conflict
  // resolution — per round, a vertex enters the MIS iff its random
  // priority beats every active neighbor's, then winners AND their
  // neighbors leave the active set. Priorities are the engines' shared
  // 60-bit md5 (tie-broken by vertex id, so the comparison is a total
  // order and the rounds are DETERMINISTIC — no RNG crosses the gate),
  // each round is one dst-keyed neighbor-max, one priority comparison,
  // two anti-joins, materialized (the g-family discipline). Two bounded
  // rounds (Luby needs O(log n) for maximality; the bounded-round
  // contract of g06/g13). The output carries its own correctness audit:
  // `n_conflict_edges` — edges with BOTH endpoints in the cumulative
  // MIS — must be 0 by construction and is computed, not asserted.
  def g14LubyMis(spark: SparkSession, dir: String): DataFrame = {
    val pr = (v: Column) =>
      conv(substring(md5(v.cast("string")), 1, 15), 16, 10).cast("long")
    val e0 = edges(spark, dir).localCheckpoint()
    var active = e0.select(col("src").as("v")).distinct()
      .withColumn("h", pr(col("v"))).localCheckpoint()
    var activeEdges = e0.localCheckpoint()
    var mis = active.filter(lit(false)).select(col("v"), col("h"))
    val out = new scala.collection.mutable.ArrayBuffer[DataFrame]
    for (r <- 1 to 2) {
      val nbrMax = activeEdges
        .join(active.select(col("v").as("dst"), col("h").as("hd")), "dst")
        .groupBy(col("src").as("v"))
        .agg(max(struct(col("hd"), col("dst"))).as("nm"))
      val winners = active.join(nbrMax, Seq("v"), "left")
        .filter(col("nm").isNull ||
          struct(col("h").as("hd"), col("v").as("dst")) > col("nm"))
        .select("v", "h").localCheckpoint()
      mis = mis.unionByName(winners).localCheckpoint()
      val removed = winners.select("v")
        .unionByName(activeEdges
          .join(winners.select(col("v").as("src")), Seq("src"))
          .select(col("dst").as("v")))
        .distinct().localCheckpoint()
      active = active.join(removed, Seq("v"), "left_anti").localCheckpoint()
      activeEdges = activeEdges
        .join(active.select(col("v").as("src")), Seq("src"), "left_semi")
        .join(active.select(col("v").as("dst")), Seq("dst"), "left_semi")
        .localCheckpoint()
      val conflicts = e0.filter(col("src") < col("dst"))
        .join(mis.select(col("v").as("src")), Seq("src"), "left_semi")
        .join(mis.select(col("v").as("dst")), Seq("dst"), "left_semi")
      out += mis.agg(count(lit(1)).as("n_mis"), sum(col("v")).as("mis_checksum"))
        .crossJoin(active.agg(count(lit(1)).as("n_active")))
        .crossJoin(conflicts.agg(count(lit(1)).as("n_conflict_edges")))
        .select(lit(r.toLong).as("round"), col("n_mis"),
          coalesce(col("mis_checksum"), lit(0L)).as("mis_checksum"),
          col("n_active"), col("n_conflict_edges"))
    }
    out.reduce(_.unionByName(_)).orderBy("round")
  }

  val g14Oracle: String = {
    def round(k: Int): String =
      s"""nm$k AS (
         |  SELECT e.src AS v, MAX(struct_pack(hd := a.h, dst := e.dst)) AS nm
         |  FROM ae${k - 1} e JOIN act${k - 1} a ON a.v = e.dst
         |  GROUP BY e.src
         |), win$k AS (
         |  SELECT a.v, a.h FROM act${k - 1} a LEFT JOIN nm$k n ON n.v = a.v
         |  WHERE n.nm IS NULL OR struct_pack(hd := a.h, dst := a.v) > n.nm
         |), mis$k AS (
         |  SELECT v, h FROM mis${k - 1} UNION ALL SELECT v, h FROM win$k
         |), rem$k AS (
         |  SELECT DISTINCT v FROM (
         |    SELECT v FROM win$k
         |    UNION ALL
         |    SELECT e.dst AS v FROM ae${k - 1} e
         |    JOIN win$k w ON w.v = e.src)
         |), act$k AS (
         |  SELECT a.* FROM act${k - 1} a
         |  WHERE NOT EXISTS (SELECT 1 FROM rem$k r WHERE r.v = a.v)
         |), ae$k AS (
         |  SELECT e.* FROM ae${k - 1} e
         |  WHERE EXISTS (SELECT 1 FROM act$k a WHERE a.v = e.src)
         |    AND EXISTS (SELECT 1 FROM act$k a WHERE a.v = e.dst)
         |), row$k AS (
         |  SELECT $k AS round,
         |    (SELECT COUNT(*) FROM mis$k) AS n_mis,
         |    (SELECT COALESCE(SUM(v), 0) FROM mis$k) AS mis_checksum,
         |    (SELECT COUNT(*) FROM act$k) AS n_active,
         |    (SELECT COUNT(*) FROM e
         |     WHERE src < dst
         |       AND EXISTS (SELECT 1 FROM mis$k m WHERE m.v = src)
         |       AND EXISTS (SELECT 1 FROM mis$k m WHERE m.v = dst))
         |      AS n_conflict_edges
         |)""".stripMargin
    s"""WITH $duckEdgesCte,
       |act0 AS (
       |  SELECT v, CAST(('0x' || substr(md5(CAST(v AS VARCHAR)), 1, 15))
       |    AS BIGINT) AS h
       |  FROM (SELECT DISTINCT src AS v FROM e)
       |), ae0 AS (SELECT src, dst FROM e),
       |mis0 AS (SELECT v, h FROM act0 WHERE 1 = 0),
       |${round(1)}, ${round(2)}
       |SELECT CAST(round AS BIGINT) AS round, CAST(n_mis AS BIGINT) AS n_mis,
       |  CAST(mis_checksum AS BIGINT) AS mis_checksum,
       |  CAST(n_active AS BIGINT) AS n_active,
       |  CAST(n_conflict_edges AS BIGINT) AS n_conflict_edges
       |FROM (SELECT * FROM row1 UNION ALL SELECT * FROM row2)
       |ORDER BY round""".stripMargin
  }

  // g15 — TRUNCATED HARMONIC CENTRALITY (Boldi & Vigna 2014's axioms
  // pick harmonic over closeness on disconnected graphs; HyperBall is
  // its estimator at scale — g10 gates those registers): HC_t(v) =
  // Σ_{τ≤t} (|B(v,τ)| − |B(v,τ−1)|)/τ, here computed EXACTLY at t = 2
  // over per-vertex closed-ball sizes — the same distinct hop joins as
  // g10's audit arm, read per vertex instead of summed globally. With
  // τ ∈ {1, 2} the weights are exact in e6 fixed point with NO
  // division: hc_e6 = (b1 − 1)·1e6 + (b2 − b1)·5e5 (b0 = 1, the closed
  // ball contains the vertex). Truncation is the declared cost bound:
  // each extra hop is one more per-vertex distinct join (the N·deg^t
  // class) — at 100 TB one runs HyperBall (g10's registers) instead of
  // exact balls, and this gate is the exact anchor that calibrates it.
  // Output: top-20 by (hc_e6 DESC, v) — the broadcast-hub ranking.
  def g15HarmonicCentrality(spark: SparkSession, dir: String): DataFrame = {
    val e = edges(spark, dir).localCheckpoint()
    val verts = e.select(col("src")).distinct()
    val self = verts.select(col("src"), col("src").as("dst"))
    val b1 = e.unionByName(self).distinct().localCheckpoint()
    val b2 = b1.join(
        b1.select(col("src").as("mid"), col("dst").as("d2")),
        col("dst") === col("mid"))
      .select(col("src"), col("d2").as("dst")).distinct()
    val c1 = b1.groupBy("src").agg(count(lit(1)).as("n1"))
    val c2 = b2.groupBy("src").agg(count(lit(1)).as("n2"))
    c1.join(c2, "src")
      .select(col("src").as("v"), col("n1").as("b1"), col("n2").as("b2"),
        ((col("n1") - 1) * 1000000L + (col("n2") - col("n1")) * 500000L)
          .as("hc_e6"))
      .orderBy(col("hc_e6").desc, col("v")).limit(20)
  }

  val g15Oracle: String =
    s"""WITH $duckEdgesCte, verts AS (
      |  SELECT DISTINCT src FROM e
      |), b1 AS (
      |  SELECT DISTINCT src, dst FROM (
      |    SELECT src, dst FROM e
      |    UNION ALL
      |    SELECT src, src FROM verts)
      |), b2 AS (
      |  SELECT DISTINCT a.src, b.dst FROM b1 a JOIN b1 b ON a.dst = b.src
      |), c1 AS (
      |  SELECT src, COUNT(*) AS n1 FROM b1 GROUP BY src
      |), c2 AS (
      |  SELECT src, COUNT(*) AS n2 FROM b2 GROUP BY src
      |)
      |SELECT src AS v, n1 AS b1, n2 AS b2,
      |  CAST((n1 - 1) * 1000000 + (n2 - n1) * 500000 AS BIGINT) AS hc_e6
      |FROM c1 JOIN c2 USING (src)
      |ORDER BY hc_e6 DESC, v LIMIT 20""".stripMargin

  // g16 — STREAMING GRAPH-METRIC MAINTENANCE WITH RETRACTIONS (the
  // g-family's streaming member, completing the maintenance matrix from
  // the graph side: cdc47 proved signed aggregates over a changelog;
  // this applies them to a maintained GRAPH metric). The co-purchase
  // edge set arrives as a binlog changelog — every directed edge row
  // inserts (WRITE_ROWS, +1), and edges whose endpoint sum ≡ 0 (mod 3)
  // are later retracted (DELETE_ROWS, −1, the wire-native retraction).
  // The maintained view is per-vertex signed DEGREE partials
  // (Σop per src — a ≤|vertices|-row write per batch) under cdc48's
  // exactly-once discipline (batch_id partition overwrite + the
  // injected batch-0 redelivery, via the shared drain helper); the
  // serve-time fold is g02's exact degree census — vertices, edges,
  // wedges — over the SURVIVING graph, gated against the batch census
  // of the surviving edge set. Signed sums are order-independent, so
  // no arrival ordering is needed (unlike d32/s51's prefix rules). At
  // 100 TB: per batch one delta-sized map + a vertex-keyed partial
  // aggregate; deletes cost the same as inserts, and the census never
  // rescans the edge history.
  def g16StreamDegreeRetract(spark: SparkSession, dir: String): DataFrame = {
    val root = graft.streaming.Drains.tmpFixtureDir("graft_g16_", dir)
    root.mkdirs()
    val feed = new java.io.File(root, "feed").getPath
    val state = new java.io.File(root, "state").getPath
    val ckpt = new java.io.File(root, "ckpt").getPath
    val pairs = weightedPairs(spark, dir)
    val dirs = pairs.select(col("pa").as("src"), col("pb").as("dst"))
      .unionByName(pairs.select(col("pb").as("src"), col("pa").as("dst")))
      .localCheckpoint(true) // ins + del both read it: one pair build
    val ins = dirs.select(lit(1).as("op"), col("src"),
      col("dst").cast("string").as("v"))
    val del = dirs.filter((col("src") + col("dst")) % 3 === 0)
      .select(lit(-1).as("op"), col("src"), col("dst").cast("string").as("v"))
    graft.ingest.BinlogSink.writeChanges(
      ins.unionByName(del).repartition(4, col("src")), feed)
    graft.streaming.Drains.drainIdempotentWithRedelivery(spark, feed, ckpt, state) { b =>
      b.filter(col("event_type").isin("WriteRowsEventV2", "DeleteRowsEventV2"))
        .select(when(col("event_type") === "WriteRowsEventV2", 1L)
          .otherwise(-1L).as("w"),
          explode(col("row_images")).as("img"))
        .select(col("w"), element_at(col("img"), 1).cast("long").as("src"))
        .groupBy("src").agg(sum(col("w")).as("d"))
    }
    graft.streaming.ViewMaintenance.readState(spark, state,
        "src BIGINT, d BIGINT, batch_id BIGINT")
      .groupBy("src").agg(sum(col("d")).as("deg"))
      .filter(col("deg") > 0)
      .agg(count(lit(1)).as("n_vertices"),
        expr("sum(deg) div 2").as("n_edges"),
        sum(expr("(deg * (deg - 1)) div 2")).as("n_wedges"))
  }

  val g16Oracle: String =
    s"""WITH $duckEdgesCte, surv AS (
      |  SELECT src, dst FROM e WHERE (src + dst) % 3 <> 0
      |), deg AS (
      |  SELECT src, COUNT(*) AS deg FROM surv GROUP BY src
      |)
      |SELECT COUNT(*) AS n_vertices,
      |  CAST(SUM(deg) // 2 AS BIGINT) AS n_edges,
      |  CAST(SUM((deg * (deg - 1)) // 2) AS BIGINT) AS n_wedges
      |FROM deg""".stripMargin

  // g17 — RESTART-MID-DRAIN for the SIGNED state class (cdc53 proves the
  // two-run seam for additive partials; signed retraction weights are
  // the class where a restart bug is most corrosive — a reprocessed
  // DELETE_ROWS file double-retracts and silently UNDERCOUNTS the
  // surviving graph). Same changelog, decode, and per-vertex signed
  // degree partials as g16, but the feed files arrive in two
  // installments across two Trigger.AvailableNow runs on ONE checkpoint
  // (continued batch ids, the count-based offset contract), with the
  // recorded batch-0 file re-applied across the restart boundary.
  // Shares g16's oracle — a mismatch isolates the offset/restart seam
  // from the retraction algebra.
  def g17RestartDegree(spark: SparkSession, dir: String): DataFrame = {
    val root = graft.streaming.Drains.tmpFixtureDir("graft_g17_", dir)
    root.mkdirs()
    val staging = new java.io.File(root, "staging").getPath
    val feed = new java.io.File(root, "feed").getPath
    val state = new java.io.File(root, "state").getPath
    val ckpt = new java.io.File(root, "ckpt").getPath
    val pairs = weightedPairs(spark, dir)
    val dirs = pairs.select(col("pa").as("src"), col("pb").as("dst"))
      .unionByName(pairs.select(col("pb").as("src"), col("pa").as("dst")))
      .localCheckpoint(true)
    val ins = dirs.select(lit(1).as("op"), col("src"),
      col("dst").cast("string").as("v"))
    val del = dirs.filter((col("src") + col("dst")) % 3 === 0)
      .select(lit(-1).as("op"), col("src"), col("dst").cast("string").as("v"))
    graft.ingest.BinlogSink.writeChanges(
      ins.unionByName(del).repartition(4, col("src")), staging)
    graft.streaming.Drains.drainBinlogRestartWithRedelivery(
        spark, staging, feed, ckpt) { (b, id) =>
      graft.streaming.ViewMaintenance.applyIdempotent(
        b.filter(col("event_type").isin("WriteRowsEventV2", "DeleteRowsEventV2"))
          .select(when(col("event_type") === "WriteRowsEventV2", 1L)
            .otherwise(-1L).as("w"),
            explode(col("row_images")).as("img"))
          .select(col("w"), element_at(col("img"), 1).cast("long").as("src"))
          .groupBy("src").agg(sum(col("w")).as("d")),
        state, id)
    }
    graft.streaming.ViewMaintenance.readState(spark, state,
        "src BIGINT, d BIGINT, batch_id BIGINT")
      .groupBy("src").agg(sum(col("d")).as("deg"))
      .filter(col("deg") > 0)
      .agg(count(lit(1)).as("n_vertices"),
        expr("sum(deg) div 2").as("n_edges"),
        sum(expr("(deg * (deg - 1)) div 2")).as("n_wedges"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "g17_restart_degree" -> (g17RestartDegree _),
    "g16_stream_degree_retract" -> (g16StreamDegreeRetract _),
    "g15_harmonic_centrality" -> (g15HarmonicCentrality _),
    "g14_luby_mis" -> (g14LubyMis _),
    "g13_ktruss" -> (g13Ktruss _),
    "g12_modularity" -> (g12Modularity _),
    "g11_weighted_paths" -> (g11WeightedPaths _),
    "g10_hyperball" -> (g10Hyperball _),
    "g09_hits" -> (g09Hits _),
    "g08_cc_star" -> (g08CcStar _),
    "g07_personalized_pagerank" -> (g07PersonalizedPagerank _),
    "g01_pagerank" -> (g01Pagerank _),
    "g02_triangles" -> (g02Triangles _),
    "g03_kcore" -> (g03Kcore _),
    "g04_link_prediction" -> (g04LinkPrediction _),
    "g05_label_prop" -> (g05LabelProp _),
    "g06_bfs_distance" -> (g06BfsDistance _),
  )

  val oracles: Map[String, String] = Map(
    // two-run drain + cross-restart replay == one-run census (isolates
    // the offset/restart seam from the retraction algebra)
    "g17_restart_degree" -> g16Oracle,
    "g16_stream_degree_retract" -> g16Oracle,
    "g14_luby_mis" -> g14Oracle,
    "g15_harmonic_centrality" -> g15Oracle,
    "g13_ktruss" -> g13Oracle,
    "g12_modularity" -> g12Oracle,
    "g11_weighted_paths" -> g11Oracle,
    "g10_hyperball" -> g10Oracle,
    "g09_hits" -> g09Oracle,
    "g08_cc_star" -> g08Oracle,
    "g07_personalized_pagerank" -> g07Oracle,
    "g01_pagerank" -> g01Oracle,
    "g02_triangles" -> g02Oracle,
    "g03_kcore" -> g03Oracle,
    "g04_link_prediction" -> g04Oracle,
    "g05_label_prop" -> g05Oracle,
    "g06_bfs_distance" -> g06Oracle,
  )
}
