package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** The native ordered-fold kernels must agree element-for-element with the
  * interpreted higher-order functions they replaced — including the null /
  * short-vector / empty-input contamination semantics, since the DuckDB
  * oracle CTEs mirror the HOF formulation. */
class FoldFunctionsSpec extends AnyFunSuite with SparkTestSession {

  test("OrderedVecFieldSum matches the aggregate() HOF it replaced") {
    val spark2 = spark
    import spark2.implicits._
    val dim = 4
    // rows: (label, vs) where vs holds (id, emb) structs — includes a
    // short vector, an empty list, and an exactly-dim vector
    val df = Seq(
      (0, Seq((1L, Seq(1.0f, 2.0f, 3.0f, 4.0f)), (2L, Seq(0.5f, 0.5f, 0.5f, 0.5f)))),
      (1, Seq((3L, Seq(1.0f, 1.0f)))), // short: dims 3,4 null
      (2, Seq.empty[(Long, Seq[Float])]) // empty: all zeros
    ).toDF("label", "raw")
      .select(col("label"),
        expr("transform(raw, r -> named_struct('id', r._1, 'emb', r._2))").as("vs"))

    // try_element_at: out-of-bounds → null in every SQL mode (plain
    // element_at ERRORS under ANSI, Spark 4's default — the kernel keeps
    // the null-contamination semantics the oracle's list indexing has)
    val hof = df.select(col("label"),
      expr(s"transform(sequence(1, $dim), d -> aggregate(vs, CAST(0.0 AS DOUBLE), " +
        "(s, v) -> s + CAST(try_element_at(v.emb, d) AS DOUBLE)))").as("psum"))
      .orderBy("label").collect().map(r => (r.getInt(0), r.getSeq[Any](1)))
    val native = df.select(col("label"),
      FoldFunctions.vecFieldSum(col("vs"), "emb", dim).as("psum"))
      .orderBy("label").collect().map(r => (r.getInt(0), r.getSeq[Any](1)))
    assert(native.toSeq == hof.toSeq)
  }

  test("OrderedVecFieldMean matches the two-aggregate HOF it replaced") {
    val spark2 = spark
    import spark2.implicits._
    val dim = 3
    val df = Seq(
      (0, Seq((0L, Seq(3.0, 6.0, 9.0), 3L), (1L, Seq(1.0, 2.0, 3.0), 1L))),
      (1, Seq((0L, Seq(2.0, 4.0, 6.0), 2L)))
    ).toDF("label", "raw")
      .select(col("label"),
        expr("transform(raw, r -> named_struct('_chunk', r._1, 'psum', r._2, 'pcnt', r._3))")
          .as("ps"))

    val hof = df.select(col("label"),
      expr(s"transform(sequence(1, $dim), d -> CAST(" +
        "aggregate(ps, CAST(0.0 AS DOUBLE), (s, p) -> s + element_at(p.psum, d)) / " +
        "aggregate(ps, CAST(0 AS BIGINT), (s, p) -> s + p.pcnt) AS FLOAT))").as("cf"))
      .orderBy("label").collect().map(r => (r.getInt(0), r.getSeq[Any](1)))
    val native = df.select(col("label"),
      FoldFunctions.vecFieldMean(col("ps"), "psum", "pcnt", dim).as("cf"))
      .orderBy("label").collect().map(r => (r.getInt(0), r.getSeq[Any](1)))
    assert(native.toSeq == hof.toSeq)
  }

  test("MarkerCount matches size(filter(...)) incl. unicode and empty input") {
    val spark2 = spark
    import spark2.implicits._
    val df = Seq(
      "the quick brown fox the a",
      "a",
      "",
      "thé thê the",
      "no markers here at all").toDF("text")
      .withColumn("toks", split(col("text"), " "))
    val words = Seq("the", "a")
    val hof = df.select(
      size(filter(col("toks"), x => x.isin(words.map(_.asInstanceOf[Any]): _*))).as("n"))
      .collect().map(_.getInt(0)).toSeq
    val native = df.select(FoldFunctions.markerCount(col("toks"), words).as("n"))
      .collect().map(_.getInt(0)).toSeq
    assert(native == hof)
    assert(native == Seq(3, 1, 0, 1, 0))
  }

  test("TokenCharSum matches aggregate(..., acc + length(x)) incl. unicode") {
    val spark2 = spark
    import spark2.implicits._
    // length() counts CHARACTERS, not bytes — the multibyte row pins that
    val df = Seq("abc de", "", "héllo wörld", "a b c").toDF("text")
      .withColumn("toks", split(col("text"), " "))
    val hof = df.select(
      expr("aggregate(toks, 0L, (acc, x) -> acc + length(x))").as("n"))
      .collect().map(_.getLong(0)).toSeq
    val native = df.select(FoldFunctions.tokenCharSum(col("toks")).as("n"))
      .collect().map(_.getLong(0)).toSeq
    assert(native == hof)
    assert(native == Seq(5L, 0L, 10L, 3L))
  }

  test("RollingFingerprint matches the aggregate/transform HOF pair incl. unicode") {
    val spark2 = spark
    import spark2.implicits._
    val df = Seq("abc de fgh", "", "héllo wörld", "a", "x " + "y" * 30)
      .toDF("text")
      .withColumn("toks", split(col("text"), " "))
    val hof = df.select(expr(
      "aggregate(transform(toks, x -> CAST(length(x) * 131 + " +
        "ascii(substring(x, 1, 1)) AS BIGINT)), 0L, " +
        "(acc, c) -> (acc * 1000003 + c) % 2147483647)").as("fp"))
      .collect().map(_.getLong(0)).toSeq
    val native = df.select(FoldFunctions.rollingFingerprint(col("toks")).as("fp"))
      .collect().map(_.getLong(0)).toSeq
    assert(native == hof)
  }

  test("null inputs yield null, matching the HOFs") {
    val spark2 = spark
    import spark2.implicits._
    val df = Seq(Tuple1(Option.empty[String])).toDF("text")
      .withColumn("toks", split(col("text"), " "))
    val row = df.select(
      FoldFunctions.markerCount(col("toks"), Seq("x")).as("mc"),
      FoldFunctions.tokenCharSum(col("toks")).as("tcs"),
      size(filter(col("toks"), x => x.isin("x"))).as("mc_hof"),
      expr("aggregate(toks, 0L, (acc, x) -> acc + length(x))").as("tcs_hof"))
      .collect().head
    assert(row.isNullAt(0) && row.isNullAt(1) && row.isNullAt(2) && row.isNullAt(3))
  }

  test("buildCentroids over the fold kernels is unchanged vs the HOF formulation") {
    val spark2 = spark
    import spark2.implicits._
    // deterministic synthetic embeddings; re-derive the pre-kernel
    // centroid build inline (the exact r7 HOF text) and require equality
    val dim = 8
    val rows = (0L until 200L).map { id =>
      (id, id % 3, (0 until dim).map(d => ((id * 31 + d * 7) % 13).toFloat / 13f))
    }
    val df = rows.toDF("vec_id", "label", "embedding")

    val native = graft.ops.Similarity
      .buildCentroids(df, dim, chunks = 16)
      .orderBy("clabel").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1)))

    val hof = df
      .groupBy(col("label"), (col("vec_id") % 16).as("_chunk"))
      .agg(array_sort(collect_list(struct(col("vec_id").as("id"),
        col("embedding").as("emb")))).as("vs"))
      .select(col("label"), col("_chunk"),
        expr(s"transform(sequence(1, $dim), d -> aggregate(vs, CAST(0.0 AS DOUBLE), " +
          "(s, v) -> s + CAST(element_at(v.emb, d) AS DOUBLE)))").as("psum"),
        expr("CAST(size(vs) AS BIGINT)").as("pcnt"))
      .groupBy(col("label"))
      .agg(array_sort(collect_list(struct(col("_chunk"), col("psum"), col("pcnt"))))
        .as("ps"))
      .select(col("label").as("clabel"),
        expr(s"transform(sequence(1, $dim), d -> CAST(" +
          "aggregate(ps, CAST(0.0 AS DOUBLE), (s, p) -> s + element_at(p.psum, d)) / " +
          "aggregate(ps, CAST(0 AS BIGINT), (s, p) -> s + p.pcnt) AS FLOAT))").as("cf"))
      .orderBy("clabel").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1)))

    assert(native.toSeq == hof.toSeq)
  }
}
