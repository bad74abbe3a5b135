package graft

import org.apache.spark.sql.{AnalysisException, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.IntegerType

import graft.functions._

/** SQL surface for the engine's native expressions (builder contract:
  * custom operators registered via `SparkSessionExtensions`). With
  *
  *   SparkSession.builder().withExtensions(new GraftExtensions)  // or
  *   --conf spark.sql.extensions=graft.GraftExtensions
  *
  * the function library becomes usable from pure SQL — `spark.sql(...)`,
  * views, thrift/JDBC clients — not just the Scala Column API:
  *
  *   SELECT simhash32(split(text, ' ')) FROM docs
  *   SELECT cosine_sim(a.emb, b.emb) FROM ...
  *   SELECT minhash_sig(shingle_hash60(toks, 3), 16) ...
  *   SELECT geom_hex_to_wkt(geo) ...
  *   SELECT word_shingles(toks, 2) ...
  *
  * Each registration maps 1:1 onto an existing Catalyst expression, so
  * SQL and Column routes produce byte-identical plans. Optional trailing
  * arguments (shingle width, permutation count) must be integer literals
  * — they parameterize the expression instance itself.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, "")

  // Bad SQL arguments surface as AnalysisException with Spark's standard
  // error classes (not a raw runtime exception), so thrift/JDBC clients
  // get the usual SQLSTATE + message shape.
  private def intLit(fn: String, param: String, e: Expression): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case _ => throw new AnalysisException(
      errorClass = "NON_FOLDABLE_ARGUMENT",
      messageParameters = Map(
        "funcName" -> s"`$fn`", "paramName" -> s"`$param`", "paramType" -> "\"INT\""))
  }

  private def arity(name: String, args: Seq[Expression], ns: Int*): Unit =
    if (!ns.contains(args.length)) throw new AnalysisException(
      errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
      messageParameters = Map(
        "functionName" -> s"`$name`",
        "expectedNum" -> ns.mkString(" or "),
        "actualNum" -> args.length.toString,
        "docroot" -> org.apache.spark.SPARK_DOC_ROOT))

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((FunctionIdentifier("cosine_sim"),
      info("cosine_sim", "cosine_sim(array<float>, array<float>) - exact cosine similarity"),
      (args: Seq[Expression]) => {
        arity("cosine_sim", args, 2)
        CosineSimilarity(args(0), args(1))
      }))
    ext.injectFunction((FunctionIdentifier("simhash32"),
      info("simhash32", "simhash32(array<string>) - 32-bit SimHash fingerprint"),
      (args: Seq[Expression]) => {
        arity("simhash32", args, 1)
        SimHash32(args(0))
      }))
    ext.injectFunction((FunctionIdentifier("shingle_hash60"),
      info("shingle_hash60",
        "shingle_hash60(array<string>[, n]) - distinct 60-bit hashed n-gram shingles"),
      (args: Seq[Expression]) => {
        arity("shingle_hash60", args, 1, 2)
        if (args.length == 1) ShingleHash60(args(0))
        else ShingleHash60(args(0), intLit("shingle_hash60", "n", args(1)))
      }))
    ext.injectFunction((FunctionIdentifier("minhash_sig"),
      info("minhash_sig",
        "minhash_sig(array<string>|array<bigint>[, numPerms]) - MinHash signature"),
      (args: Seq[Expression]) => {
        arity("minhash_sig", args, 1, 2)
        if (args.length == 1) MinHashSignature(args(0))
        else MinHashSignature(args(0), intLit("minhash_sig", "numPerms", args(1)))
      }))
    ext.injectFunction((FunctionIdentifier("word_shingles"),
      info("word_shingles",
        "word_shingles(array<string>[, n]) - distinct space-joined n-gram shingles"),
      (args: Seq[Expression]) => {
        arity("word_shingles", args, 1, 2)
        if (args.length == 1) WordShingles(args(0))
        else WordShingles(args(0), intLit("word_shingles", "n", args(1)))
      }))
    ext.injectFunction((FunctionIdentifier("posting_pairs"),
      info("posting_pairs",
        "posting_pairs(array<struct>) - lazy candidate-pair expansion of a posting list"),
      (args: Seq[Expression]) => {
        arity("posting_pairs", args, 1)
        PostingPairs(args(0))
      }))
    ext.injectFunction((FunctionIdentifier("geom_hex_to_wkt"),
      info("geom_hex_to_wkt",
        "geom_hex_to_wkt(hex) - WKT of a MySQL GEOMETRY value (SRID+WKB); NULL if malformed"),
      (args: Seq[Expression]) => {
        arity("geom_hex_to_wkt", args, 1)
        WkbHexToWkt(args(0))
      }))
  }
}
