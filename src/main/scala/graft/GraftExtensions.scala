package graft

import org.apache.spark.sql.{AnalysisException, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.types.{ArrayType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

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
  * arguments (shingle width, permutation count, field names) must be
  * foldable — they parameterize the expression instance itself and are
  * evaluated at builder time (constant folding has not run yet, so
  * `1 + 2` is folded here, the way Spark's own builders treat
  * literal-ish parameters).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, "")

  // Bad SQL arguments surface as AnalysisException with Spark's standard
  // error classes (not a raw runtime exception), so thrift/JDBC clients
  // get the usual SQLSTATE + message shape.
  private def nonFoldable(fn: String, param: String, typ: String): Nothing =
    throw new AnalysisException(
      errorClass = "NON_FOLDABLE_ARGUMENT",
      messageParameters = Map(
        "funcName" -> s"`$fn`", "paramName" -> s"`$param`", "paramType" -> s""""$typ""""))

  // Foldable-but-not-yet-folded expressions (e.g. `1 + 2` — constant
  // folding has not run at function-builder time) are evaluated here, the
  // way Spark's own builders treat literal-ish parameters.
  private def intLit(fn: String, param: String, e: Expression): Int = e match {
    case ex if ex.foldable && ex.dataType == IntegerType =>
      ex.eval() match {
        case v: Int => v
        case _ => nonFoldable(fn, param, "INT")  // foldable NULL literal
      }
    case _ => nonFoldable(fn, param, "INT")
  }

  private def strLit(fn: String, param: String, e: Expression): String = e match {
    case ex if ex.foldable && ex.dataType == StringType =>
      ex.eval() match {
        case s: UTF8String => s.toString
        case _ => nonFoldable(fn, param, "STRING")
      }
    case _ => nonFoldable(fn, param, "STRING")
  }

  private def strArrayLit(fn: String, param: String, e: Expression): Seq[String] =
    e match {
      case ex if ex.foldable && (ex.dataType match {
          case ArrayType(StringType, _) => true; case _ => false }) =>
        ex.eval() match {
          case a: org.apache.spark.sql.catalyst.util.ArrayData =>
            (0 until a.numElements()).map { i =>
              if (a.isNullAt(i)) nonFoldable(fn, param, "ARRAY<STRING>")
              else a.getUTF8String(i).toString
            }
          case _ => nonFoldable(fn, param, "ARRAY<STRING>")
        }
      case _ => nonFoldable(fn, param, "ARRAY<STRING>")
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
    ext.injectFunction((FunctionIdentifier("shingle_pos60"),
      info("shingle_pos60",
        "shingle_pos60(array<string>, n) - positioned (1-based, non-distinct) " +
          "60-bit n-gram hashes as array<struct<pos:int, gv:bigint>>"),
      (args: Seq[Expression]) => {
        arity("shingle_pos60", args, 2)
        ShinglePos60(args(0), intLit("shingle_pos60", "n", args(1)))
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
    ext.injectFunction((FunctionIdentifier("bigram_stats"),
      info("bigram_stats",
        "bigram_stats(array<string>) - [total, distinct, top] bigram repetition counts"),
      (args: Seq[Expression]) => {
        arity("bigram_stats", args, 1)
        BigramStats(args(0))
      }))
    ext.injectFunction((FunctionIdentifier("posting_pairs"),
      info("posting_pairs",
        "posting_pairs(array<struct>) - lazy candidate-pair expansion of a posting list"),
      (args: Seq[Expression]) => {
        arity("posting_pairs", args, 1)
        PostingPairs(args(0))
      }))
    ext.injectFunction((FunctionIdentifier("marker_count"),
      info("marker_count",
        "marker_count(array<string>, array<string>) - count of tokens in a fixed marker set"),
      (args: Seq[Expression]) => {
        arity("marker_count", args, 2)
        MarkerCount(args(0), strArrayLit("marker_count", "words", args(1)))
      }))
    ext.injectFunction((FunctionIdentifier("token_char_sum"),
      info("token_char_sum",
        "token_char_sum(array<string>) - total character count of a token array"),
      (args: Seq[Expression]) => {
        arity("token_char_sum", args, 1)
        TokenCharSum(args(0))
      }))
    ext.injectFunction((FunctionIdentifier("rolling_fp"),
      info("rolling_fp",
        "rolling_fp(array<string>) - modular rolling hash over per-token codes"),
      (args: Seq[Expression]) => {
        arity("rolling_fp", args, 1)
        RollingFingerprint(args(0))
      }))
    ext.injectFunction((FunctionIdentifier("vec_field_sum"),
      info("vec_field_sum",
        "vec_field_sum(array<struct>, field, dim) - elementwise ordered sum of a vector struct field"),
      (args: Seq[Expression]) => {
        arity("vec_field_sum", args, 3)
        OrderedVecFieldSum(args(0), strLit("vec_field_sum", "field", args(1)),
          intLit("vec_field_sum", "dim", args(2)))
      }))
    ext.injectFunction((FunctionIdentifier("vec_field_mean"),
      info("vec_field_mean",
        "vec_field_mean(array<struct>, sumField, cntField, dim) - elementwise ordered mean from (sum, count) partials"),
      (args: Seq[Expression]) => {
        arity("vec_field_mean", args, 4)
        OrderedVecFieldMean(args(0), strLit("vec_field_mean", "sumField", args(1)),
          strLit("vec_field_mean", "cntField", args(2)),
          intLit("vec_field_mean", "dim", args(3)))
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
