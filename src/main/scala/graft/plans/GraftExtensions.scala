package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{CosineSimilarity, MinHashSignature, PostingPairs, ShingleHash60, SimHash32, WordShingles}

/** SparkSessionExtensions entry point: registers the engine's native
  * expressions as SQL functions so `spark.sql(...)` users get them too.
  *
  *   SparkSession.builder().withExtensions(new GraftExtensions)  // or
  *   --conf spark.sql.extensions=graft.plans.GraftExtensions
  *
  * No custom optimizer Rule or SparkStrategy is registered: reference
  * parity needs none (SURVEY §4 — the hand-applied optimizations of the
  * reference are all things Catalyst already does), so the extension
  * surface is exactly the new expressions.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage,
      "", "", "", "", "", "", "scala_udf")

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((FunctionIdentifier("cosine_sim"),
      info("cosine_sim", "cosine_sim(a, b) - cosine similarity of two float vectors"),
      (children: Seq[Expression]) => CosineSimilarity(children(0), children(1))))
    ext.injectFunction((FunctionIdentifier("minhash_sig"),
      info("minhash_sig", "minhash_sig(shingles) - 16-perm MinHash signature"),
      (children: Seq[Expression]) => MinHashSignature(children.head)))
    ext.injectFunction((FunctionIdentifier("simhash32"),
      info("simhash32", "simhash32(tokens) - 32-bit SimHash"),
      (children: Seq[Expression]) => SimHash32(children.head)))
    ext.injectFunction((FunctionIdentifier("word_shingles"),
      info("word_shingles", "word_shingles(tokens) - distinct 3-gram shingles"),
      (children: Seq[Expression]) => WordShingles(children.head)))
    ext.injectFunction((FunctionIdentifier("shingle_hash60"),
      info("shingle_hash60", "shingle_hash60(tokens) - distinct 60-bit hashed 3-gram shingles"),
      (children: Seq[Expression]) => ShingleHash60(children.head)))
    ext.injectFunction((FunctionIdentifier("posting_pairs"),
      info("posting_pairs", "posting_pairs(ds) - generator: candidate pairs of a posting list"),
      (children: Seq[Expression]) => PostingPairs(children.head)))
  }
}
