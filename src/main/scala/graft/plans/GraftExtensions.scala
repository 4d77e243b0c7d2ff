package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import graft.functions.{MinHashBandHashes, RepetitionStats, ShingleHashes, ShingleSetHash, SimHash32, VectorDot, WordNgramHash8, WordNgramHashFull, WordNgrams}

/** `SparkSessionExtensions` hook: registers the engine's native Catalyst
  * expressions as SQL functions, so `spark.sql` users get the codegen'd
  * kernels too (`SELECT vector_dot(a, b)`,
  * `SELECT explode(shingle_hashes(text, 8))`, ...).
  *
  * Activate per session with
  * `.config("spark.sql.extensions", "graft.plans.GraftExtensions")` or
  * `.withExtensions(new GraftExtensions)`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  /** The width/arity argument of a text kernel must be a literal int —
    * it parameterizes codegen, not per-row data. */
  private def intLit(e: Expression, fn: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$fn expects a literal integer argument, got $other")
  }

  private def textKernel(name: String, clazz: Class[_],
                         build: (Expression, Int) => Expression) = (
    new FunctionIdentifier(name),
    new ExpressionInfo(clazz.getName, name),
    (children: Seq[Expression]) => {
      require(children.size == 2, s"$name(text, n) takes exactly two arguments")
      build(children.head, intLit(children(1), name))
    })

  override def apply(ext: SparkSessionExtensions): Unit = {
    // Point-in-interval joins written in natural syntax get the
    // bucketized linear plan instead of a nested-loop fallback.
    ext.injectOptimizerRule(_ => RangeJoinRewrite)
    ext.injectFunction((
      new FunctionIdentifier("vector_dot"),
      new ExpressionInfo(classOf[VectorDot].getName, "vector_dot"),
      (children: Seq[Expression]) => {
        require(children.size == 2, "vector_dot(a, b) takes exactly two arguments")
        VectorDot(children.head, children(1))
      }))
    ext.injectFunction(textKernel("shingle_hashes",
      classOf[ShingleHashes], ShingleHashes.apply))
    ext.injectFunction(textKernel("word_ngrams",
      classOf[WordNgrams], WordNgrams.apply))
    ext.injectFunction(textKernel("word_ngram_hash8",
      classOf[WordNgramHash8], WordNgramHash8.apply))
    ext.injectFunction(textKernel("word_ngram_hash_full",
      classOf[WordNgramHashFull], WordNgramHashFull.apply))
    ext.injectFunction(textKernel("minhash_band_hashes",
      classOf[MinHashBandHashes], MinHashBandHashes.apply))
    ext.injectFunction(textKernel("simhash32",
      classOf[SimHash32], SimHash32.apply))
    ext.injectFunction(textKernel("shingle_set_hash",
      classOf[ShingleSetHash], ShingleSetHash.apply))
    ext.injectFunction((
      new FunctionIdentifier("repetition_stats"),
      new ExpressionInfo(classOf[RepetitionStats].getName, "repetition_stats"),
      (children: Seq[Expression]) => {
        require(children.size == 1, "repetition_stats(text) takes exactly one argument")
        RepetitionStats(children.head)
      }))
    // Spark ships Bloom-filter build/probe expressions for its own runtime
    // join filtering but does not register them as SQL functions; expose
    // them so the membership-sketch operators (Versioning.bloomNewDocs)
    // can build a distributed Bloom aggregate and probe it per row.
    ext.injectFunction((
      new FunctionIdentifier("bloom_filter_agg"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate].getName,
        "bloom_filter_agg"),
      (children: Seq[Expression]) => {
        require(children.size == 3,
          "bloom_filter_agg(xxhash64_value, estimatedItems, numBits) takes three arguments")
        new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(
          children.head, children(1), children(2))
      }))
    ext.injectFunction((
      new FunctionIdentifier("might_contain"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain].getName,
        "might_contain"),
      (children: Seq[Expression]) => {
        require(children.size == 2, "might_contain(bloom, value) takes two arguments")
        org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
          children.head, children(1))
      }))
  }
}
