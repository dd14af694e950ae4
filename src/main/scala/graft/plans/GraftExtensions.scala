package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.graftbridge._

/** SparkSessionExtensions injector — the public registration path for
  * graft's native expressions, usable via
  * `spark.sql.extensions=graft.plans.GraftExtensions` so plain SQL can call
  * every native function (SURVEY.md §7.3: custom Expression registered via
  * SparkSessionExtensions). Scalar parameters (modulus, gram size, plane
  * counts) are taken as foldable literals, exactly like builtin SQL
  * functions with static arguments.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.all.foreach(ext.injectFunction)
    // whole-operator extension: top-k-per-key logical node → two-phase
    // bounded-heap physical plan (see graftbridge/plans.scala)
    ext.injectPlannerStrategy(_ => TopKPerKeyStrategy)
    // optimizer rewrite: declarative row_number()-rank-filter top-k queries
    // re-plan onto the heap operator automatically (disable per session via
    // spark.graft.topkRewrite.enabled=false)
    ext.injectOptimizerRule(_ => TopKRewriteRule)
    // optimizer rewrite: eager aggregation below provably-safe inner joins
    // (disable per session via spark.graft.eagerAgg.enabled=false)
    ext.injectOptimizerRule(_ => EagerAggRule)
    // optimizer rewrite: stats-fed broadcast hints + inner-join-chain
    // reorder from the persisted x129/x132 statistics artifact
    // (OPT-IN per session via spark.graft.statsJoin.enabled=true after
    // graft.sources.JoinStats.ensure wires the provider)
    ext.injectOptimizerRule(_ => StatsJoinRule)
    // optimizer rewrite: stats-fed skew SALTING — a qualifying inner
    // equi-join whose probe key's count-min bound shows a dominant value
    // re-plans onto a salted shuffle key (OPT-IN per session via
    // spark.graft.skewSalt.enabled=true after JoinStats.ensure)
    ext.injectOptimizerRule(_ => StatsSkewRule)
  }
}

object GraftExtensions {

  private def lit(e: Expression, what: String): Long = {
    require(e.foldable, s"$what must be a literal")
    e.eval().asInstanceOf[Number].longValue()
  }

  private def info(name: String, cls: Class[_], usage: String) =
    new ExpressionInfo(cls.getName, null, name, usage, "")

  private def fn(
      name: String,
      cls: Class[_],
      usage: String,
      build: Seq[Expression] => Expression
  ): (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier(name), info(name, cls, usage), build)

  /** every native expression, SQL-callable */
  val all: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    fn(
      "cosine_f32",
      classOf[CosineSimF32Expr],
      "cosine_f32(a, b) - float32 cosine similarity of two float arrays",
      es => CosineSimF32Expr(es.head, es(1))
    ),
    fn(
      "rolling_hash",
      classOf[RollingHashExpr],
      "rolling_hash(s, m) - polynomial rolling hash of s's code points mod m",
      es => RollingHashExpr(es.head, lit(es(1), "rolling_hash modulus"))
    ),
    fn(
      "char_gram_hashes",
      classOf[CharGramHashesExpr],
      "char_gram_hashes(s, n) - sorted distinct md5-window hashes of all char n-grams",
      es => CharGramHashesExpr(es.head, lit(es(1), "char_gram_hashes n").toInt)
    ),
    fn(
      "char_gram_all_hashes",
      classOf[CharGramAllHashesExpr],
      "char_gram_all_hashes(s, n) - positional (non-distinct) md5-window hashes of all char n-grams",
      es => CharGramAllHashesExpr(es.head, lit(es(1), "char_gram_all_hashes n").toInt)
    ),
    fn(
      "token_gram_hashes",
      classOf[TokenGramHashesExpr],
      "token_gram_hashes(s, n) - sorted distinct md5-window hashes of all word n-grams",
      es => TokenGramHashesExpr(es.head, lit(es(1), "token_gram_hashes n").toInt)
    ),
    fn(
      "simhash_sig",
      classOf[SimHashSigExpr],
      "simhash_sig(s) - 62-bit SimHash signature as [lo31, hi31]",
      es => SimHashSigExpr(es.head)
    ),
    fn(
      "band_sigs",
      classOf[BandSigsExpr],
      "band_sigs(emb, planes, rows) - hyperplane-LSH band bucket keys of a float array",
      es => BandSigsExpr(es.head, lit(es(1), "band_sigs planes").toInt, lit(es(2), "band_sigs rows").toInt)
    ),
    fn(
      "winnow_fingerprints",
      classOf[WinnowFingerprintExpr],
      "winnow_fingerprints(s, n, w) - sorted distinct window-min char n-gram hashes (winnowing)",
      es =>
        WinnowFingerprintExpr(es.head, lit(es(1), "winnow n").toInt, lit(es(2), "winnow w").toInt)
    ),
    fn(
      "jaro_winkler",
      classOf[JaroWinklerExpr],
      "jaro_winkler(a, b) - Jaro-Winkler similarity (DuckDB-identical arithmetic)",
      es => JaroWinklerExpr(es.head, es(1))
    )
  )

  /** Register all graft functions on an already-built session. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val b = org.apache.spark.sql.graftbridge.Bridge
    b.registerFunction(spark, "cosine_f32", es => CosineSimF32Expr(es.head, es(1)))
    b.registerFunction(spark, "rolling_hash", es => RollingHashExpr(es.head, lit(es(1), "modulus")))
    b.registerFunction(spark, "char_gram_hashes", es => CharGramHashesExpr(es.head, lit(es(1), "n").toInt))
    b.registerFunction(spark, "char_gram_all_hashes", es => CharGramAllHashesExpr(es.head, lit(es(1), "n").toInt))
    b.registerFunction(spark, "token_gram_hashes", es => TokenGramHashesExpr(es.head, lit(es(1), "n").toInt))
    b.registerFunction(spark, "simhash_sig", es => SimHashSigExpr(es.head))
    b.registerFunction(
      spark,
      "band_sigs",
      es => BandSigsExpr(es.head, lit(es(1), "planes").toInt, lit(es(2), "rows").toInt)
    )
    b.registerFunction(
      spark,
      "winnow_fingerprints",
      es => WinnowFingerprintExpr(es.head, lit(es(1), "n").toInt, lit(es(2), "w").toInt)
    )
    b.registerFunction(spark, "jaro_winkler", es => JaroWinklerExpr(es.head, es(1)))
  }
}
