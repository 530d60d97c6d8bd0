package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, IntegerLiteral, Literal}

/** SQL-text registration for graft's custom Catalyst expressions: the
  * same engine surface [[GraftFunctions]] exposes to the Column API,
  * made callable from `spark.sql("SELECT canonical_id(Id) …")`. A user
  * of the reference driving everything through SQL strings (the
  * reference's own query surface is SOQL text) gets the library's
  * functions without touching the Scala API.
  *
  * One definition, two installation routes:
  *   - session build time: `spark.sql.extensions=graft.plans.GraftExtensions`
  *     (which calls [[installInto]] via injectFunction), or
  *   - an existing session: [[registerAll]] — same tuples into the
  *     session's FunctionRegistry (used by tests on the shared session).
  *
  * Only fixed-arity scalar expressions register; family constants
  * (MinHash permutations) default to the engine's committed family so
  * SQL callers compute the SAME signatures the dedup pipelines and the
  * DuckDB oracle reproduce.
  */
object GraftFunctionRegistry {
  type Builder = Seq[Expression] => Expression

  private def intLit(fn: String, arg: String, e: Expression): Int = e match {
    case IntegerLiteral(v) => v
    case Literal(v: Long, org.apache.spark.sql.types.LongType) => v.toInt
    case other => throw new IllegalArgumentException(
      s"$fn: $arg must be an integer literal, got $other")
  }

  private def longLit(fn: String, arg: String, e: Expression): Long = e match {
    case Literal(v: Long, org.apache.spark.sql.types.LongType) => v
    case IntegerLiteral(v) => v.toLong
    case other => throw new IllegalArgumentException(
      s"$fn: $arg must be an integer literal, got $other")
  }

  private def arity(fn: String, n: Int)(b: Builder): Builder = args => {
    if (args.length != n) throw new IllegalArgumentException(
      s"$fn expects $n argument(s), got ${args.length}")
    b(args)
  }

  /** (name, class-for-docs, builder) for every SQL-exposed function. */
  val functions: Seq[(String, Class[_], Builder)] = Seq(
    ("canonical_id", classOf[CanonicalId],
      arity("canonical_id", 1)(a => CanonicalId(a.head))),
    ("rolling_hash64", classOf[RollingHash64],
      arity("rolling_hash64", 1)(a => RollingHash64(a.head))),
    ("nfc_normalize", classOf[NfcNormalize],
      arity("nfc_normalize", 1)(a => NfcNormalize(a.head))),
    ("md5_64_array", classOf[Md5LongArray],
      arity("md5_64_array", 1)(a => Md5LongArray(a.head))),
    ("simhash_fold", classOf[SimhashFold],
      arity("simhash_fold", 1)(a => SimhashFold(a.head))),
    ("gram_hist64", classOf[GramHist64],
      arity("gram_hist64", 1)(a => GramHist64(a.head))),
    ("char_ngrams", classOf[CharNgrams],
      arity("char_ngrams", 2)(a =>
        CharNgrams(a.head, intLit("char_ngrams", "n", a(1))))),
    ("word_shingles", classOf[WordShingles],
      arity("word_shingles", 2)(a =>
        WordShingles(a.head, intLit("word_shingles", "w", a(1))))),
    ("mul_add64", classOf[MulAdd64],
      arity("mul_add64", 3)(a => MulAdd64(a.head,
        longLit("mul_add64", "a", a(1)), longLit("mul_add64", "c", a(2))))),
    ("sorted_intersect_size", classOf[SortedIntersectSize],
      arity("sorted_intersect_size", 2)(a =>
        SortedIntersectSize(a.head, a(1)))),
    ("min_sum64", classOf[MinSum64],
      arity("min_sum64", 2)(a => MinSum64(a.head, a(1)))),
    ("dot_fold", classOf[DotFold],
      arity("dot_fold", 2)(a => DotFold(a.head, a(1)))),
    ("zorder64", classOf[ZOrder64],
      arity("zorder64", 2)(a => ZOrder64(
        org.apache.spark.sql.catalyst.expressions.Cast(
          a.head, org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.catalyst.expressions.Cast(
          a(1), org.apache.spark.sql.types.LongType)))),
    // frame_byte_sums(payload[, frameSize[, maxFrames]])
    ("frame_byte_sums", classOf[FrameByteSums], { args =>
      args.length match {
        case 1 => FrameByteSums(args.head, 256, 8)
        case 2 => FrameByteSums(args.head,
          intLit("frame_byte_sums", "frameSize", args(1)), 8)
        case 3 => FrameByteSums(args.head,
          intLit("frame_byte_sums", "frameSize", args(1)),
          intLit("frame_byte_sums", "maxFrames", args(2)))
        case n => throw new IllegalArgumentException(
          s"frame_byte_sums expects 1-3 arguments, got $n")
      }
    }),
    // The engine's committed MinHash permutation family — SQL callers get
    // the same signatures the dedup pipelines and the oracle compute.
    ("minhash_sigs", classOf[MinhashSigs],
      arity("minhash_sigs", 1)(a => MinhashSigs(a.head,
        graft.queries.DedupOps.PermA, graft.queries.DedupOps.PermC))))

  private def info(name: String, cls: Class[_]): ExpressionInfo =
    new ExpressionInfo(cls.getCanonicalName, name)

  /** Injection route for a session built with GraftExtensions. */
  def installInto(ext: org.apache.spark.sql.SparkSessionExtensions): Unit =
    functions.foreach { case (name, cls, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info(name, cls), builder))
    }

  /** Direct route for an already-built session (tests, REPL). */
  def registerAll(spark: SparkSession): Unit =
    functions.foreach { case (name, cls, builder) =>
      spark.sessionState.functionRegistry.registerFunction(
        FunctionIdentifier(name), info(name, cls), builder)
    }
}
