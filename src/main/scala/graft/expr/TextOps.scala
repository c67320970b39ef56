package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.lower
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.unsafe.types.UTF8String

/**
 * Native Catalyst expressions for the corpus token/shingle/gram pipeline.
 *
 * The declarative chain `filter(split(lower(text), "[^a-z0-9]+"), _ != "")`
 * -> arrays_zip of k shifted slices -> transform(concat_ws) ->
 * array_distinct re-evaluates the token split per slice reference, runs
 * every lambda interpreted, and `String.split` recompiles the regex
 * Pattern on EVERY row (the exact code path `UTF8String.split` takes).
 * These expressions produce bit-identical outputs — same String.split(-1)
 * semantics via a cached Pattern (Pattern.split IS String.split's slow
 * path), same empty-token filter, same space-joined grams, same
 * first-occurrence array_distinct order, same md5/60-bit gram hash as
 * `conv(substring(md5(s),1,15),16,10)` — in one pass per row. Lower stays
 * a real Catalyst `Lower` child, so case mapping is byte-for-byte Spark's.
 * TextOpsSpec holds the differential against the HOF formulations on real
 * documents and adversarial strings.
 *
 * Null semantics replicated: tokens(null) = null (split is
 * null-intolerant); shingles/gram-hashes of a null input = EMPTY array
 * (the HOF's `when(size(null) >= k, ...)` takes the otherwise(empty)
 * branch), so those two are non-nullable.
 */
object TextCore {

  private val tokenSep = java.util.regex.Pattern.compile("[^a-z0-9]+")

  /** `filter(split(lowered, "[^a-z0-9]+"), _ != "")` in one pass —
    * String.split(-1) semantics (leading empty kept by split, then
    * dropped by the filter like every other empty part). */
  def tokens(lowered: UTF8String): ArrayData = {
    val parts = tokenSep.split(lowered.toString, -1)
    var n = 0
    var i = 0
    while (i < parts.length) { if (!parts(i).isEmpty) n += 1; i += 1 }
    val out = new Array[AnyRef](n)
    var j = 0
    i = 0
    while (i < parts.length) {
      if (!parts(i).isEmpty) { out(j) = UTF8String.fromString(parts(i)); j += 1 }
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Distinct word k-shingles of the lowered text (first-occurrence
    * order, exactly array_distinct's) — fewer than k tokens -> empty. */
  def shingles(lowered: UTF8String, k: Int): ArrayData = {
    if (lowered == null) return new GenericArrayData(new Array[AnyRef](0))
    val parts = tokenSep.split(lowered.toString, -1)
    val toks = new java.util.ArrayList[String]()
    var i = 0
    while (i < parts.length) { if (!parts(i).isEmpty) toks.add(parts(i)); i += 1 }
    val n = toks.size
    if (n < k) return new GenericArrayData(new Array[AnyRef](0))
    val seen = new java.util.LinkedHashSet[String]()
    i = 0
    while (i <= n - k) {
      val sb = new java.lang.StringBuilder(toks.get(i))
      var j = 1
      while (j < k) { sb.append(' ').append(toks.get(i + j)); j += 1 }
      seen.add(sb.toString)
      i += 1
    }
    val out = new Array[AnyRef](seen.size)
    val it = seen.iterator()
    var m = 0
    while (it.hasNext) { out(m) = UTF8String.fromString(it.next()); m += 1 }
    new GenericArrayData(out)
  }

  /** 60-bit md5 hash (== conv(substring(md5(s),1,15),16,10)) of every
    * positional k-gram of a token array, index order, non-distinct —
    * the [[graft.dedup.Dedup]] dupSpans gram pipeline fused so the gram
    * strings are never materialized as rows. Fewer than k tokens ->
    * empty; null input -> empty (when-otherwise branch in the HOF). */
  def gramHashes(toks: ArrayData, k: Int): ArrayData = {
    if (toks == null) return ArrayData.toArrayData(new Array[Long](0))
    val n = toks.numElements()
    if (n < k) return ArrayData.toArrayData(new Array[Long](0))
    val bs = new Array[Array[Byte]](n)
    var i = 0
    while (i < n) { bs(i) = toks.getUTF8String(i).getBytes; i += 1 }
    val d = java.security.MessageDigest.getInstance("MD5")
    val out = new Array[Long](n - k + 1)
    i = 0
    while (i <= n - k) {
      d.reset()
      d.update(bs(i))
      var j = 1
      while (j < k) { d.update(' '.toByte); d.update(bs(i + j)); j += 1 }
      val dig = d.digest()
      var v = 0L
      var b = 0
      while (b < 7) { v = (v << 8) | (dig(b) & 0xffL); b += 1 }
      out(i) = (v << 4) | ((dig(7) & 0xffL) >>> 4)
      i += 1
    }
    ArrayData.toArrayData(out)
  }

  /** 60-bit md5 hash of every DISTINCT word k-shingle (first-occurrence
    * order) — [[shingles]] composed with the per-gram hash of
    * [[gramHashes]] without materializing the gram strings as rows
    * (the contamination pipeline's corpus pass, which KeyCaps runs
    * twice). Null / <k tokens -> empty. */
  def shingleHashes(lowered: UTF8String, k: Int): ArrayData = {
    if (lowered == null) return ArrayData.toArrayData(new Array[Long](0))
    val parts = tokenSep.split(lowered.toString, -1)
    val toks = new java.util.ArrayList[String]()
    var i = 0
    while (i < parts.length) { if (!parts(i).isEmpty) toks.add(parts(i)); i += 1 }
    val n = toks.size
    if (n < k) return ArrayData.toArrayData(new Array[Long](0))
    val seen = new java.util.LinkedHashSet[String]()
    i = 0
    while (i <= n - k) {
      val sb = new java.lang.StringBuilder(toks.get(i))
      var j = 1
      while (j < k) { sb.append(' ').append(toks.get(i + j)); j += 1 }
      seen.add(sb.toString)
      i += 1
    }
    val d = java.security.MessageDigest.getInstance("MD5")
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var m = 0
    while (it.hasNext) {
      d.reset()
      val dig = d.digest(UTF8String.fromString(it.next()).getBytes)
      var v = 0L
      var b = 0
      while (b < 7) { v = (v << 8) | (dig(b) & 0xffL); b += 1 }
      out(m) = (v << 4) | ((dig(7) & 0xffL) >>> 4)
      m += 1
    }
    ArrayData.toArrayData(out)
  }

  /** Longest equal-run over the token array after grouping equal tokens
    * adjacently — the Gopher most-frequent-word count. Result is
    * sort-order-independent (only equal-adjacency matters), identical to
    * the `aggregate` fold over sort_array in the HOF reference. Empty ->
    * 0. */
  def topRunCount(toks: ArrayData): Long = {
    val n = toks.numElements()
    if (n == 0) return 0L
    val arr = new Array[UTF8String](n)
    var i = 0
    while (i < n) { arr(i) = toks.getUTF8String(i); i += 1 }
    java.util.Arrays.sort(arr.asInstanceOf[Array[AnyRef]])
    var best = 1L; var run = 1L
    i = 1
    while (i < n) {
      if (arr(i).equals(arr(i - 1))) run += 1 else run = 1
      if (run > best) best = run
      i += 1
    }
    best
  }

  /** struct(n_tokens, score_int) of the hashed-linear-classifier fold
    * (q68): per token, bucket = md5_60("w:" + tok) mod nBuckets (the
    * 60-bit packing == conv(substring(md5(s),1,15),16,10), same as
    * [[gramHashes]]), weight = (bucket * 2654435761) mod 8191 - 4095,
    * summed left-to-right. All intermediates are non-negative and
    * bounded (nBuckets is capped at the wrapper so bucket * 2654435761
    * cannot overflow), so % == pmod and Long arithmetic is exact. The
    * declarative `aggregate` fold ran every lambda interpreted and
    * built the "w:"-prefixed string, the hex md5 string and a conv()
    * parse per token; this is one digest per token, no strings. */
  def classifierScore(toks: ArrayData, nBuckets: Long): org.apache.spark.sql.catalyst.InternalRow = {
    val n = toks.numElements()
    val d = java.security.MessageDigest.getInstance("MD5")
    var score = 0L
    var i = 0
    while (i < n) {
      d.reset()
      d.update('w'.toByte)
      d.update(':'.toByte)
      d.update(toks.getUTF8String(i).getBytes)
      val dig = d.digest()
      var v = 0L
      var b = 0
      while (b < 7) { v = (v << 8) | (dig(b) & 0xffL); b += 1 }
      val h = (v << 4) | ((dig(7) & 0xffL) >>> 4)
      score += (h % nBuckets) * 2654435761L % 8191L - 4095L
      i += 1
    }
    org.apache.spark.sql.catalyst.InternalRow(n.toLong, score)
  }

  /** (n_2grams, n_dup_2grams) of the non-distinct word 2-gram list — the
    * Gopher duplicate-2-gram signal, one pass with a hash set instead of
    * materializing the gram array twice (size + array_distinct). Null or
    * <2 tokens -> (0, 0), the HOF's when-otherwise(empty) branch. */
  def twoGramCounts(toks: ArrayData): org.apache.spark.sql.catalyst.InternalRow = {
    if (toks == null || toks.numElements() < 2)
      return org.apache.spark.sql.catalyst.InternalRow(0L, 0L)
    val n = toks.numElements()
    val seen = new java.util.HashSet[String]()
    var dup = 0L
    var i = 0
    while (i < n - 1) {
      val g = toks.getUTF8String(i).toString + " " + toks.getUTF8String(i + 1).toString
      if (!seen.add(g)) dup += 1
      i += 1
    }
    org.apache.spark.sql.catalyst.InternalRow((n - 1).toLong, dup)
  }
}

/** tokens(lowered): lowercase-alnum token array; pair with a `Lower`
  * child via [[textops.tokens_of]]. */
case class TokensExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"tokens needs a string input, got ${child.dataType}")

  override def nullSafeEval(s: Any): Any = TextCore.tokens(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => s"graft.expr.TextCore.tokens($s)")

  override protected def withNewChildInternal(newChild: Expression): TokensExpr =
    copy(child = newChild)
}

/** shingles(lowered, k): distinct word k-grams; null -> empty array. */
case class ShinglesExpr(child: Expression, k: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"shingles needs a string input, got ${child.dataType}")

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any =
    TextCore.shingles(child.eval(input).asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val vGen = child.genCode(ctx)
    val vVal = if (child.nullable) s"${vGen.isNull} ? null : ${vGen.value}" else vGen.value
    val code =
      code"""
         |${vGen.code}
         |${org.apache.spark.sql.catalyst.expressions.codegen.CodeGenerator.javaType(dataType)} ${ev.value} =
         |  graft.expr.TextCore.shingles(($vVal), $k);
       """.stripMargin
    ev.copy(code = code,
      isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): ShinglesExpr =
    copy(child = newChild)
}

/** gram_hashes(tokens, k): 60-bit md5 of each positional k-gram; null ->
  * empty array. */
case class GramHashes(child: Expression, k: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"gram_hashes needs an array<string> input, got $other")
    }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any =
    TextCore.gramHashes(child.eval(input).asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val vGen = child.genCode(ctx)
    val vVal = if (child.nullable) s"${vGen.isNull} ? null : ${vGen.value}" else vGen.value
    val code =
      code"""
         |${vGen.code}
         |${org.apache.spark.sql.catalyst.expressions.codegen.CodeGenerator.javaType(dataType)} ${ev.value} =
         |  graft.expr.TextCore.gramHashes(($vVal), $k);
       """.stripMargin
    ev.copy(code = code,
      isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): GramHashes =
    copy(child = newChild)
}

/** shingle_hashes(lowered, k): 60-bit md5 per distinct word k-gram;
  * null -> empty array. */
case class ShingleHashes(child: Expression, k: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"shingle_hashes needs a string input, got ${child.dataType}")

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any =
    TextCore.shingleHashes(child.eval(input).asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val vGen = child.genCode(ctx)
    val vVal = if (child.nullable) s"${vGen.isNull} ? null : ${vGen.value}" else vGen.value
    val code =
      code"""
         |${vGen.code}
         |${org.apache.spark.sql.catalyst.expressions.codegen.CodeGenerator.javaType(dataType)} ${ev.value} =
         |  graft.expr.TextCore.shingleHashes(($vVal), $k);
       """.stripMargin
    ev.copy(code = code,
      isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)
}

/** top_run_count(tokens): longest equal-token run (Gopher top-word
  * count); null -> null (the HOF aggregate over sort_array(null)). */
case class TopRunCount(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"top_run_count needs an array<string> input, got $other")
    }

  override def nullSafeEval(toks: Any): Any =
    TextCore.topRunCount(toks.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t => s"graft.expr.TextCore.topRunCount($t)")

  override protected def withNewChildInternal(newChild: Expression): TopRunCount =
    copy(child = newChild)
}

/** two_gram_counts(tokens): struct(n_2grams, n_dup_2grams); null -> (0,0). */
case class TwoGramCounts(child: Expression) extends UnaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("n2", LongType, nullable = false),
    org.apache.spark.sql.types.StructField("ndup", LongType, nullable = false)))
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"two_gram_counts needs an array<string> input, got $other")
    }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any =
    TextCore.twoGramCounts(child.eval(input).asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val vGen = child.genCode(ctx)
    val vVal = if (child.nullable) s"${vGen.isNull} ? null : ${vGen.value}" else vGen.value
    val code =
      code"""
         |${vGen.code}
         |InternalRow ${ev.value} = graft.expr.TextCore.twoGramCounts(($vVal));
       """.stripMargin
    ev.copy(code = code,
      isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): TwoGramCounts =
    copy(child = newChild)
}

/** classifier_score(tokens, nBuckets): struct(n_tokens, score_int) of
  * the hashed linear classifier; null tokens -> null (the HOF's
  * size(null)/aggregate(null) propagation). */
case class ClassifierScore(child: Expression, nBuckets: Long) extends UnaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("n_tokens", LongType, nullable = false),
    org.apache.spark.sql.types.StructField("score_int", LongType, nullable = false)))
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"classifier_score needs an array<string> input, got $other")
    }

  override def nullSafeEval(toks: Any): Any =
    TextCore.classifierScore(toks.asInstanceOf[ArrayData], nBuckets)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t => s"graft.expr.TextCore.classifierScore($t, ${nBuckets}L)")

  override protected def withNewChildInternal(newChild: Expression): ClassifierScore =
    copy(child = newChild)
}

/** Column-level surface. */
object textops {
  /** tokens_of(text): lowercase alnum tokens — `Lower` stays a Catalyst
    * child so case mapping is Spark's own. */
  def tokens_of(text: Column): Column =
    Bridge.column(TokensExpr(Bridge.expression(lower(text))))

  /** shingles_of(text, k): distinct word k-grams of the lowered text. */
  def shingles_of(text: Column, k: Int): Column =
    Bridge.column(ShinglesExpr(Bridge.expression(lower(text)), k))

  /** gram_hashes(tokens, k): 60-bit md5 per positional k-gram. */
  def gram_hashes(tokens: Column, k: Int): Column =
    Bridge.column(GramHashes(Bridge.expression(tokens), k))

  /** shingle_hashes(text, k): 60-bit md5 per distinct word k-gram. */
  def shingle_hashes(text: Column, k: Int): Column =
    Bridge.column(ShingleHashes(Bridge.expression(lower(text)), k))

  /** top_run_count(tokens): Gopher most-frequent-word count. */
  def top_run_count(tokens: Column): Column =
    Bridge.column(TopRunCount(Bridge.expression(tokens)))

  /** two_gram_counts(tokens): struct(n2, ndup) of the word 2-gram list. */
  def two_gram_counts(tokens: Column): Column =
    Bridge.column(TwoGramCounts(Bridge.expression(tokens)))

  /** classifier_score(tokens, nBuckets): struct(n_tokens, score_int) of
    * the hashed linear classifier. The cap keeps bucket * 2654435761
    * within Long exactly, so native % == the HOF's pmod on every path. */
  def classifier_score(tokens: Column, nBuckets: Long): Column = {
    require(nBuckets > 0 && nBuckets <= Long.MaxValue / 2654435761L,
      s"nBuckets must be in (0, 2^31.7]: $nBuckets")
    Bridge.column(ClassifierScore(Bridge.expression(tokens), nBuckets))
  }
}
