package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native Catalyst expression for the hot loop of similarity search.
  *
  * `zip_with(a, b, (x,y) -> x*y)` + `aggregate(...)` is evaluated
  * interpreted (higher-order functions have no codegen), allocating an
  * intermediate array per row — at millions of candidate pairs that is
  * the bottleneck (measured 150 s for 2M pairs at sf0.1). This
  * expression generates a tight primitive `long` loop inside whole-stage
  * codegen: no allocation, no virtual calls, vectorizable by the JIT.
  *
  * Overflow contract: inputs are fixed-point embeddings (|x| <= 2^20,
  * dim <= 2^12), so |dot| < 2^52 — exact in long AND double.
  */
case class DotProductLong(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_dot_long"

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<bigint>, array<bigint>), " +
        s"got (${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0L
    var i = 0
    while (i < n) { acc += x.getLong(i) * y.getLong(i); i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |final int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $a.getLong($i) * $b.getLong($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProductLong =
    copy(left = newLeft, right = newRight)
}

/** All k universal-hash minima of a pre-hashed shingle array in ONE
  * array pass: `result[j] = min over x of (a_j*x + b_j) mod M` with the
  * [[graft.functions.StableHash]] family (a_j = 2j+1, b_j = j*j+7,
  * M = 4294967291).
  *
  * Replaces k interpreted `array_min(transform(...))` passes with a
  * single codegen'd primitive nested loop — the minhash signature
  * becomes pure whole-stage-codegen arithmetic. Null/empty input ->
  * null (matching array_min-over-empty semantics).
  */
case class MinhashSignature(child: Expression, k: Int)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  private val Mod = graft.functions.StableHash.Mod

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  // empty input arrays yield null regardless of child nullability —
  // without this, a non-nullable child constant-folds ev.isNull to
  // `false` and the codegen assignment below fails to compile
  override def nullable: Boolean = true
  override def prettyName: String = "graft_minhash"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) if k > 0 => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<bigint>) and k > 0")
  }

  private def minsOf(xs: ArrayData): Any = {
    val n = xs.numElements()
    if (n == 0) return null
    val mins = Array.fill(k)(Long.MaxValue)
    var i = 0
    while (i < n) {
      val x = xs.getLong(i)
      var j = 0
      while (j < k) {
        val h = ((2L * j + 1L) * x + (1L * j * j + 7L)) % Mod
        if (h < mins(j)) mins(j) = h
        j += 1
      }
      i += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(mins)
  }

  override def nullSafeEval(input: Any): Any =
    minsOf(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, xs => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val x = ctx.freshName("x")
      val h = ctx.freshName("h")
      val mins = ctx.freshName("mins")
      s"""
         |final int $n = $xs.numElements();
         |if ($n == 0) { ${ev.isNull} = true; } else {
         |  final long[] $mins = new long[$k];
         |  java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |  for (int $i = 0; $i < $n; $i++) {
         |    final long $x = $xs.getLong($i);
         |    for (int $j = 0; $j < $k; $j++) {
         |      final long $h = ((2L*$j+1L) * $x + (1L*$j*$j+7L)) % ${Mod}L;
         |      if ($h < $mins[$j]) $mins[$j] = $h;
         |    }
         |  }
         |  ${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($mins);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MinhashSignature =
    copy(child = newChild)
}

/** Nearest-centroid assignment in ONE expression: argmin over k of the
  * exact integer squared L2 distance |v - c_k|^2, ties to the lowest
  * index. The centroid matrix travels as a single array<array<long>>
  * literal (one reference object), so the per-iteration Lloyd plans
  * stay tiny — the least(struct(dist_k, k)...) formulation it replaces
  * built a 16-branch expression forest that Catalyst re-analyzed on
  * every iteration.
  *
  * Overflow: |v_j - c_j| < 2^21, squared < 2^42, x dim(<=2^12) < 2^54 —
  * exact in long.
  */
case class NearestCentroid(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def prettyName: String = "graft_nearest_centroid"

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(LongType, _), ArrayType(ArrayType(LongType, _), _)) =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<bigint>, array<array<bigint>>)")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    val cents = b.asInstanceOf[ArrayData]
    var best = 0
    var bestD = Long.MaxValue
    var k = 0
    val n = cents.numElements()
    while (k < n) {
      val c = cents.getArray(k)
      val dim = math.min(v.numElements(), c.numElements())
      var d = 0L
      var j = 0
      while (j < dim) {
        val diff = v.getLong(j) - c.getLong(j)
        d += diff * diff
        j += 1
      }
      if (d < bestD) { bestD = d; best = k }
      k += 1
    }
    best
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, cents) => {
      val k = ctx.freshName("k")
      val j = ctx.freshName("j")
      val n = ctx.freshName("n")
      val dim = ctx.freshName("dim")
      val c = ctx.freshName("c")
      val d = ctx.freshName("d")
      val diff = ctx.freshName("diff")
      val best = ctx.freshName("best")
      val bestD = ctx.freshName("bestD")
      s"""
         |int $best = 0;
         |long $bestD = Long.MAX_VALUE;
         |final int $n = $cents.numElements();
         |for (int $k = 0; $k < $n; $k++) {
         |  final org.apache.spark.sql.catalyst.util.ArrayData $c = $cents.getArray($k);
         |  final int $dim = java.lang.Math.min($v.numElements(), $c.numElements());
         |  long $d = 0L;
         |  for (int $j = 0; $j < $dim; $j++) {
         |    final long $diff = $v.getLong($j) - $c.getLong($j);
         |    $d += $diff * $diff;
         |  }
         |  if ($d < $bestD) { $bestD = $d; $best = $k; }
         |}
         |${ev.value} = $best;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): NearestCentroid =
    copy(left = newLeft, right = newRight)
}

/** Runtime registration of graft's native expressions on an existing
  * session (the driver builds the SparkSession, so we register on
  * `sessionState.functionRegistry` rather than via
  * SparkSessionExtensions; both paths end in the same registry).
  * Idempotent — re-registration replaces the same entry. */
object GraftFunctions {
  val DotLongName = "graft_dot_long"
  val MinhashName = "graft_minhash"
  val ShingleHashName = "graft_shingle_hash32"
  val WordShinglesName = "graft_word_shingles"
  val Simhash32Name = "graft_simhash32"
  val WordJaccardName = "graft_word_jaccard"
  val NearestCentroidName = "graft_nearest_centroid"
  val DupStatsName = "graft_dup_stats"
  val NfcName = "graft_nfc"
  val WordpieceName = "graft_wordpiece"

  private def intArg(e: Expression): Int = e.eval().asInstanceOf[Int]

  /** All graft native expressions: (name, info, builder) — the single
    * source for both registration paths (runtime registry and
    * SparkSessionExtensions). */
  val builders: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] =
    Seq(
      (DotLongName,
        new ExpressionInfo(classOf[DotProductLong].getName, DotLongName),
        (e: Seq[Expression]) => DotProductLong(e.head, e(1))),
      (MinhashName,
        new ExpressionInfo(classOf[MinhashSignature].getName, MinhashName),
        (e: Seq[Expression]) => MinhashSignature(e.head, intArg(e(1)))),
      (ShingleHashName,
        new ExpressionInfo(classOf[ShingleHash32].getName, ShingleHashName),
        (e: Seq[Expression]) => ShingleHash32(e.head, intArg(e(1)))),
      (WordShinglesName,
        new ExpressionInfo(classOf[WordShingleArray].getName, WordShinglesName),
        (e: Seq[Expression]) => WordShingleArray(e.head, intArg(e(1)))),
      (Simhash32Name,
        new ExpressionInfo(classOf[Simhash32].getName, Simhash32Name),
        (e: Seq[Expression]) => Simhash32(e.head)),
      (WordJaccardName,
        new ExpressionInfo(classOf[WordJaccard].getName, WordJaccardName),
        (e: Seq[Expression]) => WordJaccard(e.head, e(1), intArg(e(2)))),
      (NearestCentroidName,
        new ExpressionInfo(classOf[NearestCentroid].getName, NearestCentroidName),
        (e: Seq[Expression]) => NearestCentroid(e.head, e(1))),
      (DupStatsName,
        new ExpressionInfo(classOf[DupStats].getName, DupStatsName),
        (e: Seq[Expression]) => DupStats(e.head)),
      (NfcName,
        new ExpressionInfo(classOf[NfcNormalize].getName, NfcName),
        (e: Seq[Expression]) => NfcNormalize(e.head)),
      (WordpieceName,
        new ExpressionInfo(classOf[WordpieceEncode].getName, WordpieceName),
        (e: Seq[Expression]) => WordpieceEncode(e.head)))

  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    builders.foreach { case (name, info, builder) =>
      val id = FunctionIdentifier(name)
      if (!registry.functionExists(id)) {
        registry.registerFunction(id, info, builder)
      }
    }
  }
}
