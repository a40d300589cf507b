package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Whole-operator extension demo (SURVEY §4 preference (c)): the
  * as-of join as a first-class Catalyst operator — a custom
  * LogicalPlan node, a SparkStrategy, and a physical merge operator —
  * instead of composing built-ins (the union+window trick in
  * Relational.qAsOf, kept side by side for comparison).
  *
  * Each left row picks the most recent right row of the same key with
  * rightTime <= leftTime (left-outer: nulls when none). With a
  * `tolerance` bound (the capability the union+window shape CANNOT
  * express — `last(...) over (...)` has no per-row recency
  * condition), a match additionally requires
  * leftTime - rightTime <= tolerance: an order older than the bound
  * yields nulls exactly as no order at all would.
  *
  * The physical plan asks Catalyst for hash co-partitioning on the
  * keys and (key, time) sort within partitions — EnsureRequirements
  * inserts exactly the one shuffle+sort per side a 100 TB run needs —
  * then a single forward merge pass joins each partition with O(1)
  * state (the last matching right row), never materializing a range
  * product. Keys and times must be long-backed (integral / timestamp
  * — validated at analysis time); null keys/times never match.
  */
case class AsOfJoinPlan(left: LogicalPlan, right: LogicalPlan,
    leftKey: Expression, rightKey: Expression,
    leftTime: Expression, rightTime: Expression,
    tolerance: Option[Long] = None) extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  /** The merge loop reads keys and times as raw longs; any other
    * internal representation (DateType is Int, Decimal is its own
    * class, String is UTF8String) would ClassCastException on an
    * executor mid-job. Fail ANALYSIS instead, like the expression
    * tier's ExpectsInputTypes. */
  private def longBacked(dt: org.apache.spark.sql.types.DataType): Boolean = dt match {
    case org.apache.spark.sql.types.LongType => true
    case org.apache.spark.sql.types.TimestampType => true
    case org.apache.spark.sql.types.TimestampNTZType => true
    case _ => false
  }
  override lazy val resolved: Boolean = {
    val ok = expressions.forall(_.resolved) && childrenResolved
    if (ok) {
      Seq("leftKey" -> leftKey, "rightKey" -> rightKey,
          "leftTime" -> leftTime, "rightTime" -> rightTime).foreach { case (role, e) =>
        if (!longBacked(e.dataType))
          throw new org.apache.spark.sql.AnalysisException(
            errorClass = "_LEGACY_ERROR_TEMP_1332",
            messageParameters = Map("errorMessage" ->
              (s"as-of join $role must be long-backed " +
                s"(LongType/TimestampType), got ${e.dataType.catalogString}")))
      }
    }
    ok
  }

  override protected def withNewChildrenInternal(
      l: LogicalPlan, r: LogicalPlan): LogicalPlan = copy(left = l, right = r)
}

/** Plans AsOfJoinPlan into the physical merge operator. Registered
  * either via SparkSessionExtensions (GraftExtensions) or
  * spark.experimental.extraStrategies. */
object AsOfStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lt, rt, tol) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt, tol) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(left: SparkPlan, right: SparkPlan,
    leftKey: Expression, rightKey: Expression,
    leftTime: Expression, rightTime: Expression,
    tolerance: Option[Long] = None)
  extends BinaryExecNode
  with org.apache.spark.sql.execution.CodegenSupport {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) :: ClusteredDistribution(Seq(rightKey)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  // ---- whole-stage codegen (the SortMergeJoin two-iterator shape) ----
  //
  // The merge loop participates in whole-stage codegen: WSCG zips the
  // two sorted shuffles (inputRDDs of size 2, the SMJ convention) and
  // this node's doProduce emits the forward-merge loop inline, so the
  // per-row path — key/time reads, right-side advance, null-guarded
  // output vars — compiles into the same generated class as the
  // parent operators instead of crossing two iterator boundaries per
  // row. State (one-row lookahead + retained match) lives in mutable
  // class members; the retained match copies into ONE reused buffer.

  override def inputRDDs(): Seq[RDD[InternalRow]] =
    left.execute() :: right.execute() :: Nil

  // non-primitive output vars (strings, decimals) can point into the
  // reused match buffer, which the next copyFrom overwrites — rows a
  // parent materializes must be copied (the SortMergeJoin convention)
  override def needCopyResult: Boolean = true

  override protected def doProduce(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext): String = {
    import org.apache.spark.sql.catalyst.expressions.codegen.{CodeGenerator, ExprCode, JavaCode}
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val unsafeRowCls = "org.apache.spark.sql.catalyst.expressions.UnsafeRow"
    val leftInput = ctx.addMutableState("scala.collection.Iterator", "asofLeftInput",
      v => s"$v = inputs[0];", forceInline = true)
    val rightInput = ctx.addMutableState("scala.collection.Iterator", "asofRightInput",
      v => s"$v = inputs[1];", forceInline = true)
    val rHeadValid = ctx.addMutableState(CodeGenerator.JAVA_BOOLEAN, "asofRHeadValid")
    val rHeadKey = ctx.addMutableState(CodeGenerator.JAVA_LONG, "asofRHeadKey")
    val rHeadTime = ctx.addMutableState(CodeGenerator.JAVA_LONG, "asofRHeadTime")
    val rHeadRow = ctx.addMutableState("InternalRow", "asofRHeadRow")
    val rInit = ctx.addMutableState(CodeGenerator.JAVA_BOOLEAN, "asofRInit")
    val hasMatch = ctx.addMutableState(CodeGenerator.JAVA_BOOLEAN, "asofHasMatch")
    val matchKey = ctx.addMutableState(CodeGenerator.JAVA_LONG, "asofMatchKey")
    val matchTime = ctx.addMutableState(CodeGenerator.JAVA_LONG, "asofMatchTime")
    val matchRow = ctx.addMutableState(unsafeRowCls, "asofMatchRow",
      v => s"$v = new $unsafeRowCls(${right.output.length}); " +
        s"$v.pointTo(new byte[0], 0);")
    // right-head key/time evaluation (codegen'd bound references)
    val rRow = ctx.freshName("asofRightRow")
    ctx.INPUT_ROW = rRow
    ctx.currentVars = null
    val rk = BindReferences.bindReference(rightKey, right.output).genCode(ctx)
    val rt = BindReferences.bindReference(rightTime, right.output).genCode(ctx)
    val advanceRight = ctx.addNewFunction("asofAdvanceRight",
      s"""
         |private void asofAdvanceRight() {
         |  $rHeadValid = false;
         |  while (!$rHeadValid && $rightInput.hasNext()) {
         |    InternalRow $rRow = (InternalRow) $rightInput.next();
         |    ${rk.code}
         |    ${rt.code}
         |    if (!(${rk.isNull}) && !(${rt.isNull})) {
         |      $rHeadValid = true;
         |      $rHeadKey = ${rk.value};
         |      $rHeadTime = ${rt.value};
         |      $rHeadRow = $rRow;
         |    }
         |  }
         |}
       """.stripMargin)
    // left row: key/time + output vars
    val lRow = ctx.freshName("asofLeftRow")
    ctx.INPUT_ROW = lRow
    ctx.currentVars = null
    val lk = BindReferences.bindReference(leftKey, left.output).genCode(ctx)
    val lt = BindReferences.bindReference(leftTime, left.output).genCode(ctx)
    val leftVars = left.output.zipWithIndex.map { case (a, i) =>
      BoundReference(i, a.dataType, a.nullable).genCode(ctx)
    }
    // right-half output vars read from the retained match buffer,
    // null when this left row has no in-tolerance match
    val matched = ctx.freshName("asofMatched")
    val rightVars = right.output.zipWithIndex.map { case (a, i) =>
      val isNull = ctx.freshName("asofIsNull")
      val value = ctx.freshName("asofValue")
      val jt = CodeGenerator.javaType(a.dataType)
      val getV = CodeGenerator.getValue(matchRow, a.dataType, i.toString)
      ExprCode(
        code"""
          |boolean $isNull = true;
          |$jt $value = ${CodeGenerator.defaultValue(a.dataType)};
          |if ($matched) {
          |  $isNull = $matchRow.isNullAt($i);
          |  if (!$isNull) { $value = $getV; }
          |}
        """.stripMargin,
        JavaCode.isNullVariable(isNull),
        JavaCode.variable(value, a.dataType))
    }
    val tolVal = tolerance.getOrElse(Long.MaxValue)
    s"""
       |if (!$rInit) { $rInit = true; $advanceRight(); }
       |while ($leftInput.hasNext()) {
       |  InternalRow $lRow = (InternalRow) $leftInput.next();
       |  ${lk.code}
       |  ${lt.code}
       |  boolean $matched = false;
       |  if (!(${lk.isNull}) && !(${lt.isNull})) {
       |    if ($hasMatch && $matchKey != ${lk.value}) $hasMatch = false;
       |    while ($rHeadValid && ($rHeadKey < ${lk.value} ||
       |        ($rHeadKey == ${lk.value} && $rHeadTime <= ${lt.value}))) {
       |      if ($rHeadKey == ${lk.value}) {
       |        $matchRow.copyFrom(($unsafeRowCls) $rHeadRow);
       |        $hasMatch = true;
       |        $matchKey = ${lk.value};
       |        $matchTime = $rHeadTime;
       |      }
       |      $advanceRight();
       |    }
       |    $matched = $hasMatch && ${lt.value} - $matchTime <= ${tolVal}L;
       |  }
       |  ${consume(ctx, leftVars ++ rightVars)}
       |  if (shouldStop()) return;
       |}
     """.stripMargin
  }

  override protected def doExecute(): RDD[InternalRow] = {
    val leftSchema = org.apache.spark.sql.catalyst.types.DataTypeUtils.fromAttributes(left.output)
    val rightSchema = org.apache.spark.sql.catalyst.types.DataTypeUtils.fromAttributes(right.output)
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      // key/time extraction through code-generated unsafe projections
      // (getLong on a flat row) instead of boxed Expression.eval per
      // row — the merge loop's per-row cost is two primitive reads
      val lKeyTime = UnsafeProjection.create(Seq(leftKey, leftTime), left.output)
      val rKeyTime = UnsafeProjection.create(Seq(rightKey, rightTime), right.output)
      // output assembly is a code-generated BYTE concatenation of the
      // two UnsafeRows (the same joiner Spark's own join execs use) —
      // the previous JoinedRow + per-field UnsafeProjection rebuilt
      // every output row with one virtual field-read per column and
      // was ~3x the composed union+window plan's cost
      val joiner = org.apache.spark.sql.catalyst.expressions.codegen
        .GenerateUnsafeRowJoiner.create(leftSchema, rightSchema)
      // an all-null right half for unmatched lefts, as UnsafeRow bytes
      val nullRight = UnsafeProjection.create(
        right.output.map(a => Literal.create(null, a.dataType)), Nil)(InternalRow.empty).copy()
      // one-row lookahead over the sorted right side. Both inputs are
      // UnsafeRow: EnsureRequirements inserts SortExec for the
      // (key, time) required ordering on each side, and SortExec
      // always emits UnsafeRow.
      var rHead: UnsafeRow = null
      var rHeadKey = 0L
      var rHeadTime = 0L
      def advanceRight(): Unit = {
        rHead = null
        while (rHead == null && rIter.hasNext) {
          val r = rIter.next()
          val kt = rKeyTime(r)
          if (!kt.isNullAt(0) && !kt.isNullAt(1)) {  // null key/time never matches
            rHead = r.asInstanceOf[UnsafeRow]
            rHeadKey = kt.getLong(0)
            rHeadTime = kt.getLong(1)
          }
        }
      }
      advanceRight()
      val tol = tolerance.getOrElse(Long.MaxValue)
      // the retained match lives in ONE preallocated buffer
      // (copyFrom grows it in place) — rHead.copy() per consumed
      // right row allocated two arrays per match candidate, pure GC
      // churn on a dense right side
      val matchBuf = new UnsafeRow(right.output.length)
      // copyFrom requires a byte[]-backed row; it grows this seed
      // buffer once to the first row's size and reuses it after
      matchBuf.pointTo(new Array[Byte](0), 0)
      var hasMatch = false
      var lastMatchKey = 0L
      var lastMatchTime = 0L
      new Iterator[InternalRow] {
        override def hasNext: Boolean = lIter.hasNext
        override def next(): InternalRow = {
          val l = lIter.next().asInstanceOf[UnsafeRow]
          val kt = lKeyTime(l)
          if (kt.isNullAt(0) || kt.isNullAt(1)) {
            joiner.join(l, nullRight)
          } else {
            val lk = kt.getLong(0)
            val lt = kt.getLong(1)
            if (hasMatch && lastMatchKey != lk) hasMatch = false
            // consume right rows up to (key, time): the newest one
            // with the same key becomes the current match. Rows are
            // consumed at most once per partition — O(1) state, no
            // range product.
            while (rHead != null &&
              (rHeadKey < lk || (rHeadKey == lk && rHeadTime <= lt))) {
              if (rHeadKey == lk) {
                matchBuf.copyFrom(rHead)    // unsafe rows are reused by the iterator
                hasMatch = true
                lastMatchKey = lk
                lastMatchTime = rHeadTime
              }
              advanceRight()
            }
            // tolerance: the newest right row <= lt is the ONLY
            // candidate (any other is older still), so a recency
            // check on it decides the whole match — the state stays
            // O(1) with or without the bound
            val matched = hasMatch && lt - lastMatchTime <= tol
            joiner.join(l, if (matched) matchBuf else nullRight)
          }
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      l: SparkPlan, r: SparkPlan): SparkPlan = copy(left = l, right = r)
}
