package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode, Window}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.plans.physical.{AllTuples, ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.types.IntegerType

/** Whole-operator Catalyst extension (SURVEY §7.5 route (c), the full
  * stack: logical node → optimizer rule → strategy → physical plan):
  * per-key top-k via bounded heaps.
  *
  * Spark plans `row_number() OVER (PARTITION BY g ORDER BY o) <= k` as
  * a full sort of every key group (WindowExec sorts the whole partition
  * on (g, o)), even though only k rows per key survive the filter. The
  * same asymmetry Spark already fixes globally with
  * TakeOrderedAndProject applies per key: a bounded heap per group
  * needs O(keys·k) memory and no sort of the discarded rows. At 100 TB
  * "top 3 orders per customer" touches billions of rows per key group;
  * sorting them to keep 3 is the single largest avoidable cost of the
  * pattern.
  *
  * [[TopKPerKeyRule]] rewrites `Filter(rn <= k, Window(exprs, ...))`
  * where the filtered `rn` is a `row_number()` — or a `rank()`, the
  * WITH-TIES idiom that also keeps every row tied at the boundary —
  * and every other window expression over the same (partition, order)
  * spec is a ranking companion (`row_number()`, `rank()`,
  * `dense_rank()`) into the logical [[TopKPerKey]];
  * [[TopKPerKeyStrategy]] plans it as [[TopKPerKeyExec]]. The
  * companions are sound to compute from the kept rows alone: in both
  * flavors the kept set is a downward-closed prefix of the per-key
  * order (for `rank <= k`, complete tie-groups), so every row strictly
  * earlier in the order than a kept row is also kept, and a kept row's
  * row_number/rank/dense_rank depends only on kept rows. Window
  * functions that need the full frame (sum, lag, ntile, …) block the
  * rewrite, as does a `dense_rank <= k` bound. Results are identical
  * to the window formulation whenever the per-key order is total (the
  * determinism contract every query here follows anyway); with ties,
  * the row_number flavor is nondeterministic in both formulations
  * while the rank flavor is deterministic by construction (ties are
  * kept together).
  *
  * Memory safety: heap-tracked distinct keys per task are capped at
  * `spark.graft.topk.maxKeysPerTask` (default 131072); rows of keys
  * beyond the cap spill to local disk and resolve in follow-up passes,
  * so unbounded key cardinality costs extra passes, never an OOM —
  * which is why [[GraftExtensions]] installs the stack by default.
  * Per-session enablement without extensions:
  * `spark.experimental.extraOptimizations :+= TopKPerKeyRule` and
  * `spark.experimental.extraStrategies :+= TopKPerKeyStrategy`.
  */
/** Ranking companions the bounded-heap exec can emit alongside the
  * filtered row_number (all computable from the kept rows alone). */
sealed trait RankingKind extends Serializable
object RankingKind {
  case object RowNum extends RankingKind
  case object Rnk extends RankingKind
  case object DenseRnk extends RankingKind
}

case class TopKPerKey(
    groupExprs: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    winAttrs: Seq[(Attribute, RankingKind)],
    withTies: Boolean,
    child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output ++ winAttrs.map(_._1)
  // the ranking attrs are born here, not consumed from below — required
  // for the analyzer/optimizer missing-attribute integrity checks
  override def producedAttributes: AttributeSet = AttributeSet(winAttrs.map(_._1))
  override protected def withNewChildInternal(newChild: LogicalPlan): LogicalPlan =
    copy(child = newChild)
}

object TopKPerKeyRule extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = if (!conf.getConfString(
      TopKPerKeyExec.enabledConfKey, "true").toBoolean) plan else plan.transform {
    case f @ org.apache.spark.sql.catalyst.plans.logical.Filter(cond,
        Window(winExprs, parts, order, child, _)) if winExprs.nonEmpty =>
      // every window expression must be a ranking function over the SAME
      // (partition, order) spec — anything needing the full frame
      // (sum, lag, ntile, percent_rank, …) blocks the rewrite
      val classified: Option[Seq[(Alias, RankingKind)]] =
        winExprs.foldLeft(Option(Vector.empty[(Alias, RankingKind)])) {
          case (Some(acc), alias @ Alias(WindowExpression(fn, spec), _))
              if spec.partitionSpec == parts && spec.orderSpec == order =>
            fn match {
              case RowNumber()  => Some(acc :+ (alias -> RankingKind.RowNum))
              case _: Rank      => Some(acc :+ (alias -> RankingKind.Rnk))
              case _: DenseRank => Some(acc :+ (alias -> RankingKind.DenseRnk))
              case _ => None
            }
          case _ => None
        }
      // the filter may bound either companion: a row_number bound keeps
      // exactly k rows per key; a rank bound (`rank <= k`) additionally
      // keeps ALL ties at the boundary — the with-ties exec variant
      def kindOf(a: AttributeReference): Option[RankingKind] =
        classified.flatMap(_.collectFirst {
          case (alias, kind @ (RankingKind.RowNum | RankingKind.Rnk))
              if alias.exprId == a.exprId => kind
        })
      val kOpt: Option[(Int, Boolean)] = cond match {
        case LessThanOrEqual(a: AttributeReference, Literal(k: Int, IntegerType)) =>
          kindOf(a).map(kind => (k, kind == RankingKind.Rnk))
        case LessThan(a: AttributeReference, Literal(k: Int, IntegerType))
            // k - 1 must not wrap: rn < Int.MinValue is always-false and
            // must stay with the window formulation, not become MaxValue
            if k != Int.MinValue =>
          kindOf(a).map(kind => (k - 1, kind == RankingKind.Rnk))
        case _ => None
      }
      (kOpt, classified) match {
        case (Some((k, withTies)), Some(kinds)) if k > 0 =>
          // Spark's InsertWindowGroupLimit (3.5+) has usually placed a
          // WindowGroupLimit below the Window by the time this rule
          // runs. It pre-limits groups but forces a SORT on each side
          // of the exchange; the bounded-heap exec needs only the hash
          // exchange, so strip a matching group limit and skip both
          // sorts entirely. A RowNumber-mode limit keeps exactly
          // `limit` rows per key (would drop boundary ties), so only a
          // Rank-mode limit is strippable for the with-ties variant.
          val input = child match {
            case org.apache.spark.sql.catalyst.plans.logical.WindowGroupLimit(
                p2, o2, RowNumber(), limit, grandchild)
                if !withTies && p2 == parts && o2 == order && limit >= k => grandchild
            case org.apache.spark.sql.catalyst.plans.logical.WindowGroupLimit(
                p2, o2, _: Rank, limit, grandchild)
                if withTies && p2 == parts && o2 == order && limit >= k => grandchild
            case other => other
          }
          TopKPerKey(parts, order, k,
            kinds.map { case (alias, kind) => alias.toAttribute -> kind }, withTies, input)
        case _ => f
      }
  }
}

object TopKPerKeyStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKey(parts, order, k, winAttrs, withTies, child) =>
      TopKPerKeyExec(parts, order, k, winAttrs, withTies, planLater(child)) :: Nil
    case _ => Nil
  }
}

case class TopKPerKeyExec(
    groupExprs: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    winAttrs: Seq[(Attribute, RankingKind)],
    withTies: Boolean,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output ++ winAttrs.map(_._1)
  // the ranking attrs are constructor fields, so they land in this
  // node's `references`; declaring them produced keeps missingInput empty
  override def producedAttributes: AttributeSet = AttributeSet(winAttrs.map(_._1))
  override def outputPartitioning: Partitioning = child.outputPartitioning

  // every row of a key must land in one task (the shuffle this demands
  // is the same one WindowExec demands — no extra exchange)
  override def requiredChildDistribution: Seq[Distribution] =
    if (groupExprs.isEmpty) AllTuples :: Nil
    else ClusteredDistribution(groupExprs) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val kLocal = k
    val childOutput = child.output
    val groupExprsLocal = groupExprs
    val orderLocal = order
    val kinds: Array[RankingKind] = winAttrs.map(_._2).toArray
    // localized so the closure ships plain values, not `this` (capturing
    // the node's `output` method would serialize the whole plan subtree)
    val outputLocal = output
    // size guard: at most this many distinct keys are heap-tracked per
    // pass; rows of further keys spill to local disk and are resolved in
    // follow-up passes (every pass tracks up to `cap` NEW keys, so the
    // recursion terminates). Memory is O(cap · k · rowSize) instead of
    // O(distinctKeys · k · rowSize) — the unbounded-cardinality OOM the
    // pre-guard operator had. Overflow fans out across `spillFanOut`
    // bucket files by key hash, so a heavy spill costs O(log_F(D/cap))
    // rewrites per row instead of the O(D/cap) a single sequential
    // spill chain would (the same recursive-partitioning trade Spark's
    // own hash aggregate makes when it falls back to sort-based spill).
    val maxKeys = math.max(1,
      conf.getConfString(TopKPerKeyExec.maxKeysConfKey, "131072").toInt)
    val withTiesLocal = withTies
    child.execute().mapPartitions ({ iter =>
      val groupProj = UnsafeProjection.create(groupExprsLocal, childOutput)
      val ordering = GenerateOrdering.generate(orderLocal, childOutput)
      // per key: a worst-first heap of at most k rows — no sort of
      // evicted rows
      val worstFirst = ordering.reverse.asInstanceOf[java.util.Comparator[InternalRow]]
      val ascending = ordering.asInstanceOf[java.util.Comparator[InternalRow]]
      val toUnsafe = UnsafeProjection.create(childOutput, childOutput)
      val outProj = UnsafeProjection.create(outputLocal, outputLocal)
      val nFields = childOutput.length

      // per-key kept-set container; one impl per rewrite flavor
      abstract class Keeper {
        def insert(row: InternalRow): Unit
        def sortedRows(): Array[InternalRow] // ascending in `order`
      }
      // row_number <= k: exactly k rows — worst-first bounded heap
      final class HeapKeeper extends Keeper {
        // initial capacity stays small — PriorityQueue grows on demand,
        // and an eager k+1 array per key would explode for a large
        // (effectively no-op) k
        private val q =
          new java.util.PriorityQueue[InternalRow](math.min(kLocal, 16) + 1, worstFirst)
        override def insert(row: InternalRow): Unit =
          if (q.size() < kLocal) q.add(row.copy())
          else if (ordering.compare(row, q.peek()) < 0) { q.poll(); q.add(row.copy()) }
        override def sortedRows(): Array[InternalRow] = {
          val rows = q.toArray(new Array[InternalRow](q.size()))
          java.util.Arrays.sort(rows, ascending)
          rows
        }
      }
      // rank() <= k: k rows PLUS all ties at the boundary. Kept rows are
      // complete tie-groups forming a downward-closed prefix of the
      // order, and group ranks are distinct values ≤ k, so at most k
      // groups are live (+1 transiently before eviction). Keyed by the
      // order value itself: rows comparing 0 collapse into one group.
      // Memory is O(k + boundaryTies) per key — a pathological key where
      // ALL rows tie holds them all, the price of `<= k WITH TIES`
      // semantics in any engine that must emit the full boundary group.
      final class TiesKeeper extends Keeper {
        private val groups =
          new java.util.TreeMap[InternalRow, scala.collection.mutable.ArrayBuffer[InternalRow]](ascending)
        private var total = 0
        override def insert(row: InternalRow): Unit = {
          // full and strictly worse than the worst kept group: every kept
          // row is strictly better, so rank ≥ total+1 > k — reject
          if (total >= kLocal && ordering.compare(row, groups.lastKey()) > 0) return
          val cp = row.copy()
          val existing = groups.get(cp)
          if (existing != null) existing += cp
          else groups.put(cp, scala.collection.mutable.ArrayBuffer(cp))
          total += 1
          // evict whole boundary groups whose rank slipped past k
          // (rank of the last group = total - lastSize + 1)
          var last = groups.lastEntry()
          while (total - last.getValue.size >= kLocal) {
            total -= last.getValue.size
            groups.remove(last.getKey)
            last = groups.lastEntry()
          }
        }
        override def sortedRows(): Array[InternalRow] = {
          val out = new Array[InternalRow](total)
          var i = 0
          val it = groups.values().iterator()
          while (it.hasNext) {
            val g = it.next()
            var j = 0
            while (j < g.length) { out(i) = g(j); i += 1; j += 1 }
          }
          out
        }
      }
      def newKeeper(): Keeper = if (withTiesLocal) new TiesKeeper else new HeapKeeper

      // level-salted bucket: a bucket's keys all share hash%fanOut, so
      // the NEXT level must re-mix the hash or the bucket would never
      // split again (degrading back to one-cap-of-keys-per-pass)
      def bucketOf(hash: Int, level: Int): Int = {
        var h = hash ^ (level * 0x9E3779B9)
        h ^= h >>> 16; h *= 0x85EBCA6B; h ^= h >>> 13
        (h & 0x7fffffff) % TopKPerKeyExec.spillFanOut
      }

      def topkPass(input: Iterator[InternalRow], level: Int): Iterator[InternalRow] = {
        val heaps = new java.util.LinkedHashMap[UnsafeRow, Keeper]()
        // overflow fans out across bucket files by key hash; each bucket
        // resolves independently, so recursion depth is logarithmic in
        // distinct-keys/cap. All rows of one key share a bucket (hash is
        // deterministic); a tracked key never spills (heap check first).
        val fanOut = TopKPerKeyExec.spillFanOut
        val spillFiles = new Array[java.io.File](fanOut)
        val outs = new Array[java.io.DataOutputStream](fanOut)
        var spilled = false
        val writeBuf = new Array[Byte](4096)
        while (input.hasNext) {
          val row = input.next()
          val key = groupProj(row)
          var q = heaps.get(key)
          if (q == null && heaps.size() >= maxKeys) {
            // over budget: defer every row of this untracked key to a
            // follow-up pass (length-prefixed UnsafeRow bytes on local
            // disk, bucketed by key hash)
            val b = bucketOf(key.hashCode(), level)
            if (outs(b) == null) {
              val f = TopKPerKeyExec.newSpillFile()
              spillFiles(b) = f
              spilled = true
              val ctx = org.apache.spark.TaskContext.get()
              if (ctx != null) ctx.addTaskCompletionListener[Unit](_ => f.delete())
              else f.deleteOnExit()
              outs(b) = new java.io.DataOutputStream(new java.io.BufferedOutputStream(
                new java.io.FileOutputStream(f), 1 << 16))
            }
            val out = outs(b)
            val u = row match {
              case u: UnsafeRow => u
              case r => toUnsafe(r)
            }
            out.writeInt(u.getSizeInBytes)
            u.writeToStream(out, writeBuf)
          } else {
            if (q == null) {
              q = newKeeper()
              heaps.put(key.copy(), q)
            }
            q.insert(row)
          }
        }
        outs.foreach(o => if (o != null) o.close())
        val winRow = new GenericInternalRow(kinds.length)
        val joined = new JoinedRow
        import scala.jdk.CollectionConverters._
        val heapRows = heaps.values().iterator().asScala.flatMap { q =>
          val rows = q.sortedRows()
          // rank/dense_rank of a kept row depend only on kept rows:
          // anything strictly earlier in the order has a smaller
          // row_number, hence is also in the heap — walk adjacent pairs
          var rnk = 0
          var dense = 0
          rows.iterator.zipWithIndex.map { case (r, i) =>
            val tied = i > 0 && ordering.compare(rows(i - 1), r) == 0
            if (!tied) { rnk = i + 1; dense += 1 }
            var c = 0
            while (c < kinds.length) {
              winRow.update(c, kinds(c) match {
                case RankingKind.RowNum   => i + 1
                case RankingKind.Rnk      => rnk
                case RankingKind.DenseRnk => dense
              })
              c += 1
            }
            outProj(joined(r, winRow))
          }
        }
        if (!spilled) heapRows
        // ++/flatMap take operands by name: each bucket is re-read (and
        // its pass's heaps built) only after the preceding rows drain,
        // so at most one pass's heaps are live at a time
        else heapRows ++ spillFiles.iterator.filter(_ != null).flatMap(f =>
          topkPass(TopKPerKeyExec.readSpill(f, nFields), level + 1))
      }

      topkPass(iter, 0)
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): SparkPlan =
    copy(child = newChild)
}

object TopKPerKeyExec {
  /** Per-task cap on heap-tracked distinct keys before rows spill to a
    * local follow-up pass. Default 131072: at k=3 and ~100-byte rows
    * that pins ~40 MB per task, well inside executor memory at 32
    * tasks/executor; raise it when keys-per-partition is known-small. */
  val maxKeysConfKey = "spark.graft.topk.maxKeysPerTask"

  /** Session kill switch for the rewrite (`spark.graft.topk.enabled`,
    * default true): lets a user fall back to Spark's window plan
    * without rebuilding the session, and lets specs compute
    * window-formulation baselines in an extensions-installed session. */
  val enabledConfKey = "spark.graft.topk.enabled"

  /** Spill fan-out: overflow buckets per pass. 16 keeps open-stream
    * buffer memory ~1 MB per spilling task while giving log₁₆ recursion
    * depth (two levels already cover 131072 · 16² ≈ 33 M distinct keys
    * per task). */
  val spillFanOut = 16

  /** Spill file on Spark's configured local dirs (`spark.local.dir`),
    * task-scoped via the executor's DiskBlockManager — on a cluster,
    * `java.io.tmpdir` is often a small root partition, and a spill
    * there is invisible to Spark's local-dir cleanup. Falls back to a
    * plain temp file only when no SparkEnv exists (bare unit tests). */
  private[plans] def newSpillFile(): java.io.File = {
    val env = org.apache.spark.SparkEnv.get
    if (env != null) env.blockManager.diskBlockManager.createTempLocalBlock()._2
    else java.io.File.createTempFile("graft-topk-spill-", ".bin")
  }

  /** Read back a spill file of length-prefixed UnsafeRow images. The
    * iterator owns the stream and closes it at EOF; each row gets its
    * own byte array (heap inserts above copy again only via row.copy(),
    * which for UnsafeRow is a buffer copy — safe). */
  private[plans] def readSpill(file: java.io.File, nFields: Int): Iterator[InternalRow] =
    new Iterator[InternalRow] {
      private val in = new java.io.DataInputStream(new java.io.BufferedInputStream(
        new java.io.FileInputStream(file), 1 << 18))
      private var nextRow: UnsafeRow = advance()
      private def advance(): UnsafeRow = {
        val lenOrEof = try in.readInt() catch {
          case _: java.io.EOFException => -1
        }
        if (lenOrEof < 0) { in.close(); file.delete(); null }
        else {
          val bytes = new Array[Byte](lenOrEof)
          in.readFully(bytes)
          val r = new UnsafeRow(nFields)
          r.pointTo(bytes, lenOrEof)
          r
        }
      }
      override def hasNext: Boolean = nextRow != null
      override def next(): InternalRow = {
        val r = nextRow; nextRow = advance(); r
      }
    }
}
