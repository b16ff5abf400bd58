package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Vocabulary-scale BPE APPLY: segment one word under a learned merge
  * table in a SINGLE pass of one native expression, with plan depth
  * CONSTANT in the merge count.
  *
  * The merge table rides along as ONE reference object (a rank map
  * `(a,b) → rank`), not as expression structure — the replacement for
  * the historical formulation that chained one codegen'd string
  * `replace` per merge, whose expression tree was O(#merges) deep and
  * hit the JVM 64 KB method / constant-pool ceilings near real
  * 32k–100k vocabularies long before per-row cost mattered.
  *
  * Semantics: the classic greedy BPE apply (Sennrich et al. ACL'16) —
  * start from single-character (code point) segments and repeatedly
  * merge the LEFTMOST occurrence of the present adjacent pair with the
  * LOWEST rank until no adjacent pair is in the table. For a merge
  * table produced by BPE TRAINING this is provably identical to
  * replaying the merges in rank order with leftmost-non-overlapping
  * replaces (the training semantics): training only ever learns a pair
  * over tokens already formed by LOWER-ranked merges, so after all
  * merges of rank < r are exhausted, applying merge r can only create
  * pairs of rank > r — rank order and greedy-lowest-rank coincide.
  * (The batched trainer preserves this: its within-round independence
  * rule rejects any candidate that contains a token merged earlier in
  * the same round, so no merge ever references a same-or-higher-rank
  * token.) BpeSpec property-tests the equivalence against the replay
  * chain on trained tables.
  *
  * Cost: O(len²) rank-map probes per DISTINCT word (the operator runs
  * on the vocabulary-scale word table, never the corpus), independent
  * of vocabulary size; the map is O(1) amortized per probe.
  */
/** Immutable merge-table holder shared by every copy of a
  * [[BpeSegment]] instance Catalyst makes during analysis and
  * optimization. A raw 32k-element Seq as a case-class field would
  * make every TreeNode hashCode/semanticEquals O(vocab) — measured as
  * tens of seconds of pure PLANNING time at 39k merges — so the
  * holder caches its hash, fast-paths equality on identity, and
  * builds the two-level rank lookup lazily once per deserialized
  * instance. */
final class MergeTable(val merges: Seq[(String, String)])
    extends Serializable {
  override lazy val hashCode: Int =
    scala.util.hashing.MurmurHash3.orderedHash(merges, 0x62706531)
  override def equals(o: Any): Boolean = o match {
    case m: MergeTable =>
      (m eq this) || (m.hashCode == hashCode && m.merges == merges)
    case _ => false
  }
  override def toString: String = s"${merges.size} merges"
  @transient lazy val ranks
      : java.util.HashMap[String, java.util.HashMap[String, Integer]] =
    BpeFns.rankMap(merges)
}

object BpeFns {
  /** Build the serializable rank map an expression instance carries:
    * left token -> (right token -> 1-based application rank). Two-level
    * so the per-probe lookup in [[segment]] allocates nothing (no
    * composite-key concatenation on the hot path). */
  def rankMap(merges: Seq[(String, String)])
      : java.util.HashMap[String, java.util.HashMap[String, Integer]] = {
    val m = new java.util.HashMap[String,
      java.util.HashMap[String, Integer]](merges.size * 2)
    var r = 0
    while (r < merges.size) {
      val (a, b) = merges(r)
      var inner = m.get(a)
      if (inner == null) {
        inner = new java.util.HashMap[String, Integer](4)
        m.put(a, inner)
      }
      // first (lowest) rank wins if a pair is ever duplicated
      inner.putIfAbsent(b, Integer.valueOf(r + 1))
      r += 1
    }
    m
  }

  def segment(word: UTF8String,
      ranks: java.util.HashMap[String, java.util.HashMap[String, Integer]])
      : GenericArrayData = {
    val s = word.toString
    // initial segmentation: one segment per code point (the training
    // table's substring(w, i, 1) splits by code point, not UTF-16 unit)
    var n = 0
    val segs = new Array[String](s.length)
    var i = 0
    while (i < s.length) {
      val cc = Character.charCount(s.codePointAt(i))
      segs(n) = s.substring(i, i + cc); n += 1
      i += cc
    }
    var done = n < 2
    while (!done) {
      var bestRank = Int.MaxValue
      var bestI = -1
      var j = 0
      while (j < n - 1) {
        val inner = ranks.get(segs(j))
        if (inner != null) {
          val r = inner.get(segs(j + 1))
          if (r != null && r.intValue() < bestRank) {
            bestRank = r.intValue(); bestI = j
          }
        }
        j += 1
      }
      if (bestI < 0) done = true
      else {
        segs(bestI) = segs(bestI) + segs(bestI + 1)
        // shift left over the absorbed slot
        var k = bestI + 1
        while (k < n - 1) { segs(k) = segs(k + 1); k += 1 }
        n -= 1
        if (n < 2) done = true
      }
    }
    val out = new Array[AnyRef](n)
    var o = 0
    while (o < n) { out(o) = UTF8String.fromString(segs(o)); o += 1 }
    new GenericArrayData(out)
  }
}

/** `bpe_segment(word) → array<string>` under a fixed merge table.
  *
  * The table is a constructor value, NOT child expressions: `eval` and
  * the generated code both consult one shared hash map (shipped via the
  * codegen references array / rebuilt lazily after deserialization), so
  * tree size, generated-method size, and constant-pool pressure are all
  * independent of the merge count — BpeSpec asserts the plan depth for
  * 8 and 4096 merges is identical.
  */
case class BpeSegment(child: Expression,
    table: org.apache.spark.broadcast.Broadcast[MergeTable])
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "bpe_segment"

  // keep the merge table OUT of plan strings: at 32k merges the default
  // flatArguments rendering would put the whole table in every explain
  override def toString: String = s"$prettyName($child, ${table.value})"
  override def sql: String = s"$prettyName(${child.sql}, ${table.value})"

  override protected def nullSafeEval(v: Any): Any =
    BpeFns.segment(v.asInstanceOf[UTF8String], table.value.ranks)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // the task closure carries only the Broadcast HANDLE; the 32k-entry
    // table deserializes once per executor, not once per task — at 39k
    // merges the per-task-closure form measurably spent more time
    // re-materializing the table across a stage's tasks than segmenting
    val tableRef = ctx.addReferenceObj("bpeMergeTable", table,
      classOf[org.apache.spark.broadcast.Broadcast[_]].getName)
    defineCodeGen(ctx, ev,
      c => s"graft.functions.BpeFns.segment($c, " +
        s"((graft.functions.MergeTable) $tableRef.value()).ranks())")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeSegment =
    copy(child = newChild)
}

object Bpe {
  // one broadcast per (session, merge-table CONTENT): repeated calls
  // with the same merges Seq (the streaming encode twin builds a plan
  // per micro-batch) must not ship a fresh 32k-entry broadcast every
  // trigger and leave the old ones to the ContextCleaner. Keys are the
  // live objects themselves — a WeakHashMap of session → (WeakHashMap
  // of merges → WeakReference(broadcast)) — never identity hashes,
  // which can collide or be reused after GC and silently serve the
  // WRONG table. The inner map compares merge tables STRUCTURALLY
  // (Seq.equals), so a hit is correct by construction; the double weak
  // layer (weak keys, weak broadcast values) means a stopped session
  // or a dropped merge table releases its broadcasts to the
  // ContextCleaner instead of pinning them for the JVM lifetime.
  private val bcastCache = new java.util.WeakHashMap[
    org.apache.spark.sql.SparkSession,
    java.util.WeakHashMap[Seq[(String, String)],
      java.lang.ref.WeakReference[
        org.apache.spark.broadcast.Broadcast[MergeTable]]]]()

  /** Column API: segment a word column under a learned merge table —
    * constant plan depth in the merge count; the table rides as ONE
    * executor-shared broadcast (memoized per session + merge-table
    * content). */
  def segments(word: Column, merges: Seq[(String, String)]): Column = {
    val spark = org.apache.spark.sql.SparkSession.active
    val bcast = bcastCache.synchronized {
      var inner = bcastCache.get(spark)
      if (inner == null) {
        inner = new java.util.WeakHashMap()
        bcastCache.put(spark, inner)
      }
      val ref = inner.get(merges)
      val hit = if (ref == null) null else ref.get()
      if (hit != null) hit
      else {
        val fresh = spark.sparkContext.broadcast(new MergeTable(merges))
        inner.put(merges, new java.lang.ref.WeakReference(fresh))
        fresh
      }
    }
    ColumnBridge.column(BpeSegment(ColumnBridge.expression(word), bcast))
  }
}
