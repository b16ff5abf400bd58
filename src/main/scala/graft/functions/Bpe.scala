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
object BpeFns {
  /** Build the serializable rank map an expression instance carries:
    * key = a + NUL + b (unambiguous: a whitespace-split token can
    * never contain U+0000), value = 1-based application rank. */
  def rankMap(merges: Seq[(String, String)]): java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](merges.size * 2)
    var r = 0
    while (r < merges.size) {
      val (a, b) = merges(r)
      // first (lowest) rank wins if a pair is ever duplicated
      m.putIfAbsent(a + "\u0000" + b, Integer.valueOf(r + 1))
      r += 1
    }
    m
  }

  def segment(word: UTF8String,
      ranks: java.util.HashMap[String, Integer]): GenericArrayData = {
    val s = word.toString
    // initial segmentation: one segment per code point (the training
    // table's substring(w, i, 1) splits by code point, not UTF-16 unit)
    val segs = new java.util.ArrayList[String](s.length)
    var i = 0
    while (i < s.length) {
      val cc = Character.charCount(s.codePointAt(i))
      segs.add(s.substring(i, i + cc))
      i += cc
    }
    var done = segs.size < 2
    while (!done) {
      var bestRank = Int.MaxValue
      var bestI = -1
      var j = 0
      val n = segs.size
      while (j < n - 1) {
        val r = ranks.get(segs.get(j) + "\u0000" + segs.get(j + 1))
        if (r != null && r.intValue() < bestRank) {
          bestRank = r.intValue(); bestI = j
        }
        j += 1
      }
      if (bestI < 0) done = true
      else {
        segs.set(bestI, segs.get(bestI) + segs.get(bestI + 1))
        segs.remove(bestI + 1)
        if (segs.size < 2) done = true
      }
    }
    val out = new Array[AnyRef](segs.size)
    var o = 0
    while (o < segs.size) {
      out(o) = UTF8String.fromString(segs.get(o)); o += 1
    }
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
case class BpeSegment(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "bpe_segment"

  @transient private lazy val ranks = BpeFns.rankMap(merges)

  // keep the merge table OUT of plan strings: at 32k merges the default
  // flatArguments rendering would put the whole table in every explain
  override def toString: String = s"$prettyName($child, ${merges.size} merges)"
  override def sql: String = s"$prettyName(${child.sql}, ${merges.size} merges)"

  override protected def nullSafeEval(v: Any): Any =
    BpeFns.segment(v.asInstanceOf[UTF8String], ranks)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ranksRef = ctx.addReferenceObj("bpeRanks", ranks,
      "java.util.HashMap<String, Integer>")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.BpeFns.segment($c, $ranksRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeSegment =
    copy(child = newChild)
}

object Bpe {
  /** Column API: segment a word column under a learned merge table —
    * constant plan depth in the merge count. */
  def segments(word: Column, merges: Seq[(String, String)]): Column =
    ColumnBridge.column(BpeSegment(ColumnBridge.expression(word), merges))
}
