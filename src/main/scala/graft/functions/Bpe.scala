package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge.{column, expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Byte-pair-encoding tokenization over an explicit merges table — the real
  * BPE algorithm (Sennrich et al. 2016; the GPT-2 tokenizer family, Radford
  * et al. 2019 — both public), replacing the earlier regex approximation of
  * `TextFunctions.bpeTokens`. Character-level rather than byte-level: the
  * corpus is ASCII, a SQL oracle replays characters directly, and the
  * merges loop — the actual algorithm — is identical either way.
  *
  * Application contract (what both the kernel and any replaying engine
  * implement): rules apply IN RANK ORDER; each rule merges all left-to-right
  * non-overlapping occurrences of its pair until none remain. For a VALID
  * merges table — each rule's two sides are single characters or products of
  * strictly earlier rules, enforced in the constructor — this is equivalent
  * to the reference implementations' lowest-rank-first greedy loop: a merge
  * only creates new adjacencies involving its product, and every rule that
  * consumes a product ranks later than the rule producing it. The rank-order
  * form is the one a SQL engine can replay (delimiter-joined symbols +
  * iterated `replace`), which is why it is the contract.
  *
  * Token ids follow the GPT-2 convention: base symbols get their Unicode
  * codepoint, the product of rule r (1-based) gets `0x110000 + r - 1`
  * (above the codepoint space, so ids never collide).
  *
  * Scale: a per-row scalar kernel inside whole-stage codegen — no shuffle,
  * no UDF, no dictionary broadcast (the table rides the plan as a codegen
  * reference object, KBs once per task).
  */
final class BpeTable(val merges: Seq[(String, String)]) extends Serializable {
  require(merges.nonEmpty, "empty merges table")

  /** id of a known multi-char product, else -1 */
  private val productId = new java.util.HashMap[String, Integer]()
  /** (xid, yid) per rule, resolved to symbol ids */
  private[functions] val xIds = new Array[Int](merges.size)
  private[functions] val yIds = new Array[Int](merges.size)
  private[functions] val zIds = new Array[Int](merges.size)
  /** product string per rule (for detokenization / specs) */
  private val products = new Array[String](merges.size)

  private def idOf(sym: String, rank: Int): Int = {
    if (sym.length == 1) sym.charAt(0).toInt
    else {
      val p = productId.get(sym)
      require(p != null,
        s"invalid merges table: rule $rank side '$sym' is neither a single " +
          "character nor the product of an earlier rule")
      p.intValue()
    }
  }

  merges.zipWithIndex.foreach { case ((x, y), i) =>
    val rank = i + 1
    require(x.nonEmpty && y.nonEmpty, s"rule $rank has an empty side")
    xIds(i) = idOf(x, rank)
    yIds(i) = idOf(y, rank)
    zIds(i) = 0x110000 + i
    products(i) = x + y
    // distinct ids but identical product STRINGS would make the symbol
    // sequence ambiguous to a string-level (SQL) replay — refuse
    require(!productId.containsKey(x + y),
      s"invalid merges table: duplicate product '${x + y}' at rule $rank")
    productId.put(x + y, Integer.valueOf(zIds(i)))
  }

  def symbolString(id: Int): String =
    if (id >= 0x110000) products(id - 0x110000) else String.valueOf(id.toChar)

  /** Merge loop over one word already expanded to symbol ids in `ids[0,n)`;
    * returns the merged length (ids mutated in place — safe because every
    * rule's output position trails its read position).
    */
  private def mergeWord(ids: Array[Int], n0: Int): Int = {
    var n = n0
    var r = 0
    while (r < xIds.length && n > 1) {
      val x = xIds(r); val y = yIds(r); val z = zIds(r)
      var i = 0; var w = 0
      while (i < n) {
        if (i < n - 1 && ids(i) == x && ids(i + 1) == y) {
          ids(w) = z; i += 2
        } else {
          ids(w) = ids(i); i += 1
        }
        w += 1
      }
      n = w
      r += 1
    }
    n
  }

  // @transient: the anonymous ThreadLocal subclass is not serializable;
  // executors re-create it lazily after deserialization
  @transient private lazy val scratch = new ThreadLocal[Array[Int]] {
    override def initialValue(): Array[Int] = new Array[Int](64)
  }

  /** Total BPE token count of whitespace-split `text` (same word boundary
    * as `TextFunctions.tokens`: maximal runs of non-whitespace).
    */
  def count(text: UTF8String): Long = {
    val s = text.toString
    var total = 0L
    var i = 0
    val len = s.length
    while (i < len) {
      while (i < len && Character.isWhitespace(s.charAt(i))) i += 1
      val start = i
      while (i < len && !Character.isWhitespace(s.charAt(i))) i += 1
      if (i > start) {
        var buf = scratch.get()
        val wlen = i - start
        if (buf.length < wlen) { buf = new Array[Int](wlen); scratch.set(buf) }
        var j = 0
        while (j < wlen) { buf(j) = s.charAt(start + j).toInt; j += 1 }
        total += mergeWord(buf, wlen)
      }
    }
    total
  }

  /** Token ids of whitespace-split `text`, concatenated across words. */
  def tokenIds(text: UTF8String): GenericArrayData = {
    val s = text.toString
    val out = new scala.collection.mutable.ArrayBuffer[Any]()
    var i = 0
    val len = s.length
    while (i < len) {
      while (i < len && Character.isWhitespace(s.charAt(i))) i += 1
      val start = i
      while (i < len && !Character.isWhitespace(s.charAt(i))) i += 1
      if (i > start) {
        val wlen = i - start
        val buf = new Array[Int](wlen)
        var j = 0
        while (j < wlen) { buf(j) = s.charAt(start + j).toInt; j += 1 }
        val n = mergeWord(buf, wlen)
        var k = 0
        while (k < n) { out += buf(k).toLong; k += 1 }
      }
    }
    new GenericArrayData(out.toArray)
  }

  /** Token strings of one word (spec/debug surface). */
  def tokenize(word: String): Seq[String] = {
    val buf = word.toCharArray.map(_.toInt)
    val n = mergeWord(buf, buf.length)
    buf.take(n).map(symbolString).toSeq
  }
}

object BpeTable {

  /** The engine's default merges fixture: 43 rules over lowercase ASCII,
    * hand-ordered so every rule's sides are base chars or earlier products
    * (the validity invariant real learned tables have). Chosen to merge the
    * synthetic corpus's vocabulary non-trivially (multi-level products up
    * to whole words like `spark`, `table`, `stream`); committed as a
    * fixture the same way the stopword lists are — the ALGORITHM is the
    * operator, the table is configuration.
    */
  val defaultMerges: Seq[(String, String)] = Seq(
    "t" -> "h", "th" -> "e", "i" -> "n", "e" -> "r", "a" -> "r",
    "o" -> "r", "a" -> "n", "s" -> "t", "o" -> "w", "l" -> "e",
    "a" -> "t", "a" -> "m", "a" -> "l", "u" -> "e", "s" -> "p",
    "sp" -> "ar", "spar" -> "k", "t" -> "a", "ta" -> "b", "tab" -> "le",
    "b" -> "at", "bat" -> "c", "batc" -> "h", "st" -> "r", "str" -> "e",
    "stre" -> "am", "d" -> "at", "dat" -> "a", "v" -> "al", "val" -> "ue",
    "c" -> "o", "co" -> "l", "u" -> "m", "col" -> "um", "colum" -> "n",
    "k" -> "e", "ke" -> "y", "r" -> "ow", "w" -> "in", "win" -> "d",
    "wind" -> "ow", "j" -> "o", "jo" -> "in")

  lazy val default: BpeTable = new BpeTable(defaultMerges)

  /** The default merges as a DuckDB VALUES relation (rank, x, y) — the
    * oracle replays the SAME table.
    */
  def defaultMergesSql: String =
    defaultMerges.zipWithIndex
      .map { case ((x, y), i) => s"(${i + 1},'$x','$y')" }
      .mkString("(VALUES ", ",", ")")
}

/** Total BPE token count of a text under a merges table (LongType). */
case class BpeCountTokens(child: Expression, table: BpeTable)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(v: Any): Any =
    table.count(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeTable", table, "graft.functions.BpeTable")
    defineCodeGen(ctx, ev, c => s"$ref.count($c)")
  }
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** BPE token ids of a text under a merges table (ArrayType(LongType)). */
case class BpeTokenIds(child: Expression, table: BpeTable)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    table.tokenIds(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeTable", table, "graft.functions.BpeTable")
    defineCodeGen(ctx, ev, c => s"$ref.tokenIds($c)")
  }
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

object Bpe {
  def bpeCount(text: Column, table: BpeTable = BpeTable.default): Column =
    column(BpeCountTokens(expression(text), table))
  def bpeIds(text: Column, table: BpeTable = BpeTable.default): Column =
    column(BpeTokenIds(expression(text), table))
}
