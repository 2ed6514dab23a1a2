package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{CollectionGenerator, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native generator `word_ngrams(words, n)`: one output row per word
  * n-gram of an `array<string>` column — the third expression species
  * next to the scalar ([[DotProductI64]]) and the aggregate
  * ([[TopKRows]]).
  *
  * The pure-SQL form — `explode(transform(sequence(1, size(ws)-n+1),
  * i -> array_join(slice(ws, i, n), ' ')))` — materializes the FULL
  * per-document gram array (≈ doc length × n word copies) before the
  * explode hands rows downstream. This generator streams grams one at a
  * time: peak extra memory per row is one gram, not one document's
  * worth of grams — the difference between shingling a 1 MB document
  * and holding 3 MB of transient arrays per task slot while doing it.
  *
  * Byte-exact with the SQL form (UTF8String concat with single-space
  * joints), so it can share an existing oracle. Null/short inputs yield
  * zero rows, matching explode-of-empty-array semantics.
  */
case class WordNgrams(words: Expression, n: Expression)
    extends CollectionGenerator with CodegenFallback {

  override def children: Seq[Expression] = Seq(words, n)
  override def prettyName: String = "word_ngrams"

  // CollectionGenerator contract (lets GenerateExec treat the output
  // like explode's): not posexplode-shaped, no outer rows
  override def position: Boolean = false
  override def inline: Boolean = false
  override def collectionType: DataType = ArrayType(StringType)

  override def elementSchema: StructType =
    StructType(StructField("gram", StringType) :: Nil)

  private lazy val gramN: Int = n.eval().asInstanceOf[Number].intValue()
  private val space = UTF8String.fromString(" ")

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val arr = words.eval(input)
    if (arr == null || gramN <= 0) return Iterator.empty
    val ws = arr.asInstanceOf[ArrayData]
    val m = ws.numElements() - gramN + 1
    if (m <= 0) return Iterator.empty
    (0 until m).iterator.map { i =>
      val parts = new Array[UTF8String](2 * gramN - 1)
      var j = 0
      while (j < gramN) {
        parts(2 * j) = ws.getUTF8String(i + j)
        if (j > 0) parts(2 * j - 1) = space
        j += 1
      }
      InternalRow(UTF8String.concat(parts: _*))
    }
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(words = newChildren(0), n = newChildren(1))
}
