package graft.mr

import scala.collection.mutable

/** Port of the reference's example client (FileWordCounter.cpp:87-136):
  * word count over (path, content) records with a per-record local
  * combiner, summed in reduce.
  *
  * K1=path, V1=content; K2=word, V2=per-file count; K3=word, V3=total —
  * exactly the reference's type plugging (VPath/KWord/VCount,
  * FileWordCounter.cpp:21-48).
  */
object FileWordCounter {

  /** Reference-quirk tokenizer (FileWordCounter.cpp:149-177): splits on
    * the single ' ' char ONLY (\n/\t are not delimiters), and emits
    * empty-string tokens for leading/consecutive/trailing spaces — an
    * empty input yields one empty token. Implemented linearly (the
    * reference restart-scans, :163-165, making it O(n²) — a defect we do
    * not replicate; same output, different cost).
    */
  def tokenizeQuirk(s: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    val cur = new StringBuilder
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == ' ') { out += cur.result(); cur.clear() }
      else cur.append(c)
      i += 1
    }
    out += cur.result() // final token (possibly empty) — matches :176
    out.result()
  }

  /** [[tokenizeQuirk]] on RAW BYTES — the reference actually operates on
    * std::string BYTES, not decoded characters (FileWordCounter.cpp:
    * 149-177 compares `char` against ' '), so byte-exact parity over
    * non-UTF-8 content must split on the 0x20 byte and keep tokens as
    * byte strings. Same quirk contract: empty tokens kept, one final
    * (possibly empty) token, and an empty input yields one empty token. */
  def tokenizeQuirkBytes(b: Array[Byte]): Vector[Array[Byte]] = {
    val out = Vector.newBuilder[Array[Byte]]
    var start = 0
    var i = 0
    while (i < b.length) {
      if (b(i) == ' '.toByte) {
        out += java.util.Arrays.copyOfRange(b, start, i)
        start = i + 1
      }
      i += 1
    }
    out += java.util.Arrays.copyOfRange(b, start, b.length)
    out.result()
  }

  /** The MapReduce client: map = tokenize + local combine
    * (FileWordCounter.cpp:88-106's std::map combiner), reduce = sum
    * (:127-136). */
  val client: MapReduceClient[String, String, String, Int, String, Int] =
    new MapReduceClient[String, String, String, Int, String, Int] {
      def map(path: String, content: String): IterableOnce[(String, Int)] = {
        val local = mutable.Map.empty[String, Int]
        tokenizeQuirk(content).foreach { w =>
          local.update(w, local.getOrElse(w, 0) + 1)
        }
        local.iterator
      }
      def reduce(word: String, counts: Iterator[Int]): IterableOnce[(String, Int)] =
        Iterator.single(word -> counts.sum)
    }
}
