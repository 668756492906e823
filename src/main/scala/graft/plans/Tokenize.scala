package graft.plans

/** Shared tokenization for the native text expressions — ONE splitter and
  * ONE shingle-assembly loop so MinhashSigExpr (candidate generation),
  * ShingleSetExpr (exact verification), SimhashExpr and TopKWordsAggregator
  * can never drift apart.
  *
  * `words` matches Spark's `split(text, " ")` and DuckDB's `string_split`
  * EXACTLY: trailing empty tokens are KEPT. Java's `split(' ')` (limit 0)
  * drops them — a latent cross-engine divergence on text with trailing
  * spaces that the space-normalized synthetic corpus never exercised.
  */
private[plans] object Tokenize {

  def words(text: String): Array[String] = text.split(" ", -1)

  /** Visit each k-word shingle (space-joined, in order, with repeats). */
  def eachShingle(words: Array[String], k: Int)(f: String => Unit): Unit = {
    if (words.length < k) return
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i <= words.length - k) {
      sb.setLength(0)
      var w = 0
      while (w < k) {
        if (w > 0) sb.append(' ')
        sb.append(words(i + w))
        w += 1
      }
      f(sb.toString)
      i += 1
    }
  }
}
