package graft.tools

import graft.index.CodeFile

/** Deterministic synthetic source-code corpus (FIXTURES.md §2): pure function
  * of docIndex (seeded), so executors generate their own partitions — no
  * driver materialization, no external data. Term profile exercises every
  * BM25 regime: hot terms (df≈N, the `import`/`func` skew case), mid terms
  * (df≈N/10), one singleton per doc, stopwords, geometric doc lengths, and a
  * planted phrase.
  */
object SyntheticCorpus {
  val hot = Array("import", "func", "package", "return")
  val mid = Array("parser", "buffer", "index", "scorer", "merge", "token",
    "query", "shard", "vector", "cache")
  val stop = Array("the", "of", "to", "and", "a", "in", "is", "it")

  def content(i: Long): String = {
    val rnd = new scala.util.Random(42L * 1000003L + i)
    val len = 8 << rnd.nextInt(6) // 8..256 tokens
    val sb = new StringBuilder
    sb.append(hot((i % hot.length).toInt)).append(' ')
    var t = 1
    while (t < len) {
      val r = rnd.nextInt(100)
      val w =
        if (r < 30) hot(rnd.nextInt(hot.length))
        else if (r < 55) mid(rnd.nextInt(mid.length))
        else if (r < 75) stop(rnd.nextInt(stop.length))
        else s"w${rnd.nextInt(500)}"
      sb.append(w).append(' ')
      t += 1
    }
    if (i % 7 == 0) sb.append("posting list ")
    sb.append(s"uniqtoken_$i")
    sb.toString
  }

  def file(i: Long): CodeFile =
    CodeFile(
      repo = f"org${i % 13}%03d/repo${i % 29}%03d",
      path = f"src/pkg${i % 5}/File$i%07d.scala",
      commit = f"$i%040x",
      lang = Seq("scala", "go", "java", "py", "c")((i % 5).toInt),
      content = content(i))
}
