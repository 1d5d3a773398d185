package graft.queries

import graft.SparkSpec

/** The round-15 L* memo (`TextQueries.longestDupLenMemo`) must never
  * serve a stale length: the memo key folds the corpus CONTENT in
  * (count + order-independent xxhash64 over (doc_id, text)), so
  * rewriting the SAME path with different documents must re-search.
  * That stamp is the only thing standing between the memoization and a
  * silent wrong answer, so it gets its own spec.
  */
class LongestDupMemoSpec extends SparkSpec {
  import spark.implicits._

  // fillers with no internal or cross-filler 8-gram repeats (each a
  // distinct-character sequence, mutually different)
  private val f1 = "abcdefghijklmnopqrst"
  private val f2 = "uvwxyz0123456789ABCD"
  private val f3 = "EFGHIJKLMNOPQRSTUVWX"
  private val f4 = "YZ!@#$%^&*()-=+[]{};"

  private def write(dir: String, shared: String): Unit =
    Seq((1L, f1 + shared + f2), (2L, f3 + shared + f4))
      .toDF("doc_id", "text")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")

  private def lstar(dir: String): Option[Int] = {
    val rows = TextQueries.queries("text_longest_dup")(spark, dir)
      .select("len").distinct().collect()
    rows.headOption.map(_.getInt(0))
  }

  test("L* memo serves repeats and invalidates on content change") {
    val dir = tmpDir("ldmemo")
    val shared20 = "qqwweerrttyyuuiioopp" // 20 chars, no 8-gram repeat inside
    write(dir, shared20)
    assert(lstar(dir).contains(20), "corpus A: the planted 20-char dup")
    // memo hit: same content, same answer
    assert(lstar(dir).contains(20))
    // REWRITE the same path with a longer planted duplicate: the stamp
    // changes, the memo must re-search — a stale 20 here would be the
    // silent-wrong-answer failure this spec exists to catch
    val shared31 = "zzxxccvvbbnnmmasdfghjkl12345678"
    assert(shared31.length == 31)
    write(dir, shared31)
    assert(lstar(dir).contains(31), "corpus B at the same path: re-searched")
  }
}
