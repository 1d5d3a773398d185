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

  private def markerFs(p: org.apache.hadoop.fs.Path) =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def overwriteMarker(p: org.apache.hadoop.fs.Path, body: String): Unit = {
    val out = markerFs(p).create(p, true)
    try out.write(body.getBytes("UTF-8")) finally out.close()
  }

  test("L* memo survives a fresh session via the persisted marker (r16)") {
    val dir = tmpDir("ldmemo2")
    write(dir, "qqwweerrttyyuuiioopp")
    assert(lstar(dir).contains(20))
    // the cold search persisted a marker keyed by (path, content, range)
    val key = TextQueries.lastLdupKeyForTest
    val marker = TextQueries.longestDupMarker(dir, key)
    assert(markerFs(marker).exists(marker), "cold search must persist L*")
    // simulate a FRESH JVM: clear only the in-JVM map. Proof the next
    // call is served from DISK (not a re-search): plant a different —
    // wrong but well-formed — length in the marker and observe it
    // served. The marker is trusted exactly when its embedded key
    // matches, and the key folds the corpus content in — so this
    // "wrong" serve is only reachable by editing the file, as here.
    overwriteMarker(marker, s"$key\n19")
    TextQueries.clearLongestDupMemoForTest()
    assert(lstar(dir).contains(19), "fresh session must hit the marker, not re-search")
    // a TORN/foreign marker is a miss: re-search restores the truth and
    // rewrites the marker
    overwriteMarker(marker, "garbage with no newline")
    TextQueries.clearLongestDupMemoForTest()
    assert(lstar(dir).contains(20), "corrupt marker must re-search, never crash")
    // a matching key line with an Int-overflowing digit value is ALSO a
    // miss (the length-bounded parse keeps toInt total), never a crash
    overwriteMarker(marker, s"$key\n99999999999")
    TextQueries.clearLongestDupMemoForTest()
    assert(lstar(dir).contains(20), "overflowing value must miss, never crash")
    // an I/O failure is a miss on READ and a no-op on WRITE: a
    // directory squatting on the marker path makes open throw (the
    // racing-external-cleanup shape) and the post-search best-effort
    // rewrite fail — the query must still answer from the re-search
    markerFs(marker).delete(marker, false)
    markerFs(marker).mkdirs(marker)
    TextQueries.clearLongestDupMemoForTest()
    assert(lstar(dir).contains(20), "marker I/O failure must miss, never crash")
    markerFs(marker).delete(marker, true)
    // and a content CHANGE misses the old marker even across sessions
    // (different stamp → different marker file)
    val shared31 = "zzxxccvvbbnnmmasdfghjkl12345678"
    write(dir, shared31)
    TextQueries.clearLongestDupMemoForTest()
    assert(lstar(dir).contains(31), "new content, fresh session: re-searched")
  }

  test("marker directory is owner-only — including a PRE-EXISTING dir (r17 trust-boundary fix)") {
    val dir = tmpDir("ldmemo3")
    write(dir, "qqwweerrttyyuuiioopp")
    // pre-create the marker dir at default perms (the pre-r17 on-disk
    // state): Hadoop's mkdirs(path, perm) chmods only FRESH dirs, so
    // the write path must setPermission unconditionally to close the
    // world-shared-tmp hole for dirs persisted by earlier versions
    val preDir = TextQueries.longestDupMarker(dir, "probe").getParent
    val fs = markerFs(preDir)
    fs.mkdirs(preDir)
    fs.setPermission(preDir,
      new org.apache.hadoop.fs.permission.FsPermission(493.toShort)) // 0755
    assert(fs.getFileStatus(preDir).getPermission.toShort == 493.toShort)
    assert(lstar(dir).contains(20))
    val marker = TextQueries.longestDupMarker(dir, TextQueries.lastLdupKeyForTest)
    assert(fs.exists(marker))
    assert(fs.getFileStatus(marker.getParent).getPermission.toShort == 448.toShort,
      "graft_ldup_* marker dirs must be 0700 on a world-shared tmp, " +
        "even when the dir pre-existed at default umask")
  }

  test("memo eviction is single-entry LRU, never the entry being served (r17)") {
    TextQueries.clearLongestDupMemoForTest()
    (0 until 64).foreach { i =>
      val e = new TextQueries.LdupEntry(Some(i))
      e.tick = i + 1L // entry k0 is oldest…
      TextQueries.longestDupMemo.put(s"k$i", e)
    }
    // …but k0 was just USED (highest tick), so k1 is the LRU victim
    TextQueries.longestDupMemo.get("k0").tick = 1000L
    TextQueries.evictLruIfFull("brand-new-key")
    assert(TextQueries.longestDupMemo.size == 63)
    assert(TextQueries.longestDupMemo.containsKey("k0"), "recently-served entry survives")
    assert(!TextQueries.longestDupMemo.containsKey("k1"), "LRU entry is the one evicted")
    // an EXISTING key triggers no eviction (it is a hit, not an insert)
    TextQueries.evictLruIfFull("k5")
    assert(TextQueries.longestDupMemo.size == 63)
    // below capacity: no eviction either
    TextQueries.evictLruIfFull("another-new-key")
    assert(TextQueries.longestDupMemo.size == 63)
    TextQueries.clearLongestDupMemoForTest()
  }
}
