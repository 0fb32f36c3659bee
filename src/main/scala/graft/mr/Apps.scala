package graft.mr

/** The reference's application operators (src/mrapps) as MR-compat
  * (mapf, reducef) pairs — exact semantic ports of the Go plugins' map and
  * reduce logic (query semantics only; crash/timing injection is the test
  * harness's job, handled by Spark task retry).
  */
object Apps {

  /** Word count (/root/reference/src/mrapps/wc.go:22-43): tokenize on
    * non-letter runes (case-preserving), emit (word,"1"); reduce = count. */
  object WordCount {
    val map: MRJob.MapF = (_, contents) =>
      contents.split("[^\\p{L}]+").iterator.filter(_.nonEmpty).map(w => (w, "1"))
    val reduce: MRJob.ReduceF = (_, values) => values.size.toString
  }

  /** Inverted index (/root/reference/src/mrapps/indexer.go:20-39): per-doc
    * distinct words → (word, docName); reduce = "N doc1,doc2,..." with docs
    * sorted lexicographically. */
  object InvertedIndex {
    val map: MRJob.MapF = (filename, contents) =>
      contents.split("[^\\p{L}]+").iterator.filter(_.nonEmpty)
        .toSet[String].iterator.map(w => (w, filename))
    val reduce: MRJob.ReduceF = (_, values) => {
      val docs = values.distinct.sorted
      s"${docs.size} ${docs.mkString(",")}"
    }
  }

  /** File metadata aggregation (/root/reference/src/mrapps/nocrash.go:17-47
    * query part): 4 fixed keys a/b/c/d with filename/length metadata;
    * reduce = sorted space-join of values. */
  object FileStats {
    val map: MRJob.MapF = (filename, contents) => Iterator(
      ("a", filename),
      ("b", filename.length.toString),
      ("c", contents.length.toString),
      ("d", "xyzzy"))
    val reduce: MRJob.ReduceF = (_, values) => values.sorted.mkString(" ")
  }

  /** Per-file record count (/root/reference/src/mrapps/early_exit.go:19-36
    * query part): (filename,"1") per file; reduce = count. */
  object FileCount {
    val map: MRJob.MapF = (filename, _) => Iterator((filename, "1"))
    val reduce: MRJob.ReduceF = (_, values) => values.size.toString
  }
}
