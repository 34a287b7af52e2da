package graft.sinks

/** Zone-map file skipping over the manifest's per-file column statistics —
  * the data-skipping layer of the versioned-dir table format (the
  * plain-parquet analogue of Delta/Iceberg file stats pruning; the
  * reference has no equivalent — it delegates scans wholesale to Athena,
  * AthenaUtil.scala:61-160, where S3 listing + full scans decide cost).
  *
  * At commit time [[TableManifest]] lifts each parquet file's [min, max]
  * per column out of the footer (metadata-only, O(files)); at read time
  * [[ObjectStoreSink.readVersionPruned]] drops every file whose recorded
  * range PROVABLY cannot intersect the query's range predicate — a
  * driver-side, O(files) decision made entirely from the manifest, before
  * any scan task launches. At 100 TB this is the difference between
  * reading the 3 files that can hold `ts BETWEEN a AND b` and scanning
  * the table: pruning cost does not grow with data volume, only with
  * file count (which the manifest already bounds via compaction).
  *
  * Soundness rules (prune = PROOF of emptiness, never a guess):
  *   - a column with no stats entry is never pruned on;
  *   - mixed-domain comparisons (an integral predicate against double
  *     stats or vice versa) never prune — float↔long coercion at the
  *     extremes is lossy, and a lossy compare cannot prove disjointness;
  *   - string stats exist only for files whose recorded bounds are pure
  *     ASCII; against ASCII bounds, parquet's unsigned-byte order and the
  *     JVM's UTF-16 order agree for EVERY candidate value (a first
  *     differing position against an ASCII char orders identically in
  *     both), so the compare is exact;
  *   - range predicates never match NULL, so an all-null file column
  *     (typ "null") is provably disjoint from any bounded predicate.
  *
  * Pruning is an optimization, never a semantics change: the read path
  * re-applies the predicate exactly on the surviving files.
  */
object ZoneMap {
  import TableManifest.{ColStats, FileEntry, Manifest}

  /** Closed-range predicate on one column: keep rows with
    * `lower <= column <= upper` (each side optional). Values are plain
    * Scala literals — Int/Long for "long" stats, Double/Float for
    * "double", String for "string".
    */
  final case class Bound(column: String,
      lower: Option[Any] = None, upper: Option[Any] = None)

  final case class PruneReport(filesTotal: Int, filesKept: Int,
      bytesTotal: Long, bytesKept: Long) {
    def filesSkipped: Int = filesTotal - filesKept
    def bytesSkipped: Long = bytesTotal - bytesKept
  }

  /** The files of `m` that may hold a row satisfying ALL bounds, plus the
    * skip accounting. Conservative by construction: a file is dropped only
    * when some bound is provably disjoint from its recorded range.
    */
  def prune(m: Manifest, preds: Seq[Bound]): (Seq[FileEntry], PruneReport) = {
    val kept = m.files.filter(fe => preds.forall(p => mayMatch(fe, p)))
    (kept, PruneReport(m.files.size, kept.size,
      m.files.map(_.bytes).sum, kept.map(_.bytes).sum))
  }

  /** False only when the file's stats PROVE no row satisfies `p`. */
  private def mayMatch(fe: FileEntry, p: Bound): Boolean =
    fe.stats.flatMap(_.get(p.column)) match {
      case None => true // no stats → unknowable → keep
      case Some(cs) if cs.typ == "null" =>
        // a range compare against NULL is never true: any bounded
        // predicate is disjoint from an all-null file column
        p.lower.isEmpty && p.upper.isEmpty
      case Some(cs) => !disjoint(cs, p)
    }

  private def disjoint(cs: ColStats, p: Bound): Boolean = cs.typ match {
    case "long" =>
      val (mn, mx) = (cs.min.toLong, cs.max.toLong)
      p.lower.flatMap(asLong).exists(_ > mx) ||
        p.upper.flatMap(asLong).exists(_ < mn)
    case "double" =>
      val (mn, mx) = (cs.min.toDouble, cs.max.toDouble)
      p.lower.flatMap(asDouble).exists(_ > mx) ||
        p.upper.flatMap(asDouble).exists(_ < mn)
    case "string" =>
      p.lower.collect { case s: String => s }.exists(_ > cs.max) ||
        p.upper.collect { case s: String => s }.exists(_ < cs.min)
    case _ => false
  }

  private def asLong(v: Any): Option[Long] = v match {
    case i: Int => Some(i.toLong)
    case l: Long => Some(l)
    case s: Short => Some(s.toLong)
    case b: Byte => Some(b.toLong)
    case _ => None // a fractional bound vs integral stats: no lossless compare
  }

  private def asDouble(v: Any): Option[Double] = v match {
    case d: Double => Some(d)
    case f: Float => Some(f.toDouble)
    // small integrals are exactly representable; beyond 2^53 the coercion
    // is lossy and cannot carry a disjointness proof
    case i: Int => Some(i.toDouble)
    case l: Long if math.abs(l) <= (1L << 53) => Some(l.toDouble)
    case _ => None
  }
}
