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
    * "double", String for "string", java.sql.Date/LocalDate for "date",
    * java.sql.Timestamp/Instant for "tsus"/"tsms". `nonNull` adds an
    * `IS NOT NULL` requirement, which prunes provably-all-null file
    * columns even with no range (any bounded side already implies it).
    * `isNull` is the complementary `IS NULL` requirement: a file whose
    * recorded null count is exactly 0 provably holds no matching row
    * (an UNKNOWN count, -1, never prunes) — the audit-scan proof
    * (`WHERE col IS NULL`) that turns a whole-table quality sweep into
    * a listing of only the files that can carry nulls.
    */
  final case class Bound(column: String,
      lower: Option[Any] = None, upper: Option[Any] = None,
      nonNull: Boolean = false, isNull: Boolean = false)

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

  /** False only when the file's stats PROVE no row satisfies `p` — the
    * per-file primitive [[prune]] folds over, public so predicate-TREE
    * pruning (disjunctions in [[graft.plans.ZoneMapScanRule]]) can
    * evaluate arbitrary And/Or shapes file-by-file on the same proof.
    */
  def mayMatch(fe: FileEntry, p: Bound): Boolean =
    fe.stats.flatMap(_.get(p.column)) match {
      case None => true // no stats → unknowable → keep
      case Some(cs) if cs.typ == "null" =>
        // a range compare against NULL is never true: any bounded
        // predicate (or an explicit IS NOT NULL requirement) is disjoint
        // from an all-null file column; an IS NULL requirement trivially
        // matches it
        p.lower.isEmpty && p.upper.isEmpty && !p.nonNull
      case Some(cs) if p.isNull =>
        // IS NULL: a file with a PROVEN zero null count has no matching
        // row; an unknown count (-1) keeps
        cs.nulls != 0L
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
    case "date" =>
      val (mn, mx) = (cs.min.toLong, cs.max.toLong)
      p.lower.flatMap(asDays).exists(_ > mx) ||
        p.upper.flatMap(asDays).exists(_ < mn)
    case "tsus" | "tsms" =>
      // unify on the micros domain; a millis→micros overflow (year ±294k)
      // simply refuses the proof instead of wrapping into a wrong one
      val scale = if (cs.typ == "tsms") 1000L else 1L
      try {
        val mn = Math.multiplyExact(cs.min.toLong, scale)
        val mx = Math.multiplyExact(cs.max.toLong, scale)
        p.lower.flatMap(asMicros).exists(_ > mx) ||
          p.upper.flatMap(asMicros).exists(_ < mn)
      } catch { case _: ArithmeticException => false }
    case "dec" =>
      // reconstruct the true decimal from (unscaled, scale) — BigDecimal
      // comparison is value-exact across scales, so only the PREDICATE
      // type gates: integral/double bounds never compare against "dec"
      try {
        val mn = BigDecimal(BigInt(cs.min.toLong), cs.scale)
        val mx = BigDecimal(BigInt(cs.max.toLong), cs.scale)
        p.lower.flatMap(asBigDec).exists(_ > mx) ||
          p.upper.flatMap(asBigDec).exists(_ < mn)
      } catch { case _: Exception => false }
    case _ => false
  }

  // --- three-valued per-file comparison evidence ---------------------------

  /** Per-file THREE-VALUED evaluation of `column (op) v`, `op` one of
    * ">=", ">", "<=", "<", "=": Some(true) when the stats PROVE every row
    * of the file satisfies the comparison (range containment AND a proven
    * zero null count — a null row fails any comparison, so all-true needs
    * no nulls), Some(false) when they prove NO row does (range
    * disjointness; nulls only help — a null row also fails), None when the
    * file straddles or the evidence is missing/mixed-domain. This is what
    * lets a metadata-only aggregate answer `WHERE ts < cut` exactly on a
    * range-clustered table: all-true files contribute wholly, all-false
    * files drop, one straddling file refuses the rewrite
    * ([[graft.plans.MetaAggRule]]).
    */
  def triMatch(fe: FileEntry, column: String, op: String,
      v: Any): Option[Boolean] =
    fe.stats.flatMap(_.get(column)) match {
      case None => None // no evidence
      case Some(cs) if cs.typ == "null" =>
        Some(false) // NULL cmp anything is never true — no row matches
      case Some(cs) =>
        for {
          mnC <- cmpCs(cs, cs.min, v)
          mxC <- cmpCs(cs, cs.max, v)
          r <- {
            val noNulls = cs.nulls == 0L // -1 (unknown) can't prove all-true
            op match {
              case ">=" =>
                if (mxC < 0) Some(false)
                else if (mnC >= 0 && noNulls) Some(true) else None
              case ">" =>
                if (mxC <= 0) Some(false)
                else if (mnC > 0 && noNulls) Some(true) else None
              case "<=" =>
                if (mnC > 0) Some(false)
                else if (mxC <= 0 && noNulls) Some(true) else None
              case "<" =>
                if (mnC >= 0) Some(false)
                else if (mxC < 0 && noNulls) Some(true) else None
              case "=" =>
                if (mnC > 0 || mxC < 0) Some(false)
                else if (mnC == 0 && mxC == 0 && noNulls) Some(true) else None
              case _ => None
            }
          }
        } yield r
    }

  /** Sign of (recorded stat value − external predicate value) in the
    * stats domain; None when no lossless compare exists (mixed domains,
    * NaN, overflow) — evidence, never a guess.
    */
  private def cmp(typ: String, stat: String, v: Any): Option[Int] =
    try typ match {
      case "long" => asLong(v).map(l => java.lang.Long.compare(stat.toLong, l))
      case "double" => asDouble(v).filterNot(_.isNaN)
        .map(d => java.lang.Double.compare(z(stat.toDouble), z(d)))
      case "string" => v match {
        case s: String => Some(Integer.signum(stat.compareTo(s)))
        case _ => None
      }
      case "date" => asDays(v).map(d => java.lang.Long.compare(stat.toLong, d))
      case "tsus" | "tsms" =>
        val scale = if (typ == "tsms") 1000L else 1L
        asMicros(v).flatMap { us =>
          try Some(java.lang.Long.compare(
            Math.multiplyExact(stat.toLong, scale), us))
          catch { case _: ArithmeticException => None }
        }
      case _ => None // opaque/foreign: no order
    } catch { case _: Exception => None }

  /** [[cmp]] with the stats entry in hand — routes "dec" through the
    * (unscaled, scale) reconstruction; every other domain ignores scale.
    */
  private def cmpCs(cs: TableManifest.ColStats, stat: String,
      v: Any): Option[Int] =
    if (cs.typ == "dec")
      try asBigDec(v).map(BigDecimal(BigInt(stat.toLong), cs.scale).compare)
      catch { case _: Exception => None }
    else cmp(cs.typ, stat, v)

  // --- equi-join key-set pruning ------------------------------------------
  // The build side of a selective equi-join, turned into a file-skipping
  // proof: a fact file whose [min, max] window contains NO dim key cannot
  // produce an inner-join match, so it need not be read. Strictly stronger
  // than relaxing the key set to its [min, max] range (the IN-list
  // relaxation): a bimodal key set (hot-old + hot-new ids) spans nearly the
  // whole fact range, yet every middle file is provably partner-free. This
  // is the manifest-side analogue of dynamic file pruning in Delta/Spark's
  // DPP — but decided driver-side in O(files · log keys) from metadata,
  // before a single fact scan task exists.

  /** The files of `m` that may hold a row whose `column` EQUALS some value
    * in `keys` — the sound file superset for an inner/left-semi equi-join
    * probe side. None = the key set cannot carry a proof (mixed key
    * domains, NaN keys — Spark treats NaN = NaN as true while footer stats
    * exclude NaN — or values outside the stats domains); the caller must
    * fall back to range pruning or the full listing. Null keys are dropped
    * first (`null = x` is never true); an EMPTY key set therefore proves
    * every file partner-free. Per-file refusals (no stats, mismatched
    * stats domain) keep the file, exactly like [[prune]]; an all-null file
    * column is dropped — non-null keys cannot equal NULL.
    */
  def pruneInSet(m: Manifest, column: String, keys: Seq[Any])
      : Option[(Seq[FileEntry], PruneReport)] =
    keyDomain(keys.filterNot(_ == null)).map { case (kd, sorted) =>
      val kept = m.files.filter { fe =>
        fe.stats.flatMap(_.get(column)) match {
          case None => true // no stats → unknowable → keep
          case Some(cs) if cs.typ == "null" => false // non-null keys ≠ NULL
          case Some(cs) => anyKeyInFile(cs, kd, sorted)
        }
      }
      (kept, PruneReport(m.files.size, kept.size,
        m.files.map(_.bytes).sum, kept.map(_.bytes).sum))
    }

  /** Classify a non-null key set into ONE stats-comparable domain with its
    * sorted external form. Integral first (exact), then double (NaN
    * refuses; ±0.0 normalized to +0.0 — SQL-equal, and parquet widens zero
    * bounds the same way), then string (compared in JVM order, exact
    * against the ASCII-only bounds the manifest records), then epoch-day
    * dates and epoch-micro timestamps. A heterogeneous or unconvertible
    * set refuses wholesale — pruning must never guess.
    */
  private def keyDomain(keys: Seq[Any]): Option[(String, IndexedSeq[Any])] = {
    if (keys.isEmpty) return Some(("empty", Vector.empty))
    val longs = keys.map(asLong)
    if (longs.forall(_.isDefined))
      return Some(("long", longs.flatten.sorted.toIndexedSeq))
    val doubles = keys.map(asDouble)
    if (doubles.forall(_.isDefined)) {
      val ds = doubles.flatten
      if (ds.exists(_.isNaN)) return None
      return Some(("double", ds.map(z).sorted.toIndexedSeq))
    }
    if (keys.forall(_.isInstanceOf[String]))
      return Some(("string",
        keys.collect { case s: String => s }.sorted.toIndexedSeq))
    val days = keys.map(asDays)
    if (days.forall(_.isDefined))
      return Some(("date", days.flatten.sorted.toIndexedSeq))
    val micros = keys.map(asMicros)
    if (micros.forall(_.isDefined))
      return Some(("tsus", micros.flatten.sorted.toIndexedSeq))
    val decs = keys.map(asBigDec)
    if (decs.forall(_.isDefined))
      return Some(("dec", decs.flatten.sorted.toIndexedSeq))
    None
  }

  /** ±0.0 → +0.0 (SQL-equal; keeps the binary search order total). */
  private def z(d: Double): Double = if (d == 0.0) 0.0 else d

  /** True when some key can fall inside the file column's recorded range.
    * Domain mismatch keeps the file (no proof); timestamp scale overflow
    * keeps; NaN bounds (a writer should never record them) keep.
    */
  private def anyKeyInFile(cs: ColStats, keyDomain: String,
      sorted: IndexedSeq[Any]): Boolean = (cs.typ, keyDomain) match {
    case (_, "empty") => false // no keys → no partner anywhere
    case ("long", "long") =>
      anyIn(sorted.asInstanceOf[IndexedSeq[Long]], cs.min.toLong, cs.max.toLong)
    case ("double", "double") =>
      val (mn, mx) = (z(cs.min.toDouble), z(cs.max.toDouble))
      if (mn.isNaN || mx.isNaN) true
      else anyIn(sorted.asInstanceOf[IndexedSeq[Double]], mn, mx)
    case ("string", "string") =>
      anyIn(sorted.asInstanceOf[IndexedSeq[String]], cs.min, cs.max)
    case ("date", "date") =>
      anyIn(sorted.asInstanceOf[IndexedSeq[Long]], cs.min.toLong, cs.max.toLong)
    case ("tsus" | "tsms", "tsus") =>
      val scale = if (cs.typ == "tsms") 1000L else 1L
      try anyIn(sorted.asInstanceOf[IndexedSeq[Long]],
        Math.multiplyExact(cs.min.toLong, scale),
        Math.multiplyExact(cs.max.toLong, scale))
      catch { case _: ArithmeticException => true }
    case ("dec", "dec") =>
      try anyIn(sorted.asInstanceOf[IndexedSeq[BigDecimal]],
        BigDecimal(BigInt(cs.min.toLong), cs.scale),
        BigDecimal(BigInt(cs.max.toLong), cs.scale))
      catch { case _: Exception => true }
    case _ => true // mixed domains: lossy compare carries no proof
  }

  /** ∃ element of `sorted` in [lo, hi] — binary search for the first
    * element ≥ lo, then one bound check. O(log n) per file.
    */
  private def anyIn[T](sorted: IndexedSeq[T], lo: T, hi: T)(
      implicit ord: Ordering[T]): Boolean = {
    var l = 0
    var h = sorted.length
    while (l < h) {
      val mid = (l + h) >>> 1
      if (ord.lt(sorted(mid), lo)) l = mid + 1 else h = mid
    }
    l < sorted.length && ord.lteq(sorted(l), hi)
  }

  // --- metadata-only aggregate answering ----------------------------------
  // Exact COUNT(*) / COUNT(col) / MIN(col) / MAX(col) derived from the
  // manifest alone — zero scan tasks, O(files) driver work. At 100 TB these
  // are the queries a planner should NEVER run over data (the Delta/Iceberg
  // stats-answering analogue; Spark's own OptimizeMetadataOnlyQuery does
  // this for partition columns only). Every answer is Option-typed: None
  // means the manifest cannot PROVE the value (a file without stats, an
  // unknown null count, mixed domains) and the caller must fall back to a
  // scan — there is no "probably right" path.

  /** Exact row count, when the manifest recorded one (parquet commits). */
  def metaCount(m: Manifest): Option[Long] =
    if (m.rowCount >= 0) Some(m.rowCount) else None

  /** Exact COUNT(column) (non-null count): total rows minus the per-file
    * null counts — provable only when every file carries stats for the
    * column with a KNOWN null count. An all-null entry ("null" typ) with
    * an unrecorded count (partition-dir Hive-null sentinel) is still
    * provable when the FILE's row count is known: every row is null.
    */
  def metaNonNullCount(m: Manifest, column: String): Option[Long] =
    metaCount(m).flatMap { rows =>
      val per = m.files.map(fe => fe.stats.flatMap(_.get(column)).map(cs =>
        if (cs.nulls >= 0) cs.nulls
        else if (cs.typ == "null" && fe.rows >= 0) fe.rows
        else -1L))
      if (per.isEmpty || per.exists(_.isEmpty)) None
      else {
        val nulls = per.flatten
        if (nulls.exists(_ < 0)) None else Some(rows - nulls.sum)
      }
    }

  /** Exact SUM evidence for a column: Some((sum, nonNullCount, scale)) —
    * the table-wide exact sum as a BigDecimal at the domain's scale plus
    * the exact count of non-null values (what decides SQL's NULL-on-empty
    * and the AVG divisor) — or None when ANY file cannot prove its
    * contribution. Per-file evidence, strongest first:
    *
    *   - a recorded [[TableManifest.ColStats.sum]] ("long" domain: plain
    *     integer; "dec": unscaled at the recorded scale) with a KNOWN
    *     null count and file row count;
    *   - an all-null file column ("null" typ, or nulls == rows):
    *     contributes 0 to the sum and 0 non-null rows — SQL SUM/AVG
    *     ignore nulls;
    *   - a SINGLE-VALUED file column (min == max, zero nulls, known row
    *     count): sum = value × rows with no recording needed — this is
    *     what makes partition columns and range-clustered constants
    *     sum-answerable for free.
    *
    * Domains must agree across files ("long" everywhere, or "dec" at ONE
    * scale); mixed or floating domains refuse — a float sum is order-
    * dependent and the manifest never serves one.
    */
  def metaSum(m: Manifest, column: String)
      : Option[(BigDecimal, Long, Int)] = {
    var total = BigDecimal(0)
    var nonNull = 0L
    var domain: Option[(String, Int)] = None // (typ, scale) of valued files
    m.files.foreach { fe =>
      val cs = fe.stats.flatMap(_.get(column)).getOrElse(return None)
      val allNull = cs.typ == "null" ||
        (cs.nulls >= 0 && fe.rows >= 0 && cs.nulls == fe.rows)
      if (!allNull) {
        if (cs.typ != "long" && cs.typ != "dec") return None
        domain match {
          case Some((t, s)) =>
            if (t != cs.typ || (cs.typ == "dec" && s != cs.scale)) return None
          case None => domain = Some((cs.typ, cs.scale))
        }
        if (cs.nulls < 0 || fe.rows < 0) return None
        val contrib: BigDecimal =
          if (cs.sum.nonEmpty)
            try {
              if (cs.typ == "dec") BigDecimal(BigInt(cs.sum), cs.scale)
              else BigDecimal(BigInt(cs.sum))
            } catch { case _: NumberFormatException => return None }
          else if (cs.min == cs.max && cs.nulls == 0L)
            try {
              val v =
                if (cs.typ == "dec") BigDecimal(BigInt(cs.min), cs.scale)
                else BigDecimal(cs.min.toLong)
              v * BigDecimal(fe.rows)
            } catch { case _: NumberFormatException => return None }
          else return None
        total += contrib
        nonNull += fe.rows - cs.nulls
      }
    }
    Some((total, nonNull, domain.map(_._2).getOrElse(0)))
  }

  /** Exact MIN/MAX of a column as a merged [[TableManifest.ColStats]]
    * range — provable only when every file carries stats for the column in
    * ONE domain. All-null files contribute nothing (SQL MIN/MAX ignore
    * NULL); a table whose every file is all-null has no min/max → None.
    * The merged `nulls` is the table-wide null count, or -1 if any file's
    * is unknown.
    */
  def metaRange(m: Manifest, column: String): Option[ColStats] = {
    val per = m.files.map(_.stats.flatMap(_.get(column)))
    if (per.isEmpty || per.exists(_.isEmpty)) return None
    val cs = per.flatten
    val nulls = if (cs.exists(_.nulls < 0)) -1L else cs.map(_.nulls).sum
    val valued = cs.filter(_.typ != "null")
    if (valued.isEmpty) return None
    valued.map(_.typ).distinct.sorted match {
      case Seq("long") | Seq("date") => Some(ColStats(valued.head.typ,
        valued.map(_.min.toLong).min.toString,
        valued.map(_.max.toLong).max.toString, nulls))
      case Seq("double") => Some(ColStats("double",
        valued.map(_.min.toDouble).min.toString,
        valued.map(_.max.toDouble).max.toString, nulls))
      case Seq("string") => Some(ColStats("string",
        valued.map(_.min).min, valued.map(_.max).max, nulls))
      case Seq("dec") if valued.map(_.scale).distinct.size == 1 =>
        // one scale → unscaled order IS value order; mixed scales (can't
        // arise from one column, but a doctored manifest could) refuse
        Some(ColStats("dec", valued.map(_.min.toLong).min.toString,
          valued.map(_.max.toLong).max.toString, nulls, valued.head.scale))
      case Seq("tsus") | Seq("tsms") | Seq("tsms", "tsus") =>
        // normalize to micros (millis ×1000 is exact); overflow refuses
        try {
          val us = valued.map { c =>
            val k = if (c.typ == "tsms") 1000L else 1L
            (Math.multiplyExact(c.min.toLong, k),
              Math.multiplyExact(c.max.toLong, k))
          }
          Some(ColStats("tsus", us.map(_._1).min.toString,
            us.map(_._2).max.toString, nulls))
        } catch { case _: ArithmeticException => None }
      case _ => None
    }
  }

  /** Epoch-day count of a date-typed bound value. */
  private[sinks] def asDays(v: Any): Option[Long] = v match {
    case d: java.sql.Date => Some(d.toLocalDate.toEpochDay)
    case d: java.time.LocalDate => Some(d.toEpochDay)
    case _ => None
  }

  /** Epoch-micros of a timestamp-typed bound value. `Instant`-based — the
    * epochSecond/nano split floors correctly for pre-1970 instants, where
    * naive `getTime / 1000` truncation would be off by one.
    */
  private[sinks] def asMicros(v: Any): Option[Long] = v match {
    case t: java.sql.Timestamp => asMicros(t.toInstant)
    case i: java.time.Instant =>
      try Some(Math.addExact(
        Math.multiplyExact(i.getEpochSecond, 1000000L), i.getNano / 1000L))
      catch { case _: ArithmeticException => None }
    case _ => None
  }

  private[sinks] def asLong(v: Any): Option[Long] = v match {
    case i: Int => Some(i.toLong)
    case l: Long => Some(l)
    case s: Short => Some(s.toLong)
    case b: Byte => Some(b.toLong)
    case _ => None // a fractional bound vs integral stats: no lossless compare
  }

  /** Exact decimal of a decimal-typed bound/key value. Only true decimal
    * carriers qualify — a double is binary, not decimal, and a lossy
    * conversion carries no proof.
    */
  private[sinks] def asBigDec(v: Any): Option[BigDecimal] = v match {
    case b: java.math.BigDecimal => Some(BigDecimal(b))
    case b: BigDecimal => Some(b)
    case _ => None
  }

  private[sinks] def asDouble(v: Any): Option[Double] = v match {
    case d: Double => Some(d)
    case f: Float => Some(f.toDouble)
    // small integrals are exactly representable; beyond 2^53 the coercion
    // is lossy and cannot carry a disjointness proof
    case i: Int => Some(i.toDouble)
    case l: Long if math.abs(l) <= (1L << 53) => Some(l.toDouble)
    case _ => None
  }
}
