package graft.sources

import java.time.LocalDate

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{concat, date_add, date_format, from_utc_timestamp, lit, lpad, pmod, substring, to_date, unix_micros}
import org.apache.spark.sql.types.{DataType, DateType, IntegerType, LongType, StringType, TimestampType}

/** A TIME/TRUNCATE partition TRANSFORM — Iceberg's hidden partitioning
  * (Iceberg spec §"Partition Transforms") as a first-class manifest-table
  * layout: the table is partitioned by `months(d)` / `days(d)` /
  * `years(d)` / `truncate(w, c)` of a SOURCE column, the transform value
  * lives only in directory names and manifest pvals (never as a stored
  * column), and queries filter on the RAW column — the scan maps pushed
  * predicates through the transform and prunes partitions the predicate
  * provably cannot match. This is the reference's own layout done the
  * Iceberg way: `glue_job.py:159` partitions its sink by a date derived
  * from event time and every Athena query must repeat the derivation;
  * here the derivation is a property of the table.
  *
  * One spec object serves every pval computation so the write path, the
  * verbs' rewrites, the deletion-vector recording, and the driver-side
  * prune probes can never disagree:
  *
  *   - [[pvalColumn]] — the distributed write expression (Column).
  *   - [[pvalOfDays]]/[[pvalOfString]]/[[pvalOfLong]] — the executor-side
  *     per-row forms used by the connector's raw parquet writers.
  *   - [[keepPredicate]] — pushed filters on the raw column folded into a
  *     driver-side pval predicate (INCLUSIVE: any filter shape the
  *     transform cannot decide prunes nothing; every filter is also
  *     re-applied row-level, exactly like parquet row-group pruning).
  *
  * Time transforms accept DATE and ISO-8601 STRING source columns; both
  * are timezone-free, so the executor-side `java.time` forms and the
  * Column forms agree byte-for-byte under any session zone. TIMESTAMP
  * sources are supported with a TABLE-PINNED `zone` (stamped as the
  * `transform.zone` property at CREATE, default UTC): the instant
  * projects to wall-clock fields under THAT zone in both forms, never
  * the session zone, so a reader anywhere prunes exactly what the
  * writer wrote (a session-zone projection would silently move rows
  * between partitions — pinned in `MonthLayoutSpec`). `hours(ts)` is
  * the finest time transform and takes TIMESTAMP only (pval
  * `yyyy-MM-dd-HH`). Truncate accepts BIGINT/INT (Iceberg's
  * `v - (((v % W) + W) % W)` floor semantics) and STRING (prefix).
  * pval STRINGS compare consistently with raw-column order: zero-padded
  * `yyyy-MM[-dd[-HH]]` sorts lexicographically, truncated longs compare
  * numerically in [[keepPredicate]]. Range pruning over a NAMED zone is
  * disabled (a DST fall-back hour makes wall-clock pvals non-monotone
  * in the instant — a range bound could wrongly prune the repeated
  * hour); fixed-offset zones (UTC included) keep it.
  */
final case class GraftTransform(kind: String, width: Int, zone: String = "") {
  import GraftTransform._
  require(timeKinds(kind) || kind == "truncate", s"unknown transform kind $kind")
  require(kind != "truncate" || width > 0, s"truncate needs a positive width")

  /** The pinned zone for TIMESTAMP sources (empty = DATE/STRING source,
    * no zone involved). */
  @transient private lazy val zoneId: java.time.ZoneId =
    java.time.ZoneId.of(if (zone.isEmpty) "UTC" else zone)

  /** Characters of the ISO date prefix this time transform keeps. */
  private def isoLen: Int = kind match {
    case "years" => 4
    case "months" => 7
    case "days" => 10
    case "hours" => 13
  }

  /** pval of a DATE value (Spark-internal days since epoch). */
  def pvalOfDays(days: Int): String = {
    val d = LocalDate.ofEpochDay(days.toLong)
    kind match {
      case "years" => f"${d.getYear}%04d"
      case "months" => f"${d.getYear}%04d-${d.getMonthValue}%02d"
      case "days" => f"${d.getYear}%04d-${d.getMonthValue}%02d-${d.getDayOfMonth}%02d"
      case other => throw new IllegalStateException(s"$other on a DATE column")
    }
  }

  /** pval of a TIMESTAMP value (Spark-internal micros since epoch):
    * wall-clock fields of the instant in the PINNED zone — the
    * executor-side twin of the Column form's `from_utc_timestamp`
    * projection (both use the JDK zone rules; agreement pinned in
    * `MonthLayoutSpec`). */
  def pvalOfMicros(micros: Long): String = {
    val zdt = java.time.Instant.EPOCH
      .plus(micros, java.time.temporal.ChronoUnit.MICROS).atZone(zoneId)
    kind match {
      case "years" => f"${zdt.getYear}%04d"
      case "months" => f"${zdt.getYear}%04d-${zdt.getMonthValue}%02d"
      case "days" =>
        f"${zdt.getYear}%04d-${zdt.getMonthValue}%02d-${zdt.getDayOfMonth}%02d"
      case "hours" =>
        f"${zdt.getYear}%04d-${zdt.getMonthValue}%02d-${zdt.getDayOfMonth}%02d-${zdt.getHour}%02d"
      case other => throw new IllegalStateException(s"$other on a TIMESTAMP column")
    }
  }

  /** pval of a STRING value (ISO date prefix for time kinds; prefix for
    * truncate). Truncates by CODE POINTS, not UTF-16 code units — Spark's
    * `substring` (the Column form) counts code points, and a code-unit
    * take could split a surrogate pair, whose lone half URL-encodes
    * non-injectively ('?') and would let two distinct values share one
    * escaped pval. */
  def pvalOfString(s: String): String = {
    val n = if (kind == "truncate") width else isoLen
    if (s.codePointCount(0, s.length) <= n) s
    else s.substring(0, s.offsetByCodePoints(0, n))
  }

  /** pval of an integral value (truncate only: floor to the width). */
  def pvalOfLong(v: Long): String = {
    require(kind == "truncate", s"$kind on an integral column")
    (v - java.lang.Math.floorMod(v, width.toLong)).toString
  }

  /** pval of a pushed-filter LITERAL (driver-side prune probe), or None
    * for a literal type the transform cannot decide (prune nothing). */
  def pvalOfLiteral(v: Any): Option[String] = v match {
    case d: java.sql.Date => Some(pvalOfDays(d.toLocalDate.toEpochDay.toInt))
    case d: java.time.LocalDate => Some(pvalOfDays(d.toEpochDay.toInt))
    case t: java.sql.Timestamp =>
      val i = t.toInstant
      Some(pvalOfMicros(i.getEpochSecond * 1000000L + i.getNano / 1000L))
    case i: java.time.Instant =>
      Some(pvalOfMicros(i.getEpochSecond * 1000000L + i.getNano / 1000L))
    case s: String if kind != "hours" => Some(pvalOfString(s))
    case l: java.lang.Long if kind == "truncate" => Some(pvalOfLong(l))
    case i: java.lang.Integer if kind == "truncate" => Some(pvalOfLong(i.toLong))
    case _ => None
  }

  /** The transform as a Column over the raw source column — the ONE
    * distributed form, used by every full-row rewrite via
    * [[ManifestTable.layoutPvalExpr]]. Must agree byte-for-byte with the
    * per-row forms above (pinned in `MonthLayoutSpec`). */
  def pvalColumn(c: Column, dt: DataType): Column = (kind, dt) match {
    // date_format on DATE is timezone-free (a date has no instant)
    case ("years", DateType) => date_format(c, "yyyy")
    case ("months", DateType) => date_format(c, "yyyy-MM")
    case ("days", DateType) => date_format(c, "yyyy-MM-dd")
    case (k, TimestampType) if timeKinds(k) =>
      // SESSION-INDEPENDENT zone projection: from_utc_timestamp shifts
      // the instant's micros by the PINNED zone's offset at that instant
      // (JDK zone rules, DST-correct); the shifted micros then read as
      // wall-clock fields via pure epoch arithmetic — floor-div to an
      // epoch day, date_add onto a DATE (zone-free), date_format on the
      // DATE (zone-free). Nothing in the chain consults the session
      // zone, so a reader in any zone computes the writer's pval. The
      // division is exact: the numerator is a multiple of the divisor
      // and DOUBLE holds it exactly through year ~2250 (< 2^53 micros).
      val m = unix_micros(from_utc_timestamp(c, zoneId.getId))
      val day = ((m - pmod(m, lit(86400000000L))) / lit(86400000000L)).cast("int")
      val d = date_add(to_date(lit("1970-01-01")), day)
      kind match {
        case "years" => date_format(d, "yyyy")
        case "months" => date_format(d, "yyyy-MM")
        case "days" => date_format(d, "yyyy-MM-dd")
        case "hours" =>
          val h = pmod(((m - pmod(m, lit(3600000000L))) / lit(3600000000L))
            .cast("long"), lit(24L))
          concat(date_format(d, "yyyy-MM-dd"), lit("-"),
            lpad(h.cast("string"), 2, "0"))
      }
    case (k, StringType) if timeKinds(k) && k != "hours" =>
      substring(c, 1, isoLen)
    case ("truncate", LongType | IntegerType) =>
      (c.cast("long") - pmod(c.cast("long"), lit(width.toLong))).cast("string")
    case ("truncate", StringType) => substring(c, 1, width)
    case (k, t) => throw new UnsupportedOperationException(
      s"transform $k over a ${t.typeName} column")
  }

  /** Fold the pushed source filters on `partCol` into one INCLUSIVE pval
    * predicate (None = no filter the transform can decide — keep all).
    * Time-kind pvals compare lexicographically (zero-padded ISO prefixes
    * order like their dates); truncate-on-integral pvals compare
    * numerically; truncate-on-string decides equality/IN only. For a
    * monotone transform T: `c >= L` keeps pvals >= T(L) (the partition
    * holding L may hold both sides of the bound — inclusive), `c = L`
    * keeps exactly T(L), conjuncts intersect. */
  def keepPredicate(partCol: String, numeric: Boolean,
      filters: Seq[org.apache.spark.sql.sources.Filter])
      : Option[String => Boolean] = {
    import org.apache.spark.sql.sources._
    // numeric compare guards against non-numeric pvals (an escaped STRING
    // pval meeting a pushed numeric literal after an implicit cast):
    // unparseable keeps the partition inclusively instead of throwing at
    // scan-planning time
    def cmp(a: String, b: String): Option[Int] =
      if (!numeric) Some(a.compareTo(b))
      else scala.util.Try(java.lang.Long.compare(a.toLong, b.toLong)).toOption
    // range pruning needs the transform MONOTONE in the raw value. Time
    // kinds are monotone except under a NAMED zone's DST fall-back (the
    // repeated wall-clock hour) — fixed offsets (UTC included) keep it;
    // truncate is monotone on integrals only (prefix strings are not).
    val ranged =
      if (timeKinds(kind))
        zone.isEmpty || zoneId.getRules.isFixedOffset
      else numeric
    val preds: Seq[String => Boolean] = filters.flatMap {
      case EqualTo(a, v) if a.equalsIgnoreCase(partCol) =>
        pvalOfLiteral(v).map(t => (p: String) => p == t)
      case In(a, vs) if a.equalsIgnoreCase(partCol) =>
        val ts = vs.toSeq.filter(_ != null).map(pvalOfLiteral)
        if (ts.forall(_.isDefined)) {
          val set = ts.flatten.toSet
          Some((p: String) => set(p))
        } else None
      case GreaterThan(a, v) if ranged && a.equalsIgnoreCase(partCol) =>
        pvalOfLiteral(v).map(t => (p: String) => cmp(p, t).forall(_ >= 0))
      case GreaterThanOrEqual(a, v) if ranged && a.equalsIgnoreCase(partCol) =>
        pvalOfLiteral(v).map(t => (p: String) => cmp(p, t).forall(_ >= 0))
      case LessThan(a, v) if ranged && a.equalsIgnoreCase(partCol) =>
        pvalOfLiteral(v).map(t => (p: String) => cmp(p, t).forall(_ <= 0))
      case LessThanOrEqual(a, v) if ranged && a.equalsIgnoreCase(partCol) =>
        pvalOfLiteral(v).map(t => (p: String) => cmp(p, t).forall(_ <= 0))
      case _ => None // inclusive: undecidable filter shapes prune nothing
    }
    if (preds.isEmpty) None else Some(p => preds.forall(_(p)))
  }
}

object GraftTransform {
  val timeKinds: Set[String] = Set("years", "months", "days", "hours")

  /** Normalize the SQL transform name (`month(c)` and `months(c)` both
    * arrive from the parser, as ApplyTransform and MonthsTransform). */
  def normalizeKind(name: String): Option[String] = name.toLowerCase match {
    case "year" | "years" => Some("years")
    case "month" | "months" => Some("months")
    case "day" | "days" | "date" => Some("days")
    case "hour" | "hours" => Some("hours")
    case "truncate" => Some("truncate")
    case _ => None
  }

  /** The table's transform layout from its properties, if stamped. */
  def fromProps(props: Map[String, String]): Option[GraftTransform] =
    props.get("transform.kind").map(k =>
      GraftTransform(k, props.get("transform.width").map(_.toInt).getOrElse(0),
        props.getOrElse("transform.zone", "")))

  /** Source-column types a kind accepts (refused at CREATE otherwise).
    * TIMESTAMP sources additionally need a pinned zone stamped at CREATE
    * (`transform.zone`, default UTC); `hours` is TIMESTAMP-only — an
    * hour is not a property of a DATE or an ISO date string. */
  def accepts(kind: String, dt: DataType): Boolean = kind match {
    case "hours" => dt == TimestampType
    case k if timeKinds(k) =>
      dt == DateType || dt == StringType || dt == TimestampType
    case "truncate" => dt == LongType || dt == IntegerType || dt == StringType
    case _ => false
  }
}

/** One field of a MULTI-FIELD partition spec ([[GraftSpec]]). Multi-spec
  * sources are DATE (time transforms), BIGINT/INT (identity, bucket,
  * truncate), and STRING (identity, truncate) — STRING component values
  * are ESCAPED into `[A-Za-z0-9._-]` ([[GraftSpec.escapeComponent]]) so
  * they can never contain the composite separator, the era prefix's
  * syntax, or a character Spark's partition-path escaping would rewrite
  * (the directory name must equal the manifest pval byte-for-byte). */
sealed trait GraftField {
  def col: String
  /** Serialized form, e.g. `months(o_orderdate)` / `bucket(8,o_custkey)`. */
  def ser: String
  /** The component as a Column over the raw source column. */
  def pvalColumn(c: org.apache.spark.sql.Column, dt: DataType)
      : org.apache.spark.sql.Column
  /** Executor-side per-row component (value already read per `dt`). */
  def pvalOf(dt: DataType, longVal: => Long, dateDays: => Int,
      strVal: => String): String
  /** Pushed filters on this field's source column folded into one
    * inclusive component predicate. */
  def keep(filters: Seq[org.apache.spark.sql.sources.Filter])
      : Option[String => Boolean]
}

final case class IdentityField(col: String) extends GraftField {
  def ser = s"identity($col)"
  def pvalColumn(c: org.apache.spark.sql.Column, dt: DataType) = dt match {
    case StringType => GraftSpec.escapeComponentCol(c)
    case _ => c.cast("string")
  }
  def pvalOf(dt: DataType, longVal: => Long, dateDays: => Int,
      strVal: => String): String =
    dt match {
      case DateType => LocalDate.ofEpochDay(dateDays.toLong).toString
      case StringType => GraftSpec.escapeComponent(strVal)
      case _ => longVal.toString
    }
  def keep(filters: Seq[org.apache.spark.sql.sources.Filter]) = {
    import org.apache.spark.sql.sources._
    def lit(v: Any): Option[Long] = v match {
      case l: java.lang.Long => Some(l)
      case i: java.lang.Integer => Some(i.toLong)
      case _ => None
    }
    def num(p: String): Option[Long] =
      scala.util.Try(p.toLong).toOption
    // STRING identity components: EQUALITY/IN only, compared in ESCAPED
    // space (escape is injective so x == y iff esc(x) == esc(y)); ranges
    // never prune — escaping does not preserve lexicographic order
    def slit(v: Any): Option[String] = v match {
      case s: String => Some(GraftSpec.escapeComponent(s))
      case _ => None
    }
    val preds: Seq[String => Boolean] = filters.flatMap {
      case EqualTo(a, v: String) if a.equalsIgnoreCase(col) =>
        slit(v).map(t => (p: String) => p == t)
      case In(a, vs) if a.equalsIgnoreCase(col) &&
          vs.forall(v => v == null || v.isInstanceOf[String]) =>
        val set = vs.toSeq.filter(_ != null).flatMap(slit).toSet
        Some((p: String) => set(p))
      // numeric pvals parse defensively: a pushed numeric literal can
      // reach a STRING identity field through an implicit cast, and the
      // escaped pvals then don't parse — keep inclusively, never throw
      // at scan-planning time
      case EqualTo(a, v) if a.equalsIgnoreCase(col) =>
        lit(v).map(t => (p: String) => num(p).forall(_ == t))
      case In(a, vs) if a.equalsIgnoreCase(col) =>
        val ts = vs.toSeq.filter(_ != null).map(lit)
        if (ts.forall(_.isDefined)) {
          val set = ts.flatten.toSet
          Some((p: String) => num(p).forall(set))
        } else None
      case GreaterThan(a, v) if a.equalsIgnoreCase(col) =>
        lit(v).map(t => (p: String) => num(p).forall(_ > t))
      case GreaterThanOrEqual(a, v) if a.equalsIgnoreCase(col) =>
        lit(v).map(t => (p: String) => num(p).forall(_ >= t))
      case LessThan(a, v) if a.equalsIgnoreCase(col) =>
        lit(v).map(t => (p: String) => num(p).forall(_ < t))
      case LessThanOrEqual(a, v) if a.equalsIgnoreCase(col) =>
        lit(v).map(t => (p: String) => num(p).forall(_ <= t))
      case _ => None
    }
    if (preds.isEmpty) None else Some(p => preds.forall(_(p)))
  }
}

/** A time transform inside a multi-field spec. DATE sources are
  * zone-free (`zone` empty); TIMESTAMP sources carry the table-pinned
  * projection zone IN THE FIELD ITSELF, serialized as `kind(col@zone)`
  * — so the era history (`spec.hist.<id>`) preserves the WRITER's zone
  * and pre-evolution pruning projects literals exactly as the writer
  * did, whatever the current spec or session zone says. */
final case class TimeField(kind: String, col: String, zone: String = "")
    extends GraftField {
  private val t = GraftTransform(kind, 0, zone)
  def ser = if (zone.isEmpty) s"$kind($col)" else s"$kind($col@$zone)"
  def pvalColumn(c: org.apache.spark.sql.Column, dt: DataType) = t.pvalColumn(c, dt)
  def pvalOf(dt: DataType, longVal: => Long, dateDays: => Int,
      strVal: => String): String =
    dt match {
      case TimestampType => t.pvalOfMicros(longVal)
      case _ => t.pvalOfDays(dateDays)
    }
  def keep(filters: Seq[org.apache.spark.sql.sources.Filter]) =
    t.keepPredicate(col, numeric = false, filters)
}

final case class BucketField(n: Int, col: String) extends GraftField {
  def ser = s"bucket($n,$col)"
  def pvalColumn(c: org.apache.spark.sql.Column, dt: DataType) =
    GraftBucketFunction.idExpr(n, c)
  def pvalOf(dt: DataType, longVal: => Long, dateDays: => Int,
      strVal: => String): String =
    GraftBucketFunction.idOf(n, longVal).toString
  def keep(filters: Seq[org.apache.spark.sql.sources.Filter]) = {
    import org.apache.spark.sql.sources._
    val sets = filters.collect {
      case EqualTo(a, v: java.lang.Long) if a.equalsIgnoreCase(col) =>
        Set(GraftBucketFunction.idOf(n, v).toString)
      case In(a, vs) if a.equalsIgnoreCase(col) &&
          vs.forall(_.isInstanceOf[java.lang.Long]) =>
        vs.map(v => GraftBucketFunction
          .idOf(n, v.asInstanceOf[java.lang.Long]).toString).toSet
    }
    if (sets.isEmpty) None
    else { val s = sets.reduce(_ intersect _); Some(p => s(p)) }
  }
}

final case class TruncField(width: Int, col: String) extends GraftField {
  private val t = GraftTransform("truncate", width)
  def ser = s"truncate($width,$col)"
  def pvalColumn(c: org.apache.spark.sql.Column, dt: DataType) = dt match {
    // STRING truncate: the component is the ESCAPED prefix — truncate
    // FIRST (prefix semantics are over the raw value's characters), then
    // escape for separator/path safety
    case StringType => GraftSpec.escapeComponentCol(t.pvalColumn(c, dt))
    case _ => t.pvalColumn(c, dt)
  }
  def pvalOf(dt: DataType, longVal: => Long, dateDays: => Int,
      strVal: => String): String = dt match {
    case StringType => GraftSpec.escapeComponent(t.pvalOfString(strVal))
    case _ => t.pvalOfLong(longVal)
  }
  def keep(filters: Seq[org.apache.spark.sql.sources.Filter]) = {
    import org.apache.spark.sql.sources._
    // STRING truncate components: equality/IN prune via the escaped
    // truncated literal (same injectivity argument as IdentityField);
    // string RANGES never prune (escaping breaks lexicographic order).
    // Any string literal on this column routes the whole fold here —
    // the numeric machinery would compare unescaped prefixes (or throw
    // on toLong) against escaped pvals and could prune WRONGLY.
    def isStr(v: Any) = v.isInstanceOf[String]
    val hasStr = filters.exists {
      case EqualTo(a, v) if a.equalsIgnoreCase(col) => isStr(v)
      case In(a, vs) if a.equalsIgnoreCase(col) => vs.exists(isStr)
      case GreaterThan(a, v) if a.equalsIgnoreCase(col) => isStr(v)
      case GreaterThanOrEqual(a, v) if a.equalsIgnoreCase(col) => isStr(v)
      case LessThan(a, v) if a.equalsIgnoreCase(col) => isStr(v)
      case LessThanOrEqual(a, v) if a.equalsIgnoreCase(col) => isStr(v)
      case _ => false
    }
    if (!hasStr) t.keepPredicate(col, numeric = true, filters)
    else {
      def slit(v: Any): Option[String] = v match {
        case s: String => Some(GraftSpec.escapeComponent(t.pvalOfString(s)))
        case _ => None
      }
      val strPreds: Seq[String => Boolean] = filters.flatMap {
        case EqualTo(a, v: String) if a.equalsIgnoreCase(col) =>
          slit(v).map(t0 => (p: String) => p == t0)
        case In(a, vs) if a.equalsIgnoreCase(col) && vs.nonEmpty &&
            vs.forall(v => v == null || v.isInstanceOf[String]) =>
          val set = vs.toSeq.filter(_ != null).flatMap(slit).toSet
          Some((p: String) => set(p))
        case _ => None
      }
      if (strPreds.isEmpty) None else Some(p => strPreds.forall(_(p)))
    }
  }
}

/** A MULTI-FIELD partition spec — Iceberg-style
  * `PARTITIONED BY (months(ts), bucket(16, key))` with CONJUNCTIVE
  * pruning across the fields and SPEC EVOLUTION:
  *
  *   - Composite pvals are SELF-DESCRIBING: `s<id>.<c1>~<c2>` — the
  *     prefix names the spec the entry was written under, so one
  *     manifest can mix eras (evolution rewrites nothing; old entries
  *     keep their old layout forever, exactly the HiddenPartition
  *     demo's contract, now first-class in the catalog).
  *   - Pruning is INCLUSIVE per entry: an entry whose pval carries this
  *     spec's prefix is kept iff every field's component predicate
  *     keeps it; an entry under another spec is decided by THAT spec's
  *     machinery (the legacy single-field properties for pre-evolution
  *     entries) and never by this one.
  *   - `~` and the `s<id>.` prefix are path- and escape-safe because
  *     DATE/BIGINT/INT components never contain them and STRING
  *     components are ESCAPED into `[A-Za-z0-9._-]`
  *     ([[GraftSpec.escapeComponent]]) — injective, so equality pruning
  *     compares escaped literals; ranges on string fields never prune
  *     THROUGH PVALS (escaping breaks lexicographic order — inclusive,
  *     row-level re-filter as always). File-grained range skipping for
  *     string spec fields comes from the RAW min/max sidecars instead
  *     (`v<N>.sstats.<col>`, auto-indexed by the commit path — see
  *     `ManifestSidecars.refreshSStats`). */
final case class GraftSpec(id: Int, fields: Seq[GraftField]) {
  // one field is legal THROUGH EVOLUTION (a table can evolve multi ->
  // single); CREATE routes single transforms through the legacy layout
  require(fields.nonEmpty, "a spec needs at least one field")
  val prefix: String = s"s$id."
  def ser: String = fields.map(_.ser).mkString(",")

  /** The composite pval as a Column over the source columns. */
  def pvalColumn(schema: org.apache.spark.sql.types.StructType)
      : org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions.{col, concat, concat_ws, lit}
    val comps = fields.map { f =>
      val dt = schema.fields.find(_.name.equalsIgnoreCase(f.col)).map(_.dataType)
        .getOrElse(throw new IllegalStateException(
          s"spec field ${f.ser}: source column not in schema"))
      f.pvalColumn(col(f.col), dt).cast("string")
    }
    concat(lit(prefix), concat_ws("~", comps: _*))
  }

  /** Pushed filters folded into one inclusive predicate over this
    * spec's STRIPPED composite (prefix already matched by the caller's
    * per-era dispatch): every field's component predicate must keep. */
  def componentKeep(filters: Seq[org.apache.spark.sql.sources.Filter])
      : String => Boolean = {
    val comps = fields.map(_.keep(filters))
    (stripped: String) => {
      // -1 keeps trailing empties: an escaped STRING component can be ""
      val parts = stripped.split("~", -1)
      if (parts.length != fields.size) true // malformed: inclusive
      else comps.zip(parts).forall { case (k, p) => k.forall(_(p)) }
    }
  }
}

object GraftSpec {
  private val FieldRe = """(\w+)\(([^)]*)\)""".r

  def parseField(s: String): GraftField = s.trim match {
    case FieldRe("identity", c) => IdentityField(c.trim)
    case FieldRe("bucket", args) =>
      val Array(n, c) = args.split(",").map(_.trim)
      BucketField(n.toInt, c)
    case FieldRe("truncate", args) =>
      val Array(w, c) = args.split(",").map(_.trim)
      TruncField(w.toInt, c)
    case FieldRe(k, c) if GraftTransform.normalizeKind(k).exists(
        GraftTransform.timeKinds) =>
      // `hours(ts@Zone)`: a TIMESTAMP source's pinned projection zone
      // rides in the serialized field (column names are plain
      // identifiers — the first '@' is the split)
      val kind = GraftTransform.normalizeKind(k).get
      c.indexOf('@') match {
        case -1 => TimeField(kind, c.trim)
        case i => TimeField(kind, c.substring(0, i).trim,
          c.substring(i + 1).trim)
      }
    case other => throw new IllegalArgumentException(
      s"unparseable spec field '$other'")
  }

  /** Parse `months(a),bucket(8,b)` (the `spec.fields` property form). */
  def parse(id: Int, s: String): GraftSpec =
    GraftSpec(id, s.split("\\),").map(p =>
      parseField(if (p.endsWith(")")) p else p + ")")).toSeq)

  def fromProps(props: Map[String, String]): Option[GraftSpec] =
    props.get("spec.fields").map(s =>
      parse(props.get("spec.id").map(_.toInt).getOrElse(1), s))

  /** Superseded multi-field specs (`spec.hist.<id>` properties) — old
    * entries keep their era's layout forever; pruning dispatches each
    * entry to the spec that wrote it by the `s<id>.` prefix. */
  def history(props: Map[String, String]): Map[Int, GraftSpec] =
    props.collect { case (k, v) if k.startsWith("spec.hist.") =>
      val i = k.stripPrefix("spec.hist.").toInt
      i -> parse(i, v)
    }

  private val PrefixRe = """s(\d+)\.(.*)""".r

  /** One inclusive keep over FULL pvals of a (possibly evolved) spec
    * table: `s<id>.` entries test against that era's spec (unknown id —
    * inclusive); bare entries are PRE-multi-evolution and go to
    * `legacy` (the single-field machinery whose properties the
    * evolution left in place). */
  def keepAcrossEras(current: GraftSpec, hist: Map[Int, GraftSpec],
      filters: Seq[org.apache.spark.sql.sources.Filter],
      legacy: String => Boolean): String => Boolean = {
    val keeps: Map[Int, String => Boolean] =
      (hist + (current.id -> current)).map { case (i, sp) =>
        i -> sp.componentKeep(filters)
      }
    (pval: String) => pval match {
      case PrefixRe(id, stripped) =>
        keeps.get(id.toInt).map(_(stripped)).getOrElse(true)
      case p => legacy(p)
    }
  }

  /** Multi-spec source types: DATE or TIMESTAMP for time fields (a
    * TIMESTAMP source needs the table-pinned zone stamped into the
    * field — `hours` is TIMESTAMP-only, an hour is not a property of a
    * DATE); BIGINT/INT/STRING for identity/truncate (STRING components
    * are escaped — see [[escapeComponent]]); BIGINT for bucket. */
  def accepts(f: GraftField, dt: DataType): Boolean = f match {
    case tf: TimeField if tf.kind == "hours" => dt == TimestampType
    case _: TimeField => dt == DateType || dt == TimestampType
    case _: BucketField => dt == LongType
    case _: IdentityField | _: TruncField =>
      dt == LongType || dt == IntegerType || dt == StringType
  }

  /** Escape a STRING component value into the alphabet `[A-Za-z0-9._-]`
    * with `.XX` (uppercase-hex UTF-8 byte) escapes. Three properties the
    * spec machinery needs, none of which raw strings give:
    *
    *   1. NO `~` and no `%` — the composite separator stays unambiguous
    *      and Spark's Hive-style partition-path escaping (which rewrites
    *      `%`, `*`, `/`, `=`, … but none of this alphabet) leaves the
    *      directory name EQUAL to the manifest pval byte-for-byte, so
    *      path-derived pvals ([[ManifestTable.filePvalExpr]]) and
    *      layout-computed pvals agree.
    *   2. INJECTIVE — equality/IN pruning compares escaped literals.
    *   3. One definition, two forms: this per-row form and the Column
    *      form ([[escapeComponentCol]]) are both `java.net.URLEncoder`
    *      (UTF-8) plus the same four fix-up substitutions, so the write
    *      path, the verbs' rewrites, and the prune probes can never
    *      disagree (agreement pinned byte-for-byte in SpecEvolutionSpec).
    *
    * The fix-ups after url-encoding: original `.` → `%2E` (the dot
    * becomes the escape intro, so a literal dot must round-trip through
    * it), `*` → `%2A` and `+` (url-encoded space) → `%20` (both rewritten
    * by partition-path escaping), then every `%` → `.` (percent is
    * rewritten too; dot is not). */
  def escapeComponent(s: String): String =
    java.net.URLEncoder.encode(s, "UTF-8")
      .replace(".", "%2E")
      .replace("*", "%2A")
      .replace("+", "%20")
      .replace("%", ".")

  /** The Column twin of [[escapeComponent]] — `url_encode` is
    * `java.net.URLEncoder` under the hood, so both forms agree
    * byte-for-byte. */
  def escapeComponentCol(c: Column): Column = {
    import org.apache.spark.sql.functions.{replace => repl, url_encode, lit => l}
    repl(repl(repl(repl(url_encode(c),
      l("."), l("%2E")), l("*"), l("%2A")), l("+"), l("%20")), l("%"), l("."))
  }

  /** Inverse of [[escapeComponent]] (diagnostics/tests only — the scan
    * never reconstructs raw values from pvals; the raw column lives in
    * the data files). */
  def unescapeComponent(p: String): String =
    java.net.URLDecoder.decode(p.replace(".", "%"), "UTF-8")
}
