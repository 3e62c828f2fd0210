package graft.ingest

import java.net.{URLDecoder, URLEncoder}
import java.nio.charset.StandardCharsets
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName
import org.apache.parquet.schema.LogicalTypeAnnotation

/** Per-file column statistics carried on the snapshot log's ADD lines —
  * the Delta `stats` analog that turns file skipping into a LOG read
  * instead of a footer read per file.
  *
  * Collected once at publish (one footer open per newly-added file, driver
  * side, O(files-per-commit)); stored as a single tab-free token on the ADD
  * line; consumed by [[Snapshots.read]]'s `dataFilter` and by [[Merge]]'s
  * affected-file discovery. At 100 TB the difference is planning a narrow
  * merge or a filtered read over the handful of stats-overlapping files
  * instead of opening every footer (or scanning every file) of the table.
  *
  * Only top-level primitive columns are recorded (nested stats don't help
  * top-level predicates); strings are recorded as-is (parquet-mr already
  * bounds statistics size), numerics as longs/doubles, date as epoch days,
  * timestamps as micros — the same physical representations parquet stats
  * use, so no precision is invented.
  */
object FileStats {

  /** One column's [min,max] over a file. `typ` ∈ long | double | string. */
  case class ColStats(typ: String, min: String, max: String)

  /** `schema`: every top-level column's physical type tag (parquet
    * primitive + logical annotation, e.g. `INT64/TIMESTAMP(MICROS,true)`),
    * in file order — including columns with no usable [min,max]. Empty for
    * pre-schema tokens. Enforcement compares tags for shared names.
    * `nulls`: per-column null counts (absent = unknown) — they answer
    * IS [NOT] NULL skipping and let comparisons prune all-null files,
    * which min/max alone cannot see.
    * `blooms`: per-column split-block bloom bitsets (one per row group
    * that couldn't merge; a value may be in the file iff ANY bitset says
    * maybe). Present only for columns whose WRITER opted in via
    * [[bloomWriteOptions]] — they answer point lookups on
    * high-cardinality keys where [min,max] on a non-clustered file spans
    * everything. */
  /** One column's bloom state: `tag` records the PHYSICAL plain encoding
    * the writer hashed (`s` = UTF-8 string bytes, `i32`/`i64` = 4/8-byte
    * little-endian ints), so the probe side reproduces the exact hash —
    * an INT32 file and an INT64 file of the same width-mixed column carry
    * different tags and each probes correctly. */
  case class BloomCol(tag: String, bitsets: Seq[Array[Byte]])

  /** One column's complete dictionary: when EVERY page of the column is
    * dictionary-encoded, the dictionary IS the file's exact value set —
    * parquet writers omit the bloom filter precisely then, and exact
    * membership beats any bloom. Only small dictionaries ride the log
    * ([[MaxDictValues]]); `tag` as in [[BloomCol]], values canonical
    * (longs in decimal, strings raw). */
  case class DictCol(tag: String, values: Set[String])

  /** Pointer to a SIDECAR bloom file (warehouse-relative path): blooms
    * past [[MaxBloomLogBytes]] don't fit a log line — production-size
    * files need ~1.2 MB of bitset for a 1M-NDV key at 1% fpp — so the
    * bitsets ride the commit as their own staged file and the ADD line
    * carries this pointer. Loaded (and cached) only for files that
    * survive the cheap log-side pruning AND whose predicate has an
    * equality leaf on the column. */
  case class BloomRef(tag: String, path: String)

  /** `bytes`: the file's on-disk size recorded at collect time (-1 =
    * unknown / pre-size token). One token on the ADD line saves a
    * per-file `getFileStatus` RPC everywhere sizes matter — byte-limited
    * streaming admission, compaction candidate selection, DESCRIBE
    * DETAIL — which at 100 TB is the difference between a driver log walk
    * and a driver metadata storm. */
  case class Stats(rows: Long, cols: Map[String, ColStats],
                   schema: Seq[(String, String)] = Nil,
                   nulls: Map[String, Long] = Map.empty,
                   blooms: Map[String, BloomCol] = Map.empty,
                   dicts: Map[String, DictCol] = Map.empty,
                   bloomRefs: Map[String, BloomRef] = Map.empty,
                   bytes: Long = -1L)

  // ---------------------------------------------------------------- encode

  private def enc(s: String) = URLEncoder.encode(s, "UTF-8")
  private def dec(s: String) = URLDecoder.decode(s, "UTF-8")

  /** Token format version. v2 marks stats collected with unit-correct
    * timestamps (MILLIS→micros, NANOS/DECIMAL/TIME/unsigned refused) and
    * UTF-8-ordered string folding; tokens WITHOUT the marker were
    * collected by the earlier collector whose values can sit in the wrong
    * unit/order — [[decode]] strips their hazardous entries so a legacy
    * log can never prune a file on a wrong-unit bound. Rolling-upgrade
    * rule (the standard log-format protocol stance): upgrade READERS
    * before writers — a pre-v2 reader sees a v2 token as unparseable and
    * falls back to no stats for that file, which is correct but unpruned. */
  private val TokenVersion = "v:2"

  /** Single-line, tab-free token: `rows=N|v:2|s:name,tag|…|name,typ,min,max|…`
    * with URL-encoded names/tags/values so arbitrary strings survive.
    * `s:` parts carry the file's full top-level schema; the rest are
    * per-column [min,max]. */
  def encode(s: Stats): String =
    (Seq(s"rows=${s.rows}", TokenVersion) ++
      (if (s.bytes >= 0) Seq(s"z:${s.bytes}") else Nil) ++
      (s.schema.map { case (n, t) => s"s:${enc(n)},${enc(t)}" } ++
        s.nulls.toSeq.sortBy(_._1).map { case (n, c) => s"n:${enc(n)},$c" } ++
        s.blooms.toSeq.sortBy(_._1).flatMap { case (n, bc) =>
          bc.bitsets.map(b =>
            s"b:${enc(n)},${bc.tag}," +
              java.util.Base64.getEncoder.encodeToString(b))
        } ++
        s.dicts.toSeq.sortBy(_._1).map { case (n, dc) =>
          (s"d:${enc(n)},${dc.tag}" +: dc.values.toSeq.sorted.map(enc))
            .mkString(",")
        } ++
        s.bloomRefs.toSeq.sortBy(_._1).map { case (n, r) =>
          s"B:${enc(n)},${r.tag},${enc(r.path)}"
        } ++
        s.cols.toSeq.sortBy(_._1).map { case (n, c) =>
          s"${enc(n)},${c.typ},${enc(c.min)},${enc(c.max)}"
        })).mkString("|")

  /** None for a missing/unparseable token (pre-stats log entries). */
  def decode(token: String): Option[Stats] =
    if (token == null || token.isEmpty || !token.startsWith("rows=")) None
    else try {
      val parts = token.split("\\|").toSeq
      val rows = parts.head.stripPrefix("rows=").toLong
      val v2 = parts.tail.contains(TokenVersion)
      val meta = parts.tail.filterNot(_ == TokenVersion)
      val schema = meta.filter(_.startsWith("s:")).map { p =>
        val Array(n, t) = p.stripPrefix("s:").split(",", 2)
        dec(n) -> dec(t)
      }
      val nulls = meta.filter(_.startsWith("n:")).map { p =>
        val Array(n, c) = p.stripPrefix("n:").split(",", 2)
        dec(n) -> c.toLong
      }.toMap
      val blooms = meta.filter(_.startsWith("b:")).map { p =>
        val Array(n, tag, b64) = p.stripPrefix("b:").split(",", 3)
        (dec(n), tag, java.util.Base64.getDecoder.decode(b64))
      }.groupBy(_._1).map { case (n, xs) =>
        n -> BloomCol(xs.head._2, xs.map(_._3))
      }
      val dicts = meta.filter(_.startsWith("d:")).map { p =>
        val parts = p.stripPrefix("d:").split(",", -1)
        dec(parts(0)) -> DictCol(parts(1), parts.drop(2).map(dec).toSet)
      }.toMap
      val bloomRefs = meta.filter(_.startsWith("B:")).map { p =>
        val Array(n, tag, path) = p.stripPrefix("B:").split(",", 3)
        dec(n) -> BloomRef(tag, dec(path))
      }.toMap
      val bytes = meta.find(_.startsWith("z:"))
        .flatMap(_.stripPrefix("z:").toLongOption).getOrElse(-1L)
      val cols = meta.filterNot(p =>
          p.startsWith("s:") || p.startsWith("n:") || p.startsWith("b:") ||
            p.startsWith("d:") || p.startsWith("B:") || p.startsWith("z:"))
        .map { p =>
          val Array(n, t, mn, mx) = p.split(",", 4)
          dec(n) -> ColStats(t, dec(mn), dec(mx))
        }.toMap
      Some(Stats(rows, if (v2) cols else legacySafe(cols, schema), schema,
        nulls, blooms, dicts, bloomRefs, bytes))
    } catch { case _: RuntimeException => None }

  /** Strip the entries a pre-v2 collector may have recorded unsoundly:
    * long bounds on MILLIS/NANOS timestamps (raw units vs the micros the
    * query side compares in), DECIMAL (unscaled), TIME, and unsigned ints
    * (signed wraparound) — and ALL string bounds (folded in UTF-16 order,
    * which can pick non-extreme values for supplementary-plane text). A
    * long column without a schema tag is unidentifiable → also dropped.
    * Absent stats never skip, so legacy tables lose some pruning but can
    * never lose rows. */
  private def legacySafe(cols: Map[String, ColStats],
                         schema: Seq[(String, String)]): Map[String, ColStats] = {
    val tags = schema.toMap
    cols.filter {
      case (_, ColStats("double", _, _)) => true
      case (_, ColStats("string", _, _)) => false
      case (n, _) => tags.get(n).exists(tag =>
        !(tag.contains("TIMESTAMP(MILLIS") || tag.contains("TIMESTAMP(NANOS") ||
          tag.contains("DECIMAL(") || tag.contains("TIME(") ||
          tag.matches(".*INT\\(\\d+,false\\).*")))
    }
  }

  /** Per-column cap on bloom bytes embedded in a log token. Blooms above
    * it are dropped (never truncated — a truncated bloom false-negatives).
    * Writers size their blooms via [[bloomWriteOptions]]' `ndv`; filters
    * meant to exceed this belong in sidecar index files, not log lines —
    * the default keeps a worst-case ADD line under ~100 KB of base64,
    * which the checkpoint fold amortizes across reads. */
  val MaxBloomLogBytes: Long =
    sys.props.get("graft.bloom.maxLogBytes").map(_.toLong).getOrElse(65536L)

  /** Cap on a column's bloom bytes written to a SIDECAR file when they
    * exceed [[MaxBloomLogBytes]] — covers ~6M NDV at 1% fpp, beyond any
    * sane per-file cardinality. Past this, no bloom is recorded at all. */
  val MaxBloomSidecarBytes: Long =
    sys.props.get("graft.bloom.maxSidecarBytes").map(_.toLong)
      .getOrElse(8L * 1024 * 1024)

  /** Cap on dictionary values embedded per column per file. Dictionaries
    * are lifted only off FULLY dictionary-encoded columns (writers omit
    * blooms exactly then), so low-cardinality key columns get exact
    * membership for free — no write-side opt-in needed. */
  val MaxDictValues: Int =
    sys.props.get("graft.dict.maxValues").map(_.toInt).getOrElse(64)

  /** DataFrameWriter options enabling parquet's native split-block bloom
    * filters on `cols` — the executors hash values during the normal
    * write, [[collect]] then lifts the finished bitsets off the footer at
    * the commit point (driver reads bloom BYTES, never data). `ndv` sizes
    * the filter (parquet rounds `optimalNumOfBits(ndv, fpp)` up to a
    * power of two); keep the result under [[MaxBloomLogBytes]] or the
    * bloom stays in the file but off the log line. */
  def bloomWriteOptions(cols: Seq[String], ndv: Long = 25000L,
                        fpp: Double = 0.01): Map[String, String] =
    cols.flatMap(c => Seq(
      s"parquet.bloom.filter.enabled#$c" -> "true",
      s"parquet.bloom.filter.expected.ndv#$c" -> ndv.toString,
      s"parquet.bloom.filter.fpp#$c" -> fpp.toString)).toMap

  // --------------------------------------------------------------- collect

  /** Read one parquet footer and fold its row groups into per-column
    * [min,max]. Columns without usable stats (nested, INT96, undecodable)
    * are simply absent — absent means "never skip on this column".
    * Returns "" for unreadable/non-parquet files (the caller stores an
    * empty stats field; readers keep the file). */
  def collect(conf: Configuration, file: Path): String =
    collect(conf, file, (_, _, _) => None)

  /** As [[collect]], with a sidecar escape hatch: a column whose bloom
    * bitsets exceed [[MaxBloomLogBytes]] (but fit
    * [[MaxBloomSidecarBytes]]) is offered to `spill(col, tag, bitsets)`;
    * a returned warehouse-relative path becomes a pointer entry on the
    * log line instead of the payload. [[TxnCommit.commit]] spills into
    * the commit's staging dir so the sidecar publishes atomically with
    * the data (manifest moves) — a crash before the commit point leaves
    * only reclaimable staging. */
  def collect(conf: Configuration, file: Path,
              spill: (String, String, Seq[Array[Byte]]) => Option[String])
      : String =
    try {
      // fromPath stats the file anyway — the length rides along for free.
      val inputFile = HadoopInputFile.fromPath(file, conf)
      val fileBytes = inputFile.getLength
      val reader = ParquetFileReader.open(inputFile)
      try {
        val md = reader.getFooter
        // Full top-level schema (file order): the log-side source of truth
        // for schema enforcement and footer-free schema reads. Nested
        // columns get a structural tag from their parquet repr.
        val schemaTags: Seq[(String, String)] =
          md.getFileMetaData.getSchema.getFields.toArray.toSeq
            .map(_.asInstanceOf[org.apache.parquet.schema.Type]).map { f =>
              val tag =
                if (f.isPrimitive) {
                  val p = f.asPrimitiveType()
                  p.getPrimitiveTypeName.toString +
                    Option(p.getLogicalTypeAnnotation).map("/" + _.toString).getOrElse("")
                } else f.toString.replaceAll("\\s+", " ") // nested: structural
              f.getName -> tag
            }
        var rows = 0L
        // (typ, min, max) per column; None marks a column seen without
        // usable stats in some block — then skipping on it would be unsound.
        val acc = scala.collection.mutable.LinkedHashMap
          .empty[String, Option[(String, String, String)]]
        // Null counts: Some(total) while every block reports one; None
        // (unknown) the moment any block doesn't.
        val nullAcc = scala.collection.mutable.LinkedHashMap
          .empty[String, Option[Long]]
        // Bloom bitsets: Some(list) while EVERY block has one for the
        // column (a bloom-less block could hold the probed value, so a
        // partial bloom would prune unsoundly); blocks whose filters can
        // union in place merge, incompatible sizes stay separate and are
        // probed with OR. Only types whose plain encoding the probe side
        // can reproduce exactly (see [[bloomTag]]) — a wrong-width probe
        // hash would false-negative, i.e. prune a file that holds the key.
        val bloomAcc = scala.collection.mutable.LinkedHashMap
          .empty[String, Option[List[
            org.apache.parquet.column.values.bloomfilter.BloomFilter]]]
        val bloomTags = scala.collection.mutable.LinkedHashMap
          .empty[String, String]
        // Complete dictionaries: valid only while EVERY block's pages are
        // all dictionary-encoded (a plain-encoded page could hold values
        // outside the dictionary — membership would be unsound) and the
        // union stays small. No writer opt-in: parquet dictionary-encodes
        // low-cardinality columns by default.
        val dictAcc = scala.collection.mutable.LinkedHashMap
          .empty[String, Option[Set[String]]]
        md.getBlocks.forEach { b =>
          rows += b.getRowCount
          lazy val bloomReader = reader.getBloomFilterDataReader(b)
          b.getColumns.forEach { c =>
            if (c.getPath.size == 1) {
              val name = c.getPath.toDotString
              val st: org.apache.parquet.column.statistics.Statistics[_] =
                c.getStatistics
              val blockNulls: Option[Long] =
                if (st == null || !st.isNumNullsSet) None else Some(st.getNumNulls)
              nullAcc(name) = nullAcc.getOrElse(name, Some(0L))
                .flatMap(t => blockNulls.map(t + _))
              val triple: Option[(String, String, String)] =
                if (st == null || st.isEmpty || !st.hasNonNullValue) None
                else typedMinMax(c.getPrimitiveType.getPrimitiveTypeName,
                  c.getPrimitiveType.getLogicalTypeAnnotation, st)
              acc.get(name) match {
                case None => acc(name) = triple
                case Some(None) => () // already unusable
                case Some(Some((t0, mn0, mx0))) =>
                  acc(name) = triple.collect {
                    case (t, mn, mx) if t == t0 =>
                      (t0, minOf(t0, mn0, mn), maxOf(t0, mx0, mx))
                  }
              }
              val tag = bloomTag(c.getPrimitiveType)
              val blockBloom =
                if (tag.nonEmpty && c.getBloomFilterOffset >= 0)
                  Option(bloomReader.readBloomFilter(c))
                else None
              if (tag.nonEmpty) bloomTags(name) = tag
              bloomAcc(name) = bloomAcc.getOrElse(name, Some(Nil)).flatMap {
                have =>
                  blockBloom.map { bf =>
                    have.find(_.canMergeFrom(bf)) match {
                      case Some(target) => target.merge(bf); have
                      case None => bf :: have
                    }
                  }
              }
            }
          }
        }
        // Second pass, row-group cursor order (the public dictionary API
        // is cursor-driven): lift complete dictionaries.
        md.getBlocks.forEach { b =>
          val store = reader.getNextDictionaryReader()
          b.getColumns.forEach { c =>
            if (c.getPath.size == 1) {
              val name = c.getPath.toDotString
              val tag = bloomTag(c.getPrimitiveType)
              val es = c.getEncodingStats
              val blockDict: Option[Set[String]] =
                if (tag.isEmpty || es == null ||
                    es.hasNonDictionaryEncodedPages ||
                    !es.hasDictionaryEncodedPages) None
                else try {
                  val desc = md.getFileMetaData.getSchema
                    .getColumnDescription(c.getPath.toArray)
                  Option(store.readDictionaryPage(desc)).flatMap { page =>
                    val dict = page.getEncoding.initDictionary(desc, page)
                    val vals = (0 to dict.getMaxId).map(i => tag match {
                      case "s" => dict.decodeToBinary(i).toStringUsingUTF8
                      case "i64" => dict.decodeToLong(i).toString
                      // Decimal dictionaries store UNSCALED ints — the
                      // probe side rescales predicate values to match.
                      case t if t.startsWith("d64:") =>
                        dict.decodeToLong(i).toString
                      case t if t.startsWith("dfb:") =>
                        new java.math.BigInteger(
                          dict.decodeToBinary(i).getBytes).toString
                      case _ => dict.decodeToInt(i).toString
                    }).toSet
                    Some(vals).filter(_.size <= MaxDictValues)
                  }
                } catch { case scala.util.control.NonFatal(_) => None }
              dictAcc(name) = dictAcc.getOrElse(name, Some(Set.empty[String]))
                .flatMap(have => blockDict.map(have ++ _)
                  .filter(_.size <= MaxDictValues))
            }
          }
          reader.skipNextRowGroup()
        }
        val sized: Seq[(String, Long, Seq[Array[Byte]])] = bloomAcc.toSeq.collect {
          case (n, Some(bfs)) if bfs.nonEmpty =>
            (n, bfs.map(_.getBitsetSize.toLong).sum,
              bfs.reverse.map { bf =>
                val out = new java.io.ByteArrayOutputStream(bf.getBitsetSize)
                bf.writeTo(out)
                out.toByteArray: Array[Byte]
              })
        }
        val blooms: Map[String, BloomCol] = sized.collect {
          case (n, total, bits) if total <= MaxBloomLogBytes =>
            n -> BloomCol(bloomTags(n), bits)
        }.toMap
        val bloomRefs: Map[String, BloomRef] = sized.collect {
          case (n, total, bits)
              if total > MaxBloomLogBytes && total <= MaxBloomSidecarBytes =>
            spill(n, bloomTags(n), bits).map(p => n -> BloomRef(bloomTags(n), p))
        }.flatten.toMap
        val dicts: Map[String, DictCol] = dictAcc.collect {
          case (n, Some(vals)) if vals.nonEmpty => n -> DictCol(bloomTags(n), vals)
        }.toMap
        encode(Stats(rows, acc.collect {
          case (n, Some((t, mn, mx))) => n -> ColStats(t, mn, mx)
        }.toMap, schemaTags,
          nullAcc.collect { case (n, Some(c)) => n -> c }.toMap, blooms,
          dicts, bloomRefs, fileBytes))
      } finally reader.close()
    } catch { case scala.util.control.NonFatal(_) => "" }

  /** The bloom-probe encoding tag for a column, "" when no sound probe
    * exists. Strings hash their UTF-8 bytes; PLAIN ints hash their 4- or
    * 8-byte little-endian encoding — the physical width matters, so the
    * tag rides the log entry and a width-mixed column (safe type
    * widening) probes each file at ITS width. DECIMAL columns ARE
    * probeable: the written plain value is the UNSCALED int (or its
    * fixed-width big-endian two's complement), and the tag carries the
    * scale (and byte width) so the probe side rescales the predicate
    * value into exactly the bytes the writer hashed. Other annotated
    * ints (DATE, TIMESTAMP, unsigned) stay excluded: their query-side
    * values live in a different domain than the written plain encoding,
    * and a mis-domained hash would false-negative (= unsound pruning).
    * Signed 8/16/32-bit annotations are plain int32 writes and stay
    * probeable. */
  private def bloomTag(pt: org.apache.parquet.schema.PrimitiveType): String = {
    val logical = pt.getLogicalTypeAnnotation
    pt.getPrimitiveTypeName match {
      case PrimitiveTypeName.BINARY
          if logical.isInstanceOf[LogicalTypeAnnotation.StringLogicalTypeAnnotation] =>
        "s"
      case PrimitiveTypeName.INT32 => logical match {
        case null => "i32"
        case i: LogicalTypeAnnotation.IntLogicalTypeAnnotation
            if i.isSigned && i.getBitWidth <= 32 => "i32"
        case d: LogicalTypeAnnotation.DecimalLogicalTypeAnnotation =>
          s"d32:${d.getScale}"
        case _ => ""
      }
      case PrimitiveTypeName.INT64 => logical match {
        case null => "i64"
        case i: LogicalTypeAnnotation.IntLogicalTypeAnnotation
            if i.isSigned && i.getBitWidth == 64 => "i64"
        case d: LogicalTypeAnnotation.DecimalLogicalTypeAnnotation =>
          s"d64:${d.getScale}"
        case _ => ""
      }
      case PrimitiveTypeName.FIXED_LEN_BYTE_ARRAY => logical match {
        case d: LogicalTypeAnnotation.DecimalLogicalTypeAnnotation =>
          s"dfb:${d.getScale}:${pt.getTypeLength}"
        case _ => ""
      }
      case _ => ""
    }
  }

  /** Exact decimal view of a probe value — the same domain rule as
    * [[norm]]'s `dec` cases: Decimal/BigDecimal/integral values are
    * exact; float/double are refused (their binary expansion is not the
    * value the user wrote, and a rounded rescale could false-negative). */
  private def decOf(v: Any): Option[java.math.BigDecimal] = v match {
    case d: org.apache.spark.sql.types.Decimal => Some(d.toJavaBigDecimal)
    case d: java.math.BigDecimal => Some(d)
    case d: scala.math.BigDecimal => Some(d.bigDecimal)
    case n: java.lang.Long => Some(java.math.BigDecimal.valueOf(n))
    case n: java.lang.Integer => Some(java.math.BigDecimal.valueOf(n.longValue))
    case n: java.lang.Short => Some(java.math.BigDecimal.valueOf(n.longValue))
    case n: java.lang.Byte => Some(java.math.BigDecimal.valueOf(n.longValue))
    case _ => None
  }

  /** The UNSCALED integer of `v` at the file's `scale` — what the writer
    * physically stored and hashed. None when v is outside the exact
    * decimal domain or not representable at that scale (a value with
    * finer fraction digits could still be NOT-equal everywhere, but the
    * conservative answer keeps the file and lets the range leaf decide). */
  private def unscaledAt(v: Any, scale: Int): Option[java.math.BigInteger] =
    decOf(v).flatMap { bd =>
      try Some(bd.setScale(scale).unscaledValue)
      catch { case _: ArithmeticException => None }
    }

  /** Fixed-width big-endian two's complement of `u` (the FLBA decimal
    * plain encoding); None when it doesn't fit `len` bytes (cannot be in
    * the file — but the range leaf already excludes it, so keep). */
  private def fixedBytes(u: java.math.BigInteger, len: Int): Option[Array[Byte]] = {
    val raw = u.toByteArray
    if (raw.length > len) None
    else {
      val out = new Array[Byte](len)
      if (u.signum < 0) java.util.Arrays.fill(out, 0, len - raw.length, -1: Byte)
      System.arraycopy(raw, 0, out, len - raw.length, raw.length)
      Some(out)
    }
  }

  private def typedMinMax(ptype: PrimitiveTypeName, logical: LogicalTypeAnnotation,
                          st: org.apache.parquet.column.statistics.Statistics[_])
      : Option[(String, String, String)] = ptype match {
    case PrimitiveTypeName.INT32 | PrimitiveTypeName.INT64 =>
      // Stats must land in the same unit/scale the QUERY side compares in
      // (norm() produces micros for timestamps; Catalyst TimestampType
      // literals are micros): MILLIS scale up exactly; NANOS are refused —
      // a NANOS column either reads as a raw-long nanos column (where
      // `nanosAsLong` applies — micros-converted stats would then be
      // compared in the wrong unit) or is rejected outright by the
      // vectorized reader (this Spark build ignores the conf and throws
      // [PARQUET_TYPE_ILLEGAL]), so no stats are the only sound choice
      // either way. Unsigned ints wrap as signed longs — no skipping
      // value (absent = never skip, always sound).
      logical match {
        case t: LogicalTypeAnnotation.TimestampLogicalTypeAnnotation =>
          t.getUnit match {
            case LogicalTypeAnnotation.TimeUnit.MICROS => longStats(st, 1L)
            case LogicalTypeAnnotation.TimeUnit.MILLIS => longStats(st, 1000L)
            case _ => None // NANOS: unit ambiguous at read time
          }
        // DECIMAL over an int carrier: the stats are the UNSCALED ints —
        // rescaling by 10^-scale is EXACT (BigDecimal.valueOf(long, scale)
        // is the unscaled long reinterpreted), so the bounds land in the
        // query's value domain with zero rounding. Same move Delta and
        // Iceberg make; without it every decimal filter is a full scan.
        case d: LogicalTypeAnnotation.DecimalLogicalTypeAnnotation =>
          val mn = st.genericGetMin.asInstanceOf[Number].longValue
          val mx = st.genericGetMax.asInstanceOf[Number].longValue
          Some(("dec",
            java.math.BigDecimal.valueOf(mn, d.getScale).toPlainString,
            java.math.BigDecimal.valueOf(mx, d.getScale).toPlainString))
        case _: LogicalTypeAnnotation.TimeLogicalTypeAnnotation => None
        case i: LogicalTypeAnnotation.IntLogicalTypeAnnotation if !i.isSigned =>
          None
        case _ => longStats(st, 1L) // plain ints, dates (epoch days)
      }
    case PrimitiveTypeName.FLOAT | PrimitiveTypeName.DOUBLE =>
      Some(("double",
        st.genericGetMin.asInstanceOf[Number].doubleValue.toString,
        st.genericGetMax.asInstanceOf[Number].doubleValue.toString))
    case PrimitiveTypeName.BINARY
        if logical.isInstanceOf[LogicalTypeAnnotation.StringLogicalTypeAnnotation] =>
      Some(("string",
        new String(st.getMinBytes, StandardCharsets.UTF_8),
        new String(st.getMaxBytes, StandardCharsets.UTF_8)))
    // DECIMAL over a byte-array carrier (precision > 18, or legacy-format
    // writers): min/max are the big-endian two's-complement UNSCALED
    // integer — parquet-mr only surfaces these stats at all under the
    // logical type's signed comparator (TYPE_DEFINED order), which agrees
    // with BigDecimal order at the column's fixed scale, and decimals are
    // exempt from binary stats truncation. Exact, never rounded.
    case PrimitiveTypeName.FIXED_LEN_BYTE_ARRAY | PrimitiveTypeName.BINARY =>
      logical match {
        case d: LogicalTypeAnnotation.DecimalLogicalTypeAnnotation =>
          def v(bytes: Array[Byte]): Option[String] =
            if (bytes == null || bytes.isEmpty) None
            else Some(new java.math.BigDecimal(
              new java.math.BigInteger(bytes), d.getScale).toPlainString)
          for (mn <- v(st.getMinBytes); mx <- v(st.getMaxBytes))
            yield ("dec", mn, mx)
        case _ => None
      }
    case _ => None // BOOLEAN / INT96 / nested — no skipping value
  }

  private def longStats(st: org.apache.parquet.column.statistics.Statistics[_],
                        scale: Long): Option[(String, String, String)] = {
    val mn = st.genericGetMin.asInstanceOf[Number].longValue
    val mx = st.genericGetMax.asInstanceOf[Number].longValue
    // A scaled-up value that would overflow can't be represented — skip
    // stats rather than record a wrapped bound.
    try Some(("long", Math.multiplyExact(mn, scale).toString,
      Math.multiplyExact(mx, scale).toString))
    catch { case _: ArithmeticException => None }
  }

  private def minOf(t: String, a: String, b: String): String =
    if (cmp(t, a, b) <= 0) a else b
  private def maxOf(t: String, a: String, b: String): String =
    if (cmp(t, a, b) >= 0) a else b
  private def cmp(t: String, a: String, b: String): Int = t match {
    case "long" => java.lang.Long.compare(a.toLong, b.toLong)
    case "double" => java.lang.Double.compare(a.toDouble, b.toDouble)
    case "dec" => new java.math.BigDecimal(a).compareTo(new java.math.BigDecimal(b))
    case _ => utf8Cmp(a, b)
  }

  /** Parquet (and Spark's UTF8String) order strings by UTF-8 bytes,
    * unsigned; Java's String.compareTo orders by UTF-16 code units. The two
    * diverge for supplementary-plane characters (surrogates sort below
    * U+E000..U+FFFF in UTF-16 but above in UTF-8) — comparing stats in the
    * wrong order could wrongly prune a file. */
  private def utf8Cmp(a: String, b: String): Int = {
    val x = a.getBytes(StandardCharsets.UTF_8)
    val y = b.getBytes(StandardCharsets.UTF_8)
    var i = 0
    val n = math.min(x.length, y.length)
    while (i < n) {
      val c = java.lang.Integer.compare(x(i) & 0xff, y(i) & 0xff)
      if (c != 0) return c
      i += 1
    }
    java.lang.Integer.compare(x.length, y.length)
  }

  // ----------------------------------------------------------------- prune

  /** File-skipping predicate: evaluated against a file's Stats to decide
    * "may this file contain a matching row?". Sound by construction — any
    * uncertainty (missing stats, unknown column, type mismatch) keeps the
    * file. Compose with and/or; build leaves with the helpers below. */
  sealed trait Pred {
    def and(o: Pred): Pred = And(this, o)
    def or(o: Pred): Pred = Or(this, o)
  }
  private case class GtEq(col: String, v: Any) extends Pred
  private case class LtEq(col: String, v: Any) extends Pred
  private case class Gt(col: String, v: Any) extends Pred
  private case class Lt(col: String, v: Any) extends Pred
  private case class Eq(col: String, v: Any) extends Pred
  private case class NotEq(col: String, v: Any) extends Pred
  private case class Null(col: String) extends Pred
  private case class NotNull(col: String) extends Pred
  private case class And(l: Pred, r: Pred) extends Pred
  private case class Or(l: Pred, r: Pred) extends Pred

  def gtEq(col: String, v: Any): Pred = GtEq(col, v)
  def ltEq(col: String, v: Any): Pred = LtEq(col, v)
  def gt(col: String, v: Any): Pred = Gt(col, v)
  def lt(col: String, v: Any): Pred = Lt(col, v)
  def notEq(col: String, v: Any): Pred = NotEq(col, v)
  def isNull(col: String): Pred = Null(col)
  def isNotNull(col: String): Pred = NotNull(col)
  /** Point equality is a first-class leaf (not GtEq∧LtEq sugar): on top
    * of the [min,max] range check it probes the column's log-embedded
    * bloom, which is what skips a non-clustered file whose range spans
    * the whole key space. */
  def eq(col: String, v: Any): Pred = Eq(col, v)
  def between(col: String, lo: Any, hi: Any): Pred =
    And(GtEq(col, lo), LtEq(col, hi))

  /** `col LIKE 'prefix%'` as a range: every matching string is ≥ prefix,
    * and < the prefix with its last safely-incrementable char bumped (UTF-8
    * order is code-point order, so a BMP char +1 is a sound upper bound).
    * When no char can be bumped without leaving valid scalar space, the
    * lower bound alone still skips. */
  def startsWith(col: String, prefix: String): Pred = {
    val lower = GtEq(col, prefix)
    var i = prefix.length - 1
    while (i >= 0) {
      val c = prefix.charAt(i)
      // c+1 must stay a valid non-surrogate BMP scalar.
      if (c < '\uD7FF' || (c >= '\uE000' && c < '\uFFFF'))
        return And(lower, Lt(col, prefix.substring(0, i) + (c + 1).toChar))
      i -= 1
    }
    lower
  }

  /** Normalize a predicate value to the stats column's representation. None
    * when the value can't be compared against this column type (keep file). */
  private def norm(typ: String, v: Any): Option[Any] = (typ, v) match {
    case ("long", d: java.sql.Date) => Some(d.toLocalDate.toEpochDay)
    case ("long", d: java.time.LocalDate) => Some(d.toEpochDay)
    case ("long", t: java.sql.Timestamp) =>
      Some(t.getTime * 1000L + (t.getNanos / 1000) % 1000)
    case ("long", t: java.time.Instant) =>
      Some(t.getEpochSecond * 1000000L + t.getNano / 1000)
    case ("long", n: Number) => Some(n.longValue)
    // NaN: Spark orders it GREATER than every double, Java compare-based
    // bound checks disagree — no sound [min,max] decision exists (and
    // parquet writers keep NaN out of stats anyway). Keep the file.
    case ("double", n: Number) if !n.doubleValue.isNaN => Some(n.doubleValue)
    case ("string", s: String) => Some(s)
    // Decimal stats compare EXACTLY in the decimal domain. Exact-domain
    // predicate values only ([[decOf]]): Decimal/BigDecimal literals
    // (the analyzer promotes int literals compared to a decimal column
    // into these) and integral values. Float/double predicate values are
    // REFUSED (keep the file): such a comparison means the QUERY casts
    // the column to double, and a decimal row just below an exact bound
    // can round UP across it — pruning on exact bounds would drop a
    // matching row.
    case ("dec", x) => decOf(x)
    case _ => None
  }

  private def le(typ: String, a: Any, b: Any): Boolean = typ match {
    case "long" => a.asInstanceOf[Long] <= b.asInstanceOf[Long]
    case "double" => a.asInstanceOf[Double] <= b.asInstanceOf[Double]
    case "dec" => a.asInstanceOf[java.math.BigDecimal]
      .compareTo(b.asInstanceOf[java.math.BigDecimal]) <= 0
    case _ => utf8Cmp(a.asInstanceOf[String], b.asInstanceOf[String]) <= 0
  }
  private def ltStrict(typ: String, a: Any, b: Any): Boolean =
    le(typ, a, b) && !le(typ, b, a)

  // --------------------------------------------------- sidecar bloom files

  /** Sidecar framing: repeated [int32-BE length][bitset bytes]. */
  def writeSidecar(out: java.io.OutputStream,
                   bitsets: Seq[Array[Byte]]): Unit = {
    val d = new java.io.DataOutputStream(out)
    bitsets.foreach { b => d.writeInt(b.length); d.write(b) }
    d.flush()
  }

  def readSidecar(in: java.io.InputStream): Seq[Array[Byte]] = {
    val d = new java.io.DataInputStream(in)
    val acc = scala.collection.mutable.ListBuffer.empty[Array[Byte]]
    var more = true
    while (more) {
      val first = d.read()
      if (first < 0) more = false
      else {
        val len = (first << 24) | (d.readUnsignedByte() << 16) |
          (d.readUnsignedByte() << 8) | d.readUnsignedByte()
        val b = new Array[Byte](len)
        d.readFully(b)
        acc += b
      }
    }
    acc.toSeq
  }

  /** Schema tags alone from a token — a LIGHT parse for the hot read
    * path's width-mix detection and commit-time schema lookups: a full
    * [[decode]] would base64-decode every inline bloom payload (up to
    * 64 KB per column per file) just to read the `s:` entries. */
  def schemaTags(token: String): Seq[(String, String)] =
    if (token == null || token.isEmpty || !token.startsWith("rows=")) Nil
    else token.split("\\|").toSeq.filter(_.startsWith("s:")).flatMap { p =>
      p.stripPrefix("s:").split(",", 2) match {
        case Array(n, t) => Some(dec(n) -> dec(t))
        case _ => None
      }
    }

  /** The warehouse-relative sidecar paths a stats token points at —
    * a LIGHT parse (no base64 decode of inline payloads) for vacuum's
    * reference sweep. */
  def sidecarPaths(token: String): Seq[String] =
    if (token == null || !token.contains("B:")) Nil
    else token.split("\\|").toSeq.filter(_.startsWith("B:")).flatMap { p =>
      p.stripPrefix("B:").split(",", 3) match {
        case Array(_, _, path) => Some(dec(path))
        case _ => None
      }
    }

  /** Columns appearing in an equality leaf of `pred` — the only leaves a
    * sidecar bloom can serve, so only these are worth a load. */
  def eqColumns(pred: Pred): Set[String] = pred match {
    case And(l, r) => eqColumns(l) ++ eqColumns(r)
    case Or(l, r) => eqColumns(l) ++ eqColumns(r)
    case Eq(c, _) => Set(c)
    case _ => Set.empty
  }

  /** [[mayMatch]] with sidecar-bloom resolution: the cheap log-only
    * layers run first, and only a file that SURVIVES them pays a sidecar
    * load (`loader` returning None — missing/corrupt sidecar — keeps the
    * file: sound). The loader is expected to cache. */
  def mayMatch(stats: Option[Stats], pred: Pred,
               loader: BloomRef => Option[Seq[Array[Byte]]]): Boolean =
    if (!mayMatch(stats, pred)) false
    else stats match {
      case Some(s) if s.bloomRefs.nonEmpty =>
        val need = eqColumns(pred).intersect(s.bloomRefs.keySet)
        if (need.isEmpty) true
        else {
          val loaded = need.flatMap { c =>
            val r = s.bloomRefs(c)
            loader(r).map(bits => c -> BloomCol(r.tag, bits))
          }.toMap
          loaded.isEmpty ||
            mayMatch(Some(s.copy(blooms = s.blooms ++ loaded)), pred)
        }
      case _ => true
    }

  /** May a row of a file with `stats` satisfy `pred`? (stats=None ⇒ true.) */
  def mayMatch(stats: Option[Stats], pred: Pred): Boolean = stats match {
    case None => true
    case Some(s) =>
      // An all-null column satisfies no comparison (NULL op v is never
      // true) — prunable even without [min,max].
      def allNull(c: String): Boolean =
        s.rows >= 0 && s.nulls.get(c).contains(s.rows)
      // Evaluate one comparison leaf against the column's closed [min,max];
      // any uncertainty (unknown column, uncomparable value) keeps the file.
      def leaf(c: String, v: Any)(decide: (String, Any, ColStats) => Boolean): Boolean =
        if (allNull(c)) false
        else s.cols.get(c) match {
          case Some(cs) => norm(cs.typ, v) match {
            // NaN bounds in stats (a writer that included NaN rows) carry
            // no ordering information in Spark's NaN-greatest order — keep.
            case Some(nv) if cs.typ == "double" &&
                (cs.min.toDouble.isNaN || cs.max.toDouble.isNaN) => true
            case Some(nv) => decide(cs.typ, nv, cs)
            case None => true
          }
          case None => true
        }
      // Bloom probe: definite absence prunes; a missing bloom, a probe
      // value outside the tag's domain (type-coerced predicates — the
      // range leaf already keeps those), or any bitset saying "maybe"
      // keeps the file. Hashing MUST mirror the write side: parquet
      // hashes the column's PLAIN encoding with xxHash64, which is what
      // BlockSplitBloomFilter.hash(Binary|int|long) computes; the tag
      // recorded at collect time picks the width the file was written at.
      def bloomKeep(c: String, v: Any): Boolean = s.blooms.get(c) match {
        case None => true
        case Some(bc) =>
          def hashIn(bf: org.apache.parquet.column.values.bloomfilter
              .BlockSplitBloomFilter): Option[Long] = (bc.tag, v) match {
            case ("s", str: String) =>
              Some(bf.hash(org.apache.parquet.io.api.Binary.fromString(str)))
            case ("i64", n: java.lang.Long) => Some(bf.hash(n.longValue))
            case ("i64", n: java.lang.Integer) => Some(bf.hash(n.longValue))
            case ("i64", n: java.lang.Short) => Some(bf.hash(n.longValue))
            case ("i32", n: java.lang.Integer) => Some(bf.hash(n.intValue))
            case ("i32", n: java.lang.Short) => Some(bf.hash(n.intValue))
            case ("i32", n: java.lang.Byte) => Some(bf.hash(n.intValue))
            // A long-typed probe against an int32 file (width-mixed
            // column): in-range values hash at the FILE's width; an
            // out-of-range value cannot be in an int32 file at all, but
            // the range leaf already excludes it — keep here.
            case ("i32", n: java.lang.Long)
                if n >= Int.MinValue && n <= Int.MaxValue =>
              Some(bf.hash(n.intValue))
            // Decimal carriers hash the UNSCALED int at the file's
            // width; out-of-range / non-representable probe values keep
            // the file (the range leaf already decided).
            case (t, _) if t.startsWith("d32:") =>
              unscaledAt(v, t.substring(4).toInt)
                .filter(_.bitLength < 32).map(u => bf.hash(u.intValueExact))
            case (t, _) if t.startsWith("d64:") =>
              unscaledAt(v, t.substring(4).toInt)
                .filter(_.bitLength < 64).map(u => bf.hash(u.longValueExact))
            case (t, _) if t.startsWith("dfb:") =>
              val parts = t.split(":")
              unscaledAt(v, parts(1).toInt)
                .flatMap(fixedBytes(_, parts(2).toInt))
                .map(b => bf.hash(
                  org.apache.parquet.io.api.Binary.fromConstantByteArray(b)))
            case _ => None
          }
          bc.bitsets.exists { bits =>
            val bf = new org.apache.parquet.column.values.bloomfilter
              .BlockSplitBloomFilter(bits)
            hashIn(bf).forall(bf.findHash)
          }
      }
      // Exact-membership probe against a complete dictionary: the one
      // case where "not present" is a certainty, not a probability. A
      // value outside the tag's canonical domain keeps the file (the
      // range leaf already handles type-coerced predicates) — EXCEPT an
      // out-of-int32-range long, which provably cannot be in an int32
      // file.
      def dictKeep(c: String, v: Any): Boolean = s.dicts.get(c) match {
        case None => true
        case Some(dc) =>
          val canon: Option[String] = (dc.tag, v) match {
            case ("s", str: String) => Some(str)
            case ("i64", n: java.lang.Long) => Some(n.toString)
            case ("i64", n: java.lang.Integer) => Some(n.longValue.toString)
            case ("i64", n: java.lang.Short) => Some(n.longValue.toString)
            case ("i32", n: java.lang.Integer) => Some(n.toString)
            case ("i32", n: java.lang.Short) => Some(n.intValue.toString)
            case ("i32", n: java.lang.Byte) => Some(n.intValue.toString)
            case ("i32", n: java.lang.Long) => Some(n.toString) // set is int-strings
            // Decimal dictionaries hold unscaled-int strings.
            case (t, _) if t.startsWith("d32:") || t.startsWith("d64:") ||
                t.startsWith("dfb:") =>
              unscaledAt(v, t.split(":")(1).toInt).map(_.toString)
            case _ => None
          }
          canon.forall(dc.values.contains)
      }
      def eval(p: Pred): Boolean = p match {
        case And(l, r) => eval(l) && eval(r)
        case Or(l, r) => eval(l) || eval(r)
        // point lookup: inside the closed [min,max], not bloom-excluded,
        // and in the complete dictionary when one is recorded
        case Eq(c, v) =>
          leaf(c, v)((t, nv, cs) =>
            le(t, parse(t, cs.min), nv) && le(t, nv, parse(t, cs.max))) &&
            bloomKeep(c, v) && dictKeep(c, v)
        // some row ≥ v iff max ≥ v; strict variants use strict compares
        case GtEq(c, v) => leaf(c, v)((t, nv, cs) => le(t, nv, parse(t, cs.max)))
        case LtEq(c, v) => leaf(c, v)((t, nv, cs) => le(t, parse(t, cs.min), nv))
        case Gt(c, v) => leaf(c, v)((t, nv, cs) => ltStrict(t, nv, parse(t, cs.max)))
        case Lt(c, v) => leaf(c, v)((t, nv, cs) => ltStrict(t, parse(t, cs.min), nv))
        // some row ≠ v only fails when the whole file is pinned to v
        // ([min,max] = [v,v]); NULL rows never satisfy ≠ either.
        case NotEq(c, v) => leaf(c, v)((t, nv, cs) =>
          !(le(t, nv, parse(t, cs.min)) && le(t, parse(t, cs.max), nv)))
        // some row IS NULL iff nullCount > 0; IS NOT NULL iff count < rows
        case Null(c) => s.nulls.get(c).forall(_ > 0)
        case NotNull(c) => !allNull(c)
      }
      eval(pred)
  }

  private def parse(typ: String, s: String): Any = typ match {
    case "long" => s.toLong
    case "double" => s.toDouble
    case "dec" => new java.math.BigDecimal(s)
    case _ => s
  }

  // ------------------------------------------------ V1 Filter → skip pred

  /** Same contract as [[fromExpression]] for DataSource-V1 `Filter` trees
    * (the batch `graft-snapshots` relation receives these): best-effort,
    * only ever widens, None when nothing usable survives. */
  def fromV1Filter(f: org.apache.spark.sql.sources.Filter): Option[Pred] = {
    import org.apache.spark.sql.sources.{And => SAnd, Or => SOr, _}
    def pos(f: Filter): Option[Pred] = f match {
      case SAnd(l, r) => (pos(l), pos(r)) match {
        case (Some(a), Some(b)) => Some(a.and(b))
        case (a, b) => a.orElse(b)
      }
      case SOr(l, r) => for (a <- pos(l); b <- pos(r)) yield a.or(b)
      case Not(c) => neg(c)
      case EqualTo(a, v) if v != null => Some(eq(a, v))
      case EqualNullSafe(a, null) => Some(isNull(a))
      case EqualNullSafe(a, v) => Some(eq(a, v))
      case GreaterThan(a, v) => Some(gt(a, v))
      case GreaterThanOrEqual(a, v) => Some(gtEq(a, v))
      case LessThan(a, v) => Some(lt(a, v))
      case LessThanOrEqual(a, v) => Some(ltEq(a, v))
      case In(a, vs) if vs.nonEmpty =>
        // NULL list entries never match `=` — drop them; all-null → false
        // for every row, but stay conservative and keep the file.
        val nn = vs.filter(_ != null)
        if (nn.isEmpty) None
        else Some(nn.map(v => eq(a, v)).reduce((x, y) => x.or(y)))
      case IsNull(a) => Some(isNull(a))
      case IsNotNull(a) => Some(isNotNull(a))
      case StringStartsWith(a, p) => Some(startsWith(a, p))
      case _ => None
    }
    def neg(f: Filter): Option[Pred] = f match {
      case SAnd(l, r) => for (a <- neg(l); b <- neg(r)) yield a.or(b)
      case SOr(l, r) => (neg(l), neg(r)) match {
        case (Some(a), Some(b)) => Some(a.and(b))
        case (a, b) => a.orElse(b)
      }
      case Not(c) => pos(c)
      case EqualTo(a, v) if v != null => Some(notEq(a, v))
      case EqualNullSafe(a, null) => Some(isNotNull(a))
      case EqualNullSafe(a, v) =>
        // ¬(c <=> v): satisfied by NULL rows too — only notEq's null-free
        // part is expressible; widen with an OR on nullability.
        Some(notEq(a, v).or(isNull(a)))
      case GreaterThan(a, v) => Some(ltEq(a, v))
      case GreaterThanOrEqual(a, v) => Some(lt(a, v))
      case LessThan(a, v) => Some(gtEq(a, v))
      case LessThanOrEqual(a, v) => Some(gt(a, v))
      case In(a, vs) if vs.nonEmpty && !vs.contains(null) =>
        Some(vs.map(v => notEq(a, v)).reduce((x, y) => x.and(y)))
      case IsNull(a) => Some(isNotNull(a))
      case IsNotNull(a) => Some(isNull(a))
      case _ => None
    }
    pos(f)
  }

  // ------------------------------------------------- Catalyst → skip pred

  /** Derive a sound skipping predicate from a Catalyst boolean expression
    * (the tree behind a `Column`), so callers write ONE predicate and get
    * both row filtering and log-side file skipping. Conversion is
    * best-effort and only ever widens: an unconvertible conjunct is
    * dropped (skip less), an unconvertible disjunct poisons its whole OR
    * (skip nothing there). Returns None when nothing usable survives —
    * then no skipping at all. */
  def fromExpression(e: org.apache.spark.sql.catalyst.expressions.Expression)
      : Option[Pred] = {
    import org.apache.spark.sql.catalyst.expressions.{And => CatAnd, Or => CatOr, _}
    import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
    def nameOf(x: Expression): Option[String] = x match {
      // UnresolvedAttribute IS an Attribute — one case serves both.
      case a: Attribute => Some(a.name)
      case c: Cast => nameOf(c.child)
      case _ => None
    }
    def litOf(x: Expression): Option[Any] = x match {
      case Literal(v: org.apache.spark.unsafe.types.UTF8String, _) =>
        Some(v.toString)
      case Literal(null, _) => None
      case Literal(v, _) => Some(v)
      // Type coercion wraps promoted literals (int → bigint) in a Cast; the
      // raw value is fine — norm() re-checks it against the stats type and
      // keeps the file on any mismatch.
      case c: Cast => litOf(c.child)
      case _ => None
    }
    def cmp(l: Expression, r: Expression)(mk: (String, Any) => Pred,
                                          flip: (String, Any) => Pred): Option[Pred] =
      (nameOf(l), litOf(r), nameOf(r), litOf(l)) match {
        case (Some(n), Some(v), _, _) => Some(mk(n, v))
        case (_, _, Some(n), Some(v)) => Some(flip(n, v))
        case _ => None
      }
    def walk(x: Expression): Option[Pred] = x match {
      case CatAnd(l, r) => (walk(l), walk(r)) match {
        case (Some(a), Some(b)) => Some(a.and(b))
        case (a, b) => a.orElse(b) // dropped conjunct only widens
      }
      case CatOr(l, r) => for (a <- walk(l); b <- walk(r)) yield a.or(b)
      case Not(c) => neg(c)
      case EqualTo(l, r) => cmp(l, r)(eq, eq)
      // c <=> v: for a non-null literal, same rows as c = v (plus none —
      // NULL rows fail both); a NULL literal is IS NULL.
      case EqualNullSafe(l, Literal(null, _)) => nameOf(l).map(isNull)
      case EqualNullSafe(Literal(null, _), r) => nameOf(r).map(isNull)
      case EqualNullSafe(l, r) => cmp(l, r)(eq, eq)
      case GreaterThan(l, r) => cmp(l, r)(gt, lt)
      case GreaterThanOrEqual(l, r) => cmp(l, r)(gtEq, ltEq)
      case LessThan(l, r) => cmp(l, r)(lt, gt)
      case LessThanOrEqual(l, r) => cmp(l, r)(ltEq, gtEq)
      case In(l, items) if items.nonEmpty =>
        val vs = items.map(litOf)
        if (vs.exists(_.isEmpty)) None
        else nameOf(l).map(n =>
          vs.flatten.map(v => eq(n, v)).reduce((a, b) => a.or(b)))
      // SQL `BETWEEN` parses to its own node since Spark 4 (a
      // RuntimeReplaceable the optimizer later lowers to >= AND <=) —
      // skipping runs on the analyzed tree, so it must convert here.
      case b: Between => for {
        n <- nameOf(b.input); lo <- litOf(b.lower); hi <- litOf(b.upper)
      } yield between(n, lo, hi)
      case StartsWith(l, r) => for {
        n <- nameOf(l); v <- litOf(r); s <- Some(v).collect { case s: String => s }
      } yield startsWith(n, s)
      // The analyzer inserts IsNotNull guards into most filters — with
      // null counts in the log these prune all-null files for free.
      case IsNull(l) => nameOf(l).map(isNull)
      case IsNotNull(l) => nameOf(l).map(isNotNull)
      case _ => None
    }
    // ¬x at TRUE-polarity (filters pass only TRUE; rows where x is NULL
    // fail both x and ¬x, matching the comparison leaves' null-free
    // semantics). De Morgan flips and/or; under a negated AND a dropped
    // branch would NARROW, so both sides must convert there.
    def neg(x: Expression): Option[Pred] = x match {
      case Not(c) => walk(c)
      case CatAnd(l, r) => for (a <- neg(l); b <- neg(r)) yield a.or(b)
      case CatOr(l, r) => (neg(l), neg(r)) match {
        case (Some(a), Some(b)) => Some(a.and(b))
        case (a, b) => a.orElse(b) // ¬(l∨r) ⊆ ¬l — dropping one widens
      }
      case EqualTo(l, r) => cmp(l, r)(notEq, notEq)
      // ¬(c <=> v): NULL rows SATISFY it — widen with the nullability OR
      // (same shape as the V1 path); ¬(c <=> NULL) is IS NOT NULL.
      case EqualNullSafe(l, Literal(null, _)) => nameOf(l).map(isNotNull)
      case EqualNullSafe(Literal(null, _), r) => nameOf(r).map(isNotNull)
      case EqualNullSafe(l, r) =>
        cmp(l, r)(notEq, notEq).flatMap(p =>
          nameOf(l).orElse(nameOf(r)).map(n => p.or(isNull(n))))
      case GreaterThan(l, r) => cmp(l, r)(ltEq, gtEq)
      case GreaterThanOrEqual(l, r) => cmp(l, r)(lt, gt)
      case LessThan(l, r) => cmp(l, r)(gtEq, ltEq)
      case LessThanOrEqual(l, r) => cmp(l, r)(gt, lt)
      case In(l, items) if items.nonEmpty =>
        val vs = items.map(litOf)
        if (vs.exists(_.isEmpty)) None
        else nameOf(l).map(n =>
          vs.flatten.map(v => notEq(n, v)).reduce((a, b) => a.and(b)))
      // ¬(lo ≤ x ≤ hi) ⇒ x < lo ∨ x > hi (rows where x is NULL fail the
      // filter either way, matching the leaves' null-free semantics).
      case b: Between => for {
        n <- nameOf(b.input); lo <- litOf(b.lower); hi <- litOf(b.upper)
      } yield lt(n, lo).or(gt(n, hi))
      case IsNull(l) => nameOf(l).map(isNotNull)
      case IsNotNull(l) => nameOf(l).map(isNull)
      case _ => None
    }
    walk(e)
  }
}

