package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import javax.crypto.Mac
import javax.crypto.spec.SecretKeySpec

/** Scalar-function surface of the engine: the Spark-first re-expression of
  * the reference's per-record transforms. Everything here is built from
  * `org.apache.spark.sql.functions._` (whole-stage-codegen'd) except the
  * keyed HMAC and SimHash, which are deterministic Scala UDFs (documented
  * tradeoff; a custom Catalyst Expression is the upgrade path if profiling
  * shows UDF overhead on a hot path).
  */
object Fns {

  // ---- template expansion (reference StringReplacer.java:26-572) -------

  /** Expand `~~{name}~~` tokens in a template with column values at plan
    * build time — the reference's iterative runtime token loop
    * (`StringReplacer.java:343-395`) collapses into a fold over `Column`s
    * that Catalyst constant-folds around.
    */
  def templateExpand(template: String, bindings: Map[String, Column]): Column = {
    val re = "~~\\{([a-zA-Z0-9_]+)\\}~~".r
    val parts = re.split(template)
    val tokens = re.findAllMatchIn(template).map(_.group(1)).toSeq
    val pieces = new scala.collection.mutable.ArrayBuffer[Column]
    (0 until math.max(parts.length, tokens.length)).foreach { i =>
      if (i < parts.length && parts(i).nonEmpty) pieces += lit(parts(i))
      if (i < tokens.length)
        pieces += coalesce(bindings.getOrElse(tokens(i),
          lit(s"~~{${tokens(i)}}~~")).cast("string"), lit(""))
    }
    if (pieces.isEmpty) lit("") else concat(pieces.toSeq: _*)
  }

  /** Expand a template whose tokens are JSONPaths resolved against a JSON
    * column — the reference's JSONPath-sourced token replacement
    * (`StringReplacer.java:198-295`: `parseJSONPaths` +
    * `replaceTokens(JsonPath)`). Token syntax `~~{$.a.b}~~`; non-JSONPath
    * tokens (no `$` prefix) resolve from `bindings` as in
    * [[templateExpand]]. Missing paths render as empty string (the
    * reference's Path-Not-Found = ignore behavior).
    */
  def templateExpandJsonPaths(template: String, json: Column,
      bindings: Map[String, Column] = Map.empty): Column = {
    val re = "~~\\{([^}]+)\\}~~".r
    val parts = re.split(template)
    val tokens = re.findAllMatchIn(template).map(_.group(1)).toSeq
    val pieces = new scala.collection.mutable.ArrayBuffer[Column]
    (0 until math.max(parts.length, tokens.length)).foreach { i =>
      if (i < parts.length && parts(i).nonEmpty) pieces += lit(parts(i))
      if (i < tokens.length) {
        val tok = tokens(i)
        val v =
          if (tok.startsWith("$")) get_json_object(json, tok)
          else bindings.getOrElse(tok, lit(s"~~{$tok}~~"))
        pieces += coalesce(v.cast("string"), lit(""))
      }
    }
    if (pieces.isEmpty) lit("") else concat(pieces.toSeq: _*)
  }

  /** Increment the LAST run of digits in a string, preserving its
    * zero-padded width when the incremented value still fits (the
    * reference's `replaceAddOne`, `StringReplacer.java:397-442`:
    * "file-007" -> "file-008", "v9" -> "v10", no digits -> unchanged).
    * Pure columns — no UDF.
    */
  def replaceAddOne(c: Column): Column = {
    val tailPat = "(\\d+)(\\D*)$"
    val num = regexp_extract(c, tailPat, 1)
    val tail = regexp_extract(c, tailPat, 2)
    val prefix = c.substr(lit(1), length(c) - length(num) - length(tail))
    val inc = (num.cast("long") + 1).cast("string")
    // lpad TRUNCATES when the value outgrows the width — only pad when
    // the increment still fits the original digit-run width
    val padded = when(length(inc) < length(num), lpad(inc, length(num), lit("0")))
      .otherwise(inc)
    when(num === "", c).otherwise(concat(prefix, padded, tail))
  }

  /** Quartz-style cron-syntax validation regex (the reference's
    * generated cron regex, `StringReplacer.java:444-504`): 7 fields
    * (sec min hour day month dow [year]), `?`/`*`, ranges, steps,
    * lists, JAN–DEC / MON–SUN names, the reference's L/W/# placements,
    * plus its comment/blank/`key =` line forms. RE2-safe (no
    * lookaround) so the identical pattern runs in the DuckDB oracle.
    */
  val cronRegex: String = {
    def field(num: String, listSeps: String = "", suffix: String = ""): String = {
      val r = s"(?:$num)(?:(?:-|/|,$listSeps)(?:$num))?$suffix"
      s"\\?|\\*|$r(?:,$r)*"
    }
    def named(base: String, names: String): String = {
      val r = s"(?:$names)(?:(?:-)(?:$names))?"
      s"$base|\\?|\\*|$r(?:,$r)*"
    }
    val sec = field("[0-5]?\\d")
    val min = field("[0-5]?\\d")
    val hour = field("[01]?\\d|2[0-3]")
    val day = field("0?[1-9]|[12]\\d|3[01]")
    val month = named(field("[1-9]|1[012]", suffix = "(?:L|W)?"),
      "JAN|FEB|MAR|APR|MAY|JUN|JUL|AUG|SEP|OCT|NOV|DEC")
    val dow = named(field("[0-6]", listSeps = "|#", suffix = "(?:L)?"),
      "MON|TUE|WED|THU|FRI|SAT|SUN")
    val year = "|\\d{4}"
    // the end anchor sits OUTSIDE the outer alternation (the reference
    // appends `$` after the whole group): under find semantics an inner
    // anchor would let the `#` / `key =` / empty alternatives match any
    // string with that prefix ('# anything', 'key = garbage trailing')
    s"^\\s*($$|#|\\w+\\s*=|($sec)\\s+($min)\\s+($hour)\\s+($day)\\s+($month)\\s+($dow)(|\\s)+($year))$$"
  }

  /** True when the column matches [[cronRegex]]. */
  def isValidCron(c: Column): Column = c.rlike(cronRegex)

  /** CPU-list string ("0-3,8,12-14") -> hex affinity mask of `words`
    * 64-bit words, most-significant word first, each word zero-padded to
    * `hexDigits` and comma-separated — the reference's
    * `convertCPUListToHex` (`StringReplacer.java:506-550`).
    * Deterministic UDF (config-string parsing, never a hot path).
    */
  def cpuListToHex(words: Int = 1, hexDigits: Int = 16): Column => Column = {
    val u = udf { (csv: String) =>
      if (csv == null) null
      else {
        val data = new Array[Long](words)
        csv.split(",").iterator.map(_.trim).filter(_.nonEmpty).foreach { part =>
          val (lo, hi) = part.split("-") match {
            case Array(a, b) => (a.trim.toInt, b.trim.toInt)
            case Array(a) => (a.toInt, a.toInt)
            case _ => throw new IllegalArgumentException(s"bad cpu list: $csv")
          }
          // out-of-range bits silently truncate, matching the reference's
          // setDataMask ("truncate if we don't have enough hex bytes")
          // instead of failing the whole job on an oversized CPU list
          (lo to hi).foreach { bit =>
            if (bit / 64 < words) data(bit / 64) |= (1L << (bit % 64))
          }
        }
        data.reverseIterator
          .map(w => {
            val h = java.lang.Long.toHexString(w)
            ("0" * math.max(0, hexDigits - h.length)) + h
          })
          .mkString(",")
      }
    }
    c => u(c)
  }

  /** Longest common prefix of two string columns (the reference's
    * `greatestCommonPrefix`, `StringReplacer.java:35-55`). Pure columns.
    */
  def greatestCommonPrefix(a: Column, b: Column): Column = {
    val maxLen = least(length(a), length(b))
    val common = array_max(filter(sequence(lit(0), maxLen),
      i => a.substr(lit(1), i) === b.substr(lit(1), i)))
    a.substr(lit(1), common)
  }

  // ---- record serialization (reference CSVToJSONProcessor.java:30-256) --

  /** One CSV-ish record -> JSON object of all columns (the C12 conversion,
    * set-oriented: `to_json(struct(*))`).
    */
  def recordToJson(df: DataFrame): Column =
    to_json(struct(df.columns.map(col).toIndexedSeq: _*))

  /** Header normalization (reference CleanCSVHeader.java:130-157): column
    * renames applied at the source, not by stream rewriting.
    */
  def cleanHeaders(df: DataFrame, find: String, replace: String): DataFrame =
    df.toDF(df.columns.map(_.replaceAll(find, replace)).toIndexedSeq: _*)

  // ---- keyed HMAC (reference SecurityHashProcessor.java:107-140) --------

  /** HmacSHA256 of a column under a fixed key, Base64-encoded — the PII
    * tokenization primitive. Deterministic; the key ships in the closure
    * (in production it would come from a secret store on the executor).
    */
  /** Shared HMAC kernel — the ONE definition both the Column API and the
    * SQL registration (`graft_hmac_sha256`, Registry) wrap, so the two
    * surfaces cannot drift.
    */
  private[functions] def hmacSha256Raw(key: String, s: String): String =
    if (s == null) null
    else {
      val mac = Mac.getInstance("HmacSHA256")
      mac.init(new SecretKeySpec(key.getBytes("UTF-8"), "HmacSHA256"))
      java.util.Base64.getEncoder.encodeToString(mac.doFinal(s.getBytes("UTF-8")))
    }

  def hmacSha256(key: String): Column => Column = {
    val u = udf { (s: String) => hmacSha256Raw(key, s) }
    c => u(c)
  }

  // ---- entity extraction (reference PontusNLPProcessor; the concrete
  // regex entity set documented in the production flow's Gremlin query
  // comment block, flow.xml:1140-1160: email/URL/phone/postcode/...) ------

  /** Entity type -> extraction regex. RE2-safe subset (no lookarounds, no
    * backrefs) so the identical pattern runs in Java regex (Spark) and
    * DuckDB/RE2 oracles.
    */
  val entityPatterns: Seq[(String, String)] = Seq(
    "email" -> "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}",
    "url" -> "https?://[A-Za-z0-9./_-]+",
    "phone" -> "\\+[0-9]{2} [0-9]{4} [0-9]{6}",
    "postcode" -> "[A-Z]{1,2}[0-9][A-Z]? [0-9][A-Z]{2}")

  /** All matches per entity type: one `array<string>` column per type,
    * codegen'd `regexp_extract_all` (set-oriented form of the reference's
    * per-record NLP loop).
    */
  def extractEntities(text: Column): Seq[(String, Column)] =
    entityPatterns.map { case (name, pat) =>
      name -> regexp_extract_all(text, lit(pat), lit(0))
    }

  // ---- text analysis ---------------------------------------------------

  /** Whitespace tokenization (normalized). */
  def words(text: Column): Column =
    split(trim(regexp_replace(text, "\\s+", " ")), " ")

  /** Token count over whitespace tokenization. */
  def tokenCount(text: Column): Column =
    when(length(trim(text)) === 0, lit(0)).otherwise(size(words(text)))

  /** BPE-ish subword count: non-empty runs between whitespace/punctuation
    * — a cheap proxy for tokenizer cost estimation at corpus scale. The
    * delimiter class is written out explicitly (== `\p{Punct}` + `\s`) so
    * the identical regex runs in RE2-based oracles.
    */
  val subwordDelimClass: String =
    "[\\s!\"#$%&'()*+,\\-./:;<=>?@\\[\\\\\\]^_`{|}~]+"

  def subwordCount(text: Column): Column =
    size(filter(split(text, subwordDelimClass), w => w =!= ""))

  /** Language-specific stopword hit count (n-gram/stopword heuristic). */
  def stopwordHits(text: Column, stopwords: Seq[String]): Column =
    size(filter(words(lower(text)), w => w.isInCollection(stopwords)))

  /** Tiny language-ID: argmax of per-language stopword hit ratios. */
  val langStopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "and", "of", "to", "in", "is", "that"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "zu"),
    "fr" -> Seq("le", "la", "et", "les", "des", "est", "une", "dans"),
    "es" -> Seq("el", "la", "de", "que", "y", "los", "es", "una"))

  /** Argmax over stopword hits with a fixed precedence order (en, de, es,
    * fr) on ties — deterministic and expressible identically in plain SQL.
    */
  def langId(text: Column): Column = {
    val en = stopwordHits(text, langStopwords("en"))
    val de = stopwordHits(text, langStopwords("de"))
    val es = stopwordHits(text, langStopwords("es"))
    val fr = stopwordHits(text, langStopwords("fr"))
    when(en === 0 && de === 0 && es === 0 && fr === 0, lit("unknown"))
      .when(en >= de && en >= es && en >= fr, lit("en"))
      .when(de >= es && de >= fr, lit("de"))
      .when(es >= fr, lit("es"))
      .otherwise(lit("fr"))
  }

  /** 4-decimal truncation: floor(x*10000)/10000. Unlike `round`, identical
    * bit-for-bit across engines (no half-rounding mode ambiguity).
    */
  def trunc4(c: Column): Column = floor(c * 10000) / 10000

  /** Quality scoring: length, alpha ratio, stopword ratio, mean word
    * length — the heuristics a pretraining pipeline gates documents on.
    */
  def qualityFeatures(text: Column): Seq[(String, Column)] = {
    val n = length(text).cast("double")
    val alpha = length(regexp_replace(text, "[^a-zA-Z]", "")).cast("double")
    val punct = length(regexp_replace(text, "[^\\p{Punct}]", "")).cast("double")
    val w = tokenCount(text).cast("double")
    Seq(
      "n_chars" -> length(text),
      "n_words" -> tokenCount(text),
      "alpha_ratio" -> trunc4(alpha / greatest(n, lit(1.0))),
      "punct_ratio" -> trunc4(punct / greatest(n, lit(1.0))),
      "mean_word_len" -> trunc4(alpha / greatest(w, lit(1.0))),
      "stopword_ratio" -> trunc4(
        stopwordHits(text, langStopwords("en")).cast("double") / greatest(w, lit(1.0))))
  }

  /** Composite quality score in [0,1] (deterministic, SQL-expressible). */
  def qualityScore(text: Column): Column = {
    val f = qualityFeatures(text).toMap
    trunc4(least(lit(1.0),
      f("alpha_ratio") * 0.5 +
        least(f("n_words").cast("double") / 100.0, lit(1.0)) * 0.3 +
        least(f("stopword_ratio") * 5.0, lit(1.0)) * 0.2))
  }

  // ---- fingerprints / sketches ----------------------------------------

  /** Content fingerprint: first 16 hex chars of md5 over the
    * whitespace-normalized lowercase text (cross-engine reproducible).
    */
  def docFingerprint(text: Column): Column =
    substring(md5(lower(regexp_replace(trim(text), "\\s+", " "))), 1, 16)

  /** Rolling polynomial hash (base 31, 64-bit wraparound) over normalized
    * text — the streaming-friendly fingerprint variant (deterministic
    * Scala; arithmetic too stateful for built-ins).
    */
  /** Shared rolling-hash kernel, NORMALIZATION INCLUDED (trim + collapse
    * whitespace + lowercase) — the one definition both the Column API and
    * the SQL registration wrap. Normalizing inside the kernel (rather
    * than with Spark-side trim/lower columns on one surface and Java
    * string methods on the other) is what makes drift impossible: Spark's
    * `trim` strips only ASCII spaces while Java's `trim` strips all
    * control chars, so split normalization gave the two surfaces
    * different fingerprints for inputs with tab/CR edges.
    */
  private[functions] def rollingHashRaw(s: String): Long =
    if (s == null) 0L
    else {
      val t = s.replaceAll("\\s+", " ").trim.toLowerCase(java.util.Locale.ROOT)
      var h = 1125899906842597L
      var i = 0
      val n = t.length
      while (i < n) { h = 31 * h + t.charAt(i); i += 1 }
      h
    }

  val rollingHash: Column => Column = {
    val u = udf { (s: String) => rollingHashRaw(s) }
    c => u(c)
  }

  /** Word w-shingles of the normalized text (distinct). */
  def shingles(text: Column, w: Int): Column = {
    val ws = words(lower(text))
    when(size(ws) < w, array().cast("array<string>"))
      .otherwise(array_distinct(transform(
        sequence(lit(0), size(ws) - w),
        i => concat_ws(" ", slice(ws, i + 1, lit(w))))))
  }

  /** Iterate the DISTINCT word w-shingles of `ws` (first-seen order) —
    * the shared tight-loop kernel of the sketch UDFs below. Produces
    * exactly the strings of [[shingles]] (`concat_ws(" ", slice(ws, i+1,
    * w))` over a length-w slice == the " "-join of the w words, and
    * `array_distinct` == first-seen dedup); building them in one Scala
    * pass replaces the interpreted higher-order pipeline, which
    * re-evaluated the `split` inside the `transform` lambda once PER
    * ELEMENT (O(words^2) per document — the round-6 plan audit's biggest
    * per-row cost; see plans/r06/dedup_ngram_jaccard_before.txt node (3)).
    */
  @inline private def foreachDistinctShingle(ws: Seq[String], w: Int)(
      f: String => Unit): Unit =
    if (ws != null && ws.length >= w) {
      val arr: IndexedSeq[String] = ws match {
        case is: IndexedSeq[String] => is
        case other => other.toIndexedSeq
      }
      val seen = new java.util.HashSet[String]()
      val sb = new java.lang.StringBuilder
      var j = 0
      val last = arr.length - w
      while (j <= last) {
        sb.setLength(0)
        var t = 0
        while (t < w) {
          if (t > 0) sb.append(' ')
          sb.append(arr(j + t))
          t += 1
        }
        val s = sb.toString
        if (seen.add(s)) f(s)
        j += 1
      }
    }

  /** Distinct word w-shingles as 64-bit xxhash64 values (same hash —
    * identical seed-42 XXH64 over UTF-8 bytes — as the Catalyst
    * `xxhash64` of the shingle string). The scale form of the shingle
    * pipeline: downstream joins/exchanges carry an 8-byte key instead of
    * a w-word string, and the per-row cost is one tight loop instead of
    * the interpreted per-element transform (see [[foreachDistinctShingle]]).
    * Count of the result == count of distinct string shingles, exactly;
    * hash equality == string equality modulo 2^-64-scale collisions.
    */
  def shingleHashes(text: Column, w: Int): Column = {
    val u = udf { (ws: Seq[String]) =>
      val out = new scala.collection.mutable.ArrayBuilder.ofLong
      foreachDistinctShingle(ws, w) { s =>
        out += org.apache.spark.sql.catalyst.expressions.XXH64.hashUTF8String(
          org.apache.spark.unsafe.types.UTF8String.fromString(s), 42L)
      }
      out.result()
    }
    u(words(lower(text)))
  }

  /** MinHash signature (k permutations) over word shingles. One tight-loop
    * UDF pass over the WORDS array: shingles are built inline
    * ([[foreachDistinctShingle]] semantics — dedup is skipped because a
    * min-fold over duplicates equals the min over the distinct set) and
    * the k per-seed minima fold in the same traversal. (A pure-Column
    * formulation — k `array_min(transform(...))` terms — recomputes the
    * shingle expression k times; the previous shingles-column input paid
    * the interpreted per-element `split` re-evaluation. Both measured
    * slower; signatures are bit-identical across all three forms.)
    */
  def minhashSignature(text: Column, w: Int = 3, k: Int = 16): Column = {
    val u = udf { (ws: Seq[String]) =>
      val sig = Array.fill(k)(Long.MaxValue)
      if (ws != null && ws.length >= w) {
        val arr: IndexedSeq[String] = ws match {
          case is: IndexedSeq[String] => is
          case other => other.toIndexedSeq
        }
        val sb = new java.lang.StringBuilder
        var j = 0
        val last = arr.length - w
        while (j <= last) {
          sb.setLength(0)
          var t = 0
          while (t < w) {
            if (t > 0) sb.append(' ')
            sb.append(arr(j + t))
            t += 1
          }
          val base = scala.util.hashing.MurmurHash3.stringHash(sb.toString)
          var i = 0
          while (i < k) {
            // splitmix-style per-seed remix of the base hash
            var x = base.toLong ^ (i.toLong * 0x9e3779b97f4a7c15L)
            x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
            x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
            x = x ^ (x >>> 31)
            if (x < sig(i)) sig(i) = x
            i += 1
          }
          j += 1
        }
      }
      sig
    }
    u(words(lower(text)))
  }

  /** 64-bit SimHash over word shingles (deterministic Scala UDF; the
    * per-bit vote accumulation is clearer and faster rowwise than 64
    * nested higher-order aggregates). Operates on the WORDS array with
    * shingles built inline — votes run over the DISTINCT shingle set,
    * exactly as the previous shingles-column input did (the dedup is
    * semantic here, unlike minhash: duplicate shingles would double-vote).
    */
  val simhash64: Column => Column = {
    val u = udf { (ws: Seq[String]) =>
      val votes = new Array[Int](64)
      var any = false
      foreachDistinctShingle(ws, 3) { s =>
        any = true
        // two murmur seeds -> 64 bits, no intermediate allocation
        val h = scala.util.hashing.MurmurHash3.stringHash(s).toLong << 32 |
          (scala.util.hashing.MurmurHash3.stringHash(s, 0x9747b28c).toLong & 0xffffffffL)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      if (!any) 0L
      else {
        var out = 0L
        var b = 0
        while (b < 64) { if (votes(b) > 0) out |= (1L << b); b += 1 }
        out
      }
    }
    text => u(words(lower(text)))
  }

  /** Hamming distance between two 64-bit sketches. */
  def hamming64(a: Column, b: Column): Column =
    bit_count(a.bitwiseXOR(b))

  // ---- vectors ---------------------------------------------------------

  /** Dot product of two float-array columns in double precision (built-in
    * `aggregate` + `zip_with`, sequential summation: reproducible).
    */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def l2norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity of two float-vector columns, double precision —
    * the native Catalyst expression (whole-stage codegen'd tight loop; a
    * Column-function formulation with `aggregate`/`zip_with` is
    * interpreted per element and measured ~80x slower on wide pair joins).
    * Summation order is sequential over the array, so results match the
    * `aggregate`-based [[dot]] and the DuckDB oracle bit-for-bit.
    */
  def cosine(a: Column, b: Column): Column = Registry.cosineSimilarity(a, b)

  /** Native dot product / euclidean norm of float-vector columns (double
    * precision, codegen'd tight loops). Building blocks for the hoisted
    * pair-cosine below.
    */
  def vecDot(a: Column, b: Column): Column = Registry.vecDot(a, b)
  def vecNorm(v: Column): Column = Registry.vecNorm(v)

  /** [[cosine]] re-expressed over per-ROW precomputed norms so an O(n²)
    * pair join runs ONE array loop per pair instead of three (guide §1.2
    * per-task work): `na`/`nb` must be `vecNorm` of the same vectors.
    * BIT-IDENTICAL to `cosine(a, b)` — same sequential accumulation
    * orders, same final ops, and the zero-norm/length-mismatch/null cases
    * all yield null exactly where the fused expression does (proved in
    * Round6Spec against randomized vectors and every edge case).
    */
  def cosineWithNorms(dot: Column, na: Column, nb: Column): Column =
    when(na === 0.0 || nb === 0.0, lit(null)).otherwise(dot / (na * nb))
}
