package graft.ops

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Text-analysis operators over `documents` — the LLM-training-pipeline
  * surface (language stats, token counting, quality scoring, content
  * fingerprinting, heuristic language ID). All pure Catalyst expressions
  * (split / higher-order functions / md5) — codegen'd, no UDFs, so every
  * operator scales as a plain projection + hash-agg.
  */
object Text {

  /** Whitespace tokens (the `documents.text` corpus is space-joined). */
  private def tokens(c: Column): Column = split(c, " ")

  private val stopwords = Seq("the", "a", "of", "and", "in", "to", "is")

  private def stopTokens(c: Column): Column =
    filter(tokens(c), t => t.isin(stopwords: _*))

  /** Exact duplicate detection by content hash (hash-groupBy dedup — the
    * 100 TB shape: one shuffle on a 128-bit key, no pairwise compare).
    */
  private def q30(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables
      .documents(s, d)
      .groupBy($"source")
      .agg(
        count(lit(1)).as("n_docs"),
        countDistinct(md5($"text".cast("binary"))).as("n_distinct_texts"),
      )
      .withColumn("n_dup_docs", $"n_docs" - $"n_distinct_texts")
      .orderBy($"source")
  }

  private val q30Sql =
    """SELECT source, n_docs, n_distinct_texts,
      |       n_docs - n_distinct_texts AS n_dup_docs
      |FROM (SELECT source, COUNT(*) AS n_docs,
      |             COUNT(DISTINCT md5(text)) AS n_distinct_texts
      |      FROM documents GROUP BY source) t
      |ORDER BY source""".stripMargin

  /** Token counting per language (whitespace tokenization). */
  private def q31(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables
      .documents(s, d)
      .withColumn("n_tokens", size(tokens($"text")))
      .groupBy($"lang")
      .agg(
        count(lit(1)).as("n_docs"),
        sum($"n_tokens").as("sum_tokens"),
        round(avg($"n_tokens"), 4).as("avg_tokens"),
        max($"n_tokens").cast("long").as("max_tokens"),
      )
      .orderBy($"lang")
  }

  private val q31Sql =
    """SELECT lang, COUNT(*) AS n_docs,
      |  CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens,
      |  ROUND(AVG(n_tokens), 4) AS avg_tokens,
      |  MAX(n_tokens) AS max_tokens
      |FROM (SELECT lang, len(string_split(text, ' ')) AS n_tokens
      |      FROM documents) t
      |GROUP BY lang ORDER BY lang""".stripMargin

  /** Quality scoring: stopword ratio + chars-per-token, aggregated per
    * (lang, source) — the filter-before-training signal.
    */
  private def q32(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables
      .documents(s, d)
      .withColumn("n_tokens", size(tokens($"text")))
      .withColumn("n_stop", size(stopTokens($"text")))
      .groupBy($"lang")
      .agg(
        count(lit(1)).as("n_docs"),
        round(avg($"n_stop" / $"n_tokens"), 4).as("avg_stop_ratio"),
        round(avg(length($"text") / $"n_tokens"), 4).as("avg_chars_per_tok"),
        sum(when($"n_stop" / $"n_tokens" > 0.12, 1L).otherwise(0L))
          .as("n_high_stop"),
      )
      .orderBy($"lang")
  }

  private val q32Sql =
    s"""SELECT lang, COUNT(*) AS n_docs,
       |  ROUND(AVG(n_stop / n_tokens), 4) AS avg_stop_ratio,
       |  ROUND(AVG(n_chars / n_tokens), 4) AS avg_chars_per_tok,
       |  CAST(SUM(CASE WHEN n_stop / n_tokens > 0.12 THEN 1 ELSE 0 END)
       |    AS BIGINT) AS n_high_stop
       |FROM (
       |  SELECT lang,
       |    CAST(len(string_split(text, ' ')) AS DOUBLE) AS n_tokens,
       |    CAST(len(list_filter(string_split(text, ' '),
       |      t -> t IN (${stopwords.map("'" + _ + "'").mkString(",")})))
       |      AS DOUBLE) AS n_stop,
       |    CAST(length(text) AS DOUBLE) AS n_chars
       |  FROM documents) t
       |GROUP BY lang ORDER BY lang""".stripMargin

  /** Content fingerprinting: md5 over normalized text (lower + trim +
    * whitespace squeeze) — the canonical-form dedup key.
    */
  private def q33(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val norm = regexp_replace(lower(trim($"text")), " +", " ")
    Tables
      .documents(s, d)
      .withColumn("fp", md5(norm.cast("binary")))
      .groupBy($"source")
      .agg(
        count(lit(1)).as("n_docs"),
        countDistinct($"fp").as("n_fingerprints"),
        min($"fp").as("min_fp"),
      )
      .orderBy($"source")
  }

  private val q33Sql =
    """SELECT source, COUNT(*) AS n_docs,
      |  COUNT(DISTINCT fp) AS n_fingerprints,
      |  MIN(fp) AS min_fp
      |FROM (SELECT source,
      |        md5(regexp_replace(lower(trim(text)), ' +', ' ', 'g')) AS fp
      |      FROM documents) t
      |GROUP BY source ORDER BY source""".stripMargin

  /** q119: WINNOWING document fingerprints (the MOSS scheme) — the
    * rolling-hash fingerprinting layer between exact content hashing
    * (q33: one fingerprint per doc, breaks on any edit) and
    * MinHash/SimHash sketches (q35/q36: fixed-size, similarity-tuned):
    * hash every 3-token shingle, slide a 4-gram window across the hash
    * sequence, keep each window's MINIMUM — a local edit perturbs only
    * the few windows that see it, so near-identical documents share
    * most selected fingerprints, and winnowing GUARANTEES every match
    * of ≥ window+gram tokens is caught (the property random sampling
    * lacks). All selection is lexicographic min over fixed-width md5
    * hex prefixes — cross-engine deterministic with no integer
    * conversion — and the whole pipeline is codegen HOFs (transform /
    * slice / array_min / array_distinct) on one scan, no shuffle
    * before the per-source rollup. Short docs degrade gracefully:
    * fewer grams than a window → one fingerprint (min of all), no
    * grams → none.
    */
  /** Winnowing building blocks, exposed so the Round9Spec property test
    * locks the SHIPPED expressions (over columns `toks` / `gh`), never
    * a private copy that could drift.
    */
  private[graft] val winnowGramsExpr =
    """CASE WHEN size(toks) >= 3 THEN
      |  transform(sequence(1, size(toks) - 2),
      |    i -> substring(md5(cast(concat_ws(' ', slice(toks, i, 3))
      |           as binary)), 1, 8))
      |ELSE cast(array() as array<string>) END""".stripMargin

  private[graft] val winnowWindowsExpr =
    """CASE WHEN size(gh) >= 4 THEN
      |  transform(sequence(1, size(gh) - 3),
      |    j -> array_min(slice(gh, j, 4)))
      |WHEN size(gh) > 0 THEN array(array_min(gh))
      |ELSE cast(array() as array<string>) END""".stripMargin

  private def q119(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables
      .documents(s, d)
      .withColumn("toks", tokens($"text"))
      .withColumn("gh", expr(winnowGramsExpr))
      .withColumn("fps", array_distinct(expr(winnowWindowsExpr)))
      // explode_outer: a doc with no fingerprints still counts as a doc
      .select($"source", $"doc_id", explode_outer($"fps").as("fp"))
      .groupBy($"source")
      .agg(
        countDistinct($"doc_id").as("n_docs"),
        count($"fp").as("sum_fps"),
        countDistinct($"fp").as("n_distinct_fps"),
        min($"fp").as("min_fp"),
      )
      .orderBy($"source")
  }

  private val q119Sql =
    """WITH t AS (SELECT source, doc_id, string_split(text, ' ') AS toks
      |           FROM documents),
      |g AS (SELECT source, doc_id,
      |        CASE WHEN len(toks) >= 3 THEN
      |          list_transform(generate_series(1, len(toks) - 2),
      |            i -> substr(md5(array_to_string(toks[i:i+2], ' ')), 1, 8))
      |        ELSE [] END AS gh
      |      FROM t),
      |w AS (SELECT source, doc_id,
      |        list_distinct(
      |          CASE WHEN len(gh) >= 4 THEN
      |            list_transform(generate_series(1, len(gh) - 3),
      |              j -> list_min(gh[j:j+3]))
      |          WHEN len(gh) > 0 THEN [list_min(gh)]
      |          ELSE [] END) AS fps
      |      FROM g),
      |e AS (SELECT source, doc_id,
      |        unnest(CASE WHEN len(fps) = 0 THEN [NULL] ELSE fps END) AS fp
      |      FROM w)
      |SELECT source, COUNT(DISTINCT doc_id) AS n_docs,
      |  COUNT(fp) AS sum_fps,
      |  COUNT(DISTINCT fp) AS n_distinct_fps,
      |  MIN(fp) AS min_fp
      |FROM e GROUP BY source ORDER BY source""".stripMargin

  /** q264: DUPLICATED-SPAN EXTRACTION — the variable-length exact
    * grain between q140's fixed 4-token passages and q124's fixed
    * 13-grams, and the step q119's winnowing stops short of: winnowing
    * COUNTS shared fingerprints, this RECONSTRUCTS the maximal
    * duplicated spans themselves (the Lee-et-al-style "what exactly is
    * the boilerplate" answer, suffix-array-lite). Device: hash every
    * 6-token gram; a gram is DUP if it occurs in ≥ 2 distinct docs; a
    * maximal duplicated span is a maximal RUN of consecutive dup gram
    * positions (the q153 islands trick: pos − row_number is constant
    * within a run), covering tokens [p0+1, p1+6] — every cross-doc
    * duplicate of ≥ 6 tokens is found in full, at ANY length, because
    * each of its 6-grams is itself duplicated. Span text is rebuilt by
    * slicing the doc's own token array. Exact and string-free on the
    * wire where it matters: the gram join shuffles 16-hex hashes, and
    * the islands window is one per-doc pass. Round14Spec pins EDIT
    * LOCALITY: one edited token in a cloned doc splits the extraction
    * into exactly the two flanking spans, with only the edit's ±5-gram
    * neighborhood uncovered.
    */
  private def q264(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val G = 6
    // the 6-gram position explode + per-gram md5 is computed twice
    // (dup aggregate + hits join) upstream of any exchange — spread a
    // narrow scan first (layout-adaptive; no-op at production split
    // counts, so the hash-only-shuffle discipline below is untouched
    // where it matters)
    val toksArr = Scale
      .spreadIfNarrow(Tables.documents(s, d), $"doc_id")
      .select($"doc_id", tokens($"text").as("toks"))
    val grams = toksArr
      .where(size($"toks") >= G)
      .select($"doc_id", posexplode(expr(
        s"transform(sequence(1, size(toks) - ${G - 1}), " +
          "i -> substring(md5(cast(concat_ws(' ', slice(toks, i, " +
          s"$G)) as binary)), 1, 16))")).as(Seq("p", "gh")))
    val dup = grams
      .groupBy($"gh")
      .agg(countDistinct($"doc_id").as("nd"))
      .where($"nd" >= 2)
      .select($"gh")
    val hits = grams.join(dup, Seq("gh")).select($"doc_id", $"p")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"doc_id").orderBy($"p")
    val runs = hits
      .withColumn("grp", $"p" - row_number().over(w))
      .groupBy($"doc_id", $"grp")
      .agg(min($"p").as("p0"), max($"p").as("p1"))
    runs
      .join(toksArr, Seq("doc_id"))
      .select($"doc_id",
        ($"p0" + 1L).cast("long").as("start_pos"),
        ($"p1" - $"p0" + G).cast("long").as("span_len"),
        expr(s"concat_ws(' ', slice(toks, p0 + 1, p1 - p0 + $G))")
          .as("span_text"))
      .orderBy($"doc_id", $"start_pos")
  }

  private val q264Sql =
    """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
      |           FROM documents),
      |g AS (SELECT doc_id, u.i - 1 AS p,
      |        substr(md5(array_to_string(toks[u.i:u.i+5], ' ')), 1, 16)
      |          AS gh
      |      FROM t, UNNEST(generate_series(1, len(toks) - 5)) AS u(i)
      |      WHERE len(toks) >= 6),
      |dup AS (SELECT gh FROM g
      |        GROUP BY gh HAVING COUNT(DISTINCT doc_id) >= 2),
      |h AS (SELECT doc_id, p FROM g JOIN dup USING (gh)),
      |r AS (SELECT doc_id, p,
      |        p - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY p)
      |          AS grp
      |      FROM h),
      |runs AS (SELECT doc_id, grp, MIN(p) AS p0, MAX(p) AS p1
      |         FROM r GROUP BY doc_id, grp)
      |SELECT runs.doc_id, p0 + 1 AS start_pos,
      |  CAST(p1 - p0 + 6 AS BIGINT) AS span_len,
      |  array_to_string(t.toks[p0 + 1:p1 + 6], ' ') AS span_text
      |FROM runs JOIN t ON t.doc_id = runs.doc_id
      |ORDER BY runs.doc_id, start_pos""".stripMargin

  /** Heuristic language ID (n-gram/stopword signals as a deterministic
    * decision list) vs the labeled `lang` column → confusion counts.
    * The corpus is a shared-vocabulary word soup, so the heuristic's
    * value here is the operator shape (pure expression, groupable),
    * not classification accuracy.
    */
  private def langidExpr(s: SparkSession): Column = {
    import s.implicits._
    val toks  = size(tokens($"text"))
    val stops = size(stopTokens($"text"))
    val ratio = stops.cast("double") / toks
    when(ratio > 0.10, "en")
      .when(ratio > 0.06, "de")
      .when(toks > 60, "fr")
      .when(length($"text") > 300, "es")
      .otherwise("zh")
  }

  private def q34(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables
      .documents(s, d)
      .withColumn("predicted", langidExpr(s))
      .groupBy($"lang", $"predicted")
      .agg(count(lit(1)).as("n"))
      .orderBy($"lang", $"predicted")
  }

  private val q34Sql =
    s"""SELECT lang, predicted, COUNT(*) AS n
       |FROM (
       |  SELECT lang,
       |    CASE WHEN ratio > 0.10 THEN 'en'
       |         WHEN ratio > 0.06 THEN 'de'
       |         WHEN toks > 60 THEN 'fr'
       |         WHEN n_chars > 300 THEN 'es'
       |         ELSE 'zh' END AS predicted
       |  FROM (
       |    SELECT lang, length(text) AS n_chars,
       |      len(string_split(text, ' ')) AS toks,
       |      CAST(len(list_filter(string_split(text, ' '),
       |        t -> t IN (${stopwords.map("'" + _ + "'").mkString(",")})))
       |        AS DOUBLE) / len(string_split(text, ' ')) AS ratio
       |    FROM documents) a) b
       |GROUP BY lang, predicted
       |ORDER BY lang, predicted""".stripMargin

  /** BPE-ish sub-word pre-tokenization: the GPT-2-style pre-tokenizer
    * regex, simplified to the alternation-only subset that Java regex
    * (Spark) and RE2 (DuckDB) evaluate identically — letter runs, digit
    * runs, and punctuation runs, each with an optional leading space.
    * Counts both tokenizations per document, aggregated per language —
    * the "how many training tokens is this corpus" question, where
    * whitespace counting undercounts punctuation-heavy text.
    */
  private val bpePattern = " ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 ]+"

  private def q38(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables
      .documents(s, d)
      .withColumn("n_bpe",
        size(regexp_extract_all($"text", lit(bpePattern), lit(0))))
      .withColumn("n_ws", size(tokens($"text")))
      .groupBy($"lang")
      .agg(
        count(lit(1)).as("n_docs"),
        sum($"n_bpe").cast("long").as("sum_bpe_tokens"),
        round(avg($"n_bpe".cast("double") / $"n_ws"), 4)
          .as("avg_bpe_per_word"),
        max($"n_bpe").cast("long").as("max_bpe_tokens"),
      )
      .orderBy($"lang")
  }

  private val q38Sql =
    s"""SELECT lang, COUNT(*) AS n_docs,
       |  CAST(SUM(n_bpe) AS BIGINT) AS sum_bpe_tokens,
       |  ROUND(AVG(CAST(n_bpe AS DOUBLE) / n_ws), 4) AS avg_bpe_per_word,
       |  CAST(MAX(n_bpe) AS BIGINT) AS max_bpe_tokens
       |FROM (SELECT lang,
       |        len(regexp_extract_all(text, '$bpePattern')) AS n_bpe,
       |        len(string_split(text, ' ')) AS n_ws
       |      FROM documents) t
       |GROUP BY lang ORDER BY lang""".stripMargin

  /** The pretrained BPE merge table q128 applies — ordered (a merge may
    * consume the product of an earlier one: `t h→th` before `th e→the`),
    * staged as a plan constant the way a production tokenizer ships its
    * `merges.txt`. Training-side machinery lives in [[learnBpeMerges]]
    * (bounded-sample driver learn, gated in Round10Spec); the APPLY step
    * — the pipeline operation that runs over the 100 TB — uses this
    * fixed table so the DuckDB oracle can replay the identical rewrite
    * chain and the row stays hash-exact.
    */
  private[graft] val bpeMerges: Seq[(String, String)] = Seq(
    "t" -> "h", "i" -> "n", "a" -> "n", "r" -> "e", "o" -> "n",
    "e" -> "r", "th" -> "e", "a" -> "t", "e" -> "n", "o" -> "r",
    "s" -> "t", "e" -> "d", "i" -> "s", "i" -> "t", "o" -> "u",
    "a" -> "r", "an" -> "d", "in" -> "g", "t" -> "o", "o" -> "f",
    "e" -> "s", "a" -> "l", "l" -> "e", "c" -> "h", "w" -> "h",
    "s" -> "h", "er" -> "s", "re" -> "s", "o" -> "w", "a" -> "s",
    "ou" -> "t", "it" -> "h",
  )

  /** One BPE merge step ≡ one literal `replace` on the DOUBLE-spaced
    * symbol string (see [[bpeSpaced]]): searching `" a  b "` and writing
    * `" ab "` rewrites all non-overlapping occurrences left-to-right,
    * which is exactly how a learned merge is applied to a word — so the
    * folded chain IS classic BPE application, not an approximation.
    * The boundary spaces in the search string stop a pair from matching
    * INSIDE a multi-char symbol (symbols `st,h` contain no `" t  h "`),
    * and the two-space separator keeps consecutive occurrences from
    * overlapping: each match consumes one space from each flanking
    * pair, so `" t  h  t  h "` merges to `" th  th "` in one pass while
    * the single-space around the replacement restores the invariant.
    * Codegen string ops end-to-end; Round10Spec proves the chain equal
    * to a driver-side reference BPE applier token-for-token.
    */
  private[graft] def bpeApply(spaced: Column): Column =
    bpeMerges.foldLeft(spaced) { case (c, (a, b)) =>
      replace(c, lit(s" $a  $b "), lit(s" ${a + b} "))
    }

  /** Double-spaced symbol string of a pre-token: every char becomes
    * `" c "`, so symbols end up separated by two spaces with one space
    * at each end (`"the"` → `" t  h  e "`). The `[\s\S]` class (not
    * `.`) spaces EVERY char identically in Java regex and RE2 — `.`
    * excludes different line-terminator sets in the two engines, which
    * would silently de-sync the Spark result from the DuckDB oracle on
    * a token with an embedded control char. Tokens are pre-trimmed and
    * space-free (the pre-tokenizer classes exclude `' '`), so the
    * spacing is unambiguous. Symbol count = `split` on the two-space
    * separator.
    */
  private def bpeSpaced(tok: Column): Column =
    regexp_replace(trim(tok), "([\\s\\S])", " $1 ")

  /** q128: learned-merge BPE tokenization — the missing half of q38's
    * regex PRE-tokenizer: each pre-token is exploded to symbols and the
    * ordered merge table is applied (chained literal `replace`, one per
    * merge — see [[bpeApply]]), yielding REAL subword token counts, the
    * quantity mixture weighting (q60) and sequence packing (q54) are
    * proxied on. Per-doc work is pure higher-order functions over the
    * pre-token array — zero shuffle before the per-lang rollup; the
    * merge table is a broadcast-free plan constant. Reports per lang:
    * docs, pre-tokens, chars, BPE tokens, and the char→token
    * compression the merges achieve. DuckDB replays the identical
    * rewrite chain, so the row is hash-exact end-to-end.
    */
  private def q128(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val toks = filter(
      regexp_extract_all($"text", lit(bpePattern), lit(0)),
      t => length(trim(t)) > 0)
    Tables
      .documents(s, d)
      .withColumn("toks", toks)
      .withColumn("n_pre", size($"toks").cast("long"))
      .withColumn("n_chars",
        aggregate($"toks", lit(0L),
          (acc, t) => acc + length(trim(t)).cast("long")))
      .withColumn("n_bpe",
        aggregate($"toks", lit(0L),
          (acc, t) => acc + size(split(bpeApply(bpeSpaced(t)), "  "))
            .cast("long")))
      .groupBy($"lang")
      .agg(
        count(lit(1)).as("n_docs"),
        sum($"n_pre").as("n_pre_tokens"),
        sum($"n_chars").as("n_chars"),
        sum($"n_bpe").as("n_bpe_tokens"),
        round(sum($"n_chars").cast("double") / sum($"n_bpe"), 4)
          .as("char_compression"),
      )
      // a lang whose docs produce ZERO pre-tokens would divide 0/0 here
      // while the oracle's d⋈a inner join drops it — align on "langs
      // with at least one token" explicitly (vacuous on this corpus,
      // load-bearing on a degenerate one)
      .filter($"n_pre_tokens" > 0L)
      .orderBy($"lang")
  }

  /** The identical rewrite chain in DuckDB SQL, generated from the same
    * [[bpeMerges]] constant — the two engines cannot drift apart.
    */
  private val q128Sql: String = {
    val chain = bpeMerges.foldLeft(
      "regexp_replace(trim(tok), '([\\s\\S])', ' \\1 ', 'g')") {
      case (s0, (a, b)) => s"replace($s0, ' $a  $b ', ' $a$b ')"
    }
    s"""WITH t AS (
       |  SELECT lang, unnest(regexp_extract_all(text, '$bpePattern')) AS tok
       |  FROM documents),
       |m AS (
       |  SELECT lang, length(trim(tok)) AS nch,
       |    len(string_split($chain, '  ')) AS nb
       |  FROM t WHERE length(trim(tok)) > 0),
       |a AS (
       |  SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_pre_tokens,
       |    CAST(SUM(nch) AS BIGINT) AS n_chars,
       |    CAST(SUM(nb) AS BIGINT) AS n_bpe_tokens
       |  FROM m GROUP BY lang),
       |d AS (SELECT lang, COUNT(*) AS n_docs FROM documents GROUP BY lang)
       |SELECT d.lang, d.n_docs, a.n_pre_tokens, a.n_chars, a.n_bpe_tokens,
       |  ROUND(CAST(a.n_chars AS DOUBLE) / a.n_bpe_tokens, 4)
       |    AS char_compression
       |FROM d JOIN a ON d.lang = a.lang ORDER BY d.lang""".stripMargin
  }

  /** Unknown-character fallback cost (milli-nats) for the unigram
    * tokenizer — the char-fallback guarantee SentencePiece ships:
    * segmentation is total even on chars the vocab never saw. A plan
    * constant shared by the Spark DP, the DuckDB oracle, and the
    * driver reference.
    */
  private[graft] val unigramUnkCostMilli = 20000L

  /** The pretrained UNIGRAM piece table q179 applies — (piece,
    * cost-in-milli-nats), cost = −ln(p)·1000 from the EM-trained piece
    * probabilities. Generated by [[learnUnigramPieces]] over the
    * sf0.001 corpus (`tools/TrainUnigram.scala` regenerates it) and
    * staged as a plan constant the way a production tokenizer ships
    * `unigram.model` — the APPLY step is what runs over the 100 TB,
    * so it uses this fixed table and the DuckDB oracle replays the
    * identical Viterbi DP from the same constant.
    */
  private[graft] val unigramPieces: Seq[(String, Long)] = Seq(
    "a" -> 2136L, "b" -> 4124L, "batch" -> 4102L, "c" -> 4024L,
    "column" -> 4030L, "customer" -> 4125L, "d" -> 4086L, "e" -> 2978L,
    "f" -> 4099L, "filter" -> 4094L, "g" -> 2979L, "group" -> 4076L,
    "h" -> 2994L, "i" -> 4124L, "in" -> 3375L, "j" -> 4074L,
    "k" -> 4064L, "l" -> 3383L, "m" -> 10915L, "merge" -> 4075L,
    "n" -> 4024L, "o" -> 4074L, "or" -> 4034L, "order" -> 4033L,
    "ow" -> 3427L, "p" -> 7548L, "par" -> 4045L, "q" -> 10915L,
    "query" -> 4076L, "r" -> 4151L, "s" -> 2672L, "small" -> 4115L,
    "spark" -> 4102L, "st" -> 4099L, "stream" -> 4092L, "t" -> 2688L,
    "table" -> 4110L, "u" -> 7548L, "v" -> 10915L, "value" -> 4059L,
    "vector" -> 4079L, "w" -> 10915L, "window" -> 4032L, "y" -> 4064L,
  )

  /** Driver-side reference Viterbi for the unigram tokenizer: minimal
    * combined metric M = totalCost·256 + nPieces over all segmentations
    * (strictly-less improvement, pieces tried longest-first then
    * lexicographic, UNK single-char fallback as the baseline — the
    * M-encoding makes the OPTIMUM value unambiguous even when paths
    * tie). Returns (M, pieces) with UNK chars marked by a space prefix
    * (pieces are space-free; tokens split on space). Used by the EM trainer's E-step and by Round11Spec as the
    * equivalence reference for the distributed DP.
    */
  private[graft] def unigramSegmentRef(
      w: String, costs: Map[String, Long]): (Long, List[String]) = {
    val n = w.length
    val ps = costs.toSeq.sortBy { case (p, _) => (-p.length, p) }
    val dp = Array.fill(n + 1)(Long.MaxValue)
    val back = Array.fill(n + 1)("")
    dp(0) = 0L
    for (i <- 1 to n) {
      var best = dp(i - 1) + unigramUnkCostMilli * 256L + 1L
      var bp = ""
      ps.foreach { case (p, c) =>
        val l = p.length
        if (l <= i && w.regionMatches(i - l, p, 0, l)) {
          val v = dp(i - l) + c * 256L + 1L
          if (v < best) { best = v; bp = p }
        }
      }
      dp(i) = best
      back(i) = bp
    }
    var i = n
    var path = List.empty[String]
    while (i > 0) {
      val p = back(i)
      if (p.isEmpty) { path = (" " + w.substring(i - 1, i)) :: path; i -= 1 }
      else { path = p :: path; i -= p.length }
    }
    (dp(n), path)
  }

  /** Learn a unigram (SentencePiece-class) piece table from the corpus —
    * the OTHER tokenizer family next to q128's BPE, under the same
    * bounded-driver discipline: ONE distributed word-frequency
    * aggregate, a top-`vocabTarget` cut to the driver (≤ vocabTarget
    * (word, weight) rows whatever the corpus size), then Viterbi-EM on
    * that weighted sample: seed = all substrings up to `maxPieceLen`
    * scored by chars-covered, E-step = Viterbi piece counts under
    * current costs, M-step = costs from re-normalized counts, unused
    * multi-char pieces pruned, single chars kept alive (fallback
    * guarantee). Deterministic throughout (sorted ties), so the learned
    * table is stable across partitionings and re-runs.
    */
  def learnUnigramPieces(
      docs: DataFrame,
      vocabTarget: Int = 2048,
      maxPieces: Int = 64,
      maxPieceLen: Int = 8,
      nIters: Int = 4,
  ): Seq[(String, Long)] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val vocab = docs
      .select(explode(tokens(col("text"))).as("tok"))
      .filter(length($"tok") > 0)
      .groupBy($"tok")
      .agg(count(lit(1)).as("n"))
      .orderBy($"n".desc, $"tok")
      .limit(vocabTarget)
      .as[(String, Long)]
      .collect()
    val seed = scala.collection.mutable.Map.empty[String, Long]
    vocab.foreach { case (w, n) =>
      for {
        i <- 0 until w.length
        l <- 1 to math.min(maxPieceLen, w.length - i)
      } {
        val p = w.substring(i, i + l)
        seed(p) = seed.getOrElse(p, 0L) + n
      }
    }
    val chars = seed.keys.filter(_.length == 1).toSeq.sorted
    val multi = seed.toSeq
      .filter(_._1.length > 1)
      .sortBy { case (p, c) => (-c * p.length, p) } // weight = chars covered
      .take(math.max(0, maxPieces - chars.length))
      .map(_._1)
    def costsFrom(counts: Map[String, Long]): Map[String, Long] = {
      val total = math.max(1L, counts.values.sum).toDouble
      counts.map { case (p, c) =>
        p -> math.max(1L, math.round(-math.log(c / total) * 1000.0))
      }
    }
    var costs = costsFrom(
      (chars ++ multi).map(p => p -> seed(p)).toMap)
    for (_ <- 1 to nIters) {
      val use = scala.collection.mutable.Map.empty[String, Long]
      vocab.foreach { case (w, n) =>
        val (_, path) = unigramSegmentRef(w, costs)
        path.foreach { p =>
          if (!p.startsWith(" ")) use(p) = use.getOrElse(p, 0L) + n
        }
      }
      chars.foreach(c => if (!use.contains(c)) use(c) = 1L)
      costs = costsFrom(use.toMap)
    }
    costs.toSeq.sortBy(_._1)
  }

  /** Distributed Viterbi segmentation metric for one word column under
    * an arbitrary piece table: M = totalCost·256 + nPieces of the
    * optimal segmentation (cost in milli-nats; nPieces < 256 holds for
    * any word under 256 chars — pre-tokens here are ≤ tens of chars).
    * Pure higher-order functions over a per-word DP array — zero
    * shuffle, zero UDFs: `aggregate` grows the dp vector one char at a
    * time; at each position the piece table (a plan-constant struct
    * array) is filtered to the pieces matching the suffix ending there
    * and `array_min` picks the best predecessor, with the UNK
    * char-fallback as baseline. The M-encoding makes the minimum
    * unambiguous across engines even when distinct paths tie on cost.
    */
  private[graft] def unigramM(
      tok: Column, pieces: Seq[(String, Long)]): Column = {
    val piecesArr = array(pieces.map { case (p, c) =>
      struct(lit(p).as("p"), lit(p.length).as("l"), lit(c).as("c"))
    }: _*)
    aggregate(
      sequence(lit(1), length(tok)),
      array(lit(0L)),
      (dp, i) =>
        array_append(
          dp,
          array_min(concat(
            transform(
              filter(piecesArr, pc =>
                pc.getField("l") <= i &&
                  tok.substr(i - pc.getField("l") + lit(1), pc.getField("l"))
                    === pc.getField("p")),
              pc =>
                element_at(dp, i - pc.getField("l") + 1) +
                  pc.getField("c") * lit(256L) + lit(1L)),
            array(element_at(dp, i) +
              lit(unigramUnkCostMilli * 256L + 1L))))),
      dp => element_at(dp, size(dp)))
  }

  /** q179: UNIGRAM-LM (SentencePiece-class) tokenization — the other
    * tokenizer family a data pipeline meets beside q128's BPE: pieces
    * carry PROBABILITIES and a word's tokenization is the Viterbi
    * argmin of total cost, not a greedy merge chain. The corpus rolls
    * up per lang: words, optimal piece count, total cost (milli-nats),
    * and fertility (pieces per word, ppm) — the number that prices a
    * tokenizer before training on the corpus. Plan: one (lang, word)
    * hash-agg with map-side combine (the DP runs once per DISTINCT
    * word, not per occurrence — at 100 TB the distinct-word table is
    * vocabulary-sized), then the HOF DP, then a lang-cardinality
    * aggregate; the piece table is a plan constant, no broadcast, no
    * UDF. The DuckDB oracle replays the IDENTICAL DP as a recursive
    * CTE generated from the same constant, so every count and cost is
    * hash-exact; Round11Spec additionally proves the distributed DP ≡
    * driver reference Viterbi on every vocab word and gates the EM
    * trainer that produced the shipped table.
    */
  private def q179(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val words = Tables
      .documents(s, d)
      .select($"lang", explode(tokens($"text")).as("tok"))
      .where(length($"tok") > 0)
      .groupBy($"lang", $"tok")
      .agg(count(lit(1)).as("n"))
    words
      .withColumn("m", unigramM($"tok", unigramPieces))
      .groupBy($"lang")
      .agg(
        sum($"n").as("n_words"),
        sum($"n" * ($"m" % 256)).as("n_pieces"),
        sum($"n" * expr("m div 256")).as("cost_milli"),
      )
      .withColumn("fertility_ppm", expr("n_pieces * 1000000 div n_words"))
      .orderBy($"lang")
  }

  /** The identical Viterbi DP in DuckDB SQL — a recursive CTE growing
    * the same dp vector, generated from the same [[unigramPieces]]
    * constant, so the two engines cannot drift apart.
    */
  private val q179Sql: String = {
    val vals = unigramPieces
      .map { case (p, c) => s"('$p',${p.length},$c)" }
      .mkString(",")
    s"""WITH RECURSIVE pieces(p, l, c) AS (SELECT * FROM (VALUES $vals) v),
       |words AS (
       |  SELECT lang, tok, COUNT(*) AS n FROM (
       |    SELECT lang, unnest(string_split(text, ' ')) AS tok
       |    FROM documents) t
       |  WHERE len(tok) > 0 GROUP BY lang, tok),
       |dp AS (
       |  SELECT lang, tok, n, 0 AS i, [CAST(0 AS BIGINT)] AS d FROM words
       |  UNION ALL
       |  SELECT lang, tok, n, i + 1,
       |    list_append(d, (
       |      SELECT MIN(v) FROM (
       |        SELECT d[i + 2 - p.l] + p.c * 256 + 1 AS v FROM pieces p
       |        WHERE p.l <= i + 1 AND substr(tok, i + 2 - p.l, p.l) = p.p
       |        UNION ALL
       |        SELECT d[i + 1] + $unigramUnkCostMilli * 256 + 1) cand))
       |  FROM dp WHERE i < len(tok)),
       |seg AS (
       |  SELECT lang, n, d[len(tok) + 1] AS m FROM dp WHERE i = len(tok))
       |SELECT lang, CAST(SUM(n) AS BIGINT) AS n_words,
       |  CAST(SUM(n * (m % 256)) AS BIGINT) AS n_pieces,
       |  CAST(SUM(n * (m // 256)) AS BIGINT) AS cost_milli,
       |  CAST((SUM(n * (m % 256)) * 1000000) // SUM(n) AS BIGINT)
       |    AS fertility_ppm
       |FROM seg GROUP BY lang ORDER BY lang""".stripMargin
  }

  /** q183: the INCREMENTAL-INGEST MANIFEST — round 11's pipeline
    * composed in ONE oracled plan (q135's discipline, this round's
    * operators): the delta batch flows through (1) incremental passage
    * dedup under arrival priority — q177's exact semantics, here as
    * the logical full-recompute so the whole manifest is a single
    * DataFrame (q177 itself proves the store path is equivalent) —
    * survivors keep ≥ 1 passage; (2) a tokenizer-economics gate — the
    * q179 Viterbi DP prices each doc's words and docs costing more
    * than 2 pieces/word (fertility > 2,000,000 ppm — text the
    * tokenizer models poorly) are dropped, the q130-style quality
    * decision made with a REAL model artifact instead of handwritten
    * features; (3) the per-lang ingest ledger — offered, deduped,
    * shipped, with the retained passage-token and piece masses.
    * Every number is exact integers, and the DuckDB oracle replays the
    * IDENTICAL composition — q177's winner CTEs, q179's recursive DP,
    * the same gate — so the row certifies the COMPOSITION is
    * engine-exact, not just each stage. Plan shape: the dedup side is
    * the q140/q177 slim-hash winner join; the DP side runs once per
    * DISTINCT word; both reduce to doc-cardinality ledgers before the
    * final lang rollup — nothing row-sized crosses a shuffle twice.
    */
  private def q183(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, d)
    val delta = docs.where($"doc_id" % 10 >= 8)
    // stage 1 — arrival-priority passage dedup, delta survivors
    val chunks = passageChunks(docs)
    val winners = chunks
      .withColumn("batch",
        when($"doc_id" % 10 < 8, 0).otherwise(1))
      .groupBy($"ph")
      .agg(min(struct($"batch", $"doc_id", $"chunk_idx")).as("w"))
    val deltaKept = chunks
      .join(winners, "ph")
      .where($"w.batch" === 1 &&
        $"doc_id" === $"w.doc_id" && $"chunk_idx" === $"w.chunk_idx")
      .groupBy($"doc_id")
      .agg(
        count(lit(1)).as("n_kept"),
        sum(size(tokens($"passage"))).cast("long").as("kept_tokens"))
    // stage 2 — unigram token economics per doc (DP per DISTINCT word)
    val words = delta
      .select($"doc_id", explode(tokens($"text")).as("tok"))
      .where(length($"tok") > 0)
      .groupBy($"doc_id", $"tok")
      .agg(count(lit(1)).as("n"))
    val wordM = words.select($"tok").distinct()
      .withColumn("m", unigramM($"tok", unigramPieces))
    val docCost = words
      .join(wordM, "tok")
      .groupBy($"doc_id")
      .agg(
        sum($"n").as("n_words"),
        sum($"n" * ($"m" % 256)).as("n_pieces"),
        sum($"n" * expr("m div 256")).as("cost_milli"))
      .withColumn("fert_ppm", expr("n_pieces * 1000000 div n_words"))
    // stage 3 — gate + per-lang ingest ledger
    val fertCapPpm = 2000000L
    delta
      .select($"doc_id", $"lang")
      .join(deltaKept, Seq("doc_id"), "left")
      .join(docCost, Seq("doc_id"), "left")
      .withColumn("survives", coalesce($"n_kept", lit(0L)) > 0L)
      .withColumn("shipped",
        $"survives" && $"fert_ppm" <= fertCapPpm)
      .groupBy($"lang")
      .agg(
        count(lit(1)).as("n_delta_docs"),
        sum(when($"survives", 1L).otherwise(0L)).as("n_dedup_kept"),
        sum(when($"shipped", 1L).otherwise(0L)).as("n_shipped"),
        sum(when($"shipped", $"kept_tokens").otherwise(0L))
          .as("shipped_kept_tokens"),
        sum(when($"shipped", $"n_pieces").otherwise(0L))
          .as("shipped_pieces"),
        sum(when($"shipped", $"cost_milli").otherwise(0L))
          .as("shipped_cost_milli"))
      .orderBy($"lang")
  }

  /** The identical three-stage composition in DuckDB — q177's winner
    * CTEs + q179's recursive DP generated from the same piece-table
    * constant + the same fertility gate.
    */
  private val q183Sql: String = {
    val vals = unigramPieces
      .map { case (p, c) => s"('$p',${p.length},$c)" }
      .mkString(",")
    s"""WITH RECURSIVE pieces(p, l, c) AS (SELECT * FROM (VALUES $vals) v),
       |toks AS (
       |  SELECT doc_id, (doc_id % 10 >= 8) AS is_delta,
       |         string_split(text, ' ') AS t
       |  FROM documents),
       |chunks AS (
       |  SELECT doc_id, is_delta, i AS chunk_idx,
       |         array_to_string(t[(i*4+1):(i*4+4)], ' ') AS passage
       |  FROM (SELECT doc_id, is_delta, t,
       |          unnest(generate_series(0, (len(t)-1)//4)) AS i FROM toks) g),
       |surv AS (
       |  SELECT doc_id, passage FROM (
       |    SELECT doc_id, is_delta, passage,
       |           row_number() OVER (PARTITION BY passage
       |             ORDER BY is_delta, doc_id, chunk_idx) AS rn
       |    FROM chunks) r
       |  WHERE rn = 1 AND is_delta),
       |kept AS (
       |  SELECT doc_id, COUNT(*) AS n_kept,
       |         CAST(SUM(len(string_split(passage, ' '))) AS BIGINT)
       |           AS kept_tokens
       |  FROM surv GROUP BY doc_id),
       |words AS (
       |  SELECT doc_id, tok, COUNT(*) AS n FROM (
       |    SELECT doc_id, unnest(string_split(text, ' ')) AS tok
       |    FROM documents WHERE doc_id % 10 >= 8) t
       |  WHERE len(tok) > 0 GROUP BY doc_id, tok),
       |dw AS (SELECT DISTINCT tok FROM words),
       |dp AS (
       |  SELECT tok, 0 AS i, [CAST(0 AS BIGINT)] AS d FROM dw
       |  UNION ALL
       |  SELECT tok, i + 1,
       |    list_append(d, (
       |      SELECT MIN(v) FROM (
       |        SELECT d[i + 2 - p.l] + p.c * 256 + 1 AS v FROM pieces p
       |        WHERE p.l <= i + 1 AND substr(tok, i + 2 - p.l, p.l) = p.p
       |        UNION ALL
       |        SELECT d[i + 1] + $unigramUnkCostMilli * 256 + 1) cand))
       |  FROM dp WHERE i < len(tok)),
       |seg AS (SELECT tok, d[len(tok) + 1] AS m FROM dp WHERE i = len(tok)),
       |doccost AS (
       |  SELECT w.doc_id, SUM(w.n) AS n_words,
       |         SUM(w.n * (s.m % 256)) AS n_pieces,
       |         SUM(w.n * (s.m // 256)) AS cost_milli
       |  FROM words w JOIN seg s USING (tok) GROUP BY w.doc_id),
       |ledger AS (
       |  SELECT d.lang,
       |    COALESCE(k.n_kept, 0) > 0 AS survives,
       |    COALESCE(k.n_kept, 0) > 0 AND
       |      (c.n_pieces * 1000000) // c.n_words <= 2000000 AS shipped,
       |    COALESCE(k.kept_tokens, 0) AS kept_tokens,
       |    c.n_pieces, c.cost_milli
       |  FROM documents d
       |  LEFT JOIN kept k USING (doc_id)
       |  LEFT JOIN doccost c USING (doc_id)
       |  WHERE d.doc_id % 10 >= 8)
       |SELECT lang, COUNT(*) AS n_delta_docs,
       |  CAST(SUM(CASE WHEN survives THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_dedup_kept,
       |  CAST(SUM(CASE WHEN shipped THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_shipped,
       |  CAST(SUM(CASE WHEN shipped THEN kept_tokens ELSE 0 END) AS BIGINT)
       |    AS shipped_kept_tokens,
       |  CAST(SUM(CASE WHEN shipped THEN n_pieces ELSE 0 END) AS BIGINT)
       |    AS shipped_pieces,
       |  CAST(SUM(CASE WHEN shipped THEN cost_milli ELSE 0 END) AS BIGINT)
       |    AS shipped_cost_milli
       |FROM ledger GROUP BY lang ORDER BY lang""".stripMargin
  }

  // ---- q322: pipeline manifest v4 --------------------------------------

  /** Per-doc token economics over the WHOLE corpus — q183's stage 2
    * without the delta cut (v4 prices every doc it ships). */
  private def mf4DocCost(docs: DataFrame): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    val words = docs
      .select($"doc_id", explode(tokens($"text")).as("tok"))
      .where(length($"tok") > 0)
      .groupBy($"doc_id", $"tok")
      .agg(count(lit(1)).as("n"))
    val wordM = words.select($"tok").distinct()
      .withColumn("m", unigramM($"tok", unigramPieces))
    words.join(wordM, "tok")
      .groupBy($"doc_id")
      .agg(
        sum($"n").as("n_words"),
        sum($"n" * ($"m" % 256)).as("n_pieces"))
      .withColumn("fert_ppm", expr("n_pieces * 1000000 div n_words"))
  }

  /** ONE version of the v4 manifest: the tokenizer-economics gate
    * (q183's, here over the whole corpus) always fires; the
    * embedding-space semantic prune (q55/q147's verdict — lowest id
    * in a ≥τ near-dup pair survives, label-blocked) only in v2.
    * Survivors get their epoch-0 resumable-schedule positions via
    * [[Rank.globalRank]] (q319's rank semantics, never a
    * partition-less window) and roll up per worker shard.
    */
  private[graft] def manifestV4Version(
      s: SparkSession, d: String, semantic: Boolean): DataFrame = {
    import s.implicits._
    val econ = mf4DocCost(Tables.documents(s, d))
    val gated = econ.where($"fert_ppm" <= lit(2000000L))
      .select($"doc_id", $"n_words", $"n_pieces")
    val shipped =
      if (!semantic) gated
      else gated.join(
        Corpus.blockedNearDupPairs(
          Tables.embeddings(s, d), minCosine = 0.3)
          .select($"b".as("doc_id")).distinct(),
        Seq("doc_id"), "left_anti")
    val keyed = shipped.withColumn("okey",
      md5(concat(lit("mf4:0:"), $"doc_id".cast("string")).cast("binary")))
    Rank.globalRank(keyed, Seq($"okey", $"doc_id"), "step")
      .withColumn("shard", expr("step DIV 64"))
      .groupBy($"shard")
      .agg(
        count(lit(1)).as("n_docs"),
        min($"step").as("min_step"),
        max($"step").as("max_step"),
        sum($"n_words").as("n_words"),
        sum($"n_pieces").as("n_pieces"))
  }

  /** q322: PIPELINE MANIFEST v4 — the r12–r16 era layers composed in
    * ONE oracled deliverable (the q79 → q135 → q183 lineage): the
    * corpus flows through (1) the unigram tokenizer-economics gate
    * (q183's fertility cap, a REAL model artifact pricing every doc),
    * (2) the embedding-space semantic prune (q55/q147's verdict), (3)
    * the resumable trainer schedule (q319's md5 rank + worker shards,
    * assigned by the shared two-pass device), and (4) REGISTRY
    * LINEAGE (q317's verb applied to the data manifest): v1 = the
    * gate-only pipeline, v2 = gate ∘ semantic prune, each committed
    * through [[graft.streaming.StoreLog]] atomic renames, and the
    * registered query READS BOTH VERSIONS BACK from the log — the
    * deliverable is the per-(version, shard) ledger, so the v1↔v2
    * drift (which shards thinned, which token mass left) is the
    * rollback view a data registry exists to answer. Every number is
    * exact integers (the one float, q55's ROUND(cos, 4), is the
    * identical-operand-order device) and the DuckDB oracle replays the
    * ENTIRE composition — the recursive Viterbi DP, the cosine prune,
    * the md5 rank, both versions — so a green row certifies the
    * COMPOSITION, not just each stage (q135's discipline); Round17Spec
    * additionally proves every stage moved the ledger (q142's lesson).
    * Scale: the DP runs per DISTINCT word, the prune is label-blocked,
    * the rank is the two-pass prefix sum, the ledger is shard-sized,
    * and the registry read-back is partition-pruned to the version
    * asked for.
    */
  /** Freshness key component of the SECOND source (embeddings) for the
    * manifest-family stores — [[StoreGuard.sourceFreshness]]'s shared
    * recipe, so a same-length embeddings rewrite can't serve a stale
    * manifest and a recipe change covers both sources together.
    */
  private[graft] def embFreshness(s: SparkSession, d: String): String =
    StoreGuard.sourceFreshness(s, d, "embeddings.parquet")

  private def q322(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    // the manifest derives from documents AND embeddings — fold the
    // second source's freshness into the store key
    val root = StoreGuard.storeRoot(s, "target/graft_text_store", "mf4",
      d, "documents.parquet", embFreshness(s, d))
    val log = new graft.streaming.StoreLog(
      java.nio.file.Paths.get(root), "mf")
    if (log.versions().size < 2) {
      log.commitTable(1L, manifestV4Version(s, d, semantic = false))
      log.commitTable(2L, manifestV4Version(s, d, semantic = true))
    }
    def ver(v: Long) =
      log.asOf(s, v).get.withColumn("version", lit(v))
    ver(1L).unionByName(ver(2L))
      .select($"version", $"shard", $"n_docs", $"min_step", $"max_step",
        $"n_words", $"n_pieces")
      .orderBy($"version", $"shard")
  }

  // ---- q325: incremental manifest v4 -----------------------------------

  /** Ledger tail shared by the full (q322) and incremental (q325) v4
    * pipelines: shipped per-doc rows → schedule rank → per-shard
    * ledger.
    */
  private def mf4Ledger(shipped: DataFrame): DataFrame = {
    val s = shipped.sparkSession
    import s.implicits._
    val keyed = shipped.withColumn("okey",
      md5(concat(lit("mf4:0:"), $"doc_id".cast("string")).cast("binary")))
    Rank.globalRank(keyed, Seq($"okey", $"doc_id"), "step")
      .withColumn("shard", expr("step DIV 64"))
      .groupBy($"shard")
      .agg(
        count(lit(1)).as("n_docs"),
        min($"step").as("min_step"),
        max($"step").as("max_step"),
        sum($"n_words").as("n_words"),
        sum($"n_pieces").as("n_pieces"))
  }

  /** q325: INCREMENTAL MANIFEST v4 — q322 maintained the q177/q275/q312
    * way instead of rebuilt: yesterday's job persists the two per-doc
    * sufficient statistics of the composition (the token-economics
    * table and the semantic DROP SET over the base slice,
    * doc_id % 10 < 8); today's delta (% 10 >= 8) is the ONLY text that
    * gets priced (the DP is a pure per-word function, so per-doc
    * economics are doc-local — perfectly incremental), and the drop
    * set updates by its MONOTONicity: adding docs only adds near-dup
    * pairs, so drops(B ∪ D) = drops(B) ∪ drops-from-pairs-touching-D —
    * one label-blocked delta × corpus join, never a corpus² recheck.
    * The merged states flow through the same gate → schedule → ledger
    * tail as q322's v2, and the oracle is the FULL-corpus recompute of
    * that pipeline (q322's v2 arm verbatim) — the driver's green row IS
    * the merge ≡ rebuild proof, the strongest claim an incremental
    * pipeline can make (q177's discipline applied to the whole
    * composed manifest). Scale: delta-sized text scan, delta-blocked
    * pair enumeration, doc-cardinality state merge, two-pass rank.
    */
  private def q325(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val root = StoreGuard.storeRoot(s, "target/graft_text_store",
      "mf4inc", d, "documents.parquet", embFreshness(s, d))
    val docs = Tables.documents(s, d)
    val emb = Tables.embeddings(s, d)
    val isBase = col("doc_id") % 10 < 8
    StoreGuard.ensureBuilt(s, root) {
      // yesterday: price the base slice, and record which base docs a
      // base-blocked near-dup pair drops
      mf4DocCost(docs.where(isBase))
        .write.mode("overwrite").parquet(s"$root/econ")
      Corpus.blockedNearDupPairs(emb.where(col("vec_id") % 10 < 8),
          minCosine = 0.3)
        .select($"b".as("doc_id")).distinct()
        .write.mode("overwrite").parquet(s"$root/drops")
    }
    // today: price ONLY the delta...
    val econ = s.read.parquet(s"$root/econ")
      .unionByName(mf4DocCost(docs.where(!isBase)))
    // ...and extend the drop set by the pairs the delta introduces —
    // each pair has at least one delta side; label blocking bounds the
    // join exactly as in the full pipeline
    val lhs = emb.select($"label", $"vec_id".as("a"),
      $"embedding".as("ea"))
    val rhs = emb.where($"vec_id" % 10 >= 8)
      .select($"label", $"vec_id".as("dv"), $"embedding".as("ed"))
    val deltaPairs = lhs.join(rhs, Seq("label"))
      .filter($"a" =!= $"dv")
      .withColumn("cos", round(graft.functions.VectorExprs
        .vecCosine(s, $"ea", $"ed"), 4))
      .filter($"cos" >= 0.3)
      .select(greatest($"a", $"dv").as("doc_id"))
      .distinct()
    val drops = s.read.parquet(s"$root/drops")
      .unionByName(deltaPairs).distinct()
    val shipped = econ
      .where($"fert_ppm" <= lit(2000000L))
      .select($"doc_id", $"n_words", $"n_pieces")
      .join(drops, Seq("doc_id"), "left_anti")
    mf4Ledger(shipped)
      .select($"shard", $"n_docs", $"min_step", $"max_step",
        $"n_words", $"n_pieces")
      .orderBy($"shard")
  }

  /** The shared v4 CTE prefix — DP pricing, fertility gate, semantic
    * prune — referenced by q322's two-version replay, q325's
    * full-recompute oracle (the merge ≡ rebuild gate), and (over the
    * erasure-reduced relations) q326's rebuild-without oracle.
    * `docsRel`/`embRel` name the relations the pipeline reads — the
    * base tables for q322/q325, filtered subqueries for q326.
    */
  private def mf4CtesOver(docsRel: String, embRel: String): String = {
    val vals = unigramPieces
      .map { case (p, c) => s"('$p',${p.length},$c)" }
      .mkString(",")
    s"""WITH RECURSIVE pieces(p, l, c) AS (SELECT * FROM (VALUES $vals) v),
       |words AS (
       |  SELECT doc_id, tok, COUNT(*) AS n FROM (
       |    SELECT doc_id, unnest(string_split(text, ' ')) AS tok
       |    FROM $docsRel) t
       |  WHERE len(tok) > 0 GROUP BY doc_id, tok),
       |dw AS (SELECT DISTINCT tok FROM words),
       |dp AS (
       |  SELECT tok, 0 AS i, [CAST(0 AS BIGINT)] AS d FROM dw
       |  UNION ALL
       |  SELECT tok, i + 1,
       |    list_append(d, (
       |      SELECT MIN(v) FROM (
       |        SELECT d[i + 2 - p.l] + p.c * 256 + 1 AS v FROM pieces p
       |        WHERE p.l <= i + 1 AND substr(tok, i + 2 - p.l, p.l) = p.p
       |        UNION ALL
       |        SELECT d[i + 1] + $unigramUnkCostMilli * 256 + 1) cand))
       |  FROM dp WHERE i < len(tok)),
       |seg AS (SELECT tok, d[len(tok) + 1] AS m FROM dp WHERE i = len(tok)),
       |econ AS (
       |  SELECT w.doc_id, CAST(SUM(w.n) AS BIGINT) AS n_words,
       |         CAST(SUM(w.n * (s.m % 256)) AS BIGINT) AS n_pieces
       |  FROM words w JOIN seg s USING (tok) GROUP BY w.doc_id),
       |gated AS (
       |  SELECT doc_id, n_words, n_pieces FROM econ
       |  WHERE (n_pieces * 1000000) // n_words <= 2000000),
       |pruned AS (
       |  SELECT DISTINCT b AS doc_id FROM (
       |    SELECT a.vec_id AS a, b.vec_id AS b,
       |      ROUND(list_dot_product(CAST(a.embedding AS DOUBLE[]),
       |                             CAST(b.embedding AS DOUBLE[])) /
       |        (sqrt(list_dot_product(CAST(a.embedding AS DOUBLE[]),
       |                               CAST(a.embedding AS DOUBLE[]))) *
       |         sqrt(list_dot_product(CAST(b.embedding AS DOUBLE[]),
       |                               CAST(b.embedding AS DOUBLE[])))), 4)
       |        AS cos
       |    FROM $embRel a JOIN $embRel b
       |      ON a.label = b.label AND a.vec_id < b.vec_id) p
       |  WHERE cos >= 0.3)""".stripMargin
  }

  private val mf4Ctes: String = mf4CtesOver("documents", "embeddings")

  private val q322Sql: String =
    s"""$mf4Ctes,
       |vers AS (
       |  SELECT CAST(1 AS BIGINT) AS version, g.* FROM gated g
       |  UNION ALL
       |  SELECT CAST(2 AS BIGINT), g.* FROM gated g
       |  WHERE g.doc_id NOT IN (SELECT doc_id FROM pruned)),
       |ranked AS (
       |  SELECT version, doc_id, n_words, n_pieces,
       |    ROW_NUMBER() OVER (PARTITION BY version
       |      ORDER BY md5('mf4:0:' || CAST(doc_id AS VARCHAR)), doc_id)
       |      - 1 AS step
       |  FROM vers)
       |SELECT version, step // 64 AS shard,
       |  COUNT(*) AS n_docs, MIN(step) AS min_step, MAX(step) AS max_step,
       |  CAST(SUM(n_words) AS BIGINT) AS n_words,
       |  CAST(SUM(n_pieces) AS BIGINT) AS n_pieces
       |FROM ranked GROUP BY version, shard
       |ORDER BY version, shard""".stripMargin

  /** q325's oracle: the FULL-corpus recompute of q322's v2 pipeline —
    * the external half of the merge ≡ rebuild identity.
    */
  private val q325Sql: String =
    s"""$mf4Ctes,
       |ranked AS (
       |  SELECT doc_id, n_words, n_pieces,
       |    ROW_NUMBER() OVER (
       |      ORDER BY md5('mf4:0:' || CAST(doc_id AS VARCHAR)), doc_id)
       |      - 1 AS step
       |  FROM gated
       |  WHERE doc_id NOT IN (SELECT doc_id FROM pruned))
       |SELECT step // 64 AS shard,
       |  COUNT(*) AS n_docs, MIN(step) AS min_step, MAX(step) AS max_step,
       |  CAST(SUM(n_words) AS BIGINT) AS n_words,
       |  CAST(SUM(n_pieces) AS BIGINT) AS n_pieces
       |FROM ranked GROUP BY shard
       |ORDER BY shard""".stripMargin

  // ---- q326: manifest erasure (right-to-be-forgotten) -------------------

  /** q326: MANIFEST ERASURE — the DELETE half of manifest maintenance,
    * which q325's additive merge cannot express: adding docs only ADDS
    * near-dup pairs (drops are monotone), but ERASING a doc can
    * RESURRECT another — a doc whose only near-dup blocker was erased
    * must ship again (the q199 erasure-cascade obligation applied to a
    * derived artifact: the erased user's data must leave the manifest,
    * and nothing else may change). The store therefore persists, next
    * to the per-doc economics, the near-dup PAIR EVIDENCE (a, b) —
    * WHICH doc blocked which — not just q325's collapsed drop set: with
    * evidence, erasure of E is pure state-side algebra, drops' =
    * {b : ∃(a,b), a∉E, b∉E}, one anti-join per side. The erase path
    * re-prices NO text and re-scores NO vectors (Round17Spec walks the
    * registered plan: no documents/embeddings scan survives once the
    * state store exists), and the oracle is the FULL recompute of the
    * q322-v2 pipeline over the corpus WITHOUT the erased docs — the
    * driver's green row IS erase ≡ rebuild-without, the non-monotone
    * twin of q325's merge ≡ rebuild. Scale: evidence is bounded by the
    * blocked pair enumeration the prune already pays (label-blocked,
    * never corpus²); an erasure batch costs two anti-joins against
    * doc-cardinality state plus the two-pass rank over survivors.
    */
  /** q326's persisted erasure state (build-if-absent): the full-corpus
    * per-doc economics plus the near-dup pair evidence. Returns the
    * store root.
    */
  /** Pure key of q326's erasure-state store (no side effects). */
  private[graft] def mf4EraseStateRoot(s: SparkSession, d: String): String =
    StoreGuard.storeRoot(s, "target/graft_text_store",
      "mf4era", d, "documents.parquet", embFreshness(s, d))

  /** The ONE spelling of q326's erasure predicate tag (the r17-advice
    * fix: q335 used to duplicate the literal when reading the erased
    * pair evidence — a predicate change in one site but not the other
    * would silently serve the OLD predicate's pairs).
    */
  private[graft] val Mf4ErasedTag = "erased_mod7ne3"

  /** Root of the ERASED q326 state — the only path q335-class readers
    * may read pair evidence from.
    */
  private[graft] def mf4ErasedRoot(s: SparkSession, d: String): String =
    s"${mf4EraseStateRoot(s, d)}/$Mf4ErasedTag"

  private[graft] def mf4ErasureState(s: SparkSession, d: String): String = {
    import s.implicits._
    val root = mf4EraseStateRoot(s, d)
    // erasure-family store: a superseded freshness-tagged sibling would
    // RETAIN erased econ/pair rows on disk — sweep it, don't orphan it
    StoreGuard.sweepStaleSiblings(s, "target/graft_text_store",
      "mf4era", d, Set(root.split('/').last))
    StoreGuard.ensureBuilt(s, root) {
      // yesterday: price every doc, and keep the pair EVIDENCE —
      // doc-cardinality and pair-cardinality state, hash-distributed
      mf4DocCost(Tables.documents(s, d))
        .repartition(8, col("doc_id"))
        .write.mode("overwrite").parquet(s"$root/econ")
      Corpus.blockedNearDupPairs(Tables.embeddings(s, d), minCosine = 0.3)
        .select($"a", $"b")
        .repartition(8, col("b"))
        .write.mode("overwrite").parquet(s"$root/pairs")
    }
    root
  }

  /** q326's erase step — PHYSICAL: the erasure batch (doc_id % 7 == 3)
    * REWRITES the state store (build-if-absent sibling dirs under the
    * same root): the erased docs' rows leave `econ` on disk, and every
    * evidence pair touching an erased doc leaves `pairs` on disk — the
    * store itself forgets, which is what right-to-be-forgotten means
    * (a read-time filter would retain the erased rows; Round17Spec
    * asserts ZERO erased rows in the rewritten store). No document is
    * re-priced, no vector re-scored — the rewrite reads only the
    * persisted state (Round17Spec walks the survivor frame's file
    * scans: all under the store root). The drop set is re-derived from
    * the surviving pair evidence, which is what RESURRECTS a doc whose
    * only blockers were erased.
    */
  private[graft] def mf4EraseSurvivors(
      s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val root = mf4EraseStateRoot(s, d)
    // steady-state sweep of superseded freshness-tagged roots: an old
    // root orphaned by a source rewrite may hold PRE-erase payloads
    StoreGuard.sweepStaleSiblings(s, "target/graft_text_store",
      "mf4era", d, Set(root.split('/').last))
    val erased = StoreGuard.eraseRewrite(s, root, Mf4ErasedTag,
      Seq("econ", "pairs"))(mf4ErasureState(s, d)) { out =>
      s.read.parquet(s"$root/econ")
        .where($"doc_id" % 7 =!= 3)
        .repartition(8, col("doc_id"))
        .write.mode("overwrite").parquet(s"$out/econ")
      s.read.parquet(s"$root/pairs")
        .where($"a" % 7 =!= 3 && $"b" % 7 =!= 3)
        .repartition(8, col("b"))
        .write.mode("overwrite").parquet(s"$out/pairs")
    }
    val econ = s.read.parquet(s"$erased/econ")
    val drops = s.read.parquet(s"$erased/pairs")
      .select($"b".as("doc_id")).distinct()
    econ
      .where($"fert_ppm" <= lit(2000000L))
      .select($"doc_id", $"n_words", $"n_pieces")
      .join(drops, Seq("doc_id"), "left_anti")
  }

  private def q326(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    mf4Ledger(mf4EraseSurvivors(s, d))
      .select($"shard", $"n_docs", $"min_step", $"max_step",
        $"n_words", $"n_pieces")
      .orderBy($"shard")
  }

  /** q326's oracle: the q322-v2 pipeline recomputed from scratch over
    * the corpus WITHOUT the erased docs — the external half of the
    * erase ≡ rebuild-without identity.
    */
  private val q326Sql: String = {
    val ctes = mf4CtesOver(
      "(SELECT * FROM documents WHERE doc_id % 7 <> 3)",
      "(SELECT * FROM embeddings WHERE vec_id % 7 <> 3)")
    s"""$ctes,
       |ranked AS (
       |  SELECT doc_id, n_words, n_pieces,
       |    ROW_NUMBER() OVER (
       |      ORDER BY md5('mf4:0:' || CAST(doc_id AS VARCHAR)), doc_id)
       |      - 1 AS step
       |  FROM gated
       |  WHERE doc_id NOT IN (SELECT doc_id FROM pruned))
       |SELECT step // 64 AS shard,
       |  COUNT(*) AS n_docs, MIN(step) AS min_step, MAX(step) AS max_step,
       |  CAST(SUM(n_words) AS BIGINT) AS n_words,
       |  CAST(SUM(n_pieces) AS BIGINT) AS n_pieces
       |FROM ranked GROUP BY shard
       |ORDER BY shard""".stripMargin
  }

  // ---- q335: pipeline manifest v5 ---------------------------------------

  /** q335: PIPELINE MANIFEST v5 — the ROUND-17 era composed into ONE
    * oracled deliverable (the q79 → q135 → q183 → q322 lineage): the
    * corpus flows through (1) the unigram tokenizer-economics gate,
    * (2) PHYSICAL ERASURE (q326's predicate — the erased docs are
    * gone from the state this manifest is computed FROM, not just
    * filtered), (3) the embedding-space semantic prune over the
    * surviving pair evidence, (4) the LEAKAGE-FREE CLUSTER SPLIT
    * (q333's verdict: components over the same pair graph the prune
    * used, whole clusters assigned by their root's md5 bucket — so
    * transitive near-dup families never straddle train/test even when
    * the prune keeps several semi-distinct survivors of one family),
    * and (5) a PER-SPLIT resumable schedule (q319's md5 rank computed
    * by [[Rank.globalRank]] over (split, okey) with three broadcast
    * split offsets — never a per-split single-task window). The
    * deliverable is the per-(split, shard) ledger, and the DuckDB
    * oracle replays the ENTIRE composition — DP pricing, erasure,
    * cosine prune, transitive-closure components, md5 buckets, md5
    * ranks — so a green row certifies the COMPOSITION (q135's
    * discipline); Round17Spec proves every stage moved the ledger
    * (q142's lesson). Scale: stages (1)–(3) are q326's delta/state
    * shapes, the closure is q63's slim label loop, the rank is the
    * two-pass device; the ledger is shard-sized.
    */
  private def q335(s: SparkSession, d: String): DataFrame = {
    val shipped = mf4EraseSurvivors(s, d) // gate ∘ erasure ∘ prune
    mf5Ledger(shipped, s.read.parquet(s"${mf4ErasedRoot(s, d)}/pairs"))
  }

  /** The v5 tail shared by q335 (pairs from the erased state store)
    * and q341 (pairs from the incremental base ∪ delta merge):
    * transitive-closure components over the pair evidence → whole
    * clusters to md5 split buckets → per-split Rank-device schedule →
    * the per-(split, shard) ledger.
    */
  private def mf5Ledger(shipped: DataFrame, pairs: DataFrame): DataFrame = {
    val s = shipped.sparkSession
    import s.implicits._
    val labels = Dedup.connectedComponents(pairs)
    val split = shipped.select($"doc_id")
      .join(labels, Seq("doc_id"), "left")
      .withColumn("root", coalesce($"cluster_root", $"doc_id"))
      .withColumn("bucket", expr(
        """CAST(conv(substring(
          |  md5(CAST(concat('split:', CAST(root AS STRING)) AS BINARY)),
          |  1, 8), 16, 10) AS BIGINT) % 10""".stripMargin))
      .withColumn("split", expr(
        "CASE WHEN bucket < 8 THEN 'train' " +
          "WHEN bucket = 8 THEN 'val' ELSE 'test' END"))
      .select($"doc_id", $"split")
    val keyed = shipped.join(split, Seq("doc_id"))
      .withColumn("okey",
        md5(concat(lit("mf5:0:"), $"doc_id".cast("string")).cast("binary")))
    val ranked = Rank.globalRank(keyed,
      Seq($"split", $"okey", $"doc_id"), "grk")
    // per-split step = global rank − the split's offset (3 bounded rows)
    val offs = ranked.groupBy($"split").agg(min($"grk").as("off"))
    ranked.join(broadcast(offs), Seq("split"))
      .withColumn("step", $"grk" - $"off")
      .withColumn("shard", expr("step DIV 64"))
      .groupBy($"split", $"shard")
      .agg(
        count(lit(1)).as("n_docs"),
        min($"step").as("min_step"),
        max($"step").as("max_step"),
        sum($"n_words").as("n_words"),
        sum($"n_pieces").as("n_pieces"))
      .orderBy($"split", $"shard")
  }

  /** q335's oracle: the whole v5 composition recomputed from the raw
    * corpus WITHOUT the erased docs — DP gate, cosine prune,
    * transitive-closure components, md5 split buckets, per-split md5
    * rank. One green row certifies every stage at once.
    */
  private val q335Sql: String = {
    val ctes = mf4CtesOver(
      "(SELECT * FROM documents WHERE doc_id % 7 <> 3)",
      "(SELECT * FROM embeddings WHERE vec_id % 7 <> 3)")
    s"""$ctes,
       |e2 AS (
       |  SELECT a.vec_id AS a, b.vec_id AS b
       |  FROM embeddings a JOIN embeddings b
       |    ON a.label = b.label AND a.vec_id < b.vec_id
       |  WHERE a.vec_id % 7 <> 3 AND b.vec_id % 7 <> 3
       |    AND ROUND(list_dot_product(CAST(a.embedding AS DOUBLE[]),
       |                               CAST(b.embedding AS DOUBLE[])) /
       |      (sqrt(list_dot_product(CAST(a.embedding AS DOUBLE[]),
       |                             CAST(a.embedding AS DOUBLE[]))) *
       |       sqrt(list_dot_product(CAST(b.embedding AS DOUBLE[]),
       |                             CAST(b.embedding AS DOUBLE[])))), 4)
       |      >= 0.3),
       |sym AS (SELECT a AS u, b AS v FROM e2 UNION SELECT b, a FROM e2),
       |reach(u, v) AS (
       |  SELECT u, v FROM sym
       |  UNION
       |  SELECT r.u, s.v FROM reach r JOIN sym s ON r.v = s.u),
       |roots AS (
       |  SELECT u AS doc_id, LEAST(u, MIN(v)) AS root
       |  FROM reach GROUP BY u),
       |shipped AS (
       |  SELECT g.doc_id, g.n_words, g.n_pieces FROM gated g
       |  WHERE g.doc_id NOT IN (SELECT doc_id FROM pruned)),
       |asg AS (
       |  SELECT s.doc_id, s.n_words, s.n_pieces,
       |    COALESCE(r.root, s.doc_id) AS root
       |  FROM shipped s LEFT JOIN roots r ON r.doc_id = s.doc_id),
       |sp AS (
       |  SELECT doc_id, n_words, n_pieces,
       |    CASE WHEN CAST(('0x' || substr(
       |        md5('split:' || CAST(root AS VARCHAR)), 1, 8)) AS BIGINT)
       |        % 10 < 8 THEN 'train'
       |      WHEN CAST(('0x' || substr(
       |        md5('split:' || CAST(root AS VARCHAR)), 1, 8)) AS BIGINT)
       |        % 10 = 8 THEN 'val' ELSE 'test' END AS split
       |  FROM asg),
       |ranked AS (
       |  SELECT split, doc_id, n_words, n_pieces,
       |    ROW_NUMBER() OVER (PARTITION BY split
       |      ORDER BY md5('mf5:0:' || CAST(doc_id AS VARCHAR)), doc_id)
       |      - 1 AS step
       |  FROM sp)
       |SELECT split, step // 64 AS shard,
       |  COUNT(*) AS n_docs, MIN(step) AS min_step, MAX(step) AS max_step,
       |  CAST(SUM(n_words) AS BIGINT) AS n_words,
       |  CAST(SUM(n_pieces) AS BIGINT) AS n_pieces
       |FROM ranked GROUP BY split, shard
       |ORDER BY split, shard""".stripMargin
  }

  // ---- q341: incremental manifest v5 -------------------------------------

  /** q341: INCREMENTAL MANIFEST v5 — q335's composition MAINTAINED the
    * q325 way between erasures (r17 verdict item 7): yesterday's job
    * persists the per-doc economics and the near-dup PAIR EVIDENCE of
    * the erasure-SURVIVING base slice (doc_id % 10 < 8 ∧ ∉E); today's
    * delta (% 10 >= 8 ∧ ∉E) is the only text priced, and the pair
    * evidence extends MONOTONICALLY — adding docs only adds pairs, so
    * pairs(B ∪ D) = pairs(B) ∪ pairs-with-a-delta-side, one
    * label-blocked delta × survivors join. The merged evidence then
    * feeds BOTH v5 consumers at once — the semantic drop set AND the
    * leakage-free cluster split (components over the same merged
    * pairs) — before the per-split Rank-device schedule; that is the
    * v5-specific content q325 couldn't express (its collapsed drop set
    * cannot grow a split label). Erasure itself stays a FULL state
    * rewrite by design (q326's transaction; it is non-monotone).
    * The oracle is q335's full-recompute SQL VERBATIM — the driver's
    * green row is merge ≡ rebuild over the whole five-stage
    * composition, q325's strongest-claim discipline.
    *
    * The store key folds in the erasure predicate tag: a predicate
    * change must orphan the old state (its "survivors" include docs
    * the new predicate erases), and the stale sibling is swept, not
    * left resident.
    *
    * Scale: delta-sized text scan, delta-blocked pair join,
    * pair-cardinality state merge, q63's closure, two-pass rank.
    */
  private def q341(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val root = StoreGuard.storeRoot(s, "target/graft_text_store",
      "mf5inc", d, "documents.parquet",
      s"${embFreshness(s, d)}:$Mf4ErasedTag")
    StoreGuard.sweepStaleSiblings(s, "target/graft_text_store",
      "mf5inc", d, Set(root.split('/').last))
    val docs = Tables.documents(s, d)
    val emb = Tables.embeddings(s, d)
    val isBase = col("doc_id") % 10 < 8
    val notE = col("doc_id") % 7 =!= 3
    val isBaseV = col("vec_id") % 10 < 8
    val notEv = col("vec_id") % 7 =!= 3
    StoreGuard.ensureBuilt(s, root) {
      mf4DocCost(docs.where(isBase && notE))
        .repartition(8, col("doc_id"))
        .write.mode("overwrite").parquet(s"$root/econ")
      Corpus.blockedNearDupPairs(emb.where(isBaseV && notEv),
          minCosine = 0.3)
        .select($"a", $"b")
        .repartition(8, col("b"))
        .write.mode("overwrite").parquet(s"$root/pairs")
    }
    // today: price ONLY the delta...
    val econ = s.read.parquet(s"$root/econ")
      .unionByName(mf4DocCost(docs.where(!isBase && notE)))
    // ...and extend the pair evidence by the pairs the delta
    // introduces (≥ 1 delta side, both sides surviving) — label
    // blocking bounds the join exactly as in the full pipeline
    val lhs = emb.where(notEv)
      .select($"label", $"vec_id".as("u"), $"embedding".as("eu"))
    val rhs = emb.where(!isBaseV && notEv)
      .select($"label", $"vec_id".as("v"), $"embedding".as("ev"))
    val deltaPairs = lhs.join(rhs, Seq("label"))
      .filter($"u" =!= $"v")
      .withColumn("cos", round(graft.functions.VectorExprs
        .vecCosine(s, $"eu", $"ev"), 4))
      .filter($"cos" >= 0.3)
      .select(least($"u", $"v").as("a"), greatest($"u", $"v").as("b"))
      .distinct()
    val pairs = s.read.parquet(s"$root/pairs")
      .unionByName(deltaPairs).distinct()
      // pair-cardinality state, pinned: both v5 consumers (drop set +
      // split components) read it
      .localCheckpoint()
    val drops = pairs.select($"b".as("doc_id")).distinct()
    val shipped = econ
      .where($"fert_ppm" <= lit(2000000L))
      .select($"doc_id", $"n_words", $"n_pieces")
      .join(drops, Seq("doc_id"), "left_anti")
    mf5Ledger(shipped, pairs)
  }

  /** q158: tokenizer VOCAB COVERAGE / fertility — the metric a pipeline
    * derives from q128's BPE before shipping a tokenizer or pricing a
    * corpus in tokens: per language, the fraction of pre-tokens the
    * merge table resolves to a SINGLE piece (whole-word coverage — a
    * word "in vocab") and the mean pieces-per-word (fertility). High
    * fertility / low coverage on a language flags a tokenizer that will
    * inflate that language's sequence lengths (the mT5/XLM-R fairness
    * diagnostic). Ratios in integer ppm (floor) so the cross-engine
    * compare is exact; same codegen replace-chain as q128 — one scan,
    * one explode, one hash-agg.
    */
  private def q158(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val toks = filter(
      regexp_extract_all($"text", lit(bpePattern), lit(0)),
      t => length(trim(t)) > 0)
    Tables
      .documents(s, d)
      .select($"lang", explode(toks).as("tok"))
      .withColumn("nb",
        size(split(bpeApply(bpeSpaced($"tok")), "  ")).cast("long"))
      .groupBy($"lang")
      .agg(
        count(lit(1)).as("n_pre_tokens"),
        sum(when($"nb" === 1L, 1L).otherwise(0L)).as("n_whole"),
        sum($"nb").as("n_pieces"),
      )
      .withColumn("coverage_ppm", expr("(n_whole * 1000000) div n_pre_tokens"))
      .withColumn("fertility_ppm", expr("(n_pieces * 1000000) div n_pre_tokens"))
      .orderBy($"lang")
  }

  private val q158Sql: String = {
    val chain = bpeMerges.foldLeft(
      "regexp_replace(trim(tok), '([\\s\\S])', ' \\1 ', 'g')") {
      case (s0, (a, b)) => s"replace($s0, ' $a  $b ', ' $a$b ')"
    }
    s"""WITH t AS (
       |  SELECT lang, unnest(regexp_extract_all(text, '$bpePattern')) AS tok
       |  FROM documents),
       |m AS (
       |  SELECT lang, len(string_split($chain, '  ')) AS nb
       |  FROM t WHERE length(trim(tok)) > 0),
       |a AS (
       |  SELECT lang, COUNT(*) AS n_pre_tokens,
       |    CAST(SUM(CASE WHEN nb = 1 THEN 1 ELSE 0 END) AS BIGINT)
       |      AS n_whole,
       |    CAST(SUM(nb) AS BIGINT) AS n_pieces
       |  FROM m GROUP BY lang)
       |SELECT lang, n_pre_tokens, n_whole, n_pieces,
       |  (n_whole * 1000000) // n_pre_tokens AS coverage_ppm,
       |  (n_pieces * 1000000) // n_pre_tokens AS fertility_ppm
       |FROM a ORDER BY lang""".stripMargin
  }

  /** Learn a BPE merge table from the corpus itself — the training side
    * of q128, same bounded-driver discipline as IVF centroid training
    * (`ops/Vectors.scala`): ONE distributed pre-token frequency
    * aggregate, a map-side top-`vocabTarget` cut (TakeOrdered — the
    * driver holds ≤ `vocabTarget` (token, weight) rows no matter the
    * corpus size), then classic frequency-weighted pair counting over
    * that vocabulary for `nMerges` iterations. Ties break
    * deterministically (count desc, then pair lexicographic), so the
    * learned table is stable across partitionings. Gated in Round10Spec:
    * the distributed replace-chain apply of a LEARNED table must equal a
    * driver-side reference BPE apply token-for-token.
    */
  def learnBpeMerges(
      docs: DataFrame,
      nMerges: Int = 32,
      vocabTarget: Int = 2048,
  ): Seq[(String, String)] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val vocab = docs
      .select(explode(
        regexp_extract_all(col("text"), lit(bpePattern), lit(0))).as("tok"))
      .select(trim($"tok").as("tok"))
      .filter(length($"tok") > 0)
      .groupBy($"tok")
      .agg(count(lit(1)).as("n"))
      .orderBy($"n".desc, $"tok")
      .limit(vocabTarget)
      .as[(String, Long)]
      .collect()
    // words as mutable symbol sequences, weighted by corpus frequency
    val words = vocab.map { case (w, n) =>
      (scala.collection.mutable.ArrayBuffer(w.map(_.toString): _*), n)
    }
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var done = false
    while (merges.length < nMerges && !done) {
      val counts = scala.collection.mutable.Map
        .empty[(String, String), Long]
      words.foreach { case (syms, n) =>
        var i = 0
        while (i < syms.length - 1) {
          val p = (syms(i), syms(i + 1))
          counts(p) = counts.getOrElse(p, 0L) + n
          i += 1
        }
      }
      if (counts.isEmpty) done = true
      else {
        val (pair, cnt) = counts.minBy { case ((a, b), c) => (-c, a, b) }
        if (cnt < 2) done = true
        else {
          merges += pair
          val merged = pair._1 + pair._2
          words.foreach { case (syms, _) =>
            var i = 0
            // left-to-right non-overlapping, same as the replace chain
            while (i < syms.length - 1) {
              if (syms(i) == pair._1 && syms(i + 1) == pair._2) {
                syms(i) = merged; syms.remove(i + 1)
              }
              i += 1
            }
          }
        }
      }
    }
    merges.toSeq
  }

  /** Distributed apply of an arbitrary (e.g. learned) merge table to one
    * string column of pre-tokens → resulting BPE token count. Same
    * replace-chain shape as [[bpeApply]], parameterized.
    */
  def applyMerges(tok: Column, merges: Seq[(String, String)]): Column =
    size(split(
      merges.foldLeft(bpeSpaced(tok)) { case (c, (a, b)) =>
        replace(c, lit(s" $a  $b "), lit(s" ${a + b} "))
      }, "  "))

  /** q130: quality-classifier INFERENCE as a projection — the shape of
    * every learned document filter (fastText quality scores, logistic
    * regressors over engineered features) when it runs inside the
    * pipeline: the model is a plan CONSTANT (weight literals), scoring
    * is pure per-row column math, and the only shuffle is the per-lang
    * rollup of decisions. No sigmoid is needed for a keep/drop gate —
    * the sigmoid is monotone, so thresholding the logit IS thresholding
    * the probability — which is what lets the whole score stay in exact
    * integer ppm: features are integer percents/counts (`DIV`, never
    * float division), weights integer ppm-per-unit, the logit an exact
    * BIGINT both engines compute bit-identically. Features: stopword
    * percent (naturalistic prose), type-token percent (diversity, q61's
    * signal), capped token count (length prior), and a penalty for
    * average token length straying from English-like ~5.5 chars. All
    * DIV numerators are non-negative — Spark truncates toward zero and
    * DuckDB floors, so negative intermediate divisions are the one
    * integer op this file must never emit (only `abs` sees a negative).
    */
  /** The q130 scoring chain on any frame with a `text` column — also
    * the quality gate inside the q135 manifest. Adds `n_toks`,
    * `ttr_pct`, `stop_pct`, `len10`, `logit_ppm`.
    */
  private[ops] def withQualityLogit(df: DataFrame): DataFrame = df
    .withColumn("n_toks", size(tokens(col("text"))).cast("long"))
    .withColumn("ttr_pct",
      expr("(100 * size(array_distinct(split(text, ' ')))) DIV n_toks"))
    .withColumn("stop_pct",
      expr(s"(100 * size(filter(split(text, ' '), t -> t IN " +
        s"(${stopwords.map("'" + _ + "'").mkString(",")})))) DIV n_toks"))
    .withColumn("len10", expr("(10 * length(text)) DIV n_toks"))
    .withColumn("logit_ppm",
      lit(-560000L)
        + lit(9000L) * col("stop_pct")
        + lit(11000L) * col("ttr_pct")
        + lit(2000L) * least(col("n_toks"), lit(200L))
        - lit(40000L) * abs(col("len10") - lit(55L)))

  /** The same logit as ONE DuckDB scalar expression over a `text`
    * column — the oracle-side twin of [[withQualityLogit]], consumed by
    * the q135 manifest's oracle.
    */
  private[ops] val logitPpmSql: String = {
    val ss = "string_split(text, ' ')"
    val n = s"CAST(len($ss) AS BIGINT)"
    s"(-560000 + 9000 * ((100 * len(list_filter($ss, t -> t IN " +
      s"(${stopwords.map("'" + _ + "'").mkString(",")})))) // $n) " +
      s"+ 11000 * ((100 * len(list_distinct($ss))) // $n) " +
      s"+ 2000 * least($n, 200) " +
      s"- 40000 * abs(((10 * length(text)) // $n) - 55))"
  }

  private def q130(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    withQualityLogit(Tables.documents(s, d))
      .groupBy($"lang")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when($"logit_ppm" >= 0L, 1L).otherwise(0L)).as("n_keep"),
        sum($"logit_ppm").as("sum_logit_ppm"),
      )
      .withColumn("keep_pct", expr("(100 * n_keep) DIV n_docs"))
      .orderBy($"lang")
  }

  private val q130Sql =
    s"""WITH f AS (
       |  SELECT lang,
       |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_toks,
       |    (100 * len(list_distinct(string_split(text, ' '))))
       |      // len(string_split(text, ' ')) AS ttr_pct,
       |    (100 * len(list_filter(string_split(text, ' '),
       |      t -> t IN (${stopwords.map("'" + _ + "'").mkString(",")}))))
       |      // len(string_split(text, ' ')) AS stop_pct,
       |    (10 * length(text)) // len(string_split(text, ' ')) AS len10
       |  FROM documents),
       |l AS (
       |  SELECT lang,
       |    -560000 + 9000 * stop_pct + 11000 * ttr_pct
       |      + 2000 * least(n_toks, 200) - 40000 * abs(len10 - 55)
       |      AS logit_ppm
       |  FROM f)
       |SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
       |  CAST(SUM(CASE WHEN logit_ppm >= 0 THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_keep,
       |  CAST(SUM(logit_ppm) AS BIGINT) AS sum_logit_ppm,
       |  (100 * CAST(SUM(CASE WHEN logit_ppm >= 0 THEN 1 ELSE 0 END)
       |    AS BIGINT)) // CAST(COUNT(*) AS BIGINT) AS keep_pct
       |FROM l GROUP BY lang ORDER BY lang""".stripMargin

  /** q151: Pareto frontier (2-D skyline) of the corpus on
    * (length, lexical diversity) — the docs no other doc beats on BOTH
    * axes, the shape data-selection uses when two quality signals trade
    * off (longer docs repeat more; a short doc only earns its place by
    * diversity). Dominance is the standard skyline rule: doc j
    * dominates i iff x_j ≥ x_i ∧ y_j ≥ y_i with one strict. Both axes
    * are integers (token count; TTR in ppm by integer division) so the
    * cross-engine compare is exact.
    *
    * Scale: the textbook formulation is a quadratic NOT EXISTS self-join
    * (the oracle runs exactly that, as the independent second strategy —
    * q143's dual-enumeration discipline). The engine plan instead
    * reduces the corpus by hash-agg to distinct (x, y) points with
    * counts, reduces again to per-x max-y (cardinality ≤ the token-count
    * DOMAIN, not the corpus), and runs one running-max window over that
    * value-domain-sized table: a frontier x survives iff its max-y beats
    * every strictly-larger x's max-y (RANGE frame ending at -1 ⇒ the
    * strict-dominance tie rule falls out of the frame bound). The only
    * unpartitioned window runs on the bounded per-x table — never the
    * corpus — then one broadcast join back recovers the surviving
    * points' counts.
    */
  private def q151(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import s.implicits._
    val pts = Tables
      .documents(s, d)
      .select(
        $"doc_id",
        size(tokens($"text")).cast("long").as("n_tokens"),
        expr("""1000000L * CAST(size(array_distinct(split(text, ' ')))
                AS BIGINT) DIV size(split(text, ' '))""").as("ttr_ppm"))
    val byXY = pts
      .groupBy($"n_tokens", $"ttr_ppm")
      .agg(count(lit(1)).as("n_docs"), min($"doc_id").as("min_doc"))
    val byX = byXY
      .groupBy($"n_tokens")
      .agg(max($"ttr_ppm").as("max_y"))
    val w = Window.orderBy($"n_tokens".desc)
      .rangeBetween(Window.unboundedPreceding, -1)
    val frontierX = byX
      .withColumn("m1", max($"max_y").over(w))
      .filter($"m1".isNull || $"max_y" > $"m1")
      .select($"n_tokens", $"max_y".as("ttr_ppm"))
    frontierX
      .join(byXY, Seq("n_tokens", "ttr_ppm"))
      .select($"n_tokens", $"ttr_ppm", $"n_docs", $"min_doc")
      .orderBy($"n_tokens")
  }

  private val q151Sql =
    """WITH p AS (
      |  SELECT doc_id,
      |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
      |    (1000000 * CAST(len(list_distinct(string_split(text, ' ')))
      |       AS BIGINT)) // len(string_split(text, ' ')) AS ttr_ppm
      |  FROM documents),
      |f AS (
      |  SELECT * FROM p a
      |  WHERE NOT EXISTS (
      |    SELECT 1 FROM p b
      |    WHERE b.n_tokens >= a.n_tokens AND b.ttr_ppm >= a.ttr_ppm
      |      AND (b.n_tokens > a.n_tokens OR b.ttr_ppm > a.ttr_ppm)))
      |SELECT n_tokens, ttr_ppm, COUNT(*) AS n_docs,
      |  MIN(doc_id) AS min_doc
      |FROM f GROUP BY 1, 2 ORDER BY 1""".stripMargin

  /** q61: type-token ratio (lexical diversity) — the repetition-quality
    * signal: boilerplate/spam repeats tokens, so low TTR flags docs a
    * pretraining filter drops. Pure projection + hash-agg per source.
    */
  private def q61(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables
      .documents(s, d)
      .withColumn("ttr",
        size(array_distinct(tokens($"text"))).cast("double") /
          size(tokens($"text")))
      .groupBy($"source")
      .agg(
        count(lit(1)).as("n_docs"),
        round(avg($"ttr"), 4).as("avg_ttr"),
        round(min($"ttr"), 4).as("min_ttr"),
        sum(when($"ttr" < 0.45, 1L).otherwise(0L)).as("n_repetitive"),
      )
      .orderBy($"source")
  }

  private val q61Sql =
    """SELECT source, COUNT(*) AS n_docs,
      |  ROUND(AVG(ttr), 4) AS avg_ttr,
      |  ROUND(MIN(ttr), 4) AS min_ttr,
      |  CAST(SUM(CASE WHEN ttr < 0.45 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_repetitive
      |FROM (SELECT source,
      |        CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE) /
      |          len(string_split(text, ' ')) AS ttr
      |      FROM documents) t
      |GROUP BY source ORDER BY source""".stripMargin

  /** q62: materialize the deduplicated corpus — one survivor (min doc_id)
    * per content fingerprint with its duplicate count. q30 reports dedup
    * STATS; this is the dedup OUTPUT a pipeline actually feeds forward.
    * One hash-agg shuffle on the fingerprint; survivors join back to
    * nothing (doc_id rides the agg as min()).
    */
  private def q62(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables
      .documents(s, d)
      .groupBy(md5($"text".cast("binary")).as("fp"))
      .agg(
        min($"doc_id").as("keeper"),
        count(lit(1)).as("n_copies"),
      )
      .select($"keeper", $"n_copies", $"fp")
      .orderBy($"keeper")
  }

  private val q62Sql =
    """SELECT keeper, n_copies, fp FROM (
      |  SELECT md5(text) AS fp, MIN(doc_id) AS keeper,
      |    COUNT(*) AS n_copies
      |  FROM documents GROUP BY md5(text)) t
      |ORDER BY keeper""".stripMargin

  /** q89: PII masking — the scrub-before-training pass. Digit runs in
    * the identifying column are replaced wholesale (`[0-9]+` → `<ID>`),
    * and the audit the compliance side wants ships with the redaction:
    * how many records were touched and how many characters left the
    * corpus, per segment. Pure codegen'd projection + one hash-agg (no
    * shuffle before it) — redaction cost at 100 TB is the scan itself.
    * The character-class regex means Java (Spark) and RE2 (DuckDB)
    * agree; DuckDB needs the explicit 'g' flag to match Spark's
    * replace-all semantics.
    */
  private def q89(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables
      .customer(s, d)
      .withColumn("masked", regexp_replace($"c_name", "[0-9]+", "<ID>"))
      .groupBy($"c_mktsegment")
      .agg(
        count(lit(1)).as("n_customers"),
        sum(when($"masked" =!= $"c_name", 1L).otherwise(0L))
          .cast("long").as("n_masked"),
        sum((length($"c_name") - length($"masked")).cast("long"))
          .cast("long").as("chars_removed"),
        min($"masked").as("min_masked"),
      )
      .orderBy($"c_mktsegment")
  }

  private val q89Sql =
    """SELECT c_mktsegment, COUNT(*) AS n_customers,
      |  CAST(SUM(CASE WHEN masked <> c_name THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_masked,
      |  CAST(SUM(len(c_name) - len(masked)) AS BIGINT) AS chars_removed,
      |  MIN(masked) AS min_masked
      |FROM (SELECT *,
      |        regexp_replace(c_name, '[0-9]+', '<ID>', 'g') AS masked
      |      FROM customer) t
      |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin

  /** q95 oracle: the streaming dedup's survivor set, stated batch-side —
    * one row per distinct content fingerprint; `n_rows` is literally 1
    * here, and counts the emitted survivors per fingerprint on the Spark
    * side, so a dropped fingerprint and a passed-through duplicate both
    * break the hash.
    */
  private val q95Sql =
    """SELECT fp, CAST(1 AS BIGINT) AS n_rows
      |FROM (SELECT DISTINCT md5(text) AS fp FROM documents) t
      |ORDER BY fp""".stripMargin

  /** q140: PASSAGE-level exact dedup with document reconstruction — the
    * C4/RefinedWeb sub-document discipline the whole-doc gates (q30/q62)
    * cannot express: boilerplate repeats across documents that are not
    * themselves duplicates, so production pipelines dedup at the
    * line/span level and keep only the FIRST occurrence of each span
    * corpus-wide, rewriting every document to its surviving spans.
    *
    * Here a passage is a fixed 4-token span (the corpus is space-joined
    * with no sentence marks); each document is chunked into consecutive
    * passages (final partial passage kept), the keep-first winner per
    * passage is the minimum (doc_id, chunk_idx) occurrence, and each doc
    * is reconstructed from its surviving passages in original order.
    *
    * Plan shape at 100 TB: the winner election is a map-side-combinable
    * hash-agg over SLIM rows — (64-bit passage hash, 16-byte position
    * struct), the passage STRING stays in the scan task — and the
    * survivor resolution is a hash-partitioned equi-join back on the
    * passage hash (the join's partitioning IS the blocking; never
    * corpus-wide pairs). Reconstruction groups by doc_id with per-doc
    * bounded arrays (one document's own passages). Hashed-vs-string
    * collision risk vs the oracle is the q124 birthday trade (~1e-11
    * at sf0.01; a collision perturbs one doc's reconstruction).
    *
    * The oracle is the exact STRING twin in DuckDB (row_number window
    * over passage → keep rn=1 → ordered string_agg), so keep-first
    * choice, chunk framing, and reconstruction order must all agree
    * across engines — `text_fp` is the md5 of the rebuilt document.
    */
  private def q140(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val P = 4
    val chunks = Tables
      .documents(s, d)
      .withColumn("toks", tokens($"text"))
      .select(
        $"doc_id",
        $"lang",
        posexplode(
          expr(
            s"transform(sequence(0, (size(toks)-1) div $P), " +
              s"i -> array_join(slice(toks, i*$P+1, $P), ' '))")
        ).as(Seq("chunk_idx", "passage")),
      )
      .withColumn("ph", xxhash64($"passage"))
    val winners = chunks
      .groupBy($"ph")
      .agg(min(struct($"doc_id", $"chunk_idx")).as("w"))
    val kept = chunks
      .join(winners, "ph")
      .where($"doc_id" === $"w.doc_id" && $"chunk_idx" === $"w.chunk_idx")
      .groupBy($"doc_id")
      .agg(
        count(lit(1)).as("n_kept"),
        sum(size(tokens($"passage"))).cast("long").as("kept_tokens"),
        md5(
          array_join(
            transform(
              array_sort(collect_list(struct($"chunk_idx", $"passage"))),
              x => x.getField("passage")),
            " ").cast("binary")).as("text_fp"),
      )
    chunks
      .groupBy($"doc_id", $"lang")
      .agg(count(lit(1)).as("n_passages"))
      .join(kept, Seq("doc_id"), "left")
      .select(
        $"doc_id",
        $"lang",
        $"n_passages",
        coalesce($"n_kept", lit(0L)).as("n_kept"),
        coalesce($"kept_tokens", lit(0L)).as("kept_tokens"),
        coalesce($"text_fp", md5(lit("").cast("binary"))).as("text_fp"),
      )
      .orderBy($"doc_id")
  }

  private val q140Sql =
    """WITH toks AS (
      |  SELECT doc_id, lang, string_split(text, ' ') AS t FROM documents),
      |chunks AS (
      |  SELECT doc_id, lang, i AS chunk_idx,
      |         array_to_string(t[(i*4+1):(i*4+4)], ' ') AS passage
      |  FROM (SELECT doc_id, lang, t,
      |          unnest(generate_series(0, (len(t)-1)//4)) AS i FROM toks) g),
      |surv AS (
      |  SELECT doc_id, chunk_idx, passage FROM (
      |    SELECT doc_id, chunk_idx, passage,
      |           row_number() OVER (PARTITION BY passage
      |                              ORDER BY doc_id, chunk_idx) AS rn
      |    FROM chunks) r WHERE rn = 1),
      |kept AS (
      |  SELECT doc_id, COUNT(*) AS n_kept,
      |         CAST(SUM(len(string_split(passage, ' '))) AS BIGINT)
      |           AS kept_tokens,
      |         md5(string_agg(passage, ' ' ORDER BY chunk_idx)) AS text_fp
      |  FROM surv GROUP BY doc_id),
      |alln AS (
      |  SELECT doc_id, lang, COUNT(*) AS n_passages
      |  FROM chunks GROUP BY doc_id, lang)
      |SELECT a.doc_id, a.lang, a.n_passages,
      |       COALESCE(k.n_kept, 0) AS n_kept,
      |       COALESCE(k.kept_tokens, 0) AS kept_tokens,
      |       COALESCE(k.text_fp, md5('')) AS text_fp
      |FROM alln a LEFT JOIN kept k USING (doc_id)
      |ORDER BY a.doc_id""".stripMargin

  /** Per-SF staging root for q177's persisted fingerprint store. */
  private[graft] def q177StoreRoot(d: String): String = {
    val tag = d.replaceAll("[^A-Za-z0-9]", "_")
    s"target/stage_text/q177_store_$tag"
  }

  /** q177's passage chunker (q140's framing, minus the lang carry):
    * doc → consecutive 4-token spans with position, plus the 64-bit
    * passage hash the dedup keys on (the span string never leaves its
    * scan task's projections).
    */
  private def passageChunks(docs: DataFrame): DataFrame = {
    val P = 4
    docs
      .withColumn("toks", tokens(col("text")))
      .select(
        col("doc_id"),
        posexplode(
          expr(
            s"transform(sequence(0, (size(toks)-1) div $P), " +
              s"i -> array_join(slice(toks, i*$P+1, $P), ' '))")
        ).as(Seq("chunk_idx", "passage")),
      )
      .withColumn("ph", xxhash64(col("passage")))
  }

  /** One INCREMENTAL dedup step: dedup `delta` against the persisted
    * fingerprint store at `storeIn`, write the updated store to
    * `storeOut` (old winners ∪ first-occurrence winners of genuinely
    * new passages), and return the delta's survivor ledger. Exposed
    * package-private for Round11Spec's replay/crash-recovery proof:
    * applying the SAME delta to the store it already produced emits
    * the IDENTICAL ledger and an unchanged store — winners resolve to
    * the delta's own positions, so redelivery neither drops nor
    * duplicates a passage.
    */
  private[graft] def incrementalDedupStep(
      s: SparkSession, delta: DataFrame,
      storeIn: String, storeOut: String): DataFrame = {
    import s.implicits._
    val store = s.read.parquet(storeIn)
    val dchunks = passageChunks(delta)
    // winner per passage hash: the store's recorded occurrence if the
    // passage is already known, else the delta's min (doc, chunk) —
    // arrival-time priority, the semantics a cross-run dedup needs
    // (yesterday's corpus won because it arrived first, not because
    // of any id ordering across batches)
    val resolved = dchunks
      .groupBy($"ph")
      .agg(min(struct($"doc_id", $"chunk_idx")).as("dw"))
      .join(store, Seq("ph"), "left_outer")
      .withColumn("is_new", $"w_doc".isNull)
      .select($"ph",
        coalesce($"w_doc", $"dw.doc_id").as("w_doc"),
        coalesce($"w_chunk", $"dw.chunk_idx").as("w_chunk"),
        $"is_new")
    // idempotent store update: keyed by ph, new winners only — replay
    // of a delta already in the store adds nothing
    store
      .unionByName(resolved.where($"is_new").drop("is_new"))
      .repartition($"ph")
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .parquet(storeOut)
    val kept = dchunks
      .join(resolved, "ph")
      .where($"doc_id" === $"w_doc" && $"chunk_idx" === $"w_chunk")
      .groupBy($"doc_id")
      .agg(
        count(lit(1)).as("n_kept"),
        sum(size(tokens($"passage"))).cast("long").as("kept_tokens"),
        md5(
          array_join(
            transform(
              array_sort(collect_list(struct($"chunk_idx", $"passage"))),
              x => x.getField("passage")),
            " ").cast("binary")).as("text_fp"),
      )
    dchunks
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_passages"))
      .join(kept, Seq("doc_id"), "left")
      .select(
        $"doc_id",
        $"n_passages",
        coalesce($"n_kept", lit(0L)).as("n_kept"),
        coalesce($"kept_tokens", lit(0L)).as("kept_tokens"),
        coalesce($"text_fp", md5(lit("").cast("binary"))).as("text_fp"),
      )
      .orderBy($"doc_id")
  }

  /** q177: INCREMENTAL passage dedup against a PERSISTED fingerprint
    * store — the production shape q140 (whole-corpus) cannot express:
    * today's crawl must dedup against yesterday's index WITHOUT
    * rescanning yesterday's text. Documents split by arrival batch
    * (doc_id%10: 0–7 = yesterday's corpus, 8–9 = today's delta);
    * phase 1 ("yesterday's job") elects keep-first winners over the
    * base alone and persists ONLY (passage hash, winner doc, winner
    * chunk) — 24 bytes per distinct passage, hash-distributed on `ph`
    * — as the store; phase 2 ("today's job") chunks ONLY the delta,
    * probes the disk store with a hash equi-join on the 8-byte key
    * (the join's partitioning is the blocking — never corpus-wide
    * pairs, and with the store bucketed by ph only the delta side
    * shuffles), keeps a delta passage iff the resolved winner is its
    * own position, and writes the updated store for tomorrow's run.
    *
    * The oracle is the FULL RECOMPUTE over corpus ∪ delta in DuckDB —
    * keep-first by (batch, doc_id, chunk_idx) priority, survivors
    * restricted to the delta batch — so a green row proves the
    * incremental composition is indistinguishable from rerunning the
    * whole-corpus dedup, which is the entire point of the operator.
    * Round11Spec adds the replay proof: re-applying the same delta to
    * the updated store reproduces the ledger exactly and leaves the
    * store unchanged. Closest reference analogue: the generator's
    * cross-run cache reuse (eventstream.py:267-272) — reuse prior
    * output, recompute only what is new.
    */
  private def q177(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val root = q177StoreRoot(d)
    val docs = Tables.documents(s, d)
    passageChunks(docs.where($"doc_id" % 10 < 8))
      .groupBy($"ph")
      .agg(min(struct($"doc_id", $"chunk_idx")).as("w"))
      .select($"ph", $"w.doc_id".as("w_doc"), $"w.chunk_idx".as("w_chunk"))
      .repartition($"ph")
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .parquet(s"$root/v1")
    incrementalDedupStep(
      s, docs.where($"doc_id" % 10 >= 8), s"$root/v1", s"$root/v2")
  }

  private val q177Sql =
    """WITH toks AS (
      |  SELECT doc_id, (doc_id % 10 >= 8) AS is_delta,
      |         string_split(text, ' ') AS t
      |  FROM documents),
      |chunks AS (
      |  SELECT doc_id, is_delta, i AS chunk_idx,
      |         array_to_string(t[(i*4+1):(i*4+4)], ' ') AS passage
      |  FROM (SELECT doc_id, is_delta, t,
      |          unnest(generate_series(0, (len(t)-1)//4)) AS i FROM toks) g),
      |surv AS (
      |  SELECT doc_id, chunk_idx, passage FROM (
      |    SELECT doc_id, is_delta, chunk_idx, passage,
      |           row_number() OVER (PARTITION BY passage
      |             ORDER BY is_delta, doc_id, chunk_idx) AS rn
      |    FROM chunks) r
      |  WHERE rn = 1 AND is_delta),
      |kept AS (
      |  SELECT doc_id, COUNT(*) AS n_kept,
      |         CAST(SUM(len(string_split(passage, ' '))) AS BIGINT)
      |           AS kept_tokens,
      |         md5(string_agg(passage, ' ' ORDER BY chunk_idx)) AS text_fp
      |  FROM surv GROUP BY doc_id),
      |alln AS (
      |  SELECT doc_id, COUNT(*) AS n_passages
      |  FROM chunks WHERE is_delta GROUP BY doc_id)
      |SELECT a.doc_id, a.n_passages,
      |       COALESCE(k.n_kept, 0) AS n_kept,
      |       COALESCE(k.kept_tokens, 0) AS kept_tokens,
      |       COALESCE(k.text_fp, md5('')) AS text_fp
      |FROM alln a LEFT JOIN kept k USING (doc_id)
      |ORDER BY a.doc_id""".stripMargin

  // ---- q336: cross-run dedup-store erasure ------------------------------

  /** Pure key of q336's consolidated passage-fingerprint store (the
    * lifelong dedup state a 100 TB pipeline keeps longest — q177's v2
    * shape under the [[StoreGuard.storeRoot]] freshness recipe so the
    * erasure transaction has a build-if-absent base to rewrite).
    */
  private[graft] def passageStoreRoot(s: SparkSession, d: String): String =
    StoreGuard.storeRoot(s, "target/graft_text_store",
      "pdedup", d, "documents.parquet")

  /** The ONE spelling of q336's erasure predicate tag (doc_id % 11 == 5
    * is the erased set; the tag names the SURVIVOR predicate).
    */
  private[graft] val PassageErasedTag = "erased_mod11ne5"

  /** Keep-first winner per passage hash over a CHUNKS frame
    * (doc_id, chunk_idx, ph), with the ARRIVAL priority the
    * incremental store records (base batch doc_id%10<8 beats delta,
    * then (doc_id, chunk_idx)) — the one election rule shared by the
    * store build and the erase re-election so the two cannot drift
    * (the re-election interposes a semi-join between chunking and
    * election, which is why this operates on chunks, not docs).
    */
  private def electChunkWinners(chunks: DataFrame): DataFrame =
    chunks
      .groupBy(col("ph"))
      .agg(min(struct(
        (col("doc_id") % 10 >= 8).cast("int").as("b"),
        col("doc_id"), col("chunk_idx"))).as("w"))
      .select(col("ph"), col("w.doc_id").as("w_doc"),
        col("w.chunk_idx").as("w_chunk"))

  private def electPassageWinners(docs: DataFrame): DataFrame =
    electChunkWinners(passageChunks(docs))

  /** Build-if-absent consolidated passage store — winner rows
    * (ph, w_doc, w_chunk), hash-distributed on ph (q177's 24-byte
    * store discipline; q177 itself proves the incremental path is
    * indistinguishable from this one-pass election).
    */
  private[graft] def passageStore(s: SparkSession, d: String): String = {
    val root = passageStoreRoot(s, d)
    StoreGuard.ensureBuilt(s, root) {
      electPassageWinners(Tables.documents(s, d))
        .repartition(8, col("ph"))
        .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
        .parquet(s"$root/store")
    }
    root
  }

  /** q336's PHYSICAL erase of the passage-fingerprint store — the r17
    * verdict's top item: the store persists span fingerprints DERIVED
    * from erased documents (exactly the derived PII a GDPR pipeline
    * must also forget), so erasing doc set E (doc_id % 11 == 5) must
    * (a) remove every winner row held by an erased doc from disk and
    * (b) RE-ELECT each orphaned fingerprint among the SURVIVING
    * occurrences — q326's resurrection semantics at the dedup layer: a
    * dropped duplicate whose keeper was erased must ship again.
    *
    * Winner rows whose holder survives are untouched BY PROOF, not by
    * recompute: the pre-erase winner is the minimum over ALL
    * occurrences, so losing only erased occurrences cannot move a
    * surviving minimum — erase ≡ rebuild-without follows, and the
    * oracle certifies it externally (full recompute over corpus∖E in
    * DuckDB). Unlike q326/q329/q331 the re-election MUST touch the
    * corpus — the 24-byte store keeps winners only, never the loser
    * occurrence lists (unbounded) — but only orphan-sized state moves:
    * the survivor corpus is chunked once and SEMI-JOINED to the
    * broadcast orphan fingerprint set (erase-batch-sized) before any
    * aggregation, so the shuffle is |orphans|, never corpus-wide. The
    * re-elected set is persisted as the `inherit` payload — the
    * resurrection ledger the post-vacuum world could not otherwise
    * reconstruct (the pre-erase store is gone; that is the point).
    */
  private[graft] def erasedPassageStore(
      s: SparkSession, d: String): String = {
    val root = passageStoreRoot(s, d)
    // steady-state sweep: an orphaned pre-erase root would RETAIN the
    // erased docs' fingerprints on disk
    StoreGuard.sweepStaleSiblings(s, "target/graft_text_store",
      "pdedup", d, Set(root.split('/').last))
    StoreGuard.eraseRewrite(s, root, PassageErasedTag,
      Seq("store"))(passageStore(s, d)) { out =>
      val store = s.read.parquet(s"$root/store")
      val survivors = store.where(col("w_doc") % 11 =!= 5)
      val orphanPh = store.where(col("w_doc") % 11 === 5).select("ph")
      val reelected = electChunkWinners(
        passageChunks(
            Tables.documents(s, d).where(col("doc_id") % 11 =!= 5))
          .join(broadcast(orphanPh), Seq("ph"), "left_semi"))
        .localCheckpoint()
      survivors.unionByName(reelected)
        .repartition(8, col("ph"))
        .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
        .parquet(s"$out/store")
      reelected.select(col("ph"))
        .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
        .parquet(s"$out/inherit")
    }
  }

  /** q336: DEDUP-STORE ERASURE — the per-winner-doc ledger of the
    * POST-ERASE passage store: how many fingerprints each surviving
    * doc holds and how many it INHERITED from an erased winner. The
    * oracle recomputes both from the raw corpus (pre- and post-erase
    * winner elections over passage STRINGS in DuckDB), so a green row
    * proves the store-side erase transaction — removal, re-election,
    * and the untouched-survivor argument — is indistinguishable from
    * rebuilding the dedup state over corpus∖E. Round18Spec adds the
    * physical half the oracle cannot see: zero erased fingerprints in
    * any parquet file under the erased root, the vacuumed base, and a
    * replay that reuses the store byte-for-byte.
    */
  private def q336(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val erased = erasedPassageStore(s, d)
    val inherit = s.read.parquet(s"$erased/inherit")
      .withColumn("inh", lit(1L))
    s.read.parquet(s"$erased/store")
      .join(inherit, Seq("ph"), "left")
      .groupBy($"w_doc")
      .agg(count(lit(1)).as("n_hashes"),
        sum(coalesce($"inh", lit(0L))).as("n_inherited"))
      .orderBy($"w_doc")
  }

  private val q336Sql =
    """WITH toks AS (
      |  SELECT doc_id, (doc_id % 10 >= 8) AS is_delta,
      |         string_split(text, ' ') AS t
      |  FROM documents),
      |chunks AS (
      |  SELECT doc_id, is_delta, i AS chunk_idx,
      |         array_to_string(t[(i*4+1):(i*4+4)], ' ') AS passage
      |  FROM (SELECT doc_id, is_delta, t,
      |          unnest(generate_series(0, (len(t)-1)//4)) AS i FROM toks) g),
      |pre AS (
      |  SELECT passage, doc_id FROM (
      |    SELECT passage, doc_id,
      |           row_number() OVER (PARTITION BY passage
      |             ORDER BY is_delta, doc_id, chunk_idx) AS rn
      |    FROM chunks) r
      |  WHERE rn = 1),
      |post AS (
      |  SELECT passage, doc_id FROM (
      |    SELECT passage, doc_id,
      |           row_number() OVER (PARTITION BY passage
      |             ORDER BY is_delta, doc_id, chunk_idx) AS rn
      |    FROM chunks WHERE doc_id % 11 <> 5) r
      |  WHERE rn = 1)
      |SELECT p.doc_id AS w_doc, CAST(COUNT(*) AS BIGINT) AS n_hashes,
      |       CAST(SUM(CASE WHEN pre.doc_id % 11 = 5 THEN 1 ELSE 0 END)
      |         AS BIGINT) AS n_inherited
      |FROM post p JOIN pre ON pre.passage = p.passage
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** q356: PASSAGE-STORE COMPACTION, oracle-gated — the maintenance
    * verb the q336 cross-run store was missing (r18 verdict item 2):
    * nightly delta appends fragment the winner store into piles of
    * small files, so the store is staged into the partitioned layout a
    * month of appends produces (base + two delta appends per bucket,
    * one deliberately right-sized bucket) and rewritten by
    * [[StoreCompact.fragmentCompactServe]] — q321's discipline applied
    * to dedup state: in-plan `require`s prove the file-count collapse,
    * the preserved partition layout, and the byte-carry of the
    * right-sized bucket (skipped, hard-copied, never decoded). The
    * registered readout is the per-winner-doc fingerprint ledger
    * served FROM THE COMPACTED STORE, and the oracle recomputes the
    * winner election from the raw corpus over passage STRINGS — a
    * green row proves the rewrite preserved every 24-byte winner row
    * bit-exactly.
    */
  private def q356(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val tag = d.replaceAll("[^A-Za-z0-9]", "_")
    val store = s.read.parquet(s"${passageStore(s, d)}/store")
    StoreCompact.fragmentCompactServe(s, store, "ph",
        s"target/graft_text_store/q356_compact_$tag")
      .groupBy($"w_doc")
      .agg(count(lit(1)).as("n_hashes"))
      .orderBy($"w_doc")
  }

  private val q356Sql =
    """WITH toks AS (
      |  SELECT doc_id, (doc_id % 10 >= 8) AS is_delta,
      |         string_split(text, ' ') AS t
      |  FROM documents),
      |chunks AS (
      |  SELECT doc_id, is_delta, i AS chunk_idx,
      |         array_to_string(t[(i*4+1):(i*4+4)], ' ') AS passage
      |  FROM (SELECT doc_id, is_delta, t,
      |          unnest(generate_series(0, (len(t)-1)//4)) AS i FROM toks) g),
      |pre AS (
      |  SELECT passage, doc_id FROM (
      |    SELECT passage, doc_id,
      |           row_number() OVER (PARTITION BY passage
      |             ORDER BY is_delta, doc_id, chunk_idx) AS rn
      |    FROM chunks) r
      |  WHERE rn = 1)
      |SELECT doc_id AS w_doc, CAST(COUNT(*) AS BIGINT) AS n_hashes
      |FROM pre GROUP BY 1 ORDER BY 1""".stripMargin

  /** q155: INVERTED INDEX build — the search-engine/RAG-retrieval
    * primitive none of the per-doc stats queries produce: term →
    * document frequency, collection frequency, and the head of the
    * sorted posting list. Postings are the one per-term payload that is
    * UNBOUNDED at corpus scale (a stopword's list is the corpus), so the
    * materialized head is capped at 32 doc_ids via a per-term
    * `row_number` filter BEFORE any list is collected — per-group state
    * is bounded by the cap, never by a term's true df (the same
    * truncation discipline real index builders apply to stop terms;
    * df/cf stay exact over the full corpus). Plan shape: one explode,
    * one (term, doc) hash-agg with map-side combine, one slim window on
    * the already-aggregated posting rows hash-partitioned by term.
    */
  private def q155(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val posting = Tables
      .documents(s, d)
      .select($"doc_id", explode(tokens($"text")).as("term"))
      .groupBy($"term", $"doc_id")
      .agg(count(lit(1)).as("tf"))
    val stats = posting
      .groupBy($"term")
      .agg(count(lit(1)).as("df"), sum($"tf").as("cf"))
    val heads = posting
      .withColumn("rn", row_number().over(
        Window.partitionBy($"term").orderBy($"doc_id")))
      .where($"rn" <= 32)
      .groupBy($"term")
      .agg(array_join(
        transform(array_sort(collect_list($"doc_id")), _.cast("string")),
        ",").as("postings_head"))
    stats.join(heads, Seq("term")).orderBy($"term")
  }

  private val q155Sql =
    """WITH posting AS (
      |  SELECT term, doc_id, COUNT(*) AS tf
      |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS term
      |        FROM documents) t
      |  GROUP BY term, doc_id
      |), stats AS (
      |  SELECT term, COUNT(*) AS df, CAST(SUM(tf) AS BIGINT) AS cf
      |  FROM posting GROUP BY term
      |), hd AS (
      |  SELECT term, string_agg(CAST(doc_id AS VARCHAR), ','
      |           ORDER BY doc_id) AS postings_head
      |  FROM (SELECT term, doc_id,
      |          ROW_NUMBER() OVER (PARTITION BY term ORDER BY doc_id) AS rn
      |        FROM posting) r
      |  WHERE rn <= 32 GROUP BY term
      |)
      |SELECT s.term, s.df, s.cf, h.postings_head
      |FROM stats s JOIN hd h USING (term) ORDER BY s.term""".stripMargin

  /** q174: cross-source DUPLICATION OVERLAP matrix — which sources copy
    * from each other: for every source pair, the number of distinct
    * 4-token PASSAGE spans present in BOTH (q140's sub-document unit —
    * whole-document fingerprints find nothing here because mirrors
    * reshuffle boilerplate, but spans cross sources ~1.6k times even at
    * sf0.01). This is the view a curator uses to drop a mirror site
    * rather than fight its copies one by one. Docs reduce to DISTINCT
    * (source, span) before the matrix join — per-source span sets, not
    * row-counts, so a span repeated 1000× inside one source counts
    * once — and the self-join is span-keyed with output bounded by
    * sources². Spans shuffle as the fused `WordShingleHashes` kernel's
    * 64-BIT GRAM HASHES (the q124/q140 discipline): the ~30-byte span
    * string dies inside its scan task and the distinct + self-join
    * exchanges carry 8-byte keys — ~4× less shuffle volume at corpus
    * scale. The DuckDB oracle stays on the exact strings (the output
    * has no span column, only pair counts), so a green row also prices
    * the hashed-vs-string birthday trade (~5e-8 at sf0.01's ~1e6
    * distinct spans); Round11Spec locks the no-string-in-shuffle claim
    * against the executed plan.
    */
  private def q174(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val spans = Tables
      .documents(s, d)
      .where(size(tokens($"text")) >= 4)
      .select($"source",
        explode(graft.functions.TextHashExprs
          .shingleHashes(s, $"text", 4)).as("h"))
      .distinct()
    spans
      .join(spans.select($"source".as("source_b"), $"h"), Seq("h"))
      .where($"source" < $"source_b")
      .groupBy($"source".as("source_a"), $"source_b")
      .agg(count(lit(1)).as("n_shared_spans"))
      .orderBy($"source_a", $"source_b")
  }

  private val q174Sql =
    """WITH toks AS (
      |  SELECT source, doc_id,
      |    unnest(string_split(text, ' ')) AS term,
      |    generate_subscripts(string_split(text, ' '), 1) AS pos
      |  FROM documents),
      |spans AS (
      |  SELECT DISTINCT source,
      |    term || ' ' || LEAD(term, 1) OVER w || ' ' ||
      |    LEAD(term, 2) OVER w || ' ' || LEAD(term, 3) OVER w AS span
      |  FROM toks WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
      |  QUALIFY LEAD(term, 3) OVER w IS NOT NULL)
      |SELECT a.source AS source_a, b.source AS source_b,
      |  COUNT(*) AS n_shared_spans
      |FROM spans a JOIN spans b
      |  ON a.span = b.span AND a.source < b.source
      |GROUP BY 1, 2 ORDER BY source_a, source_b""".stripMargin

  val all: Seq[QueryDef] = Seq(
    QueryDef("q155_inverted_index", q155, Some(q155Sql)),
    QueryDef("q174_source_overlap", q174, Some(q174Sql)),
    QueryDef("q30_exact_dedup", q30, Some(q30Sql)),
    QueryDef("q31_token_stats", q31, Some(q31Sql)),
    QueryDef("q32_quality_score", q32, Some(q32Sql)),
    QueryDef("q33_fingerprint", q33, Some(q33Sql)),
    QueryDef("q119_winnow_fps", q119, Some(q119Sql)),
    QueryDef("q264_dup_spans", q264, Some(q264Sql)),
    QueryDef("q34_langid", q34, Some(q34Sql)),
    QueryDef("q38_bpe_tokens", q38, Some(q38Sql)),
    QueryDef("q128_bpe_merges", q128, Some(q128Sql)),
    QueryDef("q158_vocab_coverage", q158, Some(q158Sql)),
    QueryDef("q179_unigram_tokens", q179, Some(q179Sql)),
    QueryDef("q183_manifest_v3", q183, Some(q183Sql)),
    QueryDef("q322_manifest_v4", q322, Some(q322Sql)),
    // incremental maintenance of the v4 manifest: the oracle is the
    // FULL-corpus recompute — the green row IS merge ≡ rebuild
    QueryDef("q325_manifest_v4_incremental", q325, Some(q325Sql)),
    // the DELETE half: erasure over persisted pair evidence; the
    // oracle is the rebuild WITHOUT the erased docs
    QueryDef("q326_manifest_erasure", q326, Some(q326Sql)),
    // the round-17 era composed: gate ∘ erasure ∘ prune ∘ cluster
    // split ∘ per-split schedule, replayed end-to-end by the oracle
    QueryDef("q335_manifest_v5", q335, Some(q335Sql)),
    // incremental v5 maintenance: merge ≡ rebuild, gated by q335's
    // full-recompute SQL verbatim (the q290/q143 oracle device)
    QueryDef("q341_manifest_v5_incremental", q341, Some(q335Sql)),
    QueryDef("q130_quality_logit", q130, Some(q130Sql)),
    QueryDef("q61_ttr_quality", q61, Some(q61Sql)),
    QueryDef("q151_pareto_skyline", q151, Some(q151Sql)),
    QueryDef("q62_dedup_keep", q62, Some(q62Sql)),
    QueryDef("q140_passage_dedup", q140, Some(q140Sql)),
    QueryDef("q177_incremental_dedup", q177, Some(q177Sql)),
    // cross-run dedup-store erasure: remove + re-elect, erase ≡
    // rebuild-without replayed externally over passage strings
    QueryDef("q336_dedup_store_erasure", q336, Some(q336Sql)),
    // store maintenance: fragment (nightly appends in miniature) →
    // compact → serve, the readout gated by the raw-corpus election
    QueryDef("q356_passage_store_compaction", q356, Some(q356Sql)),
    QueryDef("q89_pii_mask", q89, Some(q89Sql)),
    // Streaming dedup under the oracle gate: watermark-bounded
    // dropDuplicates (streaming twin of q30/q62) must keep exactly one
    // survivor per content fingerprint.
    QueryDef("q95_stream_dedup",
      (s, d) => graft.streaming.Streams.dedupDistinctFingerprints(s, d),
      Some(q95Sql)),
  )
}
