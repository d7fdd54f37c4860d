package graft

import graft.dedup.Dedup
import graft.text.TextAnalysis

/** DuckDB oracle SQL for the text/dedup/knn blocks. Fragments are
  * generated from the same constants the Spark operators use
  * (hash-function count, band layout, marker lists) so the two sides
  * cannot drift.
  */
object OracleSql {

  /** Tokenization (mirror of GraftFunctions.tokens — the Unicode
    * kernel, see [[graft.expressions.UnicodeTokens]]): per-codepoint
    * lowercase, Han/Hiragana/Katakana spaced out as single-codepoint
    * tokens, then split on non-`\p{L}\p{N}` runs (RE2 classes).
    */
  def toksOf(expr: String): String =
    "list_filter(string_split_regex(regexp_replace(lower(" + expr +
      "), '([\\p{Han}\\p{Hiragana}\\p{Katakana}])', ' \\1 ', 'g')," +
      "'[^\\p{L}\\p{N}]+'), x -> x <> '')"
  val Toks: String = toksOf("text")

  /** Portable 60-bit hash (mirror of GraftFunctions.hex64). */
  def hex64(e: String): String = s"('0x'||substr(md5($e),1,15))::BIGINT"

  /** w=3 word shingles over `toks` (mirror of GraftFunctions.shingles). */
  val Shingles = "list_distinct([array_to_string(toks[i:i+2],' ') for i in range(1, len(toks)-1)])"

  /** Shared CTE prefix: tokenized docs + distinct shingle set.
    * (Declared up top — object vals initialize in order.)
    */
  private val ShCte =
    s"""WITH t AS (SELECT doc_id, $Toks AS toks FROM documents),
       |sh AS (SELECT DISTINCT doc_id, unnest($Shingles) AS s FROM t)""".stripMargin

  private def list(words: Seq[String]): String = words.map(w => s"'$w'").mkString("[", ",", "]")

  private def hits(words: Seq[String]): String =
    s"len(list_filter(toks, x -> list_contains(${list(words)}, x)))::BIGINT"

  val textTokens: String =
    s"""WITH t AS (SELECT doc_id, text, $Toks AS toks FROM documents)
       |SELECT doc_id, len(toks)::BIGINT AS n_tokens,
       |  len(list_distinct(toks))::BIGINT AS n_unique,
       |  len(regexp_extract_all(lower(text),
       |    '${graft.text.TextAnalysis.SubwordPattern}'))::BIGINT AS n_subword
       |FROM t ORDER BY doc_id""".stripMargin

  /** Unicode tokenizer gate (mirror of
    * TextAnalysis.tokenDumpMultilingual): the SAME multilingual tails
    * ride into both engines from one Scala constant and every (pos,
    * token) is hash-compared — the cross-engine proof that non-Latin
    * text tokenizes identically (r11 verdict item #1).
    */
  val textTokensUnicode: String = {
    val cases = graft.text.TextAnalysis.MultilingualTails.zipWithIndex
      .map { case (tl, i) => s"WHEN ${i.toLong} THEN '${tl.replace("'", "''")}'" }
      .mkString(" ")
    s"""WITH m AS (SELECT doc_id,
       |  text || CASE doc_id % 6 $cases END AS mtext FROM documents),
       |t AS (SELECT doc_id, ${toksOf("mtext")} AS toks FROM m),
       |p AS (SELECT doc_id, unnest([{'p': i, 'tok': toks[i]}
       |  for i in range(1, len(toks)+1)]) AS u FROM t)
       |SELECT doc_id, (u.p - 1)::BIGINT AS pos, u.tok AS tok FROM p
       |ORDER BY doc_id, pos""".stripMargin
  }

  /** Winnowing CTE chain (shingle w=3, window=4) ending in `fp` =
    * (doc_id, fingerprint) distinct — shared by the winnow dump and the
    * containment pair query so the fingerprint definitions cannot
    * drift.
    */
  private val winnowFpCte: String =
    s"""WITH t AS (SELECT doc_id, $Toks AS toks FROM documents),
       |ps AS (SELECT doc_id,
       |  unnest([{'p': i, 's': array_to_string(toks[i:i+2],' ')}
       |    for i in range(1, len(toks)-1)]) AS u FROM t),
       |h AS (SELECT doc_id, u.p AS pos, ${hex64("'wn|'||u.s")} AS h FROM ps),
       |w AS (SELECT doc_id, pos,
       |  min(h) OVER (PARTITION BY doc_id ORDER BY pos
       |    ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS wmin,
       |  count(*) OVER (PARTITION BY doc_id) AS n_sh FROM h),
       |fp AS (SELECT DISTINCT doc_id, wmin AS fingerprint FROM w
       |  WHERE pos <= n_sh - 3)""".stripMargin

  /** Winnowing (shingle w=3, window=4) — positional shingles via a
    * struct comprehension, window-min fingerprints over full windows.
    */
  val textWinnow: String =
    s"""$winnowFpCte
       |SELECT doc_id, fingerprint FROM fp
       |ORDER BY doc_id, fingerprint""".stripMargin

  /** Containment pairs over shared winnow fingerprints (mirror of
    * TextAnalysis.containment, minContainment = 0.5, DEFAULT df cap at
    * TextAnalysis.DefaultMaxFingerprintDf applied on both sides).
    */
  val textContainment: String =
    s"""$winnowFpCte,
       |fpc AS (SELECT doc_id, fingerprint FROM (
       |  SELECT doc_id, fingerprint,
       |    count(*) OVER (PARTITION BY fingerprint) AS df FROM fp)
       |  WHERE df <= ${TextAnalysis.DefaultMaxFingerprintDf}),
       |sz AS (SELECT doc_id, count(*) AS n FROM fpc GROUP BY doc_id),
       |sh AS (SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS n_shared
       |  FROM fpc x JOIN fpc y
       |    ON x.fingerprint = y.fingerprint AND x.doc_id < y.doc_id
       |  GROUP BY 1, 2)
       |SELECT a, b, n_shared, za.n AS n_a, zb.n AS n_b,
       |  n_shared / least(za.n, zb.n) AS containment
       |FROM sh
       |JOIN sz za ON a = za.doc_id
       |JOIN sz zb ON b = zb.doc_id
       |WHERE n_shared / least(za.n, zb.n) >= 0.5
       |ORDER BY a, b""".stripMargin

  /** Per-vector symmetric int8 quantization (mirror of Quantize.int8):
    * scale = 127/max|x| (0 for the zero vector), q = floor(x·scale+0.5).
    */
  val vecQuantize: String =
    s"""WITH s AS (SELECT vec_id, embedding,
       |  CASE WHEN list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) = 0
       |       THEN 0.0
       |       ELSE 127.0 / list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE))))
       |  END AS scale
       |  FROM embeddings),
       |e AS (SELECT vec_id, scale,
       |  unnest(generate_series(1, len(embedding))) - 1 AS i,
       |  CAST(unnest(embedding) AS DOUBLE) AS x FROM s)
       |SELECT vec_id, i, CAST(floor(x * scale + 0.5) AS BIGINT) AS q, scale
       |FROM e ORDER BY vec_id, i""".stripMargin

  /** [[textQuality]] with a pluggable source relation (composed
    * pipelines run the same chain over derived text).
    */
  def textQualityFrom(src: String): String =
    s"""WITH t AS (SELECT doc_id, lower(text) AS txt, $Toks AS toks FROM $src),
       |m AS (SELECT doc_id, length(txt)::BIGINT AS n_chars, len(toks)::BIGINT AS n_tokens,
       |  list_aggregate(list_transform(toks, x -> length(x)), 'sum') AS sum_len,
       |  length(regexp_replace(txt, '${graft.text.TextAnalysis.PunctKeepClass}', '', 'g'))::BIGINT AS n_punct,
       |  ${hits(TextAnalysis.stopwords)} AS n_stop
       |FROM t)
       |SELECT doc_id, n_chars, n_tokens,
       |  CASE WHEN n_tokens > 0 THEN sum_len / n_tokens END AS avg_token_len,
       |  CASE WHEN n_chars > 0 THEN n_punct / n_chars END AS punct_ratio,
       |  CASE WHEN n_tokens > 0 THEN n_stop / n_tokens END AS stop_ratio,
       |  CASE WHEN n_tokens > 0 THEN (least(n_tokens, 100) / 100.0) *
       |    (1.0 - CASE WHEN n_chars > 0 THEN n_punct / n_chars ELSE 0.0 END)
       |  ELSE 0.0 END AS quality_score
       |FROM m ORDER BY doc_id""".stripMargin

  val textQuality: String = textQualityFrom("documents")

  /** Per-source quality-percentile cut (mirror of
    * TextAnalysis.qualityFilter, keep top 3/10): the keep decision is
    * the integer comparison `q_rank·10 ≤ n_source·3`.
    */
  val sampleQualityFilter: String =
    s"""WITH t AS (SELECT doc_id, source, lower(text) AS txt, $Toks AS toks FROM documents),
       |m AS (SELECT doc_id, source, length(txt)::BIGINT AS n_chars,
       |  len(toks)::BIGINT AS n_tokens,
       |  length(regexp_replace(txt, '${graft.text.TextAnalysis.PunctKeepClass}', '', 'g'))::BIGINT AS n_punct
       |FROM t),
       |q AS (SELECT doc_id, source,
       |  CASE WHEN n_tokens > 0 THEN (least(n_tokens, 100) / 100.0) *
       |    (1.0 - CASE WHEN n_chars > 0 THEN n_punct / n_chars ELSE 0.0 END)
       |  ELSE 0.0 END AS quality_score
       |FROM m),
       |r AS (SELECT doc_id, source, quality_score,
       |  row_number() OVER (PARTITION BY source ORDER BY quality_score DESC, doc_id) AS q_rank,
       |  count(*) OVER (PARTITION BY source) AS n_source
       |FROM q)
       |SELECT doc_id, source, quality_score, q_rank::BIGINT AS q_rank,
       |  n_source::BIGINT AS n_source, q_rank * 10 <= n_source * 3 AS keep
       |FROM r ORDER BY doc_id""".stripMargin

  /** Deterministic-ln scaffolding: wraps `base` (a full SELECT whose
    * output includes the double column `argCol`) in projection stages
    * that add `outCol` = [[graft.expressions.DetLn.ln]](argCol),
    * generated from the SAME constants as the Spark expression —
    * exponent CASE over exact power-of-two literals, atanh-series
    * Horner with the shared coefficient array, identical association
    * order. No libm call on either side, so the comparison is
    * bit-exact on any IEEE engine (JVM Math/StrictMath.log and
    * glibc/DuckDB ln all disagree with each other on some args).
    * `passCols` is the final projected column list.
    */
  /** A double literal DuckDB is guaranteed to hold bit-exactly: bare
    * decimals are typed DECIMAL and the DECIMAL→DOUBLE conversion can
    * land 1 ulp off for >15-digit constants (e.g. 1/11 — and even
    * `::DOUBLE` casts AFTER the decimal parse, so it does not help);
    * E-notation literals parse directly as DOUBLE via strtod
    * (shortest-roundtrip exact).
    */
  private def dlit(x: Double): String = {
    val s = x.toString
    if (s.contains('E') || s.contains('e')) s else s + "e0"
  }

  def detLn(base: String, passCols: String, argCol: String,
      outCol: String, tag: String): String = {
    import graft.expressions.DetLn
    def p2(j: Int): String = dlit(java.lang.Math.scalb(1.0, j))
    val js = DetLn.MaxK to -DetLn.MaxK by -1
    val kCase = js.map(j => s"WHEN $argCol >= ${p2(j)} THEN $j")
      .mkString("CASE ", " ", s" ELSE ${-DetLn.MaxK} END")
    val pCase = js.map(j => s"WHEN $argCol >= ${p2(j)} THEN ${p2(j)}")
      .mkString("CASE ", " ", s" ELSE ${p2(-DetLn.MaxK)} END")
    val horner = DetLn.Coefs.init.foldRight(dlit(DetLn.Coefs.last)) {
      (c, acc) => s"${dlit(c)} + __u_$tag * ($acc)"
    }
    // x ≤ 0 (or NULL) yields NULL on both sides — mirrors DetLnExpr
    s"""SELECT $passCols,
       |  CASE WHEN $argCol > 0 AND NOT isnan($argCol) THEN
       |    __k_$tag * ${dlit(DetLn.LN2)} + 2.0e0 * __t_$tag * __s_$tag
       |  END AS $outCol
       |FROM (SELECT *, ($horner) AS __s_$tag
       |  FROM (SELECT *, __t_$tag * __t_$tag AS __u_$tag
       |    FROM (SELECT *, ($argCol / __p_$tag - 1.0e0) / ($argCol / __p_$tag + 1.0e0) AS __t_$tag
       |      FROM (SELECT *, $kCase AS __k_$tag, $pCase AS __p_$tag
       |        FROM ($base) __ln0_$tag) __ln1_$tag) __ln2_$tag) __ln3_$tag) __ln4_$tag""".stripMargin
  }

  /** PMI collocations over the top-200 vocabulary (mirror of
    * TextAnalysis.tokenPmi, minCoDf = 5). Products in double with the
    * same association order; the log goes through [[detLn]].
    */
  val textPmi: String = {
    val base =
      s"""WITH t AS (SELECT doc_id, $Toks AS toks FROM documents),
         |dt AS (SELECT DISTINCT doc_id, unnest(toks) AS t FROM t),
         |dfs AS (SELECT t, count(*) AS df FROM dt GROUP BY t),
         |vocab AS (SELECT t, df FROM dfs ORDER BY df DESC, t LIMIT 200),
         |vt AS (SELECT dt.doc_id, dt.t FROM dt JOIN vocab ON dt.t = vocab.t),
         |co AS (SELECT x.t AS a, y.t AS b, count(*) AS co_df
         |  FROM vt x JOIN vt y ON x.doc_id = y.doc_id AND x.t < y.t
         |  GROUP BY 1, 2 HAVING count(*) >= 5),
         |n AS (SELECT count(*) AS n_docs FROM documents)
         |SELECT a, b, co_df, va.df AS df_a, vb.df AS df_b,
         |  (co_df::DOUBLE * n_docs) / (va.df::DOUBLE * vb.df) AS lift
         |FROM co
         |JOIN vocab va ON co.a = va.t
         |JOIN vocab vb ON co.b = vb.t
         |CROSS JOIN n""".stripMargin
    detLn(base, "a, b, co_df, df_a, df_b", "lift", "pmi", "pmi") +
      "\nORDER BY a, b"
  }

  /** Corpus composition per (source, lang) (mirror of
    * TextAnalysis.corpusStats).
    */
  val corpusStats: String =
    s"""WITH t AS (SELECT source, lang, len($Toks)::BIGINT AS n_tokens, n_chars
       |  FROM documents)
       |SELECT source, lang, count(*) AS n_docs,
       |  sum(n_tokens)::BIGINT AS total_tokens,
       |  sum(n_chars)::BIGINT AS total_chars,
       |  sum(n_tokens)::BIGINT / count(*) AS avg_tokens
       |FROM t GROUP BY source, lang
       |ORDER BY source, lang""".stripMargin

  /** Top-100 n-grams by document frequency (mirror of
    * TextAnalysis.topNgrams).
    */
  val textTopNgrams: String =
    s"""$ShCte,
       |g AS (SELECT s, count(*) AS df FROM sh GROUP BY s),
       |r AS (SELECT s, df, row_number() OVER (ORDER BY df DESC, s) AS rank FROM g)
       |SELECT s, df, rank FROM r WHERE rank <= 100
       |ORDER BY rank""".stripMargin

  /** BM25 against the shared fixed term set (mirror of
    * TextAnalysis.bm25; k1 = 1.2, b = 0.75). Every subexpression is
    * written in the same association order as the Spark side; each
    * term's idf log goes through [[detLn]].
    *
    * Constants are forced to DOUBLE: DuckDB otherwise keeps
    * int×decimal-literal EXACT (3 × 2.2 = decimal 6.6) where Spark does
    * IEEE double math (6.6000000000000005) — a 1-ulp mismatch factory.
    * k1+1 is computed in Scala and injected as its shortest-roundtrip
    * decimal so both engines hold the bit-identical double (the literal
    * 2.2 need not equal the sum 1.2 + 1.0).
    */
  val textBm25: String = {
    val terms = TextAnalysis.Bm25Terms
    val dfAggs = terms.zipWithIndex.map { case (term, i) =>
      s"  sum(CASE WHEN list_contains(toks, '$term') THEN 1 ELSE 0 END)::BIGINT AS df_$i"
    }.mkString(",\n")
    val tfCols = terms.zipWithIndex.map { case (term, i) =>
      s"  len(list_filter(toks, x -> x = '$term'))::BIGINT AS tf_$i"
    }.mkString(",\n")
    val idfArgs = terms.indices.map { i =>
      s"  1.0::DOUBLE + (n_docs - df_$i + 0.5::DOUBLE) / (df_$i + 0.5::DOUBLE) AS idfarg_$i"
    }.mkString(",\n")
    val base0 =
      s"""WITH t AS (SELECT doc_id, $Toks AS toks FROM documents),
         |d AS (SELECT doc_id, toks, len(toks)::BIGINT AS dl FROM t),
         |s AS (SELECT count(*)::BIGINT AS n_docs, sum(dl)::BIGINT AS sum_dl,
         |$dfAggs
         |  FROM d),
         |f AS (SELECT doc_id, dl,
         |$tfCols
         |  FROM d)
         |SELECT doc_id, dl, n_docs, sum_dl,
         |${terms.indices.map(i => s"  tf_$i, df_$i,").mkString("\n")}
         |$idfArgs
         |FROM f CROSS JOIN s""".stripMargin
    // one detLn wrap per term, threading the growing column list
    val carry = Seq("doc_id", "dl", "n_docs", "sum_dl") ++
      terms.indices.flatMap(i => Seq(s"tf_$i", s"df_$i")) ++
      terms.indices.map(i => s"idfarg_$i")
    val wrapped = terms.indices.foldLeft((base0, carry)) { case ((q, cols), i) =>
      (detLn(q, cols.mkString(", "), s"idfarg_$i", s"idf_$i", s"bm$i"),
        cols :+ s"idf_$i")
    }._1
    val k1p1 = dlit(1.2 + 1.0)
    val score = terms.indices.map { i =>
      s"idf_$i * (tf_$i * $k1p1) " +
        s"/ (tf_$i + 1.2::DOUBLE * (1.0::DOUBLE - 0.75::DOUBLE + 0.75::DOUBLE * (dl / (sum_dl / n_docs))))"
    }.mkString("\n    + ")
    s"""SELECT doc_id, dl,
       |    $score AS bm25
       |FROM ($wrapped) __bm
       |ORDER BY doc_id""".stripMargin
  }

  /** Exact heavy hitters (mirror of TextAnalysis.heavyHitters, 1/100
    * support): the Spark side goes sketch-then-verify, but the result
    * is defined purely as the integer comparison below.
    */
  val corpusHeavyHitters: String =
    s"""WITH t AS (SELECT doc_id, $Toks AS toks FROM documents),
       |tok AS (SELECT unnest(toks) AS token FROM t),
       |tot AS (SELECT count(*)::BIGINT AS n_total FROM tok),
       |c AS (SELECT token, count(*)::BIGINT AS cnt FROM tok GROUP BY 1)
       |SELECT token, cnt, n_total FROM c CROSS JOIN tot
       |WHERE cnt * 100 > n_total * 1
       |ORDER BY cnt DESC, token""".stripMargin

  /** Count-Min sketch top-token estimates (mirror of
    * CountMin.sketchTopTokensQuery, depth=4 width=8192): the sketch is
    * deterministic integer arithmetic on the portable hex64 hash, so
    * the oracle rebuilds the full counter grid and the estimates match
    * bit-for-bit — no tolerance band.
    */
  val corpusCmsCounts: String =
    s"""WITH t AS (SELECT doc_id, $Toks AS toks FROM documents),
       |tok AS (SELECT unnest(toks) AS token FROM t),
       |pr AS (SELECT token, unnest(generate_series(0, 3)) AS j FROM tok),
       |sk AS (SELECT j, ${hex64("CAST(j AS VARCHAR)||'|'||token")} % 8192 AS bucket,
       |  count(*)::BIGINT AS cnt FROM pr GROUP BY 1, 2),
       |top AS (SELECT token, count(*)::BIGINT AS n_exact FROM tok GROUP BY 1
       |  ORDER BY n_exact DESC, token LIMIT 30),
       |qb AS (SELECT token, n_exact, j,
       |  ${hex64("CAST(j AS VARCHAR)||'|'||token")} % 8192 AS bucket
       |  FROM (SELECT token, n_exact, unnest(generate_series(0, 3)) AS j FROM top)),
       |est AS (SELECT token, n_exact, min(coalesce(cnt, 0))::BIGINT AS cms_count
       |  FROM qb LEFT JOIN sk USING (j, bucket) GROUP BY 1, 2)
       |SELECT token, n_exact, cms_count, cms_count - n_exact AS overestimate
       |FROM est ORDER BY n_exact DESC, token""".stripMargin

  /** Inverted index (mirror of TextAnalysis.invertedIndexDigest,
    * default maxDf): per token df/cf + doc_id-sorted posting lists
    * digested to scalar hex64 columns (posting values comma-joined in
    * doc_id order, then hashed) — same content as the array form, but
    * sortable/hashable by the driver's tabular canonicalization.
    */
  val textInvertedIndex: String =
    s"""WITH t AS (SELECT doc_id, $Toks AS toks FROM documents),
       |tok AS (SELECT doc_id, unnest(toks) AS token FROM t),
       |dt AS (SELECT token, doc_id, count(*)::BIGINT AS tf FROM tok GROUP BY 1, 2),
       |dfs AS (SELECT token, count(*)::BIGINT AS df, sum(tf)::BIGINT AS cf
       |  FROM dt GROUP BY 1),
       |p AS (SELECT d.token, d.df, d.cf,
       |  array_to_string(list(dt.doc_id ORDER BY dt.doc_id), ',') AS ids_s,
       |  array_to_string(list(dt.tf ORDER BY dt.doc_id), ',') AS tfs_s
       |FROM dfs d JOIN dt ON dt.token = d.token
       |WHERE d.df <= ${graft.text.TextAnalysis.DefaultMaxTokenDf}
       |GROUP BY d.token, d.df, d.cf)
       |SELECT token, df, cf, ${hex64("ids_s")} AS doc_ids_h,
       |  ${hex64("tfs_s")} AS tfs_h
       |FROM p ORDER BY token""".stripMargin

  /** BM25 top-k search over the query terms (mirror of
    * TextAnalysis.searchTopK): candidates = docs containing ≥1 kept
    * (df ≤ maxDf) query term; scoring identical to [[textBm25]]
    * (same constants, association order, detLn), then
    * (score desc, doc_id) top-20.
    */
  val textSearchTopK: String = {
    val terms = TextAnalysis.Bm25Terms
    val maxDf = TextAnalysis.DefaultMaxTokenDf
    val dfAggs = terms.zipWithIndex.map { case (term, i) =>
      s"  sum(CASE WHEN list_contains(toks, '$term') THEN 1 ELSE 0 END)::BIGINT AS df_$i"
    }.mkString(",\n")
    val tfCols = terms.zipWithIndex.map { case (term, i) =>
      s"  len(list_filter(toks, x -> x = '$term'))::BIGINT AS tf_$i"
    }.mkString(",\n")
    val idfArgs = terms.indices.map { i =>
      s"  1.0::DOUBLE + (n_docs - df_$i + 0.5::DOUBLE) / (df_$i + 0.5::DOUBLE) AS idfarg_$i"
    }.mkString(",\n")
    val candWhere = terms.indices
      .map(i => s"(tf_$i > 0 AND df_$i <= $maxDf)").mkString(" OR ")
    val base0 =
      s"""WITH t AS (SELECT doc_id, $Toks AS toks FROM documents),
         |d AS (SELECT doc_id, toks, len(toks)::BIGINT AS dl FROM t),
         |s AS (SELECT count(*)::BIGINT AS n_docs, sum(dl)::BIGINT AS sum_dl,
         |$dfAggs
         |  FROM d),
         |f AS (SELECT doc_id, dl,
         |$tfCols
         |  FROM d)
         |SELECT doc_id, dl, n_docs, sum_dl,
         |${terms.indices.map(i => s"  tf_$i, df_$i,").mkString("\n")}
         |$idfArgs
         |FROM f CROSS JOIN s
         |WHERE $candWhere""".stripMargin
    val carry = Seq("doc_id", "dl", "n_docs", "sum_dl") ++
      terms.indices.flatMap(i => Seq(s"tf_$i", s"df_$i")) ++
      terms.indices.map(i => s"idfarg_$i")
    val wrapped = terms.indices.foldLeft((base0, carry)) { case ((q, cols), i) =>
      (detLn(q, cols.mkString(", "), s"idfarg_$i", s"idf_$i", s"sr$i"),
        cols :+ s"idf_$i")
    }._1
    val k1p1 = dlit(1.2 + 1.0)
    val score = terms.indices.map { i =>
      s"CASE WHEN tf_$i > 0 AND df_$i <= $maxDf THEN idf_$i * (tf_$i * $k1p1) " +
        s"/ (tf_$i + 1.2::DOUBLE * (1.0::DOUBLE - 0.75::DOUBLE + 0.75::DOUBLE * (dl / (sum_dl / n_docs)))) " +
        "ELSE 0.0e0 END"
    }.mkString("\n    + ")
    s"""SELECT doc_id,
       |    $score AS score
       |FROM ($wrapped) __search
       |ORDER BY score DESC, doc_id LIMIT 20""".stripMargin
  }

  /** Gopher-rules quality battery (mirror of TextAnalysis.gopherQuality). */
  /** RSS/Atom feed items (mirror of `Feed.items` ∘ the web_feed
    * synth): item grain, every field re-derived from doc_id — the
    * (d+i)%3 title lanes prove CDATA pass-through and entity decode
    * (the oracle holds only the DECODED strings), the d%2 root lane
    * proves both the RSS link-element and Atom href-attribute
    * extraction paths. Invalid (text) docs keep one all-null row.
    */
  val webFeed: String =
    """WITH m AS (SELECT doc_id, doc_id % 10 = 0 AS invalid,
      |  1 + doc_id % 3 AS ni FROM documents),
      |l AS (SELECT doc_id, unnest(range(ni)) AS li FROM m WHERE NOT invalid
      |  UNION ALL SELECT doc_id, NULL AS li FROM m WHERE invalid),
      |v AS (SELECT l.doc_id, l.li, m.invalid FROM l JOIN m USING (doc_id))
      |SELECT doc_id,
      |  NOT invalid AS feed_valid,
      |  CASE WHEN invalid THEN NULL
      |    WHEN doc_id % 2 = 0 THEN 'rss' ELSE 'atom' END AS feed_type,
      |  CASE WHEN invalid THEN NULL
      |    ELSE 'Feed & ' || doc_id::VARCHAR END AS feed_title,
      |  li::BIGINT AS item_idx,
      |  CASE WHEN invalid THEN NULL
      |    WHEN (doc_id + li) % 3 = 1 THEN 'Item ' || doc_id::VARCHAR
      |      || ' ' || li::VARCHAR || ' & raw'
      |    WHEN (doc_id + li) % 3 = 2 THEN 'Item ' || doc_id::VARCHAR
      |      || ' ' || li::VARCHAR || ' & co'
      |    ELSE 'Item ' || doc_id::VARCHAR || ' ' || li::VARCHAR
      |    END AS title,
      |  CASE WHEN invalid THEN NULL ELSE 'http://ex.com/'
      |    || doc_id::VARCHAR || '/' || li::VARCHAR END AS link,
      |  CASE WHEN invalid THEN NULL ELSE 'g-' || doc_id::VARCHAR
      |    || '-' || li::VARCHAR END AS guid,
      |  CASE WHEN invalid THEN NULL ELSE '2026-01-'
      |    || lpad((doc_id % 28 + 1)::VARCHAR, 2, '0') END AS published
      |FROM v ORDER BY doc_id, item_idx""".stripMargin

  /** Markdown structure (mirror of the text_markdown synth wiring):
    * every structural count re-derived from doc_id; the prose word
    * count additionally tokenizes the doc's own 40-char text snippet
    * with DuckDB's regex splitter, so a hash match proves the
    * kernel's line scan AND its prose tokenizer on real data. Fixed
    * word contributions: 3/heading, 1/quote line, 2/list item
    * (unordered + ordered), 1 'see' + 1/link + 1/image.
    */
  val textMarkdown: String =
    """WITH m AS (SELECT doc_id, text,
      |  1 + doc_id % 3 AS nh, doc_id % 5 AS nq, doc_id % 4 AS nl,
      |  doc_id % 3 AS nor, 1 + doc_id % 4 AS ncl,
      |  1 + doc_id % 2 AS nk, doc_id % 2 AS nimg
      |  FROM documents),
      |b AS (SELECT *, 'p' || doc_id::VARCHAR || ' ' ||
      |  replace(replace(substring(text, 1, 40), chr(10), ' '),
      |    chr(13), ' ') AS body FROM m)
      |SELECT doc_id,
      |  nh::BIGINT AS n_headings,
      |  list_max([(doc_id + i) % 6 + 1 for i in range(nh)])::BIGINT
      |    AS max_heading_level,
      |  1::BIGINT AS n_code_blocks,
      |  ncl::BIGINT AS n_code_lines,
      |  (nl + nor)::BIGINT AS n_list_items,
      |  nk::BIGINT AS n_links,
      |  nimg::BIGINT AS n_images,
      |  nq::BIGINT AS n_quote_lines,
      |  (3 * nh + nq + 2 * nl + 2 * nor + 1 + nk + nimg
      |   + length(list_filter(regexp_split_to_array(body, '[ \t]+'),
      |       x -> x <> '')))::BIGINT AS n_prose_words
      |FROM b ORDER BY doc_id""".stripMargin

  val textGopher: String = {
    val meanLen = "CASE WHEN n_words > 0 THEN sum_len / n_words END"
    val symbolRatio = "CASE WHEN n_words > 0 THEN (n_hash + n_ellipsis) / n_words END"
    val alphaRatio = "CASE WHEN n_words > 0 THEN n_alpha_words / n_words END"
    val bulletRatio = "CASE WHEN n_lines > 0 THEN n_bullet_lines / n_lines END"
    val ellipsisRatio = "CASE WHEN n_lines > 0 THEN n_ellipsis_lines / n_lines END"
    s"""WITH t AS (SELECT doc_id, text, $Toks AS toks FROM documents),
       |m AS (SELECT doc_id,
       |  len(toks)::BIGINT AS n_words,
       |  list_aggregate(list_transform(toks, x -> length(x)), 'sum') AS sum_len,
       |  (length(text) - length(replace(text, '#', '')))::BIGINT AS n_hash,
       |  ((length(text) - length(replace(text, '...', ''))) // 3
       |    + (length(text) - length(replace(text, '…', ''))))::BIGINT AS n_ellipsis,
       |  len(list_filter(toks, x -> regexp_matches(x, '${graft.text.TextAnalysis.AlphaTokenClass}')))::BIGINT AS n_alpha_words,
       |  ${hits(TextAnalysis.stopwords)} AS n_stop,
       |  string_split(text, chr(10)) AS lines
       |  FROM t),
       |m2 AS (SELECT *, len(lines)::BIGINT AS n_lines,
       |  len(list_filter(lines, l -> substr(ltrim(l),1,1) IN ('-','*','•')))::BIGINT AS n_bullet_lines,
       |  len(list_filter(lines, l -> ends_with(rtrim(l),'...') OR ends_with(rtrim(l),'…')))::BIGINT AS n_ellipsis_lines
       |  FROM m)
       |SELECT doc_id, n_words,
       |  $meanLen AS mean_word_len,
       |  $symbolRatio AS symbol_ratio,
       |  $bulletRatio AS bullet_line_ratio,
       |  $ellipsisRatio AS ellipsis_line_ratio,
       |  $alphaRatio AS alpha_word_ratio,
       |  n_stop,
       |  (n_words >= 50 AND n_words <= 100000
       |   AND ($meanLen) >= 3.0 AND ($meanLen) <= 10.0
       |   AND ($symbolRatio) <= 0.1
       |   AND coalesce($bulletRatio, 0.0) <= 0.9
       |   AND coalesce($ellipsisRatio, 0.0) <= 0.3
       |   AND ($alphaRatio) >= 0.8
       |   AND n_stop >= 2) AS gopher_pass
       |FROM m2 ORDER BY doc_id""".stripMargin
  }

  val textLangid: String = {
    val scoreCols = TextAnalysis.langMarkers
      .map { case (l, ws) => s"  ${hits(ws)} AS s_$l" }.mkString(",\n")
    val names = TextAnalysis.langMarkers.map(_._1)
    val caseChain = names.init.zipWithIndex.map { case (l, i) =>
      val rest = names.drop(i + 1).map(l2 => s"s_$l >= s_$l2").mkString(" AND ")
      s"WHEN $rest THEN '$l'"
    }.mkString(" ")
    s"""WITH t AS (SELECT doc_id, $Toks AS toks FROM documents),
       |s AS (SELECT doc_id,
       |$scoreCols
       |FROM t)
       |SELECT doc_id, ${names.map(l => s"s_$l").mkString(", ")},
       |  CASE WHEN ${names.map(l => s"s_$l").mkString(" + ")} = 0 THEN 'und'
       |  $caseChain ELSE '${names.last}' END AS pred_lang
       |FROM s ORDER BY doc_id""".stripMargin
  }

  /** Unicode script profile (mirror of
    * TextAnalysis.scriptProfileMultilingual): the SAME script tails
    * and tracked-script list ride into both engines from one Scala
    * constant each; every count is a RE2 script-class match count
    * (`\p{Latin}`… — script property alone, exactly the kernel's
    * semantics), the dominant script the same fixed-order CASE chain.
    */
  /** Script-profile chain over a relation providing (doc_id, s) —
    * shared by the tailed gate row and composed pipelines.
    */
  private def scriptProfileOver(srcSql: String): String = {
    val names = graft.expressions.ScriptCounts.Names
    val countCols = ("  len(regexp_extract_all(s, '\\p{L}'))::BIGINT AS n_letters" +:
      names.map(nm =>
        s"  len(regexp_extract_all(s, '[\\p{${nm.capitalize}}]'))::BIGINT AS n_$nm"))
      .mkString(",\n")
    val total = names.map(nm => s"n_$nm").mkString(" + ")
    val top = s"greatest(${names.map(nm => s"n_$nm").mkString(", ")})"
    val caseChain = names.init
      .map(nm => s"WHEN n_$nm = __top THEN '$nm'").mkString(" ")
    s"""WITH c AS (SELECT doc_id,
       |$countCols
       |FROM $srcSql),
       |g AS (SELECT *, $top AS __top, $total AS __total FROM c)
       |SELECT doc_id, n_letters, ${names.map(nm => s"n_$nm").mkString(", ")},
       |  CASE WHEN __total = 0 THEN 'und' $caseChain
       |    ELSE '${names.last}' END AS dominant_script,
       |  CASE WHEN __total > 0 THEN __top / __total END AS script_ratio
       |FROM g ORDER BY doc_id""".stripMargin
  }

  val textScripts: String = {
    val cases = graft.text.TextAnalysis.ScriptTails.zipWithIndex
      .map { case (tl, i) => s"WHEN ${i.toLong} THEN '${tl.replace("'", "''")}'" }
      .mkString(" ")
    scriptProfileOver(
      s"""(SELECT doc_id,
         |  text || CASE doc_id % ${graft.text.TextAnalysis.ScriptTails.size} $cases END AS s
         |  FROM documents) m""".stripMargin)
  }

  /** DuckDB E-string literal (newlines/quotes escaped) — scaffold
    * constants ride into the oracle verbatim.
    */
  private def slit(s: String): String =
    "e'" + s.replace("\\", "\\\\").replace("'", "''").replace("\n", "\\n") + "'"

  /** HTML extraction (mirror of Html.extractPlanted): the SAME
    * scaffold, strip patterns, ordered entity table and whitespace
    * class ride in from the Html constants; tag-strip is RE2
    * `regexp_replace(…,'g')`, entity decode literal `replace`.
    */
  /** The tag-strip + entity-decode + collapse chain over a column
    * named `h` — shared by the extract row and the composed web
    * pipeline.
    */
  private lazy val htmlTxtExpr: String = {
    import graft.text.Html
    val stripped = Seq(Html.ScriptBlock, Html.StyleBlock,
      Html.CommentBlock, Html.AnyTag)
      .foldLeft("h") { (acc, pat) =>
        s"regexp_replace($acc, '$pat', ' ', 'g')" }
    // numeric plants FIRST (r13): the Spark side decodes numeric refs
    // generically in the single-pass kernel; DuckDB mirrors the
    // PLANTED set by literal replace (none of the planted sequences
    // interacts with the named list, and the invalid plants appear in
    // no list — both engines keep them literal). Running them before
    // the named fold means a later `&amp;`→`&` rewrite can never
    // fabricate a numeric-looking sequence the kernel would not see.
    val numeric = Html.NumericPlants.foldLeft(stripped) {
      case (acc, (ent, ch)) => s"replace($acc, ${slit(ent)}, ${slit(ch)})" }
    val decoded = Html.Entities.foldLeft(numeric) {
      case (acc, (ent, ch)) => s"replace($acc, ${slit(ent)}, ${slit(ch)})" }
    s"trim(regexp_replace($decoded, '${Html.WhitespaceClass}', ' ', 'g'))"
  }

  /** The scaffold-wrap CTE body (doc_id, h) — ditto. */
  private lazy val htmlWrapSql: String = {
    import graft.text.Html
    s"""SELECT doc_id,
       |  ${slit(Html.ScaffoldPrefix)} || text || ${slit(Html.ScaffoldSuffix)} AS h
       |  FROM documents""".stripMargin
  }

  val textHtmlExtract: String = {
    import graft.text.Html
    s"""WITH m AS ($htmlWrapSql),
       |e AS (SELECT doc_id, h, $htmlTxtExpr AS txt
       |FROM m)
       |SELECT doc_id, txt AS text,
       |  length(h)::BIGINT AS n_html_chars,
       |  length(txt)::BIGINT AS n_text_chars,
       |  CASE WHEN length(h) > 0 THEN length(txt) / length(h) END AS text_ratio,
       |  len(regexp_extract_all(h, '(?i)<a${Html.TagBoundary}'))::BIGINT AS n_links,
       |  len(regexp_extract_all(h, '(?i)<p${Html.TagBoundary}'))::BIGINT AS n_paragraphs
       |FROM e ORDER BY doc_id""".stripMargin
  }

  /** Raw-crawl curation (mirror of Pipeline.webCurate, thresholds
    * 0.1 / 0.5 / 0.3): scaffold-wrap → extract, then the script /
    * quality / exact-dedup chains run over the EXTRACTED corpus via
    * the pluggable-source builders — the composition reuses the
    * individually-gated mirrors so it cannot drift from them.
    */
  lazy val pipelineWeb: String = {
    import graft.text.Html
    val scripts = scriptProfileOver("(SELECT doc_id, text AS s FROM webdocs) m")
    s"""WITH wp AS ($htmlWrapSql),
       |webdocs AS (SELECT doc_id, $htmlTxtExpr AS text,
       |  length(h)::BIGINT AS n_html_chars,
       |  len(regexp_extract_all(h, '(?i)<a${Html.TagBoundary}'))::BIGINT AS n_links
       |FROM wp),
       |wr AS (SELECT doc_id,
       |  CASE WHEN n_html_chars > 0 THEN length(text) / n_html_chars END AS text_ratio,
       |  n_links FROM webdocs)
       |SELECT w.doc_id, w.text_ratio, w.n_links,
       |  s.dominant_script, s.script_ratio, q.quality_score,
       |  e.keep AS dedup_keep,
       |  (w.text_ratio >= ${dlit(0.1)}
       |    AND coalesce(s.script_ratio >= ${dlit(0.5)}, false)
       |    AND q.quality_score >= ${dlit(0.3)} AND e.keep) AS keep
       |FROM wr w
       |JOIN ($scripts) s ON w.doc_id = s.doc_id
       |JOIN (${textQualityFrom("webdocs")}) q ON w.doc_id = q.doc_id
       |JOIN (${dedupExactFrom("webdocs")}) e ON w.doc_id = e.doc_id
       |ORDER BY w.doc_id""".stripMargin
  }

  /** The complete crawl decision (mirror of Pipeline.crawlPipeline
    * over the pipeline_curate URL planting + the pipeline_web
    * scaffold + synthRobots): URL stages closed-form (canonical,
    * quota rank, blocklist), robots as the closed-form longest-match
    * CASE over the RAW parsed path (the planted rule set makes the
    * precedence derivable: /s/s/s allow beats /s/s disallow; .com
    * additionally blocks /doc), content stages via the shared
    * pluggable-source builders over the extracted CTE.
    */
  lazy val pipelineCrawl: String = {
    val scripts = scriptProfileOver("(SELECT doc_id, text AS s FROM webdocs) m")
    s"""WITH kk AS (SELECT doc_id, text, (doc_id // 2) * 2 AS k FROM documents),
       |u AS (SELECT doc_id, text, k,
       |  (CASE k % 7 WHEN 0 THEN '' WHEN 1 THEN 'www.' WHEN 2 THEN 'cdn.'
       |    WHEN 3 THEN 'm.' WHEN 4 THEN 'a.' WHEN 5 THEN 'b.' ELSE 'c.' END) AS sub,
       |  'src' || (k % 20)::VARCHAR AS src2,
       |  (CASE (k // 3) % 3 WHEN 0 THEN 'com' WHEN 1 THEN 'org' ELSE 'net' END) AS tld
       |  FROM kk),
       |p AS (SELECT doc_id, k, tld,
       |  sub || src2 || '.' || tld AS host,
       |  src2 || '.' || tld AS domain,
       |  'https://' || sub || src2 || '.' || tld ||
       |    repeat('/s', (k % 4)::INT) || '/doc' || k::VARCHAR ||
       |    (CASE doc_id % 5 WHEN 2 THEN '?a=1&b=2' WHEN 3 THEN '?a=1&z=9'
       |      ELSE '' END) AS canonical_url,
       |  repeat('/s', (k % 4)::INT) || '/doc' || k::VARCHAR ||
       |    (CASE WHEN doc_id % 5 = 4 THEN '/' ELSE '' END) AS path
       |  FROM u),
       |rb AS (SELECT doc_id,
       |  CASE WHEN starts_with(path, '/s/s/s') THEN true
       |    WHEN starts_with(path, '/s/s') THEN false
       |    WHEN tld = 'com' AND starts_with(path, '/doc') THEN false
       |    ELSE true END AS robots_allowed FROM p),
       |q AS (SELECT doc_id, domain,
       |  row_number() OVER (PARTITION BY domain ORDER BY
       |    ${hex64("'quota|'||CAST(doc_id AS VARCHAR)")} % ${graft.ops.Sampling.StratModulus},
       |    doc_id) AS rn FROM p),
       |urlk AS (SELECT canonical_url, min(doc_id) AS keeper FROM p GROUP BY 1),
       |wp AS ($htmlWrapSql),
       |webdocs AS (SELECT doc_id, $htmlTxtExpr AS text,
       |  length(h)::BIGINT AS n_html_chars FROM wp),
       |wr AS (SELECT doc_id,
       |  CASE WHEN n_html_chars > 0 THEN length(text) / n_html_chars END
       |    AS text_ratio FROM webdocs)
       |SELECT p.doc_id, p.host, p.domain, p.canonical_url,
       |  rb.robots_allowed,
       |  (len(list_filter(['src0.com', 'src1.org', 'src2.net'],
       |    bd -> p.host = bd OR p.host LIKE '%.' || bd)) > 0) AS domain_blocked,
       |  (q.rn <= 5) AS quota_keep,
       |  (p.doc_id = urlk.keeper) AS url_keep,
       |  w.text_ratio, s.script_ratio, qq.quality_score,
       |  e.keep AS dedup_keep,
       |  (w.text_ratio >= ${dlit(0.1)}
       |    AND coalesce(s.script_ratio >= ${dlit(0.5)}, false)
       |    AND qq.quality_score >= ${dlit(0.3)} AND e.keep) AS content_keep,
       |  (rb.robots_allowed
       |    AND NOT (len(list_filter(['src0.com', 'src1.org', 'src2.net'],
       |      bd -> p.host = bd OR p.host LIKE '%.' || bd)) > 0)
       |    AND q.rn <= 5 AND p.doc_id = urlk.keeper
       |    AND (w.text_ratio >= ${dlit(0.1)}
       |      AND coalesce(s.script_ratio >= ${dlit(0.5)}, false)
       |      AND qq.quality_score >= ${dlit(0.3)} AND e.keep)) AS keep
       |FROM p
       |JOIN rb ON rb.doc_id = p.doc_id
       |JOIN q ON q.doc_id = p.doc_id
       |JOIN urlk ON urlk.canonical_url = p.canonical_url
       |JOIN wr w ON w.doc_id = p.doc_id
       |JOIN ($scripts) s ON s.doc_id = p.doc_id
       |JOIN (${textQualityFrom("webdocs")}) qq ON qq.doc_id = p.doc_id
       |JOIN (${dedupExactFrom("webdocs")}) e ON e.doc_id = p.doc_id
       |ORDER BY p.doc_id""".stripMargin
  }

  /** Frontier seen-filter (mirror of Curation.filterSeen over the
    * messy re-crawl planting): canonical URLs closed-form (the messy
    * variants collapse back to the clean synth URL, except the
    * genuine query-string variants which survive sorted and
    * untracked); seen = EXISTS against the landed even-id set — the
    * Bloom is pruning-only, the result IS the exact membership test.
    */
  val frontierSeen: String = {
    val base =
      """'https://' ||
        |  (CASE doc_id % 7 WHEN 0 THEN '' WHEN 1 THEN 'www.' WHEN 2 THEN 'cdn.'
        |    WHEN 3 THEN 'm.' WHEN 4 THEN 'a.' WHEN 5 THEN 'b.' ELSE 'c.' END) ||
        |  source || '.' ||
        |  (CASE (doc_id // 3) % 3 WHEN 0 THEN 'com' WHEN 1 THEN 'org' ELSE 'net' END) ||
        |  repeat('/s', (doc_id % 4)::INT) || '/doc' || doc_id::VARCHAR""".stripMargin
    s"""WITH f AS (SELECT doc_id, $base ||
       |  (CASE doc_id % 5 WHEN 2 THEN '?a=1&b=2' WHEN 3 THEN '?a=1&z=9'
       |    ELSE '' END) AS canonical_url FROM documents),
       |l AS (SELECT $base AS c FROM documents WHERE doc_id % 2 = 0)
       |SELECT f.doc_id, f.canonical_url,
       |  EXISTS(SELECT 1 FROM l WHERE l.c = f.canonical_url) AS seen,
       |  NOT EXISTS(SELECT 1 FROM l WHERE l.c = f.canonical_url) AS keep
       |FROM f ORDER BY f.doc_id""".stripMargin
  }

  /** WARC record split + parse (mirror of Warc.splitRecords ∘
    * parseRecords over the two-record synth archives): the oracle
    * emits the closed-form fields directly — Spark must reach them by
    * actually walking the stream by Content-Length (a planted body
    * carries the literal record magic, so a pattern split would
    * mis-cut and hash-mismatch).
    */
  // lazy: UrlSynth initializes further down the object
  lazy val warcRecords: String =
    s"""WITH u AS ($UrlSynth),
       |b AS (SELECT doc_id, url, substring(text, 1, 120) AS body1,
       |  'meta WARC/1.0 inside body for doc ' || doc_id::VARCHAR AS body2
       |  FROM u)
       |SELECT doc_id, 0::BIGINT AS rec_idx, true AS warc_valid,
       |  'response' AS warc_type, url AS target_uri,
       |  length(body1)::BIGINT AS content_length, body1 AS body,
       |  true AS length_ok
       |FROM b
       |UNION ALL
       |SELECT doc_id, 1::BIGINT, true, 'metadata', url,
       |  length(body2)::BIGINT, body2, true FROM b
       |ORDER BY doc_id, rec_idx""".stripMargin

  /** `.warc.gz` ingest (mirror of Warc.parseRecords ∘ splitRecordsGz
    * ∘ gzMember synth): one gzip member per record, so member_idx
    * enumerates the records and rec_idx is 0 within each member. The
    * oracle recomputes every field from text closed-form — Spark must
    * reach them by actually inflating the members (CRC-verified) and
    * walking the Content-Length offsets.
    */
  lazy val warcGzRecords: String =
    s"""WITH u AS ($UrlSynth),
       |b AS (SELECT doc_id, url, substring(text, 1, 120) AS body1,
       |  'meta WARC/1.0 inside body for doc ' || doc_id::VARCHAR AS body2
       |  FROM u)
       |SELECT doc_id, 0::BIGINT AS member_idx, 0::BIGINT AS rec_idx,
       |  true AS warc_valid, 'response' AS warc_type, url AS target_uri,
       |  length(body1)::BIGINT AS content_length, body1 AS body,
       |  true AS length_ok
       |FROM b
       |UNION ALL
       |SELECT doc_id, 1::BIGINT, 0::BIGINT, true, 'metadata', url,
       |  length(body2)::BIGINT, body2, true FROM b
       |ORDER BY doc_id, member_idx, rec_idx""".stripMargin

  /** WebDataset shard ingest (mirror of Wds.samples ∘ tar synth +
    * the JPEG decode of each sample's image member): stems, member
    * counts, labels, text hashes, and the DECODED grayscale stats all
    * re-derived closed-form — Spark must reach them by walking real
    * ustar blocks and entropy-decoding real JPEG scans.
    */
  lazy val wdsSamples: String =
    s"""WITH m AS (SELECT doc_id, text, unnest([0, 1]) AS i FROM documents),
       |s AS (SELECT doc_id,
       |  's' || (doc_id * 2 + i)::VARCHAR AS stem,
       |  3::BIGINT AS n_members,
       |  ((doc_id + i) % 10)::VARCHAR AS cls,
       |  ${hex64("substring(text, 1 + 40 * i, 40)")} AS txt_hash,
       |  ((7 * doc_id + (0 + 2 * i) * 13) % 256) AS y0,
       |  ((7 * doc_id + (1 + 2 * i) * 13) % 256) AS y1
       |  FROM m)
       |SELECT doc_id, stem, n_members, cls, txt_hash,
       |  128::BIGINT AS pixels_decoded,
       |  ((y0 + y1) * 64)::DOUBLE / 128 AS mean_gray
       |FROM s ORDER BY doc_id, stem""".stripMargin

  /** HTTP-over-WARC parse (mirror of Warc.parseHttp ∘ parseRecords ∘
    * splitRecords over the status/content-type synth): every field is
    * re-derived from doc_id arithmetic and the text prefix, so a hash
    * match proves the record walk AND the header parse (incl. the
    * case-insensitive Content-Type match and the parameter strip).
    */
  lazy val warcHttpMeta: String =
    s"""WITH u AS ($UrlSynth),
       |b AS (SELECT doc_id, substring(text, 1, 100) AS payload,
       |  doc_id % 10 = 0 AS invalid FROM u)
       |SELECT doc_id,
       |  NOT invalid AS http_valid,
       |  (CASE WHEN invalid THEN NULL ELSE
       |    CASE doc_id % 4 WHEN 0 THEN 200 WHEN 1 THEN 404
       |      WHEN 2 THEN 301 ELSE 503 END END)::BIGINT AS http_status,
       |  CASE WHEN invalid THEN NULL ELSE
       |    CASE doc_id % 4 WHEN 0 THEN 'OK' WHEN 1 THEN 'Not Found'
       |      WHEN 2 THEN 'Moved Permanently'
       |      ELSE 'Service Unavailable' END END AS http_reason,
       |  CASE WHEN invalid THEN NULL ELSE
       |    CASE doc_id % 3 WHEN 0 THEN 'text/html' WHEN 1 THEN 'text/plain'
       |      ELSE 'application/json' END END AS content_type,
       |  CASE WHEN invalid THEN NULL ELSE
       |    CASE doc_id % 3 WHEN 0 THEN 'utf-8' WHEN 1 THEN NULL
       |      ELSE 'iso-8859-1' END END AS charset,
       |  CASE WHEN invalid THEN NULL ELSE payload END AS http_body
       |FROM b ORDER BY doc_id""".stripMargin

  /** Corpus language/script mix (mirror of
    * TextAnalysis.languageMixPlanted): the script and langid chains
    * joined per doc, grouped to (dominant_script, pred_lang), share
    * over the tiny aggregate. Same tails, markers, and argmax chains
    * as the per-doc rows.
    */
  lazy val corpusLanguageMix: String = {
    val tails = graft.text.TextAnalysis.ScriptTails
    val cases = tails.zipWithIndex
      .map { case (tl, i) => s"WHEN ${i.toLong} THEN '${tl.replace("'", "''")}'" }
      .mkString(" ")
    val scoreCols = TextAnalysis.langMarkers
      .map { case (l, ws) => s"  ${hits(ws)} AS s_$l" }.mkString(",\n")
    val names = TextAnalysis.langMarkers.map(_._1)
    val caseChain = names.init.zipWithIndex.map { case (l, i) =>
      val rest = names.drop(i + 1).map(l2 => s"s_$l >= s_$l2").mkString(" AND ")
      s"WHEN $rest THEN '$l'"
    }.mkString(" ")
    val scripts = scriptProfileOver("(SELECT doc_id, mtext AS s FROM m) z")
    s"""WITH m AS (SELECT doc_id,
       |  CASE doc_id % 3
       |    WHEN 1 THEN CASE doc_id % ${tails.size} $cases END
       |    WHEN 2 THEN text || CASE doc_id % ${tails.size} $cases END
       |    ELSE text END AS mtext FROM documents),
       |t AS (SELECT doc_id, ${toksOf("mtext")} AS toks FROM m),
       |p AS (SELECT doc_id, n_toks,
       |  CASE WHEN ${names.map(l => s"s_$l").mkString(" + ")} = 0 THEN 'und'
       |  $caseChain ELSE '${names.last}' END AS pred_lang
       |FROM (SELECT doc_id, len(toks)::BIGINT AS n_toks,
       |$scoreCols
       |  FROM t) s0),
       |g AS (SELECT sc.dominant_script, p.pred_lang,
       |  count(*)::BIGINT AS n_docs, sum(p.n_toks)::BIGINT AS n_tokens
       |  FROM p JOIN ($scripts) sc ON p.doc_id = sc.doc_id
       |  GROUP BY 1, 2)
       |SELECT dominant_script, pred_lang, n_docs, n_tokens,
       |  n_docs / (sum(n_docs) OVER ())::BIGINT AS doc_share
       |FROM g ORDER BY dominant_script, pred_lang""".stripMargin
  }

  val textFingerprint: String =
    s"""WITH t AS (SELECT doc_id, $Toks AS toks FROM documents)
       |SELECT doc_id, ${hex64("array_to_string(toks,' ')")} AS fingerprint,
       |  (len(toks) // 10)::BIGINT AS len_band
       |FROM t ORDER BY doc_id""".stripMargin

  /** [[dedupExact]] with a pluggable source relation (a composed
    * pipeline runs the same chain over derived text, e.g. the
    * HTML-extracted corpus).
    */
  def dedupExactFrom(src: String): String =
    s"""WITH t AS (SELECT doc_id,
       |  ${hex64("array_to_string(" + Toks + ",' ')")} AS fingerprint FROM $src)
       |SELECT doc_id, fingerprint,
       |  count(*) OVER (PARTITION BY fingerprint) AS group_size,
       |  doc_id = min(doc_id) OVER (PARTITION BY fingerprint) AS keep
       |FROM t ORDER BY doc_id""".stripMargin

  val dedupExact: String = dedupExactFrom("documents")

  private val minhashCols: String = {
    val cs = graft.dedup.MinhashFamily.coefs(Dedup.MinhashK)
    (0 until Dedup.MinhashK).map { i =>
      val c = cs(i)
      s"  min(((h >> 30) * ${c.a} + (h & ${graft.dedup.MinhashFamily.LoMask}) * ${c.b} + ${c.c}) " +
        s"% ${graft.dedup.MinhashFamily.Prime}) AS mh_${"%02d".format(i)}"
    }.mkString(",\n")
  }

  /** sh rows extended with the one-md5-per-shingle base hash. */
  private val ShHashCte =
    s"""$ShCte,
       |shh AS (SELECT doc_id, s, ${hex64("'mh|'||s")} AS h FROM sh)""".stripMargin

  val dedupMinhash: String =
    s"""$ShHashCte
       |SELECT doc_id,
       |$minhashCols
       |FROM shh GROUP BY doc_id ORDER BY doc_id""".stripMargin

  private val bandSelects: String = (0 until Dedup.Bands).map { j =>
    val cols = (0 until Dedup.RowsPerBand)
      .map(i => s"mh_${"%02d".format(j * Dedup.RowsPerBand + i)}").mkString("||','||")
    s"  SELECT doc_id, $j AS band, ${hex64(cols)} AS bh FROM mh"
  }.mkString("\n  UNION ALL\n")

  private def jaccardTail(candCte: String): String =
    s"""$candCte,
       |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
       |inter AS (SELECT c.a, c.b, count(*) AS n_int FROM cand c
       |  JOIN sh sa ON sa.doc_id = c.a
       |  JOIN sh sb ON sb.doc_id = c.b AND sb.s = sa.s
       |  GROUP BY c.a, c.b)
       |SELECT i.a, i.b, i.n_int, za.n AS n_a, zb.n AS n_b,
       |  i.n_int / (za.n + zb.n - i.n_int) AS jaccard
       |FROM inter i
       |JOIN sizes za ON za.doc_id = i.a
       |JOIN sizes zb ON zb.doc_id = i.b""".stripMargin

  val dedupMinhashLsh: String =
    s"""$ShHashCte,
       |mh AS (SELECT doc_id,
       |$minhashCols
       |FROM shh GROUP BY doc_id),
       |bands AS (
       |$bandSelects),
       |${jaccardTail(
        """cand AS (SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
          |  FROM bands x JOIN bands y
          |  ON x.band = y.band AND x.bh = y.bh AND x.doc_id < y.doc_id)""".stripMargin)}
       |ORDER BY a, b""".stripMargin

  /** Incremental dedup (mirror of Dedup.incrementalDedup with corpus =
    * even doc_ids, batch = odd, minJaccard = 0.7 — the SparkEntry
    * wiring). Near-dup best match = highest jaccard, then smallest
    * corpus doc_id.
    */
  /** Bloom-gated incremental exact dedup (mirror of Dedup.bloomDedup's
    * driver query). The bloom gate itself is not SQL-expressible, but
    * it is a pure PREFILTER with no false negatives — the flagged set
    * must equal the plain exact semi-join, which is what this oracle
    * states. A bloom false negative would surface here as a hash
    * mismatch.
    */
  val dedupBloom: String =
    s"""WITH t AS (SELECT doc_id, $Toks AS toks FROM documents),
       |fp AS (SELECT doc_id, ${hex64("array_to_string(toks,' ')")} AS fingerprint FROM t),
       |ex AS (SELECT DISTINCT bf.doc_id FROM fp bf
       |  JOIN fp cf ON bf.fingerprint = cf.fingerprint
       |  WHERE bf.doc_id % 2 = 1 AND cf.doc_id % 2 = 0)
       |SELECT f.doc_id,
       |  ex.doc_id IS NOT NULL AS exact_dup,
       |  ex.doc_id IS NULL AS keep
       |FROM fp f LEFT JOIN ex ON ex.doc_id = f.doc_id
       |WHERE f.doc_id % 2 = 1 ORDER BY f.doc_id""".stripMargin

  val dedupIncremental: String =
    s"""$ShHashCte,
       |mh AS (SELECT doc_id,
       |$minhashCols
       |FROM shh GROUP BY doc_id),
       |bands AS (
       |$bandSelects),
       |cand AS (SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
       |  FROM bands x JOIN bands y ON x.band = y.band AND x.bh = y.bh
       |  WHERE x.doc_id % 2 = 1 AND y.doc_id % 2 = 0),
       |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
       |inter AS (SELECT c.a, c.b, count(*) AS n_int FROM cand c
       |  JOIN sh sa ON sa.doc_id = c.a
       |  JOIN sh sb ON sb.doc_id = c.b AND sb.s = sa.s
       |  GROUP BY c.a, c.b),
       |ver AS (SELECT i.a, i.b,
       |  i.n_int / (za.n + zb.n - i.n_int) AS jaccard
       |  FROM inter i
       |  JOIN sizes za ON za.doc_id = i.a
       |  JOIN sizes zb ON zb.doc_id = i.b
       |  WHERE i.n_int / (za.n + zb.n - i.n_int) >= 0.7),
       |near AS (SELECT a AS doc_id, b AS best_match, jaccard AS best_jaccard
       |  FROM (SELECT a, b, jaccard,
       |    row_number() OVER (PARTITION BY a ORDER BY jaccard DESC, b) AS rn FROM ver)
       |  WHERE rn = 1),
       |fp AS (SELECT doc_id, ${hex64("array_to_string(toks,' ')")} AS fingerprint FROM t),
       |ex AS (SELECT DISTINCT bf.doc_id FROM fp bf
       |  JOIN fp cf ON bf.fingerprint = cf.fingerprint
       |  WHERE bf.doc_id % 2 = 1 AND cf.doc_id % 2 = 0)
       |SELECT d.doc_id,
       |  ex.doc_id IS NOT NULL AS exact_dup,
       |  near.best_match IS NOT NULL AS near_dup,
       |  near.best_match, near.best_jaccard,
       |  NOT (ex.doc_id IS NOT NULL OR near.best_match IS NOT NULL) AS keep
       |FROM (SELECT doc_id FROM documents WHERE doc_id % 2 = 1) d
       |LEFT JOIN ex ON ex.doc_id = d.doc_id
       |LEFT JOIN near ON near.doc_id = d.doc_id
       |ORDER BY d.doc_id""".stripMargin

  /** Mirrors the DEFAULT capped path (Caching.capByFrequency at
    * Dedup.DefaultMaxShingleDf): shingles above the df cap are dropped
    * before sizes/intersections on BOTH sides.
    */
  val dedupNgramJaccard: String =
    s"""$ShCte,
       |shc AS (SELECT doc_id, s FROM (
       |  SELECT doc_id, s, count(*) OVER (PARTITION BY s) AS df FROM sh)
       |  WHERE df <= ${Dedup.DefaultMaxShingleDf}),
       |sizes AS (SELECT doc_id, count(*) AS n FROM shc GROUP BY doc_id),
       |inter AS (SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS n_int
       |  FROM shc x JOIN shc y ON x.s = y.s AND x.doc_id < y.doc_id
       |  GROUP BY x.doc_id, y.doc_id)
       |SELECT i.a, i.b, i.n_int, za.n AS n_a, zb.n AS n_b,
       |  i.n_int / (za.n + zb.n - i.n_int) AS jaccard
       |FROM inter i
       |JOIN sizes za ON za.doc_id = i.a
       |JOIN sizes zb ON zb.doc_id = i.b
       |WHERE i.n_int / (za.n + zb.n - i.n_int) >= 0.5
       |ORDER BY a, b""".stripMargin

  /** Connected components over the LSH pair graph at jaccard ≥ 0.7 —
    * recursive reachability, min label per component (mirror of
    * Dedup.nearDupClusters' min-propagation fixpoint).
    */
  val dedupClusters: String = {
    val body = dedupMinhashLsh.stripPrefix("WITH ")
      .replaceAll("(?s)\\nSELECT i\\.a.*$", "") // drop the final SELECT, keep CTEs
    s"""WITH RECURSIVE $body,
       |pairs AS (SELECT i.a, i.b FROM inter i
       |  JOIN sizes za ON za.doc_id = i.a
       |  JOIN sizes zb ON zb.doc_id = i.b
       |  WHERE i.n_int / (za.n + zb.n - i.n_int) >= 0.7),
       |sym AS (SELECT a, b FROM pairs UNION ALL SELECT b AS a, a AS b FROM pairs),
       |reach(doc_id, label) AS (
       |  SELECT doc_id, doc_id FROM documents
       |  UNION
       |  SELECT s.a, r.label FROM sym s JOIN reach r ON r.doc_id = s.b)
       |SELECT doc_id, min(label) AS cluster_id,
       |  doc_id = min(label) AS keep
       |FROM reach GROUP BY doc_id ORDER BY doc_id""".stripMargin
  }

  /** Composite cleaning pipeline (mirror of Pipeline.cleanCorpus,
    * minQuality = 0.3): the three already-oracle-exact stage queries
    * joined as subqueries — the composition cannot drift from the
    * stages.
    */
  val pipelineClean: String =
    s"""SELECT q.doc_id, q.quality_score, e.keep AS exact_keep,
       |  c.cluster_id, c.keep AS cluster_keep,
       |  (q.quality_score >= 0.3 AND e.keep AND c.keep) AS keep
       |FROM ($textQuality) q
       |JOIN ($dedupExact) e ON q.doc_id = e.doc_id
       |JOIN ($dedupClusters) c ON q.doc_id = c.doc_id
       |ORDER BY q.doc_id""".stripMargin

  /** FineWeb-style filter stack (mirror of Pipeline.qualityEnsemble,
    * thresholds 0.3 / 2.0 / 0.5): the four already-exact signal chains
    * composed as subqueries — the composition cannot drift from the
    * individually-gated rows. Signals a doc is too short to produce
    * (entropy on empty text, bigrams on <2 tokens) are passes via the
    * LEFT joins, mirroring the Spark coalesce.
    */
  // lazy: textEntropy/textRepetition initialize further down the
  // object — an eager val here would interpolate their nulls
  lazy val pipelineQualityEnsemble: String =
    s"""SELECT q.doc_id, q.quality_score, g.gopher_pass,
       |  e.entropy_bits, r.dup_bigram_frac,
       |  q.quality_score < 0.3 AS fail_quality,
       |  NOT g.gopher_pass AS fail_gopher,
       |  coalesce(e.entropy_bits < 2.0, false) AS fail_entropy,
       |  coalesce(r.dup_bigram_frac > 0.5, false) AS fail_repetition,
       |  (g.gopher_pass AND NOT q.quality_score < 0.3
       |    AND NOT coalesce(e.entropy_bits < 2.0, false)
       |    AND NOT coalesce(r.dup_bigram_frac > 0.5, false)) AS keep
       |FROM ($textQuality) q
       |JOIN ($textGopher) g ON q.doc_id = g.doc_id
       |LEFT JOIN ($textEntropy) e ON q.doc_id = e.doc_id
       |LEFT JOIN ($textRepetition) r ON q.doc_id = r.doc_id
       |ORDER BY q.doc_id""".stripMargin

  /** Near-dup best-copy (mirror of Dedup.nearDupKeepBest): cluster
    * labels and quality scores from the two already-exact chains,
    * keeper = (quality DESC, doc_id) head per cluster.
    */
  val dedupClustersKeepBest: String =
    s"""SELECT doc_id, cluster_id, quality_score, cluster_size, keeper_id,
       |  doc_id = keeper_id AS keep
       |FROM (SELECT c.doc_id, c.cluster_id, q.quality_score,
       |  count(*) OVER (PARTITION BY c.cluster_id) AS cluster_size,
       |  first_value(c.doc_id) OVER (PARTITION BY c.cluster_id
       |    ORDER BY q.quality_score DESC, c.doc_id
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS keeper_id
       |FROM ($dedupClusters) c
       |JOIN ($textQuality) q ON q.doc_id = c.doc_id) w
       |ORDER BY doc_id""".stripMargin

  private val simhashBitSums: String = (0 until Dedup.SimhashBits)
    .map(b => s"  sum(CASE WHEN ((h >> $b) & 1) = 1 THEN 1 ELSE -1 END) AS s$b").mkString(",\n")

  private val simhashCombine: String = (0 until Dedup.SimhashBits)
    .map(b => s"CASE WHEN s$b > 0 THEN (1::BIGINT << $b) ELSE 0 END")
    .mkString(" + ")

  private val SimhashCte =
    s"""WITH t AS (SELECT doc_id, $Toks AS toks FROM documents),
       |tok AS (SELECT doc_id, unnest(toks) AS tk FROM t),
       |h AS (SELECT doc_id, ${hex64("'t|'||tk")} AS h FROM tok),
       |bits AS (SELECT doc_id,
       |$simhashBitSums
       |FROM h GROUP BY doc_id),
       |sim AS (SELECT doc_id, ($simhashCombine)::BIGINT AS simhash FROM bits)""".stripMargin

  val dedupSimhash: String =
    s"""$SimhashCte
       |SELECT doc_id, simhash FROM sim ORDER BY doc_id""".stripMargin

  val dedupSimhashPairs: String = {
    val bandSel = (0 until 4)
      .map(j => s"  SELECT doc_id, simhash, $j AS band, (simhash >> ${8 * j}) & 255 AS bv FROM sim")
      .mkString("\n  UNION ALL\n")
    s"""$SimhashCte,
       |bands AS (
       |$bandSel)
       |SELECT DISTINCT x.doc_id AS a, y.doc_id AS b,
       |  bit_count(xor(x.simhash, y.simhash))::BIGINT AS hamming
       |FROM bands x JOIN bands y
       |ON x.band = y.band AND x.bv = y.bv AND x.doc_id < y.doc_id
       |WHERE bit_count(xor(x.simhash, y.simhash)) <= 6
       |ORDER BY a, b""".stripMargin
  }

  /** Exact cosine top-k CTE; queryFilter narrows the query side. */
  private def knnSql(queryFilter: String, k: Int): String =
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |q AS (SELECT vec_id, v FROM e $queryFilter),
       |s AS (SELECT q.vec_id AS q_id, c.vec_id AS cand_id,
       |  list_cosine_similarity(q.v, c.v) AS sim
       |  FROM q JOIN e c ON c.vec_id <> q.vec_id),
       |r AS (SELECT q_id, cand_id, sim,
       |  CAST(row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, cand_id) AS BIGINT) AS rn
       |  FROM s)""".stripMargin + "\n" +
      s"SELECT q_id, rn, cand_id, sim FROM r WHERE rn <= $k ORDER BY q_id, rn"

  val cosineTopkExact: String = knnSql("WHERE vec_id < 10", 5)
  val knnBrute: String = knnSql("", 3)

  /** k-NN majority vote (mirror of Knn.knnClassify wiring: queries =
    * vec_id<100, k=5; tie-break votes desc, best rank, label asc).
    */
  val knnClassify: String =
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |q AS (SELECT vec_id, v FROM e WHERE vec_id < 100),
       |s AS (SELECT q.vec_id AS q_id, c.vec_id AS cand_id,
       |  list_cosine_similarity(q.v, c.v) AS sim
       |  FROM q JOIN e c ON c.vec_id <> q.vec_id),
       |r AS (SELECT q_id, cand_id,
       |  row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, cand_id) AS rn
       |  FROM s),
       |v AS (SELECT r.q_id, emb.label::BIGINT AS label,
       |  count(*) AS votes, min(rn) AS best_rn
       |  FROM r JOIN embeddings emb ON emb.vec_id = r.cand_id
       |  WHERE rn <= 5 GROUP BY 1, 2),
       |p AS (SELECT q_id, label, votes,
       |  row_number() OVER (PARTITION BY q_id
       |    ORDER BY votes DESC, best_rn, label) AS pr FROM v)
       |SELECT q_id, label AS pred_label, votes FROM p WHERE pr = 1
       |ORDER BY q_id""".stripMargin

  /** Fixed-point per-label centroids (mirror of Centroids.labelCentroids:
    * int64 sums of floor(x·10⁶) — order-independent, engine-exact).
    */
  val embLabelCentroids: String =
    s"""WITH x AS (SELECT label::BIGINT AS label,
       |  unnest(generate_series(1, len(embedding))) - 1 AS i,
       |  CAST(unnest(embedding) AS DOUBLE) AS x FROM embeddings),
       |g AS (SELECT label, CAST(i AS BIGINT) AS i,
       |  CAST(sum(CAST(floor(x * 1000000) AS BIGINT)) AS BIGINT) AS sum_fx,
       |  count(*) AS n
       |  FROM x GROUP BY 1, 2)
       |SELECT label, i, sum_fx, n,
       |  CAST(sum_fx AS DOUBLE) / CAST(n * 1000000 AS DOUBLE) AS centroid
       |FROM g ORDER BY label, i""".stripMargin

  /** Per-label embedding outliers (mirror of Centroids.labelOutliers,
    * k=5): centroid from the fixed-point sums, distance as the SAME
    * in-index-order left fold of squared diffs (list_reduce's
    * first-element init ≡ Spark's 0.0 init bitwise — terms are
    * non-negative), ranking (dist desc, vec_id asc).
    */
  val embLabelOutliers: String =
    s"""WITH x AS (SELECT label::BIGINT AS label,
       |  unnest(generate_series(1, len(embedding))) - 1 AS i,
       |  CAST(unnest(embedding) AS DOUBLE) AS x FROM embeddings),
       |g AS (SELECT label, CAST(i AS BIGINT) AS i,
       |  CAST(sum(CAST(floor(x * 1000000) AS BIGINT)) AS BIGINT) AS sum_fx,
       |  count(*) AS n FROM x GROUP BY 1, 2),
       |c AS (SELECT label,
       |  list(CAST(sum_fx AS DOUBLE) / CAST(n * 1000000 AS DOUBLE)
       |    ORDER BY i) AS cent FROM g GROUP BY 1),
       |e AS (SELECT emb.label::BIGINT AS label, emb.vec_id,
       |  emb.embedding::DOUBLE[] AS v, c.cent
       |  FROM embeddings emb JOIN c ON c.label = emb.label::BIGINT),
       |d AS (SELECT label, vec_id,
       |  sqrt(list_reduce(
       |    [(v[i] - cent[i]) * (v[i] - cent[i]) for i in range(1, len(v) + 1)],
       |    (a, b) -> a + b)) AS dist FROM e),
       |r AS (SELECT label, vec_id, dist,
       |  row_number() OVER (PARTITION BY label
       |    ORDER BY dist DESC, vec_id) AS rn FROM d)
       |SELECT label, rn::BIGINT AS rn, vec_id, dist
       |FROM r WHERE rn <= 5 ORDER BY label, rn""".stripMargin

  // ---- LSH oracles: the seeded Gaussian planes are embedded as SQL
  // literals; each plane dot product is written as an explicit
  // left-associative sum so accumulation order (and therefore every
  // sign bit) matches the Spark expression exactly. list_dot_product
  // is NOT used — it accumulates in a different order (ulp drift). ----

  private def dotSql(plane: Array[Double], dim: Int, off: Int): String =
    (0 until dim).map(j => s"v[${j + 1}] * ${dlit(plane(off + j))}").mkString(" + ")

  private def bandSigSql(seed: Long, band: Int, r: Int, dim: Int): String = {
    val plane = graft.lsh.RandomProjection.bandPlanes(seed, band, r, dim)
    (0 until r).map { rr =>
      s"(CASE WHEN ${dotSql(plane, dim, rr * dim)} > 0 THEN ${1L << rr} ELSE 0 END)"
    }.mkString(" + ")
  }

  /** CTE computing (vec_id, band, sig) exactly as LshIndex.build. */
  private def sigCte(p: graft.lsh.LshParams): String = {
    val b = p.b
    val sigCols = (0 until b)
      .map(i => s"  (${bandSigSql(p.seed, i, p.r, p.dim)})::BIGINT AS sig$i")
      .mkString(",\n")
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |sigs AS (SELECT vec_id,
       |$sigCols
       |FROM e),
       |idx AS (SELECT vec_id,
       |  unnest([${(0 until b).mkString(",")}]) AS band,
       |  unnest([${(0 until b).map(i => s"sig$i").mkString(",")}]) AS sig FROM sigs)""".stripMargin
  }

  private lazy val SigCteDefault: String = sigCte(SparkEntry.lshP)

  /** JL Gaussian projection (mirror of Project.projectQuery): one
    * UNION ALL branch per output dimension, each an explicit in-order
    * dot over the SAME seeded plane literals the expression
    * materializes, scaled by 1/√16 = 0.25 (exact in binary) — the
    * doubles hash-match bit-for-bit.
    */
  val vecProject: String = {
    import graft.ann.Project
    val plane = graft.lsh.RandomProjection.bandPlanes(
      Project.Seed, 0, Project.OutDim, Project.Dim)
    val branches = (0 until Project.OutDim).map { r =>
      s"""  SELECT vec_id, CAST($r AS BIGINT) AS dim_idx,
         |    (${dotSql(plane, Project.Dim, r * Project.Dim)}) * 2.5e-1 AS value
         |  FROM e""".stripMargin
    }.mkString("\n  UNION ALL\n")
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
       |SELECT vec_id, dim_idx, value FROM (
       |$branches
       |) p ORDER BY vec_id, dim_idx""".stripMargin
  }

  /** IVF with projected candidate generation + original-space rerank
    * (mirror of Project.probeTopKProjected, centroids vec_id < 8,
    * queries vec_id < 10, nProbe 2, k 5): projected vectors are the
    * [[vecProject]] branches reassembled with `list(... ORDER BY
    * dim_idx)`; every cosine is the explicit `dot/(√na·√nb)`
    * association (self-similarity appears in the assignment/probe
    * ranks here, where DuckDB's fused normalization is 1 ulp off).
    */
  val annIvfProjected: String = {
    import graft.ann.Project
    val plane = graft.lsh.RandomProjection.bandPlanes(
      Project.Seed, 0, Project.OutDim, Project.Dim)
    val branches = (0 until Project.OutDim).map { r =>
      s"""  SELECT vec_id, $r AS dim_idx,
         |    (${dotSql(plane, Project.Dim, r * Project.Dim)}) * 2.5e-1 AS value
         |  FROM e""".stripMargin
    }.mkString("\n  UNION ALL\n")
    val cos = (a: String, b: String) =>
      s"list_dot_product($a, $b) / (sqrt(list_dot_product($a, $a)) * sqrt(list_dot_product($b, $b)))"
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |pv AS (SELECT vec_id, list(value ORDER BY dim_idx) AS p FROM (
       |$branches
       |) px GROUP BY vec_id),
       |cent AS (SELECT vec_id AS c_id, p AS cp FROM pv WHERE vec_id < 8),
       |sc AS (SELECT pv.vec_id, c.c_id, ${cos("pv.p", "c.cp")} AS c_sim
       |  FROM pv, cent c),
       |asg AS (SELECT vec_id, c_id AS cell FROM (
       |  SELECT vec_id, c_id, row_number() OVER (PARTITION BY vec_id
       |    ORDER BY c_sim DESC, c_id) AS rn FROM sc) aq WHERE rn = 1),
       |probe AS (SELECT vec_id AS q_id, c_id AS cell FROM (
       |  SELECT vec_id, c_id, row_number() OVER (PARTITION BY vec_id
       |    ORDER BY c_sim DESC, c_id) AS rn FROM sc WHERE vec_id < 10) pq
       |  WHERE rn <= 2),
       |cand AS (SELECT DISTINCT p.q_id, a.vec_id AS cand_id
       |  FROM probe p JOIN asg a ON a.cell = p.cell WHERE a.vec_id <> p.q_id),
       |s AS (SELECT cand.q_id, cand.cand_id, ${cos("qe.v", "ce.v")} AS sim
       |  FROM cand JOIN e qe ON qe.vec_id = cand.q_id
       |  JOIN e ce ON ce.vec_id = cand.cand_id),
       |r AS (SELECT q_id, cand_id, sim,
       |  CAST(row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, cand_id) AS BIGINT) AS rn
       |  FROM s)
       |SELECT q_id, rn, cand_id, sim FROM r WHERE rn <= 5 ORDER BY q_id, rn""".stripMargin
  }

  val lshSignatures: String =
    s"""$SigCteDefault
       |SELECT vec_id, band, sig FROM idx ORDER BY vec_id, band""".stripMargin

  /** Wide (r > 64) byte-packed signatures — mirror of
    * [[graft.lsh.LshIndex.build]] on a wide config: per band, each of
    * the ceil(r/8) little-endian bytes is a CASE bit sum over the SAME
    * plane-literal in-order dot products as the narrow oracle, and the
    * hex pairs concatenate exactly as Spark's `hex(binary)` (uppercase,
    * two chars per byte).
    */
  def lshWideSignatures(p: graft.lsh.LshParams): String = {
    val nBytes = (p.r + 7) / 8
    val bandExprs = (0 until p.b).map { band =>
      val plane = graft.lsh.RandomProjection.bandPlanes(p.seed, band, p.r, p.dim)
      val bytes = (0 until nBytes).map { bi =>
        val bits = (0 until 8).filter(bb => bi * 8 + bb < p.r).map { bb =>
          val rr = bi * 8 + bb
          s"(CASE WHEN ${dotSql(plane, p.dim, rr * p.dim)} > 0 THEN ${1 << bb} ELSE 0 END)"
        }.mkString(" + ")
        s"upper(lpad(to_hex($bits), 2, '0'))"
      }.mkString(" || ")
      s"  ($bytes) AS sig$band"
    }.mkString(",\n")
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |sigs AS (SELECT vec_id,
       |$bandExprs
       |FROM e),
       |idx AS (SELECT vec_id,
       |  unnest([${(0 until p.b).mkString(",")}]) AS band,
       |  unnest([${(0 until p.b).map(i => s"sig$i").mkString(",")}]) AS sig FROM sigs)
       |SELECT vec_id, band, sig FROM idx ORDER BY vec_id, band""".stripMargin
  }

  val lshBucketStats: String =
    s"""$SigCteDefault,
       |buckets AS (SELECT band, sig, count(*) AS bucket_size FROM idx GROUP BY 1, 2)
       |SELECT bucket_size, count(*) AS n_buckets FROM buckets
       |GROUP BY bucket_size ORDER BY bucket_size""".stripMargin

  val lshCandidatePairs: String =
    s"""$SigCteDefault,
       |sized AS (SELECT vec_id, band, sig,
       |  count(*) OVER (PARTITION BY band, sig) AS bn FROM idx),
       |f AS (SELECT vec_id, band, sig FROM sized WHERE bn <= 10000)
       |SELECT x.vec_id AS a, y.vec_id AS b, count(*) AS n_shared_bands
       |FROM f x JOIN f y ON x.band = y.band AND x.sig = y.sig AND x.vec_id < y.vec_id
       |GROUP BY 1, 2 ORDER BY a, b""".stripMargin

  private def lshCollisionCte(p: graft.lsh.LshParams, queryFilter: String): String =
    s"""${sigCte(p)},
       |q AS (SELECT vec_id AS q_id, band, sig FROM idx $queryFilter),
       |coll AS (SELECT q.q_id, i.vec_id, count(*) AS n_collisions
       |  FROM idx i JOIN q ON i.band = q.band AND i.sig = q.sig
       |  WHERE i.vec_id <> q.q_id GROUP BY 1, 2)""".stripMargin

  val lshTopk: String =
    s"""${lshCollisionCte(SparkEntry.lshP, "WHERE vec_id < 10")},
       |r AS (SELECT q_id, vec_id, n_collisions,
       |  CAST(row_number() OVER (PARTITION BY q_id
       |    ORDER BY n_collisions DESC, vec_id) AS BIGINT) AS rn FROM coll)
       |SELECT q_id, rn, vec_id AS cand_id, n_collisions FROM r
       |WHERE rn <= 10 ORDER BY q_id, rn""".stripMargin

  private def lshRerankSql(p: graft.lsh.LshParams, topP: Double, topK: Int): String =
    s"""${lshCollisionCte(p, "WHERE vec_id < 10")},
       |s AS (SELECT c.q_id, c.vec_id AS cand_id,
       |  list_cosine_similarity(qe.v, ce.v) AS sim
       |  FROM coll c JOIN e qe ON qe.vec_id = c.q_id JOIN e ce ON ce.vec_id = c.vec_id),
       |w AS (SELECT q_id, cand_id, sim,
       |  count(*) OVER (PARTITION BY q_id) AS n_cand,
       |  CAST(row_number() OVER (PARTITION BY q_id
       |    ORDER BY sim DESC, cand_id) AS BIGINT) AS rn FROM s)
       |SELECT q_id, rn, cand_id, sim FROM w
       |WHERE rn <= least(greatest(CAST(ceil(n_cand * $topP) AS BIGINT), 1), $topK)
       |ORDER BY q_id, rn""".stripMargin

  val lshToppRerank: String = lshRerankSql(SparkEntry.lshP, 0.2, 50)
  val annLsh: String = lshRerankSql(SparkEntry.lshRecallP, 1.0, 5)

  /** LSH-blocked embedding near-dup: candidate pairs (bucket-capped)
    * verified by exact cosine ≥ 0.3 (this corpus tops out near 0.4).
    */
  val dedupEmbeddingLsh: String =
    s"""$SigCteDefault,
       |sized AS (SELECT vec_id, band, sig,
       |  count(*) OVER (PARTITION BY band, sig) AS bn FROM idx),
       |f AS (SELECT vec_id, band, sig FROM sized WHERE bn <= 10000),
       |cand AS (SELECT x.vec_id AS a, y.vec_id AS b, count(*) AS n_shared_bands
       |  FROM f x JOIN f y ON x.band = y.band AND x.sig = y.sig AND x.vec_id < y.vec_id
       |  GROUP BY 1, 2)
       |SELECT c.a, c.b, c.n_shared_bands,
       |  list_cosine_similarity(ea.v, eb.v) AS sim
       |FROM cand c JOIN e ea ON ea.vec_id = c.a JOIN e eb ON eb.vec_id = c.b
       |WHERE list_cosine_similarity(ea.v, eb.v) >= 0.3
       |ORDER BY a, b""".stripMargin

  /** save→load round-trips the index, so its bucket stats equal the
    * freshly-built index's stats.
    */
  val lshSaveLoad: String = lshBucketStats

  /** After deleting vec_id < 10, each band holds one entry per
    * surviving vector.
    */
  val lshDeleteClear: String =
    s"""$SigCteDefault
       |SELECT band, count(*) AS n_entries FROM idx
       |WHERE vec_id >= 10 GROUP BY band ORDER BY band""".stripMargin

  /** IVF probe-and-rerank: centroids = vec_id<8, queries = vec_id<10,
    * nProbe=2, k=5 (mirror of Ivf.probeTopK wiring in SparkEntry).
    */
  /** Hard-negative mining (mirror of Ivf.hardNegatives: the annIvf
    * probed-candidate chain with the near-dup threshold applied
    * BEFORE the rank - the full filtered set ranks, not a truncated
    * top-k's survivors).
    */
  val embHardNegatives: String =
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |cent AS (SELECT vec_id AS c_id, v AS cv FROM e WHERE vec_id < 8),
       |asg AS (SELECT vec_id, c_id AS cell FROM (
       |  SELECT e.vec_id, c.c_id,
       |    row_number() OVER (PARTITION BY e.vec_id
       |      ORDER BY list_cosine_similarity(e.v, c.cv) DESC, c.c_id) AS rn
       |  FROM e, cent c) WHERE rn = 1),
       |q AS (SELECT vec_id AS q_id, v AS qv FROM e WHERE vec_id < 10),
       |probe AS (SELECT q_id, c_id AS cell FROM (
       |  SELECT q.q_id, c.c_id,
       |    row_number() OVER (PARTITION BY q.q_id
       |      ORDER BY list_cosine_similarity(q.qv, c.cv) DESC, c.c_id) AS rn
       |  FROM q, cent c) WHERE rn <= 2),
       |cand AS (SELECT DISTINCT p.q_id, a.vec_id AS cand_id
       |  FROM probe p JOIN asg a ON a.cell = p.cell WHERE a.vec_id <> p.q_id),
       |s AS (SELECT cand.q_id, cand.cand_id, list_cosine_similarity(q.qv, e.v) AS sim
       |  FROM cand JOIN q ON q.q_id = cand.q_id JOIN e ON e.vec_id = cand.cand_id),
       |f AS (SELECT * FROM s WHERE sim < 0.95),
       |r AS (SELECT q_id, cand_id, sim,
       |  CAST(row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, cand_id) AS BIGINT) AS rn
       |  FROM f)
       |SELECT q_id, rn, cand_id, sim FROM r WHERE rn <= 3 ORDER BY q_id, rn""".stripMargin

  /** Cell-pruned k-NN classification (mirror of Knn.knnClassifyIvf:
    * the annIvf probed-candidate chain feeding the knnClassify vote).
    */
  /** Positional phrase search (mirror of TextAnalysis.phraseSearch ∘
    * cannedPhrases): offset voting over positional postings — a start
    * whose matched-offset count equals the phrase length is one
    * occurrence.
    */
  val textPhraseSearch: String =
    s"""WITH t AS (SELECT doc_id, $Toks AS toks FROM documents),
       |post AS (SELECT doc_id, unnest(toks) AS token,
       |  generate_subscripts(toks, 1) - 1 AS pos FROM t),
       |ph AS (SELECT doc_id AS phrase_id, toks[3:5] AS terms FROM t
       |  WHERE doc_id < 5 AND len(toks) >= 5),
       |q AS (SELECT phrase_id, len(terms) AS plen, unnest(terms) AS token,
       |  generate_subscripts(terms, 1) - 1 AS off FROM ph),
       |j AS (SELECT q.phrase_id, q.plen, post.doc_id,
       |  post.pos - q.off AS start
       |  FROM post JOIN q ON q.token = post.token
       |  WHERE post.pos - q.off >= 0),
       |m AS (SELECT phrase_id, plen, doc_id, start, count(*) AS matched
       |  FROM j GROUP BY 1, 2, 3, 4)
       |SELECT phrase_id, doc_id, count(*) AS n_occurrences
       |FROM m WHERE matched = plen GROUP BY 1, 2
       |ORDER BY phrase_id, doc_id""".stripMargin

  /** Unicode NFC normalization (mirror of TextAnalysis.normalizeQuery:
    * the decomposed combo literals come from the SAME Scala constant,
    * the plane-literal convention) - nfc_normalize here is DuckDB's
    * utf8proc, on the Spark side the JDK Normalizer; both implement
    * UAX #15, which the hash match proves.
    */
  /** Association rules (mirror of Relational.associationRules:
    * directed pairs from the undirected counts, broadcast totals,
    * integer-product IEEE ratios).
    */
  val qAssociationRules: String =
    """WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
      |no AS (SELECT count(DISTINCT l_orderkey) AS n_orders FROM li),
      |np AS (SELECT l_partkey, count(*) AS n_part FROM li GROUP BY 1),
      |u AS (SELECT a.l_partkey AS x, b.l_partkey AS y, count(*) AS n_ab
      |  FROM li a JOIN li b
      |  ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      |  GROUP BY 1, 2),
      |d AS (SELECT x AS ante, y AS cons, n_ab FROM u
      |  UNION ALL SELECT y, x, n_ab FROM u),
      |j AS (SELECT d.ante, d.cons, d.n_ab,
      |  CAST(d.n_ab AS DOUBLE) / na.n_part AS confidence,
      |  CAST(d.n_ab * no.n_orders AS DOUBLE) /
      |    CAST(na.n_part * nb.n_part AS DOUBLE) AS lift
      |  FROM d
      |  JOIN np na ON na.l_partkey = d.ante
      |  JOIN np nb ON nb.l_partkey = d.cons
      |  CROSS JOIN no
      |  WHERE d.n_ab >= 3),
      |r AS (SELECT ante, cons, n_ab, confidence, lift,
      |  CAST(row_number() OVER (ORDER BY lift DESC, ante, cons) AS BIGINT) AS rank
      |  FROM j)
      |SELECT ante, cons, n_ab, confidence, lift, rank FROM r WHERE rank <= 20
      |ORDER BY rank""".stripMargin

  /** Fixed-point PageRank over the co-purchase graph (mirror of
    * Graph.pageRankQuery, 10 iterations, top 50): the iterations
    * unroll as generated CTEs; every operation is exact int64
    * arithmetic (Spark `div` ≡ DuckDB `//` on nonnegative values,
    * order-independent integer sums), and the surfaced double is one
    * correctly-rounded division by the scale — the whole iterative
    * graph computation is hash-exact.
    */
  val qPagerank: String = {
    val iters = 10
    val scale = graft.ops.Graph.Scale
    val base = 15L * scale / 100L
    val iterCtes = (1 to iters).map { i =>
      s"""r$i AS (SELECT d.node, d.outdeg,
         |  ($base + (85 * coalesce(s.s, 0)) // 100)::BIGINT AS rank_fp
         |  FROM degs d LEFT JOIN (
         |    SELECT e.dst AS node, sum(r.rank_fp // r.outdeg)::BIGINT AS s
         |    FROM edges e JOIN r${i - 1} r ON r.node = e.src GROUP BY 1) s
         |  ON s.node = d.node)""".stripMargin
    }.mkString(",\n")
    s"""WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
       |und AS (SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
       |  FROM li a JOIN li b
       |  ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
       |edges AS (SELECT src, dst FROM und UNION ALL SELECT dst, src FROM und),
       |degs AS (SELECT src AS node, count(*)::BIGINT AS outdeg FROM edges GROUP BY 1),
       |r0 AS (SELECT node, outdeg, $scale::BIGINT AS rank_fp FROM degs),
       |$iterCtes
       |SELECT node, outdeg, rank_fp, rank_fp::DOUBLE / ${dlit(scale.toDouble)} AS pagerank
       |FROM r$iters ORDER BY rank_fp DESC, node LIMIT 50""".stripMargin
  }

  /** Batch BM25 serving (mirror of SearchIndex.searchTopKBatch over
    * [[TextAnalysis.BatchQueries]]): the row-wise (no per-term pivot)
    * BM25 form — one detLn wrap over the TOKEN-level df table, term
    * scores folded per (query, doc) in token order (`list_reduce` over
    * `list(... ORDER BY token)` ≡ Spark's sorted-struct aggregate
    * fold; 0.0-init vs first-element-init agree bitwise because every
    * term score is positive).
    */
  val textSearchBatch: String = batchLexSql(10)

  private def batchLexSql(k: Int): String = {
    val maxDf = TextAnalysis.DefaultMaxTokenDf
    val qvals = TextAnalysis.BatchQueries
      .map { case (q, t) => s"($q, '$t')" }.mkString(", ")
    val common =
      s"""t AS (SELECT doc_id, $Toks AS toks FROM documents),
         |d AS (SELECT doc_id, toks, len(toks)::BIGINT AS dl FROM t),
         |s AS (SELECT count(*)::BIGINT AS n_docs, sum(dl)::BIGINT AS sum_dl FROM d),
         |q AS (SELECT * FROM (VALUES $qvals) AS __q(query_id, token)),
         |qt AS (SELECT DISTINCT token FROM q)""".stripMargin
    val idfBase =
      s"""WITH $common,
         |dfs AS (SELECT qt.token,
         |  sum(CASE WHEN list_contains(d.toks, qt.token) THEN 1 ELSE 0 END)::BIGINT AS df
         |  FROM qt CROSS JOIN d GROUP BY 1),
         |ib AS (SELECT token, df,
         |  1.0::DOUBLE + (s.n_docs - df + 0.5::DOUBLE) / (df + 0.5::DOUBLE) AS idfarg
         |  FROM dfs CROSS JOIN s WHERE df > 0 AND df <= $maxDf)
         |SELECT token, idfarg FROM ib""".stripMargin
    val idfs = detLn(idfBase, "token", "idfarg", "idf", "bq")
    val k1p1 = dlit(2.2)
    val k1 = dlit(1.2)
    val b = dlit(0.75)
    s"""WITH $common,
       |idfs AS ($idfs),
       |tf AS (SELECT d.doc_id, d.dl, qt.token,
       |  len(list_filter(d.toks, x -> x = qt.token))::BIGINT AS tf
       |  FROM d CROSS JOIN qt),
       |m AS (SELECT q.query_id, tf.doc_id, tf.dl, tf.token, tf.tf
       |  FROM tf JOIN q ON q.token = tf.token WHERE tf.tf > 0),
       |sc AS (SELECT m.query_id, m.doc_id, m.token,
       |  i.idf * (m.tf * $k1p1) / (m.tf + $k1 * (1.0::DOUBLE - $b +
       |    $b * (m.dl / (s.sum_dl / s.n_docs)))) AS sv
       |  FROM m JOIN idfs i ON i.token = m.token CROSS JOIN s),
       |f AS (SELECT query_id, doc_id,
       |  list_reduce(list(sv ORDER BY token), (a, v) -> a + v) AS score
       |  FROM sc GROUP BY 1, 2),
       |r AS (SELECT query_id, doc_id, score,
       |  CAST(row_number() OVER (PARTITION BY query_id
       |    ORDER BY score DESC, doc_id) AS BIGINT) AS rn FROM f)
       |SELECT query_id::BIGINT AS query_id, rn, doc_id, score FROM r
       |WHERE rn <= $k ORDER BY query_id, rn""".stripMargin
  }

  /** Batch hybrid serving (mirror of hybridSearchBatchOnIndexes with
    * probe-every-cell): the [[batchLexSql]] lexical ranks per query,
    * the dense float hash-embed cosine ranks per query (per-query
    * pseudo-doc vectors assembled exactly like the corpus side), and
    * the RRF fusion partitioned by query_id.
    */
  val textSearchHybridBatch: String = {
    val qvals = TextAnalysis.BatchQueries
      .map { case (q, t) => s"($q, '$t')" }.mkString(", ")
    val vecChain =
      s"""WITH t AS (SELECT doc_id, $Toks AS toks FROM documents),
         |tok AS (SELECT doc_id, unnest(toks) AS tk FROM t),
         |h AS (SELECT doc_id, ${hex64("'he|'||tk")} AS h FROM tok),
         |sg AS (SELECT doc_id, h % 64 AS dim,
         |  CASE WHEN (h >> 20) & 1 = 1 THEN 1 ELSE -1 END AS sgn FROM h),
         |w AS (SELECT doc_id, dim, sum(sgn)::BIGINT AS w FROM sg
         |  GROUP BY 1, 2 HAVING sum(sgn) <> 0),
         |n AS (SELECT doc_id, sum(w * w)::BIGINT AS s2 FROM w GROUP BY 1),
         |wt AS (SELECT w.doc_id, w.dim, (w.w / sqrt(n.s2)) AS wt
         |  FROM w JOIN n ON n.doc_id = w.doc_id),
         |dims AS (SELECT unnest(range(0, 64)) AS dim),
         |dense AS (SELECT d.doc_id,
         |  list(coalesce(wt.wt::FLOAT, 0.0::FLOAT)::DOUBLE ORDER BY dm.dim) AS v
         |  FROM (SELECT DISTINCT doc_id FROM w) d
         |  CROSS JOIN dims dm
         |  LEFT JOIN wt ON wt.doc_id = d.doc_id AND wt.dim = dm.dim
         |  GROUP BY d.doc_id),
         |q AS (SELECT * FROM (VALUES $qvals) AS __q(query_id, token)),
         |qh AS (SELECT query_id, ${hex64("'he|'||token")} AS h FROM q),
         |qsg AS (SELECT query_id, h % 64 AS dim,
         |  CASE WHEN (h >> 20) & 1 = 1 THEN 1 ELSE -1 END AS sgn FROM qh),
         |qw AS (SELECT query_id, dim, sum(sgn)::BIGINT AS w FROM qsg
         |  GROUP BY 1, 2 HAVING sum(sgn) <> 0),
         |qn AS (SELECT query_id, sum(w * w)::BIGINT AS s2 FROM qw GROUP BY 1),
         |qwt AS (SELECT qw.query_id, qw.dim, (qw.w / sqrt(qn.s2)) AS wt
         |  FROM qw JOIN qn ON qn.query_id = qw.query_id),
         |qdense AS (SELECT q0.query_id,
         |  list(coalesce(qwt.wt::FLOAT, 0.0::FLOAT)::DOUBLE ORDER BY dm.dim) AS qv
         |  FROM (SELECT DISTINCT query_id FROM qw) q0
         |  CROSS JOIN dims dm
         |  LEFT JOIN qwt ON qwt.query_id = q0.query_id AND qwt.dim = dm.dim
         |  GROUP BY q0.query_id),
         |vsim AS (SELECT qd.query_id, dv.doc_id,
         |  list_cosine_similarity(qd.qv, dv.v) AS sim
         |  FROM dense dv CROSS JOIN qdense qd),
         |vr AS (SELECT query_id, doc_id, sim, CAST(row_number() OVER (
         |  PARTITION BY query_id ORDER BY sim DESC, doc_id) AS BIGINT) AS rn
         |  FROM vsim)
         |SELECT query_id::BIGINT AS query_id, doc_id, rn AS vec_rank
         |FROM vr WHERE rn <= 20""".stripMargin
    s"""WITH lexr AS (
       |  SELECT query_id, doc_id, rn AS lex_rank FROM (${batchLexSql(20)}) __lex),
       |vecr AS (SELECT * FROM ($vecChain) __vec),
       |fused AS (SELECT coalesce(l.query_id, v.query_id) AS query_id,
       |  coalesce(l.doc_id, v.doc_id) AS doc_id,
       |  l.lex_rank, v.vec_rank,
       |  coalesce(1.0::DOUBLE / (60 + l.lex_rank), 0.0e0)
       |    + coalesce(1.0::DOUBLE / (60 + v.vec_rank), 0.0e0) AS rrf_score
       |  FROM lexr l FULL OUTER JOIN vecr v
       |  ON l.query_id = v.query_id AND l.doc_id = v.doc_id),
       |r AS (SELECT query_id, doc_id, lex_rank, vec_rank, rrf_score,
       |  CAST(row_number() OVER (PARTITION BY query_id
       |    ORDER BY rrf_score DESC, doc_id) AS BIGINT) AS rn
       |  FROM fused)
       |SELECT query_id, rn, doc_id, lex_rank, vec_rank, rrf_score FROM r
       |WHERE rn <= 10 ORDER BY query_id, rn""".stripMargin
  }

  /** Personalized PageRank (mirror of Graph.personalizedPageRankQuery):
    * the same unrolled-CTE fixed-point idiom as [[qPagerank]], with
    * r₀ and the teleport term gated on `is_seed` — seeds are the 20
    * smallest nodes present in the graph; zero-rank (unreached) nodes
    * excluded before the top-k.
    */
  val qPagerankPersonalized: String = {
    val iters = 10
    val scale = graft.ops.Graph.Scale
    val base = 15L * scale / 100L
    val iterCtes = (1 to iters).map { i =>
      s"""r$i AS (SELECT d.node, d.outdeg, d.is_seed,
         |  ($base * d.is_seed + (85 * coalesce(s.s, 0)) // 100)::BIGINT AS rank_fp
         |  FROM sdegs d LEFT JOIN (
         |    SELECT e.dst AS node, sum(r.rank_fp // r.outdeg)::BIGINT AS s
         |    FROM edges e JOIN r${i - 1} r ON r.node = e.src GROUP BY 1) s
         |  ON s.node = d.node)""".stripMargin
    }.mkString(",\n")
    s"""WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
       |und AS (SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
       |  FROM li a JOIN li b
       |  ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
       |edges AS (SELECT src, dst FROM und UNION ALL SELECT dst, src FROM und),
       |degs AS (SELECT src AS node, count(*)::BIGINT AS outdeg FROM edges GROUP BY 1),
       |seeds AS (SELECT node FROM degs ORDER BY node LIMIT 20),
       |sdegs AS (SELECT d.node, d.outdeg,
       |  CASE WHEN s.node IS NULL THEN 0 ELSE 1 END::BIGINT AS is_seed
       |  FROM degs d LEFT JOIN seeds s ON s.node = d.node),
       |r0 AS (SELECT node, outdeg, is_seed,
       |  ($scale * is_seed)::BIGINT AS rank_fp FROM sdegs),
       |$iterCtes
       |SELECT node, outdeg, rank_fp, rank_fp::DOUBLE / ${dlit(scale.toDouble)} AS pagerank
       |FROM r$iters WHERE rank_fp > 0 ORDER BY rank_fp DESC, node LIMIT 50""".stripMargin
  }

  /** Robust MAD outliers (mirror of EventOps.robustAnomalies:
    * quantile_cont medians are bitwise vs Spark percentile; one
    * 0.6745-scaled ratio in the same expression shape).
    */
  val eventsAnomalyRobust: String =
    """WITH v AS (SELECT event_id, event_type,
      |  CAST(CAST(value AS DECIMAL(18,2)) AS DOUBLE) AS value_2dp FROM events),
      |med AS (SELECT event_type, quantile_cont(value_2dp, 0.5) AS median_v
      |  FROM v GROUP BY 1),
      |mad AS (SELECT v.event_type,
      |  quantile_cont(abs(v.value_2dp - med.median_v), 0.5) AS mad_v
      |  FROM v JOIN med ON med.event_type = v.event_type GROUP BY 1),
      |z AS (SELECT v.event_type, v.event_id, v.value_2dp, med.median_v,
      |  0.6745 * (v.value_2dp - med.median_v) / mad.mad_v AS robust_z
      |  FROM v
      |  JOIN med ON med.event_type = v.event_type
      |  JOIN mad ON mad.event_type = v.event_type
      |  WHERE mad.mad_v > 0)
      |SELECT event_type, event_id, value_2dp, median_v, robust_z
      |FROM z WHERE abs(robust_z) > 3.5
      |ORDER BY event_id""".stripMargin

  /** Markov transition matrix (mirror of EventOps.transitions: lead
    * over the user window, keyed counts, broadcast per-from totals,
    * one integer-ratio division).
    */
  val eventsTransitions: String =
    """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS us, event_type
      |  FROM events WHERE epoch_us(ts) IS NOT NULL),
      |p AS (SELECT event_type AS from_type,
      |  lead(event_type) OVER (PARTITION BY user_id ORDER BY us, event_id) AS to_type
      |  FROM e),
      |c AS (SELECT from_type, to_type, count(*) AS n FROM p
      |  WHERE to_type IS NOT NULL GROUP BY 1, 2),
      |t AS (SELECT from_type, sum(n) AS n_from FROM c GROUP BY 1)
      |SELECT c.from_type, c.to_type, c.n,
      |  CAST(c.n AS DOUBLE) / t.n_from AS p
      |FROM c JOIN t ON t.from_type = c.from_type
      |ORDER BY c.from_type, c.to_type""".stripMargin

  /** Market-basket co-occurrence (mirror of Relational.coOccurrence:
    * per-order pair explosion, keyed count, global top-20 with a
    * total-order tie-break).
    */
  val qCoOccurrence: String =
    """WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
      |p AS (SELECT a.l_partkey AS part_a, b.l_partkey AS part_b
      |  FROM li a JOIN li b
      |  ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
      |g AS (SELECT part_a, part_b, count(*) AS n_orders FROM p GROUP BY 1, 2),
      |r AS (SELECT part_a, part_b, n_orders,
      |  CAST(row_number() OVER (ORDER BY n_orders DESC, part_a, part_b) AS BIGINT) AS rank
      |  FROM g)
      |SELECT part_a, part_b, n_orders, rank FROM r WHERE rank <= 20
      |ORDER BY rank""".stripMargin

  /** Crawl-to-crawl diff (mirror of the corpus_diff wiring: new crawl
    * = drop every 10th doc, append a token to every 7th, add every
    * 13th under a shifted id; content identity = the dedup
    * normalized-token fingerprint).
    */
  val corpusDiff: String =
    s"""WITH base AS (SELECT doc_id, text FROM documents),
       |newc AS (
       |  SELECT doc_id,
       |    CASE WHEN doc_id % 7 = 0 THEN text || ' updated' ELSE text END AS text
       |  FROM base WHERE doc_id % 10 <> 0
       |  UNION ALL
       |  SELECT doc_id + 10000000, text FROM base WHERE doc_id % 13 = 0),
       |o AS (SELECT doc_id,
       |  ${hex64("array_to_string(" + Toks + ",' ')")} AS old_fp FROM base),
       |n AS (SELECT doc_id,
       |  ${hex64("array_to_string(" + Toks + ",' ')")} AS new_fp FROM newc)
       |SELECT COALESCE(o.doc_id, n.doc_id) AS doc_id,
       |  CASE WHEN o.doc_id IS NULL THEN 'added'
       |       WHEN n.doc_id IS NULL THEN 'removed'
       |       WHEN o.old_fp = n.new_fp THEN 'unchanged'
       |       ELSE 'changed' END AS status,
       |  o.old_fp, n.new_fp
       |FROM o FULL OUTER JOIN n ON o.doc_id = n.doc_id
       |ORDER BY doc_id""".stripMargin

  val textNormalize: String = {
    val combos = graft.text.TextAnalysis.NfcCombos.map(c => s"'$c'").mkString(", ")
    s"""WITH m AS (SELECT doc_id, text,
       |  ([$combos])[(doc_id % 20) + 1] AS combo FROM documents),
       |r AS (SELECT doc_id,
       |  CASE WHEN doc_id % 7 = 0 THEN text
       |       ELSE text || ' ' || repeat(combo, CAST(doc_id % 3 AS INT) + 1) END AS raw
       |  FROM m)
       |SELECT doc_id, raw <> nfc_normalize(raw) AS changed,
       |  length(raw)::BIGINT AS n_chars_raw,
       |  length(nfc_normalize(raw))::BIGINT AS n_chars_nfc,
       |  nfc_normalize(raw) AS nfc_text
       |FROM r ORDER BY doc_id""".stripMargin
  }

  val knnClassifyIvf: String =
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |cent AS (SELECT vec_id AS c_id, v AS cv FROM e WHERE vec_id < 8),
       |asg AS (SELECT vec_id, c_id AS cell FROM (
       |  SELECT e.vec_id, c.c_id,
       |    row_number() OVER (PARTITION BY e.vec_id
       |      ORDER BY list_cosine_similarity(e.v, c.cv) DESC, c.c_id) AS rn
       |  FROM e, cent c) WHERE rn = 1),
       |q AS (SELECT vec_id AS q_id, v AS qv FROM e WHERE vec_id < 10),
       |probe AS (SELECT q_id, c_id AS cell FROM (
       |  SELECT q.q_id, c.c_id,
       |    row_number() OVER (PARTITION BY q.q_id
       |      ORDER BY list_cosine_similarity(q.qv, c.cv) DESC, c.c_id) AS rn
       |  FROM q, cent c) WHERE rn <= 2),
       |cand AS (SELECT DISTINCT p.q_id, a.vec_id AS cand_id
       |  FROM probe p JOIN asg a ON a.cell = p.cell WHERE a.vec_id <> p.q_id),
       |s AS (SELECT cand.q_id, cand.cand_id, list_cosine_similarity(q.qv, e.v) AS sim
       |  FROM cand JOIN q ON q.q_id = cand.q_id JOIN e ON e.vec_id = cand.cand_id),
       |r AS (SELECT q_id, cand_id,
       |  row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, cand_id) AS rn
       |  FROM s),
       |v AS (SELECT r.q_id, emb.label::BIGINT AS label,
       |  count(*) AS votes, min(rn) AS best_rn
       |  FROM r JOIN embeddings emb ON emb.vec_id = r.cand_id
       |  WHERE rn <= 5 GROUP BY 1, 2),
       |p AS (SELECT q_id, label, votes,
       |  row_number() OVER (PARTITION BY q_id
       |    ORDER BY votes DESC, best_rn, label) AS pr FROM v)
       |SELECT q_id, label AS pred_label, votes FROM p WHERE pr = 1
       |ORDER BY q_id""".stripMargin

  /** Recall of the probed IVF top-5 against the exact top-5 (mirror of
    * Knn.recallEval over the ann_ivf and cosine_topk_exact chains):
    * counts are exact integers, recall is one IEEE division.
    */
  lazy val annRecallEval: String =
    s"""WITH g AS (SELECT q_id, cand_id FROM ($annIvf) __g),
       |t AS (SELECT q_id, cand_id FROM ($cosineTopkExact) __t),
       |cm AS (SELECT g.q_id, count(*)::BIGINT AS n_common
       |  FROM g JOIN t ON t.q_id = g.q_id AND t.cand_id = g.cand_id GROUP BY 1),
       |gn AS (SELECT q_id, count(*)::BIGINT AS n_got FROM g GROUP BY 1),
       |tn AS (SELECT q_id, count(*)::BIGINT AS n_truth FROM t GROUP BY 1)
       |SELECT COALESCE(gn.q_id, tn.q_id) AS q_id,
       |  COALESCE(n_got, 0)::BIGINT AS n_got,
       |  COALESCE(n_truth, 0)::BIGINT AS n_truth,
       |  COALESCE(cm.n_common, 0)::BIGINT AS n_common,
       |  CASE WHEN COALESCE(n_truth, 0) > 0
       |    THEN COALESCE(cm.n_common, 0)::DOUBLE / n_truth END AS recall
       |FROM gn FULL OUTER JOIN tn ON tn.q_id = gn.q_id
       |LEFT JOIN cm ON cm.q_id = COALESCE(gn.q_id, tn.q_id)
       |ORDER BY q_id""".stripMargin

  /** Readability battery (mirror of TextAnalysis.readability):
    * vowel-group syllables (floor 1/word), terminal-punctuation
    * sentences (floor 1/doc), Flesch-Kincaid grade + Flesch ease with
    * the same association order and dlit constants.
    */
  val textReadability: String =
    s"""WITH t AS (SELECT doc_id, text, $Toks AS toks FROM documents),
       |c AS (SELECT doc_id,
       |  len(toks)::BIGINT AS n_words,
       |  GREATEST(1, len(list_filter(string_split_regex(text, '[.!?]+'),
       |    s -> trim(s) <> '')))::BIGINT AS n_sentences,
       |  list_sum(list_transform(toks, w ->
       |    GREATEST(1, len(regexp_extract_all(w, '[aeiouy]+')))))::BIGINT
       |    AS n_syllables
       |  FROM t WHERE len(toks) > 0)
       |SELECT doc_id, n_words, n_sentences, n_syllables,
       |  ${dlit(0.39)} * (n_words::DOUBLE / n_sentences) +
       |    ${dlit(11.8)} * (n_syllables::DOUBLE / n_words) - ${dlit(15.59)}
       |    AS fk_grade,
       |  ${dlit(206.835)} -
       |    ${dlit(1.015)} * (n_words::DOUBLE / n_sentences) -
       |    ${dlit(84.6)} * (n_syllables::DOUBLE / n_words) AS flesch_ease
       |FROM c ORDER BY doc_id""".stripMargin

  /** Ranked-list eval (mirror of Knn.rankEval over the ann_ivf ×
    * exact chains): min matched rank per query + its reciprocal;
    * no-hit queries carry nulls.
    */
  lazy val annRankEval: String =
    s"""WITH g AS (SELECT q_id, rn, cand_id FROM ($annIvf) __g),
       |t AS (SELECT q_id, cand_id FROM ($cosineTopkExact) __t),
       |h AS (SELECT g.q_id, min(g.rn)::BIGINT AS first_hit_rank,
       |  count(*)::BIGINT AS n_common
       |  FROM g JOIN t ON t.q_id = g.q_id AND t.cand_id = g.cand_id GROUP BY 1),
       |qa AS (SELECT DISTINCT q_id FROM g)
       |SELECT qa.q_id, COALESCE(h.n_common, 0)::BIGINT AS n_common,
       |  h.first_hit_rank,
       |  CASE WHEN h.first_hit_rank IS NOT NULL
       |    THEN 1.0::DOUBLE / h.first_hit_rank END AS mrr
       |FROM qa LEFT JOIN h ON h.q_id = qa.q_id ORDER BY qa.q_id""".stripMargin

  val annIvf: String =
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |cent AS (SELECT vec_id AS c_id, v AS cv FROM e WHERE vec_id < 8),
       |asg AS (SELECT vec_id, c_id AS cell FROM (
       |  SELECT e.vec_id, c.c_id,
       |    row_number() OVER (PARTITION BY e.vec_id
       |      ORDER BY list_cosine_similarity(e.v, c.cv) DESC, c.c_id) AS rn
       |  FROM e, cent c) WHERE rn = 1),
       |q AS (SELECT vec_id AS q_id, v AS qv FROM e WHERE vec_id < 10),
       |probe AS (SELECT q_id, c_id AS cell FROM (
       |  SELECT q.q_id, c.c_id,
       |    row_number() OVER (PARTITION BY q.q_id
       |      ORDER BY list_cosine_similarity(q.qv, c.cv) DESC, c.c_id) AS rn
       |  FROM q, cent c) WHERE rn <= 2),
       |cand AS (SELECT DISTINCT p.q_id, a.vec_id AS cand_id
       |  FROM probe p JOIN asg a ON a.cell = p.cell WHERE a.vec_id <> p.q_id),
       |s AS (SELECT cand.q_id, cand.cand_id, list_cosine_similarity(q.qv, e.v) AS sim
       |  FROM cand JOIN q ON q.q_id = cand.q_id JOIN e ON e.vec_id = cand.cand_id),
       |r AS (SELECT q_id, cand_id, sim,
       |  CAST(row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, cand_id) AS BIGINT) AS rn
       |  FROM s)
       |SELECT q_id, rn, cand_id, sim FROM r WHERE rn <= 5 ORDER BY q_id, rn""".stripMargin

  /** Filtered IVF ANN (mirror of the ann_ivf_filtered wiring:
    * candidates restricted to label < 5 at serving time; cell
    * assignment is per-vector, so filtering candidates ≡ filtering
    * the corpus before indexing).
    */
  val annIvfFiltered: String =
    s"""WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
       |cent AS (SELECT vec_id AS c_id, v AS cv FROM e WHERE vec_id < 8),
       |asg AS (SELECT vec_id, c_id AS cell FROM (
       |  SELECT e.vec_id, c.c_id,
       |    row_number() OVER (PARTITION BY e.vec_id
       |      ORDER BY list_cosine_similarity(e.v, c.cv) DESC, c.c_id) AS rn
       |  FROM e, cent c) WHERE rn = 1),
       |q AS (SELECT vec_id AS q_id, v AS qv FROM e WHERE vec_id < 10),
       |probe AS (SELECT q_id, c_id AS cell FROM (
       |  SELECT q.q_id, c.c_id,
       |    row_number() OVER (PARTITION BY q.q_id
       |      ORDER BY list_cosine_similarity(q.qv, c.cv) DESC, c.c_id) AS rn
       |  FROM q, cent c) WHERE rn <= 2),
       |cand AS (SELECT DISTINCT p.q_id, a.vec_id AS cand_id
       |  FROM probe p JOIN asg a ON a.cell = p.cell
       |  JOIN e ON e.vec_id = a.vec_id
       |  WHERE a.vec_id <> p.q_id AND e.label < 5),
       |s AS (SELECT cand.q_id, cand.cand_id, list_cosine_similarity(q.qv, e.v) AS sim
       |  FROM cand JOIN q ON q.q_id = cand.q_id JOIN e ON e.vec_id = cand.cand_id),
       |r AS (SELECT q_id, cand_id, sim,
       |  CAST(row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, cand_id) AS BIGINT) AS rn
       |  FROM s)
       |SELECT q_id, rn, cand_id, sim FROM r WHERE rn <= 5 ORDER BY q_id, rn""".stripMargin

  /** Hamming-prefilter ANN (mirror of Quantize.binaryTopK wiring in
    * SparkEntry: queries = vec_id<10, prefilterK=20, k=5, d=64 → two
    * 32-bit sign words). Integer bit_count(xor) distances; the
    * prefilter rank (hamming asc, cand_id) mirrors TopKByScore on
    * −hamming; exact-cosine rerank of the 20 survivors.
    */
  val annHamming: String = {
    def word(w: Int): String = (0 until 32)
      .map(j => s"(CASE WHEN v[${w * 32 + j + 1}] > 0 THEN ${1L << j} ELSE 0 END)")
      .mkString(" + ")
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |b AS (SELECT vec_id, v, (${word(0)})::BIGINT AS c0,
       |  (${word(1)})::BIGINT AS c1 FROM e),
       |q AS (SELECT vec_id AS q_id, v AS qv, c0 AS q0, c1 AS q1 FROM b WHERE vec_id < 10),
       |h AS (SELECT q.q_id, b.vec_id AS cand_id, b.v AS cv,
       |  bit_count(xor(q.q0, b.c0)) + bit_count(xor(q.q1, b.c1)) AS ham
       |  FROM b, q WHERE b.vec_id <> q.q_id),
       |pre AS (SELECT q_id, cand_id, cv FROM (
       |  SELECT q_id, cand_id, cv,
       |    row_number() OVER (PARTITION BY q_id ORDER BY ham, cand_id) AS prn
       |  FROM h) WHERE prn <= 20),
       |s AS (SELECT pre.q_id, pre.cand_id,
       |  list_cosine_similarity(q.qv, pre.cv) AS sim
       |  FROM pre JOIN q ON q.q_id = pre.q_id),
       |r AS (SELECT q_id, cand_id, sim,
       |  CAST(row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, cand_id) AS BIGINT) AS rn
       |  FROM s)
       |SELECT q_id, rn, cand_id, sim FROM r WHERE rn <= 5
       |ORDER BY q_id, rn""".stripMargin
  }

  /** Feature-hashing embedding, sparse surface (mirror of
    * TextAnalysis.hashEmbed, d=64): integer signed counts; the only
    * floats are √ and one division — both correctly-rounded IEEE ops,
    * hence hash-exact.
    */
  val textHashEmbed: String =
    s"""WITH t AS (SELECT doc_id, $Toks AS toks FROM documents),
       |tok AS (SELECT doc_id, unnest(toks) AS tk FROM t),
       |h AS (SELECT doc_id, ${hex64("'he|'||tk")} AS h FROM tok),
       |s AS (SELECT doc_id, h % 64 AS dim,
       |  CASE WHEN (h >> 20) & 1 = 1 THEN 1 ELSE -1 END AS sgn FROM h),
       |w AS (SELECT doc_id, dim, sum(sgn)::BIGINT AS w FROM s
       |  GROUP BY 1, 2 HAVING sum(sgn) <> 0),
       |n AS (SELECT doc_id, sqrt(sum(w * w)) AS nrm FROM w GROUP BY 1)
       |SELECT w.doc_id, w.dim, w.w, w.w / n.nrm AS weight
       |FROM w JOIN n ON w.doc_id = n.doc_id
       |ORDER BY w.doc_id, w.dim""".stripMargin

  /** Hash-embedding cosine top-k (mirror of TextAnalysis.hashEmbedTopK,
    * queries = doc_id<10, d=64, k=5): integer numerator/norm sums, two
    * √ and one ÷ — fully hash-exact.
    */
  val textKnnHashEmbed: String =
    s"""WITH t AS (SELECT doc_id, $Toks AS toks FROM documents),
       |tok AS (SELECT doc_id, unnest(toks) AS tk FROM t),
       |h AS (SELECT doc_id, ${hex64("'he|'||tk")} AS h FROM tok),
       |sg AS (SELECT doc_id, h % 64 AS dim,
       |  CASE WHEN (h >> 20) & 1 = 1 THEN 1 ELSE -1 END AS sgn FROM h),
       |w AS (SELECT doc_id, dim, sum(sgn)::BIGINT AS w FROM sg
       |  GROUP BY 1, 2 HAVING sum(sgn) <> 0),
       |n AS (SELECT doc_id, sum(w * w)::BIGINT AS s2 FROM w GROUP BY 1),
       |q AS (SELECT * FROM w WHERE doc_id < 10),
       |num AS (SELECT q.doc_id AS q_id, c.doc_id AS cand_id,
       |  sum(q.w * c.w)::BIGINT AS num
       |  FROM q JOIN w c ON q.dim = c.dim AND q.doc_id <> c.doc_id
       |  GROUP BY 1, 2),
       |s AS (SELECT num.q_id, num.cand_id,
       |  num / (sqrt(nq.s2) * sqrt(nc.s2)) AS sim
       |  FROM num JOIN n nq ON nq.doc_id = num.q_id
       |  JOIN n nc ON nc.doc_id = num.cand_id),
       |r AS (SELECT q_id, cand_id, sim,
       |  CAST(row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, cand_id) AS BIGINT) AS rn
       |  FROM s)
       |SELECT q_id, rn, cand_id, sim FROM r WHERE rn <= 5
       |ORDER BY q_id, rn""".stripMargin

  /** Hybrid RRF retrieval (mirror of TextAnalysis.hybridSearchTopK,
    * defaults: kEach=20, k=10, rrfK=60, d=64): the [[textSearchTopK]]
    * chain supplies lexical ranks; the semantic side hash-embeds the
    * query TERMS as a pseudo-document through the same `he|` chain and
    * ranks corpus docs by integer-exact sparse cosine; fusion is
    * `1/(60+lex_rank) + 1/(60+vec_rank)` in that association order —
    * two correctly-rounded IEEE divisions and one addition over
    * integer ranks, hash-exact end to end.
    */
  val textSearchHybrid: String = {
    val terms = TextAnalysis.Bm25Terms
    val termList = terms.map(t => s"'$t'").mkString(", ")
    val vecChain =
      s"""WITH t AS (SELECT doc_id, $Toks AS toks FROM documents),
         |tok AS (SELECT doc_id, unnest(toks) AS tk FROM t),
         |h AS (SELECT doc_id, ${hex64("'he|'||tk")} AS h FROM tok),
         |sg AS (SELECT doc_id, h % 64 AS dim,
         |  CASE WHEN (h >> 20) & 1 = 1 THEN 1 ELSE -1 END AS sgn FROM h),
         |w AS (SELECT doc_id, dim, sum(sgn)::BIGINT AS w FROM sg
         |  GROUP BY 1, 2 HAVING sum(sgn) <> 0),
         |n AS (SELECT doc_id, sum(w * w)::BIGINT AS s2 FROM w GROUP BY 1),
         |qtok AS (SELECT unnest([$termList]) AS tk),
         |qh AS (SELECT ${hex64("'he|'||tk")} AS h FROM qtok),
         |qsg AS (SELECT h % 64 AS dim,
         |  CASE WHEN (h >> 20) & 1 = 1 THEN 1 ELSE -1 END AS sgn FROM qh),
         |qw AS (SELECT dim, sum(sgn)::BIGINT AS w FROM qsg
         |  GROUP BY 1 HAVING sum(sgn) <> 0),
         |qn AS (SELECT sum(w * w)::BIGINT AS s2 FROM qw),
         |num AS (SELECT c.doc_id AS cand_id, sum(q.w * c.w)::BIGINT AS num
         |  FROM qw q JOIN w c ON q.dim = c.dim GROUP BY 1),
         |sc AS (SELECT num.cand_id, num / (sqrt(qn.s2) * sqrt(nc.s2)) AS sim
         |  FROM num CROSS JOIN qn JOIN n nc ON nc.doc_id = num.cand_id),
         |vr AS (SELECT cand_id, sim, CAST(row_number() OVER (
         |  ORDER BY sim DESC, cand_id) AS BIGINT) AS rn FROM sc)
         |SELECT cand_id AS doc_id, rn AS vec_rank FROM vr WHERE rn <= 20""".stripMargin
    s"""WITH lexr AS (
       |  SELECT doc_id, CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS BIGINT)
       |    AS lex_rank
       |  FROM ($textSearchTopK) __lex),
       |vecr AS (SELECT * FROM ($vecChain) __vec),
       |fused AS (SELECT coalesce(l.doc_id, v.doc_id) AS doc_id,
       |  l.lex_rank, v.vec_rank,
       |  coalesce(1.0::DOUBLE / (60 + l.lex_rank), 0.0e0)
       |    + coalesce(1.0::DOUBLE / (60 + v.vec_rank), 0.0e0) AS rrf_score
       |  FROM lexr l FULL OUTER JOIN vecr v ON l.doc_id = v.doc_id),
       |r AS (SELECT doc_id, lex_rank, vec_rank, rrf_score,
       |  CAST(row_number() OVER (ORDER BY rrf_score DESC, doc_id) AS BIGINT) AS rn
       |  FROM fused)
       |SELECT rn, doc_id, lex_rank, vec_rank, rrf_score FROM r
       |WHERE rn <= 10 ORDER BY rn""".stripMargin
  }

  /** Hybrid retrieval with both sides index-served (mirror of
    * hybridSearchTopKOnIndexes with nProbe = every cell): the lexical
    * ranks are the same persisted-postings BM25 chain as
    * [[textSearchTopK]]; the semantic side, served probe-every-cell,
    * degenerates to the exact DENSE float cosine over the
    * hashEmbedVectors corpus — mirrored here by assembling each doc's
    * 64-dim float-cast vector (zero-padded, dim order) and ranking
    * `list_cosine_similarity` against the query pseudo-doc vector
    * (both engines accumulate in double, index order). Fusion tail
    * identical to [[textSearchHybrid]].
    */
  val textSearchHybridIndexed: String = {
    val terms = TextAnalysis.Bm25Terms
    val termList = terms.map(t => s"'$t'").mkString(", ")
    val vecChain =
      s"""WITH t AS (SELECT doc_id, $Toks AS toks FROM documents),
         |tok AS (SELECT doc_id, unnest(toks) AS tk FROM t),
         |h AS (SELECT doc_id, ${hex64("'he|'||tk")} AS h FROM tok),
         |sg AS (SELECT doc_id, h % 64 AS dim,
         |  CASE WHEN (h >> 20) & 1 = 1 THEN 1 ELSE -1 END AS sgn FROM h),
         |w AS (SELECT doc_id, dim, sum(sgn)::BIGINT AS w FROM sg
         |  GROUP BY 1, 2 HAVING sum(sgn) <> 0),
         |n AS (SELECT doc_id, sum(w * w)::BIGINT AS s2 FROM w GROUP BY 1),
         |wt AS (SELECT w.doc_id, w.dim, (w.w / sqrt(n.s2)) AS wt
         |  FROM w JOIN n ON n.doc_id = w.doc_id),
         |dims AS (SELECT unnest(range(0, 64)) AS dim),
         |dense AS (SELECT d.doc_id,
         |  list(coalesce(wt.wt::FLOAT, 0.0::FLOAT)::DOUBLE ORDER BY dm.dim) AS v
         |  FROM (SELECT DISTINCT doc_id FROM w) d
         |  CROSS JOIN dims dm
         |  LEFT JOIN wt ON wt.doc_id = d.doc_id AND wt.dim = dm.dim
         |  GROUP BY d.doc_id),
         |qtok AS (SELECT unnest([$termList]) AS tk),
         |qh AS (SELECT ${hex64("'he|'||tk")} AS h FROM qtok),
         |qsg AS (SELECT h % 64 AS dim,
         |  CASE WHEN (h >> 20) & 1 = 1 THEN 1 ELSE -1 END AS sgn FROM qh),
         |qw AS (SELECT dim, sum(sgn)::BIGINT AS w FROM qsg
         |  GROUP BY 1 HAVING sum(sgn) <> 0),
         |qn AS (SELECT sum(w * w)::BIGINT AS s2 FROM qw),
         |qwt AS (SELECT qw.dim, (qw.w / sqrt(qn.s2)) AS wt FROM qw CROSS JOIN qn),
         |qdense AS (SELECT
         |  list(coalesce(qwt.wt::FLOAT, 0.0::FLOAT)::DOUBLE ORDER BY dm.dim) AS qv
         |  FROM dims dm LEFT JOIN qwt ON qwt.dim = dm.dim),
         |vsim AS (SELECT dv.doc_id, list_cosine_similarity(q.qv, dv.v) AS sim
         |  FROM dense dv CROSS JOIN qdense q),
         |vr AS (SELECT doc_id, sim, CAST(row_number() OVER (
         |  ORDER BY sim DESC, doc_id) AS BIGINT) AS rn FROM vsim)
         |SELECT doc_id, rn AS vec_rank FROM vr WHERE rn <= 20""".stripMargin
    s"""WITH lexr AS (
       |  SELECT doc_id, CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS BIGINT)
       |    AS lex_rank
       |  FROM ($textSearchTopK) __lex),
       |vecr AS (SELECT * FROM ($vecChain) __vec),
       |fused AS (SELECT coalesce(l.doc_id, v.doc_id) AS doc_id,
       |  l.lex_rank, v.vec_rank,
       |  coalesce(1.0::DOUBLE / (60 + l.lex_rank), 0.0e0)
       |    + coalesce(1.0::DOUBLE / (60 + v.vec_rank), 0.0e0) AS rrf_score
       |  FROM lexr l FULL OUTER JOIN vecr v ON l.doc_id = v.doc_id),
       |r AS (SELECT doc_id, lex_rank, vec_rank, rrf_score,
       |  CAST(row_number() OVER (ORDER BY rrf_score DESC, doc_id) AS BIGINT) AS rn
       |  FROM fused)
       |SELECT rn, doc_id, lex_rank, vec_rank, rrf_score FROM r
       |WHERE rn <= 10 ORDER BY rn""".stripMargin
  }

  /** Persisted-topic assignment (mirror of Topics.saveTopics ∘
    * assignOnTopics over the same corpus): the corpusTopics
    * sparse-cosine assignment prefix with the winning sim surfaced —
    * integer numerators + one IEEE division keep even the similarity
    * hash-exact.
    */
  val corpusTopicsAssign: String =
    s"""WITH t AS (SELECT doc_id, $Toks AS toks FROM documents),
       |tok AS (SELECT doc_id, unnest(toks) AS tk FROM t),
       |h AS (SELECT doc_id, ${hex64("'he|'||tk")} AS h FROM tok),
       |sg AS (SELECT doc_id, h % 64 AS dim,
       |  CASE WHEN (h >> 20) & 1 = 1 THEN 1 ELSE -1 END AS sgn FROM h),
       |w AS (SELECT doc_id, dim, sum(sgn)::BIGINT AS w FROM sg
       |  GROUP BY 1, 2 HAVING sum(sgn) <> 0),
       |n AS (SELECT doc_id, sum(w * w)::BIGINT AS s2 FROM w GROUP BY 1),
       |cw AS (SELECT doc_id AS c_id, dim, w AS cw FROM w WHERE doc_id < 8),
       |num AS (SELECT w.doc_id, cw.c_id, sum(w.w * cw.cw)::BIGINT AS num
       |  FROM w JOIN cw ON w.dim = cw.dim GROUP BY 1, 2),
       |sim AS (SELECT num.doc_id, num.c_id,
       |  num / (sqrt(nd.s2) * sqrt(nc.s2)) AS sim
       |  FROM num JOIN n nd ON nd.doc_id = num.doc_id
       |  JOIN n nc ON nc.doc_id = num.c_id),
       |r AS (SELECT doc_id, c_id, sim, row_number() OVER (PARTITION BY doc_id
       |  ORDER BY sim DESC, c_id) AS rn FROM sim)
       |SELECT doc_id, c_id AS cluster, sim FROM r WHERE rn = 1
       |ORDER BY doc_id""".stripMargin

  /** Corpus topics (mirror of Topics.topics: centroids = hash-embeds
    * of doc_id < 8, top 5 terms per cluster): the textKnnHashEmbed
    * sparse-cosine chain as the assignment argmax, then integer count
    * tables and a rank by (score desc, token hash).
    */
  val corpusTopics: String =
    s"""WITH t AS (SELECT doc_id, $Toks AS toks FROM documents),
       |tok AS (SELECT doc_id, unnest(toks) AS tk FROM t),
       |h AS (SELECT doc_id, ${hex64("'he|'||tk")} AS h FROM tok),
       |sg AS (SELECT doc_id, h % 64 AS dim,
       |  CASE WHEN (h >> 20) & 1 = 1 THEN 1 ELSE -1 END AS sgn FROM h),
       |w AS (SELECT doc_id, dim, sum(sgn)::BIGINT AS w FROM sg
       |  GROUP BY 1, 2 HAVING sum(sgn) <> 0),
       |n AS (SELECT doc_id, sum(w * w)::BIGINT AS s2 FROM w GROUP BY 1),
       |cw AS (SELECT doc_id AS c_id, dim, w AS cw FROM w WHERE doc_id < 8),
       |num AS (SELECT w.doc_id, cw.c_id, sum(w.w * cw.cw)::BIGINT AS num
       |  FROM w JOIN cw ON w.dim = cw.dim GROUP BY 1, 2),
       |sim AS (SELECT num.doc_id, num.c_id,
       |  num / (sqrt(nd.s2) * sqrt(nc.s2)) AS sim
       |  FROM num JOIN n nd ON nd.doc_id = num.doc_id
       |  JOIN n nc ON nc.doc_id = num.c_id),
       |asg AS (SELECT doc_id, c_id AS cluster FROM (
       |  SELECT doc_id, c_id, row_number() OVER (PARTITION BY doc_id
       |    ORDER BY sim DESC, c_id) AS rn FROM sim) aq WHERE rn = 1),
       |cc AS (SELECT tk AS t, count(*)::BIGINT AS corpus_count FROM tok GROUP BY 1),
       |kc AS (SELECT a.cluster, tok.tk AS t, count(*)::BIGINT AS cluster_count
       |  FROM tok JOIN asg a ON a.doc_id = tok.doc_id GROUP BY 1, 2),
       |sc AS (SELECT kc.cluster, kc.t, kc.cluster_count, cc.corpus_count,
       |  kc.cluster_count::DOUBLE / cc.corpus_count::DOUBLE AS score,
       |  ${hex64("'tp|'||kc.t")} AS th
       |  FROM kc JOIN cc ON cc.t = kc.t),
       |r AS (SELECT cluster, t, cluster_count, corpus_count, score,
       |  CAST(row_number() OVER (PARTITION BY cluster
       |    ORDER BY score DESC, th) AS BIGINT) AS term_rank FROM sc)
       |SELECT cluster, term_rank, t AS token, cluster_count, corpus_count, score
       |FROM r WHERE term_rank <= 5 ORDER BY cluster, term_rank""".stripMargin

  /** Sliding 1h/15min window rollup (mirror of EventOps.slidingRollup):
    * the window replication is pure integer slide-index arithmetic on
    * the nonnegative-µs domain (pinned by spec); value sums in exact
    * decimal.
    */
  val eventsSliding: String =
    s"""WITH e AS (SELECT event_type, epoch_us(ts) AS us, value FROM events),
       |x AS (SELECT event_type, value,
       |  unnest(range(us // 900000000 - 3, us // 900000000 + 1)) AS slide_idx
       |  FROM e)
       |SELECT slide_idx * 900000000 AS window_start_us, event_type,
       |  count(*) AS n_events,
       |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
       |FROM x WHERE slide_idx >= 0
       |GROUP BY 1, 2
       |ORDER BY window_start_us, event_type""".stripMargin

  /** Corpus-bigram LM scoring (mirror of TextAnalysis.ngramLmScore):
    * add-one-smoothed bigram log-probs through detLn, reassembled per
    * document in POSITION order and folded left-to-right with
    * list_reduce — bitwise-mirroring Spark's sort_array + aggregate
    * fold, so even the double summation hash-matches.
    */
  val textNgramLm: String = {
    val base =
      s"""WITH t AS (SELECT doc_id, $Toks AS toks FROM documents),
         |bgd AS (SELECT doc_id,
         |  unnest([{'p': i, 'w1': toks[i], 'w2': toks[i+1]}
         |    for i in range(1, len(toks))]) AS u
         |  FROM t WHERE len(toks) >= 2),
         |bg AS (SELECT doc_id, u.p AS pos, u.w1 AS w1, u.w2 AS w2 FROM bgd),
         |uni AS (SELECT w1, count(*)::BIGINT AS c1
         |  FROM (SELECT unnest(toks) AS w1 FROM t) GROUP BY 1),
         |big AS (SELECT w1, w2, count(*)::BIGINT AS c12 FROM bg GROUP BY 1, 2),
         |vv AS (SELECT count(DISTINCT w)::BIGINT AS v
         |  FROM (SELECT unnest(toks) AS w FROM t))
         |SELECT bg.doc_id, bg.pos,
         |  (big.c12 + 1) / (uni.c1 + vv.v) AS ratio
         |FROM bg JOIN big ON bg.w1 = big.w1 AND bg.w2 = big.w2
         |  JOIN uni ON bg.w1 = uni.w1 CROSS JOIN vv""".stripMargin
    val wrapped = detLn(base, "doc_id, pos", "ratio", "logp", "lm")
    s"""WITH agg AS (SELECT doc_id, count(*)::BIGINT AS n_bigrams,
       |  list(logp ORDER BY pos) AS l
       |  FROM ($wrapped) __lm GROUP BY doc_id)
       |SELECT doc_id, n_bigrams,
       |  list_reduce(l, (x, y) -> x + y) AS sum_logp,
       |  list_reduce(l, (x, y) -> x + y) / n_bigrams AS avg_logp
       |FROM agg ORDER BY doc_id""".stripMargin
  }

  /** SemDeDup (mirror of Knn.semanticDedup wiring in SparkEntry:
    * centroids = vec_id<8, threshold 0.4 — the non-vacuous range for
    * the random test vectors; nProbe=2 multi-probe). Each vector joins
    * its top-2 cells for the pair comparison; the reported cell is the
    * primary (rank-1) assignment, mirroring Ivf.assignProbes.
    */
  val semanticDedup: String =
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |cent AS (SELECT vec_id AS c_id, v AS cv FROM e WHERE vec_id < 8),
       |asg AS (SELECT vec_id, c_id AS cell, rn FROM (
       |  SELECT e.vec_id, c.c_id,
       |    row_number() OVER (PARTITION BY e.vec_id
       |      ORDER BY list_cosine_similarity(e.v, c.cv) DESC, c.c_id) AS rn
       |  FROM e, cent c) WHERE rn <= 2),
       |prim AS (SELECT vec_id, cell FROM asg WHERE rn = 1),
       |ec AS (SELECT a.vec_id, a.cell, e.v FROM asg a JOIN e ON e.vec_id = a.vec_id),
       |d AS (SELECT DISTINCT y.vec_id
       |  FROM ec x JOIN ec y ON x.cell = y.cell AND x.vec_id < y.vec_id
       |  WHERE list_cosine_similarity(x.v, y.v) >= 0.4)
       |SELECT p.vec_id, p.cell, d.vec_id IS NOT NULL AS is_dup,
       |  d.vec_id IS NULL AS keep
       |FROM prim p LEFT JOIN d ON p.vec_id = d.vec_id
       |ORDER BY p.vec_id""".stripMargin

  /** Quantized-prefilter ANN (mirror of Quantize.quantizedTopK wiring
    * in SparkEntry: queries = vec_id<10, prefilterK=20, k=5).
    * Quantization of the unit vector, integer dot product (exact),
    * scale correction = one multiply + one divide (bit-identical IEEE
    * ops both engines), exact-cosine rerank of the 20 survivors.
    */
  val annQuantized: String =
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |n AS (SELECT vec_id, v,
       |  sqrt(list_aggregate(list_transform(v, x -> x * x), 'sum')) AS nrm FROM e),
       |u AS (SELECT vec_id, v, list_transform(v, x -> x / nrm) AS nv
       |  FROM n WHERE nrm > 0),
       |z AS (SELECT vec_id, v, scale,
       |  list_transform(nv, x -> CAST(floor(x * scale + 0.5) AS BIGINT)) AS qv
       |  FROM (SELECT vec_id, v, nv,
       |    CASE WHEN list_max(list_transform(nv, x -> abs(x))) = 0 THEN 0.0
       |         ELSE 127.0 / list_max(list_transform(nv, x -> abs(x))) END AS scale
       |    FROM u)),
       |q AS (SELECT vec_id AS q_id, v AS qv_full, scale AS q_scale, qv AS q_qv
       |  FROM z WHERE vec_id < 10),
       |pre AS (SELECT q_id, cand_id FROM (
       |  SELECT q.q_id, c.vec_id AS cand_id,
       |    row_number() OVER (PARTITION BY q.q_id ORDER BY
       |      (CASE WHEN q.q_scale * c.scale = 0 THEN 0.0
       |            ELSE CAST(list_aggregate(
       |                   [q.q_qv[i] * c.qv[i] for i in range(1, len(c.qv) + 1)],
       |                   'sum') AS DOUBLE) / (q.q_scale * c.scale) END) DESC,
       |      c.vec_id) AS rn
       |  FROM q, z c WHERE c.vec_id <> q.q_id) WHERE rn <= 20),
       |r AS (SELECT p.q_id, p.cand_id, list_cosine_similarity(q.qv_full, e.v) AS sim
       |  FROM pre p JOIN q ON q.q_id = p.q_id JOIN e ON e.vec_id = p.cand_id),
       |t AS (SELECT q_id, cand_id, sim,
       |  CAST(row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, cand_id) AS BIGINT) AS rn
       |  FROM r)
       |SELECT q_id, rn, cand_id, sim FROM t WHERE rn <= 5 ORDER BY q_id, rn""".stripMargin

  /** Shared chunk CTE chain (mirror of TextAnalysis.chunks, size=200,
    * stride=150; 1-based character offsets both engines) ending in
    * `c` = (doc_id, chunk_idx, chunk_start, chunk).
    */
  private val chunkCte: String =
    s"""WITH d AS (SELECT doc_id, text, length(text) AS len
       |  FROM documents WHERE length(text) > 0),
       |x AS (SELECT doc_id, text,
       |  unnest(range(0, (len - 1) // 150 + 1)) AS chunk_idx FROM d),
       |c AS (SELECT doc_id, CAST(chunk_idx AS BIGINT) AS chunk_idx,
       |  CAST(chunk_idx * 150 + 1 AS BIGINT) AS chunk_start,
       |  substring(text, chunk_idx * 150 + 1, 200) AS chunk FROM x)""".stripMargin

  /** Per-doc keywords (mirror of TextAnalysis.keywords, k=5, maxDf
    * 100000): exact integer tf/df counts, the rational idf in the
    * same IEEE operation order, rank via (score desc, hex64 asc) —
    * the window here replays the bounded top-k's ordering exactly.
    */
  lazy val textKeywords: String =
    s"""WITH t AS (SELECT doc_id, unnest($Toks) AS tok FROM documents),
       |tf AS (SELECT doc_id, tok, count(*)::BIGINT AS tf FROM t GROUP BY 1, 2),
       |dfq AS (SELECT tok, count(*)::BIGINT AS df FROM tf GROUP BY 1
       |  HAVING count(*) <= 100000),
       |n AS (SELECT count(DISTINCT doc_id) AS nd FROM tf),
       |s AS (SELECT tf.doc_id, tf.tok, tf.tf, dfq.df,
       |  tf.tf::DOUBLE * ((n.nd::DOUBLE - dfq.df + 0.5) / (dfq.df + 0.5))
       |    AS kw_score,
       |  ${hex64("tok")} AS tid
       |  FROM tf JOIN dfq USING (tok) CROSS JOIN n),
       |r AS (SELECT *, row_number() OVER (PARTITION BY doc_id
       |  ORDER BY kw_score DESC, tid ASC) AS rank FROM s)
       |SELECT doc_id, rank::BIGINT AS rank, tok AS keyword, tf, df, kw_score
       |FROM r WHERE rank <= 5 ORDER BY doc_id, rank""".stripMargin

  /** Sentence segmentation (mirror of TextAnalysis.sentences): the
    * identical RE2 rule, trim, empty-drop, and positional index.
    */
  val textSentences: String =
    s"""WITH m AS (SELECT doc_id,
       |  replace(replace(text, ' merge ', '. '), ' join ', '! ') ||
       |  CASE doc_id % 3 WHEN 0 THEN ' Tail one. And two!! Third?'
       |    WHEN 1 THEN ' No terminator tail' ELSE '' END AS text
       |  FROM documents),
       |s AS (SELECT doc_id,
       |  [trim(x) for x in
       |    regexp_extract_all(text, '[^.!?。！？]+[.!?。！？]+|[^.!?。！？]+$$')
       |    if trim(x) <> ''] AS sents
       |  FROM m),
       |e AS (SELECT doc_id,
       |  unnest(range(0, len(sents)))::BIGINT AS sent_idx,
       |  unnest(sents) AS sentence FROM s)
       |SELECT doc_id, sent_idx,
       |  length(sentence)::BIGINT AS n_chars,
       |  len(${toksOf("sentence")})::BIGINT AS n_words,
       |  ${hex64("sentence")} AS sent_hash
       |FROM e ORDER BY doc_id, sent_idx""".stripMargin

  /** Sentence-aware chunking (mirror of TextAnalysis.sentenceChunks,
    * maxChars 200): DuckDB's `list_reduce` seeds the accumulator with
    * the first element — exactly what Spark's `aggregate` with an
    * empty-string init produces after its first step, so the two
    * folds are step-identical.
    */
  val textSentenceChunks: String =
    s"""WITH m AS (SELECT doc_id,
       |  replace(replace(text, ' merge ', '. '), ' join ', '! ') ||
       |  CASE doc_id % 3 WHEN 0 THEN ' Tail one. And two!! Third?'
       |    WHEN 1 THEN ' No terminator tail' ELSE '' END AS text
       |  FROM documents),
       |s AS (SELECT doc_id,
       |  [trim(x) for x in
       |    regexp_extract_all(text, '[^.!?。！？]+[.!?。！？]+|[^.!?。！？]+$$')
       |    if trim(x) <> ''] AS sents
       |  FROM m WHERE length(text) > 0),
       |p AS (SELECT doc_id,
       |  str_split(list_reduce(sents, (acc, s) -> CASE
       |    WHEN length(str_split(acc, chr(1))[-1]) + length(s) + 1 <= 200
       |      THEN acc || ' ' || s
       |    ELSE acc || chr(1) || s END), chr(1)) AS chunks
       |  FROM s WHERE len(sents) > 0),
       |e AS (SELECT doc_id,
       |  unnest(range(0, len(chunks)))::BIGINT AS chunk_idx,
       |  unnest(chunks) AS chunk FROM p)
       |SELECT doc_id, chunk_idx,
       |  length(chunk)::BIGINT AS n_chunk_chars,
       |  ${hex64("chunk")} AS chunk_hash
       |FROM e ORDER BY doc_id, chunk_idx""".stripMargin

  val textChunks: String =
    s"""$chunkCte
       |SELECT doc_id, chunk_idx, chunk_start,
       |  length(chunk)::BIGINT AS n_chunk_chars,
       |  ${hex64("chunk")} AS chunk_hash
       |FROM c ORDER BY doc_id, chunk_idx""".stripMargin

  /** Within-doc bigram repetition (mirror of TextAnalysis.repetition;
    * positional 2-grams, exact integer counts).
    */
  val textRepetition: String =
    s"""WITH t AS (SELECT doc_id, $Toks AS toks FROM documents),
       |bi AS (SELECT doc_id,
       |  unnest([array_to_string(toks[i:i+1],' ') for i in range(1, len(toks))]) AS s
       |  FROM t),
       |pg AS (SELECT doc_id, s, count(*) AS c FROM bi GROUP BY 1, 2)
       |SELECT doc_id,
       |  CAST(sum(c) AS BIGINT) AS n_bigrams,
       |  count(*) AS n_distinct_bigrams,
       |  CAST(max(c) AS BIGINT) AS top_bigram_count,
       |  1.0 - count(*) / CAST(sum(c) AS BIGINT) AS dup_bigram_frac,
       |  CAST(max(c) AS BIGINT) / CAST(sum(c) AS BIGINT) AS top_bigram_frac
       |FROM pg GROUP BY doc_id
       |ORDER BY doc_id""".stripMargin

  /** PII scrub (mirror of Pii.scrubQuery): planted PII on every 7th
    * doc, then the same four count-then-redact stages in the same
    * order — each stage's count runs on the previous stage's redacted
    * text, so the classes are disjoint in both engines.
    */
  val textPii: String = {
    val email = graft.text.Pii.EmailRe
    val ipv4 = graft.text.Pii.Ipv4Re
    val idRun = graft.text.Pii.IdRunRe
    val phone = graft.text.Pii.PhoneRe
    s"""WITH aug AS (SELECT doc_id,
       |  CASE WHEN doc_id % 7 = 0 THEN text
       |    || ' Contact user' || CAST(doc_id AS VARCHAR)
       |    || '@example.com from 10.' || CAST(doc_id % 200 AS VARCHAR)
       |    || '.0.' || CAST(doc_id % 250 AS VARCHAR)
       |    || ' id ' || CAST(doc_id % 1000000000 + 9000000000 AS VARCHAR)
       |    || ' call +1 555-867-53' || CAST(doc_id % 90 + 10 AS VARCHAR)
       |  ELSE text END AS t0 FROM documents),
       |s1 AS (SELECT doc_id, len(regexp_extract_all(t0, '$email')) AS n_email,
       |  regexp_replace(t0, '$email', '<EMAIL>', 'g') AS t1 FROM aug),
       |s2 AS (SELECT *, len(regexp_extract_all(t1, '$ipv4')) AS n_ipv4,
       |  regexp_replace(t1, '$ipv4', '<IP>', 'g') AS t2 FROM s1),
       |s3 AS (SELECT *, len(regexp_extract_all(t2, '$idRun')) AS n_id,
       |  regexp_replace(t2, '$idRun', '<ID>', 'g') AS t3 FROM s2),
       |s4 AS (SELECT *, len(regexp_extract_all(t3, '$phone')) AS n_phone,
       |  regexp_replace(t3, '$phone', '<PHONE>', 'g') AS t4 FROM s3)
       |SELECT doc_id, n_email, n_ipv4, n_id, n_phone,
       |  n_email + n_ipv4 + n_id + n_phone AS n_pii,
       |  md5(t4) AS redacted_md5
       |FROM s4 ORDER BY doc_id""".stripMargin
  }

  /** Duplicate-chunk fraction (mirror of TextAnalysis.dupChunkRatio). */
  val textDupChunkRatio: String =
    s"""$chunkCte,
       |ch AS (SELECT doc_id, ${hex64("chunk")} AS chunk_hash FROM c),
       |ph AS (SELECT chunk_hash, count(DISTINCT doc_id) AS n_docs_with
       |  FROM ch GROUP BY chunk_hash)
       |SELECT ch.doc_id, count(*) AS n_chunks,
       |  CAST(sum(CASE WHEN ph.n_docs_with > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_chunks,
       |  CAST(sum(CASE WHEN ph.n_docs_with > 1 THEN 1 ELSE 0 END) AS BIGINT) / count(*) AS dup_chunk_ratio
       |FROM ch JOIN ph ON ph.chunk_hash = ch.chunk_hash
       |GROUP BY ch.doc_id
       |ORDER BY ch.doc_id""".stripMargin

  /** Chunk-level dedup ledger (mirror of TextAnalysis.chunksDedup:
    * keeper = min packed (doc_id, chunk_idx) per chunk_hash).
    */
  val chunksDedup: String = {
    val pack = TextAnalysis.ChunkIdxPack
    s"""$chunkCte,
       |ch AS (SELECT doc_id, chunk_idx, length(chunk)::BIGINT AS n_chunk_chars,
       |  ${hex64("chunk")} AS chunk_hash FROM c),
       |k AS (SELECT chunk_hash,
       |  min(doc_id * $pack + chunk_idx) AS keeper_key FROM ch GROUP BY chunk_hash)
       |SELECT doc_id, count(*) AS n_chunks,
       |  CAST(sum(CASE WHEN doc_id * $pack + chunk_idx = keeper_key
       |    THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       |  CAST(sum(n_chunk_chars) AS BIGINT) AS chars_total,
       |  CAST(sum(CASE WHEN doc_id * $pack + chunk_idx = keeper_key
       |    THEN n_chunk_chars ELSE 0 END) AS BIGINT) AS chars_kept
       |FROM ch JOIN k USING (chunk_hash)
       |GROUP BY doc_id ORDER BY doc_id""".stripMargin
  }

  /** w-gram comprehension over `toks` for arbitrary width (mirror of
    * shinglesOfTokens without the distinct).
    */
  private def gramsList(n: Int): String =
    s"[array_to_string(toks[i:i+${n - 1}],' ') for i in range(1, len(toks)-${n - 2})]"

  /** Train-vs-eval n-gram contamination (mirror of Dedup.decontaminate
    * over the sample_split train/test splits; n-grams joined as 60-bit
    * hashes on both sides, per-doc-distinct strings hashed — never
    * re-deduped after hashing — exactly as the Spark side does).
    */
  val textDecontaminate: String = {
    val n = Dedup.DecontaminationN
    s"""WITH sp AS (SELECT doc_id, text,
       |  ${hex64("'split|'||CAST(doc_id AS VARCHAR)")} % 10000 AS bucket FROM documents),
       |tr AS (SELECT doc_id, $Toks AS toks FROM sp WHERE bucket < 9000),
       |ev AS (SELECT doc_id, $Toks AS toks FROM sp WHERE bucket >= 9500),
       |trs AS (SELECT doc_id, ${hex64("'dc|'||g")} AS g FROM (
       |  SELECT doc_id, unnest(list_distinct(${gramsList(n)})) AS g FROM tr)),
       |evs AS (SELECT DISTINCT ${hex64("'dc|'||g")} AS g FROM (
       |  SELECT unnest(${gramsList(n)}) AS g FROM ev)),
       |hits AS (SELECT doc_id, count(*) AS n_contaminated
       |  FROM trs JOIN evs USING (g) GROUP BY doc_id),
       |pd AS (SELECT doc_id,
       |  len(list_distinct(${gramsList(n)}))::BIGINT AS n_shingles FROM tr)
       |SELECT pd.doc_id, n_shingles,
       |  coalesce(n_contaminated, 0) AS n_contaminated,
       |  coalesce(n_contaminated, 0) > 0 AS contaminated
       |FROM pd LEFT JOIN hits ON pd.doc_id = hits.doc_id
       |ORDER BY pd.doc_id""".stripMargin
  }

  /** Fuzzy decontamination (mirror of Dedup.decontaminateFuzzy over
    * the assignSplits train/test sides, minJaccard 0.5): the
    * dedupIncremental chain with the split hash gate selecting the two
    * sides — train docs as the batch, eval docs as the corpus.
    */
  val textDecontaminateFuzzy: String =
    s"""$ShHashCte,
       |mh AS (SELECT doc_id,
       |$minhashCols
       |FROM shh GROUP BY doc_id),
       |bands AS (
       |$bandSelects),
       |sp AS (SELECT doc_id,
       |  ${hex64("'split|'||CAST(doc_id AS VARCHAR)")} % 10000 AS bucket
       |  FROM documents),
       |tr AS (SELECT doc_id FROM sp WHERE bucket < 9000),
       |ev AS (SELECT doc_id FROM sp WHERE bucket >= 9500),
       |cand AS (SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
       |  FROM bands x JOIN bands y ON x.band = y.band AND x.bh = y.bh
       |  JOIN tr ON tr.doc_id = x.doc_id
       |  JOIN ev ON ev.doc_id = y.doc_id),
       |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
       |inter AS (SELECT c.a, c.b, count(*) AS n_int FROM cand c
       |  JOIN sh sa ON sa.doc_id = c.a
       |  JOIN sh sb ON sb.doc_id = c.b AND sb.s = sa.s
       |  GROUP BY c.a, c.b),
       |ver AS (SELECT i.a, i.b,
       |  i.n_int / (za.n + zb.n - i.n_int) AS jaccard
       |  FROM inter i
       |  JOIN sizes za ON za.doc_id = i.a
       |  JOIN sizes zb ON zb.doc_id = i.b
       |  WHERE i.n_int / (za.n + zb.n - i.n_int) >= 0.5),
       |near AS (SELECT a AS doc_id, b AS best_match, jaccard AS best_jaccard
       |  FROM (SELECT a, b, jaccard,
       |    row_number() OVER (PARTITION BY a ORDER BY jaccard DESC, b) AS rn FROM ver)
       |  WHERE rn = 1),
       |fp AS (SELECT doc_id, ${hex64("array_to_string(toks,' ')")} AS fingerprint FROM t),
       |ex AS (SELECT DISTINCT bf.doc_id FROM fp bf
       |  JOIN fp cf ON bf.fingerprint = cf.fingerprint
       |  JOIN tr ON tr.doc_id = bf.doc_id
       |  JOIN ev ON ev.doc_id = cf.doc_id)
       |SELECT tr.doc_id,
       |  ex.doc_id IS NOT NULL AS exact_contaminated,
       |  near.best_match IS NOT NULL AS near_contaminated,
       |  near.best_match, near.best_jaccard,
       |  NOT (ex.doc_id IS NOT NULL OR near.best_match IS NOT NULL) AS keep
       |FROM tr
       |LEFT JOIN ex ON ex.doc_id = tr.doc_id
       |LEFT JOIN near ON near.doc_id = tr.doc_id
       |ORDER BY tr.doc_id""".stripMargin

  /** Shared CTE for the ExactSubstr-style span pair: positional
    * n-grams → 60-bit hashes → corpus-wide duplicate set (count > 1,
    * same-doc repeats included) → per-doc sorted duplicate-window
    * starts. Mirrors Dedup.dupGramStarts (1-based positions here,
    * 0-based in Spark — only gaps and window membership matter, and
    * both are base-invariant within each engine).
    */
  private def dupStartsCte(n: Int): String =
    s"""WITH t AS (SELECT doc_id, $Toks AS toks FROM documents),
       |ps AS (SELECT doc_id, unnest([{'p': i, 's': array_to_string(toks[i:i+${n - 1}],' ')}
       |  for i in range(1, len(toks)-${n - 2})]) AS u FROM t),
       |h AS (SELECT doc_id, u.p AS pos, ${hex64("'ds|'||u.s")} AS g FROM ps),
       |d AS (SELECT g FROM h GROUP BY g HAVING count(*) > 1),
       |a AS (SELECT doc_id, count(*)::BIGINT AS n_dup_grams,
       |  list_sort(list(pos)) AS starts
       |  FROM h WHERE g IN (SELECT g FROM d) GROUP BY doc_id)""".stripMargin

  /** Duplicated-span accounting (mirror of Dedup.dupSpans, n = 10):
    * window-union coverage = n + Σ min(n, gap) over sorted starts.
    */
  val textDupSpans: String = {
    val n = Dedup.DupSpanN
    s"""${dupStartsCte(n)},
       |c AS (SELECT doc_id, n_dup_grams,
       |  ($n + coalesce(list_aggregate(
       |    [least($n, starts[i+1]-starts[i]) for i in range(1, len(starts))],
       |    'sum'), 0))::BIGINT AS dup_tokens FROM a),
       |b AS (SELECT doc_id, len(toks)::BIGINT AS n_tokens FROM t)
       |SELECT b.doc_id, n_tokens,
       |  coalesce(n_dup_grams, 0) AS n_dup_grams,
       |  coalesce(dup_tokens, 0) AS dup_tokens,
       |  CASE WHEN n_tokens > 0 THEN coalesce(dup_tokens, 0) / n_tokens
       |       ELSE 0.0 END AS dup_fraction
       |FROM b LEFT JOIN c USING (doc_id) ORDER BY b.doc_id""".stripMargin
  }

  /** Span removal (mirror of Dedup.removeDupSpans): drop every token
    * inside a duplicated n-window, rejoin with single spaces.
    * array_to_string of an empty list is NULL in DuckDB → coalesce ''.
    */
  val textDedupSubstrings: String = {
    val n = Dedup.DupSpanN
    s"""${dupStartsCte(n)}
       |SELECT doc_id, len(toks)::BIGINT AS n_tokens,
       |  len(kept)::BIGINT AS n_kept,
       |  coalesce(array_to_string(kept, ' '), '') AS clean_text
       |FROM (SELECT t.doc_id, toks,
       |  CASE WHEN starts IS NULL THEN toks
       |       ELSE [toks[i] for i in range(1, len(toks)+1)
       |             if len(list_filter(starts, s -> i >= s AND i < s + $n)) = 0]
       |  END AS kept FROM t LEFT JOIN a USING (doc_id))
       |ORDER BY doc_id""".stripMargin
  }

  /** Offset-based sequence packing (mirror of Packing.packSequences). */
  val seqPack: String = {
    val b = graft.ops.Packing.DefaultBudget
    s"""WITH t AS (SELECT doc_id, source, len($Toks)::BIGINT AS n_tokens FROM documents),
       |c AS (SELECT doc_id, source, n_tokens,
       |  CAST(coalesce(sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cum_before
       |  FROM t)
       |SELECT doc_id, source, n_tokens,
       |  cum_before // $b AS bin_id,
       |  cum_before % $b AS bin_offset
       |FROM c ORDER BY source, doc_id""".stripMargin
  }

  /** Deterministic epoch shuffle (mirror of Sampling.shuffleShards,
    * nShards=16, salt "epoch0").
    */
  val corpusShuffle: String =
    s"""SELECT doc_id,
       |  ${hex64("'epoch0|'||CAST(doc_id AS VARCHAR)")} AS shuffle_key,
       |  ${hex64("'epoch0|'||CAST(doc_id AS VARCHAR)")} % 16 AS shard
       |FROM documents
       |ORDER BY shard, shuffle_key, doc_id""".stripMargin

  /** Temperature source rebalancing (mirror of
    * Sampling.temperatureSample, α = 0.5, targetFrac = 0.5: √ and the
    * division chain are single IEEE ops in an identical order, Σ√n is
    * the same in-order window sum).
    */
  val sampleTemperature: String =
    s"""WITH c AS (SELECT source, count(*) AS n_docs FROM documents GROUP BY source),
       |r AS (SELECT source, n_docs, sqrt(n_docs) AS weight,
       |  sum(sqrt(n_docs)) OVER (ORDER BY source
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS big_w,
       |  CAST(sum(n_docs) OVER (ORDER BY source
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS BIGINT) AS big_n
       |  FROM c),
       |th AS (SELECT source, n_docs,
       |  least(1.0, 0.5 * big_n * (weight / big_w) / n_docs) AS rate,
       |  CAST(floor(least(1.0, 0.5 * big_n * (weight / big_w) / n_docs) * 10000) AS BIGINT) AS threshold
       |  FROM r),
       |k AS (SELECT d.source, count(*) AS n_kept
       |  FROM documents d JOIN th ON d.source = th.source
       |  WHERE ${hex64("'temp|'||CAST(doc_id AS VARCHAR)")} % 10000 < threshold
       |  GROUP BY d.source)
       |SELECT th.source, n_docs, rate, threshold, coalesce(n_kept, 0) AS n_kept
       |FROM th LEFT JOIN k ON th.source = k.source
       |ORDER BY th.source""".stripMargin

  /** Language-balanced sampling (mirror of Sampling.languageBalance
    * over the marker-tail planting): the shared langid chain predicts
    * per-doc language, √n temperature rates at the languages grain,
    * hex64 membership gate — the sampleTemperature arithmetic with
    * pred_lang as the group.
    */
  val sampleLanguageBalance: String = {
    val scoreCols = TextAnalysis.langMarkers
      .map { case (l, ws) => s"  ${hits(ws)} AS s_$l" }.mkString(",\n")
    val names = TextAnalysis.langMarkers.map(_._1)
    val caseChain = names.init.zipWithIndex.map { case (l, i) =>
      val rest = names.drop(i + 1).map(l2 => s"s_$l >= s_$l2").mkString(" AND ")
      s"WHEN $rest THEN '$l'"
    }.mkString(" ")
    val tails = TextAnalysis.langMarkers.take(3).map { case (_, ws) =>
      Seq.fill(12)(ws.take(5)).flatten.mkString(" ") }
    val tailCase = tails.zipWithIndex
      .map { case (tl, i) => s"WHEN ${i + 1} THEN text || ' ' || ${slit(tl)}" }
      .mkString(" ")
    s"""WITH docs2 AS (SELECT doc_id,
       |  CASE doc_id % 4 $tailCase ELSE text END AS text FROM documents),
       |t AS (SELECT doc_id, ${toksOf("text")} AS toks FROM docs2),
       |s AS (SELECT doc_id,
       |$scoreCols
       |FROM t),
       |pl AS (SELECT doc_id,
       |  CASE WHEN ${names.map(l => s"s_$l").mkString(" + ")} = 0 THEN 'und'
       |  $caseChain ELSE '${names.last}' END AS pred_lang FROM s),
       |c AS (SELECT pred_lang, count(*) AS n_docs FROM pl GROUP BY 1),
       |r AS (SELECT pred_lang, n_docs, sqrt(n_docs) AS weight,
       |  sum(sqrt(n_docs)) OVER (ORDER BY pred_lang
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS big_w,
       |  CAST(sum(n_docs) OVER (ORDER BY pred_lang
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS BIGINT) AS big_n
       |  FROM c),
       |th AS (SELECT pred_lang, n_docs,
       |  least(1.0, 0.5 * big_n * (weight / big_w) / n_docs) AS rate,
       |  CAST(floor(least(1.0, 0.5 * big_n * (weight / big_w) / n_docs) * 10000)
       |    AS BIGINT) AS threshold
       |  FROM r),
       |k AS (SELECT pl.pred_lang, count(*) AS n_kept
       |  FROM pl JOIN th ON pl.pred_lang = th.pred_lang
       |  WHERE ${hex64("'langbal|'||CAST(doc_id AS VARCHAR)")} % 10000 < threshold
       |  GROUP BY 1)
       |SELECT th.pred_lang, n_docs, rate, threshold,
       |  coalesce(n_kept, 0) AS n_kept
       |FROM th LEFT JOIN k ON th.pred_lang = k.pred_lang
       |ORDER BY th.pred_lang""".stripMargin
  }

  /** Epoch-based domain mixing (mirror of Sampling.epochMix with the
    * default harmonic weights, scale=1): the per-source coefficients
    * are the SAME Scala-computed doubles the Spark plan embeds
    * (string→double cast is correctly rounded, so the epochs division
    * chain `coef·N/n` is bit-identical), big_n is an integer sum, and
    * copy membership is the portable hex64 gate.
    */
  val sampleEpochMix: String = {
    val values = graft.ops.Sampling
      .mixCoefs(graft.ops.Sampling.defaultMixWeights, 1.0)
      .map { case (s, c) => s"('$s', CAST('$c' AS DOUBLE))" }
      .mkString(",\n       ")
    s"""WITH c AS (SELECT source, count(*) AS n_docs FROM documents GROUP BY source),
       |w(source, coef) AS (VALUES $values),
       |r AS (SELECT source, n_docs,
       |  CAST(sum(n_docs) OVER (ORDER BY source
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS BIGINT) AS big_n
       |  FROM c),
       |e AS (SELECT r.source, n_docs, coef * big_n / n_docs AS epochs
       |  FROM r JOIN w ON r.source = w.source),
       |t AS (SELECT source, CAST(floor(epochs) AS BIGINT) AS full_copies,
       |  CAST(floor((epochs - CAST(floor(epochs) AS BIGINT)) * 10000) AS BIGINT) AS threshold
       |  FROM e),
       |k AS (SELECT d.doc_id, d.source,
       |  full_copies + CASE WHEN ${hex64("'mix|'||CAST(doc_id AS VARCHAR)")} % 10000 < threshold
       |    THEN 1 ELSE 0 END AS copies
       |  FROM documents d JOIN t ON d.source = t.source)
       |SELECT doc_id, source, CAST(unnest(generate_series(1, copies)) AS BIGINT) AS epoch
       |FROM k WHERE copies >= 1 ORDER BY doc_id, epoch""".stripMargin
  }

  /** Top event-type paths (mirror of EventOps.topPaths, len=3, k=20). */
  val eventsTopPaths: String =
    s"""WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS us, event_type
       |  FROM events WHERE epoch_us(ts) IS NOT NULL),
       |p AS (SELECT event_type AS s0,
       |  lead(event_type, 1) OVER w AS s1,
       |  lead(event_type, 2) OVER w AS s2
       |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
       |g AS (SELECT s0 || '>' || s1 || '>' || s2 AS path, count(*) AS n_occurrences
       |  FROM p WHERE s2 IS NOT NULL GROUP BY 1)
       |SELECT path, n_occurrences, rank FROM (
       |  SELECT path, n_occurrences,
       |    row_number() OVER (ORDER BY n_occurrences DESC, path) AS rank FROM g)
       |WHERE rank <= 20 ORDER BY rank""".stripMargin

  /** Per-type z-score anomalies (mirror of EventOps.valueAnomalies:
    * decimal moment sums, mirrored single-step double arithmetic).
    */
  val eventsAnomaly: String =
    s"""WITH s AS (SELECT event_type, count(*) AS n,
       |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_v,
       |  CAST(sum(CAST(value AS DECIMAL(18,2)) * CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_sq
       |  FROM events GROUP BY event_type),
       |m1 AS (SELECT event_type, sum_v / n AS mean_v, sum_sq / n AS m2 FROM s),
       |m AS (SELECT event_type, mean_v, sqrt(m2 - mean_v * mean_v) AS std_v FROM m1),
       |z AS (SELECT e.event_type, e.event_id,
       |  CAST(CAST(e.value AS DECIMAL(18,2)) AS DOUBLE) AS value_2dp,
       |  (CAST(CAST(e.value AS DECIMAL(18,2)) AS DOUBLE) - mean_v) / std_v AS z
       |  FROM events e JOIN m ON m.event_type = e.event_type)
       |SELECT event_type, event_id, value_2dp, z FROM z
       |WHERE abs(z) > 3.0
       |ORDER BY event_id""".stripMargin

  /** Cohort retention (mirror of EventOps.retention). */
  val eventsRetention: String =
    s"""WITH e AS (SELECT user_id, epoch_us(ts) // 86400000000 AS day
       |  FROM events WHERE epoch_us(ts) IS NOT NULL),
       |c AS (SELECT user_id, min(day) AS cohort_day FROM e GROUP BY user_id)
       |SELECT cohort_day, day - cohort_day AS day_offset,
       |  count(DISTINCT e.user_id) AS n_users
       |FROM e JOIN c ON e.user_id = c.user_id
       |WHERE day - cohort_day <= 30
       |GROUP BY 1, 2
       |ORDER BY cohort_day, day_offset""".stripMargin

  /** Frame sampling (mirror of Binary.frameSample, 100-byte frames,
    * step 4): the byte slice is mirrored as a hex-string slice —
    * hex(substr(bytes, a, n)) ≡ substr(hex(bytes), 2a+1, 2n).
    */
  val mmFrameSample: String =
    s"""WITH m AS (SELECT doc_id, hex(text::BLOB) AS ph,
       |  octet_length(text::BLOB)::BIGINT AS n_bytes FROM documents),
       |f AS (SELECT doc_id, ph, (n_bytes + 99) // 100 AS n_frames FROM m
       |  WHERE n_bytes > 0),
       |i AS (SELECT doc_id, ph, n_frames,
       |  unnest(range(0, n_frames, 4))::BIGINT AS frame_idx FROM f)
       |SELECT doc_id, frame_idx, n_frames,
       |  substr(ph, (frame_idx * 100) * 2 + 1, 200) AS frame_hex
       |FROM i ORDER BY doc_id, frame_idx""".stripMargin

  /** Pre-decode media SimHash (mirror of Binary.simFingerprint,
    * frameBytes=100, step=4): the frame-sample CTE feeding the
    * bit-vote fingerprint, plus the exact-dup group ledger.
    */
  val mmSimFingerprint: String = {
    val bitSums = (0 until Dedup.SimhashBits)
      .map(b => s"  sum(CASE WHEN ((h >> $b) & 1) = 1 THEN 1 ELSE -1 END) AS s$b")
      .mkString(",\n")
    val combine = (0 until Dedup.SimhashBits)
      .map(b => s"CASE WHEN s$b > 0 THEN (1::BIGINT << $b) ELSE 0 END")
      .mkString(" + ")
    s"""WITH m AS (SELECT doc_id, hex(text::BLOB) AS ph,
       |  octet_length(text::BLOB)::BIGINT AS n_bytes FROM documents),
       |f AS (SELECT doc_id, ph, (n_bytes + 99) // 100 AS n_frames FROM m
       |  WHERE n_bytes > 0),
       |i AS (SELECT doc_id, ph, n_frames,
       |  unnest(range(0, n_frames, 4))::BIGINT AS frame_idx FROM f),
       |fr AS (SELECT doc_id, substr(ph, (frame_idx * 100) * 2 + 1, 200) AS frame_hex
       |  FROM i),
       |h AS (SELECT doc_id, ${hex64("'mm|'||frame_hex")} AS h FROM fr),
       |bits AS (SELECT doc_id, count(*)::BIGINT AS n_frames_sampled,
       |$bitSums
       |FROM h GROUP BY doc_id),
       |sim AS (SELECT doc_id, n_frames_sampled,
       |  ($combine)::BIGINT AS sim_fingerprint FROM bits),
       |g AS (SELECT sim_fingerprint, count(*)::BIGINT AS group_size,
       |  min(doc_id) AS min_id FROM sim GROUP BY 1)
       |SELECT s.doc_id, s.n_frames_sampled, s.sim_fingerprint, g.group_size,
       |  s.doc_id = g.min_id AS keep
       |FROM sim s JOIN g ON s.sim_fingerprint = g.sim_fingerprint
       |ORDER BY s.doc_id""".stripMargin
  }

  /** Consecutive-day streaks (mirror of EventOps.streaks). */
  val eventsStreaks: String =
    s"""WITH d AS (SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day
       |  FROM events WHERE epoch_us(ts) IS NOT NULL),
       |r AS (SELECT user_id, day,
       |  row_number() OVER (PARTITION BY user_id ORDER BY day) AS rn FROM d),
       |s AS (SELECT user_id, day - rn AS grp, count(*)::BIGINT AS len
       |  FROM r GROUP BY 1, 2)
       |SELECT user_id, sum(len)::BIGINT AS n_active_days,
       |  count(*)::BIGINT AS n_streaks, max(len)::BIGINT AS longest_streak
       |FROM s GROUP BY user_id ORDER BY user_id""".stripMargin

  /** JSON props extraction + aggregation (mirror of EventOps.propsAgg). */
  val eventsPropsAgg: String =
    s"""SELECT event_type,
       |  json_extract_string(props, '$$.k')::BIGINT // 10 AS k_band,
       |  count(*) AS n_events,
       |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
       |FROM events
       |GROUP BY 1, 2
       |ORDER BY event_type, k_band""".stripMargin

  /** Ordered funnel view→click→purchase (mirror of EventOps.funnel). */
  val eventsFunnel: String =
    s"""WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS us
       |  FROM events WHERE epoch_us(ts) IS NOT NULL),
       |s1 AS (SELECT user_id, min(us) AS step1_us FROM e
       |  WHERE event_type = 'view' GROUP BY user_id),
       |s2 AS (SELECT e.user_id, min(us) AS step2_us FROM e
       |  JOIN s1 ON e.user_id = s1.user_id
       |  WHERE event_type = 'click' AND us >= step1_us GROUP BY e.user_id),
       |s3 AS (SELECT e.user_id, min(us) AS step3_us FROM e
       |  JOIN s2 ON e.user_id = s2.user_id
       |  WHERE event_type = 'purchase' AND us >= step2_us GROUP BY e.user_id)
       |SELECT s1.user_id, step1_us, step2_us, step3_us,
       |  CAST(CASE WHEN step3_us IS NOT NULL THEN 3
       |            WHEN step2_us IS NOT NULL THEN 2 ELSE 1 END AS BIGINT) AS stage
       |FROM s1
       |LEFT JOIN s2 ON s1.user_id = s2.user_id
       |LEFT JOIN s3 ON s1.user_id = s3.user_id
       |ORDER BY s1.user_id""".stripMargin

  /** ROLLUP corpus stats (mirror of TextAnalysis.corpusRollup;
    * DuckDB GROUPING ≡ Spark grouping_id bitmask).
    */
  val corpusRollup: String =
    s"""WITH t AS (SELECT source, lang, len($Toks)::BIGINT AS n_tokens, n_chars
       |  FROM documents)
       |SELECT source, lang, GROUPING(source, lang)::BIGINT AS gid,
       |  count(*) AS n_docs,
       |  CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
       |  CAST(sum(n_chars) AS BIGINT) AS total_chars
       |FROM t GROUP BY ROLLUP(source, lang)
       |ORDER BY gid, source, lang""".stripMargin

  /** Deterministic hash split (mirror of Sampling.assignSplits over
    * doc_id, 90/5/5 at granularity 10000).
    */
  /** Weighted sample without replacement (mirror of
    * Sampling.weightedSample, weight = length(text)+1, k=100): the
    * A-Res key `ln(u)/w` with u an exact power-of-two-rational hash
    * uniform and ln through [[detLn]] — membership bit-exact.
    */
  val sampleWeighted: String = {
    val m = 1L << 40
    val base =
      s"""SELECT doc_id AS id, (length(text) + 1)::DOUBLE AS weight,
         |  ((${hex64("'ws|'||CAST(doc_id AS VARCHAR)")} % $m)::DOUBLE + 5.0e-1)
         |    / ${dlit(m.toDouble)} AS u
         |FROM documents""".stripMargin
    detLn(base, "id, weight, u", "u", "__lnu", "ws") match { case wrapped =>
      s"""SELECT id, weight, u, __lnu / weight AS es_key
         |FROM ($wrapped) __esk
         |ORDER BY es_key DESC, id LIMIT 100""".stripMargin
    }
  }

  val sampleSplit: String =
    s"""SELECT doc_id, source, lang,
       |  ${hex64("'split|'||CAST(doc_id AS VARCHAR)")} % 10000 AS bucket,
       |  CASE WHEN ${hex64("'split|'||CAST(doc_id AS VARCHAR)")} % 10000 < 9000 THEN 'train'
       |       WHEN ${hex64("'split|'||CAST(doc_id AS VARCHAR)")} % 10000 < 9500 THEN 'val'
       |       ELSE 'test' END AS split
       |FROM documents ORDER BY doc_id""".stripMargin

  /** Leakage-safe grouped splits (mirror of assignSplits keyed on the
    * registered DOMAIN over synth URLs): every page of a domain lands
    * in the same split, so near-duplicate pages of one site cannot
    * straddle train/test.
    */
  lazy val sampleSplitGrouped: String = {
    val h = hex64("'split|'||domain")
    s"""WITH u AS ($UrlSynth),
       |p AS (SELECT doc_id, $UrlHost AS host FROM u),
       |d AS (SELECT doc_id,
       |  regexp_extract(host, '([^.]+\\.[^.]+)$$', 1) AS domain FROM p)
       |SELECT doc_id, domain, $h % 10000 AS bucket,
       |  CASE WHEN $h % 10000 < 9000 THEN 'train'
       |       WHEN $h % 10000 < 9500 THEN 'val'
       |       ELSE 'test' END AS split
       |FROM d ORDER BY doc_id""".stripMargin
  }

  /** Embedding-corpus health (mirror of the vec_quality wiring): NaN
    * dimension counts, zero dimensions, the vec_norm L2 chain, and a
    * keep flag — the operational gate in front of every ANN build
    * (one broken producer writes NaN vectors and every cosine
    * downstream turns NaN).
    */
  val vecQuality: String =
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |n AS (SELECT vec_id,
       |  len(list_filter(v, x -> isnan(x)))::BIGINT AS n_nan,
       |  len(list_filter(v, x -> x = 0))::BIGINT AS n_zero_dims,
       |  sqrt(list_aggregate(list_transform(v, x -> x * x), 'sum')) AS l2norm
       |  FROM e)
       |SELECT vec_id, n_nan, n_zero_dims, l2norm,
       |  (n_nan = 0 AND NOT isnan(l2norm) AND l2norm > 0) AS keep
       |FROM n ORDER BY vec_id""".stripMargin

  val vecNorm: String =
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |n AS (SELECT vec_id, v,
       |  sqrt(list_aggregate(list_transform(v, x -> x * x), 'sum')) AS norm FROM e)
       |SELECT vec_id, norm,
       |  CASE WHEN norm > 0 THEN v[1] / norm END AS e0_unit
       |FROM n ORDER BY vec_id""".stripMargin

  /** Tumbling 1h windows are epoch-aligned in both engines. */
  val streamWindowedAgg: String =
    s"""SELECT (epoch_us(ts) // 3600000000) * 3600000000 AS start_us, event_type,
       |  count(*) AS n_events,
       |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
       |FROM events GROUP BY 1, 2
       |ORDER BY start_us, event_type""".stripMargin

  /** Which doc survives streaming dropDuplicates is arrival-order
    * dependent; the distinct fingerprint set is the deterministic
    * output compared here.
    */
  val streamDedup: String =
    s"""WITH t AS (SELECT doc_id, $Toks AS toks FROM documents)
       |SELECT DISTINCT ${hex64("array_to_string(toks,' ')")} AS fingerprint
       |FROM t ORDER BY fingerprint""".stripMargin

  val mmBinaryMeta: String =
    s"""SELECT doc_id, 'text/plain' AS media_type,
       |  octet_length(text::BLOB)::BIGINT AS n_bytes,
       |  ${hex64("text")} AS content_hash
       |FROM documents ORDER BY doc_id""".stripMargin

  /** Mirror of `Wav.synthFromDocs` ∘ `Wav.parse`: every header field
    * is re-derived from the doc_id arithmetic the synthesizer used —
    * the oracle never touches bytes, so a hash match proves the Spark
    * parser recovered the fields from the actual LE byte layout.
    * Integer-only arithmetic (`//` vs Spark `div`: both floor on this
    * nonnegative domain).
    */
  val mmWavMeta: String =
    """WITH m AS (SELECT doc_id,
      |  1 + doc_id % 2 AS ch,
      |  8000 + (doc_id % 5) * 4000 AS rate,
      |  CASE WHEN doc_id % 3 = 0 THEN 8 ELSE 16 END AS bits,
      |  LEAST(octet_length(text::BLOB), 400) AS dlen,
      |  doc_id % 10 = 0 AS invalid
      |  FROM documents),
      |p AS (SELECT *, (ch * bits) // 8 AS ba, rate * ((ch * bits) // 8) AS br
      |  FROM m)
      |SELECT doc_id,
      |  CASE WHEN invalid THEN 'text/plain' ELSE 'audio/wav' END AS media_type,
      |  NOT invalid AS wav_valid,
      |  (CASE WHEN invalid THEN NULL ELSE ch END)::BIGINT AS channels,
      |  (CASE WHEN invalid THEN NULL ELSE rate END)::BIGINT AS sample_rate,
      |  (CASE WHEN invalid THEN NULL ELSE br END)::BIGINT AS byte_rate,
      |  (CASE WHEN invalid THEN NULL ELSE ba END)::BIGINT AS block_align,
      |  (CASE WHEN invalid THEN NULL ELSE bits END)::BIGINT AS bits_per_sample,
      |  (CASE WHEN invalid THEN NULL ELSE dlen END)::BIGINT AS data_bytes,
      |  (CASE WHEN invalid THEN NULL ELSE (dlen * 1000) // br END)::BIGINT AS duration_ms,
      |  CASE WHEN invalid THEN NULL ELSE TRUE END AS header_consistent
      |FROM p ORDER BY doc_id""".stripMargin

  /** Mirror of `Wav.synthFromDocs` ∘ `Wav.sampleStats`: the data chunk
    * is the first ≤400 TEXT bytes, so the oracle recomputes every
    * sample from the characters directly (ASCII corpus: char = byte)
    * while Spark decodes the actual payload bytes — a hash match
    * proves the byte-level PCM decode. Integer sums exactly, two IEEE
    * ops (√, ÷) at the end.
    */
  val mmWavSamples: String =
    """WITH m AS (SELECT doc_id, text,
      |  CASE WHEN doc_id % 3 = 0 THEN 8 ELSE 16 END AS bits,
      |  LEAST(octet_length(text::BLOB), 400) AS dlen,
      |  doc_id % 10 = 0 AS invalid
      |  FROM documents),
      |n AS (SELECT *, (CASE WHEN bits = 8 THEN dlen ELSE dlen // 2 END) AS ns FROM m),
      |s AS (SELECT doc_id, bits, invalid, ns,
      |  CASE WHEN invalid OR ns = 0 THEN NULL ELSE
      |    list_transform(range(ns), i ->
      |      CASE WHEN bits = 8 THEN ascii(substr(text, (i + 1)::INT, 1)) - 128
      |      ELSE (CASE WHEN ascii(substr(text, (2 * i + 2)::INT, 1)) * 256
      |          + ascii(substr(text, (2 * i + 1)::INT, 1)) >= 32768
      |        THEN ascii(substr(text, (2 * i + 2)::INT, 1)) * 256
      |          + ascii(substr(text, (2 * i + 1)::INT, 1)) - 65536
      |        ELSE ascii(substr(text, (2 * i + 2)::INT, 1)) * 256
      |          + ascii(substr(text, (2 * i + 1)::INT, 1)) END)
      |      END)
      |  END AS samples FROM n)
      |SELECT doc_id, NOT invalid AS wav_valid,
      |  (CASE WHEN invalid THEN NULL ELSE bits END)::BIGINT AS bits_per_sample,
      |  (CASE WHEN samples IS NULL THEN NULL ELSE ns END)::BIGINT AS n_samples,
      |  CASE WHEN samples IS NULL THEN NULL
      |    ELSE sqrt(list_sum(list_transform(samples, v -> v * v))::DOUBLE / ns)
      |  END AS rms,
      |  (CASE WHEN samples IS NULL THEN NULL
      |    ELSE list_max(list_transform(samples, v -> abs(v))) END)::BIGINT AS peak_abs,
      |  (CASE WHEN samples IS NULL THEN NULL
      |    ELSE len(list_filter(samples, v -> abs(v) >=
      |      (CASE WHEN bits = 8 THEN 127 ELSE 32767 END))) END)::BIGINT AS n_clipped,
      |  CASE WHEN samples IS NULL THEN NULL
      |    ELSE list_sum(samples)::DOUBLE / ns END AS dc_mean
      |FROM s ORDER BY doc_id""".stripMargin

  /** Mirror of `Bmp.synthFromDocs` ∘ `Bmp.pixelStats`: pixel bytes are
    * the first imgSz TEXT bytes zero-padded, so the oracle recomputes
    * each channel byte from the characters (ASCII corpus) with the
    * same stride walk Spark performs on the payload bytes — a hash
    * match proves the stride-aware 24-bpp decode. Stats only for the
    * valid 24-bpp members (d%3=1, not every-10th-invalid).
    */
  val mmBmpPixels: String =
    """WITH m AS (SELECT doc_id, text,
      |  10 + doc_id % 13 AS w, 5 + doc_id % 9 AS ht,
      |  CASE (doc_id % 3) WHEN 0 THEN 16 WHEN 1 THEN 24 ELSE 32 END AS bpp,
      |  doc_id % 10 = 0 AS invalid
      |  FROM documents),
      |g AS (SELECT *, ((w * bpp + 31) // 32) * 4 AS stride FROM m),
      |s AS (SELECT *, stride * ht AS imgsz,
      |  LEAST(octet_length(text::BLOB), stride * ht) AS tlen,
      |  (NOT invalid AND bpp = 24) AS ok FROM g),
      |px AS (SELECT doc_id, invalid, ok, w, ht, tlen, stride, text,
      |  CASE WHEN ok AND w * ht > 0 THEN w * ht ELSE NULL END AS npx FROM s)
      |SELECT doc_id, NOT invalid AS bmp_valid,
      |  npx::BIGINT AS pixels_decoded,
      |  CASE WHEN npx IS NULL THEN NULL ELSE
      |    list_sum(list_transform(range(w * ht), i ->
      |      CASE WHEN (i // w) * stride + (i % w) * 3 + 0 < tlen
      |        THEN ascii(substr(text, ((i // w) * stride + (i % w) * 3 + 1)::INT, 1))
      |        ELSE 0 END))::DOUBLE / npx END AS mean_b,
      |  CASE WHEN npx IS NULL THEN NULL ELSE
      |    list_sum(list_transform(range(w * ht), i ->
      |      CASE WHEN (i // w) * stride + (i % w) * 3 + 1 < tlen
      |        THEN ascii(substr(text, ((i // w) * stride + (i % w) * 3 + 2)::INT, 1))
      |        ELSE 0 END))::DOUBLE / npx END AS mean_g,
      |  CASE WHEN npx IS NULL THEN NULL ELSE
      |    list_sum(list_transform(range(w * ht), i ->
      |      CASE WHEN (i // w) * stride + (i % w) * 3 + 2 < tlen
      |        THEN ascii(substr(text, ((i // w) * stride + (i % w) * 3 + 3)::INT, 1))
      |        ELSE 0 END))::DOUBLE / npx END AS mean_r,
      |  (CASE WHEN npx IS NULL THEN NULL ELSE
      |    list_max(list_transform(range(w * ht * 3), i ->
      |      CASE WHEN ((i // 3) // w) * stride + ((i // 3) % w) * 3 + (i % 3) < tlen
      |        THEN ascii(substr(text,
      |          (((i // 3) // w) * stride + ((i // 3) % w) * 3 + (i % 3) + 1)::INT, 1))
      |        ELSE 0 END)) END)::BIGINT AS peak_byte
      |FROM px ORDER BY doc_id""".stripMargin

  /** Mirror of `PngPixels.synthFromDocs` ∘ `PngPixels.pixelStats`:
    * the raster is the first 3wh TEXT bytes zero-padded, so the
    * oracle recomputes channel stats from the characters while Spark
    * INFLATES the real zlib IDAT and walks filter-byte-prefixed
    * scanlines — a hash match proves the compressed decode
    * end-to-end (deflate at synth, inflate at read, filter strip).
    */
  val mmPngPixels: String =
    """WITH m AS (SELECT doc_id, text,
      |  4 + doc_id % 5 AS w, 3 + doc_id % 4 AS ht,
      |  doc_id % 10 = 0 AS invalid FROM documents),
      |s AS (SELECT *, w * ht AS npx,
      |  LEAST(octet_length(text::BLOB), 3 * w * ht) AS tlen FROM m)
      |SELECT doc_id, NOT invalid AS png_valid,
      |  (CASE WHEN invalid THEN NULL ELSE npx END)::BIGINT AS pixels_decoded,
      |  CASE WHEN invalid THEN NULL ELSE
      |    list_sum(list_transform(range(npx), i ->
      |      CASE WHEN 3 * i + 0 < tlen
      |        THEN ascii(substr(text, (3 * i + 1)::INT, 1)) ELSE 0 END))::DOUBLE / npx
      |  END AS mean_r,
      |  CASE WHEN invalid THEN NULL ELSE
      |    list_sum(list_transform(range(npx), i ->
      |      CASE WHEN 3 * i + 1 < tlen
      |        THEN ascii(substr(text, (3 * i + 2)::INT, 1)) ELSE 0 END))::DOUBLE / npx
      |  END AS mean_g,
      |  CASE WHEN invalid THEN NULL ELSE
      |    list_sum(list_transform(range(npx), i ->
      |      CASE WHEN 3 * i + 2 < tlen
      |        THEN ascii(substr(text, (3 * i + 3)::INT, 1)) ELSE 0 END))::DOUBLE / npx
      |  END AS mean_b,
      |  (CASE WHEN invalid THEN NULL ELSE
      |    list_max(list_transform(range(npx * 3), i ->
      |      CASE WHEN i < tlen
      |        THEN ascii(substr(text, (i + 1)::INT, 1)) ELSE 0 END)) END)::BIGINT
      |    AS peak_byte
      |FROM s ORDER BY doc_id""".stripMargin

  /** Mirror of `Png.synthFromDocs` ∘ `Png.parse`: every IHDR field is
    * re-derived from the doc_id arithmetic the synthesizer used — the
    * oracle never touches bytes, so a hash match proves the Spark
    * parser recovered the fields from the actual BIG-endian layout,
    * and `ihdr_crc_ok = TRUE` corpus-wide proves the synthesized
    * CRC-32s round-trip through Spark's `crc32` check. DuckDB list
    * literals are 1-indexed like the Spark `element_at` calls they
    * mirror.
    */
  /** Shared closed-form TIFF geometry (mirror of TiffSynthKernel) —
    * used by both the mm_tiff_meta and mm_media_triage oracles.
    */
  private val tiffGeom: String =
    """16 + doc_id % 240 AS tw_, 8 + doc_id % 120 AS th_,
      |  CASE WHEN doc_id % 3 = 0 THEN 3 ELSE 1 END AS tspp,
      |  ([1, 5, 32773])[((doc_id // 2) % 3) + 1] AS tcomp,
      |  doc_id % 5 = 2 AS ttiles,
      |  1 + doc_id % 3 AS tns,
      |  doc_id % 4 = 0 AS ttwo""".stripMargin

  /** Mixed-container triage (mirror of the mm_media_triage wiring:
    * doc_id%23 picks WAV/PNG/JPEG/BMP/WebP/TIFF/MP3/FLAC/OGG/
    * MKV/Avro/Parquet/ORC/gzip/zstd/ICO/HEIF on lanes 1-17 and raw
    * text on 0/18-22 — the modulus is COPRIME with the synths' %10
    * corrupt lane, so every family contributes corrupt/text-fallback
    * members):
    * detection, sizes, and content units all re-derived from doc_id
    * arithmetic + text length — a hash match proves the Spark triage
    * detected containers from the actual bytes and routed each to
    * the right parser's field formulas. The JPEG byte total mirrors
    * Binary.Jpeg.synthFromDocs segment by segment: SOI(2) + APP0(18)
    * + COM1(4+c1) [+ COM2(4+c2) every third doc] + SOF(10+3·nc) +
    * SOS(8+2·nc) + data(8) + EOI(2); the BMP total is 54 + aligned
    * stride × height; the TIFF total mirrors TiffSynthKernel's
    * layout arithmetic entry for entry; the OGG total is page
    * arithmetic (27-byte headers + lacing counts + the codec-rotated
    * ID packet); the MKV total is EBML element arithmetic incl. the
    * 1-vs-2-byte size-varint break at 127 (both totals pinned
    * byte-exact by OggSpec/MkvSpec against the same closed forms).
    */
  val mmMediaTriage: String =
    s"""WITH m AS (SELECT doc_id,
      |  LEAST(octet_length(text::BLOB), 400) AS dlen,
      |  octet_length(text::BLOB) AS rawlen,
      |  LEAST(octet_length(text::BLOB), 5 + doc_id % 37) AS c1,
      |  CASE WHEN doc_id % 3 = 0
      |    THEN LEAST(GREATEST(octet_length(text::BLOB) - 5, 0), 3 + doc_id % 11)
      |    ELSE NULL END AS c2,
      |  CASE WHEN doc_id % 5 = 0 THEN 1 ELSE 3 END AS nc,
      |  doc_id % 23 AS cls, doc_id % 10 = 0 AS corrupt
      |  FROM documents),
      |w AS (SELECT *,
      |  (8000 + (doc_id % 5) * 4000) *
      |    ((1 + doc_id % 2) * (CASE WHEN doc_id % 3 = 0 THEN 8 ELSE 16 END) // 8) AS br,
      |  16 + (doc_id % 7) * 9 AS pw, 9 + (doc_id % 5) * 7 AS ph,
      |  120 + doc_id % 33 AS jh, 160 + doc_id % 21 AS jw,
      |  10 + doc_id % 13 AS bw, 5 + doc_id % 9 AS bh,
      |  ([16, 24, 32])[(doc_id % 3) + 1] AS bbpp,
      |  doc_id % 3 AS xfmt,
      |  CASE doc_id % 3 WHEN 0 THEN 3 + doc_id % 9
      |    WHEN 1 THEN 2 + doc_id % 300 ELSE 7 + doc_id % 70000 END AS xw,
      |  CASE doc_id % 3 WHEN 0 THEN 2 + doc_id % 7
      |    WHEN 1 THEN 1 + doc_id % 200 ELSE 5 + doc_id % 33000 END AS xh,
      |  $tiffGeom
      |  FROM m),
      |w2 AS (SELECT *, (((bw * bbpp + 31) // 32) * 4) * bh AS bimg,
      |  CASE WHEN ttiles
      |    THEN ((tw_ + 15) // 16) * ((th_ + 15) // 16) ELSE tns END AS tnu
      |  FROM w),
      |w3 AS (SELECT *,
      |  14 + 12 * (CASE WHEN ttiles THEN 10 ELSE 9 END) +
      |    (CASE WHEN tspp = 3 THEN 6 ELSE 0 END) +
      |    (CASE WHEN tnu > 1 THEN 8 * tnu ELSE 0 END) +
      |    (CASE WHEN ttwo THEN 30 ELSE 0 END) + 8 AS tlen
      |  FROM w2),
      |w4 AS (SELECT *,
      |  CASE WHEN doc_id % 2 = 0
      |    THEN ([44100, 48000, 32000])[(doc_id % 3) + 1]
      |    ELSE ([22050, 24000, 16000])[(doc_id % 3) + 1] END AS msr,
      |  CASE WHEN doc_id % 2 = 0
      |    THEN ([64, 80, 96])[(doc_id % 3) + 1]
      |    ELSE ([40, 48, 56])[(doc_id % 3) + 1] END AS mbr,
      |  CASE WHEN doc_id % 5 = 1 THEN 1 ELSE 0 END AS mpad,
      |  1 + doc_id % 6 AS mnf,
      |  CASE WHEN doc_id % 4 = 1 THEN 30 + doc_id % 30 ELSE 0 END AS mid3v2,
      |  CASE WHEN doc_id % 8 = 5 THEN 128 ELSE 0 END AS mid3v1,
      |  8000 + (doc_id % 5) * 4000 AS fsr,
      |  1000 + doc_id % 5000 AS ftot,
      |  CASE WHEN doc_id % 3 = 1 THEN 12 + doc_id % 16 ELSE 0 END AS fvb,
      |  CASE WHEN doc_id % 4 = 2 THEN 8 + doc_id % 8 ELSE 0 END AS fpd,
      |  ([30, 19, 51])[(doc_id % 3) + 1] AS oid,
      |  CASE WHEN doc_id % 5 = 2 THEN 255 WHEN doc_id % 5 = 3 THEN 300
      |    ELSE 20 + doc_id % 40 END AS oclen,
      |  CASE WHEN doc_id % 5 IN (2, 3) THEN 2 ELSE 1 END AS onlac,
      |  1 + doc_id % 4 AS onaudio,
      |  960 + (doc_id % 7) * 320 AS og,
      |  8000 + (doc_id % 5) * 4000 AS osr,
      |  CASE WHEN doc_id % 2 = 0 THEN 20 ELSE 24 END AS khdr,
      |  CASE WHEN doc_id % 4 = 1 THEN 19 ELSE 23 END AS kinfo,
      |  CASE WHEN doc_id % 15 = 0 THEN 1 ELSE 2 END AS khb,
      |  CASE WHEN doc_id % 2 = 0 THEN 0
      |    WHEN doc_id % 4 = 1 THEN 33 ELSE 31 END AS kaud,
      |  CASE doc_id % 3 WHEN 0 THEN 0 WHEN 1 THEN 18 + doc_id % 9
      |    ELSE 37 + 2 * (doc_id % 9) END AS kcl,
      |  10000 + doc_id % 5000 AS kdur,
      |  1 + doc_id % 3 AS anb,
      |  1 + doc_id % 6 AS qncols,
      |  1 + doc_id % 2 AS qnrg,
      |  1 + doc_id % 3 AS ons,
      |  1 + doc_id % 5 AS oncols,
      |  1 + doc_id % 3 AS gznm,
      |  1 + doc_id % 3 AS znf
      |  FROM w3),
      |w5 AS (SELECT *,
      |  kinfo + 28 + khb + kaud + kcl AS kseg,
      |  list_sum([2 + (doc_id + b) % 4 for b in range(anb)]) AS arecs,
      |  18 + 9 * qncols + 10 * qnrg
      |    + CASE WHEN doc_id % 5 = 3 THEN 12 ELSE 0 END
      |    + CASE WHEN doc_id % 2 = 0 THEN 17 ELSE 0 END AS qflen,
      |  16 + 12 * ons + 9 * oncols
      |    + CASE WHEN doc_id % 2 = 1 THEN 8 ELSE 0 END AS ostored,
      |  list_sum([10 + (doc_id + s) % 30 for s in range(ons)])::BIGINT AS osrows,
      |  list_sum([20 + (doc_id + i) % 30 for i in range(gznm)])::BIGINT AS gztot,
      |  list_sum([CASE WHEN (doc_id + i) % 4 = 0 THEN 1 ELSE 0 END
      |    for i in range(gznm)])::BIGINT AS gznamed,
      |  (CASE WHEN doc_id % 7 = 2 THEN 12 + doc_id % 9 ELSE 0 END
      |   + list_sum([5
      |     + CASE WHEN (doc_id + i) % 5 = 3 THEN 0 ELSE 1 END
      |     + CASE WHEN (doc_id + i) % 6 = 4 THEN 1 ELSE 0 END
      |     + CASE (doc_id + i) % 5 WHEN 0 THEN 4 WHEN 1 THEN 0
      |         WHEN 2 THEN 8 WHEN 3 THEN 1 ELSE 2 END
      |     + CASE WHEN (doc_id + i) % 5 = 4 THEN 256 + doc_id % 50
      |         ELSE 10 + (doc_id + i) % 40 END
      |     + CASE WHEN (doc_id + i) % 2 = 1 THEN 2 ELSE 3 END
      |     + CASE WHEN (doc_id + i) % 3 = 1 THEN 0 ELSE 4 END
      |     for i in range(znf)]))::BIGINT AS zslen,
      |  list_sum([CASE WHEN (doc_id + i) % 5 = 4 THEN 256 + doc_id % 50
      |    ELSE 10 + (doc_id + i) % 40 END for i in range(znf)])::BIGINT AS zstot,
      |  (6 + 16 * (1 + doc_id % 3)
      |   + list_sum([CASE (doc_id + i) % 3
      |    WHEN 0 THEN 40 + (3 + (doc_id + i) % 4)
      |      * (((3 * (4 + (doc_id + i) % 5) + 3) // 4) * 4)
      |      + 4 * (3 + (doc_id + i) % 4)
      |    WHEN 1 THEN 40 + 4 * (4 + (doc_id + i) % 5) * (3 + (doc_id + i) % 4)
      |      + 4 * (3 + (doc_id + i) % 4)
      |    ELSE 68 + (3 + (doc_id + i) % 4) * (1 + 3 * (4 + (doc_id + i) % 5))
      |    END for i in range(1 + doc_id % 3)]))::BIGINT AS iclen
      |  FROM w4),
      |d AS (SELECT doc_id, dlen, rawlen, c1, c2, nc, br, pw, ph, jh, jw, bw, bh, bimg,
      |  xfmt, xw, xh, tw_, th_, tlen, msr, mbr, mpad, mnf, mid3v2, mid3v1,
      |  fsr, ftot, fvb, fpd, oid, oclen, onlac, onaudio, og, osr,
      |  khdr, kseg, kdur, anb, arecs, qflen, ostored, osrows,
      |  gznm, gztot, gznamed, zslen, zstot, iclen,
      |  CASE WHEN cls = 1 AND NOT corrupt THEN 'wav'
      |       WHEN cls = 2 AND NOT corrupt THEN 'png'
      |       WHEN cls = 3 AND NOT corrupt THEN 'jpeg'
      |       WHEN cls = 4 AND NOT corrupt THEN 'bmp'
      |       WHEN cls = 5 AND NOT corrupt THEN 'webp'
      |       WHEN cls = 6 AND NOT corrupt THEN 'tiff'
      |       WHEN cls = 7 AND NOT corrupt THEN 'mp3'
      |       WHEN cls = 8 AND NOT corrupt THEN 'flac'
      |       WHEN cls = 9 AND NOT corrupt THEN 'ogg'
      |       WHEN cls = 10 AND NOT corrupt THEN 'mkv'
      |       WHEN cls = 11 AND NOT corrupt THEN 'avro'
      |       WHEN cls = 12 AND NOT corrupt THEN 'parquet'
      |       WHEN cls = 13 AND NOT corrupt THEN 'orc'
      |       WHEN cls = 14 AND NOT corrupt THEN 'gzip'
      |       WHEN cls = 15 AND NOT corrupt THEN 'zstd'
      |       WHEN cls = 16 AND NOT corrupt THEN 'ico'
      |       WHEN cls = 17 AND NOT corrupt THEN 'heif'
      |       ELSE 'unknown' END AS detected
      |  FROM w5)
      |SELECT doc_id, detected,
      |  (CASE WHEN detected = 'wav' THEN dlen + 44
      |        WHEN detected = 'png' THEN dlen + 57
      |        WHEN detected = 'jpeg' THEN 52 + c1 + 5 * nc + COALESCE(4 + c2, 0)
      |        WHEN detected = 'bmp' THEN 54 + bimg
      |        WHEN detected = 'webp' THEN CASE WHEN xfmt = 1 THEN 26 ELSE 30 END
      |        WHEN detected = 'tiff' THEN tlen
      |        WHEN detected = 'mp3' THEN mnf *
      |          ((CASE WHEN doc_id % 2 = 0 THEN 144 ELSE 72 END)
      |            * mbr * 1000 // msr + mpad) + mid3v2 + mid3v1
      |        WHEN detected = 'flac' THEN 46 + fvb + fpd
      |        WHEN detected = 'ogg' THEN (28 + oid) + (27 + onlac + oclen)
      |          + onaudio * (68 + doc_id % 30)
      |        WHEN detected = 'mkv' THEN khdr + 4
      |          + (CASE WHEN kseg < 127 THEN 1 ELSE 2 END) + kseg
      |        WHEN detected = 'avro' THEN 4
      |          + (1 + 14 + ${graft.expressions.AvroSynthKernel.SchemaLen}
      |             + CASE doc_id % 3 WHEN 0 THEN 0 WHEN 1 THEN 16 ELSE 19 END + 1)
      |          + 16 + 2 * anb
      |          + 6 * arecs + (CASE WHEN doc_id % 3 = 2 THEN 5 * anb ELSE 0 END)
      |          + 16 * anb
      |        WHEN detected = 'parquet' THEN 16 + qflen
      |        WHEN detected = 'orc' THEN 26 + ostored
      |        WHEN detected = 'gzip' THEN gztot + 23 * gznm + 3 * gznamed
      |        WHEN detected = 'zstd' THEN zslen
      |        WHEN detected = 'ico' THEN iclen
      |        WHEN detected = 'heif' THEN 233 + 21 * (1 + doc_id % 3)
      |          + CASE WHEN doc_id % 3 >= 1 THEN 17 ELSE 0 END
      |          + doc_id % 900 + CASE WHEN doc_id % 20 = 9 THEN 16 ELSE 8 END
      |        ELSE rawlen END)::BIGINT AS payload_bytes,
      |  detected <> 'unknown' AS valid,
      |  (CASE WHEN detected = 'wav' THEN (dlen * 1000) // br
      |        WHEN detected = 'png' THEN pw * ph
      |        WHEN detected = 'jpeg' THEN jw * jh
      |        WHEN detected = 'bmp' THEN bw * bh
      |        WHEN detected = 'webp' THEN xw * xh
      |        WHEN detected = 'tiff' THEN tw_ * th_
      |        WHEN detected = 'mp3' THEN mnf *
      |          (CASE WHEN doc_id % 2 = 0 THEN 1152 ELSE 576 END) * 1000 // msr
      |        WHEN detected = 'flac' THEN ftot * 1000 // fsr
      |        WHEN detected = 'ogg' THEN CASE WHEN doc_id % 3 = 1
      |          THEN onaudio * og * 1000 // 48000
      |          ELSE onaudio * og * 1000 // osr END
      |        WHEN detected = 'mkv' THEN kdur
      |        WHEN detected = 'avro' THEN arecs
      |        WHEN detected = 'parquet' THEN 10 + doc_id % 50
      |        WHEN detected = 'orc' THEN osrows
      |          + CASE WHEN doc_id % 20 = 17 THEN 1 ELSE 0 END
      |        WHEN detected = 'gzip' THEN gztot
      |        WHEN detected = 'zstd' THEN zstot
      |        WHEN detected = 'ico' THEN 1 + doc_id % 3
      |        WHEN detected = 'heif'
      |          THEN (64 + doc_id % 512) * (48 + doc_id % 256)
      |        END)::BIGINT AS content_units
      |FROM d ORDER BY doc_id""".stripMargin

  /** MP3 triage (mirror of Binary.Mp3.parse ∘ synthFromDocs): every
    * field — version, layer, bitrate/rate tables, channel mode, frame
    * count, the exact integer duration, ID3v2/v1 lanes — re-derived
    * closed-form from doc_id while Spark walks the actual frame
    * stream; the hash match proves the length arithmetic.
    */
  val mmMp3Meta: String =
    """WITH m AS (SELECT doc_id,
      |  doc_id % 2 = 0 AS mpeg1,
      |  doc_id % 10 = 0 AS invalid,
      |  doc_id % 4 = 1 AS id3v2,
      |  doc_id % 8 = 5 AS id3v1,
      |  1 + doc_id % 6 AS nf
      |  FROM documents),
      |w AS (SELECT *,
      |  CASE WHEN mpeg1 THEN ([44100, 48000, 32000])[(doc_id % 3) + 1]
      |    ELSE ([22050, 24000, 16000])[(doc_id % 3) + 1] END AS sr,
      |  CASE WHEN mpeg1 THEN ([64, 80, 96])[(doc_id % 3) + 1]
      |    ELSE ([40, 48, 56])[(doc_id % 3) + 1] END AS br,
      |  CASE WHEN mpeg1 THEN 1152 ELSE 576 END AS spf
      |  FROM m)
      |SELECT doc_id,
      |  CASE WHEN invalid THEN 'text/plain' ELSE 'audio/mpeg' END AS media_type,
      |  NOT invalid AS mp3_valid,
      |  CASE WHEN invalid THEN NULL ELSE id3v2 END AS has_id3v2,
      |  (CASE WHEN invalid OR NOT id3v2 THEN NULL
      |    ELSE 30 + doc_id % 30 END)::BIGINT AS id3v2_bytes,
      |  CASE WHEN invalid THEN NULL
      |    WHEN mpeg1 THEN '1' ELSE '2' END AS mpeg_version,
      |  (CASE WHEN invalid THEN NULL ELSE 3 END)::BIGINT AS layer,
      |  (CASE WHEN invalid THEN NULL ELSE br END)::BIGINT AS bitrate_kbps,
      |  (CASE WHEN invalid THEN NULL ELSE sr END)::BIGINT AS sample_rate,
      |  CASE WHEN invalid THEN NULL
      |    ELSE (['stereo', 'joint_stereo', 'dual_channel', 'mono'])
      |      [(doc_id % 4) + 1] END AS channel_mode,
      |  (CASE WHEN invalid THEN NULL ELSE nf END)::BIGINT AS n_frames,
      |  (CASE WHEN invalid THEN NULL
      |    ELSE nf * spf * 1000 // sr END)::BIGINT AS duration_ms,
      |  CASE WHEN invalid THEN NULL ELSE id3v1 END AS has_id3v1,
      |  CASE WHEN invalid THEN NULL ELSE FALSE END AS is_vbr,
      |  CASE WHEN invalid THEN NULL ELSE TRUE END AS header_consistent
      |FROM w ORDER BY doc_id""".stripMargin

  /** FLAC triage (mirror of Binary.Flac.parse ∘ synthFromDocs): the
    * STREAMINFO packed-bit fields, block chain, and exact integer
    * duration re-derived closed-form from doc_id.
    */
  val mmFlacMeta: String =
    """WITH m AS (SELECT doc_id,
      |  doc_id % 10 = 0 AS invalid,
      |  8000 + (doc_id % 5) * 4000 AS sr,
      |  1 + doc_id % 2 AS ch,
      |  8 * (1 + doc_id % 3) AS bps,
      |  1000 + doc_id % 5000 AS total,
      |  doc_id % 3 = 1 AS vorbis,
      |  doc_id % 4 = 2 AS padding
      |  FROM documents)
      |SELECT doc_id,
      |  CASE WHEN invalid THEN 'text/plain' ELSE 'audio/flac' END AS media_type,
      |  NOT invalid AS flac_valid,
      |  (CASE WHEN invalid THEN NULL ELSE sr END)::BIGINT AS sample_rate,
      |  (CASE WHEN invalid THEN NULL ELSE ch END)::BIGINT AS channels,
      |  (CASE WHEN invalid THEN NULL ELSE bps END)::BIGINT AS bits_per_sample,
      |  (CASE WHEN invalid THEN NULL ELSE total END)::BIGINT AS total_samples,
      |  (CASE WHEN invalid THEN NULL
      |    ELSE total * 1000 // sr END)::BIGINT AS duration_ms,
      |  (CASE WHEN invalid THEN NULL
      |    ELSE 1 + (CASE WHEN vorbis THEN 1 ELSE 0 END)
      |      + (CASE WHEN padding THEN 1 ELSE 0 END) END)::BIGINT AS n_blocks,
      |  CASE WHEN invalid THEN NULL ELSE vorbis END AS has_vorbis_comment,
      |  (CASE WHEN invalid THEN NULL ELSE 4096 END)::BIGINT AS min_block_size,
      |  (CASE WHEN invalid THEN NULL ELSE 4096 END)::BIGINT AS max_block_size,
      |  CASE WHEN invalid THEN NULL ELSE TRUE END AS header_consistent
      |FROM m ORDER BY doc_id""".stripMargin

  /** OGG triage (mirror of `Binary.Ogg.parse` ∘ `synthFromDocs`):
    * every field — codec rotation, rate/channels/pre-skip, page and
    * packet counts, the final granule position, the exact integer
    * duration (48 kHz-tick arithmetic minus pre-skip on the Opus
    * lane), the flipped-CRC verdict — re-derived closed-form from
    * doc_id, so a hash match proves the kernel walked and CHECKSUMMED
    * the actual pages (the CRC lane fails integrity only if the
    * kernel really recomputes OGG's unreflected CRC-32).
    */
  val mmOggMeta: String =
    """WITH m AS (SELECT doc_id,
      |  doc_id % 10 = 0 AS invalid,
      |  doc_id % 3 AS codec_lane,
      |  8000 + (doc_id % 5) * 4000 AS sr,
      |  1 + doc_id % 2 AS ch,
      |  120 + (doc_id % 4) * 60 AS pre_skip,
      |  1 + doc_id % 4 AS n_audio,
      |  960 + (doc_id % 7) * 320 AS g
      |  FROM documents)
      |SELECT doc_id,
      |  CASE WHEN invalid THEN 'text/plain' ELSE 'audio/ogg' END AS media_type,
      |  NOT invalid AS ogg_valid,
      |  CASE WHEN invalid THEN NULL
      |    WHEN codec_lane = 0 THEN 'vorbis'
      |    WHEN codec_lane = 1 THEN 'opus'
      |    ELSE 'flac' END AS codec,
      |  (CASE WHEN invalid THEN NULL ELSE sr END)::BIGINT AS sample_rate,
      |  (CASE WHEN invalid THEN NULL ELSE ch END)::BIGINT AS channels,
      |  (CASE WHEN invalid OR codec_lane <> 1 THEN NULL
      |    ELSE pre_skip END)::BIGINT AS pre_skip,
      |  (CASE WHEN invalid THEN NULL ELSE 2 + n_audio END)::BIGINT AS n_pages,
      |  (CASE WHEN invalid THEN NULL ELSE 2 + n_audio END)::BIGINT AS n_packets,
      |  (CASE WHEN invalid THEN NULL
      |    ELSE (CASE WHEN codec_lane = 1 THEN pre_skip ELSE 0 END)
      |      + n_audio * g END)::BIGINT AS last_granule,
      |  (CASE WHEN invalid THEN NULL
      |    WHEN codec_lane = 1 THEN n_audio * g * 1000 // 48000
      |    ELSE ((CASE WHEN codec_lane = 1 THEN pre_skip ELSE 0 END)
      |      + n_audio * g) * 1000 // sr END)::BIGINT AS duration_ms,
      |  CASE WHEN invalid THEN NULL ELSE doc_id % 20 <> 7 END AS crc_ok,
      |  CASE WHEN invalid THEN NULL ELSE TRUE END AS header_consistent
      |FROM m ORDER BY doc_id""".stripMargin

  /** Matroska/WebM triage (mirror of `Binary.Mkv.parse` ∘
    * `synthFromDocs`): every field — doctype rotation, the float
    * Duration × TimecodeScale product (exact at these integer-valued
    * floats in BOTH the float32 and float64 width lanes), VP8/VP9/AV1
    * dims, the audio-track lane's codec/channels/rate, cluster
    * counts — re-derived closed-form from doc_id, so a hash match
    * proves the kernel walked the actual EBML varints.
    */
  val mmMkvMeta: String =
    """WITH m AS (SELECT doc_id,
      |  doc_id % 10 = 0 AS invalid,
      |  doc_id % 2 = 0 AS webm,
      |  2 + doc_id % 3 AS dt_ver,
      |  10000 + doc_id % 5000 AS dur_ms,
      |  doc_id % 2 = 1 AS has_audio,
      |  doc_id % 4 = 1 AS vorbis_lane
      |  FROM documents)
      |SELECT doc_id,
      |  CASE WHEN invalid THEN 'text/plain' ELSE 'video/webm' END AS media_type,
      |  NOT invalid AS mkv_valid,
      |  CASE WHEN invalid THEN NULL
      |    WHEN webm THEN 'webm' ELSE 'matroska' END AS doctype,
      |  (CASE WHEN invalid THEN NULL ELSE dt_ver END)::BIGINT AS doctype_version,
      |  (CASE WHEN invalid THEN NULL ELSE 1000000 END)::BIGINT AS timecode_scale,
      |  (CASE WHEN invalid THEN NULL ELSE dur_ms END)::BIGINT AS duration_ms,
      |  (CASE WHEN invalid THEN NULL
      |    ELSE 1 + (CASE WHEN has_audio THEN 1 ELSE 0 END) END)::BIGINT AS n_tracks,
      |  CASE WHEN invalid THEN NULL
      |    WHEN doc_id % 3 = 0 THEN 'V_VP8'
      |    WHEN doc_id % 3 = 1 THEN 'V_VP9'
      |    ELSE 'V_AV1' END AS video_codec,
      |  (CASE WHEN invalid THEN NULL
      |    ELSE 320 + 16 * (doc_id % 20) END)::BIGINT AS pixel_width,
      |  (CASE WHEN invalid THEN NULL
      |    ELSE 240 + 16 * (doc_id % 15) END)::BIGINT AS pixel_height,
      |  CASE WHEN invalid OR NOT has_audio THEN NULL
      |    WHEN vorbis_lane THEN 'A_VORBIS' ELSE 'A_OPUS' END AS audio_codec,
      |  (CASE WHEN invalid OR NOT has_audio THEN NULL
      |    ELSE 1 + (doc_id % 5) % 2 END)::BIGINT AS audio_channels,
      |  (CASE WHEN invalid OR NOT has_audio THEN NULL
      |    WHEN vorbis_lane THEN 44100 ELSE 48000 END)::BIGINT AS audio_sample_rate,
      |  (CASE WHEN invalid THEN NULL ELSE doc_id % 3 END)::BIGINT AS n_clusters,
      |  CASE WHEN invalid THEN NULL ELSE TRUE END AS header_consistent
      |FROM m ORDER BY doc_id""".stripMargin

  /** FLAC sample decode (mirror of `Flac.sampleStats` ∘
    * `synthAudioFromDocs`): the oracle recomputes the integer sample
    * stats from the closed-form sample formulas — frame 0 constant
    * `(13d + 29c) mod M − M/2`, later frames
    * `(31(d+1) + 17c + 7j) mod M − M/2` — while Spark must reach the
    * same numbers by decoding actual rice-coded fixed/LPC subframes
    * through stereo decorrelation, so the hash match proves the
    * bit-level frame decode across every coding lane. The d%20==5
    * lane ships a flipped final CRC-16: samples identical, `crc_ok`
    * false.
    */
  val mmFlacSamples: String =
    """WITH m AS (SELECT doc_id AS d, doc_id % 10 = 0 AS invalid,
      |  1 + doc_id % 2 AS ch,
      |  CASE WHEN doc_id % 3 = 0 THEN 8 ELSE 16 END AS bps,
      |  CASE WHEN doc_id % 3 = 0 THEN 160 ELSE 2000 END AS mv,
      |  96 + (doc_id % 5) * 32 AS n
      |  FROM documents),
      |v AS (SELECT d, invalid, ch, bps, n,
      |  CASE WHEN invalid THEN NULL ELSE
      |    list_transform(range(ch * n), i ->
      |      CASE WHEN (i % n) < 64
      |        THEN (d * 13 + (i // n) * 29) % mv - mv // 2
      |        ELSE ((d + 1) * 31 + (i // n) * 17 + (i % n) * 7) % mv - mv // 2
      |      END)
      |  END AS s FROM m)
      |SELECT d AS doc_id, NOT invalid AS flac_valid,
      |  NOT invalid AS decode_ok,
      |  (CASE WHEN invalid THEN NULL ELSE ch END)::BIGINT AS channels,
      |  (CASE WHEN invalid THEN NULL ELSE bps END)::BIGINT AS bits_per_sample,
      |  (CASE WHEN invalid THEN NULL ELSE (n + 63) // 64 END)::BIGINT AS n_frames,
      |  (CASE WHEN invalid THEN NULL ELSE n END)::BIGINT AS n_samples,
      |  (CASE WHEN invalid THEN NULL ELSE list_sum(s) END)::BIGINT AS sample_sum,
      |  (CASE WHEN invalid THEN NULL
      |    ELSE list_sum(list_transform(s, x -> x * x)) END)::BIGINT AS sample_sum_sq,
      |  (CASE WHEN invalid THEN NULL
      |    ELSE list_max(list_transform(s, x -> abs(x))) END)::BIGINT AS peak_abs,
      |  CASE WHEN invalid THEN NULL ELSE d % 20 <> 5 END AS crc_ok,
      |  CASE WHEN invalid THEN NULL ELSE TRUE END AS matches_streaminfo
      |FROM v ORDER BY doc_id""".stripMargin

  /** Ogg-FLAC sample decode (mirror of `Ogg.sampleStats` ∘
    * `synthAudioFromDocs`): the decoded samples keep the bare-FLAC
    * synth's closed forms (the frames are
    * `FlacAudioSynthKernel.synthParts`, re-paged), so the sample
    * stats re-use `mmFlacSamples`' arithmetic; the page layer adds
    * its own closed forms — n_pages = BOS + comment pages (2 when
    * the d%5==4 lane splits the packet across a continuation page)
    * + ceil(frames / framesPerPage) with framesPerPage = 1 + d%2 —
    * plus the two independent CRC lanes (d%20==7 flips the last
    * PAGE CRC, d%20==5 the last FLAC frame CRC). A hash match
    * proves the page walk, the cross-page packet reassembly, AND
    * the bit-level frame decode.
    */
  val mmOggSamples: String =
    """WITH m AS (SELECT doc_id AS d, doc_id % 10 = 0 AS invalid,
      |  1 + doc_id % 2 AS ch,
      |  CASE WHEN doc_id % 3 = 0 THEN 8 ELSE 16 END AS bps,
      |  CASE WHEN doc_id % 3 = 0 THEN 160 ELSE 2000 END AS mv,
      |  96 + (doc_id % 5) * 32 AS n,
      |  1 + doc_id % 2 AS fpp,
      |  CASE WHEN doc_id % 5 = 4 THEN 2 ELSE 1 END AS comment_pages
      |  FROM documents),
      |v AS (SELECT d, invalid, ch, bps, n,
      |  1 + comment_pages
      |    + ((n + 63) // 64 + fpp - 1) // fpp AS pages,
      |  CASE WHEN invalid THEN NULL ELSE
      |    list_transform(range(ch * n), i ->
      |      CASE WHEN (i % n) < 64
      |        THEN (d * 13 + (i // n) * 29) % mv - mv // 2
      |        ELSE ((d + 1) * 31 + (i // n) * 17 + (i % n) * 7) % mv - mv // 2
      |      END)
      |  END AS s FROM m)
      |SELECT d AS doc_id, NOT invalid AS oggflac_valid,
      |  (CASE WHEN invalid THEN NULL ELSE pages END)::BIGINT AS n_pages,
      |  CASE WHEN invalid THEN NULL ELSE d % 20 <> 7 END AS pages_crc_ok,
      |  NOT invalid AS decode_ok,
      |  (CASE WHEN invalid THEN NULL ELSE ch END)::BIGINT AS channels,
      |  (CASE WHEN invalid THEN NULL ELSE bps END)::BIGINT AS bits_per_sample,
      |  (CASE WHEN invalid THEN NULL ELSE (n + 63) // 64 END)::BIGINT AS n_frames,
      |  (CASE WHEN invalid THEN NULL ELSE n END)::BIGINT AS n_samples,
      |  (CASE WHEN invalid THEN NULL ELSE list_sum(s) END)::BIGINT AS sample_sum,
      |  (CASE WHEN invalid THEN NULL
      |    ELSE list_sum(list_transform(s, x -> x * x)) END)::BIGINT AS sample_sum_sq,
      |  (CASE WHEN invalid THEN NULL
      |    ELSE list_max(list_transform(s, x -> abs(x))) END)::BIGINT AS peak_abs,
      |  CASE WHEN invalid THEN NULL ELSE d % 20 <> 5 END AS frame_crc_ok,
      |  CASE WHEN invalid THEN NULL ELSE TRUE END AS matches_streaminfo
      |FROM v ORDER BY doc_id""".stripMargin

  /** TIFF triage (mirror of Binary.Tiff.parse ∘ synthFromDocs): every
    * field — byte order, page count, entry count, dims, strip/tile
    * geometry, unit counts — re-derived closed-form from doc_id
    * arithmetic, so a hash match proves the parser walked the actual
    * IFD chains in both byte orders, through inline AND out-of-line
    * value arrays.
    */
  /** TIFF pixel stats (mirror of Tiff.pixelStats ∘
    * synthPixelsFromDocs): the oracle recomputes channel sums/peak
    * from the closed-form raster byte `(7·doc_id + 13·j) mod 256` —
    * Spark must reach the same numbers by actually decompressing the
    * LZW (MSB-first, early change) / PackBits / Deflate strip and
    * tile streams and undoing the horizontal predictor, so the hash
    * match proves the decode across every lane.
    */
  val mmTiffPixels: String = {
    def chan(c: Int): String =
      s"""[(7 * doc_id + 13 * (spp * i + LEAST(spp - 1, $c))) % 256
         |    for i in range(0, n)]""".stripMargin
    s"""WITH m AS (SELECT doc_id,
       |  5 + doc_id % 12 + CASE WHEN doc_id % 5 = 2 THEN 16 ELSE 0 END AS w,
       |  4 + doc_id % 9 + CASE WHEN doc_id % 5 = 2 THEN 16 ELSE 0 END AS h,
       |  CASE WHEN doc_id % 3 = 0 THEN 3 ELSE 1 END AS spp,
       |  doc_id % 10 = 0 AS invalid FROM documents),
       |p AS (SELECT doc_id, invalid, spp, w * h AS n FROM m),
       |s AS (SELECT doc_id, invalid, n,
       |  ${chan(0)} AS rs,
       |  ${chan(1)} AS gs,
       |  ${chan(2)} AS bs
       |  FROM p)
       |SELECT doc_id, NOT invalid AS tiff_valid,
       |  (CASE WHEN invalid THEN NULL ELSE n END)::BIGINT AS pixels_decoded,
       |  CASE WHEN invalid THEN NULL
       |    ELSE list_aggregate(rs, 'sum')::DOUBLE / n END AS mean_r,
       |  CASE WHEN invalid THEN NULL
       |    ELSE list_aggregate(gs, 'sum')::DOUBLE / n END AS mean_g,
       |  CASE WHEN invalid THEN NULL
       |    ELSE list_aggregate(bs, 'sum')::DOUBLE / n END AS mean_b,
       |  (CASE WHEN invalid THEN NULL
       |    ELSE greatest(list_max(rs), list_max(gs), list_max(bs)) END)::BIGINT
       |    AS peak_byte
       |FROM s ORDER BY doc_id""".stripMargin
  }

  val mmTiffMeta: String =
    s"""WITH m AS (SELECT doc_id, $tiffGeom,
      |  doc_id % 10 = 0 AS invalid FROM documents),
      |p AS (SELECT *,
      |  CASE WHEN ttiles
      |    THEN ((tw_ + 15) // 16) * ((th_ + 15) // 16) ELSE tns END AS tnu,
      |  (th_ + tns - 1) // tns AS trps FROM m)
      |SELECT doc_id,
      |  CASE WHEN invalid THEN 'text/plain' ELSE 'image/tiff' END AS media_type,
      |  NOT invalid AS tiff_valid,
      |  CASE WHEN invalid THEN NULL
      |    WHEN doc_id % 2 = 0 THEN 'II' ELSE 'MM' END AS byte_order,
      |  (CASE WHEN invalid THEN NULL
      |    WHEN ttwo THEN 2 ELSE 1 END)::BIGINT AS n_ifds,
      |  (CASE WHEN invalid THEN NULL
      |    WHEN ttiles THEN 10 ELSE 9 END)::BIGINT AS n_ifd0_entries,
      |  (CASE WHEN invalid THEN NULL ELSE tw_ END)::BIGINT AS width,
      |  (CASE WHEN invalid THEN NULL ELSE th_ END)::BIGINT AS height,
      |  (CASE WHEN invalid THEN NULL ELSE 8 END)::BIGINT AS bits_per_sample,
      |  (CASE WHEN invalid THEN NULL ELSE tspp END)::BIGINT AS samples_per_pixel,
      |  (CASE WHEN invalid THEN NULL ELSE tcomp END)::BIGINT AS compression,
      |  (CASE WHEN invalid THEN NULL
      |    WHEN tspp = 3 THEN 2 ELSE doc_id % 2 END)::BIGINT AS photometric,
      |  CASE WHEN invalid THEN NULL
      |    WHEN ttiles THEN 'tile' ELSE 'strip' END AS layout,
      |  (CASE WHEN invalid THEN NULL ELSE tnu END)::BIGINT AS n_units,
      |  (CASE WHEN invalid OR ttiles THEN NULL ELSE trps END)::BIGINT
      |    AS rows_per_strip,
      |  (CASE WHEN invalid OR NOT ttiles THEN NULL ELSE 16 END)::BIGINT AS tile_w,
      |  (CASE WHEN invalid OR NOT ttiles THEN NULL ELSE 16 END)::BIGINT AS tile_h,
      |  (CASE WHEN invalid THEN NULL ELSE tw_ * th_ END)::BIGINT AS n_pixels,
      |  CASE WHEN invalid THEN NULL ELSE TRUE END AS header_consistent
      |FROM p ORDER BY doc_id""".stripMargin

  /** Mirror of Binary.Bmp.synthFromDocs ∘ parse: every field —
    * including the 4-byte-aligned row stride and the image/file size
    * arithmetic — re-derived from doc_id arithmetic, so a hash match
    * proves the parser read the actual little-endian byte layout.
    */
  val mmBmpMeta: String =
    """WITH m AS (SELECT doc_id,
      |  10 + doc_id % 13 AS w,
      |  5 + doc_id % 9 AS h,
      |  ([16, 24, 32])[(doc_id % 3) + 1] AS bpp,
      |  doc_id % 10 = 0 AS invalid
      |  FROM documents),
      |p AS (SELECT *, ((w * bpp + 31) // 32) * 4 AS stride FROM m)
      |SELECT doc_id,
      |  CASE WHEN invalid THEN 'text/plain' ELSE 'image/bmp' END AS media_type,
      |  NOT invalid AS bmp_valid,
      |  (CASE WHEN invalid THEN NULL ELSE w END)::BIGINT AS width,
      |  (CASE WHEN invalid THEN NULL ELSE h END)::BIGINT AS height,
      |  (CASE WHEN invalid THEN NULL ELSE bpp END)::BIGINT AS bits_per_pixel,
      |  (CASE WHEN invalid THEN NULL ELSE 0 END)::BIGINT AS compression,
      |  (CASE WHEN invalid THEN NULL ELSE 54 END)::BIGINT AS data_offset,
      |  (CASE WHEN invalid THEN NULL ELSE stride * h END)::BIGINT AS image_bytes,
      |  (CASE WHEN invalid THEN NULL ELSE stride END)::BIGINT AS row_stride,
      |  (CASE WHEN invalid THEN NULL ELSE w * h END)::BIGINT AS n_pixels,
      |  CASE WHEN invalid THEN NULL ELSE TRUE END AS header_consistent
      |FROM p ORDER BY doc_id""".stripMargin

  /** WebP triage (mirror of Binary.Webp.parse ∘ synthFromDocs): every
    * field — the three codec lanes' dimension encodings, VP8 scale
    * bits, VP8L alpha bit and VP8X flags, the declared RIFF/chunk
    * sizes including the odd-chunk pad — re-derived closed-form from
    * doc_id arithmetic, so a hash match proves the parser read the
    * little-endian bitfields from the actual bytes.
    */
  val mmWebpMeta: String =
    """WITH m AS (SELECT doc_id, doc_id % 3 AS fmt,
      |  doc_id % 10 = 0 AS invalid FROM documents),
      |p AS (SELECT doc_id, fmt, invalid,
      |  CASE fmt WHEN 0 THEN 3 + doc_id % 9
      |           WHEN 1 THEN 2 + doc_id % 300
      |           ELSE 7 + doc_id % 70000 END AS w,
      |  CASE fmt WHEN 0 THEN 2 + doc_id % 7
      |           WHEN 1 THEN 1 + doc_id % 200
      |           ELSE 5 + doc_id % 33000 END AS h
      |  FROM m)
      |SELECT doc_id,
      |  CASE WHEN invalid THEN 'text/plain' ELSE 'image/webp' END AS media_type,
      |  NOT invalid AS webp_valid,
      |  CASE WHEN invalid THEN NULL
      |    WHEN fmt = 0 THEN 'VP8' WHEN fmt = 1 THEN 'VP8L'
      |    ELSE 'VP8X' END AS format,
      |  (CASE WHEN invalid THEN NULL ELSE w END)::BIGINT AS width,
      |  (CASE WHEN invalid THEN NULL ELSE h END)::BIGINT AS height,
      |  CASE WHEN invalid THEN NULL
      |    WHEN fmt = 0 THEN FALSE ELSE doc_id % 2 = 1 END AS has_alpha,
      |  CASE WHEN invalid THEN NULL
      |    ELSE fmt = 2 AND doc_id % 5 < 2 END AS has_animation,
      |  (CASE WHEN invalid OR fmt <> 0 THEN NULL
      |    ELSE doc_id % 4 END)::BIGINT AS x_scale,
      |  (CASE WHEN invalid OR fmt <> 0 THEN NULL
      |    ELSE (doc_id % 16) // 4 END)::BIGINT AS y_scale,
      |  (CASE WHEN invalid THEN NULL ELSE w * h END)::BIGINT AS n_pixels,
      |  (CASE WHEN invalid THEN NULL
      |    WHEN fmt = 1 THEN 18 ELSE 22 END)::BIGINT AS riff_size,
      |  (CASE WHEN invalid THEN NULL
      |    WHEN fmt = 1 THEN 5 ELSE 10 END)::BIGINT AS chunk_bytes,
      |  CASE WHEN invalid THEN NULL ELSE TRUE END AS header_consistent
      |FROM p ORDER BY doc_id""".stripMargin

  /** WebP pixel stats (mirror of Webp.pixelStats ∘
    * synthPixelsFromDocs): the oracle recomputes channel sums/peak
    * from the closed-form pixel formulas — Spark must reach the same
    * numbers by actually decoding the VP8L bitstreams (canonical
    * prefix codes, LZ77, color cache, subtract-green), so the hash
    * match proves the bit-level decode on every encoder lane.
    */
  val mmWebpPixels: String = {
    def chan(mul: Int, add0: Int, div: Int, addJ: Int): String = {
      val sel = if (div == 1) "(i % 2)" else s"((i // $div) % 2)"
      s"""[CASE WHEN lane = 0 THEN ($mul * doc_id + $add0 * $sel) % 256
         |    ELSE ($mul * doc_id + $addJ * (i % per)) % 256 END
         |    for i in range(0, n)]""".stripMargin
    }
    s"""WITH m AS (SELECT doc_id,
       |  4 + doc_id % 21 AS w, 3 + doc_id % 13 AS h,
       |  1 + doc_id % 11 AS per, doc_id % 4 AS lane,
       |  doc_id % 10 = 0 AS invalid FROM documents),
       |p AS (SELECT doc_id, invalid, lane, per, w * h AS n FROM m),
       |s AS (SELECT doc_id, invalid, n,
       |  ${chan(11, 71, 1, 17)} AS rs,
       |  ${chan(7, 53, 2, 13)} AS gs,
       |  ${chan(13, 31, 4, 19)} AS bs
       |  FROM p)
       |SELECT doc_id, NOT invalid AS webp_valid,
       |  (CASE WHEN invalid THEN NULL ELSE n END)::BIGINT AS pixels_decoded,
       |  CASE WHEN invalid THEN NULL
       |    ELSE list_aggregate(rs, 'sum')::DOUBLE / n END AS mean_r,
       |  CASE WHEN invalid THEN NULL
       |    ELSE list_aggregate(gs, 'sum')::DOUBLE / n END AS mean_g,
       |  CASE WHEN invalid THEN NULL
       |    ELSE list_aggregate(bs, 'sum')::DOUBLE / n END AS mean_b,
       |  (CASE WHEN invalid THEN NULL
       |    ELSE greatest(list_max(rs), list_max(gs), list_max(bs)) END)::BIGINT
       |    AS peak_byte
       |FROM s ORDER BY doc_id""".stripMargin
  }

  /** GIF screen descriptor (mirror of Binary.Gif.parse ∘ synthFromDocs:
    * the oracle recomputes every field closed-form from doc_id while
    * Spark parses the payload bytes — the hash match proves the read).
    */
  val mmGifMeta: String =
    """WITH m AS (SELECT doc_id,
      |  7 + doc_id % 11 AS w,
      |  4 + doc_id % 6 AS h,
      |  doc_id % 3 <> 0 AS gct,
      |  (1::BIGINT << ((doc_id % 8 + 1)::INT)) AS entries,
      |  doc_id % 10 = 0 AS invalid
      |  FROM documents)
      |SELECT doc_id,
      |  CASE WHEN invalid THEN 'text/plain' ELSE 'image/gif' END AS media_type,
      |  NOT invalid AS gif_valid,
      |  CASE WHEN invalid THEN NULL
      |    WHEN doc_id % 2 = 0 THEN '89a' ELSE '87a' END AS version,
      |  (CASE WHEN invalid THEN NULL ELSE w END)::BIGINT AS width,
      |  (CASE WHEN invalid THEN NULL ELSE h END)::BIGINT AS height,
      |  CASE WHEN invalid THEN NULL ELSE gct END AS has_gct,
      |  (CASE WHEN invalid OR NOT gct THEN NULL ELSE entries END)::BIGINT
      |    AS gct_entries,
      |  (CASE WHEN invalid OR NOT gct THEN NULL ELSE entries * 3 END)::BIGINT
      |    AS gct_bytes,
      |  (CASE WHEN invalid THEN NULL
      |    WHEN gct THEN doc_id % 256 ELSE 0 END)::BIGINT AS bg_index,
      |  (CASE WHEN invalid THEN NULL ELSE w * h END)::BIGINT AS n_pixels,
      |  CASE WHEN invalid THEN NULL ELSE TRUE END AS header_consistent
      |FROM m ORDER BY doc_id""".stripMargin

  /** GIF pixel stats (mirror of Gif.pixelStats ∘ synthPixelsFromDocs):
    * the oracle recomputes channel sums/peak from the closed-form
    * index sequence `(doc_id + i) mod entries` and the text-derived
    * palette — Spark must reach the same numbers by actually decoding
    * the LZW stream, so the hash match proves the decode.
    */
  val mmGifPixels: String = {
    def chan(c: Int): String =
      s"""[('0x' || substr(ph, (3 * ((doc_id + i) % entries) + $c) * 2 + 1, 2))::BIGINT
         |    for i in range(0, n)]""".stripMargin
    s"""WITH m AS (SELECT doc_id, text,
       |  (1::BIGINT << ((doc_id % 3 + 2)::INT)) AS entries,
       |  5 + doc_id % 6 AS iw, 3 + doc_id % 4 AS ih,
       |  doc_id % 10 = 0 AS invalid FROM documents),
       |p AS (SELECT doc_id, invalid, entries, iw * ih AS n,
       |  rpad(substring(hex(text::BLOB), 1, (entries * 6)::INT),
       |    (entries * 6)::INT, '0') AS ph FROM m),
       |s AS (SELECT doc_id, invalid, n,
       |  ${chan(0)} AS rs,
       |  ${chan(1)} AS gs,
       |  ${chan(2)} AS bs
       |  FROM p)
       |SELECT doc_id, NOT invalid AS gif_valid,
       |  (CASE WHEN invalid THEN NULL ELSE n END)::BIGINT AS pixels_decoded,
       |  CASE WHEN invalid THEN NULL
       |    ELSE list_aggregate(rs, 'sum')::DOUBLE / n END AS mean_r,
       |  CASE WHEN invalid THEN NULL
       |    ELSE list_aggregate(gs, 'sum')::DOUBLE / n END AS mean_g,
       |  CASE WHEN invalid THEN NULL
       |    ELSE list_aggregate(bs, 'sum')::DOUBLE / n END AS mean_b,
       |  (CASE WHEN invalid THEN NULL
       |    ELSE greatest(list_max(rs), list_max(gs), list_max(bs)) END)::BIGINT
       |    AS peak_byte
       |FROM s ORDER BY doc_id""".stripMargin
  }

  /** Avro OCF triage (mirror of `Binary.Avro.parse` ∘
    * `synthFromDocs`): codec lane, schema signature (the template's
    * byte length is interpolated from the SAME Scala constant the
    * synth uses), block/record accounting incl. the STORED-deflate
    * 5-byte-per-block overhead, and the two verdict lanes — all
    * re-derived closed-form from doc_id, so a hash match proves the
    * kernel walked the actual zigzag varints.
    */
  val mmAvroMeta: String =
    s"""WITH m AS (SELECT doc_id, doc_id % 10 = 0 AS invalid,
      |  doc_id % 3 AS cl,
      |  1 + doc_id % 3 AS nb FROM documents),
      |v AS (SELECT *,
      |  list_sum([2 + (doc_id + b) % 4 for b in range(nb)]) AS recs
      |  FROM m)
      |SELECT doc_id,
      |  CASE WHEN invalid THEN 'text/plain' ELSE 'application/avro' END AS media_type,
      |  NOT invalid AS avro_valid,
      |  CASE WHEN invalid THEN NULL
      |    WHEN cl = 2 THEN 'deflate' ELSE 'null' END AS codec,
      |  CASE WHEN invalid THEN NULL ELSE 'record' END AS schema_type,
      |  CASE WHEN invalid THEN NULL
      |    ELSE 'Rec' || (doc_id % 7) END AS schema_name,
      |  (CASE WHEN invalid THEN NULL
      |    ELSE ${graft.expressions.AvroSynthKernel.SchemaLen} END)::BIGINT
      |    AS schema_bytes,
      |  (CASE WHEN invalid THEN NULL
      |    WHEN cl = 0 THEN 1 ELSE 2 END)::BIGINT AS n_meta_entries,
      |  (CASE WHEN invalid THEN NULL ELSE nb END)::BIGINT AS n_blocks,
      |  (CASE WHEN invalid THEN NULL ELSE recs END)::BIGINT AS n_records,
      |  (CASE WHEN invalid THEN NULL
      |    ELSE 6 * recs + CASE WHEN cl = 2 THEN 5 * nb ELSE 0 END END)::BIGINT
      |    AS data_bytes,
      |  CASE WHEN invalid THEN NULL ELSE doc_id % 20 <> 11 END AS sync_ok,
      |  CASE WHEN invalid THEN NULL ELSE TRUE END AS header_consistent
      |FROM v ORDER BY doc_id""".stripMargin

  /** Avro flat-record decode (mirror of `Binary.Avro.recordStats` ∘
    * `synthFromDocs`): record-grain aggregates recomputed from the
    * record closed forms (f1 = (d+i)%30, f2 = 3 chars, f3 = (d+i)%2)
    * while Spark decodes actual zigzag/length-prefixed bytes; the
    * deflate lane refuses (decode_ok false, the tier's contract).
    */
  val mmAvroRecords: String =
    """WITH m AS (SELECT doc_id, doc_id % 10 = 0 AS invalid,
      |  doc_id % 3 = 2 AS deflate,
      |  1 + doc_id % 3 AS nb FROM documents),
      |v AS (SELECT *,
      |  list_sum([2 + (doc_id + b) % 4 for b in range(nb)])::BIGINT AS recs
      |  FROM m),
      |x AS (SELECT *,
      |  list_sum([(doc_id + i) % 30 for i in range(recs)]) AS isum,
      |  list_sum([(doc_id + i) % 2 for i in range(recs)]) AS trues
      |  FROM v)
      |SELECT doc_id, NOT invalid AS avro_valid,
      |  NOT invalid AND NOT deflate AS decode_ok,
      |  (CASE WHEN invalid OR deflate THEN NULL ELSE 3 END)::BIGINT AS n_fields,
      |  (CASE WHEN invalid OR deflate THEN NULL ELSE recs END)::BIGINT AS n_records,
      |  (CASE WHEN invalid OR deflate THEN NULL ELSE isum END)::BIGINT AS int_sum,
      |  (CASE WHEN invalid OR deflate THEN NULL ELSE 3 * recs END)::BIGINT
      |    AS string_bytes,
      |  (CASE WHEN invalid OR deflate THEN NULL ELSE trues END)::BIGINT
      |    AS bool_trues
      |FROM x ORDER BY doc_id""".stripMargin

  /** Parquet footer triage (mirror of `Binary.Parquet.parse` ∘
    * `synthFromDocs`): version/rows/groups/columns and the writer id
    * re-derived closed-form from doc_id — the d%20==13 lane
    * mis-splits row-group rows by one, so `rows_match` is a real
    * integrity verdict — while Spark walks actual thrift-compact
    * field headers. `footer_bytes` doubles as the byte-length
    * closed-form proof (the mixed-triage oracle reuses it).
    */
  val mmParquetMeta: String =
    s"""WITH m AS (SELECT doc_id, doc_id % 10 = 0 AS invalid,
      |  1 + doc_id % 6 AS ncols,
      |  1 + doc_id % 2 AS nrg FROM documents),
      |v AS (SELECT *,
      |  18 + 9 * ncols + 10 * nrg
      |    + CASE WHEN doc_id % 5 = 3 THEN 12 ELSE 0 END
      |    + CASE WHEN doc_id % 2 = 0 THEN 17 ELSE 0 END AS flen,
      |  list_sum([40 + (doc_id + g) % 20 for g in range(nrg)]) AS tbs
      |  FROM m)
      |SELECT doc_id,
      |  CASE WHEN invalid THEN 'text/plain'
      |    ELSE 'application/parquet' END AS media_type,
      |  NOT invalid AS parquet_valid,
      |  (CASE WHEN invalid THEN NULL ELSE 1 + doc_id % 2 END)::BIGINT AS version,
      |  (CASE WHEN invalid THEN NULL ELSE 10 + doc_id % 50 END)::BIGINT AS num_rows,
      |  (CASE WHEN invalid THEN NULL ELSE nrg END)::BIGINT AS n_row_groups,
      |  (CASE WHEN invalid THEN NULL ELSE ncols END)::BIGINT AS n_columns,
      |  (CASE WHEN invalid THEN NULL ELSE 1 + ncols END)::BIGINT
      |    AS n_schema_elements,
      |  (CASE WHEN invalid THEN NULL ELSE tbs END)::BIGINT AS total_byte_size,
      |  CASE WHEN invalid OR doc_id % 2 = 1 THEN NULL
      |    ELSE '${graft.expressions.ParquetSynthKernel.CreatedBy}' END AS created_by,
      |  CASE WHEN invalid THEN NULL ELSE doc_id % 20 <> 13 END AS rows_match,
      |  (CASE WHEN invalid THEN NULL ELSE flen END)::BIGINT AS footer_bytes
      |FROM v ORDER BY doc_id""".stripMargin

  /** Charset decode (mirror of `Charset.decode` ∘ `synthFromDocs`):
    * charset/BOM verdicts from the lane arithmetic, and the decoded
    * text compared VERBATIM against the source column — Spark must
    * reach the identical string by validating UTF-8 byte shapes or
    * decoding UTF-16 code units from the actual encoded bytes, so
    * the hash match proves the byte-level decode round-trips.
    */
  val textCharset: String =
    """SELECT doc_id,
      |  CASE doc_id % 4 WHEN 0 THEN 'utf-8' WHEN 1 THEN 'utf-8'
      |    WHEN 2 THEN 'utf-16le' ELSE 'utf-16be' END AS charset,
      |  doc_id % 4 <> 0 AS had_bom,
      |  TRUE AS confident,
      |  text
      |FROM documents ORDER BY doc_id""".stripMargin

  /** Gzip triage (mirror of `Binary.Gz.parse` ∘ `synthFromDocs`):
    * member/byte/name accounting and the flipped-CRC integrity lane
    * re-derived closed-form from doc_id — Spark must reach the same
    * uncompressed totals by actually INFLATING every member's
    * deflate body and recomputing its CRC32.
    */
  val mmGzipMeta: String =
    """WITH m AS (SELECT doc_id, doc_id % 10 = 0 AS invalid,
      |  1 + doc_id % 3 AS nm FROM documents),
      |v AS (SELECT *,
      |  list_sum([20 + (doc_id + i) % 30 for i in range(nm)])::BIGINT AS tot,
      |  list_sum([CASE WHEN (doc_id + i) % 4 = 0 THEN 1 ELSE 0 END
      |    for i in range(nm)])::BIGINT AS named
      |  FROM m)
      |SELECT doc_id,
      |  CASE WHEN invalid THEN 'text/plain'
      |    ELSE 'application/gzip' END AS media_type,
      |  NOT invalid AS gzip_valid,
      |  (CASE WHEN invalid THEN NULL ELSE nm END)::BIGINT AS n_members,
      |  (CASE WHEN invalid THEN NULL ELSE tot END)::BIGINT AS uncompressed_bytes,
      |  (CASE WHEN invalid THEN NULL ELSE named END)::BIGINT AS n_named,
      |  (CASE WHEN invalid THEN NULL
      |    ELSE 1600000000 + doc_id END)::BIGINT AS first_mtime,
      |  CASE WHEN invalid THEN NULL ELSE doc_id % 20 <> 3 END AS crc_ok,
      |  CASE WHEN invalid THEN NULL ELSE TRUE END AS isize_ok,
      |  CASE WHEN invalid THEN NULL ELSE TRUE END AS header_consistent
      |FROM v ORDER BY doc_id""".stripMargin

  /** Zstd container triage (mirror of `Binary.Zstd.parse` ∘
    * `synthFromDocs`): frame/skippable/block accounting, the FCS
    * declaration lanes ((d+i)%5 — lane 1 omits the size, lane 3 is
    * single-segment, lane 4 the 2-byte offset-256 width with a
    * 256+d%50-byte frame), the (d+i)%6 dictionary-ID lane, the
    * (d+i)%3 checksum lane with d%20==9 flipping the last
    * checksummed frame's XXH64, and the d%7==2 skippable prefix —
    * all re-derived from doc_id, so a hash match proves the kernel
    * walked actual RFC 8878 frame headers and block chains (and
    * verified real XXH64 checksums).
    */
  val mmZstdMeta: String =
    """WITH m AS (SELECT doc_id, doc_id % 10 = 0 AS invalid,
      |  1 + doc_id % 3 AS nf, doc_id % 7 = 2 AS sk FROM documents),
      |v AS (SELECT *,
      |  list_sum([CASE WHEN (doc_id + i) % 5 = 4 THEN 256 + doc_id % 50
      |    ELSE 10 + (doc_id + i) % 40 END for i in range(nf)])::BIGINT AS tot,
      |  list_sum([CASE WHEN (doc_id + i) % 2 = 1 THEN 2 ELSE 1 END
      |    for i in range(nf)])::BIGINT AS nb,
      |  list_sum([CASE WHEN (doc_id + i) % 2 = 1 THEN 1 ELSE 0 END
      |    for i in range(nf)])::BIGINT AS nrle,
      |  list_sum([CASE WHEN (doc_id + i) % 5 = 1 THEN 0 ELSE 1 END
      |    for i in range(nf)])::BIGINT AS ndecl,
      |  list_sum([CASE WHEN (doc_id + i) % 5 = 1 THEN 0
      |    WHEN (doc_id + i) % 5 = 4 THEN 256 + doc_id % 50
      |    ELSE 10 + (doc_id + i) % 40 END for i in range(nf)])::BIGINT AS dbytes,
      |  list_sum([CASE WHEN (doc_id + i) % 6 = 4 THEN 1 ELSE 0 END
      |    for i in range(nf)])::BIGINT AS ndict,
      |  list_sum([CASE WHEN (doc_id + i) % 3 = 1 THEN 0 ELSE 1 END
      |    for i in range(nf)])::BIGINT AS nck
      |  FROM m)
      |SELECT doc_id,
      |  CASE WHEN invalid THEN 'text/plain'
      |    ELSE 'application/zstd' END AS media_type,
      |  NOT invalid AS zstd_valid,
      |  (CASE WHEN invalid THEN NULL ELSE nf END)::BIGINT AS n_frames,
      |  (CASE WHEN invalid THEN NULL
      |    WHEN sk THEN 1 ELSE 0 END)::BIGINT AS n_skippable,
      |  (CASE WHEN invalid THEN NULL
      |    WHEN sk THEN 4 + doc_id % 9 ELSE 0 END)::BIGINT AS skippable_bytes,
      |  (CASE WHEN invalid THEN NULL ELSE nb END)::BIGINT AS n_blocks,
      |  (CASE WHEN invalid THEN NULL ELSE nrle END)::BIGINT AS n_rle_blocks,
      |  (CASE WHEN invalid THEN NULL ELSE 0 END)::BIGINT AS n_compressed_blocks,
      |  (CASE WHEN invalid THEN NULL ELSE tot END)::BIGINT AS uncompressed_bytes,
      |  (CASE WHEN invalid THEN NULL ELSE ndecl END)::BIGINT AS n_declared,
      |  (CASE WHEN invalid THEN NULL ELSE dbytes END)::BIGINT AS declared_bytes,
      |  CASE WHEN invalid OR ndecl = 0 THEN NULL ELSE TRUE END AS size_match,
      |  CASE WHEN invalid THEN NULL ELSE doc_id % 5 = 3 END AS single_segment,
      |  (CASE WHEN invalid OR doc_id % 5 = 3 THEN NULL
      |    ELSE 10 + doc_id % 8 END)::BIGINT AS window_log,
      |  (CASE WHEN invalid OR ndict = 0 THEN NULL
      |    ELSE 1 + doc_id % 255 END)::BIGINT AS dict_id,
      |  (CASE WHEN invalid THEN NULL ELSE nck END)::BIGINT AS n_checksummed,
      |  CASE WHEN invalid THEN NULL ELSE doc_id % 20 <> 9 END AS checksum_ok,
      |  CASE WHEN invalid THEN NULL ELSE TRUE END AS decode_ok,
      |  CASE WHEN invalid THEN NULL ELSE TRUE END AS header_consistent
      |FROM v ORDER BY doc_id""".stripMargin

  /** ICO triage + pixel tier (mirror of `Binary.Ico.parse` ∘
    * `synthFromDocs`): entry-kind rotation ((d+i)%3 → DIB-24 /
    * DIB-32 / real PNG), declared-dims max with the d%20==11
    * width-lie lane, the RGB pixel sum over ALL entries (logical
    * RGB byte k of entry i is (5d+17i+k) mod 256 regardless of
    * container — BGR reorder and zlib wrapping are sum-invariant),
    * and the closed-form entry byte totals (DIB strides 4-aligned +
    * the 4-byte/row AND-mask; PNG = 68 + h·(1+3w) with the
    * stored-deflate zlib wrap) — a hash match proves real zlib
    * inflate, real scanline unfiltering, and the bottom-up stride
    * walk.
    */
  val mmIcoMeta: String =
    """WITH m AS (SELECT doc_id, doc_id % 10 = 0 AS invalid,
      |  1 + doc_id % 3 AS ni FROM documents),
      |v AS (SELECT *,
      |  list_max([CASE WHEN doc_id % 20 = 11 AND i = 0
      |    THEN 5 + (doc_id + i) % 5
      |    ELSE 4 + (doc_id + i) % 5 END for i in range(ni)])::BIGINT AS maxw,
      |  list_max([3 + (doc_id + i) % 4 for i in range(ni)])::BIGINT AS maxh,
      |  list_sum([CASE WHEN (doc_id + i) % 3 = 2 THEN 1 ELSE 0 END
      |    for i in range(ni)])::BIGINT AS npng,
      |  list_sum([list_sum([(5 * doc_id + 17 * i + k) % 256
      |    for k in range(3 * (4 + (doc_id + i) % 5) * (3 + (doc_id + i) % 4))])
      |    for i in range(ni)])::BIGINT AS psum,
      |  list_sum([CASE (doc_id + i) % 3
      |    WHEN 0 THEN 40 + (3 + (doc_id + i) % 4)
      |      * (((3 * (4 + (doc_id + i) % 5) + 3) // 4) * 4)
      |      + 4 * (3 + (doc_id + i) % 4)
      |    WHEN 1 THEN 40 + 4 * (4 + (doc_id + i) % 5) * (3 + (doc_id + i) % 4)
      |      + 4 * (3 + (doc_id + i) % 4)
      |    ELSE 68 + (3 + (doc_id + i) % 4) * (1 + 3 * (4 + (doc_id + i) % 5))
      |    END for i in range(ni)])::BIGINT AS tbytes
      |  FROM m)
      |SELECT doc_id,
      |  CASE WHEN invalid THEN 'text/plain' ELSE 'image/x-icon' END
      |    AS media_type,
      |  NOT invalid AS ico_valid,
      |  (CASE WHEN invalid THEN NULL ELSE ni END)::BIGINT AS n_icons,
      |  (CASE WHEN invalid THEN NULL ELSE npng END)::BIGINT AS n_png_entries,
      |  (CASE WHEN invalid THEN NULL ELSE ni - npng END)::BIGINT
      |    AS n_dib_entries,
      |  (CASE WHEN invalid THEN NULL ELSE maxw END)::BIGINT AS max_width,
      |  (CASE WHEN invalid THEN NULL ELSE maxh END)::BIGINT AS max_height,
      |  CASE WHEN invalid THEN NULL ELSE TRUE END AS entries_ok,
      |  (CASE WHEN invalid THEN NULL ELSE ni END)::BIGINT AS n_decoded,
      |  (CASE WHEN invalid THEN NULL ELSE psum END)::BIGINT AS pixel_sum,
      |  CASE WHEN invalid THEN NULL ELSE doc_id % 20 <> 11 END AS dims_match,
      |  (CASE WHEN invalid THEN NULL ELSE tbytes END)::BIGINT
      |    AS total_image_bytes
      |FROM v ORDER BY doc_id""".stripMargin

  /** Parquet data-page decode (mirror of `Binary.Parquet.pageStats`
    * ∘ `synthFilesFromDocs`): page/chunk accounting, the d%4 codec
    * rotation, the d%3==1 two-page lane, the d%5==2 DICTIONARY lane
    * (a PLAIN dict page + RLE/bit-packed hybrid index pages — the
    * value sum only matches if the kernel resolved real packed
    * indices through the real dictionary), the d%20==7
    * num_values-lie integrity lane, and the PLAIN INT64 value sum —
    * all re-derived from doc_id, so a hash match proves the kernel
    * walked real page-header chains and decompressed real
    * snappy/gzip/zstd page bodies to the exact values.
    */
  val mmParquetPages: String =
    """WITH m AS (SELECT doc_id, doc_id % 10 = 0 AS invalid,
      |  5 + doc_id % 11 AS nv,
      |  CASE WHEN doc_id % 3 = 1 THEN 2 ELSE 1 END AS np,
      |  CASE WHEN doc_id % 5 = 2 THEN 1 ELSE 0 END AS nd
      |  FROM documents),
      |v AS (SELECT *,
      |  -- dict index-page body bytes: bw byte + one bit-packed
      |  -- group of 8 (bw bytes) when the page holds >=8 + 2-byte
      |  -- RLE runs for the rest; two pages split at nv//2
      |  CASE WHEN nv <= 8 THEN 3 ELSE 4 END AS bw,
      |  nv // 2 AS c1 FROM m),
      |w AS (SELECT *,
      |  CASE WHEN np = 2 THEN
      |      (1 + CASE WHEN c1 >= 8 THEN 1 + bw + 2 * (c1 - 8)
      |        ELSE 2 * c1 END)
      |    + (1 + CASE WHEN nv - c1 >= 8 THEN 1 + bw + 2 * (nv - c1 - 8)
      |        ELSE 2 * (nv - c1) END)
      |  ELSE 1 + CASE WHEN nv >= 8 THEN 1 + bw + 2 * (nv - 8)
      |    ELSE 2 * nv END END AS idxbytes FROM v)
      |SELECT doc_id,
      |  CASE WHEN invalid THEN 'text/plain'
      |    ELSE 'application/parquet' END AS media_type,
      |  NOT invalid AS pages_valid,
      |  (CASE WHEN invalid THEN NULL ELSE 1 END)::BIGINT AS n_chunks,
      |  CASE WHEN invalid THEN NULL
      |    ELSE (['uncompressed', 'snappy', 'gzip', 'zstd'])[(doc_id % 4) + 1]
      |    END AS codec,
      |  (CASE WHEN invalid THEN NULL ELSE np + nd END)::BIGINT AS n_pages,
      |  (CASE WHEN invalid THEN NULL ELSE np END)::BIGINT AS n_data_pages,
      |  (CASE WHEN invalid THEN NULL ELSE nd END)::BIGINT AS n_dict_pages,
      |  (CASE WHEN invalid THEN NULL ELSE nv END)::BIGINT AS page_values,
      |  CASE WHEN invalid THEN NULL ELSE doc_id % 20 <> 7 END AS values_match,
      |  (CASE WHEN invalid THEN NULL ELSE 1 END)::BIGINT AS n_decoded_chunks,
      |  (CASE WHEN invalid THEN NULL
      |    ELSE list_sum([(3 * doc_id + j) % 1000 for j in range(nv)])
      |    END)::BIGINT AS int64_sum,
      |  (CASE WHEN invalid THEN NULL
      |    ELSE 8 * nv + nd * idxbytes END)::BIGINT
      |    AS uncompressed_bytes
      |FROM w ORDER BY doc_id""".stripMargin

  /** ORC footer triage (mirror of `Binary.Orc.parse` ∘
    * `synthFromDocs`): stripe/type/column accounting, the
    * compression lane (odd docs wrap the footer in a real ORC zlib
    * chunk whose STORED-deflate framing keeps the length
    * closed-form: raw + 8), and the d%20==17 mis-declared-rows
    * integrity lane — all re-derived from doc_id, so a hash match
    * proves the kernel walked actual protobuf wire format (and
    * inflated the zlib lane's chunk).
    */
  val mmOrcMeta: String =
    """WITH m AS (SELECT doc_id, doc_id % 10 = 0 AS invalid,
      |  1 + doc_id % 3 AS ns,
      |  1 + doc_id % 5 AS ncols,
      |  doc_id % 2 = 1 AS zlib FROM documents),
      |v AS (SELECT *,
      |  16 + 12 * ns + 9 * ncols
      |    + CASE WHEN zlib THEN 8 ELSE 0 END AS stored_len,
      |  list_sum([10 + (doc_id + s) % 30 for s in range(ns)])::BIGINT AS srows
      |  FROM m)
      |SELECT doc_id,
      |  CASE WHEN invalid THEN 'text/plain'
      |    ELSE 'application/orc' END AS media_type,
      |  NOT invalid AS orc_valid,
      |  CASE WHEN invalid THEN NULL
      |    WHEN zlib THEN 'zlib' ELSE 'none' END AS compression,
      |  NOT invalid AS footer_decoded,
      |  (CASE WHEN invalid THEN NULL
      |    ELSE srows + CASE WHEN doc_id % 20 = 17 THEN 1 ELSE 0 END
      |    END)::BIGINT AS num_rows,
      |  (CASE WHEN invalid THEN NULL ELSE ns END)::BIGINT AS n_stripes,
      |  (CASE WHEN invalid THEN NULL ELSE srows END)::BIGINT AS stripe_rows,
      |  (CASE WHEN invalid THEN NULL ELSE 1 + ncols END)::BIGINT AS n_types,
      |  (CASE WHEN invalid THEN NULL ELSE ncols END)::BIGINT AS n_cols,
      |  (CASE WHEN invalid THEN NULL ELSE 5 END)::BIGINT AS content_length,
      |  (CASE WHEN invalid THEN NULL ELSE 1 + doc_id % 5 END)::BIGINT
      |    AS writer_version,
      |  (CASE WHEN invalid THEN NULL ELSE stored_len END)::BIGINT AS footer_bytes,
      |  (CASE WHEN invalid THEN NULL ELSE 0 END)::BIGINT AS metadata_bytes,
      |  CASE WHEN invalid THEN NULL ELSE doc_id % 20 <> 17 END AS stripe_rows_match
      |FROM v ORDER BY doc_id""".stripMargin

  /** Animated GIF frame walk (mirror of `Gif.frames` ∘
    * `synthAnimFromDocs`): per-frame rows re-derived closed-form —
    * frame count / loop / GCE delay / disposal / transparency lanes
    * from doc_id+frame arithmetic, and per-frame channel sums from
    * the palette closed forms (GCT byte k = (5d+3k) mod 256 → the
    * value of color j channel c is (5d+9j+3c) mod 256; the LCT lane
    * (7d+11k+f) mod 256 → (7d+33j+11c+f) mod 256) over pixel
    * indices (d+f+i) mod activeEntries — while Spark must reach the
    * same numbers by walking actual extension blocks and LZW-decoding
    * every frame's real code stream. Invalid (text) docs keep one
    * all-null row (`explode_outer`'s shape).
    */
  val mmGifFrames: String = {
    def chan(c: Int): String =
      s"""list_sum([CASE WHEN lct
         |    THEN (7 * doc_id + 33 * ((doc_id + fi + i) % ae) + 11 * $c + fi) % 256
         |    ELSE (5 * doc_id + 9 * ((doc_id + fi + i) % ae) + 3 * $c) % 256 END
         |  for i in range(0, n)])""".stripMargin
    def peakChan(c: Int): String =
      s"""list_max([CASE WHEN lct
         |    THEN (7 * doc_id + 33 * ((doc_id + fi + i) % ae) + 11 * $c + fi) % 256
         |    ELSE (5 * doc_id + 9 * ((doc_id + fi + i) % ae) + 3 * $c) % 256 END
         |  for i in range(0, n)])""".stripMargin
    s"""WITH m AS (SELECT doc_id, doc_id % 10 = 0 AS invalid,
       |  10 + doc_id % 6 AS cw, 8 + doc_id % 5 AS ch,
       |  (1::BIGINT << ((doc_id % 3 + 2)::INT)) AS e,
       |  1 + doc_id % 4 AS nf FROM documents),
       |fr AS (SELECT doc_id, cw, ch, e, nf, unnest(range(nf)) AS fi
       |  FROM m WHERE NOT invalid),
       |x AS (SELECT doc_id, cw, ch, nf, fi,
       |  (doc_id + fi) % 5 = 2 AS lct,
       |  CASE WHEN (doc_id + fi) % 5 = 2 THEN 4 ELSE e END AS ae,
       |  10 * (2 + (doc_id + fi) % 6) AS delay_ms,
       |  (doc_id + fi) % 4 AS disp,
       |  (doc_id + fi) % 3 = 0 AS tflag,
       |  3 + (doc_id + fi) % 3 AS fw,
       |  2 + (doc_id + fi) % 2 AS fh
       |  FROM fr),
       |s AS (SELECT *, fw * fh AS n FROM x),
       |valid AS (SELECT doc_id, TRUE AS gif_valid,
       |  cw::BIGINT AS canvas_w, ch::BIGINT AS canvas_h,
       |  nf::BIGINT AS n_frames,
       |  (CASE WHEN doc_id % 4 <> 1 THEN doc_id % 7 END)::BIGINT AS loop_count,
       |  (SUM(delay_ms) OVER (PARTITION BY doc_id))::BIGINT AS total_delay_ms,
       |  fi::BIGINT AS frame_idx, delay_ms::BIGINT AS delay_ms,
       |  disp::BIGINT AS disposal,
       |  (CASE WHEN tflag THEN (doc_id + fi) % 4 END)::BIGINT AS transparent_idx,
       |  fi::BIGINT AS frame_left, fi::BIGINT AS frame_top,
       |  fw::BIGINT AS frame_w, fh::BIGINT AS frame_h, lct AS has_lct,
       |  n::BIGINT AS frame_pixels,
       |  (${chan(0)})::BIGINT AS sum_r,
       |  (${chan(1)})::BIGINT AS sum_g,
       |  (${chan(2)})::BIGINT AS sum_b,
       |  (greatest(${peakChan(0)}, ${peakChan(1)}, ${peakChan(2)}))::BIGINT
       |    AS peak_byte
       |  FROM s),
       |inv AS (SELECT doc_id, FALSE AS gif_valid,
       |  NULL::BIGINT AS canvas_w, NULL::BIGINT AS canvas_h,
       |  NULL::BIGINT AS n_frames, NULL::BIGINT AS loop_count,
       |  NULL::BIGINT AS total_delay_ms, NULL::BIGINT AS frame_idx,
       |  NULL::BIGINT AS delay_ms, NULL::BIGINT AS disposal,
       |  NULL::BIGINT AS transparent_idx, NULL::BIGINT AS frame_left,
       |  NULL::BIGINT AS frame_top, NULL::BIGINT AS frame_w,
       |  NULL::BIGINT AS frame_h, NULL::BOOLEAN AS has_lct,
       |  NULL::BIGINT AS frame_pixels, NULL::BIGINT AS sum_r,
       |  NULL::BIGINT AS sum_g, NULL::BIGINT AS sum_b,
       |  NULL::BIGINT AS peak_byte FROM m WHERE invalid)
       |SELECT * FROM valid UNION ALL SELECT * FROM inv
       |ORDER BY doc_id, frame_idx""".stripMargin
  }

  /** JPEG pixel stats (mirror of Jpeg.pixelStats ∘ synthPixelsFromDocs):
    * the oracle recomputes the decoded channel sums closed-form from
    * the flat-tile YCbCr values — including the decoder's EXACT
    * fixed-point YCbCr→RGB arithmetic (libjpeg SCALEBITS-16 constants;
    * `>> 16` mirrored as floor division by 2¹⁶, exact in doubles
    * because 65536 is a power of two) — while Spark must reach the
    * same numbers by actually Huffman-decoding the entropy stream and
    * running the inverse DCT. Since r14 the decoder applies libjpeg
    * FANCY (triangular) chroma upsampling, so the mode-2 (4:2:0
    * multi-tile) lane is recomputed per PIXEL with the h2v2 closed
    * form (3:1 vertical column sums, then 3:1 horizontal with +8/+7
    * rounding, edge replication — the same arithmetic as the spec's
    * `fancy420` mirror, JpegPixelsSpec.scala). A hash match proves
    * the bit-level decode including cross-tile chroma blending.
    */
  val mmJpegPixels: String = {
    def fx(e: String): String = s"CAST(floor(($e) / 65536.0) AS BIGINT)"
    def cl(e: String): String = s"LEAST(255, GREATEST(0, $e))"
    // modes 0/1: per-tile channel lists; mode 0 (grayscale) is y
    val y = "(7 * doc_id + 13 * t) % 256"
    val cb = "((5 * doc_id + 11 * t) % 256 - 128)"
    val cr = "((3 * doc_id + 17 * t) % 256 - 128)"
    val rE = cl(s"$y + ${fx(s"91881 * $cr + 32768")}")
    val gE = cl(s"$y + ${fx(s"-22554 * $cb - 46802 * $cr + 32768")}")
    val bE = cl(s"$y + ${fx(s"116130 * $cb + 32768")}")
    def chan(e: String): String =
      s"[CASE WHEN mode = 0 THEN $y ELSE $e END for t in range(0, nt)]"
    // mode 2: the chroma plane is 8×8 per 16×16 tile; the sample at
    // chroma coords (kk, cyN/cyF) is the tile constant, and colsum is
    // libjpeg's 3:1 vertical blend of near/far chroma rows
    def csamp(mul: Int, step: Int, v: String, kk: String): String =
      s"(($mul * doc_id + $step * ((cy$v // 8) * tw + ($kk) // 8)) % 256)"
    def colsum(mul: Int, step: Int, kk: String): String =
      s"(3 * ${csamp(mul, step, "n", kk)} + ${csamp(mul, step, "f", kk)})"
    def up(mul: Int, step: Int): String = {
      def cs(kk: String) = colsum(mul, step, kk)
      // cW = 8*tw >= 16 on this lane, so libjpeg's cW==1 branch is dead
      s"(CASE WHEN x = 0 THEN (${cs("0")} * 4 + 8) // 16 " +
        s"WHEN x % 2 = 0 THEN (${cs("k")} * 3 + ${cs("k - 1")} + 8) // 16 " +
        s"WHEN k = 8 * tw - 1 THEN (${cs("k")} * 4 + 7) // 16 " +
        s"ELSE (${cs("k")} * 3 + ${cs("k + 1")} + 7) // 16 END)"
    }
    s"""WITH m AS (SELECT doc_id,
       |  doc_id % 3 AS mode,
       |  (2 + doc_id % 3) AS tw,
       |  (1 + (doc_id // 3) % 2) AS th,
       |  CASE WHEN doc_id % 3 = 2 THEN 16 ELSE 8 END AS side,
       |  doc_id % 10 = 0 AS invalid
       |  FROM documents),
       |p AS (SELECT doc_id, invalid, mode, tw, th, tw * th AS nt,
       |  side * side AS ta, tw * th * side * side AS np FROM m),
       |s AS (SELECT doc_id, np, ta,
       |  ${chan(rE)} AS rs,
       |  ${chan(gE)} AS gs,
       |  ${chan(bE)} AS bs
       |  FROM p WHERE mode <> 2 AND NOT invalid),
       |a01 AS (SELECT doc_id,
       |  list_aggregate(rs, 'sum') * ta AS sr,
       |  list_aggregate(gs, 'sum') * ta AS sg,
       |  list_aggregate(bs, 'sum') * ta AS sb,
       |  greatest(list_max(rs), list_max(gs), list_max(bs)) AS peak
       |  FROM s),
       |g AS (SELECT doc_id, tw, th,
       |  unnest(range(0, np)) % (16 * tw) AS x,
       |  unnest(range(0, np)) // (16 * tw) AS y
       |  FROM p WHERE mode = 2 AND NOT invalid),
       |h AS (SELECT doc_id, tw, x,
       |  (7 * doc_id + 13 * ((y // 16) * tw + x // 16)) % 256 AS yv,
       |  x // 2 AS k, y // 2 AS cyn,
       |  LEAST(8 * th - 1, GREATEST(0,
       |    CASE WHEN y % 2 = 0 THEN y // 2 - 1 ELSE y // 2 + 1 END)) AS cyf
       |  FROM g),
       |u AS (SELECT doc_id, yv,
       |  ${up(5, 11)} - 128 AS cb,
       |  ${up(3, 17)} - 128 AS cr
       |  FROM h),
       |rgb AS (SELECT doc_id,
       |  ${cl("yv + " + fx("91881 * cr + 32768"))} AS r,
       |  ${cl("yv + " + fx("-22554 * cb - 46802 * cr + 32768"))} AS g,
       |  ${cl("yv + " + fx("116130 * cb + 32768"))} AS b
       |  FROM u),
       |a2 AS (SELECT doc_id, sum(r) AS sr, sum(g) AS sg, sum(b) AS sb,
       |  max(greatest(r, g, b)) AS peak
       |  FROM rgb GROUP BY doc_id),
       |a AS (SELECT doc_id, sr, sg, sb, peak FROM a01
       |  UNION ALL SELECT doc_id, sr, sg, sb, peak FROM a2)
       |SELECT p.doc_id, NOT invalid AS jpeg_valid,
       |  (CASE WHEN invalid THEN NULL ELSE np END)::BIGINT AS pixels_decoded,
       |  CASE WHEN invalid THEN NULL ELSE sr::DOUBLE / np END AS mean_r,
       |  CASE WHEN invalid THEN NULL ELSE sg::DOUBLE / np END AS mean_g,
       |  CASE WHEN invalid THEN NULL ELSE sb::DOUBLE / np END AS mean_b,
       |  (CASE WHEN invalid THEN NULL ELSE peak END)::BIGINT AS peak_byte
       |FROM p LEFT JOIN a ON p.doc_id = a.doc_id ORDER BY p.doc_id""".stripMargin
  }

  /** PDF triage (mirror of Binary.Pdf.parse ∘ synthFromDocs): every
    * count and flag re-derived from doc_id arithmetic — a hash match
    * proves the regex counts and the startxref back-pointer follow.
    */
  val mmPdfMeta: String =
    """WITH m AS (SELECT doc_id, 1 + doc_id % 4 AS p,
      |  doc_id % 10 = 0 AS invalid, doc_id % 3 = 1 AS xs FROM documents)
      |SELECT doc_id,
      |  CASE WHEN invalid THEN 'text/plain' ELSE 'application/pdf' END AS media_type,
      |  NOT invalid AS pdf_valid,
      |  CASE WHEN invalid THEN NULL
      |    ELSE '1.' || (5 + doc_id % 3)::VARCHAR END AS version,
      |  (CASE WHEN invalid THEN NULL
      |    WHEN xs THEN p + 4 ELSE p + 3 END)::BIGINT AS n_objects,
      |  (CASE WHEN invalid THEN NULL
      |    WHEN xs THEN 2 ELSE 1 END)::BIGINT AS n_streams,
      |  (CASE WHEN invalid THEN NULL ELSE p END)::BIGINT AS n_pages,
      |  CASE WHEN invalid THEN NULL ELSE doc_id % 7 = 0 END AS encrypted,
      |  CASE WHEN invalid THEN NULL
      |    WHEN xs THEN 'stream' ELSE 'table' END AS xref_layout,
      |  (CASE WHEN invalid THEN NULL
      |    WHEN xs THEN p + 5 ELSE p + 4 END)::BIGINT AS declared_size,
      |  CASE WHEN invalid THEN NULL ELSE TRUE END AS startxref_ok,
      |  CASE WHEN invalid THEN NULL ELSE TRUE END AS header_consistent
      |FROM m ORDER BY doc_id""".stripMargin

  /** PDF text extraction (mirror of Binary.Pdf.extractText ∘
    * synthTextFromDocs): the shown text re-derived closed-form from
    * the planted Tj strings — Spark must reach it by slicing the
    * declared /Length and genuinely inflating the FlateDecode bodies.
    */
  lazy val mmPdfText: String =
    s"""WITH m AS (SELECT doc_id, substring(text, 1, 40) AS l1,
       |  doc_id % 10 = 0 AS invalid FROM documents),
       |s AS (SELECT doc_id, invalid,
       |  l1 || ' doc ' || doc_id::VARCHAR || ' page two' AS pt FROM m)
       |SELECT doc_id,
       |  (CASE WHEN invalid THEN 0 ELSE 2 END)::BIGINT AS n_text_streams,
       |  CASE WHEN invalid THEN NULL ELSE pt END AS pdf_text,
       |  CASE WHEN invalid THEN NULL ELSE ${hex64("pt")} END AS pdf_text_hash
       |FROM s ORDER BY doc_id""".stripMargin

  /** Perceptual image dedup (mirror of Binary.imageDedup over the
    * 9×8-flat-tile JPEG synth): with exactly one flat 8px tile per
    * dHash grid cell, each cell mean IS the tile value, so all 64
    * gradient bits — and therefore the hash halves, group sizes and
    * keepers — are closed-form. Spark must reach the same bits by
    * entropy-decoding the JPEGs and average-pooling real pixels.
    */
  lazy val mmImageDedup: String = {
    def tile(off: String): String =
      s"(('0x' || substr(md5('img|' || k::VARCHAR || '|' || " +
      s"(((b // 8) * 9 + (b % 8)$off))::VARCHAR), 1, 2))::BIGINT)"
    def half(lo: Int, hi: Int, shiftBase: String): String =
      s"""list_sum([CASE WHEN ${tile("")} > ${tile(" + 1")}
         |    THEN (1::BIGINT << (b$shiftBase)) ELSE 0::BIGINT END
         |    for b in range($lo, $hi)])""".stripMargin
    s"""WITH m AS (SELECT doc_id, (doc_id // 2) * 2 AS k,
       |  doc_id % 10 = 0 AS invalid FROM documents),
       |h AS (SELECT doc_id, invalid,
       |  CASE WHEN invalid THEN NULL ELSE ${half(32, 64, " - 32")} END AS dhash_hi,
       |  CASE WHEN invalid THEN NULL ELSE ${half(0, 32, "")} END AS dhash_lo
       |  FROM m),
       |g AS (SELECT dhash_hi, dhash_lo, count(*) AS nc, min(doc_id) AS kid
       |  FROM h WHERE NOT invalid GROUP BY 1, 2)
       |SELECT h.doc_id, NOT h.invalid AS image_valid,
       |  h.dhash_hi::BIGINT AS dhash_hi, h.dhash_lo::BIGINT AS dhash_lo,
       |  (CASE WHEN h.invalid THEN NULL ELSE g.nc END)::BIGINT AS n_copies,
       |  (CASE WHEN h.invalid THEN NULL ELSE g.kid END)::BIGINT AS keeper_id,
       |  CASE WHEN h.invalid THEN NULL ELSE h.doc_id = g.kid END AS is_canonical
       |FROM h LEFT JOIN g
       |  ON h.dhash_hi = g.dhash_hi AND h.dhash_lo = g.dhash_lo
       |ORDER BY h.doc_id""".stripMargin
  }

  /** Perceptual audio dedup (mirror of Binary.audioDedup over the
    * windowed WAV synth): one flat window per fingerprint window, so
    * each window's mean absolute amplitude IS |((13k + 29w) mod 1024)
    * − 512| and all 64 gradient bits are closed-form. Spark must
    * reach the same bits by decoding the real LE sample bytes.
    */
  lazy val mmAudioDedup: String = {
    def amp(off: String): String =
      s"abs(((13 * k + 29 * (b$off)) % 1024) - 512)"
    def half(lo: Int, hi: Int, shiftBase: String): String =
      s"""list_sum([CASE WHEN ${amp("")} > ${amp(" + 1")}
         |    THEN (1::BIGINT << (b$shiftBase)) ELSE 0::BIGINT END
         |    for b in range($lo, $hi)])""".stripMargin
    s"""WITH m AS (SELECT doc_id, (doc_id // 2) * 2 AS k,
       |  doc_id % 10 = 0 AS invalid FROM documents),
       |h AS (SELECT doc_id, invalid,
       |  CASE WHEN invalid THEN NULL ELSE ${half(32, 64, " - 32")} END AS ahash_hi,
       |  CASE WHEN invalid THEN NULL ELSE ${half(0, 32, "")} END AS ahash_lo
       |  FROM m),
       |g AS (SELECT ahash_hi, ahash_lo, count(*) AS nc, min(doc_id) AS kid
       |  FROM h WHERE NOT invalid GROUP BY 1, 2)
       |SELECT h.doc_id, NOT h.invalid AS audio_valid,
       |  h.ahash_hi::BIGINT AS ahash_hi, h.ahash_lo::BIGINT AS ahash_lo,
       |  (CASE WHEN h.invalid THEN NULL ELSE g.nc END)::BIGINT AS n_copies,
       |  (CASE WHEN h.invalid THEN NULL ELSE g.kid END)::BIGINT AS keeper_id,
       |  CASE WHEN h.invalid THEN NULL ELSE h.doc_id = g.kid END AS is_canonical
       |FROM h LEFT JOIN g
       |  ON h.ahash_hi = g.ahash_hi AND h.ahash_lo = g.ahash_lo
       |ORDER BY h.doc_id""".stripMargin
  }

  /** MP4/BMFF triage (mirror of Binary.Mp4.parse ∘ synthFromDocs):
    * every field re-derived from doc_id arithmetic — the hash match
    * proves the nested box walk (the planted `free` box shifts moov)
    * and the version-gated mvhd reads.
    */
  val mmMp4Meta: String =
    """WITH m AS (SELECT doc_id,
      |  CASE WHEN doc_id % 3 = 0 THEN 600 ELSE 1000 END AS ts,
      |  doc_id % 10 = 0 AS invalid FROM documents),
      |p AS (SELECT doc_id, invalid, ts,
      |  (1 + doc_id % 50) * ts + doc_id % 97 AS dur FROM m)
      |SELECT doc_id,
      |  CASE WHEN invalid THEN 'text/plain' ELSE 'video/mp4' END AS media_type,
      |  NOT invalid AS mp4_valid,
      |  CASE WHEN invalid THEN NULL
      |    WHEN doc_id % 2 = 0 THEN 'isom' ELSE 'mp42' END AS major_brand,
      |  (CASE WHEN invalid THEN NULL
      |    WHEN doc_id % 5 = 0 THEN 4 ELSE 3 END)::BIGINT AS n_top_boxes,
      |  CASE WHEN invalid THEN NULL ELSE TRUE END AS has_mdat,
      |  (CASE WHEN invalid THEN NULL
      |    WHEN doc_id % 4 = 0 THEN 1 ELSE 0 END)::BIGINT AS mvhd_version,
      |  (CASE WHEN invalid THEN NULL ELSE ts END)::BIGINT AS timescale,
      |  (CASE WHEN invalid THEN NULL ELSE dur END)::BIGINT AS duration,
      |  (CASE WHEN invalid THEN NULL
      |    ELSE (dur * 1000) // ts END)::BIGINT AS duration_ms
      |FROM p ORDER BY doc_id""".stripMargin

  /** Multimodal curation capstone (mirror of Pipeline.wdsCurate over
    * the paired-sample shard synth): per-sample captions, token
    * counts, the closed-form dHash groups (one flat tile per grid
    * cell, pattern keyed by doc so each doc's two samples pair), and
    * the composed keep flag — Spark must reach every field through
    * the tar walk, the regroup, and a real JPEG decode.
    */
  lazy val pipelineMultimodal: String = {
    def tile(off: String): String =
      s"(('0x' || substr(md5('img|' || doc_id::VARCHAR || '|' || " +
      s"(((b // 8) * 9 + (b % 8)$off))::VARCHAR), 1, 2))::BIGINT)"
    def half(lo: Int, hi: Int, shiftBase: String): String =
      s"""list_sum([CASE WHEN ${tile("")} > ${tile(" + 1")}
         |    THEN (1::BIGINT << (b$shiftBase)) ELSE 0::BIGINT END
         |    for b in range($lo, $hi)])""".stripMargin
    s"""WITH m AS (SELECT doc_id, text FROM documents WHERE doc_id % 10 <> 0),
       |s AS (SELECT doc_id, unnest([0, 1]) AS i, text FROM m),
       |e AS (SELECT doc_id,
       |  's' || (2 * doc_id + i)::VARCHAR AS stem,
       |  lpad(doc_id::VARCHAR, 12, '0') || '|' ||
       |    's' || (2 * doc_id + i)::VARCHAR AS key,
       |  substring(text, 1 + 10 * i, (5 + doc_id % 9)::INT) AS cap,
       |  ${half(32, 64, " - 32")} AS hi,
       |  ${half(0, 32, "")} AS lo
       |  FROM s),
       |g AS (SELECT hi, lo, count(*) AS nc, min(key) AS keeper
       |  FROM e GROUP BY 1, 2),
       |f AS (SELECT e.doc_id, e.stem,
       |  len(${toksOf("e.cap")})::BIGINT AS n_caption_tokens,
       |  g.nc, e.key = g.keeper AS is_canonical
       |  FROM e JOIN g ON e.hi = g.hi AND e.lo = g.lo)
       |SELECT doc_id, stem, TRUE AS image_ok, nc::BIGINT AS n_copies,
       |  is_canonical, n_caption_tokens,
       |  n_caption_tokens >= 2 AS caption_ok,
       |  is_canonical AND n_caption_tokens >= 2 AS keep
       |FROM f ORDER BY doc_id, stem""".stripMargin
  }

  /** mbox ingest (mirror of Mbox.parseMessages ∘ messages ∘ synth):
    * every field re-derived closed-form — incl. the mboxrd `>From `
    * unescape the synth plants — so the hash match proves the
    * envelope split and the case-insensitive header parse.
    */
  /** MIME leaf parts (mirror of `Mime.parts` ∘ the MimeSynth lanes):
    * every field re-derived from doc_id + the text column, holding
    * ONLY the DECODED closed forms — the QP lane's `caffè 100%
    * =sign` forces multibyte `=C3=A8` + `=3D` escapes and a soft
    * line break on the wire, the base64 text lane carries a slice of
    * the doc's own text, and the binary attachment's byte sum pins a
    * real base64 decode. Leaf counts: d%3=0 → 2, 1 → 3, 2 → 5 (the
    * nested multipart/alternative lane flattens to two extra
    * leaves). Invalid docs keep one all-null row.
    */
  lazy val mailMimeParts: String =
    """WITH m AS (SELECT doc_id, text, doc_id % 10 = 0 AS invalid,
      |  CASE doc_id % 3 WHEN 0 THEN 2 WHEN 1 THEN 3 ELSE 5 END AS nl
      |  FROM documents),
      |l AS (SELECT doc_id, unnest(range(nl)) AS li FROM m WHERE NOT invalid
      |  UNION ALL SELECT doc_id, NULL AS li FROM m WHERE invalid),
      |v AS (SELECT l.doc_id, l.li, m.invalid,
      |  'part0 doc ' || l.doc_id::VARCHAR || ': caffè 100% =sign, tail y'
      |    || (l.doc_id % 7)::VARCHAR AS p0,
      |  'b64 doc ' || l.doc_id::VARCHAR || ' :: '
      |    || substring(m.text, 1, (40 + l.doc_id % 40)::INT) AS p1,
      |  'plain alt doc ' || l.doc_id::VARCHAR AS p3,
      |  '<b>alt html doc ' || l.doc_id::VARCHAR || '</b>' AS p4,
      |  (30 + l.doc_id % 50)::BIGINT AS blen
      |  FROM l JOIN m USING (doc_id))
      |SELECT doc_id,
      |  NOT invalid AS mime_valid,
      |  li::BIGINT AS part_idx,
      |  CASE WHEN invalid THEN NULL
      |    WHEN li = 2 THEN 'application/octet-stream'
      |    WHEN li = 4 THEN 'text/html'
      |    ELSE 'text/plain' END AS content_type,
      |  CASE WHEN invalid THEN NULL
      |    WHEN li = 0 THEN 'utf-8' WHEN li = 1 THEN 'us-ascii' END AS charset,
      |  CASE WHEN invalid THEN NULL
      |    WHEN li = 0 THEN 'quoted-printable'
      |    WHEN li IN (1, 2) THEN 'base64' ELSE '7bit' END AS encoding,
      |  CASE WHEN invalid THEN NULL ELSE li = 2 END AS is_attachment,
      |  CASE WHEN invalid OR li <> 2 THEN NULL
      |    ELSE 'f' || doc_id::VARCHAR || '.bin' END AS filename,
      |  (CASE WHEN invalid THEN NULL
      |    WHEN li = 0 THEN octet_length(encode(p0))
      |    WHEN li = 1 THEN octet_length(encode(p1))
      |    WHEN li = 2 THEN blen
      |    WHEN li = 3 THEN octet_length(encode(p3))
      |    ELSE octet_length(encode(p4)) END)::BIGINT AS decoded_bytes,
      |  (CASE WHEN invalid OR li <> 2 THEN NULL
      |    ELSE list_sum([(doc_id * 7 + jj * 3) % 256
      |      for jj in range(blen)]) END)::BIGINT AS byte_sum,
      |  CASE WHEN invalid OR li = 2 THEN NULL
      |    WHEN li = 0 THEN p0 WHEN li = 1 THEN p1
      |    WHEN li = 3 THEN p3 WHEN li = 4 THEN p4 END AS decoded_text
      |FROM v ORDER BY doc_id, part_idx""".stripMargin

  /** Mail header decode (mirror of `Mime.headers` ∘ the MimeSynth
    * header lanes): only DECODED strings — the d%4 From lanes prove
    * both RFC 2047 forms on display names (B and Q both decode to
    * `Señor d`), the d%5 Subject lanes additionally pin the §6.2
    * adjacent-encoded-word whitespace drop (lane 3's two words merge
    * to `Tema d año`) and the plain-text-plus-encoded mix (lane 4's
    * separating space SURVIVES).
    */
  lazy val mailHeaders: String =
    """WITH m AS (SELECT doc_id, doc_id % 10 = 0 AS invalid FROM documents)
      |SELECT doc_id,
      |  NOT invalid AS mail_valid,
      |  CASE WHEN invalid THEN NULL
      |    ELSE 'sender' || doc_id::VARCHAR || '@example.com' END AS from_addr,
      |  CASE WHEN invalid OR doc_id % 4 = 0 THEN NULL
      |    WHEN doc_id % 4 = 1 THEN 'Sender ' || doc_id::VARCHAR
      |    ELSE 'Señor ' || doc_id::VARCHAR END AS from_name,
      |  CASE WHEN invalid THEN NULL
      |    ELSE 'rcpt' || doc_id::VARCHAR || '@example.org' END AS to_addr,
      |  CASE WHEN invalid THEN NULL
      |    WHEN doc_id % 5 = 0 THEN 'doc ' || doc_id::VARCHAR || ' plain'
      |    WHEN doc_id % 5 = 4 THEN 'plain then año'
      |    ELSE 'Tema ' || doc_id::VARCHAR || ' año' END AS subject,
      |  CASE WHEN invalid THEN NULL
      |    ELSE 'Mon, ' || (doc_id % 28 + 1)::VARCHAR
      |      || ' Jan 2026 00:00:00 +0000' END AS date_raw,
      |  CASE WHEN invalid THEN NULL
      |    ELSE '<m' || doc_id::VARCHAR || '@example.com>' END AS message_id
      |FROM m ORDER BY doc_id""".stripMargin

  /** SRT/WebVTT cue parse (mirror of `Subtitles.cues` ∘ the
    * `SubtitleSynthKernel` lanes): only DECODED closed forms — the
    * markup-strip + entity chain mirrored EXACTLY
    * (regexp_replace then the &lt;/&gt;/&amp; replaces, in kernel
    * order), the LAST cue re-derived from each doc's REAL text
    * (first 60 chars, newlines → spaces), timings re-derived from
    * doc_id so a hash match proves both stamp grammars parsed.
    */
  lazy val textSubtitles: String =
    """WITH m AS (SELECT doc_id, text, doc_id % 10 = 0 AS invalid,
      |  2 + doc_id % 3 AS n FROM documents),
      |l AS (SELECT doc_id, unnest(range(n)) AS j FROM m WHERE NOT invalid
      |  UNION ALL SELECT doc_id, NULL AS j FROM m WHERE invalid),
      |v AS (SELECT l.doc_id, l.j, m.invalid, m.n,
      |  replace(replace(replace(regexp_replace(
      |    replace(replace(substring(m.text, 1, 60), chr(13), ' '),
      |      chr(10), ' '),
      |    '<[^>]*>', '', 'g'), '&lt;', '<'), '&gt;', '>'), '&amp;', '&')
      |    AS splice
      |  FROM l JOIN m USING (doc_id))
      |SELECT doc_id,
      |  NOT invalid AS sub_valid,
      |  CASE WHEN invalid THEN NULL
      |    WHEN doc_id % 2 = 0 THEN 'srt' ELSE 'vtt' END AS kind,
      |  j::BIGINT AS cue_idx,
      |  (CASE WHEN invalid THEN NULL
      |    ELSE j * 2000 + (doc_id % 7) * 100 END)::BIGINT AS start_ms,
      |  (CASE WHEN invalid THEN NULL
      |    ELSE j * 2000 + (doc_id % 7) * 100 + 1500 + (doc_id % 5) * 20
      |    END)::BIGINT AS end_ms,
      |  (CASE WHEN invalid THEN NULL
      |    ELSE 1500 + (doc_id % 5) * 20 END)::BIGINT AS dur_ms,
      |  CASE WHEN invalid THEN NULL
      |    WHEN j = n - 1 THEN splice
      |    WHEN j = 0 THEN 'Cue 0 of doc ' || doc_id::VARCHAR
      |    WHEN j = 1 THEN 'line one of ' || doc_id::VARCHAR || chr(10)
      |      || 'a & b <c>'
      |    ELSE 'cue ' || j::VARCHAR || ' of doc ' || doc_id::VARCHAR
      |    END AS cue_text
      |FROM v ORDER BY doc_id, cue_idx""".stripMargin

  /** AVIF/HEIC triage (mirror of `AvifMeta` ∘ `AvifSynth`): every
    * field re-derived closed-form from doc_id — a hash match proves
    * the kernel walked the FullBox `meta` tree (ispe dims, iinf
    * item types, auxC, the largesize mdat lane) for real.
    */
  lazy val mmAvifMeta: String =
    """WITH m AS (SELECT doc_id, doc_id % 10 = 0 AS invalid
      |  FROM documents)
      |SELECT doc_id,
      |  NOT invalid AS heif_valid,
      |  CASE WHEN invalid THEN NULL
      |    WHEN doc_id % 2 = 0 THEN 'avif' ELSE 'heic' END AS brand,
      |  (CASE WHEN invalid THEN NULL
      |    ELSE 64 + doc_id % 512 END)::BIGINT AS width,
      |  (CASE WHEN invalid THEN NULL
      |    ELSE 48 + doc_id % 256 END)::BIGINT AS height,
      |  (CASE WHEN invalid THEN NULL
      |    ELSE 1 + doc_id % 3 END)::BIGINT AS n_items,
      |  CASE WHEN invalid THEN NULL
      |    WHEN doc_id % 2 = 0 THEN 'av01' ELSE 'hvc1' END AS primary_type,
      |  CASE WHEN invalid THEN NULL ELSE doc_id % 3 >= 1 END AS has_alpha,
      |  CASE WHEN invalid THEN NULL ELSE doc_id % 3 = 2 END AS has_exif,
      |  (CASE WHEN invalid THEN NULL
      |    ELSE 100 + doc_id % 900 END)::BIGINT AS mdat_bytes
      |FROM m ORDER BY doc_id""".stripMargin

  /** SVG triage (mirror of `SvgMeta` ∘ `SvgSynth`): every field
    * re-derived closed-form from doc_id; the title splices each
    * doc's real first-20 chars through the escape→entity-decode
    * round trip (decode(escape(x)) = x, so the oracle holds the
    * RAW snippet).
    */
  lazy val mmSvgMeta: String =
    """WITH m AS (SELECT doc_id, doc_id % 10 = 0 AS invalid,
      |  100 + doc_id % 400 AS w0, 50 + doc_id % 300 AS h,
      |  replace(replace(substring(text, 1, 20), chr(13), ' '),
      |    chr(10), ' ') AS snip
      |  FROM documents)
      |SELECT doc_id,
      |  NOT invalid AS svg_valid,
      |  (CASE WHEN invalid OR doc_id % 3 = 2 THEN NULL
      |    ELSE w0 + CASE WHEN doc_id % 8 = 5 THEN 0.5 ELSE 0 END
      |    END)::DOUBLE AS width,
      |  (CASE WHEN invalid OR doc_id % 3 = 2 THEN NULL
      |    ELSE h END)::DOUBLE AS height,
      |  (CASE WHEN invalid THEN NULL ELSE w0 END)::DOUBLE AS vb_width,
      |  (CASE WHEN invalid THEN NULL ELSE h END)::DOUBLE AS vb_height,
      |  (CASE WHEN invalid THEN NULL
      |    ELSE doc_id % 4 + (doc_id + 1) % 3
      |      + CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END
      |    END)::BIGINT AS n_shapes,
      |  (CASE WHEN invalid THEN NULL ELSE 1 END)::BIGINT AS n_groups,
      |  (CASE WHEN invalid THEN NULL ELSE doc_id % 3 END)::BIGINT AS n_text,
      |  CASE WHEN invalid THEN NULL ELSE doc_id % 7 = 3 END AS has_script,
      |  CASE WHEN invalid OR doc_id % 4 = 0 THEN NULL
      |    ELSE 'Icon & art ' || doc_id::VARCHAR || ' ' || snip
      |    END AS title
      |FROM m ORDER BY doc_id""".stripMargin

  /** Mojibake repair (mirror of `MojibakeRepair` ∘ `MojibakeSynth`):
    * the oracle holds only the REPAIRED closed forms — the single,
    * DOUBLE, and cp1252-special (`€ ’ ™`, bytes Latin-1 can't
    * explain) lanes must all come back to the clean string, and the
    * clean-accented lane must come back UNTOUCHED, spliced onto each
    * doc's real 40-char prefix.
    */
  lazy val textMojibake: String =
    """WITH m AS (SELECT doc_id, doc_id % 5 AS lane,
      |  replace(replace(substring(text, 1, 40), chr(13), ' '),
      |    chr(10), ' ') AS prefix
      |  FROM documents)
      |SELECT doc_id,
      |  lane IN (2, 3, 4) AS had_mojibake,
      |  (CASE lane WHEN 3 THEN 2 WHEN 0 THEN 0 WHEN 1 THEN 0
      |    ELSE 1 END)::BIGINT AS depth,
      |  prefix || ' | ' ||
      |    CASE lane
      |      WHEN 0 THEN 'plain ' || doc_id::VARCHAR
      |      WHEN 1 THEN 'café é ' || doc_id::VARCHAR
      |      WHEN 2 THEN 'café ' || doc_id::VARCHAR
      |      WHEN 3 THEN 'é ' || doc_id::VARCHAR
      |      ELSE '€ ’ ™ ' || doc_id::VARCHAR
      |    END AS fixed_text
      |FROM m ORDER BY doc_id""".stripMargin

  lazy val mboxMessages: String =
    s"""WITH m AS (SELECT doc_id, text FROM documents WHERE doc_id % 10 <> 0),
       |e AS (
       |  SELECT doc_id, 0::BIGINT AS msg_idx,
       |    'sender' || doc_id::VARCHAR || '@ex.com' AS envelope_from,
       |    'user' || doc_id::VARCHAR || '@example.com' AS from_addr,
       |    substring(text, 1, 60) AS body
       |  FROM m
       |  UNION ALL
       |  SELECT doc_id, 1::BIGINT,
       |    'sender' || (doc_id + 1)::VARCHAR || '@ex.com',
       |    'user' || (doc_id + 1)::VARCHAR || '@example.com',
       |    'line one' || chr(10) || 'From the start' || chr(10) ||
       |      'end ' || doc_id::VARCHAR
       |  FROM m)
       |SELECT doc_id, msg_idx, envelope_from, from_addr,
       |  'doc ' || doc_id::VARCHAR || ' msg ' || msg_idx::VARCHAR AS subject,
       |  '2026-01-0' || (1 + doc_id % 9)::VARCHAR AS date_hdr,
       |  length(body)::BIGINT AS n_body_chars,
       |  ${hex64("body")} AS body_hash
       |FROM e ORDER BY doc_id, msg_idx""".stripMargin

  /** ZIP ingest (mirror of Zip.entries ∘ build synth): names, sizes
    * and content hashes re-derived from the text closed-form — Spark
    * must reach them by walking the real central directory and
    * CRC-verifying a genuine inflate.
    */
  lazy val zipEntries: String =
    s"""WITH m AS (SELECT doc_id, text FROM documents WHERE doc_id % 10 <> 0),
       |e AS (
       |  SELECT doc_id, 0::BIGINT AS entry_idx, 'doc.txt' AS entry_name,
       |    hex(substring(text, 1, 80)::BLOB) AS h FROM m
       |  UNION ALL
       |  SELECT doc_id, 1::BIGINT, 'data.bin',
       |    substring(hex(text::BLOB), 1, ((20 + doc_id % 40) * 2)::INT) FROM m
       |  UNION ALL
       |  SELECT doc_id, 2::BIGINT, 'meta/info.json',
       |    hex(('{"doc":' || doc_id::VARCHAR || '}')::BLOB) FROM m)
       |SELECT doc_id, entry_idx, entry_name,
       |  (length(h) // 2)::BIGINT AS n_bytes,
       |  ${hex64("h")} AS content_hash
       |FROM e ORDER BY doc_id, entry_idx""".stripMargin

  val mmPngMeta: String =
    """WITH m AS (SELECT doc_id,
      |  16 + (doc_id % 7) * 9 AS w,
      |  9 + (doc_id % 5) * 7 AS h,
      |  ([0, 2, 3, 4, 6])[(doc_id % 5) + 1] AS ct,
      |  (doc_id // 3) % 2 AS il,
      |  LEAST(octet_length(text::BLOB), 400) AS dlen,
      |  doc_id % 10 = 0 AS invalid
      |  FROM documents),
      |p AS (SELECT *,
      |  CASE WHEN ct IN (2, 4, 6) THEN (CASE WHEN doc_id % 2 = 0 THEN 8 ELSE 16 END)
      |       WHEN ct = 3 THEN ([1, 2, 4, 8])[((doc_id // 5) % 4) + 1]
      |       ELSE ([1, 2, 4, 8, 16])[((doc_id // 5) % 5) + 1] END AS depth,
      |  CASE ct WHEN 0 THEN 1 WHEN 2 THEN 3 WHEN 3 THEN 1 WHEN 4 THEN 2 ELSE 4 END AS chans
      |  FROM m)
      |SELECT doc_id,
      |  CASE WHEN invalid THEN 'text/plain' ELSE 'image/png' END AS media_type,
      |  NOT invalid AS png_valid,
      |  (CASE WHEN invalid THEN NULL ELSE w END)::BIGINT AS width,
      |  (CASE WHEN invalid THEN NULL ELSE h END)::BIGINT AS height,
      |  (CASE WHEN invalid THEN NULL ELSE depth END)::BIGINT AS bit_depth,
      |  (CASE WHEN invalid THEN NULL ELSE ct END)::BIGINT AS color_type,
      |  (CASE WHEN invalid THEN NULL ELSE chans END)::BIGINT AS channels,
      |  (CASE WHEN invalid THEN NULL ELSE il END)::BIGINT AS interlace,
      |  (CASE WHEN invalid THEN NULL ELSE w * h END)::BIGINT AS n_pixels,
      |  (CASE WHEN invalid THEN NULL ELSE dlen END)::BIGINT AS idat_bytes,
      |  CASE WHEN invalid THEN NULL ELSE TRUE END AS ihdr_crc_ok,
      |  CASE WHEN invalid THEN NULL ELSE TRUE END AS header_consistent
      |FROM p ORDER BY doc_id""".stripMargin

  /** Mirror of Binary.Jpeg.synthFromDocs ∘ parse: every field —
    * including the VARIABLE sof_offset, which moves with the
    * synthesized comment-train lengths — re-derived from doc_id
    * arithmetic, so a hash match proves the codegen segment walk
    * located the frame header in the actual bytes. Offset formula:
    * SOI(2) + APP0(18) + COM1(4+c1) [+ COM2(4+c2) on every third doc]
    * puts the SOF 0xFF at 0-based 24+c1[+4+c2] → 1-based 25+c1[+…].
    */
  val mmJpegMeta: String =
    """WITH m AS (SELECT doc_id,
      |  LEAST(octet_length(text::BLOB), 5 + doc_id % 37) AS c1,
      |  CASE WHEN doc_id % 3 = 0
      |    THEN LEAST(GREATEST(octet_length(text::BLOB) - 5, 0), 3 + doc_id % 11)
      |    ELSE NULL END AS c2,
      |  CASE WHEN doc_id % 5 = 0 THEN 1 ELSE 3 END AS nc,
      |  doc_id % 4 = 0 AS prog,
      |  120 + doc_id % 33 AS h,
      |  160 + doc_id % 21 AS w,
      |  doc_id % 10 = 0 AS invalid
      |  FROM documents)
      |SELECT doc_id,
      |  CASE WHEN invalid THEN 'text/plain' ELSE 'image/jpeg' END AS media_type,
      |  NOT invalid AS jpeg_valid,
      |  (CASE WHEN invalid THEN NULL
      |        ELSE 25 + c1 + COALESCE(4 + c2, 0) END)::BIGINT AS sof_offset,
      |  CASE WHEN invalid THEN NULL ELSE prog END AS progressive,
      |  CASE WHEN invalid THEN NULL ELSE TRUE END AS jfif_present,
      |  (CASE WHEN invalid THEN NULL ELSE 8 END)::BIGINT AS precision_bits,
      |  (CASE WHEN invalid THEN NULL ELSE h END)::BIGINT AS height,
      |  (CASE WHEN invalid THEN NULL ELSE w END)::BIGINT AS width,
      |  (CASE WHEN invalid THEN NULL ELSE nc END)::BIGINT AS n_components,
      |  (CASE WHEN invalid THEN NULL ELSE w * h END)::BIGINT AS n_pixels,
      |  CASE WHEN invalid THEN NULL ELSE TRUE END AS header_consistent
      |FROM m ORDER BY doc_id""".stripMargin

  val dedupEmbedding: String =
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |s AS (SELECT a.vec_id AS q_id, b.vec_id AS cand_id,
       |  list_cosine_similarity(a.v, b.v) AS sim
       |  FROM e a JOIN e b ON b.vec_id <> a.vec_id),
       |r AS (SELECT q_id, cand_id, sim,
       |  row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, cand_id) AS rn
       |  FROM s)
       |SELECT q_id AS vec_id, cand_id AS nn_id, sim, sim >= 0.95 AS is_dup
       |FROM r WHERE rn = 1 ORDER BY vec_id""".stripMargin

  /** Char-level Shannon entropy (mirror of TextAnalysis.charEntropy):
    * per-char ratios through detLn, the term list reassembled in
    * binary char order and folded left-to-right — the same float
    * chain as Spark's sorted-array `aggregate`, so even the entropy
    * double hash-matches.
    */
  val textEntropy: String = {
    val base =
      s"""WITH c AS (SELECT doc_id, [text[i] for i in range(1, len(text)+1)] AS cs
         |  FROM documents WHERE len(text) > 0),
         |u AS (SELECT doc_id, unnest(cs) AS ch FROM c),
         |g AS (SELECT doc_id, ch, count(*)::BIGINT AS cnt FROM u GROUP BY 1, 2),
         |n AS (SELECT doc_id, sum(cnt)::BIGINT AS n_chars,
         |  count(*)::BIGINT AS n_distinct FROM g GROUP BY 1)
         |SELECT g.doc_id, g.ch, n.n_chars, n.n_distinct, g.cnt / n.n_chars AS p
         |FROM g JOIN n ON g.doc_id = n.doc_id""".stripMargin
    val wrapped = detLn(base, "doc_id, ch, n_chars, n_distinct, p", "p", "lnp", "ent")
    s"""WITH agg AS (SELECT doc_id, n_chars, n_distinct,
       |  list(p * lnp ORDER BY ch) AS l
       |  FROM ($wrapped) __ent GROUP BY doc_id, n_chars, n_distinct)
       |SELECT doc_id, n_chars, n_distinct,
       |  -(list_reduce(l, (x, y) -> x + y)) / ${dlit(graft.expressions.DetLn.LN2)}
       |    AS entropy_bits
       |FROM agg ORDER BY doc_id""".stripMargin
  }

  /** Fixed-k per-source sample (mirror of Sampling.stratifiedSample,
    * k=25, salt "strat"): ascending (hex64 mod 2^50, doc_id) rank ≡
    * the Spark TopKByScore (score desc, id asc) order on the negated
    * key.
    */
  val sampleStratified: String =
    s"""WITH h AS (SELECT source, doc_id,
       |  ${hex64("'strat|'||CAST(doc_id AS VARCHAR)")} % ${graft.ops.Sampling.StratModulus} AS sample_key
       |  FROM documents),
       |r AS (SELECT source, doc_id, sample_key,
       |  row_number() OVER (PARTITION BY source ORDER BY sample_key, doc_id) AS rn
       |  FROM h)
       |SELECT source, rn::BIGINT AS rn, doc_id, sample_key
       |FROM r WHERE rn <= 25 ORDER BY source, rn""".stripMargin

  /** Deterministic URL synthesis over documents (mirror of
    * Curation.synthUrls — the testdata has no URL column; the
    * curation operators downstream are the real ones).
    */
  private def urlSynthFrom(rel: String): String =
    s"""SELECT doc_id, source, text,
       |  'https://' ||
       |  (CASE doc_id % 7 WHEN 0 THEN '' WHEN 1 THEN 'www.' WHEN 2 THEN 'cdn.'
       |    WHEN 3 THEN 'm.' WHEN 4 THEN 'a.' WHEN 5 THEN 'b.' ELSE 'c.' END) ||
       |  source || '.' ||
       |  (CASE (doc_id // 3) % 3 WHEN 0 THEN 'com' WHEN 1 THEN 'org' ELSE 'net' END) ||
       |  repeat('/s', (doc_id % 4)::INT) || '/doc' || doc_id::VARCHAR AS url
       |FROM $rel""".stripMargin

  private val UrlSynth: String = urlSynthFrom("documents")

  private val UrlHost: String =
    "split_part(split_part(url, '://', 2), '/', 1)"

  /** URL parsing (mirror of Curation.withUrlParts over synthUrls):
    * host between '://' and the first '/', registered domain = last
    * two labels, path from the same anchored regex Spark's parse_url
    * PATH semantics produce on these URLs.
    */
  val urlDomains: String =
    s"""WITH u AS ($UrlSynth),
       |p AS (SELECT doc_id, url, $UrlHost AS host FROM u)
       |SELECT doc_id, url, host,
       |  regexp_extract(host, '([^.]+\\.[^.]+)$$', 1) AS domain,
       |  regexp_extract(host, '\\.([^.]+)$$', 1) AS tld,
       |  regexp_extract(url, '://[^/]+(/.*)$$', 1) AS path,
       |  (len(string_split(regexp_extract(url, '://[^/]+(/.*)$$', 1), '/')) - 1)::BIGINT
       |    AS path_depth
       |FROM p ORDER BY doc_id""".stripMargin

  /** PSL registered domains (mirror of Curation.withUrlPartsPsl over
    * the suffix-rewritten synth URLs): the SAME rule snapshot rides
    * into both engines from `Curation.PublicSuffixes`, and both run
    * the standard PSL algorithm — exception prevails (suffix = rule
    * minus its leftmost label), else longest match with `*.y`
    * counting len(y)+1 labels, else the final label.
    */
  val urlDomainsPsl: String = {
    val all = graft.ops.Curation.PublicSuffixes
    def sqlList(xs: Seq[String]): String =
      xs.map(x => s"'${x.replace("'", "''")}'").mkString("[", ",", "]")
    val normals = sqlList(all.filterNot(s => s.startsWith("!") || s.startsWith("*.")))
    val wilds = sqlList(all.filter(_.startsWith("*.")))
    val excs = sqlList(all.filter(_.startsWith("!")).map(_.drop(1)))
    s"""WITH u AS ($UrlSynth),
       |r AS (SELECT doc_id, CASE doc_id % 7
       |  WHEN 1 THEN regexp_replace(url, '\\.(com|org|net)/', '.co.uk/')
       |  WHEN 2 THEN regexp_replace(url, '\\.(com|org|net)/', '.com.au/')
       |  WHEN 3 THEN regexp_replace(url, '\\.(com|org|net)/', '.co.jp/')
       |  WHEN 4 THEN regexp_replace(url, '\\.(com|org|net)/', '.github.io/')
       |  WHEN 5 THEN regexp_replace(url, '\\.(com|org|net)/', '.ck/')
       |  WHEN 6 THEN regexp_replace(url, '\\.(com|org|net)/', '.www.ck/')
       |  ELSE url END AS url FROM u),
       |p AS (SELECT doc_id, $UrlHost AS host FROM r),
       |l AS (SELECT doc_id, host, string_split(host, '.') AS ls,
       |  len(string_split(host, '.')) AS n FROM p),
       |m AS (SELECT doc_id, host, ls, n,
       |  list_max([CASE WHEN list_contains($excs,
       |      array_to_string(ls[i:n], '.')) THEN n - i END
       |    for i in range(1, n+1)]) AS exc_l,
       |  list_max([CASE WHEN list_contains($normals,
       |        array_to_string(ls[i:n], '.'))
       |      OR (i < n AND list_contains($wilds,
       |        '*.' || array_to_string(ls[i+1:n], '.')))
       |      THEN n - i + 1 END
       |    for i in range(1, n+1)]) AS match_l FROM l),
       |f AS (SELECT doc_id, host, ls, n,
       |  COALESCE(exc_l, match_l, 1) AS ps FROM m)
       |SELECT doc_id, host,
       |  regexp_extract(host, '([^.]+\\.[^.]+)$$', 1) AS domain,
       |  array_to_string(ls[n-ps+1:n], '.') AS public_suffix,
       |  CASE WHEN n <= ps THEN NULL
       |    ELSE array_to_string(ls[n-ps:n], '.') END AS domain_psl
       |FROM f ORDER BY doc_id""".stripMargin
  }

  /** Per-domain quota cap (mirror of Curation.domainQuota quota=2:
    * stable-hash order within each domain, bounded top-k ≡ the rank
    * window on (sample_key, key)).
    */
  val domainQuota: String =
    s"""WITH u AS ($UrlSynth),
       |p AS (SELECT doc_id, $UrlHost AS host FROM u),
       |d AS (SELECT doc_id, regexp_extract(host, '([^.]+\\.[^.]+)$$', 1) AS domain FROM p),
       |h AS (SELECT domain, doc_id,
       |  ${hex64("'quota|'||CAST(doc_id AS VARCHAR)")} % ${graft.ops.Sampling.StratModulus}
       |    AS sample_key FROM d),
       |r AS (SELECT domain, doc_id, sample_key,
       |  row_number() OVER (PARTITION BY domain ORDER BY sample_key, doc_id) AS rn
       |  FROM h)
       |SELECT domain, rn::BIGINT AS rn, doc_id AS key, sample_key
       |FROM r WHERE rn <= 2 ORDER BY domain, rn""".stripMargin

  /** Incremental quota admission (mirror of initQuotaLedger ∘
    * admitWithQuota × 2 batches at quota=2): batch 1 ranks and admits
    * within its own rows; batch 2's per-domain ranks shift by batch
    * 1's admitted counts and fill only the remaining slots — the
    * admission-ordered contract in closed form.
    */
  val domainQuotaIncremental: String =
    s"""WITH u AS ($UrlSynth),
       |p AS (SELECT doc_id, $UrlHost AS host FROM u),
       |d AS (SELECT doc_id, regexp_extract(host, '([^.]+\\.[^.]+)$$', 1) AS domain FROM p),
       |h AS (SELECT domain, doc_id,
       |  ${hex64("'quota|'||CAST(doc_id AS VARCHAR)")} % ${graft.ops.Sampling.StratModulus}
       |    AS sample_key FROM d),
       |r1 AS (SELECT domain, doc_id,
       |  row_number() OVER (PARTITION BY domain ORDER BY sample_key, doc_id) AS rn
       |  FROM h WHERE doc_id < 250),
       |a1 AS (SELECT domain, doc_id, rn FROM r1 WHERE rn <= 2),
       |used AS (SELECT domain, count(*)::BIGINT AS n FROM a1 GROUP BY 1),
       |r2 AS (SELECT domain, doc_id,
       |  row_number() OVER (PARTITION BY domain ORDER BY sample_key, doc_id) AS rn
       |  FROM h WHERE doc_id >= 250),
       |a2 AS (SELECT r2.domain, r2.doc_id,
       |  (r2.rn + coalesce(used.n, 0))::BIGINT AS ar
       |  FROM r2 LEFT JOIN used ON used.domain = r2.domain
       |  WHERE r2.rn <= 2 - coalesce(used.n, 0))
       |SELECT 1::BIGINT AS batch, domain, doc_id AS key,
       |  rn::BIGINT AS admission_rank FROM a1
       |UNION ALL
       |SELECT 2::BIGINT, domain, doc_id, ar FROM a2
       |ORDER BY batch, domain, admission_rank""".stripMargin

  /** Blocklist anti-join (mirror of Curation.dropBlocklisted with
    * subdomain semantics: host = blocked OR host endswith '.'+blocked).
    */
  val domainBlocklist: String =
    s"""WITH u AS ($UrlSynth),
       |p AS (SELECT doc_id, $UrlHost AS host FROM u),
       |b AS (SELECT unnest(['src0.com', 'src1.org', 'src2.net']) AS blocked)
       |SELECT doc_id, host FROM p
       |WHERE NOT EXISTS (SELECT 1 FROM b
       |  WHERE p.host = b.blocked OR p.host LIKE '%.' || b.blocked)
       |ORDER BY doc_id""".stripMargin

  /** URL canonicalization (mirror of Curation.canonicalizeUrl over
    * deterministically-dirtied synth URLs): fragment strip, tracking-
    * param drop, surviving-param sort, authority lowercase, default
    * port + trailing-slash strip — every step one regex/list op with
    * identical semantics in both engines (DuckDB regexp_replace is
    * first-match, matching Spark on these anchored/tail patterns).
    */
  val urlCanonicalize: String =
    s"""WITH u AS ($UrlSynth),
       |m AS (SELECT doc_id,
       |  CASE doc_id % 5
       |    WHEN 0 THEN url
       |    WHEN 1 THEN url || '#section2'
       |    WHEN 2 THEN url || '?utm_source=feed&b=2&a=1'
       |    WHEN 3 THEN url || '?z=9&utm_campaign=x&a=1#frag'
       |    ELSE replace(url, 'https://', 'HTTPS://') || '/'
       |  END AS url_messy FROM u),
       |s1 AS (SELECT doc_id, url_messy,
       |  regexp_replace(url_messy, '#.*', '') AS nofrag FROM m),
       |s2 AS (SELECT doc_id, url_messy,
       |  regexp_replace(nofrag, '\\?.*', '') AS base,
       |  coalesce(regexp_extract(nofrag, '\\?(.*)', 1), '') AS query FROM s1),
       |s3 AS (SELECT doc_id, url_messy, query,
       |  regexp_replace(lower(regexp_extract(base,
       |    '^([A-Za-z][A-Za-z0-9+.-]*://[^/]*)', 1)), ':(80|443)$$', '') AS auth,
       |  regexp_replace(regexp_replace(base,
       |    '^[A-Za-z][A-Za-z0-9+.-]*://[^/]*', ''), '/$$', '') AS path FROM s2),
       |s4 AS (SELECT doc_id, url_messy, auth, path,
       |  coalesce(array_to_string(list_sort(list_filter(string_split(query, '&'),
       |    p -> NOT (p LIKE 'utm_%' OR p LIKE 'gclid=%'
       |      OR p LIKE 'fbclid=%' OR p = ''))), '&'), '') AS q FROM s3)
       |SELECT doc_id, url_messy,
       |  auth || path || (CASE WHEN q = '' THEN '' ELSE '?' || q END)
       |    AS url_canonical,
       |  (url_messy <> auth || path ||
       |    (CASE WHEN q = '' THEN '' ELSE '?' || q END)) AS changed
       |FROM s4 ORDER BY doc_id""".stripMargin

  /** Composed URL-curation pipeline (mirror of Curation.curateCorpus
    * over collision-planted messy synth URLs): every determinant is a
    * closed-form function of the quotient key `k = doc_id div 2 · 2`
    * (so consecutive docs collide on canonical URL when their messy
    * variants carry no surviving query), the canonical URL is written
    * directly from the synthesis+canonicalization algebra, and each
    * stage flag is its own proven chain (quota rank window, min-keeper
    * per canonical, list_filter wordlist, blocklist lambda).
    */
  val pipelineCurate: String =
    s"""WITH kk AS (SELECT doc_id, text, (doc_id // 2) * 2 AS k FROM documents),
       |u AS (SELECT doc_id, text, k,
       |  (CASE k % 7 WHEN 0 THEN '' WHEN 1 THEN 'www.' WHEN 2 THEN 'cdn.'
       |    WHEN 3 THEN 'm.' WHEN 4 THEN 'a.' WHEN 5 THEN 'b.' ELSE 'c.' END) AS sub,
       |  'src' || (k % 20)::VARCHAR AS src2,
       |  (CASE (k // 3) % 3 WHEN 0 THEN 'com' WHEN 1 THEN 'org' ELSE 'net' END) AS tld
       |  FROM kk),
       |p AS (SELECT doc_id, text,
       |  sub || src2 || '.' || tld AS host,
       |  src2 || '.' || tld AS domain,
       |  'https://' || sub || src2 || '.' || tld ||
       |    repeat('/s', (k % 4)::INT) || '/doc' || k::VARCHAR ||
       |    (CASE doc_id % 5 WHEN 2 THEN '?a=1&b=2' WHEN 3 THEN '?a=1&z=9'
       |      ELSE '' END) AS canonical_url
       |  FROM u),
       |q AS (SELECT doc_id, domain,
       |  row_number() OVER (PARTITION BY domain ORDER BY
       |    ${hex64("'quota|'||CAST(doc_id AS VARCHAR)")} % ${graft.ops.Sampling.StratModulus},
       |    doc_id) AS rn FROM p),
       |urlk AS (SELECT canonical_url, min(doc_id) AS keeper FROM p GROUP BY 1),
       |c AS (SELECT doc_id,
       |  len(list_filter($Toks, x -> list_contains(['slow', 'merge', 'window'], x)))::BIGINT
       |    AS n_blocked_hits FROM documents)
       |SELECT p.doc_id, p.host, p.domain, p.canonical_url,
       |  (len(list_filter(['src0.com', 'src1.org', 'src2.net'],
       |    bd -> p.host = bd OR p.host LIKE '%.' || bd)) > 0) AS domain_blocked,
       |  (q.rn <= 5) AS quota_keep,
       |  (p.doc_id = urlk.keeper) AS url_keep,
       |  c.n_blocked_hits, (c.n_blocked_hits <= 2) AS content_keep,
       |  (NOT (len(list_filter(['src0.com', 'src1.org', 'src2.net'],
       |      bd -> p.host = bd OR p.host LIKE '%.' || bd)) > 0)
       |    AND q.rn <= 5 AND p.doc_id = urlk.keeper
       |    AND c.n_blocked_hits <= 2) AS keep
       |FROM p
       |JOIN q ON q.doc_id = p.doc_id
       |JOIN urlk ON urlk.canonical_url = p.canonical_url
       |JOIN c ON c.doc_id = p.doc_id
       |ORDER BY p.doc_id""".stripMargin

  /** Token-level content blocklist (mirror of Curation.blocklistTerms
    * over ['slow','merge','window'], maxHits=2): list_filter against
    * the literal wordlist, distinct via list_distinct — pure per-row,
    * no join in either engine.
    */
  val textWordBlocklist: String =
    s"""WITH t AS (SELECT doc_id, $Toks AS toks FROM documents),
       |f AS (SELECT doc_id,
       |  list_filter(toks, x -> list_contains(['slow', 'merge', 'window'], x)) AS hits
       |  FROM t)
       |SELECT doc_id, len(hits)::BIGINT AS n_blocked_hits,
       |  len(list_distinct(hits))::BIGINT AS n_blocked_distinct,
       |  (len(hits) <= 2) AS keep
       |FROM f ORDER BY doc_id""".stripMargin

  /** Line-level boilerplate strip (mirror of Boilerplate
    * .stripBoilerplate over synthBoilerplate, minDf=5, group=source):
    * per-(source, line-hash) doc frequency, boilerplate = df ≥ 5,
    * survivors re-joined positionally — string_agg ORDER BY pos skips
    * the CASE's NULLs exactly as collect_list does.
    */
  val textStripBoilerplate: String =
    s"""WITH b AS (SELECT doc_id, source,
       |  'NAV home about contact ' || source || chr(10) ||
       |  (CASE WHEN doc_id % 3 = 0
       |    THEN 'PROMO subscribe now ' || source || chr(10) ELSE '' END) ||
       |  text || chr(10) || 'FOOTER copyright example inc' AS text
       |  FROM documents),
       |p AS (SELECT doc_id, source AS grp,
       |  string_split(text, chr(10)) AS parts FROM b),
       |l AS (SELECT doc_id, grp, unnest(parts) AS line,
       |  generate_subscripts(parts, 1) - 1 AS pos FROM p),
       |h AS (SELECT doc_id, grp, pos, line,
       |  ${hex64("'bp|'||line")} AS line_hash FROM l),
       |df AS (SELECT grp, line_hash, count(DISTINCT doc_id) AS line_df
       |  FROM h GROUP BY 1, 2)
       |SELECT h.doc_id, count(*)::BIGINT AS n_lines,
       |  sum(CASE WHEN df.line_df >= 5 THEN 1 ELSE 0 END)::BIGINT
       |    AS n_boiler_removed,
       |  coalesce(string_agg(CASE WHEN df.line_df < 5 THEN h.line END,
       |    chr(10) ORDER BY h.pos), '') AS clean_text
       |FROM h JOIN df ON df.grp = h.grp AND df.line_hash = h.line_hash
       |GROUP BY 1 ORDER BY 1""".stripMargin

  /** Per-domain curation profile (mirror of Curation.domainStats
    * quota=2; quota_util is one IEEE division of exact integers).
    */
  val domainStats: String =
    s"""WITH u AS ($UrlSynth),
       |p AS (SELECT doc_id, $UrlHost AS host FROM u),
       |d AS (SELECT doc_id, host,
       |  regexp_extract(host, '([^.]+\\.[^.]+)$$', 1) AS domain FROM p)
       |SELECT domain, count(*)::BIGINT AS n_pages,
       |  count(DISTINCT host)::BIGINT AS n_hosts,
       |  least(count(*), 2)::BIGINT AS n_kept,
       |  count(*)::DOUBLE / ${dlit(2.0)} AS quota_util
       |FROM d GROUP BY domain ORDER BY domain""".stripMargin

  /** Per-domain content-quality rollup (mirror of
    * Curation.domainQuality over synthUrls, with every doc_id % 5 == 0
    * page rewritten to a per-source mirror template so the duplicate
    * rate binds): integer sums with ONE final IEEE division per
    * signal; the duplicate rate keys on the same hex64 content
    * fingerprint both engines compute.
    */
  val domainQuality: String =
    s"""WITH docs2 AS (SELECT doc_id, source,
       |  CASE WHEN doc_id % 5 = 0 THEN 'mirror landing page ' || source
       |    ELSE text END AS text FROM documents),
       |u AS (${urlSynthFrom("docs2")}),
       |p AS (SELECT doc_id, text, $UrlHost AS host FROM u),
       |d AS (SELECT doc_id, text, host,
       |  regexp_extract(host, '([^.]+\\.[^.]+)$$', 1) AS domain FROM p),
       |m AS (SELECT domain, host, ${toksOf("text")} AS toks,
       |  length(lower(text))::BIGINT AS n_chars,
       |  length(regexp_replace(lower(text),
       |    '${graft.text.TextAnalysis.PunctKeepClass}', '', 'g'))::BIGINT AS n_punct
       |  FROM d),
       |g AS (SELECT domain, host,
       |  len(toks)::BIGINT AS n_toks, n_chars, n_punct,
       |  ${hex64("array_to_string(toks,' ')")} AS fp FROM m)
       |SELECT domain, count(*)::BIGINT AS n_pages,
       |  count(DISTINCT host)::BIGINT AS n_hosts,
       |  sum(n_toks)::BIGINT AS n_tokens,
       |  sum(n_toks)::DOUBLE / count(*)::DOUBLE AS mean_doc_tokens,
       |  CASE WHEN sum(n_chars) > 0
       |    THEN sum(n_punct)::DOUBLE / sum(n_chars)::DOUBLE END AS punct_ratio,
       |  1.0::DOUBLE - count(DISTINCT fp)::DOUBLE / count(*)::DOUBLE AS dup_rate
       |FROM g GROUP BY domain ORDER BY domain""".stripMargin

  /** Host-level web link graph (mirror of Html.extractLinks +
    * hostEdges over the link-planted scaffold): both quote-style href
    * patterns, literal entity decode, scheme-aware resolution, one
    * keyed agg — every constant rides in from the Html object.
    */
  /** Scaffold-wrap CTEs (u, p, m) shared by all link-graph oracles —
    * every byte rides in from the Html constants.
    */
  private lazy val linkWrapCtes: String = {
    import graft.text.Html
    s"""u AS ($UrlSynth),
       |p AS (SELECT doc_id, text, $UrlHost AS host FROM u),
       |m AS (SELECT doc_id, host,
       |  ${slit(Html.LinkScaffoldA)} || text || ${slit(Html.LinkScaffoldB)} ||
       |  ((doc_id * 7 + 3) % 20)::VARCHAR || ${slit(Html.LinkScaffoldC)} ||
       |  ((doc_id * 7 + 3) % 20)::VARCHAR || ${slit(Html.LinkScaffoldC2)} ||
       |  (doc_id % 5)::VARCHAR || ${slit(Html.LinkScaffoldC3)} ||
       |  doc_id::VARCHAR || ${slit(Html.LinkScaffoldD)} AS h FROM p)""".stripMargin
  }

  /** Scheme-aware destination-host CASE over a decoded `href` seen on
    * `src` — the linkDstHost mirror.
    */
  private def dstHostCase(href: String, src: String): String =
    s"""CASE WHEN regexp_matches($href, '(?i)^https?://')
       |    THEN lower(regexp_extract($href, '(?i)^https?://([^/?#]+)', 1))
       |  WHEN starts_with($href, '//')
       |    THEN lower(regexp_extract($href, '^//([^/?#]+)', 1))
       |  WHEN regexp_matches($href, '^[A-Za-z][A-Za-z0-9+.-]*:') THEN NULL
       |  ELSE $src END""".stripMargin

  private lazy val linkResolveCtes: String = {
    import graft.text.Html
    val decoded = Html.Entities.foldLeft("href0") {
      case (acc, (ent, ch)) => s"replace($acc, ${slit(ent)}, ${slit(ch)})" }
    val dq = Html.HrefDq.replace("'", "''")
    val sq = Html.HrefSq.replace("'", "''")
    s"""$linkWrapCtes,
       |hr AS (SELECT doc_id, host, unnest(list_concat(
       |  regexp_extract_all(h, '$dq', 1),
       |  regexp_extract_all(h, '$sq', 1))) AS href0 FROM m),
       |d AS (SELECT doc_id, host, $decoded AS href FROM hr),
       |r AS (SELECT host AS src_host,
       |  ${dstHostCase("href", "host")} AS dst_host FROM d)""".stripMargin
  }

  /** Anchor-term index (mirror of Html.anchorTerms over the planted
    * scaffold): the anchor pattern captures (href, inner markup) per
    * quote style; DuckDB's parallel unnest zips the two capture
    * lists positionally; anchor markup goes through the extractText
    * rules (tag strip → literal entity decode → collapse) before the
    * shared tokenizer.
    */
  lazy val webAnchorTerms: String = {
    import graft.text.Html
    val adq = Html.AnchorDq.replace("'", "''")
    val asq = Html.AnchorSq.replace("'", "''")
    val decodedHref = Html.Entities.foldLeft("href0") {
      case (acc, (ent, ch)) => s"replace($acc, ${slit(ent)}, ${slit(ch)})" }
    val decodedAnchor = Html.Entities.foldLeft(
      s"regexp_replace(a0, '${Html.AnyTag}', ' ', 'g')") {
      case (acc, (ent, ch)) => s"replace($acc, ${slit(ent)}, ${slit(ch)})" }
    val atxt =
      s"trim(regexp_replace($decodedAnchor, '${Html.WhitespaceClass}', ' ', 'g'))"
    s"""WITH $linkWrapCtes,
       |anchors AS (SELECT doc_id, host,
       |  unnest(list_concat(regexp_extract_all(h, '$adq', 1),
       |    regexp_extract_all(h, '$asq', 1))) AS href0,
       |  unnest(list_concat(regexp_extract_all(h, '$adq', 2),
       |    regexp_extract_all(h, '$asq', 2))) AS a0 FROM m),
       |dd AS (SELECT host AS src_host, $decodedHref AS href,
       |  $atxt AS atxt FROM anchors),
       |rr AS (SELECT src_host,
       |  ${dstHostCase("href", "src_host")} AS dst_host,
       |  ${toksOf("atxt")} AS toks FROM dd),
       |tok AS (SELECT src_host, dst_host, unnest(toks) AS token
       |  FROM rr WHERE dst_host IS NOT NULL)
       |SELECT dst_host, token, count(*)::BIGINT AS n,
       |  count(DISTINCT src_host)::BIGINT AS n_hosts
       |FROM tok GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
  }

  lazy val webLinkGraph: String =
    s"""WITH $linkResolveCtes
       |SELECT src_host, dst_host, count(*)::BIGINT AS n_links,
       |  src_host = dst_host AS is_internal
       |FROM r WHERE dst_host IS NOT NULL
       |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** Host link-graph components (mirror of Graph.hostClusters over
    * the external edge set): symmetric closure + min-label reachability
    * as a recursive CTE — the dedupClusters idiom with host labels.
    */
  lazy val webHostClusters: String =
    s"""WITH RECURSIVE $linkResolveCtes,
       |edges AS (SELECT DISTINCT src_host AS a, dst_host AS b FROM r
       |  WHERE dst_host IS NOT NULL AND dst_host <> src_host),
       |nodes AS (SELECT a AS hh FROM edges UNION SELECT b FROM edges),
       |sym AS (SELECT a, b FROM edges UNION ALL SELECT b AS a, a AS b FROM edges),
       |reach(hh, label) AS (
       |  SELECT hh, hh FROM nodes
       |  UNION
       |  SELECT s.a, rr.label FROM sym s JOIN reach rr ON rr.hh = s.b)
       |SELECT hh AS host, min(label) AS cluster_host,
       |  hh = min(label) AS is_canonical
       |FROM reach GROUP BY hh ORDER BY host""".stripMargin

  /** Host PageRank over the extracted link graph (mirror of
    * Html.hostEdges → Graph.pageRank, internal edges dropped): the
    * [[qPagerank]] unrolled int64 fixed-point over the
    * [[linkResolveCtes]] edge set.
    */
  lazy val webPagerank: String = {
    val iters = 10
    val scale = graft.ops.Graph.Scale
    val base = 15L * scale / 100L
    val iterCtes = (1 to iters).map { i =>
      s"""pr$i AS (SELECT d.node, d.outdeg,
         |  ($base + (85 * coalesce(s.s, 0)) // 100)::BIGINT AS rank_fp
         |  FROM degs d LEFT JOIN (
         |    SELECT e.dst AS node, sum(r.rank_fp // r.outdeg)::BIGINT AS s
         |    FROM edges e JOIN pr${i - 1} r ON r.node = e.src GROUP BY 1) s
         |  ON s.node = d.node)""".stripMargin
    }.mkString(",\n")
    s"""WITH $linkResolveCtes,
       |edges AS (SELECT DISTINCT src_host AS src, dst_host AS dst FROM r
       |  WHERE dst_host IS NOT NULL AND dst_host <> src_host),
       |degs AS (SELECT src AS node, count(*)::BIGINT AS outdeg
       |  FROM edges GROUP BY 1),
       |pr0 AS (SELECT node, outdeg, $scale::BIGINT AS rank_fp FROM degs),
       |$iterCtes
       |SELECT node, outdeg, rank_fp,
       |  rank_fp::DOUBLE / ${dlit(scale.toDouble)} AS pagerank
       |FROM pr$iters ORDER BY rank_fp DESC, node LIMIT 50""".stripMargin
  }

  /** Politeness crawl waves (mirror of Curation.crawlWaves over the
    * registered domain at perWave=3 with the hex64 priority): rank =
    * exclusive count of earlier frontier rows per key in (priority,
    * url) order; wave = rank div 3.
    */
  val crawlFrontier: String =
    s"""WITH u AS ($UrlSynth),
       |p AS (SELECT doc_id, url, $UrlHost AS host FROM u),
       |d AS (SELECT url,
       |  regexp_extract(host, '([^.]+\\.[^.]+)$$', 1) AS dom,
       |  ${hex64("'frontier|' || doc_id::VARCHAR")} AS priority FROM p),
       |c AS (SELECT url, dom AS host, priority,
       |  coalesce(sum(1) OVER (PARTITION BY dom ORDER BY priority, url
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT
       |    AS host_rank
       |  FROM d)
       |SELECT url, host, priority, host_rank,
       |  (host_rank // 3)::BIGINT AS wave
       |FROM c ORDER BY url""".stripMargin

  /** Token-budget fill (mirror of Sampling.tokenBudget at budget=600
    * with the hex64 priority): the kept set is the longest prefix of
    * the per-source (priority, doc_id) stream whose cumulative token
    * mass fits — cum_before over ALL earlier docs, integer arithmetic
    * throughout.
    */
  val sampleTokenBudget: String =
    s"""WITH t AS (SELECT doc_id, source AS grp,
       |  len($Toks)::BIGINT AS n_tokens,
       |  ${hex64("'budget|' || doc_id::VARCHAR")} AS priority
       |  FROM documents),
       |c AS (SELECT doc_id, grp, n_tokens, priority,
       |  coalesce(sum(n_tokens) OVER (PARTITION BY grp
       |    ORDER BY priority, doc_id
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT
       |    AS cum_before
       |  FROM t)
       |SELECT doc_id, grp, n_tokens, priority, cum_before,
       |  cum_before + n_tokens <= 600 AS keep
       |FROM c ORDER BY doc_id""".stripMargin

  /** Exact pairwise source-overlap matrix (mirror of
    * Pipeline.sourceOverlap with the planted shared templates):
    * distinct (source, fingerprint) grain, self-join on fingerprint,
    * integer counts with one IEEE division per ratio.
    */
  val sourceOverlap: String =
    s"""WITH docs2 AS (SELECT doc_id, source,
       |  CASE WHEN doc_id % 7 = 0
       |    THEN 'shared boilerplate page ' || (doc_id % 3)::VARCHAR
       |    ELSE text END AS text FROM documents),
       |t AS (SELECT source, ${toksOf("text")} AS toks FROM docs2),
       |fp AS (SELECT DISTINCT source AS grp,
       |  ${hex64("array_to_string(toks,' ')")} AS fp FROM t),
       |sizes AS (SELECT grp, count(*)::BIGINT AS n FROM fp GROUP BY 1),
       |pairs AS (SELECT a.grp AS grp_a, b.grp AS grp_b,
       |  count(*)::BIGINT AS n_common
       |  FROM fp a JOIN fp b ON a.fp = b.fp AND a.grp < b.grp GROUP BY 1, 2)
       |SELECT grp_a, grp_b, n_common, sa.n AS n_a, sb.n AS n_b,
       |  n_common::DOUBLE / (sa.n + sb.n - n_common)::DOUBLE AS jaccard,
       |  n_common::DOUBLE / sa.n::DOUBLE AS containment_a,
       |  n_common::DOUBLE / sb.n::DOUBLE AS containment_b
       |FROM pairs JOIN sizes sa ON sa.grp = grp_a
       |  JOIN sizes sb ON sb.grp = grp_b
       |ORDER BY grp_a, grp_b""".stripMargin

  /** RFC 9309 robots gate (mirror of Curation.applyRobots over
    * synthRobots): precedence = longest matching prefix, Allow wins a
    * length tie — encoded as arg_max over the composite key
    * `2*len + allow` (strictly longer beats; equal length differs
    * only in the allow bit, and identical keys carry identical allow
    * verdicts, so the argmax is deterministic and equals Spark's
    * replace-on-longer-or-tie-allow fold). The rule rows ride in from
    * the same `Curation.RobotsSynthRules` constant.
    */
  val robotsGate: String = {
    val rl = graft.ops.Curation.RobotsSynthRules
      .map { case (sel, p, a) => s"('$sel', '$p', $a)" }.mkString(", ")
    s"""WITH u AS ($UrlSynth),
       |p AS (SELECT doc_id, $UrlHost AS host,
       |  regexp_extract(url, '://[^/]+(/.*)$$', 1) AS path FROM u),
       |rl(sel, path_prefix, allow) AS (VALUES $rl),
       |rules AS (SELECT h.host, r.path_prefix, r.allow
       |  FROM (SELECT DISTINCT host FROM p) h JOIN rl r
       |    ON r.sel = '*' OR r.sel = regexp_extract(h.host, '([^.]+)$$', 1)),
       |m AS (SELECT p.doc_id, r.path_prefix, r.allow
       |  FROM p LEFT JOIN rules r ON r.host = p.host
       |    AND starts_with(coalesce(p.path, ''), r.path_prefix)),
       |b AS (SELECT doc_id,
       |  coalesce(arg_max(allow, 2 * length(path_prefix) + allow::INT), true)
       |    AS robots_allowed,
       |  max(length(path_prefix))::INT AS robots_rule_len
       |  FROM m GROUP BY doc_id)
       |SELECT p.doc_id, p.host, p.path, b.robots_allowed, b.robots_rule_len
       |FROM p JOIN b USING (doc_id) ORDER BY p.doc_id""".stripMargin
  }

  /** Best-copy exact dedup (mirror of Dedup.keepBest): the keeper is
    * the (quality_score DESC, doc_id ASC) head of each fingerprint
    * group — the same argmax the Spark struct-max computes; the
    * quality double is the textQuality float chain verbatim.
    */
  val dedupKeepBest: String =
    s"""WITH t AS (SELECT doc_id, lower(text) AS txt, $Toks AS toks FROM documents),
       |m AS (SELECT doc_id,
       |  ${hex64("array_to_string(toks,' ')")} AS fingerprint,
       |  length(txt)::BIGINT AS n_chars, len(toks)::BIGINT AS n_tokens,
       |  length(regexp_replace(txt, '${graft.text.TextAnalysis.PunctKeepClass}', '', 'g'))::BIGINT AS n_punct
       |  FROM t),
       |q AS (SELECT doc_id, fingerprint,
       |  CASE WHEN n_tokens > 0 THEN (least(n_tokens, 100) / 100.0) *
       |    (1.0 - CASE WHEN n_chars > 0 THEN n_punct / n_chars ELSE 0.0 END)
       |  ELSE 0.0 END AS quality_score
       |  FROM m),
       |w AS (SELECT doc_id, fingerprint, quality_score,
       |  count(*) OVER (PARTITION BY fingerprint) AS group_size,
       |  first_value(doc_id) OVER (PARTITION BY fingerprint
       |    ORDER BY quality_score DESC, doc_id
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS keeper_id
       |  FROM q)
       |SELECT doc_id, fingerprint, quality_score, group_size, keeper_id,
       |  doc_id = keeper_id AS keep
       |FROM w ORDER BY doc_id""".stripMargin

  /** DSIR importance resampling (mirror of Dsir.importanceResample,
    * target = lang 'en', k = 100, B = 2048, M = 2^50): integer hashed
    * unigram+bigram occurrence counts, add-one-smoothed bucket
    * probability ratios through [[detLn]], fixed-point longs from
    * there on (order-free sums), Gumbel noise from the doc-id hash
    * through two nested [[detLn]] stages — every column either integer
    * or a [[detLn]]-defined double, so the comparison is hash-exact.
    */
  val sampleDsir: String = {
    val b = graft.text.Dsir.NumBuckets
    val m = graft.text.Dsir.GumbelMod
    val llrBase =
      s"""SELECT bucket, (tc + 1)::DOUBLE / (ttot::DOUBLE + ${b}e0) AS pt,
         |  (rc + 1)::DOUBLE / (rtot::DOUBLE + ${b}e0) AS pr
         |FROM cnt, tot""".stripMargin
    val llrChain = detLn(detLn(llrBase, "bucket, pr", "pt", "lt", "dsa"),
      "bucket, lt", "pr", "lr", "dsb")
    val gumBase = detLn("SELECT doc_id, u FROM g0", "doc_id", "u", "l1", "dsg1")
    val gumChain = detLn(
      s"SELECT doc_id, -l1 AS nl1 FROM ($gumBase) gq1",
      "doc_id", "nl1", "l2", "dsg2")
    s"""WITH t AS (SELECT doc_id, lang, $Toks AS toks FROM documents),
       |f AS (SELECT doc_id, is_t, ${hex64("'dsir|'||g")} % $b AS bucket
       |  FROM (SELECT doc_id, (lang = 'en') AS is_t,
       |    unnest(toks ||
       |      [array_to_string(toks[i:i+1], ' ') for i in range(1, len(toks))]) AS g
       |  FROM t) gf),
       |cnt AS (SELECT bucket, count(*)::BIGINT AS rc,
       |  sum(CASE WHEN is_t THEN 1 ELSE 0 END)::BIGINT AS tc
       |  FROM f GROUP BY bucket),
       |tot AS (SELECT sum(rc)::BIGINT AS rtot, sum(tc)::BIGINT AS ttot FROM cnt),
       |llr AS (SELECT bucket,
       |  CAST(floor((lt - lr) * 1.0e6 + 0.5e0) AS BIGINT) AS llr_fp
       |  FROM ($llrChain) lq),
       |w AS (SELECT doc_id, sum(llr_fp)::BIGINT AS weight_fp,
       |  count(*)::BIGINT AS n_feat
       |  FROM f JOIN llr USING (bucket) GROUP BY doc_id),
       |g0 AS (SELECT doc_id,
       |  ((${hex64("'dsir_g|'||CAST(doc_id AS VARCHAR)")} % $m) + 1)::DOUBLE
       |    / ${m + 1}e0 AS u
       |  FROM documents),
       |gum AS (SELECT doc_id,
       |  CAST(floor(-l2 * 1.0e6 + 0.5e0) AS BIGINT) AS gum_fp
       |  FROM ($gumChain) gq2),
       |s AS (SELECT d.doc_id, d.source, d.lang,
       |  coalesce(w.n_feat, 0)::BIGINT AS n_feat,
       |  coalesce(w.weight_fp, 0)::BIGINT AS weight_fp,
       |  (coalesce(w.weight_fp, 0) + g.gum_fp)::BIGINT AS score_fp
       |  FROM documents d LEFT JOIN w ON d.doc_id = w.doc_id
       |  JOIN gum g ON d.doc_id = g.doc_id),
       |r AS (SELECT *, row_number() OVER (ORDER BY score_fp DESC, doc_id) AS rn
       |  FROM s)
       |SELECT doc_id, source, lang, n_feat, weight_fp, score_fp,
       |  CAST(CASE WHEN rn <= 100 THEN rn END AS BIGINT) AS sel_rank,
       |  rn <= 100 AS selected
       |FROM r ORDER BY doc_id""".stripMargin
  }

  /** Prototype pruning (mirror of Prune.prototypePrune, centroids =
    * vec_id < 8, k = 32): per-vector argmax cell + similarity to the
    * OWN centroid, per-cell prototype rank by (sim desc, vec_id) —
    * the same (score, id) order TopKByScore maintains. The cosine is
    * spelled `dot/(sqrt(na)·sqrt(nb))` — the CosineSimilarity
    * expression's exact association — because DuckDB's
    * list_cosine_similarity normalizes as dot/sqrt(na·nb), which
    * differs in the last ulp exactly on self-similarity (centroids
    * land in their own cells here, unlike the ann_* queries, which
    * exclude self-matches).
    */
  val embPrototypePrune: String =
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |cent AS (SELECT vec_id AS c_id, v AS cv FROM e WHERE vec_id < 8),
       |asg AS (SELECT vec_id, c_id AS cell, sim AS cent_sim FROM (
       |  SELECT e.vec_id, c.c_id,
       |    list_dot_product(e.v, c.cv) / (sqrt(list_dot_product(e.v, e.v))
       |      * sqrt(list_dot_product(c.cv, c.cv))) AS sim,
       |    row_number() OVER (PARTITION BY e.vec_id
       |      ORDER BY list_dot_product(e.v, c.cv) / (sqrt(list_dot_product(e.v, e.v))
       |        * sqrt(list_dot_product(c.cv, c.cv))) DESC, c.c_id) AS rn
       |  FROM e, cent c) aq WHERE rn = 1),
       |r AS (SELECT vec_id, cell, cent_sim,
       |  CAST(row_number() OVER (PARTITION BY cell
       |    ORDER BY cent_sim DESC, vec_id) AS BIGINT) AS rk
       |  FROM asg)
       |SELECT vec_id, cell, cent_sim,
       |  CAST(CASE WHEN rk <= 32 THEN rk END AS BIGINT) AS prune_rank,
       |  rk <= 32 AS pruned
       |FROM r ORDER BY vec_id""".stripMargin

  /** The tag-strip + single-pass-equivalent entity decode + collapse
    * used by the page-metadata fields — the [[htmlTxtExpr]] decode
    * stage over an arbitrary expression (numeric plants first, named
    * fold after; identical reasoning).
    */
  private def htmlCleanExpr(e: String): String = {
    import graft.text.Html
    val stripped = s"regexp_replace($e, '${Html.AnyTag}', ' ', 'g')"
    val numeric = Html.NumericPlants.foldLeft(stripped) {
      case (acc, (ent, ch)) => s"replace($acc, ${slit(ent)}, ${slit(ch)})" }
    val decoded = Html.Entities.foldLeft(numeric) {
      case (acc, (ent, ch)) => s"replace($acc, ${slit(ent)}, ${slit(ch)})" }
    s"trim(regexp_replace($decoded, '${Html.WhitespaceClass}', ' ', 'g'))"
  }

  /** Page metadata (mirror of Html.pageMeta ∘ metaPlanted): the SAME
    * scaffold constants and patterns; title/h1/description re-derived
    * by the ordered-replace decode — hash-exact against the kernel.
    */
  lazy val textHtmlMeta: String = {
    import graft.text.Html
    s"""WITH m AS (SELECT doc_id,
       |  CASE WHEN doc_id % 6 = 0 THEN
       |    '<html><body><p>' || text || '</p><h3>only</h3></body></html>'
       |  ELSE ${slit(Html.MetaScaffoldA)} || doc_id::VARCHAR ||
       |    ${slit(Html.MetaScaffoldB)} || substring(text, 1, 40) ||
       |    ${slit(Html.MetaScaffoldC)} || doc_id::VARCHAR ||
       |    ${slit(Html.MetaScaffoldD)} || text || ${slit(Html.MetaScaffoldE)}
       |  END AS h FROM documents),
       |x AS (SELECT doc_id, h,
       |  regexp_extract_all(h, '${Html.H1Pat}', 1) AS h1s FROM m)
       |SELECT doc_id,
       |  CASE WHEN len(regexp_extract_all(h, '${Html.TitlePat}')) > 0
       |    THEN ${htmlCleanExpr(s"regexp_extract(h, '${Html.TitlePat}', 1)")}
       |  END AS title,
       |  len(h1s)::BIGINT AS n_h1,
       |  CASE WHEN len(h1s) > 0 THEN ${htmlCleanExpr("h1s[1]")} END AS first_h1,
       |  len(regexp_extract_all(h, '${Html.HeadingPat}'))::BIGINT AS n_headings,
       |  CASE WHEN len(regexp_extract_all(h, '${Html.MetaDescPat}')) > 0
       |    THEN ${htmlCleanExpr(s"regexp_extract(h, '${Html.MetaDescPat}', 1)")}
       |  END AS meta_description
       |FROM x ORDER BY doc_id""".stripMargin
  }

  /** Sitemap parse (mirror of Sitemap.parse ∘ synthFromDocs): the
    * same block/loc/lastmod/priority patterns over the same
    * synthesized XML; loc entity-decoded by the ordered replaces.
    */
  lazy val webSitemap: String = {
    import graft.sources.Sitemap
    import graft.text.Html
    val locDecoded = {
      val raw = s"nullif(regexp_extract(u.b, '${Sitemap.LocPat}', 1), '')"
      val numeric = Html.NumericPlants.foldLeft(raw) {
        case (acc, (ent, ch)) => s"replace($acc, ${slit(ent)}, ${slit(ch)})" }
      Html.Entities.foldLeft(numeric) {
        case (acc, (ent, ch)) => s"replace($acc, ${slit(ent)}, ${slit(ch)})" }
    }
    s"""WITH m AS (SELECT doc_id, text,
       |  'https://www.site' || ((doc_id * 7 + 3) % 20)::VARCHAR || '.com' AS host,
       |  1 + doc_id % 3 AS nu, 1 + doc_id % 2 AS ni,
       |  doc_id % 9 = 0 AS invalid, doc_id % 4 = 0 AS isidx FROM documents),
       |x AS (SELECT doc_id,
       |  CASE WHEN invalid THEN text
       |  WHEN isidx THEN
       |    e'<?xml version="1.0" encoding="UTF-8"?>\\n<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">\\n'
       |    || list_aggregate([
       |      '<sitemap><loc>' || host || '/sitemap' || (i - 1)::VARCHAR ||
       |        e'.xml</loc></sitemap>\\n'
       |      for i in generate_series(1, ni)], 'string_agg', '')
       |    || e'</sitemapindex>\\n'
       |  ELSE
       |    e'<?xml version="1.0" encoding="UTF-8"?>\\n<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">\\n'
       |    || list_aggregate([
       |      e'<url>\\n  <loc> ' || host || '/p/' || doc_id::VARCHAR || '/' ||
       |        (i - 1)::VARCHAR || '?a=1&amp;b=' || (i - 1)::VARCHAR || e' </loc>\\n'
       |      || (CASE WHEN (i - 1) % 2 = 0 THEN '  <lastmod>2025-' ||
       |            lpad((1 + (doc_id + i - 1) % 12)::VARCHAR, 2, '0') || '-' ||
       |            lpad((1 + (doc_id * 3 + i - 1) % 28)::VARCHAR, 2, '0') ||
       |            e'</lastmod>\\n' ELSE '' END)
       |      || (CASE WHEN (i - 1) % 3 = 0 THEN '  <priority>0.' ||
       |            ((doc_id + i - 1) % 10)::VARCHAR || e'</priority>\\n' ELSE '' END)
       |      || e'</url>\\n'
       |      for i in generate_series(1, nu)], 'string_agg', '')
       |    || e'</urlset>\\n'
       |  END AS xml FROM m),
       |k AS (SELECT doc_id, xml,
       |  CASE WHEN regexp_matches(xml, '(?is)<sitemapindex[ \\t\\r\\n>]') THEN 'index'
       |       WHEN regexp_matches(xml, '(?is)<urlset[ \\t\\r\\n>]') THEN 'urlset'
       |  END AS kind FROM x),
       |bl AS (SELECT doc_id, kind,
       |  CASE WHEN kind = 'index'
       |    THEN regexp_extract_all(xml, '${Sitemap.SitemapBlock}', 1)
       |    WHEN kind = 'urlset'
       |    THEN regexp_extract_all(xml, '${Sitemap.UrlBlock}', 1)
       |    ELSE [] END AS bs FROM k),
       |e AS (SELECT doc_id, kind,
       |  unnest([{'i': i - 1, 'b': bs[i]}
       |    for i in generate_series(1, len(bs))]) AS u FROM bl)
       |SELECT doc_id, kind, CAST(u.i AS BIGINT) AS entry_idx,
       |  $locDecoded AS loc,
       |  nullif(regexp_extract(u.b, '${Sitemap.LastmodPat}', 1), '') AS lastmod,
       |  CAST(nullif(regexp_extract(u.b, '${Sitemap.PriorityPat}', 1), '')
       |    AS DOUBLE) AS priority
       |FROM e ORDER BY doc_id, entry_idx""".stripMargin
  }

  /** EXIF triage (mirror of Jpeg.exif ∘ synthExifFromDocs): every
    * field re-derived from doc_id arithmetic — a hash match proves
    * the TIFF walk read real offsets in BOTH byte orders, not flags.
    */
  val mmJpegExif: String =
    """WITH m AS (SELECT doc_id, doc_id % 10 = 0 AS inv,
      |  doc_id % 5 = 0 AS nox FROM documents)
      |SELECT doc_id,
      |  CASE WHEN inv THEN NULL WHEN nox THEN FALSE ELSE TRUE END
      |    AS exif_present,
      |  CASE WHEN inv OR nox THEN NULL
      |    WHEN doc_id % 2 = 1 THEN 'II' ELSE 'MM' END AS byte_order,
      |  (CASE WHEN inv OR nox THEN NULL
      |    WHEN doc_id % 3 = 0 THEN 4 ELSE 3 END)::BIGINT AS n_ifd0_entries,
      |  (CASE WHEN inv OR nox THEN NULL
      |    ELSE 1 + doc_id % 8 END)::BIGINT AS orientation,
      |  CASE WHEN inv OR nox THEN NULL
      |    ELSE 'Cam' || (doc_id % 5)::VARCHAR END AS make,
      |  CASE WHEN inv OR nox THEN NULL
      |    ELSE 'M' || (doc_id % 7)::VARCHAR END AS model,
      |  CASE WHEN inv OR nox THEN NULL ELSE doc_id % 3 = 0 END AS has_gps,
      |  CASE WHEN inv OR nox OR doc_id % 3 <> 0 THEN NULL ELSE
      |    (CASE WHEN doc_id % 6 = 0 THEN -1 ELSE 1 END) *
      |    ((doc_id % 90)::DOUBLE / 1 / 1
      |      + ((doc_id * 7) % 60)::DOUBLE / 1 / 60
      |      + ((doc_id * 13) % 600)::DOUBLE / 10 / 3600)
      |  END AS gps_lat,
      |  CASE WHEN inv OR nox OR doc_id % 3 <> 0 THEN NULL ELSE
      |    (CASE WHEN (doc_id // 3) % 2 = 1 THEN -1 ELSE 1 END) *
      |    ((doc_id % 180)::DOUBLE / 1 / 1
      |      + ((doc_id * 11) % 60)::DOUBLE / 1 / 60
      |      + ((doc_id * 17) % 600)::DOUBLE / 10 / 3600)
      |  END AS gps_lon
      |FROM m ORDER BY doc_id""".stripMargin

  /** GPS-strip rewrite (mirror of Jpeg.exif ∘ Jpeg.stripGps ∘
    * synthExifFromDocs): the stripped bytes RE-PARSE with EXIF intact
    * — byte order, orientation, make (still offset-addressed past the
    * compacted entry table), model — but the entry count decremented
    * to 3 on the former GPS lane, gps_present false, coordinates
    * null; payload length always preserved, and only the GPS lane's
    * payloads differ from the originals. Every field closed-form.
    */
  val mmJpegGpsStrip: String =
    """WITH m AS (SELECT doc_id, doc_id % 10 = 0 AS inv,
      |  doc_id % 5 = 0 AS nox, doc_id % 3 = 0 AS gps FROM documents)
      |SELECT doc_id,
      |  CASE WHEN inv THEN NULL WHEN nox THEN FALSE ELSE TRUE END
      |    AS exif_present,
      |  CASE WHEN inv OR nox THEN NULL
      |    WHEN doc_id % 2 = 1 THEN 'II' ELSE 'MM' END AS byte_order,
      |  (CASE WHEN inv OR nox THEN NULL ELSE 3 END)::BIGINT
      |    AS n_ifd0_entries,
      |  (CASE WHEN inv OR nox THEN NULL
      |    ELSE 1 + doc_id % 8 END)::BIGINT AS orientation,
      |  CASE WHEN inv OR nox THEN NULL
      |    ELSE 'Cam' || (doc_id % 5)::VARCHAR END AS make,
      |  CASE WHEN inv OR nox THEN NULL
      |    ELSE 'M' || (doc_id % 7)::VARCHAR END AS model,
      |  CASE WHEN inv OR nox THEN NULL ELSE FALSE END AS gps_present,
      |  NULL::DOUBLE AS gps_lat,
      |  NULL::DOUBLE AS gps_lon,
      |  TRUE AS len_preserved,
      |  NOT (NOT inv AND NOT nox AND gps) AS payload_unchanged
      |FROM m ORDER BY doc_id""".stripMargin

  /** robots.txt parse (mirror of Curation.parseRobotsTxt ∘
    * synthRobotsTxt, agent = botA): the oracle replays the grouping
    * as a relational window chain (field lines only → lag-detected
    * group starts → running-sum gid) — a deliberately DIFFERENT
    * mechanism from Spark's per-row array fold, so a hash match pins
    * the group semantics themselves, not an implementation echo.
    */
  val robotsParse: String =
    """WITH m AS (SELECT doc_id, text,
      |  'www.h' || (doc_id % 50)::VARCHAR || '.example' AS host,
      |  CASE WHEN doc_id % 9 = 0 THEN text ELSE
      |    '# robots for doc ' || doc_id::VARCHAR || chr(10) ||
      |    'User-Agent: *' || chr(10) ||
      |    'Disallow: /private' || (doc_id % 7)::VARCHAR || chr(10) ||
      |    'Allow: /private' || (doc_id % 7)::VARCHAR ||
      |      '/pub # inline comment' || chr(10) ||
      |    chr(10) ||
      |    (CASE WHEN doc_id % 2 = 0 THEN
      |      'User-agent: botA' || chr(10) || 'User-agent: botC' || chr(10) ||
      |      'disallow: /only-a/' || (doc_id % 5)::VARCHAR || chr(10)
      |     ELSE '' END) ||
      |    'Sitemap: https://www.h' || (doc_id % 50)::VARCHAR ||
      |      '.example/sitemap.xml' || chr(10) ||
      |    'user-AGENT: botB' || chr(10) ||
      |    'Disallow:' || chr(10) ||
      |    'Disallow: /b-only' || chr(10)
      |  END AS txt FROM documents),
      |l AS (SELECT doc_id, host,
      |  unnest([{'i': i, 'l': regexp_replace(regexp_replace(
      |      ls[i], '#.*$', '', 'g'), '^[ \t\r]+|[ \t\r]+$', '', 'g')}
      |    for i in range(1, len(ls) + 1)]) AS u
      |  FROM (SELECT doc_id, host, string_split(txt, chr(10)) AS ls FROM m)),
      |c AS (SELECT doc_id, host, u.i AS idx,
      |  lower(regexp_extract(u.l,
      |    '(?i)^(user-agent|allow|disallow)[ \t]*:', 1)) AS field,
      |  regexp_extract(u.l,
      |    '(?i)^(?:user-agent|allow|disallow)[ \t]*:[ \t]*(.*)$', 1) AS value
      |  FROM l),
      |f AS (SELECT * FROM c WHERE field <> ''),
      |g0 AS (SELECT *, coalesce(lag(field = 'user-agent')
      |  OVER (PARTITION BY doc_id ORDER BY idx), false) AS prev_ua FROM f),
      |g AS (SELECT *, sum(CASE WHEN field = 'user-agent' AND NOT prev_ua
      |  THEN 1 ELSE 0 END)
      |  OVER (PARTITION BY doc_id ORDER BY idx) AS gid FROM g0),
      |ag AS (SELECT DISTINCT doc_id, gid FROM g
      |  WHERE field = 'user-agent' AND (value = '*' OR lower(value) = 'bota')),
      |r AS (SELECT g.doc_id, g.host, g.idx, g.value, g.field FROM g
      |  JOIN ag ON g.doc_id = ag.doc_id AND g.gid = ag.gid
      |  WHERE g.field <> 'user-agent' AND g.value <> '')
      |SELECT doc_id, host,
      |  (row_number() OVER (PARTITION BY doc_id ORDER BY idx) - 1)::BIGINT
      |    AS rule_idx,
      |  value AS path_prefix, field = 'allow' AS allow
      |FROM r ORDER BY doc_id, rule_idx""".stripMargin

  /** JSONL parse (mirror of Jsonl.parse ∘ synthLines): both engines
    * build the SAME line bytes from the same arithmetic, then parse
    * with their OWN json stack (Jackson vs yyjson) — the hash match
    * proves two independent JSON parsers agree on every decoded
    * field, escape semantics included.
    */
  lazy val textJsonlParse: String = {
    val plant = slit(graft.sources.Jsonl.EscapePlant)
    s"""WITH m AS (SELECT doc_id,
       |  CASE WHEN doc_id % 13 = 0 THEN
       |    '{"id": ' || doc_id::VARCHAR || ', "text": "truncated'
       |  ELSE '{"id": ' || doc_id::VARCHAR || ', "text": "' || text || $plant
       |    || '", "meta": {"lang": ' ||
       |    (CASE WHEN doc_id % 7 = 0 THEN 'null' ELSE '"' || lang || '"' END)
       |    || ', "source": "' || source || '", "score": ' ||
       |    (doc_id % 97)::VARCHAR || '}' ||
       |    (CASE WHEN doc_id % 11 = 0 THEN '' ELSE
       |      ', "tags": ["s' || (doc_id % 5)::VARCHAR || '", "all"]' END)
       |    || '}'
       |  END AS line FROM documents)
       |SELECT doc_id,
       |  json_valid(line) AS json_ok,
       |  CASE WHEN json_valid(line)
       |    THEN json_extract(line, '$$.id')::BIGINT END AS id,
       |  CASE WHEN json_valid(line)
       |    THEN json_extract_string(line, '$$.text') END AS text,
       |  CASE WHEN json_valid(line)
       |    THEN json_extract_string(line, '$$.meta.lang') END AS lang,
       |  CASE WHEN json_valid(line)
       |    THEN json_extract_string(line, '$$.meta.source') END AS source,
       |  CASE WHEN json_valid(line)
       |    THEN json_extract(line, '$$.meta.score')::BIGINT END AS score,
       |  CASE WHEN json_valid(line)
       |    THEN json_array_length(line, '$$.tags')::BIGINT END AS n_tags,
       |  CASE WHEN json_valid(line)
       |    THEN json_extract_string(line, '$$.tags[0]') END AS tag0
       |FROM m ORDER BY doc_id""".stripMargin
  }
}
