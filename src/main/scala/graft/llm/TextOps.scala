package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.rel.Queries.{rnd, rndSql}

/** LLM-training-data text operators over the `documents` table
  * (SURVEY.md §2.9, north-star mandated — the reference has no text
  * surface; these are the EXT rows that make the engine a data-pipeline
  * tool, not just a classifier).
  *
  * Scale notes (100 TB): tokenize/dedup are single-shuffle groupBys with
  * map-side partial aggregation. Exact Jaccard is the oracle-checkable
  * semantic definition; its all-pairs token self-join is quadratic in
  * docs-per-token, so the scale path is MinHash-LSH pre-bucketing
  * (`MinHashLsh.scala`) which only pairs docs sharing a signature band.
  */
object TextOps {

  /** (doc_id, tok) pairs, one row per *distinct* token per doc. */
  private[graft] def docTokens(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), explode(split(col("text"), " ")).as("tok")).distinct()

  // ---- the ONE exact-Jaccard verify pipeline ---------------------------
  // (round-5 unification: minhashLshPairs, jaccardPairs, ngramJaccard and
  // corpusClean each hand-rolled the same sizes/intersection/threshold
  // chain — one implementation means the candidate-driven scale fix
  // provably applies everywhere it should.)

  /** Exact Jaccard ≥ threshold DRIVEN BY candidate pairs: expand each
    * (d1, d2) candidate to d1's tokens, keep those also in d2's. Work
    * scales with |candidates| × tokens-per-doc — the 100-TB path, fed by
    * LSH band collisions. (The naive alternative — join the full token
    * streams on tok and THEN semi-join candidates — materializes every
    * token co-occurrence first: ~1.6 B intermediate pairs at 50 k docs,
    * found by PipelineScaleProbe.) Output (doc_id1, doc_id2, j), j
    * unrounded — callers round at their output edge.
    */
  private[graft] def jaccardVerify(cand: DataFrame, toks: DataFrame,
      threshold: Double): DataFrame = {
    val inter = cand
      .join(toks.select(col("doc_id").as("d1"), col("tok")), "d1")
      .join(toks.select(col("doc_id").as("d2"), col("tok")), Seq("d2", "tok"))
      .groupBy(col("d1"), col("d2"))
      .agg(count(lit(1)).as("inter"))
    jaccardFromInter(inter, toks, threshold)
  }

  /** Exact Jaccard ≥ threshold over ALL pairs sharing a token — the
    * oracle-checkable semantic definition. Quadratic in docs-per-token:
    * for BOUNDED slices only; at corpus scale generate candidates with
    * MinHash-LSH and use `jaccardVerify`.
    */
  private[graft] def jaccardAllPairs(toks: DataFrame, threshold: Double): DataFrame = {
    val inter = toks.select(col("doc_id").as("d1"), col("tok"))
      .join(toks.select(col("doc_id").as("d2"), col("tok")), "tok")
      .filter(col("d1") < col("d2"))
      .groupBy(col("d1"), col("d2"))
      .agg(count(lit(1)).as("inter"))
    jaccardFromInter(inter, toks, threshold)
  }

  /** Shared tail: |A∪B| = |A| + |B| − |A∩B|. The doc-size table carries
    * ONE ROW PER DOC IN `toks` — corpus-proportional on the candidate-
    * driven path, so it must NOT be force-broadcast (the knn_topk OOM
    * shape; pre-unification the hint hid in all four copies). AQE
    * size-gates the two joins instead: at bench slices the sizes side
    * still broadcasts; at corpus scale the (much smaller) intersection
    * side becomes the build side or both sides shuffle on doc id.
    */
  private def jaccardFromInter(inter: DataFrame, toks: DataFrame,
      threshold: Double): DataFrame = {
    val sizes = toks.groupBy("doc_id").agg(count(lit(1)).as("sz"))
    inter
      .join(sizes.select(col("doc_id").as("d1"), col("sz").as("sza")), "d1")
      .join(sizes.select(col("doc_id").as("d2"), col("sz").as("szb")), "d2")
      .withColumn("j", col("inter") / (col("sza") + col("szb") - col("inter")))
      .filter(col("j") >= threshold)
      .select(col("d1").as("doc_id1"), col("d2").as("doc_id2"), col("j"))
  }

  // #28 — tokenize + explode (the Generator/UDTF surface) + count.
  def tokenize(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(explode(split(col("text"), " ")).as("tok"))
      .groupBy(col("tok"))
      .agg(count(lit(1)).as("n"))

  // #29 — exact dedup by content hash: canonical doc per distinct md5.
  def dedupExact(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .groupBy(md5(col("text")).as("h"))
      .agg(min("doc_id").as("keep_id"), count(lit(1)).as("n_dups"))

  // #30 — exact token-set Jaccard similarity over doc pairs (doc_id1 <
  // doc_id2, J >= 0.8). Declared over the doc_id < 500 slice so the
  // all-pairs form stays bounded at bench SFs; the operator is
  // slice-independent. MinHash-LSH is the at-scale physical form.
  def jaccardPairs(s: SparkSession, d: String): DataFrame = {
    val toks = docTokens(Tables.documents(s, d).filter(col("doc_id") < 500))
    jaccardAllPairs(toks, 0.8)
      .select(col("doc_id1"), col("doc_id2"), rnd(col("j"), 6).as("jaccard"))
  }

  // text_tfidf — the classic term-weighting op: per-doc top-3 terms by
  // tf·idf (raw term count × ln(N/df)). Two keyed aggregations + a small
  // window. The df table is VOCAB-sized — much smaller than the corpus
  // but not bounded (web-scale vocab runs to hundreds of millions of
  // types), so it is NOT force-broadcast: the join is tok-keyed on both
  // sides, co-partitioned with the aggregation shuffle that produced
  // df, and AQE still broadcasts it at bench slices. Only the one-row
  // nDocs aggregate keeps its hint.
  def tfidf(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d).filter(col("doc_id") < 500)
    val nDocs = docs.agg(count(lit(1)).as("n_docs"))
    val termCounts = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .groupBy(col("doc_id"), col("tok"))
      .agg(count(lit(1)).as("tf"))
    val df_ = termCounts.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    val scored = termCounts.join(df_, "tok").crossJoin(broadcast(nDocs))
      .withColumn("tfidf", col("tf") * log(col("n_docs") / col("df")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("tfidf").desc, col("tok"))
    scored.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("doc_id"), col("tok"), col("tf"), col("df"),
        rnd(col("tfidf"), 6).as("tfidf"), col("rn"))
  }

  // text_bigrams — word-n-gram generation (n=2): adjacent-token pairs
  // from the in-engine token array (no self-join on position; the gram
  // construction is a per-row array transform). Docs with < 2 tokens are
  // guarded out — Spark's sequence(1, 0) would run DESCENDING.
  def bigrams(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(split(col("text"), " ").as("a"))
      .filter(size(col("a")) >= 2)
      .select(explode(expr(
        "transform(sequence(1, size(a) - 1), i -> " +
          "concat(element_at(a, i), ' ', element_at(a, i + 1)))")).as("bg"))
      .groupBy(col("bg"))
      .agg(count(lit(1)).as("n"))

  /** End-to-end corpus curation in one declared pipeline — the composed
    * shape a training-data run actually executes: quality-filter (length
    * + stopword-ratio), then drop near-duplicates (keep-lowest-id rule
    * over token-Jaccard ≥ 0.9 pairs), emit the kept corpus with its
    * quality signals. Every stage is the oracle-gated operator it reuses.
    */
  def corpusClean(s: SparkSession, d: String): DataFrame = {
    import graft.rel.Queries.rnd
    val stop = Seq("the", "a", "of", "and", "in", "to")
    val docs = Tables.documents(s, d).filter(col("doc_id") < 500)
    val toksAll = docs.select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
    val quality = toksAll.groupBy(col("doc_id")).agg(
      count(lit(1)).as("n_tok"),
      rnd(avg(when(col("tok").isin(stop: _*), 1.0).otherwise(0.0)), 6).as("stop_ratio"))
    val qualified = quality.filter(col("n_tok") >= 20 && col("stop_ratio") <= 0.6)

    // all-pairs on the declared bounded slice; a library user cleaning a
    // big frame should pre-bucket with minhashLshPairs (jaccardVerify)
    val toks = docTokens(docs)
      .join(qualified.select("doc_id"), Seq("doc_id"), "left_semi")
    val dropped = jaccardAllPairs(toks, 0.9)
      .select(col("doc_id2").as("doc_id")).distinct()

    qualified.join(dropped, Seq("doc_id"), "left_anti")
      .select(col("doc_id"), col("n_tok"), col("stop_ratio"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_tokenize" -> tokenize,
    "dedup_exact" -> dedupExact,
    "similarity_jaccard" -> jaccardPairs,
    "corpus_clean" -> corpusClean,
    "text_tfidf" -> tfidf,
    "text_bigrams" -> bigrams,
  )

  /** DuckDB twins (rnd() rewritten by `Queries.duckify`). */
  val rawOracles: Map[String, String] = Map(
    "text_tokenize" ->
      ("SELECT tok, count(*) AS n FROM (" +
        "SELECT unnest(string_split(text, ' ')) AS tok FROM documents) GROUP BY 1"),

    "dedup_exact" ->
      "SELECT md5(text) AS h, min(doc_id) AS keep_id, count(*) AS n_dups FROM documents GROUP BY 1",

    "corpus_clean" ->
      ("WITH ta AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok " +
        "FROM documents WHERE doc_id < 500), " +
        "quality AS (SELECT doc_id, count(*) AS n_tok, " +
        "rnd(avg(CASE WHEN tok IN ('the', 'a', 'of', 'and', 'in', 'to') THEN 1e0 ELSE 0e0 END), 6) AS stop_ratio " +
        "FROM ta GROUP BY 1), " +
        "qual AS (SELECT * FROM quality WHERE n_tok >= 20 AND stop_ratio <= 0.6e0), " +
        "toks AS (SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS tok " +
        "FROM documents WHERE doc_id < 500 AND doc_id IN (SELECT doc_id FROM qual)), " +
        "sizes AS (SELECT doc_id, count(*) AS sz FROM toks GROUP BY 1), " +
        "inter AS (SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS i " +
        "FROM toks a JOIN toks b ON a.tok = b.tok AND a.doc_id < b.doc_id GROUP BY 1, 2), " +
        "dropped AS (SELECT DISTINCT d2 AS doc_id FROM inter " +
        "JOIN sizes sa ON sa.doc_id = d1 JOIN sizes sb ON sb.doc_id = d2 " +
        "WHERE i / (sa.sz + sb.sz - i) >= 0.9e0) " +
        "SELECT q.doc_id, q.n_tok, q.stop_ratio FROM qual q " +
        "WHERE q.doc_id NOT IN (SELECT doc_id FROM dropped)"),

    "text_tfidf" ->
      ("WITH tc AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok " +
        "FROM documents WHERE doc_id < 500), " +
        "tf AS (SELECT doc_id, tok, count(*) AS tf FROM tc GROUP BY 1, 2), " +
        "dfq AS (SELECT tok, count(*) AS df FROM tf GROUP BY 1), " +
        "nd AS (SELECT count(*) AS n_docs FROM documents WHERE doc_id < 500), " +
        "sc AS (SELECT tf.doc_id, tf.tok, tf.tf, dfq.df, " +
        "tf.tf * ln(nd.n_docs / dfq.df) AS tfidf FROM tf JOIN dfq ON tf.tok = dfq.tok CROSS JOIN nd), " +
        "rk AS (SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, tok) AS rn FROM sc) " +
        "SELECT doc_id, tok, tf, df, rnd(tfidf, 6) AS tfidf, rn::INT AS rn FROM rk WHERE rn <= 3"),

    "text_bigrams" ->
      ("SELECT bg, count(*) AS n FROM (" +
        "SELECT unnest(list_transform(range(1, len(a)), i -> a[i::INT] || ' ' || a[(i + 1)::INT])) AS bg " +
        "FROM (SELECT string_split(text, ' ') AS a FROM documents) WHERE len(a) >= 2) GROUP BY 1"),

    "similarity_jaccard" ->
      ("WITH toks AS (SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS tok " +
        "FROM documents WHERE doc_id < 500), " +
        "sizes AS (SELECT doc_id, count(*) AS sz FROM toks GROUP BY 1), " +
        "inter AS (SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS i " +
        "FROM toks a JOIN toks b ON a.tok = b.tok AND a.doc_id < b.doc_id GROUP BY 1, 2), " +
        "jj AS (SELECT d1, d2, i / (sa.sz + sb.sz - i) AS j FROM inter " +
        "JOIN sizes sa ON sa.doc_id = d1 JOIN sizes sb ON sb.doc_id = d2) " +
        "SELECT d1 AS doc_id1, d2 AS doc_id2, rnd(j, 6) AS jaccard FROM jj WHERE j >= 0.8e0"),
  )
}
