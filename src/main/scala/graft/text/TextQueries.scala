package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Text-analysis operators for a training-data pipeline: quality scoring,
  * language-ID heuristic, token counting, and document fingerprinting.
  * All column-expression code (codegen'd / HOF), no UDFs, so Catalyst can
  * pushdown + prune around them — and all oracle-checkable in DuckDB.
  */
object TextQueries {
  type Q = (SparkSession, String) => DataFrame

  private val Stopwords = Seq("the", "a", "of", "is", "and")
  private def stopList = Stopwords.map(w => s"'$w'").mkString(", ")

  /** Per-document quality metrics: token count, char count, stopword
    * ratio, mean token length, and a blended quality score. Ratios are
    * int/int double divisions, so they hash-match across engines.
    */
  def quality: Q = (s, d) =>
    Tables.documents(s, d)
      .withColumn("ws", split(col("text"), " "))
      .withColumn("n_tokens", size(filter(col("ws"), w => w =!= "")))
      .withColumn("n_stop",
        size(filter(col("ws"), w => w.isin(Stopwords.map(x => x: Any): _*))))
      .withColumn("sum_len",
        aggregate(transform(col("ws"), w => length(w).cast("long")), lit(0L), (a, x) => a + x))
      .select(
        col("doc_id"),
        col("n_tokens"),
        length(col("text")).as("n_chars_m"),
        (col("n_stop").cast("double") / col("n_tokens")).as("stop_ratio"),
        (col("sum_len").cast("double") / col("n_tokens")).as("mean_tok_len"),
        (col("n_stop").cast("double") / col("n_tokens") * 0.5 +
          least(col("n_tokens").cast("double") / lit(100.0), lit(1.0)) * 0.5)
          .as("quality_score"))

  /** Marker-word language-ID heuristic: count per-language marker hits,
    * predict the argmax with a deterministic preference order. (The
    * synthetic corpus draws one shared vocabulary, so this demonstrates
    * the operator shape — scoring + argmax — rather than real language
    * separation.)
    */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "order", "table"),
    "de" -> Seq("hash", "customer", "batch"),
    "es" -> Seq("slow", "agg", "vector"),
    "fr" -> Seq("scan", "data", "query"),
    "zh" -> Seq("join", "small", "row"))

  def langId: Q = (s, d) => {
    val ws = split(col("text"), " ")
    val scored = langMarkers.foldLeft(
      Tables.documents(s, d).select(col("doc_id"), col("lang").as("labeled_lang"), ws.as("ws"))) {
      case (df, (lang, markers)) =>
        df.withColumn(s"c_$lang",
          size(filter(col("ws"), w => w.isin(markers.map(x => x: Any): _*))))
    }
    val best = greatest(langMarkers.map { case (l, _) => col(s"c_$l") }: _*)
    // argmax with deterministic tiebreak: CASE scans in declaration order
    val pred = langMarkers.foldRight(lit("und")) { case ((l, _), other) =>
      when(col(s"c_$l") === best, lit(l)).otherwise(other)
    }
    scored
      .withColumn("pred_lang", pred)
      .select(Seq(col("doc_id"), col("labeled_lang"), col("pred_lang")) ++
        langMarkers.map { case (l, _) => col(s"c_$l") }: _*)
  }

  /** Token counting two ways: whitespace tokens and a BPE-ish regex
    * tokenizer (letter runs / digit runs / single other chars).
    */
  def tokenCount: Q = (s, d) =>
    Tables.documents(s, d).select(
      col("doc_id"),
      size(filter(split(col("text"), " "), w => w =!= "")).as("ws_tokens"),
      size(regexp_extract_all(col("text"), lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), lit(0)))
        .as("re_tokens"))

  /** Rolling polynomial fingerprint over the character stream:
    * fold of (acc * 31 + ascii(c)) mod 1e9+7 — exact integer arithmetic,
    * identical in any engine.
    */
  def fingerprint: Q = (s, d) =>
    Tables.documents(s, d).select(
      col("doc_id"),
      aggregate(
        transform(split(col("text"), ""), c => ascii(c).cast("long")),
        lit(0L),
        (acc, x) => (acc * 31L + x) % 1000000007L).as("fp"))

  /** The composed training-data pipeline, end to end: exact dedup (keep
    * the smallest doc_id per distinct text) → language filter → token
    * gate → per-source corpus statistics. One declarative plan, so
    * Catalyst fuses the stages: the dedup is a semi-join against a hash
    * aggregate, the filters run before the final aggregation, and the
    * whole thing is two shuffles (dedup keys, source groups) regardless
    * of corpus size.
    */
  def corpusPipeline: Q = (s, d) => {
    val docs = Tables.documents(s, d)
    val keepers = docs
      .groupBy(md5(col("text")).as("text_md5"))
      .agg(min(col("doc_id")).as("doc_id"))
      .select("doc_id")
    docs
      .join(keepers, Seq("doc_id"), "left_semi")
      .where(col("lang") === "en")
      .withColumn("n_tokens", size(filter(split(col("text"), " "), w => w =!= "")))
      .where(col("n_tokens") >= 10)
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tokens").cast("long")).as("total_tokens"),
        (sum(col("n_tokens").cast("long")).cast("double") / count(lit(1))).as("avg_tokens"))
  }

  /** Gopher-style repetition signal: the fraction of a document's word
    * 3-grams that are repeats of an earlier 3-gram — high values flag
    * boilerplate/spam for a training-data filter. Pure array HOFs;
    * int/int double division so the ratio hash-matches DuckDB.
    */
  def repetition: Q = (s, d) =>
    Tables.fanOut(Tables.documents(s, d), col("doc_id"))
      .withColumn("ws", split(col("text"), " "))
      .where(size(col("ws")) >= 3)
      .withColumn("grams", expr(
        """transform(sequence(1, size(ws) - 2),
          |  i -> concat(element_at(ws, i), ' ', element_at(ws, i + 1), ' ', element_at(ws, i + 2)))"""
          .stripMargin))
      .select(col("doc_id"),
        size(col("grams")).as("n_grams"),
        size(array_distinct(col("grams"))).as("n_distinct"),
        (lit(1.0) - size(array_distinct(col("grams"))).cast("double") /
          size(col("grams"))).as("rep_ratio"))

  /** Per-source sampling budget: the deterministic top-5 documents per
    * source in md5(doc_id) order — the stratified "N docs per domain"
    * cut a corpus builder applies before mixing sources. Reproducible
    * across engines and cluster sizes (hash order, full tie-break), one
    * shuffle on `source`, and WindowGroupLimit keeps only 5 rows per
    * group ahead of the exchange.
    */
  def stratifiedSample: Q = (s, d) => {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("source").orderBy(col("h").asc, col("doc_id").asc)
    Tables.documents(s, d)
      .withColumn("h", md5(col("doc_id").cast("string")))
      .withColumn("rk", row_number().over(w))
      .where(col("rk") <= 5)
      .select(col("source"), col("doc_id"), col("rk"))
  }

  /** Document-length histogram in 100-char bins — the size-distribution
    * summary a pipeline reports per snapshot. Integer bin arithmetic on
    * both engines.
    */
  def lengthHistogram: Q = (s, d) =>
    Tables.documents(s, d)
      .groupBy((floor(col("n_chars") / 100) * 100).cast("long").as("bin_lo"))
      .agg(count(lit(1)).as("n_docs"),
        min(col("n_chars")).as("min_chars"),
        max(col("n_chars")).as("max_chars"))

  /** Corpus-level n-gram statistics: the 20 most frequent word bigrams
    * (count desc, gram asc — fully deterministic cut). The shape of an
    * n-gram LM count pass: explode → hash-agg (map-side partials) →
    * TakeOrderedAndProject top-k.
    */
  /** One exploded bigram row per adjacent word pair. */
  private def bigrams(s: SparkSession, d: String): DataFrame =
    Tables.fanOut(Tables.documents(s, d), col("doc_id"))
      .withColumn("ws", split(col("text"), " "))
      .where(size(col("ws")) >= 2)
      .select(explode(expr(
        """transform(sequence(1, size(ws) - 1),
          |  i -> concat(element_at(ws, i), ' ', element_at(ws, i + 1)))""".stripMargin))
        .as("gram"))

  def ngramCounts: Q = (s, d) =>
    bigrams(s, d)
      .groupBy("gram")
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("gram").asc)
      .limit(20)

  /** Sketch-based sibling of [[ngramCounts]] — `approx_top_k`
    * (DataSketches frequent-items): a mergeable bounded-memory partial
    * aggregate, so the heavy-hitters pass needs ONE reduction of
    * sketch-sized state no matter how many distinct n-grams the corpus
    * holds — the 100 TB path where the exact groupBy's hash table would
    * not fit. Sketch tie order is engine-specific, so the raw top-20
    * can't be oracled; TextSpec pins that the approx top-20 contains
    * the exact top-10, and the registered driver form is
    * [[ngramTopKSketchChecked]].
    */
  def ngramTopKSketch: Q = (s, d) =>
    bigrams(s, d)
      .select(explode(expr("approx_top_k(gram, 20)")).as("e"))
      .select(col("e.item").as("gram"), col("e.count").as("cnt_est"))

  /** Driver-audited form of [[ngramTopKSketch]]: the frequent-items
    * guarantee as exact oracle bits — every exact top-10 heavy hitter
    * (count desc, gram asc — the q78 deterministic cut) must appear in
    * the sketch's top-20 with its estimate within 1% of the true count.
    * One row; DuckDB recomputes the top-10 cardinality and asserts the
    * two booleans as literal TRUE. The exact side is q78's own
    * hash-agg + top-k (already oracled) — the audit join touches 10
    * rows against a 20-row sketch output.
    */
  def ngramTopKSketchChecked: Q = (s, d) => {
    val sk = ngramTopKSketch(s, d)
    val top10 = bigrams(s, d).groupBy("gram").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("gram").asc).limit(10)
    top10.join(sk, Seq("gram"), "left")
      .agg(count(lit(1)).as("n_top10"),
        min(col("cnt_est").isNotNull).as("top10_covered"),
        min(coalesce(abs(col("cnt_est") - col("cnt")) * 100 <= col("cnt"),
          lit(false))).as("top10_est_within_1pct"))
  }

  /** PII scrub — the redaction pass a training-data pipeline runs before
    * publishing text. The shipped synthetic corpus carries no natural
    * PII, so the query first derives a `raw` column by appending a
    * deterministic contact block (email / phone / SSN-shaped, generated
    * from doc_id+source), then masks all three pattern classes with
    * regexp_replace — proving the scrub is live (n_redactions = 3 on
    * every row, pinned by the exact oracle) rather than vacuously
    * matching nothing. Pure codegen'd string expressions; one scan, no
    * shuffle before the sink.
    */
  def piiRedact: Q = (s, d) => {
    val raw = concat(
      col("text"), lit(" contact user"), col("doc_id").cast("string"),
      lit("@"), col("source"), lit(".com or +1-555-"),
      lpad((col("doc_id") % 10000).cast("string"), 4, "0"), lit("-"),
      lpad((col("doc_id") % 100).cast("string"), 2, "0"), lit(" ssn "),
      lpad((col("doc_id") % 1000).cast("string"), 3, "0"), lit("-"),
      lpad((col("doc_id") % 100).cast("string"), 2, "0"), lit("-"),
      lpad((col("doc_id") % 10000).cast("string"), 4, "0"))
    val clean = regexp_replace(
      regexp_replace(
        regexp_replace(raw,
          "[a-z0-9._-]+@[a-z0-9.-]+\\.[a-z]{2,}", "<EMAIL>"),
        "\\+?1?-?555-[0-9]{4}-[0-9]{2}", "<PHONE>"),
      "[0-9]{3}-[0-9]{2}-[0-9]{4}", "<SSN>")
    Tables.fanOut(Tables.documents(s, d), col("doc_id"))
      .select(col("doc_id"), raw.as("raw"), clean.as("clean"))
      .select(
        col("doc_id"),
        length(col("raw")).as("raw_len"),
        length(col("clean")).as("clean_len"),
        size(regexp_extract_all(col("clean"), lit("<EMAIL>|<PHONE>|<SSN>"), lit(0)))
          .as("n_redactions"),
        md5(col("clean")).as("clean_md5"))
  }

  /** Benchmark decontamination — flag training documents sharing any
    * word n-gram with a "benchmark" probe set (here: docs with
    * doc_id % 97 == 0 stand in for an eval set that leaked into the
    * corpus). Production uses 13-grams; this corpus draws from a ~40
    * word vocabulary, so 4-grams give equivalent selectivity (cross-doc
    * collisions exist at every sf — the check is visibly live). Scale
    * shape: the probe side is benchmark-sized, so its distinct grams
    * BROADCAST; the corpus side streams through explode → broadcast
    * hash join → per-doc count — no all-pairs, no big-side shuffle
    * before the final doc_id aggregation.
    */
  def decontaminate: Q = (s, d) => {
    val docs = Tables.fanOut(Tables.documents(s, d), col("doc_id"))
    val bench = fourGrams(docs.where(col("doc_id") % 97 === 0))
      .select("gram").distinct()
    flagContaminated(fourGrams(docs), bench)
  }

  /** q84's per-document distinct word 4-grams — shared with the
    * stream-ingest decontamination cell (q300), which must flag a
    * micro-batch with exactly the grams the batch recompute uses.
    */
  private[graft] def fourGrams(df: DataFrame): DataFrame = df
    .withColumn("ws", filter(split(col("text"), " "), w => w =!= ""))
    .where(size(col("ws")) >= 4)
    .select(col("doc_id"), explode(array_distinct(expr(
      """transform(sequence(1, size(ws) - 3),
        |  i -> array_join(slice(ws, i, 4), ' '))""".stripMargin))).as("gram"))

  /** q84's verdict join: corpus grams stream through a broadcast hash
    * join against the (benchmark-sized) probe gram set, then aggregate
    * to a per-doc contamination count. Within-doc compute only, so it
    * is exact on any corpus subset — the property the stream cell
    * (q300) relies on to flag each micro-batch independently.
    */
  private[graft] def flagContaminated(corpusGrams: DataFrame,
      benchGrams: DataFrame): DataFrame =
    corpusGrams
      .join(broadcast(benchGrams), Seq("gram"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_contaminated_grams"))
      .withColumn("is_benchmark", col("doc_id") % 97 === 0)

  /** GPT-style sequence packing: per source, concatenate documents in
    * doc_id order and split the token stream at a fixed budget (512
    * tokens); a document's chunk is floor(start_offset / budget).
    * Reported per (source, chunk): doc count, token mass, doc range —
    * the packing manifest a pretraining loader consumes. One shuffle
    * (window + aggregate share the `source` partitioning, so Catalyst
    * reuses the exchange); the running sum is a streaming window frame,
    * O(1) state per row.
    */
  def sequencePack: Q = (s, d) => {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("source").orderBy("doc_id")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    Tables.documents(s, d)
      .select(col("source"), col("doc_id"),
        size(filter(split(col("text"), " "), t => t =!= "")).cast("long").as("n_tokens"))
      .withColumn("prev", sum("n_tokens").over(w))
      .withColumn("chunk_id", expr("coalesce(prev, 0) div 512"))
      .groupBy("source", "chunk_id")
      .agg(count(lit(1)).as("n_docs"),
        sum("n_tokens").as("sum_tokens"),
        min("doc_id").as("first_doc"),
        max("doc_id").as("last_doc"))
  }

  /** [[ngramCounts]] on the native `word_ngrams` generator
    * ([[graft.functions.WordNgrams]]): grams stream out of the
    * generator one row at a time instead of materializing each
    * document's full gram array before explode — same answer (shares
    * q78's oracle), flat per-task memory. The expression-surface triad
    * completed: scalar (`dot_i64`), aggregate (`topk_rows`), generator
    * (`word_ngrams`).
    */
  def ngramCountsGen: Q = (s, d) => {
    graft.functions.GraftFunctions.register(s)
    Tables.fanOut(Tables.documents(s, d), col("doc_id"))
      .withColumn("ws", split(col("text"), " "))
      .select(expr("word_ngrams(ws, 2)").as("gram"))
      .groupBy("gram")
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("gram").asc)
      .limit(20)
  }

  /** Source mixing — the step that turns per-source corpora into a
    * pretraining mix: each source gets a token budget (weighted: here
    * even-numbered sources are upsampled 3x), documents are taken in
    * md5-hash order (random but reproducible across engines and cluster
    * sizes) until the budget is spent, greedy by start offset exactly
    * like [[sequencePack]]. Output is the per-source mixing manifest
    * (docs taken, tokens taken, budget). One shuffle on `source`; the
    * budget gate is a running-sum window, O(1) state per row.
    */
  def sourceMix: Q = (s, d) => {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("source").orderBy("h", "doc_id")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    Tables.documents(s, d)
      .select(col("source"), col("doc_id"),
        md5(col("doc_id").cast("string")).as("h"),
        size(filter(split(col("text"), " "), t => t =!= "")).cast("long").as("n_tokens"))
      .withColumn("budget",
        when(substring(col("source"), -1, 1).cast("int") % 2 === 0, lit(1500L))
          .otherwise(lit(500L)))
      .withColumn("prev", coalesce(sum("n_tokens").over(w), lit(0L)))
      .where(col("prev") < col("budget"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum("n_tokens").as("n_tokens"),
        max("budget").as("budget"))
  }

  /** Overlapping token-window chunking — the pass that turns documents
    * into model-context-sized pieces for embedding/RAG pipelines: chunk
    * windows of 64 tokens starting every 48 (16-token overlap), with a
    * trailing window only when it contributes tokens the previous one
    * didn't (the `st = 1 OR st <= n - 16` guard; the filter drops a
    * suffix of the start sequence, so `posexplode`'s index stays
    * `(start-1)/stride`). Everything is per-row array HOFs — no
    * shuffle at all before whatever consumes the chunks; chunk identity
    * is pinned by md5 over the joined window so the oracle proves the
    * exact token spans, not just counts.
    */
  def chunk: Q = (s, d) => {
    val (win, stride) = (64, 48)
    Tables.documents(s, d)
      .withColumn("ws", filter(split(col("text"), " "), w => w =!= ""))
      .withColumn("n", size(col("ws")))
      .where(col("n") >= 1)
      .withColumn("starts", expr(
        s"filter(sequence(1, n, $stride), st -> st = 1 OR st <= n - ${win - stride})"))
      .select(col("doc_id"), col("ws"),
        posexplode(col("starts")).as(Seq("chunk_id", "start")))
      .select(col("doc_id"), col("chunk_id"), col("start"),
        expr(s"size(slice(ws, start, $win))").as("chunk_tokens"),
        md5(expr(s"array_join(slice(ws, start, $win), ' ')")).as("chunk_md5"))
  }

  /** TF-IDF keyword extraction: top-3 terms per document by
    * tf × idf. The idf factor is the integer-rational
    * `(1e6 × N_docs) div df` instead of a float `ln(N/df)` — monotone
    * in N/df, so the RANKING is the standard one, while every score
    * stays exact 64-bit integer arithmetic that hash-matches any
    * engine bit for bit (a float log differs in final ulps across
    * libms, which an exact-hash oracle cannot tolerate; production can
    * swap the expression). Scale shape: explode → per-(doc,term) count
    * with map-side partials → term-level df (vocabulary-sized, tiny
    * next to the corpus) joined back on `term` → per-doc top-3 as
    * WindowGroupLimit. No driver-side state — N_docs is a scalar
    * subquery inside the plan.
    */
  def tfidf: Q = (s, d) => {
    // Unique per-call view name, dropped once the plan is analyzed —
    // concurrent queries in one session (or a user view of the same
    // name) must never collide with our scratch state.
    val v = "docs_tfidf_" + java.util.UUID.randomUUID().toString.replace("-", "")
    Tables.fanOut(Tables.documents(s, d), col("doc_id"))
      .createOrReplaceTempView(v)
    val df = s.sql(
      s"""WITH terms AS (
        |  SELECT doc_id, explode(filter(split(text, ' '), w -> w != '')) AS term
        |  FROM $v),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM terms GROUP BY doc_id, term),
        |df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
        |scored AS (
        |  SELECT tf.doc_id, tf.term, tf.tf, df.df,
        |    tf.tf * ((1000000 * (SELECT count(*) FROM $v)) div df.df) AS score
        |  FROM tf JOIN df ON tf.term = df.term),
        |ranked AS (
        |  SELECT *, row_number() OVER (
        |    PARTITION BY doc_id ORDER BY score DESC, term ASC) AS rk
        |  FROM scored)
        |SELECT doc_id, rk, term, tf, df, score FROM ranked WHERE rk <= 3""".stripMargin)
    s.catalog.dropTempView(v) // sql() analyzed eagerly; the plan no longer needs it
    df
  }

  /** Corpus vocabulary statistics per source: vocabulary size (distinct
    * words), hapax legomena (words seen exactly once — the tail that
    * dominates real vocabularies and drives tokenizer OOV decisions),
    * and type-token ratio in exact ppm. Two-level aggregation: the
    * (source, word) term counts are map-side-combinable partials, the
    * source-level rollup is vocabulary-sized — the corpus itself is
    * scanned once and never re-shuffled at corpus size.
    */
  def vocabStats: Q = (s, d) => {
    val words = Tables.fanOut(Tables.documents(s, d), col("doc_id"))
      .select(col("source"),
        explode(expr("filter(split(text, ' '), w -> w != '')")).as("word"))
    words.groupBy("source", "word").agg(count(lit(1)).as("n"))
      .groupBy("source")
      .agg(sum("n").as("n_tokens"),
        count(lit(1)).as("vocab"),
        sum(when(col("n") === 1, 1L).otherwise(0L)).as("hapax"))
      .select(col("source"), col("n_tokens"), col("vocab"), col("hapax"),
        expr("(vocab * 1000000) div n_tokens").as("ttr_ppm"))
  }

  /** Tokenizer-vocabulary coverage audit: fix a reference vocabulary
    * (here the corpus's global top-20 words by frequency, word text as
    * the deterministic tie-break — standing in for a real tokenizer's
    * vocab file) and measure, per source, how many token OCCURRENCES
    * fall outside it (out-of-vocabulary, exact ppm). The per-source OOV
    * rate is the number a tokenizer/vocab decision is actually judged
    * by; [[vocabStats]]'s hapax/TTR describe the corpus itself.
    *
    * Scale shape: one explode feeds both the frequency aggregate and
    * the coverage rollup; the vocabulary is vocabulary-sized (top-k via
    * TakeOrderedAndProject) and broadcast to the coverage join, so the
    * corpus is never re-shuffled at token granularity.
    */
  def vocabCoverage: Q = (s, d) => {
    val toks = Tables.fanOut(Tables.documents(s, d), col("doc_id"))
      .select(col("source"),
        explode(expr("filter(split(text, ' '), w -> w != '')")).as("t"))
    val vocab = toks.groupBy("t").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("t")).limit(20)
      .select(col("t"), lit(1L).as("iv"))
    toks.join(broadcast(vocab), Seq("t"), "left")
      .groupBy("source")
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("iv").isNull, 1L).otherwise(0L)).as("n_oov"))
      .withColumn("oov_ppm", expr("n_oov * 1000000L div n_tokens"))
  }

  /** Quality-weighted data selection with epoch upsampling — the
    * curriculum step between scoring (q30/q75) and mixing (q90): score
    * each doc by type-token ratio (exact ppm), drop the low-quality
    * tail, and UPSAMPLE the top bins by emitting one manifest row per
    * training epoch (`explode(sequence(1, weight))` — the repeated-pass
    * list a trainer actually consumes). Equi-width ppm bins, not
    * ntile: bin assignment is a per-row projection with no global sort
    * (q116 shows the distributed-ntile mechanic where true equi-depth
    * is required). One scan; the rollup is map-side combinable.
    */
  def qualityUpsample: Q = (s, d) =>
    Tables.documents(s, d)
      .select(col("doc_id"), col("source"),
        expr("filter(split(text, ' '), w -> w != '')").as("ws"))
      .select(col("doc_id"), col("source"),
        size(col("ws")).cast("long").as("words"),
        size(array_distinct(col("ws"))).cast("long").as("dwords"))
      .where(col("words") > 0)
      .withColumn("ppm", expr("dwords * 1000000 div words"))
      .withColumn("bin", least(lit(9L), expr("ppm div 100000")))
      .withColumn("weight",
        when(col("bin") >= 7, 3L).when(col("bin") >= 5, 1L).otherwise(0L))
      .where(col("weight") > 0)
      .select(col("source"), col("bin"), col("words"),
        explode(expr("sequence(1L, weight)")).as("epoch"))
      .groupBy("source", "bin", "epoch")
      .agg(count(lit(1)).as("n_docs"), sum("words").as("n_tokens"))

  /** q301: TOKEN-BUDGET corpus selection — "take the best documents
    * until the budget is spent", the step a pretraining run actually
    * executes between scoring (q30/q141) and packing (q85): rank docs
    * by an exact integer quality score (q141's type-token ppm), select
    * in (score DESC, doc_id ASC) order while the running token total
    * stays within the budget (here 40% of the corpus' tokens).
    *
    * The selection rule is a global prefix over a total order, but the
    * PLAN never globally sorts the corpus — at 100 TB a full sort by
    * score is the expensive thing this operator exists to avoid:
    *  1. one aggregation builds the per-SCORE token histogram (grain =
    *     distinct ppm values, ≤ 1e6 rows regardless of corpus size);
    *  2. a driver-side walk over that grain-sized histogram finds the
    *     boundary score t*: every class above t* fits whole, class t*
    *     fits partially with `r` tokens of room;
    *  3. classes above t* are selected by a plain FILTER (no sort —
    *     membership needs no order), and only the single boundary
    *     class takes a prefix cut — itself via the two-level
    *     distributed prefix sum (in-bucket running sums run wide,
    *     partitioned by doc_id div 2¹⁶; bucket offsets prefix-sum on
    *     the tiny bucket table), so even a pathologically large
    *     boundary class (every short all-distinct-words doc scores
    *     exactly 1e6) never serializes into one task.
    * Work: one scan + one grain aggregate + a wide one-class prefix
    * sum. The class-local prefix condition (cum ≤ r) is equivalent to
    * the global rule (cum ≤ budget) because the running sum is
    * strictly increasing (words > 0) and every selected-above class
    * contributes wholly before t* in the global order. TextSpec pins
    * equality with the single-window global-rule recompute, budget
    * tightness, and completeness of the above-boundary classes.
    */
  def tokenBudgetSelect: Q = (s, d) => {
    // the scored projection feeds the histogram AND both selection
    // branches: checkpoint the (doc_id, ppm, words) triple — 24
    // bytes/doc, tiny next to the text it distills — so the corpus
    // text is split and scored exactly ONCE, not once per consumer
    val scored = Tables.documents(s, d)
      .select(col("doc_id"),
        expr("filter(split(text, ' '), w -> w != '')").as("ws"))
      .select(col("doc_id"),
        size(col("ws")).cast("long").as("words"),
        size(array_distinct(col("ws"))).cast("long").as("dwords"))
      .where(col("words") > 0)
      .withColumn("ppm", expr("dwords * 1000000 div words"))
      .select("doc_id", "ppm", "words")
      .localCheckpoint(true)
    // grain-sized score histogram, walked descending on the driver
    val hist = scored.groupBy("ppm").agg(sum("words").as("tok"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(-_._1)
    val budget = hist.map(_._2).sum * 2 / 5
    var i = 0
    var acc = 0L
    while (i < hist.length && acc + hist(i)._2 <= budget) {
      acc += hist(i)._2; i += 1
    }
    if (i == hist.length) scored // the whole corpus fits
    else {
      import org.apache.spark.sql.expressions.Window
      val t = hist(i)._1 // boundary class; r tokens of room remain
      val r = budget - acc
      // the boundary class's prefix cut via the two-level distributed
      // prefix sum (q167's cumWeights shape): no single-task class sort
      val b = scored.where(col("ppm") === t)
        .withColumn("bucket", expr("doc_id div 65536"))
      val prevB = Window.orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
      val offsets = b.groupBy("bucket").agg(sum("words").as("bw"))
        .withColumn("offset", coalesce(sum("bw").over(prevB), lit(0L)))
        .select("bucket", "offset")
      val inB = Window.partitionBy("bucket").orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, 0)
      val boundary = b
        .withColumn("incum", sum("words").over(inB))
        .join(broadcast(offsets), Seq("bucket"))
        .where(col("offset") + col("incum") <= r)
        .select("doc_id", "ppm", "words")
      scored.where(col("ppm") > t).unionByName(boundary)
    }
  }

  /** q303: deterministic SHUFFLE SHARDS — the reproducible global
    * shuffle a training run consumes: every document gets a shard (one
    * of 64) and a position within it, fixed by pure integer hashing of
    * doc_id alone, so any two runs (and any two engines) produce the
    * SAME training order — seed-stable data ordering is a
    * reproducibility requirement for pretraining, and "shuffle" must
    * never mean engine-dependent randomness.
    *
    * Scale shape: shard assignment is a stateless projection; the
    * intra-shard order is a per-shard window — 64 independent
    * shard-local sorts that run as wide as the cluster, never ONE
    * global sort of the corpus (the thing a naive ORDER BY rand(seed)
    * would do, with a nondeterministic answer to boot). Two decoupled
    * multiplicative hashes: one picks the shard, the other orders
    * within it, so adjacent doc_ids scatter across shards AND arrive
    * shuffled inside each. Both hashes pre-reduce doc_id mod 2^31-1
    * before multiplying, so the product stays ≤ ~5.7e18 < Long.Max at
    * ANY corpus size — no ANSI overflow at 100 TB ids.
    */
  def shuffleShards: Q = (s, d) => {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("shard").orderBy("h2", "doc_id")
    Tables.documents(s, d).select(col("doc_id"))
      .withColumn("shard",
        expr("((doc_id % 2147483647) * 2654435761 + 40503) % 2147483647 % 64"))
      .withColumn("h2",
        expr("((doc_id % 2147483647) * 1103515245 + 12345) % 2147483647"))
      .withColumn("pos", row_number().over(w).cast("long"))
      .select("doc_id", "shard", "pos")
  }

  /** Dataset card — the corpus datasheet in one pass: doc/source/lang
    * counts, token and char totals, the exact-duplicate rate, and the
    * char-length median, emitted as (metric, value) rows. ONE aggregate
    * over one scan (the three count-distincts ride the same Expand);
    * the output is datasheet-sized regardless of corpus size — this is
    * the summary every released dataset ships, as a query instead of a
    * notebook.
    */
  def datasetCard: Q = (s, d) =>
    Tables.fanOut(Tables.documents(s, d), col("doc_id"))
      .select(col("source"), col("lang"), col("n_chars"),
        size(expr("filter(split(text, ' '), w -> w != '')")).cast("long").as("words"),
        md5(col("text")).as("h"))
      .agg(
        count(lit(1)).as("n_docs"),
        countDistinct("source").as("n_sources"),
        countDistinct("lang").as("n_langs"),
        sum("words").as("n_tokens"),
        sum("n_chars").as("n_chars_total"),
        (count(lit(1)) - countDistinct("h")).as("n_exact_dup_docs"),
        floor(expr("percentile(n_chars, 0.5)")).cast("long").as("p50_chars"),
        min("n_chars").as("min_chars"),
        max("n_chars").as("max_chars"))
      .selectExpr(
        """stack(9,
          |  'n_docs', n_docs, 'n_sources', n_sources, 'n_langs', n_langs,
          |  'n_tokens', n_tokens, 'n_chars_total', n_chars_total,
          |  'n_exact_dup_docs', n_exact_dup_docs, 'p50_chars', p50_chars,
          |  'min_chars', min_chars, 'max_chars', max_chars
          |) AS (metric, value)""".stripMargin)

  /** Deterministic weighted sampling — Sequential Poisson Sampling
    * (Ohlsson 1998), the probability-proportional-to-size draw a data-
    * mixing pipeline uses to favor long/high-quality documents without
    * a random number generator: priority = u div w, where u is a
    * uniform 60-bit integer derived from the doc key's md5 and w is the
    * weight (chars here; tokens or a quality score in practice). The
    * k smallest priorities per source are the sample, so inclusion odds
    * scale ~with w, yet the draw is a pure function of the key — stable
    * across runs, engines, partitionings and cluster sizes, composable
    * with q63's unweighted sibling. Integer division keeps both engines
    * bit-identical (no float log/exp in the priority). The per-source
    * top-k is a window here; at 100 TB the same selection runs as a
    * heap partial aggregate (q39's `topk_rows` shape) — k survivors per
    * partition, no per-source full sort.
    */
  def weightedSample: Q = (s, d) => {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("source").orderBy("priority", "doc_id")
    Tables.documents(s, d)
      .where(col("n_chars") > 0)
      .withColumn("u",
        expr("cast(conv(substring(md5(cast(doc_id as string)), 1, 15), 16, 10) as bigint)"))
      .withColumn("priority", expr("u div n_chars"))
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= 10)
      .select(col("source"), col("rn"), col("doc_id"), col("n_chars"),
        col("priority"))
  }

  /** BM25 keyword scoring — the retrieval scorer between q103's TF-IDF
    * and a neural ranker, in EXACT integer arithmetic: with rational
    * k1 = 6/5 and b = 3/4, and avgdl kept as the exact fraction
    * total_tokens/N, the classic
    * `idf · tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl))` reduces to ONE
    * integer division `idf · 44·tf·T div (20·tf·T + 6·T + 18·dl·N)`
    * (T = corpus tokens, dl = doc length), so both engines agree
    * bit-for-bit — no float in the plan. idf is q103's integer family
    * (`1000·N div df`; the log-idf of textbook BM25 cannot be exact
    * across engines). Magnitudes: numerator ≤ idf·44·tf·T ≈ 1.3e17 at
    * sf1-scale corpora — inside BIGINT; a 100 TB corpus widens the
    * two products to DECIMAL(38,0) and keeps the same plan. Top-3
    * terms per doc, ties broken by term; same shuffle shape as q103
    * (terms → tf → df join → per-doc window).
    */
  def bm25: Q = (s, d) => {
    val v = "docs_bm25_" + java.util.UUID.randomUUID().toString.replace("-", "")
    Tables.fanOut(Tables.documents(s, d), col("doc_id"))
      .createOrReplaceTempView(v)
    // corpus totals (N docs, T tokens) are ONE aggregate row — fetched
    // and inlined as literals (the q118 shape): a `CROSS JOIN c` would
    // plan the BroadcastNestedLoopJoin the fleet-wide plan lint rejects
    val totals = s.sql(
      s"""SELECT count(*) AS n,
         |  sum(size(filter(split(text, ' '), w -> w != ''))) AS t
         |FROM $v""".stripMargin).head()
    val (n, t) = (totals.getLong(0), totals.getLong(1))
    val df = s.sql(
      s"""WITH terms AS (
        |  SELECT doc_id, explode(filter(split(text, ' '), w -> w != '')) AS term
        |  FROM $v),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM terms GROUP BY doc_id, term),
        |dl AS (SELECT doc_id, count(*) AS dl FROM terms GROUP BY doc_id),
        |df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
        |scored AS (
        |  SELECT tf.doc_id, tf.term, tf.tf, df.df,
        |    (((1000L * ${n}L) div df.df) * 44 * tf.tf * ${t}L)
        |      div (20 * tf.tf * ${t}L + 6 * ${t}L + 18 * dl.dl * ${n}L) AS score_mil
        |  FROM tf
        |  JOIN df ON tf.term = df.term
        |  JOIN dl ON tf.doc_id = dl.doc_id),
        |ranked AS (
        |  SELECT *, row_number() OVER (
        |    PARTITION BY doc_id ORDER BY score_mil DESC, term ASC) AS rk
        |  FROM scored)
        |SELECT doc_id, rk, term, tf, df, score_mil FROM ranked WHERE rk <= 3""".stripMargin)
    s.catalog.dropTempView(v)
    df
  }

  /** Feature hashing (the hashing trick) — the fixed-width featurizer
    * that needs NO vocabulary pass: every token is mapped straight to
    * `md5₆₀(token) mod 32` and counted, yielding each document's sparse
    * 32-bucket term-frequency vector as (doc_id, bucket, cnt) rows.
    * One explode + one hash aggregation — embarrassingly parallel, no
    * dictionary broadcast, no OOV problem; the md5-prefix bucket is
    * q150's cross-engine-deterministic integer family, so the oracle is
    * exact. At 100 TB the shape is unchanged: the aggregation key
    * (doc_id, bucket) inherits the corpus partitioning.
    */
  def featureHash: Q = (s, d) =>
    Tables.fanOut(Tables.documents(s, d), col("doc_id"))
      .select(col("doc_id"),
        explode(expr("filter(split(text, ' '), w -> w != '')")).as("term"))
      .withColumn("bucket",
        expr("cast(conv(substring(md5(term), 1, 15), 16, 10) as bigint) % 32"))
      .groupBy("doc_id", "bucket").agg(count(lit(1)).as("cnt"))

  /** Phrase search via a positional inverted index: find every document
    * containing the exact consecutive phrase "fast table", with match
    * count and first match position — the primitive behind exact-phrase
    * retrieval and n-gram decontamination at position granularity
    * (q111's inverted index stores only doc-level postings; positions
    * are what make PHRASES answerable without rescanning text).
    *
    * Scale shape: one posexplode feeds both term branches; each branch
    * filter-pushes its term, so the self-join joins two TERM-SIZED
    * posting lists on (doc, position) — an equi join keyed by document,
    * never a text rescan or a cartesian. Positions are 1-based on both
    * engines (Spark posexplode is 0-based and shifts; DuckDB
    * generate_subscripts is 1-based natively).
    */
  def phraseSearch: Q = (s, d) => {
    val toks = Tables.fanOut(Tables.documents(s, d), col("doc_id"))
      .select(col("doc_id"),
        posexplode(expr("filter(split(text, ' '), w -> w != '')")))
      .toDF("doc_id", "pos", "w")
    val a = toks.where(col("w") === "fast").select(col("doc_id"), col("pos"))
    val b = toks.where(col("w") === "table")
      .select(col("doc_id"), (col("pos") - 1).as("pos"))
    a.join(b, Seq("doc_id", "pos"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_matches"),
        (min("pos") + lit(1)).cast("long").as("first_pos"))
  }

  /** Posting-list delta-compression audit: per source, the exact bit
    * cost of gap-encoding the sorted doc_id posting list (Elias-style:
    * ⌈log₂ gap⌉+1 bits = the binary-string length of each gap) vs raw
    * 64-bit ids — the number an inverted-index/retrieval layout decision
    * is judged by.
    *
    * Scale shape: the q168 bucketed-lag pattern — NO per-source
    * single-task sort. In-bucket gaps (`doc_id div 256`) come from a
    * wide (source, bucket)-partitioned lag; each bucket's FIRST gap
    * reaches back to the previous bucket's max via a prefix-max over
    * the tiny |sources|×|buckets| bounds table (absent buckets fall out
    * automatically). The oracle keeps the naive single-window form —
    * same answer, different plan.
    */
  def postingBits: Q = (s, d) => {
    import org.apache.spark.sql.expressions.Window
    val bw = 256L
    val docs = Tables.documents(s, d)
      .select(col("source"), col("doc_id"))
      .withColumn("bkt", expr(s"doc_id div ${bw}L"))
    val inB = docs.withColumn("prev", lag("doc_id", 1).over(
      Window.partitionBy("source", "bkt").orderBy("doc_id")))
    val bounds = docs.groupBy("source", "bkt")
      .agg(max("doc_id").as("bmax"))
      .withColumn("prev_bmax", lag("bmax", 1).over(
        Window.partitionBy("source").orderBy("bkt")))
      .select("source", "bkt", "prev_bmax")
    inB.join(broadcast(bounds), Seq("source", "bkt"))
      .withColumn("gap",
        col("doc_id") - coalesce(col("prev"), col("prev_bmax"), lit(0L)))
      .withColumn("bits", length(bin(col("gap"))).cast("long"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        (count(lit(1)) * 64L).as("raw_bits"),
        sum("bits").as("gap_bits"))
      .withColumn("savings_ppm",
        expr("(raw_bits - gap_bits) * 1000000L div raw_bits"))
  }

  /** Bigram language-model quality scoring — the CCNet/KenLM-style
    * corpus filter: train an add-one-smoothed bigram LM on the corpus
    * itself, then score every document by its average smoothed bigram
    * probability `P(w2|w1) = (c(w1 w2) + 1) / (c(w1 ·) + |V|)`. Low
    * scores mark text the corpus LM finds unpredictable (noise, rare
    * boilerplate, wrong-language spans); high scores mark repetitive/
    * templated text — both tails are what a curation pass inspects.
    *
    * Integer-exact by doctrine (the q152 BM25 pattern): probabilities
    * are fixed-point ppm via integer division — no logs, no floats, so
    * DuckDB replays bit-for-bit. The arithmetic mean of probabilities
    * stands in for perplexity's geometric mean; for thresholding at
    * fixed window size the tails it exposes are the same, and the
    * trade buys an exact oracle on a transcendental-free plan.
    *
    * Scale shape: bigram and context counts are each ONE hash
    * aggregate; scoring joins each doc's bigram stream to the two count
    * tables on their keys (keyed shuffles — the LM is corpus-sized, so
    * no broadcast); |V| is a scalar inlined as a literal (the q118
    * shape). Nothing quadratic, nothing driver-side but two scalars.
    */
  def lmScore: Q = (s, d) => {
    val toks = Tables.fanOut(Tables.documents(s, d), col("doc_id"))
      .withColumn("ws", filter(split(col("text"), " "), w => w =!= ""))
    val vocab = toks.select(explode(col("ws")).as("w"))
      .agg(countDistinct("w")).head().getLong(0)
    val big = toks.where(size(col("ws")) >= 2)
      .select(col("doc_id"), explode(expr(
        """transform(sequence(1, size(ws) - 1),
          |  i -> struct(element_at(ws, i) AS w1, element_at(ws, i + 1) AS w2))"""
          .stripMargin)).as("b"))
      .select(col("doc_id"), col("b.w1").as("w1"), col("b.w2").as("w2"))
    val cb = big.groupBy("w1", "w2").agg(count(lit(1)).as("cb"))
    val cu = big.groupBy("w1").agg(count(lit(1)).as("cu"))
    big.join(cb, Seq("w1", "w2")).join(cu, Seq("w1"))
      .select(col("doc_id"),
        expr(s"(cb + 1) * 1000000L div (cu + ${vocab}L)").as("p"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        expr("sum(p) div count(1)").as("avg_p_ppm"))
  }

  val queries: Map[String, Q] = Map(
    "q227_lm_score" -> lmScore,
    "q197_phrase_search" -> phraseSearch,
    "q199_posting_bits" -> postingBits,
    "q163_feature_hash" -> featureHash,
    "q152_bm25" -> bm25,
    "q150_weighted_sample" -> weightedSample,
    "q141_quality_upsample" -> qualityUpsample,
    "q301_token_budget_select" -> tokenBudgetSelect,
    "q303_shuffle_shards" -> shuffleShards,
    "q146_dataset_card" -> datasetCard,
    "q138_vocab_stats" -> vocabStats,
    "q191_vocab_coverage" -> vocabCoverage,
    "q30_text_quality" -> quality,
    "q31_text_langid" -> langId,
    "q32_token_count" -> tokenCount,
    "q33_fingerprint" -> fingerprint,
    "q62_corpus_pipeline" -> corpusPipeline,
    "q75_repetition" -> repetition,
    "q76_stratified_sample" -> stratifiedSample,
    "q77_length_histogram" -> lengthHistogram,
    "q78_ngram_counts" -> ngramCounts,
    "q79_ngram_topk_sketch" -> ngramTopKSketchChecked,
    "q83_pii_redact" -> piiRedact,
    "q84_decontaminate" -> decontaminate,
    "q85_sequence_pack" -> sequencePack,
    "q90_source_mix" -> sourceMix,
    "q92_ngram_generator" -> ngramCountsGen,
    "q102_chunking" -> chunk,
    "q103_tfidf" -> tfidf)

  /** q92 (native generator) shares q78's oracle: the gram multiset is
    * byte-identical by construction.
    */
  private val bigramOracle =
    """WITH words AS (SELECT string_split(text, ' ') ws FROM documents),
      |g AS (SELECT unnest(list_transform(range(1, len(ws)),
      |        i -> ws[i] || ' ' || ws[i+1])) AS gram
      |      FROM words WHERE len(ws) >= 2)
      |SELECT gram, count(*) AS cnt FROM g GROUP BY gram
      |ORDER BY cnt DESC, gram ASC LIMIT 20""".stripMargin

  val oracles: Map[String, String] = Map(
    "q227_lm_score" ->
      """WITH t AS (SELECT doc_id,
        |    list_filter(string_split(text, ' '), w -> w <> '') ws
        |  FROM documents),
        |tok AS (SELECT unnest(ws) AS w FROM t),
        |v AS (SELECT count(DISTINCT w) AS vs FROM tok),
        |b0 AS (SELECT doc_id,
        |    unnest(list_transform(range(1, len(ws)),
        |      i -> {'w1': ws[i], 'w2': ws[i+1]})) AS u
        |  FROM t),
        |b AS (SELECT doc_id, u.w1 AS w1, u.w2 AS w2 FROM b0),
        |cb AS (SELECT w1, w2, count(*) c FROM b GROUP BY 1, 2),
        |cu AS (SELECT w1, count(*) c FROM b GROUP BY 1),
        |sc AS (SELECT b.doc_id,
        |    ((cb.c + 1) * 1000000) // (cu.c + v.vs) AS p
        |  FROM b JOIN cb ON b.w1 = cb.w1 AND b.w2 = cb.w2
        |  JOIN cu ON b.w1 = cu.w1 CROSS JOIN v)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
        |  CAST(sum(p) // count(*) AS BIGINT) AS avg_p_ppm
        |FROM sc GROUP BY 1""".stripMargin,
    // sketch-audit oracle (q79): heavy-hitter coverage + estimate
    // accuracy asserted as literal TRUEs next to the exact top-10
    // cardinality (see ngramTopKSketchChecked)
    "q79_ngram_topk_sketch" ->
      """WITH words AS (SELECT string_split(text, ' ') ws FROM documents),
        |g AS (SELECT unnest(list_transform(range(1, len(ws)),
        |        i -> ws[i] || ' ' || ws[i+1])) AS gram
        |      FROM words WHERE len(ws) >= 2)
        |SELECT CAST(least(10, count(DISTINCT gram)) AS BIGINT) AS n_top10,
        |  TRUE AS top10_covered, TRUE AS top10_est_within_1pct
        |FROM g""".stripMargin,
    "q197_phrase_search" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    unnest(list_filter(string_split(text, ' '), w -> w <> '')) AS w,
        |    generate_subscripts(
        |      list_filter(string_split(text, ' '), w -> w <> ''), 1) AS pos
        |  FROM documents)
        |SELECT a.doc_id, count(*) AS n_matches,
        |  CAST(min(a.pos) AS BIGINT) AS first_pos
        |FROM t a JOIN t b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
        |WHERE a.w = 'fast' AND b.w = 'table'
        |GROUP BY a.doc_id""".stripMargin,
    // the bucketed-lag plan must equal the naive per-source window
    "q199_posting_bits" ->
      """WITH g AS (
        |  SELECT source,
        |    doc_id - coalesce(lag(doc_id) OVER (
        |      PARTITION BY source ORDER BY doc_id), 0) AS gap
        |  FROM documents)
        |SELECT source, count(*) AS n_docs,
        |  count(*) * 64 AS raw_bits,
        |  CAST(sum(length(bin(gap))) AS BIGINT) AS gap_bits,
        |  (count(*) * 64 - CAST(sum(length(bin(gap))) AS BIGINT))
        |    * 1000000 // (count(*) * 64) AS savings_ppm
        |FROM g GROUP BY source""".stripMargin,
    "q163_feature_hash" ->
      """WITH terms AS (
        |  SELECT doc_id,
        |    unnest(list_filter(string_split(text, ' '), w -> w <> '')) AS term
        |  FROM documents)
        |SELECT doc_id,
        |  CAST('0x' || substr(md5(term), 1, 15) AS BIGINT) % 32 AS bucket,
        |  count(*) AS cnt
        |FROM terms GROUP BY 1, 2""".stripMargin,
    "q152_bm25" ->
      """WITH terms AS (
        |  SELECT doc_id, unnest(list_filter(string_split(text, ' '), w -> w <> ''))
        |    AS term
        |  FROM documents),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM terms GROUP BY doc_id, term),
        |dl AS (SELECT doc_id, count(*) AS dl FROM terms GROUP BY doc_id),
        |df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
        |c AS (SELECT count(*) AS n, CAST(sum(dl) AS BIGINT) AS t FROM dl),
        |scored AS (
        |  SELECT tf.doc_id, tf.term, tf.tf, df.df,
        |    CAST((((1000 * c.n) // df.df) * 44 * tf.tf * c.t)
        |      // (20 * tf.tf * c.t + 6 * c.t + 18 * dl.dl * c.n) AS BIGINT)
        |      AS score_mil
        |  FROM tf
        |  JOIN df ON tf.term = df.term
        |  JOIN dl ON tf.doc_id = dl.doc_id
        |  CROSS JOIN c),
        |ranked AS (
        |  SELECT *, CAST(row_number() OVER (
        |    PARTITION BY doc_id ORDER BY score_mil DESC, term ASC) AS INT) AS rk
        |  FROM scored)
        |SELECT doc_id, rk, term, tf, df, score_mil FROM ranked WHERE rk <= 3""".stripMargin,
    "q150_weighted_sample" ->
      """WITH t AS (
        |  SELECT source, doc_id, n_chars,
        |    CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT)
        |      // n_chars AS priority
        |  FROM documents WHERE n_chars > 0),
        |r AS (
        |  SELECT source, doc_id, n_chars, priority,
        |    CAST(row_number() OVER (
        |      PARTITION BY source ORDER BY priority, doc_id) AS INT) AS rn
        |  FROM t)
        |SELECT source, rn, doc_id, n_chars, priority FROM r WHERE rn <= 10""".stripMargin,
    "q146_dataset_card" ->
      """WITH base AS (
        |  SELECT source, lang, n_chars,
        |    CAST(len(list_filter(string_split(text, ' '), w -> w <> '')) AS BIGINT)
        |      AS words,
        |    md5(text) AS h
        |  FROM documents),
        |a AS (
        |  SELECT count(*) AS n_docs,
        |    count(DISTINCT source) AS n_sources,
        |    count(DISTINCT lang) AS n_langs,
        |    CAST(sum(words) AS BIGINT) AS n_tokens,
        |    CAST(sum(n_chars) AS BIGINT) AS n_chars_total,
        |    count(*) - count(DISTINCT h) AS n_exact_dup_docs,
        |    CAST(floor(quantile_cont(n_chars, 0.5)) AS BIGINT) AS p50_chars,
        |    min(n_chars) AS min_chars, max(n_chars) AS max_chars
        |  FROM base)
        |SELECT 'n_docs' AS metric, n_docs AS value FROM a
        |UNION ALL SELECT 'n_sources', n_sources FROM a
        |UNION ALL SELECT 'n_langs', n_langs FROM a
        |UNION ALL SELECT 'n_tokens', n_tokens FROM a
        |UNION ALL SELECT 'n_chars_total', n_chars_total FROM a
        |UNION ALL SELECT 'n_exact_dup_docs', n_exact_dup_docs FROM a
        |UNION ALL SELECT 'p50_chars', p50_chars FROM a
        |UNION ALL SELECT 'min_chars', min_chars FROM a
        |UNION ALL SELECT 'max_chars', max_chars FROM a""".stripMargin,
    "q141_quality_upsample" ->
      """WITH t AS (
        |  SELECT doc_id, source,
        |    CAST(len(list_filter(string_split(text, ' '), w -> w <> '')) AS BIGINT)
        |      AS words,
        |    CAST(len(list_distinct(list_filter(string_split(text, ' '), w -> w <> '')))
        |      AS BIGINT) AS dwords
        |  FROM documents),
        |b AS (
        |  SELECT source, words,
        |    least(9, (dwords * 1000000 // words) // 100000) AS bin
        |  FROM t WHERE words > 0),
        |w AS (
        |  SELECT source, bin, words,
        |    CASE WHEN bin >= 7 THEN 3 WHEN bin >= 5 THEN 1 ELSE 0 END AS weight
        |  FROM b),
        |e AS (
        |  SELECT source, bin, words,
        |    CAST(unnest(range(1, weight + 1)) AS BIGINT) AS epoch
        |  FROM w WHERE weight > 0)
        |SELECT source, CAST(bin AS BIGINT) AS bin, epoch,
        |  count(*) AS n_docs, CAST(sum(words) AS BIGINT) AS n_tokens
        |FROM e GROUP BY source, bin, epoch""".stripMargin,
    // same two multiplicative hashes, same pre-reduction, same window:
    // the training order is engine-independent by construction
    "q303_shuffle_shards" ->
      """WITH h AS (
        |  SELECT doc_id,
        |    ((doc_id % 2147483647) * 2654435761 + 40503) % 2147483647 % 64
        |      AS shard,
        |    ((doc_id % 2147483647) * 1103515245 + 12345) % 2147483647 AS h2
        |  FROM documents)
        |SELECT doc_id, shard,
        |  CAST(row_number() OVER (PARTITION BY shard ORDER BY h2, doc_id)
        |    AS BIGINT) AS pos
        |FROM h""".stripMargin,
    // the selection rule stated directly: one global window in
    // (ppm DESC, doc_id ASC) order, running token sum within budget —
    // the plan-shape cleverness (histogram walk, one-class sort) must
    // land exactly on the naive rule
    "q301_token_budget_select" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    CAST(len(list_filter(string_split(text, ' '), w -> w <> '')) AS BIGINT)
        |      AS words,
        |    CAST(len(list_distinct(list_filter(string_split(text, ' '), w -> w <> '')))
        |      AS BIGINT) AS dwords
        |  FROM documents),
        |s AS (
        |  SELECT doc_id, dwords * 1000000 // words AS ppm, words
        |  FROM t WHERE words > 0),
        |b AS (SELECT CAST(sum(words) * 2 // 5 AS BIGINT) AS budget FROM s),
        |o AS (
        |  SELECT doc_id, ppm, words,
        |    sum(words) OVER (ORDER BY ppm DESC, doc_id ASC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM s)
        |SELECT doc_id, ppm, words FROM o, b WHERE cum <= budget""".stripMargin,
    "q191_vocab_coverage" ->
      """WITH toks AS (
        |  SELECT source,
        |    unnest(list_filter(string_split(text, ' '), w -> w <> '')) AS t
        |  FROM documents),
        |vocab AS (
        |  SELECT t, 1 AS iv FROM (
        |    SELECT t, count(*) AS cnt FROM toks GROUP BY t
        |    ORDER BY cnt DESC, t ASC LIMIT 20)),
        |j AS (SELECT toks.source, vocab.iv
        |      FROM toks LEFT JOIN vocab ON toks.t = vocab.t)
        |SELECT source, count(*) AS n_tokens,
        |  CAST(sum(CASE WHEN iv IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
        |  CAST(sum(CASE WHEN iv IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |    * 1000000 // count(*) AS oov_ppm
        |FROM j GROUP BY source""".stripMargin,
    "q138_vocab_stats" ->
      """WITH words AS (
        |  SELECT source,
        |    unnest(list_filter(string_split(text, ' '), w -> w <> '')) AS word
        |  FROM documents),
        |tc AS (SELECT source, word, count(*) AS n FROM words GROUP BY source, word)
        |SELECT source,
        |  CAST(sum(n) AS BIGINT) AS n_tokens,
        |  count(*) AS vocab,
        |  CAST(sum(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS BIGINT) AS hapax,
        |  count(*) * 1000000 // CAST(sum(n) AS BIGINT) AS ttr_ppm
        |FROM tc GROUP BY source""".stripMargin,
    "q30_text_quality" ->
      s"""WITH t AS (
         |  SELECT doc_id, text, string_split(text, ' ') ws FROM documents),
         |m AS (
         |  SELECT doc_id,
         |    CAST(len(list_filter(ws, w -> w <> '')) AS INT) n_tokens,
         |    CAST(length(text) AS INT) n_chars_m,
         |    len(list_filter(ws, w -> w IN ($stopList))) n_stop,
         |    list_sum(list_transform(ws, w -> CAST(length(w) AS BIGINT))) sum_len
         |  FROM t)
         |SELECT doc_id, n_tokens, n_chars_m,
         |  CAST(n_stop AS DOUBLE) / n_tokens AS stop_ratio,
         |  CAST(sum_len AS DOUBLE) / n_tokens AS mean_tok_len,
         |  CAST(n_stop AS DOUBLE) / n_tokens * 0.5 +
         |    least(CAST(n_tokens AS DOUBLE) / 100.0, 1.0) * 0.5 AS quality_score
         |FROM m""".stripMargin,
    "q31_text_langid" -> {
      val counts = TextQueries.langMarkers.map { case (l, ms) =>
        s"    CAST(len(list_filter(ws, w -> w IN (${ms.map(m => s"'$m'").mkString(", ")}))) AS INT) c_$l"
      }.mkString(",\n")
      val best = s"greatest(${TextQueries.langMarkers.map { case (l, _) => s"c_$l" }.mkString(", ")})"
      val cases = TextQueries.langMarkers.map { case (l, _) =>
        s"WHEN c_$l = $best THEN '$l'"
      }.mkString(" ")
      s"""WITH t AS (SELECT doc_id, lang AS labeled_lang, string_split(text, ' ') ws FROM documents),
         |m AS (SELECT doc_id, labeled_lang,
         |$counts
         |  FROM t)
         |SELECT doc_id, labeled_lang,
         |  CASE $cases ELSE 'und' END AS pred_lang,
         |  ${TextQueries.langMarkers.map { case (l, _) => s"c_$l" }.mkString(", ")}
         |FROM m""".stripMargin
    },
    "q32_token_count" ->
      """SELECT doc_id,
        |  CAST(len(list_filter(string_split(text, ' '), w -> w <> '')) AS INT) AS ws_tokens,
        |  CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS INT) AS re_tokens
        |FROM documents""".stripMargin,
    "q33_fingerprint" ->
      """SELECT doc_id,
        |  list_reduce(
        |    list_prepend(CAST(0 AS BIGINT),
        |      list_transform(string_split(text, ''), c -> CAST(ascii(c) AS BIGINT))),
        |    (acc, x) -> (acc * 31 + x) % 1000000007) AS fp
        |FROM documents""".stripMargin,
    "q62_corpus_pipeline" ->
      """WITH keep AS (
        |  SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5(text)),
        |t AS (
        |  SELECT source,
        |    len(list_filter(string_split(text, ' '), w -> w <> '')) AS n_tokens
        |  FROM documents
        |  WHERE doc_id IN (SELECT doc_id FROM keep) AND lang = 'en'),
        |g AS (SELECT source, n_tokens FROM t WHERE n_tokens >= 10)
        |SELECT source, count(*) AS n_docs,
        |  CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
        |  CAST(sum(n_tokens) AS DOUBLE) / count(*) AS avg_tokens
        |FROM g GROUP BY source""".stripMargin,
    "q75_repetition" ->
      """WITH words AS (SELECT doc_id, string_split(text, ' ') ws FROM documents),
        |g AS (SELECT doc_id, list_transform(range(1, len(ws) - 1),
        |        i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]) grams
        |      FROM words WHERE len(ws) >= 3)
        |SELECT doc_id,
        |  CAST(len(grams) AS INT) AS n_grams,
        |  CAST(len(list_distinct(grams)) AS INT) AS n_distinct,
        |  1.0 - CAST(len(list_distinct(grams)) AS DOUBLE) / len(grams) AS rep_ratio
        |FROM g""".stripMargin,
    "q76_stratified_sample" ->
      """SELECT source, doc_id, CAST(rk AS INT) AS rk FROM (
        |  SELECT source, doc_id,
        |    row_number() OVER (
        |      PARTITION BY source
        |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
        |  FROM documents) WHERE rk <= 5""".stripMargin,
    "q77_length_histogram" ->
      """SELECT (n_chars // 100) * 100 AS bin_lo, count(*) AS n_docs,
        |  min(n_chars) AS min_chars, max(n_chars) AS max_chars
        |FROM documents GROUP BY 1""".stripMargin,
    "q78_ngram_counts" -> bigramOracle,
    "q92_ngram_generator" -> bigramOracle,
    "q83_pii_redact" ->
      """WITH raw AS (
        |  SELECT doc_id,
        |    text || ' contact user' || doc_id || '@' || source || '.com or +1-555-' ||
        |      lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || '-' ||
        |      lpad(CAST(doc_id % 100 AS VARCHAR), 2, '0') || ' ssn ' ||
        |      lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0') || '-' ||
        |      lpad(CAST(doc_id % 100 AS VARCHAR), 2, '0') || '-' ||
        |      lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS raw
        |  FROM documents),
        |scrub AS (
        |  SELECT doc_id, raw,
        |    regexp_replace(regexp_replace(regexp_replace(raw,
        |      '[a-z0-9._-]+@[a-z0-9.-]+\.[a-z]{2,}', '<EMAIL>', 'g'),
        |      '\+?1?-?555-[0-9]{4}-[0-9]{2}', '<PHONE>', 'g'),
        |      '[0-9]{3}-[0-9]{2}-[0-9]{4}', '<SSN>', 'g') AS clean
        |  FROM raw)
        |SELECT doc_id,
        |  CAST(length(raw) AS INT) AS raw_len,
        |  CAST(length(clean) AS INT) AS clean_len,
        |  CAST(len(regexp_extract_all(clean, '<EMAIL>|<PHONE>|<SSN>')) AS INT)
        |    AS n_redactions,
        |  md5(clean) AS clean_md5
        |FROM scrub""".stripMargin,
    "q84_decontaminate" ->
      """WITH words AS (
        |  SELECT doc_id, list_filter(string_split(text, ' '), w -> w <> '') ws
        |  FROM documents),
        |grams AS (
        |  SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(ws) - 2),
        |    i -> list_aggregate(ws[i:i+3], 'string_agg', ' ')))) AS gram
        |  FROM words WHERE len(ws) >= 4),
        |bench AS (SELECT DISTINCT gram FROM grams WHERE doc_id % 97 = 0)
        |SELECT g.doc_id, count(*) AS n_contaminated_grams,
        |  (g.doc_id % 97 = 0) AS is_benchmark
        |FROM grams g JOIN bench b USING (gram)
        |GROUP BY g.doc_id""".stripMargin,
    "q85_sequence_pack" ->
      """WITH toks AS (
        |  SELECT source, doc_id,
        |    CAST(len(list_filter(string_split(text, ' '), w -> w <> '')) AS BIGINT)
        |      AS n_tokens
        |  FROM documents),
        |off AS (
        |  SELECT source, doc_id, n_tokens,
        |    sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev
        |  FROM toks)
        |SELECT source, CAST(COALESCE(prev, 0) // 512 AS BIGINT) AS chunk_id,
        |  count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS sum_tokens,
        |  min(doc_id) AS first_doc, max(doc_id) AS last_doc
        |FROM off GROUP BY source, chunk_id""".stripMargin,
    "q90_source_mix" ->
      """WITH toks AS (
        |  SELECT source, doc_id, md5(CAST(doc_id AS VARCHAR)) AS h,
        |    CAST(len(list_filter(string_split(text, ' '), w -> w <> '')) AS BIGINT)
        |      AS n_tokens,
        |    CASE WHEN CAST(substring(source, -1, 1) AS INT) % 2 = 0
        |      THEN 1500 ELSE 500 END AS budget
        |  FROM documents),
        |off AS (
        |  SELECT source, n_tokens, budget,
        |    COALESCE(sum(n_tokens) OVER (PARTITION BY source ORDER BY h, doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prev
        |  FROM toks)
        |SELECT source, count(*) AS n_docs,
        |  CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
        |  CAST(max(budget) AS BIGINT) AS budget
        |FROM off WHERE prev < budget GROUP BY source""".stripMargin,
    // DuckDB list slice ws[a:b] is 1-based inclusive (= Spark
    // slice(ws, a, 64) for b = a+63); range(_,_,48) is end-exclusive
    // like Spark's stepped sequence over ints
    "q102_chunking" ->
      """WITH t AS (
        |  SELECT doc_id, list_filter(string_split(text, ' '), w -> w <> '') ws
        |  FROM documents),
        |n AS (SELECT doc_id, ws, len(ws) AS n FROM t WHERE len(ws) >= 1),
        |st AS (
        |  SELECT doc_id, ws, n,
        |    unnest(list_filter(range(1, n + 1, 48),
        |      st -> st = 1 OR st <= n - 16)) AS start
        |  FROM n)
        |SELECT doc_id,
        |  CAST((start - 1) // 48 AS INT) AS chunk_id,
        |  CAST(start AS INT) AS start,
        |  CAST(len(ws[start:start+63]) AS INT) AS chunk_tokens,
        |  md5(array_to_string(ws[start:start+63], ' ')) AS chunk_md5
        |FROM st""".stripMargin,
    "q103_tfidf" ->
      """WITH terms AS (
        |  SELECT doc_id, unnest(list_filter(string_split(text, ' '), w -> w <> '')) AS term
        |  FROM documents),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM terms GROUP BY doc_id, term),
        |df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
        |scored AS (
        |  SELECT tf.doc_id, tf.term, tf.tf, df.df,
        |    tf.tf * ((1000000 * (SELECT count(*) FROM documents)) // df.df) AS score
        |  FROM tf JOIN df USING (term)),
        |ranked AS (
        |  SELECT *, row_number() OVER (
        |    PARTITION BY doc_id ORDER BY score DESC, term ASC) AS rk
        |  FROM scored)
        |SELECT doc_id, CAST(rk AS INT) AS rk, term, tf, df, score
        |FROM ranked WHERE rk <= 3""".stripMargin)
}
