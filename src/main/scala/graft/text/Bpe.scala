package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** T25: the full BPE tokenizer-training loop — the operator a
  * training-data pipeline actually runs to produce its merge table
  * (t24 is its first step).
  *
  * Algorithm (Sennrich-style char-pair encoding over the
  * FREQUENCY-WEIGHTED VOCABULARY): each vocab word is a symbol
  * sequence (initially characters); each round counts adjacent symbol
  * pairs weighted by word frequency, picks the most frequent pair
  * (deterministic tie-break: count desc, then (a, b) ascending by
  * UTF-8 bytes — the collation Spark and DuckDB share), and merges
  * every greedy left-to-right occurrence.
  *
  * Scale shape — what real trainers (SentencePiece, HF tokenizers) do
  * at corpus scale: the token stream is scanned ONCE, distributed
  * (the t24 rollup — the only corpus-size-dependent stage); the merge
  * rounds then run over the Zipf-bounded vocabulary, which is
  * collected under an explicit cap (`vocabCap`, default 65536 words ×
  * ~16 bytes ≈ 1 MB — the bounded-collect pattern, same class as the
  * Ann centroid seeds; the cap is the top-frequency cut every
  * production BPE trainer applies, deterministic by (wf desc, w)).
  * Driving 20 sequential argmax rounds through per-round Spark jobs
  * would buy nothing but 40× the scheduler dispatch floor — the
  * corpus never participates after the rollup, so rounds are
  * corpus-size-independent and near-flat at 10×/100×.
  *
  * Greedy merge: scanning symbols left-to-right, merge when the
  * current symbol is `a` and the next is `b`, then skip both. The
  * Column-fold form [[mergeFold]] is the same recurrence as a Spark
  * higher-order function (kept first-class for in-plan rewrites, e.g.
  * applying a TRAINED merge table to the token stream); BpeSpec pins
  * kernel ≡ fold on overlap chains and random words.
  */
object Bpe {

  /** Greedy left-to-right merge of pair (a, b) over a symbol array,
    * as a Column fold (no UDF): merge when the accumulator's last
    * element is `a` and the current symbol is `b` — after a merge the
    * last element becomes a||b, which can never re-match `a` (that
    * would need b = ""), so a consumed symbol is never reused; runs
    * like "aaa" under merge (a,a) fold to [aa, a]. */
  def mergeFold(syms: Column, a: String, b: String): Column = {
    val aL = lit(a)
    val bL = lit(b)
    aggregate(syms, array().cast("array<string>"),
      (acc, s) =>
        when(size(acc) > 0 && element_at(acc, -1) === aL && s === bL,
          concat(slice(acc, lit(1), size(acc) - 1),
            array(concat(element_at(acc, -1), s))))
        .otherwise(concat(acc, array(s))))
  }

  /** Greedy left-to-right merge, kernel form (BpeSpec pins ≡ fold). */
  def mergeGreedy(syms: Array[String], a: String, b: String): Array[String] = {
    val out = Array.newBuilder[String]
    val n = syms.length
    var i = 0
    while (i < n) {
      if (i < n - 1 && syms(i) == a && syms(i + 1) == b) {
        out += a + b
        i += 2
      } else {
        out += syms(i)
        i += 1
      }
    }
    out.result()
  }

  /** UTF-8-byte lexicographic comparison — the collation BOTH engines
    * sort strings by (Spark's UTF8String and DuckDB compare UTF-8
    * bytes; Java's String.compareTo compares UTF-16 units, which
    * disagrees for supplementary characters). */
  private def utf8Less(x: String, y: String): Boolean = {
    val a = x.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val b = y.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val n = math.min(a.length, b.length)
    var i = 0
    while (i < n) {
      val d = (a(i) & 0xFF) - (b(i) & 0xFF)
      if (d != 0) return d < 0
      i += 1
    }
    a.length < b.length
  }

  /** Train `rounds` BPE merges; returns the merge list
    * (rank, a, b, weighted count) — the kernel behind [[bpeTrain]],
    * exposed so [[bpeTokenCounts]] can apply the same merges. */
  def trainMerges(docs: DataFrame, rounds: Int = 20,
      vocabCap: Int = 65536): Seq[(Int, String, String, Long)] = {
    val spark = docs.sparkSession
    import spark.implicits._
    // THE distributed stage: one corpus scan → frequency-weighted
    // vocab, capped deterministically (cap rarely binds below ~65k
    // distinct words; when it does, both engines cut by (wf desc, w))
    val vocab: Array[(String, Long)] = docs
      .select(explode(TextAnalysis.words(col("text"))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("wf"))
      .orderBy(col("wf").desc, col("w")).limit(vocabCap)
      .as[(String, Long)].collect()
    // initial symbolization splits by CODE POINT (what substring(w,i,1)
    // means in both engines), never by UTF-16 unit
    var words: Array[(Array[String], Long)] =
      vocab.map { case (w, f) =>
        (w.codePoints().toArray.map(cp => new String(Character.toChars(cp))), f)
      }
    val merges = Seq.newBuilder[(Int, String, String, Long)]
    var r = 1
    var exhausted = false
    while (r <= rounds && !exhausted) {
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      words.foreach { case (syms, f) =>
        var i = 0
        while (i < syms.length - 1) {
          val k = (syms(i), syms(i + 1))
          counts.update(k, counts.getOrElse(k, 0L) + f)
          i += 1
        }
      }
      if (counts.isEmpty) exhausted = true
      else {
        var best: ((String, String), Long) = null
        counts.foreach { case (p, n) =>
          if (best == null || n > best._2 ||
            (n == best._2 && (utf8Less(p._1, best._1._1) ||
              (p._1 == best._1._1 && utf8Less(p._2, best._1._2)))))
            best = (p, n)
        }
        val ((a, b), n) = best
        merges += ((r, a, b, n))
        words = words.map { case (syms, f) =>
          // cheap guard: most words never contain the winning pair
          var hit = false
          var i = 0
          while (!hit && i < syms.length - 1) {
            hit = syms(i) == a && syms(i + 1) == b
            i += 1
          }
          if (hit) (mergeGreedy(syms, a, b), f) else (syms, f)
        }
        r += 1
      }
    }
    merges.result()
  }

  /** Train `rounds` BPE merges over the space-split vocabulary of
    * `docs.text`. Returns the merge table:
    * (merge_rank INT, a, b STRING, n BIGINT). */
  def bpeTrain(docs: DataFrame, rounds: Int = 20,
      vocabCap: Int = 65536): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    trainMerges(docs, rounds, vocabCap)
      .toDF("merge_rank", "a", "b", "n")
      .orderBy("merge_rank")
  }

  /** T26: APPLY the trained tokenizer — the step a training pipeline
    * runs over every document once the merge table exists (and the
    * input c2/c3 packing and t23 fertility actually consume). Trains
    * [[trainMerges]] on the corpus, then tokenizes each DISTINCT word
    * once (merges applied in rank order — a word's tokenization is
    * corpus-position-independent, so the |vocab|-row token-length
    * table is the whole tokenizer state) and joins it back onto the
    * word stream. Per doc: word count, BPE token count, exact
    * chars-per-token milli ratio (the compression the tokenizer buys).
    *
    * Scale: tokenizing distinct words is |vocab|-bounded map work with
    * the 20-pair merge list broadcast; the corpus pays ONE exploded
    * scan (checkpointed — it feeds both the distinct-word set and the
    * per-doc rollup, standing in for the materialized token table a
    * production pipeline persists as its output anyway) + one join on
    * the word key + one per-doc aggregation, after the training
    * rollup. */
  def bpeTokenCounts(docs: DataFrame, rounds: Int = 20,
      vocabCap: Int = 65536): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val merges = trainMerges(docs, rounds, vocabCap)
      .map { case (_, a, b, _) => (a, b) }
    val mergesB = spark.sparkContext.broadcast(merges)
    val occurrences = docs.select(col("doc_id"), col("n_chars"),
        explode(TextAnalysis.words(col("text"))).as("w"))
      .filter(length(col("w")) >= 1)
      .localCheckpoint(true)
    val tokLen = occurrences.select(col("w")).distinct()
      .as[String].map { w =>
        var syms = w.codePoints().toArray
          .map(cp => new String(Character.toChars(cp)))
        mergesB.value.foreach { case (a, b) => syms = mergeGreedy(syms, a, b) }
        (w, syms.length.toLong)
      }.toDF("w", "n_tok")
    occurrences.join(tokLen, "w")
      .groupBy(col("doc_id"))
      .agg(max(col("n_chars")).as("nc"),
        count(lit(1)).as("n_words"), sum(col("n_tok")).as("n_tokens"))
      .select(col("doc_id"), col("n_words"), col("n_tokens"),
        expr("(nc * 1000) div nullif(n_tokens, 0)").as("chars_per_tok_milli"))
      .orderBy("doc_id")
  }

  /** Oracle SQL for [[bpeTrain]]: the identical recurrence unrolled
    * into per-round CTEs (the g9/e42 recipe; r-tables MATERIALIZED —
    * each is referenced twice, and inlining would re-expand round 1
    * exponentially). The greedy left-to-right merge is replayed
    * RELATIONALLY — candidates are (sym, next) pairs equal to the
    * round's winner; consecutive candidates (only possible when
    * a = b) form gaps-and-islands chains where greedy takes the
    * odd-indexed members; consumed rows drop via lag() — a
    * structurally different formulation from the Spark kernel/fold,
    * so the hash match is evidence of the algorithm, not shared
    * code. */
  def bpeTrainSql(rounds: Int = 20, vocabCap: Int = 65536): String = {
    val unionAll = (1 to rounds)
      .map(k => s"SELECT $k AS merge_rank, a, b, n FROM b$k")
      .mkString("\nUNION ALL ")
    s"""WITH ${trainCtes(rounds, vocabCap)}
       |SELECT CAST(merge_rank AS INT) AS merge_rank, a, b, n FROM (
       |$unionAll)
       |ORDER BY merge_rank""".stripMargin
  }

  /** The shared WITH-body of the BPE oracles: capped vocab, r1, and
    * `rounds` unrolled train rounds — b1..b`rounds` carry the merge
    * table, r`rounds`+1 the final training-vocab symbolization. */
  def trainCtes(rounds: Int = 20, vocabCap: Int = 65536): String = {
    val roundCtes = (1 to rounds).map { k =>
      s"""c$k AS (SELECT a, b, CAST(sum(wf) AS BIGINT) AS n FROM (
         |    SELECT sym AS a, lead(sym) OVER (PARTITION BY w ORDER BY pos) AS b, wf
         |    FROM r$k) WHERE b IS NOT NULL GROUP BY a, b),
         |b$k AS (SELECT a, b, n FROM c$k ORDER BY n DESC, a, b LIMIT 1),
         |x$k AS (SELECT m.w, m.wf, m.pos, m.sym, m.nxt,
         |    (m.sym = b.a AND m.nxt = b.b) AS cand
         |  FROM (SELECT w, wf, pos, sym,
         |      lead(sym) OVER (PARTITION BY w ORDER BY pos) AS nxt FROM r$k) m, b$k b),
         |i$k AS (SELECT *, CASE WHEN cand THEN
         |    pos - row_number() OVER (PARTITION BY w, cand ORDER BY pos) END AS isl
         |  FROM x$k),
         |s$k AS (SELECT *, cand AND
         |    (row_number() OVER (PARTITION BY w, isl ORDER BY pos) % 2 = 1) AS mg
         |  FROM i$k),
         |r${k + 1} AS MATERIALIZED (SELECT w, wf,
         |    CAST(row_number() OVER (PARTITION BY w ORDER BY pos) AS INT) AS pos,
         |    CASE WHEN mg THEN sym || nxt ELSE sym END AS sym
         |  FROM (SELECT *, lag(mg) OVER (PARTITION BY w ORDER BY pos) AS pm FROM s$k)
         |  WHERE pm IS DISTINCT FROM TRUE)""".stripMargin
    }.mkString(",\n")
    s"""vocab AS MATERIALIZED (SELECT w, wf FROM (
       |    SELECT w, count(*) AS wf FROM (
       |      SELECT unnest(string_split(text, ' ')) AS w FROM documents)
       |    GROUP BY w)
       |  ORDER BY wf DESC, w LIMIT $vocabCap),
       |r1 AS MATERIALIZED (SELECT w, wf, CAST(u.i AS INT) AS pos,
       |    substring(w, CAST(u.i AS INT), 1) AS sym
       |  FROM vocab, unnest(range(1, len(w) + 1)) AS u(i)),
       |$roundCtes""".stripMargin
  }

  /** Oracle SQL for [[bpeTokenCounts]]: the train CTEs (b1..b`rounds`
    * carry the learned merges), then an APPLY track that replays the
    * rewrite machinery — same gaps-and-islands greedy, but each round
    * k merges by the TRAINED pair b$k instead of recounting — over
    * every distinct word, and a final per-document aggregation over
    * the word-occurrence stream. */
  def tokenizeSql(rounds: Int = 20, vocabCap: Int = 65536): String = {
    // LEFT JOIN ON TRUE, not a comma cross join: when training
    // exhausts before `rounds` (b$k empty — BpeSpec's tiny corpus does
    // this at round 4), a cross join would EMPTY the apply track and
    // every word would vanish from the tokenization; the left join
    // keeps the rows with cand=false, i.e. the identity rewrite —
    // exactly Spark's "stop merging"
    val applyCtes = (1 to rounds).map { k =>
      s"""xa$k AS (SELECT m.w, m.pos, m.sym, m.nxt,
         |    coalesce(m.sym = b.a AND m.nxt = b.b, FALSE) AS cand
         |  FROM (SELECT w, pos, sym,
         |      lead(sym) OVER (PARTITION BY w ORDER BY pos) AS nxt FROM ra$k) m
         |    LEFT JOIN b$k b ON TRUE),
         |ia$k AS (SELECT *, CASE WHEN cand THEN
         |    pos - row_number() OVER (PARTITION BY w, cand ORDER BY pos) END AS isl
         |  FROM xa$k),
         |sa$k AS (SELECT *, cand AND
         |    (row_number() OVER (PARTITION BY w, isl ORDER BY pos) % 2 = 1) AS mg
         |  FROM ia$k),
         |ra${k + 1} AS MATERIALIZED (SELECT w,
         |    CAST(row_number() OVER (PARTITION BY w ORDER BY pos) AS INT) AS pos,
         |    CASE WHEN mg THEN sym || nxt ELSE sym END AS sym
         |  FROM (SELECT *, lag(mg) OVER (PARTITION BY w ORDER BY pos) AS pm FROM sa$k)
         |  WHERE pm IS DISTINCT FROM TRUE)""".stripMargin
    }.mkString(",\n")
    s"""WITH ${trainCtes(rounds, vocabCap)},
       |aw AS MATERIALIZED (SELECT DISTINCT w FROM (
       |    SELECT unnest(string_split(text, ' ')) AS w FROM documents)
       |  WHERE len(w) >= 1),
       |ra1 AS MATERIALIZED (SELECT w, CAST(u.i AS INT) AS pos,
       |    substring(w, CAST(u.i AS INT), 1) AS sym
       |  FROM aw, unnest(range(1, len(w) + 1)) AS u(i)),
       |$applyCtes,
       |tok AS (SELECT w, CAST(count(*) AS BIGINT) AS n_tok
       |  FROM ra${rounds + 1} GROUP BY w),
       |occ AS (SELECT doc_id, n_chars, w FROM (
       |    SELECT doc_id, n_chars, unnest(string_split(text, ' ')) AS w
       |    FROM documents) WHERE len(w) >= 1)
       |SELECT occ.doc_id, count(*) AS n_words,
       |  CAST(sum(tok.n_tok) AS BIGINT) AS n_tokens,
       |  (max(occ.n_chars) * 1000) // nullif(CAST(sum(tok.n_tok) AS BIGINT), 0)
       |    AS chars_per_tok_milli
       |FROM occ JOIN tok ON tok.w = occ.w
       |GROUP BY occ.doc_id ORDER BY occ.doc_id""".stripMargin
  }
}
