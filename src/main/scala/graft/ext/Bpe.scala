package graft.ext

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer TRAINING primitives (Sennrich et al. 2016,
  * arXiv:1508.07909) — the vocabulary-induction pass a training-data
  * pipeline runs before tokenizing a corpus.
  *
  * Scale shape — the part that matters at 100 TB: the corpus is touched by
  * exactly ONE aggregation (the word-frequency table; map-side combinable,
  * output vocab-sized, i.e. sublinear in the corpus by Heaps' law). Every
  * merge round after that operates on the frequency-weighted word TYPES —
  * corpus-size-independent work, one vocab-sized shuffle per round, and
  * only the single argmax row crosses to the driver each round.
  */
object Bpe {

  /** Adjacent character-pair counts over the frequency-weighted vocabulary —
    * round 1's BPE candidate table. A pair of adjacent single chars IS a
    * 2-char substring, so the pair key is `substr(w, i, 2)` — engine-
    * portable with no struct plumbing. */
  def pairCounts(docs: DataFrame, textCol: String): DataFrame = {
    val vocab = docs.select(explode(split(col(textCol), " ")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("freq"))
    vocab
      .filter(length(col("w")) >= 2)
      .select(col("freq"),
        explode(transform(sequence(lit(1), length(col("w")) - 1),
          i => col("w").substr(i, lit(2)))).as("pair"))
      .groupBy("pair").agg(sum(col("freq")).as("n"))
  }

  /** One merge of symbol sequence `syms`: fuse every non-overlapping
    * adjacent (a, b) occurrence left-to-right — the reference merge rule. */
  def mergeOnce(syms: Seq[String], a: String, b: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
        out += (a + b); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.toSeq
  }

  /** Train `nMerges` BPE merges. Per round: a vocab-sized pair-count agg,
    * a deterministic argmax (max count, lexicographically smallest (a, b)
    * tiebreak), and a distributed re-symbolization of the vocab — the
    * symbol table never leaves the executors; `localCheckpoint` cuts the
    * per-round lineage so round r doesn't replay rounds 1..r−1. Stops
    * early when no pair repeats. */
  def train(docs: DataFrame, textCol: String, nMerges: Int): Seq[(String, String)] = {
    val spark = docs.sparkSession
    import spark.implicits._
    var vocab: Dataset[(Seq[String], Long)] = docs
      .select(explode(split(col(textCol), " ")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("freq"))
      .as[(String, Long)]
      .map { case (w, f) => (w.map(_.toString): Seq[String], f) }
      .localCheckpoint()
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var done = false
    while (merges.length < nMerges && !done) {
      val best = vocab.flatMap { case (syms, f) =>
          syms.iterator.zip(syms.iterator.drop(1)).map(p => (p._1, p._2, f))
        }
        .toDF("a", "b", "f")
        .groupBy("a", "b").agg(sum(col("f")).as("n"))
        .filter(col("n") >= 2)
        .orderBy(col("n").desc, col("a"), col("b"))
        .limit(1)
        .collect()
      if (best.isEmpty) done = true
      else {
        val (a, b) = (best(0).getString(0), best(0).getString(1))
        merges += ((a, b))
        // superseded checkpoints become unreachable here; ContextCleaner
        // unpersists them on GC (Dataset.unpersist can't — localCheckpoint
        // blocks aren't CacheManager entries; same policy as the
        // dedupClusters loop)
        vocab = vocab.map { case (syms, f) => (mergeOnce(syms, a, b), f) }
          .localCheckpoint()
      }
    }
    merges.toSeq
  }

  /** Apply a trained merge list to one word — the (driver-side) reference
    * tokenizer used by specs and the per-word kernel of [[tokenizeBulkBig]]. */
  def tokenizeWord(word: String, merges: Seq[(String, String)]): Seq[String] =
    merges.foldLeft(word.map(_.toString): Seq[String]) {
      case (syms, (a, b)) => mergeOnce(syms, a, b)
    }

  /** Bpe.train(sf0.001 documents, 8) output, frozen as the demo vocabulary
    * the x_bpe_tokens gate applies (a tokenizer vocab IS a static artifact —
    * real pipelines apply a frozen merge table, they don't retrain per
    * query). Includes a multi-char right side ("p"+"ar") so the gate
    * exercises post-merge symbols. */
  val DemoMerges: Seq[(String, String)] = Seq(
    ("e", "r"), ("o", "r"), ("i", "n"), ("o", "w"),
    ("s", "t"), ("l", "u"), ("a", "r"), ("p", "ar"))

  /** One BPE merge pass over a symbol array, as a pure Catalyst fold
    * (`aggregate` HOF — whole-stage-codegen'd, no UDF). Left-to-right
    * non-overlapping fusing via "fuse with the accumulator's last symbol":
    * equivalent to [[mergeOnce]] because a fused token (a+b) is strictly
    * longer than `a`, so it can never itself match the pair's left side
    * within the same pass. CASE branches evaluate lazily, so element_at on
    * the empty accumulator is never reached. */
  private def mergePass(syms: Column, a: String, b: String): Column =
    aggregate(
      syms,
      array().cast("array<string>"),
      (acc, x) =>
        when(size(acc) === 0, array(x))
          .when(element_at(acc, -1) === lit(a) && x === lit(b),
            concat(slice(acc, lit(1), size(acc) - 1), array(lit(a + b))))
          .otherwise(concat(acc, array(x))))

  /** BPE tokens of one word under a FIXED merge list, as a column
    * expression: chars (empty-word-safe), then one [[mergePass]] per merge
    * in training order (Sennrich's sequential application). The merge list
    * is inlined into the expression tree — right for demo/gate-sized
    * vocabularies; a 50k-merge production vocab goes through
    * [[tokenizeBulkBig]] instead. */
  def tokensOf(word: Column, merges: Seq[(String, String)]): Column = {
    val chars = filter(split(word, ""), c => c =!= lit(""))
    merges.foldLeft(chars) { case (syms, (a, b)) => mergePass(syms, a, b) }
  }

  /** Bulk corpus tokenization, codegen path: (doc_id, tokens) with the
    * per-word folds fused into one whole-stage-codegen'd projection — one
    * corpus scan, zero shuffles, trivially partition-parallel. */
  def tokenizeBulk(docs: DataFrame, idCol: String, textCol: String,
                   merges: Seq[(String, String)]): DataFrame =
    docs.select(col(idCol).cast("long").as("doc_id"),
      flatten(transform(split(col(textCol), " "),
        w => tokensOf(w, merges))).as("tokens"))

  /** Bulk corpus tokenization, native-expression path: one compiled-kernel
    * call per row ([[graft.functions.BpeEncode]]) with per-task word
    * memoization — the fast form of [[tokenizeBulk]] (token-stream-equal,
    * BpeSpec-asserted), one corpus scan, zero shuffles, whole-stage
    * codegen. */
  def tokenizeBulkNative(docs: DataFrame, idCol: String, textCol: String,
                         merges: Seq[(String, String)]): DataFrame =
    docs.select(col(idCol).cast("long").as("doc_id"),
      graft.functions.GraftExpressions.bpe_encode(col(textCol), merges).as("tokens"))

  /** Bulk corpus tokenization, big-vocab path: the merge table rides an
    * executor BROADCAST (one copy per JVM, not per task) and each partition
    * memoizes word→tokens — by Heaps' law the distinct-word set per
    * partition is far smaller than its token count, so most words are a
    * hash lookup, not a fold. Same semantics as [[tokenizeBulk]]
    * (spec-asserted equal); use when the merge list is too large to inline
    * as an expression tree. */
  def tokenizeBulkBig(docs: DataFrame, idCol: String, textCol: String,
                      merges: Seq[(String, String)]): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(merges)
    docs.select(col(idCol).cast("long"), col(textCol).cast("string"))
      .as[(Long, String)]
      .mapPartitions { it =>
        val cache = scala.collection.mutable.HashMap.empty[String, Seq[String]]
        it.map { case (id, text) =>
          val toks = text.split(" ", -1).iterator.filter(_.nonEmpty)
            .flatMap(w => cache.getOrElseUpdate(w, tokenizeWord(w, bc.value)))
            .toSeq
          (id, toks)
        }
      }.toDF("doc_id", "tokens")
  }
}
