package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for large-scale training-data pipelines:
  * tokenization, k-gram shingling, minhash signatures, LSH band keys,
  * simhash, language-ID, quality metrics, fingerprints.
  *
  * Everything is a pure per-row `Column` expression (higher-order array
  * functions) — NO shuffle is needed to compute any signature, so these
  * scale linearly with input and parallelize embarrassingly at 100 TB.
  * The portable-hash choice (md5 over seed-prefixed items) is deliberate:
  * it is reproducible in any engine (the DuckDB oracle recomputes it
  * exactly), unlike engine-private hashes such as xxhash64.
  */
object TextOps {

  /** Let-binding for column expressions: evaluates `value` ONCE per row
    * and passes the bound result to `body` as a lambda variable.
    *
    * Spark has no let in its expression language, so a subtree referenced
    * N times in one projection is evaluated N times — catastrophic when
    * the reference sits inside a higher-order-function lambda (an
    * unbound `split` inside a per-shingle lambda re-tokenizes the
    * document once per shingle). Wrapping the value in a 1-element array
    * and binding it through transform's lambda variable is the standard
    * encoding; the optimizer cannot inline through a lambda binding.
    */
  def let(value: Column)(body: Column => Column): Column =
    element_at(transform(array(value), body), 1)

  /** Single-space tokenization, lowercased. DELIBERATE CONTRACT, not
    * general whitespace handling: every signature (minhash, simhash,
    * fingerprint), metric, and the DuckDB oracle recompute exactly
    * `split(lower(text), ' ')`, and the native expressions
    * ([[graft.functions.MinHashSig]]) rely on shingles being contiguous
    * substrings of the single-space-joined text. Corpus text is
    * expected to be whitespace-normalized first (see the q_normalize
    * canonical-form pass) — tabs/newlines inside a "token" and empty
    * tokens from runs of spaces are passed through verbatim on both
    * engines, by design.
    */
  def tokens(c: Column): Column = split(lower(c), " ")

  def distinctTokens(c: Column): Column = array_distinct(tokens(c))

  /** k-gram shingles over the token stream (near-dup canonical form).
    * Docs shorter than k tokens collapse to one whole-doc shingle.
    * The token array is let-bound: one tokenize per row, not one per
    * shingle.
    */
  def shingles(c: Column, k: Int = 3): Column =
    let(tokens(c)) { t =>
      when(size(t) >= k,
        transform(sequence(lit(1), size(t) - (k - 1)),
          i => array_join(slice(t, i, lit(k)), " ")))
        .otherwise(array(array_join(t, " ")))
    }

  def distinctShingles(c: Column, k: Int = 3): Column =
    array_distinct(shingles(c, k))

  /** Universal-hash family for minhash: h_s(x) = (A(s)*v(x) + B(s)) mod
    * MersennePrime, over a 31-bit value v(x) derived from ONE md5 of the
    * item. One digest per item (not one per item per seed), 16x fewer
    * md5 calls than hashing per-seed — and every step (md5, hex-prefix
    * to int, modular arithmetic) is reproducible in any engine, so the
    * DuckDB oracle recomputes signatures exactly.
    */
  val MersennePrime = 2147483647L // 2^31 - 1
  val MaxHashes = 64
  val (hashA, hashB): (Seq[Long], Seq[Long]) = {
    val rnd = new scala.util.Random(42)
    (Seq.fill(MaxHashes)(1L + rnd.nextInt(Int.MaxValue - 1).toLong),
      Seq.fill(MaxHashes)(rnd.nextInt(Int.MaxValue).toLong))
  }

  /** 31-bit integer hash of a string item: top 60 bits of md5, masked. */
  def hash31(item: Column): Column =
    conv(substring(md5(item), 1, 15), 16, 10).cast("long")
      .bitwiseAND(MersennePrime)

  /** MinHash signature: element s is min over items of
    * (A(s) * hash31(item) + B(s)) mod MersennePrime. The per-item hashes
    * are let-bound so each item is digested once, then each of the
    * numHashes seeds applies only cheap modular arithmetic.
    */
  def minhashSignature(items: Column, numHashes: Int = 16): Column = {
    require(numHashes <= MaxHashes)
    val a = lit(hashA.take(numHashes).toArray)
    val b = lit(hashB.take(numHashes).toArray)
    let(transform(items, x => hash31(x))) { vs =>
      transform(sequence(lit(0), lit(numHashes - 1)),
        s => array_min(transform(vs,
          v => (element_at(a, s + 1) * v + element_at(b, s + 1))
            % MersennePrime)))
    }
  }

  /** LSH band keys: band i is md5(i + "|" + csv of its r signature
    * rows). Docs sharing ANY band key are near-dup candidates. The band
    * index is baked into the key so a single equi-join on the key
    * suffices. A band whose slice would run past the signature yields a
    * NULL key (dropped by any equi-join) — without the guard, every
    * document would share the identical md5-of-empty key for that band
    * and the candidate join would degenerate to the full N x N cross
    * product.
    */
  def lshBands(sig: Column, bands: Int = 4, rowsPerBand: Int = 4): Column =
    transform(sequence(lit(0), lit(bands - 1)),
      i => when(size(sig) >= (i + lit(1)) * rowsPerBand,
        md5(concat(i.cast("string"), lit("|"),
          array_join(transform(
            slice(sig, i * rowsPerBand + 1, lit(rowsPerBand)),
            _.cast("string")), ",")))))

  /** 16-bit SimHash over the (frequency-weighted) token stream: bit i is
    * the sign of sum over tokens of ±1, where +1 iff the i-th hex nibble
    * of md5(token) has its high bit set. Returned as a '0'/'1' string so
    * any engine can reproduce it.
    */
  def simhash16(c: Column): Column =
    let(transform(tokens(c), tok => md5(tok))) { hs =>
      array_join(
        transform(sequence(lit(0), lit(15)), i => {
          val votes = aggregate(hs, lit(0), (acc, h) => {
            val nibble = instr(lit("0123456789abcdef"), h.substr(i + 1, lit(1)))
            acc + when(nibble >= 9, 1).otherwise(-1)
          })
          when(votes > 0, lit("1")).otherwise(lit("0"))
        }), "")
    }

  /** Canonical-form document fingerprint: md5 of the sorted distinct
    * token set — equal iff two docs are bag-of-words identical.
    */
  def fingerprint(c: Column): Column =
    md5(array_join(array_sort(distinctTokens(c)), " "))

  /** Marker-stopword sets for the n-gram/stopword language heuristic. */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "a", "in", "is"),
    "es" -> Seq("el", "la", "de", "que", "y", "los", "un"),
    "de" -> Seq("der", "die", "und", "das", "ist", "ein"),
    "fr" -> Seq("le", "la", "et", "les", "des", "un", "est"))

  /** Count of marker hits for one language over the distinct token set. */
  def langScore(c: Column, lang: String): Column = {
    val markers = langMarkers.toMap.apply(lang)
    size(filter(distinctTokens(c), t => t.isin(markers.map(x => x: Any): _*)))
  }

  /** Language-ID heuristic: argmax marker count, fixed priority order on
    * ties, "und" (undetermined) when nothing matches. The per-language
    * scores are let-bound (computed once each), since the argmax CASE
    * references every score several times.
    */
  def langId(c: Column): Column =
    let(distinctTokens(c)) { dt =>
      val rawScores = langMarkers.map { case (_, markers) =>
        size(filter(dt, t => t.isin(markers.map(x => x: Any): _*)))
      }
      let(array(rawScores: _*)) { ss =>
        val scores = langMarkers.zipWithIndex.map { case ((l, _), i) =>
          l -> element_at(ss, i + 1)
        }
        val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
        scores.foldRight(lit("und"): Column) { case ((l, s), acc) =>
          when(s > 0 && s === best, lit(l)).otherwise(acc)
        }
      }
    }

  /** Quality metrics: alpha ratio, stopword ratio, mean token length —
    * the length/punct/stopword heuristics of LLM-corpus filtering.
    */
  def alphaRatio(c: Column): Column =
    // empty text is 0.0 by definition, not 0/0: a NaN here slips past
    // every `< threshold` quality gate (NaN comparisons are false), so
    // the emptiest possible document would escape the alpha filter
    when(length(c) === 0, lit(0.0)).otherwise(
      length(regexp_replace(lower(c), "[^a-z]", "")).cast("double") /
        length(c).cast("double"))

  def stopwordRatio(c: Column): Column = {
    val stops = langMarkers.toMap.apply("en")
    let(tokens(c)) { t =>
      size(filter(t, x => x.isin(stops.map(s => s: Any): _*)))
        .cast("double") / size(t).cast("double")
    }
  }

  def meanTokenLen(c: Column): Column =
    length(regexp_replace(c, " ", "")).cast("double") /
      size(tokens(c)).cast("double")

  /** BPE-ish subword count: alpha runs, digit runs, single other chars. */
  def bpeTokenCount(c: Column): Column =
    size(regexp_extract_all(lower(c), lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"),
      lit(0))).cast("long")
}
