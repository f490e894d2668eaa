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

  /** Whitespace tokenization, lowercased. */
  def tokens(c: Column): Column = split(lower(c), " ")

  def distinctTokens(c: Column): Column = array_distinct(tokens(c))

  /** k-gram shingles over the token stream (near-dup canonical form).
    * Docs shorter than k tokens collapse to one whole-doc shingle.
    */
  def shingles(c: Column, k: Int = 3): Column = {
    val t = tokens(c)
    when(size(t) >= k,
      transform(sequence(lit(1), size(t) - (k - 1)),
        i => array_join(slice(t, i, lit(k)), " ")))
      .otherwise(array(array_join(t, " ")))
  }

  def distinctShingles(c: Column, k: Int = 3): Column =
    array_distinct(shingles(c, k))

  /** MinHash signature: element s is min over items of md5("s:" + item).
    * One array expression per row — no shuffle, no UDF; min of md5 hex
    * strings is a valid uniform min-hash (lexicographic order on a
    * uniformly distributed hex digest).
    */
  def minhashSignature(items: Column, numHashes: Int = 16): Column =
    transform(sequence(lit(0), lit(numHashes - 1)),
      s => array_min(transform(items,
        t => md5(concat(s.cast("string"), lit(":"), t)))))

  /** LSH band keys: band i is md5(i + "|" + concat of its r signature
    * rows). Docs sharing ANY band key are near-dup candidates. The band
    * index is baked into the key so a single equi-join on the key suffices.
    */
  def lshBands(sig: Column, bands: Int = 4, rowsPerBand: Int = 4): Column =
    transform(sequence(lit(0), lit(bands - 1)),
      i => md5(concat(i.cast("string"), lit("|"),
        array_join(slice(sig, i * rowsPerBand + 1, lit(rowsPerBand)), ""))))

  /** 16-bit SimHash over the (frequency-weighted) token stream: bit i is
    * the sign of sum over tokens of ±1, where +1 iff the i-th hex nibble
    * of md5(token) has its high bit set. Returned as a '0'/'1' string so
    * any engine can reproduce it.
    */
  def simhash16(c: Column): Column = {
    val t = tokens(c)
    array_join(
      transform(sequence(lit(0), lit(15)), i => {
        val votes = aggregate(t, lit(0), (acc, tok) => {
          val nibble = instr(lit("0123456789abcdef"),
            md5(tok).substr(i + 1, lit(1)))
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
    * ties, "und" (undetermined) when nothing matches.
    */
  def langId(c: Column): Column = {
    val scores = langMarkers.map { case (l, _) => l -> langScore(c, l) }
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    scores.foldRight(lit("und"): Column) { case ((l, s), acc) =>
      when(s > 0 && s === best, lit(l)).otherwise(acc)
    }
  }

  /** Quality metrics: alpha ratio, stopword ratio, mean token length —
    * the length/punct/stopword heuristics of LLM-corpus filtering.
    */
  def alphaRatio(c: Column): Column =
    length(regexp_replace(lower(c), "[^a-z]", "")).cast("double") /
      length(c).cast("double")

  def stopwordRatio(c: Column): Column = {
    val stops = langMarkers.toMap.apply("en")
    size(filter(tokens(c), t => t.isin(stops.map(x => x: Any): _*)))
      .cast("double") / size(tokens(c)).cast("double")
  }

  def meanTokenLen(c: Column): Column =
    length(regexp_replace(c, " ", "")).cast("double") /
      size(tokens(c)).cast("double")

  /** BPE-ish subword count: alpha runs, digit runs, single other chars. */
  def bpeTokenCount(c: Column): Column =
    size(regexp_extract_all(lower(c), lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"),
      lit(0))).cast("long")
}
