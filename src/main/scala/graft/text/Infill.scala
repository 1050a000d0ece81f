package graft.text

import java.nio.charset.StandardCharsets.UTF_8
import java.security.MessageDigest

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** FIM — fill-in-the-middle transformation (Bavarian et al. 2022,
  * "Efficient Training of Language Models to Fill in the Middle" — the
  * infilling pretraining-example generator every code-model pipeline
  * runs): a document splits at two cut points into (prefix, middle,
  * suffix) and re-serializes with sentinel tokens so the model learns
  * to generate the middle from BOTH sides:
  *
  *   PSM: `<fim_prefix> prefix <fim_suffix> suffix <fim_middle> middle`
  *   SPM: `<fim_prefix> <fim_suffix> suffix <fim_middle> prefix middle`
  *
  * (the paper's two orderings — SPM streams prefix+middle contiguously
  * after the context, the better KV-cache shape at inference; training
  * mixes both). Docs not selected (1 − fimRate) or shorter than
  * `minTokens` pass through UNCHANGED — the paper's joint FIM+AR mix.
  *
  * Deterministic and replay-stable (the [[SpanCorruption]] /
  * [[graft.ops.Sampling]] discipline — no `rand()`): selection, the
  * two cut points (order-normalized uniform draws over 0..n), and the
  * PSM/SPM choice all derive from `md5(seed:doc:*)`, so re-running any
  * partition replays identical examples. Map-only in the scan — one
  * `Dataset.map`, no shuffle, no UDF registry. The reconstruction
  * identity (the original token sequence reassembles exactly from any
  * output, [[reconstruct]]) is pinned by the oracle and tests.
  *
  * Sentinels are string tokens here (the whitespace-token substrate the
  * other text operators use); a token-id pipeline maps them into
  * reserved vocabulary ids the same way T5's `<extra_id_N>` land.
  */
object Infill {

  val Prefix = "<fim_prefix>"
  val Suffix = "<fim_suffix>"
  val Middle = "<fim_middle>"

  /** md5(tag) → non-negative Long from the first 8 bytes. */
  private def h64(tag: String): Long = {
    val d = MessageDigest.getInstance("MD5").digest(tag.getBytes(UTF_8))
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    v & Long.MaxValue
  }

  /** Transform one token sequence → (mode, tokens) where mode is
    * "psm" | "spm" | "ar" (ar = passed through unchanged). */
  def fimTokens(tokens: Array[String], seed: Long, docKey: String,
                fimRate: Double, spmRate: Double,
                minTokens: Int = 2): (String, Array[String]) = {
    require(fimRate >= 0 && fimRate <= 1, "fimRate in [0,1]")
    require(spmRate >= 0 && spmRate <= 1, "spmRate in [0,1]")
    val n = tokens.length
    val selected = n >= minTokens &&
      (h64(s"$seed:$docKey:fim") % (1L << 32)).toDouble <
        fimRate * (1L << 32).toDouble
    if (!selected) return ("ar", tokens)
    // two order-normalized uniform cuts over 0..n: prefix=[0,lo),
    // middle=[lo,hi), suffix=[hi,n) — any part may be empty
    val a = (h64(s"$seed:$docKey:cut1") % (n + 1L)).toInt
    val b = (h64(s"$seed:$docKey:cut2") % (n + 1L)).toInt
    val lo = math.min(a, b)
    val hi = math.max(a, b)
    val pre = tokens.slice(0, lo)
    val mid = tokens.slice(lo, hi)
    val suf = tokens.slice(hi, n)
    val spm = (h64(s"$seed:$docKey:spm") % (1L << 32)).toDouble <
      spmRate * (1L << 32).toDouble
    if (spm)
      ("spm", Array(Prefix, Suffix) ++ suf ++ Array(Middle) ++ pre ++ mid)
    else
      ("psm", Array(Prefix) ++ pre ++ Array(Suffix) ++ suf ++
        Array(Middle) ++ mid)
  }

  /** Inverse: the ORIGINAL token sequence from any [[fimTokens]] output
    * (PSM, SPM, or pass-through). SPM is recognized by the adjacent
    * `<fim_prefix> <fim_suffix>` head; after `<fim_middle>` its
    * prefix+middle run is already in original order, so the document is
    * that run followed by the suffix. */
  def reconstruct(out: Array[String]): Array[String] = {
    if (out.isEmpty || out(0) != Prefix) return out // ar pass-through
    val midAt = out.indexOf(Middle)
    require(midAt >= 0, s"malformed FIM sequence: no $Middle")
    if (out.length > 1 && out(1) == Suffix) { // SPM
      val suf = out.slice(2, midAt)
      out.slice(midAt + 1, out.length) ++ suf
    } else { // PSM
      val sufAt = out.indexOf(Suffix)
      require(sufAt >= 1, s"malformed FIM sequence: no $Suffix")
      out.slice(1, sufAt) ++ out.slice(midAt + 1, out.length) ++
        out.slice(sufAt + 1, midAt)
    }
  }

  /** Corpus transform: adds `fim_mode` ("psm"|"spm"|"ar") and
    * `fim_tokens` next to the input token column. Map-only. */
  def fimDocs(docs: DataFrame, tokensCol: String, idCol: String,
              seed: Long, fimRate: Double = 0.5,
              spmRate: Double = 0.5, minTokens: Int = 2): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast("long"), col(tokensCol))
      .as[(Long, Array[String])]
      .map { case (id, toks0) =>
        val toks = if (toks0 == null) Array.empty[String] else toks0
        val (mode, out) =
          fimTokens(toks, seed, id.toString, fimRate, spmRate, minTokens)
        (id, mode, out)
      }
      .toDF(idCol, "fim_mode", "fim_tokens")
  }
}
