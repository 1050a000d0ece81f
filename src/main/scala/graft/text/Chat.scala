package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Conversation (SFT/chat) data preparation — the supervised-finetuning
  * half of a training-data pipeline, next to the pretraining operators:
  * structural validation of multi-turn conversations, chat-template
  * rendering, assistant-span LOSS MASKS (the character ranges a trainer
  * computes loss over), and conversation-level exact dedup.
  *
  * The input shape is the TURNS FRAME: one row per turn,
  * `(doc, idx, role, content)` with `idx` 0-BASED AND CONTIGUOUS per
  * conversation (the shape [[fromJsonConversations]] produces; the
  * alternation parity and the array/frame validation twins both assume
  * it) — the natural distributed representation
  * (conversations are rows, never driver-side objects). Every operator
  * here is window/groupBy composition over that frame: one shuffle keyed
  * by the conversation id, bounded per-key state (real conversations
  * have bounded turns), pure built-in column functions — no UDFs, no
  * collect. The 100 TB shape: conversations hash-partition by id and
  * every check/render/mask is per-key local after that one exchange.
  *
  * The default rendering template is the public ChatML convention
  * (`<|im_start|>role\ncontent<|im_end|>\n`), parameterized so other
  * published templates express the same way.
  */
object Chat {

  /** A chat template: each turn renders as
    * `prefix(role) + content + suffix(role)` where the default
    * `prefix = pre + role + mid` and `suffix = post` (the ChatML
    * shape); `rolePre`/`rolePost` override prefix/suffix for SPECIFIC
    * roles, which expresses templates that never render role names
    * (Mistral's `[INST]`). A generation prompt appends
    * `prefix(assistantRole)`. Presets for the ubiquitous public
    * templates live on the companion.
    */
  final case class Template(pre: String = "<|im_start|>",
                            mid: String = "\n",
                            post: String = "<|im_end|>\n",
                            assistantRole: String = "assistant",
                            userRole: String = "user",
                            systemRole: String = "system",
                            rolePre: Map[String, String] = Map.empty,
                            rolePost: Map[String, String] = Map.empty) {
    /** The literal a generation prompt appends (the open assistant
      * header, the way inference serving primes the model). */
    def genPrefix: String =
      rolePre.getOrElse(assistantRole, pre + assistantRole + mid)
  }

  object Template {
    /** The public ChatML convention (the default). */
    val ChatML: Template = Template()

    /** Llama-3-style header tokens:
      * `<|start_header_id|>role<|end_header_id|>\n\ncontent<|eot_id|>`
      * (the published llama3 chat format, minus the tokenizer-level
      * `<|begin_of_text|>` BOS, which is not a per-turn marker). */
    val Llama3: Template = Template(
      pre = "<|start_header_id|>",
      mid = "<|end_header_id|>\n\n",
      post = "<|eot_id|>")

    /** Mistral instruction format: role names never render — user (and
      * system, which early Mistral releases fold into the instruction)
      * turns wrap in `[INST] ... [/INST]`, assistant turns open with a
      * single space and close with `</s>` (the published
      * `<s>[INST] q [/INST] answer</s>` shape, minus the
      * tokenizer-level BOS — the space between `[/INST]` and the reply
      * is part of the template, so the generation prefix is `" "`). */
    val Mistral: Template = Template(
      rolePre = Map("user" -> "[INST] ", "system" -> "[INST] ",
        "assistant" -> " "),
      rolePost = Map("user" -> " [/INST]", "system" -> " [/INST]",
        "assistant" -> "</s>"))
  }

  /** Structural validation — one row per conversation:
    * `(doc, n_turns, valid, reason)`. Reasons, first failure in fixed
    * precedence wins:
    *   - `bad_role`: a role outside {system, user, assistant}
    *   - `system_position`: a system turn anywhere but index 0
    *   - `no_turns`: no non-system turns at all
    *   - `alternation`: after the optional leading system turn, roles
    *     must be user, assistant, user, assistant, … (first is user)
    *   - `ends_with_user`: the last turn is not the assistant's
    *   - `empty_turn`: a turn with empty (or all-space) content
    * Valid conversations get reason `ok`.
    */
  def validate(turns: DataFrame, docCol: String, idxCol: String,
               roleCol: String, contentCol: String,
               tpl: Template = Template()): DataFrame = {
    val doc = col(docCol); val idx = col(idxCol); val role = col(roleCol)
    val content = col(contentCol)
    val w = Window.partitionBy(doc)
    // does a system turn lead? (alternation parity starts after it)
    val sysLead = max(when(idx === 0 && role === tpl.systemRole, 1)
      .otherwise(0)).over(w)
    val expected = when(pmod(idx - sysLead, lit(2)) === 0, tpl.userRole)
      .otherwise(tpl.assistantRole)
    val perTurn = turns.select(
      doc.as("doc"), idx.as("idx"), role.as("role"),
      // null role/content must gate EXPLICITLY: `!isin` and `length===0`
      // are three-valued-NULL on null inputs, so without the isNull arms
      // a null-field turn (the shape fromJsonConversations produces from
      // a partial message) would validate `ok` and then silently vanish
      // from render/lossSpans
      when(role.isNull ||
          !role.isin(tpl.systemRole, tpl.userRole, tpl.assistantRole), 1)
        .otherwise(0).as("bad_role"),
      when(role === tpl.systemRole && idx =!= 0, 1).otherwise(0)
        .as("sys_pos"),
      when(role =!= tpl.systemRole && role =!= expected &&
          role.isin(tpl.userRole, tpl.assistantRole), 1).otherwise(0)
        .as("alt_viol"),
      when(content.isNull || length(trim(content)) === 0, 1).otherwise(0)
        .as("empty_turn"),
      sysLead.as("sys_lead"))
    val agg = perTurn.groupBy(col("doc")).agg(
      count(lit(1)).as("n_turns"),
      max(col("bad_role")).as("any_bad_role"),
      max(col("sys_pos")).as("any_sys_pos"),
      max(col("alt_viol")).as("any_alt"),
      max(col("empty_turn")).as("any_empty"),
      first(col("sys_lead")).as("sys_lead"),
      max_by(col("role"), col("idx")).as("last_role"))
    agg.select(col("doc"), col("n_turns"),
        when(col("any_bad_role") === 1, "bad_role")
          .when(col("any_sys_pos") === 1, "system_position")
          .when(col("n_turns") - col("sys_lead") === 0, "no_turns")
          .when(col("any_alt") === 1, "alternation")
          .when(col("last_role") =!= tpl.assistantRole, "ends_with_user")
          .when(col("any_empty") === 1, "empty_turn")
          .otherwise("ok").as("reason"))
      .withColumn("valid", col("reason") === "ok")
      .select(col("doc"), col("n_turns"), col("valid"), col("reason"))
  }

  /** The per-turn rendered prefix under `tpl` — the default
    * `pre + role + mid` with any rolePre overrides folded in as a
    * static CASE chain (still pure codegen). */
  private def prefixCol(role: Column, tpl: Template): Column =
    tpl.rolePre.foldLeft(concat(lit(tpl.pre), role, lit(tpl.mid))) {
      case (acc, (r, p)) => when(role === r, lit(p)).otherwise(acc)
    }

  private def suffixCol(role: Column, tpl: Template): Column =
    tpl.rolePost.foldLeft(lit(tpl.post): Column) {
      case (acc, (r, p)) => when(role === r, lit(p)).otherwise(acc)
    }

  /** The per-turn rendered piece under `tpl`. */
  private def pieceCol(role: Column, content: Column, tpl: Template): Column =
    concat(prefixCol(role, tpl), content, suffixCol(role, tpl))

  /** Chat-template rendering — one row per conversation:
    * `(doc, rendered, n_chars)`. `addGenerationPrompt` appends the open
    * assistant header (`pre + assistantRole + mid`) the way inference
    * serving does.
    */
  def render(turns: DataFrame, docCol: String, idxCol: String,
             roleCol: String, contentCol: String,
             tpl: Template = Template(),
             addGenerationPrompt: Boolean = false): DataFrame = {
    val piece = pieceCol(col(roleCol), col(contentCol), tpl)
    val genSuffix = if (addGenerationPrompt) tpl.genPrefix else ""
    turns
      .select(col(docCol).as("doc"),
        struct(col(idxCol).cast("long").as("idx"), piece.as("piece")).as("tp"))
      .groupBy(col("doc"))
      .agg(array_sort(collect_list(col("tp"))).as("tps"))
      .select(col("doc"),
        concat(array_join(transform(col("tps"),
          tp => tp.getField("piece")), ""), lit(genSuffix)).as("rendered"))
      .withColumn("n_chars", length(col("rendered")).cast("long"))
  }

  /** Assistant LOSS SPANS — one row per assistant turn:
    * `(doc, idx, start_char, end_char)`, 0-based character offsets into
    * the [[render]] output (exclusive end), such that
    * `substring(rendered, start_char + 1, end_char - start_char)` is
    * exactly the turn's content. One window over (doc, idx) — the same
    * single exchange as render.
    */
  def lossSpans(turns: DataFrame, docCol: String, idxCol: String,
                roleCol: String, contentCol: String,
                tpl: Template = Template()): DataFrame = {
    val doc = col(docCol); val idx = col(idxCol); val role = col(roleCol)
    val content = col(contentCol)
    val piece = pieceCol(role, content, tpl)
    val before = Window.partitionBy(doc).orderBy(idx)
      .rowsBetween(Window.unboundedPreceding, -1)
    val cumBefore = coalesce(sum(length(piece).cast("long")).over(before),
      lit(0L))
    val start = cumBefore + length(prefixCol(role, tpl)).cast("long")
    turns
      .select(doc.as("doc"), idx.as("idx"), role.as("role"),
        start.as("start_char"),
        (start + length(content).cast("long")).as("end_char"))
      .filter(col("role") === tpl.assistantRole)
      .select(col("doc"), col("idx"), col("start_char"), col("end_char"))
  }

  /** A hash-input field that cannot be confused across null/non-null:
    * a non-null value encodes as `"v" + value`, a null as `"\u0000"` —
    * no non-null encoding starts with `\u0000`, so a null-content turn
    * never hashes equal to an absent or empty turn (and `concat` never
    * yields a null piece for `array_join`/`string_agg` to silently
    * drop). PRECONDITION carried by the `\u0001`/`\u0002` separators
    * below: they must not occur in role/content — corpus text never
    * contains C0 controls, and the engine's validate gate rejects the
    * null/malformed turns that could otherwise smuggle ambiguity
    * through.
    */
  private def nullSafeField(c: Column): Column =
    coalesce(concat(lit("v"), c), lit("\u0000"))

  /** Conversation-level exact dedup: hash the ordered
    * `role:content` stream (null-safe-encoded fields joined by
    * `\u0001`, turns by `\u0002` — see [[nullSafeField]]), keep the
    * smallest doc key per hash group. Returns `(doc, conv_hash, keep)`.
    * `hashOf` defaults to sha2-256; pass md5 for oracle portability.
    */
  def dedupConversations(turns: DataFrame, docCol: String, idxCol: String,
                         roleCol: String, contentCol: String,
                         hashOf: Column => Column = sha2(_, 256)): DataFrame = {
    val key = turns
      .select(col(docCol).as("doc"),
        struct(col(idxCol).cast("long").as("idx"),
          concat(nullSafeField(col(roleCol)), lit("\u0001"),
            nullSafeField(col(contentCol))).as("rc"))
          .as("tp"))
      .groupBy(col("doc"))
      .agg(array_sort(collect_list(col("tp"))).as("tps"))
      .select(col("doc"),
        hashOf(array_join(transform(col("tps"), tp => tp.getField("rc")),
          "\u0002")).as("conv_hash"))
    key.withColumn("keep",
      col("doc") === min(col("doc")).over(Window.partitionBy(col("conv_hash"))))
  }

  /** TOKEN-level loss masks over the concatenated per-turn content
    * stream (the "pack then mask" training shape: the sample's token
    * sequence is the turns' content tokens in order; the trainer
    * computes loss only on assistant-turn token ranges). `nTokens` maps
    * a content column to its token count — pass
    * `Bpe.tokenCountCol(model, _)` / `WordPiece.tokenCountCol(model, _)`
    * for real budgets; the default is the engine's canonical
    * whitespace count. One window over (doc, idx) — token offsets are
    * running sums, never a collect. Returns one row per assistant turn:
    * `(doc, idx, tok_start, tok_end)`, 0-based, exclusive end.
    */
  def tokenLossMask(turns: DataFrame, docCol: String, idxCol: String,
                    roleCol: String, contentCol: String,
                    nTokens: Column => Column =
                      c => size(TextAnalysis.spaceTokens(c)),
                    tpl: Template = Template()): DataFrame = {
    val doc = col(docCol); val idx = col(idxCol)
    val n = nTokens(col(contentCol)).cast("long")
    val before = Window.partitionBy(doc).orderBy(idx)
      .rowsBetween(Window.unboundedPreceding, -1)
    val start = coalesce(sum(n).over(before), lit(0L))
    turns
      .select(doc.as("doc"), idx.as("idx"), col(roleCol).as("role"),
        start.as("tok_start"), (start + n).as("tok_end"))
      .filter(col("role") === tpl.assistantRole)
      .select(col("doc"), col("idx"), col("tok_start"), col("tok_end"))
  }

  /** The PROMPT key of each conversation: the hash of the ordered
    * role/content stream EXCLUDING the final assistant turn — the part
    * two completions must share to be comparable. Returns
    * `(doc, prompt_hash, completion)` where `completion` is the final
    * assistant turn's content; conversations whose last turn is not the
    * assistant's emit no row (nothing to compare). Same separators as
    * [[dedupConversations]].
    */
  def promptKeys(turns: DataFrame, docCol: String, idxCol: String,
                 roleCol: String, contentCol: String,
                 tpl: Template = Template(),
                 hashOf: Column => Column = sha2(_, 256)): DataFrame = {
    val doc = col(docCol); val idx = col(idxCol)
    val w = Window.partitionBy(doc)
    val lastIdx = max(idx).over(w)
    val lastRole = max_by(col(roleCol), idx).over(w)
    val marked = turns.select(doc.as("doc"), idx.as("idx"),
      col(roleCol).as("role"), col(contentCol).as("content"),
      (idx === lastIdx).as("is_last"),
      (lastRole === tpl.assistantRole).as("comparable"))
    marked.filter(col("comparable"))
      .groupBy(col("doc"))
      .agg(
        // collect_list drops nulls, so the when() excises the final turn
        array_sort(collect_list(when(!col("is_last"),
          struct(col("idx").cast("long").as("idx"),
            concat(nullSafeField(col("role")), lit("\u0001"),
              nullSafeField(col("content"))).as("rc"))))
        ).as("tps"),
        max_by(col("content"), col("idx")).as("completion"))
      .select(col("doc"),
        hashOf(array_join(transform(col("tps"), t => t.getField("rc")),
          "\u0002")).as("prompt_hash"),
        col("completion"))
  }

  /** Parse JSONL-shaped conversations — the interchange format SFT data
    * actually ships in: one JSON object per row with a `messages` array
    * of `{role, content}` objects — into the TURNS FRAME
    * `(doc, idx, role, content)`, idx = the message's array position.
    * Map-only (`from_json` + posexplode inside the scan, no UDF);
    * rows that are not JSON or lack a messages array parse to null and
    * emit NO turns (posexplode drops them) — recover the rejected ids
    * with an anti-join when the audit matters. A messages ENTRY missing
    * role or content, however, still emits a turn with that field null
    * (the entry parsed; its shape is the corruption) — [[validate]]
    * gates exactly those as `bad_role`/`empty_turn`, so route parsed
    * turns through the gate before anything downstream.
    */
  def fromJsonConversations(df: DataFrame, idCol: String,
                            jsonCol: String): DataFrame = {
    val schema = org.apache.spark.sql.types.DataType.fromDDL(
      "struct<messages: array<struct<role: string, content: string>>>")
    df.select(col(idCol).as("doc"),
        from_json(col(jsonCol), schema).getField("messages").as("msgs"))
      .select(col("doc"), posexplode(col("msgs")))
      .select(col("doc"), col("pos").as("idx"),
        col("col").getField("role").as("role"),
        col("col").getField("content").as("content"))
  }

  /** The validation REASON as a pure array expression over a
    * `array<struct<idx,role,content>>` column — the streaming twin of
    * [[validate]] (same rules, same first-failure precedence), usable
    * on batch and streaming frames alike because nothing shuffles:
    * per-row expressions only. Parity with the frame-based validate is
    * pinned by ChatSpec. Turn order is the `idx` struct field
    * (array_sort orders by the first struct field).
    */
  def reasonCol(turns: Column, tpl: Template = Template()): Column = {
    val sorted = array_sort(turns)
    val n = size(sorted)
    // get() (0-based) is null-safe out of bounds — element_at would
    // throw under ANSI on an empty turns array
    val sysLead = when(n > 0 &&
      get(sorted, lit(0)).getField("role") === tpl.systemRole, 1)
      .otherwise(0)
    val roles = transform(sorted, t => t.getField("role"))
    // isNull arms mirror validate's (null-field turns gate, never pass)
    val anyBad = exists(roles, r =>
      r.isNull || !r.isin(tpl.systemRole, tpl.userRole, tpl.assistantRole))
    val anySysPos = exists(
      zip_with(roles, sequence(lit(0), greatest(n - 1, lit(0))), (r, i) =>
        r === tpl.systemRole && i =!= 0),
      identity)
    val anyAlt = exists(
      zip_with(roles, sequence(lit(0), greatest(n - 1, lit(0))), (r, i) =>
        r.isin(tpl.userRole, tpl.assistantRole) &&
          r =!= when(pmod(i - sysLead, lit(2)) === 0, tpl.userRole)
            .otherwise(tpl.assistantRole)),
      identity)
    val anyEmpty = exists(sorted, t =>
      t.getField("content").isNull ||
        length(trim(t.getField("content"))) === 0)
    val lastRole = get(sorted, n - 1).getField("role")
    when(anyBad, "bad_role")
      .when(anySysPos, "system_position")
      .when(n - sysLead === 0, "no_turns")
      .when(anyAlt, "alternation")
      .when(lastRole =!= tpl.assistantRole, "ends_with_user")
      .when(anyEmpty, "empty_turn")
      .otherwise("ok")
  }

  /** The conversation hash as a pure array expression — the streaming
    * twin of [[dedupConversations]]' key (same separators, same
    * ordering), so a stream's within-watermark dedup collapses exactly
    * the conversations the batch dedup would group.
    */
  def convHashCol(turns: Column,
                  hashOf: Column => Column = sha2(_, 256)): Column =
    hashOf(array_join(transform(array_sort(turns), t =>
      concat(nullSafeField(t.getField("role")), lit("\u0001"),
        nullSafeField(t.getField("content")))),
      "\u0002"))

  /** Streaming SFT curation: per-row structural gate (the SAME rules as
    * [[validate]], as pure expressions) then within-watermark exact
    * conversation dedup on [[convHashCol]] — the streaming twin of
    * [[curateSft]]'s gate→dedup front. Input: one row per conversation
    * with an `array<struct<idx,role,content>>` column. The batch
    * equivalent of the dedup leg is a plain `dropDuplicates(conv_hash)`
    * (within-watermark dedup is streaming-only by Spark contract);
    * min-id-wins reconciliation stays a compaction concern, as in the
    * web pipeline.
    */
  def curateSftStream(stream: DataFrame, turnsCol: String, idCol: String,
                      tsCol: String, watermark: String = "10 minutes",
                      tpl: Template = Template()): DataFrame =
    stream
      .withColumn("reason", reasonCol(col(turnsCol), tpl))
      .filter(col("reason") === "ok")
      .withColumn("conv_hash", convHashCol(col(turnsCol)))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("conv_hash")

  /** The SFT curation pipeline, composed: structural gate FIRST, exact
    * dedup among the gate's survivors (the engine's gates-then-dedup
    * discipline — an invalid conversation must never outrank a valid
    * duplicate), then rendering and span accounting for the delivered
    * set. One row per conversation with the full audit trail:
    * `(doc, valid, reason, keep, delivered, rendered, n_chars, n_spans,
    * mask_tokens)` — `keep` is null for invalid conversations (they
    * never entered dedup), `delivered = valid AND keep`.
    */
  def curateSft(turns: DataFrame, docCol: String, idxCol: String,
                roleCol: String, contentCol: String,
                tpl: Template = Template(),
                hashOf: Column => Column = sha2(_, 256)): DataFrame = {
    val v = validate(turns, docCol, idxCol, roleCol, contentCol, tpl)
    val validDocs = v.filter(col("valid")).select(col("doc"))
    val validTurns = turns.join(
      validDocs.withColumnRenamed("doc", "__vdoc"),
      col(docCol) === col("__vdoc"), "left_semi")
    val k = dedupConversations(validTurns, docCol, idxCol, roleCol,
      contentCol, hashOf).select(col("doc"), col("keep"))
    val r = render(turns, docCol, idxCol, roleCol, contentCol, tpl)
    val m = tokenLossMask(turns, docCol, idxCol, roleCol, contentCol,
        tpl = tpl)
      .groupBy(col("doc"))
      .agg(count(lit(1)).as("n_spans"),
        sum(col("tok_end") - col("tok_start")).as("mask_tokens"))
    v.join(k, Seq("doc"), "left")
      .join(r, Seq("doc"), "left")
      .join(m, Seq("doc"), "left")
      .select(col("doc"), col("valid"), col("reason"), col("keep"),
        (col("valid") && coalesce(col("keep"), lit(false)))
          .as("delivered"),
        col("rendered"), col("n_chars"),
        coalesce(col("n_spans"), lit(0L)).as("n_spans"),
        coalesce(col("mask_tokens"), lit(0L)).as("mask_tokens"))
  }

  /** Preference-PAIR construction (the DPO/RLHF-data shape): among
    * completions sharing a prompt key, pair the best-scored against the
    * worst-scored (deterministic tie-breaks: smaller doc key wins the
    * chosen side, larger the rejected side); groups with fewer than two
    * completions emit nothing. Two windows + one join, all on the
    * prompt key — one shuffle of the completions frame. Returns
    * `(prompt_hash, chosen_doc, rejected_doc, chosen_text,
    * rejected_text, margin)`.
    */
  def preferencePairs(completions: DataFrame, promptCol: String,
                      docCol: String, scoreCol: String,
                      textCol: String): DataFrame = {
    val p = col(promptCol)
    val byBest = Window.partitionBy(p)
      .orderBy(col(scoreCol).desc, col(docCol).asc)
    val byWorst = Window.partitionBy(p)
      .orderBy(col(scoreCol).asc, col(docCol).desc)
    val ranked = completions.select(p.as("prompt_hash"),
        col(docCol).as("doc"), col(scoreCol).as("score"),
        col(textCol).as("text"),
        row_number().over(byBest).as("rb"),
        row_number().over(byWorst).as("rw"),
        count(lit(1)).over(Window.partitionBy(p)).as("n"))
      .filter(col("n") >= 2 && (col("rb") === 1 || col("rw") === 1))
    val chosen = ranked.filter(col("rb") === 1)
      .select(col("prompt_hash"), col("doc").as("chosen_doc"),
        col("score").as("chosen_score"), col("text").as("chosen_text"))
    val rejected = ranked.filter(col("rw") === 1)
      .select(col("prompt_hash"), col("doc").as("rejected_doc"),
        col("score").as("rejected_score"), col("text").as("rejected_text"))
    chosen.join(rejected, "prompt_hash")
      .filter(col("chosen_doc") =!= col("rejected_doc"))
      .select(col("prompt_hash"), col("chosen_doc"), col("rejected_doc"),
        col("chosen_text"), col("rejected_text"),
        (col("chosen_score") - col("rejected_score")).as("margin"))
  }
}
