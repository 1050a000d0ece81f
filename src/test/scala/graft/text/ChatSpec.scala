package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSuite

class ChatSpec extends SparkSuite {
  import spark.implicits._

  private def turns(rows: (Long, Int, String, String)*) =
    rows.toDF("doc", "idx", "role", "content")

  test("validate: the reason matrix, first failure wins") {
    val t = turns(
      // 0: valid with system lead
      (0L, 0, "system", "be helpful"), (0L, 1, "user", "hi"),
      (0L, 2, "assistant", "hello"),
      // 1: valid without system
      (1L, 0, "user", "q"), (1L, 1, "assistant", "a"),
      // 2: bad role (and also empty turn — bad_role wins)
      (2L, 0, "narrator", ""), (2L, 1, "assistant", "a"),
      // 3: system not first
      (3L, 0, "user", "q"), (3L, 1, "system", "s"),
      // 4: alternation broken (user, user)
      (4L, 0, "user", "q"), (4L, 1, "user", "q2"),
      // 5: ends with user
      (5L, 0, "user", "q"), (5L, 1, "assistant", "a"), (5L, 2, "user", "q2"),
      // 6: empty assistant turn (structure fine)
      (6L, 0, "user", "q"), (6L, 1, "assistant", "  "),
      // 7: system only — no turns
      (7L, 0, "system", "s"))
    val got = Chat.validate(t, "doc", "idx", "role", "content")
      .orderBy("doc").collect()
      .map(r => (r.getLong(0), r.getBoolean(2), r.getString(3)))
    assert(got(0) === ((0L, true, "ok")))
    assert(got(1) === ((1L, true, "ok")))
    assert(got(2) === ((2L, false, "bad_role")))
    assert(got(3) === ((3L, false, "system_position")))
    assert(got(4) === ((4L, false, "alternation")))
    assert(got(5) === ((5L, false, "ends_with_user")))
    assert(got(6) === ((6L, false, "empty_turn")))
    assert(got(7) === ((7L, false, "no_turns")))
  }

  test("render: ChatML markers in turn order; generation prompt appends") {
    val t = turns(
      (0L, 0, "system", "s"), (0L, 1, "user", "q"), (0L, 2, "assistant", "a"))
    val r = Chat.render(t, "doc", "idx", "role", "content")
      .select("rendered").as[String].head()
    assert(r ===
      "<|im_start|>system\ns<|im_end|>\n" +
      "<|im_start|>user\nq<|im_end|>\n" +
      "<|im_start|>assistant\na<|im_end|>\n")
    val g = Chat.render(t, "doc", "idx", "role", "content",
      addGenerationPrompt = true).select("rendered").as[String].head()
    assert(g === r + "<|im_start|>assistant\n")
    // out-of-order input rows still render by idx
    val shuffled = turns(
      (1L, 2, "assistant", "a"), (1L, 0, "user", "q"),
      (1L, 1, "assistant", "m"))
    val r2 = Chat.render(shuffled, "doc", "idx", "role", "content")
      .select("rendered").as[String].head()
    assert(r2.startsWith("<|im_start|>user\nq"))
  }

  test("lossSpans: extraction identity over every assistant turn") {
    val t = turns(
      (0L, 0, "system", "sys prompt"), (0L, 1, "user", "hello there"),
      (0L, 2, "assistant", "hi! how can I help"),
      (0L, 3, "user", "add 2+2"), (0L, 4, "assistant", "4"),
      (1L, 0, "user", "q"), (1L, 1, "assistant", ""))
    val rendered = Chat.render(t, "doc", "idx", "role", "content")
    val spans = Chat.lossSpans(t, "doc", "idx", "role", "content")
    val chk = spans
      .join(rendered, "doc")
      .join(t.toDF("doc", "idx", "role", "content"), Seq("doc", "idx"))
      .select(col("doc"), col("idx"),
        col("rendered").substr(col("start_char") + 1,
          col("end_char") - col("start_char")).as("got"),
        col("content"))
      .collect()
    assert(chk.length === 3) // assistant turns only
    chk.foreach { r =>
      assert(r.getString(2) === r.getString(3),
        s"span mismatch at ${r.getLong(0)}/${r.getInt(1)}")
    }
  }

  test("dedupConversations: identical role:content streams collapse") {
    val t = turns(
      (0L, 0, "user", "q"), (0L, 1, "assistant", "a"),
      (5L, 0, "user", "q"), (5L, 1, "assistant", "a"),   // dup of 0
      (7L, 0, "user", "q"), (7L, 1, "assistant", "b"),   // differs
      // same concatenation trap: role 'user' + content 'x:a' vs 'userx' + ':a'
      (8L, 0, "user", "x:a"), (8L, 1, "assistant", "a"),
      (9L, 0, "userx", ":a"), (9L, 1, "assistant", "a"))
    val got = Chat.dedupConversations(t, "doc", "idx", "role", "content")
      .orderBy("doc").collect()
      .map(r => (r.getLong(0), r.getBoolean(2)))
    assert(got.toSeq === Seq((0L, true), (5L, false), (7L, true),
      (8L, true), (9L, true)))
  }

  test("tokenLossMask: running offsets over the content stream; custom counter") {
    val t = turns(
      (0L, 0, "system", "be helpful"),        // 2 tokens
      (0L, 1, "user", "what is two plus two"), // 5
      (0L, 2, "assistant", "it is four"),      // 3 -> [7, 10)
      (0L, 3, "user", "thanks"),               // 1
      (0L, 4, "assistant", "sure"))            // 1 -> [11, 12)
    val got = Chat.tokenLossMask(t, "doc", "idx", "role", "content")
      .orderBy("idx").collect()
      .map(r => (r.getInt(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq === Seq((2, 7L, 10L), (4, 11L, 12L)))
    // a custom token counter shifts the offsets accordingly (chars here)
    val chars = Chat.tokenLossMask(t, "doc", "idx", "role", "content",
      nTokens = c => length(c)).orderBy("idx").collect()
      .map(r => (r.getInt(1), r.getLong(2), r.getLong(3)))
    assert(chars.head === ((2, 30L, 40L))) // 10 + 20 chars before
  }

  test("promptKeys: shared prompt, distinct completions; no-assistant drops") {
    val t = turns(
      (0L, 0, "user", "q"), (0L, 1, "assistant", "a1"),
      (1L, 0, "user", "q"), (1L, 1, "assistant", "a2"),
      (2L, 0, "user", "other"), (2L, 1, "assistant", "a1"),
      // multi-turn: prompt = everything before the final assistant turn
      (3L, 0, "user", "q"), (3L, 1, "assistant", "m"), (3L, 2, "user", "q2"),
      (3L, 3, "assistant", "a3"),
      // ends with user: not comparable, no row
      (4L, 0, "user", "q"))
    val got = Chat.promptKeys(t, "doc", "idx", "role", "content")
      .orderBy("doc").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    assert(got.length === 4)
    assert(got(0)._2 === got(1)._2, "same prompt must share the key")
    assert(got(0)._3 === "a1" && got(1)._3 === "a2")
    assert(got(0)._2 !== got(2)._2, "different prompt, different key")
    assert(got(0)._2 !== got(3)._2, "longer prompt, different key")
  }

  test("preferencePairs: best vs worst with deterministic tie-breaks") {
    val comps = Seq(
      // group A: clear best (9) and worst (1)
      ("A", 10L, 9L, "best"), ("A", 11L, 5L, "mid"), ("A", 12L, 1L, "worst"),
      // group B: all tied — chosen = smallest doc, rejected = largest
      ("B", 20L, 3L, "t0"), ("B", 21L, 3L, "t1"), ("B", 22L, 3L, "t2"),
      // group C: singleton — no pair
      ("C", 30L, 7L, "solo"))
      .toDF("p", "doc", "score", "text")
    val got = Chat.preferencePairs(comps, "p", "doc", "score", "text")
      .orderBy("prompt_hash").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(5)))
    assert(got.toSeq === Seq(("A", 10L, 12L, 8L), ("B", 20L, 22L, 0L)))
  }

  test("curateSft: gate first, dedup among survivors, full audit trail") {
    val t = turns(
      // 0 and 5: valid duplicates — 0 wins, 5 drops
      (0L, 0, "user", "q"), (0L, 1, "assistant", "a"),
      (5L, 0, "user", "q"), (5L, 1, "assistant", "a"),
      // 3: INVALID duplicate of the same conversation content plus a
      // trailing user turn — must not enter dedup at all
      (3L, 0, "user", "q"), (3L, 1, "assistant", "a"), (3L, 2, "user", "x"),
      // 7: valid, unique
      (7L, 0, "user", "w"), (7L, 1, "assistant", "b"))
    val got = Chat.curateSft(t, "doc", "idx", "role", "content")
      .orderBy("doc").collect()
      .map(r => (r.getLong(0), r.getBoolean(1), r.getString(2),
        r.getBoolean(4), r.getLong(7), r.getLong(8)))
    assert(got(0) === ((0L, true, "ok", true, 1L, 1L)))
    // span accounting is computed for every conversation (doc 3 has an
    // assistant turn even though the conversation is invalid)
    assert(got(1) === ((3L, false, "ends_with_user", false, 1L, 1L)))
    assert(got(2) === ((5L, true, "ok", false, 1L, 1L)))
    assert(got(3) === ((7L, true, "ok", true, 1L, 1L)))
    // invalid rows carry a null keep (never entered dedup)
    val keep3 = Chat.curateSft(t, "doc", "idx", "role", "content")
      .filter(col("doc") === 3L).select("keep").head()
    assert(keep3.isNullAt(0))
    // rendered text present for every row, spans only where assistants
    val r0 = Chat.curateSft(t, "doc", "idx", "role", "content")
      .filter(col("doc") === 0L).select("rendered").as[String].head()
    assert(r0 === "<|im_start|>user\nq<|im_end|>\n" +
      "<|im_start|>assistant\na<|im_end|>\n")
  }

  test("fromJsonConversations: messages arrays parse to turns; malformed emit none") {
    val df = Seq(
      (1L, """{"messages":[{"role":"user","content":"hi"},
               {"role":"assistant","content":"hello there"}]}"""),
      (2L, """{"messages":[]}"""),
      (3L, """not json at all"""),
      (4L, """{"other": 1}"""),
      (5L, """{"messages":[{"role":"user"}]}""")) // content absent -> null
      .toDF("doc_id", "j")
    val got = Chat.fromJsonConversations(df, "doc_id", "j")
      .orderBy("doc", "idx").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2),
        if (r.isNullAt(3)) null else r.getString(3)))
    assert(got.toSeq === Seq(
      (1L, 0, "user", "hi"),
      (1L, 1, "assistant", "hello there"),
      (5L, 0, "user", null)))
    // parsed turns flow straight into validate
    val v = Chat.validate(
      Chat.fromJsonConversations(df, "doc_id", "j").filter(col("doc") === 1L),
      "doc", "idx", "role", "content").head()
    assert(v.getBoolean(2) === true)
  }

  test("reasonCol parity: the array expression agrees with validate on every class") {
    val t = turns(
      (0L, 0, "system", "s"), (0L, 1, "user", "hi"), (0L, 2, "assistant", "a"),
      (1L, 0, "user", "q"), (1L, 1, "assistant", "a"),
      (2L, 0, "narrator", ""), (2L, 1, "assistant", "a"),
      (3L, 0, "user", "q"), (3L, 1, "system", "s"),
      (4L, 0, "user", "q"), (4L, 1, "user", "q2"),
      (5L, 0, "user", "q"), (5L, 1, "assistant", "a"), (5L, 2, "user", "q2"),
      (6L, 0, "user", "q"), (6L, 1, "assistant", "  "),
      (7L, 0, "system", "s"),
      (8L, 0, "system", "s"), (8L, 1, "user", "u"), (8L, 2, "system", "s2"),
      (8L, 3, "assistant", "a"))
    val byFrame = Chat.validate(t, "doc", "idx", "role", "content")
      .select(col("doc"), col("reason")).as[(Long, String)].collect().toMap
    val byArray = t
      .groupBy(col("doc"))
      .agg(collect_list(struct(col("idx"), col("role"), col("content")))
        .as("turns"))
      .select(col("doc"), Chat.reasonCol(col("turns")).as("reason"))
      .as[(Long, String)].collect().toMap
    assert(byArray === byFrame)
    // and the conv hash agrees with the frame-based dedup key
    val hFrame = Chat.dedupConversations(t, "doc", "idx", "role", "content")
      .select(col("doc"), col("conv_hash")).as[(Long, String)].collect().toMap
    val hArray = t
      .groupBy(col("doc"))
      .agg(collect_list(struct(col("idx"), col("role"), col("content")))
        .as("turns"))
      .select(col("doc"), Chat.convHashCol(col("turns")).as("h"))
      .as[(Long, String)].collect().toMap
    assert(hArray === hFrame)
  }

  test("curateSftStream: gate per row, dedup within watermark") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    val input =
      MemoryStream[(Long, Seq[(Int, String, String)], java.sql.Timestamp)](spark)
    val stream = input.toDF().toDF("doc_id", "turns", "ts")
      .withColumn("turns", col("turns")
        .cast("array<struct<idx:int,role:string,content:string>>"))
    val kept = Chat.curateSftStream(stream, "turns", "doc_id", "ts",
      watermark = "10 seconds")
    val query = kept.writeStream.format("memory").queryName("sft")
      .outputMode(OutputMode.Append).start()
    def ts(s: Long) = new java.sql.Timestamp(s * 1000)
    val good = Seq((0, "user", "q"), (1, "assistant", "a"))
    val bad = Seq((0, "user", "q"))                      // ends with user
    val other = Seq((0, "user", "w"), (1, "assistant", "b"))
    input.addData(
      (1L, good, ts(1)),
      (2L, bad, ts(2)),
      (3L, other, ts(3)),
      (4L, good, ts(4)))                                 // dup of 1
    query.processAllAvailable()
    query.stop()
    val ids = spark.table("sft").select("doc_id").as[Long].collect().sorted.toSeq
    assert(ids === Seq(1L, 3L))
    assert(spark.table("sft").columns.contains("conv_hash"))
  }

  test("plans: validate/render/dedup shuffle once on the doc key") {
    val t = turns((0L, 0, "user", "q"), (0L, 1, "assistant", "a"))
    def nExchanges(df: org.apache.spark.sql.DataFrame): Int =
      df.queryExecution.executedPlan.toString.linesIterator
        .count(_.contains("Exchange"))
    // one hash exchange for the groupBy/window (AQE may add reads but
    // no second shuffle of the turns)
    assert(nExchanges(Chat.render(t, "doc", "idx", "role", "content")) <= 2)
    assert(nExchanges(Chat.validate(t, "doc", "idx", "role", "content")) <= 2)
  }

  test("plans: no UDFs, no cartesian products anywhere in the family") {
    val t = turns((0L, 0, "user", "q"), (0L, 1, "assistant", "a"),
      (1L, 0, "user", "w"), (1L, 1, "assistant", "b"))
    val comps = Seq(("p", 1L, 2L, "x"), ("p", 2L, 1L, "y"))
      .toDF("p", "doc", "score", "text")
    val plans = Seq(
      Chat.validate(t, "doc", "idx", "role", "content"),
      Chat.render(t, "doc", "idx", "role", "content"),
      Chat.lossSpans(t, "doc", "idx", "role", "content"),
      Chat.tokenLossMask(t, "doc", "idx", "role", "content"),
      Chat.dedupConversations(t, "doc", "idx", "role", "content"),
      Chat.promptKeys(t, "doc", "idx", "role", "content"),
      Chat.curateSft(t, "doc", "idx", "role", "content"),
      Chat.preferencePairs(comps, "p", "doc", "score", "text"))
      .map(_.queryExecution.executedPlan.toString)
    plans.foreach { p =>
      assert(!p.contains("ScalaUDF"), "family must stay UDF-free")
      assert(!p.contains("CartesianProduct") &&
        !p.contains("BroadcastNestedLoopJoin"),
        "family must never plan an unkeyed join")
    }
  }

  test("validate: null role and null content gate explicitly (never ok)") {
    val t = Seq[(Long, Int, Option[String], Option[String])](
      // null assistant content — the fromJsonConversations partial-
      // message shape; must gate as empty_turn, not fail open to ok
      (0L, 0, Some("user"), Some("q")), (0L, 1, Some("assistant"), None),
      // null role — must gate as bad_role
      (1L, 0, None, Some("q")), (1L, 1, Some("assistant"), Some("a")),
      // control: intact conversation stays ok
      (2L, 0, Some("user"), Some("q")), (2L, 1, Some("assistant"), Some("a")))
      .toDF("doc", "idx", "role", "content")
    val got = Chat.validate(t, "doc", "idx", "role", "content")
      .orderBy("doc").collect()
      .map(r => (r.getLong(0), r.getBoolean(2), r.getString(3)))
    assert(got(0) === ((0L, false, "empty_turn")))
    assert(got(1) === ((1L, false, "bad_role")))
    assert(got(2) === ((2L, true, "ok")))
    // the streaming twin agrees on null-field turns (parity pin)
    val byArray = t.groupBy(col("doc"))
      .agg(collect_list(struct(col("idx"), col("role"), col("content")))
        .as("turns"))
      .select(col("doc"), Chat.reasonCol(col("turns")).as("reason"))
      .as[(Long, String)].collect().toMap
    assert(byArray === Map(0L -> "empty_turn", 1L -> "bad_role", 2L -> "ok"))
    // and the JSONL ingest shape flows through the gate end-to-end
    val parsed = Chat.fromJsonConversations(
      Seq((9L, """{"messages":[{"role":"user","content":"hi"},
                   {"role":"assistant"}]}""")).toDF("doc_id", "j"),
      "doc_id", "j")
    val v = Chat.validate(parsed, "doc", "idx", "role", "content").head()
    assert(v.getString(3) === "empty_turn")
  }

  test("dedup hashing: null fields never collapse with absent or empty turns") {
    val t = Seq[(Long, Int, Option[String], Option[String])](
      (0L, 0, Some("user"), Some("q")), (0L, 1, Some("assistant"), None),
      (1L, 0, Some("user"), Some("q")), // second turn absent entirely
      (2L, 0, Some("user"), Some("q")), (2L, 1, Some("assistant"), Some("")),
      (3L, 0, Some("user"), Some("q")), (3L, 1, None, Some("")))
      .toDF("doc", "idx", "role", "content")
    val hashes = Chat.dedupConversations(t, "doc", "idx", "role", "content")
      .select(col("doc"), col("conv_hash")).as[(Long, String)].collect().toMap
    assert(hashes.values.toSet.size === 4,
      "null/absent/empty variants must all hash distinct")
    // the expression twin agrees hash-for-hash on null-field turns too
    val hArray = t.groupBy(col("doc"))
      .agg(collect_list(struct(col("idx"), col("role"), col("content")))
        .as("turns"))
      .select(col("doc"), Chat.convHashCol(col("turns")).as("h"))
      .as[(Long, String)].collect().toMap
    assert(hArray === hashes)
  }

  test("template presets: exact render strings for Llama3 and Mistral") {
    val t = turns(
      (0L, 0, "system", "be brief"), (0L, 1, "user", "hi"),
      (0L, 2, "assistant", "hello"))
    val l3 = Chat.render(t, "doc", "idx", "role", "content",
      Chat.Template.Llama3).select("rendered").as[String].head()
    assert(l3 ===
      "<|start_header_id|>system<|end_header_id|>\n\nbe brief<|eot_id|>" +
      "<|start_header_id|>user<|end_header_id|>\n\nhi<|eot_id|>" +
      "<|start_header_id|>assistant<|end_header_id|>\n\nhello<|eot_id|>")
    val l3g = Chat.render(t, "doc", "idx", "role", "content",
      Chat.Template.Llama3, addGenerationPrompt = true)
      .select("rendered").as[String].head()
    assert(l3g === l3 + "<|start_header_id|>assistant<|end_header_id|>\n\n")
    val mi = Chat.render(t, "doc", "idx", "role", "content",
      Chat.Template.Mistral).select("rendered").as[String].head()
    assert(mi === "[INST] be brief [/INST][INST] hi [/INST] hello</s>")
    // Mistral's generation prefix is the single space the published
    // template places between [/INST] and the assistant's reply
    val mig = Chat.render(t, "doc", "idx", "role", "content",
      Chat.Template.Mistral, addGenerationPrompt = true)
      .select("rendered").as[String].head()
    assert(mig === mi + " ")
  }

  test("template presets: loss-span extraction identity under every preset") {
    val t = turns(
      (0L, 0, "system", "sys prompt"), (0L, 1, "user", "hello there"),
      (0L, 2, "assistant", "hi! how can I help"),
      (0L, 3, "user", "add 2+2"), (0L, 4, "assistant", "4"),
      (1L, 0, "user", "q"), (1L, 1, "assistant", ""))
    Seq(Chat.Template.ChatML, Chat.Template.Llama3, Chat.Template.Mistral)
      .foreach { tpl =>
        val rendered = Chat.render(t, "doc", "idx", "role", "content", tpl)
        val spans = Chat.lossSpans(t, "doc", "idx", "role", "content", tpl)
        val chk = spans
          .join(rendered, "doc")
          .join(t.toDF("doc", "idx", "role", "content"), Seq("doc", "idx"))
          .select(col("rendered").substr(col("start_char") + 1,
            col("end_char") - col("start_char")).as("got"), col("content"))
          .collect()
        assert(chk.length === 3, s"$tpl span count")
        chk.foreach(r => assert(r.getString(0) === r.getString(1),
          s"$tpl extraction identity"))
      }
  }

  test("lossSpans and tokenLossMask agree on per-turn mass (chars vs counter)") {
    val t = turns(
      (0L, 0, "system", "be helpful"), (0L, 1, "user", "a bb ccc"),
      (0L, 2, "assistant", "dd e"), (0L, 3, "user", "f"),
      (0L, 4, "assistant", "ggg hh i"))
    // with a character counter, token masks ARE the content char spans
    val chars = Chat.tokenLossMask(t, "doc", "idx", "role", "content",
        nTokens = c => length(c))
      .select(col("idx"), (col("tok_end") - col("tok_start")).as("m"))
      .as[(Int, Long)].collect().toMap
    val spans = Chat.lossSpans(t, "doc", "idx", "role", "content")
      .select(col("idx"), (col("end_char") - col("start_char")).as("m"))
      .as[(Int, Long)].collect().toMap
    assert(chars === spans)
    // with the default whitespace counter, mass = word counts
    val words = Chat.tokenLossMask(t, "doc", "idx", "role", "content")
      .select(col("idx"), (col("tok_end") - col("tok_start")).as("m"))
      .as[(Int, Long)].collect().toMap
    assert(words === Map(2 -> 2L, 4 -> 3L))
  }
}
