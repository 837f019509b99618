package graft

import graft.llm.Conversations
import org.apache.spark.sql.functions._

/** llm/Conversations — SFT turn-frame validation, chat-template
  * rendering, and per-role stats against hand-computable dialogs. */
class ConversationsSpec extends SparkTestBase {
  import spark.implicits._

  private def turns(rows: (Long, Long, String, String)*) =
    rows.toDF("conv_id", "idx", "role", "content")

  test("validate: every flag discriminates on a dedicated conversation") {
    val df = turns(
      // 1: fully valid two-turn dialog
      (1L, 0L, "user", "hi"), (1L, 1L, "assistant", "hello"),
      // 2: starts with assistant (alternation also broken by definition)
      (2L, 0L, "assistant", "hi"), (2L, 1L, "user", "hello"),
      // 3: ends with user (odd turn count)
      (3L, 0L, "user", "hi"), (3L, 1L, "assistant", "hello"),
      (3L, 2L, "user", "more"),
      // 4: index gap (0, 2)
      (4L, 0L, "user", "hi"), (4L, 2L, "assistant", "hello"),
      // 5: duplicate index
      (5L, 0L, "user", "hi"), (5L, 1L, "assistant", "a"),
      (5L, 1L, "assistant", "a"),
      // 6: whitespace-only content
      (6L, 0L, "user", "  "), (6L, 1L, "assistant", "hello"),
      // 7: mid-dialog alternation break (user, user, assistant, assistant)
      (7L, 0L, "user", "a"), (7L, 1L, "user", "b"),
      (7L, 2L, "assistant", "c"), (7L, 3L, "assistant", "d"),
      // 8: valid dialog with a non-zero first index (relative parity)
      (8L, 5L, "user", "hi"), (8L, 6L, "assistant", "hello"))
    val got = Conversations.validate(df, "conv_id", "idx", "role", "content")
      .as[(Long, Long, Int, Int, Int, Int, Int, Int)].collect()
      .map(r => r._1 -> r).toMap
    // (conv, n_turns, starts_user, alternates, ends_assistant, contiguous,
    //  has_empty, valid)
    assert(got(1L) == (1L, 2L, 1, 1, 1, 1, 0, 1))
    assert(got(2L) == (2L, 2L, 0, 0, 0, 1, 0, 0))
    assert(got(3L) == (3L, 3L, 1, 1, 0, 1, 0, 0))
    assert(got(4L) == (4L, 2L, 1, 0, 1, 0, 0, 0))
    // duplicate-index rows carry equal roles, so alternation still
    // holds; only contiguity (distinct-count) catches the duplication
    assert(got(5L) == (5L, 3L, 1, 1, 1, 0, 0, 0))
    assert(got(6L) == (6L, 2L, 1, 1, 1, 1, 1, 0))
    assert(got(7L) == (7L, 4L, 1, 0, 1, 1, 0, 0))
    assert(got(8L) == (8L, 2L, 1, 1, 1, 1, 0, 1))
    // partition independence
    val again = Conversations.validate(df.repartition(7), "conv_id", "idx",
        "role", "content")
      .as[(Long, Long, Int, Int, Int, Int, Int, Int)].collect()
      .map(r => r._1 -> r).toMap
    assert(again == got)
  }

  test("validate: custom role names") {
    val df = turns((1L, 0L, "human", "q"), (1L, 1L, "bot", "a"))
    val row = Conversations.validate(df, "conv_id", "idx", "role", "content",
        userRole = "human", assistantRole = "bot")
      .as[(Long, Long, Int, Int, Int, Int, Int, Int)].collect().head
    assert(row == (1L, 2L, 1, 1, 1, 1, 0, 1))
  }

  test("render: index order survives any input/partition order") {
    val df = turns(
      (1L, 2L, "user", "third"), (1L, 0L, "user", "first"),
      (1L, 1L, "assistant", "second"))
    val got = Conversations.render(df, "conv_id", "idx", "role", "content")
      .select("conv_id", "n_turns", "rendered", "n_chars")
      .as[(Long, Long, String, Int)].collect().head
    val expected =
      "<|im_start|>user\nfirst<|im_end|>\n" +
        "<|im_start|>assistant\nsecond<|im_end|>\n" +
        "<|im_start|>user\nthird<|im_end|>\n<|endoftext|>"
    assert(got == ((1L, 3L, expected, expected.length)))
    val again = Conversations.render(df.repartition(5), "conv_id", "idx",
        "role", "content")
      .select("rendered").as[String].collect().head
    assert(again == expected)
  }

  test("render: custom markers are data, not code") {
    val df = turns((1L, 0L, "user", "q"), (1L, 1L, "assistant", "a"))
    val got = Conversations.render(df, "conv_id", "idx", "role", "content",
        turnPrefix = "[", roleSep = "] ", turnSuffix = ";", eos = "<eos>")
      .select("rendered").as[String].collect().head
    assert(got == "[user] q;[assistant] a;<eos>")
  }

  test("turnStats: per-role turn and char volume") {
    val df = turns(
      (1L, 0L, "user", "ab"), (1L, 1L, "assistant", "cdef"),
      (1L, 2L, "user", "g"), (2L, 0L, "user", "xyz"))
    val got = Conversations.turnStats(df, "conv_id", "idx", "role", "content")
      .as[(Long, String, Long, Long, Long)].collect().toSet
    assert(got == Set(
      (1L, "user", 2L, 3L, 2L), (1L, "assistant", 1L, 4L, 4L),
      (2L, "user", 1L, 3L, 3L)))
  }
}
