package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Instruction/chat (SFT) corpus operators — the conversation-shaped
  * sibling of the plain-document curation surface. A post-training data
  * pipeline stores dialogs as TURN ROWS (conv_id, turn_idx, role,
  * content): this module validates their structural contract, renders
  * them into the single training string the tokenizer consumes, and
  * summarizes per-role volume. The reference has no chat surface (it is
  * pure relational ETL); the shapes here follow the public SFT-data
  * conventions (ChatML-style role markers, strict user/assistant
  * alternation) every open recipe shares.
  *
  * Scale shape: everything is keyed by the conversation — state is
  * bounded by ONE dialog's turns, never the corpus. `validate` is two
  * map-side-partial groupBys and one conv-keyed join (window-free);
  * `render` is one groupBy whose per-group buffer is the dialog itself
  * (the same bound as sessionization); `turnStats` is one groupBy.
  * Rendering keeps turn order deterministic without a sort node by
  * `array_sort`-ing the collected struct list on the leading turn-index
  * field — collect_list order is non-deterministic, the sorted array is
  * not.
  */
object Conversations {

  /** Structural validation of a turns frame, one row per conversation:
    *
    *   - `starts_user`     — the minimum-index turn has `userRole`
    *   - `alternates`      — role strictly alternates user/assistant by
    *                         index parity relative to the first turn
    *   - `ends_assistant`  — the maximum-index turn has `assistantRole`
    *   - `contiguous`      — turn indices are gap-free and duplicate-free
    *   - `has_empty`       — any turn content NULL or whitespace-only
    *   - `valid`           — all of the above (and not `has_empty`)
    *
    * Flags surface as INT 0/1 so the result hash-compares across
    * engines. Window-free: a min-index probe (map-side partial) joined
    * back, then one conditional aggregation.
    */
  def validate(turns: DataFrame, convCol: String, idxCol: String,
               roleCol: String, contentCol: String,
               userRole: String = "user",
               assistantRole: String = "assistant"): DataFrame = {
    val t0 = turns.select(col(convCol).as("__c"),
      col(idxCol).cast("long").as("__i"), col(roleCol).as("__r"),
      col(contentCol).as("__x"))
    val first = t0.groupBy(col("__c")).agg(min(col("__i")).as("__imin"))
    val expected = when(pmod(col("__i") - col("__imin"), lit(2L)) === 0L,
      lit(userRole)).otherwise(lit(assistantRole))
    val flag = (c: Column) => c.cast("int")
    t0.join(first, "__c")
      .groupBy(col("__c"))
      .agg(
        count(lit(1)).as("n_turns"),
        min(flag(col("__r") === expected)).as("alternates"),
        max_by(col("__r"), col("__i")).as("__last"),
        min(col("__imin")).as("__lo"),
        max(col("__i")).as("__hi"),
        countDistinct(col("__i")).as("__nd"),
        max(flag(col("__x").isNull || trim(col("__x")) === "")).as("has_empty"),
        min(when(col("__i") === col("__imin"),
          flag(col("__r") === lit(userRole)))).as("starts_user"))
      .select(
        col("__c").as(convCol),
        col("n_turns"),
        col("starts_user"),
        col("alternates"),
        flag(col("__last") === lit(assistantRole)).as("ends_assistant"),
        flag(col("__hi") - col("__lo") + 1L === col("n_turns") &&
          col("__nd") === col("n_turns")).as("contiguous"),
        col("has_empty"),
        (col("starts_user") * col("alternates") *
          flag(col("__last") === lit(assistantRole)) *
          flag(col("__hi") - col("__lo") + 1L === col("n_turns") &&
            col("__nd") === col("n_turns")) *
          (lit(1) - col("has_empty"))).cast("int").as("valid"))
  }

  /** Render each conversation to the single training string the
    * tokenizer consumes: per turn
    * `turnPrefix + role + roleSep + content + turnSuffix`, turns joined
    * in index order, `eos` appended. Defaults are the ChatML-style
    * markers the open SFT recipes share; every marker is a parameter so
    * a template change is data, not code.
    *
    * One groupBy; the per-group buffer is one dialog (the sessionize
    * bound). Turn order is pinned by sorting the collected struct list
    * on its leading index field.
    */
  def render(turns: DataFrame, convCol: String, idxCol: String,
             roleCol: String, contentCol: String,
             turnPrefix: String = "<|im_start|>",
             roleSep: String = "\n",
             turnSuffix: String = "<|im_end|>\n",
             eos: String = "<|endoftext|>"): DataFrame = {
    val sorted = array_sort(collect_list(struct(
      col("__i").as("i"), col("__r").as("r"), col("__x").as("x"))))
    turns.select(col(convCol).as("__c"),
        col(idxCol).cast("long").as("__i"), col(roleCol).as("__r"),
        col(contentCol).as("__x"))
      .groupBy(col("__c"))
      .agg(count(lit(1)).as("n_turns"), sorted.as("__t"))
      .select(
        col("__c").as(convCol),
        col("n_turns"),
        concat(
          concat_ws("", transform(col("__t"), t =>
            concat(lit(turnPrefix), t.getField("r"), lit(roleSep),
              t.getField("x"), lit(turnSuffix)))),
          lit(eos)).as("rendered"))
      .withColumn("n_chars", length(col("rendered")))
  }

  /** Per-(conversation, role) volume summary: turn count, total and max
    * content chars — the per-role balance signal an SFT mixture weighs
    * (assistant-heavy vs user-heavy dialogs). One map-side-partial
    * groupBy. */
  def turnStats(turns: DataFrame, convCol: String, idxCol: String,
                roleCol: String, contentCol: String): DataFrame =
    turns.groupBy(col(convCol), col(roleCol).as("role"))
      .agg(count(lit(1)).as("n_turns"),
        sum(length(col(contentCol))).as("n_chars"),
        max(length(col(contentCol))).as("max_chars"))
}
