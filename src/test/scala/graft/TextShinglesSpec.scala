package graft

import graft.llm.TextShingles
import org.apache.spark.sql.functions._

class TextShinglesSpec extends SparkTestBase {
  import spark.implicits._

  test("native word n-grams are element-identical to the lambda reference") {
    // real corpus + adversarial tokenization edges: empty string, single
    // token, consecutive/leading/trailing spaces (split(" ", -1) keeps
    // the empty tokens they produce)
    val edge = Seq("", "one", "a b", "a  b", " a b ", "x y z w",
        "tab\tand other whitespace stay intact")
      .toDF("text")
    val real = spark.read.parquet(sf("sf0.001") + "/documents.parquet")
      .select($"text").limit(200)
    for (df <- Seq(edge, real); n <- Seq(1, 2, 3)) {
      val mism = df.select(
          TextShingles.wordNgrams($"text", n).as("native"),
          TextShingles.wordNgramsReference($"text", n).as("ref"))
        .filter($"native" =!= $"ref").count()
      assert(mism == 0, s"n=$n")
    }
  }

  test("native n-grams stay in whole-stage codegen (no CodegenFallback lambda)") {
    val p = spark.read.parquet(sf("sf0.001") + "/documents.parquet")
      .select(explode(TextShingles.wordNgrams($"text", 2)).as("g"))
      .queryExecution.executedPlan.toString
    assert(p.contains("word_ngrams"), s"native expression missing:\n${p.take(500)}")
    assert(!p.contains("transform(") && !p.contains("element_at"),
      "lambda chain leaked back into the shingle path")
  }
}
