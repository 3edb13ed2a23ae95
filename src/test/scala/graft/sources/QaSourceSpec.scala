package graft.sources

import graft.SparkSpec

class QaSourceSpec extends SparkSpec {
  import spark.implicits._

  test("S4/J3: reference QA corpus loads as 55 line-aligned pairs") {
    val qa = QaSource.load(spark,
      "/root/reference/data/questions.txt",
      "/root/reference/data/answers.txt")
    assert(qa.count() === 55)
    val row3 = qa.filter($"qa_id" === 2).head()
    assert(row3.getAs[String]("question") === "What is the currency of Veridia called?")
    assert(row3.getAs[String]("expected_answer").contains("Veridian Crown"))
  }

  test("zip truncates to the shorter file (min_len semantics)") {
    val dir = java.nio.file.Files.createTempDirectory("qa").toString
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$dir/q.txt"), "q1\nq2\nq3\n")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$dir/a.txt"), "a1\na2\n")
    val qa = QaSource.load(spark, s"$dir/q.txt", s"$dir/a.txt")
    assert(qa.count() === 2)
  }

  test("blank lines pair by raw index (reference keeps them, strip only)") {
    val dir = java.nio.file.Files.createTempDirectory("qa").toString
    // q has a blank line at index 1; a does not — reference pairs by raw
    // index, so ("", "a2") must surface, not be dropped
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$dir/q.txt"), "q1\n\nq3\n")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$dir/a.txt"), "a1\na2\na3\n")
    val qa = QaSource.load(spark, s"$dir/q.txt", s"$dir/a.txt")
      .orderBy("qa_id").as[(Long, String, String)].collect()
    assert(qa.length === 3)
    assert(qa(1) === ((1L, "", "a2")))
    assert(qa(2) === ((2L, "q3", "a3")))
  }
}
