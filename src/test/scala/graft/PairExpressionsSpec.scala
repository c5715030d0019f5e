package graft

import org.apache.spark.sql.functions._

import graft.functions.{PairExpressions, VectorExpressions}

class PairExpressionsSpec extends SparkSpec {
  import spark.implicits._

  test("SortedPairs matches the key<key self-join on a multiset basket") {
    // basket with duplicates: {5,5,7,3} — instance pairs with distinct
    // values, canonicalized (min,max): (3,5)×2, (3,7), (5,7)×2
    val rows = Seq((1L, 5L), (1L, 5L), (1L, 7L), (1L, 3L),
      (2L, 9L), (3L, 1L), (3L, 2L))
    val df = rows.toDF("grp", "key")
    val expand = df.groupBy("grp").agg(collect_list(col("key")).as("ks"))
      .select(explode(PairExpressions.sortedPairs(col("ks"))).as("p"))
      .select(col("p.u").as("u"), col("p.v").as("v"))
      .groupBy("u", "v").agg(count(lit(1)).as("n"))
    val selfJoin = df.as("a")
      .join(df.as("b"), col("a.grp") === col("b.grp") &&
        col("a.key") < col("b.key"))
      .select(col("a.key").as("u"), col("b.key").as("v"))
      .groupBy("u", "v").agg(count(lit(1)).as("n"))
    assert(expand.exceptAll(selfJoin).isEmpty && selfJoin.exceptAll(expand).isEmpty)
    assert(expand.count() === 4) // (3,5) (3,7) (5,7) (1,2)
  }

  test("SortedPairs is collect-order independent (canonical sorted output)") {
    val a = Seq(Seq(4L, 1L, 9L)).toDF("ks")
    val b = Seq(Seq(9L, 4L, 1L)).toDF("ks")
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select(PairExpressions.sortedPairs(col("ks")).as("p"))
        .as[Seq[(Long, Long)]].head()
    assert(pairs(a) === pairs(b))
    assert(pairs(a) === Seq((1L, 4L), (1L, 9L), (4L, 9L)))
  }

  test("SortedPairs on empty and single-element baskets yields nothing") {
    val df = Seq(Seq.empty[Long], Seq(42L)).toDF("ks")
    assert(df.select(explode(PairExpressions.sortedPairs(col("ks")))).count() === 0)
  }

  test("WeightedPairs matches the weighted self-join contribution table") {
    // postings for two "shingles": {(1, 0.5), (3, 2.0), (2, 4.0)} and {(5, 1.0)}
    val rows = Seq(("a", 1L, 0.5), ("a", 3L, 2.0), ("a", 2L, 4.0), ("b", 5L, 1.0))
    val df = rows.toDF("sh", "doc_id", "w")
    val expand = df.groupBy("sh")
      .agg(collect_list(struct(col("doc_id"), col("w"))).as("m"))
      .select(explode(PairExpressions.weightedPairs(
        transform(col("m"), x => x.getField("doc_id")),
        transform(col("m"), x => x.getField("w")))).as("p"))
      .select(col("p.u"), col("p.v"), col("p.p"))
    val selfJoin = df.as("x").join(df.as("y"),
        col("x.sh") === col("y.sh") && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("u"), col("y.doc_id").as("v"),
        (col("x.w") * col("y.w")).as("p"))
    assert(expand.exceptAll(selfJoin).isEmpty && selfJoin.exceptAll(expand).isEmpty)
    assert(expand.count() === 3) // (1,2) (1,3) (2,3); singleton shingle emits none
  }

  test("SortedIntersectCount equals size(array_intersect) on sorted shingle sets") {
    // the d16 verify kernel's contract: on sorted, distinct,
    // non-null-element string arrays the merge walk counts exactly
    // |A ∩ B|. Exercise it on real shingle sets (both the codegen'd
    // projection path and a deliberately varied overlap structure).
    val sets = graft.dedup.Dedup.shingleSets(Tables.documents(spark, sfDir))
      .filter(size(col("g")) > 0)
      .select(col("doc_id"), array_sort(col("g")).as("g"))
      .limit(200)
    val pairs = sets.as("a").join(sets.as("b"), col("a.doc_id") < col("b.doc_id"))
    val diff = pairs.select(
        PairExpressions.sortedIntersectCount(col("a.g"), col("b.g")).as("walk"),
        size(array_intersect(col("a.g"), col("b.g"))).cast("long").as("hashset"))
      .filter(col("walk") =!= col("hashset")).count()
    assert(diff === 0, "merge-walk intersection must equal array_intersect")
  }

  test("SortedIntersectCount handles empty and disjoint/identical arrays") {
    val df = Seq(
      (Seq.empty[String], Seq("a b c")),
      (Seq("a", "b"), Seq("c", "d")),
      (Seq("a", "b", "c"), Seq("a", "b", "c"))
    ).toDF("x", "y")
    val got = df.select(PairExpressions.sortedIntersectCount(col("x"), col("y")))
      .collect().map(_.getLong(0)).toSeq
    assert(got === Seq(0L, 0L, 3L))
  }

  test("native L2Squared is bit-identical to the interpreted left fold") {
    val emb = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .limit(100)
    val pairs = emb.as("a").join(emb.as("b"), col("a.vec_id") < col("b.vec_id"))
    val diff = pairs.select(
        VectorExpressions.l2Squared(col("a.v"), col("b.v")).as("native"),
        aggregate(zip_with(col("a.v"), col("b.v"), (x, y) => (x - y) * (x - y)),
          lit(0.0), (acc, x) => acc + x).as("folded"))
      .filter(col("native") =!= col("folded")).count()
    assert(diff === 0, "codegen L2 must preserve exact fold semantics")
  }
}
