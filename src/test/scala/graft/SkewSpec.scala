package graft

import org.apache.spark.sql.functions._
import graft.ops.Skew

class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("salted count equals plain count on a hot-key distribution") {
    // 90% of rows share one key — the classic hot-key shape
    val df = (1 to 10000).map { i =>
      (if (i % 10 == 0) s"key${i % 7}" else "hotkey", i.toLong)
    }.toDF("k", "v")
    val plain = df.groupBy($"k").count()
      .as[(String, Long)].collect().toMap
    val salted = Skew.saltedCount(df, $"k", $"v", buckets = 16)
      .select($"key", $"cnt").as[(String, Long)].collect().toMap
    assert(salted == plain)
  }

  test("salted sum equals plain sum, spread over bucket partitions") {
    val df = (1 to 5000).map(i => ("hot", i.toLong)).toDF("k", "v")
    val salted = Skew.saltedSum(df, $"k", $"v", $"v", buckets = 8)
      .select($"sum").as[Long].head()
    assert(salted == (1 to 5000).map(_.toLong).sum)
    // the partial stage really fans one key across buckets
    val partials = df.withColumn("__salt", Skew.salt($"v", 8))
      .groupBy($"k", $"__salt").count()
    assert(partials.count() == 8)
  }

  test("content salt is retry-stable and join-exact on a salted join") {
    // salted-join pattern: hot fact side salted by row content, dim side
    // replicated across all buckets — join result must equal the unsalted
    // join exactly (content hashing is deterministic under recomputation,
    // unlike the monotonic-id fallback)
    val fact = (1 to 2000).map(i => ("hot", i.toLong)).toDF("k", "v")
      .withColumn("salt", Skew.saltFromContent(8, $"v"))
    val dim = Seq(("hot", 10L)).toDF("k", "mult")
      .withColumn("salt", explode(sequence(lit(0), lit(7))))
    val salted = fact.join(dim, Seq("k", "salt"))
      .agg(sum($"v" * $"mult")).as[Long].head()
    assert(salted == (1 to 2000).map(_.toLong * 10).sum)
    // deterministic across evaluations
    val a = fact.select($"salt").collect().toSeq
    val b = fact.select($"salt").collect().toSeq
    assert(a == b)
  }

  test("saltedJoin result multiset equals the plain join on a skewed fixture") {
    // 1000 rows on ONE hot key + a cold tail; dim has multiple segments
    val fact = ((1 to 1000).map(i => (7L, i.toLong)) ++
      (1 to 50).map(i => (i.toLong % 5, 10000L + i))).toDF("k", "id")
    val dim = Seq((7L, "hot-seg"), (0L, "a"), (1L, "b"), (2L, "c"))
      .toDF("k", "seg")
    val salted = Skew.saltedJoin(fact, dim, "k", 16, Seq($"id"))
      .select($"k", $"id", $"seg")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      .sorted.toSeq
    val plain = fact.join(dim, Seq("k"))
      .select($"k", $"id", $"seg")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      .sorted.toSeq
    assert(salted == plain)
    // the hot key's fact rows really spread across buckets
    val spread = fact.filter($"k" === 7L)
      .withColumn("__salt", Skew.saltFromContent(16, $"id"))
      .select($"__salt").distinct().count()
    assert(spread > 8)
  }

  test("null spread values fall back to the monotonic id, not one bucket") {
    val df = (1 to 1000).map(_ => ("hot", None: Option[Long])).toDF("k", "v")
    val buckets = df.withColumn("__salt", Skew.salt($"v", 8))
      .select($"__salt").distinct().count()
    assert(buckets > 1, "all null-spread rows hashed into a single bucket")
    // spread-free overload spreads too
    val noSpread = df.withColumn("__salt", Skew.salt(8))
      .select($"__salt").distinct().count()
    assert(noSpread > 1)
  }
}
