package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Direct parity tests for the native signature expressions against the
  * interpreted higher-order-function formulations they replaced — the
  * bit-identical claims in the Scaladoc, verified. */
class HashExpressionsSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, Seq("the", "cat", "sat", "on", "the", "mat")),
    (2L, Seq("a", "b")),                       // shorter than shingleLen
    (3L, Seq("solo")),
    (4L, Seq("the", "cat", "sat", "on", "a", "mat", "today")),
    (5L, Seq.empty[String])
  ).toDF("id", "tk")

  test("SimHash64 is bit-identical to the HOF formulation") {
    val hof = aggregate(
      zip_with(
        aggregate(
          transform($"tk", t => xxhash64(t)),
          array_repeat(lit(0), 64),
          (acc, h) => zip_with(acc, sequence(lit(0), lit(63)),
            (c, j) => c + when(call_function("shiftright", h, j).bitwiseAND(1) === 1, 1)
              .otherwise(-1))),
        sequence(lit(0), lit(63)),
        (c, j) => when(c > 0, call_function("shiftleft", lit(1L), j)).otherwise(lit(0L))),
      lit(0L), (acc, bit) => acc.bitwiseOR(bit))
    val rows = docs.select($"id", HashExpressions.simhash64($"tk").as("native"), hof.as("hof"))
      .collect()
    rows.foreach(r => assert(r.getLong(1) == r.getLong(2), s"id ${r.getLong(0)}"))
  }

  test("HyperplaneBuckets is bit-identical to the HOF formulation and the driver mirror") {
    val vecs = Seq(
      (1L, Seq(0.5f, -1.0f, 2.0f, 0.25f)),
      (2L, Seq(-0.1f, 0.0f, 1.5f, -3.0f))
    ).toDF("id", "v")
    val planes = 6
    val tables = 4
    def planeComponent(table: org.apache.spark.sql.Column, p: org.apache.spark.sql.Column,
        dim: org.apache.spark.sql.Column) =
      shiftrightunsigned(xxhash64(table, p, dim), 11) / lit(4503599627370496.0d) - 1.0d
    def hofBucket(t: Int) = aggregate(
      transform(sequence(lit(0), lit(planes - 1)), p => {
        val proj = aggregate(
          zip_with($"v", sequence(lit(0), size($"v") - 1),
            (x, i) => x * planeComponent(lit(t), p, i)),
          lit(0.0d), (acc, x) => acc + x)
        when(proj >= 0, call_function("shiftleft", lit(1L), p)).otherwise(lit(0L))
      }),
      lit(0L), (acc, bit) => acc.bitwiseOR(bit))
    val hof = array((0 until tables).map(hofBucket): _*)
    val rows = vecs.select($"id", $"v",
      HashExpressions.hyperplane_buckets($"v", planes, tables).as("native"), hof.as("hof"))
      .as[(Long, Seq[Float], Seq[Long], Seq[Long])].collect()
    rows.foreach { case (id, v, native, viaHof) =>
      assert(native == viaHof, s"id $id: $native vs $viaHof")
      (0 until tables).foreach { t =>
        assert(native(t) ==
          HashExpressions.hyperplaneBucketLocal(v.map(_.toDouble), planes, t),
          s"driver mirror diverges for id $id table $t")
      }
    }
  }

  test("MinHashShingles agrees with MinHashSignature over materialized distinct shingles") {
    val withShingles = docs.filter(size($"tk") > 0)
      .select($"id", $"tk", graft.operators.Dedup.shinglesFromTokens($"tk", 3).as("sh"))
    val rows = withShingles.select($"id",
      HashExpressions.minhash_shingles($"tk", 3, 32).as("fused"),
      HashExpressions.minhash_signature($"sh", 32).as("staged"))
      .as[(Long, Seq[Long], Seq[Long])].collect()
    rows.foreach { case (id, fused, staged) =>
      assert(fused == staged, s"id $id: fused and staged signatures diverge")
    }
    // empty token array yields a NULL signature, not a crash
    val empty = docs.filter($"id" === 5L)
      .select(HashExpressions.minhash_shingles($"tk", 3, 32)).head()
    assert(empty.isNullAt(0))
  }

  test("ShingleHashes is the sorted distinct xxhash64 set of the shingle strings") {
    val expected = docs.filter(size($"tk") > 0)
      .select($"id", explode(graft.operators.Dedup.shinglesFromTokens($"tk", 3)).as("s"))
      .select($"id", xxhash64($"s").as("h"))
      .groupBy($"id").agg(sort_array(collect_set($"h")).as("hs"))
    val got = docs.filter(size($"tk") > 0)
      .select($"id", HashExpressions.shingle_hashes($"tk", 3).as("hs"))
    val e = expected.as[(Long, Seq[Long])].collect().toMap
    val g = got.as[(Long, Seq[Long])].collect().toMap
    assert(g == e)
  }

  test("non-nullable input: signatures codegen-compile, empty arrays yield NULL") {
    // A non-nullable array child is the path ADVICE r2 flagged: the three
    // NULL-producing expressions must declare nullable=true themselves, or
    // codegen emits an unassignable `false = true;` and the interpreted
    // fallback hands a null to a projection that declared non-nullable.
    val nn = spark.range(3).select(
      slice(array(lit("a"), lit("b"), lit("c")), lit(1), $"id".cast("int")).as("tk"))
    assert(!nn.schema("tk").nullable,
      "fixture must be non-nullable to exercise the flagged path")
    val out = nn.select(
      HashExpressions.minhash_signature($"tk", 8).as("sig"),
      HashExpressions.minhash_shingles($"tk", 2, 8).as("fused"),
      HashExpressions.shingle_hashes($"tk", 2).as("hs")).collect()
    // id=0 → empty array → NULL from all three; id>0 → non-null signatures
    assert(out(0).isNullAt(0) && out(0).isNullAt(1) && out(0).isNullAt(2))
    assert((1 until 3).forall(i => !out(i).isNullAt(0) && !out(i).isNullAt(1) &&
      !out(i).isNullAt(2)))
  }

  test("SignatureAgreement matches the zip_with formulation") {
    val sigs = Seq(
      (Seq(1L, 2L, 3L, 4L), Seq(1L, 9L, 3L, 7L)),  // 2/4 agree
      (Seq(5L, 5L), Seq(5L, 5L)),                  // all agree
      (Seq(1L, 2L), Seq(3L, 4L))                   // none agree
    ).toDF("a", "b")
    val hof = size(filter(zip_with($"a", $"b", (x, y) => x === y), identity(_))) /
      size($"a").cast("double")
    val rows = sigs.select(
      HashExpressions.signature_agreement($"a", $"b").as("native"), hof.as("hof"))
      .as[(Double, Double)].collect()
    rows.foreach { case (n, h) => assert(n == h, s"$n vs $h") }
  }
}
