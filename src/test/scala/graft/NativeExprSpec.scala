package graft

import graft.functions.GraftFunctions
import graft.ops.Similarity
import org.apache.spark.sql.functions._

/** Native codegen'd expressions must agree exactly with their
  * built-in higher-order-function formulations (which in turn match
  * the DuckDB oracles).
  */
class NativeExprSpec extends SparkSpec {
  import spark.implicits._

  test("native portable hash == HOF portable hash (incl edge cases)") {
    val samples = Seq("", "a", "hello world", "the quick brown fox 123",
      "x" * 500, "punct!@# and spaces  ", "MiXeD Case") ++
      (0 until 200).map(i => new scala.util.Random(i).alphanumeric.take(i % 40).mkString)
    val df = samples.toDF("s")
      .select(col("s"), GraftFunctions.portableHash(col("s")).as("native"),
        GraftFunctions.portableHashHof(col("s")).as("hof"))
    val bad = df.filter(col("native") =!= col("hof")).collect()
    assert(bad.isEmpty, bad.take(3).mkString(","))
  }

  test("graft_topk == window row_number formulation, ties and nulls") {
    import graft.functions.TopKPairsAgg.topkPairs
    val rnd = new scala.util.Random(41)
    // small value range plants plenty of (g, v) ties; some null ids
    val rows = (0L until 3000L).map { i =>
      (i % 7, if (i % 101 == 0) None else Some(rnd.nextInt(40).toLong), i)
    }
    val df = rows.toDF("g", "v", "i")
    val k = 5
    val got = df.groupBy("g").agg(topkPairs(col("v"), col("i"), k).as("top"))
      .select(col("g"), posexplode(col("top")))
      .select(col("g"), col("pos"), col("col.ord"), col("col.id"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getLong(3))).toSet
    val expect = rows.collect { case (g, Some(v), i) => (g, v, i) }
      .groupBy(_._1).flatMap { case (g, es) =>
        es.sortBy(e => (-e._2, e._3)).take(k).zipWithIndex
          .map { case ((_, v, i), pos) => (g, pos, v, i) }
      }.toSet
    assert(got === expect)
  }

  test("driver-side hash twins == column hashes over varied strings") {
    val samples = Seq("", "a", "hello world", "cm|42", "lang:doc_7",
      "x" * 300, "café", "😀 emoji key", // non-BMP: code-point fold
      "mix😀ed中文") ++
      (0 until 200).map(i =>
        new scala.util.Random(1000 + i).alphanumeric.take(i % 50).mkString)
    val df = samples.toDF("s")
      .select(col("s"), GraftFunctions.portableHash(col("s")).as("ph"),
        GraftFunctions.sampleHash(col("s")).as("sh"))
      .collect()
    df.foreach { r =>
      val s = r.getString(0)
      assert(r.getLong(1) === GraftFunctions.portableHashLocal(s), s"ph($s)")
      assert(r.getLong(2) === GraftFunctions.sampleHashLocal(s), s"sh($s)")
    }
  }

  test("native dot == HOF dot, and both survive codegen pipelines") {
    val rnd = new scala.util.Random(7)
    val rows = (0 until 100).map { _ =>
      (Seq.fill(64)(rnd.nextLong() % 1000), Seq.fill(64)(rnd.nextLong() % 1000))
    }
    val df = rows.toDF("a", "b")
      .select(Similarity.dotI(col("a"), col("b")).as("native"),
        Similarity.dotIHof(col("a"), col("b")).as("hof"))
    assert(df.filter(col("native") =!= col("hof")).isEmpty)
  }

  test("bloomMightContain: no false negatives, real pruning, null passthrough") {
    val members = (0L until 2000L).map(_ * 7919L)
    val bytes = graft.functions.NativeExpressions.buildBloomBytes(
      members.toDF("k"), col("k"), 0.01)
    // probe members and non-members through the expression (RDD-backed
    // so the projection actually executes, see CODEGEN_ONLY comment)
    val probe = spark.createDataFrame(spark.sparkContext.parallelize(
      (members.map((_, true)) ++ (1L to 5000L).map(i => (i * 7919L + 3L, false)))
        .map { case (k, m) => Tuple2(k, m) }, 4))
      .toDF("k", "is_member")
      .select(col("is_member"), graft.functions.NativeExpressions
        .bloomMightContain(col("k"), bytes).as("hit"))
    // every inserted key MUST hit — a false negative would let the
    // decontamination prefilter drop a true contamination
    assert(probe.filter(col("is_member") && !col("hit")).isEmpty)
    // and the filter must actually prune: at fpp=0.01 the 5000
    // non-members should pass only rarely (generous 5x bound)
    val fp = probe.filter(!col("is_member") && col("hit")).count()
    assert(fp < 250, s"false-positive count $fp way over fpp bound")
    // null key → null verdict (UnaryExpression default null handling)
    val n = Seq[java.lang.Long](null).toDF("k")
      .select(graft.functions.NativeExpressions.bloomMightContain(col("k"), bytes))
      .collect()
    assert(n(0).isNullAt(0))
    // empty input builds a valid ALL-NEGATIVE filter (stat.bloomFilter
    // NPEs here — the reason buildBloomBytes exists)
    val emptyBytes = graft.functions.NativeExpressions.buildBloomBytes(
      Seq.empty[Long].toDF("k"), col("k"), 0.01)
    val none = Seq(1L, 42L).toDF("k")
      .select(graft.functions.NativeExpressions
        .bloomMightContain(col("k"), emptyBytes).as("hit"))
      .collect().map(_.getBoolean(0))
    assert(none.forall(_ == false))
    // byte-identical probes are structurally equal (content equality —
    // reference equality would defeat subexpression elimination)
    import graft.functions.NativeExpressions.BloomMightContainExpr
    import org.apache.spark.sql.catalyst.expressions.Literal
    assert(BloomMightContainExpr(Literal(1L), bytes.clone()) ==
      BloomMightContainExpr(Literal(1L), bytes.clone()))
  }

  test("CODEGEN_ONLY: native exprs compile and run with fallback disabled") {
    // With factoryMode=CODEGEN_ONLY + codegen.fallback=false, a Janino
    // compile failure in the generated Java is a hard error instead of
    // a silent drop to interpreted execution — this is the regression
    // guard for the static-forwarder path (graft.functions.NativeImpl).
    val conf = spark.conf
    val prevFactory = conf.getOption("spark.sql.codegen.factoryMode")
    val prevFallback = conf.getOption("spark.sql.codegen.fallback")
    conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    conf.set("spark.sql.codegen.fallback", "false")
    try {
      // RDD-backed on purpose: a Seq.toDF is a LocalRelation, and the
      // ConvertToLocalRelation optimizer rule evaluates the projection
      // at plan time — codegen would never run and this test would
      // pass vacuously (verified: a deliberately broken codegen string
      // still passed with toDF, and fails with parallelize).
      val df = spark.createDataFrame(spark.sparkContext.parallelize(Seq(
        ("hello world", Seq(1L, 2L, 3L), Seq(4L, 5L, 6L), Seq(1L, 3L, 5L, 7L), Seq(2L, 3L, 5L, 9L)),
        ("", Seq.empty[Long], Seq(1L), Seq.empty[Long], Seq(1L, 2L))), 1))
        .toDF("s", "a", "b", "sa", "sb")
        .select(
          GraftFunctions.portableHash(col("s")).as("h"),
          graft.functions.NativeExpressions.dotLongNative(col("a"), col("b")).as("dot"),
          graft.functions.NativeExpressions.sortedIntersectSize(col("sa"), col("sb")).as("isz"))
      val rows = df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      import org.apache.spark.unsafe.types.UTF8String
      assert(rows(0)._1 == graft.functions.NativeImpl.portableHash(UTF8String.fromString("hello world")))
      assert(rows(0)._2 == 1 * 4 + 2 * 5 + 3 * 6)
      assert(rows(0)._3 == 2L) // {3,5}
      assert(rows(1) == ((0L, 0L, 0L)))
      // the struct-returning envelope parse compiles under codegen too
      val env = spark.createDataFrame(spark.sparkContext.parallelize(Seq(
        Tuple1("""{"update":{"a":"1"},"key":["k"],"ts":[3,4]}"""),
        Tuple1("nope")), 1))
        .toDF("value")
        .select(graft.functions.NativeExpressions.cdcEnvelopeNative(col("value")).as("env"))
        .select(col("env.ts").getItem(0).as("s"), col("env.update"))
        .collect()
      assert(env(0).getLong(0) == 3L)
      assert(env(1).isNullAt(0))
      // ParamLongExpr sits in every engine emission plan (posLt/posGt
      // bounds): it must codegen, stay unfolded, and filter correctly
      val pos = graft.model.Position(5L, 0L)
      val params = spark.createDataFrame(spark.sparkContext.parallelize(Seq(
        (3L, 1L), (5L, 0L), (7L, 2L), (-1L, 0L)), 1)) // -1 = huge unsigned
        .toDF("step", "txId")
      val below = params
        .filter(graft.order.BatchOrder.posLt(col("step"), col("txId"), pos))
        .collect().map(_.getLong(0)).toSet
      val above = params
        .filter(graft.order.BatchOrder.posGt(col("step"), col("txId"), pos))
        .collect().map(_.getLong(0)).toSet
      assert(below == Set(3L))
      assert(above == Set(7L, -1L))
      // the bloom probe ships its filter via addReferenceObj — it must
      // compile under Janino too (reference-array access, no literal)
      val bf = Seq(42L).toDF("k").stat.bloomFilter(col("k"), 1L, 0.01)
      val bbos = new java.io.ByteArrayOutputStream()
      bf.writeTo(bbos)
      val hits = spark.createDataFrame(spark.sparkContext.parallelize(
        Seq(Tuple1(42L), Tuple1(43L)), 1)).toDF("k")
        .select(graft.functions.NativeExpressions
          .bloomMightContain(col("k"), bbos.toByteArray).as("hit"))
        .collect().map(_.getBoolean(0))
      assert(hits(0))
    } finally {
      prevFactory.fold(conf.unset("spark.sql.codegen.factoryMode"))(v => conf.set("spark.sql.codegen.factoryMode", v))
      prevFallback.fold(conf.unset("spark.sql.codegen.fallback"))(v => conf.set("spark.sql.codegen.fallback", v))
    }
  }

  test("tokenHashSet == array_sort(array_distinct(transform(tokens, phash)))") {
    val rnd = new scala.util.Random(13)
    val samples = Seq("", "   ", "hello hello world", "Punct!@#, and; SPACES",
      "123 abc123 456-def", "unicode Déjà vu ÉLÈVE tokens", "a", "tab\tand\nnewline",
      "ésolo", "ñ", "trailing token ") ++
      (0 until 200).map { _ =>
        (0 until rnd.nextInt(30)).map(_ =>
          rnd.alphanumeric.take(1 + rnd.nextInt(8)).mkString)
          .mkString(Seq(" ", ", ", "; ", "—")(rnd.nextInt(4)))
      }
    val df = samples.toDF("s").select(
      graft.ops.Dedup.tokenHashSet(col("s")).as("native"),
      graft.ops.Dedup.shingleHashes(GraftFunctions.tokens(col("s")), 1).as("hof"))
    val bad = df.filter(col("native") =!= col("hof")).collect()
    assert(bad.isEmpty, bad.take(3).mkString(","))
  }

  test("native minhash sigs == HOF minhash sigs (incl empty-set nulls)") {
    val rnd = new scala.util.Random(17)
    val rows = (0 until 120).map { i =>
      (i.toLong, if (i % 11 == 0) Seq.empty[Long]
        else Seq.fill(1 + rnd.nextInt(60))(rnd.nextLong().abs % GraftFunctions.PhMod))
    }
    val df = rows.toDF("id", "hs")
    val k = 16
    val nat = graft.ops.Dedup.minhashFromHashes(df, col("hs"), k)
    val hof = graft.ops.Dedup.minhashFromHashesHof(df, col("hs"), k)
    val cmp = nat.as("n").join(hof.as("h"), "id")
    (0 until k).foreach { j =>
      val bad = cmp.filter(!(col(s"n.sig_$j") <=> col(s"h.sig_$j"))).count()
      assert(bad == 0, s"sig_$j mismatch on $bad rows")
    }
  }

  test("null propagation") {
    val df = Seq(Option.empty[String], Some("x")).toDF("s")
      .select(GraftFunctions.portableHash(col("s")).as("h"))
    val got = df.collect().map(r => if (r.isNullAt(0)) null else r.getLong(0))
    assert(got(0) == null && got(1) == 120L % GraftFunctions.PhMod)
  }

  test("normalizeText: NFC, NFKC, accent strip semantics under codegen") {
    import graft.functions.NativeExpressions._
    // every non-ASCII char is written as a \\uXXXX escape so the test
    // can never be corrupted by source-file re-encoding; RDD-backed
    // for the same reason as CODEGEN_ONLY above (a LocalRelation
    // would be folded at plan time)
    val pre = "caf\u00e9"            // precomposed e-acute
    val dec = "cafe\u0301"           // decomposed e + combining acute
    val lig = "\ufb01le"             // fi ligature (NFKC-only fold)
    val ess = "stra\u00dfe"          // eszett: untouched by all three
    val stk = "a\u0301\u0327b"      // stacked marks strip to "ab"
    val ast = "ok \ud83d\ude00 ok"  // non-BMP passthrough
    val cases = Seq("plain ascii 42", pre, dec, lig, ess, stk, ast)
    val df = spark.createDataFrame(
        spark.sparkContext.parallelize(cases.zipWithIndex.map(_.swap), 1))
      .toDF("i", "s")
      .select(col("i"), nfcNative(col("s")).as("nfc"),
        nfkcNative(col("s")).as("nfkc"),
        stripAccentsNative(col("s")).as("strip"))
    val got = df.collect()
      .map(r => r.getInt(0) ->
        ((r.getString(1), r.getString(2), r.getString(3)))).toMap
    assert(got(0) == (("plain ascii 42", "plain ascii 42", "plain ascii 42")))
    assert(got(1) == ((pre, pre, "cafe")))
    // decomposed input re-composes under NFC/NFKC, strips to plain
    assert(got(2) == ((pre, pre, "cafe")))
    // the ligature survives NFC but folds to "fi" under NFKC
    assert(got(3) == ((lig, "file", lig)))
    assert(got(4) == ((ess, ess, ess)))
    assert(got(5)._3 == "ab")
    assert(got(6) == ((ast, ast, ast)))
    // null propagates
    val n = Seq(Option.empty[String]).toDF("s")
      .select(nfcNative(col("s"))).collect()
    assert(n(0).isNullAt(0))
  }
}
