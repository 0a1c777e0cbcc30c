package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Fnv1a64
import graft.operators.{Dedup, Multimodal, Similarity, TextAnalysis}

class LlmOpsSpec extends AnyFunSuite {
  import TestSpark._

  test("fnv1a64 matches the FNV-1a reference vectors") {
    // public FNV test vectors (http://www.isthe.com/chongo/tech/comp/fnv/)
    assert(Fnv1a64.hashBytes("".getBytes("UTF-8")) == 0xcbf29ce484222325L)
    assert(Fnv1a64.hashBytes("a".getBytes("UTF-8")) == 0xaf63dc4c8601ec8cL)
    assert(Fnv1a64.hashBytes("foobar".getBytes("UTF-8")) == 0x85944171f73967e8L)
  }

  test("text_fingerprint native expression equals the scala impl") {
    val rows = TextAnalysis.textFingerprint(Tables.documents(spark, sf))
      .join(Tables.documents(spark, sf), "doc_id")
      .select(col("text"), col("fingerprint")).limit(20).collect()
    rows.foreach { r =>
      assert(r.getLong(1) == Fnv1a64.hashBytes(r.getString(0).getBytes("UTF-8")))
    }
  }

  test("minhash LSH finds all exact-duplicate token sets (jaccard 1.0)") {
    val docs = Tables.documents(spark, sf)
    val truth = Dedup.ngramJaccard(docs, n = 1, threshold = 1.0)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val found = Dedup.minhashLsh(docs, threshold = 1.0)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // identical token sets ⇒ identical signatures ⇒ all bands collide
    val missedWithinBlock = (truth -- found)
    assert(missedWithinBlock.isEmpty,
      s"LSH missed ${missedWithinBlock.size} exact-set dups")
  }

  test("simhash is order-invariant and hamming-0 on permuted tokens") {
    import spark.implicits._
    val df = Seq(
      (1L, "alpha beta gamma delta"),
      (2L, "delta gamma beta alpha"),
      (3L, "totally different words here entirely now")).toDF("doc_id", "text")
    val sims = Dedup.simhash(df).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sims(1L) == sims(2L))
    assert(sims(1L) != sims(3L))
  }

  test("lsh ANN recall@5 vs brute force is reasonable") {
    val emb = Tables.embeddings(spark, sf)
    val exact = Similarity.bruteForceTopK(emb).select("probe_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Similarity.lshTopK(emb).select("probe_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.2, s"LSH recall too low: $recall") // 6 planes, 64 buckets
  }

  test("vec_dot equals the interpreted column fold bit-for-bit") {
    import spark.implicits._
    val emb = Tables.embeddings(spark, sf)
    val base = emb.select(col("vec_id"),
      expr("transform(embedding, x -> cast(x as double))").as("v")).limit(50)
    val both = base.select(
      call_function("vec_dot", col("v"), col("v")).as("native"),
      aggregate(zip_with(col("v"), col("v"), (p, q) => p * q),
        lit(0.0), (acc, x) => acc + x).as("folded"))
      .collect()
    assert(both.nonEmpty)
    both.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)),
        s"native ${r.getDouble(0)} != folded ${r.getDouble(1)}")
    }
    // null semantics: mismatched lengths and null elements → null
    val edge = Seq(
      (Some(Seq(1.0, 2.0)), Some(Seq(1.0))),
      (None: Option[Seq[Double]], Some(Seq(1.0)))).toDF("a", "b")
      .select(call_function("vec_dot", col("a"), col("b")).as("d"))
      .collect()
    assert(edge.forall(_.isNullAt(0)))
    // SQL path through GraftExtensions
    assert(spark.sql("SELECT vec_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d")
      .head().getDouble(0) == 11.0)
  }

  test("embedding LSH pairs: precise, decent recall vs exact pairs, no cartesian") {
    val emb = Tables.embeddings(spark, sf)
    val threshold = 0.35
    val lsh = operators.Dedup.embeddingLshPairs(emb, threshold)
    // precision is exact by construction (candidates are verified) — check it
    val rows = lsh.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Double]("cosine") >= threshold))
    // recall vs ALL exact pairs (label-free ground truth, tiny at test SF)
    val base = emb.select(col("vec_id"),
      expr("transform(embedding, x -> cast(x as double))").as("v"))
    val exact = base.as("a").join(base.as("b"),
        col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
        Similarity.cosine(col("a.v"), col("b.v")).as("cosine"))
      .filter(col("cosine") >= threshold)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = rows.map(r => (r.getAs[Long]("vec_a"), r.getAs[Long]("vec_b"))).toSet
    assert(got.subsetOf(exact), "LSH pair outside the exact pair set")
    val recall = (exact & got).size.toDouble / exact.size
    assert(recall >= 0.4, s"embedding LSH recall too low: $recall")
    // the operator itself must never plan an all-pairs join
    val plan = lsh.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"),
      s"embedding LSH planned a cartesian product:\n$plan")
  }

  test("ivf ANN is deterministic with recall above the LSH path") {
    val emb = Tables.embeddings(spark, sf)
    val exact = Similarity.bruteForceTopK(emb).select("probe_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf1 = operators.Ivf.ivfTopK(emb).select("probe_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf2 = operators.Ivf.ivfTopK(emb).select("probe_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(ivf1 == ivf2, "IVF result not deterministic")
    val recall = (exact & ivf1).size.toDouble / exact.size
    assert(recall >= 0.3, s"IVF recall too low: $recall")
  }

  test("multimodal resize preserves aspect and frame sampling respects rate") {
    import spark.implicits._
    val media = Multimodal.withPayload(Tables.documents(spark, sf))
      .as[Multimodal.MediaRow]
    val decoded = Multimodal.decodeAll(media)
    val resized = Multimodal.resizeMeta(decoded, maxDim = 256).collect()
    assert(resized.forall(m => m.width <= 256 && m.height <= 256))
    val frames = Multimodal.frameSample(decoded, rate = 30).collect()
    assert(frames.nonEmpty)
    assert(frames.forall(_.frame_index % 30 == 0))
    val byDoc = frames.groupBy(_.doc_id)
    val nf = decoded.filter(_.media_type == "video").collect()
      .map(m => m.doc_id -> m.n_frames).toMap
    byDoc.foreach { case (id, fs) =>
      assert(fs.length == (nf(id) + 29) / 30)
    }
  }

  test("multimodal decode is deterministic and schema-stable") {
    val out = Multimodal.pipeline(spark, sf)
    val rows = out.collect()
    assert(rows.map(_.getAs[String]("media_type")).toSet == Set("image", "audio", "video"))
    val again = Multimodal.pipeline(spark, sf).collect()
    assert(rows.map(_.toString).sorted.sameElements(again.map(_.toString).sorted))
  }

  test("approx_count_distinct is within the HLL error bound") {
    import org.apache.spark.sql.functions.{approx_count_distinct, countDistinct}
    val events = Tables.events(spark, sf)
    // test the RAW sketch against exact counts (the registered query
    // only exposes the bounded flag, so reading it back here would be
    // exact-vs-exact and vacuous)
    val both = events.groupBy(col("event_type"))
      .agg(approx_count_distinct(col("user_id"), rsd = 0.02).as("a"),
        countDistinct(col("user_id")).as("e"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(both.nonEmpty)
    both.foreach { case (k, a, e) =>
      assert(math.abs(a - e).toDouble / e < 0.1, s"$k: approx=$a exact=$e")
    }
    // and the registered query's flag must agree
    val flags = operators.Analytics.eventsApproxUsers(events)
      .collect().map(r => r.getString(0) -> r.getBoolean(3)).toMap
    assert(flags.values.forall(identity), s"bound flag false: $flags")
  }

  test("hash_sample is deterministic, bounded, and a subset of the group") {
    val docs = Tables.documents(spark, sf)
    def run(parts: Int): Map[String, Seq[String]] =
      TextAnalysis.docsSamplePerLang(docs.repartition(parts)).collect()
        .map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    val a = run(1)
    val b = run(16)
    assert(a == b, "sample depends on partitioning")
    val sizes = docs.groupBy(col("lang")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val ids = docs.select(col("lang"), col("doc_id").cast("string"))
      .collect().groupBy(_.getString(0))
      .view.mapValues(_.map(_.getString(1)).toSet).toMap
    a.foreach { case (lang, sample) =>
      assert(sample.size == math.min(3, sizes(lang)))
      assert(sample.toSet.subsetOf(ids(lang)))
    }
    // SQL path through GraftExtensions
    docs.createOrReplaceTempView("docs_ext_test")
    val viaSql = spark.sql(
      "SELECT lang, hash_sample(CAST(doc_id AS STRING), 3) s FROM docs_ext_test GROUP BY lang")
      .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    assert(viaSql == a)
  }

  test("ngram repetition stats are exact on a crafted doc") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b a b c"),   // bigrams: "a b"×2, "b a", "b c"
      (2L, "x y z"),       // all distinct
      (3L, "w"))           // <2 tokens → no bigram row
      .toDF("doc_id", "text")
    val out = TextAnalysis.ngramRepetition(docs)
      .orderBy("doc_id").collect()
    assert(out.length == 2)
    val r1 = out(0)
    assert(r1.getAs[Long]("n_bigrams") == 4 &&
      r1.getAs[Long]("n_distinct_bigrams") == 3 &&
      r1.getAs[Long]("top_bigram_count") == 2 &&
      r1.getAs[Long]("dup_bigram_tokens") == 2 &&
      r1.getAs[Double]("dup_fraction") == 0.5 &&
      r1.getAs[Double]("top_share") == 0.5)
    val r2 = out(1)
    assert(r2.getAs[Long]("n_bigrams") == 2 &&
      r2.getAs[Long]("dup_bigram_tokens") == 0 &&
      r2.getAs[Double]("dup_fraction") == 0.0)
  }

  test("corpus source stats count dedup pressure exactly") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta", "web", "en"),
      (2L, "alpha beta", "web", "en"),  // exact dup of 1
      (3L, "gamma", "web", "en"),
      (4L, "delta epsilon zeta", "books", "en"))
      .toDF("doc_id", "text", "source", "lang")
    val out = TextAnalysis.corpusSourceStats(docs)
      .orderBy("source", "lang").collect()
    assert(out.length == 2)
    val books = out(0)
    assert(books.getAs[Long]("n_docs") == 1 &&
      books.getAs[Long]("total_ws_tokens") == 3 &&
      books.getAs[Double]("dup_ratio") == 0.0)
    val web = out(1)
    assert(web.getAs[Long]("n_docs") == 3 &&
      web.getAs[Long]("distinct_texts") == 2 &&
      web.getAs[Long]("total_ws_tokens") == 5 &&
      web.getAs[Double]("dup_ratio") == (1.0 - 2.0 / 3.0))
  }

  test("corpus encode assigns frequency-ranked ids in document order") {
    import spark.implicits._
    // cf: b=3 (id 1), a=2 (id 2), c=1 (id 3)
    val docs = Seq((1L, "b a b"), (2L, "a b c")).toDF("doc_id", "text")
    val out = TextAnalysis.corpusEncode(docs).orderBy("doc_id").collect()
    assert(out(0).getAs[String]("ids_csv") == "1-2-1")
    assert(out(1).getAs[String]("ids_csv") == "2-1-3")
    assert(out.map(_.getAs[Long]("n_tokens")).toSeq == Seq(3L, 3L))
  }

  test("corpus split is deterministic with sane proportions") {
    val docs = Tables.documents(spark, sf)
    val s1 = TextAnalysis.corpusSplit(docs).collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    val s2 = TextAnalysis.corpusSplit(docs).collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(s1 == s2)
    val n = s1.size.toDouble
    val train = s1.values.count(_ == "train") / n
    assert(train > 0.8 && train < 0.97, s"train fraction $train")
    assert(s1.values.toSet.subsetOf(Set("train", "val", "test")))
  }

  test("dedup_exact keeps one keeper per distinct content") {
    val docs = Tables.documents(spark, sf)
    val n = docs.select(Dedup.normText(col("text"))).distinct().count()
    assert(Dedup.exact(docs).count() == n)
  }

  test("audio segments: contiguous indexes, half-window hops, 1s windows") {
    val segs = graft.operators.Multimodal.segments(spark, sf).collect()
      .groupBy(_.getLong(0))
    assert(segs.nonEmpty)
    segs.foreach { case (doc, rows) =>
      val sorted = rows.sortBy(_.getInt(1))
      val rate = sorted.head.getInt(2)
      assert(Set(8000, 16000, 44100).contains(rate))
      sorted.zipWithIndex.foreach { case (r, i) =>
        assert(r.getInt(1) == i, s"doc $doc indexes not contiguous")
        assert(r.getLong(3) == i.toLong * rate / 2, s"doc $doc hop wrong")
        assert(r.getLong(4) == rate.toLong, s"doc $doc window != 1s")
      }
      assert(sorted.length % 2 == 1, s"doc $doc: 2*seconds-1 segments expected")
    }
  }

  test("ivf-pq: 4-byte codes still rank true neighbors near the top") {
    val emb = Tables.embeddings(spark, sf)
    val pq = graft.operators.Pq.ivfPqTopK(emb).collect()
      .groupBy(_.getLong(0))
      .map { case (p, rows) => p -> rows.sortBy(_.getInt(1)).map(_.getLong(2)).toSeq }
    assert(pq.nonEmpty)
    pq.values.foreach(l => assert(l.size <= graft.operators.Pq.K))
    // recall@5 of the quantized scores vs exact brute force: PQ throws
    // away 127/128 of each vector, so demand only a loose floor
    val exact = graft.operators.Similarity.bruteForceTopK(emb)
      .collect().groupBy(_.getLong(0))
      .map { case (p, rows) => p -> rows.sortBy(_.getInt(1)).map(_.getLong(2)).toSet }
    val recalls = pq.collect { case (p, l) if exact.contains(p) =>
      l.count(exact(p)).toDouble / exact(p).size }
    val mean = recalls.sum / recalls.size
    // 8-entry codebooks on a ~50-vector fixture are VERY coarse; the
    // assertion is "signal survives", not quality — exactness is the
    // oracle's job, quality tuning is Ksub/M sizing at real scale
    assert(mean > 0.0, s"mean recall@5 $mean — quantization lost everything")
    // scores are approximations of cosine: all within [-1.5, 1.5]
    graft.operators.Pq.ivfPqTopK(emb).collect().foreach { r =>
      val c = r.getDouble(3)
      assert(c > -1.5 && c < 1.5, s"wild pq score $c")
    }
  }

  test("incremental dedup agrees with the full-corpus LSH pairs") {
    val docs = Tables.documents(spark, sf)
    val bucketOf = docs.select(col("doc_id"),
      pmod(graft.functions.Fingerprint.fnv1a64(spark,
        Dedup.normText(col("text"))), lit(100L)).as("b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val inBatch = (id: Long) => bucketOf(id) >= 80
    val pairs = Dedup.minhashLsh(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet // doc_a < doc_b
    val inc = Dedup.incrementalDedup(docs).collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(2)) None else Some(r.getLong(2)))).toMap
    // every batch doc appears exactly once
    assert(inc.keySet == bucketOf.keySet.filter(inBatch))
    // a batch doc is dup iff some full-corpus pair links it to an index
    // doc or an earlier batch doc
    val expectDup = inc.keysIterator.map { id =>
      id -> pairs.exists { case (a, b) =>
        (b == id && (!inBatch(a) || a < id)) || (a == id && !inBatch(b))
      }
    }.toMap
    inc.foreach { case (id, dupOf) =>
      assert(dupOf.isDefined == expectDup(id),
        s"doc $id: incremental=${dupOf.isDefined} full=${expectDup(id)}")
      dupOf.foreach { o =>
        val p = (math.min(id, o), math.max(id, o))
        assert(pairs.contains(p), s"pair $p not in full LSH output")
      }
    }
  }

  test("embedding decontamination covers the eval slice with consistent flags") {
    val emb = Tables.embeddings(spark, sf)
    val rows = operators.Decontaminate.embeddingContamination(emb).collect()
    val nEval = emb.filter(col("vec_id") % 20 === 0).count()
    assert(rows.length == nEval) // one verdict per eval vector, match or not
    rows.foreach { r =>
      val evalId = r.getAs[Long]("eval_id")
      assert(evalId % 20 == 0)
      val contaminated = r.getAs[Boolean]("is_contaminated")
      val maxCos = Option(r.getAs[java.lang.Double]("max_cosine"))
      assert(contaminated == maxCos.isDefined)
      maxCos.foreach(c => assert(c >= 0.35 && c <= 1.0 + 1e-9))
      assert(r.getAs[Long]("n_matches") >= (if (contaminated) 1 else 0))
    }
  }

  test("substring dedup finds shared 15-word spans and only those") {
    import spark.implicits._
    val span = (1 to 15).map(i => s"shared$i").mkString(" ")
    val df = Seq(
      (1L, s"$span tail one ends here with unique words aa bb cc dd ee"),
      (2L, s"prefix words totally different here $span"),
      (3L, (1 to 30).map(i => s"solo$i").mkString(" ")),
      (4L, "too short to have any gram at all")).toDF("doc_id", "text")
    val out = operators.SubstringDedup.substringDupStats(df)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_grams"), r.getAs[Long]("n_dup_grams"),
          r.getAs[Long]("dup_ppm"))).toMap
    // doc 4 has < K tokens: excluded entirely
    assert(!out.contains(4L))
    // docs 1 and 2 share exactly ONE 15-gram (the span itself: every
    // other window in either doc mixes span and non-span words)
    assert(out(1L)._2 == 1 && out(2L)._2 == 1)
    assert(out(3L)._2 == 0 && out(3L)._3 == 0)
    // doc 2 has 20 tokens -> 6 grams; 1 duplicated -> 166666 ppm
    assert(out(2L)._1 == 6 && out(2L)._3 == 166666L)
  }

  test("substring dedup: verbatim duplicate docs are 100% covered") {
    import spark.implicits._
    val text = (1 to 40).map(i => s"w$i").mkString(" ")
    val df = Seq((10L, text), (11L, text)).toDF("doc_id", "text")
    val out = operators.SubstringDedup.substringDupStats(df).collect()
    assert(out.length == 2)
    out.foreach { r =>
      assert(r.getAs[Long]("n_grams") == 26)
      assert(r.getAs[Long]("n_dup_grams") == 26)
      assert(r.getAs[Long]("dup_ppm") == 1000000L)
    }
  }

  test("bigram LM predictability matches hand-computed MLE counts") {
    import spark.implicits._
    // corpus: c(a,b)=2 c(b,a)=1 c(a,c)=1 -> c(a,.)=3 c(b,.)=1
    // p_ppm: ab = 2e6 div 3 = 666666; ba = 1e6; ac = 1e6 div 3 = 333333
    val df = Seq((1L, "a b a b"), (2L, "a c")).toDF("doc_id", "text")
    val out = operators.LmScore.lmPredictability(df)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_bigrams"), r.getAs[Long]("pred_sum_ppm"),
          r.getAs[Long]("pred_avg_ppm"))).toMap
    assert(out(1L) == ((3L, 2 * 666666L + 1000000L, 777777L)))
    assert(out(2L) == ((1L, 333333L, 333333L)))
  }

  test("lm predictability ranks formulaic text above shuffled text") {
    val docs = Tables.documents(spark, sf)
    val out = operators.LmScore.lmPredictability(docs)
    // every doc with >=2 tokens is scored, scores lie in (0, 1e6]
    val rows = out.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val avg = r.getAs[Long]("pred_avg_ppm")
      assert(avg >= 0 && avg <= 1000000L)
    }
  }

  test("corpus funnel: cumulative stages and canonical-among-survivors") {
    import spark.implicits._
    val good = ("alpha beta gamma delta epsilon zeta eta theta " * 4).trim // 32 toks, all distinct per window? (repeats!)
    // distinct*2 > total requires mostly-unique tokens: build one
    val uniq = (1 to 30).map(i => s"word$i").mkString(" ") + " " + "x" * 80
    val df = Seq(
      // survives all stages
      (1L, uniq, "en", uniq.length.toLong),
      // duplicate of 1 but fails lang: canonical must still keep doc 1
      (0L, uniq, "fr", uniq.length.toLong),
      // fails length gate
      (2L, "short en doc", "en", 12L),
      // fails repetition (one token repeated)
      (3L, ("dup " * 60).trim, "en", 239L),
      // not english
      (4L, uniq + " autre", "fr", 300L)).toDF("doc_id", "text", "lang", "n_chars")
    val out = operators.CorpusFunnel.funnel(df)
      .collect().map(r => r.getAs[String]("stage") ->
        (r.getAs[Long]("docs"), r.getAs[Long]("tokens"))).toMap
    assert(out("all")._1 == 5)
    assert(out("lang_en")._1 == 3)       // docs 1, 2, 3
    assert(out("len_ok")._1 == 2)        // doc 2 out (12 chars)
    assert(out("low_repetition")._1 == 1) // doc 3 out
    // doc 0 shares doc 1's digest but is NOT a survivor; doc 1 is kept
    assert(out("exact_canonical")._1 == 1)
    assert(out("exact_canonical")._2 == out("low_repetition")._2)
  }

  test("pair curation: decisions partition the corpus, one reason each") {
    val docs = Tables.documents(spark, sf)
    val emb = Tables.embeddings(spark, sf)
    val out = Multimodal.pairCuration(docs, emb).collect()
    // the funnel partitions the corpus exactly: Σ n_pairs == |docs|
    assert(out.map(_.getLong(2)).sum == docs.count())
    val decisions = out.map(_.getString(1)).toSet
    assert(decisions.subsetOf(Set("kept", "drop_not_image",
      "drop_caption_len", "drop_dup_payload", "drop_no_embedding",
      "drop_low_alignment")))
    // the fixture must exercise the keep branch and the modality drop
    assert(decisions.contains("kept") && decisions.contains("drop_not_image"))
    // non-image pairs can never be kept: kept count ≤ image share
    val kept = out.filter(_.getString(1) == "kept").map(_.getLong(2)).sum
    val images = docs.filter(col("doc_id") % 3 === 0).count()
    assert(kept <= images)
  }

  test("bm25 top-k ranks are dense with non-increasing scores") {
    val out = operators.Bm25.bm25TopK(Tables.documents(spark, sf))
      .orderBy(col("rank")).collect()
    assert(out.length == operators.Bm25.TopK)
    assert(out.map(_.getAs[Int]("rank")).toSeq == (1 to operators.Bm25.TopK))
    val scores = out.map(_.getAs[Double]("score"))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    out.foreach { r =>
      val n = r.getAs[Long]("n_terms")
      assert(n >= 1 && n <= operators.Bm25.QTerms)
      assert(r.getAs[Double]("score") > 0.0)
    }
  }
}
