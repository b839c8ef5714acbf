package graft

class TrainingPipelineSpec extends SparkSpecBase {

  test("q109 stratified mix keeps per-language fractions near the gate weights") {
    val docs = graft.sources.Tables.documents(spark, sf001)
    val totals = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val kept = SparkEntry.queries("q109_stratified_mix")(spark, sf001)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val weights = Map("en" -> 0.9, "es" -> 0.5, "de" -> 0.5, "fr" -> 0.25, "zh" -> 0.125)
    weights.foreach { case (lang, w) =>
      val n = totals.getOrElse(lang, 0L)
      if (n >= 8) {
        val frac = kept.getOrElse(lang, 0L).toDouble / n
        // 16-bit hash gate; small-sample tolerance via a binomial bound
        val tol = 4 * math.sqrt(w * (1 - w) / n)
        assert(math.abs(frac - w) <= tol, s"$lang kept=$frac want=$w±$tol (n=$n)")
      }
    }
  }

  test("q109 sampling is join-stable: same doc_id always samples identically") {
    val once = SparkEntry.queries("q109_stratified_mix")(spark, sf001)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val again = SparkEntry.queries("q109_stratified_mix")(spark, sf001)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(once == again && once.nonEmpty)
  }

  test("q110 split is a partition: every doc in exactly one split, ratios sane") {
    val rows = SparkEntry.queries("q110_train_split")(spark, sf001).collect()
    val total = graft.sources.Tables.documents(spark, sf001).count()
    assert(rows.length == total)
    val bySplit = rows.groupBy(_.getString(2)).view.mapValues(_.length).toMap
    assert(bySplit.keySet.subsetOf(Set("train", "val", "test")))
    assert(bySplit.getOrElse("train", 0) > bySplit.getOrElse("val", 0))
    assert(bySplit.getOrElse("val", 0) >= bySplit.getOrElse("test", 0) / 2,
      s"split sizes: $bySplit")
  }

  test("q111 packing: offsets are contiguous per shard stream and spans are exact") {
    val rows = SparkEntry.queries("q111_pack_sequences")(spark, sf001).collect()
      .map(r => (r.getString(1), r.getString(2), r.getLong(0), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7)))
    assert(rows.nonEmpty)
    rows.groupBy(t => (t._1, t._2)).foreach { case ((lang, shard), docs) =>
      val ordered = docs.sortBy(_._3)
      // stream property: each doc starts where the previous one ended
      ordered.foldLeft(0L) { case (expectedStart, (_, _, id, nTok, start, first, last, nSeqs)) =>
        assert(start == expectedStart, s"$lang/$shard doc $id start=$start want=$expectedStart")
        assert(first == start / 2048 && last == (start + nTok - 1) / 2048,
          s"$lang/$shard doc $id span wrong")
        assert(nSeqs == last - first + 1 && nSeqs >= 1)
        start + nTok
      }
    }
  }

  test("q112 corpus card: rollup levels are consistent (sources sum to language)") {
    val rows = SparkEntry.queries("q112_corpus_card")(spark, sf001).collect()
    val grand = rows.filter(r => r.isNullAt(0) && r.isNullAt(1))
    assert(grand.length == 1)
    val langTotals = rows.filter(r => !r.isNullAt(0) && r.isNullAt(1))
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    val leafSums = rows.filter(r => !r.isNullAt(0) && !r.isNullAt(1))
      .groupBy(_.getString(0)).view.mapValues(_.map(_.getLong(2)).sum).toMap
    assert(langTotals == leafSums, s"lang=$langTotals leaves=$leafSums")
    assert(grand.head.getLong(2) == langTotals.values.sum)
  }

  test("q148 epoch shuffle: global_pos is a permutation; seeds give independent orders") {
    val e1 = SparkEntry.queries("q148_epoch_shuffle")(spark, sf001).collect()
    val n = e1.length
    // exact global order: positions are 1..n with no gaps or ties
    assert(e1.map(_.getAs[Long]("global_pos")).sorted.toSeq === (1L to n.toLong))
    // per-shard positions are 1..|shard| under the shard's own order
    val byShard = e1.groupBy(_.getAs[String]("shard"))
    byShard.values.foreach { rs =>
      assert(rs.map(_.getAs[Long]("pos")).sorted.toSeq === (1L to rs.length.toLong))
    }
    // a different epoch seed reorders most documents...
    val e2 = graft.operators.TrainingPipeline
      .epochShuffleFor(spark, sf001, "ep2").collect()
    val p1 = e1.map(r => r.getLong(0) -> r.getAs[Long]("global_pos")).toMap
    val p2 = e2.map(r => r.getLong(0) -> r.getAs[Long]("global_pos")).toMap
    val moved = p1.keys.count(k => p1(k) != p2(k))
    assert(moved > n / 2, s"ep2 must reorder most docs, moved only $moved/$n")
    // ...while the same seed reproduces bit for bit (the orderBy(rand())
    // failure mode this operator exists to avoid)
    val e1b = graft.operators.TrainingPipeline
      .epochShuffleFor(spark, sf001, "ep1").collect()
    assert(e1.map(_.toSeq).toSeq === e1b.map(_.toSeq).toSeq)
  }

  test("q149 split leakage: planted train↔eval duplicate scores 1.0, unique doc 0.0") {
    import org.apache.spark.sql.functions.col
    // derive split membership the same way the operator does: first two
    // md5 hex chars of the decimal doc_id
    def bucket(id: Long): String = {
      val d = java.security.MessageDigest.getInstance("MD5")
      d.digest(id.toString.getBytes("UTF-8"))
        .take(1).map(b => f"$b%02x").mkString
    }
    def split(id: Long): String = {
      val b = bucket(id)
      if (b < "0d") "test" else if (b < "27") "val" else "train"
    }
    val trainId = (1L to 1000L).find(split(_) == "train").get
    val evalDup = (1L to 1000L).find(split(_) != "train").get
    val evalUniq = (evalDup + 1 to 1000L).find(split(_) != "train").get
    val dupText = "alpha beta gamma delta epsilon zeta eta theta"
    val docs = Seq(
      (trainId, dupText, "en", "s1", dupText.length.toLong),
      (evalDup, dupText, "en", "s1", dupText.length.toLong),
      (evalUniq, "one unique sentence that shares no five gram with train",
        "en", "s1", 55L))
    val dir = java.nio.file.Files.createTempDirectory("graft_leak").toString
    import spark.implicits._
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(dir + "/documents.parquet")
    val got = SparkEntry.queries("q149_split_leakage")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getAs[Double]("leak_frac")).toMap
    assert(got(evalDup) === 1.0, s"exact duplicate of a train doc must fully leak: $got")
    assert(got(evalUniq) === 0.0, s"unique eval doc must not leak: $got")
    assert(!got.contains(trainId), "train docs are not audited rows")
  }

  test("q157: over-quota sources downsample to the cap, supply never exceeded") {
    val rows = SparkEntry.queries("q157_source_quota_cap")(spark, sf001).collect()
    assert(rows.nonEmpty)
    val tAll = rows.map(_.getLong(1)).sum
    val cap = tAll * 30 / 1000
    rows.foreach { r =>
      val (src, tSrc, keptTok) = (r.getString(0), r.getLong(1), r.getLong(3))
      assert(keptTok <= tSrc, s"$src kept more than its supply")
      if (tSrc <= cap / 2)
        assert(keptTok === tSrc, s"$src under quota must survive whole")
      // hash-gate noise: kept mass lands near min(supply, cap)
      val want = math.min(tSrc, cap)
      assert(math.abs(keptTok - want) <= math.max(1500L, want / 2),
        s"$src kept=$keptTok target=$want")
    }
    // the cap actually bites somewhere on this corpus (every source
    // holds ~5% > 3% of tokens)
    assert(rows.exists(r => r.getLong(3) < r.getLong(1)),
      "no source was capped — fixture no longer exercises the quota")
  }

  test("q166: top-10 passages are valid chunks, scores positive and ranked") {
    val rows = SparkEntry.queries("q166_chunk_retrieval")(spark, sf001).collect()
    assert(rows.length === 10)
    val scores = rows.map(_.getDouble(2))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b },
      "scores must be non-increasing")
    assert(scores.head > 0, "best passage must actually hit a query term")
    // every returned (doc, chunk) exists in the q122 chunk table
    val chunks = SparkEntry.queries("q122_chunk_documents")(spark, sf001)
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    rows.foreach(r => assert(chunks.contains((r.getLong(0), r.getInt(1)))))
  }

  test("q162: audit is consistent with q111's packing row for row") {
    import org.apache.spark.sql.functions.col
    val audit = SparkEntry.queries("q162_packing_audit")(spark, sf001)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))).toMap
    val packed = SparkEntry.queries("q111_pack_sequences")(spark, sf001)
      .select("lang", "shard", "n_tok", "n_seqs").collect()
      .groupBy(r => (r.getString(0), r.getString(1)))
    assert(audit.keySet === packed.keySet)
    packed.foreach { case (key, rows) =>
      val (nDocs, totalTok, nSeqs, tailWaste, nStraddle) = audit(key)
      assert(nDocs === rows.length)
      assert(totalTok === rows.map(_.getLong(2)).sum)
      assert(nSeqs === (totalTok + 2047) / 2048)
      assert(tailWaste === nSeqs * 2048 - totalTok && tailWaste < 2048)
      assert(nStraddle === rows.count(_.getLong(3) > 1))
    }
  }

  test("q163: fertility ratios recompute exactly from the reported sums") {
    val rows = SparkEntry.queries("q163_tokenizer_fertility")(spark, sf001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (ws, pieces) = (r.getLong(2), r.getLong(3))
      assert(ws > 0 && pieces > 0)
      assert(r.getLong(4) === pieces * 1000000L / ws)
      assert(r.getLong(4) > 0 && r.getLong(5) > 0)
    }
  }

  test("q155: global_pos is a permutation; within-shard bins are quality-monotone deciles") {
    import org.apache.spark.sql.functions.col
    val rows = SparkEntry.queries("q155_curriculum_order")(spark, sf001)
      .collect()
    val n = rows.length
    assert(n > 0)
    // global_pos is exactly 1..N, each once — a trainer can ORDER BY it
    assert(rows.map(_.getLong(3)).sorted.toSeq === (1L to n).toSeq)
    assert(rows.forall(r => r.getInt(2) >= 0 && r.getInt(2) <= 9))
    // quality-monotone within shard: every doc in bin b scores >= every
    // doc in bin b+1 of the same shard (ties allowed — doc_id breaks them)
    val logits = graft.sources.Tables.documents(spark, sf001)
      .select(col("doc_id"),
        graft.operators.QualityGate.logitOf(
          org.apache.spark.sql.graftshim.CharGramVector(
            col("text"), graft.operators.TextVector.dim)).as("logit"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    rows.groupBy(_.getString(1)).foreach { case (shard, rs) =>
      val byBin = rs.groupBy(_.getInt(2)).view
        .mapValues(_.map(r => logits(r.getLong(0)))).toMap
      for (b <- 0 until 9 if byBin.contains(b) && byBin.contains(b + 1))
        assert(byBin(b).min >= byBin(b + 1).max,
          s"shard $shard: bin $b not dominating bin ${b + 1}")
      // decile sizes within a shard differ by at most one
      val sizes = rs.groupBy(_.getInt(2)).values.map(_.length)
      assert(sizes.max - sizes.min <= 1, s"shard $shard sizes $sizes")
    }
  }

  test("q176: coverage curve is monotone and saturates at the vocabulary") {
    val rows = SparkEntry.queries("q176_vocab_coverage")(spark, sf001)
      .collect().sortBy(_.getInt(0))
    assert(rows.nonEmpty)
    val total = rows.head.getLong(2)
    val vocab = rows.head.getLong(4)
    rows.foreach { r =>
      assert(r.getLong(1) <= total)
      assert(r.getLong(2) === total && r.getLong(4) === vocab)
      // any k at or beyond the vocabulary covers everything
      if (r.getInt(0) >= vocab) assert(r.getLong(1) === total)
    }
    val covered = rows.map(_.getLong(1)).toSeq
    assert(covered.zip(covered.tail).forall { case (a, b) => a <= b })
    // the curve is non-degenerate on the testdata: the smallest k
    // covers strictly less than everything
    assert(covered.head < total)
  }

  test("q177: calibration bins partition the corpus; rates recompute") {
    val rows = SparkEntry.queries("q177_gate_calibration")(spark, sf001).collect()
    val nDocs = graft.sources.Tables.documents(spark, sf001).count()
    assert(rows.map(_.getLong(2)).sum === nDocs, "bins must partition the corpus")
    rows.foreach { r =>
      assert(r.getBoolean(1) === (r.getLong(0) >= 0))
      assert(r.getLong(3) <= r.getLong(2))
      assert(r.getLong(4) === r.getLong(3) * 1000000L / r.getLong(2))
    }
  }

  test("q333: every near-dup cluster lands in ONE split; moved flags are exact") {
    val rows = SparkEntry.queries("q333_cluster_safe_split")(spark, sf001)
      .collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getString(3), r.getBoolean(4)))
    assert(rows.length > 0)
    // the leakage-proof property itself: one split per cluster
    rows.groupBy(_._2).foreach { case (c, members) =>
      assert(members.map(_._3).distinct.length == 1,
        s"cluster $c spans splits ${members.map(_._3).distinct.mkString(",")}")
    }
    // q110 baseline for comparison: moved ⟺ the per-doc split differs
    val q110 = SparkEntry.queries("q110_train_split")(spark, sf001)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    rows.foreach { case (doc, _, split, moved) =>
      assert(moved == (q110(doc) != split), s"doc $doc moved flag wrong")
    }
    // the fixture must contain rescued docs — a split that never moves
    // anything proves nothing
    assert(rows.count(_._4) > 0, "expected at least one rescued doc")
    // and non-singleton clusters exist (the property has teeth)
    assert(rows.groupBy(_._2).exists(_._2.length > 1))
  }
}
