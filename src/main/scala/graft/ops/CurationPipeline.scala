package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.engine.sink.ExportSink
import graft.functions.{GraftFunctions => F}
import graft.ops.Checkpoints.Truncatable

/** THE composed curation program — the LLM-surface analogue of the
  * ETL engine's `ingest()` composition (`ingestors/base.py:713-739`):
  * every stage exists and is gated individually; this runs them as ONE
  * pipeline with observed per-stage metrics, because that is the
  * product the operators exist for:
  *
  *   read → html extract → (optional mojibake repair) → language gate
  *   → quality gate → corpus-wide segment dedup → near-dup vs the
  *   persisted signature index → benchmark decontamination → mix
  *   reweighting → sequence packing → sharded export.
  *
  * Materialization strategy (the 100 TB shape): the stream is
  * plan-truncated THREE times — immediately after the row-filter
  * stages (the ONE pass that runs the HTML extractor; its files are
  * freed as soon as the next snapshot lands), after the segment-dedup
  * join (whose corpus-wide digest aggregation wants a stable snapshot
  * anyway) and after decontamination (because mix reweighting's count
  * pivot and the final action must see one snapshot). The row-filter
  * stage metrics ride as an `observe()` on that first pass — the
  * CollectMetrics node is also the pushdown barrier that keeps
  * Catalyst from substituting the extractor expression into every
  * pushed predicate (see the comment at the observation site) — so no
  * stage pays a dedicated source re-scan. On a cluster, set a
  * reliable checkpoint dir ([[Checkpoints]]) so the materializations
  * survive executor loss.
  */
object CurationPipeline {

  /** `langId` picks the router: `"marker"` (the 4-language stopword
    * heuristic — cheapest, SQL-mirrorable) or `"trigram"` (the
    * 29-language [[LangId]] profile classifier — the real crawl
    * router). `keepLangs` non-empty keeps only those codes;
    * empty keeps every non-`unknown` verdict.
    */
  final case class Config(
      idCol: String,
      htmlCol: String,
      sourceCol: String,
      langId: String = "marker",
      keepLangs: Set[String] = Set.empty,
      blockedTerms: Seq[String] = Nil,
      minQuality: Double = 0.8,
      gopher: Boolean = false,
      gopherThresholds: RepetitionSignals.GopherThresholds =
        RepetitionSignals.GopherThresholds(),
      gopherByLang: Map[String, RepetitionSignals.GopherThresholds] =
        Map.empty,
      nearDupThreshold: Double = 0.8,
      maxPpl: Double = Double.PositiveInfinity,
      pplDiscount: Double = 0.75,
      pplOrder: Int = 2,
      pplArpaModel: Option[String] = None,
      maxContamination: Double = 0.2,
      targetMix: Map[String, Int] = Map.empty,
      packCapacity: Long = 512L,
      redactPii: Boolean = false,
      hostCol: Option[String] = None,
      pathCol: Option[String] = None,
      userAgent: String = "graftbot",
      exportDir: Option[String] = None,
      exportShards: Int = 4,
      exportFormat: String = "jsonl",
      extractor: String = "regex",
      fixEncoding: Boolean = false,
      termMatcher: String = "literal",
      deconMode: String = "doc",
      qualityModel: Option[String] = None,
      qualityLabel: String = "__label__keep",
      // token counter driving n_tok/packing: whitespace tokens by
      // default; pass e.g. `Tiktoken.countCol(_, vocab)` so packs
      // respect the TRAINING tokenizer's budget, not an approximation
      tokenCounter: Option[org.apache.spark.sql.Column =>
        org.apache.spark.sql.Column] = None) {
    require(langId == "marker" || langId == "trigram",
      s"langId must be 'marker' or 'trigram': $langId")
    require(extractor == "blocks" || extractor == "regex",
      s"extractor must be 'blocks' or 'regex': $extractor")
    require(pplOrder == 2 || pplOrder == 3,
      s"pplOrder must be 2 (bigram KN) or 3 (trigram KN): $pplOrder")
    require(termMatcher == "literal" || termMatcher == "aho",
      s"termMatcher must be 'literal' or 'aho': $termMatcher")
    require(deconMode == "doc" || deconMode == "sentence",
      s"deconMode must be 'doc' or 'sentence': $deconMode")
  }

  /** The curated output plus per-stage observed metrics. `data`
    * columns: idCol, sourceCol, `n_tok`, `pack_id`, `content_sha`
    * (sha-256 of the final cleaned text — the digest the end-to-end
    * gate hashes). `release()` frees the reliable-checkpoint files
    * backing `data` once every consumer has materialized — long-lived
    * callers (the streaming sink runs one curate per microbatch,
    * forever) MUST call it or the cluster checkpoint dir grows one
    * materialized frame per batch; a no-op on the local path.
    */
  final case class Curated(data: DataFrame, metrics: Seq[(String, Long)],
                           manifest: Option[ExportSink.Manifest],
                           private val backing: DataFrame) {
    def release(): Unit = Checkpoints.release(backing)
  }

  /** `blocklist` (one `domain` string column) activates the
    * [[Curation.dropBlockedDomains]] hygiene pass over `cfg.hostCol`
    * BEFORE extraction — the cheapest drop runs first. `cfg.redactPii`
    * splices email/phone/IP/Luhn-card redaction
    * ([[Curation.redactPiiAll]]) between the quality gate and segment
    * dedup, so every downstream digest, signature and export sees the
    * redacted text.
    *
    * `pplRef` (a frame with a `pplRefTextCol` text column — Wikipedia
    * in the CCNet recipe) activates the perplexity gate: the cleaned
    * post-segment-dedup text is scored under an interpolated
    * Kneser–Ney bigram model trained on the reference
    * ([[LanguageModel.kneserNeyScore]]) and rows with per-bigram
    * perplexity above `cfg.maxPpl` drop. Docs too short to score
    * (< 2 tokens) pass — a 1-token row carries no LM evidence either
    * way. When active the filtered snapshot is its own truncation
    * point, so the LM scoring job runs once, not once per downstream
    * consumer.
    */
  def curate(docs: DataFrame, seenIndex: DataFrame, probes: DataFrame,
             probeTextCol: String, cfg: Config,
             blocklist: Option[DataFrame] = None,
             robots: Option[DataFrame] = None,
             pplRef: Option[DataFrame] = None,
             pplRefTextCol: String = "text"): Curated = {
    val id = cfg.idCol
    require(cfg.targetMix.nonEmpty, "targetMix must be non-empty")
    require(blocklist.isEmpty || cfg.hostCol.nonEmpty,
      "a blocklist needs cfg.hostCol to match against")
    require(robots.isEmpty ||
      (cfg.hostCol.nonEmpty && cfg.pathCol.nonEmpty),
      "robots filtering needs cfg.hostCol AND cfg.pathCol")
    robots.foreach(r => require(
      r.columns.contains("host") && r.columns.contains("robots_txt"),
      "robots frame must carry (host, robots_txt) columns"))
    pplRef.foreach(r => require(r.columns.contains(pplRefTextCol),
      s"pplRef frame must carry a '$pplRefTextCol' column"))
    for (r <- Seq("__text", "__term_ok", "lang_pred", "__q", "text_clean", "n_tok",
        "pack_id", "content_sha", "__graft_blocked", "gopher_pass",
        "__graft_robots_ok", "__graft_rhost", "__graft_rbody",
        "kn_ppl", "kn_logprob", "n_bigrams"))
      require(!docs.columns.contains(r), s"input column '$r' is reserved")

    // the blocklist verdict rides as a FLAG so its keep/drop counts
    // fold into the same single-scan aggregate as the language and
    // quality stages — no dedicated pre-filter job, no metric re-scan
    val flagged = blocklist match {
      case Some(bl) =>
        Curation.withBlockedDomainFlag(docs, cfg.hostCol.get, bl)
      case None => docs.withColumn("__graft_blocked", lit(false))
    }
    // robots.txt consent rides as a second pre-extraction flag (the
    // blocklist shape), via the ONE shared RobotsTxt.withAllowedFlag
    // implementation: case-insensitive hosts, per-host-deduplicated
    // build side, RFC fail-open on absent entries; denied rows skip
    // extraction entirely
    val consented = robots match {
      case Some(r) =>
        RobotsTxt.withAllowedFlag(flagged, cfg.hostCol.get,
          cfg.pathCol.get, r, "host", "robots_txt", cfg.userAgent,
          flagCol = "__graft_robots_ok")
      case None => flagged.withColumn("__graft_robots_ok", lit(true))
    }

    // stages 0-3 as columns, so one aggregate yields their metrics and
    // one filter applies them — a single source scan either way.
    // Blocked rows skip extraction (NULL text) — they can never be kept
    // `extractor = "blocks"` (default) routes through boilerpipe-style
    // block classification (TextAnalysis.extractMainContent) — chrome
    // never reaches the quality/dedup stages; "regex" keeps the
    // line-granularity cascade for corpora where recall beats
    // precision (e.g. non-page HTML fragments).
    val extractExpr =
      if (cfg.extractor == "blocks")
        TextAnalysis.extractMainContent(col(cfg.htmlCol))
      else TextAnalysis.htmlToText(col(cfg.htmlCol))
    // Spread the one extractor-bearing pass (graft.util.Par): the
    // extraction/langid/quality/gopher projection chain is the most
    // compute-heavy map work in the pipeline and otherwise rides the
    // scan stage's split count (ONE task on a small single-row-group
    // file). Byte-adaptive: a corpus big enough to split naturally is
    // left alone.
    val extractedRaw = graft.util.Par.spread(consented, id)
      .select(col(id), col(cfg.sourceCol),
      col("__graft_blocked"), col("__graft_robots_ok"),
      when(!col("__graft_blocked") && col("__graft_robots_ok"),
        extractExpr).as("__text"))
    // optional encoding-repair stage (`cfg.fixEncoding`): mojibake
    // un-mangles BEFORE language ID — trigram profiles never match
    // cp1252-mangled byte salad, so a repairable doc would otherwise
    // die at the language gate. One struct-valued kernel carries
    // (fixed, changed) so the stage metric costs no second repair
    // pass; the two field references below collapse into one projection
    // where codegen subexpression elimination evaluates the kernel once.
    val extracted =
      if (cfg.fixEncoding)
        extractedRaw
          .withColumn("__enc", Mojibake.repairStruct(col("__text")))
          .select(col(id), col(cfg.sourceCol), col("__graft_blocked"),
            col("__graft_robots_ok"),
            col("__enc.fixed").as("__text"),
            coalesce(col("__enc.changed"), lit(false)).as("__enc_changed"))
      else extractedRaw.withColumn("__enc_changed", lit(false))
    val langExpr =
      if (cfg.langId == "trigram") LangId.langIdRouted(col("__text"))
      else TextAnalysis.languageId(col("__text"))
    val langOk =
      if (cfg.keepLangs.nonEmpty)
        col("lang_pred").isin(cfg.keepLangs.toSeq.sorted: _*)
      else col("lang_pred") =!= "unknown"
    // term blocklist (C4 content filter) over the EXTRACTED text, as a
    // flag in the same single scan — one more codegen'd column, no
    // extra job
    // `termMatcher = "aho"` routes the same whole-token semantics
    // through the Aho-Corasick automaton (one scan per row regardless
    // of |terms|) — the web-scale path for lists past the literal
    // expression's maxTerms cap
    val termOk =
      if (cfg.blockedTerms.isEmpty) lit(true)
      else if (cfg.termMatcher == "aho")
        !Curation.blockedTermFlagLarge(col("__text"), cfg.blockedTerms)
      else !Curation.blockedTermFlag(col("__text"), cfg.blockedTerms)
    val scored = {
      // quality score: the ratio heuristic by default, or — when a
      // fastText supervised .bin is configured (the CCNet/DCLM-style
      // trained classifier) — that model's probability of
      // `qualityLabel`, scored as a broadcast-model column on the
      // same projection. Same [0,1] scale, same minQuality gate.
      val qExpr = cfg.qualityModel match {
        case Some(path) =>
          val m = FastText.load(extracted.sparkSession, path)
          require(m.labels.contains(cfg.qualityLabel),
            s"quality model at $path has no label '${cfg.qualityLabel}' " +
              s"(labels: ${m.labels.mkString(", ")})")
          element_at(FastText.predictAllCol(extracted.sparkSession, m,
            col("__text")), cfg.qualityLabel)
        case None =>
          val feats = TextAnalysis.qualityFeatures(col("__text")).toMap
          TextAnalysis.qualityScore(feats("punct_ratio"),
            feats("digit_ratio"), feats("stop_ratio"))
      }
      extracted
        .withColumn("__term_ok", termOk)
        .withColumn("lang_pred", langExpr)
        .withColumn("__q", qExpr)
    }
    // optional Gopher quality filter (paper table A1) — the repetition
    // kernel and rule columns ride the SAME projection as the other
    // stage flags (no extra job); disabled, the flag is a constant
    // true and none of it is computed
    val gophered =
      if (cfg.gopher && cfg.gopherByLang.nonEmpty)
        RepetitionSignals.gopherFilterByLang(scored, "__text", "lang_pred",
          cfg.gopherByLang, cfg.gopherThresholds)
      else if (cfg.gopher)
        RepetitionSignals.gopherFilter(scored, "__text", cfg.gopherThresholds)
      else scored.withColumn("gopher_pass", lit(true))
    val gOk = col("gopher_pass")
    // coalesce: sum() over ZERO rows is NULL, and an empty batch (a
    // routine all-filtered microbatch) must yield 0-metrics, not an
    // NPE after the pipeline ran
    val notBlocked = !col("__graft_blocked")
    val rOk = col("__graft_robots_ok")
    val tOk = col("__term_ok")
    // Stage metrics ride as an OBSERVATION on the scan, not a separate
    // aggregate job — and the CollectMetrics node doubles as a
    // pushdown BARRIER. That barrier is load-bearing: filtering on the
    // lang/quality aliases directly lets Catalyst substitute the full
    // extraction expression into every pushed predicate reference (36
    // plan copies of the extractor measured at sf0.1; runtime CSE
    // recovered only part of it — the stage ran 6x slower than one
    // extraction pass). With observe + filter-above-metrics, the
    // extractor is evaluated exactly ONCE per row, in the single
    // materializing pass below.
    val stageObs = org.apache.spark.sql.Observation()
    val observed = gophered.observe(stageObs,
      count(lit(1)).as("n_received"),
      coalesce(sum(when(notBlocked, 1L).otherwise(0L)), lit(0L)).as("n_in"),
      coalesce(sum(when(notBlocked && rOk, 1L).otherwise(0L)), lit(0L))
        .as("n_robots"),
      coalesce(sum(when(notBlocked && rOk && tOk, 1L).otherwise(0L)),
        lit(0L)).as("n_term"),
      coalesce(sum(when(notBlocked && rOk && tOk && langOk, 1L)
        .otherwise(0L)), lit(0L)).as("n_lang"),
      coalesce(sum(when(notBlocked && rOk && tOk && langOk &&
        col("__q") >= cfg.minQuality, 1L).otherwise(0L)), lit(0L)).as("n_q"),
      coalesce(sum(when(notBlocked && rOk && tOk && langOk &&
        col("__q") >= cfg.minQuality && gOk, 1L).otherwise(0L)), lit(0L))
        .as("n_gopher"),
      coalesce(sum(when(col("__enc_changed"), 1L).otherwise(0L)), lit(0L))
        .as("n_enc"))
    val gopherCols =
      if (cfg.gopher)
        RepetitionSignals.signalNames ++ Seq("tok_n", "mean_word_len",
          "symbol_word_ratio", "bullet_line_ratio", "ellipsis_line_ratio",
          "alpha_word_ratio", "stopword_hits", "gopher_pass")
      else Seq("gopher_pass")
    val kept3raw = observed
      .filter(notBlocked && rOk && tOk && langOk &&
        col("__q") >= cfg.minQuality && gOk)
      .drop("__q", "__graft_blocked", "__graft_robots_ok", "__term_ok",
        "__enc_changed")
      .drop(gopherCols: _*)
    // redaction before any digesting: segment digests, signatures and
    // the exported text must all be the REDACTED form
    val kept3 =
      if (cfg.redactPii)
        kept3raw.withColumn("__text", Curation.redactPiiAll(col("__text")))
      else kept3raw

    // FIRST truncation, immediately post-filter: the one pass that
    // runs the extractor (and fires the stage observation). Segment
    // dedup consumes kept3 TWICE (digest side + join-back side) — off
    // the snapshot those are block reads, not extractor re-runs.
    val snap0 = kept3.truncated
    val stageAgg = {
      val m = stageObs.get
      Seq("n_received", "n_in", "n_robots", "n_term", "n_lang", "n_q",
        "n_gopher", "n_enc").map(k => m(k).asInstanceOf[Long])
    }

    // corpus-wide segment dedup (C4-style boilerplate kill), then the
    // cleaned text replaces the extracted text. The segment totals ride
    // snapA's checkpoint materialization as an observation (rows are
    // already streaming through the truncate — no dedicated aggregate
    // job over the checkpointed blocks; the same fold as the stage
    // metrics above).
    val seg = Dedup.dedupSegments(snap0.select(col(id), col("__text")),
      id, "__text")
    val segObs = org.apache.spark.sql.Observation()
    val snapA = snap0.drop("__text")
      .join(seg, Seq(id))
      .observe(segObs, sum("n_segments").as("segs"),
        sum("n_kept").as("kept"))
      .truncated
    Checkpoints.release(snap0) // snapA is materialized; free the raw snap
    // sum() over ZERO rows is NULL — an all-filtered batch reads as 0
    val segStats = segObs.get

    // optional CCNet perplexity gate — under an EXTERNAL ARPA model
    // (`pplArpaModel`: the KenLM artifact CCNet actually ships, any
    // order ≤ 5, Katz-scored) or the in-engine KN trained on `pplRef`;
    // its own truncation point so the scoring job runs once
    val (afterPpl, pplMetric) = (cfg.pplArpaModel, pplRef) match {
      case (Some(arpaPath), _) =>
        val score = snapA.select(col(id), col("text_clean"))
        val model = LanguageModel.loadArpaN(snapA.sparkSession, arpaPath)
        val pplObs = org.apache.spark.sql.Observation()
        val kept =
          try {
            val pplScores = LanguageModel
              .arpaScoreN(model, score, id, "text_clean")
              .select(col(id), col("arpa_ppl").as("kn_ppl"))
            snapA
              .join(pplScores, Seq(id), "left")
              .filter(coalesce(col("kn_ppl"), lit(0.0)) <= cfg.maxPpl)
              .drop("kn_ppl")
              // kept-count rides the materialization, not a count job
              .observe(pplObs, count(lit(1)).as("__n"))
              .truncated // materializes — the model caches die here
          } finally model.unpersist()
        Checkpoints.release(snapA)
        (kept, Seq("perplexity_kept" -> pplObs.get("__n").asInstanceOf[Long]))
      case (None, Some(ref)) =>
        val train = ref.select(lit(0L).as(id),
          col(pplRefTextCol).as("text_clean"))
        val score = snapA.select(col(id), col("text_clean"))
        // order 2 = the bigram model; order 3 = recursive-backoff
        // trigram (closer to the KenLM 5-gram CCNet trains, one join
        // level deeper) — same (id, ppl) contract either way
        val pplScores =
          if (cfg.pplOrder == 3)
            LanguageModel.kneserNey3Score(train, score, id, "text_clean",
              cfg.pplDiscount)
              .select(col(id), col("kn3_ppl").as("kn_ppl"))
          else
            LanguageModel.kneserNeyScore(train, score, id, "text_clean",
              cfg.pplDiscount)
        val pplObs = org.apache.spark.sql.Observation()
        val kept = snapA
          .join(pplScores.select(col(id), col("kn_ppl")), Seq(id), "left")
          .filter(coalesce(col("kn_ppl"), lit(0.0)) <= cfg.maxPpl)
          .drop("kn_ppl")
          .observe(pplObs, count(lit(1)).as("__n"))
          .truncated
        Checkpoints.release(snapA) // kept is materialized; free A now
        (kept, Seq("perplexity_kept" -> pplObs.get("__n").asInstanceOf[Long]))
      case (None, None) => (snapA, Nil)
    }

    val ndKept = Dedup.nearDupAgainstIndex(afterPpl, seenIndex, id,
      "text_clean", cfg.nearDupThreshold)

    // decontamination: "doc" drops whole documents above the
    // contamination cutoff; "sentence" SURGICALLY removes the hit
    // sentence ordinals ([[Curation.contaminatedSentences]]) and keeps
    // the page — a doc drops only when nothing survives. The rebuilt
    // text joins with single spaces (sentence boundaries subsume the
    // segment separators), and every downstream digest/signature/
    // export sees the rebuilt form. maxContamination is a no-op in
    // sentence mode by design.
    //
    // The near-dup kept-count is observed ON THE DECON PASS, between
    // the (row-preserving: one contamination row per id, left join)
    // join and the contamination filter — a dedicated ndKept.count()
    // was one more execution of the near-dup anti-join per batch.
    // The post-decon count rides snapB's checkpoint the same way.
    val ndObs = org.apache.spark.sql.Observation()
    val deconed =
      if (cfg.deconMode == "sentence") {
        val cmap = Curation.contaminatedSentences(
          ndKept.select(col(id), col("text_clean")), id, "text_clean",
          probes, probeTextCol)
        val sents = graft.ops.TextAnalysis.splitSentences(col("text_clean"))
        val keptSents = filter(sents, (_, i) =>
          !array_contains(
            coalesce(col("__cidx"), array().cast("array<int>")), i))
        ndKept
          .join(cmap.select(col(id), col("contaminated_idx").as("__cidx")),
            Seq(id), "left")
          .observe(ndObs, count(lit(1)).as("__nd"))
          .withColumn("text_clean", array_join(keptSents, " "))
          .filter(length(col("text_clean")) > 0)
          .drop("__cidx", "n_segments", "n_kept")
      } else {
        val cont = Curation.contaminationScore(
          ndKept.select(col(id), col("text_clean")), id, "text_clean",
          probes, probeTextCol)
        ndKept
          .join(cont.select(col(id), col("contamination")), Seq(id), "left")
          .observe(ndObs, count(lit(1)).as("__nd"))
          .filter(coalesce(col("contamination"), lit(0.0)) <=
            cfg.maxContamination)
          .drop("contamination", "n_segments", "n_kept")
      }
    // SECOND truncation: mix reweighting's count pivot and the final
    // action read one snapshot
    val decObs = org.apache.spark.sql.Observation()
    val snapB = deconed.observe(decObs, count(lit(1)).as("__n")).truncated
    // the pre-decontamination snapshot's reliable-checkpoint files are
    // dead once snapB (whose lineage the truncation cut) is
    // materialized — free them now, not at job exit (the streaming
    // sink runs one curate per microbatch). afterPpl IS snapA when the
    // perplexity gate is off; when on, snapA was already freed.
    Checkpoints.release(afterPpl)
    val nNearDup = ndObs.get("__nd").asInstanceOf[Long]
    val nDecon = decObs.get("__n").asInstanceOf[Long]

    val mixed = Curation.mixReweight(snapB, cfg.sourceCol, id, cfg.targetMix)
    val countTokens = cfg.tokenCounter
      .getOrElse((c: org.apache.spark.sql.Column) => F.tokenCount(c))
    val packed = Curation.packSequences(
      mixed.withColumn("n_tok", countTokens(col("text_clean")).cast("long")),
      cfg.sourceCol, id, "n_tok", cfg.packCapacity)
    val result = packed.select(col(id), col(cfg.sourceCol), col("n_tok"),
      col("pack_id"), sha2(col("text_clean"), 256).as("content_sha"))

    val manifest = cfg.exportDir.map(dir =>
      ExportSink.export(result, dir, id, cfg.exportShards, cfg.exportFormat))
    // The mixed-and-packed count: the export path gets it for free
    // from the manifest; the in-memory path (the streaming sink's
    // per-microbatch shape, pipe1/m26/m35/m45) formerly ran a
    // dedicated result.count() — one EXTRA execution of the whole
    // mixReweight+packSequences tower per batch, after which the
    // caller's action executed it again. The §13 pattern instead: the
    // count observes a THIRD truncation, so the tower runs once, the
    // caller reads blocks, and snapB's storage is freed as soon as the
    // truncation lands.
    val (data, nMixed, backing) = manifest match {
      case Some(m) => (result, m.totalCount, snapB)
      case None =>
        val cObs = org.apache.spark.sql.Observation()
        val snapC = result.observe(cObs, count(lit(1)).as("__n")).truncated
        Checkpoints.release(snapB)
        (snapC, cObs.get("__n").asInstanceOf[Long], snapC)
    }

    Curated(data,
      Seq(
        "rows_received" -> stageAgg(0),
        "rows_in" -> stageAgg(1),
        "robots_kept" -> stageAgg(2),
        "terms_kept" -> stageAgg(3),
        "language_kept" -> stageAgg(4),
        "quality_kept" -> stageAgg(5),
        "gopher_kept" -> stageAgg(6),
        "encoding_fixed" -> stageAgg(7),
        "segments_seen" -> Option(segStats("segs")).fold(0L)(_.asInstanceOf[Long]),
        "segments_kept" -> Option(segStats("kept")).fold(0L)(_.asInstanceOf[Long])) ++
      pplMetric ++
      Seq(
        "neardup_kept" -> nNearDup,
        "decontaminated_kept" -> nDecon,
        "mixed_and_packed" -> nMixed),
      manifest, backing = backing)
  }
}
