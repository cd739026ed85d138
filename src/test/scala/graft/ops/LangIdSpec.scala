package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins the trigram language-ID kernel: profile construction, the
  * scoring rule, determinism, and the adversarial shapes (mixed
  * language, short strings, CJK, emoji, NULL).
  */
class LangIdSpec extends SparkSpec {
  import spark.implicits._

  test("profiles cover all 29 languages with bounded size") {
    assert(LangId.langs.length == 29)
    assert(LangId.profiles.keySet == LangId.seeds.keySet)
    for ((lang, prof) <- LangId.profiles) {
      assert(prof.nonEmpty, s"$lang profile empty")
      assert(prof.size <= LangId.profileTopK, s"$lang profile oversized")
      assert(prof.values.forall(_ > 0), s"$lang non-positive weight")
    }
  }

  test("held-out sentences classify to their language") {
    val cases = Seq(
      "the children were reading many books about the history of the city" -> "en",
      "die kinder lasen viele bücher über die geschichte der stadt" -> "de",
      "les enfants lisaient beaucoup de livres sur l'histoire de la ville" -> "fr",
      "los niños leían muchos libros sobre la historia de la ciudad" -> "es",
      "as crianças liam muitos livros sobre a história da cidade" -> "pt",
      "i bambini leggevano molti libri sulla storia della città" -> "it",
      "дети читали много книг об истории города" -> "ru",
      "діти читали багато книг про історію міста" -> "uk",
      "الأطفال كانوا يقرؤون الكتب عن تاريخ المدينة" -> "ar",
      "बच्चे शहर के इतिहास के बारे में किताबें पढ़ते थे" -> "hi",
      "孩子们在阅读关于城市历史的书籍他们每天都在学习" -> "zh",
      "こどもたちはまちのれきしについてほんをよんでいました" -> "ja",
      "아이들은 도시의 역사에 관한 책을 읽고 있었습니다" -> "ko",
      "çocuklar şehrin tarihi hakkında kitaplar okuyordu" -> "tr",
      "dzieci czytały książki o historii miasta" -> "pl",
      "τα παιδιά διάβαζαν βιβλία για την ιστορία της πόλης" -> "el",
      "הילדים קראו ספרים על ההיסטוריה של העיר" -> "he",
      "เด็กๆอ่านหนังสือเกี่ยวกับประวัติศาสตร์ของเมือง" -> "th",
      "بچه‌ها کتاب‌هایی درباره تاریخ شهر می‌خواندند" -> "fa",
      "শিশুরা শহরের ইতিহাস সম্পর্কে বই পড়ছিল" -> "bn")
    for ((text, want) <- cases)
      assert(LangId.classify(text) == want,
        s"classify($text) = ${LangId.classify(text)}, want $want")
  }

  test("adversarial: mixed, short, empty, emoji, null, case-fold") {
    // mixed en/fr with fr dominant by weight mass
    assert(LangId.classify(
      "the house et la maison dans la rue avec les enfants près du pont") == "fr")
    assert(LangId.classify(null) == "unknown")
    assert(LangId.classify("") == "unknown")
    assert(LangId.classify("ab") == "unknown") // below trigram length
    assert(LangId.classify("🎉🎊 12 34 !!") == "unknown") // no profile hit
    // surrogate pairs count as single codepoints — no crash, no skew
    assert(LangId.classify("😀😀😀😀") == "unknown")
    // case-folding: shouting German is still German
    assert(LangId.classify(
      "DIE KINDER LASEN VIELE BÜCHER ÜBER DIE GESCHICHTE DER STADT") == "de")
  }

  test("determinism: ties break to the lexicographically smallest code") {
    // a string whose only scoring trigrams hit two profiles equally is
    // hard to construct by hand; instead assert the rule directly on
    // repeated runs and on a sample where close Scandinavian profiles
    // compete — the verdict must be stable across calls
    val s = "den gamle bro og huset"
    val first = LangId.classify(s)
    assert((1 to 10).forall(_ => LangId.classify(s) == first))
  }

  test("column kernel matches the scala kernel through Spark") {
    val texts = Seq(
      "the children were reading many books",
      "los niños leían muchos libros",
      "дети читали книги", null, "", "🎉")
    val out = texts.toDF("t")
      .select(LangId.langIdNgram(col("t")).as("l"))
      .as[String].collect()
    assert(out.toSeq == texts.map(LangId.classify))
  }

  test("profileRows round-trips the profiles exactly") {
    val rows = LangId.profileRows
    assert(rows.map(_._1).distinct.sorted == LangId.langs.toSeq)
    val rebuilt = rows.groupBy(_._1).map { case (l, rs) =>
      l -> rs.map(r => r._2 -> r._3).toMap
    }
    assert(rebuilt == LangId.profiles)
  }

  // ----------------------------------------------------------------
  // Script-gated routing
  // ----------------------------------------------------------------

  test("routed: Latin chrome cannot outvote a CJK payload") {
    val page = "nav | nav | nav | login\n孩子们每天都在阅读关于他们城市历史的很多书籍"
    assert(LangId.classifyRouted(page) == "zh",
      s"pure argmax says ${LangId.classify(page)}; routing must say zh")
    assert(LangId.classifyRouted(
      "Home > Products\n아이들은 도시의 역사에 관한 많은 책을 읽었습니다") == "ko")
    assert(LangId.classifyRouted(
      "menu | search\nこどもたちはまちのれきしについてたくさんのほんをよみました") == "ja")
  }

  test("routed: single-candidate scripts route directly") {
    assert(LangId.classifyRouted(
      "nav\nτα παιδιά διάβαζαν πολλά βιβλία για την ιστορία") == "el")
    assert(LangId.classifyRouted(
      "เด็กๆอ่านหนังสือมากมายเกี่ยวกับประวัติศาสตร์") == "th")
  }

  test("routed: latin docs still discriminate within the latin set") {
    assert(LangId.classifyRouted(
      "the children were reading many books about their city") == "en")
    assert(LangId.classifyRouted(
      "les enfants lisaient beaucoup de livres sur leur ville") == "fr")
  }

  test("routed: zero profile overlap → script default, latin → unknown") {
    // rare Han chars sharing no trigram with the zh seed
    assert(LangId.classifyRouted("硅砷硼碲碘磷 硅砷硼碲碘磷") == "zh")
    assert(LangId.classifyRouted("xqzkv wqjxz zzvkq qqxxj") == "unknown")
  }

  test("routed: no dominant script falls back to the unrestricted argmax") {
    // Bengali script has no block in the table; the fallback full
    // argmax still finds the bn profile
    assert(LangId.classifyRouted(
      "শিশুরা তাদের শহরের ইতিহাস সম্পর্কে অনেক বই পড়ত প্রতিদিন") == "bn")
    assert(LangId.classifyRouted("🎉🎊 123 456 !!!") == "unknown")
    assert(LangId.classifyRouted(null) == "unknown")
    assert(LangId.classifyRouted("") == "unknown")
  }

  test("routed: candidate table covers every profiled language or the fallback") {
    val routed = LangId.scriptCandidates.values.flatten.toSet
    val viaFallback = Set("bn") // Bengali block absent by design
    assert(LangId.langs.toSet == routed ++ viaFallback)
    // every candidate is a real profile
    assert(routed.subsetOf(LangId.langs.toSet))
    // defaults agree with candidate heads (latin excepted)
    for ((s, cands) <- LangId.scriptCandidates if s != "latin")
      assert(LangId.scriptDefault(s) == cands.head)
    assert(LangId.scriptDefault("latin") == "unknown")
  }

  test("routed: column kernel matches the scala kernel through Spark") {
    val texts = Seq(
      "nav | nav\n孩子们每天都在阅读关于他们城市历史的很多书籍",
      "дети читали книги", null, "", "🎉")
    val out = texts.toDF("t")
      .select(LangId.langIdRouted(col("t")).as("l"))
      .as[String].collect()
    assert(out.toSeq == texts.map(LangId.classifyRouted))
  }
}
