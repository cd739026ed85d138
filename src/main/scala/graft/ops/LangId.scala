package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** Character-trigram language identification over ~29 languages — the
  * Cavnar–Trenkle / TextCat family (character n-gram profiles, public
  * method), sized for crawl-scale routing where model inference is off
  * the table and [[TextAnalysis.languageId]]'s 4-language marker
  * heuristic under-covers.
  *
  * Design:
  *  - per-language profiles are derived AT CLASS LOAD from embedded
  *    seed text (a few original sentences per language, written for
  *    this engine): lowercase → codepoint trigrams → top-`profileTopK`
  *    by count. Integer weights keep scoring exact across engines.
  *  - score(text, lang) = Σ over the text's trigram OCCURRENCES of
  *    that language's weight for the trigram; predicted language =
  *    argmax, ties to the lexicographically smallest code, zero score
  *    (no trigram matched any profile — emoji-only, numeric, tiny or
  *    NULL strings) = "unknown". Non-Latin scripts need no special
  *    branch: only the right language's profile contains Cyrillic/
  *    Arabic/Devanagari/CJK trigrams, so script detection falls out of
  *    the same rule.
  *  - the kernel is a per-row UDF (hash probes per trigram against the
  *    per-JVM inverted profile index; loop-dominated, the documented
  *    UDF precedent) — one scan, no explode, no shuffle. The raw
  *    profile rows ([[profileRows]]) dump to parquet for gates, so an
  *    independent engine can re-derive every verdict from the same
  *    data (the c16 pattern).
  *
  * Trigrams are CODEPOINT windows (a surrogate pair is one unit), so
  * the kernel agrees with SQL `substr` semantics on astral-plane text.
  * The marker heuristic stays as the cheap prefilter for 4-language
  * flows; this is the real router.
  */
object LangId {

  /** Seed text per language — ORIGINAL sentences exercising each
    * language's function words and orthography (the profile source;
    * not a corpus sample).
    */
  val seeds: Map[String, String] = Map(
    "en" -> ("the quick brown fox jumps over the lazy dog and then it was " +
      "the end of the day for all of them because they had been working " +
      "with their friends in the house that stood near the old bridge"),
    "de" -> ("der schnelle braune fuchs springt über den faulen hund und " +
      "dann war es das ende des tages für alle weil sie mit ihren freunden " +
      "in dem haus gearbeitet hatten das neben der alten brücke stand und " +
      "die kinder spielten nicht mehr auf der straße"),
    "fr" -> ("le rapide renard brun saute par dessus le chien paresseux et " +
      "puis ce fut la fin de la journée pour tous parce qu'ils avaient " +
      "travaillé avec leurs amis dans la maison qui se trouvait près du " +
      "vieux pont et les enfants ne jouaient plus dans la rue"),
    "es" -> ("el rápido zorro marrón salta sobre el perro perezoso y luego " +
      "fue el final del día para todos porque habían estado trabajando con " +
      "sus amigos en la casa que estaba cerca del puente viejo y los niños " +
      "ya no jugaban en la calle"),
    "pt" -> ("a rápida raposa marrom pula sobre o cão preguiçoso e então " +
      "foi o fim do dia para todos porque eles estavam trabalhando com " +
      "seus amigos na casa que ficava perto da ponte velha e as crianças " +
      "não brincavam mais na rua"),
    "it" -> ("la veloce volpe marrone salta sopra il cane pigro e poi fu " +
      "la fine della giornata per tutti perché avevano lavorato con i loro " +
      "amici nella casa che si trovava vicino al vecchio ponte e i bambini " +
      "non giocavano più nella strada"),
    "nl" -> ("de snelle bruine vos springt over de luie hond en toen was " +
      "het het einde van de dag voor iedereen omdat ze met hun vrienden in " +
      "het huis hadden gewerkt dat naast de oude brug stond en de kinderen " +
      "speelden niet meer op de straat"),
    "sv" -> ("den snabba bruna räven hoppar över den lata hunden och sedan " +
      "var det slutet på dagen för alla eftersom de hade arbetat med sina " +
      "vänner i huset som stod nära den gamla bron och barnen lekte inte " +
      "längre på gatan"),
    "da" -> ("den hurtige brune ræv springer over den dovne hund og så var " +
      "det slutningen på dagen for alle fordi de havde arbejdet sammen med " +
      "deres venner i huset der stod nær den gamle bro og børnene legede " +
      "ikke længere på gaden"),
    "no" -> ("den raske brune reven hopper over den late hunden og så var " +
      "det slutten på dagen for alle fordi de hadde arbeidet sammen med " +
      "vennene sine i huset som sto nær den gamle brua og barna lekte ikke " +
      "lenger i gata"),
    "fi" -> ("nopea ruskea kettu hyppää laiskan koiran yli ja sitten se " +
      "oli päivän loppu kaikille koska he olivat työskennelleet ystäviensä " +
      "kanssa talossa joka seisoi vanhan sillan lähellä eivätkä lapset " +
      "enää leikkineet kadulla"),
    "pl" -> ("szybki brązowy lis skacze nad leniwym psem a potem był to " +
      "koniec dnia dla wszystkich ponieważ pracowali ze swoimi " +
      "przyjaciółmi w domu który stał w pobliżu starego mostu a dzieci już " +
      "nie bawiły się na ulicy"),
    "cs" -> ("rychlá hnědá liška skáče přes líného psa a pak to byl konec " +
      "dne pro všechny protože pracovali se svými přáteli v domě který " +
      "stál poblíž starého mostu a děti si už nehrály na ulici"),
    "ro" -> ("vulpea rapidă maro sare peste câinele leneș și apoi a fost " +
      "sfârșitul zilei pentru toți pentru că lucraseră cu prietenii lor în " +
      "casa care se afla lângă podul vechi și copiii nu se mai jucau pe " +
      "stradă"),
    "tr" -> ("hızlı kahverengi tilki tembel köpeğin üzerinden atlar ve " +
      "sonra herkes için günün sonuydu çünkü eski köprünün yanındaki evde " +
      "arkadaşlarıyla çalışmışlardı ve çocuklar artık sokakta " +
      "oynamıyordu"),
    "id" -> ("rubah coklat yang cepat melompati anjing yang malas dan " +
      "kemudian itu adalah akhir hari bagi semua orang karena mereka telah " +
      "bekerja dengan teman teman mereka di rumah yang berdiri di dekat " +
      "jembatan tua dan anak anak tidak lagi bermain di jalan"),
    "vi" -> ("con cáo nâu nhanh nhẹn nhảy qua con chó lười biếng và sau " +
      "đó là kết thúc của một ngày cho tất cả mọi người vì họ đã làm việc " +
      "với bạn bè của họ trong ngôi nhà đứng gần cây cầu cũ và những đứa " +
      "trẻ không còn chơi trên đường phố"),
    "ru" -> ("быстрая коричневая лиса прыгает через ленивую собаку и " +
      "потом это был конец дня для всех потому что они работали со своими " +
      "друзьями в доме который стоял возле старого моста и дети больше не " +
      "играли на улице он сказал что его друзья будут есть хлеб и пить " +
      "воду возле реки но она не хотела идти в школу сегодня потому что " +
      "шёл дождь и ветер был очень сильный дети часто читали интересные " +
      "книги об истории большого города где жили их родители много лет " +
      "назад"),
    "uk" -> ("швидка коричнева лисиця стрибає через ледачого собаку і " +
      "потім це був кінець дня для всіх тому що вони працювали зі своїми " +
      "друзями в будинку який стояв біля старого мосту і діти більше не " +
      "гралися на вулиці він сказав що його друзі будуть їсти хліб і пити " +
      "воду біля річки але вона не хотіла йти до школи сьогодні тому що " +
      "йшов дощ і вітер був дуже сильний діти часто читали цікаві книжки " +
      "про історію великого міста де жили їхні батьки багато років тому"),
    "ar" -> ("الثعلب البني السريع يقفز فوق الكلب الكسول وبعد ذلك كانت " +
      "نهاية اليوم للجميع لأنهم كانوا يعملون مع أصدقائهم في المنزل الذي " +
      "يقف بالقرب من الجسر القديم ولم يعد الأطفال يلعبون في الشارع"),
    "hi" -> ("तेज भूरी लोमड़ी आलसी कुत्ते के ऊपर से कूदती है और फिर यह सभी के " +
      "लिए दिन का अंत था क्योंकि वे पुराने पुल के पास खड़े घर में अपने दोस्तों के साथ " +
      "काम कर रहे थे और बच्चे अब सड़क पर नहीं खेलते थे"),
    "zh" -> ("敏捷的棕色狐狸跳过了懒惰的狗然后这一天对所有人来说都结束了" +
      "因为他们一直和朋友们在老桥附近的房子里工作孩子们也不再在街上玩耍了" +
      "我们明天还要继续学习新的东西"),
    "ja" -> ("すばやい茶色のきつねはなまけものの犬をとびこえてそれから" +
      "みんなにとって一日の終わりでしたなぜなら彼らは古い橋の近くの家で" +
      "友だちといっしょに働いていたからです子どもたちはもう道で遊びません"),
    "ko" -> ("빠른 갈색 여우가 게으른 개를 뛰어넘었고 그런 다음 모두에게 " +
      "하루의 끝이었습니다 왜냐하면 그들은 오래된 다리 근처의 집에서 " +
      "친구들과 함께 일하고 있었기 때문입니다 아이들은 더 이상 길에서 " +
      "놀지 않습니다"),
    "el" -> ("η γρήγορη καφέ αλεπού πηδάει πάνω από τον τεμπέλη σκύλο και " +
      "μετά ήταν το τέλος της ημέρας για όλους επειδή δούλευαν με τους " +
      "φίλους τους στο σπίτι που βρισκόταν κοντά στην παλιά γέφυρα και τα " +
      "παιδιά δεν έπαιζαν πια στον δρόμο"),
    "he" -> ("השועל החום המהיר קופץ מעל הכלב העצלן ואז זה היה סוף היום " +
      "לכולם כי הם עבדו עם החברים שלהם בבית שעמד ליד הגשר הישן והילדים " +
      "כבר לא שיחקו ברחוב"),
    "th" -> ("สุนัขจิ้งจอกสีน้ำตาลที่ว่องไวกระโดดข้ามสุนัขขี้เกียจแล้วมันคือจุดสิ้นสุดของวันสำหรับทุกคน" +
      "เพราะพวกเขาทำงานกับเพื่อนในบ้านที่ตั้งอยู่ใกล้สะพานเก่าและเด็กๆไม่เล่นบนถนนอีกต่อไป"),
    "fa" -> ("روباه قهوه‌ای سریع از روی سگ تنبل می‌پرد و سپس پایان روز " +
      "برای همه بود زیرا آنها با دوستان خود در خانه‌ای که نزدیک پل قدیمی " +
      "بود کار می‌کردند و بچه‌ها دیگر در خیابان بازی نمی‌کردند"),
    "bn" -> ("দ্রুত বাদামী শিয়াল অলস কুকুরের উপর দিয়ে লাফ দেয় এবং তারপর " +
      "সবার জন্য দিনের শেষ ছিল কারণ তারা পুরানো সেতুর কাছে বাড়িতে তাদের " +
      "বন্ধুদের সাথে কাজ করছিল এবং শিশুরা আর রাস্তায় খেলছিল না"))

  /** Top-K trigrams kept per language profile. */
  val profileTopK = 400

  /** Language codes, sorted — the deterministic tie-break order. */
  lazy val langs: Array[String] = seeds.keys.toArray.sorted

  private def normalize(s: String): String =
    s.toLowerCase(java.util.Locale.ROOT)

  /** Codepoint trigrams of a string (surrogate-pair-safe, matching SQL
    * `substr` character semantics).
    */
  def trigrams(s: String): Iterator[String] = {
    val cps = s.codePoints().toArray
    if (cps.length < 3) Iterator.empty
    else (0 to cps.length - 3).iterator
      .map(i => new String(cps, i, 3))
  }

  /** Per-language trigram → integer weight (occurrence count in the
    * seed, top-K by (count desc, trigram asc)).
    */
  lazy val profiles: Map[String, Map[String, Int]] = seeds.map {
    case (lang, seed) =>
      val counts = scala.collection.mutable.HashMap.empty[String, Int]
      trigrams(normalize(seed)).foreach(g =>
        counts.update(g, counts.getOrElse(g, 0) + 1))
      lang -> counts.toSeq.sortBy { case (g, c) => (-c, g) }
        .take(profileTopK).toMap
  }

  /** Inverted index trigram → packed (langIdx, weight) pairs — the
    * kernel's single hash probe per trigram occurrence.
    */
  private lazy val inverted: java.util.HashMap[String, Array[Long]] = {
    val m = new java.util.HashMap[String, Array[Long]]()
    for ((lang, prof) <- profiles; li = langs.indexOf(lang); (g, w) <- prof) {
      val prev = m.get(g)
      val entry = (li.toLong << 32) | (w.toLong & 0xffffffffL)
      m.put(g, if (prev == null) Array(entry) else prev :+ entry)
    }
    m
  }

  /** Per-language trigram scores for the text — the shared scoring
    * pass of [[classify]] and [[classifyRouted]].
    */
  private def scoreAll(text: String): Array[Long] = {
    val scores = new Array[Long](langs.length)
    val it = trigrams(normalize(text))
    while (it.hasNext) {
      val hits = inverted.get(it.next())
      if (hits != null) {
        var i = 0
        while (i < hits.length) {
          scores((hits(i) >>> 32).toInt) += hits(i) & 0xffffffffL
          i += 1
        }
      }
    }
    scores
  }

  private def argmax(scores: Array[Long],
                     allowed: Array[Boolean]): Int = {
    var best = -1
    var bestScore = 0L
    var i = 0
    while (i < scores.length) {
      if ((allowed == null || allowed(i)) && scores(i) > bestScore) {
        bestScore = scores(i); best = i
      }
      i += 1
    }
    best
  }

  /** The classifier kernel: argmax of Σ profile weights over the
    * text's trigram occurrences; ties → lexicographically smallest
    * code; zero score or NULL → "unknown".
    */
  def classify(text: String): String = {
    if (text == null) return "unknown"
    val best = argmax(scoreAll(text), null)
    if (best < 0) "unknown" else langs(best)
  }

  /** Column form of [[classify]]. */
  def langIdNgram(textCol: Column): Column = {
    val f = udf((s: String) => classify(s))
    f(textCol)
  }

  // ------------------------------------------------------------------
  // Script-gated routing. The pure trigram argmax has a failure mode
  // on mixed-script pages: a Han-dominated document whose Latin chrome
  // ("nav | home | login") happens to share trigrams with some Latin
  // profile can argmax to that language, because no CJK trigram is in
  // any profile often enough to outvote it. Production routers
  // (CLD2/CLD3, fastText via its script features) decide the SCRIPT
  // first from character counts, then discriminate only among the
  // languages that actually use it. Same kernel here: one script-count
  // pass (the [[TextAnalysis.dominantScript]] table), then the trigram
  // argmax RESTRICTED to the script's candidate set.
  // ------------------------------------------------------------------

  /** Candidate languages per dominant script, priority order: the
    * head is the script's default verdict when no profile trigram
    * matches (a pure-Han page with no profile overlap is still
    * Chinese, not unknown). Scripts used by exactly one of the 29
    * languages route directly; `latin` has no meaningful default and
    * falls through to "unknown" on zero score. Languages whose script
    * has no block in the table (bn — Bengali) are reachable through
    * the unrestricted fallback when no script dominates.
    */
  val scriptCandidates: Map[String, Seq[String]] = Map(
    "latin" -> Seq("cs", "da", "de", "en", "es", "fi", "fr", "id", "it",
      "nl", "no", "pl", "pt", "ro", "sv", "tr", "vi"),
    "cyrillic" -> Seq("ru", "uk"),
    "greek" -> Seq("el"),
    "arabic" -> Seq("ar", "fa"),
    "hebrew" -> Seq("he"),
    "devanagari" -> Seq("hi"),
    "thai" -> Seq("th"),
    "hangul" -> Seq("ko"),
    "kana" -> Seq("ja"),
    "han" -> Seq("zh", "ja"))

  /** Zero-score verdict per script: the candidate head, except latin
    * (too many candidates to guess) → "unknown".
    */
  val scriptDefault: Map[String, String] =
    scriptCandidates.map { case (s, cands) =>
      s -> (if (s == "latin") "unknown" else cands.head)
    }

  private lazy val candidateMask: Map[String, Array[Boolean]] =
    scriptCandidates.map { case (s, cands) =>
      s -> langs.map(cands.contains)
    }

  /** Script-gated [[classify]]: dominant Unicode script first (the
    * [[TextAnalysis.scriptBlocks]] table, first-max-wins tie rule),
    * then the trigram argmax restricted to [[scriptCandidates]]. No
    * dominant script (digits/emoji-only, or a script outside the
    * table) falls back to the unrestricted argmax.
    */
  def classifyRouted(text: String): String = {
    if (text == null) return "unknown"
    val counts = TextAnalysis.scriptCountsKernel(text)
    var dom = -1
    var domC = 0L
    var i = 0
    while (i < counts.length) {
      if (counts(i) > domC) { domC = counts(i); dom = i }
      i += 1
    }
    if (dom < 0) return classify(text)
    val script = TextAnalysis.scriptBlocks(dom)._1
    val best = argmax(scoreAll(text), candidateMask(script))
    if (best < 0) scriptDefault(script) else langs(best)
  }

  /** Column form of [[classifyRouted]] — the crawl router the
    * curation pipeline's `langId = "trigram"` mode uses.
    */
  def langIdRouted(textCol: Column): Column = {
    val f = udf((s: String) => classifyRouted(s))
    f(textCol)
  }

  /** (script, lang, pri) candidate rows + per-script defaults — dumped
    * to parquet by the routed-langid gate so the oracle re-derives
    * every verdict from the same routing table (the c16 pattern).
    */
  def routingRows: Seq[(String, String, Int)] =
    scriptCandidates.toSeq.sortBy(_._1).flatMap { case (s, cands) =>
      cands.zipWithIndex.map { case (l, i) => (s, l, i + 1) }
    }

  /** Raw profile rows (lang, trigram, w) — what gates dump to parquet
    * so the oracle re-derives every verdict independently.
    */
  def profileRows: Seq[(String, String, Int)] =
    profiles.toSeq.sortBy(_._1).flatMap { case (lang, prof) =>
      prof.toSeq.sortBy(_._1).map { case (g, w) => (lang, g, w) }
    }
}
