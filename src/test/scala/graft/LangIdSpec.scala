package graft

import graft.functions.{LangId, TextAnalysis}
import org.scalatest.funsuite.AnyFunSuite

/** Held-out sentences (written for this spec, not engineered from the
  * profile feature lists) across every supported language, including the
  * close pairs the old stopword heuristic could not separate (es/pt/ca,
  * da/no/sv, ru/uk/bg/sr, cs/pl, ar/fa/ur). */
class LangIdSpec extends AnyFunSuite {

  private def d(s: String): String = LangId.detect(s)

  test("ported reference expectations stay green (fa/ru/en)") {
    assert(d("خداحافظ") == "fa")
    assert(d("а неправильный формат идентификатора дн назад") == "ru")
    assert(d("OK I fixed the Python bindings to always return 3 languages even") == "en")
  }

  test("empty / non-letter input is unknown") {
    assert(d("") == "un")
    assert(d(null) == "un")
    assert(d("12345 !!! ---") == "un")
  }

  test("Latin-script Western European languages") {
    assert(d("She said that the results were better than anyone had expected.") == "en")
    assert(d("Die Ergebnisse waren besser als erwartet und wurden gestern veröffentlicht.") == "de")
    assert(d("Les résultats étaient meilleurs que prévu et seront publiés dans la revue.") == "fr")
    assert(d("Los resultados fueron mejores de lo esperado y se publicarán mañana.") == "es")
    assert(d("Os resultados foram melhores do que o esperado e não serão publicados.") == "pt")
    assert(d("I risultati sono stati migliori del previsto e saranno pubblicati domani.") == "it")
    assert(d("De resultaten waren beter dan verwacht en worden morgen gepubliceerd.") == "nl")
    assert(d("Els resultats van ser millors del que s'esperava i es publicaran demà.") == "ca")
  }

  test("es vs pt vs ca close-pair separation on short strings") {
    assert(d("¿Qué hora es? Los niños están en la escuela.") == "es")
    assert(d("As crianças estão na escola e não vão voltar cedo.") == "pt")
    assert(d("Els nens són a l'escola amb els seus amics.") == "ca")
  }

  test("Nordic languages incl. the da/no pair") {
    assert(d("Resultaten var bättre än väntat och kommer att publiceras i morgon.") == "sv")
    assert(d("Det var en god dag, og vi skal ikke glemme hvad der skete efter mødet.") == "da")
    assert(d("Det var en fin dag, og vi skal ikke glemme hva som skjedde etter møtet.") == "no")
    assert(d("Tulokset olivat parempia kuin odotettiin ja ne julkaistaan huomenna.") == "fi")
    // the da/no discriminators fire both ways
    assert(d("Informasjon om situasjonen kommer etter hvert, ikke nå.") == "no")
    assert(d("Hvad skal vi gøre efter mødet? Det ved jeg ikke endnu.") == "da")
  }

  test("Central/Eastern European Latin-script languages") {
    assert(d("Wyniki były lepsze niż się spodziewano i zostaną opublikowane jutro.") == "pl")
    assert(d("Výsledky byly lepší, než se čekalo, a budou zveřejněny zítra.") == "cs")
    assert(d("Az eredmények jobbak voltak, mint vártuk, és ez nem meglepő.") == "hu")
    assert(d("Rezultatele au fost mai bune decât se aștepta și vor fi publicate mâine.") == "ro")
    assert(d("Sonuçlar beklenenden daha iyiydi ve yarın açıklanacak.") == "tr")
  }

  test("Southeast Asian Latin-script languages") {
    assert(d("Hasil penelitian ini lebih baik dari yang diharapkan dan akan diumumkan besok.") == "id")
    assert(d("Kết quả tốt hơn nhiều so với những gì chúng ta mong đợi.") == "vi")
  }

  test("Cyrillic close quadruple ru/uk/bg/sr") {
    assert(d("Результаты оказались лучше, чем ожидалось, и будут опубликованы завтра.") == "ru")
    assert(d("Результати виявилися кращими, ніж очікувалося, і будуть оприлюднені завтра.") == "uk")
    assert(d("Резултатите бяха по-добри от очакваното и ще бъдат обявени утре.") == "bg")
    assert(d("Резултати су били бољи него што смо очекивали и биће објављени сутра.") == "sr")
  }

  test("Arabic-script triple ar/fa/ur") {
    assert(d("النتائج كانت أفضل من المتوقع وسيتم الإعلان عنها غدا") == "ar")
    assert(d("نتایج بهتر از آن چیزی بود که انتظار داشتیم") == "fa")
    assert(d("نتائج توقع سے بہتر تھے اور کل اعلان ہوگا") == "ur")
  }

  test("script-distinct languages") {
    assert(d("这是一个中文句子，用来测试语言检测") == "zh")
    assert(d("これは日本語のテスト文です") == "ja")
    assert(d("결과는 예상보다 좋았고 내일 발표될 것입니다") == "ko")
    assert(d("התוצאות היו טובות מהצפוי ויפורסמו מחר") == "he")
    assert(d("Τα αποτελέσματα ήταν καλύτερα από ό,τι περιμέναμε.") == "el")
    assert(d("परिणाम अपेक्षा से बेहतर थे और कल घोषित किए जाएंगे।") == "hi")
    assert(d("ผลลัพธ์ดีกว่าที่คาดไว้และจะประกาศพรุ่งนี้") == "th")
    assert(d("შედეგები მოსალოდნელზე უკეთესი იყო") == "ka")
    assert(d("Արդյունքներն ավելի լավն էին, քան սպասվում էր") == "hy")
    assert(d("ফলাফল প্রত্যাশার চেয়ে ভালো ছিল") == "bn")
    assert(d("முடிவுகள் எதிர்பார்த்ததை விட சிறப்பாக இருந்தன") == "ta")
    assert(d("ఫలితాలు ఊహించిన దానికంటే బాగున్నాయి") == "te")
  }

  test("TextAnalysis.detectLanguage delegates to the statistical engine") {
    assert(TextAnalysis.detectLanguage("Resultaten var bättre än väntat och kommer i morgon.") == "sv")
    assert(TextAnalysis.detectLanguage("") == "un")
  }

  test("long documents are sampled, not fully scanned (bounded cost)") {
    val long = ("The results were better than expected and " * 50000) // ~2.1 MB
    val t0 = System.nanoTime()
    assert(d(long) == "en")
    val ms = (System.nanoTime() - t0) / 1e6
    assert(ms < 500.0, s"detect took $ms ms on a 2 MB doc — sampling cap broken")
    // The Arabic branch does its own word-list scan — it must ride the
    // same cap (it once split the full text).
    val longAr = ("النتائج كانت أفضل من المتوقع وسيتم الإعلان عنها غدا " * 40000) // ~2 MB
    val t1 = System.nanoTime()
    assert(d(longAr) == "ar")
    val ms1 = (System.nanoTime() - t1) / 1e6
    assert(ms1 < 500.0, s"detect took $ms1 ms on a 2 MB Arabic doc — branch cap broken")
  }

  test("deterministic across repeated calls") {
    val s = "Die Ergebnisse waren besser als erwartet."
    assert((1 to 10).map(_ => d(s)).toSet == Set("de"))
  }
}
