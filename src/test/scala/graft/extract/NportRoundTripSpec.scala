package graft.extract

import org.scalacheck.{Gen, Prop, Properties}

/** ScalaCheck property promised in SURVEY.md §5.3: random holdings →
  * render to the NPORT-P XHTML shape → extract → round-trip equality. */
object NportRoundTripSpec extends Properties("NportRoundTrip") {

  // Cell values: printable, no leading/trailing whitespace (get_text strips),
  // and not containing the literal label strings (which would confuse the
  // substring-match navigation, as it would the reference's).
  private val cellChar: Gen[Char] = Gen.frequency(
    8 -> Gen.alphaNumChar,
    1 -> Gen.oneOf(',', '.', '%', '$', '&', '<', '>', '-', '(', ')'),
    1 -> Gen.const(' '))
  private val cellValue: Gen[String] =
    Gen.listOf(cellChar).map(_.mkString.trim)
      .suchThat(s => !s.contains("Balance") && !s.contains("Name of issuer"))

  private val optValue: Gen[Option[String]] =
    Gen.option(cellValue)

  private val holding: Gen[Holding] = for {
    i <- optValue; s <- optValue; v <- optValue; p <- optValue
  } yield Holding(i, s, v, p)

  private val dateGen: Gen[String] = for {
    y <- Gen.choose(1990, 2030); m <- Gen.choose(1, 12); d <- Gen.choose(1, 28)
  } yield f"$y%04d-$m%02d-$d%02d"

  property("render then extract recovers date and non-empty holdings") =
    Prop.forAll(dateGen, Gen.listOf(holding)) { (date, hs) =>
      val doc = NportRender.render(Some(date), hs)
      val (d, out) = NportKernel.extract(doc)
      d.contains(date) && out == hs.filter(_.nonEmpty)
    }

  property("no date ⇒ filing dropped regardless of holdings") =
    Prop.forAll(Gen.listOf(holding)) { hs =>
      NportKernel.extract(NportRender.render(None, hs)) == ((None, Nil))
    }

  property("extractRows flattens date onto every holding") =
    Prop.forAll(dateGen, Gen.listOf(holding)) { (date, hs) =>
      val rows = NportKernel.extractRows(NportRender.render(Some(date), hs))
      rows.forall(_.reporting_date == date) && rows.length == hs.count(_.nonEmpty)
    }

  // At corpus scale the kernel sees arbitrary malformed bytes; it must
  // degrade to "nothing extracted", never throw (a throw kills the task,
  // retries, and eventually the whole 100 TB job).
  private val soup: Gen[String] = Gen.listOf(Gen.frequency(
    5 -> Gen.asciiPrintableChar,
    2 -> Gen.oneOf('<', '>', '&', '/', '!', '-', ';', '"'),
    1 -> Gen.oneOf("<td>", "</td>", "<h1>", "<table>", "<!--", "&amp;", "&#x41;", "<br/>")
      .flatMap(s => Gen.const(s.head)) // single chars keep shrinking sane
  )).map(_.mkString)

  property("parser/kernel never throw on arbitrary tag soup") =
    Prop.forAll(soup, Gen.listOf(Gen.oneOf(
      "<td>", "</td>", "<h1>", "</h1>", "<table>", "</table>", "<!-- x",
      "<h4>", "<x y=\"1\">", "</zz>", "&amp;", "&#xZZ;", "<", ">", "<>"))) {
      (noise, frags) =>
        val doc = noise + frags.mkString
        NportKernel.extract(doc) != null // total function: any result, no throw
    }
}
