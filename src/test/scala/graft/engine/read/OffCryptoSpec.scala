package graft.engine.read

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.{DocxFixture, OffCryptFixture, XlsFixture, XlsxFixture}

/** The decryptor against the fixture's OWN independent encryptors
  * (the m59/PdfCrypt discipline): default/blank passwords open, real
  * passwords refuse, hostile headers never throw.
  */
class OffCryptoSpec extends AnyFunSuite {

  private def velvetXls(text: String, pw: String,
                        cryptoApi: Boolean = false): Array[Byte] = {
    val records = Seq(
      XlsFixture.sst(Seq(XlsFixture.sstEntry(text)), total = 1),
      XlsFixture.labelSst(0, 0, 0))
    if (cryptoApi) OffCryptFixture.cryptoApiXls(records, pw)
    else OffCryptFixture.rc4Xls(records, pw)
  }

  test("VelvetSweatshop .xls opens (RC4 standard); real password refuses") {
    val open = velvetXls("quarterly numbers", "VelvetSweatshop")
    assert(Xls.extractText(open).map(_.text).contains("quarterly numbers"))
    assert(!Xls.isEncrypted(open))
    assert(DocumentProbe.extractText(open).contains("quarterly numbers"))
    assert(DocumentProbe.probe(open).exists(m =>
      m.format == "xls" && !m.encrypted))

    val locked = velvetXls("secret numbers", "realpassword")
    assert(Xls.extractText(locked).isEmpty)
    assert(Xls.isEncrypted(locked))
    assert(DocumentProbe.probe(locked).exists(m =>
      m.format == "xls" && m.encrypted))
  }

  test("blank-password .xls opens too (the other default)") {
    val open = velvetXls("blank pw sheet", "")
    assert(Xls.extractText(open).map(_.text).contains("blank pw sheet"))
  }

  test("RC4 CryptoAPI .xls: VelvetSweatshop opens, real refuses") {
    val open = velvetXls("cryptoapi cells", "VelvetSweatshop",
      cryptoApi = true)
    assert(Xls.extractText(open).map(_.text).contains("cryptoapi cells"))
    val locked = velvetXls("x", "secret", cryptoApi = true)
    assert(Xls.extractText(locked).isEmpty)
    assert(Xls.isEncrypted(locked))
  }

  test("1024-byte RC4 rekeying: a workbook spanning blocks round-trips") {
    val strings = (0 until 60).map(i => s"row $i cell text padding ${i * 7}")
    val records =
      Seq(XlsFixture.sst(strings.map(s => XlsFixture.sstEntry(s)),
        total = strings.length)) ++
        strings.indices.map(i => XlsFixture.labelSst(i, 0, i.toLong))
    val open = OffCryptFixture.rc4Xls(records, "VelvetSweatshop")
    val got = Xls.extractText(open).map(_.text).getOrElse("")
    assert(got.linesIterator.size == strings.length)
    assert(got.contains("row 0 cell text padding 0"))
    assert(got.contains("row 59 cell text padding 413"))
  }

  test("standard-encrypted OOXML (ECMA-376 AES-ECB): blank opens") {
    val docx = DocxFixture.docx(
      Seq(DocxFixture.para(DocxFixture.T("standard encrypted body"))),
      coreTitle = Some("Locked Report"))
    val open = OffCryptFixture.stdEncryptedOoxml(docx, "")
    assert(Ole2.classify(open).contains("encrypted-ooxml"))
    assert(DocumentProbe.probe(open).exists(m =>
      m.format == "docx" && !m.encrypted))
    assert(DocumentProbe.extractText(open)
      .contains("standard encrypted body"))
    assert(DocumentProbe.title(open).contains("Locked Report"))

    val locked = OffCryptFixture.stdEncryptedOoxml(docx, "realpassword")
    assert(DocumentProbe.probe(locked).exists(m =>
      m.format == "encrypted-ooxml" && m.encrypted))
    assert(DocumentProbe.extractText(locked).isEmpty)
    assert(DocumentProbe.title(locked).isEmpty)
  }

  test("standard encryption also opens VelvetSweatshop (Excel's default)") {
    val xlsx = XlsxFixture.xlsx1(
      Seq(XlsxFixture.SRef("A1", 0)),
      sharedStrings = Some(Seq(XlsxFixture.si("velvet xlsx cell"))))
    val open = OffCryptFixture.stdEncryptedOoxml(xlsx, "VelvetSweatshop")
    assert(DocumentProbe.probe(open).exists(_.format == "xlsx"))
    assert(DocumentProbe.extractText(open).contains("velvet xlsx cell"))
  }

  test("agile-encrypted OOXML (SHA-512 / AES-256-CBC): blank opens") {
    val docx = DocxFixture.docx(
      Seq(DocxFixture.para(DocxFixture.T("agile encrypted body"))),
      coreTitle = Some("Agile Report"))
    val open = OffCryptFixture.agileEncryptedOoxml(docx, "")
    assert(DocumentProbe.probe(open).exists(m =>
      m.format == "docx" && !m.encrypted))
    assert(DocumentProbe.extractText(open).contains("agile encrypted body"))
    assert(DocumentProbe.title(open).contains("Agile Report"))
    val inv = DocumentProbe.inventory(open)
    assert(inv.format.contains("docx") &&
      inv.title.contains("Agile Report"))

    val locked = OffCryptFixture.agileEncryptedOoxml(docx, "realpassword")
    assert(DocumentProbe.extractText(locked).isEmpty)
    assert(DocumentProbe.probe(locked).exists(m =>
      m.format == "encrypted-ooxml" && m.encrypted))
    assert(DocumentProbe.inventory(locked).format
      .contains("encrypted-ooxml"))
  }

  test("agile packages larger than one 4096-byte segment round-trip") {
    // deflate-proof filler: distinct hex noise per paragraph keeps the
    // ZIP over two 4096-byte encryption segments
    def noise(seed: Int): String = {
      val d = java.security.MessageDigest.getInstance("SHA-256")
      (0 until 16).map { i =>
        d.update((seed * 31 + i).toByte)
        d.digest().map("%02x".format(_)).mkString
      }.mkString(" ")
    }
    val docx = DocxFixture.docx(
      DocxFixture.para(DocxFixture.T("segment marker paragraph")) +:
        (0 until 20).map(i =>
          DocxFixture.para(DocxFixture.T(noise(i)))))
    assert(docx.length > 4096 * 2)
    val open = OffCryptFixture.agileEncryptedOoxml(docx, "")
    assert(DocumentProbe.extractText(open)
      .exists(_.contains("segment marker paragraph")))
  }

  test("high-but-conforming spinCount verifies: the cap sits at the " +
    "MS-OFFCRYPTO spec ceiling (10M), not below it") {
    // r16 tightened the cap to 1M, refusing spec-conforming documents
    // with unusual-but-legal spins. 2M is above that bad cap and well
    // under the 10M spec ceiling; it must decrypt.
    val docx = DocxFixture.docx(Seq(
      DocxFixture.para(DocxFixture.T("high spin body"))))
    val open = OffCryptFixture.agileEncryptedOoxml(docx, "",
      spin = 2000000)
    assert(DocumentProbe.extractText(open).exists(
      _.contains("high spin body")))
  }

  test("hostile EncryptionInfo never throws: torn, junk XML, lying spin") {
    val docx = DocxFixture.docx(Seq(DocxFixture.para(DocxFixture.T("x"))))
    val good = OffCryptFixture.stdEncryptedOoxml(docx, "")
    val files = Ole2.streams(good).get
    val info = files("EncryptionInfo")
    val pkg = files("EncryptedPackage")
    // torn header at every interesting boundary
    for (cut <- Seq(0, 4, 8, 12, 40, info.length / 2))
      assert(OffCrypto.decryptPackage(info.take(cut), pkg).isEmpty)
    // junk bytes
    assert(OffCrypto.decryptPackage(
      Array.fill[Byte](64)(0x41), pkg).isEmpty)
    assert(OffCrypto.decryptPackage(null, pkg).isEmpty)
    assert(OffCrypto.decryptPackage(info, null).isEmpty)
    // truncated package: verifier passes but size lies
    assert(OffCrypto.decryptPackage(info, pkg.take(4)).isEmpty)
    // agile with unparseable XML / hostile spinCount
    val junkAgile = Array[Byte](4, 0, 4, 0, 0x40, 0, 0, 0) ++
      "<not-xml".getBytes("UTF-8")
    assert(OffCrypto.decryptPackage(junkAgile, pkg).isEmpty)
    val hugeSpin = Array[Byte](4, 0, 4, 0, 0x40, 0, 0, 0) ++
      ("""<encryption xmlns="x"><keyData saltSize="16" blockSize="16"
         | keyBits="256" hashSize="64" cipherAlgorithm="AES"
         | cipherChaining="ChainingModeCBC" hashAlgorithm="SHA512"
         | saltValue="AAAAAAAAAAAAAAAAAAAAAA=="/><keyEncryptors>
         |<keyEncryptor uri="y"><encryptedKey spinCount="2000000000"
         | saltSize="16" blockSize="16" keyBits="256" hashSize="64"
         | cipherAlgorithm="AES" cipherChaining="ChainingModeCBC"
         | hashAlgorithm="SHA512" saltValue="AAAAAAAAAAAAAAAAAAAAAA=="
         | encryptedVerifierHashInput="AAAAAAAAAAAAAAAAAAAAAA=="
         | encryptedVerifierHashValue="AAAAAAAAAAAAAAAAAAAAAA=="
         | encryptedKeyValue="AAAAAAAAAAAAAAAAAAAAAA=="/>
         |</keyEncryptor></keyEncryptors></encryption>"""
        .stripMargin.replace("\n", "")).getBytes("UTF-8")
    assert(OffCrypto.decryptPackage(hugeSpin, pkg).isEmpty)
    // torn FilePass on the biff8 side
    val torn = velvetXls("x", "VelvetSweatshop")
    assert(OffCrypto.decryptBiff8("nonsense".getBytes).isEmpty)
    assert(OffCrypto.decryptBiff8(new Array[Byte](64)).isEmpty)
    Ole2.streams(torn).foreach { f =>
      val wb = f("Workbook")
      for (cut <- Seq(8, 20, 40))
        OffCrypto.decryptBiff8(wb.take(cut)) // must not throw
    }
  }
}
