package graft

import java.nio.file.{Files, Path}
import graft.etl.FineGourmet
import graft.sources.Sinks

/** End-to-end star-schema build over synthesized miniature fixtures carrying
  * every documented anomaly of the reference inputs (FIXTURES.md A1-A5):
  * embedded tabs, uppercase/padded emails, phone format zoo, the `"x"` price
  * sentinel, `XX`-prefixed Sale_IDs, duplicate Sale_IDs, null CEGID emails,
  * padded boolean flags, pipe-in-comma boutiques text. Fixture content is
  * synthesized here — NOT copied from the reference data.
  *
  * This is the proof that S1-S4 work on their real formats (CSV glob,
  * multiline JSON, regex text) and that the cleaning vocabulary composes
  * into the reference's star schema.
  */
class FineGourmetEtlSpec extends SparkTestBase {

  private def write(dir: Path, name: String, content: String): Unit =
    Files.writeString(dir.resolve(name), content)

  private lazy val fixtureDir: Path = {
    val dir = Files.createTempDirectory("finegourmet-fixtures")
    write(dir, "202401_sfcc_sales.csv",
      """sale_id,transaction_date,product_id,customer_id,customer_last_name,customer_first_name,customer_email,customer_address,customer_phone,email_optin,sms_optin
        |SA001,2024-01-03,P001,1001,Moreau,Anna,Anna.MOREAU@mail.test,"5 Rue Haute, 75001 Paris",0612345678,true,false
        |SA002,2024-01-15,P002,1002,Du	rand,Luc,luc.durand@mail.test,"8 Quai Bas, 69001 Lyon",0701020304, true,true
        |SA003,2024-01-20,P003,1003,Petit,Zoe,  zoe.petit@mail.test ,"2 Allee Verte, 31000 Toulouse",,false,false
        |""".stripMargin)
    write(dir, "202402_sfcc_sales.csv",
      """sale_id,transaction_date,product_id,customer_id,customer_last_name,customer_first_name,customer_email,customer_address,customer_phone,email_optin,sms_optin
        |SA004,2024-02-05,P004,1001,Moreau,Anna,anna.moreau@mail.test,"5 Rue Haute, 75001 Paris",12345,true,false
        |SA005,2024-02-11,P001,1004,Roche,Leo,leo.roche@mail.test,"""
        .stripMargin + "\"\"\"7 Cours Sud, 13001 Marseille\"\"\",0655555555,false, true\n")
    write(dir, "2024_cegid_sales.json",
      """[
        |  {"sale_id": "PA01240100001", "email": null, "transaction_date": "2024-01-05", "product_name": "Truffle Jam", "quantity": 2, "price": 21.8},
        |  {"sale_id": "PA01240100002", "email": "Anna.Moreau@mail.test", "transaction_date": "2024-01-12", "product_name": "Goat Cheese", "quantity": 1, "price": 18},
        |  {"sale_id": "XXMO240100003", "email": null, "transaction_date": "2024-01-18", "product_name": "Truffle Jam", "quantity": 1, "price": "x"},
        |  {"sale_id": "BO02240800001", "email": null, "transaction_date": "2024-08-01", "product_name": "Olive Oil", "quantity": 3, "price": 22.0},
        |  {"sale_id": "BO02240800001", "email": "carol.blanc@mail.test", "transaction_date": "2024-08-02", "product_name": "Goat Cheese", "quantity": 1, "price": 18.0},
        |  {"sale_id": "MO01240900001", "email": null, "transaction_date": "2024-09-03", "product_name": "Dark Chocolate", "quantity": 4, "price": 9.9}
        |]""".stripMargin)
    write(dir, "2024_product_reference.csv",
      """product_id,product_name,price,category
        |P001,Truffle Jam,12.50,epicerie
        |P002,Goat Cheese,18.00,fromage
        |P003,Olive Oil,22.00,divers
        |""".stripMargin)
    write(dir, "2025_product_reference.csv",
      """product_id,product_name,price,category
        |P001,Truffle Jam,12.50,epicerie
        |P002,Goat Cheese,18.00,fromage
        |P003,Olive Oil,22.00,divers
        |P004,Dark Chocolate,9.90,confiserie
        |""".stripMargin)
    write(dir, "2025_boutiques.csv",
      """store_id,store_name,address
        |PA01|Fine Foods Central|"1 Main Square, 75001 Paris"
        |MO01|Coastal Deli|" 2 Harbor Way, 34000 Montpellier"
        |BO02|Old Town Pantry|"3 Market Lane, 33000 Bordeaux"
        |""".stripMargin)
    dir
  }

  private lazy val star = FineGourmet.buildStar(spark, FineGourmet.Paths(
    sfccGlob = s"$fixtureDir/20240[12]_sfcc_sales.csv",
    cegidJson = s"$fixtureDir/2024_cegid_sales.json",
    productsGlob = s"$fixtureDir/202[45]_product_reference.csv",
    boutiquesText = s"$fixtureDir/2025_boutiques.csv"))

  test("Dim_Product: union of both reference years, deduped by Product_ID") {
    val rows = star.dimProduct.collect()
    assert(rows.length == 4)
    assert(rows.map(_.getString(0)).sorted.toSeq == Seq("P001", "P002", "P003", "P004"))
  }

  test("Dim_Store: regex-text extraction drops header, strips edge quotes/space") {
    val rows = star.dimStore.orderBy("Store_ID").collect()
    assert(rows.map(r => (r.getString(0), r.getString(1))).toSeq == Seq(
      ("BO02", "Old Town Pantry"), ("MO01", "Coastal Deli"), ("PA01", "Fine Foods Central")))
    val mo = rows.find(_.getString(0) == "MO01").get
    assert(mo.getString(2) == "2 Harbor Way, 34000 Montpellier") // leading quote+space gone
  }

  test("Dim_Client: email-collapsed, dense surrogate keys 1..N in email order") {
    val rows = star.dimClient.orderBy("Client_ID").collect()
    val emails = rows.map(_.getString(1)).toSeq
    // anna appears in SFCC twice + CEGID once -> one row; carol is CEGID-only
    assert(emails == Seq("anna.moreau@mail.test", "carol.blanc@mail.test",
      "leo.roche@mail.test", "luc.durand@mail.test", "zoe.petit@mail.test"))
    assert(rows.map(_.getInt(0)).toSeq == Seq(1, 2, 3, 4, 5))
    val anna = rows.find(_.getString(1) == "anna.moreau@mail.test").get
    assert(anna.getString(2) == "Moreau") // first non-null survives the collapse
    assert(anna.getString(4) == "+33612345678")
    val carol = rows.find(_.getString(1) == "carol.blanc@mail.test").get
    assert(carol.isNullAt(2) && carol.isNullAt(4)) // CEGID-only: no name/phone
  }

  test("phone standardization: +33 on 9-digit-after-zero-strip, null otherwise") {
    val clients = star.dimClient.collect()
    val byEmail = clients.map(r => r.getString(1) -> Option(r.getString(4))).toMap
    assert(byEmail("anna.moreau@mail.test").contains("+33612345678"))
    assert(byEmail("luc.durand@mail.test").contains("+33701020304"))
    assert(byEmail("zoe.petit@mail.test").isEmpty)   // empty phone -> null
    // anna's 2nd SFCC row had bad phone "12345" -> null; collapse keeps +33
  }

  test("whitespace scrub: embedded tab collapsed in name") {
    val luc = star.dimClient.filter("Email = 'luc.durand@mail.test'").collect()(0)
    assert(luc.getString(2) == "Du rand")
  }

  test("Fact_Sales: both channels, Type from store nullness, price backfill and repairs") {
    val rows = star.factSales.collect()
    assert(rows.length == 11) // 5 SFCC + 6 CEGID
    val byId = rows.map(r => r.getString(0) -> r).toMap
    // channel derivation (ref loader.py:55-57)
    assert(rows.count(_.getString(3) == "Online") == 5)
    assert(rows.count(_.getString(3) == "Store") == 6)
    // XX prefix repaired and whitelisted into FK_Store_ID (transform.py:184-251)
    assert(byId.contains("MO01240100003"))
    assert(byId("MO01240100003").getString(7) == "MO01")
    // "x" price sentinel -> null -> catalog backfill 12.50 (transform.py:139-170)
    assert(byId("MO01240100003").getDouble(2) == 12.50)
    // duplicate Sale_ID: first keeps id, second suffixed _2 (transform.py:253-261)
    assert(byId.contains("BO02240800001") && byId.contains("BO02240800001_2"))
    // SFCC rows: Quantity defaulted 1, Price joined from catalog
    assert(byId("SA001").getInt(1) == 1)
    assert(byId("SA001").getDouble(2) == 12.50)
    // FK_Client_ID resolved through normalized email
    assert(!byId("PA01240100002").isNullAt(5))
    assert(byId("PA01240100001").isNullAt(5)) // null email -> no client FK
  }

  test("parity: the full ETL over the reference's OWN data files reproduces its documented star") {
    // Input data only — no reference code is executed. Guarded so the suite
    // still passes where the reference snapshot isn't mounted.
    assume(new java.io.File("/root/reference/data/salesforces").isDirectory)
    val refStar = FineGourmet.buildStar(spark, FineGourmet.Paths(
      sfccGlob = "/root/reference/data/salesforces/*.csv",
      cegidJson = "/root/reference/data/cegid/2024_cegid_sales.json",
      productsGlob = "/root/reference/data/product/*.csv",
      boutiquesText = "/root/reference/data/boutiques/2025_boutiques.csv"))
    assert(refStar.dimStore.count() == 13L)    // BASELINE.md: 13 boutiques
    assert(refStar.dimClient.count() == 196L)  // BASELINE.md: Dim_Client ≈ 196
    assert(refStar.factSales.count() == 582L)  // BASELINE.md: Fact_Sales ≈ 582
    // 230 = distinct product_ids across 2024 (196 rows) ∪ 2025 (220 rows);
    // BASELINE.md's "219" was a per-file row estimate, not the union —
    // the reference's own dropDuplicates(Product_ID) yields 230 too
    // (verified against DuckDB COUNT(DISTINCT product_id) on the same CSVs).
    assert(refStar.dimProduct.count() == 230L)
    // surrogate keys dense over clients
    import org.apache.spark.sql.functions.max
    assert(refStar.dimClient.agg(max("Client_ID")).head.getAs[Number](0).longValue == 196L)
  }

  test("sink: partitioned parquet write-read-back preserves rows and prunes by partition") {
    val out = Files.createTempDirectory("graft-sink").resolve("fact").toString
    Sinks.parquet(star.factSales, out, partitionCols = Seq("Type"), mode = "overwrite")
    val back = spark.read.parquet(out)
    assert(back.count() == 11)
    assert(back.filter("Type = 'Store'").count() == 6)
    // partition pruning: the Type predicate lands in PartitionFilters
    val scanned = back.filter("Type = 'Store'").queryExecution.executedPlan.toString
    assert(scanned.contains("PartitionFilters") && scanned.contains("Type"))
  }
}
