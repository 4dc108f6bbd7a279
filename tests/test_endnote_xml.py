"""EndNote XML parser parity tests. Source: /root/reference/src/endnote_xml/mod.rs:112-523."""

from biblib_spark.kernels.endnote_xml import parse_endnote_xml

COMPLETE = """<?xml version="1.0" encoding="UTF-8"?>
<xml>
  <records>
    <record>
      <ref-type name="Journal Article">17</ref-type>
      <contributors><authors>
          <author>Smith, John A.</author>
          <author>Doe, Jane B.</author>
          <author>Brown, Robert C.</author>
      </authors></contributors>
      <titles>
        <title>Advanced Methods in Computational Biology</title>
        <secondary-title>Journal of Computational Science</secondary-title>
        <alt-title>J Comput Sci</alt-title>
      </titles>
      <volume>25</volume>
      <number>4</number>
      <pages>123-145</pages>
      <year>2023</year>
      <electronic-resource-num>10.1016/j.jocs.2023.123456</electronic-resource-num>
      <url>https://www.sciencedirect.com/science/article/example</url>
      <abstract>This paper presents novel computational methods.</abstract>
      <keywords>
        <keyword>computational biology</keyword>
        <keyword>algorithms</keyword>
      </keywords>
      <language>English</language>
      <publisher>Elsevier</publisher>
      <isbn>1877-7503</isbn>
      <accession-num>ENDNOTE-123</accession-num>
      <custom2>PMC9876543</custom2>
    </record>
    <record>
      <contributors><authors><author>Wilson, Emily</author></authors></contributors>
      <titles>
        <title>Machine Learning Applications in Healthcare</title>
        <secondary-title>Nature Medicine</secondary-title>
      </titles>
      <volume>29</volume>
      <electronic-resource-num>10.1038/s41591-023-02234-x</electronic-resource-num>
    </record>
  </records>
</xml>"""


def test_complete_endnote_xml():
    citations, errors = parse_endnote_xml(COMPLETE)
    assert errors == []
    assert len(citations) == 2
    c1 = citations[0]
    assert c1["citation_type"] == ["Journal Article"]
    assert c1["title"] == "Advanced Methods in Computational Biology"
    assert c1["journal"] == "Journal of Computational Science"
    assert c1["journal_abbr"] == "J Comput Sci"
    a = c1["authors"][0]
    assert (a["name"], a["given_name"], a["middle_name"]) == ("Smith", "John", "A.")
    assert c1["volume"] == "25"
    assert c1["issue"] == "4"
    assert c1["pages"] == "123-145"
    assert c1["date"]["year"] == 2023
    assert "10.1016" in c1["doi"]
    assert c1["urls"] == ["https://www.sciencedirect.com/science/article/example"]
    assert c1["keywords"] == ["computational biology", "algorithms"]
    assert c1["language"] == "English"
    assert c1["publisher"] == "Elsevier"
    assert c1["issn"] == ["1877-7503"]
    assert c1["accession_number"] == "ENDNOTE-123"
    assert c1["pmc_id"] == "PMC9876543"
    c2 = citations[1]
    assert c2["journal"] == "Nature Medicine"
    assert "10.1038" in c2["doi"]


def test_minimal_and_author_only():
    xml = "<xml><records><record><titles><title>Minimal Citation</title></titles></record></records></xml>"
    citations, _ = parse_endnote_xml(xml)
    assert citations[0]["title"] == "Minimal Citation"

    xml = (
        "<xml><records><record><contributors><authors>"
        "<author>Anonymous Author</author></authors></contributors></record></records></xml>"
    )
    citations, errors = parse_endnote_xml(xml)
    assert errors == []
    assert citations[0]["title"] == ""
    assert citations[0]["authors"][0]["name"] == "Anonymous"
    assert citations[0]["authors"][0]["given_name"] == "Author"


def test_dates_nesting():
    xml = (
        "<xml><records><record>"
        "<titles><title>T</title><secondary-title>Test Journal</secondary-title></titles>"
        "<dates><year>2023</year></dates>"
        "</record></records></xml>"
    )
    c = parse_endnote_xml(xml)[0][0]
    assert c["date"] == {"year": 2023, "month": None, "day": None}
    assert c["journal"] == "Test Journal"


def test_year_attributes():
    xml = (
        '<xml><records><record><titles><title>T</title></titles>'
        '<dates><year year="2022" month="7" day="15">ignored</year></dates>'
        "</record></records></xml>"
    )
    c = parse_endnote_xml(xml)[0][0]
    assert c["date"] == {"year": 2022, "month": 7, "day": 15}


def test_empty_record_quarantined():
    xml = "<xml><records><record><!-- no content --></record></records></xml>"
    citations, errors = parse_endnote_xml(xml)
    assert citations == []
    assert errors[0]["error_kind"] == "missing_value"
    assert errors[0]["error_line"] is not None


def test_title_fallback_scenarios():
    xml = "<xml><records><record><titles><alt-title>Only Alt Title</alt-title></titles></record></records></xml>"
    c = parse_endnote_xml(xml)[0][0]
    assert c["title"] == "Only Alt Title"

    xml = (
        "<xml><records><record><titles>"
        "<secondary-title>Secondary as Title</secondary-title>"
        "<alt-title>Alt as Journal</alt-title>"
        "</titles></record></records></xml>"
    )
    c = parse_endnote_xml(xml)[0][0]
    assert c["title"] == "Secondary as Title"
    assert c["journal"] == "Alt as Journal"


def test_malformed_xml_quarantined():
    xml = "<xml><records><record><title>Unclosed Title</record></records></xml>"
    citations, errors = parse_endnote_xml(xml)
    assert citations == []
    assert errors and errors[0]["error_kind"] == "syntax"


def test_empty_inputs():
    assert parse_endnote_xml("") == ([], [])
    assert parse_endnote_xml("   \n  \t  ") == ([], [])
    assert parse_endnote_xml("<xml><records></records></xml>") == ([], [])


def test_entity_unescaping():
    xml = (
        "<xml><records><record><titles>"
        "<title>A &amp; B &lt;Study&gt;</title></titles></record></records></xml>"
    )
    c = parse_endnote_xml(xml)[0][0]
    assert c["title"] == "A & B <Study>"
