"""Codec unit tests — escaping conformance (the special-chars corpus of the
reference, example-virtuoso-server/special-chars.nt, re-expressed), term
rendering, file headers, and parse round-trips."""

import pyarrow as pa
import pytest

from virtuoso_quad_log_ray import rdfpatch as rp


# The 8 escape rules of vql_escape_chars (utils.sql:92-103), order-sensitive.
ESCAPE_CASES = [
    ("plain", "plain"),
    ("back\\slash", "back\\\\slash"),
    ("bell\x07", "bell\\a"),
    ("bs\x08", "bs\\b"),
    ("tab\there", "tab\\there"),
    ("nl\nhere", "nl\\nhere"),
    ("ff\x0c", "ff\\f"),
    ("cr\r", "cr\\r"),
    ('quote"here', 'quote\\"here'),
    # backslash-first ordering: a literal backslash-t must NOT double-escape
    ("\\t", "\\\\t"),
    ("mixed\\\n\"\t", 'mixed\\\\\\n\\"\\t'),
    ("unicode 一部 text", "unicode 一部 text"),
    ("", ""),
]


@pytest.mark.parametrize("raw,expected", ESCAPE_CASES)
def test_escape_literal(raw, expected):
    out = rp.escape_literal(pa.array([raw])).to_pylist()[0]
    assert out == expected


@pytest.mark.parametrize("raw,expected", ESCAPE_CASES)
def test_escape_roundtrip(raw, expected):
    assert rp.unescape_literal_scalar(expected) == raw


def test_escape_roundtrip_property():
    """Any unicode literal survives escape -> unescape (hypothesis).
    The reference documents lossy cases only for sequences it never emits
    (utils.sql:68-91); our renderer emits none of them either."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=300, deadline=None)
    @given(st.text(max_size=200))
    def check(s):
        esc = rp.escape_literal(pa.array([s])).to_pylist()[0]
        assert rp.unescape_literal_scalar(esc) == s
        # escaped form is line-safe: no raw newline/CR/quote breaks the
        # one-line patch format
        assert "\n" not in esc and "\r" not in esc

    check()


def test_control_chars_corpus():
    """U+0001..U+001F: the 6 charclass-escaped controls rewrite, the rest
    pass through raw (matching vql_escape_chars, utils.sql:92-103)."""
    escaped_set = {0x07, 0x08, 0x09, 0x0A, 0x0C, 0x0D}
    for cp in range(1, 0x20):
        raw = f"x{chr(cp)}y"
        out = rp.escape_literal(pa.array([raw])).to_pylist()[0]
        if cp in escaped_set:
            assert chr(cp) not in out and "\\" in out, hex(cp)
        else:
            assert out == raw, hex(cp)
        assert rp.unescape_literal_scalar(out) == raw


def test_format_iri_and_bnode():
    out = rp.format_iri(pa.array(["http://ex.org/a", "_:b1"])).to_pylist()
    assert out == ["<http://ex.org/a>", "_:b1"]


def test_format_object_literal_lang_datatype():
    o_value = pa.array(["hello", "一部", "2024-01-01", "str", "http://ex.org/x"])
    o_is_iri = pa.array([False, False, False, False, True])
    o_lang = pa.array(["", "jpn", "", "", ""])
    o_dt = pa.array(
        ["", "", "http://www.w3.org/2001/XMLSchema#date", rp.XSD_STRING, ""]
    )
    out = rp.format_object(o_value, o_is_iri, o_lang, o_dt).to_pylist()
    assert out == [
        '"hello"',
        '"一部"@jpn',
        '"2024-01-01"^^<http://www.w3.org/2001/XMLSchema#date>',
        '"str"',  # xsd:string suppressed (utils.sql:60-62)
        "<http://ex.org/x>",
    ]


def test_render_patch_line():
    line = rp.render_patch_lines(
        pa.array(["+"]),
        pa.array(["<http://ex.org/s>"]),
        pa.array(["<http://ex.org/p>"]),
        pa.array(['"o"@en']),
        pa.array(["http://ex.org/g"]),
    ).to_pylist()[0]
    assert line == '+ <http://ex.org/s> <http://ex.org/p> "o"@en <http://ex.org/g> .'


def test_file_header_and_parse_roundtrip():
    header = rp.render_file_header("20240101010101", "http://ex.org/g", 2)
    body = header + (
        '+ <http://ex.org/s> <http://ex.org/p> "a b" <http://ex.org/g> .\n'
        '- <http://ex.org/s> <http://ex.org/p> "x \\"y\\""@en <http://ex.org/g> .\n'
    )
    rows, meta = rp.parse_patch_text(body)
    assert meta["at checkpoint"] == "20240101010101"
    assert meta["graph"] == "http://ex.org/g"
    assert meta["base64"] == rp.graph_b64("http://ex.org/g")
    assert meta["amount"] == "2"
    assert rows[0] == {
        "op": "+",
        "s": "<http://ex.org/s>",
        "p": "<http://ex.org/p>",
        "o": '"a b"',
        "g": "http://ex.org/g",
    }
    assert rows[1]["op"] == "-"
    assert rows[1]["o"] == '"x \\"y\\""@en'


def test_graph_b64_roundtrip():
    iri = "http://example.com/clariah"
    assert rp.graph_unb64(rp.graph_b64(iri)) == iri


def test_ts14():
    import datetime

    dt = datetime.datetime(2016, 6, 13, 8, 23, 41)
    assert rp.ts14(dt) == "20160613082341"
    assert rp.ts14_to_w3c("20160613082341") == "2016-06-13T08:23:41Z"


def test_patch_file_name():
    assert rp.patch_file_name(rp.TS14_ZERO, 2) == "rdf_out_00000000000000-00000000000002"
    assert rp.SHAM_NAME == "rdf_out_99999999999999-99999999999999"
