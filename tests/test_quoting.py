"""Golden tests for quoting/identifier/integer helpers.

Goldens derive from Go's strconv.Quote behavior and
/root/reference/pkg/utils/string.go:15-64 semantics.
"""

from nebula_importer_spark.functions.quoting import (
    convert_identifier,
    go_quote,
    is_unsigned_integer,
)


def test_go_quote_basic():
    assert go_quote("str1") == '"str1"'
    assert go_quote("") == '""'
    assert go_quote('say "hi"') == '"say \\"hi\\""'
    assert go_quote("back\\slash") == '"back\\\\slash"'
    assert go_quote("tab\there") == '"tab\\there"'
    assert go_quote("line\nbreak") == '"line\\nbreak"'
    assert go_quote("cr\rhere") == '"cr\\rhere"'
    assert go_quote("bell\a") == '"bell\\a"'
    assert go_quote("vt\v") == '"vt\\v"'


def test_go_quote_unicode_printable_kept():
    # strconv.Quote keeps printable non-ASCII as-is, but escapes non-ASCII
    # spacing chars (Go IsPrint only admits the ASCII space, U+0020)
    assert go_quote("中国（　　）") == '"中国（\\u3000\\u3000）"'
    assert go_quote("café") == '"café"'
    assert go_quote("😀") == '"😀"'


def test_go_quote_nonprintable():
    assert go_quote("\x00") == '"\\x00"'
    assert go_quote("\x1b") == '"\\x1b"'
    assert go_quote("\x7f") == '"\\x7f"'


def test_convert_identifier():
    assert convert_identifier("name") == "`name`"
    assert convert_identifier("na`me") == "`na\\`me`"
    assert convert_identifier("na\\me") == "`na\\\\me`"
    assert convert_identifier("na\\`me") == "`na\\\\\\`me`"


def test_is_unsigned_integer():
    # goldens from pkg/picker/config_test.go:182-226 TIMESTAMP duals
    assert is_unsigned_integer("1578770903")
    assert is_unsigned_integer("0")
    assert is_unsigned_integer("12")
    assert is_unsigned_integer("0123456789")
    assert is_unsigned_integer("9876543210")
    assert is_unsigned_integer("0x0123456789abcdef")
    assert is_unsigned_integer("0X0123456789ABCDEF")
    assert not is_unsigned_integer("")
    assert not is_unsigned_integer("0x")
    assert not is_unsigned_integer("0X")
    assert not is_unsigned_integer("2020-01-11T19:28:23")
    assert not is_unsigned_integer("-1")
    assert not is_unsigned_integer("1.5")


def test_exact_quote_column_end_to_end(spark):
    """exact_quote renders via go_quote (pandas UDF): byte parity with
    strconv.Quote on arbitrary non-printables the codegen fast path
    passes through raw."""
    from nebula_importer_spark.operators.mapping import node_values
    from nebula_importer_spark.plans.specs import NodeIDSpec, NodeSpec, PropSpec
    from tests.conftest import records_df

    spec = NodeSpec(
        name="t",
        id=NodeIDSpec(type="INT", index=0),
        props=[PropSpec("p", "STRING", 1, exact_quote=True)],
    )
    rows = [["1", "nul\x00byte"], ["2", "line\u2028sep"], ["3", "del\x7f"], ["4", "中国（　　）"]]
    df = records_df(spark, rows)
    got = {r.vid: r.p_p for r in node_values(df, spec).collect()}
    assert got["1"] == '"nul\\x00byte"'
    assert got["2"] == '"line\\u2028sep"'
    assert got["3"] == '"del\\x7f"'
    assert got["4"] == '"中国（\\u3000\\u3000）"'
    # same strings through the fast path: C0 escapes only, exotics raw
    for r in rows:
        assert go_quote(r[1]).startswith('"')
