"""Unit tests for the VRL-subset expression compiler.

Covers the condition forms the reference documents/uses
(config_panel.rs:1548-1599, config/demo.toml:16-21,
dev/configs/production/vector.toml:24-39).
"""

import pyarrow as pa
import pytest

from vector_ray.vrl import VrlError, compile_expr, compile_predicate

TBL = pa.table(
    {
        "level": ["error", "info", "warn", "error", None],
        "status": [500, 200, 301, 404, None],
        "status_str": ["500", "200", "abc", "404", None],
        "message": [
            "disk ERROR on /dev/sda",
            "user login ok",
            "latency warning",
            "FATAL: oom",
            None,
        ],
        "n": [1, 2, 3, 4, 5],
    }
)


def mask(cond):
    return compile_predicate(cond)(TBL).to_pylist()


def test_eq():
    assert mask('.level == "error"') == [True, False, False, True, False]


def test_ne():
    assert mask('.level != "error"') == [False, True, True, False, False]


def test_ge():
    assert mask(".status >= 400") == [True, False, False, True, False]


def test_exists():
    assert mask("exists(.level)") == [True, True, True, True, False]
    assert mask("exists(.nope)") == [False] * 5


def test_contains():
    assert mask('contains(string!(.message), "ERROR")') == [
        True, False, False, False, False]


def test_match_regex():
    assert mask(".level == \"error\" || match(.message, r'ERROR|FATAL')") == [
        True, False, False, True, False]


def test_and_or_not():
    assert mask('.level == "error" && .status == 500') == [
        True, False, False, False, False]
    assert mask('!(.level == "error")') == [False, True, True, False, False]


def test_coalesce_to_int():
    # to_int(.status_str) ?? 200 — "abc" and null fall back to 200
    vals = compile_expr("to_int(.status_str) ?? 200")(TBL).to_pylist()
    assert vals == [500, 200, 200, 404, 200]


def test_arith_and_mod():
    assert mask(".n % 2 == 0") == [False, True, False, True, False]
    assert compile_expr(".n * 10 + 1")(TBL).to_pylist() == [11, 21, 31, 41, 51]


def test_string_numeric_comparison_coercion():
    # VRL-ish: string column compared to number literal
    assert mask('.status_str == 500') == [True, False, False, False, False]


def test_length_upcase():
    assert compile_expr("length(.level)")(TBL).to_pylist() == [5, 4, 4, 5, None]
    assert compile_expr("upcase(.level)")(TBL).to_pylist()[0] == "ERROR"


def test_missing_column_is_null_safe():
    assert mask('.ghost == "x"') == [False] * 5


def test_bad_syntax_raises():
    with pytest.raises(VrlError):
        compile_expr(".a ==")
    with pytest.raises(VrlError):
        compile_expr("unknownfn(.a)")
    with pytest.raises(VrlError):
        compile_expr(".a @@ 3")


def test_string_functions():
    t = pa.table({"s": ["  Hello  ", "foo-bar", None]})
    assert compile_expr('replace(.s, r"o", "0")')(t).to_pylist() == [
        "  Hell0  ", "f00-bar", None]
    assert compile_expr("trim(.s)")(t).to_pylist() == ["Hello", "foo-bar", None]
    assert compile_expr('split(.s, "-")')(t).to_pylist()[1] == ["foo", "bar"]
    import hashlib

    assert compile_expr("md5(.s)")(t).to_pylist()[1] == hashlib.md5(
        b"foo-bar").hexdigest()


def test_now_returns_timestamp():
    t = pa.table({"x": [1]})
    v = compile_expr("now()")(t)
    assert pa.types.is_timestamp(v.type)


def test_regex_literal_preserves_backslashes():
    t = pa.table({"msg": ["user=Bob id=77", "nothing here"]})
    assert compile_expr(r'replace(.msg, r"user=\w+", "X")')(t).to_pylist() == [
        "X id=77", "nothing here"]
    assert compile_expr(r'match(.msg, r"id=\d+")')(t).to_pylist() == [True, False]


def test_replace_literal_vs_regex():
    t = pa.table({"s": ["a.b.c", "v1 (v1)"]})
    # plain string = literal substring
    assert compile_expr('replace(.s, ".", "-")')(t).to_pylist() == [
        "a-b-c", "v1 (v1)"]
    assert compile_expr('replace(.s, "(v1)", "v2")')(t).to_pylist() == [
        "a.b.c", "v1 v2"]
    # regex literal = pattern
    assert compile_expr(r'replace(.s, r".", "-")')(t).to_pylist()[0] == "-----"


def test_string_utility_functions():
    t = pa.table({"s": ["  hi  ", "abcdef", None]})
    assert compile_expr("strip_whitespace(.s)")(t).to_pylist() == [
        "hi", "abcdef", None]
    assert compile_expr("truncate(.s, 3)")(t).to_pylist() == [
        "  h", "abc", None]


def test_to_string_and_to_bool():
    t = pa.table({"n": [1, 0, None], "s": ["true", "NO", "junk"]})
    assert compile_expr("to_string(.n)")(t).to_pylist() == ["1", "0", None]
    assert compile_expr("to_bool(.s)")(t).to_pylist() == [True, False, None]
    assert compile_expr("to_bool(.n)")(t).to_pylist() == [True, False, None]
    import pytest

    from vector_ray.vrl import VrlError

    with pytest.raises(VrlError):
        compile_expr("to_bool!(.s)")(t)


def test_base64_roundtrip():
    t = pa.table({"s": ["hello", "", None]})
    enc = compile_expr("encode_base64(.s)")(t)
    assert enc.to_pylist() == ["aGVsbG8=", "", None]
    t2 = pa.table({"e": enc})
    assert compile_expr("decode_base64(.e)")(t2).to_pylist() == [
        "hello", "", None]
    bad = pa.table({"e": ["!!!notb64"]})
    assert compile_expr("decode_base64(.e)")(bad).to_pylist() == [None]


def test_parse_url_op():
    from vector_ray.stages.core import _compile_op

    t = pa.table({"url": [
        "https://a.example.org:8080/p/q?x=1#frag",
        "http://plain.host",
        "not a url",
        None,
    ]})
    out = _compile_op({"op": "parse_url", "field": "url"})(t)
    assert out["url_scheme"].to_pylist() == ["https", "http", None, None]
    assert out["url_host"].to_pylist() == [
        "a.example.org", "plain.host", None, None]
    assert out["url_port"].to_pylist() == ["8080", None, None, None]
    assert out["url_path"].to_pylist() == ["/p/q", None, None, None]
    assert out["url_query"].to_pylist() == ["x=1", None, None, None]
    assert out["url_fragment"].to_pylist() == ["frag", None, None, None]


def test_sha_variants():
    import hashlib

    t = pa.table({"s": ["abc", None]})
    for algo in ("sha1", "sha512"):
        out = compile_expr(f"{algo}(.s)")(t).to_pylist()
        assert out == [getattr(hashlib, algo)(b"abc").hexdigest(), None]


def test_ip_cidr_contains():
    from vector_ray.vrl import VrlError, compile_predicate

    t = pa.table({"ip": [
        "10.64.0.1", "10.63.255.255", "10.127.3.4",
        "256.1.1.1", "nope", None, "0.0.0.0",
    ]})
    # expr form keeps nulls for invalid; predicate fills to False
    e = compile_expr('ip_cidr_contains("10.64.0.0/10", .ip)')(t)
    assert e.to_pylist() == [True, False, True, None, None, None, False]
    m = compile_predicate('ip_cidr_contains("10.64.0.0/10", .ip)')(t)
    assert m.to_pylist() == [True, False, True, False, False, False, False]
    # /0 matches every valid address; /32 is exact
    assert compile_predicate('ip_cidr_contains("0.0.0.0/0", .ip)')(t).to_pylist() == [
        True, True, True, False, False, False, True]
    assert compile_predicate('ip_cidr_contains("10.64.0.1/32", .ip)')(t).to_pylist() == [
        True, False, False, False, False, False, False]
    # fallible form raises on any invalid address
    with pytest.raises(VrlError):
        compile_predicate('ip_cidr_contains!("10.0.0.0/8", .ip)')(t)
    # malformed CIDR literals rejected at compile time
    for bad in ("10.0.0.0/40", "300.0.0.0/8", "10.0.0.0", "x/8"):
        with pytest.raises(VrlError):
            compile_predicate(f'ip_cidr_contains("{bad}", .ip)')


def test_unix_timestamp_conversions():
    from vector_ray.vrl import VrlError

    t = pa.table({
        "ts": pa.array([1_700_000_000_123_456, None], pa.timestamp("us")),
        "n": pa.array([1_700_000_000, None], pa.int64()),
    })
    assert compile_expr("to_unix_timestamp(.ts)")(t).to_pylist() == [
        1_700_000_000, None]
    assert compile_expr('to_unix_timestamp(.ts, "milliseconds")')(t).to_pylist() == [
        1_700_000_000_123, None]
    back = compile_expr("from_unix_timestamp(.n)")(t)
    assert back.type == pa.timestamp("us")
    assert back[0].as_py().timestamp() == 1_700_000_000
    # nanosecond round-trip is exact at us precision
    rt = compile_expr(
        'from_unix_timestamp(to_unix_timestamp(.ts, "nanoseconds"), "nanoseconds")'
    )(t)
    assert rt.to_pylist() == t["ts"].to_pylist()
    with pytest.raises(VrlError):
        compile_expr('to_unix_timestamp(.ts, "fortnights")')


def test_string_concat_plus():
    from vector_ray.vrl import VrlError

    t = pa.table({"a": ["x", None, "z"], "b": ["1", "2", None], "n": [1, 2, 3]})
    assert compile_expr('.a + "-" + .b')(t).to_pylist() == ["x-1", None, None]
    assert compile_expr('"pre:" + .a')(t).to_pylist() == ["pre:x", None, "pre:z"]
    assert compile_expr('to_string(.n) + "!"')(t).to_pylist() == ["1!", "2!", "3!"]
    # numeric + stays numeric; mixed string/number is a type error
    assert compile_expr(".n + 1")(t).to_pylist() == [2, 3, 4]
    with pytest.raises(VrlError):
        compile_expr(".a + .n")(t)


def test_parse_duration():
    from vector_ray.vrl import VrlError

    t = pa.table({"d": ["250ms", "1.5s", "2h", " 3 m ", "1.2us", "1µs",
                        "4d", "nope", None]})
    out = compile_expr('parse_duration(.d, "s")')(t).to_pylist()
    assert out[:7] == [0.25, 1.5, 7200.0, 180.0, 1.2e-06, 1e-06, 345600.0]
    assert out[7] is None and out[8] is None
    ms = compile_expr('parse_duration(.d, "ms")')(t).to_pylist()
    assert ms[0] == 250.0 and ms[1] == 1500.0
    with pytest.raises(VrlError):
        compile_expr('parse_duration!(.d, "s")')(t)
    with pytest.raises(VrlError):
        compile_expr('parse_duration(.d, "fortnights")')


def test_unix_timestamp_edge_cases():
    """Regression: nanosecond counts with sub-microsecond digits must
    truncate (not raise), and pre-epoch conversion floors like SQL
    epoch() rather than truncating toward zero."""
    t = pa.table({"n": pa.array([1_700_000_000_123_456_789, None], pa.int64())})
    out = compile_expr('from_unix_timestamp(.n, "nanoseconds")')(t)
    assert out.type == pa.timestamp("us")
    assert out[0].as_py().microsecond == 123456
    t2 = pa.table(
        {"ts": pa.array([-500_000, 500_000, -1_000_000, -1_500_000],
                        pa.timestamp("us"))}
    )
    assert compile_expr("to_unix_timestamp(.ts)")(t2).to_pylist() == [-1, 0, -1, -2]


def test_ipv4_strict_octets():
    """Leading-zero octets are invalid IPv4 (octal ambiguity) — null in
    the plain form, like other unparseable addresses."""
    t = pa.table({"ip": ["010.064.0.1", "10.64.0.1", "10.064.0.1", "0.0.0.0"]})
    assert compile_expr('ip_cidr_contains("10.64.0.0/10", .ip)')(t).to_pylist() == [
        None, True, None, False]


def test_base64_encode_decode():
    """Vectorized base64 matches stdlib on every padding length; decode
    is fallible (malformed -> null) and round-trips unicode."""
    import base64

    from vector_ray.vrl import _b64_decode_array, _b64_encode_array

    vals = ["", "f", "fo", "foo", "foob", "fooba", "foobar", None,
            "hello world! " * 7, "éè unicode ✓"]
    arr = pa.array(vals, pa.string())
    enc = _b64_encode_array(arr)
    assert enc.to_pylist() == [
        base64.b64encode(v.encode()).decode() if v is not None else None
        for v in vals
    ]
    assert _b64_decode_array(enc).to_pylist() == vals
    bad = pa.array(
        ["Zm9v", "bad!", "Zm9vYg==", "Zm9=vYg=", "A===", "abc", None],
        pa.string(),
    )
    assert _b64_decode_array(bad).to_pylist() == [
        "foo", None, "foob", None, None, None, None
    ]


def test_base64_in_vrl_program():
    from vector_ray.vrl import compile_expr

    t = pa.table({"m": pa.array(["abc", "hello"], pa.string())})
    fn = compile_expr("decode_base64(encode_base64(.m))")
    assert fn(t).to_pylist() == ["abc", "hello"]


def test_url_decode():
    """Percent-decoding matches urllib unquote_plus, including lenient
    invalid escapes and multibyte UTF-8."""
    from urllib.parse import unquote_plus

    from vector_ray.vrl import _url_decode_array

    vals = ["hello%20world", "a+b%2Bc", "100%", "%zz", "%2", "",
            None, "caf%C3%A9", "%41%42%43"]
    got = _url_decode_array(pa.array(vals, pa.string())).to_pylist()
    assert got == [
        unquote_plus(v) if v is not None else None for v in vals
    ]


def test_null_literal_comparison_is_vrl_not_sql():
    """VRL treats `null` as a comparable VALUE: `.x == null` is true
    exactly where x is null; `.x != null` is its complement. (Arrow's
    raw kernel yields all-null -> an always-false mask — SQL
    semantics — which silently broke lua `~= nil` translations.)"""
    t = pa.table({"x": [1, None, 3]})
    assert compile_predicate(".x != null")(t).to_pylist() == [
        True, False, True]
    assert compile_predicate(".x == null")(t).to_pylist() == [
        False, True, False]
    # literal-vs-literal folds to a broadcast constant
    assert compile_predicate("null == null")(t).to_pylist() == [True] * 3
    assert compile_predicate("1 == null")(t).to_pylist() == [False] * 3
    with pytest.raises(VrlError, match="order"):
        compile_predicate(".x > null")(t)
