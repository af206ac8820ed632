"""Golden tests for the byte-identical text invariants (BASELINE.md row
'per-row invariant'): scalar reference form vs Arrow-vectorized form, and
parity with the reference normalizer's documented semantics
(/root/reference/Duke/utils.py:12-19)."""

import pyarrow as pa
import pytest

from duke_ray.text import (
    extract_html_text,
    extract_html_text_arrow,
    fnv1a64,
    fnv1a64_arrow,
    normalize_text,
    normalize_text_arrow,
    tokenize_arrow,
    underscore,
)

CASES = [
    "PlayerName",
    "HTTPServer",
    "home-runs (total)",
    "snake_case_already",
    "MixedCASEWord",
    "a  double  space",
    "trailing_",
    "",
    "ABC",
    "camelCase99Numbers",
    "the fast key order sort table scan",
    "weird-(parens)-and-dashes",
]


def test_underscore_known_values():
    # values match the public inflection.underscore algorithm
    assert underscore("PlayerName") == "player_name"
    assert underscore("HTTPServer") == "http_server"
    assert underscore("already_snake") == "already_snake"
    assert underscore("with-dash") == "with_dash"
    assert underscore("ABC") == "abc"
    assert underscore("camelCase99Numbers") == "camel_case99_numbers"


def test_normalize_text_matches_reference_semantics():
    assert normalize_text("PlayerName") == ["player", "name"]
    assert normalize_text("home-runs (total)") == ["home", "runs", "total"]
    assert normalize_text("a  double  space") == ["a", "", "double", "", "space"]
    assert normalize_text("PlayerName", to_list=False) == "player name"


@pytest.mark.parametrize("case", CASES)
def test_vectorized_normalize_matches_scalar(case):
    arrow = normalize_text_arrow(pa.array([case]))[0].as_py()
    assert arrow == normalize_text(case, to_list=False)


def test_tokenize_arrow_matches_scalar():
    toks = tokenize_arrow(pa.array(CASES))
    for i, case in enumerate(CASES):
        assert toks[i].as_py() == normalize_text(case)


HTML_CASES = [
    b"<html><body><p>hello world</p></body></html>",
    b"<html><head><script>var x = 1;</script><style>p{}</style></head><body>a b</body></html>",
    b"<div>a<!-- comment -->b</div>",
    b"x &amp; y &lt;tag&gt; &quot;q&quot; &#39;s&#39; &nbsp;end",
    b"  lots \n\t of\r\nwhitespace  ",
    b"<p>unclosed",
    b"",
    "café <b>bold</b>".encode(),
    b"\xff\xfe invalid utf8 <b>x</b>",
    # adversarial nesting: fused-alternation vs sequential-pass equivalence
    b"<!-- <script>x</script> -->after",
    b"<script><!-- </script> -->tail",
    b"<style>a<!--b--></style>c",
    b"<scr<!-- -->ipt>text",
    b"<SCRIPT foo>UPPER</SCRIPT>ok<STYLE>s</STYLE>",
    b"<script>unclosed... <style>nope</style>",
    # interleaved close tags (ADVICE r1): sequential passes would yield
    # 'a d' here; the pinned fused-alternation semantics yield 'c d' in
    # BOTH forms — this case locks the scalar spec to the fused pass.
    b"<style>a<script>b</style>c</script>d",
    b"<script>a<style>b</script>c</style>d",
    b"<!--a<script>b-->c</script>d",
]


@pytest.mark.parametrize("html", HTML_CASES)
def test_extract_scalar_vs_vectorized(html):
    scalar = extract_html_text(html)
    vec = extract_html_text_arrow(pa.array([html], pa.binary()))[0].as_py()
    assert vec == scalar


def test_extract_interleaved_pinned_semantics():
    # Pinned value, not just scalar==vector: fused alternation removes the
    # leftmost block first.
    assert extract_html_text(b"<style>a<script>b</style>c</script>d") == "c d"


def test_extract_examples():
    assert extract_html_text(b"<html><body><p>hello world</p></body></html>") == "hello world"
    assert extract_html_text(b"<script>bad()</script>ok") == "ok"
    assert extract_html_text(b"x &amp; y") == "x & y"
    assert extract_html_text(None) is None


def test_fnv1a64_vectorized_matches_scalar():
    vals = ["", "a", "abc", "hash join", "café", "x" * 300]
    hashes = fnv1a64_arrow(pa.array(vals))
    for i, v in enumerate(vals):
        assert int(hashes[i]) == fnv1a64(v)


def test_fnv1a64_known_vector():
    # FNV-1a 64 published test vectors
    assert fnv1a64("") == 0xCBF29CE484222325
    assert fnv1a64("a") == 0xAF63DC4C8601EC8C
