"""Tokenizer conformance: every pinned case from the reference's tests
(tokenizer.rs:133-177) plus the §1.5 quirks from SURVEY.md / FIXTURES.md §2."""

import pytest

from logparse_rs_ray.core.tokenize import extract_field, split_csv
from logparse_rs_ray.core.fnv import fnv1a64


class TestSplitCsv:
    def test_basic(self):
        assert split_csv("a,b,c") == ["a", "b", "c"]

    def test_quoted_comma_and_escaped_quotes(self):
        assert split_csv('"a,b","c""d""e",f') == ["a,b", 'c"d"e', "f"]

    def test_trailing_comma(self):
        assert split_csv("a,b,") == ["a", "b", ""]

    def test_empty_line_zero_fields(self):
        assert split_csv("") == []

    def test_leading_comma(self):
        assert split_csv(",leading,comma") == ["", "leading", "comma"]

    def test_triple_quote_field(self):
        assert split_csv('quoted,"""q"""') == ["quoted", '"q"']

    def test_junk_after_closing_quote_discarded(self):
        assert split_csv('"ab"junk,c') == ["ab", "c"]

    def test_multibyte_utf8_unquoted_preserved(self):
        assert split_csv("x,é,z") == ["x", "é", "z"]

    def test_multibyte_utf8_quoted_latin1_quirk(self):
        # inside quotes each BYTE widens to a char: é = 0xC3,0xA9 -> 'Ã©'
        assert split_csv('x,"é",z') == ["x", "Ã©", "z"]

    def test_double_comma_empty_field(self):
        assert split_csv("a,,b") == ["a", "", "b"]

    def test_only_commas(self):
        assert split_csv(",,") == ["", "", ""]

    def test_unterminated_quote(self):
        assert split_csv('"abc') == ["abc"]


class TestExtractField:
    CASES = [
        "a,b,c",
        'a,"b,c",d,,e',
        ",leading,comma",
        "trailing,comma,",
        'quoted,"""q"""',
    ]

    @pytest.mark.parametrize("line", CASES)
    def test_agrees_with_split(self, line):
        fields = split_csv(line)
        for idx, want in enumerate(fields):
            assert extract_field(line, idx) == want

    @pytest.mark.parametrize("line", CASES)
    def test_edge_at_len(self, line):
        fields = split_csv(line)
        expected = None if line.endswith(",") else ""
        assert extract_field(line, len(fields)) == expected
        assert extract_field(line, len(fields) + 1) is None

    def test_pinned_edges(self):
        assert extract_field("a,b,c", 3) == ""
        assert extract_field("a,b,", 3) is None
        assert extract_field("a,b,c", 4) is None

    def test_type_at_index_3(self):
        line = "1,2025/10/12 05:07:29,0016,TRAFFIC,10.0.0.1,10.0.0.2,allow,x"
        assert extract_field(line, 3) == "TRAFFIC"
        assert extract_field(line, 4) == "10.0.0.1"


class TestFnv:
    def test_known_vectors(self):
        # Published FNV-1a 64 test vectors
        assert fnv1a64(b"") == 0xCBF29CE484222325
        assert fnv1a64(b"a") == 0xAF63DC4C8601EC8C
        assert fnv1a64(b"foobar") == 0x85944171F73967E8

    def test_str_hashes_utf8_bytes(self):
        assert fnv1a64("é") == fnv1a64("é".encode("utf-8"))
