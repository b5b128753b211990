"""Node value constructors (O-30): decimal/integer formatters and the
base64Binary blob codec — mirrors the reference's test_node.c cases
(test_double_to_node, test_integer_to_node, test_blob_to_node)."""

import math

import pytest

from serd_spark.nodes import (
    LITERAL,
    XSD_BASE64,
    XSD_DECIMAL,
    XSD_INTEGER,
    base64_decode,
    base64_encode,
    node_new_blob,
    node_new_decimal,
    node_new_integer,
)


class TestDecimal:
    @pytest.mark.parametrize(
        "d,want",
        [
            (0.0, "0.0"), (9.0, "9.0"), (10.0, "10.0"), (0.01, "0.01"),
            (2.05, "2.05"), (-16.00001, "-16.00001"),
            (5.000000005, "5.00000001"),  # rounded at 8 frac digits
            (0.0000000001, "0.0"),        # rounds to zero fraction
        ],
    )
    def test_reference_vectors(self, d, want):
        n = node_new_decimal(d, 8)
        assert n.value == want
        assert n.type == LITERAL and n.datatype == XSD_DECIMAL

    def test_nan_inf_have_no_form(self):
        assert node_new_decimal(math.nan, 8) is None
        assert node_new_decimal(math.inf, 8) is None
        assert node_new_decimal(-math.inf, 8) is None

    def test_never_scientific(self):
        for d in (1e-9, 1e12 + 0.5, 123456789.000001):
            v = node_new_decimal(d, 8).value
            assert "e" not in v.lower() and "." in v

    def test_fraction_carry(self):
        # deliberate divergence from the reference's dropped carry
        assert node_new_decimal(0.999999999, 8).value == "1.0"


class TestInteger:
    @pytest.mark.parametrize(
        "i,want",
        [(0, "0"), (-0, "0"), (-23, "-23"), (23, "23"),
         (-12340, "-12340"), (1000, "1000"), (-1000, "-1000")],
    )
    def test_reference_vectors(self, i, want):
        n = node_new_integer(i)
        assert n.value == want
        assert n.type == LITERAL and n.datatype == XSD_INTEGER


class TestBlob:
    def test_roundtrip_all_small_sizes(self):
        # mirrors test_blob_to_node: sizes 1..63, wrap_lines = size % 5
        for size in range(1, 64):
            data = bytes((i % 256) for i in range(size))
            n = node_new_blob(data, wrap_lines=bool(size % 5))
            assert n.type == LITERAL and n.datatype == XSD_BASE64
            assert base64_decode(n.value) == data

    def test_wrap_at_57_input_bytes(self):
        data = bytes(range(120))
        wrapped = base64_encode(data, wrap_lines=True)
        lines = wrapped.split("\n")
        assert len(lines) == 3
        assert all(len(ln) <= 76 for ln in lines)
        assert base64_decode(wrapped) == data
        assert "\n" not in base64_encode(data, wrap_lines=False)

    def test_decode_skips_junk(self):
        assert base64_decode("aGV s\tbG8=???") == b"hello"

    def test_decode_drops_lone_trailing_char(self):
        # a trailing 1-char partial chunk carries no full byte
        assert base64_decode("aGVsbG8=a") == b"hello"

    def test_decode_interior_padding_char(self):
        # reference parity (serd_base64_decode, src/base64.c:96-125):
        # '=' is alphabet, terminates its chunk's output, decoding
        # continues with the next chunk — never an exception
        assert base64_decode("TW=Fu") == b"M"   # chunk TW=F -> 'M'
        assert base64_decode("TWFu") == b"Man"
        # chunks group positionally: TW== -> 'M', then Fu== -> 1 byte
        assert base64_decode("TW==Fu") == b"M\x16"
        # never raises on '=' anywhere (the round-2 bug was an
        # exception from interior '=')
        for junk in ("=", "====", "=a=b=c", "a=b=c=d="):
            base64_decode(junk)
