"""Pure-Python Avro container codec — Spark-free roundtrip tests.

The writer exists because the sandbox has no Avro library to build
fixtures with; reader and writer are independent implementations of the
public spec's encode/decode directions, so a roundtrip exercises both.
"""

from __future__ import annotations

import datetime as dt

import pytest

from kaskada_spark.sources.avro_codec import (
    AvroError,
    read_container,
    rows_to_pandas,
    to_spark_type,
    write_container,
)

REC = {
    "type": "record",
    "name": "Seq",
    "fields": [
        {"name": "doc_id", "type": "string"},
        {"name": "tokens", "type": {"type": "array", "items": "int"}},
        {"name": "n_tok", "type": "int"},
        {"name": "source", "type": ["null", "string"]},
        {"name": "score", "type": "double"},
        {"name": "flag", "type": "boolean"},
        {"name": "payload", "type": "bytes"},
        {
            "name": "ts",
            "type": {"type": "long", "logicalType": "timestamp-micros"},
        },
    ],
}

ROWS = [
    {
        "doc_id": f"d{i}",
        "tokens": list(range(i % 7)),
        "n_tok": i % 7,
        "source": None if i % 3 == 0 else f"s{i % 2}",
        "score": i * 0.5,
        "flag": i % 2 == 0,
        "payload": bytes([i % 256, 255 - i % 256]),
        "ts": 1_600_000_000_000_000 + i * 1_000_000,
    }
    for i in range(257)  # crosses a varint byte boundary and a block
]


@pytest.mark.parametrize("codec", ["null", "deflate", "snappy"])
def test_roundtrip_records(codec):
    blob = write_container(REC, ROWS, codec=codec, block_rows=100)
    schema, rows = read_container(blob)
    assert schema == REC
    assert rows == ROWS


def test_zigzag_negative_and_large():
    rec = {
        "type": "record",
        "name": "N",
        "fields": [{"name": "v", "type": "long"}],
    }
    vals = [0, -1, 1, -2, 63, 64, -64, -65, 2**40, -(2**40), 2**62, -(2**62)]
    blob = write_container(rec, [{"v": v} for v in vals], codec="null")
    _, rows = read_container(blob)
    assert [r["v"] for r in rows] == vals


def test_enum_fixed_map_union():
    rec = {
        "type": "record",
        "name": "M",
        "fields": [
            {
                "name": "color",
                "type": {"type": "enum", "name": "C", "symbols": ["R", "G"]},
            },
            {
                "name": "digest",
                "type": {"type": "fixed", "name": "F", "size": 4},
            },
            {"name": "attrs", "type": {"type": "map", "values": "long"}},
            {"name": "opt", "type": ["null", "double"]},
        ],
    }
    rows = [
        {"color": "G", "digest": b"\x01\x02\x03\x04", "attrs": {"a": 1, "b": -2}, "opt": 2.5},
        {"color": "R", "digest": b"\xff\xfe\xfd\xfc", "attrs": {}, "opt": None},
    ]
    _, back = read_container(write_container(rec, rows))
    assert back == rows


def test_named_type_reference_reuse():
    rec = {
        "type": "record",
        "name": "Outer",
        "fields": [
            {
                "name": "a",
                "type": {
                    "type": "record",
                    "name": "Inner",
                    "fields": [{"name": "x", "type": "int"}],
                },
            },
            {"name": "b", "type": "Inner"},  # reference by name
        ],
    }
    rows = [{"a": {"x": 1}, "b": {"x": 2}}]
    _, back = read_container(write_container(rec, rows))
    assert back == rows


def test_empty_file_and_bad_magic():
    blob = write_container(REC, [])
    schema, rows = read_container(blob)
    assert rows == [] and schema == REC
    with pytest.raises(AvroError, match="magic"):
        read_container(b"PAR1" + blob[4:])


def test_unsupported_codec_named():
    with pytest.raises(AvroError, match="writer supports"):
        write_container(REC, ROWS[:1], codec="zstandard")


def test_snappy_copy_tags():
    """Decoder handles real snappy back-references (incl. overlapping
    RLE-style copies), not just the literal-only subset our writer
    emits. Stream hand-assembled per format_description.txt."""
    from kaskada_spark.sources.avro_codec import _snappy_uncompress

    # "abcabcabc": varint len 9, literal "abc", 1-byte-offset copy
    # (len 6, offset 3 — overlaps its own output)
    stream = b"\x09" + b"\x08abc" + bytes([(2 << 2) | 1, 3])
    assert _snappy_uncompress(stream) == b"abcabcabc"
    # 2-byte-offset copy variant
    stream2 = b"\x06" + b"\x08abc" + bytes([(2 << 2) | 2, 3, 0])
    assert _snappy_uncompress(stream2) == b"abcabc"


def test_logical_types_to_pandas():
    schema, rows = read_container(write_container(REC, ROWS[:5]))
    pdf = rows_to_pandas(schema, rows)
    assert list(pdf.columns) == [f["name"] for f in REC["fields"]]
    assert pdf["ts"].iloc[0] == dt.datetime(2020, 9, 13, 12, 26, 40)
    assert pdf["source"].iloc[0] is None


def test_to_spark_type_mapping():
    from pyspark.sql import types as T

    st, _ = to_spark_type(REC)
    assert isinstance(st, T.StructType)
    by_name = {f.name: f for f in st.fields}
    assert isinstance(by_name["tokens"].dataType, T.ArrayType)
    assert isinstance(by_name["ts"].dataType, T.TimestampType)
    assert by_name["source"].nullable is True
    assert isinstance(by_name["n_tok"].dataType, T.IntegerType)
    with pytest.raises(AvroError, match="union"):
        to_spark_type(["int", "string"])


# ---------------------------------------------------------------------------
# property fuzz: random values under a fixed rich schema roundtrip exactly

try:
    from hypothesis import given, settings, strategies as st

    _HAS_HYP = True
except ImportError:  # pragma: no cover
    _HAS_HYP = False

if _HAS_HYP:
    _FUZZ_SCHEMA = {
        "type": "record",
        "name": "Fuzz",
        "fields": [
            {"name": "s", "type": "string"},
            {"name": "i", "type": "long"},
            {"name": "f", "type": "double"},
            {"name": "b", "type": "bytes"},
            {"name": "flag", "type": "boolean"},
            {"name": "opt", "type": ["null", "long"]},
            {"name": "arr", "type": {"type": "array", "items": "long"}},
            {"name": "m", "type": {"type": "map", "values": "string"}},
        ],
    }

    _row = st.fixed_dictionaries(
        {
            "s": st.text(max_size=40),
            "i": st.integers(min_value=-(2**63), max_value=2**63 - 1),
            "f": st.floats(allow_nan=False),  # NaN != NaN under ==
            "b": st.binary(max_size=40),
            "flag": st.booleans(),
            "opt": st.none() | st.integers(min_value=-(2**40), max_value=2**40),
            "arr": st.lists(st.integers(min_value=-(2**31), max_value=2**31), max_size=8),
            "m": st.dictionaries(st.text(max_size=8), st.text(max_size=8), max_size=4),
        }
    )

    @settings(max_examples=60, deadline=None)
    @given(rows=st.lists(_row, max_size=25), codec=st.sampled_from(["null", "deflate", "snappy"]))
    def test_fuzz_roundtrip(rows, codec):
        blob = write_container(_FUZZ_SCHEMA, rows, codec=codec, block_rows=7)
        schema, back = read_container(blob)
        assert schema == _FUZZ_SCHEMA
        assert back == rows


def test_block_index_and_range_decode_equal_whole_file(tmp_path):
    """index_container_blocks + decode_block_range over every split ==
    read_container on the whole file (splitting on sync markers loses
    and duplicates nothing, any codec, any block size)."""
    from kaskada_spark.sources.avro_codec import (
        decode_block_range,
        index_container_blocks,
    )

    rows = [
        {
            "doc_id": f"d{i}", "tokens": [i] * (1 + i % 4), "n_tok": 1 + i % 4,
            "source": None if i % 7 == 0 else "s", "score": i / 8.0,
            "flag": i % 2 == 0, "payload": bytes([i % 251]),
            "ts": 1_700_000_000_000_000 + i * 60_000_000,
        }
        for i in range(500)
    ]
    for codec in ("null", "deflate", "snappy"):
        blob = write_container(REC, rows, codec=codec, block_rows=37)
        p = tmp_path / f"f_{codec}.avro"
        p.write_bytes(blob)
        _, whole = read_container(blob)
        schema, codec2, sync, splits = index_container_blocks(
            str(p), target_split_bytes=512
        )
        assert codec2 == codec
        assert len(splits) >= 2, "fixture must produce multiple splits"
        # splits tile the post-header byte range without gap or overlap
        for (o1, l1), (o2, _l2) in zip(splits, splits[1:]):
            assert o1 + l1 == o2
        got = []
        for off, ln in splits:
            got.extend(decode_block_range(str(p), off, ln, schema, codec, sync))
        assert got == whole


def test_block_index_single_block_file(tmp_path):
    from kaskada_spark.sources.avro_codec import index_container_blocks

    blob = write_container(REC, ROWS, codec="deflate", block_rows=10_000)
    p = tmp_path / "one.avro"
    p.write_bytes(blob)
    _s, _c, _y, splits = index_container_blocks(str(p))
    assert len(splits) == 1
