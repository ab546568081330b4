"""Multimodal capability smoke (SURVEY.md §2 B.10 capability row):
binaryFile source → typed decode (stubbed codec) → feature extraction.
The Spark plumbing — schema, Arrow batching, error channel, pruning —
is the thing under test."""

from __future__ import annotations

import os
import shutil

import pytest

from project_map_reduce_spark.operators import multimodal
from project_map_reduce_spark.sources import readers

ART = os.path.join(os.path.dirname(__file__), ".artifacts", "binary")


@pytest.fixture(scope="module")
def binary_dir():
    shutil.rmtree(ART, ignore_errors=True)
    os.makedirs(ART, exist_ok=True)
    payloads = {
        "a.png": b"\x89PNG\r\n\x1a\n" + bytes(range(200)),
        "b.jpg": b"\xff\xd8\xff\xe0" + bytes(100),
        "c.pdf": b"%PDF-1.4 fake body",
        "d.wav": b"RIFF" + b"\x01\x02" * 50,
        "e.bin": b"\x00\x01mystery",  # unknown format → error row
    }
    for name, data in payloads.items():
        with open(os.path.join(ART, name), "wb") as f:
            f.write(data)
    return ART


def test_binary_source_schema(spark, binary_dir):
    df = readers.read_binary(spark, binary_dir)
    assert {"path", "content", "length"} <= set(df.columns)
    assert df.count() == 5


def test_decode_stub_typed_results(spark, binary_dir):
    df = readers.read_binary(spark, binary_dir)
    out = multimodal.decode_binary(df).collect()
    by_name = {os.path.basename(r.path): r for r in out}
    assert by_name["a.png"].status == "ok"
    assert by_name["a.png"].modality == "image"
    assert by_name["a.png"].format == "png"
    assert by_name["a.png"].width >= 1 and by_name["a.png"].height >= 1
    assert by_name["c.pdf"].modality == "document"
    assert by_name["d.wav"].modality == "audio"
    # In-band error channel (ref Workers.java:186-221): unknown format
    # is a status row, not an exception.
    assert by_name["e.bin"].status == "error"
    assert by_name["e.bin"].error.startswith("Error:")
    assert by_name["e.bin"].byte_len == 9


def test_byte_histogram_features(spark, binary_dir):
    df = readers.read_binary(spark, binary_dir)
    feats = multimodal.byte_histogram_features(df).collect()
    assert len(feats) == 5
    for r in feats:
        assert len(r.features) == 16
        assert abs(sum(r.features) - 1.0) < 1e-9  # normalized
        assert r.byte_len > 0


def test_frame_sample_explodes(spark, binary_dir):
    df = readers.read_binary(spark, binary_dir)
    frames = multimodal.frame_sample(df, every_n_bytes=64)
    rows = frames.collect()
    assert len(rows) >= 5  # at least one frame per file
    png = [r for r in rows if r.path.endswith("a.png")]
    assert [r.frame_idx for r in sorted(png, key=lambda r: r.frame_idx)] == list(
        range(len(png))
    )
    assert all(r.byte_offset == r.frame_idx * 64 for r in png)


def test_task_line_source(spark, binary_dir):
    """Reference task-file format (A1/A3): operation\\turl lines."""
    task_file = os.path.join(ART, "tasks.txt")
    with open(task_file, "w") as f:
        f.write("ToText\thttp://x/a.pdf\nToImage\thttp://x/b.pdf\nBADLINE\n")
    df = readers.read_task_lines(spark, task_file)
    rows = sorted(df.collect())
    assert ("BADLINE", None) in [tuple(r) for r in rows]  # malformed kept
    assert ("ToText", "http://x/a.pdf") in [tuple(r) for r in rows]
