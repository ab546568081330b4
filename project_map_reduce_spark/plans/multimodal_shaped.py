"""Driver-hash-checked multimodal query (Q95).

The multimodal capability row was previously pytest-only; this query
puts the render→PNG-encode→PNG-decode chain under the driver's DuckDB
hash gate. The oracle can verify it because the rasterizer's page
geometry (operators/rasterize.py::render_text_bitmap — 6×8 cells, 4 px
margins, 100-cell line clip) is a pure SQL-expressible function of the
text LENGTH: line separators are normalized to spaces 1-for-1 before
rendering, so the page is single-line with exactly length(text) cells
for ANY document, and the decoded dimensions can only match if BOTH
the encoder produced a spec-valid PNG and the decoder's chunk/CRC/
unfilter walk read it back correctly.

Reference parity: this is the ToImage worker op (Workers.java:150-160)
driven end-to-end as a declared query instead of a smoke test.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from project_map_reduce_spark.registry import fmt_doc, register
from project_map_reduce_spark.tables import load

_EVERY = 10  # render every 10th document — bounds the Python render cost


@register(
    "q_multimodal_dims",
    oracle=f"""
    SELECT doc_id,
           CAST(6 * greatest(1, least(100, length(text))) + 8 AS INT) AS width,
           CAST(16 AS INT) AS height,
           'ok' AS status,
           CAST(NULL AS VARCHAR) AS error
    FROM documents
    WHERE doc_id % {_EVERY} = 0
    """,
)
def q_multimodal_dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q95: every {n}th document's text rendered to a PNG page
    (5×7 bitmap font rasterizer + stdlib PNG encoder), then decoded
    back (full chunk/CRC walk + unfilter) and its true pixel dimensions
    emitted. The oracle recomputes the page geometry from the text
    length alone — so the hash matches only if render, encode, and
    decode all agree, per row, with failures surfacing as in-band
    status='error' rows the all-'ok' oracle would refuse.

    Scale shape: one shuffle-free Arrow-batched map (the render is
    Python-side by necessity — it IS the worker op — but narrow: text
    in, four scalars out; the PNG bytes never leave the executor).
    """

    import re

    # Every char str.splitlines() treats as a line boundary, replaced
    # 1-for-1 by a space (a blank cell) BEFORE rendering: the page is
    # then single-line with exactly length(text) cells, so the oracle's
    # pure-length geometry formula holds for ANY text — not just the
    # fixture's newline-free documents. (The driver fixture has no
    # newlines today; this makes the invariant enforced, not assumed.)
    _line_seps = re.compile("[\n\r\v\f\x1c\x1d\x1e\x85\u2028\u2029]")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from project_map_reduce_spark.operators.codecs import decode_png_gray8
        from project_map_reduce_spark.operators.rasterize import (
            encode_png_gray,
            render_text_bitmap,
        )

        for pdf in it:
            out = {k: [] for k in ("doc_id", "width", "height", "status", "error")}
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                try:
                    w, h, pixels = render_text_bitmap(
                        _line_seps.sub(" ", text or "")
                    )
                    png = encode_png_gray(w, h, pixels)
                    dw, dh, _ = decode_png_gray8(png)
                    out["doc_id"].append(doc_id)
                    out["width"].append(dw)
                    out["height"].append(dh)
                    out["status"].append("ok")
                    out["error"].append(None)
                except Exception as ex:  # noqa: BLE001 — in-band, ref A7
                    out["doc_id"].append(doc_id)
                    out["width"].append(None)
                    out["height"].append(None)
                    out["status"].append("error")
                    out["error"].append(f"Error: {ex}")
            yield pd.DataFrame(out)

    d = (
        load(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % _EVERY == 0)
        .select("doc_id", "text")
    )
    return d.mapInPandas(
        batches,
        schema="doc_id bigint, width int, height int, status string, error string",
    )


fmt_doc(q_multimodal_dims, n=_EVERY)


_A_N = 256  # PCM frames per synthesized clip
_A_RATE = 8000  # Hz


@register(
    "q_audio_features",
    oracle=f"""
    WITH s AS (
        SELECT d.doc_id,
               i.i,
               ((d.doc_id * 9973 + i.i * 257) % 65536) - 32768 AS samp
        FROM documents d, range(0, {_A_N}) i(i)
    ),
    t AS (
        SELECT doc_id, samp,
               lag(samp) OVER (PARTITION BY doc_id ORDER BY i) AS prev
        FROM s
    )
    SELECT doc_id,
           CAST({_A_N} AS BIGINT)  AS n_frames,
           {_A_RATE}               AS sample_rate,
           CAST(sum(CASE WHEN prev IS NOT NULL
                          AND ((prev < 0) <> (samp < 0))
                     THEN 1 ELSE 0 END) AS INT) AS zero_crossings,
           round(sqrt(sum(CAST(samp AS BIGINT) * samp)
                      / ({_A_N} * 1073741824.0)), 6) AS rms,
           'ok' AS status,
           CAST(NULL AS VARCHAR) AS error
    FROM t
    GROUP BY doc_id
    """,
)
def q_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q111: audio feature extraction under the driver hash gate — for
    every document a deterministic 16-bit PCM clip is synthesized
    (sample_i = ((doc_id·9973 + i·257) mod 65536) − 32768, {n} frames
    at {rate} Hz), encoded to a REAL RIFF/WAVE file (stdlib ``wave``
    writer), decoded back through the engine's audio path
    (operators/codecs.py::wav_info header walk + frame read), and the
    features computed FROM THE DECODED SAMPLES: frame count, sample
    rate, zero-crossing count, RMS level. The oracle recomputes all
    four from the closed-form sample formula — the hash can only match
    if the WAV encode→decode round-trip is sample-exact, making this
    the audio analog of Q95 (whose PNG check is dimensions-only; this
    one checks every decoded value).

    Determinism: zero-crossings is integer-exact; RMS is
    sqrt(int_sum / (n·2^30)) — the sum of squared int16 samples is an
    exact int64 on both engines, so the single divide+sqrt is
    bit-identical before the 6-dp snap.

    Scale shape: one shuffle-free Arrow-batched map (codec work is
    Python by necessity — it IS the capability — but narrow: doc_id in,
    five scalars out; WAV bytes never leave the executor). Decode
    failures would surface as in-band status='error' rows the all-'ok'
    oracle refuses.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io
        import math
        import wave

        import numpy as np

        from project_map_reduce_spark.operators import codecs

        cols = (
            "doc_id", "n_frames", "sample_rate",
            "zero_crossings", "rms", "status", "error",
        )
        for pdf in it:
            out = {k: [] for k in cols}
            for doc_id in pdf["doc_id"]:
                row = dict.fromkeys(cols)
                row["doc_id"] = doc_id
                try:
                    i = np.arange(_A_N, dtype=np.int64)
                    pcm = ((int(doc_id) * 9973 + i * 257) % 65536 - 32768).astype(
                        "<i2"
                    )
                    buf = io.BytesIO()
                    with wave.open(buf, "wb") as w:
                        w.setnchannels(1)
                        w.setsampwidth(2)
                        w.setframerate(_A_RATE)
                        w.writeframes(pcm.tobytes())
                    raw = buf.getvalue()
                    # decode path: header walk via the codec layer, then
                    # the actual frame read — everything below uses ONLY
                    # the decoded bytes, never the synthesized array.
                    nch, rate, nframes = codecs.wav_info(raw)
                    if nch != 1:
                        raise ValueError(f"expected mono, got {nch}ch")
                    with wave.open(io.BytesIO(raw)) as w:
                        dec = np.frombuffer(
                            w.readframes(w.getnframes()), dtype="<i2"
                        ).astype(np.int64)
                    sq_sum = int(np.sum(dec * dec))
                    row["n_frames"] = nframes
                    row["sample_rate"] = rate
                    row["zero_crossings"] = int(
                        np.sum((dec[1:] < 0) != (dec[:-1] < 0))
                    )
                    # unrounded here; the 6-dp snap happens engine-side
                    # below so rounding semantics match the oracle's
                    row["rms"] = math.sqrt(sq_sum / (_A_N * 1073741824.0))
                    row["status"] = "ok"
                except Exception as ex:  # noqa: BLE001 — in-band, ref A7
                    row["status"], row["error"] = "error", f"Error: {ex}"
                for k in cols:
                    out[k].append(row[k])
            yield pd.DataFrame(out)

    # The CPU-bound codec map must not inherit the fixture's file count
    # (one file ⇒ one partition ⇒ one core — the Q103 lesson): spread
    # the narrow doc_id column across cores first. The repartition
    # shuffles only int64 keys, a rounding error next to the codec work.
    d = (
        load(spark, sf_dir, "documents")
        .select("doc_id")
        .repartition(spark.sparkContext.defaultParallelism)
    )
    feats = d.mapInPandas(
        batches,
        schema=(
            "doc_id bigint, n_frames bigint, sample_rate int, "
            "zero_crossings int, rms double, status string, error string"
        ),
    )
    return feats.withColumn("rms", F.round("rms", 6))


fmt_doc(q_audio_features, n=_A_N, rate=_A_RATE)
