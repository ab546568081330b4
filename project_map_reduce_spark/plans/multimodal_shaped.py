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
