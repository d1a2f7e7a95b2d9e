"""Multimodal (image/audio/video) column plumbing.

Media payloads are opaque ``binary`` columns with typed metadata structs;
decode / feature-extract / frame-sample run as Arrow-batched functions over
``mapInPandas``.  The Spark-side plumbing — schemas, batch iteration,
partition-parallel decode, UDTF-style frame fan-out — is real and tested;
the actual codec call is STUBBED (this container has no image/audio
libraries): ``decode_image_meta(real_decode=True)`` raises
``NotImplementedError``, and the default path derives deterministic fake
metadata from the payload bytes so the full pipeline is oracle-checkable.

At scale: decode is per-row CPU work with no shuffle — it parallelizes
perfectly across executors; the only sizing concern is Arrow batch bytes
(payloads are large, so callers should lower
``spark.sql.execution.arrow.maxRecordsPerBatch`` for real media).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..operators.table import udtf

__all__ = ["synthesize_payload", "decode_image_meta", "sample_frames", "IMAGE_META"]

#: metadata struct produced by decode
IMAGE_META = T.StructType(
    [
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("n_bytes", T.LongType()),
    ]
)


def synthesize_payload(text: Column | str) -> Column:
    """Deterministic 16-byte fake media payload (md5 digest bytes)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.unhex(F.md5(c))


def decode_image_meta(
    df: DataFrame,
    payload_col: str,
    passthrough: list[str],
    real_decode: bool = False,
) -> DataFrame:
    """Decode image metadata from a binary payload column.

    Fake path (default): width/height/channels derived from the first
    payload bytes — bit-identical to the SQL oracle.  Real path: stub that
    raises until an image library is provisioned.
    """
    if real_decode:
        raise NotImplementedError(
            "real image decode requires an image library (PIL/opencv), "
            "not present in this environment; the fake path exercises the "
            "full Spark plumbing"
        )

    out_schema = T.StructType(
        [df.schema[c] for c in passthrough]
        + [T.StructField("meta", IMAGE_META)]
    )
    n_pt = len(passthrough)

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf.iloc[:, n_pt]
            metas = [
                None
                if b is None
                else {
                    "width": b[0] % 64 + 1,
                    "height": b[1] % 64 + 1,
                    "channels": b[2] % 3 + 1,
                    "n_bytes": len(b),
                }
                for b in payloads
            ]
            out = pdf.iloc[:, :n_pt].copy()
            out["meta"] = metas
            yield out

    return df.select(*passthrough, payload_col).mapInPandas(decode, out_schema)


@udtf(
    input_types=["double", "int"],
    result_type="struct<frame_idx:int,t_ms:bigint>",
    name="sample_frames",
)
def sample_frames(duration_s, fps):
    """Frame-sampling fan-out: one output row per sampled frame.

    The video-pipeline analogue of the reference's ``series`` table
    function (tests/tests.rs:329): per input row, yield frame indices and
    timestamps at the requested rate.
    """
    if duration_s is None or fps is None or fps <= 0:
        return
    n = int(duration_s * fps)
    for i in range(n):
        yield {"frame_idx": i, "t_ms": int(i * 1000 / fps)}


@udtf(
    input_types=["bigint", "int", "int"],
    result_type="struct<chunk_idx:int,start_ms:bigint,end_ms:bigint,n_samples:bigint>",
    name="audio_chunks",
)
def audio_chunks(n_samples, sample_rate, chunk_ms):
    """Audio chunking fan-out: split a clip of ``n_samples`` frames at
    ``sample_rate`` Hz into fixed ``chunk_ms`` windows — the audio-pipeline
    shape (decode → chunk → embed); the final partial chunk is kept.
    Deterministic integer math, so it is oracle-checkable without codecs."""
    if n_samples is None or sample_rate is None or chunk_ms is None:
        return
    if sample_rate <= 0 or chunk_ms <= 0 or n_samples <= 0:
        return
    total_ms = n_samples * 1000 // sample_rate
    samples_per_chunk = sample_rate * chunk_ms // 1000
    i = 0
    start = 0
    while start * samples_per_chunk < n_samples:
        s0 = start * samples_per_chunk
        s1 = min(s0 + samples_per_chunk, n_samples)
        yield {
            "chunk_idx": i,
            "start_ms": s0 * 1000 // sample_rate,
            "end_ms": min((s1 * 1000 + sample_rate - 1) // sample_rate, total_ms),
            "n_samples": s1 - s0,
        }
        i += 1
        start += 1
