"""Multimodal column plumbing: image/audio/video as opaque ``binary``
payloads with typed metadata, processed by Arrow-batched pandas UDFs.

The container has no image/audio libraries, so the *decode* step is
stubbed two ways (clearly marked):

- ``decode_media`` tries real decoders (PIL / soundfile) and raises
  ``NotImplementedError`` if absent — the production slot;
- ``fake_decode=True`` (default here) runs a deterministic byte-level
  "decode" so the Spark-side plumbing — schema, partitioning, UDF
  signature, Arrow batch shape — is real and testable end-to-end.

Payloads are synthesized deterministically from the ``documents`` table
(md5-chain bytes; no external data), entirely JVM-side, so the metadata
path has an exact DuckDB oracle. At 100 TB the shape is what matters:
media rows stay in their source partitions, every transform is a narrow
``mapInPandas`` over binary columns (no shuffle), and frame sampling
explodes rows without ever collecting a payload to the driver.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

KINDS = ["image", "audio", "video"]
FRAME_BYTES = 16

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("payload", T.BinaryType()),
    ]
)


def synthesize_media(docs: DataFrame) -> DataFrame:
    """Derive a deterministic media table from ``documents`` — opaque
    binary payload (40..64 md5-chain bytes) + typed metadata. Pure JVM
    expressions; the hex construction is reproducible in ANSI SQL."""
    t = F.col("text")
    hex_full = F.concat(
        F.md5(t), F.md5(F.concat(t, F.lit("_1"))),
        F.md5(F.concat(t, F.lit("_2"))), F.md5(F.concat(t, F.lit("_3"))),
    )
    n_bytes = (F.col("n_chars") % 25 + 40).cast("int")
    hex_cut = F.substring(hex_full, 1, F.lit(2) * n_bytes)
    h = F.conv(F.substring(F.md5(t), 1, 8), 16, 10).cast("long")
    kind = F.element_at(F.array(*[F.lit(k) for k in KINDS]), (F.col("doc_id") % 3 + 1).cast("int"))
    return docs.select(
        F.col("doc_id").alias("media_id"),
        kind.alias("kind"),
        (h % 48 + 16).cast("int").alias("width"),
        (F.conv(F.substring(F.md5(F.concat(t, F.lit("_h"))), 1, 8), 16, 10).cast("long") % 48 + 16)
        .cast("int").alias("height"),
        F.when(kind == "audio", F.lit(16000)).otherwise(F.lit(0)).alias("sample_rate"),
        F.unhex(hex_cut).alias("payload"),
        hex_cut.alias("payload_hex"),
    )


def media_meta(docs: DataFrame, k: int = 200) -> DataFrame:
    """Metadata projection of the synthesized media table (JVM-only,
    oracle-paired): -> (media_id, kind, width, height, n_bytes,
    payload_md5)."""
    m = synthesize_media(docs)
    return (
        m.select(
            "media_id",
            "kind",
            "width",
            "height",
            F.length(F.col("payload")).cast("long").alias("n_bytes"),
            F.md5(F.col("payload_hex")).alias("payload_md5"),
        )
        .orderBy("media_id")
        .limit(k)
    )


def media_meta_sql(k: int = 200) -> str:
    return f"""WITH m AS (
  SELECT doc_id AS media_id,
    ['image','audio','video'][CAST(doc_id % 3 + 1 AS INT)] AS kind,
    CAST(CAST(('0x'||substr(md5(text),1,8)) AS BIGINT) % 48 + 16 AS INT) AS width,
    CAST(CAST(('0x'||substr(md5(text||'_h'),1,8)) AS BIGINT) % 48 + 16 AS INT) AS height,
    substr(md5(text)||md5(text||'_1')||md5(text||'_2')||md5(text||'_3'),
           1, 2*(n_chars % 25 + 40)) AS payload_hex
  FROM documents
)
SELECT media_id, kind, width, height,
  CAST(octet_length(unhex(payload_hex)) AS BIGINT) AS n_bytes,
  md5(payload_hex) AS payload_md5
FROM m ORDER BY media_id LIMIT {k}"""


def decode_media_sql(k: int = 200) -> str:
    """Oracle for the fake-decode path: the synthesized payload is an
    md5-chain hex string, so its byte statistics are pure SQL — split
    the hex into 2-char bytes and aggregate. mean_byte_x1e6 uses
    integer math (sum*1e6 // n) exactly like the pandas kernel."""
    return f"""WITH m AS (
  SELECT doc_id AS media_id,
    ['image','audio','video'][CAST(doc_id % 3 + 1 AS INT)] AS kind,
    substr(md5(text)||md5(text||'_1')||md5(text||'_2')||md5(text||'_3'),
           1, 2*(n_chars % 25 + 40)) AS payload_hex
  FROM documents
),
b AS (
  SELECT media_id, kind,
    unnest(generate_series(0, length(payload_hex)//2 - 1)) AS i,
    payload_hex
  FROM m
),
bytes AS (
  SELECT media_id, kind,
    CAST(('0x'||substr(payload_hex, 2*i + 1, 2)) AS INT) AS bv
  FROM b
)
SELECT media_id, kind, CAST(count(*) AS INT) AS n_bytes,
  CAST(SUM(bv) * 1000000 // count(*) AS BIGINT) AS mean_byte_x1e6,
  CAST(MAX(bv) AS INT) AS max_byte,
  CAST(SUM(bv) AS BIGINT) AS checksum
FROM bytes GROUP BY media_id, kind
ORDER BY media_id LIMIT {k}"""


# ---------------------------------------------------------------------------
# pandas-UDF transforms (the real multimodal plumbing)
# ---------------------------------------------------------------------------

_DECODE_SCHEMA = (
    "media_id long, kind string, n_bytes int, mean_byte_x1e6 long, "
    "max_byte int, checksum long"
)


def decode_media(media: DataFrame, fake_decode: bool = True) -> DataFrame:
    """Per-row media decode + feature extraction via ``mapInPandas``
    (Arrow batches of binary payloads; no Python in planning, no
    shuffle). With ``fake_decode`` the features are byte statistics —
    deterministic and library-free; the real path requires PIL/soundfile
    and raises ``NotImplementedError`` in this container."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            if not fake_decode:
                try:
                    import PIL  # noqa: F401
                except ImportError as e:  # pragma: no cover
                    raise NotImplementedError(
                        "real media decode needs PIL/soundfile (absent here); "
                        "use fake_decode=True for the byte-stat path"
                    ) from e
            out = []
            for mid, kind, payload in zip(
                pdf["media_id"], pdf["kind"], pdf["payload"]
            ):
                a = np.frombuffer(payload, dtype=np.uint8)
                s = int(a.astype(np.int64).sum())
                out.append(
                    (
                        int(mid),
                        kind,
                        int(a.size),
                        # integer mean (sum*1e6 // n): float-free, so
                        # the SQL oracle reproduces it exactly
                        s * 1_000_000 // int(a.size),
                        int(a.max()),
                        s,
                    )
                )
            yield pd.DataFrame(
                out,
                columns=[
                    "media_id", "kind", "n_bytes", "mean_byte_x1e6",
                    "max_byte", "checksum",
                ],
            )

    return media.select("media_id", "kind", "payload").mapInPandas(
        run, schema=_DECODE_SCHEMA
    )


def frame_sample(media: DataFrame, every_k: int = 2) -> DataFrame:
    """Video frame sampling: split the payload into FRAME_BYTES-byte
    frames and keep every k-th (a real pipeline samples decoded frames;
    the chunking/explode plumbing is identical). One row in, many rows
    out — a flatMap-shaped mapInPandas, still shuffle-free."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, kind, payload in zip(
                pdf["media_id"], pdf["kind"], pdf["payload"]
            ):
                if kind != "video":
                    continue
                b = bytes(payload)
                frames = [
                    b[i : i + FRAME_BYTES]
                    for i in range(0, len(b) - len(b) % FRAME_BYTES, FRAME_BYTES)
                ]
                for idx in range(0, len(frames), every_k):
                    rows.append((int(mid), idx, frames[idx]))
            yield pd.DataFrame(rows, columns=["media_id", "frame_idx", "frame"])

    return media.select("media_id", "kind", "payload").mapInPandas(
        run, schema="media_id long, frame_idx int, frame binary"
    )
