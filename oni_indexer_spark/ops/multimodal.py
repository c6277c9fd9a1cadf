"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed via Arrow-batched ``mapInPandas``.

The decode step is STUBBED (no image/audio libraries in this container):
``decoder="fake"`` produces deterministic hash-derived features so the
Spark-side plumbing — schema, batching, partitioning, UDF signature — is
real and tested; ``decoder="real"`` raises NotImplementedError at the
exact point a PIL/ffmpeg call would go.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

ASSET_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),  # opaque media bytes
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.IntegerType(), True),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("payload_sha256", T.StringType(), False),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)


def synth_assets(spark, n: int = 64) -> DataFrame:
    """Deterministic fake media table (payload = seeded bytes)."""
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        payload = hashlib.sha256(f"asset:{i}".encode()).digest() * (4 + i % 5)
        rows.append((i, kind, bytearray(payload), 64 + i % 128, 48 + i % 96, 1000 + 37 * i))
    return spark.createDataFrame(rows, ASSET_SCHEMA)


def _fake_feature(payload: bytes, dim: int) -> list[float]:
    """Deterministic stand-in for a real decoder: dim floats derived from
    a sha256 chain over HEX STRINGS (not digest bytes) — stable across
    runs AND SQL-expressible (DuckDB's sha256 is varchar-only), so the
    oracle can recompute the features rather than rows-only-check them."""
    out = []
    h = hashlib.sha256(payload).hexdigest()
    raw = ""
    while len(raw) < dim * 8:
        h = hashlib.sha256(h.encode()).hexdigest()
        raw += h
    for j in range(dim):
        v = int(raw[j * 8 : j * 8 + 8], 16)
        out.append((v / float(0xFFFFFFFF)) * 2.0 - 1.0)
    return out


def extract_features(
    assets: DataFrame, dim: int = 16, decoder: str = "fake"
) -> DataFrame:
    """Decode + featurize media assets via Arrow-batched mapInPandas.

    The batch shape is the real thing: each pandas chunk holds the binary
    payloads of one Arrow batch; a real decoder would run vectorized over
    the batch here. ``decoder="real"`` marks exactly where PIL/ffmpeg
    would plug in (not available in this environment).
    """
    if decoder not in ("fake", "real"):
        raise ValueError(decoder)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decoder == "real":
                raise NotImplementedError(
                    "real media decoding needs PIL/ffmpeg — not in this container; "
                    "use decoder='fake' for the deterministic stand-in"
                )
            feats = [
                _fake_feature(bytes(p) if p is not None else b"", dim)
                for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [len(bytes(p)) if p is not None else 0 for p in pdf["payload"]],
                    "payload_sha256": [
                        hashlib.sha256(bytes(p) if p is not None else b"").hexdigest()
                        for p in pdf["payload"]
                    ],
                    "feature": feats,
                }
            )

    return assets.mapInPandas(run, FEATURE_SCHEMA)


def features_exploded(
    assets: DataFrame, dim: int = 8, decoder: str = "fake"
) -> DataFrame:
    """Driver-comparable shape of :func:`extract_features`: the feature
    vector exploded to scalar rows (asset_id, kind, n_bytes,
    payload_sha256, j, feature_val). feature_val is the float32 value
    promoted to double and rounded — the oracle replicates the same
    float4 round-trip."""
    feats = extract_features(assets, dim=dim, decoder=decoder)
    return feats.select(
        "asset_id",
        "kind",
        "n_bytes",
        "payload_sha256",
        F.posexplode("feature").alias("j", "fv"),
    ).select(
        "asset_id",
        "kind",
        "n_bytes",
        "payload_sha256",
        F.col("j").cast("int").alias("j"),
        F.round(F.col("fv").cast("double"), 6).alias("feature_val"),
    )


def features_exploded_sql(n: int = 48, dim: int = 8) -> str:
    """DuckDB twin of features_exploded(synth_assets(n), dim).

    The asset payloads are fixture inputs, inlined as hex VALUES exactly
    like the ETL item-graph oracles inline their fixture. n_bytes and the
    whole feature chain are COMPUTED in SQL (octet_length(unhex(...)),
    sha256 chain over hex strings, float4 round-trip); payload_sha256
    rides in as a literal because DuckDB's sha256 only accepts varchar —
    documented honest limitation, every derived value is SQL-verified."""
    if dim * 8 > 64:
        raise ValueError("features_exploded_sql supports dim <= 8 (one chain step)")
    kinds = ["image", "audio", "video"]
    rows = []
    for i in range(n):
        kind = kinds[i % 3]
        payload = hashlib.sha256(f"asset:{i}".encode()).digest() * (4 + i % 5)
        s0 = hashlib.sha256(payload).hexdigest()
        rows.append(f"({i}, '{kind}', '{payload.hex()}', '{s0}')")
    values = ",\n".join(rows)
    return f"""
WITH assets(asset_id, kind, payload_hex, payload_sha256) AS (VALUES
{values}
),
chain AS (
  SELECT asset_id, kind,
         octet_length(unhex(payload_hex))::bigint AS n_bytes,
         payload_sha256,
         sha256(payload_sha256) AS raw
  FROM assets
),
j AS (SELECT unnest(range(0, {dim}))::int AS j)
SELECT asset_id, kind, n_bytes, payload_sha256, j,
       round(((('0x' || substr(raw, j*8 + 1, 8))::bigint / 4294967295.0) * 2.0 - 1.0)::float4::double, 6) AS feature_val
FROM chain, j
""".strip()


def frame_sample_plan(assets: DataFrame, every_ms: int = 500) -> DataFrame:
    """Video frame-sampling plumbing: explode each video asset into the
    timestamps a decoder would extract — pure column math (the actual
    frame grab is the stubbed decode step)."""
    vids = assets.where(F.col("kind") == "video")
    return vids.select(
        "asset_id",
        F.explode(
            F.sequence(F.lit(0), F.col("duration_ms"), F.lit(every_ms))
        ).alias("frame_ts_ms"),
    )
