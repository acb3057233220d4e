"""Multimodal column plumbing: binary payloads + typed metadata, processed by
Arrow-batched pandas UDFs over mapInPandas.

Images/audio/video travel as opaque ``binary`` columns with a typed metadata
struct. The Spark-side plumbing — schema, partition sizing, UDF signature,
batch shape — is real and tested. The codec step is import-guarded:
``fake=True`` (the only path exercised in this container) produces a
deterministic fake decode; ``fake=False`` decodes for real when the codec
library is importable on the executors (pillow for images, soundfile for
audio) and raises NotImplementedError otherwise — so the same code is a
tested stub here and a working decoder in a codec-equipped environment.

Scale notes: binary payloads dominate partition size — plan scans with
``spark.sql.files.maxPartitionBytes`` sized so one Arrow batch of payloads
fits executor memory, and NEVER groupBy/shuffle the binary column itself;
shuffle (id, metadata) and re-join payloads by id after the narrow stages.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("sample_rate", T.IntegerType(), True),
                    T.StructField("n_frames", T.IntegerType(), True),
                    T.StructField("format", T.StringType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURES_SCHEMA = "media_id long, kind string, n_bytes long, feat array<double>"


def synthesize_media(spark, n: int, seed: int = 42) -> DataFrame:
    """Deterministic fake media table (payload = seeded bytes) for tests."""
    df = spark.range(n).select(
        F.col("id").alias("media_id"),
        F.element_at(F.array(F.lit("image"), F.lit("audio"), F.lit("video")), (F.pmod(F.col("id"), 3) + 1).cast("int")).alias("kind"),
        F.encode(F.concat(F.lit("payload-"), F.sha2(F.concat(F.col("id").cast("string"), F.lit(seed)), 256)), "utf-8").alias("payload"),
        F.struct(
            (F.pmod(F.col("id") * 7, 64) + 16).cast("int").alias("width"),
            (F.pmod(F.col("id") * 11, 64) + 16).cast("int").alias("height"),
            F.lit(16000).alias("sample_rate"),
            (F.pmod(F.col("id"), 300) + 1).cast("int").alias("n_frames"),
            F.lit("fake").alias("format"),
        ).alias("meta"),
    )
    return df


def _decode_real_image(buf: bytes, feat_dim: int) -> list[float]:
    """Real image decode → grayscale thumbnail pixel means. ImportError
    propagates as NotImplementedError from the caller when pillow is absent."""
    import io

    import numpy as np
    from PIL import Image  # guarded: present only in codec-equipped envs

    img = Image.open(io.BytesIO(buf)).convert("L").resize((feat_dim, 1))
    return (np.asarray(img, dtype=np.float64).reshape(-1) / 255.0).tolist()


def _decode_real_audio(buf: bytes, feat_dim: int) -> list[float]:
    """Real audio decode → per-chunk RMS energy via soundfile (guarded)."""
    import io

    import numpy as np
    import soundfile  # guarded: present only in codec-equipped envs

    data, _sr = soundfile.read(io.BytesIO(buf))
    mono = np.asarray(data, dtype=np.float64)
    if mono.ndim > 1:
        mono = mono.mean(axis=1)
    chunks = np.array_split(mono, feat_dim)
    return [float(np.sqrt((c**2).mean())) if len(c) else 0.0 for c in chunks]


def decode_and_featurize(media: DataFrame, *, fake: bool = True, feat_dim: int = 8) -> DataFrame:
    """Decode payloads and extract a fixed-size feature vector per item.

    Arrow-batched: each pandas batch decodes inside the executor (numpy over
    the raw bytes for the fake path; pillow/soundfile for the real path when
    importable — NotImplementedError names the missing codec otherwise).
    """

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            if len(pdf) == 0:
                continue
            feats = []
            for buf, kind in zip(pdf["payload"], pdf["kind"]):
                raw = bytes(buf)
                if fake:
                    # deterministic fake 'decode': normalized byte-chunk means
                    arr = np.frombuffer(raw, dtype=np.uint8).astype(np.float64)
                    chunks = np.array_split(arr, feat_dim)
                    feats.append([float(c.mean()) / 255.0 if len(c) else 0.0 for c in chunks])
                    continue
                try:
                    if kind == "image":
                        feats.append(_decode_real_image(raw, feat_dim))
                    elif kind == "audio":
                        feats.append(_decode_real_audio(raw, feat_dim))
                    else:
                        raise ImportError("no video codec (ffmpeg) bound")
                except ImportError as exc:
                    raise NotImplementedError(
                        f"real {kind} decode needs its codec library on the "
                        f"executors (pillow / soundfile / ffmpeg): {exc}"
                    ) from exc
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["payload"].map(len),
                    "feat": feats,
                }
            )

    return media.mapInPandas(_run, schema=FEATURES_SCHEMA)


def sample_frames(media: DataFrame, every_n: int = 30) -> DataFrame:
    """Frame-sampling plan for video rows: one output row per sampled frame
    index (metadata-only — the real frame extraction is the stubbed decode).
    Shuffle-free: explode on the driver-declared sequence, no payload copy."""
    vids = media.filter(F.col("kind") == "video")
    return vids.select(
        "media_id",
        F.explode(F.sequence(F.lit(0), F.col("meta.n_frames") - 1, F.lit(every_n))).alias("frame_idx"),
    )
