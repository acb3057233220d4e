"""Multimodal column plumbing: binary payloads + typed metadata, processed by
Arrow-batched pandas UDFs over mapInPandas.

Images/audio/video travel as opaque ``binary`` columns with a typed metadata
struct. The Spark-side plumbing — schema, partition sizing, UDF signature,
batch shape — is real and tested. The codec step is layered:
``fake=True`` produces a deterministic fake decode (pure byte-statistics);
``fake=False`` decodes for real — pillow/soundfile/PyAV when importable
(any format), else built-in zero-dependency decoders for PPM/BMP images
(pure numpy), PCM WAV audio (stdlib ``wave``), and uncompressed BI_RGB AVI
video (struct + numpy RIFF walk), so real decodes of all three modalities
are exercised even in this codec-less container; an unrecognized format
without its codec library raises NotImplementedError naming what is
missing.

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


def _gray_band_feat(gray, feat_dim: int) -> list[float]:
    """Grayscale [h,w] float array → feat_dim column-band means in [0,1]."""
    import numpy as np

    bands = np.array_split(gray, feat_dim, axis=1)
    return [float(b.mean()) / 255.0 if b.size else 0.0 for b in bands]


def _rms_chunks(mono, feat_dim: int) -> list[float]:
    """Mono float signal in [-1,1] → feat_dim per-chunk RMS energies."""
    import numpy as np

    chunks = np.array_split(mono, feat_dim)
    return [float(np.sqrt((c**2).mean())) if len(c) else 0.0 for c in chunks]


def _avi_bytes(frames_px, fps: int = 10) -> bytes:
    """[n, h, w, 3] uint8 RGB frames → a genuine uncompressed AVI file:
    RIFF('AVI ') with a 'vids'/'DIB ' stream of BI_RGB 24-bit '00db' frames
    (bottom-up BGR rows padded to 4 bytes, exactly the BMP pixel-array
    layout). ffmpeg/VLC open these; no codec is involved at either end."""
    import struct

    n, h, w = len(frames_px), frames_px[0].shape[0], frames_px[0].shape[1]
    stride = (w * 3 + 3) // 4 * 4
    frame_size = stride * h

    def _frame_body(px) -> bytes:
        bgr = px[:, :, ::-1]  # RGB → BGR
        pad = b"\x00" * (stride - w * 3)
        return b"".join(bgr[r].tobytes() + pad for r in range(h - 1, -1, -1))

    avih = struct.pack(
        "<IIIIIIIIIIIIII",
        1_000_000 // fps,  # dwMicroSecPerFrame
        frame_size * fps,  # dwMaxBytesPerSec
        0,                 # dwPaddingGranularity
        0,                 # dwFlags (no index chunk shipped)
        n, 0, 1, frame_size, w, h, 0, 0, 0, 0,
    )
    strh = (
        b"vids" + b"DIB "
        # flags, prio, lang, initialframes, scale, rate, start, length,
        # bufsize, quality, samplesize — then rcFrame
        + struct.pack("<IHHIIIIIIII", 0, 0, 0, 0, 1, fps, 0, n, frame_size, 0, 0)
        + struct.pack("<hhhh", 0, 0, w, h)
    )
    strf = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, frame_size, 2835, 2835, 0, 0)

    def chunk(fourcc: bytes, body: bytes) -> bytes:
        return fourcc + struct.pack("<I", len(body)) + body + (b"\x00" if len(body) & 1 else b"")

    def lst(formtype: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", formtype + body)

    strl = lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf))
    hdrl = lst(b"hdrl", chunk(b"avih", avih) + strl)
    movi = lst(b"movi", b"".join(chunk(b"00db", _frame_body(px)) for px in frames_px))
    return chunk(b"RIFF", b"AVI " + hdrl + movi)


def synthesize_real_media(spark, n: int, seed: int = 42, *, include_video: bool = False) -> DataFrame:
    """Deterministic table of GENUINE media payloads — valid binary PPM
    images, 24-bit BMP images, 16-bit PCM WAV audio, and (opt-in) raw
    BI_RGB AVI video — built with stdlib/numpy only. Small by construction
    (tests drive the real decode path through them in codec-less
    containers); MEDIA_SCHEMA-shaped. ``include_video=False`` keeps the
    historical 3-way rotation byte-stable for golden tests."""
    import struct
    import wave as wave_mod
    import io

    import numpy as np

    period = 4 if include_video else 3
    rows = []
    for i in range(n):
        rng = np.random.default_rng(seed * 1_000_003 + i)
        kind_sel = i % period
        if kind_sel == 0:  # PPM image
            w, h = 16 + i % 8, 16 + (i * 3) % 8
            px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
            payload = b"P6\n%d %d\n255\n" % (w, h) + px.tobytes()
            rows.append((i, "image", bytearray(payload), (w, h, None, None, "ppm")))
        elif kind_sel == 1:  # 16-bit PCM WAV
            sr, n_samp = 8000, 800 + 16 * (i % 5)
            t = np.arange(n_samp) / sr
            sig = (0.5 * np.sin(2 * np.pi * (200 + 50 * (i % 7)) * t) * 32767).astype("<i2")
            bio = io.BytesIO()
            with wave_mod.open(bio, "wb") as wf:
                wf.setnchannels(1)
                wf.setsampwidth(2)
                wf.setframerate(sr)
                wf.writeframes(sig.tobytes())
            rows.append((i, "audio", bytearray(bio.getvalue()), (None, None, sr, None, "wav")))
        elif kind_sel == 2:  # 24-bit bottom-up BMP
            w, h = 12 + i % 6, 10 + (i * 5) % 6
            px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)  # BGR rows
            stride = (w * 3 + 3) // 4 * 4
            body = b"".join(
                px[r].tobytes() + b"\x00" * (stride - w * 3) for r in range(h - 1, -1, -1)
            )
            header = (
                b"BM"
                + struct.pack("<IHHI", 54 + len(body), 0, 0, 54)
                + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0)
            )
            rows.append((i, "image", bytearray(header + body), (w, h, None, None, "bmp")))
        else:  # uncompressed BI_RGB AVI video (include_video=True only)
            w, h = 8 + i % 4, 6 + (i * 3) % 4
            n_frames = 4 + i % 3
            frames = [
                rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8) for _ in range(n_frames)
            ]
            rows.append(
                (i, "video", bytearray(_avi_bytes(frames)), (w, h, None, n_frames, "avi"))
            )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def _rgb_ppm_numpy(buf: bytes):
    """Binary PPM (P6, maxval<=255) → [h, w, 3] uint8 RGB, pure numpy.

    Header: 'P6' <ws> width <ws> height <ws> maxval <single ws> raw RGB.
    '#' comments allowed between tokens."""
    import numpy as np

    pos = 2  # past 'P6'
    vals = []
    while len(vals) < 3:
        while pos < len(buf) and buf[pos : pos + 1].isspace():
            pos += 1
        if buf[pos : pos + 1] == b"#":
            pos = buf.index(b"\n", pos) + 1
            continue
        start = pos
        while pos < len(buf) and not buf[pos : pos + 1].isspace():
            pos += 1
        vals.append(int(buf[start:pos]))
    pos += 1  # the single whitespace byte after maxval
    w, h, maxval = vals
    if maxval > 255:
        raise ValueError("16-bit PPM not supported by the numpy fallback")
    px = np.frombuffer(buf, dtype=np.uint8, count=w * h * 3, offset=pos)
    return px.reshape(h, w, 3)


def _rgb_bmp_numpy(buf: bytes):
    """Uncompressed 24-bit BMP → [h, w, 3] uint8 RGB, pure numpy.

    Little-endian header: pixel-array offset at byte 10, width/height at
    18/22 (height<0 = top-down), bpp at 28, compression at 30 (must be 0,
    BI_RGB). Rows are BGR, padded to 4-byte multiples, bottom-up."""
    import struct

    import numpy as np

    off = struct.unpack_from("<I", buf, 10)[0]
    w, h = struct.unpack_from("<ii", buf, 18)
    bpp = struct.unpack_from("<H", buf, 28)[0]
    comp = struct.unpack_from("<I", buf, 30)[0]
    if bpp != 24 or comp != 0:
        raise ValueError(f"numpy BMP fallback handles 24-bit BI_RGB only (bpp={bpp}, comp={comp})")
    top_down = h < 0
    h = abs(h)
    stride = (w * 3 + 3) // 4 * 4
    rows = np.frombuffer(buf, dtype=np.uint8, count=stride * h, offset=off).reshape(h, stride)
    bgr = rows[:, : w * 3].reshape(h, w, 3)
    if not top_down:
        bgr = bgr[::-1]
    return bgr[:, :, ::-1]  # BGR → RGB


def _gray(rgb) -> "object":
    """[h,w,3] uint8 → float64 luma, the ITU-R 601-2 weights pillow's 'L'
    mode uses, so the pillow and numpy image paths agree on semantics."""
    f = rgb.astype("float64")
    return f[:, :, 0] * 0.299 + f[:, :, 1] * 0.587 + f[:, :, 2] * 0.114


def _decode_ppm_numpy(buf: bytes, feat_dim: int):
    """Binary PPM → grayscale band means (see _rgb_ppm_numpy / _gray)."""
    return _gray_band_feat(_gray(_rgb_ppm_numpy(buf)), feat_dim)


def _decode_bmp_numpy(buf: bytes, feat_dim: int):
    """Uncompressed 24-bit BMP → grayscale band means (see _rgb_bmp_numpy)."""
    return _gray_band_feat(_gray(_rgb_bmp_numpy(buf)), feat_dim)


def _decode_wav_stdlib(buf: bytes, feat_dim: int):
    """PCM WAV → per-chunk RMS via the stdlib ``wave`` module + numpy —
    no soundfile needed. Samples normalize to [-1,1] like soundfile's
    float output (8-bit WAV is unsigned, 16/32-bit signed)."""
    import io
    import wave

    import numpy as np

    with wave.open(io.BytesIO(buf), "rb") as wf:
        n_ch = wf.getnchannels()
        width = wf.getsampwidth()
        frames = wf.readframes(wf.getnframes())
    if width == 1:
        data = (np.frombuffer(frames, dtype=np.uint8).astype(np.float64) - 128.0) / 128.0
    elif width == 2:
        data = np.frombuffer(frames, dtype="<i2").astype(np.float64) / 32768.0
    elif width == 4:
        data = np.frombuffer(frames, dtype="<i4").astype(np.float64) / 2147483648.0
    else:
        raise ValueError(f"unsupported WAV sample width {width}")
    mono = data.reshape(-1, n_ch).mean(axis=1) if n_ch > 1 else data
    return _rms_chunks(mono, feat_dim)


def _video_frames_avi_numpy(buf: bytes):
    """Uncompressed (BI_RGB 24-bit) AVI → list of [h, w, 3] uint8 RGB frames,
    pure stdlib struct + numpy — the video sibling of the BMP decoder.

    RIFF walk: LIST/RIFF chunks recurse (4-byte formtype then children);
    'strf' carries the BITMAPINFOHEADER (same layout BMP uses at offset 14);
    '..db'/'..dc' chunks under 'movi' are frames — bottom-up BGR rows padded
    to 4-byte multiples, exactly the BMP pixel array."""
    import struct

    import numpy as np

    if buf[:4] != b"RIFF" or buf[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI payload")
    strf: list[bytes] = []
    raw_frames: list[bytes] = []

    def walk(pos: int, end: int) -> None:
        while pos + 8 <= end:
            fourcc = buf[pos : pos + 4]
            size = struct.unpack_from("<I", buf, pos + 4)[0]
            body = pos + 8
            if fourcc in (b"RIFF", b"LIST"):
                walk(body + 4, body + size)
            elif fourcc == b"strf" and not strf:
                strf.append(buf[body : body + size])
            elif fourcc[2:4] in (b"db", b"dc") and size:
                raw_frames.append(buf[body : body + size])
            pos = body + size + (size & 1)

    walk(0, len(buf))
    if not strf:
        raise ValueError("AVI without a strf stream-format header")
    hdr = strf[0]
    w, h = struct.unpack_from("<ii", hdr, 4)
    bpp = struct.unpack_from("<H", hdr, 14)[0]
    comp = struct.unpack_from("<I", hdr, 16)[0]
    if bpp != 24 or comp != 0:
        raise ValueError(f"numpy AVI fallback handles 24-bit BI_RGB only (bpp={bpp}, comp={comp})")
    top_down = h < 0
    h = abs(h)
    stride = (w * 3 + 3) // 4 * 4
    out = []
    for fr in raw_frames:
        rows = np.frombuffer(fr, dtype=np.uint8, count=stride * h).reshape(h, stride)
        bgr = rows[:, : w * 3].reshape(h, w, 3)
        if not top_down:
            bgr = bgr[::-1]
        out.append(np.ascontiguousarray(bgr[:, :, ::-1]))
    return out


def _video_frames(buf: bytes) -> list:
    """All decoded RGB frames of a video payload: PyAV when importable (any
    container/codec), the pure-numpy uncompressed-AVI decoder otherwise.
    Raises ImportError when the payload needs a codec this environment
    lacks, ValueError when the payload is malformed or decodes to zero
    frames (a structurally-valid container with an empty movi list would
    otherwise surface as an opaque np.stack error downstream)."""
    try:
        import av  # guarded: present only in codec-equipped envs
        import io

        frames = []
        with av.open(io.BytesIO(buf)) as container:
            for frame in container.decode(video=0):
                frames.append(frame.to_ndarray(format="rgb24"))
    except ImportError:
        if buf[:4] == b"RIFF" and buf[8:12] == b"AVI ":
            frames = _video_frames_avi_numpy(buf)
        else:
            raise
    if not frames:
        raise ValueError("video payload decoded to zero frames")
    return frames


def _decode_real_video(buf: bytes, feat_dim: int) -> list[float]:
    """Real video decode → normalized grayscale features of the TEMPORAL-MEAN
    frame (deterministic, shape-independent of frame count). PyAV when
    importable (any container/codec); the pure-numpy uncompressed-AVI decoder
    otherwise — so a *real* video decode runs in codec-less containers."""
    import numpy as np

    frames = _video_frames(buf)
    mean_rgb = np.mean(np.stack(frames).astype("float64"), axis=0)
    return _gray_band_feat(_gray(mean_rgb.astype("uint8")), feat_dim)


def _decode_real_image(buf: bytes, feat_dim: int) -> list[float]:
    """Real image decode → normalized grayscale features. Pillow when
    importable (any format); pure-numpy PPM/BMP decoders otherwise — so a
    *real* decode is exercisable in codec-less containers. ImportError on an
    undecodable format propagates as NotImplementedError from the caller."""
    import io

    import numpy as np

    try:
        from PIL import Image  # guarded: present only in codec-equipped envs

        img = Image.open(io.BytesIO(buf)).convert("L").resize((feat_dim, 1))
        return (np.asarray(img, dtype=np.float64).reshape(-1) / 255.0).tolist()
    except ImportError:
        if buf[:2] == b"P6":
            return _decode_ppm_numpy(buf, feat_dim)
        if buf[:2] == b"BM":
            return _decode_bmp_numpy(buf, feat_dim)
        raise


def _decode_real_audio(buf: bytes, feat_dim: int) -> list[float]:
    """Real audio decode → per-chunk RMS energy. soundfile when importable
    (any format); stdlib ``wave`` for RIFF/WAV payloads otherwise."""
    import io

    import numpy as np

    try:
        import soundfile  # guarded: present only in codec-equipped envs

        data, _sr = soundfile.read(io.BytesIO(buf))
        mono = np.asarray(data, dtype=np.float64)
        if mono.ndim > 1:
            mono = mono.mean(axis=1)
        return _rms_chunks(mono, feat_dim)
    except ImportError:
        if buf[:4] == b"RIFF":
            return _decode_wav_stdlib(buf, feat_dim)
        raise


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
                    elif kind == "video":
                        feats.append(_decode_real_video(raw, feat_dim))
                    else:
                        raise NotImplementedError(
                            f"unsupported media kind {kind!r} "
                            f"(expected image/audio/video)"
                        )
                except ImportError as exc:
                    raise NotImplementedError(
                        f"real {kind} decode needs its codec library on the "
                        f"executors (pillow / soundfile / PyAV): {exc}"
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


def _rgb_any(buf: bytes):
    """Any image payload → [h, w, 3] uint8 RGB: pillow when importable,
    zero-dependency numpy decoders for PPM/BMP otherwise."""
    import io

    import numpy as np

    try:
        from PIL import Image  # guarded: present only in codec-equipped envs

        return np.asarray(Image.open(io.BytesIO(buf)).convert("RGB"), dtype=np.uint8)
    except ImportError:
        if buf[:2] == b"P6":
            return _rgb_ppm_numpy(buf)
        if buf[:2] == b"BM":
            return _rgb_bmp_numpy(buf)
        raise


RESIZED_SCHEMA = "media_id long, width int, height int, payload binary"


def resize_images(media: DataFrame, *, width: int, height: int) -> DataFrame:
    """[media_id, width, height, payload]: image rows resized to a fixed
    width×height and re-encoded as binary PPM (P6).

    The normalization stage of a multimodal training pipeline: whatever
    format came in (pillow-decodable anywhere; PPM/BMP with zero codec deps),
    one fixed-shape codec-independent format comes out, so downstream
    feature extraction never branches on format again. Nearest-neighbor
    resampling via pure numpy index arithmetic — deterministic across
    environments (no resampling-kernel drift between pillow versions), no
    per-pixel Python (two fancy-index gathers per image). Arrow-batched
    mapInPandas; the binary column is mapped in place, never shuffled."""

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            pdf = pdf[pdf["kind"] == "image"]
            if len(pdf) == 0:
                continue
            payloads = []
            for buf in pdf["payload"]:
                rgb = _rgb_any(bytes(buf))
                src_h, src_w = rgb.shape[0], rgb.shape[1]
                yi = np.arange(height) * src_h // height
                xi = np.arange(width) * src_w // width
                out = np.ascontiguousarray(rgb[yi][:, xi])
                payloads.append(b"P6\n%d %d\n255\n" % (width, height) + out.tobytes())
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": width,
                    "height": height,
                    "payload": payloads,
                }
            )

    return media.mapInPandas(_run, schema=RESIZED_SCHEMA)


def sample_frames(media: DataFrame, every_n: int = 30) -> DataFrame:
    """Frame-sampling plan for video rows: one output row per sampled frame
    index (metadata-only; ``extract_frames`` is the payload-decoding
    sibling). Shuffle-free: explode on the driver-declared sequence, no
    payload copy."""
    vids = media.filter(F.col("kind") == "video")
    return vids.select(
        "media_id",
        F.explode(F.sequence(F.lit(0), F.col("meta.n_frames") - 1, F.lit(every_n))).alias("frame_idx"),
    )


FRAMES_SCHEMA = "media_id long, frame_idx int, width int, height int, payload binary"


def extract_frames(media: DataFrame, every_n: int = 30) -> DataFrame:
    """REAL frame extraction for video rows: decode the container, keep every
    ``every_n``-th frame, re-encode each as binary PPM (the same
    codec-independent normal form resize_images emits). One output row per
    (media_id, frame_idx) — exactly the indices ``sample_frames`` plans.

    PyAV when importable; the zero-dependency uncompressed-AVI decoder
    otherwise. Arrow-batched mapInPandas; payloads are decoded and re-encoded
    in place inside the executor — the binary column never shuffles."""

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf[pdf["kind"] == "video"]
            if len(pdf) == 0:
                continue
            out = {"media_id": [], "frame_idx": [], "width": [], "height": [], "payload": []}
            for mid, buf in zip(pdf["media_id"], pdf["payload"]):
                try:
                    frames = _video_frames(bytes(buf))
                except ImportError as exc:
                    raise NotImplementedError(
                        f"real video decode needs PyAV for non-AVI containers: {exc}"
                    ) from exc
                for idx in range(0, len(frames), every_n):
                    px = frames[idx]
                    h, w = px.shape[0], px.shape[1]
                    out["media_id"].append(mid)
                    out["frame_idx"].append(idx)
                    out["width"].append(w)
                    out["height"].append(h)
                    out["payload"].append(b"P6\n%d %d\n255\n" % (w, h) + px.tobytes())
            yield pd.DataFrame(out)

    return media.mapInPandas(_run, schema=FRAMES_SCHEMA)
