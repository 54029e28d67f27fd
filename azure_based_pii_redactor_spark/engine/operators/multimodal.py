"""Multimodal columns: image/audio/video as opaque ``binary`` + typed
metadata, with decode / feature-extract / resize / frame-sample as
Arrow-batched ``mapInPandas`` stages.

The sandbox has no image/audio libraries, so the DECODE step is a
deterministic fake over a self-describing synthetic container format
(clearly marked; swap ``_decode_blob`` for PIL/librosa/pyav on a real
cluster -- the Spark-side plumbing (schema, partitioning, UDF signature,
batch shape) is real and tested).

Synthetic container layout (bytes):
    magic[4] = FIMG | FAUD | FVID
    width:uint16  height:uint16     (images/video)  OR
    sample_rate:uint16 n_samples:uint16 (audio)
    n_frames:uint16                  (video; 1 for image/audio)
    payload  = deterministic pseudo-pixels/samples
"""

from __future__ import annotations

import struct
from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

MAGIC = {"image": b"FIMG", "audio": b"FAUD", "video": b"FVID"}

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("payload", T.BinaryType(), False),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType()), True),
    ]
)


def _make_blob(rng: np.random.Generator, kind: str) -> bytes:
    if kind == "audio":
        rate = int(rng.integers(8, 48)) * 1000
        n = int(rng.integers(100, 1000))
        header = MAGIC[kind] + struct.pack(
            "<HHH", rate // 1000, n, 1
        )
        body = rng.integers(0, 256, n).astype(np.uint8).tobytes()
        return header + body
    w = int(rng.integers(16, 256))
    h = int(rng.integers(16, 256))
    frames = 1 if kind == "image" else int(rng.integers(2, 16))
    header = MAGIC[kind] + struct.pack("<HHH", w, h, frames)
    body = rng.integers(0, 256, min(w * h, 4096) * frames).astype(
        np.uint8).tobytes()
    return header + body


def generate_media(
    spark: SparkSession, n_rows: int, seed: int = 42, parts: int | None = None
) -> DataFrame:
    """Deterministic synthetic media table ((seed,id)-pure, like pages)."""
    parts = parts or spark.sparkContext.defaultParallelism
    kinds = ("image", "audio", "video")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid in pdf["id"]:
                rng = np.random.Generator(np.random.PCG64(
                    np.random.SeedSequence([seed, int(mid)])))
                kind = kinds[int(rng.integers(0, 3))]
                rows.append(
                    (int(mid), kind, _make_blob(rng, kind),
                     {"source": f"crawl{int(mid) % 7}"})
                )
            yield pd.DataFrame(
                rows, columns=["media_id", "kind", "payload", "meta"]
            )

    return spark.range(0, n_rows, numPartitions=parts).mapInPandas(
        gen, schema=MEDIA_SCHEMA
    )


def _decode_blob(blob: bytes) -> dict:
    """STUB DECODE -- deterministic parse of the synthetic container.
    On a production cluster replace with PIL.Image.open / soundfile /
    pyav; the calling plumbing is unchanged."""
    magic = bytes(blob[:4])
    a, b, c = struct.unpack("<HHH", bytes(blob[4:10]))
    if magic == MAGIC["audio"]:
        return {"kind": "audio", "width": 0, "height": 0,
                "sample_rate": a * 1000, "n_frames": c,
                "n_payload_bytes": len(blob) - 10}
    kind = "image" if magic == MAGIC["image"] else "video"
    return {"kind": kind, "width": a, "height": b, "sample_rate": 0,
            "n_frames": c, "n_payload_bytes": len(blob) - 10}


DECODED_SCHEMA = (
    "media_id long, kind string, width int, height int, sample_rate int,"
    " n_frames int, n_payload_bytes int"
)


def decode_media_metadata(media: DataFrame) -> DataFrame:
    """Decode stage: binary -> typed metadata (Arrow batches; one Python
    exchange)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [_decode_blob(b) for b in pdf["payload"]]
            out = pd.DataFrame(metas)
            out.insert(0, "media_id", pdf["media_id"].to_numpy())
            yield out[["media_id", "kind", "width", "height",
                       "sample_rate", "n_frames", "n_payload_bytes"]]

    return media.mapInPandas(run, schema=DECODED_SCHEMA)


def frame_sample(media: DataFrame, every_n: int = 2) -> DataFrame:
    """Video frame sampling: explode every Nth frame as its own binary row
    (the UDTF-ish shape a video pipeline needs).  Frame extraction on the
    synthetic container is a real byte-slice; with pyav it would decode."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for mid, kind, blob in zip(
                pdf["media_id"], pdf["kind"], pdf["payload"]
            ):
                if kind != "video":
                    continue
                meta = _decode_blob(blob)
                n = meta["n_frames"]
                body = bytes(blob[10:])
                per = max(len(body) // max(n, 1), 1)
                for i in range(0, n, every_n):
                    ids.append(int(mid))
                    idxs.append(i)
                    frames.append(body[i * per : (i + 1) * per])
            yield pd.DataFrame(
                {"media_id": ids, "frame_idx": idxs, "frame": frames}
            )

    return media.mapInPandas(
        run, schema="media_id long, frame_idx int, frame binary"
    )


def resize_images(
    media: DataFrame, width: int = 32, height: int = 32,
    use_fake_decode: bool = True,
) -> DataFrame:
    """Resize stage.  ``use_fake_decode=True`` (default; the sandbox path)
    applies a deterministic fake resize over the synthetic container.
    ``use_fake_decode=False`` is the production path: it requires PIL and
    raises a clear NotImplementedError when the library is MISSING (the
    import-gated pattern; see sources/tabular.py:read_excel)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if not use_fake_decode:
            try:
                from PIL import Image  # noqa: F401
            except ImportError as exc:  # pragma: no cover - sandbox path
                raise NotImplementedError(
                    "real image resize requires Pillow; install it or use "
                    "use_fake_decode=True for the synthetic container"
                ) from exc
        for pdf in batches:
            out_ids, blobs = [], []
            for mid, kind, blob in zip(
                pdf["media_id"], pdf["kind"], pdf["payload"]
            ):
                if kind != "image":
                    continue
                if not use_fake_decode:  # pragma: no cover - needs PIL
                    raise NotImplementedError(
                        "wire PIL decode->resize->encode here"
                    )
                # deterministic fake: re-header with the target size and
                # truncate/pad the payload to w*h bytes
                body = bytes(blob[10:])[: width * height]
                body = body.ljust(width * height, b"\0")
                blobs.append(
                    MAGIC["image"] + struct.pack("<HHH", width, height, 1)
                    + body
                )
                out_ids.append(int(mid))
            yield pd.DataFrame({"media_id": out_ids, "payload": blobs})

    return media.mapInPandas(run, schema="media_id long, payload binary")


def media_features(media: DataFrame, dim: int = 16) -> DataFrame:
    """Feature extraction: deterministic hash-based embedding per blob
    (stands in for a CLIP/wav2vec encoder; unit-norm float array feeds the
    similarity operators unchanged)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            vecs = []
            for blob in pdf["payload"]:
                arr = np.frombuffer(bytes(blob[10:]), dtype=np.uint8)
                # bucket byte histogram -> L2-normalized float vector
                hist = np.bincount(arr % dim, minlength=dim).astype(
                    np.float64)
                norm = np.linalg.norm(hist)
                vecs.append((hist / norm if norm else hist).astype(
                    np.float32).tolist())
            yield pd.DataFrame(
                {"media_id": pdf["media_id"], "embedding": vecs}
            )

    return media.mapInPandas(
        run, schema="media_id long, embedding array<float>"
    )


def media_stats(media: DataFrame) -> DataFrame:
    """Per-kind rollup over decoded metadata (JVM-side agg)."""
    decoded = decode_media_metadata(media)
    return (
        decoded.groupBy("kind")
        .agg(
            F.count("*").alias("n"),
            F.round(F.avg("width"), 2).alias("avg_width"),
            F.round(F.avg("n_frames"), 2).alias("avg_frames"),
            F.sum("n_payload_bytes").alias("total_bytes"),
        )
        .orderBy("kind")
    )


# queries()-surface entries (no SQL oracle: binary container parsing is
# not SQL-expressible -> rows-only checks)

def multimodal_stats(spark, sf_dir):
    media = generate_media(spark, 300, seed=42)
    return media_stats(media)


def multimodal_frame_sample(spark, sf_dir):
    media = generate_media(spark, 200, seed=42)
    return frame_sample(media).orderBy("media_id", "frame_idx")


QUERIES = {
    "multimodal_stats": multimodal_stats,
    "multimodal_frame_sample": multimodal_frame_sample,
}
ORACLES: dict[str, str] = {}
