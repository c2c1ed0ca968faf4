"""Multimodal column plumbing (image/audio/video as opaque binary).

The container has no image/audio codecs, so the DECODE KERNELS are
deterministic fakes or explicit ``NotImplementedError`` stubs — but the
Ray-side plumbing is real and tested: binary columns with typed metadata,
actor-pool ``map_batches`` stages with per-actor setup, small-batch
sizing for large payloads, and a fixed output feature schema.

At production scale the only changes are inside ``_decode_bytes`` /
``_extract_features`` (swap in PIL/torchvision/ffmpeg), plus
``batch_size`` tuned so batch_bytes × concurrency fits worker heap.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import ray.data as rd

FEATURE_DIM = 8


def attach_binary_payload(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Test-harness stage: materialize an opaque binary payload column +
    typed metadata (mime, n_bytes) from the text column."""
    text = batch[text_col]
    text = text.combine_chunks() if isinstance(text, pa.ChunkedArray) else text
    payload = pa.array([t.encode() for t in text.to_pylist()], pa.binary())
    n_bytes = pa.array([len(t.encode()) for t in text.to_pylist()], pa.int64())
    mime = pa.array(["application/octet-stream"] * batch.num_rows)
    return (
        batch.append_column("payload", payload)
        .append_column("mime", mime)
        .append_column("n_bytes", n_bytes)
    )


class MediaDecode:
    """Actor-pool decode stage.

    ``fake=True`` (default here): deterministic pseudo-decode — payload →
    (height, width, mean_px) derived from a blake2b digest, so tests can
    assert plumbing end-to-end. ``fake=False``: raises NotImplementedError
    (no codec libraries in this container) — the production swap point.
    """

    def __init__(self, fake: bool = True):
        self.fake = fake
        # per-actor setup point: codec init / model load happens ONCE here

    def _decode_bytes(self, payload: bytes) -> tuple[int, int, float]:
        if not self.fake:
            raise NotImplementedError(
                "real image/audio decode requires codec libraries not "
                "present in this container; run with fake=True or install "
                "PIL/ffmpeg in the cluster image"
            )
        d = hashlib.blake2b(payload, digest_size=6).digest()
        h = 16 + d[0] % 240
        w = 16 + d[1] % 240
        mean = int.from_bytes(d[2:6], "big") / 2**32
        return h, w, mean

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"].to_pylist()
        dims = [self._decode_bytes(p) for p in payloads]
        return (
            batch.append_column("height", pa.array([d[0] for d in dims], pa.int32()))
            .append_column("width", pa.array([d[1] for d in dims], pa.int32()))
            .append_column(
                "mean_px", pa.array([d[2] for d in dims], pa.float64())
            )
        )


class MediaFeatures:
    """Actor-pool feature-extraction stage: payload → fixed-dim vector.

    Deterministic digest-based embedding stand-in; the output column is a
    real ``list<float>`` consumable by similarity.py's ANN operators.
    """

    def __init__(self, dim: int = FEATURE_DIM):
        self.dim = dim

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = []
        for p in batch["payload"].to_pylist():
            d = hashlib.blake2b(p, digest_size=self.dim).digest()
            v = np.frombuffer(d, dtype=np.uint8).astype(np.float32) / 255.0
            feats.append(v.tolist())
        return batch.append_column(
            "features", pa.array(feats, pa.list_(pa.float32()))
        )


def media_pipeline(
    ds: rd.Dataset,
    *,
    concurrency: int = 2,
    batch_size: int = 1024,
) -> rd.Dataset:
    """documents → binary payload → decode → features (actor pools).

    ``batch_size`` is deliberately small relative to text stages: binary
    media rows are orders of magnitude wider, and batch_bytes ×
    concurrency must fit in a worker's heap. The two fixed pools together
    are clamped below the cluster CPU count — fixed pools hold their CPUs
    for the whole execution, and two pools that reserve every CPU starve
    the consuming tasks indefinitely.
    """
    try:
        import ray

        if ray.is_initialized():
            ncpu = int(ray.cluster_resources().get("CPU", 4))
            concurrency = max(1, min(concurrency, (ncpu - 1) // 2))
    except ImportError:  # pragma: no cover
        pass
    ds = ds.map_batches(attach_binary_payload, batch_format="pyarrow",
                        batch_size=None)
    ds = ds.map_batches(MediaDecode, concurrency=concurrency,
                        batch_format="pyarrow", batch_size=batch_size)
    ds = ds.map_batches(MediaFeatures, concurrency=concurrency,
                        batch_format="pyarrow", batch_size=batch_size)
    return ds
