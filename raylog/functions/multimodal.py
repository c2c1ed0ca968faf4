"""Multimodal column plumbing (image/audio/video as opaque binary).

Stages dispatch on the ``mime`` column. For formats that need no
external codec — PPM (P6) images, PCM16 WAV audio, and concatenated-P6
"video" streams — decode / resize / frame-sample are REAL kernels
(`raylog.functions.codecs`: header parsing + numpy buffer views, no
PIL/ffmpeg). Every other mime still routes to a deterministic fake or
an explicit ``NotImplementedError`` stub — the production swap point
for PIL/torchvision/ffmpeg.

The Ray-side plumbing is the same either way and is tested end-to-end:
binary columns with typed metadata, actor-pool ``map_batches`` stages
with per-actor setup, small-batch sizing for large payloads, fixed
output schemas. At production scale only the codec swap and
``batch_size`` (batch_bytes × concurrency must fit worker heap) change.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import ray.data as rd

from raylog.functions import codecs

FEATURE_DIM = 8


def _try_import_pil():
    """Optional Pillow import, attempted ONCE per actor at __init__.

    Not present in this container; on a cluster image that ships
    Pillow the real branch lights up with no code change (VERDICT r2
    next-round #8)."""
    try:  # pragma: no cover - exercised only where Pillow is installed
        from PIL import Image

        return Image
    except ImportError:
        return None


def _try_import_soundfile():
    """Optional soundfile import (same contract as :func:`_try_import_pil`)."""
    try:  # pragma: no cover - exercised only where soundfile is installed
        import soundfile

        return soundfile
    except ImportError:
        return None


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


def attach_ppm_payload(batch: pa.Table, id_col: str = "doc_id") -> pa.Table:
    """Synthesize a REAL deterministic P6 image per row (gradient whose
    geometry and phase derive from the id) — the test/bench feed for the
    real decode path."""
    ids = np.asarray(batch[id_col].combine_chunks(), dtype=np.int64)
    payloads = []
    for d in ids:
        h = 8 + int(d) % 25
        w = 8 + int(d) % 31
        y, x = np.mgrid[0:h, 0:w]
        img = np.stack([
            (x * 8 + d) % 256, (y * 8 + d // 2) % 256, (x + y + d) % 256,
        ], axis=2).astype(np.uint8)
        payloads.append(codecs.encode_ppm(img))
    return (
        batch.append_column("payload", pa.array(payloads, pa.binary()))
        .append_column("mime", pa.array([codecs.PPM_MIME] * len(ids)))
        .append_column("n_bytes",
                       pa.array([len(p) for p in payloads], pa.int64()))
    )


def attach_wav_payload(batch: pa.Table, id_col: str = "doc_id",
                       rate: int = 8000) -> pa.Table:
    """Synthesize a REAL deterministic PCM16 WAV per row (integer
    pseudo-waveform seeded by the id)."""
    ids = np.asarray(batch[id_col].combine_chunks(), dtype=np.int64)
    payloads = []
    for d in ids:
        n = 256 + int(d) % 512
        t = np.arange(n, dtype=np.int64)
        samples = (((t * (2654435761 + d)) >> 7) % 65536 - 32768).astype(
            np.int16)
        payloads.append(codecs.encode_wav(samples, rate))
    return (
        batch.append_column("payload", pa.array(payloads, pa.binary()))
        .append_column("mime", pa.array([codecs.WAV_MIME] * len(ids)))
        .append_column("n_bytes",
                       pa.array([len(p) for p in payloads], pa.int64()))
    )


class MediaDecode:
    """Actor-pool decode stage, mime-dispatched.

    REAL decode for P6 ppm images (numpy header parse + buffer view →
    true height/width/mean pixel) and PCM16 wav audio (stdlib wave →
    (1, n_samples, normalized mean |amplitude|)). Other mimes:
    ``fake=True`` (default) digest-based pseudo-decode so plumbing tests
    run end-to-end; ``fake=False`` raises NotImplementedError — the
    PIL/ffmpeg swap point.
    """

    def __init__(self, fake: bool = True):
        self.fake = fake
        # per-actor setup point: codec init / model load happens ONCE here
        self._pil = _try_import_pil()
        self._sf = _try_import_soundfile()

    def _decode_bytes(self, payload: bytes, mime: str) -> tuple[int, int, float]:
        if mime == codecs.PPM_MIME:
            img = codecs.decode_ppm(payload)
            return img.shape[0], img.shape[1], float(img.mean() / 255.0)
        if mime == codecs.WAV_MIME:
            _, samples = codecs.decode_wav(payload)
            return 1, len(samples), float(
                np.abs(samples.astype(np.float64)).mean() / 32768.0)
        if self._pil is not None and mime.startswith("image/"):
            import io

            img = self._pil.open(io.BytesIO(payload)).convert("RGB")
            arr = np.asarray(img, dtype=np.float64)
            return arr.shape[0], arr.shape[1], float(arr.mean() / 255.0)
        if self._sf is not None and mime.startswith("audio/"):
            import io

            samples, _rate = self._sf.read(io.BytesIO(payload),
                                           dtype="float64")
            return 1, len(samples), float(np.abs(samples).mean())
        if not self.fake:
            raise NotImplementedError(
                "real decode for this mime requires codec libraries not "
                "present in this container; install PIL/ffmpeg in the "
                "cluster image"
            )
        # md5 (not blake2b): DuckDB has md5(), so the external oracle
        # can recompute the fake-kernel outputs bit-for-bit
        d = hashlib.md5(payload).digest()
        h = 16 + d[0] % 240
        w = 16 + d[1] % 240
        mean = int.from_bytes(d[2:6], "big") / 2**32
        return h, w, mean

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"].to_pylist()
        mimes = batch["mime"].to_pylist()
        dims = [self._decode_bytes(p, m) for p, m in zip(payloads, mimes)]
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
            # md5 digest, /256: DuckDB-recomputable, and a power-of-two
            # denominator keeps every float32 feature value EXACT, so
            # integer-domain checksums over the features are stable
            d = hashlib.md5(p).digest()[: self.dim]
            v = np.frombuffer(d, dtype=np.uint8).astype(np.float32) / 256.0
            feats.append(v.tolist())
        return batch.append_column(
            "features", pa.array(feats, pa.list_(pa.float32()))
        )


class MediaResize:
    """Actor-pool resize stage: clamp the longer image side to
    ``max_side``, preserving aspect ratio.

    The geometry (real) is computed vectorized from the decoded
    height/width metadata; re-encoding the payload is the stubbed codec
    half (``fake=True`` re-digests deterministically; ``fake=False``
    raises — the PIL/torchvision swap point)."""

    def __init__(self, max_side: int = 64, fake: bool = True):
        self.max_side = max_side
        self.fake = fake
        self._pil = _try_import_pil()

    def _pil_resize(self, payload: bytes, mime: str, nh: int,
                    nw: int) -> bytes:  # pragma: no cover - needs Pillow
        import io

        img = self._pil.open(io.BytesIO(payload))
        fmt = img.format or mime.split("/", 1)[1].upper()
        out = io.BytesIO()
        img.resize((nw, nh)).save(out, format=fmt)
        return out.getvalue()

    def __call__(self, batch: pa.Table) -> pa.Table:
        h = np.asarray(batch["height"].combine_chunks()
                       if isinstance(batch["height"], pa.ChunkedArray)
                       else batch["height"], dtype=np.float64)
        w = np.asarray(batch["width"].combine_chunks()
                       if isinstance(batch["width"], pa.ChunkedArray)
                       else batch["width"], dtype=np.float64)
        scale = np.minimum(1.0, self.max_side / np.maximum(h, w))
        nh = np.maximum(1, np.round(h * scale)).astype(np.int32)
        nw = np.maximum(1, np.round(w * scale)).astype(np.int32)
        mimes = (batch["mime"].to_pylist() if "mime" in batch.column_names
                 else [""] * batch.num_rows)
        payloads = []
        for p, m, a, b in zip(batch["payload"].to_pylist(), mimes, nh, nw):
            if m == codecs.PPM_MIME:
                # REAL resample: decode → nearest-neighbor gather → encode
                payloads.append(codecs.encode_ppm(
                    codecs.resize_nearest(codecs.decode_ppm(p), int(a),
                                          int(b))))
            elif self._pil is not None and m.startswith("image/"):
                payloads.append(self._pil_resize(p, m, int(a), int(b)))
            elif not self.fake:
                raise NotImplementedError(
                    "real resampling for this mime requires PIL, not in "
                    "this container"
                )
            else:
                payloads.append(hashlib.blake2b(
                    p + bytes([int(a) % 256, int(b) % 256]),
                    digest_size=16).digest())
        return (
            batch.append_column("resized_height", pa.array(nh))
            .append_column("resized_width", pa.array(nw))
            .append_column("resized_payload", pa.array(payloads, pa.binary()))
        )


class FrameSampler:
    """Actor-pool video frame-sampling stage: one input row (a video
    payload) → ``n_frames`` output rows (doc_id, frame_idx, frame
    payload) — the exploded layout a training pipeline feeds to image
    models. Deterministic fake frame extraction (payload byte slices);
    the ffmpeg swap point is ``_frame_bytes``."""

    def __init__(self, n_frames: int = 4, fake: bool = True):
        self.n_frames = n_frames
        self.fake = fake

    def _frame_bytes(self, payload: bytes, idx: int) -> bytes:
        if not self.fake:
            raise NotImplementedError(
                "real frame extraction requires ffmpeg, not present in "
                "this container; run with fake=True"
            )
        step = max(1, len(payload) // self.n_frames)
        return payload[idx * step: idx * step + step] or b"\x00"

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        payloads = batch["payload"].to_pylist()
        mimes = (batch["mime"].to_pylist() if "mime" in batch.column_names
                 else [""] * batch.num_rows)
        out_id, out_idx, out_frame = [], [], []
        for i, p, m in zip(ids, payloads, mimes):
            if m == codecs.PPM_STREAM_MIME:
                # REAL frame extraction: header-scan the P6 stream and
                # take n_frames evenly spaced actual frames
                frames = codecs.ppm_stream_frames(p)
                sel = np.linspace(0, len(frames) - 1,
                                  min(self.n_frames, len(frames))).astype(int)
                for j, fi in enumerate(sel):
                    out_id.append(i)
                    out_idx.append(j)
                    out_frame.append(frames[fi])
                continue
            for j in range(self.n_frames):
                out_id.append(i)
                out_idx.append(j)
                out_frame.append(self._frame_bytes(p, j))
        return pa.table({
            "doc_id": pa.array(out_id, pa.int64()),
            "frame_idx": pa.array(out_idx, pa.int32()),
            "frame": pa.array(out_frame, pa.binary()),
        })


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


def media_pipeline_real(
    ds: rd.Dataset,
    *,
    kind: str = "image",
    concurrency: int = 2,
    batch_size: int = 1024,
    max_side: int = 16,
) -> rd.Dataset:
    """documents → REAL media payloads (P6 / WAV) → real decode →
    resize (images) → features. Same pool-sizing rules as
    `media_pipeline`; the codec work is genuine numpy/stdlib decode."""
    try:
        import ray

        if ray.is_initialized():
            ncpu = int(ray.cluster_resources().get("CPU", 4))
            concurrency = max(1, min(concurrency, (ncpu - 1) // 2))
    except ImportError:  # pragma: no cover
        pass
    attach = attach_ppm_payload if kind == "image" else attach_wav_payload
    ds = ds.map_batches(attach, batch_format="pyarrow", batch_size=None)
    ds = ds.map_batches(MediaDecode, concurrency=concurrency,
                        batch_format="pyarrow", batch_size=batch_size)
    if kind == "image":
        ds = ds.map_batches(
            MediaResize, fn_constructor_kwargs={"max_side": max_side},
            concurrency=concurrency, batch_format="pyarrow",
            batch_size=batch_size,
        )
    return ds


def frame_sample_pipeline(
    ds: rd.Dataset,
    *,
    n_frames: int = 4,
    concurrency: int = 2,
    batch_size: int = 256,
) -> rd.Dataset:
    """documents → video-payload analog → exploded per-frame rows.

    The explode multiplies rows ×n_frames AND bytes; ``batch_size`` is
    sized smaller again so output batch bytes stay bounded."""
    try:
        import ray

        if ray.is_initialized():
            ncpu = int(ray.cluster_resources().get("CPU", 4))
            concurrency = max(1, min(concurrency, ncpu - 2))
    except ImportError:  # pragma: no cover
        pass
    ds = ds.map_batches(attach_binary_payload, batch_format="pyarrow",
                        batch_size=None)
    return ds.map_batches(
        FrameSampler, fn_constructor_kwargs={"n_frames": n_frames},
        concurrency=concurrency, batch_format="pyarrow",
        batch_size=batch_size,
    )


class AudioWindows:
    """Actor-pool windowed audio-energy stage: PCM16 WAV payload →
    one row per fixed-size sample window with the EXACT integer energy
    (Σ a², ≤ 64·32768² ≪ 2^53 — bit-exact in any accumulation order).
    The per-actor ``__init__`` is the codec/model warm-up point (same
    contract as :class:`MediaDecode`); decode is inherently
    per-payload, the window reduction is one ``add.reduceat`` per
    row."""

    def __init__(self, window: int = 64):
        self.window = window
        self._sf = _try_import_soundfile()  # optional fast path probe

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch["doc_id"].combine_chunks(), dtype=np.int64)
        payloads = batch["payload"].combine_chunks()
        out_id, out_win, out_n, out_sq = [], [], [], []
        w = self.window
        for i in range(len(ids)):
            _, samples = codecs.decode_wav(payloads[i].as_py())
            a = samples.astype(np.int64)
            n = len(a)
            starts = np.arange(0, n, w)
            sq = np.add.reduceat(a * a, starts)
            cnt = np.minimum(starts + w, n) - starts
            out_id.append(np.full(len(starts), ids[i], dtype=np.int64))
            out_win.append(np.arange(len(starts), dtype=np.int64))
            out_n.append(cnt.astype(np.int64))
            out_sq.append(sq)
        if not out_id:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "win": pa.array([], pa.int64()),
                             "n_samp": pa.array([], pa.int64()),
                             "sumsq": pa.array([], pa.int64())})
        return pa.table({
            "doc_id": pa.array(np.concatenate(out_id)),
            "win": pa.array(np.concatenate(out_win)),
            "n_samp": pa.array(np.concatenate(out_n)),
            "sumsq": pa.array(np.concatenate(out_sq)),
        })


def audio_energy_pipeline(ds: rd.Dataset, *, window: int = 64,
                          concurrency: int = 2,
                          batch_size: int = 1024) -> rd.Dataset:
    """documents → WAV payloads → actor-pool windowed energy rows."""
    try:
        import ray

        if ray.is_initialized():
            ncpu = int(ray.cluster_resources().get("CPU", 4))
            concurrency = max(1, min(concurrency, (ncpu - 1) // 2))
    except ImportError:  # pragma: no cover
        pass
    ds = ds.map_batches(attach_wav_payload, batch_format="pyarrow",
                        batch_size=None)
    return ds.map_batches(AudioWindows,
                          fn_constructor_kwargs={"window": window},
                          concurrency=concurrency,
                          batch_format="pyarrow", batch_size=batch_size)


class AudioVAD:
    """Actor-pool energy-threshold VAD (voice-activity detection, the
    stage between decode and transcription in a speech-data pipeline):
    decode the PCM16 payload, window it, mark a window voiced when its
    EXACT integer energy meets the mean-square threshold
    (Σa² ≥ thr·n — kept as an integer cross-multiplication, never a
    float mean), then summarize the voiced islands per doc: segment
    count, voiced-window count, longest run. One output row per doc;
    windows of a doc never leave the actor, so island detection needs
    no order-sensitive exchange."""

    def __init__(self, window: int = 64, thr: int = 358_000_000):
        self.window = window
        self.thr = thr

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch["doc_id"].combine_chunks(), dtype=np.int64)
        payloads = batch["payload"].combine_chunks()
        w, thr = self.window, self.thr
        n_seg = np.zeros(len(ids), np.int64)
        n_voiced = np.zeros(len(ids), np.int64)
        longest = np.zeros(len(ids), np.int64)
        for i in range(len(ids)):
            _, samples = codecs.decode_wav(payloads[i].as_py())
            a = samples.astype(np.int64)
            starts = np.arange(0, len(a), w)
            sq = np.add.reduceat(a * a, starts)
            cnt = np.minimum(starts + w, len(a)) - starts
            voiced = sq >= thr * cnt
            n_voiced[i] = int(voiced.sum())
            if voiced.any():
                v = voiced.astype(np.int64)
                rises = np.flatnonzero(np.diff(np.concatenate(
                    ([0], v))) == 1)
                falls = np.flatnonzero(np.diff(np.concatenate(
                    (v, [0]))) == -1)
                n_seg[i] = len(rises)
                longest[i] = int((falls - rises + 1).max())
        return pa.table({
            "doc_id": pa.array(ids),
            "n_segments": pa.array(n_seg),
            "n_voiced": pa.array(n_voiced),
            "longest_seg": pa.array(longest),
        })


def audio_vad_pipeline(ds: rd.Dataset, *, window: int = 64,
                       thr: int = 358_000_000,
                       concurrency: int = 2,
                       batch_size: int = 1024) -> rd.Dataset:
    """documents → WAV payloads → actor-pool VAD summary per doc."""
    ds = ds.map_batches(attach_wav_payload, batch_format="pyarrow",
                        batch_size=None)
    return ds.map_batches(AudioVAD,
                          fn_constructor_kwargs={"window": window,
                                                 "thr": thr},
                          concurrency=concurrency,
                          batch_format="pyarrow", batch_size=batch_size)


class ImageAHash:
    """Actor-pool perceptual average-hash (aHash) stage — the classic
    image near-dup fingerprint (pHash family; reference has no image
    path, this is the LLM-data-pipeline extension): decode the P6
    payload, sum channels to an integer gray value, partition the
    pixel grid into an 8×8 block grid, set bit (by·8+bx) when the
    block's mean gray EXCEEDS the global mean gray. The comparison is
    kept as an integer cross-multiplication (s_blk·N > S·n_blk — never
    a float mean), so the 64-bit fingerprint is bit-exact and
    restatable in SQL. Emitted as two int64 halves (hi = bits 32..63,
    lo = bits 0..31) so the oracle never needs unsigned 64-bit."""

    def __init__(self):
        self._pil = _try_import_pil()  # optional fast-path probe

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch["doc_id"].combine_chunks(), dtype=np.int64)
        payloads = batch["payload"].combine_chunks()
        hi = np.zeros(len(ids), np.int64)
        lo = np.zeros(len(ids), np.int64)
        for i in range(len(ids)):
            img = codecs.decode_ppm(payloads[i].as_py())
            h, w = img.shape[0], img.shape[1]
            gray = img.astype(np.int64).sum(axis=2)  # 0..765
            by = (np.arange(h, dtype=np.int64) * 8) // h
            bx = (np.arange(w, dtype=np.int64) * 8) // w
            s = np.zeros((8, 8), np.int64)
            c = np.zeros((8, 8), np.int64)
            np.add.at(s, (by[:, None], bx[None, :]), gray)
            np.add.at(c, (by[:, None], bx[None, :]),
                      np.ones((h, w), np.int64))
            total, npix = int(gray.sum()), h * w
            bits = (s * npix > total * c).ravel()  # bit idx = by*8+bx
            idx = np.flatnonzero(bits)
            lo[i] = int((np.int64(1) << idx[idx < 32]).sum())
            hi[i] = int((np.int64(1) << (idx[idx >= 32] - 32)).sum())
        return pa.table({
            "doc_id": pa.array(ids),
            "hash_hi": pa.array(hi),
            "hash_lo": pa.array(lo),
        })


def image_ahash_pipeline(ds: rd.Dataset, *, concurrency: int = 2,
                         batch_size: int = 1024) -> rd.Dataset:
    """documents → P6 payloads → actor-pool aHash fingerprints."""
    ds = ds.map_batches(attach_ppm_payload, batch_format="pyarrow",
                        batch_size=None)
    return ds.map_batches(ImageAHash, concurrency=concurrency,
                          batch_format="pyarrow", batch_size=batch_size)
