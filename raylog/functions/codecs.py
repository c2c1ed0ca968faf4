"""Real, dependency-free media codecs (pure numpy + stdlib).

The container has no PIL/ffmpeg, but two real wire formats need neither:

- **PPM (P6)** — the netpbm binary RGB format: ASCII header
  (magic, width, height, maxval, ``#`` comments) + raw HxWx3 bytes.
  Decode/encode is header parsing + ``np.frombuffer``/``tobytes``.
- **WAV (PCM16)** — stdlib ``wave`` handles the RIFF container;
  samples are an int16 ``np.frombuffer`` view.

These upgrade the multimodal stages from digest-based fakes to REAL
decode → transform → re-encode kernels for these formats, while other
mimes still route to the documented stub/swap points. A "video" analog
is a concatenation of P6 frames (``ppm_stream_*``) — frame extraction
is real header scanning, the ffmpeg swap point stays for real
containers.
"""

from __future__ import annotations

import io
import wave

import numpy as np

PPM_MIME = "image/x-portable-pixmap"
WAV_MIME = "audio/wav"
PPM_STREAM_MIME = "video/x-ppm-stream"


def encode_ppm(arr: np.ndarray) -> bytes:
    if arr.ndim != 3 or arr.shape[2] != 3 or arr.dtype != np.uint8:
        raise ValueError("encode_ppm expects HxWx3 uint8")
    h, w = arr.shape[:2]
    return b"P6\n%d %d\n255\n" % (w, h) + arr.tobytes()


def _read_ppm_header(payload: bytes, start: int = 0) -> tuple[int, int, int]:
    """Parse the P6 header at ``start`` → (width, height, absolute
    data_offset). Handles arbitrary whitespace and ``#`` comments per
    the netpbm spec. Taking a start offset lets stream scanning walk a
    concatenated payload in one pass with zero slicing copies."""
    if payload[start:start + 2] != b"P6":
        raise ValueError("not a P6 ppm payload")
    fields: list[int] = []
    i = start + 2
    n = len(payload)
    while len(fields) < 3 and i < n:
        c = payload[i]
        if c in b" \t\r\n":
            i += 1
        elif c == ord("#"):
            while i < n and payload[i] != ord("\n"):
                i += 1
        elif ord("0") <= c <= ord("9"):
            j = i
            while j < n and ord("0") <= payload[j] <= ord("9"):
                j += 1
            fields.append(int(payload[i:j]))
            i = j
        else:
            raise ValueError("malformed ppm header")
    if len(fields) < 3 or fields[2] != 255:
        raise ValueError("unsupported ppm header")
    return fields[0], fields[1], i + 1  # single whitespace after maxval


def decode_ppm(payload: bytes) -> np.ndarray:
    w, h, off = _read_ppm_header(payload)
    need = h * w * 3
    data = np.frombuffer(payload, dtype=np.uint8, count=need, offset=off)
    return data.reshape(h, w, 3)


def resize_nearest(arr: np.ndarray, nh: int, nw: int) -> np.ndarray:
    """Nearest-neighbor resample via two index gathers — vectorized, no
    interpolation libraries."""
    h, w = arr.shape[:2]
    rows = np.minimum((np.arange(nh) * h) // nh, h - 1)
    cols = np.minimum((np.arange(nw) * w) // nw, w - 1)
    return arr[rows][:, cols]


def encode_wav(samples: np.ndarray, rate: int = 16_000) -> bytes:
    if samples.dtype != np.int16:
        raise ValueError("encode_wav expects int16 samples")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(rate)
        f.writeframes(samples.tobytes())
    return buf.getvalue()


def decode_wav(payload: bytes) -> tuple[int, np.ndarray]:
    with wave.open(io.BytesIO(payload), "rb") as f:
        rate = f.getframerate()
        raw = f.readframes(f.getnframes())
    return rate, np.frombuffer(raw, dtype=np.int16)


def ppm_stream_encode(frames: list[np.ndarray]) -> bytes:
    return b"".join(encode_ppm(f) for f in frames)


def ppm_stream_frames(payload: bytes) -> list[bytes]:
    """Split a concatenated-P6 stream into per-frame payloads by real
    header scanning (no fixed frame size assumed)."""
    out = []
    i = 0
    n = len(payload)
    while i < n:
        w, h, off = _read_ppm_header(payload, i)  # off is absolute
        end = off + h * w * 3
        out.append(payload[i:end])
        i = end
    return out
