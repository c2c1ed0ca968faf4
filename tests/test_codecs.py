"""Real PPM/WAV codecs and the mime-dispatched multimodal stages."""

import numpy as np
import pytest
import pyarrow as pa
import ray.data as rd

from raylog.functions import codecs
from raylog.functions.multimodal import (
    FrameSampler,
    MediaDecode,
    MediaResize,
    attach_ppm_payload,
    attach_wav_payload,
    media_pipeline_real,
)


def _img(h, w, seed=3):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)


def test_ppm_roundtrip_and_comments():
    img = _img(13, 7)
    enc = codecs.encode_ppm(img)
    np.testing.assert_array_equal(codecs.decode_ppm(enc), img)
    # header with comments + extra whitespace still decodes
    weird = b"P6\n# a comment\n 7\t13 # trailing\n255\n" + img.tobytes()
    np.testing.assert_array_equal(codecs.decode_ppm(weird), img)


def test_resize_nearest_identity_and_downscale():
    img = _img(10, 10)
    np.testing.assert_array_equal(codecs.resize_nearest(img, 10, 10), img)
    half = codecs.resize_nearest(img, 5, 5)
    np.testing.assert_array_equal(half, img[::2, ::2])


def test_wav_roundtrip():
    s = (np.arange(500) * 37 % 65536 - 32768).astype(np.int16)
    rate, back = codecs.decode_wav(codecs.encode_wav(s, 8000))
    assert rate == 8000
    np.testing.assert_array_equal(back, s)


def test_ppm_stream_frames_real_scan():
    frames = [_img(5, 4, i) for i in range(6)]
    stream = codecs.ppm_stream_encode(frames)
    parts = codecs.ppm_stream_frames(stream)
    assert len(parts) == 6
    for p, f in zip(parts, frames):
        np.testing.assert_array_equal(codecs.decode_ppm(p), f)


def test_media_decode_real_values():
    docs = pa.table({"doc_id": pa.array([0, 5, 17], pa.int64())})
    with_img = attach_ppm_payload(docs)
    out = MediaDecode()(with_img)
    for i, d in enumerate([0, 5, 17]):
        img = codecs.decode_ppm(out["payload"][i].as_py())
        assert out["height"][i].as_py() == 8 + d % 25
        assert out["width"][i].as_py() == 8 + d % 31
        assert abs(out["mean_px"][i].as_py() - img.mean() / 255.0) < 1e-12
    with_wav = attach_wav_payload(docs)
    outw = MediaDecode()(with_wav)
    assert outw["height"].to_pylist() == [1, 1, 1]
    assert outw["width"].to_pylist() == [256, 261, 273]


def test_media_resize_real_payload():
    docs = pa.table({"doc_id": pa.array([40], pa.int64())})  # 23x17 image
    dec = MediaDecode()(attach_ppm_payload(docs))
    res = MediaResize(max_side=8)(dec)
    resized = codecs.decode_ppm(res["resized_payload"][0].as_py())
    assert resized.shape[:2] == (res["resized_height"][0].as_py(),
                                 res["resized_width"][0].as_py())
    assert max(resized.shape[:2]) <= 8
    orig = codecs.decode_ppm(dec["payload"][0].as_py())
    np.testing.assert_array_equal(
        resized, codecs.resize_nearest(orig, *resized.shape[:2]))


def test_frame_sampler_real_stream():
    frames = [_img(4, 4, i) for i in range(10)]
    t = pa.table({
        "doc_id": pa.array([1], pa.int64()),
        "payload": pa.array([codecs.ppm_stream_encode(frames)], pa.binary()),
        "mime": pa.array([codecs.PPM_STREAM_MIME]),
    })
    out = FrameSampler(n_frames=4)(t)
    assert out.num_rows == 4
    got0 = codecs.decode_ppm(out["frame"][0].as_py())
    np.testing.assert_array_equal(got0, frames[0])
    got_last = codecs.decode_ppm(out["frame"][3].as_py())
    np.testing.assert_array_equal(got_last, frames[9])


def test_media_pipeline_real_end_to_end(sf_dir):
    import ray.data as rd

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id"]).limit(20)
    out = media_pipeline_real(docs, kind="image").to_pandas()
    assert len(out) == 20
    assert (out["resized_height"] <= 16).all()
    auto = media_pipeline_real(
        rd.read_parquet(f"{sf_dir}/documents.parquet",
                        columns=["doc_id"]).limit(10),
        kind="audio").to_pandas()
    assert (auto["height"] == 1).all()
    assert ((auto["mean_px"] > 0) & (auto["mean_px"] < 1)).all()


class TestOptionalRealCodecs:
    """The PIL/soundfile branches light up when the libraries exist
    (cluster image); skipped in this container (VERDICT r2 #8)."""

    def test_pil_decode_and_resize_real_branch(self):
        PIL_Image = pytest.importorskip("PIL.Image")
        import io

        import numpy as np
        import pyarrow as pa

        from raylog.functions.multimodal import MediaDecode, MediaResize

        img = PIL_Image.fromarray(
            (np.mgrid[0:20, 0:30][0] * 8 % 256).astype("uint8")).convert("RGB")
        buf = io.BytesIO()
        img.save(buf, format="PNG")
        batch = pa.table({
            "doc_id": pa.array([1], pa.int64()),
            "payload": pa.array([buf.getvalue()], pa.binary()),
            "mime": pa.array(["image/png"]),
        })
        dec = MediaDecode(fake=False)(batch)
        assert dec["height"][0].as_py() == 20
        assert dec["width"][0].as_py() == 30
        out = MediaResize(max_side=10, fake=False)(dec)
        assert out["resized_height"][0].as_py() <= 10
        assert out["resized_width"][0].as_py() <= 10
        # resized payload round-trips through PIL at the new geometry
        rt = PIL_Image.open(io.BytesIO(out["resized_payload"][0].as_py()))
        assert rt.size == (out["resized_width"][0].as_py(),
                           out["resized_height"][0].as_py())

    def test_soundfile_decode_real_branch(self):
        sf = pytest.importorskip("soundfile")
        import io

        import numpy as np
        import pyarrow as pa

        from raylog.functions.multimodal import MediaDecode

        buf = io.BytesIO()
        sf.write(buf, np.zeros(100), 8000, format="OGG")
        batch = pa.table({
            "doc_id": pa.array([1], pa.int64()),
            "payload": pa.array([buf.getvalue()], pa.binary()),
            "mime": pa.array(["audio/ogg"]),
        })
        dec = MediaDecode(fake=False)(batch)
        assert dec["width"][0].as_py() == 100

    def test_fake_path_unchanged_without_libs(self):
        """Without PIL, an image/png mime still routes to the digest
        pseudo-decode (fake=True) or the documented stub (fake=False)."""
        import pyarrow as pa

        from raylog.functions import multimodal
        from raylog.functions.multimodal import MediaDecode

        if multimodal._try_import_pil() is not None:
            pytest.skip("Pillow present: fake fallback not reachable")
        batch = pa.table({
            "doc_id": pa.array([1], pa.int64()),
            "payload": pa.array([b"not-a-real-png"], pa.binary()),
            "mime": pa.array(["image/png"]),
        })
        out = MediaDecode(fake=True)(batch)
        assert out["height"][0].as_py() >= 16
        with pytest.raises(NotImplementedError):
            MediaDecode(fake=False)(batch)


def test_audio_windows_exact_energy():
    """AudioWindows rows == brute-force windowed Σa² over the decoded
    waveform, including the short tail window (n_samp < window)."""
    from raylog.functions.multimodal import AudioWindows

    docs = pa.table({"doc_id": pa.array([0, 3, 511], pa.int64())})
    out = AudioWindows(window=64)(attach_wav_payload(docs))
    df = out.to_pandas()
    for d in [0, 3, 511]:
        n = 256 + d % 512
        t = np.arange(n, dtype=np.int64)
        a = (((t * (2654435761 + d)) >> 7) % 65536 - 32768)
        rows = df[df.doc_id == d].sort_values("win")
        assert len(rows) == -(-n // 64)
        for _, r in rows.iterrows():
            seg = a[r.win * 64:(r.win + 1) * 64]
            assert r.n_samp == len(seg)
            assert r.sumsq == int((seg * seg).sum())
    # doc 511 has n = 256 + 511 = 767 samples → a 767 % 64 = 63-sample
    # tail window (doc 0's n=256 divides evenly, all windows full)
    tail = df[(df.doc_id == 511)].sort_values("win").iloc[-1]
    assert tail.n_samp == (256 + 511 % 512) % 64


def test_audio_energy_pipeline_ray(sf_dir):
    from raylog.functions.multimodal import audio_energy_pipeline

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id"]).limit(8)
    out = audio_energy_pipeline(docs, window=64).to_pandas()
    assert set(out.columns) == {"doc_id", "win", "n_samp", "sumsq"}
    assert out.doc_id.nunique() == 8
    assert (out.sumsq >= 0).all() and (out.n_samp.between(1, 64)).all()
