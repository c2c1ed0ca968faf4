"""Batch 44: image aHash dedup + TPC-H Q12 shape + SCD2 history."""

import numpy as np
import pyarrow as pa


def _ahash_brute(doc_id: int) -> tuple[int, int]:
    """Straight-line reimplementation of the aHash spec for one image."""
    h, w = 8 + doc_id % 25, 8 + doc_id % 31
    y, x = np.mgrid[0:h, 0:w]
    gray = ((x * 8 + doc_id) % 256 + (y * 8 + doc_id // 2) % 256
            + (x + y + doc_id) % 256).astype(np.int64)
    total, npix = int(gray.sum()), h * w
    hi = lo = 0
    for by in range(8):
        for bx in range(8):
            sel = ((y * 8) // h == by) & ((x * 8) // w == bx)
            s, c = int(gray[sel].sum()), int(sel.sum())
            if s * npix > total * c:
                idx = by * 8 + bx
                if idx >= 32:
                    hi |= 1 << (idx - 32)
                else:
                    lo |= 1 << idx
    return hi, lo


def test_image_ahash_matches_brute_force():
    from raylog.functions.multimodal import ImageAHash, attach_ppm_payload

    ids = [0, 7, 123, 4567]
    batch = attach_ppm_payload(pa.table({"doc_id": pa.array(ids, pa.int64())}))
    out = ImageAHash()(batch).to_pandas().set_index("doc_id")
    for d in ids:
        hi, lo = _ahash_brute(d)
        assert out.loc[d, "hash_hi"] == hi
        assert out.loc[d, "hash_lo"] == lo


def test_image_ahash_shift_invariance_same_geometry():
    # Two images differing only by a constant brightness offset that does
    # not wrap mod 256 anywhere hash identically (mean-threshold property).
    from raylog.functions.codecs import encode_ppm
    from raylog.functions.multimodal import ImageAHash

    h, w = 16, 16
    y, x = np.mgrid[0:h, 0:w]
    base = ((x * 3 + y * 5) % 100).astype(np.uint8)
    img0 = np.stack([base, base, base], axis=2)
    img1 = img0 + 50  # max 149 + 50 < 256: no wrap
    batch = pa.table({
        "doc_id": pa.array([0, 1], pa.int64()),
        "payload": pa.array([encode_ppm(img0), encode_ppm(img1)],
                            pa.binary()),
    })
    out = ImageAHash()(batch)
    assert out["hash_hi"][0].as_py() == out["hash_hi"][1].as_py()
    assert out["hash_lo"][0].as_py() == out["hash_lo"][1].as_py()


def test_q12_derivations_and_join(sf_dir):
    import duckdb

    import __ray_entry__ as E

    out = E.queries()["lineitem_q12_shipmode"](sf_dir)
    df = out.to_pandas() if hasattr(out, "to_pandas") else out
    assert set(df.shipmode) <= {"MAIL", "SHIP"}
    # total line count matches an independent single-predicate restatement
    tot = duckdb.sql(f"""
        SELECT COUNT(*) FROM read_parquet('{sf_dir}/lineitem.parquet') l
        JOIN read_parquet('{sf_dir}/orders.parquet') o
          ON l.l_orderkey = o.o_orderkey
        WHERE (l.l_orderkey * 31 + l.l_linenumber) % 7 IN (3, 5)
          AND l.l_partkey % 30 > 0 AND l.l_suppkey % 10 > 2
          AND l.l_shipdate + (l.l_partkey % 30 + (l.l_suppkey % 10) - 2)
              * INTERVAL 1 DAY >= DATE '1997-01-01'
          AND l.l_shipdate + (l.l_partkey % 30 + (l.l_suppkey % 10) - 2)
              * INTERVAL 1 DAY < DATE '1998-01-01'
    """).fetchone()[0]
    assert int(df.high_line_count.sum() + df.low_line_count.sum()) == tot


def test_scd2_intervals_contiguous_and_cover_stream(sf_dir):
    import duckdb

    import __ray_entry__ as E

    out = E.queries()["events_scd2_history"](sf_dir)
    df = (out.to_pandas() if hasattr(out, "to_pandas") else out)
    df = df.sort_values(["user_id", "valid_from_us"]).reset_index(drop=True)
    # exactly one open (current) interval per user
    opens = df[df.valid_to_us.isna()].groupby("user_id").size()
    assert (opens == 1).all()
    assert set(opens.index) == set(df.user_id)
    # intervals tile: each non-final valid_to equals the next valid_from
    for uid, g in df.groupby("user_id"):
        v_to = g.valid_to_us.to_numpy()[:-1]
        v_from = g.valid_from_us.to_numpy()[1:]
        assert (v_to == v_from).all()
        assert g.valid_to_us.to_numpy()[-1] != g.valid_to_us.to_numpy()[-1] \
            or np.isnan(g.valid_to_us.to_numpy()[-1])
    # run event counts sum back to the raw stream size per user
    raw = duckdb.sql(f"""
        SELECT user_id, COUNT(*) AS n
        FROM read_parquet('{sf_dir}/events.parquet') GROUP BY 1""").df()
    got = df.groupby("user_id").n_events.sum().reset_index()
    m = raw.merge(got, on="user_id")
    assert (m.n == m.n_events).all()
