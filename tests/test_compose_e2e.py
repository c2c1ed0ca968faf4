"""Composability: curation query output feeds storage + tokenizer ops."""

import numpy as np
import pyarrow as pa
import ray.data as rd


def test_pretrain_prep_feeds_bucketed_store_and_bpe(ray_session, tmp_path):
    from raylog.functions.bpe import bpe_encode_ds, bpe_train
    from raylog.functions.bucketed import read_bucketed, write_bucketed
    from raylog.pipelines.queries import QUERIES

    sf = "/root/testdata/sf0.001"
    surv = QUERIES["pretrain_prep"](sf)  # Dataset: doc_id, shard
    surv_pd = surv.to_pandas()
    assert len(surv_pd) > 0

    # join survivors back to text (broadcast semi-join), bucket-store
    import pyarrow.compute as pc
    import ray

    keep = set(surv_pd["doc_id"].tolist())
    keep_ref = ray.put(np.array(sorted(keep), dtype=np.int64))

    def semi(b: pa.Table) -> pa.Table:
        ks = ray.get(keep_ref)
        ids = np.asarray(b["doc_id"].combine_chunks(), dtype=np.int64)
        pos = np.searchsorted(ks, ids)
        pos = np.clip(pos, 0, len(ks) - 1)
        return b.filter(pa.array(ks[pos] == ids))

    docs = rd.read_parquet(f"{sf}/documents.parquet",
                           columns=["doc_id", "text"]).map_batches(
        semi, batch_format="pyarrow", batch_size=None)
    store = str(tmp_path / "corpus")
    write_bucketed(docs, store, key="doc_id", num_buckets=4)

    corpus = read_bucketed(store)
    assert corpus.count() == len(surv_pd)

    # tokenizer trains on the curated store and round-trips it
    model = bpe_train(corpus, num_merges=16)
    enc = bpe_encode_ds(corpus, model).to_pandas()
    assert len(enc) == len(surv_pd)
    texts = corpus.to_pandas().set_index("doc_id")["text"]
    sample = enc.head(20)
    for _, row in sample.iterrows():
        assert model.decode_ids(np.asarray(row["bpe_tokens"])) == \
            texts[row["doc_id"]]
