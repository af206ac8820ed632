"""Inverted index (stages/index.py), repetition stats (textstats), and
webtext domain ops (stages/web.py)."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data

from duke_ray.stages.index import inverted_index
from duke_ray.stages.textstats import repetition_stats_batch
from duke_ray.stages.web import domain_stats, url_host


def test_repetition_stats_batch_spec():
    b = pa.table(
        {
            "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
            "text": pa.array(
                [
                    "a a a a",        # 4 tokens, 1 distinct, bigram 'a a' x3
                    "x y x y x",      # 5 tokens, 2 distinct, 'x y' x2
                    "",               # [''] -> 1 token, 0 bigrams
                    "solo",           # 1 token
                ],
                pa.string(),
            ),
        }
    )
    t = repetition_stats_batch(b).to_pydict()
    assert t["n_tokens"] == [4, 5, 1, 1]
    assert t["n_distinct_tokens"] == [1, 2, 1, 1]
    assert t["n_bigrams"] == [3, 4, 0, 0]
    assert t["max_bigram_n"] == [3, 2, 0, 0]
    assert t["dup_token_milli"] == [750, 600, 0, 0]
    assert t["top_bigram_milli"] == [1000, 500, 0, 0]


def test_inverted_index_explicit(ray_session):
    docs = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([0, 1, 5, 9], pa.int64()),
                "text": pa.array(["a b a", "b c", "a", "c c c"], pa.string()),
            }
        )
    )
    rows = inverted_index(docs, bucket_span=4).take_all()
    got = {(r["term"], r["bucket"]): (r["df"], r["tf"], r["postings"]) for r in rows}
    # buckets: doc 0,1 -> 0; doc 5 -> 1; doc 9 -> 2
    assert got[("a", 0)] == (1, 2, "0")
    assert got[("a", 1)] == (1, 1, "5")
    assert got[("b", 0)] == (2, 2, "0,1")
    assert got[("c", 0)] == (1, 1, "1")
    assert got[("c", 2)] == (1, 3, "9")
    assert len(got) == 5


def test_inverted_index_validates_span(ray_session):
    docs = ray.data.from_arrow(
        pa.table({"doc_id": pa.array([0], pa.int64()), "text": pa.array(["a"], pa.string())})
    )
    with pytest.raises(ValueError):
        inverted_index(docs, bucket_span=0)


def test_url_host_edges():
    urls = pa.array(
        [
            "https://site7.example/p/7",
            "http://Host.TLD:8080/path?q=1",
            "ftp://files.example",
            "not a url",
            None,
        ],
        pa.string(),
    )
    got = url_host(urls).to_pylist()
    assert got == ["site7.example", "host.tld:8080", "files.example", None, None]


def test_domain_stats(ray_session):
    pages = ray.data.from_arrow(
        pa.table(
            {
                "url": pa.array(
                    [
                        "https://a.example/1",
                        "https://a.example/2",
                        "https://b.example/1",
                    ],
                    pa.string(),
                ),
                "text": pa.array(["x y z", "x", "p q"], pa.string()),
            }
        )
    )
    rows = sorted(
        (r["domain"], r["n_pages"], r["n_tokens"]) for r in domain_stats(pages).take_all()
    )
    assert rows == [("a.example", 2, 4), ("b.example", 1, 2)]


def test_label_centroid_sums(ray_session):
    from duke_ray.stages.embedagg import label_centroid_sums

    vecs = ray.data.from_arrow(
        pa.table(
            {
                "label": pa.array([0, 0, 1], pa.int32()),
                "embedding": pa.array(
                    [[1.25, -0.5], [0.25, 0.5], [2.0, 3.0]],
                    pa.list_(pa.float32()),
                ),
            }
        )
    )
    rows = {
        (r["label"], r["dim"]): (r["sum_micro"], r["n_vecs"])
        for r in label_centroid_sums(vecs).take_all()
    }
    assert rows == {
        (0, 0): (1_500_000, 2),
        (0, 1): (0, 2),
        (1, 0): (2_000_000, 1),
        (1, 1): (3_000_000, 1),
    }


def test_label_centroid_sums_half_up_and_validation(ray_session):
    from duke_ray.stages.embedagg import label_centroid_sums

    # floor(x*1e6 + 0.5): -0.0000005 -> 0, +0.0000005 -> 1 (half-up)
    vecs = ray.data.from_arrow(
        pa.table(
            {
                "label": pa.array([3], pa.int32()),
                "embedding": pa.array([[0.0000005, -0.0000005]], pa.list_(pa.float32())),
            }
        )
    )
    rows = {r["dim"]: r["sum_micro"] for r in label_centroid_sums(vecs).take_all()}
    # float32(5e-7) is slightly above/below the exact half; just pin the
    # invariant both sides compute: floor(float64(x)*1e6 + 0.5)
    import numpy as np

    f = np.float32([0.0000005, -0.0000005]).astype(np.float64)
    want = np.floor(f * 1_000_000 + 0.5).astype(np.int64)
    assert rows == {0: int(want[0]), 1: int(want[1])}

    bad = ray.data.from_arrow(
        pa.table(
            {
                "label": pa.array([-1], pa.int32()),
                "embedding": pa.array([[1.0]], pa.list_(pa.float32())),
            }
        )
    )
    with pytest.raises(Exception):
        label_centroid_sums(bad).take_all()


def _topk_serial(rows, terms, k):
    """Serial integer TF-IDF reference (dict arithmetic, no Arrow)."""
    n = len(rows)
    tf = {}
    for doc_id, text in rows:
        for t in text.split(" "):
            if t in terms:
                tf[(t, doc_id)] = tf.get((t, doc_id), 0) + 1
    df = {}
    for (t, _d) in tf:
        df[t] = df.get(t, 0) + 1
    score = {}
    for (t, d), f in tf.items():
        score[d] = score.get(d, 0) + f * (n // df[t])
    return sorted(score.items(), key=lambda x: (-x[1], x[0]))[:k]


def test_lexical_topk_matches_serial(ray_session):
    from duke_ray.stages.retrieval import lexical_topk

    rng = np.random.default_rng(3)
    vocab = ["aa", "bb", "cc", "dd", "rare"]
    rows = [
        (i, " ".join(rng.choice(vocab[:4], size=rng.integers(3, 12)).tolist()))
        for i in range(200)
    ]
    rows[17] = (17, rows[17][1] + " rare rare")
    rows[90] = (90, "rare")
    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": pa.array([r[1] for r in rows], pa.string()),
            }
        )
    ).repartition(7)
    got = lexical_topk(ds, ["aa", "rare"], k=10).to_pandas()
    want = _topk_serial(rows, {"aa", "rare"}, 10)
    assert list(zip(got["doc_id"], got["score"])) == want


def test_lexical_topk_fewer_matches_than_k_and_validation(ray_session):
    from duke_ray.stages.retrieval import lexical_topk

    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([1, 2, 3], pa.int64()),
                "text": pa.array(["q w", "w w", "z"], pa.string()),
            }
        )
    )
    got = lexical_topk(ds, ["q"], k=10).to_pandas()
    # only doc 1 matches: score = 1 * (3 // 1) = 3
    assert list(zip(got["doc_id"], got["score"])) == [(1, 3)]
    with pytest.raises(ValueError):
        lexical_topk(ds, [], k=5)
    with pytest.raises(ValueError):
        lexical_topk(ds, ["q"], k=0)


def test_filter_blocklist_fail_closed(ray_session):
    from duke_ray.stages.web import filter_blocklist

    ds = ray.data.from_arrow(
        pa.table(
            {
                "url": pa.array(
                    [
                        "https://good.example/p/1",
                        "https://BAD.example/p/2",   # host lowercased -> blocked
                        "not a url",                  # unparseable -> dropped
                        None,                         # null -> dropped
                        "https://good.example:8080/p/5",  # port kept -> distinct host
                    ],
                    pa.string(),
                ),
                "n": pa.array([1, 2, 3, 4, 5], pa.int64()),
            }
        )
    )
    got = filter_blocklist(ds, ["bad.example"]).to_pandas().sort_values("n")
    assert got["n"].tolist() == [1, 5]
    assert got["domain"].tolist() == ["good.example", "good.example:8080"]


def _serial_kmeans(ids, X_f32, k, iters, micro=1_000_000):
    """Scalar spec of stages/embedagg.py:kmeans_lloyd (the documented
    integer Lloyd semantics), independent implementation for the test."""
    import numpy as np

    order = np.argsort(ids, kind="stable")
    V = np.floor(X_f32.astype(np.float64) * micro + 0.5).astype(np.int64)
    C = V[order[:k]].copy()

    def assign(C):
        out = np.empty(len(V), np.int64)
        for i in range(len(V)):
            d = ((V[i] - C) ** 2).sum(axis=1)
            out[i] = int(np.flatnonzero(d == d.min())[0])
        return out

    for _ in range(iters):
        a = assign(C)
        for c in range(k):
            m = a == c
            if m.any():
                s = V[m].sum(axis=0)
                n = int(m.sum())
                C[c] = np.sign(s) * (np.abs(s) // n)
    return assign(C)


def test_kmeans_lloyd_bit_identical_across_blocks(ray_session):
    from duke_ray.stages.embedagg import kmeans_lloyd

    rng = np.random.default_rng(7)
    n, dim, k = 300, 8, 5
    # three planted blobs + noise so iterations actually move centroids
    centers = rng.normal(size=(3, dim)) * 0.4
    X = (centers[rng.integers(0, 3, n)] + rng.normal(size=(n, dim)) * 0.05).astype(
        np.float32
    )
    ids = rng.permutation(n).astype(np.int64)
    want = _serial_kmeans(ids, X, k, iters=3)

    tbl = pa.table(
        {
            "vec_id": pa.array(ids, pa.int64()),
            "embedding": pa.array([list(map(float, r)) for r in X], pa.list_(pa.float32())),
        }
    )
    for blocks in (1, 7):
        ds = ray.data.from_arrow(tbl).repartition(blocks)
        got = kmeans_lloyd(ds, k=k, iters=3).to_pandas().sort_values("vec_id")
        by_id = dict(zip(got["vec_id"], got["cluster"]))
        assert [by_id[i] for i in ids] == want.tolist()
    # every cluster id in range, all ids present
    assert set(got["cluster"]).issubset(set(range(k)))
    assert len(got) == n


def test_kmeans_lloyd_validation(ray_session):
    from duke_ray.stages.embedagg import kmeans_lloyd

    ds = ray.data.from_arrow(
        pa.table(
            {
                "vec_id": pa.array([1, 2], pa.int64()),
                "embedding": pa.array([[0.1, 0.2], [0.3, 0.4]], pa.list_(pa.float32())),
            }
        )
    )
    with pytest.raises(ValueError):
        kmeans_lloyd(ds, k=0)
    with pytest.raises(ValueError):
        kmeans_lloyd(ds, k=3).take_all()  # k > corpus


def test_canonical_url_rules():
    from duke_ray.stages.web import canonical_url

    urls = pa.array(
        [
            "HTTPS://WWW.Example.COM/Path/Q?x=1#frag",       # scheme+host lowered, path case kept
            "https://a.com/p?utm_source=f&utm_medium=m&x=2",  # two leading utm params
            "https://a.com/p?x=2&utm_campaign=c",             # trailing utm
            "https://a.com/p?utm_only=1",                     # query collapses entirely
            "http://b.com/",
            "not a url",
            None,
        ]
    )
    got = canonical_url(urls).to_pylist()
    assert got == [
        "https://www.example.com/Path/Q?x=1",
        "https://a.com/p?x=2",
        "https://a.com/p?x=2",
        "https://a.com/p",
        "http://b.com/",
        None,
        None,
    ]


def test_url_dedup_min_id_survives(ray_session):
    from duke_ray.stages.web import url_dedup

    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([3, 1, 2, 9], pa.int64()),
                "url": pa.array(
                    [
                        "https://a.com/x?utm_source=s",
                        "HTTPS://A.COM/x#top",
                        "https://b.com/y",
                        "garbage",  # dropped fail-closed
                    ]
                ),
            }
        )
    ).repartition(2)
    got = url_dedup(ds).to_pandas().sort_values("canonical_url").reset_index(drop=True)
    assert list(map(tuple, got.itertuples(index=False))) == [
        ("https://a.com/x", 1, 2),
        ("https://b.com/y", 2, 1),
    ]


def test_anti_join_bloom_path_equals_plain(ray_session):
    from duke_ray.stages.dedup import anti_join_text

    rng = np.random.default_rng(21)
    base_texts = [f"base text {i} {rng.integers(1e9)}" for i in range(200)]
    # new: 60 re-crawled (present in base), 140 fresh, 2 nulls, 1 dup-within-new
    new_texts = base_texts[:60] + [f"fresh {i} {rng.integers(1e9)}" for i in range(140)]
    new_texts += [None, None, new_texts[80]]
    base_tbl = pa.table(
        {
            "doc_id": pa.array(np.arange(200, dtype=np.int64)),
            "text": pa.array(base_texts),
        }
    )
    new_tbl = pa.table(
        {
            "doc_id": pa.array(np.arange(1000, 1000 + len(new_texts), dtype=np.int64)),
            "text": pa.array(new_texts, pa.string()),
        }
    )
    base = ray.data.from_arrow(base_tbl).repartition(4)
    new = ray.data.from_arrow(new_tbl).repartition(5)
    plain = sorted(r["doc_id"] for r in anti_join_text(new, base).take_all())
    # 1 << 9 = 512 bits for 200 keys -> heavy false-positive rate; the
    # result must STILL be exact (positives verified by the exchange)
    for m in (1 << 9, 1 << 20):
        got = sorted(
            r["doc_id"]
            for r in anti_join_text(
                ray.data.from_arrow(new_tbl).repartition(5),
                ray.data.from_arrow(base_tbl).repartition(4),
                bloom_m_bits=m,
            ).take_all()
        )
        assert got == plain, (m, len(got), len(plain))


def test_bloom_bits_membership(ray_session):
    from duke_ray.functions.bloom import bloom_contains, build_bloom_bits

    h = np.array([3, 999, -42, 2**62, 7], np.int64)
    ds = ray.data.from_arrow(pa.table({"h": pa.array(h, pa.int64())})).repartition(2)
    bm = build_bloom_bits(ds, "h", m_bits=1 << 16, n_shards=8)
    assert bloom_contains(bm, h).all()  # no false negatives, ever
    probe = np.arange(10_000, 20_000, dtype=np.int64)
    fp = bloom_contains(bm, probe).mean()
    assert fp < 0.01, fp  # 5 keys in 64 Kbit


def test_update_inverted_index_equals_rebuild_and_guards(ray_session):
    from duke_ray.stages.index import inverted_index, update_inverted_index

    rng = np.random.default_rng(13)
    vocab = ["aa", "bb", "cc", "dd"]
    texts = [" ".join(rng.choice(vocab, rng.integers(2, 12))) for _ in range(60)]
    tbl = pa.table(
        {
            "doc_id": pa.array(np.arange(60, dtype=np.int64)),
            "text": pa.array(texts),
        }
    )
    full = ray.data.from_arrow(tbl)
    old = ray.data.from_arrow(tbl.filter(pa.compute.less(tbl["doc_id"], 32)))
    delta = ray.data.from_arrow(tbl.filter(pa.compute.greater_equal(tbl["doc_id"], 32)))

    span = 16  # 32 is range-aligned
    want = (
        inverted_index(full, bucket_span=span)
        .to_pandas()
        .sort_values(["term", "bucket"])
        .reset_index(drop=True)
    )
    got = (
        update_inverted_index(inverted_index(old, bucket_span=span), delta, bucket_span=span)
        .to_pandas()
        .sort_values(["term", "bucket"])
        .reset_index(drop=True)
    )
    assert got.equals(want)

    # overlapping delta range must refuse, not silently split a shard
    with pytest.raises(ValueError):
        update_inverted_index(
            inverted_index(old, bucket_span=span),
            ray.data.from_arrow(tbl),  # overlaps old ids
            bucket_span=span,
        ).take_all()


def test_gram_matrix_bit_identical_to_serial(ray_session):
    import numpy as np

    from duke_ray.stages.embedagg import gram_matrix

    rng = np.random.default_rng(11)
    x = rng.normal(size=(333, 7)).astype(np.float32)
    ds = ray.data.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(np.arange(333, dtype=np.int64)),
                "embedding": pa.array([r for r in x.tolist()], pa.list_(pa.float32())),
            }
        )
    ).repartition(5)
    got = gram_matrix(ds, quant=1000).to_pandas()
    xq = np.floor(x.astype(np.float64) * 1000 + 0.5).astype(np.int64)
    want = xq.T @ xq
    assert (got["n_vecs"] == 333).all()
    for r in got.itertuples():
        assert want[r.i, r.j] == r.sum_q, (r.i, r.j)
    assert len(got) == 7 * 8 // 2

    # same result at different block counts (summation-order independence)
    got2 = gram_matrix(ds.repartition(13), quant=1000).to_pandas()
    assert got.sort_values(["i", "j"]).reset_index(drop=True).equals(
        got2.sort_values(["i", "j"]).reset_index(drop=True)
    )


def test_gram_matrix_empty(ray_session):
    from duke_ray.stages.embedagg import gram_matrix

    ds = ray.data.from_arrow(
        pa.table(
            {
                "vec_id": pa.array([], pa.int64()),
                "embedding": pa.array([], pa.list_(pa.float32())),
            }
        )
    )
    assert gram_matrix(ds).num_rows == 0


def test_pca_project_matches_serial_numpy(ray_session):
    import numpy as np

    from duke_ray.stages.embedagg import pca_project

    rng = np.random.default_rng(5)
    # anisotropic blob: two dominant directions
    base = rng.normal(size=(400, 6)) * np.array([5.0, 3.0, 1.0, 0.5, 0.2, 0.1])
    x = base.astype(np.float32)
    ds = ray.data.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(np.arange(400, dtype=np.int64)),
                "embedding": pa.array([r for r in x.tolist()], pa.list_(pa.float32())),
            }
        )
    ).repartition(4)
    got_ds, m = pca_project(ds, k=3, quant=1000, return_model=True)
    got = got_ds.to_pandas()
    # serial reference on the same quantized data
    xq = np.floor(x.astype(np.float64) * 1000 + 0.5) / 1000
    mu = xq.mean(axis=0)
    cov = (xq - mu).T @ (xq - mu) / (len(xq) - 1)
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(evals)[::-1][:3]
    np.testing.assert_allclose(m["eigenvalues"], evals[order], rtol=1e-8)
    # projections match the serial reference up to the fixed sign rule
    w = evecs[:, order]
    flip = np.sign(w[np.argmax(np.abs(w), axis=0), np.arange(3)])
    ref = (xq - mu) @ (w * flip)
    got_mat = (
        got.pivot(index="vec_id", columns="comp", values="coord_micro").to_numpy() / 1e6
    )
    np.testing.assert_allclose(got_mat, ref, atol=2e-6)

    # deterministic across block counts
    got2 = pca_project(ds.repartition(9), k=3, quant=1000).to_pandas()
    a = got.sort_values(["vec_id", "comp"]).reset_index(drop=True)
    b = got2.sort_values(["vec_id", "comp"]).reset_index(drop=True)
    assert a.equals(b)


def test_gram_matrix_counts_empty_embedding_rows(ray_session):
    """ADVICE r4: a batch whose embeddings flatten to zero elements must
    still contribute its row count to n_vecs (SQL COUNT(*) semantics)."""
    from duke_ray.stages.embedagg import gram_matrix

    t = pa.table(
        {
            "vec_id": pa.array([0, 1, 2], pa.int64()),
            "embedding": pa.array(
                [[1.0, 2.0], [], []], pa.list_(pa.float32())
            ),
        }
    )
    # force the all-empty rows into their own block
    ds = ray.data.from_arrow(t.slice(0, 1)).union(ray.data.from_arrow(t.slice(1, 2)))
    g = gram_matrix(ds).to_pandas()
    assert (g["n_vecs"] == 3).all()
